"""MXU DFT epilogue/prologue vs the FFT chain: exact fold of the fftshift
sandwich + crop/pad + deapodization into two matmuls (ops/fftops.py), and
exact adjointness of the pair (what CGNR's operator dot test relies on)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tron_tpu.kernels.kb import kb_beta
from tron_tpu.ops.fftops import (
    adjoint_image_mxu,
    centered_fft2,
    centered_ifft2_unnormalized,
    crop_center,
    deapodize,
    forward_kspace_mxu,
    pad_center,
)


@pytest.mark.parametrize("deapod", [True, False])
def test_adjoint_image_mxu_matches_fft_chain(rng, deapod):
    nxos, n, kw = 128, 64, 2.0
    beta = kb_beta(kw, 2.0)
    K = (
        rng.standard_normal((3, nxos, nxos))
        + 1j * rng.standard_normal((3, nxos, nxos))
    ).astype(np.complex64)
    ref = crop_center(centered_ifft2_unnormalized(jnp.asarray(K)), n)
    if deapod:
        ref = deapodize(ref, nxos, kw, beta)
    got = adjoint_image_mxu(jnp.asarray(K), n, kw, beta, deapod)
    err = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
    assert err < 1e-5, err


@pytest.mark.parametrize("deapod", [True, False])
def test_forward_kspace_mxu_matches_fft_chain(rng, deapod):
    nxos, n, kw = 128, 64, 2.0
    beta = kb_beta(kw, 2.0)
    img = (
        rng.standard_normal((2, n, n)) + 1j * rng.standard_normal((2, n, n))
    ).astype(np.complex64)
    x = pad_center(jnp.asarray(img), nxos)
    if deapod:
        x = deapodize(x, nxos, kw, beta)
    ref = centered_fft2(x)
    got = forward_kspace_mxu(jnp.asarray(img), nxos, kw, beta, deapod)
    err = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
    assert err < 1e-5, err


def test_mxu_dft_pair_is_adjoint(rng):
    nxos, n, kw = 128, 64, 2.0
    beta = kb_beta(kw, 2.0)
    x = (rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))).astype(
        np.complex64
    )
    y = (
        rng.standard_normal((nxos, nxos)) + 1j * rng.standard_normal((nxos, nxos))
    ).astype(np.complex64)
    Ax = forward_kspace_mxu(jnp.asarray(x), nxos, kw, beta)
    Aty = adjoint_image_mxu(jnp.asarray(y), n, kw, beta)
    lhs = complex(jnp.vdot(Ax, jnp.asarray(y)))
    rhs = complex(jnp.vdot(jnp.asarray(x), Aty))
    assert abs(lhs - rhs) / abs(lhs) < 1e-5


# --- bf16x3 dot variant (cfg.dft_dot="bf16x3") ------------------------------
# 3 MXU passes per real dot instead of HIGHEST's 6, via the hand-decomposed
# stacked real-plane sandwich (ops/fftops._sandwich_x3).  Accuracy target:
# ~1e-5 relative — far below the default bf16 gridding contraction's error.


@pytest.mark.parametrize("deapod", [True, False])
def test_adjoint_image_mxu_bf16x3_matches_highest(rng, deapod):
    nxos, n, kw = 128, 64, 2.0
    beta = kb_beta(kw, 2.0)
    K = (
        rng.standard_normal((3, nxos, nxos))
        + 1j * rng.standard_normal((3, nxos, nxos))
    ).astype(np.complex64)
    ref = adjoint_image_mxu(jnp.asarray(K), n, kw, beta, deapod, dot="highest")
    got = adjoint_image_mxu(jnp.asarray(K), n, kw, beta, deapod, dot="bf16x3")
    err = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
    assert err < 2e-4, err


@pytest.mark.parametrize("deapod", [True, False])
def test_forward_kspace_mxu_bf16x3_matches_highest(rng, deapod):
    nxos, n, kw = 128, 64, 2.0
    beta = kb_beta(kw, 2.0)
    img = (
        rng.standard_normal((2, n, n)) + 1j * rng.standard_normal((2, n, n))
    ).astype(np.complex64)
    ref = forward_kspace_mxu(jnp.asarray(img), nxos, kw, beta, deapod, dot="highest")
    got = forward_kspace_mxu(jnp.asarray(img), nxos, kw, beta, deapod, dot="bf16x3")
    err = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
    assert err < 2e-4, err


def test_solver_pins_dft_dot_to_highest(rng, monkeypatch):
    """cgnr_radial2d with cfg.dft_dot='bf16x3' must behave identically to
    'highest' — the solver pins the knob so the operator pair stays an exact
    adjoint pair (solver.cgnr_radial2d).

    dft_dot only takes effect inside the _on_tpu() MXU-DFT gate, so the
    gate is forced open here (backend='jnp' keeps the gridders on the dense
    XLA path, which is platform-independent) — on the bare CPU path the two
    configs would trace to identical programs and the test would be vacuous.
    The sanity check below proves the forced gate makes the knob observable
    in the plain recon path, i.e. that the solver equality is a real pin."""
    import dataclasses

    from tron_tpu import nufft
    from tron_tpu.config import ReconConfig
    from tron_tpu.solver import cgnr_radial2d
    from tron_tpu.trajectory import spoke_angles

    monkeypatch.setattr(nufft, "_on_tpu", lambda: True)

    nro, npe, nc = 32, 24, 2
    cfg = ReconConfig(
        angle_scheme="linear_full", adjoint=True, backend="jnp",
        dft_dot="highest",  # explicit: "auto" resolves to bf16x3 in fast mode
    )
    angles = spoke_angles(npe, "linear_full", 0)
    data = (
        rng.standard_normal((nc, npe, nro)) + 1j * rng.standard_normal((nc, npe, nro))
    ).astype(np.complex64)
    cfg3 = dataclasses.replace(cfg, dft_dot="bf16x3")

    # sanity: with the gate open, the knob is observable OUTSIDE the solver
    pa = nufft.nufft_adjoint(jnp.asarray(data), angles, cfg)
    pb = nufft.nufft_adjoint(jnp.asarray(data), angles, cfg3)
    assert float(jnp.max(jnp.abs(pa - pb))) > 0.0

    a = cgnr_radial2d(jnp.asarray(data), angles, cfg, niter=3)
    b = cgnr_radial2d(jnp.asarray(data), angles, cfg3, niter=3)
    assert float(jnp.max(jnp.abs(a - b))) == 0.0
