"""Pallas degrid kernel vs the gather/dense backends (interpret mode).

The Pallas kernel clips KB footprints at the grid boundary (matching the
gridding kernel) while gather/dense wrap; comparisons therefore zero the
outermost readouts, where the conventions legitimately differ.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tron_tpu.config import AngleScheme
from tron_tpu.kernels.kb import kb_beta
from tron_tpu.ops.degrid import degrid_radial2d
from tron_tpu.trajectory import spoke_angles
from tests.conftest import nrmse

dp = pytest.importorskip("tron_tpu.ops.degrid_pallas")


def _interior_mask(nro, kw=2):
    ro = np.arange(nro)
    return (np.abs(ro - nro // 2) <= nro // 2 - kw - 2) & (ro != 0)


@pytest.mark.parametrize("C,npe,n", [(2, 12, 256), (1, 23, 384)])
def test_pallas_degrid_matches_gather_interior(rng, C, npe, n):
    beta = kb_beta(2.0, 2.0)
    g = (rng.standard_normal((C, n, n)) + 1j * rng.standard_normal((C, n, n))).astype(
        np.complex64
    )
    angles = jnp.asarray(spoke_angles(npe, AngleScheme.GOLDEN, 7))
    want = np.asarray(
        degrid_radial2d(jnp.asarray(g), angles, n, 2.0, beta, backend="gather")
    )
    got = np.asarray(
        dp.degrid_radial2d_pallas(
            jnp.asarray(g), angles, n, 2.0, beta, pe_chunk=4,
            matmul_dtype="float32", interpret=True,
        )
    )
    m = _interior_mask(n)
    err = nrmse(got[..., m], want[..., m])
    assert err < 2e-4, f"pallas degrid vs gather (interior) nrmse={err:.2e}"


def test_pallas_degrid_linear(rng):
    n, npe = 256, 10
    beta = kb_beta(2.0, 2.0)
    g = (rng.standard_normal((1, n, n)) + 1j * rng.standard_normal((1, n, n))).astype(
        np.complex64
    )
    angles = jnp.asarray(spoke_angles(npe, AngleScheme.LINEAR_HALF))
    want = np.asarray(degrid_radial2d(jnp.asarray(g), angles, n, 2.0, beta, backend="gather"))
    got = np.asarray(
        dp.degrid_radial2d_pallas(
            jnp.asarray(g), angles, n, 2.0, beta, pe_chunk=8,
            matmul_dtype="float32", interpret=True,
        )
    )
    m = _interior_mask(n)
    assert nrmse(got[..., m], want[..., m]) < 2e-4


def test_pallas_degrid_fallback_small(rng):
    """Small grids dispatch to the dense backend transparently — in the
    kernel's CLIP convention (wrap=False): callers wanting the reference's
    periodic wrap patch the boundary readouts on top (nufft_forward)."""
    n, npe = 64, 8
    beta = kb_beta(2.0, 2.0)
    g = (rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))).astype(np.complex64)
    angles = jnp.asarray(spoke_angles(npe, AngleScheme.GOLDEN, 0))
    got = np.asarray(dp.degrid_radial2d_pallas(jnp.asarray(g), angles, n, 2.0, beta))
    want = np.asarray(
        degrid_radial2d(
            jnp.asarray(g), angles, n, 2.0, beta, backend="gather", wrap=False
        )
    )
    assert nrmse(got, want) < 2e-4


def test_pallas_degrid_bf16x3_fp32_grade(rng):
    """Compensated bf16x3 degrid ~ fp32 (interpret mode evaluates the
    bf16 splits exactly, so this checks the compensation algebra)."""
    beta = kb_beta(2.0, 2.0)
    C, npe, n = 2, 12, 256
    g = (rng.standard_normal((C, n, n)) + 1j * rng.standard_normal((C, n, n))).astype(
        np.complex64
    )
    angles = jnp.asarray(spoke_angles(npe, AngleScheme.GOLDEN, 3))
    want = np.asarray(
        dp.degrid_radial2d_pallas(
            jnp.asarray(g), angles, n, 2.0, beta, pe_chunk=4,
            matmul_dtype="float32", interpret=True,
        )
    )
    got = np.asarray(
        dp.degrid_radial2d_pallas(
            jnp.asarray(g), angles, n, 2.0, beta, pe_chunk=4,
            matmul_dtype="bf16x3", interpret=True,
        )
    )
    m = _interior_mask(n)
    err = nrmse(got[..., m], want[..., m])
    assert err < 1e-4, f"{err:.2e}"


def test_pallas_degrid_oversized_ws_clamped(rng):
    """A tuned short-window larger than nxos/2 must be clamped (as on the
    grid side): unclamped it inverts the w0 clip in _chord_tables and
    double-counts near-origin samples."""
    from tron_tpu.config import KernelTuning

    n, npe, C = 256, 9, 1
    beta = kb_beta(2.0, 2.0)
    g = (rng.standard_normal((C, n, n)) + 1j * rng.standard_normal((C, n, n))).astype(
        np.complex64
    )
    angles = jnp.asarray(spoke_angles(npe, AngleScheme.GOLDEN, 3))
    base = np.asarray(
        dp.degrid_radial2d_pallas(
            jnp.asarray(g), angles, n, 2.0, beta, pe_chunk=4,
            matmul_dtype="float32", interpret=True, tuning=KernelTuning(),
        )
    )
    big = np.asarray(
        dp.degrid_radial2d_pallas(
            jnp.asarray(g), angles, n, 2.0, beta, pe_chunk=4,
            matmul_dtype="float32", interpret=True, tuning=KernelTuning(ws=200),
        )
    )
    assert nrmse(big, base) < 1e-6, nrmse(big, base)


@pytest.mark.parametrize("mm", ["float32", "bf16x3"])
def test_pallas_degrid_batched_matches_loop(rng, mm):
    """KernelTuning(batched=True) statically unrolls the per-hit loop with
    0/1-masked padded slots.  float32 mode must be bitwise-equal to the
    loop kernel (same per-hit math and store order, masked adds of exact
    zeros); bf16x3 stays within rounding-path noise of the loop kernel."""
    from tron_tpu.config import KernelTuning

    n, npe, C = 256, 11, 2
    beta = kb_beta(2.0, 2.0)
    g = (rng.standard_normal((C, n, n)) + 1j * rng.standard_normal((C, n, n))).astype(
        np.complex64
    )
    angles = jnp.asarray(spoke_angles(npe, AngleScheme.GOLDEN, 5))
    loop = np.asarray(
        dp.degrid_radial2d_pallas(
            jnp.asarray(g), angles, n, 2.0, beta, pe_chunk=4,
            matmul_dtype=mm, interpret=True, tuning=KernelTuning(),
        )
    )
    batched = np.asarray(
        dp.degrid_radial2d_pallas(
            jnp.asarray(g), angles, n, 2.0, beta, pe_chunk=4,
            matmul_dtype=mm, interpret=True, tuning=KernelTuning(batched=True),
        )
    )
    if mm == "float32":
        np.testing.assert_array_equal(batched, loop)
    else:
        assert nrmse(batched, loop) < 1e-5, nrmse(batched, loop)


@pytest.mark.parametrize("gridos", [1.5, 2.5])
def test_pallas_degrid_nondefault_gridos(rng, gridos):
    """gridos != 2: sample radii live on the affine row lattice
    (radius = (ro - nro/2) * nxos/nro, the reference's exact forward
    geometry at any osf, src/tron.cu:553-556).  Kernel vs the dense
    backend on the interior (clip vs wrap differ only at the edges,
    ~kw*nro/nxos readouts here)."""
    nro = 256
    nxos = int((nro // 2) * gridos)  # 192 / 320 -- not tileable at 128
    # use a 512-readout geometry so the grid tiles: n image 256
    nro = 512
    nxos = int((nro // 2) * gridos)  # 384 / 640
    beta = kb_beta(2.0, gridos)
    g = (rng.standard_normal((1, nxos, nxos))
         + 1j * rng.standard_normal((1, nxos, nxos))).astype(np.complex64)
    angles = jnp.asarray(spoke_angles(9, AngleScheme.GOLDEN, 3))
    want = np.asarray(
        degrid_radial2d(jnp.asarray(g), angles, nro, 2.0, beta,
                        backend="dense", wrap=False)
    )
    got = np.asarray(
        dp.degrid_radial2d_pallas(
            jnp.asarray(g), angles, nro, 2.0, beta, pe_chunk=4,
            matmul_dtype="float32", interpret=True,
        )
    )
    ekw = int(np.ceil(2.0 * nro / nxos)) + 2
    ro = np.arange(nro)
    m = (ro >= ekw) & (ro < nro - ekw) & (ro != 0)
    err = nrmse(got[..., m], want[..., m])
    assert err < 2e-4, f"pallas degrid at gridos={gridos} nrmse={err:.2e}"


@pytest.mark.parametrize("gridos", [1.5, 2.5])
def test_wrap_patch_nondefault_gridos(rng, gridos):
    """The wrap-edge patch at gridos != 2 (scaled edge-readout count): the
    clip-mode kernel output plus the exact wrapped patch must equal the
    dense wrap backend at EVERY readout — full spokes, no interior mask."""
    from tron_tpu.nufft import _patch_degrid_wrap_edges

    nro = 512
    nxos = int((nro // 2) * gridos)  # 384 / 640
    beta = kb_beta(2.0, gridos)
    g = (rng.standard_normal((1, nxos, nxos))
         + 1j * rng.standard_normal((1, nxos, nxos))).astype(np.complex64)
    angles = jnp.asarray(spoke_angles(6, AngleScheme.GOLDEN, 1))
    clip = dp.degrid_radial2d_pallas(
        jnp.asarray(g), angles, nro, 2.0, beta, pe_chunk=4,
        matmul_dtype="float32", interpret=True,
    )
    got = np.asarray(
        _patch_degrid_wrap_edges(
            clip, jnp.asarray(g), angles, nro, 2.0, beta, precision="highest"
        )
    )
    want = np.asarray(
        degrid_radial2d(jnp.asarray(g), angles, nro, 2.0, beta,
                        backend="dense", wrap=True)
    )
    err = nrmse(got, want)
    assert err < 2e-4, f"wrap patch at gridos={gridos} nrmse={err:.2e}"


def test_untileable_fallback_wrap_composition(rng):
    """Regression (round-4 review): on an untileable grid the Pallas
    entry's dense fallback must keep the CLIP convention so
    nufft_forward(wrap=False) — the CGNR pair's forward at any gridos —
    stays the exact transpose of the clip-mode adjoint; and with wrap=True
    the edge patch on top must reproduce the reference's periodic wrap."""
    import dataclasses

    from tron_tpu.config import ReconConfig
    from tron_tpu.nufft import nufft_forward

    # gridos=1.5, nro=256 -> nxos=192: not a multiple of 128 => fallback
    nro, npe, gridos = 256, 10, 1.5
    n = nro // 2
    nxos = int(n * gridos)
    assert nxos % 128 != 0
    beta = kb_beta(2.0, gridos)
    cfg = ReconConfig(gridos=gridos, golden_angle=True, backend="pallas")
    img = (rng.standard_normal((1, n, n)) + 1j * rng.standard_normal((1, n, n))
           ).astype(np.complex64)
    angles = jnp.asarray(spoke_angles(npe, AngleScheme.GOLDEN, 0))

    cfg_d = dataclasses.replace(cfg, backend="jnp")
    for wrap in (False, True):
        got = np.asarray(
            nufft_forward(jnp.asarray(img), angles, cfg, nro=nro, wrap=wrap)
        )
        want = np.asarray(
            nufft_forward(jnp.asarray(img), angles, cfg_d, nro=nro, wrap=wrap)
        )
        err = nrmse(got, want)
        assert err < 1e-5, f"wrap={wrap}: pallas-entry fallback nrmse={err:.2e}"
    # and the conventions must actually differ at the boundary readouts
    # (otherwise this test guards nothing)
    a = np.asarray(nufft_forward(jnp.asarray(img), angles, cfg, nro=nro, wrap=True))
    b = np.asarray(nufft_forward(jnp.asarray(img), angles, cfg, nro=nro, wrap=False))
    assert nrmse(a, b) > 1e-6
