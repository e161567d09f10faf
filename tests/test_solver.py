"""CGNR iterative recon: must actually work (the reference's is broken,
src/tron.cu:670) — iterations should *reduce* data-domain residual and beat
the plain adjoint on undersampled data."""

import numpy as np
import jax.numpy as jnp

from tron_tpu.config import AngleScheme, ReconConfig
from tron_tpu.nufft import nufft_forward
from tron_tpu.phantom import shepp_logan
from tron_tpu.solver import cgnr_radial2d
from tron_tpu.trajectory import spoke_angles
from tests.conftest import lmse


def test_cgnr_improves_on_adjoint():
    n, npe = 32, 24  # undersampled (npe < pi/2 n)
    cfg = ReconConfig(angle_scheme=AngleScheme.LINEAR_HALF)
    img = shepp_logan(n)
    angles = jnp.asarray(spoke_angles(npe, AngleScheme.LINEAR_HALF))
    data = nufft_forward(jnp.asarray(img), angles, cfg)

    from tron_tpu.nufft import nufft_adjoint

    adj = np.asarray(nufft_adjoint(data, angles, cfg))
    x10 = np.asarray(cgnr_radial2d(data, angles, cfg, niter=10))

    e_adj = lmse(adj, img)
    e_cg = lmse(x10, img)
    assert e_cg < e_adj, f"CGNR ({e_cg:.3f}) should beat adjoint ({e_adj:.3f})"


def test_cgnr_monotone_data_residual():
    n, npe = 24, 16
    cfg = ReconConfig(angle_scheme=AngleScheme.LINEAR_HALF)
    img = shepp_logan(n)
    angles = jnp.asarray(spoke_angles(npe, AngleScheme.LINEAR_HALF))
    data = nufft_forward(jnp.asarray(img), angles, cfg)

    prev = np.inf
    for it in [1, 4, 12]:
        x = cgnr_radial2d(data, angles, cfg, niter=it)
        resid = float(jnp.linalg.norm(nufft_forward(x, angles, cfg) - data))
        assert resid < prev * 1.01
        prev = resid


def test_cgnr_operator_pair():
    """The explicit fast-kernel operator pair (grid as degrid's clip-mode
    adjoint): verified adjoint to ~1e-4, and its CGNR must converge like
    the transpose mode.  The two modes treat the outermost k-space ring
    differently (clip + drop readout 0 vs periodic wrap), so solutions
    agree closely but not bitwise — tightly at realistic sizes, loosely at
    the tiny n used here where the ring carries visible energy."""
    n, npe = 24, 20
    cfg = ReconConfig(angle_scheme=AngleScheme.LINEAR_HALF)
    img = shepp_logan(n)
    angles = jnp.asarray(spoke_angles(npe, AngleScheme.LINEAR_HALF))
    data = nufft_forward(jnp.asarray(img), angles, cfg)
    xt = np.asarray(cgnr_radial2d(data, angles, cfg, niter=6, operators="transpose"))
    xp = np.asarray(cgnr_radial2d(data, angles, cfg, niter=6, operators="pair"))
    err = np.linalg.norm(xp - xt) / np.linalg.norm(xt)
    assert err < 0.15, f"pair vs transpose CGNR nrmse={err:.2e}"
    # pair mode must actually solve its problem: beat the plain adjoint
    from tron_tpu.nufft import nufft_adjoint
    from tests.conftest import lmse

    adj = np.asarray(nufft_adjoint(data, angles, cfg))
    assert lmse(xp, img) < lmse(adj, img)
