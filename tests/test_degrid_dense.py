"""Dense (MXU) degrid backend must match the gather backend exactly."""

import numpy as np
import jax.numpy as jnp

from tron_tpu.config import AngleScheme
from tron_tpu.kernels.kb import kb_beta
from tron_tpu.ops.degrid import degrid_radial2d, _degrid_dense
from tron_tpu.trajectory import spoke_angles
from tests.conftest import nrmse


def _case(rng, C, n):
    g = (rng.standard_normal((C, n, n)) + 1j * rng.standard_normal((C, n, n))).astype(
        np.complex64
    )
    return jnp.asarray(g)


def test_dense_matches_gather(rng):
    n, npe, nro = 64, 20, 64
    beta = kb_beta(2.0, 2.0)
    g = _case(rng, 2, n)
    angles = jnp.asarray(spoke_angles(npe, AngleScheme.GOLDEN, 3))
    want = np.asarray(degrid_radial2d(g, angles, nro, 2.0, beta, backend="gather"))
    got = np.asarray(_degrid_dense(g, angles, nro, 2.0, beta, pe_chunk=8))
    assert got.shape == want.shape
    assert nrmse(got, want) < 2e-4  # fp32 reassociation at KB-weight magnitudes ~1e2


def test_dense_boundary_wrap(rng):
    """Samples at the outermost radii exercise the periodic wrap."""
    n, npe, nro = 32, 9, 32
    beta = kb_beta(2.0, 2.0)
    g = _case(rng, 1, n)
    angles = jnp.asarray(spoke_angles(npe, AngleScheme.LINEAR_HALF))
    want = np.asarray(degrid_radial2d(g, angles, nro, 2.0, beta, backend="gather"))
    got = np.asarray(_degrid_dense(g, angles, nro, 2.0, beta, pe_chunk=4))
    assert nrmse(got, want) < 2e-4  # fp32 reassociation at KB-weight magnitudes ~1e2


def test_dense_no_channel_axis(rng):
    n, npe = 32, 11
    beta = kb_beta(2.0, 2.0)
    g = _case(rng, 1, n)[0]
    angles = jnp.asarray(spoke_angles(npe, AngleScheme.GOLDEN, 0))
    want = np.asarray(degrid_radial2d(g, angles, n, 2.0, beta, backend="gather"))
    got = np.asarray(_degrid_dense(g, angles, n, 2.0, beta))
    assert nrmse(got, want) < 2e-4  # fp32 reassociation at KB-weight magnitudes ~1e2
