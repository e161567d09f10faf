"""Pallas gridding kernel vs the jnp reference implementation (interpret
mode, so it runs on the CPU test mesh; the same kernel compiles for TPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tron_tpu.config import AngleScheme
from tron_tpu.kernels.kb import kb_beta
from tron_tpu.ops.grid import grid_radial2d
from tron_tpu.trajectory import spoke_angles
from tests.conftest import nrmse

grid_pallas = pytest.importorskip("tron_tpu.ops.grid_pallas")


def _case(rng, C, npe, nxos, nro, scheme=AngleScheme.GOLDEN, skip=5):
    data = (
        rng.standard_normal((C, npe, nro)) + 1j * rng.standard_normal((C, npe, nro))
    ).astype(np.complex64)
    angles = jnp.asarray(spoke_angles(npe, scheme, skip))
    return jnp.asarray(data), angles


@pytest.mark.parametrize("C,npe,n,tile", [(2, 12, 128, 128), (1, 9, 256, 128)])
def test_pallas_matches_jnp(rng, C, npe, n, tile):
    nxos = nro = n
    kw = 2.0
    beta = kb_beta(kw, 2.0)
    data, angles = _case(rng, C, npe, nxos, nro)
    want = np.asarray(grid_radial2d(data, angles, nxos, kw, beta))
    got = np.asarray(
        grid_pallas.grid_radial2d_pallas(
            data, angles, nxos, kw, beta, pe_chunk=4, tile=tile, interpret=True
        )
    )
    assert got.shape == want.shape
    err = nrmse(got, want)
    assert err < 1e-5, f"pallas vs jnp nrmse={err:.2e}"


def test_pallas_bf16_accuracy(rng):
    nxos = nro = 128
    kw = 2.0
    beta = kb_beta(kw, 2.0)
    data, angles = _case(rng, 2, 16, nxos, nro)
    want = np.asarray(grid_radial2d(data, angles, nxos, kw, beta))
    got = np.asarray(
        grid_pallas.grid_radial2d_pallas(
            data, angles, nxos, kw, beta, pe_chunk=8, tile=128,
            matmul_dtype="bfloat16", interpret=True,
        )
    )
    err = nrmse(got, want)
    assert err < 2e-2, f"bf16 pallas vs fp32 jnp nrmse={err:.2e}"


def test_pallas_2d_input(rng):
    nxos = nro = 128
    beta = kb_beta(2.0, 2.0)
    data, angles = _case(rng, 1, 8, nxos, nro)
    got = np.asarray(
        grid_pallas.grid_radial2d_pallas(
            data[0], angles, nxos, 2.0, beta, pe_chunk=8, interpret=True
        )
    )
    want = np.asarray(grid_radial2d(data[0], angles, nxos, 2.0, beta))
    assert nrmse(got, want) < 1e-5
