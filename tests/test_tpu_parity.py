"""Hardware parity checks — run on a real TPU (skipped on the CPU test
mesh): the compiled Pallas kernels must match the XLA reference backends at
the bf16 noise floor across geometries.  These are the tests behind the
numbers in NOTES.md; run with JAX_PLATFORMS unset on a TPU host:

    JAX_PLATFORMS= python -m pytest tests/test_tpu_parity.py -q --no-header
"""

import numpy as np
import pytest


def _tpu():
    import jax

    try:
        dev = jax.devices()[0]
        return "tpu" in (dev.platform or "").lower() or "TPU" in getattr(
            dev, "device_kind", ""
        )
    except Exception:
        return False


pytestmark = pytest.mark.skipif(not _tpu(), reason="needs real TPU hardware")


@pytest.mark.parametrize("nxos", [256, 512])
def test_grid_pallas_vs_xla_on_tpu(rng, nxos):
    import jax
    import jax.numpy as jnp

    from tron_tpu.config import AngleScheme
    from tron_tpu.kernels.kb import kb_beta
    from tron_tpu.ops.grid import grid_radial2d
    from tron_tpu.ops.grid_pallas import grid_radial2d_pallas
    from tron_tpu.trajectory import spoke_angles
    from tron_tpu.utils.xfer import to_device, to_host

    C, npe = 3, 41
    kw, beta = 2.0, kb_beta(2.0, 2.0)
    data = (
        rng.standard_normal((C, npe, nxos)) + 1j * rng.standard_normal((C, npe, nxos))
    ).astype(np.complex64)
    angles = jnp.asarray(spoke_angles(npe, AngleScheme.GOLDEN, 3))
    d = to_device(data)
    got = to_host(grid_radial2d_pallas(d, angles, nxos, kw, beta))
    want = to_host(jax.jit(grid_radial2d, static_argnums=(2, 3, 4))(d, angles, nxos, kw, beta))
    err = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert err < 1e-2, f"nxos={nxos}: {err:.2e}"


def test_degrid_pallas_vs_dense_on_tpu(rng):
    import jax
    import jax.numpy as jnp

    from tron_tpu.config import AngleScheme
    from tron_tpu.kernels.kb import kb_beta
    from tron_tpu.ops.degrid import _degrid_dense
    from tron_tpu.ops.degrid_pallas import degrid_radial2d_pallas
    from tron_tpu.trajectory import spoke_angles
    from tron_tpu.utils.xfer import to_device, to_host

    n, C, npe = 256, 2, 33
    kw, beta = 2.0, kb_beta(2.0, 2.0)
    g = (rng.standard_normal((C, n, n)) + 1j * rng.standard_normal((C, n, n))).astype(
        np.complex64
    )
    angles = jnp.asarray(spoke_angles(npe, AngleScheme.GOLDEN, 0))
    G = to_device(g)
    got = to_host(degrid_radial2d_pallas(G, angles, n, kw, beta))
    want = to_host(jax.jit(lambda x: _degrid_dense(x, angles, n, kw, beta))(G))
    ro = np.arange(n)
    m = (np.abs(ro - n // 2) <= n // 2 - 4) & (ro != 0)
    err = np.linalg.norm(got[..., m] - want[..., m]) / np.linalg.norm(want[..., m])
    assert err < 1e-2, f"{err:.2e}"
