"""Test configuration: run everything on a virtual 8-device CPU mesh so
multi-chip sharding logic is exercised without TPU hardware (SURVEY.md §4).

Note: this environment pre-sets JAX_PLATFORMS=axon (a TPU tunnel) and the
plugin overrides the env var, so the platform is forced via jax.config
before any backend initialization."""

import os

# TRON_TPU_TESTS=1 leaves the real TPU platform in place so the hardware
# parity suite (tests/test_tpu_parity.py) can run.  Use it with that file
# only — the rest of the suite assumes the 8-device CPU mesh (tolerances
# are fp32-grade and sharding tests want 8 devices).
_USE_TPU = os.environ.get("TRON_TPU_TESTS", "") not in ("", "0")

if not _USE_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
else:
    # keep the TPU platform as default but make the in-process CPU backend
    # reachable too: the parity tests compute their XLA reference goldens
    # under jax.default_device(cpu) — running the dense reference gridder on
    # TPU cost up to 290 s per case
    plats = os.environ.get("JAX_PLATFORMS", "")
    if plats and "cpu" not in plats.split(","):
        os.environ["JAX_PLATFORMS"] = plats + ",cpu"

import jax  # noqa: E402

if _USE_TPU:
    # persistent compilation cache: makes the hardware suite affordable as a
    # routine gate (bench.py already uses the same cache dir)
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tron")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

if not _USE_TPU:
    jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_num_cpu_devices", 8)
    except Exception:
        pass  # XLA_FLAGS fallback above

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


def nrmse(a, b):
    """Normalized RMSE, the reference's accuracy metric (src/rmse.m, lmse.m)."""
    a = np.asarray(a)
    b = np.asarray(b)
    return float(np.linalg.norm(a - b) / np.linalg.norm(b))


def lmse(a, b):
    """Least-squares-scaled NRMSE (scale-invariant), like src/lmse.m."""
    a = np.asarray(a).ravel()
    b = np.asarray(b).ravel()
    s = np.vdot(a, b) / np.vdot(a, a)
    return nrmse(s * a, b)
