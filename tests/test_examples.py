"""The examples/ scripts must stay runnable (subprocess: each sets its own
platform/XLA flags)."""

import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.parametrize(
    "script, args",
    [
        ("01_phantom_roundtrip.py", ["--cpu", "--n", "48", "--npe", "96"]),
        ("02_cgnr_and_coils.py",
         ["--cpu", "--n", "48", "--npe", "72", "--niter", "3"]),
        ("03_sharded_recon.py", ["--n", "32", "--frames", "8"]),
    ],
)
def test_example_runs(script, args):
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # example 3 sets its own device count
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "examples", script), *args],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
    )
    assert proc.returncode == 0, f"{script}: {proc.stdout}\n{proc.stderr}"
    assert "NRMSE" in proc.stdout
