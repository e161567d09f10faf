"""KernelTuning selection: per-geometry defaults + env overrides.

The per-geometry table is the analog of re-running the reference's -B/-T
launch tuning per dataset class (`src/tron.cu:831-832`): defaults are keyed
on the oversampled grid size and TRON_* env overrides always win.
"""

from tron_tpu.config import KernelTuning, ReconConfig


def test_for_geometry_256_class():
    t256 = KernelTuning.for_geometry(256)
    assert t256.ws == 24  # measured 256^2 optimum (NOTES.md round-4 scan)
    assert KernelTuning.for_geometry(128).ws == 24


def test_for_geometry_512_class_keeps_whole_body_optimum():
    base = KernelTuning()
    for nxos in (384, 512, None):
        assert KernelTuning.for_geometry(nxos) == base


def test_for_geometry_large_grid_raises_vmem_cap():
    # nxos > 512 (osf > 2 on 512-readout data, or 1024-readout inputs):
    # the windowed gridder's scoped-vmem demand measured 16.26 MB at
    # nxos=640 — over XLA's 16 MB default cap (a deterministic compile
    # OOM), so the per-geometry default must raise it
    for nxos in (640, 1024):
        assert KernelTuning.for_geometry(nxos).vmem_limit >= 24 * 1024 * 1024
    # ...while the measured-fastest default (16 MB cap) stays at <= 512
    assert KernelTuning.for_geometry(512).vmem_limit == 0


def test_from_env_threads_geometry(monkeypatch):
    monkeypatch.delenv("TRON_WS", raising=False)
    assert KernelTuning.from_env(256).ws == 24
    assert KernelTuning.from_env(512).ws == KernelTuning().ws
    assert KernelTuning.from_env().ws == KernelTuning().ws


def test_env_override_beats_geometry(monkeypatch):
    monkeypatch.setenv("TRON_WS", "40")
    assert KernelTuning.from_env(256).ws == 40
    assert KernelTuning.from_env(512).ws == 40


def test_recon_config_explicit_tuning_wins(monkeypatch):
    monkeypatch.setenv("TRON_WS", "40")
    cfg = ReconConfig(tuning=KernelTuning(ws=64))
    assert cfg.kernel_tuning(256).ws == 64
    assert ReconConfig().kernel_tuning(256).ws == 40


def test_dft_dot_auto_resolution():
    """"auto" follows the gridding contraction dtype: bf16x3 when gridding
    is plain bf16 (fast mode — its ~3e-3 error dwarfs the epilogue's),
    highest otherwise; explicit settings always win."""
    assert ReconConfig().dft_dot_resolved() == "bf16x3"
    assert ReconConfig(matmul_dtype="bf16x3").dft_dot_resolved() == "highest"
    assert ReconConfig(matmul_dtype="float32").dft_dot_resolved() == "highest"
    assert ReconConfig(dft_dot="highest").dft_dot_resolved() == "highest"
    assert (
        ReconConfig(dft_dot="bf16x3", matmul_dtype="float32").dft_dot_resolved()
        == "bf16x3"
    )
