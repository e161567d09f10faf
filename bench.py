#!/usr/bin/env python
"""Headline benchmark: golden-angle whole-body-class gridding recon
throughput on one chip.

Reference numbers (BASELINE.md): CUDA TRON reconstructs the whole-body CMT
dataset (nc=6, nro=512, npe1=20271, -u 0.4 -d 21 -a -G => 956 frames of
256^2) in 3.28 s on the paper GPU = ~183 Msamples/s of gridding throughput
(counting nz*nc*nro*npe1work coil-samples).  North-star target: >=100
Msamples/s per TPU chip.

This script times the same per-frame work (identical frame geometry and
recon pipeline) over a frame subset sized to keep the benchmark short, and
reports coil-samples/s.  Run on TPU (default platform); prints exactly one
JSON line.
"""

import json
import os
import sys
import time

import numpy as np

# default = the reference's full whole-body workload (956 frames,
# src/tron.cu:926 geometry); set BENCH_FRAMES=64 for a quicker run
NFRAMES = int(os.environ.get("BENCH_FRAMES", "956"))
BACKEND = os.environ.get("BENCH_BACKEND", "auto")


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tron")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from tron_tpu.config import ReconConfig
    from tron_tpu.recon import recon_frames

    # whole-body frame geometry: nro=512, npe1work=204, slide=21 (RUNME3:10)
    nc, nro, slide = 6, 512, 21
    cfg = ReconConfig(
        golden_angle=True, data_undersamp=0.4, prof_slide=slide, adjoint=True,
        backend=BACKEND,
    )
    work = cfg.npe1work(nro, 10**9)  # 204
    nz = NFRAMES
    npe1 = work + (nz - 1) * slide

    from tron_tpu.utils.xfer import to_device

    rng = np.random.default_rng(0)
    data = (
        rng.standard_normal((nc, npe1, nro)) + 1j * rng.standard_normal((nc, npe1, nro))
    ).astype(np.complex64)
    d = to_device(data)

    def run(x):
        out = recon_frames(x, cfg, work, slide, nz)
        # force completion with a scalar readback: block_until_ready alone
        # does not reliably block through tunneled TPU clients
        return float(jnp.sum(jnp.abs(out)))

    run(d)  # warmup/compile (incl. the scaling multiply below)
    run(d * 1.0001)

    reps = 3
    t0 = time.perf_counter()
    for i in range(reps):
        run(d * (1.0 + 0.0001 * i))
    dt = (time.perf_counter() - t0) / reps

    samples = nz * nc * nro * work
    msps = samples / dt / 1e6
    frames_s = nz / dt

    # --- accuracy story (structured data, fp32 anchor) ---------------------
    # One whole-body-geometry frame of phantom-derived multicoil data
    # (analytic Shepp-Logan x birdcage coils, degridded to the golden-angle
    # trajectory), reconstructed three ways: Pallas bf16 (the headline
    # path), Pallas bf16x3 (--precision accurate), and the XLA dense-einsum
    # gridder forced to fp32-grade matmul precision as the anchor.  The
    # BASELINE.md gate: accurate-mode NRMSE < 1e-3 vs the fp32 anchor.
    from tron_tpu.nufft import nufft_adjoint, nufft_forward
    from tron_tpu.phantom import birdcage_sensitivities, shepp_logan
    from tron_tpu.trajectory import spoke_angles
    from tron_tpu.utils.xfer import to_host
    import dataclasses

    n = nro // 2
    img = shepp_logan(n)[None] * birdcage_sensitivities(n, nc)
    angles = spoke_angles(work, "golden", 0)
    cfg_j = dataclasses.replace(cfg, backend="jnp")
    imgd = to_device(img.astype(np.complex64))
    data_s = jax.jit(lambda x: nufft_forward(x, angles, cfg_j, nro=nro))(imgd)

    a16 = to_host(jax.jit(lambda x: nufft_adjoint(x, angles, cfg))(data_s))
    cfg_a = dataclasses.replace(cfg, matmul_dtype="bf16x3")
    a163 = to_host(jax.jit(lambda x: nufft_adjoint(x, angles, cfg_a))(data_s))
    with jax.default_matmul_precision("float32"):
        ref = to_host(jax.jit(lambda x: nufft_adjoint(x, angles, cfg_j))(data_s))

    def nrmse(x, y):
        return float(np.linalg.norm(x - y) / np.linalg.norm(y))

    nrmse_bf16, nrmse_bf16x3 = nrmse(a16, ref), nrmse(a163, ref)

    # bf16x3 (--precision accurate) throughput over a short frame subset
    nz_a = min(64, nz)
    da = d[:, : work + (nz_a - 1) * slide]

    def run_acc(x):
        out = recon_frames(x, cfg_a, work, slide, nz_a)
        return float(jnp.sum(jnp.abs(out)))

    run_acc(da)
    run_acc(da * 1.0001)
    t0 = time.perf_counter()
    for i in range(reps):
        run_acc(da * (1.0 + 0.0001 * i))
    dt_a = (time.perf_counter() - t0) / reps
    msps_acc = nz_a * nc * nro * work / dt_a / 1e6

    # koosh (-3) stack-of-stars: kz slices through the single-jit device
    # path (incl. host<->device transfers, the honest end-to-end rate)
    from tron_tpu.recon import recon_radial2d

    nro_k, npe2_k = 256, 8
    cfg_k = dataclasses.replace(cfg, koosh=True, prof_slide=0, data_undersamp=1.0)
    work_k = cfg_k.npe1work(nro_k, 10**9)
    dk = (
        rng.standard_normal((nc, 1, nro_k, work_k, npe2_k))
        + 1j * rng.standard_normal((nc, 1, nro_k, work_k, npe2_k))
    ).astype(np.complex64)
    recon_radial2d(dk, cfg_k)
    recon_radial2d(dk, cfg_k)  # second warmup: settles tunnel transfer state
    t0 = time.perf_counter()
    for _ in range(reps):
        recon_radial2d(dk, cfg_k)
    koosh_slices_s = npe2_k / ((time.perf_counter() - t0) / reps)

    baseline_msps = 183.0  # derived reference throughput (BASELINE.md)
    print(
        json.dumps(
            {
                "metric": "gridding_throughput_whole_body",
                "value": round(msps, 2),
                "unit": "Msamples/s/chip",
                "vs_baseline": round(msps / baseline_msps, 3),
                "frames_per_s": round(frames_s, 2),
                "nrmse_bf16_vs_fp32": round(nrmse_bf16, 6),
                "nrmse_accurate_vs_fp32": round(nrmse_bf16x3, 7),
                "accurate_msamples_per_s": round(msps_acc, 2),
                "koosh_slices_per_s": round(koosh_slices_s, 2),
                "frames": nz,
                "seconds_per_run": round(dt, 3),
                "platform": jax.devices()[0].platform,
                "backend": BACKEND,
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
