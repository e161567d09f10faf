#!/usr/bin/env python
"""Dissect the incremental headline run: delta-gridding vs MXU epilogue vs
residual scan overhead, plus an A/B of the epilogue dot algorithm
(HIGHEST 6-pass vs BF16_BF16_F32_X3 3-pass).

The headline (bench.py) times recon_frames_incremental over the 956-frame
whole-body workload.  Three measurements split the wall:

  full       — the production path, as benched
  grid_only  — the same telescoping scan with the per-frame epilogue
               replaced by a cheap checksum of the carried k-grid, so the
               wall is delta-gridding + scan/carry overhead
  epi_only   — lax.map of the per-frame epilogue (+SoS combine) over nz
               scaled copies of one k-grid (no gridding at all)

full - grid_only ~= epilogue share; grid_only - (epi-free floor) is the
carry/slice overhead.  Run on the real chip; prints a small JSON.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NFRAMES = int(os.environ.get("DISSECT_FRAMES", "956"))
INTERPRET = os.environ.get("DISSECT_INTERPRET", "0") == "1"  # CPU smoke runs


def main():
    import jax

    from tron_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    if INTERPRET:
        # CPU smoke: the axon plugin overrides JAX_PLATFORMS=cpu from the
        # environment, so pin the platform before first backend use
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from tron_tpu.config import ReconConfig
    from tron_tpu.kernels.kb import kb_beta
    from tron_tpu.nufft import _adjoint_epilogue
    from tron_tpu.ops.coil import coil_combine_sos
    from tron_tpu.recon import recon_frames_incremental
    from tron_tpu.utils.xfer import to_device

    nc, slide = 6, 21
    nro = int(os.environ.get("DISSECT_NRO", "512"))
    cfg = ReconConfig(
        golden_angle=True, data_undersamp=0.4, prof_slide=slide, adjoint=True,
        dft_dot=os.environ.get("DISSECT_DFT_DOT", "highest"),
    )
    work = cfg.npe1work(nro, 10**9)
    nz = NFRAMES
    n = nro // 2
    nxos = int(n * cfg.gridos)
    beta = kb_beta(cfg.kernwidth, cfg.gridos, cfg.beatty)

    rng = np.random.default_rng(0)
    npe1 = work + (nz - 1) * slide
    data = (
        rng.standard_normal((nc, npe1, nro))
        + 1j * rng.standard_normal((nc, npe1, nro))
    ).astype(np.complex64)
    d = to_device(data)

    def timeit(run, reps=3, tag=""):
        t = time.perf_counter()
        run(1.0)
        print(
            f"[dissect] {tag}: compile+first {time.perf_counter() - t:.1f}s",
            file=sys.stderr, flush=True,
        )
        run(1.0001)
        t0 = time.perf_counter()
        for i in range(reps):
            run(1.0 + 0.0001 * i)
        dt = (time.perf_counter() - t0) / reps
        print(f"[dissect] {tag}: {dt:.5f} s", file=sys.stderr, flush=True)
        return dt

    out = {"frames": nz}
    samples = nz * nc * nro * work

    # --- full production path ------------------------------------------------
    def run_full(s):
        r = recon_frames_incremental(d * s, cfg, work, slide, nz)
        return float(jnp.sum(jnp.abs(r)))

    out["full_s"] = timeit(run_full, tag="full")
    out["full_msps"] = round(samples / out["full_s"] / 1e6, 1)

    # --- grid-only: same scan, checksum epilogue ------------------------------
    from tron_tpu.recon import incremental_scan
    from tron_tpu.nufft import sdc_weights
    from tron_tpu.ops.grid_pallas import (
        grid_radial2d_pallas_planes,
        to_sample_planes,
    )
    from tron_tpu.trajectory import spoke_angles

    import functools

    @functools.partial(jax.jit, static_argnames=())
    def grid_only(dd):
        w = sdc_weights(cfg, nro, work).astype(dd.dtype)
        src = to_sample_planes(dd * w, nxos)
        scheme = cfg.scheme_for("adjoint")

        def window(pe0, m):
            return jax.lax.dynamic_slice_in_dim(src, pe0, m, axis=0)

        def angles_of(pe0, m):
            return spoke_angles(m, scheme, pe0)

        def gridw(win, angles):
            return grid_radial2d_pallas_planes(
                win, angles, nxos, cfg.kernwidth, beta,
                matmul_dtype=cfg.matmul_dtype, tuning=cfg.tuning,
                interpret=INTERPRET,
            )

        def frame_image(kg):
            # cheap checksum: one lane of the carried grid (keeps the carry
            # live without an O(nxos^2) reduction per frame)
            return jnp.abs(kg[..., 0, :]).sum()

        return incremental_scan(
            window, angles_of, gridw, frame_image, work, slide, nz,
            block=cfg.kernel_tuning(nxos).inc_block,
        ).sum()

    out["grid_only_s"] = timeit(
        lambda s: float(grid_only(d * s)), tag="grid_only"
    )

    # --- epilogue-only: lax.map of epilogue+SoS over nz grids ----------------
    kg1 = (
        rng.standard_normal((nc, nxos, nxos))
        + 1j * rng.standard_normal((nc, nxos, nxos))
    ).astype(np.complex64)
    kgd = to_device(kg1)

    @jax.jit
    def epi_only(kg, s):
        def one(z):
            img = _adjoint_epilogue(kg * (s + 1e-6 * z), n, cfg, beta)
            return jnp.abs(coil_combine_sos(img, axis=0))

        return jax.lax.map(one, jnp.arange(nz, dtype=jnp.float32)).sum()

    out["epi_only_s"] = timeit(lambda s: float(epi_only(kgd, jnp.float32(s))), tag="epi_only")

    # --- epilogue X3 A/B ------------------------------------------------------
    # NB: DotAlgorithmPreset on COMPLEX einsum operands is silently
    # mis-lowered (measured NRMSE 0.86 vs HIGHEST on CPU for a plain complex
    # matmul), so the X3 variant decomposes into real-plane matmuls manually
    # (stacked [Mr; Mi] so XLA sees 2 big real dots per side instead of 8).
    from tron_tpu.ops import fftops

    # host numpy, NOT a device array: jit embeds it as an ir constant, and
    # fetching a complex64 device array back for that hits the axon client's
    # unimplemented complex D2H transfer
    M = fftops._centered_dft_mat(n, nxos, cfg.kernwidth, beta, True)
    def epi_highest(kg, s, z):
        kgz = kg * (s + 1e-6 * z)
        t = jnp.einsum(
            "yv,cvu->cyu", M, kgz, precision=jax.lax.Precision.HIGHEST
        )
        img = jnp.einsum(
            "cyu,xu->cyx", t, M, precision=jax.lax.Precision.HIGHEST
        )
        return jnp.abs(coil_combine_sos(img, axis=0))

    def epi_x3(kg, s, z):
        # the production decomposition (fftops._sandwich_x3), not a local
        # re-derivation — the A/B must measure what the pipeline would run
        kgz = kg * (s + 1e-6 * z)
        img = fftops._sandwich_x3(kgz, M, M)
        return jnp.abs(coil_combine_sos(img, axis=0))

    for name, fn in (("highest", epi_highest), ("x3", epi_x3)):
        @jax.jit
        def epi_n(kg, s, fn=fn):
            return jax.lax.map(
                lambda z: fn(kg, s, z),
                jnp.arange(nz, dtype=jnp.float32),
            ).sum()

        out[f"epi_{name}_s"] = timeit(lambda s: float(epi_n(kgd, jnp.float32(s))), tag=f"epi_{name}")

    # accuracy of X3 vs HIGHEST on one frame (combined-magnitude domain).
    # Jitted: eager einsum would device_put the complex numpy M, which the
    # axon client rejects (same constraint as the ir-constant note above).
    @jax.jit
    def x3_err(kg):
        a = epi_highest(kg, jnp.float32(1.0), 0.0)
        b = epi_x3(kg, jnp.float32(1.0), 0.0)
        return jnp.linalg.norm(b - a) / jnp.linalg.norm(a)

    out["x3_vs_highest_nrmse"] = float(x3_err(kgd))

    for k, v in out.items():
        if isinstance(v, float):
            out[k] = round(v, 5)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
