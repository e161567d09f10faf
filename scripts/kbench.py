#!/usr/bin/env python
"""Gridding-kernel micro-benchmark for A/B-ing Pallas variants on TPU.

Times one whole-body frame geometry (nc=6, nro=512, npe1work=204, 512^2
oversampled grid) through grid_radial2d_pallas, vmapped over a frame batch
to amortize dispatch, exactly like the recon pipeline does.

Usage: python scripts/kbench.py [--frames 64] [--windowed/--no-windowed]
       [--pe-chunk 16] [--reps 5] [--dtype bfloat16]
"""

import argparse
import time

import numpy as np

import sys
import os

# runnable without an editable install (as paper_plots.py)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=64)
    p.add_argument("--nc", type=int, default=6)
    p.add_argument("--nro", type=int, default=512)
    p.add_argument("--npe", type=int, default=204)
    p.add_argument("--pe-chunk", type=int, default=16)
    p.add_argument("--tile", type=int, default=128)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--no-windowed", dest="windowed", action="store_false")
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--check", action="store_true", help="NRMSE vs XLA gridder")
    p.add_argument("--op", default="grid", choices=["grid", "degrid"])
    p.add_argument("--batched", action="store_true",
                   help="KernelTuning(batched=True): static-unroll kernels "
                   "(equivalent to TRON_BATCHED=1 but explicit)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from tron_tpu.utils import enable_compilation_cache
    from tron_tpu.utils.xfer import to_device, to_host

    enable_compilation_cache()

    from tron_tpu.config import KernelTuning
    from tron_tpu.kernels.kb import kb_beta
    from tron_tpu.ops.grid_pallas import grid_radial2d_pallas
    from tron_tpu.trajectory import spoke_angles

    # thread the grid size so per-geometry defaults apply (ws=24 at <=256^2)
    tuning = KernelTuning.from_env(args.nro)
    if args.batched:
        import dataclasses

        tuning = dataclasses.replace(tuning, batched=True)

    nf, nc, npe, nro = args.frames, args.nc, args.npe, args.nro
    nxos = nro  # oversampled grid == nro for the default gridos=2 geometry
    kernwidth = 2.0
    beta = kb_beta(kernwidth, 2.0)

    rng = np.random.default_rng(0)
    data = (
        rng.standard_normal((nf, nc, npe, nro))
        + 1j * rng.standard_normal((nf, nc, npe, nro))
    ).astype(np.complex64)
    # per-frame golden-angle windows (sliding by 21), like the recon
    angles = np.stack(
        [np.asarray(spoke_angles(npe, "golden", 21 * f)) for f in range(nf)]
    ).astype(np.float32)

    d = to_device(data)
    a = jnp.asarray(angles)

    if args.op == "degrid":
        from tron_tpu.ops.degrid_pallas import degrid_radial2d_pallas

        grids = (
            rng.standard_normal((nf, nc, nxos, nxos))
            + 1j * rng.standard_normal((nf, nc, nxos, nxos))
        ).astype(np.complex64)
        d = to_device(grids)
        fn = jax.jit(
            jax.vmap(
                lambda g, ang: degrid_radial2d_pallas(
                    g, ang, nxos, kernwidth, beta,
                    pe_chunk=args.pe_chunk, tile=args.tile,
                    matmul_dtype=args.dtype, tuning=tuning,
                )
            )
        )
    else:
        fn = jax.jit(
            jax.vmap(
                lambda x, ang: grid_radial2d_pallas(
                    x, ang, nxos, kernwidth, beta,
                    pe_chunk=args.pe_chunk, tile=args.tile,
                    matmul_dtype=args.dtype, windowed=args.windowed,
                    tuning=tuning,
                )
            )
        )

    def run(x):
        return float(jnp.sum(jnp.abs(fn(x, a).real)))

    t0 = time.perf_counter()
    run(d)
    print(f"compile+first: {time.perf_counter() - t0:.1f}s")
    run(d * 1.0001)

    t0 = time.perf_counter()
    for i in range(args.reps):
        run(d * (1.0 + 1e-4 * i))
    dt = (time.perf_counter() - t0) / args.reps
    ms_frame = dt / nf * 1e3
    msps = nf * nc * npe * nro / dt / 1e6
    print(
        f"op={args.op} frames={nf} windowed={args.windowed} "
        f"pe_chunk={args.pe_chunk} dtype={args.dtype} "
        f"batched={tuning.batched}: "
        f"{ms_frame:.3f} ms/frame  {msps:.1f} Msamp/s"
    )

    if args.check:
        got = to_host(fn(d[:1], a[:1])[0])
        if args.op == "degrid":
            from tron_tpu.ops.degrid import _degrid_dense

            g = jax.jit(
                lambda x, ang: _degrid_dense(x, ang, nro, kernwidth, beta, wrap=False)
            )
            ref = to_host(g(d[0], a[0]))
            # interior: the raw kernel clips, dense wraps only at edges
            ro = np.arange(nro)
            m = (np.abs(ro - nro // 2) <= nro // 2 - 4) & (ro != 0)
            got, ref = got[..., m], ref[..., m]
        else:
            from tron_tpu.ops.grid import grid_radial2d

            g = jax.jit(
                lambda x, ang: grid_radial2d(x, ang, nxos, kernwidth, beta)
            )
            ref = to_host(g(d[0], a[0]))
        err = np.linalg.norm(got - ref) / np.linalg.norm(ref)
        print(f"nrmse_vs_xla: {err:.3e}")


if __name__ == "__main__":
    main()
