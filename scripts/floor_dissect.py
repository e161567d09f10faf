"""Dissect the fixed per-run cost that floors small-dataset e2e rates.

VERDICT r4 #2: the optic-nerve class runs ~70 Msamp/s e2e against a 242
Msamp/s kernel rate, attributed to a ~30 ms/run floor ("dispatch + tunnel
readback") that was never split.  This script splits it, per dataset class,
into the only three components a fused single-program run can contain:

  rtt        one dispatch round trip over the axon tunnel, measured with a
             null jitted program (scalar in, scalar out) — the link
             constant no amount of kernel work can remove;
  device     pure device compute per recon, measured as a SLOPE: one
             program runs the recon body K times (lax.scan, per-step scale
             so nothing folds), timed at K=1 and K=9 -> (t9-t1)/8.  The
             per-dispatch constant cancels exactly;
  d2h        optional full-image readback (the CLI path pays it; the
             paper_plots checksum run does not): fused program returning
             the (nz, ny, nx) image as f32/f16 planes, minus the checksum
             variant's wall, with the link-roofline bytes/s alongside.

Everything else (host relayout, Python) is the residual, printed as such.
Run on the TPU machine:  python scripts/floor_dissect.py

Output: a markdown table (pasteable into NOTES.md) + one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timer(fn, reps=5, warm=2):
    """min/median wall over reps after warm warmup calls."""
    for _ in range(warm):
        fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[0], ts[len(ts) // 2]


def main() -> None:
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tron")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from tron_tpu.config import ReconConfig
    from tron_tpu.recon import recon_frames
    from tron_tpu.utils.xfer import to_device

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})")

    # --- the link constant: null dispatch round trip ---------------------
    @jax.jit
    def null(s):
        return s * 2.0

    rtt_min, rtt_med = _timer(lambda: float(null(jnp.float32(1.0))), reps=20)
    print(f"null dispatch RTT: min {rtt_min*1e3:.2f} ms / med {rtt_med*1e3:.2f} ms")

    # --- per-class dissection --------------------------------------------
    # (label, nc, nro, undersamp, slide, npe1, golden) — the paper_plots
    # stand-in classes (scripts/paper_plots.py DATASETS)
    classes = [
        ("optic_nerve", 4, 256, 0.5, 0, 2176, True),
        ("linear_phantom", 1, 512, 1.0, 512, 512, False),
        ("swallowing", 4, 256, 0.5, 21, 3000, True),
    ]
    rng = np.random.default_rng(0)
    rows = []
    for label, nc, nro, u, slide, npe1, golden in classes:
        cfg = ReconConfig(
            golden_angle=golden,
            angle_scheme=None if golden else "linear_half",
            data_undersamp=u,
            prof_slide=slide,
            adjoint=True,
        )
        work, eff_slide, nz = cfg.frame_geometry(nro, npe1)
        data = (
            rng.standard_normal((nc, npe1, nro))
            + 1j * rng.standard_normal((nc, npe1, nro))
        ).astype(np.complex64)
        d = to_device(data)
        nsamp = nz * nc * nro * work

        def reconK(x, s0, K):
            # K back-to-back recons in ONE program; per-step scale defeats
            # CSE, checksum-sum defeats DCE.
            def step(acc, s):
                out = recon_frames(x * s, cfg, work, eff_slide, nz)
                return acc + jnp.sum(jnp.abs(out)), None
            acc, _ = jax.lax.scan(
                step, jnp.float32(0.0), s0 + jnp.arange(K, dtype=jnp.float32) * 1e-4
            )
            return acc

        f1 = jax.jit(lambda x, s: reconK(x, s, 1))
        f9 = jax.jit(lambda x, s: reconK(x, s, 9))
        t1_min, t1_med = _timer(lambda: float(f1(d, jnp.float32(1.0))))
        t9_min, t9_med = _timer(lambda: float(f9(d, jnp.float32(1.0))))
        dev_s = (t9_med - t1_med) / 8.0

        # full-image readback variant (what the CLI pays on top): f32 planes
        @jax.jit
        def img(x, s):
            out = recon_frames(x * s, cfg, work, eff_slide, nz)
            return jnp.real(out), jnp.imag(out)

        def run_img():
            re, im = img(d, jnp.float32(1.0))
            np.asarray(re), np.asarray(im)

        timg_min, timg_med = _timer(run_img)
        nxos_half = img(d, jnp.float32(1.0))[0].shape  # (nz, ny, nx)
        d2h_bytes = 2 * 4 * int(np.prod(nxos_half))
        d2h_s = max(timg_med - t1_med, 0.0)

        resid = t1_med - rtt_med - dev_s
        rows.append(
            {
                "class": label,
                "frames": nz,
                "wall_ms": round(t1_med * 1e3, 2),
                "rtt_ms": round(rtt_med * 1e3, 2),
                "device_ms": round(dev_s * 1e3, 2),
                "residual_ms": round(resid * 1e3, 2),
                "rtt_pct": round(100 * rtt_med / t1_med, 1),
                "device_pct": round(100 * dev_s / t1_med, 1),
                "e2e_msamples_per_s": round(nsamp / t1_med / 1e6, 1),
                "device_msamples_per_s": round(nsamp / dev_s / 1e6, 1),
                "d2h_ms": round(d2h_s * 1e3, 2),
                "d2h_mb": round(d2h_bytes / 1e6, 2),
                "d2h_gbps": round(d2h_bytes / d2h_s / 1e9, 2) if d2h_s > 0 else None,
            }
        )
        print(
            f"{label}: wall {t1_med*1e3:.1f} ms = rtt {rtt_med*1e3:.1f}"
            f" + device {dev_s*1e3:.1f} + residual {resid*1e3:.1f}"
            f"  (K=1 min {t1_min*1e3:.1f}, K=9 med {t9_med*1e3:.1f};"
            f" img readback +{d2h_s*1e3:.1f} ms for {d2h_bytes/1e6:.1f} MB)"
        )

    print()
    hdr = list(rows[0])
    print("| " + " | ".join(hdr) + " |")
    print("|" + "---|" * len(hdr))
    for r in rows:
        print("| " + " | ".join(str(r[k]) for k in hdr) + " |")
    print()
    print(json.dumps({"rtt_ms_med": round(rtt_med * 1e3, 2), "classes": rows}))


if __name__ == "__main__":
    main()
