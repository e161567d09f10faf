"""Forward radial degridding: sample a centered oversampled k-space grid at
radial trajectory points with Kaiser-Bessel interpolation.

Design (TPU-first): each sample owns its output (pure gather, exclusive
ownership — the race-freedom property of the reference, `src/tron.cu:540-577`)
and the (2*kw+1)^2 neighborhood is walked with *static* offset loops, so the
whole op is (2kw+1)^2 flat gathers + fused multiply-adds; no dynamic control
flow, no scatter.

Convention notes vs the reference: we use x = r*cos(t), y = r*sin(t) for both
grid and degrid (the reference swaps sin/cos between directions,
`src/tron.cu:514-515` vs `:559-561` — a quirk, documented in SURVEY.md §7,
equivalent to a transpose), and center at n//2 (== the reference's (n+1)/2
under C integer division for even n).
"""

from __future__ import annotations

import jax.numpy as jnp

from tron_tpu.kernels.kb import kb_kernel


def degrid_radial2d(
    kgrid: jnp.ndarray,
    angles: jnp.ndarray,
    nro: int,
    kernwidth: float,
    beta: float,
    backend: str = "auto",
    pe_chunk: int = 8,
    wrap: bool = True,
) -> jnp.ndarray:
    """kgrid: (..., nyos, nxos) centered complex k-space; angles: (npe,).

    ``wrap=False`` clips KB footprints at the grid boundary instead of the
    reference's periodic wrap (`src/tron.cu:569-570`) — this makes degrid
    the exact transpose of the gridding op (which clips), as the CGNR
    operator pair requires.

    Returns samples (..., npe, nro).  Sample ro of spoke t sits at radius
    (ro/nro - 1/2)*nxos grid units (`src/tron.cu:554, 560-561`); the grid is
    treated as periodic (index mod n, `src/tron.cu:569-570`).

    Backends: "gather" (the 25-point neighborhood walk — great on CPU,
    pathological under XLA:TPU where scattered gathers serialize) and
    "dense" (the separable-matmul formulation, mirror of ops/grid.py's —
    rides the MXU).  "auto" picks by platform.
    """
    if backend == "auto":
        import jax

        try:
            dev = jax.devices()[0]
            on_tpu = "tpu" in (dev.platform or "").lower() or "TPU" in getattr(
                dev, "device_kind", ""
            )
        except Exception:
            on_tpu = False
        backend = "dense" if on_tpu else "gather"
    if backend == "dense":
        return _degrid_dense(kgrid, angles, nro, kernwidth, beta, pe_chunk, wrap)
    n = kgrid.shape[-1]
    batch = kgrid.shape[:-2]
    flat = kgrid.reshape(*batch, n * n)

    ro = jnp.arange(nro, dtype=jnp.float32)
    kr = (ro / nro - 0.5) * n                      # (nro,)
    ct = jnp.cos(angles).astype(jnp.float32)       # (npe,)
    st = jnp.sin(angles).astype(jnp.float32)
    xs = kr[None, :] * ct[:, None] + n // 2        # (npe, nro) continuous col
    ys = kr[None, :] * st[:, None] + n // 2        # (npe, nro) continuous row

    x0 = jnp.ceil(xs - kernwidth).astype(jnp.int32)
    y0 = jnp.ceil(ys - kernwidth).astype(jnp.int32)

    noff = int(2 * kernwidth) + 1
    out = jnp.zeros(batch + (angles.shape[0], nro), dtype=kgrid.dtype)
    for dx in range(noff):
        xu = x0 + dx
        wx = kb_kernel(xu.astype(jnp.float32) - xs, kernwidth, beta)
        if not wrap:
            wx = wx * ((xu >= 0) & (xu < n))
        iu = jnp.mod(xu, n)
        for dy in range(noff):
            yu = y0 + dy
            w = wx * kb_kernel(yu.astype(jnp.float32) - ys, kernwidth, beta)
            if not wrap:
                w = w * ((yu >= 0) & (yu < n))
            jv = jnp.mod(yu, n)
            idx = jv * n + iu                       # row-major (y, x)
            vals = jnp.take(flat, idx.reshape(-1), axis=-1)
            vals = vals.reshape(batch + idx.shape)
            out = out + vals * w.astype(kgrid.dtype)
    return out


def _degrid_dense(
    kgrid: jnp.ndarray,
    angles: jnp.ndarray,
    nro: int,
    kernwidth: float,
    beta: float,
    pe_chunk: int = 8,
    wrap: bool = True,
) -> jnp.ndarray:
    """Separable dense formulation (the forward mirror of ops/grid.py):

        s[p, ro] = sum_y B[p, ro, y] * sum_x A[p, ro, x] * G[y, x]

    with A/B the KB weights of the sample against every grid column/row —
    mostly zeros by compact support, but the contraction over x is a clean
    MXU matmul and there is no gather anywhere.  The periodic wrap of the
    gather version (`src/tron.cu:569-570`) is reproduced by wrapping the
    KB *distance* into [-n/2, n/2).
    """
    import jax

    n = kgrid.shape[-1]
    batch = kgrid.shape[:-2]
    npe = angles.shape[0]

    ro = jnp.arange(nro, dtype=jnp.float32)
    kr = (ro / nro - 0.5) * n
    ct = jnp.cos(angles).astype(jnp.float32)
    st = jnp.sin(angles).astype(jnp.float32)
    xs = kr[None, :] * ct[:, None] + n // 2   # (npe, nro)
    ys = kr[None, :] * st[:, None] + n // 2
    grid_pos = jnp.arange(n, dtype=jnp.float32)

    nch = -(-npe // pe_chunk)
    pad = nch * pe_chunk - npe
    if pad:
        xs = jnp.pad(xs, ((0, pad), (0, 0)))
        ys = jnp.pad(ys, ((0, pad), (0, 0)))
    xs_c = xs.reshape(nch, pe_chunk, nro)
    ys_c = ys.reshape(nch, pe_chunk, nro)

    def wrapped_kb(d):
        if wrap:
            d = jnp.mod(d + n / 2, n) - n / 2
        return kb_kernel(d, kernwidth, beta)

    def step(_, inp):
        xc, yc = inp                               # (P, nro)
        A = wrapped_kb(xc[..., None] - grid_pos)   # (P, nro, n)
        B = wrapped_kb(yc[..., None] - grid_pos)
        V = jnp.einsum("prx,...yx->...pry", A.astype(kgrid.dtype), kgrid)
        s = jnp.einsum("pry,...pry->...pr", B.astype(kgrid.dtype), V)
        return 0, s

    _, out = jax.lax.scan(step, 0, (xs_c, ys_c))   # (nch, ..., P, nro)
    out = jnp.moveaxis(out, 0, -3)                 # (..., nch, P, nro)
    out = out.reshape(batch + (nch * pe_chunk, nro))
    return out[..., :npe, :]
