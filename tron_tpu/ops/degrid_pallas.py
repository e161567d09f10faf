"""Pallas TPU kernel for forward radial degridding — the exact dataflow
transpose of the gridding kernel (ops/grid_pallas.py), sharing its geometry:

    s[p, r] = sum_y B[p, r, y] * ( sum_x A[p, r, x] * G[c, y, x] )

Per (spoke-chunk, tile, sign): the inner sum over x is an MXU matmul of the
KB column weights A (generated in VMEM) against the tile's grid block; the
outer sum over y is a VPU reduction against B.  Each sample's readout
segment accumulates contributions from every tile its KB footprint touches
— tiles partition the grid, so the tile sum is exact.  Same static radius
segments, angle-sorted spoke hit lists and dynamic-bound loops as the
adjoint kernel; no gather, no scatter, deterministic.

Sample radii live on an affine radial lattice: output row u of a spoke sits
at grid-units radius (u - nro/2) * (nxos/nro) — the exact per-sample radii
of the reference's forward kernel (`src/tron.cu:553-556`) at ANY grid
oversampling, integer grid radii in the default gridos=2 case.  The radius
segments / chord windows are built in row units via the shared table
builders' ``row_scale``.  Like the gridding kernel (and unlike the
gather/dense degrid backends) the KB footprint is clipped at the grid
boundary rather than wrapped — the two conventions differ only on the
outermost ~kw/row_scale readouts.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tron_tpu.ops.grid_pallas import (
    _chord_tables,
    _vmem_limit_kw,
    _hit_loop,
    _kb_poly,
    _kb_taylor_coeffs,
    _tile_segments,
)


def _degrid_kernel(
    seg_ref,    # scalar prefetch: (tiles*tiles*2,) i32 long-window starts
    cntl_ref,   # scalar prefetch: (tiles*tiles*2*nch,) i32 long hits/chunk
    hll_ref,    # scalar prefetch: (tiles*tiles*2*nch*PE,) i32 long hit slots
    cnts_ref,   # scalar prefetch: (tiles*tiles*2*nch,) i32 short hits/chunk
    hls_ref,    # scalar prefetch: (tiles*tiles*2*nch*PE,) i32 short hit slots
    w0_ref,     # scalar prefetch: (tiles*tiles*2*nch*PE,) i32 short win starts
    ct_ref,     # scalar prefetch: (npe',) f32 cos(theta)
    st_ref,     # scalar prefetch: (npe',) f32 sin(theta)
    g_ref,      # (C2, TY, TX) grid block (f32 planes)
    out_ref,    # (PE_CHUNK, nro, C2) f32 sample block
    acc_ref,    # (PE_CHUNK, nro, C2) f32 scratch
    *,
    pe_chunk: int,
    nxos: int,
    nro: int,
    row_scale: float,
    seg: int,
    ws: int,
    tiles: int,
    ty: int,
    tx: int,
    c2: int,
    kernwidth: float,
    kb_coeffs,
    mm_dtype,
    passes: int = 1,
    unroll: int = 1,
    batched: bool = False,
):
    k = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    nch = pl.num_programs(0)
    hr = nro // 2  # radius-row half (row u <-> radius (u - hr) * row_scale)

    @pl.when((i == 0) & (j == 0))
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    half = nxos // 2
    X = (
        jax.lax.broadcasted_iota(jnp.int32, (1, tx), 1) + (j * tx - half)
    ).astype(jnp.float32)
    Y = (
        jax.lax.broadcasted_iota(jnp.int32, (1, ty), 1) + (i * ty - half)
    ).astype(jnp.float32)

    Gf = g_ref[...].reshape(c2 * ty, tx)
    G2 = Gf.astype(mm_dtype)
    if passes != 1:
        G2l = (Gf - G2.astype(jnp.float32)).astype(mm_dtype)
        # K-widened constant operand, built ONCE per grid step: the hi/lo
        # correction dots below run fused as a single wider contraction per
        # hit instead of 2-3 separate MXU dot issues (dots here are per-HIT,
        # so the issue overhead is the dominant x3 cost in this kernel)
        Gc = jnp.concatenate(
            [G2, G2l] if passes == 2 else [G2, G2l, G2], axis=1
        )

    def dot(a, b):
        return jax.lax.dot_general(
            a, b,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def make_spoke(site, win, hl, w0_for, cnt=None):
        def spoke(p, _):
            slot = hl[(site * nch + k) * pe_chunk + p]
            w0 = w0_for(p)
            ct = ct_ref[k * pe_chunk + slot]
            st = st_ref[k * pe_chunk + slot]
            rwin = (
                jax.lax.broadcasted_iota(jnp.int32, (win, 1), 0) + w0 - hr
            ).astype(jnp.float32) * row_scale
            A = _kb_poly(rwin * ct - X, kernwidth, kb_coeffs)   # (WIN, TX)
            B = _kb_poly(rwin * st - Y, kernwidth, kb_coeffs)   # (WIN, TY)
            # V[r, (c, y)] = sum_x A[r, x] * G[(c, y), x]
            Ah = A.astype(mm_dtype)
            if passes == 1:
                V = dot(Ah, G2)                                 # (WIN, C2*TY)
            elif passes == 2:
                # bf16x2, fused: [Ah | Ah] . [G2 | G2l] = Ah.G2 + Ah.G2l
                # (grid lo term only; the grid split is per-tile)
                V = dot(jnp.concatenate([Ah, Ah], axis=1), Gc)
            else:
                # compensated bf16x3, fused: [Ah | Ah | Al] . [G2 | G2l | G2]
                # = Ah.G2 + Ah.G2l + Al.G2 — one dot issue recovers ~fp32
                Al = (A - Ah.astype(jnp.float32)).astype(mm_dtype)
                V = dot(jnp.concatenate([Ah, Ah, Al], axis=1), Gc)
            # per-channel 2D lane-slice reductions: reshaping V to
            # (win, c2, ty) relayouts `win` onto sublanes (transpose-shaped,
            # slow on Mosaic) — same fix as grid_pallas._expand_u
            contrib = jnp.concatenate(
                [
                    jnp.sum(
                        V[:, c * ty : (c + 1) * ty] * B, axis=-1, keepdims=True
                    )
                    for c in range(c2)
                ],
                axis=-1,
            )                                                   # (WIN, C2)
            if cnt is not None:
                # batched static unroll: slots past the hit count still run
                # (their hit-list/window entries are index-clipped to valid
                # values by _pack_hits) but contribute exactly zero via a
                # 0/1 scalar multiply — same masking as the grid-side
                # batched kernel, same support-boundary-tie rationale
                contrib = contrib * (p < cnt).astype(jnp.float32)
            cur = acc_ref[slot, pl.ds(w0, win), :]
            acc_ref[slot, pl.ds(w0, win), :] = cur + contrib
            return 0

        return spoke

    def run(spoke_fn, cnt):
        if batched:
            for p in range(pe_chunk):
                spoke_fn(p, 0)
        else:
            _hit_loop(spoke_fn, cnt, unroll)

    for sgn in range(2):
        site = (i * tiles + j) * 2 + sgn
        seg0 = seg_ref[site]
        cnt_l = cntl_ref[site * nch + k]
        mask_l = cnt_l if batched else None
        run(make_spoke(site, seg, hll_ref, lambda p: seg0, mask_l), cnt_l)
        cnt_s = cnts_ref[site * nch + k]
        mask_s = cnt_s if batched else None
        run(
            make_spoke(
                site, ws, hls_ref,
                lambda p, s_=site: w0_ref[(s_ * nch + k) * pe_chunk + p],
                mask_s,
            ),
            cnt_s,
        )

    @pl.when((i == pl.num_programs(1) - 1) & (j == pl.num_programs(2) - 1))
    def _done():
        out_ref[...] = acc_ref[...]


@functools.partial(
    jax.jit,
    static_argnames=(
        "nxos", "nro", "kernwidth", "beta", "pe_chunk", "tile", "matmul_dtype",
        "interpret", "cull", "ws", "unroll", "vmem_limit", "batched",
    ),
)
def _degrid_pallas_impl(
    kgrid, angles, nxos, nro, kernwidth, beta, pe_chunk, tile, matmul_dtype,
    interpret, cull="geom", ws=48, unroll=1, vmem_limit=0, batched=False,
):
    C, n_y, n_x = kgrid.shape
    c2 = 2 * C
    npe = angles.shape[0]
    # affine radial lattice: row u <-> radius (u - nro/2) * row_scale; the
    # default gridos=2 geometry has row_scale == 1 (integer grid radii)
    row_scale = nxos / nro
    tiles = nxos // tile
    starts, nonempty, seg, _ = _tile_segments(
        nxos, tile, kernwidth, nR=nro, row_scale=row_scale
    )
    # same clamp as the grid side: short-window starts at [hr, nR-ws] must
    # never cross r = 0 into the other sign's rows (an unclamped ws on small
    # grids inverts the clip in _chord_tables and double-counts near origin)
    ws = min(ws, nro // 2)

    passes = {"bf16x3": 3, "bf16x2": 2}.get(matmul_dtype, 1)
    mm_dtype = jnp.float32 if matmul_dtype == "float32" else jnp.bfloat16

    # sort spokes by angle (shared culling machinery); the "samples" fed to
    # _prep_samples are irrelevant here — only the ordering matters, so we
    # reorder the OUTPUT back at the end using the same argsort
    from tron_tpu.trajectory import modang

    order = jnp.argsort(modang(angles))
    angles_s = angles[order]
    nch = -(-npe // pe_chunk)
    pad = nch * pe_chunk - npe
    if pad:
        angles_s = jnp.pad(angles_s, (0, pad), mode="edge")
    ct = jnp.cos(angles_s).astype(jnp.float32)
    st = jnp.sin(angles_s).astype(jnp.float32)
    cnt_l, hl_l, cnt_s, hl_s, w0s = _chord_tables(
        angles_s, nxos, tile, kernwidth, nch, pe_chunk, ws, npe=npe,
        nR=nro, row_scale=row_scale,
    )
    seg_starts = jnp.asarray(starts.reshape(-1), jnp.int32)

    # grid as real planes (c2, ny, nx)
    g2 = jnp.stack([kgrid.real, kgrid.imag], axis=1).reshape(c2, n_y, n_x)
    g2 = g2.astype(jnp.float32)

    kern = functools.partial(
        _degrid_kernel,
        pe_chunk=pe_chunk,
        nxos=nxos,
        nro=nro,
        row_scale=row_scale,
        seg=seg,
        ws=ws,
        tiles=tiles,
        ty=tile,
        tx=tile,
        c2=c2,
        kernwidth=kernwidth,
        kb_coeffs=_kb_taylor_coeffs(kernwidth, beta),
        mm_dtype=mm_dtype,
        passes=passes,
        unroll=unroll,
        batched=batched,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=8,
        grid=(nch, tiles, tiles),
        in_specs=[
            pl.BlockSpec((c2, tile, tile), lambda k, i, j, *_: (0, i, j)),
        ],
        out_specs=pl.BlockSpec(
            (pe_chunk, nro, c2), lambda k, i, j, *_: (k, 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((pe_chunk, nro, c2), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nch * pe_chunk, nro, c2), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            **_vmem_limit_kw(vmem_limit),
        ),
        interpret=interpret,
    )(
        seg_starts, cnt_l.reshape(-1), hl_l.reshape(-1), cnt_s.reshape(-1),
        hl_s.reshape(-1), w0s.reshape(-1), ct, st, g2,
    )

    out = out[:npe]                                   # (npe, nro, c2) sorted
    # undo the angle sort and reassemble complex channels
    inv = jnp.zeros_like(order).at[order].set(jnp.arange(npe))
    out = out[inv]
    out = jnp.transpose(out, (2, 0, 1)).reshape(C, 2, npe, nro)
    return (out[:, 0] + 1j * out[:, 1]).astype(kgrid.dtype)


def degrid_radial2d_pallas(
    kgrid: jnp.ndarray,
    angles: jnp.ndarray,
    nro: int,
    kernwidth: float,
    beta: float,
    pe_chunk: int = 16,
    tile: int = 128,
    matmul_dtype: str = "bfloat16",
    interpret: bool = False,
    tuning=None,
) -> jnp.ndarray:
    """kgrid (C, n, n) or (n, n) complex -> samples (C, npe, nro).

    Any even nro runs on the MXU kernel (sample radii live on the affine
    row lattice, exact at every gridos); only grids too small to tile (or
    an odd nro) fall back to the dense XLA backend.  ``tuning`` is a
    config.KernelTuning (None = defaults + TRON_* env overrides).
    """
    squeeze = kgrid.ndim == 2
    if squeeze:
        kgrid = kgrid[None]
    n = kgrid.shape[-1]
    if nro % 2 != 0 or n % tile != 0 or n // tile < 2:
        from tron_tpu.ops.degrid import _degrid_dense

        # clip convention (wrap=False) to match the kernel: callers that
        # want the reference's periodic wrap patch the boundary readouts
        # themselves (nufft._patch_degrid_wrap_edges)
        out = _degrid_dense(kgrid, angles, nro, kernwidth, beta, wrap=False)
    else:
        from tron_tpu.ops.grid_pallas import _default_tuning

        t = tuning if tuning is not None else _default_tuning(n)
        out = _degrid_pallas_impl(
            kgrid, angles, n, nro, kernwidth, beta, pe_chunk, tile,
            matmul_dtype, interpret, ws=t.ws, unroll=t.unroll,
            vmem_limit=t.vmem_limit, batched=t.batched,
        )
    return out[0] if squeeze else out
