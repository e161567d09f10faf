"""Pallas TPU kernel for adjoint radial gridding.

Same contraction as tron_tpu.ops.grid (see the derivation there):

    out[c, Y, X] = sum_pe sum_r  B[pe, r, Y] * s[pe, r, c] * A[pe, r, X]
    A[pe, r, X] = KB(r*cos t_pe - X),  B[pe, r, Y] = KB(r*sin t_pe - Y)

hand-tiled for the MXU/VMEM:

  * grid = (tiles_y, tiles_x, pe_chunks); the output (C2, TY, TX) block is
    revisited along the pe axis and accumulated in a fp32 VMEM scratch
    (classic matmul accumulation pattern).
  * per spoke (fori_loop, so VMEM temporaries are reused, not stacked), the
    banded weight matrices A and B are generated *in VMEM* on the VPU — the
    rational-polynomial I0 never touches HBM — then the channel-expanded
    U = s (x) B is formed and U^T @ A runs on the MXU with fp32 accumulation.
  * channels ride the M dimension of the matmul (M = C2*TY), so 2*nchan
    real channels amortize one weight generation — the same register-level
    channel batching as the reference kernel (`src/tron.cu:471,518-519`),
    but on 128x128 systolic tiles.
  * no gather, no scatter, no atomics, fully deterministic.

Complex data is carried as C2 = 2*nchan real planes (complex is not a native
TPU tile type).  ``matmul_dtype="bfloat16"`` casts the A/U matmul operands
to bf16 (fp32 accumulation via preferred_element_type) for higher MXU rate;
the KB weights are computed in fp32 either way.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tron_tpu.ops.grid import _radius_map


def _kb_inline(x2: jnp.ndarray, kernwidth: float, beta: float) -> jnp.ndarray:
    """KB window on a 2D array, inlined for the VPU (fp32).

    0.5/kw * I0(beta*sqrt(1-(x/kw)^2)) on |x| < kw, else 0; I0 via the same
    rational polynomial as kernels/kb.py (kept local so the kernel has no
    outside-of-pallas dependencies).
    """
    r = x2 * (1.0 / kernwidth)
    q = 1.0 - r * r
    inside = q > 0.0
    z = (beta * beta) * jnp.where(inside, q, 0.0)  # (beta*sqrt(q))^2
    num = jnp.full_like(z, 0.210580722890567e-22)
    for c in (
        0.380715242345326e-19, 0.479440257548300e-16, 0.435125971262668e-13,
        0.300931127112960e-10, 0.160224679395361e-7, 0.654858370096785e-5,
        0.202591084143397e-2, 0.463076284721000e0, 0.754337328948189e2,
        0.830792541809429e4, 0.571661130563785e6, 0.216415572361227e8,
        0.356644482244025e9, 0.144048298227235e10,
    ):
        num = num * z + c
    den = (z * (z * (z - 0.307646912682801e4) + 0.347626332405882e7)
           - 0.144048298227235e10)
    i0 = -num / den
    return jnp.where(inside, (0.5 / kernwidth) * i0, 0.0)


def _grid_kernel(
    kx_ref,     # (PE_CHUNK, nR) f32: r*cos(t) per spoke
    ky_ref,     # (PE_CHUNK, nR) f32: r*sin(t) per spoke
    s_ref,      # (PE_CHUNK, nR, C2): channel-expanded samples
    out_ref,    # (C2, TY, TX) f32 output block
    acc_ref,    # (C2*TY, TX) f32 scratch
    *,
    pe_chunk: int,
    nxos: int,
    ty: int,
    tx: int,
    c2: int,
    kernwidth: float,
    beta: float,
    scale: float,
    mm_dtype,
):
    i = pl.program_id(0)
    j = pl.program_id(1)
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    nR = s_ref.shape[1]
    half = nxos // 2
    X = (
        jax.lax.broadcasted_iota(jnp.int32, (1, tx), 1) + (j * tx - half)
    ).astype(jnp.float32)
    Y = (
        jax.lax.broadcasted_iota(jnp.int32, (1, ty), 1) + (i * ty - half)
    ).astype(jnp.float32)

    def spoke(p, _):
        kx = kx_ref[p, :].reshape(nR, 1)
        ky = ky_ref[p, :].reshape(nR, 1)
        A = _kb_inline(kx - X, kernwidth, beta)   # (nR, TX)
        B = _kb_inline(ky - Y, kernwidth, beta)   # (nR, TY)
        s = s_ref[p]                              # (nR, C2)
        # U[r, (c, y)] = s[r, c] * B[r, y]
        U = (s.astype(jnp.float32)[:, :, None] * B[:, None, :]).reshape(nR, c2 * ty)
        acc_ref[...] += jax.lax.dot_general(
            U.astype(mm_dtype),
            A.astype(mm_dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return 0

    jax.lax.fori_loop(0, pe_chunk, spoke, 0)

    @pl.when(k == pl.num_programs(2) - 1)
    def _done():
        out_ref[...] = acc_ref[...].reshape(c2, ty, tx) * scale


@functools.partial(
    jax.jit,
    static_argnames=(
        "nxos", "kernwidth", "beta", "pe_chunk", "tile", "matmul_dtype", "interpret",
    ),
)
def grid_radial2d_pallas(
    data: jnp.ndarray,
    angles: jnp.ndarray,
    nxos: int,
    kernwidth: float,
    beta: float,
    pe_chunk: int = 8,
    tile: int = 128,
    matmul_dtype: str = "float32",
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in replacement for ops.grid.grid_radial2d (complex in/out).

    data: (C, npe, nro) complex64 (leading channel axis required; use
    reshape(-1, npe, nro) for extra batch dims); angles: (npe,).
    Returns (C, nxos, nxos) complex64.
    """
    if data.ndim == 2:
        return grid_radial2d_pallas(
            data[None], angles, nxos, kernwidth, beta, pe_chunk, tile, matmul_dtype,
            interpret,
        )[0]
    C, npe, nro = data.shape
    c2 = 2 * C

    rr, ridx, valid = _radius_map(nxos, nro)
    ds = jnp.take(data, ridx, axis=-1) * valid.astype(data.dtype)  # (C, npe, nR)

    # channel-expand to real planes: (npe, nR, C2)
    s2 = jnp.stack([ds.real, ds.imag], axis=1).reshape(c2, npe, nxos)
    s2 = jnp.transpose(s2, (1, 2, 0)).astype(jnp.float32)

    nch = -(-npe // pe_chunk)
    pad = nch * pe_chunk - npe
    if pad:
        s2 = jnp.pad(s2, ((0, pad), (0, 0), (0, 0)))
        angles = jnp.pad(angles, (0, pad))

    # per-spoke k-space line coordinates, generated by XLA (fused, tiny)
    kx = rr[None, :] * jnp.cos(angles).astype(jnp.float32)[:, None]  # (npe', nR)
    ky = rr[None, :] * jnp.sin(angles).astype(jnp.float32)[:, None]

    mm_dtype = jnp.bfloat16 if matmul_dtype == "bfloat16" else jnp.float32
    s2 = s2.astype(mm_dtype)

    tiles = nxos // tile
    assert tiles * tile == nxos, (nxos, tile)

    kern = functools.partial(
        _grid_kernel,
        pe_chunk=pe_chunk,
        nxos=nxos,
        ty=tile,
        tx=tile,
        c2=c2,
        kernwidth=kernwidth,
        beta=beta,
        scale=1.0 / (nxos * npe),
        mm_dtype=mm_dtype,
    )

    line_spec = pl.BlockSpec(
        (pe_chunk, nxos), lambda i, j, k: (k, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        kern,
        grid=(tiles, tiles, nch),
        in_specs=[
            line_spec,
            line_spec,
            pl.BlockSpec(
                (pe_chunk, nxos, c2), lambda i, j, k: (k, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (c2, tile, tile), lambda i, j, k: (0, i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((c2, nxos, nxos), jnp.float32),
        scratch_shapes=[pltpu.VMEM((c2 * tile, tile), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * nch * pe_chunk * nxos * c2 * tile * tile * tiles * tiles,
            bytes_accessed=s2.nbytes * tiles * tiles + 4 * c2 * nxos * nxos,
            transcendentals=0,
        ),
        interpret=interpret,
    )(kx, ky, s2)

    out = out.reshape(C, 2, nxos, nxos)
    return (out[:, 0] + 1j * out[:, 1]).astype(data.dtype)
