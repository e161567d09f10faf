"""Iterative CGNR reconstruction (working, unlike the reference's
`tron_cgnr_radial2d`, which is marked "NOT WORKING CORRECTLY YET" at
`src/tron.cu:670`).

Solves the Ram-Lak-weighted least-squares problem of Knopp et al. 2007
(Intl J Biomed Imaging), the same algorithm the reference attempts:

    min_x || W^(1/2) (A x - b) ||^2      =>      A^H W A x = A^H W b

with A = nufft_forward and W = diag(ramlak).  The adjoint used inside the
normal operator is the *exact* linear transpose of the forward op, obtained
from jax.linear_transpose — so the CG theory actually applies (the
reference pairs a forward and an adjoint that are not quite transposes of
each other: sin/cos swap and convention mismatches, SURVEY.md §7).  The
fast gridding adjoint is still what produces the initial iterate/RHS.

The loop is a lax.while_loop with a relative-residual stop, fully jittable.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from tron_tpu.config import ReconConfig
from tron_tpu.nufft import nufft_adjoint, nufft_forward, sdc_weights


def cgnr_radial2d(
    data: jnp.ndarray,
    angles: jnp.ndarray,
    cfg: ReconConfig,
    niter: int | None = None,
    rtol: float = 1e-6,
    reduce_axes: tuple = (),
) -> jnp.ndarray:
    """data: (..., npe, nro) -> image estimate (..., n, n).

    ``reduce_axes``: mesh axis names to psum the CG inner products over —
    required when channels are sharded (inside shard_map), so every shard
    steps with the *global* alpha/beta; the direct analog of a data-parallel
    gradient allreduce.
    """
    niter = cfg.niter if niter is None else niter
    npe, nro = data.shape[-2:]
    n = nro // 2
    img_shape = data.shape[:-2] + (n, n)
    w = sdc_weights(cfg, nro, npe).astype(data.dtype)

    fwd = partial(nufft_forward, angles=angles, cfg=cfg, nro=nro)
    # derive the zero linearization point from the data so its device-
    # varyance matches the cotangents under shard_map (vma consistency)
    x0 = jnp.zeros(img_shape, dtype=data.dtype) + 0.0 * data.reshape(-1)[0]
    fwd_t = jax.linear_transpose(fwd, x0)

    def AHW(y):
        # A^H z = conj(A^T conj(z)): linear_transpose gives the transpose,
        # conjugation turns it into the adjoint.
        (out,) = fwd_t(jnp.conj(w * y))
        return jnp.conj(out)

    def normal(x):
        return AHW(fwd(x))

    b = AHW(data)

    def inner(a, bb):
        v = jnp.sum(jnp.conj(a) * bb).real
        for ax in reduce_axes:
            v = jax.lax.psum(v, ax)
        return v

    def cond(state):
        k, x, r, p, rs = state
        return (k < niter) & (rs > rtol * rtol * inner(b, b))

    def body(state):
        k, x, r, p, rs = state
        Ap = normal(p)
        alpha = rs / jnp.maximum(inner(p, Ap), 1e-30)
        x = x + alpha.astype(x.dtype) * p
        r = r - alpha.astype(r.dtype) * Ap
        rs_new = inner(r, r)
        beta = rs_new / jnp.maximum(rs, 1e-30)
        p = r + beta.astype(p.dtype) * p
        return k + 1, x, r, p, rs_new

    r0 = b  # x0 = 0
    state = (jnp.array(0), x0, r0, r0, inner(r0, r0))
    _, x, _, _, _ = jax.lax.while_loop(cond, body, state)
    return x


def cgnr_or_adjoint(data, angles, cfg: ReconConfig):
    """Dispatch like the reference driver (`src/tron.cu:753-758`)."""
    if cfg.niter > 0:
        return cgnr_radial2d(data, angles, cfg)
    return nufft_adjoint(data, angles, cfg)
