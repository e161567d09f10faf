"""Iterative CGNR reconstruction (working, unlike the reference's
`tron_cgnr_radial2d`, which is marked "NOT WORKING CORRECTLY YET" at
`src/tron.cu:670`).

Solves the Ram-Lak-weighted least-squares problem of Knopp et al. 2007
(Intl J Biomed Imaging), the same algorithm the reference attempts:

    min_x || W^(1/2) (A x - b) ||^2      =>      A^H W A x = A^H W b

with A = nufft_forward and W = diag(ramlak).  Two operator modes, both true
adjoint pairs — which is why this CGNR converges where the reference's
does not (it pairs a forward and adjoint that aren't transposes of each
other: sin/cos swap, convention mismatches, SURVEY.md §7):

  * "pair" (TPU): the Pallas gridding kernel IS the exact transpose of the
    clip-mode Pallas degrid, so each CG iteration is two fast kernels
    (verified adjoint to ~1e-4 in the dot test).
  * "transpose" (any backend): jax.linear_transpose of the dense forward —
    exact to the last bit.

The loop is a lax.while_loop with a relative-residual stop, fully jittable
and shard_map-compatible (psum'd inner products via reduce_axes).
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
    operators: str = "auto",
) -> jnp.ndarray:
    """data: (..., npe, nro) -> image estimate (..., n, n).

    ``reduce_axes``: mesh axis names to psum the CG inner products over —
    required when channels are sharded (inside shard_map), so every shard
    steps with the *global* alpha/beta; the direct analog of a data-parallel
    gradient allreduce.

    ``operators``: "pair" uses the explicit fast forward/adjoint kernel pair
    (TPU Pallas path); "transpose" uses jax.linear_transpose of the dense
    forward (exact to the last bit, any backend); "auto" picks by platform.
    """
    niter = cfg.niter if niter is None else niter
    npe, nro = data.shape[-2:]
    n = nro // 2
    nxos = int(n * cfg.gridos)
    img_shape = data.shape[:-2] + (n, n)
    w = sdc_weights(cfg, nro, npe).astype(data.dtype)

    import dataclasses

    if operators == "auto":
        # the fast gridding kernel is the (clip-convention-exact) adjoint of
        # the fast degridding kernel, so on TPU the normal operator is two
        # Pallas calls; elsewhere fall back to autodiff transposes of the
        # dense forward (einsums transpose to einsums)
        from tron_tpu.nufft import _on_tpu

        operators = "pair" if (_on_tpu() and nro == nxos) else "transpose"

    if operators == "pair":
        # clip-convention forward: exact transpose of the gridding adjoint
        # everywhere except readout 0 (never gridded — reference convention),
        # which is weighted out of the problem (one sample per spoke, at the
        # highest |k|)
        fwd = partial(nufft_forward, angles=angles, cfg=cfg, nro=nro, wrap=False)
        w = w.at[0].set(0)

        def AHW(y):
            out = nufft_adjoint(w * y, angles, cfg, apply_sdc=False)
            return out * (nxos * npe)  # undo the gridder's reference scale

    else:
        # the Pallas degrid has no transpose rule, so pin the forward to the
        # dense XLA backend for jax.linear_transpose
        cfg_t = dataclasses.replace(cfg, backend="jnp")
        fwd = partial(nufft_forward, angles=angles, cfg=cfg_t, nro=nro)
        # derive the zero linearization point from the data so its device-
        # varyance matches the cotangents under shard_map (vma consistency)
        x0 = jnp.zeros(img_shape, dtype=data.dtype) + 0.0 * data.reshape(-1)[0]
        fwd_t = jax.linear_transpose(fwd, x0)

        def AHW(y):
            # A^H z = conj(A^T conj(z)): linear_transpose gives the
            # transpose, conjugation turns it into the adjoint.
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

    r0 = b  # initial iterate is zero
    xinit = jnp.zeros_like(b)
    state = (jnp.array(0), xinit, r0, r0, inner(r0, r0))
    _, x, _, _, _ = jax.lax.while_loop(cond, body, state)
    return x


def cgnr_or_adjoint(data, angles, cfg: ReconConfig):
    """Dispatch like the reference driver (`src/tron.cu:753-758`)."""
    if cfg.niter > 0:
        return cgnr_radial2d(data, angles, cfg)
    return nufft_adjoint(data, angles, cfg)
