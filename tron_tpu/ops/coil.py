"""Coil combination: root-sum-of-squares and Walsh adaptive combine.

References: `src/tron.cu:255-268` (SoS), `:222-253` (power iteration),
`:270-302` (Walsh).  The Walsh combine here is fully vectorized: the
per-pixel channel covariance over a (2*npatch+1)^2 neighborhood is a box
filter of the C^2 outer-product maps (zero padding == the reference's
clamped patch, since out-of-bounds pixels simply contribute nothing), and
the dominant eigenvector comes from the same 5-step power iteration, vmapped
over all pixels at once.  No MAXCHAN=6 cap (src/tron.h:50-51) — any channel
count works.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def coil_combine_sos(coilimg: jnp.ndarray, axis: int = 0) -> jnp.ndarray:
    """Root-sum-of-squares over the channel axis; passthrough if singleton.

    Returns the same dtype as the input with zero imaginary part, matching
    the reference output convention (`src/tron.cu:263-264`).
    """
    if coilimg.shape[axis] == 1:
        return jnp.take(coilimg, 0, axis=axis)
    mag = jnp.sqrt(jnp.sum(jnp.abs(coilimg) ** 2, axis=axis))
    return mag.astype(coilimg.dtype)


def _box_filter(x: jnp.ndarray, npatch: int) -> jnp.ndarray:
    """Sum over a (2*npatch+1)^2 neighborhood with zero padding, separably,
    on the trailing two axes."""
    if npatch == 0:
        return x
    k = 2 * npatch + 1
    pad = [(0, 0)] * (x.ndim - 2) + [(npatch, npatch), (npatch, npatch)]
    xp = jnp.pad(x, pad)
    c = jnp.cumsum(xp, axis=-2)
    c = jnp.pad(c, [(0, 0)] * (x.ndim - 2) + [(1, 0), (0, 0)])
    rows = c[..., k:, :] - c[..., :-k, :]
    c = jnp.cumsum(rows, axis=-1)
    c = jnp.pad(c, [(0, 0)] * (x.ndim - 2) + [(0, 0), (1, 0)])
    return c[..., :, k:] - c[..., :, :-k]


def coil_combine_walsh(
    coilimg: jnp.ndarray,
    npatch: int = 1,
    niters: int = 5,
) -> jnp.ndarray:
    """Walsh adaptive combine. coilimg: (C, ny, nx) complex.

    Returns (ny, nx) complex: sum_c conj(v_c) * img_c with v the dominant
    eigenvector of the local channel covariance.
    """
    C = coilimg.shape[0]
    if C == 1:
        return coilimg[0]
    # covariance maps: A[c1, c2] = box(img_c1 * conj(img_c2))
    outer = coilimg[:, None] * jnp.conj(coilimg[None, :])  # (C, C, ny, nx)
    A = _box_filter(outer, npatch)                         # (C, C, ny, nx)
    A = jnp.moveaxis(A, (0, 1), (-2, -1))                  # (ny, nx, C, C)

    # power iteration, batched over pixels (`src/tron.cu:222-253`).
    # The all-ones start vector is derived from A (x0 = 1 + 0*A[...,0]) so
    # it inherits A's varying-manual-axes type under shard_map (a literal
    # jnp.ones would be 'unvarying' and fail the scan carry type check).
    x = jnp.ones_like(A[..., 0]) + 0 * A[..., 0]           # (ny, nx, C)

    def it(x, _):
        y = jnp.einsum("...jk,...k->...j", A, x)
        nrm = jnp.sqrt(jnp.sum(jnp.abs(y) ** 2, axis=-1, keepdims=True))
        return y / jnp.where(nrm > 0, nrm, 1.0).astype(y.dtype), None

    x, _ = jax.lax.scan(it, x, None, length=niters)
    v = jnp.moveaxis(x, -1, 0)                             # (C, ny, nx)
    return jnp.sum(jnp.conj(v) * coilimg, axis=0)


def coil_compress(data: jnp.ndarray, ncomp: int) -> jnp.ndarray:
    """SVD coil compression: (C, npe, nro) k-space -> (ncomp, npe, nro).

    The reference leaves this as a TODO ("look at nc to decide whether to
    coil combine and by how much (can compress)", src/tron.cu:765); here it
    is the standard Buehrer/Huang SCC: stack samples as an (M, C) matrix,
    keep the top right-singular vectors, rotate the data into that basis.
    Compressing 32-channel arrays to ~8 virtual coils before gridding cuts
    the hot-loop channel cost proportionally.
    """
    C = data.shape[0]
    if ncomp >= C:
        return data
    X = data.reshape(C, -1)                       # (C, M)
    # Gram matrix in coil space (C x C) — cheap and TPU-friendly
    G = X @ X.conj().T
    _, vecs = jnp.linalg.eigh(G)                  # ascending eigenvalues
    basis = vecs[:, ::-1][:, :ncomp]              # top-ncomp components
    Y = basis.conj().T @ X
    return Y.reshape((ncomp,) + data.shape[1:])
