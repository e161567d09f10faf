"""Exact (slow) discrete-time Fourier transform oracle.

Plays the role the vendored Fessler IRT toolbox plays in the reference's
quality story (`contrib/irt/nufft.m:18-102` self-tests against dtft/dtft2_adj,
SURVEY.md §4): every fast NUFFT op is unit-tested against these O(N*M)
direct sums on small problems.

Convention (shared with tron_tpu.nufft): image pixels live at centered
integer coordinates p, q in [-n/2, n/2) of an ``nos``-point oversampled
transform; a k-space sample at grid-unit frequency (kx, ky) is

    S(kx, ky) = sum_{q,p} img[..., q + n/2, p + n/2]
                  * exp(-2j*pi*(kx*p + ky*q) / nos)

which is exactly what centered-FFT-then-perfect-interpolation computes.
"""

from __future__ import annotations

import jax.numpy as jnp


def _phase(n: int, nos: int, k: jnp.ndarray) -> jnp.ndarray:
    """exp(-2j pi k p / nos) for all centered pixel coords p; shape (M, n)."""
    p = (jnp.arange(n) - n // 2).astype(jnp.float32)
    ang = (-2.0 * jnp.pi / nos) * k[:, None] * p[None, :]
    return jnp.exp(1j * ang.astype(jnp.float32))


def dtft2(img: jnp.ndarray, kx: jnp.ndarray, ky: jnp.ndarray, nos: int) -> jnp.ndarray:
    """Exact forward transform. img: (..., n, n) [y, x]; kx, ky: (M,) in
    grid units of the nos-point transform. Returns (..., M) complex."""
    n = img.shape[-1]
    ex = _phase(n, nos, kx)  # (M, nx)
    ey = _phase(n, nos, ky)  # (M, ny)
    tmp = jnp.einsum("...yx,mx->...ym", img.astype(jnp.complex64), ex)
    return jnp.einsum("...ym,my->...m", tmp, ey)


def dtft2_adjoint(
    samples: jnp.ndarray, kx: jnp.ndarray, ky: jnp.ndarray, n: int, nos: int
) -> jnp.ndarray:
    """Exact adjoint: (..., M) samples -> (..., n, n) image [y, x]."""
    ex = jnp.conj(_phase(n, nos, kx))  # (M, nx)
    ey = jnp.conj(_phase(n, nos, ky))  # (M, ny)
    tmp = jnp.einsum("...m,my->...ym", samples.astype(jnp.complex64), ey)
    return jnp.einsum("...ym,mx->...yx", tmp, ex)
