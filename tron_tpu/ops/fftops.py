"""Centered FFTs, crop/pad, deapodization.

Equivalents of the reference's fftshift/cufft/crop/pad/deapodkernel chain
(`/root/reference/src/tron.cu:159-220, 390-457`), in the obvious jnp forms —
XLA fuses the shifts and the deapod multiply into the surrounding ops, so
there is nothing to hand-schedule here.

Conventions: images and k-space grids are (..., ny, nx), centered at index
n//2 on both axes.  The inverse transform is *unnormalized* (a plain sum,
like cuFFT's CUFFT_INVERSE) so amplitudes match the reference pipelines.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tron_tpu.kernels.kb import kb_hat


def centered_fft2(img: jnp.ndarray) -> jnp.ndarray:
    """Centered image -> centered k-space, unnormalized forward DFT."""
    axes = (-2, -1)
    return jnp.fft.fftshift(
        jnp.fft.fft2(jnp.fft.ifftshift(img, axes=axes), axes=axes), axes=axes
    )


def centered_ifft2_unnormalized(kgrid: jnp.ndarray) -> jnp.ndarray:
    """Centered k-space -> centered image, unnormalized inverse DFT
    (cuFFT INVERSE semantics: no 1/N^2 factor; `src/tron.cu:632`)."""
    axes = (-2, -1)
    n = kgrid.shape[-1] * kgrid.shape[-2]
    out = jnp.fft.ifft2(jnp.fft.ifftshift(kgrid, axes=axes), axes=axes)
    return jnp.fft.fftshift(out, axes=axes) * n


def crop_center(img: jnp.ndarray, n: int) -> jnp.ndarray:
    """Center-crop the trailing two axes to (n, n) (`src/tron.cu:418-431`)."""
    nsrc = img.shape[-1]
    w = (nsrc - n) // 2
    return img[..., w : w + n, w : w + n]


def pad_center(img: jnp.ndarray, nos: int) -> jnp.ndarray:
    """Center zero-pad the trailing two axes to (nos, nos).

    (The reference `pad` at src/tron.cu:435-457 drops row/col 0 via an
    off-by-one boundary test; that is a documented bug we do not replicate.)
    """
    n = img.shape[-1]
    w = (nos - n) // 2
    pad = [(0, 0)] * (img.ndim - 2) + [(w, nos - n - w), (w, nos - n - w)]
    return jnp.pad(img, pad)


def deapod_weights(n: int, nxos: int, kernwidth: float, beta: float) -> jnp.ndarray:
    """Separable deapodization weights for an (n, n) block of an nxos-unit
    transform: w[p] = kb_hat((p - n//2)/nxos) per axis (`src/tron.cu:390-402`,
    where sigma folds the crop so the argument is always offset/nxos)."""
    p = (jnp.arange(n) - n // 2).astype(jnp.float32)
    w = kb_hat(p * (1.0 / nxos), kernwidth, beta)
    return w[:, None] * w[None, :]


def deapodize(img: jnp.ndarray, nxos: int, kernwidth: float, beta: float) -> jnp.ndarray:
    """Divide out the KB kernel's image-domain rolloff. Where the weight is
    <= 0 the pixel passes through, as in the reference (`src/tron.cu:400`)."""
    w = deapod_weights(img.shape[-1], nxos, kernwidth, beta)
    return jnp.where(w > 0, img / w.astype(img.dtype), img)


# ---------------------------------------------------------------------------
# MXU DFT epilogue/prologue
#
# XLA's TPU FFT runs on the VPU and costs ~0.5-1 ms for a 6x512^2 batch —
# more than the whole gridding kernel.  At these sizes (<=1024) the centered
# transforms are FAR cheaper as two small matmuls on the MXU, and the
# fftshift sandwich, the center crop/pad, AND the separable deapodization
# all fold into the (constant) DFT matrices:
#
#   adjoint:  img[y, x] = sum_{v,u} My[y, v] K[v, u] My[x, u]
#     with My[y, v] = g[y] * exp(+2pi i (y - n/2)(v - N/2) / N)
#     (g = 1/deapod weight) — this IS fftshift(ifft2(ifftshift(K))) * N^2
#     cropped to n and deapodized, exactly.
#   forward:  K[v, u]  = sum_{y, x} conj(My)[y, v] img[y, x] conj(My)[x, u]
#     = the pad -> deapod -> centered fft2 prologue, and the literal
#     conjugate-transpose of the adjoint epilogue, so the operator pair
#     stays exactly adjoint (CGNR's dot test).
#
# Run at precision HIGHEST: fp32-grade on the MXU at ~6x the bf16 matmul
# cost, still ~an order of magnitude under the VPU FFT.
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=16)
def _centered_dft_mat(n: int, nxos: int, kernwidth: float, beta: float, deapod: bool):
    """(n, nxos) complex64 matrix of the centered unnormalized inverse DFT
    restricted to the n-point center crop, with the 1/deapod weight folded
    in.  Built in float64 numpy (a baked constant, not traced ops)."""
    import numpy as np

    y = np.arange(n, dtype=np.float64) - n / 2
    v = np.arange(nxos, dtype=np.float64) - nxos / 2
    M = np.exp((2j * np.pi / nxos) * np.outer(y, v))
    if deapod:
        # the separable 1-D deapod factor (w[y, x] = f[y] * f[x]); pixels
        # with f <= 0 pass through, matching deapodize().  Pure-numpy
        # kb_hat (kernels/kb.py:85) — this builder may run under tracing,
        # where jnp ops would produce tracers, not constants.
        u = (np.arange(n, dtype=np.float64) - n // 2) / nxos
        r = np.pi * (2.0 * kernwidth) * u
        q = r * r - beta * beta
        az = np.sqrt(np.abs(q))
        safe = np.where(az > 1e-12, az, 1.0)
        f = np.where(q > 0, np.sin(safe) / safe, np.sinh(safe) / safe)
        f = np.where(az > 1e-12, f, 1.0)
        # match the float32 evaluation of deapodize()/kb_hat bit-closely
        f = f.astype(np.float32).astype(np.float64)
        # deapodize() applies its pass-through on the separable PRODUCT
        # f[y]*f[x] <= 0, while this fold is per-axis — the two agree only
        # while f stays positive over the crop (true for the default and
        # Beatty betas at gridos=2).  Fail loudly if a future (kernwidth,
        # beta) combo ever drives kb_hat nonpositive inside the crop.
        if not (f > 0).all():  # a real raise, not assert: survives python -O
            raise ValueError(
                "kb_hat nonpositive inside the center crop: the separable "
                "MXU deapod fold would diverge from deapodize(); use the "
                f"FFT path for kernwidth={kernwidth}, beta={beta}"
            )
        g = 1.0 / f
        M = g[:, None] * M
    # cache NUMPY (converting to a jax array here would capture a tracer
    # when the first call happens under jit tracing); callers jnp.asarray
    return M.astype(np.complex64)


def _sandwich_x3(K: jnp.ndarray, L: jnp.ndarray, R: jnp.ndarray) -> jnp.ndarray:
    """out[..., y, x] = sum_{v,u} L[y, v] K[..., v, u] R[x, u] for complex
    L/K/R via stacked real-plane matmuls at DotAlgorithmPreset
    BF16_BF16_F32_X3 (3 bf16 MXU passes per dot vs HIGHEST's 6).

    The complex arithmetic is decomposed by hand: stacking [Lr; Li] makes
    each side 2 real dots instead of the 4 (x 6 passes) XLA emits for a
    complex HIGHEST einsum.  NB the preset applied directly to a COMPLEX
    einsum is silently mis-lowered (measured NRMSE 0.86 vs HIGHEST on CPU)
    — hence the manual real-plane form."""
    X3 = jax.lax.DotAlgorithmPreset.BF16_BF16_F32_X3
    p = L.shape[0]
    Ls = jnp.concatenate([L.real, L.imag], axis=0)          # (2p, q)
    P = jnp.einsum("yv,...vu->...yu", Ls, K.real, precision=X3)
    Q = jnp.einsum("yv,...vu->...yu", Ls, K.imag, precision=X3)
    tr = P[..., :p, :] - Q[..., p:, :]
    ti = Q[..., :p, :] + P[..., p:, :]
    t2 = jnp.concatenate([tr, ti], axis=-2)                 # (..., 2p, q2)
    Rr = jnp.einsum("...yu,xu->...yx", t2, R.real, precision=X3)
    Si = jnp.einsum("...yu,xu->...yx", t2, R.imag, precision=X3)
    return (Rr[..., :p, :] - Si[..., p:, :]) + 1j * (
        Si[..., :p, :] + Rr[..., p:, :]
    )


def adjoint_image_mxu(
    kgrid: jnp.ndarray,
    n: int,
    kernwidth: float,
    beta: float,
    deapod: bool = True,
    dot: str = "highest",
) -> jnp.ndarray:
    """Fused centered-unnormalized-IFFT + crop + deapodize as two MXU
    matmuls (see module comment).  kgrid (..., nxos, nxos) -> (..., n, n).

    dot: "highest" (fp32-grade, 6 bf16 MXU passes per real dot) or
    "bf16x3" (3 passes via _sandwich_x3, ~1e-5 relative — far below the
    default bf16 gridding contraction's error, so the pipeline NRMSE is
    unchanged; keep "highest" where exact operator adjointness matters)."""
    nxos = kgrid.shape[-1]
    M = jnp.asarray(_centered_dft_mat(n, nxos, kernwidth, beta, deapod))
    if dot == "bf16x3":
        return _sandwich_x3(kgrid, M, M)
    t = jnp.einsum(
        "yv,...vu->...yu", M, kgrid, precision=jax.lax.Precision.HIGHEST
    )
    return jnp.einsum(
        "...yu,xu->...yx", t, M, precision=jax.lax.Precision.HIGHEST
    )


def forward_kspace_mxu(
    img: jnp.ndarray,
    nxos: int,
    kernwidth: float,
    beta: float,
    deapod: bool = True,
    dot: str = "highest",
) -> jnp.ndarray:
    """Fused pad + deapodize + centered-FFT as two MXU matmuls — the exact
    conjugate-transpose of adjoint_image_mxu.  img (..., n, n) ->
    (..., nxos, nxos).  dot: see adjoint_image_mxu."""
    n = img.shape[-1]
    Mh = jnp.conj(jnp.asarray(_centered_dft_mat(n, nxos, kernwidth, beta, deapod)))
    if dot == "bf16x3":
        return _sandwich_x3(img, Mh.T, Mh.T)
    t = jnp.einsum(
        "vy,...yx->...vx", Mh.T, img, precision=jax.lax.Precision.HIGHEST
    )
    return jnp.einsum(
        "...vx,ux->...vu", t, Mh.T, precision=jax.lax.Precision.HIGHEST
    )
