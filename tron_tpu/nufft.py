"""NUFFT operator pipelines: adjoint (gridding recon) and forward (degrid).

These are jit-able pure functions chaining the ops, mirroring the reference
host pipelines:

  adjoint  (`src/tron.cu:623-637`):
      precompensate -> grid -> centered unnormalized IFFT -> crop -> deapod
  forward  (`src/tron.cu:639-649`):
      pad -> deapod -> centered FFT -> degrid

Shapes: radial data is (..., npe, nro); images are (..., n, n) with n =
nro // 2 (adjoint) and k-space grids are (nxos, nxos), nxos = n * gridos.
Angles are passed explicitly (see trajectory.spoke_angles) so the pipelines
are scheme-agnostic and vmap over sliding-window frames (where the golden-
angle skip offset is a traced value).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tron_tpu.config import ReconConfig
from tron_tpu.kernels.kb import kb_beta
from tron_tpu.ops.degrid import degrid_radial2d
from tron_tpu.ops.fftops import (
    adjoint_image_mxu,
    centered_fft2,
    centered_ifft2_unnormalized,
    crop_center,
    deapodize,
    forward_kspace_mxu,
    pad_center,
)
from tron_tpu.ops.grid import grid_radial2d
from tron_tpu.trajectory import ideal_sdc, ramlak_sdc


def sdc_weights(cfg: ReconConfig, nro: int, npe: int) -> jnp.ndarray:
    """Density-compensation weights per cfg.sdc."""
    if cfg.sdc == "ideal":
        return ideal_sdc(nro, npe)
    return ramlak_sdc(nro, npe)


def _on_tpu() -> bool:
    try:
        dev = jax.devices()[0]
        return "tpu" in (dev.platform or "").lower() or "TPU" in getattr(
            dev, "device_kind", ""
        )
    except Exception:
        return False


# The MXU constant-DFT epilogue/prologue materializes an (n, nxos) matrix
# and costs O(nxos^3) per image vs the FFT's O(nxos^2 log nxos): measured
# faster than XLA's VPU FFT through nxos = 1024, past which the FFT chain
# wins — so the swap is gated here.
_MXU_DFT_MAX = 1024


def _grid_backend(cfg: ReconConfig):
    if cfg.backend in ("pallas", "auto"):
        try:
            if cfg.backend == "pallas" or _on_tpu():
                from tron_tpu.ops.grid_pallas import grid_radial2d_pallas

                return functools.partial(
                    grid_radial2d_pallas, matmul_dtype=cfg.matmul_dtype,
                    tuning=cfg.tuning,
                )
        except Exception:
            if cfg.backend == "pallas":
                raise
    return functools.partial(grid_radial2d, pe_chunk=cfg.pe_chunk)


def nufft_adjoint(
    data: jnp.ndarray,
    angles: jnp.ndarray,
    cfg: ReconConfig,
    apply_sdc: bool = True,
) -> jnp.ndarray:
    """Radial samples (..., npe, nro) -> coil images (..., n, n)."""
    npe, nro = data.shape[-2:]
    n = nro // 2
    nxos = int(n * cfg.gridos)
    beta = kb_beta(cfg.kernwidth, cfg.gridos, cfg.beatty)

    if apply_sdc:
        data = data * sdc_weights(cfg, nro, npe).astype(data.dtype)
    # flatten batch dims to one channel axis (the Pallas kernel is 3-D)
    batch = data.shape[:-2]
    flat = data.reshape((-1,) + data.shape[-2:])
    kgrid = _grid_backend(cfg)(flat, angles, nxos, cfg.kernwidth, beta)
    kgrid = kgrid.reshape(batch + (nxos, nxos))
    return _adjoint_epilogue(kgrid, n, cfg, beta)


def _adjoint_epilogue(kgrid, n, cfg, beta):
    """Centered unnormalized IFFT + crop + deapod.  On TPU the whole chain
    runs as two MXU matmuls (XLA's VPU FFT costs more than the gridding
    kernel at these sizes; see ops.fftops.adjoint_image_mxu — exact to
    ~3e-7 and the literal adjoint of the forward prologue)."""
    nxos = kgrid.shape[-1]
    if _on_tpu() and nxos <= _MXU_DFT_MAX:
        return adjoint_image_mxu(
            kgrid, n, cfg.kernwidth, beta, cfg.deapodize,
            dot=cfg.dft_dot_resolved(),
        )
    img = centered_ifft2_unnormalized(kgrid)
    img = crop_center(img, n)
    if cfg.deapodize:
        img = deapodize(img, nxos, cfg.kernwidth, beta)
    return img


def nufft_adjoint_exact(
    data: jnp.ndarray,
    angles: jnp.ndarray,
    cfg: ReconConfig,
    interpret: bool = False,
) -> jnp.ndarray:
    """Exact-lattice adjoint: grids every readout at its exact radius
    instead of the reference's trunc-resample (`src/tron.cu:517`), making
    it the precise adjoint of the forward degrid at ANY gridos — the
    A^H the CGNR operator pair needs when gridos != 2 (identical to
    nufft_adjoint(apply_sdc=False) at the default gridos=2).  No SDC is
    applied (the solver supplies its own weights).  Pallas windowed
    kernel when the grid tiles, dense exact-lattice gridder otherwise.

    Convention: readout 0 (radius -nxos/2, one sample per spoke at the
    unpaired Nyquist edge) is NEVER gridded — masked here so both backends
    agree (the Pallas band clamp excludes it by construction; the dense
    raw-rows gridder would include it).  cgnr_radial2d additionally
    weights it out of the problem (w[0] = 0)."""
    data = data.at[..., 0].set(0)
    npe, nro = data.shape[-2:]
    n = nro // 2
    nxos = int(n * cfg.gridos)
    beta = kb_beta(cfg.kernwidth, cfg.gridos, cfg.beatty)
    batch = data.shape[:-2]
    flat = data.reshape((-1,) + data.shape[-2:])
    use_pallas = (
        cfg.backend in ("pallas", "auto")
        and (cfg.backend == "pallas" or _on_tpu())
        and nxos % 128 == 0
        and nxos // 128 >= 2
    )
    if use_pallas:
        from tron_tpu.ops.grid_pallas import grid_radial2d_pallas_exact

        kgrid = grid_radial2d_pallas_exact(
            flat, angles, nxos, cfg.kernwidth, beta,
            matmul_dtype=cfg.matmul_dtype, interpret=interpret,
            tuning=cfg.tuning,
        )
    else:
        kgrid = grid_radial2d(
            flat, angles, nxos, cfg.kernwidth, beta, pe_chunk=cfg.pe_chunk,
            raw_rows=True,
        )
    kgrid = kgrid.reshape(batch + (nxos, nxos))
    return _adjoint_epilogue(kgrid, n, cfg, beta)


def planes_path_ok(cfg: ReconConfig, nro: int) -> bool:
    """True when the hoisted sample-plane fast path applies: Pallas windowed
    gridder (TPU) and a tileable grid.  Non-identity radius maps (gridos !=
    2) are fine — to_sample_planes performs the readout->grid-radius
    resample (`src/tron.cu:517`) as part of the hoisted prep.  Used by
    recon_frames to lift the per-frame sample relayout out of the frame
    loop."""
    n = nro // 2
    nxos = int(n * cfg.gridos)
    if nxos % 128 != 0 or nxos // 128 < 2:
        return False
    if cfg.backend == "pallas":
        return True
    return cfg.backend == "auto" and _on_tpu()


def nufft_adjoint_planes(
    planes: jnp.ndarray, angles: jnp.ndarray, cfg: ReconConfig
) -> jnp.ndarray:
    """Adjoint recon from pre-transformed sample planes (npe, nR, 2C) f32
    (see ops.grid_pallas.to_sample_planes; SDC/radius map/mask applied
    upstream, once per acquisition).  Returns coil images (C, n, n)."""
    from tron_tpu.ops.grid_pallas import grid_radial2d_pallas_planes

    nxos = planes.shape[-2]
    n = int(round(nxos / cfg.gridos))
    beta = kb_beta(cfg.kernwidth, cfg.gridos, cfg.beatty)
    kgrid = grid_radial2d_pallas_planes(
        planes, angles, nxos, cfg.kernwidth, beta, matmul_dtype=cfg.matmul_dtype,
        tuning=cfg.tuning,
    )
    return _adjoint_epilogue(kgrid, n, cfg, beta)


def _patch_degrid_wrap_edges(
    samples, kgrid, angles, nro, kernwidth, beta, precision=None
):
    """Overwrite the boundary-crossing readout columns of a clip-mode degrid
    with exact periodic-wrap values (`src/tron.cu:569-570`).

    A KB footprint can cross the grid edge only when the sample's |radius|
    exceeds n/2 - kernwidth, i.e. the first/last ~kernwidth+1 readouts of
    each spoke (the Pallas degrid path requires nro == n, so radii are
    ro - n/2).  Those few columns are recomputed with the dense wrapped
    formulation (one small MXU contraction over the full grid) and patched
    in; every other readout is identical under wrap and clip.
    """
    import numpy as np

    from tron_tpu.kernels.kb import kb_kernel

    n = kgrid.shape[-1]
    # a readout crosses the grid edge when its |radius| (in grid units,
    # n/nro per readout step) is within kernwidth of n/2: the first/last
    # ~kernwidth*nro/n readouts of each spoke
    ekw = int(np.ceil(kernwidth * nro / n)) + 1
    idx = np.r_[0 : min(ekw + 1, nro) , max(nro - ekw - 1, 0) : nro]
    idx = np.unique(idx)
    kr = (idx.astype(np.float32) / nro - 0.5) * n
    ct = jnp.cos(angles).astype(jnp.float32)
    st = jnp.sin(angles).astype(jnp.float32)
    kr_j = jnp.asarray(kr)
    xs = kr_j[None, :] * ct[:, None] + n // 2        # (npe, ne)
    ys = kr_j[None, :] * st[:, None] + n // 2
    grid_pos = jnp.arange(n, dtype=jnp.float32)

    def wkb(d):
        d = jnp.mod(d + n / 2, n) - n / 2
        return kb_kernel(d, kernwidth, beta)

    A = wkb(xs[..., None] - grid_pos).astype(kgrid.dtype)   # (npe, ne, n)
    B = wkb(ys[..., None] - grid_pos).astype(kgrid.dtype)
    V = jnp.einsum("pex,cyx->cpey", A, kgrid, precision=precision)
    s = jnp.einsum("pey,cpey->cpe", B, V, precision=precision)  # (C, npe, ne)
    return samples.at[..., jnp.asarray(idx)].set(s)


def nufft_forward(
    img: jnp.ndarray,
    angles: jnp.ndarray,
    cfg: ReconConfig,
    nro: int | None = None,
    wrap: bool = True,
) -> jnp.ndarray:
    """Images (..., n, n) -> radial samples (..., npe, nro).

    nro defaults to gridos * n (`src/tron.cu:945`).  ``wrap=False`` clips KB
    footprints at the grid edge (exact transpose of the gridding adjoint);
    ``wrap=True`` reproduces the reference's periodic domain
    (`src/tron.cu:569-570`).  The Pallas TPU kernel itself clips; under
    wrap=True the handful of boundary-crossing readouts (those with
    |radius| within kernwidth+1 of the grid edge) are recomputed exactly
    with the dense wrapped formulation and patched in — wrap and clip can
    only differ there.
    """
    n = img.shape[-1]
    nxos = int(n * cfg.gridos)
    if nro is None:
        nro = nxos
    beta = kb_beta(cfg.kernwidth, cfg.gridos, cfg.beatty)

    if _on_tpu() and nxos <= _MXU_DFT_MAX:
        # pad + deapod + centered FFT as two MXU matmuls (the conjugate
        # transpose of the adjoint epilogue; see _adjoint_epilogue)
        kgrid = forward_kspace_mxu(
            img, nxos, cfg.kernwidth, beta, cfg.deapodize,
            dot=cfg.dft_dot_resolved(),
        )
    else:
        x = pad_center(img, nxos)
        if cfg.deapodize:
            x = deapodize(x, nxos, cfg.kernwidth, beta)
        kgrid = centered_fft2(x)
    if cfg.backend in ("pallas", "auto") and nro % 2 == 0:
        try:
            if cfg.backend == "pallas" or _on_tpu():
                from tron_tpu.ops.degrid_pallas import degrid_radial2d_pallas

                batch = kgrid.shape[:-2]
                flat = kgrid.reshape((-1,) + kgrid.shape[-2:])
                out = degrid_radial2d_pallas(
                    flat, angles, nro, cfg.kernwidth, beta,
                    matmul_dtype=cfg.matmul_dtype, tuning=cfg.tuning,
                )
                if wrap:
                    out = _patch_degrid_wrap_edges(
                        out, flat, angles, nro, cfg.kernwidth, beta,
                        precision=(
                            "highest"
                            if cfg.matmul_dtype in ("bf16x3", "bf16x2", "float32")
                            else None
                        ),
                    )
                return out.reshape(batch + out.shape[-2:])
        except Exception:
            if cfg.backend == "pallas":
                raise
    return degrid_radial2d(kgrid, angles, nro, cfg.kernwidth, beta, wrap=wrap)
