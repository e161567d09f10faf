"""Reconstruction configuration.

One frozen dataclass carries every knob of the reference CLI
(`/root/reference/src/tron.cu:794-874`) plus the compile-time knobs that the
reference bakes into headers (`src/tron.h:48-51`, `src/Makefile:3-6`), which
here are just fields.  Being hashable, a ReconConfig can be a static argument
to jit.
"""

from __future__ import annotations

import dataclasses
import math


class AngleScheme:
    """Spoke-angle conventions.

    The reference uses *different* linear-angle conventions in its grid and
    degrid kernels (grid: pe*2*pi/npe + pi/2 at `src/tron.cu:509`; degrid:
    pe*pi/npe at `src/tron.cu:555`) — a documented quirk.  Here the scheme is
    explicit and the same scheme is used for both directions, so forward and
    adjoint are true adjoints of each other (required for CGNR to converge).
    """

    GOLDEN = "golden"           # modang(PHI * (pe + skip)); PHI = pi/golden-ratio
    LINEAR_HALF = "linear_half"  # pe * pi / npe           (reference degrid convention)
    LINEAR_FULL = "linear_full"  # pe * 2*pi / npe + pi/2  (reference grid convention)


# Golden angle increment in radians = pi / ((1+sqrt(5))/2) ~= 111.246 deg
# (`src/tron.cu:90`, `src/RUNME4_others_grid_slcmt.m:119`).
PHI = math.pi / ((1.0 + math.sqrt(5.0)) / 2.0)


@dataclasses.dataclass(frozen=True)
class KernelTuning:
    """Pallas kernel tuning knobs — the analog of the reference's -B/-T
    launch geometry flags (`src/tron.cu:831-832, 864-865`), as first-class
    config instead of env vars.  ``KernelTuning.from_env()`` applies TRON_*
    environment overrides for experiments; the default path (ReconConfig
    .tuning left at None resolves via from_env at trace time, so a clean
    environment yields exactly these defaults)."""

    # hit-loop unroll factor (1 = plain dynamic loop, 2 = paired body)
    unroll: int = 1
    # short-window row count (see ops.grid_pallas._pallas_win_impl)
    ws: int = 48
    # chunk-fusion factor: pe-chunks swept per grid step
    kf: int = 1
    # tile rows (tile_y) for the windowed kernels; None = square tiles
    tile_y: int | None = None
    # scoped-vmem cap override in bytes (0 = keep XLA's 16 MB default)
    vmem_limit: int = 0
    # operand-scratch budget that clamps pe_chunk (bytes)
    vmem_budget: int = 12 * 1024 * 1024
    # koosh (-3) slice batch; 0 = auto-derive from the vmem budget
    koosh_batch: int = 0
    # center-split: sub-tile size for the origin-adjacent region of the
    # windowed gridder (0 = single-call path; see ops.grid_pallas
    # _pallas_win_impl — the origin tiles carry ~half the expanded-operand
    # volume and re-gridding them with finer tiles cuts it)
    center_tile: int = 0
    # batched-eval kernels: replace the dynamic per-hit fori_loop with a
    # static unroll over hit slots.  Gridding side: A/B/U operands become
    # SSA values concatenated into the dot operands (no per-hit scratch
    # stores, no zero-tail bookkeeping) — ops.grid_pallas._win_kernel_batched.
    # Degridding side: same unroll with 0/1-masked padded-slot contributions
    # — ops.degrid_pallas._degrid_kernel(batched=True).  Both bitwise-equal
    # to the loop kernels in float32 mode.
    batched: bool = False
    # incremental (telescoping) scan: frames per lax.scan step — one
    # batched delta gridding + cumulative sum + batched epilogue per step
    # (recon.incremental_scan).  Measured at whole-body geometry the cost
    # is MONOTONE in the block (882 Msamp/s at 1 vs 786 at 8 vs 531 at 32
    # — the batched form materializes bs delta grids + a cumsum where
    # bs=1 lets XLA accumulate the carried grid in place), so the default
    # is the degenerate block
    inc_block: int = 1
    # direct path: frames per lax.map step in recon_frames.  Same story as
    # inc_block (chip-measured monotone: 308.9/304.1/301.8/295.3/289.1
    # Msamp/s at 1/2/4/8/16 — vmapping B frames materializes B full
    # k-space grids with zero dispatch to amortize), so default 1
    frame_block: int = 1
    # megacore portability: re-run the operand-scratch scrub at every tile's
    # first chunk step (k == 0) instead of once per grid.  The one-time
    # scrub assumes a single TensorCore executes the whole grid (true on
    # v5e); on a megacore part (v4/v5p) Mosaic may partition the leading
    # 'parallel' dim across two cores and the second core's scratches would
    # miss the init.  Costs ~2% extra scrub store traffic; results are
    # bitwise-identical (tests/test_grid_pallas.py).
    scrub_per_tile: bool = False

    @classmethod
    def for_geometry(cls, nxos: int | None) -> "KernelTuning":
        """Measured per-geometry defaults, keyed on the oversampled grid
        size (the analog of re-running the reference's -B/-T launch tuning
        per dataset class, `src/tron.cu:831-832`).  The base defaults
        encode the 512^2 whole-body optimum (round-2/3 scans); entries
        here override fields where a geometry-specific scan measured a
        different optimum (NOTES.md round-4 256^2 scan)."""
        if nxos is not None and nxos <= 256:
            # 256^2 class (optic-nerve / swallowing geometries)
            return cls(ws=24)
        if nxos is not None and nxos > 512:
            # large oversampled grids (osf > 2 on 512-readout data, or
            # 1024-readout acquisitions): the windowed gridder's scoped-vmem
            # demand exceeds XLA's 16 MB default cap (measured 16.26 MB at
            # nxos=640 — compile-time OOM), so raise it.  The cap is an XLA
            # flag default, not hardware (v5e has 128 MB VMEM); 32 MB
            # measured perf-neutral at the 512 geometry (NOTES round 2).
            return cls(vmem_limit=24 * 1024 * 1024)
        return cls()

    @classmethod
    def from_env(cls, nxos: int | None = None) -> "KernelTuning":
        """Per-geometry defaults + TRON_* environment overrides
        (experiment scaffolding).

        Read at trace time, NOT import time — but note a change after a
        function is jit-cached still has no effect on the cached program."""
        import os

        d = cls.for_geometry(nxos)

        def gi(name, default):
            return int(os.environ.get(name, default))

        ty = gi("TRON_TY", d.tile_y or 0)
        return cls(
            unroll=gi("TRON_UNROLL", d.unroll),
            ws=gi("TRON_WS", d.ws),
            kf=gi("TRON_KF", d.kf),
            tile_y=ty or None,
            vmem_limit=gi("TRON_VMEM_LIMIT", d.vmem_limit),
            vmem_budget=gi("TRON_VMEM_BUDGET", d.vmem_budget),
            koosh_batch=gi("TRON_KOOSH_BATCH", d.koosh_batch),
            inc_block=gi("TRON_INC_BS", d.inc_block),
            frame_block=gi("TRON_FRAME_BS", d.frame_block),
            center_tile=gi("TRON_CT", d.center_tile),
            batched=gi("TRON_BATCHED", 1 if d.batched else 0) != 0,
            scrub_per_tile=gi(
                "TRON_SCRUB_PER_TILE", 1 if d.scrub_per_tile else 0
            ) != 0,
        )


@dataclasses.dataclass(frozen=True)
class ReconConfig:
    # Geometry / kernel (reference defaults at src/tron.cu:66-69)
    gridos: float = 2.0          # -o grid oversampling factor
    kernwidth: float = 2.0       # -k kernel half-width in oversampled grid units
    beatty: bool = False         # -DBEATTY_BETA variant of the KB shape

    # Trajectory
    golden_angle: bool = False   # -G
    skip_angles: int = 0         # -s
    angle_scheme: str | None = None  # override; default derived per direction

    # Sliding-window framing (src/tron.cu:904-935)
    data_undersamp: float = 1.0  # -u
    prof_slide: int = 0          # -d (0 -> npe1work, i.e. non-overlapping frames)

    # Pipeline
    adjoint: bool = False        # -a
    deapodize: bool = True       # on by default (src/tron.cu:87)
    sdc: str = "ramlak"          # "ramlak" (reference parity, src/tron.cu:405-416)
                                 # | "ideal" (exact polar cell areas, unit gain)
    niter: int = 0               # -i CGNR iterations (0 = plain adjoint)
    toeplitz: bool = False       # --toeplitz: apply the CGNR normal operator
                                 # as a Toeplitz-embedded FFT convolution
                                 # (one precomputed PSF kernel per frame;
                                 # each iteration is two 2n-FFT pairs
                                 # instead of a degrid+grid — see
                                 # solver.toeplitz_fourier_kernel)
    koosh: bool = False          # -3 (3D stack handling)
    incremental: bool = False    # telescoping sliding-window gridding: frame
                                 # z+1's k-space grid = frame z's grid
                                 # - (leaving spokes) + (entering spokes), one
                                 # signed 2*prof_slide-spoke gridding call per
                                 # frame instead of regridding all npe1work
                                 # spokes (the reference regrids every window
                                 # from scratch, src/tron.cu:732-757).  Valid
                                 # only for the golden-angle scheme (spoke
                                 # angle depends on the global profile index,
                                 # src/tron.cu:509) with overlapping windows;
                                 # other cases fall back to the direct path.
    coil_combine: str = "sos"    # "sos" | "walsh" | "none"
    walsh_npatch: int = 1
    coil_compress: int = 0       # SVD-compress to N virtual coils (0 = off);
                                 # the reference's open TODO at src/tron.cu:765

    # Implementation knobs
    backend: str = "auto"        # "auto" | "jnp" | "pallas"
    matmul_dtype: str = "bfloat16"   # gridding contraction input dtype:
                                     # "bfloat16" | "bf16x3" (~fp32) |
                                     # "bf16x2" (A-split only, between the
                                     # two) | "float32"; fp32 accum always
                                     # (XLA's own TPU einsum default is
                                     # also 1-pass bf16)
    dft_dot: str = "auto"        # MXU DFT epilogue/prologue dot algorithm:
                                 # "highest" (fp32-grade, 6 bf16 passes per
                                 # real dot) | "bf16x3" (3 passes, ~1e-5
                                 # relative) | "auto" (bf16x3 when the
                                 # gridding contraction is plain bf16 —
                                 # whose ~3e-3 error dwarfs the epilogue's —
                                 # else highest, so accurate mode stays
                                 # fp32-grade end to end).  The CGNR solver
                                 # always uses "highest" so the operator
                                 # pair stays exactly adjoint.
    pe_chunk: int = 8            # spokes processed per inner step in the jnp gridder
    tuning: KernelTuning | None = None  # Pallas kernel tuning; None = defaults
                                        # with TRON_* env overrides (from_env)

    def dft_dot_resolved(self) -> str:
        """The dot algorithm the MXU DFT sandwich actually runs (resolves
        "auto" against the gridding contraction dtype; see the field doc)."""
        if self.dft_dot == "auto":
            return "bf16x3" if self.matmul_dtype == "bfloat16" else "highest"
        return self.dft_dot

    def kernel_tuning(self, nxos: int | None = None) -> KernelTuning:
        return (
            self.tuning
            if self.tuning is not None
            else KernelTuning.from_env(nxos)
        )

    def scheme_for(self, direction: str) -> str:
        """Angle scheme for 'forward' or 'adjoint', honoring the override.

        Defaults reproduce the reference's per-direction conventions so its
        datasets reconstruct identically; set ``angle_scheme`` to get a
        self-consistent pair (as the tests and CGNR do).
        """
        if self.golden_angle:
            return AngleScheme.GOLDEN
        if self.angle_scheme is not None:
            return self.angle_scheme
        return (
            AngleScheme.LINEAR_FULL if direction == "adjoint" else AngleScheme.LINEAR_HALF
        )

    def npe1work(self, nro: int, npe1: int) -> int:
        """Profiles per frame (`src/tron.cu:916-919`)."""
        cap = int(nro * self.data_undersamp)
        return npe1 if npe1 <= cap else cap

    def frame_geometry(self, nro: int, npe1: int) -> tuple[int, int, int]:
        """(npe1work, prof_slide, nz) for a sliding-window recon
        (`src/tron.cu:916-928`)."""
        work = self.npe1work(nro, npe1)
        slide = self.prof_slide if self.prof_slide > 0 else work
        nz = 1 + (npe1 - work) // slide
        return work, slide, nz
