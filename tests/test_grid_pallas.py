"""Pallas gridding kernels vs the jnp reference implementation (interpret
mode, so they run on the CPU test mesh; the same kernels compile for TPU).

Covers both backends: the dense-range kernel (single tile) and the
segmented + angle-culled kernel (multi-tile geometries)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tron_tpu.config import AngleScheme
from tron_tpu.kernels.kb import kb_beta
from tron_tpu.ops.grid import grid_radial2d
from tron_tpu.trajectory import spoke_angles
from tests.conftest import nrmse

grid_pallas = pytest.importorskip("tron_tpu.ops.grid_pallas")


def _case(rng, C, npe, nro, scheme=AngleScheme.GOLDEN, skip=5):
    data = (
        rng.standard_normal((C, npe, nro)) + 1j * rng.standard_normal((C, npe, nro))
    ).astype(np.complex64)
    angles = jnp.asarray(spoke_angles(npe, scheme, skip))
    return jnp.asarray(data), angles


def _run(data, angles, nxos, tile, **kw):
    return np.asarray(
        grid_pallas.grid_radial2d_pallas(
            data, angles, nxos, 2.0, kb_beta(2.0, 2.0), tile=tile,
            matmul_dtype=kw.pop("matmul_dtype", "float32"), interpret=True, **kw
        )
    )


def test_full_kernel_matches_jnp(rng):
    nxos = nro = 128
    data, angles = _case(rng, 2, 12, nro)
    want = np.asarray(grid_radial2d(data, angles, nxos, 2.0, kb_beta(2.0, 2.0)))
    got = _run(data, angles, nxos, tile=128, pe_chunk=4)
    err = nrmse(got, want)
    assert err < 1e-5, f"full kernel vs jnp nrmse={err:.2e}"


@pytest.mark.parametrize("C,npe,nxos", [(2, 12, 256), (1, 23, 256), (1, 9, 512), (2, 7, 384)])
def test_seg_kernel_matches_jnp(rng, C, npe, nxos):
    nro = nxos
    data, angles = _case(rng, C, npe, nro)
    want = np.asarray(grid_radial2d(data, angles, nxos, 2.0, kb_beta(2.0, 2.0)))
    got = _run(data, angles, nxos, tile=128, pe_chunk=4)
    err = nrmse(got, want)
    assert err < 1e-5, f"seg kernel vs jnp nrmse={err:.2e}"


def test_seg_kernel_linear_angles(rng):
    """Linear half-scheme spokes exercise the culling wedges differently."""
    nxos = nro = 256
    data, angles = _case(rng, 1, 16, nro, scheme=AngleScheme.LINEAR_HALF, skip=0)
    want = np.asarray(grid_radial2d(data, angles, nxos, 2.0, kb_beta(2.0, 2.0)))
    got = _run(data, angles, nxos, tile=128, pe_chunk=8)
    assert nrmse(got, want) < 1e-5


def test_bf16_accuracy(rng):
    nxos = nro = 128
    data, angles = _case(rng, 2, 16, nro)
    want = np.asarray(grid_radial2d(data, angles, nxos, 2.0, kb_beta(2.0, 2.0)))
    got = _run(data, angles, nxos, tile=128, pe_chunk=8, matmul_dtype="bfloat16")
    err = nrmse(got, want)
    assert err < 2e-2, f"bf16 vs fp32 jnp nrmse={err:.2e}"


def test_2d_input(rng):
    nxos = nro = 128
    data, angles = _case(rng, 1, 8, nro)
    got = np.asarray(
        grid_pallas.grid_radial2d_pallas(
            data[0], angles, nxos, 2.0, kb_beta(2.0, 2.0), pe_chunk=8,
            matmul_dtype="float32", interpret=True,
        )
    )
    want = np.asarray(grid_radial2d(data[0], angles, nxos, 2.0, kb_beta(2.0, 2.0)))
    assert nrmse(got, want) < 1e-5


def test_small_grid_dispatch(rng):
    """nxos < tile falls back to the dense kernel with a shrunken tile."""
    nxos = nro = 64
    data, angles = _case(rng, 1, 8, nro)
    got = _run(data, angles, nxos, tile=128, pe_chunk=4)
    want = np.asarray(grid_radial2d(data, angles, nxos, 2.0, kb_beta(2.0, 2.0)))
    assert nrmse(got, want) < 1e-5


def test_bf16x3_accuracy(rng):
    """Compensated 3-pass bf16 must be ~fp32-grade (<1e-4 vs fp32 ref)."""
    nxos = nro = 256
    data, angles = _case(rng, 2, 16, nro)
    want = np.asarray(grid_radial2d(data, angles, nxos, 2.0, kb_beta(2.0, 2.0)))
    got = _run(data, angles, nxos, tile=128, pe_chunk=8, matmul_dtype="bf16x3")
    err = nrmse(got, want)
    assert err < 2e-4, f"bf16x3 vs fp32 jnp nrmse={err:.2e}"
    got1 = _run(data, angles, nxos, tile=128, pe_chunk=8, matmul_dtype="bfloat16")
    assert nrmse(got1, want) > err  # strictly better than 1-pass


def test_vmap_over_frames(rng):
    """recon_frames lax.map-batches frames, which vmaps the pallas call
    (batched grid dim + batched scalar-prefetch operands) — must equal the
    per-frame loop."""
    import jax

    nxos = nro = 256
    kw, beta = 2.0, kb_beta(2.0, 2.0)
    F, C, npe = 3, 2, 12
    data = (rng.standard_normal((F, C, npe, nro)) +
            1j * rng.standard_normal((F, C, npe, nro))).astype(np.complex64)
    skips = jnp.asarray([0.0, 5.0, 11.0])

    def one(d, skip):
        ang = spoke_angles(npe, AngleScheme.GOLDEN, skip)
        return grid_pallas.grid_radial2d_pallas(
            d, ang, nxos, kw, beta, pe_chunk=4, interpret=True,
            matmul_dtype="float32",
        )

    got = np.asarray(jax.vmap(one)(jnp.asarray(data), skips))
    for f in range(F):
        want = np.asarray(one(jnp.asarray(data[f]), skips[f]))
        err = nrmse(got[f], want)
        assert err < 1e-6, f"frame {f}: vmap vs loop nrmse={err:.2e}"


def test_planes_path_matches_complex_path(rng):
    """grid_radial2d_pallas_planes (the hoisted once-per-acquisition prep)
    must reproduce the complex-input path exactly: same kernel, the sample
    relayout just happens outside."""
    nxos = nro = 256
    data, angles = _case(rng, 3, 20, nro)
    want = _run(data, angles, nxos, tile=128, pe_chunk=4)
    planes = grid_pallas.to_sample_planes(data, nxos)
    assert planes.shape == (20, nxos, 6)
    got = np.asarray(
        grid_pallas.grid_radial2d_pallas_planes(
            planes, angles, nxos, 2.0, kb_beta(2.0, 2.0), pe_chunk=4,
            matmul_dtype="float32", interpret=True,
        )
    )
    err = nrmse(got, want)
    assert err < 1e-7, f"planes vs complex path nrmse={err:.2e}"


def test_recon_frames_planes_path_equivalence(rng):
    """recon_frames' hoisted planes fast path (backend='pallas' on the CPU
    interpreter is not available, so drive the pieces directly): SDC +
    to_sample_planes + window slice + planes gridding must equal the
    nufft_adjoint chain on the sliced complex window."""
    import dataclasses

    import jax

    from tron_tpu.config import ReconConfig
    from tron_tpu.nufft import nufft_adjoint, sdc_weights

    nro, npe1, work, slide = 256, 28, 20, 4
    cfg = ReconConfig(golden_angle=True, adjoint=True, backend="jnp")
    data = (
        rng.standard_normal((2, npe1, nro)) + 1j * rng.standard_normal((2, npe1, nro))
    ).astype(np.complex64)
    d = jnp.asarray(data)

    w = sdc_weights(cfg, nro, work).astype(d.dtype)
    planes = grid_pallas.to_sample_planes(d * w, nro)
    z = 2
    win_p = jax.lax.dynamic_slice_in_dim(planes, z * slide, work, axis=0)
    angles = spoke_angles(work, AngleScheme.GOLDEN, z * slide)
    kgrid_planes = np.asarray(
        grid_pallas.grid_radial2d_pallas_planes(
            win_p, angles, nro, 2.0, kb_beta(2.0, 2.0), pe_chunk=4,
            matmul_dtype="float32", interpret=True,
        )
    )
    win_c = jax.lax.dynamic_slice_in_dim(d, z * slide, work, axis=-2)
    from tron_tpu.ops.grid import grid_radial2d

    kgrid_ref = np.asarray(
        grid_radial2d(win_c * w, angles, nro, 2.0, kb_beta(2.0, 2.0))
    )
    err = nrmse(kgrid_planes, kgrid_ref)
    assert err < 1e-5, f"planes window vs reference gridder nrmse={err:.2e}"


def test_bf16x2_accuracy(rng):
    """2-pass bf16x2 (A-operand split only): accuracy must land between
    1-pass bf16 and 3-pass bf16x3 (it removes the A-rounding cross term but
    keeps the U rounding — measured ~1.7e-3 vs bf16's ~2.3e-3 on random
    data; kept as an experiment, NOT the --precision accurate mode)."""
    nxos = nro = 256
    data, angles = _case(rng, 2, 16, nro)
    want = np.asarray(grid_radial2d(data, angles, nxos, 2.0, kb_beta(2.0, 2.0)))
    err3 = nrmse(
        _run(data, angles, nxos, tile=128, pe_chunk=8, matmul_dtype="bf16x3"), want
    )
    err2 = nrmse(
        _run(data, angles, nxos, tile=128, pe_chunk=8, matmul_dtype="bf16x2"), want
    )
    err1 = nrmse(
        _run(data, angles, nxos, tile=128, pe_chunk=8, matmul_dtype="bfloat16"), want
    )
    assert err3 < err2 < err1, (err3, err2, err1)


def test_center_split_matches_single_call(rng):
    """center_tile > 0 splits the windowed gridder into an outer flat-tile
    call + a finer-tiled origin-region call (see _pallas_win_impl); the
    result must match the single-call path to accumulation-order noise and
    the jnp reference gridder to fp32 tolerance."""
    from tron_tpu.config import KernelTuning

    nxos = nro = 64
    data, angles = _case(rng, 2, 9, nro)
    want = np.asarray(grid_radial2d(data, angles, nxos, 2.0, kb_beta(2.0, 2.0)))
    base = _run(
        data, angles, nxos, tile=16, pe_chunk=4, tuning=KernelTuning()
    )
    split = _run(
        data, angles, nxos, tile=16, pe_chunk=4,
        tuning=KernelTuning(center_tile=8),
    )
    assert nrmse(split, base) < 1e-6, nrmse(split, base)
    assert nrmse(split, want) < 1e-5, nrmse(split, want)


@pytest.mark.parametrize("mm", ["float32", "bfloat16", "bf16x3"])
def test_batched_kernel_matches_loop_kernel(rng, mm):
    """KernelTuning(batched=True) swaps the per-hit fori_loop for a static
    unroll whose operands are SSA values concatenated into the dots (no
    operand scratches).  float32 mode must be bitwise-equal to the loop
    kernel (identical math, identical FMA formation); the bf16 modes may
    diverge by rounding-path reassociation only, so they are gated against
    the fp32 reference at their precision-class tolerance."""
    from tron_tpu.config import KernelTuning

    nxos = nro = 256
    data, angles = _case(rng, 2, 12, nro)
    loop = _run(
        data, angles, nxos, tile=128, pe_chunk=4, matmul_dtype=mm,
        tuning=KernelTuning(),
    )
    batched = _run(
        data, angles, nxos, tile=128, pe_chunk=4, matmul_dtype=mm,
        tuning=KernelTuning(batched=True),
    )
    if mm == "float32":
        np.testing.assert_array_equal(batched, loop)
    else:
        want = np.asarray(grid_radial2d(data, angles, nxos, 2.0, kb_beta(2.0, 2.0)))
        tol = 2e-2 if mm == "bfloat16" else 2e-4
        assert nrmse(batched, want) < tol, nrmse(batched, want)
        assert nrmse(batched, loop) < tol / 10, nrmse(batched, loop)


def test_batched_with_center_split(rng):
    """batched=True must compose with the center-split flat-tile-list
    dispatch (untested combination otherwise: flat mode reads the (ti, tj)
    prefetch tables inside the batched kernel too)."""
    from tron_tpu.config import KernelTuning

    nxos = nro = 64
    data, angles = _case(rng, 2, 9, nro)
    want = np.asarray(grid_radial2d(data, angles, nxos, 2.0, kb_beta(2.0, 2.0)))
    split_b = _run(
        data, angles, nxos, tile=16, pe_chunk=4,
        tuning=KernelTuning(center_tile=8, batched=True),
    )
    base_b = _run(
        data, angles, nxos, tile=16, pe_chunk=4,
        tuning=KernelTuning(batched=True),
    )
    assert nrmse(split_b, base_b) < 1e-6, nrmse(split_b, base_b)
    assert nrmse(split_b, want) < 1e-5, nrmse(split_b, want)


def test_scrub_per_tile_bitwise_identical(rng):
    """KernelTuning(scrub_per_tile=True) re-gates the one-time operand-
    scratch scrub on every tile's first chunk step (megacore portability:
    on v4/v5p Mosaic may split the leading 'parallel' dim across two
    TensorCores, and the once-per-grid scrub would miss the second core's
    scratches).  On a single-core schedule the results must be bitwise
    identical: stale-but-finite U rows are neutralized by zeroed A rows
    either way, and the extra scrubs only rewrite already-neutralized
    state.  Covers both the windowed (multi-tile) and seg fallback paths."""
    from tron_tpu.config import KernelTuning

    nxos = nro = 256
    data, angles = _case(rng, 2, 12, nro)
    for windowed in (True, False):
        base = _run(
            data, angles, nxos, tile=128, pe_chunk=4, windowed=windowed,
            tuning=KernelTuning(),
        )
        scrubbed = _run(
            data, angles, nxos, tile=128, pe_chunk=4, windowed=windowed,
            tuning=KernelTuning(scrub_per_tile=True),
        )
        np.testing.assert_array_equal(scrubbed, base)


@pytest.mark.parametrize("gridos", [1.5, 2.5])
def test_windowed_kernel_nondefault_gridos(rng, gridos):
    """gridos != 2 (non-identity readout->grid radius map, src/tron.cu:517)
    must stay on the windowed MXU kernel — parity vs the jnp gridder at
    osf 1.5 (nxos=384, 3x3 tiles) and 2.5 (nxos=640, 5x5 tiles)."""
    nro = 512
    nxos = int((nro // 2) * gridos)
    assert nxos % 128 == 0 and nxos // 128 >= 2  # tileable: kernel, not dense
    data, angles = _case(rng, 1, 7, nro)
    want = np.asarray(grid_radial2d(data, angles, nxos, 2.0, kb_beta(2.0, gridos)))
    got = _run(data, angles, nxos, tile=128, pe_chunk=4)
    err = nrmse(got, want)
    assert err < 1e-5, f"windowed kernel at gridos={gridos} nrmse={err:.2e}"


@pytest.mark.parametrize("gridos", [1.5, 2.5])
def test_planes_path_nondefault_gridos(rng, gridos):
    """The hoisted sample-plane fast path at gridos != 2: to_sample_planes
    performs the radius-map resample, so the planes gridder must match the
    complex-input kernel exactly."""
    import dataclasses

    from tron_tpu.config import ReconConfig
    from tron_tpu.nufft import planes_path_ok

    nro = 512
    nxos = int((nro // 2) * gridos)
    cfg = ReconConfig(golden_angle=True, adjoint=True, gridos=gridos,
                      backend="pallas")
    assert planes_path_ok(cfg, nro)
    data, angles = _case(rng, 1, 6, nro)
    beta = kb_beta(2.0, gridos)
    want = np.asarray(
        grid_pallas.grid_radial2d_pallas(
            data, angles, nxos, 2.0, beta, pe_chunk=4,
            matmul_dtype="float32", interpret=True,
        )
    )
    planes = grid_pallas.to_sample_planes(data, nxos)
    got = np.asarray(
        grid_pallas.grid_radial2d_pallas_planes(
            planes, angles, nxos, 2.0, beta, pe_chunk=4,
            matmul_dtype="float32", interpret=True,
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("gridos", [1.5, 2.0, 2.5])
def test_exact_lattice_gridder_matches_dense(rng, gridos):
    """grid_radial2d_pallas_exact (raw readout rows at exact radii) vs the
    dense raw_rows gridder; at gridos=2 it must also equal the default
    resampled path (identity radius map)."""
    nro = 512
    nxos = int((nro // 2) * gridos)
    beta = kb_beta(2.0, gridos)
    data, angles = _case(rng, 1, 6, nro)
    # readout 0 (|radius| = nxos/2, at/beyond the band clamp) is never
    # gridded by the kernel convention — the solver weights it out; the
    # dense raw_rows oracle has no such clamp, so zero it for the compare
    data = data.at[..., 0].set(0)
    want = np.asarray(
        grid_radial2d(data, angles, nxos, 2.0, beta, raw_rows=True)
    )
    got = np.asarray(
        grid_pallas.grid_radial2d_pallas_exact(
            data, angles, nxos, 2.0, beta, pe_chunk=4,
            matmul_dtype="float32", interpret=True,
        )
    )
    err = nrmse(got, want)
    assert err < 1e-5, f"exact-lattice gridder at gridos={gridos} nrmse={err:.2e}"
    if gridos == 2.0:
        # identity radius map: the exact-lattice path must equal the
        # default resampled path bit-for-bit-ish
        default = np.asarray(
            grid_pallas.grid_radial2d_pallas(
                data, angles, nxos, 2.0, beta, pe_chunk=4,
                matmul_dtype="float32", interpret=True,
            )
        )
        assert nrmse(got, default) < 1e-6


@pytest.mark.parametrize("gridos", [1.5, 2.5])
def test_exact_pair_adjointness(rng, gridos):
    """Dot test: the exact-lattice Pallas gridder is the transpose of the
    generalized Pallas degrid at gridos != 2 (the CGNR pair contract)."""
    from tron_tpu.ops.degrid_pallas import degrid_radial2d_pallas

    nro = 512
    nxos = int((nro // 2) * gridos)
    beta = kb_beta(2.0, gridos)
    angles = jnp.asarray(spoke_angles(5, AngleScheme.GOLDEN, 2))
    x = (rng.standard_normal((1, nxos, nxos))
         + 1j * rng.standard_normal((1, nxos, nxos))).astype(np.complex64)
    y = (rng.standard_normal((1, 5, nro))
         + 1j * rng.standard_normal((1, 5, nro))).astype(np.complex64)
    Ax = degrid_radial2d_pallas(
        jnp.asarray(x), angles, nro, 2.0, beta, pe_chunk=4,
        matmul_dtype="float32", interpret=True,
    )
    AHy = grid_pallas.grid_radial2d_pallas_exact(
        jnp.asarray(y), angles, nxos, 2.0, beta, pe_chunk=4,
        matmul_dtype="float32", interpret=True,
    ) * (nxos * 5)  # undo the gridder's reference 1/(nxos*npe) scale
    lhs = complex(jnp.vdot(jnp.asarray(y), Ax))
    rhs = complex(jnp.vdot(AHy, jnp.asarray(x)))
    rel = abs(lhs - rhs) / abs(rhs)
    assert rel < 1e-4, f"pair dot test at gridos={gridos}: rel={rel:.2e}"


@pytest.mark.parametrize("gridos", [1.5, 2.5])
def test_recon_call_sites_nondefault_gridos_shapes(gridos):
    """Regression (round-4 review): the production planes-path call sites
    (recon_frames, recon_frames_incremental, _sharded_step) must pass nxos
    — not nro — to to_sample_planes.  At gridos != 2 the wrong argument
    builds planes on an nro-row lattice and the epilogue infers a wrong
    image size; jax.eval_shape traces the Pallas path on any platform."""
    import jax

    from tron_tpu.config import ReconConfig
    from tron_tpu.nufft import planes_path_ok
    from tron_tpu.recon import recon_frames, recon_frames_incremental

    nro, npe1, nc, n = 512, 246, 2, 256
    cfg = ReconConfig(golden_angle=True, adjoint=True, gridos=gridos,
                      backend="pallas", incremental=True)
    assert planes_path_ok(cfg, nro)
    data = jnp.zeros((nc, npe1, nro), jnp.complex64)
    out = jax.eval_shape(
        lambda d: recon_frames(d, cfg, npe1work=204, prof_slide=21, nz=3), data
    )
    assert out.shape == (3, n, n)
    out = jax.eval_shape(
        lambda d: recon_frames_incremental(
            d, cfg, npe1work=204, prof_slide=21, nz=3
        ),
        data,
    )
    assert out.shape == (3, n, n)
