"""Hardware parity checks — run on a real TPU (skipped on the CPU test
mesh): the compiled Pallas kernels must match the XLA reference backends at
the bf16 noise floor (and at ~fp32 in bf16x3 mode) across geometries, with
no masked regions.  These are the tests behind the numbers in NOTES.md; run
with JAX_PLATFORMS unset on a TPU host:

    JAX_PLATFORMS= python -m pytest tests/test_tpu_parity.py -q --no-header
"""

import numpy as np
import pytest


def _tpu():
    import jax

    try:
        dev = jax.devices()[0]
        return "tpu" in (dev.platform or "").lower() or "TPU" in getattr(
            dev, "device_kind", ""
        )
    except Exception:
        return False


pytestmark = pytest.mark.skipif(not _tpu(), reason="needs real TPU hardware")

KW = 2.0


def _beta():
    from tron_tpu.kernels.kb import kb_beta

    return kb_beta(KW, 2.0)


def _nrmse(a, b):
    return float(np.linalg.norm(a - b) / np.linalg.norm(b))


def _on_cpu(fn, *args):
    """Run the XLA reference golden on the in-process CPU backend: the dense
    reference gridder compiled/run on TPU cost up to 290 s per geometry, on
    CPU it is seconds (conftest adds ',cpu' to JAX_PLATFORMS for this)."""
    import jax

    with jax.default_device(jax.devices("cpu")[0]):
        return np.asarray(fn(*args))


# 4 geometries: small, non-power-of-two grid, whole-body, and a
# non-multiple-of-pe_chunk npe with skip
@pytest.mark.parametrize(
    "nxos,npe,skip",
    [(256, 41, 3), (384, 96, 0), (512, 204, 21), (256, 33, 7)],
)
def test_grid_pallas_vs_xla_on_tpu(rng, nxos, npe, skip):
    import jax

    from tron_tpu.config import AngleScheme
    from tron_tpu.ops.grid import grid_radial2d
    from tron_tpu.ops.grid_pallas import grid_radial2d_pallas
    from tron_tpu.trajectory import spoke_angles
    from tron_tpu.utils.xfer import to_device, to_host

    import jax.numpy as jnp

    C = 3
    data = (
        rng.standard_normal((C, npe, nxos)) + 1j * rng.standard_normal((C, npe, nxos))
    ).astype(np.complex64)
    angles = jnp.asarray(spoke_angles(npe, AngleScheme.GOLDEN, skip))
    d = to_device(data)
    got = to_host(grid_radial2d_pallas(d, angles, nxos, KW, _beta()))
    want = _on_cpu(
        lambda: jax.jit(grid_radial2d, static_argnums=(2, 3, 4))(
            data, np.asarray(angles), nxos, KW, _beta()
        )
    )
    err = _nrmse(got, want)
    assert err < 1e-2, f"nxos={nxos} npe={npe}: {err:.2e}"


def test_grid_pallas_bf16x3_fp32_grade_on_tpu(rng):
    """Compensated bf16x3 vs the XLA gridder forced to fp32-grade matmuls:
    must be <= 1e-4 (the 'accurate' mode's contract)."""
    import jax
    import jax.numpy as jnp

    from tron_tpu.config import AngleScheme
    from tron_tpu.ops.grid import grid_radial2d
    from tron_tpu.ops.grid_pallas import grid_radial2d_pallas
    from tron_tpu.trajectory import spoke_angles
    from tron_tpu.utils.xfer import to_device, to_host

    nxos, C, npe = 512, 3, 204
    data = (
        rng.standard_normal((C, npe, nxos)) + 1j * rng.standard_normal((C, npe, nxos))
    ).astype(np.complex64)
    angles = jnp.asarray(spoke_angles(npe, AngleScheme.GOLDEN, 0))
    d = to_device(data)
    got = to_host(
        grid_radial2d_pallas(d, angles, nxos, KW, _beta(), matmul_dtype="bf16x3")
    )

    def want_fn():
        with jax.default_matmul_precision("float32"):
            return jax.jit(grid_radial2d, static_argnums=(2, 3, 4))(
                data, np.asarray(angles), nxos, KW, _beta()
            )

    want = _on_cpu(want_fn)
    err = _nrmse(got, want)
    assert err < 1e-4, f"bf16x3: {err:.2e}"


def test_degrid_pallas_full_columns_on_tpu(rng):
    """Forward degrid via the Pallas kernel + wrap edge patch vs the dense
    wrapped XLA formulation — ALL readout columns, no masks (the wrap
    convention of src/tron.cu:569-570 is now exact on the fast path)."""
    import jax
    import jax.numpy as jnp

    from tron_tpu.config import AngleScheme, ReconConfig
    from tron_tpu.nufft import nufft_forward
    from tron_tpu.trajectory import spoke_angles
    from tron_tpu.utils.xfer import to_device, to_host

    n, C, npe = 128, 2, 33
    img = (rng.standard_normal((C, n, n)) + 1j * rng.standard_normal((C, n, n))).astype(
        np.complex64
    )
    angles = jnp.asarray(spoke_angles(npe, AngleScheme.GOLDEN, 0))
    imgd = to_device(img)
    cfg_p = ReconConfig(backend="pallas")
    cfg_j = ReconConfig(backend="jnp")
    ang_np = np.asarray(angles)
    got = to_host(jax.jit(lambda x: nufft_forward(x, angles, cfg_p))(imgd))
    want = _on_cpu(lambda: jax.jit(lambda x: nufft_forward(x, ang_np, cfg_j))(img))
    err = _nrmse(got, want)
    assert err < 1e-2, f"{err:.2e}"
    # edge columns specifically (where clip vs wrap used to disagree)
    edge = np.r_[0:4, got.shape[-1] - 4 : got.shape[-1]]
    err_e = _nrmse(got[..., edge], want[..., edge])
    assert err_e < 1e-2, f"edge columns: {err_e:.2e}"


def test_adjoint_pipeline_parity_on_tpu(rng):
    """Full adjoint recon (SDC -> grid -> IFFT -> crop -> deapod) on
    structured phantom multicoil data: Pallas vs jnp backends."""
    import jax
    import jax.numpy as jnp

    from tron_tpu.config import ReconConfig
    from tron_tpu.nufft import nufft_adjoint, nufft_forward
    from tron_tpu.phantom import birdcage_sensitivities, shepp_logan
    from tron_tpu.trajectory import spoke_angles
    from tron_tpu.utils.xfer import to_device, to_host

    n, nc, npe = 128, 4, 96
    img = (shepp_logan(n)[None] * birdcage_sensitivities(n, nc)).astype(np.complex64)
    angles = jnp.asarray(spoke_angles(npe, "golden", 0))
    cfg_j = ReconConfig(backend="jnp", golden_angle=True)
    cfg_p = ReconConfig(backend="pallas", golden_angle=True)
    imgd = to_device(img)
    ang_np = np.asarray(angles)
    data = jax.jit(lambda x: nufft_forward(x, angles, cfg_j, nro=2 * n))(imgd)
    got = to_host(jax.jit(lambda x: nufft_adjoint(x, angles, cfg_p))(data))
    data_np = np.asarray(to_host(data))
    want = _on_cpu(lambda: jax.jit(lambda x: nufft_adjoint(x, ang_np, cfg_j))(data_np))
    err = _nrmse(got, want)
    assert err < 1e-2, f"{err:.2e}"


def test_cgnr_parity_on_tpu(rng):
    """CGNR on the fast Pallas operator pair vs the jnp operator pair:
    both must converge to the same image (bf16 noise floor)."""
    import jax
    import jax.numpy as jnp

    from tron_tpu.config import ReconConfig
    from tron_tpu.nufft import nufft_forward
    from tron_tpu.phantom import birdcage_sensitivities, shepp_logan
    from tron_tpu.solver import cgnr_radial2d
    from tron_tpu.trajectory import spoke_angles
    from tron_tpu.utils.xfer import to_device, to_host

    n, nc, npe = 128, 3, 120
    img = (shepp_logan(n)[None] * birdcage_sensitivities(n, nc)).astype(np.complex64)
    angles = jnp.asarray(spoke_angles(npe, "golden", 0))
    cfg_j = ReconConfig(backend="jnp", golden_angle=True, niter=6)
    cfg_p = ReconConfig(backend="pallas", golden_angle=True, niter=6)
    imgd = to_device(img)
    ang_np = np.asarray(angles)
    data = jax.jit(lambda x: nufft_forward(x, angles, cfg_j, nro=2 * n))(imgd)
    got = to_host(jax.jit(lambda x: cgnr_radial2d(x, angles, cfg_p))(data))
    data_np = np.asarray(to_host(data))
    want = _on_cpu(lambda: jax.jit(lambda x: cgnr_radial2d(x, ang_np, cfg_j))(data_np))
    err = _nrmse(got, want)
    assert err < 2e-2, f"{err:.2e}"


def test_degrid_pallas_bf16x3_fp32_grade_on_tpu(rng):
    """Accurate-mode forward: the bf16x3 Pallas degrid must reach ~fp32
    (<= 1e-4) against the dense XLA degrid at fp32-grade matmul precision."""
    import jax
    import jax.numpy as jnp

    from tron_tpu.config import AngleScheme
    from tron_tpu.ops.degrid import _degrid_dense
    from tron_tpu.ops.degrid_pallas import degrid_radial2d_pallas
    from tron_tpu.trajectory import spoke_angles
    from tron_tpu.utils.xfer import to_device, to_host

    n, C, npe = 256, 2, 33
    g = (rng.standard_normal((C, n, n)) + 1j * rng.standard_normal((C, n, n))).astype(
        np.complex64
    )
    angles = jnp.asarray(spoke_angles(npe, AngleScheme.GOLDEN, 0))
    G = to_device(g)
    got = to_host(
        degrid_radial2d_pallas(G, angles, n, KW, _beta(), matmul_dtype="bf16x3")
    )
    ang_np = np.asarray(angles)

    def want_fn():
        with jax.default_matmul_precision("float32"):
            return jax.jit(
                lambda x: _degrid_dense(x, ang_np, n, KW, _beta(), wrap=False)
            )(g)

    want = _on_cpu(want_fn)
    # interior: the raw kernel clips while dense wraps only at the edges
    ro = np.arange(n)
    m = (np.abs(ro - n // 2) <= n // 2 - 4) & (ro != 0)
    err = _nrmse(got[..., m], want[..., m])
    assert err < 1e-4, f"bf16x3 degrid: {err:.2e}"


def test_recon_frames_planes_path_on_tpu(rng):
    """recon_frames' hoisted planes fast path must match the per-frame
    complex-path chain (reconstruct_frame) on hardware — exercised at a
    geometry that activates the planes path (nro = 512)."""
    import jax
    import jax.numpy as jnp

    from tron_tpu.config import ReconConfig
    from tron_tpu.recon import recon_frames, reconstruct_frame
    from tron_tpu.utils.xfer import to_device, to_host

    nc, nro, slide = 4, 512, 21
    cfg = ReconConfig(
        golden_angle=True, data_undersamp=0.4, prof_slide=slide, adjoint=True
    )
    work = cfg.npe1work(nro, 10**9)
    nz = 3
    npe1 = work + (nz - 1) * slide
    data = (
        rng.standard_normal((nc, npe1, nro))
        + 1j * rng.standard_normal((nc, npe1, nro))
    ).astype(np.complex64)
    d = to_device(data)

    got = to_host(recon_frames(d, cfg, work, slide, nz))  # planes path
    for z in range(nz):
        win = jax.lax.dynamic_slice_in_dim(d, z * slide, work, axis=-2)
        want = to_host(
            jax.jit(lambda w, s: reconstruct_frame(w, s, cfg))(
                win, jnp.asarray(z * slide, jnp.int32)
            )
        )
        err = _nrmse(got[z], want)
        # identical kernel and rounding; only op order differs
        assert err < 1e-5, f"frame {z}: planes vs complex path nrmse={err:.2e}"


def test_adjoint_vs_exact_dtft_whole_body_geometry(rng):
    """The independent accuracy anchor at REFERENCE frame geometry: one
    whole-body frame (n=256, nro=512, npe=204 golden-angle spokes,
    src/RUNME4_others_grid_slcmt.m:74-79) of phantom multicoil data,
    Pallas recon scored against the exact chunked DTFT adjoint — the role
    IRT plays in the reference's RUNME4 SSIM table (:283-312), previously
    only exercised at n<=64 here."""
    import jax
    import jax.numpy as jnp

    from tron_tpu.config import ReconConfig
    from tron_tpu.nufft import nufft_adjoint, nufft_forward
    from tron_tpu.oracle import oracle_adjoint_recon
    from tron_tpu.phantom import birdcage_sensitivities, shepp_logan
    from tron_tpu.trajectory import spoke_angles
    from tron_tpu.utils.xfer import to_device, to_host

    n, nc, npe = 256, 2, 204
    nro = 2 * n
    img = (shepp_logan(n)[None] * birdcage_sensitivities(n, nc)).astype(np.complex64)
    angles = jnp.asarray(spoke_angles(npe, "golden", 0))
    cfg_j = ReconConfig(backend="jnp", golden_angle=True)
    imgd = to_device(img)
    data = jax.jit(lambda x: nufft_forward(x, angles, cfg_j, nro=nro))(imgd)

    cfg_a = ReconConfig(backend="pallas", golden_angle=True, matmul_dtype="bf16x3")
    got = to_host(jax.jit(lambda x: nufft_adjoint(x, angles, cfg_a))(data))

    want = to_host(
        jax.jit(oracle_adjoint_recon, static_argnums=(2, 3, 4))(
            data, angles, cfg_j, n, nro
        )
    )
    err = _nrmse(got, want)
    # bound = the KB kernel's (kw=2, osf=2) approximation error vs the exact
    # transform on phantom data; bf16x3 rounding (~1e-6) is far below it
    assert err < 5e-3, f"whole-body-geometry oracle nrmse: {err:.2e}"


def test_grid_pallas_batched_kernel_on_tpu(rng):
    """The batched-eval kernel (KernelTuning.batched) must compile under
    Mosaic and match the loop kernel on hardware.  Kept to a small geometry
    with pe_chunk=4: the static unroll multiplies program size by the
    chunk, and a pe16 whole-body compile costs minutes on the AOT
    toolchain (NOTES.md round 3)."""
    import jax.numpy as jnp

    from tron_tpu.config import AngleScheme, KernelTuning
    from tron_tpu.ops.grid_pallas import grid_radial2d_pallas
    from tron_tpu.trajectory import spoke_angles
    from tron_tpu.utils.xfer import to_device, to_host

    nxos, C, npe = 256, 2, 12
    data = (
        rng.standard_normal((C, npe, nxos)) + 1j * rng.standard_normal((C, npe, nxos))
    ).astype(np.complex64)
    angles = jnp.asarray(spoke_angles(npe, AngleScheme.GOLDEN, 0))
    d = to_device(data)
    kw = dict(pe_chunk=4, matmul_dtype="float32")
    loop = to_host(
        grid_radial2d_pallas(d, angles, nxos, KW, _beta(), tuning=KernelTuning(), **kw)
    )
    batched = to_host(
        grid_radial2d_pallas(
            d, angles, nxos, KW, _beta(), tuning=KernelTuning(batched=True), **kw
        )
    )
    # fp32 mode: identical math, identical FMA formation (bitwise on CPU
    # interpret; allow accumulation-order noise margin on hardware)
    err = _nrmse(batched, loop)
    assert err < 1e-6, f"batched vs loop kernel on TPU: {err:.2e}"


@pytest.mark.parametrize("gridos", [1.5, 2.5])
def test_nondefault_gridos_kernels_on_tpu(rng, gridos):
    """The round-4 any-osf generalizations, compiled through Mosaic on real
    hardware (the CPU tests run them in interpret mode only): windowed
    gridder with a non-identity radius map, affine-lattice degrid, and the
    exact-lattice gridder — each vs its dense XLA golden on the CPU
    backend."""
    import jax
    import jax.numpy as jnp

    from tron_tpu.config import AngleScheme
    from tron_tpu.kernels.kb import kb_beta
    from tron_tpu.ops.degrid import _degrid_dense
    from tron_tpu.ops.degrid_pallas import degrid_radial2d_pallas
    from tron_tpu.ops.grid import grid_radial2d
    from tron_tpu.ops.grid_pallas import (
        grid_radial2d_pallas,
        grid_radial2d_pallas_exact,
    )
    from tron_tpu.trajectory import spoke_angles
    from tron_tpu.utils.xfer import to_device, to_host

    nro, C, npe = 512, 2, 33
    nxos = int((nro // 2) * gridos)  # 384 / 640 — tileable at 128
    beta = kb_beta(KW, gridos)
    angles = jnp.asarray(spoke_angles(npe, AngleScheme.GOLDEN, 3))
    ang_np = np.asarray(angles)

    # 1) windowed gridder, trunc-resampled radius map (src/tron.cu:517)
    data = (
        rng.standard_normal((C, npe, nro)) + 1j * rng.standard_normal((C, npe, nro))
    ).astype(np.complex64)
    d = to_device(data)
    got = to_host(grid_radial2d_pallas(d, angles, nxos, KW, beta))
    want = _on_cpu(
        lambda: jax.jit(grid_radial2d, static_argnums=(2, 3, 4))(
            data, ang_np, nxos, KW, beta
        )
    )
    err = _nrmse(got, want)
    assert err < 1e-2, f"grid osf={gridos}: {err:.2e}"

    # 2) exact-lattice gridder (CGNR pair adjoint at any osf); readout 0
    #    is outside the kernel's band clamp by convention — zero it so the
    #    raw-rows dense golden agrees
    data0 = np.copy(data)
    data0[..., 0] = 0
    got = to_host(grid_radial2d_pallas_exact(to_device(data0), angles, nxos, KW, beta))
    want = _on_cpu(
        lambda: jax.jit(
            grid_radial2d, static_argnums=(2, 3, 4), static_argnames=("raw_rows",)
        )(data0, ang_np, nxos, KW, beta, raw_rows=True)
    )
    err = _nrmse(got, want)
    assert err < 1e-2, f"exact-lattice grid osf={gridos}: {err:.2e}"

    # 3) affine-lattice degrid (clip convention, interior columns)
    g = (
        rng.standard_normal((C, nxos, nxos)) + 1j * rng.standard_normal((C, nxos, nxos))
    ).astype(np.complex64)
    got = to_host(degrid_radial2d_pallas(to_device(g), angles, nro, KW, beta))
    want = _on_cpu(
        lambda: jax.jit(lambda x: _degrid_dense(x, ang_np, nro, KW, beta, wrap=False))(g)
    )
    ekw = int(np.ceil(KW * nro / nxos)) + 2
    ro = np.arange(nro)
    m = (ro >= ekw) & (ro < nro - ekw) & (ro != 0)
    err = _nrmse(got[..., m], want[..., m])
    assert err < 1e-2, f"degrid osf={gridos}: {err:.2e}"
