"""In-kernel CPML (+ TF/SF) fused kernel vs the composed XLA engine.

The equivalence gate for solver/pallas_cpml.py: the kernel applies the
identical psi recurrence and stretched derivatives inside the descending
sweep, so interpret-mode runs must match engine.build_step at f32 rounding.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import fdtd_tpu as ft
from fdtd_tpu.solver.cpml import Cpml
from fdtd_tpu.solver.engine import build_step, init_engine_state
from fdtd_tpu.solver.pallas_cpml import (
    init_pml_kernel_state,
    pallas_cpml_step_fn,
    supports_cpml,
)
from fdtd_tpu.solver.pallas_cpml_k import pallas_cpml_stepk_fn
from fdtd_tpu.solver.tfsf import Tfsf

INV_DX = (1.0, 1.0, 1.0)
DT = 0.25


def _sources(dtype=jnp.float32):
    return ft.SourceSet.build(
        [
            ft.PointSource((8, 10, 60), ft.GaussianPulse(6 * DT, 2 * DT),
                           j=(0.3, 0, 1.0)),
            ft.PointSource((3, 4, 100), ft.GaussianDerivative(5 * DT, 2 * DT),
                           j=(0, 1.0, 0)),
        ],
        dtype=dtype,
    )


def _compare(shape, cpml, tfsf, sources, steps=24, rtol=2e-5):
    coeffs = ft.CellCoefficients.uniform((1.0, 0.25, 1.0, 0.25), jnp.float32)

    ref_step = jax.jit(build_step(
        shape, inv_dx=INV_DX, dt=DT, constants=ft.REDUCED,
        dtype=jnp.float32, cpml=cpml, tfsf=tfsf,
    ))
    ref = init_engine_state(shape, jnp.float32, cpml=cpml, tfsf=tfsf)

    k_step = pallas_cpml_step_fn(
        shape, inv_dx=INV_DX, dt=DT, constants=ft.REDUCED,
        cpml=cpml, tfsf=tfsf, interpret=True,
    )
    st = init_pml_kernel_state(shape, jnp.float32, cpml=cpml, tfsf=tfsf)

    for _ in range(steps):
        ref = ref_step(ref, coeffs, sources)
        st = k_step(st, coeffs, sources)

    scale = max(float(jnp.max(jnp.abs(ref.ez))), 1e-12)
    for c in range(3):
        np.testing.assert_allclose(
            np.asarray(st.e[c]), np.asarray(ref.e[c]),
            rtol=rtol, atol=rtol * scale,
        )
        np.testing.assert_allclose(
            np.asarray(st.h[c]), np.asarray(ref.h[c]),
            rtol=rtol, atol=rtol * scale,
        )
    assert scale > 1e-6, "fields are vacuously zero"
    return st


def test_kernel_cpml_x_only():
    """x slabs exercise the trash-plane block mapping."""
    cpml = Cpml(thickness=((4, 5), (0, 0), (0, 0)))
    _compare((16, 16, 128), cpml, None, _sources())


def test_kernel_cpml_xy():
    """y strips exercise the padded sublane slices (incl. half-staggered
    hi slab = thickness+1)."""
    cpml = Cpml(thickness=((4, 4), (4, 3), (0, 0)))
    _compare((16, 24, 128), cpml, None, _sources())


def test_kernel_cpml_all_axes():
    """All-axis absorber: z strips need nz >= 2*128 lanes."""
    cpml = Cpml.uniform(4)
    _compare((16, 24, 256), cpml, None, _sources(), steps=12)


def test_kernel_cpml_tfsf():
    """CPML + slab TF/SF: the four plane-uniform in-kernel corrections and
    the XLA-side aux tick must reproduce the engine's order exactly."""
    cpml = Cpml(thickness=((4, 4), (0, 0), (0, 0)))
    tfsf = Tfsf(span=(7, 11), waveform=ft.GaussianPulse(8 * DT, 3 * DT))
    st = _compare((16, 16, 128), cpml, tfsf, _sources(), steps=20)
    assert float(jnp.max(jnp.abs(st.ez))) > 1e-4


def test_kernel_cpml_rejects_unsupported():
    cpml = Cpml.uniform(4)
    assert not supports_cpml((16, 16, 128), ft.BoundaryConditions(), cpml)
    with pytest.raises(ValueError):
        pallas_cpml_step_fn(
            (16, 16, 128), inv_dx=INV_DX, dt=DT, constants=ft.REDUCED,
            cpml=cpml, interpret=True,
        )


def test_kernel_cpml_inkernel_sources():
    """max_sources > 0 injects J inside the kernel (masked row adds) —
    must match the post-kernel-scatter build exactly."""
    cpml = Cpml(thickness=((4, 4), (3, 3), (0, 0)))
    shape = (16, 24, 128)
    coeffs = ft.CellCoefficients.uniform((1.0, 0.25, 1.0, 0.25), jnp.float32)
    srcs = _sources()
    ref_step = pallas_cpml_step_fn(
        shape, inv_dx=INV_DX, dt=DT, constants=ft.REDUCED,
        cpml=cpml, interpret=True,
    )
    k_step = pallas_cpml_step_fn(
        shape, inv_dx=INV_DX, dt=DT, constants=ft.REDUCED,
        cpml=cpml, interpret=True, max_sources=srcs.num_sources,
    )
    ref = init_pml_kernel_state(shape, jnp.float32, cpml=cpml)
    st = init_pml_kernel_state(shape, jnp.float32, cpml=cpml)
    for _ in range(20):
        ref = ref_step(ref, coeffs, srcs)
        st = k_step(st, coeffs, srcs)
    assert float(jnp.max(jnp.abs(ref.ez))) > 1e-6
    for c in range(3):
        np.testing.assert_allclose(
            np.asarray(st.e[c]), np.asarray(ref.e[c]), rtol=1e-6, atol=1e-8
        )


def test_kernel_cpml_matid():
    """Compressed-material mode: uint8 matid plane + (K,4) table one-hot
    selects inside the CPML kernel; must match the engine running on the
    dense gathered coefficients."""
    shape = (16, 32, 128)
    cpml = Cpml(thickness=((4, 4), (4, 4), (0, 0)))
    tab = ft.MaterialTable()
    diel = tab.register(ft.Material(relative_permittivity=3.0))
    matid = np.zeros(shape, np.uint8)
    matid[6:10, 12:20, 40:80] = diel
    res = ft.Resolution(spatial=(1.0, 1.0, 1.0), temporal=DT)
    ctable = ft.coefficient_table(tab.materials, res, ft.REDUCED, dtype=np.float32)
    dense = ft.CellCoefficients.from_table(jnp.asarray(ctable), jnp.asarray(matid))
    srcs = _sources()

    ref_step = jax.jit(build_step(
        shape, inv_dx=INV_DX, dt=DT, constants=ft.REDUCED,
        dtype=jnp.float32, cpml=cpml,
    ))
    ref = init_engine_state(shape, jnp.float32, cpml=cpml)
    k_step = pallas_cpml_step_fn(
        shape, inv_dx=INV_DX, dt=DT, constants=ft.REDUCED, cpml=cpml,
        interpret=True, matid=jnp.asarray(matid), n_materials=len(tab.materials),
    )
    st = init_pml_kernel_state(shape, jnp.float32, cpml=cpml)
    for _ in range(20):
        ref = ref_step(ref, dense, srcs)
        st = k_step(st, jnp.asarray(ctable), srcs)

    scale = float(jnp.max(jnp.abs(ref.ez)))
    assert scale > 1e-6
    for c in range(3):
        np.testing.assert_allclose(
            np.asarray(st.e[c]), np.asarray(ref.e[c]),
            rtol=2e-5, atol=2e-5 * scale,
        )
        np.testing.assert_allclose(
            np.asarray(st.h[c]), np.asarray(ref.h[c]),
            rtol=2e-5, atol=2e-5 * scale,
        )


def test_kernel_cpml_tfsf_box():
    """Closed-box TF/SF inside the kernel (lateral masked adds from the SMEM
    aux rows) vs the engine's box implementation."""
    cpml = Cpml(thickness=((4, 4), (0, 0), (0, 0)))
    tfsf = Tfsf(span=(6, 12), waveform=ft.GaussianPulse(8 * DT, 3 * DT),
                span_y=(4, 11), span_z=(40, 90))
    st = _compare((16, 16, 128), cpml, tfsf, _sources(), steps=20)
    assert float(jnp.max(jnp.abs(st.ez))) > 1e-4


@pytest.mark.parametrize("k,box", [(2, False), (3, False), (4, True)])
def test_kernel_cpml_kstep_matches_single(k, box):
    """K-step temporally-blocked CPML kernel vs K applications of the
    single-pass kernel: psi level carries, per-level TF/SF (slab and box)
    and per-level in-kernel J must reproduce per-tick stepping exactly."""
    from fdtd_tpu.solver.pallas_cpml_k import pallas_cpml_stepk_fn

    shape = (16, 16, 128)
    cpml = Cpml(thickness=((4, 3), (4, 4), (0, 0)))
    if box:
        tfsf = Tfsf(span=(6, 12), waveform=ft.GaussianPulse(8 * DT, 3 * DT),
                    span_y=(4, 11), span_z=(40, 90))
    else:
        tfsf = Tfsf(span=(6, 12), waveform=ft.GaussianPulse(8 * DT, 3 * DT))
    coeffs = ft.CellCoefficients.uniform((1.0, 0.25, 1.0, 0.25), jnp.float32)
    srcs = _sources()

    one = pallas_cpml_step_fn(
        shape, inv_dx=INV_DX, dt=DT, constants=ft.REDUCED, cpml=cpml,
        tfsf=tfsf, interpret=True, max_sources=srcs.num_sources,
    )
    kstep = pallas_cpml_stepk_fn(
        shape, k, inv_dx=INV_DX, dt=DT, constants=ft.REDUCED, cpml=cpml,
        tfsf=tfsf, interpret=True, max_sources=srcs.num_sources,
    )
    ref = init_pml_kernel_state(shape, jnp.float32, cpml=cpml, tfsf=tfsf)
    st = init_pml_kernel_state(shape, jnp.float32, cpml=cpml, tfsf=tfsf)

    n_passes = 4
    for _ in range(n_passes * k):
        ref = one(ref, coeffs, srcs)
    for _ in range(n_passes):
        st = kstep(st, coeffs, srcs)

    assert int(st.tick) == int(ref.tick)
    scale = float(jnp.max(jnp.abs(ref.ez)))
    assert scale > 1e-5
    for c in range(3):
        np.testing.assert_allclose(
            np.asarray(st.e[c]), np.asarray(ref.e[c]),
            rtol=2e-5, atol=2e-5 * scale, err_msg=f"e[{c}]",
        )
        np.testing.assert_allclose(
            np.asarray(st.h[c]), np.asarray(ref.h[c]),
            rtol=2e-5, atol=2e-5 * scale, err_msg=f"h[{c}]",
        )
    for j, (a, b) in enumerate(zip(st.psi, ref.psi)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6,
            err_msg=f"psi[{j}]",
        )


def test_kernel_cpml_kstep_matid():
    """K-step + compressed materials: per-stage matid planes drive the
    one-hot coefficients inside the absorbing wavefront."""
    from fdtd_tpu.solver.pallas_cpml_k import pallas_cpml_stepk_fn

    shape = (16, 32, 128)
    cpml = Cpml(thickness=((4, 4), (4, 4), (0, 0)))
    tab = ft.MaterialTable()
    diel = tab.register(ft.Material(relative_permittivity=3.0))
    matid = np.zeros(shape, np.uint8)
    matid[6:10, 12:20, 40:80] = diel
    res = ft.Resolution(spatial=(1.0, 1.0, 1.0), temporal=DT)
    ctable = jnp.asarray(
        ft.coefficient_table(tab.materials, res, ft.REDUCED, dtype=np.float32)
    )
    srcs = _sources()

    one = pallas_cpml_step_fn(
        shape, inv_dx=INV_DX, dt=DT, constants=ft.REDUCED, cpml=cpml,
        interpret=True, matid=jnp.asarray(matid), n_materials=2,
        max_sources=srcs.num_sources,
    )
    kstep = pallas_cpml_stepk_fn(
        shape, 3, inv_dx=INV_DX, dt=DT, constants=ft.REDUCED, cpml=cpml,
        interpret=True, matid=jnp.asarray(matid), n_materials=2,
        max_sources=srcs.num_sources,
    )
    ref = init_pml_kernel_state(shape, jnp.float32, cpml=cpml)
    st = init_pml_kernel_state(shape, jnp.float32, cpml=cpml)
    for _ in range(12):
        ref = one(ref, ctable, srcs)
    for _ in range(4):
        st = kstep(st, ctable, srcs)
    scale = float(jnp.max(jnp.abs(ref.ez)))
    assert scale > 1e-6
    for c in range(3):
        np.testing.assert_allclose(
            np.asarray(st.e[c]), np.asarray(ref.e[c]),
            rtol=2e-5, atol=2e-5 * scale,
        )


def test_supports_cpml_k_vmem_guard():
    """K selection must reject carry footprints that blow scoped VMEM so
    Simulation's candidate descent always lands on a compilable K."""
    from fdtd_tpu.solver.pallas_cpml_k import supports_cpml_k

    bc = ft.BoundaryConditions()
    cp = Cpml.uniform(10)
    ok_256 = [k for k in (8, 6, 4, 2) if supports_cpml_k((256, 256, 256), bc, cp, k)]
    ok_512 = [k for k in (8, 6, 4, 3, 2) if supports_cpml_k((512, 512, 512), bc, cp, k)]
    assert ok_256 == [8, 6, 4, 2]
    assert ok_512 == [3, 2]  # VMEM-bounded (validated on hardware at K=3)
    # bf16 storage halves the pipeline's field blocks: K=4 fits at 512^3
    # (validated on v5e: K=4 runs at 20.1 Gcell/s, K=5 OOMs)
    ok_512_bf = [k for k in (8, 6, 5, 4, 3, 2)
                 if supports_cpml_k((512, 512, 512), bc, cp, k,
                                    dtype=jnp.bfloat16)]
    assert ok_512_bf == [4, 3, 2]


def _sources_jm(dtype=jnp.float32):
    return ft.SourceSet.build(
        [
            ft.PointSource((8, 10, 60), ft.GaussianPulse(6 * DT, 2 * DT),
                           j=(0.3, 0, 1.0), m=(0.5, -0.2, 0.1)),
            ft.PointSource((3, 4, 100), ft.GaussianDerivative(5 * DT, 2 * DT),
                           m=(0, 1.0, 0)),
        ],
        dtype=dtype,
    )


def test_kernel_cpml_m_sources():
    """M (magnetic-current) sources inject into the H half IN-KERNEL; the
    same tick's E update consumes the corrected H (engine order, ref
    semantics update.wgsl:56-91). Gate vs engine.build_step."""
    cpml = Cpml(thickness=((4, 4), (3, 3), (0, 0)))
    shape = (16, 24, 128)
    coeffs = ft.CellCoefficients.uniform((1.0, 0.25, 1.0, 0.25), jnp.float32)
    srcs = _sources_jm()
    ref_step = jax.jit(build_step(
        shape, inv_dx=INV_DX, dt=DT, constants=ft.REDUCED,
        dtype=jnp.float32, cpml=cpml,
    ))
    ref = init_engine_state(shape, jnp.float32, cpml=cpml)
    k_step = pallas_cpml_step_fn(
        shape, inv_dx=INV_DX, dt=DT, constants=ft.REDUCED, cpml=cpml,
        interpret=True, max_sources=srcs.num_sources, with_m=True,
    )
    st = init_pml_kernel_state(shape, jnp.float32, cpml=cpml)
    for _ in range(20):
        ref = ref_step(ref, coeffs, srcs)
        st = k_step(st, coeffs, srcs)
    scale = float(jnp.max(jnp.abs(ref.hy)))
    assert scale > 1e-6
    for c in range(3):
        np.testing.assert_allclose(
            np.asarray(st.e[c]), np.asarray(ref.e[c]),
            rtol=2e-5, atol=2e-5 * scale, err_msg=f"e[{c}]",
        )
        np.testing.assert_allclose(
            np.asarray(st.h[c]), np.asarray(ref.h[c]),
            rtol=2e-5, atol=2e-5 * scale, err_msg=f"h[{c}]",
        )


def test_kernel_cpml_kstep_m_sources():
    """K-step CPML kernel with per-level M injection vs K applications of
    the single-pass kernel with with_m."""
    from fdtd_tpu.solver.pallas_cpml_k import pallas_cpml_stepk_fn

    shape = (16, 16, 128)
    cpml = Cpml(thickness=((4, 3), (4, 4), (0, 0)))
    coeffs = ft.CellCoefficients.uniform((1.0, 0.25, 1.0, 0.25), jnp.float32)
    srcs = _sources_jm()
    k = 3

    one = pallas_cpml_step_fn(
        shape, inv_dx=INV_DX, dt=DT, constants=ft.REDUCED, cpml=cpml,
        interpret=True, max_sources=srcs.num_sources, with_m=True,
    )
    kstep = pallas_cpml_stepk_fn(
        shape, k, inv_dx=INV_DX, dt=DT, constants=ft.REDUCED, cpml=cpml,
        interpret=True, max_sources=srcs.num_sources, with_m=True,
    )
    ref = init_pml_kernel_state(shape, jnp.float32, cpml=cpml)
    st = init_pml_kernel_state(shape, jnp.float32, cpml=cpml)
    n_passes = 4
    for _ in range(n_passes * k):
        ref = one(ref, coeffs, srcs)
    for _ in range(n_passes):
        st = kstep(st, coeffs, srcs)
    assert int(st.tick) == int(ref.tick)
    scale = float(jnp.max(jnp.abs(ref.ez)))
    assert scale > 1e-5
    for c in range(3):
        np.testing.assert_allclose(
            np.asarray(st.e[c]), np.asarray(ref.e[c]),
            rtol=2e-5, atol=2e-5 * scale, err_msg=f"e[{c}]",
        )
        np.testing.assert_allclose(
            np.asarray(st.h[c]), np.asarray(ref.h[c]),
            rtol=2e-5, atol=2e-5 * scale, err_msg=f"h[{c}]",
        )


def test_kernel_cpml_bf16_storage():
    """bf16 STORAGE mode: fields live in bf16 HBM, psi stays f32, compute
    is f32 (loads upcast, stores round). Gate: close to the f32 kernel at
    bf16-rounding error (~1e-2 rel), psi arrays bitwise f32 dtype."""
    shape = (16, 16, 128)
    cpml = Cpml(thickness=((4, 4), (4, 4), (0, 0)))
    coeffs = ft.CellCoefficients.uniform((1.0, 0.25, 1.0, 0.25), jnp.float32)
    srcs = _sources()

    f32_step = pallas_cpml_step_fn(
        shape, inv_dx=INV_DX, dt=DT, constants=ft.REDUCED, cpml=cpml,
        interpret=True, max_sources=srcs.num_sources,
    )
    bf_step = pallas_cpml_step_fn(
        shape, inv_dx=INV_DX, dt=DT, constants=ft.REDUCED, cpml=cpml,
        interpret=True, max_sources=srcs.num_sources, dtype=jnp.bfloat16,
    )
    ref = init_pml_kernel_state(shape, jnp.float32, cpml=cpml)
    st = init_pml_kernel_state(shape, jnp.bfloat16, cpml=cpml)
    assert st.ex.dtype == jnp.bfloat16
    assert all(p.dtype == jnp.float32 for p in st.psi)

    for _ in range(24):
        ref = f32_step(ref, coeffs, srcs)
        st = bf_step(st, coeffs, srcs)
    assert st.ex.dtype == jnp.bfloat16
    assert all(p.dtype == jnp.float32 for p in st.psi)

    num = den = 0.0
    for c in range(3):
        d = np.asarray(st.e[c], np.float64) - np.asarray(ref.e[c], np.float64)
        num += float(np.sum(d * d))
        den += float(np.sum(np.asarray(ref.e[c], np.float64) ** 2))
    assert den > 0
    rel = (num / den) ** 0.5
    assert rel < 0.05, f"bf16 storage rel-L2 {rel:.3e}"


def test_kernel_cpml_kstep_bf16_storage():
    """K-step kernel in bf16 storage: fields round only at pass boundaries,
    so the error must be <= the per-tick kernel's at matching tick count."""
    from fdtd_tpu.solver.pallas_cpml_k import pallas_cpml_stepk_fn

    shape = (16, 16, 128)
    cpml = Cpml(thickness=((4, 4), (4, 4), (0, 0)))
    coeffs = ft.CellCoefficients.uniform((1.0, 0.25, 1.0, 0.25), jnp.float32)
    srcs = _sources()
    k = 3

    f32_step = pallas_cpml_step_fn(
        shape, inv_dx=INV_DX, dt=DT, constants=ft.REDUCED, cpml=cpml,
        interpret=True, max_sources=srcs.num_sources,
    )
    bf_k = pallas_cpml_stepk_fn(
        shape, k, inv_dx=INV_DX, dt=DT, constants=ft.REDUCED, cpml=cpml,
        interpret=True, max_sources=srcs.num_sources, dtype=jnp.bfloat16,
    )
    ref = init_pml_kernel_state(shape, jnp.float32, cpml=cpml)
    st = init_pml_kernel_state(shape, jnp.bfloat16, cpml=cpml)

    for _ in range(8):
        for _ in range(k):
            ref = f32_step(ref, coeffs, srcs)
        st = bf_k(st, coeffs, srcs)
    assert int(st.tick) == int(ref.tick)
    assert st.ex.dtype == jnp.bfloat16

    num = den = 0.0
    for c in range(3):
        d = np.asarray(st.e[c], np.float64) - np.asarray(ref.e[c], np.float64)
        num += float(np.sum(d * d))
        den += float(np.sum(np.asarray(ref.e[c], np.float64) ** 2))
    assert den > 0
    rel = (num / den) ** 0.5
    assert rel < 0.05, f"K-step bf16 storage rel-L2 {rel:.3e}"


def test_cpml_k_flux_rows_match_engine_per_tick():
    """In-kernel per-tick per-plane Poynting reductions (flux_faces): each
    stage's row block must equal the same reduction computed from the
    engine's per-tick states — all three descriptor kinds, across two
    chained K=4 passes (8 ticks)."""
    import fdtd_tpu as ft
    from fdtd_tpu.solver.engine import build_step, init_engine_state

    shape, k = (32, 32, 256), 4
    cpml = Cpml(thickness=((6, 6), (4, 4), (4, 4)))
    res = ft.Resolution.courant(1.0, ft.REDUCED, safety=0.9)
    dt = res.temporal
    coeffs = ft.CellCoefficients.uniform(
        ft.coefficient_table([ft.VACUUM], res, ft.REDUCED)[0], jnp.float32)
    src = ft.SourceSet.build([ft.PointSource(
        (16, 16, 128), ft.GaussianPulse(4 * dt, 2 * dt), j=(0.3, -0.2, 1.0))])

    faces = (("x",), ("y", 8), ("y", 24), ("z", 64), ("z", 192))
    fstep = pallas_cpml_stepk_fn(
        shape, k, inv_dx=(1.0, 1.0, 1.0), dt=dt, constants=ft.REDUCED,
        cpml=cpml, max_sources=1, interpret=True, flux_faces=faces)
    st = init_pml_kernel_state(shape, cpml=cpml)
    rows_all = []
    for _ in range(2):
        st, rows = fstep(st, coeffs, src)
        rows_all.append(np.asarray(rows))
    rows_all = np.concatenate(rows_all)  # (8, nx, 5)
    assert rows_all.shape == (8, shape[0], 5)

    eng = build_step(shape, inv_dx=(1.0, 1.0, 1.0), dt=dt,
                     constants=ft.REDUCED, cpml=cpml)
    est = init_engine_state(shape, cpml=cpml)
    for t in range(8):
        est = eng(est, coeffs, src)
        e = [np.asarray(c, np.float32) for c in est.e]
        h = [np.asarray(c, np.float32) for c in est.h]
        refs = [
            (e[1] * h[2] - e[2] * h[1]).sum(axis=(1, 2)),
            (e[2][:, 8] * h[0][:, 8] - e[0][:, 8] * h[2][:, 8]).sum(-1),
            (e[2][:, 24] * h[0][:, 24] - e[0][:, 24] * h[2][:, 24]).sum(-1),
            (e[0][:, :, 64] * h[1][:, :, 64]
             - e[1][:, :, 64] * h[0][:, :, 64]).sum(-1),
            (e[0][:, :, 192] * h[1][:, :, 192]
             - e[1][:, :, 192] * h[0][:, :, 192]).sum(-1),
        ]
        for j, ref in enumerate(refs):
            scale = np.abs(ref).max() or 1.0
            np.testing.assert_allclose(
                rows_all[t, :, j] / scale, ref / scale, atol=2e-5,
                err_msg=f"tick {t} descriptor {j}",
            )


def test_cpml_k_flux_with_box_tfsf_and_matid():
    """The full BASELINE-config-3 composition at kernel tier: closed-box
    TF/SF + compressed materials + in-kernel flux reductions on the CPML
    K kernel, vs the engine (dense coefficients) accumulating the same
    reductions per tick."""
    import fdtd_tpu as ft
    from fdtd_tpu.solver.engine import build_step, init_engine_state

    shape, k = (32, 32, 256), 4
    cpml = Cpml(thickness=((5, 5), (4, 4), (4, 4)))
    res = ft.Resolution.courant(1.0, ft.REDUCED, safety=0.9)
    dt = res.temporal
    tfsf = Tfsf(span=(8, 23), span_y=(8, 23), span_z=(64, 191),
                waveform=ft.GaussianPulse(6 * dt, 2 * dt))
    tab = ft.MaterialTable()
    tab.register(ft.Material(relative_permittivity=2.5))
    table = jnp.asarray(
        ft.coefficient_table(tab.materials, res, ft.REDUCED), jnp.float32)
    matid = np.zeros(shape, np.uint8)
    matid[12:20, 12:20, 112:144] = 1
    dense_coeffs = ft.CellCoefficients.from_table(table, jnp.asarray(matid))
    faces = (("x",), ("y", 6), ("y", 25), ("z", 48), ("z", 200))

    fstep = pallas_cpml_stepk_fn(
        shape, k, inv_dx=(1.0, 1.0, 1.0), dt=dt, constants=ft.REDUCED,
        cpml=cpml, tfsf=tfsf, matid=jnp.asarray(matid), n_materials=2,
        interpret=True, flux_faces=faces,
    )
    st = init_pml_kernel_state(shape, cpml=cpml, tfsf=tfsf)
    rows_all = []
    for _ in range(2):
        st, rows = fstep(st, table, None)
        rows_all.append(np.asarray(rows))
    rows_all = np.concatenate(rows_all)

    eng = build_step(shape, inv_dx=(1.0, 1.0, 1.0), dt=dt,
                     constants=ft.REDUCED, cpml=cpml, tfsf=tfsf)
    est = init_engine_state(shape, cpml=cpml, tfsf=tfsf)
    for t in range(2 * k):
        est = eng(est, dense_coeffs, None)
        e = [np.asarray(c, np.float32) for c in est.e]
        h = [np.asarray(c, np.float32) for c in est.h]
        refs = [(e[1] * h[2] - e[2] * h[1]).sum(axis=(1, 2))]
        for y0 in (6, 25):
            refs.append((e[2][:, y0] * h[0][:, y0]
                         - e[0][:, y0] * h[2][:, y0]).sum(-1))
        for z0 in (48, 200):
            refs.append((e[0][:, :, z0] * h[1][:, :, z0]
                         - e[1][:, :, z0] * h[0][:, :, z0]).sum(-1))
        for j, ref in enumerate(refs):
            scale = np.abs(ref).max() or 1.0
            np.testing.assert_allclose(
                rows_all[t, :, j] / scale, ref / scale, atol=5e-5,
                err_msg=f"tick {t} descriptor {j}",
            )
    assert np.abs(rows_all).max() > 0  # the plane wave actually radiated


def test_cpml_k_inkernel_dft_matches_per_tick():
    """In-kernel DFT accumulation (dft_spec): the (6F, 2, ny, nz) plane
    accumulators must equal DftProbe.update applied per tick to the
    engine's states — two probe planes, two frequencies, chained K=4
    passes."""
    import fdtd_tpu as ft
    from fdtd_tpu.probes import DftProbe, FieldComponent
    from fdtd_tpu.solver.engine import build_step, init_engine_state

    shape, k = (32, 32, 256), 4
    cpml = Cpml(thickness=((5, 5), (4, 4), (4, 4)))
    res = ft.Resolution.courant(1.0, ft.REDUCED, safety=0.9)
    dt = res.temporal
    coeffs = ft.CellCoefficients.uniform(
        ft.coefficient_table([ft.VACUUM], res, ft.REDUCED)[0], jnp.float32)
    src = ft.SourceSet.build([ft.PointSource(
        (16, 16, 128), ft.GaussianPulse(4 * dt, 2 * dt), j=(0.3, -0.2, 1.0))])
    # mixed spec forms: bare int = E plane, (x0, 0) = E, (x0, 1) = H
    planes = (10, (24, 0), (24, 1))
    freqs = (0.02, 0.05)

    fstep = pallas_cpml_stepk_fn(
        shape, k, inv_dx=(1.0, 1.0, 1.0), dt=dt, constants=ft.REDUCED,
        cpml=cpml, max_sources=1, interpret=True, dft=(planes, freqs))
    st = init_pml_kernel_state(shape, cpml=cpml, dft=(planes, freqs))
    for _ in range(2):
        st = fstep(st, coeffs, src)

    eng = build_step(shape, inv_dx=(1.0, 1.0, 1.0), dt=dt,
                     constants=ft.REDUCED, cpml=cpml)
    est = init_engine_state(shape, cpml=cpml)
    probes = [
        DftProbe(frequencies=freqs, axis=0, index=10,
                 component=FieldComponent.E),
        DftProbe(frequencies=freqs, axis=0, index=24,
                 component=FieldComponent.E),
        DftProbe(frequencies=freqs, axis=0, index=24,
                 component=FieldComponent.H),
    ]
    accs = [p.init(est, dt) for p in probes]
    for _ in range(2 * k):
        est = eng(est, coeffs, src)
        accs = [p.update(a, est, dt) for p, a in zip(probes, accs)]

    # fields also still match (the DFT path must not perturb the step)
    for name in ("ex", "ey", "ez"):
        np.testing.assert_allclose(
            np.asarray(getattr(st, name)), np.asarray(getattr(est, name)),
            rtol=0, atol=2e-6, err_msg=name)

    n_f = len(freqs)
    for pi, (p, (re, im)) in enumerate(zip(probes, accs)):
        vol = np.asarray(st.psi[-(len(planes) - pi)])
        assert vol.shape == (6 * n_f, 2, shape[1], shape[2])
        np.testing.assert_allclose(vol[:, 0], 0.0, atol=0)  # trash plane
        for f_i in range(n_f):
            for c in range(3):
                got_re = vol[(f_i * 2 + 0) * 3 + c, 1]
                got_im = vol[(f_i * 2 + 1) * 3 + c, 1]
                scale = max(np.abs(np.asarray(re)).max(), 1e-12)
                np.testing.assert_allclose(
                    got_re / scale, np.asarray(re)[f_i, c] / scale,
                    atol=3e-6, err_msg=f"re f{f_i} c{c} plane{pi}")
                np.testing.assert_allclose(
                    got_im / scale, np.asarray(im)[f_i, c] / scale,
                    atol=3e-6, err_msg=f"im f{f_i} c{c} plane{pi}")


def test_cpml_k_dft_row_captures_match_engine_ticks():
    """dft_rows: the per-stage raw E/H row captures returned by the K-step
    kernel must equal the corresponding lattice line of the engine's state
    after every tick — "y" and "z" descriptors, chained passes."""
    shape, k = (32, 32, 256), 4
    cpml = Cpml(thickness=((5, 5), (4, 4), (4, 4)))
    res = ft.Resolution.courant(1.0, ft.REDUCED, safety=0.9)
    dt = res.temporal
    coeffs = ft.CellCoefficients.uniform(
        ft.coefficient_table([ft.VACUUM], res, ft.REDUCED)[0], jnp.float32)
    src = ft.SourceSet.build([ft.PointSource(
        (16, 16, 128), ft.GaussianPulse(4 * dt, 2 * dt), j=(0.3, -0.2, 1.0))])
    descs = (("y", 12), ("z", 100), ("y", 20), ("z", 140))

    fstep = pallas_cpml_stepk_fn(
        shape, k, inv_dx=(1.0, 1.0, 1.0), dt=dt, constants=ft.REDUCED,
        cpml=cpml, max_sources=1, interpret=True, dft_rows=descs)
    st = init_pml_kernel_state(shape, cpml=cpml)
    caps_all = []
    for _ in range(2):
        st, caps = fstep(st, coeffs, src)
        caps_all.append([np.asarray(c) for c in caps])

    eng = build_step(shape, inv_dx=(1.0, 1.0, 1.0), dt=dt,
                     constants=ft.REDUCED, cpml=cpml)
    est = init_engine_state(shape, cpml=cpml)
    for p in range(2):
        for lvl in range(k):
            est = eng(est, coeffs, src)
            fields = (est.ex, est.ey, est.ez, est.hx, est.hy, est.hz)
            for di, (ax, v) in enumerate(descs):
                got = caps_all[p][di][lvl]  # (nx, 6, lat)
                for c6, f in enumerate(fields):
                    ref = (np.asarray(f)[:, v, :] if ax == "y"
                           else np.asarray(f)[:, :, v])
                    scale = np.abs(ref).max() or 1.0
                    np.testing.assert_allclose(
                        got[:, c6] / scale, ref / scale, atol=5e-6,
                        err_msg=f"pass {p} lvl {lvl} desc {di} comp {c6}")
    # fields advanced identically (captures must not perturb the step)
    for name in ("ex", "ey", "ez"):
        np.testing.assert_allclose(
            np.asarray(getattr(st, name)), np.asarray(getattr(est, name)),
            rtol=0, atol=2e-6, err_msg=name)
    assert max(np.abs(c).max() for cs in caps_all for c in cs) > 0


def test_cpml_k_lateral_dft_fold_matches_per_tick():
    """DftProbe(axis=1/2) at kernel tier: folding the K-step kernel's raw
    row captures via update_from_dft_rows must equal per-tick
    DftProbe.update on the engine's states — E and H components, chained
    passes (the exact composition Simulation.run dispatches)."""
    from fdtd_tpu.probes import DftProbe, FieldComponent

    shape, k = (32, 32, 256), 4
    cpml = Cpml(thickness=((5, 5), (4, 4), (4, 4)))
    res = ft.Resolution.courant(1.0, ft.REDUCED, safety=0.9)
    dt = res.temporal
    coeffs = ft.CellCoefficients.uniform(
        ft.coefficient_table([ft.VACUUM], res, ft.REDUCED)[0], jnp.float32)
    src = ft.SourceSet.build([ft.PointSource(
        (16, 16, 128), ft.GaussianPulse(4 * dt, 2 * dt), j=(0.3, -0.2, 1.0))])
    freqs = (0.02, 0.05)
    probes = [
        DftProbe(frequencies=freqs, axis=1, index=13,
                 component=FieldComponent.E),
        DftProbe(frequencies=freqs, axis=2, index=120,
                 component=FieldComponent.H),
    ]
    descs = sum((p.kernel_dft_rows() for p in probes), ())
    assert descs == (("y", 13), ("z", 120))

    fstep = pallas_cpml_stepk_fn(
        shape, k, inv_dx=(1.0, 1.0, 1.0), dt=dt, constants=ft.REDUCED,
        cpml=cpml, max_sources=1, interpret=True, dft_rows=descs)
    st = init_pml_kernel_state(shape, cpml=cpml)
    accs = [p.init_rows_acc(st, dt) for p in probes]
    for _ in range(6):
        tick0 = st.tick
        st, caps = fstep(st, coeffs, src)
        accs = [
            p.update_from_dft_rows(a, caps[i: i + 1], tick0, dt)
            for i, (p, a) in enumerate(zip(probes, accs))
        ]

    eng = build_step(shape, inv_dx=(1.0, 1.0, 1.0), dt=dt,
                     constants=ft.REDUCED, cpml=cpml)
    est = init_engine_state(shape, cpml=cpml)
    ref_accs = [p.init(est, dt) for p in probes]
    for _ in range(6 * k):
        est = eng(est, coeffs, src)
        ref_accs = [p.update(a, est, dt) for p, a in zip(probes, ref_accs)]

    for pi, ((re, im), (rre, rim)) in enumerate(zip(accs, ref_accs)):
        assert re.shape == rre.shape
        scale = max(float(np.abs(np.asarray(rre)).max()), 1e-12)
        np.testing.assert_allclose(
            np.asarray(re) / scale, np.asarray(rre) / scale, atol=5e-6,
            err_msg=f"re probe {pi}")
        np.testing.assert_allclose(
            np.asarray(im) / scale, np.asarray(rim) / scale, atol=5e-6,
            err_msg=f"im probe {pi}")
        assert float(np.abs(np.asarray(rre)).max()) > 0


def test_cpml_k_runtime_dft_matches_static():
    """Runtime-coordinate in-kernel DFT (dft_runtime): SMEM plane
    coordinates + resident constant-map accumulators must reproduce the
    static plane-clamped dft path bit-for-bit (same planes/frequencies),
    including an H-component plane and a static+runtime mixed build."""
    import fdtd_tpu as ft

    shape, k = (32, 32, 256), 4
    cpml = Cpml(thickness=((5, 5), (4, 4), (4, 4)))
    res = ft.Resolution.courant(1.0, ft.REDUCED, safety=0.9)
    dt = res.temporal
    coeffs = ft.CellCoefficients.uniform(
        ft.coefficient_table([ft.VACUUM], res, ft.REDUCED)[0], jnp.float32)
    src = ft.SourceSet.build([ft.PointSource(
        (16, 16, 128), ft.GaussianPulse(4 * dt, 2 * dt), j=(0.3, -0.2, 1.0))])
    planes = (10, (24, 0), (24, 1))
    freqs = (0.02, 0.05)

    sstep = pallas_cpml_stepk_fn(
        shape, k, inv_dx=(1.0, 1.0, 1.0), dt=dt, constants=ft.REDUCED,
        cpml=cpml, max_sources=1, interpret=True, dft=(planes, freqs))
    sst = init_pml_kernel_state(shape, cpml=cpml, dft=(planes, freqs))
    rstep = pallas_cpml_stepk_fn(
        shape, k, inv_dx=(1.0, 1.0, 1.0), dt=dt, constants=ft.REDUCED,
        cpml=cpml, max_sources=1, interpret=True,
        dft_runtime=(planes, freqs))
    rst = init_pml_kernel_state(shape, cpml=cpml,
                                dft_runtime=(planes, freqs))
    for _ in range(5):
        sst = sstep(sst, coeffs, src)
        rst = rstep(rst, coeffs, src)

    for name in ("ex", "ey", "ez", "hx", "hy", "hz"):
        np.testing.assert_array_equal(
            np.asarray(getattr(rst, name)), np.asarray(getattr(sst, name)),
            err_msg=name)
    n_f = len(freqs)
    # the two accumulator mechanisms are algebraically identical but live
    # in DIFFERENT pallas builds, so XLA may contract `acc + ph * fld`
    # into an FMA in one and not the other (1-ulp rounding differences);
    # fields stay bit-exact above, spectra compare at 1-ulp tolerance
    for pi in range(len(planes)):
        svol = np.asarray(sst.psi[-(len(planes) - pi)])[:, 1]  # live plane
        rvol = np.asarray(rst.psi[-(len(planes) - pi)])
        assert rvol.shape == (6 * n_f, shape[1], shape[2])
        np.testing.assert_allclose(rvol, svol, rtol=1e-5, atol=1e-9,
                                   err_msg=f"plane {pi}")
        assert np.abs(rvol).max() > 0

    # mixed build: plane 10 static, planes 24 E/H runtime
    mstep = pallas_cpml_stepk_fn(
        shape, k, inv_dx=(1.0, 1.0, 1.0), dt=dt, constants=ft.REDUCED,
        cpml=cpml, max_sources=1, interpret=True,
        dft=((10,), freqs), dft_runtime=(((24, 0), (24, 1)), freqs))
    mst = init_pml_kernel_state(shape, cpml=cpml, dft=((10,), freqs),
                                dft_runtime=(((24, 0), (24, 1)), freqs))
    for _ in range(5):
        mst = mstep(mst, coeffs, src)
    np.testing.assert_allclose(
        np.asarray(mst.psi[-3])[:, 1], np.asarray(sst.psi[-3])[:, 1],
        rtol=1e-5, atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(mst.psi[-2]), np.asarray(rst.psi[-2]),
        rtol=1e-5, atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(mst.psi[-1]), np.asarray(rst.psi[-1]),
        rtol=1e-5, atol=1e-9)

    # a sentinel coordinate never accumulates (the sharded non-owner case)
    nstep = pallas_cpml_stepk_fn(
        shape, k, inv_dx=(1.0, 1.0, 1.0), dt=dt, constants=ft.REDUCED,
        cpml=cpml, max_sources=1, interpret=True,
        dft_runtime=((-(2 ** 30),), freqs))
    nst = init_pml_kernel_state(shape, cpml=cpml,
                                dft_runtime=((-(2 ** 30),), freqs))
    for _ in range(5):
        nst = nstep(nst, coeffs, src)
    np.testing.assert_array_equal(np.asarray(nst.psi[-1]), 0.0)
