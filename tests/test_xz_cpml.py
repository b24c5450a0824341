"""x-zoned CPML K-step (solver/pallas_cpml_xz.py) equivalence.

Gate: the chained zone calls (full-cpml slab-end kernels + an x-psi-free
interior kernel, outputs assembled through input_output_aliases) must
match the plain CPML K kernel (solver/pallas_cpml_k.py) on fields AND
psi after multiple chained passes in interpret mode — including sources
at and next to the zone cuts (halo-recompute agreement), single-ended x
slabs, matid, bf16, M sources, and slab/box TF/SF whose planes straddle
the cuts."""

import jax.numpy as jnp
import numpy as np
import pytest

import fdtd_tpu as ft
from fdtd_tpu.solver.boundary import BoundaryConditions
from fdtd_tpu.solver.cpml import Cpml
from fdtd_tpu.solver.pallas_cpml import init_pml_kernel_state
from fdtd_tpu.solver.pallas_cpml_k import pallas_cpml_stepk_fn
from fdtd_tpu.solver.pallas_cpml_gb import (
    collapse_gb_pml_state,
    extend_gb_pml_state,
)
from fdtd_tpu.solver.pallas_cpml_xz import make_pallas_cpml_xz_stepk, xz_plan


def _assert_state_equal(ref, got, ulp_rel=1e-6):
    """Few-ulp absolute gate scaled to the field magnitude (the zone
    calls' window concats change fusion/FMA contraction, rounding 1-2
    f32 ulps apart; a real cut/off-by-one bug produces O(field)-scale
    errors at the cut planes — same discrimination argument as
    tests/test_gb_cpml.py)."""
    scale = max(
        float(jnp.abs(getattr(ref, f).astype(jnp.float32)).max())
        for f in ("ex", "ey", "ez", "hx", "hy", "hz")
    )
    atol = ulp_rel * max(scale, 1e-30)
    for f in ("ex", "ey", "ez", "hx", "hy", "hz"):
        np.testing.assert_allclose(
            np.asarray(getattr(got, f), np.float64),
            np.asarray(getattr(ref, f), np.float64),
            atol=atol, rtol=0, err_msg=f,
        )
    assert len(ref.psi) == len(got.psi)
    for i, (a, b) in enumerate(zip(ref.psi, got.psi)):
        np.testing.assert_allclose(
            np.asarray(b, np.float64), np.asarray(a, np.float64),
            atol=atol, rtol=0, err_msg=f"psi[{i}]",
        )
    assert int(ref.tick) == int(got.tick)


def _run_pair(shape, k, cpml, n_passes, src_pos, *, with_m=False,
              matid=None, n_materials=1, dtype=jnp.float32, tfsf=None):
    bc = BoundaryConditions()
    plan = xz_plan(shape, bc, cpml, k, dtype=dtype,
                   matid=matid is not None)
    assert plan is not None, "xz_plan rejected this configuration"

    res = ft.Resolution.courant(1.0, ft.REDUCED, safety=0.9)
    dt = res.temporal
    if matid is not None:
        tab = ft.MaterialTable()
        tab.register(ft.Material(relative_permittivity=2.5))
        ctable = ft.coefficient_table(tab.materials, res, ft.REDUCED)
        coeffs = jnp.asarray(ctable, jnp.float32)
    else:
        table = ft.coefficient_table([ft.VACUUM], res, ft.REDUCED)
        coeffs = ft.CellCoefficients.uniform(table[0], jnp.float32)
    src = ft.SourceSet.build(
        [
            ft.PointSource(
                src_pos,
                ft.GaussianPulse(4 * dt, 2 * dt),
                j=(0.3, -0.2, 1.0),
                m=(0.1, 0.4, -0.3) if with_m else (0.0, 0.0, 0.0),
            )
        ]
    )

    kw = dict(max_sources=1, interpret=True, with_m=with_m, dtype=dtype,
              inv_dx=(1.0, 1.0, 1.0), dt=dt, constants=ft.REDUCED,
              cpml=cpml, tfsf=tfsf,
              matid=None if matid is None else jnp.asarray(matid),
              n_materials=n_materials)
    ref_step = pallas_cpml_stepk_fn(shape, k, **kw)
    ref = init_pml_kernel_state(shape, dtype, cpml=cpml, tfsf=tfsf)
    for _ in range(n_passes):
        ref = ref_step(ref, coeffs, src)

    xz_step = make_pallas_cpml_xz_stepk(shape, k, plan, **kw)
    st = extend_gb_pml_state(
        init_pml_kernel_state(shape, dtype, cpml=cpml, tfsf=tfsf),
        plan.n_b, cpml=cpml,
    )
    for _ in range(n_passes):
        st = xz_step(st, coeffs, src)
    got = collapse_gb_pml_state(st, plan.n_b, cpml=cpml)
    return ref, got, plan


def test_xz_cpml_all_axes_matches_plain():
    # CPML on all axes; source inside the mid zone
    shape, k = (24, 32, 256), 2
    cpml = Cpml(thickness=((4, 4), (4, 4), (4, 4)))
    ref, got, plan = _run_pair(shape, k, cpml, n_passes=4,
                               src_pos=(12, 15, 128))
    assert 0 < plan.c0 < plan.c1 < shape[0]
    assert float(jnp.abs(ref.ez).max()) > 0
    _assert_state_equal(ref, got)


def test_xz_cpml_source_at_cut():
    # sources exactly ON the lo cut and one plane below the hi cut:
    # both zone calls must inject them identically during halo recompute
    shape, k = (32, 32, 256), 3
    cpml = Cpml(thickness=((5, 5), (4, 4), (4, 4)))
    plan = xz_plan(shape, BoundaryConditions(), cpml, k)
    for px in (plan.c0, plan.c1 - 1, plan.c0 - 1, plan.c1):
        ref, got, _ = _run_pair(shape, k, cpml, n_passes=3,
                                src_pos=(px, 9, 128))
        assert float(jnp.abs(ref.ez).max()) > 0
        _assert_state_equal(ref, got)


def test_xz_cpml_single_ended_lo():
    shape, k = (24, 32, 256), 2
    cpml = Cpml(thickness=((6, 0), (4, 4), (4, 4)))
    ref, got, plan = _run_pair(shape, k, cpml, n_passes=4,
                               src_pos=(14, 16, 100))
    assert plan.c0 > 0 and plan.c1 == shape[0]
    _assert_state_equal(ref, got)


def test_xz_cpml_single_ended_hi():
    shape, k = (24, 32, 256), 2
    cpml = Cpml(thickness=((0, 6), (4, 4), (4, 4)))
    ref, got, plan = _run_pair(shape, k, cpml, n_passes=4,
                               src_pos=(8, 16, 100))
    assert plan.c0 == 0 and plan.c1 < shape[0]
    _assert_state_equal(ref, got)


def test_xz_cpml_matid_and_m_sources():
    # matid gb alignment needs nly % 32 == 0 -> ny = 64 at n_b = 2
    shape, k = (24, 64, 256), 2
    cpml = Cpml(thickness=((4, 4), (4, 4), (4, 4)))
    rng = np.random.default_rng(7)
    matid = (rng.random(shape) < 0.3).astype(np.uint8)
    ref, got, _ = _run_pair(shape, k, cpml, n_passes=3,
                            src_pos=(12, 10, 90), with_m=True,
                            matid=matid, n_materials=2)
    _assert_state_equal(ref, got)


def test_xz_cpml_bf16():
    # bf16 gb alignment needs h % 16 == 0 -> ny = 64 at n_b = 2
    shape, k = (24, 64, 256), 2
    cpml = Cpml(thickness=((4, 4), (4, 4), (4, 4)))
    ref, got, _ = _run_pair(shape, k, cpml, n_passes=4,
                            src_pos=(12, 15, 128), dtype=jnp.bfloat16)
    _assert_state_equal(ref, got, ulp_rel=1e-2)


def test_xz_cpml_tfsf_slab_straddles_cuts():
    # slab TF/SF planes inside the lo and hi zones: the zone calls and
    # their halo recompute must inject the same aux rows (global q)
    from fdtd_tpu.solver.tfsf import Tfsf

    shape, k = (32, 32, 256), 3
    cpml = Cpml(thickness=((5, 5), (4, 4), (4, 4)))
    tfsf = Tfsf(span=(6, 25), waveform=ft.GaussianPulse(6.0, 2.0))
    ref, got, plan = _run_pair(shape, k, cpml, n_passes=3,
                               src_pos=(16, 16, 128), tfsf=tfsf)
    assert tfsf.span[0] < plan.c0 + k and tfsf.span[1] > plan.c1 - k
    assert float(jnp.abs(ref.ez).max()) > 0
    _assert_state_equal(ref, got)


def test_xz_cpml_tfsf_box():
    from fdtd_tpu.solver.tfsf import Tfsf

    shape, k = (32, 32, 256), 2
    cpml = Cpml(thickness=((4, 4), (4, 4), (4, 4)))
    tfsf = Tfsf(span=(6, 25), waveform=ft.GaussianPulse(6.0, 2.0),
                span_y=(8, 23), span_z=(64, 190))
    ref, got, _ = _run_pair(shape, k, cpml, n_passes=3,
                            src_pos=(16, 16, 128), tfsf=tfsf)
    _assert_state_equal(ref, got)


def test_xz_oblique_matches_plain_kernel():
    """Oblique TF/SF riding the xz tier: the pre-placed per-block
    correction stack (full window height, zeros outside the box's rows
    per window) must reproduce the plain oblique kernel to f32
    rounding — box straddling the y block cut, chained double passes."""
    from fdtd_tpu.solver.tfsf_oblique import ObliqueTfsf

    shape, k = (48, 32, 256), 2
    cpml = Cpml(thickness=((4, 4), (4, 4), (4, 4)))
    res = ft.Resolution.courant(1.0, ft.REDUCED, safety=0.9)
    dt = res.temporal
    ob = ObliqueTfsf(
        box=((14, 32), (10, 24), (100, 150)),  # y span straddles 16
        direction=(1.0, 0.7, -0.4),
        polarization=(0.0, 0.2, 1.0),
        waveform=ft.GaussianPulse(10 * dt, 4 * dt),
    )
    bc = BoundaryConditions()
    plan = xz_plan(shape, bc, cpml, k, oblique=ob)
    assert plan is not None
    table = ft.coefficient_table([ft.VACUUM], res, ft.REDUCED)
    coeffs = ft.CellCoefficients.uniform(table[0], jnp.float32)
    src = ft.SourceSet.build(
        [ft.PointSource((24, 16, 128), ft.GaussianPulse(4 * dt, 2 * dt),
                        j=(0.3, -0.2, 1.0))]
    )
    kw = dict(max_sources=1, interpret=True, inv_dx=(1.0, 1.0, 1.0),
              dt=dt, constants=ft.REDUCED, cpml=cpml, oblique=ob)
    ref_step = pallas_cpml_stepk_fn(shape, k, **kw)
    ref = init_pml_kernel_state(shape, jnp.float32, cpml=cpml)
    for _ in range(6):
        ref = ref_step(ref, coeffs, src)
    xz_step = make_pallas_cpml_xz_stepk(shape, k, plan, **kw)
    st = extend_gb_pml_state(
        init_pml_kernel_state(shape, jnp.float32, cpml=cpml), plan.n_b,
        cpml=cpml)
    for _ in range(3):
        st = xz_step.step2(st, coeffs, src)
    got = collapse_gb_pml_state(st, plan.n_b, cpml=cpml)
    assert float(jnp.abs(ref.ez).max()) > 0
    _assert_state_equal(ref, got)


def test_xz_oblique_plan_margins():
    from fdtd_tpu.solver.tfsf_oblique import ObliqueTfsf

    bc = BoundaryConditions()
    cpml = Cpml(thickness=((4, 4), (4, 4), (4, 4)))

    def ob_at(x0, x1):
        return ObliqueTfsf(
            box=((x0, x1), (10, 24), (100, 150)),
            direction=(1.0, 0.7, -0.4),
            polarization=(0.0, 0.2, 1.0),
            waveform=ft.GaussianPulse(10.0, 4.0),
        )

    # subgrid reaching into the lo call's computed planes -> reject
    assert xz_plan((48, 32, 256), bc, cpml, 2,
                   oblique=ob_at(6, 32)) is None
    # subgrid reaching into the hi call's computed planes -> reject
    assert xz_plan((48, 32, 256), bc, cpml, 2,
                   oblique=ob_at(14, 41)) is None
    assert xz_plan((48, 32, 256), bc, cpml, 2,
                   oblique=ob_at(14, 32)) is not None


def test_xz_step2_matches_two_passes():
    # the donation-threaded double pass (pass 2 chains into the input
    # state's buffers) must be BIT-identical to two single passes —
    # fields, psi, tick
    shape, k = (24, 32, 256), 2
    cpml = Cpml(thickness=((4, 4), (4, 4), (4, 4)))
    bc = BoundaryConditions()
    plan = xz_plan(shape, bc, cpml, k)
    res = ft.Resolution.courant(1.0, ft.REDUCED, safety=0.9)
    dt = res.temporal
    table = ft.coefficient_table([ft.VACUUM], res, ft.REDUCED)
    coeffs = ft.CellCoefficients.uniform(table[0], jnp.float32)
    src = ft.SourceSet.build(
        [ft.PointSource((12, 15, 128), ft.GaussianPulse(4 * dt, 2 * dt),
                        j=(0.3, -0.2, 1.0))]
    )
    step = make_pallas_cpml_xz_stepk(
        shape, k, plan, max_sources=1, interpret=True,
        inv_dx=(1.0, 1.0, 1.0), dt=dt, constants=ft.REDUCED, cpml=cpml)
    s0 = extend_gb_pml_state(
        init_pml_kernel_state(shape, jnp.float32, cpml=cpml), plan.n_b,
        cpml=cpml)
    a = s0
    for _ in range(4):
        a = step(a, coeffs, src)
    b = s0
    for _ in range(2):
        b = step.step2(b, coeffs, src)
    assert int(a.tick) == int(b.tick)
    for f in ("ex", "ey", "ez", "hx", "hy", "hz"):
        np.testing.assert_array_equal(
            np.asarray(getattr(b, f)), np.asarray(getattr(a, f)), err_msg=f)
    for i, (x, y) in enumerate(zip(a.psi, b.psi)):
        np.testing.assert_array_equal(np.asarray(y), np.asarray(x),
                                      err_msg=f"psi[{i}]")


def test_simulation_run_dispatches_xz_step2(monkeypatch):
    """Simulation.run's xz branch end-to-end: backend forced to "tpu",
    plain ladder forced off; the xz factory is wrapped to build in
    interpret mode (CPU suite — real-chip builds are gated by
    bench.py::_selfcheck). The cadence divides 2K, so the dispatcher
    must pick the donation-threaded DOUBLE pass (step2)."""
    import jax

    import fdtd_tpu.solver.pallas_cpml_k as plain_k
    import fdtd_tpu.solver.pallas_cpml_xz as xzmod
    from fdtd_tpu.solver.simulation import Simulation

    # ny >= 256: the dispatcher's gb-window halo-overhead guard
    # (2h/nly <= 12.5%) rejects smaller lateral extents
    shape = (48, 256, 256)
    cpml = Cpml(thickness=((4, 4), (4, 4), (4, 4)))
    res = ft.Resolution.courant(1.0, ft.REDUCED, safety=0.9)
    dt = res.temporal
    grid = ft.Grid(shape=shape, resolution=res, constants=ft.REDUCED)
    table = ft.coefficient_table([ft.VACUUM], res, ft.REDUCED)
    coeffs = ft.CellCoefficients.uniform(table[0], jnp.float32)
    src = ft.SourceSet.build(
        [ft.PointSource((24, 128, 128), ft.GaussianPulse(4 * dt, 2 * dt),
                        j=(0.3, -0.2, 1.0))]
    )

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(plain_k, "supports_cpml_k",
                        lambda *a, **kw: False)
    real_make = xzmod.make_pallas_cpml_xz_stepk
    built = {}

    def make_interpret(*a, **kw):
        kw["interpret"] = True
        built["plan"] = a[2]
        built["k"] = a[1]
        return real_make(*a, **kw)

    monkeypatch.setattr(xzmod, "make_pallas_cpml_xz_stepk",
                        make_interpret)
    # the dispatcher imports from solver.simulation's local import site
    import fdtd_tpu.solver.simulation as simmod  # noqa: F401

    sim = Simulation(grid=grid, coeffs=coeffs, sources=src, cpml=cpml)
    state = sim.init()
    state, _, _ = sim.run(state, 16)
    assert built["k"] == 8 and built["plan"].n_b >= 2
    assert int(state.tick) == 16

    # reference: manual plain K-stepping
    monkeypatch.undo()
    ref_step = pallas_cpml_stepk_fn(
        shape, 8, inv_dx=(1.0, 1.0, 1.0), dt=dt, constants=ft.REDUCED,
        cpml=cpml, max_sources=1, interpret=True,
    )
    ref = init_pml_kernel_state(shape, cpml=cpml)
    for _ in range(2):
        ref = ref_step(ref, coeffs, src)
    _assert_state_equal(ref, state)


def test_xz_plan_rejections():
    bc = BoundaryConditions()
    # no x slabs -> nothing to zone
    assert xz_plan((24, 32, 256), bc,
                   Cpml(thickness=((0, 0), (4, 4), (4, 4))), 2) is None
    # mid zone thinner than K
    assert xz_plan((16, 32, 256), bc,
                   Cpml(thickness=((6, 6), (4, 4), (4, 4))), 3) is None
