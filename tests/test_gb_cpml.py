"""Grid-blocked CPML K-step (solver/pallas_cpml_gb.py) equivalence.

Gate: the grid-blocked kernel (lateral blocks INSIDE the pallas grid,
owned-center writes, no halo refresh) must match the plain CPML K
kernel (solver/pallas_cpml_k.py) on fields AND psi after multiple
chained passes in interpret mode — including a source within h columns
of a block boundary (halo-injection agreement), matid, bf16, M
sources, and slab/box TF/SF straddling the block cut."""

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
    gb_plan,
    make_pallas_cpml_gb_stepk,
)


def _assert_state_equal(ref, got, ulp_rel=1e-6):
    """Equality gate at ULP scale: the gb kernel's in-kernel window
    concats change XLA's fusion/FMA-contraction choices, so identical
    math rounds 1-2 f32 ulps apart (verified: diffs track the SOURCE's
    light cone, not the block cut; max 3e-8 after 4 passes). Any real
    halo/off-by-one bug produces O(field)-scale errors at the cut, so a
    few-ulp absolute gate (scaled to the field magnitude) discriminates
    just as sharply as bit equality."""
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


def _run_pair(shape, n_b, k, cpml, n_passes, src_py, *, with_m=False,
              matid=None, n_materials=1, dtype=jnp.float32, tfsf=None):
    bc = BoundaryConditions()
    plan = gb_plan(shape, bc, cpml, k, dtype=dtype,
                   matid=matid is not None, n_b_candidates=(n_b,))
    assert plan is not None, "gb_plan rejected this configuration"
    _, h = plan

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
                (shape[0] // 2, src_py, shape[2] // 2),
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

    gb_step = make_pallas_cpml_gb_stepk(shape, k, n_b, h, **kw)
    st = extend_gb_pml_state(
        init_pml_kernel_state(shape, dtype, cpml=cpml, tfsf=tfsf),
        n_b, cpml=cpml,
    )
    for _ in range(n_passes):
        st = gb_step(st, coeffs, src)
    got = collapse_gb_pml_state(st, n_b, cpml=cpml)
    return ref, got, h


def test_gb_cpml_all_axes_matches_plain():
    # CPML on all axes; source 1 column from the block-0/1 boundary
    shape, n_b, k = (16, 32, 256), 2, 2
    cpml = Cpml(thickness=((4, 4), (4, 4), (4, 4)))
    ref, got, h = _run_pair(shape, n_b, k, cpml, n_passes=4, src_py=15)
    assert float(jnp.abs(ref.ez).max()) > 0
    _assert_state_equal(ref, got)


def test_gb_cpml_four_blocks_source_in_halo():
    shape, n_b, k = (16, 64, 256), 4, 2
    cpml = Cpml(thickness=((4, 4), (5, 5), (4, 4)))
    ref, got, h = _run_pair(shape, n_b, k, cpml, n_passes=3, src_py=17)
    assert float(jnp.abs(ref.ez).max()) > 0
    _assert_state_equal(ref, got)


def test_gb_cpml_m_sources_bf16():
    shape, n_b, k = (16, 64, 128), 2, 2
    cpml = Cpml(thickness=((4, 4), (4, 4), (0, 0)))
    ref, got, h = _run_pair(shape, n_b, k, cpml, n_passes=3, src_py=31,
                            with_m=True, dtype=jnp.bfloat16)
    assert h == 16  # bf16 field blocks need (16, 128)-aligned halos
    assert float(jnp.abs(ref.ez.astype(jnp.float32)).max()) > 0
    # bf16 storage rounding can amplify a 1-ulp f32 compute difference
    # to one bf16 ulp (~4e-3 relative) at cells sitting on a rounding
    # boundary — still far below any real halo bug's O(field) signature
    _assert_state_equal(ref, got, ulp_rel=4e-3)


def test_gb_cpml_matid():
    shape, n_b, k = (16, 64, 256), 2, 2
    cpml = Cpml(thickness=((4, 4), (4, 4), (4, 4)))
    rng = np.random.default_rng(7)
    matid = rng.integers(0, 2, size=shape).astype(np.uint8)
    ref, got, h = _run_pair(shape, n_b, k, cpml, n_passes=3, src_py=30,
                            matid=matid, n_materials=2)
    assert h == 16  # matid alignment forces (nly + 2h) % 32
    assert float(jnp.abs(ref.ez).max()) > 0
    _assert_state_equal(ref, got)


def test_gb_cpml_tfsf_slab():
    from fdtd_tpu.solver.tfsf import Tfsf

    shape, n_b, k = (24, 32, 256), 2, 2
    cpml = Cpml(thickness=((4, 4), (4, 4), (4, 4)))
    dt = ft.Resolution.courant(1.0, ft.REDUCED, safety=0.9).temporal
    tfsf = Tfsf(span=(8, 16), waveform=ft.GaussianPulse(6 * dt, 2 * dt))
    ref, got, _ = _run_pair(shape, n_b, k, cpml, n_passes=4, src_py=16,
                            tfsf=tfsf)
    assert float(jnp.abs(ref.ez).max()) > 0
    _assert_state_equal(ref, got)


def test_gb_cpml_tfsf_box_straddles_cut():
    from fdtd_tpu.solver.tfsf import Tfsf

    shape, n_b, k = (24, 32, 256), 2, 2
    cpml = Cpml(thickness=((4, 4), (4, 4), (4, 4)))
    dt = ft.Resolution.courant(1.0, ft.REDUCED, safety=0.9).temporal
    # y faces at 10 and 22 straddle the block cut at y=16
    tfsf = Tfsf(span=(8, 16), span_y=(10, 22), span_z=(60, 180),
                waveform=ft.GaussianPulse(6 * dt, 2 * dt))
    ref, got, _ = _run_pair(shape, n_b, k, cpml, n_passes=4, src_py=16,
                            tfsf=tfsf)
    assert float(jnp.abs(ref.ez).max()) > 0
    _assert_state_equal(ref, got)


def test_gb_roundtrip_extend_collapse():
    shape, n_b = (16, 32, 256), 2
    cpml = Cpml(thickness=((4, 4), (4, 4), (4, 4)))
    st = init_pml_kernel_state(shape, jnp.float32, cpml=cpml)
    # fill the y-strip psi with recognizable values
    psi = []
    rng = np.random.default_rng(3)
    for entry, g in zip(
        __import__("fdtd_tpu.solver.pallas_cpml",
                   fromlist=["_psi_layout"])._psi_layout(shape, cpml),
        st.psi,
    ):
        psi.append(jnp.asarray(rng.normal(size=g.shape), jnp.float32))
    st = st._replace(psi=tuple(psi))
    rt = collapse_gb_pml_state(
        extend_gb_pml_state(st, n_b, cpml=cpml), n_b, cpml=cpml
    )
    for a, b in zip(st.psi, rt.psi):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_gb_plan_rejects_deep_y_pml():
    # y strips deeper than nly - k on block 0 -> halo recompute would
    # need strip psi -> plan must refuse
    shape = (16, 32, 256)
    cpml = Cpml(thickness=((4, 4), (15, 4), (4, 4)))
    assert gb_plan(shape, BoundaryConditions(), cpml, 2,
                   n_b_candidates=(2,)) is None


def test_simulation_run_dispatches_gb(monkeypatch):
    """Simulation.run's grid-blocked branch end-to-end (extend ->
    compiled scan with probe sampling -> collapse) against manual plain
    K-stepping. The backend check is monkeypatched to "tpu" and the
    plain ladder forced off so gb wins (its 2x-K engagement rule would
    otherwise keep plain at this tiny shape); the gb factory is wrapped
    to build in interpret mode (the suite runs on CPU — the real-chip
    build is gated by bench.py::_selfcheck)."""
    import jax

    import fdtd_tpu.solver.pallas_cpml_gb as gbmod
    import fdtd_tpu.solver.pallas_cpml_k as plain_k
    from fdtd_tpu.probes import FieldComponent, PointProbe
    from fdtd_tpu.solver.simulation import Simulation

    shape = (16, 32, 256)
    cpml = Cpml(thickness=((4, 4), (4, 4), (4, 4)))
    res = ft.Resolution.courant(1.0, ft.REDUCED, safety=0.9)
    dt = res.temporal
    grid = ft.Grid(shape=shape, resolution=res, constants=ft.REDUCED)
    table = ft.coefficient_table([ft.VACUUM], res, ft.REDUCED)
    coeffs = ft.CellCoefficients.uniform(table[0], jnp.float32)
    src = ft.SourceSet.build(
        [ft.PointSource((8, 15, 128), ft.GaussianPulse(4 * dt, 2 * dt),
                        j=(0.3, -0.2, 1.0))]
    )

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(plain_k, "supports_cpml_k",
                        lambda *a, **kw: False)
    real_make = gbmod.make_pallas_cpml_gb_stepk
    built = {}

    def make_interpret(*a, **kw):
        kw["interpret"] = True
        built["args"] = (a[1], a[2], a[3])  # (k, n_b, h)
        return real_make(*a, **kw)

    monkeypatch.setattr(gbmod, "make_pallas_cpml_gb_stepk",
                        make_interpret)

    sim = Simulation(grid=grid, coeffs=coeffs, sources=src, cpml=cpml)
    state = sim.init()
    probe = PointProbe(((8, 15, 128),), FieldComponent.E)
    state, probe_out, accs = sim.run(state, 8, probes=(probe,),
                                     probe_every=4)
    k, n_b, h = built["args"]
    assert k > 1 and n_b >= 2  # the gb tier actually dispatched
    assert accs == ()
    # collapse restored the PLAIN global psi layout
    from fdtd_tpu.solver.pallas_cpml import _psi_layout

    for entry, t in zip(_psi_layout(shape, cpml), state.psi):
        assert t.shape == entry[4]

    # manual plain reference at the same K
    monkeypatch.undo()
    ref_step = pallas_cpml_stepk_fn(
        shape, k, inv_dx=(1.0, 1.0, 1.0), dt=dt, constants=ft.REDUCED,
        cpml=cpml, max_sources=1, interpret=True,
    )
    ref = init_pml_kernel_state(shape, cpml=cpml)
    for _ in range(8 // k):
        ref = ref_step(ref, coeffs, src)
    _assert_state_equal(ref, state)
    assert probe_out[0].shape[0] == 2
    assert np.isfinite(np.asarray(probe_out[0])).all()


def test_gb_step2_matches_two_passes():
    # the donation-threaded double pass (pass 2 writes into the input
    # state's dead buffers) must be BIT-identical to two single passes
    shape, n_b, k = (16, 32, 256), 2, 2
    cpml = Cpml(thickness=((4, 4), (4, 4), (4, 4)))
    plan = gb_plan(shape, BoundaryConditions(), cpml, k,
                   n_b_candidates=(n_b,))
    assert plan is not None
    _, h = plan
    res = ft.Resolution.courant(1.0, ft.REDUCED, safety=0.9)
    dt = res.temporal
    table = ft.coefficient_table([ft.VACUUM], res, ft.REDUCED)
    coeffs = ft.CellCoefficients.uniform(table[0], jnp.float32)
    src = ft.SourceSet.build(
        [ft.PointSource((8, 15, 128), ft.GaussianPulse(4 * dt, 2 * dt),
                        j=(0.3, -0.2, 1.0))]
    )
    step = make_pallas_cpml_gb_stepk(
        shape, k, n_b, h, max_sources=1, interpret=True,
        inv_dx=(1.0, 1.0, 1.0), dt=dt, constants=ft.REDUCED, cpml=cpml)
    s0 = extend_gb_pml_state(
        init_pml_kernel_state(shape, jnp.float32, cpml=cpml), n_b,
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
            np.asarray(getattr(b, f)), np.asarray(getattr(a, f)),
            err_msg=f)
    for i, (x, y) in enumerate(zip(a.psi, b.psi)):
        np.testing.assert_array_equal(np.asarray(y), np.asarray(x),
                                      err_msg=f"psi[{i}]")


def test_gb_plan_rejects_strip_overlap():
    # plo + phi (8-padded) must fit one block's owned width: thickness
    # 10 pads to 16+16 = 32 > nly = 16 -> the kernel's window strip
    # segments would overlap -> plan must refuse (hardware-found, r4)
    shape = (64, 32, 256)
    cpml = Cpml(thickness=((10, 10), (10, 10), (10, 10)))
    assert gb_plan(shape, BoundaryConditions(), cpml, 2,
                   n_b_candidates=(2,)) is None


def test_gb_stays_off_when_plain_ladder_is_deep(monkeypatch):
    """gb engages only when the plain ladder is VMEM-capped at K <= 3:
    hardware calibration (512^3, round 4) has bf16 plain K=4 at 28.1
    Gcell/s vs gb K=10 ~22 — the un-aliased 2x write traffic eats the
    K lift once plain is deep enough. Pretend the plain ladder supports
    K <= 4 and assert the gb factory is never built."""
    import jax

    import fdtd_tpu.solver.pallas_cpml_gb as gbmod
    import fdtd_tpu.solver.pallas_cpml_k as plain_k
    from fdtd_tpu.solver.simulation import Simulation

    shape = (32, 32, 256)
    cpml = Cpml(thickness=((4, 4), (4, 4), (4, 4)))
    res = ft.Resolution.courant(1.0, ft.REDUCED, safety=0.9)
    dt = res.temporal
    grid = ft.Grid(shape=shape, resolution=res, constants=ft.REDUCED)
    table = ft.coefficient_table([ft.VACUUM], res, ft.REDUCED)
    coeffs = ft.CellCoefficients.uniform(table[0], jnp.float32)
    src = ft.SourceSet.build(
        [ft.PointSource((16, 15, 128), ft.GaussianPulse(4 * dt, 2 * dt),
                        j=(0.0, 0.0, 1.0))]
    )

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    real_supports = plain_k.supports_cpml_k
    monkeypatch.setattr(
        plain_k, "supports_cpml_k",
        lambda shape_, bc_, cpml_, k_, *a, **kw: (
            k_ <= 4 and real_supports(shape_, bc_, cpml_, k_, *a, **kw)
        ),
    )
    real_kfn = plain_k.pallas_cpml_stepk_fn
    monkeypatch.setattr(
        plain_k, "pallas_cpml_stepk_fn",
        lambda *a, **kw: real_kfn(*a, **{**kw, "interpret": True}),
    )

    def gb_must_not_build(*a, **kw):
        raise AssertionError("gb dispatched despite plain K=4")

    monkeypatch.setattr(gbmod, "make_pallas_cpml_gb_stepk",
                        gb_must_not_build)

    sim = Simulation(grid=grid, coeffs=coeffs, sources=src, cpml=cpml)
    state = sim.init()
    state, _, _ = sim.run(state, 8)
    assert np.isfinite(np.asarray(state.ez)).all()
