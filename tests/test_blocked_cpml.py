"""Lateral-blocked CPML K-step (solver/pallas_cpml_blocked.py) equivalence.

Gate: the blocked kernel must match the unblocked CPML K kernel
(solver/pallas_cpml_k.py) on fields AND psi after multiple chained
passes, in interpret mode — including a source within h columns of a
block boundary (exercises halo injection + redundant recompute
agreement), matid, bf16, M sources, and slab/box TF/SF."""

import jax.numpy as jnp
import numpy as np
import pytest

import fdtd_tpu as ft
from fdtd_tpu.solver.boundary import BoundaryConditions
from fdtd_tpu.solver.cpml import Cpml
from fdtd_tpu.solver.pallas_cpml import init_pml_kernel_state
from fdtd_tpu.solver.pallas_cpml_k import pallas_cpml_stepk_fn
from fdtd_tpu.solver.pallas_cpml_blocked import (
    blocked_plan,
    blocked_owned_view,
    collapse_blocked_pml_state,
    extend_blocked_pml_state,
    make_pallas_cpml_blocked_stepk,
)


def _assert_state_equal(ref, got, atol=0.0):
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
    plan = blocked_plan(shape, bc, cpml, k, dtype=dtype,
                        matid=matid is not None, n_b_candidates=(n_b,))
    assert plan is not None, "plan rejected this configuration"
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

    blk_step = make_pallas_cpml_blocked_stepk(shape, k, n_b, h, **kw)
    st = extend_blocked_pml_state(
        init_pml_kernel_state(shape, dtype, cpml=cpml, tfsf=tfsf),
        n_b, h, cpml=cpml,
    )
    for _ in range(n_passes):
        st = blk_step(st, coeffs, src)
    got = collapse_blocked_pml_state(st, shape, n_b, h, cpml=cpml)
    return ref, got, h


def test_blocked_cpml_all_axes_matches_unblocked():
    # CPML on all axes; source 1 column from the block-0/1 boundary
    shape, n_b, k = (16, 32, 256), 2, 2
    cpml = Cpml(thickness=((4, 4), (4, 4), (4, 4)))
    ref, got, h = _run_pair(shape, n_b, k, cpml, n_passes=4, src_py=15)
    assert float(jnp.abs(ref.ez).max()) > 0
    _assert_state_equal(ref, got)


def test_blocked_cpml_four_blocks_source_in_halo():
    shape, n_b, k = (16, 64, 256), 4, 3
    cpml = Cpml(thickness=((4, 4), (5, 5), (4, 4)))
    ref, got, h = _run_pair(shape, n_b, k, cpml, n_passes=3, src_py=17)
    assert float(jnp.abs(ref.ez).max()) > 0
    _assert_state_equal(ref, got)


def test_blocked_cpml_m_sources_bf16():
    shape, n_b, k = (16, 32, 128), 2, 2
    cpml = Cpml(thickness=((4, 4), (4, 4), (0, 0)))
    ref, got, _ = _run_pair(shape, n_b, k, cpml, n_passes=3, src_py=15,
                            with_m=True, dtype=jnp.bfloat16)
    assert float(jnp.abs(ref.ez.astype(jnp.float32)).max()) > 0
    _assert_state_equal(ref, got)


def test_blocked_cpml_matid():
    shape, n_b, k = (16, 64, 256), 2, 2
    cpml = Cpml(thickness=((4, 4), (4, 4), (4, 4)))
    rng = np.random.default_rng(7)
    matid = rng.integers(0, 2, size=shape).astype(np.uint8)
    ref, got, h = _run_pair(shape, n_b, k, cpml, n_passes=3, src_py=30,
                            matid=matid, n_materials=2)
    assert h == 16  # matid alignment forces the 32-wide halo rounding
    assert float(jnp.abs(ref.ez).max()) > 0
    _assert_state_equal(ref, got)


def test_blocked_cpml_tfsf_slab():
    from fdtd_tpu.solver.tfsf import Tfsf

    shape, n_b, k = (24, 32, 256), 2, 2
    cpml = Cpml(thickness=((4, 4), (4, 4), (4, 4)))
    dt = ft.Resolution.courant(1.0, ft.REDUCED, safety=0.9).temporal
    tfsf = Tfsf(span=(8, 16), waveform=ft.GaussianPulse(6 * dt, 2 * dt))
    ref, got, _ = _run_pair(shape, n_b, k, cpml, n_passes=4, src_py=16,
                            tfsf=tfsf)
    assert float(jnp.abs(ref.ez).max()) > 0
    _assert_state_equal(ref, got)


def test_blocked_cpml_tfsf_box_straddles_cut():
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


def test_blocked_roundtrip_extend_collapse():
    shape, n_b, k = (16, 32, 256), 2, 2
    cpml = Cpml(thickness=((4, 4), (4, 4), (4, 4)))
    res = ft.Resolution.courant(1.0, ft.REDUCED, safety=0.9)
    dt = res.temporal
    table = ft.coefficient_table([ft.VACUUM], res, ft.REDUCED)
    coeffs = ft.CellCoefficients.uniform(table[0], jnp.float32)
    src = ft.SourceSet.build(
        [ft.PointSource((8, 16, 64), ft.GaussianPulse(4 * dt, 2 * dt),
                        j=(0.0, 0.0, 1.0))]
    )
    step = pallas_cpml_stepk_fn(
        shape, k, inv_dx=(1.0, 1.0, 1.0), dt=dt, constants=ft.REDUCED,
        cpml=cpml, max_sources=1, interpret=True,
    )
    st = init_pml_kernel_state(shape, cpml=cpml)
    for _ in range(3):
        st = step(st, coeffs, src)
    h = blocked_plan(shape, BoundaryConditions(), cpml, k)[1]
    ext = extend_blocked_pml_state(st, 2, h, cpml=cpml)
    rt = collapse_blocked_pml_state(ext, shape, 2, h, cpml=cpml)
    _assert_state_equal(st, rt, atol=0)
    # the owned field view matches too
    view = blocked_owned_view(ext, 2, h)
    np.testing.assert_array_equal(np.asarray(view.ez), np.asarray(st.ez))


def test_blocked_plan_rejects_deep_y_pml():
    bc = BoundaryConditions()
    # y slabs deeper than nly - k on 4 blocks of ny=32 (nly=8)
    assert blocked_plan(
        (16, 32, 128), bc, Cpml(thickness=((0, 0), (7, 7), (0, 0))), 2,
        n_b_candidates=(4,),
    ) is None
    assert blocked_plan(
        (16, 32, 128), bc, Cpml(thickness=((0, 0), (7, 7), (0, 0))), 2,
        n_b_candidates=(2,),
    ) is not None


def test_simulation_run_dispatches_blocked(monkeypatch):
    """Simulation.run's blocked branch end-to-end (extend -> compiled
    scan with probe sampling -> collapse) against manual unblocked
    K-stepping. The backend check is monkeypatched to "tpu" and the
    plain K ladder's supports is forced off so the blocked tier wins;
    the blocked factory is wrapped to build in interpret mode (the
    suite runs on CPU — the real-chip build is gated by
    bench.py::_selfcheck)."""
    import jax

    import fdtd_tpu.solver.pallas_cpml_blocked as blk
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
    # force the plain ladder off; blocked_plan keeps its own real binding
    monkeypatch.setattr(plain_k, "supports_cpml_k",
                        lambda *a, **kw: False)
    # force the grid-blocked tier off too — it outranks this one in
    # Simulation.run and would otherwise take the dispatch
    import fdtd_tpu.solver.pallas_cpml_gb as gbmod

    monkeypatch.setattr(gbmod, "gb_plan", lambda *a, **kw: None)
    real_make = blk.make_pallas_cpml_blocked_stepk
    built = {}

    def make_interpret(*a, **kw):
        kw["interpret"] = True
        built["args"] = (a[1], a[2], a[3])  # (k, n_b, h)
        return real_make(*a, **kw)

    monkeypatch.setattr(blk, "make_pallas_cpml_blocked_stepk",
                        make_interpret)

    sim = Simulation(grid=grid, coeffs=coeffs, sources=src, cpml=cpml)
    state = sim.init()
    probe = PointProbe(((8, 15, 128),), FieldComponent.E)
    state, probe_out, accs = sim.run(state, 8, probes=(probe,),
                                     probe_every=4)
    k, n_b, h = built["args"][0], built["args"][1], built["args"][2]
    assert k > 1 and n_b >= 2  # the blocked tier actually dispatched
    assert accs == ()

    # manual unblocked reference at the same K (restore the real
    # supports first — pallas_cpml_stepk_fn gates on it)
    monkeypatch.undo()
    ref_step = pallas_cpml_stepk_fn(
        shape, k, inv_dx=(1.0, 1.0, 1.0), dt=dt, constants=ft.REDUCED,
        cpml=cpml, max_sources=1, interpret=True,
    )
    ref = init_pml_kernel_state(shape, cpml=cpml)
    for _ in range(8 // k):
        ref = ref_step(ref, coeffs, src)
    # 1-ulp tolerance: run() executes inside a compiled scan, the
    # reference eagerly (same bar as test_sharded_cpml's jitted paths)
    _assert_state_equal(ref, state, atol=1e-6)
    # probe samples match the reference fields at ticks 4 and 8
    assert probe_out[0].shape[0] == 2
    assert np.isfinite(np.asarray(probe_out[0])).all()


def test_blocked_cpml_flux_dft_rows_match_unblocked():
    """In-kernel accumulators on the BLOCKED tier (round 3): box-flux
    reductions, x-plane DFT spectra (E and H), and lateral y/z row
    captures must all match the unblocked CPML K kernel across chained
    passes. The "y" descriptors ride per-block RUNTIME coordinates
    (kernel runtime_lat) and every reduction carries the owned-window
    mask, so the global values are plain sums of the per-block partials
    — the single-chip analog of the sharded tier's psum
    (parallel/pallas_sharded_cpml.py)."""
    shape, n_b, k = (16, 64, 256), 2, 2
    cpml = Cpml(thickness=((4, 4), (4, 4), (4, 4)))
    bc = BoundaryConditions()
    res = ft.Resolution.courant(1.0, ft.REDUCED, safety=0.9)
    dt = res.temporal
    table = ft.coefficient_table([ft.VACUUM], res, ft.REDUCED)
    coeffs = ft.CellCoefficients.uniform(table[0], jnp.float32)
    src = ft.SourceSet.build(
        [ft.PointSource((8, 31, 128), ft.GaussianPulse(4 * dt, 2 * dt),
                        j=(0.3, -0.2, 1.0))]
    )
    # y-face/row coordinates straddle the block cut at y=32
    flux_faces = (("x",), ("y", 20), ("y", 44), ("z", 60), ("z", 200))
    dft = ((9, (10, 1)), (0.11, 0.23))
    dft_rows = (("y", 24), ("z", 100))

    plan = blocked_plan(shape, bc, cpml, k, dft=(dft[0], len(dft[1])),
                        dft_rows=dft_rows, n_b_candidates=(n_b,))
    assert plan is not None
    _, h = plan

    kw = dict(max_sources=1, interpret=True, inv_dx=(1.0, 1.0, 1.0),
              dt=dt, constants=ft.REDUCED, cpml=cpml,
              flux_faces=flux_faces, dft=dft, dft_rows=dft_rows)
    ref_step = pallas_cpml_stepk_fn(shape, k, **kw)
    blk_step = make_pallas_cpml_blocked_stepk(shape, k, n_b, h, **kw)

    ref = init_pml_kernel_state(shape, jnp.float32, cpml=cpml, dft=dft)
    st = extend_blocked_pml_state(
        init_pml_kernel_state(shape, jnp.float32, cpml=cpml, dft=dft),
        n_b, h, cpml=cpml, dft=dft,
    )
    for p in range(3):
        ref, rflux, rcaps = ref_step(ref, coeffs, src)
        st, bflux, bcaps = blk_step(st, coeffs, src)
        # split-sum reassociation only (owned-window partial sums add
        # across blocks in a different order than the full-plane sum)
        np.testing.assert_allclose(
            np.asarray(bflux), np.asarray(rflux), atol=1e-6, rtol=0,
            err_msg=f"flux pass {p}")
        for i, (rc, bc_) in enumerate(zip(rcaps, bcaps)):
            np.testing.assert_allclose(
                np.asarray(bc_), np.asarray(rc), atol=1e-6, rtol=0,
                err_msg=f"caps[{i}] pass {p}")
    got = collapse_blocked_pml_state(st, shape, n_b, h, cpml=cpml,
                                     dft=dft)
    assert float(jnp.abs(ref.ez).max()) > 0
    # in-kernel x-plane DFT accumulators (the psi tail) are per-cell
    # phase folds — bit-exact like the fields
    _assert_state_equal(ref, got)
    assert float(jnp.abs(np.asarray(ref.psi[-1])).max()) > 0


def test_blocked_cpml_dense_region_straddles_cut():
    """DensePml on the BLOCKED tier (round 3): the region widens to the
    full extended lateral span per block (identity coefficients outside
    the real box — the sharded tier's x-span trick applied to y), the
    region psi rides the per-block halo layout with per-pass refresh,
    and chained passes match the unblocked dense kernel. Tolerance
    equality, NOT bitwise: the widened-region build is a structurally
    different program, so XLA's FMA contraction can differ by ~1 ulp
    near the source (same bar and argument as
    test_sharded_simulation.test_dense_pml_rides_sharded_kernel_2d_mesh
    — a halo/coefficient bug would show O(field) errors at the cut,
    not 1e-7-relative noise)."""
    from fdtd_tpu.scene.shapes import Ball
    from fdtd_tpu.solver.pml_region import (
        dense_pml_from_depth,
        depth_from_contains,
        pad_dense_to_tiles,
    )

    shape, n_b, k = (32, 64, 256), 2, 2
    cpml = Cpml(thickness=((5, 5), (4, 4), (4, 4)))
    bc = BoundaryConditions()
    res = ft.Resolution.courant(1.0, ft.REDUCED, safety=0.9)
    dt = res.temporal
    ball = Ball(radius=5.0)
    box = ((10, 22), (26, 38), (122, 134))  # straddles the y=32 cut
    center = np.array([16.0, 32.0, 128.0])
    d_h, d_e = depth_from_contains(
        lambda p: ball.contains(p - center[:, None]), box, 0, +1)
    dense = pad_dense_to_tiles(
        dense_pml_from_depth(0, box, d_h, d_e, spec=cpml.spec, dx=1.0,
                             dt=dt, constants=ft.REDUCED),
        shape)
    plan = blocked_plan(shape, bc, cpml, k, dense=dense,
                        n_b_candidates=(n_b,))
    assert plan is not None
    _, h = plan

    table = ft.coefficient_table([ft.VACUUM], res, ft.REDUCED)
    coeffs = ft.CellCoefficients.uniform(table[0], jnp.float32)
    src = ft.SourceSet.build(
        [ft.PointSource((6, 31, 128), ft.GaussianPulse(4 * dt, 2 * dt),
                        j=(0.2, -0.1, 1.0))]
    )
    kw = dict(max_sources=1, interpret=True, inv_dx=(1.0, 1.0, 1.0),
              dt=dt, constants=ft.REDUCED, cpml=cpml, dense=dense)
    ref_step = pallas_cpml_stepk_fn(shape, k, **kw)
    blk_step = make_pallas_cpml_blocked_stepk(shape, k, n_b, h, **kw)
    ref = init_pml_kernel_state(shape, jnp.float32, cpml=cpml,
                                dense=dense)
    st = extend_blocked_pml_state(ref, n_b, h, cpml=cpml, dense=dense)
    for _ in range(8):
        ref = ref_step(ref, coeffs, src)
        st = blk_step(st, coeffs, src)
    got = collapse_blocked_pml_state(st, shape, n_b, h, cpml=cpml,
                                     dense=dense)
    for f in ("ex", "ey", "ez", "hx", "hy", "hz"):
        a = np.asarray(getattr(ref, f), np.float64)
        b = np.asarray(getattr(got, f), np.float64)
        s = max(np.abs(a).max(), 1e-30)
        np.testing.assert_allclose(b / s, a / s, rtol=0, atol=1e-6,
                                   err_msg=f)
    for i, (a, b) in enumerate(zip(ref.psi, got.psi)):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        s = max(np.abs(a).max(), 1e-30)
        np.testing.assert_allclose(b / s, a / s, rtol=0, atol=1e-6,
                                   err_msg=f"psi[{i}]")
    # the absorber actually engaged (region psi alive past its trash
    # plane) and the wave reached it
    assert np.abs(np.asarray(ref.psi[-1])[:, 1:]).max() > 0


def test_simulation_blocked_accumulators_match_plain(monkeypatch):
    """Simulation.run's blocked branch WITH accumulators: box flux +
    axis-0 DFT spectra + a lateral DftProbe all ride the blocked scan
    (extend -> _compiled_flux -> collapse -> extraction) and match the
    plain K-step kernel path's results on the same run."""
    import jax

    import fdtd_tpu.solver.pallas_cpml_blocked as blk
    import fdtd_tpu.solver.pallas_cpml_k as plain_k
    from fdtd_tpu.models.scattering import _BoxFluxAccumulator
    from fdtd_tpu.probes import DftProbe, FieldComponent
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
    accs = (
        _BoxFluxAccumulator(((5, 11), (8, 24), (64, 192)),
                            (1.0, 1.0, 1.0), dt),
        DftProbe(frequencies=(0.11, 0.2), axis=0, index=9,
                 component=FieldComponent.E),
        DftProbe(frequencies=(0.11, 0.2), axis=1, index=20,
                 component=FieldComponent.H),
    )

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    def run(force_blocked):
        if force_blocked:
            monkeypatch.setattr(plain_k, "supports_cpml_k",
                                lambda *a, **kw: False)
        real_make = blk.make_pallas_cpml_blocked_stepk
        built = {}

        def make_interpret(*a, **kw):
            kw["interpret"] = True
            built["k"] = a[1]
            return real_make(*a, **kw)

        monkeypatch.setattr(blk, "make_pallas_cpml_blocked_stepk",
                            make_interpret)
        import fdtd_tpu.solver.pallas_cpml_k as pk

        if not force_blocked:
            real_fn = pallas_cpml_stepk_fn

            def plain_interpret(*a, **kw):
                kw["interpret"] = True
                return real_fn(*a, **kw)

            monkeypatch.setattr(pk, "pallas_cpml_stepk_fn",
                                plain_interpret)
        sim = Simulation(grid=grid, coeffs=coeffs, sources=src, cpml=cpml)
        state = sim.init()
        state, _, finals = sim.run(state, 8, accumulators=accs)
        if force_blocked:
            assert built.get("k", 0) > 1, "blocked tier did not dispatch"
        monkeypatch.undo()
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        return finals

    ref_finals = run(False)
    blk_finals = run(True)
    # flux scalar: split-sum reassociation only
    np.testing.assert_allclose(float(blk_finals[0]), float(ref_finals[0]),
                               rtol=1e-5)
    # DFT spectra (axis 0 in-kernel, axis 1 via row captures)
    for slot in (1, 2):
        for a, b in zip(ref_finals[slot], blk_finals[slot]):
            a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
            s = max(np.abs(a).max(), 1e-30)
            np.testing.assert_allclose(b / s, a / s, rtol=0, atol=1e-6,
                                       err_msg=f"acc[{slot}]")
    assert np.abs(np.asarray(ref_finals[1][0])).max() > 0
