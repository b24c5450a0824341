"""Volumetric per-cell PML regions (solver/pml_region.py).

Counterpart checks for the reference's arbitrary-entity PML depth query
(cem-app/src/solver/runner.rs:633-676): slab-shaped regions must reproduce
the boundary-slab CPML exactly, the vectorized depth march must match
analytic chord depths, and an interior absorber must actually absorb.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import fdtd_tpu as ft
from fdtd_tpu.scene.shapes import Ball, Cuboid
from fdtd_tpu.solver.cpml import Cpml
from fdtd_tpu.solver.pml import GradedPmlSpec
from fdtd_tpu.solver.engine import build_step, init_engine_state
from fdtd_tpu.solver.pml_region import (
    DensePml,
    dense_pml_from_depth,
    depth_from_contains,
)

DT = 0.25
INV_DX = (1.0, 1.0, 1.0)


def _slab_depths(shape, axis, lo_cells):
    """Analytic low-side slab depths at both staggers, as 3-D volumes on
    the box [0, lo) x full x full (mirrors cpml._profiles_1d)."""
    box = [(0, s) for s in shape]
    box[axis] = (0, lo_cells)
    bshape = tuple(b1 - b0 for b0, b1 in box)
    pos = np.arange(lo_cells, dtype=np.float64)
    d_h = (lo_cells - pos) / lo_cells
    d_e = (lo_cells - pos - 0.5) / lo_cells
    sh = [1, 1, 1]
    sh[axis] = lo_cells
    return (tuple(box), np.broadcast_to(d_h.reshape(sh), bshape).copy(),
            np.broadcast_to(np.clip(d_e, 0, 1).reshape(sh), bshape).copy())


def test_dense_slab_matches_boundary_cpml():
    """A dense region shaped exactly like a boundary slab (same depths,
    same staggers) must reproduce the slab CPML path to f32 rounding."""
    shape = (32, 16, 16)
    lo = 8
    cpml = Cpml(thickness=((lo, 0), (0, 0), (0, 0)))
    box, d_h, d_e = _slab_depths(shape, 0, lo)
    dense = dense_pml_from_depth(
        0, box, d_h, d_e, spec=cpml.spec, dx=1.0, dt=DT, constants=ft.REDUCED
    )

    coeffs = ft.CellCoefficients.uniform((1.0, 0.25, 1.0, 0.25), jnp.float32)
    src = ft.SourceSet.build(
        [ft.PointSource((20, 8, 8), ft.GaussianPulse(10 * DT, 3 * DT),
                        j=(0, 0, 1.0))]
    )
    step_a = jax.jit(build_step(shape, inv_dx=INV_DX, dt=DT,
                                constants=ft.REDUCED, cpml=cpml))
    step_b = jax.jit(build_step(shape, inv_dx=INV_DX, dt=DT,
                                constants=ft.REDUCED, dense=dense))
    sa = init_engine_state(shape, cpml=cpml)
    sb = init_engine_state(shape, dense=dense)
    for _ in range(60):
        sa = step_a(sa, coeffs, src)
        sb = step_b(sb, coeffs, src)
    scale = float(jnp.max(jnp.abs(sa.ez)))
    assert scale > 1e-6
    for c in range(3):
        np.testing.assert_allclose(
            np.asarray(sb.e[c]), np.asarray(sa.e[c]),
            rtol=1e-6, atol=1e-6 * scale, err_msg=f"e[{c}]",
        )
        np.testing.assert_allclose(
            np.asarray(sb.h[c]), np.asarray(sa.h[c]),
            rtol=1e-6, atol=1e-6 * scale, err_msg=f"h[{c}]",
        )


def test_depth_march_matches_analytic_slab():
    """Vectorized depth marching on a cuboid slab: within the step
    quantization (0.25 cells) of the analytic chord depth."""
    L = 8
    shape_obj = Cuboid(half_extents=(L / 2, 50.0, 50.0))
    # slab spans x in [-L/2, L/2]; lattice x index i maps to x = i - L/2
    # (so the slab covers cells 0..L). Normal -x: entry at x = +L/2.
    def contains(pts):
        return shape_obj.contains(pts - np.array([[L / 2], [0.0], [0.0]]))

    box = ((0, L), (0, 4), (0, 4))
    d_h, d_e = depth_from_contains(contains, box, 0, -1)
    pos = np.arange(L)
    np.testing.assert_allclose(d_h[:, 0, 0], (L - pos) / L, atol=0.08)
    np.testing.assert_allclose(
        d_e[:, 0, 0], np.clip((L - pos - 0.5) / L, 0, 1), atol=0.08
    )


def test_depth_march_ball_center():
    """Center of a ball is depth 0.5 (equal chords both ways); points
    off-center along the normal shift linearly."""
    ball = Ball(radius=6.0)
    ctr = np.array([[8.0], [8.0], [8.0]])
    box = ((4, 13), (4, 13), (4, 13))
    d_h, _ = depth_from_contains(
        lambda p: ball.contains(p - ctr), box, 2, +1
    )
    assert abs(d_h[4, 4, 4] - 0.5) < 0.05          # center (8,8,8)
    assert d_h[4, 4, 1] < d_h[4, 4, 4] < d_h[4, 4, 7]  # deepens along +z
    assert d_h[0, 0, 0] == 0.0                      # outside the ball


def test_interior_ball_absorber_damps_transmission():
    """A spherical absorber between source and probe cuts the transmitted
    pulse and stays stable (the feature the reference sketches but never
    applies, runner.rs:633-676 + cpu/mod.rs:424-425)."""
    shape = (64, 24, 24)
    ball = Ball(radius=7.0)
    ctr = np.array([[32.0], [12.0], [12.0]])
    box = ((24, 41), (4, 21), (4, 21))
    d_h, d_e = depth_from_contains(
        lambda p: ball.contains(p - ctr), box, 0, +1
    )
    spec = GradedPmlSpec()
    dense = dense_pml_from_depth(0, box, d_h, d_e, spec=spec, dx=1.0, dt=DT,
                                 constants=ft.REDUCED)
    coeffs = ft.CellCoefficients.uniform((1.0, 0.25, 1.0, 0.25), jnp.float32)
    src = ft.SourceSet.build(
        [ft.PointSource((10, 12, 12), ft.GaussianPulse(15 * DT, 5 * DT),
                        j=(0, 0, 1.0))]
    )

    def run(dense_arg):
        step = jax.jit(build_step(shape, inv_dx=INV_DX, dt=DT,
                                  constants=ft.REDUCED, dense=dense_arg))
        st = init_engine_state(shape, dense=dense_arg)
        trace = []
        for _ in range(220):
            st = step(st, coeffs, src)
            trace.append(float(st.ez[54, 12, 12]))  # behind the ball
        return np.array(trace), st

    free, _ = run(None)
    damped, st = run(dense)
    assert np.all(np.isfinite(damped))
    t_free = np.abs(free).max()
    t_damp = np.abs(damped).max()
    assert t_free > 1e-6
    # the on-axis path is absorbed, but the field DIFFRACTS around the
    # ball (radius 7 in a 24-cell cross-section), which floors the
    # achievable cut — measured ~0.47 with pure diffraction unaffected
    assert t_damp < 0.6 * t_free, f"{t_damp:.3e} vs free {t_free:.3e}"
    # psi is active only inside the region
    assert any(float(jnp.max(jnp.abs(p))) > 0 for p in st.psi_d)


def test_interior_wall_absorber_blocks_transmission():
    """A full-cross-section absorbing wall (no diffraction path) must cut
    transmission hard — the quantitative gate on the volumetric sigma."""
    shape = (64, 16, 16)
    L = 12
    box = ((26, 26 + L), (0, 16), (0, 16))
    pos = np.arange(L, dtype=np.float64)
    bshape = (L, 16, 16)
    d_h = np.broadcast_to(((pos + 1) / L).reshape(L, 1, 1), bshape).copy()
    d_e = np.broadcast_to(((pos + 0.5) / L).reshape(L, 1, 1), bshape).copy()
    dense = dense_pml_from_depth(0, box, d_h, d_e, spec=GradedPmlSpec(),
                                 dx=1.0, dt=DT, constants=ft.REDUCED)
    coeffs = ft.CellCoefficients.uniform((1.0, 0.25, 1.0, 0.25), jnp.float32)
    src = ft.SourceSet.build(
        [ft.PointSource((10, 8, 8), ft.GaussianPulse(15 * DT, 5 * DT),
                        j=(0, 0, 1.0))]
    )

    def run(dense_arg):
        step = jax.jit(build_step(shape, inv_dx=INV_DX, dt=DT,
                                  constants=ft.REDUCED, dense=dense_arg))
        st = init_engine_state(shape, dense=dense_arg)
        trace = []
        for _ in range(200):
            st = step(st, coeffs, src)
            trace.append(float(st.ez[50, 8, 8]))
        return np.array(trace)

    free = run(None)
    damped = run(dense)
    assert np.all(np.isfinite(damped))
    t_free, t_damp = np.abs(free).max(), np.abs(damped).max()
    assert t_free > 1e-6
    assert t_damp < 0.12 * t_free, f"{t_damp:.3e} vs free {t_free:.3e}"


def test_dense_overlap_with_boundary_slab_rejected():
    shape = (32, 16, 16)
    cpml = Cpml(thickness=((8, 0), (0, 0), (0, 0)))
    box, d_h, d_e = _slab_depths(shape, 0, 8)
    dense = dense_pml_from_depth(0, box, d_h, d_e, spec=cpml.spec, dx=1.0,
                                 dt=DT, constants=ft.REDUCED)
    with pytest.raises(ValueError, match="overlaps"):
        build_step(shape, inv_dx=INV_DX, dt=DT, constants=ft.REDUCED,
                   cpml=cpml, dense=dense)


def test_dense_pml_via_simulation():
    """Simulation(dense_pml=...) routes to the XLA engine and runs."""
    from fdtd_tpu.solver.simulation import Simulation

    shape = (32, 16, 16)
    res = ft.Resolution(spatial=(1.0, 1.0, 1.0), temporal=DT)
    grid = ft.Grid(shape=shape, resolution=res, constants=ft.REDUCED)
    ball = Ball(radius=4.0)
    ctr = np.array([[16.0], [8.0], [8.0]])
    box = ((11, 22), (3, 14), (3, 14))
    d_h, d_e = depth_from_contains(
        lambda p: ball.contains(p - ctr), box, 0, +1
    )
    dense = dense_pml_from_depth(0, box, d_h, d_e, spec=GradedPmlSpec(),
                                 dx=1.0, dt=DT, constants=ft.REDUCED)
    coeffs = ft.CellCoefficients.uniform((1.0, 0.25, 1.0, 0.25), jnp.float32)
    src = ft.SourceSet.build(
        [ft.PointSource((5, 8, 8), ft.GaussianPulse(10 * DT, 3 * DT),
                        j=(0, 0, 1.0))]
    )
    sim = Simulation(grid=grid, coeffs=coeffs, sources=src, dense_pml=dense)
    assert not sim._cpml_kernel_eligible()
    st = sim.init()
    assert len(st.psi_d) == 4
    st2, _, _ = sim.run(st, n_steps=40)
    assert int(st2.tick) == 40
    assert np.all(np.isfinite(np.asarray(st2.ez)))


def test_scene_interior_pml_entity_becomes_dense_region():
    """A GradedPml entity that is NOT an edge slab (here an interior ball)
    compiles to a volumetric per-cell region on the Simulation
    (runner.rs:633-676 made real)."""
    from fdtd_tpu.scene import GradedPmlComponent, Scene
    from fdtd_tpu.scene.compile import Volume, compile_scene
    from fdtd_tpu.scene.transform import Isometry

    scene = Scene()
    scene.spawn(shape=Cuboid((0.5, 0.5, 0.5)), material=ft.VACUUM)
    scene.spawn(
        name="absorbing-ball",
        shape=Ball(2.0),
        pose=Isometry.from_translation((2.0, 0.0, 0.0)),
        pml=GradedPmlComponent(spec=GradedPmlSpec(m=3.0),
                               normal=(1.0, 0.0, 0.0)),
    )
    res = ft.Resolution.courant(0.5, ft.REDUCED, safety=0.9)
    compiled = compile_scene(
        scene, res, constants=ft.REDUCED, volume=Volume.fixed((8.0, 8.0, 8.0))
    )
    sim = compiled.simulation
    assert sim.cpml is None
    dense = sim.dense_pml
    assert dense is not None and dense.axis == 0
    # the ball spans world x in [0, 4] -> solver x in [16, 24] at dx 0.5
    (bx0, bx1), _, _ = dense.box
    assert bx0 <= 17 and bx1 >= 23
    # depth grows along +x inside the ball; coefficients active
    b = dense.coeffs_h[1]
    assert float(b.max()) > 0.5
    # runs end-to-end through the compiled Simulation
    st = sim.init()
    assert len(st.psi_d) == 4
    st2, _, _ = sim.run(st, n_steps=20)
    assert int(st2.tick) == 20
    assert np.all(np.isfinite(np.asarray(st2.ez)))


def test_dense_pml_in_kernel_matches_engine():
    """The K-step CPML kernel's volumetric-region path (dense_spec:
    per-stage coefficient blocks + the plane-clamped region psi volume)
    must match the XLA engine with the SAME DensePml — interior ball
    absorber inside a CPML-bounded domain, chained passes, fields AND
    region psi compared."""
    from fdtd_tpu.solver.pallas_cpml import init_pml_kernel_state
    from fdtd_tpu.solver.pallas_cpml_k import (
        pallas_cpml_stepk_fn,
        supports_cpml_k,
    )

    shape, k = (32, 32, 256), 4
    cpml = Cpml(thickness=((5, 5), (4, 4), (4, 4)))
    res = ft.Resolution.courant(1.0, ft.REDUCED, safety=0.9)
    dt = res.temporal
    ball = Ball(radius=5.0)
    box = ((10, 22), (10, 22), (122, 134))
    center = np.array([16.0, 16.0, 128.0])
    d_h, d_e = depth_from_contains(
        lambda p: ball.contains(p - center[:, None]), box, 0, +1
    )
    dense = dense_pml_from_depth(
        0, box, d_h, d_e, spec=cpml.spec, dx=1.0, dt=dt,
        constants=ft.REDUCED,
    )
    # the raw (12, 12)-lateral box is not tile-complete: the kernel wants
    # it aligned (Mosaic block constraint), identity-padded
    from fdtd_tpu.solver.pml_region import pad_dense_to_tiles

    assert not supports_cpml_k(shape, ft.BoundaryConditions(), cpml, k,
                               dense=dense)
    dense = pad_dense_to_tiles(dense, shape)
    assert dense.box_shape[1] % 8 == 0 and dense.box_shape[2] % 128 == 0
    assert supports_cpml_k(shape, ft.BoundaryConditions(), cpml, k,
                           dense=dense)

    coeffs = ft.CellCoefficients.uniform(
        ft.coefficient_table([ft.VACUUM], res, ft.REDUCED)[0], jnp.float32)
    src = ft.SourceSet.build(
        [ft.PointSource((6, 16, 128), ft.GaussianPulse(4 * dt, 2 * dt),
                        j=(0.2, -0.1, 1.0))]
    )

    eng = build_step(shape, inv_dx=(1.0, 1.0, 1.0), dt=dt,
                     constants=ft.REDUCED, cpml=cpml, dense=dense)
    est = init_engine_state(shape, cpml=cpml, dense=dense)

    kstep = pallas_cpml_stepk_fn(
        shape, k, inv_dx=(1.0, 1.0, 1.0), dt=dt, constants=ft.REDUCED,
        cpml=cpml, max_sources=1, interpret=True, dense=dense,
    )
    kst = init_pml_kernel_state(shape, cpml=cpml, dense=dense)

    for _ in range(3 * k):
        est = eng(est, coeffs, src)
    for _ in range(3):
        kst = kstep(kst, coeffs, src)

    assert float(jnp.abs(est.ez).max()) > 0
    for name in ("ex", "ey", "ez", "hx", "hy", "hz"):
        np.testing.assert_allclose(
            np.asarray(getattr(kst, name)), np.asarray(getattr(est, name)),
            rtol=0, atol=2e-6, err_msg=name,
        )
    # region psi: engine keeps 4 box volumes; kernel packs them as
    # (4, bx+1, by, bz) with a trash plane at index 0
    dvol = np.asarray(kst.psi[-1])
    assert dvol.shape[0] == 4
    np.testing.assert_allclose(dvol[:, 0], 0.0, atol=0)  # trash plane
    for j in range(4):
        np.testing.assert_allclose(
            dvol[j, 1:], np.asarray(est.psi_d[j]), rtol=0, atol=2e-6,
            err_msg=f"psi_d[{j}]",
        )


def test_dense_pml_single_pass_kernel_matches_engine():
    """The single-pass CPML kernel's DensePml path (one blocked
    coefficient operand + the plane-blocked region psi volume) must match
    the XLA engine per tick."""
    from fdtd_tpu.solver.pallas_cpml import (
        init_pml_kernel_state,
        pallas_cpml_step_fn,
    )
    from fdtd_tpu.solver.pml_region import pad_dense_to_tiles

    shape = (32, 32, 256)
    cpml = Cpml(thickness=((5, 5), (4, 4), (4, 4)))
    res = ft.Resolution.courant(1.0, ft.REDUCED, safety=0.9)
    dt = res.temporal
    ball = Ball(radius=5.0)
    box = ((10, 22), (10, 22), (122, 134))
    center = np.array([16.0, 16.0, 128.0])
    d_h, d_e = depth_from_contains(
        lambda p: ball.contains(p - center[:, None]), box, 1, -1
    )
    dense = pad_dense_to_tiles(
        dense_pml_from_depth(1, box, d_h, d_e, spec=cpml.spec, dx=1.0,
                             dt=dt, constants=ft.REDUCED),
        shape,
    )

    coeffs = ft.CellCoefficients.uniform(
        ft.coefficient_table([ft.VACUUM], res, ft.REDUCED)[0], jnp.float32)
    src = ft.SourceSet.build(
        [ft.PointSource((16, 6, 128), ft.GaussianPulse(4 * dt, 2 * dt),
                        j=(0.2, -0.1, 1.0))]
    )
    eng = build_step(shape, inv_dx=(1.0, 1.0, 1.0), dt=dt,
                     constants=ft.REDUCED, cpml=cpml, dense=dense)
    est = init_engine_state(shape, cpml=cpml, dense=dense)
    kstep = pallas_cpml_step_fn(
        shape, inv_dx=(1.0, 1.0, 1.0), dt=dt, constants=ft.REDUCED,
        cpml=cpml, max_sources=1, interpret=True, dense=dense,
    )
    kst = init_pml_kernel_state(shape, cpml=cpml, dense=dense)
    for _ in range(8):
        est = eng(est, coeffs, src)
        kst = kstep(kst, coeffs, src)
    assert float(jnp.abs(est.ez).max()) > 0
    for name in ("ex", "ey", "ez", "hx", "hy", "hz"):
        np.testing.assert_allclose(
            np.asarray(getattr(kst, name)), np.asarray(getattr(est, name)),
            rtol=0, atol=2e-6, err_msg=name,
        )
    dvol = np.asarray(kst.psi[-1])
    for j in range(4):
        np.testing.assert_allclose(
            dvol[j, 1:], np.asarray(est.psi_d[j]), rtol=0, atol=2e-6,
            err_msg=f"psi_d[{j}]",
        )


def test_padded_identity_overlap_with_slab_allowed():
    """pad_dense_to_tiles can push a region's PADDED box into a boundary
    slab (z pads to 128-lane alignment); padded cells are exact identity
    no-ops, so only the LIVE box is checked for slab overlap — the engine
    accepts the padded region, and kernel_dense keeps it kernel-eligible.
    A region whose LIVE box overlaps a slab is still rejected."""
    from fdtd_tpu.parallel.best import kernel_dense
    from fdtd_tpu.solver.pml_region import pad_dense_to_tiles

    shape = (32, 16, 256)
    cpml = Cpml(thickness=((4, 4), (3, 3), (4, 4)))
    ball = Ball(radius=4.0)
    ctr = np.array([[16.0], [8.0], [128.0]])
    box = ((11, 22), (3, 14), (123, 134))
    d_h, d_e = depth_from_contains(
        lambda p: ball.contains(p - ctr), box, 2, +1
    )
    dense = dense_pml_from_depth(2, box, d_h, d_e, spec=cpml.spec, dx=1.0,
                                 dt=DT, constants=ft.REDUCED)
    padded = pad_dense_to_tiles(dense, shape)
    assert padded.box[2] == (0, 256)  # pad reaches into both z slabs
    assert padded.live == dense.box
    # engine build accepts the padded region (identity cells in slabs)
    build_step(shape, inv_dx=INV_DX, dt=DT, constants=ft.REDUCED,
               cpml=cpml, dense=padded)
    assert kernel_dense(dense, shape, cpml) is not None
    # but a LIVE overlap still rejects: ball box pushed into the z slab
    box_bad = ((11, 22), (3, 14), (2, 13))
    d_h2, d_e2 = depth_from_contains(
        lambda p: ball.contains(p - np.array([[16.0], [8.0], [7.0]])),
        box_bad, 2, +1,
    )
    bad = dense_pml_from_depth(2, box_bad, d_h2, d_e2, spec=cpml.spec,
                               dx=1.0, dt=DT, constants=ft.REDUCED)
    with pytest.raises(ValueError, match="overlaps"):
        build_step(shape, inv_dx=INV_DX, dt=DT, constants=ft.REDUCED,
                   cpml=cpml, dense=bad)
    assert kernel_dense(bad, shape, cpml) is None


def test_dense_only_kernel_eligibility(monkeypatch):
    """Simulation(dense_pml=...) with NO boundary CPML/TFSF is kernel-
    eligible on TPU when the region tile-aligns: the kernel hosts it with
    an empty absorber (_cpml_or_empty). Backend is monkeypatched — the
    suite runs on CPU; the kernel build itself is covered by
    tests/test_sharded_simulation.py::test_dense_only_rides_sharded_kernel."""
    import jax

    from fdtd_tpu.solver.simulation import Simulation

    shape = (32, 32, 256)
    res = ft.Resolution(spatial=(1.0, 1.0, 1.0), temporal=DT)
    grid = ft.Grid(shape=shape, resolution=res, constants=ft.REDUCED)
    ball = Ball(radius=5.0)
    ctr = np.array([[16.0], [16.0], [128.0]])
    box = ((10, 22), (10, 22), (122, 134))
    d_h, d_e = depth_from_contains(
        lambda p: ball.contains(p - ctr), box, 2, +1
    )
    dense = dense_pml_from_depth(2, box, d_h, d_e, spec=GradedPmlSpec(),
                                 dx=1.0, dt=DT, constants=ft.REDUCED)
    coeffs = ft.CellCoefficients.uniform((1.0, 0.25, 1.0, 0.25), jnp.float32)
    sim = Simulation(grid=grid, coeffs=coeffs, dense_pml=dense)
    assert not sim._cpml_kernel_eligible()  # CPU backend
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert sim._cpml_kernel_eligible()
    # empty host: no active boundary axes, region still tile-padded
    assert sim._cpml_or_empty.active_axes() == ()
    assert sim._dense_kernel is not None
