"""FEEC/DEC solver: structure preservation, stability, propagation."""

import jax.numpy as jnp
import numpy as np

import fdtd_tpu as ft
from fdtd_tpu.feec import FeecSimulation, TetMesh, TriMesh


def test_dd_is_zero():
    """d1 @ d0 == 0 exactly — the discrete de Rham complex property."""
    mesh = TriMesh.rectangle(6, 5)
    assert np.abs(mesh.d1 @ mesh.d0).max() == 0.0


def test_mesh_geometry():
    mesh = TriMesh.rectangle(4, 4, dx=0.5)
    assert mesh.num_faces == 32
    np.testing.assert_allclose(mesh.face_areas, 0.125)
    # structured grid: axis edges 0.5, diagonals 0.5*sqrt(2)
    assert set(np.round(np.unique(mesh.edge_lengths), 6)) == {
        0.5, round(0.5 * np.sqrt(2), 6)
    }


def test_energy_bounded_and_wave_propagates():
    mesh = TriMesh.rectangle(20, 20)
    sim0 = FeecSimulation(mesh=mesh, dt=1.0)
    dt = 0.5 * sim0.max_stable_dt()
    src_edge = int(np.argmin(np.linalg.norm(
        mesh.vertices[mesh.edges].mean(axis=1) - np.array([10.0, 10.0, 0.0]),
        axis=1,
    )))
    sim = FeecSimulation(
        mesh=mesh, dt=dt,
        sources=((src_edge, ft.GaussianPulse(time=10 * dt, duration=3 * dt)),),
    )
    state = sim.init()
    step = sim.step_fn()
    energies = []
    for _ in range(300):
        state = step(state)
        energies.append(float(sim.energy(state)))
    energies = np.asarray(energies)
    # Lossless leapfrog: the INSTANTANEOUS co-located energy oscillates at
    # 2*omega (E and B live at staggered half-steps) but must not drift —
    # compare early/late window means and bound the oscillation envelope.
    late = energies[60:]
    assert late.max() > 0
    assert late.max() / late.min() < 1.6, (late.min(), late.max())
    drift = abs(late[-50:].mean() / late[:50].mean() - 1.0)
    assert drift < 0.05, f"energy drift {drift:.3f}" 
    # the field reached edges far from the source
    e = np.abs(np.asarray(state.e))
    far = np.linalg.norm(
        mesh.vertices[mesh.edges].mean(axis=1) - np.array([10.0, 10.0, 0.0]),
        axis=1,
    ) > 8
    assert e[far].max() > 1e-8


def test_unstable_dt_blows_up():
    mesh = TriMesh.rectangle(8, 8)
    sim0 = FeecSimulation(mesh=mesh, dt=1.0)
    dt = 2.5 * sim0.max_stable_dt()
    sim = FeecSimulation(
        mesh=mesh, dt=dt,
        sources=((5, ft.GaussianPulse(time=5 * dt, duration=2 * dt)),),
    )
    state = sim.init()
    state = sim.run(state, 200)
    assert not np.isfinite(np.asarray(state.e)).all() or np.abs(
        np.asarray(state.e)
    ).max() > 1e6


def test_tet_complex_is_exact():
    """The 3-D chain complex: d1 @ d0 == 0 and d2 @ d1 == 0 exactly, tet
    volumes tile the box, boundary extraction finds the 12 n^2 surface
    triangles of the Freudenthal subdivision."""
    n = 3
    mesh = TetMesh.box(n, n, n, dx=1.0 / n)
    assert np.abs(mesh.d1 @ mesh.d0).max() == 0.0
    assert np.abs(mesh.d2 @ mesh.d1).max() == 0.0
    assert abs(mesh.tet_volumes.sum() - 1.0) < 1e-12
    assert mesh.num_tets == 6 * n**3
    assert len(mesh.boundary_faces()) == 12 * n**2
    # every boundary edge's vertices lie on the surface of the unit box
    be = mesh.boundary_edges()
    pts = mesh.vertices[mesh.edges[be]].reshape(-1, 3)
    on_surface = np.any((np.abs(pts) < 1e-12) | (np.abs(pts - 1.0) < 1e-12),
                        axis=1)
    assert on_surface.all()


def test_tet_cavity_eigenfrequency():
    """PEC unit-cube cavity: the lowest Maxwell eigenvalue of the Whitney
    (Nedelec/RT) discretization converges to the analytic
    omega^2 = 2 pi^2 c^2 (degenerate x3). The diagonal barycentric Hodge
    does NOT converge on this mesh family — documented here as the reason
    the 3-D solver defaults to hodge='whitney'."""
    analytic = 2.0 * np.pi**2
    errs = []
    for n in (3, 5):
        mesh = TetMesh.box(n, n, n, dx=1.0 / n)
        lam = mesh.curl_curl_eigenvalues(hodge="whitney")
        nz = lam[lam > 1.0]
        errs.append(abs(nz[0] / analytic - 1.0))
        # the next two eigenvalues are the split remnants of the x3
        # degeneracy — they must bracket the same analytic value
        assert abs(nz[1] / analytic - 1.0) < 0.1
        assert abs(nz[2] / analytic - 1.0) < 0.1
    assert errs[1] < 0.04, f"n=5 eigen error {errs[1]:.3f} exceeds 4%"
    assert errs[1] < 0.55 * errs[0], "no h-refinement convergence"
    # the inconsistent diagonal star stays ~20% off at the same n
    lam_d = TetMesh.box(3, 3, 3, dx=1.0 / 3).curl_curl_eigenvalues(
        hodge="diagonal"
    )
    nzd = lam_d[lam_d > 1.0]
    assert abs(nzd[0] / analytic - 1.0) > 0.1


def test_tet_leapfrog_energy_conserved():
    """3-D PEC cavity ring-down with the Whitney Hodge: after the source
    switches off, the leapfrog energy is conserved (no drift) and the
    field stays finite — the structure-preservation property."""
    n = 3
    mesh = TetMesh.box(n, n, n, dx=1.0 / n)
    pec = tuple(int(i) for i in mesh.boundary_edges())
    sim0 = FeecSimulation(mesh=mesh, dt=1.0, pec_edges=pec, hodge="whitney")
    dt = 0.5 * sim0.max_stable_dt()
    interior = mesh.interior_edges()
    src_edge = int(interior[len(interior) // 2])
    sim = FeecSimulation(
        mesh=mesh, dt=dt, pec_edges=pec, hodge="whitney",
        sources=((src_edge, ft.GaussianPulse(time=10 * dt, duration=3 * dt)),),
    )
    state = sim.init()
    step = sim.step_fn()
    energies = []
    for _ in range(400):
        state = step(state)
        energies.append(float(sim.energy(state)))
    energies = np.asarray(energies)
    late = energies[50:]  # source fully off after ~20 dt
    assert late.max() > 0
    assert np.isfinite(np.asarray(state.e)).all()
    # E/B live at staggered half-steps so the co-located energy carries an
    # O(dt^2 omega^2) oscillation, but its mean must not drift
    drift = abs(late[-100:].mean() / late[:100].mean() - 1.0)
    assert drift < 0.02, f"energy drift {drift:.4f}"
    # PEC edges stayed exactly zero
    assert np.abs(np.asarray(state.e)[np.asarray(pec)]).max() == 0.0


def test_load_obj_to_feec():
    """OBJ meshes load into the FEEC solver (the reference's OBJ loader is
    an unimplemented stub)."""
    from fdtd_tpu.io import load_obj

    obj = """
# a unit square as two triangles plus a quad fan check
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
v 2 0 0
v 2 1 0
f 1 2 3
f 1 3 4
f 2/1/1 5/2/1 6/3/1 3/4/1
"""
    mesh = load_obj(obj)
    assert mesh.num_faces == 4  # 2 + fan-triangulated quad
    assert np.abs(mesh.d1 @ mesh.d0).max() == 0.0
    sim = FeecSimulation(mesh=mesh, dt=0.1)
    state = sim.run(sim.init(), 10)
    assert np.isfinite(np.asarray(state.e)).all()


def test_runner_error_path():
    """A failing observation surfaces through on_error and stops the run
    (UiErrorSink analog, cem-app/src/error.rs)."""
    import jax.numpy as jnp

    import fdtd_tpu as ft
    from fdtd_tpu.runner import ObserverBinding, SolverRunner, StopCondition
    from fdtd_tpu.viz.projection import ProjectionParameters

    res = ft.Resolution.courant(1.0, ft.REDUCED, safety=0.9)
    grid = ft.Grid(shape=(8, 8, 8), resolution=res, constants=ft.REDUCED)
    table = ft.coefficient_table([ft.VACUUM], res, ft.REDUCED)
    sim = ft.Simulation(grid=grid,
                        coeffs=ft.CellCoefficients.uniform(table[0], jnp.float32))

    class Exploding:
        def write(self, image, tick=0):
            raise RuntimeError("target exploded")

    errors = []
    runner = SolverRunner(
        sim,
        stop_condition=StopCondition.steps(1000),
        observers=[ObserverBinding(
            params=ProjectionParameters(
                projection=((1, 0, 0, 0), (0, 1, 0, 0), (0, 0, 1, 0.5), (0, 0, 0, 1))
            ),
            target=Exploding(), size=(8, 8),
        )],
    )
    runner.set_throttles(step_delay=None, observation_delay=0.0)
    runner.start(paused=False)
    runner.join(30)
    assert runner.stats().finished
    assert isinstance(runner.error, RuntimeError)
