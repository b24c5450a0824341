"""FEEC/DEC solver: structure preservation, stability, propagation."""

import jax.numpy as jnp
import numpy as np

import fdtd_tpu as ft
from fdtd_tpu.feec import FeecSimulation, TriMesh


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
