"""Scene layer: shapes, transforms, voxelization, compile pipeline."""

import numpy as np
import pytest

import fdtd_tpu as ft
from fdtd_tpu.scene import (
    Ball,
    Cuboid,
    Cylinder,
    Entity,
    HalfSpace,
    Isometry,
    Observer,
    Quad,
    Scene,
    SourceSpec,
    Volume,
    compile_scene,
    voxelize_materials,
)
from fdtd_tpu.scene.transform import CoordinateTransforms


def test_shape_sdf_signs():
    pts_in = np.array([[0.0], [0.0], [0.0]])
    pts_out = np.array([[10.0], [0.0], [0.0]])
    for shape in (
        Ball(1.0),
        Cuboid((1, 1, 1)),
        Cylinder(half_height=1.0, radius=1.0),
        Quad((1, 1), half_thickness=0.5),
    ):
        assert shape.contains(pts_in)[0], shape
        assert not shape.contains(pts_out)[0], shape
    hs = HalfSpace(normal=(0, 1, 0))
    assert hs.contains(np.array([[0.0], [-1.0], [0.0]]))[0]
    assert not hs.contains(np.array([[0.0], [1.0], [0.0]]))[0]


def test_isometry_roundtrip(rng):
    iso = Isometry.from_axis_angle((1, 2, 3), 0.7, translation=(4, -5, 6))
    pts = rng.standard_normal((3, 50))
    back = iso.inverse_apply(iso.apply(pts))
    np.testing.assert_allclose(back, pts, atol=1e-12)


def test_isometry_compose(rng):
    a = Isometry.from_axis_angle((1, 0, 0), 0.5, translation=(1, 2, 3))
    b = Isometry.from_axis_angle((0, 1, 1), -1.1, translation=(-2, 0, 4))
    pts = rng.standard_normal((3, 20))
    np.testing.assert_allclose(
        a.compose(b).apply(pts), a.apply(b.apply(pts)), atol=1e-10
    )


def test_coordinate_transforms_roundtrip(rng):
    tr = CoordinateTransforms(
        spatial=(0.5, 0.25, 1.0),
        origin=(-3.0, 2.0, 1.0),
        rotation=Isometry.from_axis_angle((0, 0, 1), 0.3).rotation,
        lattice_size=(16, 16, 16),
    )
    pts = rng.uniform(0, 15, (3, 40))
    back = tr.world_to_solver(tr.solver_to_world(pts))
    np.testing.assert_allclose(back, pts, atol=1e-10)
    assert tr.world_point_to_lattice(tr.solver_to_world(
        np.array([[3.0], [4.0], [5.0]]))[:, 0]) == (3, 4, 5)
    assert tr.world_point_to_lattice((1e9, 0, 0)) is None


def test_voxelize_sphere_fraction():
    """Voxelized sphere volume ~ analytic volume."""
    scene = Scene()
    scene.spawn(
        shape=Ball(3.0),
        pose=Isometry.from_translation((8, 8, 8)),
        material=ft.Material(relative_permittivity=4.0),
    )
    tr = CoordinateTransforms(
        spatial=(1.0, 1.0, 1.0), origin=(0, 0, 0), lattice_size=(16, 16, 16)
    )
    matid, table = voxelize_materials(scene, tr)
    assert len(table) == 2
    count = int((matid == 1).sum())
    expected = 4 / 3 * np.pi * 3.0**3
    assert abs(count - expected) / expected < 0.15
    assert matid.dtype == np.uint8


def test_voxelize_first_entity_wins():
    scene = Scene()
    m1 = ft.Material(relative_permittivity=2.0)
    m2 = ft.Material(relative_permittivity=5.0)
    scene.spawn(shape=Ball(2.0), pose=Isometry.from_translation((4, 4, 4)), material=m1)
    scene.spawn(shape=Cuboid((3, 3, 3)), pose=Isometry.from_translation((4, 4, 4)), material=m2)
    tr = CoordinateTransforms(
        spatial=(1.0, 1.0, 1.0), origin=(0, 0, 0), lattice_size=(8, 8, 8)
    )
    matid, table = voxelize_materials(scene, tr)
    # the cell at the shared center belongs to the first-inserted ball
    assert matid[4, 4, 4] == table.register(m1)


def test_compile_scene_end_to_end():
    """Dielectric ball + source + observer -> runnable Simulation
    (flagship of BASELINE config 2)."""
    import jax.numpy as jnp

    scene = Scene()
    scene.spawn(
        name="scatterer",
        shape=Ball(2.0),
        pose=Isometry.from_translation((0, 0, 0)),
        material=ft.Material(relative_permittivity=3.9),
    )
    scene.spawn(
        name="dipole",
        pose=Isometry.from_translation((-5.0, 0, 0)),
        source=SourceSpec(ft.GaussianPulse(2.0, 0.5), j=(0, 0, 1.0)),
    )
    scene.spawn(
        name="screen",
        shape=Quad((6, 6), half_thickness=0.5),
        pose=Isometry.from_translation((0, 0, 0)),
        observer=Observer(field="e"),
    )

    res = ft.Resolution.courant(0.5, ft.REDUCED, safety=0.9)
    compiled = compile_scene(
        scene,
        res,
        constants=ft.REDUCED,
        volume=Volume.fixed((8.0, 8.0, 8.0)),
    )
    assert compiled.grid.shape == (32, 32, 32)
    assert compiled.num_materials == 2
    assert compiled.sources.num_sources == 1
    assert len(compiled.observers) == 1
    obs = compiled.observers[0]
    assert obs.axis == 2  # quad normal is +z

    sim = compiled.simulation
    state = sim.init()
    state, probe_out, _ = sim.run(state, 8, probes=(obs.probe,), probe_every=4)
    assert probe_out[0].shape == (2, 3, 32, 32)
    assert int(state.tick) == 8
    e = state.e_stacked()
    assert np.isfinite(e).all() and np.abs(e).max() > 0


def test_compile_scene_memory_guard():
    scene = Scene()
    scene.spawn(shape=Ball(2.0), material=ft.VACUUM)
    res = ft.Resolution.courant(0.1, ft.REDUCED)
    with pytest.raises(MemoryError):
        compile_scene(
            scene, res, constants=ft.REDUCED,
            volume=Volume.fixed((8, 8, 8)),
            memory_limit_bytes=1000,
        )


def test_compile_scene_courant_guard():
    scene = Scene()
    scene.spawn(shape=Ball(2.0), material=ft.VACUUM)
    res = ft.Resolution.uniform(0.5, dt=10.0)  # wildly unstable
    with pytest.raises(ValueError, match="Courant"):
        compile_scene(scene, res, constants=ft.REDUCED, volume=Volume.fixed((4, 4, 4)))


def test_native_voxelizer_matches_numpy():
    """The C++ voxelizer must reproduce the NumPy reference exactly."""
    from fdtd_tpu.native import native_voxelizer_available

    if not native_voxelizer_available():
        import pytest

        pytest.skip("no C++ toolchain")
    scene = Scene()
    m1 = ft.Material(relative_permittivity=2.0)
    m2 = ft.Material(relative_permittivity=4.0)
    m3 = ft.Material(electrical_conductivity=float("inf"))
    scene.spawn(shape=Ball(3.0), pose=Isometry.from_translation((8, 8, 8)), material=m1)
    scene.spawn(
        shape=Cuboid((2, 3, 1)),
        pose=Isometry.from_axis_angle((1, 1, 0), 0.7, translation=(4, 10, 6)),
        material=m2,
    )
    scene.spawn(
        shape=Cylinder(half_height=5.0, radius=1.5),
        pose=Isometry.from_axis_angle((1, 0, 0), 1.2, translation=(10, 5, 9)),
        material=m3,
    )
    scene.spawn(shape=HalfSpace((0, 1, 0)), pose=Isometry.from_translation((0, 2, 0)), material=m1)
    tr = CoordinateTransforms(
        spatial=(0.9, 1.1, 0.8),
        origin=(-1.0, 0.5, 0.0),
        rotation=Isometry.from_axis_angle((0, 0, 1), 0.25).rotation,
        lattice_size=(16, 16, 16),
    )
    m_native, t1 = voxelize_materials(scene, tr, use_native=True)
    m_numpy, t2 = voxelize_materials(scene, tr, use_native=False)
    assert t1.materials == t2.materials
    np.testing.assert_array_equal(m_native, m_numpy)
    assert (m_native > 0).sum() > 0


def test_scene_graded_pml_maps_to_boundary_cpml():
    """A reference-style GradedPml slab entity becomes working CPML
    (the reference computes its coefficients but never applies psi)."""
    import jax.numpy as jnp

    from fdtd_tpu.scene import GradedPmlComponent
    from fdtd_tpu.solver.pml import GradedPmlSpec

    scene = Scene()
    scene.spawn(shape=Ball(1.0), material=ft.VACUUM)
    # slab at the low-x edge, 2 units thick, normal +x (into the absorber)
    scene.spawn(
        name="pml-slab",
        shape=Cuboid((1.0, 8.0, 8.0)),
        pose=Isometry.from_translation((-7.0, 0, 0)),
        pml=GradedPmlComponent(spec=GradedPmlSpec(m=4.0), normal=(1.0, 0, 0)),
    )
    res = ft.Resolution.courant(0.5, ft.REDUCED, safety=0.9)
    compiled = compile_scene(
        scene, res, constants=ft.REDUCED, volume=Volume.fixed((8.0, 8.0, 8.0))
    )
    cpml = compiled.simulation.cpml
    assert cpml is not None
    assert cpml.thickness[0][0] == 4  # 2.0 world units / dx 0.5
    assert cpml.thickness[0][1] == 0 and cpml.thickness[1] == (0, 0)
    assert cpml.spec.m == 4.0
    # and it runs
    state = compiled.simulation.init()
    state = compiled.simulation.step(state)
    assert int(state.tick) == 1
