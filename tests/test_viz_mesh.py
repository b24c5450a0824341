"""Shape triangulation (viz/mesh.py) + shaded preview."""

import numpy as np
import pytest

from fdtd_tpu.scene.shapes import Ball, Cuboid, Cylinder, HalfSpace, Quad
from fdtd_tpu.viz.mesh import transform_mesh, triangulate


def _face_areas(verts, faces):
    t = verts[faces]
    return 0.5 * np.linalg.norm(
        np.cross(t[:, 1] - t[:, 0], t[:, 2] - t[:, 0]), axis=1
    )


@pytest.mark.parametrize(
    "shape,area",
    [
        (Ball(radius=2.0), 4 * np.pi * 4.0),
        (Cuboid(half_extents=(1.0, 2.0, 0.5)), 2 * (2*4 + 2*1 + 4*1)),
        (Cylinder(half_height=1.5, radius=1.0),
         2 * np.pi * 1.0 * 3.0 + 2 * np.pi),
    ],
)
def test_mesh_surface_area(shape, area):
    verts, faces = triangulate(shape)
    got = _face_areas(verts, faces).sum()
    # inscribed polyhedra under-estimate curved areas slightly
    assert 0.93 * area <= got <= 1.001 * area


@pytest.mark.parametrize(
    "shape",
    [
        Ball(radius=2.0),
        Cuboid(half_extents=(1.0, 2.0, 0.5)),
        Cylinder(half_height=1.5, radius=1.0),
        Quad(half_extents=(2.0, 1.0)),
    ],
)
def test_mesh_vertices_on_surface(shape):
    verts, faces = triangulate(shape)
    assert faces.min() >= 0 and faces.max() < len(verts)
    assert np.all(_face_areas(verts, faces) > 0)
    d = np.abs(shape.sdf(verts.T))
    assert float(d.max()) < 1e-9


def test_mesh_watertight_closed_shapes():
    """Closed meshes: every edge is shared by exactly two triangles."""
    for shape in (Ball(radius=1.0), Cuboid(half_extents=(1, 1, 1)),
                  Cylinder(half_height=1.0, radius=1.0)):
        _, faces = triangulate(shape)
        edges = {}
        for tri in faces:
            for a, b in ((0, 1), (1, 2), (2, 0)):
                key = tuple(sorted((int(tri[a]), int(tri[b]))))
                edges[key] = edges.get(key, 0) + 1
        assert set(edges.values()) == {2}, type(shape).__name__


def test_halfspace_patch_orientation():
    n = (0.0, 1.0, 0.0)
    verts, faces = triangulate(HalfSpace(normal=n), extent=5.0)
    # all vertices lie in the boundary plane (n . v == 0)
    assert np.allclose(verts @ np.asarray(n), 0.0)


def test_transform_mesh_roundtrip():
    from fdtd_tpu.scene.transform import Isometry

    verts, _ = triangulate(Ball(radius=1.0))
    pose = Isometry.from_axis_angle((0, 0, 1), 0.7, translation=(1, 2, 3))
    w = transform_mesh(verts, pose)
    # distances to the new center are preserved
    np.testing.assert_allclose(
        np.linalg.norm(w - np.array([1, 2, 3]), axis=1), 1.0, atol=1e-12
    )


def test_preview_renders_shaded_meshes(tmp_path):
    from fdtd_tpu.models.example import example_scene
    from fdtd_tpu.viz import render_scene_preview

    out = render_scene_preview(example_scene(), tmp_path / "p.png")
    assert out.exists() and out.stat().st_size > 10_000
