"""Triangle-mesh generation from scene shapes.

Counterpart of the reference's shape->mesh builders
(cem-render/src/mesh/parry.rs:44-152: UV-sphere from Ball, 12-triangle box
from Cuboid, side+caps cylinder; flat shapes in cem-render/src/shape/
flat.rs:45-344). The meshes feed the shaded preview
(viz/preview.py::render_scene_preview) instead of GPU vertex buffers —
flat-shaded Poly3DCollections are the headless fidelity a TPU workflow
needs, so normals/UVs are omitted (matplotlib derives facet shading from
geometry).

Returns (vertices, faces): float64 (n, 3) vertex positions in the shape's
LOCAL frame and int32 (m, 3) triangle indices.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from ..scene.shapes import Ball, Cuboid, Cylinder, HalfSpace, Quad, Shape

__all__ = ["triangulate", "transform_mesh"]


def _uv_sphere(radius: float, n_lat: int = 16, n_lon: int = 24):
    """UV sphere (parry.rs:44-76 uses the same latitude-ring layout)."""
    verts = [(0.0, radius, 0.0)]
    for i in range(1, n_lat):
        theta = np.pi * i / n_lat
        y = radius * np.cos(theta)
        r = radius * np.sin(theta)
        for j in range(n_lon):
            phi = 2 * np.pi * j / n_lon
            verts.append((r * np.cos(phi), y, r * np.sin(phi)))
    verts.append((0.0, -radius, 0.0))
    south = len(verts) - 1
    faces = []
    # top cap
    for j in range(n_lon):
        faces.append((0, 1 + j, 1 + (j + 1) % n_lon))
    # bands
    for i in range(n_lat - 2):
        a0 = 1 + i * n_lon
        b0 = 1 + (i + 1) * n_lon
        for j in range(n_lon):
            j1 = (j + 1) % n_lon
            faces.append((a0 + j, b0 + j, b0 + j1))
            faces.append((a0 + j, b0 + j1, a0 + j1))
    # bottom cap
    b0 = 1 + (n_lat - 2) * n_lon
    for j in range(n_lon):
        faces.append((south, b0 + (j + 1) % n_lon, b0 + j))
    return np.asarray(verts, np.float64), np.asarray(faces, np.int32)


def _box(he) -> Tuple[np.ndarray, np.ndarray]:
    """12-triangle box from half-extents (parry.rs:78-108)."""
    hx, hy, hz = he
    verts = np.array(
        [
            [-hx, -hy, -hz], [hx, -hy, -hz], [hx, hy, -hz], [-hx, hy, -hz],
            [-hx, -hy, hz], [hx, -hy, hz], [hx, hy, hz], [-hx, hy, hz],
        ],
        np.float64,
    )
    quads = [
        (0, 3, 2, 1),  # -z
        (4, 5, 6, 7),  # +z
        (0, 1, 5, 4),  # -y
        (2, 3, 7, 6),  # +y
        (0, 4, 7, 3),  # -x
        (1, 2, 6, 5),  # +x
    ]
    faces = []
    for a, b, c, d in quads:
        faces.append((a, b, c))
        faces.append((a, c, d))
    return verts, np.asarray(faces, np.int32)


def _cylinder(half_height: float, radius: float, n_seg: int = 32):
    """Y-axis cylinder: side wall + two cap fans (parry.rs:110-152)."""
    verts = []
    for y in (half_height, -half_height):
        for j in range(n_seg):
            phi = 2 * np.pi * j / n_seg
            verts.append((radius * np.cos(phi), y, radius * np.sin(phi)))
    top_c = len(verts)
    verts.append((0.0, half_height, 0.0))
    bot_c = len(verts)
    verts.append((0.0, -half_height, 0.0))
    faces = []
    for j in range(n_seg):
        j1 = (j + 1) % n_seg
        t0, t1 = j, j1
        b0, b1 = n_seg + j, n_seg + j1
        faces.append((t0, b0, b1))
        faces.append((t0, b1, t1))
        faces.append((top_c, t1, t0))   # top cap (ccw from +y)
        faces.append((bot_c, b0, b1))   # bottom cap
    return np.asarray(verts, np.float64), np.asarray(faces, np.int32)


def _quad(hx: float, hy: float):
    verts = np.array(
        [[-hx, -hy, 0], [hx, -hy, 0], [hx, hy, 0], [-hx, hy, 0]], np.float64
    )
    faces = np.asarray([(0, 1, 2), (0, 2, 3)], np.int32)
    return verts, faces


def triangulate(
    shape: Shape, *, extent: float = 10.0
) -> Tuple[np.ndarray, np.ndarray]:
    """(vertices, faces) for a scene shape in its local frame.

    ``extent`` bounds unbounded shapes (HalfSpace renders as a finite
    plane patch of that half-size, like the reference's ground quad)."""
    if isinstance(shape, Ball):
        return _uv_sphere(shape.radius)
    if isinstance(shape, Cuboid):
        return _box(shape.half_extents)
    if isinstance(shape, Cylinder):
        return _cylinder(shape.half_height, shape.radius)
    if isinstance(shape, Quad):
        return _quad(*shape.half_extents)
    if isinstance(shape, HalfSpace):
        # finite patch of the boundary plane, oriented by the normal
        n = np.asarray(shape.normal, np.float64)
        n = n / np.linalg.norm(n)
        # build a tangent basis
        a = np.array([1.0, 0.0, 0.0])
        if abs(n @ a) > 0.9:
            a = np.array([0.0, 0.0, 1.0])
        u = np.cross(n, a)
        u /= np.linalg.norm(u)
        v = np.cross(n, u)
        verts = np.stack(
            [
                -extent * u - extent * v,
                extent * u - extent * v,
                extent * u + extent * v,
                -extent * u + extent * v,
            ]
        )
        faces = np.asarray([(0, 1, 2), (0, 2, 3)], np.int32)
        return verts, faces
    raise TypeError(f"no mesh generator for {type(shape).__name__}")


def transform_mesh(verts: np.ndarray, pose) -> np.ndarray:
    """Apply an Isometry to local-frame vertices, (n, 3) -> (n, 3)."""
    return pose.apply(verts.T).T
