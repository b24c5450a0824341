"""Simplicial surface meshes for the FEEC solver.

Counterpart of the reference's half-edge machinery
(cem-solver/src/feec/simplex/half_edge.rs:16-78 + volume_mesh.rs skeleton):
a triangle mesh with unique oriented edges, the SIGNED edge->face incidence
operator d1 (the reference's Boundary/Coboundary sums drop orientation
signs, feec/cpu/mod.rs:56-82 — a correctness fix here), and the geometric
quantities (edge lengths, face areas, barycentric dual lengths) needed for
diagonal Hodge stars.

The discrete exterior derivative satisfies d1 @ d0 == 0 exactly (tested),
which is the structure-preservation property FEEC is about.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import numpy as np

__all__ = ["TriMesh"]


@dataclasses.dataclass(frozen=True)
class TriMesh:
    """vertices (nv, 3); faces (nf, 3) vertex indices; edges (ne, 2) sorted
    vertex pairs; d0 (ne, nv) and d1 (nf, ne) signed incidence."""

    vertices: np.ndarray
    faces: np.ndarray
    edges: np.ndarray
    d0: np.ndarray
    d1: np.ndarray
    edge_lengths: np.ndarray  # (ne,)
    face_areas: np.ndarray  # (nf,)
    dual_edge_lengths: np.ndarray  # (ne,) barycentric dual

    @classmethod
    def from_triangles(cls, vertices, faces) -> "TriMesh":
        vertices = np.asarray(vertices, np.float64)
        faces = np.asarray(faces, np.int64)
        nv = len(vertices)
        nf = len(faces)

        edge_index: Dict[Tuple[int, int], int] = {}
        edges = []
        for tri in faces:
            for a, b in ((tri[0], tri[1]), (tri[1], tri[2]), (tri[2], tri[0])):
                key = (min(a, b), max(a, b))
                if key not in edge_index:
                    edge_index[key] = len(edges)
                    edges.append(key)
        edges = np.asarray(edges, np.int64)
        ne = len(edges)

        # d0: vertices -> edges (gradient), edge e = (v0 < v1): +1 at v1, -1 at v0
        d0 = np.zeros((ne, nv), np.float64)
        d0[np.arange(ne), edges[:, 1]] = 1.0
        d0[np.arange(ne), edges[:, 0]] = -1.0

        # d1: edges -> faces (curl); sign +1 when the face traverses the edge
        # in its canonical (v0 -> v1) direction
        d1 = np.zeros((nf, ne), np.float64)
        for fi, tri in enumerate(faces):
            for a, b in ((tri[0], tri[1]), (tri[1], tri[2]), (tri[2], tri[0])):
                ei = edge_index[(min(a, b), max(a, b))]
                d1[fi, ei] = 1.0 if a < b else -1.0

        edge_vec = vertices[edges[:, 1]] - vertices[edges[:, 0]]
        edge_lengths = np.linalg.norm(edge_vec, axis=1)

        p0 = vertices[faces[:, 0]]
        p1 = vertices[faces[:, 1]]
        p2 = vertices[faces[:, 2]]
        face_areas = 0.5 * np.linalg.norm(np.cross(p1 - p0, p2 - p0), axis=1)

        # barycentric dual edge length: distance between barycenters of the
        # two faces sharing the edge (or barycenter to edge midpoint at the
        # boundary)
        barycenters = (p0 + p1 + p2) / 3.0
        mid = 0.5 * (vertices[edges[:, 0]] + vertices[edges[:, 1]])
        dual = np.zeros(ne, np.float64)
        counts = np.zeros(ne, np.int64)
        for fi, tri in enumerate(faces):
            for a, b in ((tri[0], tri[1]), (tri[1], tri[2]), (tri[2], tri[0])):
                ei = edge_index[(min(a, b), max(a, b))]
                dual[ei] += np.linalg.norm(barycenters[fi] - mid[ei])
                counts[ei] += 1
        # interior edges accumulate from both faces -> full dual length ✓;
        # boundary edges get the half-length, which is the correct dual cell
        dual_edge_lengths = dual

        return cls(
            vertices=vertices,
            faces=faces,
            edges=edges,
            d0=d0,
            d1=d1,
            edge_lengths=edge_lengths,
            face_areas=face_areas,
            dual_edge_lengths=dual_edge_lengths,
        )

    @classmethod
    def rectangle(cls, nx: int, ny: int, dx: float = 1.0) -> "TriMesh":
        """Structured triangulated rectangle (the reference's
        generate_test_mesh, feec/cpu/mod.rs:84-110)."""
        xs = np.arange(nx + 1) * dx
        ys = np.arange(ny + 1) * dx
        gx, gy = np.meshgrid(xs, ys, indexing="ij")
        vertices = np.stack([gx.ravel(), gy.ravel(), np.zeros_like(gx).ravel()], 1)

        def vid(x, y):
            return x * (ny + 1) + y

        faces = []
        for x in range(nx):
            for y in range(ny):
                v = [vid(x, y), vid(x + 1, y), vid(x, y + 1), vid(x + 1, y + 1)]
                faces.append([v[0], v[1], v[2]])
                faces.append([v[1], v[3], v[2]])
        return cls.from_triangles(vertices, np.asarray(faces))

    # -- solver interface (shared with TetMesh) ------------------------------

    @property
    def star1(self) -> np.ndarray:
        """Diagonal Hodge on primal edges (E): dual length / primal length."""
        return self.dual_edge_lengths / self.edge_lengths

    @property
    def star2(self) -> np.ndarray:
        """Diagonal Hodge on primal faces (B): the 2-D dual of a face is a
        point, so the star is 1 / area."""
        return 1.0 / self.face_areas

    @property
    def num_edges(self) -> int:
        return len(self.edges)

    @property
    def num_faces(self) -> int:
        return len(self.faces)
