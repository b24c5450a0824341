"""Tetrahedral meshes for the 3-D FEEC/DEC solver.

Counterpart of the reference's volume-mesh skeleton
(cem-solver/src/feec/simplex/volume_mesh.rs:1-45 — vertices/edges/faces/
cells with incidence links, but no operators, no geometry, no solver).
Here the mesh carries the full signed chain complex

    d0 : vertices -> edges   (gradient)
    d1 : edges    -> faces   (curl)
    d2 : faces    -> tets    (divergence)

with d1 @ d0 == 0 and d2 @ d1 == 0 exactly (tested), plus the geometric
quantities for diagonal Hodge stars with a barycentric dual:

    star1[e] = dual_face_area(e)  / edge_length(e)   (E lives on edges)
    star2[f] = dual_edge_length(f) / face_area(f)    (B lives on faces)

Orientation conventions: an edge (a < b) points a -> b; a face is its
sorted vertex triple (a < b < c) traversed in that order; a tet is ordered
so its signed volume is positive, and d2 signs come from the simplicial
boundary  d[v0 v1 v2 v3] = [v1v2v3] - [v0v2v3] + [v0v1v3] - [v0v1v2]
composed with the parity of each face triple against its sorted order.

The operators are dense f64 ndarrays: at the mesh sizes a simplicial
cavity solver sees (10^2-10^4 simplices) dense matmuls ARE the TPU-native
representation — each leapfrog half-step is one MXU matmul (see
solver.py docstring).
"""

from __future__ import annotations

import dataclasses
import itertools
from typing import Dict, List, Tuple

import numpy as np

__all__ = ["TetMesh"]


def _parity(perm) -> int:
    """+1 / -1 parity of a permutation given as a tuple of distinct ints."""
    p = list(perm)
    sign = 1
    for i in range(len(p)):
        while p[i] != i:
            j = p[i]
            p[i], p[j] = p[j], p[i]
            sign = -sign
    return sign


def _face_sign(tri: Tuple[int, int, int]) -> int:
    """Parity of `tri` against its sorted order."""
    order = tuple(sorted(range(3), key=lambda i: tri[i]))
    return _parity(order)


@dataclasses.dataclass(frozen=True)
class TetMesh:
    """vertices (nv, 3); tets (nt, 4) positively-oriented vertex indices;
    faces (nf, 3) sorted triples; edges (ne, 2) sorted pairs; d0/d1/d2
    signed incidence; primal measures and barycentric-dual measures."""

    vertices: np.ndarray
    tets: np.ndarray
    faces: np.ndarray
    edges: np.ndarray
    d0: np.ndarray  # (ne, nv)
    d1: np.ndarray  # (nf, ne)
    d2: np.ndarray  # (nt, nf)
    edge_lengths: np.ndarray  # (ne,)
    face_areas: np.ndarray  # (nf,)
    tet_volumes: np.ndarray  # (nt,)
    dual_face_areas: np.ndarray  # (ne,) barycentric
    dual_edge_lengths: np.ndarray  # (nf,) barycentric

    # -- construction --------------------------------------------------------

    @classmethod
    def from_tets(cls, vertices, tets) -> "TetMesh":
        vertices = np.asarray(vertices, np.float64)
        tets = np.asarray(tets, np.int64).copy()
        nv = len(vertices)
        nt = len(tets)

        # orient every tet positively (swap one pair if the signed volume
        # is negative) so d2 signs are consistent
        p = vertices[tets]
        vol6 = np.einsum(
            "ij,ij->i",
            np.cross(p[:, 1] - p[:, 0], p[:, 2] - p[:, 0]),
            p[:, 3] - p[:, 0],
        )
        flip = vol6 < 0
        tets[flip] = tets[flip][:, [0, 1, 3, 2]]
        tet_volumes = np.abs(vol6) / 6.0
        if np.any(tet_volumes <= 0):
            raise ValueError("degenerate tetrahedron (zero volume)")

        # unique sorted faces and edges
        face_index: Dict[Tuple[int, int, int], int] = {}
        faces: List[Tuple[int, int, int]] = []
        edge_index: Dict[Tuple[int, int], int] = {}
        edges: List[Tuple[int, int]] = []
        for tet in tets:
            for tri in itertools.combinations(sorted(tet), 3):
                if tri not in face_index:
                    face_index[tri] = len(faces)
                    faces.append(tri)
            for pair in itertools.combinations(sorted(tet), 2):
                if pair not in edge_index:
                    edge_index[pair] = len(edges)
                    edges.append(pair)
        faces_a = np.asarray(faces, np.int64)
        edges_a = np.asarray(edges, np.int64)
        ne, nf = len(edges_a), len(faces_a)

        # d0: edge (v0 < v1): +1 at v1, -1 at v0 (same convention as TriMesh)
        d0 = np.zeros((ne, nv), np.float64)
        d0[np.arange(ne), edges_a[:, 1]] = 1.0
        d0[np.arange(ne), edges_a[:, 0]] = -1.0

        # d1: canonical face (a<b<c) boundary a->b, b->c, c->a
        d1 = np.zeros((nf, ne), np.float64)
        for fi, (a, b, c) in enumerate(faces_a):
            for u, v in ((a, b), (b, c), (c, a)):
                ei = edge_index[(min(u, v), max(u, v))]
                d1[fi, ei] = 1.0 if u < v else -1.0

        # d2: simplicial boundary of the positively-oriented tet, with each
        # face sign adjusted by the parity of its triple vs sorted order
        d2 = np.zeros((nt, nf), np.float64)
        for ti, tet in enumerate(tets):
            for k in range(4):
                tri = tuple(tet[j] for j in range(4) if j != k)
                fi = face_index[tuple(sorted(tri))]
                d2[ti, fi] = ((-1.0) ** k) * _face_sign(tri)

        edge_vec = vertices[edges_a[:, 1]] - vertices[edges_a[:, 0]]
        edge_lengths = np.linalg.norm(edge_vec, axis=1)

        fp = vertices[faces_a]
        face_areas = 0.5 * np.linalg.norm(
            np.cross(fp[:, 1] - fp[:, 0], fp[:, 2] - fp[:, 0]), axis=1
        )
        face_bary = fp.mean(axis=1)
        tet_bary = vertices[tets].mean(axis=1)
        edge_mid = 0.5 * (vertices[edges_a[:, 0]] + vertices[edges_a[:, 1]])

        # barycentric dual edge of a face: face barycenter -> barycenter of
        # each incident tet (boundary faces keep the single half-segment)
        dual_edge_lengths = np.zeros(nf, np.float64)
        # barycentric dual face of an edge: fan of triangles
        # (edge midpoint, incident-face barycenter, incident-tet barycenter),
        # two faces per (edge, tet) pair
        dual_face_areas = np.zeros(ne, np.float64)
        for ti, tet in enumerate(tets):
            stet = sorted(tet)
            for tri in itertools.combinations(stet, 3):
                fi = face_index[tri]
                dual_edge_lengths[fi] += np.linalg.norm(
                    tet_bary[ti] - face_bary[fi]
                )
                for pair in itertools.combinations(tri, 2):
                    ei = edge_index[pair]
                    tri_area = 0.5 * np.linalg.norm(
                        np.cross(
                            face_bary[fi] - edge_mid[ei],
                            tet_bary[ti] - edge_mid[ei],
                        )
                    )
                    dual_face_areas[ei] += tri_area

        return cls(
            vertices=vertices,
            tets=tets,
            faces=faces_a,
            edges=edges_a,
            d0=d0,
            d1=d1,
            d2=d2,
            edge_lengths=edge_lengths,
            face_areas=face_areas,
            tet_volumes=tet_volumes,
            dual_face_areas=dual_face_areas,
            dual_edge_lengths=dual_edge_lengths,
        )

    @classmethod
    def box(cls, nx: int, ny: int, nz: int, dx: float = 1.0) -> "TetMesh":
        """Structured box: each cube split into 6 tets around its main
        diagonal (Freudenthal/Kuhn subdivision — every tet contains the
        diagonal v(i,j,k) -> v(i+1,j+1,k+1), one per axis permutation)."""
        xs = np.arange(nx + 1) * dx
        ys = np.arange(ny + 1) * dx
        zs = np.arange(nz + 1) * dx
        gx, gy, gz = np.meshgrid(xs, ys, zs, indexing="ij")
        vertices = np.stack([gx.ravel(), gy.ravel(), gz.ravel()], 1)

        def vid(i, j, k):
            return (i * (ny + 1) + j) * (nz + 1) + k

        axes = np.eye(3, dtype=np.int64)
        tets = []
        for i in range(nx):
            for j in range(ny):
                for k in range(nz):
                    base = np.array([i, j, k], np.int64)
                    for perm in itertools.permutations(range(3)):
                        c = [base.copy()]
                        for ax in perm:
                            c.append(c[-1] + axes[ax])
                        tets.append([vid(*v) for v in c])
        return cls.from_tets(vertices, np.asarray(tets, np.int64))

    # -- solver interface (mirrors TriMesh) ----------------------------------

    @property
    def star1(self) -> np.ndarray:
        """Diagonal Hodge on primal edges (E): dual-face area / edge length."""
        return self.dual_face_areas / self.edge_lengths

    @property
    def star2(self) -> np.ndarray:
        """Diagonal Hodge on primal faces (B): dual-edge length / face area."""
        return self.dual_edge_lengths / self.face_areas

    @property
    def num_edges(self) -> int:
        return len(self.edges)

    @property
    def num_faces(self) -> int:
        return len(self.faces)

    @property
    def num_tets(self) -> int:
        return len(self.tets)

    def boundary_faces(self) -> np.ndarray:
        """Indices of faces incident to exactly one tet."""
        return np.flatnonzero(np.count_nonzero(self.d2, axis=0) == 1)

    def boundary_edges(self) -> np.ndarray:
        """Indices of edges lying on the boundary surface (edges of any
        boundary face). For a PEC cavity these carry the tangential-E = 0
        constraint."""
        bf = self.boundary_faces()
        on = np.zeros(self.num_edges, bool)
        for fi in bf:
            on[np.flatnonzero(self.d1[fi])] = True
        return np.flatnonzero(on)

    def interior_edges(self) -> np.ndarray:
        mask = np.ones(self.num_edges, bool)
        mask[self.boundary_edges()] = False
        return np.flatnonzero(mask)

    # -- Whitney (Galerkin) Hodge operators -----------------------------------

    def whitney_masses(self) -> Tuple[np.ndarray, np.ndarray]:
        """Lowest-order Whitney-form mass matrices (M1, M2): M1 on edges
        (Nedelec first kind, W_(ab) = la grad(lb) - lb grad(la)) and M2 on
        faces (Raviart-Thomas, W_(abc) = 2(la gb x gc + lb gc x ga +
        lc ga x gb)), assembled per tet with the exact barycentric
        integrals  int la lb dV = V/20 (a != b), V/10 (a == b).

        These are the consistent Hodge stars FEEC is named for: the
        diagonal barycentric stars above do NOT converge for the Maxwell
        eigenproblem on Kuhn/Freudenthal meshes (~-23% at any n, measured),
        while the Whitney pair converges at O(h^2) (tests/test_feec.py).
        Face forms use the sorted-triple (a<b<c) cyclic orientation, the
        same convention as d1/d2, so both tets sharing a face assemble
        compatibly."""
        edge_index = {tuple(e): i for i, e in enumerate(self.edges)}
        face_index = {tuple(f): i for i, f in enumerate(self.faces)}
        ne, nf = self.num_edges, self.num_faces
        m1 = np.zeros((ne, ne), np.float64)
        m2 = np.zeros((nf, nf), np.float64)

        for tet, vol in zip(self.tets, self.tet_volumes):
            p = self.vertices[tet]
            a4 = np.hstack([np.ones((4, 1)), p])
            coef = np.linalg.inv(a4)  # lambda_i(x) = coef[0,i] + coef[1:,i].x
            grad = coef[1:, :].T  # (4, 3), rows follow the tet vertex order
            lint = np.full((4, 4), vol / 20.0)
            np.fill_diagonal(lint, vol / 10.0)
            loc = {int(v): i for i, v in enumerate(tet)}

            ledges = list(itertools.combinations(sorted(tet), 2))
            gdot = grad @ grad.T  # (4, 4)
            for a, b in ledges:
                i = edge_index[(a, b)]
                la, lb = loc[a], loc[b]
                for c, d in ledges:
                    j = edge_index[(c, d)]
                    lc, ld = loc[c], loc[d]
                    m1[i, j] += (
                        gdot[lb, ld] * lint[la, lc]
                        - gdot[lb, lc] * lint[la, ld]
                        - gdot[la, ld] * lint[lb, lc]
                        + gdot[la, lc] * lint[lb, ld]
                    )

            lfaces = list(itertools.combinations(sorted(tet), 3))
            # face coefficient vectors: W_f = 2 sum_u lambda_u * cvec[u]
            cvecs = []
            for a, b, c in lfaces:
                la, lb, lc = loc[a], loc[b], loc[c]
                cvecs.append((
                    (la, np.cross(grad[lb], grad[lc])),
                    (lb, np.cross(grad[lc], grad[la])),
                    (lc, np.cross(grad[la], grad[lb])),
                ))
            for (tri_i, ci) in zip(lfaces, cvecs):
                i = face_index[tri_i]
                for (tri_j, cj) in zip(lfaces, cvecs):
                    j = face_index[tri_j]
                    s = 0.0
                    for lu, cu in ci:
                        for lv, cv in cj:
                            s += (cu @ cv) * lint[lu, lv]
                    m2[i, j] += 4.0 * s
        return m1, m2

    def curl_curl_eigenvalues(self, eps: float = 1.0, mu: float = 1.0,
                              pec: bool = True,
                              hodge: str = "whitney") -> np.ndarray:
        """Eigenvalues omega^2 of the Maxwell curl-curl operator (the
        generalized problem d1^T H2 d1 x = omega^2 eps mu H1 x), restricted
        to interior edges when ``pec`` (tangential E = 0 on the boundary).
        ``hodge`` picks H1/H2: "whitney" (consistent, converges) or
        "diagonal" (barycentric DEC stars — kept for comparison; does not
        converge on Kuhn meshes). The nullspace (discrete gradients) comes
        out as ~0 eigenvalues — filter on the caller side."""
        idx = self.interior_edges() if pec else np.arange(self.num_edges)
        d1 = self.d1[:, idx]
        if hodge == "whitney":
            m1, m2 = self.whitney_masses()
            a = d1.T @ m2 @ d1 / (eps * mu)
            b = m1[np.ix_(idx, idx)]
            # symmetric-definite reduction: B = L L^T, C = L^-1 A L^-T
            low = np.linalg.cholesky(b)
            c = np.linalg.solve(low, np.linalg.solve(low, a.T).T)
            return np.linalg.eigvalsh(0.5 * (c + c.T))
        s1 = self.star1[idx]
        s2 = self.star2
        a = d1.T @ (s2[:, None] * d1) / (eps * mu)
        rs = 1.0 / np.sqrt(s1)
        c = rs[:, None] * a * rs[None, :]
        return np.linalg.eigvalsh(0.5 * (c + c.T))
