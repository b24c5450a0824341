"""AABB bounding-volume hierarchy for scene spatial queries.

Counterpart of the reference's incremental BVH
(cem-scene/src/spatial/bvh.rs:35-130: cast_ray / intersect_aabb /
point_query over parry Qbvh). The reference maintains the tree
incrementally through ECS change-detection transactions
(bvh.rs:133-245); here scenes are built script-side and queried in
compile bursts, so the tree is a flat median-split snapshot rebuilt on
demand and cached against a pose fingerprint (Scene.bvh handles that) —
a rebuild is O(n log n) over entity count and is noise next to one
voxelization chunk.

Queries are vectorized batch-first: ``point_query`` classifies MANY
points per traversal step (one boolean mask per node visit, numpy all
the way down) instead of walking the tree once per point — the same
batch-over-scalar shape the solver uses on device.

Unbounded shapes (HalfSpace) have no AABB and are kept in an
``unbounded`` side list that every query also scans, mirroring the
reference's unbounded-collider handling (bvh.rs:38, 63-75).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

__all__ = ["Bvh"]


class Bvh:
    """Flat array-encoded BVH over (entity, aabb) leaves."""

    def __init__(self, entities: Sequence, aabbs=None):
        """``entities``: objects with world_aabb(); or pass precomputed
        ``aabbs`` aligned with entities (None entries = unbounded)."""
        if aabbs is None:
            aabbs = [e.world_aabb() for e in entities]
        self.entities = list(entities)
        self.unbounded: List[int] = [
            i for i, ab in enumerate(aabbs) if ab is None
        ]
        idx = [i for i, ab in enumerate(aabbs) if ab is not None]
        n = len(idx)
        self._n_leaves = n
        if n == 0:
            self.node_min = np.zeros((0, 3))
            self.node_max = np.zeros((0, 3))
            self.node_left = np.zeros(0, np.int64)
            self.node_right = np.zeros(0, np.int64)
            self.node_leaf = np.zeros(0, np.int64)
            return
        mins = np.stack([aabbs[i][0] for i in idx])
        maxs = np.stack([aabbs[i][1] for i in idx])
        ent = np.asarray(idx, np.int64)

        # median-split build, arrays preallocated at the 2n-1 node bound
        m = 2 * n - 1
        self.node_min = np.empty((m, 3))
        self.node_max = np.empty((m, 3))
        self.node_left = np.full(m, -1, np.int64)
        self.node_right = np.full(m, -1, np.int64)
        self.node_leaf = np.full(m, -1, np.int64)
        self._next = 0

        def build(sel: np.ndarray) -> int:
            i = self._next
            self._next += 1
            self.node_min[i] = mins[sel].min(axis=0)
            self.node_max[i] = maxs[sel].max(axis=0)
            if len(sel) == 1:
                self.node_leaf[i] = ent[sel[0]]
                return i
            centers = 0.5 * (mins[sel] + maxs[sel])
            axis = int(np.argmax(centers.max(axis=0) - centers.min(axis=0)))
            order = np.argsort(centers[:, axis], kind="stable")
            half = len(sel) // 2
            self.node_left[i] = build(sel[order[:half]])
            self.node_right[i] = build(sel[order[half:]])
            return i

        import sys

        limit = sys.getrecursionlimit()
        if n > limit // 4:
            sys.setrecursionlimit(4 * n + 64)
        try:
            build(np.arange(n))
        finally:
            sys.setrecursionlimit(limit)

    # -- queries ------------------------------------------------------------

    def point_query(self, points: np.ndarray) -> List[Tuple[int, np.ndarray]]:
        """Candidate (entity_index, mask) pairs: mask marks the points
        inside that entity's AABB (bvh.rs:120-130). points: (3, N)."""
        pts = points.reshape(3, -1).T  # (N, 3)
        out: List[Tuple[int, np.ndarray]] = []
        if self._n_leaves:
            all_idx = np.arange(pts.shape[0])
            stack = [(0, all_idx)]
            while stack:
                node, cand = stack.pop()
                p = pts[cand]
                inside = np.all(
                    (p >= self.node_min[node]) & (p <= self.node_max[node]),
                    axis=1,
                )
                cand = cand[inside]
                if cand.size == 0:
                    continue
                leaf = self.node_leaf[node]
                if leaf >= 0:
                    mask = np.zeros(pts.shape[0], bool)
                    mask[cand] = True
                    out.append((int(leaf), mask.reshape(points.shape[1:])))
                else:
                    stack.append((int(self.node_left[node]), cand))
                    stack.append((int(self.node_right[node]), cand))
        for i in self.unbounded:
            out.append(
                (i, np.ones(points.shape[1:], bool))
            )
        return out

    def intersect_aabb(
        self, mins: np.ndarray, maxs: np.ndarray
    ) -> List[int]:
        """Entity indices whose AABB intersects [mins, maxs]
        (bvh.rs:97-118). Unbounded entities always match."""
        hits: List[int] = []
        if self._n_leaves:
            stack = [0]
            while stack:
                node = stack.pop()
                if np.any(self.node_max[node] < mins) or np.any(
                    self.node_min[node] > maxs
                ):
                    continue
                leaf = self.node_leaf[node]
                if leaf >= 0:
                    hits.append(int(leaf))
                else:
                    stack.append(int(self.node_left[node]))
                    stack.append(int(self.node_right[node]))
        hits.extend(self.unbounded)
        return hits

    def ray_candidates(
        self, origin: np.ndarray, direction: np.ndarray, max_dist: float
    ) -> List[Tuple[int, float]]:
        """(entity_index, t_enter) pairs whose AABB the ray hits, sorted
        near-to-far — the traversal order of bvh.rs:54-95; the caller runs
        the narrow-phase primitive check and can stop early."""
        o = np.asarray(origin, np.float64)
        d = np.asarray(direction, np.float64)
        inv = np.where(np.abs(d) > 1e-300, 1.0 / np.where(d == 0, 1.0, d),
                       np.inf * np.where(d >= 0, 1.0, -1.0))
        hits: List[Tuple[int, float]] = []
        if self._n_leaves:
            stack = [0]
            while stack:
                node = stack.pop()
                t0 = (self.node_min[node] - o) * inv
                t1 = (self.node_max[node] - o) * inv
                near = np.minimum(t0, t1)
                far = np.maximum(t0, t1)
                # slab test; degenerate axes (d==0) handled by +/-inf
                with np.errstate(invalid="ignore"):
                    t_enter = np.nanmax(near)
                    t_exit = np.nanmin(far)
                if not (t_exit >= max(t_enter, 0.0)) or t_enter > max_dist:
                    continue
                leaf = self.node_leaf[node]
                if leaf >= 0:
                    hits.append((int(leaf), float(max(t_enter, 0.0))))
                else:
                    stack.append(int(self.node_left[node]))
                    stack.append(int(self.node_right[node]))
        hits.sort(key=lambda h: h[1])
        # unbounded shapes can be hit anywhere along the ray: front of list
        return [(i, 0.0) for i in self.unbounded] + hits
