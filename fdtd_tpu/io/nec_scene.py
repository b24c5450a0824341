"""NEC geometry -> scene entities.

Counterpart of PopulateWithNec (cem-app/src/composer/file_formats/nec.rs:
35-80): every wire segment becomes a cylinder entity. Unlike the reference
(which leaves all cylinders y-aligned with an identity rotation, losing the
wire direction), segments here are posed along the true transformed wire
axis. Default material is PEC — antennas voxelize as perfect conductors
(sigma -> inf handled by the coefficient table; BASELINE config 4).
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np

from ..material import PEC, Material
from ..scene import Cylinder, Entity, Isometry, Scene
from .nec import NecFile, Wire, WireArc

__all__ = ["populate_scene_with_nec"]


def _quat_from_y_to(v: np.ndarray):
    """Unit quaternion rotating +y onto unit vector v (w, x, y, z)."""
    y = np.array([0.0, 1.0, 0.0])
    d = float(y @ v)
    if d > 1.0 - 1e-12:
        return (1.0, 0.0, 0.0, 0.0)
    if d < -1.0 + 1e-12:
        return (0.0, 1.0, 0.0, 0.0)  # 180 deg about x
    axis = np.cross(y, v)
    w = 1.0 + d
    q = np.array([w, *axis])
    q = q / np.linalg.norm(q)
    return tuple(float(x) for x in q)


def populate_scene_with_nec(
    scene: Scene,
    nec: NecFile,
    material: Material = PEC,
    min_radius: float = 0.0,
) -> int:
    """Add cylinder entities per wire segment; returns the entity count.

    ``min_radius`` clamps thin wires up so they still voxelize on coarse
    lattices (a thin-wire subcell model is a future refinement).
    """
    count = 0
    for tag, geom in nec.geometry:
        spec = geom.spec
        if isinstance(spec, Wire):
            e1, e2 = spec.world_ends(geom.transform)
            delta = e2 - e1
            length = float(np.linalg.norm(delta))
            if length == 0.0:
                continue
            direction = delta / length
            pos = e1.astype(np.float64)
            for seg_len, r0, r1 in spec.segments.dimensions(spec.num_segments, length):
                radius = max(0.5 * (r0 + r1), min_radius)
                center = pos + direction * (0.5 * seg_len)
                scene.add(
                    Entity(
                        name=f"nec-wire-{tag}-{count}",
                        shape=Cylinder(half_height=0.5 * seg_len, radius=radius),
                        pose=Isometry(
                            translation=tuple(center),
                            rotation=_quat_from_y_to(direction),
                        ),
                        material=material,
                    )
                )
                pos = pos + direction * seg_len
                count += 1
        elif isinstance(spec, WireArc):
            # polyline the arc; each chord becomes a cylinder
            pts_local = spec.points()
            h = np.concatenate([pts_local, np.ones((len(pts_local), 1))], axis=1).T
            pts = (geom.transform @ h)[:3].T
            for a, b in zip(pts[:-1], pts[1:]):
                delta = b - a
                seg_len = float(np.linalg.norm(delta))
                if seg_len == 0.0:
                    continue
                direction = delta / seg_len
                radius = max(spec.wire_radius, min_radius)
                scene.add(
                    Entity(
                        name=f"nec-arc-{tag}-{count}",
                        shape=Cylinder(half_height=0.5 * seg_len, radius=radius),
                        pose=Isometry(
                            translation=tuple(a + 0.5 * delta),
                            rotation=_quat_from_y_to(direction),
                        ),
                        material=material,
                    )
                )
                count += 1
        # surface patches: voxelization support pending (reference todo!()s
        # them entirely, interpreter.rs surface_patch)
    return count
