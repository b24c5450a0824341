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
from ..scene import Cylinder, Entity, Isometry, Quad, Scene
from .nec import NecFile, SurfacePatch, Wire, WireArc

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


def _quat_from_basis(u: np.ndarray, v: np.ndarray, n: np.ndarray):
    """Unit quaternion (w, x, y, z) for the rotation with columns
    [u v n] (orthonormal, right-handed) — maps local x/y/z onto them."""
    m = np.stack([u, v, n], axis=1)
    tr = float(np.trace(m))
    if tr > 0:
        s = math.sqrt(tr + 1.0) * 2
        q = (0.25 * s, (m[2, 1] - m[1, 2]) / s, (m[0, 2] - m[2, 0]) / s,
             (m[1, 0] - m[0, 1]) / s)
    elif m[0, 0] >= m[1, 1] and m[0, 0] >= m[2, 2]:
        s = math.sqrt(1.0 + m[0, 0] - m[1, 1] - m[2, 2]) * 2
        q = ((m[2, 1] - m[1, 2]) / s, 0.25 * s,
             (m[0, 1] + m[1, 0]) / s, (m[0, 2] + m[2, 0]) / s)
    elif m[1, 1] >= m[2, 2]:
        s = math.sqrt(1.0 + m[1, 1] - m[0, 0] - m[2, 2]) * 2
        q = ((m[0, 2] - m[2, 0]) / s, (m[0, 1] + m[1, 0]) / s,
             0.25 * s, (m[1, 2] + m[2, 1]) / s)
    else:
        s = math.sqrt(1.0 + m[2, 2] - m[0, 0] - m[1, 1]) * 2
        q = ((m[1, 0] - m[0, 1]) / s, (m[0, 2] + m[2, 0]) / s,
             (m[1, 2] + m[2, 1]) / s, 0.25 * s)
    q = np.asarray(q)
    q = q / np.linalg.norm(q)
    return tuple(float(x) for x in q)


def _patch_entity(spec: SurfacePatch, transform: np.ndarray,
                  material: Material, name: str, half_thickness: float):
    """SP/SC surface patch -> thin Quad entity (PEC by default).

    Goes beyond the reference, whose interpreter todo!()s patches
    entirely (nec-file/src/interpreter.rs surface_patch). Rectangular
    patches map exactly; quadrilaterals are treated as the parallelogram
    spanned by (v2-v1, v4-v1) (exact for planar parallelograms);
    triangles use their in-plane bounding rectangle (a voxelization
    overestimate, documented); arbitrary patches become a square of the
    declared area oriented by the elevation/azimuth normal."""
    lin = transform[:3, :3]

    def xf(p):
        return (transform @ np.array([*p, 1.0]))[:3]

    if spec.kind == "arbitrary":
        if spec.position is None:
            return None
        center = xf(spec.position)
        el = math.radians(spec.elevation_angle)
        az = math.radians(spec.azimuth_angle)
        n = lin @ np.array([
            math.cos(el) * math.cos(az),
            math.cos(el) * math.sin(az),
            math.sin(el),
        ])
        n = n / (np.linalg.norm(n) or 1.0)
        # any in-plane basis
        a = np.array([1.0, 0.0, 0.0])
        if abs(float(n @ a)) > 0.9:
            a = np.array([0.0, 1.0, 0.0])
        u = np.cross(n, a)
        u /= np.linalg.norm(u)
        v = np.cross(n, u)
        half = 0.5 * math.sqrt(max(spec.patch_area, 0.0))
        if half == 0.0:
            return None
        hu = hv = half
    else:
        vs = [xf(p) for p in spec.vertices]
        if spec.kind == "rectangular" and len(vs) >= 3:
            e_u, e_v = vs[1] - vs[0], vs[2] - vs[1]
            center = 0.5 * (vs[0] + vs[2])
        elif spec.kind == "quadrilateral" and len(vs) >= 4:
            e_u, e_v = vs[1] - vs[0], vs[3] - vs[0]
            center = vs[0] + 0.5 * (e_u + e_v)
        elif spec.kind == "triangular" and len(vs) >= 3:
            e_u, e_v = vs[1] - vs[0], vs[2] - vs[0]
            center = None  # set from in-plane bounds below
        else:
            return None
        nu = np.linalg.norm(e_u)
        if nu == 0.0:
            return None
        u = e_u / nu
        n = np.cross(e_u, e_v)
        nn = np.linalg.norm(n)
        if nn == 0.0:
            return None
        n = n / nn
        v = np.cross(n, u)
        if spec.kind == "triangular":
            pu = [float(u @ (p - vs[0])) for p in vs]
            pv = [float(v @ (p - vs[0])) for p in vs]
            hu = 0.5 * (max(pu) - min(pu))
            hv = 0.5 * (max(pv) - min(pv))
            center = (vs[0] + u * 0.5 * (max(pu) + min(pu))
                      + v * 0.5 * (max(pv) + min(pv)))
        else:
            hu = 0.5 * nu
            hv = 0.5 * float(np.linalg.norm(e_v))
        if hu == 0.0 or hv == 0.0:
            return None
    return Entity(
        name=name,
        shape=Quad(half_extents=(float(hu), float(hv)),
                   half_thickness=half_thickness),
        pose=Isometry(translation=tuple(float(c) for c in center),
                      rotation=_quat_from_basis(u, v, n)),
        material=material,
    )


def populate_scene_with_nec(
    scene: Scene,
    nec: NecFile,
    material: Material = PEC,
    min_radius: float = 0.0,
    patch_half_thickness: float = 0.5,
) -> int:
    """Add cylinder entities per wire segment and thin Quad entities per
    surface patch; returns the entity count.

    ``min_radius`` clamps thin wires up so they still voxelize on coarse
    lattices (a thin-wire subcell model is a future refinement);
    ``patch_half_thickness`` is the patches' containment half-thickness
    (~dx/2 captures one cell layer, see scene.shapes.Quad).
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
        elif isinstance(spec, SurfacePatch):
            ent = _patch_entity(
                spec, geom.transform, material,
                f"nec-patch-{tag}-{count}", patch_half_thickness,
            )
            if ent is not None:
                scene.add(ent)
                count += 1
    return count
