"""Headless camera operations: fit / orbit / pan-tilt / pick.

Counterpart of the composer's camera proxy
(cem-app/src/composer/camera.rs:98-253 — shoot_ray, fit_to_scene,
fit_to_scene_looking_along_axis, point_to_scene_center) and the scene-view
drag handlers (composer/view.rs:179-203 — pan_tilt on primary drag,
translate_local on secondary), with the FOV-fit geometry of
cem-render/src/camera.rs:109-154. The GUI event plumbing is out of scope
(SURVEY §7 stage 8); everything below is the pure geometry, so a script
or notebook can drive the same viewpoint workflow the composer offers,
and `pick` rides the scene BVH exactly like the reference's RayCast.

Conventions match the reference (nalgebra face_towards): the camera looks
along its LOCAL +Z axis, +Y is up, screen coordinates are normalized
[-1, 1]^2 with +y up (view.rs:136-154). All methods are pure — they
return a new Camera.

One deliberate divergence: the reference computes the horizontal
half-FOV as fovy/2 / aspect (camera.rs:141), which is only correct for
aspect = 1 — tan, not the angle, scales with aspect. Here
tan(half_fovx) = tan(half_fovy) * aspect, so wide scenes actually fit.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import numpy as np

from ..scene.transform import Isometry, _quat_to_matrix

__all__ = ["Camera", "PickResult"]


def _matrix_to_quat(m: np.ndarray) -> Tuple[float, float, float, float]:
    """Rotation matrix -> unit quaternion (w, x, y, z)."""
    t = np.trace(m)
    if t > 0:
        s = math.sqrt(t + 1.0) * 2
        w = 0.25 * s
        x = (m[2, 1] - m[1, 2]) / s
        y = (m[0, 2] - m[2, 0]) / s
        z = (m[1, 0] - m[0, 1]) / s
    elif m[0, 0] > m[1, 1] and m[0, 0] > m[2, 2]:
        s = math.sqrt(1.0 + m[0, 0] - m[1, 1] - m[2, 2]) * 2
        w = (m[2, 1] - m[1, 2]) / s
        x = 0.25 * s
        y = (m[0, 1] + m[1, 0]) / s
        z = (m[0, 2] + m[2, 0]) / s
    elif m[1, 1] > m[2, 2]:
        s = math.sqrt(1.0 + m[1, 1] - m[0, 0] - m[2, 2]) * 2
        w = (m[0, 2] - m[2, 0]) / s
        x = (m[0, 1] + m[1, 0]) / s
        y = 0.25 * s
        z = (m[1, 2] + m[2, 1]) / s
    else:
        s = math.sqrt(1.0 + m[2, 2] - m[0, 0] - m[1, 1]) * 2
        w = (m[1, 0] - m[0, 1]) / s
        x = (m[0, 2] + m[2, 0]) / s
        y = (m[1, 2] + m[2, 1]) / s
        z = 0.25 * s
    q = np.array([w, x, y, z])
    q /= np.linalg.norm(q)
    return tuple(float(v) for v in q)


def _face_towards(direction: np.ndarray, up: np.ndarray) -> np.ndarray:
    """Rotation whose +Z axis points along ``direction`` (nalgebra
    UnitQuaternion::face_towards)."""
    z = np.asarray(direction, np.float64)
    z = z / np.linalg.norm(z)
    x = np.cross(np.asarray(up, np.float64), z)
    n = np.linalg.norm(x)
    if n < 1e-12:  # up collinear with direction: pick any orthogonal
        x = np.cross(np.array([1.0, 0.0, 0.0]), z)
        n = np.linalg.norm(x)
        if n < 1e-12:
            x = np.cross(np.array([0.0, 1.0, 0.0]), z)
            n = np.linalg.norm(x)
    x /= n
    y = np.cross(z, x)
    return np.stack([x, y, z], axis=1)


@dataclasses.dataclass(frozen=True)
class PickResult:
    """Entity under a screen point (view.rs:205-223
    EntityUnderPointer)."""

    entity: object
    distance: float
    point: Tuple[float, float, float]


@dataclasses.dataclass(frozen=True)
class Camera:
    """Perspective camera: world pose + vertical FOV + aspect."""

    pose: Isometry = Isometry()
    fovy: float = math.pi / 4  # camera.rs:158-160 default 45 deg
    aspect: float = 1.0

    # -- construction -------------------------------------------------------

    @classmethod
    def look_at(cls, eye, target, up=(0.0, 1.0, 0.0), *,
                fovy: float = math.pi / 4, aspect: float = 1.0) -> "Camera":
        eye = np.asarray(eye, np.float64)
        r = _face_towards(np.asarray(target, np.float64) - eye, up)
        return cls(
            pose=Isometry(translation=tuple(eye),
                          rotation=_matrix_to_quat(r)),
            fovy=fovy, aspect=aspect,
        )

    # -- frame --------------------------------------------------------------

    @property
    def position(self) -> np.ndarray:
        return np.asarray(self.pose.translation, np.float64)

    @property
    def rotation(self) -> np.ndarray:
        return _quat_to_matrix(self.pose.rotation)

    @property
    def forward(self) -> np.ndarray:
        return self.rotation[:, 2]

    @property
    def up(self) -> np.ndarray:
        return self.rotation[:, 1]

    @property
    def right(self) -> np.ndarray:
        return self.rotation[:, 0]

    # -- rays & picking -----------------------------------------------------

    def screen_ray(self, uv) -> Tuple[np.ndarray, np.ndarray]:
        """World (origin, unit direction) through normalized screen point
        ``uv`` in [-1, 1]^2, +y up (camera.rs:109-115 shoot_screen_ray
        transformed by the camera pose)."""
        u, v = float(uv[0]), float(uv[1])
        ty = math.tan(0.5 * self.fovy)
        tx = ty * self.aspect
        local = np.array([u * tx, v * ty, 1.0])
        d = self.rotation @ local
        return self.position, d / np.linalg.norm(d)

    def pick(self, scene, uv, max_dist: float = 1e6) -> Optional[PickResult]:
        """Entity under the screen point via the scene BVH ray-cast
        (camera.rs:98-123 shoot_ray + RayCast)."""
        o, d = self.screen_ray(uv)
        hit = scene.cast_ray(o, d, max_dist)
        if hit is None:
            return None
        e, t = hit
        return PickResult(entity=e, distance=t,
                          point=tuple(float(v) for v in o + t * d))

    # -- fitting ------------------------------------------------------------

    def distance_to_fit(self, half_extents, margin=(0.0, 0.0)) -> float:
        """Distance back from an AABB's center (camera-frame half-extents)
        to fit it in the FOV (camera.rs:135-154; horizontal fit corrected,
        see module docstring)."""
        hx, hy, hz = (float(v) for v in half_extents)
        mx, my = (float(v) for v in margin)
        ty = math.tan(0.5 * self.fovy)
        tx = ty * self.aspect
        return hz + max((hy + my) / ty, (hx + mx) / tx)

    def _scene_aabb(self, scene):
        ab = scene.world_aabb(lambda e: e.shape is not None)
        if ab is None:
            return None
        return ab

    def fit_to_scene(self, scene, margin=(0.0, 0.0)) -> "Camera":
        """Translate (only) so the whole scene fits the view
        (camera.rs:124-165: center on the camera-frame AABB, back off by
        the fit distance)."""
        ab = self._scene_aabb(scene)
        if ab is None:
            return self
        corners = np.array(
            [[x, y, z] for x in (ab[0][0], ab[1][0])
             for y in (ab[0][1], ab[1][1]) for z in (ab[0][2], ab[1][2])]
        )
        r = self.rotation
        cam = (corners - self.position) @ r  # camera-frame corner coords
        lo, hi = cam.min(axis=0), cam.max(axis=0)
        center_cam = 0.5 * (lo + hi)
        half = 0.5 * (hi - lo)
        center_cam[2] -= self.distance_to_fit(half, margin)
        new_pos = self.position + r @ center_cam
        return dataclasses.replace(
            self, pose=dataclasses.replace(
                self.pose, translation=tuple(float(v) for v in new_pos)
            )
        )

    def fit_to_scene_looking_along_axis(
        self, scene, axis, up=(0.0, 1.0, 0.0), margin=(0.0, 0.0)
    ) -> "Camera":
        """Reorient along ``axis`` and back off to fit (camera.rs:167-229;
        like the reference this rotates the world AABB rather than
        recomputing it in the rotated frame)."""
        ab = self._scene_aabb(scene)
        if ab is None:
            return self
        r = _face_towards(np.asarray(axis, np.float64), up)
        center = 0.5 * (ab[0] + ab[1])
        corners = np.array(
            [[x, y, z] for x in (ab[0][0], ab[1][0])
             for y in (ab[0][1], ab[1][1]) for z in (ab[0][2], ab[1][2])]
        )
        half = np.abs((corners - center) @ r).max(axis=0)
        cam = dataclasses.replace(
            self, pose=Isometry(translation=tuple(center),
                                rotation=_matrix_to_quat(r)),
        )
        d = cam.distance_to_fit(half, margin)
        new_pos = center - r[:, 2] * d
        return dataclasses.replace(
            cam, pose=dataclasses.replace(
                cam.pose, translation=tuple(float(v) for v in new_pos)
            )
        )

    def point_to_scene_center(self, scene) -> "Camera":
        """Re-aim at the scene center keeping the position
        (camera.rs:231-253, incl. the collinear-up fallback)."""
        ab = self._scene_aabb(scene)
        if ab is None:
            return self
        center = 0.5 * (ab[0] + ab[1])
        up = np.array([0.0, 1.0, 0.0])
        view = center - self.position
        if np.linalg.norm(np.cross(view, up)) < 1e-4 * np.linalg.norm(view):
            up = self.up  # looking straight up/down: keep the camera's up
        return Camera.look_at(self.position, center, up,
                              fovy=self.fovy, aspect=self.aspect)

    # -- interactive ops ----------------------------------------------------

    def pan_tilt(self, yaw: float, pitch: float,
                 up=(0.0, 1.0, 0.0)) -> "Camera":
        """Rotate in place: yaw about the WORLD up axis, pitch about the
        local right axis (view.rs:179-191 primary-drag pan_tilt)."""
        r = self.rotation
        ry = _axis_angle_matrix(np.asarray(up, np.float64), yaw)
        rp = _axis_angle_matrix(r[:, 0], pitch)
        new_r = rp @ ry @ r
        return dataclasses.replace(
            self, pose=dataclasses.replace(
                self.pose, rotation=_matrix_to_quat(new_r)
            )
        )

    def translate_local(self, delta) -> "Camera":
        """Move in the camera frame (view.rs:193-203 secondary-drag
        pan)."""
        d = self.rotation @ np.asarray(delta, np.float64)
        return dataclasses.replace(
            self, pose=dataclasses.replace(
                self.pose,
                translation=tuple(float(v) for v in self.position + d),
            )
        )

    def orbit(self, pivot, yaw: float, pitch: float,
              up=(0.0, 1.0, 0.0)) -> "Camera":
        """Rotate the camera AROUND a pivot, keeping it aimed there — the
        composer's missing scene-orbit (view.rs:124-125 todo)."""
        p = np.asarray(pivot, np.float64)
        ry = _axis_angle_matrix(np.asarray(up, np.float64), yaw)
        rp = _axis_angle_matrix(self.right, pitch)
        new_pos = p + rp @ (ry @ (self.position - p))
        return Camera.look_at(new_pos, p, up,
                              fovy=self.fovy, aspect=self.aspect)

    def zoom(self, factor: float, pivot=None) -> "Camera":
        """Dolly toward (factor < 1) or away from (> 1) the pivot — the
        composer's unimplemented zoom event (view.rs:124-126 todo).
        Default pivot: one unit ahead along the view axis."""
        p = (np.asarray(pivot, np.float64) if pivot is not None
             else self.position + self.forward)
        new_pos = p + (self.position - p) * float(factor)
        return dataclasses.replace(
            self, pose=dataclasses.replace(
                self.pose,
                translation=tuple(float(v) for v in new_pos),
            )
        )


def _axis_angle_matrix(axis: np.ndarray, angle: float) -> np.ndarray:
    a = np.asarray(axis, np.float64)
    a = a / np.linalg.norm(a)
    c, s = math.cos(angle), math.sin(angle)
    k = np.array([[0, -a[2], a[1]], [a[2], 0, -a[0]], [-a[1], a[0], 0]])
    return np.eye(3) * c + s * k + (1 - c) * np.outer(a, a)
