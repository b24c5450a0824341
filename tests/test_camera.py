"""Headless camera ops (viz/camera.py) + tree/selection (utils/inspect.py).

Geometry gates mirror the composer's camera proxy semantics
(cem-app/src/composer/camera.rs, view.rs): fit actually brings the whole
scene inside the FOV, picking agrees with the BVH ray-cast, orbit keeps
the pivot centered.
"""

import math

import numpy as np
import pytest

import fdtd_tpu as ft
from fdtd_tpu.scene import Scene
from fdtd_tpu.scene.shapes import Ball, Cuboid
from fdtd_tpu.scene.transform import Isometry
from fdtd_tpu.utils.inspect import Selection, scene_tree
from fdtd_tpu.viz.camera import Camera


def _scene():
    scene = Scene()
    scene.spawn(name="ball", shape=Ball(1.0),
                pose=Isometry.from_translation((3.0, 0.0, 0.0)))
    scene.spawn(name="box", shape=Cuboid((1.0, 1.0, 1.0)),
                pose=Isometry.from_translation((-3.0, 0.0, 0.0)))
    return scene


def _in_fov(cam, points):
    """True when every world point projects inside [-1,1]^2 with z>0."""
    r = cam.rotation
    local = (np.asarray(points) - cam.position) @ r
    if np.any(local[:, 2] <= 0):
        return False
    ty = math.tan(0.5 * cam.fovy)
    tx = ty * cam.aspect
    u = local[:, 0] / (local[:, 2] * tx)
    v = local[:, 1] / (local[:, 2] * ty)
    return bool(np.all(np.abs(u) <= 1 + 1e-9) and np.all(np.abs(v) <= 1 + 1e-9))


def _scene_corners(scene):
    ab = scene.world_aabb(lambda e: e.shape is not None)
    return np.array([[x, y, z] for x in (ab[0][0], ab[1][0])
                     for y in (ab[0][1], ab[1][1])
                     for z in (ab[0][2], ab[1][2])])


def test_look_at_frame():
    cam = Camera.look_at((0, 0, -10), (0, 0, 0))
    np.testing.assert_allclose(cam.forward, [0, 0, 1], atol=1e-12)
    np.testing.assert_allclose(cam.up, [0, 1, 0], atol=1e-12)
    o, d = cam.screen_ray((0.0, 0.0))
    np.testing.assert_allclose(o, [0, 0, -10])
    np.testing.assert_allclose(d, [0, 0, 1], atol=1e-12)


def test_fit_to_scene_contains_everything():
    scene = _scene()
    cam = Camera.look_at((0.3, 0.4, -5.0), (0.1, 0.0, 0.0), aspect=1.5)
    fitted = cam.fit_to_scene(scene)
    assert _in_fov(fitted, _scene_corners(scene))
    # orientation unchanged (fit only translates, camera.rs:124-131)
    np.testing.assert_allclose(fitted.forward, cam.forward, atol=1e-12)


def test_fit_along_axis_and_point_to_center():
    scene = _scene()
    cam = Camera().fit_to_scene_looking_along_axis(scene, (1.0, 0.0, 0.0))
    assert _in_fov(cam, _scene_corners(scene))
    np.testing.assert_allclose(cam.forward, [1, 0, 0], atol=1e-9)
    # move it, re-aim at the center
    moved = cam.translate_local((5.0, 2.0, -3.0)).point_to_scene_center(scene)
    center = 0.5 * (_scene_corners(scene).min(0) + _scene_corners(scene).max(0))
    view = center - moved.position
    np.testing.assert_allclose(
        moved.forward, view / np.linalg.norm(view), atol=1e-9
    )


def test_pick_hits_the_right_entity():
    scene = _scene()
    cam = Camera.look_at((3.0, 0.0, -10.0), (3.0, 0.0, 0.0))
    hit = cam.pick(scene, (0.0, 0.0))
    assert hit is not None and hit.entity.name == "ball"
    assert abs(hit.distance - 9.0) < 1e-6  # ball surface at z = -1
    assert cam.pick(scene, (0.9, 0.9)) is None  # empty corner


def test_orbit_keeps_pivot_centered():
    scene = _scene()
    cam = Camera.look_at((0.0, 0.0, -10.0), (0.0, 0.0, 0.0))
    for yaw, pitch in ((0.5, 0.0), (0.0, 0.4), (1.2, -0.3)):
        orb = cam.orbit((0.0, 0.0, 0.0), yaw, pitch)
        # pivot stays on the view axis and the distance is preserved
        np.testing.assert_allclose(
            np.linalg.norm(orb.position), 10.0, atol=1e-9
        )
        to_pivot = -orb.position
        np.testing.assert_allclose(
            orb.forward, to_pivot / np.linalg.norm(to_pivot), atol=1e-9
        )


def test_pan_tilt_and_zoom():
    cam = Camera.look_at((0.0, 0.0, -10.0), (0.0, 0.0, 0.0))
    turned = cam.pan_tilt(math.pi / 2, 0.0)
    np.testing.assert_allclose(turned.position, cam.position)
    np.testing.assert_allclose(turned.forward, [1, 0, 0], atol=1e-9)
    z = cam.zoom(0.5, pivot=(0.0, 0.0, 0.0))
    np.testing.assert_allclose(z.position, [0, 0, -5.0], atol=1e-12)


def test_scene_tree_and_selection():
    scene = _scene()
    parent = scene.entities[0]
    scene.spawn(name="child", shape=Ball(0.2), parent=parent,
                pose=Isometry.from_translation((0.0, 2.0, 0.0)))
    tree = scene_tree(scene)
    assert "- ball [Ball]" in tree
    assert "\n    - child" in tree  # nested one level under ball

    sel = Selection()
    assert sel.is_empty()
    sel.select_by_name(scene, "box")
    sel.toggle(scene.entities[0])
    assert sel.count() == 2
    sel.toggle(scene.entities[0])
    assert [e.name for e in sel.entities()] == ["box"]
    assert "box" in sel.describe()

    cam = Camera.look_at((3.0, 0.0, -10.0), (3.0, 0.0, 0.0))
    hit = sel.select_at(scene, cam, (0.0, 0.0))
    assert hit is not None
    assert [e.name for e in sel.entities()] == ["ball"]  # non-additive
    sel.select_at(scene, cam, (0.9, 0.9))
    assert sel.is_empty()  # clicking empty space clears
    sel.select_all(scene)
    assert sel.count() == len(scene.entities)


def test_preview_accepts_camera(tmp_path):
    """render_scene_preview(camera=...) frames the view from the Camera's
    orientation (the composer scene-view + camera-proxy pairing)."""
    from fdtd_tpu.viz.preview import render_scene_preview

    scene = _scene()
    cam = Camera.look_at((10.0, 10.0, 10.0), (0.0, 0.0, 0.0))
    p = render_scene_preview(scene, tmp_path / "view.png", camera=cam)
    assert p.exists() and p.stat().st_size > 1000
