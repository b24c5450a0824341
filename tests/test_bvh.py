"""Scene BVH (scene/bvh.py) vs brute-force ground truth.

The acceleration structure must be invisible: every query agrees with a
linear scan over the same entities (the reference's Qbvh-backed queries,
cem-scene/src/spatial/bvh.rs:54-130)."""

import numpy as np
import pytest

import fdtd_tpu as ft
from fdtd_tpu.scene import Scene
from fdtd_tpu.scene.bvh import Bvh
from fdtd_tpu.scene.shapes import Ball, Cuboid, Cylinder, HalfSpace
from fdtd_tpu.scene.transform import Isometry


def _random_scene(n=40, seed=0):
    rng = np.random.default_rng(seed)
    scene = Scene()
    for i in range(n):
        kind = i % 3
        if kind == 0:
            shape = Ball(float(rng.uniform(0.3, 1.5)))
        elif kind == 1:
            shape = Cuboid(tuple(rng.uniform(0.3, 1.5, 3)))
        else:
            shape = Cylinder(float(rng.uniform(0.3, 1.0)),
                             float(rng.uniform(0.3, 1.5)))
        pose = Isometry.from_axis_angle(
            rng.normal(size=3), float(rng.uniform(0, 3)),
            translation=tuple(rng.uniform(-8, 8, 3)),
        )
        scene.spawn(name=f"e{i}", shape=shape, pose=pose,
                    material=ft.VACUUM)
    return scene, rng


def test_point_query_matches_brute_force():
    scene, rng = _random_scene()
    pts = rng.uniform(-9, 9, size=(3, 500))
    got = {id(e): m for e, m in scene.point_query(pts)}
    for e in scene.shaped_entities():
        np.testing.assert_array_equal(
            got[id(e)], e.contains_world(pts), err_msg=e.name
        )


def test_point_query_with_halfspace():
    scene, rng = _random_scene(n=6, seed=3)
    scene.spawn(name="ground", shape=HalfSpace((0.0, 0.0, 1.0)),
                pose=Isometry.from_translation((0, 0, -5.0)))
    pts = rng.uniform(-9, 9, size=(3, 200))
    got = {id(e): m for e, m in scene.point_query(pts)}
    for e in scene.shaped_entities():
        np.testing.assert_array_equal(
            got[id(e)], e.contains_world(pts), err_msg=e.name or "ground"
        )


def test_cast_ray_matches_brute_force():
    scene, rng = _random_scene(n=30, seed=1)

    def brute(o, d, max_dist=1e6):
        d = d / np.linalg.norm(d)
        best = None
        for e in scene.shaped_entities():
            pose = e.global_pose()
            t = 0.0
            for _ in range(256):
                p = (o + t * d).reshape(3, 1)
                dist = float(e.shape.sdf(pose.inverse_apply(p))[0])
                if dist < 1e-9:
                    if best is None or t < best[1]:
                        best = (e, t)
                    break
                t += max(dist, 1e-6)
                if t > max_dist:
                    break
        return best

    for i in range(25):
        o = rng.uniform(-10, 10, 3)
        d = rng.normal(size=3)
        got = scene.cast_ray(o, d)
        ref = brute(o, d)
        if ref is None:
            assert got is None, f"ray {i}"
        else:
            assert got is not None, f"ray {i}"
            assert got[0] is ref[0], f"ray {i}: {got[0].name} != {ref[0].name}"
            assert abs(got[1] - ref[1]) < 1e-6, f"ray {i}"


def test_intersect_aabb_is_conservative_and_tight():
    scene, rng = _random_scene(n=25, seed=2)
    shaped = scene.shaped_entities()
    bvh = scene.bvh()
    for _ in range(20):
        lo = rng.uniform(-9, 5, 3)
        hi = lo + rng.uniform(0.5, 5, 3)
        hits = set(bvh.intersect_aabb(lo, hi))
        for i, e in enumerate(shaped):
            ab = e.world_aabb()
            overlaps = not (np.any(ab[1] < lo) or np.any(ab[0] > hi))
            if overlaps:
                assert i in hits, f"missed overlap {e.name}"
            else:
                assert i not in hits, f"false hit {e.name}"


def test_bvh_cache_invalidates_on_mutation():
    scene, _ = _random_scene(n=5)
    b1 = scene.bvh()
    assert scene.bvh() is b1  # cached
    scene.spawn(name="new", shape=Ball(1.0),
                pose=Isometry.from_translation((20.0, 0, 0)))
    b2 = scene.bvh()
    assert b2 is not b1
    pts = np.array([[20.0], [0.0], [0.0]])
    hits = [e.name for e, m in scene.point_query(pts) if m.any()]
    assert "new" in hits
    # pose mutation also invalidates (entities are mutable dataclasses)
    scene.entities[-1].pose = Isometry.from_translation((-20.0, 0, 0))
    hits = [e.name for e, m in scene.point_query(pts) if m.any()]
    assert "new" not in hits


def test_empty_and_single_entity_scenes():
    scene = Scene()
    assert scene.point_query(np.zeros((3, 4))) == []
    assert scene.cast_ray((0, 0, 0), (1, 0, 0)) is None
    scene.spawn(shape=Ball(1.0))
    (e, m), = scene.point_query(np.zeros((3, 1)))
    assert m.all()
    hit = scene.cast_ray((-5.0, 0, 0), (1, 0, 0))
    assert hit is not None and abs(hit[1] - 4.0) < 1e-6
