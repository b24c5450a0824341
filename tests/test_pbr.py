"""Headless PBR renderer tests (viz/pbr.py vs the reference shading model,
cem-render/src/shader.wgsl:200-384 + material.rs:99-130).

Geometry is verified against analytic ray-sphere intersection; shading
properties (Lambert falloff, metal-tinted Fresnel, transparency
compositing, tone-map monotonicity) are checked as physics, not pixel
snapshots."""

import numpy as np
import pytest

from fdtd_tpu.scene.scene import Entity, Scene
from fdtd_tpu.scene.shapes import Ball, Cuboid
from fdtd_tpu.scene.transform import Isometry
from fdtd_tpu.viz import (
    MATERIAL_PRESETS,
    AmbientLight,
    Camera,
    PbrMaterial,
    PointLight,
    render_pbr,
    render_pbr_png,
)
from fdtd_tpu.viz.pbr import _aces_tone_map


def _sphere_scene(mat=None, radius=1.0):
    return Scene([Entity(name="ball", shape=Ball(radius), visual=mat)])


def _front_camera(aspect=1.0, dist=4.0):
    return Camera.look_at((0.0, 0.0, -dist), (0.0, 0.0, 0.0), aspect=aspect)


def test_silhouette_matches_analytic_ray_sphere():
    """Hit mask (alpha > 0) vs exact ray-sphere intersection through the
    same camera: mismatch only within a mesh-faceting ring."""
    cam = _front_camera()
    img = render_pbr(_sphere_scene(), cam, width=96, height=96)
    hit = img[..., 3] > 0.5

    o = cam.position
    analytic = np.zeros_like(hit)
    for i in range(96):
        for j in range(96):
            u = (j + 0.5) / 96 * 2 - 1
            v = 1 - (i + 0.5) / 96 * 2
            _, d = cam.screen_ray((u, v))
            b = np.dot(d, -o)
            c = np.dot(o, o) - 1.0
            analytic[i, j] = b * b - c >= 0
    # UV-sphere meshes inscribe the sphere: faceting only shrinks the
    # silhouette, so disagreement is a thin ring at the rim.
    agree = (hit == analytic).mean()
    assert agree > 0.97, agree
    assert not np.any(hit & ~analytic)  # mesh never exceeds the sphere


def test_background_and_alpha_channel():
    img = render_pbr(
        _sphere_scene(), _front_camera(), width=64, height=64,
        background=(0.1, 0.2, 0.3, 0.25),
    )
    assert np.allclose(img[0, 0], (0.1, 0.2, 0.3, 0.25), atol=1e-5)
    assert img[32, 32, 3] == pytest.approx(1.0)


def test_lambert_falloff_center_brighter_than_rim():
    """Camera-colocated light: N.L peaks at the silhouette center of a
    matte sphere and falls toward the rim (shader.wgsl:269-283)."""
    mat = PbrMaterial(albedo=(0.8, 0.8, 0.8, 1.0), roughness=1.0)
    img = render_pbr(
        _sphere_scene(mat), _front_camera(), width=96, height=96,
        ambient=None,
    )
    lum = img[..., :3].mean(axis=-1)
    center = lum[48, 48]
    rim = lum[48, 48 + 18]  # still on the sphere, near the rim
    assert img[48, 48 + 18, 3] == pytest.approx(1.0)
    assert center > rim > 0.0


def test_metal_specular_is_albedo_tinted():
    """metalness=1: F0 = albedo, k_d = 0 — everything reflected carries
    the metal tint (shader.wgsl:253, 329)."""
    img = render_pbr(
        _sphere_scene(MATERIAL_PRESETS["gold"]), _front_camera(),
        width=64, height=64, ambient=None,
    )
    hit = img[..., 3] > 0.5
    r, g, b = (img[..., k][hit] for k in range(3))
    assert np.all(r[r > 0.01] >= b[r > 0.01])
    assert r.max() > 2 * b.max() * 0.336 / 1.0  # tint survives tone map


def test_shading_false_gives_flat_albedo():
    mat = PbrMaterial(albedo=(0.25, 0.5, 0.75, 1.0), shading=False,
                      tone_map=False, gamma=False)
    img = render_pbr(_sphere_scene(mat), _front_camera(), width=48,
                     height=48)
    hit = img[..., 3] > 0.5
    assert np.allclose(img[hit][:, :3], (0.25, 0.5, 0.75), atol=1e-6)


def test_transparency_composites_front_to_back():
    """Transparent red sphere over an opaque blue wall: the center pixel
    blends both; removing the sphere leaves pure wall color."""
    wall = Entity(
        name="wall", shape=Cuboid((3.0, 3.0, 0.2)),
        pose=Isometry(translation=(0.0, 0.0, 2.0)),
        visual=PbrMaterial(albedo=(0.1, 0.1, 0.9, 1.0), tone_map=False,
                           gamma=False),
    )
    veil = Entity(
        name="veil", shape=Ball(1.0),
        visual=PbrMaterial(albedo=(0.9, 0.1, 0.1, 0.5), transparent=True,
                           tone_map=False, gamma=False),
    )
    cam = _front_camera()
    both = render_pbr(Scene([veil, wall]), cam, width=48, height=48)
    wall_only = render_pbr(Scene([wall]), cam, width=48, height=48)
    c_both = both[24, 24, :3]
    c_wall = wall_only[24, 24, :3]
    assert c_both[0] > c_wall[0]  # red from the veil
    assert 0.0 < c_both[2] < c_wall[2]  # blue attenuated but visible
    assert both[24, 24, 3] == pytest.approx(1.0)  # opaque wall behind


def test_alpha_threshold_discards_entity():
    mat = PbrMaterial(albedo=(1.0, 0.0, 0.0, 0.1), alpha_threshold=0.5)
    img = render_pbr(_sphere_scene(mat), _front_camera(), width=32,
                     height=32)
    assert np.all(img[..., 3] == 0.0)


def test_wireframe_overlay_paints_edges():
    mat = PbrMaterial(albedo=(0.5, 0.5, 0.5, 1.0),
                      wireframe=(1.0, 0.0, 1.0, 1.0))
    img = render_pbr(_sphere_scene(mat), _front_camera(), width=96,
                     height=96, ambient=None)
    magenta = (
        (np.abs(img[..., 0] - 1.0) < 1e-6)
        & (img[..., 1] < 1e-6)
        & (np.abs(img[..., 2] - 1.0) < 1e-6)
    )
    frac = magenta.mean()
    assert 0.005 < frac < 0.5  # edges present, not the whole surface


def test_materials_name_map_overrides_visual():
    mat_v = PbrMaterial(albedo=(1.0, 0.0, 0.0, 1.0), shading=False,
                        tone_map=False, gamma=False)
    mat_m = PbrMaterial(albedo=(0.0, 1.0, 0.0, 1.0), shading=False,
                        tone_map=False, gamma=False)
    img = render_pbr(
        _sphere_scene(mat_v), _front_camera(), width=32, height=32,
        materials={"ball": mat_m},
    )
    hit = img[..., 3] > 0.5
    assert np.allclose(img[hit][:, :3], (0.0, 1.0, 0.0), atol=1e-6)


def test_role_fallback_color_for_unstyled_entities():
    """Entities without a visual component render in their role hue, the
    same role → color mapping the matplotlib preview uses."""
    from fdtd_tpu.scene.scene import SourceSpec
    from fdtd_tpu.solver.sources import GaussianPulse

    e = Entity(name="src", shape=Ball(1.0),
               source=SourceSpec(waveform=GaussianPulse(1.0, 0.5)))
    img = render_pbr(Scene([e]), _front_camera(), width=32, height=32)
    hit = img[..., 3] > 0.5
    rgb = img[hit][:, :3]
    assert rgb[:, 0].mean() > rgb[:, 2].mean()  # source role is reddish


def test_aces_tone_map_properties():
    x = np.linspace(0.0, 8.0, 64)[:, None] * np.ones((1, 3))
    y = _aces_tone_map(x)
    assert np.all((y >= 0.0) & (y <= 1.0))
    grey = y[:, 0]
    assert np.all(np.diff(grey) >= -1e-6)  # monotone on greys
    assert grey[0] < 1e-3 and grey[-1] > 0.95  # maps 0→~0, large→~1


def test_empty_scene_returns_background():
    img = render_pbr(Scene([]), _front_camera(), width=16, height=16,
                     background=(0.0, 0.0, 0.0, 0.0))
    assert np.all(img == 0.0)


def test_render_pbr_png_writes_rgba_file(tmp_path):
    p = render_pbr_png(
        _sphere_scene(MATERIAL_PRESETS["copper"]), _front_camera(),
        tmp_path / "pbr.png", width=48, height=32,
    )
    assert p.exists()
    import imageio.v3 as iio

    back = iio.imread(p)
    assert back.shape == (32, 48, 4)
    assert back.dtype == np.uint8
