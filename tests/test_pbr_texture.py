"""Image-textured PBR materials (viz/texture.py + viz/pbr.py) — the
reference's albedo/ORM texture pipeline (LoadAlbedoTexture /
LoadMaterialTexture, cem-render/src/material.rs:484-620; texel x factor
composition, shader.wgsl:205-230; mip math, cem-util/src/wgpu/
image.rs:252-383; persistent mip cache, mipmap_cache.rs:43-102)."""

import numpy as np
import pytest

from fdtd_tpu.scene import Ball, Cuboid, Entity, Isometry, Scene
from fdtd_tpu.viz import Camera, PbrMaterial, render_pbr
from fdtd_tpu.viz.texture import (
    MipCache,
    Texture,
    checkerboard,
    load_texture,
    mip_level_count,
)


# -- mip math (image.rs:308-311 + tests :313-383) ---------------------------


def test_mip_level_count_matches_reference_math():
    # 1 + ilog2(max(w, h)); the reference's own unit tests' cases
    assert mip_level_count(1, 1) == 1
    assert mip_level_count(2, 2) == 2
    assert mip_level_count(256, 256) == 9
    assert mip_level_count(256, 64) == 9
    assert mip_level_count(100, 7) == 7  # ilog2(100)=6


def test_mip_chain_sizes_halve_to_one():
    t = Texture(np.zeros((64, 16, 3), np.float32))
    assert t.n_mips == 7
    sizes = [m.shape[:2] for m in t.mips]
    assert sizes[0] == (64, 16)
    assert sizes[1] == (32, 8)
    # max(1, c/2) floor at 1 (image.rs:266)
    assert sizes[-1] == (1, 1)
    assert sizes[5] == (2, 1)


def test_mip_downsample_is_box_filter():
    img = np.zeros((2, 2, 3), np.float32)
    img[0, 0] = 1.0
    t = Texture(img)
    assert np.allclose(t.mips[1][0, 0, :3], 0.25)


# -- sampling ----------------------------------------------------------------


def test_bilinear_exact_at_texel_centers():
    img = np.arange(12, dtype=np.float32).reshape(2, 2, 3) / 12.0
    t = Texture(img)
    # texel centers: u=(x+0.5)/w
    for yy in range(2):
        for xx in range(2):
            got = t.sample((xx + 0.5) / 2, (yy + 0.5) / 2)
            assert np.allclose(got[:3], img[yy, xx]), (yy, xx)


def test_repeat_wrap_and_clamp():
    img = np.zeros((1, 2, 3), np.float32)
    img[0, 1] = 1.0
    rep = Texture(img, wrap="repeat")
    # u=1.25 wraps to the same texel as u=0.25 (texel 0 center)
    assert np.allclose(rep.sample(1.25, 0.5), rep.sample(0.25, 0.5))
    cl = Texture(img, wrap="clamp")
    assert np.allclose(cl.sample(5.0, 0.5)[:3], 1.0)
    assert np.allclose(cl.sample(-5.0, 0.5)[:3], 0.0)


def test_srgb_decode_and_uint8():
    img = np.full((2, 2, 3), 128, np.uint8)
    lin = Texture(img, srgb=True).sample(0.5, 0.5)[:3]
    raw = Texture(img, srgb=False).sample(0.5, 0.5)[:3]
    assert np.allclose(raw, 128 / 255.0, atol=1e-6)
    # sRGB 0.502 -> linear ~0.2158
    assert np.allclose(lin, 0.2158, atol=2e-3)


def test_trilinear_blends_adjacent_mips():
    img = np.zeros((4, 4, 3), np.float32)
    img[:2, :2] = 1.0  # quadrant; mip1 2x2 has [1,0;0,0], mip2 1x1 = 0.25
    t = Texture(img)
    a = t.sample(0.25, 0.25, lod=1.0)[:3]
    b = t.sample(0.25, 0.25, lod=2.0)[:3]
    mid = t.sample(0.25, 0.25, lod=1.5)[:3]
    assert np.allclose(mid, 0.5 * (a + b), atol=1e-6)


def test_has_alpha_inference():
    rgb = Texture(np.zeros((2, 2, 3), np.float32))
    assert not rgb.has_alpha
    rgba = np.zeros((2, 2, 4), np.float32)
    rgba[..., 3] = 0.5
    assert Texture(rgba).has_alpha
    m = PbrMaterial.with_texture(Texture(rgba))
    assert m.transparent  # material.rs:533-539 inference
    assert not PbrMaterial.with_texture(rgb).transparent


# -- disk mip cache (mipmap_cache.rs:43-102) ---------------------------------


def test_mip_cache_round_trip(tmp_path):
    cache = MipCache(tmp_path)
    img = (np.random.default_rng(0).random((32, 32, 3)) * 255).astype(
        np.uint8)
    t1 = cache.create_texture(img, srgb=True)
    files = list(tmp_path.glob("*.npz"))
    assert len(files) == 1 and (tmp_path / "index.json").exists()
    # second open: same content loads the stored chain (no new files)
    cache2 = MipCache(tmp_path)
    t2 = cache2.create_texture(img, srgb=True)
    assert len(list(tmp_path.glob("*.npz"))) == 1
    assert t1.n_mips == t2.n_mips
    for a, b in zip(t1.mips, t2.mips):
        assert np.array_equal(a, b)
    # different content gets its own entry
    cache2.create_texture(img[::-1].copy(), srgb=True)
    assert len(list(tmp_path.glob("*.npz"))) == 2


def test_load_texture_png(tmp_path):
    import imageio.v3 as iio

    img = (checkerboard(4, 16).mips[0][..., :3] * 255).astype(np.uint8)
    p = tmp_path / "t.png"
    iio.imwrite(p, img)
    t = load_texture(p, srgb=False)
    assert t.shape == (16, 16) and t.n_mips == 5


# -- rendered output ----------------------------------------------------------


def _sphere_scene(mat):
    s = Scene()
    s.add(Entity(name="ball", shape=Ball(radius=1.0),
                 pose=Isometry(translation=(0.0, 0.0, 0.0)), visual=mat))
    cam = Camera.look_at((0.0, 0.0, 4.0), (0.0, 0.0, 0.0), fovy=0.8)
    return s, cam


def test_textured_sphere_shows_both_checker_colors():
    tex = checkerboard(6, 96, c0=(0.9, 0.1, 0.1), c1=(0.1, 0.1, 0.9))
    mat = PbrMaterial(albedo_texture=tex, roughness=0.9)
    scene, cam = _sphere_scene(mat)
    img = render_pbr(scene, cam, width=96, height=96)
    hit = img[..., 3] > 0.5
    assert hit.sum() > 300
    rgb = img[hit][:, :3]
    # both checker colors appear on the lit sphere: some hits clearly
    # red-dominant, others clearly blue-dominant
    red = (rgb[:, 0] > rgb[:, 2] * 1.5).sum()
    blue = (rgb[:, 2] > rgb[:, 0] * 1.5).sum()
    assert red > 20 and blue > 20, (red, blue)


def test_texture_multiplies_albedo_factor():
    # shader.wgsl:216 — albedo *= texel: a black factor kills the texture
    tex = checkerboard(4, 32, c0=(1.0, 1.0, 1.0), c1=(1.0, 1.0, 1.0))
    lit = PbrMaterial(albedo=(1.0, 1.0, 1.0, 1.0), albedo_texture=tex)
    dark = PbrMaterial(albedo=(0.0, 0.0, 0.0, 1.0), albedo_texture=tex)
    scene, cam = _sphere_scene(lit)
    bright = render_pbr(scene, cam, width=48, height=48)
    scene2, _ = _sphere_scene(dark)
    black = render_pbr(scene2, cam, width=48, height=48)
    hit = bright[..., 3] > 0.5
    assert bright[hit][:, :3].mean() > 0.1
    # specular-only remainder stays well below the textured render
    assert black[hit][:, :3].mean() < 0.5 * bright[hit][:, :3].mean()


def test_uv_orientation_on_cuboid_face():
    # 2x1 texture (texel 0 red, texel 1 green) on the +z face of a cube:
    # u follows local +x (red at -x, green at +x). Viewed from +z looking
    # back with up=+y, world +x is on the SCREEN LEFT, so the image shows
    # green left / red right — the mirror a physical camera would see.
    img = np.zeros((1, 2, 3), np.float32)
    img[0, 0] = (1.0, 0.0, 0.0)
    img[0, 1] = (0.0, 1.0, 0.0)
    tex = Texture(img, wrap="clamp")
    mat = PbrMaterial(albedo_texture=tex, shading=False, tone_map=False,
                      gamma=False)
    s = Scene()
    s.add(Entity(name="box", shape=Cuboid(half_extents=(1.0, 1.0, 1.0)),
                 visual=mat))
    cam = Camera.look_at((0.0, 0.0, 5.0), (0.0, 0.0, 0.0), fovy=0.6)
    img_out = render_pbr(s, cam, width=64, height=64)
    hit = img_out[..., 3] > 0.5
    cols = np.where(hit.any(axis=0))[0]
    mid = (cols.min() + cols.max()) // 2
    left = img_out[:, cols.min():mid][hit[:, cols.min():mid]]
    right = img_out[:, mid + 1:cols.max() + 1][hit[:, mid + 1:cols.max() + 1]]
    assert left[:, 1].mean() > left[:, 0].mean()    # screen left: green (+x)
    assert right[:, 0].mean() > right[:, 1].mean()  # screen right: red (-x)


def test_orm_material_texture_scales_roughness():
    # orm.g multiplies roughness (shader.wgsl:224-226): a rough vs
    # mirror-smooth metal sphere renders differently
    rough = np.ones((2, 2, 3), np.float32)
    # r=1, b=1 so only the g (roughness) channel deviates from identity
    smooth = np.ones((2, 2, 3), np.float32)
    smooth[..., 1] = 0.05
    base = dict(albedo=(1.0, 0.8, 0.4, 1.0), metalness=1.0, roughness=1.0)
    m_rough = PbrMaterial(material_texture=Texture(rough), **base)
    m_smooth = PbrMaterial(material_texture=Texture(smooth), **base)
    s1, cam = _sphere_scene(m_rough)
    s2, _ = _sphere_scene(m_smooth)
    a = render_pbr(s1, cam, width=48, height=48)
    b = render_pbr(s2, cam, width=48, height=48)
    assert not np.allclose(a, b, atol=1e-3)
    # channel gating: disabling g restores the rough render
    m_gated = PbrMaterial(material_texture=Texture(smooth),
                          material_channels=(True, False, True), **base)
    s3, _ = _sphere_scene(m_gated)
    c = render_pbr(s3, cam, width=48, height=48)
    d = render_pbr(_sphere_scene(PbrMaterial(**base))[0], cam,
                   width=48, height=48)
    assert np.allclose(c, d, atol=1e-6)


def test_alpha_threshold_discards_textured_fragments():
    # texel alpha 0 under the threshold -> fragment discarded, the
    # background shows through (shader.wgsl:233-236)
    rgba = np.ones((1, 2, 4), np.float32)
    rgba[0, 0, 3] = 0.0
    tex = Texture(rgba, wrap="clamp")
    mat = PbrMaterial(albedo_texture=tex, transparent=True,
                      alpha_threshold=0.5, shading=False)
    s = Scene()
    s.add(Entity(name="box", shape=Cuboid(half_extents=(1.0, 1.0, 0.1)),
                 visual=mat))
    cam = Camera.look_at((0.0, 0.0, 5.0), (0.0, 0.0, 0.0), fovy=0.6)
    img = render_pbr(s, cam, width=64, height=64,
                     background=(0.0, 0.0, 0.0, 0.0))
    hit = img[..., 3] > 0.5
    cols = np.where(hit.any(axis=0))[0]
    assert len(cols) > 0
    # the discarded (alpha-0) half leaves background alpha 0 there
    miss_cols = np.where(~hit.any(axis=0))[0]
    assert len(miss_cols) > len(img[0]) // 4


def test_untextured_render_unchanged_by_texture_plumbing():
    mat = PbrMaterial(albedo=(0.8, 0.3, 0.2, 1.0), roughness=0.4)
    scene, cam = _sphere_scene(mat)
    img = render_pbr(scene, cam, width=32, height=32)
    assert np.isfinite(img).all() and img.max() <= 1.0


def test_distant_sphere_uses_coarser_mips():
    # same sphere rendered tiny must still average both checker colors
    # (mip filtering prevents aliasing to one color)
    tex = checkerboard(16, 128, c0=(1.0, 0.0, 0.0), c1=(0.0, 0.0, 1.0))
    mat = PbrMaterial(albedo_texture=tex, shading=False, tone_map=False,
                      gamma=False)
    s = Scene()
    s.add(Entity(name="ball", shape=Ball(radius=1.0), visual=mat))
    cam = Camera.look_at((0.0, 0.0, 60.0), (0.0, 0.0, 0.0), fovy=0.8)
    img = render_pbr(s, cam, width=48, height=48)
    hit = img[..., 3] > 0.5
    assert hit.sum() > 0
    rgb = img[hit][:, :3]
    # filtered samples sit between the two pure colors
    assert (np.abs(rgb[:, 0] - rgb[:, 2]) < 0.9).any()
