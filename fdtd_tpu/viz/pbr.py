"""Headless PBR renderer: ray-traced Cook-Torrance shading to RGBA images.

Counterpart of the reference's PBR pipeline — the visual Material
component (cem-render/src/material.rs:82-130: albedo, metalness,
roughness, ambient_occlusion, transparency, shading/tone-map/gamma
toggles), the camera-colocated point light + ambient light
(cem-render/src/light.rs:28-44, shader.wgsl:264-283) and the fragment
shader's shading model (cem-render/src/shader.wgsl:200-384: Cook-Torrance
with Trowbridge-Reitz GGX NDF, Schlick-GGX Smith geometry, Schlick
Fresnel, F0 = mix(0.04, albedo, metalness), fixed attenuation 20.0, ACES
tone map, gamma correction) — re-hosted as a small ray tracer over the
same triangle meshes viz/mesh.py generates, so a TPU workflow gets real
shaded-material renders without a GPU window.

Rasterization is replaced by primary-ray casting: the intersection stage
is three (rays, triangles) matrix products (the Moller-Trumbore terms
reduce to dot products of the ray direction with per-triangle constant
vectors when all rays share the camera origin), so the hot loop is
batched dense linear algebra rather than a per-pixel scanline — the same
batch-over-scalar shape the solver uses. Transparency uses front-to-back
layered compositing over the K nearest hits (the depth-sorted alpha-blend
pass the reference's TODO asks for, material.rs:90-92).

Two deliberate divergences from the reference shader, both documented:

- shader.wgsl:336-340 computes the GGX denominator with ``a_2 = a * 2``
  — a typo for the Trowbridge-Reitz alpha^2 (the cited learnopengl
  derivation squares it). Here ``a2 = a * a`` (with a = roughness, the
  same parameterization the rest of shader.wgsl uses), so grazing
  highlights match the BRDF the shader names.
- Shading is two-sided (normals flipped toward the viewer): the
  reference culls back faces in the raster pipeline; a ray tracer sees
  interior faces of open meshes, and lighting them from the camera side
  matches what the raster image shows for watertight meshes.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

__all__ = [
    "AmbientLight",
    "PbrMaterial",
    "PointLight",
    "MATERIAL_PRESETS",
    "render_pbr",
    "render_pbr_png",
]

_EPS = 1e-7


@dataclasses.dataclass(frozen=True)
class PbrMaterial:
    """Visual surface properties (cem-render/src/material.rs:99-130).

    Only look, never physics — the EM ``Material`` lives on the same
    entity separately, exactly like the reference keeps the solver and
    render materials as distinct components."""

    albedo: Tuple[float, float, float, float] = (1.0, 1.0, 1.0, 1.0)
    metalness: float = 0.0
    roughness: float = 1.0
    ambient_occlusion: float = 1.0
    transparent: bool = False
    alpha_threshold: float = 0.0
    shading: bool = True
    tone_map: bool = True
    gamma: bool = True
    # Overlay color for triangle edges (the wireframe pipeline's
    # material.wireframe color, material.rs / shader.wgsl vs_main_wireframe);
    # None = no wireframe overlay.
    wireframe: Optional[Tuple[float, float, float, float]] = None
    # Image textures (viz/texture.py), MULTIPLIED into the factors above
    # exactly like the shader does (shader.wgsl:205-230): albedo texel
    # scales albedo.rgb and alpha; the ORM material texture's r/g/b
    # channels scale metalness/roughness/ambient_occlusion — gated per
    # channel like MaterialTextureFlags (material.rs:557-620). UVs are
    # analytic per shape (see _shape_uv); uv_scale tiles them.
    albedo_texture: Optional[object] = dataclasses.field(
        default=None, compare=False)
    material_texture: Optional[object] = dataclasses.field(
        default=None, compare=False)
    material_channels: Tuple[bool, bool, bool] = (True, True, True)
    uv_scale: Tuple[float, float] = (1.0, 1.0)

    @classmethod
    def from_albedo(cls, r, g, b, a=1.0) -> "PbrMaterial":
        """material.rs:133-143 — transparency inferred from alpha."""
        return cls(albedo=(float(r), float(g), float(b), float(a)),
                   transparent=float(a) < 1.0)

    @classmethod
    def with_texture(cls, texture, *, transparent: Optional[bool] = None,
                     **kwargs) -> "PbrMaterial":
        """LoadAlbedoTexture semantics (material.rs:490-539): when
        ``transparent`` is unspecified it is inferred from the image
        having alpha content."""
        if transparent is None:
            transparent = texture.has_alpha
        return cls(albedo_texture=texture, transparent=transparent,
                   **kwargs)


# The reference pulls these from the public pbr_presets crate
# (material.rs:58-79); the values are the standard measured linear-space
# F0/albedo constants for common metals.
MATERIAL_PRESETS: Dict[str, PbrMaterial] = {
    "gold": PbrMaterial(albedo=(1.0, 0.766, 0.336, 1.0), metalness=1.0,
                        roughness=0.3),
    "silver": PbrMaterial(albedo=(0.972, 0.960, 0.915, 1.0), metalness=1.0,
                          roughness=0.25),
    "copper": PbrMaterial(albedo=(0.955, 0.637, 0.538, 1.0), metalness=1.0,
                          roughness=0.35),
    "iron": PbrMaterial(albedo=(0.56, 0.57, 0.58, 1.0), metalness=1.0,
                        roughness=0.45),
    "plastic": PbrMaterial(albedo=(0.9, 0.9, 0.9, 1.0), metalness=0.0,
                           roughness=0.5),
    "rubber": PbrMaterial(albedo=(0.2, 0.2, 0.2, 1.0), metalness=0.0,
                          roughness=0.9),
}


@dataclasses.dataclass(frozen=True)
class PointLight:
    """Point light colocated with the camera (light.rs:28-57; the
    reference supports exactly one, attached to the camera —
    light.rs:36-43 TODO)."""

    color: Tuple[float, float, float] = (1.0, 1.0, 1.0)

    @classmethod
    def white_light(cls, intensity: float) -> "PointLight":
        return cls(color=(intensity,) * 3)


@dataclasses.dataclass(frozen=True)
class AmbientLight:
    """Uniform ambient term (light.rs:95-110)."""

    color: Tuple[float, float, float] = (0.05, 0.05, 0.05)

    @classmethod
    def white_light(cls, intensity: float) -> "AmbientLight":
        return cls(color=(intensity,) * 3)


# Role fallback colors when an entity carries no visual material —
# the same role → hue mapping preview.py uses.
_ROLE_ALBEDO = {
    "material": (0.28, 0.47, 0.81, 1.0),
    "source": (0.84, 0.37, 0.37, 1.0),
    "observer": (0.42, 0.80, 0.40, 1.0),
    "pml": (0.71, 0.49, 0.78, 1.0),
}


def _entity_role(e) -> str:
    if getattr(e, "source", None) is not None:
        return "source"
    if getattr(e, "pml", None) is not None:
        return "pml"
    if getattr(e, "observer", None) is not None:
        return "observer"
    return "material"


def _shape_uv(shape, local: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Analytic (u, v) in [0, 1] from shape-LOCAL hit positions (k, 3).

    The reference rasterizer interpolates per-vertex UVs
    (shader.wgsl:213 texture_position); a ray tracer over procedural
    shapes evaluates the same parameterizations exactly at the hit point
    — no seams at the wrap column, no UV vertex attributes:

    - Ball: the UV-sphere chart (y polar axis, matching mesh.py's
      _uv_sphere ring layout): u = azimuth, v = polar angle / pi.
    - Cuboid: dominant-axis cube-face planar mapping.
    - Cylinder (y axis, mesh.py _cylinder): u = azimuth, v = height.
    - Quad / HalfSpace / fallback: planar in the local tangent plane.
    """
    from ..scene.shapes import Ball, Cuboid, Cylinder, HalfSpace, Quad

    x, y, z = local[:, 0], local[:, 1], local[:, 2]
    if isinstance(shape, Ball):
        r = np.maximum(np.linalg.norm(local, axis=-1), _EPS)
        u = 0.5 + np.arctan2(z, x) / (2 * np.pi)
        v = np.arccos(np.clip(y / r, -1.0, 1.0)) / np.pi
        return u, v
    if isinstance(shape, Cuboid):
        he = np.maximum(np.asarray(shape.half_extents, np.float64), _EPS)
        n = local / he
        ax = np.argmax(np.abs(n), axis=-1)
        u = np.where(ax == 0, z / he[2], np.where(ax == 1, x / he[0],
                                                  x / he[0]))
        v = np.where(ax == 0, y / he[1], np.where(ax == 1, z / he[2],
                                                  y / he[1]))
        return (u + 1.0) * 0.5, (v + 1.0) * 0.5
    if isinstance(shape, Cylinder):
        u = 0.5 + np.arctan2(z, x) / (2 * np.pi)
        v = np.clip((y / max(shape.half_height, _EPS) + 1.0) * 0.5, 0.0, 1.0)
        return u, v
    if isinstance(shape, Quad):
        hx, hy = shape.half_extents
        return ((x / max(hx, _EPS) + 1.0) * 0.5,
                (y / max(hy, _EPS) + 1.0) * 0.5)
    if isinstance(shape, HalfSpace):
        # same tangent basis the mesh patch uses (mesh.py triangulate)
        n = np.asarray(shape.normal, np.float64)
        n = n / np.linalg.norm(n)
        a = np.array([1.0, 0.0, 0.0])
        if abs(n @ a) > 0.9:
            a = np.array([0.0, 0.0, 1.0])
        t1 = np.cross(n, a)
        t1 /= np.linalg.norm(t1)
        t2 = np.cross(n, t1)
        return local @ t1, local @ t2
    return x, y


def _uv_density(shape, extent: float) -> float:
    """Characteristic world length of one full UV span, for mip LOD."""
    from ..scene.shapes import Ball, Cuboid, Cylinder, Quad

    if isinstance(shape, Ball):
        return float(np.pi * shape.radius)
    if isinstance(shape, Cuboid):
        return float(2.0 * max(shape.half_extents))
    if isinstance(shape, Cylinder):
        return float(2.0 * max(shape.half_height,
                               np.pi * shape.radius))
    if isinstance(shape, Quad):
        return float(2.0 * max(shape.half_extents))
    return float(extent)


def _gather_triangles(scene, materials, default_material, extent):
    """World-space triangle soup: (v0, e1, e2, n, mat_id), materials list."""
    from ..scene.shapes import HalfSpace
    from .mesh import transform_mesh, triangulate

    if extent is None:
        spans = []
        for e in scene.entities:
            if e.shape is not None and not isinstance(e.shape, HalfSpace):
                ab = e.world_aabb()
                if ab is not None and np.all(np.isfinite(ab[1] - ab[0])):
                    spans.append(float(np.max(ab[1] - ab[0])))
        extent = max(spans) if spans else 10.0

    v0s, e1s, e2s, mids = [], [], [], []
    mats: list = []
    frames: list = []  # (shape, global pose, uv density) per material slot
    for e in scene.entities:
        if e.shape is None:
            continue
        mat = None
        if materials is not None and e.name:
            mat = materials.get(e.name)
        if mat is None:
            mat = getattr(e, "visual", None)
        if mat is None:
            mat = default_material or PbrMaterial(
                albedo=_ROLE_ALBEDO[_entity_role(e)]
            )
        # constant alpha fully below threshold: every fragment would be
        # discarded (shader.wgsl:233-236), so the whole entity drops out
        # here; textured alpha discards per fragment in the shade loop.
        if mat.albedo_texture is None \
                and mat.albedo[3] < mat.alpha_threshold:
            continue
        try:
            verts, faces = triangulate(e.shape, extent=extent)
        except TypeError:
            continue
        world = transform_mesh(verts, e.global_pose())
        tri = world[faces]  # (m, 3, 3)
        v0s.append(tri[:, 0])
        e1s.append(tri[:, 1] - tri[:, 0])
        e2s.append(tri[:, 2] - tri[:, 0])
        mids.append(np.full(len(faces), len(mats), np.int32))
        mats.append(mat)
        frames.append((e.shape, e.global_pose(), _uv_density(e.shape,
                                                             extent)))
    if not mats:
        z = np.zeros((0, 3))
        return z, z, z, np.zeros(0, np.int32), [], []
    return (
        np.concatenate(v0s),
        np.concatenate(e1s),
        np.concatenate(e2s),
        np.concatenate(mids),
        mats,
        frames,
    )


def _aces_tone_map(hdr: np.ndarray) -> np.ndarray:
    """ACES fitted tone map, identical constants (shader.wgsl:357-374)."""
    m1 = np.array(
        [
            [0.59719, 0.35458, 0.04823],
            [0.07600, 0.90834, 0.01566],
            [0.02840, 0.13383, 0.83777],
        ]
    )
    m2 = np.array(
        [
            [1.60475, -0.53108, -0.07367],
            [-0.10208, 1.10813, -0.00605],
            [-0.00327, -0.07276, 1.07602],
        ]
    )
    v = hdr @ m1.T
    a = v * (v + 0.0245786) - 0.000090537
    b = v * (0.983729 * v + 0.4329510) + 0.238081
    return np.clip((a / b) @ m2.T, 0.0, 1.0)


def _shade(mat: PbrMaterial, p, n, view, light_pos, light_color,
           ambient_color, gamma, tex_rgb=None, orm=None):
    """Per-hit HDR→LDR shading (shader.wgsl:200-334 pbr_shader +
    light_radiance). All arrays (k, 3). ``tex_rgb`` multiplies albedo
    and ``orm`` (r, g, b) multiplies metalness/roughness/AO per hit
    (shader.wgsl:205-230)."""
    albedo = np.asarray(mat.albedo[:3])
    metalness = mat.metalness
    rough_in = mat.roughness
    amb_occ = mat.ambient_occlusion
    if tex_rgb is not None:
        albedo = albedo * tex_rgb
    if orm is not None:
        use_m, use_r, use_ao = mat.material_channels
        if use_m:
            metalness = metalness * orm[:, 0:1]
        if use_r:
            rough_in = rough_in * orm[:, 1:2]
        if use_ao:
            amb_occ = amb_occ * orm[:, 2:3]
    if not mat.shading:
        color = np.broadcast_to(albedo, p.shape).copy()
    else:
        roughness = np.maximum(rough_in, 0.001)  # shader.wgsl:258-261
        f0 = 0.04 + (albedo - 0.04) * metalness  # mix(0.04, albedo, m)
        n_dot_v = np.maximum(np.sum(n * view, axis=-1, keepdims=True), 0.0)

        color = ambient_color * albedo * amb_occ

        ld = light_pos - p
        ld /= np.maximum(np.linalg.norm(ld, axis=-1, keepdims=True), _EPS)
        half = view + ld
        half /= np.maximum(np.linalg.norm(half, axis=-1, keepdims=True), _EPS)
        h_dot_v = np.maximum(np.sum(half * view, axis=-1, keepdims=True), 0.0)
        n_dot_l = np.maximum(np.sum(n * ld, axis=-1, keepdims=True), 0.0)
        n_dot_h = np.maximum(np.sum(n * half, axis=-1, keepdims=True), 0.0)

        radiance = np.asarray(light_color) * 20.0  # shader.wgsl:319-322

        # Trowbridge-Reitz GGX NDF with a2 = a*a (reference typo fixed,
        # see module docstring), a = roughness as shader.wgsl uses it.
        a2 = roughness * roughness
        denom = n_dot_h * n_dot_h * (a2 - 1.0) + 1.0
        ndf = a2 / (np.pi * denom * denom)
        # Smith geometry with Schlick-GGX, k = roughness
        # (shader.wgsl:342-350 passes roughness straight through as k).
        k = roughness
        g = (n_dot_v / (n_dot_v * (1 - k) + k)) * (
            n_dot_l / (n_dot_l * (1 - k) + k)
        )
        f = f0 + (1.0 - f0) * (1.0 - h_dot_v) ** 5  # fresnel_schlick
        k_d = (1.0 - metalness) * (1.0 - f)
        specular = ndf * g * f / (4.0 * n_dot_v * n_dot_l + 1e-4)
        color = color + (k_d * albedo / np.pi + specular) * radiance * n_dot_l

    if mat.tone_map:
        color = _aces_tone_map(color)
    if mat.gamma:
        color = np.power(np.maximum(color, 0.0), 1.0 / gamma)
    return np.clip(color, 0.0, 1.0)


def render_pbr(
    scene,
    camera,
    *,
    width: int = 384,
    height: int = 288,
    point_light: Optional[PointLight] = PointLight(),
    ambient: Optional[AmbientLight] = AmbientLight(),
    background: Tuple[float, float, float, float] = (0.0, 0.0, 0.0, 0.0),
    gamma: float = 2.2,
    materials=None,
    default_material: Optional[PbrMaterial] = None,
    light_position=None,
    max_layers: int = 3,
    mesh_extent: Optional[float] = None,
    wire_eps: float = 0.03,
    ray_chunk: int = 2048,
) -> np.ndarray:
    """Ray-trace ``scene`` from ``camera`` to a float32 (H, W, 4) RGBA
    image in [0, 1].

    ``materials`` maps entity NAME → PbrMaterial and overrides the
    per-entity ``visual`` component; entities with neither get a
    role-colored default. ``light_position`` defaults to the camera
    position (the reference's camera-attached point light,
    light.rs:36-43). ``max_layers`` bounds how many transparent surfaces
    compose front-to-back along one ray."""
    v0, e1, e2, mat_id, mats, uv_frames = _gather_triangles(
        scene, materials, default_material, mesh_extent
    )
    bg = np.asarray(background, np.float64)
    img = np.empty((height, width, 4), np.float64)
    img[...] = bg
    if len(mats) == 0:
        return img.astype(np.float32)

    origin = np.asarray(camera.position, np.float64)
    rot = camera.rotation
    ty = np.tan(0.5 * camera.fovy)
    tx = ty * camera.aspect
    # solid-angle size of one pixel (for texture mip LOD selection)
    pixel_angle = 2.0 * ty / height
    # pixel centers, +y up (camera.rs:109-115 screen convention)
    us = (np.arange(width) + 0.5) / width * 2.0 - 1.0
    vs = 1.0 - (np.arange(height) + 0.5) / height * 2.0
    uu, vv = np.meshgrid(us, vs)
    local = np.stack([uu * tx, vv * ty, np.ones_like(uu)], axis=-1)
    dirs = local @ rot.T
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    dirs = dirs.reshape(-1, 3)

    # Shared-origin Moller-Trumbore constants: with s = origin - v0 fixed,
    # a, u, v, t reduce to (d . const) per triangle, so the intersection
    # stage is three dense (rays, tris) matmuls.
    s = origin - v0  # (T, 3)
    n_vec = np.cross(e1, e2)  # unnormalized geometric normal
    a_vec = -n_vec  # a   = d . (e2 x e1)
    u_vec = np.cross(e2, s)  # s.(d x e2) = d . (e2 x s); careful below
    q = np.cross(s, e1)
    t_num = np.sum(e2 * q, axis=-1)  # t = f * (e2 . q), ray-independent

    n_unit = n_vec / np.maximum(
        np.linalg.norm(n_vec, axis=-1, keepdims=True), _EPS
    )

    light_pos = (
        origin if light_position is None
        else np.asarray(light_position, np.float64)
    )
    amb = np.zeros(3) if ambient is None else np.asarray(ambient.color)
    lcol = np.zeros(3) if point_light is None else np.asarray(
        point_light.color
    )

    flat = img.reshape(-1, 4)
    n_rays = dirs.shape[0]
    for lo in range(0, n_rays, ray_chunk):
        d = dirs[lo:lo + ray_chunk]  # (N, 3)
        a = d @ a_vec.T  # (N, T)
        with np.errstate(divide="ignore", invalid="ignore"):
            f = 1.0 / a
            uu_ = f * (d @ u_vec.T)
            vv_ = f * (d @ q.T)
            tt = f * t_num[None, :]
        valid = (
            (np.abs(a) > _EPS)
            & (uu_ >= -_EPS)
            & (vv_ >= -_EPS)
            & (uu_ + vv_ <= 1.0 + _EPS)
            & (tt > 1e-6)
        )
        tt = np.where(valid, tt, np.inf)

        # front-to-back composite over the nearest hits (depth-sorted
        # alpha blending, the raster pipeline's transparency pass)
        n_chunk = d.shape[0]
        out = np.zeros((n_chunk, 3))
        trans = np.ones((n_chunk, 1))
        rows = np.arange(n_chunk)
        for _ in range(max_layers):
            ti = np.argmin(tt, axis=1)
            t_hit = tt[rows, ti]
            hit = np.isfinite(t_hit)
            if not np.any(hit):
                break
            hr = rows[hit]
            htri = ti[hit]
            t_h = t_hit[hit]
            p = origin + t_h[:, None] * d[hit]
            n = n_unit[htri]
            view = -d[hit]
            # two-sided: flip normals to face the viewer
            n = n * np.sign(
                np.sum(n * view, axis=-1, keepdims=True) + _EPS
            )
            m_of = mat_id[htri]
            rgba = np.zeros((len(hr), 4))
            for mi in np.unique(m_of):
                sel = m_of == mi
                mat = mats[mi]
                tex_rgb = orm = None
                alpha = mat.albedo[3] if mat.transparent else 1.0
                if mat.albedo_texture is not None \
                        or mat.material_texture is not None:
                    shape, pose, density = uv_frames[mi]
                    # Isometry.apply works on (3, ...) coordinate-first
                    local = pose.inverse_apply(p[sel].T).T
                    u, v = _shape_uv(shape, local)
                    su, sv = mat.uv_scale
                    u, v = u * su, v * sv
                    # isotropic ray-footprint mip LOD: hit distance x
                    # pixel angle / cos, in texels of the base level
                    # (the rasterizer's screen-derivative analog)
                    cosv = np.abs(np.sum(n[sel] * view[sel], axis=-1))
                    foot = t_h[sel] * pixel_angle / np.maximum(cosv, 0.2)
                    if mat.albedo_texture is not None:
                        tex = mat.albedo_texture
                        texels = foot / max(density, _EPS) \
                            * tex.shape[0] * max(su, sv)
                        lods = np.clip(
                            np.round(np.log2(np.maximum(texels, 1e-9))),
                            0, tex.n_mips - 1).astype(np.int32)
                        texel = np.empty((int(sel.sum()), 4))
                        for lv in np.unique(lods):
                            m = lods == lv
                            texel[m] = tex.sample(u[m], v[m], lod=float(lv))
                        tex_rgb = texel[:, :3]
                        # per-fragment alpha: factor x texel, with the
                        # shader's alpha_threshold discard
                        # (shader.wgsl:215-236)
                        alpha = (mat.albedo[3] * texel[:, 3]
                                 if mat.transparent else
                                 np.ones(len(texel)))
                        if mat.alpha_threshold > 0.0:
                            alpha = np.where(
                                mat.albedo[3] * texel[:, 3]
                                < mat.alpha_threshold,
                                0.0, alpha)
                    if mat.material_texture is not None:
                        orm = mat.material_texture.sample(u, v)[:, :3]
                rgb = _shade(
                    mat, p[sel], n[sel], view[sel], light_pos, lcol, amb,
                    gamma, tex_rgb=tex_rgb, orm=orm,
                )
                if mat.wireframe is not None:
                    bu = uu_[hr[sel], htri[sel]]
                    bv = vv_[hr[sel], htri[sel]]
                    edge = (
                        np.minimum(np.minimum(bu, bv), 1.0 - bu - bv)
                        < wire_eps
                    )
                    rgb = np.where(
                        edge[:, None], np.asarray(mat.wireframe[:3]), rgb
                    )
                rgba[sel, :3] = rgb
                rgba[sel, 3] = alpha
            out[hr] += trans[hr] * rgba[:, 3:4] * rgba[:, :3]
            trans[hr] *= 1.0 - rgba[:, 3:4]
            # consume the chosen triangle so the next layer finds the
            # surface behind it
            tt[hr, htri] = np.inf
            if np.all(trans < 1e-3):
                break
        chunk_rgb = out + trans * bg[:3]
        chunk_a = 1.0 - trans[:, 0] * (1.0 - bg[3])
        flat[lo:lo + ray_chunk, :3] = chunk_rgb
        flat[lo:lo + ray_chunk, 3] = chunk_a

    return img.astype(np.float32)


def render_pbr_png(scene, camera, path, **kwargs) -> Path:
    """Render and write an 8-bit RGBA PNG; returns the path."""
    from .targets import PngTarget

    img = render_pbr(scene, camera, **kwargs)
    return PngTarget(str(path)).write(
        (np.clip(img, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
    )
