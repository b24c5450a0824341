"""Image textures for the headless PBR renderer: mip chains, bilinear /
trilinear sampling, and a persistent on-disk mip cache.

Counterpart of the reference's texture pipeline:

- mip math — level count = 1 + ilog2(max(w, h)), each level halves with
  a floor of 1 (cem-util/src/wgpu/image.rs:252-310, tested at :313-383);
- albedo / material (ORM) image loading with wrapping linear samplers
  (cem-render/src/material.rs:484-557 LoadAlbedoTexture /
  LoadMaterialTexture, default Sampler::LinearRepeat);
- the shader MULTIPLIES sampled texels into the material factors —
  albedo.rgb *= texel.rgb, alpha *= texel.a, metalness *= orm.r,
  roughness *= orm.g, ambient_occlusion *= orm.b
  (cem-render/src/shader.wgsl:205-230) — ``PbrMaterial.albedo_texture``
  / ``material_texture`` reproduce exactly that composition;
- the persistent mip-map cache keyed by image content hash
  (cem-render/src/texture/mipmap_cache.rs:43-102 MipMapCache
  open/flush/create_texture) — here an .npz per hash under an XDG cache
  dir, because the expensive part on this host is the repeated decode +
  downsample chain of large images, same as the reference's rationale.

The GPU rasterizer gets screen-space derivatives for mip selection; the
ray tracer has no quad of fragments, so ``lod`` comes from the isotropic
ray-footprint estimate (hit distance x pixel solid angle / cos, scaled
by the shape's UV density) that ``viz/pbr.py`` computes per hit.
"""

from __future__ import annotations

import hashlib
import json
import os
from pathlib import Path
from typing import List, Optional, Sequence, Tuple, Union

import numpy as np

__all__ = ["Texture", "MipCache", "load_texture", "mip_level_count",
           "checkerboard"]


def mip_level_count(width: int, height: int) -> int:
    """1 + ilog2(max(w, h)) — cem-util/src/wgpu/image.rs:308-311."""
    size = max(int(width), int(height))
    return 1 + (size.bit_length() - 1 if size > 0 else 0)


def _srgb_to_linear(c: np.ndarray) -> np.ndarray:
    """sRGB EOTF (the reference stores albedo as Rgba8UnormSrgb; the
    shader samples linear values because the hardware converts)."""
    return np.where(c <= 0.04045, c / 12.92, ((c + 0.055) / 1.055) ** 2.4)


def _downsample(img: np.ndarray) -> np.ndarray:
    """One mip level down: 2x2 box filter with the reference's size rule
    max(1, c / 2) (image.rs:266). Odd dims drop the trailing row/col of
    the box (pad-by-edge), matching integer halving."""
    h, w = img.shape[:2]
    nh, nw = max(1, h // 2), max(1, w // 2)
    # crop to even extents covered by the new size, then average 2x2
    ch, cw = min(h, nh * 2), min(w, nw * 2)
    v = img[:ch, :cw]
    if ch < nh * 2:  # h == 1
        v = np.repeat(v, 2, axis=0)
    if cw < nw * 2:  # w == 1
        v = np.repeat(v, 2, axis=1)
    return (
        v.reshape(nh, 2, nw, 2, -1).mean(axis=(1, 3)).astype(img.dtype)
    )


def _normalize(data: np.ndarray, srgb: bool) -> np.ndarray:
    """Any (H,W) / (H,W,{1,3,4}) uint8-or-float image -> linear-space
    float32 (H, W, 4) with alpha defaulted to 1."""
    raw = np.asarray(data)
    a = raw.astype(np.float32)
    if a.ndim == 2:
        a = a[..., None]
    if raw.dtype == np.uint8:
        a = a / 255.0
    if a.shape[-1] == 1:
        a = np.repeat(a, 3, axis=-1)
    if a.shape[-1] == 3:
        a = np.concatenate(
            [a, np.ones(a.shape[:2] + (1,), np.float32)], axis=-1
        )
    if srgb:
        a = a.copy()
        a[..., :3] = _srgb_to_linear(a[..., :3]).astype(np.float32)
    return np.ascontiguousarray(a, np.float32)


class Texture:
    """A linear-space float32 (H, W, 4) image plus its mip chain.

    ``wrap`` is "repeat" (the reference's default LinearRepeat sampler,
    material.rs:495) or "clamp" (ClampToEdge)."""

    def __init__(self, data: np.ndarray, *, srgb: bool = False,
                 wrap: str = "repeat",
                 mips: Optional[Sequence[np.ndarray]] = None):
        if wrap not in ("repeat", "clamp"):
            raise ValueError(f"wrap must be repeat|clamp, got {wrap!r}")
        self.wrap = wrap
        if mips is not None:
            self.mips: List[np.ndarray] = [np.asarray(m, np.float32)
                                           for m in mips]
        else:
            a = _normalize(data, srgb)
            self.mips = [a]
            for _ in range(mip_level_count(a.shape[1], a.shape[0]) - 1):
                self.mips.append(_downsample(self.mips[-1]))

    # -- introspection -----------------------------------------------------

    @property
    def shape(self) -> Tuple[int, int]:
        return self.mips[0].shape[:2]

    @property
    def n_mips(self) -> int:
        return len(self.mips)

    def content_hash(self) -> str:
        """Stable content hash of the base level (the cache key —
        mipmap_cache.rs:43-55 ImageHash::from_image)."""
        h = hashlib.sha1()
        h.update(b"fdtd-tpu-tex-v1")
        base = self.mips[0]
        h.update(np.ascontiguousarray(base).tobytes())
        h.update(str(base.shape).encode())
        return h.hexdigest()

    # -- sampling ----------------------------------------------------------

    def _wrap_idx(self, i: np.ndarray, n: int) -> np.ndarray:
        if self.wrap == "repeat":
            return np.mod(i, n)
        return np.clip(i, 0, n - 1)

    def _bilinear(self, level: int, u: np.ndarray, v: np.ndarray):
        img = self.mips[min(level, len(self.mips) - 1)]
        h, w = img.shape[:2]
        # texel-center convention: u in [0,1) maps to x in [-0.5, w-0.5)
        x = np.asarray(u, np.float64) * w - 0.5
        y = np.asarray(v, np.float64) * h - 0.5
        x0 = np.floor(x).astype(np.int64)
        y0 = np.floor(y).astype(np.int64)
        fx = (x - x0)[..., None]
        fy = (y - y0)[..., None]
        x0w, x1w = self._wrap_idx(x0, w), self._wrap_idx(x0 + 1, w)
        y0w, y1w = self._wrap_idx(y0, h), self._wrap_idx(y0 + 1, h)
        c00 = img[y0w, x0w]
        c10 = img[y0w, x1w]
        c01 = img[y1w, x0w]
        c11 = img[y1w, x1w]
        top = c00 * (1 - fx) + c10 * fx
        bot = c01 * (1 - fx) + c11 * fx
        return top * (1 - fy) + bot * fy

    def sample(self, u, v, lod=None) -> np.ndarray:
        """Sample RGBA at (u, v) (arrays ok). ``lod=None`` or 0 reads the
        base level bilinearly; a float lod interpolates the two adjacent
        mips (trilinear). Scalar lod only — the ray tracer samples one
        material batch at a time."""
        if lod is None or lod <= 0.0 or len(self.mips) == 1:
            return self._bilinear(0, u, v)
        lod = float(min(lod, len(self.mips) - 1))
        lo = int(np.floor(lod))
        frac = lod - lo
        a = self._bilinear(lo, u, v)
        if frac <= 0.0:
            return a
        b = self._bilinear(lo + 1, u, v)
        return a * (1 - frac) + b * frac

    @property
    def has_alpha(self) -> bool:
        """True when any texel's alpha < 1 — the reference infers
        transparency from the image's color type having alpha
        (material.rs:533-539); content is the headless equivalent."""
        return bool(np.any(self.mips[0][..., 3] < 1.0))


def checkerboard(n: int = 8, size: int = 64,
                 c0=(1.0, 1.0, 1.0), c1=(0.0, 0.0, 0.0)) -> Texture:
    """n x n checker test texture (linear space), size x size texels."""
    yy, xx = np.meshgrid(np.arange(size), np.arange(size), indexing="ij")
    cell = ((xx * n // size) + (yy * n // size)) % 2
    img = np.where(cell[..., None] == 0, np.asarray(c0, np.float32),
                   np.asarray(c1, np.float32))
    return Texture(img.astype(np.float32))


class MipCache:
    """Persistent on-disk mip-chain cache keyed by image content hash —
    the headless MipMapCache (mipmap_cache.rs:58-102: open() loads an
    index.json under a base dir, create_texture() reuses cached level
    files or generates+stores them, flush() persists the index)."""

    def __init__(self, base_path: Union[str, Path]):
        self.base_path = Path(base_path)
        self.base_path.mkdir(parents=True, exist_ok=True)
        self.index_path = self.base_path / "index.json"
        if self.index_path.exists():
            self.index = json.loads(self.index_path.read_text())
        else:
            self.index = {}
        self._dirty = False

    @classmethod
    def open(cls, base_path=None) -> "MipCache":
        if base_path is None:
            xdg = os.environ.get("XDG_CACHE_HOME",
                                 os.path.expanduser("~/.cache"))
            base_path = Path(xdg) / "fdtd-tpu" / "mipmaps"
        return cls(base_path)

    def flush(self) -> None:
        if self._dirty:
            self.index_path.write_text(json.dumps(self.index, indent=1))
            self._dirty = False

    def create_texture(self, image: np.ndarray, *, srgb: bool = False,
                       wrap: str = "repeat") -> Texture:
        """Texture with mips, loading the chain from disk on a content
        hit and generating + storing it on a miss."""
        probe = Texture(image, srgb=srgb, wrap=wrap,
                        mips=[_normalize(image, srgb)])
        key = probe.content_hash()
        entry = self.index.get(key)
        if entry is not None:
            f = self.base_path / entry["file"]
            if f.exists():
                with np.load(f) as z:
                    mips = [z[k] for k in entry["levels"]]
                return Texture(mips[0], wrap=wrap, mips=mips)
        tex = Texture(image, srgb=srgb, wrap=wrap)
        fname = f"{key}.npz"
        levels = [f"m{i}" for i in range(tex.n_mips)]
        np.savez_compressed(self.base_path / fname,
                            **dict(zip(levels, tex.mips)))
        self.index[key] = {"file": fname, "levels": levels}
        self._dirty = True
        self.flush()
        return tex


def load_texture(path: Union[str, Path], *, srgb: bool = True,
                 wrap: str = "repeat",
                 cache: Optional[MipCache] = None) -> Texture:
    """Load an image file as a Texture (sRGB decode by default, like the
    reference's Rgba8UnormSrgb albedo path). With ``cache`` (or when the
    FDTD_TPU_MIP_CACHE env var is set), mip chains persist across runs."""
    import imageio.v3 as iio

    img = np.asarray(iio.imread(str(path)))
    env = os.environ.get("FDTD_TPU_MIP_CACHE")
    if cache is None and env:
        # "1"/"true" -> default XDG dir, anything else is the cache dir
        cache = MipCache.open(None if env in ("1", "true") else env)
    if cache is not None:
        return cache.create_texture(img, srgb=srgb, wrap=wrap)
    return Texture(img, srgb=srgb, wrap=wrap)
