"""Field -> image projection with linear color maps.

Counterpart of the reference's projection system (cem-solver/src/project.rs
+ fdtd/cpu/project.rs + fdtd/wgpu/project.rs): an image plane (z = 0 in
projection space) is mapped by a homogeneous 4x4 matrix into the lattice,
the chosen field is sampled at the projected points, and a linear 4x4
``color_map`` maps the homogeneous field vector (fx, fy, fz, 1) to linear
RGBA (project.rs:43-68), which is then clamped and sRGB-encoded exactly like
the CPU backend (fdtd/cpu/project.rs:117-165, magenta for out-of-domain
pixels :162).

Where the reference splices user WGSL into the fragment shader by string
replacement (fdtd/wgpu/project.rs:593-606), we accept a Python callable
``color_map_fn(field (h, w, 3)) -> rgba (h, w, 4) linear`` — jit-traceable,
so custom maps run on device too.

The sampling itself runs on device (gather + 4x4 matmul) and only the final
u8 image crosses to the host.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "ProjectionParameters",
    "axis_plane_projection",
    "default_z_colormap",
    "project",
]


def default_z_colormap(field: jax.Array) -> jax.Array:
    """The runner's hard-coded red/green z-component map
    (cem-app/src/solver/runner.rs:760-779): red for +z, green for -z,
    alpha scaled 10x harder."""
    s_c, s_a = 10.0, 100.0
    x = field[..., 2]
    r = jnp.clip(s_c * x, 0.0, 1.0)
    g = jnp.clip(-s_c * x, 0.0, 1.0)
    a = jnp.clip(s_a * jnp.abs(x), 0.0, 1.0)
    return jnp.stack([r, g, jnp.zeros_like(r), a], axis=-1)


@dataclasses.dataclass(frozen=True)
class ProjectionParameters:
    """Mirror of ProjectionParameters (project.rs:43-68)."""

    projection: Tuple[Tuple[float, ...], ...]  # 4x4 homogeneous, uv-plane -> lattice
    field: str = "e"  # which field to sample
    color_map: Optional[Tuple[Tuple[float, ...], ...]] = None  # 4x4 linear map
    color_map_fn: Optional[Callable] = None  # custom callable (replaces WGSL)


def axis_plane_projection(axis: int, index: int, shape) -> np.ndarray:
    """4x4 matrix projecting the uv unit square onto lattice plane
    ``axis=index`` (the common case; arbitrary planes can be composed by
    hand like the reference's Matrix4)."""
    nx, ny, nz = shape
    m = np.zeros((4, 4))
    axes = [a for a in range(3) if a != axis]
    # uv in [0,1]^2 maps to the full extent of the two in-plane axes in
    # NORMALIZED lattice coordinates (the sampler rescales by (n-1), matching
    # fdtd/cpu/project.rs:142-147)
    m[axes[0], 0] = 1.0
    m[axes[1], 1] = 1.0
    m[axis, 3] = index / max(shape[axis] - 1, 1)
    m[3, 3] = 1.0
    return m


def _srgb_encode(c: jax.Array) -> jax.Array:
    c = jnp.clip(c, 0.0, 1.0)
    return jnp.where(
        c <= 0.0031308, 12.92 * c, 1.055 * jnp.power(c, 1.0 / 2.4) - 0.055
    )


def _sample_indices(params: ProjectionParameters, shape, size) -> Tuple[np.ndarray, np.ndarray]:
    """Precompute (h, w) lattice indices + validity mask for each pixel
    (fdtd/cpu/project.rs:128-151: uv with y-flip -> projection -> round &
    clamp to the lattice)."""
    w, h = size
    proj = np.asarray(params.projection, np.float64)
    xs = (np.arange(w) / (w + 1)).astype(np.float64)
    ys = 1.0 - (np.arange(h) / (h + 1)).astype(np.float64)  # image y flip
    u, v = np.meshgrid(xs, ys)  # (h, w)
    uv1 = np.stack([u, v, np.zeros_like(u), np.ones_like(u)])  # (4, h, w)
    p = np.tensordot(proj, uv1, axes=(1, 0))[:3]  # (3, h, w) normalized coords
    n = np.asarray(shape, np.float64).reshape(3, 1, 1)
    lattice = np.round(p * (n - 1.0))
    valid = np.all((lattice >= 0) & (lattice <= n - 1), axis=0)
    lattice = np.clip(lattice, 0, n - 1).astype(np.int32)
    return lattice, valid


@functools.lru_cache(maxsize=64)
def _renderer(params: ProjectionParameters, shape, size):
    """Build (jitted render fn, validity mask) once per projection setup.

    Hoisted out of project(): a per-call jit closure would miss the jit
    cache and recompile every observation frame (the runner targets 25 FPS).
    """
    lattice, valid = _sample_indices(params, shape, size)

    @jax.jit
    def _render(fx, fy, fz):
        ix, iy, iz = lattice[0], lattice[1], lattice[2]
        field = jnp.stack(
            [fx[ix, iy, iz], fy[ix, iy, iz], fz[ix, iy, iz]], axis=-1
        ).astype(jnp.float32)
        if params.color_map_fn is not None:
            rgba = params.color_map_fn(field)
        elif params.color_map is not None:
            cm = jnp.asarray(params.color_map, jnp.float32)
            hom = jnp.concatenate([field, jnp.ones_like(field[..., :1])], axis=-1)
            rgba = jnp.einsum("ij,hwj->hwi", cm, hom)
        else:
            rgba = default_z_colormap(field)
        rgba = rgba.at[..., :3].set(_srgb_encode(rgba[..., :3]))
        rgba = jnp.clip(rgba, 0.0, 1.0)
        return jnp.round(rgba * 255.0).astype(jnp.uint8)

    return _render, valid


def project(
    state,
    params: ProjectionParameters,
    size: Tuple[int, int] = (256, 256),
) -> np.ndarray:
    """Render a (h, w, 4) uint8 RGBA image of the projected field."""
    render, valid = _renderer(params, tuple(state.shape), tuple(size))
    f3 = state.e if params.field == "e" else state.h
    img = np.array(render(*f3))  # copy: device buffers are read-only views
    # magenta for out-of-domain pixels (fdtd/cpu/project.rs:162)
    img[~valid] = np.array([255, 0, 255, 255], np.uint8)
    return img
