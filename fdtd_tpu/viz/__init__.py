from .projection import (
    ProjectionParameters,
    axis_plane_projection,
    default_z_colormap,
    project,
)
from .camera import Camera, PickResult
from .pbr import (
    MATERIAL_PRESETS,
    AmbientLight,
    PbrMaterial,
    PointLight,
    render_pbr,
    render_pbr_png,
)
from .preview import render_scene_preview
from .targets import FrameBuffer, GifTarget, PngTarget
from .texture import MipCache, Texture, checkerboard, load_texture

__all__ = [
    "MipCache",
    "Texture",
    "checkerboard",
    "load_texture",
    "AmbientLight",
    "Camera",
    "MATERIAL_PRESETS",
    "PbrMaterial",
    "PickResult",
    "PointLight",
    "render_pbr",
    "render_pbr_png",
    "ProjectionParameters",
    "axis_plane_projection",
    "default_z_colormap",
    "project",
    "render_scene_preview",
    "FrameBuffer",
    "GifTarget",
    "PngTarget",
]
