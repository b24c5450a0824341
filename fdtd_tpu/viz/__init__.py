from .projection import (
    ProjectionParameters,
    axis_plane_projection,
    default_z_colormap,
    project,
)
from .camera import Camera, PickResult
from .preview import render_scene_preview
from .targets import FrameBuffer, GifTarget, PngTarget

__all__ = [
    "Camera",
    "PickResult",
    "ProjectionParameters",
    "axis_plane_projection",
    "default_z_colormap",
    "project",
    "render_scene_preview",
    "FrameBuffer",
    "GifTarget",
    "PngTarget",
]
