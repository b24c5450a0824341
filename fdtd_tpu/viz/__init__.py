from .projection import (
    ProjectionParameters,
    axis_plane_projection,
    default_z_colormap,
    project,
)
from .targets import FrameBuffer, GifTarget, PngTarget

__all__ = [
    "ProjectionParameters",
    "axis_plane_projection",
    "default_z_colormap",
    "project",
    "FrameBuffer",
    "GifTarget",
    "PngTarget",
]
