from .nec import (
    FixedSegments,
    NecError,
    NecFile,
    SurfacePatch,
    TaperedSegments,
    Wire,
    WireArc,
    parse_nec,
)
from .nec_scene import populate_scene_with_nec
from .checkpoint import load_checkpoint, save_checkpoint
from .formats import load_scene_file, register_format, supported_extensions
from .obj import load_obj
from .project import load_project, save_project

__all__ = [
    "FixedSegments",
    "NecError",
    "NecFile",
    "SurfacePatch",
    "TaperedSegments",
    "Wire",
    "WireArc",
    "parse_nec",
    "populate_scene_with_nec",
    "load_checkpoint",
    "save_checkpoint",
    "load_scene_file",
    "load_obj",
    "register_format",
    "supported_extensions",
    "load_project",
    "save_project",
]
