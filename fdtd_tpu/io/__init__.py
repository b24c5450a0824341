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
]
