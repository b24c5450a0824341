"""Entity/scene/config inspection — the cem-probe analog.

The reference's cem-probe crate renders property-inspector UIs for
components in egui (PropertiesUi, cem-probe/src/lib.rs:10-210, with the
ComponentUi reflection glue in cem-scene/src/probe.rs). The headless TPU
counterpart is ``describe``: a structured, human-readable dump of any
framework object (entities, scenes, materials, configs, compiled scenes)
for notebooks and logs.
"""

from __future__ import annotations

import dataclasses
from typing import Any

__all__ = ["describe"]


def _fmt(value: Any, indent: int) -> str:
    pad = "  " * indent
    if dataclasses.is_dataclass(value) and not isinstance(value, type):
        name = type(value).__name__
        lines = [name]
        for f in dataclasses.fields(value):
            v = getattr(value, f.name)
            if v is None:
                continue
            lines.append(f"{pad}  {f.name}: {_fmt(v, indent + 1)}")
        return "\n".join(lines)
    if isinstance(value, (list, tuple)) and len(value) > 6:
        return f"[{len(value)} items]"
    if isinstance(value, float):
        return f"{value:.6g}"
    return repr(value)


def describe(obj: Any) -> str:
    """Human-readable multi-line description of a framework object."""
    from ..scene.scene import Entity, Scene

    if isinstance(obj, Scene):
        lines = [f"Scene ({len(obj.entities)} entities)"]
        for e in obj.entities:
            lines.append("  " + describe(e).replace("\n", "\n  "))
        return "\n".join(lines)
    if isinstance(obj, Entity):
        parts = [f"Entity {obj.name!r}"]
        if obj.shape is not None:
            parts.append(f"  shape: {_fmt(obj.shape, 1)}")
        t = obj.pose.translation
        if any(t) or obj.parent is not None:
            parts.append(f"  pose: t=({t[0]:g}, {t[1]:g}, {t[2]:g})"
                         + (" (local, parented)" if obj.parent else ""))
        for comp in ("material", "source", "observer", "pml"):
            v = getattr(obj, comp)
            if v is not None:
                parts.append(f"  {comp}: {_fmt(v, 1)}")
        return "\n".join(parts)
    return _fmt(obj, 0)
