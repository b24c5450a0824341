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

__all__ = ["describe", "scene_tree", "Selection"]


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


def scene_tree(scene) -> str:
    """Indented entity hierarchy with component tags — the headless
    counterpart of the composer's object tree window
    (cem-app/src/composer/tree.rs:51-179): parent chains become nesting,
    and each row carries the same at-a-glance component summary the tree
    icons convey."""
    children: dict = {}
    roots = []
    for e in scene.entities:
        if e.parent is None:
            roots.append(e)
        else:
            children.setdefault(id(e.parent), []).append(e)

    def tags(e):
        out = []
        if e.shape is not None:
            out.append(type(e.shape).__name__)
        if e.material is not None:
            out.append("material")
        if e.source is not None:
            out.append("source")
        if e.pml is not None:
            out.append("pml")
        if e.observer is not None:
            out.append("observer")
        return f" [{', '.join(out)}]" if out else ""

    lines = [f"Scene ({len(scene.entities)} entities)"]

    def walk(e, depth):
        name = e.name or "<unnamed>"
        lines.append("  " * depth + f"- {name}{tags(e)}")
        for c in children.get(id(e), ()):
            walk(c, depth + 1)

    for r in roots:
        walk(r, 1)
    return "\n".join(lines)


class Selection:
    """Multi-entity selection model (composer/selection.rs:65-178:
    select / unselect / toggle / select_all / clear / count / entities),
    headless — no outline bundles, plus pick-based selection through a
    viz.camera.Camera (the view's EntityUnderPointer flow,
    composer/view.rs:205-223)."""

    def __init__(self):
        self._entities: list = []

    def clear(self) -> None:
        self._entities.clear()

    def select(self, entity) -> None:
        if entity not in self._entities:
            self._entities.append(entity)

    def unselect(self, entity) -> None:
        if entity in self._entities:
            self._entities.remove(entity)

    def toggle(self, entity) -> None:
        if entity in self._entities:
            self._entities.remove(entity)
        else:
            self._entities.append(entity)

    def select_all(self, scene) -> None:
        for e in scene.entities:
            self.select(e)

    def select_by_name(self, scene, name: str) -> bool:
        for e in scene.entities:
            if e.name == name:
                self.select(e)
                return True
        return False

    def select_at(self, scene, camera, uv, *, additive: bool = False):
        """Pick through the camera ray (BVH-backed) and select the hit
        entity; returns the PickResult (or None on a miss — which also
        clears a non-additive selection, like clicking empty space)."""
        hit = camera.pick(scene, uv)
        if not additive:
            self.clear()
        if hit is not None:
            self.select(hit.entity)
        return hit

    def count(self) -> int:
        return len(self._entities)

    def is_empty(self) -> bool:
        return not self._entities

    def entities(self) -> list:
        return list(self._entities)

    def describe(self) -> str:
        """Property dump of the selection — the entity window's body
        (composer/entity_window.rs over cem-probe's PropertiesUi)."""
        if not self._entities:
            return "(nothing selected)"
        return "\n\n".join(describe(e) for e in self._entities)
