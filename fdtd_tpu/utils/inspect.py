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
from typing import Any, List, Optional

__all__ = ["describe", "scene_tree", "Selection", "get", "set", "paths"]


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


# -- reflective property editing (PropertiesUi's write half) -----------------
#
# The reference's cem-probe is a TWO-way property surface: each widget
# writes back through TrackChanges into the component it reflects
# (cem-probe/src/lib.rs:10-210). ``get``/``set`` are the headless
# counterpart: dotted paths matching what ``describe`` prints navigate
# dataclass fields, tuple indices, and x/y/z(/w) axis names; ``set``
# rebuilds frozen dataclasses (dataclasses.replace) up the chain and
# mutates the first mutable owner. Routed through a ComposerSession the
# edit is one undo step, like every inspector tweak in the reference.


def _tuple_index(value, seg: str) -> int:
    """Tuple position for a path segment: a digit, or an axis name —
    (x, y, z) for length-3 tuples, (w, x, y, z) for length-4 (the
    quaternion layout of scene.transform.Isometry.rotation)."""
    if seg.lstrip("-").isdigit():
        i = int(seg)
        if not -len(value) <= i < len(value):
            raise KeyError(f"index {i} out of range for {len(value)}-tuple")
        return i
    axes = ("w", "x", "y", "z") if len(value) == 4 else ("x", "y", "z")
    if seg in axes[: len(value)]:
        return axes.index(seg)
    raise KeyError(f"{seg!r} is not an index or axis name "
                   f"for a {len(value)}-tuple")


def _coerce(old: Any, new: Any) -> Any:
    """Light type preservation: keep a float slot float, a tuple slot a
    tuple, so edits coming from strings/ints/lists land well-typed."""
    if isinstance(old, bool) or old is None:
        return new
    if isinstance(old, float) and isinstance(new, (int, str)):
        return float(new)
    if isinstance(old, int) and isinstance(new, str):
        return int(new)
    if isinstance(old, tuple) and isinstance(new, (list, tuple)):
        return tuple(new)
    return new


def _child(obj: Any, seg: str) -> Any:
    if isinstance(obj, (tuple, list)):
        return obj[_tuple_index(obj, seg)]
    if dataclasses.is_dataclass(obj) and not any(
            f.name == seg for f in dataclasses.fields(obj)):
        raise KeyError(f"{type(obj).__name__} has no field {seg!r}")
    try:
        return getattr(obj, seg)
    except AttributeError:
        raise KeyError(f"{type(obj).__name__} has no attribute {seg!r}")


def get(obj: Any, path: str) -> Any:
    """Read a dotted property path, e.g. ``get(e, "pose.translation.x")``."""
    for seg in path.split("."):
        obj = _child(obj, seg)
    return obj


def _set_rec(obj: Any, segs: List[str], value: Any):
    """Returns the REPLACEMENT for ``obj`` (obj itself when mutated in
    place; a rebuilt copy for tuples/frozen dataclasses)."""
    if not segs:
        return _coerce(obj, value)
    seg, rest = segs[0], segs[1:]
    cur = _child(obj, seg)
    new = _set_rec(cur, rest, value)
    if isinstance(obj, tuple):
        i = _tuple_index(obj, seg)
        return obj[:i] + (new,) + obj[i + 1:]
    if isinstance(obj, list):
        obj[_tuple_index(obj, seg)] = new
        return obj
    if dataclasses.is_dataclass(obj) and type(obj).__dataclass_params__.frozen:
        return dataclasses.replace(obj, **{seg: new})
    setattr(obj, seg, new)
    return obj


def set(obj: Any, path: str, value: Any, *, composer=None) -> Any:  # noqa: A001
    """Write a dotted property path; returns the (possibly rebuilt) object.

    Mutable roots (Entity) are edited in place and returned; frozen roots
    (Material, Isometry, ...) are REPLACED — use the return value. With
    ``composer`` (a scene.composer.ComposerSession) and a mutable root,
    the edit routes through ``composer.update`` so it lands in the undo
    buffer as one labeled step (the inspector-edit flow of
    cem-probe/src/lib.rs:10-210 + composer/entity_window.rs)."""
    segs = path.split(".")
    if not segs or not path:
        raise KeyError("empty property path")
    get(obj, path)  # validate (and surface KeyError) before touching obj
    if composer is not None:
        top = segs[0]
        cur = _child(obj, top)
        new = _set_rec(cur, segs[1:], value) if len(segs) > 1 \
            else _coerce(cur, value)
        composer.update(obj, **{top: new})
        return obj
    return _set_rec(obj, segs, value)


def paths(obj: Any, *, _prefix: str = "", _depth: int = 0) -> List[str]:
    """Enumerate the settable leaf paths of an object — the rows a
    property inspector would show (matches what ``describe`` prints)."""
    out: List[str] = []
    if _depth > 6:
        return out
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        for f in dataclasses.fields(obj):
            v = getattr(obj, f.name)
            p = f"{_prefix}{f.name}"
            if v is None:
                continue
            sub = paths(v, _prefix=p + ".", _depth=_depth + 1)
            out.extend(sub if sub else [p])
        return out
    if isinstance(obj, tuple) and 2 <= len(obj) <= 4 and all(
            isinstance(v, (int, float)) for v in obj):
        axes = ("w", "x", "y", "z") if len(obj) == 4 else ("x", "y", "z")
        return [f"{_prefix}{a}" for a in axes[: len(obj)]]
    if isinstance(obj, (int, float, str, bool)) or obj is None:
        return []
    if hasattr(obj, "__dict__"):
        for k, v in vars(obj).items():
            if k.startswith("_") or callable(v):
                continue
            p = f"{_prefix}{k}"
            sub = paths(v, _prefix=p + ".", _depth=_depth + 1)
            out.extend(sub if sub else [p])
    return out


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
