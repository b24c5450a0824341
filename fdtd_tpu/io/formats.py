"""Extension -> file-format registry.

Counterpart of the reference's FileFormat registry
(cem-app/src/composer/file_formats/mod.rs:16-104, covering .cem and .nec):
``load_scene_file`` dispatches by extension to project JSON or NEC decks,
and ``register_format`` lets user code add more (the OBJ loader the
reference stubs, for instance).
"""

from __future__ import annotations

from pathlib import Path
from typing import Callable, Dict

from ..scene import Scene

__all__ = ["load_scene_file", "register_format", "supported_extensions"]

_LOADERS: Dict[str, Callable[[Path], Scene]] = {}


def register_format(extension: str, loader: Callable[[Path], Scene]) -> None:
    _LOADERS[extension.lower().lstrip(".")] = loader


def supported_extensions():
    return tuple(sorted(_LOADERS))


def load_scene_file(path) -> Scene:
    """Load a scene from a file by extension (.json/.fdtd project files,
    .nec antenna decks)."""
    path = Path(path)
    ext = path.suffix.lower().lstrip(".")
    loader = _LOADERS.get(ext)
    if loader is None:
        raise ValueError(
            f"unsupported scene file extension {path.suffix!r} "
            f"(supported: {', '.join(supported_extensions())})"
        )
    return loader(path)


def _load_project(path: Path) -> Scene:
    from .project import load_project

    return load_project(path)


def _load_nec(path: Path) -> Scene:
    from .nec import parse_nec
    from .nec_scene import populate_scene_with_nec

    scene = Scene()
    populate_scene_with_nec(scene, parse_nec(path.read_text()))
    return scene


register_format("json", _load_project)
register_format("fdtd", _load_project)
register_format("nec", _load_nec)
