"""Project files: scene save AND load.

Counterpart of the reference's project persistence — which only half
exists: save writes a RON ProjectFileData {magic: "cem-project", version: 0,
timestamp, scene} of reflect-serializable components
(cem-app/src/composer/mod.rs:650-694, file_formats/project_file.rs:23-47),
and LOADING IS NOT IMPLEMENTED (open only handles .nec,
composer/mod.rs:254-286). Here both directions work, over JSON: every
entity's shape, pose, material, source, observer, pml, and visual (PBR)
component round-trips.
"""

from __future__ import annotations

import dataclasses
import json
import time
from pathlib import Path
from typing import Any, Dict

from ..material import Material
from ..solver.pml import GradedPmlSpec
from ..solver.sources import (
    ContinuousWave,
    GaussianDerivative,
    GaussianPulse,
    Ricker,
)
from ..scene import (
    Ball,
    Cuboid,
    Cylinder,
    Entity,
    GradedPmlComponent,
    HalfSpace,
    Isometry,
    Observer,
    Quad,
    Scene,
    SourceSpec,
)

__all__ = ["save_project", "load_project", "MAGIC", "VERSION"]

#: mirrors the reference's magic/version scheme (project_file.rs:23-31)
MAGIC = "fdtd-tpu-project"
VERSION = 1

_SHAPES = {c.__name__: c for c in (Ball, Cuboid, Cylinder, HalfSpace, Quad)}
_WAVEFORMS = {
    c.__name__: c for c in (GaussianPulse, ContinuousWave, Ricker, GaussianDerivative)
}


def _dump_obj(obj) -> Dict[str, Any]:
    return {"type": type(obj).__name__, **dataclasses.asdict(obj)}


def _load_typed(d: Dict[str, Any], registry: Dict[str, type]):
    d = dict(d)
    cls = registry[d.pop("type")]
    # JSON turns tuples into lists; dataclass fields accept sequences, but
    # frozen dataclasses used as dict keys need tuples
    kwargs = {
        k: tuple(v) if isinstance(v, list) else v for k, v in d.items()
    }
    return cls(**kwargs)


def _dump_entity(e: Entity) -> Dict[str, Any]:
    out: Dict[str, Any] = {"name": e.name}
    if e.shape is not None:
        out["shape"] = _dump_obj(e.shape)
    out["pose"] = dataclasses.asdict(e.pose)
    if e.material is not None:
        out["material"] = dataclasses.asdict(e.material)
    if e.source is not None:
        out["source"] = {
            "waveform": _dump_obj(e.source.waveform),
            "j": list(e.source.j),
            "m": list(e.source.m),
        }
    if e.observer is not None:
        out["observer"] = dataclasses.asdict(e.observer)
    if e.pml is not None:
        out["pml"] = {
            "spec": dataclasses.asdict(e.pml.spec),
            "normal": list(e.pml.normal),
        }
    visual = getattr(e, "visual", None)
    if visual is not None and dataclasses.is_dataclass(visual):
        out["visual"] = dataclasses.asdict(visual)
    return out


def _load_entity(d: Dict[str, Any]) -> Entity:
    shape = _load_typed(d["shape"], _SHAPES) if "shape" in d else None
    pose_d = d.get("pose", {})
    pose = Isometry(
        translation=tuple(pose_d.get("translation", (0, 0, 0))),
        rotation=tuple(pose_d.get("rotation", (1, 0, 0, 0))),
    )
    material = Material(**d["material"]) if "material" in d else None
    source = None
    if "source" in d:
        source = SourceSpec(
            waveform=_load_typed(d["source"]["waveform"], _WAVEFORMS),
            j=tuple(d["source"]["j"]),
            m=tuple(d["source"]["m"]),
        )
    observer = None
    if "observer" in d:
        od = dict(d["observer"])
        if od.get("color_map") is not None:
            od["color_map"] = tuple(tuple(r) for r in od["color_map"])
        od["half_extents"] = tuple(od.get("half_extents", (1.0, 1.0)))
        observer = Observer(**od)
    pml = None
    if "pml" in d:
        pml = GradedPmlComponent(
            spec=GradedPmlSpec(**d["pml"]["spec"]),
            normal=tuple(d["pml"]["normal"]),
        )
    visual = None
    if "visual" in d:
        from ..viz.pbr import PbrMaterial

        vd = {
            k: tuple(v) if isinstance(v, list) else v
            for k, v in d["visual"].items()
        }
        visual = PbrMaterial(**vd)
    return Entity(
        name=d.get("name", ""),
        shape=shape,
        pose=pose,
        material=material,
        source=source,
        observer=observer,
        pml=pml,
        visual=visual,
    )


def save_project(path, scene: Scene) -> Path:
    """Write {magic, version, timestamp, entities} JSON
    (mirror of ProjectFileData, project_file.rs:23-47)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    data = {
        "magic": MAGIC,
        "version": VERSION,
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "entities": [_dump_entity(e) for e in scene.entities],
    }
    path.write_text(json.dumps(data, indent=2))
    return path


def load_project(path) -> Scene:
    """The loading half the reference never implemented."""
    data = json.loads(Path(path).read_text())
    if data.get("magic") != MAGIC:
        raise ValueError(f"{path}: not a {MAGIC} file")
    if data.get("version", -1) > VERSION:
        raise ValueError(f"{path}: version {data['version']} is newer than {VERSION}")
    return Scene(_load_entity(d) for d in data.get("entities", []))
