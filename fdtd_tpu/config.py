"""Configuration: app config file + per-run solver configs + CLI defaults.

Counterpart of the reference's three config layers (SURVEY.md §5):
clap CLI (cem-app/src/main.rs:62-78) -> cli.py; AppConfig TOML at the XDG
config dir, auto-created with defaults + ``dump-default-config``
(cem-app/src/files.rs:37-94, config.rs:17-175) -> AppConfig here; in-scene
SolverConfig values (solver/config.rs) -> SolverConfig here. The reference's
graphics section (wgpu backend/power preference/staging sizes) maps to the
TPU runtime knobs: backend selection, ticks per dispatch, bench sizes.
"""

from __future__ import annotations

import dataclasses
import json
import os
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

__all__ = ["AppConfig", "SolverConfig", "config_path", "read_config_or_create"]


@dataclasses.dataclass
class SolverConfig:
    """Per-run solver configuration (cem-app/src/solver/config.rs:69-171)."""

    label: str = "default"
    # volume: None => scene AABB + margin; else fixed half-extents
    volume_half_extents: Optional[Tuple[float, float, float]] = None
    volume_margin: float = 0.0
    unit_system: str = "si"  # "si" | "reduced"
    # resolution: exactly one of these
    min_wavelength: Optional[float] = None
    max_frequency: Optional[float] = None
    dx: Optional[float] = None
    courant_safety: float = 0.99
    # backend ("Parallelization" analog, config.rs:33-43): auto picks pallas
    # on TPU, xla elsewhere; "sharded" decomposes over all devices
    backend: str = "auto"  # auto | xla | pallas | sharded
    # stop condition (config.rs:69-87)
    step_limit: Optional[int] = 1000
    simulated_time_limit: Optional[float] = None
    realtime_limit: Optional[float] = None
    memory_limit_mb: Optional[float] = None
    cpml_cells: int = 0  # 0 = reflecting Neumann edges

    def resolution(self, constants):
        from .grid import Resolution

        if self.dx is not None:
            return Resolution.courant(self.dx, constants, safety=self.courant_safety)
        if self.min_wavelength is not None:
            return Resolution.from_min_wavelength(self.min_wavelength, constants)
        if self.max_frequency is not None:
            return Resolution.from_max_frequency(self.max_frequency, constants)
        raise ValueError("SolverConfig needs one of dx / min_wavelength / max_frequency")

    def constants(self):
        from .constants import REDUCED, SI

        return SI if self.unit_system == "si" else REDUCED

    def stop_condition(self):
        from .runner import StopCondition

        return StopCondition(
            step_limit=self.step_limit,
            simulated_time_limit=self.simulated_time_limit,
            realtime_limit=self.realtime_limit,
        )


@dataclasses.dataclass
class AppConfig:
    """Persistent app configuration (cem-app/src/config.rs:17-175)."""

    ups_limit: Optional[float] = 100.0  # step_delay = 1/ups (runner.rs:463)
    observation_fps: Optional[float] = 25.0  # runner.rs:464
    ticks_per_dispatch: int = 1
    image_size: Tuple[int, int] = (256, 256)
    bench_sizes: Tuple[int, ...] = (256, 512)
    bench_steps: int = 50
    output_dir: str = "out"

    # -- (de)serialization ---------------------------------------------------

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "AppConfig":
        kwargs = {}
        for f in dataclasses.fields(cls):
            if f.name in d:
                v = d[f.name]
                if isinstance(v, list):
                    v = tuple(v)
                kwargs[f.name] = v
        return cls(**kwargs)

    def to_toml(self) -> str:
        lines = ["# fdtd-tpu configuration", "[app]"]
        for k, v in self.to_dict().items():
            lines.append(f"{k} = {_toml_value(v)}")
        return "\n".join(lines) + "\n"

    def to_json(self) -> str:
        return json.dumps({"app": self.to_dict()}, indent=2) + "\n"


def _toml_value(v: Any) -> str:
    if v is None:
        return '"none"'
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, float)):
        return repr(v)
    if isinstance(v, str):
        return json.dumps(v)
    if isinstance(v, (list, tuple)):
        return "[" + ", ".join(_toml_value(x) for x in v) + "]"
    raise TypeError(f"cannot serialize {v!r} to TOML")


def config_path() -> Path:
    """XDG config location (cem-app/src/files.rs:37-66)."""
    base = os.environ.get("XDG_CONFIG_HOME") or os.path.join(
        os.path.expanduser("~"), ".config"
    )
    return Path(base) / "fdtd-tpu" / "config.toml"


def read_config_or_create(path: Optional[Path] = None) -> AppConfig:
    """Read the TOML config, writing defaults first if absent
    (files.rs:68-94)."""
    import tomllib

    path = path or config_path()
    if not path.exists():
        path.parent.mkdir(parents=True, exist_ok=True)
        cfg = AppConfig()
        path.write_text(cfg.to_toml())
        return cfg
    with open(path, "rb") as f:
        data = tomllib.load(f)
    section = data.get("app", data)
    # "none" sentinel -> None
    section = {k: (None if v == "none" else v) for k, v in section.items()}
    return AppConfig.from_dict(section)
