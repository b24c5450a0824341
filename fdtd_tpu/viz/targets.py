"""Projection output targets: PNG files, in-memory frames, GIF animations.

Counterpart of the reference's projection targets: image buffers and the
``GifEncoder`` animation target (cem-solver/src/project.rs:140-232), plus
the texture-channel live display (cem-render/src/texture/channel.rs) whose
TPU analog is a throttled host-side frame stream (see runner.py's
observation cadence).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

__all__ = ["PngTarget", "GifTarget", "FrameBuffer"]


@dataclasses.dataclass
class PngTarget:
    """Write each frame as <stem>_<tick>.png (single images or sequences)."""

    path: str  # stem or full path; '{tick}' substituted when present

    def write(self, image: np.ndarray, tick: int = 0) -> Path:
        import imageio.v3 as iio

        p = self.path
        if "{tick}" in p:
            p = p.format(tick=tick)
        path = Path(p)
        path.parent.mkdir(parents=True, exist_ok=True)
        iio.imwrite(path, image)
        return path


@dataclasses.dataclass
class GifTarget:
    """Accumulate frames, encode an animated GIF on close
    (project.rs:196-232)."""

    path: str
    fps: float = 25.0
    _frames: List[np.ndarray] = dataclasses.field(default_factory=list)

    def write(self, image: np.ndarray, tick: int = 0) -> None:
        self._frames.append(np.asarray(image))

    def close(self) -> Optional[Path]:
        if not self._frames:
            return None
        import imageio.v3 as iio

        path = Path(self.path)
        path.parent.mkdir(parents=True, exist_ok=True)
        iio.imwrite(path, self._frames, duration=1000.0 / self.fps, loop=0)
        return path

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


@dataclasses.dataclass
class FrameBuffer:
    """Keep the latest frame in memory — the texture-channel analog for
    notebooks/UIs polling the live field view."""

    latest: Optional[np.ndarray] = None
    tick: int = -1

    def write(self, image: np.ndarray, tick: int = 0) -> None:
        self.latest = image
        self.tick = tick
