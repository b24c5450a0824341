"""Live terminal viewer: watch fields evolve while the solver runs.

The reference's defining UX is the solver window — field projections
streamed into a texture at ~25 FPS next to live tick/sim-time/UPS stats
with play/pause control (cem-app/src/solver/ui.rs:31-126, texture
streaming cem-render/src/texture/channel.rs:17-32, the solver thread's
observation throttle cem-app/src/solver/runner.rs:383-563). This is the
TPU-headless counterpart: ``LiveView`` polls a FrameBuffer observer at
the observation cadence and redraws

- a TERMINAL frame: the RGBA projection downsampled into half-block
  characters (two pixels per cell via ``▀`` with 24-bit fg/bg), or a
  plain ASCII luminance ramp when the stream is not a color tty, and
- a stats line mirroring the solver window (tick, sim time, step wall
  time, updates/s, paused/running), and
- optionally an atomically-rewritten PNG (``live.png``) for viewers
  that follow a file instead of a terminal.

Keyboard control (only when stdin is a tty): SPACE pauses/resumes the
runner (the Condvar pause of runner.rs:425-434), ``q`` stops it.

With a ComposerSession attached (``session=``), LiveView also binds the
reference's interactive scene-view loop (cem-app/src/composer/
view.rs:88-227) and the solver window's UPS slider (cem-app/src/solver/
ui.rs:80-126), headlessly:

- arrow keys ORBIT the session camera around the scene center (the
  pointer-drag orbit of view.rs:116-161),
- ``+``/``-`` ZOOM toward/away from the pivot (view.rs:163-184),
- TAB cycles the selection through the scene's entities — the selected
  entity renders with a bright wireframe overlay in the scene pane (the
  outline pipeline's stencil highlight, composer/selection.rs:36-121)
  and is named in the stats line,
- ``[`` / ``]`` halve/double the UPS throttle (ui.rs:80-126's slider,
  runner.set_throttles).

The scene pane is a low-resolution PBR ray trace refreshed only when
the camera or selection changes (the scene view's pixels without the
window). Scripted keystrokes can drive everything through
``handle_keys`` — that is also how the tests exercise the loop.
"""

from __future__ import annotations

import io
import os
import sys
import time
from typing import Optional, TextIO, Tuple

import numpy as np

from .targets import FrameBuffer

__all__ = ["LiveView", "render_ansi", "render_ascii"]

_ASCII_RAMP = " .:-=+*#%@"


def _luminance(rgb: np.ndarray) -> np.ndarray:
    return (0.2126 * rgb[..., 0] + 0.7152 * rgb[..., 1]
            + 0.0722 * rgb[..., 2])


def _fit(img: np.ndarray, cols: int, rows: int) -> np.ndarray:
    """Nearest-neighbor downsample of an (h, w, c) image to at most
    (rows, cols) pixels, preserving aspect."""
    h, w = img.shape[:2]
    scale = min(cols / w, rows / h, 1.0)
    ow = max(int(w * scale), 1)
    oh = max(int(h * scale), 1)
    yi = (np.arange(oh) * (h / oh)).astype(int)
    xi = (np.arange(ow) * (w / ow)).astype(int)
    return img[yi][:, xi]


def render_ansi(img: np.ndarray, cols: int = 64, rows: int = 48) -> str:
    """24-bit-color half-block rendering: each output row packs two
    pixel rows (fg = upper, bg = lower)."""
    small = _fit(img[..., :3], cols, rows)
    if small.shape[0] % 2:
        small = small[:-1] if small.shape[0] > 1 else np.repeat(small, 2, 0)
    out = []
    for r in range(0, small.shape[0], 2):
        line = []
        for c in range(small.shape[1]):
            tr, tg, tb = (int(v) for v in small[r, c])
            br, bg_, bb = (int(v) for v in small[r + 1, c])
            line.append(
                f"\x1b[38;2;{tr};{tg};{tb}m\x1b[48;2;{br};{bg_};{bb}m▀"
            )
        out.append("".join(line) + "\x1b[0m")
    return "\n".join(out)


def render_ascii(img: np.ndarray, cols: int = 64, rows: int = 24) -> str:
    """Luminance → character-ramp rendering for dumb terminals/files."""
    small = _fit(img[..., :3], cols, rows)
    lum = _luminance(small.astype(np.float32)) / 255.0
    idx = np.clip((lum * (len(_ASCII_RAMP) - 1)).astype(int), 0,
                  len(_ASCII_RAMP) - 1)
    return "\n".join("".join(_ASCII_RAMP[i] for i in row) for row in idx)


class LiveView:
    """Poll a FrameBuffer at the observation cadence and redraw a
    terminal frame + stats line while a SolverRunner steps.

    Parameters
    ----------
    runner : SolverRunner — must have a FrameBuffer among its observer
        targets (or pass ``frame`` explicitly).
    frame : the FrameBuffer to watch (default: first one found).
    stream : output text stream (default sys.stderr).
    png_path : also atomically rewrite this PNG each refresh.
    color : force ANSI color on/off (default: auto from stream.isatty()).
    cols/rows : terminal cell budget for the frame.
    """

    ORBIT_STEP = 0.15  # radians per arrow press (view.rs drag scale)
    ZOOM_STEP = 0.8    # zoom factor per +/- press

    def __init__(self, runner, frame: Optional[FrameBuffer] = None, *,
                 stream: Optional[TextIO] = None,
                 png_path: Optional[str] = None,
                 color: Optional[bool] = None,
                 cols: int = 64, rows: int = 48,
                 refresh: float = 1.0 / 25.0,
                 session=None):
        self.runner = runner
        self.session = session
        self._scene_dirty = session is not None
        self._scene_art: Optional[str] = None
        self._sel_idx = -1
        self._pending = ""  # partial escape-sequence buffer
        if frame is None:
            for b in runner.observers:
                if isinstance(b.target, FrameBuffer):
                    frame = b.target
                    break
        if frame is None:
            raise ValueError("runner has no FrameBuffer observer to watch")
        self.frame = frame
        self.stream = stream if stream is not None else sys.stderr
        self.png_path = png_path
        if color is None:
            color = (getattr(self.stream, "isatty", lambda: False)()
                     and not os.environ.get("NO_COLOR"))
        self.color = color
        self.cols, self.rows = cols, rows
        self.refresh = refresh
        self.frames_rendered = 0
        self.stats_updates = 0
        self._last_tick = None
        self._last_lines = 0

    # -- rendering ---------------------------------------------------------

    def _stats_line(self) -> str:
        st = self.runner.stats()
        ups = (1.0 / st.last_step_time) if st.last_step_time > 0 else 0.0
        mode = ("finished" if st.finished
                else "paused" if st.paused else "running")
        line = (
            f"[{mode}] tick {st.sim_tick}  sim t={st.sim_time:.4g}  "
            f"step {st.last_step_time * 1e3:.2f} ms  {ups:.1f} UPS  "
            f"wall {st.total_running_time:.1f} s"
        )
        if st.step_delay:
            line += f"  throttle {1.0 / st.step_delay:.0f} UPS max"
        if self.session is not None and not self.session.selection.is_empty():
            names = ", ".join(
                getattr(e, "name", "?") or "?"
                for e in self.session.selection.entities()
            )
            line += f"  sel: {names}"
        return line

    def _render_scene_pane(self) -> Optional[str]:
        """Low-res ray trace of the session's scene view with the
        selection highlighted (wireframe-overlay outline analog);
        re-rendered only when the camera or selection changed."""
        if self.session is None:
            return self._scene_art
        if not self._scene_dirty:
            return self._scene_art
        from .pbr import PbrMaterial, render_pbr

        overrides = {}
        for e in self.session.selection.entities():
            name = getattr(e, "name", None)
            if name:
                base = getattr(e, "visual", None) or PbrMaterial()
                import dataclasses as _dc

                overrides[name] = _dc.replace(
                    base, wireframe=(1.0, 0.65, 0.1, 1.0))
        rows_px = self.rows if self.color else 2 * self.rows
        img = render_pbr(
            self.session.scene, self.session.camera,
            width=self.cols, height=rows_px, materials=overrides,
            background=(0.08, 0.08, 0.1, 1.0),
        )
        img8 = (np.clip(img[..., :3], 0.0, 1.0) * 255).astype(np.uint8)
        self._scene_art = (render_ansi(img8, self.cols, rows_px)
                           if self.color
                           else render_ascii(img8, self.cols, self.rows))
        self._scene_dirty = False
        return self._scene_art

    def render_once(self) -> bool:
        """Redraw if a new frame is available; always refresh the stats
        line. Returns True when a NEW frame was drawn."""
        img, tick = self.frame.latest, self.frame.tick
        new = img is not None and tick != self._last_tick
        buf = io.StringIO()
        if self._last_lines and self.color:
            buf.write(f"\x1b[{self._last_lines}F\x1b[J")  # redraw in place
        lines = 0
        scene_art = self._render_scene_pane()
        if scene_art is not None:
            buf.write(scene_art + "\n")
            lines += scene_art.count("\n") + 1
        if img is not None:
            art = (render_ansi(img, self.cols, self.rows) if self.color
                   else render_ascii(img, self.cols, self.rows))
            buf.write(art + "\n")
            lines += art.count("\n") + 1
        buf.write(self._stats_line() + "\n")
        lines += 1
        self.stream.write(buf.getvalue())
        self.stream.flush()
        self._last_lines = lines if self.color else 0
        self.stats_updates += 1
        if new:
            self._last_tick = tick
            self.frames_rendered += 1
            if self.png_path and img is not None:
                self._write_png(img)
        return new

    def _write_png(self, img: np.ndarray) -> None:
        import imageio.v3 as iio

        tmp = f"{self.png_path}.tmp"
        iio.imwrite(tmp, img, extension=".png")
        os.replace(tmp, self.png_path)  # atomic swap for file followers

    # -- control loop ------------------------------------------------------

    def _poll_keys(self) -> None:
        """Drain pending tty input into handle_keys."""
        try:
            import select

            if not sys.stdin.isatty():
                return
            chars = []
            while select.select([sys.stdin], [], [], 0)[0]:
                chars.append(sys.stdin.read(1))
            if chars:
                self.handle_keys("".join(chars))
        except (OSError, ValueError, io.UnsupportedOperation):
            pass

    def handle_keys(self, text: str) -> None:
        """Apply a burst of keystrokes (tty input or scripted): SPACE =
        pause/resume, q = stop, arrows = orbit, +/- = zoom, TAB = cycle
        selection, [ / ] = UPS throttle. Multi-byte escape sequences may
        split across bursts; a partial tail is buffered."""
        self._pending += text
        while self._pending:
            s = self._pending
            if s[0] == "\x1b":
                if len(s) < 3:
                    if s in ("\x1b", "\x1b["):
                        return  # incomplete sequence — wait for more
                    self._pending = s[1:]
                    continue
                if s[1] == "[":
                    self._pending = s[3:]
                    self._apply_key(s[:3])
                    continue
                self._pending = s[1:]
                continue
            self._pending = s[1:]
            self._apply_key(s[0])

    def _apply_key(self, key: str) -> None:
        if key == " ":
            st = self.runner.stats()
            (self.runner.resume if st.paused else self.runner.pause)()
        elif key in ("q", "Q"):
            self.runner.stop()
        elif self.session is None:
            return
        elif key in ("\x1b[A", "\x1b[B", "\x1b[C", "\x1b[D"):
            # orbit around the scene center (view.rs:116-161 drag orbit)
            cam = self.session.camera
            mins, maxs = cam._scene_aabb(self.session.scene)
            pivot = 0.5 * (np.asarray(mins) + np.asarray(maxs))
            yaw = (self.ORBIT_STEP if key == "\x1b[C"
                   else -self.ORBIT_STEP if key == "\x1b[D" else 0.0)
            pitch = (self.ORBIT_STEP if key == "\x1b[A"
                     else -self.ORBIT_STEP if key == "\x1b[B" else 0.0)
            self.session.camera = cam.orbit(pivot, yaw, pitch)
            self._scene_dirty = True
        elif key in ("+", "="):
            self.session.camera = self.session.camera.zoom(self.ZOOM_STEP)
            self._scene_dirty = True
        elif key in ("-", "_"):
            self.session.camera = self.session.camera.zoom(
                1.0 / self.ZOOM_STEP)
            self._scene_dirty = True
        elif key == "\t":
            ents = list(self.session.scene.entities)
            if ents:
                self._sel_idx = (self._sel_idx + 1) % len(ents)
                self.session.selection.clear()
                self.session.selection.select(ents[self._sel_idx])
                self._scene_dirty = True
        elif key in ("[", "]"):
            # UPS slider (ui.rs:80-126): '[' halves the cap, ']' doubles
            # it; above 1 kUPS the throttle lifts entirely
            st = self.runner.stats()
            cur = st.step_delay or 0.0005
            delay = cur * 2.0 if key == "[" else cur * 0.5
            self.runner.set_throttles(
                step_delay=None if delay < 0.001 else delay,
                observation_delay=st.observation_delay,
            )

    def watch(self, timeout: Optional[float] = None) -> None:
        """Redraw at the refresh cadence until the runner finishes (or
        ``timeout`` seconds elapse)."""
        t0 = time.perf_counter()
        while True:
            self._poll_keys()
            self.render_once()
            if self.runner.stats().finished:
                break
            if timeout is not None and time.perf_counter() - t0 > timeout:
                break
            time.sleep(self.refresh)
        self.render_once()  # final state
