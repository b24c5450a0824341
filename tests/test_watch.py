"""Live terminal viewer (viz/watch.py): rendering, the runner-polling
loop, and the `run --watch` CLI path.

Counterpart of the reference's solver window + texture streaming
(cem-app/src/solver/ui.rs:31-126, cem-render/src/texture/channel.rs:
17-32): the viewer must draw >= N DISTINCT frames and refresh the
stats line while the solver thread steps."""

import io
import time

import pytest

import jax.numpy as jnp
import numpy as np

import fdtd_tpu as ft
from fdtd_tpu.runner import ObserverBinding, SolverRunner, StopCondition
from fdtd_tpu.viz.targets import FrameBuffer
from fdtd_tpu.viz.watch import LiveView, render_ansi, render_ascii


def _small_sim():
    res = ft.Resolution.courant(1.0, ft.REDUCED, safety=0.9)
    grid = ft.Grid(shape=(16, 16, 16), resolution=res, constants=ft.REDUCED)
    table = ft.coefficient_table([ft.VACUUM], res, ft.REDUCED)
    src = ft.SourceSet.build(
        [ft.PointSource((8, 8, 8), ft.GaussianPulse(5 * grid.dt, 2 * grid.dt),
                        j=(0, 0, 1.0))]
    )
    return ft.Simulation(
        grid=grid,
        coeffs=ft.CellCoefficients.uniform(table[0], jnp.float32),
        sources=src,
    )


def test_render_ansi_shape_and_colors():
    img = np.zeros((32, 32, 4), np.uint8)
    img[:16] = [255, 0, 0, 255]
    img[16:] = [0, 0, 255, 255]
    art = render_ansi(img, cols=8, rows=8)
    lines = art.split("\n")
    assert len(lines) == 4  # two pixel rows per character row
    assert "38;2;255;0;0" in lines[0]  # red upper half
    assert "48;2;0;0;255" in lines[-1]  # blue lower half
    assert art.endswith("\x1b[0m")


def test_render_ascii_ramp():
    img = np.zeros((16, 16, 4), np.uint8)
    img[:, 8:] = 255
    art = render_ascii(img, cols=16, rows=8)
    lines = art.split("\n")
    assert lines[0][0] == " " and lines[0][-1] == "@"


def test_live_view_frames_and_stats(tmp_path):
    sim = _small_sim()
    fb = FrameBuffer()
    binding = ObserverBinding.slice_view(2, 8, sim.grid.shape, fb,
                                         size=(32, 32))
    runner = SolverRunner(
        sim,
        stop_condition=StopCondition.steps(60),
        observers=(binding,),
    )
    # fast observation cadence so a short run yields several frames
    runner.state.observation_delay = 0.01
    runner.state.step_delay = 0.005
    out = io.StringIO()
    png = tmp_path / "live.png"
    view = LiveView(runner, stream=out, png_path=str(png), color=False,
                    cols=24, rows=12, refresh=0.02)
    runner.start(paused=False)
    view.watch(timeout=30.0)
    runner.join(timeout=10.0)
    assert runner.error is None
    # >= 2 distinct frames rendered and more stats refreshes than frames
    assert view.frames_rendered >= 2
    assert view.stats_updates >= view.frames_rendered
    assert png.exists() and png.stat().st_size > 0
    text = out.getvalue()
    assert "tick" in text and "UPS" in text
    # the stats line advanced (at least two distinct tick values seen)
    ticks = {ln for ln in text.splitlines() if ln.startswith("[")}
    assert len(ticks) >= 2


def test_live_view_ansi_redraw_in_place():
    sim = _small_sim()
    fb = FrameBuffer()
    binding = ObserverBinding.slice_view(2, 8, sim.grid.shape, fb,
                                         size=(16, 16))
    runner = SolverRunner(sim, stop_condition=StopCondition.steps(10),
                          observers=(binding,))
    runner.state.observation_delay = 0.01
    out = io.StringIO()
    view = LiveView(runner, stream=out, color=True, cols=8, rows=8)
    runner.start(paused=False)
    view.watch(timeout=20.0)
    runner.join(timeout=10.0)
    text = out.getvalue()
    assert "\x1b[38;2;" in text  # 24-bit color cells
    assert "\x1b[" in text and "F\x1b[J" in text  # in-place cursor redraw


def test_live_view_requires_framebuffer():
    sim = _small_sim()
    runner = SolverRunner(sim, stop_condition=StopCondition.steps(1))
    try:
        LiveView(runner, stream=io.StringIO())
    except ValueError as e:
        assert "FrameBuffer" in str(e)
    else:
        raise AssertionError("expected ValueError")


def test_cli_run_watch(tmp_path, monkeypatch):
    from fdtd_tpu.cli import main

    monkeypatch.setenv("XDG_CONFIG_HOME", str(tmp_path / "cfg"))
    err = io.StringIO()
    monkeypatch.setattr("sys.stderr", err)
    rc = main([
        "run", "--steps", "20", "--dx", "0.3",
        "--out", str(tmp_path / "out"), "--watch",
        "--ticks-per-dispatch", "5",
    ])
    assert rc == 0
    live = tmp_path / "out" / "live.png"
    assert live.exists() and live.stat().st_size > 0
    text = err.getvalue()
    assert "tick" in text and "UPS" in text


def test_live_view_interactive_loop():
    """The reference's interactive scene-view loop, scripted: arrow keys
    orbit the session camera, +/- zoom, TAB cycles the selection (bright
    wireframe outline in the scene pane), [ / ] drive the UPS throttle —
    all while the solver runs (composer/view.rs:88-227 orbit/pick,
    solver/ui.rs:80-126 UPS slider)."""
    from fdtd_tpu.scene import Ball, ComposerSession, Cuboid, Entity, Isometry

    session = ComposerSession()
    session.add(Entity(name="ball", shape=Ball(1.0)))
    session.add(Entity(name="box", shape=Cuboid((0.5, 0.5, 0.5)),
                       pose=Isometry(translation=(3.0, 0.0, 0.0))))
    session.fit_camera()

    sim = _small_sim()
    fb = FrameBuffer()
    binding = ObserverBinding.slice_view(2, 8, sim.grid.shape, fb,
                                         size=(16, 16))
    runner = SolverRunner(sim, stop_condition=StopCondition.steps(40),
                          observers=(binding,))
    runner.state.observation_delay = 0.01
    runner.state.step_delay = 0.005
    out = io.StringIO()
    view = LiveView(runner, stream=out, color=False, cols=12, rows=8,
                    refresh=0.02, session=session)
    runner.start(paused=False)
    try:
        pos0 = np.asarray(session.camera.position).copy()
        # ORBIT: arrows (incl. a split escape sequence across bursts)
        view.handle_keys("\x1b[C\x1b[A")
        view.handle_keys("\x1b")
        view.handle_keys("[D")
        pos1 = np.asarray(session.camera.position)
        assert not np.allclose(pos0, pos1)
        # ZOOM in then out
        d1 = np.linalg.norm(pos1)
        view.handle_keys("+")
        assert np.linalg.norm(session.camera.position) < d1
        view.handle_keys("-")
        # SELECT: tab cycles entities, selection shows in stats + pane
        view.handle_keys("\t")
        assert [e.name for e in session.selection.entities()] == ["ball"]
        view.render_once()
        assert "sel: ball" in view._stats_line()
        art_ball = view._scene_art
        view.handle_keys("\t")
        assert [e.name for e in session.selection.entities()] == ["box"]
        view.render_once()
        assert view._scene_art is not None
        assert view._scene_art != art_ball  # outline moved entities
        # UPS throttle: '[' halves the cap, ']' doubles it, past 1 kUPS
        # the throttle lifts (step_delay None)
        d0 = runner.stats().step_delay
        view.handle_keys("[")
        assert runner.stats().step_delay == pytest.approx(d0 * 2)
        view.handle_keys("]]]]]]")
        assert runner.stats().step_delay is None
        view.watch(timeout=20.0)
    finally:
        runner.stop()
        runner.join(timeout=10.0)
    assert runner.error is None
    text = out.getvalue()
    assert "tick" in text
