"""Projection math, runner lifecycle, config round-trip, CLI smoke."""

import json
import os
import time

import jax.numpy as jnp
import numpy as np
import pytest

import fdtd_tpu as ft
from fdtd_tpu.viz.projection import (
    ProjectionParameters,
    axis_plane_projection,
    default_z_colormap,
    project,
)
from fdtd_tpu.viz.targets import FrameBuffer, GifTarget, PngTarget
from fdtd_tpu.runner import ObserverBinding, SolverRunner, StopCondition


def _small_sim():
    res = ft.Resolution.courant(1.0, ft.REDUCED, safety=0.9)
    grid = ft.Grid(shape=(16, 16, 16), resolution=res, constants=ft.REDUCED)
    table = ft.coefficient_table([ft.VACUUM], res, ft.REDUCED)
    src = ft.SourceSet.build(
        [ft.PointSource((8, 8, 8), ft.GaussianPulse(5 * grid.dt, 2 * grid.dt), j=(0, 0, 1.0))]
    )
    return ft.Simulation(
        grid=grid,
        coeffs=ft.CellCoefficients.uniform(table[0], jnp.float32),
        sources=src,
    )


def test_projection_colormap_matrix():
    """color_map @ (f, 1) with clamp + sRGB, matching
    fdtd/cpu/project.rs:152-160."""
    sim = _small_sim()
    state = sim.init()
    state = state._replace(ez=state.ez.at[:, :, 8].set(0.5))
    # map: R = ez, A = 1 (via the homogeneous column)
    cm = np.zeros((4, 4))
    cm[0, 2] = 1.0  # R <- ez
    cm[3, 3] = 1.0  # A <- 1
    params = ProjectionParameters(
        projection=tuple(map(tuple, axis_plane_projection(2, 8, (16, 16, 16)))),
        color_map=tuple(map(tuple, cm)),
    )
    img = project(state, params, size=(32, 32))
    assert img.shape == (32, 32, 4)
    # linear 0.5 -> sRGB ~ 188
    srgb = round((1.055 * 0.5 ** (1 / 2.4) - 0.055) * 255)
    assert abs(int(img[16, 16, 0]) - srgb) <= 1
    assert img[16, 16, 3] == 255


def test_projection_out_of_domain_is_magenta():
    sim = _small_sim()
    state = sim.init()
    proj = np.asarray(axis_plane_projection(2, 8, (16, 16, 16)))
    proj[0, 0] = 3.0  # uv -> 3x the lattice extent: most pixels out of domain
    params = ProjectionParameters(projection=tuple(map(tuple, proj)))
    img = project(state, params, size=(16, 16))
    assert (img[0, -1] == [255, 0, 255, 255]).all()


def test_default_z_colormap_signs():
    f = jnp.zeros((1, 1, 3)).at[0, 0, 2].set(0.05)
    rgba = np.asarray(default_z_colormap(f))[0, 0]
    assert rgba[0] == pytest.approx(0.5) and rgba[1] == 0.0
    f = f.at[0, 0, 2].set(-0.05)
    rgba = np.asarray(default_z_colormap(f))[0, 0]
    assert rgba[1] == pytest.approx(0.5) and rgba[0] == 0.0


def test_runner_lifecycle(tmp_path):
    sim = _small_sim()
    fb = FrameBuffer()
    binding = ObserverBinding.slice_view(2, 8, sim.grid.shape, fb, size=(32, 32))
    runner = SolverRunner(
        sim,
        stop_condition=StopCondition.steps(20),
        observers=[binding],
        ticks_per_dispatch=5,
    )
    runner.set_throttles(step_delay=None, observation_delay=0.0)
    runner.run_blocking()
    st = runner.stats()
    assert st.finished and st.sim_tick >= 20
    assert fb.latest is not None and fb.latest.shape == (32, 32, 4)


def test_runner_pause_resume():
    sim = _small_sim()
    runner = SolverRunner(sim, stop_condition=StopCondition.steps(10_000))
    runner.set_throttles(step_delay=None, observation_delay=None)
    runner.start(paused=True)
    time.sleep(0.2)
    assert runner.stats().sim_tick == 0  # starts paused (runner.rs:455)
    runner.resume()
    # first step includes jit compilation; poll for progress
    deadline = time.time() + 30
    while runner.stats().sim_tick == 0 and time.time() < deadline:
        time.sleep(0.05)
    runner.pause()
    time.sleep(0.2)
    t1 = runner.stats().sim_tick
    assert t1 > 0
    time.sleep(0.3)
    assert runner.stats().sim_tick == t1  # paused: no progress
    runner.stop()
    runner.join(2.0)
    assert runner.stats().finished


def test_targets(tmp_path):
    img = np.zeros((8, 8, 4), np.uint8)
    png = PngTarget(str(tmp_path / "f_{tick}.png"))
    p = png.write(img, tick=7)
    assert p.exists() and p.name == "f_7.png"
    with GifTarget(str(tmp_path / "a.gif"), fps=10) as gif:
        gif.write(img)
        gif.write(img)
    assert (tmp_path / "a.gif").stat().st_size > 0


def test_config_roundtrip(tmp_path):
    from fdtd_tpu.config import AppConfig, read_config_or_create

    path = tmp_path / "config.toml"
    cfg = read_config_or_create(path)  # creates defaults
    assert path.exists()
    cfg2 = read_config_or_create(path)  # reads back
    assert cfg2 == cfg


def test_cli_dump_and_info(capsys):
    from fdtd_tpu.cli import main

    assert main(["dump-default-config", "--format", "json"]) == 0
    data = json.loads(capsys.readouterr().out)
    assert "app" in data and data["app"]["observation_fps"] == 25.0

    assert main(["info"]) == 0
    info = json.loads(capsys.readouterr().out)
    assert info["backend"] == "cpu"


def test_cli_run_example(tmp_path, monkeypatch):
    from fdtd_tpu.cli import main

    monkeypatch.setenv("XDG_CONFIG_HOME", str(tmp_path / "cfg"))
    rc = main([
        "run", "--steps", "20", "--dx", "0.3", "--out", str(tmp_path / "out"),
        "--gif", "--ticks-per-dispatch", "10",
    ])
    assert rc == 0
    gifs = list((tmp_path / "out").glob("*.gif"))
    assert gifs and gifs[0].stat().st_size > 0


def test_line_probe():
    from fdtd_tpu.probes import LineProbe

    sim = _small_sim()
    state = sim.init()
    state = state._replace(ez=state.ez.at[4, 8, :].set(np.arange(16.0, dtype=np.float32)))
    line = LineProbe(axis=2, start=(4, 8, 2), length=10)
    out = np.asarray(line.sample(state, 0.1))
    assert out.shape == (10, 3)
    np.testing.assert_allclose(out[:, 2], np.arange(2.0, 12.0))
