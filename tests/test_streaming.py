"""Async device->host streaming (utils/streaming.AsyncHarvest).

Gate: the double buffer must deliver every pushed frame exactly once,
in push order, with values identical to a synchronous readback — and
the runner's observation path must not lose the final frame to the
in-flight window (drained on every loop exit)."""

import jax.numpy as jnp
import numpy as np

from fdtd_tpu.utils.streaming import AsyncHarvest


def test_order_and_values_depth1():
    stream = AsyncHarvest(depth=1)
    got = []
    for i in range(5):
        tree = {"a": jnp.full((4,), float(i)), "t": i}
        got += stream.push(tree, i)
    got += stream.drain()
    assert [m for _, m in got] == list(range(5))
    for (tree, m) in got:
        assert isinstance(tree["a"], np.ndarray)
        np.testing.assert_array_equal(tree["a"], np.full((4,), float(m)))


def test_window_semantics():
    stream = AsyncHarvest(depth=2)
    assert stream.push(jnp.zeros(3), 0) == []
    assert stream.push(jnp.zeros(3), 1) == []
    out = stream.push(jnp.zeros(3), 2)
    assert [m for _, m in out] == [0]
    assert len(stream) == 2
    assert [m for _, m in stream.drain()] == [1, 2]
    assert len(stream) == 0


def test_depth0_is_synchronous():
    stream = AsyncHarvest(depth=0)
    out = stream.push(jnp.arange(3.0), "x")
    assert [m for _, m in out] == ["x"]
    assert stream.drain() == []


def test_runner_observation_delivers_every_frame():
    # counting target: with the async window, frames written must equal
    # frames observed once the runner finishes (flush-at-exit)
    import fdtd_tpu as ft
    from fdtd_tpu.runner import ObserverBinding, SolverRunner, StopCondition

    class CountingTarget:
        def __init__(self):
            self.frames = []

        def write(self, img, tick):
            assert isinstance(img, np.ndarray)
            self.frames.append(int(tick))

    res = ft.Resolution.courant(1.0, ft.REDUCED, safety=0.9)
    grid = ft.Grid(shape=(16, 16, 16), resolution=res, constants=ft.REDUCED)
    table = ft.coefficient_table([ft.VACUUM], res, ft.REDUCED)
    src = ft.SourceSet.build(
        [ft.PointSource((8, 8, 8), ft.GaussianPulse(5 * grid.dt, 2 * grid.dt),
                        j=(0, 0, 1.0))]
    )
    sim = ft.Simulation(
        grid=grid,
        coeffs=ft.CellCoefficients.uniform(table[0], jnp.float32),
        sources=src,
    )
    tgt = CountingTarget()
    binding = ObserverBinding.slice_view(2, 8, grid.shape, tgt,
                                         size=(16, 16))
    runner = SolverRunner(
        sim, stop_condition=StopCondition.steps(12), observers=[binding],
        ticks_per_dispatch=4,
    )
    runner.set_throttles(step_delay=None, observation_delay=0.0)
    runner.run_blocking()
    assert runner.stats().finished
    # every observation made it out, in tick order, none stuck in-flight
    assert tgt.frames == sorted(tgt.frames)
    assert len(tgt.frames) >= 3
