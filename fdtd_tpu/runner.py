"""Host-side run controller: solver thread, pause/resume, throttles, stats.

Counterpart of the reference's SolverRunner/Solver
(cem-app/src/solver/runner.rs:383-563): the simulation advances on a
dedicated thread; a shared, lock-protected ``RunnerState`` publishes
tick/sim-time/wall-times and accepts pause/resume and throttle changes; the
stop condition is evaluated every iteration; observations (field-slice
projections into PNG/GIF/frame-buffer targets) run at a throttled cadence
(default 25 FPS, runner.rs:464) so the device never stalls on rendering.

TPU-specific improvement over the reference's one-tick-per-submit loop
(fdtd/wgpu/mod.rs:98-107): ``ticks_per_dispatch`` batches multiple ticks
into one compiled scan per host round-trip, amortizing dispatch latency
while keeping the UI-ish cadence.
"""

from __future__ import annotations

import dataclasses
import threading
import time
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

from .viz.projection import ProjectionParameters, axis_plane_projection, project

__all__ = ["StopCondition", "RunnerState", "SolverRunner", "ObserverBinding"]


@dataclasses.dataclass(frozen=True)
class StopCondition:
    """Never / step limit / simulated-time limit / realtime limit
    (cem-app/src/solver/config.rs:69-87, evaluate_stop_condition
    runner.rs:933-947)."""

    step_limit: Optional[int] = None
    simulated_time_limit: Optional[float] = None
    realtime_limit: Optional[float] = None  # seconds

    @classmethod
    def never(cls) -> "StopCondition":
        return cls()

    @classmethod
    def steps(cls, n: int) -> "StopCondition":
        return cls(step_limit=n)

    def reached(self, tick: int, sim_time: float, elapsed: float) -> bool:
        if self.step_limit is not None and tick >= self.step_limit:
            return True
        if (
            self.simulated_time_limit is not None
            and sim_time >= self.simulated_time_limit
        ):
            return True
        if self.realtime_limit is not None and elapsed >= self.realtime_limit:
            return True
        return False


@dataclasses.dataclass
class RunnerState:
    """Shared stats/controls (SolverState, runner.rs:389-401)."""

    finished: bool = False
    paused: bool = True  # the reference starts paused (runner.rs:455)
    sim_time: float = 0.0
    sim_tick: int = 0
    total_running_time: float = 0.0
    last_step_time: float = 0.0
    step_delay: Optional[float] = 0.010  # <=100 UPS default (runner.rs:463)
    observation_delay: Optional[float] = 1.0 / 25.0  # ~25 FPS (runner.rs:464)


@dataclasses.dataclass
class ObserverBinding:
    """A projection + output target pair (counterpart of the observer ->
    texture-channel adapters, cem-app/src/solver/observer.rs:167-222)."""

    params: ProjectionParameters
    target: object  # PngTarget | GifTarget | FrameBuffer (viz.targets)
    size: Tuple[int, int] = (256, 256)

    @classmethod
    def slice_view(cls, axis: int, index: int, shape, target, field: str = "e",
                   size=(256, 256), color_map_fn=None) -> "ObserverBinding":
        return cls(
            params=ProjectionParameters(
                projection=tuple(
                    tuple(row) for row in axis_plane_projection(axis, index, shape)
                ),
                field=field,
                color_map_fn=color_map_fn,
            ),
            target=target,
            size=size,
        )


class SolverRunner:
    """Run a Simulation on a background thread with live control.

    Mirrors Solver::spawn (runner.rs:436-563): starts paused, publishes
    stats every loop, honors pause via a condition variable, evaluates the
    stop condition, throttles updates and observations.
    """

    def __init__(
        self,
        simulation,
        stop_condition: StopCondition = StopCondition.never(),
        observers: Sequence[ObserverBinding] = (),
        ticks_per_dispatch: int = 1,
        on_observation: Optional[Callable] = None,  # RepaintTrigger analog
        on_error: Optional[Callable] = None,  # UiErrorSink analog (error.rs)
    ):
        self.simulation = simulation
        self.stop_condition = stop_condition
        self.observers = list(observers)
        self.ticks_per_dispatch = max(1, int(ticks_per_dispatch))
        self.on_observation = on_observation
        self.on_error = on_error
        self.state = RunnerState()
        self._cond = threading.Condition()
        self._sim_state = None
        self._thread: Optional[threading.Thread] = None
        self.error: Optional[BaseException] = None
        # double-buffered frame streaming: the projected frame's D2H
        # readback (~10-30 ms on the tunneled TPU) overlaps the next
        # dispatch instead of stalling the solver loop (SURVEY §5
        # "async device_get"; utils/streaming.py)
        from .utils.streaming import AsyncHarvest

        self._obs_stream = AsyncHarvest(depth=1)

    # -- controls (runner.rs:414-434) ----------------------------------------

    def pause(self) -> None:
        with self._cond:
            self.state.paused = True

    def resume(self) -> None:
        with self._cond:
            self.state.paused = False
            self._cond.notify_all()

    def stop(self) -> None:
        with self._cond:
            self.state.finished = True
            self._cond.notify_all()

    def stats(self) -> RunnerState:
        with self._cond:
            return dataclasses.replace(self.state)

    def set_throttles(
        self, step_delay: Optional[float] = None, observation_delay: Optional[float] = None
    ) -> None:
        """Live UPS/FPS sliders (cem-app/src/solver/ui.rs:31-126)."""
        with self._cond:
            self.state.step_delay = step_delay
            self.state.observation_delay = observation_delay

    @property
    def sim_state(self):
        return self._sim_state

    # -- lifecycle ------------------------------------------------------------

    def start(self, paused: bool = True):
        """Spawn the solver thread (Solver::spawn, runner.rs:436)."""
        if self._thread is not None:
            raise RuntimeError("runner already started")
        self._sim_state = self.simulation.init()
        self.state.paused = paused
        self._thread = threading.Thread(target=self._loop, name="solver", daemon=True)
        self._thread.start()
        return self

    def join(self, timeout: Optional[float] = None) -> None:
        if self._thread is not None:
            self._thread.join(timeout)

    def run_blocking(self) -> None:
        """Convenience: start unpaused and wait for the stop condition."""
        if self._thread is None:
            self.start(paused=False)
        else:
            self.resume()
        self.join()
        if self.error is not None:
            raise self.error

    # -- internals -------------------------------------------------------------

    def _observe(self, tick: int, flush: bool = False) -> None:
        for binding in self.observers:
            img = project(self._sim_state, binding.params, binding.size)
            for host_img, (b, t) in self._obs_stream.push(
                img, (binding, tick)
            ):
                b.target.write(host_img, t)
        if flush:
            self._flush_observers()
        if self.on_observation is not None:
            self.on_observation(tick)

    def _flush_observers(self) -> None:
        for host_img, (b, t) in self._obs_stream.drain():
            b.target.write(host_img, t)

    def _loop(self) -> None:
        try:
            self._loop_inner()
        finally:
            # drain the in-flight observation frame on every exit path
            # (finish, stop condition, error) so targets never lose the
            # final frame to the async double buffer
            try:
                self._flush_observers()
            except BaseException as e:  # noqa: BLE001
                if self.error is None:
                    self._fail(e)

    def _loop_inner(self) -> None:
        sim = self.simulation
        dt = sim.grid.dt
        start = time.perf_counter()
        last_observation: Optional[float] = None
        total = 0.0
        last_step = 0.0
        stop_reached = False

        # observe once while paused so a viewer shows the initial state
        # (runner.rs:481-484)
        try:
            if self.state.paused and self.observers:
                # flush immediately: a paused viewer must see the
                # initial state now, not after the next observation
                self._observe(0, flush=True)
        except BaseException as e:  # noqa: BLE001
            self._fail(e)
            return

        while True:
            with self._cond:
                st = self.state
                st.sim_tick = int(self._sim_state.tick)
                st.sim_time = st.sim_tick * dt
                st.last_step_time = last_step
                st.total_running_time = total
                st.finished |= stop_reached
                if st.finished:
                    return
                while st.paused and not st.finished:
                    self._cond.wait()
                if st.finished:
                    return
                observation_delay = st.observation_delay
                step_delay = st.step_delay

            if self.stop_condition.reached(
                int(self._sim_state.tick),
                float(self._sim_state.tick) * dt,
                total,
            ):
                stop_reached = True
                continue

            t0 = time.perf_counter()
            try:
                if self.ticks_per_dispatch == 1:
                    self._sim_state = sim.jit_step(
                        self._sim_state, sim.coeffs, sim.sources
                    )
                else:
                    self._sim_state, _, _ = sim.run(
                        self._sim_state, self.ticks_per_dispatch
                    )

                do_obs = observation_delay is not None and (
                    last_observation is None
                    or (time.perf_counter() - last_observation) > observation_delay
                )
                if do_obs and self.observers:
                    self._observe(int(self._sim_state.tick))
                    last_observation = time.perf_counter()
                elif self.on_observation is not None and do_obs:
                    self.on_observation(int(self._sim_state.tick))
                    last_observation = time.perf_counter()
            except BaseException as e:  # noqa: BLE001
                self._fail(e)
                return

            last_step = time.perf_counter() - t0
            total += last_step

            if step_delay is not None:
                sleep = step_delay - last_step
                if sleep > 0:
                    time.sleep(sleep)

    def _fail(self, e: BaseException) -> None:
        self.error = e
        if self.on_error is not None:
            self.on_error(e)
        with self._cond:
            self.state.finished = True
