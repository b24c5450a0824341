"""Time-domain sources: waveforms + point forcing.

Counterpart of cem-solver/src/source.rs (GaussianPulse :38-56,
ContinousWave :58-76, WithAmplitudes :78-97) and the per-cell forcing path
(set_forcing, cem-solver/src/fdtd/cpu/mod.rs:387-410).

TPU-native design: instead of the reference's source_id-per-cell indirection
buffer (a host-mutated sparse structure rebuilt every tick), sources are a
static, trace-time-known structure-of-arrays. Waveforms are evaluated inside
the jitted step at the pre-step simulation time (matching
cem-app/src/solver/runner.rs:520-527) and the J/M contributions are
scatter-added into the freshly-updated fields — algebraically identical to
the reference's in-update source term since the coefficient multiplies the
sum (H += D_b*(-M), E += C_b*(-J)).
"""

from __future__ import annotations

import dataclasses
import math
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "GaussianPulse",
    "ContinuousWave",
    "Ricker",
    "GaussianDerivative",
    "PointSource",
    "SourceSet",
]

_KIND_GAUSSIAN = 0
_KIND_CW = 1
_KIND_RICKER = 2
_KIND_GAUSS_DERIV = 3


@dataclasses.dataclass(frozen=True)
class GaussianPulse:
    """exp(-((t - time)/duration)^2)  (source.rs:50-56)."""

    time: float
    duration: float

    def params(self) -> Tuple[int, float, float]:
        return (_KIND_GAUSSIAN, self.time, self.duration)

    def __call__(self, t):
        u = (t - self.time) / self.duration
        return jnp.exp(-(u * u))


@dataclasses.dataclass(frozen=True)
class ContinuousWave:
    """cos(2*pi*frequency*t + phase)  (source.rs:70-76)."""

    frequency: float
    phase: float = 0.0

    def params(self) -> Tuple[int, float, float]:
        return (_KIND_CW, self.phase, self.frequency)

    def __call__(self, t):
        return jnp.cos(2.0 * math.pi * self.frequency * t + self.phase)


@dataclasses.dataclass(frozen=True)
class Ricker:
    """Ricker wavelet (2nd derivative of a Gaussian), a standard FDTD
    excitation the reference lacks; peak frequency ``frequency``."""

    frequency: float
    delay: float

    def params(self) -> Tuple[int, float, float]:
        return (_KIND_RICKER, self.delay, self.frequency)

    def __call__(self, t):
        u = (math.pi * self.frequency) * (t - self.delay)
        u2 = u * u
        return (1.0 - 2.0 * u2) * jnp.exp(-u2)


@dataclasses.dataclass(frozen=True)
class GaussianDerivative:
    """d/dt of GaussianPulse — zero-DC variant useful for wideband runs."""

    time: float
    duration: float

    def params(self) -> Tuple[int, float, float]:
        return (_KIND_GAUSS_DERIV, self.time, self.duration)

    def __call__(self, t):
        u = (t - self.time) / self.duration
        return -2.0 * u / self.duration * jnp.exp(-(u * u))


Waveform = "GaussianPulse | ContinuousWave | Ricker | GaussianDerivative"


@dataclasses.dataclass(frozen=True)
class PointSource:
    """A waveform with J/M amplitude vectors at one lattice point.

    Counterpart of WithAmplitudes (source.rs:78-97) + the Source ECS
    component placed at an entity position (runner.rs:820-869).
    """

    point: Tuple[int, int, int]
    waveform: "GaussianPulse | ContinuousWave | Ricker | GaussianDerivative"
    j: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    m: Tuple[float, float, float] = (0.0, 0.0, 0.0)


class SourceSet(NamedTuple):
    """Structure-of-arrays over point sources (device-resident, static shape)."""

    points: jax.Array  # (n, 3) int32 lattice points
    j_amp: jax.Array  # (n, 3) amplitude of J
    m_amp: jax.Array  # (n, 3) amplitude of M
    kind: jax.Array  # (n,) int32 waveform kind
    p0: jax.Array  # (n,) first waveform param (t0 / phase / delay)
    p1: jax.Array  # (n,) second waveform param (duration / frequency)

    @classmethod
    def build(cls, sources: Sequence[PointSource], dtype=jnp.float32) -> "SourceSet":
        # Last source wins per cell, matching set_forcing's overwrite
        # semantics (cem-solver/src/fdtd/cpu/mod.rs:404-408).
        by_cell: dict[tuple, PointSource] = {}
        for s in sources:
            by_cell[tuple(int(c) for c in s.point)] = s
        items = list(by_cell.values())
        if not items:
            return cls.empty(dtype)
        pts = np.array([s.point for s in items], np.int32)
        j = np.array([s.j for s in items], np.float64)
        m = np.array([s.m for s in items], np.float64)
        params = [s.waveform.params() for s in items]
        kind = np.array([p[0] for p in params], np.int32)
        p0 = np.array([p[1] for p in params], np.float64)
        p1 = np.array([p[2] for p in params], np.float64)
        return cls(
            points=jnp.asarray(pts),
            j_amp=jnp.asarray(j, dtype),
            m_amp=jnp.asarray(m, dtype),
            kind=jnp.asarray(kind),
            p0=jnp.asarray(p0, dtype),
            p1=jnp.asarray(p1, dtype),
        )

    @classmethod
    def empty(cls, dtype=jnp.float32) -> "SourceSet":
        return cls(
            points=jnp.zeros((0, 3), jnp.int32),
            j_amp=jnp.zeros((0, 3), dtype),
            m_amp=jnp.zeros((0, 3), dtype),
            kind=jnp.zeros((0,), jnp.int32),
            p0=jnp.zeros((0,), dtype),
            p1=jnp.zeros((0,), dtype),
        )

    @property
    def num_sources(self) -> int:
        return self.points.shape[0]

    def values(self, t) -> Tuple[jax.Array, jax.Array]:
        """Evaluate all waveforms at time t -> (j (n,3), m (n,3))."""
        tt = jnp.asarray(t, self.p0.dtype)
        u_g = (tt - self.p0) / jnp.where(self.p1 == 0, 1.0, self.p1)
        gaussian = jnp.exp(-(u_g * u_g))
        cw = jnp.cos(2.0 * math.pi * self.p1 * tt + self.p0)
        u_r = (math.pi * self.p1) * (tt - self.p0)
        ricker = (1.0 - 2.0 * u_r * u_r) * jnp.exp(-(u_r * u_r))
        gderiv = -2.0 * u_g / jnp.where(self.p1 == 0, 1.0, self.p1) * gaussian
        value = jnp.select(
            [
                self.kind == _KIND_GAUSSIAN,
                self.kind == _KIND_CW,
                self.kind == _KIND_RICKER,
            ],
            [gaussian, cw, ricker],
            gderiv,
        )
        return value[:, None] * self.j_amp, value[:, None] * self.m_amp
