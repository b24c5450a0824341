"""Field measurement: probes (per-tick samples) and accumulators (running
reductions carried through the scan).

Counterpart of the reference's field readback (Field/FieldView,
cem-solver/src/lib.rs:97-136 and the blocking staging-map path
cem-solver/src/fdtd/wgpu/mod.rs:451-578) — but measurements here stay on
device inside the compiled scan, and only the stacked results cross to the
host. DFT probes are new capability (the reference has none; BASELINE
config 3 requires them).

All probe classes are frozen/hashable so they can key the jit cache in
simulation.py.
"""

from __future__ import annotations

import dataclasses
import enum
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..solver.state import SimState

__all__ = [
    "FieldComponent",
    "PointProbe",
    "LineProbe",
    "SliceProbe",
    "EnergyProbe",
    "DftProbe",
    "PoyntingFluxProbe",
]


class FieldComponent(enum.Enum):
    """Which field to sample (cem-solver/src/lib.rs:138-142)."""

    E = "e"
    H = "h"


def _field(state: SimState, component: FieldComponent):
    return state.e if component is FieldComponent.E else state.h


@dataclasses.dataclass(frozen=True)
class PointProbe:
    """Sample the field vector at fixed lattice points -> (n_points, 3)."""

    points: Tuple[Tuple[int, int, int], ...]
    component: FieldComponent = FieldComponent.E

    def sample(self, state: SimState, dt) -> jax.Array:
        pts = np.asarray(self.points, np.int32)
        f = _field(state, self.component)
        return jnp.stack(
            [f[c][pts[:, 0], pts[:, 1], pts[:, 2]] for c in range(3)], axis=-1
        )


@dataclasses.dataclass(frozen=True)
class LineProbe:
    """Sample the field along a lattice-axis line -> (n, 3). The
    counterpart of the reference's range-based Field readback
    (Field::field(range), cem-solver/src/lib.rs:97-136 with
    Strider::contiguous_index_range)."""

    axis: int
    start: Tuple[int, int, int]
    length: int
    component: FieldComponent = FieldComponent.E

    def sample(self, state: SimState, dt) -> jax.Array:
        f = _field(state, self.component)
        idx = [self.start[0], self.start[1], self.start[2]]
        out = []
        for c in range(3):
            sl = [slice(v, v + 1) for v in idx]
            sl[self.axis] = slice(
                self.start[self.axis], self.start[self.axis] + self.length
            )
            out.append(f[c][tuple(sl)].reshape(self.length))
        return jnp.stack(out, axis=-1)


@dataclasses.dataclass(frozen=True)
class SliceProbe:
    """Extract a full 2D lattice plane -> (3, n_a, n_b).

    The device-side half of the projection/observer pipeline
    (cem-app/src/solver/observer.rs); colormapping happens in
    viz/projection.py.
    """

    axis: int  # 0=x, 1=y, 2=z
    index: int
    component: FieldComponent = FieldComponent.E

    def sample(self, state: SimState, dt) -> jax.Array:
        f = _field(state, self.component)
        return jnp.stack(
            [
                jax.lax.index_in_dim(f[c], self.index, axis=self.axis, keepdims=False)
                for c in range(3)
            ]
        )


@dataclasses.dataclass(frozen=True)
class EnergyProbe:
    """0.5 * (eps*|E|^2 + mu*|H|^2) summed over the lattice, times dV.

    The energy invariant the reference left as commented-out debug code
    (cem-solver/src/fdtd/cpu/mod.rs:463-466, 505-508). Uniform-medium form."""

    eps: float = 1.0
    mu: float = 1.0
    cell_volume: float = 1.0

    def sample(self, state: SimState, dt) -> jax.Array:
        ee = sum(jnp.sum(c.astype(jnp.float32) ** 2) for c in state.e)
        hh = sum(jnp.sum(c.astype(jnp.float32) ** 2) for c in state.h)
        return 0.5 * (self.eps * ee + self.mu * hh) * self.cell_volume


@dataclasses.dataclass(frozen=True)
class DftProbe:
    """Running discrete Fourier transform of a field slice at fixed
    frequencies (accumulator). Produces the frequency-domain fields needed
    for scattering cross-sections and near-to-far-field transforms.

    acc[k] += plane * exp(-2j*pi*f_k*t) accumulated every tick; real/imag
    parts kept separately (TPU has no complex support in many fused paths).
    Multiply by dt on the host for the continuous-time DFT convention.
    """

    frequencies: Tuple[float, ...]
    axis: int
    index: int
    component: FieldComponent = FieldComponent.E

    def _plane(self, state: SimState) -> jax.Array:
        f = _field(state, self.component)
        return jnp.stack(
            [
                jax.lax.index_in_dim(f[c], self.index, axis=self.axis, keepdims=False)
                for c in range(3)
            ]
        ).astype(jnp.float32)

    def init(self, state: SimState, dt):
        plane = self._plane(state)
        k = len(self.frequencies)
        z = jnp.zeros((k, *plane.shape), jnp.float32)
        return (z, z)

    def update(self, acc, state: SimState, dt):
        re, im = acc
        plane = self._plane(state)
        # the just-updated field belongs to time t = tick * dt
        t = state.tick.astype(jnp.float32) * jnp.float32(dt)
        freqs = jnp.asarray(self.frequencies, jnp.float32)
        phase = (-2.0 * math.pi) * freqs * t  # (k,)
        c, s = jnp.cos(phase), jnp.sin(phase)
        bshape = (-1,) + (1,) * plane.ndim
        return (
            re + c.reshape(bshape) * plane[None],
            im + s.reshape(bshape) * plane[None],
        )

    # -- kernel-tier row-capture support (axis 1/2) ----------------------
    # Lateral-plane spectra ride the K-step CPML kernel's dft_rows
    # captures (solver/pallas_cpml_k.py): the kernel emits the raw E+H
    # line of every x-plane per tick level; the phase fold happens here,
    # outside the kernel, and reproduces update() exactly.

    def kernel_dft_rows(self):
        if self.axis not in (1, 2):
            raise ValueError("kernel_dft_rows: lateral axes only")
        return (("y" if self.axis == 1 else "z", int(self.index)),)

    def init_rows_acc(self, state, dt):
        nx = state.ex.shape[0]
        lat = state.ex.shape[2] if self.axis == 1 else state.ex.shape[1]
        z = jnp.zeros((len(self.frequencies), 3, nx, lat), jnp.float32)
        return (z, z)

    def update_from_dft_rows(self, acc, caps, tick0, dt):
        """Fold one kernel pass's (K, nx, 6, lat) capture block; equals K
        sequential update() calls on the per-tick states. ``tick0`` is
        the PRE-pass tick (levels sample ticks tick0+1 .. tick0+K)."""
        re, im = acc
        (rows,) = caps
        c0 = 0 if self.component is FieldComponent.E else 3
        rows = rows[:, :, c0: c0 + 3]  # (K, nx, 3, lat)
        kk = rows.shape[0]
        t = (
            tick0.astype(jnp.float32) + 1.0
            + jnp.arange(kk, dtype=jnp.float32)
        ) * jnp.float32(dt)
        freqs = jnp.asarray(self.frequencies, jnp.float32)
        phase = (-2.0 * math.pi) * freqs[:, None] * t[None, :]  # (F, K)
        # precision=HIGHEST: the TPU MXU's default bf16 matmul rounding
        # costs ~1e-2 relative on the spectra (measured on-chip); this
        # tiny (F, K) contraction must stay f32
        hi = jax.lax.Precision.HIGHEST
        fold_re = jnp.tensordot(jnp.cos(phase), rows, axes=(1, 0),
                                precision=hi)
        fold_im = jnp.tensordot(jnp.sin(phase), rows, axes=(1, 0),
                                precision=hi)
        # (F, nx, 3, lat) -> DftProbe layout (F, 3, nx, lat)
        return (
            re + jnp.transpose(fold_re, (0, 2, 1, 3)),
            im + jnp.transpose(fold_im, (0, 2, 1, 3)),
        )


@dataclasses.dataclass(frozen=True)
class PoyntingFluxProbe:
    """Instantaneous Poynting flux S = E x H integrated over a lattice plane,
    component normal to the plane -> scalar per sample. Basis for
    scattering/absorption cross-sections."""

    axis: int
    index: int
    cell_area: float = 1.0

    def sample(self, state: SimState, dt) -> jax.Array:
        def plane(f3, c):
            return jax.lax.index_in_dim(
                f3[c], self.index, axis=self.axis, keepdims=False
            ).astype(jnp.float32)

        a, b = {0: (1, 2), 1: (2, 0), 2: (0, 1)}[self.axis]
        s_n = plane(state.e, a) * plane(state.h, b) - plane(state.e, b) * plane(
            state.h, a
        )
        return jnp.sum(s_n) * self.cell_area
