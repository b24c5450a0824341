"""Simulation state pytree.

Counterpart of the reference's ``FdtdCpuSolverState``/``SwapBuffer``
(cem-solver/src/fdtd/cpu/mod.rs:298-358, fdtd/util.rs:22-88) — except the
TPU design needs NO double buffering: the leapfrog update only ever reads a
field at the same point it writes (the curl reads the *other* field), so with
XLA buffer donation inside ``lax.scan`` each field updates in place. This
halves resident memory vs the reference (see Grid.memory_required).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["SimState", "zero_state"]


class SimState(NamedTuple):
    """E/H fields, component-first (3, nx, ny, nz), plus the tick counter.

    ``time`` is derived as ``tick * dt`` (the reference tracks both,
    cem-solver/src/fdtd/cpu/mod.rs:446-447 in the wgpu twin; keeping only the
    integer tick avoids f32 time drift).
    """

    e: jax.Array  # (3, nx, ny, nz) electric field
    h: jax.Array  # (3, nx, ny, nz) magnetic field
    tick: jax.Array  # () int32

    @property
    def shape(self):
        return self.e.shape[1:]

    def time(self, dt: float) -> jax.Array:
        return self.tick.astype(jnp.float32) * jnp.float32(dt)


def zero_state(shape, dtype=jnp.float32) -> SimState:
    full = (3, *shape)
    return SimState(
        e=jnp.zeros(full, dtype),
        h=jnp.zeros(full, dtype),
        tick=jnp.zeros((), jnp.int32),
    )
