"""Simulation state pytree.

Counterpart of the reference's ``FdtdCpuSolverState``/``SwapBuffer``
(cem-solver/src/fdtd/cpu/mod.rs:298-358, fdtd/util.rs:22-88) — except the
TPU design needs NO double buffering: the leapfrog update only ever reads a
field at the same point it writes (the curl reads the *other* field), so with
XLA buffer donation inside ``lax.scan`` each field updates in place. This
halves resident memory vs the reference (see Grid.memory_required).

Layout note (TPU-critical): each of the six field components is its own
(nx, ny, nz) array. A fused (3, nx, ny, nz) array tempts XLA into layouts
with the size-3 axis minormost, which the (8, 128) TPU tile pads 3 -> 128:
a 42x memory blowup observed in practice. Separate arrays always keep
(ny-or-nz)-major layouts and map cleanly onto Pallas blocks.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["SimState", "zero_state", "state_from_stacked"]


class SimState(NamedTuple):
    """Six field component arrays (nx, ny, nz) + the tick counter.

    ``time`` is derived as ``tick * dt`` (the reference tracks both,
    cem-solver/src/fdtd/wgpu/mod.rs:446-447; the integer tick avoids f32
    time drift).
    """

    ex: jax.Array
    ey: jax.Array
    ez: jax.Array
    hx: jax.Array
    hy: jax.Array
    hz: jax.Array
    tick: jax.Array  # () int32

    @property
    def e(self) -> Tuple[jax.Array, jax.Array, jax.Array]:
        return (self.ex, self.ey, self.ez)

    @property
    def h(self) -> Tuple[jax.Array, jax.Array, jax.Array]:
        return (self.hx, self.hy, self.hz)

    @property
    def shape(self):
        return self.ex.shape

    def time(self, dt: float) -> jax.Array:
        return self.tick.astype(jnp.float32) * jnp.float32(dt)

    # -- host-side convenience (stacked (3, nx, ny, nz) views) --------------

    def e_stacked(self) -> np.ndarray:
        return np.stack([np.asarray(c) for c in self.e])

    def h_stacked(self) -> np.ndarray:
        return np.stack([np.asarray(c) for c in self.h])


def zero_state(shape, dtype=jnp.float32) -> SimState:
    z = lambda: jnp.zeros(shape, dtype)
    return SimState(
        ex=z(), ey=z(), ez=z(), hx=z(), hy=z(), hz=z(),
        tick=jnp.zeros((), jnp.int32),
    )


def state_from_stacked(e, h, tick: int = 0, dtype=None) -> SimState:
    """Build a SimState from (3, nx, ny, nz) stacked arrays (host API /
    test convenience)."""
    e = jnp.asarray(e, dtype)
    h = jnp.asarray(h, dtype)
    return SimState(
        ex=e[0], ey=e[1], ez=e[2], hx=h[0], hy=h[1], hz=h[2],
        tick=jnp.asarray(tick, jnp.int32),
    )
