"""Dispatch to the fastest step implementation for a given configuration.

bench.py and the runner route through here so kernel improvements land
everywhere at once. Falls back to the pure-XLA step when the Pallas kernel
doesn't support the configuration (non-TPU backend, odd shapes, exotic
boundary conditions).
"""

from __future__ import annotations

from typing import Tuple

import jax

from .boundary import BoundaryConditions
from .step import step_fn

__all__ = ["best_step_fn", "best_multi_step_fn"]


def best_multi_step_fn(
    shape: Tuple[int, int, int],
    *,
    inv_dx: Tuple[float, float, float],
    dt: float,
    bc: BoundaryConditions = BoundaryConditions(),
    dtype=None,
    max_k: int = 10,
    max_sources: int = 1,
):
    """Fastest (step_fn, k) advancing k ticks per call.

    Prefers the K-step temporally-blocked kernel; falls back through
    smaller K and finally the single-step path. At big lateral planes
    (>= 512^2) K=8 leads the ladder: measured round 5 on v5e at 512^3
    f32, K=8 runs 36.5 Gcell/s vs K=10's 32.5 — the shallower pipeline
    relieves VMEM pressure and schedules better; smaller planes keep
    the K=10-first ladder (41+ at 256^3). The returned function has
    signature step(state, coeffs, sources) and advances ``k`` ticks
    (tick += k).
    """
    import jax
    import jax.numpy as jnp

    dtype = dtype or jnp.float32
    backend = jax.default_backend()
    if backend == "tpu":
        try:
            from .pallas_stepk import pallas_stepk_fn, supports_k

            ladder = list(range(max_k, 1, -1))
            # measured round 5 on v5e at 512^3: f32 36.5 (K=8) vs 32.5
            # (K=10), bf16 44.0 vs 39.6 — K=8 leads at big planes
            if shape[1] * shape[2] >= 512 * 512 and 8 in ladder:
                ladder.remove(8)
                ladder.insert(0, 8)
            for k in ladder:
                if supports_k(shape, bc, k, dtype=dtype):
                    return (
                        pallas_stepk_fn(
                            shape, k, inv_dx=inv_dx, dt=dt, bc=bc,
                            dtype=dtype, max_sources=max_sources,
                        ),
                        k,
                    )
        except ImportError:
            pass
    return best_step_fn(shape, inv_dx=inv_dx, dt=dt, bc=bc), 1


def best_step_fn(
    shape: Tuple[int, int, int],
    *,
    inv_dx: Tuple[float, float, float],
    dt: float,
    bc: BoundaryConditions = BoundaryConditions(),
):
    backend = jax.default_backend()
    if backend == "tpu" or backend == "axon":
        try:
            from .pallas_step import pallas_step_fn, supports

            if supports(shape, bc):
                return pallas_step_fn(shape, inv_dx=inv_dx, dt=dt, bc=bc)
        except ImportError:
            pass
    return step_fn(inv_dx=inv_dx, dt=dt, bc=bc)
