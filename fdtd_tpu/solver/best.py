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

__all__ = ["best_step_fn"]


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
