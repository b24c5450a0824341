"""Convolutional PML absorbing boundaries — the full recurrence.

The reference computes CPML coefficients (fdtd/pml.rs:33-87) and allocates
psi auxiliary buffers, but every update uses psi = 0
(cem-solver/src/fdtd/cpu/mod.rs:424-425,454,498; update.wgsl:85-86,123-124)
— its PML is a no-op. This module implements the real thing (Taflove ch. 7 /
Roden & Gedney CPML):

For each lattice axis with an absorbing slab, every spatial derivative along
that axis is replaced by

    psi    <- b * psi + c * dF          (recurrence, per step)
    dF~    =  dF / kappa + psi          (stretched derivative)

with (b, c) from solver/pml.py, graded polynomially over the slab depth and
sampled at the correct Yee stagger: H-update derivatives of E are centered
at integer positions, E-update derivatives of H at half positions.

12 psi fields exist (2 tangential derivative terms x 3 axes x 2 half-updates).
They are stored full-domain with (b, c) = 0 outside the slabs (so psi stays
identically zero there); memory-lean slab-only storage is a later
optimization. Validated by plane-wave reflection tests
(tests/test_cpml.py).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import SI, PhysicalConstants
from .boundary import BoundaryConditions
from .pml import GradedPmlSpec, graded_profiles, pml_bc
from .sources import SourceSet
from .state import SimState
from .step import CellCoefficients

__all__ = ["Cpml", "CpmlSimState"]



# CpmlSimState is the engine state (SimState fields + psi + aux placeholders)
from .engine import EngineState as CpmlSimState  # noqa: E402

# the 6 (component, axis) derivative terms entering a curl
_TERMS = ((2, 1), (1, 2), (0, 2), (2, 0), (1, 0), (0, 1))


def _profiles_1d(
    n: int,
    lo: int,
    hi: int,
    spec: GradedPmlSpec,
    dx: float,
    dt: float,
    constants: PhysicalConstants,
    half: bool,
):
    """1D (inv_kappa, b, c) profiles along an axis of length n with slab
    thicknesses lo/hi (cells). ``half`` shifts sample positions by +0.5
    (E-update stagger)."""
    pos = np.arange(n, dtype=np.float64) + (0.5 if half else 0.0)
    depth = np.zeros(n, np.float64)
    if lo > 0:
        depth = np.maximum(depth, (lo - pos) / lo)
    if hi > 0:
        depth = np.maximum(depth, (pos - (n - 1 - hi)) / hi)
    depth = np.clip(depth, 0.0, 1.0)
    in_slab = depth > 0
    sigma, kappa, a = graded_profiles(depth, spec, dx, constants)
    b, c = pml_bc(sigma, kappa, a, dt, constants)
    inv_kappa = 1.0 / kappa
    # outside the slabs: identity stretch, psi forced to 0
    b = np.where(in_slab, b, 0.0)
    c = np.where(in_slab, c, 0.0)
    return inv_kappa, b, c


@dataclasses.dataclass(frozen=True)
class Cpml:
    """CPML configuration: slab thickness in cells per axis edge.

    thickness[(axis)] = (lo_cells, hi_cells); 0 disables that edge.
    Hashable (usable as a static jit argument via Simulation).
    """

    thickness: Tuple[Tuple[int, int], Tuple[int, int], Tuple[int, int]]
    spec: GradedPmlSpec = GradedPmlSpec()

    @classmethod
    def uniform(cls, cells: int, spec: GradedPmlSpec = GradedPmlSpec()) -> "Cpml":
        t = (cells, cells)
        return cls(thickness=(t, t, t), spec=spec)

    def active_axes(self) -> Tuple[int, ...]:
        return tuple(
            a for a in range(3) if self.thickness[a][0] > 0 or self.thickness[a][1] > 0
        )

    def init_state(self, shape, dtype=jnp.float32):
        from .engine import init_engine_state

        return init_engine_state(shape, dtype, cpml=self)

    def step_fn(
        self,
        shape: Tuple[int, int, int],
        *,
        inv_dx: Tuple[float, float, float],
        dt: float,
        bc: BoundaryConditions = BoundaryConditions(),
        constants: PhysicalConstants = SI,
        dtype=jnp.float32,
    ):
        from .engine import build_step

        return build_step(
            shape, inv_dx=inv_dx, dt=dt, bc=bc, constants=constants,
            dtype=dtype, cpml=self,
        )
