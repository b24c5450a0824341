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
from .step import CellCoefficients, _cells, _diff_backward, _diff_forward

__all__ = ["Cpml", "CpmlSimState"]


class CpmlSimState(NamedTuple):
    """SimState + 12 psi fields. Field order matches SimState so probes and
    host code using .e/.h/.tick work unchanged."""

    ex: jax.Array
    ey: jax.Array
    ez: jax.Array
    hx: jax.Array
    hy: jax.Array
    hz: jax.Array
    tick: jax.Array
    # psi_h[(comp, axis)] flattened: derivative of E_comp along axis, used in
    # the H update; likewise psi_e for derivatives of H.
    psi_h: Tuple[jax.Array, ...]
    psi_e: Tuple[jax.Array, ...]

    @property
    def e(self):
        return (self.ex, self.ey, self.ez)

    @property
    def h(self):
        return (self.hx, self.hy, self.hz)

    @property
    def shape(self):
        return self.ex.shape


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

    # -- state --------------------------------------------------------------

    def init_state(self, shape, dtype=jnp.float32) -> CpmlSimState:
        z = lambda: jnp.zeros(shape, dtype)
        active = set(self.active_axes())
        psi_h = tuple(
            z() if axis in active else jnp.zeros((), dtype) for _, axis in _TERMS
        )
        psi_e = tuple(
            z() if axis in active else jnp.zeros((), dtype) for _, axis in _TERMS
        )
        return CpmlSimState(
            ex=z(), ey=z(), ez=z(), hx=z(), hy=z(), hz=z(),
            tick=jnp.zeros((), jnp.int32), psi_h=psi_h, psi_e=psi_e,
        )

    # -- step ---------------------------------------------------------------

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
        """Build step(state: CpmlSimState, coeffs, sources) -> CpmlSimState."""
        active = set(self.active_axes())
        profs = {}
        for axis in active:
            lo, hi = self.thickness[axis]
            n = shape[axis]
            dx = 1.0 / inv_dx[axis]
            for half, key in ((False, "h"), (True, "e")):
                ik, b, c = _profiles_1d(
                    n, lo, hi, self.spec, dx, dt, constants, half
                )
                bshape = [1, 1, 1]
                bshape[axis] = n
                profs[(key, axis)] = (
                    jnp.asarray(ik, dtype).reshape(bshape),
                    jnp.asarray(b, dtype).reshape(bshape),
                    jnp.asarray(c, dtype).reshape(bshape),
                )

        def curl_with_psi(f3, psi, diff, key):
            """Curl with CPML-stretched derivatives; returns (curl, new_psi)."""
            d = {}
            new_psi = list(psi)
            for idx, (comp, axis) in enumerate(_TERMS):
                raw = diff(f3[comp], axis, bc.axis(axis), comp) * inv_dx[axis]
                if axis in active:
                    ik, b, c = profs[(key, axis)]
                    p = b * psi[idx] + c * raw
                    new_psi[idx] = p
                    raw = ik * raw + p
                d[(comp, axis)] = raw
            cx = d[(2, 1)] - d[(1, 2)]
            cy = d[(0, 2)] - d[(2, 0)]
            cz = d[(1, 0)] - d[(0, 1)]
            return (cx, cy, cz), tuple(new_psi)

        def step(
            state: CpmlSimState,
            coeffs: CellCoefficients,
            sources: Optional[SourceSet],
        ) -> CpmlSimState:
            tick = state.tick
            if sources is not None and sources.num_sources > 0:
                t = tick.astype(dtype) * jnp.asarray(dt, dtype)
                j_vals, m_vals = sources.values(t)
                px, py, pz = (
                    sources.points[:, 0],
                    sources.points[:, 1],
                    sources.points[:, 2],
                )
            else:
                j_vals = m_vals = None

            ce, psi_h = curl_with_psi(state.e, state.psi_h, _diff_backward, "h")
            h = tuple(coeffs.d_a * state.h[c] - coeffs.d_b * ce[c] for c in range(3))
            if m_vals is not None:
                db = _cells(coeffs.d_b, px, py, pz, sources.num_sources, dtype)
                h = tuple(
                    h[c].at[px, py, pz].add(
                        -(db * m_vals[:, c]).astype(dtype), mode="drop"
                    )
                    for c in range(3)
                )

            ch, psi_e = curl_with_psi(h, state.psi_e, _diff_forward, "e")
            e = tuple(coeffs.c_a * state.e[c] + coeffs.c_b * ch[c] for c in range(3))
            if j_vals is not None:
                cb = _cells(coeffs.c_b, px, py, pz, sources.num_sources, dtype)
                e = tuple(
                    e[c].at[px, py, pz].add(
                        -(cb * j_vals[:, c]).astype(dtype), mode="drop"
                    )
                    for c in range(3)
                )

            return CpmlSimState(
                ex=e[0], ey=e[1], ez=e[2], hx=h[0], hy=h[1], hz=h[2],
                tick=tick + 1, psi_h=psi_h, psi_e=psi_e,
            )

        return step
