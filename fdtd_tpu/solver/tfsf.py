"""Total-field/scattered-field plane-wave source.

New capability the reference lacks (it only has point sources,
source.rs:99-110) but BASELINE config 3 requires. Standard Taflove ch. 5
TF/SF: a slab region [lo, hi] along the propagation axis carries the total
field; outside it only the scattered field exists. The incident wave is
propagated on a 1D auxiliary Yee grid using the SAME update coefficients and
dt/dx as the main lattice, so numerical dispersion cancels exactly and
leakage stays at rounding level.

The face corrections are algebraically impressed surface currents: with our
update order (H first with backward-diff curl of E, then E with forward-diff
curl of the new H, matching cpu/mod.rs:412-516),

  H pass (uses incident E at the OLD time level):
    Hy[lo]   -= d_b * Ez_inc[lo-1] / dx
    Hy[hi+1] += d_b * Ez_inc[hi]   / dx
  E pass (uses incident H at the NEW time level):
    Ez[lo-1] -= c_b * Hy_inc[lo]   / dx
    Ez[hi]   += c_b * Hy_inc[hi+1] / dx

Two geometries share the same aux grid:

- SLAB (``span_y``/``span_z`` = None): the total-field region spans the full
  y/z extent; only the two x faces carry corrections.
- CLOSED BOX (both given): the standard Taflove 3D TF/SF box. The four
  lateral faces gain corrections for the stencil terms whose incident
  component is nonzero: the backward-diff dEz/dy in the Hx update (y faces,
  incident Ez = aux_e[x]) and the forward-diff dHy/dz in the Ex update
  (z faces, incident Hy = aux_h[x]). Incident Ey/Ex/Hx/Hz are identically
  zero for +x propagation with E = z, so no other face terms exist. Every
  correction injects the incident value of the exact stencil NEIGHBOR that
  sits across the boundary (no interpolation), so leakage stays at
  slab-level rounding (tests/test_tfsf.py::test_tfsf_box_leakage).

Propagation is along +x, polarization E = z. The auxiliary grid has a
graded impedance-matched lossy ramp at its far end (a 1D PML) so nothing
re-enters, and a hard source at index 0.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["Tfsf"]


@dataclasses.dataclass(frozen=True)
class Tfsf:
    """TF/SF slab configuration.

    ``span`` = (lo, hi) inclusive cell range of the total-field region along
    x. ``waveform`` is any solver.sources waveform. Aux-grid absorber and
    margin are tunable but rarely need to be.
    """

    span: Tuple[int, int]
    waveform: object
    amplitude: float = 1.0
    aux_margin: int = 64
    absorber_cells: int = 48
    # closed-box mode: inclusive total-field cell ranges along y and z.
    # Both None -> slab (full lateral extent, x faces only).
    span_y: Optional[Tuple[int, int]] = None
    span_z: Optional[Tuple[int, int]] = None

    @property
    def is_box(self) -> bool:
        return self.span_y is not None or self.span_z is not None

    def validate(self, shape: Tuple[int, int, int]) -> None:
        lo, hi = self.span
        if not (0 < lo <= hi < shape[0] - 1):
            raise ValueError(f"TF/SF span {self.span} must be inside (0, {shape[0]-1})")
        if self.is_box:
            if self.span_y is None or self.span_z is None:
                raise ValueError(
                    "TF/SF box mode needs BOTH span_y and span_z (or neither for a slab)"
                )
            for name, (a, b), n in (
                ("span_y", self.span_y, shape[1]),
                ("span_z", self.span_z, shape[2]),
            ):
                if not (0 < a <= b < n - 1):
                    raise ValueError(f"TF/SF {name} ({a}, {b}) must be inside (0, {n-1})")

    def aux_length(self, nx: int) -> int:
        return nx + self.aux_margin + self.absorber_cells

    def build_aux(
        self,
        nx: int,
        row,
        dt: float,
        dx: float,
        constants,
        dtype=jnp.float32,
    ):
        """Per-cell 1D coefficient arrays (ca, cb, da, db) of length
        aux_length, vacuum in the working region, graded lossy ramp at the
        far end."""
        from ..coefficients import update_coefficients
        from ..material import Material

        n = self.aux_length(nx)
        t = self.absorber_cells
        ca = np.empty(n)
        cb = np.empty(n)
        da = np.empty(n)
        db = np.empty(n)
        eps = constants.vacuum_permittivity
        mu = constants.vacuum_permeability
        # target: strong absorption over t cells; polynomial grading
        sigma_max = 1.5 / (dx * np.sqrt(mu / eps))  # ~matched, empirical
        for i in range(n):
            depth = max(0.0, (i - (n - t)) / t)
            sigma = sigma_max * depth**3
            m = Material(
                electrical_conductivity=sigma,
                magnetic_conductivity=sigma * mu / eps,  # impedance matched
            )
            from ..grid import Resolution

            c = update_coefficients(
                m, Resolution(spatial=(dx, dx, dx), temporal=dt), constants
            )
            ca[i], cb[i], da[i], db[i] = c
        return tuple(jnp.asarray(v, dtype) for v in (ca, cb, da, db))

    def init_aux(self, nx: int, dtype=jnp.float32):
        n = self.aux_length(nx)
        return jnp.zeros(n, dtype), jnp.zeros(n, dtype)

    def aux_step(self, aux_e, aux_h, aux_coeffs, t, inv_dx, dtype):
        """One 1D Yee tick mirroring the main update order; hard E source at
        index 0 evaluated at the pre-step time (like main sources)."""
        ca, cb, da, db = aux_coeffs
        value = jnp.asarray(self.amplitude, dtype) * self.waveform(t).astype(dtype)
        aux_e = aux_e.at[0].set(value)
        # H: backward diff of E (zero at left edge)
        de = jnp.concatenate([aux_e[:1] * 0, aux_e[1:] - aux_e[:-1]])
        aux_h = da * aux_h + db * de * inv_dx
        # E: forward diff of the new H (zero at right edge)
        dh = jnp.concatenate([aux_h[1:] - aux_h[:-1], aux_h[-1:] * 0])
        aux_e = ca * aux_e + cb * dh * inv_dx
        return aux_e, aux_h
