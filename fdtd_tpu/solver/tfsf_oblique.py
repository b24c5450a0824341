"""Oblique-incidence TF/SF: plane waves from ANY direction/polarization.

Beyond-reference capability (the reference has no TF/SF at all,
source.rs:99-110 is point sources only; our axis-aligned solver/tfsf.py
covers +x propagation with a dispersion-exact 1-D aux grid). Arbitrary
k-vectors can't ride a 1-D aux grid, so this module impresses ANALYTIC
incident fields through the masking-curl commutator identity:

    H pass:  H <- d_a H - d_b [ curl(E) + chi_H curl_num(E_inc)
                                         - curl_num(chi_E E_inc) ]
    E pass:  E <- c_a E + c_b [ curl(H) + chi_E curl_num(H_inc)
                                         - curl_num(chi_H H_inc) ]

where chi is the total-field box indicator sampled at each component's
Yee position. The bracketed correction terms cancel identically away
from the box surface (chi constant), so they are surface currents on the
box — the Taflove ch. 5 consistency conditions derived without per-face
bookkeeping, valid for ANY propagation direction, polarization, and the
solver's nonstandard component staggering (probes/farfield._E_OFF/_H_OFF).

Leakage floor: the analytic incident field satisfies the CONTINUOUS wave
equation, not the lattice's; the mismatch radiates from the box at the
numerical-dispersion level. Evaluating the wave with the NUMERICAL phase
velocity along k-hat (probes/farfield.numeric_wavenumber at the
waveform's center frequency, on by default via ``dispersion_f``) removes
the leading error; residual leakage is the pulse's bandwidth spread
around that frequency (a few 1e-3 of the incident amplitude at
lambda >= 12 cells, tests/test_tfsf_oblique.py). The axis-aligned
aux-grid Tfsf stays preferable when it applies; this is the general-angle
path.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

__all__ = ["ObliqueTfsf"]

# the solver's per-component Yee offsets (stencil-derived; see
# probes/farfield.py:42-43 and the NTFF centering notes)
_E_OFF = {0: (-0.5, 0.0, 0.5), 1: (0.0, -0.5, 0.5), 2: (0.0, 0.0, 0.0)}
_H_OFF = {0: (0.0, -0.5, 0.0), 1: (-0.5, 0.0, 0.0), 2: (-0.5, -0.5, 0.5)}


@dataclasses.dataclass(frozen=True)
class ObliqueTfsf:
    """Closed total-field box with an oblique incident plane wave.

    ``box`` = ((x0, x1), (y0, y1), (z0, z1)) inclusive cell ranges of the
    total-field region. ``direction`` is the propagation k-hat (any
    orientation), ``polarization`` the incident-E direction (made
    orthogonal to k-hat and normalized). ``waveform`` is any
    solver.sources waveform w(t); the wave is
    E_inc = e-hat w(t - k-hat . (r - r0) / c). ``dispersion_f``: evaluate
    the lattice's numerical phase velocity at this frequency (cycles per
    unit time) and propagate the analytic wave at it; None = physical c.
    """

    box: Tuple[Tuple[int, int], Tuple[int, int], Tuple[int, int]]
    direction: Tuple[float, float, float]
    polarization: Tuple[float, float, float]
    waveform: object
    dispersion_f: Optional[float] = None

    def frame(self):
        """(k_hat, e_hat, h_dir) orthonormal incident frame."""
        k = np.asarray(self.direction, np.float64)
        k = k / np.linalg.norm(k)
        e = np.asarray(self.polarization, np.float64)
        e = e - np.dot(e, k) * k
        n = np.linalg.norm(e)
        if n < 1e-12:
            raise ValueError("polarization parallel to direction")
        e = e / n
        h = np.cross(k, e)
        return k, e, h

    def validate(self, shape: Tuple[int, int, int]) -> None:
        for a, ((b0, b1), n) in enumerate(zip(self.box, shape)):
            if not (2 <= b0 < b1 <= n - 3):
                raise ValueError(
                    f"box axis {a}: [{b0}, {b1}] needs >= 2 cells of "
                    f"scattered-field margin inside the {n}-cell grid"
                )

    def phase_speed(self, dt: float, dx, constants) -> float:
        """Propagation speed for the analytic wave: numerical (dispersion
        relation along k-hat at ``dispersion_f``) or physical c."""
        c0 = constants.speed_of_light
        if self.dispersion_f is None:
            return c0
        from ..probes.farfield import numeric_wavenumber

        k_hat, _, _ = self.frame()
        k_num = numeric_wavenumber(
            self.dispersion_f, dt, dx, k_hat.reshape(3, 1), c0=c0
        )
        w = 2.0 * math.pi * self.dispersion_f
        return float(w / k_num.reshape(())) if np.ndim(k_num) else float(
            w / k_num
        )


def build_oblique(tfsf: ObliqueTfsf, shape, inv_dx, dt, constants, dtype):
    """Precompute the static pieces: subgrid slices, per-component chi
    masks, staggered sample phases. Returns (sub, corr_h, corr_e) where
    corr_h(t) / corr_e(t) evaluate the bracketed correction terms of the
    module docstring on the subgrid for one tick."""
    tfsf.validate(shape)
    k_hat, e_hat, h_dir = tfsf.frame()
    eta = np.sqrt(constants.vacuum_permeability / constants.vacuum_permittivity)
    c = tfsf.phase_speed(dt, tuple(1.0 / v for v in inv_dx), constants)
    dx = np.asarray([1.0 / v for v in inv_dx], np.float64)

    # subgrid: box plus 2 cells (commutator support is box +/- 1; one more
    # so every used stencil is interior to the subgrid)
    lo = [b0 - 2 for (b0, b1) in tfsf.box]
    hi = [b1 + 3 for (b0, b1) in tfsf.box]  # exclusive
    sub = tuple(slice(l, h) for l, h in zip(lo, hi))
    sub_shape = tuple(h - l for l, h in zip(lo, hi))

    r0 = np.array([(b0 + b1) / 2.0 for (b0, b1) in tfsf.box]) * dx

    def comp_fields(offs):
        """Per component c: (chi mask (sub_shape), delay field (sub_shape))
        with delay = k_hat . (r - r0) / c at that component's positions."""
        chis, delays = [], []
        for cidx in range(3):
            off = offs[cidx]
            ax = [
                (np.arange(lo[a], hi[a], dtype=np.float64) + off[a])
                for a in range(3)
            ]
            gx, gy, gz = np.meshgrid(*ax, indexing="ij")
            pos = np.stack([gx * dx[0], gy * dx[1], gz * dx[2]])
            inside = np.ones(sub_shape, bool)
            for a, (b0, b1) in enumerate(tfsf.box):
                # component nodes at half offsets just outside the E-node
                # range belong outside; the exact cut only defines the
                # region shape — consistency comes from using the same chi
                # in both commutator terms
                p = [gx, gy, gz][a]
                inside &= (p >= b0 - 0.25) & (p <= b1 + 0.25)
            delay = (
                k_hat[0] * (pos[0] - r0[0])
                + k_hat[1] * (pos[1] - r0[1])
                + k_hat[2] * (pos[2] - r0[2])
            ) / c
            chis.append(jnp.asarray(inside, jnp.float32))
            delays.append(jnp.asarray(delay, jnp.float32))
        return chis, delays

    chi_e, delay_e = comp_fields(_E_OFF)
    chi_h, delay_h = comp_fields(_H_OFF)
    w = tfsf.waveform

    def e_inc(t):
        return [jnp.asarray(e_hat[c], jnp.float32) * w(t - delay_e[c])
                for c in range(3)]

    def h_inc(t):
        return [jnp.asarray(h_dir[c] / eta, jnp.float32) * w(t - delay_h[c])
                for c in range(3)]

    inv_x, inv_y, inv_z = (float(v) for v in inv_dx)

    def bdiff(f, axis):
        # backward difference f[i] - f[i-1]; subgrid interior only (the
        # boundary column's garbage lies outside the commutator support)
        return f - jnp.roll(f, 1, axis)

    def fdiff(f, axis):
        return jnp.roll(f, -1, axis) - f

    def curl(f3, diff):
        dzy = diff(f3[2], 1) * inv_y
        dyz = diff(f3[1], 2) * inv_z
        dxz = diff(f3[0], 2) * inv_z
        dzx = diff(f3[2], 0) * inv_x
        dyx = diff(f3[1], 0) * inv_x
        dxy = diff(f3[0], 1) * inv_y
        return (dzy - dyz, dxz - dzx, dyx - dxy)

    def corr_h(t):
        """chi_H curl(E_inc) - curl(chi_E E_inc), backward-diff (H pass)."""
        ei = e_inc(t)
        full = curl(ei, bdiff)
        masked = curl([chi_e[c] * ei[c] for c in range(3)], bdiff)
        return tuple(chi_h[c] * full[c] - masked[c] for c in range(3))

    def corr_e(t):
        """chi_E curl(H_inc) - curl(chi_H H_inc), forward-diff (E pass)."""
        hi_ = h_inc(t)
        full = curl(hi_, fdiff)
        masked = curl([chi_h[c] * hi_[c] for c in range(3)], fdiff)
        return tuple(chi_e[c] * full[c] - masked[c] for c in range(3))

    return sub, corr_h, corr_e
