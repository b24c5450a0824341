"""Near-to-far-field transform (frequency domain).

New capability (the reference has no far-field machinery; BASELINE config 4
requires a radiation pattern). Standard surface-equivalence NTFF
(Taflove ch. 8): frequency-domain tangential fields on a closed virtual box
yield equivalent currents J_s = n x H, M_s = -n x E; the radiation vectors

    N(theta, phi) = surface_integral J_s exp(+j k r'.r_hat) dA
    L(theta, phi) = surface_integral M_s exp(+j k r'.r_hat) dA

give the far-zone fields E_theta = -jk/(4 pi r) e^{-jkr} (L_phi + eta N_theta),
E_phi = +jk/(4 pi r) e^{-jkr} (L_theta - eta N_phi) and the radiation
intensity U = (k^2 / (32 pi^2 eta)) (|L_phi + eta N_theta|^2 +
|L_theta - eta N_phi|^2).

Workflow: attach a ``BoxDft`` accumulator to Simulation.run (it rides the
scan like any accumulator, sampling all 6 faces of the box each tick), then
call ``radiation_pattern`` on the result.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..solver.state import SimState

__all__ = ["BoxDft", "radiation_pattern"]


@dataclasses.dataclass(frozen=True)
class BoxDft:
    """Running DFT of tangential E and H on the 6 faces of a lattice box.

    ``box`` = ((x0, x1), (y0, y1), (z0, z1)), inclusive plane indices. The
    accumulator state is a dict face -> (E_re, E_im, H_re, H_im), each
    (n_freq, 3, a, b) f32.
    """

    frequencies: Tuple[float, ...]
    box: Tuple[Tuple[int, int], Tuple[int, int], Tuple[int, int]]

    def _faces(self):
        for axis in range(3):
            lo, hi = self.box[axis]
            yield (axis, lo, -1.0)
            yield (axis, hi, +1.0)

    def _plane(self, f3, axis, index):
        return jnp.stack(
            [
                jax.lax.index_in_dim(f3[c], index, axis=axis, keepdims=False)
                for c in range(3)
            ]
        ).astype(jnp.float32)

    def init(self, state: SimState, dt):
        acc = []
        k = len(self.frequencies)
        for axis, index, _sign in self._faces():
            pe = self._plane(state.e, axis, index)
            z = jnp.zeros((k, *pe.shape), jnp.float32)
            acc.append((z, z, z, z))
        return tuple(acc)

    def update(self, acc, state: SimState, dt):
        t = state.tick.astype(jnp.float32) * jnp.float32(dt)
        freqs = jnp.asarray(self.frequencies, jnp.float32)
        phase = (-2.0 * math.pi) * freqs * t
        cos = jnp.cos(phase)
        sin = jnp.sin(phase)
        out = []
        for (ere, eim, hre, him), (axis, index, _sign) in zip(acc, self._faces()):
            pe = self._plane(state.e, axis, index)
            ph = self._plane(state.h, axis, index)
            b = (-1,) + (1,) * pe.ndim
            c = cos.reshape(b)
            s = sin.reshape(b)
            out.append(
                (ere + c * pe[None], eim + s * pe[None],
                 hre + c * ph[None], him + s * ph[None])
            )
        return tuple(out)


def radiation_pattern(
    box_dft: BoxDft,
    acc,
    *,
    dt: float,
    dx: Tuple[float, float, float],
    theta: np.ndarray,
    phi: np.ndarray,
    freq_index: int = 0,
    eta: float = 1.0,
    c0: float = 1.0,
    yee_stagger: bool = True,
) -> np.ndarray:
    """Radiation intensity U(theta, phi) (per unit solid angle, arbitrary
    scale consistent across angles) for one DFT frequency.

    theta/phi are 1D arrays (radians); returns (len(theta), len(phi)).
    """
    f = box_dft.frequencies[freq_index]
    k = 2.0 * math.pi * f / c0
    dxv = np.asarray(dx, np.float64)

    th = np.asarray(theta)[:, None]
    ph_ = np.asarray(phi)[None, :]
    st, ct = np.sin(th), np.cos(th)
    sp, cp = np.sin(ph_), np.cos(ph_)
    r_hat = np.stack(
        [st * cp, st * sp, ct * np.ones_like(sp)], axis=0
    )  # (3, nth, nph)
    th_hat = np.stack([ct * cp, ct * sp, -st * np.ones_like(sp)], axis=0)
    ph_hat = np.stack([-sp * np.ones_like(st), cp * np.ones_like(st), np.zeros_like(st * sp)], axis=0)

    n_big = np.zeros((3, th.shape[0], ph_.shape[1]), np.complex128)
    l_big = np.zeros_like(n_big)

    faces = list(box_dft._faces())
    # Leapfrog time stagger: H stored at tick k is the field at (k - 1/2)*dt
    # (the H half-update precedes the E half-update within a tick), so its
    # DFT carries a spurious e^{-j w dt/2}; compensate.
    h_phase = np.exp(1j * math.pi * f * dt) if yee_stagger else 1.0
    for (ere, eim, hre, him), (axis, index, sign) in zip(acc, faces):
        e_f = (np.asarray(ere[freq_index]) + 1j * np.asarray(eim[freq_index])) * dt
        h_f = (np.asarray(hre[freq_index]) + 1j * np.asarray(him[freq_index])) * dt * h_phase
        # face normal
        normal = np.zeros(3)
        normal[axis] = sign
        # in-plane axes and cell area
        axes = [a for a in range(3) if a != axis]
        d_a = dxv[axes[0]] * dxv[axes[1]]
        # coordinates of face sample points (lattice units -> physical)
        (x0, x1), (y0, y1), (z0, z1) = box_dft.box
        lo = np.array([x0, y0, z0], np.float64)
        hi = np.array([x1, y1, z1], np.float64)
        # the DFT planes span the FULL lattice in-plane; restrict to the box
        a_sl = slice(int(lo[axes[0]]), int(hi[axes[0]]) + 1)
        b_sl = slice(int(lo[axes[1]]), int(hi[axes[1]]) + 1)
        e_f = e_f[:, a_sl, b_sl]
        h_f = h_f[:, a_sl, b_sl]
        a_coords = np.arange(int(lo[axes[0]]), int(hi[axes[0]]) + 1) * dxv[axes[0]]
        b_coords = np.arange(int(lo[axes[1]]), int(hi[axes[1]]) + 1) * dxv[axes[1]]
        pts = np.zeros((3, len(a_coords), len(b_coords)))
        pts[axes[0]] = a_coords[:, None]
        pts[axes[1]] = b_coords[None, :]
        pts[axis] = index * dxv[axis]
        # trapezoidal weights: edge/corner samples are shared with adjacent
        # faces — full weight would double-count them in the closed-surface
        # integral
        wa = np.ones(len(a_coords)); wa[0] = wa[-1] = 0.5
        wb = np.ones(len(b_coords)); wb[0] = wb[-1] = 0.5
        w = wa[:, None] * wb[None, :]
        # Spatial stagger: E components are co-located at +(.5,.5,.5)*dx
        # relative to H (cpu/util.rs:139-166) — separate phase centers.
        # The co-located staggering (all E at one point, all H at another)
        # leaves no net inter-field phase-center offset that improves the
        # NTFF empirically; only the leapfrog TIME stagger correction
        # (h_phase above) measurably helps. Validated against analytic
        # dipole fields in tests/test_farfield.py.
        pts_e = pts
        pts_h = pts

        # equivalent currents (tangential only; cross with normal)
        j_s = np.cross(normal, np.moveaxis(h_f, 0, -1)).transpose(2, 0, 1)
        m_s = -np.cross(normal, np.moveaxis(e_f, 0, -1)).transpose(2, 0, 1)

        # phase factor exp(+j k r'.r_hat), summed over the face
        dot_h = np.tensordot(pts_h, r_hat, axes=(0, 0))  # (na, nb, nth, nph)
        dot_e = np.tensordot(pts_e, r_hat, axes=(0, 0))
        phase_h = np.exp(1j * k * dot_h)
        phase_e = np.exp(1j * k * dot_e)
        for comp in range(3):
            n_big[comp] += np.sum(
                (w * j_s[comp])[..., None, None] * phase_h, axis=(0, 1)
            ) * d_a
            l_big[comp] += np.sum(
                (w * m_s[comp])[..., None, None] * phase_e, axis=(0, 1)
            ) * d_a

    n_th = np.sum(n_big * th_hat, axis=0)
    n_ph = np.sum(n_big * ph_hat, axis=0)
    l_th = np.sum(l_big * th_hat, axis=0)
    l_ph = np.sum(l_big * ph_hat, axis=0)

    u = (k**2 / (32.0 * math.pi**2 * eta)) * (
        np.abs(l_ph + eta * n_th) ** 2 + np.abs(l_th - eta * n_ph) ** 2
    )
    return u
