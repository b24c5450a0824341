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

__all__ = ["BoxDft", "numeric_wavenumber", "radiation_pattern"]

# Relative Yee positions implied by the solver's stencils (backward-diff
# curl for H, forward-diff for E — solver/step.py, ref cpu/util.rs:139-194):
# pos(F[i,j,k]) = ((i,j,k) + _*_OFF[F]) * dx, anchored at pos(Ez) = (i,j,k)
# (the global anchor shift only adds an overall phase). Derived by requiring
# every difference stencil to be centered at the component it updates. NOTE
# the labeling is NOT the textbook Ex(i+1/2,j,k) one; e.g. Ey is staggered
# along BOTH y and z, and on z-faces it is E (not H) that sits off-face.
_E_OFF = {0: (-0.5, 0.0, 0.5), 1: (0.0, -0.5, 0.5), 2: (0.0, 0.0, 0.0)}
_H_OFF = {0: (0.0, -0.5, 0.0), 1: (-0.5, 0.0, 0.0), 2: (-0.5, -0.5, 0.5)}


def numeric_wavenumber(f, dt, dx, r_hat, c0=1.0):
    """Numerical FDTD wavenumber along each direction in ``r_hat`` (3, ...).

    Solves the 3-D Yee dispersion relation (Taflove ch. 4)

        (sin(w dt/2) / (c dt))^2 = sum_i (sin(k r_i dx_i / 2) / dx_i)^2

    by Newton iteration from the physical k = w/c. Plane waves in the FDTD
    lattice accumulate phase at k_num, not k; using k_num in the NTFF
    Green's function removes the dominant dispersion error of patterns
    computed from real FDTD near fields (at lambda = 12 cells, k_num
    exceeds k by ~1%, which the box-spanning phase factors amplify to
    ~10-15% pattern error)."""
    w = 2.0 * math.pi * f
    dxv = np.asarray(dx, np.float64)
    lhs = (math.sin(w * dt / 2.0) / (c0 * dt)) ** 2
    r = np.asarray(r_hat, np.float64)
    k = np.full(r.shape[1:], w / c0)
    for _ in range(30):
        s = np.zeros_like(k)
        ds = np.zeros_like(k)
        for i in range(3):
            a = r[i] * dxv[i] / 2.0
            s += (np.sin(k * a) / dxv[i]) ** 2
            ds += 2.0 * np.sin(k * a) * np.cos(k * a) * a / dxv[i] ** 2
        step = (s - lhs) / np.where(np.abs(ds) < 1e-300, 1e-300, ds)
        k = k - step
        if float(np.abs(step).max()) < 1e-14 * float(np.abs(k).max()):
            break
    return k


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
            # Center every component ON the face plane along the normal
            # (per-component Yee offsets, see _E_OFF/_H_OFF): J_s and M_s
            # must ride the SAME Huygens surface — sampling a component
            # half a cell off the face is a FIRST-order error (~k dx/2 =
            # 13% pattern error at lambda = 12 cells, the dominant NTFF
            # error before this centering). Components already on the face
            # pass through; +-1/2-offset ones average their two adjacent
            # planes (second order, the standard FDTD NTFF recipe). The
            # box must sit >= 1 cell inside the lattice.
            def centered(f3, off, c):
                d = off[c][axis]
                arr = f3[c]
                if d == 0.0:
                    p = jax.lax.index_in_dim(arr, index, axis=axis,
                                             keepdims=False)
                else:
                    lo_i = index if d < 0 else index - 1
                    p = 0.5 * (
                        jax.lax.index_in_dim(arr, lo_i, axis=axis,
                                             keepdims=False)
                        + jax.lax.index_in_dim(arr, lo_i + 1, axis=axis,
                                               keepdims=False)
                    )
                return p.astype(jnp.float32)

            pe = jnp.stack([centered(state.e, _E_OFF, c) for c in range(3)])
            ph = jnp.stack([centered(state.h, _H_OFF, c) for c in range(3)])
            b = (-1,) + (1,) * pe.ndim
            c = cos.reshape(b)
            s = sin.reshape(b)
            out.append(
                (ere + c * pe[None], eim + s * pe[None],
                 hre + c * ph[None], him + s * ph[None])
            )
        return tuple(out)

    # -- kernel-tier support (K-step CPML kernel, solver/pallas_cpml_k) --
    # The normal-centering above is LINEAR in the fields, so the DFT of a
    # centered face equals the same combination of RAW plane/row spectra
    # at the adjacent lattice indices. The kernel accumulates raw E/H
    # x-plane spectra in-kernel (dft planes) and emits raw E+H row
    # captures for the lateral faces (dft_rows); finalize_from_kernel
    # reassembles the exact update() face accumulators from them. Only
    # the x-faces' NORMAL E component (Ex, never consumed by
    # radiation_pattern — n x F drops it) is left zero: reconstructing it
    # would cost two extra in-kernel plane tensors for a dead entry.

    def kernel_parts(self):
        """((x-plane specs for the kernel's ``dft``), (row descriptors
        for ``dft_rows``)) — offsets derived from _E_OFF/_H_OFF along
        each face normal (d=0 -> face index; d=-1/2 -> avg(i, i+1);
        d=+1/2 -> avg(i-1, i))."""
        (x0, x1), (y0, y1), (z0, z1) = self.box
        planes = tuple(
            p for xf in (x0, x1)
            for p in ((xf, 0), (xf, 1), (xf + 1, 1))
        )
        rows = (("y", y0), ("y", y0 + 1), ("y", y1), ("y", y1 + 1),
                ("z", z0 - 1), ("z", z0), ("z", z1 - 1), ("z", z1))
        return planes, rows

    def kernel_dft_rows(self):
        return self.kernel_parts()[1]

    def init_rows_acc(self, state, dt):
        nx, ny, nz = state.ex.shape
        k = len(self.frequencies)
        zy = jnp.zeros((k, 6, nx, nz), jnp.float32)
        zz = jnp.zeros((k, 6, nx, ny), jnp.float32)
        return tuple((z, z) for z in (zy, zy, zy, zy, zz, zz, zz, zz))

    def update_from_dft_rows(self, accs, caps, tick0, dt):
        """Fold one kernel pass's raw row captures (one (K, nx, 6, lat)
        block per descriptor, kernel_dft_rows order) into per-descriptor
        raw spectra; tick0 is the PRE-pass tick."""
        kk = caps[0].shape[0]
        t = (
            tick0.astype(jnp.float32) + 1.0
            + jnp.arange(kk, dtype=jnp.float32)
        ) * jnp.float32(dt)
        freqs = jnp.asarray(self.frequencies, jnp.float32)
        phase = (-2.0 * math.pi) * freqs[:, None] * t[None, :]  # (F, K)
        hi = jax.lax.Precision.HIGHEST  # MXU bf16 default costs ~1e-2
        cos, sin = jnp.cos(phase), jnp.sin(phase)
        out = []
        for (re, im), rows in zip(accs, caps):
            fr = jnp.tensordot(cos, rows, axes=(1, 0), precision=hi)
            fi = jnp.tensordot(sin, rows, axes=(1, 0), precision=hi)
            out.append((re + jnp.transpose(fr, (0, 2, 1, 3)),
                        im + jnp.transpose(fi, (0, 2, 1, 3))))
        return tuple(out)

    def finalize_from_kernel(self, plane_accs, row_accs):
        """Reassemble the 6-face accumulator structure (update()'s
        output, _faces() order) from the kernel's raw spectra.

        ``plane_accs``: per kernel_parts()[0] entry, (re, im) each
        (F, 3, ny, nz). ``row_accs``: per kernel_parts()[1] entry,
        (re, im) each (F, 6, nx, lat)."""
        def comb(parts):
            # parts: per component 0..2, list of (weight, array) terms
            return jnp.stack(
                [sum(w * a for w, a in terms) if terms
                 else jnp.zeros_like(parts[-1][0][1])
                 for terms in parts],
                axis=1,
            )

        out = []
        for fi in range(2):  # x-lo, x-hi faces
            e_f, h_f, h_f1 = plane_accs[3 * fi: 3 * fi + 3]
            face = []
            for ri in range(2):
                e, h, h1 = e_f[ri], h_f[ri], h_f1[ri]
                face.append(comb([[], [(1.0, e[:, 1])], [(1.0, e[:, 2])]]))
                face.append(comb([
                    [(1.0, h[:, 0])],
                    [(0.5, h[:, 1]), (0.5, h1[:, 1])],
                    [(0.5, h[:, 2]), (0.5, h1[:, 2])],
                ]))
            # (ere, hre, eim, him) -> (ere, eim, hre, him)
            out.append((face[0], face[2], face[1], face[3]))
        for fi in range(2):  # y-lo, y-hi faces
            ra, rb = row_accs[2 * fi], row_accs[2 * fi + 1]
            face = []
            for ri in range(2):
                a, b = ra[ri], rb[ri]
                face.append(comb([
                    [(1.0, a[:, 0])],
                    [(0.5, a[:, 1]), (0.5, b[:, 1])],
                    [(1.0, a[:, 2])],
                ]))
                face.append(comb([
                    [(0.5, a[:, 3]), (0.5, b[:, 3])],
                    [(1.0, a[:, 4])],
                    [(0.5, a[:, 5]), (0.5, b[:, 5])],
                ]))
            out.append((face[0], face[2], face[1], face[3]))
        for fi in range(2):  # z-lo, z-hi faces
            rm, r0 = row_accs[4 + 2 * fi], row_accs[4 + 2 * fi + 1]
            face = []
            for ri in range(2):
                m, o = rm[ri], r0[ri]
                face.append(comb([
                    [(0.5, m[:, 0]), (0.5, o[:, 0])],
                    [(0.5, m[:, 1]), (0.5, o[:, 1])],
                    [(1.0, o[:, 2])],
                ]))
                face.append(comb([
                    [(1.0, o[:, 3])],
                    [(1.0, o[:, 4])],
                    [(0.5, m[:, 5]), (0.5, o[:, 5])],
                ]))
            out.append((face[0], face[2], face[1], face[3]))
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
    dispersion_correct: bool = True,
) -> np.ndarray:
    """Radiation intensity U(theta, phi) (per unit solid angle, arbitrary
    scale consistent across angles) for one DFT frequency.

    theta/phi are 1D arrays (radians); returns (len(theta), len(phi)).

    ``dispersion_correct`` evaluates the surface phase factors at the
    direction-dependent NUMERICAL wavenumber k_num(theta, phi) from the
    Yee dispersion relation instead of the physical k — near fields
    sampled off a real FDTD lattice carry k_num phase, and correcting for
    it cuts pattern error from ~15% to the ~2% level at lambda = 12 cells
    (tests/test_farfield.py). Disable for analytic/physical input fields.
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

    # per-direction wavenumber for the surface phase factors
    k_dir = (
        numeric_wavenumber(f, dt, dxv, r_hat, c0=c0)
        if dispersion_correct
        else np.full(r_hat.shape[1:], k)
    )

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

        if yee_stagger:
            # Yee SPATIAL staggering: BoxDft centered every component on
            # the face plane along the normal; here the per-component
            # IN-PLANE offsets (_E_OFF/_H_OFF) move each tangential
            # component to the face-CELL CENTERS (a+.5, b+.5), integrated
            # midpoint-rule over the exact face extent. A +1/2-offset
            # sample already sits at a center (take [:-1]), a -1/2 one is
            # the NEXT index ([1:]), an on-node one averages its pair.
            # Phase-shifting raw staggered samples instead is NOT
            # equivalent: the shifted sample set covers a half-cell-
            # displaced domain, leaving first-order seams at the box edges
            # (~k dx/2 = 13% pattern error at lambda = 12 cells — the
            # dominant NTFF error this recipe removes; gate in
            # tests/test_farfield.py).
            a_ax, b_ax = axes

            def centers_1axis(g, d, ax01):
                sl_lo = (slice(None, -1),) if ax01 == 0 else (slice(None), slice(None, -1))
                sl_hi = (slice(1, None),) if ax01 == 0 else (slice(None), slice(1, None))
                if d == 0.5:
                    return g[sl_lo]
                if d == -0.5:
                    return g[sl_hi]
                return 0.5 * (g[sl_lo] + g[sl_hi])

            def to_centers(fc, off_c):
                g = centers_1axis(fc, off_c[a_ax], 0)
                return centers_1axis(g, off_c[b_ax], 1)

            na1, nb1 = len(a_coords) - 1, len(b_coords) - 1
            e_c = np.zeros((3, na1, nb1), np.complex128)
            h_c = np.zeros((3, na1, nb1), np.complex128)
            for c in (a_ax, b_ax):  # tangential components only
                e_c[c] = to_centers(e_f[c], _E_OFF[c])
                h_c[c] = to_centers(h_f[c], _H_OFF[c])
            e_f, h_f = e_c, h_c
            a_pts = a_coords[:-1] + 0.5 * dxv[a_ax]
            b_pts = b_coords[:-1] + 0.5 * dxv[b_ax]
            w = np.ones((na1, nb1))
        else:
            # co-located (analytic) fields at the face nodes: trapezoidal
            # weights so edge/corner samples shared with adjacent faces
            # aren't double-counted in the closed-surface integral
            a_pts, b_pts = a_coords, b_coords
            wa = np.ones(len(a_coords)); wa[0] = wa[-1] = 0.5
            wb = np.ones(len(b_coords)); wb[0] = wb[-1] = 0.5
            w = wa[:, None] * wb[None, :]

        pts = np.zeros((3, len(a_pts), len(b_pts)))
        pts[axes[0]] = a_pts[:, None]
        pts[axes[1]] = b_pts[None, :]
        pts[axis] = index * dxv[axis]

        # equivalent currents (tangential only; cross with normal)
        j_s = np.cross(normal, np.moveaxis(h_f, 0, -1)).transpose(2, 0, 1)
        m_s = -np.cross(normal, np.moveaxis(e_f, 0, -1)).transpose(2, 0, 1)

        # phase factor exp(+j k r'.r_hat), summed over the face
        dot = np.tensordot(pts, r_hat, axes=(0, 0))  # (na, nb, nth, nph)
        base = np.exp(1j * k_dir * dot)
        for comp in range(3):
            if comp == axis:
                continue  # normal component of n x F vanishes
            n_big[comp] += np.sum(
                (w * j_s[comp])[..., None, None] * base, axis=(0, 1)
            ) * d_a
            l_big[comp] += np.sum(
                (w * m_s[comp])[..., None, None] * base, axis=(0, 1)
            ) * d_a

    n_th = np.sum(n_big * th_hat, axis=0)
    n_ph = np.sum(n_big * ph_hat, axis=0)
    l_th = np.sum(l_big * th_hat, axis=0)
    l_ph = np.sum(l_big * ph_hat, axis=0)

    u = (k**2 / (32.0 * math.pi**2 * eta)) * (
        np.abs(l_ph + eta * n_th) ** 2 + np.abs(l_th - eta * n_ph) ** 2
    )
    return u
