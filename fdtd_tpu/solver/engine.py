"""Full-featured XLA step builder: boundaries + CPML + TF/SF + sources.

Composes the featureful simulation step from orthogonal pieces (the lean
reference twin lives in step.py):

  1. point-source waveform evaluation at the pre-step time
  2. H half-update (backward-diff curl of E), CPML-stretched derivatives
  3. TF/SF H-face corrections (incident E at the old time level)
  4. 1D auxiliary-grid tick for the incident wave
  5. M point-source scatter
  6. E half-update (forward-diff curl of the NEW H), CPML-stretched
  7. TF/SF E-face corrections (incident H at the new time level)
  8. J point-source scatter

matching the reference's update order exactly where features overlap
(cem-solver/src/fdtd/cpu/mod.rs:412-516). State is one flat pytree;
unused features carry zero-size placeholders so the pytree structure is
static for jit/scan.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..constants import SI, PhysicalConstants
from .boundary import BoundaryConditions
from .sources import SourceSet
from .step import CellCoefficients, _cells, _diff_backward, _diff_forward

__all__ = ["EngineState", "build_step", "init_engine_state"]

# the 6 (component, axis) derivative terms entering a curl
_TERMS = ((2, 1), (1, 2), (0, 2), (2, 0), (1, 0), (0, 1))


class EngineState(NamedTuple):
    """SimState-compatible state + CPML psi + TF/SF auxiliary grid.

    psi entries are SLAB-resident: per _TERMS entry, a (lo_slab, hi_slab)
    pair of arrays covering only the absorber thickness along the term's
    axis (a scalar 0 placeholder when that axis has no CPML). Full-domain
    psi at 512^3 would cost 12 extra fields (6.4 GB); slabs cost the
    thickness fraction (~4%)."""

    ex: jax.Array
    ey: jax.Array
    ez: jax.Array
    hx: jax.Array
    hy: jax.Array
    hz: jax.Array
    tick: jax.Array
    psi_h: Tuple[Tuple[jax.Array, jax.Array], ...]
    psi_e: Tuple[Tuple[jax.Array, jax.Array], ...]
    aux_e: jax.Array  # () if no TF/SF
    aux_h: jax.Array
    # volumetric per-cell PML region (solver/pml_region.py): 4 psi arrays
    # of the region's box shape (2 curl terms x 2 halves); () when unused
    psi_d: Tuple[jax.Array, ...] = ()

    @property
    def e(self):
        return (self.ex, self.ey, self.ez)

    @property
    def h(self):
        return (self.hx, self.hy, self.hz)

    @property
    def shape(self):
        return self.ex.shape

    def e_stacked(self):
        import numpy as np

        return np.stack([np.asarray(c) for c in self.e])

    def h_stacked(self):
        import numpy as np

        return np.stack([np.asarray(c) for c in self.h])


def _slab_extents(n, lo, hi, half):
    """In-slab index ranges along an axis of length n.

    Integer-sampled profiles (H update) are nonzero on [0, lo) and
    [n-hi, n); half-sampled ones (E update, positions i+0.5) reach one
    plane further inward on the HIGH side: depth(i+0.5) > 0 already at
    i = n-hi-1."""
    lo_range = (0, lo)
    if half and hi > 0:
        hi_range = (n - hi - 1, n)
    else:
        hi_range = (n - hi, n)
    return lo_range, hi_range


def init_engine_state(shape, dtype=jnp.float32, cpml=None, tfsf=None,
                      dense=None) -> EngineState:
    z = lambda: jnp.zeros(shape, dtype)
    zs = lambda: jnp.zeros((), dtype)
    active = set(cpml.active_axes()) if cpml is not None else set()

    def slab_pair(axis, half):
        lo, hi = cpml.thickness[axis]
        (l0, l1), (h0, h1) = _slab_extents(shape[axis], lo, hi, half)
        shp_lo = list(shape)
        shp_lo[axis] = l1 - l0
        shp_hi = list(shape)
        shp_hi[axis] = h1 - h0
        return (jnp.zeros(shp_lo, dtype), jnp.zeros(shp_hi, dtype))

    psi_h = tuple(
        slab_pair(axis, False) if axis in active else (zs(), zs())
        for _, axis in _TERMS
    )
    psi_e = tuple(
        slab_pair(axis, True) if axis in active else (zs(), zs())
        for _, axis in _TERMS
    )
    if tfsf is not None and hasattr(tfsf, "init_aux"):
        aux_e, aux_h = tfsf.init_aux(shape[0], dtype)
    else:
        # no TF/SF, or an ObliqueTfsf (analytic incident — no aux grid)
        aux_e, aux_h = zs(), zs()
    psi_d = (
        tuple(jnp.zeros(dense.box_shape, dtype) for _ in range(4))
        if dense is not None else ()
    )
    return EngineState(
        ex=z(), ey=z(), ez=z(), hx=z(), hy=z(), hz=z(),
        tick=jnp.zeros((), jnp.int32),
        psi_h=psi_h, psi_e=psi_e, aux_e=aux_e, aux_h=aux_h, psi_d=psi_d,
    )


def build_step(
    shape: Tuple[int, int, int],
    *,
    inv_dx: Tuple[float, float, float],
    dt: float,
    bc: BoundaryConditions = BoundaryConditions(),
    constants: PhysicalConstants = SI,
    dtype=jnp.float32,
    cpml=None,
    tfsf=None,
    dense=None,
):
    """Build step(state: EngineState, coeffs, sources) -> EngineState.

    ``dense`` is an optional solver.pml_region.DensePml: a per-cell
    uniaxial CPML on an AABB subgrid (arbitrary-shape absorbers,
    runner.rs:633-676). It must not overlap boundary ``cpml`` slabs on
    the same axis (the stretches would compound)."""
    active = set(cpml.active_axes()) if cpml is not None else set()
    profs = {}
    if cpml is not None:
        from .cpml import _profiles_1d

        for axis in active:
            lo, hi = cpml.thickness[axis]
            n = shape[axis]
            dx = 1.0 / inv_dx[axis]
            for half, key in ((False, "h"), (True, "e")):
                ik, b, c = _profiles_1d(n, lo, hi, cpml.spec, dx, dt, constants, half)
                (l0, l1), (h0, h1) = _slab_extents(n, lo, hi, half)

                def slab(arr1d, a, bnd):
                    bshape = [1, 1, 1]
                    v = arr1d[a:bnd]
                    bshape[axis] = len(v)
                    return jnp.asarray(v, dtype).reshape(bshape)

                # slab-local profile slices (lo and hi ends) + the inverse
                # kappa stretch for the slabs (interior kappa == 1)
                profs[(key, axis)] = (
                    (slab(ik, l0, l1), slab(b, l0, l1), slab(c, l0, l1)),
                    (slab(ik, h0, h1), slab(b, h0, h1), slab(c, h0, h1)),
                    ((l0, l1), (h0, h1)),
                )

    oblique = None
    if tfsf is not None:
        from .tfsf_oblique import ObliqueTfsf

        if isinstance(tfsf, ObliqueTfsf):
            # arbitrary-direction plane wave: analytic incident fields via
            # the masking-curl commutator (tfsf_oblique.py); no aux grid
            from .tfsf_oblique import build_oblique

            oblique = tfsf
            ob_sub, ob_corr_h, ob_corr_e = build_oblique(
                tfsf, shape, inv_dx, dt, constants, dtype
            )
            tfsf = None

    if tfsf is not None:
        from ..coefficients import update_coefficients
        from ..grid import Resolution
        from ..material import VACUUM

        dx0 = 1.0 / inv_dx[0]
        vacuum_row = update_coefficients(
            VACUUM, Resolution(spatial=(dx0,) * 3, temporal=dt), constants
        )
        aux_coeffs = tfsf.build_aux(shape[0], vacuum_row, dt, dx0, constants, dtype)
        tfsf.validate(shape)
        lo, hi = tfsf.span
        if tfsf.is_box:
            (ylo, yhi), (zlo, zhi) = tfsf.span_y, tfsf.span_z
            xs, ys, zs = slice(lo, hi + 1), slice(ylo, yhi + 1), slice(zlo, zhi + 1)
        else:
            xs, ys, zs = slice(lo, hi + 1), slice(None), slice(None)

    if dense is not None:
        dense.validate(shape)
        if dense.axis in active:
            # live extent only: tile-padded cells are identity no-ops
            (dx0, dx1) = dense.live[dense.axis]
            lo, hi = cpml.thickness[dense.axis]
            n = shape[dense.axis]
            if dx0 < lo or dx1 > n - hi:
                raise ValueError(
                    "DensePml region overlaps a boundary CPML slab on axis "
                    f"{dense.axis}: box [{dx0}, {dx1}) vs slabs "
                    f"[0, {lo}) / [{n - hi}, {n})"
                )
        dense_coeffs = {
            "h": tuple(jnp.asarray(c, dtype) for c in dense.coeffs_h),
            "e": tuple(jnp.asarray(c, dtype) for c in dense.coeffs_e),
        }
        _dbox = tuple(slice(b0, b1) for b0, b1 in dense.box)

    def curl_with_psi(f3, psi, diff, key, psi_d=()):
        """CPML-stretched curl with SLAB-resident psi: the recurrence and
        stretch touch only the absorber thickness along each term's axis
        (the interior passes through untouched — kappa there is 1 and psi
        is identically 0). ``psi_d`` carries this half's two volumetric
        region psi arrays when a DensePml is configured."""
        d = {}
        new_psi = list(psi)
        new_psi_d = list(psi_d)
        n_dense = 0
        for idx, (comp, axis) in enumerate(_TERMS):
            raw = diff(f3[comp], axis, bc.axis(axis), comp) * inv_dx[axis]
            if dense is not None and axis == dense.axis:
                ik, b, c = dense_coeffs[key]
                sub = raw[_dbox]
                p = b * psi_d[n_dense] + c * sub
                raw = raw.at[_dbox].set(ik * sub + p)
                new_psi_d[n_dense] = p
                n_dense += 1
            if axis in active:
                (lo_prof, hi_prof, ((l0, l1), (h0, h1))) = profs[(key, axis)]
                psi_lo, psi_hi = psi[idx]
                pieces = []
                if l1 > l0:
                    ik, b, c = lo_prof
                    raw_lo = jax.lax.slice_in_dim(raw, l0, l1, axis=axis)
                    p_lo = b * psi_lo + c * raw_lo
                    psi_lo = p_lo
                    pieces.append(ik * raw_lo + p_lo)
                pieces.append(jax.lax.slice_in_dim(raw, l1, h0, axis=axis))
                if h1 > h0:
                    ik, b, c = hi_prof
                    raw_hi = jax.lax.slice_in_dim(raw, h0, h1, axis=axis)
                    p_hi = b * psi_hi + c * raw_hi
                    psi_hi = p_hi
                    pieces.append(ik * raw_hi + p_hi)
                new_psi[idx] = (psi_lo, psi_hi)
                raw = (
                    jnp.concatenate(pieces, axis=axis)
                    if len(pieces) > 1
                    else pieces[0]
                )
            d[(comp, axis)] = raw
        cx = d[(2, 1)] - d[(1, 2)]
        cy = d[(0, 2)] - d[(2, 0)]
        cz = d[(1, 0)] - d[(0, 1)]
        return (cx, cy, cz), tuple(new_psi), tuple(new_psi_d)

    def _coef_block(coef, *idx):
        return coef if jnp.ndim(coef) == 0 else coef[idx]

    def step(
        state: EngineState,
        coeffs: CellCoefficients,
        sources: Optional[SourceSet],
    ) -> EngineState:
        tick = state.tick
        t = tick.astype(dtype) * jnp.asarray(dt, dtype)
        if sources is not None and sources.num_sources > 0:
            j_vals, m_vals = sources.values(t)
            px, py, pz = (
                sources.points[:, 0],
                sources.points[:, 1],
                sources.points[:, 2],
            )
        else:
            j_vals = m_vals = None

        # --- H half-update -------------------------------------------------
        ce, psi_h, psi_d_h = curl_with_psi(
            state.e, state.psi_h, _diff_backward, "h", state.psi_d[0:2]
        )
        h = [coeffs.d_a * state.h[c] - coeffs.d_b * ce[c] for c in range(3)]

        if oblique is not None:
            # surface currents of the oblique plane wave (incident E at
            # the OLD time level, like the aux-grid path)
            corr = ob_corr_h(t)
            for c in range(3):
                db_sub = _coef_block(coeffs.d_b, *ob_sub)
                h[c] = h[c].at[ob_sub].add(
                    (-db_sub * corr[c]).astype(dtype)
                )

        aux_e, aux_h = state.aux_e, state.aux_h
        if tfsf is not None:
            # incident E at the old time level (aux not yet stepped).
            # x faces: the Hy update's +d_b*dEz/dx reads the cross-boundary
            # incident Ez (restricted to the box's lateral extent).
            hy = h[1]
            hy = hy.at[lo, ys, zs].add(
                -_coef_block(coeffs.d_b, lo, ys, zs) * aux_e[lo - 1] * inv_dx[0]
            )
            hy = hy.at[hi + 1, ys, zs].add(
                _coef_block(coeffs.d_b, hi + 1, ys, zs) * aux_e[hi] * inv_dx[0]
            )
            h[1] = hy
            if tfsf.is_box:
                # y faces: the Hx update's -d_b*dEz/dy reads incident
                # Ez = aux_e[x] across the boundary (varies along x only)
                ez_inc = aux_e[xs][:, None] * inv_dx[1]
                hx = h[0]
                hx = hx.at[xs, ylo, zs].add(
                    _coef_block(coeffs.d_b, xs, ylo, zs) * ez_inc
                )
                hx = hx.at[xs, yhi + 1, zs].add(
                    -_coef_block(coeffs.d_b, xs, yhi + 1, zs) * ez_inc
                )
                h[0] = hx
            aux_e, aux_h = tfsf.aux_step(aux_e, aux_h, aux_coeffs, t, inv_dx[0], dtype)

        if m_vals is not None:
            db = _cells(coeffs.d_b, px, py, pz, sources.num_sources, dtype)
            h = [
                h[c].at[px, py, pz].add(
                    -(db * m_vals[:, c]).astype(dtype), mode="drop"
                )
                for c in range(3)
            ]

        # --- E half-update (uses the new H) ---------------------------------
        ch, psi_e, psi_d_e = curl_with_psi(
            tuple(h), state.psi_e, _diff_forward, "e", state.psi_d[2:4]
        )
        e = [coeffs.c_a * state.e[c] + coeffs.c_b * ch[c] for c in range(3)]

        if oblique is not None:
            # incident H at the NEW (half-step advanced) time level
            corr = ob_corr_e(t + jnp.asarray(0.5 * dt, dtype))
            for c in range(3):
                cb_sub = _coef_block(coeffs.c_b, *ob_sub)
                e[c] = e[c].at[ob_sub].add(
                    (cb_sub * corr[c]).astype(dtype)
                )

        if tfsf is not None:
            # incident H at the new time level (aux just stepped).
            # x faces: the Ez update's +c_b*dHy/dx reads incident Hy.
            ez = e[2]
            ez = ez.at[lo - 1, ys, zs].add(
                -_coef_block(coeffs.c_b, lo - 1, ys, zs) * aux_h[lo] * inv_dx[0]
            )
            ez = ez.at[hi, ys, zs].add(
                _coef_block(coeffs.c_b, hi, ys, zs) * aux_h[hi + 1] * inv_dx[0]
            )
            e[2] = ez
            if tfsf.is_box:
                # z faces: the Ex update's -c_b*dHy/dz reads incident
                # Hy = aux_h[x] across the boundary
                hy_inc = aux_h[xs][:, None] * inv_dx[2]
                ex = e[0]
                ex = ex.at[xs, ys, zlo - 1].add(
                    _coef_block(coeffs.c_b, xs, ys, zlo - 1) * hy_inc
                )
                ex = ex.at[xs, ys, zhi].add(
                    -_coef_block(coeffs.c_b, xs, ys, zhi) * hy_inc
                )
                e[0] = ex

        if j_vals is not None:
            cb = _cells(coeffs.c_b, px, py, pz, sources.num_sources, dtype)
            e = [
                e[c].at[px, py, pz].add(
                    -(cb * j_vals[:, c]).astype(dtype), mode="drop"
                )
                for c in range(3)
            ]

        return EngineState(
            ex=e[0], ey=e[1], ez=e[2], hx=h[0], hy=h[1], hz=h[2],
            tick=tick + 1, psi_h=psi_h, psi_e=psi_e, aux_e=aux_e, aux_h=aux_h,
            psi_d=psi_d_h + psi_d_e,
        )

    return step
