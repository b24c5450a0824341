"""Fused Pallas kernel with IN-KERNEL CPML (+ slab TF/SF): one absorbing
leapfrog tick in a single lattice pass.

The composed XLA engine (engine.py) runs absorbing-boundary simulations at
~1.9 Gcell/s: every stretched derivative materializes slices and concats in
HBM. This kernel keeps the whole CPML recurrence inside the fused
descending-x sweep of pallas_step.py, so an absorbing tick costs the same
HBM traffic as a free-space tick plus the (small) psi slabs:

    psi <- b * psi + c * dF        dF~ = dF / kappa + psi

- psi lives in SLAB tensors, not full fields. x-axis terms: (Tlo+Thi+1,
  ny, nz) with one TRASH plane — interior iterations' block index maps to
  the trash plane, and since the 1D profiles are 0 there (b = c = 0,
  1/kappa = 1) the kernel writes psi_new = 0 to it unconditionally: no
  masked stores, correctness comes from profile zeros + the trash slot.
- y/z-axis terms are PLANE-LOCAL (their recurrence never crosses x), so
  their slabs are (nx, T_pad, nz) / (nx, ny, T_pad) strips updated as the
  sweep passes each plane. Strip thicknesses are padded to the TPU tile
  (8 sublanes / 128 lanes) so the strip slice + concat stay aligned.
- The E-half's half-integer sampling extends the hi-side slab one plane
  inward (engine.py::_slab_extents) — slab extents here reuse the same
  helper, so kernel and engine agree to rounding.

TF/SF corrections ride in as a (2, aux_len) SMEM pair (OLD aux_e for the
H pass, NEW aux_h for the E pass; the 1D aux grid ticks outside in XLA):
slab mode adds plane-uniform scalars at the two x faces; CLOSED-BOX mode
masks those to the lateral spans and adds the four lateral-face
corrections as masked row/column adds gated to the box x-span. Compressed
materials (uint8 matid + (K,4) table one-hot) and in-kernel J injection
(max_sources rows) are supported; M sources and dense per-cell
coefficients stay on the engine path.

Validated against engine.build_step in interpret mode
(tests/test_pallas_cpml.py); reflection physics inherited from the engine's
CPML tests (identical arithmetic).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import SI, PhysicalConstants
from .boundary import BoundaryConditions
from .engine import _slab_extents
from .sources import SourceSet

__all__ = ["PmlKernelState", "init_pml_kernel_state", "pallas_cpml_step_fn",
           "supports_cpml"]

# stretched-derivative terms per axis: axis -> the two E/H components whose
# derivative along that axis enters a curl (solver/engine.py _TERMS regrouped)
_AXIS_COMPS = {0: (2, 1), 1: (2, 0), 2: (1, 0)}


def _pad8(n):
    return 0 if n == 0 else -(-n // 8) * 8


def _pad128(n):
    return 0 if n == 0 else -(-n // 128) * 128


class PmlKernelState(NamedTuple):
    """Fields + slab psi tensors + TF/SF aux grid for the CPML kernel."""

    ex: jax.Array
    ey: jax.Array
    ez: jax.Array
    hx: jax.Array
    hy: jax.Array
    hz: jax.Array
    tick: jax.Array
    psi: Tuple[jax.Array, ...]  # ordered per _psi_layout
    aux_e: jax.Array  # () when no TF/SF
    aux_h: jax.Array

    @property
    def e(self):
        return (self.ex, self.ey, self.ez)

    @property
    def h(self):
        return (self.hx, self.hy, self.hz)

    @property
    def shape(self):
        return self.ex.shape


def _psi_layout(shape, cpml, x_extra: int = 0):
    """Ordered psi tensor descriptors: (half, axis, comp, tensor_shape,
    (Tlo, Thi, Tlo_pad, Thi_pad)). Two tensors per (half, active axis).

    ``x_extra`` widens each x-axis slab tensor by that many planes (the
    sharded wrapper's halo depth): the lo tensor then covers lattice planes
    [0, Tlo+x_extra] and the hi tensor the last Thi+x_extra+1 planes, so a
    shard's halo offset keeps the identity plane<->slab-index alignment.
    Correctness still comes purely from profile gating: planes whose
    profile rows are zero write psi = 0."""
    nx, ny, nz = shape
    out = []
    active = set(cpml.active_axes())
    for half in ("h", "e"):
        for axis in (0, 1, 2):
            if axis not in active:
                continue
            lo, hi = cpml.thickness[axis]
            n = shape[axis]
            (l0, l1), (h0, h1) = _slab_extents(n, lo, hi, half == "e")
            t_lo, t_hi = l1 - l0, h1 - h0
            if axis == 0:
                t_lo += x_extra
                t_hi += x_extra
                # two tensors (lo/hi ends) with PURE min/max clamp index
                # maps — conditional (where/rem) index maps de-pipeline the
                # Mosaic DMA schedule. Block 't' (lo) / 0 (hi) is the trash
                # plane interior iterations clamp onto; the SMEM profiles
                # are zero there so the kernel writes psi_new = 0 to it.
                for comp in _AXIS_COMPS[axis]:
                    out.append((half, 0, comp, "lo",
                                (t_lo + 1, ny, nz), (t_lo, t_hi, t_lo, t_hi)))
                    out.append((half, 0, comp, "hi",
                                (t_hi + 1, ny, nz), (t_lo, t_hi, t_lo, t_hi)))
                continue
            if axis == 1:
                plo, phi = _pad8(t_lo), _pad8(t_hi)
                tshape = (nx, plo + phi, nz)
                pads = (t_lo, t_hi, plo, phi)
            else:
                plo, phi = _pad128(t_lo), _pad128(t_hi)
                tshape = (nx, ny, plo + phi)
                pads = (t_lo, t_hi, plo, phi)
            for comp in _AXIS_COMPS[axis]:
                out.append((half, axis, comp, None, tshape, pads))
    return out


def _profiles(shape, cpml, inv_dx, dt, constants):
    """1D profile arrays per (half, axis): full-length (3, n) for x (SMEM),
    padded strip (T_pad_total, 1) triples for y/z (VMEM)."""
    from .cpml import _profiles_1d

    profs = {}
    for half in ("h", "e"):
        for axis in set(cpml.active_axes()):
            lo, hi = cpml.thickness[axis]
            n = shape[axis]
            dx = 1.0 / inv_dx[axis]
            ik, b, c = _profiles_1d(n, lo, hi, cpml.spec, dx, dt, constants,
                                    half == "e")
            (l0, l1), (h0, h1) = _slab_extents(n, lo, hi, half == "e")
            if axis == 0:
                # (5, nx): ik shared; b/c gated separately per end so the
                # inactive end's psi recurrence writes zeros
                in_lo = np.zeros(n)
                in_lo[l0:l1] = 1.0
                in_hi = np.zeros(n)
                in_hi[h0:h1] = 1.0
                profs[(half, 0)] = np.stack(
                    [ik, b * in_lo, c * in_lo, b * in_hi, c * in_hi]
                ).astype(np.float32)
            else:
                pad = _pad8 if axis == 1 else _pad128
                plo, phi = pad(l1 - l0), pad(h1 - h0)

                def strip(arr, fill):
                    s_lo = np.full(plo, fill)
                    s_lo[: l1 - l0] = arr[l0:l1]
                    s_hi = np.full(phi, fill)
                    # REAL rows at the END of the hi pad so they line up with
                    # the plane's last rows when slicing raw[n-phi:]
                    s_hi[phi - (h1 - h0):] = arr[h0:h1]
                    return np.concatenate([s_lo, s_hi]).astype(np.float32)

                stacked = np.stack([strip(ik, 1.0), strip(b, 0.0), strip(c, 0.0)])
                # lane-axis (z) strips are stored PRE-ORIENTED (T on lanes)
                # and PRE-BROADCAST over ny sublanes: an in-kernel (T,1) ->
                # (1,T) reshape is a lane transpose, and Mosaic rejects
                # broadcasting a 1-sublane vector — a few KB of profile
                # buys layout-clean elementwise ops
                profs[(half, axis)] = (
                    stacked.reshape(3, plo + phi, 1)
                    if axis == 1
                    else np.ascontiguousarray(
                        np.broadcast_to(
                            stacked.reshape(3, 1, plo + phi),
                            (3, shape[1], plo + phi),
                        )
                    )
                )
    return profs


def init_pml_kernel_state(shape, dtype=jnp.float32, *, cpml, tfsf=None,
                          dense=None, dft=None, dft_runtime=None):
    # psi AND the TF/SF aux line are always f32: both are recurrences whose
    # bf16 rounding measurably degrades the solution (tests/test_bf16_study)
    # and whose memory footprint is marginal; only the six volumetric field
    # arrays take the (possibly bf16) storage dtype.
    z = lambda s: jnp.zeros(s, jnp.float32)
    psi = tuple(z(ts) for *_, ts, _ in _psi_layout(shape, cpml))
    if dense is not None:
        # volumetric-region psi volume consumed by the K-step kernel's
        # DensePml path: slots (h,c0),(h,c1),(e,c0),(e,c1) with a trash
        # plane at box-x index 0 (pallas_cpml_k.py dense_spec)
        bx, by, bz = dense.box_shape
        psi = psi + (z((4, bx + 1, by, bz)),)
    if dft is not None:
        # in-kernel DFT accumulators, one (6F, 2, ny, nz) tensor per
        # probe plane (pallas_cpml_k.py dft_spec; trash plane 0)
        planes, freqs = dft
        for _ in planes:
            psi = psi + (z((6 * len(freqs), 2, shape[1], shape[2])),)
    if dft_runtime is not None:
        # RUNTIME-coordinate in-kernel DFT accumulators: one resident
        # (6F, ny, nz) volume per plane, after the static dft entries
        # (pallas_cpml_k.py dft_rt; no trash plane — constant-map block)
        planes_rt, freqs_rt = dft_runtime
        for _ in planes_rt:
            psi = psi + (z((6 * len(freqs_rt), shape[1], shape[2])),)
    if tfsf is not None:
        aux_e, aux_h = tfsf.init_aux(shape[0], jnp.float32)
    else:
        aux_e = aux_h = jnp.zeros((), jnp.float32)
    return PmlKernelState(
        ex=jnp.zeros(shape, dtype), ey=jnp.zeros(shape, dtype),
        ez=jnp.zeros(shape, dtype), hx=jnp.zeros(shape, dtype),
        hy=jnp.zeros(shape, dtype), hz=jnp.zeros(shape, dtype),
        tick=jnp.zeros((), jnp.int32), psi=psi, aux_e=aux_e, aux_h=aux_h,
    )


def supports_cpml(shape, bc, cpml, dtype=jnp.float32) -> bool:
    from .boundary import Neumann

    nx, ny, nz = shape
    # bf16 is a STORAGE format: the kernels load every plane as f32,
    # compute in f32, and round on write-back. psi stays f32 always
    # (bf16 psi doubles the error of the IIR recurrence — measured in
    # tests/test_bf16_study.py; slabs are thin so the memory cost is small).
    if dtype not in (jnp.float32, jnp.bfloat16):
        return False
    if nx < 2 or ny % 8 != 0 or nz % 128 != 0:
        return False
    for cond in (bc.x, bc.y, bc.z):
        if not isinstance(cond, Neumann):
            return False
        if any(a != 0.0 for a in cond.alpha) or any(b != 0.0 for b in cond.beta):
            return False
    for axis in set(cpml.active_axes()):
        lo, hi = cpml.thickness[axis]
        n = shape[axis]
        if axis == 1 and _pad8(lo) + _pad8(hi + 1) > ny:
            return False
        if axis == 2 and _pad128(lo) + _pad128(hi + 1) > nz:
            return False
        if axis == 0 and lo + hi + 2 > nx:
            return False
    return True


def _make_kernel(shape, inv_dx, layout, nx, with_tfsf, tfsf_planes, n_src,
                 n_materials, tfsf_box, with_m=False, dense_spec=None,
                 oblique_win=None):
    inv_x, inv_y, inv_z = inv_dx
    n_psi = len(layout)
    if dense_spec is not None:
        a_d, (dx0, dx1), (dy0, dy1), (dz0, dz1) = dense_spec
        comps_d = _AXIS_COMPS[a_d]
    # oblique_win = (x0, xl, y0, by, z0, bz): ObliqueTfsf commutator
    # subgrid — analytic corrections arrive precomputed as ONE
    # (6, xl, by, bz) volume per tick (0-2 = corr_h at t, 3-5 = corr_e
    # at t + dt/2), box-clamped along x; see pallas_cpml_k's K-step
    # variant and solver/tfsf_oblique.py
    if oblique_win is not None:
        obx0, obxl, oby0, obby, obz0, obbz = oblique_win

    def kernel(*refs):
        k = 0
        coef_ref = refs[k]; k += 1  # (1,4) SMEM row, or (K,4) VMEM table
        xprof_ref = None
        if any(axis == 0 for _, axis, *_ in layout):
            xprof_ref = refs[k]; k += 1
        if with_tfsf:
            tfsf_ref = refs[k]; k += 1
        if n_src > 0:
            src_ref = refs[k]; k += 1
        # y/z strip profiles, one (3, Tpad, 1) input per (half, axis) present
        strip_prof = {}
        for half in ("h", "e"):
            for axis in (1, 2):
                if any(h == half and a == axis for h, a, *_ in layout):
                    strip_prof[(half, axis)] = refs[k]; k += 1
        if n_materials > 1:
            mid_r = refs[k]; k += 1
        if dense_spec is not None:
            dco_ref = refs[k]; k += 1
            dpsi_in = refs[k]; k += 1
        if oblique_win is not None:
            ob_ref = refs[k]; k += 1
        ex_r, ey_r, ez_r, hx_r, hy_r, hz_r, eyl_r, ezl_r = refs[k: k + 8]
        k += 8
        psi_in = refs[k: k + n_psi]; k += n_psi
        outs = refs[k: k + 6]; k += 6
        psi_out = refs[k: k + n_psi]; k += n_psi
        if dense_spec is not None:
            dpsi_out = refs[k]; k += 1
        s_hy, s_hz = refs[k], refs[k + 1]

        i = pl.program_id(0)
        p = nx - 1 - i
        f32 = jnp.float32
        ex = ex_r[0].astype(f32)
        ey = ey_r[0].astype(f32)
        ez = ez_r[0].astype(f32)
        hx = hx_r[0].astype(f32)
        hy = hy_r[0].astype(f32)
        hz = hz_r[0].astype(f32)
        ny, nz = ex.shape

        if n_materials > 1:
            # compressed materials: uint8 plane -> one-hot selects from the
            # (K, 4) table (int8 vector compares don't lower in Mosaic)
            mid = mid_r[0].astype(jnp.int32)
            c_a = jnp.zeros_like(ex)
            c_b = jnp.zeros_like(ex)
            d_a = jnp.zeros_like(ex)
            d_b = jnp.zeros_like(ex)
            for m in range(n_materials):
                sel = (mid == m).astype(f32)
                c_a += sel * coef_ref[m, 0]
                c_b += sel * coef_ref[m, 1]
                d_a += sel * coef_ref[m, 2]
                d_b += sel * coef_ref[m, 3]
        else:
            c_a = coef_ref[0, 0]
            c_b = coef_ref[0, 1]
            d_a = coef_ref[0, 2]
            d_b = coef_ref[0, 3]

        iy = jax.lax.broadcasted_iota(jnp.int32, (ny, nz), 0)
        iz = jax.lax.broadcasted_iota(jnp.int32, (ny, nz), 1)

        def bdiff_y(f):
            return jnp.where(iy == 0, 0.0, f - pltpu.roll(f, 1, axis=0))

        def bdiff_z(f):
            return jnp.where(iz == 0, 0.0, f - pltpu.roll(f, 1, axis=1))

        def fdiff_y(f):
            return jnp.where(iy == ny - 1, 0.0, pltpu.roll(f, ny - 1, axis=0) - f)

        def fdiff_z(f):
            return jnp.where(iz == nz - 1, 0.0, pltpu.roll(f, nz - 1, axis=1) - f)

        psi_slot = {}
        for idx, (half, axis, comp, end, _, pads) in enumerate(layout):
            psi_slot[(half, axis, comp, end)] = (idx, pads)

        half_idx = {"h": 0, "e": 1}

        def dense_stretch(half, comp, raw):
            """Volumetric-region (DensePml) stretch BEFORE the slab
            stretch on the same term (disjoint along the region axis —
            engine.py composition order). Single-pass form of the K
            kernel's dense path: the region psi volume is plane-blocked
            with a trash plane at box index 0; all reads/writes are
            where-gated on the plane being inside the box x extent."""
            j = half_idx[half] * 2 + comps_d.index(comp)
            in_box = jnp.logical_and(p >= dx0, p < dx1)
            sub = raw[dy0:dy1, dz0:dz1]
            base = half_idx[half] * 3
            ik_d = dco_ref[base + 0, 0]
            b_d = dco_ref[base + 1, 0]
            c_d = dco_ref[base + 2, 0]
            p_new = jnp.where(
                in_box, b_d * dpsi_in[j, 0] + c_d * sub, 0.0
            )
            dpsi_out[j, 0] = p_new
            new_sub = jnp.where(in_box, ik_d * sub + p_new, sub)
            if dz0 > 0 or dz1 < nz:
                mid_rows = raw[dy0:dy1]
                parts = []
                if dz0 > 0:
                    parts.append(mid_rows[:, :dz0])
                parts.append(new_sub)
                if dz1 < nz:
                    parts.append(mid_rows[:, dz1:])
                mid = jnp.concatenate(parts, axis=1)
            else:
                mid = new_sub
            pieces = []
            if dy0 > 0:
                pieces.append(raw[:dy0])
            pieces.append(mid)
            if dy1 < ny:
                pieces.append(raw[dy1:])
            return (pieces[0] if len(pieces) == 1
                    else jnp.concatenate(pieces, axis=0))

        def stretch(half, axis, comp, raw):
            """Apply the CPML recurrence to a raw (already * inv_dx)
            derivative plane; returns the stretched plane and writes psi."""
            if dense_spec is not None and axis == a_d:
                raw = dense_stretch(half, comp, raw)
            if axis == 0:
                key = (half, 0, comp, "lo")
                if key not in psi_slot:
                    return raw
                hi_ = half_idx[half]
                ik = xprof_ref[hi_, 0, p]
                idx_lo, _ = psi_slot[(half, 0, comp, "lo")]
                idx_hi, _ = psi_slot[(half, 0, comp, "hi")]
                # lo/hi ends each keep their own psi; b/c are zero for the
                # end (and interior) the plane doesn't belong to, so exactly
                # one recurrence is live and the other writes 0 to trash
                p_lo = (xprof_ref[hi_, 1, p] * psi_in[idx_lo][0]
                        + xprof_ref[hi_, 2, p] * raw)
                p_hi = (xprof_ref[hi_, 3, p] * psi_in[idx_hi][0]
                        + xprof_ref[hi_, 4, p] * raw)
                psi_out[idx_lo][0] = p_lo
                psi_out[idx_hi][0] = p_hi
                return ik * raw + p_lo + p_hi
            key = (half, axis, comp, None)
            if key not in psi_slot:
                return raw
            idx, (t_lo, t_hi, plo, phi) = psi_slot[key]
            prof = strip_prof[(half, axis)]
            psi_old = psi_in[idx][0]
            n_lat = ny if axis == 1 else nz

            def seg(arr, a, b):
                return arr[a:b] if axis == 1 else arr[:, a:b]

            # axis 1: (T, 1) broadcast over lanes; axis 2: (ny, T) exact
            ik_s, b_s, c_s = prof[0], prof[1], prof[2]
            psi_pieces, out_pieces = [], []
            if plo > 0:
                r_lo = seg(raw, 0, plo)
                p_lo = seg(b_s, 0, plo) * seg(psi_old, 0, plo) + seg(c_s, 0, plo) * r_lo
                psi_pieces.append(p_lo)
                out_pieces.append(seg(ik_s, 0, plo) * r_lo + p_lo)
            if n_lat - phi > plo:
                out_pieces.append(seg(raw, plo, n_lat - phi))
            if phi > 0:
                r_hi = seg(raw, n_lat - phi, n_lat)
                p_hi = (seg(b_s, plo, plo + phi) * seg(psi_old, plo, plo + phi)
                        + seg(c_s, plo, plo + phi) * r_hi)
                psi_pieces.append(p_hi)
                out_pieces.append(seg(ik_s, plo, plo + phi) * r_hi + p_hi)
            cat_ax = 0 if axis == 1 else 1
            psi_out[idx][0] = (
                psi_pieces[0]
                if len(psi_pieces) == 1
                else jnp.concatenate(psi_pieces, axis=cat_ax)
            )
            return (
                out_pieces[0]
                if len(out_pieces) == 1
                else jnp.concatenate(out_pieces, axis=cat_ax)
            )

        zero = jnp.zeros_like(ex)
        at_x_lo = p == 0
        at_x_hi = p == nx - 1

        # ---- H half-update --------------------------------------------
        dez_x = stretch("h", 0, 2,
                        jnp.where(at_x_lo, zero, ez - ezl_r[0].astype(f32)) * inv_x)
        dey_x = stretch("h", 0, 1,
                        jnp.where(at_x_lo, zero, ey - eyl_r[0].astype(f32)) * inv_x)
        dez_y = stretch("h", 1, 2, bdiff_y(ez) * inv_y)
        dex_y = stretch("h", 1, 0, bdiff_y(ex) * inv_y)
        dey_z = stretch("h", 2, 1, bdiff_z(ey) * inv_z)
        dex_z = stretch("h", 2, 0, bdiff_z(ex) * inv_z)

        hn_x = d_a * hx - d_b * (dez_y - dey_z)
        hn_y = d_a * hy - d_b * (dex_z - dez_x)
        hn_z = d_a * hz - d_b * (dey_x - dex_y)

        if oblique_win is not None:
            # oblique-incidence TF/SF surface currents (engine.py order:
            # right after the curl update); scalar where on the
            # SUB-PLANE patch (not lax.cond — Mosaic predicates vector
            # conds, so where is strictly cheaper)
            in_ob = jnp.logical_and(p >= obx0, p < obx0 + obxl)

            def _patch_add(plane, patch, y0, z0):
                by_, bz_ = patch.shape
                sub = plane[y0: y0 + by_, z0: z0 + bz_] + patch
                if z0 > 0 or z0 + bz_ < nz:
                    row = plane[y0: y0 + by_]
                    parts = []
                    if z0 > 0:
                        parts.append(row[:, :z0])
                    parts.append(sub)
                    if z0 + bz_ < nz:
                        parts.append(row[:, z0 + bz_:])
                    mid = jnp.concatenate(parts, axis=1)
                else:
                    mid = sub
                pieces = []
                if y0 > 0:
                    pieces.append(plane[:y0])
                pieces.append(mid)
                if y0 + by_ < ny:
                    pieces.append(plane[y0 + by_:])
                return (pieces[0] if len(pieces) == 1
                        else jnp.concatenate(pieces, axis=0))

            def _ob_add(f3, base_c, coef, sign):
                cf = (coef if jnp.ndim(coef) == 0 else
                      coef[oby0: oby0 + obby, obz0: obz0 + obbz])
                return tuple(
                    _patch_add(
                        f3[c],
                        jnp.where(
                            in_ob, sign * cf * ob_ref[base_c + c, 0], 0.0
                        ),
                        oby0, obz0,
                    )
                    for c in range(3)
                )

            hn_x, hn_y, hn_z = _ob_add((hn_x, hn_y, hn_z), 0, d_b, -1.0)

        if with_tfsf:
            tf_lo, tf_hi = tfsf_planes
            # tfsf_ref: (2, aux_len) SMEM — row 0 = aux_e at the OLD time
            # level, row 1 = aux_h at the NEW level (aux ticks in XLA).
            # x faces: Hy corrections from the cross-boundary incident Ez.
            amp = jnp.where(p == tf_lo, -d_b * tfsf_ref[0, tf_lo - 1] * inv_x, 0.0)
            amp = amp + jnp.where(
                p == tf_hi + 1, d_b * tfsf_ref[0, tf_hi] * inv_x, 0.0
            )
            if tfsf_box is None:
                hn_y = hn_y + amp
            else:
                (ty0, ty1), (tz0, tz1) = tfsf_box
                lat_mask = jnp.logical_and(
                    jnp.logical_and(iy >= ty0, iy <= ty1),
                    jnp.logical_and(iz >= tz0, iz <= tz1),
                )
                hn_y = hn_y + jnp.where(lat_mask, amp, 0.0)
                # y faces: Hx corrections from incident Ez = aux_e[p],
                # gated to the box x-span (engine.py order)
                in_x = jnp.logical_and(p >= tf_lo, p <= tf_hi)
                ez_inc = jnp.where(in_x, tfsf_ref[0, p], 0.0) * inv_dx[1]
                z_ok = jnp.logical_and(iz >= tz0, iz <= tz1)
                hn_x = hn_x + jnp.where(
                    jnp.logical_and(iy == ty0, z_ok), d_b * ez_inc, 0.0
                )
                hn_x = hn_x + jnp.where(
                    jnp.logical_and(iy == ty1 + 1, z_ok), -d_b * ez_inc, 0.0
                )

        # M (magnetic-current) injection BEFORE the E half reads curl H —
        # the same tick's E update consumes the M-corrected H, so M can
        # never be a post-kernel scatter (engine.py order; ref semantics
        # cem-solver/src/fdtd/wgpu/update.wgsl:56-91). Row layout adds
        # [m_x, m_y, m_z] after the J triple.
        if with_m:
            hn = [hn_x, hn_y, hn_z]
            for s_i in range(n_src):
                sp = src_ref[s_i, 0].astype(jnp.int32)
                py_s = src_ref[s_i, 1].astype(jnp.int32)
                pz_s = src_ref[s_i, 2].astype(jnp.int32)
                mask = jnp.logical_and(
                    sp == p, jnp.logical_and(iy == py_s, iz == pz_s)
                )
                for c in range(3):
                    hn[c] = jnp.where(
                        mask, hn[c] - d_b * src_ref[s_i, 6 + c], hn[c]
                    )
            hn_x, hn_y, hn_z = hn

        # ---- E half-update (uses the new H) -----------------------------
        hy_top = s_hy[...]
        hz_top = s_hz[...]
        dhz_x = stretch("e", 0, 2, jnp.where(at_x_hi, zero, hz_top - hn_z) * inv_x)
        dhy_x = stretch("e", 0, 1, jnp.where(at_x_hi, zero, hy_top - hn_y) * inv_x)
        dhz_y = stretch("e", 1, 2, fdiff_y(hn_z) * inv_y)
        dhx_y = stretch("e", 1, 0, fdiff_y(hn_x) * inv_y)
        dhy_z = stretch("e", 2, 1, fdiff_z(hn_y) * inv_z)
        dhx_z = stretch("e", 2, 0, fdiff_z(hn_x) * inv_z)

        en_x = c_a * ex + c_b * (dhz_y - dhy_z)
        en_y = c_a * ey + c_b * (dhx_z - dhz_x)
        en_z = c_a * ez + c_b * (dhy_x - dhx_y)

        if oblique_win is not None:
            # incident-H correction (rows 3-5, evaluated at t + dt/2 by
            # the wrapper)
            en_x, en_y, en_z = _ob_add((en_x, en_y, en_z), 3, c_b, 1.0)

        if with_tfsf:
            # incident H at the new time level
            amp = jnp.where(p == tf_lo - 1, -c_b * tfsf_ref[1, tf_lo] * inv_x, 0.0)
            amp = amp + jnp.where(
                p == tf_hi, c_b * tfsf_ref[1, tf_hi + 1] * inv_x, 0.0
            )
            if tfsf_box is None:
                en_z = en_z + amp
            else:
                en_z = en_z + jnp.where(lat_mask, amp, 0.0)
                # z faces: Ex corrections from incident Hy = aux_h[p]
                hy_inc = jnp.where(in_x, tfsf_ref[1, p], 0.0) * inv_dx[2]
                y_ok = jnp.logical_and(iy >= ty0, iy <= ty1)
                en_x = en_x + jnp.where(
                    jnp.logical_and(iz == tz0 - 1, y_ok), c_b * hy_inc, 0.0
                )
                en_x = en_x + jnp.where(
                    jnp.logical_and(iz == tz1, y_ok), -c_b * hy_inc, 0.0
                )

        # in-kernel J injection (a post-kernel scatter would re-walk the E
        # fields: ~20% of the tick for even one source). Row layout:
        # [px, py, pz, j_x, j_y, j_z] with j evaluated at the tick's time.
        en = [en_x, en_y, en_z]
        for s_i in range(n_src):
            sp = src_ref[s_i, 0].astype(jnp.int32)
            py_s = src_ref[s_i, 1].astype(jnp.int32)
            pz_s = src_ref[s_i, 2].astype(jnp.int32)
            mask = jnp.logical_and(sp == p, jnp.logical_and(iy == py_s, iz == pz_s))
            for c in range(3):
                en[c] = jnp.where(mask, en[c] - c_b * src_ref[s_i, 3 + c], en[c])
        en_x, en_y, en_z = en

        # rounding to the storage dtype happens HERE (bf16 mode: compute
        # stays f32 end to end, only the HBM write narrows)
        outs[0][0] = en_x.astype(outs[0].dtype)
        outs[1][0] = en_y.astype(outs[1].dtype)
        outs[2][0] = en_z.astype(outs[2].dtype)
        outs[3][0] = hn_x.astype(outs[3].dtype)
        outs[4][0] = hn_y.astype(outs[4].dtype)
        outs[5][0] = hn_z.astype(outs[5].dtype)
        s_hy[...] = hn_y
        s_hz[...] = hn_z

    return kernel


@functools.lru_cache(maxsize=16)
def _build_call(shape, inv_dx, cpml, with_tfsf, tfsf_planes, dt, constants_key,
                interpret, n_src=0, n_materials=1, tfsf_box=None,
                with_m=False, dtype_name="float32", dense_spec=None,
                oblique_win=None):
    constants = SI if constants_key == "si" else _REDUCED()
    nx, ny, nz = shape
    layout = _psi_layout(shape, cpml)
    profs = _profiles(shape, cpml, inv_dx, dt, constants)
    plane = (1, ny, nz)
    f32 = jnp.float32

    def main_idx(i):
        return (nx - 1 - i, 0, 0)

    def halo_idx(i):
        return (jnp.maximum(nx - 2 - i, 0), 0, 0)

    main_spec = pl.BlockSpec(plane, main_idx, memory_space=pltpu.VMEM)
    halo_spec = pl.BlockSpec(plane, halo_idx, memory_space=pltpu.VMEM)

    psi_specs = []
    for half, axis, comp, end, tshape, (t_lo, t_hi, plo, phi) in layout:
        if axis == 0:
            # pure min/max clamp maps (a where/rem map de-pipelines DMA)
            if end == "lo":

                def xpsi_idx(i, t_lo=t_lo):
                    return (jnp.minimum(nx - 1 - i, t_lo), 0, 0)

            else:

                def xpsi_idx(i, t_hi=t_hi):
                    return (jnp.maximum(nx - 1 - i - (nx - t_hi - 1), 0), 0, 0)

            psi_specs.append(
                pl.BlockSpec((1, ny, nz), xpsi_idx, memory_space=pltpu.VMEM)
            )
        elif axis == 1:
            psi_specs.append(
                pl.BlockSpec((1, plo + phi, nz), main_idx, memory_space=pltpu.VMEM)
            )
        else:
            psi_specs.append(
                pl.BlockSpec((1, ny, plo + phi), main_idx, memory_space=pltpu.VMEM)
            )

    if n_materials > 1:
        # (K, 4) coefficient table, unblocked in VMEM
        in_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)]
    else:
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]  # coef row (1, 4)
    static_inputs = []
    if any(axis == 0 for _, axis, *_ in layout):
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))  # (2, 5, nx)
        static_inputs.append(
            np.stack([profs[("h", 0)], profs[("e", 0)]])
        )
    if with_tfsf:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))  # (1, 4) amps
    if n_src > 0:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))  # (n_src, 6)
    strip_inputs = []
    for half in ("h", "e"):
        for axis in (1, 2):
            if (half, axis) in profs:
                in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
                strip_inputs.append(profs[(half, axis)])
    if n_materials > 1:
        in_specs.append(main_spec)  # uint8 matid plane
    dpsi_specs, dpsi_shapes = [], []
    if dense_spec is not None:
        # volumetric-region operands (see pallas_cpml_k.py dense path):
        # (6, 1, by, bz) coefficient blocks clamped to the box x extent,
        # and the (4, bx+1, by, bz) psi volume with trash plane 0
        _, (ddx0, ddx1), (ddy0, ddy1), (ddz0, ddz1) = dense_spec
        bx_d, by_d, bz_d = ddx1 - ddx0, ddy1 - ddy0, ddz1 - ddz0
        in_specs.append(pl.BlockSpec(
            (6, 1, by_d, bz_d),
            lambda i: (0, jnp.clip(nx - 1 - i - ddx0, 0, bx_d - 1), 0, 0),
            memory_space=pltpu.VMEM,
        ))

        def dpsi_idx(i):
            return (0, jnp.clip(nx - 1 - i - ddx0 + 1, 0, bx_d), 0, 0)

        in_specs.append(pl.BlockSpec(
            (4, 1, by_d, bz_d), dpsi_idx, memory_space=pltpu.VMEM))
        dpsi_specs.append(pl.BlockSpec(
            (4, 1, by_d, bz_d), dpsi_idx, memory_space=pltpu.VMEM))
        dpsi_shapes.append(
            jax.ShapeDtypeStruct((4, bx_d + 1, by_d, bz_d), f32))
    if oblique_win is not None:
        # (6, xl, by, bz) per-tick analytic-correction volume, clamped
        # to the commutator subgrid's x extent
        obx0_s, obxl_s, _, obby_s, _, obbz_s = oblique_win
        in_specs.append(pl.BlockSpec(
            (6, 1, obby_s, obbz_s),
            lambda i: (0, jnp.clip(nx - 1 - i - obx0_s, 0, obxl_s - 1),
                       0, 0),
            memory_space=pltpu.VMEM,
        ))
    in_specs += [main_spec] * 6 + [halo_spec] * 2
    in_specs += psi_specs

    out_specs = tuple([main_spec] * 6 + psi_specs + dpsi_specs)
    out_shape = tuple(
        [jax.ShapeDtypeStruct(shape, jnp.dtype(dtype_name)) for _ in range(6)]
        + [jax.ShapeDtypeStruct(ts, f32) for *_, ts, _ in layout]
        + dpsi_shapes
    )

    kernel = _make_kernel(shape, inv_dx, layout, nx, with_tfsf, tfsf_planes,
                          n_src, n_materials, tfsf_box, with_m, dense_spec,
                          oblique_win)
    # NOTE: input_output_aliases were tried here (semantically race-free
    # with the descending sweep) but the aliased many-operand custom call
    # MISCOMPILES under lax.scan on the axon TPU runtime for some configs
    # (deterministic NaN in the K-step variant; donation of this state also
    # flakes INVALID_ARGUMENT). Both kernels run un-aliased; scan still
    # reuses carry buffers at the XLA level.
    io_aliases = {}
    # ~26 per-plane pipeline buffers double-buffered (6 field in + 2 halo +
    # 12 psi in/out + 6 out) + strip/temporary headroom; measured 31 MB at a
    # 64 KB plane -> scale ~500 plane-equivalents, capped at physical VMEM.
    # The oblique correction block rides the pipeline double-buffered too
    # (belt-and-braces: mirrors supports_cpml_k's oblique VMEM term).
    plane_bytes = ny * nz * 4
    ob_bytes = (2 * 6 * oblique_win[3] * oblique_win[5] * 4
                if oblique_win is not None else 0)
    vmem_limit = min(int(plane_bytes * 500 + ob_bytes + (8 << 20)),
                     110 * (1 << 20))
    call = pl.pallas_call(
        kernel,
        grid=(nx,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((ny, nz), f32), pltpu.VMEM((ny, nz), f32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        input_output_aliases=io_aliases,
        interpret=interpret,
    )
    return call, [jnp.asarray(a) for a in static_inputs], \
        [jnp.asarray(a) for a in strip_inputs], layout


def _REDUCED():
    from ..constants import REDUCED

    return REDUCED


def pallas_cpml_step_fn(
    shape: Tuple[int, int, int],
    *,
    inv_dx: Tuple[float, float, float],
    dt: float,
    bc: BoundaryConditions = BoundaryConditions(),
    constants: PhysicalConstants = SI,
    cpml,
    tfsf=None,
    interpret: bool = False,
    max_sources: int = 0,
    matid=None,
    n_materials: int = 1,
    with_m: bool = False,
    dtype=jnp.float32,
    dense=None,
    oblique=None,
):
    """Build step(state: PmlKernelState, coeffs, sources) with CPML (and
    optionally slab TF/SF) applied inside the fused kernel. Uniform scalar
    coefficients. ``max_sources`` > 0 injects J IN-KERNEL (masked row adds;
    a post-kernel scatter re-walks the E fields for ~20%/tick) — it must
    equal the real source count; with 0, sources scatter post-kernel.
    ``with_m`` additionally injects M (magnetic currents) into the H half
    in-kernel (requires max_sources > 0: the E half consumes the
    M-corrected H, so M can never be post-kernel). ``dtype`` is the field
    STORAGE dtype (f32 or bf16); compute and psi are always f32."""
    if not supports_cpml(shape, bc, cpml, dtype):
        raise ValueError(f"CPML kernel does not support {shape=} {cpml=}")
    if with_m and max_sources == 0:
        raise ValueError("with_m requires in-kernel sources (max_sources > 0)")
    nx = shape[0]
    inv_dx = tuple(float(v) for v in inv_dx)
    from ..constants import REDUCED

    constants_key = "si" if constants is SI or constants == SI else "reduced"
    tfsf_planes = tuple(tfsf.span) if tfsf is not None else (0, 0)
    if tfsf is not None:
        tfsf.validate(shape)
        from ..coefficients import update_coefficients
        from ..grid import Resolution
        from ..material import VACUUM

        dx0 = 1.0 / inv_dx[0]
        vacuum_row = update_coefficients(
            VACUUM, Resolution(spatial=(dx0,) * 3, temporal=dt), constants
        )
        aux_coeffs = tfsf.build_aux(
            nx, vacuum_row, dt, dx0, constants, jnp.float32
        )

    if matid is not None and shape[1] % 32 != 0:
        raise ValueError("matid mode needs ny % 32 == 0 (uint8 tile)")
    n_mat = n_materials if matid is not None else 1
    tfsf_box = None
    if tfsf is not None and tfsf.is_box:
        tfsf_box = (tuple(tfsf.span_y), tuple(tfsf.span_z))
    dense_spec = None
    dco = None
    if dense is not None:
        dense.validate(shape)
        _, by_d, bz_d = dense.box_shape
        (dy0_d, _), (dz0_d, _) = dense.box[1], dense.box[2]
        if (by_d % 8 != 0 or bz_d % 128 != 0
                or dy0_d % 8 != 0 or dz0_d % 128 != 0):
            raise ValueError(
                "DensePml region box (extents AND offsets) must be "
                "tile-aligned for the kernel path "
                "(pml_region.pad_dense_to_tiles)"
            )
        if dense.axis in set(cpml.active_axes()):
            # live extent only: tile-padded cells are identity no-ops
            (bx0, bx1) = dense.live[dense.axis]
            lo_t, hi_t = cpml.thickness[dense.axis]
            n_ax = shape[dense.axis]
            if bx0 < lo_t or bx1 > n_ax - hi_t:
                raise ValueError(
                    "DensePml region overlaps a boundary CPML slab on "
                    f"axis {dense.axis}"
                )
        dense_spec = (dense.axis, *(tuple(b) for b in dense.box))
        dco = jnp.stack(
            [jnp.asarray(c, jnp.float32)
             for c in (*dense.coeffs_h, *dense.coeffs_e)]
        )
    oblique_win = None
    if oblique is not None:
        # oblique-incidence TF/SF (solver/tfsf_oblique.py): analytic
        # correction volumes precomputed per tick, added in-kernel
        # (XLA-engine analog: engine.py:311-319/363-370)
        if tfsf is not None:
            raise ValueError("oblique and tfsf are mutually exclusive")
        from .tfsf_oblique import build_oblique

        ob_sub, ob_corr_h, ob_corr_e = build_oblique(
            oblique, shape, inv_dx, dt, constants, jnp.float32
        )
        oblique_win = (
            ob_sub[0].start, ob_sub[0].stop - ob_sub[0].start,
            ob_sub[1].start, ob_sub[1].stop - ob_sub[1].start,
            ob_sub[2].start, ob_sub[2].stop - ob_sub[2].start,
        )
        # feasibility: the double-buffered correction block must fit the
        # pipeline budget alongside the ~500 plane-equivalents (mirrors
        # supports_cpml_k's oblique term — loud reject, not a Mosaic
        # compile error)
        ob_need = (shape[1] * shape[2] * 4 * 500
                   + 2 * 6 * oblique_win[3] * oblique_win[5] * 4)
        if ob_need > 110 * (1 << 20):
            raise ValueError(
                "oblique correction block does not fit the single-pass "
                f"CPML kernel's VMEM budget ({ob_need >> 20} MB est.)"
            )
    call, x_inputs, strip_inputs, layout = _build_call(
        tuple(shape), inv_dx, cpml, tfsf is not None, tfsf_planes,
        float(dt), constants_key, interpret, int(max_sources), n_mat,
        tfsf_box, bool(with_m), jnp.dtype(dtype).name, dense_spec,
        oblique_win,
    )
    n_psi = len(layout)

    def step(state: PmlKernelState, coeffs, sources) -> PmlKernelState:
        if matid is not None:
            # coeffs IS the (K, 4) table in matid mode
            row = jnp.asarray(coeffs, jnp.float32)
        else:
            row = jnp.stack(
                [
                    jnp.asarray(coeffs.c_a, jnp.float32),
                    jnp.asarray(coeffs.c_b, jnp.float32),
                    jnp.asarray(coeffs.d_a, jnp.float32),
                    jnp.asarray(coeffs.d_b, jnp.float32),
                ]
            ).reshape(1, 4)
        args = [row]
        args += x_inputs
        aux_e, aux_h = state.aux_e, state.aux_h
        if tfsf is not None:
            t = state.tick.astype(jnp.float32) * jnp.float32(dt)
            lo, hi = tfsf.span
            # aux is stepped OUTSIDE the kernel; the E-pass amplitudes use
            # the NEW aux_h, matching engine.py's order
            new_aux_e, new_aux_h = tfsf.aux_step(
                aux_e, aux_h, aux_coeffs, t, inv_dx[0], jnp.float32
            )
            # (2, aux_len) SMEM: OLD aux_e for the H pass, NEW aux_h for
            # the E pass (engine.py order)
            args.append(jnp.stack([aux_e, new_aux_h]))
            aux_e, aux_h = new_aux_e, new_aux_h
        if max_sources > 0:
            if sources is None or sources.num_sources != max_sources:
                raise ValueError(
                    f"kernel built for {max_sources} in-kernel sources, got "
                    f"{0 if sources is None else sources.num_sources}"
                )
            t = state.tick.astype(jnp.float32) * jnp.float32(dt)
            j_vals, m_vals = sources.values(t)
            cols = [sources.points.astype(jnp.float32),
                    j_vals.astype(jnp.float32)]
            if with_m:
                cols.append(m_vals.astype(jnp.float32))
            args.append(jnp.concatenate(cols, axis=1))
        args += strip_inputs
        if matid is not None:
            args.append(matid)
        if dense is not None:
            args.append(dco)
            args.append(state.psi[-1])  # region psi volume
        if oblique is not None:
            # (6, xl, by, bz): corr_h at the tick, corr_e at tick + 1/2
            t = state.tick.astype(jnp.float32) * jnp.float32(dt)
            args.append(jnp.stack(
                list(ob_corr_h(t))
                + list(ob_corr_e(t + jnp.float32(0.5 * dt)))
            ))
        args += [state.ex, state.ey, state.ez, state.hx, state.hy, state.hz,
                 state.ey, state.ez]
        args += list(state.psi[:n_psi])
        outs = call(*args)
        e = outs[0:3]
        h = outs[3:6]
        psi = tuple(outs[6: 6 + n_psi])
        if dense is not None:
            psi = psi + (outs[6 + n_psi],)

        if max_sources == 0 and sources is not None and sources.num_sources > 0:
            t = state.tick.astype(jnp.float32) * jnp.float32(dt)
            j_vals, _ = sources.values(t)
            px, py, pz = (sources.points[:, 0], sources.points[:, 1],
                          sources.points[:, 2])
            if matid is not None:
                cb = jnp.take(row[:, 1], matid.astype(jnp.int32))[px, py, pz]
            else:
                cb = jnp.full((sources.num_sources,), coeffs.c_b, jnp.float32)
            e = tuple(
                e[c].at[px, py, pz].add(
                    -(cb * j_vals[:, c]).astype(e[c].dtype), mode="drop"
                )
                for c in range(3)
            )

        return PmlKernelState(
            ex=e[0], ey=e[1], ez=e[2], hx=h[0], hy=h[1], hz=h[2],
            tick=state.tick + 1, psi=psi, aux_e=aux_e, aux_h=aux_h,
        )

    return step
