"""Temporally-blocked CPML kernel: K absorbing leapfrog ticks per pass.

Combines the two kernel pillars: the K-step wavefront schedule of
pallas_stepk.py (stage k computes tick k at plane p+k-1; HBM traffic
~1/K of per-tick stepping) and the in-kernel CPML of pallas_cpml.py.
The new piece is that psi is PLANE-LOCAL in every term (x-axis terms too:
the recurrence at plane q consumes only the derivative at q), so psi
levels ride the same one-iteration VMEM carries as the fields: stage k
writes psi level k at plane q; stage k+1 reads it at the next grid
iteration when it processes the same plane.

- Level-0 psi comes from the HBM slab tensors blocked at the stage-1
  plane (x lo/hi tensors with min/max-composed clamp maps; the trash
  planes hold zeros by the profile-gating invariant, so summing the lo
  and hi blocks yields the live end's value).
- Level-K psi writes back through the stage-K output maps; the descending
  sweep guarantees early clamped garbage writes are overwritten by the
  real visit (same argument as the field outputs in pallas_stepk.py).
- Carries: 12 terms x (K-1) levels — x terms as full planes (one slot per
  term: the lo/hi slabs are disjoint so their psi sum carries both),
  y/z terms as tile-padded strips.

TF/SF (slab or closed box) applies PER LEVEL from a (2K, aux_len) SMEM
pack (aux_e old / aux_h new per tick, aux stepped K times outside in
XLA); J point sources inject per level from (n_src, 3+3K) rows — all
K levels in-kernel, so the pass is exact with no post-kernel scatter.

State/layout/profiles are shared with pallas_cpml.py (same
PmlKernelState), so the two kernels interchange freely. Equivalence vs
K applications of the single-pass kernel is gated in interpret mode
(tests/test_pallas_cpml.py).
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import SI, PhysicalConstants
from .boundary import BoundaryConditions
from .pallas_cpml import (
    _AXIS_COMPS,
    PmlKernelState,
    _pad8,
    _pad128,
    _profiles,
    _psi_layout,
    supports_cpml,
)

# input_output_aliases on these many-operand custom calls MISCOMPILE under
# lax.scan on the axon TPU runtime for some K (deterministic NaN at 256^3
# K=6 after 33 chained passes; pass-by-pass execution is clean) — the same
# bug class as the donation flake. RE-TESTED round 2 on the then-current
# libtpu: the original repro (256^3 K=6, 160 chained scan passes) is
# clean and BIT-IDENTICAL to the copy path, at +32% throughput; soak
# matrix in tools/soak_aliasing.py. Re-flip to False if a stack update
# brings the NaNs back (bench.py's selfcheck gates this every run).
_USE_IO_ALIASES = True

# TIMING-ONLY kernel surgery for the perf experiments (tools/exp_gb.py):
# comma-separated pieces of the absorbing update to DISABLE so their VPU
# cost can be isolated on the chip. Produces PHYSICALLY WRONG kernels —
# never set outside a profiling subprocess. Pieces: "xpsi" (x-slab
# stretch), "strips" (y/z strip stretch incl. the stitching concats),
# "edgemask" (the Neumann edge selects in the lateral diffs).
_PROF_DISABLE = frozenset(
    s for s in os.environ.get("FDTD_PROF_DISABLE", "").split(",") if s
)

__all__ = ["pallas_cpml_stepk_fn", "supports_cpml_k"]


def supports_cpml_k(shape, bc, cpml, k: int, dtype=jnp.float32,
                    dense=None, dft=None, dft_rows=(),
                    dft_rt=None, oblique=None) -> bool:
    if not supports_cpml(shape, bc, cpml, dtype):
        return False
    if not (2 <= k <= 10):
        return False
    if shape[0] < 2 * k:
        return False
    # VMEM guard: (k-1) levels of carries (6 fields + up to 4 x-psi planes
    # + strip slots, all f32 scratch) plus the pipeline's double-buffered
    # blocks. The field in/out blocks ride in the STORAGE dtype (bf16
    # halves ~28 of the ~50 pipeline plane-equivalents); scratch carries
    # and psi stay f32. Calibrated on v5e at 512^3: f32 K=3 fits / K=4
    # OOMs, bf16 K=4 fits / K=5 OOMs.
    plane_f32 = shape[1] * shape[2] * 4
    plane_store = shape[1] * shape[2] * jnp.dtype(dtype).itemsize
    vmem = 16 * (k - 1) * plane_f32 + 22 * plane_f32 + 28 * plane_store
    if dense is not None:
        _, by, bz = dense.box_shape
        (dy0, _), (dz0, _) = dense.box[1], dense.box[2]
        # region blocks must be tile-complete AND the stitching slices
        # tile-aligned (Mosaic constraints);
        # pml_region.pad_dense_to_tiles aligns a box
        if by % 8 != 0 or bz % 128 != 0 or dy0 % 8 != 0 or dz0 % 128 != 0:
            return False
        vmem += (4 * (k - 1) + 28) * by * bz * 4
    if dft is not None:
        n_planes, n_freq = len(dft[0]), dft[1]
        vmem += 6 * n_freq * n_planes * ((k - 1) + 4) * plane_f32
    if dft_rows:
        # all "z" descriptors pack into one 128-lane output set
        if 6 * sum(1 for d in dft_rows if d[0] == "z") > 128:
            return False
        n_y = sum(1 for d in dft_rows if d[0] == "y")
        vmem += 2 * (n_y * 8 * shape[2] + shape[1] * 128) * 4
    if dft_rt is not None:
        n_rt, n_f_rt = dft_rt
        vmem += 2 * 6 * n_f_rt * n_rt * plane_f32
    if oblique is not None:
        # K double-buffered (6, by, bz) analytic-correction blocks over
        # the commutator subgrid (box + 5 cells per lateral axis)
        (_, _), (oy0, oy1), (oz0, oz1) = oblique.box
        vmem += 2 * k * 6 * (oy1 - oy0 + 5) * (oz1 - oz0 + 5) * 4
    if vmem > 90 * (1 << 20):
        return False
    return True


def _make_kernel(shape, inv_dx, layout, nx, k_steps, with_tfsf, tfsf_planes,
                 tfsf_box, n_src, n_materials, runtime_edges=False,
                 with_m=False, runtime_tfsf=False, y_halo=0,
                 flux_faces=(), dense_spec=None, dft_spec=None,
                 dft_rows=(), dft_rt=None, runtime_box_lat=False,
                 runtime_lat=False, blocks=None, oblique_win=None,
                 runtime_oblique=False, unit_kappa=False,
                 px_top=None, n_dst=0):
    inv_x, inv_y, inv_z = inv_dx
    n_psi = len(layout)
    # blocks = (n_b, nly, h): GRID-BLOCKED mode (pallas_cpml_gb.py) — the
    # lateral (y) dimension is decomposed into n_b owned slabs of nly
    # columns INSIDE the pallas grid (grid = (n_b, nx+K-1), blocks outer).
    # Laterally-windowed tensors (fields, x-slab psi, z-strip psi) arrive
    # as (left-halo, center, right-halo) ref triples over the PLAIN GLOBAL
    # arrays; outputs write the owned center columns only. Reads are all
    # tick-0 (no io aliasing), so no halo refresh pass exists at all —
    # the win over the outside-blocked tier (pallas_cpml_blocked.py).
    if blocks is not None:
        n_b_blk, nly_blk, h_blk = blocks
        # runtime_edges/runtime_tfsf compose with blocks (the SHARDED
        # grid-blocked tier, parallel/pallas_sharded_cpml.py blocks=):
        # x coordinates arrive per shard from SMEM, y coordinates are
        # lattice-global and shift into the block window frame in-kernel
        assert not (runtime_lat or runtime_box_lat)
        assert dense_spec is None and dft_spec is None and dft_rt is None
        assert not flux_faces and not dft_rows
        # oblique DOES compose with blocks (round 5): the correction
        # stack arrives pre-placed at full window height per block
        assert y_halo == h_blk
    # dft_spec = (planes tuple, n_freq): running per-tick DFT of the E
    # field at fixed x-planes, accumulated IN-KERNEL with the psi carry
    # pattern (slot order (f, re/im, comp) -> 6F rows per plane tensor)
    dft_planes, n_freq = dft_spec if dft_spec is not None else ((), 0)
    # dft_rt = (whiches, n_freq): RUNTIME-coordinate x-plane DFT — the
    # plane index comes from SMEM per call (per shard under sharding),
    # so the accumulator can't ride plane-clamped blocks; instead each
    # plane gets a CONSTANT-index-map (6F, ny, nz) in/out pair that stays
    # resident in VMEM for the whole sweep (out := in at iteration 0,
    # then a pl.when-gated read-modify-write at the one stage whose plane
    # matches). Shares the (K, 2F) phase rows with dft_spec.
    rt_whiches, rt_freq = dft_rt if dft_rt is not None else ((), 0)
    n_rt = len(rt_whiches)
    if n_rt and dft_planes:
        assert rt_freq == n_freq
    n_freq = n_freq or rt_freq
    # x-axis terms share one carry per (half, comp); y/z one per term
    x_terms = sorted({(h, c) for h, a, c, *_ in layout if a == 0})
    yz_terms = [(h, a, c, pads) for h, a, c, end, _, pads in layout
                if a != 0]
    if dense_spec is not None:
        a_d, (dx0, dx1), (dy0, dy1), (dz0, dz1) = dense_spec
        comps_d = _AXIS_COMPS[a_d]
        bx_d = dx1 - dx0
    n_dense = 4 if dense_spec is not None else 0
    # oblique_win = (x0, xl, y0, by, z0, bz): the ObliqueTfsf commutator
    # subgrid (tfsf_oblique.build_oblique's ``sub``, box +/- 2). The
    # analytic correction volumes arrive PRECOMPUTED per pass as a
    # (K, 6, xl, by, bz) stack (comps 0-2 = corr_h at the level's tick,
    # 3-5 = corr_e at tick + 1/2), box-clamped along x per stage like
    # the dense coefficient blocks; the in-kernel add is gated by a
    # scalar jnp.where on the sub-plane patch (NOT lax.cond — Mosaic
    # predicates vector conds, see the CLAUDE.md invariant and the note
    # at the _ob_add site below).
    if oblique_win is not None:
        obx0, obxl, oby0, obby, obz0, obbz = oblique_win
    # x-ZONED builds (pallas_cpml_xz.py): the sweep covers the zone
    # [zx0, zx1) plus fill/drain, starting at stage-1 plane px_top
    # (= zx1 + K - 2, clipped) instead of nx - 1. All plane coordinates
    # (q) stay GLOBAL, so edge masks, profiles, sources and TF/SF are
    # zone-agnostic; only the sweep origin moves.
    if px_top is None:
        px_top = nx - 1

    def kernel(*refs):
        k = 0
        if runtime_oblique:
            # scalar-PREFETCH operand (PrefetchScalarGridSpec): the
            # oblique subgrid's x start in THIS shard's extended frame —
            # read by the per-stage correction block index maps AND the
            # in-kernel gate, so the sharded wrapper can move the
            # correction volumes per shard without rebuilding
            obc_ref = refs[k]; k += 1
        coef_ref = refs[k]; k += 1
        edge_ref = None
        if runtime_edges:
            edge_ref = refs[k]; k += 1
        lat_ref = None
        if runtime_lat:
            # per-shard EXTENDED-frame lateral coordinates for the "y"
            # flux descriptors then the "y" row-capture descriptors (2-D
            # sharding cuts lattice y, so the static values are invalid)
            lat_ref = refs[k]; k += 1
        xprof_ref = None
        if x_terms:
            xprof_ref = refs[k]; k += 1
        if with_tfsf:
            tfsf_ref = refs[k]; k += 1
            if runtime_tfsf:
                # sharded mode: plane indices are per-shard EXTENDED
                # coordinates from SMEM; the aux values arrive pre-gathered
                # as (2K, 2) rows instead of whole aux arrays
                tfp_ref = refs[k]; k += 1
        if n_src > 0:
            src_ref = refs[k]; k += 1
        strip_prof = {}
        for half in ("h", "e"):
            for axis in (1, 2):
                if any(h == half and a == axis for h, a, c, p_ in yz_terms):
                    strip_prof[(half, axis)] = refs[k]; k += 1
        if n_materials > 1:
            mid_refs = refs[k: k + k_steps]; k += k_steps
        if dense_spec is not None:
            dco_refs = refs[k: k + k_steps]; k += k_steps
            dpsi_in = refs[k]; k += 1
        if oblique_win is not None:
            ob_refs = refs[k: k + k_steps]; k += k_steps
        if dft_planes or n_rt:
            dft_phase_ref = refs[k]; k += 1  # (K, 2F) SMEM cos/sin rows
        if dft_planes:
            dft_in = refs[k: k + len(dft_planes)]; k += len(dft_planes)
        if n_rt:
            xdft_coord_ref = refs[k]; k += 1  # (1, n_rt) SMEM i32 planes
            xdft_in = refs[k: k + n_rt]; k += n_rt
        if blocks is None:
            fld_refs = [(r,) for r in refs[k: k + 8]]
            k += 8
            psi_in_refs = [(r,) for r in refs[k: k + n_psi]]
            k += n_psi
        else:
            # grid-blocked: (left-halo, center, right-halo) triples per
            # laterally-windowed tensor; y-strip psi stays a single ref
            # (its tensor is per-block (nx, n_b*(plo+phi), nz))
            fld_refs = [tuple(refs[k + 3 * t: k + 3 * t + 3])
                        for t in range(8)]
            k += 24
            psi_in_refs = []
            for _h, _axis, *_ in layout:
                if _axis == 1:
                    psi_in_refs.append((refs[k],)); k += 1
                else:
                    psi_in_refs.append(tuple(refs[k: k + 3])); k += 3
        # x-zoned chain-destination dummies: whole-array HBM refs whose
        # only role is donating the previous zone call's output buffers
        # through input_output_aliases (never read or written in-kernel)
        k += n_dst
        outs = refs[k: k + 6]; k += 6
        psi_out = refs[k: k + n_psi]; k += n_psi
        if dense_spec is not None:
            dpsi_out = refs[k]; k += 1
        if dft_planes:
            dft_out = refs[k: k + len(dft_planes)]; k += len(dft_planes)
        if n_rt:
            xdft_out = refs[k: k + n_rt]; k += n_rt
        flux_out = ()
        if flux_faces:
            flux_out = refs[k: k + k_steps]; k += k_steps
        # per-stage DFT row captures (lateral-plane spectra support):
        # one K-output set of (nx+2, 8, nz) tiles per "y" descriptor
        # (E/H comps on sublanes 0-5), plus ONE shared K-output set of
        # (nx+2, ny, 128) tiles for ALL "z" descriptors (descriptor di's
        # comps on lanes 6*di .. 6*di+5)
        rowy_out, rowz_out = [], None
        row_y = tuple(d[1] for d in dft_rows if d[0] == "y")
        row_z = tuple(d[1] for d in dft_rows if d[0] == "z")
        for _ in row_y:
            rowy_out.append(refs[k: k + k_steps]); k += k_steps
        if row_z:
            rowz_out = refs[k: k + k_steps]; k += k_steps
        scratch = refs[k:]
        # scratch: per level 1..K-1: 6 field planes + 12 psi slots
        # (+ 4 dense-region psi slots + 6F DFT slots per probe plane);
        # then hy_top/hz_top
        n_terms = len(x_terms) + len(yz_terms)
        n_dft = 6 * n_freq * len(dft_planes)
        slot_per_lvl = 6 + n_terms + n_dense + n_dft
        c_lvl = [scratch[slot_per_lvl * i: slot_per_lvl * (i + 1)]
                 for i in range(k_steps - 1)]
        c_topy, c_topz = scratch[slot_per_lvl * (k_steps - 1):]

        i = pl.program_id(0) if blocks is None else pl.program_id(1)
        p = px_top - i  # stage-1 plane (goes negative at the tail)
        f32 = jnp.float32
        if blocks is None:
            ny, nz = fld_refs[0][0].shape[1:]
            y0_blk = 0

            def _rd(t):
                return t[0][0]

            def _own(v):
                return v
        else:
            # kernel plane = per-block window [halo | owned | halo]
            ny = nly_blk + 2 * h_blk
            nz = fld_refs[0][1].shape[2]
            jb = pl.program_id(0)
            y0_blk = jb * nly_blk - h_blk  # window start in absolute y

            def _rd(t):
                if len(t) == 1:
                    return t[0][0]
                l_, c_, r_ = t
                return jnp.concatenate([l_[0], c_[0], r_[0]], axis=0)

            def _own(v):
                # owned center columns of a windowed (W, ·) plane
                return v[h_blk: h_blk + nly_blk]
        # global Neumann-edge coordinates in this array's coordinates, row
        # [x_lo, x_hi, y_lo, y_hi, z_lo, z_hi]; the sharded wrapper moves
        # them per shard (sentinels far off the grid disable a mask:
        # halo-region outputs are garbage by construction)
        if runtime_edges:
            lo_edge = edge_ref[0, 0]
            hi_edge = edge_ref[0, 1]
            y_lo_e = edge_ref[0, 2]
            y_hi_e = edge_ref[0, 3]
            z_lo_e = edge_ref[0, 4]
            z_hi_e = edge_ref[0, 5]
            if blocks is not None:
                # sharded grid-blocked mode: the wrapper sends REAL
                # lattice y edges (1-D x meshes leave y uncut); shift
                # them into this block's window frame like the static
                # branch below (big sentinels survive the shift)
                y_lo_e = y_lo_e - y0_blk
                y_hi_e = y_hi_e - y0_blk
        elif blocks is not None:
            # global Neumann y edges in this block's WINDOW frame: on
            # block 0 the lo edge sits at window column h (columns below
            # are the clamped junk halo), on the last block the hi edge
            # at h + nly - 1; elsewhere the shifted values fall outside
            # [0, W) and the masks never fire (natural sentinels)
            lo_edge = 0
            hi_edge = nx - 1
            y_lo_e = -y0_blk
            y_hi_e = (n_b_blk * nly_blk - 1) - y0_blk
            z_lo_e, z_hi_e = 0, nz - 1
        else:
            lo_edge = 0
            hi_edge = nx - 1
            y_lo_e, y_hi_e = 0, ny - 1
            z_lo_e, z_hi_e = 0, nz - 1
        iy = jax.lax.broadcasted_iota(jnp.int32, (ny, nz), 0)
        iz = jax.lax.broadcasted_iota(jnp.int32, (ny, nz), 1)
        zero = jnp.zeros((ny, nz), f32)

        if "edgemask" in _PROF_DISABLE:  # timing-only: see _PROF_DISABLE

            def bdiff_y(f):
                return f - pltpu.roll(f, 1, axis=0)

            def bdiff_z(f):
                return f - pltpu.roll(f, 1, axis=1)

            def fdiff_y(f):
                return pltpu.roll(f, ny - 1, axis=0) - f

            def fdiff_z(f):
                return pltpu.roll(f, nz - 1, axis=1) - f
        else:

            def bdiff_y(f):
                return jnp.where(
                    iy == y_lo_e, 0.0, f - pltpu.roll(f, 1, axis=0))

            def bdiff_z(f):
                return jnp.where(
                    iz == z_lo_e, 0.0, f - pltpu.roll(f, 1, axis=1))

            def fdiff_y(f):
                return jnp.where(
                    iy == y_hi_e, 0.0, pltpu.roll(f, ny - 1, axis=0) - f)

            def fdiff_z(f):
                return jnp.where(
                    iz == z_hi_e, 0.0, pltpu.roll(f, nz - 1, axis=1) - f)

        def _patch_add(plane, patch, y0, z0):
            """plane[y0:y0+by, z0:z0+bz] + patch, reassembled by concats
            (the dense_stretch stitching pattern)."""
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

        if n_materials == 1:
            c_a = coef_ref[0, 0]
            c_b = coef_ref[0, 1]
            d_a = coef_ref[0, 2]
            d_b = coef_ref[0, 3]

        # slot index helpers within a level's scratch block
        def x_slot(half, comp):
            return 6 + x_terms.index((half, comp))

        def yz_slot(half, axis, comp):
            return 6 + len(x_terms) + [
                (h, a, c) for h, a, c, _ in yz_terms
            ].index((half, axis, comp))

        # HBM psi slot lookup
        psi_hbm = {}
        for idx, (half, axis, comp, end, _, pads) in enumerate(layout):
            psi_hbm[(half, axis, comp, end)] = (idx, pads)

        # stage-1 psi values, window-assembled in blocks mode
        psi_vals = [_rd(t) for t in psi_in_refs]

        # read ALL carries before the stage loop overwrites them
        prev_e, prev_h, prev_psi, prev_dpsi = {}, {}, {}, {}
        for lvl in range(1, k_steps):
            regs = c_lvl[lvl - 1]
            prev_e[lvl] = tuple(regs[c][...] for c in range(3))
            prev_h[lvl] = tuple(regs[3 + c][...] for c in range(3))
            prev_psi[lvl] = [r[...] for r in regs[6: 6 + n_terms]]
            prev_dpsi[lvl] = [
                r[...] for r in regs[6 + n_terms: 6 + n_terms + n_dense]
            ]
        top_y = c_topy[...]
        top_z = c_topz[...]
        prev_dft = {}
        for lvl in range(1, k_steps):
            regs = c_lvl[lvl - 1]
            prev_dft[lvl] = [
                r[...] for r in regs[6 + n_terms + n_dense:]
            ]

        half_idx = {"h": 0, "e": 1}
        dpsi_holder = [None]  # the current stage's new dense-psi slots
        dft_holder = [None]   # the current stage's new DFT-acc slots

        def dense_stretch(stage, q, half, comp, raw):
            """Volumetric-region (DensePml) stretch, applied BEFORE the
            boundary-slab stretch on the same term (their live regions are
            disjoint along the region axis, so composition is exact —
            engine.py order). The per-cell psi volume is plane-local, so
            it rides the same carry pattern as the slab psi: level stage-1
            from HBM (via the box-clamped block map with a trash plane) or
            the carry; level K back through the clamped out map. All
            reads/writes are where-gated on the plane being inside the
            box's x extent — clipped fill/drain garbage lands on planes
            later overwritten by their real visit (descending sweep)."""
            j = half_idx[half] * 2 + comps_d.index(comp)
            in_box = jnp.logical_and(q >= dx0, q < dx1)
            sub = raw[dy0:dy1, dz0:dz1]
            cof = dco_refs[stage - 1]
            base = half_idx[half] * 3
            ik = cof[base + 0, 0]
            b = cof[base + 1, 0]
            c = cof[base + 2, 0]
            if stage == 1:
                p0 = dpsi_in[j, 0]
            else:
                p0 = prev_dpsi[stage - 1][j]
            p_new = jnp.where(in_box, b * p0 + c * sub, 0.0)
            if stage == k_steps:
                dpsi_out[j, 0] = p_new
            else:
                dpsi_holder[0][j] = p_new
            new_sub = jnp.where(in_box, ik * sub + p_new, sub)
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

        def stretch(stage, q, half, axis, comp, raw, new_psi_lvl):
            """CPML stretch at plane q for tick `stage`; psi level stage-1
            comes from HBM (stage 1) or the carry; the new level goes to
            `new_psi_lvl` (list) or HBM out (stage K)."""
            if dense_spec is not None and axis == a_d:
                raw = dense_stretch(stage, q, half, comp, raw)
            if axis == 0:
                if "xpsi" in _PROF_DISABLE:  # timing-only
                    return raw
                if (half, 0, comp, "lo") not in psi_hbm:
                    return raw
                hi_ = half_idx[half]
                qc = jnp.clip(q, 0, nx - 1)
                ik = xprof_ref[hi_, 0, qc]
                b_lo = xprof_ref[hi_, 1, qc]
                c_lo = xprof_ref[hi_, 2, qc]
                b_hi = xprof_ref[hi_, 3, qc]
                c_hi = xprof_ref[hi_, 4, qc]
                if stage == 1:
                    il, _ = psi_hbm[(half, 0, comp, "lo")]
                    ih, _ = psi_hbm[(half, 0, comp, "hi")]
                    # trash blocks hold zeros -> the sum is the live end
                    psi0 = psi_vals[il] + psi_vals[ih]
                else:
                    psi0 = prev_psi[stage - 1][x_slot(half, comp) - 6]
                # keep lo/hi parts separate for the HBM write: writing the
                # SUM into both tensors would land a nonzero value on the
                # other end's trash block (e.g. plane 0 clamps onto the hi
                # tensor's trash) and break the trash == 0 invariant the
                # stage-1 lo+hi read relies on.
                # Gating policy: ONLY stage K is where-gated. The gates
                # exist for NaN safety — fill-phase carries and extreme
                # halo planes read uninitialized VMEM, and 0 * NaN = NaN
                # would poison the persistent trash plane (which stage 1
                # then sums into EVERY interior plane's psi0). Gating the
                # HBM WRITE SITE alone suffices: NaN flowing through the
                # stage<K carries is overwritten by real values once the
                # pipeline fills (each carry is freshly recomputed from
                # HBM psi within K iterations), and clipped fill/drain
                # field writes are overwritten by the real visit — the
                # descending-sweep argument. So stages 1..K-1 run the
                # combined recurrence UNGATED (a plane belongs to at
                # most one end, so b_lo + b_hi is the live end's value;
                # profiles hold exact 0.0 elsewhere). A scalar lax.cond
                # skipping interior planes entirely was tried and is
                # WORSE — Mosaic predicates vector conds (CLAUDE.md
                # invariant) — and an i==0 pl.when scratch zeroing (to
                # drop the stage-K gates too) MEASURED 22.1 -> 17.4
                # Gcell/s at 512^3 gb K=10: conditional scratch writes
                # break Mosaic's pipelining. Do not reintroduce either.
                if stage == k_steps:
                    live_lo = jnp.logical_or(b_lo != 0.0, c_lo != 0.0)
                    live_hi = jnp.logical_or(b_hi != 0.0, c_hi != 0.0)
                    p_lo = jnp.where(live_lo, b_lo * psi0 + c_lo * raw,
                                     0.0)
                    p_hi = jnp.where(live_hi, b_hi * psi0 + c_hi * raw,
                                     0.0)
                    p_new = p_lo + p_hi
                    il, _ = psi_hbm[(half, 0, comp, "lo")]
                    ih, _ = psi_hbm[(half, 0, comp, "hi")]
                    psi_out[il][0] = _own(p_lo)
                    psi_out[ih][0] = _own(p_hi)
                else:
                    p_new = (b_lo + b_hi) * psi0 + (c_lo + c_hi) * raw
                    new_psi_lvl[x_slot(half, comp) - 6] = p_new
                # kappa == 1 everywhere (the spec default) makes the
                # 1/kappa scaling the identity — skip the full-plane
                # multiply (bit-exact: 1.0 * raw == raw)
                return raw + p_new if unit_kappa else ik * raw + p_new
            if "strips" in _PROF_DISABLE:  # timing-only
                return raw
            key = (half, axis, comp, None)
            if key not in psi_hbm:
                return raw
            idx, (t_lo, t_hi, plo, phi) = psi_hbm[key]
            prof = strip_prof[(half, axis)]
            n_lat = ny if axis == 1 else nz
            # lateral (y) sharding: the plane carries `y_halo` halo columns
            # per side, so the strip segments sit that far inside the array
            # (their live region is constrained >= k inside the owned
            # columns, so halo recompute never touches live strip psi);
            # halo columns pass through raw. z stays undecomposed.
            off = y_halo if axis == 1 else 0
            if stage == 1:
                psi0 = psi_vals[idx]
            else:
                psi0 = prev_psi[stage - 1][yz_slot(half, axis, comp) - 6]

            def seg(arr, a, b):
                return arr[a:b] if axis == 1 else arr[:, a:b]

            if blocks is not None and axis == 1:
                # per-block runtime y-strip profile rows (identity on
                # non-owner blocks), blocked (1, 3, plo+phi, 1) by j
                ik_s, b_s, c_s = prof[0, 0], prof[0, 1], prof[0, 2]
            else:
                ik_s, b_s, c_s = prof[0], prof[1], prof[2]
            psi_pieces, out_pieces = [], []
            if off > 0:
                out_pieces.append(seg(raw, 0, off))
            if plo > 0:
                r_lo = seg(raw, off, off + plo)
                pl_ = seg(b_s, 0, plo) * seg(psi0, 0, plo) + seg(c_s, 0, plo) * r_lo
                psi_pieces.append(pl_)
                out_pieces.append(
                    r_lo + pl_ if unit_kappa
                    else seg(ik_s, 0, plo) * r_lo + pl_)
            if n_lat - off - phi > off + plo:
                out_pieces.append(seg(raw, off + plo, n_lat - off - phi))
            if phi > 0:
                r_hi = seg(raw, n_lat - off - phi, n_lat - off)
                ph_ = (seg(b_s, plo, plo + phi) * seg(psi0, plo, plo + phi)
                       + seg(c_s, plo, plo + phi) * r_hi)
                psi_pieces.append(ph_)
                out_pieces.append(
                    r_hi + ph_ if unit_kappa
                    else seg(ik_s, plo, plo + phi) * r_hi + ph_)
            if off > 0:
                out_pieces.append(seg(raw, n_lat - off, n_lat))
            cat_ax = 0 if axis == 1 else 1
            p_new = (psi_pieces[0] if len(psi_pieces) == 1
                     else jnp.concatenate(psi_pieces, axis=cat_ax))
            if stage == k_steps:
                # y-strip tensors are per-block in blocks mode (full
                # strip write); z strips are windowed (owned rows only)
                psi_out[idx][0] = p_new if axis == 1 else _own(p_new)
            else:
                new_psi_lvl[yz_slot(half, axis, comp) - 6] = p_new
            return (out_pieces[0] if len(out_pieces) == 1
                    else jnp.concatenate(out_pieces, axis=cat_ax))

        if with_tfsf:
            if runtime_tfsf:
                # sharded mode: plane coordinates are per-shard EXTENDED;
                # box mode additionally carries the extended->global offset
                # so the (replicated, globally-indexed) aux rows can be
                # gathered per plane
                tf_lo = tfp_ref[0, 0]
                tf_hi = tfp_ref[0, 1]
                tf_off = tfp_ref[0, 2] if tfsf_box is not None else 0
            else:
                tf_lo, tf_hi = tfsf_planes
                tf_off = 0
            if tfsf_box is not None:
                (ty0, ty1), (tz0, tz1) = tfsf_box
                if blocks is not None:
                    # absolute box y faces -> this block's window frame;
                    # halo columns receive the same injection their
                    # owners compute (uniform shift preserves exactness)
                    ty0 = ty0 - y0_blk
                    ty1 = ty1 - y0_blk
                if runtime_box_lat:
                    # 2-D (x, y) sharding cuts the box's y span: the y
                    # face coordinates arrive per shard in the EXTENDED
                    # y frame (SMEM row cols 3-4; out-of-range values
                    # make the masks empty, and halo columns receive the
                    # same injection their owners compute — the uniform
                    # global->extended shift preserves halo exactness)
                    ty0 = tfp_ref[0, 3]
                    ty1 = tfp_ref[0, 4]
                lat_mask = jnp.logical_and(
                    jnp.logical_and(iy >= ty0, iy <= ty1),
                    jnp.logical_and(iz >= tz0, iz <= tz1),
                )
                z_ok = jnp.logical_and(iz >= tz0, iz <= tz1)
                y_ok = jnp.logical_and(iy >= ty0, iy <= ty1)

        new_carries = {}
        out_fields = None
        below_e = tuple(_rd(fld_refs[c]).astype(f32) for c in range(3))
        below_h = tuple(_rd(fld_refs[3 + c]).astype(f32) for c in range(3))
        halo_ey = _rd(fld_refs[6]).astype(f32)
        halo_ez = _rd(fld_refs[7]).astype(f32)

        # runtime-coordinate DFT: the resident out blocks start as copies
        # of the carried-in accumulators (first grid iteration only; they
        # stay in VMEM across the sweep and flush once at the end)
        if n_rt:
            @pl.when(i == 0)
            def _init_xdft():
                for pi_ in range(n_rt):
                    xdft_out[pi_][...] = xdft_in[pi_][...]

        for st in range(1, k_steps + 1):
            q = p + st - 1  # plane computed by this stage
            if n_materials > 1:
                # per-stage coefficient planes from the stage's matid input
                mid = mid_refs[st - 1][0].astype(jnp.int32)
                c_a = jnp.zeros((ny, nz), f32)
                c_b = jnp.zeros((ny, nz), f32)
                d_a = jnp.zeros((ny, nz), f32)
                d_b = jnp.zeros((ny, nz), f32)
                for m in range(n_materials):
                    sel = (mid == m).astype(f32)
                    c_a += sel * coef_ref[m, 0]
                    c_b += sel * coef_ref[m, 1]
                    d_a += sel * coef_ref[m, 2]
                    d_b += sel * coef_ref[m, 3]
            if st == 1:
                e_here, h_here = below_e, below_h
                e_xm = (None, halo_ey, halo_ez)
            else:
                e_here, h_here = prev_e[st - 1], prev_h[st - 1]
                e_xm = (None, below_e[1], below_e[2])

            new_psi_lvl = [None] * n_terms
            dpsi_holder[0] = [None] * n_dense
            dft_holder[0] = [None] * n_dft

            at_lo = q <= lo_edge
            dez_x = stretch(st, q, "h", 0, 2,
                            jnp.where(at_lo, zero, e_here[2] - e_xm[2]) * inv_x,
                            new_psi_lvl)
            dey_x = stretch(st, q, "h", 0, 1,
                            jnp.where(at_lo, zero, e_here[1] - e_xm[1]) * inv_x,
                            new_psi_lvl)
            dez_y = stretch(st, q, "h", 1, 2, bdiff_y(e_here[2]) * inv_y,
                            new_psi_lvl)
            dex_y = stretch(st, q, "h", 1, 0, bdiff_y(e_here[0]) * inv_y,
                            new_psi_lvl)
            dey_z = stretch(st, q, "h", 2, 1, bdiff_z(e_here[1]) * inv_z,
                            new_psi_lvl)
            dex_z = stretch(st, q, "h", 2, 0, bdiff_z(e_here[0]) * inv_z,
                            new_psi_lvl)

            hk = [
                d_a * h_here[0] - d_b * (dez_y - dey_z),
                d_a * h_here[1] - d_b * (dex_z - dez_x),
                d_a * h_here[2] - d_b * (dey_x - dex_y),
            ]

            if oblique_win is not None:
                # oblique-incidence TF/SF surface currents (engine.py
                # order: right after the curl update, before sources).
                # The x gate is a scalar where on the SUB-PLANE patch
                # (NOT lax.cond: Mosaic predicates vector conds — both
                # branches execute — so the where form is strictly
                # cheaper); out-of-extent planes add exact zeros.
                ob_r = ob_refs[st - 1]
                obx0_r = obc_ref[0] if runtime_oblique else obx0
                in_ob = jnp.logical_and(q >= obx0_r, q < obx0_r + obxl)

                # blocks mode: the pre-placed stack delivers a FULL
                # window-height (W, bz) patch per block (zeros outside
                # the box's lateral rows in this window), so the y
                # placement is the identity and only the z stitch
                # remains static
                ob_y0 = 0 if blocks is not None else oby0

                def _ob_add(f3, base_c, coef, sign):
                    if jnp.ndim(coef) == 0:
                        cf = coef
                    elif blocks is not None:
                        cf = coef[:, obz0: obz0 + obbz]
                    else:
                        cf = coef[oby0: oby0 + obby, obz0: obz0 + obbz]
                    return tuple(
                        _patch_add(
                            f3[c],
                            jnp.where(
                                in_ob,
                                sign * cf * ob_r[0, base_c + c, 0],
                                0.0,
                            ),
                            ob_y0, obz0,
                        )
                        for c in range(3)
                    )

                hk = list(_ob_add(tuple(hk), 0, d_b, -1.0))

            if with_tfsf:
                r = 2 * (st - 1)
                if runtime_tfsf and tfsf_box is None:
                    # slab sharded mode: pre-gathered (2K, 2) scalars
                    e_lo, e_hi = tfsf_ref[r, 0], tfsf_ref[r, 1]
                else:
                    # full aux rows, indexed in GLOBAL coordinates
                    # (tf_off = 0 single-chip)
                    e_lo = tfsf_ref[r, tf_lo - tf_off - 1]
                    e_hi = tfsf_ref[r, tf_hi - tf_off]
                amp = jnp.where(q == tf_lo, -d_b * e_lo * inv_x, 0.0)
                amp = amp + jnp.where(
                    q == tf_hi + 1, d_b * e_hi * inv_x, 0.0
                )
                if tfsf_box is None:
                    hk[1] = hk[1] + amp
                else:
                    hk[1] = hk[1] + jnp.where(lat_mask, amp, 0.0)
                    in_x = jnp.logical_and(q >= tf_lo, q <= tf_hi)
                    qc = jnp.clip(q - tf_off, 0, tfsf_ref.shape[1] - 1)
                    ez_inc = jnp.where(in_x, tfsf_ref[r, qc], 0.0) * inv_y
                    hk[0] = hk[0] + jnp.where(
                        jnp.logical_and(iy == ty0, z_ok), d_b * ez_inc, 0.0
                    )
                    hk[0] = hk[0] + jnp.where(
                        jnp.logical_and(iy == ty1 + 1, z_ok), -d_b * ez_inc, 0.0
                    )

            # M injection per level BEFORE the E half reads curl H
            # (engine.py order; rows append M levels 1..K after the J
            # levels: [px, py, pz, J 1..K (3K), M 1..K (3K)])
            for s_i in range(n_src if with_m else 0):
                sp = src_ref[s_i, 0].astype(jnp.int32)
                py_s = src_ref[s_i, 1].astype(jnp.int32)
                if blocks is not None:
                    # absolute -> window frame; sources within h columns
                    # of a cut also land in the neighbor's halo recompute
                    py_s = py_s - y0_blk
                pz_s = src_ref[s_i, 2].astype(jnp.int32)
                mask = jnp.logical_and(
                    sp == q, jnp.logical_and(iy == py_s, iz == pz_s)
                )
                mbase = 3 + 3 * k_steps + 3 * (st - 1)
                for c in range(3):
                    hk[c] = jnp.where(
                        mask, hk[c] - d_b * src_ref[s_i, mbase + c], hk[c]
                    )
            hk = tuple(hk)

            if st < k_steps:
                hy_top, hz_top = prev_h[st][1], prev_h[st][2]
            else:
                hy_top, hz_top = top_y, top_z
            at_hi = q == hi_edge
            dhz_x = stretch(st, q, "e", 0, 2,
                            jnp.where(at_hi, zero, hz_top - hk[2]) * inv_x,
                            new_psi_lvl)
            dhy_x = stretch(st, q, "e", 0, 1,
                            jnp.where(at_hi, zero, hy_top - hk[1]) * inv_x,
                            new_psi_lvl)
            dhz_y = stretch(st, q, "e", 1, 2, fdiff_y(hk[2]) * inv_y, new_psi_lvl)
            dhx_y = stretch(st, q, "e", 1, 0, fdiff_y(hk[0]) * inv_y, new_psi_lvl)
            dhy_z = stretch(st, q, "e", 2, 1, fdiff_z(hk[1]) * inv_z, new_psi_lvl)
            dhx_z = stretch(st, q, "e", 2, 0, fdiff_z(hk[0]) * inv_z, new_psi_lvl)

            ek = [
                c_a * e_here[0] + c_b * (dhz_y - dhy_z),
                c_a * e_here[1] + c_b * (dhx_z - dhz_x),
                c_a * e_here[2] + c_b * (dhy_x - dhx_y),
            ]

            if oblique_win is not None:
                # incident-H correction (corr_e rows 3-5, evaluated at
                # the half-advanced time by the wrapper)
                ek = list(_ob_add(tuple(ek), 3, c_b, 1.0))

            if with_tfsf:
                r = 2 * (st - 1) + 1
                if runtime_tfsf and tfsf_box is None:
                    h_lo, h_hi = tfsf_ref[r, 0], tfsf_ref[r, 1]
                else:
                    h_lo = tfsf_ref[r, tf_lo - tf_off]
                    h_hi = tfsf_ref[r, tf_hi - tf_off + 1]
                amp = jnp.where(q == tf_lo - 1, -c_b * h_lo * inv_x, 0.0)
                amp = amp + jnp.where(
                    q == tf_hi, c_b * h_hi * inv_x, 0.0
                )
                if tfsf_box is None:
                    ek[2] = ek[2] + amp
                else:
                    ek[2] = ek[2] + jnp.where(lat_mask, amp, 0.0)
                    qc = jnp.clip(q - tf_off, 0, tfsf_ref.shape[1] - 1)
                    hy_inc = jnp.where(in_x, tfsf_ref[r, qc], 0.0) * inv_z
                    ek[0] = ek[0] + jnp.where(
                        jnp.logical_and(iz == tz0 - 1, y_ok), c_b * hy_inc, 0.0
                    )
                    ek[0] = ek[0] + jnp.where(
                        jnp.logical_and(iz == tz1, y_ok), -c_b * hy_inc, 0.0
                    )

            # in-kernel J for EVERY level: rows [px, py, pz, j levels 1..K]
            for s_i in range(n_src):
                sp = src_ref[s_i, 0].astype(jnp.int32)
                py_s = src_ref[s_i, 1].astype(jnp.int32)
                if blocks is not None:
                    py_s = py_s - y0_blk
                pz_s = src_ref[s_i, 2].astype(jnp.int32)
                mask = jnp.logical_and(
                    sp == q, jnp.logical_and(iy == py_s, iz == pz_s)
                )
                base = 3 + 3 * (st - 1)
                for c in range(3):
                    ek[c] = jnp.where(
                        mask, ek[c] - c_b * src_ref[s_i, base + c], ek[c]
                    )
            ek = tuple(ek)

            # running DFT of E or H at fixed x-planes ((x0, which) with
            # which 0=E / 1=H), accumulated in-kernel:
            # acc for plane x0 enters at stage 1 through the plane-clamped
            # block (trash plane 0 absorbs non-x0 iterations), each stage
            # folds its tick's phase-weighted plane when q == x0 (relaying
            # unchanged otherwise), and stage K writes back through the
            # clamped out map — the psi carry pattern applied to spectra.
            # runtime-coordinate x-plane DFT: gated read-modify-write on
            # the resident accumulator block — only the one stage whose
            # plane matches the SMEM coordinate pays (the sharded wrapper
            # sends a far-off sentinel to every non-owner shard)
            for pi in range(n_rt):
                x0r = xdft_coord_ref[0, pi]
                fld_rt = ek if rt_whiches[pi] == 0 else hk

                @pl.when(q == x0r)
                def _acc_xdft(pi=pi, fld_rt=fld_rt, st=st):
                    for f_i in range(n_freq):
                        for ri in range(2):
                            ph = dft_phase_ref[st - 1, 2 * f_i + ri]
                            for c in range(3):
                                sl = (f_i * 2 + ri) * 3 + c
                                xdft_out[pi][sl] = (
                                    xdft_out[pi][sl] + ph * fld_rt[c]
                                )

            if dft_planes:
                for pi, (x0, which) in enumerate(dft_planes):
                    at_p = q == x0
                    fld = ek if which == 0 else hk
                    for f_i in range(n_freq):
                        for ri in range(2):
                            ph = dft_phase_ref[st - 1, 2 * f_i + ri]
                            for c in range(3):
                                sl = (f_i * 2 + ri) * 3 + c
                                gl = pi * 6 * n_freq + sl
                                if st == 1:
                                    prev = dft_in[pi][sl, 0]
                                else:
                                    prev = prev_dft[st - 1][gl]
                                newv = jnp.where(
                                    at_p, prev + ph * fld[c], prev
                                )
                                if st == k_steps:
                                    dft_out[pi][sl, 0] = newv
                                else:
                                    dft_holder[0][gl] = newv

            # per-tick per-plane scalar flux reductions (accumulator
            # support at kernel speed): each stage writes its plane's row
            # of the (nx+2, n_q) per-stage output — trash rows 0 / nx+1
            # absorb the clipped pipeline fill/drain writes. Descriptors:
            #   ("x",):    full-plane x-normal Poynting sum at every plane
            #   ("y", y0): z-row sum of the y-normal flux at column y0
            #   ("z", z0): y-row sum of the z-normal flux at lane z0
            # Sampled AFTER the tick's source injection, matching the
            # engine's step-then-update accumulator order.
            if flux_faces or row_y:
                # lateral (y) sharding: plane reductions must cover OWNED
                # columns only — halo-column outputs are garbage at late
                # stages, and the wrapper psums the per-shard partial sums
                # over the y mesh axis. The owned window in the extended
                # frame is static ([y_halo, ny - y_halo) on every shard).
                own_m = (jnp.logical_and(iy >= y_halo, iy < ny - y_halo)
                         if y_halo > 0 else None)
            if flux_faces:
                # full-plane products shared across same-axis descriptors;
                # lateral rows are selected with iota MASKS (slicing a
                # single sublane row hits Mosaic "offset change")
                s_x = s_y = s_z = None
                if any(fd[0] == "x" for fd in flux_faces):
                    s_x = ek[1] * hk[2] - ek[2] * hk[1]
                if any(fd[0] == "y" for fd in flux_faces):
                    s_y = ek[2] * hk[0] - ek[0] * hk[2]
                if any(fd[0] == "z" for fd in flux_faces):
                    s_z = ek[0] * hk[1] - ek[1] * hk[0]
                vals = []
                li = 0  # runtime lateral-coordinate slot counter
                for fd in flux_faces:
                    if fd[0] == "x":
                        s = jnp.sum(s_x if own_m is None
                                    else jnp.where(own_m, s_x, 0.0))
                    elif fd[0] == "y":
                        # 2-D sharding: the column coordinate arrives in
                        # the shard's extended frame; only the OWNER shard
                        # has it inside the owned window, so exactly one
                        # shard contributes to the psum
                        y0f = lat_ref[0, li] if runtime_lat else fd[1]
                        li += 1
                        cond = iy == y0f
                        if own_m is not None:
                            cond = jnp.logical_and(cond, own_m)
                        s = jnp.sum(jnp.where(cond, s_y, 0.0))
                    else:
                        cond = iz == fd[1]
                        if own_m is not None:
                            cond = jnp.logical_and(cond, own_m)
                        s = jnp.sum(jnp.where(cond, s_z, 0.0))
                    vals.append(s)
                # one full (8, 128) tile per plane row (Mosaic wants the
                # last two block dims tile-complete); values in row 0,
                # placed with iota masks (.at[].set is a scatter, which
                # Mosaic does not lower)
                t8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
                t128 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
                tile = jnp.zeros((8, 128), f32)
                for jq, s in enumerate(vals):
                    tile = jnp.where(
                        jnp.logical_and(t8 == 0, t128 == jq), s, tile
                    )
                flux_out[st - 1][0] = tile

            # per-stage DFT ROW captures: the raw E/H values along one
            # lateral line of this stage's plane, written out so lateral-
            # plane spectra (DftProbe axis 1/2, BoxDft y/z faces) can be
            # phase-folded OUTSIDE the kernel (XLA) without dropping the
            # run to single-stepping. Rows are selected with iota masks +
            # cross-sublane/lane sums (single-row slicing hits Mosaic
            # "offset change"); fill/drain writes land on trash rows.
            if row_y or row_z:
                fld6 = (ek[0], ek[1], ek[2], hk[0], hk[1], hk[2])
            if row_y:
                n_flux_y = sum(1 for fd in flux_faces if fd[0] == "y")
                t8y = jax.lax.broadcasted_iota(jnp.int32, (8, nz), 0)
                for di, y0 in enumerate(row_y):
                    # 2-D sharding: runtime extended-frame row coordinate
                    # + owned-window mask (same argument as the flux "y"
                    # descriptors above)
                    y0r = (lat_ref[0, n_flux_y + di] if runtime_lat
                           else y0)
                    cond = iy == y0r
                    if own_m is not None:
                        cond = jnp.logical_and(cond, own_m)
                    tile = jnp.zeros((8, nz), f32)
                    for c6 in range(6):
                        row = jnp.sum(
                            jnp.where(cond, fld6[c6], 0.0), axis=0
                        )
                        tile = jnp.where(t8y == c6, row[None, :], tile)
                    rowy_out[di][st - 1][0] = tile
            if row_z:
                tl = jax.lax.broadcasted_iota(jnp.int32, (ny, 128), 1)
                tile = jnp.zeros((ny, 128), f32)
                for di, z0 in enumerate(row_z):
                    for c6 in range(6):
                        col = jnp.sum(
                            jnp.where(iz == z0, fld6[c6], 0.0), axis=1
                        )
                        tile = jnp.where(
                            tl == 6 * di + c6, col[:, None], tile
                        )
                rowz_out[st - 1][0] = tile

            if st < k_steps:
                new_carries[st] = (ek, hk, new_psi_lvl, dpsi_holder[0],
                                   dft_holder[0])
                below_e, below_h = ek, hk
            else:
                out_fields = (ek, hk)

        eK, hK = out_fields
        for c in range(3):
            # storage rounding happens here (bf16 mode: with K-step
            # blocking, fields round only every K ticks — strictly less
            # rounding than the per-tick bound in tests/test_bf16_study)
            outs[c][0] = _own(eK[c]).astype(outs[c].dtype)
            outs[3 + c][0] = _own(hK[c]).astype(outs[3 + c].dtype)
        for lvl in range(1, k_steps):
            regs = c_lvl[lvl - 1]
            ek, hk, psis, dpsis, dfts = new_carries[lvl]
            for c in range(3):
                regs[c][...] = ek[c]
                regs[3 + c][...] = hk[c]
            for j, v in enumerate(psis):
                if v is not None:
                    regs[6 + j][...] = v
            for j, v in enumerate(dpsis):
                if v is not None:
                    regs[6 + n_terms + j][...] = v
            for j, v in enumerate(dfts):
                if v is not None:
                    regs[6 + n_terms + n_dense + j][...] = v
        c_topy[...] = hK[1]
        c_topz[...] = hK[2]

    return kernel, x_terms, yz_terms


@functools.lru_cache(maxsize=16)
def _build_call(shape, inv_dx, cpml, k_steps, with_tfsf, tfsf_planes, tfsf_box,
                dt, constants_key, interpret, n_src, n_materials=1,
                x_extra=0, runtime_edges=False, runtime_xprof=False,
                with_m=False, dtype_name="float32", runtime_tfsf=False,
                y_halo=0, runtime_ystrips=False, flux_faces=(),
                dense_spec=None, dft_spec=None, dft_rows=(), dft_rt=None,
                runtime_box_lat=False, runtime_lat=False, blocks=None,
                oblique_win=None, runtime_oblique=False,
                x_zone=None, zone_dst=None):
    from ..constants import REDUCED

    constants = SI if constants_key == "si" else REDUCED
    nx, ny, nz = shape
    # x-ZONED sweep (pallas_cpml_xz.py): run the K-pass over the plane
    # subrange [zx0, zx1) only. Fill reads reach up to zx1 + K - 2 and
    # drain reads down to zx0 - K (both from the intact previous-pass
    # buffers), output writes clip INTO the zone, and `zone_dst` marks
    # which outputs chain through a donated destination buffer
    # (input_output_aliases on a trailing whole-array HBM operand) so
    # the zone calls assemble one full state with no combine copies.
    zx0, zx1 = (0, nx) if x_zone is None else x_zone
    zoned = (zx0, zx1) != (0, nx)
    if zoned:
        assert 0 <= zx0 < zx1 <= nx
        assert dense_spec is None and dft_spec is None and dft_rt is None
        assert not flux_faces and not dft_rows
        assert not (runtime_edges or runtime_xprof or runtime_tfsf
                    or runtime_ystrips or runtime_oblique)
    # Sweep origin: one plane ABOVE the deepest plane the zone's outputs
    # consume (zx1 + K - 2). At the lattice top the at_hi edge mask
    # zeroes the x-forward-diff, so the first iteration's uninitialized
    # top-H carry never enters; an INTERIOR zone top has no such mask,
    # and the stage-1 E_y/E_z at the origin plane is NaN (uninit carry),
    # contaminating exactly the plane K-1 below it. Starting at
    # zx1 + K - 1 parks that contaminated chain one plane above the
    # consumed set: the extra plane's only consumed value is its
    # stage-1 H (computed from real reads, never NaN, and x-psi-free by
    # the xz_plan margin c1 <= nx - xhi - K).
    px_top = min(zx1 + k_steps - 1, nx - 1)
    grid_x = px_top - (zx0 - k_steps + 1) + 1
    layout = _psi_layout(shape, cpml, x_extra)
    if blocks is not None:
        # grid-blocked mode (pallas_cpml_gb.py): the kernel plane is a
        # [halo(h) | owned(nly) | halo(h)] window of the GLOBAL arrays;
        # z-strip profiles are baked pre-broadcast over the WINDOW's
        # sublanes (x profiles are y-invariant; y-strip profiles become
        # per-block runtime stacked operands)
        n_b_blk, nly_blk, h_blk = blocks
        W_blk = nly_blk + 2 * h_blk
        r_blk = nly_blk // h_blk
        nyh_blk = ny // h_blk
        profs = _profiles((nx, W_blk, nz), cpml, inv_dx, dt, constants)
        ny_k = W_blk
    else:
        profs = _profiles(shape, cpml, inv_dx, dt, constants)
        ny_k = ny
    plane = (1, ny, nz)
    f32 = jnp.float32

    def in_x(i):
        return jnp.maximum(px_top - i, 0)

    def halo_x(i):
        return jnp.maximum(px_top - 1 - i, 0)

    def out_x(i):
        return jnp.clip(px_top - i + (k_steps - 1), zx0, zx1 - 1)

    if blocks is None:
        in_specs_fld = [pl.BlockSpec(plane, lambda i: (in_x(i), 0, 0),
                                     memory_space=pltpu.VMEM)]
        halo_specs_fld = [pl.BlockSpec(plane, lambda i: (halo_x(i), 0, 0),
                                       memory_space=pltpu.VMEM)]
        out_specs_fld = [pl.BlockSpec(plane, lambda i: (out_x(i), 0, 0),
                                      memory_space=pltpu.VMEM)]
    else:
        # (left-halo, center, right-halo) input triples per field — all
        # block-granular over the plain GLOBAL arrays (h | nly); edge
        # blocks clamp onto junk columns masked by the window-frame
        # Neumann edges. Outputs write the owned center only.
        def _trip(xmap, width=None):
            w = nz if width is None else width
            return [
                pl.BlockSpec(
                    (1, h_blk, w),
                    lambda j, i, f=xmap: (
                        f(i), jnp.maximum(j * r_blk - 1, 0), 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, nly_blk, w),
                    lambda j, i, f=xmap: (f(i), j, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, h_blk, w),
                    lambda j, i, f=xmap: (
                        f(i), jnp.minimum((j + 1) * r_blk, nyh_blk - 1), 0),
                    memory_space=pltpu.VMEM,
                ),
            ]

        in_specs_fld = _trip(in_x)
        halo_specs_fld = _trip(halo_x)
        out_specs_fld = [pl.BlockSpec(
            (1, nly_blk, nz), lambda j, i: (out_x(i), j, 0),
            memory_space=pltpu.VMEM,
        )]

    def psi_specs(plane_of, is_out=False):
        """Blocked psi specs with the stage plane given by `plane_of(i)`.
        In blocks mode, x-slab and z-strip entries are laterally windowed
        (input triples / owned-center outputs); y-strip entries index the
        per-block (nx, n_b*(plo+phi), nz) layout by j."""
        specs = []
        for half, axis, comp, end, tshape, (t_lo, t_hi, plo, phi) in layout:
            if axis == 0:
                if end == "lo":

                    def x_idx(i, t_lo=t_lo):
                        return jnp.minimum(plane_of(i), t_lo)

                else:

                    def x_idx(i, t_hi=t_hi):
                        return jnp.maximum(plane_of(i) - (nx - t_hi - 1), 0)

                if blocks is None:
                    specs.append(pl.BlockSpec(
                        (1, ny, nz), lambda i, f=x_idx: (f(i), 0, 0),
                        memory_space=pltpu.VMEM,
                    ))
                elif is_out:
                    specs.append(pl.BlockSpec(
                        (1, nly_blk, nz),
                        lambda j, i, f=x_idx: (f(i), j, 0),
                        memory_space=pltpu.VMEM,
                    ))
                else:
                    specs.extend(_trip(x_idx))
            elif axis == 1:
                if blocks is None:
                    specs.append(pl.BlockSpec(
                        (1, plo + phi, nz),
                        lambda i, f=plane_of: (f(i), 0, 0),
                        memory_space=pltpu.VMEM,
                    ))
                else:
                    specs.append(pl.BlockSpec(
                        (1, plo + phi, nz),
                        lambda j, i, f=plane_of: (f(i), j, 0),
                        memory_space=pltpu.VMEM,
                    ))
            else:
                if blocks is None:
                    specs.append(pl.BlockSpec(
                        (1, ny, plo + phi),
                        lambda i, f=plane_of: (f(i), 0, 0),
                        memory_space=pltpu.VMEM,
                    ))
                elif is_out:
                    specs.append(pl.BlockSpec(
                        (1, nly_blk, plo + phi),
                        lambda j, i, f=plane_of: (f(i), j, 0),
                        memory_space=pltpu.VMEM,
                    ))
                else:
                    specs.extend(_trip(plane_of, width=plo + phi))
        return specs

    psi_in_specs = psi_specs(in_x)
    psi_out_specs = psi_specs(out_x, is_out=True)

    if n_materials > 1:
        in_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)]  # (K_mat, 4) table
    else:
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]  # coef row (1, 4)
    if runtime_edges:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))  # (1, 2) i32
    if runtime_lat:
        # (1, n_lat) i32 extended-frame lateral coordinates ("y" flux
        # descriptors, then "y" row captures) — 2-D sharded builds only
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
    static_inputs = []
    if any(axis == 0 for _, axis, *_ in layout):
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))  # (2, 5, nx)
        if not runtime_xprof:
            static_inputs.append(np.stack([profs[("h", 0)], profs[("e", 0)]]))
    if with_tfsf:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))  # (2K, aux)
        if runtime_tfsf:
            in_specs.append(
                pl.BlockSpec(memory_space=pltpu.SMEM)  # (1, 2) i32 planes
            )
    if n_src > 0:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))  # (n, 3+3K)
    strip_inputs = []
    for half in ("h", "e"):
        for axis in (1, 2):
            if (half, axis) in profs:
                if blocks is not None and axis == 1:
                    # per-block stacked (n_b, 3, plo+phi, 1) y-strip
                    # profiles (identity on non-owner blocks), passed at
                    # call time by pallas_cpml_gb; blocked by j
                    p_tot = profs[(half, axis)].shape[1]
                    in_specs.append(pl.BlockSpec(
                        (1, 3, p_tot, 1), lambda j, i: (j, 0, 0, 0),
                        memory_space=pltpu.VMEM,
                    ))
                    continue
                in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
                # under lateral (y) sharding the y-strip profiles are
                # per-shard RUNTIME operands (live on edge shards, identity
                # elsewhere); the caller interleaves them in this same
                # (half, axis) order. z strips stay baked (z undecomposed).
                if not (runtime_ystrips and axis == 1):
                    strip_inputs.append(profs[(half, axis)])
    if n_materials > 1:
        # per-stage matid planes (stage j+1 consumes plane p+j, clamped)
        def stage_x(j):
            return lambda i: jnp.clip(px_top - i + j, 0, nx - 1)

        if blocks is None:
            in_specs += [
                pl.BlockSpec(plane,
                             lambda i, f=stage_x(j): (f(i), 0, 0),
                             memory_space=pltpu.VMEM)
                for j in range(k_steps)
            ]
        else:
            # matid is STATIC: baked once in the per-block extended
            # layout (nx, n_b*W, nz) (pallas_sharded_cpml._ext_clamped),
            # so each stage reads one (1, W, nz) window directly
            in_specs += [
                pl.BlockSpec((1, W_blk, nz),
                             lambda j, i, f=stage_x(s): (f(i), j, 0),
                             memory_space=pltpu.VMEM)
                for s in range(k_steps)
            ]
    if dense_spec is not None:
        # volumetric-region (DensePml) operands: per-stage (6, 1, by, bz)
        # coefficient blocks [ik_h, b_h, c_h, ik_e, b_e, c_e] clamped to
        # the box x extent, and the (4, bx+1, by, bz) psi volume (slots
        # (h,c0),(h,c1),(e,c0),(e,c1); plane 0 is the trash plane) blocked
        # at the stage-1 plane like the x-psi slabs
        _, (ddx0, ddx1), (ddy0, ddy1), (ddz0, ddz1) = dense_spec
        bx_d, by_d, bz_d = ddx1 - ddx0, ddy1 - ddy0, ddz1 - ddz0

        def dco_idx(j):
            return lambda i: (
                0, jnp.clip(nx - 1 - i + j - ddx0, 0, bx_d - 1), 0, 0
            )

        in_specs += [
            pl.BlockSpec((6, 1, by_d, bz_d), dco_idx(j),
                         memory_space=pltpu.VMEM)
            for j in range(k_steps)
        ]
        in_specs.append(pl.BlockSpec(
            (4, 1, by_d, bz_d),
            lambda i: (0, jnp.clip(nx - 1 - i - ddx0 + 1, 0, bx_d), 0, 0),
            memory_space=pltpu.VMEM,
        ))
    if oblique_win is not None:
        # per-stage (1, 6, 1, by, bz) analytic-correction blocks of the
        # (K, 6, xl, by, bz) stack, clamped to the subgrid x extent
        # (stage j+1 consumes the level-j volume at its plane). With
        # runtime_oblique the x start comes from the scalar-PREFETCH
        # operand instead (per-shard extended coordinate), so the SPMD
        # sharded build can move the stack per shard. In BLOCKS mode the
        # stack arrives PRE-PLACED at full window height per lateral
        # block ((n_b*K, 6, xl, W, bz): the host shifts the correction
        # rows into each block's window frame, zeros elsewhere), so the
        # in-kernel patch placement stays static — the lateral offset
        # varies per block, which a shared kernel program cannot express
        # through _patch_add's static stitching.
        obx0_s, obxl_s, _, obby_s, _, obbz_s = oblique_win

        if blocks is not None:
            assert not runtime_oblique

            def ob_idx(j):
                return lambda jb, i, j=j: (
                    jb * k_steps + j, 0,
                    jnp.clip(px_top - i + j - obx0_s, 0, obxl_s - 1),
                    0, 0,
                )

            ob_spec_pos = len(in_specs)
            in_specs += [
                pl.BlockSpec((1, 6, 1, W_blk, obbz_s), ob_idx(j),
                             memory_space=pltpu.VMEM)
                for j in range(k_steps)
            ]
        else:
            if runtime_oblique:

                def ob_idx(j):
                    return lambda i, s, j=j: (
                        j, 0,
                        jnp.clip(px_top - i + j - s[0], 0, obxl_s - 1),
                        0, 0,
                    )

            else:

                def ob_idx(j):
                    return lambda i: (
                        j, 0,
                        jnp.clip(px_top - i + j - obx0_s, 0, obxl_s - 1),
                        0, 0,
                    )

            ob_spec_pos = len(in_specs)
            in_specs += [
                pl.BlockSpec((1, 6, 1, obby_s, obbz_s), ob_idx(j),
                             memory_space=pltpu.VMEM)
                for j in range(k_steps)
            ]
    else:
        ob_spec_pos = -1
    dft_planes, n_freq = dft_spec if dft_spec is not None else ((), 0)
    rt_whiches, rt_freq = dft_rt if dft_rt is not None else ((), 0)
    n_rt = len(rt_whiches)
    n_freq = n_freq or rt_freq
    if dft_planes or n_rt:
        # (K, 2F) cos/sin phase rows, shared by both DFT mechanisms
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
    if dft_planes:
        # one (6F, 2, ny, nz) accumulator per probe plane (trash plane
        # 0), blocked at the stage-1 plane
        for x0, _which in dft_planes:
            in_specs.append(pl.BlockSpec(
                (6 * n_freq, 1, ny, nz),
                lambda i, x0=x0: (
                    0, jnp.clip(nx - 1 - i - x0 + 1, 0, 1), 0, 0
                ),
                memory_space=pltpu.VMEM,
            ))
    if n_rt:
        # (1, n_rt) SMEM runtime plane coordinates + one resident
        # constant-map (6F, ny, nz) accumulator block per plane
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        for _ in range(n_rt):
            in_specs.append(pl.BlockSpec(
                (6 * n_freq, ny, nz), lambda i: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ))
    in_specs += in_specs_fld * 6 + halo_specs_fld * 2
    in_specs += psi_in_specs
    # chain-destination dummies: one whole-array HBM operand per flagged
    # output, donated to it via input_output_aliases — unvisited output
    # blocks then retain the previous zone call's content
    dst_alias = {}
    if zone_dst is not None:
        # zoned chains AND whole-sweep blocks-mode double passes
        # (pallas_cpml_gb step2) use dst donation; a whole sweep visits
        # every output block, so there the dst is pure donation with no
        # retention semantics
        assert (zoned or blocks is not None)
        assert len(zone_dst) == 6 + len(layout)
        for oi, flag in enumerate(zone_dst):
            if flag:
                dst_alias[len(in_specs)] = oi
                in_specs.append(pl.BlockSpec(memory_space=pl.ANY))

    # per-stage flux-reduction outputs: (nx+2, n_q) rows, the stage's
    # plane row selected by the same descending map as the field outputs
    # (stage st = j+1 computes plane q = nx-1-i+j -> row q+1, clipped
    # onto the trash rows 0 / nx+1 during fill/drain)
    flux_specs, flux_shapes = [], []
    if flux_faces:
        for j in range(k_steps):
            flux_specs.append(pl.BlockSpec(
                (1, 8, 128),
                lambda i, j=j: (jnp.clip(nx - i + j, 0, nx + 1), 0, 0),
                memory_space=pltpu.VMEM,
            ))
            flux_shapes.append(jax.ShapeDtypeStruct((nx + 2, 8, 128), f32))

    dpsi_out_specs, dpsi_shapes = [], []
    if dense_spec is not None:
        dpsi_out_specs.append(pl.BlockSpec(
            (4, 1, by_d, bz_d),
            lambda i: (
                0,
                jnp.clip(nx - 1 - i + (k_steps - 1) - ddx0 + 1, 0, bx_d),
                0, 0,
            ),
            memory_space=pltpu.VMEM,
        ))
        dpsi_shapes.append(
            jax.ShapeDtypeStruct((4, bx_d + 1, by_d, bz_d), f32)
        )

    dft_out_specs, dft_shapes = [], []
    for x0, _which in dft_planes:
        dft_out_specs.append(pl.BlockSpec(
            (6 * n_freq, 1, ny, nz),
            lambda i, x0=x0: (
                0,
                jnp.clip(nx - 1 - i + (k_steps - 1) - x0 + 1, 0, 1),
                0, 0,
            ),
            memory_space=pltpu.VMEM,
        ))
        dft_shapes.append(
            jax.ShapeDtypeStruct((6 * n_freq, 2, ny, nz), f32)
        )
    for _ in range(n_rt):
        dft_out_specs.append(pl.BlockSpec(
            (6 * n_freq, ny, nz), lambda i: (0, 0, 0),
            memory_space=pltpu.VMEM,
        ))
        dft_shapes.append(jax.ShapeDtypeStruct((6 * n_freq, ny, nz), f32))

    # DFT row-capture outputs (lateral-plane spectra): K per-stage tiles
    # per "y" descriptor, one shared K-set for all "z" descriptors; the
    # stage's plane row is selected by the same descending map as flux
    row_specs, row_shapes = [], []
    n_row_y = sum(1 for d in dft_rows if d[0] == "y")
    has_row_z = any(d[0] == "z" for d in dft_rows)
    for _ in range(n_row_y):
        for j in range(k_steps):
            row_specs.append(pl.BlockSpec(
                (1, 8, nz),
                lambda i, j=j: (jnp.clip(nx - i + j, 0, nx + 1), 0, 0),
                memory_space=pltpu.VMEM,
            ))
            row_shapes.append(jax.ShapeDtypeStruct((nx + 2, 8, nz), f32))
    if has_row_z:
        for j in range(k_steps):
            row_specs.append(pl.BlockSpec(
                (1, ny, 128),
                lambda i, j=j: (jnp.clip(nx - i + j, 0, nx + 1), 0, 0),
                memory_space=pltpu.VMEM,
            ))
            row_shapes.append(jax.ShapeDtypeStruct((nx + 2, ny, 128), f32))

    out_specs = tuple(
        out_specs_fld * 6 + psi_out_specs + dpsi_out_specs + dft_out_specs
        + flux_specs + row_specs
    )
    psi_shapes = []
    for _h, _axis, *_rest, ts, _pads in layout:
        if blocks is not None and _axis == 1:
            # y-strip psi lives in the per-block layout (slice j holds
            # block j's strip rows; identity profiles keep non-owner
            # slices at zero)
            ts = (ts[0], n_b_blk * ts[1], ts[2])
        psi_shapes.append(jax.ShapeDtypeStruct(ts, f32))
    out_shape = tuple(
        [jax.ShapeDtypeStruct(shape, jnp.dtype(dtype_name)) for _ in range(6)]
        + psi_shapes
        + dpsi_shapes
        + dft_shapes
        + flux_shapes
        + row_shapes
    )

    kernel, x_terms, yz_terms = _make_kernel(
        shape, inv_dx, layout, nx, k_steps, with_tfsf, tfsf_planes, tfsf_box,
        n_src, n_materials, runtime_edges, with_m, runtime_tfsf, y_halo,
        flux_faces, dense_spec, dft_spec, dft_rows, dft_rt,
        runtime_box_lat=runtime_box_lat, runtime_lat=runtime_lat,
        blocks=blocks, oblique_win=oblique_win,
        runtime_oblique=runtime_oblique,
        unit_kappa=float(cpml.spec.kappa_max) == 1.0,
        px_top=px_top, n_dst=len(dst_alias),
    )

    # scratch per level: 6 field planes + per-term psi slots (all at the
    # KERNEL plane height ny_k — the per-block window width under blocks)
    def term_scratch():
        slots = [pltpu.VMEM((ny_k, nz), f32) for _ in range(6)]
        for _ in x_terms:
            slots.append(pltpu.VMEM((ny_k, nz), f32))
        for half, axis, comp, (t_lo, t_hi, plo, phi) in yz_terms:
            if axis == 1:
                slots.append(pltpu.VMEM((plo + phi, nz), f32))
            else:
                slots.append(pltpu.VMEM((ny_k, plo + phi), f32))
        if dense_spec is not None:
            slots += [pltpu.VMEM((by_d, bz_d), f32) for _ in range(4)]
        slots += [
            pltpu.VMEM((ny_k, nz), f32)
            for _ in range(6 * n_freq * len(dft_planes))
        ]
        return slots

    scratch = []
    for _ in range(k_steps - 1):
        scratch += term_scratch()
    scratch += [pltpu.VMEM((ny_k, nz), f32), pltpu.VMEM((ny_k, nz), f32)]

    if zoned or dst_alias:
        # in→out aliasing of the state is unsound across zone calls (a
        # later zone's fill/drain reads the neighbor zones' previous-pass
        # planes) and in blocks mode generally (halo re-reads); only the
        # chain-destination aliases apply, and those are CORRECTNESS-
        # required (zoned) or the step2 donation (blocks double pass)
        io_aliases = dict(dst_alias)
    elif blocks is None:
        n_small = len(in_specs) - 8 - len(psi_in_specs) - len(dst_alias)
        io_aliases = {n_small + f: f for f in range(6)}
        for j in range(len(psi_in_specs)):
            io_aliases[n_small + 8 + j] = 6 + j
    else:
        # aliasing is UNSOUND here: with blocks outer, block j+1 reads
        # its left-halo columns (owned by block j) at tick 0 AFTER block
        # j would have written its tick-K values — inputs must stay the
        # previous pass's buffers
        io_aliases = {}

    plane_bytes = ny_k * nz * 4
    dense_bytes = (
        (4 * (k_steps - 1) + 28) * by_d * bz_d * 4
        if dense_spec is not None else 0
    )
    dense_bytes += (
        6 * n_freq * len(dft_planes) * ((k_steps - 1) + 4) * ny * nz * 4
    )
    # runtime-coordinate DFT: in + out resident blocks per plane
    dense_bytes += 2 * 6 * n_freq * n_rt * ny * nz * 4
    if oblique_win is not None:
        # K double-buffered (6, by, bz) correction blocks (full window
        # height under blocks mode — the pre-placed stack)
        ob_h = ny_k if blocks is not None else oblique_win[3]
        dense_bytes += 2 * k_steps * 6 * ob_h * oblique_win[5] * 4
    vmem_limit = min(
        int(plane_bytes * (80 + 30 * k_steps) + dense_bytes + (8 << 20)),
        120 * (1 << 20),
    )
    if runtime_oblique:
        # scalar-PREFETCH build (PrefetchScalarGridSpec): every index
        # map receives the scalar ref as a trailing argument — the
        # oblique per-stage maps consume it; every other map gets a
        # dropping adapter. Alias indices shift by num_scalar_prefetch
        # (they count the scalar operand — verified convention).
        assert blocks is None

        def _drop_scalar(spec):
            f = spec.index_map
            if f is None:
                return spec
            return pl.BlockSpec(
                spec.block_shape, lambda *a, _f=f: _f(*a[:-1]),
                memory_space=spec.memory_space,
            )

        in_specs = [
            s if ob_spec_pos <= j < ob_spec_pos + k_steps
            else _drop_scalar(s)
            for j, s in enumerate(in_specs)
        ]
        out_specs = tuple(_drop_scalar(s) for s in out_specs)
        call = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(grid_x,),
                in_specs=in_specs,
                out_specs=out_specs,
                scratch_shapes=scratch,
            ),
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=vmem_limit),
            input_output_aliases=(
                {j + 1: v for j, v in io_aliases.items()}
                if _USE_IO_ALIASES else {}),
            interpret=interpret,
        )
    else:
        call = pl.pallas_call(
            kernel,
            grid=((grid_x,) if blocks is None else (n_b_blk, grid_x)),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=vmem_limit),
            input_output_aliases=(
                io_aliases if (_USE_IO_ALIASES or zoned or dst_alias)
                else {}),
            interpret=interpret,
        )
    return call, [jnp.asarray(a) for a in static_inputs], \
        [jnp.asarray(a) for a in strip_inputs]


def pallas_cpml_stepk_fn(
    shape: Tuple[int, int, int],
    k_steps: int,
    *,
    inv_dx: Tuple[float, float, float],
    dt: float,
    bc: BoundaryConditions = BoundaryConditions(),
    constants: PhysicalConstants = SI,
    cpml,
    tfsf=None,
    max_sources: int = 0,
    interpret: bool = False,
    matid=None,
    n_materials: int = 1,
    with_m: bool = False,
    dtype=jnp.float32,
    flux_faces=(),
    dense=None,
    dft=None,
    dft_rows=(),
    dft_runtime=None,
    oblique=None,
):
    """Build step(state: PmlKernelState, coeffs, sources) advancing
    ``k_steps`` absorbing ticks per call. Uniform scalar coefficients;
    J (and with ``with_m``, M) sources inject in-kernel at every level
    (max_sources must equal the real count). ``dtype`` is the field
    STORAGE dtype (f32 or bf16); compute, carries and psi are always
    f32 — bf16 fields round only at the every-K-ticks HBM write-back.

    ``flux_faces`` (tuple of ("x",) / ("y", y0) / ("z", z0) descriptors)
    switches on in-kernel per-tick per-plane Poynting reductions: the
    step then returns ``(state, flux_rows)`` with flux_rows of shape
    (K, nx, n_q) f32 — tick level on axis 0, lattice plane on axis 1 —
    at near-zero extra HBM traffic (K*nx*n_q scalars per pass). This is
    what lets per-tick accumulators (scattering box flux) ride the
    K-step kernel instead of forcing single-stepping.

    ``dense`` (a solver.pml_region.DensePml) applies the volumetric
    per-cell uniaxial stretch IN-KERNEL on its AABB subgrid (interior
    absorbers of any shape, engine.py semantics); the state must come
    from init_pml_kernel_state(..., dense=dense), which appends the
    (4, bx+1, by, bz) region psi volume to ``psi``.

    ``dft`` = (planes, frequencies): running per-tick DFT of the E or H
    field at the given x-planes, accumulated IN-KERNEL (psi carry
    pattern) — DftProbe spectra without dropping to single-stepping.
    Each plane is ``x0`` (E field) or ``(x0, which)`` with which 0=E /
    1=H. One (6F, 2, ny, nz) accumulator tensor per plane rides the psi
    tail (init_pml_kernel_state(..., dft=dft)); slots are
    (f, re/im, comp), live plane 1, trash plane 0, phase convention
    exp(-2j pi f t) with t = (tick_after_step) * dt — exactly
    probes.DftProbe.update for either component (no Yee half-tick
    shift: the engine-side accumulator samples H at the same post-step
    tick).

    ``dft_rows`` = tuple of ("y", y0) / ("z", z0) descriptors: per-stage
    RAW E+H row captures along the given lateral line of every x-plane,
    for lateral-plane spectra (DftProbe axis 1/2, BoxDft y/z faces). The
    step then additionally returns a tuple (descriptor order) of
    (K, nx, 6, lat) f32 capture blocks — comps (ex,ey,ez,hx,hy,hz), lat
    = nz for "y" / ny for "z" — whose phase fold happens OUTSIDE the
    kernel (simulation.py fold_dft_rows). Return order: state
    [, flux_rows][, dft_row_captures].

    ``dft_runtime`` = (planes, frequencies), planes as in ``dft``: the
    RUNTIME-COORDINATE variant of the in-kernel x-plane DFT — the plane
    index enters through SMEM per call instead of being baked into the
    block maps, and each plane's accumulator is a resident
    constant-index (6F, ny, nz) block on the psi tail
    (init_pml_kernel_state(..., dft_runtime=...); slot (f, re/im, comp)).
    Numerically identical to ``dft``; exists so the SHARDED wrapper can
    move plane coordinates per shard (axis-0 DftProbe / BoxDft x-face
    spectra on multi-chip runs). Frequencies must match ``dft``'s when
    both are given (they share the phase rows)."""
    dft_rows = tuple((str(a), int(v)) for a, v in dft_rows)
    if dft_runtime is not None:
        rt_planes = tuple(
            (int(p), 0) if not isinstance(p, tuple) else
            (int(p[0]), int(p[1]))
            for p in dft_runtime[0]
        )
        rt_freqs = tuple(dft_runtime[1])
        if dft is not None and tuple(dft[1]) != rt_freqs:
            raise ValueError("dft and dft_runtime must share frequencies")
        dft_rt_key = (tuple(w for _, w in rt_planes), len(rt_freqs))
    else:
        rt_planes, rt_freqs, dft_rt_key = (), (), None
    if dft is not None:
        dft_planes_n = tuple(
            (int(p), 0) if not isinstance(p, tuple) else
            (int(p[0]), int(p[1]))
            for p in dft[0]
        )
        dft_key = (dft_planes_n, len(dft[1]))
    else:
        dft_key = None
    if not supports_cpml_k(shape, bc, cpml, k_steps, dtype, dense=dense,
                           dft=dft_key, dft_rows=dft_rows,
                           dft_rt=((len(rt_planes), len(rt_freqs))
                                   if rt_planes else None),
                           oblique=oblique):
        raise ValueError(f"CPML K-step kernel does not support {shape=} {k_steps=}")
    if with_m and max_sources == 0:
        raise ValueError("with_m requires in-kernel sources (max_sources > 0)")
    nx = shape[0]
    inv_dx = tuple(float(v) for v in inv_dx)
    constants_key = "si" if constants is SI or constants == SI else "reduced"
    tfsf_planes = tuple(tfsf.span) if tfsf is not None else (0, 0)
    tfsf_box = None
    aux_coeffs = None
    if tfsf is not None:
        tfsf.validate(shape)
        if tfsf.is_box:
            tfsf_box = (tuple(tfsf.span_y), tuple(tfsf.span_z))
        from ..coefficients import update_coefficients
        from ..grid import Resolution
        from ..material import VACUUM

        dx0 = 1.0 / inv_dx[0]
        vacuum_row = update_coefficients(
            VACUUM, Resolution(spatial=(dx0,) * 3, temporal=dt), constants
        )
        aux_coeffs = tfsf.build_aux(nx, vacuum_row, dt, dx0, constants,
                                    jnp.float32)

    if matid is not None and shape[1] % 32 != 0:
        raise ValueError("matid mode needs ny % 32 == 0 (uint8 tile)")
    n_mat = n_materials if matid is not None else 1
    dense_spec = None
    dco = None
    if dense is not None:
        dense.validate(shape)
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
        # oblique-incidence TF/SF (solver/tfsf_oblique.py): the analytic
        # correction volumes are precomputed per pass on the commutator
        # subgrid and added in-kernel (reference has no TF/SF at all;
        # the XLA-engine path is engine.py:311-319/363-370)
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
    call, x_inputs, strip_inputs = _build_call(
        tuple(shape), inv_dx, cpml, int(k_steps), tfsf is not None,
        tfsf_planes, tfsf_box, float(dt), constants_key, interpret,
        int(max_sources), n_mat, 0, False, False, bool(with_m),
        jnp.dtype(dtype).name, flux_faces=tuple(flux_faces),
        dense_spec=dense_spec, dft_spec=dft_key, dft_rows=dft_rows,
        dft_rt=dft_rt_key, oblique_win=oblique_win,
    )
    n_psi = len(_psi_layout(tuple(shape), cpml))
    n_dft_pl = len(dft[0]) if dft is not None else 0
    n_rt_pl = len(rt_planes)
    if dft is not None or n_rt_pl:
        import math as _math

        dft_freqs = jnp.asarray(
            tuple(dft[1]) if dft is not None else rt_freqs, jnp.float32
        )
        _two_pi = jnp.float32(2.0 * _math.pi)
    if n_rt_pl:
        rt_coords = jnp.asarray(
            [[p for p, _ in rt_planes]], jnp.int32
        )

    def step(state: PmlKernelState, coeffs, sources) -> PmlKernelState:
        if matid is not None:
            row = jnp.asarray(coeffs, jnp.float32)  # (K_mat, 4) table
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
            # tick the 1D aux grid K times, recording each level's rows
            rows = []
            for lvl in range(k_steps):
                t = (state.tick + lvl).astype(jnp.float32) * jnp.float32(dt)
                new_e, new_h = tfsf.aux_step(
                    aux_e, aux_h, aux_coeffs, t, inv_dx[0], jnp.float32
                )
                rows.append(aux_e)   # OLD aux_e for the H pass
                rows.append(new_h)   # NEW aux_h for the E pass
                aux_e, aux_h = new_e, new_h
            args.append(jnp.stack(rows))
        if max_sources > 0:
            if sources is None or sources.num_sources != max_sources:
                raise ValueError(
                    f"kernel built for {max_sources} in-kernel sources, got "
                    f"{0 if sources is None else sources.num_sources}"
                )
            n = sources.num_sources
            rows = [sources.points.astype(jnp.float32)]
            m_rows = []
            for lvl in range(k_steps):
                t = (state.tick + lvl).astype(jnp.float32) * jnp.float32(dt)
                j_vals, m_vals = sources.values(t)
                rows.append(j_vals.astype(jnp.float32))
                if with_m:
                    m_rows.append(m_vals.astype(jnp.float32))
            args.append(jnp.concatenate(rows + m_rows, axis=1))
        args += strip_inputs
        if matid is not None:
            args += [matid] * k_steps
        if dense is not None:
            args += [dco] * k_steps
            # region psi volume (init_pml_kernel_state dense=); the dft
            # accumulators (if any) follow it in the psi tail
            args.append(state.psi[n_psi])
        if oblique is not None:
            # per-pass analytic correction stack (K, 6, xl, by, bz):
            # corr_h at each level's tick, corr_e at tick + 1/2
            # (engine.py H-pass/E-pass time conventions)
            rows = []
            for lvl in range(k_steps):
                t = (state.tick + lvl).astype(jnp.float32) \
                    * jnp.float32(dt)
                ch = ob_corr_h(t)
                ce = ob_corr_e(t + jnp.float32(0.5 * dt))
                rows.append(jnp.stack(list(ch) + list(ce)))
            args += [jnp.stack(rows)] * k_steps
        if dft is not None or n_rt_pl:
            rows = []
            for lvl in range(k_steps):
                t = (state.tick + 1 + lvl).astype(jnp.float32) \
                    * jnp.float32(dt)
                ph = -_two_pi * dft_freqs * t
                rows.append(
                    jnp.stack([jnp.cos(ph), jnp.sin(ph)], axis=1)
                    .reshape(-1)
                )
            args.append(jnp.stack(rows))  # (K, 2F)
        n_tail_d = 1 if dense is not None else 0
        if dft is not None:
            args += list(
                state.psi[n_psi + n_tail_d: n_psi + n_tail_d + n_dft_pl]
            )
        if n_rt_pl:
            args.append(rt_coords)  # (1, n_rt) SMEM plane coordinates
            base = n_psi + n_tail_d + n_dft_pl
            args += list(state.psi[base: base + n_rt_pl])
        args += [state.ex, state.ey, state.ez, state.hx, state.hy, state.hz,
                 state.ey, state.ez]
        args += list(state.psi[:n_psi])
        outs = call(*args)
        psi_new = tuple(outs[6: 6 + n_psi])
        n_out = 6 + n_psi
        if dense is not None:
            psi_new = psi_new + (outs[n_out],)
            n_out += 1
        if dft is not None:
            psi_new = psi_new + tuple(outs[n_out: n_out + n_dft_pl])
            n_out += n_dft_pl
        if n_rt_pl:
            psi_new = psi_new + tuple(outs[n_out: n_out + n_rt_pl])
            n_out += n_rt_pl
        new = PmlKernelState(
            ex=outs[0], ey=outs[1], ez=outs[2],
            hx=outs[3], hy=outs[4], hz=outs[5],
            tick=state.tick + k_steps, psi=psi_new,
            aux_e=aux_e, aux_h=aux_h,
        )
        res = [new]
        if flux_faces:
            # (K, nx, n_q): drop the trash rows and the tile padding
            flux_rows = jnp.stack(outs[n_out: n_out + k_steps])[
                :, 1: nx + 1, 0, : len(flux_faces)
            ]
            n_out += k_steps
            res.append(flux_rows)
        if dft_rows:
            # kernel output order: one K-set per "y" descriptor, then the
            # shared "z" K-set; re-emit in the caller's dft_rows order as
            # (K, nx, 6, lat) blocks
            y_caps = []
            for _ in range(sum(1 for d in dft_rows if d[0] == "y")):
                y_caps.append(jnp.stack(outs[n_out: n_out + k_steps])[
                    :, 1: nx + 1, 0:6, :
                ])
                n_out += k_steps
            z_block = None
            if any(d[0] == "z" for d in dft_rows):
                z_block = jnp.stack(outs[n_out: n_out + k_steps])[
                    :, 1: nx + 1
                ]  # (K, nx, ny, 128)
                n_out += k_steps
            caps, yi, zi = [], 0, 0
            for a, _v in dft_rows:
                if a == "y":
                    caps.append(y_caps[yi]); yi += 1
                else:
                    blk = z_block[:, :, :, 6 * zi: 6 * zi + 6]
                    caps.append(jnp.transpose(blk, (0, 1, 3, 2)))
                    zi += 1
            res.append(tuple(caps))
        if len(res) == 1:
            return new
        return tuple(res)

    return step
