"""Lateral-blocked CPML K-step: temporal blocking past the VMEM wall.

The in-kernel CPML K-step (pallas_cpml_k.py) carries (k-1) levels of
full (ny, nz) plane scratch, so large lateral planes cap K: at 512^3
f32 the VMEM guard stops at K=3 (16.8 Gcell/s) while 256^3 runs K=8
(24.6 Gcell/s). This module restores the deep-K regime for big planes
by decomposing the LATERAL (y) dimension into n_b sequential blocks on
ONE chip — the single-device analog of the sharded tier's 2-D lateral
decomposition (parallel/pallas_sharded_cpml.py), with static slicing
playing the role of ppermute halo exchange:

1. Fields, x-slab psi, and z-strip psi carry ``h >= k`` halo COLUMNS
   per side per block (layout [halo(h) | owned(nly) | halo(h)] along y,
   blocks concatenated); each pass refreshes the halos from the
   neighbor's owned columns (plain slicing — same chip), then every
   block runs the SAME per-block kernel build for k ticks. The
   extended-halo exactness argument of the sharded tier applies
   verbatim: level-k outputs are exact on the owned columns, halo
   outputs are garbage overwritten by the next refresh.
2. y-strip psi stays in strip-index space (live only in the first/last
   block's owned columns, >= k clear of the block edges —
   ``blocked_plan`` enforces the same containment as
   supports_sharded_cpml), so it needs NO refresh; the strip PROFILES
   become per-block runtime operands (the sharded tier's
   _ystrips_sharded with n_b "shards") and the kernel's strip segments
   sit y_halo=h columns inside the plane.
3. Global Neumann edge masks move per block via the kernel's runtime
   edges row (sentinels off the grid disable them on interior blocks);
   J/M point sources inject at per-block shifted y coordinates WITHOUT
   clipping, so sources within h columns of a block boundary also land
   in the neighbor's halo copy. Slab TF/SF is block-invariant (x is
   not decomposed); box TF/SF ships per-block y-face coordinates
   through the same runtime row the sharded tier uses
   (runtime_box_lat). Compressed materials ride as per-block extended
   matid slices.

The halo width ``h`` rounds k up to the lateral tile alignment
(ny_block % 8, or % 32 for matid), so each block's plane is
Mosaic-tileable. Cost: 2h/nly redundant lateral compute plus one
h-column refresh per pass — ~6-13% — against a 2-3x K lift. Block
calls are data-independent within a pass but serialize on the single
core, which is exactly the machine model.

State at rest stays the plain GLOBAL PmlKernelState
(solver/pallas_cpml.py) — Simulation.run extends it into the blocked
layout around the compiled scan (extend_blocked_pml_state /
collapse_blocked_pml_state), so init(), checkpointing, and every other
consumer are layout-oblivious.

Reference correspondence: the same single-GPU update pass as
cem-solver/src/fdtd/wgpu/update.wgsl:155-177, tiled laterally to fit
the TPU's on-chip memory hierarchy (the reference has no analog — its
GPU backend streams every field from HBM every tick).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import SI, PhysicalConstants
from .boundary import BoundaryConditions
from .engine import _slab_extents
from .pallas_cpml import PmlKernelState, _pad8, _psi_layout
from .pallas_cpml_k import _build_call, supports_cpml_k
from .state import SimState

__all__ = [
    "blocked_plan",
    "extend_blocked_pml_state",
    "collapse_blocked_pml_state",
    "blocked_owned_view",
    "make_pallas_cpml_blocked_stepk",
]

_FIELDS = ("ex", "ey", "ez", "hx", "hy", "hz")
_BIG = 2 ** 30


def _halo_width(k: int, nly: int, matid: bool) -> Optional[int]:
    """Smallest halo >= k keeping the block plane tile-aligned
    (ny_block = nly + 2h: % 8 always, % 32 in matid mode), or None."""
    align = 16 if matid else 4  # 2h must preserve nly's alignment
    if nly % (32 if matid else 8) != 0:
        return None
    return -(-k // align) * align


def blocked_plan(shape, bc, cpml, k: int, *, dtype=jnp.float32,
                 matid: bool = False,
                 n_b_candidates=(2, 4, 8)) -> Optional[Tuple[int, int]]:
    """(n_b, h) for the smallest block count that supports this config
    at K=k, or None. Mirrors supports_sharded_cpml's y containment: the
    y-PML strips (plus the E-half's inward reach) must end >= k columns
    inside the first/last block's owned region, and the padded strip
    segments must fit inside one block's owned width."""
    nx, ny, nz = shape
    for n_b in n_b_candidates:
        if n_b < 2 or ny % n_b != 0:
            continue
        nly = ny // n_b
        h = _halo_width(k, nly, matid)
        if h is None or nly < 2 * h:
            continue
        ylo, yhi = cpml.thickness[1]
        ok = True
        for half in (False, True):
            (l0, l1), (h0, h1) = _slab_extents(ny, ylo, yhi, half)
            if l1 > nly - k:
                ok = False
            if h1 > h0 and (ny - h0) > nly - k:
                ok = False
            if _pad8(l1 - l0) + _pad8(h1 - h0) > nly:
                ok = False
        if not ok:
            continue
        if supports_cpml_k((nx, nly + 2 * h, nz), bc, cpml, k, dtype):
            return n_b, h
    return None


def _ext_lat(a, n_b: int, nly: int, h: int):
    """Extend dim 1 (lattice y) into the per-block halo layout
    [halo(h) | owned(nly) | halo(h)] x n_b, zero-filled at the global
    edges (the runtime Neumann edge masks keep edge halos inert, the
    same contract as the sharded tier's non-wrapping ppermute)."""
    pads = [(0, 0)] * a.ndim
    pads[1] = (h, h)
    ap = jnp.pad(a, pads)
    return jnp.concatenate(
        [ap[:, i * nly: i * nly + nly + 2 * h] for i in range(n_b)], axis=1
    )


def _col_lat(a, n_b: int, nly: int, h: int):
    """Inverse of _ext_lat: owned columns only."""
    ny_b = nly + 2 * h
    r = a.reshape(a.shape[0], n_b, ny_b, *a.shape[2:])
    return r[:, :, h: h + nly].reshape(a.shape[0], n_b * nly, *a.shape[2:])


def extend_blocked_pml_state(state: PmlKernelState, n_b: int, h: int, *,
                             cpml) -> PmlKernelState:
    """Plain global PmlKernelState -> blocked layout (device-side).
    Halo slots start zero; the first pass refreshes them before any
    owned computation reads them."""
    shape = state.ex.shape
    nly = shape[1] // n_b
    layout = _psi_layout(shape, cpml)
    if len(state.psi) != len(layout):
        raise ValueError(
            "blocked layout covers boundary-CPML psi only (no dense/DFT "
            f"tail); got {len(state.psi)} psi entries for {len(layout)}"
        )
    psi = []
    for entry, g in zip(layout, state.psi):
        axis, plo = entry[1], entry[5][2]
        if axis == 1:
            # strip-index space: lo rows live on block 0, hi rows on the
            # last block, zeros elsewhere (the identity runtime profiles
            # keep them zero — parallel/pallas_sharded_cpml._lat_maps)
            parts = []
            for i in range(n_b):
                lo = g[:, :plo] if i == 0 else jnp.zeros_like(g[:, :plo])
                hi = (g[:, plo:] if i == n_b - 1
                      else jnp.zeros_like(g[:, plo:]))
                parts.append(jnp.concatenate([lo, hi], axis=1))
            psi.append(jnp.concatenate(parts, axis=1))
        else:
            psi.append(_ext_lat(g, n_b, nly, h))
    return state._replace(
        **{f: _ext_lat(getattr(state, f), n_b, nly, h) for f in _FIELDS},
        psi=tuple(psi),
    )


def collapse_blocked_pml_state(state_ext: PmlKernelState, shape, n_b: int,
                               h: int, *, cpml) -> PmlKernelState:
    """Blocked layout -> plain global PmlKernelState (halos dropped)."""
    nly = shape[1] // n_b
    layout = _psi_layout(shape, cpml)
    psi = []
    for entry, t in zip(layout, state_ext.psi):
        axis, plo, phi = entry[1], entry[5][2], entry[5][3]
        if axis == 1:
            p = plo + phi
            r = t.reshape(t.shape[0], n_b, p, *t.shape[2:])
            psi.append(
                jnp.concatenate([r[:, 0, :plo], r[:, n_b - 1, plo:]], axis=1)
            )
        else:
            psi.append(_col_lat(t, n_b, nly, h))
    return state_ext._replace(
        **{f: _col_lat(getattr(state_ext, f), n_b, nly, h)
           for f in _FIELDS},
        psi=tuple(psi),
    )


def blocked_owned_view(state_ext: PmlKernelState, n_b: int,
                       h: int) -> SimState:
    """Device-side global-layout field view of a blocked state (owned
    columns only — static slicing, the probe-sampling analog of
    ShardedSimulation._global_view)."""
    ny_b = state_ext.ex.shape[1] // n_b
    nly = ny_b - 2 * h
    return SimState(
        **{f: _col_lat(getattr(state_ext, f), n_b, nly, h)
           for f in _FIELDS},
        tick=state_ext.tick,
    )


def make_pallas_cpml_blocked_stepk(
    shape: Tuple[int, int, int],
    k_steps: int,
    n_b: int,
    h: int,
    *,
    inv_dx: Tuple[float, float, float],
    dt: float,
    bc: BoundaryConditions = BoundaryConditions(),
    constants: PhysicalConstants = SI,
    cpml,
    tfsf=None,
    max_sources: int = 0,
    with_m: bool = False,
    matid=None,
    n_materials: int = 1,
    dtype=jnp.float32,
    interpret: bool = False,
):
    """Build step(state_blocked, coeffs, sources) advancing ``k_steps``
    absorbing ticks per pass via ``n_b`` sequential lateral blocks with
    ``h``-column halos (see module docstring). The state uses the
    blocked layout (extend_blocked_pml_state); J/M sources, compressed
    materials (``coeffs`` becomes the (K_mat, 4) table), bf16 storage,
    and slab/box TF/SF all ride; DensePml regions and in-kernel
    accumulators do not (callers fall back to the unblocked kernel)."""
    nx, ny, nz = shape
    nly = ny // n_b
    ny_b = nly + 2 * h
    plan = blocked_plan(shape, bc, cpml, k_steps, dtype=dtype,
                        matid=matid is not None,
                        n_b_candidates=(n_b,))
    if plan is None or plan[1] != h:
        raise ValueError(
            f"blocked CPML kernel does not support {shape=} {k_steps=} "
            f"{n_b=} {h=} {cpml=}"
        )
    if with_m and max_sources == 0:
        raise ValueError("with_m requires in-kernel sources (max_sources > 0)")
    if matid is not None and (ny_b % 32 != 0 or n_materials > 256):
        raise ValueError("matid mode needs ny_block % 32 == 0, <= 256 mats")
    k = int(k_steps)
    inv_dx = tuple(float(v) for v in inv_dx)
    constants_key = "si" if constants is SI or constants == SI else "reduced"
    shape_b = (nx, ny_b, nz)
    layout = _psi_layout(shape_b, cpml)
    has_ystrips = any(a == 1 for _, a, *_ in layout)
    has_zstrips = any(a == 2 for _, a, *_ in layout)
    n_mat = n_materials if matid is not None else 1

    aux_coeffs = None
    tfsf_box = None
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
    tf_lo, tf_hi = tuple(tfsf.span) if tfsf is not None else (0, 0)

    # ONE kernel build shared by all blocks: per-block variation enters
    # through the runtime edges row, runtime y-strip profiles, shifted
    # source coordinates, and (box TF/SF) the runtime lateral faces —
    # exactly the operand set the sharded tier compiles on hardware
    call, x_inputs, strip_inputs = _build_call(
        shape_b, inv_dx, cpml, k, tfsf is not None, (0, 0), tfsf_box,
        float(dt), constants_key, interpret, int(max_sources), n_mat,
        x_extra=0, runtime_edges=True, runtime_xprof=False,
        with_m=bool(with_m), dtype_name=jnp.dtype(dtype).name,
        runtime_tfsf=tfsf is not None, y_halo=h,
        runtime_ystrips=has_ystrips,
        runtime_box_lat=tfsf_box is not None,
    )
    n_psi = len(layout)

    ystr = None
    if has_ystrips:
        from ..parallel.pallas_sharded_cpml import _ystrips_sharded

        ystr = {
            half: _ystrips_sharded(ny, nly, h, n_b, half == "e", cpml,
                                   inv_dx, dt, constants)
            for half in ("h", "e")
        }

    mid_blocks = None
    if matid is not None:
        from ..parallel.pallas_sharded_cpml import _ext_clamped

        m_ext = _ext_clamped(np.asarray(matid), n_b, h, 1)
        mid_blocks = [
            jnp.asarray(m_ext[:, i * ny_b: (i + 1) * ny_b])
            for i in range(n_b)
        ]

    # per-block runtime rows (static per block, int32)
    edge_rows = []
    tfp_rows = []
    for i in range(n_b):
        ylo = h if i == 0 else -_BIG
        yhi = nly + h - 1 if i == n_b - 1 else _BIG
        edge_rows.append(jnp.asarray(
            [[0, nx - 1, ylo, yhi, 0, nz - 1]], jnp.int32
        ))
        if tfsf is not None:
            vals = [tf_lo, tf_hi]  # x is not decomposed: global frame
            if tfsf_box is not None:
                vals.append(0)  # extended->global x offset (x uncut)
                (sy0, sy1) = tfsf_box[0]
                off_y = h - i * nly
                vals += [sy0 + off_y, sy1 + off_y]
            tfp_rows.append(jnp.asarray([vals], jnp.int32))

    def _refresh(arr):
        """Halo-column refresh on a dim-1 blocked tensor; returns the
        FOLDED (d0, n_b, ny_b, ...) view for per-block slicing. Global
        edge halos reset to zero every pass (matches the sharded tier's
        non-wrapping ppermute), so garbage never compounds."""
        r = arr.reshape(arr.shape[0], n_b, ny_b, *arr.shape[2:])
        zl = jnp.zeros(r[:, :1, 0:h].shape, r.dtype)
        lo = jnp.concatenate([zl, r[:, :-1, nly: nly + h]], axis=1)
        hi = jnp.concatenate([r[:, 1:, h: 2 * h], zl], axis=1)
        return r.at[:, :, 0:h].set(lo).at[:, :, nly + h:].set(hi)

    def step(state: PmlKernelState, coeffs, sources) -> PmlKernelState:
        if max_sources > 0 and (
            sources is None or sources.num_sources != max_sources
        ):
            raise ValueError(
                f"kernel built for {max_sources} in-kernel sources, got "
                f"{0 if sources is None else sources.num_sources}"
            )
        if len(state.psi) != n_psi:
            raise ValueError(
                f"blocked kernel expects {n_psi} psi entries, got "
                f"{len(state.psi)}"
            )
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

        fields = {f: _refresh(getattr(state, f)) for f in _FIELDS}
        psi = []
        for entry, t in zip(layout, state.psi):
            a = entry[1]
            if a == 1:
                # strip-index space, no halos: fold the per-block dim
                p = entry[5][2] + entry[5][3]
                psi.append(t.reshape(t.shape[0], n_b, p, *t.shape[2:]))
            else:
                psi.append(_refresh(t))

        aux_e, aux_h = state.aux_e, state.aux_h
        tf_rows = None
        if tfsf is not None:
            # tick the 1-D aux grid K times, shared by every block (the
            # sharded tier's outside-shard_map packing: slab pre-gathers
            # the four plane-adjacent scalars, box ships full rows)
            rows = []
            for lvl in range(k):
                t = (state.tick + lvl).astype(jnp.float32) * jnp.float32(dt)
                new_e, new_h = tfsf.aux_step(
                    aux_e, aux_h, aux_coeffs, t, inv_dx[0], jnp.float32
                )
                if tfsf_box is not None:
                    rows.append(aux_e)
                    rows.append(new_h)
                else:
                    rows.append(jnp.stack([aux_e[tf_lo - 1], aux_e[tf_hi]]))
                    rows.append(jnp.stack([new_h[tf_lo], new_h[tf_hi + 1]]))
                aux_e, aux_h = new_e, new_h
            tf_rows = jnp.stack(rows)

        src_rows = None
        if max_sources > 0:
            base_pts = sources.points.astype(jnp.float32)
            rows = []
            m_rows = []
            for lvl in range(k):
                t = (state.tick + lvl).astype(jnp.float32) * jnp.float32(dt)
                j_vals, m_vals = sources.values(t)
                rows.append(j_vals.astype(jnp.float32))
                if with_m:
                    m_rows.append(m_vals.astype(jnp.float32))
            src_rows = rows + m_rows

        outs_per_block = []
        for i in range(n_b):
            args = [row, edge_rows[i]]
            args += x_inputs
            if tfsf is not None:
                args.append(tf_rows)
                args.append(tfp_rows[i])
            if max_sources > 0:
                # y coordinates shift into the block's extended frame,
                # UNCLIPPED: sources within h columns of a block cut
                # also land in the neighbor's halo copy
                pts = base_pts.at[:, 1].add(jnp.float32(h - i * nly))
                args.append(jnp.concatenate([pts] + src_rows, axis=1))
            if has_ystrips:
                z_iter = iter(strip_inputs)
                for half in ("h", "e"):
                    args.append(jnp.asarray(ystr[half][i]))
                    if has_zstrips:
                        args.append(next(z_iter))
            else:
                args += strip_inputs
            if matid is not None:
                args += [mid_blocks[i]] * k
            args += [fields[f][:, i] for f in _FIELDS]
            args += [fields["ey"][:, i], fields["ez"][:, i]]
            args += [p[:, i] for p in psi]
            outs_per_block.append(call(*args))

        def cat(slot):
            return jnp.concatenate(
                [o[slot] for o in outs_per_block], axis=1
            )

        return PmlKernelState(
            ex=cat(0), ey=cat(1), ez=cat(2),
            hx=cat(3), hy=cat(4), hz=cat(5),
            tick=state.tick + k,
            psi=tuple(cat(6 + j) for j in range(n_psi)),
            aux_e=aux_e, aux_h=aux_h,
        )

    return step
