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


class _DenseShim:
    """supports_cpml_k view of the laterally-widened per-block DensePml
    region (full extended y span, identity coefficients outside the real
    box — the sharded tier's x-span trick applied to y)."""

    def __init__(self, dense, ny_b: int):
        (gx0, gx1), _, (gz0, gz1) = dense.box
        self.box = ((gx0, gx1), (0, ny_b), (gz0, gz1))
        self.box_shape = (gx1 - gx0, ny_b, gz1 - gz0)


def blocked_plan(shape, bc, cpml, k: int, *, dtype=jnp.float32,
                 matid: bool = False, dense=None, dft=None, dft_rows=(),
                 n_b_candidates=(2, 4, 8)) -> Optional[Tuple[int, int]]:
    """(n_b, h) for the smallest block count that supports this config
    at K=k, or None. Mirrors supports_sharded_cpml's y containment: the
    y-PML strips (plus the E-half's inward reach) must end >= k columns
    inside the first/last block's owned region, and the padded strip
    segments must fit inside one block's owned width. ``dense``/``dft``/
    ``dft_rows`` mirror make_pallas_cpml_blocked_stepk's and enter the
    per-block VMEM check (dense widened to the full extended lateral
    span, dft accumulators sized at the block plane)."""
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
        ny_b = nly + 2 * h
        if supports_cpml_k(
            (nx, ny_b, nz), bc, cpml, k, dtype,
            dense=_DenseShim(dense, ny_b) if dense is not None else None,
            dft=dft, dft_rows=tuple(dft_rows),
        ):
            return n_b, h
    return None


def _ext_lat(a, n_b: int, nly: int, h: int, dim: int = 1):
    """Extend ``dim`` (lattice y) into the per-block halo layout
    [halo(h) | owned(nly) | halo(h)] x n_b, zero-filled at the global
    edges (the runtime Neumann edge masks keep edge halos inert, the
    same contract as the sharded tier's non-wrapping ppermute)."""
    pads = [(0, 0)] * a.ndim
    pads[dim] = (h, h)
    ap = jnp.pad(a, pads)
    ix = [slice(None)] * a.ndim
    parts = []
    for i in range(n_b):
        ix[dim] = slice(i * nly, i * nly + nly + 2 * h)
        parts.append(ap[tuple(ix)])
    return jnp.concatenate(parts, axis=dim)


def _col_lat(a, n_b: int, nly: int, h: int, dim: int = 1):
    """Inverse of _ext_lat: owned columns only."""
    ny_b = nly + 2 * h
    s = a.shape
    r = a.reshape(*s[:dim], n_b, ny_b, *s[dim + 1:])
    ix = [slice(None)] * r.ndim
    ix[dim + 1] = slice(h, h + nly)
    return r[tuple(ix)].reshape(*s[:dim], n_b * nly, *s[dim + 1:])


def _tail_len(dense, dft) -> int:
    return (1 if dense is not None else 0) + \
        (len(dft[0]) if dft is not None else 0)


def extend_blocked_pml_state(state: PmlKernelState, n_b: int, h: int, *,
                             cpml, dense=None, dft=None) -> PmlKernelState:
    """Plain global PmlKernelState -> blocked layout (device-side).
    Halo slots start zero; the first pass refreshes them before any
    owned computation reads them. ``dense`` (a DensePml) and ``dft``
    ((planes, freqs)) describe the psi TAIL entries (in that order —
    init_pml_kernel_state's layout): the dense region volume embeds in a
    full-lateral canvas then takes the per-block halo layout on its y
    dim (halo copies are the neighbor's real psi, refreshed each pass);
    DFT accumulators take the same layout but are never refreshed (halo
    accumulations go stale and collapse drops them)."""
    shape = state.ex.shape
    nly = shape[1] // n_b
    layout = _psi_layout(shape, cpml)
    if len(state.psi) != len(layout) + _tail_len(dense, dft):
        raise ValueError(
            f"got {len(state.psi)} psi entries for {len(layout)} boundary "
            f"+ {_tail_len(dense, dft)} tail (dense/DFT)"
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
    it = len(layout)
    if dense is not None:
        # (4, bx+1, by, bz) real-box psi -> full-y canvas -> per-block
        # halo layout on dim 2 (identity cells outside the box freeze
        # psi at zero, so the canvas zeros are exact)
        g = state.psi[it]
        (gy0, gy1) = dense.box[1]
        canvas = jnp.zeros(
            (g.shape[0], g.shape[1], shape[1], g.shape[3]), g.dtype
        ).at[:, :, gy0:gy1].set(g)
        psi.append(_ext_lat(canvas, n_b, nly, h, dim=2))
        it += 1
    if dft is not None:
        for g in state.psi[it:]:
            psi.append(_ext_lat(g, n_b, nly, h, dim=2))
    return state._replace(
        **{f: _ext_lat(getattr(state, f), n_b, nly, h) for f in _FIELDS},
        psi=tuple(psi),
    )


def collapse_blocked_pml_state(state_ext: PmlKernelState, shape, n_b: int,
                               h: int, *, cpml, dense=None,
                               dft=None) -> PmlKernelState:
    """Blocked layout -> plain global PmlKernelState (halos dropped).
    ``dense``/``dft`` as in extend_blocked_pml_state."""
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
    it = len(layout)
    if dense is not None:
        t = _col_lat(state_ext.psi[it], n_b, nly, h, dim=2)
        (gy0, gy1) = dense.box[1]
        psi.append(t[:, :, gy0:gy1])
        it += 1
    if dft is not None:
        for t in state_ext.psi[it:]:
            psi.append(_col_lat(t, n_b, nly, h, dim=2))
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
    flux_faces=(),
    dense=None,
    dft=None,
    dft_rows=(),
):
    """Build step(state_blocked, coeffs, sources) advancing ``k_steps``
    absorbing ticks per pass via ``n_b`` sequential lateral blocks with
    ``h``-column halos (see module docstring). The state uses the
    blocked layout (extend_blocked_pml_state); J/M sources, compressed
    materials (``coeffs`` becomes the (K_mat, 4) table), bf16 storage,
    slab/box TF/SF, DensePml regions, and every in-kernel accumulator
    mechanism all ride.

    ``flux_faces``/``dft``/``dft_rows`` match pallas_cpml_stepk_fn's
    (same descriptors, GLOBAL coordinates, same return order). Lateral
    ("y") descriptor coordinates become per-block RUNTIME values
    (kernel runtime_lat) and every in-kernel reduction is restricted to
    the block's owned window (y_halo masks), so the global value is the
    SUM of the per-block partials — the sharded 2-D tier's psum as a
    plain add. x-plane DFT accumulators span each block's extended
    lateral plane (owned columns exact, halo columns stale — collapse
    drops them); "z" row captures concatenate owned windows.

    ``dense`` (a tile-padded DensePml, GLOBAL coordinates) widens to
    the full extended lateral span per block: identity coefficients
    outside the real box freeze psi at zero, so uniform per-block
    shapes cost only HBM streaming (the sharded tier's runtime
    coefficient-volume trick, parallel/pallas_sharded_cpml.py)."""
    nx, ny, nz = shape
    nly = ny // n_b
    ny_b = nly + 2 * h
    dft_key = None
    if dft is not None:
        dft_planes_n = tuple(
            (int(p), 0) if not isinstance(p, tuple) else
            (int(p[0]), int(p[1]))
            for p in dft[0]
        )
        dft_key = (dft_planes_n, len(dft[1]))
    dft_rows = tuple((str(a), int(v)) for a, v in dft_rows)
    flux_faces = tuple(tuple(fd) for fd in flux_faces)
    plan = blocked_plan(shape, bc, cpml, k_steps, dtype=dtype,
                        matid=matid is not None, dense=dense,
                        dft=dft_key, dft_rows=dft_rows,
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

    # lateral ("y") flux/capture coordinates become per-block runtime
    # values — the sharded 2-D tier's runtime_lat mechanism with blocks
    # playing the role of y-shards
    n_lat_rt = (sum(1 for d in flux_faces if d[0] == "y")
                + sum(1 for d in dft_rows if d[0] == "y"))
    runtime_lat = bool((flux_faces or dft_rows) and n_lat_rt > 0)

    dense_spec = None
    dco_blocks = None
    if dense is not None:
        dense.validate(shape)
        if dense.axis in set(cpml.active_axes()):
            (bq0, bq1) = dense.live[dense.axis]
            lo_t, hi_t = cpml.thickness[dense.axis]
            if bq0 < lo_t or bq1 > shape[dense.axis] - hi_t:
                raise ValueError(
                    "DensePml region overlaps a boundary CPML slab on "
                    f"axis {dense.axis}"
                )
        (gx0, gx1) = dense.box[0]
        (gy0, gy1), (gz0, gz1) = dense.box[1], dense.box[2]
        bz_d = gz1 - gz0
        # per-block region = real x/z box extents (x undecomposed) x the
        # FULL extended lateral span; identity cells pass derivatives
        # through with psi frozen at zero
        dense_spec = (dense.axis, (gx0, gx1), (0, ny_b), (gz0, gz1))
        dco_g = np.stack([np.asarray(c, np.float32)
                          for c in (*dense.coeffs_h, *dense.coeffs_e)])
        ident = np.array([1.0, 0.0, 0.0, 1.0, 0.0, 0.0], np.float32)
        dco_blocks = []
        for i in range(n_b):
            vol = np.broadcast_to(
                ident[:, None, None, None],
                (6, gx1 - gx0, ny_b, bz_d),
            ).copy()
            for gy in range(gy0, gy1):
                # UNCLIPPED into [0, ny_b): halo copies carry the real
                # coefficients so the redundant recompute agrees
                j1 = gy - i * nly + h
                if 0 <= j1 < ny_b:
                    vol[:, :, j1] = dco_g[:, :, gy - gy0]
            dco_blocks.append(jnp.asarray(vol))

    # ONE kernel build shared by all blocks: per-block variation enters
    # through the runtime edges row, runtime y-strip profiles, shifted
    # source coordinates, runtime lateral coordinates, per-block dense
    # coefficient volumes, and (box TF/SF) the runtime lateral faces —
    # exactly the operand set the sharded tier compiles on hardware
    call, x_inputs, strip_inputs = _build_call(
        shape_b, inv_dx, cpml, k, tfsf is not None, (0, 0), tfsf_box,
        float(dt), constants_key, interpret, int(max_sources), n_mat,
        x_extra=0, runtime_edges=True, runtime_xprof=False,
        with_m=bool(with_m), dtype_name=jnp.dtype(dtype).name,
        runtime_tfsf=tfsf is not None, y_halo=h,
        runtime_ystrips=has_ystrips,
        runtime_box_lat=tfsf_box is not None,
        flux_faces=flux_faces, dense_spec=dense_spec, dft_spec=dft_key,
        dft_rows=dft_rows, runtime_lat=runtime_lat,
    )
    n_psi = len(layout)
    n_dft_pl = len(dft[0]) if dft is not None else 0
    n_tail_d = 1 if dense is not None else 0
    if dft is not None:
        import math as _math

        dft_freqs = jnp.asarray(tuple(dft[1]), jnp.float32)
        _two_pi = jnp.float32(2.0 * _math.pi)

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
    lat_rows = []
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
        if runtime_lat:
            # extended-frame "y" coordinates: flux descriptors first,
            # then row captures (the kernel's lat_ref slot order). On
            # non-owning blocks the shifted value lands outside the
            # owned window and the kernel's masks stay empty.
            off_y = h - i * nly
            lvals = [fd[1] + off_y for fd in flux_faces if fd[0] == "y"]
            lvals += [v + off_y for a, v in dft_rows if a == "y"]
            lat_rows.append(jnp.asarray([lvals], jnp.int32))

    def _refresh(arr, dim: int = 1):
        """Halo-column refresh on a blocked tensor's lateral ``dim``;
        returns the FOLDED (..., n_b, ny_b, ...) view for per-block
        slicing. Global edge halos reset to zero every pass (matches the
        sharded tier's non-wrapping ppermute), so garbage never
        compounds."""
        s = arr.shape
        r = arr.reshape(*s[:dim], n_b, ny_b, *s[dim + 1:])

        def ix(bs, cs):
            out = [slice(None)] * r.ndim
            out[dim], out[dim + 1] = bs, cs
            return tuple(out)

        zl = jnp.zeros(r[ix(slice(0, 1), slice(0, h))].shape, r.dtype)
        lo = jnp.concatenate(
            [zl, r[ix(slice(0, n_b - 1), slice(nly, nly + h))]], axis=dim
        )
        hi = jnp.concatenate(
            [r[ix(slice(1, n_b), slice(h, 2 * h))], zl], axis=dim
        )
        return r.at[ix(slice(None), slice(0, h))].set(lo) \
                .at[ix(slice(None), slice(nly + h, None))].set(hi)

    def step(state: PmlKernelState, coeffs, sources) -> PmlKernelState:
        if max_sources > 0 and (
            sources is None or sources.num_sources != max_sources
        ):
            raise ValueError(
                f"kernel built for {max_sources} in-kernel sources, got "
                f"{0 if sources is None else sources.num_sources}"
            )
        if len(state.psi) != n_psi + n_tail_d + n_dft_pl:
            raise ValueError(
                f"blocked kernel expects {n_psi + n_tail_d + n_dft_pl} "
                f"psi entries, got {len(state.psi)}"
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
        dense_psi_f = None
        if dense is not None:
            # region psi halo copies refresh like the fields (its y dim
            # is lattice dim 2 of the (4, bx+1, y, bz) volume)
            dense_psi_f = _refresh(state.psi[n_psi], dim=2)
        dft_acc_f = []
        if dft is not None:
            for t in state.psi[n_psi + n_tail_d:]:
                # accumulators are never refreshed: halo columns go
                # stale, collapse drops them (sharded-tier design)
                s = t.shape
                dft_acc_f.append(t.reshape(s[0], s[1], n_b, ny_b, s[3]))
        dft_phase = None
        if dft is not None:
            ph_rows = []
            for lvl in range(k):
                t = (state.tick + 1 + lvl).astype(jnp.float32) \
                    * jnp.float32(dt)
                ph = -_two_pi * dft_freqs * t
                ph_rows.append(
                    jnp.stack([jnp.cos(ph), jnp.sin(ph)], axis=1)
                    .reshape(-1)
                )
            dft_phase = jnp.stack(ph_rows)  # (K, 2F)

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
            if runtime_lat:
                args.append(lat_rows[i])
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
            if dense is not None:
                args += [dco_blocks[i]] * k
                args.append(dense_psi_f[:, :, i])
            if dft is not None:
                args.append(dft_phase)
                args += [a4[:, :, i] for a4 in dft_acc_f]
            args += [fields[f][:, i] for f in _FIELDS]
            args += [fields["ey"][:, i], fields["ez"][:, i]]
            args += [p[:, i] for p in psi]
            outs_per_block.append(call(*args))

        def cat(slot, axis=1):
            return jnp.concatenate(
                [o[slot] for o in outs_per_block], axis=axis
            )

        psi_new = tuple(cat(6 + j) for j in range(n_psi))
        n_out = 6 + n_psi
        if dense is not None:
            psi_new = psi_new + (cat(n_out, axis=2),)
            n_out += 1
        if dft is not None:
            psi_new = psi_new + tuple(
                cat(n_out + j, axis=2) for j in range(n_dft_pl)
            )
            n_out += n_dft_pl
        new = PmlKernelState(
            ex=cat(0), ey=cat(1), ez=cat(2),
            hx=cat(3), hy=cat(4), hz=cat(5),
            tick=state.tick + k,
            psi=psi_new,
            aux_e=aux_e, aux_h=aux_h,
        )
        res = [new]
        if flux_faces:
            # per-block partials over owned columns (the kernel's y_halo
            # masks) sum to the global reductions — the sharded tier's
            # psum as a plain add across blocks
            n_q = len(flux_faces)
            flux_rows = sum(
                jnp.stack(o[n_out: n_out + k])[:, 1: nx + 1, 0, :n_q]
                for o in outs_per_block
            )
            n_out += k
            res.append(flux_rows)
        if dft_rows:
            # "y" captures: only the owning block fires (runtime_lat +
            # owned mask), others contribute zeros -> sum. "z" captures:
            # concatenate owned lateral windows across blocks.
            y_blocks = []
            for _ in range(sum(1 for d in dft_rows if d[0] == "y")):
                y_blocks.append(sum(
                    jnp.stack(o[n_out: n_out + k])[:, 1: nx + 1, 0:6, :]
                    for o in outs_per_block
                ))
                n_out += k
            z_block = None
            if any(d[0] == "z" for d in dft_rows):
                z_block = jnp.concatenate(
                    [jnp.stack(o[n_out: n_out + k])[:, 1: nx + 1,
                                                    h: h + nly]
                     for o in outs_per_block], axis=2
                )  # (K, nx, ny, 128)
                n_out += k
            caps, yi, zi = [], 0, 0
            for a, _v in dft_rows:
                if a == "y":
                    caps.append(y_blocks[yi]); yi += 1
                else:
                    blk = z_block[:, :, :, 6 * zi: 6 * zi + 6]
                    caps.append(jnp.transpose(blk, (0, 1, 3, 2)))
                    zi += 1
            res.append(tuple(caps))
        if len(res) == 1:
            return new
        return tuple(res)

    return step
