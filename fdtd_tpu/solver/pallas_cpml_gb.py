"""Grid-blocked CPML K-step: lateral blocks INSIDE the Pallas grid.

The outside-blocked tier (pallas_cpml_blocked.py) lifts the VMEM K-cap
at big lateral planes (512^3 f32: K=3 -> K=8) but LOSES on hardware:
its per-pass halo refresh and per-block output concatenation each
materialize a full extended state (~2 extra state copies of HBM
traffic per K-pass — measured 13.1 Gcell/s vs the plain ladder's 18.7
at 512^3 f32). This module moves the lateral blocks INTO the pallas
grid, eliminating both costs:

- grid = (n_b, nx + K - 1) with blocks OUTER: block j sweeps all x
  planes before block j+1 starts, so VMEM holds ONE block's wavefront
  carries ((K-1) levels of (nly + 2h, nz) planes) — the K-cap lifts
  without multiplying scratch.
- State at rest stays the PLAIN GLOBAL layout. Laterally-windowed
  inputs (fields, x-slab psi, z-strip psi) arrive as (left-halo,
  center, right-halo) BlockSpec triples over the global arrays —
  block-granular because h | nly — and outputs write the owned center
  columns only. Every column is owned by exactly one block, so the
  output arrays are complete and the next pass's halo reads pull the
  neighbor's owned columns directly: NO refresh, NO concatenate, NO
  extended layout. Per-pass HBM traffic = (1 + 2h/nly) reads + 1 write
  of the state — the same as the plain kernel up to the halo overlap.
- io-aliasing is OFF by construction: with blocks outer, block j+1
  reads its left-halo columns (owned by block j) at tick 0 AFTER block
  j wrote its tick-K values, so inputs must remain the previous pass's
  buffers (2x field allocation, identical traffic).
- Halo exactness is the sharded tier's argument verbatim
  (parallel/pallas_sharded_cpml.py): halo columns recompute the same
  K-tick evolution their owner computes (sources/TF-SF shift into the
  window frame IN-KERNEL from program_id), lateral stencil garbage from
  the window edge advances 1 column per tick and h >= K keeps it out of
  the owned region, and the y-PML strips end >= K columns inside the
  first/last block's owned region (gb_plan containment) so halo
  recompute never needs strip psi.
- y-strip psi is the ONE layout difference vs the plain state: each
  block writes its own (nx, plo+phi, nz) slice of a per-block
  (nx, n_b*(plo+phi), nz) tensor (identity runtime strip profiles keep
  non-owner slices at zero) — extend_gb_pml_state/collapse_gb_pml_state
  convert at run entry/exit (strips only: a few MB).

Reference correspondence: the same single-GPU absorbing update pass as
cem-solver/src/fdtd/wgpu/update.wgsl:56-129 with the psi recurrence the
reference allocates but never applies (cpu/mod.rs:424-425), tiled
laterally + temporally to fit the TPU memory hierarchy (no reference
analog — its GPU backend streams every field from HBM every tick).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import SI, PhysicalConstants
from .boundary import BoundaryConditions
from .engine import _slab_extents
from .pallas_cpml import PmlKernelState, _pad8, _psi_layout, supports_cpml
from .pallas_cpml_k import _build_call

__all__ = [
    "gb_plan",
    "extend_gb_pml_state",
    "collapse_gb_pml_state",
    "make_pallas_cpml_gb_stepk",
]

_FIELDS = ("ex", "ey", "ez", "hx", "hy", "hz")


def _gb_halo(k: int, nly: int, dtype, matid: bool) -> Optional[int]:
    """Smallest halo h >= k with h | nly and the Mosaic tile alignments:
    h % 8 (f32 windows), h % 16 (bf16 field blocks need (16, 128) tiles),
    (nly + 2h) % 32 in matid mode (uint8 blocks). None if impossible."""
    align = 8
    if jnp.dtype(dtype) == jnp.bfloat16:
        align = 16
    if matid:
        align = 16 if (nly % 32 == 0) else 0
        if align == 0:
            return None
    h = -(-k // align) * align
    if h > nly or nly % h != 0:
        return None
    return h


def gb_plan(shape, bc, cpml, k: int, *, dtype=jnp.float32,
            matid: bool = False,
            n_b_candidates=(2, 4, 8)) -> Optional[Tuple[int, int]]:
    """(n_b, h) for the smallest block count supporting K=k, or None.

    Containment mirrors blocked_plan (pallas_cpml_blocked.py): the
    y-PML strips (with the E-half's inward reach) must end >= k columns
    inside the first/last block's owned region — then halo recompute is
    strip-free and exact — and the padded strip segments must fit one
    block's owned width. The VMEM guard is the plain kernel's formula
    at the block window (nly + 2h, nz)."""
    nx, ny, nz = shape
    if not (2 <= k <= 10) or nx < 2 * k:
        return None
    for n_b in n_b_candidates:
        if n_b < 2 or ny % n_b != 0:
            continue
        nly = ny // n_b
        h = _gb_halo(k, nly, dtype, matid)
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
            # the kernel's strip reassembly places the lo segment at
            # window rows [h, h+plo) and the hi segment at
            # [h+nly-phi, h+nly) — they must not overlap
            if _pad8(l1 - l0) + _pad8(h1 - h0) > nly:
                ok = False
        if not ok:
            continue
        W = nly + 2 * h
        if not supports_cpml((nx, W, nz), bc, cpml, dtype):
            continue
        # VMEM at the window: supports_cpml_k's formula, with a HIGHER
        # cap than the plain kernel's 90 MB calibration — gb windows
        # pipeline fewer resident blocks, and 512^3 f32 K=10 nb=2
        # (estimate 114 MB) compiles and runs on v5e at 22.15 Gcell/s
        # (round 4, the best absorbing number; nb=4's halved window
        # passes the old cap but its 25% halo overhead loses ~10%).
        # Mosaic's vmem_limit (120 MB) remains the hard compile-time
        # gate; the env knob narrows the plan for debugging.
        # CAUTION: 118 MB leaves ~2 MB of headroom, and the estimator is
        # hardware-validated only at the benched shape/dtype/K points —
        # an under-estimate on a new combination surfaces as a Mosaic
        # compile error at first execution, not a quiet plan rejection.
        # bench.py::_selfcheck compiles every kernel variant on the chip
        # and is the required gate after touching gb plans.
        plane_f32 = W * nz * 4
        plane_store = W * nz * jnp.dtype(dtype).itemsize
        vmem = 16 * (k - 1) * plane_f32 + 22 * plane_f32 + 28 * plane_store
        cap_mb = int(os.environ.get("FDTD_GB_VMEM_CAP_MB", "118"))
        if vmem > cap_mb * (1 << 20):
            continue
        return n_b, h
    return None


def extend_gb_pml_state(state: PmlKernelState, n_b: int, *,
                        cpml) -> PmlKernelState:
    """Plain global PmlKernelState -> gb layout. ONLY the y-strip psi
    tensors change ((nx, p, nz) -> per-block (nx, n_b*p, nz): lo rows
    live on block 0's slice, hi rows on the last block's, zeros
    elsewhere); fields and x/z psi stay plain global."""
    layout = _psi_layout(state.ex.shape, cpml)
    if len(state.psi) != len(layout):
        raise ValueError(
            f"gb kernel takes boundary psi only; got {len(state.psi)} "
            f"entries for {len(layout)}"
        )
    psi = []
    for entry, g in zip(layout, state.psi):
        if entry[1] == 1:
            plo = entry[5][2]
            parts = []
            for i in range(n_b):
                lo = g[:, :plo] if i == 0 else jnp.zeros_like(g[:, :plo])
                hi = (g[:, plo:] if i == n_b - 1
                      else jnp.zeros_like(g[:, plo:]))
                parts.append(jnp.concatenate([lo, hi], axis=1))
            psi.append(jnp.concatenate(parts, axis=1))
        else:
            psi.append(g)
    return state._replace(psi=tuple(psi))


def collapse_gb_pml_state(state_gb: PmlKernelState, n_b: int, *,
                          cpml) -> PmlKernelState:
    """Inverse of extend_gb_pml_state (owner slices only)."""
    layout = _psi_layout(state_gb.ex.shape, cpml)
    psi = []
    for entry, t in zip(layout, state_gb.psi):
        if entry[1] == 1:
            plo, phi = entry[5][2], entry[5][3]
            p = plo + phi
            r = t.reshape(t.shape[0], n_b, p, *t.shape[2:])
            psi.append(
                jnp.concatenate([r[:, 0, :plo], r[:, n_b - 1, plo:]],
                                axis=1)
            )
        else:
            psi.append(t)
    return state_gb._replace(psi=tuple(psi))


def make_pallas_cpml_gb_stepk(
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
    """Build step(state_gb, coeffs, sources) advancing ``k_steps``
    absorbing ticks per pass with ``n_b`` lateral blocks inside the
    pallas grid (see module docstring). The state uses the gb layout
    (extend_gb_pml_state — y-strip psi per block, everything else plain
    global). J/M point sources, compressed materials (``coeffs`` is the
    (K_mat, 4) table), bf16 storage, and slab/box TF/SF ride in-kernel;
    DensePml regions and the in-kernel accumulator mechanisms stay on
    the plain/outside-blocked tiers."""
    nx, ny, nz = shape
    nly = ny // n_b
    plan = gb_plan(shape, bc, cpml, k_steps, dtype=dtype,
                   matid=matid is not None, n_b_candidates=(n_b,))
    if plan is None or plan[1] != h:
        raise ValueError(
            f"gb CPML kernel does not support {shape=} {k_steps=} "
            f"{n_b=} {h=} {cpml=}"
        )
    if with_m and max_sources == 0:
        raise ValueError("with_m requires in-kernel sources (max_sources > 0)")
    k = int(k_steps)
    inv_dx = tuple(float(v) for v in inv_dx)
    constants_key = "si" if constants is SI or constants == SI else "reduced"
    layout = _psi_layout(shape, cpml)
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
    tfsf_planes = tuple(tfsf.span) if tfsf is not None else (0, 0)

    call, x_inputs, strip_inputs = _build_call(
        tuple(shape), inv_dx, cpml, k, tfsf is not None, tfsf_planes,
        tfsf_box, float(dt), constants_key, interpret, int(max_sources),
        n_mat, x_extra=0, runtime_edges=False, runtime_xprof=False,
        with_m=bool(with_m), dtype_name=jnp.dtype(dtype).name,
        runtime_tfsf=False, y_halo=h, runtime_ystrips=False,
        blocks=(n_b, nly, h),
    )
    # donation variant for the second half of step2: every output takes
    # a dst operand (input_output_aliases), so the double pass lands in
    # the caller-donated buffers — see step2 below
    call_dst, _, _ = _build_call(
        tuple(shape), inv_dx, cpml, k, tfsf is not None, tfsf_planes,
        tfsf_box, float(dt), constants_key, interpret, int(max_sources),
        n_mat, x_extra=0, runtime_edges=False, runtime_xprof=False,
        with_m=bool(with_m), dtype_name=jnp.dtype(dtype).name,
        runtime_tfsf=False, y_halo=h, runtime_ystrips=False,
        blocks=(n_b, nly, h),
        zone_dst=tuple([True] * (6 + len(_psi_layout(shape, cpml)))),
    )
    n_psi = len(layout)

    # per-block stacked y-strip profiles (identity on non-owner blocks)
    ystr = None
    if has_ystrips:
        from ..parallel.pallas_sharded_cpml import _ystrips_sharded

        ystr = {
            half: jnp.asarray(_ystrips_sharded(
                ny, nly, h, n_b, half == "e", cpml, inv_dx, dt, constants))
            for half in ("h", "e")
        }

    mid_ext = None
    if matid is not None:
        from ..parallel.pallas_sharded_cpml import _ext_clamped

        mid_ext = jnp.asarray(_ext_clamped(np.asarray(matid), n_b, h, 1))

    def _one_pass(state: PmlKernelState, coeffs, sources,
                  dst: Optional[PmlKernelState]) -> PmlKernelState:
        if max_sources > 0 and (
            sources is None or sources.num_sources != max_sources
        ):
            raise ValueError(
                f"kernel built for {max_sources} in-kernel sources, got "
                f"{0 if sources is None else sources.num_sources}"
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
        args = [row]
        args += x_inputs
        aux_e, aux_h = state.aux_e, state.aux_h
        if tfsf is not None:
            # plain-kernel packing: full aux rows in GLOBAL x coordinates
            # (x is not decomposed); box y faces shift per block in-kernel
            rows = []
            for lvl in range(k):
                t = (state.tick + lvl).astype(jnp.float32) * jnp.float32(dt)
                new_e, new_h = tfsf.aux_step(
                    aux_e, aux_h, aux_coeffs, t, inv_dx[0], jnp.float32
                )
                rows.append(aux_e)
                rows.append(new_h)
                aux_e, aux_h = new_e, new_h
            args.append(jnp.stack(rows))
        if max_sources > 0:
            # ABSOLUTE coordinates: the kernel shifts y per block, so a
            # source within h columns of a cut also lands in the
            # neighbor's halo recompute
            n = sources.num_sources
            rows = [sources.points.astype(jnp.float32)]
            m_rows = []
            for lvl in range(k):
                t = (state.tick + lvl).astype(jnp.float32) * jnp.float32(dt)
                j_vals, m_vals = sources.values(t)
                rows.append(j_vals.astype(jnp.float32))
                if with_m:
                    m_rows.append(m_vals.astype(jnp.float32))
            args.append(jnp.concatenate(rows + m_rows, axis=1))
        # strips: stacked y profiles at call time, baked z from the build
        if has_ystrips:
            z_iter = iter(strip_inputs)
            for half in ("h", "e"):
                args.append(ystr[half])
                if has_zstrips:
                    args.append(next(z_iter))
        else:
            args += strip_inputs
        if matid is not None:
            args += [mid_ext] * k
        # laterally-windowed operands repeat per (left, center, right) spec
        for f in _FIELDS:
            args += [getattr(state, f)] * 3
        args += [state.ey] * 3 + [state.ez] * 3
        for entry, t in zip(layout, state.psi):
            args += [t] if entry[1] == 1 else [t] * 3
        if dst is not None:
            for f in _FIELDS:
                args.append(getattr(dst, f))
            args += list(dst.psi)
            outs = call_dst(*args)
        else:
            outs = call(*args)
        psi_new = tuple(outs[6: 6 + n_psi])
        return PmlKernelState(
            ex=outs[0], ey=outs[1], ez=outs[2],
            hx=outs[3], hy=outs[4], hz=outs[5],
            tick=state.tick + k, psi=psi_new,
            aux_e=aux_e, aux_h=aux_h,
        )

    def step(state: PmlKernelState, coeffs, sources) -> PmlKernelState:
        return _one_pass(state, coeffs, sources, None)

    def step2(state: PmlKernelState, coeffs, sources) -> PmlKernelState:
        """Advance 2*k_steps ticks with zero loop-boundary copies:
        pass 1 writes fresh buffers (reused across scan iterations by
        XLA's temp allocator), pass 2 donates the input state's buffers
        (dead once pass 1 has read them) as its outputs, so the step's
        results land physically in the scan's loop-state slots — the
        same mechanism as pallas_cpml_xz.step2, which removed a
        measured ~14 ms/pass hidden state copy at 512^3."""
        mid = _one_pass(state, coeffs, sources, None)
        return _one_pass(mid, coeffs, sources, state)

    step.step2 = step2
    return step
