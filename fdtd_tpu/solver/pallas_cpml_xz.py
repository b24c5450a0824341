"""x-ZONED grid-blocked CPML K-step: slab-end zones run the full CPML
kernel, the interior runs a kernel with NO x-psi terms at all.

Motivation (measured, round-5 profiling on v5e at 512^3 f32 gb K=10):
the x-slab psi stretch costs ~35% of the absorbing kernel's runtime
(22.1 -> 32.7 Gcell/s with it surgically disabled) even though its
profiles are identically zero outside the ~10-plane PML slabs at each
x end — Mosaic PREDICATES vector selects, so per-plane `jnp.where`
gating cannot skip the work (CLAUDE.md invariant). The only way to not
pay for zero-psi planes is to not compile the terms into the kernel
that visits them. This module splits each K-pass into up to three
chained pallas calls over x-plane zones:

- lo   = [0, c0):  full-cpml kernel (x-lo psi live here)
- mid  = [c0, c1): kernel built with x thickness (0, 0) — no x-psi
                   layout entries, carries, or per-plane recurrence;
                   y/z strip psi unchanged (strips span every x plane)
- hi   = [c1, nx): full-cpml kernel

Correctness is the sharded tier's halo-recompute argument applied along
x on one chip (parallel/pallas_sharded_cpml.py): every call reads the
INTACT previous-pass buffers (fill reads reach K-1 planes past the
zone, drain recomputes K-1 planes below it — exact because sources,
TF/SF, edge masks and strip psi are all indexed by the GLOBAL plane
coordinate q), and the cuts sit >= K-1 planes clear of the x slabs
(c0 >= xlo + K - 1, c1 <= nx - xhi - K) so the mid kernel's recomputed
planes never carry live x-psi. Output assembly costs nothing: the
calls chain through `input_output_aliases` (mid writes fresh buffers,
lo and hi donate them forward and fill in their owned planes), so each
plane of each output tensor is written exactly once and never copied.
x-psi tensors are written only by their end's call; the other full-cpml
call touches only the zero trash block (the stage-K write gate keeps
the trash == 0 invariant, pallas_cpml_k.py stretch()).

All three calls stay gb-composed (lateral blocks inside the grid,
pallas_cpml_gb.py) and share its state layout, so the tier is a drop-in
upgrade of the gb dispatch slot.

Reference correspondence: the same single-GPU absorbing update pass as
cem-solver/src/fdtd/wgpu/update.wgsl:56-129 with the psi recurrence the
reference allocates but never applies (cpu/mod.rs:424-425); the zoning
has no reference analog — it exists because TPU predication makes
"where(in_slab, ...)" cost the same as unconditional work, where the
reference's SIMT GPU pays per-thread.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..constants import SI, PhysicalConstants
from .boundary import BoundaryConditions
from .pallas_cpml import PmlKernelState, _psi_layout
from .pallas_cpml_gb import gb_plan
from .pallas_cpml_k import _build_call

__all__ = ["XzPlan", "xz_plan", "make_pallas_cpml_xz_stepk"]

_FIELDS = ("ex", "ey", "ez", "hx", "hy", "hz")


class XzPlan(NamedTuple):
    c0: int    # lo-zone end (0 = no lo call: x-lo thickness is 0)
    c1: int    # hi-zone start (nx = no hi call)
    n_b: int   # gb lateral block count (shared by all zone calls)
    h: int     # gb halo columns


def xz_plan(shape, bc, cpml, k: int, *, dtype=jnp.float32,
            matid: bool = False, oblique=None,
            n_b_candidates=(2, 4, 8)) -> Optional[XzPlan]:
    """Zone cuts + gb plan for the x-zoned tier, or None.

    Cut constraints (exactness of the mid kernel's halo recompute):
    the mid call computes planes [c0-K+1, c1+K-2] and its kernel has no
    x-psi terms, so every computed plane must have zero x profiles —
    integer-sampled lo profiles live on [0, xlo) and half-sampled hi
    profiles reach down to nx-xhi-1 (cpml._axis_profiles), giving
    c0 >= xlo + K - 1 and c1 <= nx - xhi - K. The gb plan (lateral
    blocks, strip containment, VMEM at the window) is the full kernel's
    and bounds all three calls (the mid kernel is strictly smaller).

    With ``oblique`` (an ObliqueTfsf), only the MID call hosts the
    analytic-correction volumes: the commutator subgrid's x extent must
    clear both cuts by K planes (the lo call computes planes up to
    c0+K-1 and the hi call down to c1-K+1 without the correction
    operands), and the pre-placed per-block stack must stay modest."""
    nx = shape[0]
    xlo, xhi = cpml.thickness[0]
    if xlo == 0 and xhi == 0:
        return None
    if not (2 <= k <= 10):
        return None
    c0 = xlo + k - 1 if xlo > 0 else 0
    c1 = nx - xhi - k if xhi > 0 else nx
    if c1 - c0 < k:
        return None
    plan = gb_plan(shape, bc, cpml, k, dtype=dtype, matid=matid,
                   n_b_candidates=n_b_candidates)
    if plan is None:
        return None
    n_b, h = plan
    if oblique is not None:
        (ox0, ox1), _, (oz0, oz1) = oblique.box
        # commutator subgrid = [box0-2, box1+3) (build_oblique); the lo
        # call computes planes up to c0+K-1 and the hi call down to
        # c1-K+1 WITHOUT the correction operands, so the subgrid must
        # clear both
        if ox0 - 2 < c0 + k or ox1 + 3 > c1 - k + 1:
            return None
        # pre-placed stack cost guard: n_b*K*6*(xl)*(W)*(bz) f32 reads
        # per pass; keep it under ~2% of a pass's state traffic
        xl = (ox1 + 3) - (ox0 - 2)
        wv = shape[1] // n_b + 2 * h
        bz = (oz1 + 3) - (oz0 - 2)
        if n_b * k * 6 * xl * wv * bz * 4 > 512 * (1 << 20):
            return None
    return XzPlan(c0, c1, n_b, h)


def _entry_key(entry):
    half, axis, comp, end, *_ = entry
    return (half, axis, comp, end)


def make_pallas_cpml_xz_stepk(
    shape: Tuple[int, int, int],
    k_steps: int,
    plan: XzPlan,
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
    oblique=None,
):
    """Build step(state_gb, coeffs, sources) advancing ``k_steps``
    absorbing ticks per pass via chained x-zone calls (module
    docstring). State uses the gb layout (extend_gb_pml_state). With
    ``oblique`` (solver.tfsf_oblique.ObliqueTfsf), the MID call hosts
    the analytic-correction volumes: the per-pass stack is pre-placed
    at full window height per lateral block (zeros outside the box's
    rows in each window), which keeps the in-kernel patch placement
    static — the reason the gb tier alone could not host oblique."""
    nx, ny, nz = shape
    c0, c1, n_b, h = plan
    nly = ny // n_b
    check = xz_plan(shape, bc, cpml, k_steps, dtype=dtype,
                    matid=matid is not None, oblique=oblique,
                    n_b_candidates=(n_b,))
    if check is None or check != plan:
        raise ValueError(
            f"xz CPML kernel does not support {shape=} {k_steps=} "
            f"{plan=} {cpml=} {oblique=}"
        )
    if oblique is not None and tfsf is not None:
        raise ValueError("oblique and tfsf are mutually exclusive")
    if with_m and max_sources == 0:
        raise ValueError("with_m requires in-kernel sources (max_sources > 0)")
    k = int(k_steps)
    inv_dx = tuple(float(v) for v in inv_dx)
    constants_key = "si" if constants is SI or constants == SI else "reduced"
    xlo, xhi = cpml.thickness[0]
    cpml_mid = dataclasses.replace(
        cpml, thickness=((0, 0),) + tuple(cpml.thickness[1:]))
    layout_full = _psi_layout(shape, cpml)
    layout_mid = _psi_layout(shape, cpml_mid)
    keys_full = [_entry_key(e) for e in layout_full]
    keys_mid = [_entry_key(e) for e in layout_mid]
    # strip entries must be a common subset in both layouts (the psi
    # chain relies on identical tensor shapes per key)
    assert set(keys_mid) <= set(keys_full)
    has_ystrips = any(a == 1 for _, a, *_ in layout_full)
    has_zstrips = any(a == 2 for _, a, *_ in layout_full)
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

    oblique_win = None
    ob_corr_h = ob_corr_e = None
    ob_place = None
    if oblique is not None:
        from .tfsf_oblique import build_oblique

        ob_sub, ob_corr_h, ob_corr_e = build_oblique(
            oblique, shape, inv_dx, dt, constants, jnp.float32
        )
        oblique_win = (
            ob_sub[0].start, ob_sub[0].stop - ob_sub[0].start,
            ob_sub[1].start, ob_sub[1].stop - ob_sub[1].start,
            ob_sub[2].start, ob_sub[2].stop - ob_sub[2].start,
        )
        oby0_g = ob_sub[1].start
        obby_g = ob_sub[1].stop - ob_sub[1].start
        W = nly + 2 * h

        def ob_place(stack):
            """(K, 6, xl, by, bz) global stack -> (n_b*K, 6, xl, W, bz)
            pre-placed per lateral block: each block's slice holds the
            correction rows shifted into its window frame (global row
            oby0_g+r lands at window row oby0_g+r - (jb*nly - h)),
            zeros elsewhere — halo copies of a row get the same
            correction their owner applies, so halo recompute stays
            exact."""
            parts = []
            for jb in range(n_b):
                w0 = jb * nly - h
                lo_w = max(oby0_g - w0, 0)
                hi_w = min(oby0_g + obby_g - w0, W)
                blk = jnp.zeros(stack.shape[:3] + (W, stack.shape[4]),
                                jnp.float32)
                if lo_w < hi_w:
                    src = stack[
                        :, :, :,
                        lo_w + w0 - oby0_g: hi_w + w0 - oby0_g]
                    blk = blk.at[:, :, :, lo_w:hi_w].set(src)
                parts.append(blk)
            return jnp.concatenate(parts, axis=0)

    # chain order: mid first (fresh outputs), then the slab-end calls
    # donate and fill. dst flags per out: True iff an earlier call in
    # the chain already produced that tensor.
    zones = [("mid", (c0, c1), cpml_mid, layout_mid, keys_mid)]
    if xlo > 0:
        zones.append(("lo", (0, c0), cpml, layout_full, keys_full))
    if xhi > 0:
        zones.append(("hi", (c1, nx), cpml, layout_full, keys_full))

    import os as _os

    from .pallas_cpml_k import _PROF_DISABLE

    only = _os.environ.get("FDTD_XZ_ONLY", "")
    if only:  # timing-only: build a single zone call (physically wrong)
        zones = [z for z in zones if z[0] == only]

    def _build_chain(all_dst: bool):
        """One chain of zone calls. ``all_dst=False``: the first producer
        of each tensor writes a FRESH buffer (pass-1 chain). ``True``:
        every output chains through a donated destination, so the whole
        pass lands in caller-supplied buffers (pass-2 of the donation-
        threaded double step — see step2 below)."""
        chain = []
        produced = set()
        for name, zone, cp, lay, keys in zones:
            out_keys = list(_FIELDS) + keys
            dst_mask = tuple(all_dst or kk in produced for kk in out_keys)
            if "xzchain" in _PROF_DISABLE:  # timing-only, see _PROF_DISABLE
                # drops the dst chain: out-of-zone planes become garbage
                # (physically wrong) — isolates the chain's cost
                dst_mask = tuple(False for _ in out_keys)
            call, x_inputs, strip_inputs = _build_call(
                tuple(shape), inv_dx, cp, k, tfsf is not None, tfsf_planes,
                tfsf_box, float(dt), constants_key, interpret,
                int(max_sources), n_mat, x_extra=0, runtime_edges=False,
                runtime_xprof=False, with_m=bool(with_m),
                dtype_name=jnp.dtype(dtype).name, runtime_tfsf=False,
                y_halo=h, runtime_ystrips=False, blocks=(n_b, nly, h),
                x_zone=zone, zone_dst=dst_mask,
                # only the MID call hosts the oblique correction: the
                # xz_plan margins keep the commutator subgrid K planes
                # clear of both cuts, so the slab-end calls never
                # compute a corrected plane
                oblique_win=oblique_win if name == "mid" else None,
            )
            chain.append((name, call, x_inputs, strip_inputs, lay, keys,
                          dst_mask))
            produced.update(out_keys)
        assert only or produced >= set(keys_full)
        return chain

    calls = _build_chain(False)

    # per-block stacked y-strip profiles (identity on non-owner blocks)
    # — y/z thickness is identical in cpml and cpml_mid, so one shared
    # set serves every call
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

    def _coeff_row(coeffs):
        if matid is not None:
            return jnp.asarray(coeffs, jnp.float32)  # (K_mat, 4) table
        return jnp.stack(
            [
                jnp.asarray(coeffs.c_a, jnp.float32),
                jnp.asarray(coeffs.c_b, jnp.float32),
                jnp.asarray(coeffs.d_a, jnp.float32),
                jnp.asarray(coeffs.d_b, jnp.float32),
            ]
        ).reshape(1, 4)

    def _pass_operands(tick, aux_e, aux_h, sources):
        """Per-pass aux/source rows (gb packing, pallas_cpml_gb.step)
        plus the pre-placed per-pass oblique stack."""
        ob_stack = None
        if oblique is not None:
            rows = []
            for lvl in range(k):
                t = (tick + lvl).astype(jnp.float32) * jnp.float32(dt)
                ch = ob_corr_h(t)
                ce = ob_corr_e(t + jnp.float32(0.5 * dt))
                rows.append(jnp.stack(list(ch) + list(ce)))
            ob_stack = ob_place(jnp.stack(rows))
        tfsf_rows = None
        if tfsf is not None:
            rows = []
            ae, ah = aux_e, aux_h
            for lvl in range(k):
                t = (tick + lvl).astype(jnp.float32) * jnp.float32(dt)
                new_e, new_h = tfsf.aux_step(
                    ae, ah, aux_coeffs, t, inv_dx[0], jnp.float32
                )
                rows.append(ae)
                rows.append(new_h)
                ae, ah = new_e, new_h
            tfsf_rows = jnp.stack(rows)
            aux_e, aux_h = ae, ah
        src_rows = None
        if max_sources > 0:
            rows = [sources.points.astype(jnp.float32)]
            m_rows = []
            for lvl in range(k):
                t = (tick + lvl).astype(jnp.float32) * jnp.float32(dt)
                j_vals, m_vals = sources.values(t)
                rows.append(j_vals.astype(jnp.float32))
                if with_m:
                    m_rows.append(m_vals.astype(jnp.float32))
            src_rows = jnp.concatenate(rows + m_rows, axis=1)
        return tfsf_rows, src_rows, ob_stack, aux_e, aux_h

    def _run_chain(chain, src, cur, row, tfsf_rows, src_rows, ob_stack):
        """One K-pass: `src` maps field/psi keys to the INTACT
        previous-pass tensors every call reads; `cur` holds the chain
        destinations (donated buffers for flagged outs) and collects
        the outputs."""
        for name, call, x_inputs, strip_inputs, lay, keys, dst_mask \
                in chain:
            args = [row]
            args += x_inputs
            if tfsf is not None:
                args.append(tfsf_rows)
            if max_sources > 0:
                args.append(src_rows)
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
            if oblique is not None and name == "mid":
                args += [ob_stack] * k
            for f in _FIELDS:
                args += [src[f]] * 3
            args += [src["ey"]] * 3 + [src["ez"]] * 3
            for entry, kk in zip(lay, keys):
                t = src[kk]
                args += [t] if entry[1] == 1 else [t] * 3
            # chain destinations, in out order, for flagged outs
            out_keys = list(_FIELDS) + keys
            for kk, flag in zip(out_keys, dst_mask):
                if flag:
                    args.append(cur[kk])
            outs = call(*args)
            for kk, o in zip(out_keys, outs):
                cur[kk] = o
        return cur

    def _check_sources(sources):
        if max_sources > 0 and (
            sources is None or sources.num_sources != max_sources
        ):
            raise ValueError(
                f"kernel built for {max_sources} in-kernel sources, got "
                f"{0 if sources is None else sources.num_sources}"
            )

    def _src_of(state: PmlKernelState):
        src = {f: getattr(state, f) for f in _FIELDS}
        src.update(zip(keys_full, state.psi))
        return src

    def step(state: PmlKernelState, coeffs, sources) -> PmlKernelState:
        _check_sources(sources)
        row = _coeff_row(coeffs)
        tfsf_rows, src_rows, ob_stack, aux_e, aux_h = _pass_operands(
            state.tick, state.aux_e, state.aux_h, sources)
        # seed = pass-through only under the timing-only FDTD_XZ_ONLY
        # knob; every key is overwritten by the full chain
        cur = _run_chain(calls, _src_of(state), _src_of(state), row,
                         tfsf_rows, src_rows, ob_stack)
        return PmlKernelState(
            ex=cur["ex"], ey=cur["ey"], ez=cur["ez"],
            hx=cur["hx"], hy=cur["hy"], hz=cur["hz"],
            tick=state.tick + k,
            psi=tuple(cur[kk] for kk in keys_full),
            aux_e=aux_e, aux_h=aux_h,
        )

    # Donation-threaded DOUBLE pass. Motivation (measured, round 5):
    # inside lax.scan the loop-state buffers are fixed, and a blocks-
    # mode pallas call cannot alias its state inputs to its outputs
    # (halo re-reads), so XLA copies the pass outputs back into the
    # loop slots EVERY pass — ~14 ms at 512^3 f32 (a full state
    # read+write), measured via single-zone isolation: full chain
    # 39.1 ms/pass of which the kernels account for ~27. Running TWO
    # passes per step removes the copy: pass 1 chains into fresh
    # buffers (reused across iterations by XLA's temp allocator), and
    # pass 2 seeds its destination chain with the INPUT STATE's buffers
    # (dead once pass 1 has read them), so the step's results land
    # physically in the loop-state slots — no rotation, no copy.
    chain2 = None if only else _build_chain(True)

    def step2(state: PmlKernelState, coeffs, sources) -> PmlKernelState:
        """Advance 2*k_steps ticks with zero loop-boundary copies."""
        _check_sources(sources)
        row = _coeff_row(coeffs)
        t_rows1, s_rows1, ob1, aux_e, aux_h = _pass_operands(
            state.tick, state.aux_e, state.aux_h, sources)
        src1 = _src_of(state)
        mid1 = _run_chain(calls, src1, dict(src1), row, t_rows1, s_rows1,
                          ob1)
        t_rows2, s_rows2, ob2, aux_e, aux_h = _pass_operands(
            state.tick + k, aux_e, aux_h, sources)
        # pass 2: destinations seeded with the (now-dead) input state's
        # buffers; _run_chain overwrites cur as the chain progresses
        cur = _run_chain(chain2, mid1, _src_of(state), row,
                         t_rows2, s_rows2, ob2)
        return PmlKernelState(
            ex=cur["ex"], ey=cur["ey"], ez=cur["ez"],
            hx=cur["hx"], hy=cur["hy"], hz=cur["hz"],
            tick=state.tick + 2 * k,
            psi=tuple(cur[kk] for kk in keys_full),
            aux_e=aux_e, aux_h=aux_h,
        )

    step.step2 = None if only else step2
    return step
