"""K-step temporally-blocked Pallas kernel: K leapfrog ticks per pass.

Wavefront temporal blocking at arbitrary depth K: HBM
traffic is ~(48 + 8 halo)/K bytes per cell per STEP, so throughput scales
nearly linearly in K until the VPU compute (K x the single-step work per
pass) or VMEM carries (6(K-1)+2 planes) bind.

Pipeline at descending sweep iteration p (from nx-1 down to -(K-1)); stage
k (1..K) computes the level-k fields at plane q_k = p + k - 1:

  H^k[q_k] = d_a H^{k-1}[q_k] - d_b curl_b(E^{k-1})[q_k]
  E^k[q_k] = c_a E^{k-1}[q_k] + c_b curl_f(H^k)[q_k]

where for stage 1 the level-0 fields are the kernel inputs (plane p + the
E_y/E_z halo at p-1), and for stage k >= 2 every operand is either computed
this iteration by stage k-1 (plane q_k - 1) or carried in VMEM from the
previous iteration (planes q_k and q_k + 1; the carry registers are read
before they are overwritten). Outputs are the level-K fields, written at
plane p + K - 1 with clamped index maps: the pipeline-fill iterations write
garbage at plane nx-1 that the first full iteration overwrites in grid
order, and the drain iterations (p < 0) finish planes K-2..0.

J point sources for steps 1..K-1 are injected in-kernel with masked selects
(their corrections feed later stages); step K's are applied after the
kernel, which is exact. Uniform scalar coefficients only; equivalence with
K invocations of the single-step kernel is enforced in
tests/test_pallas_step2.py.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .boundary import BoundaryConditions
from .sources import SourceSet
from .state import SimState
from .step import _cells

__all__ = ["pallas_stepk_fn", "supports_k", "build_src_rows"]


def supports_k(shape, bc, k: int, dtype=jnp.float32, n_materials: int = 1) -> bool:
    from .pallas_step import supports

    if not supports(shape, bc, dtype=dtype):
        return False
    if not (2 <= k <= 16):
        return False
    if n_materials > 1 and shape[1] % 32 != 0:
        return False  # uint8 matid planes need (32, 128) tiling
    return shape[0] >= 2 * k


def _kernel(inv_dx, nx, n_src, k_steps, storage_dtype, n_materials, with_m,
            io_alias, *refs):
    if io_alias:
        # aliased build: no separate halo operands (each buffer must appear
        # exactly once or XLA inserts defensive copies, defeating in-place);
        # ey/ez ride in as (2, ny, nz) blocks covering planes (p-1, p)
        n_in = 3 + 6
        (coef_ref, src_ref, edge_ref,
         ex_r, ey_r, ez_r, hx_r, hy_r, hz_r) = refs[:n_in]
        eyl_r = ezl_r = None
    else:
        n_in = 3 + 8  # coef/table, src, edges, 6 fields, 2 halos
        (coef_ref, src_ref, edge_ref,
         ex_r, ey_r, ez_r, hx_r, hy_r, hz_r, eyl_r, ezl_r) = refs[:n_in]
    if n_materials > 1:
        mid_refs = refs[n_in:n_in + k_steps]
        n_in += k_steps
    outs = refs[n_in:n_in + 6]
    scratch = refs[n_in + 6:]
    # carries: per level k = 1..K-1: [ex, ey, ez, hx, hy, hz]; plus final
    # level's [hy_top, hz_top]
    c_lvl = [scratch[6 * i: 6 * i + 6] for i in range(k_steps - 1)]
    c_topy, c_topz = scratch[6 * (k_steps - 1):]

    i = pl.program_id(0)
    p = nx - 1 - i  # nx-1 .. -(K-1)
    inv_x, inv_y, inv_z = inv_dx
    f32 = jnp.float32
    # global-domain edge coordinates (in this array's coordinates), row
    # [x_lo, x_hi, y_lo, y_hi, z_lo, z_hi]; sharded callers move them so
    # halo regions are computed unmasked (lateral sentinels off the grid
    # disable a mask entirely on interior shards)
    lo_edge = edge_ref[0, 0]
    hi_edge = edge_ref[0, 1]
    y_lo = edge_ref[0, 2]
    y_hi = edge_ref[0, 3]
    z_lo = edge_ref[0, 4]
    z_hi = edge_ref[0, 5]

    ny, nz = ex_r.shape[1:]
    iy = jax.lax.broadcasted_iota(jnp.int32, (ny, nz), 0)
    iz = jax.lax.broadcasted_iota(jnp.int32, (ny, nz), 1)
    zero = jnp.zeros((ny, nz), f32)

    def bdiff_y(f):
        return jnp.where(iy == y_lo, 0.0, f - pltpu.roll(f, 1, axis=0))

    def bdiff_z(f):
        return jnp.where(iz == z_lo, 0.0, f - pltpu.roll(f, 1, axis=1))

    def fdiff_y(f):
        return jnp.where(iy == y_hi, 0.0, pltpu.roll(f, ny - 1, axis=0) - f)

    def fdiff_z(f):
        return jnp.where(iz == z_hi, 0.0, pltpu.roll(f, nz - 1, axis=1) - f)

    # previous-iteration carries, read BEFORE the stage loop overwrites them
    prev_e = {}
    prev_h = {}
    for lvl in range(1, k_steps):
        regs = c_lvl[lvl - 1]
        prev_e[lvl] = tuple(regs[c][...] for c in range(3))
        prev_h[lvl] = tuple(regs[3 + c][...] for c in range(3))
    top_y = c_topy[...]
    top_z = c_topz[...]

    new_carries = {}
    out_fields = None
    # stage k consumes the level k-1 fields; stage 1 consumes kernel inputs
    if io_alias:
        # 2-plane ey/ez blocks cover (max(p-1,0), max(p-1,0)+1): at p >= 1
        # the main plane is block[1] and the halo block[0]; at the p == 0
        # iteration the clamped block covers (0, 1), so the main plane is
        # block[0] (the halo read there is edge-masked anyway); drain
        # iterations (p < 0) only feed garbage stages
        ey0 = ey_r[0].astype(f32)
        ey1 = ey_r[1].astype(f32)
        ez0 = ez_r[0].astype(f32)
        ez1 = ez_r[1].astype(f32)
        fresh = p >= 1
        below_e = (
            ex_r[0].astype(f32),
            jnp.where(fresh, ey1, ey0),
            jnp.where(fresh, ez1, ez0),
        )
        halo_ey = ey0
        halo_ez = ez0
    else:
        below_e = (ex_r[0].astype(f32), ey_r[0].astype(f32), ez_r[0].astype(f32))
        halo_ey = eyl_r[0].astype(f32)
        halo_ez = ezl_r[0].astype(f32)
    below_h = (hx_r[0].astype(f32), hy_r[0].astype(f32), hz_r[0].astype(f32))

    for k in range(1, k_steps + 1):
        q = p + k - 1  # plane computed by this stage
        # per-stage coefficients: scalars for uniform media, or selects from
        # the (K_mat, 4) table driven by the stage's uint8 matid plane
        if n_materials > 1:
            mid = mid_refs[k - 1][0].astype(jnp.int32)
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
        else:
            c_a = coef_ref[0, 0]
            c_b = coef_ref[0, 1]
            d_a = coef_ref[0, 2]
            d_b = coef_ref[0, 3]
        if k == 1:
            e_here = below_e
            h_here = below_h
            e_xm = (None, halo_ey, halo_ez)  # E^{0}[p-1] tangentials
        else:
            e_here = prev_e[k - 1]
            h_here = prev_h[k - 1]
            e_xm = (None, below_e[1], below_e[2])  # stage k-1's plane q-1

        # H^k[q]
        at_lo = q <= lo_edge
        dey_x = jnp.where(at_lo, zero, e_here[1] - e_xm[1]) * inv_x
        dez_x = jnp.where(at_lo, zero, e_here[2] - e_xm[2]) * inv_x
        ce_x = bdiff_y(e_here[2]) * inv_y - bdiff_z(e_here[1]) * inv_z
        ce_y = bdiff_z(e_here[0]) * inv_z - dez_x
        ce_z = dey_x - bdiff_y(e_here[0]) * inv_y
        hk = [
            d_a * h_here[0] - d_b * ce_x,
            d_a * h_here[1] - d_b * ce_y,
            d_a * h_here[2] - d_b * ce_z,
        ]

        # M (magnetic-current) injection for EVERY level: the same step's E
        # update consumes curl of the M-corrected H, so M can never be a
        # post-kernel scatter. Row layout: [px, py, pz,
        # J levels 1..K-1 (3 each), M levels 1..K (3 each, only if with_m)].
        # Statically skipped for J-only source sets — each masked select is
        # a full-plane VPU op and they add up across stages.
        for s_i in range(n_src if with_m else 0):
            sp = src_ref[s_i, 0].astype(jnp.int32)
            py_s = src_ref[s_i, 1].astype(jnp.int32)
            pz_s = src_ref[s_i, 2].astype(jnp.int32)
            mask = jnp.logical_and(
                sp == q, jnp.logical_and(iy == py_s, iz == pz_s)
            )
            mbase = 3 + 3 * (k_steps - 1) + 3 * (k - 1)
            hk[0] = jnp.where(mask, hk[0] - d_b * src_ref[s_i, mbase + 0], hk[0])
            hk[1] = jnp.where(mask, hk[1] - d_b * src_ref[s_i, mbase + 1], hk[1])
            hk[2] = jnp.where(mask, hk[2] - d_b * src_ref[s_i, mbase + 2], hk[2])
        hk = tuple(hk)

        # E^k[q]: x-forward needs H^k[q+1] = the pre-overwrite carry of this
        # level (for k < K) or the dedicated top registers (k == K)
        if k < k_steps:
            hy_top, hz_top = prev_h[k][1], prev_h[k][2]
        else:
            hy_top, hz_top = top_y, top_z
        at_hi = q == hi_edge
        dhy_x = jnp.where(at_hi, zero, hy_top - hk[1]) * inv_x
        dhz_x = jnp.where(at_hi, zero, hz_top - hk[2]) * inv_x
        ch_x = fdiff_y(hk[2]) * inv_y - fdiff_z(hk[1]) * inv_z
        ch_y = fdiff_z(hk[0]) * inv_z - dhz_x
        ch_z = dhy_x - fdiff_y(hk[0]) * inv_y
        ek = [
            c_a * e_here[0] + c_b * ch_x,
            c_a * e_here[1] + c_b * ch_y,
            c_a * e_here[2] + c_b * ch_z,
        ]

        # in-kernel J injection for steps 1..K-1 (step K handled outside).
        # src_ref rows: [px, py, pz, j_x, j_y, j_z for each level 1..K-1]
        if k < k_steps:
            for s in range(n_src):
                sp = src_ref[s, 0].astype(jnp.int32)
                py_s = src_ref[s, 1].astype(jnp.int32)
                pz_s = src_ref[s, 2].astype(jnp.int32)
                mask = jnp.logical_and(
                    sp == q, jnp.logical_and(iy == py_s, iz == pz_s)
                )
                base = 3 + 3 * (k - 1)
                ek[0] = jnp.where(mask, ek[0] - c_b * src_ref[s, base + 0], ek[0])
                ek[1] = jnp.where(mask, ek[1] - c_b * src_ref[s, base + 1], ek[1])
                ek[2] = jnp.where(mask, ek[2] - c_b * src_ref[s, base + 2], ek[2])
        ek = tuple(ek)

        if k < k_steps:
            new_carries[k] = (ek, hk)
            below_e = ek
            below_h = hk
        else:
            out_fields = (ek, hk)

    # write outputs (level K at plane p+K-1, clamped in the index map)
    (eK, hK) = out_fields
    for c in range(3):
        outs[c][0] = eK[c].astype(storage_dtype)
        outs[3 + c][0] = hK[c].astype(storage_dtype)

    # update carries
    for lvl in range(1, k_steps):
        regs = c_lvl[lvl - 1]
        ek, hk = new_carries[lvl]
        for c in range(3):
            regs[c][...] = ek[c]
            regs[3 + c][...] = hk[c]
    c_topy[...] = hK[1]
    c_topz[...] = hK[2]


@functools.lru_cache(maxsize=16)
def _build_call(shape, inv_dx, n_src, k_steps, interpret, dtype_name,
                n_materials=1, with_m=False, io_alias=False):
    """``io_alias=True`` aliases the six field inputs onto the outputs
    (in-place update). Race-free with the descending sweep: plane q's
    fields are read at grid iteration nx-1-q and written K-1 iterations
    later, above any in-flight prefetch. Required for 1024^3 bf16 runs
    (two full buffer sets exceed a v5e's HBM); NOT default because
    aliased many-operand custom calls have miscompiled under lax.scan on
    the axon runtime (see pallas_cpml.py notes) — callers should chain
    pass-by-pass and self-check numerics (bench.py does both)."""
    storage_dtype = jnp.dtype(dtype_name)
    nx, ny, nz = shape
    plane = (1, ny, nz)

    def in_idx(i):
        return (jnp.maximum(nx - 1 - i, 0), 0, 0)

    def halo_idx(i):
        return (jnp.maximum(nx - 2 - i, 0), 0, 0)

    def out_idx(i):
        return (jnp.clip(nx - 1 - i + (k_steps - 1), 0, nx - 1), 0, 0)

    in_spec = pl.BlockSpec(plane, in_idx, memory_space=pltpu.VMEM)
    halo_spec = pl.BlockSpec(plane, halo_idx, memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec(plane, out_idx, memory_space=pltpu.VMEM)

    def stage_idx(j):
        # stage j+1 consumes plane p+j = nx-1-i+j, clamped
        return lambda i: (jnp.clip(nx - 1 - i + j, 0, nx - 1), 0, 0)

    mid_specs = [
        pl.BlockSpec(plane, stage_idx(j), memory_space=pltpu.VMEM)
        for j in range(k_steps)
    ]

    f32 = jnp.float32
    plane_bytes = ny * nz * 4
    n_scratch = 6 * (k_steps - 1) + 2
    vmem_limit = min(
        int(plane_bytes * (40 + n_scratch + 10 * k_steps) + (1 << 20)),
        122 * (1 << 20),
    )
    if io_alias:
        if n_materials > 1:
            raise ValueError("io_alias does not support matid mode")
        # ey/ez as 2-plane sliding windows (halo folded in; see _kernel).
        # pl.Element: the index map returns an ELEMENT start, so the window
        # can slide by one plane per iteration (all dims must be Element)
        two_spec = pl.BlockSpec(
            (pl.Element(2), pl.Element(ny), pl.Element(nz)),
            lambda i: (jnp.maximum(nx - 2 - i, 0), 0, 0),
            memory_space=pltpu.VMEM,
        )
        field_specs = [in_spec, two_spec, two_spec, in_spec, in_spec, in_spec]
    else:
        field_specs = [in_spec] * 6 + [halo_spec] * 2
    return pl.pallas_call(
        functools.partial(
            _kernel, inv_dx, nx, n_src, k_steps, storage_dtype, n_materials,
            with_m, io_alias,
        ),
        grid=(nx + k_steps - 1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # coeff table (K_mat, 4)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # sources (n_src, 3+3(K-1))
            pl.BlockSpec(memory_space=pltpu.SMEM),  # edge planes (1, 2) i32
            *field_specs,
            *(mid_specs if n_materials > 1 else []),
        ],
        out_specs=tuple([out_spec] * 6),
        out_shape=tuple(
            jax.ShapeDtypeStruct(shape, storage_dtype) for _ in range(6)
        ),
        scratch_shapes=[pltpu.VMEM((ny, nz), f32) for _ in range(n_scratch)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        input_output_aliases={3 + f: f for f in range(6)} if io_alias else {},
        interpret=interpret,
    )


def build_src_rows(
    sources: Optional[SourceSet],
    tick,
    k_steps: int,
    max_sources: int,
    with_m: bool,
    dt: float,
    x_offset=0,
    y_offset=0,
):
    """Pack the kernel's SMEM source rows:
    [px(+x_offset), py(+y_offset), pz, J levels 1..K-1 (3 each), M levels
    1..K (3 each, only when with_m)]. Padded rows carry a far-negative
    position sentinel and zero amplitudes. Shared by the single-device and
    sharded K-step wrappers so the layout can't drift between them.
    """
    row_width = 3 + 3 * (k_steps - 1) + (3 * k_steps if with_m else 0)
    src_rows = jnp.zeros((max_sources, row_width), jnp.float32)
    src_rows = src_rows.at[:, 0].set(-(2.0**24))  # position sentinel
    if sources is None or sources.num_sources == 0:
        return src_rows
    n = sources.num_sources
    if n > max_sources:
        raise ValueError(f"{n} sources > max_sources={max_sources}")
    src_rows = src_rows.at[:n, 0].set(
        sources.points[:, 0].astype(jnp.float32) + x_offset
    )
    src_rows = src_rows.at[:n, 1].set(
        sources.points[:, 1].astype(jnp.float32) + y_offset
    )
    src_rows = src_rows.at[:n, 2].set(sources.points[:, 2].astype(jnp.float32))
    mbase = 3 + 3 * (k_steps - 1)
    for lvl in range(1, k_steps + 1):
        t = (tick + lvl - 1).astype(jnp.float32) * jnp.float32(dt)
        j, m = sources.values(t)
        if lvl < k_steps:
            src_rows = src_rows.at[:n, 3 + 3 * (lvl - 1): 3 + 3 * lvl].set(
                j.astype(jnp.float32)
            )
        if with_m:
            src_rows = src_rows.at[
                :n, mbase + 3 * (lvl - 1): mbase + 3 * lvl
            ].set(m.astype(jnp.float32))
    return src_rows


def pallas_stepk_fn(
    shape: Tuple[int, int, int],
    k_steps: int,
    *,
    inv_dx: Tuple[float, float, float],
    dt: float,
    bc: BoundaryConditions = BoundaryConditions(),
    max_sources: int = 8,
    interpret: bool = False,
    dtype=jnp.float32,
    matid=None,
    n_materials: int = 1,
    edge_planes=None,
    with_m: bool = False,
    io_alias: bool = False,
):
    """Build stepk(state, coeffs, sources) advancing ``k_steps`` ticks.

    Uniform media: ``coeffs`` = CellCoefficients of scalars. Compressed
    multi-material: pass ``matid`` (uint8 (nx, ny, nz)) and ``n_materials``;
    ``coeffs`` then is the (K_mat, 4) coefficient table array.

    ``edge_planes`` (lo, hi) moves the global Neumann-edge planes — used by
    the sharded wrapper whose array carries halo regions; defaults to
    (0, nx-1). Planes outside [lo, hi] compute unmasked (their output is
    halo-region garbage by construction).
    """
    n_mat = n_materials if matid is not None else 1
    if not supports_k(shape, bc, k_steps, dtype=dtype, n_materials=n_mat):
        raise ValueError(
            f"{k_steps}-step kernel does not support {shape=} {bc=} {dtype=}"
        )
    inv_dx = tuple(float(v) for v in inv_dx)
    call = _build_call(
        tuple(shape), inv_dx, max_sources, k_steps, interpret,
        jnp.dtype(dtype).name, n_mat, with_m, io_alias,
    )
    ep = tuple(edge_planes) if edge_planes is not None else (0, shape[0] - 1)
    if len(ep) == 2:  # x pair only: lateral edges at the array bounds
        ep = ep + (0, shape[1] - 1, 0, shape[2] - 1)
    edges_arr = jnp.asarray([list(ep)], jnp.int32)

    def stepk(state: SimState, coeffs, sources: Optional[SourceSet]) -> SimState:
        if matid is not None:
            row = jnp.asarray(coeffs, jnp.float32)  # (K_mat, 4) table
            cb_of = lambda px, py, pz, n, dt_: jnp.take(
                row[:, 1], matid[px, py, pz].astype(jnp.int32)
            )
        else:
            row = jnp.stack(
                [
                    jnp.asarray(coeffs.c_a, jnp.float32),
                    jnp.asarray(coeffs.c_b, jnp.float32),
                    jnp.asarray(coeffs.d_a, jnp.float32),
                    jnp.asarray(coeffs.d_b, jnp.float32),
                ]
            ).reshape(1, 4)
            cb_of = None

        dtype_ = state.ex.dtype
        src_rows = build_src_rows(
            sources, state.tick, k_steps, max_sources, with_m, dt
        )

        extra = []
        if matid is not None:
            extra = [matid] * k_steps  # per-stage plane windows via index maps
        halos = () if io_alias else (state.ey, state.ez)
        outs = call(
            row, src_rows, edges_arr,
            state.ex, state.ey, state.ez, state.hx, state.hy, state.hz,
            *halos,
            *extra,
        )
        e = list(outs[0:3])
        h = outs[3:6]

        if sources is not None and sources.num_sources > 0:
            t = (state.tick + k_steps - 1).astype(jnp.float32) * jnp.float32(dt)
            j, _ = sources.values(t)
            px, py, pz = (
                sources.points[:, 0],
                sources.points[:, 1],
                sources.points[:, 2],
            )
            if matid is not None:
                cb = cb_of(px, py, pz, sources.num_sources, dtype_).astype(dtype_)
            else:
                cb = _cells(coeffs.c_b, px, py, pz, sources.num_sources, dtype_)
            e = [
                e[c].at[px, py, pz].add(
                    -(cb * j[:, c]).astype(dtype_), mode="drop"
                )
                for c in range(3)
            ]

        return SimState(
            ex=e[0], ey=e[1], ez=e[2], hx=h[0], hy=h[1], hz=h[2],
            tick=state.tick + k_steps,
        )

    return stepk
