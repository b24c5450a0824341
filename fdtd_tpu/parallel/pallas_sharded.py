"""Fused Pallas kernel under shard_map: single-kernel-per-tick multi-chip FDTD.

BASELINE config 5's compute path: the lattice is 1-D decomposed along x over
the device mesh; each tick is ONE fused Pallas kernel per chip plus one
neighbor exchange of 7 boundary planes over ICI:

- from the x-lower neighbor: E_y, E_z last planes (backward-diff halo at
  local plane 0);
- from the x-upper neighbor: E_x, E_y, E_z and H_y, H_z first planes.

The upper-neighbor planes exist because of the fused kernel's data hazard:
E at the local top plane needs the SAME-STEP H_next at plane nl (owned by
the neighbor). Instead of a mid-kernel synchronization, each chip
REDUNTANTLY recomputes H_next at plane nl from the received E/H planes — a
"seed" grid iteration that initializes the descending sweep's VMEM carry.
One plane of duplicated compute per boundary buys a tick with a single
collective phase, which is what keeps the step ICI-latency-bound instead of
round-trip-bound.

Restrictions match the single-chip kernel (supports() in
solver/pallas_step.py): f32, Neumann(0) boundaries, z % 128 == 0, J-only
sources; 2-D/3-D decompositions and other cases fall back to the XLA
sharded step (parallel/sharded.py).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import Mesh, PartitionSpec as P

from ..solver.boundary import BoundaryConditions
from ..solver.sources import SourceSet
from ..solver.state import SimState
from ..solver.step import _cells
from .sharded import _local_points

__all__ = ["make_pallas_sharded_step"]


def _kernel(inv_dx, nl, *refs):
    (coef_ref, flags_ref,
     ex_r, ey_r, ez_r, hx_r, hy_r, hz_r,      # main blocks at plane min(p, nl-1)
     eyl_r, ezl_r,                            # local planes at max(p-1, 0)
     lo_ey, lo_ez,                            # neighbor planes at x = -1
     hi_ex, hi_ey, hi_ez, hi_hy, hi_hz,       # neighbor planes at x = nl
     exo, eyo, ezo, hxo, hyo, hzo,
     s_hy, s_hz) = refs

    i = pl.program_id(0)
    p = nl - i  # descending: nl (seed), nl-1, ..., 0
    inv_x, inv_y, inv_z = inv_dx
    is_first = flags_ref[0, 0] == 1
    is_last = flags_ref[0, 1] == 1

    c_a = coef_ref[0, 0]
    c_b = coef_ref[0, 1]
    d_a = coef_ref[0, 2]
    d_b = coef_ref[0, 3]

    seed = p == nl
    # field planes at p: from halo inputs on the seed iteration
    ex = jnp.where(seed, hi_ex[0], ex_r[0])
    ey = jnp.where(seed, hi_ey[0], ey_r[0])
    ez = jnp.where(seed, hi_ez[0], ez_r[0])
    hx = hx_r[0]
    hy = jnp.where(seed, hi_hy[0], hy_r[0])
    hz = jnp.where(seed, hi_hz[0], hz_r[0])
    ny, nz = ex.shape

    hy_top = s_hy[...]
    hz_top = s_hz[...]

    iy = jax.lax.broadcasted_iota(jnp.int32, (ny, nz), 0)
    iz = jax.lax.broadcasted_iota(jnp.int32, (ny, nz), 1)
    at_x_lo = jnp.logical_and(is_first, p == 0)
    at_x_hi = jnp.logical_and(is_last, p == nl - 1)

    def bdiff_y(f):
        return jnp.where(iy == 0, 0.0, f - pltpu.roll(f, 1, axis=0))

    def bdiff_z(f):
        return jnp.where(iz == 0, 0.0, f - pltpu.roll(f, 1, axis=1))

    def fdiff_y(f):
        return jnp.where(iy == ny - 1, 0.0, pltpu.roll(f, ny - 1, axis=0) - f)

    def fdiff_z(f):
        return jnp.where(iz == nz - 1, 0.0, pltpu.roll(f, nz - 1, axis=1) - f)

    # backward-diff x-halo planes of E: the lower NEIGHBOR plane at p == 0,
    # the local plane p-1 otherwise (the shifted eyl/ezl inputs)
    prev_ey = jnp.where(p == 0, lo_ey[0], eyl_r[0])
    prev_ez = jnp.where(p == 0, lo_ez[0], ezl_r[0])

    zero = jnp.zeros_like(ex)
    dey_x = jnp.where(at_x_lo, zero, ey - prev_ey) * inv_x
    dez_x = jnp.where(at_x_lo, zero, ez - prev_ez) * inv_x
    ce_x = bdiff_y(ez) * inv_y - bdiff_z(ey) * inv_z
    ce_y = bdiff_z(ex) * inv_z - dez_x
    ce_z = dey_x - bdiff_y(ex) * inv_y

    hn_x = d_a * hx - d_b * ce_x
    hn_y = d_a * hy - d_b * ce_y
    hn_z = d_a * hz - d_b * ce_z

    dhy_x = jnp.where(at_x_hi, zero, hy_top - hn_y) * inv_x
    dhz_x = jnp.where(at_x_hi, zero, hz_top - hn_z) * inv_x
    ch_x = fdiff_y(hn_z) * inv_y - fdiff_z(hn_y) * inv_z
    ch_y = fdiff_z(hn_x) * inv_z - dhz_x
    ch_z = dhy_x - fdiff_y(hn_x) * inv_y

    # on the seed iteration these write plane nl-1 with garbage; the next
    # iteration (p == nl-1) overwrites it in grid order
    exo[0] = c_a * ex + c_b * ch_x
    eyo[0] = c_a * ey + c_b * ch_y
    ezo[0] = c_a * ez + c_b * ch_z
    hxo[0] = jnp.where(seed, hx_r[0], hn_x)
    hyo[0] = jnp.where(seed, hy_r[0], hn_y)
    hzo[0] = jnp.where(seed, hz_r[0], hn_z)

    s_hy[...] = hn_y
    s_hz[...] = hn_z


@functools.lru_cache(maxsize=16)
def _build_call(local_shape, inv_dx, interpret):
    nl, ny, nz = local_shape
    plane = (1, ny, nz)

    def main_idx(i):
        return (jnp.minimum(nl - i, nl - 1), 0, 0)

    def prev_idx(i):
        return (jnp.maximum(nl - 1 - i, 0), 0, 0)

    main_spec = pl.BlockSpec(plane, main_idx, memory_space=pltpu.VMEM)
    prev_spec = pl.BlockSpec(plane, prev_idx, memory_space=pltpu.VMEM)
    halo_spec = pl.BlockSpec(plane, lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec(plane, main_idx, memory_space=pltpu.VMEM)

    f32 = jnp.float32
    plane_bytes = ny * nz * 4
    vmem_limit = min(int(plane_bytes * 50 + (1 << 20)), 120 * (1 << 20))
    return pl.pallas_call(
        functools.partial(_kernel, inv_dx, nl),
        grid=(nl + 1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # coeff row (1, 4) f32
            pl.BlockSpec(memory_space=pltpu.SMEM),  # flags (1, 2) int32
            *([main_spec] * 6),
            *([prev_spec] * 2),
            *([halo_spec] * 7),
        ],
        out_specs=tuple([out_spec] * 6),
        out_shape=tuple(jax.ShapeDtypeStruct(local_shape, f32) for _ in range(6)),
        scratch_shapes=[pltpu.VMEM((ny, nz), f32), pltpu.VMEM((ny, nz), f32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )


def make_pallas_sharded_step(
    mesh: Mesh,
    axis: str = "x",
    *,
    inv_dx: Tuple[float, float, float],
    dt: float,
    bc: BoundaryConditions = BoundaryConditions(),
    interpret: bool = False,
):
    """Build step(state, coeffs, sources) for a lattice 1-D sharded along x
    on mesh axis ``axis``. coeffs must be uniform scalars (CellCoefficients
    of 0-d arrays); other configurations use parallel.sharded."""
    from ..solver.pallas_step import supports

    n_dev = mesh.shape[axis]
    dims = (axis, None, None)
    field_spec = P(*dims)

    def local_step(state: SimState, coeffs, sources) -> SimState:
        local_shape = state.ex.shape
        nl = local_shape[0]
        dtype = state.ex.dtype
        idx = lax.axis_index(axis)

        # --- neighbor exchange (7 planes over ICI) ----------------------
        up = [(i, i + 1) for i in range(n_dev - 1)]  # to higher x
        down = [(i + 1, i) for i in range(n_dev - 1)]  # to lower x

        def send_up(f):  # my last plane -> neighbor's x = -1 halo
            return lax.ppermute(f[-1:], axis, up)

        def send_down(f):  # my first plane -> neighbor's x = nl halo
            return lax.ppermute(f[:1], axis, down)

        lo_ey = send_up(state.ey)
        lo_ez = send_up(state.ez)
        hi_ex = send_down(state.ex)
        hi_ey = send_down(state.ey)
        hi_ez = send_down(state.ez)
        hi_hy = send_down(state.hy)
        hi_hz = send_down(state.hz)

        row = jnp.stack([
            jnp.asarray(coeffs.c_a, jnp.float32),
            jnp.asarray(coeffs.c_b, jnp.float32),
            jnp.asarray(coeffs.d_a, jnp.float32),
            jnp.asarray(coeffs.d_b, jnp.float32),
        ]).reshape(1, 4)
        flags = jnp.stack([
            (idx == 0).astype(jnp.int32),
            (idx == n_dev - 1).astype(jnp.int32),
        ]).reshape(1, 2)

        call = _build_call(local_shape, inv_dx, interpret)
        outs = call(
            row, flags,
            state.ex, state.ey, state.ez, state.hx, state.hy, state.hz,
            state.ey, state.ez,
            lo_ey, lo_ez, hi_ex, hi_ey, hi_ez, hi_hy, hi_hz,
        )
        e = list(outs[0:3])
        h = outs[3:6]

        if sources is not None and sources.num_sources > 0:
            t = state.tick.astype(dtype) * jnp.asarray(dt, dtype)
            j_vals, _ = sources.values(t)
            pts, valid = _local_points(sources.points, dims, (n_dev, 1, 1), local_shape)
            j_vals = jnp.where(valid[:, None], j_vals, 0)
            px, py, pz = pts[:, 0], pts[:, 1], pts[:, 2]
            cb = _cells(coeffs.c_b, px, py, pz, sources.num_sources, dtype)
            e = [
                e[c].at[px, py, pz].add(
                    -(cb * j_vals[:, c]).astype(dtype), mode="drop"
                )
                for c in range(3)
            ]

        return SimState(
            ex=e[0], ey=e[1], ez=e[2], hx=h[0], hy=h[1], hz=h[2],
            tick=state.tick + 1,
        )

    state_spec = SimState(
        ex=field_spec, ey=field_spec, ez=field_spec,
        hx=field_spec, hy=field_spec, hz=field_spec, tick=P(),
    )

    def step(state: SimState, coeffs, sources) -> SimState:
        in_specs = (
            state_spec,
            jax.tree.map(lambda _: P(), coeffs),
            jax.tree.map(lambda _: P(), sources),
        )
        return jax.shard_map(
            local_step,
            mesh=mesh,
            in_specs=in_specs,
            out_specs=state_spec,
            check_vma=False,
        )(state, coeffs, sources)

    return step
