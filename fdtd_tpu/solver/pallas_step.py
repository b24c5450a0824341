"""Fused Pallas TPU kernel: one full leapfrog tick in a single lattice pass.

The reference's hot loop is two separate sweeps (H then E,
cem-solver/src/fdtd/cpu/mod.rs:429-510; two dispatches in
fdtd/wgpu/update.wgsl:56-129), reading and writing every field twice per
tick. This kernel fuses both half-updates into ONE pass: ~(24 read + 24
written + 8 halo) B/cell instead of ~96, which matters because FDTD is
HBM-bandwidth-bound.

How the data dependency is broken: the E update at plane x needs the *new*
H at plane x+1 (forward difference), which a single sweep doesn't have — so
the grid walks x-planes in DESCENDING order (the TPU Pallas grid is
sequential on a core), and each iteration

  1. loads E/H plane p (+ E_y/E_z halo planes at p-1 for the backward curl),
  2. computes H_next[p],
  3. computes E_next[p] using H_next[p] and H_next[p+1] taken from a VMEM
     scratch carried over from the previous (higher-x) iteration,
  4. stores H_next[p]'s tangential components into the scratch.

In-plane (y, z) differences never cross blocks since each block spans full
y/z extent. Edges use the reference's default Neumann(0) closure (zero
difference, fdtd/boundary_condition.rs:70-80).

Coefficients: 'uniform' mode reads 4 scalars from SMEM; 'matid' mode streams
a uint8 material-index plane and reconstructs per-cell coefficients with
K one-hot selects from a (K, 4) table (the compressed material buffer,
/root/reference/README.md:25-28) — 1 B/cell instead of 16.

Sources: J-only point sources are scatter-added *after* the kernel, which is
algebraically exact (the J term touches only E at the source cell and
nothing downstream within the tick). M-sources change H mid-tick and fall
back to the XLA path (see best.py).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .boundary import BoundaryConditions, Neumann
from .sources import SourceSet
from .state import SimState

__all__ = ["pallas_step_fn", "supports"]


def supports(
    shape: Tuple[int, int, int],
    bc: BoundaryConditions,
    sources: Optional[SourceSet] = None,
    dtype=jnp.float32,
) -> bool:
    """Whether the fused kernel covers this configuration."""
    nx, ny, nz = shape
    if dtype == jnp.float32:
        sublane = 8
    elif dtype == jnp.bfloat16:
        sublane = 16  # bf16 tile is (16, 128)
    else:
        return False
    if nx < 2 or ny % sublane != 0 or nz % 128 != 0:
        return False
    for cond in (bc.x, bc.y, bc.z):
        if not isinstance(cond, Neumann):
            return False
        if any(a != 0.0 for a in cond.alpha) or any(b != 0.0 for b in cond.beta):
            return False
    return True


def _kernel(
    n_materials: int,
    inv_dx: Tuple[float, float, float],
    nx: int,
    storage_dtype,
    io_alias: bool,
    # refs follow: see pallas_call operand order below
    *refs,
):
    if io_alias:
        # aliased (in-place) build: no separate halo operands (a donated
        # buffer used by two operands forces an XLA defensive copy); ey/ez
        # ride in as 2-plane Element windows covering (p-1, p)
        (coef_ref, ex_r, ey_r, ez_r, hx_r, hy_r, hz_r,
         exo, eyo, ezo, hxo, hyo, hzo, s_hy, s_hz) = refs
        eyl_r = ezl_r = None
    elif n_materials > 1:
        (table_ref, ex_r, ey_r, ez_r, hx_r, hy_r, hz_r, eyl_r, ezl_r, mid_r,
         exo, eyo, ezo, hxo, hyo, hzo, s_hy, s_hz) = refs
    else:
        (coef_ref, ex_r, ey_r, ez_r, hx_r, hy_r, hz_r, eyl_r, ezl_r,
         exo, eyo, ezo, hxo, hyo, hzo, s_hy, s_hz) = refs

    i = pl.program_id(0)
    p = nx - 1 - i  # descending plane index
    inv_x, inv_y, inv_z = inv_dx

    # compute in f32 regardless of storage dtype (bf16 storage halves HBM
    # traffic; f32 arithmetic keeps the update numerically sane)
    f32 = jnp.float32
    ex = ex_r[0].astype(f32)
    if io_alias:
        # window covers (max(p-1,0), max(p-1,0)+1): main plane is block[1]
        # at p >= 1, block[0] at the clamped p == 0 iteration; the halo
        # read at p == 0 is edge-masked
        fresh = p >= 1
        ey0 = ey_r[0].astype(f32)
        ez0 = ez_r[0].astype(f32)
        ey = jnp.where(fresh, ey_r[1].astype(f32), ey0)
        ez = jnp.where(fresh, ez_r[1].astype(f32), ez0)
    else:
        ey = ey_r[0].astype(f32)
        ez = ez_r[0].astype(f32)
    hx = hx_r[0].astype(f32)
    hy = hy_r[0].astype(f32)
    hz = hz_r[0].astype(f32)
    ny, nz = ex.shape

    # previous (higher-x) iteration's H_next tangential planes (p+1)
    hy_top = s_hy[...]
    hz_top = s_hz[...]

    # per-cell coefficients
    if n_materials > 1:
        # int8 vector compares don't lower in Mosaic; widen the index plane
        mid = mid_r[0].astype(jnp.int32)
        c_a = jnp.zeros_like(ex)
        c_b = jnp.zeros_like(ex)
        d_a = jnp.zeros_like(ex)
        d_b = jnp.zeros_like(ex)
        for k in range(n_materials):
            sel = (mid == k).astype(ex.dtype)
            c_a += sel * table_ref[k, 0]
            c_b += sel * table_ref[k, 1]
            d_a += sel * table_ref[k, 2]
            d_b += sel * table_ref[k, 3]
    else:
        c_a = coef_ref[0, 0]
        c_b = coef_ref[0, 1]
        d_a = coef_ref[0, 2]
        d_b = coef_ref[0, 3]

    iy = jax.lax.broadcasted_iota(jnp.int32, (ny, nz), 0)
    iz = jax.lax.broadcasted_iota(jnp.int32, (ny, nz), 1)
    at_x_lo = p == 0
    at_x_hi = p == nx - 1

    def bdiff_y(f):  # f[j] - f[j-1], 0 at j == 0
        return jnp.where(iy == 0, 0.0, f - pltpu.roll(f, 1, axis=0))

    def bdiff_z(f):
        return jnp.where(iz == 0, 0.0, f - pltpu.roll(f, 1, axis=1))

    def fdiff_y(f):  # f[j+1] - f[j], 0 at j == ny-1 (roll needs shift >= 0,
        # so shift by size-1 which is congruent to -1 mod size)
        return jnp.where(iy == ny - 1, 0.0, pltpu.roll(f, ny - 1, axis=0) - f)

    def fdiff_z(f):
        return jnp.where(iz == nz - 1, 0.0, pltpu.roll(f, nz - 1, axis=1) - f)

    # ---- H update: h = d_a*h - d_b*curl_b(E) ---------------------------
    # curl_b E: x-backward differences use the p-1 halo planes
    zero = jnp.zeros_like(ex)
    halo_ey = ey0 if io_alias else eyl_r[0].astype(f32)
    halo_ez = ez0 if io_alias else ezl_r[0].astype(f32)
    dey_x = jnp.where(at_x_lo, zero, ey - halo_ey) * inv_x
    dez_x = jnp.where(at_x_lo, zero, ez - halo_ez) * inv_x
    ce_x = bdiff_y(ez) * inv_y - bdiff_z(ey) * inv_z
    ce_y = bdiff_z(ex) * inv_z - dez_x
    ce_z = dey_x - bdiff_y(ex) * inv_y

    hn_x = d_a * hx - d_b * ce_x
    hn_y = d_a * hy - d_b * ce_y
    hn_z = d_a * hz - d_b * ce_z

    # ---- E update: e = c_a*e + c_b*curl_f(H_next) ----------------------
    dhy_x = jnp.where(at_x_hi, zero, hy_top - hn_y) * inv_x
    dhz_x = jnp.where(at_x_hi, zero, hz_top - hn_z) * inv_x
    ch_x = fdiff_y(hn_z) * inv_y - fdiff_z(hn_y) * inv_z
    ch_y = fdiff_z(hn_x) * inv_z - dhz_x
    ch_z = dhy_x - fdiff_y(hn_x) * inv_y

    exo[0] = (c_a * ex + c_b * ch_x).astype(storage_dtype)
    eyo[0] = (c_a * ey + c_b * ch_y).astype(storage_dtype)
    ezo[0] = (c_a * ez + c_b * ch_z).astype(storage_dtype)
    hxo[0] = hn_x.astype(storage_dtype)
    hyo[0] = hn_y.astype(storage_dtype)
    hzo[0] = hn_z.astype(storage_dtype)

    # carry H_next tangential planes for the next (lower-x) iteration
    s_hy[...] = hn_y
    s_hz[...] = hn_z


@functools.lru_cache(maxsize=32)
def _build_call(shape, inv_dx, n_materials, interpret, dtype_name="float32",
                io_alias=False):
    storage_dtype = jnp.dtype(dtype_name)
    nx, ny, nz = shape
    plane = (1, ny, nz)

    def main_idx(i):
        return (nx - 1 - i, 0, 0)

    def halo_idx(i):
        return (jnp.maximum(nx - 2 - i, 0), 0, 0)

    main_spec = pl.BlockSpec(plane, main_idx, memory_space=pltpu.VMEM)
    halo_spec = pl.BlockSpec(plane, halo_idx, memory_space=pltpu.VMEM)

    if io_alias:
        if n_materials > 1:
            raise ValueError("io_alias does not support matid mode")
        # ey/ez as 2-plane Element windows (halo folded in; see _kernel):
        # each donated buffer appears exactly once, so aliasing is
        # copy-free — required for in-place stepping at HBM-limit shapes
        two_spec = pl.BlockSpec(
            (pl.Element(2), pl.Element(ny), pl.Element(nz)),
            lambda i: (jnp.maximum(nx - 2 - i, 0), 0, 0),
            memory_space=pltpu.VMEM,
        )
        in_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),  # (1, 4) coefficient row
            main_spec, two_spec, two_spec, main_spec, main_spec, main_spec,
        ]
    else:
        in_specs = [main_spec] * 6 + [halo_spec] * 2
        if n_materials > 1:
            in_specs = [
                pl.BlockSpec(memory_space=pltpu.VMEM),  # (K, 4) table
                *in_specs,
                pl.BlockSpec(plane, main_idx, memory_space=pltpu.VMEM),
            ]
        else:
            in_specs = [
                pl.BlockSpec(memory_space=pltpu.SMEM),  # (1, 4) coeff row
                *in_specs,
            ]

    out_specs = tuple([main_spec] * 6)
    f32 = jnp.float32
    out_shape = tuple(jax.ShapeDtypeStruct(shape, storage_dtype) for _ in range(6))

    kernel = functools.partial(
        _kernel, n_materials, inv_dx, nx, storage_dtype, io_alias
    )
    # VMEM: (8 or 9) input + 6 output plane buffers, double-buffered by the
    # pipeline, + 2 scratch planes + temporaries. v5e has 128 MB physical
    # VMEM; the default 16 MB scoped limit underflows at 512^2 planes.
    plane_bytes = ny * nz * 4
    vmem_limit = min(int(plane_bytes * 40 + (1 << 20)), 120 * (1 << 20))
    return pl.pallas_call(
        kernel,
        grid=(nx,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((ny, nz), f32),
            pltpu.VMEM((ny, nz), f32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        input_output_aliases={1 + f: f for f in range(6)} if io_alias else {},
        interpret=interpret,
    )


def pallas_step_fn(
    shape: Tuple[int, int, int],
    *,
    inv_dx: Tuple[float, float, float],
    dt: float,
    bc: BoundaryConditions = BoundaryConditions(),
    matid: Optional[jax.Array] = None,
    n_materials: int = 1,
    interpret: bool = False,
    dtype=jnp.float32,
    io_alias: bool = False,
):
    """Build step(state, coeffs, sources) -> state backed by the fused kernel.

    ``coeffs`` must be CellCoefficients of scalars when n_materials == 1, or
    carry a (K, 4) table via step-time closure when ``matid`` is given.
    In matid mode pass coeffs as the (K, 4) jnp table instead (see
    Simulation/best.py wiring).
    """
    if not supports(shape, bc, dtype=dtype):
        raise ValueError(f"pallas kernel does not support {shape=} {bc=} {dtype=}")
    nx, ny, nz = shape
    inv_dx = tuple(float(v) for v in inv_dx)
    call = _build_call(tuple(shape), inv_dx, n_materials if matid is not None else 1,
                       interpret, jnp.dtype(dtype).name, io_alias)

    def _scatter_j(e, coeffs_cb, sources, tick, dtype):
        t = tick.astype(dtype) * jnp.asarray(dt, dtype)
        j_vals, _ = sources.values(t)
        px, py, pz = sources.points[:, 0], sources.points[:, 1], sources.points[:, 2]
        if jnp.ndim(coeffs_cb) == 0:
            cb_cells = jnp.full((sources.num_sources,), coeffs_cb, dtype)
        else:
            cb_cells = coeffs_cb[px, py, pz]
        return tuple(
            e[c].at[px, py, pz].add(
                -(cb_cells * j_vals[:, c]).astype(dtype), mode="drop"
            )
            for c in range(3)
        )

    if matid is not None:

        def step(state: SimState, table: jax.Array, sources) -> SimState:
            outs = call(
                table.astype(jnp.float32),
                state.ex, state.ey, state.ez, state.hx, state.hy, state.hz,
                state.ey, state.ez,
                matid,
            )
            e = outs[0:3]
            h = outs[3:6]
            if sources is not None and sources.num_sources > 0:
                cb = jnp.take(table[:, 1], matid.astype(jnp.int32))
                e = _scatter_j(e, cb, sources, state.tick, state.ex.dtype)
            return SimState(*e, *h, tick=state.tick + 1)

    else:

        def step(state: SimState, coeffs, sources) -> SimState:
            row = jnp.stack(
                [
                    jnp.asarray(coeffs.c_a, jnp.float32),
                    jnp.asarray(coeffs.c_b, jnp.float32),
                    jnp.asarray(coeffs.d_a, jnp.float32),
                    jnp.asarray(coeffs.d_b, jnp.float32),
                ]
            ).reshape(1, 4)
            halos = () if io_alias else (state.ey, state.ez)
            outs = call(
                row,
                state.ex, state.ey, state.ez, state.hx, state.hy, state.hz,
                *halos,
            )
            e = outs[0:3]
            h = outs[3:6]
            if sources is not None and sources.num_sources > 0:
                e = _scatter_j(e, coeffs.c_b, sources, state.tick, state.ex.dtype)
            return SimState(*e, *h, tick=state.tick + 1)

    return step
