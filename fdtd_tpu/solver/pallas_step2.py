"""Temporally-blocked Pallas kernel: TWO leapfrog ticks per lattice pass.

FDTD is HBM-bandwidth-bound; the single-pass fused kernel (pallas_step.py)
already fuses H+E, so the remaining lever is temporal blocking: advance two
timesteps while the data is in VMEM, halving HBM traffic per step
(~28 B/cell/step vs ~56). This is the classic wavefront/trapezoid scheme
specialized to the descending-x sweep:

At sweep iteration for plane p (descending from nx-1 to -1), with VMEM
carries from the previous (higher-x) iteration:

  1. H1[p]   = d_a H0[p] - d_b curl_b(E0)[p]        (E0[p-1] halo inputs)
  2. E1[p]   = c_a E0[p] + c_b curl_f(H1)[p]        (H1[p+1] from carry)
     (+ in-kernel J injection for step 1 — the correction must exist
      BEFORE E1 feeds step 2's curls)
  3. H2[p+1] = d_a H1[p+1] - d_b curl_b(E1)[p+1]    (carried H1/E1 planes)
  4. E2[p+1] = c_a E1[p+1] + c_b curl_f(H2)[p+1]    (H2[p+2] from carry)

Outputs are the step-2 fields at plane p+1, written with a clamped index
map (the first iteration's garbage write at nx-1 is overwritten in grid
order; the final iteration p = -1 computes plane 0). Step-2's J sources are
applied after the kernel (exact, as in the single-step kernel).

Supports the same envelope as pallas_step.supports() with uniform scalar
coefficients; equivalence with two invocations of the single-step kernel is
enforced in tests/test_pallas_step2.py.
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

__all__ = ["pallas_step2_fn", "supports2"]


def supports2(shape, bc, sources: Optional[SourceSet] = None, dtype=jnp.float32) -> bool:
    from .pallas_step import supports

    if not supports(shape, bc, dtype=dtype):
        return False
    return shape[0] >= 4


def _kernel(inv_dx, nx, n_src, storage_dtype, *refs):
    (coef_ref, src_ref,
     ex_r, ey_r, ez_r, hx_r, hy_r, hz_r, eyl_r, ezl_r,
     exo, eyo, ezo, hxo, hyo, hzo,
     # carries:
     c_h1x, c_h1y, c_h1z,   # H1[p+1]
     c_e1x, c_e1y, c_e1z,   # E1[p+1]
     c_h2y, c_h2z,          # H2[p+2]
     ) = refs

    i = pl.program_id(0)
    p = nx - 1 - i  # nx-1 .. -1
    inv_x, inv_y, inv_z = inv_dx
    f32 = jnp.float32

    c_a = coef_ref[0, 0]
    c_b = coef_ref[0, 1]
    d_a = coef_ref[0, 2]
    d_b = coef_ref[0, 3]

    ex = ex_r[0].astype(f32)
    ey = ey_r[0].astype(f32)
    ez = ez_r[0].astype(f32)
    hx = hx_r[0].astype(f32)
    hy = hy_r[0].astype(f32)
    hz = hz_r[0].astype(f32)
    ny, nz = ex.shape

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

    zero = jnp.zeros_like(ex)

    # ---- step 1 at plane p: H1[p], E1[p]  (skipped math-wise at p == -1,
    # i.e. the final iteration computes garbage here that nothing consumes
    # this iteration... but the carries MUST not be poisoned; see the
    # conditional carry update at the bottom) ----------------------------
    at_lo = p <= 0  # p == 0: genuine low edge; p == -1: inert
    dey_x = jnp.where(at_lo, zero, ey - eyl_r[0].astype(f32)) * inv_x
    dez_x = jnp.where(at_lo, zero, ez - ezl_r[0].astype(f32)) * inv_x
    ce_x = bdiff_y(ez) * inv_y - bdiff_z(ey) * inv_z
    ce_y = bdiff_z(ex) * inv_z - dez_x
    ce_z = dey_x - bdiff_y(ex) * inv_y
    h1x = d_a * hx - d_b * ce_x
    h1y = d_a * hy - d_b * ce_y
    h1z = d_a * hz - d_b * ce_z

    at_hi = p == nx - 1
    h1y_top = c_h1y[...]
    h1z_top = c_h1z[...]
    dh1y_x = jnp.where(at_hi, zero, h1y_top - h1y) * inv_x
    dh1z_x = jnp.where(at_hi, zero, h1z_top - h1z) * inv_x
    ch_x = fdiff_y(h1z) * inv_y - fdiff_z(h1y) * inv_z
    ch_y = fdiff_z(h1x) * inv_z - dh1z_x
    ch_z = dh1y_x - fdiff_y(h1x) * inv_y
    e1x = c_a * ex + c_b * ch_x
    e1y = c_a * ey + c_b * ch_y
    e1z = c_a * ez + c_b * ch_z

    # step-1 J injection (must precede step 2's curls). src_ref rows:
    # [px, py, pz, j1x, j1y, j1z] as f32 in SMEM. Plain masked selects:
    # value rebinding inside pl.when would not escape its body.
    for s in range(n_src):
        sp = src_ref[s, 0].astype(jnp.int32)
        py = src_ref[s, 1].astype(jnp.int32)
        pz = src_ref[s, 2].astype(jnp.int32)
        mask = jnp.logical_and(sp == p, jnp.logical_and(iy == py, iz == pz))
        e1x = jnp.where(mask, e1x - c_b * src_ref[s, 3], e1x)
        e1y = jnp.where(mask, e1y - c_b * src_ref[s, 4], e1y)
        e1z = jnp.where(mask, e1z - c_b * src_ref[s, 5], e1z)

    # ---- step 2 at plane p+1: H2[p+1], E2[p+1] --------------------------
    # carried step-1 fields at plane p+1
    h1x_c = c_h1x[...]
    e1x_c = c_e1x[...]
    e1y_c = c_e1y[...]
    e1z_c = c_e1z[...]
    at_lo2 = p + 1 == 0  # plane 0's backward diff uses the global edge
    de1y_x = jnp.where(at_lo2, zero, e1y_c - e1y) * inv_x
    de1z_x = jnp.where(at_lo2, zero, e1z_c - e1z) * inv_x
    ce2_x = bdiff_y(e1z_c) * inv_y - bdiff_z(e1y_c) * inv_z
    ce2_y = bdiff_z(e1x_c) * inv_z - de1z_x
    ce2_z = de1y_x - bdiff_y(e1x_c) * inv_y
    h2x = d_a * h1x_c - d_b * ce2_x
    h2y = d_a * h1y_top - d_b * ce2_y
    h2z = d_a * h1z_top - d_b * ce2_z

    at_hi2 = p + 1 == nx - 1
    h2y_top = c_h2y[...]
    h2z_top = c_h2z[...]
    dh2y_x = jnp.where(at_hi2, zero, h2y_top - h2y) * inv_x
    dh2z_x = jnp.where(at_hi2, zero, h2z_top - h2z) * inv_x
    ch2_x = fdiff_y(h2z) * inv_y - fdiff_z(h2y) * inv_z
    ch2_y = fdiff_z(h2x) * inv_z - dh2z_x
    ch2_z = dh2y_x - fdiff_y(h2x) * inv_y
    e2x = c_a * e1x_c + c_b * ch2_x
    e2y = c_a * e1y_c + c_b * ch2_y
    e2z = c_a * e1z_c + c_b * ch2_z

    exo[0] = e2x.astype(storage_dtype)
    eyo[0] = e2y.astype(storage_dtype)
    ezo[0] = e2z.astype(storage_dtype)
    hxo[0] = h2x.astype(storage_dtype)
    hyo[0] = h2y.astype(storage_dtype)
    hzo[0] = h2z.astype(storage_dtype)

    # ---- carries for the next (lower) iteration -------------------------
    c_h1x[...] = h1x
    c_h1y[...] = h1y
    c_h1z[...] = h1z
    c_e1x[...] = e1x
    c_e1y[...] = e1y
    c_e1z[...] = e1z
    c_h2y[...] = h2y
    c_h2z[...] = h2z


@functools.lru_cache(maxsize=16)
def _build_call(shape, inv_dx, n_src, interpret, dtype_name):
    storage_dtype = jnp.dtype(dtype_name)
    nx, ny, nz = shape
    plane = (1, ny, nz)

    def in_idx(i):
        # p = nx-1-i, clamped to 0 for the final (p == -1) iteration
        return (jnp.maximum(nx - 1 - i, 0), 0, 0)

    def halo_idx(i):
        return (jnp.maximum(nx - 2 - i, 0), 0, 0)

    def out_idx(i):
        # plane p+1 = nx-i, clamped to the valid range (first iteration's
        # write at nx-1 is overwritten next iteration, in grid order)
        return (jnp.clip(nx - i, 0, nx - 1), 0, 0)

    in_spec = pl.BlockSpec(plane, in_idx, memory_space=pltpu.VMEM)
    halo_spec = pl.BlockSpec(plane, halo_idx, memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec(plane, out_idx, memory_space=pltpu.VMEM)

    f32 = jnp.float32
    plane_bytes = ny * nz * 4
    vmem_limit = min(int(plane_bytes * 64 + (1 << 20)), 120 * (1 << 20))
    return pl.pallas_call(
        functools.partial(_kernel, inv_dx, nx, n_src, storage_dtype),
        grid=(nx + 1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # coeff row (1, 4)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # sources (n_src, 6) f32
            *([in_spec] * 6),
            *([halo_spec] * 2),
        ],
        out_specs=tuple([out_spec] * 6),
        out_shape=tuple(
            jax.ShapeDtypeStruct(shape, storage_dtype) for _ in range(6)
        ),
        scratch_shapes=[pltpu.VMEM((ny, nz), f32) for _ in range(8)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )


def pallas_step2_fn(
    shape: Tuple[int, int, int],
    *,
    inv_dx: Tuple[float, float, float],
    dt: float,
    bc: BoundaryConditions = BoundaryConditions(),
    max_sources: int = 8,
    interpret: bool = False,
    dtype=jnp.float32,
):
    """Build step2(state, coeffs, sources) advancing TWO ticks per call.

    coeffs must be uniform scalars; sources J-only with at most
    ``max_sources`` points (padded; zero-amplitude rows are inert).
    """
    if not supports2(shape, bc, dtype=dtype):
        raise ValueError(f"2-step kernel does not support {shape=} {bc=} {dtype=}")
    inv_dx = tuple(float(v) for v in inv_dx)
    call = _build_call(
        tuple(shape), inv_dx, max_sources, interpret, jnp.dtype(dtype).name
    )

    def step2(state: SimState, coeffs, sources: Optional[SourceSet]) -> SimState:
        row = jnp.stack(
            [
                jnp.asarray(coeffs.c_a, jnp.float32),
                jnp.asarray(coeffs.c_b, jnp.float32),
                jnp.asarray(coeffs.d_a, jnp.float32),
                jnp.asarray(coeffs.d_b, jnp.float32),
            ]
        ).reshape(1, 4)

        dtype_ = state.ex.dtype
        src_rows = jnp.full((max_sources, 6), -1.0, jnp.float32)
        if sources is not None and sources.num_sources > 0:
            n = sources.num_sources
            if n > max_sources:
                raise ValueError(f"{n} sources > max_sources={max_sources}")
            t1 = state.tick.astype(jnp.float32) * jnp.float32(dt)
            j1, _ = sources.values(t1)
            src_rows = src_rows.at[:n, 0:3].set(
                sources.points.astype(jnp.float32)
            )
            src_rows = src_rows.at[:n, 3:6].set(j1.astype(jnp.float32))

        outs = call(
            row, src_rows,
            state.ex, state.ey, state.ez, state.hx, state.hy, state.hz,
            state.ey, state.ez,
        )
        e = list(outs[0:3])
        h = outs[3:6]

        # step-2 J sources applied post-kernel (exact)
        if sources is not None and sources.num_sources > 0:
            t2 = (state.tick + 1).astype(jnp.float32) * jnp.float32(dt)
            j2, _ = sources.values(t2)
            px, py, pz = (
                sources.points[:, 0],
                sources.points[:, 1],
                sources.points[:, 2],
            )
            cb = _cells(coeffs.c_b, px, py, pz, sources.num_sources, dtype_)
            e = [
                e[c].at[px, py, pz].add(
                    -(cb * j2[:, c]).astype(dtype_), mode="drop"
                )
                for c in range(3)
            ]

        return SimState(
            ex=e[0], ey=e[1], ez=e[2], hx=h[0], hy=h[1], hz=h[2],
            tick=state.tick + 2,
        )

    return step2
