"""The composed engine (CPML + TF/SF + sources) under shard_map.

Multi-chip runs of the FULL-FEATURED step — the capability the reference
never had on any backend (its multi-GPU story is absent, SURVEY.md §2.7,
and its PML was a no-op, cem-solver/src/fdtd/cpu/mod.rs:424-425). The
single-device engine (solver/engine.py) keeps psi SLAB-resident for memory;
here psi is FULL-DOMAIN so the recurrence is purely elementwise:

    psi <- b * psi + c * dF     (b = c = 0 outside the slabs -> psi == 0)
    dF~ =  dF / kappa + psi     (kappa = 1 outside -> identity)

which composes with domain decomposition with NO extra communication: the
only halos are the 1-plane curl-difference exchanges already used by the
lean sharded step (parallel/sharded.py). The 1D absorber profiles ride in
as shard_map OPERANDS with the lattice PartitionSpec on their axis, so each
shard receives exactly its slice — a shard that holds no absorber cells
gets all-zero (b, c) and the recurrence degenerates to a no-op there.

Memory: 12 extra full fields when all axes absorb. At multi-chip scale
that is the point — per chip it is 12/n_dev of the single-chip slab cost
times the slab fraction's inverse, i.e. ~1.5 GB/chip at 512^3 over 8
chips, well within a v5e's HBM.

TF/SF x-plane corrections become dynamic-slice updates at shard-local
indices (masked to zero on shards that don't own the plane); the 1D
auxiliary incident-wave grid is replicated and stepped identically on every
shard (deterministic, so all copies agree).

Exactness: per-cell arithmetic is identical to solver/engine.py, so sharded
and single-device runs agree to rounding (tested at f64 rtol 1e-12 in
tests/test_sharded_engine.py).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..constants import SI, PhysicalConstants
from ..solver.boundary import BoundaryConditions
from ..solver.sources import SourceSet
from ..solver.step import _cells
from .sharded import _halo_diff_backward, _halo_diff_forward, _local_points

__all__ = [
    "ShardedEngineState",
    "init_sharded_engine_state",
    "sharded_engine_state_sharding",
    "make_sharded_engine_step",
]

# the 6 (component, axis) derivative terms entering a curl
_TERMS = ((2, 1), (1, 2), (0, 2), (2, 0), (1, 0), (0, 1))
_FIELDS = ("ex", "ey", "ez", "hx", "hy", "hz")


class ShardedEngineState(NamedTuple):
    """Engine state with FULL-DOMAIN psi (scalar 0 placeholders for terms
    whose axis has no absorber), sharded like the fields."""

    ex: jax.Array
    ey: jax.Array
    ez: jax.Array
    hx: jax.Array
    hy: jax.Array
    hz: jax.Array
    tick: jax.Array
    psi_h: Tuple[jax.Array, ...]  # 6 terms
    psi_e: Tuple[jax.Array, ...]
    aux_e: jax.Array  # () if no TF/SF; replicated otherwise
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


def sharded_engine_state_sharding(
    mesh: Mesh, dims=("x", None, None), *, cpml=None, tfsf=None, dense=None
) -> ShardedEngineState:
    """NamedShardings for a ShardedEngineState on ``mesh``."""
    fs = NamedSharding(mesh, P(*dims))
    r = NamedSharding(mesh, P())
    active = set(cpml.active_axes()) if cpml is not None else set()
    if dense is not None:
        active = active | {dense.axis}
    psi = tuple(fs if axis in active else r for _, axis in _TERMS)
    return ShardedEngineState(
        ex=fs, ey=fs, ez=fs, hx=fs, hy=fs, hz=fs, tick=r,
        psi_h=psi, psi_e=psi, aux_e=r, aux_h=r,
    )


def init_sharded_engine_state(
    shape, mesh: Mesh, dims=("x", None, None), dtype=jnp.float32,
    *, cpml=None, tfsf=None, dense=None,
) -> ShardedEngineState:
    """Zero state placed on the mesh with the engine layout."""
    active = set(cpml.active_axes()) if cpml is not None else set()
    if dense is not None:
        active = active | {dense.axis}
    z = lambda: jnp.zeros(shape, dtype)
    zs = lambda: jnp.zeros((), dtype)
    psi = lambda: tuple(z() if axis in active else zs() for _, axis in _TERMS)
    if tfsf is not None:
        aux_e, aux_h = tfsf.init_aux(shape[0], dtype)
    else:
        aux_e, aux_h = zs(), zs()
    state = ShardedEngineState(
        ex=z(), ey=z(), ez=z(), hx=z(), hy=z(), hz=z(),
        tick=jnp.zeros((), jnp.int32),
        psi_h=psi(), psi_e=psi(), aux_e=aux_e, aux_h=aux_h,
    )
    return jax.device_put(
        state, sharded_engine_state_sharding(mesh, dims, cpml=cpml,
                                             tfsf=tfsf, dense=dense)
    )


def _oriented(arr1d, axis, dtype):
    """1D profile -> 3D broadcastable along ``axis``."""
    shape = [1, 1, 1]
    shape[axis] = len(arr1d)
    return jnp.asarray(arr1d, dtype).reshape(shape)


def make_sharded_engine_step(
    mesh: Mesh,
    shape: Tuple[int, int, int],
    dims: Tuple[Optional[str], Optional[str], Optional[str]] = ("x", None, None),
    *,
    inv_dx: Tuple[float, float, float],
    dt: float,
    bc: BoundaryConditions = BoundaryConditions(),
    constants: PhysicalConstants = SI,
    dtype=jnp.float32,
    cpml=None,
    tfsf=None,
    dense=None,
):
    """Build step(state, coeffs, sources) -> state: the full engine update
    (solver/engine.py order, cpu/mod.rs:412-516) over a sharded lattice.

    ``shape`` is the GLOBAL lattice shape (profiles are built for it and
    split by shard_map). Coeffs may be uniform scalars or dense sharded
    arrays.

    ``dense`` is an optional solver.pml_region.DensePml (per-cell uniaxial
    CPML on an AABB subgrid — arbitrary-shape interior absorbers,
    runner.rs:633-676): its per-cell (inv_kappa, b, c) volumes are merged
    into FULL-DOMAIN elementwise coefficient arrays for the two curl terms
    along its axis (identity outside the box, the boundary-slab profile in
    the slabs — the overlap check keeps them disjoint), so the recurrence
    stays purely elementwise and composes with ANY decomposition exactly
    like the boundary psi (module docstring). The psi terms along
    dense.axis become full-domain arrays even when no boundary slab
    absorbs there."""
    n_devs = tuple(1 if d is None else mesh.shape[d] for d in dims)
    active = set(cpml.active_axes()) if cpml is not None else set()
    active_eff = set(active)

    # full-length elementwise (inv_kappa, b, c) per (half, axis); these are
    # shard_map operands so each shard sees its own slice
    profs = {}
    prof_specs = {}
    if cpml is not None:
        from ..solver.cpml import _profiles_1d

        for axis in active:
            lo, hi = cpml.thickness[axis]
            dx = 1.0 / inv_dx[axis]
            for half, key in ((False, "h"), (True, "e")):
                ik, b, c = _profiles_1d(
                    shape[axis], lo, hi, cpml.spec, dx, dt, constants, half
                )
                profs[(key, axis)] = tuple(
                    _oriented(v, axis, dtype) for v in (ik, b, c)
                )
                spec = [None, None, None]
                spec[axis] = dims[axis]
                prof_specs[(key, axis)] = (P(*spec),) * 3

    if dense is not None:
        dense.validate(shape)
        if dense.axis in active:
            # live extent only: tile-padded cells are identity no-ops
            (db0, db1) = dense.live[dense.axis]
            lo, hi = cpml.thickness[dense.axis]
            n = shape[dense.axis]
            if db0 < lo or db1 > n - hi:
                raise ValueError(
                    "DensePml region overlaps a boundary CPML slab on "
                    f"axis {dense.axis}: box [{db0}, {db1}) vs slabs "
                    f"[0, {lo}) / [{n - hi}, {n})"
                )
        active_eff.add(dense.axis)
        dbox = tuple(slice(b0, b1) for b0, b1 in dense.box)
        for key, coeffs3 in (("h", dense.coeffs_h), ("e", dense.coeffs_e)):
            prev = profs.get((key, dense.axis))
            full = []
            for j, (cv, ident) in enumerate(
                zip(coeffs3, (1.0, 0.0, 0.0))
            ):
                base = (
                    jnp.broadcast_to(prev[j], shape)
                    if prev is not None
                    else jnp.full(shape, ident, dtype)
                )
                full.append(base.at[dbox].set(jnp.asarray(cv, dtype)))
            profs[(key, dense.axis)] = tuple(full)
            prof_specs[(key, dense.axis)] = (P(*dims),) * 3

    aux_coeffs = None
    if tfsf is not None:
        from ..coefficients import update_coefficients
        from ..grid import Resolution
        from ..material import VACUUM

        dx0 = 1.0 / inv_dx[0]
        vacuum_row = update_coefficients(
            VACUUM, Resolution(spatial=(dx0,) * 3, temporal=dt), constants
        )
        aux_coeffs = tfsf.build_aux(shape[0], vacuum_row, dt, dx0, constants, dtype)
        tfsf.validate(shape)
        tf_lo, tf_hi = tfsf.span
        if tfsf.is_box:
            (tf_ylo, tf_yhi), (tf_zlo, tf_zhi) = tfsf.span_y, tfsf.span_z

    def _axis_offset(a, local_n):
        """Global index of this shard's first plane along lattice axis a."""
        if dims[a] is None or n_devs[a] == 1:
            return jnp.zeros((), jnp.int32)
        return (lax.axis_index(dims[a]) * local_n).astype(jnp.int32)

    def _x_offset(local_nx):
        return _axis_offset(0, local_nx)

    def _lat_masks(local_shape):
        """Shard-local boolean masks of the box's y and z spans (all-True
        for slab mode) — the lateral faces and x-plane restrictions then
        work under ANY decomposition, not just x."""
        if tfsf is None or not tfsf.is_box:
            return (jnp.ones((local_shape[1],), bool),
                    jnp.ones((local_shape[2],), bool))
        gy = _axis_offset(1, local_shape[1]) + jnp.arange(local_shape[1])
        gz = _axis_offset(2, local_shape[2]) + jnp.arange(local_shape[2])
        return (jnp.logical_and(gy >= tf_ylo, gy <= tf_yhi),
                jnp.logical_and(gz >= tf_zlo, gz <= tf_zhi))

    def _plane_add(f, coef, g_idx, off, val_scalar, ymask, zmask):
        """f[g_idx (global x-plane), box y rows, box z cols] +=
        coef_block * val_scalar, shard-local: masked to zero on shards
        that own neither the plane nor the lateral rows."""
        nl = f.shape[0]
        loc = jnp.asarray(g_idx, jnp.int32) - off
        ok = jnp.logical_and(loc >= 0, loc < nl)
        locc = jnp.clip(loc, 0, nl - 1)
        plane = lax.dynamic_slice_in_dim(f, locc, 1, axis=0)
        if jnp.ndim(coef) == 0:
            cblock = coef
        else:
            cblock = lax.dynamic_slice_in_dim(coef, locc, 1, axis=0)
        m = jnp.logical_and(ok, jnp.logical_and(ymask[None, :, None],
                                                zmask[None, None, :]))
        add = jnp.where(m, jnp.asarray(val_scalar, f.dtype), 0) * cblock
        return lax.dynamic_update_slice_in_dim(f, plane + add, locc, axis=0)

    def _lat_plane_add(f, coef, axis, g_idx, val_row, other_mask):
        """f[:, g_idx, other-axis box cols] += coef_block * val_row
        along lateral ``axis`` (1 or 2); val_row is the per-local-x
        incident value (already in_x-masked)."""
        nl = f.shape[axis]
        loc = jnp.asarray(g_idx, jnp.int32) - _axis_offset(axis, nl)
        ok = jnp.logical_and(loc >= 0, loc < nl)
        locc = jnp.clip(loc, 0, nl - 1)
        plane = lax.dynamic_slice_in_dim(f, locc, 1, axis=axis)
        if jnp.ndim(coef) == 0:
            cblock = coef
        else:
            cblock = lax.dynamic_slice_in_dim(coef, locc, 1, axis=axis)
        if axis == 1:
            m = other_mask[None, None, :]      # z mask
            val = val_row[:, None, None]
        else:
            m = other_mask[None, :, None]      # y mask
            val = val_row[:, None, None]
        add = jnp.where(jnp.logical_and(ok, m), val.astype(f.dtype), 0) * cblock
        return lax.dynamic_update_slice_in_dim(f, plane + add, locc,
                                               axis=axis)

    def local_step(state, coeffs, sources, lprofs):
        local_shape = state.ex.shape
        tick = state.tick
        t = tick.astype(dtype) * jnp.asarray(dt, dtype)

        if sources is not None and sources.num_sources > 0:
            j_vals, m_vals = sources.values(t)
            pts, valid = _local_points(sources.points, dims, n_devs, local_shape)
            j_vals = jnp.where(valid[:, None], j_vals, 0)
            m_vals = jnp.where(valid[:, None], m_vals, 0)
            px, py, pz = pts[:, 0], pts[:, 1], pts[:, 2]
        else:
            j_vals = m_vals = None

        def curl_with_psi(f3, psi, halo_diff, key):
            d = {}
            new_psi = list(psi)
            for idx, (comp, axis) in enumerate(_TERMS):
                raw = (
                    halo_diff(
                        f3[comp], axis, dims[axis], n_devs[axis],
                        bc.axis(axis), comp,
                    )
                    * inv_dx[axis]
                )
                if axis in active_eff:
                    ik, b, c = lprofs[(key, axis)]
                    p = b * psi[idx] + c * raw
                    new_psi[idx] = p
                    raw = ik * raw + p
                d[(comp, axis)] = raw
            cx = d[(2, 1)] - d[(1, 2)]
            cy = d[(0, 2)] - d[(2, 0)]
            cz = d[(1, 0)] - d[(0, 1)]
            return (cx, cy, cz), tuple(new_psi)

        # --- H half-update ---------------------------------------------
        ce, psi_h = curl_with_psi(state.e, state.psi_h, _halo_diff_backward, "h")
        h = [coeffs.d_a * state.h[c] - coeffs.d_b * ce[c] for c in range(3)]

        aux_e, aux_h = state.aux_e, state.aux_h
        if tfsf is not None:
            off = _x_offset(local_shape[0])
            ymask, zmask = _lat_masks(local_shape)
            # incident E at the old time level (aux not yet stepped)
            h[1] = _plane_add(
                h[1], coeffs.d_b, tf_lo, off, -aux_e[tf_lo - 1] * inv_dx[0],
                ymask, zmask,
            )
            h[1] = _plane_add(
                h[1], coeffs.d_b, tf_hi + 1, off, aux_e[tf_hi] * inv_dx[0],
                ymask, zmask,
            )
            if tfsf.is_box:
                # y faces: incident Ez = aux_e[global x], masked to this
                # shard's rows inside the box x-span (solver/engine.py order)
                gx = off + jnp.arange(local_shape[0])
                in_x = jnp.logical_and(gx >= tf_lo, gx <= tf_hi)
                ez_inc = (
                    jnp.where(in_x, aux_e[jnp.clip(gx, 0, shape[0] - 1)], 0)
                    * inv_dx[1]
                ).astype(dtype)
                h[0] = _lat_plane_add(h[0], coeffs.d_b, 1, tf_ylo,
                                      ez_inc, zmask)
                h[0] = _lat_plane_add(h[0], coeffs.d_b, 1, tf_yhi + 1,
                                      -ez_inc, zmask)
            aux_e, aux_h = tfsf.aux_step(aux_e, aux_h, aux_coeffs, t, inv_dx[0], dtype)

        if m_vals is not None:
            db = _cells(coeffs.d_b, px, py, pz, sources.num_sources, dtype)
            h = [
                h[c].at[px, py, pz].add(
                    -(db * m_vals[:, c]).astype(dtype), mode="drop"
                )
                for c in range(3)
            ]

        # --- E half-update (uses the new H) ------------------------------
        ch, psi_e = curl_with_psi(tuple(h), state.psi_e, _halo_diff_forward, "e")
        e = [coeffs.c_a * state.e[c] + coeffs.c_b * ch[c] for c in range(3)]

        if tfsf is not None:
            # incident H at the new time level (aux just stepped)
            e[2] = _plane_add(
                e[2], coeffs.c_b, tf_lo - 1, off, -aux_h[tf_lo] * inv_dx[0],
                ymask, zmask,
            )
            e[2] = _plane_add(
                e[2], coeffs.c_b, tf_hi, off, aux_h[tf_hi + 1] * inv_dx[0],
                ymask, zmask,
            )
            if tfsf.is_box:
                # z faces: incident Hy = aux_h[global x], same x-mask
                hy_inc = (
                    jnp.where(in_x, aux_h[jnp.clip(gx, 0, shape[0] - 1)], 0)
                    * inv_dx[2]
                ).astype(dtype)
                e[0] = _lat_plane_add(e[0], coeffs.c_b, 2, tf_zlo - 1,
                                      hy_inc, ymask)
                e[0] = _lat_plane_add(e[0], coeffs.c_b, 2, tf_zhi,
                                      -hy_inc, ymask)

        if j_vals is not None:
            cb = _cells(coeffs.c_b, px, py, pz, sources.num_sources, dtype)
            e = [
                e[c].at[px, py, pz].add(
                    -(cb * j_vals[:, c]).astype(dtype), mode="drop"
                )
                for c in range(3)
            ]

        return ShardedEngineState(
            ex=e[0], ey=e[1], ez=e[2], hx=h[0], hy=h[1], hz=h[2],
            tick=tick + 1, psi_h=psi_h, psi_e=psi_e, aux_e=aux_e, aux_h=aux_h,
        )

    field_spec = P(*dims)
    spec_tree = sharded_engine_state_sharding(mesh, dims, cpml=cpml,
                                              tfsf=tfsf, dense=dense)
    state_spec = jax.tree.map(lambda s: s.spec, spec_tree)

    def _spec_for(x):
        if x is None:
            return None
        if getattr(x, "ndim", 0) == 3:
            return field_spec
        return P()

    def step(state: ShardedEngineState, coeffs, sources) -> ShardedEngineState:
        in_specs = (
            state_spec,
            jax.tree.map(_spec_for, coeffs),
            jax.tree.map(_spec_for, sources),
            {k: prof_specs[k] for k in profs},
        )
        return jax.shard_map(
            local_step,
            mesh=mesh,
            in_specs=in_specs,
            out_specs=state_spec,
            check_vma=False,
        )(state, coeffs, sources, profs)

    return step
