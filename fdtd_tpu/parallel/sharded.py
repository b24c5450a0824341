"""Domain-decomposed FDTD step: shard_map + ppermute halo exchange.

The TPU counterpart of multi-GPU domain decomposition the reference never
built (SURVEY.md §2.7, §5): the lattice is sharded over a named device mesh;
each leapfrog half-update needs a 1-cell halo in each sharded dimension,
exchanged with `jax.lax.ppermute` (neighbor passing over ICI):

- the H update's backward-difference curl of E needs E[x-1] -> each device
  receives its lower neighbor's top plane of E *before* updating H;
- the E update's forward-difference curl of the just-updated H needs
  H_next[x+1] -> each device receives its upper neighbor's bottom plane of H
  *after* the H update.

Only the two tangential components are exchanged per axis (the curl never
needs d(F_axis)/d(axis)), so halo traffic is 2 planes per sharded axis per
half-step. Non-cyclic permutes deliver zeros at the mesh edge; the true
lattice boundary condition is selected there with a `jnp.where` on the
device index, so sharded and single-device runs agree (tested in
tests/test_sharding.py).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..solver.boundary import BoundaryConditions, Dirichlet, Neumann
from ..solver.state import SimState
from ..solver.step import _cells

__all__ = ["make_sharded_step", "shard_state", "state_sharding"]


def _edge_plane_backward(f, axis, bc, comp):
    """Closure plane for the global low edge (matches step._diff_backward)."""
    shape = list(f.shape)
    shape[axis] = 1
    if isinstance(bc, Neumann):
        return jnp.full(shape, bc.alpha[comp], f.dtype)
    first = lax.slice_in_dim(f, 0, 1, axis=axis)
    return first - jnp.asarray(bc.alpha[comp], f.dtype)


def _edge_plane_forward(f, axis, bc, comp):
    """Closure plane for the global high edge (matches step._diff_forward)."""
    shape = list(f.shape)
    shape[axis] = 1
    if isinstance(bc, Neumann):
        return jnp.full(shape, bc.beta[comp], f.dtype)
    last = lax.slice_in_dim(f, -1, None, axis=axis)
    return jnp.asarray(bc.beta[comp], f.dtype) - last


def _halo_diff_backward(f, axis, axis_name, n_dev, bc, comp):
    """(f[i] - f[i-1]) with the i=0 plane taken from the lower neighbor's
    last plane (or the boundary closure on mesh-edge devices)."""
    lo = lax.slice_in_dim(f, 0, -1, axis=axis)
    hi = lax.slice_in_dim(f, 1, None, axis=axis)
    interior = hi - lo
    first = lax.slice_in_dim(f, 0, 1, axis=axis)
    if axis_name is None or n_dev == 1:
        edge = _edge_plane_backward(f, axis, bc, comp)
    else:
        last_plane = lax.slice_in_dim(f, -1, None, axis=axis)
        # send my top plane "up" the axis; device 0 receives zeros
        recv = lax.ppermute(
            last_plane, axis_name, perm=[(i, i + 1) for i in range(n_dev - 1)]
        )
        i_dev = lax.axis_index(axis_name)
        bc_edge = _edge_plane_backward(f, axis, bc, comp)
        edge = jnp.where(i_dev == 0, bc_edge, first - recv)
    return jnp.concatenate([edge, interior], axis=axis)


def _halo_diff_forward(f, axis, axis_name, n_dev, bc, comp):
    """(f[i+1] - f[i]) with the i=n-1 plane taken from the upper neighbor's
    first plane (or the boundary closure on mesh-edge devices)."""
    lo = lax.slice_in_dim(f, 0, -1, axis=axis)
    hi = lax.slice_in_dim(f, 1, None, axis=axis)
    interior = hi - lo
    last = lax.slice_in_dim(f, -1, None, axis=axis)
    if axis_name is None or n_dev == 1:
        edge = _edge_plane_forward(f, axis, bc, comp)
    else:
        first_plane = lax.slice_in_dim(f, 0, 1, axis=axis)
        # send my bottom plane "down" the axis; last device receives zeros
        recv = lax.ppermute(
            first_plane, axis_name, perm=[(i + 1, i) for i in range(n_dev - 1)]
        )
        i_dev = lax.axis_index(axis_name)
        bc_edge = _edge_plane_forward(f, axis, bc, comp)
        edge = jnp.where(i_dev == n_dev - 1, bc_edge, recv - last)
    return jnp.concatenate([interior, edge], axis=axis)


def _curl(f3, inv_dx, bc, dims, n_devs, diff):
    def d(comp, axis):
        return (
            diff(f3[comp], axis, dims[axis], n_devs[axis], bc.axis(axis), comp)
            * inv_dx[axis]
        )

    cx = d(2, 1) - d(1, 2)
    cy = d(0, 2) - d(2, 0)
    cz = d(1, 0) - d(0, 1)
    return (cx, cy, cz)


def _local_points(points, dims, n_devs, local_shape):
    """Translate global lattice points to shard-local points; out-of-shard
    points are moved past the local extent so scatter mode='drop' skips them."""
    offs = []
    for axis in range(3):
        if dims[axis] is None or n_devs[axis] == 1:
            offs.append(jnp.zeros((), jnp.int32))
        else:
            offs.append(
                (lax.axis_index(dims[axis]) * local_shape[axis]).astype(jnp.int32)
            )
    local = points - jnp.stack(offs)[None, :]
    bounds = jnp.asarray(local_shape, jnp.int32)[None, :]
    valid = jnp.all((local >= 0) & (local < bounds), axis=1)
    # force invalid rows fully out of range (positive), avoiding negative wrap
    local = jnp.where(valid[:, None], local, bounds)
    return local, valid


def make_sharded_step(
    mesh: Mesh,
    dims: Tuple[Optional[str], Optional[str], Optional[str]] = ("x", "y", None),
    *,
    inv_dx: Tuple[float, float, float],
    dt: float,
    bc: BoundaryConditions = BoundaryConditions(),
):
    """Build step(state, coeffs, sources) -> state over a sharded lattice.

    ``dims[i]`` names the mesh axis that shards lattice axis i (None =
    unsharded). State/dense-coefficient arrays must be placed with
    ``shard_state``/``state_sharding`` so shapes divide evenly.
    """
    n_devs = tuple(1 if d is None else mesh.shape[d] for d in dims)

    def local_step(state: SimState, coeffs, sources) -> SimState:
        dtype = state.ex.dtype
        local_shape = state.ex.shape
        tick = state.tick

        if sources is not None and sources.num_sources > 0:
            t = tick.astype(dtype) * jnp.asarray(dt, dtype)
            j_vals, m_vals = sources.values(t)
            pts, valid = _local_points(sources.points, dims, n_devs, local_shape)
            j_vals = jnp.where(valid[:, None], j_vals, 0)
            m_vals = jnp.where(valid[:, None], m_vals, 0)
            px, py, pz = pts[:, 0], pts[:, 1], pts[:, 2]
        else:
            j_vals = m_vals = None

        ce = _curl(state.e, inv_dx, bc, dims, n_devs, _halo_diff_backward)
        h = tuple(coeffs.d_a * state.h[c] - coeffs.d_b * ce[c] for c in range(3))
        if m_vals is not None:
            db_cells = _cells(coeffs.d_b, px, py, pz, sources.num_sources, dtype)
            h = tuple(
                h[c].at[px, py, pz].add(
                    -(db_cells * m_vals[:, c]).astype(dtype), mode="drop"
                )
                for c in range(3)
            )

        ch = _curl(h, inv_dx, bc, dims, n_devs, _halo_diff_forward)
        e = tuple(coeffs.c_a * state.e[c] + coeffs.c_b * ch[c] for c in range(3))
        if j_vals is not None:
            cb_cells = _cells(coeffs.c_b, px, py, pz, sources.num_sources, dtype)
            e = tuple(
                e[c].at[px, py, pz].add(
                    -(cb_cells * j_vals[:, c]).astype(dtype), mode="drop"
                )
                for c in range(3)
            )

        return SimState(
            ex=e[0], ey=e[1], ez=e[2], hx=h[0], hy=h[1], hz=h[2], tick=tick + 1
        )

    field_spec = P(*dims)

    def _spec_for(x):
        if x is None:
            return None
        if getattr(x, "ndim", 0) == 3:
            return field_spec
        return P()

    state_spec = SimState(
        ex=field_spec, ey=field_spec, ez=field_spec,
        hx=field_spec, hy=field_spec, hz=field_spec, tick=P(),
    )

    def step(state: SimState, coeffs, sources) -> SimState:
        in_specs = (
            state_spec,
            jax.tree.map(_spec_for, coeffs),
            jax.tree.map(_spec_for, sources),
        )
        return jax.shard_map(
            local_step,
            mesh=mesh,
            in_specs=in_specs,
            out_specs=state_spec,
            check_vma=False,
        )(state, coeffs, sources)

    return step


def state_sharding(mesh: Mesh, dims=("x", "y", None)) -> SimState:
    """NamedShardings for a SimState on ``mesh``."""
    fs = NamedSharding(mesh, P(*dims))
    r = NamedSharding(mesh, P())
    return SimState(ex=fs, ey=fs, ez=fs, hx=fs, hy=fs, hz=fs, tick=r)


def shard_state(state: SimState, mesh: Mesh, dims=("x", "y", None)) -> SimState:
    """Place a SimState onto the mesh with the FDTD layout."""
    return jax.device_put(state, state_sharding(mesh, dims))
