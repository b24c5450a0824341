"""Temporally-blocked fused kernel under shard_map: K ticks per pass per chip.

Combines the two performance pillars for BASELINE config 5: the K-step
wavefront kernel (solver/pallas_stepk.py, ~26 Gcell/s/chip at K=6) and 1-D
domain decomposition. The trick that makes them compose is a PERSISTENT
EXTENDED state: each shard's arrays carry K halo planes on both sides
(layout [halo_lo(K) | owned(nl) | halo_hi(K)]), and each pass

  1. refreshes the halos with one ppermute phase (the neighbors' outermost
     OWNED K planes — 6 fields x K planes each way over ICI),
  2. runs the unmodified K-step kernel over the whole extended array.

Validity: the level-K output at plane q depends on level-0 data within K
planes of q. Halo level-0 data is exact after the refresh, so outputs are
exact exactly on the owned region [K, nl+K) — the halo-region outputs are
garbage, and that's fine because the next pass overwrites them with the
neighbors' (exact) data before anything reads them. Redundant compute is
2K/(nl+2K) of the lattice (~2% at nl=512, K=6).

Global Neumann edges are enforced by per-shard edge-plane operands: the
first/last shards mask at extended planes K / nl+K-1; interior shards
disable the masks entirely (their extended edges are halo garbage).

Point sources are translated to extended coordinates WITHOUT clipping to
the owned region, so a source within K planes of a boundary also injects
into the neighbor's halo copy — required for the redundant recompute to
agree. The final step's post-kernel scatter targets only the owned copy
(halos are refreshed anyway).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..solver.boundary import BoundaryConditions
from ..solver.sources import SourceSet
from ..solver.state import SimState

__all__ = [
    "make_pallas_sharded_stepk",
    "extend_state",
    "collapse_state",
    "extract_slice",
]

_FIELDS = ("ex", "ey", "ez", "hx", "hy", "hz")


def _ext_axis(host: np.ndarray, n_dev: int, k: int, dim: int) -> np.ndarray:
    """Extend one array dimension to the per-shard halo layout
    [halo_lo(k) | owned(nl) | halo_hi(k)] per shard; halos start zero."""
    n = host.shape[dim]
    assert n % n_dev == 0, (n, n_dev)
    nl = n // n_dev
    nle = nl + 2 * k
    shp = list(host.shape)
    shp[dim] = n_dev * nle
    out = np.zeros(shp, host.dtype)
    src = [slice(None)] * host.ndim
    dst = [slice(None)] * host.ndim
    for d in range(n_dev):
        src[dim] = slice(d * nl, (d + 1) * nl)
        dst[dim] = slice(d * nle + k, d * nle + k + nl)
        out[tuple(dst)] = host[tuple(src)]
    return out


def _col_axis(host: np.ndarray, n_dev: int, k: int, dim: int) -> np.ndarray:
    """Inverse of _ext_axis: drop the halo slots, keep owned regions."""
    nle = host.shape[dim] // n_dev
    nl = nle - 2 * k
    idx = [slice(None)] * host.ndim
    parts = []
    for d in range(n_dev):
        idx[dim] = slice(d * nle + k, d * nle + k + nl)
        parts.append(host[tuple(idx)])
    return np.concatenate(parts, axis=dim)


def extend_state(
    state: SimState, mesh: Mesh, k: int, axis: str = "x",
    axes: Optional[Tuple[str, ...]] = None,
) -> SimState:
    """Global (nx, ny, nz) state -> extended sharded layout. ``axes``
    names the decomposed mesh axes in lattice-dimension order (("x",) or
    ("x", "y")); each decomposed lattice dimension becomes n_dev*(nl+2k)
    with k halo slots per side per shard. Halos start zero; the first
    pass refreshes them before any compute reads them."""
    axes = axes if axes is not None else (axis,)
    spec = [None, None, None]
    for dim, name in enumerate(axes):
        spec[dim] = name

    def ext(f):
        host = np.asarray(f)
        for dim, name in enumerate(axes):
            host = _ext_axis(host, mesh.shape[name], k, dim)
        return jnp.asarray(host)

    new = SimState(
        **{name: ext(getattr(state, name)) for name in _FIELDS},
        tick=state.tick,
    )
    fs = NamedSharding(mesh, P(*spec))
    r = NamedSharding(mesh, P())
    return jax.device_put(
        new, SimState(**{n: fs for n in _FIELDS}, tick=r)
    )


def collapse_state(
    state_ext: SimState, mesh: Mesh, k: int, axis: str = "x",
    axes: Optional[Tuple[str, ...]] = None,
) -> SimState:
    """Extended sharded layout -> plain global state (host round-trip)."""
    axes = axes if axes is not None else (axis,)

    def col(f):
        host = np.asarray(f)
        for dim, name in enumerate(axes):
            host = _col_axis(host, mesh.shape[name], k, dim)
        return jnp.asarray(host)

    return SimState(
        **{name: col(getattr(state_ext, name)) for name in _FIELDS},
        tick=state_ext.tick,
    )


def extract_slice(
    state_ext: SimState,
    mesh: Mesh,
    k: int,
    nl: int,
    axis: int,
    index: int,
    component: str = "e",
    mesh_axis: str = "x",
) -> jax.Array:
    """Live slice extraction from the EXTENDED sharded layout, on device —
    BASELINE config 5's observation path (the analog of the reference's
    staged Field readback, cem-solver/src/fdtd/wgpu/mod.rs:451-578, but
    without collapsing or copying the full lattice).

    Returns the (3, n_a, n_b) GLOBAL lattice plane ``axis = index`` of the
    E or H field. Halo planes are skipped: each shard contributes only its
    owned region. For axis 0 the owner shard's plane is psum-broadcast; for
    axes 1/2 the per-shard strips concatenate along the sharded x axis.
    Jittable; only the final plane crosses to the host.
    """
    n_dev = mesh.shape[mesh_axis]
    names = ("ex", "ey", "ez") if component == "e" else ("hx", "hy", "hz")
    fields = tuple(getattr(state_ext, n) for n in names)

    def local(f3):
        idx = lax.axis_index(mesh_axis)
        owned = tuple(f[k: k + nl] for f in f3)
        if axis == 0:
            d = index // nl
            loc = index - d * nl
            planes = tuple(
                jnp.where(idx == d, lax.index_in_dim(f, loc, 0, keepdims=False), 0)
                for f in owned
            )
            return jnp.stack([lax.psum(p, mesh_axis) for p in planes])
        return jnp.stack(
            [lax.index_in_dim(f, index, axis, keepdims=False) for f in owned]
        )

    out_spec = P() if axis == 0 else P(None, mesh_axis, None)
    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=((P(mesh_axis, None, None),) * 3,),
        out_specs=out_spec,
        check_vma=False,
    )(fields)


def make_pallas_sharded_stepk(
    mesh: Mesh,
    k_steps: int,
    nl: int,
    *,
    inv_dx: Tuple[float, float, float],
    dt: float,
    bc: BoundaryConditions = BoundaryConditions(),
    max_sources: int = 8,
    interpret: bool = False,
    dtype=jnp.float32,
    with_m: bool = False,
    nl_y: Optional[int] = None,
):
    """Build step(state_ext, coeffs, sources) advancing ``k_steps`` ticks on
    an extended sharded state (see extend_state). ``nl`` is the owned plane
    count per shard along x; coeffs must be uniform scalars.

    ``nl_y`` switches on 2-D ("x", "y") decomposition: the state is then
    extended along BOTH lattice dims (axes=("x", "y")), with ``nl_y`` owned
    lateral columns per shard. The kernel needs no in-plane tiling for
    this — the lateral halo columns are physically present in the extended
    layout, so the in-plane rolls read correct neighbor data; only the
    global Neumann edge masks become runtime per-shard lateral coordinates
    (sentinels on interior shards). Halo exchange is two ordered ppermute
    phases: lateral (y) first on owned columns, then x on FULL lateral
    width — the x phase ships the just-refreshed lateral halos along, which
    is what makes the corner regions (needed by the level-k redundant
    recompute across both cut directions) exact."""
    from ..solver.pallas_stepk import _build_call, build_src_rows, supports_k

    axis = "x"
    n_dev = mesh.shape[axis]
    k = k_steps
    nle = nl + 2 * k
    two_d = nl_y is not None
    n_dy = mesh.shape["y"] if two_d else 1
    nly = nl_y if two_d else 0

    def local_step(state: SimState, coeffs, sources) -> SimState:
        ny, nz = state.ex.shape[1:]
        shape_ext = (nle, ny, nz)
        if not supports_k(shape_ext, bc, k, dtype=dtype):
            raise ValueError(f"unsupported extended shape {shape_ext}")
        idx = lax.axis_index(axis)

        up = [(i, i + 1) for i in range(n_dev - 1)]
        down = [(i + 1, i) for i in range(n_dev - 1)]
        if two_d:
            idx_y = lax.axis_index("y")
            up_y = [(i, i + 1) for i in range(n_dy - 1)]
            down_y = [(i + 1, i) for i in range(n_dy - 1)]

        fields = {}
        for name in _FIELDS:
            f = getattr(state, name)
            if two_d:
                # phase 1: lateral halo columns from the y neighbors'
                # outermost OWNED columns (full x extent; the x-halo rows
                # of what arrives are stale, overwritten by phase 2)
                recv_lo = lax.ppermute(f[:, nly: nly + k], "y", up_y)
                recv_hi = lax.ppermute(f[:, k: 2 * k], "y", down_y)
                f = f.at[:, 0:k].set(recv_lo)
                f = f.at[:, nly + k:].set(recv_hi)
            # phase 2: my outermost OWNED planes -> x neighbors' halos, at
            # full lateral width (fresh lateral halos cover the corners)
            recv_lo = lax.ppermute(f[nl: nl + k], axis, up)  # from below
            recv_hi = lax.ppermute(f[k: 2 * k], axis, down)  # from above
            f = f.at[0:k].set(recv_lo)
            f = f.at[nl + k:].set(recv_hi)
            fields[name] = f

        # per-shard global-edge coordinates (disable with sentinels off
        # the grid); row layout [x_lo, x_hi, y_lo, y_hi, z_lo, z_hi]
        big = 2**30
        lo_edge = jnp.where(idx == 0, k, -big)
        hi_edge = jnp.where(idx == n_dev - 1, nl + k - 1, big)
        if two_d:
            y_lo = jnp.where(idx_y == 0, k, -big)
            y_hi = jnp.where(idx_y == n_dy - 1, nly + k - 1, big)
        else:
            y_lo, y_hi = jnp.int32(0), jnp.int32(ny - 1)
        edges = jnp.stack(
            [lo_edge, hi_edge, y_lo, y_hi, jnp.int32(0), jnp.int32(nz - 1)]
        ).astype(jnp.int32).reshape(1, 6)

        row = jnp.stack(
            [
                jnp.asarray(coeffs.c_a, jnp.float32),
                jnp.asarray(coeffs.c_b, jnp.float32),
                jnp.asarray(coeffs.d_a, jnp.float32),
                jnp.asarray(coeffs.d_b, jnp.float32),
            ]
        ).reshape(1, 4)

        # global -> extended-local offsets; halo copies included (the shared
        # builder does NOT clip, which is exactly what the redundant
        # recompute needs)
        src_rows = build_src_rows(
            sources, state.tick, k, max_sources, with_m, dt,
            x_offset=(-idx * nl + k).astype(jnp.float32),
            y_offset=(
                (-idx_y * nly + k).astype(jnp.float32) if two_d else 0
            ),
        )

        call = _build_call(
            shape_ext, tuple(float(v) for v in inv_dx), max_sources, k,
            interpret, jnp.dtype(dtype).name, 1, with_m,
        )
        outs = call(
            row, src_rows, edges,
            fields["ex"], fields["ey"], fields["ez"],
            fields["hx"], fields["hy"], fields["hz"],
            fields["ey"], fields["ez"],
        )
        e = list(outs[0:3])
        h = outs[3:6]

        # final-step J scatter into the owned region only
        if sources is not None and sources.num_sources > 0:
            t = (state.tick + k - 1).astype(jnp.float32) * jnp.float32(dt)
            j, _ = sources.values(t)
            px = sources.points[:, 0] - idx * nl + k
            owned = jnp.logical_and(px >= k, px < nl + k)
            px = jnp.where(owned, px, nle)  # drop out-of-owned rows
            py, pz = sources.points[:, 1], sources.points[:, 2]
            if two_d:
                py = py - idx_y * nly + k
                owned_y = jnp.logical_and(py >= k, py < nly + k)
                py = jnp.where(owned_y, py, ny)  # drop out-of-owned rows
            cb = jnp.full((sources.num_sources,), coeffs.c_b, dtype)
            for c in range(3):
                e[c] = e[c].at[px, py, pz].add(
                    -(cb * j[:, c]).astype(dtype), mode="drop"
                )

        return SimState(
            ex=e[0], ey=e[1], ez=e[2], hx=h[0], hy=h[1], hz=h[2],
            tick=state.tick + k,
        )

    field_spec = P(axis, "y", None) if two_d else P(axis, None, None)
    state_spec = SimState(**{n: field_spec for n in _FIELDS}, tick=P())

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
