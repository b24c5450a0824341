"""The Yee leapfrog update — pure-JAX reference path.

Implements exactly the reference's update equations and stencil conventions
(cem-solver/src/fdtd/cpu/mod.rs:412-516, cpu/util.rs:139-194,
fdtd/wgpu/update.wgsl:56-129):

  1. H_next = D_a * H_prev + D_b * (-curl_b(E_prev) - M_src)
  2. E_next = C_a * E_prev + C_b * (+curl_f(H_NEXT) - J_src)

where curl_b uses *backward* differences (E is staggered +(.5,.5,.5) relative
to H) and curl_f uses *forward* differences of the just-updated H. Boundary
closure per fdtd/boundary_condition.rs (default: zero difference).

Field components are separate (nx, ny, nz) arrays (see state.py for the
TPU layout rationale). This path is the correctness twin of the Pallas
kernels in pallas_step.py, which must match it at f32 on identical inputs.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .boundary import BoundaryConditions, Dirichlet, Neumann
from .sources import SourceSet
from .state import SimState

__all__ = [
    "CellCoefficients",
    "step",
    "step_fn",
    "curl_backward",
    "curl_forward",
    "divergence",
    "field_energy",
]


class CellCoefficients(NamedTuple):
    """Per-cell update coefficients, each broadcastable against (nx, ny, nz).

    Scalars for uniform media (the fast path: no coefficient memory traffic),
    dense (nx, ny, nz) arrays, or arrays gathered per step from a compressed
    material-index buffer (from_table)."""

    c_a: jax.Array
    c_b: jax.Array
    d_a: jax.Array
    d_b: jax.Array

    @classmethod
    def uniform(cls, row, dtype=jnp.float32) -> "CellCoefficients":
        c_a, c_b, d_a, d_b = (jnp.asarray(v, dtype) for v in row)
        return cls(c_a, c_b, d_a, d_b)

    @classmethod
    def from_table(cls, table: jax.Array, matid: jax.Array) -> "CellCoefficients":
        """Gather dense coefficients from a (K, 4) table by per-cell index.

        Implements the compressed material-index buffer
        (/root/reference/README.md:25-28). Under jit the gather fuses into
        the update; for K == 1 prefer ``uniform``."""
        idx = matid.astype(jnp.int32)
        return cls(
            c_a=jnp.take(table[:, 0], idx),
            c_b=jnp.take(table[:, 1], idx),
            d_a=jnp.take(table[:, 2], idx),
            d_b=jnp.take(table[:, 3], idx),
        )


def _diff_backward(f: jax.Array, axis: int, bc, comp: int) -> jax.Array:
    """(f[i] - f[i-1]) along ``axis`` with the low-edge plane closed by bc.

    Returns the raw difference; the 1/dx is applied by the caller (matching
    cpu/util.rs:193 where apply_df's result is divided by dx afterwards)."""
    lo = jax.lax.slice_in_dim(f, 0, -1, axis=axis)
    hi = jax.lax.slice_in_dim(f, 1, None, axis=axis)
    interior = hi - lo
    edge_shape = list(f.shape)
    edge_shape[axis] = 1
    if isinstance(bc, Neumann):
        # missing f[-1]: difference := alpha (boundary_condition.rs:30-36)
        edge = jnp.full(edge_shape, bc.alpha[comp], f.dtype)
    elif isinstance(bc, Dirichlet):
        # missing f[-1] := alpha, difference = f[0] - alpha (:16-20)
        first = jax.lax.slice_in_dim(f, 0, 1, axis=axis)
        edge = first - jnp.asarray(bc.alpha[comp], f.dtype)
    else:
        raise TypeError(f"unknown boundary condition {bc!r}")
    return jnp.concatenate([edge, interior], axis=axis)


def _diff_forward(f: jax.Array, axis: int, bc, comp: int) -> jax.Array:
    """(f[i+1] - f[i]) along ``axis`` with the high-edge plane closed by bc."""
    lo = jax.lax.slice_in_dim(f, 0, -1, axis=axis)
    hi = jax.lax.slice_in_dim(f, 1, None, axis=axis)
    interior = hi - lo
    edge_shape = list(f.shape)
    edge_shape[axis] = 1
    if isinstance(bc, Neumann):
        edge = jnp.full(edge_shape, bc.beta[comp], f.dtype)
    elif isinstance(bc, Dirichlet):
        last = jax.lax.slice_in_dim(f, -1, None, axis=axis)
        edge = jnp.asarray(bc.beta[comp], f.dtype) - last
    else:
        raise TypeError(f"unknown boundary condition {bc!r}")
    return jnp.concatenate([interior, edge], axis=axis)


def _curl(f3, inv_dx, bc: BoundaryConditions, diff):
    """curl of a (fx, fy, fz) component tuple -> (cx, cy, cz).

    curl = (dFz/dy - dFy/dz, dFx/dz - dFz/dx, dFy/dx - dFx/dy),
    the antisymmetric part of the Jacobian (cpu/util.rs:126-132)."""

    def d(comp: int, axis: int) -> jax.Array:
        return diff(f3[comp], axis, bc.axis(axis), comp) * inv_dx[axis]

    cx = d(2, 1) - d(1, 2)
    cy = d(0, 2) - d(2, 0)
    cz = d(1, 0) - d(0, 1)
    return (cx, cy, cz)


def curl_backward(f3, inv_dx, bc: BoundaryConditions):
    """Backward-difference curl (curl E in the H update: dx0 = (1,1,1),
    dx1 = 0 in cpu/mod.rs:436-438; dedi in update.wgsl:155-165)."""
    return _curl(f3, inv_dx, bc, _diff_backward)


def curl_forward(f3, inv_dx, bc: BoundaryConditions):
    """Forward-difference curl (curl H in the E update: dx0 = 0,
    dx1 = (1,1,1) in cpu/mod.rs:478-480; dhdi in update.wgsl:167-177)."""
    return _curl(f3, inv_dx, bc, _diff_forward)




def _cells(coef, px, py, pz, n, dtype):
    """Per-source-cell coefficient values without materializing a full-lattice
    broadcast (a scalar broadcast_to + gather costs a 512^3 temp otherwise)."""
    if jnp.ndim(coef) == 0:
        return jnp.full((n,), coef, dtype)
    return coef[px, py, pz]

def step_fn(
    *,
    inv_dx: Tuple[float, float, float],
    dt: float,
    bc: BoundaryConditions = BoundaryConditions(),
):
    """Build the pure step(state, coeffs, sources) -> state function."""

    def _step(
        state: SimState,
        coeffs: CellCoefficients,
        sources: Optional[SourceSet],
    ) -> SimState:
        dtype = state.ex.dtype
        shape = state.ex.shape
        tick = state.tick

        # Sources are evaluated at the PRE-step simulation time
        # (cem-app/src/solver/runner.rs:520-527).
        if sources is not None and sources.num_sources > 0:
            t = tick.astype(dtype) * jnp.asarray(dt, dtype)
            j_vals, m_vals = sources.values(t)
            px, py, pz = (
                sources.points[:, 0],
                sources.points[:, 1],
                sources.points[:, 2],
            )
        else:
            j_vals = m_vals = None

        # --- H update: h = D_a*h + D_b*(-curl_b(e) - M) ------------------
        ce = curl_backward(state.e, inv_dx, bc)
        h = tuple(coeffs.d_a * state.h[c] - coeffs.d_b * ce[c] for c in range(3))
        if m_vals is not None:
            db_cells = _cells(coeffs.d_b, px, py, pz, sources.num_sources, dtype)
            h = tuple(
                h[c].at[px, py, pz].add(
                    -(db_cells * m_vals[:, c]).astype(dtype), mode="drop"
                )
                for c in range(3)
            )

        # --- E update: e = C_a*e + C_b*(curl_f(h_NEXT) - J) --------------
        ch = curl_forward(h, inv_dx, bc)
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

    return _step


@partial(jax.jit, static_argnames=("bc", "inv_dx", "dt"), donate_argnums=(0,))
def step(
    state: SimState,
    coeffs: CellCoefficients,
    sources: Optional[SourceSet],
    *,
    inv_dx: Tuple[float, float, float],
    dt: float,
    bc: BoundaryConditions = BoundaryConditions(),
) -> SimState:
    """One full leapfrog tick, jitted standalone; inside lax.scan use
    step_fn() to avoid re-tracing."""
    return step_fn(inv_dx=inv_dx, dt=dt, bc=bc)(state, coeffs, sources)


def divergence(f3, inv_dx, bc: BoundaryConditions, forward: bool = True):
    """div F via the matching one-sided differences (Jacobian trace,
    cpu/util.rs:134-136). Physics invariant: free-space FDTD preserves
    div B = 0 exactly (to rounding) away from sources."""
    diff = _diff_forward if forward else _diff_backward
    return sum(diff(f3[i], i, bc.axis(i), i) * inv_dx[i] for i in range(3))


def field_energy(state: SimState, eps, mu, cell_volume: float) -> jax.Array:
    """Total EM energy 0.5 * sum(eps*|E|^2 + mu*|H|^2) * dV, the invariant
    the reference only sketches in comments (cpu/mod.rs:463-466, 505-508)."""
    ee = sum(jnp.sum(eps * (c * c)) for c in state.e)
    hh = sum(jnp.sum(mu * (c * c)) for c in state.h)
    return 0.5 * (ee + hh) * cell_volume
