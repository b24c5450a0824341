"""FEEC/DEC leapfrog solver on simplicial meshes (triangles AND tets).

Counterpart (and correction) of the reference's WIP FEEC solver
(cem-solver/src/feec/cpu/mod.rs:31-82 + the operator-less volume-mesh
skeleton, feec/simplex/volume_mesh.rs:1-45): E lives on primal edges
(integrated along the edge), B on primal faces (integrated flux). The
update is the discrete-exterior-calculus leapfrog

    b <- b - dt * (d1 @ e)                                  (Faraday)
    e <- e + dt/eps * star1^-1 @ d1^T @ (star2 @ b / mu) - dt * j   (Ampere)

with diagonal Hodge stars star1/star2 from the mesh — any mesh exposing
(d1, star1, star2) works, so the same solver runs 2-D TriMesh and 3-D
TetMesh cavities. star1^-1 (NOT star1) makes the semi-discrete system
exactly conserve 0.5 (eps e^T star1 e + mu^-1 b^T star2 b): d1^T is then
the adjoint of d1 under the star inner products and dE/dt telescopes to
zero. Unlike the reference (which sums boundary/coboundary fields without
orientation signs and never sets dt), d1 here is SIGNED, the stars come
from mesh geometry, and stability/energy behavior is tested (tet-cavity
eigenfrequencies vs analytic, tests/test_feec.py).

``pec_edges`` pins tangential E on the listed edges to zero each step
(perfect-conductor cavity walls).

TPU-first: the incidence operators are dense f32 matrices, so each step is
two matmuls on the MXU — the right primitive for this hardware at the mesh
sizes a surface solver sees.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .mesh import TriMesh

__all__ = ["FeecState", "FeecSimulation"]


class FeecState(NamedTuple):
    e: jax.Array  # (ne,) edge-integrated electric field
    b: jax.Array  # (nf,) face-integrated magnetic flux
    tick: jax.Array


@dataclasses.dataclass(frozen=True)
class FeecSimulation:
    """Immutable FEEC setup; sources are (edge_index, waveform) pairs."""

    mesh: TriMesh  # or TetMesh — anything with (d1, star1, star2)
    dt: float
    eps: float = 1.0
    mu: float = 1.0
    sources: Tuple[Tuple[int, object], ...] = ()
    pec_edges: Optional[Tuple[int, ...]] = None
    # "diagonal": barycentric DEC stars (vectors). "whitney": Galerkin
    # Hodge via Whitney mass matrices (TetMesh only) — the consistent
    # choice for 3-D cavity physics (see tetmesh.whitney_masses).
    hodge: str = "diagonal"

    def init(self, dtype=jnp.float32) -> FeecState:
        return FeecState(
            e=jnp.zeros(self.mesh.num_edges, dtype),
            b=jnp.zeros(self.mesh.num_faces, dtype),
            tick=jnp.zeros((), jnp.int32),
        )

    def _interior_idx(self) -> np.ndarray:
        mask = np.ones(self.mesh.num_edges, bool)
        if self.pec_edges is not None:
            mask[np.asarray(self.pec_edges, np.int64)] = False
        return np.flatnonzero(mask)

    def _hodge_ops(self):
        """(h1inv, h2) as either vectors (diagonal) or dense matrices
        (whitney). h1inv for whitney is the INTERIOR-block inverse of M1
        scattered back to full size — inverting the constrained block, not
        masking the full inverse, is what keeps PEC rows exactly zero."""
        if self.hodge == "whitney":
            m1, m2 = self.mesh.whitney_masses()
            idx = self._interior_idx()
            inv_blk = np.linalg.inv(m1[np.ix_(idx, idx)])
            h1inv = np.zeros_like(m1)
            h1inv[np.ix_(idx, idx)] = inv_blk
            return h1inv, m2
        if self.hodge != "diagonal":
            raise ValueError(f"unknown hodge {self.hodge!r}")
        return 1.0 / self.mesh.star1, self.mesh.star2

    def max_stable_dt(self) -> float:
        """Largest stable leapfrog dt = 2/sqrt(lambda_max) of the discrete
        curl-curl operator."""
        h1inv, h2 = self._hodge_ops()
        d1 = self.mesh.d1
        upd = d1.T @ (h2 @ d1 if h2.ndim == 2 else h2[:, None] * d1)
        a = (h1inv @ upd if h1inv.ndim == 2 else h1inv[:, None] * upd)
        a = a / (self.eps * self.mu)
        lam = np.max(np.abs(np.linalg.eigvals(a)).real)
        return float(2.0 / np.sqrt(lam))

    def step_fn(self, dtype=jnp.float32):
        d1 = jnp.asarray(self.mesh.d1, dtype)
        h1inv_np, h2_np = self._hodge_ops()
        h2 = jnp.asarray(h2_np, dtype)
        h1 = jnp.asarray(h1inv_np, dtype)
        # plain python float: a strong-typed np.float64 dt would promote
        # the f32 carry inside scan
        dt = float(self.dt)
        inv_eps = 1.0 / self.eps
        inv_mu = 1.0 / self.mu
        src_edges = jnp.asarray([s[0] for s in self.sources], jnp.int32)
        waveforms = tuple(s[1] for s in self.sources)
        if self.pec_edges is not None:
            pec_mask = np.ones(self.mesh.num_edges, bool)
            pec_mask[np.asarray(self.pec_edges, np.int64)] = False
            interior = jnp.asarray(pec_mask, dtype)  # 1 interior, 0 on PEC
        else:
            interior = None

        def apply(op, x):
            if op.ndim == 2:
                return jnp.dot(op, x, preferred_element_type=dtype)
            return op * x

        def step(state: FeecState) -> FeecState:
            e, b, tick = state
            # Faraday: db/dt = -curl e (exact, metric-free)
            b = b - dt * jnp.dot(d1, e, preferred_element_type=dtype)
            # Ampere: de/dt = eps^-1 * star1^-1 * d1^T * (mu^-1 * star2 * b)
            h_flux = inv_mu * apply(h2, b)
            e = e + dt * inv_eps * apply(
                h1, jnp.dot(d1.T, h_flux, preferred_element_type=dtype)
            )
            if waveforms:
                t = tick.astype(dtype) * jnp.asarray(dt, dtype)
                vals = jnp.stack([w(t).astype(dtype) for w in waveforms])
                e = e.at[src_edges].add(-dt * inv_eps * vals)
            if interior is not None:
                e = e * interior  # tangential E = 0 on PEC walls
            return FeecState(e=e, b=b, tick=tick + 1)

        return step

    def run(self, state: FeecState, n_steps: int) -> FeecState:
        step = self.step_fn(state.e.dtype)

        def body(s, _):
            return step(s), None

        return jax.lax.scan(body, state, None, length=n_steps)[0]

    def energy(self, state: FeecState) -> jax.Array:
        """Discrete EM energy 0.5 (eps e^T *1 e + mu^-1 b^T *2 b) — the
        quadratic form the semi-discrete update conserves exactly (and the
        leapfrog conserves up to O(dt^2) oscillation)."""
        e = state.e.astype(jnp.float32)
        b = state.b.astype(jnp.float32)
        if self.hodge == "whitney":
            m1, m2 = self.mesh.whitney_masses()
            ee = self.eps * e @ jnp.asarray(m1, jnp.float32) @ e
            bb = (1.0 / self.mu) * b @ jnp.asarray(m2, jnp.float32) @ b
        else:
            ee = jnp.sum(self.eps * jnp.asarray(self.mesh.star1, jnp.float32)
                         * e ** 2)
            bb = jnp.sum((1.0 / self.mu)
                         * jnp.asarray(self.mesh.star2, jnp.float32) * b ** 2)
        return 0.5 * (ee + bb)
