"""High-level simulation driver: scan-based time loop with probe streaming.

Counterpart of the reference's solver lifecycle
(SolverBackend -> SolverInstance -> State -> UpdatePass,
cem-solver/src/lib.rs:28-95) re-shaped for XLA: a ``Simulation`` bundles the
static configuration (grid, coefficients, sources, boundaries), ``init()``
makes the state pytree, and ``run(state, n)`` executes a fused
``lax.scan`` over n ticks — one compiled program for the whole run instead
of the reference's submit-and-block-per-tick loop
(cem-solver/src/fdtd/wgpu/mod.rs:98-107).

Two kinds of on-device measurement ride the scan:

- **probes**: ``sample(state, dt) -> pytree``, sampled every ``probe_every``
  ticks and stacked along a leading time axis (counterpart of Field/FieldView
  readback, cem-solver/src/lib.rs:97-136, without per-tick host round-trips).
- **accumulators**: ``init(state, dt)`` / ``update(acc, state, dt)`` carried
  through the scan — running DFTs, energy integrals, etc. (a capability the
  reference lacks; BASELINE config 3 requires DFT cross-section probes).
"""

from __future__ import annotations

import dataclasses
from functools import cached_property, lru_cache, partial
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..grid import Grid
from .boundary import BoundaryConditions
from .sources import SourceSet
from .state import SimState, zero_state
from .step import CellCoefficients, step_fn

__all__ = ["Simulation"]


@dataclasses.dataclass(frozen=True)
class Simulation:
    """Immutable simulation setup; all methods are pure."""

    grid: Grid
    coeffs: CellCoefficients
    sources: Optional[SourceSet] = None
    bc: BoundaryConditions = BoundaryConditions()
    dtype: Any = jnp.float32
    # Optional CPML absorber (see cpml.py); None = plain Neumann edges.
    cpml: Any = None
    # Optional TF/SF plane-wave source (see tfsf.py).
    tfsf: Any = None
    # "auto" uses the fused Pallas kernel on TPU when the configuration
    # allows (uniform scalar coefficients or a compressed material table,
    # Neumann(0) edges, no CPML/TFSF, J-only sources); "xla" forces the
    # reference path; "pallas" asserts.
    backend: str = "auto"
    # Optional volumetric per-cell PML region (solver/pml_region.py):
    # arbitrary-shape absorbers anywhere in the domain. XLA-engine only.
    dense_pml: Any = None
    # compressed-material mode: per-cell uint8/uint16 index + (K, 4) table.
    # When set, the Pallas kernels stream the 1 B/cell index instead of
    # dense coefficients (coeffs should still hold the gathered dense form
    # for the XLA fallback, e.g. CellCoefficients.from_table).
    matid: Any = None
    table: Any = None

    # -- construction -------------------------------------------------------

    @cached_property
    def _dense_kernel(self):
        """dense_pml tile-aligned for the kernel paths (identity-padded
        lateral extents), or None when absent/unalignable."""
        if self.dense_pml is None:
            return None
        from .pml_region import pad_dense_to_tiles

        try:
            return pad_dense_to_tiles(self.dense_pml, self.grid.shape)
        except ValueError:
            return None

    def init(self) -> SimState:
        if self._cpml_kernel_eligible():
            from .pallas_cpml import init_pml_kernel_state

            return init_pml_kernel_state(
                self.grid.shape, self.dtype, cpml=self._cpml_or_empty,
                tfsf=self._tfsf_slab, dense=self._dense_kernel,
            )
        if (self.cpml is not None or self.tfsf is not None
                or self.dense_pml is not None):
            from .engine import init_engine_state

            return init_engine_state(
                self.grid.shape, self.dtype, cpml=self.cpml, tfsf=self.tfsf,
                dense=self.dense_pml,
            )
        return zero_state(self.grid.shape, self.dtype)

    @property
    def _n_materials(self) -> int:
        return 0 if self.table is None else int(self.table.shape[0])

    def _pallas_eligible(self) -> bool:
        import jax

        from .pallas_step import supports

        if (self.cpml is not None or self.tfsf is not None
                or self.dense_pml is not None):
            return False
        if jax.default_backend() != "tpu":
            return False
        if not supports(self.grid.shape, self.bc, dtype=self.dtype):
            return False
        if self.matid is not None:
            # compressed-material mode: uint8 planes need ny % 32 == 0 and
            # at most 256 materials
            if self.grid.shape[1] % 32 != 0 or self._n_materials > 256:
                return False
        elif self.coeffs is None or any(jnp.ndim(c) != 0 for c in self.coeffs):
            # dense per-cell coefficients without an index buffer: XLA path
            return False
        return True

    def _cpml_kernel_eligible(self) -> bool:
        """Absorbing runs dispatch to the in-kernel CPML Pallas kernel
        (solver/pallas_cpml.py, ~3.5x the XLA engine) when the config fits:
        TPU, f32/bf16 storage, uniform scalar coefficients, Neumann(0)
        edges, slab (not box) TF/SF. J and M sources both inject
        in-kernel. TF/SF-only and dense-region-only runs (no boundary
        CPML) ride the same kernel with an empty absorber
        (_cpml_or_empty)."""
        import jax

        from .pallas_cpml import supports_cpml

        if (self.cpml is None and self.tfsf is None
                and self.dense_pml is None) or self.backend == "xla":
            return False
        if self.dense_pml is not None:
            # volumetric per-cell regions ride the kernels when the box
            # tile-aligns (auto identity-padded) and stays clear of the
            # boundary slabs along its axis; otherwise the XLA engine
            d = self._dense_kernel
            if d is None:
                return False
            if d.axis in set(self._cpml_or_empty.active_axes()):
                (b0, b1) = d.box[d.axis]
                lo_t, hi_t = self._cpml_or_empty.thickness[d.axis]
                if b0 < lo_t or b1 > self.grid.shape[d.axis] - hi_t:
                    return False
        # ObliqueTfsf (analytic incident) rides BOTH CPML kernels since
        # round 4 (correction volumes precomputed per pass, added
        # in-kernel; pallas_cpml.py / pallas_cpml_k.py ``oblique=``) —
        # only the gb/blocked/sharded tiers exclude it (see _tfsf_oblique)
        if jax.default_backend() != "tpu":
            return False
        if self.matid is not None:
            # compressed-material CPML kernel: uint8 planes need ny % 32
            if self.grid.shape[1] % 32 != 0 or self._n_materials > 256:
                return False
        elif self.coeffs is None or any(jnp.ndim(c) != 0 for c in self.coeffs):
            return False
        return supports_cpml(self.grid.shape, self.bc, self._cpml_or_empty,
                             self.dtype)

    @property
    def _tfsf_slab(self):
        """self.tfsf when it is the aux-grid (slab/box) kind, else None."""
        if self.tfsf is None or hasattr(self.tfsf, "span"):
            return self.tfsf
        return None

    @property
    def _tfsf_oblique(self):
        """self.tfsf when it is an ObliqueTfsf, else None."""
        if self.tfsf is None or hasattr(self.tfsf, "span"):
            return None
        return self.tfsf

    @property
    def _cpml_or_empty(self):
        """TF/SF-only runs ride the CPML kernel with an empty absorber."""
        if self.cpml is not None:
            return self.cpml
        from .cpml import Cpml

        return Cpml(thickness=((0, 0), (0, 0), (0, 0)))

    def _has_m_sources(self) -> bool:
        if self.sources is None or self.sources.num_sources == 0:
            return False
        import numpy as np

        return bool(np.any(np.asarray(self.sources.m_amp) != 0))

    def _wrap_lazy_coeffs(self, base):
        """When compiled scenes carry only (matid, table), gather the dense
        coefficients INSIDE the traced step (XLA fuses the gather; nothing
        dense stays resident in HBM)."""
        if self.coeffs is not None:
            return base
        if self.matid is None or self.table is None:
            raise ValueError("Simulation needs coeffs or (matid, table)")
        table = jnp.asarray(self.table, self.dtype)
        mid = jnp.asarray(self.matid)

        def step(state, coeffs, sources):
            cc = CellCoefficients.from_table(table, mid)
            return base(state, cc, sources)

        return step

    @cached_property
    def _step(self):
        inv_dx = tuple(1.0 / d for d in self.grid.dx)
        if self._cpml_kernel_eligible():
            from .pallas_cpml import pallas_cpml_step_fn

            n_src = self.sources.num_sources if self.sources is not None else 0
            with_m = self._has_m_sources()
            if self.matid is not None:
                kernel = pallas_cpml_step_fn(
                    self.grid.shape, inv_dx=inv_dx, dt=self.grid.dt,
                    bc=self.bc, constants=self.grid.constants,
                    cpml=self._cpml_or_empty, tfsf=self._tfsf_slab,
                    oblique=self._tfsf_oblique,
                    max_sources=n_src, matid=jnp.asarray(self.matid),
                    n_materials=self._n_materials, with_m=with_m,
                    dtype=self.dtype, dense=self._dense_kernel,
                )
                table = jnp.asarray(self.table, jnp.float32)

                def step(state, coeffs, sources):
                    return kernel(state, table, sources)

                return step
            return pallas_cpml_step_fn(
                self.grid.shape, inv_dx=inv_dx, dt=self.grid.dt, bc=self.bc,
                constants=self.grid.constants, cpml=self._cpml_or_empty,
                tfsf=self._tfsf_slab, oblique=self._tfsf_oblique,
                max_sources=n_src, with_m=with_m,
                dtype=self.dtype, dense=self._dense_kernel,
            )
        if self.backend == "pallas" and (
            self.cpml is not None or self.tfsf is not None
        ):
            raise ValueError(
                "backend='pallas' with CPML/TFSF needs the in-kernel CPML "
                "configuration (TPU, f32, uniform scalar coefficients, "
                "Neumann(0) edges, slab TF/SF); this setup falls back to "
                "the XLA engine — use backend='auto'"
            )
        if (self.cpml is not None or self.tfsf is not None
                or self.dense_pml is not None):
            from .engine import build_step

            return self._wrap_lazy_coeffs(
                build_step(
                    self.grid.shape,
                    inv_dx=inv_dx,
                    dt=self.grid.dt,
                    bc=self.bc,
                    constants=self.grid.constants,
                    dtype=self.dtype,
                    cpml=self.cpml,
                    tfsf=self.tfsf,
                    dense=self.dense_pml,
                )
            )
        if (
            self.backend in ("auto", "pallas")
            and self._pallas_eligible()
            # the single-step kernel applies J post-hoc and has no M path;
            # M-source runs use the XLA step (or the K-step kernel in run())
            and not self._has_m_sources()
        ):
            from .pallas_step import pallas_step_fn

            if self.matid is not None:
                kernel = pallas_step_fn(
                    self.grid.shape, inv_dx=inv_dx, dt=self.grid.dt,
                    bc=self.bc, dtype=self.dtype,
                    matid=jnp.asarray(self.matid),
                    n_materials=self._n_materials,
                )
                table = jnp.asarray(self.table, jnp.float32)

                def step(state, coeffs, sources):
                    return kernel(state, table, sources)

                return step
            return pallas_step_fn(
                self.grid.shape, inv_dx=inv_dx, dt=self.grid.dt, bc=self.bc,
                dtype=self.dtype,
            )
        if self.backend == "pallas":
            raise ValueError(
                "backend='pallas' requested but the configuration is not "
                "eligible for per-tick stepping (needs TPU, f32/bf16, "
                "Neumann(0) edges, scalar or compressed-table coefficients, "
                "J-only sources, no CPML/TFSF)"
            )
        return self._wrap_lazy_coeffs(
            step_fn(inv_dx=inv_dx, dt=self.grid.dt, bc=self.bc)
        )

    @cached_property
    def _multi_step_cache(self) -> dict:
        # per-instance memo for K-step kernels: rebuilding the closure per
        # run() call would defeat the compiled-scan cache and recompile
        return {}

    # -- stepping ------------------------------------------------------------

    def step(self, state: SimState) -> SimState:
        """One tick (pure; wrap in jit yourself or use jit_step)."""
        return self._step(state, self.coeffs, self.sources)

    @cached_property
    def jit_step(self):
        # donating the CPML-kernel state flakes on the axon TPU runtime
        # (INVALID_ARGUMENT on the aliased custom call); scan carries still
        # update in place internally, so skipping donation costs only one
        # extra state copy at entry
        donate = () if self._cpml_kernel_eligible() else (0,)
        return jax.jit(self._step, donate_argnums=donate)

    def run(
        self,
        state: SimState,
        n_steps: int,
        probes: Sequence[Any] = (),
        accumulators: Sequence[Any] = (),
        probe_every: int = 1,
    ):
        """Run ``n_steps`` ticks in one compiled scan.

        Returns ``(final_state, probe_stacks, accumulator_finals)`` where
        probe_stacks is a tuple of (n_steps // probe_every, ...) arrays.
        ``probe_every`` is the on-device counterpart of the reference's
        observation throttle (cem-app/src/solver/runner.rs:464).

        When no accumulators ride the scan and the probe cadence permits,
        eligible configurations use the K-step temporally-blocked kernel
        (~4x the single-step kernel's throughput); accumulators need every
        intermediate state, so they force single-stepping.
        """
        step, k = self._step, 1
        flux_faces_spec = flux_items = dft_items = dft_arg = None
        row_items = rows_arg = None
        if accumulators:
            (flux_faces_spec, flux_items, dft_items, dft_arg,
             row_items, rows_arg) = \
                kernel_accumulator_spec(tuple(accumulators))
        flux_mode = False
        if (
            self.backend == "auto"
            and (not accumulators or flux_faces_spec is not None)
            and self._cpml_kernel_eligible()
        ):
            # temporally-blocked CPML kernel (pallas_cpml_k): ~4x the
            # single-pass absorbing kernel when the cadence allows
            from .pallas_cpml_k import pallas_cpml_stepk_fn, supports_cpml_k

            # matid CPML at K=8 runs +25% over K=6 (20.7 vs 16.5 Gcell/s
            # at 256^3) but Mosaic-compiles in ~4 min — a once-per-machine
            # cost with the persistent compilation cache
            # (utils.observability.enable_compilation_cache)
            cands = (8, 6, 5, 4, 3, 2)
            for cand in cands:
                cadence = probe_every if probes else n_steps
                if (
                    n_steps % cand == 0
                    and cadence % cand == 0
                    and supports_cpml_k(
                        self.grid.shape, self.bc, self._cpml_or_empty, cand,
                        dtype=self.dtype, dense=self._dense_kernel,
                        dft=((dft_arg[0], len(dft_arg[1]))
                             if accumulators and dft_arg else None),
                        dft_rows=(rows_arg or ()) if accumulators else (),
                        oblique=self._tfsf_oblique,
                    )
                ):
                    faces = flux_faces_spec if accumulators else ()
                    dft_kw = dft_arg if accumulators else None
                    rows_kw = rows_arg if accumulators else ()
                    key = ("cpmlk", cand, faces, dft_kw, rows_kw)
                    if key in self._multi_step_cache:
                        step = self._multi_step_cache[key]
                        k = cand
                        flux_mode = bool(accumulators)
                        break
                    n_src = (
                        self.sources.num_sources if self.sources is not None
                        else 0
                    )
                    kw = dict(
                        inv_dx=tuple(1.0 / d for d in self.grid.dx),
                        dt=self.grid.dt, bc=self.bc,
                        constants=self.grid.constants,
                        cpml=self._cpml_or_empty, tfsf=self._tfsf_slab,
                        oblique=self._tfsf_oblique,
                        max_sources=n_src, with_m=self._has_m_sources(),
                        dtype=self.dtype, flux_faces=faces,
                        dense=self._dense_kernel, dft=dft_kw,
                        dft_rows=rows_kw,
                    )
                    if self.matid is not None:
                        kernel = pallas_cpml_stepk_fn(
                            self.grid.shape, cand,
                            matid=jnp.asarray(self.matid),
                            n_materials=self._n_materials, **kw,
                        )
                        table = jnp.asarray(self.table, jnp.float32)

                        def step(state, coeffs, sources, _k=kernel, _t=table):
                            return _k(state, _t, sources)
                    else:
                        step = pallas_cpml_stepk_fn(
                            self.grid.shape, cand, **kw
                        )
                    self._multi_step_cache[key] = step
                    k = cand
                    flux_mode = bool(accumulators)
                    break
        gb = None
        if (
            self.backend == "auto"
            and not accumulators
            and self._dense_kernel is None
            and self._cpml_kernel_eligible()
        ):
            # x-ZONED CPML K-step (pallas_cpml_xz): slab-end zones run
            # the full-cpml gb kernel, the interior zone a kernel with
            # NO x-psi terms (measured 35% of the absorbing kernel's
            # runtime at 512^3 — Mosaic predication makes per-plane
            # where-gating free-of-charge impossible, so the interior
            # kernel simply never compiles the terms). Engages under
            # the same VMEM-capped condition as gb and replaces it
            # (same state layout); hardware calibration round 5.
            from .pallas_cpml_xz import make_pallas_cpml_xz_stepk, xz_plan

            # K=8 (h=8) leads: measured 38.8 Gcell/s vs K=10 (h=16)
            # 34.8 at 512^3 f32 (halved halo overlap + shallower
            # pipeline). Unlike gb, xz engages even when the plain
            # ladder runs deep: it beats plain at EQUAL K by dropping
            # the x-psi work and the loop-boundary copy (256^3: xz K=8
            # 34.0 vs plain K=8 26.4; 512^3 f32: 38.8 vs K=3 18.8;
            # bf16: 35.9 vs K=4 27.8 — all round-5 chip numbers).
            for cand in (8, 10, 6, 4):
                if cand < k or cand < 6:
                    continue
                cadence = probe_every if probes else n_steps
                if n_steps % cand != 0 or cadence % cand != 0:
                    continue
                plan_x = xz_plan(
                    self.grid.shape, self.bc, self._cpml_or_empty, cand,
                    dtype=self.dtype, matid=self.matid is not None,
                    oblique=self._tfsf_oblique,
                )
                if plan_x is None:
                    continue
                # the win scales with the x-psi-free interior fraction;
                # below ~half the planes the zone fill/drain overhead
                # (2(K-1) extra iterations per cut) eats it — fall
                # through to gb/plain
                if 2 * (plan_x.c1 - plan_x.c0) < self.grid.shape[0]:
                    continue
                # gb window halo overhead guard: 2h/nly <= 12.5% (the
                # measured-win regime; smaller lateral blocks pay more
                # redundant columns than the x-psi cut saves)
                if 16 * plan_x.h > self.grid.shape[1] // plan_x.n_b:
                    continue
                # donation-threaded DOUBLE pass when the cadence allows
                # it: pass 2 lands in the scan's loop-state buffers,
                # removing the ~14 ms/pass loop-boundary state copy
                # every blocks-mode tier otherwise pays (measured round
                # 5; pallas_cpml_xz.step2)
                dbl = (n_steps % (2 * cand) == 0
                       and cadence % (2 * cand) == 0)
                key = ("cpmlxz", cand, plan_x, dbl)
                if key in self._multi_step_cache:
                    step = self._multi_step_cache[key]
                else:
                    n_src = (
                        self.sources.num_sources
                        if self.sources is not None else 0
                    )
                    kw = dict(
                        inv_dx=tuple(1.0 / d for d in self.grid.dx),
                        dt=self.grid.dt, bc=self.bc,
                        constants=self.grid.constants,
                        cpml=self._cpml_or_empty, tfsf=self._tfsf_slab,
                        oblique=self._tfsf_oblique,
                        max_sources=n_src, with_m=self._has_m_sources(),
                        dtype=self.dtype,
                    )
                    if self.matid is not None:
                        kernel = make_pallas_cpml_xz_stepk(
                            self.grid.shape, cand, plan_x,
                            matid=jnp.asarray(self.matid),
                            n_materials=self._n_materials, **kw,
                        )
                        kfn = kernel.step2 if dbl else kernel
                        table = jnp.asarray(self.table, jnp.float32)

                        def step(state, coeffs, sources, _k=kfn,
                                 _t=table):
                            return _k(state, _t, sources)
                    else:
                        step = make_pallas_cpml_xz_stepk(
                            self.grid.shape, cand, plan_x, **kw
                        )
                        if dbl:
                            step = step.step2
                    self._multi_step_cache[key] = step
                k = 2 * cand if dbl else cand
                gb = (plan_x.n_b, plan_x.h)  # same state layout as gb
                break
        if (
            gb is None
            and self.backend == "auto"
            and not accumulators
            and self._dense_kernel is None
            and self._tfsf_oblique is None
            and self._cpml_kernel_eligible()
        ):
            # GRID-blocked CPML K-step (pallas_cpml_gb): lateral blocks
            # inside the pallas grid lift the VMEM K-cap WITHOUT the
            # outside-blocked tier's refresh/concatenate HBM cost. The
            # per-pass overhead (un-aliased double-buffered outputs +
            # 2h/nly halo overlap) still taxes each pass, so engage only
            # when the plain ladder is VMEM-capped at K <= 3 AND the gb
            # plan at least doubles it. Hardware calibration (512^3,
            # round 4): f32 plain K=3 18.7 < gb K=10 n_b=2 22.2 — gb
            # wins; bf16 plain K=4 28.1 > gb K=10 ~22 — plain wins (the
            # un-aliased 2x write traffic eats the K lift once the
            # plain ladder is deep enough).
            from .pallas_cpml_gb import gb_plan, make_pallas_cpml_gb_stepk

            for cand in (10, 8, 6, 4):
                if k > 3 or cand <= k or cand < 2 * k:
                    continue
                cadence = probe_every if probes else n_steps
                if n_steps % cand != 0 or cadence % cand != 0:
                    continue
                plan_g = gb_plan(
                    self.grid.shape, self.bc, self._cpml_or_empty, cand,
                    dtype=self.dtype, matid=self.matid is not None,
                )
                if plan_g is None:
                    continue
                n_bg, hg = plan_g
                # donation-threaded double pass when the cadence allows
                # (pallas_cpml_gb.step2 — removes the loop-boundary
                # state copy, see the xz dispatch note above)
                dbl = (n_steps % (2 * cand) == 0
                       and cadence % (2 * cand) == 0)
                key = ("cpmlgb", cand, n_bg, hg, dbl)
                if key in self._multi_step_cache:
                    step = self._multi_step_cache[key]
                else:
                    n_src = (
                        self.sources.num_sources
                        if self.sources is not None else 0
                    )
                    kw = dict(
                        inv_dx=tuple(1.0 / d for d in self.grid.dx),
                        dt=self.grid.dt, bc=self.bc,
                        constants=self.grid.constants,
                        cpml=self._cpml_or_empty, tfsf=self.tfsf,
                        max_sources=n_src, with_m=self._has_m_sources(),
                        dtype=self.dtype,
                    )
                    if self.matid is not None:
                        kernel = make_pallas_cpml_gb_stepk(
                            self.grid.shape, cand, n_bg, hg,
                            matid=jnp.asarray(self.matid),
                            n_materials=self._n_materials, **kw,
                        )
                        kfn = kernel.step2 if dbl else kernel
                        table = jnp.asarray(self.table, jnp.float32)

                        def step(state, coeffs, sources, _k=kfn,
                                 _t=table):
                            return _k(state, _t, sources)
                    else:
                        step = make_pallas_cpml_gb_stepk(
                            self.grid.shape, cand, n_bg, hg, **kw
                        )
                        if dbl:
                            step = step.step2
                    self._multi_step_cache[key] = step
                k = 2 * cand if dbl else cand
                gb = (n_bg, hg)
                break
        blocked = None
        if (
            self.backend == "auto"
            and k == 1
            and (not accumulators or flux_faces_spec is not None)
            and self._tfsf_oblique is None
            and self._cpml_kernel_eligible()
        ):
            # lateral-blocked CPML K-step (pallas_cpml_blocked): when big
            # lateral planes VMEM-cap the plain kernel ladder to K=1
            # (the single-pass kernel, ~5 Gcell/s at 512^3), y-blocking
            # with halo columns restores deep K (~13 Gcell/s measured at
            # 512^3 f32 K=8). Engaged ONLY at k == 1: the per-pass halo
            # refresh + per-block output reassembly each materialize a
            # full extended state, so whenever the plain ladder reaches
            # even K=3 it is FASTER than blocked K=8 (hardware-measured,
            # bench.py cpml512 section: plain K=3 18.7 vs blocked K=8
            # 13.1 Gcell/s f32; bf16 K=4 27.9 vs K=8 16.5). DensePml
            # regions and every in-kernel accumulator mechanism ride.
            from .pallas_cpml_blocked import (
                blocked_plan,
                make_pallas_cpml_blocked_stepk,
            )

            faces = flux_faces_spec if accumulators else ()
            dft_kw = dft_arg if accumulators else None
            rows_kw = (rows_arg or ()) if accumulators else ()
            for cand in (8, 6, 5, 4, 3, 2):
                if cand <= k:
                    break
                cadence = probe_every if probes else n_steps
                if n_steps % cand != 0 or cadence % cand != 0:
                    continue
                plan_b = blocked_plan(
                    self.grid.shape, self.bc, self._cpml_or_empty, cand,
                    dtype=self.dtype, matid=self.matid is not None,
                    dense=self._dense_kernel,
                    dft=((dft_kw[0], len(dft_kw[1]))
                         if dft_kw is not None else None),
                    dft_rows=rows_kw,
                )
                if plan_b is None:
                    continue
                n_b, h = plan_b
                key = ("cpmlblk", cand, n_b, h, faces, dft_kw, rows_kw)
                if key in self._multi_step_cache:
                    step = self._multi_step_cache[key]
                else:
                    n_src = (
                        self.sources.num_sources
                        if self.sources is not None else 0
                    )
                    kw = dict(
                        inv_dx=tuple(1.0 / d for d in self.grid.dx),
                        dt=self.grid.dt, bc=self.bc,
                        constants=self.grid.constants,
                        cpml=self._cpml_or_empty, tfsf=self.tfsf,
                        max_sources=n_src, with_m=self._has_m_sources(),
                        dtype=self.dtype, flux_faces=faces,
                        dense=self._dense_kernel, dft=dft_kw,
                        dft_rows=rows_kw,
                    )
                    if self.matid is not None:
                        kernel = make_pallas_cpml_blocked_stepk(
                            self.grid.shape, cand, n_b, h,
                            matid=jnp.asarray(self.matid),
                            n_materials=self._n_materials, **kw,
                        )
                        table = jnp.asarray(self.table, jnp.float32)

                        def step(state, coeffs, sources, _k=kernel,
                                 _t=table):
                            return _k(state, _t, sources)
                    else:
                        step = make_pallas_cpml_blocked_stepk(
                            self.grid.shape, cand, n_b, h, **kw
                        )
                    self._multi_step_cache[key] = step
                k = cand
                blocked = (n_b, h)
                flux_mode = bool(accumulators)
                break
        if (
            k == 1
            and self.backend == "auto"
            and not accumulators
            and self._pallas_eligible()
        ):
            from .pallas_stepk import pallas_stepk_fn, supports_k

            n_mat = self._n_materials if self.matid is not None else 1
            # matid-mode kernels unroll K stages x K_mat selects. Round 1
            # capped K at 6 (K=10 Mosaic compiles took ~2 min); on the
            # round-2 stack K=10 compiles in ~15 s and runs ~15% faster
            # than K=6, so matid gets the full ladder too. At >= 512^2
            # lateral planes K=8 leads (round 5: 36.5 vs 32.5 Gcell/s
            # at 512^3 f32 — shallower pipeline, less VMEM pressure).
            if self.grid.shape[1] * self.grid.shape[2] >= 512 * 512:
                # round 5, v5e 512^3: f32 36.5 (K=8) vs 32.5 (K=10),
                # bf16 44.0 vs 39.6
                k_candidates = (8, 10, 6, 5, 4, 3, 2)
            else:
                k_candidates = (10, 8, 6, 5, 4, 3, 2)
            for cand in k_candidates:
                cadence = probe_every if probes else n_steps
                if (
                    n_steps % cand == 0
                    and cadence % cand == 0
                    and supports_k(self.grid.shape, self.bc, cand,
                                   dtype=self.dtype, n_materials=n_mat)
                ):
                    inv_dx = tuple(1.0 / d for d in self.grid.dx)
                    if cand in self._multi_step_cache:
                        step = self._multi_step_cache[cand]
                        k = cand
                        break
                    n_src = (
                        self.sources.num_sources if self.sources is not None else 0
                    )
                    kw = dict(
                        inv_dx=inv_dx, dt=self.grid.dt, bc=self.bc,
                        dtype=self.dtype, max_sources=max(n_src, 1),
                        with_m=self._has_m_sources(),
                    )
                    if self.matid is not None:
                        kernel = pallas_stepk_fn(
                            self.grid.shape, cand,
                            matid=jnp.asarray(self.matid),
                            n_materials=n_mat, **kw,
                        )
                        table = jnp.asarray(self.table, jnp.float32)

                        def step(state, coeffs, sources, _k=kernel, _t=table):
                            return _k(state, _t, sources)
                    else:
                        step = pallas_stepk_fn(self.grid.shape, cand, **kw)
                    self._multi_step_cache[cand] = step
                    k = cand
                    break

        if flux_mode and k > 1:
            # accumulators ride the K-step CPML kernel: per-tick Poynting
            # reductions fold inside the compiled scan (flux_faces) and
            # DFT spectra accumulate inside the kernel state itself
            # (dft) — no single-stepping either way
            if dft_arg is not None:
                # the per-run DFT accumulators ride the psi tail: append
                # zero volumes for this run, strip them before returning
                planes, freqs = dft_arg
                ny, nz = self.grid.shape[1], self.grid.shape[2]
                state = state._replace(psi=state.psi + tuple(
                    jnp.zeros((6 * len(freqs), 2, ny, nz), jnp.float32)
                    for _ in planes
                ))
            probes_t = tuple(probes)
            owners = tuple((a, cr) for _, a, cr in flux_items)
            row_owners = tuple((it[1], it[2]) for it in row_items)
            if blocked is not None:
                # blocked tier with accumulators: the scan runs on the
                # blocked layout; accumulator inits size off the
                # owned-columns view, the per-pass flux rows / captures
                # arrive already GLOBAL (the step sums/concatenates the
                # per-block partials)
                from .pallas_cpml_blocked import (
                    collapse_blocked_pml_state,
                    extend_blocked_pml_state,
                )

                n_b, h = blocked
                state = extend_blocked_pml_state(
                    state, n_b, h, cpml=self._cpml_or_empty,
                    dense=self._dense_kernel, dft=dft_arg,
                )
                probes_t = tuple(_BlockedProbe(p, n_b, h) for p in probes)
                owners = tuple(
                    (_BlockedAcc(a, n_b, h), cr) for a, cr in owners
                )
                row_owners = tuple(
                    (_BlockedAcc(a, n_b, h), dr) for a, dr in row_owners
                )
            fn = _compiled_flux(
                step, probes_t, tuple(accumulators), owners,
                row_owners,
                max(probe_every // k, 1) if probes else 1,
                n_steps // k, self.grid.dt,
            )
            state, probe_out, flux_accs, row_accs = fn(
                state, self.coeffs, self.sources)
            if blocked is not None:
                state = collapse_blocked_pml_state(
                    state, self.grid.shape, n_b, h,
                    cpml=self._cpml_or_empty,
                    dense=self._dense_kernel, dft=dft_arg,
                )
            finals = [None] * len(accumulators)
            for (pos, _a, _cr), acc in zip(flux_items, flux_accs):
                finals[pos] = acc
            for it, acc in zip(row_items, row_accs):
                if len(it) == 4:  # BoxDft: reassemble faces from both
                    pos, a, _dr, (p0, p1) = it
                    finals[pos] = a.finalize_from_kernel(
                        [extract_dft_acc(state, dft_arg, s)
                         for s in range(p0, p1)],
                        acc,
                    )
                else:
                    finals[it[0]] = acc
            for pos, _p, slot in dft_items:
                finals[pos] = extract_dft_acc(state, dft_arg, slot)
            if dft_arg is not None:
                state = state._replace(
                    psi=state.psi[: len(state.psi) - len(planes)])
            return state, probe_out, tuple(finals)
        if gb is not None:
            # state at rest stays plain global; only the y-strip psi
            # tensors take the per-block layout around the compiled scan
            # (a few MB each way). Fields stay plain, so probes sample
            # the state directly — no owned-view wrapper needed.
            from .pallas_cpml_gb import (
                collapse_gb_pml_state,
                extend_gb_pml_state,
            )

            n_bg, hg = gb
            state = extend_gb_pml_state(
                state, n_bg, cpml=self._cpml_or_empty
            )
            fn = _compiled(step, tuple(probes), (),
                           max(probe_every // k, 1) if probes else 1,
                           n_steps // k, self.grid.dt, donate=False)
            state, probe_out, _ = fn(state, self.coeffs, self.sources)
            state = collapse_gb_pml_state(
                state, n_bg, cpml=self._cpml_or_empty
            )
            return state, probe_out, ()
        if blocked is not None:
            # state at rest stays plain global: extend into the blocked
            # layout around the compiled scan (halo columns refresh
            # inside the step), collapse back after; probes sample the
            # owned-columns view device-side
            from .pallas_cpml_blocked import (
                collapse_blocked_pml_state,
                extend_blocked_pml_state,
            )

            n_b, h = blocked
            state = extend_blocked_pml_state(
                state, n_b, h, cpml=self._cpml_or_empty,
                dense=self._dense_kernel,
            )
            bp = tuple(_BlockedProbe(p, n_b, h) for p in probes)
            fn = _compiled(step, bp, (),
                           max(probe_every // k, 1) if probes else 1,
                           n_steps // k, self.grid.dt, donate=False)
            state, probe_out, _ = fn(state, self.coeffs, self.sources)
            state = collapse_blocked_pml_state(
                state, self.grid.shape, n_b, h, cpml=self._cpml_or_empty,
                dense=self._dense_kernel,
            )
            return state, probe_out, ()
        fn = _compiled(step, tuple(probes), tuple(accumulators),
                       max(probe_every // k, 1) if probes else 1,
                       n_steps // k, self.grid.dt,
                       donate=not self._cpml_kernel_eligible())
        return fn(state, self.coeffs, self.sources)

    # -- reporting -----------------------------------------------------------

    def memory_required(self) -> int:
        """Device-memory estimate (counterpart of SolverBackend::memory_required,
        cem-solver/src/lib.rs:40-45)."""
        itemsize = jnp.dtype(self.dtype).itemsize
        return self.grid.memory_required(dtype_bytes=itemsize)

    def courant_check(self) -> None:
        """Raise if Courant-unstable (the reference only warns,
        cem-app/src/solver/runner.rs:283-291; call sites may skip this)."""
        s = self.grid.courant_number()
        if s > 1.0 + 1e-12:
            raise ValueError(
                f"Courant number {s:.4f} > 1: dt={self.grid.dt} too large for "
                f"dx={self.grid.dx} (reduce dt or coarsen the lattice)"
            )


@dataclasses.dataclass(frozen=True)
class _BlockedProbe:
    """Probe adapter for the blocked CPML scan: samples the plain-global
    owned-columns view of the blocked state (hashable — it keys the
    compiled-scan cache like the probe it wraps)."""

    probe: Any
    n_b: int
    h: int

    def sample(self, state, dt):
        from .pallas_cpml_blocked import blocked_owned_view

        return self.probe.sample(
            blocked_owned_view(state, self.n_b, self.h), dt
        )


@dataclasses.dataclass(frozen=True)
class _BlockedAcc:
    """Accumulator adapter for the blocked CPML scan: inits size off the
    plain-global owned-columns view (accumulator inits read field shapes
    — e.g. DftProbe.init_rows_acc), while the per-pass updates consume
    the step's already-GLOBAL flux rows / captures unchanged. Hashable —
    it keys the compiled-scan cache like the accumulator it wraps."""

    acc: Any
    n_b: int
    h: int

    def _view(self, state):
        from .pallas_cpml_blocked import blocked_owned_view

        return blocked_owned_view(state, self.n_b, self.h)

    def init(self, state, dt):
        return self.acc.init(self._view(state), dt)

    def init_rows_acc(self, state, dt):
        return self.acc.init_rows_acc(self._view(state), dt)

    def update_from_flux_rows(self, acc, rows, dt):
        return self.acc.update_from_flux_rows(acc, rows, dt)

    def update_from_dft_rows(self, acc, caps, tick0, dt):
        return self.acc.update_from_dft_rows(acc, caps, tick0, dt)


def kernel_flux_spec(accumulators):
    """(faces, owners) when EVERY accumulator supports the in-kernel
    per-plane Poynting reductions (kernel_flux_faces /
    update_from_flux_rows, see pallas_cpml_k.py); (None, None) otherwise.
    ``owners`` maps each accumulator to its (start, stop) column range of
    the concatenated reduction rows."""
    faces, owners = [], []
    for a in accumulators:
        if not (hasattr(a, "kernel_flux_faces")
                and hasattr(a, "update_from_flux_rows")):
            return None, None
        f = tuple(a.kernel_flux_faces())
        owners.append((a, (len(faces), len(faces) + len(f))))
        faces.extend(f)
    return tuple(faces), tuple(owners)


def kernel_accumulator_spec(accumulators):
    """Partition accumulators for the kernel tier. Flux-capable ones
    (kernel_flux_faces/update_from_flux_rows) map to flux_faces columns;
    DftProbe(axis=0) accumulators (E or H component) map to in-kernel
    DFT planes (all must share ONE frequency tuple); row-capture-capable
    ones (kernel_dft_rows/update_from_dft_rows — lateral DftProbes,
    BoxDft) map to dft_rows capture descriptors. Returns
    (faces, flux_items, dft_items, dft_arg, row_items, rows_arg); all
    None when any accumulator fits none (caller falls back to per-tick
    paths). flux_items = ((pos, acc, (c0, c1)), ...); dft_items =
    ((pos, probe, plane_slot), ...); dft_arg = (planes, freqs) or None
    with planes entries (index, which) — which 0=E / 1=H; row_items =
    ((pos, acc, (d0, d1)), ...) with (d0, d1) the accumulator's slice of
    rows_arg = the concatenated ("y"/"z", index) descriptor tuple.

    BoxDft accumulators decompose onto BOTH mechanisms (kernel_parts):
    their x-face raw plane spectra join ``planes`` and their y/z-face
    captures join the descriptors; run() reassembles the faces with
    finalize_from_kernel. They appear in row_items with a (p0, p1)
    plane-slot range appended: (pos, acc, (d0, d1), (p0, p1))."""
    from ..probes import BoxDft, DftProbe, FieldComponent

    faces, flux_items, dft_items, row_items = [], [], [], []
    planes, freqs, row_descs = [], None, []
    _none = (None,) * 6

    def share_freqs(f):
        nonlocal freqs
        if freqs is None:
            freqs = f
            return True
        return f == freqs

    for pos, a in enumerate(accumulators):
        if isinstance(a, DftProbe) and a.axis == 0:
            if not share_freqs(tuple(a.frequencies)):
                return _none
            dft_items.append((pos, a, len(planes)))
            which = 0 if a.component == FieldComponent.E else 1
            planes.append((int(a.index), which))
            continue
        if isinstance(a, BoxDft):
            if not share_freqs(tuple(a.frequencies)):
                return _none
            xp, dd = a.kernel_parts()
            row_items.append((
                pos, a, (len(row_descs), len(row_descs) + len(dd)),
                (len(planes), len(planes) + len(xp)),
            ))
            planes.extend(xp)
            row_descs.extend(dd)
            continue
        if (hasattr(a, "kernel_dft_rows")
                and hasattr(a, "update_from_dft_rows")):
            dd = tuple(a.kernel_dft_rows())
            row_items.append(
                (pos, a, (len(row_descs), len(row_descs) + len(dd)))
            )
            row_descs.extend(dd)
            continue
        if (hasattr(a, "kernel_flux_faces")
                and hasattr(a, "update_from_flux_rows")):
            ff = tuple(a.kernel_flux_faces())
            flux_items.append((pos, a, (len(faces), len(faces) + len(ff))))
            faces.extend(ff)
            continue
        return _none
    dft_arg = (tuple(planes), freqs) if planes else None
    return (tuple(faces), tuple(flux_items), tuple(dft_items), dft_arg,
            tuple(row_items), tuple(row_descs))


def extract_dft_acc(state, dft_arg, plane_slot):
    """(re, im) DftProbe-layout accumulators from a kernel state's psi
    tail (the LAST len(planes) entries are the (6F, 2, ny, nz) DFT
    volumes, slot order (f, re/im, comp), live plane 1)."""
    planes, freqs = dft_arg
    vol = state.psi[-(len(planes) - plane_slot)]
    n_f = len(freqs)
    live = vol[:, 1].reshape(n_f, 2, 3, *vol.shape[2:])
    return live[:, 0], live[:, 1]


def _run_scan_flux(step, probes, owners, row_owners, probe_every, n_steps,
                   dt, state, coeffs, sources):
    """The accumulator scan for flux/capture-emitting K-step kernels: the
    step returns (state[, (K, nx, n_q) flux reductions][, DFT row
    captures]) and each accumulator folds its column/descriptor range —
    accumulators advance K ticks per kernel pass inside one compiled
    scan."""
    stride = max(probe_every, 1)
    if n_steps % stride != 0:
        raise ValueError(f"{n_steps=} not divisible by {probe_every=}")

    accs = tuple(a.init(state, dt) for a, _ in owners)
    raccs = tuple(a.init_rows_acc(state, dt) for a, _ in row_owners)

    def tick(carry, _):
        s, accs, raccs = carry
        out = step(s, coeffs, sources)
        if not (owners or row_owners):
            return (out, accs, raccs), None
        s2 = out[0]
        idx = 1
        accs2, raccs2 = accs, raccs
        if owners:
            rows = out[idx]; idx += 1
            accs2 = tuple(
                a.update_from_flux_rows(acc, rows[:, :, s0:s1], dt)
                for (a, (s0, s1)), acc in zip(owners, accs)
            )
        if row_owners:
            caps = out[idx]; idx += 1
            raccs2 = tuple(
                a.update_from_dft_rows(racc, caps[d0:d1], s.tick, dt)
                for (a, (d0, d1)), racc in zip(row_owners, raccs)
            )
        return (s2, accs2, raccs2), None

    if stride == 1:
        def body(carry, _):
            carry2, _ = tick(carry, None)
            return carry2, tuple(p.sample(carry2[0], dt) for p in probes)

        (state, accs, raccs), probe_out = jax.lax.scan(
            body, (state, accs, raccs), None, length=n_steps
        )
    else:
        def body(carry, _):
            carry2, _ = jax.lax.scan(tick, carry, None, length=stride)
            return carry2, tuple(p.sample(carry2[0], dt) for p in probes)

        (state, accs, raccs), probe_out = jax.lax.scan(
            body, (state, accs, raccs), None, length=n_steps // stride
        )

    return state, probe_out, accs, raccs


@lru_cache(maxsize=128)
def _compiled_flux(step, probes, accums, owners, row_owners, probe_every,
                   n_steps, dt):
    # no donation: flux kernels carry PmlKernelState (axon donation flake)
    return jax.jit(
        partial(_run_scan_flux, step, probes, owners, row_owners,
                probe_every, n_steps, dt),
    )


def _run_scan(step, probes, accums, probe_every, n_steps, dt,
              state, coeffs, sources):
    stride = max(probe_every, 1)
    if n_steps % stride != 0:
        raise ValueError(f"{n_steps=} not divisible by {probe_every=}")

    accs = tuple(a.init(state, dt) for a in accums)

    def tick(carry, _):
        s, accs = carry
        s2 = step(s, coeffs, sources)
        accs2 = tuple(a.update(acc, s2, dt) for a, acc in zip(accums, accs))
        return (s2, accs2), None

    if stride == 1:
        def body(carry, _):
            carry2, _ = tick(carry, None)
            return carry2, tuple(p.sample(carry2[0], dt) for p in probes)

        (state, accs), probe_out = jax.lax.scan(
            body, (state, accs), None, length=n_steps
        )
    else:
        def body(carry, _):
            carry2, _ = jax.lax.scan(tick, carry, None, length=stride)
            return carry2, tuple(p.sample(carry2[0], dt) for p in probes)

        (state, accs), probe_out = jax.lax.scan(
            body, (state, accs), None, length=n_steps // stride
        )

    return state, probe_out, accs


@lru_cache(maxsize=128)
def _compiled(step, probes, accums, probe_every, n_steps, dt, donate=True):
    return jax.jit(
        partial(_run_scan, step, probes, accums, probe_every, n_steps, dt),
        # PmlKernelState donation flakes on the axon TPU runtime
        donate_argnums=(0,) if donate else (),
    )
