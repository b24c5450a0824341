"""High-level multi-chip simulation: Simulation's API over a device mesh.

The single-chip `solver.simulation.Simulation` auto-dispatches each
configuration to its fastest kernel tier; this is the same contract for
multi-chip runs (SURVEY §2.7 / BASELINE config 5 — the reference has no
distributed layer at all). Construction mirrors Simulation; `plan()`
reports which path the configuration rides:

  - "pallas_cpml_k": sharded in-kernel CPML K-step (absorbing; supports
    J/M sources, compressed materials, bf16 storage, slab AND box
    TF/SF, flux/DFT-row/x-plane-DFT accumulators on 1-D and 2-D
    meshes, DensePml regions and TF/SF-/dense-only empty-host runs)
  - "xla_engine":    composed sharded engine (dense coefficients,
    TF/SF or DensePml on z-cut meshes — exact, slower)

Meshes that cut lattice z ride the kernel tiers too when the
configuration allows it, via a cyclic lattice-frame rotation
(parallel/rotation.py + the ``rotate_zcut`` flag below); otherwise
they fall back to the engine.
  - "pallas_k":      sharded free-space K-step kernel
  - "xla":           plain sharded XLA step (free space fallback)

States on the kernel paths use an EXTENDED per-shard layout (k halo
planes per side); `gather()` collapses any state kind back to plain
global (nx, ny, nz) arrays for analysis, and `init()` always builds the
matching layout — callers never touch the layout details.
"""

from __future__ import annotations

import dataclasses
from functools import cached_property
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import SI, PhysicalConstants
from ..grid import Grid
from ..solver.boundary import BoundaryConditions
from ..solver.sources import SourceSet

__all__ = ["ShardedSimulation"]


@dataclasses.dataclass(frozen=True)
class ShardedSimulation:
    """Immutable multi-chip simulation setup; all methods are pure."""

    grid: Grid
    coeffs: Any = None              # CellCoefficients (uniform scalars)
    sources: Optional[SourceSet] = None
    bc: BoundaryConditions = BoundaryConditions()
    dtype: Any = jnp.float32
    cpml: Any = None
    tfsf: Any = None
    # Optional volumetric per-cell PML region (solver/pml_region.py,
    # GLOBAL coordinates): rides the sharded kernel tier on 1-D and 2-D
    # kernel meshes (tile-padded automatically) and the sharded engine
    # elsewhere.
    dense_pml: Any = None
    # compressed materials: GLOBAL (nx, ny, nz) index + (K, 4) table
    matid: Any = None
    table: Any = None
    # device mesh; None = 1-D mesh over every visible device
    mesh: Any = None
    axis: str = "x"
    # explicit kernel lateral mesh axis; None = positional inference
    # (kernel_lateral_axis). Set internally by the z-cut rotation.
    y_axis: Optional[str] = None
    interpret: bool = False
    max_k: int = 8
    # sharded grid-blocked CPML upgrade (parallel/best.py gb_pl): lifts
    # the per-shard VMEM K-cap at big lateral planes on 1-D x meshes.
    # False pins absorbing runs to the plain sharded K ladder (needed
    # when accumulators must ride a big-plane absorbing run: the gb
    # plan's state halo width tracks its K, which the accumulator
    # replan can't match).
    allow_gb: bool = True
    # z-cut meshes: run the kernel tier in a cyclically-rotated lattice
    # frame (parallel/rotation.py) when the configuration allows it;
    # False pins such meshes to the XLA engine (needed for
    # checkpointing and in-run probes/accumulators, which the rotated
    # plan does not carry).
    rotate_zcut: bool = True

    # -- planning -----------------------------------------------------------

    @cached_property
    def _mesh(self):
        if self.mesh is not None:
            return self.mesh
        from .topology import make_mesh

        return make_mesh(axis_names=(self.axis,))

    @cached_property
    def _y_axis(self):
        """The mesh axis the kernel tiers shard lattice y over, or None
        (1-D meshes, and mesh shapes only the XLA engine can take)."""
        if self.y_axis is not None:
            return self.y_axis
        from .best import kernel_lateral_axis

        return kernel_lateral_axis(self._mesh, self.axis)

    @cached_property
    def _rotation(self):
        """(perm, inner rotated ShardedSimulation) when this z-cut mesh
        rides the kernel tier in a rotated lattice frame, else None.

        Engages only when the rotation actually BUYS the kernel tier:
        the configuration must be rotatable (default boundary
        conditions, uniform scalar coefficients or matid; DensePml
        permutes mechanically via rotation.rotate_dense) and the
        rotated plan must land on a kernel kind; otherwise the engine
        takes the mesh directly, unrotated.

        TF/SF can NEVER rotate: the z cut must land on the rotated
        kernel's decomposed axes, so under the only valid cyclic
        permutations lattice x maps to rotated y or z — the
        x-propagating 1-D aux grid (solver/tfsf.py) has no host axis.
        (An improper y<->z swap would keep x on x', but it flips the
        incident polarization to E=y, which the kernel's E=z-only
        injection cannot express, and the solver's stagger-offset
        tables (tfsf_oblique._E_OFF/_H_OFF) are not
        permutation-covariant, so the oblique analytic sampler cannot
        be frame-remapped either.) Such configurations ride the
        unrotated engine — physics over speed."""
        if not self.rotate_zcut or self.y_axis is not None:
            return None
        from .rotation import (
            rotate_cpml,
            rotate_dense,
            rotate_grid,
            rotate_mesh,
            rotate_sources,
            zcut_rotation,
        )

        perm = zcut_rotation(self._mesh)
        if perm is None:
            return None
        if self.tfsf is not None:
            return None
        if self.bc != BoundaryConditions():
            return None
        if self.coeffs is not None and any(
                np.ndim(c) != 0 for c in self.coeffs):
            return None  # dense per-cell coefficients ride the engine
        rmesh, y_cut = rotate_mesh(self._mesh, perm)
        matid_r = (None if self.matid is None
                   else jnp.transpose(jnp.asarray(self.matid), perm))
        inner = dataclasses.replace(
            self,
            grid=rotate_grid(self.grid, perm),
            sources=rotate_sources(self.sources, perm),
            cpml=rotate_cpml(self.cpml, perm),
            dense_pml=rotate_dense(self.dense_pml, perm),
            matid=matid_r,
            mesh=rmesh,
            axis="x",
            y_axis="y" if y_cut else None,
            rotate_zcut=False,
        )
        _, kind = inner.plan()
        if kind not in ("pallas_cpml_k", "pallas_k"):
            return None  # rotation buys nothing: plan unrotated
        return perm, inner

    @property
    def _ext_axes(self):
        return (self.axis, self._y_axis) if self._y_axis is not None \
            else (self.axis,)

    @cached_property
    def _dense_kernel(self):
        """The tile-padded DensePml the kernel plan was built with, or
        None (no region, or the region rides the engine)."""
        if self.dense_pml is None:
            return None
        from .best import kernel_dense

        # _cpml_pad, not self.cpml: dense-only runs host the kernel with
        # an empty absorber (mirrors best_sharded_absorbing_step)
        return kernel_dense(self.dense_pml, self.grid.shape, self._cpml_pad)

    def _has_m_sources(self) -> bool:
        if self.sources is None or self.sources.num_sources == 0:
            return False
        return bool(np.any(np.asarray(self.sources.m_amp) != 0))

    @cached_property
    def _plan(self):
        """(step, init_state, k, kind)."""
        inv_dx = tuple(1.0 / d for d in self.grid.dx)
        n_src = self.sources.num_sources if self.sources is not None else 0
        n_mat = 0 if self.table is None else int(np.shape(self.table)[0])

        if (self.cpml is not None or self.tfsf is not None
                or self.dense_pml is not None):
            from .best import best_sharded_absorbing_step

            return best_sharded_absorbing_step(
                self._mesh, self.grid.shape, inv_dx=inv_dx, dt=self.grid.dt,
                bc=self.bc, constants=self.grid.constants, cpml=self.cpml,
                tfsf=self.tfsf, max_sources=n_src,
                with_m=self._has_m_sources(), matid=self.matid,
                n_materials=n_mat, dtype=self.dtype, max_k=self.max_k,
                interpret=self.interpret, axis=self.axis,
                dense=self.dense_pml, allow_gb=self.allow_gb,
            )

        # free space: try the sharded K-step kernel (1-D x or 2-D (x, y)
        # decomposition), else the XLA step
        mesh = self._mesh
        n_dev = mesh.shape.get(self.axis, 1)
        y_axis = self._y_axis
        n_dy = mesh.shape[y_axis] if y_axis is not None else 1
        one_d = all(
            n == 1 for name, n in mesh.shape.items() if name != self.axis
        )
        kernel_backend = self.interpret or jax.default_backend() == "tpu"
        nx, ny = self.grid.shape[0], self.grid.shape[1]
        if (
            (one_d or y_axis is not None) and n_dev * n_dy > 1
            and kernel_backend and nx % n_dev == 0 and ny % n_dy == 0
            and self.matid is None
        ):
            from ..solver.pallas_stepk import supports_k
            from .pallas_sharded_k import (
                extend_state,
                make_pallas_sharded_stepk,
            )

            nl = nx // n_dev
            nly = ny // n_dy if y_axis is not None else None
            for k in range(self.max_k, 1, -1):
                ny_ext = nly + 2 * k if y_axis is not None else ny
                ext_shape = (nl + 2 * k, ny_ext, self.grid.shape[2])
                if (
                    nl >= 2 * k
                    and (nly is None or nly >= 2 * k)
                    and supports_k(ext_shape, self.bc, k, dtype=self.dtype)
                ):
                    step = jax.jit(make_pallas_sharded_stepk(
                        mesh, k, nl, inv_dx=inv_dx, dt=self.grid.dt,
                        bc=self.bc, max_sources=max(n_src, 1),
                        interpret=self.interpret, dtype=self.dtype,
                        with_m=self._has_m_sources(), nl_y=nly,
                    ))

                    def init_state(k=k):
                        from ..solver.state import zero_state

                        return extend_state(
                            zero_state(self.grid.shape, self.dtype),
                            mesh, k, axes=self._ext_axes,
                        )

                    return step, init_state, k, "pallas_k"

        from .sharded import make_sharded_step, shard_state

        names = list(mesh.shape)
        dims = tuple(
            (names[i] if i < len(names) and mesh.shape[names[i]] > 1
             else None)
            for i in range(3)
        )
        step = jax.jit(
            make_sharded_step(mesh, dims, inv_dx=inv_dx, dt=self.grid.dt,
                              bc=self.bc)
        )

        def init_state():
            from ..solver.state import zero_state

            return shard_state(zero_state(self.grid.shape, self.dtype),
                               mesh, dims)

        return step, init_state, 1, "xla"

    def plan(self):
        """(k, kind): ticks per step call and the dispatched path name.

        On a rotated z-cut mesh this is the INNER plan's kind (the
        kernel tier the rotation bought) — the state layout is the
        rotated frame's throughout; gather() un-rotates."""
        if self._rotation is not None:
            return self._rotation[1].plan()
        _, _, k, kind = self._plan
        return k, kind

    # -- lifecycle ----------------------------------------------------------

    def init(self):
        if self._rotation is not None:
            return self._rotation[1].init()
        _, init_state, _, _ = self._plan
        return init_state()

    def run(self, state, n_steps: int, probes=(), probe_every: int = 1,
            accumulators=()):
        """Advance ``n_steps`` ticks (must be divisible by plan()'s k).

        With ``probes`` (the solver.probes classes), samples every
        ``probe_every`` ticks from a DEVICE-SIDE global view of the state
        (owned regions only — no host round-trip per sample, the
        multi-chip analog of Simulation.run's on-device observation) and
        returns (state, probe_stacks). ``probe_every`` must be a multiple
        of k on the K-step kernel paths.

        ``accumulators`` (running per-tick reductions, e.g. the
        scattering flux box) need every intermediate state, so they
        require a per-tick path (plan k == 1: the sharded XLA engine or
        plain XLA step) — same rule as Simulation.run, where
        accumulators force single-stepping. Returns
        (state, probe_stacks, accumulator_finals) when given."""
        if self._rotation is not None:
            perm, inner = self._rotation
            if accumulators:
                raise ValueError(
                    "accumulators don't ride the rotated z-cut kernel "
                    "plan — construct with rotate_zcut=False to pin this "
                    "mesh to the XLA engine (per-tick, accumulator-safe)"
                )
            return inner.run(
                state, n_steps,
                probes=tuple(_RotatedProbe(p, perm) for p in probes),
                probe_every=probe_every,
            )
        step, _, k, kind = self._plan
        if n_steps % k != 0:
            raise ValueError(f"{n_steps=} not divisible by plan k={k}")
        coeffs = self._step_coeffs
        if accumulators:
            if getattr(self._plan[1], "gb_blocks", None) is not None:
                raise ValueError(
                    "accumulators don't ride the sharded grid-blocked "
                    "CPML plan (its state halo width tracks the gb K, "
                    "which the accumulator replan can't match) — "
                    "construct with allow_gb=False to use the plain "
                    "sharded kernel ladder"
                )
            from ..solver.simulation import kernel_accumulator_spec

            (faces, flux_items, dft_items, dft_arg, row_items,
             rows_arg) = kernel_accumulator_spec(tuple(accumulators))
            # the sharded kernel covers flux reductions and lateral DFT
            # row captures (1-D AND 2-D meshes, via runtime lateral
            # coordinates) plus in-kernel x-plane spectra (axis-0
            # DftProbes, BoxDft x-faces — runtime plane coordinates;
            # per-shard accumulators span the extended lateral plane)
            kernel_ok = (
                faces is not None and k > 1 and kind == "pallas_cpml_k"
            )
            n_dev = self._mesh.shape[self.axis]
            n_dy = (self._mesh.shape[self._y_axis]
                    if self._y_axis is not None else 1)
            if kernel_ok and dft_arg is not None:
                # the accumulator VMEM budget can reject the plan's k —
                # fall back to the per-tick error below rather than
                # silently replanning at a different k
                from .pallas_sharded_cpml import supports_sharded_cpml

                kernel_ok = supports_sharded_cpml(
                    self.grid.shape, n_dev, self.bc, self._cpml_pad, k,
                    self.dtype, n_dev_y=n_dy,
                    dft_rt=(len(dft_arg[0]), len(dft_arg[1])),
                    dense=self._dense_kernel,
                )
            if kernel_ok:
                fstep = self._flux_step(faces, rows_arg, dft_arg)
                if dft_arg is not None:
                    # per-run accumulators ride the psi tail (the sharded
                    # (n_dev*6F, n_dy*ny_ext, nz) layout); stripped
                    # before return
                    from jax.sharding import NamedSharding
                    from jax.sharding import PartitionSpec as P

                    planes_d, freqs_d = dft_arg
                    n_f = len(freqs_d)
                    ny, nz = self.grid.shape[1], self.grid.shape[2]
                    ny_ext = ny // n_dy + (2 * k if n_dy > 1 else 0)
                    fs = NamedSharding(
                        self._mesh, P(self.axis, self._y_axis, None))
                    state = state._replace(psi=state.psi + tuple(
                        jax.device_put(
                            jnp.zeros((n_dev * 6 * n_f, n_dy * ny_ext,
                                       nz), jnp.float32), fs)
                        for _ in planes_d
                    ))
                if probes and (
                    probe_every % k != 0 or n_steps % probe_every != 0
                ):
                    raise ValueError(
                        f"{probe_every=} must be a multiple of plan k={k} "
                        f"and divide {n_steps=}"
                    )
                owners = tuple((a, cr) for _, a, cr in flux_items)
                accs = tuple(
                    a.init(state, self.grid.dt) for a, _ in owners
                )
                # captures come back GLOBAL, so row accs are global-shaped
                # regardless of the extended per-shard state layout
                import types

                gshape = types.SimpleNamespace(
                    ex=np.broadcast_to(np.float32(0), self.grid.shape)
                )
                raccs = tuple(
                    it[1].init_rows_acc(gshape, self.grid.dt)
                    for it in row_items
                )
                outs = [[] for _ in probes]
                for i in range(n_steps // k):
                    tick0 = state.tick
                    out = fstep(state, coeffs, self.sources)
                    # with neither flux faces nor row captures the step
                    # returns the bare state (dft accumulators ride
                    # INSIDE it, on the psi tail)
                    if not (faces or row_items):
                        state = out
                        if probes and ((i + 1) * k) % probe_every == 0:
                            view = self._global_view(state)
                            for j, p in enumerate(probes):
                                outs[j].append(p.sample(view, self.grid.dt))
                        continue
                    state = out[0]
                    oi = 1
                    if faces:
                        rows = out[oi]; oi += 1
                        accs = tuple(
                            a.update_from_flux_rows(
                                acc, rows[:, :, s0:s1], self.grid.dt
                            )
                            for (a, (s0, s1)), acc in zip(owners, accs)
                        )
                    if row_items:
                        caps = out[oi]; oi += 1
                        raccs = tuple(
                            it[1].update_from_dft_rows(
                                racc, caps[it[2][0]: it[2][1]], tick0,
                                self.grid.dt,
                            )
                            for it, racc in zip(row_items, raccs)
                        )
                    if probes and ((i + 1) * k) % probe_every == 0:
                        view = self._global_view(state)
                        for j, p in enumerate(probes):
                            outs[j].append(p.sample(view, self.grid.dt))
                finals = [None] * len(accumulators)
                for (pos, _a, _cr), acc in zip(flux_items, accs):
                    finals[pos] = acc
                for it, racc in zip(row_items, raccs):
                    if len(it) == 4:  # BoxDft: x-faces from the psi tail
                        pos, a, _dr, (p0, p1) = it
                        finals[pos] = a.finalize_from_kernel(
                            [_extract_sharded_dft_acc(
                                state, dft_arg, s, n_dev, n_dy, k)
                             for s in range(p0, p1)],
                            racc,
                        )
                    else:
                        finals[it[0]] = racc
                for pos, _p, slot in dft_items:
                    finals[pos] = _extract_sharded_dft_acc(
                        state, dft_arg, slot, n_dev, n_dy, k)
                if dft_arg is not None:
                    state = state._replace(
                        psi=state.psi[: len(state.psi) - len(dft_arg[0])])
                return (state, tuple(jnp.stack(o) for o in outs),
                        tuple(finals))
            if k != 1:
                raise ValueError(
                    "accumulators need every tick; this configuration "
                    f"dispatched to a K={k} kernel path and the "
                    "accumulators don't all map to the sharded kernel "
                    "mechanisms (flux faces / DFT row captures on any "
                    "kernel mesh; in-kernel x-plane spectra on a 1-D "
                    "mesh) — use those, a 1-D mesh, or force the engine "
                    "path (e.g. via dense coefficients)"
                )
            accs = tuple(a.init(state, self.grid.dt) for a in accumulators)
            outs = [[] for _ in probes]
            for i in range(n_steps):
                state = step(state, coeffs, self.sources)
                accs = tuple(
                    a.update(acc, state, self.grid.dt)
                    for a, acc in zip(accumulators, accs)
                )
                if probes and (i + 1) % probe_every == 0:
                    for j, p in enumerate(probes):
                        outs[j].append(p.sample(state, self.grid.dt))
            return (state, tuple(jnp.stack(o) for o in outs), accs)
        # donation-threaded double pass where the cadence allows it
        # (gb-blocks kernels; bit-identical, removes the per-pass
        # loop-boundary state copy — pallas_sharded_cpml.step2)
        step2 = getattr(step, "step2", None)
        cad = probe_every if probes else n_steps
        if step2 is not None and n_steps % (2 * k) == 0 \
                and cad % (2 * k) == 0:
            step, k = jax.jit(step2), 2 * k
        if not probes:
            for _ in range(n_steps // k):
                state = step(state, coeffs, self.sources)
            return state
        if probe_every % k != 0 or n_steps % probe_every != 0:
            raise ValueError(
                f"{probe_every=} must be a multiple of plan k={k} and "
                f"divide {n_steps=}"
            )
        outs = [[] for _ in probes]
        for i in range(n_steps // k):
            state = step(state, coeffs, self.sources)
            if ((i + 1) * k) % probe_every == 0:
                view = self._global_view(state)
                for j, p in enumerate(probes):
                    outs[j].append(p.sample(view, self.grid.dt))
        return state, tuple(jnp.stack(o) for o in outs)

    def _flux_step(self, faces, dft_rows=(), dft=None):
        """The plan's kernel step rebuilt with in-kernel flux reductions,
        DFT row captures, and/or runtime-coordinate x-plane spectra (same
        k; flux/rows only add outputs, dft adds psi-tail accumulator
        entries the caller appends). Cached per (faces, rows, dft) so
        repeated run() calls reuse the compiled step."""
        cache = self.__dict__.setdefault("_flux_step_cache", {})
        key = (faces, tuple(dft_rows), dft)
        if key not in cache:
            from .best import best_sharded_absorbing_step

            inv_dx = tuple(1.0 / d for d in self.grid.dx)
            n_src = (
                self.sources.num_sources if self.sources is not None else 0
            )
            n_mat = 0 if self.table is None else int(np.shape(self.table)[0])
            step, _, fk, fkind = best_sharded_absorbing_step(
                self._mesh, self.grid.shape, inv_dx=inv_dx,
                dt=self.grid.dt, bc=self.bc, constants=self.grid.constants,
                cpml=self.cpml, tfsf=self.tfsf, max_sources=n_src,
                with_m=self._has_m_sources(), matid=self.matid,
                n_materials=n_mat, dtype=self.dtype, max_k=self.max_k,
                interpret=self.interpret, axis=self.axis, flux_faces=faces,
                dft_rows=tuple(dft_rows), dft=dft, dense=self.dense_pml,
            )
            k, kind = self.plan()
            assert (fk, fkind) == (k, kind), (fk, fkind, k, kind)
            cache[key] = step
        return cache[key]

    def _global_view(self, state):
        """Device-side global-layout SimState view of any state kind
        (owned planes only; halo/trash planes dropped by static slicing —
        XLA keeps the result sharded, nothing crosses to the host)."""
        _, _, k, kind = self._plan
        if kind not in ("pallas_cpml_k", "pallas_k"):
            return state  # plain global arrays already
        from ..solver.state import SimState

        n_dev = self._mesh.shape[self.axis]
        nx = self.grid.shape[0]
        nl = nx // n_dev
        nle = nl + 2 * k

        def owned(arr):
            r = arr.reshape(n_dev, nle, *arr.shape[1:])
            out = r[:, k: k + nl].reshape(n_dev * nl, *arr.shape[1:])
            if self._y_axis is not None:
                n_dy = self._mesh.shape[self._y_axis]
                nly = self.grid.shape[1] // n_dy
                nlye = out.shape[1] // n_dy
                r2 = out.reshape(out.shape[0], n_dy, nlye, out.shape[2])
                out = r2[:, :, k: k + nly].reshape(
                    out.shape[0], n_dy * nly, out.shape[2]
                )
            return out

        return SimState(
            ex=owned(state.ex), ey=owned(state.ey), ez=owned(state.ez),
            hx=owned(state.hx), hy=owned(state.hy), hz=owned(state.hz),
            tick=state.tick,
        )

    @cached_property
    def _step_coeffs(self):
        _, _, _, kind = self._plan
        if self.matid is not None and kind == "pallas_cpml_k":
            return jnp.asarray(self.table, jnp.float32)
        if self.matid is not None and kind in ("xla", "xla_engine"):
            # the XLA paths shard dense 3-D coefficient arrays natively
            # (their shard_map in_specs give field sharding to any
            # ndim==3 leaf), so gather dense coefficients from the
            # compressed form once
            from ..solver.step import CellCoefficients

            return CellCoefficients.from_table(
                jnp.asarray(self.table, self.dtype),
                jnp.asarray(self.matid),
            )
        if self.coeffs is None:
            raise ValueError(
                "ShardedSimulation needs uniform `coeffs` or matid+table"
            )
        return self.coeffs

    def gather(self, state):
        """Any state layout -> plain global field arrays (host round-trip):
        a SimState/EngineState-like named tuple on the caller's side.

        Rotated z-cut states come back in the LATTICE frame (transpose +
        component relabel, rotation.unrotate_fields); the rotated frame's
        psi internals are dropped — resume such runs through the engine
        (rotate_zcut=False)."""
        if self._rotation is not None:
            perm, inner = self._rotation
            from .rotation import unrotate_fields

            return unrotate_fields(inner.gather(state), perm)
        _, _, k, kind = self._plan
        if kind == "pallas_cpml_k":
            from .pallas_sharded_cpml import collapse_pml_state

            return collapse_pml_state(
                state, self._mesh, k, self.grid.shape, cpml=self._cpml_pad,
                axis=self.axis, y_axis=self._y_axis,
                dense=self._dense_kernel,
            )
        if kind == "pallas_k":
            from .pallas_sharded_k import collapse_state

            return collapse_state(state, self._mesh, k,
                                  axes=self._ext_axes)
        return state  # XLA paths hold plain (sharded) global arrays

    # -- checkpoint / resume ------------------------------------------------

    def _global_template(self):
        """A zero state in the PLAIN GLOBAL layout matching this
        configuration's state kind (what gather() returns)."""
        _, _, k, kind = self._plan
        if kind == "pallas_cpml_k":
            from ..solver.pallas_cpml import init_pml_kernel_state

            return init_pml_kernel_state(
                self.grid.shape, self.dtype, cpml=self._cpml_pad,
                tfsf=self.tfsf, dense=self._dense_kernel,
            )
        if kind == "pallas_k":
            from ..solver.state import zero_state

            return zero_state(self.grid.shape, self.dtype)
        _, init_state, _, _ = self._plan
        return init_state()

    def _rotation_ckpt_guard(self):
        """Rotated checkpointing carries the boundary-CPML psi through
        convert_pml_psi; the DensePml region volume's frame conversion
        (per-frame tile padding changes the box extents) is not built —
        that corner pins checkpointing to rotate_zcut=False."""
        if self.dense_pml is not None:
            raise ValueError(
                "checkpointing a rotated z-cut plan with a DensePml "
                "region is not supported (the region psi volume's "
                "padded box differs per frame) — construct with "
                "rotate_zcut=False to checkpoint through the XLA engine"
            )

    def _lattice_ckpt_state(self, state):
        """Rotated inner state -> LATTICE-frame plain checkpoint pytree
        matching an unrotated simulation's template: fields transpose +
        component-relabel (unrotate_fields), boundary psi maps through
        the semantic live windows (rotation.convert_pml_psi), tick and
        (empty — TF/SF never rotates) aux pass through. The file is
        therefore identical in layout to a rotate_zcut=False or
        single-chip checkpoint of the same physics."""
        perm, inner = self._rotation
        from .rotation import _inverse, convert_pml_psi, unrotate_fields

        g = inner.gather(state)
        _, _, _, kind = inner._plan
        fields = unrotate_fields(g, perm)
        if kind == "pallas_k":
            return fields
        from ..solver.pallas_cpml import PmlKernelState

        psi = convert_pml_psi(
            g.psi, inner.grid.shape, inner._cpml_pad,
            self.grid.shape, self._cpml_pad, _inverse(perm),
        )
        return PmlKernelState(
            ex=fields.ex, ey=fields.ey, ez=fields.ez,
            hx=fields.hx, hy=fields.hy, hz=fields.hz,
            tick=g.tick, psi=psi, aux_e=g.aux_e, aux_h=g.aux_h,
        )

    def save(self, path, state, metadata=None):
        """Checkpoint ``state`` (any layout) as a PLAIN GLOBAL
        LATTICE-FRAME pytree — the file is independent of the mesh
        shape, kernel K, AND z-cut rotation that produced it, so any
        compatible ShardedSimulation (or the single-chip Simulation)
        can resume it. Exceeds the reference, which has no state
        persistence at all (SURVEY.md §5)."""
        from ..io.checkpoint import save_checkpoint

        meta = {"grid_shape": list(self.grid.shape)}
        if metadata:
            meta.update(metadata)
        if self._rotation is not None:
            self._rotation_ckpt_guard()
            return save_checkpoint(path, self._lattice_ckpt_state(state),
                                   metadata=meta)
        return save_checkpoint(path, self.gather(state), metadata=meta)

    def restore(self, path):
        """Load a global checkpoint into THIS simulation's layout (which
        may use a different mesh shape / kernel K / rotation than the
        writer): kernel kinds re-extend the global state into the
        per-shard halo layout (rotated plans first map fields and psi
        into the rotated frame); engine kinds shard the plain arrays."""
        from ..io.checkpoint import load_checkpoint

        if self._rotation is not None:
            self._rotation_ckpt_guard()
            perm, inner = self._rotation
            from .rotation import convert_pml_psi, rotate_fields

            # the FILE layout is the lattice frame's (mesh-independent
            # contract); build the lattice template directly — matching
            # what an unrotated/single-chip sim of this physics writes
            _, _, _, kind = inner._plan
            if kind == "pallas_cpml_k":
                from ..solver.pallas_cpml import init_pml_kernel_state

                tmpl = init_pml_kernel_state(
                    self.grid.shape, self.dtype, cpml=self._cpml_pad)
            else:
                from ..solver.state import zero_state

                tmpl = zero_state(self.grid.shape, self.dtype)
            state_l, _ = load_checkpoint(path, tmpl)
            fr = rotate_fields(state_l, perm)
            if kind == "pallas_cpml_k":
                from ..solver.pallas_cpml import PmlKernelState

                psi = convert_pml_psi(
                    state_l.psi, self.grid.shape, self._cpml_pad,
                    inner.grid.shape, inner._cpml_pad, perm,
                )
                state_r = PmlKernelState(
                    tick=state_l.tick, psi=psi,
                    aux_e=state_l.aux_e, aux_h=state_l.aux_h, **fr,
                )
                from .pallas_sharded_cpml import extend_pml_state

                _, _, k_i, _ = inner._plan
                return extend_pml_state(
                    state_r, inner._mesh, k_i, cpml=inner._cpml_pad,
                    axis=inner.axis, y_axis=inner._y_axis,
                )
            from ..solver.state import SimState

            state_r = SimState(tick=state_l.tick, **fr)
            from .pallas_sharded_k import extend_state

            _, _, k_i, _ = inner._plan
            return extend_state(state_r, inner._mesh, k_i,
                                axes=inner._ext_axes)
        state, _ = load_checkpoint(path, self._global_template())
        _, _, k, kind = self._plan
        if kind == "pallas_cpml_k":
            from .pallas_sharded_cpml import extend_pml_state

            return extend_pml_state(
                state, self._mesh, k, cpml=self._cpml_pad, axis=self.axis,
                y_axis=self._y_axis, dense=self._dense_kernel,
            )
        if kind == "pallas_k":
            from .pallas_sharded_k import extend_state

            return extend_state(state, self._mesh, k, axes=self._ext_axes)
        return state

    @property
    def _cpml_pad(self):
        if self.cpml is not None:
            return self.cpml
        from ..solver.cpml import Cpml

        return Cpml(thickness=((0, 0), (0, 0), (0, 0)))


@dataclasses.dataclass(frozen=True)
class _RotatedProbe:
    """Probe adapter for rotated z-cut plans: un-rotates the device-side
    global view back into the lattice frame before sampling, so probe
    coordinates/components stay in the caller's frame. Frozen/hashable
    (probe classes key jit caches — CLAUDE.md invariant)."""

    probe: Any
    perm: Any

    def sample(self, view, dt):
        from .rotation import unrotate_fields

        return self.probe.sample(unrotate_fields(view, self.perm), dt)


def _extract_sharded_dft_acc(state, dft_arg, plane_slot, n_dev,
                             n_dy=1, k=0):
    """(re, im) DftProbe-layout accumulators from a SHARDED kernel
    state's psi tail: the last len(planes) entries are
    (n_dev*6F, n_dy*ny_ext, nz) per-shard accumulator stacks (exactly
    one x-shard — the plane's owner — is nonzero), so the global
    spectrum is the x-dev sum; under a 2-D mesh (n_dy > 1) each
    y-shard's OWNED lateral window is then concatenated (halo columns
    hold stale accumulations and are dropped). Mirrors
    solver.simulation.extract_dft_acc for the extended layout."""
    planes, freqs = dft_arg
    vol = state.psi[-(len(planes) - plane_slot)]
    n_f = len(freqs)
    if n_dy > 1:
        ny_ext = vol.shape[1] // n_dy
        nly = ny_ext - 2 * k
        r = vol.reshape(vol.shape[0], n_dy, ny_ext, vol.shape[2])
        vol = r[:, :, k: k + nly].reshape(
            vol.shape[0], n_dy * nly, vol.shape[2])
    v = vol.reshape(n_dev, 6 * n_f, *vol.shape[1:]).sum(0)
    live = v.reshape(n_f, 2, 3, *vol.shape[1:])
    return live[:, 0], live[:, 1]
