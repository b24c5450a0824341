"""Dispatch to the fastest SHARDED step for an absorbing configuration.

The multi-chip analog of solver/best.py: absorbing (CPML) multi-chip runs
prefer the sharded in-kernel CPML K-step (pallas_sharded_cpml.py, runs at
Pallas-kernel speed per chip) — which covers TF/SF (slab AND closed box),
M sources, compressed (matid) materials, bf16 storage, 2-D (x, y) meshes,
per-tick flux reductions, DFT row captures, in-kernel x-plane DFT
spectra, DensePml volumetric regions (1-D x meshes), and TF/SF-only /
dense-only runs (hosted with a zero-thickness absorber) — and fall back
to the composed XLA sharded engine
(sharded_engine.py, exact but ~XLA speed) only for configurations the
kernel path doesn't cover: dense per-cell coefficients, x-PML slabs too
deep for the shard layout, and unpaddable/slab-overlapping DensePml
boxes. Meshes that cut lattice z reach the kernel tier one level up,
via ShardedSimulation's cyclic lattice rotation (parallel/rotation.py);
at THIS level a z-cut (or any non-(x, y) multi-axis) mesh rides the
engine.
Box TF/SF, flux reductions, DFT row captures, x-plane DFT spectra, AND
DensePml regions all ride 2-D meshes (runtime lateral/plane
coordinates, owned-window reductions/extraction, identity-padded
full-lateral region volumes).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax

from ..constants import SI, PhysicalConstants
from ..solver.boundary import BoundaryConditions

__all__ = ["best_sharded_absorbing_step", "kernel_dense",
           "kernel_lateral_axis"]


def kernel_dense(dense, shape, cpml):
    """The tile-padded DensePml the sharded kernel path would be built
    with, or None when the region can't ride the kernel (unpaddable box,
    or the LIVE box touching a boundary slab on its axis — padded
    identity cells may overlap). ``cpml`` is the kernel HOST absorber —
    pass the zero-thickness empty when the run has no boundary CPML
    (dense-only runs ride the kernel that way), never None."""
    if dense is None or cpml is None:
        return None
    from ..solver.pml_region import pad_dense_to_tiles

    try:
        dense_k = pad_dense_to_tiles(dense, shape)
    except ValueError:
        return None
    if dense_k.axis in set(cpml.active_axes()):
        # live extent only: tile-padded cells are identity no-ops
        b0, b1 = dense_k.live[dense_k.axis]
        lo_t, hi_t = cpml.thickness[dense_k.axis]
        if b0 < lo_t or b1 > shape[dense_k.axis] - hi_t:
            return None  # live box touches a boundary slab
    return dense_k


def kernel_lateral_axis(mesh, axis: str = "x"):
    """The mesh axis the KERNEL paths can decompose laterally, or None.

    The kernel tier maps mesh axis names to lattice dims positionally
    (like the sharded engine), so a 2-D kernel mesh must be
    (axis, <lat>) with every further axis trivial; the lateral axis then
    shards lattice y. Returns None for 1-D meshes (lateral unsharded) and
    for shapes the kernel can't take (lat axis not second, or a third
    nontrivial axis — those are not kernel-decomposable, so with a None
    here AND a non-1-D mesh the caller falls back to the XLA engine)."""
    names = list(mesh.shape)
    lat = [n for n in names if n != axis and mesh.shape[n] > 1]
    if (len(lat) == 1 and len(names) >= 2 and names[0] == axis
            and lat[0] == names[1]):
        return lat[0]
    return None


def best_sharded_absorbing_step(
    mesh,
    shape: Tuple[int, int, int],
    *,
    inv_dx: Tuple[float, float, float],
    dt: float,
    bc: BoundaryConditions = BoundaryConditions(),
    constants: PhysicalConstants = SI,
    cpml,
    tfsf=None,
    max_sources: int = 0,
    with_m: bool = False,
    matid=None,
    n_materials: int = 1,
    dtype=None,
    max_k: int = 8,
    interpret: bool = False,
    axis: str = "x",
    flux_faces=(),
    dft_rows=(),
    dft=None,
    dense=None,
    allow_gb: bool = True,
):
    """(step, init_state, k, kind) for a sharded absorbing run.

    ``step(state, coeffs, sources)`` advances k ticks; ``init_state()``
    builds the matching zero state (the two paths use different state
    layouts). ``kind`` is "pallas_cpml_k" or "xla_engine".

    The kernel path needs: a mesh sharded only along ``axis``, uniform
    scalar coefficients or a compressed matid volume, f32/bf16 storage,
    and x-PML confined to the edge shards (supports_sharded_cpml).
    M sources, compressed materials, and TF/SF (slab AND closed box) all
    ride the kernel; dense per-cell coefficients fall back to the XLA
    engine.

    ``dense`` is an optional solver.pml_region.DensePml (volumetric
    interior absorber, GLOBAL coordinates, UNPADDED): the kernel attempt
    tile-pads it (pml_region.pad_dense_to_tiles) and requires clearance
    from the boundary slabs on its axis; otherwise the run rides the
    engine, which takes the region under any decomposition
    (sharded_engine.py dense path)."""
    from .pallas_sharded_cpml import (
        init_sharded_pml_state,
        make_pallas_sharded_cpml_stepk,
        supports_sharded_cpml,
    )
    from .sharded_engine import (
        init_sharded_engine_state,
        make_sharded_engine_step,
    )

    import jax.numpy as jnp

    dtype = dtype or jnp.float32
    n_dev = mesh.shape.get(axis, 1)
    y_axis = kernel_lateral_axis(mesh, axis)
    one_d = all(n == 1 for name, n in mesh.shape.items() if name != axis)

    oblique = None
    if tfsf is not None and not hasattr(tfsf, "span"):
        # ObliqueTfsf rides the sharded CPML kernel on 1-D x meshes:
        # the correction stack stays global/replicated and each shard
        # addresses it through a runtime scalar-prefetch x offset
        # (pallas_sharded_cpml oblique=). Lateral cuts (2-D/z-cut
        # meshes) stay unimplemented — the patch stitching is static —
        # and the engine path can't host it per shard either, so fail
        # loudly there.
        oblique, tfsf = tfsf, None
        if not one_d:
            raise NotImplementedError(
                "sharded ObliqueTfsf needs a 1-D x mesh (lateral mesh "
                "cuts don't re-offset the correction volumes); use a "
                "1-D mesh, solver.Simulation, or the aux-grid Tfsf"
            )
        if dense is not None or flux_faces or dft_rows or dft is not None:
            raise NotImplementedError(
                "sharded ObliqueTfsf doesn't compose with dense regions "
                "or accumulator mechanisms yet"
            )
    kernel_mesh_ok = one_d or y_axis is not None
    n_dy = mesh.shape[y_axis] if y_axis is not None else 1
    kernel_backend = interpret or jax.default_backend() == "tpu"
    m_ok = not with_m or max_sources > 0
    # box TF/SF, flux reductions, DFT row captures, AND in-kernel
    # x-plane DFT spectra all ride 2-D meshes (runtime lateral/plane
    # coordinates + owned-window reductions/extraction); only dense
    # regions still need a 1-D mesh (their lateral extent is cut)
    tfsf_ok = True
    flux_ok = True
    dft_rt = (len(dft[0]), len(dft[1])) if dft is not None else None
    # TF/SF-only and dense-only runs (no boundary CPML) ride the same
    # kernel with an empty absorber — the multi-chip analog of
    # solver.simulation.Simulation._cpml_or_empty
    cpml_k = cpml
    if cpml_k is None and (tfsf is not None or dense is not None
                           or oblique is not None):
        from ..solver.cpml import Cpml

        cpml_k = Cpml(thickness=((0, 0), (0, 0), (0, 0)))
    dense_k = kernel_dense(dense, shape, cpml_k)
    dense_ok = dense is None or dense_k is not None
    if (
        cpml_k is not None
        and flux_ok
        and dense_ok
        and kernel_mesh_ok
        and tfsf_ok
        and n_dev * n_dy > 1
        and kernel_backend
        and m_ok
        and n_materials <= 256
    ):
        for k in range(max_k, 1, -1):
            ny_ext = (shape[1] // n_dy + 2 * k) if y_axis is not None \
                else shape[1]
            if matid is not None and ny_ext % 32 != 0:
                continue
            if supports_sharded_cpml(shape, n_dev, bc, cpml_k, k, dtype,
                                     n_dev_y=n_dy, dft_rt=dft_rt,
                                     dense=dense_k, oblique=oblique):
                # GRID-BLOCKED upgrade (parallel/pallas_sharded_cpml.py
                # blocks=): when the plain ladder is VMEM-capped at
                # K <= 3 — big lateral planes, the round-4 shard-cpml512
                # ceiling — lateral blocks inside each shard's pallas
                # grid lift the cap (same engage rule as the single-chip
                # gb tier, solver/simulation.py). 1-D x meshes without
                # dense regions or accumulator mechanisms only.
                gb_pl = None
                # max_k <= 3 means the caller deliberately capped the
                # ladder (tests, small dryruns) — don't upgrade past it;
                # a DEFAULT cap signals a real VMEM-capped big plane
                if (allow_gb and k <= 3 < max_k and one_d
                        and dense_k is None and oblique is None
                        and dft is None and not flux_faces
                        and not dft_rows):
                    from .pallas_sharded_cpml import sharded_gb_plan

                    for gk in (10, 8, 6, 4):
                        if gk < 2 * k:
                            break
                        pg = sharded_gb_plan(
                            shape, n_dev, bc, cpml_k, gk, dtype,
                            matid=matid is not None,
                        )
                        if pg is not None:
                            gb_pl = (gk, pg)
                            break
                if gb_pl is not None:
                    gk, (n_bg, hg) = gb_pl
                    kern = make_pallas_sharded_cpml_stepk(
                        mesh, shape, gk, inv_dx=inv_dx, dt=dt, bc=bc,
                        constants=constants, cpml=cpml_k, tfsf=tfsf,
                        max_sources=max_sources, interpret=interpret,
                        axis=axis, with_m=with_m, matid=matid,
                        n_materials=n_materials, dtype=dtype,
                        blocks=(n_bg, hg),
                    )
                    step = jax.jit(kern)
                    # surface the donation-threaded double pass through
                    # the jit wrapper (ShardedSimulation.run picks it
                    # up when the cadence divides 2K)
                    step.step2 = kern.step2

                    def init_state(gk=gk):
                        return init_sharded_pml_state(
                            shape, mesh, gk, cpml=cpml_k, axis=axis,
                            dtype=dtype, tfsf=tfsf,
                        )

                    # accumulator runs must replan without the upgrade
                    # (ShardedSimulation.run checks this marker): the
                    # canonical state layout's halo width tracks k
                    init_state.gb_blocks = (gk, n_bg, hg)
                    return step, init_state, gk, "pallas_cpml_k"
                step = jax.jit(make_pallas_sharded_cpml_stepk(
                    mesh, shape, k, inv_dx=inv_dx, dt=dt, bc=bc,
                    constants=constants, cpml=cpml_k, tfsf=tfsf,
                    max_sources=max_sources, interpret=interpret,
                    axis=axis, with_m=with_m, matid=matid,
                    n_materials=n_materials, dtype=dtype, y_axis=y_axis,
                    flux_faces=tuple(flux_faces),
                    dft_rows=tuple(dft_rows), dft=dft, dense=dense_k,
                    oblique=oblique,
                ))

                def init_state(k=k):
                    return init_sharded_pml_state(
                        shape, mesh, k, cpml=cpml_k, axis=axis, dtype=dtype,
                        tfsf=tfsf, y_axis=y_axis, dft=dft, dense=dense_k,
                    )

                return step, init_state, k, "pallas_cpml_k"

    if oblique is not None:
        # the engine path has no per-shard correction offsets either —
        # a kernel-ineligible oblique config (e.g. x-PML too deep for
        # the shard layout) has no sharded host at all
        raise NotImplementedError(
            "this ObliqueTfsf configuration doesn't fit the sharded "
            "CPML kernel (supports_sharded_cpml) and the engine path "
            "can't host sharded oblique corrections — use "
            "solver.Simulation or adjust the decomposition"
        )

    # sharded engine wants a dims tuple of length 3 aligned to lattice axes
    names = list(mesh.shape)
    dims = tuple(
        (names[i] if i < len(names) and mesh.shape[names[i]] > 1 else None)
        for i in range(3)
    )
    step = jax.jit(make_sharded_engine_step(
        mesh, shape, dims, inv_dx=inv_dx, dt=dt, bc=bc,
        constants=constants, cpml=cpml, tfsf=tfsf, dense=dense,
    ))

    def init_state():
        return init_sharded_engine_state(
            shape, mesh, dims, cpml=cpml, tfsf=tfsf, dense=dense
        )

    return step, init_state, 1, "xla_engine"
