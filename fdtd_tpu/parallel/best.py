"""Dispatch to the fastest SHARDED step for an absorbing configuration.

The multi-chip analog of solver/best.py: absorbing (CPML) multi-chip runs
prefer the sharded in-kernel CPML K-step (pallas_sharded_cpml.py, runs at
Pallas-kernel speed per chip) and fall back to the composed XLA sharded
engine (sharded_engine.py, exact but ~XLA speed) only for configurations
the kernel path doesn't cover: TF/SF, M sources, dense per-cell
coefficients, multi-axis meshes, or slabs too deep for the shard layout.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax

from ..constants import SI, PhysicalConstants
from ..solver.boundary import BoundaryConditions

__all__ = ["best_sharded_absorbing_step"]


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
):
    """(step, init_state, k, kind) for a sharded absorbing run.

    ``step(state, coeffs, sources)`` advances k ticks; ``init_state()``
    builds the matching zero state (the two paths use different state
    layouts). ``kind`` is "pallas_cpml_k" or "xla_engine".

    The kernel path needs: a mesh sharded only along ``axis``, uniform
    scalar coefficients or a compressed matid volume, f32/bf16 storage,
    and x-PML confined to the edge shards (supports_sharded_cpml).
    M sources, compressed materials, and SLAB TF/SF all ride the kernel;
    box TF/SF and dense per-cell coefficients fall back to the XLA
    engine.
    """
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
    one_d = all(n == 1 for name, n in mesh.shape.items() if name != axis)
    kernel_backend = interpret or jax.default_backend() == "tpu"
    matid_ok = matid is None or (
        shape[1] % 32 == 0 and n_materials <= 256
    )
    m_ok = not with_m or max_sources > 0
    tfsf_ok = tfsf is None or not tfsf.is_box
    if (
        cpml is not None
        and tfsf_ok
        and one_d
        and n_dev > 1
        and kernel_backend
        and matid_ok
        and m_ok
    ):
        for k in range(max_k, 1, -1):
            if supports_sharded_cpml(shape, n_dev, bc, cpml, k, dtype):
                step = jax.jit(make_pallas_sharded_cpml_stepk(
                    mesh, shape, k, inv_dx=inv_dx, dt=dt, bc=bc,
                    constants=constants, cpml=cpml, tfsf=tfsf,
                    max_sources=max_sources, interpret=interpret,
                    axis=axis, with_m=with_m, matid=matid,
                    n_materials=n_materials, dtype=dtype,
                ))

                def init_state(k=k):
                    return init_sharded_pml_state(
                        shape, mesh, k, cpml=cpml, axis=axis, dtype=dtype,
                        tfsf=tfsf,
                    )

                return step, init_state, k, "pallas_cpml_k"

    # sharded engine wants a dims tuple of length 3 aligned to lattice axes
    names = list(mesh.shape)
    dims = tuple(
        (names[i] if i < len(names) and mesh.shape[names[i]] > 1 else None)
        for i in range(3)
    )
    step = jax.jit(make_sharded_engine_step(
        mesh, shape, dims, inv_dx=inv_dx, dt=dt, bc=bc,
        constants=constants, cpml=cpml, tfsf=tfsf,
    ))

    def init_state():
        return init_sharded_engine_state(
            shape, mesh, dims, cpml=cpml, tfsf=tfsf
        )

    return step, init_state, 1, "xla_engine"
