"""Cyclic lattice-axis rotation: z-cut meshes onto the kernel tier.

The sharded Pallas kernels decompose lattice x (1-D meshes) or (x, y)
(2-D meshes); meshes that cut lattice z used to fall back to the XLA
engine wholesale (parallel/best.py fallback list; the 128-lane tiling
makes native z halo columns expensive). But the FDTD update is exactly
equivariant under a CYCLIC permutation of lattice axes applied to BOTH
coordinates and field components: the curl of a vector field transforms
covariantly under any proper rotation, and a cyclic axis relabeling is a
proper rotation (determinant +1, so no pseudo-vector sign flips for H).
Every cell computes the same f32 arithmetic on the same values in a
transposed layout — the rotated run is BIT-equal to the unrotated one.

So a z-cut mesh runs the EXISTING x/(x, y) kernels in a rotated frame:
pick the cyclic permutation that lands the cut lattice dims on rotated
dims (0,) / (0, 1), rotate every descriptor once at plan time (shape,
dx, CPML thickness, source coordinates AND J/M components, matid
volume), step entirely in the rotated frame, and un-rotate gathered
fields (transpose + component relabel) on the way out.

``perm`` convention everywhere in this module: rotated dim j IS lattice
dim perm[j] (so ``perm = (2, 0, 1)`` means rotated x = lattice z). Only
the two cyclic permutations are used; axis SWAPS are improper (they
would flip the sign of H) and never generated.

Reference correspondence: none — the reference has no distributed layer
at all (SURVEY.md §2.7); this closes the last decomposition-shape hole
in a capability the reference lacks entirely.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

__all__ = [
    "zcut_rotation",
    "rotate_mesh",
    "rotate_shape",
    "rotate_grid",
    "rotate_cpml",
    "rotate_sources",
    "unrotate_fields",
]

_CYCLIC = ((2, 0, 1), (1, 2, 0))


def mesh_dims(mesh) -> Tuple[Optional[str], Optional[str], Optional[str]]:
    """lattice dim -> cutting mesh-axis name (positional mapping, the
    same convention as parallel/best.py and the sharded engine)."""
    names = list(mesh.shape)
    return tuple(
        (names[i] if i < len(names) and mesh.shape[names[i]] > 1 else None)
        for i in range(3)
    )


def zcut_rotation(mesh):
    """The cyclic ``perm`` rotating this mesh's cut lattice dims onto
    kernel frame dims (0,)/(0, 1), or None.

    None when the mesh is already kernel-shaped (no z cut — nothing to
    do) or when all three lattice dims are cut (the kernel takes at most
    two; the XLA engine handles it)."""
    dims = mesh_dims(mesh)
    cut = [i for i, d in enumerate(dims) if d is not None]
    if 2 not in cut or len(cut) > 2:
        return None
    for perm in _CYCLIC:
        rd = tuple(dims[perm[j]] for j in range(3))
        if rd[2] is None and rd[0] is not None:
            return perm
    return None


def rotate_mesh(mesh, perm):
    """(rotated Mesh with canonical ("x", "y", "z") names, y_cut).

    The kernel builders key on the LITERAL axis names "x"/"y"
    (pallas_sharded_k hardcodes them; kernel_lateral_axis requires the
    cut axes first in name order), so the rotated frame gets a fresh
    mesh over the SAME devices: the device array transposes by ``perm``
    — adjacency along every ring is preserved, so halo ppermutes still
    ride the same ICI neighbors — and rotated dim j takes canonical
    name "xyz"[j]."""
    from jax.sharding import Mesh

    dev = np.asarray(mesh.devices)
    dev3 = dev.reshape(dev.shape + (1,) * (3 - dev.ndim))
    rdev = np.transpose(dev3, perm)
    return Mesh(rdev, ("x", "y", "z")), rdev.shape[1] > 1


def rotate_shape(shape, perm) -> Tuple[int, int, int]:
    return tuple(shape[perm[j]] for j in range(3))


def rotate_grid(grid, perm):
    """Grid with shape and per-axis spatial resolution permuted."""
    import dataclasses

    res = dataclasses.replace(
        grid.resolution,
        spatial=tuple(grid.resolution.spatial[perm[j]] for j in range(3)),
    )
    return dataclasses.replace(grid, shape=rotate_shape(grid.shape, perm),
                               resolution=res)


def rotate_cpml(cpml, perm):
    if cpml is None:
        return None
    import dataclasses

    return dataclasses.replace(
        cpml, thickness=tuple(cpml.thickness[perm[j]] for j in range(3))
    )


def rotate_sources(sources, perm):
    """SourceSet with lattice coordinates AND J/M vector components
    relabeled into the rotated frame (a J_z dipole under perm (2,0,1)
    becomes a J_x' dipole at the permuted cell)."""
    if sources is None:
        return None
    idx = jnp.asarray(perm)
    return sources._replace(
        points=sources.points[:, idx],
        j_amp=sources.j_amp[:, idx],
        m_amp=sources.m_amp[:, idx],
    )


def _inverse(perm) -> Tuple[int, int, int]:
    return tuple(perm.index(i) for i in range(3))


def unrotate_fields(gathered, perm):
    """Rotated-frame global state -> lattice-frame SimState.

    Lattice field component c lives in rotated component
    ``perm.index(c)``; each array transposes axes back with the inverse
    permutation. psi tensors (kernel-layout internals of the rotated
    frame) are dropped — gather() output is for field analysis, and
    checkpointing on rotated plans is routed through the caller."""
    from ..solver.state import SimState

    inv = _inverse(perm)
    e = [jnp.transpose(getattr(gathered, "e" + "xyz"[inv[c]]), inv)
         for c in range(3)]
    h = [jnp.transpose(getattr(gathered, "h" + "xyz"[inv[c]]), inv)
         for c in range(3)]
    return SimState(ex=e[0], ey=e[1], ez=e[2],
                    hx=h[0], hy=h[1], hz=h[2], tick=gathered.tick)
