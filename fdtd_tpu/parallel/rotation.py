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
    "rotate_dense",
    "rotate_fields",
    "unrotate_fields",
    "convert_pml_psi",
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


def rotate_dense(dense, perm):
    """DensePml in the rotated frame: the stretch axis index, the AABB
    box, the live box and the 6 per-cell coefficient volumes all permute
    mechanically (no resampling — the volumes are per-cell scalars, and
    the per-axis Yee curl the stretch applies to is itself equivariant
    under the cyclic relabeling, so the rotated run stays bit-equal)."""
    if dense is None:
        return None
    import dataclasses

    inv = _inverse(perm)

    def pbox(box):
        return tuple(tuple(box[perm[j]]) for j in range(3))

    def pvol(v):
        return jnp.transpose(jnp.asarray(v), perm)

    return dataclasses.replace(
        dense,
        axis=inv[dense.axis],
        box=pbox(dense.box),
        coeffs_h=tuple(pvol(c) for c in dense.coeffs_h),
        coeffs_e=tuple(pvol(c) for c in dense.coeffs_e),
        live_box=(None if dense.live_box is None
                  else pbox(dense.live_box)),
    )


def _inverse(perm) -> Tuple[int, int, int]:
    return tuple(perm.index(i) for i in range(3))


def unrotate_fields(gathered, perm):
    """Rotated-frame global state -> lattice-frame SimState.

    Lattice field component c lives in rotated component
    ``perm.index(c)``; each array transposes axes back with the inverse
    permutation. psi tensors (kernel-layout internals of the rotated
    frame) are dropped — gather() output is for field analysis;
    checkpointing maps them to the lattice layout via convert_pml_psi."""
    from ..solver.state import SimState

    inv = _inverse(perm)
    e = [jnp.transpose(getattr(gathered, "e" + "xyz"[inv[c]]), inv)
         for c in range(3)]
    h = [jnp.transpose(getattr(gathered, "h" + "xyz"[inv[c]]), inv)
         for c in range(3)]
    return SimState(ex=e[0], ey=e[1], ez=e[2],
                    hx=h[0], hy=h[1], hz=h[2], tick=gathered.tick)


def rotate_fields(state_l, perm):
    """Lattice-frame field arrays -> rotated-frame (ex..hz) dict: the
    inverse of unrotate_fields (rotated component c IS lattice component
    perm[c]; arrays transpose by perm)."""
    out = {}
    for f in "eh":
        for c in range(3):
            out[f + "xyz"[c]] = jnp.transpose(
                getattr(state_l, f + "xyz"[perm[c]]), perm
            )
    return out


def convert_pml_psi(psi_src, src_shape, src_cpml, dst_shape, dst_cpml, m):
    """Plain-global CPML psi tuple of one lattice frame -> another.

    ``m`` maps DST dims onto SRC dims: DST dim/component a corresponds
    to SRC dim/component m[a] (for unrotation dst=lattice, src=rotated,
    m = perm^-1; for rotation dst=rotated, src=lattice, m = perm). The
    DST term (half, a, c[, end]) therefore pulls from the SRC term
    (half, m[a], m[c]).

    The two frames lay an axis term out differently when the term's axis
    maps between the slab kind (axis 0: lo/hi plane-indexed tensor pair
    with a trash plane, solver/pallas_cpml._psi_layout) and the strip
    kinds (axes 1/2: one tensor with 8-/128-padded lo+hi row blocks), so
    conversion goes through the SEMANTIC live windows, identical in
    every representation: lo = psi at the first t_lo planes/rows of the
    axis, hi = psi at the last t_hi (slab-pair hi tensors hold them at
    indices 1..t_hi, trash at 0; strip tensors at the END of the padded
    hi block — both padding conventions keep non-live entries at exact
    zero via profile gating, so copying the windows is lossless).
    t_lo/t_hi agree across frames because the thickness tuple permutes
    with the axes (rotate_cpml)."""
    from ..solver.pallas_cpml import _psi_layout

    slay = _psi_layout(tuple(src_shape), src_cpml)
    dlay = _psi_layout(tuple(dst_shape), dst_cpml)
    smap = {}
    for entry, t in zip(slay, psi_src):
        smap[(entry[0], entry[1], entry[2], entry[3])] = (
            entry, np.asarray(t))

    def sem_lo_hi(half, a_s, c_s):
        """(lo, hi) live-window arrays in SRC dim order (the index dim
        sits at position a_s), lengths t_lo / t_hi along it."""
        if (half, a_s, c_s, "lo") in smap:
            e_lo, lo_t = smap[(half, a_s, c_s, "lo")]
            _, hi_t = smap[(half, a_s, c_s, "hi")]
            t_lo, t_hi = e_lo[5][0], e_lo[5][1]
            return lo_t[:t_lo], hi_t[1: t_hi + 1]
        key = (half, a_s, c_s, None)
        if key not in smap:
            return None
        e, t = smap[key]
        t_lo, t_hi, plo, phi = e[5]
        sl = [slice(None)] * 3
        sl[a_s] = slice(0, t_lo)
        lo = t[tuple(sl)]
        sl[a_s] = slice(plo + phi - t_hi, plo + phi)
        hi = t[tuple(sl)]
        return lo, hi

    out = []
    for half, a_d, c_d, end, tshape, pads in dlay:
        got = sem_lo_hi(half, m[a_d], m[c_d])
        dst = np.zeros(tshape, np.float32)
        t_lo, t_hi = pads[0], pads[1]
        if got is not None:
            lo, hi = (np.transpose(v, m) for v in got)
            if a_d == 0:
                if end == "lo":
                    dst[:t_lo] = lo
                else:
                    dst[1: t_hi + 1] = hi
            else:
                plo, phi = pads[2], pads[3]
                sl = [slice(None)] * 3
                sl[a_d] = slice(0, t_lo)
                dst[tuple(sl)] = lo
                sl[a_d] = slice(plo + phi - t_hi, plo + phi)
                dst[tuple(sl)] = hi
        out.append(jnp.asarray(dst))
    return tuple(out)
