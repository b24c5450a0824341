"""Vectorized scene voxelization -> compressed material-index buffer.

Replaces the reference's per-cell BVH point-query loop
(cem-app/src/solver/runner.rs:566-676 + cem-solver/src/fdtd/cpu/mod.rs:244-264)
with whole-grid vector evaluation: each material entity tests containment of
every cell center at once; the first-inserted entity claims contested cells
(deterministic version of "first material found", runner.rs:616-631). The
result is the compressed uint8/uint16 index buffer into a (K, 4) coefficient
table — the reference's own TODO (/root/reference/README.md:25-28).

Voxelization is chunked along x to bound host memory on large lattices.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from ..material import Material, MaterialTable, VACUUM
from .scene import Scene
from .transform import CoordinateTransforms

__all__ = ["voxelize_materials"]

_CHUNK_CELLS = 8_000_000


def voxelize_materials(
    scene: Scene,
    transforms: CoordinateTransforms,
    default_material: Material = VACUUM,
    use_native: bool = True,
) -> Tuple[np.ndarray, MaterialTable]:
    """Return (matid array (nx, ny, nz), material table).

    Cell sample positions are the integer lattice points mapped to world
    space, exactly like the reference's per-cell queries (runner.rs:616-631).
    """
    nx, ny, nz = transforms.lattice_size
    table = MaterialTable(default_material)
    entities = scene.materials()
    mat_ids = [table.register(e.material) for e in entities]

    # native C++/OpenMP fast path (fdtd_tpu/native.py); None -> NumPy path
    native = None
    if use_native:
        from ..native import native_voxelize

        native = native_voxelize(scene, transforms, table)
    if native is not None:
        if len(table) <= 256:
            native = native.astype(np.uint8)
        return native, table

    matid = np.zeros((nx, ny, nz), np.uint16)

    chunk_x = max(1, _CHUNK_CELLS // max(ny * nz, 1))
    ys = np.arange(ny, dtype=np.float64)
    zs = np.arange(nz, dtype=np.float64)
    for x0 in range(0, nx, chunk_x):
        x1 = min(x0 + chunk_x, nx)
        xs = np.arange(x0, x1, dtype=np.float64)
        pts = np.stack(np.meshgrid(xs, ys, zs, indexing="ij"), axis=0)
        world = transforms.solver_to_world(pts)
        assigned = np.zeros(world.shape[1:], bool)
        out = matid[x0:x1]
        w_min = world.reshape(3, -1).min(axis=1)
        w_max = world.reshape(3, -1).max(axis=1)
        for e, mid in zip(entities, mat_ids):
            # cheap reject: skip entities whose AABB misses the chunk
            ab = e.world_aabb()
            if ab is not None:
                if np.any(ab[1] < w_min) or np.any(ab[0] > w_max):
                    continue
            mask = e.contains_world(world) & ~assigned
            out[mask] = mid
            assigned |= mask

    if len(table) <= 256:
        matid = matid.astype(np.uint8)
    return matid, table
