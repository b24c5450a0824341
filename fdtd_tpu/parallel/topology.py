"""Device mesh construction for domain decomposition.

The reference has no distributed computing at all (SURVEY.md §2.7); this
module is the scale-out layer BASELINE config 5 requires: the (x, y, z)
lattice is sharded over a named 2D/3D device mesh, halo exchange rides ICI
via ppermute (see sharded.py).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

__all__ = ["choose_mesh_shape", "make_mesh"]


def choose_mesh_shape(n_devices: int, n_axes: int = 2) -> Tuple[int, ...]:
    """Factor n_devices into up to n_axes near-equal factors, largest first.

    FDTD halo traffic per device scales with the shard's surface area, so
    near-cubic (or near-square for 2D decomposition) shards minimize
    communication.
    """
    shape = [1] * n_axes
    remaining = n_devices
    for i in range(n_axes - 1):
        # largest factor <= remaining ** (1/(n_axes - i))
        target = round(remaining ** (1.0 / (n_axes - i)))
        f = 1
        for cand in range(target, 0, -1):
            if remaining % cand == 0:
                f = cand
                break
        shape[i] = f
        remaining //= f
    shape[-1] = remaining
    shape.sort(reverse=True)
    return tuple(shape)


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("x", "y"),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a named mesh over the available devices.

    With TPU hardware jax.devices() ordering follows the physical torus, so a
    reshaped contiguous mesh keeps ppermute neighbors ICI-adjacent.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = devices[:n_devices]
    shape = choose_mesh_shape(n_devices, len(axis_names))
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, tuple(axis_names))
