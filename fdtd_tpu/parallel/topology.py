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

__all__ = [
    "choose_mesh_shape",
    "make_mesh",
    "init_distributed",
    "make_multihost_mesh",
]


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


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed for a multi-host run; returns True when
    a multi-process runtime is (already or newly) active.

    On managed platforms (GKE/Borg TPU pods) ``jax.distributed.initialize``
    discovers everything from the environment, so all arguments are
    optional. Calling this when the single-process environment has no
    coordinator configured is a no-op — single-host meshes never require
    it. Idempotent: a second call is ignored."""
    import os

    if jax.process_count() > 1:
        return True  # already initialized by the launcher
    env_coord = os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
        "COORDINATOR_ADDRESS"
    )
    if coordinator_address is None and env_coord is None and (
        num_processes is None or num_processes <= 1
    ):
        return False
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError:
        # already initialized (race with the launcher) — fine
        pass
    return jax.process_count() > 1


def make_multihost_mesh(
    axis_names: Sequence[str] = ("x", "y"),
    *,
    dcn_axis: int = 0,
) -> Mesh:
    """Mesh spanning every process of a multi-host run.

    The process (DCN) dimension lands on ``axis_names[dcn_axis]`` and the
    per-slice devices factor over the remaining axes, so halo ppermutes
    along non-DCN axes ride ICI and only the one decomposition axis
    crosses the data-center network — the layout rule for FDTD's
    nearest-neighbor traffic (one halo exchange per step per axis; put
    the slowest link on the axis with the fewest exchanges).

    Single-process runs (this repo's test/bench environment) fall back to
    ``make_mesh`` over the local devices, so callers can use this
    unconditionally."""
    n_proc = jax.process_count()
    if n_proc == 1:
        return make_mesh(axis_names=axis_names)
    from jax.experimental import mesh_utils

    n_axes = len(axis_names)
    local = jax.local_device_count()
    ici_axes = [a for a in range(n_axes) if a != dcn_axis]
    ici_factors = choose_mesh_shape(local, len(ici_axes)) if ici_axes else ()
    ici_shape = [1] * n_axes
    for a, f in zip(ici_axes, ici_factors):
        ici_shape[a] = f
    dcn_shape = [1] * n_axes
    dcn_shape[dcn_axis] = n_proc
    arr = mesh_utils.create_hybrid_device_mesh(
        tuple(ici_shape), tuple(dcn_shape)
    )
    return Mesh(arr, tuple(axis_names))
