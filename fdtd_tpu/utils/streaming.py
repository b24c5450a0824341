"""Asynchronous device->host streaming for probes and observation frames.

The remote-tunneled TPU's device_get round trip is ~10-30 ms — at
cadence-1 observation it dominates the step loop (BENCH probe/1step:
0.64 vs 41.3 Gcell/s compute at 256^3) because a blocking
``np.asarray(trace)`` serializes host and chip: the host cannot
dispatch step k+1 until frame k has crossed the tunnel. The fix is the
classic double buffer (SURVEY §5 "async device_get"): start the D2H
copy with ``jax.Array.copy_to_host_async()``, dispatch the next step
immediately (JAX dispatch is asynchronous), and harvest frame k only
after step k+1 is already in flight — readback latency then overlaps
device compute, and the steady-state rate is max(compute, readback)
instead of their sum.

Reference counterpart: the wgpu backend's per-tick blocking buffer poll
(cem-solver/src/fdtd/wgpu/mod.rs:98-107) — the reference pays the stall
every tick; this module exists because a tunneled TPU makes that stall
three orders of magnitude more expensive than a PCIe readback.
"""

from __future__ import annotations

from collections import deque
from typing import Any, Iterator, List, Optional, Tuple

import jax
import numpy as np

__all__ = ["AsyncHarvest"]


def _start_async(tree: Any) -> Any:
    """Kick off D2H copies for every device-array leaf (no-op leaves
    pass through: CPU backends and plain numpy have nothing to copy)."""
    for leaf in jax.tree_util.tree_leaves(tree):
        fn = getattr(leaf, "copy_to_host_async", None)
        if fn is not None:
            fn()
    return tree


def _to_host(tree: Any) -> Any:
    return jax.tree_util.tree_map(np.asarray, tree)


class AsyncHarvest:
    """Depth-bounded double buffer for device->host result streaming.

    Usage (probe loop)::

        stream = AsyncHarvest(depth=1)
        for _ in range(n):
            state, trace = step_and_sample(state)      # async dispatch
            for host_trace, tick in stream.push(trace, tick):
                consume(host_trace, tick)              # k-1 while k runs
        for host_trace, tick in stream.drain():
            consume(host_trace, tick)

    ``depth`` is the number of in-flight frames (1 = classic double
    buffer). push() starts the async copy and returns the frames that
    fell out of the window — already resident host-side by the time
    they are returned, so the np.asarray there is (near-)free.
    """

    def __init__(self, depth: int = 1):
        if depth < 0:
            raise ValueError(f"depth must be >= 0, got {depth}")
        self.depth = depth
        self._q: deque = deque()

    def __len__(self) -> int:
        return len(self._q)

    def push(self, tree: Any, meta: Any = None) -> List[Tuple[Any, Any]]:
        """Enqueue a device pytree (starts its D2H copy); return the
        [(host_tree, meta)] entries that left the in-flight window
        (empty until the window fills)."""
        self._q.append((_start_async(tree), meta))
        out = []
        while len(self._q) > self.depth:
            t, m = self._q.popleft()
            out.append((_to_host(t), m))
        return out

    def drain(self) -> List[Tuple[Any, Any]]:
        """Harvest every in-flight frame (end of run / flush point)."""
        out = []
        while self._q:
            t, m = self._q.popleft()
            out.append((_to_host(t), m))
        return out

    def __iter__(self) -> Iterator[Tuple[Any, Any]]:
        return iter(self.drain())
