"""Tracing, timing spans, and runtime info.

Counterpart of the reference's observability stack (SURVEY.md §5): tracing
spans throughout (tracing_subscriber with env filter,
cem-app/src/main.rs:35-38) -> stdlib logging + a lightweight span tracer
with aggregated wall-time stats; ``format_size`` (cem-util/src/lib.rs:36-41);
the debug window's adapter/build info (cem-app/src/debug.rs:29-220) ->
``build_info()``. Log level follows the FDTD_TPU_LOG env var like RUST_LOG.
"""

from __future__ import annotations

import contextlib
import logging
import os
import time
from collections import defaultdict
from typing import Dict, Optional

__all__ = ["format_size", "trace_span", "Tracer", "get_tracer",
           "build_info", "enable_compilation_cache"]

_log = logging.getLogger("fdtd_tpu")
_level = os.environ.get("FDTD_TPU_LOG")
if _level:
    logging.basicConfig(level=_level.upper())


def format_size(num_bytes: float) -> str:
    """Human-readable byte size (cem-util/src/lib.rs:36-41)."""
    size = float(num_bytes)
    for unit in ("B", "KiB", "MiB", "GiB", "TiB"):
        if size < 1024.0 or unit == "TiB":
            return f"{size:.1f} {unit}" if unit != "B" else f"{int(size)} B"
        size /= 1024.0
    return f"{size:.1f} TiB"


class Tracer:
    """Aggregating span timer: per-name call count, total and max wall time.

    The counterpart of the reference's tracing spans + the solver/renderer
    timing counters (SolverState.last_step_time, RendererInfo throughput)."""

    def __init__(self):
        self.stats: Dict[str, Dict[str, float]] = defaultdict(
            lambda: {"count": 0, "total_s": 0.0, "max_s": 0.0}
        )

    @contextlib.contextmanager
    def span(self, name: str, **fields):
        t0 = time.perf_counter()
        _log.debug("span enter %s %s", name, fields or "")
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            s = self.stats[name]
            s["count"] += 1
            s["total_s"] += dt
            s["max_s"] = max(s["max_s"], dt)
            _log.debug("span exit %s: %.3f ms", name, dt * 1e3)

    def report(self) -> str:
        lines = [f"{'span':<32} {'count':>7} {'total':>10} {'mean':>10} {'max':>10}"]
        for name, s in sorted(self.stats.items()):
            mean = s["total_s"] / max(s["count"], 1)
            lines.append(
                f"{name:<32} {int(s['count']):>7} {s['total_s']*1e3:>8.1f}ms "
                f"{mean*1e3:>8.2f}ms {s['max_s']*1e3:>8.2f}ms"
            )
        return "\n".join(lines)

    def reset(self) -> None:
        self.stats.clear()


_global_tracer = Tracer()


def get_tracer() -> Tracer:
    return _global_tracer


def trace_span(name: str, **fields):
    """Span on the global tracer: ``with trace_span("voxelize"): ...``"""
    return _global_tracer.span(name, **fields)


def build_info() -> Dict[str, object]:
    """Runtime provenance (debug window analog, cem-app/src/debug.rs +
    build.rs git capture)."""
    import subprocess

    import jax

    import fdtd_tpu

    info: Dict[str, object] = {
        "fdtd_tpu": fdtd_tpu.__version__,
        "jax": jax.__version__,
        "backend": jax.default_backend(),
        "devices": [
            {"kind": d.device_kind, "id": d.id, "platform": d.platform}
            for d in jax.devices()
        ],
    }
    try:
        root = os.path.dirname(os.path.dirname(os.path.dirname(__file__)))
        commit = subprocess.run(
            ["git", "-C", root, "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=5,
        ).stdout.strip()
        if commit:
            info["git_commit"] = commit
    except Exception:  # noqa: BLE001 — provenance is best-effort
        pass
    return info


def enable_compilation_cache(path: str = "") -> str:
    """Point JAX's persistent compilation cache at an XDG cache dir.

    The temporally-blocked Mosaic kernels are compile-heavy (the
    compressed-material CPML K kernel takes minutes at high K); the
    persistent cache makes every compile a once-per-machine cost instead
    of once-per-process. Safe to call multiple times; respects an
    existing JAX_COMPILATION_CACHE_DIR. Returns the directory used."""
    import os

    import jax

    path = (
        path
        or os.environ.get("JAX_COMPILATION_CACHE_DIR")
        or os.path.join(
            os.environ.get("XDG_CACHE_HOME")
            or os.path.join(os.path.expanduser("~"), ".cache"),
            "fdtd-tpu", "xla",
        )
    )
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass  # older jax without the knobs: the env var still applies
    return path
