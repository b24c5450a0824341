"""Tracing spans, format_size, build info."""

import time

from fdtd_tpu.utils import Tracer, build_info, format_size


def test_format_size():
    assert format_size(512) == "512 B"
    assert format_size(136 * 512**3) == "17.0 GiB"
    assert format_size(64 * 256**3).endswith("GiB")


def test_tracer_spans():
    t = Tracer()
    with t.span("step"):
        time.sleep(0.01)
    with t.span("step"):
        pass
    s = t.stats["step"]
    assert s["count"] == 2
    assert s["total_s"] >= 0.01
    assert "step" in t.report()


def test_build_info():
    info = build_info()
    assert info["backend"] == "cpu"
    assert info["devices"]


def test_enable_compilation_cache(tmp_path, monkeypatch):
    from fdtd_tpu.utils.observability import enable_compilation_cache

    monkeypatch.delenv("JAX_COMPILATION_CACHE_DIR", raising=False)
    target = str(tmp_path / "xla-cache")
    got = enable_compilation_cache(target)
    assert got == target
    import os
    assert os.path.isdir(target)
    # env var wins when set and no explicit path is given
    monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", str(tmp_path / "env"))
    assert enable_compilation_cache() == str(tmp_path / "env")
