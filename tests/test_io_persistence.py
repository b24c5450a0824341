"""Checkpoint/resume and project save/load round-trips."""

import dataclasses

import jax.numpy as jnp
import numpy as np

import fdtd_tpu as ft
from fdtd_tpu.io.checkpoint import load_checkpoint, save_checkpoint
from fdtd_tpu.io.project import load_project, save_project
from fdtd_tpu.models.example import example_scene
from fdtd_tpu.solver.cpml import Cpml


def _sim(cpml=None):
    res = ft.Resolution.courant(1.0, ft.REDUCED, safety=0.9)
    grid = ft.Grid(shape=(12, 8, 8), resolution=res, constants=ft.REDUCED)
    table = ft.coefficient_table([ft.VACUUM], res, ft.REDUCED)
    src = ft.SourceSet.build(
        [ft.PointSource((6, 4, 4), ft.GaussianPulse(5 * grid.dt, 2 * grid.dt), j=(0, 0, 1.0))]
    )
    return ft.Simulation(
        grid=grid,
        coeffs=ft.CellCoefficients.uniform(table[0], jnp.float32),
        sources=src,
        cpml=cpml,
    )


def test_checkpoint_resume_bit_exact(tmp_path):
    """resume(checkpoint(run(n))) + run(m) == run(n + m)."""
    sim = _sim()
    s = sim.init()
    for _ in range(5):
        s = sim.step(s)
    p = save_checkpoint(tmp_path / "ck.npz", s, metadata={"shape": [12, 8, 8]})

    restored, meta = load_checkpoint(p, template=sim.init())
    assert meta["shape"] == [12, 8, 8]
    assert int(restored.tick) == 5
    for _ in range(3):
        restored = sim.step(restored)

    ref = sim.init()
    for _ in range(8):
        ref = sim.step(ref)
    np.testing.assert_array_equal(restored.e_stacked(), ref.e_stacked())
    np.testing.assert_array_equal(restored.h_stacked(), ref.h_stacked())


def test_checkpoint_engine_state_with_psi(tmp_path):
    sim = _sim(cpml=Cpml(thickness=((3, 3), (0, 0), (0, 0))))
    s = sim.init()
    for _ in range(4):
        s = sim.step(s)
    p = save_checkpoint(tmp_path / "ck.npz", s)
    restored, _ = load_checkpoint(p, template=sim.init())
    np.testing.assert_array_equal(
        np.asarray(restored.psi_h[3]), np.asarray(s.psi_h[3])
    )
    restored = sim.step(restored)
    assert int(restored.tick) == 5


def test_checkpoint_shape_mismatch_rejected(tmp_path):
    import pytest

    sim = _sim()
    s = sim.init()
    p = save_checkpoint(tmp_path / "ck.npz", s)
    other = ft.zero_state((4, 8, 8))
    with pytest.raises(ValueError, match="shape mismatch"):
        load_checkpoint(p, template=other)


def test_checkpoint_dtype_narrowing_warns(tmp_path):
    """Restoring an f64 checkpoint into an f32 template must warn about
    the precision loss (ADVICE r1: the silent cast hid it)."""
    import warnings

    import pytest

    sim = _sim()
    s = sim.init()
    wide = s._replace(
        **{k: jnp.asarray(getattr(s, k), jnp.float64)
           for k in ("ex", "ey", "ez", "hx", "hy", "hz")}
    )
    p = save_checkpoint(tmp_path / "ck.npz", wide)
    with pytest.warns(UserWarning, match="narrowed"):
        restored, _ = load_checkpoint(p, template=sim.init())
    assert restored.e[0].dtype == s.e[0].dtype
    # same-dtype restore stays silent
    p2 = save_checkpoint(tmp_path / "ck2.npz", s)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        load_checkpoint(p2, template=sim.init())


def test_project_roundtrip(tmp_path):
    scene = example_scene()
    p = save_project(tmp_path / "scene.json", scene)
    loaded = load_project(p)
    assert len(loaded.entities) == len(scene.entities)
    for a, b in zip(scene.entities, loaded.entities):
        assert a.name == b.name
        assert type(a.shape) is type(b.shape)
        assert a.pose == b.pose
        assert a.material == b.material
        if a.source is not None:
            assert dataclasses.asdict(a.source.waveform) == dataclasses.asdict(
                b.source.waveform
            )
            assert tuple(a.source.j) == tuple(b.source.j)
        assert (a.observer is None) == (b.observer is None)


def test_project_roundtrip_compiles_identically(tmp_path):
    from fdtd_tpu.scene import Volume, compile_scene

    scene = example_scene()
    loaded = load_project(save_project(tmp_path / "s.json", scene))
    res = ft.Resolution.courant(0.25, ft.REDUCED, safety=0.9)
    vol = Volume.fixed((4.0, 4.0, 4.0))
    c1 = compile_scene(scene, res, constants=ft.REDUCED, volume=vol)
    c2 = compile_scene(loaded, res, constants=ft.REDUCED, volume=vol)
    np.testing.assert_array_equal(c1.matid, c2.matid)
    assert c1.sources.num_sources == c2.sources.num_sources


def test_project_bad_magic(tmp_path):
    import pytest

    f = tmp_path / "bad.json"
    f.write_text('{"magic": "nope"}')
    with pytest.raises(ValueError, match="not a"):
        load_project(f)
