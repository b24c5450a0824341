"""Parent transforms, plugins, ray casting, describe, formats, preview."""

import numpy as np
import pytest

import fdtd_tpu as ft
from fdtd_tpu.io import load_scene_file, save_project, supported_extensions
from fdtd_tpu.scene import Ball, Cuboid, Entity, Isometry, Plugin, Scene
from fdtd_tpu.utils import describe
from fdtd_tpu.viz import render_scene_preview


def test_parent_transform_composition():
    parent = Entity(name="rig", pose=Isometry.from_axis_angle((0, 0, 1), np.pi / 2,
                                                              translation=(10, 0, 0)))
    child = Entity(name="ball", shape=Ball(1.0),
                   pose=Isometry.from_translation((2, 0, 0)), parent=parent)
    # child local +x maps through parent's 90deg z-rotation to +y
    g = child.global_pose()
    np.testing.assert_allclose(g.translation, (10, 2, 0), atol=1e-12)
    assert child.contains_world(np.array([[10.0], [2.0], [0.0]]))[0]
    assert not child.contains_world(np.array([[12.0], [0.0], [0.0]]))[0]


def test_plugin_dedup():
    calls = []

    class P(Plugin):
        def setup(self, scene):
            calls.append(1)
            scene.spawn(shape=Ball(1.0), material=ft.VACUUM)

    scene = Scene()
    assert scene.add_plugin(P()) is True
    assert scene.add_plugin(P()) is False  # type-deduplicated
    assert len(calls) == 1 and len(scene.entities) == 1


def test_cast_ray():
    scene = Scene()
    near = scene.spawn(name="near", shape=Ball(1.0),
                       pose=Isometry.from_translation((5, 0, 0)))
    scene.spawn(name="far", shape=Cuboid((1, 1, 1)),
                pose=Isometry.from_translation((10, 0, 0)))
    hit = scene.cast_ray((0, 0, 0), (1, 0, 0))
    assert hit is not None and hit[0] is near
    assert hit[1] == pytest.approx(4.0, abs=1e-3)
    assert scene.cast_ray((0, 0, 0), (0, 1, 0), max_dist=50) is None


def test_describe():
    from fdtd_tpu.models.example import example_scene

    text = describe(example_scene())
    assert "Scene (5 entities)" in text
    assert "relative_permittivity: 3.9" in text
    assert "ContinuousWave" in text


def test_load_scene_file_registry(tmp_path):
    assert set(supported_extensions()) >= {"json", "nec", "fdtd"}
    scene = Scene()
    scene.spawn(name="b", shape=Ball(1.0), material=ft.VACUUM)
    p = save_project(tmp_path / "s.json", scene)
    loaded = load_scene_file(p)
    assert len(loaded.entities) == 1
    nec = tmp_path / "a.nec"
    nec.write_text("CE\nGW 1 2 0 0 -1 0 0 1 0.1\nGE\n")
    loaded = load_scene_file(nec)
    assert len(loaded.entities) == 2  # two wire segments
    with pytest.raises(ValueError, match="unsupported"):
        load_scene_file(tmp_path / "x.obj")


def test_render_scene_preview(tmp_path):
    from fdtd_tpu.models.example import example_scene

    out = render_scene_preview(example_scene(), tmp_path / "preview.png")
    assert out.exists() and out.stat().st_size > 5000


def test_cli_nec_info_and_preview(tmp_path, capsys):
    from fdtd_tpu.cli import main

    nec = tmp_path / "a.nec"
    nec.write_text("CM demo\nCE\nGW 7 3 0 0 -1 0 0 1 0.1\nGE 1\n")
    assert main(["nec-info", str(nec)]) == 0
    out = capsys.readouterr().out
    assert "comment: demo" in out and "wire tag=7" in out
    assert "ground plane: present_modified" in out

    assert main(["preview", str(nec), "--out", str(tmp_path / "p.png")]) == 0
    assert (tmp_path / "p.png").exists()
