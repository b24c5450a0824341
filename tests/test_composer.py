"""Headless composer tests (scene/composer.py vs the reference editor,
cem-app/src/composer/ — whose undo and clipboard are todo!() stubs; here
they must actually work)."""

import numpy as np
import pytest

from fdtd_tpu.material import Material
from fdtd_tpu.scene import (
    Ball,
    Composer,
    ComposerSession,
    Cuboid,
    Entity,
    Isometry,
    Scene,
)
from fdtd_tpu.scene.composer import CLIPBOARD_PREFIX


def _session():
    s = ComposerSession()
    a = s.add(Entity(name="a", shape=Ball(1.0),
                     material=Material(relative_permittivity=2.0)))
    b = s.add(Entity(name="b", shape=Cuboid((0.5, 0.5, 0.5)),
                     pose=Isometry(translation=(3.0, 0.0, 0.0))))
    return s, a, b


def test_add_delete_undo_restores_original_index():
    """Deleting then undoing must restore entities at their original list
    positions — Scene material priority is first-inserted-wins."""
    s, a, b = _session()
    s.selection.select(a)
    assert s.delete() == 1
    assert s.scene.entities == [b]
    assert s.undo() == "delete 1 entities"
    assert s.scene.entities == [a, b]  # a back at index 0, not appended
    assert s.redo() == "delete 1 entities"
    assert s.scene.entities == [b]


def test_new_edit_clears_redo_history():
    s, a, b = _session()
    s.delete([b])
    s.undo()
    assert s.has_redos()
    s.add(Entity(name="c"))
    assert not s.has_redos()  # standard editor semantics


def test_undo_limit_bounds_history():
    s = ComposerSession(undo_limit=2)
    for i in range(5):
        s.add(Entity(name=f"e{i}"))
    labels = [s.undo() for _ in range(3)]
    assert labels == ["create e4", "create e3", None]


def test_update_and_move_are_undoable():
    s, a, b = _session()
    old_pose = b.pose
    s.move(b, Isometry(translation=(9.0, 0.0, 0.0)))
    assert b.pose.translation == (9.0, 0.0, 0.0)
    s.rename(b, "bee")
    assert b.name == "bee"
    s.undo()
    assert b.name == "b"
    s.undo()
    assert b.pose == old_pose


def test_dirty_flag_and_tab_title(tmp_path):
    s, a, b = _session()
    assert s.tab_title() == "untitled*"
    s.save_file(tmp_path / "doc.json")
    assert s.tab_title() == "doc"
    s.rename(a, "aa")
    assert s.tab_title() == "doc*"
    s.save_file()  # save-in-place reuses the remembered path
    assert not s.dirty


def test_save_requires_a_path():
    s = ComposerSession()
    with pytest.raises(ValueError, match="no save path"):
        s.save_file()


def test_copy_paste_round_trip():
    s, a, b = _session()
    s.selection.select(a)
    text = s.copy()
    assert text.startswith(CLIPBOARD_PREFIX)
    pasted = s.paste()
    assert len(pasted) == 1
    assert len(s.scene.entities) == 3
    clone = pasted[0]
    assert clone is not a and clone.name == "a"
    assert isinstance(clone.shape, Ball)
    assert clone.material.relative_permittivity == 2.0
    s.undo()
    assert len(s.scene.entities) == 2


def test_paste_into_another_session():
    """Clipboard text is self-contained — the cross-process paste the
    reference TODOs (menubar.rs:75-76)."""
    s1, a, _ = _session()
    text = s1.copy([a])
    s2 = ComposerSession()
    pasted = s2.paste(text)
    assert len(pasted) == 1 and pasted[0].name == "a"


def test_copy_flattens_parented_pose():
    s = ComposerSession()
    parent = s.add(Entity(name="p", pose=Isometry(translation=(1.0, 0, 0))))
    child = s.add(Entity(name="c", shape=Ball(0.5),
                         pose=Isometry(translation=(0.0, 2.0, 0.0)),
                         parent=parent))
    pasted = s.paste(s.copy([child]))[0]
    assert pasted.parent is None
    assert np.allclose(pasted.pose.translation, (1.0, 2.0, 0.0))


def test_cut_copies_then_deletes():
    s, a, b = _session()
    text = s.cut([b])
    assert s.scene.entities == [a]
    s.paste(text)
    assert [e.name for e in s.scene.entities] == ["a", "b"]


def test_paste_rejects_foreign_text():
    s = ComposerSession()
    with pytest.raises(ValueError, match="clipboard"):
        s.paste("hello world")
    assert s.paste(None) == []  # empty clipboard is a no-op


def test_tree_and_properties_views():
    s, a, b = _session()
    assert "a" in s.tree() and "b" in s.tree()
    assert "Ball" in s.properties(a)


def test_select_at_through_camera():
    s = ComposerSession()
    ball = s.add(Entity(name="a", shape=Ball(1.0)))
    s.fit_camera_along_axis("-z")
    hit = s.select_at((0.0, 0.0))  # centered fit: the ball is mid-screen
    assert hit is not None
    assert s.selection.entities() == [ball]
    # clicking empty space clears a non-additive selection
    s.select_at((0.95, 0.95))
    assert s.selection.is_empty()


def test_fit_camera_along_axis_points_correctly():
    s, a, b = _session()
    for axis, direction in (("+x", (1, 0, 0)), ("-y", (0, -1, 0))):
        s.fit_camera_along_axis(axis)
        fwd = s.camera.forward
        assert np.allclose(fwd, direction, atol=1e-9)


def test_render_snapshot(tmp_path):
    s, a, b = _session()
    s.fit_camera_along_axis("-z")
    p = s.render(tmp_path / "view.png", width=64, height=48)
    assert p.exists()


def test_run_solver_spawns_paused_and_steps(tmp_path):
    from fdtd_tpu.config import SolverConfig
    from fdtd_tpu.constants import REDUCED
    from fdtd_tpu.scene import SourceSpec
    from fdtd_tpu.solver.sources import GaussianPulse

    s = ComposerSession()
    s.add(Entity(name="src", shape=Ball(0.4),
                 source=SourceSpec(waveform=GaussianPulse(2.0, 0.5),
                                   j=(0.0, 0.0, 1.0))))
    with pytest.raises(ValueError, match="no solvers"):
        s.run_solver()
    s.configure_solver(SolverConfig(label="quick", dx=0.2, step_limit=4,
                                    unit_system="reduced",
                                    volume_margin=1.0))
    runner = s.run_solver(constants=REDUCED)
    assert runner.stats().paused
    runner.resume()
    runner.join(timeout=120)
    assert runner.error is None
    assert runner.stats().sim_tick == 4


def test_composer_tabs(tmp_path):
    c = Composer()
    assert not c.has_file_open()
    s1 = c.new_file()
    s1.add(Entity(name="x", shape=Ball(1.0)))
    s1.save_file(tmp_path / "one.json")
    s2 = c.open_file(tmp_path / "one.json")
    assert c.active is s2
    assert [e.name for e in s2.scene.entities] == ["x"]
    assert c.save_path() == tmp_path / "one.json"
    c.close_file()
    assert c.active is s1
    c.close_file()
    assert not c.has_file_open()


def test_visual_component_round_trips_project_files(tmp_path):
    from fdtd_tpu.io.project import load_project, save_project
    from fdtd_tpu.viz import MATERIAL_PRESETS

    scene = Scene([Entity(name="g", shape=Ball(1.0),
                          visual=MATERIAL_PRESETS["gold"])])
    save_project(tmp_path / "v.json", scene)
    back = load_project(tmp_path / "v.json")
    v = back.entities[0].visual
    assert v == MATERIAL_PRESETS["gold"]
