"""Reflective property editing (utils/inspect.py get/set/paths) — the
write half of the reference's cem-probe inspector (PropertiesUi +
TrackChanges, cem-probe/src/lib.rs:10-210): dotted paths matching
describe() read AND write entity/component properties, with composer
routing making each edit one undo step."""

import pytest

from fdtd_tpu.material import Material
from fdtd_tpu.scene import Ball, ComposerSession, Entity, Isometry
from fdtd_tpu.utils import inspect as ins


def _entity():
    return Entity(
        name="ball",
        shape=Ball(radius=1.5),
        pose=Isometry(translation=(1.0, 2.0, 3.0)),
        material=Material(relative_permittivity=4.0),
    )


def test_get_paths_match_describe():
    e = _entity()
    assert ins.get(e, "name") == "ball"
    assert ins.get(e, "shape.radius") == 1.5
    assert ins.get(e, "pose.translation.y") == 2.0
    assert ins.get(e, "pose.translation.1") == 2.0
    assert ins.get(e, "material.relative_permittivity") == 4.0
    # quaternion axis names are w-first (Isometry rotation layout)
    assert ins.get(e, "pose.rotation.w") == 1.0
    assert ins.get(e, "pose.rotation.x") == 0.0


def test_set_mutable_entity_in_place():
    e = _entity()
    out = ins.set(e, "name", "sphere")
    assert out is e and e.name == "sphere"


def test_set_through_frozen_chain_rebuilds():
    e = _entity()
    ins.set(e, "pose.translation.x", 9.0)
    # the frozen Isometry was REPLACED on the mutable entity
    assert e.pose.translation == (9.0, 2.0, 3.0)
    ins.set(e, "material.relative_permittivity", 8.0)
    assert e.material.relative_permittivity == 8.0
    ins.set(e, "shape.radius", 2.5)
    assert e.shape.radius == 2.5


def test_set_frozen_root_returns_replacement():
    iso = Isometry(translation=(0.0, 0.0, 0.0))
    out = ins.set(iso, "translation.z", 7.0)
    assert out is not iso
    assert out.translation == (0.0, 0.0, 7.0)
    assert iso.translation == (0.0, 0.0, 0.0)  # original untouched


def test_set_coerces_to_slot_type():
    e = _entity()
    ins.set(e, "pose.translation.x", 5)  # int into a float slot
    assert isinstance(e.pose.translation[0], float)
    ins.set(e, "shape.radius", "3.5")  # string into a float slot
    assert e.shape.radius == 3.5


def test_describe_set_describe_round_trip():
    e = _entity()
    before = ins.describe(e)
    assert "t=(1, 2, 3)" in before
    ins.set(e, "pose.translation.x", 4.0)
    after = ins.describe(e)
    assert "t=(4, 2, 3)" in after and before != after


def test_bad_paths_raise_keyerror_without_mutation():
    e = _entity()
    with pytest.raises(KeyError):
        ins.get(e, "nope")
    with pytest.raises(KeyError):
        ins.set(e, "pose.translation.q", 1.0)
    with pytest.raises(KeyError):
        ins.set(e, "pose.translation.7", 1.0)
    with pytest.raises(KeyError):
        ins.set(e, "material.not_a_field", 1.0)
    assert e.pose.translation == (1.0, 2.0, 3.0)  # untouched on failure


def test_composer_routing_is_one_undo_step():
    s = ComposerSession()
    e = s.add(Entity(name="a", shape=Ball(1.0),
                     pose=Isometry(translation=(1.0, 0.0, 0.0))))
    n_before = len(list(s.undo_buffer.iter_undo()))
    ins.set(e, "pose.translation.x", 6.0, composer=s)
    assert e.pose.translation[0] == 6.0
    labels = list(s.undo_buffer.iter_undo())
    assert len(labels) == n_before + 1 and "pose" in labels[0]
    assert s.undo() is not None
    assert e.pose.translation[0] == 1.0  # undone
    assert s.redo() is not None
    assert e.pose.translation[0] == 6.0  # redone


def test_composer_routing_top_level_field():
    s = ComposerSession()
    e = s.add(Entity(name="a", shape=Ball(1.0)))
    ins.set(e, "name", "renamed", composer=s)
    assert e.name == "renamed"
    s.undo()
    assert e.name == "a"


def test_paths_enumerates_inspector_rows():
    e = _entity()
    ps = ins.paths(e)
    for expect in ("name", "shape.radius", "pose.translation.x",
                   "pose.rotation.w", "material.relative_permittivity"):
        assert expect in ps, (expect, ps)
    # every enumerated path reads back
    for p in ps:
        ins.get(e, p)


def test_paths_skips_none_components():
    e = Entity(name="bare")
    ps = ins.paths(e)
    assert not any(p.startswith("material") for p in ps)
    assert not any(p.startswith("observer") for p in ps)
