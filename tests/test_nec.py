"""NEC parser/interpreter + scene population tests."""

import math

import numpy as np
import pytest

import fdtd_tpu as ft
from fdtd_tpu.io import NecError, parse_nec, populate_scene_with_nec
from fdtd_tpu.io.nec import FixedSegments, TaperedSegments, Wire
from fdtd_tpu.scene import Scene

DIPOLE_DECK = """\
CM half-wave dipole
CM test deck
CE
GW 1 9 0 0 -0.25 0 0 0.25 0.001
GE 0
EX 0 1 5 0 1
"""


def test_parse_dipole():
    nec = parse_nec(DIPOLE_DECK)
    assert nec.comments == ["half-wave dipole", "test deck"]
    wires = nec.wires()
    assert len(wires) == 1
    tag, wire, transform = wires[0]
    assert tag == 1 and wire.num_segments == 9
    assert isinstance(wire.segments, FixedSegments)
    np.testing.assert_allclose(transform, np.eye(4))
    # program-control cards after GE are not parsed (GE ends input,
    # parser.rs GE handling)
    assert nec.ignored_decks == []


def test_parse_tapered_gc():
    deck = "CE\nGW 2 4 0 0 0 0 0 1 0\nGC 0.8 0.01 0.002\nGE\n"
    nec = parse_nec(deck)
    _, wire, _ = nec.wires()[0]
    assert isinstance(wire.segments, TaperedSegments)
    dims = list(wire.segments.dimensions(4, 1.0))
    assert len(dims) == 4
    # lengths shrink by the ratio and sum to the wire length
    lengths = [d[0] for d in dims]
    assert lengths[1] == pytest.approx(lengths[0] * 0.8)
    assert sum(lengths) == pytest.approx(1.0)
    # radii taper from first to last
    assert dims[0][1] == pytest.approx(0.01)
    assert dims[-1][1] == pytest.approx(0.002)


def test_gm_moves_and_copies():
    deck = (
        "CE\n"
        "GW 1 3 0 0 0 1 0 0 0.01\n"
        "GM 10 2 0 0 0 0 0 1\n"  # two copies shifted +z, tags +10
        "GE\n"
    )
    nec = parse_nec(deck)
    tags = [t for t, _ in nec.geometry]
    assert tags == [1, 11, 21]
    for t, g in nec.geometry:
        e1, e2 = g.spec.world_ends(g.transform)
        expected_z = {1: 0.0, 11: 1.0, 21: 2.0}[t]
        assert e1[2] == pytest.approx(expected_z)


def test_gs_scales_geometry_and_radii():
    deck = "CE\nGW 1 1 0 0 0 0 0 2 0.05\nGS 0 0 3\nGE\n"
    nec = parse_nec(deck)
    _, wire, transform = nec.wires()[0]
    e1, e2 = wire.world_ends(transform)
    assert np.linalg.norm(e2 - e1) == pytest.approx(6.0)
    assert wire.segments.radius == pytest.approx(0.15)


def test_gx_reflection():
    deck = "CE\nGW 1 1 0.5 0 0.2 1 0 0.2 0.01\nGX 100 100\nGE\n"
    nec = parse_nec(deck)  # reflect about x (bits "100" -> X)
    tags = [t for t, _ in nec.geometry]
    assert tags == [1, 101]
    _, g = nec.geometry[1]
    e1, _ = g.spec.world_ends(g.transform)
    assert e1[0] == pytest.approx(-0.5)
    assert e1[2] == pytest.approx(0.2)


def test_gr_rotational_copies():
    deck = "CE\nGW 1 1 1 0 0 2 0 0 0.01\nGR 10 4\nGE\n"
    nec = parse_nec(deck)
    assert len(nec.geometry) == 4
    assert nec.symmetry == "rotational"
    # copies are rotated about z by 90 degree steps
    ends = sorted(
        tuple(np.round(g.spec.world_ends(g.transform)[0], 6))
        for _, g in nec.geometry
    )
    assert (1.0, 0.0, 0.0) in ends and (-1.0, -0.0, 0.0) in ends or (
        (-1.0, 0.0, 0.0) in ends
    )


def test_parse_errors():
    with pytest.raises(NecError, match="SC card without"):
        parse_nec("CE\nSC 0 0 1 1 1\nGE\n")
    with pytest.raises(NecError, match="expected GC"):
        parse_nec("CE\nGW 1 1 0 0 0 0 0 1 0\nGW 2 1 0 0 0 0 0 1 0.1\nGE\n")
    with pytest.raises(NecError, match="unexpected GA"):
        parse_nec("GA 1 1 1 0 90 0.1\n")


def test_populate_scene_wire_orientation():
    """Wire direction must survive into cylinder poses (the reference loses
    it, nec.rs:60-70)."""
    nec = parse_nec("CE\nGW 1 4 0 0 -1 0 0 1 0.05\nGE\n")
    scene = Scene()
    n = populate_scene_with_nec(scene, nec)
    assert n == 4
    # wire along z: all cylinder segments must contain points on the z axis
    pts = np.array([[0, 0, 0, 0], [0, 0, 0, 0], [-0.75, -0.25, 0.25, 0.75]])
    hits = np.zeros(4, bool)
    for e in scene.entities:
        hits |= e.contains_world(pts)
    assert hits.all()
    # and NOT points on the y axis (would indicate the reference's
    # y-aligned-cylinder bug)
    off = np.array([[0.0], [0.75], [0.0]])
    assert not any(e.contains_world(off)[0] for e in scene.entities)
    assert all(e.material.is_pec() for e in scene.entities)


def test_nec_voxelizes_to_pec():
    from fdtd_tpu.scene import Volume, compile_scene

    nec = parse_nec("CE\nGW 1 5 0 0 -1 0 0 1 0.08\nGE\n")
    scene = Scene()
    populate_scene_with_nec(scene, nec, min_radius=0.11)
    res = ft.Resolution.courant(0.1, ft.REDUCED, safety=0.9)
    compiled = compile_scene(
        scene, res, constants=ft.REDUCED, volume=Volume.fixed((1.5, 1.5, 1.5))
    )
    assert compiled.num_materials == 2
    pec_cells = int((compiled.matid > 0).sum())
    # ~wire length (2.0) / dx (0.1) = 20 cells of at least 1 cell cross-section
    assert pec_cells >= 20


def test_gs_after_copies_scales_once():
    """GS after GR copies must scale each wire once — shared spec objects
    used to compound the factor per copy (review finding)."""
    deck = "CE\nGW 1 1 1 0 0 2 0 0 0.01\nGR 10 4\nGS 0 0 2.0\nGE\n"
    nec = parse_nec(deck)
    assert len(nec.geometry) == 4
    for _, g in nec.geometry:
        assert g.spec.segments.radius == pytest.approx(0.02)  # not 0.16


def test_gm_with_tag_start_field():
    """A 9-field GM card (ITS/tag_start) must parse, not IndexError."""
    deck = (
        "CE\n"
        "GW 1 1 0 0 0 1 0 0 0.01\n"
        "GW 5 1 0 0 1 1 0 1 0.01\n"
        "GM 0 0 0 0 0 0 0 1 5\n"  # move only tags >= 5 by +z
        "GE\n"
    )
    nec = parse_nec(deck)
    by_tag = dict(nec.geometry)
    e1, _ = by_tag[1].spec.world_ends(by_tag[1].transform)
    e5, _ = by_tag[5].spec.world_ends(by_tag[5].transform)
    assert e1[2] == pytest.approx(0.0)  # untouched
    assert e5[2] == pytest.approx(2.0)  # 1 + 1


def test_wire_arc_populates_scene():
    """GA arcs polyline into oriented cylinder segments."""
    deck = "CE\nGA 1 8 2.0 0 180 0.05\nGE\n"
    nec = parse_nec(deck)
    scene = Scene()
    n = populate_scene_with_nec(scene, nec)
    assert n == 8
    # arc of radius 2 in the y=0 plane: the point (0, 0, 2) (90 deg) lies on it
    pts = np.array([[0.0], [0.0], [2.0]])
    assert any(e.contains_world(pts)[0] for e in scene.entities)
    # and the center does not
    assert not any(e.contains_world(np.zeros((3, 1)))[0] for e in scene.entities)


def test_duplicate_tags_keep_all_wires():
    """NEC2 allows several GW cards with the same tag; all must survive
    (the reference's BTreeMap drops all but the last — documented
    divergence)."""
    deck = """CE two wires, one tag
GW 1 3 0 0 0 0 0 1 .01
GW 1 5 0 0 1 0 1 1 .01
GE 0
"""
    nf = parse_nec(deck)
    wires = nf.wires()
    assert len(wires) == 2
    assert [w[0] for w in wires] == [1, 1]
    assert sorted(w[1].num_segments for w in wires) == [3, 5]


def test_gc_zero_radius_rejected():
    deck = """CE bad taper
GW 1 4 0 0 0 0 0 1 0
GC 1.0 0.0 .02
GE 0
"""
    with pytest.raises(NecError, match="radii must be positive"):
        parse_nec(deck)


def test_surface_patches_populate_scene():
    """SP/SC patches -> thin Quad entities (round 3; the reference
    todo!()s patches entirely, nec-file/src/interpreter.rs
    surface_patch): a rectangular SP+SC maps exactly (center, in-plane
    extents, orientation), an arbitrary SP becomes an area-equivalent
    square oriented by its elevation/azimuth normal."""
    from fdtd_tpu.scene import Quad

    deck = """CE
SP 0 1 0 0 0 2 0 0
SC 0 0 2 1 0
SP 0 0 1 2 3 90 0 4
GE 0
"""
    nec = parse_nec(deck)
    kinds = sorted(
        g.spec.kind for _, g in nec.geometry if hasattr(g.spec, "kind")
    )
    assert kinds == ["arbitrary", "rectangular"]
    scene = Scene()
    n = populate_scene_with_nec(scene, nec, patch_half_thickness=0.25)
    assert n == 2

    def rot(q):
        w, x, y, z = q
        return np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
            [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
            [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
        ])

    by_name = {e.name: e for e in scene.entities}
    rect = next(e for name, e in by_name.items() if "-0-1" in name)
    assert isinstance(rect.shape, Quad)
    np.testing.assert_allclose(rect.shape.half_extents, (1.0, 0.5))
    assert rect.shape.half_thickness == 0.25
    np.testing.assert_allclose(rect.pose.translation, (1.0, 0.5, 0.0))
    r = rot(rect.pose.rotation)
    np.testing.assert_allclose(r @ [0, 0, 1], [0, 0, 1], atol=1e-12)
    np.testing.assert_allclose(r @ [1, 0, 0], [1, 0, 0], atol=1e-12)

    arb = next(e for name, e in by_name.items() if "--1-0" in name)
    np.testing.assert_allclose(arb.shape.half_extents, (1.0, 1.0))  # area 4
    np.testing.assert_allclose(arb.pose.translation, (1.0, 2.0, 3.0))
    r2 = rot(arb.pose.rotation)
    # elevation 90 deg -> +z normal (local z maps onto it)
    np.testing.assert_allclose(np.abs(r2 @ [0, 0, 1]), [0, 0, 1], atol=1e-9)
