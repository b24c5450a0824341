"""NEC2 antenna-deck parser and interpreter.

Counterpart of the reference's nec-file crate: line-oriented card parsing
(nec-file/src/parser.rs:48-102) with the same card coverage — CM, CE, GA,
GC, GE, GM, GR, GS, GW, GX, SP, SC (card.rs:14-64) — folded into a geometry
buffer with accumulated transforms (interpreter.rs:40-101). Format per the
NEC2 manual: free-format whitespace-separated fields, comments section
(CM/CE) then geometry section ended by GE.

Deliberate fixes over the reference (documented divergences):
- wires keep their true endpoints, so direction survives transforms (the
  reference stores an identity rotation and loses wire orientation,
  interpreter.rs wire_specification + the y-axis cylinders in
  cem-app/src/composer/file_formats/nec.rs:35-80);
- GR generates num_copies rotational copies (the reference's
  `num_copies.min(1)` clamp makes every GR a plain move, interpreter.rs
  generate_cylindrical_structure);
- a stray "SC" outside an SP continuation is reported as an error (the
  reference's FromStr maps "SC" to Sp, card.rs:63).
"""

from __future__ import annotations

import dataclasses
import io
import math
from typing import List, Optional, Sequence, Tuple, Union

import numpy as np

__all__ = [
    "NecError",
    "NecFile",
    "Wire",
    "WireArc",
    "SurfacePatch",
    "FixedSegments",
    "TaperedSegments",
    "parse_nec",
]


class NecError(ValueError):
    pass


@dataclasses.dataclass(frozen=True)
class FixedSegments:
    """Equal-length segments with one radius (card.rs WireSegments::Fixed)."""

    radius: float

    def dimensions(self, num_segments: int, total_length: float):
        """Yield (length, start_radius, end_radius) per segment
        (card.rs:136-299)."""
        seg = total_length / num_segments
        for _ in range(num_segments):
            yield (seg, self.radius, self.radius)

    def scaled(self, s: float) -> "FixedSegments":
        return FixedSegments(self.radius * s)


@dataclasses.dataclass(frozen=True)
class TaperedSegments:
    """Geometrically tapered segment lengths/radii (GC card,
    card.rs WireSegments::Tapered)."""

    length_ratio: float
    first_radius: float
    last_radius: float

    def dimensions(self, num_segments: int, total_length: float):
        # NEC2 semantics: segment i has radius first*rr^i so the LAST
        # segment's radius is exactly last_radius. (The reference's iterator
        # yields start/end radii that overshoot last_radius by one ratio
        # step, card.rs:238-263 — a quirk we do not reproduce.)
        ns = num_segments
        rr = (self.last_radius / self.first_radius) ** (1.0 / (ns - 1.0)) if ns > 1 else 1.0
        if self.length_ratio == 1.0:
            length = total_length / ns
        else:
            length = total_length * (1.0 - self.length_ratio) / (
                1.0 - self.length_ratio**ns
            )
        radius = self.first_radius
        for _ in range(ns):
            yield (length, radius, radius)
            length *= self.length_ratio
            radius *= rr

    def scaled(self, s: float) -> "TaperedSegments":
        return TaperedSegments(self.length_ratio, self.first_radius * s, self.last_radius * s)


@dataclasses.dataclass
class Wire:
    """GW card: straight wire with endpoints in LOCAL deck coordinates;
    ``transform`` (4x4) accumulates GM/GR/GS/GX."""

    num_segments: int
    end1: Tuple[float, float, float]
    end2: Tuple[float, float, float]
    segments: Union[FixedSegments, TaperedSegments]

    def world_ends(self, transform: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        h = np.array([[*self.end1, 1.0], [*self.end2, 1.0]]).T
        w = transform @ h
        return (w[:3, 0] / w[3, 0], w[:3, 1] / w[3, 1])


@dataclasses.dataclass
class WireArc:
    """GA card: circular arc in the local xz? plane per NEC2 (arc in the
    y=0 plane about the y axis), radius + [start, end] angles in degrees."""

    num_segments: int
    arc_radius: float
    arc_angles: Tuple[float, float]
    wire_radius: float

    def points(self) -> np.ndarray:
        """Polyline vertices (n+1, 3) of the arc in local coordinates."""
        a0, a1 = (math.radians(a) for a in self.arc_angles)
        ts = np.linspace(a0, a1, self.num_segments + 1)
        return np.stack(
            [self.arc_radius * np.cos(ts), np.zeros_like(ts), self.arc_radius * np.sin(ts)],
            axis=1,
        )


@dataclasses.dataclass
class SurfacePatch:
    """SP/SC cards (card.rs SurfacePatchSpecification)."""

    kind: str  # arbitrary | rectangular | triangular | quadrilateral
    vertices: Tuple[Tuple[float, float, float], ...] = ()
    position: Optional[Tuple[float, float, float]] = None
    elevation_angle: float = 0.0
    azimuth_angle: float = 0.0
    patch_area: float = 0.0


@dataclasses.dataclass
class Geometry:
    spec: Union[Wire, WireArc, SurfacePatch]
    transform: np.ndarray  # 4x4

    def append_transform(self, t: np.ndarray) -> None:
        self.transform = t @ self.transform


@dataclasses.dataclass
class NecFile:
    """Parsed deck (interpreter.rs NecFile)."""

    comments: List[str]
    geometry: List[Tuple[int, Geometry]]  # sorted by tag
    ground_plane: str  # none | present | present_modified
    symmetry: str  # none | rotational | planar
    ignored_decks: List[str]

    def wires(self) -> Sequence[Tuple[int, Wire, np.ndarray]]:
        return [
            (tag, g.spec, g.transform)
            for tag, g in self.geometry
            if isinstance(g.spec, Wire)
        ]


def _rot_zyx_degrees(rx: float, ry: float, rz: float) -> np.ndarray:
    """GM rotation: Rz(rz) @ Ry(ry) @ Rx(rx), degrees
    (interpreter.rs coordinate_transformation)."""

    def rot(axis, deg):
        a = math.radians(deg)
        c, s = math.cos(a), math.sin(a)
        m = np.eye(4)
        # right-handed rotation about `axis`: cyclic (i, j) with i = axis+1,
        # j = axis+2 (mod 3) gives m[i,i]=c, m[i,j]=-s, m[j,i]=s, m[j,j]=c
        i, j = (axis + 1) % 3, (axis + 2) % 3
        m[i, i] = c
        m[j, j] = c
        m[i, j] = -s
        m[j, i] = s
        return m

    return rot(2, rz) @ rot(1, ry) @ rot(0, rx)


class _Interpreter:
    def __init__(self):
        self.comments: List[str] = []
        # a LIST of (tag, Geometry): NEC2 allows several GW cards to share
        # a tag (the reference's BTreeMap<Tag, _> silently drops all but
        # the last — interpreter.rs; a documented divergence, we keep them)
        self.geometry: List[Tuple[int, Geometry]] = []
        self.ground_plane = "none"
        self.symmetry = "none"
        self.ignored: List[str] = []

    def add(self, tag: int, geom: "Geometry") -> None:
        self.geometry.append((tag, geom))

    def tags(self):
        return {t for t, _ in self.geometry}

    # GM/GR shared move/copy logic (interpreter.rs modify_impl). NEC spec:
    # copies get tag + increment*i; tag 0 is never renumbered. (The
    # reference's dont_increment_tag_0 flag keeps ALL GR copy tags unchanged,
    # collapsing them — hidden there by its num_copies.min(1) clamp.)
    def _modify(self, tag_increment, num_new, transform, tag_start):
        def new_tag(t, i):
            return t + tag_increment * i if t != 0 else t

        insertions = []
        for idx, (tag, geom) in enumerate(self.geometry):
            if tag_start is not None and tag < tag_start:
                continue
            if num_new == 0:
                geom.append_transform(transform)
                if tag_increment != 0:
                    self.geometry[idx] = (new_tag(tag, 1), geom)
            else:
                g = Geometry(spec=geom.spec, transform=geom.transform.copy())
                for i in range(num_new):
                    g = Geometry(spec=g.spec, transform=transform @ g.transform)
                    insertions.append((new_tag(tag, i + 1), g))
        self.geometry.extend(insertions)

    def finish(self) -> NecFile:
        return NecFile(
            comments=self.comments,
            geometry=sorted(self.geometry, key=lambda tg: tg[0]),
            ground_plane=self.ground_plane,
            symmetry=self.symmetry,
            ignored_decks=self.ignored,
        )


def _floats(tokens: List[str], n: int, card: str) -> List[float]:
    if len(tokens) < n:
        raise NecError(f"{card}: expected {n} numeric fields, got {len(tokens)}")
    try:
        return [float(t) for t in tokens[:n]]
    except ValueError as e:
        raise NecError(f"{card}: invalid number: {e}") from e


def parse_nec(source: Union[str, io.TextIOBase]) -> NecFile:
    """Parse a NEC deck from a string or text stream."""
    if isinstance(source, str):
        lines = source.splitlines()
    else:
        lines = source.read().splitlines()

    interp = _Interpreter()
    section = "comments"
    pending_gc: Optional[Tuple[int, int, Tuple, Tuple]] = None
    pending_sc: Optional[Tuple[int, List]] = None

    for raw in lines:
        line = raw.rstrip("\n")
        if not line.strip():
            continue
        tokens = line.split()
        card = tokens[0].upper()
        rest = tokens[1:]

        if pending_gc is not None:
            if card != "GC":
                raise NecError(f"expected GC card after zero-radius GW, got {card}")
            lr, r1, r2 = _floats(rest, 3, "GC")
            if r1 <= 0.0 or r2 <= 0.0:
                raise NecError(
                    f"GC: tapered-wire radii must be positive, got "
                    f"first={r1} last={r2} in: {line.strip()}"
                )
            tag, nseg, e1, e2 = pending_gc
            interp.add(tag, Geometry(
                spec=Wire(nseg, e1, e2, TaperedSegments(lr, r1, r2)),
                transform=np.eye(4),
            ))
            interp.symmetry = "none"
            pending_gc = None
            continue

        if pending_sc is not None:
            if card != "SC":
                raise NecError(f"expected SC card after SP shape card, got {card}")
            shape, verts = pending_sc
            # SC fields after (its2, itp2 ignored): x3 y3 z3 [x4 y4 z4]
            extra = _floats(rest[2:] if len(rest) >= 5 else rest, 3, "SC")
            verts.append(tuple(extra))
            if shape == 3:
                extra2 = _floats(rest[5:] if len(rest) >= 8 else rest[3:], 3, "SC")
                verts.append(tuple(extra2))
            kind = {1: "rectangular", 2: "triangular", 3: "quadrilateral"}[shape]
            tag = 0
            used = interp.tags()
            while tag in used:
                tag -= 1  # patches carry no tag (interpreter.rs surface_patch)
            interp.add(tag, Geometry(
                spec=SurfacePatch(kind=kind, vertices=tuple(verts)),
                transform=np.eye(4),
            ))
            pending_sc = None
            continue

        if section == "comments":
            if card == "CM":
                interp.comments.append(line[2:].strip())
            elif card == "CE":
                remainder = line[2:].strip()
                if remainder:
                    interp.comments.append(remainder)
                section = "geometry"
            else:
                raise NecError(f"unexpected {card} card in comments section")
            continue

        if section != "geometry":
            break

        if card == "GW":
            if len(rest) < 9:
                raise NecError("GW: needs tag nseg x1 y1 z1 x2 y2 z2 radius")
            tag = int(float(rest[0]))
            nseg = int(float(rest[1]))
            nums = _floats(rest[2:], 7, "GW")
            e1, e2, radius = tuple(nums[0:3]), tuple(nums[3:6]), nums[6]
            if radius == 0.0:
                pending_gc = (tag, nseg, e1, e2)
            else:
                interp.add(tag, Geometry(
                    spec=Wire(nseg, e1, e2, FixedSegments(radius)),
                    transform=np.eye(4),
                ))
                interp.symmetry = "none"
        elif card == "GA":
            tag = int(float(rest[0]))
            nseg = int(float(rest[1]))
            nums = _floats(rest[2:], 4, "GA")
            interp.add(tag, Geometry(
                spec=WireArc(nseg, nums[0], (nums[1], nums[2]), nums[3]),
                transform=np.eye(4),
            ))
            interp.symmetry = "none"
        elif card == "GE":
            flag = int(float(rest[0])) if rest else 0
            interp.ground_plane = {0: "none", 1: "present_modified", -1: "present"}.get(
                flag, "none"
            )
            if interp.ground_plane != "none" and interp.symmetry == "planar":
                pass  # z-symmetry removed by ground plane (interpreter.rs GE)
            break  # GE ends geometry input
        elif card == "GM":
            nums = _floats(rest, 8, "GM")
            tag_inc, num_new = int(nums[0]), int(nums[1])
            rot = nums[2:5]
            trans = nums[5:8]
            tag_start = (
                int(float(rest[8])) if len(rest) > 8 and float(rest[8]) != 0 else None
            )
            if num_new > 0 or tag_start is not None:
                interp.symmetry = "none"
            t = _rot_zyx_degrees(*rot)
            t[:3, 3] = trans
            interp._modify(tag_inc, num_new, t, tag_start)
        elif card == "GR":
            tag_inc = int(float(rest[0]))
            num_copies = max(int(float(rest[1])), 1)
            angle = 2.0 * math.pi / num_copies
            t = _rot_zyx_degrees(0, 0, math.degrees(angle))
            interp.symmetry = "rotational"
            interp._modify(tag_inc, num_copies - 1, t, None)
        elif card == "GS":
            s = _floats(rest, 1, "GS")[0] if len(rest) == 1 else _floats(rest, 3, "GS")[2]
            m = np.diag([s, s, s, 1.0])
            for _, g in interp.geometry:
                g.transform = m @ g.transform
                # NON-mutating spec replacement: GM/GR/GX copies share spec
                # objects, so in-place scaling would compound once per copy
                if isinstance(g.spec, Wire):
                    g.spec = dataclasses.replace(
                        g.spec, segments=g.spec.segments.scaled(s)
                    )
                elif isinstance(g.spec, WireArc):
                    g.spec = dataclasses.replace(
                        g.spec,
                        arc_radius=g.spec.arc_radius * s,
                        wire_radius=g.spec.wire_radius * s,
                    )
        elif card == "GX":
            tag_inc = int(float(rest[0]))
            bits = rest[1].strip()
            if len(bits) != 3 or any(c not in "01" for c in bits):
                raise NecError(f"GX: invalid reflection axes {bits!r}")
            # reflect Z then Y then X, tag increment doubling (card.rs GX +
            # interpreter.rs reflection_in_coordinate_planes)
            inc = tag_inc
            for axis, flag in ((2, bits[2]), (1, bits[1]), (0, bits[0])):
                if flag != "1":
                    continue
                refl = np.eye(4)
                refl[axis, axis] = -1.0
                for tag, g in list(interp.geometry):
                    interp.add(tag + inc, Geometry(
                        spec=g.spec, transform=refl @ g.transform
                    ))
                inc *= 2
            interp.symmetry = "planar"
        elif card == "SP":
            shape = int(float(rest[1])) if len(rest) > 1 else 0
            if shape == 0:
                nums = _floats(rest[2:], 6, "SP")
                tag = 0
                used = interp.tags()
                while tag in used:
                    tag -= 1
                interp.add(tag, Geometry(
                    spec=SurfacePatch(
                        kind="arbitrary",
                        position=tuple(nums[0:3]),
                        elevation_angle=nums[3],
                        azimuth_angle=nums[4],
                        patch_area=nums[5],
                    ),
                    transform=np.eye(4),
                ))
            elif shape in (1, 2, 3):
                nums = _floats(rest[2:], 6, "SP")
                pending_sc = (shape, [tuple(nums[0:3]), tuple(nums[3:6])])
            else:
                raise NecError(f"SP: invalid patch shape {shape}")
        elif card == "SC":
            raise NecError("SC card without preceding SP shape card")
        elif card in ("CM", "CE"):
            raise NecError(f"unexpected {card} card in geometry section")
        else:
            # unknown cards are collected, not fatal (interpreter.rs
            # unknown_card) — NEC program-control decks (EX, FR, RP, ...)
            interp.ignored.append(line)

    if pending_gc is not None:
        raise NecError("unexpected end of file: GW awaiting GC card")
    if pending_sc is not None:
        raise NecError("unexpected end of file: SP awaiting SC card")

    return interp.finish()
