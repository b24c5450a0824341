"""Wavefront OBJ loading -> FEEC triangle meshes.

The reference stubs an OBJ loader (cem-app/src/composer/file_formats/mod.rs
registers the extension but loading is unimplemented); here OBJ files load
into `fdtd_tpu.feec.TriMesh` for the surface solver. Supports the v/f
subset (polygonal faces are fan-triangulated; texture/normal indices after
'/' are ignored).
"""

from __future__ import annotations

import io
from pathlib import Path
from typing import Union

import numpy as np

from ..feec.mesh import TriMesh

__all__ = ["load_obj"]


def load_obj(source: Union[str, Path, io.TextIOBase]) -> TriMesh:
    if isinstance(source, (str, Path)) and "\n" not in str(source):
        text = Path(source).read_text()
    elif isinstance(source, str):
        text = source
    else:
        text = source.read()

    vertices = []
    faces = []
    for raw in text.splitlines():
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        parts = line.split()
        if parts[0] == "v":
            if len(parts) < 4:
                raise ValueError(f"bad vertex line: {raw!r}")
            vertices.append([float(parts[1]), float(parts[2]), float(parts[3])])
        elif parts[0] == "f":
            idx = []
            for tok in parts[1:]:
                i = int(tok.split("/")[0])
                # OBJ indices are 1-based; negatives count from the end
                idx.append(i - 1 if i > 0 else len(vertices) + i)
            if len(idx) < 3:
                raise ValueError(f"bad face line: {raw!r}")
            for a in range(1, len(idx) - 1):  # fan triangulation
                faces.append([idx[0], idx[a], idx[a + 1]])
        # other directives (vn, vt, o, g, usemtl, s, mtllib) are ignored

    if not vertices or not faces:
        raise ValueError("OBJ contains no triangles")
    return TriMesh.from_triangles(np.asarray(vertices), np.asarray(faces))
