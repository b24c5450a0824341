"""Native (C++/OpenMP) acceleration: build-on-demand + ctypes bindings.

The reference's runtime is native Rust end-to-end; here the device compute
path is JAX/Pallas and the host-side hot loops get native C++ equivalents.
Currently: the voxelizer (native/voxelize.cpp), a multithreaded drop-in for
scene/voxelize.py's NumPy path — scene compile on big lattices is the one
host-bound stage.

The shared library is compiled once with the system toolchain and cached
under build/; everything degrades gracefully to the NumPy path when a
compiler is unavailable (fdtd_tpu.scene.voxelize stays the reference
implementation and the correctness oracle).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

__all__ = ["native_voxelizer_available", "native_voxelize", "load_native"]

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


class _EntityStruct(ctypes.Structure):
    _fields_ = [
        ("kind", ctypes.c_int32),
        ("_pad0", ctypes.c_int32),
        ("rot", ctypes.c_double * 9),
        ("trans", ctypes.c_double * 3),
        ("params", ctypes.c_double * 4),
        ("material_id", ctypes.c_uint16),
        ("_pad1", ctypes.c_uint16 * 3),
    ]


_KINDS = {"Ball": 0, "Cuboid": 1, "Cylinder": 2, "HalfSpace": 3, "Quad": 4}


def _source_path() -> Path:
    return Path(__file__).resolve().parent.parent / "native" / "voxelize.cpp"


def _build() -> Optional[Path]:
    src = _source_path()
    if not src.exists():
        return None
    build_dir = src.parent.parent / "build"
    build_dir.mkdir(exist_ok=True)
    tag = hashlib.sha256(src.read_bytes()).hexdigest()[:16]
    out = build_dir / f"libfdtd_native_{tag}.so"
    if out.exists():
        return out
    for flags in (
        ["-O3", "-march=native", "-fopenmp"],
        ["-O3", "-fopenmp"],
        ["-O3"],  # no OpenMP fallback
    ):
        cmd = ["c++", "-shared", "-fPIC", *flags, str(src), "-o", str(out)]
        try:
            r = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
        except (OSError, subprocess.TimeoutExpired):
            return None
        if r.returncode == 0:
            return out
    return None


def load_native() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        path = _build()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(str(path))
        except OSError:
            return None
        lib.fdtd_voxelize.restype = ctypes.c_int64
        lib.fdtd_voxelize.argtypes = [
            ctypes.POINTER(_EntityStruct), ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_uint16),
        ]
        lib.fdtd_native_threads.restype = ctypes.c_int32
        _lib = lib
        return _lib


def native_voxelizer_available() -> bool:
    return load_native() is not None


def _pack_entities(entities, material_ids) -> Optional[ctypes.Array]:
    arr = (_EntityStruct * len(entities))()
    for i, (e, mid) in enumerate(zip(entities, material_ids)):
        kind = _KINDS.get(type(e.shape).__name__)
        if kind is None:
            return None  # unsupported shape -> caller falls back
        s = arr[i]
        s.kind = kind
        pose = e.global_pose()
        rot = pose.matrix  # local->world, row-major
        for j in range(9):
            s.rot[j] = float(rot.flat[j])
        for j in range(3):
            s.trans[j] = float(pose.translation[j])
        shp = e.shape
        name = type(shp).__name__
        if name == "Ball":
            s.params[0] = shp.radius
        elif name == "Cuboid":
            s.params[0:3] = tuple(float(v) for v in shp.half_extents)
        elif name == "Cylinder":
            s.params[0] = shp.half_height
            s.params[1] = shp.radius
        elif name == "HalfSpace":
            n = np.asarray(shp.normal, np.float64)
            n = n / np.linalg.norm(n)
            s.params[0:3] = tuple(float(v) for v in n)
        elif name == "Quad":
            s.params[0] = shp.half_extents[0]
            s.params[1] = shp.half_extents[1]
            s.params[2] = shp.half_thickness
        s.material_id = int(mid)
    return arr


def native_voxelize(scene, transforms, table) -> Optional[np.ndarray]:
    """C++ fast path for voxelize_materials; returns the matid array or None
    if unavailable/unsupported (caller uses the NumPy path)."""
    lib = load_native()
    if lib is None:
        return None
    entities = scene.materials()
    mids = [table.register(e.material) for e in entities]
    packed = _pack_entities(entities, mids)
    if packed is None:
        return None

    from .scene.transform import _quat_to_matrix

    nx, ny, nz = transforms.lattice_size
    out = np.zeros((nx, ny, nz), np.uint16)
    dx = np.asarray(transforms.spatial, np.float64)
    origin = np.asarray(transforms.origin, np.float64)
    rot_w = np.ascontiguousarray(_quat_to_matrix(transforms.rotation), np.float64)

    lib.fdtd_voxelize(
        packed, len(entities), nx, ny, nz,
        dx.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        origin.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        rot_w.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
    )
    return out
