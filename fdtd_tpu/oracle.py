"""Deliberately-simple NumPy float64 mirror of the update equations.

The reference repo has NO solver tests (SURVEY.md §4), so this module is the
step-for-step golden reference for ours: a direct, unoptimized transcription
of the update math from cem-solver/src/fdtd/cpu/mod.rs:412-516 and
cpu/util.rs:139-194, written against NumPy only. The JAX paths (step.py,
pallas_step.py) are validated against it element-for-element.

Keep this module boring: no vector tricks shared with the solver, no JAX.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import numpy as np

__all__ = ["OracleSim"]


class OracleSim:
    """f64 reference simulator on a (nx, ny, nz) lattice.

    Fields are stored component-first (3, nx, ny, nz) like the solver.
    ``coeffs`` are dense (4, nx, ny, nz) [c_a, c_b, d_a, d_b] or scalars.
    Boundary: per-axis ('neumann'|'dirichlet', alpha(3,), beta(3,)).
    """

    def __init__(
        self,
        shape: Tuple[int, int, int],
        spatial: Tuple[float, float, float],
        dt: float,
        c_a=1.0,
        c_b=1.0,
        d_a=1.0,
        d_b=1.0,
        boundaries=None,
    ):
        self.shape = tuple(shape)
        self.spatial = tuple(float(s) for s in spatial)
        self.dt = float(dt)
        self.e = np.zeros((3, *shape), np.float64)
        self.h = np.zeros((3, *shape), np.float64)
        self.tick = 0
        # scalar or dense (nx, ny, nz) coefficient fields
        self.c_a, self.c_b = np.asarray(c_a, np.float64), np.asarray(c_b, np.float64)
        self.d_a, self.d_b = np.asarray(d_a, np.float64), np.asarray(d_b, np.float64)
        if boundaries is None:
            boundaries = [("neumann", np.zeros(3), np.zeros(3))] * 3
        self.boundaries = boundaries
        # sources: list of (point, j_amp(3,), m_amp(3,), waveform callable)
        self.sources: list = []

    @property
    def time(self) -> float:
        return self.tick * self.dt

    def add_point_source(self, point, waveform, j=(0, 0, 0), m=(0, 0, 0)):
        self.sources.append(
            (tuple(point), np.asarray(j, np.float64), np.asarray(m, np.float64), waveform)
        )

    # -- stencils ----------------------------------------------------------

    def _partial(self, field: np.ndarray, comp: int, axis: int, dx0: int, dx1: int):
        """Central difference of field[comp] along axis between x-dx0 and
        x+dx1, divided by dx (cpu/util.rs:168-194). Returns (nx,ny,nz)."""
        f = field[comp]
        n = self.shape[axis]
        kind, alpha, beta = self.boundaries[axis]
        out = np.empty_like(f)
        idx = np.arange(n)
        i0 = idx - dx0
        i1 = idx + dx1
        lo_missing = i0 < 0
        hi_missing = i1 >= n
        f0 = np.take(f, np.clip(i0, 0, n - 1), axis=axis)
        f1 = np.take(f, np.clip(i1, 0, n - 1), axis=axis)
        df = f1 - f0
        # boundary closure (boundary_condition.rs:15-37)
        mask_shape = [1, 1, 1]
        mask_shape[axis] = n
        lo_m = lo_missing.reshape(mask_shape)
        hi_m = hi_missing.reshape(mask_shape)
        if kind == "neumann":
            df = np.where(lo_m, alpha[comp], df)
            df = np.where(hi_m, beta[comp], df)
        elif kind == "dirichlet":
            df = np.where(lo_m, f1 - alpha[comp], df)
            df = np.where(hi_m, beta[comp] - f0, df)
        else:
            raise ValueError(kind)
        out[:] = df / self.spatial[axis]
        return out

    def _curl(self, field: np.ndarray, dx0: int, dx1: int) -> np.ndarray:
        d = lambda comp, axis: self._partial(field, comp, axis, dx0, dx1)
        return np.stack(
            [
                d(2, 1) - d(1, 2),
                d(0, 2) - d(2, 0),
                d(1, 0) - d(0, 1),
            ]
        )

    # -- one tick ----------------------------------------------------------

    def step(self, n: int = 1):
        for _ in range(n):
            t = self.time
            j_src = np.zeros_like(self.e)
            m_src = np.zeros_like(self.h)
            for point, j_amp, m_amp, waveform in self.sources:
                v = float(waveform(t))
                # co-located sources: LAST WINS, matching both the solver
                # (SourceSet.build dedups per cell, sources.py:131-137) and
                # the reference's set_forcing overwrite
                # (cem-solver/src/fdtd/cpu/mod.rs:404-408). Pinned by
                # test_core_step.py::test_two_sources_one_cell_last_wins.
                j_src[(slice(None), *point)] = j_amp * v
                m_src[(slice(None), *point)] = m_amp * v

            # H first, backward-difference curl of E (dx0=1, dx1=0)
            curl_e = self._curl(self.e, 1, 0)
            self.h = self.d_a * self.h + self.d_b * (-curl_e - m_src)

            # E second, forward-difference curl of the NEW H (dx0=0, dx1=1)
            curl_h = self._curl(self.h, 0, 1)
            self.e = self.c_a * self.e + self.c_b * (curl_h - j_src)

            self.tick += 1

    # -- waveforms matching solver/sources.py -------------------------------

    @staticmethod
    def gaussian(t0: float, duration: float):
        return lambda t: math.exp(-(((t - t0) / duration) ** 2))

    @staticmethod
    def cw(frequency: float, phase: float = 0.0):
        return lambda t: math.cos(2 * math.pi * frequency * t + phase)
