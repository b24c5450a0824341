"""Free-space Gaussian dipole with a point probe (BASELINE config 1).

Run:  python examples/01_dipole_free_space.py
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

import fdtd_tpu as ft
from fdtd_tpu.probes import PointProbe

grid = ft.Grid(shape=(64, 64, 64),
               resolution=ft.Resolution.courant(1.0, ft.REDUCED, safety=0.9),
               constants=ft.REDUCED)
table = ft.coefficient_table([ft.VACUUM], grid.resolution, ft.REDUCED)
sim = ft.Simulation(
    grid=grid,
    coeffs=ft.CellCoefficients.uniform(table[0], jnp.float32),
    sources=ft.SourceSet.build([
        ft.PointSource((32, 32, 32),
                       ft.GaussianPulse(time=20 * grid.dt, duration=6 * grid.dt),
                       j=(0.0, 0.0, 1.0)),
    ]),
)

state = sim.init()
state, (trace,), _ = sim.run(
    state, 200, probes=(PointProbe(points=((44, 32, 32),)),), probe_every=2
)
trace = np.asarray(trace)
k = int(np.argmax(np.abs(trace[:, 0, 2])))
print(f"probe peak |Ez| = {abs(trace[k, 0, 2]):.3e} at tick {2 * (k + 1)}")
print(f"(light-travel estimate: 12 cells / c + pulse peak ~= "
      f"{12 / (grid.dt) * grid.dt + 20 * grid.dt:.1f} time units)")
