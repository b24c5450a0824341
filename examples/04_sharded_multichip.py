"""Domain decomposition across all visible devices.

Run on hardware with several chips, or simulate with:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python examples/04_sharded_multichip.py
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import fdtd_tpu as ft
from fdtd_tpu.parallel import make_mesh, make_sharded_step, shard_state

devices = jax.devices()
print(f"{len(devices)} device(s): {devices[0].device_kind}")

mesh = make_mesh(len(devices), ("x", "y") if len(devices) > 1 else ("x",))
dims = ("x", "y", None) if len(devices) > 1 else ("x", None, None)

shape = (64, 64, 64)
grid = ft.Grid(shape=shape,
               resolution=ft.Resolution.courant(1.0, ft.REDUCED, safety=0.9),
               constants=ft.REDUCED)
table = ft.coefficient_table([ft.VACUUM], grid.resolution, ft.REDUCED)
coeffs = ft.CellCoefficients.uniform(table[0], jnp.float32)
src = ft.SourceSet.build([
    ft.PointSource((32, 32, 32), ft.GaussianPulse(10 * grid.dt, 3 * grid.dt),
                   j=(0.0, 0.0, 1.0)),
])

step = jax.jit(make_sharded_step(mesh, dims, inv_dx=(1.0, 1.0, 1.0), dt=grid.dt))
state = shard_state(ft.zero_state(shape), mesh, dims)
for _ in range(50):
    state = step(state, coeffs, src)
e = np.abs(np.asarray(state.ez)).max()
print(f"after 50 sharded steps over mesh {dict(mesh.shape)}: max|Ez| = {e:.3e}")

# --- high-level API: ShardedSimulation auto-dispatches like Simulation ---
from fdtd_tpu.parallel import ShardedSimulation
from fdtd_tpu.probes import PointProbe
from fdtd_tpu.solver.cpml import Cpml

sim = ShardedSimulation(
    grid=grid, coeffs=coeffs, sources=src,
    cpml=Cpml(thickness=((4, 4), (0, 0), (0, 0))),
    mesh=make_mesh(len(devices), ("x",)), max_k=4,
    interpret=devices[0].platform == "cpu",
)
k, kind = sim.plan()
print(f"ShardedSimulation dispatched to {kind} (K={k})")
st = sim.init()
st, (trace,) = sim.run(st, 8 * k, probes=(PointProbe(points=((32, 32, 32),)),),
                       probe_every=k)
g = sim.gather(st)
print(f"after {int(g.tick)} ticks: max|Ez| = "
      f"{np.abs(np.asarray(g.ez)).max():.3e}; probe trace {trace.shape}")
