"""Hardware soak for CPML-K input_output_aliases (run on the real chip).

The round-1 workaround disabled aliasing after deterministic NaNs at
256^3 K=6 under lax.scan (docs/ROADMAP.md). This soak re-validates the
matrix bench.py exercises: long chained scans per (size, K, dtype, mode),
finiteness + a probe value cross-check. Usage:

    python tools/soak_aliasing.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import fdtd_tpu as ft
from fdtd_tpu.solver.cpml import Cpml
from fdtd_tpu.solver.pallas_cpml import init_pml_kernel_state
from fdtd_tpu.solver.pallas_cpml_k import pallas_cpml_stepk_fn


def soak(n, K, dtype, passes, matid=False):
    shape = (n, n, n)
    res = ft.Resolution.courant(1.0, ft.REDUCED, safety=0.99)
    grid = ft.Grid(shape=shape, resolution=res, constants=ft.REDUCED)
    cpml = Cpml.uniform(10)
    kw = {}
    if matid:
        tab = ft.MaterialTable()
        tab.register(ft.Material(relative_permittivity=2.5))
        coeffs = jnp.asarray(
            ft.coefficient_table(tab.materials, res, ft.REDUCED), jnp.float32)
        mid = np.zeros(shape, np.uint8)
        mid[n//4: n//2] = 1
        kw = dict(matid=jnp.asarray(mid), n_materials=2)
    else:
        coeffs = ft.CellCoefficients.uniform(
            ft.coefficient_table([ft.VACUUM], res, ft.REDUCED)[0],
            jnp.float32)
    src = ft.SourceSet.build([ft.PointSource(
        (n//2, n//2, n//2), ft.GaussianPulse(20*grid.dt, 6*grid.dt),
        j=(0, 0, 1.0))])
    step = pallas_cpml_stepk_fn(shape, K, inv_dx=(1., 1., 1.), dt=grid.dt,
                                constants=ft.REDUCED, cpml=cpml,
                                max_sources=1, dtype=dtype, **kw)
    st = init_pml_kernel_state(shape, dtype, cpml=cpml)

    def run(s, c):
        def body(x, _):
            return step(x, coeffs, src), None
        return jax.lax.scan(body, s, None, length=c)[0]

    rj = jax.jit(run, static_argnums=1)
    t0 = time.perf_counter()
    st = rj(st, passes)
    v = float(jnp.asarray(st.ex[1, 1, 1], jnp.float32))
    wall = time.perf_counter() - t0
    ez = np.asarray(st.ez, np.float32)
    ok = bool(np.all(np.isfinite(ez)))
    tag = f"{n}^3 K={K} {jnp.dtype(dtype).name}{' matid' if matid else ''}"
    print(f"{tag}: {passes} passes ({passes*K} ticks) in {wall:.0f}s "
          f"finite={ok} max|Ez|={np.abs(ez).max():.3e}", flush=True)
    return ok


if __name__ == "__main__":
    results = [
        soak(256, 8, jnp.float32, 60),
        soak(256, 6, jnp.float32, 60, matid=True),
        soak(512, 3, jnp.float32, 40),
        soak(512, 4, jnp.bfloat16, 40),
    ]
    print("ALL PASS" if all(results) else "FAILURES PRESENT")
