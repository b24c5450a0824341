"""Headline benchmark: Yee-cell updates/sec/chip, free-space f32.

Prints ONE JSON line on stdout:
  {"metric": ..., "value": N, "unit": "cells/s", "vs_baseline": N}

vs_baseline is measured throughput / the 5 Gcell/s/chip target from
BASELINE.md (the reference itself publishes no numbers). Detailed results
(per size, compressed-material mode, steps/sec including probe readback)
go to stderr.

Run on the real TPU chip (no platform override). Honors:
  BENCH_SIZES  comma-separated cube sizes (default "256,512")
  BENCH_STEPS  timed steps per measurement (default 50)
"""

from __future__ import annotations

import json
import os
import sys
import time


def _sync(x) -> None:
    """Reliable device sync: a scalar readback (block_until_ready can return
    early under remotely-tunneled runtimes)."""
    x.ex[1, 1, 1].item()


# one-time cost of the sync readback itself, subtracted from timings
_READBACK_S = 0.027


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    import fdtd_tpu as ft
    from fdtd_tpu.probes import PointProbe

    sizes = [
        int(s) for s in os.environ.get("BENCH_SIZES", "256,512").split(",") if s
    ]
    n_steps = int(os.environ.get("BENCH_STEPS", "50"))
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}, platform {dev.platform}", file=sys.stderr)

    target = 5e9  # BASELINE.md: >= 5 Gcell-updates/s/chip at 512^3 f32
    results = {}
    for n in sizes:
        shape = (n, n, n)
        res = ft.Resolution.courant(1.0, ft.REDUCED, safety=0.99)
        grid = ft.Grid(shape=shape, resolution=res, constants=ft.REDUCED)
        table = ft.coefficient_table([ft.VACUUM], res, ft.REDUCED)
        coeffs = ft.CellCoefficients.uniform(table[0], jnp.float32)
        src = ft.SourceSet.build(
            [
                ft.PointSource(
                    (n // 2, n // 2, n // 2),
                    ft.GaussianPulse(20 * grid.dt, 6 * grid.dt),
                    j=(0.0, 0.0, 1.0),
                )
            ]
        )
        state = ft.zero_state(shape)
        from fdtd_tpu.solver.best import best_multi_step_fn

        step_k, k_per_call = best_multi_step_fn(
            shape, inv_dx=(1.0, 1.0, 1.0), dt=grid.dt
        )
        n_calls = max(n_steps // k_per_call, 1)

        def run(state, k: int):
            def body(s, _):
                return step_k(s, coeffs, src), None

            return jax.lax.scan(body, state, None, length=k)[0]

        run_j = jax.jit(run, static_argnums=1, donate_argnums=0)

        # warmup with the SAME static scan length (a different length would
        # put a fresh compilation inside the timed region)
        state = run_j(state, n_calls)
        _sync(state)
        t0 = time.perf_counter()
        state = run_j(state, n_calls)
        _sync(state)
        dt_wall = time.perf_counter() - t0 - _READBACK_S

        steps_done = n_calls * k_per_call
        cells_per_s = grid.num_cells * steps_done / dt_wall
        results[n] = cells_per_s
        print(
            f"{n}^3 free-space (K={k_per_call} temporal blocking): "
            f"{cells_per_s/1e9:.3f} Gcell/s "
            f"({steps_done/dt_wall:.1f} steps/s, "
            f"{dt_wall*1e3/steps_done:.2f} ms/step)",
            file=sys.stderr,
        )
        # steps/sec INCLUDING probe readback (BASELINE metric): advance in
        # K-step chunks, sampling a point probe at the chunk cadence and
        # pulling the trace to host per call (the observation-throttled
        # pattern from the runner; Simulation.run dispatches the same way)
        chunk = k_per_call
        probe = PointProbe(points=(((n // 2) + 8, n // 2, n // 2),))

        def run_probe(state, k: int):
            def body(s, _):
                s2 = step_k(s, coeffs, src)
                return s2, probe.sample(s2, grid.dt)

            return jax.lax.scan(body, state, None, length=k)

        runp_j = jax.jit(run_probe, static_argnums=1, donate_argnums=0)
        state, trace = runp_j(state, chunk)
        _ = np.asarray(trace)  # includes transfer
        t0 = time.perf_counter()
        n_chunks = max(n_steps // chunk, 1)
        for _ in range(n_chunks):
            state, trace = runp_j(state, chunk)
            _ = np.asarray(trace)
        dt_wall = time.perf_counter() - t0
        ticks = n_chunks * chunk * k_per_call
        print(
            f"{n}^3 with per-{k_per_call}-step probe readback: "
            f"{ticks/dt_wall:.1f} steps/s "
            f"({grid.num_cells*ticks/dt_wall/1e9:.3f} Gcell/s)",
            file=sys.stderr,
        )
        del state

        # bf16 storage mode (f32 compute): halves HBM traffic
        if n == max(sizes) and dev.platform == "tpu":
            from fdtd_tpu.solver.pallas_step import pallas_step_fn as _psf

            bstep, bk = best_multi_step_fn(
                shape, inv_dx=(1.0, 1.0, 1.0), dt=grid.dt, dtype=jnp.bfloat16
            )
            bsrc = ft.SourceSet.build(
                [ft.PointSource((n // 2,) * 3,
                                ft.GaussianPulse(20 * grid.dt, 6 * grid.dt),
                                j=(0.0, 0.0, 1.0))],
                dtype=jnp.bfloat16,
            )

            def run_b(state, k: int):
                def body(s, _):
                    return bstep(s, coeffs, bsrc), None

                return jax.lax.scan(body, state, None, length=k)[0]

            runb_j = jax.jit(run_b, static_argnums=1, donate_argnums=0)
            state = ft.zero_state(shape, jnp.bfloat16)
            bcalls = max(n_steps // bk, 1)
            state = runb_j(state, bcalls)
            _sync(state)
            t0 = time.perf_counter()
            state = runb_j(state, bcalls)
            _sync(state)
            dt_wall = time.perf_counter() - t0 - _READBACK_S
            print(
                f"{n}^3 bf16 storage (K={bk}): "
                f"{grid.num_cells*bcalls*bk/dt_wall/1e9:.3f} Gcell/s",
                file=sys.stderr,
            )
            del state

        # CPML (absorbing boundaries) via the in-kernel CPML Pallas kernel
        # (BASELINE config 3 path; ~3.5x the composed XLA engine), 256^3 only
        if n == 256 and dev.platform == "tpu":
            from fdtd_tpu.solver.cpml import Cpml
            from fdtd_tpu.solver.pallas_cpml import (
                init_pml_kernel_state,
                pallas_cpml_step_fn,
            )

            from fdtd_tpu.solver.pallas_cpml_k import pallas_cpml_stepk_fn

            ck = 8
            ckstep = pallas_cpml_stepk_fn(
                shape, ck, inv_dx=(1.0, 1.0, 1.0), dt=grid.dt,
                constants=ft.REDUCED, cpml=Cpml.uniform(10), max_sources=1,
            )

            def cstep(s, c, srcs, _k=ckstep):
                return _k(s, c, srcs)
            cstate = init_pml_kernel_state(shape, cpml=Cpml.uniform(10))

            def run_c(state, k: int):
                def body(s, _):
                    return cstep(s, coeffs, src), None

                return jax.lax.scan(body, state, None, length=k)[0]

            # donating PmlKernelState flakes on the axon runtime; carries
            # still alias in place inside the scan
            runc_j = jax.jit(run_c, static_argnums=1)
            c_calls = max(n_steps // ck, 1)
            cstate = runc_j(cstate, c_calls)
            cstate.ex[1, 1, 1].item()
            t0 = time.perf_counter()
            cstate = runc_j(cstate, c_calls)
            cstate.ex[1, 1, 1].item()
            dt_wall = time.perf_counter() - t0 - _READBACK_S
            print(
                f"{n}^3 CPML all axes (in-kernel, K={ck}): "
                f"{grid.num_cells*c_calls*ck/dt_wall/1e9:.3f} Gcell/s",
                file=sys.stderr,
            )
            del cstate

        # compressed-material mode (uint8 matid + K-row table), 256^3 only
        if n == 256:
            tab = ft.MaterialTable()
            diel = tab.register(ft.Material(relative_permittivity=3.9))
            matid = np.zeros(shape, np.uint8)
            idx = np.indices(shape)
            r2 = ((idx - n // 2) ** 2).sum(axis=0)
            matid[r2 < (n // 6) ** 2] = diel
            ctable = ft.coefficient_table(tab.materials, res, ft.REDUCED)
            from fdtd_tpu.solver.pallas_step import pallas_step_fn, supports
            from fdtd_tpu.solver.boundary import BoundaryConditions

            if supports(shape, BoundaryConditions()) and dev.platform == "tpu":
                from fdtd_tpu.solver.pallas_stepk import pallas_stepk_fn

                mstep = pallas_stepk_fn(
                    shape, 10, inv_dx=(1.0, 1.0, 1.0), dt=grid.dt,
                    matid=jnp.asarray(matid), n_materials=len(tab),
                    max_sources=1,
                )
                jtable = jnp.asarray(ctable, jnp.float32)

                def run_m(state, k: int):
                    def body(s, _):
                        return mstep(s, jtable, src), None

                    return jax.lax.scan(body, state, None, length=k)[0]

                runm_j = jax.jit(run_m, static_argnums=1, donate_argnums=0)
                state = ft.zero_state(shape)
                mcalls = max(n_steps // 10, 1)
                state = runm_j(state, mcalls)
                _sync(state)
                t0 = time.perf_counter()
                state = runm_j(state, mcalls)
                _sync(state)
                dt_wall = time.perf_counter() - t0 - _READBACK_S
                print(
                    f"{n}^3 compressed-material ({len(tab)} materials, "
                    f"K=10): {grid.num_cells*mcalls*10/dt_wall/1e9:.3f} Gcell/s",
                    file=sys.stderr,
                )
                del state

    headline = results.get(512, results[max(results)])
    print(
        json.dumps(
            {
                "metric": "yee_cell_updates_per_sec_per_chip_512^3_f32",
                "value": headline,
                "unit": "cells/s",
                "vs_baseline": headline / target,
            }
        )
    )


if __name__ == "__main__":
    main()
