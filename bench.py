"""Headline benchmark: Yee-cell updates/sec/chip, free-space f32.

Prints ONE JSON line on stdout:
  {"metric": ..., "value": N, "unit": "cells/s", "vs_baseline": N}

vs_baseline is measured throughput / the 5 Gcell/s/chip target from
BASELINE.md (the reference itself publishes no numbers). Detailed per-size
results go to stderr.

Run on the real TPU chip (no platform override). Honors:
  BENCH_SIZES  comma-separated cube sizes (default "256,512")
  BENCH_STEPS  timed steps per measurement (default 200)
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    import jax
    import jax.numpy as jnp

    import fdtd_tpu as ft
    from fdtd_tpu.solver.best import best_step_fn

    sizes = [
        int(s) for s in os.environ.get("BENCH_SIZES", "256,512").split(",") if s
    ]
    n_steps = int(os.environ.get("BENCH_STEPS", "200"))
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

        step = best_step_fn(
            shape, inv_dx=tuple(1.0 / d for d in grid.dx), dt=grid.dt
        )

        def run(state, k: int):
            def body(s, _):
                return step(s, coeffs, src), None

            return jax.lax.scan(body, state, None, length=k)[0]

        run_j = jax.jit(run, static_argnums=1, donate_argnums=0)

        # Warmup with the SAME static n_steps (a different length would put a
        # fresh scan compilation inside the timed region). NOTE: a scalar
        # .item() readback is the only reliable device sync here — under
        # remote-tunneled runtimes block_until_ready can return before
        # device completion.
        state = run_j(state, n_steps)
        state.ex[1, 1, 1].item()
        t0 = time.perf_counter()
        state = run_j(state, n_steps)
        state.ex[1, 1, 1].item()
        dt_wall = time.perf_counter() - t0

        cells_per_s = grid.num_cells * n_steps / dt_wall
        steps_per_s = n_steps / dt_wall
        results[n] = cells_per_s
        print(
            f"{n}^3: {cells_per_s/1e9:.3f} Gcell/s  ({steps_per_s:.1f} steps/s, "
            f"{dt_wall*1e3/n_steps:.2f} ms/step)",
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
