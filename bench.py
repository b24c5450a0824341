"""Headline benchmark: Yee-cell updates/sec/chip, free-space f32.

Prints ONE JSON line on stdout:
  {"metric": ..., "value": N, "unit": "cells/s", "vs_baseline": N}

vs_baseline is measured throughput / the 5 Gcell/s/chip target from
BASELINE.md (the reference itself publishes no numbers). Detailed results
(per size, compressed-material mode, steps/sec including probe readback)
go to stderr.

Before timing, an ON-DEVICE NUMERICS SELF-CHECK runs every kernel tier
against the XLA reference step at a small shape for ~100 ticks; a FAIL
aborts the run without printing the headline JSON (guards the known
Mosaic-miscompile class that interpret-mode tests cannot see —
docs/ROADMAP.md runtime-bugs section).

Run on the real TPU chip (no platform override). Honors:
  BENCH_SIZES      comma-separated cube sizes (default "256,512")
  BENCH_STEPS      timed steps per measurement (default 50)
  BENCH_1024       "0" to skip the 1024^3 bf16 in-place datapoint
  BENCH_SELFCHECK  "0" to skip the numerics self-check (debug only)
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback as _tb


def _trace():
    if os.environ.get('BENCH_TRACE'):
        _tb.print_exc()


_SETTLE_S = float(os.environ.get("BENCH_SETTLE_S", "2.0"))


def _step_holder(holder, fn):
    """Advance the single-element state ``holder`` through ``fn`` with NO
    stale reference left behind. This is load-bearing for HBM, not
    style: a plain ``state = fn(state)`` in a HELPER means the CALLER's
    frame still pins the old state for the whole call — at 512^3 CPML a
    state is 4.5 GB (psi z-strips pad to 128 lanes), so two helper
    frames plus the live input/output put FOUR states (18 GB) in
    flight on the 16 GB chip. pop-then-append keeps exactly
    input+output alive (9 GB). Diagnosed empirically: byte-identical
    call sequences pass at module level (one rebound variable) and
    RESOURCE_EXHAUST inside helper frames."""
    holder.append(fn(holder.pop()))
    return holder[0]


def _timed(run1, holder, sync, run2=None):
    """Wall time of ONE `run1` application with the sync-readback cost
    CANCELLED: times a (1x work + readback) region and a (2x work +
    readback) region back to back and returns their difference. Immune to
    tunnel-latency drift within a run (a fixed pre-measured readback
    constant can exceed short regions entirely and go negative).

    ``holder`` is a single-element list owning the state
    (see _step_holder). ``run2`` (2x the work of run1 in ONE call —
    e.g. the same jitted scan at double length) caps in-flight device
    state at input+output arenas; without it the 2x region chains run1
    twice, putting a third state in flight. The run2 path also SETTLES
    (sleep) between regions so the remote tunnel's deref backlog
    drains, re-taking the region-B start mark after the sleep (the
    readback cancellation is unaffected: region A = work + readback,
    region B = 2x work + readback). As a bonus the dispatch cost
    cancels exactly (one call per region). Callers must warm up run2's
    compile too — _timed_min does."""
    t0 = time.perf_counter()
    sync(_step_holder(holder, run1))
    t1 = time.perf_counter()
    if run2 is not None:
        time.sleep(_SETTLE_S)
        t1b = time.perf_counter()
        sync(_step_holder(holder, run2))
        t2 = time.perf_counter()
        return max((t2 - t1b) - (t1 - t0), 1e-9)
    _step_holder(holder, run1)
    sync(_step_holder(holder, run1))
    t2 = time.perf_counter()
    return max((t2 - t1) - (t1 - t0), 1e-9)


def _timed_min(run1, state, sync, repeats=None, run2=None):
    """MEDIAN-of-N and MIN-of-N of `_timed` regions (BENCH_REPEATS,
    default 3) plus the max/min spread in percent. One-shot timings
    behind a drifting remote tunnel cannot distinguish a perf regression
    from noise — and paired-region DIFFERENCES can be spuriously SMALL
    too (async queue overlap can nearly cancel the 2x-vs-1x regions), so
    the MEDIAN is the robust headline pick; the MIN (the statistic
    rounds 1-2 reported) is returned alongside so rounds stay comparable
    (VERDICT r03 weak #1).

    Returns ``(median_s, min_s, spread_pct, state)``.

    NOTE for big states: the CALLER's variable still pins its state for
    the duration of this call. Callers timing multi-GB states must pass
    ownership: ``holder = [st]; del st;
    _timed_min(run1, holder, ...)`` — a LIST argument is treated as an
    owning holder (see _step_holder); a bare state is wrapped and the
    caller's pin tolerated (fine for small shapes)."""
    if repeats is None:
        repeats = max(int(os.environ.get("BENCH_REPEATS", "3")), 1)
    holder = state if isinstance(state, list) else [state]
    del state
    if run2 is not None:
        # compile the 2x program OUTSIDE the timed regions (a cold
        # Mosaic compile inside region B would land in the difference)
        sync(_step_holder(holder, run2))
        time.sleep(_SETTLE_S)
    times = []
    for _ in range(repeats):
        times.append(_timed(run1, holder, sync, run2=run2))
        if run2 is not None:
            time.sleep(_SETTLE_S)
    mid = sorted(times)[len(times) // 2]
    spread = (max(times) - min(times)) / mid * 100.0
    return mid, min(times), spread, holder[0]


# Per-section records for the end-of-run terse summary. The driver keeps
# only a bounded (~2000 char) stderr tail, so every section's numbers are
# re-printed as one compact JSON line each, immediately before the
# headline JSON (VERDICT r03 weak #2). Subprocess sections pass their
# records back through BENCH_RESULT_FILE ("sections" key).
_SECTIONS: list = []


def _hbm_peak() -> float:
    """Best-effort HBM peak bandwidth of the attached chip (B/s); 0 if
    unknown. v5e (v5 lite) = 819 GB/s per public TPU specs."""
    import jax

    kind = jax.devices()[0].device_kind.lower()
    for key, bw in (("v5 lite", 819e9), ("v5e", 819e9), ("v5p", 2765e9),
                    ("v6", 1640e9), ("v4", 1228e9), ("v3", 900e9)):
        if key in kind:
            return bw
    return 0.0


def _state_bytes(state) -> int:
    import jax

    return sum(x.nbytes for x in jax.tree_util.tree_leaves(state)
               if hasattr(x, "nbytes"))


def _report(label, med_cps, min_cps=None, spread=None, bpc=None) -> None:
    """Record one section result and print its detailed stderr line.

    ``bpc`` = HBM bytes touched per cell per step (2x the state bytes —
    read + write — divided by K steps per pass and cell count), from
    which achieved bandwidth and %-of-HBM-peak derive: FDTD is
    bandwidth-bound, so these make throughput drops attributable."""
    rec = {"s": label, "g": round(med_cps / 1e9, 2)}
    msg = f"{label}: {med_cps / 1e9:.3f} Gcell/s"
    if min_cps is not None:
        rec["gm"] = round(min_cps / 1e9, 2)
        msg += f" (min-stat {min_cps / 1e9:.3f})"
    if spread is not None:
        rec["sp"] = round(spread)
        msg += f" [spread {spread:.0f}%]"
    if bpc is not None:
        bw = med_cps * bpc
        rec["bw"] = round(bw / 1e9)
        msg += f", {bpc:.1f} B/cell/step = {bw / 1e9:.0f} GB/s"
        peak = _hbm_peak()
        if peak:
            rec["hb"] = round(100 * bw / peak)
            msg += f" ({100 * bw / peak:.0f}% of HBM peak)"
    print(msg, file=sys.stderr)
    _SECTIONS.append(rec)


def _print_summary() -> None:
    print("== bench sections (g=median Gcell/s, gm=min-stat, sp=spread%, "
          "bw=GB/s, hb=%HBM-peak) ==", file=sys.stderr)
    for rec in _SECTIONS:
        print(json.dumps(rec, separators=(",", ":")), file=sys.stderr)


def _err(label, e) -> None:
    """Compact failure report: XLA runtime errors carry multi-KB
    allocation dumps that flood the driver's bounded stderr tail
    (VERDICT r03 weak #2) — truncate to head+tail."""
    _trace()
    msg = " ".join(repr(e).split())
    if len(msg) > 300:
        msg = msg[:180] + " ...[truncated]... " + msg[-90:]
    print(f"{label} failed: {msg}", file=sys.stderr)


def _measure_readback(jnp, n: int = 8) -> float:
    """Round-trip cost of the scalar sync readback, measured on a READY
    array (subtracted once from each timed region)."""
    import jax

    x = jnp.zeros((8, 128), jnp.float32) + 1.0
    jax.block_until_ready(x)
    x[1, 1].item()
    t0 = time.perf_counter()
    for _ in range(n):
        x[1, 1].item()
    return (time.perf_counter() - t0) / n


def _sync(x) -> None:
    """Reliable device sync: a scalar readback (block_until_ready can return
    early under remotely-tunneled runtimes)."""
    x.ex[1, 1, 1].item()


def _rel_err(got, ref, np) -> float:
    scale = float(np.abs(ref).max()) or 1.0
    return float(np.abs(np.asarray(got) - np.asarray(ref)).max()) / scale


def _selfcheck(ft, jax, jnp, np) -> bool:
    """On-device numerics check of every benched kernel tier vs the XLA
    step at (64, 32, 256) for ~96 ticks. Returns True iff all pass."""
    from fdtd_tpu.solver.best import best_step_fn
    from fdtd_tpu.solver.boundary import BoundaryConditions
    from fdtd_tpu.solver.cpml import Cpml
    from fdtd_tpu.solver.engine import build_step, init_engine_state
    from fdtd_tpu.solver.pallas_cpml import init_pml_kernel_state
    from fdtd_tpu.solver.pallas_cpml_k import pallas_cpml_stepk_fn
    from fdtd_tpu.solver.pallas_step import pallas_step_fn, supports
    from fdtd_tpu.solver.pallas_stepk import pallas_stepk_fn

    shape = (64, 32, 256)
    n_ticks = 96
    tol = 1e-4
    res = ft.Resolution.courant(1.0, ft.REDUCED, safety=0.99)
    grid = ft.Grid(shape=shape, resolution=res, constants=ft.REDUCED)
    dt = grid.dt
    bc = BoundaryConditions()
    src = ft.SourceSet.build(
        [ft.PointSource((32, 16, 128), ft.GaussianPulse(20 * dt, 6 * dt),
                        j=(0.0, 0.0, 1.0))]
    )
    table = ft.coefficient_table([ft.VACUUM], res, ft.REDUCED)
    coeffs = ft.CellCoefficients.uniform(table[0], jnp.float32)
    xla_step = jax.jit(ft.step_fn(inv_dx=(1.0, 1.0, 1.0), dt=dt))

    def run(step_fn_, state, calls):
        for _ in range(calls):
            state = step_fn_(state, coeffs, src)
        jax.block_until_ready(state)
        return state

    ref = run(xla_step, ft.zero_state(shape), n_ticks)
    ok = True

    def check(name, state):
        nonlocal ok
        err = max(
            _rel_err(getattr(state, f), getattr(ref, f), np)
            for f in ("ex", "ey", "ez", "hx", "hy", "hz")
        )
        good = err < tol
        ok = ok and good
        print(
            f"selfcheck {name}: rel_err {err:.2e} "
            f"{'PASS' if good else 'FAIL'}",
            file=sys.stderr,
        )

    if supports(shape, bc):
        step1 = jax.jit(
            pallas_step_fn(shape, inv_dx=(1.0, 1.0, 1.0), dt=dt)
        )
        check("fused single-step", run(step1, ft.zero_state(shape), n_ticks))

    for k in (8,):
        stepk = jax.jit(
            pallas_stepk_fn(shape, k, inv_dx=(1.0, 1.0, 1.0), dt=dt,
                            max_sources=1)
        )
        check(f"K-step K={k}", run(stepk, ft.zero_state(shape), n_ticks // k))

    # aliased (in-place, folded-halo Element windows) kernels — the
    # 1024^3 path uses the single-step variant
    stepa = jax.jit(
        pallas_stepk_fn(shape, 8, inv_dx=(1.0, 1.0, 1.0), dt=dt,
                        max_sources=1, io_alias=True),
        donate_argnums=0,
    )
    check("K-step K=8 aliased", run(stepa, ft.zero_state(shape), n_ticks // 8))
    step1a = jax.jit(
        pallas_step_fn(shape, inv_dx=(1.0, 1.0, 1.0), dt=dt, io_alias=True),
        donate_argnums=0,
    )
    check("single-step aliased", run(step1a, ft.zero_state(shape), n_ticks))

    # compressed-material (matid) tier vs dense per-cell XLA coefficients
    tab = ft.MaterialTable()
    diel = tab.register(ft.Material(relative_permittivity=3.9))
    matid = np.zeros(shape, np.uint8)
    idx = np.indices(shape)
    r2 = (
        (idx[0] - 32) ** 2 + (idx[1] - 16) ** 2 + (idx[2] - 128) ** 2
    )
    matid[r2 < 10 ** 2] = diel
    ctable = ft.coefficient_table(tab.materials, res, ft.REDUCED)
    dense = ft.CellCoefficients.from_table(
        jnp.asarray(ctable, jnp.float32), jnp.asarray(matid)
    )

    def xla_dense(state, _c, s):
        return xla_step(state, dense, s)

    ref_m = run(xla_dense, ft.zero_state(shape), n_ticks)
    stepm = jax.jit(
        pallas_stepk_fn(shape, 6, inv_dx=(1.0, 1.0, 1.0), dt=dt,
                        matid=jnp.asarray(matid), n_materials=len(tab),
                        max_sources=1)
    )
    jtable = jnp.asarray(ctable, jnp.float32)
    stm = ft.zero_state(shape)
    for _ in range(n_ticks // 6):
        stm = stepm(stm, jtable, src)
    jax.block_until_ready(stm)
    err_m = max(
        _rel_err(getattr(stm, f), getattr(ref_m, f), np)
        for f in ("ex", "ey", "ez", "hx", "hy", "hz")
    )
    good_m = err_m < tol
    ok = ok and good_m
    print(
        f"selfcheck matid K=6: rel_err {err_m:.2e} "
        f"{'PASS' if good_m else 'FAIL'}",
        file=sys.stderr,
    )

    # CPML kernel tier vs the XLA engine
    cpml = Cpml.uniform(10)
    eng = jax.jit(
        build_step(shape, inv_dx=(1.0, 1.0, 1.0), dt=dt,
                   constants=ft.REDUCED, cpml=cpml)
    )
    est = init_engine_state(shape, cpml=cpml)
    for _ in range(n_ticks):
        est = eng(est, coeffs, src)
    jax.block_until_ready(est)
    ck = 8
    cstep = jax.jit(
        pallas_cpml_stepk_fn(shape, ck, inv_dx=(1.0, 1.0, 1.0), dt=dt,
                             constants=ft.REDUCED, cpml=cpml, max_sources=1)
    )
    cst = init_pml_kernel_state(shape, cpml=cpml)
    for _ in range(n_ticks // ck):
        cst = cstep(cst, coeffs, src)
    jax.block_until_ready(cst)
    err_c = max(
        _rel_err(getattr(cst, f), getattr(est, f), np)
        for f in ("ex", "ey", "ez", "hx", "hy", "hz")
    )
    good_c = err_c < tol
    ok = ok and good_c
    print(
        f"selfcheck CPML K={ck}: rel_err {err_c:.2e} "
        f"{'PASS' if good_c else 'FAIL'}",
        file=sys.stderr,
    )

    # oblique TF/SF on the kernel tier (round 4): the correction-volume
    # block maps + sub-plane patch adds are Mosaic-only code paths the
    # interpret-mode tests cannot see
    from fdtd_tpu.solver.tfsf_oblique import ObliqueTfsf

    ob = ObliqueTfsf(
        box=((20, 40), (8, 24), (100, 150)),
        direction=(1.0, 0.6, -0.3),
        polarization=(0.0, 0.3, 1.0),
        waveform=ft.GaussianPulse(10 * dt, 4 * dt),
    )
    eng_o = jax.jit(
        build_step(shape, inv_dx=(1.0, 1.0, 1.0), dt=dt,
                   constants=ft.REDUCED, cpml=cpml, tfsf=ob)
    )
    eot = init_engine_state(shape, cpml=cpml, tfsf=ob)
    ostep = jax.jit(
        pallas_cpml_stepk_fn(shape, 4, inv_dx=(1.0, 1.0, 1.0), dt=dt,
                             constants=ft.REDUCED, cpml=cpml,
                             oblique=ob, max_sources=1)
    )
    ost = init_pml_kernel_state(shape, cpml=cpml)
    for _ in range(n_ticks // 4):
        for _ in range(4):
            eot = eng_o(eot, coeffs, src)
        ost = ostep(ost, coeffs, src)
    jax.block_until_ready(ost)
    err_o = max(
        _rel_err(getattr(ost, f), getattr(eot, f), np)
        for f in ("ex", "ey", "ez", "hx", "hy", "hz")
    )
    good_o = err_o < tol
    ok = ok and good_o
    print(
        f"selfcheck oblique-kernel K=4: rel_err {err_o:.2e} "
        f"{'PASS' if good_o else 'FAIL'}",
        file=sys.stderr,
    )

    # SHARDED oblique (round 5): the scalar-PREFETCH build
    # (PrefetchScalarGridSpec runtime correction-block maps) is a
    # Mosaic-only surface the interpret tests cannot see; 1-dev mesh,
    # gated against the single-chip oblique kernel result
    from fdtd_tpu.parallel.pallas_sharded_cpml import (
        make_pallas_sharded_cpml_stepk as _mk_sh,
        init_sharded_pml_state as _init_sh,
        collapse_pml_state as _col_sh,
    )
    from fdtd_tpu.parallel.topology import make_mesh as _mk_mesh

    _mesh1o = _mk_mesh(1, ("x",))
    so_step = jax.jit(_mk_sh(
        _mesh1o, shape, 4, inv_dx=(1.0, 1.0, 1.0), dt=dt,
        constants=ft.REDUCED, cpml=cpml, oblique=ob, max_sources=1,
    ))
    sot = _init_sh(shape, _mesh1o, 4, cpml=cpml)
    for _ in range(n_ticks // 4):
        sot = so_step(sot, coeffs, src)
    jax.block_until_ready(sot)
    got_so = _col_sh(sot, _mesh1o, 4, shape, cpml=cpml)
    err_so = max(
        _rel_err(getattr(got_so, f), getattr(ost, f), np)
        for f in ("ex", "ey", "ez", "hx", "hy", "hz")
    )
    good_so = err_so < tol
    ok = ok and good_so
    print(
        f"selfcheck sharded-oblique K=4 (scalar prefetch): rel_err "
        f"{err_so:.2e} {'PASS' if good_so else 'FAIL'}",
        file=sys.stderr,
    )
    del eot, ost, eng_o, ostep, sot, got_so, so_step

    # grid-blocked CPML tier (lateral blocks inside the pallas grid):
    # the only real-hardware compile coverage of the 3-way windowed
    # BlockSpecs + owned-center writes before the 512^3 bench tier.
    # Needs ny = 64 (plo + phi = 32 strip rows must fit one block's
    # owned 32 columns); compared against the plain CPML kernel there.
    from fdtd_tpu.solver.pallas_cpml_gb import (
        collapse_gb_pml_state,
        extend_gb_pml_state,
        gb_plan,
        make_pallas_cpml_gb_stepk,
    )

    shape_g = (64, 64, 256)
    plan_g = gb_plan(shape_g, bc, cpml, 2, n_b_candidates=(2,))
    if plan_g is None:
        ok = False
        print("selfcheck grid-blocked CPML: plan unexpectedly None FAIL",
              file=sys.stderr)
    else:
        src_g = ft.SourceSet.build(
            [ft.PointSource((32, 31, 128),
                            ft.GaussianPulse(20 * dt, 6 * dt),
                            j=(0.0, 0.0, 1.0))]
        )
        pstep_g = jax.jit(pallas_cpml_stepk_fn(
            shape_g, 2, inv_dx=(1.0, 1.0, 1.0), dt=dt,
            constants=ft.REDUCED, cpml=cpml, max_sources=1,
        ))
        pst_g = init_pml_kernel_state(shape_g, cpml=cpml)
        for _ in range(n_ticks // 2):
            pst_g = pstep_g(pst_g, coeffs, src_g)
        jax.block_until_ready(pst_g)
        gstep = jax.jit(make_pallas_cpml_gb_stepk(
            shape_g, 2, plan_g[0], plan_g[1], inv_dx=(1.0, 1.0, 1.0),
            dt=dt, constants=ft.REDUCED, cpml=cpml, max_sources=1,
        ))
        gsv = extend_gb_pml_state(
            init_pml_kernel_state(shape_g, cpml=cpml), plan_g[0],
            cpml=cpml,
        )
        for _ in range(n_ticks // 2):
            gsv = gstep(gsv, coeffs, src_g)
        jax.block_until_ready(gsv)
        gsv = collapse_gb_pml_state(gsv, plan_g[0], cpml=cpml)
        err_g = max(
            _rel_err(getattr(gsv, f), getattr(pst_g, f), np)
            for f in ("ex", "ey", "ez", "hx", "hy", "hz")
        )
        good_g = err_g < tol
        ok = ok and good_g
        print(
            f"selfcheck grid-blocked CPML K=2 n_b=2: rel_err {err_g:.2e} "
            f"{'PASS' if good_g else 'FAIL'}",
            file=sys.stderr,
        )

        # x-ZONED mode (round 5): chained zone calls with the aliasing
        # dst chain — covers the Mosaic surface of the interior
        # (no-x-psi) build plus the input_output_aliases chaining
        from fdtd_tpu.solver.pallas_cpml_xz import (
            make_pallas_cpml_xz_stepk as _mkxz,
            xz_plan as _xzp,
        )

        plan_xz = _xzp(shape_g, bc, cpml, 2, n_b_candidates=(2,))
        if plan_xz is None:
            ok = False
            print("selfcheck xz CPML: plan unexpectedly None FAIL",
                  file=sys.stderr)
        else:
            xz_kern = _mkxz(
                shape_g, 2, plan_xz, inv_dx=(1.0, 1.0, 1.0), dt=dt,
                constants=ft.REDUCED, cpml=cpml, max_sources=1,
            )
            xz_step = jax.jit(xz_kern)
            # step2 = the donation-threaded double pass the dispatcher
            # and bench tier actually run — its dst chain into donated
            # loop buffers is a distinct XLA/Mosaic surface
            xz_step2 = jax.jit(xz_kern.step2)
            xzt = extend_gb_pml_state(
                init_pml_kernel_state(shape_g, cpml=cpml), plan_xz.n_b,
                cpml=cpml,
            )
            xzt = xz_step(xzt, coeffs, src_g)
            for _ in range((n_ticks - 2) // 4):
                xzt = xz_step2(xzt, coeffs, src_g)
            for _ in range((n_ticks - 2 - 4 * ((n_ticks - 2) // 4)) // 2):
                xzt = xz_step(xzt, coeffs, src_g)
            jax.block_until_ready(xzt)
            got_xz = collapse_gb_pml_state(xzt, plan_xz.n_b, cpml=cpml)
            err_xz = max(
                _rel_err(getattr(got_xz, f), getattr(pst_g, f), np)
                for f in ("ex", "ey", "ez", "hx", "hy", "hz")
            )
            good_xz = err_xz < tol
            ok = ok and good_xz
            print(
                f"selfcheck xz CPML K=2 {tuple(plan_xz)}: rel_err "
                f"{err_xz:.2e} {'PASS' if good_xz else 'FAIL'}",
                file=sys.stderr,
            )
            del xzt, got_xz, xz_step

        # xz + OBLIQUE (round 5): the pre-placed per-block correction
        # stack riding the blocks-mode kernel — a distinct Mosaic
        # surface; vs the plain oblique kernel, both on chip
        from fdtd_tpu.solver.tfsf_oblique import ObliqueTfsf as _Ob

        ob_s = _Ob(
            box=((20, 44), (20, 44), (100, 160)),
            direction=(1.0, 0.6, -0.3),
            polarization=(0.0, 0.3, 1.0),
            waveform=ft.GaussianPulse(20 * dt, 6 * dt),
        )
        plan_ox = _xzp(shape_g, bc, cpml, 2, oblique=ob_s,
                       n_b_candidates=(2,))
        if plan_ox is None:
            ok = False
            print("selfcheck xz-oblique: plan unexpectedly None FAIL",
                  file=sys.stderr)
        else:
            ox_kern = _mkxz(
                shape_g, 2, plan_ox, inv_dx=(1.0, 1.0, 1.0), dt=dt,
                constants=ft.REDUCED, cpml=cpml, max_sources=1,
                oblique=ob_s,
            )
            ox_step2 = jax.jit(ox_kern.step2)
            po_step = jax.jit(pallas_cpml_stepk_fn(
                shape_g, 2, inv_dx=(1.0, 1.0, 1.0), dt=dt,
                constants=ft.REDUCED, cpml=cpml, max_sources=1,
                oblique=ob_s,
            ))
            oxt = extend_gb_pml_state(
                init_pml_kernel_state(shape_g, cpml=cpml), plan_ox.n_b,
                cpml=cpml,
            )
            pot = init_pml_kernel_state(shape_g, cpml=cpml)
            for _ in range(n_ticks // 4):
                oxt = ox_step2(oxt, coeffs, src_g)
                pot = po_step(pot, coeffs, src_g)
                pot = po_step(pot, coeffs, src_g)
            jax.block_until_ready(oxt)
            got_ox = collapse_gb_pml_state(oxt, plan_ox.n_b, cpml=cpml)
            err_ox = max(
                _rel_err(getattr(got_ox, f), getattr(pot, f), np)
                for f in ("ex", "ey", "ez", "hx", "hy", "hz")
            )
            good_ox = err_ox < tol
            ok = ok and good_ox
            print(
                f"selfcheck xz-oblique K=2 {tuple(plan_ox)}: rel_err "
                f"{err_ox:.2e} {'PASS' if good_ox else 'FAIL'}",
                file=sys.stderr,
            )
            del oxt, got_ox, pot, ox_step2, po_step

        # SHARDED grid-blocked mode (round 5): the blocks-inside-the-
        # grid build composed with runtime edges/xprof — the multi-chip
        # absorbing tier's K-cap lift; 1-dev mesh vs the plain kernel
        from fdtd_tpu.parallel.pallas_sharded_cpml import (
            collapse_pml_state as _colg,
            init_sharded_pml_state as _initg,
            make_pallas_sharded_cpml_stepk as _mkg,
            sharded_gb_plan,
        )
        from fdtd_tpu.parallel.topology import make_mesh as _mmg

        _m1g = _mmg(1, ("x",))
        plan_sg = sharded_gb_plan(shape_g, 1, bc, cpml, 2,
                                  n_b_candidates=(2,))
        if plan_sg is None:
            ok = False
            print("selfcheck sharded-gb CPML: plan unexpectedly None "
                  "FAIL", file=sys.stderr)
        else:
            sg_kern = _mkg(
                _m1g, shape_g, 2, inv_dx=(1.0, 1.0, 1.0), dt=dt,
                constants=ft.REDUCED, cpml=cpml, max_sources=1,
                blocks=plan_sg,
            )
            sg_step = jax.jit(sg_kern)
            sg_step2 = jax.jit(sg_kern.step2)  # donated double pass
            sgt = _initg(shape_g, _m1g, 2, cpml=cpml)
            sgt = sg_step(sgt, coeffs, src_g)
            for _ in range((n_ticks - 2) // 4):
                sgt = sg_step2(sgt, coeffs, src_g)
            for _ in range((n_ticks - 2 - 4 * ((n_ticks - 2) // 4)) // 2):
                sgt = sg_step(sgt, coeffs, src_g)
            jax.block_until_ready(sgt)
            got_sg = _colg(sgt, _m1g, 2, shape_g, cpml=cpml)
            err_sg = max(
                _rel_err(getattr(got_sg, f), getattr(pst_g, f), np)
                for f in ("ex", "ey", "ez", "hx", "hy", "hz")
            )
            good_sg = err_sg < tol
            ok = ok and good_sg
            print(
                f"selfcheck sharded-gb CPML K=2 n_b=2: rel_err "
                f"{err_sg:.2e} {'PASS' if good_sg else 'FAIL'}",
                file=sys.stderr,
            )
            del sgt, got_sg, sg_step

    # --- sharded kernel variants on an n_dev=1 mesh, interpret=False ----
    # This is the ONLY real-hardware compile coverage of the kernel builds
    # the multi-chip path uses (runtime_edges + runtime_xprof [+
    # runtime_tfsf]): the sharded tests run interpret-mode on CPU, and
    # interpret semantics have diverged from Mosaic twice before
    # (docs/ROADMAP.md runtime-bugs section).
    from fdtd_tpu.parallel.pallas_sharded_cpml import (
        collapse_pml_state,
        init_sharded_pml_state,
        make_pallas_sharded_cpml_stepk,
        supports_sharded_cpml,
    )
    from fdtd_tpu.parallel.pallas_sharded_k import (
        collapse_state,
        extend_state,
        make_pallas_sharded_stepk,
    )
    from fdtd_tpu.parallel.topology import make_mesh
    from fdtd_tpu.solver.tfsf import Tfsf

    mesh1 = make_mesh(1, ("x",))

    def run_sharded(step_fn_, state, calls):
        for _ in range(calls):
            state = step_fn_(state, coeffs, src)
        jax.block_until_ready(state)
        return state

    # free-space sharded K-step vs the XLA reference `ref`
    fs_step = jax.jit(make_pallas_sharded_stepk(
        mesh1, 8, shape[0], inv_dx=(1.0, 1.0, 1.0), dt=dt, max_sources=1,
    ))
    fst = run_sharded(fs_step, extend_state(ft.zero_state(shape), mesh1, 8),
                      n_ticks // 8)
    check("sharded K-step K=8 (1-dev mesh)", collapse_state(fst, mesh1, 8))

    # sharded CPML K-step vs the single-chip CPML kernel result `cst`
    sh_step = jax.jit(make_pallas_sharded_cpml_stepk(
        mesh1, shape, ck, inv_dx=(1.0, 1.0, 1.0), dt=dt,
        constants=ft.REDUCED, cpml=cpml, max_sources=1,
    ))
    assert supports_sharded_cpml(shape, 1, bc, cpml, ck)
    sst = run_sharded(
        sh_step, init_sharded_pml_state(shape, mesh1, ck, cpml=cpml),
        n_ticks // ck)
    gst = collapse_pml_state(sst, mesh1, ck, shape, cpml=cpml)
    err_sc = max(
        _rel_err(getattr(gst, f), getattr(cst, f), np)
        for f in ("ex", "ey", "ez", "hx", "hy", "hz")
    )
    good_sc = err_sc < tol
    ok = ok and good_sc
    print(
        f"selfcheck sharded CPML K={ck}: rel_err {err_sc:.2e} "
        f"{'PASS' if good_sc else 'FAIL'}",
        file=sys.stderr,
    )

    # sharded CPML + slab TF/SF (runtime_tfsf build) vs single-chip TF/SF
    tfsf = Tfsf(span=(20, 44), waveform=ft.GaussianPulse(20 * dt, 6 * dt))
    reft_step = jax.jit(pallas_cpml_stepk_fn(
        shape, ck, inv_dx=(1.0, 1.0, 1.0), dt=dt, constants=ft.REDUCED,
        cpml=cpml, tfsf=tfsf, max_sources=1,
    ))
    rtt = run_sharded(
        reft_step, init_pml_kernel_state(shape, cpml=cpml, tfsf=tfsf),
        n_ticks // ck)
    sht_step = jax.jit(make_pallas_sharded_cpml_stepk(
        mesh1, shape, ck, inv_dx=(1.0, 1.0, 1.0), dt=dt,
        constants=ft.REDUCED, cpml=cpml, tfsf=tfsf, max_sources=1,
    ))
    stt = run_sharded(
        sht_step,
        init_sharded_pml_state(shape, mesh1, ck, cpml=cpml, tfsf=tfsf),
        n_ticks // ck)
    gtt = collapse_pml_state(stt, mesh1, ck, shape, cpml=cpml)
    err_st = max(
        _rel_err(getattr(gtt, f), getattr(rtt, f), np)
        for f in ("ex", "ey", "ez", "hx", "hy", "hz")
    )
    good_st = err_st < tol
    ok = ok and good_st
    print(
        f"selfcheck sharded CPML+TF/SF K={ck}: rel_err {err_st:.2e} "
        f"{'PASS' if good_st else 'FAIL'}",
        file=sys.stderr,
    )

    # lateral (y_halo + runtime y-strip profiles) kernel variant on a
    # 1x1 ("x", "y") mesh — the 2-D decomposition's Mosaic build
    mesh_xy = make_mesh(1, ("x", "y"))
    lat_step = jax.jit(make_pallas_sharded_cpml_stepk(
        mesh_xy, shape, ck, inv_dx=(1.0, 1.0, 1.0), dt=dt,
        constants=ft.REDUCED, cpml=cpml, max_sources=1, y_axis="y",
    ))
    lst = run_sharded(
        lat_step,
        init_sharded_pml_state(shape, mesh_xy, ck, cpml=cpml, y_axis="y"),
        n_ticks // ck)
    glt = collapse_pml_state(lst, mesh_xy, ck, shape, cpml=cpml,
                             y_axis="y")
    err_lt = max(
        _rel_err(getattr(glt, f), getattr(cst, f), np)
        for f in ("ex", "ey", "ez", "hx", "hy", "hz")
    )
    good_lt = err_lt < tol
    ok = ok and good_lt
    print(
        f"selfcheck sharded CPML 2-D-layout K={ck}: rel_err {err_lt:.2e} "
        f"{'PASS' if good_lt else 'FAIL'}",
        file=sys.stderr,
    )

    # box TF/SF under the 2-D layout (runtime_box_lat variant, round 3):
    # the y-face coordinates come from SMEM cols 3-4 per shard — a
    # distinct Mosaic surface from the static-mask 1-D box build; gated
    # against the single-chip box kernel
    from fdtd_tpu.solver.tfsf import Tfsf as _TfsfB

    boxb = _TfsfB(span=(20, 44), span_y=(12, 23), span_z=(64, 191),
                  waveform=ft.GaussianPulse(20 * dt, 6 * dt))
    bref_step = jax.jit(pallas_cpml_stepk_fn(
        shape, ck, inv_dx=(1.0, 1.0, 1.0), dt=dt, constants=ft.REDUCED,
        cpml=cpml, tfsf=boxb, max_sources=1,
    ))
    bref = init_pml_kernel_state(shape, cpml=cpml, tfsf=boxb)
    for _ in range(n_ticks // ck):
        bref = bref_step(bref, coeffs, src)
    jax.block_until_ready(bref)
    b2_step = jax.jit(make_pallas_sharded_cpml_stepk(
        mesh_xy, shape, ck, inv_dx=(1.0, 1.0, 1.0), dt=dt,
        constants=ft.REDUCED, cpml=cpml, tfsf=boxb, max_sources=1,
        y_axis="y",
    ))
    b2t = init_sharded_pml_state(shape, mesh_xy, ck, cpml=cpml, tfsf=boxb,
                                 y_axis="y")
    for _ in range(n_ticks // ck):
        b2t = b2_step(b2t, coeffs, src)
    jax.block_until_ready(b2t)
    gbt = collapse_pml_state(b2t, mesh_xy, ck, shape, cpml=cpml,
                             y_axis="y")
    err_b2 = max(
        _rel_err(getattr(gbt, f), getattr(bref, f), np)
        for f in ("ex", "ey", "ez", "hx", "hy", "hz")
    )
    good_b2 = err_b2 < tol
    ok = ok and good_b2
    print(
        f"selfcheck sharded box-TF/SF 2-D-layout K={ck}: rel_err "
        f"{err_b2:.2e} {'PASS' if good_b2 else 'FAIL'}",
        file=sys.stderr,
    )

    # flux reductions + DFT row captures under the 2-D layout
    # (runtime_lat variant, round 3): "y" descriptor coordinates come
    # from SMEM per shard and every reduction carries the owned-window
    # mask — a distinct Mosaic surface from the static-index 1-D build;
    # gated against the single-chip flux/rows kernel
    faces2 = (("x",), ("y", 8), ("z", 64))
    rows2 = (("y", 24), ("z", 192))
    fr_ref_step = jax.jit(pallas_cpml_stepk_fn(
        shape, ck, inv_dx=(1.0, 1.0, 1.0), dt=dt, constants=ft.REDUCED,
        cpml=cpml, max_sources=1, flux_faces=faces2, dft_rows=rows2,
    ))
    frr = init_pml_kernel_state(shape, cpml=cpml)
    r_rows = r_caps = None
    for _ in range(n_ticks // ck):
        frr, rws, cps = fr_ref_step(frr, coeffs, src)
        r_rows = rws.sum(0) if r_rows is None else r_rows + rws.sum(0)
        r_caps = ([c.sum(0) for c in cps] if r_caps is None
                  else [a + c.sum(0) for a, c in zip(r_caps, cps)])
    jax.block_until_ready(frr)
    fr2_step = jax.jit(make_pallas_sharded_cpml_stepk(
        mesh_xy, shape, ck, inv_dx=(1.0, 1.0, 1.0), dt=dt,
        constants=ft.REDUCED, cpml=cpml, max_sources=1, y_axis="y",
        flux_faces=faces2, dft_rows=rows2,
    ))
    fr2 = init_sharded_pml_state(shape, mesh_xy, ck, cpml=cpml,
                                 y_axis="y")
    g_rows = g_caps = None
    for _ in range(n_ticks // ck):
        fr2, rws, cps = fr2_step(fr2, coeffs, src)
        g_rows = rws.sum(0) if g_rows is None else g_rows + rws.sum(0)
        g_caps = ([c.sum(0) for c in cps] if g_caps is None
                  else [a + c.sum(0) for a, c in zip(g_caps, cps)])
    jax.block_until_ready(fr2)
    errs_fr = [_rel_err(g_rows, r_rows, np)]
    errs_fr += [_rel_err(g, r, np) for g, r in zip(g_caps, r_caps)]
    gfr = collapse_pml_state(fr2, mesh_xy, ck, shape, cpml=cpml,
                             y_axis="y")
    errs_fr += [
        _rel_err(getattr(gfr, f), getattr(frr, f), np)
        for f in ("ex", "ey", "ez", "hx", "hy", "hz")
    ]
    err_fr = max(errs_fr)
    good_fr = err_fr < tol
    ok = ok and good_fr
    print(
        f"selfcheck sharded flux+rows 2-D-layout K={ck}: rel_err "
        f"{err_fr:.2e} {'PASS' if good_fr else 'FAIL'}",
        file=sys.stderr,
    )

    # lateral-BLOCKED CPML K-step (round 3, solver/pallas_cpml_blocked):
    # y-blocking with halo columns past the VMEM K-cap. A distinct Mosaic
    # build (y_halo + runtime y-strips with STATIC x profiles, x_extra=0)
    # with zero other hardware coverage; gated against the XLA engine at
    # a shape whose y-PML strips actually live in the edge blocks.
    from fdtd_tpu.solver.pallas_cpml_blocked import (
        blocked_plan,
        collapse_blocked_pml_state,
        extend_blocked_pml_state,
        make_pallas_cpml_blocked_stepk,
    )

    shape_b = (64, 64, 256)
    bplan = blocked_plan(shape_b, bc, cpml, ck)
    if bplan is not None:
        n_b, h_b = bplan
        eng_b = jax.jit(
            build_step(shape_b, inv_dx=(1.0, 1.0, 1.0), dt=dt,
                       constants=ft.REDUCED, cpml=cpml)
        )
        est_b = init_engine_state(shape_b, cpml=cpml)
        for _ in range(n_ticks):
            est_b = eng_b(est_b, coeffs, src)
        jax.block_until_ready(est_b)
        blk_step = jax.jit(make_pallas_cpml_blocked_stepk(
            shape_b, ck, n_b, h_b, inv_dx=(1.0, 1.0, 1.0), dt=dt,
            constants=ft.REDUCED, cpml=cpml, max_sources=1,
        ))
        bst = extend_blocked_pml_state(
            init_pml_kernel_state(shape_b, cpml=cpml), n_b, h_b, cpml=cpml
        )
        for _ in range(n_ticks // ck):
            bst = blk_step(bst, coeffs, src)
        jax.block_until_ready(bst)
        gbk = collapse_blocked_pml_state(bst, shape_b, n_b, h_b, cpml=cpml)
        err_bk = max(
            _rel_err(getattr(gbk, f), getattr(est_b, f), np)
            for f in ("ex", "ey", "ez", "hx", "hy", "hz")
        )
        good_bk = err_bk < tol
        ok = ok and good_bk
        print(
            f"selfcheck blocked CPML K={ck} n_b={n_b}: rel_err "
            f"{err_bk:.2e} {'PASS' if good_bk else 'FAIL'}",
            file=sys.stderr,
        )
    else:
        ok = False
        print("selfcheck blocked CPML: no plan at the check shape FAIL",
              file=sys.stderr)

    # blocked CPML + dense + accumulators (round 3): the composed
    # blocked build — DensePml widened to the full extended lateral
    # span, per-block RUNTIME lateral flux/capture coordinates
    # (runtime_lat), x-plane DFT accumulators on the psi tail — is a
    # distinct Mosaic program from the plain blocked kernel above;
    # gated against the UNBLOCKED kernel with the identical feature
    # set (itself gated vs the engine in the dense/flux/DFT tiers).
    from fdtd_tpu.scene.shapes import Ball as _BBall
    from fdtd_tpu.solver.pml_region import (
        dense_pml_from_depth as _bdpd,
        depth_from_contains as _bdfc,
        pad_dense_to_tiles as _bpdt,
    )

    _bball = _BBall(radius=5.0)
    _bctr = np.array([32.0, 32.0, 128.0])
    _bbox = ((26, 38), (26, 38), (122, 134))  # straddles the y cut
    _bd_h, _bd_e = _bdfc(
        lambda p: _bball.contains(p - _bctr[:, None]), _bbox, 0, +1
    )
    dense_b = _bpdt(
        _bdpd(0, _bbox, _bd_h, _bd_e, spec=cpml.spec, dx=1.0, dt=dt,
              constants=ft.REDUCED),
        shape_b,
    )
    faces_b = (("x",), ("y", 20), ("y", 44), ("z", 60), ("z", 200))
    dft_b = ((20, (24, 1)), (0.11, 0.23))
    rows_b = (("y", 24), ("z", 100))
    bplan2 = blocked_plan(
        shape_b, bc, cpml, ck, dense=dense_b,
        dft=(dft_b[0], len(dft_b[1])), dft_rows=rows_b,
    )
    if bplan2 is not None:
        n_b2, h_b2 = bplan2
        kw_b = dict(
            inv_dx=(1.0, 1.0, 1.0), dt=dt, constants=ft.REDUCED,
            cpml=cpml, max_sources=1, dense=dense_b,
            flux_faces=faces_b, dft=dft_b, dft_rows=rows_b,
        )
        ref_bd = jax.jit(pallas_cpml_stepk_fn(shape_b, ck, **kw_b))
        blk_bd = jax.jit(make_pallas_cpml_blocked_stepk(
            shape_b, ck, n_b2, h_b2, **kw_b))
        rst = init_pml_kernel_state(shape_b, cpml=cpml, dense=dense_b,
                                    dft=dft_b)
        bst2 = extend_blocked_pml_state(
            rst, n_b2, h_b2, cpml=cpml, dense=dense_b, dft=dft_b)
        rfx = bfx = None
        for _ in range(n_ticks // ck):
            rst, rf, rcp = ref_bd(rst, coeffs, src)
            bst2, bf, bcp = blk_bd(bst2, coeffs, src)
            rfx = rf.sum(0) if rfx is None else rfx + rf.sum(0)
            bfx = bf.sum(0) if bfx is None else bfx + bf.sum(0)
        jax.block_until_ready(bst2)
        gbd = collapse_blocked_pml_state(
            bst2, shape_b, n_b2, h_b2, cpml=cpml, dense=dense_b,
            dft=dft_b)
        err_bd = max(
            _rel_err(getattr(gbd, f), getattr(rst, f), np)
            for f in ("ex", "ey", "ez", "hx", "hy", "hz")
        )
        err_bd = max(err_bd, max(
            _rel_err(a, b, np) for a, b in zip(gbd.psi, rst.psi)
        ))
        scale_b = float(jnp.abs(rfx).max()) or 1.0
        err_bd = max(err_bd, float(jnp.abs(bfx - rfx).max()) / scale_b)
        for rc, bcap in zip(rcp, bcp):
            s_c = float(jnp.abs(rc).max()) or 1.0
            err_bd = max(err_bd, float(jnp.abs(bcap - rc).max()) / s_c)
        good_bd = err_bd < tol
        ok = ok and good_bd
        print(
            f"selfcheck blocked dense+flux+DFT K={ck} n_b={n_b2}: "
            f"rel_err {err_bd:.2e} {'PASS' if good_bd else 'FAIL'}",
            file=sys.stderr,
        )
    else:
        ok = False
        print("selfcheck blocked dense+flux+DFT: no plan FAIL",
              file=sys.stderr)

    # in-kernel flux reductions (accumulator tier): per-tick per-plane
    # Poynting rows from the K kernel vs per-tick XLA reductions over the
    # single-pass CPML kernel's states
    from fdtd_tpu.solver.pallas_cpml import pallas_cpml_step_fn

    faces = (("x",), ("y", 8), ("y", 24), ("z", 64), ("z", 192))
    flux_step = jax.jit(pallas_cpml_stepk_fn(
        shape, ck, inv_dx=(1.0, 1.0, 1.0), dt=dt, constants=ft.REDUCED,
        cpml=cpml, max_sources=1, flux_faces=faces,
    ))
    fst = init_pml_kernel_state(shape, cpml=cpml)
    rows_sum = None
    for _ in range(n_ticks // ck):
        fst, rows = flux_step(fst, coeffs, src)
        rows_sum = rows.sum(0) if rows_sum is None else rows_sum + rows.sum(0)
    jax.block_until_ready(fst)
    one_step = jax.jit(pallas_cpml_step_fn(
        shape, inv_dx=(1.0, 1.0, 1.0), dt=dt, constants=ft.REDUCED,
        cpml=cpml, max_sources=1,
    ))
    ost = init_pml_kernel_state(shape, cpml=cpml)
    ref_sum = jnp.zeros_like(rows_sum)

    def _reduce(s):
        e = [c.astype(jnp.float32) for c in (s.ex, s.ey, s.ez)]
        h = [c.astype(jnp.float32) for c in (s.hx, s.hy, s.hz)]
        return jnp.stack([
            (e[1] * h[2] - e[2] * h[1]).sum((1, 2)),
            (e[2][:, 8] * h[0][:, 8] - e[0][:, 8] * h[2][:, 8]).sum(-1),
            (e[2][:, 24] * h[0][:, 24] - e[0][:, 24] * h[2][:, 24]).sum(-1),
            (e[0][:, :, 64] * h[1][:, :, 64]
             - e[1][:, :, 64] * h[0][:, :, 64]).sum(-1),
            (e[0][:, :, 192] * h[1][:, :, 192]
             - e[1][:, :, 192] * h[0][:, :, 192]).sum(-1),
        ], axis=-1)

    reduce_j = jax.jit(_reduce)
    for _ in range(n_ticks):
        ost = one_step(ost, coeffs, src)
        ref_sum = ref_sum + reduce_j(ost)
    jax.block_until_ready(ref_sum)
    scale = float(jnp.abs(ref_sum).max()) or 1.0
    err_fx = float(jnp.abs(rows_sum - ref_sum).max()) / scale
    good_fx = err_fx < tol
    ok = ok and good_fx
    print(
        f"selfcheck in-kernel flux K={ck}: rel_err {err_fx:.2e} "
        f"{'PASS' if good_fx else 'FAIL'}",
        file=sys.stderr,
    )

    # volumetric-region (DensePml) kernel tier vs the XLA engine
    from fdtd_tpu.scene.shapes import Ball
    from fdtd_tpu.solver.engine import build_step as _bse
    from fdtd_tpu.solver.engine import init_engine_state as _ies
    from fdtd_tpu.solver.pml_region import (
        dense_pml_from_depth,
        depth_from_contains,
        pad_dense_to_tiles,
    )

    ball = Ball(radius=5.0)
    center = np.array([32.0, 16.0, 128.0])
    dbox = ((26, 38), (10, 22), (122, 134))
    d_h, d_e = depth_from_contains(
        lambda p: ball.contains(p - center[:, None]), dbox, 0, +1
    )
    dense = pad_dense_to_tiles(
        dense_pml_from_depth(0, dbox, d_h, d_e, spec=cpml.spec,
                             dx=1.0, dt=dt, constants=ft.REDUCED),
        shape,
    )
    deng = jax.jit(_bse(shape, inv_dx=(1.0, 1.0, 1.0), dt=dt,
                        constants=ft.REDUCED, cpml=cpml, dense=dense))
    dest = _ies(shape, cpml=cpml, dense=dense)
    for _ in range(n_ticks):
        dest = deng(dest, coeffs, src)
    jax.block_until_ready(dest)
    dstep = jax.jit(pallas_cpml_stepk_fn(
        shape, ck, inv_dx=(1.0, 1.0, 1.0), dt=dt, constants=ft.REDUCED,
        cpml=cpml, max_sources=1, dense=dense,
    ))
    dst = init_pml_kernel_state(shape, cpml=cpml, dense=dense)
    for _ in range(n_ticks // ck):
        dst = dstep(dst, coeffs, src)
    jax.block_until_ready(dst)
    err_d = max(
        _rel_err(getattr(dst, f), getattr(dest, f), np)
        for f in ("ex", "ey", "ez", "hx", "hy", "hz")
    )
    good_d = err_d < tol
    ok = ok and good_d
    print(
        f"selfcheck DensePml K={ck}: rel_err {err_d:.2e} "
        f"{'PASS' if good_d else 'FAIL'}",
        file=sys.stderr,
    )

    # DensePml under the 2-D layout (round 3): the region widens to the
    # FULL extended lateral span with identity coefficients outside the
    # real box and the psi volume carries lateral halo columns — a
    # bigger-block Mosaic build than the tight-box 1-D variant; gated
    # against the single-chip dense kernel above
    d2_step = jax.jit(make_pallas_sharded_cpml_stepk(
        mesh_xy, shape, ck, inv_dx=(1.0, 1.0, 1.0), dt=dt,
        constants=ft.REDUCED, cpml=cpml, max_sources=1, y_axis="y",
        dense=dense,
    ))
    d2t = init_sharded_pml_state(shape, mesh_xy, ck, cpml=cpml,
                                 y_axis="y", dense=dense)
    for _ in range(n_ticks // ck):
        d2t = d2_step(d2t, coeffs, src)
    jax.block_until_ready(d2t)
    gd2 = collapse_pml_state(d2t, mesh_xy, ck, shape, cpml=cpml,
                             y_axis="y", dense=dense)
    err_d2 = max(
        _rel_err(getattr(gd2, f), getattr(dst, f), np)
        for f in ("ex", "ey", "ez", "hx", "hy", "hz")
    )
    good_d2 = err_d2 < tol
    ok = ok and good_d2
    print(
        f"selfcheck sharded DensePml 2-D-layout K={ck}: rel_err "
        f"{err_d2:.2e} {'PASS' if good_d2 else 'FAIL'}",
        file=sys.stderr,
    )

    # in-kernel DFT accumulation tier vs per-tick DftProbe updates over
    # the single-pass CPML kernel's states
    from fdtd_tpu.probes import DftProbe, FieldComponent

    dft_planes_ = (20, 44, (44, 1))  # E planes + one H plane
    dft_freqs_ = (0.02, 0.05)
    dft_step = jax.jit(pallas_cpml_stepk_fn(
        shape, ck, inv_dx=(1.0, 1.0, 1.0), dt=dt, constants=ft.REDUCED,
        cpml=cpml, max_sources=1, dft=(dft_planes_, dft_freqs_),
    ))
    dfst = init_pml_kernel_state(shape, cpml=cpml,
                                 dft=(dft_planes_, dft_freqs_))
    for _ in range(n_ticks // ck):
        dfst = dft_step(dfst, coeffs, src)
    jax.block_until_ready(dfst)
    probes_ = [
        DftProbe(frequencies=dft_freqs_, axis=0,
                 index=p if isinstance(p, int) else p[0],
                 component=(FieldComponent.E
                            if isinstance(p, int) or p[1] == 0
                            else FieldComponent.H))
        for p in dft_planes_
    ]
    # lateral-plane spectra via the kernel's raw row captures, folded
    # outside the kernel (DftProbe.update_from_dft_rows)
    lat_probes = [
        DftProbe(frequencies=dft_freqs_, axis=1, index=13,
                 component=FieldComponent.E),
        DftProbe(frequencies=dft_freqs_, axis=2, index=120,
                 component=FieldComponent.H),
    ]
    lat_descs = sum((p.kernel_dft_rows() for p in lat_probes), ())
    lat_step = jax.jit(pallas_cpml_stepk_fn(
        shape, ck, inv_dx=(1.0, 1.0, 1.0), dt=dt, constants=ft.REDUCED,
        cpml=cpml, max_sources=1, dft_rows=lat_descs,
    ))
    lst = init_pml_kernel_state(shape, cpml=cpml)
    laccs = [p.init_rows_acc(lst, dt) for p in lat_probes]
    for _ in range(n_ticks // ck):
        tick0 = lst.tick
        lst, caps = lat_step(lst, coeffs, src)
        laccs = [
            p.update_from_dft_rows(a, caps[i: i + 1], tick0, dt)
            for i, (p, a) in enumerate(zip(lat_probes, laccs))
        ]
    jax.block_until_ready(laccs)
    pst = init_pml_kernel_state(shape, cpml=cpml)
    paccs = [p.init(pst, dt) for p in probes_]
    lref = [p.init(pst, dt) for p in lat_probes]
    for _ in range(n_ticks):
        pst = one_step(pst, coeffs, src)
        paccs = [p.update(a, pst, dt) for p, a in zip(probes_, paccs)]
        lref = [p.update(a, pst, dt) for p, a in zip(lat_probes, lref)]
    jax.block_until_ready(paccs)
    err_df = 0.0
    n_f = len(dft_freqs_)
    for pi, (re, im) in enumerate(paccs):
        vol = np.asarray(dfst.psi[-(len(dft_planes_) - pi)])
        live = vol[:, 1].reshape(n_f, 2, 3, *vol.shape[2:])
        scale = max(float(np.abs(np.asarray(re)).max()), 1e-12)
        err_df = max(
            err_df,
            float(np.abs(live[:, 0] - np.asarray(re)).max()) / scale,
            float(np.abs(live[:, 1] - np.asarray(im)).max()) / scale,
        )
    good_df = err_df < tol
    ok = ok and good_df
    print(
        f"selfcheck in-kernel DFT K={ck} (E+H): rel_err {err_df:.2e} "
        f"{'PASS' if good_df else 'FAIL'}",
        file=sys.stderr,
    )
    err_lat = 0.0
    for (re, im), (rre, rim) in zip(laccs, lref):
        scale = max(float(np.abs(np.asarray(rre)).max()), 1e-12)
        err_lat = max(
            err_lat,
            float(np.abs(np.asarray(re) - np.asarray(rre)).max()) / scale,
            float(np.abs(np.asarray(im) - np.asarray(rim)).max()) / scale,
        )
    good_lat = err_lat < tol
    ok = ok and good_lat
    print(
        f"selfcheck lateral-DFT row captures K={ck}: rel_err "
        f"{err_lat:.2e} {'PASS' if good_lat else 'FAIL'}",
        file=sys.stderr,
    )

    # SHARDED capture build (runtime_edges/xprof variant) on the n_dev=1
    # mesh vs the same per-tick references
    sl_step = jax.jit(make_pallas_sharded_cpml_stepk(
        mesh1, shape, ck, inv_dx=(1.0, 1.0, 1.0), dt=dt,
        constants=ft.REDUCED, cpml=cpml, max_sources=1,
        dft_rows=lat_descs,
    ))
    slt = init_sharded_pml_state(shape, mesh1, ck, cpml=cpml)
    slaccs = [p.init_rows_acc(init_pml_kernel_state(shape, cpml=cpml), dt)
              for p in lat_probes]
    for _ in range(n_ticks // ck):
        tick0 = slt.tick
        slt, caps = sl_step(slt, coeffs, src)
        slaccs = [
            p.update_from_dft_rows(a, caps[i: i + 1], tick0, dt)
            for i, (p, a) in enumerate(zip(lat_probes, slaccs))
        ]
    jax.block_until_ready(slaccs)
    err_sl = 0.0
    for (re, im), (rre, rim) in zip(slaccs, lref):
        scale = max(float(np.abs(np.asarray(rre)).max()), 1e-12)
        err_sl = max(
            err_sl,
            float(np.abs(np.asarray(re) - np.asarray(rre)).max()) / scale,
            float(np.abs(np.asarray(im) - np.asarray(rim)).max()) / scale,
        )
    good_sl = err_sl < tol
    ok = ok and good_sl
    print(
        f"selfcheck sharded DFT captures K={ck}: rel_err {err_sl:.2e} "
        f"{'PASS' if good_sl else 'FAIL'}",
        file=sys.stderr,
    )

    # RUNTIME-coordinate in-kernel DFT (the sharded x-plane spectra
    # mechanism, round 3): SMEM plane coordinates + resident accumulator
    # blocks, built through the sharded wrapper on the n_dev=1 mesh with
    # interpret=False — Mosaic-compiles the dft_rt kernel variant on the
    # chip and gates it against the static dft tier's accumulators
    srt_step = jax.jit(make_pallas_sharded_cpml_stepk(
        mesh1, shape, ck, inv_dx=(1.0, 1.0, 1.0), dt=dt,
        constants=ft.REDUCED, cpml=cpml, max_sources=1,
        dft=(dft_planes_, dft_freqs_),
    ))
    srt = init_sharded_pml_state(shape, mesh1, ck, cpml=cpml,
                                 dft=(dft_planes_, dft_freqs_))
    for _ in range(n_ticks // ck):
        srt = srt_step(srt, coeffs, src)
    jax.block_until_ready(srt.psi[-1])
    err_rt = 0.0
    for pi in range(len(dft_planes_)):
        svol = np.asarray(dfst.psi[-(len(dft_planes_) - pi)])[:, 1]
        rvol = np.asarray(srt.psi[-(len(dft_planes_) - pi)])
        scale = max(float(np.abs(svol).max()), 1e-12)
        err_rt = max(err_rt, float(np.abs(rvol - svol).max()) / scale)
    good_rt = err_rt < tol
    ok = ok and good_rt
    print(
        f"selfcheck sharded runtime-DFT K={ck}: rel_err {err_rt:.2e} "
        f"{'PASS' if good_rt else 'FAIL'}",
        file=sys.stderr,
    )

    # SHARDED DensePml (runtime coefficient volume + region-psi tail,
    # round 3): the kernel variant multi-chip volumetric absorbers use —
    # dense_spec at full extended x span with per-shard identity padding —
    # Mosaic-compiled on the n_dev=1 mesh and gated against the
    # single-chip dense kernel result `dst`
    sd_step = jax.jit(make_pallas_sharded_cpml_stepk(
        mesh1, shape, ck, inv_dx=(1.0, 1.0, 1.0), dt=dt,
        constants=ft.REDUCED, cpml=cpml, max_sources=1, dense=dense,
    ))
    sdt = init_sharded_pml_state(shape, mesh1, ck, cpml=cpml, dense=dense)
    for _ in range(n_ticks // ck):
        sdt = sd_step(sdt, coeffs, src)
    jax.block_until_ready(sdt)
    gdt = collapse_pml_state(sdt, mesh1, ck, shape, cpml=cpml, dense=dense)
    err_sd = max(
        _rel_err(getattr(gdt, f), getattr(dst, f), np)
        for f in ("ex", "ey", "ez", "hx", "hy", "hz")
    )
    # the collapsed region psi must match the single-chip layout too
    err_sd = max(err_sd, _rel_err(gdt.psi[-1][:, 1:], dst.psi[-1][:, 1:], np))
    good_sd = err_sd < tol
    ok = ok and good_sd
    print(
        f"selfcheck sharded DensePml K={ck}: rel_err {err_sd:.2e} "
        f"{'PASS' if good_sd else 'FAIL'}",
        file=sys.stderr,
    )

    # EMPTY-HOST sharded kernel (round 3): TF/SF-only and dense-only runs
    # ride the kernel with a zero-thickness absorber (best.py cpml_k) —
    # zero-width runtime x profiles are a distinct Mosaic surface, so
    # compile the combined empty+TF/SF+dense build on the chip and gate
    # it against the single-chip empty-host kernel
    empty_cpml = Cpml(thickness=((0, 0), (0, 0), (0, 0)))
    eh_ref_step = jax.jit(pallas_cpml_stepk_fn(
        shape, ck, inv_dx=(1.0, 1.0, 1.0), dt=dt, constants=ft.REDUCED,
        cpml=empty_cpml, tfsf=tfsf, max_sources=1, dense=dense,
    ))
    eh_ref = init_pml_kernel_state(shape, cpml=empty_cpml, tfsf=tfsf,
                                   dense=dense)
    for _ in range(n_ticks // ck):
        eh_ref = eh_ref_step(eh_ref, coeffs, src)
    jax.block_until_ready(eh_ref)
    eh_step = jax.jit(make_pallas_sharded_cpml_stepk(
        mesh1, shape, ck, inv_dx=(1.0, 1.0, 1.0), dt=dt,
        constants=ft.REDUCED, cpml=empty_cpml, tfsf=tfsf, max_sources=1,
        dense=dense,
    ))
    eht = init_sharded_pml_state(shape, mesh1, ck, cpml=empty_cpml,
                                 tfsf=tfsf, dense=dense)
    for _ in range(n_ticks // ck):
        eht = eh_step(eht, coeffs, src)
    jax.block_until_ready(eht)
    ght = collapse_pml_state(eht, mesh1, ck, shape, cpml=empty_cpml,
                             dense=dense)
    err_eh = max(
        _rel_err(getattr(ght, f), getattr(eh_ref, f), np)
        for f in ("ex", "ey", "ez", "hx", "hy", "hz")
    )
    good_eh = err_eh < tol
    ok = ok and good_eh
    print(
        f"selfcheck empty-host sharded TF/SF+DensePml K={ck}: rel_err "
        f"{err_eh:.2e} {'PASS' if good_eh else 'FAIL'}",
        file=sys.stderr,
    )

    # BoxDft at kernel tier: in-kernel x-plane spectra + lateral row
    # captures IN ONE KERNEL BUILD (the NTFF scattering composition),
    # reassembled by finalize_from_kernel vs per-tick BoxDft.update
    from fdtd_tpu.probes import BoxDft
    from fdtd_tpu.solver.simulation import extract_dft_acc

    bx = BoxDft(frequencies=dft_freqs_, box=((20, 44), (8, 24), (96, 160)))
    b_planes, b_descs = bx.kernel_parts()
    bstep = jax.jit(pallas_cpml_stepk_fn(
        shape, ck, inv_dx=(1.0, 1.0, 1.0), dt=dt, constants=ft.REDUCED,
        cpml=cpml, max_sources=1, dft=(b_planes, dft_freqs_),
        dft_rows=b_descs,
    ))
    bst = init_pml_kernel_state(shape, cpml=cpml,
                                dft=(b_planes, dft_freqs_))
    braccs = bx.init_rows_acc(bst, dt)
    for _ in range(n_ticks // ck):
        tick0 = bst.tick
        bst, caps = bstep(bst, coeffs, src)
        braccs = bx.update_from_dft_rows(braccs, caps, tick0, dt)
    jax.block_until_ready(braccs)
    acc_k = bx.finalize_from_kernel(
        [extract_dft_acc(bst, (b_planes, dft_freqs_), s)
         for s in range(len(b_planes))],
        braccs,
    )
    qst = init_pml_kernel_state(shape, cpml=cpml)
    acc_r = bx.init(qst, dt)
    for _ in range(n_ticks):
        qst = one_step(qst, coeffs, src)
        acc_r = bx.update(acc_r, qst, dt)
    jax.block_until_ready(acc_r)
    err_bx = 0.0
    for fi, (fk, fr) in enumerate(zip(acc_k, acc_r)):
        for qi, (ak, ar) in enumerate(zip(fk, fr)):
            ak, ar = np.asarray(ak), np.asarray(ar)
            if fi < 2 and qi < 2:
                ak, ar = ak[:, 1:], ar[:, 1:]  # x-face normal E unused
            scale = max(float(np.abs(ar).max()), 1e-12)
            err_bx = max(err_bx, float(np.abs(ak - ar).max()) / scale)
    good_bx = err_bx < tol
    ok = ok and good_bx
    print(
        f"selfcheck BoxDft kernel tier K={ck}: rel_err {err_bx:.2e} "
        f"{'PASS' if good_bx else 'FAIL'}",
        file=sys.stderr,
    )
    return ok




def _run_isolated(section: str, n_steps: int, extra_env=None):
    """Run a heavy bench section in a FRESH subprocess (own axon client).

    The remote runtime retains device memory beyond the client's live
    arrays (jax.live_arrays() reports 0 GB yet subsequent multi-GB
    allocations RESOURCE_EXHAUST; the same kernels pass standalone), so
    the big absorbing / 1024^3 sections each get their own process —
    client disconnect is the one reliable way to return HBM to the
    server. BENCH_NO_SUBPROC=1 runs them in-process instead."""
    import subprocess
    import tempfile

    if os.environ.get("BENCH_NO_SUBPROC"):
        _run_section(section, n_steps)
        return None
    env = dict(os.environ)
    env["BENCH_SECTION"] = section
    env["BENCH_STEPS"] = str(n_steps)
    if extra_env:
        env.update(extra_env)
    result = None
    with tempfile.NamedTemporaryFile("r", suffix=".json") as rf:
        env["BENCH_RESULT_FILE"] = rf.name
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__)], env=env
        )
        if r.returncode != 0:
            print(f"[isolated {section}] exited rc={r.returncode}",
                  file=sys.stderr)
        try:
            txt = open(rf.name).read().strip()
            if txt:
                result = json.loads(txt)
        except Exception:
            pass
    if result:
        _SECTIONS.extend(result.get("sections", []))
    return result


def _run_section(section: str, n_steps: int) -> None:
    if section == "cpml512":
        _section_cpml512(n_steps)
    elif section == "b1024":
        _section_1024()
    elif section == "free":
        _section_free(
            int(os.environ["BENCH_SECTION_N"]), n_steps,
            os.environ.get("BENCH_SECTION_BF16") == "1",
        )
    else:
        raise SystemExit(f"unknown BENCH_SECTION {section!r}")
    # pass the per-section records back to the parent process (the
    # section may have written headline fields to the file already)
    rf = os.environ.get("BENCH_RESULT_FILE")
    if rf:
        try:
            txt = open(rf).read().strip()
            data = json.loads(txt) if txt else {}
        except Exception:
            data = {}
        data["sections"] = _SECTIONS
        with open(rf, "w") as f:
            json.dump(data, f)


def _section_free(n: int, n_steps: int, with_bf16: bool) -> None:
    """Free-space + probe-readback (+ optionally bf16) flow for one cube
    size; writes the headline cells/s to BENCH_RESULT_FILE."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    import fdtd_tpu as ft
    from fdtd_tpu.probes import PointProbe
    from fdtd_tpu.solver.best import best_multi_step_fn, best_step_fn

    shape = (n, n, n)
    res = ft.Resolution.courant(1.0, ft.REDUCED, safety=0.99)
    grid = ft.Grid(shape=shape, resolution=res, constants=ft.REDUCED)
    table = ft.coefficient_table([ft.VACUUM], res, ft.REDUCED)
    coeffs = ft.CellCoefficients.uniform(table[0], jnp.float32)
    src = ft.SourceSet.build(
        [ft.PointSource((n // 2,) * 3,
                        ft.GaussianPulse(20 * grid.dt, 6 * grid.dt),
                        j=(0.0, 0.0, 1.0))]
    )
    state = ft.zero_state(shape)
    step_k, k_per_call = best_multi_step_fn(
        shape, inv_dx=(1.0, 1.0, 1.0), dt=grid.dt
    )
    n_calls = max(n_steps // k_per_call, 1)

    def run(state, k: int):
        def body(s, _):
            return step_k(s, coeffs, src), None

        return jax.lax.scan(body, state, None, length=k)[0]

    run_j = jax.jit(run, static_argnums=1, donate_argnums=0)
    state = run_j(state, n_calls)
    _sync(state)
    bpc = 2 * _state_bytes(state) / (k_per_call * grid.num_cells)
    dt_wall, dt_min, spread, state = _timed_min(
        lambda s: run_j(s, n_calls), state, _sync)
    steps_done = n_calls * k_per_call
    cells_per_s = grid.num_cells * steps_done / dt_wall
    _report(f"free{n} f32 K={k_per_call}", cells_per_s,
            grid.num_cells * steps_done / dt_min, spread, bpc)
    print(
        f"  ({steps_done/dt_wall:.1f} steps/s, "
        f"{dt_wall*1e3/steps_done:.2f} ms/step)",
        file=sys.stderr,
    )
    rf = os.environ.get("BENCH_RESULT_FILE")
    if rf:
        with open(rf, "w") as f:
            json.dump({"n": n, "cells_per_s": cells_per_s,
                       "cells_per_s_min": grid.num_cells * steps_done / dt_min,
                       "spread_pct": spread}, f)

    probe = PointProbe(points=(((n // 2) + 8, n // 2, n // 2),))

    def run_probe(state, k: int):
        def body(s, _):
            s2 = step_k(s, coeffs, src)
            return s2, probe.sample(s2, grid.dt)

        return jax.lax.scan(body, state, None, length=k)

    runp_j = jax.jit(run_probe, static_argnums=1, donate_argnums=0)
    state, trace = runp_j(state, 1)
    _ = np.asarray(trace)
    t0 = time.perf_counter()
    n_chunks = max(n_steps // k_per_call, 1)
    for _ in range(n_chunks):
        state, trace = runp_j(state, 1)
        _ = np.asarray(trace)
    dt_wall = time.perf_counter() - t0
    ticks = n_chunks * k_per_call
    _report(f"probe/{k_per_call}step {n}", grid.num_cells * ticks / dt_wall)
    print(f"  ({ticks/dt_wall:.1f} steps/s incl. readback)", file=sys.stderr)
    step_1 = best_step_fn(shape, inv_dx=(1.0, 1.0, 1.0), dt=grid.dt)

    def tick_probe(state):
        s2 = step_1(state, coeffs, src)
        return s2, probe.sample(s2, grid.dt)

    tickp_j = jax.jit(tick_probe, donate_argnums=0)
    state, trace = tickp_j(state)
    _ = np.asarray(trace)
    n1 = min(n_steps, 30)
    t0 = time.perf_counter()
    for _ in range(n1):
        state, trace = tickp_j(state)
        _ = np.asarray(trace)
    dt_wall = time.perf_counter() - t0
    _report(f"probe/1step {n}", grid.num_cells * n1 / dt_wall)
    print(f"  ({n1/dt_wall:.1f} steps/s incl. readback)", file=sys.stderr)
    # async double-buffered streaming (utils/streaming.AsyncHarvest):
    # dispatch step k+1 BEFORE harvesting trace k, so the ~10-30 ms
    # tunnel readback overlaps device compute (SURVEY §5 "async
    # device_get"; the reference polls blocking per tick,
    # cem-solver/src/fdtd/wgpu/mod.rs:98-107)
    from fdtd_tpu.utils.streaming import AsyncHarvest

    stream = AsyncHarvest(depth=1)
    harvested = 0
    t0 = time.perf_counter()
    for i in range(n1):
        state, trace = tickp_j(state)
        harvested += len(stream.push(trace, i))
    harvested += len(stream.drain())
    dt_wall = time.perf_counter() - t0
    assert harvested == n1
    _report(f"probe/1step-async {n}", grid.num_cells * n1 / dt_wall)
    print(f"  ({n1/dt_wall:.1f} steps/s async streaming)", file=sys.stderr)
    del state

    # bf16 storage only dispatches to a dtype-preserving kernel on TPU;
    # the CPU fallback step promotes to f32 and breaks the scan carry
    if with_bf16 and jax.devices()[0].platform == "tpu":
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
        bpc_b = 2 * _state_bytes(state) / (bk * grid.num_cells)
        dt_wall, dt_min, spread, state = _timed_min(
            lambda s: runb_j(s, bcalls), state, _sync)
        _report(f"free{n} bf16 K={bk}",
                grid.num_cells * bcalls * bk / dt_wall,
                grid.num_cells * bcalls * bk / dt_min, spread, bpc_b)


def _section_cpml512(n_steps: int) -> None:
    """512^3 absorbing tiers: f32 K=3 (VMEM-capped), bf16 K=4, and the
    sharded kernel build on an n_dev=1 mesh."""
    import jax
    import jax.numpy as jnp

    import fdtd_tpu as ft
    from fdtd_tpu.parallel.pallas_sharded_cpml import (
        init_sharded_pml_state,
        make_pallas_sharded_cpml_stepk,
        supports_sharded_cpml,
    )
    from fdtd_tpu.parallel.topology import make_mesh
    from fdtd_tpu.solver.boundary import BoundaryConditions as _BC
    from fdtd_tpu.solver.cpml import Cpml
    from fdtd_tpu.solver.pallas_cpml import init_pml_kernel_state
    from fdtd_tpu.solver.pallas_cpml_k import pallas_cpml_stepk_fn

    n = 512
    shape = (n, n, n)
    res = ft.Resolution.courant(1.0, ft.REDUCED, safety=0.99)
    grid = ft.Grid(shape=shape, resolution=res, constants=ft.REDUCED)
    table = ft.coefficient_table([ft.VACUUM], res, ft.REDUCED)
    coeffs = ft.CellCoefficients.uniform(table[0], jnp.float32)
    src = ft.SourceSet.build(
        [ft.PointSource((n // 2,) * 3,
                        ft.GaussianPulse(20 * grid.dt, 6 * grid.dt),
                        j=(0.0, 0.0, 1.0))]
    )

    from fdtd_tpu.solver.pallas_cpml_blocked import (
        blocked_plan,
        extend_blocked_pml_state,
        make_pallas_cpml_blocked_stepk,
    )

    # Every 512^3 absorbing tier holds TWO 4.5 GB states in flight while
    # timing (input + output; psi z-strips pad to 128 lanes) — ~9 GB live
    # plus a deref backlog that lags behind enqueued work on the remote
    # tunnel. That is MARGINAL on the 16 GB chip: whether a run fits
    # depends on how fast the server processes frees. So each tier runs
    # as a self-contained closure (its references die with the frame,
    # so one tier's OOM cannot pin 9 GB while later tiers run) with one
    # retry after a long settle.
    def _tier_plain(cdt, ck):
        ckstep = pallas_cpml_stepk_fn(
            shape, ck, inv_dx=(1.0, 1.0, 1.0), dt=grid.dt,
            constants=ft.REDUCED, cpml=Cpml.uniform(10),
            max_sources=1, dtype=cdt,
        )
        cstate = init_pml_kernel_state(shape, cdt, cpml=Cpml.uniform(10))

        def run_c5(state, k: int, _s=ckstep):
            def body(s, _):
                return _s(s, coeffs, src), None

            return jax.lax.scan(body, state, None, length=k)[0]

        runc_j = jax.jit(run_c5, static_argnums=1)
        c_calls = max(n_steps // ck, 1)
        cstate = runc_j(cstate, c_calls)
        _sync(cstate)
        bpc = 2 * _state_bytes(cstate) / (ck * grid.num_cells)
        holder = [cstate]
        del cstate  # ownership -> _timed_min (frame pins cost 4.5 GB)
        dt_wall, dt_min, spread, _ = _timed_min(
            lambda s, _r=runc_j: _r(s, c_calls), holder, _sync,
            run2=lambda s, _r=runc_j: _r(s, 2 * c_calls))
        _report(f"cpml{n} {jnp.dtype(cdt).name} K={ck}",
                grid.num_cells * c_calls * ck / dt_wall,
                grid.num_cells * c_calls * ck / dt_min, spread, bpc)

    # lateral-BLOCKED CPML K-step: y-blocking lifts the VMEM K-cap
    # (f32 K=3 -> K=8 via n_b blocks of halo-extended columns) — the
    # single-chip fix for BASELINE config 5's absorbing throughput
    def _tier_blocked(cdt):
        plan_b = bk_c = None
        for bk_c in (8, 6, 5, 4):
            plan_b = blocked_plan(shape, _BC(), Cpml.uniform(10),
                                  bk_c, dtype=cdt)
            if plan_b is not None:
                break
        if plan_b is None:
            raise RuntimeError("no blocked plan supports 512^3")
        n_b, h_b = plan_b
        bkstep = make_pallas_cpml_blocked_stepk(
            shape, bk_c, n_b, h_b, inv_dx=(1.0, 1.0, 1.0),
            dt=grid.dt, constants=ft.REDUCED, cpml=Cpml.uniform(10),
            max_sources=1, dtype=cdt,
        )
        bstate = extend_blocked_pml_state(
            init_pml_kernel_state(shape, cdt, cpml=Cpml.uniform(10)),
            n_b, h_b, cpml=Cpml.uniform(10),
        )

        def run_bk(state, k: int, _s=bkstep):
            def body(s, _):
                return _s(s, coeffs, src), None

            return jax.lax.scan(body, state, None, length=k)[0]

        runbk_j = jax.jit(run_bk, static_argnums=1)
        b_calls = max(n_steps // bk_c, 1)
        bstate = runbk_j(bstate, b_calls)
        _sync(bstate)
        bpc = 2 * _state_bytes(bstate) / (bk_c * grid.num_cells)
        holder = [bstate]
        del bstate  # ownership -> _timed_min (frame pins cost 4.5 GB)
        dt_wall, dt_min, spread, _ = _timed_min(
            lambda s, _r=runbk_j: _r(s, b_calls), holder, _sync,
            run2=lambda s, _r=runbk_j: _r(s, 2 * b_calls))
        _report(f"blk-cpml{n} {jnp.dtype(cdt).name} K={bk_c} nb={n_b}",
                grid.num_cells * b_calls * bk_c / dt_wall,
                grid.num_cells * b_calls * bk_c / dt_min, spread, bpc)

    # GRID-blocked CPML K-step: lateral blocks inside the pallas grid —
    # no refresh/concatenate passes, so unlike the outside-blocked tier
    # the K lift is pure win modulo the halo overlap + un-aliased
    # (double-buffered) outputs
    def _tier_gb(cdt):
        from fdtd_tpu.solver.pallas_cpml_gb import (
            collapse_gb_pml_state,
            extend_gb_pml_state,
            gb_plan,
            make_pallas_cpml_gb_stepk,
        )

        plan_g = gk = None
        for gk in (10, 8, 6):
            plan_g = gb_plan(shape, _BC(), Cpml.uniform(10), gk,
                             dtype=cdt)
            if plan_g is not None:
                break
        if plan_g is None:
            raise RuntimeError("no gb plan supports 512^3")
        n_b, h_b = plan_g
        gstep = make_pallas_cpml_gb_stepk(
            shape, gk, n_b, h_b, inv_dx=(1.0, 1.0, 1.0),
            dt=grid.dt, constants=ft.REDUCED, cpml=Cpml.uniform(10),
            max_sources=1, dtype=cdt,
        )
        gstate = extend_gb_pml_state(
            init_pml_kernel_state(shape, cdt, cpml=Cpml.uniform(10)),
            n_b, cpml=Cpml.uniform(10),
        )

        # donation-threaded double pass (step2): 2K ticks per call,
        # zero loop-boundary state copies
        def run_g(state, k: int, _s=gstep.step2):
            def body(s, _):
                return _s(s, coeffs, src), None

            return jax.lax.scan(body, state, None, length=k)[0]

        rung_j = jax.jit(run_g, static_argnums=1)
        g_calls = max(n_steps // (2 * gk), 1)
        gstate = rung_j(gstate, g_calls)
        _sync(gstate)
        bpc = 2 * _state_bytes(gstate) / (gk * grid.num_cells)
        holder = [gstate]
        del gstate  # ownership -> _timed_min (frame pins cost 4.5 GB)
        dt_wall, dt_min, spread, _ = _timed_min(
            lambda s, _r=rung_j: _r(s, g_calls), holder, _sync,
            run2=lambda s, _r=rung_j: _r(s, 2 * g_calls))
        _report(f"gb-cpml{n} {jnp.dtype(cdt).name} K={gk} nb={n_b} 2pass",
                grid.num_cells * g_calls * 2 * gk / dt_wall,
                grid.num_cells * g_calls * 2 * gk / dt_min, spread, bpc)

    # x-ZONED CPML K-step: slab-end zones run the full gb kernel, the
    # interior a kernel with NO x-psi terms (measured 35% of the
    # absorbing kernel at 512^3 f32) — the round-5 absorbing headline
    def _tier_xz(cdt):
        from fdtd_tpu.solver.pallas_cpml_gb import (
            extend_gb_pml_state,
        )
        from fdtd_tpu.solver.pallas_cpml_xz import (
            make_pallas_cpml_xz_stepk,
            xz_plan,
        )

        plan_x = xk = None
        for xk in (8, 10, 6):
            plan_x = xz_plan(shape, _BC(), Cpml.uniform(10), xk,
                             dtype=cdt)
            if plan_x is not None:
                break
        if plan_x is None:
            raise RuntimeError("no xz plan supports 512^3")
        xstep = make_pallas_cpml_xz_stepk(
            shape, xk, plan_x, inv_dx=(1.0, 1.0, 1.0),
            dt=grid.dt, constants=ft.REDUCED, cpml=Cpml.uniform(10),
            max_sources=1, dtype=cdt,
        )
        xstate = extend_gb_pml_state(
            init_pml_kernel_state(shape, cdt, cpml=Cpml.uniform(10)),
            plan_x.n_b, cpml=Cpml.uniform(10),
        )

        # donation-threaded double pass (step2): 2K ticks per call,
        # zero loop-boundary state copies
        def run_x(state, k: int, _s=xstep.step2):
            def body(s, _):
                return _s(s, coeffs, src), None

            return jax.lax.scan(body, state, None, length=k)[0]

        runx_j = jax.jit(run_x, static_argnums=1)
        x_calls = max(n_steps // (2 * xk), 1)
        xstate = runx_j(xstate, x_calls)
        _sync(xstate)
        bpc = 2 * _state_bytes(xstate) / (xk * grid.num_cells)
        holder = [xstate]
        del xstate  # ownership -> _timed_min (frame pins cost 4.5 GB)
        dt_wall, dt_min, spread, _ = _timed_min(
            lambda s, _r=runx_j: _r(s, x_calls), holder, _sync,
            run2=lambda s, _r=runx_j: _r(s, 2 * x_calls))
        _report(f"xz-cpml{n} {jnp.dtype(cdt).name} K={xk} nb={plan_x.n_b}"
                " 2pass",
                grid.num_cells * x_calls * 2 * xk / dt_wall,
                grid.num_cells * x_calls * 2 * xk / dt_min, spread, bpc)

    def _tier_sharded():
        # the dispatcher's plan for a 1-dev mesh: plain ladder capped at
        # K=3 by VMEM, upgraded to the grid-blocked build when it plans
        # (parallel/best.py gb_pl — the round-5 multi-chip K-cap lift)
        from fdtd_tpu.parallel.pallas_sharded_cpml import sharded_gb_plan

        sk, blocks_s = 3, None
        for gk in (10, 8, 6, 4):
            pg = sharded_gb_plan(shape, 1, _BC(), Cpml.uniform(10), gk)
            if pg is not None:
                sk, blocks_s = gk, pg
                break
        if blocks_s is None and not supports_sharded_cpml(
                shape, 1, _BC(), Cpml.uniform(10), sk):
            return
        mesh1 = make_mesh(1, ("x",))
        skern = make_pallas_sharded_cpml_stepk(
            mesh1, shape, sk, inv_dx=(1.0, 1.0, 1.0),
            dt=grid.dt, constants=ft.REDUCED,
            cpml=Cpml.uniform(10), max_sources=1, blocks=blocks_s,
        )
        # gb plans ride the donation-threaded double pass (step2) —
        # the path ShardedSimulation.run dispatches at 2K cadences
        sfn = skern.step2 if getattr(skern, "step2", None) else skern
        t_per = 2 * sk if sfn is not skern else sk
        sstate = init_sharded_pml_state(
            shape, mesh1, sk, cpml=Cpml.uniform(10))

        def run_s(state, kk, _s=sfn):
            def body(s, _):
                return _s(s, coeffs, src), None

            return jax.lax.scan(body, state, None, length=kk)[0]

        runs_j = jax.jit(run_s, static_argnums=1)
        s_calls = max(n_steps // t_per, 1)
        sstate = runs_j(sstate, s_calls)
        _sync(sstate)
        bpc = 2 * _state_bytes(sstate) / (sk * grid.num_cells)
        holder = [sstate]
        del sstate  # ownership -> _timed_min (frame pins cost 4.5 GB)
        dt_wall, dt_min, spread, _ = _timed_min(
            lambda s: runs_j(s, s_calls), holder, _sync,
            run2=lambda s: runs_j(s, 2 * s_calls))
        tag = (f" gb nb={blocks_s[0]} 2pass" if blocks_s is not None
               else "")
        _report(f"shard-cpml{n} 1dev f32 K={sk}{tag}",
                grid.num_cells * s_calls * t_per / dt_wall,
                grid.num_cells * s_calls * t_per / dt_min, spread, bpc)

    # oblique TF/SF at 512^3 (BASELINE config 3 at scale), BIG-box
    # regime: the xz tier's pre-placed per-block stack (round 5) caps
    # out around ~50^3 boxes (stack traffic grows as box^2 x window),
    # so a 120^3 box still takes the plain-K fallback — this section
    # keeps that regime's cost visible; _tier_oblique_xz below measures
    # the small-box xz path real scatterer runs get
    def _tier_oblique():
        from fdtd_tpu.solver.pallas_cpml_k import supports_cpml_k
        from fdtd_tpu.solver.tfsf_oblique import ObliqueTfsf

        ob = ObliqueTfsf(
            box=((196, 315), (196, 315), (196, 315)),
            direction=(1.0, 0.6, -0.3),
            polarization=(0.0, 0.3, 1.0),
            waveform=ft.GaussianPulse(20 * grid.dt, 6 * grid.dt),
        )
        ok_c = None
        for cand in (4, 3, 2):
            if supports_cpml_k(shape, _BC(), Cpml.uniform(10), cand,
                               jnp.float32, oblique=ob):
                ok_c = cand
                break
        if ok_c is None:
            raise RuntimeError("no oblique plan supports 512^3")
        ostep = pallas_cpml_stepk_fn(
            shape, ok_c, inv_dx=(1.0, 1.0, 1.0), dt=grid.dt,
            constants=ft.REDUCED, cpml=Cpml.uniform(10), oblique=ob,
            max_sources=1,
        )
        ostate = init_pml_kernel_state(shape, jnp.float32,
                                       cpml=Cpml.uniform(10))

        def run_o(state, k: int, _s=ostep):
            def body(s, _):
                return _s(s, coeffs, src), None

            return jax.lax.scan(body, state, None, length=k)[0]

        runo_j = jax.jit(run_o, static_argnums=1)
        o_calls = max(n_steps // ok_c, 1)
        ostate = runo_j(ostate, o_calls)
        _sync(ostate)
        bpc = 2 * _state_bytes(ostate) / (ok_c * grid.num_cells)
        holder = [ostate]
        del ostate
        dt_wall, dt_min, spread, _ = _timed_min(
            lambda s, _r=runo_j: _r(s, o_calls), holder, _sync,
            run2=lambda s, _r=runo_j: _r(s, 2 * o_calls))
        _report(f"oblique-cpml{n} f32 K={ok_c} box120",
                grid.num_cells * o_calls * ok_c / dt_wall,
                grid.num_cells * o_calls * ok_c / dt_min, spread, bpc)

    def _tier_oblique_xz():
        # round 5: oblique rides the x-zoned tier when the correction
        # stack's pre-placed per-block form stays modest (xz_plan stack
        # guard) — a 48^3 scatterer box, the realistic NEC-antenna
        # scale; the big-box (120^3) plain-fallback line above keeps
        # that regime's cost visible
        from fdtd_tpu.solver.pallas_cpml_gb import extend_gb_pml_state
        from fdtd_tpu.solver.pallas_cpml_xz import (
            make_pallas_cpml_xz_stepk,
            xz_plan,
        )
        from fdtd_tpu.solver.tfsf_oblique import ObliqueTfsf

        ob = ObliqueTfsf(
            box=((232, 280), (232, 280), (232, 280)),
            direction=(1.0, 0.6, -0.3),
            polarization=(0.0, 0.3, 1.0),
            waveform=ft.GaussianPulse(20 * grid.dt, 6 * grid.dt),
        )
        plan_o = xk = None
        for xk in (8, 10, 6):
            plan_o = xz_plan(shape, _BC(), Cpml.uniform(10), xk,
                             oblique=ob)
            if plan_o is not None:
                break
        if plan_o is None:
            raise RuntimeError("no xz oblique plan supports 512^3")
        xstep = make_pallas_cpml_xz_stepk(
            shape, xk, plan_o, inv_dx=(1.0, 1.0, 1.0), dt=grid.dt,
            constants=ft.REDUCED, cpml=Cpml.uniform(10), oblique=ob,
            max_sources=1,
        )
        xstate = extend_gb_pml_state(
            init_pml_kernel_state(shape, jnp.float32,
                                  cpml=Cpml.uniform(10)),
            plan_o.n_b, cpml=Cpml.uniform(10),
        )

        def run_ox(state, k: int, _s=xstep.step2):
            def body(s, _):
                return _s(s, coeffs, src), None

            return jax.lax.scan(body, state, None, length=k)[0]

        runox_j = jax.jit(run_ox, static_argnums=1)
        ox_calls = max(n_steps // (2 * xk), 1)
        xstate = runox_j(xstate, ox_calls)
        _sync(xstate)
        bpc = 2 * _state_bytes(xstate) / (xk * grid.num_cells)
        holder = [xstate]
        del xstate
        dt_wall, dt_min, spread, _ = _timed_min(
            lambda s, _r=runox_j: _r(s, ox_calls), holder, _sync,
            run2=lambda s, _r=runox_j: _r(s, 2 * ox_calls))
        _report(f"oblique-xz{n} f32 K={xk} box48 2pass",
                grid.num_cells * ox_calls * 2 * xk / dt_wall,
                grid.num_cells * ox_calls * 2 * xk / dt_min, spread,
                bpc)

    import gc

    tiers = [
        (f"{n}^3 CPML float32 K=3", lambda: _tier_plain(jnp.float32, 3)),
        (f"{n}^3 CPML bfloat16 K=4",
         lambda: _tier_plain(jnp.bfloat16, 4)),
        (f"{n}^3 grid-blocked CPML float32",
         lambda: _tier_gb(jnp.float32)),
        (f"{n}^3 grid-blocked CPML bfloat16",
         lambda: _tier_gb(jnp.bfloat16)),
        (f"{n}^3 x-zoned CPML float32",
         lambda: _tier_xz(jnp.float32)),
        (f"{n}^3 x-zoned CPML bfloat16",
         lambda: _tier_xz(jnp.bfloat16)),
        (f"{n}^3 blocked CPML float32",
         lambda: _tier_blocked(jnp.float32)),
        (f"{n}^3 blocked CPML bfloat16",
         lambda: _tier_blocked(jnp.bfloat16)),
        (f"{n}^3 oblique TF/SF", _tier_oblique),
        (f"{n}^3 oblique TF/SF xz", _tier_oblique_xz),
        (f"{n}^3 sharded tier", _tier_sharded),
    ]
    for label, tier in tiers:
        for attempt in (0, 1):
            try:
                tier()
                break
            except Exception as e:
                jax.clear_caches()
                gc.collect()
                if attempt == 0:
                    _err(f"{label} attempt 1 (retrying)", e)
                    time.sleep(15.0)
                else:
                    _err(label, e)
        jax.clear_caches()
        gc.collect()
        time.sleep(_SETTLE_S)


def _section_1024() -> None:
    """1024^3 datapoints: bf16 in-place single-step, the K=2 blocked
    attempt, and the explicit absorbing skip."""
    import jax
    import jax.numpy as jnp

    import fdtd_tpu as ft

    n = 1024
    shape = (n, n, n)
    res = ft.Resolution.courant(1.0, ft.REDUCED, safety=0.99)
    grid = ft.Grid(shape=shape, resolution=res, constants=ft.REDUCED)
    src = ft.SourceSet.build(
        [ft.PointSource((n // 2,) * 3,
                        ft.GaussianPulse(20 * grid.dt, 6 * grid.dt),
                        j=(0.0, 0.0, 1.0))],
        dtype=jnp.bfloat16,
    )
    table = ft.coefficient_table([ft.VACUUM], res, ft.REDUCED)
    coeffs = ft.CellCoefficients.uniform(table[0], jnp.float32)

    try:
        from fdtd_tpu.solver.pallas_step import pallas_step_fn as _psf1

        bstep = jax.jit(
            _psf1(shape, inv_dx=(1.0, 1.0, 1.0), dt=grid.dt,
                  dtype=jnp.bfloat16, io_alias=True),
            donate_argnums=0,
        )
        state = ft.zero_state(shape, jnp.bfloat16)
        state = bstep(state, coeffs, src)  # warmup/compile
        _sync(state)
        ticks = 10

        def _run1024(s):
            for _ in range(ticks):
                s = bstep(s, coeffs, src)
            return s

        bpc = 2 * _state_bytes(state) / grid.num_cells
        dt_wall, dt_min, spread, state = _timed_min(_run1024, state, _sync)
        _report("free1024 bf16 1step inplace",
                grid.num_cells * ticks / dt_wall,
                grid.num_cells * ticks / dt_min, spread, bpc)
        del state
    except Exception as e:  # HBM or compile limits: report, don't fail
        _err("free1024 bf16", e)
    import gc

    jax.clear_caches()
    gc.collect()

    # K=2 temporally-blocked 1024^3 (aliased, bf16): 6(K-1)+2 = 8 f32
    # carry planes at 1024^2 = 32 MB + the aliased pipeline's ~30
    # plane-equivalents — near the VMEM cap; attempt and record the
    # outcome either way (BASELINE config 5 upper bound)
    try:
        from fdtd_tpu.solver.pallas_stepk import pallas_stepk_fn as _psk

        k2step = jax.jit(
            _psk(shape, 2, inv_dx=(1.0, 1.0, 1.0), dt=grid.dt,
                 dtype=jnp.bfloat16, io_alias=True, max_sources=1),
            donate_argnums=0,
        )
        state = ft.zero_state(shape, jnp.bfloat16)
        state = k2step(state, coeffs, src)
        _sync(state)
        passes = 5

        def _runk2(s):
            for _ in range(passes):
                s = k2step(s, coeffs, src)
            return s

        bpc = _state_bytes(state) / grid.num_cells
        dt_wall, dt_min, spread, state = _timed_min(_runk2, state, _sync)
        _report("free1024 bf16 K=2 inplace",
                grid.num_cells * passes * 2 / dt_wall,
                grid.num_cells * passes * 2 / dt_min, spread, bpc)
        del state
    except Exception as e:
        _err("free1024 K=2 (expected: carry planes exceed VMEM)", e)
    # 1024^3 ABSORBING is not reachable on one 16 GB chip. Print the
    # arithmetic (computed from the real psi layout, not asserted) so
    # the skip is a proof, not a claim. The capability lives on the
    # >= 2-chip sharded CPML tier, which this single-chip host can't
    # run; tests/test_sharded_simulation.py::
    # test_scaled_1024_absorbing_virtual_mesh stands in for it on an
    # 8-device virtual mesh at the scaled shape (1024, 64, 128).
    _print_1024_cpml_budget(shape)


def _print_1024_cpml_budget(shape) -> None:
    """Exact single-chip memory budget for absorbing at ``shape``,
    computed from solver/pallas_cpml.py's actual tensor layout."""
    import numpy as np

    from fdtd_tpu.solver.cpml import Cpml
    from fdtd_tpu.solver.pallas_cpml import _psi_layout

    gib = float(1 << 30)
    cells = int(np.prod(shape))
    fields_bf16 = 6 * cells * 2 / gib
    layout = _psi_layout(shape, Cpml.uniform(10))
    psi = {0: 0.0, 1: 0.0, 2: 0.0}
    for half, axis, comp, end, tshape, pads in layout:
        psi[axis] += int(np.prod(tshape)) * 4 / gib
    psi_total = sum(psi.values())
    ny, nz = shape[1], shape[2]
    # single-pass VMEM pipeline at full-lateral planes: in/out blocks
    # double-buffered (6+2 field in + 6 out bf16; psi blocks f32 at the
    # padded strip widths) + 2 f32 scratch planes
    plane_f32 = ny * nz * 4 / (1 << 20)
    plane_bf16 = ny * nz * 2 / (1 << 20)
    psi_blocks = 0.0
    for half, axis, comp, end, tshape, pads in layout:
        if axis == 0:
            psi_blocks += plane_f32
        elif axis == 1:
            psi_blocks += (pads[2] + pads[3]) * nz * 4 / (1 << 20)
        else:
            psi_blocks += ny * (pads[2] + pads[3]) * 4 / (1 << 20)
    vmem = 2 * (14 * plane_bf16 + 2 * psi_blocks) + 2 * plane_f32
    print(
        f"1024^3 CPML: skipped on 1 chip — the budget cannot close:\n"
        f"  fields bf16 (6 arrays, 1 copy) = {fields_bf16:.1f} GiB; the "
        f"full-lateral single-pass kernel could alias in->out, but "
        f"every VMEM-feasible variant at this plane size is "
        f"blocks-mode (lateral tiles), where in->out aliasing is "
        f"unsound without side-copied halos -> 2x = "
        f"{2 * fields_bf16:.1f} GiB\n"
        f"  psi f32: x-slabs {psi[0]:.2f} + y-strips {psi[1]:.2f} + "
        f"z-strips {psi[2]:.2f} (128-lane padding: 22 real lanes pad to "
        f"256) = {psi_total:.2f} GiB\n"
        f"  un-aliased total {2 * fields_bf16 + 2 * psi_total:.1f} GiB; "
        f"even fully aliased, fields+psi = "
        f"{fields_bf16 + psi_total:.1f} GiB vs ~15.5 GiB usable HBM -> "
        f"fits ONLY with bf16 psi (error 2x, tests/test_bf16_study.py)\n"
        f"  and the single-pass VMEM pipeline at (1, {ny}, {nz}) planes "
        f"needs ~{vmem:.0f} MiB double-buffered vs 128 MiB VMEM -> the "
        f"kernel cannot pipeline full-lateral 1024^2 planes at all\n"
        f"  lateral-blocked ALIASED case (round 5): grid-blocked tiles "
        f"lift VMEM (nb=4 h=16 K=4 fits), and in-place io-aliasing is "
        f"SOUND if each block's 2h halo columns are pre-copied to a "
        f"side tensor (blocks-outer re-reads then hit the copy, not "
        f"the tick-K writes) — but the budget STILL misses: fields "
        f"bf16 12.0 + psi bf16 {psi_total / 2:.2f} (z-strips dominate: "
        f"{psi[2] / 2:.2f} GiB because 22 real lanes pad to 2x128) + "
        f"side tensors 4 blocks x 32 cols x 6 fields = 1.6 GiB "
        f"=> {12.0 + psi_total / 2 + 1.6:.1f} GiB vs ~15.5 usable. "
        f"Closing it needs the z-strip psi on sublanes instead of "
        f"lanes, which breaks the Mosaic lane alignment the in-kernel "
        f"strip segment slicing relies on — ruled out this round\n"
        f"  => needs the >=2-chip sharded CPML tier (per-shard planes "
        f"halve both budgets); stand-in test: scaled virtual mesh "
        f"(1024, 64, 128) x 8 devices",
        file=sys.stderr,
    )


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    import fdtd_tpu as ft
    from fdtd_tpu.utils.observability import enable_compilation_cache

    # repeated bench invocations reuse Mosaic/XLA compiles (the K-step
    # kernels are compile-heavy); see BENCH_NO_CACHE to opt out
    if not os.environ.get("BENCH_NO_CACHE"):
        enable_compilation_cache()

    # subprocess mode: run ONE isolated heavy section and exit
    # (see _run_isolated)
    section = os.environ.get("BENCH_SECTION")
    if section:
        _run_section(section, int(os.environ.get("BENCH_STEPS", "50")))
        return
    from fdtd_tpu.probes import PointProbe

    sizes = [
        int(s) for s in os.environ.get("BENCH_SIZES", "256,512").split(",") if s
    ]
    n_steps = int(os.environ.get("BENCH_STEPS", "50"))
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}, platform {dev.platform}", file=sys.stderr)

    readback_s = _measure_readback(jnp)
    print(f"sync readback: {readback_s*1e3:.1f} ms (measured)", file=sys.stderr)

    if dev.platform == "tpu" and os.environ.get("BENCH_SELFCHECK", "1") != "0":
        t0 = time.perf_counter()
        if not _selfcheck(ft, jax, jnp, np):
            print(
                "selfcheck FAILED: kernel numerics diverge from the XLA "
                "reference on this device — refusing to print a headline",
                file=sys.stderr,
            )
            sys.exit(1)
        print(
            f"selfcheck PASS ({time.perf_counter()-t0:.0f}s)", file=sys.stderr
        )

    target = 5e9  # BASELINE.md: >= 5 Gcell-updates/s/chip at 512^3 f32
    results = {}
    for n in sizes:
        # big sizes: the whole flow runs in ISOLATED subprocesses so no
        # single client accumulates allocator pools across tiers — the
        # remote runtime retains pool arenas beyond live arrays, and two
        # concurrent multi-GB pools exhaust the chip (measured: 512^3
        # absorbing OOMs after the free-space flow in the same OR a
        # sibling process, passes standalone)
        if n >= 512 and dev.platform == "tpu":
            r = _run_isolated("free", n_steps, extra_env={
                "BENCH_SECTION_N": str(n),
                "BENCH_SECTION_BF16": "1" if n == max(sizes) else "0",
            })
            if r and "cells_per_s" in r:
                results[n] = r["cells_per_s"]
            if n == 512:
                _run_isolated("cpml512", n_steps)
            continue

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
        bpc = 2 * _state_bytes(state) / (k_per_call * grid.num_cells)
        dt_wall, dt_min, spread, state = _timed_min(
            lambda s: run_j(s, n_calls), state, _sync)

        steps_done = n_calls * k_per_call
        cells_per_s = grid.num_cells * steps_done / dt_wall
        results[n] = cells_per_s
        _report(f"free{n} f32 K={k_per_call}", cells_per_s,
                grid.num_cells * steps_done / dt_min, spread, bpc)
        print(
            f"  ({steps_done/dt_wall:.1f} steps/s, "
            f"{dt_wall*1e3/steps_done:.2f} ms/step)",
            file=sys.stderr,
        )
        # steps/sec INCLUDING probe readback, at BOTH cadences:
        # (a) per-K-step chunks (the runner's observation-throttle pattern)
        # (b) per-1-step readback (the conservative BASELINE metric)
        probe = PointProbe(points=(((n // 2) + 8, n // 2, n // 2),))

        def run_probe(state, k: int):
            def body(s, _):
                s2 = step_k(s, coeffs, src)
                return s2, probe.sample(s2, grid.dt)

            return jax.lax.scan(body, state, None, length=k)

        runp_j = jax.jit(run_probe, static_argnums=1, donate_argnums=0)
        state, trace = runp_j(state, 1)
        _ = np.asarray(trace)  # includes transfer
        t0 = time.perf_counter()
        n_chunks = max(n_steps // k_per_call, 1)
        for _ in range(n_chunks):
            state, trace = runp_j(state, 1)
            _ = np.asarray(trace)
        dt_wall = time.perf_counter() - t0
        ticks = n_chunks * k_per_call
        _report(f"probe/{k_per_call}step {n}",
                grid.num_cells * ticks / dt_wall)
        print(f"  ({ticks/dt_wall:.1f} steps/s incl. readback)",
              file=sys.stderr)
        # per-1-step probe readback (single-step kernel, one pull per tick)
        from fdtd_tpu.solver.best import best_step_fn

        step_1 = best_step_fn(shape, inv_dx=(1.0, 1.0, 1.0), dt=grid.dt)

        def tick_probe(state):
            s2 = step_1(state, coeffs, src)
            return s2, probe.sample(s2, grid.dt)

        tickp_j = jax.jit(tick_probe, donate_argnums=0)
        state, trace = tickp_j(state)
        _ = np.asarray(trace)
        n1 = min(n_steps, 30)
        t0 = time.perf_counter()
        for _ in range(n1):
            state, trace = tickp_j(state)
            _ = np.asarray(trace)
        dt_wall = time.perf_counter() - t0
        _report(f"probe/1step {n}", grid.num_cells * n1 / dt_wall)
        print(f"  ({n1/dt_wall:.1f} steps/s incl. readback)",
              file=sys.stderr)
        # async double-buffered streaming: overlap the tunnel readback
        # with device compute (utils/streaming.AsyncHarvest, SURVEY §5)
        from fdtd_tpu.utils.streaming import AsyncHarvest

        stream = AsyncHarvest(depth=1)
        harvested = 0
        t0 = time.perf_counter()
        for i in range(n1):
            state, trace = tickp_j(state)
            harvested += len(stream.push(trace, i))
        harvested += len(stream.drain())
        dt_wall = time.perf_counter() - t0
        assert harvested == n1
        _report(f"probe/1step-async {n}", grid.num_cells * n1 / dt_wall)
        print(f"  ({n1/dt_wall:.1f} steps/s async streaming)",
              file=sys.stderr)
        del state

        # bf16 storage mode (f32 compute): halves HBM traffic
        if n == max(sizes) and dev.platform == "tpu":
            from fdtd_tpu.solver.best import best_multi_step_fn as _bmsf

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
            bpc_b = 2 * _state_bytes(state) / (bk * grid.num_cells)
            dt_wall, dt_min, spread, state = _timed_min(
                lambda s: runb_j(s, bcalls), state, _sync)
            _report(f"free{n} bf16 K={bk}",
                    grid.num_cells * bcalls * bk / dt_wall,
                    grid.num_cells * bcalls * bk / dt_min, spread, bpc_b)
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
            try:
                cstate = runc_j(cstate, c_calls)
                _sync(cstate)
                bpc_c = 2 * _state_bytes(cstate) / (ck * grid.num_cells)
                dt_wall, dt_min, spread, cstate = _timed_min(
                    lambda s: runc_j(s, c_calls), cstate, _sync,
                    run2=lambda s: runc_j(s, 2 * c_calls))
                _report(f"cpml{n} f32 K={ck}",
                        grid.num_cells * c_calls * ck / dt_wall,
                        grid.num_cells * c_calls * ck / dt_min, spread,
                        bpc_c)
                del cstate
            except Exception as e:
                _err(f"cpml{n} K={ck}", e)

        # interior absorber (DensePml ball) at kernel tier: before round 3
        # any volumetric region forfeited the kernels entirely (XLA engine,
        # ~1.9 Gcell/s); now it rides the CPML K kernel
        if n == 256 and dev.platform == "tpu":
            from fdtd_tpu.scene.shapes import Ball
            from fdtd_tpu.solver.cpml import Cpml
            from fdtd_tpu.solver.pallas_cpml import init_pml_kernel_state
            from fdtd_tpu.solver.pallas_cpml_k import pallas_cpml_stepk_fn
            from fdtd_tpu.solver.pml_region import (
                dense_pml_from_depth,
                depth_from_contains,
                pad_dense_to_tiles,
            )

            try:
                ball = Ball(radius=20.0)
                ctr = np.array([128.0, 128.0, 128.0])
                dbox = ((104, 152), (104, 152), (64, 192))
                d_h, d_e = depth_from_contains(
                    lambda p: ball.contains(p - ctr[:, None]), dbox, 0, +1
                )
                dense = pad_dense_to_tiles(
                    dense_pml_from_depth(
                        0, dbox, d_h, d_e, spec=Cpml.uniform(10).spec,
                        dx=1.0, dt=grid.dt, constants=ft.REDUCED),
                    shape,
                )
                dk = 8
                dkstep = pallas_cpml_stepk_fn(
                    shape, dk, inv_dx=(1.0, 1.0, 1.0), dt=grid.dt,
                    constants=ft.REDUCED, cpml=Cpml.uniform(10),
                    max_sources=1, dense=dense,
                )
                dstate = init_pml_kernel_state(
                    shape, cpml=Cpml.uniform(10), dense=dense)

                def run_d(state, kk, _s=dkstep):
                    def body(s, _):
                        return _s(s, coeffs, src), None

                    return jax.lax.scan(body, state, None, length=kk)[0]

                rund_j = jax.jit(run_d, static_argnums=1)
                d_calls = max(n_steps // dk, 1)
                dstate = rund_j(dstate, d_calls)
                _sync(dstate)
                bpc_d = 2 * _state_bytes(dstate) / (dk * grid.num_cells)
                dt_wall, dt_min, spread, dstate = _timed_min(
                    lambda s: rund_j(s, d_calls), dstate, _sync,
                    run2=lambda s: rund_j(s, 2 * d_calls))
                _report(f"cpml+ball{n} f32 K={dk}",
                        grid.num_cells * d_calls * dk / dt_wall,
                        grid.num_cells * d_calls * dk / dt_min, spread,
                        bpc_d)
                del dstate, dkstep
            except Exception as e:
                _err(f"cpml+ball{n}", e)

        # XLA-engine fallback cost, measured (VERDICT r3 items 5+6):
        # (a) plain CPML through the engine — the per-shard work of every
        #     config that falls off the kernel tier (z-cut meshes,
        #     parallel/best.py fallback list), so "z-cut falls back"
        #     carries a number;
        # (b) oblique-incidence TF/SF + CPML — the one physics feature
        #     that runs engine-only (solver/tfsf_oblique.py).
        # Both print their ratio vs the kernel-tier cpml256 section.
        if n == 256 and dev.platform == "tpu" \
                and os.environ.get("BENCH_ENGINE", "1") != "0":
            from fdtd_tpu.solver.cpml import Cpml
            from fdtd_tpu.solver.engine import build_step, init_engine_state
            from fdtd_tpu.solver.tfsf_oblique import ObliqueTfsf

            def _kernel_cpml_cps():
                rec = next((r for r in _SECTIONS
                            if r["s"].startswith("cpml256 ")), None)
                return rec["g"] * 1e9 if rec else None

            for label, tfsf_ob in (
                ("engine-cpml256 (XLA fallback)", None),
                ("engine-oblique256 (XLA, CPML+oblique TF/SF)",
                 ObliqueTfsf(
                     box=((96, 160), (96, 160), (96, 160)),
                     direction=(1.0, 1.0, 0.0),
                     polarization=(0.0, 0.0, 1.0),
                     waveform=ft.GaussianPulse(20 * grid.dt, 6 * grid.dt))),
            ):
                try:
                    estep = build_step(
                        shape, inv_dx=(1.0, 1.0, 1.0), dt=grid.dt,
                        constants=ft.REDUCED, cpml=Cpml.uniform(10),
                        tfsf=tfsf_ob)
                    est = init_engine_state(
                        shape, cpml=Cpml.uniform(10), tfsf=tfsf_ob)

                    def run_e(state, k: int, _s=estep):
                        def body(s, _):
                            return _s(s, coeffs, src), None

                        return jax.lax.scan(body, state, None, length=k)[0]

                    rune_j = jax.jit(run_e, static_argnums=1)
                    e_calls = min(n_steps, 20)  # engine is slow; cap ticks
                    est = rune_j(est, e_calls)
                    _sync(est)
                    dt_wall, dt_min, spread, est = _timed_min(
                        lambda s: rune_j(s, e_calls), est, _sync,
                        run2=lambda s: rune_j(s, 2 * e_calls))
                    cps = grid.num_cells * e_calls / dt_wall
                    _report(label, cps,
                            grid.num_cells * e_calls / dt_min, spread)
                    kcps = _kernel_cpml_cps()
                    if kcps:
                        print(f"  (kernel tier is {kcps / cps:.1f}x this "
                              f"fallback)", file=sys.stderr)
                    del est, estep
                except Exception as e:
                    _err(label, e)

            # (c) oblique TF/SF ON the kernel tier (round 4): analytic
            #     correction volumes precomputed per pass, added
            #     in-kernel (pallas_cpml_k oblique=) — prints its ratio
            #     vs the engine-oblique fallback above.
            try:
                from fdtd_tpu.solver.pallas_cpml import (
                    init_pml_kernel_state as _init_pk,
                )
                from fdtd_tpu.solver.pallas_cpml_k import (
                    pallas_cpml_stepk_fn as _stepk_fn,
                )

                ob = ObliqueTfsf(
                    box=((96, 160), (96, 160), (96, 160)),
                    direction=(1.0, 1.0, 0.0),
                    polarization=(0.0, 0.0, 1.0),
                    waveform=ft.GaussianPulse(20 * grid.dt, 6 * grid.dt))
                ok_ob = 8
                okstep = _stepk_fn(
                    shape, ok_ob, inv_dx=(1.0, 1.0, 1.0), dt=grid.dt,
                    constants=ft.REDUCED, cpml=Cpml.uniform(10),
                    oblique=ob, max_sources=1)
                ost = _init_pk(shape, cpml=Cpml.uniform(10))

                def run_o(state, k: int, _s=okstep):
                    def body(s, _):
                        return _s(s, coeffs, src), None

                    return jax.lax.scan(body, state, None, length=k)[0]

                runo_j = jax.jit(run_o, static_argnums=1)
                o_calls = max(n_steps // ok_ob, 1)
                ost = runo_j(ost, o_calls)
                _sync(ost)
                bpc_o = 2 * _state_bytes(ost) / (ok_ob * grid.num_cells)
                dt_wall, dt_min, spread, ost = _timed_min(
                    lambda s: runo_j(s, o_calls), ost, _sync,
                    run2=lambda s: runo_j(s, 2 * o_calls))
                ocps = grid.num_cells * o_calls * ok_ob / dt_wall
                _report(f"oblique-k{n} (CPML+oblique TF/SF, K={ok_ob})",
                        ocps, grid.num_cells * o_calls * ok_ob / dt_min,
                        spread, bpc_o)
                erec = next(
                    (r for r in _SECTIONS
                     if r["s"].startswith("engine-oblique")), None)
                if erec is not None:
                    print(f"  ({ocps / (erec['g'] * 1e9):.1f}x the "
                          f"XLA-engine oblique path)", file=sys.stderr)
                del ost, okstep
            except Exception as e:
                _err(f"oblique-k{n}", e)

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
                bpc_m = ((2 * _state_bytes(state) + matid.nbytes)
                         / (10 * grid.num_cells))
                dt_wall, dt_min, spread, state = _timed_min(
                    lambda s: runm_j(s, mcalls), state, _sync)
                _report(f"matid{n} K=10 ({len(tab)} mats)",
                        grid.num_cells * mcalls * 10 / dt_wall,
                        grid.num_cells * mcalls * 10 / dt_min, spread,
                        bpc_m)
                del state

    # 1024^3 datapoints, isolated for the same HBM-retention reason
    if dev.platform == "tpu" and os.environ.get("BENCH_1024", "1") != "0":
        _run_isolated("b1024", n_steps)

    if not results:
        _print_summary()
        print("bench: every size failed to produce a headline number — "
              "see section errors above", file=sys.stderr)
        sys.exit(1)
    headline_n = 512 if 512 in results else max(results)
    headline = results[headline_n]
    # terse machine-parseable per-section recap right before the headline
    # so the driver's bounded stderr tail always carries every number
    _print_summary()
    out = {
        "metric": f"yee_cell_updates_per_sec_per_chip_{headline_n}^3_f32",
        "value": headline,
        "unit": "cells/s",
        "vs_baseline": headline / target,
    }
    rec = next((r for r in _SECTIONS
                if r["s"] == f"free{headline_n} f32 K=10"
                or r["s"].startswith(f"free{headline_n} f32")), None)
    if rec is not None:
        if "gm" in rec:
            out["value_min_stat"] = rec["gm"] * 1e9
        if "sp" in rec:
            out["spread_pct"] = rec["sp"]
    if headline_n != 512:
        # the 5 Gcell/s target is defined at 512^3 (BASELINE.md); flag
        # the ratio as cross-size when 512 didn't run
        out["baseline_note"] = "target defined at 512^3"
    print(json.dumps(out))


if __name__ == "__main__":
    main()
