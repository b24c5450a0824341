"""Focused on-chip timing: gated-stretch CPML kernels at 512^3.

Times the plain K-ladder and grid-blocked tiers plus a quick numerics
check vs the XLA engine at a small shape. Usage:
  python /tmp/exp_gb.py [tier ...]   tiers: plain gb gb2 check
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import fdtd_tpu as ft
from fdtd_tpu.solver.boundary import BoundaryConditions as _BC
from fdtd_tpu.solver.cpml import Cpml
from fdtd_tpu.solver.pallas_cpml import init_pml_kernel_state
from fdtd_tpu.solver.pallas_cpml_k import (
    pallas_cpml_stepk_fn as make_pallas_cpml_stepk,
)
from fdtd_tpu.solver.pallas_cpml_gb import (
    collapse_gb_pml_state, extend_gb_pml_state, gb_plan,
    make_pallas_cpml_gb_stepk,
)
from fdtd_tpu.utils.observability import enable_compilation_cache

enable_compilation_cache()

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
NCELL = grid.num_cells
cpml = Cpml.uniform(10)


def _sync(state):
    jnp.asarray(state.ex[0, 0, 0]).item()


def timeit(run_j, holder, calls, ticks_per_call, label):
    """holder = [state]; pop-then-append keeps exactly in+out alive
    (bench.py _step_holder: a frame-held state pins 4.5 GB at 512^3)."""
    def _adv(c):
        holder.append(run_j(holder.pop(), c))
        _sync(holder[0])
    _adv(calls)
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        _adv(calls)
        t1 = time.perf_counter()
        _adv(2 * calls)
        t2 = time.perf_counter()
        dt = (t2 - t1) - (t1 - t0)
        if best is None or dt < best:
            best = dt
    g = NCELL * calls * ticks_per_call / best / 1e9
    print(f"{label}: {g:.2f} Gcell/s", flush=True)


def tier_plain(k, dtype=jnp.float32):
    step = make_pallas_cpml_stepk(
        shape, k, inv_dx=(1.0, 1.0, 1.0), dt=grid.dt,
        constants=ft.REDUCED, cpml=cpml, max_sources=1, dtype=dtype)
    state = init_pml_kernel_state(shape, dtype, cpml=cpml)

    def run(state, c):
        def body(s, _):
            return step(s, coeffs, src), None
        return jax.lax.scan(body, state, None, length=c)[0]

    run_j = jax.jit(run, static_argnums=1)
    calls = max(48 // k, 1)
    holder = [state]
    del state
    timeit(run_j, holder, calls, k, f"plain {jnp.dtype(dtype).name} K={k}")


def tier_gb(kk=None, nbs=(2, 4, 8), dtype=jnp.float32):
    ks = (kk,) if kk else (10, 8, 6)
    for gk in ks:
        for nb in nbs:
            plan = gb_plan(shape, _BC(), cpml, gk, dtype=dtype,
                           n_b_candidates=(nb,))
            if plan is None:
                print(f"gb K={gk} nb={nb}: no plan", flush=True)
                continue
            n_b, h = plan
            step = make_pallas_cpml_gb_stepk(
                shape, gk, n_b, h, inv_dx=(1.0, 1.0, 1.0), dt=grid.dt,
                constants=ft.REDUCED, cpml=cpml, max_sources=1,
                dtype=dtype)
            state = extend_gb_pml_state(
                init_pml_kernel_state(shape, dtype, cpml=cpml),
                n_b, cpml=cpml)

            def run(state, c, _s=step):
                def body(s, _):
                    return _s(s, coeffs, src), None
                return jax.lax.scan(body, state, None, length=c)[0]

            run_j = jax.jit(run, static_argnums=1)
            calls = max(48 // gk, 1)
            holder = [state]
            del state
            try:
                timeit(run_j, holder, calls, gk,
                       f"gb {jnp.dtype(dtype).name} K={gk} nb={n_b} h={h}")
            except Exception as e:
                print(f"gb K={gk} nb={n_b}: {type(e).__name__} "
                      f"{str(e)[:200]}", flush=True)
            del holder
            jax.clear_caches()


def tier_xz(kk=None, nbs=(2, 4), dtype=jnp.float32):
    from fdtd_tpu.solver.pallas_cpml_xz import (
        make_pallas_cpml_xz_stepk, xz_plan,
    )

    ks = (kk,) if kk else (10, 8)
    for gk in ks:
        for nb in nbs:
            plan = xz_plan(shape, _BC(), cpml, gk, dtype=dtype,
                           n_b_candidates=(nb,))
            if plan is None:
                print(f"xz K={gk} nb={nb}: no plan", flush=True)
                continue
            step = make_pallas_cpml_xz_stepk(
                shape, gk, plan, inv_dx=(1.0, 1.0, 1.0), dt=grid.dt,
                constants=ft.REDUCED, cpml=cpml, max_sources=1,
                dtype=dtype)
            state = extend_gb_pml_state(
                init_pml_kernel_state(shape, dtype, cpml=cpml),
                plan.n_b, cpml=cpml)

            def run(state, c, _s=step):
                def body(s, _):
                    return _s(s, coeffs, src), None
                return jax.lax.scan(body, state, None, length=c)[0]

            run_j = jax.jit(run, static_argnums=1)
            calls = max(48 // gk, 1)
            holder = [state]
            del state
            try:
                timeit(run_j, holder, calls, gk,
                       f"xz {jnp.dtype(dtype).name} K={gk} nb={plan.n_b} "
                       f"h={plan.h} c0={plan.c0} c1={plan.c1}")
            except Exception as e:
                print(f"xz K={gk} nb={nb}: {type(e).__name__} "
                      f"{str(e)[:200]}", flush=True)
            del holder
            jax.clear_caches()


def check_xz():
    # xz vs plain kernel ON CHIP (Mosaic, aliasing chain): small shape
    from fdtd_tpu.solver.pallas_cpml_xz import (
        make_pallas_cpml_xz_stepk, xz_plan,
    )

    gs, gk = (64, 128, 256), 4
    ck = Cpml.uniform(8)
    res_c = ft.Resolution.courant(1.0, ft.REDUCED, safety=0.99)
    grid_g = ft.Grid(shape=gs, resolution=res_c, constants=ft.REDUCED)
    src_g = ft.SourceSet.build(
        [ft.PointSource((32, 64, 128),
                        ft.GaussianPulse(20 * grid_g.dt, 6 * grid_g.dt),
                        j=(0.0, 0.0, 1.0))])
    plan = xz_plan(gs, _BC(), ck, gk, n_b_candidates=(2,))
    assert plan is not None, "no xz plan at small shape"
    xstep = make_pallas_cpml_xz_stepk(
        gs, gk, plan, inv_dx=(1.0, 1.0, 1.0), dt=grid_g.dt,
        constants=ft.REDUCED, cpml=ck, max_sources=1)
    kstep = make_pallas_cpml_stepk(
        gs, gk, inv_dx=(1.0, 1.0, 1.0), dt=grid_g.dt,
        constants=ft.REDUCED, cpml=ck, max_sources=1)
    xst = extend_gb_pml_state(
        init_pml_kernel_state(gs, jnp.float32, cpml=ck), plan.n_b,
        cpml=ck)
    kst = init_pml_kernel_state(gs, jnp.float32, cpml=ck)
    for _ in range(15):
        xst = xstep(xst, coeffs, src_g)
        kst = kstep(kst, coeffs, src_g)
    xcol = collapse_gb_pml_state(xst, plan.n_b, cpml=ck)
    mag = max(float(jnp.max(jnp.abs(getattr(kst, f))))
              for f in ("ex", "ey", "ez", "hx", "hy", "hz"))
    err = max(
        float(jnp.max(jnp.abs(getattr(xcol, f) - getattr(kst, f))))
        for f in ("ex", "ey", "ez", "hx", "hy", "hz"))
    perr = max(
        (float(jnp.max(jnp.abs(a - b))) for a, b in zip(xcol.psi, kst.psi)),
        default=0.0)
    print(f"check xz K={gk} {plan}: field err {err:.3e} "
          f"(mag {mag:.3e}) psi err {perr:.3e}", flush=True)
    assert err < 2e-6 * max(mag, 1e-30), (err, mag)


def check():
    # small-shape numerics: gated kernel vs XLA engine, 60 ticks
    from fdtd_tpu.solver.engine import build_step, init_engine_state
    cs, ck = (128, 128, 256), Cpml.uniform(8)
    res_c = ft.Resolution.courant(1.0, ft.REDUCED, safety=0.99)
    grid_c = ft.Grid(shape=cs, resolution=res_c, constants=ft.REDUCED)
    src_c = ft.SourceSet.build(
        [ft.PointSource((64, 64, 128),
                        ft.GaussianPulse(20 * grid_c.dt, 6 * grid_c.dt),
                        j=(0.0, 0.0, 1.0))])
    estep = build_step(cs, inv_dx=(1.0, 1.0, 1.0), dt=grid_c.dt,
                       constants=ft.REDUCED, cpml=ck)
    est = init_engine_state(cs, cpml=ck)
    from fdtd_tpu.solver.pallas_cpml import pallas_cpml_step_fn
    for k in (3,):
        if k == 1:
            kstep = pallas_cpml_step_fn(
                cs, inv_dx=(1.0, 1.0, 1.0), dt=grid_c.dt,
                constants=ft.REDUCED, cpml=ck, max_sources=1)
        else:
            kstep = make_pallas_cpml_stepk(
                cs, k, inv_dx=(1.0, 1.0, 1.0), dt=grid_c.dt,
                constants=ft.REDUCED, cpml=ck, max_sources=1)
        kst = init_pml_kernel_state(cs, jnp.float32, cpml=ck)
        e = est
        for _ in range(60 // k):
            for _ in range(k):
                e = estep(e, coeffs, src_c)
            kst = kstep(kst, coeffs, src_c)
        err = max(
            float(jnp.max(jnp.abs(getattr(kst, f) - getattr(e, f))))
            for f in ("ex", "ey", "ez", "hx", "hy", "hz"))
        mag = float(jnp.max(jnp.abs(e.ez)))
        print(f"check K={k}: max abs err {err:.3e} (field mag {mag:.3e})",
              flush=True)
        assert err < 1e-5 * max(mag, 1e-30), (k, err, mag)
    # gb small-shape numerics vs plain kernel
    gs = (64, 128, 256)
    grid_g = ft.Grid(shape=gs, resolution=res_c, constants=ft.REDUCED)
    src_g = ft.SourceSet.build(
        [ft.PointSource((32, 64, 128),
                        ft.GaussianPulse(20 * grid_g.dt, 6 * grid_g.dt),
                        j=(0.0, 0.0, 1.0))])
    plan = gb_plan(gs, _BC(), ck, 4, n_b_candidates=(2,))
    assert plan is not None, "no gb plan at small shape"
    n_b, h = plan
    gstep = make_pallas_cpml_gb_stepk(
        gs, 4, n_b, h, inv_dx=(1.0, 1.0, 1.0), dt=grid_g.dt,
        constants=ft.REDUCED, cpml=ck, max_sources=1)
    kstep = make_pallas_cpml_stepk(
        gs, 4, inv_dx=(1.0, 1.0, 1.0), dt=grid_g.dt,
        constants=ft.REDUCED, cpml=ck, max_sources=1)
    gst = extend_gb_pml_state(
        init_pml_kernel_state(gs, jnp.float32, cpml=ck), n_b, cpml=ck)
    kst = init_pml_kernel_state(gs, jnp.float32, cpml=ck)
    for _ in range(15):
        gst = gstep(gst, coeffs, src_g)
        kst = kstep(kst, coeffs, src_g)
    gcol = collapse_gb_pml_state(gst, n_b, cpml=ck)
    err = max(
        float(jnp.max(jnp.abs(getattr(gcol, f) - getattr(kst, f))))
        for f in ("ex", "ey", "ez", "hx", "hy", "hz"))
    print(f"check gb K=4 nb={n_b}: max abs err vs plain {err:.3e}",
          flush=True)
    assert err == 0.0, err


if __name__ == "__main__":
    tiers = sys.argv[1:] or ["check", "plain", "gb"]
    for t in tiers:
        if t == "check":
            check()
        elif t == "plain":
            tier_plain(3)
        elif t == "plain-bf16":
            tier_plain(4, jnp.bfloat16)
        elif t == "gb":
            tier_gb()
        elif t == "gb-bf16":
            tier_gb(dtype=jnp.bfloat16)
        elif t.startswith("gb-") and t.count("-") == 2:
            _, kk, nb = t.split("-")
            tier_gb(int(kk), nbs=(int(nb),))
        elif t.startswith("gbbf16-"):
            _, kk, nb = t.split("-")
            tier_gb(int(kk), nbs=(int(nb),), dtype=jnp.bfloat16)
        elif t == "check-xz":
            check_xz()
        elif t == "xz":
            tier_xz()
        elif t == "xz-bf16":
            tier_xz(dtype=jnp.bfloat16)
        elif t.startswith("xz-") and t.count("-") == 2:
            _, kk, nb = t.split("-")
            tier_xz(int(kk), nbs=(int(nb),))
        elif t.startswith("xzbf16-"):
            _, kk, nb = t.split("-")
            tier_xz(int(kk), nbs=(int(nb),), dtype=jnp.bfloat16)
        else:
            print(f"unknown tier {t}")
