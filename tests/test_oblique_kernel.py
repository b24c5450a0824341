"""Oblique-incidence TF/SF on the CPML kernel tier.

The analytic-incident-field commutator (solver/tfsf_oblique.py) used to
run only through the XLA engine (engine.py:311-319/363-370). Both Pallas
CPML kernels now host it: the correction volumes are precomputed per
pass on the commutator subgrid and added in-kernel behind a scalar
jnp.where x gate on the sub-plane patch (pallas_cpml.py /
pallas_cpml_k.py ``oblique=`` — NOT lax.cond: Mosaic predicates vector
conds, see the CLAUDE.md invariant).

These tests gate the kernel paths against the engine bit-for-bit-ish
(same f32 algorithm, different op order -> tolerance at the f32
rounding level, NOT the physics leakage level — leakage physics is
covered by tests/test_tfsf_oblique.py).

Reference: the reference has no TF/SF at all (source.rs:99-110 is point
sources only); this is beyond-reference capability on the kernel tier.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import fdtd_tpu as ft
from fdtd_tpu.solver.cpml import Cpml
from fdtd_tpu.solver.engine import build_step, init_engine_state
from fdtd_tpu.solver.pallas_cpml import (
    init_pml_kernel_state,
    pallas_cpml_step_fn,
)
from fdtd_tpu.solver.pallas_cpml_k import pallas_cpml_stepk_fn
from fdtd_tpu.solver.tfsf_oblique import ObliqueTfsf

SHAPE = (40, 40, 256)
CPML = Cpml(thickness=((6, 6), (6, 6), (6, 6)))


def _setup():
    res = ft.Resolution.courant(1.0, ft.REDUCED, safety=0.9)
    dt = res.temporal
    coeffs = ft.CellCoefficients.uniform(
        ft.coefficient_table([ft.VACUUM], res, ft.REDUCED)[0], jnp.float32
    )
    tfsf = ObliqueTfsf(
        box=((12, 26), (12, 26), (100, 150)),
        direction=(1.0, 0.7, -0.4),
        polarization=(0.0, 0.2, 1.0),
        waveform=ft.GaussianPulse(10 * dt, 4 * dt),
    )
    return dt, coeffs, tfsf


def _max_rel(a, b):
    scale = max(float(jnp.max(jnp.abs(b))), 1e-30)
    return float(jnp.max(jnp.abs(a - b))) / scale


def test_oblique_single_pass_kernel_matches_engine():
    dt, coeffs, tfsf = _setup()
    estep = build_step(SHAPE, inv_dx=(1.0, 1.0, 1.0), dt=dt,
                       constants=ft.REDUCED, cpml=CPML, tfsf=tfsf)
    est = init_engine_state(SHAPE, cpml=CPML, tfsf=tfsf)
    kstep = pallas_cpml_step_fn(
        SHAPE, inv_dx=(1.0, 1.0, 1.0), dt=dt, constants=ft.REDUCED,
        cpml=CPML, oblique=tfsf, interpret=True)
    kst = init_pml_kernel_state(SHAPE, cpml=CPML)
    for _ in range(25):
        est = estep(est, coeffs, None)
        kst = kstep(kst, coeffs, None)
    # the pulse must actually be in the box (non-trivial comparison)
    assert float(jnp.max(jnp.abs(est.e[2]))) > 1e-3
    for c in range(3):
        assert _max_rel(kst.e[c], est.e[c]) < 2e-5, c
        assert _max_rel(kst.h[c], est.h[c]) < 2e-5, c


@pytest.mark.parametrize("k", [2, 4])
def test_oblique_kstep_kernel_matches_engine(k):
    dt, coeffs, tfsf = _setup()
    estep = build_step(SHAPE, inv_dx=(1.0, 1.0, 1.0), dt=dt,
                       constants=ft.REDUCED, cpml=CPML, tfsf=tfsf)
    est = init_engine_state(SHAPE, cpml=CPML, tfsf=tfsf)
    src = ft.SourceSet.build([ft.PointSource(
        (20, 20, 40), ft.GaussianPulse(8 * dt, 3 * dt), j=(0.0, 0.0, 1.0))])
    kstep = pallas_cpml_stepk_fn(
        SHAPE, k, inv_dx=(1.0, 1.0, 1.0), dt=dt, constants=ft.REDUCED,
        cpml=CPML, oblique=tfsf, max_sources=1, interpret=True)
    kst = init_pml_kernel_state(SHAPE, cpml=CPML)
    for _ in range(24 // k):
        for _ in range(k):
            est = estep(est, coeffs, src)
        kst = kstep(kst, coeffs, src)
    assert float(jnp.max(jnp.abs(est.e[2]))) > 1e-3
    for c in range(3):
        assert _max_rel(kst.e[c], est.e[c]) < 2e-5, c
        assert _max_rel(kst.h[c], est.h[c]) < 2e-5, c


def test_oblique_kstep_matches_single_pass():
    """The two kernel hosts agree at matching ticks to f32
    accumulation tolerance (the K-step carry structure orders the
    same FMAs differently than the single-pass kernel)."""
    dt, coeffs, tfsf = _setup()
    sstep = pallas_cpml_step_fn(
        SHAPE, inv_dx=(1.0, 1.0, 1.0), dt=dt, constants=ft.REDUCED,
        cpml=CPML, oblique=tfsf, interpret=True)
    kstep = pallas_cpml_stepk_fn(
        SHAPE, 3, inv_dx=(1.0, 1.0, 1.0), dt=dt, constants=ft.REDUCED,
        cpml=CPML, oblique=tfsf, max_sources=0, interpret=True)
    sst = init_pml_kernel_state(SHAPE, cpml=CPML)
    kst = init_pml_kernel_state(SHAPE, cpml=CPML)
    for _ in range(4):
        for _ in range(3):
            sst = sstep(sst, coeffs, None)
        kst = kstep(kst, coeffs, None)
    for name in ("ex", "ey", "ez", "hx", "hy", "hz"):
        a = np.asarray(getattr(kst, name))
        b = np.asarray(getattr(sst, name))
        assert _max_rel(a, b) < 2e-5, name
        assert np.abs(a).max() > 0, name


def test_simulation_dispatches_oblique_to_kernel(monkeypatch):
    """Simulation with an ObliqueTfsf must initialize a kernel state and
    step it through the Pallas path when eligible (interpret-mode CPU
    stand-in via the eligibility override)."""
    from fdtd_tpu.solver.simulation import Simulation

    dt, coeffs, tfsf = _setup()
    res = ft.Resolution.courant(1.0, ft.REDUCED, safety=0.9)
    grid = ft.Grid(shape=SHAPE, resolution=res, constants=ft.REDUCED)
    sim = Simulation(grid=grid, coeffs=coeffs, cpml=CPML, tfsf=tfsf)
    # on CPU the TPU eligibility gate is off -> engine; the ELIGIBILITY
    # decision logic itself is what we pin here
    assert not sim._cpml_kernel_eligible()
    monkeypatch.setattr(
        "jax.default_backend", lambda: "tpu", raising=True)
    assert sim._cpml_kernel_eligible()
    st = sim.init()
    from fdtd_tpu.solver.pallas_cpml import PmlKernelState

    assert isinstance(st, PmlKernelState)
    # oblique has no 1-D aux grid: placeholder scalar, not an aux row
    assert jnp.ndim(st.aux_e) == 0


def test_oblique_kstep_with_matid_matches_engine():
    """Oblique + compressed materials compose in-kernel: d_b/c_b become
    per-plane tables and the correction multiplies their sub-window."""
    res = ft.Resolution.courant(1.0, ft.REDUCED, safety=0.9)
    dt = res.temporal
    shape = (40, 32, 256)  # matid mode needs ny % 32 == 0
    tfsf = ObliqueTfsf(
        box=((12, 26), (10, 24), (100, 150)),
        direction=(1.0, 0.7, -0.4),
        polarization=(0.0, 0.2, 1.0),
        waveform=ft.GaussianPulse(10 * dt, 4 * dt),
    )
    tab = ft.MaterialTable()
    diel = tab.register(ft.Material(relative_permittivity=2.5))
    matid = np.zeros(shape, np.uint8)
    idx = np.indices(shape)
    r2 = ((idx[0] - 20) ** 2 + (idx[1] - 16) ** 2 + (idx[2] - 125) ** 2)
    matid[r2 < 6 ** 2] = diel
    ctable = ft.coefficient_table(tab.materials, res, ft.REDUCED)
    dense = ft.CellCoefficients.from_table(
        jnp.asarray(ctable, jnp.float32), jnp.asarray(matid))
    estep = build_step(shape, inv_dx=(1.0, 1.0, 1.0), dt=dt,
                       constants=ft.REDUCED, cpml=CPML, tfsf=tfsf)
    est = init_engine_state(shape, cpml=CPML, tfsf=tfsf)
    kstep = pallas_cpml_stepk_fn(
        shape, 3, inv_dx=(1.0, 1.0, 1.0), dt=dt, constants=ft.REDUCED,
        cpml=CPML, oblique=tfsf, matid=jnp.asarray(matid),
        n_materials=len(tab), interpret=True)
    kst = init_pml_kernel_state(shape, cpml=CPML)
    jtable = jnp.asarray(ctable, jnp.float32)
    for _ in range(24 // 3):
        for _ in range(3):
            est = estep(est, dense, None)
        kst = kstep(kst, jtable, None)
    assert float(jnp.max(jnp.abs(est.e[2]))) > 1e-3
    for c in range(3):
        assert _max_rel(kst.e[c], est.e[c]) < 2e-5, c
        assert _max_rel(kst.h[c], est.h[c]) < 2e-5, c


def test_sharded_dispatch_rejects_oblique_loudly():
    """Sharded ObliqueTfsf rides the 1-D-mesh kernel tier (round 5);
    a config the kernel can't fit (supports_sharded_cpml False at this
    shape/mesh) must still fail LOUDLY instead of dying on a missing
    .span deep in the engine build."""
    from fdtd_tpu.parallel.best import best_sharded_absorbing_step
    from fdtd_tpu.parallel.topology import make_mesh

    dt, _, tfsf = _setup()
    mesh = make_mesh(1, ("x",))
    with pytest.raises(NotImplementedError,
                       match="sharded|decomposition"):
        best_sharded_absorbing_step(
            mesh, SHAPE, inv_dx=(1.0, 1.0, 1.0), dt=dt,
            constants=ft.REDUCED, cpml=CPML, tfsf=tfsf)
