"""CPML absorption tests — the physics the reference never wired up
(psi allocated but unused, cem-solver/src/fdtd/cpu/mod.rs:424-425)."""

import jax
import jax.numpy as jnp
import numpy as np

import fdtd_tpu as ft
from fdtd_tpu.solver.cpml import Cpml
from fdtd_tpu.solver.pml import GradedPmlSpec, graded_profiles, pml_bc


def test_pml_coefficient_formulas_match_reference():
    """b and c must follow CE eq. 7.102/7.99 exactly (pml.rs:33-57)."""
    consts = ft.SI
    dt = 1e-12
    sigma = np.array([50.0])
    kappa = np.array([3.0])
    a = np.array([0.05])
    b, c = pml_bc(sigma, kappa, a, dt, consts)
    eps0 = consts.vacuum_permittivity
    b_ref = np.exp(-((sigma / (eps0 * kappa) + a / eps0) * dt))
    c_ref = sigma * (b_ref - 1.0) / (sigma * kappa + kappa**2 * a)
    np.testing.assert_allclose(b, b_ref, rtol=1e-15)
    np.testing.assert_allclose(c, c_ref, rtol=1e-15)


def test_graded_profiles_match_reference():
    """sigma = s_max*d^m, kappa = 1+(k_max-1)*d^m, a = a_max*(1-d)^m_a
    (pml.rs:60-86)."""
    spec = GradedPmlSpec(m=4.0, m_a=2.0, sigma_max=7.0, kappa_max=5.0, a_max=0.3)
    d = np.linspace(0, 1, 11)
    sigma, kappa, a = graded_profiles(d, spec, dx=1.0, constants=ft.REDUCED)
    np.testing.assert_allclose(sigma, 7.0 * d**4)
    np.testing.assert_allclose(kappa, 1.0 + 4.0 * d**4)
    np.testing.assert_allclose(a, 0.3 * (1.0 - d) ** 2)


def _reflection(thick: int, n: int = 600):
    """Launch a resolved sheet pulse toward the x walls; return the amplitude
    reflection coefficient measured at a probe (the plane-wave reflection
    test from SURVEY.md stage 4)."""
    shape = (200, 8, 8)
    res = ft.Resolution.courant(1.0, ft.REDUCED, safety=0.9)
    grid = ft.Grid(shape=shape, resolution=res, constants=ft.REDUCED)
    table = ft.coefficient_table([ft.VACUUM], res, ft.REDUCED)
    coeffs = ft.CellCoefficients.uniform(table[0], jnp.float32)
    # zero-DC waveform, duration 10*dt: a plain Gaussian current leaves a
    # static charge field; an under-resolved pulse (a few dt) carries
    # near-Nyquist components that any PML absorbs poorly
    srcs = [
        ft.PointSource(
            (100, y, z),
            ft.GaussianDerivative(time=30 * grid.dt, duration=10 * grid.dt),
            j=(0.0, 1.0, 0.0),
        )
        for y in range(8)
        for z in range(8)
    ]
    cpml = Cpml(thickness=((thick, thick), (0, 0), (0, 0)))
    sim = ft.Simulation(
        grid=grid, coeffs=coeffs, sources=ft.SourceSet.build(srcs), cpml=cpml
    )
    state = sim.init()
    from fdtd_tpu.probes import PointProbe

    state, (trace,), _ = sim.run(state, n, probes=(PointProbe(points=((30, 4, 4),)),))
    ey = np.asarray(trace)[:, 0, 1]
    # incident peak arrives within the first ~250 ticks; later maxima are
    # reflections (which dominate in the no-PML case)
    k_inc = int(np.argmax(np.abs(ey[:250])))
    incident = np.abs(ey[k_inc])
    reflected = np.abs(ey[k_inc + 120 :]).max()
    return reflected / incident


def test_cpml_reflection_coefficient():
    r = _reflection(thick=10)
    assert r < 2e-4, f"10-cell CPML amplitude reflection {r:.2e} too high"


def test_no_pml_reflects():
    r = _reflection(thick=0)
    assert r > 0.5, f"Neumann wall should reflect, got R={r:.2e}"


def test_cpml_zero_thickness_matches_plain_step(rng):
    """A Cpml with all-zero slabs must reproduce the plain step exactly."""
    shape = (12, 8, 8)
    dt = 0.2
    cpml = Cpml(thickness=((0, 0), (0, 0), (0, 0)))
    step_c = cpml.step_fn(shape, inv_dx=(1.0, 1.0, 1.0), dt=dt, dtype=jnp.float64,
                          constants=ft.REDUCED)
    step_p = ft.step_fn(inv_dx=(1.0, 1.0, 1.0), dt=dt)

    e = rng.standard_normal((3, *shape))
    h = rng.standard_normal((3, *shape))
    coeffs = ft.CellCoefficients.uniform((1.0, dt, 1.0, dt), jnp.float64)

    sc = cpml.init_state(shape, jnp.float64)
    sc = sc._replace(
        ex=jnp.asarray(e[0]), ey=jnp.asarray(e[1]), ez=jnp.asarray(e[2]),
        hx=jnp.asarray(h[0]), hy=jnp.asarray(h[1]), hz=jnp.asarray(h[2]),
    )
    sp = ft.state_from_stacked(e, h, dtype=jnp.float64)
    for _ in range(3):
        sc = step_c(sc, coeffs, None)
        sp = step_p(sp, coeffs, None)
    np.testing.assert_allclose(np.stack([np.asarray(c) for c in sc.e]),
                               sp.e_stacked(), rtol=1e-12, atol=1e-12)
