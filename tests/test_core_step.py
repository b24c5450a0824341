"""Solver-vs-oracle fidelity tests (the test layer the reference lacks,
SURVEY.md §4): the JAX step must match the NumPy f64 oracle element-for-element.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from fdtd_tpu import (
    CellCoefficients,
    state_from_stacked,
    BoundaryConditions,
    Dirichlet,
    GaussianPulse,
    ContinuousWave,
    Neumann,
    PointSource,
    SourceSet,
    SimState,
    step_fn,
)
from fdtd_tpu.oracle import OracleSim

SHAPE = (9, 8, 7)
SPATIAL = (0.5, 0.7, 1.1)
DT = 0.2


def random_state(rng, shape=SHAPE, dtype=jnp.float64):
    e = rng.standard_normal((3, *shape))
    h = rng.standard_normal((3, *shape))
    state = state_from_stacked(e, h, dtype=dtype)
    return state, e, h


def run_both(state, oracle, coeffs, sources, n, bc=BoundaryConditions()):
    inv_dx = tuple(1.0 / s for s in SPATIAL)
    f = step_fn(inv_dx=inv_dx, dt=DT, bc=bc)
    for _ in range(n):
        state = f(state, coeffs, sources)
    oracle.step(n)
    return state, oracle


def test_free_space_matches_oracle_exactly(rng):
    state, e0, h0 = random_state(rng)
    oracle = OracleSim(SHAPE, SPATIAL, DT)
    oracle.e[:], oracle.h[:] = e0, h0

    state, oracle = run_both(state, oracle, CellCoefficients.uniform((1, 1, 1, 1), jnp.float64), None, 7)

    np.testing.assert_allclose(state.h_stacked(), oracle.h, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(state.e_stacked(), oracle.e, rtol=1e-12, atol=1e-12)
    assert int(state.tick) == 7


def test_lossy_uniform_material(rng):
    state, e0, h0 = random_state(rng)
    row = (0.93, 0.11, 0.98, 0.07)
    oracle = OracleSim(SHAPE, SPATIAL, DT, *row)
    oracle.e[:], oracle.h[:] = e0, h0

    state, oracle = run_both(state, oracle, CellCoefficients.uniform(row, jnp.float64), None, 5)

    np.testing.assert_allclose(state.e_stacked(), oracle.e, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(state.h_stacked(), oracle.h, rtol=1e-12, atol=1e-12)


def test_dense_multi_material_coefficients(rng):
    state, e0, h0 = random_state(rng)
    ca = rng.uniform(0.9, 1.0, SHAPE)
    cb = rng.uniform(0.05, 0.2, SHAPE)
    da = rng.uniform(0.9, 1.0, SHAPE)
    db = rng.uniform(0.05, 0.2, SHAPE)
    oracle = OracleSim(SHAPE, SPATIAL, DT, ca, cb, da, db)
    oracle.e[:], oracle.h[:] = e0, h0

    coeffs = CellCoefficients(
        jnp.asarray(ca), jnp.asarray(cb), jnp.asarray(da), jnp.asarray(db)
    )
    state, oracle = run_both(state, oracle, coeffs, None, 4)

    np.testing.assert_allclose(state.e_stacked(), oracle.e, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(state.h_stacked(), oracle.h, rtol=1e-12, atol=1e-12)


def test_compressed_material_table_gather(rng):
    """Gathering from a (K,4) table by per-cell index equals dense coefficients."""
    state, e0, h0 = random_state(rng)
    table = np.array(
        [[1.0, 1.0, 1.0, 1.0], [0.9, 0.1, 0.95, 0.12], [0.5, 0.4, 0.7, 0.3]]
    )
    matid = rng.integers(0, 3, SHAPE).astype(np.uint8)
    dense = table[matid]  # (nx, ny, nz, 4)
    oracle = OracleSim(
        SHAPE, SPATIAL, DT, dense[..., 0], dense[..., 1], dense[..., 2], dense[..., 3]
    )
    oracle.e[:], oracle.h[:] = e0, h0

    coeffs = CellCoefficients.from_table(jnp.asarray(table), jnp.asarray(matid))
    state, oracle = run_both(state, oracle, coeffs, None, 4)

    np.testing.assert_allclose(state.e_stacked(), oracle.e, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(state.h_stacked(), oracle.h, rtol=1e-12, atol=1e-12)


def test_point_sources_match_oracle(rng):
    state, e0, h0 = random_state(rng)
    oracle = OracleSim(SHAPE, SPATIAL, DT)
    oracle.e[:], oracle.h[:] = e0, h0

    srcs = [
        PointSource((2, 3, 4), GaussianPulse(time=1.0, duration=0.5), j=(0, 0, 50.0)),
        PointSource((5, 1, 2), ContinuousWave(frequency=0.8, phase=0.3), j=(1.0, 2.0, 0.0), m=(0.0, 0.5, 0.0)),
    ]
    oracle.add_point_source((2, 3, 4), OracleSim.gaussian(1.0, 0.5), j=(0, 0, 50.0))
    oracle.add_point_source((5, 1, 2), OracleSim.cw(0.8, 0.3), j=(1, 2, 0), m=(0, 0.5, 0))

    sset = SourceSet.build(srcs, dtype=jnp.float64)
    state, oracle = run_both(
        state, oracle, CellCoefficients.uniform((1, 1, 1, 1), jnp.float64), sset, 6
    )

    np.testing.assert_allclose(state.e_stacked(), oracle.e, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(state.h_stacked(), oracle.h, rtol=1e-12, atol=1e-12)


def test_duplicate_source_cell_last_wins():
    """set_forcing overwrite semantics (cpu/mod.rs:404-408)."""
    srcs = [
        PointSource((1, 1, 1), GaussianPulse(0.0, 1.0), j=(1, 0, 0)),
        PointSource((1, 1, 1), GaussianPulse(0.0, 1.0), j=(0, 2, 0)),
    ]
    sset = SourceSet.build(srcs, dtype=jnp.float64)
    assert sset.num_sources == 1
    np.testing.assert_array_equal(np.asarray(sset.j_amp), [[0.0, 2.0, 0.0]])


@pytest.mark.parametrize(
    "bc",
    [
        BoundaryConditions(
            x=Neumann(alpha=(0.1, -0.2, 0.3), beta=(0.5, 0.0, -0.1)),
            y=Dirichlet(alpha=(1.0, 0.0, 0.0), beta=(0.0, -1.0, 0.5)),
            z=Dirichlet(),
        ),
    ],
)
def test_boundary_conditions_match_oracle(rng, bc):
    state, e0, h0 = random_state(rng)
    boundaries = []
    for cond in (bc.x, bc.y, bc.z):
        kind = "neumann" if isinstance(cond, Neumann) else "dirichlet"
        boundaries.append((kind, np.asarray(cond.alpha), np.asarray(cond.beta)))
    oracle = OracleSim(SHAPE, SPATIAL, DT, boundaries=boundaries)
    oracle.e[:], oracle.h[:] = e0, h0

    state, oracle = run_both(
        state, oracle, CellCoefficients.uniform((1, 1, 1, 1), jnp.float64), None, 5, bc=bc
    )

    np.testing.assert_allclose(state.e_stacked(), oracle.e, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(state.h_stacked(), oracle.h, rtol=1e-12, atol=1e-12)


def test_f32_fidelity_1000_steps():
    """BASELINE.md gate: <= 1e-5 relative field error at step 1000 (f32 vs
    the f64 oracle), on a small dipole scene in reduced units."""
    shape = (24, 24, 24)
    dx = 1.0
    # Courant-stable dt in reduced units (c = 1): dx/(c*sqrt(3)) with margin
    dt = 0.5 / np.sqrt(3.0)
    inv_dx = (1.0 / dx,) * 3

    # vacuum in reduced units: c_a = d_a = 1, c_b = d_b = dt
    oracle = OracleSim(shape, (dx,) * 3, dt, 1.0, dt, 1.0, dt)
    oracle.add_point_source((12, 12, 12), OracleSim.gaussian(20 * dt, 6 * dt), j=(0, 0, 1.0))

    srcs = SourceSet.build(
        [PointSource((12, 12, 12), GaussianPulse(20 * dt, 6 * dt), j=(0, 0, 1.0))],
        dtype=jnp.float32,
    )
    from fdtd_tpu import zero_state
    state = zero_state(shape, jnp.float32)
    coeffs = CellCoefficients.uniform((1.0, dt, 1.0, dt), jnp.float32)

    import jax

    f = step_fn(inv_dx=inv_dx, dt=dt, bc=BoundaryConditions())

    def body(state, _):
        return f(state, coeffs, srcs), None

    state, _ = jax.lax.scan(body, state, None, length=1000)
    oracle.step(1000)

    e = state.e_stacked().astype(np.float64)
    rel = np.linalg.norm(e - oracle.e) / np.linalg.norm(oracle.e)
    assert rel <= 1e-5, f"relative E error {rel:.3e} exceeds 1e-5"
    h = state.h_stacked().astype(np.float64)
    rel_h = np.linalg.norm(h - oracle.h) / np.linalg.norm(oracle.h)
    assert rel_h <= 1e-5, f"relative H error {rel_h:.3e} exceeds 1e-5"


def test_two_sources_one_cell_last_wins(rng):
    """Co-located point sources: LAST WINS — SourceSet.build dedups per
    cell (matching the reference's set_forcing overwrite) and the oracle
    overwrites in order. This test pins the shared convention."""
    state, e0, h0 = random_state(rng)
    oracle = OracleSim(SHAPE, SPATIAL, DT)
    oracle.e[:], oracle.h[:] = e0, h0
    srcs = [
        PointSource((3, 4, 5), GaussianPulse(6 * DT, 2 * DT), j=(0, 0, 1.0)),
        PointSource((3, 4, 5), GaussianPulse(6 * DT, 2 * DT),
                    j=(0, 0, 0.5), m=(0.25, 0, 0)),
        PointSource((3, 4, 5), ContinuousWave(frequency=0.5),
                    m=(0.5, 0, 0)),
    ]
    oracle.add_point_source((3, 4, 5), OracleSim.gaussian(6 * DT, 2 * DT),
                            j=(0, 0, 1.0))
    oracle.add_point_source((3, 4, 5), OracleSim.gaussian(6 * DT, 2 * DT),
                            j=(0, 0, 0.5), m=(0.25, 0, 0))
    oracle.add_point_source((3, 4, 5), OracleSim.cw(0.5, 0.0),
                            m=(0.5, 0, 0))
    sset = SourceSet.build(srcs, dtype=jnp.float64)
    state, oracle = run_both(
        state, oracle, CellCoefficients.uniform((1, 1, 1, 1), jnp.float64),
        sset, 9,
    )
    np.testing.assert_allclose(state.e_stacked(), oracle.e, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(state.h_stacked(), oracle.h, rtol=1e-12, atol=1e-12)
