"""Fused Pallas kernel vs the pure-XLA reference step (interpret mode on CPU).

The kernel must reproduce step.py's results on identical f32 inputs —
discrepancies mean a broken stencil/halo/carry, not rounding (tolerances
here allow only reassociation-level noise).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fdtd_tpu import (
    CellCoefficients,
    GaussianPulse,
    PointSource,
    SourceSet,
    state_from_stacked,
    step_fn,
)
from fdtd_tpu.solver.pallas_step import pallas_step_fn, supports

SHAPE = (6, 16, 128)
INV_DX = (1.0, 1.0 / 0.7, 1.0 / 1.3)
DT = 0.2


def make_state(rng):
    e = rng.standard_normal((3, *SHAPE))
    h = rng.standard_normal((3, *SHAPE))
    return state_from_stacked(e, h, dtype=jnp.float32)


def test_supports():
    from fdtd_tpu import BoundaryConditions, Dirichlet, Neumann

    assert supports((8, 16, 128), BoundaryConditions())
    assert not supports((8, 16, 100), BoundaryConditions())  # nz % 128
    assert not supports((8, 15, 128), BoundaryConditions())  # ny % 8
    assert not supports((8, 16, 128), BoundaryConditions(x=Dirichlet()))
    assert not supports(
        (8, 16, 128), BoundaryConditions(y=Neumann(alpha=(1.0, 0, 0)))
    )


def test_uniform_matches_xla(rng):
    state = make_state(rng)
    coeffs = CellCoefficients.uniform((0.97, 0.21, 0.99, 0.18), jnp.float32)

    ref_step = step_fn(inv_dx=INV_DX, dt=DT)
    pal_step = pallas_step_fn(SHAPE, inv_dx=INV_DX, dt=DT, interpret=True)

    ref, pal = state, state
    for _ in range(4):
        ref = ref_step(ref, coeffs, None)
        pal = pal_step(pal, coeffs, None)

    np.testing.assert_allclose(pal.e_stacked(), ref.e_stacked(), rtol=2e-6, atol=2e-6)
    np.testing.assert_allclose(pal.h_stacked(), ref.h_stacked(), rtol=2e-6, atol=2e-6)
    assert int(pal.tick) == 4


def test_uniform_with_j_sources(rng):
    state = make_state(rng)
    coeffs = CellCoefficients.uniform((1.0, DT, 1.0, DT), jnp.float32)
    srcs = SourceSet.build(
        [
            PointSource((2, 3, 4), GaussianPulse(2 * DT, DT), j=(0, 0, 2.0)),
            PointSource((5, 10, 100), GaussianPulse(DT, DT), j=(1.0, 0.5, 0)),
        ]
    )

    ref_step = step_fn(inv_dx=INV_DX, dt=DT)
    pal_step = pallas_step_fn(SHAPE, inv_dx=INV_DX, dt=DT, interpret=True)

    ref, pal = state, state
    for _ in range(5):
        ref = ref_step(ref, coeffs, srcs)
        pal = pal_step(pal, coeffs, srcs)

    np.testing.assert_allclose(pal.e_stacked(), ref.e_stacked(), rtol=2e-6, atol=2e-6)
    np.testing.assert_allclose(pal.h_stacked(), ref.h_stacked(), rtol=2e-6, atol=2e-6)


def test_matid_matches_xla(rng):
    state = make_state(rng)
    table = jnp.asarray(
        [[1.0, DT, 1.0, DT], [0.9, 0.1, 0.95, 0.12], [0.5, 0.4, 0.7, 0.3]],
        jnp.float32,
    )
    matid = jnp.asarray(rng.integers(0, 3, SHAPE), jnp.uint8)
    coeffs = CellCoefficients.from_table(table, matid)

    ref_step = step_fn(inv_dx=INV_DX, dt=DT)
    pal_step = pallas_step_fn(
        SHAPE, inv_dx=INV_DX, dt=DT, matid=matid, n_materials=3, interpret=True
    )

    ref, pal = state, state
    for _ in range(3):
        ref = ref_step(ref, coeffs, None)
        pal = pal_step(pal, table, None)

    np.testing.assert_allclose(pal.e_stacked(), ref.e_stacked(), rtol=2e-6, atol=2e-6)
    np.testing.assert_allclose(pal.h_stacked(), ref.h_stacked(), rtol=2e-6, atol=2e-6)
