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


def test_bf16_storage_mode_accuracy(rng):
    """bf16 storage (f32 compute) must track the f32 path to bf16 rounding
    levels over a short pulse run."""
    shape = (8, 16, 128)
    dt = 0.2
    coeffs = CellCoefficients.uniform((1.0, dt, 1.0, dt), jnp.float32)
    srcs = SourceSet.build(
        [PointSource((4, 8, 64), GaussianPulse(3 * dt, dt), j=(0, 0, 1.0))]
    )
    f32_step = pallas_step_fn(shape, inv_dx=(1.0, 1.0, 1.0), dt=dt, interpret=True)
    b16_step = pallas_step_fn(
        shape, inv_dx=(1.0, 1.0, 1.0), dt=dt, interpret=True, dtype=jnp.bfloat16
    )
    import fdtd_tpu as ft

    s32 = ft.zero_state(shape, jnp.float32)
    s16 = ft.zero_state(shape, jnp.bfloat16)
    for _ in range(20):
        s32 = f32_step(s32, coeffs, srcs)
        s16 = b16_step(s16, coeffs, srcs)
    a = s32.e_stacked()
    b = s16.e_stacked().astype(np.float32)
    rel = np.abs(a - b).max() / np.abs(a).max()
    assert rel < 0.03, f"bf16 deviation {rel:.4f}"
