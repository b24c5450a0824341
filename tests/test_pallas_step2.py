"""Temporally-blocked 2-step kernel vs two single-step kernel invocations
(interpret mode)."""

import jax.numpy as jnp
import numpy as np
import pytest

import fdtd_tpu as ft
from fdtd_tpu.solver.pallas_step import pallas_step_fn
from fdtd_tpu.solver.pallas_stepk import pallas_stepk_fn as _stepk, supports_k


def pallas_step2_fn(shape, **kw):
    return _stepk(shape, 2, **kw)

SHAPE = (10, 16, 128)
INV_DX = (1.0, 1.0 / 0.7, 1.0 / 1.3)
DT = 0.2


def _state(rng, dtype=jnp.float32):
    e = rng.standard_normal((3, *SHAPE))
    h = rng.standard_normal((3, *SHAPE))
    return ft.state_from_stacked(e, h, dtype=dtype)


@pytest.mark.parametrize("with_sources", [False, True])
def test_two_steps_match_single_kernel_twice(rng, with_sources):
    state = _state(rng)
    coeffs = ft.CellCoefficients.uniform((0.97, 0.21, 0.99, 0.18), jnp.float32)
    srcs = None
    if with_sources:
        srcs = ft.SourceSet.build(
            [
                ft.PointSource((3, 5, 7), ft.GaussianPulse(2 * DT, DT), j=(0.5, 0, 2.0)),
                ft.PointSource((0, 0, 0), ft.GaussianPulse(DT, DT), j=(1.0, 0.5, 0)),
                ft.PointSource((9, 15, 127), ft.ContinuousWave(0.3), j=(0, 1.0, 0)),
            ]
        )

    step1 = pallas_step_fn(SHAPE, inv_dx=INV_DX, dt=DT, interpret=True)
    step2 = pallas_step2_fn(SHAPE, inv_dx=INV_DX, dt=DT, interpret=True)

    ref = state
    for _ in range(4):
        ref = step1(ref, coeffs, srcs)
    out = state
    for _ in range(2):
        out = step2(out, coeffs, srcs)

    np.testing.assert_allclose(out.e_stacked(), ref.e_stacked(), rtol=3e-6, atol=3e-6)
    np.testing.assert_allclose(out.h_stacked(), ref.h_stacked(), rtol=3e-6, atol=3e-6)
    assert int(out.tick) == int(ref.tick) == 4


def test_supports_k():
    assert supports_k((8, 16, 128), ft.BoundaryConditions(), 2)
    assert not supports_k((2, 16, 128), ft.BoundaryConditions(), 2)
    assert not supports_k((32, 16, 128), ft.BoundaryConditions(), 17)
    assert not supports_k((8, 16, 128), ft.BoundaryConditions(), 10)  # nx < 2k


@pytest.mark.parametrize("k", [2, 3, 4])
def test_k_step_kernel_matches_single(rng, k):
    from fdtd_tpu.solver.pallas_stepk import pallas_stepk_fn

    state = _state(rng)
    coeffs = ft.CellCoefficients.uniform((0.97, 0.21, 0.99, 0.18), jnp.float32)
    srcs = ft.SourceSet.build(
        [
            ft.PointSource((3, 5, 7), ft.GaussianPulse(2 * DT, DT), j=(0.5, 0, 2.0)),
            ft.PointSource((9, 15, 127), ft.ContinuousWave(0.3), j=(0, 1.0, 0)),
        ]
    )
    step1 = pallas_step_fn(SHAPE, inv_dx=INV_DX, dt=DT, interpret=True)
    stepk = pallas_stepk_fn(SHAPE, k, inv_dx=INV_DX, dt=DT, interpret=True)

    ref = state
    for _ in range(2 * k):
        ref = step1(ref, coeffs, srcs)
    out = state
    for _ in range(2):
        out = stepk(out, coeffs, srcs)

    np.testing.assert_allclose(out.e_stacked(), ref.e_stacked(), rtol=5e-6, atol=5e-6)
    np.testing.assert_allclose(out.h_stacked(), ref.h_stacked(), rtol=5e-6, atol=5e-6)
    assert int(out.tick) == int(ref.tick)


def test_k_step_matid_matches_single(rng):
    """K-step temporal blocking with the compressed material-index buffer."""
    from fdtd_tpu.solver.pallas_step import pallas_step_fn as _p1
    from fdtd_tpu.solver.pallas_stepk import pallas_stepk_fn

    shape = (12, 32, 128)  # ny % 32 for uint8 planes
    table = jnp.asarray(
        [[1.0, DT, 1.0, DT], [0.9, 0.1, 0.95, 0.12], [0.5, 0.4, 0.7, 0.3]],
        jnp.float32,
    )
    matid = jnp.asarray(rng.integers(0, 3, shape), jnp.uint8)
    e = rng.standard_normal((3, *shape))
    h = rng.standard_normal((3, *shape))
    state = ft.state_from_stacked(e, h, dtype=jnp.float32)
    srcs = ft.SourceSet.build(
        [ft.PointSource((5, 10, 60), ft.GaussianPulse(2 * DT, DT), j=(0, 0, 1.0))]
    )

    step1 = _p1(shape, inv_dx=INV_DX, dt=DT, matid=matid, n_materials=3,
                interpret=True)
    step3 = pallas_stepk_fn(shape, 3, inv_dx=INV_DX, dt=DT, matid=matid,
                            n_materials=3, interpret=True)

    ref = state
    for _ in range(3):
        ref = step1(ref, table, srcs)
    out = step3(state, table, srcs)

    np.testing.assert_allclose(out.e_stacked(), ref.e_stacked(), rtol=5e-6, atol=5e-6)
    np.testing.assert_allclose(out.h_stacked(), ref.h_stacked(), rtol=5e-6, atol=5e-6)


def test_k_step_with_m_sources(rng):
    """M (magnetic-current) sources are injected in-kernel at every level."""
    from fdtd_tpu.solver.pallas_stepk import pallas_stepk_fn
    from fdtd_tpu.solver.step import step_fn

    state = _state(rng)
    coeffs = ft.CellCoefficients.uniform((0.97, 0.21, 0.99, 0.18), jnp.float32)
    srcs = ft.SourceSet.build(
        [
            ft.PointSource((3, 5, 7), ft.GaussianPulse(2 * DT, DT),
                           j=(0.5, 0, 2.0), m=(0.0, 1.5, 0.25)),
            ft.PointSource((9, 15, 127), ft.ContinuousWave(0.3),
                           m=(1.0, 0, 0)),
        ]
    )
    ref_step = step_fn(inv_dx=INV_DX, dt=DT)
    ref = state
    for _ in range(3):
        ref = ref_step(ref, coeffs, srcs)

    step3 = pallas_stepk_fn(SHAPE, 3, inv_dx=INV_DX, dt=DT, interpret=True,
                            with_m=True, max_sources=2)
    out = step3(state, coeffs, srcs)

    np.testing.assert_allclose(out.e_stacked(), ref.e_stacked(), rtol=5e-6, atol=5e-6)
    np.testing.assert_allclose(out.h_stacked(), ref.h_stacked(), rtol=5e-6, atol=5e-6)


def test_io_alias_folded_halo_matches_plain():
    """Aliased (in-place) builds fold the ey/ez halo into 2-plane Element
    windows; both the single-step and K-step variants must match their
    plain builds exactly (the 1024^3 bf16 path depends on this)."""
    import fdtd_tpu as ft
    from fdtd_tpu.solver.pallas_step import pallas_step_fn
    from fdtd_tpu.solver.pallas_stepk import pallas_stepk_fn

    shape = (16, 8, 128)
    dt = 0.25
    src = ft.SourceSet.build(
        [ft.PointSource((8, 4, 64), ft.GaussianPulse(6 * dt, 2 * dt),
                        j=(0.3, -0.1, 1.0))]
    )
    coeffs = ft.CellCoefficients.uniform((1.0, 0.25, 1.0, 0.25), jnp.float32)

    ref_s = pallas_step_fn(shape, inv_dx=(1., 1., 1.), dt=dt, interpret=True)
    al_s = pallas_step_fn(shape, inv_dx=(1., 1., 1.), dt=dt, interpret=True,
                          io_alias=True)
    ref, st = ft.zero_state(shape), ft.zero_state(shape)
    for _ in range(12):
        ref = ref_s(ref, coeffs, src)
        st = al_s(st, coeffs, src)
    assert float(jnp.abs(ref.ez).max()) > 0
    for f in ("ex", "ey", "ez", "hx", "hy", "hz"):
        np.testing.assert_array_equal(
            np.asarray(getattr(st, f)), np.asarray(getattr(ref, f)), err_msg=f
        )

    refk = pallas_stepk_fn(shape, 4, inv_dx=(1., 1., 1.), dt=dt,
                           interpret=True, max_sources=1)
    alk = pallas_stepk_fn(shape, 4, inv_dx=(1., 1., 1.), dt=dt,
                          interpret=True, max_sources=1, io_alias=True)
    ref, st = ft.zero_state(shape), ft.zero_state(shape)
    for _ in range(3):
        ref = refk(ref, coeffs, src)
        st = alk(st, coeffs, src)
    for f in ("ex", "ey", "ez", "hx", "hy", "hz"):
        np.testing.assert_array_equal(
            np.asarray(getattr(st, f)), np.asarray(getattr(ref, f)), err_msg=f
        )
