"""Sharded fused-kernel step vs the single-device fused kernel (interpret
mode on the 8-device virtual CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import fdtd_tpu as ft
from fdtd_tpu.parallel import make_mesh, shard_state
from fdtd_tpu.parallel.pallas_sharded import make_pallas_sharded_step
from fdtd_tpu.solver.pallas_step import pallas_step_fn

SHAPE = (16, 8, 128)
INV_DX = (1.0, 1.0 / 0.7, 1.0 / 1.3)
DT = 0.2


def _inputs(rng):
    e = rng.standard_normal((3, *SHAPE))
    h = rng.standard_normal((3, *SHAPE))
    state = ft.state_from_stacked(e, h, dtype=jnp.float32)
    coeffs = ft.CellCoefficients.uniform((0.97, 0.21, 0.99, 0.18), jnp.float32)
    srcs = ft.SourceSet.build(
        [
            ft.PointSource((3, 2, 5), ft.GaussianPulse(2 * DT, DT), j=(0, 0, 2.0)),
            ft.PointSource((14, 6, 100), ft.GaussianPulse(DT, DT), j=(1.0, 0.5, 0)),
        ]
    )
    return state, coeffs, srcs


@pytest.mark.parametrize("n_dev", [8, 4, 2, 1])
def test_pallas_sharded_matches_single(rng, n_dev):
    if len(jax.devices()) < n_dev:
        pytest.skip("not enough devices")
    state, coeffs, srcs = _inputs(rng)

    ref_step = pallas_step_fn(SHAPE, inv_dx=INV_DX, dt=DT, interpret=True)
    ref = state
    for _ in range(4):
        ref = ref_step(ref, coeffs, srcs)

    mesh = make_mesh(n_dev, ("x",))
    step = make_pallas_sharded_step(
        mesh, "x", inv_dx=INV_DX, dt=DT, interpret=True
    )
    st = shard_state(state, mesh, ("x", None, None))
    for _ in range(4):
        st = step(st, coeffs, srcs)

    np.testing.assert_allclose(st.e_stacked(), ref.e_stacked(), rtol=2e-6, atol=2e-6)
    np.testing.assert_allclose(st.h_stacked(), ref.h_stacked(), rtol=2e-6, atol=2e-6)
    assert int(st.tick) == int(ref.tick)


@pytest.mark.parametrize("n_dev,k", [(4, 2), (2, 3), (8, 2)])
def test_sharded_k_step_matches_single(rng, n_dev, k):
    """K-step temporal blocking under shard_map (extended-halo state) must
    match the single-device K-step kernel, sources near boundaries included."""
    if len(jax.devices()) < n_dev:
        pytest.skip("not enough devices")
    from fdtd_tpu.parallel.pallas_sharded_k import (
        collapse_state,
        extend_state,
        make_pallas_sharded_stepk,
    )
    from fdtd_tpu.solver.pallas_stepk import pallas_stepk_fn

    shape = (16, 8, 128)
    nl = shape[0] // n_dev
    e = rng.standard_normal((3, *shape))
    h = rng.standard_normal((3, *shape))
    state = ft.state_from_stacked(e, h, dtype=jnp.float32)
    coeffs = ft.CellCoefficients.uniform((0.97, 0.21, 0.99, 0.18), jnp.float32)
    # sources straddling shard boundaries (planes 3/4 for n_dev=4, nl=4)
    srcs = ft.SourceSet.build(
        [
            ft.PointSource((3, 5, 7), ft.GaussianPulse(2 * DT, DT), j=(0.5, 0, 2.0)),
            ft.PointSource((4, 2, 100), ft.ContinuousWave(0.3), j=(0, 1.0, 0)),
            ft.PointSource((15, 7, 127), ft.GaussianPulse(DT, DT), j=(1.0, 0, 0)),
        ]
    )

    ref_step = pallas_stepk_fn(shape, k, inv_dx=INV_DX, dt=DT, interpret=True)
    ref = state
    for _ in range(2):
        ref = ref_step(ref, coeffs, srcs)

    mesh = make_mesh(n_dev, ("x",))
    step = make_pallas_sharded_stepk(
        mesh, k, nl, inv_dx=INV_DX, dt=DT, interpret=True
    )
    st = extend_state(state, mesh, k)
    for _ in range(2):
        st = step(st, coeffs, srcs)
    out = collapse_state(st, mesh, k)

    np.testing.assert_allclose(out.e_stacked(), ref.e_stacked(), rtol=5e-6, atol=5e-6)
    np.testing.assert_allclose(out.h_stacked(), ref.h_stacked(), rtol=5e-6, atol=5e-6)
    assert int(out.tick) == int(ref.tick)


def test_sharded_k_step_2d_mesh_matches_single(rng):
    """2-D (x, y) decomposition of the K-step kernel: extended halos along
    BOTH lattice dims, ordered two-phase exchange (y then x; the x phase
    ships the just-refreshed lateral halos, covering the corner regions),
    and runtime lateral Neumann-edge coordinates. Must match the
    single-device K-step kernel with sources adjacent to both cut
    directions."""
    if len(jax.devices()) < 8:
        pytest.skip("not enough devices")
    from fdtd_tpu.parallel.pallas_sharded_k import (
        collapse_state,
        extend_state,
        make_pallas_sharded_stepk,
    )
    from fdtd_tpu.solver.pallas_stepk import pallas_stepk_fn

    shape, k = (32, 24, 128), 2
    mesh = make_mesh(8, ("x", "y"))
    assert mesh.shape["x"] == 4 and mesh.shape["y"] == 2
    nl = shape[0] // mesh.shape["x"]
    nly = shape[1] // mesh.shape["y"]
    e = rng.standard_normal((3, *shape))
    h = rng.standard_normal((3, *shape))
    state = ft.state_from_stacked(e, h, dtype=jnp.float32)
    coeffs = ft.CellCoefficients.uniform((0.97, 0.21, 0.99, 0.18), jnp.float32)
    # sources 1 cell from the x cut at 8 and ON the y cut at 12 (both
    # within the k=2 halo reach of a neighbor shard)
    srcs = ft.SourceSet.build(
        [
            ft.PointSource((7, 11, 7), ft.GaussianPulse(2 * DT, DT),
                           j=(0.5, 0, 2.0)),
            ft.PointSource((16, 12, 100), ft.ContinuousWave(0.3),
                           j=(0, 1.0, 0)),
        ]
    )

    ref_step = pallas_stepk_fn(shape, k, inv_dx=INV_DX, dt=DT, interpret=True)
    ref = state
    for _ in range(3):
        ref = ref_step(ref, coeffs, srcs)

    step = make_pallas_sharded_stepk(
        mesh, k, nl, inv_dx=INV_DX, dt=DT, interpret=True, nl_y=nly,
    )
    st = extend_state(state, mesh, k, axes=("x", "y"))
    for _ in range(3):
        st = step(st, coeffs, srcs)
    out = collapse_state(st, mesh, k, axes=("x", "y"))

    np.testing.assert_allclose(out.e_stacked(), ref.e_stacked(),
                               rtol=5e-6, atol=5e-6)
    np.testing.assert_allclose(out.h_stacked(), ref.h_stacked(),
                               rtol=5e-6, atol=5e-6)
    assert int(out.tick) == int(ref.tick)


def test_extract_slice_from_extended_state(rng):
    """Live slice extraction (config 5): planes pulled from the extended
    sharded layout on device must equal global-state slices, halos skipped."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from fdtd_tpu.parallel.pallas_sharded_k import extend_state, extract_slice

    shape, k, n_dev = (16, 8, 128), 3, 8
    nl = shape[0] // n_dev
    e = rng.standard_normal((3, *shape))
    h = rng.standard_normal((3, *shape))
    state = ft.state_from_stacked(e, h, dtype=jnp.float32)
    mesh = make_mesh(n_dev, ("x",))
    st = extend_state(state, mesh, k)
    # poison the halos: extraction must never read them
    st = st._replace(
        ex=st.ex.at[:: nl + 2 * k].set(jnp.nan),
        hy=st.hy.at[nl + k :: nl + 2 * k].set(jnp.nan),
    )

    for axis, index, comp in [(0, 5, "e"), (0, 12, "h"), (1, 3, "e"), (2, 100, "h")]:
        got = np.asarray(
            jax.jit(
                lambda s: extract_slice(s, mesh, k, nl, axis, index, comp)
            )(st)
        )
        f3 = e if comp == "e" else h
        want = np.take(f3.astype(np.float32), index, axis=1 + axis)
        np.testing.assert_array_equal(got, want)
