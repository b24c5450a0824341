"""Sharded-vs-single-device equivalence on an 8-device virtual CPU mesh.

The discriminating test for halo-exchange correctness: the backward/forward
difference asymmetry makes halo direction per-field-update distinct
(SURVEY.md §7 hard part b); any off-by-one here breaks bitwise equality.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fdtd_tpu import (
    BoundaryConditions,
    state_from_stacked,
    CellCoefficients,
    Dirichlet,
    GaussianPulse,
    Neumann,
    PointSource,
    SimState,
    SourceSet,
    step_fn,
)
from fdtd_tpu.parallel import make_mesh, make_sharded_step, shard_state

SHAPE = (16, 8, 12)
INV_DX = (1.0, 1.0 / 0.7, 1.0 / 1.3)
DT = 0.25


def make_inputs(rng, dtype=jnp.float64):
    e = rng.standard_normal((3, *SHAPE))
    h = rng.standard_normal((3, *SHAPE))
    state = state_from_stacked(e, h, dtype=dtype)
    srcs = SourceSet.build(
        [
            PointSource((3, 2, 5), GaussianPulse(2 * DT, DT), j=(0, 0, 2.0)),
            PointSource((14, 6, 1), GaussianPulse(DT, DT), j=(1.0, 0, 0), m=(0, 1.0, 0)),
        ],
        dtype=dtype,
    )
    return state, srcs


@pytest.mark.parametrize(
    "dims,axes",
    [
        (("x", "y", None), ("x", "y")),  # 4x2 over lattice x,y
        (("x", None, None), ("x",)),  # 1D decomposition, 8-way
        ((None, "x", "y"), ("x", "y")),  # shard y,z instead
    ],
)
def test_sharded_matches_single_device(rng, dims, axes):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    state, srcs = make_inputs(rng)
    coeffs = CellCoefficients.uniform((0.97, 0.2, 0.99, 0.15), jnp.float64)

    ref_step = step_fn(inv_dx=INV_DX, dt=DT)
    ref = state
    for _ in range(5):
        ref = ref_step(ref, coeffs, srcs)

    mesh = make_mesh(8, axes)
    sh_step = make_sharded_step(mesh, dims, inv_dx=INV_DX, dt=DT)
    st = shard_state(state, mesh, dims)
    stepped = jax.jit(sh_step)
    for _ in range(5):
        st = stepped(st, coeffs, srcs)

    np.testing.assert_allclose(st.e_stacked(), ref.e_stacked(), rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(st.h_stacked(), ref.h_stacked(), rtol=1e-12, atol=1e-12)
    assert int(st.tick) == int(ref.tick)


def test_sharded_nontrivial_boundaries(rng):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    bc = BoundaryConditions(
        x=Dirichlet(alpha=(0.5, 0, 0), beta=(0, 0.25, 0)),
        y=Neumann(alpha=(0.1, 0.2, 0.3), beta=(-0.1, 0, 0)),
        z=Neumann(),
    )
    state, _ = make_inputs(rng)
    coeffs = CellCoefficients.uniform((1.0, 0.3, 1.0, 0.3), jnp.float64)

    ref_step = step_fn(inv_dx=INV_DX, dt=DT, bc=bc)
    ref = state
    for _ in range(4):
        ref = ref_step(ref, coeffs, None)

    mesh = make_mesh(8, ("x", "y"))
    dims = ("x", "y", None)
    sh_step = make_sharded_step(mesh, dims, inv_dx=INV_DX, dt=DT, bc=bc)
    st = shard_state(state, mesh, dims)
    for _ in range(4):
        st = jax.jit(sh_step)(st, coeffs, None)

    np.testing.assert_allclose(st.e_stacked(), ref.e_stacked(), rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(st.h_stacked(), ref.h_stacked(), rtol=1e-12, atol=1e-12)


def test_sharded_dense_coefficients(rng):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    state, srcs = make_inputs(rng)
    ca = jnp.asarray(rng.uniform(0.9, 1.0, SHAPE), jnp.float64)
    cb = jnp.asarray(rng.uniform(0.1, 0.2, SHAPE), jnp.float64)
    da = jnp.asarray(rng.uniform(0.9, 1.0, SHAPE), jnp.float64)
    db = jnp.asarray(rng.uniform(0.1, 0.2, SHAPE), jnp.float64)
    coeffs = CellCoefficients(ca, cb, da, db)

    ref_step = step_fn(inv_dx=INV_DX, dt=DT)
    ref = state
    for _ in range(3):
        ref = ref_step(ref, coeffs, srcs)

    mesh = make_mesh(8, ("x", "y"))
    dims = ("x", "y", None)
    sh_step = make_sharded_step(mesh, dims, inv_dx=INV_DX, dt=DT)
    st = shard_state(state, mesh, dims)
    for _ in range(3):
        st = jax.jit(sh_step)(st, coeffs, srcs)

    np.testing.assert_allclose(st.e_stacked(), ref.e_stacked(), rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(st.h_stacked(), ref.h_stacked(), rtol=1e-12, atol=1e-12)


def test_sharded_slice_extraction(rng):
    """Config 5's live rendering path: slice probes and projections work on
    sharded states (XLA gathers across shards)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from fdtd_tpu.parallel import make_mesh, make_sharded_step, shard_state
    from fdtd_tpu.probes import SliceProbe
    from fdtd_tpu.viz.projection import ProjectionParameters, axis_plane_projection, project

    state, srcs = make_inputs(rng, dtype=jnp.float32)
    coeffs = CellCoefficients.uniform((1.0, 0.2, 1.0, 0.2), jnp.float32)
    mesh = make_mesh(8, ("x", "y"))
    dims = ("x", "y", None)
    step = jax.jit(make_sharded_step(mesh, dims, inv_dx=INV_DX, dt=DT))
    st = shard_state(state, mesh, dims)
    st = step(st, coeffs, srcs)

    plane = SliceProbe(axis=2, index=5).sample(st, DT)
    assert np.asarray(plane).shape == (3, 16, 8)

    img = project(
        st,
        ProjectionParameters(
            projection=tuple(map(tuple, np.asarray(
                axis_plane_projection(2, 5, SHAPE))))
        ),
        size=(32, 32),
    )
    assert img.shape == (32, 32, 4)
    assert np.isfinite(np.asarray(plane)).all()


def test_multihost_helpers_single_process():
    """Single-process fallbacks: init_distributed is a no-op and
    make_multihost_mesh degrades to a local mesh (the multi-process branch
    needs a real coordinator; its layout logic is pure factoring)."""
    from fdtd_tpu.parallel.topology import (
        init_distributed,
        make_multihost_mesh,
    )

    assert init_distributed() is False
    mesh = make_multihost_mesh(("x", "y"))
    assert set(mesh.shape) == {"x", "y"}
    assert mesh.shape["x"] * mesh.shape["y"] == len(jax.devices())
