"""Sharded composed-engine (CPML + TF/SF + sources) vs single-device engine.

The equivalence gate for parallel/sharded_engine.py: full-domain elementwise
psi under shard_map must reproduce the slab-resident single-device engine
(solver/engine.py) to rounding. The 6-cell absorber slabs deliberately
straddle shard boundaries (nl = 4 at 8-way x-decomposition) so the sharded
profile operands and halo'd stretched derivatives are both exercised.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import fdtd_tpu as ft
from fdtd_tpu.solver.cpml import Cpml
from fdtd_tpu.solver.engine import build_step, init_engine_state
from fdtd_tpu.solver.tfsf import Tfsf
from fdtd_tpu.parallel import make_mesh
from fdtd_tpu.parallel.sharded_engine import (
    init_sharded_engine_state,
    make_sharded_engine_step,
)

SHAPE = (32, 16, 16)
INV_DX = (1.0, 1.0, 1.0)
DT = 0.25


def _sources():
    return ft.SourceSet.build(
        [
            ft.PointSource((16, 8, 8), ft.GaussianPulse(8 * DT, 3 * DT), j=(0, 0, 1.0)),
            ft.PointSource((5, 3, 12), ft.GaussianPulse(6 * DT, 2 * DT),
                           j=(1.0, 0, 0), m=(0, 0.5, 0)),
        ],
        dtype=jnp.float64,
    )


def _run_pair(cpml, tfsf, sources, dims, axes, steps=40):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    coeffs = ft.CellCoefficients.uniform((1.0, 0.25, 1.0, 0.25), jnp.float64)

    ref_step = build_step(
        SHAPE, inv_dx=INV_DX, dt=DT, constants=ft.REDUCED,
        dtype=jnp.float64, cpml=cpml, tfsf=tfsf,
    )
    ref = init_engine_state(SHAPE, jnp.float64, cpml=cpml, tfsf=tfsf)
    ref_step = jax.jit(ref_step)
    for _ in range(steps):
        ref = ref_step(ref, coeffs, sources)

    mesh = make_mesh(8, axes)
    sh_step = jax.jit(
        make_sharded_engine_step(
            mesh, SHAPE, dims, inv_dx=INV_DX, dt=DT, constants=ft.REDUCED,
            dtype=jnp.float64, cpml=cpml, tfsf=tfsf,
        )
    )
    st = init_sharded_engine_state(
        SHAPE, mesh, dims, jnp.float64, cpml=cpml, tfsf=tfsf
    )
    for _ in range(steps):
        st = sh_step(st, coeffs, sources)

    for c in range(3):
        np.testing.assert_allclose(
            np.asarray(st.e[c]), np.asarray(ref.e[c]), rtol=1e-12, atol=1e-13
        )
        np.testing.assert_allclose(
            np.asarray(st.h[c]), np.asarray(ref.h[c]), rtol=1e-12, atol=1e-13
        )
    assert int(st.tick) == int(ref.tick)
    return st


def test_sharded_cpml_matches_engine():
    """Absorber slabs on all axes, 8-way x split (slabs cross shards)."""
    cpml = Cpml.uniform(6)
    _run_pair(cpml, None, _sources(), ("x", None, None), ("x",))


def test_sharded_cpml_2d_mesh():
    """4x2 mesh over lattice x,y with x+y absorbers."""
    cpml = Cpml(thickness=((6, 6), (5, 4), (0, 0)))
    _run_pair(cpml, None, _sources(), ("x", "y", None), ("x", "y"))


def test_sharded_tfsf_matches_engine():
    """TF/SF slab alone: plane injection at shard-interior and shard-edge
    x-planes via the masked dynamic-slice corrections."""
    tfsf = Tfsf(span=(8, 24), waveform=ft.GaussianPulse(10 * DT, 4 * DT))
    _run_pair(None, tfsf, None, ("x", None, None), ("x",))


def test_sharded_full_engine():
    """Everything at once: CPML + TF/SF + J/M point sources (config-3 shape,
    distributed)."""
    cpml = Cpml(thickness=((6, 6), (4, 4), (4, 4)))
    tfsf = Tfsf(span=(9, 23), waveform=ft.GaussianPulse(10 * DT, 4 * DT))
    st = _run_pair(cpml, tfsf, _sources(), ("x", None, None), ("x",))
    # fields actually nonzero (the test isn't vacuously comparing zeros)
    assert float(jnp.max(jnp.abs(st.ez))) > 1e-8


def test_sharded_tfsf_box_matches_engine():
    """Closed-box TF/SF under x-decomposition: lateral-face corrections use
    per-shard x-masked incident rows; must match the single-device engine."""
    tfsf = Tfsf(span=(8, 24), waveform=ft.GaussianPulse(10 * DT, 4 * DT),
                span_y=(4, 11), span_z=(4, 11))
    cpml = Cpml(thickness=((5, 5), (0, 0), (0, 0)))
    _run_pair(cpml, tfsf, _sources(), ("x", None, None), ("x",))


def test_sharded_tfsf_box_lateral_sharding():
    """Closed-box TF/SF under x-AND-y decomposition (round 2): the
    lateral faces live at runtime per-shard offsets with global masks, so
    y faces straddling the y-shard cut must match the single device."""
    tfsf = Tfsf(span=(8, 24), waveform=ft.GaussianPulse(10 * DT, 4 * DT),
                span_y=(4, 11), span_z=(4, 11))
    cpml = Cpml(thickness=((5, 5), (0, 0), (0, 0)))
    _run_pair(cpml, tfsf, _sources(), ("x", "y", None), ("x", "y"))


def test_sharded_tfsf_box_z_sharding():
    """Box TF/SF with the z axis sharded (z faces cross the cut)."""
    tfsf = Tfsf(span=(8, 24), waveform=ft.GaussianPulse(10 * DT, 4 * DT),
                span_y=(4, 11), span_z=(4, 11))
    _run_pair(None, tfsf, _sources(), ("x", None, "z"), ("x", "z"))


def _dense_ball(axis, box, center, radius, straddle_note=""):
    from fdtd_tpu.scene.shapes import Ball
    from fdtd_tpu.solver.pml_region import (
        dense_pml_from_depth,
        depth_from_contains,
    )

    ball = Ball(radius=radius)
    c = np.asarray(center, np.float64)
    d_h, d_e = depth_from_contains(
        lambda p: ball.contains(p - c[:, None]), box, axis, +1
    )
    return dense_pml_from_depth(
        axis, box, d_h, d_e, spec=Cpml.uniform(1).spec, dx=1.0, dt=DT,
        constants=ft.REDUCED,
    )


def _run_dense_pair(cpml, dense, dims, axes, steps=40):
    """Sharded engine with a DensePml region vs the single-device engine
    (full-domain merged coefficient volumes vs the subgrid psi_d path) —
    the regions are disjoint from the slabs so the per-cell math must
    agree to rounding."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    coeffs = ft.CellCoefficients.uniform((1.0, 0.25, 1.0, 0.25), jnp.float64)
    sources = _sources()

    ref_step = jax.jit(build_step(
        SHAPE, inv_dx=INV_DX, dt=DT, constants=ft.REDUCED,
        dtype=jnp.float64, cpml=cpml, dense=dense,
    ))
    ref = init_engine_state(SHAPE, jnp.float64, cpml=cpml, dense=dense)
    for _ in range(steps):
        ref = ref_step(ref, coeffs, sources)

    mesh = make_mesh(8, axes)
    sh_step = jax.jit(make_sharded_engine_step(
        mesh, SHAPE, dims, inv_dx=INV_DX, dt=DT, constants=ft.REDUCED,
        dtype=jnp.float64, cpml=cpml, dense=dense,
    ))
    st = init_sharded_engine_state(
        SHAPE, mesh, dims, jnp.float64, cpml=cpml, dense=dense
    )
    for _ in range(steps):
        st = sh_step(st, coeffs, sources)

    for c in range(3):
        np.testing.assert_allclose(
            np.asarray(st.e[c]), np.asarray(ref.e[c]), rtol=1e-12, atol=1e-13
        )
        np.testing.assert_allclose(
            np.asarray(st.h[c]), np.asarray(ref.h[c]), rtol=1e-12, atol=1e-13
        )
    # the absorber actually did something (not a vacuous zero-zero match)
    assert float(jnp.max(jnp.abs(st.ez))) > 1e-10
    return st


def test_sharded_engine_dense_region_x_mesh():
    """Interior ball absorber (z-axis stretch) straddling the 8-way x
    decomposition; boundary slabs on x only — the dense box overlaps NO
    slab but several shard cuts."""
    dense = _dense_ball(2, ((8, 24), (4, 14), (4, 14)), (16.0, 8.0, 8.0), 4.0)
    cpml = Cpml(thickness=((5, 5), (0, 0), (0, 0)))
    _run_dense_pair(cpml, dense, ("x", None, None), ("x",))


def test_sharded_engine_dense_region_no_boundary_cpml():
    """A DensePml with NO boundary absorber at all: the dense axis's psi
    terms must still promote to full-domain arrays."""
    dense = _dense_ball(0, ((8, 24), (4, 14), (4, 14)), (16.0, 8.0, 8.0), 4.0)
    _run_dense_pair(None, dense, ("x", None, None), ("x",))


def test_sharded_engine_dense_region_2d_mesh():
    """Same region on a 4x2 (x, y) mesh — the box straddles cuts on both
    decomposed axes, and the dense axis (z) is undecomposed."""
    dense = _dense_ball(2, ((8, 24), (4, 14), (4, 14)), (16.0, 8.0, 8.0), 4.0)
    cpml = Cpml(thickness=((5, 5), (4, 4), (0, 0)))
    _run_dense_pair(cpml, dense, ("x", "y", None), ("x", "y"))


def test_sharded_engine_dense_on_active_axis():
    """Dense region whose axis ALSO carries boundary slabs (merged
    full-domain profile: slab baseline + box scatter must coexist)."""
    dense = _dense_ball(0, ((12, 22), (4, 14), (4, 14)), (17.0, 8.0, 8.0), 4.0)
    cpml = Cpml(thickness=((5, 5), (0, 0), (4, 4)))
    _run_dense_pair(cpml, dense, ("x", None, None), ("x",))
