"""Sharded in-kernel CPML (parallel/pallas_sharded_cpml.py) equivalence.

Gate: the sharded CPML K-step must match the single-device CPML K kernel
(solver/pallas_cpml_k.py) on fields AND psi after multiple chained passes,
in interpret mode on the virtual CPU mesh — including a source within K
planes of a shard boundary (exercises halo injection + redundant
recompute agreement)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import fdtd_tpu as ft
from fdtd_tpu.parallel import make_mesh
from fdtd_tpu.parallel.pallas_sharded_cpml import (
    collapse_pml_state,
    extend_pml_state,
    init_sharded_pml_state,
    make_pallas_sharded_cpml_stepk,
    supports_sharded_cpml,
)
from fdtd_tpu.solver.boundary import BoundaryConditions
from fdtd_tpu.solver.cpml import Cpml
from fdtd_tpu.solver.pallas_cpml import init_pml_kernel_state
from fdtd_tpu.solver.pallas_cpml_k import pallas_cpml_stepk_fn


def _run_pair(shape, n_dev, k, cpml, n_passes, src_px, *,
              with_m=False, matid=None, n_materials=1,
              dtype=jnp.float32):
    mesh = make_mesh(n_dev, ("x",))
    bc = BoundaryConditions()
    assert supports_sharded_cpml(shape, n_dev, bc, cpml, k, dtype)

    res = ft.Resolution.courant(1.0, ft.REDUCED, safety=0.9)
    dt = res.temporal
    if matid is not None:
        tab = ft.MaterialTable()
        tab.register(ft.Material(relative_permittivity=2.5))
        ctable = ft.coefficient_table(tab.materials, res, ft.REDUCED)
        coeffs = jnp.asarray(ctable, jnp.float32)
    else:
        table = ft.coefficient_table([ft.VACUUM], res, ft.REDUCED)
        coeffs = ft.CellCoefficients.uniform(table[0], jnp.float32)
    src = ft.SourceSet.build(
        [
            ft.PointSource(
                (src_px, shape[1] // 2, shape[2] // 2),
                ft.GaussianPulse(4 * dt, 2 * dt),
                j=(0.3, -0.2, 1.0),
                m=(0.1, 0.4, -0.3) if with_m else (0.0, 0.0, 0.0),
            )
        ]
    )

    kw = dict(max_sources=1, interpret=True, with_m=with_m, dtype=dtype)
    ref_step = pallas_cpml_stepk_fn(
        shape, k, inv_dx=(1.0, 1.0, 1.0), dt=dt, constants=ft.REDUCED,
        cpml=cpml,
        matid=None if matid is None else jnp.asarray(matid),
        n_materials=n_materials, **kw,
    )
    ref = init_pml_kernel_state(shape, dtype, cpml=cpml)
    for _ in range(n_passes):
        ref = ref_step(ref, coeffs, src)

    sh_step = make_pallas_sharded_cpml_stepk(
        mesh, shape, k, inv_dx=(1.0, 1.0, 1.0), dt=dt,
        constants=ft.REDUCED, cpml=cpml,
        matid=matid, n_materials=n_materials, **kw,
    )
    st = init_sharded_pml_state(shape, mesh, k, cpml=cpml, dtype=dtype)
    for _ in range(n_passes):
        st = sh_step(st, coeffs, src)
    got = collapse_pml_state(st, mesh, k, shape, cpml=cpml)
    return ref, got


def _assert_state_equal(ref, got, atol=1e-6):
    for name in ("ex", "ey", "ez", "hx", "hy", "hz"):
        np.testing.assert_allclose(
            np.asarray(getattr(got, name)),
            np.asarray(getattr(ref, name)),
            rtol=0, atol=atol, err_msg=name,
        )
    assert int(got.tick) == int(ref.tick)
    for i, (pr, pg) in enumerate(zip(ref.psi, got.psi)):
        np.testing.assert_allclose(
            np.asarray(pg), np.asarray(pr), rtol=0, atol=atol,
            err_msg=f"psi[{i}]",
        )


def test_sharded_cpml_all_axes_matches_single_device():
    # CPML on all axes, source 1 plane from the shard-0/1 boundary
    shape, n_dev, k = (32, 32, 256), 2, 2
    cpml = Cpml(thickness=((6, 6), (4, 4), (4, 4)))
    ref, got = _run_pair(shape, n_dev, k, cpml, n_passes=4, src_px=15)
    assert float(jnp.abs(ref.ez).max()) > 0  # simulation actually ran
    _assert_state_equal(ref, got)


def test_sharded_cpml_x_only_four_shards():
    # x-only CPML over 4 shards; interior shards carry zero-profile slabs
    shape, n_dev, k = (64, 8, 128), 4, 3
    cpml = Cpml(thickness=((10, 10), (0, 0), (0, 0)))
    ref, got = _run_pair(shape, n_dev, k, cpml, n_passes=3, src_px=33)
    assert float(jnp.abs(ref.ez).max()) > 0
    _assert_state_equal(ref, got)


def test_sharded_cpml_roundtrip_extend_collapse():
    shape, n_dev, k = (32, 32, 256), 2, 2
    cpml = Cpml(thickness=((6, 6), (4, 4), (4, 4)))
    mesh = make_mesh(n_dev, ("x",))
    # build a nonzero global state by running the single-device kernel
    res = ft.Resolution.courant(1.0, ft.REDUCED, safety=0.9)
    dt = res.temporal
    table = ft.coefficient_table([ft.VACUUM], res, ft.REDUCED)
    coeffs = ft.CellCoefficients.uniform(table[0], jnp.float32)
    src = ft.SourceSet.build(
        [ft.PointSource((16, 16, 128), ft.GaussianPulse(4 * dt, 2 * dt),
                        j=(0.0, 0.0, 1.0))]
    )
    step = pallas_cpml_stepk_fn(
        shape, k, inv_dx=(1.0, 1.0, 1.0), dt=dt, constants=ft.REDUCED,
        cpml=cpml, max_sources=1, interpret=True,
    )
    st = init_pml_kernel_state(shape, cpml=cpml)
    for _ in range(3):
        st = step(st, coeffs, src)
    rt = collapse_pml_state(
        extend_pml_state(st, mesh, k, cpml=cpml), mesh, k, shape, cpml=cpml
    )
    _assert_state_equal(st, rt, atol=0)


def test_supports_sharded_cpml_rejects_deep_pml():
    bc = BoundaryConditions()
    # depth 14 > nl - k = 16 - 2 on 2 shards of nx=32
    assert not supports_sharded_cpml(
        (32, 32, 256), 2, bc, Cpml(thickness=((14, 14), (0, 0), (0, 0))), 2
    )
    assert supports_sharded_cpml(
        (32, 32, 256), 2, bc, Cpml(thickness=((6, 6), (0, 0), (0, 0))), 2
    )


def test_best_sharded_absorbing_dispatch():
    from fdtd_tpu.parallel.best import best_sharded_absorbing_step
    from fdtd_tpu.solver.tfsf import Tfsf

    shape = (32, 32, 256)
    cpml = Cpml(thickness=((6, 6), (4, 4), (4, 4)))
    mesh = make_mesh(2, ("x",))
    res = ft.Resolution.courant(1.0, ft.REDUCED, safety=0.9)
    table = ft.coefficient_table([ft.VACUUM], res, ft.REDUCED)
    coeffs = ft.CellCoefficients.uniform(table[0], jnp.float32)

    step, init_state, k, kind = best_sharded_absorbing_step(
        mesh, shape, inv_dx=(1.0, 1.0, 1.0), dt=res.temporal,
        constants=ft.REDUCED, cpml=cpml, interpret=True,
    )
    assert kind == "pallas_cpml_k" and k >= 2
    st = step(init_state(), coeffs, None)
    assert int(st.tick) == k

    # slab TF/SF rides the kernel path (round 2: runtime plane coords)
    tfsf = Tfsf(span=(8, 23),
                waveform=ft.GaussianPulse(4 * res.temporal, 2 * res.temporal))
    step2, init2, k2, kind2 = best_sharded_absorbing_step(
        mesh, shape, inv_dx=(1.0, 1.0, 1.0), dt=res.temporal,
        constants=ft.REDUCED, cpml=cpml, tfsf=tfsf, interpret=True,
    )
    assert kind2 == "pallas_cpml_k" and k2 >= 2
    st2 = init2()
    for _ in range(3):
        st2 = step2(st2, coeffs, None)
    assert int(st2.tick) == 3 * k2
    # collapse drops the halo/trash planes (garbage by construction —
    # interpret mode fills never-written output planes with NaN)
    g2 = collapse_pml_state(st2, mesh, k2, shape, cpml=cpml)
    ez = np.asarray(g2.ez)
    assert np.all(np.isfinite(ez))
    assert float(np.abs(ez).max()) > 0  # plane wave injected

    # box TF/SF rides the kernel path too (round 3: full aux rows +
    # extended->global offset)
    box = Tfsf(span=(8, 23), span_y=(8, 23), span_z=(64, 191),
               waveform=ft.GaussianPulse(4 * res.temporal, 2 * res.temporal))
    step3, init3, k3, kind3 = best_sharded_absorbing_step(
        mesh, shape, inv_dx=(1.0, 1.0, 1.0), dt=res.temporal,
        constants=ft.REDUCED, cpml=cpml, tfsf=box, interpret=True,
    )
    assert kind3 == "pallas_cpml_k" and k3 >= 2
    st3 = init3()
    for _ in range(2):
        st3 = step3(st3, coeffs, None)
    g3 = collapse_pml_state(st3, mesh, k3, shape, cpml=cpml)
    ez3 = np.asarray(g3.ez)
    assert np.all(np.isfinite(ez3))
    assert float(np.abs(ez3).max()) > 0


def test_sharded_cpml_m_sources():
    """M (magnetic-current) sources on the sharded absorbing path: per-level
    in-kernel H-half injection must survive halo redundant recompute (the
    source sits 1 plane from the shard boundary)."""
    shape, n_dev, k = (32, 32, 256), 2, 2
    cpml = Cpml(thickness=((6, 6), (4, 4), (4, 4)))
    ref, got = _run_pair(shape, n_dev, k, cpml, n_passes=3, src_px=15,
                         with_m=True)
    assert float(jnp.abs(ref.hy).max()) > 0
    _assert_state_equal(ref, got)


def test_sharded_cpml_matid():
    """Compressed materials on the sharded absorbing path: the extended
    per-shard matid volume (halo copies of neighbor planes) must reproduce
    the single-device kernel across a material boundary that straddles the
    shard cut."""
    shape, n_dev, k = (32, 32, 256), 2, 2
    cpml = Cpml(thickness=((6, 6), (4, 4), (4, 4)))
    matid = np.zeros(shape, np.uint8)
    matid[12:20, 8:24, 96:160] = 1  # dielectric brick across the x=16 cut
    ref, got = _run_pair(shape, n_dev, k, cpml, n_passes=3, src_px=15,
                         matid=matid, n_materials=2)
    assert float(jnp.abs(ref.ez).max()) > 0
    _assert_state_equal(ref, got)


def test_sharded_cpml_bf16():
    """bf16 storage on the sharded absorbing path: identical rounding on
    both sides (f32 compute, bf16 write-back per pass) keeps the sharded
    run bit-compatible with the single-device bf16 kernel."""
    shape, n_dev, k = (32, 32, 256), 2, 2
    cpml = Cpml(thickness=((6, 6), (4, 4), (4, 4)))
    ref, got = _run_pair(shape, n_dev, k, cpml, n_passes=3, src_px=15,
                         dtype=jnp.bfloat16)
    assert ref.ex.dtype == jnp.bfloat16 and got.ex.dtype == jnp.bfloat16
    assert all(p.dtype == jnp.float32 for p in got.psi)
    assert float(jnp.abs(jnp.asarray(ref.ez, jnp.float32)).max()) > 0
    _assert_state_equal(
        ref._replace(**{f: jnp.asarray(getattr(ref, f), jnp.float32)
                        for f in ("ex", "ey", "ez", "hx", "hy", "hz")}),
        got._replace(**{f: jnp.asarray(getattr(got, f), jnp.float32)
                        for f in ("ex", "ey", "ez", "hx", "hy", "hz")}),
    )


def test_sharded_cpml_tfsf_slab():
    """Slab TF/SF on the sharded absorbing path: runtime per-shard plane
    coordinates + pre-gathered aux rows must reproduce the single-device
    kernel, with the injection planes straddling shard boundaries."""
    from fdtd_tpu.solver.tfsf import Tfsf

    shape, n_dev, k = (32, 32, 256), 2, 2
    cpml = Cpml(thickness=((6, 6), (4, 4), (4, 4)))
    mesh = make_mesh(n_dev, ("x",))
    bc = BoundaryConditions()
    assert supports_sharded_cpml(shape, n_dev, bc, cpml, k)

    res = ft.Resolution.courant(1.0, ft.REDUCED, safety=0.9)
    dt = res.temporal
    # plane at x=15: one inside shard 0, one plane from the cut; hi at 24
    tfsf = Tfsf(span=(15, 24), waveform=ft.GaussianPulse(6 * dt, 2 * dt))
    coeffs = ft.CellCoefficients.uniform(
        ft.coefficient_table([ft.VACUUM], res, ft.REDUCED)[0], jnp.float32)
    src = ft.SourceSet.build([ft.PointSource(
        (20, 16, 128), ft.GaussianPulse(4 * dt, 2 * dt), j=(0, 0, 0.4))])

    ref_step = pallas_cpml_stepk_fn(
        shape, k, inv_dx=(1.0, 1.0, 1.0), dt=dt, constants=ft.REDUCED,
        cpml=cpml, tfsf=tfsf, max_sources=1, interpret=True,
    )
    ref = init_pml_kernel_state(shape, cpml=cpml, tfsf=tfsf)
    sh_step = make_pallas_sharded_cpml_stepk(
        mesh, shape, k, inv_dx=(1.0, 1.0, 1.0), dt=dt,
        constants=ft.REDUCED, cpml=cpml, tfsf=tfsf, max_sources=1,
        interpret=True,
    )
    st = init_sharded_pml_state(shape, mesh, k, cpml=cpml, tfsf=tfsf)

    for _ in range(3):
        ref = ref_step(ref, coeffs, src)
        st = sh_step(st, coeffs, src)
    got = collapse_pml_state(st, mesh, k, shape, cpml=cpml)
    assert float(jnp.abs(ref.ez).max()) > 1e-5
    np.testing.assert_allclose(
        np.asarray(got.aux_e), np.asarray(ref.aux_e), atol=1e-7,
    )
    _assert_state_equal(ref, got)


def test_sharded_cpml_tfsf_box():
    """Closed-box TF/SF on the sharded absorbing path: runtime extended
    plane coordinates + FULL aux rows + the extended->global offset must
    reproduce the single-device box kernel, with the box x-span straddling
    the shard cut (the lateral y/z faces are uncut by the x decomposition
    and stay static in-kernel masks)."""
    from fdtd_tpu.solver.tfsf import Tfsf

    shape, n_dev, k = (32, 32, 256), 2, 2
    cpml = Cpml(thickness=((6, 6), (4, 4), (4, 4)))
    mesh = make_mesh(n_dev, ("x",))
    bc = BoundaryConditions()
    assert supports_sharded_cpml(shape, n_dev, bc, cpml, k)

    res = ft.Resolution.courant(1.0, ft.REDUCED, safety=0.9)
    dt = res.temporal
    # box x-span (12, 22) straddles the x=16 cut; faces at 12/22 land on
    # different shards, and shard 0's halo holds copies of planes 16-17
    tfsf = Tfsf(span=(12, 22), span_y=(8, 23), span_z=(64, 191),
                waveform=ft.GaussianPulse(6 * dt, 2 * dt))
    coeffs = ft.CellCoefficients.uniform(
        ft.coefficient_table([ft.VACUUM], res, ft.REDUCED)[0], jnp.float32)
    src = ft.SourceSet.build([ft.PointSource(
        (15, 16, 128), ft.GaussianPulse(4 * dt, 2 * dt), j=(0, 0, 0.4))])

    ref_step = pallas_cpml_stepk_fn(
        shape, k, inv_dx=(1.0, 1.0, 1.0), dt=dt, constants=ft.REDUCED,
        cpml=cpml, tfsf=tfsf, max_sources=1, interpret=True,
    )
    ref = init_pml_kernel_state(shape, cpml=cpml, tfsf=tfsf)
    sh_step = make_pallas_sharded_cpml_stepk(
        mesh, shape, k, inv_dx=(1.0, 1.0, 1.0), dt=dt,
        constants=ft.REDUCED, cpml=cpml, tfsf=tfsf, max_sources=1,
        interpret=True,
    )
    st = init_sharded_pml_state(shape, mesh, k, cpml=cpml, tfsf=tfsf)

    for _ in range(3):
        ref = ref_step(ref, coeffs, src)
        st = sh_step(st, coeffs, src)
    got = collapse_pml_state(st, mesh, k, shape, cpml=cpml)
    assert float(jnp.abs(ref.ez).max()) > 1e-5
    np.testing.assert_allclose(
        np.asarray(got.aux_e), np.asarray(ref.aux_e), atol=1e-7,
    )
    _assert_state_equal(ref, got)


def test_sharded_cpml_2d_mesh_matches_single_device():
    """2-D (x, y) decomposition of the CPML K-step kernel: extended halo
    COLUMNS on every lattice-aligned tensor (fields, x-slab psi, z-strip
    psi, matid), ordered two-phase exchange (lateral then x), per-y-shard
    runtime strip profiles with the strip segments y_halo inside the
    plane, and runtime lateral Neumann edges. Must match the single-device
    kernel with CPML on ALL axes and a source one cell from the y cut."""
    shape, k = (32, 64, 256), 4
    cpml = Cpml(thickness=((6, 6), (4, 4), (4, 4)))
    mesh = make_mesh(4, ("x", "y"))
    n_dx, n_dy = mesh.shape["x"], mesh.shape["y"]
    assert (n_dx, n_dy) == (2, 2)
    bc = BoundaryConditions()
    assert supports_sharded_cpml(shape, n_dx, bc, cpml, k, n_dev_y=n_dy)

    res = ft.Resolution.courant(1.0, ft.REDUCED, safety=0.9)
    dt = res.temporal
    table = ft.coefficient_table([ft.VACUUM], res, ft.REDUCED)
    coeffs = ft.CellCoefficients.uniform(table[0], jnp.float32)
    # y=31: one column from the y cut at 32 -> injects into the lateral
    # halo copy of the (0,1)/(1,1) shards; x=15 is one plane from x cut
    src = ft.SourceSet.build(
        [ft.PointSource((15, 31, 128), ft.GaussianPulse(4 * dt, 2 * dt),
                        j=(0.3, -0.2, 1.0))]
    )

    ref_step = pallas_cpml_stepk_fn(
        shape, k, inv_dx=(1.0, 1.0, 1.0), dt=dt, constants=ft.REDUCED,
        cpml=cpml, max_sources=1, interpret=True,
    )
    ref = init_pml_kernel_state(shape, cpml=cpml)
    sh_step = make_pallas_sharded_cpml_stepk(
        mesh, shape, k, inv_dx=(1.0, 1.0, 1.0), dt=dt,
        constants=ft.REDUCED, cpml=cpml, max_sources=1, interpret=True,
        y_axis="y",
    )
    st = init_sharded_pml_state(shape, mesh, k, cpml=cpml, y_axis="y")
    for _ in range(3):
        ref = ref_step(ref, coeffs, src)
        st = sh_step(st, coeffs, src)
    got = collapse_pml_state(st, mesh, k, shape, cpml=cpml, y_axis="y")
    assert float(jnp.abs(ref.ez).max()) > 0
    _assert_state_equal(ref, got)


def test_sharded_cpml_2d_roundtrip_extend_collapse():
    shape, k = (32, 64, 256), 4
    cpml = Cpml(thickness=((6, 6), (4, 4), (4, 4)))
    mesh = make_mesh(4, ("x", "y"))
    res = ft.Resolution.courant(1.0, ft.REDUCED, safety=0.9)
    dt = res.temporal
    table = ft.coefficient_table([ft.VACUUM], res, ft.REDUCED)
    coeffs = ft.CellCoefficients.uniform(table[0], jnp.float32)
    src = ft.SourceSet.build(
        [ft.PointSource((16, 32, 128), ft.GaussianPulse(4 * dt, 2 * dt),
                        j=(0.0, 0.0, 1.0))]
    )
    step = pallas_cpml_stepk_fn(
        shape, k, inv_dx=(1.0, 1.0, 1.0), dt=dt, constants=ft.REDUCED,
        cpml=cpml, max_sources=1, interpret=True,
    )
    st = init_pml_kernel_state(shape, cpml=cpml)
    for _ in range(2):
        st = step(st, coeffs, src)
    rt = collapse_pml_state(
        extend_pml_state(st, mesh, k, cpml=cpml, y_axis="y"),
        mesh, k, shape, cpml=cpml, y_axis="y",
    )
    _assert_state_equal(st, rt, atol=0)


def test_sharded_cpml_2d_matid():
    """Compressed materials under the 2-D (x, y) decomposition: the
    matid volume is halo-extended along BOTH lattice dims (neighbor-owned
    copies), with a dielectric brick straddling both cuts."""
    shape, k = (32, 48, 256), 4
    cpml = Cpml(thickness=((6, 6), (4, 4), (4, 4)))
    mesh = make_mesh(4, ("x", "y"))
    n_dx, n_dy = mesh.shape["x"], mesh.shape["y"]
    assert (n_dx, n_dy) == (2, 2)
    bc = BoundaryConditions()
    assert supports_sharded_cpml(shape, n_dx, bc, cpml, k, n_dev_y=n_dy)

    res = ft.Resolution.courant(1.0, ft.REDUCED, safety=0.9)
    dt = res.temporal
    tab = ft.MaterialTable()
    tab.register(ft.Material(relative_permittivity=2.5))
    table = jnp.asarray(
        ft.coefficient_table(tab.materials, res, ft.REDUCED), jnp.float32)
    matid = np.zeros(shape, np.uint8)
    matid[12:20, 20:28, 96:160] = 1  # brick across x=16 AND y=24 cuts
    src = ft.SourceSet.build(
        [ft.PointSource((15, 23, 128), ft.GaussianPulse(4 * dt, 2 * dt),
                        j=(0.3, -0.2, 1.0))]
    )

    # single-chip reference: the XLA engine with the dense gathered
    # coefficients (the single-chip matid KERNEL needs global ny % 32,
    # which the 2-D per-shard constraint ny_ext % 32 can't satisfy at
    # any K <= 10 simultaneously — so the engine is the arbiter here)
    from fdtd_tpu.solver.engine import build_step, init_engine_state

    dense_coeffs = ft.CellCoefficients.from_table(table, jnp.asarray(matid))
    eng = build_step(shape, inv_dx=(1.0, 1.0, 1.0), dt=dt,
                     constants=ft.REDUCED, cpml=cpml)
    ref = init_engine_state(shape, cpml=cpml)
    sh_step = make_pallas_sharded_cpml_stepk(
        mesh, shape, k, inv_dx=(1.0, 1.0, 1.0), dt=dt,
        constants=ft.REDUCED, cpml=cpml, max_sources=1, interpret=True,
        matid=matid, n_materials=2, y_axis="y",
    )
    st = init_sharded_pml_state(shape, mesh, k, cpml=cpml, y_axis="y")
    for _ in range(2 * k):
        ref = eng(ref, dense_coeffs, src)
    for _ in range(2):
        st = sh_step(st, table, src)
    got = collapse_pml_state(st, mesh, k, shape, cpml=cpml, y_axis="y")
    assert float(jnp.abs(ref.ez).max()) > 0
    for name in ("ex", "ey", "ez", "hx", "hy", "hz"):
        np.testing.assert_allclose(
            np.asarray(getattr(got, name)), np.asarray(getattr(ref, name)),
            rtol=0, atol=1e-6, err_msg=name,
        )


def test_sharded_cpml_dft_row_captures_match_single_device():
    """dft_rows on the sharded kernel: the psum-assembled global
    (K, nx, 6, lat) capture blocks must BIT-match the single-device
    kernel's captures — 4 shards, source within K planes of a shard cut,
    y and z descriptors, chained passes."""
    shape, n_dev, k = (64, 16, 256), 4, 3
    cpml = Cpml(thickness=((4, 4), (3, 3), (4, 4)))
    mesh = make_mesh(n_dev, ("x",))
    bc = BoundaryConditions()
    assert supports_sharded_cpml(shape, n_dev, bc, cpml, k, jnp.float32)
    res = ft.Resolution.courant(1.0, ft.REDUCED, safety=0.9)
    dt = res.temporal
    table = ft.coefficient_table([ft.VACUUM], res, ft.REDUCED)
    coeffs = ft.CellCoefficients.uniform(table[0], jnp.float32)
    src = ft.SourceSet.build([ft.PointSource(
        (17, 8, 128), ft.GaussianPulse(4 * dt, 2 * dt),
        j=(0.3, -0.2, 1.0))])  # plane 17: within k=3 of the 16-cut
    descs = (("y", 7), ("z", 120), ("y", 9))

    kw = dict(max_sources=1, interpret=True, dft_rows=descs)
    ref_step = pallas_cpml_stepk_fn(
        shape, k, inv_dx=(1.0, 1.0, 1.0), dt=dt, constants=ft.REDUCED,
        cpml=cpml, **kw)
    ref = init_pml_kernel_state(shape, cpml=cpml)
    ref_caps = []
    for _ in range(4):
        ref, caps = ref_step(ref, coeffs, src)
        ref_caps.append([np.asarray(c) for c in caps])

    sh_step = make_pallas_sharded_cpml_stepk(
        mesh, shape, k, inv_dx=(1.0, 1.0, 1.0), dt=dt,
        constants=ft.REDUCED, cpml=cpml, **kw)
    st = init_sharded_pml_state(shape, mesh, k, cpml=cpml)
    got_caps = []
    for _ in range(4):
        st, caps = sh_step(st, coeffs, src)
        got_caps.append([np.asarray(c) for c in caps])
    got = collapse_pml_state(st, mesh, k, shape, cpml=cpml)
    _assert_state_equal(ref, got)

    for p in range(4):
        for di in range(len(descs)):
            assert got_caps[p][di].shape == ref_caps[p][di].shape
            np.testing.assert_allclose(
                got_caps[p][di], ref_caps[p][di], rtol=0, atol=1e-6,
                err_msg=f"pass {p} desc {di}")
    assert max(np.abs(c).max() for cs in ref_caps for c in cs) > 0


def test_sharded_cpml_inkernel_dft_matches_single_device():
    """dft on the sharded kernel (runtime plane coordinates + per-shard
    resident accumulators on the psi tail): the dev-summed global
    (6F, ny, nz) spectra must match the single-device kernel's static
    in-kernel DFT to f32 rounding — 4 shards, a plane within K of a
    shard cut, an H-component plane, chained passes."""
    shape, n_dev, k = (64, 16, 256), 4, 3
    cpml = Cpml(thickness=((4, 4), (3, 3), (4, 4)))
    mesh = make_mesh(n_dev, ("x",))
    bc = BoundaryConditions()
    res = ft.Resolution.courant(1.0, ft.REDUCED, safety=0.9)
    dt = res.temporal
    table = ft.coefficient_table([ft.VACUUM], res, ft.REDUCED)
    coeffs = ft.CellCoefficients.uniform(table[0], jnp.float32)
    src = ft.SourceSet.build([ft.PointSource(
        (17, 8, 128), ft.GaussianPulse(4 * dt, 2 * dt),
        j=(0.3, -0.2, 1.0))])  # plane 17: within k=3 of the 16-cut
    planes = (15, (33, 0), (33, 1))  # 15 = last plane of shard 0
    freqs = (0.02, 0.05)
    assert supports_sharded_cpml(shape, n_dev, bc, cpml, k, jnp.float32,
                                 dft_rt=(len(planes), len(freqs)))

    ref_step = pallas_cpml_stepk_fn(
        shape, k, inv_dx=(1.0, 1.0, 1.0), dt=dt, constants=ft.REDUCED,
        cpml=cpml, max_sources=1, interpret=True, dft=(planes, freqs))
    ref = init_pml_kernel_state(shape, cpml=cpml, dft=(planes, freqs))
    for _ in range(6):
        ref = ref_step(ref, coeffs, src)

    sh_step = make_pallas_sharded_cpml_stepk(
        mesh, shape, k, inv_dx=(1.0, 1.0, 1.0), dt=dt,
        constants=ft.REDUCED, cpml=cpml, max_sources=1, interpret=True,
        dft=(planes, freqs))
    st = init_sharded_pml_state(shape, mesh, k, cpml=cpml,
                                dft=(planes, freqs))
    for _ in range(6):
        st = sh_step(st, coeffs, src)

    n_f = len(freqs)
    for pi in range(len(planes)):
        ref_vol = np.asarray(ref.psi[-(len(planes) - pi)])[:, 1]
        got_ext = np.asarray(st.psi[-(len(planes) - pi)])
        got = got_ext.reshape(n_dev, 6 * n_f, shape[1], shape[2])
        # exactly one shard (the owner) accumulated
        nz_shards = [d for d in range(n_dev)
                     if np.abs(got[d]).max() > 0]
        assert nz_shards == [planes[pi] // 16
                             if isinstance(planes[pi], int)
                             else planes[pi][0] // 16], f"plane {pi}"
        # few-ulp gate, not bit equality: the sharded build's extended
        # shapes + runtime operands give XLA different fusion/FMA
        # contraction choices than the single-device build on the SAME
        # stage expressions (post round-5 kappa-fold the accumulated
        # spectra round ~3e-6 relative apart over 60 ticks); a real
        # plane/owner bug produces O(spectrum)-scale errors, so the
        # scaled absolute gate discriminates identically
        scale = np.abs(ref_vol).max()
        np.testing.assert_allclose(got.sum(0), ref_vol, rtol=0,
                                   atol=1e-5 * max(scale, 1e-30),
                                   err_msg=f"plane {pi}")
        assert np.abs(ref_vol).max() > 0, f"plane {pi}"

    # the field state itself is untouched by the accumulators
    got_state = collapse_pml_state(
        st._replace(psi=st.psi[:-len(planes)]), mesh, k, shape, cpml=cpml)
    _assert_state_equal(ref._replace(psi=ref.psi[:-len(planes)]),
                        got_state)


def test_sharded_cpml_dense_region_matches_single_device():
    """DensePml on the sharded kernel (per-shard identity-padded runtime
    coefficient volumes + extended-layout region psi with an x halo
    exchange): fields, boundary psi AND the reassembled region psi must
    BIT-match the single-device dense kernel — 4 shards, the absorber
    ball straddling a shard cut, chained passes."""
    from fdtd_tpu.scene.shapes import Ball
    from fdtd_tpu.solver.pml_region import (
        dense_pml_from_depth,
        depth_from_contains,
        pad_dense_to_tiles,
    )

    shape, n_dev, k = (64, 16, 256), 4, 3
    cpml = Cpml(thickness=((4, 4), (3, 3), (4, 4)))
    mesh = make_mesh(n_dev, ("x",))
    bc = BoundaryConditions()
    res = ft.Resolution.courant(1.0, ft.REDUCED, safety=0.9)
    dt = res.temporal
    ball = Ball(radius=5.0)
    box = ((10, 22), (2, 14), (122, 134))  # straddles the x=16 cut
    center = np.array([16.0, 8.0, 128.0])
    d_h, d_e = depth_from_contains(
        lambda p: ball.contains(p - center[:, None]), box, 0, +1
    )
    dense = pad_dense_to_tiles(
        dense_pml_from_depth(0, box, d_h, d_e, spec=cpml.spec, dx=1.0,
                             dt=dt, constants=ft.REDUCED),
        shape,
    )
    assert supports_sharded_cpml(shape, n_dev, bc, cpml, k, jnp.float32,
                                 dense=dense)
    nl = shape[0] // n_dev

    coeffs = ft.CellCoefficients.uniform(
        ft.coefficient_table([ft.VACUUM], res, ft.REDUCED)[0], jnp.float32)
    src = ft.SourceSet.build(
        [ft.PointSource((6, 8, 128), ft.GaussianPulse(4 * dt, 2 * dt),
                        j=(0.2, -0.1, 1.0))]
    )

    ref_step = pallas_cpml_stepk_fn(
        shape, k, inv_dx=(1.0, 1.0, 1.0), dt=dt, constants=ft.REDUCED,
        cpml=cpml, max_sources=1, interpret=True, dense=dense)
    ref = init_pml_kernel_state(shape, cpml=cpml, dense=dense)
    for _ in range(4):
        ref = ref_step(ref, coeffs, src)

    sh_step = make_pallas_sharded_cpml_stepk(
        mesh, shape, k, inv_dx=(1.0, 1.0, 1.0), dt=dt,
        constants=ft.REDUCED, cpml=cpml, max_sources=1, interpret=True,
        dense=dense)
    st = init_sharded_pml_state(shape, mesh, k, cpml=cpml, dense=dense)
    for _ in range(4):
        st = sh_step(st, coeffs, src)

    # region psi: reassemble owned planes from the per-shard extended
    # volumes (volume plane j <-> extended plane j-1 <-> global plane
    # d*nl - k + j - 1) and compare against the single-device volume
    (gx0, gx1), (gy0, gy1), (gz0, gz1) = dense.box
    ref_dvol = np.asarray(ref.psi[-1])  # (4, bx+1, by, bz)
    got_ext = np.asarray(st.psi[-1]).reshape(
        n_dev, 4, nl + 2 * k + 1, gy1 - gy0, gz1 - gz0)
    for gi in range(gx1 - gx0):
        g = gx0 + gi
        d = g // nl
        j = g - (d * nl - k) + 1
        np.testing.assert_array_equal(
            got_ext[d, :, j], ref_dvol[:, gi + 1],
            err_msg=f"region psi plane {gi}")
    assert np.abs(ref_dvol).max() > 0  # the absorber actually engaged

    got = collapse_pml_state(
        st._replace(psi=st.psi[:-1]), mesh, k, shape, cpml=cpml)
    _assert_state_equal(ref._replace(psi=ref.psi[:-1]), got)


def test_sharded_cpml_tfsf_box_2d_mesh():
    """Closed-box TF/SF under the 2-D (x, y) decomposition: the box's
    y-face coordinates become per-shard RUNTIME values in the extended y
    frame (SMEM row cols 3-4), firing on owned AND halo copies of the
    face rows. The box straddles BOTH the x cut and the y cut; must
    match the single-device box kernel bit-for-bit."""
    from fdtd_tpu.solver.tfsf import Tfsf

    shape, k = (32, 64, 256), 4
    cpml = Cpml(thickness=((6, 6), (4, 4), (4, 4)))
    mesh = make_mesh(4, ("x", "y"))
    n_dx, n_dy = mesh.shape["x"], mesh.shape["y"]
    assert (n_dx, n_dy) == (2, 2)
    bc = BoundaryConditions()
    assert supports_sharded_cpml(shape, n_dx, bc, cpml, k, n_dev_y=n_dy)

    res = ft.Resolution.courant(1.0, ft.REDUCED, safety=0.9)
    dt = res.temporal
    # x-span (12, 22) straddles the x=16 cut; y-span (20, 43) straddles
    # the y=32 cut, so the y faces at 20 and 43 live on DIFFERENT
    # y-shards and their halo columns hold copies of rows near the cut
    tfsf = Tfsf(span=(12, 22), span_y=(20, 43), span_z=(64, 191),
                waveform=ft.GaussianPulse(6 * dt, 2 * dt))
    coeffs = ft.CellCoefficients.uniform(
        ft.coefficient_table([ft.VACUUM], res, ft.REDUCED)[0], jnp.float32)
    # source one column from the y cut: exercises the lateral exchange
    # alongside the box injections
    src = ft.SourceSet.build([ft.PointSource(
        (15, 31, 128), ft.GaussianPulse(4 * dt, 2 * dt), j=(0, 0, 0.4))])

    ref_step = pallas_cpml_stepk_fn(
        shape, k, inv_dx=(1.0, 1.0, 1.0), dt=dt, constants=ft.REDUCED,
        cpml=cpml, tfsf=tfsf, max_sources=1, interpret=True,
    )
    ref = init_pml_kernel_state(shape, cpml=cpml, tfsf=tfsf)
    sh_step = make_pallas_sharded_cpml_stepk(
        mesh, shape, k, inv_dx=(1.0, 1.0, 1.0), dt=dt,
        constants=ft.REDUCED, cpml=cpml, tfsf=tfsf, max_sources=1,
        interpret=True, y_axis="y",
    )
    st = init_sharded_pml_state(shape, mesh, k, cpml=cpml, tfsf=tfsf,
                                y_axis="y")
    for _ in range(3):
        ref = ref_step(ref, coeffs, src)
        st = sh_step(st, coeffs, src)
    got = collapse_pml_state(st, mesh, k, shape, cpml=cpml, y_axis="y")
    assert float(jnp.abs(ref.ez).max()) > 1e-5
    np.testing.assert_allclose(
        np.asarray(got.aux_e), np.asarray(ref.aux_e), atol=1e-7,
    )
    _assert_state_equal(ref, got)


def test_sharded_cpml_flux_and_rows_2d_mesh():
    """Flux reductions + DFT row captures under the 2-D (x, y)
    decomposition: the "y" descriptor coordinates become per-shard
    RUNTIME extended-frame values (kernel runtime_lat) and every
    reduction is restricted to the shard's owned lateral window, so the
    psum over BOTH mesh axes reproduces the single-device kernel's
    blocks bit-for-bit. Descriptors target BOTH y-shards; the source
    sits one column from the y cut."""
    shape, k = (32, 64, 256), 4
    cpml = Cpml(thickness=((6, 6), (4, 4), (4, 4)))
    mesh = make_mesh(4, ("x", "y"))
    n_dx, n_dy = mesh.shape["x"], mesh.shape["y"]
    assert (n_dx, n_dy) == (2, 2)
    bc = BoundaryConditions()
    assert supports_sharded_cpml(shape, n_dx, bc, cpml, k, n_dev_y=n_dy)

    res = ft.Resolution.courant(1.0, ft.REDUCED, safety=0.9)
    dt = res.temporal
    coeffs = ft.CellCoefficients.uniform(
        ft.coefficient_table([ft.VACUUM], res, ft.REDUCED)[0], jnp.float32)
    src = ft.SourceSet.build([ft.PointSource(
        (15, 31, 128), ft.GaussianPulse(4 * dt, 2 * dt),
        j=(0.3, -0.2, 1.0))])
    # y=20 owned by y-shard 0, y=43 by y-shard 1; z uncut
    faces = (("x",), ("y", 20), ("y", 43), ("z", 120))
    descs = (("y", 20), ("z", 120), ("y", 43))

    kw = dict(max_sources=1, interpret=True, flux_faces=faces,
              dft_rows=descs)
    ref_step = pallas_cpml_stepk_fn(
        shape, k, inv_dx=(1.0, 1.0, 1.0), dt=dt, constants=ft.REDUCED,
        cpml=cpml, **kw)
    ref = init_pml_kernel_state(shape, cpml=cpml)
    ref_rows, ref_caps = [], []
    for _ in range(3):
        ref, rows, caps = ref_step(ref, coeffs, src)
        ref_rows.append(np.asarray(rows))
        ref_caps.append([np.asarray(c) for c in caps])

    sh_step = make_pallas_sharded_cpml_stepk(
        mesh, shape, k, inv_dx=(1.0, 1.0, 1.0), dt=dt,
        constants=ft.REDUCED, cpml=cpml, y_axis="y", **kw)
    st = init_sharded_pml_state(shape, mesh, k, cpml=cpml, y_axis="y")
    got_rows, got_caps = [], []
    for _ in range(3):
        st, rows, caps = sh_step(st, coeffs, src)
        got_rows.append(np.asarray(rows))
        got_caps.append([np.asarray(c) for c in caps])
    got = collapse_pml_state(st, mesh, k, shape, cpml=cpml, y_axis="y")
    _assert_state_equal(ref, got)

    for p in range(3):
        np.testing.assert_allclose(
            got_rows[p], ref_rows[p], rtol=0, atol=1e-6,
            err_msg=f"flux pass {p}")
        for di in range(len(descs)):
            assert got_caps[p][di].shape == ref_caps[p][di].shape
            np.testing.assert_allclose(
                got_caps[p][di], ref_caps[p][di], rtol=0, atol=1e-6,
                err_msg=f"pass {p} desc {di}")
    assert max(np.abs(r).max() for r in ref_rows) > 0
    assert max(np.abs(c).max() for cs in ref_caps for c in cs) > 0


# ---------------------------------------------------------------------------
# Sharded GRID-BLOCKED mode (blocks=): lateral blocks inside each shard's
# pallas grid (parallel/pallas_sharded_cpml.py sharded_gb_plan /
# make_pallas_sharded_cpml_stepk blocks=). The caller's state keeps the
# canonical extended-sharded layout; the step converts y-strip psi at the
# call boundary — so equivalence vs the single-device plain K kernel uses
# the UNCHANGED extend/collapse round trip.
# ---------------------------------------------------------------------------


def _run_gb_pair(shape, n_dev, k, blocks, cpml, n_passes, src_pt, *,
                 tfsf=None, matid=None, n_materials=1,
                 dtype=jnp.float32):
    from fdtd_tpu.parallel.pallas_sharded_cpml import sharded_gb_plan

    mesh = make_mesh(n_dev, ("x",))
    bc = BoundaryConditions()
    plan = sharded_gb_plan(shape, n_dev, bc, cpml, k, dtype,
                           matid=matid is not None,
                           n_b_candidates=(blocks[0],))
    assert plan == blocks, (plan, blocks)

    res = ft.Resolution.courant(1.0, ft.REDUCED, safety=0.9)
    dt = res.temporal
    if matid is not None:
        tab = ft.MaterialTable()
        tab.register(ft.Material(relative_permittivity=2.5))
        ctable = ft.coefficient_table(tab.materials, res, ft.REDUCED)
        coeffs = jnp.asarray(ctable, jnp.float32)
    else:
        table = ft.coefficient_table([ft.VACUUM], res, ft.REDUCED)
        coeffs = ft.CellCoefficients.uniform(table[0], jnp.float32)
    src = ft.SourceSet.build(
        [ft.PointSource(src_pt, ft.GaussianPulse(4 * dt, 2 * dt),
                        j=(0.3, -0.2, 1.0))]
    )

    kw = dict(max_sources=1, interpret=True, dtype=dtype, tfsf=tfsf,
              matid=None if matid is None else jnp.asarray(matid),
              n_materials=n_materials)
    ref_step = pallas_cpml_stepk_fn(
        shape, k, inv_dx=(1.0, 1.0, 1.0), dt=dt, constants=ft.REDUCED,
        cpml=cpml, **kw,
    )
    ref = init_pml_kernel_state(shape, dtype, cpml=cpml, tfsf=tfsf)
    for _ in range(n_passes):
        ref = ref_step(ref, coeffs, src)

    sh_step = make_pallas_sharded_cpml_stepk(
        mesh, shape, k, inv_dx=(1.0, 1.0, 1.0), dt=dt,
        constants=ft.REDUCED, cpml=cpml, blocks=blocks,
        **{k_: v for k_, v in kw.items() if k_ != "matid"},
        matid=matid,
    )
    st = init_sharded_pml_state(shape, mesh, k, cpml=cpml, dtype=dtype,
                                tfsf=tfsf)
    for _ in range(n_passes):
        st = sh_step(st, coeffs, src)
    if tfsf is not None:
        st = st._replace(aux_e=ref.aux_e, aux_h=ref.aux_h)
    got = collapse_pml_state(st, mesh, k, shape, cpml=cpml)
    return ref, got


def test_sharded_gb_matches_single_device():
    # CPML on all axes; source within K planes of the x shard cut AND
    # within h columns of the y block cut (redundant-recompute agreement
    # along both decompositions at once)
    shape, n_dev, k = (16, 32, 256), 2, 2
    cpml = Cpml(thickness=((4, 4), (4, 4), (4, 4)))
    ref, got = _run_gb_pair(shape, n_dev, k, (2, 8), cpml, n_passes=4,
                            src_pt=(7, 15, 128))
    assert float(jnp.abs(ref.ez).max()) > 0
    _assert_state_equal(ref, got)


def test_sharded_gb_tfsf_box_straddles_block_cut():
    from fdtd_tpu.solver.tfsf import Tfsf
    from fdtd_tpu.solver.sources import GaussianPulse

    shape, n_dev, k = (24, 32, 128), 2, 2
    cpml = Cpml(thickness=((4, 4), (4, 4), (0, 0)))
    res = ft.Resolution.courant(1.0, ft.REDUCED, safety=0.9)
    tfsf = Tfsf(span=(8, 17), span_y=(8, 23), span_z=(40, 90),
                waveform=GaussianPulse(6 * res.temporal,
                                       2 * res.temporal))
    ref, got = _run_gb_pair(shape, n_dev, k, (2, 8), cpml, n_passes=4,
                            src_pt=(4, 4, 64), tfsf=tfsf)
    assert float(jnp.abs(ref.ez).max()) > 0
    _assert_state_equal(ref, got)


def test_sharded_gb_step2_matches_two_passes():
    # donation-threaded double pass on the sharded gb tier: pass 2's
    # kernel donates pass 1's refreshed input arrays — must be
    # BIT-identical to two single passes across the mesh
    import numpy as np

    from fdtd_tpu.parallel.pallas_sharded_cpml import sharded_gb_plan
    from fdtd_tpu.parallel.topology import make_mesh

    shape, n_dev, k = (32, 32, 256), 2, 2
    cpml = Cpml(thickness=((4, 4), (4, 4), (4, 4)))
    plan = sharded_gb_plan(shape, n_dev, BoundaryConditions(), cpml, k,
                           n_b_candidates=(2,))
    assert plan is not None
    mesh = make_mesh(n_dev, ("x",))
    res = ft.Resolution.courant(1.0, ft.REDUCED, safety=0.9)
    dt = res.temporal
    table = ft.coefficient_table([ft.VACUUM], res, ft.REDUCED)
    coeffs = ft.CellCoefficients.uniform(table[0], jnp.float32)
    src = ft.SourceSet.build(
        [ft.PointSource((16, 15, 128), ft.GaussianPulse(4 * dt, 2 * dt),
                        j=(0.3, -0.2, 1.0))]
    )
    step = make_pallas_sharded_cpml_stepk(
        mesh, shape, k, inv_dx=(1.0, 1.0, 1.0), dt=dt,
        constants=ft.REDUCED, cpml=cpml, max_sources=1, blocks=plan,
        interpret=True)
    assert step.step2 is not None
    s0 = init_sharded_pml_state(shape, mesh, k, cpml=cpml)
    a = s0
    for _ in range(4):
        a = step(a, coeffs, src)
    b = s0
    for _ in range(2):
        b = step.step2(b, coeffs, src)
    ca = collapse_pml_state(a, mesh, k, shape, cpml=cpml)
    cb = collapse_pml_state(b, mesh, k, shape, cpml=cpml)
    assert int(ca.tick) == int(cb.tick)
    for f in ("ex", "ey", "ez", "hx", "hy", "hz"):
        np.testing.assert_array_equal(
            np.asarray(getattr(cb, f)), np.asarray(getattr(ca, f)),
            err_msg=f)
    for i, (x, y) in enumerate(zip(ca.psi, cb.psi)):
        np.testing.assert_array_equal(np.asarray(y), np.asarray(x),
                                      err_msg=f"psi[{i}]")


def test_sharded_gb_dispatch_upgrade_plan():
    # at big lateral planes the plain ladder is VMEM-capped at K=3 and
    # the dispatcher upgrades to the grid-blocked build (parallel/best.py
    # gb_pl); build-only — the kernel equivalence is gated by the two
    # tests above on small shapes
    from fdtd_tpu.parallel.best import best_sharded_absorbing_step
    from fdtd_tpu.parallel.pallas_sharded_cpml import sharded_gb_plan

    shape, n_dev = (48, 512, 512), 2
    cpml = Cpml.uniform(10)
    bc = BoundaryConditions()
    # the plain ladder caps at K=3 here (supports VMEM formula)...
    assert supports_sharded_cpml(shape, n_dev, bc, cpml, 3)
    assert not supports_sharded_cpml(shape, n_dev, bc, cpml, 4)
    # ...and the gb plan lifts it to K=10 with 2 lateral blocks
    assert sharded_gb_plan(shape, n_dev, bc, cpml, 10) == (2, 16)

    mesh = make_mesh(n_dev, ("x",))
    res = ft.Resolution.courant(1.0, ft.REDUCED, safety=0.9)
    step, init_state, k, kind = best_sharded_absorbing_step(
        mesh, shape, inv_dx=(1.0, 1.0, 1.0), dt=res.temporal, cpml=cpml,
        constants=ft.REDUCED, max_sources=1, interpret=True,
    )
    assert (k, kind) == (10, "pallas_cpml_k")
    assert getattr(init_state, "gb_blocks", None) == (10, 2, 16)

    # accumulator-capable rebuilds must NOT upgrade (state halo width
    # tracks k): flux faces pin the plain ladder
    _, init2, k2, kind2 = best_sharded_absorbing_step(
        mesh, shape, inv_dx=(1.0, 1.0, 1.0), dt=res.temporal, cpml=cpml,
        constants=ft.REDUCED, max_sources=1, interpret=True,
        flux_faces=(("x",),),
    )
    assert (k2, kind2) == (3, "pallas_cpml_k")
    assert getattr(init2, "gb_blocks", None) is None


# ---------------------------------------------------------------------------
# Sharded oblique-incidence TF/SF: the analytic correction stack stays in
# GLOBAL coordinates (replicated) and each shard addresses it through a
# runtime scalar-prefetch x offset (pallas_cpml_k runtime_oblique).
# ---------------------------------------------------------------------------


def test_sharded_oblique_matches_single_device():
    from fdtd_tpu.solver.tfsf_oblique import ObliqueTfsf

    shape, n_dev, k = (32, 24, 128), 4, 2
    cpml = Cpml(thickness=((4, 4), (4, 4), (0, 0)))
    mesh = make_mesh(n_dev, ("x",))
    res = ft.Resolution.courant(1.0, ft.REDUCED, safety=0.9)
    dt = res.temporal
    coeffs = ft.CellCoefficients.uniform(
        ft.coefficient_table([ft.VACUUM], res, ft.REDUCED)[0], jnp.float32
    )
    # box straddles the shard cuts at x = 16 (and 8/24 via the subgrid)
    tfsf = ObliqueTfsf(
        box=((10, 21), (8, 15), (40, 90)),
        direction=(1.0, 0.7, -0.4),
        polarization=(0.0, 0.2, 1.0),
        waveform=ft.GaussianPulse(10 * dt, 4 * dt),
    )
    ref_step = pallas_cpml_stepk_fn(
        shape, k, inv_dx=(1.0, 1.0, 1.0), dt=dt, constants=ft.REDUCED,
        cpml=cpml, oblique=tfsf, interpret=True)
    ref = init_pml_kernel_state(shape, cpml=cpml)
    sh_step = make_pallas_sharded_cpml_stepk(
        mesh, shape, k, inv_dx=(1.0, 1.0, 1.0), dt=dt,
        constants=ft.REDUCED, cpml=cpml, oblique=tfsf, interpret=True)
    st = init_sharded_pml_state(shape, mesh, k, cpml=cpml)
    for _ in range(8):
        ref = ref_step(ref, coeffs, None)
        st = sh_step(st, coeffs, None)
    got = collapse_pml_state(st, mesh, k, shape, cpml=cpml)
    assert float(jnp.abs(ref.ez).max()) > 1e-3  # wave entered the box
    _assert_state_equal(ref, got)


def test_sharded_oblique_dispatch():
    from fdtd_tpu.parallel.best import best_sharded_absorbing_step
    from fdtd_tpu.solver.tfsf_oblique import ObliqueTfsf

    shape, n_dev = (32, 24, 128), 2
    cpml = Cpml(thickness=((4, 4), (4, 4), (0, 0)))
    mesh = make_mesh(n_dev, ("x",))
    res = ft.Resolution.courant(1.0, ft.REDUCED, safety=0.9)
    dt = res.temporal
    coeffs = ft.CellCoefficients.uniform(
        ft.coefficient_table([ft.VACUUM], res, ft.REDUCED)[0], jnp.float32
    )
    tfsf = ObliqueTfsf(
        box=((10, 21), (8, 15), (40, 90)),
        direction=(1.0, 0.0, 0.0),
        polarization=(0.0, 0.0, 1.0),
        waveform=ft.GaussianPulse(10 * dt, 4 * dt),
    )
    step, init_state, k, kind = best_sharded_absorbing_step(
        mesh, shape, inv_dx=(1.0, 1.0, 1.0), dt=dt, cpml=cpml,
        constants=ft.REDUCED, tfsf=tfsf, interpret=True,
    )
    assert kind == "pallas_cpml_k" and k > 1
    ref_step = pallas_cpml_stepk_fn(
        shape, k, inv_dx=(1.0, 1.0, 1.0), dt=dt, constants=ft.REDUCED,
        cpml=cpml, oblique=tfsf, interpret=True)
    ref = init_pml_kernel_state(shape, cpml=cpml)
    st = init_state()
    for _ in range(2):
        ref = ref_step(ref, coeffs, None)
        st = step(st, coeffs, None)
    got = collapse_pml_state(st, mesh, k, shape, cpml=cpml)
    assert float(jnp.abs(ref.ez).max()) > 1e-4
    _assert_state_equal(ref, got)

    # 2-D meshes have no sharded oblique host: loud rejection
    mesh2 = make_mesh(4, ("x", "y"))
    with pytest.raises(NotImplementedError):
        best_sharded_absorbing_step(
            mesh2, shape, inv_dx=(1.0, 1.0, 1.0), dt=dt, cpml=cpml,
            constants=ft.REDUCED, tfsf=tfsf, interpret=True,
        )
