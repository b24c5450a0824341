"""High-level ShardedSimulation (parallel/simulation.py).

The multi-chip mirror of solver.Simulation: auto-dispatch to the best
sharded path per configuration, uniform init/run/gather regardless of the
underlying state layout. Gates: correct dispatch kind per config and
equality with the single-chip reference paths."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import fdtd_tpu as ft
from fdtd_tpu.parallel import make_mesh
from fdtd_tpu.parallel.simulation import ShardedSimulation
from fdtd_tpu.solver.cpml import Cpml
from fdtd_tpu.solver.tfsf import Tfsf


def _grid(shape):
    return ft.Grid(shape=shape,
                   resolution=ft.Resolution.courant(1.0, ft.REDUCED,
                                                    safety=0.9),
                   constants=ft.REDUCED)


def _uniform_coeffs(grid):
    table = ft.coefficient_table([ft.VACUUM], grid.resolution, ft.REDUCED)
    return ft.CellCoefficients.uniform(table[0], jnp.float32)


def _src(grid, cell):
    return ft.SourceSet.build([ft.PointSource(
        cell, ft.GaussianPulse(4 * grid.dt, 2 * grid.dt), j=(0, 0, 1.0))])


def test_absorbing_dispatch_and_gather_matches_single_chip():
    shape = (32, 32, 256)
    grid = _grid(shape)
    cpml = Cpml(thickness=((6, 6), (4, 4), (4, 4)))
    coeffs = _uniform_coeffs(grid)
    src = _src(grid, (15, 16, 128))
    mesh = make_mesh(2, ("x",))

    sim = ShardedSimulation(grid=grid, coeffs=coeffs, sources=src,
                            cpml=cpml, mesh=mesh, interpret=True, max_k=2)
    k, kind = sim.plan()
    assert kind == "pallas_cpml_k" and k == 2

    st = sim.init()
    st = sim.run(st, 3 * k)
    g = sim.gather(st)
    assert int(g.tick) == 3 * k

    # single-chip reference
    from fdtd_tpu.solver.pallas_cpml import init_pml_kernel_state
    from fdtd_tpu.solver.pallas_cpml_k import pallas_cpml_stepk_fn

    one = pallas_cpml_stepk_fn(
        shape, k, inv_dx=(1.0, 1.0, 1.0), dt=grid.dt, constants=ft.REDUCED,
        cpml=cpml, max_sources=1, interpret=True)
    ref = init_pml_kernel_state(shape, cpml=cpml)
    for _ in range(3):
        ref = one(ref, coeffs, src)
    scale = float(jnp.abs(ref.ez).max())
    assert scale > 1e-6
    for c in range(3):
        np.testing.assert_allclose(np.asarray(g.e[c]), np.asarray(ref.e[c]),
                                   rtol=0, atol=1e-6, err_msg=f"e[{c}]")


def test_free_space_kernel_dispatch():
    shape = (64, 16, 128)
    grid = _grid(shape)
    coeffs = _uniform_coeffs(grid)
    src = _src(grid, (31, 8, 64))
    mesh = make_mesh(4, ("x",))

    sim = ShardedSimulation(grid=grid, coeffs=coeffs, sources=src,
                            mesh=mesh, interpret=True, max_k=3)
    k, kind = sim.plan()
    assert kind == "pallas_k" and k >= 2

    st = sim.init()
    st = sim.run(st, 2 * k)
    g = sim.gather(st)
    assert int(g.tick) == 2 * k
    ez = np.asarray(g.ez)
    assert np.all(np.isfinite(ez)) and np.abs(ez).max() > 1e-9

    # equality vs the single-chip XLA step
    ref = ft.zero_state(shape)
    f = jax.jit(ft.step_fn(inv_dx=(1.0, 1.0, 1.0), dt=grid.dt))
    for _ in range(2 * k):
        ref = f(ref, coeffs, src)
    np.testing.assert_allclose(np.asarray(g.ez), np.asarray(ref.ez),
                               rtol=0, atol=2e-6)


def test_xla_fallback_on_2d_mesh():
    shape = (32, 32, 64)
    grid = _grid(shape)
    coeffs = _uniform_coeffs(grid)
    src = _src(grid, (16, 16, 32))
    mesh = make_mesh(4, ("x", "y"))

    sim = ShardedSimulation(grid=grid, coeffs=coeffs, sources=src, mesh=mesh)
    k, kind = sim.plan()
    assert kind == "xla" and k == 1
    st = sim.init()
    st = sim.run(st, 5)
    g = sim.gather(st)
    assert int(g.tick) == 5
    assert np.isfinite(np.asarray(g.ez)).all()


def test_box_tfsf_routing():
    shape = (32, 16, 64)
    grid = _grid(shape)
    coeffs = _uniform_coeffs(grid)
    box = Tfsf(span=(8, 23), span_y=(4, 11), span_z=(16, 47),
               waveform=ft.GaussianPulse(4 * grid.dt, 2 * grid.dt))
    mesh = make_mesh(2, ("x",))
    # nz=64 is not kernel-tileable (needs nz % 128 == 0): engine path
    # (TF/SF-only runs DO ride the kernel when the shape allows — see
    # test_tfsf_only_rides_sharded_kernel)
    sim = ShardedSimulation(grid=grid, coeffs=coeffs, tfsf=box, mesh=mesh,
                            interpret=True)
    k, kind = sim.plan()
    assert kind == "xla_engine" and k == 1
    st = sim.init()
    st = sim.run(st, 12)
    g = sim.gather(st)
    assert int(g.tick) == 12
    assert float(jnp.abs(g.ez).max()) > 0

    # with CPML (and a kernel-capable shape), box TF/SF rides the sharded
    # kernel tier (round 3)
    grid2 = _grid((32, 32, 256))
    box2 = Tfsf(span=(8, 23), span_y=(8, 23), span_z=(64, 191),
                waveform=ft.GaussianPulse(4 * grid2.dt, 2 * grid2.dt))
    cpml = Cpml(thickness=((6, 6), (4, 4), (4, 4)))
    sim2 = ShardedSimulation(grid=grid2, coeffs=_uniform_coeffs(grid2),
                             tfsf=box2, cpml=cpml, mesh=mesh,
                             interpret=True)
    k2, kind2 = sim2.plan()
    assert kind2 == "pallas_cpml_k" and k2 >= 2
    st2 = sim2.init()
    st2 = sim2.run(st2, 2 * k2)
    g2 = sim2.gather(st2)
    assert int(g2.tick) == 2 * k2
    assert float(jnp.abs(g2.ez).max()) > 0

    # box TF/SF also rides the kernel tier under a 2-D (x, y) mesh
    # (runtime y-face coordinates — round 3); equality vs the single-
    # chip kernel is pinned by
    # test_sharded_cpml.py::test_sharded_cpml_tfsf_box_2d_mesh
    grid3 = _grid((32, 64, 256))
    box3 = Tfsf(span=(8, 23), span_y=(20, 43), span_z=(64, 191),
                waveform=ft.GaussianPulse(4 * grid3.dt, 2 * grid3.dt))
    # k=4, not 2: the extended lateral width nly + 2k must stay
    # 8-divisible (32/2 + 8 = 24 works; +4 = 20 does too, but the
    # dispatcher also needs the x slabs k planes inside the edge shards)
    sim3 = ShardedSimulation(grid=grid3, coeffs=_uniform_coeffs(grid3),
                             tfsf=box3, cpml=cpml,
                             mesh=make_mesh(4, ("x", "y")),
                             interpret=True, max_k=4)
    k3, kind3 = sim3.plan()
    assert kind3 == "pallas_cpml_k" and k3 == 4


def test_probes_on_kernel_and_engine_paths():
    """ShardedSimulation.run(probes=...): device-side global views must
    produce the same samples as collapsing + sampling on the host, on
    both the extended-layout kernel path and the plain engine path."""
    from fdtd_tpu.probes import FieldComponent, PointProbe, SliceProbe

    shape = (32, 32, 256)
    grid = _grid(shape)
    cpml = Cpml(thickness=((6, 6), (4, 4), (4, 4)))
    coeffs = _uniform_coeffs(grid)
    src = _src(grid, (15, 16, 128))
    mesh = make_mesh(2, ("x",))
    probes = (PointProbe(points=((15, 16, 128), (20, 8, 64))),
              SliceProbe(axis=0, index=17, component=FieldComponent.E))

    sim = ShardedSimulation(grid=grid, coeffs=coeffs, sources=src,
                            cpml=cpml, mesh=mesh, interpret=True, max_k=2)
    k, kind = sim.plan()
    assert kind == "pallas_cpml_k"
    st = sim.init()
    st, stacks = sim.run(st, 3 * k, probes=probes, probe_every=k)
    assert stacks[0].shape == (3, 2, 3)
    assert stacks[1].shape == (3, 3, 32, 256)

    # cross-check the final sample against the collapsed state
    g = sim.gather(st)
    np.testing.assert_allclose(
        np.asarray(stacks[0][-1]),
        np.asarray(probes[0].sample(g, grid.dt)), atol=0,
    )
    np.testing.assert_allclose(
        np.asarray(stacks[1][-1]),
        np.asarray(probes[1].sample(g, grid.dt)), atol=0,
    )
    assert np.abs(np.asarray(stacks[1])).max() > 0


def test_accumulators_on_engine_path_match_single_chip():
    """Flux accumulators on the per-tick sharded paths (the multi-chip
    scattering workflow): the running box-flux total around a radiating
    source must match the single-chip Simulation bit-for-bit."""
    from fdtd_tpu.models.scattering import _BoxFluxAccumulator
    from fdtd_tpu.solver.simulation import Simulation

    shape = (32, 32, 64)
    grid = _grid(shape)
    coeffs = _uniform_coeffs(grid)
    src = _src(grid, (16, 16, 32))
    flux_box = ((8, 25), (8, 25), (16, 49))
    dxs = grid.dx
    areas = (dxs[1] * dxs[2], dxs[0] * dxs[2], dxs[0] * dxs[1])
    n_steps = 40

    mesh = make_mesh(4, ("x", "y"))  # 2-D mesh -> per-tick "xla" path
    ssim = ShardedSimulation(grid=grid, coeffs=coeffs, sources=src,
                             mesh=mesh)
    k, kind = ssim.plan()
    assert kind == "xla" and k == 1
    acc = _BoxFluxAccumulator(flux_box, areas, grid.dt)
    st = ssim.init()
    st, _, (sh_flux,) = ssim.run(st, n_steps, accumulators=(acc,))

    sim = Simulation(grid=grid, coeffs=coeffs, sources=src, backend="xla")
    st1 = sim.init()
    st1, _, (one_flux,) = sim.run(st1, n_steps, accumulators=(acc,))

    a, b = float(sh_flux), float(one_flux)
    assert np.isfinite(a) and np.isfinite(b)
    assert b > 1e-8, b  # the source actually radiated through the box
    assert abs(a - b) <= 1e-5 * abs(b), (a, b)

    # K-step kernel paths run flux accumulators IN-KERNEL (round 3): the
    # per-tick per-plane Poynting reductions (pallas_cpml_k flux_faces)
    # must reproduce the single-chip engine's per-tick accumulation while
    # the kernel plan is RETAINED (no single-stepping)
    cpml = Cpml(thickness=((6, 6), (4, 4), (4, 4)))
    kgrid = _grid((32, 32, 256))
    kcoeffs = _uniform_coeffs(kgrid)
    ksrc = _src(kgrid, (15, 16, 128))
    kbox = ((8, 25), (8, 25), (64, 191))
    kacc = _BoxFluxAccumulator(kbox, areas, kgrid.dt)
    ksim = ShardedSimulation(grid=kgrid, coeffs=kcoeffs, sources=ksrc,
                             cpml=cpml, mesh=make_mesh(2, ("x",)),
                             interpret=True, max_k=2)
    kk, kkind = ksim.plan()
    assert kkind == "pallas_cpml_k" and kk == 2
    n_k = 16 * kk  # wave must actually reach the box faces
    kst, kprobes, (k_flux,) = ksim.run(
        ksim.init(), n_k, accumulators=(kacc,)
    )
    assert kprobes == ()

    sim2 = Simulation(grid=kgrid, coeffs=kcoeffs, sources=ksrc, cpml=cpml,
                      backend="xla")
    st2 = sim2.init()
    st2, _, (ref_flux,) = sim2.run(st2, n_k, accumulators=(kacc,))
    a2, b2 = float(k_flux), float(ref_flux)
    assert np.isfinite(a2) and np.isfinite(b2)
    assert abs(b2) > 1e-10, b2
    assert abs(a2 - b2) <= 1e-4 * abs(b2), (a2, b2)

    # non-flux accumulators still force the per-tick rule on kernel plans
    class _Opaque:
        def init(self, state, dt):
            return jnp.zeros(())

        def update(self, acc, state, dt):
            return acc

    with pytest.raises(ValueError, match="every tick"):
        ksim.run(ksim.init(), 2 * kk, accumulators=(_Opaque(),))


def test_compressed_materials_on_xla_path():
    """matid + table on a 2-D mesh: the dense gathered coefficients shard
    over the fields and reproduce the single-chip dense run."""
    from fdtd_tpu.solver.step import CellCoefficients

    shape = (32, 32, 64)
    grid = _grid(shape)
    src = _src(grid, (16, 16, 32))
    tab = ft.MaterialTable()
    tab.register(ft.Material(relative_permittivity=2.5))
    ctable = np.asarray(ft.coefficient_table(tab.materials, grid.resolution,
                                             ft.REDUCED))
    mid = np.zeros(shape, np.uint8)
    mid[10:22, 10:22, 20:44] = 1
    mesh = make_mesh(4, ("x", "y"))

    sim = ShardedSimulation(grid=grid, sources=src, mesh=mesh,
                            matid=mid, table=ctable)
    k, kind = sim.plan()
    assert kind == "xla" and k == 1
    st = sim.init()
    st = sim.run(st, 24)
    g = sim.gather(st)

    dense = CellCoefficients.from_table(jnp.asarray(ctable, jnp.float32),
                                        jnp.asarray(mid))
    ref = ft.zero_state(shape)
    f = jax.jit(ft.step_fn(inv_dx=(1.0, 1.0, 1.0), dt=grid.dt))
    for _ in range(24):
        ref = f(ref, dense, src)
    assert float(jnp.abs(ref.ez).max()) > 1e-8
    np.testing.assert_allclose(np.asarray(g.ez), np.asarray(ref.ez),
                               rtol=0, atol=2e-6)


def test_sharded_checkpoint_resume_mesh_change(tmp_path):
    """Checkpoint/resume across a MESH-SHAPE change: a run on 8 shards
    (K=2) is saved as a plain global checkpoint, restored into a 4-shard
    simulation that dispatches K=4, and continued — the result must match
    an uninterrupted single-device CPML K-step run, fields AND psi.
    (The reference has no state persistence at all — SURVEY.md §5.)"""
    from fdtd_tpu.solver.pallas_cpml import init_pml_kernel_state
    from fdtd_tpu.solver.pallas_cpml_k import pallas_cpml_stepk_fn

    shape = (64, 32, 256)
    cpml = Cpml(thickness=((5, 5), (4, 4), (4, 4)))
    grid = _grid(shape)
    coeffs = _uniform_coeffs(grid)
    src = _src(grid, (33, 16, 128))

    sim8 = ShardedSimulation(grid=grid, coeffs=coeffs, sources=src,
                             cpml=cpml, mesh=make_mesh(8, ("x",)),
                             interpret=True, max_k=2)
    k8, kind8 = sim8.plan()
    assert kind8 == "pallas_cpml_k" and k8 == 2
    st = sim8.run(sim8.init(), 2 * k8)
    path = tmp_path / "ck.npz"
    sim8.save(path, st, metadata={"note": "mesh-change resume"})

    sim4 = ShardedSimulation(grid=grid, coeffs=coeffs, sources=src,
                             cpml=cpml, mesh=make_mesh(4, ("x",)),
                             interpret=True, max_k=4)
    k4, kind4 = sim4.plan()
    assert kind4 == "pallas_cpml_k" and k4 == 4
    st4 = sim4.restore(path)
    st4 = sim4.run(st4, 2 * k4)
    got = sim4.gather(st4)
    assert int(got.tick) == 2 * k8 + 2 * k4

    ref_step = pallas_cpml_stepk_fn(
        shape, 2, inv_dx=(1.0, 1.0, 1.0), dt=grid.dt, constants=ft.REDUCED,
        cpml=cpml, max_sources=1, interpret=True,
    )
    ref = init_pml_kernel_state(shape, cpml=cpml)
    for _ in range((2 * k8 + 2 * k4) // 2):
        ref = ref_step(ref, coeffs, src)

    for name in ("ex", "ey", "ez", "hx", "hy", "hz"):
        np.testing.assert_allclose(
            np.asarray(getattr(got, name)), np.asarray(getattr(ref, name)),
            rtol=0, atol=1e-6, err_msg=name,
        )
    for i, (pr, pg) in enumerate(zip(ref.psi, got.psi)):
        np.testing.assert_allclose(
            np.asarray(pg), np.asarray(pr), rtol=0, atol=1e-6,
            err_msg=f"psi[{i}]",
        )


def test_lateral_dft_accumulators_ride_sharded_kernel():
    """DftProbe(axis=1/2) accumulators on a 1-D mesh keep the sharded
    K-step kernel plan (row captures + outside-kernel fold) and match the
    single-chip engine's per-tick accumulation — mixed with a flux
    accumulator in one run."""
    from fdtd_tpu.models.scattering import _BoxFluxAccumulator
    from fdtd_tpu.probes import DftProbe, FieldComponent
    from fdtd_tpu.solver.simulation import Simulation

    shape = (32, 32, 256)
    grid = _grid(shape)
    cpml = Cpml(thickness=((6, 6), (4, 4), (4, 4)))
    coeffs = _uniform_coeffs(grid)
    src = _src(grid, (15, 16, 128))
    probes = (
        DftProbe(frequencies=(0.02, 0.05), axis=1, index=14,
                 component=FieldComponent.E),
        DftProbe(frequencies=(0.02, 0.05), axis=2, index=120,
                 component=FieldComponent.H),
        _BoxFluxAccumulator(((8, 25), (8, 25), (64, 191)),
                            (1.0, 1.0, 1.0), grid.dt),
    )
    ssim = ShardedSimulation(grid=grid, coeffs=coeffs, sources=src,
                             cpml=cpml, mesh=make_mesh(2, ("x",)),
                             interpret=True, max_k=2)
    kk, kind = ssim.plan()
    assert kind == "pallas_cpml_k" and kk == 2
    n_steps = 16 * kk
    st, pr, finals = ssim.run(ssim.init(), n_steps, accumulators=probes)
    assert pr == ()

    sim = Simulation(grid=grid, coeffs=coeffs, sources=src, cpml=cpml,
                     backend="xla")
    st1 = sim.init()
    st1, _, ref = sim.run(st1, n_steps, accumulators=probes)

    for i in (0, 1):
        for ri in range(2):
            a, b = np.asarray(finals[i][ri]), np.asarray(ref[i][ri])
            assert a.shape == b.shape
            s = max(np.abs(b).max(), 1e-12)
            np.testing.assert_allclose(a / s, b / s, atol=5e-6,
                                       err_msg=f"probe {i} part {ri}")
            assert np.abs(b).max() > 0, (i, ri)
    fa, fb = float(finals[2]), float(ref[2])
    assert np.isfinite(fa) and abs(fb) > 1e-10
    assert abs(fa - fb) <= 1e-4 * abs(fb), (fa, fb)


def test_axis0_dft_and_boxdft_ride_sharded_kernel():
    """DftProbe(axis=0) and BoxDft accumulators on a 1-D mesh keep the
    sharded K-step kernel plan (runtime-coordinate in-kernel spectra +
    row captures) and match the single-chip engine's per-tick
    accumulation — the full multi-chip scattering-spectra workflow."""
    from fdtd_tpu.probes import BoxDft, DftProbe, FieldComponent
    from fdtd_tpu.solver.simulation import Simulation

    shape = (32, 32, 256)
    grid = _grid(shape)
    cpml = Cpml(thickness=((6, 6), (4, 4), (4, 4)))
    coeffs = _uniform_coeffs(grid)
    src = _src(grid, (15, 16, 128))
    probes = (
        DftProbe(frequencies=(0.02, 0.05), axis=0, index=10,
                 component=FieldComponent.E),
        DftProbe(frequencies=(0.02, 0.05), axis=0, index=24,
                 component=FieldComponent.H),
        BoxDft(box=((9, 24), (9, 24), (100, 155)),
               frequencies=(0.02, 0.05)),
    )
    ssim = ShardedSimulation(grid=grid, coeffs=coeffs, sources=src,
                             cpml=cpml, mesh=make_mesh(2, ("x",)),
                             interpret=True, max_k=2)
    kk, kind = ssim.plan()
    assert kind == "pallas_cpml_k" and kk == 2
    n_steps = 16 * kk
    st, pr, finals = ssim.run(ssim.init(), n_steps, accumulators=probes)
    assert pr == ()
    # the accumulator tail was stripped from the returned state
    assert st.ex.shape[0] > shape[0]  # still the extended sharded layout

    sim = Simulation(grid=grid, coeffs=coeffs, sources=src, cpml=cpml,
                     backend="xla")
    st1 = sim.init()
    st1, _, ref = sim.run(st1, n_steps, accumulators=probes)

    def cmp(a, b, msg):
        a, b = np.asarray(a), np.asarray(b)
        assert a.shape == b.shape, msg
        s = max(np.abs(b).max(), 1e-12)
        np.testing.assert_allclose(a / s, b / s, atol=5e-6, err_msg=msg)

    for i in (0, 1):  # axis-0 DftProbes: (re, im) pairs
        for ri in range(2):
            cmp(finals[i][ri], ref[i][ri], f"probe {i} part {ri}")
            assert np.abs(np.asarray(ref[i][ri])).max() > 0, (i, ri)
    # dft-ONLY accumulators (no flux/row mechanisms): the kernel step
    # returns the bare state and the spectra still come off the psi tail
    st_d, pr_d, only = ssim.run(ssim.init(), n_steps,
                                accumulators=probes[:2])
    assert pr_d == ()
    for i in (0, 1):
        for ri in range(2):
            np.testing.assert_array_equal(
                np.asarray(only[i][ri]), np.asarray(finals[i][ri]))

    # BoxDft: compare the finalized per-face spectra (x-faces' normal E
    # is left zero by design in the kernel reconstruction — same
    # comparison as the single-chip gate, test_farfield.py)
    got_box, ref_box = finals[2], ref[2]
    assert len(got_box) == len(ref_box) == 6
    for fi, (fk, fr) in enumerate(zip(got_box, ref_box)):
        for qi, (ak, ar) in enumerate(zip(fk, fr)):
            ak, ar = np.asarray(ak), np.asarray(ar)
            assert ak.shape == ar.shape, (fi, qi)
            if fi < 2 and qi < 2:
                np.testing.assert_allclose(ak[:, 0], 0.0, atol=0)
                cmp(ak[:, 1:], ar[:, 1:], f"BoxDft face {fi} q {qi}")
            else:
                cmp(ak, ar, f"BoxDft face {fi} q {qi}")
            assert np.abs(ar).max() > 0, (fi, qi)


def _dense_region(grid, cpml, axis=2):
    from fdtd_tpu.scene.shapes import Ball
    from fdtd_tpu.solver.pml_region import (
        dense_pml_from_depth,
        depth_from_contains,
    )

    ball = Ball(radius=5.0)
    center = np.array([16.0, 16.0, 128.0])
    box = ((10, 22), (10, 22), (122, 134))
    d_h, d_e = depth_from_contains(
        lambda p: ball.contains(p - center[:, None]), box, axis, +1
    )
    return dense_pml_from_depth(
        axis, box, d_h, d_e, spec=cpml.spec, dx=1.0, dt=grid.dt,
        constants=ft.REDUCED,
    )


def test_dense_pml_rides_sharded_kernel_and_matches_single_chip():
    """A volumetric interior absorber dispatches to the sharded kernel
    tier on a 1-D x mesh (auto tile-padded) and the gathered run matches
    the single-chip dense kernel bit-for-bit; gather() also round-trips
    the region psi (checkpoint layout parity)."""
    shape = (32, 32, 256)
    grid = _grid(shape)
    cpml = Cpml(thickness=((6, 6), (4, 4), (4, 4)))
    coeffs = _uniform_coeffs(grid)
    # source one cell from the region's live z face so the region psi
    # engages within the short interpret-mode run
    src = _src(grid, (15, 16, 120))
    mesh = make_mesh(2, ("x",))
    dense = _dense_region(grid, cpml)

    sim = ShardedSimulation(grid=grid, coeffs=coeffs, sources=src,
                            cpml=cpml, dense_pml=dense, mesh=mesh,
                            interpret=True, max_k=2)
    k, kind = sim.plan()
    assert kind == "pallas_cpml_k" and k == 2

    st = sim.init()
    st = sim.run(st, 6 * k)
    g = sim.gather(st)

    from fdtd_tpu.solver.pallas_cpml import init_pml_kernel_state
    from fdtd_tpu.solver.pallas_cpml_k import pallas_cpml_stepk_fn
    from fdtd_tpu.solver.pml_region import pad_dense_to_tiles

    dense_k = pad_dense_to_tiles(dense, shape)
    # jit to match ShardedSimulation's jitted step: on the CPU interpret
    # path XLA's fusion (FMA contraction at the source add) differs
    # between jitted and op-by-op execution by 1 ulp at the source cell
    one = jax.jit(pallas_cpml_stepk_fn(
        shape, k, inv_dx=(1.0, 1.0, 1.0), dt=grid.dt, constants=ft.REDUCED,
        cpml=cpml, max_sources=1, interpret=True, dense=dense_k))
    ref = init_pml_kernel_state(shape, cpml=cpml, dense=dense_k)
    for _ in range(6):
        ref = one(ref, coeffs, src)
    scale = float(jnp.abs(ref.ez).max())
    assert scale > 1e-6
    for c in range(3):
        np.testing.assert_allclose(np.asarray(g.e[c]), np.asarray(ref.e[c]),
                                   rtol=0, atol=0, err_msg=f"e[{c}]")
    # region psi (the dense tail entry) gathers to the single-chip layout
    assert len(g.psi) == len(ref.psi)
    dvol_g, dvol_r = np.asarray(g.psi[-1]), np.asarray(ref.psi[-1])
    assert dvol_g.shape == dvol_r.shape
    # trash plane is scratch on both sides; owned planes must bit-match
    np.testing.assert_array_equal(dvol_g[:, 1:], dvol_r[:, 1:])
    assert np.abs(dvol_r[:, 1:]).max() > 0  # region psi actually alive

    # restore() re-extends the gathered state and the run continues
    # identically to the uninterrupted sharded run
    st2 = sim.run(st, 2 * k)
    from fdtd_tpu.parallel.pallas_sharded_cpml import extend_pml_state

    re_ext = extend_pml_state(g, mesh, k, cpml=cpml, axis="x",
                              dense=sim._dense_kernel)
    st3 = sim.run(re_ext, 2 * k)
    for c in range(3):
        np.testing.assert_array_equal(np.asarray(sim.gather(st2).e[c]),
                                      np.asarray(sim.gather(st3).e[c]))


def test_dense_pml_rides_sharded_kernel_2d_mesh():
    """DensePml on a 2-D (x, y) mesh rides the kernel tier (round 3):
    the region widens to the full extended lateral span per shard with
    identity coefficients outside the real box, the region psi carries
    lateral halo columns (two-phase exchange), and the gathered run is
    bit-equal to the single-chip dense kernel. The region box straddles
    BOTH cuts and the source sits near the x cut."""
    shape = (32, 32, 256)
    grid = _grid(shape)
    cpml = Cpml(thickness=((6, 6), (4, 4), (4, 4)))
    coeffs = _uniform_coeffs(grid)
    src = _src(grid, (15, 16, 120))
    mesh = make_mesh(4, ("x", "y"))
    dense = _dense_region(grid, cpml)  # box (10,22)x(10,22): both cuts

    sim = ShardedSimulation(grid=grid, coeffs=coeffs, sources=src,
                            cpml=cpml, dense_pml=dense, mesh=mesh,
                            interpret=True, max_k=4)
    k, kind = sim.plan()
    assert kind == "pallas_cpml_k" and k == 4
    st = sim.init()
    st = sim.run(st, 3 * k)
    g = sim.gather(st)

    from fdtd_tpu.solver.pallas_cpml import init_pml_kernel_state
    from fdtd_tpu.solver.pallas_cpml_k import pallas_cpml_stepk_fn
    from fdtd_tpu.solver.pml_region import pad_dense_to_tiles

    dense_k = pad_dense_to_tiles(dense, shape)
    one = jax.jit(pallas_cpml_stepk_fn(
        shape, k, inv_dx=(1.0, 1.0, 1.0), dt=grid.dt, constants=ft.REDUCED,
        cpml=cpml, max_sources=1, interpret=True, dense=dense_k))
    ref = init_pml_kernel_state(shape, cpml=cpml, dense=dense_k)
    for _ in range(3):
        ref = one(ref, coeffs, src)
    assert float(jnp.abs(ref.ez).max()) > 1e-6
    # the 2-D build is a structurally different program from the
    # single-chip kernel (y_halo segments, runtime strip profiles), so
    # XLA's FMA contraction can differ by ~1 ulp near the source —
    # tolerance-equality like the other 2-D gates (a halo bug would
    # show O(field) errors at the cuts, not 1e-7-relative noise)
    for c in range(3):
        np.testing.assert_allclose(np.asarray(g.e[c]),
                                   np.asarray(ref.e[c]),
                                   rtol=0, atol=1e-6, err_msg=f"e[{c}]")
        np.testing.assert_allclose(np.asarray(g.h[c]),
                                   np.asarray(ref.h[c]),
                                   rtol=0, atol=1e-6, err_msg=f"h[{c}]")
    # region psi gathers to the single-chip layout and is alive
    dvol_g, dvol_r = np.asarray(g.psi[-1]), np.asarray(ref.psi[-1])
    assert dvol_g.shape == dvol_r.shape
    s = np.abs(dvol_r[:, 1:]).max()
    assert s > 0
    np.testing.assert_allclose(dvol_g[:, 1:] / s, dvol_r[:, 1:] / s,
                               rtol=0, atol=5e-6)


def test_dense_only_rides_sharded_kernel():
    """An interior absorber WITHOUT boundary CPML rides the sharded
    kernel tier: the dispatcher hosts the region in the CPML kernel with
    an empty absorber (best.py cpml_k — the multi-chip analog of
    solver.Simulation._cpml_or_empty), bit-equal to the single-chip
    empty-host kernel."""
    shape = (32, 32, 256)
    grid = _grid(shape)
    spec_donor = Cpml(thickness=((6, 6), (4, 4), (4, 4)))  # spec only
    coeffs = _uniform_coeffs(grid)
    src = _src(grid, (15, 16, 120))
    mesh = make_mesh(2, ("x",))
    dense = _dense_region(grid, spec_donor)

    sim = ShardedSimulation(grid=grid, coeffs=coeffs, sources=src,
                            dense_pml=dense, mesh=mesh,
                            interpret=True, max_k=2)
    k, kind = sim.plan()
    assert kind == "pallas_cpml_k" and k == 2

    st = sim.init()
    st = sim.run(st, 4 * k)
    g = sim.gather(st)

    from fdtd_tpu.solver.pallas_cpml import init_pml_kernel_state
    from fdtd_tpu.solver.pallas_cpml_k import pallas_cpml_stepk_fn
    from fdtd_tpu.solver.pml_region import pad_dense_to_tiles

    empty = Cpml(thickness=((0, 0), (0, 0), (0, 0)))
    dense_k = pad_dense_to_tiles(dense, shape)
    one = jax.jit(pallas_cpml_stepk_fn(
        shape, k, inv_dx=(1.0, 1.0, 1.0), dt=grid.dt, constants=ft.REDUCED,
        cpml=empty, max_sources=1, interpret=True, dense=dense_k))
    ref = init_pml_kernel_state(shape, cpml=empty, dense=dense_k)
    for _ in range(4):
        ref = one(ref, coeffs, src)
    assert float(jnp.abs(ref.ez).max()) > 1e-6
    for c in range(3):
        np.testing.assert_array_equal(np.asarray(g.e[c]),
                                      np.asarray(ref.e[c]))
        np.testing.assert_array_equal(np.asarray(g.h[c]),
                                      np.asarray(ref.h[c]))
    # the region psi is alive (the absorber engaged, not a free-space run)
    assert np.abs(np.asarray(g.psi[-1][:, 1:])).max() > 0


def test_tfsf_only_rides_sharded_kernel():
    """Slab TF/SF without boundary CPML rides the sharded kernel tier
    via the same empty-absorber host, bit-equal to the single-chip
    kernel."""
    shape = (32, 32, 256)
    grid = _grid(shape)
    coeffs = _uniform_coeffs(grid)
    src = _src(grid, (15, 16, 120))
    mesh = make_mesh(2, ("x",))
    tfsf = Tfsf(span=(10, 25),
                waveform=ft.GaussianPulse(6 * grid.dt, 2 * grid.dt))

    sim = ShardedSimulation(grid=grid, coeffs=coeffs, sources=src,
                            tfsf=tfsf, mesh=mesh, interpret=True, max_k=2)
    k, kind = sim.plan()
    assert kind == "pallas_cpml_k" and k == 2

    st = sim.init()
    st = sim.run(st, 4 * k)
    g = sim.gather(st)

    from fdtd_tpu.solver.pallas_cpml import init_pml_kernel_state
    from fdtd_tpu.solver.pallas_cpml_k import pallas_cpml_stepk_fn

    empty = Cpml(thickness=((0, 0), (0, 0), (0, 0)))
    one = jax.jit(pallas_cpml_stepk_fn(
        shape, k, inv_dx=(1.0, 1.0, 1.0), dt=grid.dt, constants=ft.REDUCED,
        cpml=empty, tfsf=tfsf, max_sources=1, interpret=True))
    ref = init_pml_kernel_state(shape, cpml=empty, tfsf=tfsf)
    for _ in range(4):
        ref = one(ref, coeffs, src)
    assert float(jnp.abs(ref.ez).max()) > 1e-6
    for c in range(3):
        np.testing.assert_array_equal(np.asarray(g.e[c]),
                                      np.asarray(ref.e[c]))
        np.testing.assert_array_equal(np.asarray(g.h[c]),
                                      np.asarray(ref.h[c]))


def test_accumulators_ride_sharded_kernel_2d_mesh():
    """Flux + lateral DftProbe accumulators on a 2-D (x, y) mesh keep
    the sharded K-step kernel plan (runtime lateral coordinates +
    owned-window reductions, round 3) and match the single-chip engine's
    per-tick accumulation — probes on BOTH y-shards, source one column
    from the y cut."""
    from fdtd_tpu.models.scattering import _BoxFluxAccumulator
    from fdtd_tpu.probes import DftProbe, FieldComponent
    from fdtd_tpu.solver.simulation import Simulation

    shape = (32, 48, 256)
    grid = _grid(shape)
    cpml = Cpml(thickness=((6, 6), (4, 4), (4, 4)))
    coeffs = _uniform_coeffs(grid)
    src = _src(grid, (15, 23, 128))
    probes = (
        DftProbe(frequencies=(0.02, 0.05), axis=1, index=14,
                 component=FieldComponent.E),   # owned by y-shard 0
        DftProbe(frequencies=(0.02, 0.05), axis=1, index=30,
                 component=FieldComponent.H),   # owned by y-shard 1
        DftProbe(frequencies=(0.02, 0.05), axis=2, index=120,
                 component=FieldComponent.E),   # spans the cut y dim
        _BoxFluxAccumulator(((8, 25), (8, 39), (64, 191)),
                            (1.0, 1.0, 1.0), grid.dt),
    )
    ssim = ShardedSimulation(grid=grid, coeffs=coeffs, sources=src,
                             cpml=cpml, mesh=make_mesh(4, ("x", "y")),
                             interpret=True, max_k=4)
    kk, kind = ssim.plan()
    assert kind == "pallas_cpml_k" and kk == 4
    n_steps = 8 * kk
    st, pr, finals = ssim.run(ssim.init(), n_steps, accumulators=probes)
    assert pr == ()

    sim = Simulation(grid=grid, coeffs=coeffs, sources=src, cpml=cpml,
                     backend="xla")
    st1 = sim.init()
    st1, _, ref = sim.run(st1, n_steps, accumulators=probes)

    for i in (0, 1, 2):
        for ri in range(2):
            a, b = np.asarray(finals[i][ri]), np.asarray(ref[i][ri])
            assert a.shape == b.shape
            s = max(np.abs(b).max(), 1e-12)
            np.testing.assert_allclose(a / s, b / s, atol=5e-6,
                                       err_msg=f"probe {i} part {ri}")
            assert np.abs(b).max() > 0, (i, ri)
    fa, fb = float(finals[3]), float(ref[3])
    assert np.isfinite(fa) and abs(fb) > 1e-10
    assert abs(fa - fb) <= 1e-4 * abs(fb), (fa, fb)

    # in-kernel x-plane spectra ride 2-D meshes too: the per-shard
    # accumulator block spans the extended lateral plane and extraction
    # concatenates the owned windows over the y-shards
    ax0 = (DftProbe(frequencies=(0.02, 0.05), axis=0, index=10,
                    component=FieldComponent.E),)
    _, _, (got0,) = ssim.run(ssim.init(), n_steps, accumulators=ax0)
    st0 = sim.init()
    _, _, (ref0,) = sim.run(st0, n_steps, accumulators=ax0)
    for ri in range(2):
        a, b = np.asarray(got0[ri]), np.asarray(ref0[ri])
        assert a.shape == b.shape
        s = max(np.abs(b).max(), 1e-12)
        np.testing.assert_allclose(a / s, b / s, atol=5e-6,
                                   err_msg=f"axis-0 2-D part {ri}")
        assert np.abs(b).max() > 0, ri


def test_boxdft_rides_sharded_kernel_2d_mesh():
    """BoxDft (NTFF scattering surface spectra: x-plane accumulator
    volumes + lateral row captures in one kernel build) keeps the
    sharded kernel plan on a 2-D (x, y) mesh and matches the
    single-chip engine — BASELINE config-3 x config-5 composition."""
    from fdtd_tpu.probes import BoxDft
    from fdtd_tpu.solver.simulation import Simulation

    shape = (32, 48, 256)
    grid = _grid(shape)
    cpml = Cpml(thickness=((6, 6), (4, 4), (4, 4)))
    coeffs = _uniform_coeffs(grid)
    src = _src(grid, (15, 23, 128))
    probes = (BoxDft(box=((9, 24), (9, 40), (100, 155)),
                     frequencies=(0.02, 0.05)),)
    ssim = ShardedSimulation(grid=grid, coeffs=coeffs, sources=src,
                             cpml=cpml, mesh=make_mesh(4, ("x", "y")),
                             interpret=True, max_k=4)
    kk, kind = ssim.plan()
    assert kind == "pallas_cpml_k" and kk == 4
    n_steps = 8 * kk
    st, pr, (got_box,) = ssim.run(ssim.init(), n_steps,
                                  accumulators=probes)
    assert pr == ()

    sim = Simulation(grid=grid, coeffs=coeffs, sources=src, cpml=cpml,
                     backend="xla")
    st1 = sim.init()
    st1, _, (ref_box,) = sim.run(st1, n_steps, accumulators=probes)

    def cmp(a, b, msg):
        a, b = np.asarray(a), np.asarray(b)
        assert a.shape == b.shape, msg
        s = max(np.abs(b).max(), 1e-12)
        np.testing.assert_allclose(a / s, b / s, atol=5e-6, err_msg=msg)

    assert len(got_box) == len(ref_box) == 6
    for fi, (fk, fr) in enumerate(zip(got_box, ref_box)):
        for qi, (ak, ar) in enumerate(zip(fk, fr)):
            ak, ar = np.asarray(ak), np.asarray(ar)
            assert ak.shape == ar.shape, (fi, qi)
            if fi < 2 and qi < 2:
                # x-faces' normal E is left zero by design in the
                # kernel reconstruction (same as the single-chip gate)
                np.testing.assert_allclose(ak[:, 0], 0.0, atol=0)
                cmp(ak[:, 1:], ar[:, 1:], f"BoxDft face {fi} q {qi}")
            else:
                cmp(ak, ar, f"BoxDft face {fi} q {qi}")
            assert np.abs(ar).max() > 0, (fi, qi)


def test_probes_and_checkpoint_on_2d_mesh(tmp_path):
    """Device-side probe sampling and checkpoint/resume across a mesh
    CHANGE (2-D 2x2 with DensePml -> 1-D 2-shard) — exercises the 2-D
    owned-window global view and the 2-D dense extend/collapse round
    trips."""
    from fdtd_tpu.probes import FieldComponent, PointProbe, SliceProbe

    shape = (32, 32, 256)
    grid = _grid(shape)
    cpml = Cpml(thickness=((6, 6), (4, 4), (4, 4)))
    coeffs = _uniform_coeffs(grid)
    src = _src(grid, (15, 16, 120))
    dense = _dense_region(grid, cpml)
    probes = (PointProbe(points=((15, 16, 120), (20, 8, 64))),
              SliceProbe(axis=1, index=17, component=FieldComponent.E))

    sim = ShardedSimulation(grid=grid, coeffs=coeffs, sources=src,
                            cpml=cpml, dense_pml=dense,
                            mesh=make_mesh(4, ("x", "y")),
                            interpret=True, max_k=4)
    k, kind = sim.plan()
    assert kind == "pallas_cpml_k" and k == 4
    st, stacks = sim.run(sim.init(), 2 * k, probes=probes, probe_every=k)
    assert stacks[0].shape == (2, 2, 3)
    assert stacks[1].shape == (2, 3, 32, 256)
    g = sim.gather(st)
    np.testing.assert_allclose(
        np.asarray(stacks[0][-1]),
        np.asarray(probes[0].sample(g, grid.dt)), atol=0)
    np.testing.assert_allclose(
        np.asarray(stacks[1][-1]),
        np.asarray(probes[1].sample(g, grid.dt)), atol=0)

    # checkpoint on the 2-D mesh, resume on a 1-D mesh (different K)
    path = tmp_path / "ck2d.npz"
    sim.save(path, st)
    sim1 = ShardedSimulation(grid=grid, coeffs=coeffs, sources=src,
                             cpml=cpml, dense_pml=dense,
                             mesh=make_mesh(2, ("x",)),
                             interpret=True, max_k=2)
    k1, kind1 = sim1.plan()
    assert kind1 == "pallas_cpml_k" and k1 == 2
    st1 = sim1.restore(path)
    st1 = sim1.run(st1, 2 * k1)
    got = sim1.gather(st1)
    # uninterrupted 2-D run to the same tick
    st2 = sim.run(st, 2 * k1)
    ref = sim.gather(st2)
    assert int(got.tick) == int(ref.tick) == 2 * k + 2 * k1
    for name in ("ex", "ey", "ez", "hx", "hy", "hz"):
        np.testing.assert_allclose(
            np.asarray(getattr(got, name)), np.asarray(getattr(ref, name)),
            rtol=0, atol=1e-6, err_msg=name)
    s = np.abs(np.asarray(ref.psi[-1])[:, 1:]).max()
    assert s > 0
    np.testing.assert_allclose(
        np.asarray(got.psi[-1])[:, 1:] / s,
        np.asarray(ref.psi[-1])[:, 1:] / s, rtol=0, atol=5e-6)


def test_scaled_1024_absorbing_virtual_mesh():
    """Stand-in for the >=2-chip 1024^3 absorbing run that a single
    16 GB chip provably cannot host (bench.py::_print_1024_cpml_budget:
    fields+psi exceed HBM even fully aliased, and the single-pass VMEM
    pipeline needs ~210 MiB at full-lateral 1024^2 planes vs 128 MiB).

    The sharded tier carries it by cutting the FULL 1024 x extent over
    the mesh — per-shard planes halve both budgets per doubling. This
    runs exactly that decomposition on an 8-device virtual mesh at the
    laterally-scaled shape (1024, 64, 128): the real x extent (the
    dimension the capability claim is about: full-depth 10-cell CPML at
    both x ends, per-shard slab ownership, halo exchange across all 7
    cuts) with lateral dims shrunk to CPU-test scale, and checks the
    gathered result against the single-device engine."""
    shape = (1024, 64, 128)
    grid = _grid(shape)
    cpml = Cpml(thickness=((10, 10), (10, 10), (10, 10)))
    coeffs = _uniform_coeffs(grid)
    src = _src(grid, (512, 32, 64))
    mesh = make_mesh(8, ("x",))

    ssim = ShardedSimulation(grid=grid, coeffs=coeffs, sources=src,
                             cpml=cpml, mesh=mesh)
    k, kind = ssim.plan()
    assert kind == "xla_engine" and k == 1  # CPU host: sharded XLA engine
    st = ssim.init()
    n_steps = 6
    st = ssim.run(st, n_steps)
    g = ssim.gather(st)
    assert int(g.tick) == n_steps

    from fdtd_tpu.solver.simulation import Simulation

    ref_sim = Simulation(grid=grid, coeffs=coeffs, sources=src, cpml=cpml,
                         backend="xla")
    ref = ref_sim.init()
    ref, _, _ = ref_sim.run(ref, n_steps)

    scale = float(np.abs(np.asarray(ref.ez)).max())
    assert scale > 1e-9  # the pulse actually propagated
    for name in ("ex", "ey", "ez", "hx", "hy", "hz"):
        np.testing.assert_allclose(
            np.asarray(getattr(g, name)), np.asarray(getattr(ref, name)),
            rtol=0, atol=1e-6 * scale, err_msg=name)
