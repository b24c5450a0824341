"""z-cut meshes on the kernel tier via cyclic lattice rotation
(parallel/rotation.py + ShardedSimulation.rotate_zcut).

Meshes that cut lattice z used to fall back to the XLA engine wholesale
(parallel/best.py fallback list). The rotation runs the existing x/(x, y)
kernels in a cyclically-relabeled lattice frame; because a cyclic axis
permutation is a proper rotation, every cell computes identical f32
arithmetic in a transposed layout. Gates: the rotated z-cut run is
BIT-equal to the same kernel on an equivalent x-cut mesh, matches the
single-chip reference, and probes/guards behave in the caller's
(lattice) frame."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

import fdtd_tpu as ft
from fdtd_tpu.parallel import make_mesh
from fdtd_tpu.parallel.rotation import zcut_rotation
from fdtd_tpu.parallel.simulation import ShardedSimulation
from fdtd_tpu.probes.probes import PointProbe
from fdtd_tpu.solver.cpml import Cpml


def _grid(shape):
    return ft.Grid(shape=shape,
                   resolution=ft.Resolution.courant(1.0, ft.REDUCED,
                                                    safety=0.9),
                   constants=ft.REDUCED)


def _uniform_coeffs(grid):
    table = ft.coefficient_table([ft.VACUUM], grid.resolution, ft.REDUCED)
    return ft.CellCoefficients.uniform(table[0], jnp.float32)


def _src(grid, cell, j=(0.0, 0.0, 1.0)):
    return ft.SourceSet.build([ft.PointSource(
        cell, ft.GaussianPulse(4 * grid.dt, 2 * grid.dt), j=j)])


def _mesh3(nx, ny, nz):
    """A 3-name mesh whose axes cut lattice dims positionally."""
    dev = np.asarray(jax.devices()[: nx * ny * nz]).reshape(nx, ny, nz)
    return Mesh(dev, ("x", "y", "z"))


def test_zcut_rotation_selection():
    assert zcut_rotation(_mesh3(1, 1, 2)) == (2, 0, 1)
    assert zcut_rotation(_mesh3(2, 1, 2)) == (2, 0, 1)
    assert zcut_rotation(_mesh3(1, 2, 2)) == (1, 2, 0)
    # no z cut: nothing to rotate
    assert zcut_rotation(_mesh3(2, 2, 1)) is None
    assert zcut_rotation(make_mesh(2, ("x",))) is None
    # all three cut: the kernel takes at most two
    assert zcut_rotation(_mesh3(2, 2, 2)) is None


def test_zcut_cpml_bit_equal_to_xcut_and_matches_single_chip():
    # lattice (32, 256, 32); the z cut rotates (perm (2,0,1)) onto the
    # 1-D x kernel with rotated shape (32, 32, 256)
    shape = (32, 256, 32)
    grid = _grid(shape)
    cpml = Cpml(thickness=((4, 4), (4, 4), (6, 6)))
    coeffs = _uniform_coeffs(grid)
    src = _src(grid, (16, 128, 15), j=(0.0, 0.0, 1.0))

    zsim = ShardedSimulation(grid=grid, coeffs=coeffs, sources=src,
                             cpml=cpml, mesh=_mesh3(1, 1, 2),
                             interpret=True, max_k=2)
    k, kind = zsim.plan()
    assert kind == "pallas_cpml_k" and k == 2
    assert zsim._rotation is not None

    st = zsim.run(zsim.init(), 3 * k)
    g = zsim.gather(st)
    assert int(g.tick) == 3 * k

    # the same physics on the ROTATED lattice under a plain x-cut mesh
    # runs the identical kernel — bit-equality is the rotation gate
    rshape = (shape[2], shape[0], shape[1])
    rgrid = _grid(rshape)
    rcpml = Cpml(thickness=((6, 6), (4, 4), (4, 4)))
    rsrc = _src(rgrid, (15, 16, 128), j=(1.0, 0.0, 0.0))
    xsim = ShardedSimulation(grid=rgrid, coeffs=_uniform_coeffs(rgrid),
                             sources=rsrc, cpml=rcpml,
                             mesh=make_mesh(2, ("x",)),
                             interpret=True, max_k=2)
    assert xsim.plan() == (k, kind)
    rg = xsim.gather(xsim.run(xsim.init(), 3 * k))

    # lattice ez is rotated ex transposed back; compare the whole state
    inv = (1, 2, 0)  # inverse of (2, 0, 1)
    scale = float(jnp.abs(g.ez).max())
    assert scale > 1e-6
    for lc, name in ((0, "ex"), (1, "ey"), (2, "ez")):
        rc = "xyz"[inv[lc]]
        np.testing.assert_array_equal(
            np.asarray(getattr(g, name)),
            np.asarray(np.transpose(rg.e["xyz".index(rc)], inv)),
            err_msg=name)

    # and against the single-chip kernel reference
    from fdtd_tpu.solver.pallas_cpml import init_pml_kernel_state
    from fdtd_tpu.solver.pallas_cpml_k import pallas_cpml_stepk_fn

    one = pallas_cpml_stepk_fn(
        rshape, k, inv_dx=(1.0, 1.0, 1.0), dt=rgrid.dt,
        constants=ft.REDUCED, cpml=rcpml, max_sources=1, interpret=True)
    ref = init_pml_kernel_state(rshape, cpml=rcpml)
    for _ in range(3):
        ref = one(ref, _uniform_coeffs(rgrid), rsrc)
    np.testing.assert_allclose(
        np.asarray(g.ez), np.asarray(np.transpose(ref.e[0], inv)),
        rtol=0, atol=1e-6)


def test_zcut_2d_free_space_with_probes():
    # mesh (2, 1, 2) cuts lattice x and z -> rotated 2-D ("x","y") kernel.
    # Rotated (32, 24, 128): nly = 12, so ny_ext = 12 + 2k = 16 keeps the
    # (8, 128) sublane tiling (pallas_step.supports on the EXTENDED shape)
    shape = (24, 128, 32)
    grid = _grid(shape)
    coeffs = _uniform_coeffs(grid)
    src = _src(grid, (8, 64, 15), j=(0.0, 1.0, 0.0))
    sim = ShardedSimulation(grid=grid, coeffs=coeffs, sources=src,
                            mesh=_mesh3(2, 1, 2), interpret=True, max_k=2)
    k, kind = sim.plan()
    assert kind == "pallas_k"
    assert sim._rotation is not None

    cell = (8, 64, 16)
    probe = PointProbe(points=(cell,))
    st, (trace,) = sim.run(sim.init(), 2 * k, probes=(probe,),
                           probe_every=k)
    g = sim.gather(st)
    assert trace.shape == (2, 1, 3)
    # the probe sampled lattice-frame coordinates/components: the final
    # sample equals the gathered lattice-frame E vector at that cell
    want = np.stack([np.asarray(getattr(g, "e" + c)[cell])
                     for c in "xyz"])
    np.testing.assert_array_equal(np.asarray(trace[-1, 0]), want)
    assert np.abs(np.asarray(g.ey)).max() > 1e-9


def test_zcut_guards_and_opt_out():
    shape = (16, 128, 16)  # rotated (16, 16, 128) keeps the lane tiling
    grid = _grid(shape)
    coeffs = _uniform_coeffs(grid)
    src = _src(grid, (8, 64, 8))
    # lattice-y thickness 0: the rotated z strips would need
    # pad128(lo)+pad128(hi+1) <= rotated nz (supports_cpml), and rotated
    # nz is lattice ny = 128 here
    cpml = Cpml(thickness=((2, 2), (0, 0), (2, 2)))
    mesh = _mesh3(1, 1, 2)

    sim = ShardedSimulation(grid=grid, coeffs=coeffs, sources=src,
                            cpml=cpml, mesh=mesh, interpret=True, max_k=2)
    assert sim._rotation is not None
    st = sim.init()
    with pytest.raises(ValueError, match="rotate_zcut=False"):
        sim.run(st, 2, accumulators=(object(),))

    # opting out pins the mesh to the engine, unrotated
    esim = dataclasses.replace(sim, rotate_zcut=False)
    assert esim._rotation is None
    _, ekind = esim.plan()
    assert ekind == "xla_engine"
    est = esim.run(esim.init(), 2)
    eg = esim.gather(est)
    assert np.all(np.isfinite(np.asarray(eg.ez)))


def test_zcut_dense_pml_bit_equal_to_xcut():
    # a volumetric DensePml region rides the rotated z-cut kernel plan
    # (rotation.rotate_dense): bit-equal vs the same physics on the
    # rotated lattice under a plain x-cut mesh
    from fdtd_tpu.parallel.rotation import rotate_dense
    from fdtd_tpu.scene.shapes import Ball
    from fdtd_tpu.solver.pml_region import (
        dense_pml_from_depth,
        depth_from_contains,
    )

    shape = (16, 256, 32)
    grid = _grid(shape)
    cpml = Cpml(thickness=((2, 2), (0, 0), (2, 2)))
    coeffs = _uniform_coeffs(grid)
    src = _src(grid, (8, 128, 16))

    ball = Ball(radius=4.0)
    ctr = np.array([[8.0], [110.0], [16.0]])
    dbox = ((4, 13), (100, 120), (10, 22))
    dh, de = depth_from_contains(
        lambda p: ball.contains(p - ctr), dbox, 1, +1
    )
    dense = dense_pml_from_depth(
        1, dbox, dh, de, spec=cpml.spec, dx=1.0, dt=grid.dt,
        constants=ft.REDUCED,
    )

    zsim = ShardedSimulation(grid=grid, coeffs=coeffs, sources=src,
                             cpml=cpml, dense_pml=dense,
                             mesh=_mesh3(1, 1, 2), interpret=True,
                             max_k=2)
    k, kind = zsim.plan()
    assert kind == "pallas_cpml_k" and zsim._rotation is not None
    g = zsim.gather(zsim.run(zsim.init(), 2 * k))

    perm = (2, 0, 1)
    rshape = (shape[2], shape[0], shape[1])
    rgrid = _grid(rshape)
    xsim = ShardedSimulation(
        grid=rgrid, coeffs=_uniform_coeffs(rgrid),
        sources=_src(rgrid, (16, 8, 128), j=(1.0, 0.0, 0.0)),
        cpml=Cpml(thickness=((2, 2), (2, 2), (0, 0))),
        dense_pml=rotate_dense(dense, perm),
        mesh=make_mesh(2, ("x",)), interpret=True, max_k=2)
    assert xsim.plan() == (k, kind)
    rg = xsim.gather(xsim.run(xsim.init(), 2 * k))

    # bit-equality through the rotation (transpose + component relabel)
    inv = (1, 2, 0)
    for c, name in enumerate(("ex", "ey", "ez")):
        r_name = "exyz"[1 + inv[c]] if False else "e" + "xyz"[inv[c]]
        np.testing.assert_array_equal(
            np.asarray(getattr(g, name)),
            np.transpose(np.asarray(getattr(rg, r_name)), inv),
            err_msg=name,
        )
    assert float(np.abs(np.asarray(g.ez)).max()) > 0


def test_zcut_checkpoint_roundtrip(tmp_path):
    # save on a rotated plan writes the LATTICE-frame plain layout
    # (fields + boundary psi through convert_pml_psi); restoring and
    # continuing is bit-equal to the uninterrupted run
    shape = (16, 256, 32)
    grid = _grid(shape)
    cpml = Cpml(thickness=((2, 2), (3, 3), (2, 2)))
    coeffs = _uniform_coeffs(grid)
    src = _src(grid, (8, 128, 16))
    sim = ShardedSimulation(grid=grid, coeffs=coeffs, sources=src,
                            cpml=cpml, mesh=_mesh3(1, 1, 2),
                            interpret=True, max_k=2)
    k, kind = sim.plan()
    assert kind == "pallas_cpml_k" and sim._rotation is not None

    st = sim.run(sim.init(), 2 * k)
    path = str(tmp_path / "rot.ckpt")
    sim.save(path, st, metadata={"note": "rotated"})

    st2 = sim.restore(path)
    got = sim.gather(sim.run(st2, 2 * k))
    ref = sim.gather(sim.run(st, 2 * k))
    for name in ("ex", "ey", "ez", "hx", "hy", "hz"):
        np.testing.assert_array_equal(
            np.asarray(getattr(got, name)),
            np.asarray(getattr(ref, name)), err_msg=name)
    assert int(got.tick) == 4 * k
    assert float(np.abs(np.asarray(ref.ez)).max()) > 0
