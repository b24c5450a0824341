"""bf16-storage error study for absorbing (CPML) runs.

ROADMAP item "bf16 storage for absorbing runs": psi is an IIR recurrence,
so blindly storing it in bf16 needed an error study before enabling. The
study emulates storage precision exactly the way the kernels realize it —
all arithmetic in f32, with fields (and optionally psi) ROUNDED to
bf16 at every tick boundary. That is conservative for the K-step kernel,
which keeps fields in f32 VMEM for K ticks and rounds only on HBM
write-back.

Measured (40^3, 8-cell CPML all sides, center dipole, 250 steps, vs f64):

    f32 fields / f32 psi        ~1e-7   rel-L2(E)
    bf16 fields / f32 psi       ~1e-2   rel-L2(E)
    bf16 fields / bf16 psi      ~1e-2   rel-L2(E)  (psi rounding adds <2x)

Conclusion (recorded in docs/ARCHITECTURE.md): bf16 storage costs ~1% —
in line with the bf16 free-space mode already shipped — and psi precision
is NOT the driver; fields-in-bf16 / psi-in-f32 is the shipped kernel mode
(psi slabs are ~thickness/nx of the volume, so keeping them f32 costs
little memory while removing the IIR-recurrence risk entirely).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import fdtd_tpu as ft
from fdtd_tpu.solver.boundary import BoundaryConditions
from fdtd_tpu.solver.cpml import Cpml
from fdtd_tpu.solver.engine import build_step, init_engine_state

SHAPE = (40, 40, 40)
STEPS = 250


def _setup(dtype):
    res = ft.Resolution.courant(1.0, ft.REDUCED, safety=0.9)
    cpml = Cpml(thickness=((8, 8), (8, 8), (8, 8)))
    dt = res.temporal
    step = build_step(
        SHAPE,
        inv_dx=tuple(1.0 / s for s in res.spatial),
        dt=dt,
        bc=BoundaryConditions(),
        constants=ft.REDUCED,
        dtype=dtype,
        cpml=cpml,
    )
    table = ft.coefficient_table([ft.VACUUM], res, ft.REDUCED)
    coeffs = ft.CellCoefficients.uniform(table[0], dtype)
    src = ft.SourceSet.build(
        [ft.PointSource((20, 20, 20), ft.GaussianPulse(20 * dt, 6 * dt),
                        j=(0, 0, 1.0))],
        dtype=dtype,
    )
    state = init_engine_state(SHAPE, dtype, cpml=cpml)
    return step, state, coeffs, src


def _round_tree(tree, dtype):
    return jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, dtype).astype(a.dtype)
        if jnp.issubdtype(a.dtype, jnp.floating) else a,
        tree,
    )


def _run(dtype, round_fields=None, round_psi=None):
    step, state, coeffs, src = _setup(dtype)

    @jax.jit
    def advance(s):
        s = step(s, coeffs, src)
        if round_fields is not None:
            s = s._replace(**{
                k: jnp.asarray(getattr(s, k), round_fields).astype(dtype)
                for k in ("ex", "ey", "ez", "hx", "hy", "hz")
            })
        if round_psi is not None:
            s = s._replace(
                psi_h=_round_tree(s.psi_h, round_psi),
                psi_e=_round_tree(s.psi_e, round_psi),
            )
        return s

    for _ in range(STEPS):
        state = advance(state)
    e = np.stack([np.asarray(state.ex, np.float64),
                  np.asarray(state.ey, np.float64),
                  np.asarray(state.ez, np.float64)])
    return e


def test_bf16_storage_error_study():
    truth = _run(jnp.float64)
    scale = np.linalg.norm(truth)
    assert scale > 0

    def rel(e):
        return np.linalg.norm(e - truth) / scale

    err_f32 = rel(_run(jnp.float32))
    err_bf16_fields = rel(_run(jnp.float32, round_fields=jnp.bfloat16))
    err_bf16_all = rel(_run(jnp.float32, round_fields=jnp.bfloat16,
                            round_psi=jnp.bfloat16))

    print(f"\nbf16 CPML study: f32={err_f32:.3e} "
          f"bf16-fields/f32-psi={err_bf16_fields:.3e} "
          f"bf16-fields/bf16-psi={err_bf16_all:.3e}")

    assert err_f32 < 1e-5
    # bf16 storage: a few % — same class as the shipped free-space bf16 mode
    assert err_bf16_fields < 0.05
    # psi rounding must not blow up the IIR recurrence
    assert err_bf16_all < 3 * max(err_bf16_fields, 1e-3)
