"""Sharded IN-KERNEL CPML: K absorbing leapfrog ticks per pass per chip.

Closes the multi-chip absorbing-throughput cliff: before this module,
multi-chip CPML runs routed through the composed XLA engine
(sharded_engine.py, exact but ~1.9 Gcell/s/chip); the single-chip CPML
kernels run 10-20x faster. This wrapper runs solver/pallas_cpml_k.py's
temporally-blocked CPML kernel PER SHARD under a 1-D x domain
decomposition (the FDTD analog of the reference's planned multi-GPU
split; halo mechanics correspond to the stencil reach of
cem-solver/src/fdtd/wgpu/update.wgsl:155-177).

Composition recipe (the extended-halo persistent state of
parallel/pallas_sharded_k.py, plus two CPML-specific pieces):

1. Fields AND y/z psi strips carry K halo planes per side
   (layout [halo_lo(K) | owned(nl) | halo_hi(K)] along x, per shard);
   each pass refreshes halos with one ppermute phase, then the exactness
   argument of pallas_sharded_k.py applies verbatim — level-K outputs are
   exact on the owned region, halo outputs are garbage overwritten by the
   next refresh. y/z psi rides along because its recurrence is plane-local
   in x: psi level k at plane q needs only level k-1 psi at q and the
   level-k derivative at q.
2. x-axis psi slabs DON'T need halo exchange: their live region is
   constrained to lie >= K planes inside the first/last shard's owned
   region (supports_sharded_cpml), so no shard's halo recompute ever
   touches live x-psi. Every shard carries identically-shaped slab
   tensors (uniform SPMD shapes); PER-SHARD x profile rows — a runtime
   operand instead of the single-chip kernel's baked SMEM table — are
   zero outside the shard's live PML planes, which forces psi = 0
   everywhere else (the kernel's trash-plane invariant, applied to whole
   shards).
3. Global Neumann edge masks move per shard via the same runtime edges
   operand as the fused sharded kernel (sentinels off the grid disable
   them on interior shards).

J point sources inject in-kernel at every level in extended coordinates
WITHOUT clipping, so sources within K planes of a shard boundary also
land in the neighbor's halo copy — required for the redundant recompute
to agree. TF/SF and compressed materials stay on the sharded XLA engine
for now (documented in docs/ROADMAP.md).

Equivalence vs the single-device CPML K kernel is gated in interpret mode
on the 8-device CPU mesh (tests/test_sharded_cpml.py).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..constants import SI, PhysicalConstants
from ..solver.boundary import BoundaryConditions
from ..solver.engine import _slab_extents
from ..solver.pallas_cpml import PmlKernelState, _psi_layout
from ..solver.pallas_cpml_k import _build_call, supports_cpml_k

__all__ = [
    "supports_sharded_cpml",
    "init_sharded_pml_state",
    "extend_pml_state",
    "collapse_pml_state",
    "make_pallas_sharded_cpml_stepk",
]

_FIELDS = ("ex", "ey", "ez", "hx", "hy", "hz")


def supports_sharded_cpml(
    shape, n_dev: int, bc, cpml, k: int, dtype=jnp.float32
) -> bool:
    """True when the sharded in-kernel CPML path supports this config.

    Beyond the per-shard kernel's own requirements, the x-PML slabs (plus
    the E-half's one-plane inward reach) must end >= k planes inside the
    first/last shard's owned region, so halo recompute never overlaps
    live x-psi owned by a neighbor."""
    nx, ny, nz = shape
    if nx % n_dev != 0:
        return False
    nl = nx // n_dev
    nle = nl + 2 * k
    if not supports_cpml_k((nle, ny, nz), bc, cpml, k, dtype):
        return False
    lo, hi = cpml.thickness[0]
    for half in (False, True):
        (l0, l1), (h0, h1) = _slab_extents(nx, lo, hi, half)
        if l1 > nl - k:
            return False
        if h1 > h0 and (nx - h0) > nl - k:
            return False
    return True


def _xprof_sharded(nx, nl, k, n_dev, cpml, inv_dx, dt, constants):
    """(n_dev, 2, 5, nle) per-shard x profile rows in extended coordinates.

    Row layout matches solver/pallas_cpml._profiles' x entry:
    [1/kappa, b*lo_gate, c*lo_gate, b*hi_gate, c*hi_gate]. Planes outside
    the global grid or outside the PML slabs get the identity row
    (ik=1, b=c=0), which makes the kernel's stretch a no-op and keeps
    psi = 0 there."""
    from ..solver.cpml import _profiles_1d

    lo, hi = cpml.thickness[0]
    dx = 1.0 / inv_dx[0]
    nle = nl + 2 * k
    out = np.zeros((n_dev, 2, 5, nle), np.float32)
    out[:, :, 0, :] = 1.0
    for hi_i, half in enumerate(("h", "e")):
        ik, b, c = _profiles_1d(
            nx, lo, hi, cpml.spec, dx, dt, constants, half == "e"
        )
        (l0, l1), (h0, h1) = _slab_extents(nx, lo, hi, half == "e")
        in_lo = np.zeros(nx)
        in_lo[l0:l1] = 1.0
        in_hi = np.zeros(nx)
        in_hi[h0:h1] = 1.0
        rows = np.stack(
            [ik, b * in_lo, c * in_lo, b * in_hi, c * in_hi]
        ).astype(np.float32)
        for d in range(n_dev):
            g0 = d * nl - k  # global plane of extended plane 0
            j_lo = max(0, -g0)
            j_hi = min(nle, nx - g0)
            if j_lo < j_hi:
                out[d, hi_i, :, j_lo:j_hi] = rows[:, g0 + j_lo: g0 + j_hi]
    return out


def _plane_maps(nx, nl, k, layout):
    """Per psi entry: f(d, j) -> global index for extended slab plane j of
    shard d, or None when j holds halo/trash/out-of-range data."""
    maps = []
    for half, axis, comp, end, tshape, pads in layout:
        per = tshape[0]
        if axis != 0:
            def m(d, j, nl=nl, k=k):  # strips: lattice-plane aligned
                g = j - k + d * nl
                return g if (k <= j < k + nl) else None
        elif end == "lo":
            t_lo = per - 1 - k  # global live planes [0, t_lo)

            def m(d, j, nl=nl, k=k, t_lo=t_lo):
                g = j - k + d * nl  # identity plane<->slab-index alignment
                return g if (k <= j < k + nl and 0 <= g < t_lo) else None
        else:
            t_hi = per - 1 - k  # global slab indices [1, t_hi] live

            def m(d, j, nl=nl, k=k, t_hi=t_hi, nx=nx):
                gm = (d + 1) * nl - nx + j
                return gm if 1 <= gm <= t_hi else None
        maps.append(m)
    return maps


def init_sharded_pml_state(
    shape, mesh: Mesh, k: int, *, cpml, axis: str = "x",
    dtype=jnp.float32, tfsf=None,
) -> PmlKernelState:
    """Zero PmlKernelState in the extended sharded layout for a global
    ``shape`` lattice decomposed along x over ``mesh``. ``dtype`` is the
    field storage dtype (f32/bf16); psi stays f32 (solver/pallas_cpml.py
    bf16 notes)."""
    n_dev = mesh.shape[axis]
    nx, ny, nz = shape
    nl = nx // n_dev
    nle = nl + 2 * k
    layout = _psi_layout((nle, ny, nz), cpml, k)
    fs = NamedSharding(mesh, P(axis, None, None))
    r = NamedSharding(mesh, P())

    def z(s, sh, dt_=jnp.float32):
        return jax.device_put(jnp.zeros(s, dt_), sh)

    ext = (n_dev * nle, ny, nz)
    psi = tuple(
        z((n_dev * ts[0],) + ts[1:], fs) for *_, ts, _ in layout
    )
    if tfsf is not None:
        ae, ah = tfsf.init_aux(nx, jnp.float32)
        aux_e = jax.device_put(ae, r)
        aux_h = jax.device_put(ah, r)
    else:
        aux_e, aux_h = z((), r), z((), r)
    return PmlKernelState(
        **{name: z(ext, fs, dtype) for name in _FIELDS},
        tick=z((), r).astype(jnp.int32),
        psi=psi,
        aux_e=aux_e, aux_h=aux_h,
    )


def extend_matid(matid, n_dev: int, k: int):
    """Global (nx, ny, nz) material-index volume -> per-shard extended
    layout (n_dev*nle, ny, nz): each shard carries its owned planes plus
    k halo planes per side copied from the NEIGHBOR'S OWNED planes
    (edge-clamped at the global ends), so the redundant halo recompute
    sees the same materials the owner does."""
    m = np.asarray(matid)
    nx = m.shape[0]
    nl = nx // n_dev
    nle = nl + 2 * k
    out = np.empty((n_dev * nle,) + m.shape[1:], m.dtype)
    for d in range(n_dev):
        g0 = d * nl - k
        idx = np.clip(np.arange(g0, g0 + nle), 0, nx - 1)
        out[d * nle: (d + 1) * nle] = m[idx]
    return jnp.asarray(out)


def extend_pml_state(
    state: PmlKernelState, mesh: Mesh, k: int, *, cpml, axis: str = "x"
) -> PmlKernelState:
    """Global PmlKernelState -> extended sharded layout (host round-trip).
    Halo/trash planes start zero; the first pass refreshes the field and
    strip halos before anything reads them."""
    n_dev = mesh.shape[axis]
    nx, ny, nz = state.ex.shape
    nl = nx // n_dev
    nle = nl + 2 * k
    elayout = _psi_layout((nle, ny, nz), cpml, k)
    maps = _plane_maps(nx, nl, k, elayout)
    fs = NamedSharding(mesh, P(axis, None, None))
    r = NamedSharding(mesh, P())

    def ext_field(f):
        host = np.asarray(f)
        out = np.zeros((n_dev * nle, ny, nz), host.dtype)
        for d in range(n_dev):
            out[d * nle + k: d * nle + k + nl] = host[d * nl: (d + 1) * nl]
        return jnp.asarray(out)

    psi = []
    for m, (entry, g) in zip(maps, zip(elayout, state.psi)):
        per = entry[4][0]
        ghost = np.asarray(g)
        out = np.zeros((n_dev * per,) + entry[4][1:], np.float32)
        for d in range(n_dev):
            for j in range(per):
                gi = m(d, j)
                if gi is not None:
                    out[d * per + j] = ghost[gi]
        psi.append(jnp.asarray(out))

    new = PmlKernelState(
        **{name: ext_field(getattr(state, name)) for name in _FIELDS},
        tick=state.tick, psi=tuple(psi),
        aux_e=state.aux_e, aux_h=state.aux_h,
    )
    spec = PmlKernelState(
        **{n: fs for n in _FIELDS}, tick=r,
        psi=tuple(fs for _ in psi), aux_e=r, aux_h=r,
    )
    return jax.device_put(new, spec)


def collapse_pml_state(
    state_ext: PmlKernelState,
    mesh: Mesh,
    k: int,
    global_shape,
    *,
    cpml,
    axis: str = "x",
) -> PmlKernelState:
    """Extended sharded layout -> plain global PmlKernelState (host
    round-trip); halo and trash planes are dropped."""
    n_dev = mesh.shape[axis]
    nx, ny, nz = global_shape
    nl = nx // n_dev
    nle = nl + 2 * k
    glayout = _psi_layout(global_shape, cpml)
    elayout = _psi_layout((nle, ny, nz), cpml, k)
    maps = _plane_maps(nx, nl, k, elayout)

    def col_field(f):
        host = np.asarray(f)
        return jnp.asarray(
            np.concatenate(
                [host[d * nle + k: d * nle + k + nl] for d in range(n_dev)]
            )
        )

    psi = []
    for m, gentry, eentry, t in zip(maps, glayout, elayout, state_ext.psi):
        host = np.asarray(t)
        per = eentry[4][0]
        out = np.zeros(gentry[4], np.float32)
        for d in range(n_dev):
            for j in range(per):
                gi = m(d, j)
                if gi is not None:
                    out[gi] = host[d * per + j]
        psi.append(jnp.asarray(out))

    return PmlKernelState(
        **{name: col_field(getattr(state_ext, name)) for name in _FIELDS},
        tick=state_ext.tick, psi=tuple(psi),
        aux_e=state_ext.aux_e, aux_h=state_ext.aux_h,
    )


def make_pallas_sharded_cpml_stepk(
    mesh: Mesh,
    shape: Tuple[int, int, int],
    k_steps: int,
    *,
    inv_dx: Tuple[float, float, float],
    dt: float,
    bc: BoundaryConditions = BoundaryConditions(),
    constants: PhysicalConstants = SI,
    cpml,
    max_sources: int = 0,
    interpret: bool = False,
    axis: str = "x",
    with_m: bool = False,
    matid=None,
    n_materials: int = 1,
    dtype=jnp.float32,
    tfsf=None,
):
    """Build step(state_ext, coeffs, sources) advancing ``k_steps``
    absorbing ticks per pass on each shard of a 1-D x decomposition.

    ``shape`` is the GLOBAL lattice; the state uses the extended sharded
    layout (init_sharded_pml_state / extend_pml_state). J (and with
    ``with_m``, M) sources inject in-kernel at every level (max_sources
    must equal the real count). ``matid`` (a GLOBAL (nx, ny, nz) index
    volume) switches on compressed-material mode: ``coeffs`` becomes the
    (K_mat, 4) table. ``dtype`` is the field storage dtype (f32/bf16).

    ``tfsf`` (SLAB mode only) rides in-kernel: the replicated 1-D aux grid
    ticks K times outside shard_map, the four plane-adjacent aux scalars
    per level go in as a (2K, 2) SMEM row, and the injection planes enter
    as runtime per-shard EXTENDED coordinates — the masks then fire on
    owned AND halo copies of the planes, which is exactly what the
    redundant halo recompute requires (same mechanism as the runtime
    Neumann edges)."""
    n_dev = mesh.shape[axis]
    if not supports_sharded_cpml(shape, n_dev, bc, cpml, k_steps, dtype):
        raise ValueError(
            f"sharded CPML kernel does not support {shape=} {n_dev=} "
            f"{k_steps=} {cpml=}"
        )
    if with_m and max_sources == 0:
        raise ValueError("with_m requires in-kernel sources (max_sources > 0)")
    nx, ny, nz = shape
    if matid is not None and (ny % 32 != 0 or n_materials > 256):
        raise ValueError("matid mode needs ny % 32 == 0 and <= 256 materials")
    n_mat = n_materials if matid is not None else 1
    nl = nx // n_dev
    k = int(k_steps)
    nle = nl + 2 * k
    shape_ext = (nle, ny, nz)
    inv_dx = tuple(float(v) for v in inv_dx)
    constants_key = "si" if constants is SI or constants == SI else "reduced"

    layout = _psi_layout(shape_ext, cpml, k)
    has_x = any(a == 0 for _, a, *_ in layout)
    xprof = (
        jnp.asarray(
            _xprof_sharded(nx, nl, k, n_dev, cpml, inv_dx, dt, constants)
        )
        if has_x
        else jnp.zeros((n_dev, 1, 1, 1), jnp.float32)
    )
    mid_ext = extend_matid(matid, n_dev, k) if matid is not None else None

    aux_coeffs = None
    if tfsf is not None:
        if tfsf.is_box:
            raise ValueError(
                "sharded in-kernel TF/SF supports slab mode only"
            )
        tfsf.validate(shape)
        from ..coefficients import update_coefficients
        from ..grid import Resolution
        from ..material import VACUUM

        dx0 = 1.0 / inv_dx[0]
        vacuum_row = update_coefficients(
            VACUUM, Resolution(spatial=(dx0,) * 3, temporal=dt), constants
        )
        aux_coeffs = tfsf.build_aux(nx, vacuum_row, dt, dx0, constants,
                                    jnp.float32)
    tf_lo, tf_hi = tuple(tfsf.span) if tfsf is not None else (0, 0)

    call, x_inputs, strip_inputs = _build_call(
        shape_ext, inv_dx, cpml, k, tfsf is not None, (0, 0), None,
        float(dt), constants_key, interpret, int(max_sources), n_mat,
        x_extra=k, runtime_edges=True, runtime_xprof=True,
        with_m=bool(with_m), dtype_name=jnp.dtype(dtype).name,
        runtime_tfsf=tfsf is not None,
    )
    assert not x_inputs  # runtime_xprof: profiles come in as an operand

    def local_step(state: PmlKernelState, coeffs, sources, xprof_l, mid_l,
                   tf_rows):
        idx = lax.axis_index(axis)
        up = [(i, i + 1) for i in range(n_dev - 1)]
        down = [(i + 1, i) for i in range(n_dev - 1)]

        def refresh(f):
            # my outermost OWNED planes -> neighbors' halos
            recv_lo = lax.ppermute(f[nl: nl + k], axis, up)
            recv_hi = lax.ppermute(f[k: 2 * k], axis, down)
            return f.at[0:k].set(recv_lo).at[nl + k:].set(recv_hi)

        fields = {name: refresh(getattr(state, name)) for name in _FIELDS}
        psi = [
            t if entry[1] == 0 else refresh(t)
            for entry, t in zip(layout, state.psi)
        ]

        lo_edge = jnp.where(idx == 0, k, -(2**30))
        hi_edge = jnp.where(idx == n_dev - 1, nl + k - 1, 2**30)
        edges = jnp.stack([lo_edge, hi_edge]).astype(jnp.int32).reshape(1, 2)

        if matid is not None:
            row = jnp.asarray(coeffs, jnp.float32)  # (K_mat, 4) table
        else:
            row = jnp.stack(
                [
                    jnp.asarray(coeffs.c_a, jnp.float32),
                    jnp.asarray(coeffs.c_b, jnp.float32),
                    jnp.asarray(coeffs.d_a, jnp.float32),
                    jnp.asarray(coeffs.d_b, jnp.float32),
                ]
            ).reshape(1, 4)

        args = [row, edges]
        if has_x:
            args.append(xprof_l.reshape(2, 5, nle))
        if tfsf is not None:
            args.append(tf_rows)  # (2K, 2) pre-gathered aux scalars
            off = k - idx * nl
            args.append(
                jnp.stack([tf_lo + off, tf_hi + off])
                .astype(jnp.int32).reshape(1, 2)
            )
        if max_sources > 0:
            # rows [px_ext, py, pz, J levels 1..K (+ M levels 1..K)]; the
            # extended x coordinate is NOT clipped, so halo copies get the
            # injection the redundant recompute needs
            off = (k - idx * nl).astype(jnp.float32)
            pts = sources.points.astype(jnp.float32)
            pts = pts.at[:, 0].add(off)
            rows = [pts]
            m_rows = []
            for lvl in range(k):
                t = (state.tick + lvl).astype(jnp.float32) * jnp.float32(dt)
                j_vals, m_vals = sources.values(t)
                rows.append(j_vals.astype(jnp.float32))
                if with_m:
                    m_rows.append(m_vals.astype(jnp.float32))
            args.append(jnp.concatenate(rows + m_rows, axis=1))
        args += strip_inputs
        if matid is not None:
            args += [mid_l] * k
        args += [fields[n] for n in _FIELDS]
        args += [fields["ey"], fields["ez"]]
        args += psi
        outs = call(*args)
        return PmlKernelState(
            ex=outs[0], ey=outs[1], ez=outs[2],
            hx=outs[3], hy=outs[4], hz=outs[5],
            tick=state.tick + k, psi=tuple(outs[6:]),
            aux_e=state.aux_e, aux_h=state.aux_h,
        )

    fspec = P(axis, None, None)
    state_spec = PmlKernelState(
        **{n: fspec for n in _FIELDS}, tick=P(),
        psi=tuple(fspec for _ in layout), aux_e=P(), aux_h=P(),
    )

    def step(
        state: PmlKernelState, coeffs, sources
    ) -> PmlKernelState:
        if max_sources > 0 and (
            sources is None or sources.num_sources != max_sources
        ):
            raise ValueError(
                f"kernel built for {max_sources} in-kernel sources, got "
                f"{0 if sources is None else sources.num_sources}"
            )
        mid_arg = (
            mid_ext if mid_ext is not None
            else jnp.zeros((n_dev, 1, 1), jnp.uint8)
        )
        aux_e, aux_h = state.aux_e, state.aux_h
        if tfsf is not None:
            # tick the replicated 1-D aux grid K times OUTSIDE shard_map,
            # gathering the four plane-adjacent scalars per level (the
            # single-chip kernel's rows, pre-gathered)
            rows = []
            for lvl in range(k):
                t = (state.tick + lvl).astype(jnp.float32) * jnp.float32(dt)
                new_e, new_h = tfsf.aux_step(
                    aux_e, aux_h, aux_coeffs, t, inv_dx[0], jnp.float32
                )
                rows.append(jnp.stack([aux_e[tf_lo - 1], aux_e[tf_hi]]))
                rows.append(jnp.stack([new_h[tf_lo], new_h[tf_hi + 1]]))
                aux_e, aux_h = new_e, new_h
            tf_rows = jnp.stack(rows)
        else:
            tf_rows = jnp.zeros((1, 2), jnp.float32)
        out = jax.shard_map(
            local_step,
            mesh=mesh,
            in_specs=(
                state_spec,
                jax.tree.map(lambda _: P(), coeffs),
                jax.tree.map(lambda _: P(), sources),
                P(axis, None, None, None),
                P(axis, None, None),
                P(None, None),
            ),
            out_specs=state_spec,
            check_vma=False,
        )(state, coeffs, sources, xprof, mid_arg, tf_rows)
        if tfsf is not None:
            out = out._replace(aux_e=aux_e, aux_h=aux_h)
        return out

    return step
