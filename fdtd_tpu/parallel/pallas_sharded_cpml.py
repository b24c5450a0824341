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
to agree. TF/SF (slab AND closed box), M sources, compressed materials
and bf16 storage all ride this kernel path; see
make_pallas_sharded_cpml_stepk for the per-feature mechanisms.

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
    "sharded_gb_plan",
    "init_sharded_pml_state",
    "extend_pml_state",
    "collapse_pml_state",
    "make_pallas_sharded_cpml_stepk",
]

_FIELDS = ("ex", "ey", "ez", "hx", "hy", "hz")


def supports_sharded_cpml(
    shape, n_dev: int, bc, cpml, k: int, dtype=jnp.float32,
    n_dev_y: int = 1, dft_rt=None, dense=None, oblique=None,
) -> bool:
    """True when the sharded in-kernel CPML path supports this config.

    Beyond the per-shard kernel's own requirements, the x-PML slabs (plus
    the E-half's one-plane inward reach) must end >= k planes inside the
    first/last shard's owned region, so halo recompute never overlaps
    live x-psi owned by a neighbor. With ``n_dev_y`` > 1 (2-D (x, y)
    decomposition) the same containment applies to the y-PML strips in
    the first/last y-shard's owned columns, and the PADDED strip widths
    must fit inside the owned lateral width (the kernel's static segment
    positions assume it)."""
    from ..solver.pallas_cpml import _pad8

    nx, ny, nz = shape
    if nx % n_dev != 0 or ny % n_dev_y != 0:
        return False
    nl = nx // n_dev
    nle = nl + 2 * k
    nly = ny // n_dev_y
    ny_ext = nly + 2 * k if n_dev_y > 1 else ny
    if n_dev_y > 1 and ny_ext % 8 != 0:
        return False
    dense_shim = None
    if dense is not None:
        # the per-shard kernel sees the region at FULL extended x span
        # (identity coefficients outside the real box); under a 2-D
        # mesh the lateral span widens to the FULL extended plane too
        # (the y cut severs the box, so identity-padding covers every
        # column). Only the spans matter for the tile/VMEM checks.
        import types

        (gy0, gy1), (gz0, gz1) = dense.box[1], dense.box[2]
        lat = (0, ny_ext) if n_dev_y > 1 else (gy0, gy1)
        dense_shim = types.SimpleNamespace(
            box_shape=(nle, lat[1] - lat[0], gz1 - gz0),
            box=((0, nle), lat, (gz0, gz1)),
        )
    if not supports_cpml_k((nle, ny_ext, nz), bc, cpml, k, dtype,
                           dft_rt=dft_rt, dense=dense_shim,
                           oblique=oblique):
        return False
    if oblique is not None and n_dev_y > 1:
        # the correction patch stitches at STATIC lateral positions;
        # only the x coordinate is runtime (scalar prefetch), so
        # lateral cuts stay on the engine
        return False
    lo, hi = cpml.thickness[0]
    for half in (False, True):
        (l0, l1), (h0, h1) = _slab_extents(nx, lo, hi, half)
        if l1 > nl - k:
            return False
        if h1 > h0 and (nx - h0) > nl - k:
            return False
    if n_dev_y > 1:
        ylo, yhi = cpml.thickness[1]
        for half in (False, True):
            (l0, l1), (h0, h1) = _slab_extents(ny, ylo, yhi, half)
            if l1 > nly - k:
                return False
            if h1 > h0 and (ny - h0) > nly - k:
                return False
            if _pad8(l1 - l0) + _pad8(h1 - h0) > nly:
                return False
    return True


def sharded_gb_plan(shape, n_dev: int, bc, cpml, k: int,
                    dtype=jnp.float32, matid: bool = False,
                    n_b_candidates=(2, 4, 8)):
    """(n_b, h) when the SHARDED grid-blocked CPML tier supports this
    configuration, else None.

    The sharded gb tier composes the 1-D x decomposition (this module's
    extended-halo recipe) with lateral blocks INSIDE each shard's pallas
    grid (solver/pallas_cpml_gb.py) — lifting the per-shard VMEM K-cap
    that pins full-lateral-plane shards to the plain K<=3 ladder at
    512^3 (round-4 verdict item 2). Requirements = the x-PML containment
    of supports_sharded_cpml plus gb_plan at the extended per-shard
    shape (y is global on 1-D x meshes, so the y-strip containment and
    halo arithmetic are unchanged from the single-chip gb plan)."""
    from ..solver.pallas_cpml_gb import gb_plan

    nx, ny, nz = shape
    if nx % n_dev != 0 or not (2 <= k <= 10):
        return None
    nl = nx // n_dev
    nle = nl + 2 * k
    lo, hi = cpml.thickness[0]
    for half in (False, True):
        (l0, l1), (h0, h1) = _slab_extents(nx, lo, hi, half)
        if l1 > nl - k:
            return None
        if h1 > h0 and (nx - h0) > nl - k:
            return None
    return gb_plan((nle, ny, nz), bc, cpml, k, dtype=dtype, matid=matid,
                   n_b_candidates=n_b_candidates)


def _ystrips_sharded(ny, nly, k, n_dy, half_is_e, cpml, inv_dx, dt,
                     constants):
    """(n_dy, 3, plo+phi, 1) per-y-shard strip profile rows for one half.

    Row content matches solver/pallas_cpml._profiles' axis-1 strips; the
    lo part is live only on y-shard 0 and the hi part only on the last
    y-shard — everywhere else rows are the identity (ik=1, b=c=0), which
    makes the kernel's stretch a no-op and keeps psi = 0 there."""
    from ..solver.cpml import _profiles_1d
    from ..solver.pallas_cpml import _pad8

    lo, hi = cpml.thickness[1]
    dy = 1.0 / inv_dx[1]
    ik, b, c = _profiles_1d(ny, lo, hi, cpml.spec, dy, dt, constants,
                            half_is_e)
    (l0, l1), (h0, h1) = _slab_extents(ny, lo, hi, half_is_e)
    plo, phi = _pad8(l1 - l0), _pad8(h1 - h0)

    def strip(arr, fill):
        s_lo = np.full(plo, fill)
        s_lo[: l1 - l0] = arr[l0:l1]
        s_hi = np.full(phi, fill)
        s_hi[phi - (h1 - h0):] = arr[h0:h1]
        return np.concatenate([s_lo, s_hi]).astype(np.float32)

    rows = np.stack([strip(ik, 1.0), strip(b, 0.0), strip(c, 0.0)])
    out = np.zeros((n_dy, 3, plo + phi, 1), np.float32)
    out[:, 0] = 1.0
    out[0, :, :plo, 0] = rows[:, :plo]
    out[n_dy - 1, :, plo:, 0] = rows[:, plo:]
    return out


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
    dtype=jnp.float32, tfsf=None, y_axis: Optional[str] = None,
    dft=None, dense=None,
) -> PmlKernelState:
    """Zero PmlKernelState in the extended sharded layout for a global
    ``shape`` lattice decomposed along x over ``mesh`` (and along y too
    when ``y_axis`` names a second mesh axis: every tensor's lateral dim
    then carries k halo slots per side per y-shard). ``dtype`` is the
    field storage dtype (f32/bf16); psi stays f32 (solver/pallas_cpml.py
    bf16 notes)."""
    n_dev = mesh.shape[axis]
    n_dy = mesh.shape[y_axis] if y_axis is not None else 1
    nx, ny, nz = shape
    nl = nx // n_dev
    nle = nl + 2 * k
    nly = ny // n_dy
    ny_ext = nly + 2 * k if y_axis is not None else ny
    layout = _psi_layout((nle, ny_ext, nz), cpml, k)
    fs = NamedSharding(mesh, P(axis, y_axis, None))
    r = NamedSharding(mesh, P())

    def z(s, sh, dt_=jnp.float32):
        return jax.device_put(jnp.zeros(s, dt_), sh)

    ext = (n_dev * nle, n_dy * ny_ext, nz)
    psi = tuple(
        z((n_dev * ts[0], n_dy * ts[1], ts[2]), fs)
        for *_, ts, _ in layout
    )
    if dense is not None:
        # volumetric-region psi in the per-shard FULL-x-span layout
        # (make_pallas_sharded_cpml_stepk dense=): (4, nle+1, by, bz) per
        # shard with a trash plane, stored (n_dev*4, ...) sharded. Under
        # a 2-D mesh the lateral dim is the FULL extended plane width
        # (n_dy*ny_ext stacked), exchanged like the fields.
        (gy0, gy1), (gz0, gz1) = dense.box[1], dense.box[2]
        by_k = n_dy * ny_ext if y_axis is not None else gy1 - gy0
        psi = psi + (z(
            (n_dev * 4, nle + 1, by_k, gz1 - gz0),
            NamedSharding(mesh, P(axis, None, y_axis, None)),
        ),)
    if dft is not None:
        # runtime-coordinate DFT accumulator tail: one per-shard
        # (6F, ny[_ext], nz) resident block per plane, stored
        # (n_dev*6F, n_dy*ny_ext, nz) sharded like the fields
        # (make_pallas_sharded_cpml_stepk dft=). Under a 2-D mesh the
        # block spans the extended lateral plane; halo columns
        # accumulate stale values that extraction never reads
        # (extract_sharded_dft_acc slices owned columns only).
        planes_rt, freqs_rt = dft
        n_f = len(tuple(freqs_rt))
        psi = psi + tuple(
            z((n_dev * 6 * n_f, n_dy * ny_ext, nz), fs)
            for _ in tuple(planes_rt)
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


def _ext_clamped(m: np.ndarray, n_dev: int, k: int, dim: int) -> np.ndarray:
    """Extend one dim to per-shard [halo(k) | owned | halo(k)] slots whose
    halos copy the NEIGHBOR'S OWNED entries (edge-clamped at the global
    ends)."""
    n = m.shape[dim]
    nl = n // n_dev
    nle = nl + 2 * k
    idx = np.concatenate([
        np.clip(np.arange(d * nl - k, d * nl - k + nle), 0, n - 1)
        for d in range(n_dev)
    ])
    return np.take(m, idx, axis=dim)


def extend_matid(matid, n_dev: int, k: int, n_dy: Optional[int] = None):
    """Global (nx, ny, nz) material-index volume -> per-shard extended
    layout (n_dev*nle[, n_dy*ny_ext], nz): each shard carries its owned
    region plus k halo slots per side per decomposed dim, copied from the
    neighbor's owned entries, so the redundant halo recompute sees the
    same materials the owner does. ``n_dy`` switches on the 2-D lateral
    extension."""
    m = _ext_clamped(np.asarray(matid), n_dev, k, 0)
    if n_dy is not None:
        m = _ext_clamped(m, n_dy, k, 1)
    return jnp.asarray(m)


def _lat_maps(nly: int, k: int, layout, n_dy: int):
    """Per psi entry (2-D layouts): f(dy, j1) -> global dim-1 index for
    extended lateral index j1 on y-shard dy, or None for halo/dead slots.

    Axis-1 (y-strip) entries live in strip-index space: the lo rows exist
    only on y-shard 0 and the hi rows only on the last y-shard. All other
    entries are lattice-aligned with k halo slots per side."""
    maps = []
    for half, axis, comp, end, tshape, pads in layout:
        if axis == 1:
            plo = pads[2]

            def m(dy, j1, plo=plo):
                if dy == 0 and j1 < plo:
                    return j1
                if dy == n_dy - 1 and j1 >= plo:
                    return j1
                return None
        else:

            def m(dy, j1, nly=nly, k=k):
                g = j1 - k + dy * nly
                return g if (k <= j1 < k + nly) else None

        maps.append(m)
    return maps


def extend_pml_state(
    state: PmlKernelState, mesh: Mesh, k: int, *, cpml, axis: str = "x",
    y_axis: Optional[str] = None, dense=None,
) -> PmlKernelState:
    """Global PmlKernelState -> extended sharded layout (host round-trip).
    Halo/trash slots start zero; the first pass refreshes the field and
    strip halos before anything reads them. ``y_axis`` switches on the
    2-D (x, y) layout.

    ``dense`` (the same tile-padded DensePml the kernel was built with)
    re-extends the volumetric-region psi entry that follows the boundary
    entries: global (4, bx+1, by, bz) -> per-shard (n_dev*4, nle+1, by,
    bz) with the box's owned planes scattered to their local extended
    positions (halo planes zero — the per-pass x exchange refreshes them
    from the owners before the kernel reads them)."""
    from .pallas_sharded_k import _ext_axis

    n_dev = mesh.shape[axis]
    n_dy = mesh.shape[y_axis] if y_axis is not None else 1
    nx, ny, nz = state.ex.shape
    nl = nx // n_dev
    nle = nl + 2 * k
    nly = ny // n_dy
    ny_ext = nly + 2 * k if y_axis is not None else ny
    elayout = _psi_layout((nle, ny_ext, nz), cpml, k)
    xmaps = _plane_maps(nx, nl, k, elayout)
    ymaps = (_lat_maps(nly, k, elayout, n_dy)
             if y_axis is not None else [None] * len(elayout))
    fs = NamedSharding(mesh, P(axis, y_axis, None))
    r = NamedSharding(mesh, P())

    def ext_field(f):
        host = _ext_axis(np.asarray(f), n_dev, k, 0)
        if y_axis is not None:
            host = _ext_axis(host, n_dy, k, 1)
        return jnp.asarray(host)

    psi = []
    for xm, ym, (entry, g) in zip(xmaps, ymaps, zip(elayout, state.psi)):
        per0, per1 = entry[4][0], entry[4][1]
        ghost = np.asarray(g)
        out = np.zeros((n_dev * per0, n_dy * per1) + entry[4][2:],
                       np.float32)
        for d in range(n_dev):
            for j in range(per0):
                gi = xm(d, j)
                if gi is None:
                    continue
                if ym is None:
                    out[d * per0 + j] = ghost[gi]
                    continue
                for dy in range(n_dy):
                    for j1 in range(per1):
                        gy = ym(dy, j1)
                        if gy is not None:
                            out[d * per0 + j, dy * per1 + j1] = ghost[gi, gy]
        psi.append(jnp.asarray(out))

    specs = [fs] * len(psi)
    if dense is not None:
        gvol = np.asarray(state.psi[len(elayout)])  # (4, bx+1, by, bz)
        (gx0, gx1) = dense.box[0]
        (gy0, gy1) = dense.box[1]
        by_k = n_dy * ny_ext if y_axis is not None else gvol.shape[2]
        out = np.zeros((n_dev * 4, nle + 1, by_k) + gvol.shape[3:],
                       np.float32)
        for g in range(gx0, gx1):
            d = g // nl
            j = g - d * nl + k + 1  # owned volume plane (trash at 0)
            if y_axis is None:
                out[d * 4: (d + 1) * 4, j] = gvol[:, g - gx0 + 1]
                continue
            # 2-D layouts: the volume spans the full extended lateral
            # plane; scatter the box's owned columns (halo columns stay
            # zero — the first pass refreshes them before any read)
            for gy in range(gy0, gy1):
                dy = gy // nly
                j1 = gy - dy * nly + k
                out[d * 4: (d + 1) * 4, j, dy * ny_ext + j1] = \
                    gvol[:, g - gx0 + 1, gy - gy0]
        psi.append(jnp.asarray(out))
        specs.append(NamedSharding(mesh, P(axis, None, y_axis, None)))

    new = PmlKernelState(
        **{name: ext_field(getattr(state, name)) for name in _FIELDS},
        tick=state.tick, psi=tuple(psi),
        aux_e=state.aux_e, aux_h=state.aux_h,
    )
    spec = PmlKernelState(
        **{n: fs for n in _FIELDS}, tick=r,
        psi=tuple(specs), aux_e=r, aux_h=r,
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
    y_axis: Optional[str] = None,
    dense=None,
) -> PmlKernelState:
    """Extended sharded layout -> plain global PmlKernelState (host
    round-trip); halo and trash slots are dropped. ``dense`` (the
    tile-padded DensePml of the build) collapses the volumetric-region
    psi entry back to the single-chip (4, bx+1, by, bz) layout."""
    from .pallas_sharded_k import _col_axis

    n_dev = mesh.shape[axis]
    n_dy = mesh.shape[y_axis] if y_axis is not None else 1
    nx, ny, nz = global_shape
    nl = nx // n_dev
    nle = nl + 2 * k
    nly = ny // n_dy
    ny_ext = nly + 2 * k if y_axis is not None else ny
    glayout = _psi_layout(global_shape, cpml)
    elayout = _psi_layout((nle, ny_ext, nz), cpml, k)
    xmaps = _plane_maps(nx, nl, k, elayout)
    ymaps = (_lat_maps(nly, k, elayout, n_dy)
             if y_axis is not None else [None] * len(elayout))

    def col_field(f):
        host = _col_axis(np.asarray(f), n_dev, k, 0)
        if y_axis is not None:
            host = _col_axis(host, n_dy, k, 1)
        return jnp.asarray(host)

    psi = []
    for xm, ym, gentry, eentry, t in zip(
        xmaps, ymaps, glayout, elayout, state_ext.psi
    ):
        host = np.asarray(t)
        per0, per1 = eentry[4][0], eentry[4][1]
        out = np.zeros(gentry[4], np.float32)
        for d in range(n_dev):
            for j in range(per0):
                gi = xm(d, j)
                if gi is None:
                    continue
                if ym is None:
                    out[gi] = host[d * per0 + j]
                    continue
                for dy in range(n_dy):
                    for j1 in range(per1):
                        gy = ym(dy, j1)
                        if gy is not None:
                            out[gi, gy] = host[d * per0 + j, dy * per1 + j1]
        psi.append(jnp.asarray(out))

    if dense is not None:
        evol = np.asarray(state_ext.psi[len(elayout)])
        (gx0, gx1) = dense.box[0]
        (gy0, gy1) = dense.box[1]
        out = np.zeros(
            (4, gx1 - gx0 + 1)
            + ((gy1 - gy0,) if y_axis is not None else ())
            + evol.shape[(2 if y_axis is None else 3):], np.float32)
        for g in range(gx0, gx1):
            d = g // nl
            j = g - d * nl + k + 1
            if y_axis is None:
                out[:, g - gx0 + 1] = evol[d * 4: (d + 1) * 4, j]
                continue
            for gy in range(gy0, gy1):
                dy = gy // nly
                j1 = gy - dy * nly + k
                out[:, g - gx0 + 1, gy - gy0] = \
                    evol[d * 4: (d + 1) * 4, j, dy * ny_ext + j1]
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
    y_axis: Optional[str] = None,
    flux_faces=(),
    dft_rows=(),
    dft=None,
    dense=None,
    blocks: Optional[Tuple[int, int]] = None,
    oblique=None,
):
    """Build step(state_ext, coeffs, sources) advancing ``k_steps``
    absorbing ticks per pass on each shard of a 1-D x decomposition — or
    a 2-D (x, y) decomposition when ``y_axis`` names a second mesh axis.

    ``shape`` is the GLOBAL lattice; the state uses the extended sharded
    layout (init_sharded_pml_state / extend_pml_state). J (and with
    ``with_m``, M) sources inject in-kernel at every level (max_sources
    must equal the real count). ``matid`` (a GLOBAL (nx, ny, nz) index
    volume) switches on compressed-material mode: ``coeffs`` becomes the
    (K_mat, 4) table. ``dtype`` is the field storage dtype (f32/bf16).

    ``tfsf`` rides in-kernel in BOTH modes: the replicated 1-D aux grid
    ticks K times outside shard_map and the injection planes enter as
    runtime per-shard EXTENDED coordinates — the masks then fire on owned
    AND halo copies of the planes, which is exactly what the redundant
    halo recompute requires (same mechanism as the runtime Neumann
    edges). Slab mode pre-gathers the four plane-adjacent aux scalars per
    level into a (2K, 2) SMEM row; closed-box mode ships the full
    (2K, aux_len) rows plus the extended->global offset, because the
    lateral faces gather aux at every plane inside the box x-span. On
    1-D x meshes the box's y/z faces stay static masks (lateral dims
    uncut); under a 2-D (x, y) mesh the y-face coordinates become
    per-shard RUNTIME values in the extended y frame (SMEM row cols
    3-4) — the uniform global->extended shift keeps halo columns
    injecting exactly what their owners compute, and out-of-range
    values on non-owning shards make the masks empty.

    2-D mechanics on top of the 1-D recipe (module docstring):
    every tensor whose lateral dim is lattice-aligned (fields, x-slab psi,
    z-strip psi, matid) carries k halo COLUMNS per side per y-shard,
    refreshed by an ordered two-phase exchange (lateral first on owned
    columns, then x at full lateral width — the x phase ships the fresh
    lateral halos, covering the corners). y-strip psi stays in strip-index
    space (live >= k inside the edge shards' owned columns, enforced by
    supports_sharded_cpml), so it needs NO lateral exchange — instead the
    strip PROFILES become per-y-shard runtime operands (_ystrips_sharded)
    and the kernel's strip segments sit y_halo=k columns inside the plane.
    Lateral Neumann edge masks ride the same runtime edges row as x.

    ``flux_faces`` (see solver/pallas_cpml_k.py for the descriptor
    forms) makes the step return ``(state, flux_rows)`` with GLOBAL
    (K, nx, n_q) per-tick per-plane Poynting reductions: each shard
    emits its owned planes' rows in-kernel, which are then scattered
    into global plane positions and psum-combined over the mesh —
    per-tick accumulators (scattering box flux) thus ride the sharded
    kernel without dropping to single-stepping. Under a 2-D (x, y) mesh
    every in-kernel reduction is restricted to the shard's OWNED
    lateral window and the "y" descriptor coordinates become per-shard
    RUNTIME extended-frame values (kernel runtime_lat), so the
    per-shard partials psum to the global value over both axes.

    ``dft_rows`` appends a tuple of GLOBAL (K, nx, 6, lat) raw E+H
    row-capture blocks to the return, assembled like flux_rows (owned
    extended planes -> global scatter -> psum) — lateral-plane spectra
    (DftProbe axis 1/2) then fold outside the kernel at full
    kernel-tier speed on multi-chip runs. 2-D meshes ride the same
    runtime_lat mechanism: "y" captures fire only on the owning
    y-shard; "z" captures drop their lateral halo columns and scatter
    the owned window into its global y position. Return order matches
    the single-chip kernel: state [, flux_rows][, captures].

    ``dft`` = (planes, freqs) with GLOBAL (x0, which) planes (bare int =
    E): in-kernel x-plane DFT spectra on the sharded path, via the
    kernel's RUNTIME-coordinate variant (solver/pallas_cpml_k.py
    dft_runtime) — the x decomposition cuts the plane coordinate, so
    each shard receives its extended-layout coordinate (owner) or an
    off-grid sentinel (everyone else; their accumulators stay zero). The
    per-shard (6F, ny[_ext], nz) accumulators ride the psi TAIL as
    (n_dev*6F, n_dy*ny_ext, nz) sharded entries (init_sharded_pml_state
    dft=); the global spectrum sums the per-shard chunks over x (exactly
    one x-owner nonzero) and, under a 2-D mesh, concatenates the OWNED
    lateral windows over the y-shards (extract_sharded_dft_acc — halo
    columns accumulate stale values and are never read). Owned
    planes/columns are exact at EVERY stage of the extended-halo sweep
    (the flux-rows argument), so per-tick accumulation commutes with
    the K-blocking.

    ``dense`` (a solver.pml_region.DensePml in GLOBAL coordinates):
    volumetric per-cell absorbers at the sharded kernel tier. The x
    decomposition cuts the region box, so the per-shard kernel is built
    with the region at FULL extended x span and each shard receives a
    runtime coefficient volume holding the real per-cell (inv_kappa, b,
    c) on its extended planes inside the global box and the IDENTITY
    stretch (1, 0, 0) everywhere else — identity coefficients freeze
    psi at zero and pass derivatives through, so uniform SPMD shapes
    cost only HBM streaming, not correctness. Under a 2-D (x, y) mesh
    the same trick applies laterally: the region spans the full
    extended lateral plane and the psi volume carries lateral halo
    columns, exchanged in the fields' two-phase order. The region psi
    rides the psi tail in per-shard extended layout ((n_dev*4, nle+1,
    [n_dy*]by, bz), trash plane per shard) with halo exchanges per
    pass — its recurrence is per-cell local, the same exactness
    argument as the z-strip psi (module docstring).

    ``blocks`` = (n_b, h): SHARDED GRID-BLOCKED mode (1-D x meshes
    only). Each shard's kernel decomposes its lateral (y) extent into
    n_b blocks INSIDE the pallas grid (solver/pallas_cpml_gb.py),
    lifting the per-shard VMEM K-cap at big lateral planes — the
    round-4 shard-cpml512 ceiling (K=3, 17.95 Gcell/s) was exactly
    this cap. The caller's state keeps the CANONICAL extended-sharded
    layout; the step converts the y-strip psi entries to/from the
    per-block layout at each call boundary (strips only: a few MB of
    on-device reshuffling per K-pass, ~2% of pass traffic). TF/SF
    (slab and box), matid, M sources and bf16 ride along; dense
    regions, accumulator mechanisms and 2-D meshes stay on the plain
    sharded tier. Use sharded_gb_plan to obtain a valid (n_b, h)."""
    n_dev = mesh.shape[axis]
    two_d = y_axis is not None
    n_dy = mesh.shape[y_axis] if two_d else 1
    if oblique is not None:
        # oblique-incidence TF/SF (solver/tfsf_oblique.py) on the
        # SHARDED kernel: the analytic correction stack stays in global
        # coordinates (replicated); each shard addresses it through a
        # runtime scalar-prefetch x offset (pallas_cpml_k
        # runtime_oblique). 1-D x meshes only — the lateral patch
        # stitching is static.
        if (two_d or tfsf is not None or dense is not None
                or dft is not None or flux_faces or dft_rows
                or blocks is not None):
            raise ValueError(
                "sharded oblique TF/SF takes 1-D x meshes without "
                "aux-grid TF/SF, dense regions, gb blocks or "
                "accumulator mechanisms"
            )
        if not supports_sharded_cpml(shape, n_dev, bc, cpml, k_steps,
                                     dtype, oblique=oblique):
            raise ValueError(
                f"sharded oblique CPML kernel does not support {shape=} "
                f"{n_dev=} {k_steps=} {cpml=}"
            )
    if blocks is not None:
        if (two_d or dense is not None or dft is not None or flux_faces
                or dft_rows):
            raise ValueError(
                "sharded gb mode (blocks=) takes 1-D x meshes without "
                "dense regions or accumulator mechanisms"
            )
        n_b_blk, h_blk = blocks
        plan_g = sharded_gb_plan(shape, n_dev, bc, cpml, k_steps, dtype,
                                 matid=matid is not None,
                                 n_b_candidates=(n_b_blk,))
        if plan_g is None or plan_g[1] != h_blk:
            raise ValueError(
                f"sharded gb CPML kernel does not support {shape=} "
                f"{n_dev=} {k_steps=} {blocks=} {cpml=}"
            )
    elif not supports_sharded_cpml(
        shape, n_dev, bc, cpml, k_steps, dtype,
        n_dev_y=n_dy if two_d else 1,
        dft_rt=(len(dft[0]), len(dft[1])) if dft is not None else None,
        dense=dense,
    ):
        raise ValueError(
            f"sharded CPML kernel does not support {shape=} {n_dev=} "
            f"{n_dy=} {k_steps=} {cpml=}"
        )
    if with_m and max_sources == 0:
        raise ValueError("with_m requires in-kernel sources (max_sources > 0)")
    # box TF/SF rides 2-D (x, y) meshes: the y-face coordinates become
    # per-shard RUNTIME values in the extended y frame (SMEM row cols
    # 3-4 — the same mechanism slab mode uses for the x planes)
    runtime_box_lat = bool(two_d and tfsf is not None and tfsf.is_box)
    # flux reductions and DFT row captures ride 2-D meshes too: "y"
    # descriptor coordinates become per-shard RUNTIME extended-frame
    # values (kernel runtime_lat) and every reduction is restricted to
    # the shard's OWNED lateral window, so the per-shard partials psum
    # to the global value over BOTH mesh axes
    n_lat_rt = (sum(1 for d in flux_faces if d[0] == "y")
                + sum(1 for d in dft_rows if d[0] == "y"))
    runtime_lat = bool(two_d and (flux_faces or dft_rows) and n_lat_rt > 0)
    # in-kernel x-plane DFT rides 2-D meshes unchanged: the per-shard
    # resident accumulator block simply spans the EXTENDED lateral
    # plane; owned columns are exact at every stage (the flux-rows
    # argument), halo columns accumulate stale values that
    # extract_sharded_dft_acc never reads. DensePml rides 2-D meshes
    # by widening the kernel region to the FULL extended lateral span
    # (identity coefficients outside the real box, the x-span trick
    # applied to y as well).
    dft_rows = tuple((str(a), int(v)) for a, v in dft_rows)
    if dft is not None:
        dft_planes_g = tuple(
            (int(p), 0) if not isinstance(p, tuple) else
            (int(p[0]), int(p[1]))
            for p in dft[0]
        )
        dft_freqs_t = tuple(float(f) for f in dft[1])
        n_rt, n_freq_rt = len(dft_planes_g), len(dft_freqs_t)
    else:
        dft_planes_g, dft_freqs_t, n_rt, n_freq_rt = (), (), 0, 0
    nx, ny, nz = shape
    n_mat = n_materials if matid is not None else 1
    nl = nx // n_dev
    k = int(k_steps)
    nle = nl + 2 * k
    nly = ny // n_dy
    ny_ext = nly + 2 * k if two_d else ny
    if matid is not None and (ny_ext % 32 != 0 or n_materials > 256):
        # the uint8 tile constraint applies to the PER-SHARD lateral
        # extent (extended under 2-D), matching best.py's dispatch check
        raise ValueError(
            "matid mode needs the per-shard lateral extent % 32 == 0 and "
            "<= 256 materials"
        )
    shape_ext = (nle, ny_ext, nz)
    inv_dx = tuple(float(v) for v in inv_dx)
    constants_key = "si" if constants is SI or constants == SI else "reduced"

    layout = _psi_layout(shape_ext, cpml, k)
    has_x = any(a == 0 for _, a, *_ in layout)
    has_ystrips = any(a == 1 for _, a, *_ in layout)
    has_zstrips = any(a == 2 for _, a, *_ in layout)
    xprof = (
        jnp.asarray(
            _xprof_sharded(nx, nl, k, n_dev, cpml, inv_dx, dt, constants)
        )
        if has_x
        else jnp.zeros((n_dev, 1, 1, 1), jnp.float32)
    )
    runtime_ystrips = two_d and has_ystrips
    if runtime_ystrips:
        ystr_h = jnp.asarray(_ystrips_sharded(
            ny, nly, k, n_dy, False, cpml, inv_dx, dt, constants))
        ystr_e = jnp.asarray(_ystrips_sharded(
            ny, nly, k, n_dy, True, cpml, inv_dx, dt, constants))
    ystr_blk = None
    if blocks is not None:
        nly_b = ny // n_b_blk
        if has_ystrips:
            # per-BLOCK stacked y-strip profiles (identity on non-owner
            # blocks), the single-chip gb operand — y is global on 1-D
            # x meshes so the stacks are shard-independent (replicated
            # closure constants, like the baked z strips)
            ystr_blk = {
                half: jnp.asarray(_ystrips_sharded(
                    ny, nly_b, h_blk, n_b_blk, half == "e", cpml,
                    inv_dx, dt, constants))
                for half in ("h", "e")
            }
    if matid is not None:
        if blocks is not None:
            # x-extended THEN per-block y-extended (the gb kernel's
            # static baked layout: each stage reads one (1, W, nz)
            # window of the (nle, n_b*W, nz) per-shard tensor)
            m = _ext_clamped(np.asarray(matid), n_dev, k, 0)
            mid_ext = jnp.asarray(_ext_clamped(m, n_b_blk, h_blk, 1))
        else:
            mid_ext = extend_matid(matid, n_dev, k,
                                   n_dy if two_d else None)
    else:
        mid_ext = None

    dense_spec = None
    dco_ext = None
    n_dense = 0
    if dense is not None:
        dense.validate(shape)
        if dense.axis in set(cpml.active_axes()):
            # live extent only: tile-padded cells are identity no-ops
            (bq0, bq1) = dense.live[dense.axis]
            lo_t, hi_t = cpml.thickness[dense.axis]
            n_ax = shape[dense.axis]
            if bq0 < lo_t or bq1 > n_ax - hi_t:
                raise ValueError(
                    "DensePml region overlaps a boundary CPML slab on "
                    f"axis {dense.axis}"
                )
        n_dense = 1
        (gx0, gx1) = dense.box[0]
        (gy0, gy1), (gz0, gz1) = dense.box[1], dense.box[2]
        bz_d = gz1 - gz0
        # kernel region = full extended x span (and under a 2-D mesh,
        # full extended LATERAL span too); per-shard runtime coefficient
        # volumes carry the real box cells at their local extended
        # positions, identity (1, 0, 0) elsewhere — identity cells
        # freeze psi at zero and pass derivatives through, so uniform
        # SPMD shapes cost only HBM streaming
        lat_d = (0, ny_ext) if two_d else (gy0, gy1)
        by_d = lat_d[1] - lat_d[0]
        dense_spec = (dense.axis, (0, nle), lat_d, (gz0, gz1))
        dco_g = np.stack([np.asarray(c, np.float32)
                          for c in (*dense.coeffs_h, *dense.coeffs_e)])
        ident = np.array([1.0, 0.0, 0.0, 1.0, 0.0, 0.0], np.float32)
        dco_host = np.broadcast_to(
            ident[None, None, :, None, None, None],
            (n_dev, n_dy, 6, nle, by_d, bz_d),
        ).copy()
        for d in range(n_dev):
            for j in range(nle):
                g = d * nl - k + j
                if not gx0 <= g < gx1:
                    continue
                if not two_d:
                    dco_host[d, 0, :, j] = dco_g[:, g - gx0]
                    continue
                for dy in range(n_dy):
                    for gy in range(gy0, gy1):
                        j1 = gy - dy * nly + k
                        if 0 <= j1 < ny_ext:
                            dco_host[d, dy, :, j, j1] = \
                                dco_g[:, g - gx0, gy - gy0]
        dco_ext = jnp.asarray(dco_host)

    aux_coeffs = None
    tfsf_box = None
    if tfsf is not None:
        tfsf.validate(shape)
        if tfsf.is_box:
            tfsf_box = (tuple(tfsf.span_y), tuple(tfsf.span_z))
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

    oblique_win = None
    ob_corr_h = ob_corr_e = None
    ob_x0_g = 0
    if oblique is not None:
        from ..solver.tfsf_oblique import build_oblique

        ob_sub, ob_corr_h, ob_corr_e = build_oblique(
            oblique, shape, inv_dx, dt, constants, jnp.float32
        )
        # x start is RUNTIME (per-shard extended frame, scalar
        # prefetch); the static slot carries 0. y/z are lattice-global
        # (1-D x meshes leave them uncut).
        ob_x0_g = ob_sub[0].start
        oblique_win = (
            0, ob_sub[0].stop - ob_sub[0].start,
            ob_sub[1].start, ob_sub[1].stop - ob_sub[1].start,
            ob_sub[2].start, ob_sub[2].stop - ob_sub[2].start,
        )

    call, x_inputs, strip_inputs = _build_call(
        shape_ext, inv_dx, cpml, k, tfsf is not None, (0, 0), tfsf_box,
        float(dt), constants_key, interpret, int(max_sources), n_mat,
        x_extra=k, runtime_edges=True, runtime_xprof=True,
        with_m=bool(with_m), dtype_name=jnp.dtype(dtype).name,
        runtime_tfsf=tfsf is not None,
        y_halo=(h_blk if blocks is not None else (k if two_d else 0)),
        runtime_ystrips=runtime_ystrips,
        flux_faces=tuple(flux_faces), dft_rows=dft_rows,
        dense_spec=dense_spec,
        dft_rt=((tuple(w for _, w in dft_planes_g), n_freq_rt)
                if n_rt else None),
        runtime_box_lat=runtime_box_lat, runtime_lat=runtime_lat,
        blocks=(None if blocks is None
                else (n_b_blk, nly_b, h_blk)),
        oblique_win=oblique_win, runtime_oblique=oblique is not None,
    )
    assert not x_inputs  # runtime_xprof: profiles come in as an operand
    n_psi = len(layout)

    # donation variant for the second half of step2 (gb/blocks mode
    # only — the plain sharded kernel already aliases in->out, so its
    # outputs land in the loop-state buffers with no copy; the blocks
    # build cannot alias state operands and otherwise pays a full
    # local-state copy per pass at the scan boundary, ~14 ms/chip at
    # 512^2 lateral planes — the round-5 single-chip finding,
    # solver/pallas_cpml_xz.py step2)
    call_dst = None
    if (blocks is not None and not flux_faces and not dft_rows
            and dense_spec is None and not n_rt and oblique is None):
        call_dst, _, _ = _build_call(
            shape_ext, inv_dx, cpml, k, tfsf is not None, (0, 0),
            tfsf_box, float(dt), constants_key, interpret,
            int(max_sources), n_mat,
            x_extra=k, runtime_edges=True, runtime_xprof=True,
            with_m=bool(with_m), dtype_name=jnp.dtype(dtype).name,
            runtime_tfsf=tfsf is not None, y_halo=h_blk,
            runtime_ystrips=runtime_ystrips,
            runtime_box_lat=runtime_box_lat, runtime_lat=runtime_lat,
            blocks=(n_b_blk, nly_b, h_blk),
            zone_dst=tuple([True] * (6 + len(layout))),
        )

    def local_step(state: PmlKernelState, coeffs, sources, xprof_l, mid_l,
                   tf_rows, *extra, _dst=None, _ret_refreshed=False):
        # extra = [oblique correction stack][dense coefficient volume]
        # [DFT phase rows][per-y-shard strip profiles]; oblique/dense/
        # dft are 1-D-mesh-only, ystrips 2-D-only
        extra = list(extra)
        if oblique is not None:
            ob_stack_l = extra.pop(0)
        if n_dense:
            dco_l = extra.pop(0)
        if n_rt:
            dft_phase = extra.pop(0)
        ystr_l = extra
        idx = lax.axis_index(axis)
        up = [(i, i + 1) for i in range(n_dev - 1)]
        down = [(i + 1, i) for i in range(n_dev - 1)]
        if two_d:
            idx_y = lax.axis_index(y_axis)
            up_y = [(i, i + 1) for i in range(n_dy - 1)]
            down_y = [(i + 1, i) for i in range(n_dy - 1)]

        def refresh_x(f):
            # my outermost OWNED planes -> x neighbors' halos, at full
            # lateral width (runs AFTER refresh_y so the fresh lateral
            # halos ride along and cover the corner regions)
            recv_lo = lax.ppermute(f[nl: nl + k], axis, up)
            recv_hi = lax.ppermute(f[k: 2 * k], axis, down)
            return f.at[0:k].set(recv_lo).at[nl + k:].set(recv_hi)

        def refresh_y(f):
            # my outermost OWNED columns -> lateral neighbors' halos
            recv_lo = lax.ppermute(f[:, nly: nly + k], y_axis, up_y)
            recv_hi = lax.ppermute(f[:, k: 2 * k], y_axis, down_y)
            return f.at[:, 0:k].set(recv_lo).at[:, nly + k:].set(recv_hi)

        def refresh_field(f):
            if two_d:
                f = refresh_y(f)
            return refresh_x(f)

        fields = {name: refresh_field(getattr(state, name))
                  for name in _FIELDS}
        # psi exchange per entry kind: x-slabs (axis 0) persist at every
        # lateral column -> lateral refresh only; y-strips (axis 1) are
        # plane-local in x -> x refresh only (their lateral live region
        # never overlaps halo recompute); z-strips (axis 2) need both.
        psi = []
        for entry, t in zip(layout, state.psi):
            a = entry[1]
            if two_d and a in (0, 2):
                t = refresh_y(t)
            if a in (1, 2):
                t = refresh_x(t)
            psi.append(t)

        big = 2**30
        lo_edge = jnp.where(idx == 0, k, -big)
        hi_edge = jnp.where(idx == n_dev - 1, nl + k - 1, big)
        if two_d:
            ylo_e = jnp.where(idx_y == 0, k, -big)
            yhi_e = jnp.where(idx_y == n_dy - 1, nly + k - 1, big)
        else:
            ylo_e, yhi_e = jnp.int32(0), jnp.int32(ny - 1)
        edges = jnp.stack(
            [lo_edge, hi_edge, ylo_e, yhi_e,
             jnp.int32(0), jnp.int32(nz - 1)]
        ).astype(jnp.int32).reshape(1, 6)

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
        if runtime_lat:
            # extended-frame "y" coordinates: flux descriptors first,
            # then row captures — the kernel's lat_ref slot order. On
            # non-owning y-shards the shifted value lands outside the
            # owned window and the kernel's masks stay empty.
            off_y = k - idx_y * nly
            lvals = [fd[1] + off_y for fd in flux_faces if fd[0] == "y"]
            lvals += [v + off_y for a, v in dft_rows if a == "y"]
            args.append(
                jnp.stack(lvals).astype(jnp.int32).reshape(1, len(lvals))
            )
        if has_x:
            args.append(xprof_l.reshape(2, 5, nle))
        if tfsf is not None:
            # slab: (2K, 2) pre-gathered aux scalars; box: full (2K, aux)
            # rows (the lateral faces gather aux at every in-box plane)
            args.append(tf_rows)
            off = k - idx * nl
            vals = [tf_lo + off, tf_hi + off]
            if tfsf_box is not None:
                vals.append(off)  # extended -> global coordinate offset
                if runtime_box_lat:
                    # per-shard y-face coordinates in the EXTENDED y
                    # frame; out-of-range values on non-owning shards
                    # simply make the kernel's masks empty
                    off_y = k - idx_y * nly
                    (sy0, sy1) = tfsf_box[0]
                    vals += [sy0 + off_y, sy1 + off_y]
            args.append(
                jnp.stack(vals).astype(jnp.int32).reshape(1, len(vals))
            )
        if max_sources > 0:
            # rows [px_ext, py(_ext), pz, J levels 1..K (+ M levels
            # 1..K)]; extended coordinates are NOT clipped, so halo
            # copies get the injection the redundant recompute needs
            pts = sources.points.astype(jnp.float32)
            pts = pts.at[:, 0].add((k - idx * nl).astype(jnp.float32))
            if two_d:
                pts = pts.at[:, 1].add(
                    (k - idx_y * nly).astype(jnp.float32))
            rows = [pts]
            m_rows = []
            for lvl in range(k):
                t = (state.tick + lvl).astype(jnp.float32) * jnp.float32(dt)
                j_vals, m_vals = sources.values(t)
                rows.append(j_vals.astype(jnp.float32))
                if with_m:
                    m_rows.append(m_vals.astype(jnp.float32))
            args.append(jnp.concatenate(rows + m_rows, axis=1))
        if blocks is not None and has_ystrips:
            # gb mode: per-BLOCK stacked y-strip profiles (replicated),
            # interleaved with the baked z strips in the kernel's
            # (h,1),(h,2),(e,1),(e,2) order (the single-chip gb packing)
            z_iter = iter(strip_inputs)
            for half in ("h", "e"):
                args.append(ystr_blk[half])
                if has_zstrips:
                    args.append(next(z_iter))
        elif runtime_ystrips:
            # interleave per-shard y-strip profiles with the baked z
            # strips in the kernel's (h,1),(h,2),(e,1),(e,2) order
            z_iter = iter(strip_inputs)
            for ystr in ystr_l:
                args.append(ystr.reshape(ystr.shape[1:]))
                if has_zstrips:
                    args.append(next(z_iter))
        else:
            args += strip_inputs
        if matid is not None:
            args += [mid_l] * k
        if n_dense:
            # per-shard coefficient volume (identity outside the global
            # box) + the region psi in per-shard extended layout, its x
            # halo planes refreshed like the z-strip psi (volume plane
            # j <-> extended plane j-1; plane 0 is the trash plane).
            # Under a 2-D mesh the volume spans the full extended
            # lateral plane: lateral halo columns refresh FIRST (owned
            # columns), then the x phase ships full-lateral-width
            # planes — the same two-phase order as the fields.
            dco_vol = dco_l.reshape(dco_l.shape[2:])
            args += [dco_vol] * k
            dp = state.psi[n_psi]
            if two_d:
                rl_y = lax.ppermute(dp[:, :, nly: nly + k], y_axis, up_y)
                rh_y = lax.ppermute(dp[:, :, k: 2 * k], y_axis, down_y)
                dp = dp.at[:, :, 0:k].set(rl_y) \
                       .at[:, :, nly + k:].set(rh_y)
            recv_lo = lax.ppermute(dp[:, 1 + nl: 1 + nl + k], axis, up)
            recv_hi = lax.ppermute(dp[:, 1 + k: 1 + 2 * k], axis, down)
            dp = dp.at[:, 1: 1 + k].set(recv_lo) \
                   .at[:, 1 + nl + k:].set(recv_hi)
            args.append(dp)
        if oblique is not None:
            # per-stage correction blocks all reference the one stack
            # (the single-chip packing); the runtime x offset goes in
            # through the scalar-prefetch operand below
            args += [ob_stack_l] * k
        if n_rt:
            # runtime x-plane DFT: the (K, 2F) phase rows, then each
            # plane's coordinate in THIS shard's extended frame (owner)
            # or an off-grid sentinel (everyone else), then the shard's
            # resident accumulator blocks from the psi tail
            args.append(dft_phase)
            off = k - idx * nl
            coords = []
            for x0g, _w in dft_planes_g:
                owner = idx == x0g // nl
                coords.append(jnp.where(owner, x0g + off, -(2 ** 30)))
            args.append(
                jnp.stack(coords).astype(jnp.int32).reshape(1, n_rt)
            )
            args += list(state.psi[n_psi + n_dense:
                                   n_psi + n_dense + n_rt])
        if blocks is not None:
            # laterally-windowed operands repeat per (left, center,
            # right) spec; y-strip psi stays a single per-block ref
            for n in _FIELDS:
                args += [fields[n]] * 3
            args += [fields["ey"]] * 3 + [fields["ez"]] * 3
            for entry, t in zip(layout, psi):
                args += [t] if entry[1] == 1 else [t] * 3
        else:
            args += [fields[n] for n in _FIELDS]
            args += [fields["ey"], fields["ez"]]
            args += psi
        if _dst is not None:
            # step2's second pass: donate the first pass's refreshed
            # input arrays (dead) as destinations, so the results land
            # in the scan's loop-state buffers with no copy
            dst_fields, dst_psi = _dst
            assert call_dst is not None
            for n in _FIELDS:
                args.append(dst_fields[n])
            args += list(dst_psi)
            outs = call_dst(*args)
        elif oblique is not None:
            # scalar-prefetch operand: the oblique subgrid's x start in
            # THIS shard's extended frame (halo copies of a plane apply
            # the same correction their owner does — uniform shift)
            ob_x0 = (jnp.asarray(ob_x0_g, jnp.int32)
                     + (k - idx * nl).astype(jnp.int32)).reshape(1)
            outs = call(ob_x0, *args)
        else:
            outs = call(*args)
        psi_new = tuple(outs[6: 6 + n_psi])
        n_out = 6 + n_psi
        if n_dense:
            psi_new = psi_new + (outs[n_out],)
            n_out += 1
        if n_rt:
            psi_new = psi_new + tuple(outs[n_out: n_out + n_rt])
            n_out += n_rt
        new = PmlKernelState(
            ex=outs[0], ey=outs[1], ez=outs[2],
            hx=outs[3], hy=outs[4], hz=outs[5],
            tick=state.tick + k, psi=psi_new,
            aux_e=state.aux_e, aux_h=state.aux_h,
        )
        res = [new]
        zero32 = jnp.zeros((), jnp.int32)
        x0_32 = (idx * nl).astype(jnp.int32)
        # reductions/captures psum over BOTH mesh axes under a 2-D
        # decomposition (each y-shard contributes its owned lateral
        # partials; non-owning shards contribute zeros)
        red_axes = (axis, y_axis) if two_d else axis
        if flux_faces:
            # shard-local extended rows -> GLOBAL (K, nx, n_q): keep the
            # owned planes, scatter to global positions, psum
            n_q = len(flux_faces)
            rows_ext = jnp.stack(
                outs[n_out: n_out + k])[:, 1: nle + 1, 0, :n_q]
            n_out += k
            owned = rows_ext[:, k: k + nl]
            glob = lax.dynamic_update_slice(
                jnp.zeros((k, nx, n_q), jnp.float32), owned,
                (zero32, x0_32, zero32),
            )
            res.append(lax.psum(glob, red_axes))
        if dft_rows:
            # capture sets in kernel order (one per "y" desc, one shared
            # "z" set): owned extended planes -> global scatter -> psum,
            # re-emitted in the caller's dft_rows order (single-chip
            # contract, (K, nx, 6, lat) per descriptor)
            def to_global(owned4, lat_n=None, y_off=None):
                # lat_n/y_off: global lateral extent + this shard's
                # offset when the capture's lateral dim is cut (z
                # captures under 2-D meshes); default = uncut last dim
                glob = lax.dynamic_update_slice(
                    jnp.zeros(
                        (k, nx) + owned4.shape[2:-1]
                        + (owned4.shape[-1] if lat_n is None else lat_n,),
                        jnp.float32),
                    owned4,
                    (zero32, x0_32, zero32,
                     zero32 if y_off is None else y_off),
                )
                return lax.psum(glob, red_axes)

            y_caps = []
            for _ in range(sum(1 for d in dft_rows if d[0] == "y")):
                blk = jnp.stack(
                    outs[n_out: n_out + k])[:, 1 + k: 1 + k + nl, 0:6, :]
                n_out += k
                y_caps.append(to_global(blk))
            z_block = None
            if any(d[0] == "z" for d in dft_rows):
                z_block = jnp.stack(
                    outs[n_out: n_out + k])[:, 1 + k: 1 + k + nl]
                n_out += k
                if two_d:
                    # drop the lateral halo columns; scatter the owned
                    # window into its global y position
                    z_block = z_block[:, :, k: k + nly]
            caps, yi, zi = [], 0, 0
            for a, _v in dft_rows:
                if a == "y":
                    caps.append(y_caps[yi]); yi += 1
                else:
                    blk = jnp.transpose(
                        z_block[:, :, :, 6 * zi: 6 * zi + 6], (0, 1, 3, 2)
                    )
                    if two_d:
                        caps.append(to_global(
                            blk, ny, (idx_y * nly).astype(jnp.int32)))
                    else:
                        caps.append(to_global(blk))
                    zi += 1
            res.append(tuple(caps))
        if _ret_refreshed:
            assert len(res) == 1  # step2 excludes flux/dft extras
            return res[0], fields, psi
        return res[0] if len(res) == 1 else tuple(res)

    def local_step2(state: PmlKernelState, coeffs, sources, xprof_l,
                    mid_l, tf_rows_a, tf_rows_b, *extra):
        mid, f1, p1 = local_step(
            state, coeffs, sources, xprof_l, mid_l, tf_rows_a, *extra,
            _ret_refreshed=True)
        out, _, _ = local_step(
            mid, coeffs, sources, xprof_l, mid_l, tf_rows_b, *extra,
            _dst=(f1, p1), _ret_refreshed=True)
        return out

    def _ystrip_to_gb(t, plo):
        """Canonical (nx_e, plo+phi, nz) y-strip psi -> the per-block
        (nx_e, n_b*(plo+phi), nz) gb layout (lo rows on block 0's slice,
        hi rows on the last block's, zeros elsewhere — the identity
        profiles on non-owner blocks keep them zero, so the round trip
        is lossless; mirrors solver.pallas_cpml_gb.extend_gb_pml_state
        on the extended-sharded tensors)."""
        lo, hi = t[:, :plo], t[:, plo:]
        zlo, zhi = jnp.zeros_like(lo), jnp.zeros_like(hi)
        return jnp.concatenate(
            [jnp.concatenate(
                [lo if i == 0 else zlo,
                 hi if i == n_b_blk - 1 else zhi], axis=1)
             for i in range(n_b_blk)], axis=1)

    def _ystrip_from_gb(t, plo):
        p = t.shape[1] // n_b_blk
        return jnp.concatenate(
            [t[:, :plo], t[:, (n_b_blk - 1) * p + plo:]], axis=1)

    fspec = P(axis, y_axis, None)
    state_spec = PmlKernelState(
        **{n: fspec for n in _FIELDS}, tick=P(),
        # psi tail: the DensePml region psi as (n_dev*4, nle+1,
        # [n_dy*]by, bz) sharded over dims 0 (x) and 2 (lateral, 2-D
        # meshes), then the rt DFT accumulators as (n_dev*6F,
        # [n_dy*]ny[_ext], nz) — each shard's local block is exactly
        # the kernel's operand shape
        psi=tuple(fspec for _ in layout)
        + (P(axis, None, y_axis, None),) * n_dense
        + (fspec,) * n_rt,
        aux_e=P(), aux_h=P(),
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
            else jnp.zeros((n_dev, n_dy, 1), jnp.uint8)
        )
        aux_e, aux_h = state.aux_e, state.aux_h
        if tfsf is not None:
            # tick the replicated 1-D aux grid K times OUTSIDE shard_map.
            # Slab mode pre-gathers the four plane-adjacent scalars per
            # level; box mode ships the full rows (OLD aux_e / NEW aux_h
            # per tick, the single-chip kernel's pack) because the
            # lateral faces read aux at every plane inside the box span.
            rows = []
            for lvl in range(k):
                t = (state.tick + lvl).astype(jnp.float32) * jnp.float32(dt)
                new_e, new_h = tfsf.aux_step(
                    aux_e, aux_h, aux_coeffs, t, inv_dx[0], jnp.float32
                )
                if tfsf_box is not None:
                    rows.append(aux_e)
                    rows.append(new_h)
                else:
                    rows.append(jnp.stack([aux_e[tf_lo - 1], aux_e[tf_hi]]))
                    rows.append(jnp.stack([new_h[tf_lo], new_h[tf_hi + 1]]))
                aux_e, aux_h = new_e, new_h
            tf_rows = jnp.stack(rows)
        else:
            tf_rows = jnp.zeros((1, 2), jnp.float32)
        if blocks is not None and has_ystrips:
            # canonical -> per-block y-strip psi for the gb kernel
            state = state._replace(psi=tuple(
                _ystrip_to_gb(t, entry[5][2]) if entry[1] == 1 else t
                for entry, t in zip(layout, state.psi)))
        operands = [state, coeffs, sources, xprof, mid_arg, tf_rows]
        specs = [
            state_spec,
            jax.tree.map(lambda _: P(), coeffs),
            jax.tree.map(lambda _: P(), sources),
            P(axis, None, None, None),
            P(axis, y_axis, None),
            P(None, None),
        ]
        if oblique is not None:
            # per-pass analytic correction stack (K, 6, xl, by, bz) in
            # GLOBAL coordinates, replicated — corr_h at each level's
            # tick, corr_e at tick + 1/2 (the single-chip packing,
            # solver/pallas_cpml_k.py oblique=)
            rows = []
            for lvl in range(k):
                t = (state.tick + lvl).astype(jnp.float32) \
                    * jnp.float32(dt)
                ch = ob_corr_h(t)
                ce = ob_corr_e(t + jnp.float32(0.5 * dt))
                rows.append(jnp.stack(list(ch) + list(ce)))
            operands.append(jnp.stack(rows))
            specs.append(P(None, None, None, None, None))
        if n_dense or n_rt:
            if len(state.psi) != n_psi + n_dense + n_rt:
                raise ValueError(
                    f"kernel expects {n_dense + n_rt} psi tail entries "
                    f"(init_sharded_pml_state dense=/dft=); got "
                    f"{len(state.psi) - n_psi}"
                )
        if n_dense:
            operands.append(dco_ext)
            specs.append(P(axis, y_axis, None, None, None, None))
        if n_rt:
            import math as _math

            freqs_a = jnp.asarray(dft_freqs_t, jnp.float32)
            two_pi = jnp.float32(2.0 * _math.pi)
            rows = []
            for lvl in range(k):
                t = (state.tick + 1 + lvl).astype(jnp.float32) \
                    * jnp.float32(dt)
                ph = -two_pi * freqs_a * t
                rows.append(
                    jnp.stack([jnp.cos(ph), jnp.sin(ph)], axis=1)
                    .reshape(-1)
                )
            operands.append(jnp.stack(rows))  # (K, 2F), replicated
            specs.append(P(None, None))
        if runtime_ystrips:
            operands += [ystr_h, ystr_e]
            specs += [P(y_axis, None, None, None)] * 2
        out_spec_l = [state_spec]
        if flux_faces:
            out_spec_l.append(P(None, None, None))
        if dft_rows:
            out_spec_l.append(tuple(P(None, None, None, None)
                                    for _ in dft_rows))
        extras = flux_faces or dft_rows
        res = jax.shard_map(
            local_step,
            mesh=mesh,
            in_specs=tuple(specs),
            out_specs=tuple(out_spec_l) if extras else state_spec,
            check_vma=False,
        )(*operands)
        if extras:
            out = res[0]
        else:
            out = res
        if blocks is not None and has_ystrips:
            # per-block -> canonical y-strip psi (owner slices only)
            out = out._replace(psi=tuple(
                _ystrip_from_gb(t, entry[5][2]) if entry[1] == 1 else t
                for entry, t in zip(layout, out.psi)))
        if tfsf is not None:
            out = out._replace(aux_e=aux_e, aux_h=aux_h)
        return (out, *res[1:]) if extras else out

    def step2(
        state: PmlKernelState, coeffs, sources
    ) -> PmlKernelState:
        """Advance 2*k ticks per call with zero loop-boundary copies
        (gb/blocks mode; see call_dst above). Bit-identical to two
        step() calls."""
        assert call_dst is not None
        if max_sources > 0 and (
            sources is None or sources.num_sources != max_sources
        ):
            raise ValueError(
                f"kernel built for {max_sources} in-kernel sources, got "
                f"{0 if sources is None else sources.num_sources}"
            )
        mid_arg = (
            mid_ext if mid_ext is not None
            else jnp.zeros((n_dev, n_dy, 1), jnp.uint8)
        )
        aux_e, aux_h = state.aux_e, state.aux_h
        tf_stacks = []
        if tfsf is not None:
            for half in range(2):
                rows = []
                for lvl in range(k):
                    t = (state.tick + half * k + lvl).astype(jnp.float32) \
                        * jnp.float32(dt)
                    new_e, new_h = tfsf.aux_step(
                        aux_e, aux_h, aux_coeffs, t, inv_dx[0],
                        jnp.float32
                    )
                    if tfsf_box is not None:
                        rows.append(aux_e)
                        rows.append(new_h)
                    else:
                        rows.append(jnp.stack(
                            [aux_e[tf_lo - 1], aux_e[tf_hi]]))
                        rows.append(jnp.stack(
                            [new_h[tf_lo], new_h[tf_hi + 1]]))
                    aux_e, aux_h = new_e, new_h
                tf_stacks.append(jnp.stack(rows))
        else:
            tf_stacks = [jnp.zeros((1, 2), jnp.float32)] * 2
        if blocks is not None and has_ystrips:
            state = state._replace(psi=tuple(
                _ystrip_to_gb(t, entry[5][2]) if entry[1] == 1 else t
                for entry, t in zip(layout, state.psi)))
        operands = [state, coeffs, sources, xprof, mid_arg,
                    tf_stacks[0], tf_stacks[1]]
        specs = [
            state_spec,
            jax.tree.map(lambda _: P(), coeffs),
            jax.tree.map(lambda _: P(), sources),
            P(axis, None, None, None),
            P(axis, y_axis, None),
            P(None, None),
            P(None, None),
        ]
        if runtime_ystrips:
            operands += [ystr_h, ystr_e]
            specs += [P(y_axis, None, None, None)] * 2
        out = jax.shard_map(
            local_step2,
            mesh=mesh,
            in_specs=tuple(specs),
            out_specs=state_spec,
            check_vma=False,
        )(*operands)
        if blocks is not None and has_ystrips:
            out = out._replace(psi=tuple(
                _ystrip_from_gb(t, entry[5][2]) if entry[1] == 1 else t
                for entry, t in zip(layout, out.psi)))
        if tfsf is not None:
            out = out._replace(aux_e=aux_e, aux_h=aux_h)
        return out

    step.step2 = step2 if call_dst is not None else None
    return step
