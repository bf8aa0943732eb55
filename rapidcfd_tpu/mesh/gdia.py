"""Generalized-DIA mesh mode — gather-free kernels for lattice-derived
unstructured meshes (snappyHexMesh-class: a hex background lattice with
merged/polyhedral cells).

TPU gathers cost ~6.6ns/element (they run essentially scalar), which is
~1000x off HBM speed for finite-volume index patterns; the structured
fast path (mesh/structured.py) removes them for perfect boxes. This
module extends that idea to meshes that are a box lattice MINUS some
internal faces (cell merges → polyhedral cells) — the topology class
produced by hex-dominant mesh generators:

- every CELL occupies one or more lattice SLOTS on an (nz, ny, nx)
  grid: one *primary* slot (carrying the DOF) plus *ghost* slots for
  merged-away neighbours; unused slots are *dead*;
- every internal face separates two lattice-adjacent slots, so faces
  pack into up to three full (n_lat,) *planes* (offset +1, +nx,
  +nx*ny), one slot each, with zero-coefficient dummies where the
  lattice has no face;
- fields are stored PADDED (n_cells == n_lat) with the invariant that
  ghost slots mirror their primary's value ("ghost-synced") — kept by
  `sync`, a handful of masked shifts (NOT a gather: merges only ever
  join lattice-adjacent slots, so a ghost's primary is its predecessor
  along one flat offset);
- the matrix off-diagonal product is plane-shifted multiply-adds with
  an `unfold` (ghost := primary) before and a `fold` (primary += ghost,
  ghost := 0) after — both masked shifts;
- assembly (negSumDiag, dia planes, face own/nei values, surface sums)
  is flat pads/slices exactly like the banded DIA SpMV.

ALL kernels operate on FLAT (n_lat,) arrays with flat-offset shifts —
3-D grid reshapes tile poorly on TPU ((8,128) tiling of the trailing
dims made every slice/pad a ~0.8ms relayout at 115k cells; the flat
form is a plain memcpy-class op). Shifts wrap across lattice rows; the
wrapped positions are exactly the always-dummy lattice-edge slots,
whose coefficients are identically zero, and raw face data is masked by
`plane_mask` where it could leak (surface sums).

Reference counterpart: the lduAddressing gather machinery
(src/OpenFOAM/matrices/lduMatrix/lduAddressing/lduAddressing.H:243-252,
lduMatrixATmul.C:43-140) — re-founded for a machine with no fast
gather. The padded-ELL path remains the fallback for faces/ops outside
this structure.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax import lax


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class GdiaInfo:
    """Lattice embedding of a polyhedral mesh (pytree: masks are leaves,
    shape metadata static)."""
    # (n_lat,) 1.0 where the slot is a ghost whose primary is the slot
    # `step` BEFORE it along plane axis p (zeros when no merges there)
    ghost_prev: tuple            # tuple of (n_lat,) f32, one per plane
    dead: jax.Array              # (n_lat,) 1.0 where slot is dead
    primary: jax.Array           # (n_lat,) 1.0 where slot carries a DOF
    # (n_planes * n_lat,) 1.0 at REAL plane faces, 0.0 at dummies
    plane_mask: jax.Array | None = None
    shape: tuple = dataclasses.field(default=(), metadata=dict(static=True))
    # number of sync sweeps needed (max merge-chain length; 1 when no
    # cell is merged more than once)
    sync_iters: int = dataclasses.field(default=1,
                                        metadata=dict(static=True))
    # which of the three planes exist (nx>1, ny>1, nz>1)
    axes: tuple = dataclasses.field(default=(), metadata=dict(static=True))

    @property
    def n_lat(self) -> int:
        nz, ny, nx = self.shape
        return nz * ny * nx

    @property
    def steps(self) -> tuple:
        """Flat offset per present plane, in plane order (x, y, z)."""
        nz, ny, nx = self.shape
        out = []
        if self.axes[0]:
            out.append(1)
        if self.axes[1]:
            out.append(nx)
        if self.axes[2]:
            out.append(nx * ny)
        return tuple(out)


def _bcast(mask_flat, x):
    return mask_flat.reshape(mask_flat.shape + (1,) * (x.ndim - 1))


def _shift_flat(x, d, n):
    """result[s] = x[s - d] (flat, zero-filled outside [0, n))."""
    if d == 0:
        return x
    pad = [(0, 0)] * x.ndim
    if d > 0:
        pad[0] = (d, 0)
        return jnp.pad(x[:n - d], pad)
    pad[0] = (0, -d)
    return jnp.pad(x[-d:], pad)


def plane_steps(info: GdiaInfo):
    """(plane_index, flat_step) for each present plane."""
    return list(enumerate(info.steps))


def n_plane_faces(info: GdiaInfo) -> int:
    return len(info.steps) * info.n_lat


def face_planes(info: GdiaInfo, face_data):
    """Split internal-face data into its per-plane flat arrays."""
    n = info.n_lat
    return [face_data[i * n:(i + 1) * n]
            for i in range(len(info.steps))]


# ---------------------------------------------------------------------------
# ghost sync / fold — masked flat shifts
# ---------------------------------------------------------------------------

def sync(info: GdiaInfo, x):
    """Ghost-sync: x[ghost] := x[primary]. Masked flat shifts only
    (ghost masks are zero at lattice edges, so wrap is unreachable)."""
    n = info.n_lat
    for _ in range(info.sync_iters):
        for (pi, step) in plane_steps(info):
            m = info.ghost_prev[pi]
            if m is None:
                continue
            mm = _bcast(m, x)
            x = mm * _shift_flat(x, step, n) + (1.0 - mm) * x
    return x


def fold(info: GdiaInfo, y):
    """Fold ghost rows into primaries: y[primary] += y[ghost];
    y[ghost] := 0. Exact transpose of sync (axes reversed per sweep)."""
    n = info.n_lat
    for _ in range(info.sync_iters):
        for (pi, step) in reversed(plane_steps(info)):
            m = info.ghost_prev[pi]
            if m is None:
                continue
            mm = _bcast(m, y)
            y = y + _shift_flat(mm * y, -step, n) - mm * y
    return y


def unfold(info: GdiaInfo, x):
    """x with ghost entries replaced by their primary's value (identical
    to sync)."""
    return sync(info, x)


# ---------------------------------------------------------------------------
# face-plane kernels — faces laid out as [x-plane | y-plane | z-plane |
# boundary], each plane (n_lat,) with slot s = face between s and s+step
# ---------------------------------------------------------------------------

def face_own_nei(info: GdiaInfo, x):
    """(own, nei) cell values on the plane faces (x ghost-synced).
    own[plane p, slot s] = x[s]; nei = x[s + step]. Values at dummy
    faces are garbage-but-finite; every consumer multiplies them by a
    zero coefficient (Sf/magSf/phi are zero at dummies)."""
    n = info.n_lat
    xs = sync(info, x)
    owns, neis = [], []
    for (pi, step) in plane_steps(info):
        owns.append(xs)
        neis.append(_shift_flat(xs, -step, n))
    return jnp.concatenate(owns, axis=0), jnp.concatenate(neis, axis=0)


def surface_sum_internal(info: GdiaInfo, face_data, signed: bool):
    """Per-slot sum over plane faces: out[own] += f, out[nei] -+= f.
    face_data is masked at dummy faces so edge wrap cannot leak. The
    mask is a SELECT, not a multiply: solver-produced face data can be
    inf/nan at zero-area dummy faces (e.g. Kurganov wave-speed ratios),
    and 0 * nan = nan would poison the live sums."""
    sgn = -1.0 if signed else 1.0
    n = info.n_lat
    if info.plane_mask is not None:
        m = _bcast(info.plane_mask, face_data)
        face_data = jnp.where(m > 0, face_data, 0.0)
    out = None
    for (pi, step), f in zip(plane_steps(info),
                             face_planes(info, face_data)):
        contrib = f + sgn * _shift_flat(f, step, n)
        out = contrib if out is None else out + contrib
    return out


def neg_sum_diag(info: GdiaInfo, lower, upper):
    """-(column sums of the off-diagonals): diag[own] -= lower[f],
    diag[nei] -= upper[f] (lduMatrix::negSumDiag). Coefficients are
    zero at dummies by construction."""
    n = info.n_lat
    out = None
    for (pi, step), lp, up in zip(plane_steps(info),
                                  face_planes(info, lower),
                                  face_planes(info, upper)):
        contrib = lp + _shift_flat(up, step, n)
        out = contrib if out is None else out + contrib
    return -out


def dia_planes(info: GdiaInfo, lower, upper):
    """[(offset, coeff plane flat (n_lat,))] for the shift SpMV:
    c_{+step}[s] = upper[face at slot s]; c_{-step}[s] = lower[face at
    slot s-step]."""
    n = info.n_lat
    planes = []
    for (pi, step), lp, up in zip(plane_steps(info),
                                  face_planes(info, lower),
                                  face_planes(info, upper)):
        planes.append((step, up))
        planes.append((-step, _shift_flat(lp, step, n)))
    return planes


def offdiag_mv(info: GdiaInfo, lower, upper):
    """x -> fold(planes @ unfold(x)): the gather-free off-diagonal
    product. x may be (n_lat,) or (n_lat, m); ghost/dead entries of the
    result are zero (folded)."""
    planes = dia_planes(info, lower, upper)
    n = info.n_lat
    max_off = max(abs(d) for d, _ in planes) if planes else 0

    def mv(x):
        two_d = x.ndim == 2
        vec = x if two_d else x[:, None]
        vec = unfold(info, vec)
        m = vec.shape[1]
        zpad = jnp.zeros((max_off, m), x.dtype)
        xp = jnp.concatenate([zpad, vec, zpad])
        y = jnp.zeros_like(vec)
        for d, c_d in planes:
            y = y + c_d[:, None] * lax.dynamic_slice_in_dim(
                xp, max_off + d, n)
        y = fold(info, y)
        return y if two_d else y[:, 0]

    return mv


def internal_flux(info: GdiaInfo, psi, lower, upper):
    """upper*psi[nei] - lower*psi[own] on plane faces (faceH)."""
    own, nei = face_own_nei(info, psi)
    r = (1,) * (own.ndim - 1)
    return upper.reshape(upper.shape + r) * nei \
        - lower.reshape(lower.shape + r) * own


# ---------------------------------------------------------------------------
# precomputed Gauss shift-MAC planes — the fused fvc fast path
# ---------------------------------------------------------------------------
#
# The generic face_values -> Sf-multiply -> surface_sum pipeline
# materializes O(10) full face-sized intermediates per operator and (on
# TPU) some land in the 42x-padded (n, 3)-minor layout; measured on the
# 115k-cell polyhedral channel, one fvc.grad(p) accessed 2.9 GB of HBM
# (XLA cost analysis) for an op whose intrinsic traffic is ~30 MB. The
# linear-weight Gauss operators are SHIFT-MACs with mesh-constant
# coefficients:
#
#   out_c[s] = sum_p ( Sf_pc[s] w_p[s] - Sf_pc[s-d] (1-w_p[s-d]) ) x[s]
#            + Sf_pc[s] (1-w_p[s]) x[s+d]  -  Sf_pc[s-d] w_p[s-d] x[s-d]
#
# so the coefficient planes are precomputed ONCE at mesh build
# (build_gauss_planes) and each gradient/divergence evaluation is one
# pad + K dynamic-slice FMAs over flat (n,) arrays (layout-safe linear
# tiling) + the boundary scatter + fold/sync. Same rewrite measured:
# 2.9 GB -> 153 MB, bit-exact. Reference counterpart: gaussGrad.C's
# face loop (surfaceIntegrate.C:41-100) — re-founded as a stencil with
# compile-time coefficients instead of a runtime face gather.


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class GaussPlanes:
    """Shift-MAC coefficients of the linear-weight Gauss surface sum
    over internal lattice faces: out[c, s] = sum_k coeffs[k, c, s] *
    x[s + offsets[k]] (zero-filled outside [0, n)). Cell-axis-LAST
    (minor) so every op tiles over the large dimension; coeffs_i are
    the per-direction (K, 1, n) contiguous slices consumed by the
    divergence contraction (ops/pallas_gdia.py)."""
    coeffs: jax.Array            # (K, 3, n_lat)
    coeffs_i: tuple              # 3 x (K, 1, n_lat)
    offsets: tuple = dataclasses.field(default=(),
                                       metadata=dict(static=True))


def build_gauss_planes(info: GdiaInfo, Sf, weights) -> GaussPlanes:
    """Host-side: combine Sf planes and owner weights into the grad
    MAC coefficients (see module comment for the expansion)."""
    import numpy as np
    n = info.n_lat
    steps = info.steps
    Sf = np.asarray(Sf)
    w = np.asarray(weights)

    def np_shift(a, d):
        out = np.zeros_like(a)
        if d > 0:
            out[d:] = a[:-d] if d else a
        elif d < 0:
            out[:d] = a[-d:]
        else:
            out = a.copy()
        return out

    coefs: dict[int, np.ndarray] = {}

    def acc(off, c):
        coefs[off] = coefs.get(off, 0) + c
    for i, st in enumerate(steps):
        Sfi = Sf[i * n:(i + 1) * n, :]
        wi = w[i * n:(i + 1) * n][:, None]
        acc(0, Sfi * wi - np_shift(Sfi * (1.0 - wi), st))
        acc(st, Sfi * (1.0 - wi))
        acc(-st, -np_shift(Sfi * wi, st))
    offs = tuple(sorted(coefs))
    coeffs = np.stack([coefs[o] for o in offs])        # (K, n, 3)
    ct = np.ascontiguousarray(np.swapaxes(coeffs, 1, 2))   # (K, 3, n)
    return GaussPlanes(
        coeffs=jnp.asarray(ct, Sf.dtype),
        coeffs_i=tuple(jnp.asarray(
            np.ascontiguousarray(ct[:, i:i + 1, :]), Sf.dtype)
            for i in range(3)),
        offsets=offs)


def pad_cell(x, D: int):
    """x (n,)+rank zero-padded by D on both ends of axis 0."""
    pad = [(D, D)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pad)


def _shift_last(x, d, n):
    """result[..., s] = x[..., s - d] (zero-filled outside [0, n))."""
    if d == 0:
        return x
    pad = [(0, 0)] * (x.ndim - 1)
    if d > 0:
        return jnp.pad(x[..., :n - d], pad + [(d, 0)])
    return jnp.pad(x[..., -d:], pad + [(0, -d)])


def sync_last(info: GdiaInfo, x):
    """Ghost-sync over the LAST axis of a (..., n_lat) array (the
    cell-axis-last layout used by the Gauss MAC layer)."""
    n = info.n_lat
    for _ in range(info.sync_iters):
        for (pi, step) in plane_steps(info):
            m = info.ghost_prev[pi]
            if m is None:
                continue
            x = m * _shift_last(x, step, n) + (1.0 - m) * x
    return x


def fold_last(info: GdiaInfo, y):
    """Fold over the LAST axis of a (..., n_lat) array (transpose of
    sync_last)."""
    n = info.n_lat
    for _ in range(info.sync_iters):
        for (pi, step) in reversed(plane_steps(info)):
            m = info.ghost_prev[pi]
            if m is None:
                continue
            y = y + _shift_last(m * y, -step, n) - m * y
    return y


def gauss_mac3(info: GdiaInfo, planes: GaussPlanes, x):
    """Internal-face Gauss sum of a ghost-synced scalar cell field:
    (3, n) per-slot partial sums (pre-fold), via the shift-MAC kernel
    (ops/pallas_gdia.py)."""
    from ..ops.pallas_gdia import shift_mac_cols
    return shift_mac_cols(x, planes.coeffs, planes.offsets)


def gauss_mac1(info: GdiaInfo, planes: GaussPlanes, i: int, x):
    """Single-direction Gauss sum: (n,) partials of planes_i applied
    to a scalar cell field (the divergence contraction building
    block)."""
    from ..ops.pallas_gdia import shift_mac_cols
    return shift_mac_cols(x, planes.coeffs_i[i], planes.offsets)[0]


def flux_mac(info: GdiaInfo, Sf, weights, x):
    """Plane-face fluxes of a ghost-synced (n, 3) vector field:
    phi_p[s] = sum_c Sf_pc[s] (w_p[s] x_c[s] + (1-w_p[s]) x_c[s+d]).
    Returns the (n_planes*n,) internal flux array. Column-sliced: all
    arithmetic on contiguous (n,) arrays."""
    n = info.n_lat
    steps = info.steps
    D = max(steps)
    cols = [x[:, c] for c in range(x.shape[1])]
    pads = [pad_cell(c_, D) for c_ in cols]
    out = []
    for i, st in enumerate(steps):
        wi = weights[i * n:(i + 1) * n]
        acc = None
        for c in range(len(cols)):
            sfc = Sf[i * n:(i + 1) * n, c]
            xn = lax.dynamic_slice_in_dim(pads[c], D + st, n)
            t = sfc * (wi * cols[c] + (1.0 - wi) * xn)
            acc = t if acc is None else acc + t
        out.append(acc)
    return jnp.concatenate(out)


def fold_diag(info: GdiaInfo, diag):
    """Fold per-slot diagonal contributions into the primary row and
    NULL the ghost/dead rows (diag 0 — their rhs is zeroed by the
    caller, ops/fvmatrix._gdia_fold_system).

    Null rows (0*x = 0), not identity rows (1*x = psi): both are inert
    in the Krylov iteration ((A x)_g = 0 after fold, r_g = 0), but an
    identity row's |source - A(xRef*ones)| = |psi_g - xRef| ~ O(psi)
    enters the residual NORM FACTOR (lduMatrix::solver::normFactor,
    linalg/solvers._norm_factor) at full field scale while live FV rows
    contribute ~V*coeff scale — on a masked pitzDaily the ~240 dead
    slots inflated normFactor ~1e6x, the normalized initial residual
    read 1e-7 "converged" at loose fp32 tolerances, and the pressure
    field froze after one SIMPLE step. Zero rows contribute exactly
    nothing to any residual sum. Solvers restore ghost values by
    sync() after the solve (linalg/solvers._gdia_sync)."""
    d = fold(info, diag)
    return d * _bcast(info.primary, d)
