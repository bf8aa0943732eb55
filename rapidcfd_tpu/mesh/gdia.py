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
  pack into up to three full (nz, ny, nx) *planes* (offset +1, +nx,
  +nx*ny), one slot each, with zero-coefficient dummies where the
  lattice has no face;
- fields are stored PADDED (n_cells == n_lat) with the invariant that
  ghost slots mirror their primary's value ("ghost-synced") — kept by
  `sync`, a handful of masked axis-shifts (NOT a gather: merges only
  ever join lattice-adjacent slots, so a ghost's primary is its
  predecessor along one axis);
- the matrix off-diagonal product is plane-shifted multiply-adds with
  an `unfold` (ghost := primary) before and a `fold` (primary += ghost,
  ghost := 0) after — both masked shifts;
- assembly (negSumDiag, dia planes, face own/nei values, surface sums)
  is reshapes/pads exactly as mesh/structured.py.

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
import numpy as np

AXIS_OF = {0: 2, 1: 1, 2: 0}   # plane id (x,y,z) -> grid axis (z,y,x)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class GdiaInfo:
    """Lattice embedding of a polyhedral mesh (pytree: masks are leaves,
    shape metadata static)."""
    # (n_lat,) 1.0 where the slot is a ghost whose primary is the
    # PREVIOUS slot along axis a (one mask per merge axis; zeros when
    # the mesh has no merges along that axis)
    ghost_prev: tuple            # tuple of (n_lat,) f32, len = 3 (z,y,x)
    dead: jax.Array              # (n_lat,) 1.0 where slot is dead
    primary: jax.Array           # (n_lat,) 1.0 where slot carries a DOF
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


def _grid(info: GdiaInfo, x):
    return x.reshape(info.shape + x.shape[1:])


def _shift_from_prev(g, axis):
    """result[s] = g[s - 1] along grid axis (zero-filled at the edge)."""
    n = g.shape[axis]
    sl = [slice(None)] * g.ndim
    sl[axis] = slice(0, n - 1)
    pad = [(0, 0)] * g.ndim
    pad[axis] = (1, 0)
    return jnp.pad(g[tuple(sl)], pad)


def _shift_to_prev(g, axis):
    """result[s] = g[s + 1] along grid axis (zero-filled at the edge)."""
    n = g.shape[axis]
    sl = [slice(None)] * g.ndim
    sl[axis] = slice(1, None)
    pad = [(0, 0)] * g.ndim
    pad[axis] = (0, 1)
    return jnp.pad(g[tuple(sl)], pad)


def _bcast(mask_flat, x):
    return mask_flat.reshape(mask_flat.shape + (1,) * (x.ndim - 1))


def sync(info: GdiaInfo, x):
    """Ghost-sync: x[ghost] := x[primary]. Masked axis-shifts only."""
    for _ in range(info.sync_iters):
        g = _grid(info, x)
        for p_ax, m in enumerate(info.ghost_prev):
            if m is None:
                continue
            axis = AXIS_OF[p_ax]
            mm = _grid(info, _bcast(m, x))
            g = mm * _shift_from_prev(g, axis) + (1.0 - mm) * g
        x = g.reshape(x.shape)
    return x


def fold(info: GdiaInfo, y):
    """Fold ghost rows into primaries: y[primary] += y[ghost];
    y[ghost] := 0. Inverse-transpose of sync's broadcast."""
    # exact transpose of sync: axes applied in REVERSE order per sweep
    for _ in range(info.sync_iters):
        g = _grid(info, y)
        for p_ax in reversed(range(len(info.ghost_prev))):
            m = info.ghost_prev[p_ax]
            if m is None:
                continue
            axis = AXIS_OF[p_ax]
            mm = _grid(info, _bcast(m, y))
            # add each ghost's value to its predecessor, zero the ghost
            g = g + _shift_to_prev(mm * g, axis) - mm * g
        y = g.reshape(y.shape)
    return y


def unfold(info: GdiaInfo, x):
    """x with ghost entries replaced by their primary's value (the
    adjoint companion of fold; identical to sync)."""
    return sync(info, x)


# ---------------------------------------------------------------------------
# face-plane kernels — faces laid out as [x-plane | y-plane | z-plane |
# boundary], each plane (n_lat,) with slot s = face between s and s+step
# ---------------------------------------------------------------------------

def plane_steps(info: GdiaInfo):
    """(plane_id, grid_axis, flat_step) for each present plane."""
    nz, ny, nx = info.shape
    steps = []
    if info.axes[0]:
        steps.append((0, 2, 1))
    if info.axes[1]:
        steps.append((1, 1, nx))
    if info.axes[2]:
        steps.append((2, 0, nx * ny))
    return steps


def n_plane_faces(info: GdiaInfo) -> int:
    return len(plane_steps(info)) * info.n_lat


def face_planes(info: GdiaInfo, face_data):
    """Split internal-face data into its per-plane grids."""
    n = info.n_lat
    out = []
    for i, (pid, axis, step) in enumerate(plane_steps(info)):
        out.append(_grid(info, face_data[i * n:(i + 1) * n]))
    return out


def face_own_nei(info: GdiaInfo, x):
    """(own, nei) cell values on the plane faces (x ghost-synced).
    own[plane p, slot s] = x[s]; nei = x[s + step]."""
    xs = sync(info, x)
    g = _grid(info, xs)
    owns, neis = [], []
    for pid, axis, step in plane_steps(info):
        owns.append(xs)
        neis.append(_shift_to_prev(g, axis).reshape(xs.shape))
    own = jnp.concatenate(owns, axis=0)
    nei = jnp.concatenate(neis, axis=0)
    return own, nei


def surface_sum_internal(info: GdiaInfo, face_data, signed: bool):
    """Per-slot sum over plane faces: out[own] += f, out[nei] -+= f;
    folded to primaries and ghost-synced by the caller if needed."""
    sgn = -1.0 if signed else 1.0
    out = None
    planes = face_planes(info, face_data)
    for (pid, axis, step), f in zip(plane_steps(info), planes):
        contrib = f + sgn * _shift_from_prev(f, axis)
        out = contrib if out is None else out + contrib
    return out.reshape((info.n_lat,) + face_data.shape[1:])


def neg_sum_diag(info: GdiaInfo, lower, upper):
    """-(row sum of off-diagonals) per slot: diag[own] -= lower[f],
    diag[nei] -= upper[f]."""
    out = None
    lps = face_planes(info, lower)
    ups = face_planes(info, upper)
    for (pid, axis, step), lp, up in zip(plane_steps(info), lps, ups):
        contrib = lp + _shift_from_prev(up, axis)
        out = contrib if out is None else out + contrib
    return -out.reshape(-1)


def dia_planes(info: GdiaInfo, lower, upper):
    """[(offset, coeff plane flat (n_lat,))] for the shift SpMV:
    c_{+step}[s] = upper[face at slot s]; c_{-step}[s] = lower[face at
    slot s-step]."""
    planes = []
    lps = face_planes(info, lower)
    ups = face_planes(info, upper)
    for (pid, axis, step), lp, up in zip(plane_steps(info), lps, ups):
        planes.append((step, up.reshape(-1)))
        planes.append((-step, _shift_from_prev(lp, axis).reshape(-1)))
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
            y = y + c_d[:, None] * jax.lax.dynamic_slice_in_dim(
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


def fold_diag(info: GdiaInfo, diag, psi=None):
    """Fold per-slot diagonal contributions into the primary row and
    give ghost/dead rows a decoupled identity equation. Returns
    (diag_eff, src_fix) where src_fix(src) rewrites ghost/dead rhs so
    the trivial rows solve to psi's current value (zero residual)."""
    d = fold(info, diag)
    off = 1.0 - _bcast(info.primary, d)
    d = d * _bcast(info.primary, d) + off
    if psi is None:
        return d, None

    def src_fix(src):
        o = 1.0 - _bcast(info.primary, src)
        return src * _bcast(info.primary, src) + o * psi
    return d, src_fix
