"""Structured-mesh fast path — gather-free finite-volume kernels.

TPU gathers run on the scalar core (~1 element/cycle): on a 9k-cell
cavity one (nCells,K) assembly gather costs ~0.5ms while the whole
useful data movement is ~200KB (~0.25us at HBM speed). The reference
pays the same cost class on pre-Kepler GPUs and answers with texture
caches (lduMatrixATmul.C, Textures.H); the TPU answer is to remove the
gathers entirely.

When the mesh is a structured box kept in natural ordering (x fastest),
internal faces are reordered into three axis blocks

    [ x-faces (nz,ny,nx-1) | y-faces (nz,ny-1,nx) | z-faces (nz-1,ny,nx) ]

each in C-order of its owner cell, and boundary patches are decomposed
into runs of full side slabs. Every finite-volume primitive then
becomes reshapes, static slices and pads — zero gathers, zero scatters:

  - owner/neighbour face values  = cell-grid slices;
  - surfaceIntegrate (div)       = padded differences per axis;
  - negSumDiag                   = padded sums per axis;
  - the off-diagonal matvec      = DIA coefficient planes via pads
                                   (feeding linalg/banded's shift mv);
  - patch-cell reads/updates     = side-slab slices.

This is the assembly-side completion of the DIA SpMV / structured-MG
work (linalg/banded.py, linalg/structured_mg.py); the padded-ELL gather
path remains the general-mesh fallback (reference dual path precedent:
lduMatrixATmul.C:42 fast/slow).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from .polymesh import PolyMesh

# A patch side segment: faces [local_start, local_start+length) of the
# patch are exactly the full (axis, side) slab of the box in C-order.
# axis: 0=z, 1=y, 2=x ; side: 0=min, 1=max.
Segment = tuple  # (local_start, axis, side, length)


@dataclass(frozen=True)
class StructuredInfo:
    """Static metadata of a natural-ordering structured box mesh."""
    shape: tuple            # (nz, ny, nx) cells
    # per mesh patch: tuple of Segments covering the whole patch, or
    # None when the patch is not a run of full side slabs (fallback to
    # small gathers for that patch)
    patch_segments: tuple

    @property
    def nfx(self):
        nz, ny, nx = self.shape
        return nz * ny * (nx - 1)

    @property
    def nfy(self):
        nz, ny, nx = self.shape
        return nz * (ny - 1) * nx

    @property
    def nfz(self):
        nz, ny, nx = self.shape
        return (nz - 1) * ny * nx


# ---------------------------------------------------------------------------
# host-side detection (numpy)
# ---------------------------------------------------------------------------

def _side_slab(grid: np.ndarray, axis: int, side: int) -> np.ndarray:
    sl = [slice(None)] * 3
    sl[axis] = -1 if side else 0
    return grid[tuple(sl)].ravel()


def detect_structured(mesh: PolyMesh):
    """Detect a natural-ordering box; returns (shape, face_order,
    patch_segments) or None. face_order is the internal-face permutation
    (new -> old) putting faces into [x | y | z] axis blocks, each sorted
    by owner (C-order)."""
    nc = mesh.n_cells
    n_int = mesh.n_internal_faces
    if n_int == 0 or nc < 4:
        return None
    own = mesh.owner
    nei = mesh.neighbour
    off = nei - own[:n_int]
    uniq = np.unique(off)
    if uniq.size == 0 or uniq[0] <= 0 or uniq.size > 3:
        return None
    if uniq.size == 1:
        if uniq[0] != 1:
            return None
        nx, ny, nz = nc, 1, 1
    elif uniq.size == 2:
        if uniq[0] != 1:
            return None
        nx = int(uniq[1])
        if nx < 2 or nc % nx:
            return None
        ny, nz = nc // nx, 1
    else:
        if uniq[0] != 1:
            return None
        nx, nxny = int(uniq[1]), int(uniq[2])
        if nx < 2 or nxny % nx or nc % nxny:
            return None
        ny, nz = nxny // nx, nc // nxny
    shape = (nz, ny, nx)
    grid = np.arange(nc, dtype=np.int64).reshape(shape)

    blocks = []
    expected = {
        1: grid[:, :, :-1].ravel() if nx > 1 else np.zeros(0, np.int64),
        nx: grid[:, :-1, :].ravel() if ny > 1 else np.zeros(0, np.int64),
        nx * ny: grid[:-1].ravel() if nz > 1 else np.zeros(0, np.int64),
    }
    offsets = [1]
    if ny > 1:
        offsets.append(nx)
    if nz > 1:
        offsets.append(nx * ny)
    if sorted(set(offsets)) != [int(u) for u in uniq]:
        return None
    for d in offsets:
        idx = np.nonzero(off == d)[0]
        o = own[idx]
        order = np.argsort(o, kind="stable")
        if not np.array_equal(o[order], expected[d]):
            return None
        blocks.append(idx[order])
    face_order = np.concatenate(blocks) if blocks else np.zeros(0, np.int64)
    if face_order.size != n_int:
        return None

    # patch decomposition into side-slab segments
    sides = []
    for axis in (2, 1, 0):          # prefer small slabs (x/y before z)
        for side in (0, 1):
            sides.append((axis, side, _side_slab(grid, axis, side)))
    patch_segments = []
    for p in mesh.patches:
        o = own[p.start_face:p.start_face + p.n_faces]
        segs = []
        pos = 0
        ok = True
        while pos < o.size:
            hit = None
            for axis, side, slab in sides:
                L = slab.size
                if pos + L <= o.size and np.array_equal(
                        o[pos:pos + L], slab):
                    hit = (pos, axis, side, L)
                    break
            if hit is None:
                ok = False
                break
            segs.append(hit)
            pos += hit[3]
        patch_segments.append(tuple(segs) if ok else None)

    return StructuredInfo(shape, tuple(patch_segments)), face_order


def reorder_internal_faces(mesh: PolyMesh, order: np.ndarray):
    """Permute internal faces by order (new -> old); boundary unchanged.
    Returns (mesh, full_face_perm)."""
    n_int = mesh.n_internal_faces
    nf = mesh.n_faces
    idx = np.concatenate([order, np.arange(n_int, nf, dtype=np.int64)])
    off = mesh.face_offsets
    sizes = np.diff(off)
    new_sizes = sizes[idx]
    new_off = np.zeros(nf + 1, dtype=np.int64)
    np.cumsum(new_sizes, out=new_off[1:])
    # vectorized chunk gather
    total = int(new_off[-1])
    starts = off[:-1][idx]
    rep = np.repeat(starts - new_off[:-1], new_sizes)
    pos = np.arange(total, dtype=np.int64) + rep
    new_fp = mesh.face_points[pos]
    out = PolyMesh(mesh.points, new_fp, new_off,
                   mesh.owner[idx], mesh.neighbour[order], mesh.patches)
    return out, idx


# ---------------------------------------------------------------------------
# device kernels (jax) — all pure slices / pads / reshapes
# ---------------------------------------------------------------------------

def _grid(s: StructuredInfo, cell_data):
    return cell_data.reshape(s.shape + cell_data.shape[1:])


def face_blocks(s: StructuredInfo, f):
    """Split flat internal-face data into per-axis face grids."""
    nz, ny, nx = s.shape
    r = f.shape[1:]
    fx = f[:s.nfx].reshape((nz, ny, nx - 1) + r)
    fy = f[s.nfx:s.nfx + s.nfy].reshape((nz, ny - 1, nx) + r)
    fz = f[s.nfx + s.nfy:].reshape((max(nz - 1, 0), ny, nx) + r)
    return fx, fy, fz


def _flat(b):
    """Flatten the 3 leading grid axes of a face/cell block."""
    return b.reshape((-1,) + b.shape[3:])


def own_nei(s: StructuredInfo, cell_data):
    """(own, nei) values on internal faces in axis-blocked order."""
    g = _grid(s, cell_data)
    nz, ny, nx = s.shape
    owns = [g[:, :, :nx - 1], g[:, :ny - 1, :], g[:nz - 1]]
    neis = [g[:, :, 1:], g[:, 1:, :], g[1:]]
    own = jnp.concatenate([_flat(b) for b in owns], axis=0)
    nei = jnp.concatenate([_flat(b) for b in neis], axis=0)
    return own, nei


def _pad_axis(b, axis, lo, hi):
    pad = [(0, 0)] * b.ndim
    pad[axis] = (lo, hi)
    return jnp.pad(b, pad)


def surface_sum_internal(s: StructuredInfo, face_data, signed: bool):
    """Per-cell sum over internal faces: out[own] += f, out[nei] -+= f.
    Returns the (nz,ny,nx)+r cell grid."""
    fx, fy, fz = face_blocks(s, face_data)
    sgn = -1.0 if signed else 1.0
    out = _pad_axis(fx, 2, 0, 1) + sgn * _pad_axis(fx, 2, 1, 0)
    out = out + _pad_axis(fy, 1, 0, 1) + sgn * _pad_axis(fy, 1, 1, 0)
    if s.shape[0] > 1:
        out = out + _pad_axis(fz, 0, 0, 1) + sgn * _pad_axis(fz, 0, 1, 0)
    return out


def _slab_index(s: StructuredInfo, axis: int, side: int):
    sl = [slice(None), slice(None), slice(None)]
    sl[axis] = -1 if side else 0
    return tuple(sl)


def _slab_shape(s: StructuredInfo, axis: int):
    return tuple(n for a, n in enumerate(s.shape) if a != axis)


def add_boundary_to_grid(mesh, s: StructuredInfo, out_grid, face_data,
                         skip_empty: bool = True):
    """out[own[f]] += face_data[f] for boundary faces (sign +1: boundary
    Sf points outward). face_data is (n_boundary,)+r in bstart order."""
    r = face_data.shape[1:]
    for p, segs in zip(mesh.patches, s.patch_segments):
        if p.size == 0 or (skip_empty and p.is_empty):
            continue
        vals = face_data[p.bstart:p.bstart + p.size]
        if segs is None:
            flat = out_grid.reshape((-1,) + out_grid.shape[3:])
            flat = flat.at[mesh.patch_face_cells(p)].add(vals)
            out_grid = flat.reshape(out_grid.shape)
            continue
        for (lstart, axis, side, L) in segs:
            seg = vals[lstart:lstart + L].reshape(
                _slab_shape(s, axis) + r)
            out_grid = out_grid.at[_slab_index(s, axis, side)].add(seg)
    return out_grid


def patch_internal_values(mesh, s: StructuredInfo, patch, segs, cell_data):
    """cell_data at the patch's face cells (slab slices; None segs falls
    back to a small take)."""
    if segs is None:
        return jnp.take(cell_data, mesh.patch_face_cells(patch), axis=0)
    g = _grid(s, cell_data)
    r = cell_data.shape[1:]
    parts = [g[_slab_index(s, axis, side)].reshape((-1,) + r)
             for (_, axis, side, _) in segs]
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)


def add_at_patch_cells(mesh, s: StructuredInfo, patch, segs, cell_data,
                       vals):
    """cell_data[faceCells] += vals for one patch (slab adds)."""
    if segs is None:
        return cell_data.at[mesh.patch_face_cells(patch)].add(vals)
    g = _grid(s, cell_data)
    r = cell_data.shape[1:]
    for (lstart, axis, side, L) in segs:
        seg = vals[lstart:lstart + L].reshape(_slab_shape(s, axis) + r)
        g = g.at[_slab_index(s, axis, side)].add(seg)
    return g.reshape(cell_data.shape)


def boundary_owner_values(mesh, s: StructuredInfo, cell_data):
    """cell_data at owner cells of ALL boundary faces, bstart-ordered
    (replaces take(cell_data, owner[n_internal:])). Empty-patch values
    are never consumed (their faces are inactive everywhere) but on a 2D
    box they are 2*nCells wide — constant-fill instead of gathering (the
    gather was ~45% of the whole icoFoam step at 384^2). The fill is 1.0,
    NOT 0.0: these values flow through pointwise field arithmetic
    (1/A, rAU*H), where a 0 manufactures inf then 0*inf=NaN."""
    parts = []
    for p, segs in zip(mesh.patches, s.patch_segments):
        if p.size == 0:
            continue
        if p.is_empty:
            parts.append(jnp.ones((p.size,) + cell_data.shape[1:],
                                  cell_data.dtype))
            continue
        parts.append(patch_internal_values(mesh, s, p, segs, cell_data))
    if not parts:
        return cell_data[:0]
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)


def neg_sum_diag(s: StructuredInfo, lower, upper):
    """-(sum of row off-diag coeffs): diag[own] -= lower[f],
    diag[nei] -= upper[f]; flat (nCells,)."""
    lx, ly, lz = face_blocks(s, lower)
    ux, uy, uz = face_blocks(s, upper)
    out = _pad_axis(lx, 2, 0, 1) + _pad_axis(ux, 2, 1, 0)
    out = out + _pad_axis(ly, 1, 0, 1) + _pad_axis(uy, 1, 1, 0)
    if s.shape[0] > 1:
        out = out + _pad_axis(lz, 0, 0, 1) + _pad_axis(uz, 0, 1, 0)
    return -out.reshape(-1)


def dia_planes(s: StructuredInfo, lower, upper):
    """DIA coefficient planes [(offset, c_d flat (nCells,))]:
    c_{+d}[c] = coeff of x[c+d] in row c (= upper of the face it owns),
    c_{-d}[c] = lower of the face owned by c-d."""
    nz, ny, nx = s.shape
    lx, ly, lz = face_blocks(s, lower)
    ux, uy, uz = face_blocks(s, upper)
    planes = []
    if nx > 1:
        planes.append((1, _pad_axis(ux, 2, 0, 1).reshape(-1)))
        planes.append((-1, _pad_axis(lx, 2, 1, 0).reshape(-1)))
    if ny > 1:
        planes.append((nx, _pad_axis(uy, 1, 0, 1).reshape(-1)))
        planes.append((-nx, _pad_axis(ly, 1, 1, 0).reshape(-1)))
    if nz > 1:
        planes.append((nx * ny, _pad_axis(uz, 0, 0, 1).reshape(-1)))
        planes.append((-nx * ny, _pad_axis(lz, 0, 1, 0).reshape(-1)))
    return planes


def offdiag_mv_from_planes(planes, n):
    """x -> sum_d c_d * shift(x, d): the pure-shift DIA product (same
    contract as banded._make_dia_mv)."""
    from jax import lax
    max_off = max(abs(d) for d, _ in planes) if planes else 0

    def mv(x):
        two_d = x.ndim == 2
        vec = x if two_d else x[:, None]
        m = vec.shape[1]
        zpad = jnp.zeros((max_off, m), x.dtype)
        xp = jnp.concatenate([zpad, vec, zpad])
        y = jnp.zeros_like(vec)
        for d, c_d in planes:
            y = y + c_d[:, None] * lax.dynamic_slice_in_dim(
                xp, max_off + d, n)
        return y if two_d else y[:, 0]

    return mv


def internal_flux(s: StructuredInfo, psi, lower, upper):
    """upper*psi[nei] - lower*psi[own] on internal faces (faceH)."""
    own, nei = own_nei(s, psi)
    r = (1,) * (own.ndim - 1)
    return upper.reshape(upper.shape + r) * nei \
        - lower.reshape(lower.shape + r) * own
