"""Cyclic (periodic) patch coupling.

The reference implements cyclics as coupled boundary conditions with
interface matrix updates (reference: polyMesh/polyPatches/constraint/
cyclic + cyclicFvPatchField / cyclicLduInterface). TPU-first we instead
*merge* each matched cyclic face pair into a single coupled
internal-like face at mesh-build time: owner = owner(A-face),
neighbour = owner(B-face). Every downstream component — ELL incidence,
fvm coefficient assembly, interpolation, solvers, MULES — then treats
periodicity exactly like interior connectivity, with zero special cases
in the hot path.

The only transform-aware pieces are the interpolation coefficients
(weights/deltaCoeffs must use the two half-deltas on either side of the
interface, not the raw cell-to-cell distance across the domain), handled
by storing the matched partner-face centre per coupled face.

Supported: translational / matching-plane cyclics (rotational transforms
deferred).
"""

from __future__ import annotations

import numpy as np

from .polymesh import BoundaryPatch, PolyMesh


def find_cyclic_pairs(mesh: PolyMesh):
    """[(patchA_index, patchB_index), ...] each pair listed once."""
    by_name = {p.name: i for i, p in enumerate(mesh.patches)}
    pairs = []
    seen = set()
    for i, p in enumerate(mesh.patches):
        if p.type != "cyclic" or i in seen:
            continue
        nbr_name = p.extra.word("neighbourPatch", "")
        if not nbr_name or nbr_name not in by_name:
            raise ValueError(
                f"cyclic patch '{p.name}' has no matching neighbourPatch")
        j = by_name[nbr_name]
        pairs.append((i, j))
        seen.add(i)
        seen.add(j)
    return pairs


def merge_cyclic(mesh: PolyMesh, face_ctrs: np.ndarray):
    """Rebuild the mesh with cyclic pairs as coupled internal faces.

    Returns (merged PolyMesh, face_map, cyc_partner_ctr) where
    face_map[new_face] = old_face (B faces dropped), and
    cyc_partner_ctr[new_face] = matched partner-face centre for coupled
    faces (NaN elsewhere).
    """
    pairs = find_cyclic_pairs(mesh)
    if not pairs:
        return mesh, None, None

    n_int = mesh.n_internal_faces
    own = mesh.owner
    fp, off = mesh.face_points, mesh.face_offsets

    coupled_a, coupled_nei, coupled_ctr_b = [], [], []
    drop = np.zeros(mesh.n_faces, dtype=bool)
    dropped_patches = set()
    for ia, ib in pairs:
        pa, pb = mesh.patches[ia], mesh.patches[ib]
        if pa.n_faces != pb.n_faces:
            raise ValueError(f"cyclic pair {pa.name}/{pb.name}: "
                             f"face counts differ")
        a_faces = np.arange(pa.start_face, pa.start_face + pa.n_faces)
        b_faces = np.arange(pb.start_face, pb.start_face + pb.n_faces)
        # geometric matching: translate by the mean separation, nearest
        # centre (reference matches via patch transforms/ordering)
        ca, cb = face_ctrs[a_faces], face_ctrs[b_faces]
        t = cb.mean(0) - ca.mean(0)
        from scipy.spatial import cKDTree
        d, j = cKDTree(cb).query(ca + t)
        if np.unique(j).size != j.size:
            raise ValueError(f"cyclic pair {pa.name}/{pb.name}: "
                             f"face matching is not one-to-one")
        coupled_a.append(a_faces)
        coupled_nei.append(own[b_faces[j]])
        coupled_ctr_b.append(cb[j])
        drop[b_faces] = True
        dropped_patches.add(ia)
        dropped_patches.add(ib)

    coupled_a = np.concatenate(coupled_a)
    coupled_nei = np.concatenate(coupled_nei)
    coupled_ctr_b = np.concatenate(coupled_ctr_b)

    # new order: [internal | coupled A-faces | remaining boundary faces]
    keep_bnd = [f for p_i, p in enumerate(mesh.patches)
                if p_i not in dropped_patches
                for f in range(p.start_face, p.start_face + p.n_faces)]
    keep_bnd = np.asarray(keep_bnd, dtype=np.int64)
    face_map = np.concatenate([np.arange(n_int), coupled_a, keep_bnd])

    # owner / neighbour with coupled faces appended; enforce own < nei
    new_own = own[face_map].copy()
    new_nei = np.concatenate([mesh.neighbour, coupled_nei]).copy()
    n_int_new = new_nei.size
    flip = new_own[:n_int_new] > new_nei
    swap_o = new_own[:n_int_new].copy()
    new_own[:n_int_new] = np.where(flip, new_nei, swap_o)
    new_nei = np.where(flip, swap_o, new_nei)

    # face point lists (reverse flipped faces to keep owner-outward Sf)
    sizes = np.diff(off)[face_map]
    new_off = np.zeros(face_map.size + 1, dtype=np.int64)
    np.cumsum(sizes, out=new_off[1:])
    chunks = []
    for i, f_old in enumerate(face_map):
        pts = fp[off[f_old]:off[f_old + 1]]
        if i < n_int_new and flip[i]:
            pts = pts[::-1]
        chunks.append(pts)
    new_fp = np.concatenate(chunks)

    # partner centre per face (coupled faces only), and the identity of
    # the cell whose physical face carries THIS face's geometry (the
    # A side) — flip/renumber-proof ownership tracking
    partner = np.full((face_map.size, 3), np.nan)
    partner[n_int:n_int_new] = coupled_ctr_b
    a_cell = np.full(face_map.size, -1, dtype=np.int64)
    a_cell[n_int:n_int_new] = own[coupled_a]

    # remaining patches with recomputed starts
    new_patches = []
    start = n_int_new
    for p_i, p in enumerate(mesh.patches):
        if p_i in dropped_patches:
            continue
        new_patches.append(BoundaryPatch(p.name, p.type, start, p.n_faces,
                                         p.extra))
        start += p.n_faces
    merged = PolyMesh(mesh.points, new_fp, new_off, new_own, new_nei,
                      new_patches)
    return merged, face_map, partner, a_cell


def cyclic_interpolation_override(mesh: PolyMesh, partner: np.ndarray,
                                  a_cell: np.ndarray, C: np.ndarray,
                                  Cf: np.ndarray, Sf: np.ndarray,
                                  coeffs: dict):
    """Fix weights/deltaCoeffs of coupled faces using the two half-deltas
    (owner side to its interface plane, neighbour side to its matched
    plane) instead of the raw periodic cell-to-cell vector."""
    n_int = mesh.n_internal_faces
    cyc = a_cell[:n_int] >= 0
    if not cyc.any():
        return coeffs
    f = np.nonzero(cyc)[0]
    o = mesh.owner[f]
    n = mesh.neighbour[f]
    cf_a = Cf[f]
    cf_b = partner[f]
    own_is_a = (o == a_cell[f])[:, None]
    cf_own = np.where(own_is_a, cf_a, cf_b)
    cf_nei = np.where(own_is_a, cf_b, cf_a)

    sf = Sf[f]
    mag_sf = np.linalg.norm(sf, axis=1)
    nhat = sf / np.maximum(mag_sf, 1e-300)[:, None]
    sfd_own = np.einsum("ij,ij->i", sf, cf_own - C[o])
    sfd_nei = np.einsum("ij,ij->i", sf, C[n] - cf_nei)
    tot = np.where(np.abs(sfd_own + sfd_nei) < 1e-300, 1e-300,
                   sfd_own + sfd_nei)
    coeffs["weights"][f] = sfd_nei / tot
    dist = np.einsum("ij,ij->i", nhat, cf_own - C[o]) \
        + np.einsum("ij,ij->i", nhat, C[n] - cf_nei)
    coeffs["delta_coeffs"][f] = 1.0 / np.maximum(np.abs(dist), 1e-300)
    coeffs["nonorth_delta_coeffs"][f] = coeffs["delta_coeffs"][f]
    coeffs["corr_vecs"][f] = 0.0
    return coeffs
