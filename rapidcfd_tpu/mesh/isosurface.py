"""isoSurface — marching tetrahedra over polyhedral cells.

Capability surface of the reference's sampling isoSurface/isoSurfaceCell
(reference: src/sampling/sampledSurface/isoSurface/isoSurfaceCell.H:52):
every cell is decomposed into tetrahedra (cell centre, face centre,
face edge) — valid for arbitrary convex polyhedra — and each tet is
contoured by the standard marching-tetrahedra cases, fully vectorized
over all tets at once (host numpy; this is an output-path operation).

The scalar is sampled at three stations: mesh points (via
volPointInterpolation), face centres (owner/neighbour average) and
cell centres, exactly the data the reference uses.
"""

from __future__ import annotations

import numpy as np

from .mesharrays import MeshArrays
from .polymesh import PolyMesh
from .trisurface import TriSurface

_EDGES = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
_EDGE_OF = {e: i for i, e in enumerate(_EDGES)}


def _edge_id(a, b):
    return _EDGE_OF[(a, b) if a < b else (b, a)]


# triangles (as edge-id triples) for each of the 16 above-masks
_TRI_TABLE: list[list[tuple]] = []
for mask in range(16):
    above = [v for v in range(4) if mask >> v & 1]
    below = [v for v in range(4) if not mask >> v & 1]
    tris = []
    if len(above) in (1, 3):
        lone = above[0] if len(above) == 1 else below[0]
        others = [v for v in range(4) if v != lone]
        e = [_edge_id(lone, o) for o in others]
        tris = [tuple(e)]
    elif len(above) == 2:
        a, b = above
        c, d = below
        e0, e1 = _edge_id(a, c), _edge_id(a, d)
        e2, e3 = _edge_id(b, d), _edge_id(b, c)
        tris = [(e0, e1, e2), (e0, e2, e3)]
    _TRI_TABLE.append(tris)


def iso_surface(mesh: MeshArrays, pmesh: PolyMesh, cell_vals,
                point_vals, iso: float) -> tuple[TriSurface, np.ndarray]:
    """Contour cell_vals == iso. Returns (surface, cell index of each
    output triangle) so other fields can be sampled onto it."""
    cv = np.asarray(cell_vals, float)
    pv = np.asarray(point_vals, float)
    C = np.asarray(mesh.C)
    Cf = np.asarray(mesh.Cf)
    pts = np.asarray(pmesh.points, float)
    fo, fp = pmesh.face_offsets, pmesh.face_points
    counts = np.diff(fo)
    n_faces = counts.shape[0]
    n_int = pmesh.n_internal_faces
    own = pmesh.owner
    nei = pmesh.neighbour

    # face-centre values: linear owner/neighbour average internally,
    # owner value on the boundary
    fv = cv[own].astype(float)
    w = np.asarray(mesh.weights)
    fv[:n_int] = w * cv[own[:n_int]] + (1 - w) * cv[nei]

    face_of = np.repeat(np.arange(n_faces), counts)
    nxt = fp.copy()
    nxt[:-1] = fp[1:]
    nxt[fo[1:] - 1] = fp[fo[:-1]]

    # tets: (p_i, p_next, face centre, cell centre) for owner and
    # (internal only) neighbour cells
    def tets_for(cells, sel):
        p0 = pts[fp[sel]]
        p1 = pts[nxt[sel]]
        p2 = Cf[face_of[sel]]
        p3 = C[cells]
        v0 = pv[fp[sel]]
        v1 = pv[nxt[sel]]
        v2 = fv[face_of[sel]]
        v3 = cv[cells]
        return (np.stack([p0, p1, p2, p3], axis=1),
                np.stack([v0, v1, v2, v3], axis=1), cells)

    all_sel = np.arange(fp.shape[0])
    int_sel = all_sel[face_of < n_int]
    P_own, V_own, c_own = tets_for(own[face_of], all_sel)
    P_nei, V_nei, c_nei = tets_for(nei[face_of[int_sel]], int_sel)
    P = np.concatenate([P_own, P_nei])      # (T, 4, 3)
    V = np.concatenate([V_own, V_nei])      # (T, 4)
    tet_cell = np.concatenate([c_own, c_nei])

    above = V > iso
    mask = (above * np.array([1, 2, 4, 8])).sum(axis=1)

    out_tris = []
    out_cells = []
    ev = np.asarray(_EDGES)

    def edge_points(tet_ids, edges):
        a = ev[edges][:, 0]
        b = ev[edges][:, 1]
        va = V[tet_ids, a]
        vb = V[tet_ids, b]
        t = (iso - va) / np.where(np.abs(vb - va) < 1e-300, 1e-300,
                                  vb - va)
        t = np.clip(t, 0.0, 1.0)[:, None]
        return (1 - t) * P[tet_ids, a] + t * P[tet_ids, b]

    for m in range(1, 15):
        tris = _TRI_TABLE[m]
        if not tris:
            continue
        ids = np.where(mask == m)[0]
        if ids.size == 0:
            continue
        for e0, e1, e2 in tris:
            q0 = edge_points(ids, np.full(ids.size, e0))
            q1 = edge_points(ids, np.full(ids.size, e1))
            q2 = edge_points(ids, np.full(ids.size, e2))
            out_tris.append(np.stack([q0, q1, q2], axis=1))
            out_cells.append(tet_cell[ids])

    if not out_tris:
        return (TriSurface(np.zeros((0, 3)),
                           np.zeros((0, 3), np.int64)),
                np.zeros(0, np.int64))
    tri_pts = np.concatenate(out_tris)          # (M, 3, 3)
    cells = np.concatenate(out_cells)
    ntri = tri_pts.shape[0]
    surf = TriSurface(tri_pts.reshape(-1, 3),
                      np.arange(3 * ntri, dtype=np.int64).reshape(ntri, 3))
    surf = surf.merged(tol=1e-9)
    # drop degenerate (zero-area) triangles from on-vertex contours
    area = surf.face_areas()
    keep = area > 1e-20 * max(area.max(), 1e-300)
    surf = TriSurface(surf.points, surf.faces[keep])
    return surf, cells[keep]
