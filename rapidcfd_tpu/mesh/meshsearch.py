"""meshSearch — point location queries against the FV mesh.

Capability surface of the reference's meshSearch/indexedOctree layer
(reference: src/meshTools/meshSearch/meshSearch.H:54 findCell/
findNearestFace, indexedOctree/treeDataCell): the reference builds an
octree over cell bounding boxes and walks it; a KD-tree of cell
centres plus an exact convex point-in-cell test over the candidate's
face planes gives the same queries with far less machinery (meshes
here are static host-side artifacts; queries run in setup/sampling
paths).
"""

from __future__ import annotations

import numpy as np

from .mesharrays import MeshArrays


class MeshSearch:
    def __init__(self, mesh: MeshArrays):
        self.mesh = mesh
        from scipy.spatial import cKDTree
        self._C = np.asarray(mesh.C)
        self._tree = cKDTree(self._C)
        self._cf = np.asarray(mesh.Cf)
        self._sf = np.asarray(mesh.Sf)
        self._cell_faces = np.asarray(mesh.cell_faces)
        self._cell_sign = np.asarray(mesh.cell_sign)
        self._nbr = np.asarray(mesh.cell_nbr)

    # -- exact convex containment --------------------------------------------
    def _inside(self, cells: np.ndarray, pts: np.ndarray,
                tol: float = 1e-10) -> np.ndarray:
        """True where pts[i] lies inside cells[i] (all outward face
        planes have (p - Cf).n_out <= tol·scale)."""
        faces = self._cell_faces[cells]              # (n, K)
        sgn = self._cell_sign[cells]
        n_out = sgn[..., None] * self._sf[faces]
        rel = pts[:, None, :] - self._cf[faces]
        d = np.einsum("nkj,nkj->nk", n_out, rel)
        scale = np.linalg.norm(n_out, axis=-1) \
            * (np.abs(rel).max(axis=-1) + 1e-30)
        ok = (d <= tol * scale + 1e-300) | (sgn == 0)
        return ok.all(axis=1)

    def find_cell(self, pts, max_hops: int = 64) -> np.ndarray:
        """Cell containing each point, or -1 (reference
        meshSearch::findCell). Starts at the nearest centre and walks
        through the most-violated face — the reference's tet-walk on
        convex cells."""
        pts = np.atleast_2d(np.asarray(pts, float))
        _, cand = self._tree.query(pts)
        cand = cand.astype(np.int64)
        result = np.full(pts.shape[0], -1, dtype=np.int64)
        todo = np.arange(pts.shape[0])
        for _ in range(max_hops):
            if todo.size == 0:
                break
            c = cand[todo]
            p = pts[todo]
            inside = self._inside(c, p)
            result[todo[inside]] = c[inside]
            todo = todo[~inside]
            if todo.size == 0:
                break
            c = cand[todo]
            p = pts[todo]
            faces = self._cell_faces[c]
            sgn = self._cell_sign[c]
            n_out = sgn[..., None] * self._sf[faces]
            nn = np.linalg.norm(n_out, axis=-1)
            d = np.einsum("nkj,nkj->nk", n_out,
                          p[:, None, :] - self._cf[faces]) \
                / np.maximum(nn, 1e-300)
            d = np.where(sgn == 0, -np.inf, d)
            worst = d.argmax(axis=1)
            nxt = self._nbr[c, worst]
            stuck = nxt == c                # worst violation is a wall
            result[todo[stuck]] = -1
            cand[todo] = nxt
            todo = todo[~stuck]
        return result

    def find_nearest_cell(self, pts) -> np.ndarray:
        pts = np.atleast_2d(np.asarray(pts, float))
        _, c = self._tree.query(pts)
        return c.astype(np.int64)

    def find_nearest_boundary_face(self, pts) -> np.ndarray:
        """Global face index of the nearest boundary face."""
        from scipy.spatial import cKDTree
        n_int = self.mesh.n_internal
        if not hasattr(self, "_btree"):
            self._btree = cKDTree(self._cf[n_int:])
        pts = np.atleast_2d(np.asarray(pts, float))
        _, bf = self._btree.query(pts)
        return bf.astype(np.int64) + n_int
