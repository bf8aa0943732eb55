"""volPointInterpolation — cell/boundary values to mesh points.

Capability surface of the reference's volPointInterpolation
(reference: src/finiteVolume/interpolation/volPointInterpolation/
volPointInterpolation.H:54-141): inverse-distance weighted average of
the values surrounding each point, with boundary-face values included
for boundary points so patch data (fixedValue walls, inlets) is honored
exactly at the surface.

TPU-first shape: the point->stencil adjacency is built ONCE on the
host (numpy) as a padded (nPoints, K) index table into the combined
[cell | boundary-face] value vector, and the interpolation itself is a
single padded gather + weighted sum — one op, batched over components.
This runs in setup/output paths (sampling, mesh motion), not in the
solver inner loop.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .mesharrays import MeshArrays
from .polymesh import PolyMesh


@dataclass(frozen=True)
class PointInterpolator:
    """Padded point stencils over [cells | boundary faces]."""
    idx: jax.Array       # (nPoints, K) i32 into concat([cells, bfaces])
    w: jax.Array         # (nPoints, K) normalized weights, pad = 0
    n_points: int

    def __call__(self, data, bvalues=None):
        """Interpolate (nCells, ...) [+ (nBnd, ...)] to (nPoints, ...)."""
        src = data if bvalues is None else jnp.concatenate(
            [data, bvalues], axis=0)
        vals = src[self.idx]                      # (nP, K, ...)
        w = self.w.reshape(self.w.shape + (1,) * (vals.ndim - 2))
        return (w * vals).sum(axis=1)


def build_point_interpolator(pmesh: PolyMesh, mesh: MeshArrays,
                             boundary: bool = True) -> PointInterpolator:
    """Host-side stencil build from the (renumbered) PolyMesh.

    Every point is averaged over the cells sharing it; points on the
    boundary additionally include their boundary faces' centre values
    (reference boundary correction, volPointInterpolation::
    interpolateBoundaryField) which dominate the normalized weights
    there because the face centre is closer than any cell centre.
    """
    n_pts = pmesh.n_points
    n_int = pmesh.n_internal_faces
    fo, fp = pmesh.face_offsets, pmesh.face_points
    counts = np.diff(fo)
    n_faces = counts.shape[0]
    face_of = np.repeat(np.arange(n_faces), counts)

    own_pairs = np.stack([fp, pmesh.owner[face_of]], axis=1)
    imask = face_of < n_int
    nei_pairs = np.stack([fp[imask], pmesh.neighbour[face_of[imask]]],
                         axis=1)
    pairs = np.unique(np.concatenate([own_pairs, nei_pairs]), axis=0)

    src_pos = [np.asarray(mesh.C, np.float64)]
    if boundary:
        # only REAL boundary values join the stencil: empty-direction
        # faces carry no data (2D cases) and coupled interfaces are
        # already represented by their internal cells
        real = np.zeros(n_faces - n_int, dtype=bool)
        for p in mesh.patches:
            if p.size and not (p.type == "empty" or p.is_coupled):
                real[p.start - n_int:p.start - n_int + p.size] = True
        bmask = (face_of >= n_int) & real[np.maximum(face_of - n_int, 0)]
        bnd_pairs = np.stack(
            [fp[bmask], pmesh.n_cells + face_of[bmask] - n_int], axis=1)
        bnd_pairs = np.unique(bnd_pairs, axis=0)
        pairs = np.concatenate([pairs, bnd_pairs])
        src_pos.append(np.asarray(mesh.Cf, np.float64)[n_int:])
    src_pos = np.concatenate(src_pos, axis=0)

    order = np.argsort(pairs[:, 0], kind="stable")
    pairs = pairs[order]
    pt, src = pairs[:, 0], pairs[:, 1]
    kcount = np.bincount(pt, minlength=n_pts)
    K = max(int(kcount.max()), 1)

    slot = np.arange(pairs.shape[0]) - np.concatenate(
        [[0], np.cumsum(kcount)[:-1]])[pt]
    idx = np.zeros((n_pts, K), dtype=np.int64)
    w = np.zeros((n_pts, K), dtype=np.float64)
    d = np.linalg.norm(np.asarray(pmesh.points, np.float64)[pt]
                       - src_pos[src], axis=1)
    idx[pt, slot] = src
    w[pt, slot] = 1.0 / np.maximum(d, 1e-30)
    wsum = w.sum(axis=1, keepdims=True)
    w = w / np.maximum(wsum, 1e-30)

    dtype = mesh.C.dtype
    return PointInterpolator(jnp.asarray(idx, jnp.int32),
                             jnp.asarray(w, dtype), n_pts)


def interpolate_field(interp: PointInterpolator, mesh: MeshArrays,
                      field) -> jax.Array:
    """VolField -> (nPoints, ...) point values."""
    return interp(field.data, field.bvalues)
