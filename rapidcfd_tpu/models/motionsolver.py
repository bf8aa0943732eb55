"""fvMotionSolver — Laplacian-smoothed mesh motion.

Capability surface of the reference's fvMotionSolvers
(reference: src/fvMotionSolver/fvMotionSolvers/
{displacementLaplacian/displacementLaplacianFvMotionSolver.H:53,
velocityLaplacian/velocityLaplacianFvMotionSolver.H:50} with
motionDiffusivity/{uniform,inverseDistance,manipulators/quadratic}):
solve  laplacian(gamma, cellDisplacement) == 0  with prescribed motion
on the moving patches, interpolate cell displacement to the points
(volPointInterpolation), move, rebuild geometry.

TPU-first split (same contract as dynamicmesh.SolidBodyMotionMesh):
the displacement solve and point interpolation are ONE jitted program
re-used every step (boundary displacement enters as arrays, so no
recompile); the geometry rebuild is host-side numpy and the updated
MeshArrays passes through jit as an argument. The mesh flux obeys the
space-conservation law through exact triangulated swept volumes per
face (reference: face::sweptVol, primitiveMeshGeometry) rather than a
midpoint approximation.

Selection (constant/dynamicMeshDict):

    dynamicFvMesh   dynamicMotionSolverFvMesh;
    motionSolver    displacementLaplacian;   // | velocityLaplacian
    diffusivity     inverseDistance (movingWall);  // | uniform
                                             // | quadratic inverseDistance (p)
    movingPatches {
        movingWall { type oscillatingDisplacement;
                     amplitude (0 0.1 0); omega 6.2832; }
    }
    // all other non-empty patches are held fixed (displacement 0)
"""

from __future__ import annotations

import dataclasses
import math
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.bcs import make_bc
from ..fields.field import VolField
from ..utils.dictionary import Dictionary
from ..utils.dimensions import dim_length, dim_velocity
from ..utils.logging import info


# ---------------------------------------------------------------------------
# prescribed patch motions (the pointDisplacement BC zoo equivalents;
# reference: src/fvMotionSolver/pointPatchFields/derived/
# {oscillatingDisplacement,angularOscillatingDisplacement})
# ---------------------------------------------------------------------------

class PatchMotion:
    """displacement(x0, t) -> (n,3) displacement of positions x0."""

    def displacement(self, x0: np.ndarray, t: float) -> np.ndarray:
        raise NotImplementedError


class OscillatingDisplacement(PatchMotion):
    """d = amplitude * sin(omega t)."""

    def __init__(self, d: Dictionary):
        self.amp = np.asarray(d.lookup("amplitude", [0, 0, 0]), float)
        self.omega = float(d.scalar("omega", 1.0))

    def displacement(self, x0, t):
        return np.broadcast_to(self.amp * math.sin(self.omega * t),
                               x0.shape)


class LinearDisplacement(PatchMotion):
    """d = velocity * t (constant-rate drift)."""

    def __init__(self, d: Dictionary):
        self.v = np.asarray(d.lookup("velocity", [0, 0, 0]), float)

    def displacement(self, x0, t):
        return np.broadcast_to(self.v * t, x0.shape)


class AngularOscillatingDisplacement(PatchMotion):
    """Rigid rotation about (origin, axis) by angle0*sin(omega t)."""

    def __init__(self, d: Dictionary):
        self.origin = np.asarray(d.lookup("origin", [0, 0, 0]), float)
        ax = np.asarray(d.lookup("axis", [0, 0, 1]), float)
        self.axis = ax / max(np.linalg.norm(ax), 1e-300)
        self.angle0 = float(d.scalar("angle0", 0.0))
        self.omega = float(d.scalar("omega", 1.0))

    def displacement(self, x0, t):
        th = self.angle0 * math.sin(self.omega * t)
        k = self.axis
        r = x0 - self.origin
        # Rodrigues rotation
        rot = (r * math.cos(th) + np.cross(k, r) * math.sin(th)
               + np.outer(r @ k, k) * (1.0 - math.cos(th)))
        return rot - r


_PATCH_MOTIONS = {
    "oscillatingDisplacement": OscillatingDisplacement,
    "linearDisplacement": LinearDisplacement,
    "angularOscillatingDisplacement": AngularOscillatingDisplacement,
}


# ---------------------------------------------------------------------------
# motion diffusivity (reference: src/fvMotionSolver/motionDiffusivity)
# ---------------------------------------------------------------------------

def _patch_distance(mesh, patch_names) -> np.ndarray:
    """Cell-centre distance to the nearest face of the named patches."""
    from scipy.spatial import cKDTree
    cf = [np.asarray(mesh.patch_cf(p)) for p in mesh.patches
          if p.name in patch_names and p.size]
    if not cf:
        return np.full(mesh.n_cells, 1.0)
    tree = cKDTree(np.concatenate(cf))
    d, _ = tree.query(np.asarray(mesh.C))
    return np.maximum(d, 1e-12)


def make_diffusivity(mesh, spec) -> jnp.ndarray:
    """Per-cell gamma from the dynamicMeshDict 'diffusivity' entry.
    spec is the raw entry token list (word or word + (patches))."""
    toks = spec if isinstance(spec, (list, tuple)) else [spec]
    toks = list(toks)
    quadratic = False
    if toks and toks[0] == "quadratic":
        quadratic = True
        toks = toks[1:]
    name = toks[0] if toks else "uniform"
    if name == "uniform":
        g = np.ones(mesh.n_cells)
    elif name in ("inverseDistance", "inverseVolume"):
        if name == "inverseVolume":
            g = 1.0 / np.asarray(mesh.V)
        else:
            patches = [str(w) for w in toks[1:]] or \
                [p.name for p in mesh.patches if p.type == "wall"]
            g = 1.0 / _patch_distance(mesh, set(patches))
    else:
        raise KeyError(f"diffusivity '{name}' "
                       "(uniform|inverseDistance|inverseVolume"
                       "|quadratic <model>)")
    if quadratic:
        g = g * g
    return jnp.asarray(g, mesh.C.dtype)


# ---------------------------------------------------------------------------
# exact swept volumes (space-conservation law)
# ---------------------------------------------------------------------------

def swept_volumes(pmesh, old_pts: np.ndarray,
                  new_pts: np.ndarray) -> np.ndarray:
    """(nFaces,) signed volume swept by each face moving old->new
    (positive along the face normal). Each face is fanned into
    triangles about its centroid; each triangle prism is the exact sum
    of three tetrahedra (reference: face::sweptVol semantics)."""
    fo, fp = pmesh.face_offsets, pmesh.face_points
    counts = np.diff(fo)
    n_faces = counts.shape[0]
    face_of = np.repeat(np.arange(n_faces), counts)

    def centroids(pts):
        s = np.zeros((n_faces, 3))
        np.add.at(s, face_of, pts[fp])
        return s / counts[:, None]

    c0, c1 = centroids(old_pts), centroids(new_pts)
    nxt = fp.copy()
    nxt[:-1] = fp[1:]
    nxt[fo[1:] - 1] = fp[fo[:-1]]       # wrap within each face

    a0, b0 = old_pts[fp], old_pts[nxt]
    a1, b1 = new_pts[fp], new_pts[nxt]
    cc0, cc1 = c0[face_of], c1[face_of]

    def tet6(p, q, r, s):
        return np.einsum("ij,ij->i", q - p, np.cross(r - p, s - p))

    # prism (a0,b0,cc0) -> (a1,b1,cc1) as three tets
    v6 = (tet6(a0, b0, cc0, a1)
          + tet6(b0, cc0, a1, b1)
          + tet6(cc0, a1, b1, cc1))
    vol = np.zeros(n_faces)
    np.add.at(vol, face_of, v6 / 6.0)
    return vol


# ---------------------------------------------------------------------------
# the motion-solver dynamic mesh
# ---------------------------------------------------------------------------

class MotionSolverMesh:
    """dynamicMotionSolverFvMesh: update(t) -> (MeshArrays, meshPhi,
    boundary mesh velocity) — drop-in for SolidBodyMotionMesh."""

    def __init__(self, case, d: Dictionary):
        self.case = case
        self.solver_type = d.word("motionSolver", "displacementLaplacian")
        if self.solver_type not in ("displacementLaplacian",
                                    "velocityLaplacian"):
            raise KeyError(f"motionSolver '{self.solver_type}' "
                           "(displacementLaplacian|velocityLaplacian)")
        mesh = case.mesh
        from ..utils.dimensions import dimless
        g = make_diffusivity(mesh, d.lookup("diffusivity", "uniform"))
        gbcs = tuple(make_bc("empty" if p.type == "empty"
                             else "zeroGradient", i)
                     for i, p in enumerate(mesh.patches))
        self.gamma = VolField(
            g, jnp.zeros(mesh.n_boundary, mesh.C.dtype), gbcs, dimless,
            "motionDiffusivity", tuple({} for _ in mesh.patches)
        ).correct_boundary_conditions(mesh)

        moving = d.subdict("movingPatches", required=False) or Dictionary()
        self.motions = {}
        for pname, sub in moving.items():
            if not isinstance(sub, Dictionary):
                continue
            typ = sub.word("type", "oscillatingDisplacement")
            if typ not in _PATCH_MOTIONS:
                raise KeyError(f"movingPatches.{pname}: unknown type "
                               f"'{typ}' ({'|'.join(_PATCH_MOTIONS)})")
            self.motions[str(pname)] = _PATCH_MOTIONS[typ](sub)
        if not self.motions:
            raise KeyError("dynamicMotionSolverFvMesh: movingPatches "
                           "dictionary is required")

        # displacement field over the ORIGINAL mesh: BCs are static
        # (types), values per step via bcdata
        bcs, bcdata = [], []
        self._prescribed = []      # (patch_idx, motion|None-for-fixed)
        for i, p in enumerate(mesh.patches):
            if p.type == "empty":
                bcs.append(make_bc("empty", i))
                bcdata.append({})
                continue
            if p.is_coupled:
                bcs.append(make_bc("zeroGradient", i))
                bcdata.append({})
                continue
            motion = self.motions.get(p.name)
            bcs.append(make_bc("fixedValue", i))
            bcdata.append({"value": jnp.zeros((p.size, 3), mesh.C.dtype)})
            self._prescribed.append((i, motion))
        zero = jnp.zeros((mesh.n_cells, 3), mesh.C.dtype)
        bz = jnp.zeros((mesh.n_boundary, 3), mesh.C.dtype)
        dims = dim_length if self.solver_type == "displacementLaplacian" \
            else dim_velocity
        name = "cellDisplacement" \
            if self.solver_type == "displacementLaplacian" else "cellMotionU"
        self.D = VolField(zero, bz, tuple(bcs), dims, name, tuple(bcdata))

        from ..mesh.pointinterp import build_point_interpolator
        self.interp = build_point_interpolator(case.pmesh, mesh)
        self.points0 = np.asarray(case.pmesh.points, float).copy()
        self.prev_points = self.points0.copy()
        self.prev_time = float(case.time.value)

        # patch -> point ids (exact rigid boundary displacement)
        fo, fp = case.pmesh.face_offsets, case.pmesh.face_points
        self._patch_points = {}
        for i, p in enumerate(mesh.patches):
            pts = np.unique(fp[fo[p.start]:fo[p.start + p.size]]) \
                if p.size else np.empty(0, np.int64)
            self._patch_points[i] = pts

        from ..linalg.solvers import SolverControls
        self.controls = None
        for fname in ("cellDisplacement", "cellMotionU"):
            try:
                self.controls = case.solver_controls(fname)
                break
            except KeyError:
                continue
        if self.controls is None:
            self.controls = SolverControls(solver="PCG",
                                           preconditioner="DIC",
                                           tolerance=1e-8)
        self._solve = self._make_solve()

    def _make_solve(self):
        mesh = self.case.mesh
        gamma = self.gamma
        controls = self.controls
        interp = self.interp
        lap = self.case.laplacian_scheme("laplacian(diffusivity,"
                                         "cellDisplacement)")

        @jax.jit
        def run(D: VolField):
            from ..linalg import solve
            from ..ops import fvm
            eqn = fvm.laplacian(mesh, gamma, D, lap)
            Dn, _ = solve(mesh, eqn, controls)
            pointD = interp(Dn.data, Dn.bvalues)
            return Dn, pointD

        return run

    def update(self, t):
        mesh = self.case.mesh
        t = float(t)
        dt = t - self.prev_time
        # per-patch prescribed displacement (total, from points0)
        bcdata = list(self.D.bcdata)
        cf_all0 = self._face_centres0()
        for i, motion in self._prescribed:
            p = mesh.patches[i]
            if p.size == 0:
                continue
            x0 = cf_all0[p.start:p.start + p.size]
            disp = motion.displacement(x0, t) if motion is not None \
                else np.zeros((p.size, 3))
            if self.solver_type == "velocityLaplacian":
                prev = motion.displacement(x0, self.prev_time) \
                    if motion is not None else np.zeros((p.size, 3))
                disp = (disp - prev) / max(dt, 1e-300)
            bcdata[i] = {"value": jnp.asarray(disp, mesh.C.dtype)}
        D = self.D.replace(bcdata=tuple(bcdata))

        Dn, pointD = self._solve(D)
        self.D = Dn                              # warm start next step
        pointD = np.array(pointD, float)

        # exact prescribed displacement on constrained boundary points;
        # fixed patches first so points shared with a MOVING patch
        # (corner lines) follow the moving prescription
        ordered = ([pm for pm in self._prescribed if pm[1] is None]
                   + [pm for pm in self._prescribed if pm[1] is not None])
        for i, motion in ordered:
            pts = self._patch_points[i]
            if pts.size == 0:
                continue
            x0 = self.points0[pts]
            d_pts = motion.displacement(x0, t) if motion is not None \
                else np.zeros((pts.size, 3))
            if self.solver_type == "velocityLaplacian":
                prev = motion.displacement(x0, self.prev_time) \
                    if motion is not None else np.zeros((pts.size, 3))
                d_pts = (d_pts - prev) / max(dt, 1e-300)
            pointD[pts] = d_pts

        if self.solver_type == "displacementLaplacian":
            new_pts = self.points0 + pointD
        else:
            new_pts = self.prev_points + pointD * dt

        from ..mesh.mesharrays import build_mesh_arrays
        pmesh = dataclasses.replace(self.case.pmesh, points=new_pts)
        ma, _, _ = build_mesh_arrays(pmesh, renumber=False)

        if dt > 0:
            vol = swept_volumes(self.case.pmesh, self.prev_points,
                                new_pts)
            mesh_phi = jnp.asarray(vol / dt, ma.V.dtype)
            cf_prev = self._cf_cache if hasattr(self, "_cf_cache") \
                else None
            cf_new = np.asarray(ma.Cf)
            if cf_prev is None:
                pm_prev = dataclasses.replace(self.case.pmesh,
                                              points=self.prev_points)
                from ..mesh.geometry import face_centres_and_areas
                cf_prev, _ = face_centres_and_areas(pm_prev)
            u_b = (cf_new[ma.n_internal:]
                   - cf_prev[ma.n_internal:]) / dt
        else:
            mesh_phi = jnp.zeros(ma.n_faces, ma.V.dtype)
            u_b = np.zeros((ma.n_faces - ma.n_internal, 3))
        self._cf_cache = np.asarray(ma.Cf).copy()
        self.prev_points = new_pts
        self.prev_time = t
        return ma, mesh_phi, jnp.asarray(u_b, ma.C.dtype)

    def _face_centres0(self) -> np.ndarray:
        if not hasattr(self, "_cf0"):
            pm0 = dataclasses.replace(self.case.pmesh,
                                      points=self.points0)
            from ..mesh.geometry import face_centres_and_areas
            self._cf0, _ = face_centres_and_areas(pm0)
        return self._cf0
