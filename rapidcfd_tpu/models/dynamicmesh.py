"""Dynamic (moving) mesh — solid-body motion framework.

Capability surface of the reference's dynamicFvMesh layer (reference:
src/dynamicFvMesh/{staticFvMesh,solidBodyMotionFvMesh} with
solidBodyMotionFunctions/{linearMotion,rotatingMotion,
oscillatingLinearMotion}), selected from constant/dynamicMeshDict.

TPU-first split: the point transform and velocities are analytic pure
functions; the geometry rebuild runs the existing host pipeline
(mesh/mesharrays.build_mesh_arrays on the stored renumbered PolyMesh —
topology is static, so the rebuilt MeshArrays pytree has identical
static metadata and passes through jit as an ARGUMENT without
recompilation). The mesh flux meshPhi = U_mesh . Sf is analytic; for
rigid motions div(U_mesh) = 0, so the space-conservation law holds
exactly.
"""

from __future__ import annotations

import dataclasses
import math
import os

import jax.numpy as jnp
import numpy as np

from ..utils.dictionary import Dictionary, parse_file
from ..utils.logging import info


class SolidBodyMotion:
    """Base: transform(points0, t) and velocity(positions, t)."""

    def transform(self, pts, t):
        raise NotImplementedError

    def velocity(self, pos, t):
        raise NotImplementedError


class LinearMotion(SolidBodyMotion):
    """Constant-velocity translation (reference:
    solidBodyMotionFunctions/linearMotion)."""

    def __init__(self, d: Dictionary):
        self.v = np.asarray(d.lookup("velocity", [0.0, 0.0, 0.0]),
                            float)

    def transform(self, pts, t):
        return pts + self.v * t

    def velocity(self, pos, t):
        return np.broadcast_to(self.v, pos.shape)


class OscillatingLinearMotion(SolidBodyMotion):
    """x = A*sin(omega*t) (reference: oscillatingLinearMotion)."""

    def __init__(self, d: Dictionary):
        self.a = np.asarray(d.lookup("amplitude", [0.0, 0.0, 0.0]),
                            float)
        self.omega = float(d.scalar("omega", 1.0))

    def transform(self, pts, t):
        return pts + self.a * math.sin(self.omega * t)

    def velocity(self, pos, t):
        v = self.a * self.omega * math.cos(self.omega * t)
        return np.broadcast_to(v, pos.shape)


class RotatingMotion(SolidBodyMotion):
    """Rigid rotation about an axis (reference: rotatingMotion) with a
    full Function1 omega(t) in rad/s: the rotation angle is the exact
    running integral of the table/polynomial/sine entry."""

    def __init__(self, d: Dictionary):
        self.origin = np.asarray(d.lookup("origin", [0.0, 0.0, 0.0]),
                                 float)
        axis = np.asarray(d.lookup("axis", [0.0, 0.0, 1.0]), float)
        self.axis = axis / np.linalg.norm(axis)
        from ..utils.function1 import Function1
        self._omega = Function1.from_entry(d, "omega", default=1.0)

    def omega_at(self, t: float) -> float:
        return float(self._omega(t))

    def _angle(self, t: float) -> float:
        if self._omega.kind == "constant":
            return float(self._omega(0.0)) * t
        tab = self._omega._fn
        if hasattr(tab, "integrate"):
            return float(tab.integrate(0.0, t))
        # generic Function1: fixed-step trapezoid (host, per rebuild)
        n = 256
        ts = np.linspace(0.0, t, n + 1)
        vs = np.array([self._omega(x) for x in ts])
        return float(np.trapezoid(vs, ts)) if hasattr(np, "trapezoid") \
            else float(np.trapz(vs, ts))

    def _rot(self, t):
        th = self._angle(t)
        k = self.axis
        kx = np.array([[0, -k[2], k[1]],
                       [k[2], 0, -k[0]],
                       [-k[1], k[0], 0]])
        return (np.eye(3) + math.sin(th) * kx
                + (1 - math.cos(th)) * (kx @ kx))

    def transform(self, pts, t):
        r = pts - self.origin
        return (r @ self._rot(t).T) + self.origin

    def velocity(self, pos, t):
        w = self.omega_at(t) * self.axis
        return np.cross(w, pos - self.origin)


_MOTIONS = {
    "linearMotion": LinearMotion,
    "oscillatingLinearMotion": OscillatingLinearMotion,
    "rotatingMotion": RotatingMotion,
}


class SolidBodyMotionMesh:
    """dynamicFvMesh solidBodyMotionFvMesh over the WHOLE mesh
    (cellZone-restricted motion needs sliding interfaces — deferred
    with AMI). Each update() rebuilds geometry on the host and returns
    a new MeshArrays plus the analytic face mesh flux."""

    def __init__(self, case, func: SolidBodyMotion):
        self.case = case
        self.func = func
        self.points0 = np.asarray(case.pmesh.points, float).copy()

    def update(self, t):
        """Returns (mesh_arrays, mesh_phi (nFaces,), boundary mesh
        velocity (nBoundary,3)) at time t."""
        from ..mesh.mesharrays import build_mesh_arrays
        pmesh = dataclasses.replace(
            self.case.pmesh,
            points=self.func.transform(self.points0, t))
        ma, _, _ = build_mesh_arrays(pmesh, renumber=False)
        cf = np.asarray(ma.Cf)
        u_mesh = self.func.velocity(cf, t)
        mesh_phi = jnp.asarray(
            (u_mesh * np.asarray(ma.Sf)).sum(-1), ma.V.dtype)
        u_b = jnp.asarray(u_mesh[ma.n_internal:], ma.C.dtype)
        return ma, mesh_phi, u_b


def make_dynamic_mesh(case):
    """dynamicFvMesh::New — None for staticFvMesh/absent dict."""
    path = os.path.join(case.dir, "constant", "dynamicMeshDict")
    if not os.path.isfile(path):
        return None
    d = parse_file(path)
    typ = d.word("dynamicFvMesh", "staticFvMesh")
    if typ == "staticFvMesh":
        return None
    if typ == "dynamicMotionSolverFvMesh":
        ms = d.word("motionSolver", "displacementLaplacian")
        if ms == "sixDoFRigidBodyMotion":
            from .sixdof import SixDoFMotionMesh
            info("Selecting dynamicFvMesh dynamicMotionSolverFvMesh "
                 "(sixDoFRigidBodyMotion)")
            coeffs = d.subdict("sixDoFRigidBodyMotionCoeffs",
                               required=False) or d
            return SixDoFMotionMesh(case, coeffs)
        from .motionsolver import MotionSolverMesh
        info("Selecting dynamicFvMesh dynamicMotionSolverFvMesh")
        return MotionSolverMesh(case, d)
    if typ != "solidBodyMotionFvMesh":
        raise KeyError(f"dynamicMeshDict: unsupported dynamicFvMesh "
                       f"'{typ}' (staticFvMesh|solidBodyMotionFvMesh|"
                       f"dynamicMotionSolverFvMesh)")
    coeffs = d.subdict("solidBodyMotionFvMeshCoeffs", required=False) \
        or d
    fname = coeffs.word("solidBodyMotionFunction", "rotatingMotion")
    if fname not in _MOTIONS:
        raise KeyError(f"unknown solidBodyMotionFunction '{fname}' "
                       f"({'|'.join(_MOTIONS)})")
    sub = coeffs.subdict(fname + "Coeffs", required=False) or coeffs
    info(f"Selecting dynamicFvMesh solidBodyMotionFvMesh ({fname})")
    return SolidBodyMotionMesh(case, _MOTIONS[fname](sub))
