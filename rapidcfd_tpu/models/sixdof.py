"""sixDoFRigidBodyMotion — rigid body dynamics coupled to mesh motion.

Capability surface of the reference's sixDoFRigidBodyMotion library
(reference: src/sixDoFRigidBodyMotion/sixDoFRigidBodyMotion/
sixDoFRigidBodyMotion.H:61-160, restraints/{linearSpring,linearDamper,
sphericalAngularDamper}, constraints, and the fvMotionSolver coupling
pointPatchFields/derived/sixDoFRigidBodyDisplacement): a rigid body
state (centre, orientation, momenta) advanced by the flow's pressure +
viscous patch forces, with the surrounding mesh deformed by the
distance-blended rigid transform (inner/outerDistance cosine ramp of
the reference's sixDoFRigidBodyMotionSolver).

Host-side by design: the 6-DoF ODE is a 12-dimensional system advanced
once per timestep (microseconds on the host); the flow-force patch
integrals read back only patch-sized arrays. The geometry rebuild runs
the same host pipeline as every other dynamic mesh here, and the flow
step stays a single jitted program with the mesh as an argument.

Selection (constant/dynamicMeshDict):

    dynamicFvMesh   dynamicMotionSolverFvMesh;
    motionSolver    sixDoFRigidBodyMotion;
    patches         (hull);
    innerDistance   0.05;
    outerDistance   0.35;
    mass            9.6;
    centreOfMass    (0 0 0);
    momentOfInertia (0.1 0.1 0.1);
    rhoInf          1000;
    g               (0 -9.81 0);
    accelerationRelaxation 0.7;
    constraints { onlyY { sixDoFRigidBodyMotionConstraint line;
                          direction (0 1 0); }
                  noRot { sixDoFRigidBodyMotionConstraint orientation; } }
    restraints  { spring { sixDoFRigidBodyMotionRestraint linearSpring;
                           anchor (0 0.1 0); refAttachmentPt (0 0 0);
                           stiffness 5000; damping 50; restLength 0.05; } }
"""

from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp
import numpy as np

from ..utils.dictionary import Dictionary
from ..utils.logging import info


def _rodrigues(axis_angle: np.ndarray) -> np.ndarray:
    """Rotation matrix for the rotation vector axis*angle."""
    th = float(np.linalg.norm(axis_angle))
    if th < 1e-14:
        return np.eye(3)
    k = axis_angle / th
    K = np.array([[0, -k[2], k[1]],
                  [k[2], 0, -k[0]],
                  [-k[1], k[0], 0]])
    return np.eye(3) + math.sin(th) * K + (1 - math.cos(th)) * (K @ K)


# ---------------------------------------------------------------------------
# restraints (reference: sixDoFRigidBodyMotionRestraint zoo)
# ---------------------------------------------------------------------------

class LinearSpring:
    """Spring from a space anchor to a body attachment point."""

    def __init__(self, d: Dictionary):
        self.anchor = np.asarray(d.lookup("anchor", [0, 0, 0]), float)
        self.ref_pt = np.asarray(d.lookup("refAttachmentPt", [0, 0, 0]),
                                 float)
        self.k = float(d.scalar("stiffness", 0.0))
        self.c = float(d.scalar("damping", 0.0))
        self.l0 = float(d.scalar("restLength", 0.0))

    def force(self, body) -> tuple[np.ndarray, np.ndarray]:
        attach = body.x + body.Q @ (self.ref_pt - body.x0)
        r = attach - self.anchor
        mag = max(np.linalg.norm(r), 1e-30)
        rhat = r / mag
        v_attach = body.v + np.cross(body.omega_global(),
                                     attach - body.x)
        f = -self.k * (mag - self.l0) * rhat - self.c * v_attach
        tau = np.cross(attach - body.x, f)
        return f, tau


class LinearDamper:
    def __init__(self, d: Dictionary):
        self.c = float(d.scalar("coeff", 0.0))

    def force(self, body):
        return -self.c * body.v, np.zeros(3)


class SphericalAngularDamper:
    def __init__(self, d: Dictionary):
        self.c = float(d.scalar("coeff", 0.0))

    def force(self, body):
        return np.zeros(3), -self.c * body.omega_global()


_RESTRAINTS = {
    "linearSpring": LinearSpring,
    "linearDamper": LinearDamper,
    "sphericalAngularDamper": SphericalAngularDamper,
}


# ---------------------------------------------------------------------------
# body state + symplectic integrator
# ---------------------------------------------------------------------------

class RigidBody:
    """State: centre x, orientation Q (body->global), velocity v,
    body-frame angular momentum pi. Advanced by the reference's
    'symplectic' scheme (leapfrog kick-drift-kick,
    symplecticMotionSolver.C semantics) with optional acceleration
    relaxation for loose FSI coupling."""

    def __init__(self, d: Dictionary):
        self.mass = float(d.scalar("mass"))
        moi = np.asarray(d.lookup("momentOfInertia", [1, 1, 1]), float)
        self.I = moi                     # principal, body frame
        self.x0 = np.asarray(d.lookup("centreOfMass", [0, 0, 0]), float)
        self.x = self.x0.copy()
        self.Q = np.eye(3)
        self.v = np.asarray(d.lookup("velocity", [0, 0, 0]), float)
        self.pi = np.zeros(3)
        self.g = np.asarray(d.lookup("g", [0, 0, 0]), float)
        self.relax = float(d.scalar("accelerationRelaxation", 1.0))
        self._a_prev = None
        self._dpidt_prev = None

        self.restraints = []
        r = d.subdict("restraints", required=False)
        if r is not None:
            for name, sub in r.items():
                if not isinstance(sub, Dictionary):
                    continue
                typ = sub.word("sixDoFRigidBodyMotionRestraint")
                if typ not in _RESTRAINTS:
                    raise KeyError(f"restraint '{typ}' "
                                   f"({'|'.join(_RESTRAINTS)})")
                self.restraints.append(_RESTRAINTS[typ](sub))

        # constraints as projection masks
        self.trans_dir = None     # translation restricted to this line
        self.trans_plane = None   # translation restricted to plane _|_ n
        self.fix_orientation = False
        self.rot_axis = None
        c = d.subdict("constraints", required=False)
        if c is not None:
            for name, sub in c.items():
                if not isinstance(sub, Dictionary):
                    continue
                typ = sub.word("sixDoFRigidBodyMotionConstraint")
                if typ == "line":
                    v = np.asarray(sub.lookup("direction", [0, 1, 0]),
                                   float)
                    self.trans_dir = v / max(np.linalg.norm(v), 1e-30)
                elif typ == "plane":
                    v = np.asarray(sub.lookup("normal", [0, 1, 0]), float)
                    self.trans_plane = v / max(np.linalg.norm(v), 1e-30)
                elif typ == "orientation":
                    self.fix_orientation = True
                elif typ == "axis":
                    v = np.asarray(sub.lookup("axis", [0, 0, 1]), float)
                    self.rot_axis = v / max(np.linalg.norm(v), 1e-30)
                elif typ == "point":
                    self.trans_dir = np.zeros(3)   # fully fixed centre
                else:
                    raise KeyError(
                        f"constraint '{typ}' "
                        "(line|plane|orientation|axis|point)")

    # -- helpers -------------------------------------------------------------
    def omega_body(self) -> np.ndarray:
        return self.pi / self.I

    def omega_global(self) -> np.ndarray:
        return self.Q @ self.omega_body()

    def _project_v(self, v):
        if self.trans_dir is not None:
            if not self.trans_dir.any():
                return np.zeros(3)
            return self.trans_dir * (v @ self.trans_dir)
        if self.trans_plane is not None:
            return v - self.trans_plane * (v @ self.trans_plane)
        return v

    def _project_pi(self, pi):
        if self.fix_orientation:
            return np.zeros(3)
        if self.rot_axis is not None:
            ax_b = self.Q.T @ self.rot_axis
            return ax_b * (pi @ ax_b)
        return pi

    def _total(self, F_ext, tau_ext):
        F = np.asarray(F_ext, float) + self.mass * self.g
        tau = np.asarray(tau_ext, float)
        for rst in self.restraints:
            f, tq = rst.force(self)
            F = F + f
            tau = tau + tq
        return F, tau

    def step(self, dt: float, F_ext, tau_ext):
        """Leapfrog: half kick (with the NEW force), drift, and the
        next call's half kick — velocity-Verlet arrangement with the
        force held over the step (flow forces are only available once
        per timestep in loose FSI coupling)."""
        F, tau = self._total(F_ext, tau_ext)
        a = F / self.mass
        tau_b = self.Q.T @ tau
        # Euler rigid-body equation in the body frame
        dpidt = tau_b - np.cross(self.omega_body(), self.pi)
        if self._a_prev is not None and self.relax < 1.0:
            a = self.relax * a + (1 - self.relax) * self._a_prev
            dpidt = self.relax * dpidt \
                + (1 - self.relax) * self._dpidt_prev
        self._a_prev, self._dpidt_prev = a, dpidt

        # kick
        self.v = self._project_v(self.v + 0.5 * dt * a)
        self.pi = self._project_pi(self.pi + 0.5 * dt * dpidt)
        # drift
        self.x = self.x + dt * self._project_v(self.v)
        if not self.fix_orientation:
            self.Q = self.Q @ _rodrigues(self.omega_body() * dt)
        # kick
        self.v = self._project_v(self.v + 0.5 * dt * a)
        self.pi = self._project_pi(self.pi + 0.5 * dt * dpidt)

    def rigid_displacement(self, pts0: np.ndarray) -> np.ndarray:
        """Displacement of material points pts0 under the current
        transform (relative to the initial configuration)."""
        return (self.x + (pts0 - self.x0) @ self.Q.T) - pts0


# ---------------------------------------------------------------------------
# mesh coupling
# ---------------------------------------------------------------------------

class SixDoFMotionMesh:
    """motionSolver sixDoFRigidBodyMotion: body patches move rigidly,
    the surrounding mesh follows with a cosine falloff between
    innerDistance and outerDistance (reference:
    sixDoFRigidBodyMotionSolver.C:120-180 scale field)."""

    needs_flow = True

    def __init__(self, case, d: Dictionary):
        self.case = case
        mesh = case.mesh
        self.body = RigidBody(d)
        self.patch_names = set(str(w) for w in
                               d.lookup("patches", required=True))
        self.rho_inf = float(d.scalar("rhoInf", 1.0))
        inner = float(d.scalar("innerDistance"))
        outer = float(d.scalar("outerDistance"))
        self.report = d.word("report", "off") in ("on", "true", "yes")

        # point blend scale from distance to the body patches
        from scipy.spatial import cKDTree
        cf = [np.asarray(mesh.patch_cf(p)) for p in mesh.patches
              if p.name in self.patch_names and p.size]
        if not cf:
            raise KeyError(f"sixDoFRigidBodyMotion: none of {sorted(self.patch_names)} "
                           "found / non-empty")
        self.points0 = np.asarray(case.pmesh.points, float).copy()
        tree = cKDTree(np.concatenate(cf))
        dist, _ = tree.query(self.points0)
        s = np.clip((outer - dist) / max(outer - inner, 1e-30), 0.0, 1.0)
        # cosine ramp (C1 at both ends, reference scale field)
        self.scale = 0.5 * (1.0 - np.cos(s * math.pi))
        self.scale[dist <= inner] = 1.0
        self.scale[dist >= outer] = 0.0

        self.prev_points = self.points0.copy()
        self.prev_time = float(case.time.value)
        self._flow = None

    def set_flow(self, U, p, nu_eff=None):
        self._flow = (U, p, nu_eff)

    def _flow_forces(self):
        """Pressure + viscous force/torque about the body centre
        (incompressible convention: p is kinematic, scaled by rhoInf —
        reference forces.C applied to the body patches)."""
        mesh = self.case.mesh
        if self._flow is None:
            return np.zeros(3), np.zeros(3)
        U, p, nu_eff = self._flow
        from ..ops import fvc
        sng = fvc.sn_grad(mesh, U)
        F = np.zeros(3)
        tau = np.zeros(3)
        for patch in mesh.patches:
            if patch.name not in self.patch_names or patch.size == 0:
                continue
            sl = slice(patch.start, patch.start + patch.size)
            bsl = slice(patch.bstart, patch.bstart + patch.size)
            sf = np.asarray(mesh.Sf[sl])
            cf = np.asarray(mesh.Cf[sl])
            p_b = np.asarray(p.bvalues[bsl])
            fp = self.rho_inf * sf * p_b[:, None]
            msf = np.asarray(mesh.mag_sf[sl])
            if nu_eff is None:
                nu_b = 0.0
            elif hasattr(nu_eff, "bvalues"):       # VolField
                nu_b = np.asarray(nu_eff.bvalues[bsl])
            elif hasattr(nu_eff, "value"):         # Dimensioned
                nu_b = float(np.asarray(nu_eff.value))
            else:
                nu_b = float(np.asarray(nu_eff))
            fv = -self.rho_inf * (np.asarray(nu_b) * msf)[:, None] \
                * np.asarray(sng.data[sl])
            f = fp + fv
            F += f.sum(0)
            tau += np.cross(cf - self.body.x, f).sum(0)
        return F, tau

    def update(self, t):
        t = float(t)
        dt = t - self.prev_time
        F, tau = self._flow_forces()
        if dt > 0:
            self.body.step(dt, F, tau)
        if self.report:
            info(f"6-DoF: centre = {self.body.x}, v = {self.body.v}\n")

        disp = self.body.rigid_displacement(self.points0)
        new_pts = self.points0 + self.scale[:, None] * disp

        from ..mesh.mesharrays import build_mesh_arrays
        from .motionsolver import swept_volumes
        pmesh = dataclasses.replace(self.case.pmesh, points=new_pts)
        ma, _, _ = build_mesh_arrays(pmesh, renumber=False)

        if dt > 0:
            vol = swept_volumes(self.case.pmesh, self.prev_points,
                                new_pts)
            mesh_phi = jnp.asarray(vol / dt, ma.V.dtype)
            from ..mesh.geometry import face_centres_and_areas
            pm_prev = dataclasses.replace(self.case.pmesh,
                                          points=self.prev_points)
            cf_prev, _ = face_centres_and_areas(pm_prev)
            u_b = (np.asarray(ma.Cf)[ma.n_internal:]
                   - cf_prev[ma.n_internal:]) / dt
        else:
            mesh_phi = jnp.zeros(ma.n_faces, ma.V.dtype)
            u_b = np.zeros((ma.n_faces - ma.n_internal, 3))
        self.prev_points = new_pts
        self.prev_time = t
        return ma, mesh_phi, jnp.asarray(u_b, ma.C.dtype)
