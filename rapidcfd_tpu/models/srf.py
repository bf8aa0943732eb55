"""Single rotating frame (SRF) models.

Capability surface of the reference's SRF framework (reference:
src/finiteVolume/cfdTools/general/SRF/SRFModel/SRFModel/SRFModel.C:
Fcoriolis = 2*omega ^ Urel, Fcentrifugal = omega ^ (omega ^ C),
Su = Fcoriolis + Fcentrifugal; velocity(pos) = omega ^ (pos - axis*
(axis & pos))), selected from constant/SRFProperties (`SRFModel rpm`).
Consumed by SRFSimpleFoam / SRFPimpleFoam which solve for the relative
velocity Urel with `+ SRF->Su()` on the momentum LHS.

TPU-first: the model is a frozen bundle of jnp constants; Su is a pure
function fused into the jitted step.
"""

from __future__ import annotations

import math
import os

import jax.numpy as jnp
import numpy as np

from ..utils.dictionary import parse_file
from ..utils.logging import info


class SRFModel:
    """`SRFModel rpm;` from constant/SRFProperties (reference:
    SRF/SRFModel/rpm/rpm.C: omega = axis * rpm*2*pi/60)."""

    def __init__(self, case):
        path = os.path.join(case.dir, "constant", "SRFProperties")
        d = parse_file(path)
        model = d.word("SRFModel", "rpm")
        axis = np.asarray(d.lookup("axis", [0.0, 0.0, 1.0]), float)
        axis = axis / np.linalg.norm(axis)
        self.origin = np.asarray(d.lookup("origin", [0.0, 0.0, 0.0]),
                                 float)
        if model != "rpm":
            raise KeyError(f"SRFProperties: unknown SRFModel '{model}' "
                           f"(only 'rpm' exists in the reference)")
        coeffs = d.subdict("rpmCoeffs", required=False)
        rpm = float((coeffs or d).scalar("rpm", 0.0))
        self.axis = jnp.asarray(axis)
        self.omega = jnp.asarray(axis * rpm * 2.0 * math.pi / 60.0)
        info(f"Creating SRF model rpm (omega = {rpm * math.pi / 30.0:g} "
             f"rad/s)")

    def su(self, mesh, U):
        """Acceleration on the momentum LHS (reference SRFModel::Su):
        2*omega ^ Urel + omega ^ (omega ^ (C - origin)); shape (n,3)."""
        r = mesh.C - jnp.asarray(self.origin, mesh.C.dtype)
        w = jnp.broadcast_to(self.omega, U.data.shape)
        return (2.0 * jnp.cross(w, U.data)
                + jnp.cross(w, jnp.cross(w, r)))

    def velocity(self, positions):
        """Frame velocity at positions (reference SRFModel::velocity):
        omega ^ (r - axis*(axis & r)) with r relative to the origin."""
        r = positions - jnp.asarray(self.origin, positions.dtype)
        r_perp = r - self.axis * (r * self.axis).sum(-1, keepdims=True)
        return jnp.cross(jnp.broadcast_to(self.omega, r.shape), r_perp)

    def u_abs(self, mesh, U_rel):
        """Uabs = Urel + frame velocity (reference SRFModel::Uabs)."""
        data = U_rel.data + self.velocity(mesh.C)
        bvals = U_rel.bvalues + self.velocity(mesh.Cf)[mesh.n_internal:]
        return U_rel.replace(data=data, bvalues=bvals, name="Uabs")
