"""Jump-cyclic coupled BCs (fan, fixedJump, uniformJump + AMI
variants) and fanPressure.

Reference: src/finiteVolume/fields/fvPatchFields/constraint/jumpCyclic/
jumpCyclicFvPatchField.C:196-240 (ghost value seen from a side is the
partner value MINUS the signed jump; +jump on the owner side, -jump on
the slave) and derived/{fan,fixedJump,fixedJumpAMI,uniformJump,
uniformJumpAMI,fanPressure}.

TPU-first shape: plain cyclics are normally merged into internal faces
(mesh/cyclic.py); a jump-carrying pair is instead kept as a coupled
interface via the conformal-AMI machinery (Case scans the start-time
field dicts and passes keep_cyclic to build_mesh_arrays). The implicit
coupling rides the existing coupled-patch SpMV hook unchanged; the jump
itself is a CONSTANT per iteration, so assembly folds -coeff*jump into
the matrix source (ops/fvm.py coupled branches), exactly the split the
reference makes in updateInterfaceMatrix.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from ..utils.registry import register
from .bcs import CyclicAMI, TotalPressure, _bcast, _interp_table


def _poly_eval(coeffs, x):
    """DataEntry polynomial ((c0 e0)(c1 e1)...): sum c_i * x**e_i."""
    y = 0.0
    for ce in coeffs:
        y = y + ce[0] * jnp.power(x, ce[1])
    return y


class _JumpCyclic(CyclicAMI):
    """Base for jump BCs on kept-cyclic / cyclicAMI pairs. Subclasses
    provide ``jump_magnitude`` (the owner-side jump, per-face or
    scalar); the signed per-face jump and the ghost shift are handled
    here. The matrix-source contribution is applied by assembly via
    ``jump`` (ops/fvm.py)."""

    has_jump = True

    def _pair_bd(self, mesh, patch, field, bd, key):
        """bd[key], falling back to the partner patch's bcdata (the
        reference reads the jump from the owner side's dict)."""
        if key in bd:
            return bd[key]
        t = self._t(mesh, patch)
        if 0 <= t.partner < len(field.bcdata):
            return field.bcdata[t.partner].get(key)
        return None

    def jump_magnitude(self, mesh, patch, field, bd, env=None):
        raise NotImplementedError

    def jump(self, mesh, patch, field, bd, env=None):
        """Signed per-face jump jf: ghost_effective = ghost - jf."""
        t = self._t(mesh, patch)
        jf = self.jump_magnitude(mesh, patch, field, bd, env)
        psi_c = field.patch_internal(mesh, patch)
        jf = jnp.broadcast_to(jnp.asarray(jf, psi_c.dtype), psi_c.shape)
        return jf if t.owner else -jf

    def evaluate(self, mesh, patch, field, bd, env=None):
        t = self._t(mesh, patch)
        psi_c = field.patch_internal(mesh, patch)
        ghost = mesh.ami_ghost(patch, field.data) \
            - self.jump(mesh, patch, field, bd, env)
        w = _bcast(t.w_face, psi_c)
        return w * psi_c + (1.0 - w) * ghost

    def snGrad(self, mesh, patch, field, bd, env=None):
        t = self._t(mesh, patch)
        psi_c = field.patch_internal(mesh, patch)
        ghost = mesh.ami_ghost(patch, field.data) \
            - self.jump(mesh, patch, field, bd, env)
        return _bcast(t.dc, psi_c) * (ghost - psi_c)


@register("fvPatchField", "fixedJump", "fixedJumpAMI")
@dataclass(frozen=True)
class FixedJump(_JumpCyclic):
    """jump read from the dict (`jump uniform 10;`), applied as an
    offset on the owner patch (reference: derived/fixedJump)."""

    def jump_magnitude(self, mesh, patch, field, bd, env=None):
        j = self._pair_bd(mesh, patch, field, bd, "jump")
        return 0.0 if j is None else j


@register("fvPatchField", "uniformJump", "uniformJumpAMI")
@dataclass(frozen=True)
class UniformJump(_JumpCyclic):
    """jump = jumpTable Function1 of TIME, uniform over the patch
    (reference: derived/uniformJump). bd: jump_times/jump_values
    (table), jump_poly, or jump_const; env: 't'."""

    def jump_magnitude(self, mesh, patch, field, bd, env=None):
        t = (env or {}).get("t", jnp.asarray(0.0))
        jt = self._pair_bd(mesh, patch, field, bd, "jump_times")
        if jt is not None:
            jv = self._pair_bd(mesh, patch, field, bd, "jump_values")
            return _interp_table(jt, jv, t)
        jp = self._pair_bd(mesh, patch, field, bd, "jump_poly")
        if jp is not None:
            return _poly_eval(jp, t)
        jc = self._pair_bd(mesh, patch, field, bd, "jump_const")
        return 0.0 if jc is None else jc


@register("fvPatchField", "fan")
@dataclass(frozen=True)
class Fan(UniformJump):
    """Fan curve: for the pressure field the jump is
    max(jumpTable(Un), 0) with Un the per-face normal velocity
    max(phi/magSf, 0) (volumetric; divided by rho when phi is a mass
    flux) — reference: derived/fan/fanFvPatchFields.C:47-64. For other
    fields the jump is jumpTable(t), as the reference's generic
    template."""

    def jump_magnitude(self, mesh, patch, field, bd, env=None):
        if field.data.ndim > 1:
            return super().jump_magnitude(mesh, patch, field, bd, env)
        phi = (env or {}).get("phi")
        if phi is None:
            return super().jump_magnitude(mesh, patch, field, bd, env)
        phi_b = (phi.data if hasattr(phi, "data") else phi)[
            patch.start:patch.start + patch.size]
        if hasattr(phi, "dims") and phi.dims.as_tuple()[0] == 1:
            rho = (env or {}).get("rho")
            if rho is not None and hasattr(rho, "bvalues"):
                rho_b = rho.bvalues[patch.bstart:patch.bstart
                                    + patch.size]
                phi_b = phi_b / jnp.maximum(rho_b, 1e-30)
        un = jnp.maximum(phi_b / mesh.patch_mag_sf(patch), 0.0)
        jt = self._pair_bd(mesh, patch, field, bd, "jump_times")
        if jt is not None:
            jv = self._pair_bd(mesh, patch, field, bd, "jump_values")
            return jnp.maximum(_interp_table(jt, jv, un), 0.0)
        jp = self._pair_bd(mesh, patch, field, bd, "jump_poly")
        if jp is not None:
            return jnp.maximum(_poly_eval(jp, un), 0.0)
        jc = self._pair_bd(mesh, patch, field, bd, "jump_const")
        return jnp.zeros_like(un) if jc is None \
            else jnp.maximum(jnp.broadcast_to(jc, un.shape), 0.0)


@register("fvPatchField", "fanPressure")
@dataclass(frozen=True)
class FanPressure(TotalPressure):
    """Total pressure offset by a fan curve at the patch volumetric
    flow rate: p0_eff = p0 - dir*fanCurve(max(dir*sum(phi), 0)), dir =
    +1 for 'out', -1 for 'in' (reference:
    derived/fanPressure/fanPressureFvPatchScalarField.C:128-165).
    from_dict captures direction; bd: jump_times/jump_values hold the
    fan curve (fileName tables are loaded by field IO)."""
    direction: int = 1   # +1 out, -1 in

    @classmethod
    def from_dict(cls, patch_idx, pd):
        d = 1
        if pd is not None and pd.word("direction", "out") == "in":
            d = -1
        return cls(patch_idx, d)

    def _p0(self, mesh, patch, field, bd, env=None):
        p0 = bd.get("p0", bd.get("value", 0.0))
        jt = bd.get("jump_times")
        phi = (env or {}).get("phi")
        if jt is None or phi is None:
            return p0
        from ..linalg.solvers import gsum
        phi_b = (phi.data if hasattr(phi, "data") else phi)[
            patch.start:patch.start + patch.size]
        if hasattr(phi, "dims") and phi.dims.as_tuple()[0] == 1:
            rho = (env or {}).get("rho")
            if rho is not None and hasattr(rho, "bvalues"):
                rho_b = rho.bvalues[patch.bstart:patch.bstart
                                    + patch.size]
                phi_b = phi_b / jnp.maximum(rho_b, 1e-30)
        vdot = jnp.maximum(self.direction * gsum(phi_b), 0.0)
        pd_fan = _interp_table(jt, bd["jump_values"], vdot)
        return p0 - self.direction * pd_fan
