"""Boundary conditions as pure per-patch coefficient functions.

The reference's fvPatchField contract (reference:
src/finiteVolume/fields/fvPatchFields/fvPatchField/fvPatchField.H:80) is
four hooks consumed by assembly: valueInternalCoeffs / valueBoundaryCoeffs
(convection) and gradientInternalCoeffs / gradientBoundaryCoeffs
(diffusion). Here each BC type provides:

- ``evaluate``       -> boundary face values
- ``value_internal_coeff``    (vic):  faceVal = vic * psi_c + vbc
- ``gradient_internal_coeff`` (gic):  snGrad  = gic * psi_c + gbc

with vbc/gbc derived *generically* as ``evaluate - vic*psi_c`` and
``snGrad(evaluate) - gic*psi_c`` — the same consistency trick the
reference uses for transform patches, which makes tensor-valued BCs
(symmetry/slip) work in segregated solves with diagonal implicit coeffs.

BC descriptors are static frozen dataclasses (pytree-static); their array
parameters live in the field's ``bcdata`` tuple so they flow through jit.
Environment fields BCs read from the registry in the reference (e.g. phi
for inletOutlet) are passed via ``env``.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from ..utils.registry import lookup, register


@dataclass(frozen=True)
class BC:
    patch: int
    #: survives field arithmetic (else result degrades to calculated)
    preserves_type = False
    #: participates in matrix assembly (empty does not)
    assembles = True
    #: boundary value is imposed, not derived from the interior (the
    #: complement of the reference's fvPatchField::assignable(); used by
    #: constrainHbyA-style flux constraints)
    fixes_value = False
    # True when the BC's action carries no dimensional data of its field
    # (zeroGradient/symmetry/empty/wall-functions): such types survive
    # with_calculated_bcs on DERIVED fields; value-carrying types
    # (fixedValue, mixed, ...) must not — their stored data has the
    # parent field's units (deriving rho from T must not impose T's
    # Kelvin values as densities)
    value_free = False
    # True when the BC pins the solution level (Dirichlet-like), removing
    # the Neumann nullspace — the reference's needReference predicate
    # (cfdTools/general/findRefCell). Distinct from fixes_value, which
    # also covers constraint patches (symmetry) for constrainHbyA.
    fixes_level = False

    # -- default hook implementations ---------------------------------------
    def evaluate(self, mesh, patch, field, bd, env=None):
        raise NotImplementedError

    def value_internal_coeff(self, mesh, patch, field, bd, env=None):
        raise NotImplementedError

    def gradient_internal_coeff(self, mesh, patch, field, bd, env=None):
        raise NotImplementedError

    # -- generic derived coefficients ----------------------------------------
    def value_coeffs(self, mesh, patch, field, bd, env=None):
        vic = self.value_internal_coeff(mesh, patch, field, bd, env)
        psi_c = field.patch_internal(mesh, patch)
        vbc = self.evaluate(mesh, patch, field, bd, env) - vic * psi_c
        return vic, vbc

    def gradient_coeffs(self, mesh, patch, field, bd, env=None):
        gic = self.gradient_internal_coeff(mesh, patch, field, bd, env)
        psi_c = field.patch_internal(mesh, patch)
        dc = _bcast(mesh.patch_delta_coeffs(patch), psi_c)
        sngrad = (self.evaluate(mesh, patch, field, bd, env) - psi_c) * dc
        gbc = sngrad - gic * psi_c
        return gic, gbc

    def snGrad(self, mesh, patch, field, bd, env=None):
        psi_c = field.patch_internal(mesh, patch)
        dc = _bcast(mesh.patch_delta_coeffs(patch), psi_c)
        return (self.evaluate(mesh, patch, field, bd, env) - psi_c) * dc


def _bcast(coef, like):
    """Broadcast a per-face scalar coefficient against a (n,...) field."""
    return coef.reshape(coef.shape + (1,) * (like.ndim - 1))


def _zeros_like_patch(field, mesh, patch):
    psi_c = field.patch_internal(mesh, patch)
    return jnp.zeros_like(psi_c)


# ---------------------------------------------------------------------------
# basic
# ---------------------------------------------------------------------------

@register("fvPatchField", "calculated")
@dataclass(frozen=True)
class Calculated(BC):
    value_free = True
    """Explicitly-stored values; not usable as implicit coefficients
    (reference: basic/calculated errors in assembly the same way)."""
    preserves_type = False

    def evaluate(self, mesh, patch, field, bd, env=None):
        return field.patch_values(mesh, patch)

    def value_internal_coeff(self, mesh, patch, field, bd, env=None):
        raise TypeError(
            f"patch '{patch.name}': calculated BC on field "
            f"'{field.name}' cannot provide matrix coefficients")

    gradient_internal_coeff = value_internal_coeff


@register("fvPatchField", "fixedValue")
@dataclass(frozen=True)
class FixedValue(BC):
    fixes_level = True
    preserves_type = True
    fixes_value = True

    def evaluate(self, mesh, patch, field, bd, env=None):
        return jnp.broadcast_to(bd["value"],
                                field.patch_internal(mesh, patch).shape)

    def value_internal_coeff(self, mesh, patch, field, bd, env=None):
        return jnp.zeros(patch.size)[:, None] \
            if field.data.ndim > 1 else jnp.zeros(patch.size)

    def gradient_internal_coeff(self, mesh, patch, field, bd, env=None):
        gic = -mesh.patch_delta_coeffs(patch)
        return gic[:, None] if field.data.ndim > 1 else gic


@register("fvPatchField", "zeroGradient")
@dataclass(frozen=True)
class ZeroGradient(BC):
    preserves_type = True
    value_free = True

    def evaluate(self, mesh, patch, field, bd, env=None):
        return field.patch_internal(mesh, patch)

    def value_internal_coeff(self, mesh, patch, field, bd, env=None):
        return jnp.ones(patch.size)[:, None] \
            if field.data.ndim > 1 else jnp.ones(patch.size)

    def gradient_internal_coeff(self, mesh, patch, field, bd, env=None):
        return jnp.zeros(patch.size)[:, None] \
            if field.data.ndim > 1 else jnp.zeros(patch.size)


@register("fvPatchField", "empty")
@dataclass(frozen=True)
class Empty(BC):
    """2D constraint patch: contributes nothing to assembly."""
    preserves_type = True
    value_free = True
    assembles = False

    def evaluate(self, mesh, patch, field, bd, env=None):
        return _zeros_like_patch(field, mesh, patch)

    def value_internal_coeff(self, mesh, patch, field, bd, env=None):
        return jnp.zeros(patch.size)

    def gradient_internal_coeff(self, mesh, patch, field, bd, env=None):
        return jnp.zeros(patch.size)


@register("fvPatchField", "fixedGradient")
@dataclass(frozen=True)
class FixedGradient(BC):
    preserves_type = True

    def evaluate(self, mesh, patch, field, bd, env=None):
        psi_c = field.patch_internal(mesh, patch)
        dc = _bcast(mesh.patch_delta_coeffs(patch), psi_c)
        return psi_c + jnp.broadcast_to(bd["gradient"], psi_c.shape) / dc

    def value_internal_coeff(self, mesh, patch, field, bd, env=None):
        return jnp.ones(patch.size)[:, None] \
            if field.data.ndim > 1 else jnp.ones(patch.size)

    def gradient_internal_coeff(self, mesh, patch, field, bd, env=None):
        return jnp.zeros(patch.size)[:, None] \
            if field.data.ndim > 1 else jnp.zeros(patch.size)


@register("fvPatchField", "mixed")
@dataclass(frozen=True)
class Mixed(BC):
    """f*fixedValue + (1-f)*fixedGradient (reference: basic/mixed)."""
    preserves_type = True

    def _f(self, bd, psi_c):
        return jnp.broadcast_to(bd["valueFraction"], psi_c.shape)

    def evaluate(self, mesh, patch, field, bd, env=None):
        psi_c = field.patch_internal(mesh, patch)
        dc = _bcast(mesh.patch_delta_coeffs(patch), psi_c)
        f = self._f(bd, psi_c)
        ref_v = jnp.broadcast_to(bd["refValue"], psi_c.shape)
        ref_g = jnp.broadcast_to(bd["refGradient"], psi_c.shape)
        return f * ref_v + (1.0 - f) * (psi_c + ref_g / dc)

    def value_internal_coeff(self, mesh, patch, field, bd, env=None):
        psi_c = field.patch_internal(mesh, patch)
        return 1.0 - self._f(bd, psi_c)

    def gradient_internal_coeff(self, mesh, patch, field, bd, env=None):
        psi_c = field.patch_internal(mesh, patch)
        dc = _bcast(mesh.patch_delta_coeffs(patch), psi_c)
        return -self._f(bd, psi_c) * dc


# ---------------------------------------------------------------------------
# constraint
# ---------------------------------------------------------------------------

@register("fvPatchField", "symmetryPlane", "symmetry")
@dataclass(frozen=True)
class Symmetry(BC):
    """Mirror condition: scalars zeroGradient, vectors tangential-projected
    with diagonal implicit coeffs (reference: basicSymmetry/transform)."""
    preserves_type = True
    fixes_value = True

    def evaluate(self, mesh, patch, field, bd, env=None):
        psi_c = field.patch_internal(mesh, patch)
        if psi_c.ndim == 1:
            return psi_c
        n = mesh.patch_normals(patch)
        return psi_c - (psi_c * n).sum(-1, keepdims=True) * n

    def value_internal_coeff(self, mesh, patch, field, bd, env=None):
        psi_c = field.patch_internal(mesh, patch)
        if psi_c.ndim == 1:
            return jnp.ones(patch.size)
        n = mesh.patch_normals(patch)
        return 1.0 - n * n

    def gradient_internal_coeff(self, mesh, patch, field, bd, env=None):
        psi_c = field.patch_internal(mesh, patch)
        if psi_c.ndim == 1:
            return jnp.zeros(patch.size)
        n = mesh.patch_normals(patch)
        dc = mesh.patch_delta_coeffs(patch)[:, None]
        return -(n * n) * dc


@register("fvPatchField", "slip")
@dataclass(frozen=True)
class Slip(Symmetry):
    pass


# ---------------------------------------------------------------------------
# derived
# ---------------------------------------------------------------------------

@register("fvPatchField", "noSlip")
@dataclass(frozen=True)
class NoSlip(FixedValue):
    def evaluate(self, mesh, patch, field, bd, env=None):
        return _zeros_like_patch(field, mesh, patch)


@register("fvPatchField", "inletOutlet")
@dataclass(frozen=True)
class InletOutlet(Mixed):
    """zeroGradient on outflow, fixed inletValue on inflow, switched by the
    face flux (reference: derived/inletOutlet). env must carry 'phi'."""
    preserves_type = True

    def _patch_phi(self, mesh, patch, env):
        if env is None or "phi" not in env:
            # field construction time (no flux yet): zero flux biases the
            # switch to the zero-gradient branch, matching the reference
            # keeping the stored file values until the first updateCoeffs
            return jnp.zeros(patch.size)
        phi = env["phi"]
        data = phi.data if hasattr(phi, "data") else phi
        return data[patch.start:patch.start + patch.size]

    def _mixed_bd(self, bd, mesh, patch, env, psi_c):
        phi_p = self._patch_phi(mesh, patch, env)
        f = 1.0 - (phi_p >= 0.0).astype(psi_c.dtype)
        f = _bcast(f, psi_c) * jnp.ones_like(psi_c)
        return dict(refValue=jnp.broadcast_to(bd["inletValue"], psi_c.shape),
                    refGradient=jnp.zeros_like(psi_c), valueFraction=f)

    def evaluate(self, mesh, patch, field, bd, env=None):
        psi_c = field.patch_internal(mesh, patch)
        return Mixed.evaluate(self, mesh, patch, field,
                              self._mixed_bd(bd, mesh, patch, env, psi_c),
                              env)

    def value_internal_coeff(self, mesh, patch, field, bd, env=None):
        psi_c = field.patch_internal(mesh, patch)
        return Mixed.value_internal_coeff(
            self, mesh, patch, field,
            self._mixed_bd(bd, mesh, patch, env, psi_c), env)

    def gradient_internal_coeff(self, mesh, patch, field, bd, env=None):
        psi_c = field.patch_internal(mesh, patch)
        return Mixed.gradient_internal_coeff(
            self, mesh, patch, field,
            self._mixed_bd(bd, mesh, patch, env, psi_c), env)


@register("fvPatchField", "uniformFixedValue")
@dataclass(frozen=True)
class UniformFixedValue(FixedValue):
    """fixedValue whose value comes from 'uniformValue' (constant entry;
    reference: derived/uniformFixedValue with Function1 tables —
    time-varying tables deferred)."""

    def evaluate(self, mesh, patch, field, bd, env=None):
        v = bd.get("uniformValue", bd.get("value"))
        return jnp.broadcast_to(v, field.patch_internal(mesh, patch).shape)


@register("fvPatchField", "outletInlet")
@dataclass(frozen=True)
class OutletInlet(InletOutlet):
    """Mirror of inletOutlet: fixed outletValue on OUTflow, zeroGradient
    on inflow (reference: derived/outletInlet)."""

    def _mixed_bd(self, bd, mesh, patch, env, psi_c):
        phi_p = self._patch_phi(mesh, patch, env)
        f = (phi_p >= 0.0).astype(psi_c.dtype)
        f = _bcast(f, psi_c) * jnp.ones_like(psi_c)
        return dict(refValue=jnp.broadcast_to(bd["outletValue"],
                                              psi_c.shape),
                    refGradient=jnp.zeros_like(psi_c), valueFraction=f)


@register("fvPatchField", "freestream", "freestreamVelocity")
@dataclass(frozen=True)
class Freestream(InletOutlet):
    """inletOutlet with the far-field 'freestreamValue' as the inflow
    state (reference: derived/freestream)."""

    def _mixed_bd(self, bd, mesh, patch, env, psi_c):
        phi_p = self._patch_phi(mesh, patch, env)
        f = 1.0 - (phi_p >= 0.0).astype(psi_c.dtype)
        f = _bcast(f, psi_c) * jnp.ones_like(psi_c)
        return dict(refValue=jnp.broadcast_to(bd["freestreamValue"],
                                              psi_c.shape),
                    refGradient=jnp.zeros_like(psi_c), valueFraction=f)


@register("fvPatchField", "freestreamPressure")
@dataclass(frozen=True)
class FreestreamPressure(ZeroGradient):
    """Far-field pressure: zeroGradient transport with the freestream
    value as the nominal level (reference: derived/freestreamPressure)."""


@register("fvPatchField", "surfaceNormalFixedValue")
@dataclass(frozen=True)
class SurfaceNormalFixedValue(FixedValue):
    """Vector value = refValue * outward patch normal (reference:
    derived/surfaceNormalFixedValue)."""

    def evaluate(self, mesh, patch, field, bd, env=None):
        n = mesh.patch_normals(patch)
        ref = bd["refValue"]
        return jnp.broadcast_to(ref, (patch.size,))[:, None] * n


@register("fvPatchField", "movingWallVelocity")
@dataclass(frozen=True)
class MovingWallVelocity(FixedValue):
    """Wall velocity with the normal component set so the RELATIVE wall
    flux is exactly zero (reference: derived/movingWallVelocity). On a
    static mesh the normal component is removed; on a moving mesh the
    dynamic-mesh solvers pass env['meshUb'] (boundary mesh velocity)
    and env['meshPhiB'] (boundary mesh flux), giving U_b = tangential
    wall velocity + n*(meshPhi/|Sf|)."""

    def evaluate(self, mesh, patch, field, bd, env=None):
        n = mesh.patch_normals(patch)
        # dynamic-mesh solvers bake the exact wall velocity (tangential
        # mesh velocity + meshPhi-consistent normal) into bcdata so
        # env-less matrix assembly sees it verbatim
        if "meshWallValue" in bd:
            return jnp.broadcast_to(
                bd["meshWallValue"],
                field.patch_internal(mesh, patch).shape)
        mesh_ub = (env or {}).get("meshUb")
        if mesh_ub is not None:
            sl = slice(patch.bstart, patch.bstart + patch.size)
            v = mesh_ub[sl]
            mesh_phi_b = (env or {}).get("meshPhiB")
            vn = (mesh_phi_b[sl] / jnp.maximum(
                mesh.patch_mag_sf(patch), 1e-30))[:, None] * n \
                if mesh_phi_b is not None \
                else n * (v * n).sum(-1, keepdims=True)
            return v - n * (v * n).sum(-1, keepdims=True) + vn
        v = jnp.broadcast_to(bd["value"],
                             field.patch_internal(mesh, patch).shape)
        return v - n * (v * n).sum(-1, keepdims=True)


@register("fvPatchField", "fixedFluxPressure")
@dataclass(frozen=True)
class FixedFluxPressure(ZeroGradient):
    """Pressure gradient adjusted so the boundary flux matches the
    body-force flux (reference: derived/fixedFluxPressure). The solvers
    realise the same balance by excluding body-force fluxes (phig) from
    non-coupled boundary faces, so the remaining gradient is zero —
    this type behaves as zeroGradient here and exists so reference
    cases parse unchanged."""


def make_bc(type_word: str, patch_idx: int) -> BC:
    cls = lookup("fvPatchField", type_word)
    return cls(patch_idx)


@register("fvPatchField", "totalPressure")
@dataclass(frozen=True)
class TotalPressure(BC):
    """p = p0 - 0.5|U|^2 on inflow, p0 on outflow (incompressible form;
    reference: derived/totalPressure). env must carry 'U' and 'phi'."""
    preserves_type = True
    fixes_level = True

    def evaluate(self, mesh, patch, field, bd, env=None):
        p0 = jnp.broadcast_to(bd["p0"], (patch.size,))
        if env is None or "U" not in env or "phi" not in env:
            return p0
        sl = slice(patch.bstart, patch.bstart + patch.size)
        u_b = env["U"].bvalues[sl]
        phi_b = env["phi"].data[patch.start:patch.start + patch.size]
        dyn = 0.5 * (u_b * u_b).sum(-1)
        return jnp.where(phi_b >= 0.0, p0, p0 - dyn)

    def value_internal_coeff(self, mesh, patch, field, bd, env=None):
        return jnp.zeros(patch.size)

    def gradient_internal_coeff(self, mesh, patch, field, bd, env=None):
        return -mesh.patch_delta_coeffs(patch)


@register("fvPatchField", "pressureInletOutletVelocity")
@dataclass(frozen=True)
class PressureInletOutletVelocity(BC):
    """U on pressure boundaries: zeroGradient on outflow; on inflow the
    face-normal velocity follows the flux (reference:
    derived/pressureInletOutletVelocity). env must carry 'phi'."""
    preserves_type = True

    def evaluate(self, mesh, patch, field, bd, env=None):
        psi_c = field.patch_internal(mesh, patch)
        if env is None or "phi" not in env:
            return psi_c
        phi_b = env["phi"].data[patch.start:patch.start + patch.size]
        n = mesh.patch_normals(patch)
        u_in = n * (phi_b / jnp.maximum(
            mesh.patch_mag_sf(patch), 1e-30))[:, None]
        return jnp.where((phi_b >= 0.0)[:, None], psi_c, u_in)

    def value_internal_coeff(self, mesh, patch, field, bd, env=None):
        if env is None or "phi" not in env:
            return jnp.ones((patch.size, 1))
        phi_b = env["phi"].data[patch.start:patch.start + patch.size]
        return (phi_b >= 0.0).astype(field.data.dtype)[:, None]

    def gradient_internal_coeff(self, mesh, patch, field, bd, env=None):
        vic = self.value_internal_coeff(mesh, patch, field, bd, env)
        return (vic - 1.0) * mesh.patch_delta_coeffs(patch)[:, None]


@register("fvPatchField", "SRFVelocity")
@dataclass(frozen=True)
class SRFVelocity(FixedValue):
    """Velocity in the single rotating frame (reference:
    cfdTools/general/SRF/derivedFvPatchFields/SRFVelocityFvPatchVector-
    Field): Urel = inletValue if `relative yes`, else inletValue minus
    the frame velocity at the patch faces. The frame velocity is static
    per mesh, so the SRF solvers stash it in bd['srfValue'] at startup
    (the reference recomputes it each updateCoeffs)."""

    def evaluate(self, mesh, patch, field, bd, env=None):
        shape = field.patch_internal(mesh, patch).shape
        val = jnp.broadcast_to(bd["inletValue"], shape)
        srf_v = bd.get("srfValue")
        if srf_v is None:
            return val
        rel = bd.get("relative", jnp.asarray(0.0))
        return val - (1.0 - rel) * srf_v


@register("fvPatchField", "flowRateInletVelocity")
@dataclass(frozen=True)
class FlowRateInletVelocity(BC):
    """Inlet velocity from a prescribed volumetric flow rate (reference:
    derived/flowRateInletVelocity, constant-rate form)."""
    preserves_type = True
    fixes_value = True

    def evaluate(self, mesh, patch, field, bd, env=None):
        q = bd["volumetricFlowRate"]
        q = q if jnp.ndim(q) == 0 else q.reshape(-1)[0]
        area = mesh.patch_mag_sf(patch).sum()
        n = mesh.patch_normals(patch)
        return -n * (q / jnp.maximum(area, 1e-30))

    def value_internal_coeff(self, mesh, patch, field, bd, env=None):
        return jnp.zeros((patch.size, 1))

    def gradient_internal_coeff(self, mesh, patch, field, bd, env=None):
        return -mesh.patch_delta_coeffs(patch)[:, None]
