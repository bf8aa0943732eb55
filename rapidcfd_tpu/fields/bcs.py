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
    # True for implicitly-coupled interfaces (cyclicAMI): assembly puts
    # the ghost-coupling coefficient in boundary_coeffs and the SpMV
    # applies it against partner-side values every iteration (the
    # reference's initMatrixInterfaces/updateMatrixInterfaces path)
    coupled = False

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
    """2D constraint patch: contributes nothing to assembly.

    Evaluates to the patch-internal value (NOT zeros): empty faces are
    excluded from every face-sum ELL, so their bvalues are never
    consumed by an integral — but they DO flow through pointwise field
    arithmetic (1/A, rAU*H, ...), where a literal 0 manufactures
    inf/NaN (0*inf) that then leaks into phi at empty faces."""
    preserves_type = True
    value_free = True
    assembles = False

    def evaluate(self, mesh, patch, field, bd, env=None):
        return field.patch_internal(mesh, patch)

    def value_internal_coeff(self, mesh, patch, field, bd, env=None):
        return jnp.zeros(patch.size)

    def gradient_internal_coeff(self, mesh, patch, field, bd, env=None):
        return jnp.zeros(patch.size)


@register("fvPatchField", "cyclicAMI")
@dataclass(frozen=True)
class CyclicAMI(BC):
    """Arbitrary-mesh-interface coupling (reference:
    cyclicAMIFvPatchField.H:54): ghost values are the overlap-weighted
    sum of partner-patch face-cell values (mesh/ami.py tables), with
    the coupled transform applied to vectors. Face values interpolate
    owner/ghost with distance weights; matrix coupling is IMPLICIT via
    the coupled-patch SpMV hook."""
    preserves_type = True
    value_free = True
    coupled = True

    def _t(self, mesh, patch):
        t = mesh.ami_table(patch)
        if t is None:
            raise ValueError(
                f"cyclicAMI patch '{patch.name}' has no AMI table — "
                "is the partner patch missing?")
        return t

    def evaluate(self, mesh, patch, field, bd, env=None):
        t = self._t(mesh, patch)
        psi_c = field.patch_internal(mesh, patch)
        ghost = mesh.ami_ghost(patch, field.data)
        w = _bcast(t.w_face, psi_c)
        return w * psi_c + (1.0 - w) * ghost

    def value_internal_coeff(self, mesh, patch, field, bd, env=None):
        t = self._t(mesh, patch)
        w = t.w_face
        return w[:, None] * jnp.ones(field.data.shape[1:]) \
            if field.data.ndim > 1 else w

    def gradient_internal_coeff(self, mesh, patch, field, bd, env=None):
        t = self._t(mesh, patch)
        gic = -t.dc
        return gic[:, None] if field.data.ndim > 1 else gic

    def snGrad(self, mesh, patch, field, bd, env=None):
        t = self._t(mesh, patch)
        psi_c = field.patch_internal(mesh, patch)
        ghost = mesh.ami_ghost(patch, field.data)
        return _bcast(t.dc, psi_c) * (ghost - psi_c)


@register("fvPatchField", "cyclicACMI")
@dataclass(frozen=True)
class CyclicACMI(CyclicAMI):
    """Arbitrarily coupled mesh interface (reference:
    cyclicACMIFvPatchField.H:56): a partially-overlapping AMI whose
    uncovered remainder is carried by a separate non-overlap patch
    (usually a wall). Face areas are apportioned at mesh build
    (mesh/mesharrays._ami_raw_tables: coupled faces mask*|Sf0|, non-overlap
    (1-mask)*|Sf0|), so assembly splits automatically; the matrix
    coupling uses the raw (coverage-sum) weights — the reference's
    coupled-contribution-only updateInterfaceMatrix
    (cyclicACMIFvPatchField.C:217-244) — while evaluated face values
    blend the uncovered remainder from the non-overlap patch's current
    boundary values (patchNeighbourField's interpolate(pnf,
    nonOverlapFaceCells))."""

    def _default(self, mesh, patch, field):
        t = self._t(mesh, patch)
        no = mesh.patches[t.non_overlap]
        return field.bvalues[no.bstart:no.bstart + no.size]

    def evaluate(self, mesh, patch, field, bd, env=None):
        t = self._t(mesh, patch)
        psi_c = field.patch_internal(mesh, patch)
        ghost = mesh.ami_ghost(patch, field.data,
                               default=self._default(mesh, patch, field))
        w = _bcast(t.w_face, psi_c)
        return w * psi_c + (1.0 - w) * ghost

    def snGrad(self, mesh, patch, field, bd, env=None):
        t = self._t(mesh, patch)
        psi_c = field.patch_internal(mesh, patch)
        ghost = mesh.ami_ghost(patch, field.data,
                               default=self._default(mesh, patch, field))
        return _bcast(t.dc, psi_c) * (ghost - psi_c)


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
class FixedFluxPressure(FixedGradient):
    """TRUE fixedFluxPressure (reference: derived/fixedFluxPressure/
    fixedFluxPressureFvPatchScalarField.C:115-140): a fixedGradient
    patch whose gradient is SET by the solver each pressure corrector
    (the reference's updateCoeffs(snGradp) called via setSnGrad from the
    buoyant pEqn.H) so the boundary pressure flux exactly balances the
    body-force + HbyA flux:

        gradient = (phiHbyA_b - Sf_b & U_b) / (magSf_b * Dp_b)

    Solvers install it with set_fixed_flux_pressure_gradient before
    assembling the pEqn. Before the first setSnGrad (e.g. evaluating a
    freshly-read field) the gradient defaults to the dict 'gradient'
    entry, or zero."""
    value_free = True

    def _grad(self, bd, psi_c):
        g = bd.get("snGrad", bd.get("gradient"))
        if g is None:
            return jnp.zeros_like(psi_c)
        return jnp.broadcast_to(g, psi_c.shape)

    def evaluate(self, mesh, patch, field, bd, env=None):
        psi_c = field.patch_internal(mesh, patch)
        dc = _bcast(mesh.patch_delta_coeffs(patch), psi_c)
        return psi_c + self._grad(bd, psi_c) / dc


def fixed_flux_pressure_mask(mesh, field):
    """(nBoundaryFaces,) 1.0 where the patch BC is fixedFluxPressure.
    Static per field (BC types are pytree-static), so solvers can keep
    the body-force boundary flux phig ONLY on the patches whose BC will
    compensate it, and zero it elsewhere (legacy zeroGradient cases keep
    the round-2 stand-in behaviour)."""
    m = jnp.zeros(mesh.n_boundary)
    for patch, bc in zip(mesh.patches, field.bcs):
        if isinstance(bc, FixedFluxPressure) and patch.size:
            m = m.at[patch.bstart:patch.bstart + patch.size].set(1.0)
    return m


def set_fixed_flux_pressure_gradient(mesh, field, sngrad_b):
    """setSnGrad<fixedFluxPressureFvPatchScalarField> (reference: e.g.
    buoyantSimpleFoam pEqn.H): write the solver-computed boundary snGrad
    (a (nBoundaryFaces,) array) into the bcdata of every
    fixedFluxPressure patch, then refresh the boundary values. No-op
    when the field has no such patch."""
    new_bd = []
    changed = False
    for patch, bc, bd in zip(mesh.patches, field.bcs, field.bcdata):
        if isinstance(bc, FixedFluxPressure) and patch.size:
            d = dict(bd)
            d["snGrad"] = sngrad_b[patch.bstart:patch.bstart + patch.size]
            new_bd.append(d)
            changed = True
        else:
            new_bd.append(bd)
    if not changed:
        return field
    return field.replace(bcdata=tuple(new_bd)) \
        .correct_boundary_conditions(mesh)


def make_bc(type_word: str, patch_idx: int, pd=None) -> BC:
    """Construct a BC from its dictionary word. Unknown words fall back to
    Generic (reference: src/genericPatchFields — carry unknown BC types
    through instead of erroring, for post-processing robustness); a
    class may define from_dict(patch_idx, pd) to capture static config
    words (e.g. heat-flux mode) from the patch sub-dictionary."""
    try:
        cls = lookup("fvPatchField", type_word)
    except KeyError:
        return Generic(patch_idx, type_word)
    if hasattr(cls, "from_dict"):
        return cls.from_dict(patch_idx, pd)
    return cls(patch_idx)


@register("fvPatchField", "totalPressure")
@dataclass(frozen=True)
class TotalPressure(BC):
    """p = p0 - 0.5|U|^2 on inflow, p0 on outflow (incompressible form;
    reference: derived/totalPressure). env must carry 'U' and 'phi'."""
    preserves_type = True
    fixes_level = True

    def _p0(self, mesh, patch, field, bd, env=None):
        """Reference total pressure (hook for fanPressure's fan-curve
        offset)."""
        return bd["p0"]

    def evaluate(self, mesh, patch, field, bd, env=None):
        p0 = jnp.broadcast_to(self._p0(mesh, patch, field, bd, env),
                              (patch.size,))
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


# ---------------------------------------------------------------------------
# generic carry-through (reference: src/genericPatchFields)
# ---------------------------------------------------------------------------

@register("fvPatchField", "generic")
@dataclass(frozen=True)
class Generic(BC):
    """Placeholder for unknown BC types: keeps the stored values and the
    original type word so fields read, post-process and write back
    unchanged (reference: genericFvPatchField). Solving with one raises
    at assembly, same as the reference's valueInternalCoeffs abort."""
    word: str = "generic"
    preserves_type = True

    def evaluate(self, mesh, patch, field, bd, env=None):
        if "value" in bd:
            return jnp.broadcast_to(
                bd["value"], field.patch_internal(mesh, patch).shape)
        return field.patch_internal(mesh, patch)

    def value_internal_coeff(self, mesh, patch, field, bd, env=None):
        raise TypeError(
            f"patch '{patch.name}': generic BC (unknown type "
            f"'{self.word}') cannot provide matrix coefficients for "
            f"field '{field.name}'")

    gradient_internal_coeff = value_internal_coeff


# ---------------------------------------------------------------------------
# wedge constraint (axisymmetric)
# ---------------------------------------------------------------------------

def _rotation_tensor(n1, n2):
    """Rotation taking unit vector n1 onto n2 (reference:
    OpenFOAM/primitives/transform/transform.H rotationTensor)."""
    c = jnp.dot(n1, n2)
    w = jnp.cross(n1, n2)
    wx = jnp.array([[0.0, -w[2], w[1]],
                    [w[2], 0.0, -w[0]],
                    [-w[1], w[0], 0.0]])
    outer = jnp.outer(w, w)
    # R = cI + [w]x + w w^T/(1+c): the (1-c)/|w|^2 form cancels
    # catastrophically in fp32 for the small wedge angles this serves
    return c * jnp.eye(3) + wx + outer / jnp.maximum(1.0 + c, 1e-12)


@register("fvPatchField", "wedge")
@dataclass(frozen=True)
class Wedge(BC):
    """Axisymmetric wedge constraint (reference: constraint/wedge/
    wedgeFvPatchField.C:133-160 + wedgePolyPatch.C:43-127): scalars see
    zeroGradient; vectors are rotated from the wedge centre plane onto
    the patch plane by faceT, with snGrad from the full cellT = faceT^2
    rotation at half the delta coefficient."""
    preserves_type = True
    value_free = True
    fixes_value = True

    def _transforms(self, mesh, patch):
        nf = mesh.patch_normals(patch)
        n = nf.mean(0)
        n = n / jnp.linalg.norm(n)
        # project out the small out-of-plane component to get the centre
        # plane normal (wedgePolyPatch.C:85-93)
        cn = jnp.sign(n) * (jnp.maximum(jnp.abs(n), 0.5) - 0.5)
        cn = cn / jnp.maximum(jnp.linalg.norm(cn), 1e-30)
        faceT = _rotation_tensor(cn, n)
        return faceT, faceT @ faceT

    def evaluate(self, mesh, patch, field, bd, env=None):
        psi_c = field.patch_internal(mesh, patch)
        if psi_c.ndim == 1:
            return psi_c
        faceT, _ = self._transforms(mesh, patch)
        return psi_c @ faceT.T

    def value_internal_coeff(self, mesh, patch, field, bd, env=None):
        psi_c = field.patch_internal(mesh, patch)
        if psi_c.ndim == 1:
            return jnp.ones(patch.size)
        faceT, _ = self._transforms(mesh, patch)
        return jnp.broadcast_to(jnp.diagonal(faceT), psi_c.shape)

    def gradient_internal_coeff(self, mesh, patch, field, bd, env=None):
        psi_c = field.patch_internal(mesh, patch)
        if psi_c.ndim == 1:
            return jnp.zeros(patch.size)
        _, cellT = self._transforms(mesh, patch)
        dc = mesh.patch_delta_coeffs(patch)[:, None]
        diag = 0.5 * (1.0 - jnp.diagonal(cellT))
        return -jnp.broadcast_to(diag, psi_c.shape) * dc

    def snGrad(self, mesh, patch, field, bd, env=None):
        psi_c = field.patch_internal(mesh, patch)
        if psi_c.ndim == 1:
            return jnp.zeros_like(psi_c)
        _, cellT = self._transforms(mesh, patch)
        dc = mesh.patch_delta_coeffs(patch)[:, None]
        return (psi_c @ cellT.T - psi_c) * (0.5 * dc)


# ---------------------------------------------------------------------------
# inlet turbulence estimators (reference: derived/turbulent*Inlet)
# ---------------------------------------------------------------------------

@register("fvPatchField", "turbulentIntensityKineticEnergyInlet")
@dataclass(frozen=True)
class TurbulentIntensityKineticEnergyInlet(InletOutlet):
    """k = 1.5 (I |U|)^2 on inflow, zeroGradient on outflow (reference:
    derived/turbulentIntensityKineticEnergyInlet). env: 'U', 'phi'."""

    def _mixed_bd(self, bd, mesh, patch, env, psi_c):
        phi_p = self._patch_phi(mesh, patch, env)
        f = 1.0 - (phi_p >= 0.0).astype(psi_c.dtype)
        intensity = bd.get("intensity", jnp.asarray(0.05))
        if env is not None and "U" in env:
            sl = slice(patch.bstart, patch.bstart + patch.size)
            u_b = env["U"].bvalues[sl]
            k_in = 1.5 * (intensity ** 2) * (u_b * u_b).sum(-1)
        else:
            k_in = jnp.broadcast_to(bd.get("value", 1e-8), psi_c.shape)
        return dict(refValue=jnp.broadcast_to(k_in, psi_c.shape),
                    refGradient=jnp.zeros_like(psi_c), valueFraction=f)


@register("fvPatchField", "turbulentMixingLengthDissipationRateInlet")
@dataclass(frozen=True)
class TurbulentMixingLengthDissipationRateInlet(InletOutlet):
    """epsilon = Cmu^0.75 k^1.5 / L on inflow (reference:
    derived/turbulentMixingLengthDissipationRateInlet). env: 'k','phi'."""

    def _mixed_bd(self, bd, mesh, patch, env, psi_c):
        phi_p = self._patch_phi(mesh, patch, env)
        f = 1.0 - (phi_p >= 0.0).astype(psi_c.dtype)
        L = bd.get("mixingLength", jnp.asarray(0.01))
        if env is not None and "k" in env:
            sl = slice(patch.bstart, patch.bstart + patch.size)
            k_b = jnp.maximum(env["k"].bvalues[sl], 0.0)
            e_in = (0.09 ** 0.75) * k_b ** 1.5 / jnp.maximum(L, 1e-30)
        else:
            e_in = jnp.broadcast_to(bd.get("value", 1e-8), psi_c.shape)
        return dict(refValue=jnp.broadcast_to(e_in, psi_c.shape),
                    refGradient=jnp.zeros_like(psi_c), valueFraction=f)


@register("fvPatchField", "turbulentMixingLengthFrequencyInlet")
@dataclass(frozen=True)
class TurbulentMixingLengthFrequencyInlet(InletOutlet):
    """omega = k^0.5 / (Cmu^0.25 L) on inflow (reference:
    derived/turbulentMixingLengthFrequencyInlet). env: 'k', 'phi'."""

    def _mixed_bd(self, bd, mesh, patch, env, psi_c):
        phi_p = self._patch_phi(mesh, patch, env)
        f = 1.0 - (phi_p >= 0.0).astype(psi_c.dtype)
        L = bd.get("mixingLength", jnp.asarray(0.01))
        if env is not None and "k" in env:
            sl = slice(patch.bstart, patch.bstart + patch.size)
            k_b = jnp.maximum(env["k"].bvalues[sl], 0.0)
            w_in = jnp.sqrt(k_b) / ((0.09 ** 0.25)
                                    * jnp.maximum(L, 1e-30))
        else:
            w_in = jnp.broadcast_to(bd.get("value", 1e-8), psi_c.shape)
        return dict(refValue=jnp.broadcast_to(w_in, psi_c.shape),
                    refGradient=jnp.zeros_like(psi_c), valueFraction=f)


# ---------------------------------------------------------------------------
# wall-velocity variants
# ---------------------------------------------------------------------------

@register("fvPatchField", "translatingWallVelocity")
@dataclass(frozen=True)
class TranslatingWallVelocity(FixedValue):
    """Wall moving at constant U0 with the normal component removed
    (reference: derived/translatingWallVelocity)."""

    def evaluate(self, mesh, patch, field, bd, env=None):
        n = mesh.patch_normals(patch)
        u0 = jnp.broadcast_to(bd["U"], (patch.size, 3))
        return u0 - n * (u0 * n).sum(-1, keepdims=True)


@register("fvPatchField", "rotatingWallVelocity")
@dataclass(frozen=True)
class RotatingWallVelocity(FixedValue):
    """U = omega x (Cf - origin), tangentially projected (reference:
    derived/rotatingWallVelocity)."""

    def evaluate(self, mesh, patch, field, bd, env=None):
        cf = mesh.patch_cf(patch)
        origin = bd["origin"]
        axis = bd["axis"]
        axis = axis / jnp.maximum(jnp.linalg.norm(axis), 1e-30)
        om = bd["omega"] * axis
        u = jnp.cross(jnp.broadcast_to(om, (patch.size, 3)), cf - origin)
        n = mesh.patch_normals(patch)
        return u - n * (u * n).sum(-1, keepdims=True)


@register("fvPatchField", "partialSlip")
@dataclass(frozen=True)
class PartialSlip(BC):
    """Blend of no-slip and slip: valueFraction=1 is no-slip, 0 is free
    slip (reference: derived/partialSlip)."""
    preserves_type = True
    fixes_value = True

    def _f(self, bd, psi_c):
        f = jnp.asarray(bd.get("valueFraction", 0.5))
        if f.ndim == 1 and psi_c.ndim == 2:
            f = f[:, None]
        return jnp.broadcast_to(f, psi_c.shape)

    def evaluate(self, mesh, patch, field, bd, env=None):
        psi_c = field.patch_internal(mesh, patch)
        f = self._f(bd, psi_c)
        if psi_c.ndim == 1:
            return (1.0 - f) * psi_c
        n = mesh.patch_normals(patch)
        tang = psi_c - n * (psi_c * n).sum(-1, keepdims=True)
        return (1.0 - f) * tang

    def value_internal_coeff(self, mesh, patch, field, bd, env=None):
        psi_c = field.patch_internal(mesh, patch)
        f = self._f(bd, psi_c)
        if psi_c.ndim == 1:
            return 1.0 - f
        n = mesh.patch_normals(patch)
        return (1.0 - f) * (1.0 - n * n)

    def gradient_internal_coeff(self, mesh, patch, field, bd, env=None):
        psi_c = field.patch_internal(mesh, patch)
        vic = self.value_internal_coeff(mesh, patch, field, bd, env)
        dc = _bcast(mesh.patch_delta_coeffs(patch), psi_c)
        return (vic - 1.0) * dc


@register("fvPatchField", "fixedNormalSlip")
@dataclass(frozen=True)
class FixedNormalSlip(BC):
    """Fixed value in the patch-normal direction, slip tangentially
    (reference: derived/fixedNormalSlip)."""
    preserves_type = True
    fixes_value = True

    def evaluate(self, mesh, patch, field, bd, env=None):
        psi_c = field.patch_internal(mesh, patch)
        n = mesh.patch_normals(patch)
        fixed = jnp.broadcast_to(bd["fixedValue"], psi_c.shape)
        tang = psi_c - n * (psi_c * n).sum(-1, keepdims=True)
        return tang + n * (fixed * n).sum(-1, keepdims=True)

    def value_internal_coeff(self, mesh, patch, field, bd, env=None):
        n = mesh.patch_normals(patch)
        return 1.0 - n * n

    def gradient_internal_coeff(self, mesh, patch, field, bd, env=None):
        n = mesh.patch_normals(patch)
        dc = mesh.patch_delta_coeffs(patch)[:, None]
        return -(n * n) * dc


# ---------------------------------------------------------------------------
# swirl / cylindrical inlets
# ---------------------------------------------------------------------------

@register("fvPatchField", "cylindricalInletVelocity")
@dataclass(frozen=True)
class CylindricalInletVelocity(FixedValue):
    """axial + radial + rpm-swirl velocity in cylindrical coordinates
    about (origin, axis) (reference: derived/cylindricalInletVelocity)."""

    def evaluate(self, mesh, patch, field, bd, env=None):
        cf = mesh.patch_cf(patch)
        axis = bd["axis"]
        a = axis / jnp.maximum(jnp.linalg.norm(axis), 1e-30)
        r = cf - bd["origin"]
        r_perp = r - a * (r * a).sum(-1, keepdims=True)
        rmag = jnp.linalg.norm(r_perp, axis=-1, keepdims=True)
        rhat = r_perp / jnp.maximum(rmag, 1e-30)
        that = jnp.cross(jnp.broadcast_to(a, r.shape), rhat)
        omega = bd.get("rpm", jnp.asarray(0.0)) * (2.0 * jnp.pi / 60.0)
        return (bd.get("axialVelocity", jnp.asarray(0.0)) * a
                + bd.get("radialVelocity", jnp.asarray(0.0)) * rhat
                + omega * rmag * that)


@register("fvPatchField", "swirlFlowRateInletVelocity")
@dataclass(frozen=True)
class SwirlFlowRateInletVelocity(FixedValue):
    """Normal velocity from a volumetric flow rate plus rpm swirl about
    the patch centroid (reference: derived/swirlFlowRateInletVelocity)."""

    def evaluate(self, mesh, patch, field, bd, env=None):
        q = bd["flowRate"]
        mag_sf = mesh.patch_mag_sf(patch)
        area = mag_sf.sum()
        n = mesh.patch_normals(patch)
        cf = mesh.patch_cf(patch)
        ctr = (cf * mag_sf[:, None]).sum(0) / jnp.maximum(area, 1e-30)
        axis_n = n.mean(0)
        axis_n = axis_n / jnp.maximum(jnp.linalg.norm(axis_n), 1e-30)
        omega = bd.get("rpm", jnp.asarray(0.0)) * (2.0 * jnp.pi / 60.0)
        swirl = omega * jnp.cross(jnp.broadcast_to(axis_n, cf.shape),
                                  cf - ctr)
        return -n * (q / jnp.maximum(area, 1e-30)) + swirl


# ---------------------------------------------------------------------------
# outflow / non-reflecting (reference: derived/advective, waveTransmissive)
# ---------------------------------------------------------------------------

@register("fvPatchField", "advective")
@dataclass(frozen=True)
class Advective(Mixed):
    """Advective outflow d(psi)/dt + w d(psi)/dn = 0 discretised as mixed
    coefficients (reference: derived/advective/advectiveFvPatchField.C:
    217-290, Euler form): alpha = w dt dc, refValue = old boundary value,
    valueFraction = 1/(1+alpha); with lInf set, relaxation towards
    fieldInf with k = w dt / lInf. env: 'phi', 'dt'."""
    preserves_type = True

    def _speed(self, mesh, patch, field, bd, env):
        phi = env.get("phi") if env else None
        if phi is None:
            return jnp.zeros(patch.size)
        data = phi.data if hasattr(phi, "data") else phi
        phi_p = data[patch.start:patch.start + patch.size]
        return phi_p / jnp.maximum(mesh.patch_mag_sf(patch), 1e-30)

    def _mixed_bd(self, bd, mesh, patch, env, psi_c, field):
        w = jnp.maximum(self._speed(mesh, patch, field, bd, env), 0.0)
        dt = (env or {}).get("dt", jnp.asarray(0.0))
        dc = mesh.patch_delta_coeffs(patch)
        alpha = w * dt * dc
        if field.old is not None:
            old_b = field.old.patch_values(mesh, patch)
        elif "value" in bd:
            old_b = jnp.broadcast_to(jnp.asarray(bd["value"]), psi_c.shape)
        else:
            # bootstrap: no old-time state and no dictionary value entry —
            # seed from the interior (reference constructs from 'value')
            old_b = psi_c
        l_inf = bd.get("lInf")
        if l_inf is not None:
            k = w * dt / jnp.maximum(l_inf, 1e-30)
            f_inf = bd.get("fieldInf", jnp.asarray(0.0))
            ref = (old_b + _bcast(k, old_b)
                   * jnp.broadcast_to(f_inf, old_b.shape)) \
                / _bcast(1.0 + k, old_b)
            frac = (1.0 + k) / (1.0 + alpha + k)
        else:
            ref = old_b
            frac = 1.0 / (1.0 + alpha)
        frac = _bcast(frac, psi_c) * jnp.ones_like(psi_c)
        return dict(refValue=ref, refGradient=jnp.zeros_like(psi_c),
                    valueFraction=frac)

    def evaluate(self, mesh, patch, field, bd, env=None):
        psi_c = field.patch_internal(mesh, patch)
        return Mixed.evaluate(
            self, mesh, patch, field,
            self._mixed_bd(bd, mesh, patch, env, psi_c, field), env)

    def value_internal_coeff(self, mesh, patch, field, bd, env=None):
        psi_c = field.patch_internal(mesh, patch)
        return Mixed.value_internal_coeff(
            self, mesh, patch, field,
            self._mixed_bd(bd, mesh, patch, env, psi_c, field), env)

    def gradient_internal_coeff(self, mesh, patch, field, bd, env=None):
        psi_c = field.patch_internal(mesh, patch)
        return Mixed.gradient_internal_coeff(
            self, mesh, patch, field,
            self._mixed_bd(bd, mesh, patch, env, psi_c, field), env)


@register("fvPatchField", "waveTransmissive")
@dataclass(frozen=True)
class WaveTransmissive(Advective):
    """Non-reflecting outlet: advection speed phi/|Sf| + sqrt(gamma/psi)
    (reference: derived/waveTransmissive/waveTransmissiveFvPatchField.C
    advectionSpeed()). env: 'phi', 'dt', 'psi' (compressibility)."""

    def _speed(self, mesh, patch, field, bd, env):
        un = Advective._speed(self, mesh, patch, field, bd, env)
        gamma = bd.get("gamma", jnp.asarray(1.4))
        psi = (env or {}).get("psi")
        if psi is not None:
            sl = slice(patch.bstart, patch.bstart + patch.size)
            psi_b = psi.bvalues[sl]
            return un + jnp.sqrt(gamma / jnp.maximum(psi_b, 1e-30))
        return un


# ---------------------------------------------------------------------------
# misc derived
# ---------------------------------------------------------------------------

@register("fvPatchField", "pressureInletVelocity")
@dataclass(frozen=True)
class PressureInletVelocity(BC):
    """U on a pressure inlet: face-normal velocity from the flux on all
    faces (reference: derived/pressureInletVelocity). env: 'phi'."""
    preserves_type = True

    def evaluate(self, mesh, patch, field, bd, env=None):
        psi_c = field.patch_internal(mesh, patch)
        if env is None or "phi" not in env:
            return psi_c
        phi_b = env["phi"].data[patch.start:patch.start + patch.size]
        n = mesh.patch_normals(patch)
        return n * (phi_b / jnp.maximum(
            mesh.patch_mag_sf(patch), 1e-30))[:, None]

    def value_internal_coeff(self, mesh, patch, field, bd, env=None):
        return jnp.zeros((patch.size, 1))

    def gradient_internal_coeff(self, mesh, patch, field, bd, env=None):
        return -mesh.patch_delta_coeffs(patch)[:, None]


@register("fvPatchField", "fixedMean")
@dataclass(frozen=True)
class FixedMean(FixedValue):
    """Extrapolate the interior profile, shifted so the area-weighted
    mean equals meanValue (reference: derived/fixedMean)."""

    def evaluate(self, mesh, patch, field, bd, env=None):
        psi_c = field.patch_internal(mesh, patch)
        w = mesh.patch_mag_sf(patch)
        wsum = jnp.maximum(w.sum(), 1e-30)
        wb = _bcast(w, psi_c)
        mean_c = (psi_c * wb).sum(0) / wsum
        target = bd["meanValue"]
        return psi_c + (target - mean_c)


@register("fvPatchField", "variableHeightFlowRate")
@dataclass(frozen=True)
class VariableHeightFlowRate(BC):
    """VOF phase-fraction outlet: alpha clamped to [0,1], zeroGradient
    in between (reference: derived/variableHeightFlowRate)."""
    preserves_type = True

    def evaluate(self, mesh, patch, field, bd, env=None):
        psi_c = field.patch_internal(mesh, patch)
        lo = bd.get("lowerBound", jnp.asarray(0.0))
        hi = bd.get("upperBound", jnp.asarray(1.0))
        return jnp.clip(psi_c, lo, hi)

    def value_internal_coeff(self, mesh, patch, field, bd, env=None):
        psi_c = field.patch_internal(mesh, patch)
        lo = bd.get("lowerBound", jnp.asarray(0.0))
        hi = bd.get("upperBound", jnp.asarray(1.0))
        inside = ((psi_c > lo) & (psi_c < hi)).astype(psi_c.dtype)
        return inside

    def gradient_internal_coeff(self, mesh, patch, field, bd, env=None):
        vic = self.value_internal_coeff(mesh, patch, field, bd, env)
        return (vic - 1.0) * mesh.patch_delta_coeffs(patch)


@register("fvPatchField", "uniformTotalPressure")
@dataclass(frozen=True)
class UniformTotalPressure(TotalPressure):
    """totalPressure with a uniform (optionally tabulated) p0
    (reference: derived/uniformTotalPressure)."""


@register("fvPatchField", "prghPressure")
@dataclass(frozen=True)
class PrghPressure(FixedValue):
    """p_rgh = p - rho gh at the patch (reference: derived/prghPressure).
    env: 'rho' (VolField) and 'gh_b' (boundary gh values); without them
    behaves as fixedValue p."""

    def evaluate(self, mesh, patch, field, bd, env=None):
        p = jnp.broadcast_to(bd.get("p", bd.get("value", 0.0)),
                             (patch.size,))
        if env is None or "rho" not in env or "gh_b" not in env:
            return p
        sl = slice(patch.bstart, patch.bstart + patch.size)
        rho_b = env["rho"].bvalues[sl]
        gh_b = env["gh_b"][sl]
        return p - rho_b * gh_b


@register("fvPatchField", "uniformFixedGradient")
@dataclass(frozen=True)
class UniformFixedGradient(FixedGradient):
    """fixedGradient with a uniform 'uniformGradient' entry (reference:
    derived/uniformFixedGradient)."""

    def evaluate(self, mesh, patch, field, bd, env=None):
        psi_c = field.patch_internal(mesh, patch)
        dc = _bcast(mesh.patch_delta_coeffs(patch), psi_c)
        g = bd.get("uniformGradient", bd.get("gradient", 0.0))
        return psi_c + jnp.broadcast_to(g, psi_c.shape) / dc


# ---------------------------------------------------------------------------
# atmospheric boundary layer inlets (reference: derived/atmBoundaryLayer*)
# ---------------------------------------------------------------------------

_VON_KARMAN = 0.41
_ABL_CMU = 0.09


def _abl_ustar(bd):
    uref = bd.get("Uref", jnp.asarray(10.0))
    zref = bd.get("Zref", bd.get("Href", jnp.asarray(10.0)))
    z0 = jnp.maximum(bd.get("z0", jnp.asarray(0.01)), 1e-6)
    return _VON_KARMAN * uref / jnp.log((zref + z0) / z0)


def _abl_z(mesh, patch, bd):
    zdir = bd.get("zDir", jnp.asarray([0.0, 0.0, 1.0]))
    zdir = zdir / jnp.maximum(jnp.linalg.norm(zdir), 1e-30)
    cf = mesh.patch_cf(patch)
    zg = bd.get("zGround", jnp.asarray(0.0))
    return (cf * zdir).sum(-1) - zg


@register("fvPatchField", "atmBoundaryLayerInletVelocity")
@dataclass(frozen=True)
class AtmBoundaryLayerInletVelocity(FixedValue):
    """Log-law wind profile U = (u*/kappa) ln((z-zg+z0)/z0) flowDir
    (reference: derived/atmBoundaryLayerInletVelocity)."""

    def evaluate(self, mesh, patch, field, bd, env=None):
        ustar = _abl_ustar(bd)
        z0 = jnp.maximum(bd.get("z0", jnp.asarray(0.01)), 1e-6)
        z = _abl_z(mesh, patch, bd)
        fd = bd.get("flowDir", jnp.asarray([1.0, 0.0, 0.0]))
        fd = fd / jnp.maximum(jnp.linalg.norm(fd), 1e-30)
        umag = (ustar / _VON_KARMAN) * jnp.log(
            jnp.maximum(z + z0, z0 * 1.0000001) / z0)
        return umag[:, None] * fd


@register("fvPatchField", "atmBoundaryLayerInletK")
@dataclass(frozen=True)
class AtmBoundaryLayerInletK(FixedValue):
    """k = u*^2 / sqrt(Cmu) (reference: derived/atmBoundaryLayerInletK)."""

    def evaluate(self, mesh, patch, field, bd, env=None):
        ustar = _abl_ustar(bd)
        return jnp.full((patch.size,), 1.0) * ustar ** 2 \
            / jnp.sqrt(_ABL_CMU)


@register("fvPatchField", "atmBoundaryLayerInletEpsilon")
@dataclass(frozen=True)
class AtmBoundaryLayerInletEpsilon(FixedValue):
    """epsilon = u*^3 / (kappa (z - zg + z0)) (reference:
    derived/atmBoundaryLayerInletEpsilon)."""

    def evaluate(self, mesh, patch, field, bd, env=None):
        ustar = _abl_ustar(bd)
        z0 = jnp.maximum(bd.get("z0", jnp.asarray(0.01)), 1e-6)
        z = _abl_z(mesh, patch, bd)
        return ustar ** 3 / (_VON_KARMAN * jnp.maximum(z + z0, z0))


# ---------------------------------------------------------------------------
# thermal wall conditions
# ---------------------------------------------------------------------------

@register("fvPatchField", "externalWallHeatFluxTemperature")
@dataclass(frozen=True)
class ExternalWallHeatFluxTemperature(Mixed):
    """Wall temperature from an external heat flux q [W/m^2], total
    power Q [W], or convection coefficient h + ambient Ta (reference:
    derived/externalWallHeatFluxTemperature). Thermal conductivity from
    env['kappa'] (VolField, W/m/K) or bd['kappaValue']."""
    mode: str = "flux"

    @classmethod
    def from_dict(cls, patch_idx, pd):
        mode = "flux"
        if pd is not None:
            w = pd.word("mode", "")
            if w in ("flux", "power", "coefficient"):
                mode = w
            elif pd.lookup("Q") is not None:
                mode = "power"
            elif pd.lookup("h") is not None:
                mode = "coefficient"
        return cls(patch_idx, mode)

    def _kappa(self, mesh, patch, bd, env):
        if env is not None and "kappa" in env:
            sl = slice(patch.bstart, patch.bstart + patch.size)
            return env["kappa"].bvalues[sl]
        return jnp.broadcast_to(bd.get("kappaValue", 1.0), (patch.size,))

    def _mixed_bd(self, bd, mesh, patch, env, psi_c):
        kappa = jnp.maximum(self._kappa(mesh, patch, bd, env), 1e-30)
        dc = mesh.patch_delta_coeffs(patch)
        if self.mode == "coefficient":
            h = bd.get("h", jnp.asarray(10.0))
            ta = bd.get("Ta", jnp.asarray(300.0))
            f = h / (h + kappa * dc)
            return dict(refValue=jnp.broadcast_to(ta, psi_c.shape),
                        refGradient=jnp.zeros_like(psi_c),
                        valueFraction=f)
        if self.mode == "power":
            area = jnp.maximum(mesh.patch_mag_sf(patch).sum(), 1e-30)
            q = bd.get("Q", jnp.asarray(0.0)) / area
        else:
            q = bd.get("q", jnp.asarray(0.0))
        grad = jnp.broadcast_to(q, psi_c.shape) / kappa
        return dict(refValue=jnp.zeros_like(psi_c), refGradient=grad,
                    valueFraction=jnp.zeros_like(psi_c))

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


# ---------------------------------------------------------------------------
# time-varying values
# ---------------------------------------------------------------------------

def _interp_table(times, values, t):
    """Piecewise-linear time interpolation, clamped at the ends."""
    t = jnp.clip(t, times[0], times[-1])
    i = jnp.clip(jnp.searchsorted(times, t, side="right") - 1,
                 0, times.shape[0] - 2)
    t0, t1 = times[i], times[i + 1]
    f = jnp.where(t1 > t0, (t - t0) / jnp.maximum(t1 - t0, 1e-30), 0.0)
    v0, v1 = values[i], values[i + 1]
    return v0 + f * (v1 - v0)


@register("fvPatchField", "timeVaryingUniformFixedValue")
@dataclass(frozen=True)
class TimeVaryingUniformFixedValue(FixedValue):
    """uniformFixedValue with a Function1 time table: bd carries
    'table_times' (nT,) and 'table_values' (nT[,3]); env['t'] is the
    current time (reference: derived/uniformFixedValue + Function1
    table). io.py routes `uniformValue table (...)` entries here."""

    def evaluate(self, mesh, patch, field, bd, env=None):
        shape = field.patch_internal(mesh, patch).shape
        if "table_times" in bd and env is not None and "t" in env:
            v = _interp_table(bd["table_times"], bd["table_values"],
                              env["t"])
            return jnp.broadcast_to(v, shape)
        v = bd.get("uniformValue", bd.get("value", 0.0))
        if hasattr(v, "ndim") and v.ndim > 1:  # ('table', rows) fallback
            v = v[0]
        return jnp.broadcast_to(v, shape)


@register("fvPatchField", "timeVaryingMappedFixedValue")
@dataclass(frozen=True)
class TimeVaryingMappedFixedValue(FixedValue):
    """fixedValue from constant/boundaryData/<patch>/<time>/<field>
    sample files, nearest-point mapped to the patch faces and linearly
    interpolated in time (reference: derived/timeVaryingMappedFixedValue;
    spatial interpolation is nearest-neighbour here vs the reference's
    triangulated planar interpolation). io.py fills bd['tvm_times']
    (nT,) and bd['tvm_values'] (nT, nFaces[,3]); env['t'] is the time."""

    def evaluate(self, mesh, patch, field, bd, env=None):
        shape = field.patch_internal(mesh, patch).shape
        if "tvm_times" not in bd:
            return jnp.broadcast_to(bd.get("value", 0.0), shape)
        t = (env or {}).get("t", bd["tvm_times"][0])
        return _interp_table(bd["tvm_times"], bd["tvm_values"], t)
