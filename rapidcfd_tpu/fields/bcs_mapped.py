"""mapped* fvPatchField family (reference:
src/finiteVolume/fields/fvPatchFields/derived/mapped{FixedValue,Field,
FixedInternalValue,FixedPushedInternalValue,FlowRate,
VelocityFluxFixedValue}/ + src/meshTools/mappedPatches/mappedPatchBase).

TPU re-founding: the reference resolves the sampling map at run time
through mappedPatchBase's distributed octree search. Here the map is
computed ONCE host-side at field-read time (fields/io.py:_setup_mapped):
a KD-tree nearest-neighbour query from the sample points (patch face
centres + offset, per offsetMode) into either the cell centres
(sampleMode nearestCell) or the sample patch's face centres
(nearestPatchFace / nearestPatchFaceAMI / nearestFace). The resulting
index tables are static int32 bd leaves, so evaluate() is a tiny
boundary-sized gather under jit — no tracing-time topology work.

Cross-region sampling (sampleRegion != this mesh) is not resolvable from
a single-mesh field read; the BC then degrades to holding its stored
value (a warning is printed at read time). chtMultiRegion-style coupling
uses the dedicated CHT interface instead (solvers/chtmultiregion*).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from ..utils.registry import register
from .bcs import FixedValue, ZeroGradient, BC, _bcast

__all__ = ["internal_pin_values"]


def _set_average(v, bd):
    """setAverage yes: shift the mapped values so their mean equals the
    dict 'average' (reference: mappedPatchFieldBase::mappedField tail)."""
    if "setAverage" in bd and "average" in bd:
        on = bd["setAverage"]
        avg = bd["average"]
        v = v + on * (avg - v.mean(axis=0))
    return v


@register("fvPatchField", "mappedFixedValue", "mappedField")
@dataclass(frozen=True)
class MappedFixedValue(FixedValue):
    """Patch value := field sampled at the mapped locations
    (mappedFixedValueFvPatchField.C:updateCoeffs -> operator==
    (mappedField())). 'mappedField' adds fieldName/setAverage to the
    dict — same evaluation, so both words share this class."""
    field_name: str | None = None

    @classmethod
    def from_dict(cls, patch_idx, pd):
        fn = None
        if pd is not None and pd.lookup("fieldName") is not None:
            fn = pd.word("fieldName")
        return cls(patch_idx, fn)

    def _source(self, field, env):
        if self.field_name and self.field_name != field.name \
                and env is not None:
            src = env.get(self.field_name)
            if src is not None and hasattr(src, "data"):
                return src
        return field

    def _mapped(self, mesh, patch, field, bd, env):
        src = self._source(field, env)
        if "map_cells" in bd:
            v = src.data[bd["map_cells"]]
        elif "map_bfaces" in bd:
            v = src.bvalues[bd["map_bfaces"]]
        else:
            # unresolvable mapping (cross-region): hold the stored value
            return jnp.broadcast_to(
                bd["value"], field.patch_internal(mesh, patch).shape)
        return _set_average(v, bd)

    def evaluate(self, mesh, patch, field, bd, env=None):
        return self._mapped(mesh, patch, field, bd, env)


@register("fvPatchField", "mappedFixedInternalValue")
@dataclass(frozen=True)
class MappedFixedInternalValue(MappedFixedValue):
    """mappedFixedValue + the patch-adjacent CELLS are pinned (via
    fvMatrix::setValues) to the sample patch's adjacent-cell values
    (reference: mappedFixedInternalValueFvPatchField::manipulateMatrix).
    The solve path applies it through manipulate_matrix_bcs."""
    manipulates_matrix = True

    def internal_pin_values(self, mesh, patch, field, bd, env=None):
        src = self._source(field, env)
        if "map_bcells" in bd:
            return src.data[bd["map_bcells"]]
        return field.patch_values(mesh, patch)


@register("fvPatchField", "mappedFixedPushedInternalValue")
@dataclass(frozen=True)
class MappedFixedPushedInternalValue(MappedFixedInternalValue):
    """mappedFixedValue whose boundary value is also PUSHED into the
    adjacent internal cells (reference:
    mappedFixedPushedInternalValueFvPatchField::updateCoeffs assigns
    *this onto internalField()[faceCells]; here the push happens through
    the same setValues pin, which fixes those rows to the value)."""

    def internal_pin_values(self, mesh, patch, field, bd, env=None):
        return self._mapped(mesh, patch, field, bd, env)


def internal_pin_values(bc, mesh, patch, field, bd, env=None):
    """Values a matrix-manipulating BC pins its face-cells to (defaults
    to the patch values; mapped variants gather their sampled cells)."""
    fn = getattr(bc, "internal_pin_values", None)
    if fn is not None:
        return fn(mesh, patch, field, bd, env)
    return field.patch_values(mesh, patch)


@register("fvPatchField", "mappedFlowRate")
@dataclass(frozen=True)
class MappedFlowRate(FixedValue):
    """Velocity inlet driven by the flux mapped from the sample patch:
    U_b = -n * phi_mapped / (rho?*magSf), so the inflow here matches the
    sampled outflow face-by-face (reference:
    mappedFlowRateFvPatchVectorField::updateCoeffs; nbrPhi name fixed to
    the env flux 'phi')."""

    def evaluate(self, mesh, patch, field, bd, env=None):
        psi_c = field.patch_internal(mesh, patch)
        if env is None or "phi" not in env or "map_faces" not in bd:
            return jnp.broadcast_to(bd["value"], psi_c.shape)
        phi = env["phi"]
        phi_m = phi.data[bd["map_faces"]]
        if phi.dims.as_tuple()[0] == 1:  # mass flux -> volumetric
            rho = env.get("rho")
            if rho is not None:
                phi_m = phi_m / rho.bvalues[bd["map_bfaces"]]
        n = mesh.patch_normals(patch)
        mag = jnp.maximum(mesh.patch_mag_sf(patch), 1e-30)
        # sampled OUTflow (positive) enters here along the inward normal
        return -n * (phi_m / mag)[:, None]


@register("fvPatchField", "mappedVelocityFluxFixedValue")
@dataclass(frozen=True)
class MappedVelocityFluxFixedValue(MappedFixedValue):
    """U := U sampled on the sample patch (reference:
    mappedVelocityFluxFixedValueFvPatchField maps both U and phi from
    the neighbour patch; here phi_b follows automatically because flux
    assembly recomputes it from the corrected U boundary values)."""

    def evaluate(self, mesh, patch, field, bd, env=None):
        return self._mapped(mesh, patch, field, bd, env)


@register("fvPatchField", "directionMixed")
@dataclass(frozen=True)
class DirectionMixed(BC):
    """Tensor-fraction mixed: refValue imposed along the directions of
    the symmTensor valueFraction, gradient in the complement (reference:
    basic/directionMixed/directionMixedFvPatchField.C:evaluate). The
    implicit coefficient is the diagonal of (I - f), the exact remainder
    flowing through the generic vbc/gbc consistency terms (same
    treatment as symmetry/transform patches)."""
    preserves_type = True
    fixes_value = True

    @staticmethod
    def _ftensor(bd, psi_c):
        # OpenFOAM symmTensor component order: xx xy xz yy yz zz
        f6 = jnp.broadcast_to(bd["valueFraction"],
                              psi_c.shape[:1] + (6,))
        xx, xy, xz, yy, yz, zz = [f6[:, i] for i in range(6)]
        return jnp.stack([
            jnp.stack([xx, xy, xz], -1),
            jnp.stack([xy, yy, yz], -1),
            jnp.stack([xz, yz, zz], -1)], -2)

    def evaluate(self, mesh, patch, field, bd, env=None):
        psi_c = field.patch_internal(mesh, patch)
        f = self._ftensor(bd, psi_c)
        ref = jnp.broadcast_to(bd.get("refValue", 0.0), psi_c.shape)
        grad = jnp.broadcast_to(bd.get("refGradient", 0.0), psi_c.shape)
        dc = _bcast(mesh.patch_delta_coeffs(patch), psi_c)
        open_v = psi_c + grad / dc
        eye = jnp.eye(3, dtype=psi_c.dtype)
        return jnp.einsum("fij,fj->fi", f, ref) \
            + jnp.einsum("fij,fj->fi", eye - f, open_v)

    def value_internal_coeff(self, mesh, patch, field, bd, env=None):
        psi_c = field.patch_internal(mesh, patch)
        f = self._ftensor(bd, psi_c)
        eye = jnp.eye(3, dtype=psi_c.dtype)
        return jnp.diagonal(eye - f, axis1=-2, axis2=-1)

    def gradient_internal_coeff(self, mesh, patch, field, bd, env=None):
        psi_c = field.patch_internal(mesh, patch)
        f = self._ftensor(bd, psi_c)
        dc = _bcast(mesh.patch_delta_coeffs(patch), psi_c)
        eye = jnp.eye(3, dtype=psi_c.dtype)
        return -jnp.diagonal(f, axis1=-2, axis2=-1) * dc


@register("fvPatchField", "thermalBaffle1D",
          "compressible::thermalBaffle1D")
@dataclass(frozen=True)
class ThermalBaffle1D(BC):
    """Quasi-steady 1-D thermal baffle wall (reference:
    turbulenceModels/.../thermalBaffle1DFvPatchScalarField): the patch
    behaves as a thin solid of conductance G = kappa_s/thickness in
    series with the far-side fluid, sampled through the mappedWall
    pairing (samplePatch). Heat balance at the surface:
    h_own (T_c - T_s) = G (T_s - T_nbr)  ->
    T_s = (h_own T_c + G T_nbr) / (h_own + G), with h_own = kappa_f *
    deltaCoeffs from env['kappa'] (falls back to G, i.e. the midpoint).
    The transient multi-layer shell lives in models/thermalbaffle.py
    (regionModels counterpart); this BC is its steady limit."""
    preserves_type = True

    def _t_nbr(self, mesh, patch, field, bd):
        if "map_bcells" in bd:
            return field.data[bd["map_bcells"]]
        return field.patch_internal(mesh, patch)

    def _g(self, bd, psi_c):
        kappa_s = bd.get("kappa", jnp.asarray(1.0))
        thick = jnp.maximum(bd.get("thickness", jnp.asarray(1e-3)),
                            1e-12)
        return jnp.broadcast_to(kappa_s / thick, psi_c.shape)

    def _h_own(self, mesh, patch, field, bd, env, psi_c):
        dc = mesh.patch_delta_coeffs(patch)
        kf = None
        if env is not None:
            kf = env.get("kappa")
        if kf is not None and hasattr(kf, "data"):
            return kf.data[jnp.asarray(
                mesh.owner[patch.start:patch.start + patch.size])] * dc
        return self._g(bd, psi_c)   # midpoint fallback

    def evaluate(self, mesh, patch, field, bd, env=None):
        psi_c = field.patch_internal(mesh, patch)
        g = self._g(bd, psi_c)
        h = self._h_own(mesh, patch, field, bd, env, psi_c)
        qs = bd.get("Qs", jnp.asarray(0.0))
        t_nbr = self._t_nbr(mesh, patch, field, bd)
        return (h * psi_c + g * t_nbr + qs) / (h + g)

    def value_internal_coeff(self, mesh, patch, field, bd, env=None):
        psi_c = field.patch_internal(mesh, patch)
        g = self._g(bd, psi_c)
        h = self._h_own(mesh, patch, field, bd, env, psi_c)
        return h / (h + g)

    def gradient_internal_coeff(self, mesh, patch, field, bd, env=None):
        psi_c = field.patch_internal(mesh, patch)
        g = self._g(bd, psi_c)
        h = self._h_own(mesh, patch, field, bd, env, psi_c)
        dc = _bcast(mesh.patch_delta_coeffs(patch), psi_c)
        return -(g / (h + g)) * dc
