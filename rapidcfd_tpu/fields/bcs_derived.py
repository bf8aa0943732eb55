"""Derived fvPatchField zoo, second tranche.

Pure per-patch coefficient functions following fields/bcs.py's contract
(evaluate / value_internal_coeff / gradient_internal_coeff). Reference
provenance for each type is the same-named directory under
src/finiteVolume/fields/fvPatchFields/derived/ in RapidCFD-dev.

Environment-field conventions (env dict): 'phi' (flux SurfaceField),
'U', 'k', 'rho', 'alpha', 'psi' (compressibility VolField), 't' (current
time scalar), 'dt', 'rng_key' (jax PRNG key for stochastic inlets),
'g' ((3,) gravity vector).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..utils.registry import register
from .bcs import (BC, FixedValue, FixedGradient, InletOutlet, Mixed,
                  TotalPressure, ZeroGradient, _bcast, _interp_table,
                  make_bc)

__all__ = ["manipulate_matrix_bcs"]


def _env_field(env, name):
    if env is None or name not in env:
        return None
    f = env[name]
    return f


def _patch_slice(patch):
    return slice(patch.bstart, patch.bstart + patch.size)


def _patch_phi(mesh, patch, env):
    phi = _env_field(env, "phi")
    if phi is None:
        return None
    data = phi.data if hasattr(phi, "data") else phi
    return data[patch.start:patch.start + patch.size]


def _patch_bvals(mesh, patch, env, name):
    f = _env_field(env, name)
    if f is None:
        return None
    return f.bvalues[_patch_slice(patch)] if hasattr(f, "bvalues") else None


def _phi_is_mass_flux(env):
    """True when env['phi'] carries density (rho*U*A) dimensions."""
    phi = _env_field(env, "phi")
    if phi is None or not hasattr(phi, "dims"):
        return False
    return phi.dims.as_tuple()[0] == 1


def _volumetric_patch_phi(mesh, patch, env):
    """phi_b converted to a volumetric flux (reference BCs divide by the
    rho patch field when phi is a mass flux)."""
    phi_b = _patch_phi(mesh, patch, env)
    if phi_b is None:
        return None
    if _phi_is_mass_flux(env):
        rho_b = _patch_bvals(mesh, patch, env, "rho")
        if rho_b is not None:
            phi_b = phi_b / jnp.maximum(rho_b, 1e-30)
    return phi_b


# ---------------------------------------------------------------------------
# compressible inlet temperatures (reference: derived/totalTemperature,
# inletOutletTotalTemperature)
# ---------------------------------------------------------------------------

@register("fvPatchField", "totalTemperature")
@dataclass(frozen=True)
class TotalTemperature(FixedValue):
    """T = T0 / (1 + 0.5 psi (g-1)/g (1-pos(phi)) |U|^2) (reference:
    derived/totalTemperature/totalTemperatureFvPatchScalarField.C:150-172).
    env: 'U', 'phi', 'psi' (compressibility); bd: 'T0', 'gamma'."""

    def _t0(self, bd, shape):
        t0 = bd.get("T0", bd.get("value", 300.0))
        return jnp.broadcast_to(t0, shape)

    def evaluate(self, mesh, patch, field, bd, env=None):
        shape = field.patch_internal(mesh, patch).shape
        t0 = self._t0(bd, shape)
        u_b = _patch_bvals(mesh, patch, env, "U")
        psi_b = _patch_bvals(mesh, patch, env, "psi")
        phi_b = _patch_phi(mesh, patch, env)
        if u_b is None or psi_b is None or phi_b is None:
            return t0
        gamma = bd.get("gamma", jnp.asarray(1.4))
        g_m1_by_g = (gamma - 1.0) / gamma
        inflow = (phi_b < 0.0).astype(t0.dtype)
        mag_sqr_u = (u_b * u_b).sum(-1)
        return t0 / (1.0 + 0.5 * psi_b * g_m1_by_g * inflow * mag_sqr_u)


@register("fvPatchField", "inletOutletTotalTemperature")
@dataclass(frozen=True)
class InletOutletTotalTemperature(InletOutlet):
    """inletOutlet whose inlet value is the totalTemperature form
    (reference: derived/inletOutletTotalTemperature)."""

    def _mixed_bd(self, bd, mesh, patch, env, psi_c):
        phi_p = self._patch_phi(mesh, patch, env)
        f = 1.0 - (phi_p >= 0.0).astype(psi_c.dtype)
        t0 = jnp.broadcast_to(bd.get("T0", bd.get("inletValue", 300.0)),
                              psi_c.shape)
        u_b = _patch_bvals(mesh, patch, env, "U")
        psi_b = _patch_bvals(mesh, patch, env, "psi")
        t_in = t0
        if u_b is not None and psi_b is not None:
            gamma = bd.get("gamma", jnp.asarray(1.4))
            g_m1_by_g = (gamma - 1.0) / gamma
            t_in = t0 / (1.0 + 0.5 * psi_b * g_m1_by_g * f
                         * (u_b * u_b).sum(-1))
        return dict(refValue=t_in, refGradient=jnp.zeros_like(psi_c),
                    valueFraction=_bcast(f, psi_c) * jnp.ones_like(psi_c))


# ---------------------------------------------------------------------------
# stochastic inlet (reference: derived/turbulentInlet)
# ---------------------------------------------------------------------------

@register("fvPatchField", "turbulentInlet")
@dataclass(frozen=True)
class TurbulentInlet(FixedValue):
    """Fluctuating inlet: value = (1-alpha) prev + alpha (ref + rmsCorr *
    (rand-0.5) * fluctuationScale * |ref|) (reference: derived/
    turbulentInlet/turbulentInletFvPatchField.C:updateCoeffs). The PRNG
    key comes from env['rng_key'] (or a time-derived fold); the previous
    patch values are the field's stored bvalues."""

    def evaluate(self, mesh, patch, field, bd, env=None):
        prev = field.patch_values(mesh, patch)
        ref = jnp.broadcast_to(bd.get("referenceField", bd.get("value", 0.0)),
                               prev.shape)
        alpha = bd.get("alpha", jnp.asarray(0.1))
        scale = jnp.broadcast_to(bd.get("fluctuationScale", 0.02), prev.shape)
        if env is not None and "rng_key" in env:
            key = env["rng_key"]
        else:
            t = (env or {}).get("t", 0.0)
            key = jax.random.PRNGKey(0)
            key = jax.random.fold_in(
                key, jnp.asarray(t * 1e6, jnp.int32) + patch.bstart)
        rand = jax.random.uniform(key, prev.shape, prev.dtype)
        rms_corr = jnp.sqrt(12.0 * (2.0 * alpha - alpha * alpha)) / alpha
        mag_ref = jnp.linalg.norm(ref, axis=-1, keepdims=True) \
            if prev.ndim > 1 else jnp.abs(ref)
        fluct = rms_corr * (rand - 0.5) * scale * mag_ref
        return (1.0 - alpha) * prev + alpha * (ref + fluct)


# ---------------------------------------------------------------------------
# supersonic freestream (reference: derived/supersonicFreestream)
# ---------------------------------------------------------------------------

@register("fvPatchField", "supersonicFreestream")
@dataclass(frozen=True)
class SupersonicFreestream(Mixed):
    """Supersonic outflow/freestream velocity with a Prandtl-Meyer
    expansion from the freestream state (reference: derived/
    supersonicFreestream/supersonicFreestreamFvPatchVectorField.C:160-300):

    - p >= pInf: expansion from freestream — U = Ut + f(nuMachInf -
      nuMach(p)) nHatInf
    - p < pInf, subsonic interior Mach: zero-gradient carry-through
    - p < pInf, supersonic: expansion from the interior state

    env: 'p', 'T', 'psi'; bd: 'UInf', 'pInf', 'TInf', 'gamma'."""
    preserves_type = True

    @staticmethod
    def _nu_mach(mach2, gamma):
        """Prandtl-Meyer function of Mach^2 (reference :224-231)."""
        m2m1 = jnp.maximum(mach2 - 1.0, 0.0)
        gp = (gamma + 1.0) / (gamma - 1.0)
        return (jnp.sqrt(gp) * jnp.arctan(jnp.sqrt(m2m1 / gp))
                - jnp.arctan(jnp.sqrt(m2m1)))

    def _mixed_bd(self, bd, mesh, patch, env, psi_c):
        u_inf = jnp.broadcast_to(bd["UInf"], psi_c.shape)
        p_inf = bd["pInf"]
        t_inf = bd["TInf"]
        gamma = bd.get("gamma", jnp.asarray(1.4))
        env = env or {}
        p_b = _patch_bvals(mesh, patch, env, "p")
        psi_b = _patch_bvals(mesh, patch, env, "psi")
        if p_b is None or psi_b is None:
            # freshly-read field: freestream everywhere
            return dict(refValue=u_inf, refGradient=jnp.zeros_like(psi_c),
                        valueFraction=jnp.ones_like(psi_c))
        t_b = _patch_bvals(mesh, patch, env, "T")
        # R from psi = 1/(R T): use the patch mean like the reference's
        # psip[0]*pT[0] single-face sample (:180)
        rt = 1.0 / jnp.maximum(psi_b, 1e-30)
        c_inf2 = gamma * jnp.mean(rt) * t_inf / jnp.maximum(
            jnp.mean(t_b) if t_b is not None else t_inf, 1e-30)
        mach_inf2 = (u_inf * u_inf).sum(-1) / jnp.maximum(c_inf2, 1e-30)
        nu_mach_inf = self._nu_mach(mach_inf2, gamma)
        u_inf_hat = u_inf / jnp.maximum(
            jnp.linalg.norm(u_inf, axis=-1, keepdims=True), 1e-30)
        n = mesh.patch_normals(patch)
        # tangential-plane unit vector of the freestream at each face
        nn_inf = jnp.cross(u_inf_hat, n)
        n_hat_inf = jnp.cross(n, nn_inf)
        n_hat_inf = n_hat_inf / jnp.maximum(
            jnp.linalg.norm(n_hat_inf, axis=-1, keepdims=True), 1e-30)
        u_t = psi_c - n * (psi_c * n).sum(-1, keepdims=True)
        mag_ut = jnp.linalg.norm(u_t, axis=-1)
        # outflow branch (p >= pInf): expansion from freestream
        pp_ratio = jnp.maximum(p_b, 1e-30) / p_inf
        g_exp = (gamma - 1.0) / (2.0 * gamma)
        mach2_out = (2.0 / (gamma - 1.0)) * jnp.maximum(
            (1.0 + 0.5 * (gamma - 1.0) * mach_inf2)
            * pp_ratio ** (-2.0 * g_exp) - 1.0, 0.0)
        fpp_out = (nu_mach_inf - self._nu_mach(mach2_out, gamma)) * mag_ut
        u_out = u_t + fpp_out[:, None] * n_hat_inf
        # inflow branch: interior Mach decides
        c_b2 = gamma * rt
        mach2_in = (psi_c * psi_c).sum(-1) / jnp.maximum(c_b2, 1e-30)
        fpp_in = (nu_mach_inf - self._nu_mach(mach2_in, gamma)) * mag_ut
        u_in_sup = u_t + fpp_in[:, None] * n_hat_inf
        outflow = (p_b >= p_inf)
        supersonic = mach2_in > 1.0
        ref_v = jnp.where(outflow[:, None], u_out,
                          jnp.where(supersonic[:, None], u_in_sup, psi_c))
        # subsonic inflow carries the interior through (valueFraction 0)
        f = jnp.where(outflow | supersonic, 1.0, 0.0).astype(psi_c.dtype)
        return dict(refValue=ref_v, refGradient=jnp.zeros_like(psi_c),
                    valueFraction=_bcast(f, psi_c) * jnp.ones_like(psi_c))

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
# flux-consistent velocity outlets (reference: derived/fluxCorrectedVelocity,
# pressure*InletVelocity family)
# ---------------------------------------------------------------------------

@register("fvPatchField", "fluxCorrectedVelocity")
@dataclass(frozen=True)
class FluxCorrectedVelocity(ZeroGradient):
    """zeroGradient velocity whose normal component is replaced by the
    flux-consistent value n phi/|Sf| (reference: derived/
    fluxCorrectedVelocity evaluate)."""

    def evaluate(self, mesh, patch, field, bd, env=None):
        psi_c = field.patch_internal(mesh, patch)
        phi_b = _volumetric_patch_phi(mesh, patch, env)
        if phi_b is None:
            return psi_c
        n = mesh.patch_normals(patch)
        un = (phi_b / jnp.maximum(mesh.patch_mag_sf(patch), 1e-30))[:, None]
        return psi_c - n * (psi_c * n).sum(-1, keepdims=True) + n * un


@register("fvPatchField", "pressureDirectedInletVelocity")
@dataclass(frozen=True)
class PressureDirectedInletVelocity(FixedValue):
    """U = inletDir * phi / ((n & inletDir) |Sf|) (reference: derived/
    pressureDirectedInletVelocity). bd: 'inletDirection'."""

    def evaluate(self, mesh, patch, field, bd, env=None):
        shape = field.patch_internal(mesh, patch).shape
        d = jnp.broadcast_to(bd["inletDirection"], shape)
        d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True),
                            1e-30)
        phi_b = _volumetric_patch_phi(mesh, patch, env)
        if phi_b is None:
            return jnp.broadcast_to(bd.get("value", 0.0), shape)
        n = mesh.patch_normals(patch)
        nd_mag_s = (n * d).sum(-1) * mesh.patch_mag_sf(patch)
        return d * (phi_b / jnp.where(jnp.abs(nd_mag_s) > 1e-30,
                                      nd_mag_s, 1e-30))[:, None]


class _PressureInletOutletBase(BC):
    """Shared mixed-form machinery for the pressure*InletOutletVelocity
    family: zeroGradient on outflow (f=0), flux-derived value on inflow
    (f=1)."""
    preserves_type = True

    def _ref_value(self, mesh, patch, field, bd, env, psi_c):
        raise NotImplementedError

    def _mixed(self, mesh, patch, field, bd, env):
        psi_c = field.patch_internal(mesh, patch)
        phi_b = _patch_phi(mesh, patch, env)
        if phi_b is None:
            return psi_c, jnp.zeros_like(psi_c), psi_c
        f = 1.0 - (phi_b >= 0.0).astype(psi_c.dtype)
        ref = self._ref_value(mesh, patch, field, bd, env, psi_c)
        return psi_c, _bcast(f, psi_c) * jnp.ones_like(psi_c), ref

    def evaluate(self, mesh, patch, field, bd, env=None):
        psi_c, f, ref = self._mixed(mesh, patch, field, bd, env)
        return f * ref + (1.0 - f) * psi_c

    def value_internal_coeff(self, mesh, patch, field, bd, env=None):
        psi_c, f, _ = self._mixed(mesh, patch, field, bd, env)
        return 1.0 - f

    def gradient_internal_coeff(self, mesh, patch, field, bd, env=None):
        psi_c, f, _ = self._mixed(mesh, patch, field, bd, env)
        dc = _bcast(mesh.patch_delta_coeffs(patch), psi_c)
        return -f * dc


@register("fvPatchField", "pressureNormalInletOutletVelocity")
@dataclass(frozen=True)
class PressureNormalInletOutletVelocity(_PressureInletOutletBase):
    """Inflow value n phi/|Sf| (reference: derived/
    pressureNormalInletOutletVelocity)."""

    def _ref_value(self, mesh, patch, field, bd, env, psi_c):
        phi_b = _volumetric_patch_phi(mesh, patch, env)
        n = mesh.patch_normals(patch)
        return n * (phi_b / jnp.maximum(mesh.patch_mag_sf(patch),
                                        1e-30))[:, None]


@register("fvPatchField", "pressureDirectedInletOutletVelocity")
@dataclass(frozen=True)
class PressureDirectedInletOutletVelocity(_PressureInletOutletBase):
    """Inflow value inletDir phi/((n & d)|Sf|) (reference: derived/
    pressureDirectedInletOutletVelocity)."""

    def _ref_value(self, mesh, patch, field, bd, env, psi_c):
        d = jnp.broadcast_to(bd["inletDirection"], psi_c.shape)
        d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True),
                            1e-30)
        phi_b = _volumetric_patch_phi(mesh, patch, env)
        n = mesh.patch_normals(patch)
        nd_mag_s = (n * d).sum(-1) * mesh.patch_mag_sf(patch)
        return d * (phi_b / jnp.where(jnp.abs(nd_mag_s) > 1e-30,
                                      nd_mag_s, 1e-30))[:, None]


@register("fvPatchField", "pressureInletOutletParSlipVelocity")
@dataclass(frozen=True)
class PressureInletOutletParSlipVelocity(_PressureInletOutletBase):
    """Inflow value = tangential interior + flux-normal component
    (reference: derived/pressureInletOutletParSlipVelocity)."""

    def _ref_value(self, mesh, patch, field, bd, env, psi_c):
        phi_b = _volumetric_patch_phi(mesh, patch, env)
        n = mesh.patch_normals(patch)
        u_t = psi_c - n * (psi_c * n).sum(-1, keepdims=True)
        return u_t + n * (phi_b / jnp.maximum(
            mesh.patch_mag_sf(patch), 1e-30))[:, None]


@register("fvPatchField", "pressureInletUniformVelocity")
@dataclass(frozen=True)
class PressureInletUniformVelocity(FixedValue):
    """pressureInletVelocity averaged uniformly over the patch
    (reference: derived/pressureInletUniformVelocity: U = n
    sum(Sf&U)/sum(|Sf|))."""

    def evaluate(self, mesh, patch, field, bd, env=None):
        shape = field.patch_internal(mesh, patch).shape
        phi_b = _volumetric_patch_phi(mesh, patch, env)
        if phi_b is None:
            return jnp.broadcast_to(bd.get("value", 0.0), shape)
        n = mesh.patch_normals(patch)
        from ..linalg.solvers import gsum
        mean_un = gsum(phi_b) / jnp.maximum(
            gsum(mesh.patch_mag_sf(patch)), 1e-30)
        return n * mean_un


@register("fvPatchField", "rotatingPressureInletOutletVelocity")
@dataclass(frozen=True)
class RotatingPressureInletOutletVelocity(_PressureInletOutletBase):
    """pressureInletOutletVelocity in a rotating frame: the inflow value
    is the flux-normal component minus the frame's tangential velocity
    (reference: derived/rotatingPressureInletOutletVelocity
    calcTangentialVelocity). bd: 'origin', 'axis', 'omega'."""

    def _frame_velocity(self, mesh, patch, bd):
        cf = mesh.patch_cf(patch)
        origin = bd.get("origin", jnp.zeros(3))
        axis = bd["axis"]
        axis = axis / jnp.maximum(jnp.linalg.norm(axis), 1e-30)
        om = bd["omega"] * axis
        return jnp.cross(jnp.broadcast_to(om, cf.shape), cf - origin)

    def _ref_value(self, mesh, patch, field, bd, env, psi_c):
        phi_b = _volumetric_patch_phi(mesh, patch, env)
        n = mesh.patch_normals(patch)
        u_rot = self._frame_velocity(mesh, patch, bd)
        tangential = -(u_rot - n * (u_rot * n).sum(-1, keepdims=True))
        return tangential + n * (phi_b / jnp.maximum(
            mesh.patch_mag_sf(patch), 1e-30))[:, None]


@register("fvPatchField", "rotatingTotalPressure")
@dataclass(frozen=True)
class RotatingTotalPressure(TotalPressure):
    """totalPressure evaluated with U + omega x r (reference: derived/
    rotatingTotalPressure). bd: 'origin', 'axis', 'omega', 'p0'."""

    def evaluate(self, mesh, patch, field, bd, env=None):
        p0 = jnp.broadcast_to(bd["p0"], (patch.size,))
        if env is None or "U" not in env or "phi" not in env:
            return p0
        sl = _patch_slice(patch)
        u_b = env["U"].bvalues[sl]
        cf = mesh.patch_cf(patch)
        origin = bd.get("origin", jnp.zeros(3))
        axis = bd["axis"]
        axis = axis / jnp.maximum(jnp.linalg.norm(axis), 1e-30)
        om = bd["omega"] * axis
        # reference rotates about the axis through the origin: r with the
        # axial component removed
        r = cf - origin
        r = r - axis * (r * axis).sum(-1, keepdims=True)
        u_b = u_b + jnp.cross(jnp.broadcast_to(om, r.shape), r)
        phi_b = _patch_phi(mesh, patch, env)
        dyn = 0.5 * (u_b * u_b).sum(-1)
        return jnp.where(phi_b >= 0.0, p0, p0 - dyn)


# ---------------------------------------------------------------------------
# hydrostatic / phase pressure inlets
# ---------------------------------------------------------------------------

@register("fvPatchField", "uniformDensityHydrostaticPressure")
@dataclass(frozen=True)
class UniformDensityHydrostaticPressure(FixedValue):
    """p = pRefValue + rho g . (Cf - pRefPoint) (reference: derived/
    uniformDensityHydrostaticPressure). bd: 'rho', 'pRefValue',
    'pRefPoint'; env may carry 'g' ((3,) vector), default (0 0 -9.81)."""

    def _g(self, env):
        g = (env or {}).get("g")
        return jnp.asarray([0.0, 0.0, -9.81]) if g is None else g

    def evaluate(self, mesh, patch, field, bd, env=None):
        cf = mesh.patch_cf(patch)
        g = self._g(env)
        p_ref = bd.get("pRefValue", bd.get("value", 0.0))
        ref_pt = bd.get("pRefPoint", jnp.zeros(3))
        rho = bd["rho"]
        return jnp.broadcast_to(p_ref, (patch.size,)) \
            + rho * ((cf - ref_pt) * g).sum(-1)


@register("fvPatchField", "phaseHydrostaticPressure")
@dataclass(frozen=True)
class PhaseHydrostaticPressure(Mixed):
    """Mixed: hydrostatic fixedValue weighted by the local phase
    fraction, zeroGradient elsewhere (reference: derived/
    phaseHydrostaticPressure). bd: 'rho', 'pRefValue', 'pRefPoint';
    env: 'alpha' (phase fraction field), 'g'."""

    def _mixed_bd(self, bd, mesh, patch, env, psi_c):
        alpha_b = _patch_bvals(mesh, patch, env, "alpha")
        f = jnp.clip(alpha_b, 0.0, 1.0) if alpha_b is not None \
            else jnp.ones_like(psi_c)
        g = (env or {}).get("g")
        g = jnp.asarray([0.0, 0.0, -9.81]) if g is None else g
        cf = mesh.patch_cf(patch)
        ref = jnp.broadcast_to(bd.get("pRefValue", 0.0), psi_c.shape) \
            + bd["rho"] * ((cf - bd.get("pRefPoint", jnp.zeros(3)))
                           * g).sum(-1)
        return dict(refValue=ref, refGradient=jnp.zeros_like(psi_c),
                    valueFraction=jnp.broadcast_to(f, psi_c.shape))

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
# misc inlets
# ---------------------------------------------------------------------------

@register("fvPatchField", "interstitialInletVelocity")
@dataclass(frozen=True)
class InterstitialInletVelocity(FixedValue):
    """U = inletVelocity / alpha (reference: derived/
    interstitialInletVelocity). env: 'alpha'."""

    def evaluate(self, mesh, patch, field, bd, env=None):
        shape = field.patch_internal(mesh, patch).shape
        u_in = jnp.broadcast_to(bd.get("inletVelocity", bd.get("value", 0.0)),
                                shape)
        alpha_b = _patch_bvals(mesh, patch, env, "alpha")
        if alpha_b is None:
            return u_in
        return u_in / jnp.maximum(alpha_b, 1e-6)[:, None]


@register("fvPatchField", "outletMappedUniformInlet")
@dataclass(frozen=True)
class OutletMappedUniformInlet(FixedValue):
    """Inlet fed the flux-weighted average of another (outlet) patch of
    the SAME field (reference: derived/outletMappedUniformInlet).
    from_dict captures 'outletPatchName'; env should carry 'phi'."""
    outlet_patch: str = ""

    @classmethod
    def from_dict(cls, patch_idx, pd):
        name = ""
        if pd is not None:
            name = pd.word("outletPatchName") \
                if pd.lookup("outletPatchName") is not None else ""
        return cls(patch_idx, name)

    def evaluate(self, mesh, patch, field, bd, env=None):
        shape = field.patch_internal(mesh, patch).shape
        out_p = None
        for p in mesh.patches:
            if p.name == self.outlet_patch:
                out_p = p
                break
        if out_p is None:
            return jnp.broadcast_to(bd.get("value", 0.0), shape)
        out_vals = field.bvalues[_patch_slice(out_p)]
        from ..linalg.solvers import gsum
        phi_b = _patch_phi(mesh, out_p, env)
        if phi_b is not None:
            w = phi_b
            denom = gsum(w)
            mag_sf = mesh.patch_mag_sf(out_p)
            w = jnp.where(denom > 1e-30, w, mag_sf)
            denom = jnp.where(denom > 1e-30, denom, gsum(mag_sf))
        else:
            w = mesh.patch_mag_sf(out_p)
            denom = gsum(w)
        wv = _bcast(w, out_vals) * out_vals
        if wv.ndim > 1:
            avg = jnp.stack([gsum(wv[:, c]) for c in range(wv.shape[1])])
        else:
            avg = gsum(wv)
        return jnp.broadcast_to(avg / jnp.maximum(denom, 1e-30), shape)


@register("fvPatchField", "oscillatingFixedValue")
@dataclass(frozen=True)
class OscillatingFixedValue(FixedValue):
    """value = refValue (1 + amplitude sin(2 pi f t)) + offset
    (reference: derived/oscillatingFixedValue). env: 't'."""

    def evaluate(self, mesh, patch, field, bd, env=None):
        shape = field.patch_internal(mesh, patch).shape
        ref = jnp.broadcast_to(bd.get("refValue", bd.get("value", 0.0)),
                               shape)
        off = jnp.broadcast_to(bd.get("offset", 0.0), shape)
        t = (env or {}).get("t")
        if t is None:
            return ref + off
        a = bd.get("amplitude", jnp.asarray(1.0))
        f = bd.get("frequency", jnp.asarray(1.0))
        scale = 1.0 + a * jnp.sin(2.0 * jnp.pi * f * t)
        return ref * scale + off


@register("fvPatchField", "syringePressure")
@dataclass(frozen=True)
class SyringePressure(FixedValue):
    """Syringe pressure from a piecewise piston-volume schedule
    (reference: derived/syringePressure): ps = (psI VsI + ams/psi)/Vs(t)
    with Vs(t) the acceleration/constant/deceleration profile. The
    injected-mass accumulator ams is carried in bd['ams'] and advanced
    by the solver via advance_syringe_state. env: 't'."""

    @staticmethod
    def _vs(bd, t):
        ap, sp = bd["Ap"], bd["Sp"]
        vsi = bd["VsI"]
        tas, tae = bd["tas"], bd["tae"]
        tds, tde = bd["tds"], bd["tde"]
        r = ap * sp
        v1 = vsi
        v2 = vsi + 0.5 * r * (t - tas) ** 2 / jnp.maximum(tae - tas, 1e-30)
        v3 = vsi + 0.5 * r * (tae - tas) + r * (t - tae)
        v4 = v3 * 0.0 + vsi + 0.5 * r * (tae - tas) + r * (tds - tae) \
            + r * (t - tds) \
            - 0.5 * r * (t - tds) ** 2 / jnp.maximum(tde - tds, 1e-30)
        v5 = vsi + 0.5 * r * (tae - tas) + r * (tds - tae) \
            + 0.5 * r * (tde - tds)
        return jnp.where(
            t < tas, v1,
            jnp.where(t < tae, v2,
                      jnp.where(t < tds, v3,
                                jnp.where(t < tde, v4, v5))))

    def evaluate(self, mesh, patch, field, bd, env=None):
        shape = field.patch_internal(mesh, patch).shape
        t = (env or {}).get("t")
        if t is None or "VsI" not in bd:
            return jnp.broadcast_to(bd.get("value", 0.0), shape)
        psi = bd["psI"] * 0.0 + bd.get("psi", 1e-5)
        ams = bd.get("ams", jnp.asarray(0.0))
        ps = (bd["psI"] * bd["VsI"] + ams / psi) / self._vs(bd, t)
        return jnp.broadcast_to(ps, shape)


def advance_syringe_state(mesh, field, phi, dt):
    """Advance bd['ams'] (injected mass) for every syringePressure patch:
    ams += dt * sum(p*psi*phi) (volumetric phi) or dt * sum(phi) (mass
    flux) — reference syringePressure updateCoeffs."""
    new_bd = []
    changed = False
    for patch, bc, bd in zip(mesh.patches, field.bcs, field.bcdata):
        if isinstance(bc, SyringePressure) and patch.size:
            d = dict(bd)
            phi_b = phi.data[patch.start:patch.start + patch.size]
            p_b = field.bvalues[_patch_slice(patch)]
            psi = d.get("psi", jnp.asarray(1e-5))
            if hasattr(phi, "dims") and phi.dims.as_tuple()[0] == 1:
                dm = phi_b.sum()
            else:
                dm = (p_b * psi * phi_b).sum()
            d["ams"] = d.get("ams", jnp.asarray(0.0)) + dt * dm
            new_bd.append(d)
            changed = True
        else:
            new_bd.append(bd)
    if not changed:
        return field
    return field.replace(bcdata=tuple(new_bd))


# ---------------------------------------------------------------------------
# matrix-manipulating / coupling placeholders
# ---------------------------------------------------------------------------

@register("fvPatchField", "fixedInternalValue")
@dataclass(frozen=True)
class FixedInternalValue(ZeroGradient):
    """Boundary-adjacent CELL values imposed through the matrix
    (reference: fixedInternalValueFvPatchField::manipulateMatrix, which
    setValues the patch face-cells with the patch field). Solvers apply
    it via manipulate_matrix_bcs before solving."""
    manipulates_matrix = True


def manipulate_matrix_bcs(mesh, m):
    """Apply matrix-manipulating BCs (fixedInternalValue): set the patch
    face-cell rows to the stored patch values (reference:
    fixedInternalValueFvPatchField.C:manipulateMatrix -> setValues).
    Returns the (possibly) modified matrix; cheap no-op when the field
    has no manipulating patch."""
    field = m.psi
    items = [(mesh.patches[bc.patch], bc, bd)
             for bc, bd in zip(field.bcs, field.bcdata)
             if getattr(bc, "manipulates_matrix", False)
             and mesh.patches[bc.patch].size]
    if not items:
        return m
    n = m.diag.shape[0]
    mask = jnp.zeros(n, m.diag.dtype)
    vals = jnp.zeros(m.source.shape, m.source.dtype)
    from .bcs_mapped import internal_pin_values
    for patch, bc, bd in items:
        cells = mesh.patch_face_cells(patch)
        pv = internal_pin_values(bc, mesh, patch, field, bd)
        mask = mask.at[cells].set(1.0)
        vals = vals.at[cells].set(pv)
    if m.source.ndim > 1:
        # set_values is scalar-contract; apply per solve component via
        # the same mask (values broadcast)
        return m.set_values(mesh, mask, vals)
    return m.set_values(mesh, mask, vals)


@register("fvPatchField", "externalCoupledMixed")
@dataclass(frozen=True)
class ExternalCoupledMixed(Mixed):
    """File-coupled mixed BC (reference: derived/externalCoupledMixed):
    refValue/refGradient/valueFraction are refreshed from an external
    data file by utils.external_coupling.refresh (offline protocol);
    between refreshes it behaves as a plain mixed patch with the stored
    coefficients (zeroGradient defaults when absent)."""

    def _f(self, bd, psi_c):
        if "valueFraction" not in bd:
            return jnp.zeros_like(psi_c)
        return jnp.broadcast_to(bd["valueFraction"], psi_c.shape)

    def evaluate(self, mesh, patch, field, bd, env=None):
        psi_c = field.patch_internal(mesh, patch)
        bd = dict(bd)
        bd.setdefault("refValue", jnp.zeros_like(psi_c))
        bd.setdefault("refGradient", jnp.zeros_like(psi_c))
        bd.setdefault("valueFraction", jnp.zeros_like(psi_c))
        return Mixed.evaluate(self, mesh, patch, field, bd, env)

    def value_internal_coeff(self, mesh, patch, field, bd, env=None):
        psi_c = field.patch_internal(mesh, patch)
        return 1.0 - self._f(bd, psi_c)

    def gradient_internal_coeff(self, mesh, patch, field, bd, env=None):
        psi_c = field.patch_internal(mesh, patch)
        dc = _bcast(mesh.patch_delta_coeffs(patch), psi_c)
        return -self._f(bd, psi_c) * dc


# ---------------------------------------------------------------------------
# remaining simple derived types (reference: derived/)
# ---------------------------------------------------------------------------

@register("fvPatchField", "uniformInletOutlet")
@dataclass(frozen=True)
class UniformInletOutlet(InletOutlet):
    """inletOutlet with a uniform (possibly tabulated) inlet value
    (reference: derived/uniformInletOutlet)."""

    def _mixed_bd(self, bd, mesh, patch, env, psi_c):
        phi_p = self._patch_phi(mesh, patch, env)
        f = 1.0 - (phi_p >= 0.0).astype(psi_c.dtype)
        f = _bcast(f, psi_c) * jnp.ones_like(psi_c)
        v = bd.get("uniformInletValue", bd.get("inletValue", 0.0))
        if "table_times" in bd and env is not None and "t" in env:
            v = _interp_table(bd["table_times"], bd["table_values"],
                              env["t"])
        return dict(refValue=jnp.broadcast_to(v, psi_c.shape),
                    refGradient=jnp.zeros_like(psi_c), valueFraction=f)


@register("fvPatchField", "fixedNormalInletOutletVelocity")
@dataclass(frozen=True)
class FixedNormalInletOutletVelocity(BC):
    """Normal component fixed from 'normalVelocity'; tangential
    zeroGradient on outflow, fixed (zero or stored) on inflow
    (reference: derived/fixedNormalInletOutletVelocity, fixTangentialInflow
    simplification)."""
    preserves_type = True

    def evaluate(self, mesh, patch, field, bd, env=None):
        psi_c = field.patch_internal(mesh, patch)
        n = mesh.patch_normals(patch)
        un = jnp.broadcast_to(bd.get("normalVelocity", 0.0), psi_c.shape)
        un_n = n * (un * n).sum(-1, keepdims=True)
        phi_b = _patch_phi(mesh, patch, env)
        tang_c = psi_c - n * (psi_c * n).sum(-1, keepdims=True)
        if phi_b is None:
            return un_n + tang_c
        inflow = (phi_b < 0.0)[:, None]
        return un_n + jnp.where(inflow, jnp.zeros_like(tang_c), tang_c)

    def value_internal_coeff(self, mesh, patch, field, bd, env=None):
        psi_c = field.patch_internal(mesh, patch)
        n = mesh.patch_normals(patch)
        tang = 1.0 - n * n
        phi_b = _patch_phi(mesh, patch, env)
        if phi_b is None:
            return tang
        return jnp.where((phi_b < 0.0)[:, None], jnp.zeros_like(tang), tang)

    def gradient_internal_coeff(self, mesh, patch, field, bd, env=None):
        vic = self.value_internal_coeff(mesh, patch, field, bd, env)
        return (vic - 1.0) * mesh.patch_delta_coeffs(patch)[:, None]


@register("fvPatchField", "fixedPressureCompressibleDensity")
@dataclass(frozen=True)
class FixedPressureCompressibleDensity(FixedValue):
    """rho = rho0 + psi (p - p0) against a fixed-pressure patch
    (reference: derived/fixedPressureCompressibleDensity — the
    cavitatingFoam barotropic wall density). bd: 'p0' or env 'p',
    'rho0', 'psi0'."""

    def evaluate(self, mesh, patch, field, bd, env=None):
        shape = field.patch_internal(mesh, patch).shape
        p_b = _patch_bvals(mesh, patch, env, "p")
        if p_b is None:
            return jnp.broadcast_to(bd.get("value", 0.0), shape)
        rho_l0 = bd.get("rho0", bd.get("rhol0", 1000.0))
        psi = bd.get("psi0", bd.get("psil", 1e-5))
        p_sat = bd.get("pSat", 2300.0)
        return rho_l0 + psi * (p_b - p_sat)


@register("fvPatchField", "outletPhaseMeanVelocity")
@dataclass(frozen=True)
class OutletPhaseMeanVelocity(BC):
    """Outlet that rescales the interior velocity so the PHASE mean
    matches Umean (ship-wake outlets; reference: derived/
    outletPhaseMeanVelocity). env: 'alpha'; bd: 'Umean'."""
    preserves_type = True

    def evaluate(self, mesh, patch, field, bd, env=None):
        psi_c = field.patch_internal(mesh, patch)
        alpha_b = _patch_bvals(mesh, patch, env, "alpha")
        if alpha_b is None:
            return psi_c
        a = jnp.clip(alpha_b, 0.0, 1.0)
        w = a * mesh.patch_mag_sf(patch)
        from ..linalg.solvers import gsum
        wv = w[:, None] * psi_c
        u_mean_now = jnp.stack(
            [gsum(wv[:, c]) for c in range(wv.shape[1])]) \
            / jnp.maximum(gsum(w), 1e-30)
        u_mean = bd.get("Umean", jnp.asarray(0.0))
        mag_now = jnp.linalg.norm(u_mean_now)
        scale = jnp.where(mag_now > 1e-30, u_mean / jnp.maximum(
            mag_now, 1e-30), 1.0)
        return psi_c * scale

    def value_internal_coeff(self, mesh, patch, field, bd, env=None):
        return jnp.ones((patch.size, 1))

    def gradient_internal_coeff(self, mesh, patch, field, bd, env=None):
        return jnp.zeros((patch.size, 1))


@register("fvPatchField", "variableHeightFlowRateInletVelocity")
@dataclass(frozen=True)
class VariableHeightFlowRateInletVelocity(FixedValue):
    """U = -n flowRate alpha / sum(alpha |Sf|) — the VOF inlet that
    distributes a prescribed flow rate over the wetted fraction
    (reference: derived/variableHeightFlowRateInletVelocity).
    env: 'alpha'."""

    def evaluate(self, mesh, patch, field, bd, env=None):
        shape = field.patch_internal(mesh, patch).shape
        q = bd.get("flowRate", bd.get("volumetricFlowRate", 0.0))
        q = q if jnp.ndim(q) == 0 else q.reshape(-1)[0]
        alpha_b = _patch_bvals(mesh, patch, env, "alpha")
        n = mesh.patch_normals(patch)
        mag_sf = mesh.patch_mag_sf(patch)
        from ..linalg.solvers import gsum
        if alpha_b is None:
            area = gsum(mag_sf)
            return -n * (q / jnp.maximum(area, 1e-30))
        a = jnp.clip(alpha_b, 0.0, 1.0)
        wet = gsum(a * mag_sf)
        return -n * (q * a / jnp.maximum(wet, 1e-30))[:, None]
