"""Radiation models — P1 + constant absorption/emission/scatter.

Capability surface of the reference's radiationModel framework
(reference: src/thermophysicalModels/radiationModels/radiationModel/P1/
P1.C:213-290: gamma = 1/(3a+sigmaEff), laplacian(gamma,G) - Sp(a,G) ==
-4(e*sigma*T^4 + E); Rp = 4 e sigma, Ru = a G - 4 E; energy coupling
radiationModel::Sh = Ru - Sp(4 Rp T^3/Cpv, he) - Rp T^3 (T - 4 he/Cpv)),
selected from constant/radiationProperties. Submodels implemented:
constantAbsorptionEmission, constantScatter (the property-field zoo
reduces to constants).

TPU-first: the G Helmholtz solve is one more jitted fvMatrix solve in
the step; the Sh linearization is fused into the energy assembly.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import jax.numpy as jnp

from ..fields.bcs import Mixed
from ..fields.field import Dimensioned, VolField
from ..linalg import solve
from ..ops import fvc, fvm
from ..utils.dictionary import Dictionary, parse_file
from ..utils.dimensions import DimensionSet
from ..utils.logging import info
from ..utils.registry import register

SIGMA_SB = 5.670373e-8   # Stefan-Boltzmann [W/m2/K4] (physicoChemical)


@register("fvPatchField", "MarshakRadiation",
          "MarshakRadiationFixedTemperature", "greyDiffusiveRadiation")
@dataclass(frozen=True)
class MarshakRadiation(Mixed):
    """Marshak boundary for incident radiation G (reference:
    radiationModels/derivedFvPatchFields/MarshakRadiation): the Robin
    flux condition -gamma dG/dn = e/(2(2-e)) (G - 4 sigma Tw^4) as a
    mixed BC with valueFraction alpha/(alpha + gamma*deltaCoeff).
    env carries 'T' (for Tw) and 'gammaRad'."""
    preserves_type = True

    def _mixed_bd(self, bd, mesh, patch, env, psi_c):
        # P1Radiation.correct stashes the per-solve Robin data in bd
        # (assembly has no env channel; the SRF BC uses the same trick)
        if "marshakRefValue" in bd:
            return dict(refValue=bd["marshakRefValue"],
                        refGradient=jnp.zeros_like(psi_c),
                        valueFraction=bd["marshakFraction"]
                        * jnp.ones_like(psi_c))
        e = jnp.clip(bd.get("emissivity", jnp.asarray(1.0)), 1e-3, 1.0)
        t_env = (env or {}).get("T")
        if t_env is not None:
            sl = slice(patch.bstart, patch.bstart + patch.size)
            tw = t_env.bvalues[sl]
        else:
            tw = jnp.zeros(patch.size, psi_c.dtype)
        gamma = (env or {}).get("gammaRad", 1.0)
        alpha = e / (2.0 * (2.0 - e))
        dc = mesh.patch_delta_coeffs(patch)
        f = alpha / (alpha + gamma * dc)
        return dict(refValue=4.0 * SIGMA_SB * tw ** 4,
                    refGradient=jnp.zeros_like(psi_c),
                    valueFraction=f * jnp.ones_like(psi_c))

    def evaluate(self, mesh, patch, field, bd, env=None):
        psi_c = field.patch_internal(mesh, patch)
        return Mixed.evaluate(self, mesh, patch, field,
                              self._mixed_bd(bd, mesh, patch, env,
                                             psi_c), env)

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


class P1Radiation:
    """radiationModel P1 (see module docstring)."""

    def __init__(self, case, props: Dictionary):
        self.case = case
        ae = props.subdict("constantAbsorptionEmissionCoeffs",
                           required=False) or Dictionary()

        def dimmed(key, default=0.0):
            v = ae.lookup(key)
            if v is None:
                return default
            return Dimensioned.from_entry(v, key).value \
                if isinstance(v, tuple) else float(v)

        self.a = dimmed("absorptivity", 0.5)
        self.e = dimmed("emissivity", 0.5)
        self.E = dimmed("E", 0.0)
        sc = props.subdict("constantScatterCoeffs",
                           required=False) or Dictionary()
        sigma = sc.lookup("sigma")
        self.sigma_s = (Dimensioned.from_entry(sigma, "sigma").value
                        if isinstance(sigma, tuple)
                        else float(sigma)) if sigma is not None else 0.0
        c = sc.lookup("C")
        self.c_lin = (Dimensioned.from_entry(c, "C").value
                      if isinstance(c, tuple)
                      else float(c)) if c is not None else 0.0
        self.gamma = 1.0 / (3.0 * self.a + self.sigma_s + 1e-30)
        self.g_controls = case.solver_controls("G")
        self.lap_corr = case.laplacian_scheme()
        info(f"Selecting radiationModel P1 (a={self.a} e={self.e} "
             f"sigma_s={self.sigma_s})")

    def read_g(self):
        return self.case.read_field("G")

    def correct(self, mesh, G: VolField, T: VolField):
        """Solve the G Helmholtz equation (reference P1.C:236-243)."""
        gamma = Dimensioned("gammaRad", DimensionSet.of(0, 1), self.gamma)
        env = {"T": T, "gammaRad": self.gamma}
        # stash the Robin data so matrix assembly (no env channel) sees
        # the current wall temperatures
        bcdata = list(G.bcdata)
        for i, bc in enumerate(G.bcs):
            if isinstance(bc, MarshakRadiation):
                patch = mesh.patches[i]
                bd = dict(bcdata[i])
                e = jnp.clip(bd.get("emissivity", jnp.asarray(1.0)),
                             1e-3, 1.0)
                sl = slice(patch.bstart, patch.bstart + patch.size)
                tw = T.bvalues[sl]
                alpha = e / (2.0 * (2.0 - e))
                dc = mesh.patch_delta_coeffs(patch)
                bd["marshakRefValue"] = 4.0 * SIGMA_SB * tw ** 4
                bd["marshakFraction"] = alpha / (alpha
                                                 + self.gamma * dc)
                bcdata[i] = bd
        G = G.replace(bcdata=tuple(bcdata))
        rhs = G.with_calculated_bcs(
            -4.0 * (self.e * SIGMA_SB * T.data ** 4 + self.E),
            jnp.zeros_like(G.bvalues),
            G.dims / DimensionSet.of(0, 1))
        eqn = (fvm.laplacian(mesh, gamma, G, self.lap_corr)
               - fvm.Sp(mesh, Dimensioned(
                   "a", DimensionSet.of(0, -1), self.a), G))
        eqn = eqn.equals(rhs)
        G_new, perf = solve(mesh, eqn, self.g_controls, env=env)
        return G_new, perf

    def sh(self, mesh, G: VolField, T: VolField, cpv, he_cur):
        """Energy-equation coupling (reference radiationModel::Sh):
        Sh = Ru - Rp*T^4, linearized in he with d(T^4)/d(he) =
        4 T^3/Cpv. Returns (sp_coeff, explicit_source) densities
        [W/m3]; the caller adds diag += V*sp, source += V*expl, so at
        convergence (he_new == he_cur) the net source is Ru - Rp*T^4."""
        t3 = T.data ** 3
        rp = 4.0 * self.e * SIGMA_SB
        ru = self.a * G.data - 4.0 * self.E
        sp = rp * t3 / jnp.maximum(cpv, 1e-10)
        expl = ru - rp * t3 * T.data + sp * he_cur
        return sp, expl

    def qr(self, mesh, G: VolField):
        """Boundary radiative heat flux -gamma*snGrad(G)."""
        sng = fvc.sn_grad(mesh, G)
        return -self.gamma * sng.data


def make_radiation_model(case):
    """radiation::radiationModel::New — returns None when radiation is
    off/absent (reference: radiationModel 'none')."""
    path = os.path.join(case.dir, "constant", "radiationProperties")
    if not os.path.isfile(path):
        return None
    props = parse_file(path)
    if not props.boolean("radiation", True):
        return None
    name = props.word("radiationModel", "none")
    if name in ("none", "noRadiation"):
        return None
    if name == "P1":
        return P1Radiation(case, props)
    raise KeyError(f"radiationProperties: unsupported radiationModel "
                   f"'{name}' (none|P1; fvDOM/viewFactor deferred)")
