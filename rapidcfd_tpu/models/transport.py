"""Transport models: the incompressible viscosity-model zoo.

Capability surface of the reference's src/transportModels (reference:
incompressible/viscosityModels + singlePhaseTransportModel.H:56): each
model is a pure function strainRate -> nu evaluated on device; selection
from constant/transportProperties.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..fields.field import Dimensioned, VolField
from ..ops import fvc
from ..utils.dictionary import Dictionary
from ..utils.dimensions import dim_viscosity
from ..utils.registry import lookup, register


def _coeff(d: Dictionary, name: str, model: str):
    sub = d.subdict(model + "Coeffs", required=False)
    entry = sub.lookup(name) if sub else None
    if entry is None:
        entry = d.lookup(name)
    if entry is None:
        raise KeyError(f"transportProperties: missing '{name}'")
    return Dimensioned.from_entry(entry, name)


@register("viscosityModel", "Newtonian")
class Newtonian:
    def __init__(self, d: Dictionary):
        self.nu0 = Dimensioned.from_entry(d.lookup("nu", required=True),
                                          "nu")

    def nu(self, mesh, U, strain_rate=None):
        return self.nu0


@register("viscosityModel", "powerLaw")
class PowerLaw:
    """nu = max(nuMin, min(nuMax, k*sr^(n-1))) (reference:
    viscosityModels/powerLaw)."""

    def __init__(self, d: Dictionary):
        self.k = _coeff(d, "k", "powerLaw").value
        self.n = _coeff(d, "n", "powerLaw").value
        self.nu_min = _coeff(d, "nuMin", "powerLaw").value
        self.nu_max = _coeff(d, "nuMax", "powerLaw").value

    def nu(self, mesh, U, strain_rate=None):
        sr = strain_rate
        val = self.k * jnp.maximum(sr.data, 1e-30) ** (self.n - 1.0)
        bval = self.k * jnp.maximum(sr.bvalues, 1e-30) ** (self.n - 1.0)
        return sr.with_calculated_bcs(
            jnp.clip(val, self.nu_min, self.nu_max),
            jnp.clip(bval, self.nu_min, self.nu_max),
            dim_viscosity, "nu")


@register("viscosityModel", "BirdCarreau")
class BirdCarreau:
    """nu = nuInf + (nu0-nuInf)*(1+(k*sr)^2)^((n-1)/2)."""

    def __init__(self, d: Dictionary):
        self.nu0 = _coeff(d, "nu0", "BirdCarreau").value
        self.nu_inf = _coeff(d, "nuInf", "BirdCarreau").value
        self.k = _coeff(d, "k", "BirdCarreau").value
        self.n = _coeff(d, "n", "BirdCarreau").value

    def nu(self, mesh, U, strain_rate=None):
        sr = strain_rate

        def f(s):
            return self.nu_inf + (self.nu0 - self.nu_inf) * (
                1.0 + (self.k * s) ** 2) ** ((self.n - 1.0) / 2.0)
        return sr.with_calculated_bcs(f(sr.data), f(sr.bvalues),
                                      dim_viscosity, "nu")


@register("viscosityModel", "CrossPowerLaw")
class CrossPowerLaw:
    """nu = nuInf + (nu0-nuInf)/(1+(m*sr)^n)."""

    def __init__(self, d: Dictionary):
        self.nu0 = _coeff(d, "nu0", "CrossPowerLaw").value
        self.nu_inf = _coeff(d, "nuInf", "CrossPowerLaw").value
        self.m = _coeff(d, "m", "CrossPowerLaw").value
        self.n = _coeff(d, "n", "CrossPowerLaw").value

    def nu(self, mesh, U, strain_rate=None):
        sr = strain_rate

        def f(s):
            return self.nu_inf + (self.nu0 - self.nu_inf) \
                / (1.0 + (self.m * s) ** self.n)
        return sr.with_calculated_bcs(f(sr.data), f(sr.bvalues),
                                      dim_viscosity, "nu")


@register("viscosityModel", "HerschelBulkley")
class HerschelBulkley:
    """nu = min(nu0, tau0/sr + k*sr^(n-1))."""

    def __init__(self, d: Dictionary):
        self.nu0 = _coeff(d, "nu0", "HerschelBulkley").value
        self.tau0 = _coeff(d, "tau0", "HerschelBulkley").value
        self.k = _coeff(d, "k", "HerschelBulkley").value
        self.n = _coeff(d, "n", "HerschelBulkley").value

    def nu(self, mesh, U, strain_rate=None):
        sr = strain_rate

        def f(s):
            s = jnp.maximum(s, 1e-30)
            return jnp.minimum(self.nu0,
                               self.tau0 / s + self.k * s ** (self.n - 1.0))
        return sr.with_calculated_bcs(f(sr.data), f(sr.bvalues),
                                      dim_viscosity, "nu")


def strain_rate(mesh, U: VolField) -> VolField:
    """sqrt(2)*|symm(grad U)| (reference: viscosityModel::strainRate)."""
    g = fvc.grad(mesh, U)
    sym = 0.5 * (g.data + jnp.swapaxes(g.data, 1, 2))
    symb = 0.5 * (g.bvalues + jnp.swapaxes(g.bvalues, 1, 2))
    mag = jnp.sqrt(2.0 * (sym * sym).sum((-2, -1)))
    magb = jnp.sqrt(2.0 * (symb * symb).sum((-2, -1)))
    return g.with_calculated_bcs(mag, magb, g.dims, "strainRate")


class SinglePhaseTransportModel:
    """reference: singlePhaseTransportModel.H:56 — runtime-selected
    viscosityModel wrapper providing nu()."""

    def __init__(self, props: Dictionary):
        name = props.word("transportModel", "Newtonian")
        self.model = lookup("viscosityModel", name)(props)
        self.is_newtonian = isinstance(self.model, Newtonian)

    def nu(self, mesh, U: VolField):
        if self.is_newtonian:
            return self.model.nu(mesh, U)
        return self.model.nu(mesh, U, strain_rate(mesh, U))
