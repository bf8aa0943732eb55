"""Thermophysical models: the specie property stack + psi/rho thermo.

Capability surface of the reference's thermophysicalModels (reference:
src/thermophysicalModels/specie layered mixin stack thermo<transport<
EoS<specie>>> and basic/psiThermo/hePsiThermo.C:35-110): on TPU the whole
per-cell property evaluation is plain vectorized jnp math — the zip-
iterator thrust kernel becomes a fused elementwise expression.

Round-1 stack: perfectGas EoS, hConst/eConst thermo (constant Cp),
const/sutherland transport, pureMixture, sensibleEnthalpy /
sensibleInternalEnergy energy forms.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from ..fields.field import VolField
from ..utils.dictionary import Dictionary

R_UNIVERSAL = 8314.47  # J/(kmol K), reference: specie.H RR


@dataclass(frozen=True)
class PerfectGasThermo:
    """pureMixture { perfectGas + hConst + const/sutherland }."""
    mol_weight: float
    cp: float
    hf: float
    mu0: float
    pr: float
    sutherland: bool = False
    as_: float = 0.0
    ts: float = 0.0
    energy: str = "sensibleInternalEnergy"
    t_std: float = 298.15

    @property
    def r(self) -> float:
        return R_UNIVERSAL / self.mol_weight

    @property
    def cv(self) -> float:
        return self.cp - self.r

    @property
    def gamma(self) -> float:
        return self.cp / self.cv

    # -- energy form ---------------------------------------------------------
    def he_from_t(self, T):
        if self.energy == "sensibleEnthalpy":
            return self.cp * (T - self.t_std)
        # sensible internal energy: es = hs - R*T
        return self.cp * (T - self.t_std) - self.r * T

    def t_from_he(self, he):
        if self.energy == "sensibleEnthalpy":
            return he / self.cp + self.t_std
        return (he + self.cp * self.t_std) / (self.cp - self.r)

    # -- state ----------------------------------------------------------------
    def psi(self, T):
        """Compressibility psi = rho/p = 1/(R T)."""
        return 1.0 / (self.r * jnp.maximum(T, 1e-10))

    def rho(self, p, T):
        return p * self.psi(T)

    def mu(self, T):
        if self.sutherland:
            return self.as_ * jnp.sqrt(T) / (1.0 + self.ts / T)
        return self.mu0

    def alpha_h(self, T):
        """Thermal diffusivity for the energy eq: kappa/Cp = mu/Pr."""
        return self.mu(T) / self.pr

    def c_sound(self, T):
        return jnp.sqrt(self.gamma * self.r * jnp.maximum(T, 1e-10))


def read_thermo(props: Dictionary) -> PerfectGasThermo:
    """Parse constant/thermophysicalProperties (reference: basicThermo
    dictionary layout, both the 2.x thermoType-dict and string forms)."""
    tt = props.lookup("thermoType", required=True)
    if isinstance(tt, Dictionary):
        energy = tt.word("energy", "sensibleInternalEnergy")
        transport = tt.word("transport", "const")
    else:
        s = str(tt if not isinstance(tt, tuple) else tt[0])
        energy = ("sensibleEnthalpy" if "h" in s.split("<")[0].lower()
                  else "sensibleInternalEnergy")
        transport = "sutherland" if "sutherland" in s else "const"

    mix = props.subdict("mixture", required=False)
    if not mix:
        for k, v in props.items():
            if isinstance(v, Dictionary) and v.lookup("specie") is not None:
                mix = v
                break
    if not mix:
        raise KeyError("thermophysicalProperties: no mixture dictionary")
    specie = mix.subdict("specie")
    thermo_d = mix.subdict("thermodynamics")
    trans = mix.subdict("transport")

    sutherland = transport == "sutherland" or trans.lookup("As") is not None
    return PerfectGasThermo(
        mol_weight=specie.scalar("molWeight"),
        cp=thermo_d.scalar("Cp", 0.0) or
        (thermo_d.scalar("Cv", 0.0)
         + R_UNIVERSAL / specie.scalar("molWeight")),
        hf=thermo_d.scalar("Hf", 0.0),
        mu0=trans.scalar("mu", 0.0),
        pr=trans.scalar("Pr", 1.0),
        sutherland=sutherland,
        as_=trans.scalar("As", 0.0),
        ts=trans.scalar("Ts", 0.0),
        energy=energy,
    )


class PsiThermo:
    """Field-level thermo (reference: hePsiThermo): owns T and p-coupled
    property evaluation; the solved energy field's BCs are derived from
    T's BC structure."""

    def __init__(self, case, thermo: PerfectGasThermo):
        self.case = case
        self.model = thermo

    def he_field(self, mesh, T: VolField, name="e") -> VolField:
        """Energy field with BCs mirroring T's (fixed T -> fixed he,
        gradient-type -> zeroGradient)."""
        from ..fields.bcs import Empty, FixedValue, make_bc
        m = self.model
        bcs, bcdata = [], []
        for i, (bc, bd) in enumerate(zip(T.bcs, T.bcdata)):
            if isinstance(bc, Empty):
                bcs.append(make_bc("empty", i))
                bcdata.append({})
            elif isinstance(bc, FixedValue):
                bcs.append(make_bc("fixedValue", i))
                bcdata.append({"value": m.he_from_t(bd["value"])})
            else:
                bcs.append(make_bc("zeroGradient", i))
                bcdata.append({})
        from ..utils.dimensions import dim_specific_energy
        he = VolField(m.he_from_t(T.data), m.he_from_t(T.bvalues),
                      tuple(bcs), dim_specific_energy, name, tuple(bcdata))
        return he.correct_boundary_conditions(mesh)

    def update_t(self, mesh, T: VolField, he: VolField) -> VolField:
        """thermo.correct(): T from the solved energy."""
        m = self.model
        T2 = T.replace(data=m.t_from_he(he.data))
        return T2.correct_boundary_conditions(mesh)


# ---------------------------------------------------------------------------
# Per-phase rho-thermo (compressibleInterFoam / multiphase thermo stacks)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class PhaseRhoThermo:
    """rhoThermo for one phase (reference: src/thermophysicalModels/basic/
    rhoThermo + specie EoS stack equationOfState/{perfectGas,perfectFluid,
    rhoConst}): density/compressibility as closed-form functions of (p, T)
    instead of per-cell virtual dispatch."""
    eos: str                # perfectGas | perfectFluid | rhoConst
    mol_weight: float
    cp: float
    hf: float = 0.0
    mu0: float = 0.0
    pr: float = 1.0
    r_eos: float = 0.0      # perfectFluid R
    rho0: float = 0.0       # perfectFluid/rhoConst
    sutherland: bool = False
    as_: float = 0.0
    ts: float = 0.0

    @property
    def r(self) -> float:
        return R_UNIVERSAL / self.mol_weight

    @property
    def cv(self) -> float:
        # CpMCv: specific gas constant for gas-like EoS, 0 for rhoConst
        # (reference: specie equationOfState CpMCv implementations)
        if self.eos == "perfectGas":
            return self.cp - self.r
        if self.eos == "perfectFluid":
            return self.cp - self.r_eos
        return self.cp

    def psi(self, T):
        """Compressibility drho/dp at constant T."""
        if self.eos == "perfectGas":
            return 1.0 / (self.r * jnp.maximum(T, 1e-10))
        if self.eos == "perfectFluid":
            return 1.0 / (self.r_eos * jnp.maximum(T, 1e-10))
        return jnp.zeros_like(T)

    def rho(self, p, T):
        if self.eos == "perfectGas":
            return p / (self.r * jnp.maximum(T, 1e-10))
        if self.eos == "perfectFluid":
            return p / (self.r_eos * jnp.maximum(T, 1e-10)) + self.rho0
        return jnp.full_like(T, self.rho0)

    def mu(self, T):
        if self.sutherland:
            return self.as_ * jnp.sqrt(T) / (1.0 + self.ts / T)
        return self.mu0

    def alpha_h(self, T):
        """kappa/Cp (thermal diffusivity * rho)."""
        return self.mu(T) / self.pr


def read_rho_thermo(props: Dictionary) -> PhaseRhoThermo:
    """Parse a thermophysicalProperties(.phase) dict into a
    PhaseRhoThermo (reference: rhoThermo::New + the thermoType dict)."""
    tt = props.lookup("thermoType", required=True)
    eos = "perfectGas"
    transport = "const"
    if isinstance(tt, Dictionary):
        eos = tt.word("equationOfState", "perfectGas")
        transport = tt.word("transport", "const")
    else:
        s = str(tt if not isinstance(tt, tuple) else tt[0])
        for cand in ("perfectFluid", "rhoConst", "perfectGas"):
            if cand in s:
                eos = cand
                break
        if "sutherland" in s:
            transport = "sutherland"
    mix = props.subdict("mixture", required=False)
    if not mix:
        for k, v in props.items():
            if isinstance(v, Dictionary) and v.lookup("specie") is not None:
                mix = v
                break
    if not mix:
        raise KeyError("thermophysicalProperties: no mixture dictionary")
    specie = mix.subdict("specie")
    thermo_d = mix.subdict("thermodynamics")
    trans = mix.subdict("transport")
    eqn = mix.subdict("equationOfState", required=False)
    mw = specie.scalar("molWeight")
    cp = thermo_d.scalar("Cp", 0.0) or (thermo_d.scalar("Cv", 0.0)
                                        + R_UNIVERSAL / mw)
    sutherland = transport == "sutherland" or trans.lookup("As") is not None
    return PhaseRhoThermo(
        eos=eos, mol_weight=mw, cp=cp, hf=thermo_d.scalar("Hf", 0.0),
        mu0=trans.scalar("mu", 0.0), pr=trans.scalar("Pr", 1.0),
        r_eos=(eqn.scalar("R", 0.0) if eqn else 0.0),
        rho0=(eqn.scalar("rho0", 0.0) or eqn.scalar("rho", 0.0)
              if eqn else 0.0),
        sutherland=sutherland, as_=trans.scalar("As", 0.0),
        ts=trans.scalar("Ts", 0.0))
