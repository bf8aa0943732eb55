"""Thermophysical models: the specie property stack + psi/rho thermo.

Capability surface of the reference's thermophysicalModels (reference:
src/thermophysicalModels/specie layered mixin stack thermo<transport<
EoS<specie>>> and basic/psiThermo/hePsiThermo.C:35-110): on TPU the whole
per-cell property evaluation is plain vectorized jnp math — the zip-
iterator thrust kernel becomes a fused elementwise expression.

Stack: EoS perfectGas / incompressiblePerfectGas / perfectFluid /
rhoConst / icoPolynomial / linear; thermodynamics hConst/eConst, janaf
(NASA-7 two-range), hPolynomial; transport const / sutherland /
polynomial; pureMixture; sensible/absolute enthalpy & internal energy.
(adiabaticPerfectFluid and PengRobinsonGas deferred: their psi depends
on p, which the psi-based solver loop does not thread yet.)
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


def read_thermo(props: Dictionary):
    """Parse constant/thermophysicalProperties (reference: basicThermo
    dictionary layout, both the 2.x thermoType-dict and string forms).
    Returns the generalized SpecieThermo stack (superset of the round-1
    PerfectGasThermo interface) whenever janaf/polynomial/extended-EoS
    features are requested; the plain perfect-gas bundle otherwise."""
    if _wants_general_stack(props):
        return read_specie_thermo(props)
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


def _wants_general_stack(props: Dictionary) -> bool:
    tt = props.lookup("thermoType", required=True)
    words = []
    if isinstance(tt, Dictionary):
        words = [tt.word("thermo", "hConst"),
                 tt.word("equationOfState", "perfectGas"),
                 tt.word("transport", "const")]
    else:
        words = [str(tt if not isinstance(tt, tuple) else tt[0])]
    blob = " ".join(words).lower()
    return any(k.lower() in blob for k in (
        "janaf", "hPolynomial", "polynomial", "icoPolynomial",
        "incompressiblePerfectGas", "perfectFluid", "rhoConst"))


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
        """thermo.correct(): T from the solved energy (the previous T
        seeds the Newton iteration of variable-Cp models)."""
        m = self.model
        try:
            data = m.t_from_he(he.data, T0=T.data)
        except TypeError:
            data = m.t_from_he(he.data)
        T2 = T.replace(data=data)
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
        # perfectFluid/rhoConst: cpMcv = 0 (reference:
        # perfectFluidI.H/rhoConstI.H cpMcv)
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


# ---------------------------------------------------------------------------
# generalized specie stack (reference: specie/thermo/{hConst,janaf,
# hPolynomial}, equationOfState/*, transport/{const,sutherland,polynomial})
# ---------------------------------------------------------------------------

def _polyval(coeffs, T):
    """Horner evaluation of sum_i c_i T^i (OpenFOAM Polynomial order)."""
    import numpy as np
    acc = jnp.zeros_like(T)
    for c in reversed(list(coeffs)):
        acc = acc * T + float(c)
    return acc


def _polyint(coeffs):
    """Antiderivative coefficients of sum_i c_i T^i (constant 0)."""
    return [0.0] + [float(c) / (i + 1) for i, c in enumerate(coeffs)]


@dataclass(frozen=True)
class SpecieThermo:
    """The full layered property stack as one frozen bundle of pure
    functions (reference: species::thermo<Thermo<EoS<specie>>>;
    janaf polynomials janafThermo.H, NASA-7). Drop-in superset of
    PerfectGasThermo: scalar .r/.cp/.cv/.gamma remain available (Cp
    evaluated at t_std for the variable-Cp models)."""
    mol_weight: float
    energy: str = "sensibleInternalEnergy"
    t_std: float = 298.15
    # -- thermodynamics --
    cp_mode: str = "const"            # const | janaf | polynomial
    cp0: float = 1005.0               # const-Cp [J/kg/K]
    hf: float = 0.0
    janaf_low: tuple = ()             # 7 NASA coeffs (mole basis * R)
    janaf_high: tuple = ()
    t_low: float = 200.0
    t_high: float = 5000.0
    t_common: float = 1000.0
    cp_poly: tuple = ()               # mass-basis Cp(T) polynomial
    # -- equation of state --
    eos: str = "perfectGas"
    p_ref: float = 1e5                # incompressiblePerfectGas pRef
    rho0: float = 0.0                 # rhoConst / perfectFluid
    r_eos: float = 0.0                # perfectFluid R
    rho_poly: tuple = ()              # icoPolynomial rhoCoeffs
    psi0: float = 0.0                 # linear EoS psi
    p0_apf: float = 1e5               # adiabaticPerfectFluid p0
    b_apf: float = 0.0                # adiabaticPerfectFluid B
    gamma_apf: float = 7.15           # adiabaticPerfectFluid gamma
    t_crit: float = 0.0               # PengRobinsonGas Tc
    p_crit: float = 1e5               # PengRobinsonGas Pc
    v_crit: float = 0.0               # PengRobinsonGas Vc
    z_crit: float = 1.0               # PengRobinsonGas Zc
    omega_acc: float = 0.0            # PengRobinsonGas acentric factor
    # -- transport --
    transport: str = "const"          # const | sutherland | polynomial
    mu0: float = 0.0
    pr: float = 1.0
    as_: float = 0.0
    ts: float = 0.0
    mu_poly: tuple = ()
    kappa_poly: tuple = ()

    # -- scalar conveniences ------------------------------------------------
    @property
    def r(self) -> float:
        return R_UNIVERSAL / self.mol_weight

    @property
    def cp(self) -> float:
        import numpy as np
        return float(np.asarray(self.cp_t(jnp.asarray(self.t_std))))

    @property
    def cv(self) -> float:
        return self.cp - self._cp_m_cv()

    @property
    def gamma(self) -> float:
        return self.cp / max(self.cv, 1e-30)

    def _cp_m_cv(self) -> float:
        """Cp - Cv by EoS (reference equationOfState CpMCv)."""
        if self.eos in ("perfectGas", "incompressiblePerfectGas"):
            return self.r
        if self.eos == "perfectFluid":
            # reference: perfectFluidI.H:cpMcv returns 0 (the EoS R is
            # a compressibility parameter, not a gas constant)
            return 0.0
        if self.eos == "PengRobinsonGas":
            import numpy as np
            z = np.asarray(self.z_pr(jnp.asarray(self.p_ref),
                                     jnp.asarray(self.t_std)))
            return float(self.r * z)
        return 0.0

    # -- thermodynamics -----------------------------------------------------
    def cp_t(self, T):
        if self.cp_mode == "janaf":
            a_lo = self.janaf_low
            a_hi = self.janaf_high
            cp_lo = _polyval(a_lo[:5], T)
            cp_hi = _polyval(a_hi[:5], T)
            return self.r * jnp.where(T < self.t_common, cp_lo, cp_hi)
        if self.cp_mode == "polynomial":
            return _polyval(self.cp_poly, T)
        return jnp.full_like(T, self.cp0) if hasattr(T, "shape") \
            else self.cp0

    def _ha(self, T):
        """Absolute enthalpy (janaf: R*T*(sum a_i T^i/(i+1)) + R*a5)."""
        if self.cp_mode == "janaf":
            def ha_of(a):
                return self.r * (T * _polyval(
                    [a[0], a[1] / 2, a[2] / 3, a[3] / 4, a[4] / 5], T)
                    + a[5])
            return jnp.where(T < self.t_common, ha_of(self.janaf_low),
                             ha_of(self.janaf_high))
        if self.cp_mode == "polynomial":
            return _polyval(_polyint(self.cp_poly), T) + self.hf
        return self.cp0 * T + self.hf

    def he_from_t(self, T):
        ha = self._ha(T)
        if self.energy == "absoluteEnthalpy":
            return ha
        hs = ha - self._ha(jnp.full_like(T, self.t_std) * 0 + self.t_std) \
            if hasattr(T, "shape") else ha - self._ha(self.t_std)
        if self.energy == "sensibleEnthalpy":
            return hs
        if self.energy == "absoluteInternalEnergy":
            return ha - self._cp_m_cv() * T
        return hs - self._cp_m_cv() * T      # sensibleInternalEnergy

    def t_from_he(self, he, T0=None):
        if self.cp_mode == "const":
            cmc = self._cp_m_cv()
            h_std = self.cp0 * self.t_std + self.hf
            if self.energy == "sensibleEnthalpy":
                return (he + h_std - self.hf) / self.cp0
            if self.energy == "absoluteEnthalpy":
                return (he - self.hf) / self.cp0
            if self.energy == "absoluteInternalEnergy":
                return (he - self.hf) / (self.cp0 - cmc)
            return (he + h_std - self.hf) / (self.cp0 - cmc)
        # variable Cp: Newton from the previous T (reference
        # thermo::T, janafThermo): 8 iterations suffice for NASA-7
        T = jnp.full_like(he, 1000.0) if T0 is None else T0
        cmc = self._cp_m_cv()
        with_e = self.energy in ("sensibleInternalEnergy",
                                 "absoluteInternalEnergy")
        for _ in range(8):
            f = self.he_from_t(T) - he
            fp = self.cp_t(T) - (cmc if with_e else 0.0)
            T = jnp.clip(T - f / jnp.maximum(fp, 1e-3), 10.0, 2e4)
        return T

    def nasa_g_rt(self, T):
        """Standard-state Gibbs energy g0/(Ru*T) from the NASA-7
        coefficients (reference: janafThermo s()/ha(); used for the
        equilibrium constants of reversible reactions). janaf only."""
        if self.cp_mode != "janaf":
            raise ValueError(
                "reversible-reaction equilibrium needs janaf thermo")

        def g_of(a):
            h_rt = _polyval([a[0], a[1] / 2, a[2] / 3, a[3] / 4,
                             a[4] / 5], T) + a[5] / T
            s_r = a[0] * jnp.log(T) + _polyval(
                [0.0, a[1], a[2] / 2, a[3] / 3, a[4] / 4], T) + a[6]
            return h_rt - s_r
        return jnp.where(T < self.t_common, g_of(self.janaf_low),
                         g_of(self.janaf_high))

    # -- equation of state --------------------------------------------------
    def z_pr(self, p, T):
        """Peng-Robinson compressibility factor Z(p, T) (reference:
        equationOfState/PengRobinsonGas/PengRobinsonGasI.H:Z — largest
        real root of the PR cubic, branchless for jit)."""
        r = self.r
        a = 0.45724 * r ** 2 * self.t_crit ** 2 / self.p_crit
        b = 0.07780 * r * self.t_crit / self.p_crit
        tr = T / self.t_crit
        kappa = 0.37464 + 1.54226 * self.omega_acc \
            - 0.26992 * self.omega_acc ** 2
        alpha = (1.0 + kappa * (1.0 - jnp.sqrt(tr))) ** 2
        B = b * p / (r * T)
        A = a * alpha * p / (r * T) ** 2
        a2 = B - 1.0
        a1 = A - 2.0 * B - 3.0 * B ** 2
        a0 = -A * B + B ** 2 + B ** 3
        Q = (3.0 * a1 - a2 * a2) / 9.0
        Rl = (9.0 * a2 * a1 - 27.0 * a0 - 2.0 * a2 ** 3) / 54.0
        D = Q ** 3 + Rl ** 2
        # D <= 0: three real roots, take the largest
        q3 = jnp.minimum(Q ** 3, 0.0)
        th = jnp.arccos(jnp.clip(
            Rl / jnp.sqrt(jnp.maximum(-q3, 1e-300)), -1.0, 1.0))
        qm = 2.0 * jnp.sqrt(jnp.maximum(-Q, 0.0))
        r3 = jnp.maximum(
            qm * jnp.cos(th / 3.0),
            jnp.maximum(qm * jnp.cos((th + 2.0 * jnp.pi) / 3.0),
                        qm * jnp.cos((th + 4.0 * jnp.pi) / 3.0))) \
            - a2 / 3.0
        # D > 0: one real root
        d05 = jnp.sqrt(jnp.maximum(D, 0.0))
        r1 = jnp.cbrt(Rl + d05) + jnp.cbrt(Rl - d05) - a2 / 3.0
        return jnp.maximum(jnp.where(D <= 0.0, r3, r1), 1e-3)

    def psi(self, T, p=None):
        if self.eos == "perfectGas":
            return 1.0 / (self.r * jnp.maximum(T, 1e-10))
        if self.eos == "perfectFluid":
            return 1.0 / (self.r_eos * jnp.maximum(T, 1e-10))
        if self.eos == "linear":
            # rho = psi0*p + rho0 -> drho/dp = psi0 (sonicLiquidFoam's
            # barotropic liquid, reference equationOfState/linear)
            return jnp.full_like(T, self.psi0)
        if self.eos == "adiabaticPerfectFluid":
            # psi = drho/dp (reference adiabaticPerfectFluidI.H:117)
            pv = self.p0_apf if p is None else p
            base = (pv + self.b_apf) / (self.p0_apf + self.b_apf)
            return (self.rho0 / (self.gamma_apf
                                 * (self.p0_apf + self.b_apf))
                    * base ** (1.0 / self.gamma_apf - 1.0)) \
                * jnp.ones_like(T)
        if self.eos == "PengRobinsonGas":
            pv = self.p_ref if p is None else p
            z = self.z_pr(pv, jnp.maximum(T, 1e-10))
            return 1.0 / (z * self.r * jnp.maximum(T, 1e-10))
        return jnp.zeros_like(T)

    def rho(self, p, T):
        if self.eos == "perfectGas":
            return p / (self.r * jnp.maximum(T, 1e-10))
        if self.eos == "incompressiblePerfectGas":
            return self.p_ref / (self.r * jnp.maximum(T, 1e-10))
        if self.eos == "perfectFluid":
            return p / (self.r_eos * jnp.maximum(T, 1e-10)) + self.rho0
        if self.eos == "icoPolynomial":
            return _polyval(self.rho_poly, T)
        if self.eos == "linear":
            return self.psi0 * p + self.rho0
        if self.eos == "adiabaticPerfectFluid":
            # rho0*((p + B)/(p0 + B))^(1/gamma) (reference
            # adiabaticPerfectFluidI.H:105-111)
            base = (p + self.b_apf) / (self.p0_apf + self.b_apf)
            return self.rho0 * jnp.maximum(base, 1e-10) \
                ** (1.0 / self.gamma_apf) * jnp.ones_like(T)
        if self.eos == "PengRobinsonGas":
            z = self.z_pr(p, jnp.maximum(T, 1e-10))
            return p / (z * self.r * jnp.maximum(T, 1e-10))
        return jnp.full_like(T, self.rho0)   # rhoConst

    def c_sound(self, T):
        g = self.gamma
        if self.eos == "perfectGas":
            return jnp.sqrt(g * self.r * jnp.maximum(T, 1e-10))
        if self.eos == "perfectFluid":
            return jnp.sqrt(g * self.r_eos * jnp.maximum(T, 1e-10))
        if self.eos == "PengRobinsonGas":
            z = self.z_pr(self.p_ref, jnp.maximum(T, 1e-10))
            return jnp.sqrt(g * z * self.r * jnp.maximum(T, 1e-10))
        return jnp.full_like(T, 1e3)

    # -- transport ----------------------------------------------------------
    def mu(self, T):
        if self.transport == "sutherland":
            return self.as_ * jnp.sqrt(T) / (1.0 + self.ts / T)
        if self.transport == "polynomial":
            return _polyval(self.mu_poly, T)
        return self.mu0 if not hasattr(T, "shape") \
            else jnp.full_like(T, self.mu0)

    def alpha_h(self, T):
        """kappa/Cp for the energy equation diffusion."""
        if self.transport == "polynomial" and self.kappa_poly:
            return _polyval(self.kappa_poly, T) / self.cp_t(T)
        return self.mu(T) / self.pr


def read_specie_thermo(props: Dictionary) -> SpecieThermo:
    """Parse constant/thermophysicalProperties into the generalized
    stack (reference: basicThermo::New thermoType dispatch)."""
    tt = props.lookup("thermoType", required=True)
    energy = "sensibleInternalEnergy"
    transport = "const"
    thermo_name = "hConst"
    eos = "perfectGas"
    if isinstance(tt, Dictionary):
        energy = tt.word("energy", "sensibleInternalEnergy")
        transport = tt.word("transport", "const")
        thermo_name = tt.word("thermo", "hConst")
        eos = tt.word("equationOfState", "perfectGas")
    else:
        sname = str(tt if not isinstance(tt, tuple) else tt[0])
        low = sname.lower()
        energy = "sensibleEnthalpy" if low.startswith("h") \
            else "sensibleInternalEnergy"
        for cand in ("sutherland", "polynomial", "const"):
            if cand.lower() in low:
                transport = cand
                break
        for cand in ("janaf", "hPolynomial"):
            if cand.lower() in low:
                thermo_name = cand
        for cand in ("incompressiblePerfectGas", "adiabaticPerfectFluid",
                     "PengRobinsonGas", "perfectFluid", "rhoConst",
                     "icoPolynomial", "perfectGas"):
            if cand.lower() in low:
                eos = cand
                break

    mix = props.subdict("mixture", required=False)
    if not mix:
        for k, v in props.items():
            if isinstance(v, Dictionary) \
                    and v.lookup("specie") is not None:
                mix = v
                break
    if not mix:
        raise KeyError("thermophysicalProperties: no mixture dictionary")
    return specie_from_mixture_dict(mix, energy=energy,
                                    transport=transport,
                                    thermo_name=thermo_name, eos=eos)


def specie_from_mixture_dict(mix: Dictionary, *, energy, transport,
                             thermo_name, eos) -> SpecieThermo:
    """Build one SpecieThermo from a specie/thermodynamics/transport
    subdict bundle (one entry of a multiComponentMixture, or the single
    pureMixture dict)."""
    specie = mix.subdict("specie")
    th = mix.subdict("thermodynamics")
    tr = mix.subdict("transport")
    eq = mix.subdict("equationOfState", required=False) or Dictionary()
    mw = specie.scalar("molWeight")

    kw = dict(mol_weight=mw, energy=energy, eos=eos)

    def tuple_of(d, key):
        v = d.lookup(key)
        if v is None:
            return ()
        if isinstance(v, (int, float)):
            return (float(v),)
        return tuple(float(x) for x in v)

    if th.lookup("highCpCoeffs") is not None or thermo_name == "janaf":
        kw.update(cp_mode="janaf",
                  janaf_low=tuple_of(th, "lowCpCoeffs"),
                  janaf_high=tuple_of(th, "highCpCoeffs"),
                  t_low=th.scalar("Tlow", 200.0),
                  t_high=th.scalar("Thigh", 5000.0),
                  t_common=th.scalar("Tcommon", 1000.0))
    elif th.lookup("CpCoeffs<8>") is not None \
            or th.lookup("CpCoeffs") is not None:
        kw.update(cp_mode="polynomial",
                  cp_poly=(tuple_of(th, "CpCoeffs<8>")
                           or tuple_of(th, "CpCoeffs")),
                  hf=th.scalar("Hf", 0.0))
    else:
        cp = th.scalar("Cp", 0.0) or (th.scalar("Cv", 0.0)
                                      + R_UNIVERSAL / mw)
        kw.update(cp_mode="const", cp0=cp, hf=th.scalar("Hf", 0.0))

    if tr.lookup("muCoeffs<8>") is not None \
            or tr.lookup("muCoeffs") is not None:
        kw.update(transport="polynomial",
                  mu_poly=(tuple_of(tr, "muCoeffs<8>")
                           or tuple_of(tr, "muCoeffs")),
                  kappa_poly=(tuple_of(tr, "kappaCoeffs<8>")
                              or tuple_of(tr, "kappaCoeffs")))
    elif transport == "sutherland" or tr.lookup("As") is not None:
        kw.update(transport="sutherland", as_=tr.scalar("As", 0.0),
                  ts=tr.scalar("Ts", 0.0), pr=tr.scalar("Pr", 1.0))
    else:
        kw.update(transport="const", mu0=tr.scalar("mu", 0.0),
                  pr=tr.scalar("Pr", 1.0))

    kw.update(p_ref=eq.scalar("pRef", 1e5),
              rho0=(eq.scalar("rho0", 0.0) or eq.scalar("rho", 0.0)),
              r_eos=eq.scalar("R", 0.0),
              rho_poly=(tuple_of(eq, "rhoCoeffs<8>")
                        or tuple_of(eq, "rhoCoeffs")),
              psi0=eq.scalar("psi", 0.0),
              p0_apf=eq.scalar("p0", 1e5),
              b_apf=eq.scalar("B", 0.0),
              gamma_apf=eq.scalar("gamma", 7.15),
              t_crit=eq.scalar("Tc", 0.0),
              p_crit=eq.scalar("Pc", 1e5),
              v_crit=eq.scalar("Vc", 0.0),
              z_crit=eq.scalar("Zc", 1.0),
              omega_acc=eq.scalar("omega", 0.0))
    return SpecieThermo(**kw)
