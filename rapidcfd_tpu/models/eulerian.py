"""Eulerian two-fluid framework: phase models + interfacial exchange.

Capability surface of the reference's twoPhaseSystem stack (reference:
applications/solvers/multiphase/twoPhaseEulerFoam/twoPhaseSystem/
twoPhaseSystem.C:59-130 construction from constant/phaseProperties,
interfacialModels/{dragModels,virtualMassModels,heatTransferModels,
liftModels}): per-phase volume fraction/velocity/thermo plus
runtime-selected interfacial closure models. On TPU every closure is a
fused elementwise expression over cell arrays — the per-cell virtual
dispatch of the reference collapses into branch-free jnp math.

Drag laws implemented: SchillerNaumann, WenYu, Ergun,
GidaspowErgunWenYu, constantCd (reference:
interfacialModels/dragModels/{SchillerNaumann/SchillerNaumann.C:
Cd = 24/Re(1+0.15 Re^0.687), WenYu, Ergun, GidaspowErgunWenYu}).
Virtual mass: constantCoefficient. Heat transfer: RanzMarshall
(Nu = 2 + 0.6 Re^1/2 Pr^1/3). Lift: constantCoefficient / none.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from ..utils.dictionary import Dictionary

_SMALL = 1e-30


@dataclass(frozen=True)
class PhaseSpec:
    """Static description of one Eulerian phase (reference: phaseModel.C:
    diameterModel + alphaMax + per-phase thermo)."""
    name: str
    d: float                    # constant diameter
    alpha_max: float = 1.0
    residual_alpha: float = 1e-6


def _re(rho_c, mu_c, d, ur_mag):
    """Slip Reynolds number of the dispersed phase."""
    return jnp.maximum(rho_c * ur_mag * d / jnp.maximum(mu_c, _SMALL),
                       1e-3)


def drag_k(model: str, coeffs: Dictionary | None, alpha_d, rho_c, mu_c,
           d, ur_mag):
    """Momentum-exchange coefficient K [kg/m3/s] so that the drag force
    on the dispersed phase is K*(U_c - U_d) (reference: dragModel::K —
    0.75*Cd*alphaD*rhoC*|ur|/d for sphere-drag laws)."""
    re = _re(rho_c, mu_c, d, ur_mag)
    a = jnp.maximum(alpha_d, 1e-6)
    if model == "SchillerNaumann":
        cd = jnp.where(re <= 1000.0,
                       24.0 / re * (1.0 + 0.15 * re ** 0.687), 0.44)
        return 0.75 * cd * a * rho_c * ur_mag / d
    if model == "WenYu":
        # voidage-corrected Schiller-Naumann (reference: WenYu.C)
        a2 = jnp.maximum(1.0 - alpha_d, 1e-6)
        res = a2 * re
        cd = jnp.where(res <= 1000.0,
                       24.0 / res * (1.0 + 0.15 * res ** 0.687), 0.44)
        return 0.75 * cd * a * rho_c * ur_mag / d * a2 ** -2.65
    if model == "Ergun":
        # dense packed-bed drag (reference: Ergun.C)
        a2 = jnp.maximum(1.0 - alpha_d, 1e-6)
        return (150.0 * a / a2 * mu_c / (d * d)
                + 1.75 * rho_c * ur_mag / d) * a
    if model == "GidaspowErgunWenYu":
        # Ergun for alpha_c < 0.8, WenYu otherwise (reference:
        # GidaspowErgunWenYu.C)
        k_e = drag_k("Ergun", coeffs, alpha_d, rho_c, mu_c, d, ur_mag)
        k_w = drag_k("WenYu", coeffs, alpha_d, rho_c, mu_c, d, ur_mag)
        return jnp.where(1.0 - alpha_d < 0.8, k_e, k_w)
    if model == "constantCd":
        cd = float(coeffs.scalar("Cd", 0.44)) if coeffs else 0.44
        return 0.75 * cd * a * rho_c * ur_mag / d
    raise ValueError(f"unknown drag model '{model}'")


def virtual_mass_coeff(model: str, coeffs: Dictionary | None, alpha_d,
                       rho_c):
    """Virtual-mass coefficient Cvm*alphaD*rhoC (reference:
    virtualMassModels/constantVirtualMassCoefficient)."""
    if model in ("none", None):
        return jnp.zeros_like(alpha_d)
    if model in ("constantCoefficient", "constantVirtualMassCoefficient"):
        cvm = float(coeffs.scalar("Cvm", 0.5)) if coeffs else 0.5
        return cvm * alpha_d * rho_c
    raise ValueError(f"unknown virtual mass model '{model}'")


def heat_transfer_coeff(model: str, alpha_d, rho_c, mu_c, kappa_c, pr_c,
                        d, ur_mag):
    """Volumetric heat transfer coefficient [W/m3/K] (reference:
    heatTransferModels/RanzMarshall: Nu = 2 + 0.6 Re^0.5 Pr^(1/3),
    K = 6 alphaD kappaC Nu / d^2)."""
    if model in ("none", None):
        return jnp.zeros_like(alpha_d)
    re = _re(rho_c, mu_c, d, ur_mag)
    if model == "RanzMarshall":
        nu = 2.0 + 0.6 * jnp.sqrt(re) * pr_c ** (1.0 / 3.0)
        return 6.0 * jnp.maximum(alpha_d, 1e-6) * kappa_c * nu / (d * d)
    if model == "constantNu":
        return 6.0 * jnp.maximum(alpha_d, 1e-6) * kappa_c * 2.0 / (d * d)
    raise ValueError(f"unknown heat transfer model '{model}'")


def lift_force(model: str, coeffs: Dictionary | None, alpha_d, rho_c,
               ur, curl_uc):
    """Lift force on the dispersed phase Cl*rhoC*alphaD*(ur x curl Uc)
    (reference: liftModels/constantLiftCoefficient)."""
    if model in ("none", None):
        return jnp.zeros_like(ur)
    if model in ("constantCoefficient", "constantLiftCoefficient"):
        cl = float(coeffs.scalar("Cl", 0.5)) if coeffs else 0.5
        return (cl * alpha_d * rho_c)[:, None] * jnp.cross(ur, curl_uc)
    raise ValueError(f"unknown lift model '{model}'")


def read_phase_properties(props: Dictionary):
    """Parse constant/phaseProperties (reference: twoPhaseSystem.C:59-130
    + BlendedInterfacialModel pair-keyed model dicts). Returns
    (names [dispersed, continuous-as-listed], specs, closures dict)."""
    phases = [str(x) for x in props.lookup("phases", required=True)]
    specs = []
    for name in phases:
        pd = props.subdict(name, required=False) or Dictionary()
        # diameterModel is a word ('constant'/'isothermal') with a
        # sibling constantCoeffs/isothermalCoeffs subdict (reference:
        # twoPhaseSystem/diameterModels)
        d = None
        cd = pd.subdict("constantCoeffs", required=False) \
            or pd.subdict("isothermalCoeffs", required=False)
        if cd:
            from ..fields.field import Dimensioned
            d = Dimensioned.from_entry(cd.lookup("d", required=True)).value
        if d is None:
            d = 1e-3
        specs.append(PhaseSpec(
            name=name, d=float(d),
            alpha_max=float(pd.scalar("alphaMax", 1.0)),
            residual_alpha=float(pd.scalar("residualAlpha", 1e-6))))

    def pair_model(key, default="none"):
        """Model entry keyed '(phase1 in phase2)' or plain subdict."""
        e = props.lookup(key, required=False)
        if e is None:
            return default, None
        if isinstance(e, Dictionary):
            # either {type X; ...} or {"(a in b)" {type X;}}
            t = e.lookup("type", required=False)
            if t is not None:
                return str(t), e
            for k, v in e.items():
                if isinstance(v, Dictionary):
                    t2 = v.lookup("type", required=False)
                    if t2 is not None:
                        return str(t2), v
        if isinstance(e, (list, tuple)) and e:
            return str(e[0]), None
        return str(e), None

    closures = dict(
        drag=pair_model("drag", "SchillerNaumann"),
        virtual_mass=pair_model("virtualMass", "none"),
        heat_transfer=pair_model("heatTransfer", "RanzMarshall"),
        lift=pair_model("lift", "none"),
        turbulent_dispersion=pair_model("turbulentDispersion", "none"),
        wall_lubrication=pair_model("wallLubrication", "none"),
    )
    return phases, specs, closures
