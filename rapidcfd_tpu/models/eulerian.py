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
           d, ur_mag, *, rho_d=None, sigma=0.07, g_mag=9.81):
    """Momentum-exchange coefficient K [kg/m3/s] so that the drag force
    on the dispersed phase is K*(U_c - U_d) (reference: dragModel::K —
    0.75*Cd*alphaD*rhoC*|ur|/d for sphere-drag laws; equivalently
    0.75*CdRe*alphaD*muC/d^2 for the CdRe-form laws). rho_d/sigma/g_mag
    feed the Eotvos number of the bubble-drag laws (Tomiyama*)."""
    re = _re(rho_c, mu_c, d, ur_mag)
    a = jnp.maximum(alpha_d, 1e-6)
    a2 = jnp.maximum(1.0 - alpha_d, 1e-6)

    def from_cdre(cdre):
        return 0.75 * cdre * a * mu_c / (d * d)

    if model == "SchillerNaumann":
        # CdRe form: K = 0.75*CdRe*a*muC/d^2 — exact for all Re and
        # Stokes-correct at ur -> 0 (K -> 18 mu a / d^2). The cd*|ur|
        # form with a floored Re loses the Stokes limit: K -> 0 as
        # ur -> 0, leaving the dilute dispersed-phase momentum singular
        # (freeboard rAU blow-up in packed-bed cases).
        cdre = jnp.where(re <= 1000.0,
                         24.0 * (1.0 + 0.15 * re ** 0.687), 0.44 * re)
        return from_cdre(cdre)
    if model == "WenYu":
        # voidage-corrected Schiller-Naumann (reference: WenYu.C —
        # CdsRe(Re) * alpha_c^-2.65 * alpha_c)
        cdsre = jnp.where(re <= 1000.0,
                          24.0 * (1.0 + 0.15 * re ** 0.687), 0.44 * re)
        return from_cdre(cdsre * a2 ** -1.65)
    if model == "Ergun":
        # dense packed-bed drag (reference: Ergun.C)
        return (150.0 * a / a2 * mu_c / (d * d)
                + 1.75 * rho_c * ur_mag / d) * a
    if model == "GidaspowErgunWenYu":
        # Ergun for alpha_c < 0.8, WenYu otherwise (reference:
        # GidaspowErgunWenYu.C)
        k_e = drag_k("Ergun", coeffs, alpha_d, rho_c, mu_c, d, ur_mag)
        k_w = drag_k("WenYu", coeffs, alpha_d, rho_c, mu_c, d, ur_mag)
        return jnp.where(1.0 - alpha_d < 0.8, k_e, k_w)
    if model == "GidaspowSchillerNaumann":
        # SchillerNaumann at the voidage-scaled Re with an a2^-2.65
        # correction (reference: GidaspowSchillerNaumann.C:CdRe)
        res = a2 * re
        cdsre = jnp.where(res <= 1000.0,
                          24.0 * (1.0 + 0.15 * res ** 0.687) / a2,
                          0.44 * jnp.maximum(res, 1e-3))
        return from_cdre(cdsre * a2 ** -2.65 * a2)
    if model == "SyamlalOBrien":
        # terminal-velocity correlation Vr (reference: SyamlalOBrien.C)
        A = a2 ** 4.14
        B = jnp.where(a2 < 0.85, 0.8 * a2 ** 1.28, a2 ** 2.65)
        vr = 0.5 * (A - 0.06 * re + jnp.sqrt(
            (0.06 * re) ** 2 + 0.12 * re * (2.0 * B - A) + A * A))
        vr = jnp.maximum(vr, 1e-6)
        cdsre = (0.63 * jnp.sqrt(re) + 4.8 * jnp.sqrt(vr)) ** 2
        return from_cdre(cdsre * a2 / (vr * vr))
    if model == "Gibilaro":
        # (reference: Gibilaro.C:CdRe)
        return from_cdre((4.0 / 3.0) * (17.3 / a2 + 0.336 * re)
                         * a2 ** -1.8)
    if model == "Lain":
        # piecewise bubble drag (reference: Lain.C:CdRe)
        cdre = jnp.where(
            re < 1.5, 16.0,
            jnp.where(re < 80.0, 14.9 * re ** 0.22,
                      jnp.where(re < 1500.0,
                                48.0 * (1.0 - 2.21
                                        / jnp.sqrt(jnp.maximum(re,
                                                               1e-6))),
                                2.61 * re)))
        return from_cdre(cdre)
    if model in ("TomiyamaAnalytic", "TomiyamaCorrelated"):
        drho = jnp.abs((rho_d if rho_d is not None else 2.0 * rho_c)
                       - rho_c)
        eo = jnp.maximum(drho * g_mag * d * d / max(sigma, 1e-30), 1e-3)
        if model == "TomiyamaCorrelated":
            # (reference: TomiyamaCorrelated.C:CdRe; A=24 pure system)
            A = float(coeffs.scalar("A", 24.0)) if coeffs else 24.0
            cdre = jnp.maximum(
                A * jnp.minimum(1.0 + 0.15 * re ** 0.687, 3.0),
                8.0 * eo * re / (3.0 * eo + 12.0))
            return from_cdre(cdre)
        # TomiyamaAnalytic.C:CdRe with aspect ratio E (constant; the
        # reference takes it from the pair's aspectRatio model)
        E = float(coeffs.scalar("E", 1.0)) if coeffs else 1.0
        res_e = 1e-2
        E = max(min(E, 1.0 - 1e-6), res_e)
        om_esq = max(1.0 - E * E, res_e * res_e)
        rt = om_esq ** 0.5
        import math
        F = max(math.asin(rt) - E * rt, res_e) / om_esq
        cdre = ((8.0 / 3.0) * eo
                / (eo * E ** (2.0 / 3.0) / om_esq + 16.0 * E ** (4.0 / 3.0))
                / (F * F) * jnp.maximum(re, 1e-3))
        return from_cdre(cdre)
    if model == "constantCd":
        cd = float(coeffs.scalar("Cd", 0.44)) if coeffs else 0.44
        return 0.75 * cd * a * rho_c * ur_mag / d
    raise ValueError(f"unknown drag model '{model}'")


def segregated_drag_k(mesh, coeffs: Dictionary | None, alpha1, alpha2,
                      rho1, rho2, nu1, nu2, ur_mag,
                      residual_alpha=1e-3):
    """Segregated-flow drag (reference: segregated.C:K): an interface-
    located friction K = lambda*|grad I|^2*muI with lambda = m*ReI +
    n*muAlphaI/muI, used for the `segregated` entry of blended drag.
    Needs the mesh for grad(I) and the phase-fraction interface metric."""
    import jax.numpy as _jnp
    from ..ops import fvc
    m_c = float(coeffs.scalar("m", 1.0)) if coeffs else 1.0
    n_c = float(coeffs.scalar("n", 8.0)) if coeffs else 8.0
    L = _jnp.cbrt(mesh.V)
    I = alpha1 / _jnp.maximum(alpha1 + alpha2, residual_alpha)
    from ..fields.field import VolField
    from ..fields.bcs import make_bc
    from ..utils.dimensions import dimless
    f = VolField(I, _jnp.zeros(mesh.n_boundary, I.dtype),
                 tuple(make_bc("zeroGradient", i)
                       for i in range(len(mesh.patches))),
                 dimless, "I", tuple({} for _ in mesh.patches)
                 ).correct_boundary_conditions(mesh)
    grad_i = fvc.grad(mesh, f).data
    mag_grad_i = _jnp.maximum(
        _jnp.linalg.norm(grad_i, axis=-1), residual_alpha / L)
    mu1 = rho1 * nu1
    mu2 = rho2 * nu2
    mu_i = mu1 * mu2 / _jnp.maximum(mu1 + mu2, 1e-30)
    mu_alpha_i = alpha1 * mu1 * alpha2 * mu2 \
        / _jnp.maximum(alpha1 * mu1 + alpha2 * mu2, 1e-30)
    rho_pair = alpha1 * rho1 + alpha2 * rho2
    re_i = rho_pair * ur_mag / (mag_grad_i * mu_i)
    lam = m_c * re_i + n_c * mu_alpha_i / mu_i
    return lam * mag_grad_i * mag_grad_i * mu_i


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


def cd_re(k_drag, alpha_d, mu_c, d):
    """CdRe recovered from the drag coefficient K = 0.75 Cd alphaD
    rhoC |ur|/d (reference: dragModel::CdRe vs dragModel::K): CdRe =
    Cd*Re = K d^2 / (0.75 alphaD muC)."""
    return k_drag * d * d / (0.75 * jnp.maximum(alpha_d, 1e-6) * mu_c)


def lift_force_full(model: str, coeffs, alpha_d, rho_c, rho_d, ur,
                    curl_uc, mu_c, d, sigma=0.07, g_mag=9.81):
    """Lift force on the dispersed phase (reference: liftModels/
    liftModel.C:61-70 F = Cl alphaD rhoC (Ur x curl Uc); TomiyamaLift.C
    Eo_H-correlated coefficient)."""
    if model in ("none", None):
        return jnp.zeros_like(ur)
    if model in ("constantCoefficient", "constantLiftCoefficient"):
        cl = float(coeffs.scalar("Cl", 0.5)) if coeffs else 0.5
        cl = jnp.asarray(cl)
    elif model == "Tomiyama":
        # TomiyamaLift.C: Eo with horizontal diameter dH
        ur_mag = jnp.linalg.norm(ur, axis=-1) + 1e-12
        eo = g_mag * jnp.abs(rho_c - rho_d) * d * d \
            / jnp.maximum(sigma, 1e-12)
        dh = d * (1.0 + 0.163 * eo ** 0.757) ** (1.0 / 3.0)
        eoh = g_mag * jnp.abs(rho_c - rho_d) * dh * dh \
            / jnp.maximum(sigma, 1e-12)
        re = _re(rho_c, mu_c, d, ur_mag)
        f_eoh = (0.00105 * eoh ** 3 - 0.0159 * eoh ** 2
                 - 0.0204 * eoh + 0.474)
        cl = jnp.where(
            eoh <= 4.0,
            jnp.minimum(0.288 * jnp.tanh(0.121 * re), f_eoh),
            jnp.where(eoh <= 10.0, f_eoh, -0.27))
    else:
        raise ValueError(f"unknown lift model '{model}'")
    return (cl * alpha_d * rho_c)[..., None] * jnp.cross(ur, curl_uc)


def wall_lubrication_force(model: str, coeffs, alpha_d, rho_c, rho_d,
                           ur, d, y_wall, n_wall, sigma=0.07,
                           g_mag=9.81):
    """Wall-lubrication force on the dispersed phase (reference:
    wallLubricationModels/Antal/Antal.C:70-86 and Frank/Frank.C:71-96).
    n_wall points TOWARD the nearest wall (the propagated wall-face
    normal of wallDistReflection); the solver applies -F to the
    dispersed momentum, i.e. away from the wall."""
    if model in ("none", None):
        return jnp.zeros_like(ur)
    ur_t = ur - (ur * n_wall).sum(-1, keepdims=True) * n_wall
    magsq_urt = (ur_t * ur_t).sum(-1)
    y = jnp.maximum(y_wall, 1e-8)
    if model == "Antal":
        cw1 = float(coeffs.scalar("Cw1", -0.01)) if coeffs else -0.01
        cw2 = float(coeffs.scalar("Cw2", 0.05)) if coeffs else 0.05
        coef = jnp.maximum(cw1 / d + cw2 / y, 0.0)
    elif model == "Frank":
        cwd = float(coeffs.scalar("Cwd", 6.8)) if coeffs else 6.8
        cwc = float(coeffs.scalar("Cwc", 10.0)) if coeffs else 10.0
        pexp = float(coeffs.scalar("p", 1.7)) if coeffs else 1.7
        eo = g_mag * jnp.abs(rho_c - rho_d) * d * d \
            / jnp.maximum(sigma, 1e-12)
        cwl = (jnp.where((eo > 1.0) & (eo <= 5.0),
                         jnp.exp(-0.933 * eo + 0.179), 0.0)
               + jnp.where((eo > 5.0) & (eo <= 33.0),
                           0.00599 * eo - 0.0187, 0.0)
               + jnp.where(eo > 33.0, 0.179, 0.0))
        y_t = y / (cwc * d)
        coef = cwl * jnp.maximum(
            (1.0 - y_t) / (cwd * y * jnp.maximum(y_t, 1e-8)
                           ** (pexp - 1.0)), 0.0)
    else:
        raise ValueError(f"unknown wall lubrication model '{model}'")
    return (coef * alpha_d * rho_c * magsq_urt)[..., None] * n_wall


def turbulent_dispersion_force(model: str, coeffs, alpha_d, rho_c,
                               nu_c, nut_c, d, cdre, grad_alpha_d,
                               grad_alpha_c=None, residual_alpha=1e-3):
    """Turbulent-dispersion force on the dispersed phase (reference:
    turbulentDispersionModels/Gosman/Gosman.C:73-97
    F = 0.75 CdRe alphaD nuC nutC/(sigma d^2) rhoC grad(alphaD);
    Burns/Burns.C:73-99 with -grad(alphaC)(1+alphaD/max(alphaC,res)))."""
    if model in ("none", None):
        return jnp.zeros_like(grad_alpha_d)
    sigma = float(coeffs.scalar("sigma", 0.9)) if coeffs else 0.9
    pref = 0.75 * cdre * alpha_d * nu_c * nut_c / (sigma * d * d) \
        * rho_c
    if model == "Gosman":
        return pref[..., None] * grad_alpha_d
    if model == "Burns":
        alpha_c = 1.0 - alpha_d
        fac = 1.0 + alpha_d / jnp.maximum(alpha_c, residual_alpha)
        gac = grad_alpha_c if grad_alpha_c is not None \
            else -grad_alpha_d
        return -(pref * fac)[..., None] * gac
    raise ValueError(f"unknown turbulent dispersion model '{model}'")


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
