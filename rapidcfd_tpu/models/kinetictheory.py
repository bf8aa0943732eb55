"""Kinetic theory of granular flow for the dispersed phase of
twoPhaseEulerFoam (reference:
applications/solvers/multiphase/twoPhaseEulerFoam/
phaseCompressibleTurbulenceModels/kineticTheoryModels/ —
kineticTheoryModel.C plus the viscosity/conductivity/radial/
granularPressure/frictionalStress submodel zoo).

Granular temperature Theta closes the particle-phase stresses:
- nut     granular shear viscosity (+ frictional viscosity)
- lambda  bulk viscosity
- pPrime  d(particle pressure)/d(alpha) — the phase-pressure diffusion
          that keeps packing below alphaMax (twoPhaseSystem.C:531
          implicit alpha correction)
Theta comes either from the closed-form EQUILIBRIUM balance
(production = dissipation; kineticTheoryModel.C else-branch) — the
TPU-preferred path, zero extra solves — or from the full transport
equation (fvm ddt/div/laplacian + Sp sources) when `equilibrium off`.

All submodels are pure jnp formula functions selected by dictionary
word, matching the reference names: viscosity/conductivity
(Gidaspow|Syamlal|HrenyaSinclair|none), radial
(CarnahanStarling|LunSavage|SinclairJackson), granular pressure
(Lun|SyamlalRogersOBrien), frictional stress
(JohnsonJackson|Schaeffer|JohnsonJacksonSchaeffer|none).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax.numpy as jnp

_SQRT_PI = math.sqrt(math.pi)


# ---------------------------------------------------------------------------
# submodels (reference: kineticTheoryModels/<family>/<name>/<name>.C)
# ---------------------------------------------------------------------------

def radial_g0(model, alpha, alpha_min_friction, alpha_max):
    a = jnp.minimum(alpha, alpha_max - 1e-3)
    if model == "CarnahanStarling":
        om = 1.0 - a
        return 1.0 / om + 3.0 * a / (2.0 * om * om) \
            + a * a / (2.0 * om ** 3)
    if model == "LunSavage":
        return (1.0 - a / alpha_max) ** (-2.5 * alpha_max)
    if model == "SinclairJackson":
        return 1.0 / (1.0 - jnp.cbrt(jnp.minimum(a, alpha_min_friction)
                                     / alpha_max))
    raise ValueError(f"unknown radialModel '{model}'")


def radial_g0_prime(model, alpha, alpha_min_friction, alpha_max):
    a = jnp.minimum(alpha, alpha_max - 1e-3)
    if model == "CarnahanStarling":
        om = 1.0 - a
        return 2.5 / (om * om) + 4.0 * a / om ** 3 \
            + 1.5 * a * a / om ** 4
    if model == "LunSavage":
        return 2.5 * (1.0 - a / alpha_max) ** (-2.5 * alpha_max - 1.0)
    if model == "SinclairJackson":
        ar = jnp.cbrt(jnp.minimum(jnp.maximum(a, 1e-3),
                                  alpha_min_friction) / alpha_max)
        return (1.0 / (3.0 * alpha_max)) / jnp.maximum(
            (ar - ar * ar) ** 2, 1e-12)
    raise ValueError(f"unknown radialModel '{model}'")


def granular_viscosity(model, alpha, theta, g0, rho, da, e, lamda=None):
    """Kinematic granular shear viscosity [m2/s]."""
    if model in ("none", None):
        return jnp.zeros_like(alpha)
    st = jnp.sqrt(jnp.maximum(theta, 0.0))
    a2 = alpha * alpha
    if model == "Gidaspow":
        return da * st * (
            (4.0 / 5.0) * a2 * g0 * (1.0 + e) / _SQRT_PI
            + (1.0 / 15.0) * _SQRT_PI * g0 * (1.0 + e) * a2
            + (1.0 / 6.0) * _SQRT_PI * alpha
            + (10.0 / 96.0) * _SQRT_PI / ((1.0 + e) * g0))
    if model == "Syamlal":
        return da * st * (
            (4.0 / 5.0) * a2 * g0 * (1.0 + e) / _SQRT_PI
            + (1.0 / 15.0) * _SQRT_PI * g0 * (1.0 + e)
            * (3.0 * e - 1.0) * a2 / (3.0 - e)
            + (1.0 / 6.0) * alpha * _SQRT_PI / (3.0 - e))
    if model == "HrenyaSinclair":
        lam = lamda if lamda is not None else jnp.ones_like(alpha)
        return da * st * (
            (4.0 / 5.0) * a2 * g0 * (1.0 + e) / _SQRT_PI
            + (1.0 / 15.0) * _SQRT_PI * g0 * (1.0 + e)
            * (3.0 * e - 1.0) * a2 / (3.0 - e)
            + (1.0 / 6.0) * _SQRT_PI * alpha
            * (0.5 * lam + 0.25 * (3.0 * e - 1.0))
            / (0.5 * (3.0 - e) * lam)
            + (10.0 / 96.0) * _SQRT_PI
            / ((1.0 + e) * 0.5 * (3.0 - e) * g0 * lam))
    raise ValueError(f"unknown viscosityModel '{model}'")


def granular_conductivity(model, alpha, theta, g0, rho, da, e,
                          lamda=None):
    """Granular-energy conductivity kappa [kg/m/s]."""
    st = jnp.sqrt(jnp.maximum(theta, 0.0))
    a2 = alpha * alpha
    if model == "Gidaspow":
        return rho * da * st * (
            2.0 * a2 * g0 * (1.0 + e) / _SQRT_PI
            + (9.0 / 8.0) * _SQRT_PI * g0 * 0.5 * (1.0 + e) * a2
            + (15.0 / 16.0) * _SQRT_PI * alpha
            + (25.0 / 64.0) * _SQRT_PI / ((1.0 + e) * g0))
    if model == "Syamlal":
        den = 49.0 / 16.0 - 33.0 * e / 16.0
        return rho * da * st * (
            2.0 * a2 * g0 * (1.0 + e) / _SQRT_PI
            + (9.0 / 8.0) * _SQRT_PI * g0 * 0.25 * (1.0 + e) ** 2
            * (2.0 * e - 1.0) * a2 / den
            + (15.0 / 32.0) * _SQRT_PI * alpha / den)
    if model == "HrenyaSinclair":
        lam = lamda if lamda is not None else jnp.ones_like(alpha)
        den = 49.0 / 16.0 - 33.0 * e / 16.0
        return rho * da * st * (
            2.0 * a2 * g0 * (1.0 + e) / _SQRT_PI
            + (9.0 / 8.0) * _SQRT_PI * g0 * 0.25 * (1.0 + e) ** 2
            * (2.0 * e - 1.0) * a2 / den
            + (15.0 / 16.0) * _SQRT_PI * alpha
            * (0.5 * e * e + 0.25 * e - 0.75 + lam) / (den * lam)
            + (25.0 / 64.0) * _SQRT_PI / ((1.0 + e) * den * lam * g0))
    raise ValueError(f"unknown conductivityModel '{model}'")


def granular_pressure_coeff(model, alpha, g0, rho, e):
    """PsCoeff with Ps = PsCoeff*Theta (reference:
    granularPressureModel::granularPressureCoeff)."""
    if model == "Lun":
        return rho * alpha * (1.0 + 2.0 * (1.0 + e) * alpha * g0)
    if model == "SyamlalRogersOBrien":
        return 2.0 * rho * (1.0 + e) * alpha * alpha * g0
    raise ValueError(f"unknown granularPressureModel '{model}'")


def granular_pressure_coeff_prime(model, alpha, g0, g0p, rho, e):
    if model == "Lun":
        return rho * (1.0 + alpha * (1.0 + e)
                      * (4.0 * g0 + 2.0 * g0p * alpha))
    if model == "SyamlalRogersOBrien":
        return rho * alpha * (1.0 + e) * (4.0 * g0 + 2.0 * g0p * alpha)
    raise ValueError(f"unknown granularPressureModel '{model}'")


def frictional_pressure(model, cfg, alpha, a_min_f, a_max):
    if model in ("none", None):
        return jnp.zeros_like(alpha)
    ex = jnp.maximum(alpha - a_min_f, 0.0)
    if model in ("JohnsonJackson", "JohnsonJacksonSchaeffer"):
        return cfg["Fr"] * ex ** cfg["eta"] \
            / jnp.maximum(a_max - alpha, 5e-2) ** cfg["p"]
    if model == "Schaeffer":
        return 1e24 * ex ** 10.0
    raise ValueError(f"unknown frictionalStressModel '{model}'")


def frictional_pressure_prime(model, cfg, alpha, a_min_f, a_max):
    if model in ("none", None):
        return jnp.zeros_like(alpha)
    ex = jnp.maximum(alpha - a_min_f, 0.0)
    if model in ("JohnsonJackson", "JohnsonJacksonSchaeffer"):
        return cfg["Fr"] * (
            cfg["eta"] * ex ** (cfg["eta"] - 1.0) * (a_max - alpha)
            + cfg["p"] * ex ** cfg["eta"]) \
            / jnp.maximum(a_max - alpha, 5e-2) ** (cfg["p"] + 1.0)
    if model == "Schaeffer":
        return 1e25 * ex ** 9.0
    raise ValueError(f"unknown frictionalStressModel '{model}'")


def frictional_nu(model, cfg, alpha, a_max, pf_by_rho, D):
    """Frictional viscosity [m2/s] from pf/rho and the strain rate D
    (JohnsonJackson.C:nu / Schaeffer.C:nu)."""
    if model in ("none", None):
        return jnp.zeros_like(alpha)
    if model == "JohnsonJackson":
        return 0.5 * pf_by_rho * math.sin(cfg["phi"])
    # Schaeffer (and the Schaeffer half of JohnsonJacksonSchaeffer):
    # nu = 0.5*pf*sin(phi)/sqrt(I2(D)) on nearly-packed cells
    dxx, dyy, dzz = D[..., 0, 0], D[..., 1, 1], D[..., 2, 2]
    i2d = jnp.sqrt(
        (1.0 / 6.0) * ((dxx - dyy) ** 2 + (dyy - dzz) ** 2
                       + (dzz - dxx) ** 2)
        + D[..., 0, 1] ** 2 + D[..., 0, 2] ** 2 + D[..., 1, 2] ** 2) \
        + 1e-15
    nu = 0.5 * pf_by_rho * math.sin(cfg["phi"]) / i2d
    return jnp.where(alpha > a_max - 5e-2, nu, 0.0)


# ---------------------------------------------------------------------------
# the model
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class KTConfig:
    equilibrium: bool = True
    e: float = 0.8
    alpha_max: float = 0.62
    alpha_min_friction: float = 0.5
    residual_alpha: float = 1e-4
    viscosity: str = "Gidaspow"
    conductivity: str = "Gidaspow"
    granular_pressure: str = "Lun"
    frictional: str = "JohnsonJackson"
    radial: str = "SinclairJackson"
    fr: float = 0.05
    eta: float = 2.0
    p_exp: float = 5.0
    phi_deg: float = 28.5
    L_hs: float = 5e-4     # HrenyaSinclair mean-free-path scale

    @property
    def fric_cfg(self):
        return {"Fr": self.fr, "eta": self.eta, "p": self.p_exp,
                "phi": self.phi_deg * math.pi / 180.0}


def read_kt_config(d) -> KTConfig:
    """Parse a kineticTheoryCoeffs sub-dictionary (reference dict names:
    equilibrium, e, alphaMax, alphaMinFriction, residualAlpha,
    viscosityModel, ... JohnsonJacksonCoeffs{Fr,eta,p,phi})."""
    if d is None:
        return KTConfig()
    jj = d.subdict("JohnsonJacksonCoeffs") if hasattr(
        d, "subdict") else None
    if jj is None and hasattr(d, "subdict"):
        jj = d.subdict("frictionalStressModelCoeffs")

    def _s(key, dv):
        v = d.lookup(key)
        if v is None:
            return dv
        if isinstance(v, tuple):   # dimensioned scalar "e e [..] 0.8"
            v = v[-1]
        return float(v)

    def _w(key, dv):
        v = d.lookup(key)
        return str(v) if isinstance(v, str) else dv

    eq = d.word("equilibrium", "on") in ("on", "yes", "true", "1")
    cfg = KTConfig(
        equilibrium=eq,
        e=_s("e", 0.8),
        alpha_max=_s("alphaMax", 0.62),
        alpha_min_friction=_s("alphaMinFriction", 0.5),
        residual_alpha=_s("residualAlpha", 1e-4),
        viscosity=_w("viscosityModel", "Gidaspow"),
        conductivity=_w("conductivityModel", "Gidaspow"),
        granular_pressure=_w("granularPressureModel", "Lun"),
        frictional=_w("frictionalStressModel", "JohnsonJackson"),
        radial=_w("radialModel", "SinclairJackson"),
        fr=float(jj.scalar("Fr", 0.05)) if jj else 0.05,
        eta=float(jj.scalar("eta", 2.0)) if jj else 2.0,
        p_exp=float(jj.scalar("p", 5.0)) if jj else 5.0,
        phi_deg=float(jj.scalar("phi", 28.5)) if jj else 28.5,
    )
    return cfg


def equilibrium_theta(cfg: KTConfig, alpha, rho, da, div_u, D):
    """Closed-form equilibrium granular temperature (production =
    dissipation; kineticTheoryModel.C equilibrium branch)."""
    e = cfg.e
    g0 = radial_g0(cfg.radial, alpha, cfg.alpha_min_friction,
                   cfg.alpha_max)
    K1 = 2.0 * (1.0 + e) * rho * g0
    K3 = 0.5 * da * rho * (
        (_SQRT_PI / (3.0 * (3.0 - e)))
        * (1.0 + 0.4 * (1.0 + e) * (3.0 * e - 1.0) * alpha * g0)
        + 1.6 * alpha * g0 * (1.0 + e) / _SQRT_PI)
    K2 = 4.0 * da * rho * (1.0 + e) * alpha * g0 / (3.0 * _SQRT_PI) \
        - 2.0 * K3 / 3.0
    K4 = 12.0 * (1.0 - e * e) * rho * g0 / (da * _SQRT_PI)
    tr_d = alpha / (alpha + cfg.residual_alpha) * div_u
    tr2d = tr_d * tr_d
    trd2 = jnp.einsum("...ij,...ji->...", D, D)
    t1 = K1 * alpha + rho
    l1 = -t1 * tr_d
    l2 = t1 * t1 * tr2d
    l3 = 4.0 * K4 * alpha * (2.0 * K3 * trd2 + K2 * tr2d)
    theta = ((l1 + jnp.sqrt(jnp.maximum(l2 + l3, 0.0)))
             / (2.0 * jnp.maximum(alpha, cfg.residual_alpha) * K4)) ** 2
    return jnp.clip(theta, 0.0, 100.0)


def kt_closures(cfg: KTConfig, alpha, theta, rho, da, D):
    """(nut, lambda, pPrime, kappa, Ps) from alpha/Theta (all per-cell
    jnp arrays). nut includes the frictional part."""
    a = jnp.maximum(alpha, 0.0)
    g0 = radial_g0(cfg.radial, a, cfg.alpha_min_friction, cfg.alpha_max)
    g0p = radial_g0_prime(cfg.radial, a, cfg.alpha_min_friction,
                          cfg.alpha_max)
    lamda = 1.0 + da / cfg.L_hs * jnp.maximum(1.0 - a, 0.0) \
        if cfg.viscosity == "HrenyaSinclair" \
        or cfg.conductivity == "HrenyaSinclair" else None
    nut = granular_viscosity(cfg.viscosity, a, theta, g0, rho, da,
                             cfg.e, lamda)
    st = jnp.sqrt(jnp.maximum(theta, 0.0))
    lam_b = (4.0 / 3.0) * a * a * da * g0 * (1.0 + cfg.e) * st / _SQRT_PI
    kappa = granular_conductivity(cfg.conductivity, a, theta, g0, rho,
                                  da, cfg.e, lamda)
    ps_coeff = granular_pressure_coeff(cfg.granular_pressure, a, g0,
                                       rho, cfg.e)
    pf = frictional_pressure(cfg.frictional, cfg.fric_cfg, a,
                             cfg.alpha_min_friction, cfg.alpha_max)
    p_prime = theta * granular_pressure_coeff_prime(
        cfg.granular_pressure, a, g0, g0p, rho, cfg.e) \
        + frictional_pressure_prime(cfg.frictional, cfg.fric_cfg, a,
                                    cfg.alpha_min_friction,
                                    cfg.alpha_max)
    nut = nut + frictional_nu(
        "Schaeffer" if cfg.frictional == "JohnsonJacksonSchaeffer"
        else cfg.frictional, cfg.fric_cfg, a, cfg.alpha_max,
        pf / jnp.maximum(rho, 1e-30), D)
    nut = jnp.minimum(nut, 100.0)
    return nut, lam_b, jnp.maximum(p_prime, 0.0), kappa, \
        ps_coeff * theta + pf
