"""Material property databases: NSRDS-correlated liquids/solids,
SLGThermo and laminar flame speed models.

Reference: src/thermophysicalModels/thermophysicalFunctions/
NSRDSfunctions/ (correlation forms), properties/liquidProperties/
(liquidProperties.H:47 + per-liquid NSRDS coefficient sets — published
DIPPR/NSRDS constants), properties/solidProperties/, SLGThermo/
SLGThermo.H:54, laminarFlameSpeed/ (constant + Gulders).

TPU-first: every correlation is a pure jnp function of T (vectorizes
over cell arrays); a liquid is a frozen bundle of those functions plus
its critical-point scalars. Dictionary-driven construction accepts the
reference's `<name> { defaultCoeffs no; rho <func7 coeffs>; ... }`
convention.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp

_SMALL = 1e-15


# ---------------------------------------------------------------------------
# NSRDS correlation functions (reference: NSRDSfunc0..7, NSRDSfunc14,
# APIdiffCoefFunc — formula per class header)
# ---------------------------------------------------------------------------

def nsrds0(a, b, c, d, e, f):
    """Polynomial: a + bT + cT^2 + dT^3 + eT^4 + fT^5."""
    return lambda T: ((((f * T + e) * T + d) * T + c) * T + b) * T + a


def nsrds1(a, b, c, d, e):
    """exp(a + b/T + c lnT + d T^e) (vapour pressure)."""
    return lambda T: jnp.exp(a + b / T + c * jnp.log(T)
                             + d * T ** e)


def nsrds2(a, b, c, d):
    """a T^b / (1 + c/T + d/T^2)."""
    return lambda T: a * T ** b / (1.0 + c / T + d / (T * T))


def nsrds3(a, b, c, d):
    """a + b exp(-c / T^d)."""
    return lambda T: a + b * jnp.exp(-c / T ** d)


def nsrds4(a, b, c, d, e):
    """a + b/T + c/T^3 + d/T^8 + e/T^9 (second virial)."""
    return lambda T: a + b / T + c / T ** 3 + d / T ** 8 + e / T ** 9


def nsrds5(a, b, c, d):
    """a / b^(1 + (1 - T/c)^d) (saturated liquid density)."""
    return lambda T: a / b ** (1.0 + jnp.abs(1.0 - T / c) ** d)


def nsrds6(tc, a, b, c, d, e):
    """a (1 - Tr)^(b + c Tr + d Tr^2 + e Tr^3) (heat of vapourisation,
    surface tension)."""
    def f(T):
        tr = jnp.minimum(T / tc, 1.0 - 1e-6)
        return a * (1.0 - tr) ** (((e * tr + d) * tr + c) * tr + b)
    return f


def nsrds7(a, b, c, d, e):
    """a + b ((c/T)/sinh(c/T))^2 + d ((e/T)/cosh(e/T))^2 (ideal-gas
    Cp)."""
    def f(T):
        x, y = c / T, e / T
        return a + b * (x / jnp.sinh(x)) ** 2 \
            + d * (y / jnp.cosh(y)) ** 2
    return f


def nsrds14(tc, a, b, c, d):
    """Saturated-liquid Cp near the critical point."""
    def f(T):
        td = jnp.minimum(T, tc - 1e-8)
        t = 1.0 - td / tc
        return (a * a / (t + _SMALL) + b
                - t * (2.0 * a * c + t * (a * d + t * (c * c / 3.0
                       + t * (c * d / 2.0 + t * d * d / 5.0)))))
    return f


def api_diff(wf, wa, a, b):
    """API vapour mass diffusivity D(p, T) (APIdiffCoefFunc.H)."""
    alpha = jnp.sqrt(1.0 / wf + 1.0 / wa)
    beta = (a ** (1.0 / 3.0) + b ** (1.0 / 3.0)) ** 2

    def f(p, T):
        return 3.6059e-3 * (1.8 * T) ** 1.75 * alpha / (p * beta)
    return f


_NSRDS = {"NSRDSfunc0": (nsrds0, 6), "NSRDSfunc1": (nsrds1, 5),
          "NSRDSfunc2": (nsrds2, 4), "NSRDSfunc3": (nsrds3, 4),
          "NSRDSfunc4": (nsrds4, 5), "NSRDSfunc5": (nsrds5, 4),
          "NSRDSfunc6": (nsrds6, 6), "NSRDSfunc7": (nsrds7, 5),
          "NSRDSfunc14": (nsrds14, 5)}


# ---------------------------------------------------------------------------
# liquidProperties (reference: liquidProperties.H:47 — W/Tc/Pc/Vc/Zc/
# Tt/Pt/Tb/dipm/omega/delta scalars + rho/pv/hl/Cp/h/Cpg/B/mu/mug/
# K/Kg/sigma/D correlations)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class LiquidProperties:
    name: str
    W: float            # molecular weight [kg/kmol]
    Tc: float           # critical temperature [K]
    Pc: float           # critical pressure [Pa]
    Vc: float           # critical volume [m^3/kmol]
    Zc: float           # critical compressibility
    Tt: float           # triple point temperature [K]
    Pt: float           # triple point pressure [Pa]
    Tb: float           # normal boiling temperature [K]
    dipm: float         # dipole moment
    omega: float        # Pitzer acentric factor
    delta: float        # solubility parameter
    rho: object = None      # T -> liquid density [kg/m^3]
    pv: object = None       # T -> vapour pressure [Pa]
    hl: object = None       # T -> heat of vapourisation [J/kg]
    cp: object = None       # T -> liquid heat capacity [J/kg/K]
    h: object = None        # T -> liquid enthalpy [J/kg]
    cpg: object = None      # T -> ideal-gas heat capacity [J/kg/K]
    B: object = None        # T -> second virial coefficient
    mu: object = None       # T -> liquid viscosity [Pa s]
    mug: object = None      # T -> vapour viscosity [Pa s]
    kappa: object = None    # T -> liquid conductivity [W/m/K]
    kappag: object = None   # T -> vapour conductivity [W/m/K]
    sigma: object = None    # T -> surface tension [N/m]
    D: object = None        # (p, T) -> vapour diffusivity [m^2/s]


def _h2o() -> LiquidProperties:
    """Reference: liquidProperties/H2O/H2O.C:40-99 (NSRDS/DIPPR
    coefficient set for water)."""
    return LiquidProperties(
        name="H2O", W=18.015, Tc=647.13, Pc=2.2055e7, Vc=0.05595,
        Zc=0.229, Tt=273.16, Pt=6.113e2, Tb=373.15, dipm=6.1709e-30,
        omega=0.3449, delta=4.7813e4,
        rho=nsrds5(98.343885, 0.30542, 647.13, 0.081),
        pv=nsrds1(73.649, -7258.2, -7.3037, 4.1653e-06, 2),
        hl=nsrds6(647.13, 2889425.47876769, 0.3199, -0.212, 0.25795,
                  0),
        cp=nsrds0(15341.1046350264, -116.019983347211,
                  0.451013044684985, -0.000783569247849015,
                  5.20127671384957e-07, 0),
        h=nsrds0(-17957283.7993676, 15341.1046350264,
                 -58.0099916736053, 0.150337681561662,
                 -0.000195892311962254, 1.04025534276991e-07),
        cpg=nsrds7(1851.73466555648, 1487.53816264224, 2609.3,
                   493.366638912018, 1167.6),
        B=nsrds4(-0.0012789342214821, 1.4909797391063,
                 -1563696.91923397, 1.85445462114904e+19,
                 -7.68082153760755e+21),
        mu=nsrds1(-51.964, 3670.6, 5.7331, -5.3495e-29, 10),
        mug=nsrds2(2.6986e-06, 0.498, 1257.7, -19570),
        kappa=nsrds0(-0.4267, 0.0056903, -8.0065e-06, 1.815e-09, 0, 0),
        kappag=nsrds2(6.977e-05, 1.1243, 844.9, -148850),
        sigma=nsrds6(647.13, 0.18548, 2.717, -3.554, 2.047, 0),
        D=api_diff(15.0, 15.0, 18.015, 28.0))


def _c7h16() -> LiquidProperties:
    """Reference: liquidProperties/C7H16/C7H16.C:41-92 (n-heptane)."""
    return LiquidProperties(
        name="C7H16", W=100.204, Tc=540.20, Pc=2.74e6, Vc=0.428,
        Zc=0.261, Tt=182.57, Pt=1.8269e-1, Tb=371.58, dipm=0.0,
        omega=0.3495, delta=1.52e4,
        rho=nsrds5(61.38396836, 0.26211, 540.2, 0.28141),
        pv=nsrds1(87.829, -6996.4, -9.8802, 7.2099e-06, 2.0),
        hl=nsrds6(540.20, 499121.791545248, 0.38795, 0.0, 0.0, 0.0),
        cp=nsrds14(540.20, 6.11976102401216, 3137.69909384855,
                   182.274175063868, -254.530511150515),
        h=nsrds0(-3.1469964e+6, 7.3072e+3, -3.52884e+1, 1.10637e-1,
                 -1.634831e-4, 9.64941e-8),
        cpg=nsrds7(1199.05392998284, 3992.85457666361, 1676.6,
                   2734.42177956968, 756.4),
        B=nsrds4(0.00274040956448844, -2.90407568560137,
                 -440900.562851782, -8.78208454752305e+17,
                 1.28238393676899e+20),
        mu=nsrds1(-24.451, 1533.1, 2.0087, 0.0, 0.0),
        mug=nsrds2(6.672e-08, 0.82837, 85.752, 0.0),
        kappa=nsrds0(0.215, -0.000303, 0.0, 0.0, 0.0, 0.0),
        kappag=nsrds2(-0.070028, 0.38068, -7049.9, -2400500.0),
        sigma=nsrds6(540.20, 0.054143, 1.2512, 0.0, 0.0, 0.0),
        D=api_diff(147.18, 20.1, 100.204, 28.0))


_BUILTIN_LIQUIDS = {"H2O": _h2o, "C7H16": _c7h16}

_CORR_KEYS = ("rho", "pv", "hl", "Cp", "h", "Cpg", "B", "mu", "mug",
              "K", "Kg", "sigma")
_CORR_ATTR = {"Cp": "cp", "Cpg": "cpg", "K": "kappa", "Kg": "kappag"}


def liquid_from_dict(name: str, d) -> LiquidProperties:
    """Dictionary-constructed liquid (reference: liquidProperties
    Istream/dictionary constructors — `defaultCoeffs no;` path): each
    correlation entry is `<key> <NSRDSfuncN> (coeffs...)` or
    `<key> { type NSRDSfuncN; coeffs (...); }`."""
    scalars = [float(d.scalar(k)) for k in
               ("W", "Tc", "Pc", "Vc", "Zc", "Tt", "Pt", "Tb",
                "dipm", "omega", "delta")]
    kw = {}
    for key in _CORR_KEYS:
        e = d.lookup(key, required=False)
        if e is None:
            continue
        items = list(e)
        fname = str(items[0])
        coeffs = [float(x) for x in items[1]] \
            if len(items) == 2 else [float(x) for x in items[1:]]
        fn, nargs = _NSRDS[fname]
        kw[_CORR_ATTR.get(key, key)] = fn(*coeffs[:nargs])
    return LiquidProperties(name, *scalars, **kw)


def make_liquid(name: str, d=None) -> LiquidProperties:
    if d is not None and hasattr(d, "lookup") \
            and d.lookup("W", required=False) is not None:
        return liquid_from_dict(name, d)
    if name in _BUILTIN_LIQUIDS:
        return _BUILTIN_LIQUIDS[name]()
    raise KeyError(f"unknown liquid '{name}' (builtins: "
                   f"{sorted(_BUILTIN_LIQUIDS)}; or give NSRDS coeffs)")


# ---------------------------------------------------------------------------
# solidProperties (reference: properties/solidProperties/)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class SolidProperties:
    name: str
    rho: float
    cp: float
    kappa: float
    hf: float = 0.0
    emissivity: float = 1.0


_BUILTIN_SOLIDS = {
    # reference: solidProperties/C/C.C and ash/ash.C constants
    "C": SolidProperties("C", 2010.0, 710.0, 0.04, 0.0, 1.0),
    "ash": SolidProperties("ash", 2010.0, 710.0, 0.04, 0.0, 1.0),
}


def make_solid(name: str, d=None) -> SolidProperties:
    if d is not None and hasattr(d, "lookup") \
            and d.lookup("rho", required=False) is not None:
        return SolidProperties(
            name, float(d.scalar("rho")), float(d.scalar("Cp")),
            float(d.scalar("K", d.scalar("kappa", 0.04))),
            float(d.scalar("Hf", 0.0)),
            float(d.scalar("emissivity", 1.0)))
    if name in _BUILTIN_SOLIDS:
        return _BUILTIN_SOLIDS[name]
    raise KeyError(f"unknown solid '{name}'")


# ---------------------------------------------------------------------------
# SLGThermo (reference: SLGThermo/SLGThermo.H:54 — solid/liquid/gas
# thermo package for lagrangian/film models)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class SLGThermo:
    """Carrier (gas) thermo + optional liquid and solid property
    tables, keyed by name."""
    carrier: object                      # MultiComponentThermo or None
    liquids: dict = field(default_factory=dict)
    solids: dict = field(default_factory=dict)

    @staticmethod
    def from_dict(d, carrier=None) -> "SLGThermo":
        liquids = {}
        solids = {}
        ld = d.subdict("liquids", required=False)
        if ld is not None:
            for name, sub in ld.items():
                liquids[name] = make_liquid(name, sub)
        sd = d.subdict("solids", required=False)
        if sd is not None:
            for name, sub in sd.items():
                solids[name] = make_solid(name, sub)
        return SLGThermo(carrier, liquids, solids)


# ---------------------------------------------------------------------------
# laminar flame speed (reference: laminarFlameSpeed/{constant,Gulders})
# ---------------------------------------------------------------------------

_GULDERS_FUELS = {
    # reference: Gulders correlation coefficient sets (published)
    "Methane": dict(W=0.422, eta=0.15, xi=5.18, f=2.3, alpha=2.0,
                    beta=-0.5),
    "Propane": dict(W=0.446, eta=0.12, xi=4.95, f=2.3, alpha=1.77,
                    beta=-0.2),
    "IsoOctane": dict(W=0.4658, eta=-0.326, xi=4.48, f=2.3,
                      alpha=1.56, beta=-0.22),
}


class ConstantFlameSpeed:
    """laminarFlameSpeedModels::constant."""

    def __init__(self, su0: float):
        self.su0 = su0

    def su0_pt_phi(self, p, tu, phi=1.0, y_res=0.0):
        return jnp.full_like(jnp.asarray(tu, dtype=jnp.result_type(
            float)), self.su0)


class GuldersFlameSpeed:
    """laminarFlameSpeedModels::Gulders (Gulders.C:75-103):
    Su0 = W phi^eta exp(-xi (phi - 1.075)^2) (Tu/300)^alpha
          (p/1.013e5)^beta (1 - f Yres)."""

    def __init__(self, fuel: str, coeffs=None):
        c = dict(_GULDERS_FUELS.get(fuel, {}))
        if coeffs is not None:
            for k in ("W", "eta", "xi", "f", "alpha", "beta"):
                v = coeffs.lookup(k, required=False)
                if v is not None:
                    c[k] = float(coeffs.scalar(k))
        if not c:
            raise KeyError(f"Gulders: unknown fuel '{fuel}' and no "
                           f"coefficients given")
        self.c = c

    def su_ref(self, phi):
        c = self.c
        return jnp.where(
            phi > _SMALL,
            c["W"] * jnp.maximum(phi, _SMALL) ** c["eta"]
            * jnp.exp(-c["xi"] * (phi - 1.075) ** 2), 0.0)

    def su0_pt_phi(self, p, tu, phi=1.0, y_res=0.0):
        c = self.c
        return self.su_ref(jnp.asarray(phi)) \
            * (tu / 300.0) ** c["alpha"] \
            * (p / 1.013e5) ** c["beta"] * (1.0 - c["f"] * y_res)


def make_flame_speed(d):
    """laminarFlameSpeed::New from a combustionProperties-style dict:
    `laminarFlameSpeedCorrelation Gulders; fuel Methane;` or
    `... constant; Su <value>;`."""
    model = str(d.word("laminarFlameSpeedCorrelation", "constant"))
    if model == "constant":
        from ..fields.field import Dimensioned
        su = d.lookup("Su", required=True)
        try:
            val = Dimensioned.from_entry(su).value
        except Exception:
            val = float(d.scalar("Su"))
        return ConstantFlameSpeed(float(val))
    if model == "Gulders":
        fuel = str(d.word("fuel", "Methane"))
        return GuldersFlameSpeed(
            fuel, d.subdict("GuldersCoeffs", required=False))
    raise KeyError(f"unknown laminarFlameSpeedCorrelation '{model}'")
