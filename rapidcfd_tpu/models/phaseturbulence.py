"""Phase-aware RAS turbulence for the Euler-Euler solvers.

TPU re-founding of the reference's phase-compressible turbulence zoo
(reference: src/TurbulenceModels/phaseCompressible/RAS/):

- mixtureKEpsilon (mixtureKEpsilon/mixtureKEpsilon.C): a single
  mixture k/epsilon system assembled from effective-density-weighted
  phase quantities, with the Lahey bubble-generation source and the
  Issa Ct response coefficient splitting the mixture turbulence back
  into per-phase (liquid/gas) fields.
- LaheyKEpsilon (LaheyKEpsilon/LaheyKEpsilon.C): standard k/epsilon on
  the continuous liquid with the Lahey bubble source, phase-inversion
  transfer and the Sato bubble-induced viscosity Cmub*d*alphag*|Ur|;
  the gas-phase turbulence is closed algebraically with the same Ct
  response function (the reference pairs it with a gas-side model
  looked up from the registry; here the Ct closure provides kg/nutg).

Both models solve their scalar systems as FvMatrix solves inside the
jitted solver step — the state is a pytree dict of VolFields.

Selection: constant/turbulenceProperties.<phase> with
`simulationType RAS; RAS { RASModel mixtureKEpsilon; ... }`
(reference convention); `laminar` / missing file = no model.
"""

from __future__ import annotations

import os

import jax.numpy as jnp

from ..fields.field import Dimensioned, SurfaceField, VolField
from ..linalg import solve
from ..ops import fvc, fvm
from ..utils.dictionary import parse_file
from ..utils.dimensions import DimensionSet

_K_DIMS = DimensionSet.of(0, 2, -2)
_EPS_DIMS = DimensionSet.of(0, 2, -3)
_NUT_DIMS = DimensionSet.of(0, 2, -1)
_RTIME = DimensionSet.of(0, 0, -1)
_K_MIN = 1e-10
_EPS_MIN = 1e-12


def _coeff(d, name, default):
    return float(d.scalar(name, default)) if d is not None else default


class MixtureKEpsilon:
    """Reference: mixtureKEpsilon.C (formulas cited per method)."""

    name = "mixtureKEpsilon"

    def __init__(self, case, names, coeffs, cvm: float):
        # phase 1 = dispersed gas, phase 2 = continuous liquid
        self.names = names
        self.cvm = cvm                      # virtual-mass Cvm (rhogEff)
        self.cmu = _coeff(coeffs, "Cmu", 0.09)
        self.c1 = _coeff(coeffs, "C1", 1.44)
        self.c2 = _coeff(coeffs, "C2", 1.92)
        self.c3 = _coeff(coeffs, "C3", self.c2)
        self.cp = _coeff(coeffs, "Cp", 0.25)
        self.sigma_k = _coeff(coeffs, "sigmak", 1.0)
        self.sigma_eps = _coeff(coeffs, "sigmaEps", 1.3)
        self.k_controls = case.solver_controls("k")
        self.eps_controls = case.solver_controls("epsilon")
        self.lap_corr = case.laplacian_scheme()

    def init_state(self, case):
        """Liquid-phase k/epsilon fields (k.<liquid> or k) + Ct2."""
        liq = self.names[1]
        kn = f"k.{liq}" if case.field_exists(f"k.{liq}") else "k"
        en = (f"epsilon.{liq}" if case.field_exists(f"epsilon.{liq}")
              else "epsilon")
        kl = case.read_field(kn)
        epsl = case.read_field(en)
        return {"k": kl, "epsilon": epsl,
                "ct2": jnp.ones_like(kl.data)}

    def _ct2(self, alpha_g, k_drag, kl, epsl, rho_g, rho_l):
        """Issa response coefficient squared (mixtureKEpsilon.C:367-390):
        beta = (6 Cmu/(4 sqrt(1.5))) K/rho_l (kl/epsl);
        Ct0 = (3+beta)/(1+beta+2 rho_g/rho_l);
        Ct2 = (1 + (Ct0-1) exp(-fAlphad))^2."""
        beta = (6.0 * self.cmu / (4.0 * jnp.sqrt(1.5))) \
            * k_drag / rho_l * kl / jnp.maximum(epsl, _EPS_MIN)
        ct0 = (3.0 + beta) / (1.0 + beta + 2.0 * rho_g / rho_l)
        f_ad = (180.0 + (-4.71e3 + 4.26e4 * alpha_g) * alpha_g) * alpha_g
        return (1.0 + (ct0 - 1.0) * jnp.exp(-f_ad)) ** 2

    def correct(self, mesh, state, alpha, U1, U2, rho1, rho2,
                phi1, phi2, k_drag, cd_re, d_g, nu_l, nu_g, dt):
        """One mixture k/eps update (mixtureKEpsilon.C:555-700).
        Phase 1 = gas (dispersed), 2 = liquid. phi1/phi2 volumetric.
        Returns (state, nut1, nut2, perf)."""
        kl, epsl, ct2 = state["k"], state["epsilon"], state["ct2"]
        a_g, a_l = alpha.data, 1.0 - alpha.data
        a_gb, a_lb = alpha.bvalues, 1.0 - alpha.bvalues
        rho_l, rho_g = rho2.data, rho1.data
        rhol_eff = rho_l
        rhog_eff = rho_g + self.cvm * rho_l     # rhogEff: + Cvm*rho_l
        rhom_d = a_l * rhol_eff + a_g * rhog_eff
        denom_u = a_l * rhol_eff + a_g * rhog_eff * ct2

        def mix(fc, fd):
            return (a_l * rhol_eff * fc + a_g * rhog_eff * fd) / rhom_d

        def mix_u(fc, fd):
            return (a_l * rhol_eff * fc
                    + a_g * rhog_eff * ct2 * fd) / denom_u

        # per-phase derived from the stored liquid fields + Ct2
        kg = ct2 * kl.data
        epsg = ct2 * epsl.data
        nutl_d = self.cmu * kl.data ** 2 / jnp.maximum(epsl.data,
                                                       _EPS_MIN)
        nutg_d = ct2 * (nu_l / nu_g) * nutl_d

        # mixture fields carried on the liquid field's BC structure
        km = kl.replace(data=jnp.maximum(mix(kl.data, kg), _K_MIN),
                        old=None).store_old()
        epsm = epsl.replace(
            data=jnp.maximum(mix(epsl.data, epsg), _EPS_MIN),
            old=None).store_old()

        # mixture flux (mixFlux): interp of effective-density weights
        w_c = fvc.face_values(mesh, alpha.with_calculated_bcs(
            rhom_d / denom_u * a_l * rhol_eff,
            jnp.ones_like(a_gb), DimensionSet.of(), "wc"))
        w_d = fvc.face_values(mesh, alpha.with_calculated_bcs(
            rhom_d / denom_u * a_g * rhog_eff * ct2,
            jnp.zeros_like(a_gb), DimensionSet.of(), "wd"))
        phim = SurfaceField(w_c * phi2.data + w_d * phi1.data,
                            phi1.dims, "phim")

        # production per phase: nut*(gradU && dev(twoSymm(gradU)))
        def production(U, nut):
            g = fvc.grad(mesh, U).data
            two_symm = g + jnp.swapaxes(g, -1, -2)
            tr = two_symm[..., 0, 0] + two_symm[..., 1, 1] \
                + two_symm[..., 2, 2]
            dev = two_symm - (tr / 3.0)[..., None, None] \
                * jnp.eye(3, dtype=g.dtype)
            return nut * (g * dev).sum((-1, -2))

        gm = mix(production(U2, nutl_d), production(U1, nutg_d))
        nutm = mix_u(nutl_d, nutg_d)
        div_um = mix_u(fvc.div(mesh, phi2).data, fvc.div(mesh, phi1).data)

        # Lahey bubble generation (mixtureKEpsilon.C:476-507)
        ur_mag = jnp.linalg.norm(U2.data - U1.data, axis=-1)
        bubble_g = self.cp * a_l * rho_l * (
            ur_mag ** 3
            + (cd_re * nu_l / d_g) ** (4.0 / 3.0)
            * ur_mag ** (5.0 / 3.0)) * a_g / d_g

        rhom = alpha.with_calculated_bcs(
            rhom_d, a_lb * rho2.bvalues + a_gb
            * (rho1.bvalues + self.cvm * rho2.bvalues),
            DimensionSet.of(1, -3), "rhom")
        rhom = rhom.replace(old=rhom.replace(old=None))
        nutm_rho_f = Dimensioned(
            "Deff", DimensionSet.of(1, -1, -1),
            fvc.face_values(mesh, alpha.with_calculated_bcs(
                rhom_d * (nutm + mix_u(nu_l, nu_g)),
                jnp.zeros_like(a_gb) + 1e-8,
                DimensionSet.of(1, -1, -1), "Deff")))
        rho_phim = SurfaceField(
            fvc.face_values(mesh, rhom) * phim.data,
            phim.dims * DimensionSet.of(1, -3), "rhoPhim")
        sp_cont = fvc.div(mesh, rho_phim).data / rhom_d  # per-volume

        # ---- epsilon_m equation (mixtureKEpsilon.C:643-659)
        eps_div = Dimensioned("sEff", DimensionSet.of(1, -1, -1),
                              nutm_rho_f.value / self.sigma_eps)
        eps_eqn = (fvm.ddt(mesh, epsm, dt, coeff=rhom)
                   + fvm.div(mesh, rho_phim, epsm, "upwind")
                   - fvm.Sp(mesh, Dimensioned(
                       "spc", DimensionSet.of(1, -3, -1), sp_cont
                       * rhom_d), epsm)
                   - fvm.laplacian(mesh, eps_div, epsm, self.lap_corr)
                   + fvm.Sp(mesh, Dimensioned(
                       "C2re", DimensionSet.of(1, -3, -1),
                       self.c2 * rhom_d * epsm.data
                       / jnp.maximum(km.data, _K_MIN)), epsm)
                   + fvm.Sp(mesh, Dimensioned(
                       "c1div", DimensionSet.of(1, -3, -1),
                       (2.0 / 3.0) * self.c1 * rhom_d * div_um), epsm))
        eps_rhs = epsm.with_calculated_bcs(
            self.c1 * rhom_d * gm * epsm.data
            / jnp.maximum(km.data, _K_MIN)
            + self.c3 * epsm.data * bubble_g
            / jnp.maximum(km.data, _K_MIN),
            jnp.zeros_like(a_gb),
            DimensionSet.of(1, -3) * _EPS_DIMS / DimensionSet.of(0, 0, 1))
        epsm, e_perf = solve(mesh, eps_eqn.equals(eps_rhs),
                             self.eps_controls)
        epsm = epsm.replace(data=jnp.maximum(epsm.data, _EPS_MIN),
                            old=None)

        # ---- k_m equation (mixtureKEpsilon.C:664-680)
        k_div = Dimensioned("kEff", DimensionSet.of(1, -1, -1),
                            nutm_rho_f.value / self.sigma_k)
        km_eqn = (fvm.ddt(mesh, km, dt, coeff=rhom)
                  + fvm.div(mesh, rho_phim, km, "upwind")
                  - fvm.Sp(mesh, Dimensioned(
                      "spc", DimensionSet.of(1, -3, -1),
                      sp_cont * rhom_d), km)
                  - fvm.laplacian(mesh, k_div, km, self.lap_corr)
                  + fvm.Sp(mesh, Dimensioned(
                      "epsok", DimensionSet.of(1, -3, -1),
                      rhom_d * epsm.data / jnp.maximum(km.data, _K_MIN)),
                      km)
                  + fvm.Sp(mesh, Dimensioned(
                      "divu", DimensionSet.of(1, -3, -1),
                      (2.0 / 3.0) * rhom_d * div_um), km))
        km_rhs = km.with_calculated_bcs(
            rhom_d * gm + bubble_g, jnp.zeros_like(a_gb),
            DimensionSet.of(1, -3) * _K_DIMS / DimensionSet.of(0, 0, 1))
        km, k_perf = solve(mesh, km_eqn.equals(km_rhs), self.k_controls)
        km = km.replace(data=jnp.maximum(km.data, _K_MIN), old=None)

        # split back to phases (mixtureKEpsilon.C:686-700)
        cc2 = rhom_d / denom_u
        kl = kl.replace(data=jnp.maximum(cc2 * km.data, _K_MIN)) \
            .correct_boundary_conditions(mesh)
        epsl = epsl.replace(
            data=jnp.maximum(cc2 * epsm.data, _EPS_MIN)) \
            .correct_boundary_conditions(mesh)
        nutl = self.cmu * kl.data ** 2 / jnp.maximum(epsl.data,
                                                     _EPS_MIN)
        ct2_new = self._ct2(a_g, k_drag, kl.data, epsl.data, rho_g,
                            rho_l)
        nutg = ct2_new * (nu_l / nu_g) * nutl
        state = {"k": kl, "epsilon": epsl, "ct2": ct2_new}
        return state, nutg, nutl, {"k": k_perf[0],
                                   "epsilon": e_perf[0]}


class LaheyKEpsilon(MixtureKEpsilon):
    """Reference: LaheyKEpsilon.C — k/epsilon on the continuous liquid
    with the Lahey bubble source, phase-inversion transfer and Sato
    bubble-induced viscosity. Gas side closed with the Ct response
    function (see module docstring)."""

    name = "LaheyKEpsilon"

    def __init__(self, case, names, coeffs, cvm: float):
        super().__init__(case, names, coeffs, cvm)
        self.alpha_inversion = _coeff(coeffs, "alphaInversion", 0.3)
        self.cmub = _coeff(coeffs, "Cmub", 0.6)

    def correct(self, mesh, state, alpha, U1, U2, rho1, rho2,
                phi1, phi2, k_drag, cd_re, d_g, nu_l, nu_g, dt):
        kl, epsl, ct2 = state["k"], state["epsilon"], state["ct2"]
        a_g = alpha.data
        a_l = 1.0 - a_g
        a_lb = 1.0 - alpha.bvalues
        rho_l = rho2.data
        ur = U2.data - U1.data
        ur_mag = jnp.linalg.norm(ur, axis=-1)

        nutl_d = self.cmu * kl.data ** 2 \
            / jnp.maximum(epsl.data, _EPS_MIN) \
            + self.cmub * d_g * a_g * ur_mag       # Sato (correctNut)
        # gas closure: kg = Ct2 kl, epsg = Ct2 epsl
        kg = ct2 * kl.data
        epsg = ct2 * epsl.data

        # Lahey bubbleG (LaheyKEpsilon.C:183-206) — per unit alpha_l
        bubble_g = self.cp * (
            ur_mag ** 3
            + (cd_re * nu_l / d_g) ** (4.0 / 3.0)
            * ur_mag ** (5.0 / 3.0)) * a_g / d_g

        # phase inversion transfer (LaheyKEpsilon.C:212-226)
        pt = jnp.maximum(self.alpha_inversion - a_l, 0.0) * rho_l \
            * jnp.minimum(epsg / jnp.maximum(kg, _K_MIN), 1.0 / dt)

        arl = alpha.with_calculated_bcs(
            a_l * rho_l, a_lb * rho2.bvalues,
            DimensionSet.of(1, -3), "alrhol")
        arl = arl.replace(old=arl.replace(old=None))
        ar_phi = SurfaceField(
            fvc.face_values(mesh, arl) * phi2.data,
            phi2.dims * DimensionSet.of(1, -3), "arphi")
        sp_cont = fvc.div(mesh, ar_phi).data / jnp.maximum(
            a_l * rho_l, 1e-8)

        g_prod = a_l * rho_l * (
            self.cmu * kl.data ** 2 / jnp.maximum(epsl.data, _EPS_MIN)
        ) * self._s2(mesh, U2)

        d_eff = Dimensioned(
            "Deff", DimensionSet.of(1, -1, -1),
            fvc.face_values(mesh, alpha.with_calculated_bcs(
                a_l * rho_l * (nu_l + nutl_d),
                a_lb * rho2.bvalues * jnp.mean(nu_l),
                DimensionSet.of(1, -1, -1), "Deff")))

        def scalar_eqn(f, sigma, sp_extra, rhs_data, controls):
            eqn = (fvm.ddt(mesh, f, dt, coeff=arl)
                   + fvm.div(mesh, ar_phi, f, "upwind")
                   - fvm.Sp(mesh, Dimensioned(
                       "spc", DimensionSet.of(1, -3, -1),
                       sp_cont * a_l * rho_l), f)
                   - fvm.laplacian(
                       mesh, Dimensioned("D", d_eff.dims,
                                         d_eff.value / sigma), f,
                       self.lap_corr)
                   + fvm.Sp(mesh, Dimensioned(
                       "sp", DimensionSet.of(1, -3, -1), sp_extra), f))
            rhs = f.with_calculated_bcs(
                rhs_data, jnp.zeros_like(alpha.bvalues),
                DimensionSet.of(1, -3) * f.dims / DimensionSet.of(0, 0, 1))
            return solve(mesh, eqn.equals(rhs), controls)

        # epsilon (kEpsilon + Lahey epsilonSource)
        epsl2 = epsl.replace(old=None).store_old()
        sp_eps = self.c2 * a_l * rho_l * epsl.data \
            / jnp.maximum(kl.data, _K_MIN) + pt
        rhs_eps = self.c1 * g_prod * epsl.data \
            / jnp.maximum(kl.data, _K_MIN) \
            + a_l * rho_l * self.c3 * epsl.data * bubble_g \
            / jnp.maximum(kl.data, _K_MIN) + pt * epsg
        epsl, e_perf = scalar_eqn(epsl2, self.sigma_eps, sp_eps,
                                  rhs_eps, self.eps_controls)
        epsl = epsl.replace(data=jnp.maximum(epsl.data, _EPS_MIN),
                            old=None)

        # k (kEpsilon + Lahey kSource)
        kl2 = kl.replace(old=None).store_old()
        sp_k = a_l * rho_l * epsl.data / jnp.maximum(kl.data, _K_MIN) \
            + pt
        rhs_k = g_prod + a_l * rho_l * bubble_g + pt * kg
        kl, k_perf = scalar_eqn(kl2, self.sigma_k, sp_k, rhs_k,
                                self.k_controls)
        kl = kl.replace(data=jnp.maximum(kl.data, _K_MIN), old=None)

        nutl = self.cmu * kl.data ** 2 \
            / jnp.maximum(epsl.data, _EPS_MIN) \
            + self.cmub * d_g * a_g * ur_mag
        ct2_new = self._ct2(a_g, k_drag, kl.data, epsl.data, rho1.data,
                            rho_l)
        nutg = ct2_new * (nu_l / nu_g) * (
            self.cmu * kl.data ** 2 / jnp.maximum(epsl.data, _EPS_MIN))
        state = {"k": kl, "epsilon": epsl, "ct2": ct2_new}
        return state, nutg, nutl, {"k": k_perf[0],
                                   "epsilon": e_perf[0]}

    @staticmethod
    def _s2(mesh, U):
        g = fvc.grad(mesh, U).data
        two_symm = g + jnp.swapaxes(g, -1, -2)
        tr = two_symm[..., 0, 0] + two_symm[..., 1, 1] \
            + two_symm[..., 2, 2]
        dev = two_symm - (tr / 3.0)[..., None, None] \
            * jnp.eye(3, dtype=g.dtype)
        return (g * dev).sum((-1, -2))


_MODELS = {"mixtureKEpsilon": MixtureKEpsilon,
           "LaheyKEpsilon": LaheyKEpsilon}


def make_phase_turbulence(case, names, cvm: float = 0.5):
    """Read constant/turbulenceProperties.<phase> (either phase may
    carry the selection; reference registers one model per phase but
    mixtureKEpsilon is a single shared system). Returns a model or
    None (laminar)."""
    sel = None
    coeffs = None
    for n in names:
        path = os.path.join(case.dir, "constant",
                            f"turbulenceProperties.{n}")
        if not os.path.isfile(path):
            continue
        d = parse_file(path)
        if str(d.word("simulationType", "laminar")) != "RAS":
            continue
        ras = d.subdict("RAS", required=False)
        if ras is None:
            continue
        model = str(ras.word("RASModel", "laminar"))
        if model in _MODELS:
            sel = model
            coeffs = ras.subdict(f"{model}Coeffs", required=False)
    if sel is None:
        return None
    return _MODELS[sel](case, names, coeffs, cvm)
