"""Straggler turbulence models: the last of the reference's legacy
incompressible RAS/LES zoo.

RAS (reference: src/turbulenceModels/incompressible/RAS/):
  kkLOmega      — Walters-Cokljat 3-equation laminar-kinetic-energy
                  transition model (kkLOmega/kkLOmega.C:630-790).
  LienCubicKE   — cubic nonlinear k-epsilon (LienCubicKE/LienCubicKE.C:
                  330-200) with an explicit nonlinear stress that feeds
                  the momentum equation via the nonlinear_stress hook.

LES (reference: src/turbulenceModels/incompressible/LES/):
  kOmegaSSTSAS            — scale-adaptive SST (kOmegaSSTSAS.C:339-410)
  dynLagrangian           — Lagrangian-averaged dynamic Smagorinsky
                            (dynLagrangian.C:110-165)
  scaleSimilarity         — Bardina scale-similarity stress
                            (scaleSimilarity.C:70-90)
  mixedSmagorinsky        — Smagorinsky + scale-similarity
                            (mixedSmagorinsky.C)
  homogeneousDynSmagorinsky — volume-averaged dynamic coefficient
                            (homogeneousDynSmagorinsky.C:43-100)
  Smagorinsky2            — Smagorinsky with an anisotropic quadratic
                            correction (Smagorinsky2.C:66-95); the
                            correction is carried explicitly here
  spectEddyVisc           — spectral eddy viscosity fixed point
                            (spectEddyVisc.C:40-55)
  SpalartAllmarasIDDES    — improved delayed DES blending
                            (SpalartAllmarasIDDES.C:40-135)

All models follow the module's protocol: correct() is a pure jittable
function over a dict of VolFields. Models whose Reynolds stress is not
a pure eddy-viscosity closure expose nonlinear_stress(mesh, state, U)
(the divDevReff explicit part); solvers subtract its divergence from
the momentum RHS.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.scipy.special import erfc

from ..fields.field import Dimensioned, VolField
from ..linalg.solvers import gsum, solve
from ..ops import fvc, fvm
from ..utils.dictionary import Dictionary
from ..utils.dimensions import DimensionSet, dim_viscosity
from ..utils.registry import register
from .turbulence import (KEpsilon, KOmegaSST, Laminar, OneEqEddy,
                         Smagorinsky, SpalartAllmarasDES, bound, les_delta,
                         magsqr_symm_grad, simple_filter, wall_distance,
                         _RTIME)

_STRESS = DimensionSet.of(0, 2, -2)       # [m2/s2]
_SQRTK = DimensionSet.of(0, 1, -1)        # [m/s]

# LESModel laminar: identical to the RAS laminar no-op
register("LESModel", "laminar")(Laminar)


def _nu_cell(nu):
    return nu.value if isinstance(nu, Dimensioned) else nu.data


def _uniform_like(template: VolField, value: float, dims, name: str):
    """Create a uniform field reusing another field's mesh footprint
    with calculated (zero-order) boundaries."""
    return template.with_calculated_bcs(
        jnp.full_like(template.data, value),
        jnp.full_like(template.bvalues, value), dims, name)


def _sym(t):
    return 0.5 * (t + jnp.swapaxes(t, -1, -2))


def _dev(t):
    tr = jnp.trace(t, axis1=-2, axis2=-1)
    return t - (tr / 3.0)[..., None, None] * jnp.eye(3, dtype=t.dtype)


def _vol_avg(mesh, x):
    """Distribution-correct volume average (gsum rides the psum hook)."""
    return gsum(mesh.V * x) / gsum(mesh.V)


# ---------------------------------------------------------------------------
# RAS: kkLOmega (Walters & Cokljat 2008 transition model)
# ---------------------------------------------------------------------------

@register("RASModel", "kkLOmega")
class KkLOmega:
    """3-equation transitional model: turbulent KE kt, laminar KE kl,
    specific dissipation omega (reference kkLOmega.C:630-790). The
    bypass/natural transition source terms shift energy from kl to kt."""
    needs = ("kt", "kl", "omega", "nut")

    def __init__(self, case, coeffs: Dictionary):
        self.case = case
        c = coeffs or Dictionary()
        g = c.scalar
        self.A0, self.As, self.Av = g("A0", 4.04), g("As", 2.12), \
            g("Av", 6.75)
        self.Abp, self.Anat, self.Ats = g("Abp", 0.6), g("Anat", 200.0), \
            g("Ats", 200.0)
        self.CbpCrit, self.Cnc = g("CbpCrit", 1.2), g("Cnc", 0.1)
        self.CnatCrit, self.Cint = g("CnatCrit", 1250.0), g("Cint", 0.75)
        self.CtsCrit, self.CrNat = g("CtsCrit", 1000.0), g("CrNat", 0.02)
        self.C11, self.C12 = g("C11", 3.4e-6), g("C12", 1.0e-10)
        self.CR, self.CalphaTheta = g("CR", 0.12), g("CalphaTheta", 0.035)
        self.Css, self.CtauL = g("Css", 1.5), g("CtauL", 4360.0)
        self.Cw1, self.Cw2, self.Cw3 = g("Cw1", 0.44), g("Cw2", 0.92), \
            g("Cw3", 0.3)
        self.CwR, self.Clambda = g("CwR", 1.5), g("Clambda", 2.495)
        self.CmuStd, self.Prtheta = g("CmuStd", 0.09), g("Prtheta", 0.85)
        self.sigma_k, self.sigma_w = g("Sigmak", 1.0), g("Sigmaw", 1.17)
        self.k_min, self.omega_min = 1e-15, 1e-10
        self.kt_controls = case.solver_controls("kt")
        self.kl_controls = case.solver_controls("kl")
        self.omega_controls = case.solver_controls("omega")
        self.kt_relax = case.relaxation_factor("kt", default=0.7)
        self.kl_relax = case.relaxation_factor("kl", default=0.7)
        self.omega_relax = case.relaxation_factor("omega", default=0.7)
        try:
            self.div_kt = case.div_scheme("div(phi,kt)")
        except KeyError:
            self.div_kt = case.div_scheme("div(phi,k)")
        try:
            self.div_kl = case.div_scheme("div(phi,kl)")
        except KeyError:
            self.div_kl = self.div_kt
        try:
            self.div_omega = case.div_scheme("div(phi,omega)")
        except KeyError:
            self.div_omega = self.div_kt
        self.lap_corr = case.laplacian_scheme()
        self.ddt_scheme = case.ddt_scheme()
        self.y = jnp.maximum(wall_distance(case), 1e-10)

    def init_state(self, U):
        case = self.case
        s = {}
        for name in self.needs:
            if case.field_exists(name):
                s[name] = case.read_field(name)
            elif name in ("kt", "kl") and case.field_exists("k"):
                k = case.read_field("k")
                val = k if name == "kt" else k.replace(
                    data=jnp.full_like(k.data, 1e-8),
                    bvalues=jnp.full_like(k.bvalues, 1e-8))
                s[name] = val.replace(name=name)
            else:
                raise FileNotFoundError(
                    f"kkLOmega requires field '{name}'")
        return s

    def nut(self, state):
        return state["nut"]

    nu_eff = KEpsilon.nu_eff

    def _diff(self, nut_template, data, bval):
        return nut_template.with_calculated_bcs(
            data, bval, dim_viscosity, "Deff")

    def correct(self, mesh, state, U, phi, nu, dt=None):
        kt, kl, omega, nut = (state["kt"], state["kl"], state["omega"],
                              state["nut"])
        if dt is not None:
            kt, kl, omega = kt.store_old(), kl.store_old(), \
                omega.store_old()
        ddt_scheme = "steadyState" if dt is None else self.ddt_scheme
        dtv = 1.0 if dt is None else dt
        nu_c = _nu_cell(nu)
        y = self.y

        kt_pos = jnp.maximum(kt.data, self.k_min)
        kl_pos = jnp.maximum(kl.data, self.k_min)
        om_pos = jnp.maximum(omega.data, self.omega_min)

        kT = kt_pos + kl_pos
        lambda_t = jnp.sqrt(kT) / om_pos
        lambda_eff = jnp.minimum(self.Clambda * y, lambda_t)
        fw = lambda_eff / jnp.maximum(lambda_t, 1e-30)

        g = fvc.grad(mesh, U).data                    # (n,3,3)
        skew = 0.5 * (g - jnp.swapaxes(g, -1, -2))
        om_vort = jnp.sqrt(2.0 * jnp.maximum(
            (skew * skew).sum((-2, -1)), 0.0))        # sqrt(2)|skew|
        s2 = 2.0 * jnp.maximum(
            (_sym(g) * _sym(g)).sum((-2, -1)), 0.0)
        sqrt_s2 = jnp.sqrt(jnp.maximum(s2, 1e-30))

        fss = jnp.exp(-(self.Css * nu_c * om_vort / kt_pos) ** 2)
        kts = fss * fw * kt_pos
        fv = 1.0 - jnp.exp(-jnp.sqrt(jnp.maximum(
            fw ** 2 * kt_pos / nu_c / om_pos, 0.0)) / self.Av)
        fint = jnp.minimum(kl_pos / (self.Cint * (kl_pos + kt_pos)), 1.0)
        cmu_s = 1.0 / (self.A0 + self.As * (sqrt_s2 / om_pos))
        nuts = fv * fint * cmu_s * jnp.sqrt(jnp.maximum(kts, 0.0)) \
            * lambda_eff
        p_kt = nuts * s2

        ktl = kt_pos - kts
        re_omega = y ** 2 * om_vort / nu_c
        f_taul = 1.0 - jnp.exp(
            -self.CtauL * ktl / jnp.maximum(
                (lambda_eff * om_pos) ** 2, 1e-30))
        beta_ts = 1.0 - jnp.exp(
            -jnp.maximum(re_omega - self.CtsCrit, 0.0) ** 2 / self.Ats)
        nutl = jnp.minimum(
            self.C11 * f_taul * om_vort * lambda_eff ** 2
            * jnp.sqrt(jnp.maximum(ktl, 0.0)) * lambda_eff / nu_c
            + self.C12 * beta_ts * re_omega * y ** 2 * om_vort,
            0.5 * (kl_pos + ktl) / sqrt_s2)
        p_kl = nutl * s2

        alpha_t_eff = fv * self.CmuStd * jnp.sqrt(
            jnp.maximum(kts, 0.0)) * lambda_eff

        fw_eps = fw + 1e-30
        gamma_bp = jnp.clip(
            kt_pos / nu_c / jnp.maximum(om_vort, 1e-30) - self.CbpCrit,
            0.0, 50.0)
        r_bp = self.CR * (1.0 - jnp.exp(-gamma_bp / self.Abp)) \
            * om_pos / fw_eps
        f_nat_crit = 1.0 - jnp.exp(
            -self.Cnc * jnp.sqrt(kl_pos) * y / nu_c)
        gamma_nat = jnp.maximum(
            re_omega - self.CnatCrit / (f_nat_crit + 1e-30), 0.0)
        r_nat = self.CrNat * (1.0 - jnp.exp(-gamma_nat / self.Anat)) \
            * om_vort

        sqrt_kt = kt.with_calculated_bcs(
            jnp.sqrt(kt_pos), jnp.sqrt(jnp.maximum(kt.bvalues, 0.0)),
            _SQRTK, "sqrt(kt)")
        g_skt = fvc.grad(mesh, sqrt_kt).data
        d_t = nu_c * (g_skt * g_skt).sum(-1)
        sqrt_kl = kl.with_calculated_bcs(
            jnp.sqrt(kl_pos), jnp.sqrt(jnp.maximum(kl.bvalues, 0.0)),
            _SQRTK, "sqrt(kl)")
        g_skl = fvc.grad(mesh, sqrt_kl).data
        d_l = nu_c * (g_skl * g_skl).sum(-1)

        nu_b = nu.value if isinstance(nu, Dimensioned) else nu.bvalues
        dk_eff = self._diff(
            nut, alpha_t_eff / self.sigma_k + nu_c,
            jnp.maximum(nut.bvalues, 0.0) / self.sigma_k + nu_b)
        dw_eff = self._diff(
            nut, alpha_t_eff / self.sigma_w + nu_c,
            jnp.maximum(nut.bvalues, 0.0) / self.sigma_w + nu_b)
        dl_eff = self._diff(nut, jnp.zeros_like(nut.data) + nu_c,
                            jnp.zeros_like(nut.bvalues) + nu_b)

        # kt equation
        rhs_kt = kt.with_calculated_bcs(
            p_kt + (r_bp + r_nat) * kl_pos - d_t,
            jnp.zeros_like(kt.bvalues),
            kt.dims / DimensionSet.of(0, 0, 1))
        kt_eqn = (fvm.ddt(mesh, kt, dtv, ddt_scheme)
                  + fvm.div(mesh, phi, kt, self.div_kt)
                  - fvm.laplacian(mesh, dk_eff, kt, self.lap_corr)
                  + fvm.Sp(mesh, Dimensioned("omega", _RTIME, om_pos),
                           kt))
        kt_eqn = kt_eqn.equals(rhs_kt).relax(mesh, self.kt_relax)
        kt_new, kt_perf = solve(mesh, kt_eqn, self.kt_controls,
                                env={"phi": phi})
        kt_new = bound(kt_new, self.k_min)

        # kl equation
        rhs_kl = kl.with_calculated_bcs(
            p_kl - d_l, jnp.zeros_like(kl.bvalues),
            kl.dims / DimensionSet.of(0, 0, 1))
        kl_eqn = (fvm.ddt(mesh, kl, dtv, ddt_scheme)
                  + fvm.div(mesh, phi, kl, self.div_kl)
                  - fvm.laplacian(mesh, dl_eff, kl, self.lap_corr)
                  + fvm.Sp(mesh, Dimensioned("Rbp+Rnat", _RTIME,
                                             r_bp + r_nat), kl))
        kl_eqn = kl_eqn.equals(rhs_kl).relax(mesh, self.kl_relax)
        kl_new, kl_perf = solve(mesh, kl_eqn, self.kl_controls,
                                env={"phi": phi})
        kl_new = bound(kl_new, self.k_min)

        # omega equation
        susp = (self.CwR / fw_eps - 1.0) * kl_pos * (r_bp + r_nat) \
            / kt_pos
        f_omega = 1.0 - jnp.exp(
            -0.41 * (lambda_eff / jnp.maximum(lambda_t, 1e-30)) ** 4)
        rhs_om = omega.with_calculated_bcs(
            self.Cw1 * p_kt * om_pos / kt_pos
            + self.Cw3 * f_omega * alpha_t_eff * fw ** 2
            * jnp.sqrt(kt_pos) / y ** 3,
            jnp.zeros_like(omega.bvalues),
            omega.dims / DimensionSet.of(0, 0, 1))
        om_eqn = (fvm.ddt(mesh, omega, dtv, ddt_scheme)
                  + fvm.div(mesh, phi, omega, self.div_omega)
                  - fvm.laplacian(mesh, dw_eff, omega, self.lap_corr)
                  + fvm.Sp(mesh, Dimensioned("Cw2*omega", _RTIME,
                                             self.Cw2 * om_pos), omega)
                  + fvm.SuSp(mesh, Dimensioned("-(CwR..)", _RTIME,
                                               -susp), omega))
        om_eqn = om_eqn.equals(rhs_om).relax(mesh, self.omega_relax)
        om_new, om_perf = solve(mesh, om_eqn, self.omega_controls,
                                env={"phi": phi})
        om_new = bound(om_new, self.omega_min)

        nut_new = nut.replace(data=nuts + nutl) \
            .correct_boundary_conditions(mesh, env={"k": kt_new,
                                                    "nu": nu})
        new_state = dict(kt=kt_new, kl=kl_new, omega=om_new, nut=nut_new)
        return new_state, {"kt": kt_perf[0], "kl": kl_perf[0],
                           "omega": om_perf[0]}


# ---------------------------------------------------------------------------
# RAS: LienCubicKE (cubic nonlinear k-epsilon)
# ---------------------------------------------------------------------------

@register("RASModel", "LienCubicKE")
class LienCubicKE(KEpsilon):
    """Cubic nonlinear k-epsilon (reference LienCubicKE.C:330-400):
    Cmu becomes a strain/rotation functional, the eddy viscosity gains
    the C5 cubic correction and the quadratic/cubic nonlinearStress
    enters momentum through nonlinear_stress()."""

    def __init__(self, case, coeffs: Dictionary):
        super().__init__(case, coeffs)
        c = coeffs or Dictionary()
        self.A1 = c.scalar("A1", 1.25)
        self.A2 = c.scalar("A2", 1000.0)
        self.Ctau1 = c.scalar("Ctau1", -4.0)
        self.Ctau2 = c.scalar("Ctau2", 13.0)
        self.Ctau3 = c.scalar("Ctau3", -2.0)
        self.alphaKsi = c.scalar("alphaKsi", 0.9)

    def _cubic(self, mesh, U, k_data, eps_data):
        """(Cmu field, nut with C5, nonlinearStress tensor)."""
        k_pos = jnp.maximum(k_data, self.k_min)
        eps_pos = jnp.maximum(eps_data, self.eps_min)
        g = fvc.grad(mesh, U).data                    # grad U (n,3,3)
        sym = _sym(g)
        skw = 0.5 * (g - jnp.swapaxes(g, -1, -2))
        eta = k_pos / eps_pos * jnp.sqrt(
            2.0 * jnp.maximum((sym * sym).sum((-2, -1)), 0.0))
        ksi = k_pos / eps_pos * jnp.sqrt(
            2.0 * jnp.maximum((skw * skw).sum((-2, -1)), 0.0))
        cmu = 2.0 / (3.0 * (self.A1 + eta + self.alphaKsi * ksi))
        f_eta = self.A2 + eta ** 3

        gT = jnp.swapaxes(g, -1, -2)
        gg = jnp.einsum("nij,njk->nik", g, g)
        ggT = jnp.einsum("nij,njk->nik", g, gT)
        gTg = jnp.einsum("nij,njk->nik", gT, g)
        k3e2 = k_pos ** 3 / eps_pos ** 2
        quad = k3e2[:, None, None] / f_eta[:, None, None] * (
            self.Ctau1 * (gg + jnp.swapaxes(gg, -1, -2))
            + self.Ctau2 * ggT + self.Ctau3 * gTg)
        ggg = jnp.einsum("nij,njk->nik", gg, gT)
        ggTgT = jnp.einsum("nij,njk->nik", ggT, gT)
        gTgg = jnp.einsum("nij,njk->nik", gTg, g)
        gTgTg = jnp.einsum("nij,njk->nik",
                           jnp.einsum("nij,njk->nik", gT, gT), g)
        cubic = -20.0 * (k_pos ** 4 / eps_pos ** 3
                         * cmu ** 3)[:, None, None] \
            * (ggg + ggTgT - gTgg - gTgTg)
        nl = _sym(quad + cubic)

        c5 = -2.0 * cmu ** 3 * k_pos ** 4 / eps_pos ** 3 * (
            jnp.maximum(((g + gT) ** 2).sum((-2, -1)), 0.0)
            - jnp.maximum(((g - gT) ** 2).sum((-2, -1)), 0.0))
        nut = cmu * k_pos ** 2 / eps_pos + c5
        return cmu, nut, nl

    def nonlinear_stress(self, mesh, state, U):
        k, eps = state["k"], state["epsilon"]
        _, _, nl = self._cubic(mesh, U, k.data, eps.data)
        return fvc._extrapolated(mesh, nl, _STRESS, "nonlinearStress")

    def _production(self, mesh, state, U, s2):
        """G = Cmu*k^2/eps*(symm(gradU)&&gradU) - NL&&gradU
        (reference LienCubicKE.C:361-366; s2 = 2|symm|^2 so the first
        term uses s2/2)."""
        k, eps = state["k"], state["epsilon"]
        cmu, _, nl = self._cubic(mesh, U, k.data, eps.data)
        g = fvc.grad(mesh, U).data
        k_pos = jnp.maximum(k.data, self.k_min)
        eps_pos = jnp.maximum(eps.data, self.eps_min)
        return cmu * k_pos ** 2 / eps_pos * (0.5 * s2) \
            - (nl * g).sum((-2, -1))

    def _nut_from(self, mesh, U, k, eps):
        _, nut, _ = self._cubic(mesh, U, k.data, eps.data)
        return jnp.maximum(nut, 0.0)


# ---------------------------------------------------------------------------
# LES: kOmegaSSTSAS (scale-adaptive simulation)
# ---------------------------------------------------------------------------

@register("LESModel", "kOmegaSSTSAS")
class KOmegaSSTSAS(KOmegaSST):
    """SST-SAS (reference kOmegaSSTSAS.C:339-410): SST with the
    von-Karman-length-scale QSAS source unlocking LES-like behaviour
    in detached regions. Implemented through KOmegaSST's _omega_extra
    hook."""
    alphaK1, alphaK2 = 0.85034, 1.0
    alphaOmega1, alphaOmega2 = 0.5, 0.85616
    gamma1, gamma2 = 0.5532, 0.4403

    def __init__(self, case, coeffs: Dictionary):
        super().__init__(case, coeffs)
        c = coeffs or Dictionary()
        self.Cs_sas = c.scalar("Cs", 0.262)
        self.alphaPhi = c.scalar("alphaPhi", 0.666667)
        self.zetaTilda2 = c.scalar("zetaTilda2", 1.755)
        self.FSAS = c.scalar("FSAS", 1.25)
        self.Cmu_sas = c.scalar("Cmu", 0.09)
        self.kappa = c.scalar("kappa", 0.41)
        self.delta = les_delta(case, c)

    def _omega_extra(self, mesh, U, k_pos, om_pos, gk, gom, s2):
        L = jnp.sqrt(k_pos) / (self.Cmu_sas ** 0.25 * om_pos)
        lap_u = fvc.laplacian(mesh, 1.0, U).data       # (n,3)
        mag_lap = jnp.sqrt(jnp.maximum(
            (lap_u * lap_u).sum(-1), 1e-60))
        lvk2 = jnp.maximum(
            self.kappa * jnp.sqrt(jnp.maximum(s2, 0.0)) / mag_lap,
            self.Cs_sas * self.delta)
        grad_ok = jnp.maximum(
            (gom.data * gom.data).sum(-1) / om_pos ** 2,
            (gk.data * gk.data).sum(-1) / jnp.maximum(k_pos,
                                                      self.k_min) ** 2)
        qsas = self.zetaTilda2 * self.kappa * s2 * (L / lvk2) ** 2 \
            - 2.0 / self.alphaPhi * k_pos * grad_ok
        return self.FSAS * jnp.maximum(qsas, 0.0)


# ---------------------------------------------------------------------------
# LES: dynLagrangian (Lagrangian-averaged dynamic Smagorinsky)
# ---------------------------------------------------------------------------

_F4 = DimensionSet.of(0, 4, -4)          # flm/fmm [m4/s4]


@register("LESModel", "dynLagrangian")
class DynLagrangian:
    """Meneveau-Lund-Cabot dynamic model (reference dynLagrangian.C:
    110-165): the Germano numerator/denominator LM, MM are relaxed
    along pathlines by transporting flm, fmm with timescale
    T = theta*delta*(flm*fmm)^(-1/8); nuSgs = (flm/fmm) delta^2 |dev S|."""
    needs = ("flm", "fmm", "nut")

    def __init__(self, case, coeffs: Dictionary):
        self.case = case
        c = coeffs or Dictionary()
        self.theta = c.scalar("theta", 1.5)
        self.delta = les_delta(case, c)
        self.flm_controls = case.solver_controls("flm")
        self.fmm_controls = case.solver_controls("fmm")
        try:
            self.div_f = case.div_scheme("div(phi,flm)")
        except KeyError:
            self.div_f = case.div_scheme("div(phi,k)")
        self.ddt_scheme = case.ddt_scheme()
        self.fmm0 = 1e-30

    def init_state(self, U):
        case = self.case
        s = {"nut": case.read_field("nut")}
        for name, v in (("flm", 0.0256), ("fmm", 1.0)):
            if case.field_exists(name):
                s[name] = case.read_field(name)
            else:
                # classic Smagorinsky ratio flm/fmm = (0.16)^2 bootstrap
                s[name] = _uniform_like(s["nut"], v, _F4, name)
        return s

    def nut(self, state):
        return state["nut"]

    nu_eff = KEpsilon.nu_eff

    def correct(self, mesh, state, U, phi, nu, dt=None):
        flm, fmm, nut = state["flm"], state["fmm"], state["nut"]
        if dt is not None:
            flm, fmm = flm.store_old(), fmm.store_old()
        ddt_scheme = "steadyState" if dt is None else self.ddt_scheme
        dtv = 1.0 if dt is None else dt
        d = self.delta

        g = fvc.grad(mesh, U).data
        S = _dev(_sym(g))
        magS = jnp.sqrt(jnp.maximum((S * S).sum((-2, -1)), 0.0))
        u = U.data
        uf = simple_filter(mesh, u)
        gf = fvc.grad(mesh, U.replace(data=uf)).data
        Sf = _dev(_sym(gf))
        magSf = jnp.sqrt(jnp.maximum((Sf * Sf).sum((-2, -1)), 0.0))
        uu = u[:, :, None] * u[:, None, :]
        L = _dev(simple_filter(mesh, uu) - uf[:, :, None] * uf[:, None, :])
        M = 2.0 * (d ** 2)[:, None, None] * (
            simple_filter(mesh, magS[:, None, None] * S)
            - 4.0 * magSf[:, None, None] * Sf)
        LM = (L * M).sum((-2, -1))
        MM = (M * M).sum((-2, -1))
        inv_t = (1.0 / (self.theta * d)) * jnp.maximum(
            flm.data * fmm.data, 0.0) ** 0.125

        def transport(f, src, controls):
            rhs = f.with_calculated_bcs(
                inv_t * src, jnp.zeros_like(f.bvalues),
                f.dims / DimensionSet.of(0, 0, 1))
            eqn = (fvm.ddt(mesh, f, dtv, ddt_scheme)
                   + fvm.div(mesh, phi, f, self.div_f)
                   + fvm.Sp(mesh, Dimensioned("1/T", _RTIME, inv_t), f))
            out, perf = solve(mesh, eqn.equals(rhs), controls,
                              env={"phi": phi})
            return out, perf

        flm_new, flm_perf = transport(flm, LM, self.flm_controls)
        flm_new = bound(flm_new, 0.0)
        fmm_new, fmm_perf = transport(fmm, MM, self.fmm_controls)
        fmm_new = bound(fmm_new, self.fmm0)

        nut_data = jnp.maximum(
            flm_new.data / jnp.maximum(fmm_new.data, self.fmm0), 0.0) \
            * d ** 2 * magS
        nut_new = nut.replace(data=nut_data).correct_boundary_conditions(
            mesh, env={"k": flm_new, "nu": nu})
        return dict(flm=flm_new, fmm=fmm_new, nut=nut_new), \
            {"flm": flm_perf[0], "fmm": fmm_perf[0]}


# ---------------------------------------------------------------------------
# LES: scaleSimilarity / mixedSmagorinsky / Smagorinsky2
# ---------------------------------------------------------------------------

@register("LESModel", "scaleSimilarity")
class ScaleSimilarity:
    """Bardina scale-similarity (reference scaleSimilarity.C:70-90):
    no eddy viscosity; the whole SGS stress is the explicit
    B = filter(UU) - filter(U)filter(U), fed to momentum via
    nonlinear_stress (divDevReff == Su(div(dev(B)), U))."""
    needs = ()

    def __init__(self, case, coeffs: Dictionary):
        self.case = case

    def init_state(self, U):
        return {}

    def nut(self, state):
        return None

    def nu_eff(self, mesh, state, nu):
        return nu

    def _B(self, mesh, U):
        u = U.data
        uf = simple_filter(mesh, u)
        uu = u[:, :, None] * u[:, None, :]
        return simple_filter(mesh, uu) - uf[:, :, None] * uf[:, None, :]

    def nonlinear_stress(self, mesh, state, U):
        return fvc._extrapolated(mesh, _dev(self._B(mesh, U)), _STRESS,
                                 "devB")

    def correct(self, mesh, state, U, phi, nu, dt=None):
        return state, {}


@register("LESModel", "mixedSmagorinsky")
class MixedSmagorinsky(Smagorinsky):
    """Linear-combination model (reference mixedSmagorinsky.C):
    Smagorinsky eddy viscosity + scale-similarity explicit stress."""

    def nonlinear_stress(self, mesh, state, U):
        return fvc._extrapolated(
            mesh, _dev(ScaleSimilarity._B(self, mesh, U)), _STRESS,
            "devB")


@register("LESModel", "Smagorinsky2")
class Smagorinsky2(Smagorinsky):
    """Smagorinsky with an anisotropic quadratic term (reference
    Smagorinsky2.C:66-95): B gains -2*cD2*delta*(D&D); the reference
    treats it as an anisotropic implicit diffusivity, here it is the
    explicit nonlinear stress (equivalent explicit splitting)."""

    def __init__(self, case, coeffs: Dictionary):
        super().__init__(case, coeffs)
        c = coeffs or Dictionary()
        self.cd2 = c.scalar("cD2", 0.02)

    def nonlinear_stress(self, mesh, state, U):
        g = fvc.grad(mesh, U).data
        D = _dev(_sym(g))
        DD = jnp.einsum("nij,njk->nik", D, D)
        nl = -2.0 * self.cd2 * self.delta[:, None, None] * DD
        return fvc._extrapolated(mesh, nl, _STRESS, "aniB")


# ---------------------------------------------------------------------------
# LES: homogeneousDynSmagorinsky
# ---------------------------------------------------------------------------

@register("LESModel", "homogeneousDynSmagorinsky")
class HomogeneousDynSmagorinsky:
    """Dynamic Smagorinsky with volume-averaged (homogeneous-flow)
    coefficient (reference homogeneousDynSmagorinsky.C:43-100):
    cD = 0.5 <LL:MM>/<MM:MM>, nuSgs = cD*delta^2*|D|. The averages use
    gsum so the model is decomposition-correct under shard_map."""
    needs = ("nut",)

    def __init__(self, case, coeffs: Dictionary):
        self.case = case
        c = coeffs or Dictionary()
        self.delta = les_delta(case, c)

    def init_state(self, U):
        return {"nut": self.case.read_field("nut")}

    def nut(self, state):
        return state["nut"]

    nu_eff = KEpsilon.nu_eff

    def correct(self, mesh, state, U, phi, nu, dt=None):
        nut = state["nut"]
        d = self.delta
        u = U.data
        g = fvc.grad(mesh, U).data
        D = _dev(_sym(g))
        magD = jnp.sqrt(jnp.maximum((D * D).sum((-2, -1)), 0.0))
        Df = simple_filter(mesh, D)
        magDf = jnp.sqrt(jnp.maximum((Df * Df).sum((-2, -1)), 0.0))
        MM = (d ** 2)[:, None, None] * (
            simple_filter(mesh, magD[:, None, None] * D)
            - 4.0 * magDf[:, None, None] * Df)
        uf = simple_filter(mesh, u)
        LL = _dev(simple_filter(mesh, u[:, :, None] * u[:, None, :])
                  - uf[:, :, None] * uf[:, None, :])
        mmmm = _vol_avg(mesh, (MM * MM).sum((-2, -1)))
        llmm = _vol_avg(mesh, (LL * MM).sum((-2, -1)))
        cd = jnp.where(mmmm > 1e-30, 0.5 * llmm / jnp.maximum(
            mmmm, 1e-30), 0.0)
        nut_data = jnp.maximum(cd, 0.0) * d ** 2 * magD
        nut_new = nut.replace(data=nut_data).correct_boundary_conditions(
            mesh, env={"k": nut.replace(data=nut_data), "nu": nu})
        return {"nut": nut_new}, {}


# ---------------------------------------------------------------------------
# LES: spectEddyVisc
# ---------------------------------------------------------------------------

@register("LESModel", "spectEddyVisc")
class SpectEddyVisc:
    """Spectral eddy viscosity (reference spectEddyVisc.C:40-55):
    nuSgs solves the implicit relation
    nuSgs = nu/(1 - exp(-cB*(nu/(nuSgs+nu))^(1/3)*Re^(-2/3)))
    by 5 fixed-point sweeps (unrolled; jit-friendly)."""
    needs = ("nut",)

    def __init__(self, case, coeffs: Dictionary):
        self.case = case
        c = coeffs or Dictionary()
        self.cB = c.scalar("cB", 8.22)
        self.cK1 = c.scalar("cK1", 0.83)
        self.cK2 = c.scalar("cK2", 1.03)
        self.cK3 = c.scalar("cK3", 4.75)
        self.cK4 = c.scalar("cK4", 2.55)
        self.delta = les_delta(case, c)

    def init_state(self, U):
        return {"nut": self.case.read_field("nut")}

    def nut(self, state):
        return state["nut"]

    nu_eff = KEpsilon.nu_eff

    def k_sgs(self, mesh, state, U, nu):
        """Kraichnan-spectrum SGS energy estimate (reference k())."""
        nu_c = _nu_cell(nu)
        d = self.delta
        g = fvc.grad(mesh, U).data
        sym2 = jnp.maximum((_sym(g) * _sym(g)).sum((-2, -1)), 0.0)
        nu_eff = state["nut"].data + nu_c
        eps = jnp.maximum(2.0 * nu_eff * sym2, 1e-30)
        return (self.cK1 * (d * eps) ** (2.0 / 3.0)
                * jnp.exp(-self.cK2 * d ** (-4.0 / 3.0) * nu_c
                          / eps ** (1.0 / 3.0))
                - self.cK3 * jnp.sqrt(eps * nu_c)
                * erfc(self.cK4 * d ** (-2.0 / 3.0) * jnp.sqrt(nu_c)
                       * eps ** (-1.0 / 6.0)))

    def correct(self, mesh, state, U, phi, nu, dt=None):
        nut = state["nut"]
        nu_c = _nu_cell(nu)
        g = fvc.grad(mesh, U).data
        mag_sym = jnp.sqrt(jnp.maximum(
            (_sym(g) * _sym(g)).sum((-2, -1)), 0.0))
        re = jnp.maximum(self.delta ** 2 * mag_sym / nu_c, 1e-10)
        nut_data = jnp.maximum(nut.data, 0.0)
        for _ in range(5):
            denom = 1.0 - jnp.exp(
                -self.cB * (nu_c / (nut_data + nu_c)) ** (1.0 / 3.0)
                * re ** (-2.0 / 3.0))
            nut_data = nu_c / jnp.maximum(denom, 1e-10)
        nut_new = nut.replace(data=nut_data).correct_boundary_conditions(
            mesh, env={"k": nut.replace(data=nut_data), "nu": nu})
        return {"nut": nut_new}, {}


# ---------------------------------------------------------------------------
# LES: SpalartAllmarasIDDES
# ---------------------------------------------------------------------------

@register("LESModel", "SpalartAllmarasIDDES")
class SpalartAllmarasIDDES(SpalartAllmarasDES):
    """Improved delayed DES (reference SpalartAllmarasIDDES.C:40-135):
    d_tilde blends RANS and LES length scales with the fHyb/fRestore
    wall-modelled-LES machinery; hmax is the maxDeltaxyz delta."""

    def __init__(self, case, coeffs: Dictionary):
        super().__init__(case, coeffs)
        c = coeffs or Dictionary()
        self.fwStar = c.scalar("fwStar", 0.424)
        self.cl = c.scalar("cl", 3.55)
        self.ct = c.scalar("ct", 1.63)
        self.cw_iddes = c.scalar("Cw", 0.15)
        mesh = case.mesh
        cf = jnp.take(mesh.Cf, mesh.cell_faces, axis=0)
        dd = jnp.abs(cf - mesh.C[:, None, :])
        active = jnp.abs(mesh.cell_sign)[:, :, None]
        self.hmax = 2.0 * (dd * active).max((1, 2))
        # IDDESDelta: min(max(Cw*d, Cw*hmax), hmax)
        self.delta = jnp.minimum(
            jnp.maximum(jnp.maximum(self.cw_iddes * self.y,
                                    self.cw_iddes * self.hmax),
                        jnp.minimum(self.y, self.hmax)), self.hmax)

    def _rd(self, visc, mag_grad):
        return jnp.minimum(
            visc / (jnp.maximum(mag_grad, 1e-30)
                    * (self.kappa * self.y) ** 2 + 1e-30), 10.0)

    def _d_tilde(self, mesh, state):
        nu_tilda = state["nuTilda"]
        U = state.get("_U")
        nu_c = state.get("_nu_c", 1e-5)
        if U is None:
            return jnp.minimum(self.y, self.cdes * self.delta)
        g = fvc.grad(mesh, U).data
        mag_grad = jnp.sqrt(jnp.maximum((g * g).sum((-2, -1)), 1e-30))
        nt_pos = jnp.maximum(nu_tilda.data, 0.0)

        alpha = jnp.maximum(0.25 - self.y / jnp.maximum(self.hmax,
                                                        1e-30), -5.0)
        exp_a2 = jnp.exp(alpha ** 2)
        f_hill = 2.0 * jnp.where(alpha >= 0.0, exp_a2 ** -11.09,
                                 exp_a2 ** -9.0)
        f_step = jnp.minimum(2.0 * exp_a2 ** -9.0, 1.0)
        fd = 1.0 - jnp.tanh((8.0 * self._rd(nt_pos + nu_c,
                                            mag_grad)) ** 3)
        f_hyb = jnp.maximum(1.0 - fd, f_step)
        ft = jnp.tanh((self.ct ** 2
                       * self._rd(nt_pos, mag_grad)) ** 3)
        fl = jnp.tanh((self.cl ** 2
                       * self._rd(nu_c, mag_grad)) ** 10)
        f_amp = 1.0 - jnp.maximum(ft, fl)
        f_restore = jnp.maximum(f_hill - 1.0, 0.0) * f_amp

        chi = nt_pos / nu_c
        fv1 = chi ** 3 / (chi ** 3 + self.cv1 ** 3)
        fv2 = 1.0 - chi / (1.0 + chi * fv1)
        psi = jnp.sqrt(jnp.minimum(
            100.0,
            (1.0 - self.cb1 / (self.cw1 * self.kappa ** 2
                               * self.fwStar) * fv2)
            / jnp.maximum(fv1, 1e-10)))
        return jnp.maximum(
            f_hyb * (1.0 + f_restore * psi) * self.y
            + (1.0 - f_hyb) * self.cdes * psi * self.delta, 1e-10)

    def correct(self, mesh, state, U, phi, nu, dt=None):
        state = dict(state, _U=U, _nu_c=_nu_cell(nu))
        new, perf = super().correct(mesh, state, U, phi, nu, dt=dt)
        new.pop("_U", None)
        new.pop("_nu_c", None)
        return new, perf
