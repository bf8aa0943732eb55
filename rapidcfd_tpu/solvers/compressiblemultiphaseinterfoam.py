"""compressibleMultiphaseInterFoam — N compressible immiscible phases
(VOF) with per-phase rhoThermo.

Capability parity with the reference solver (reference:
applications/solvers/multiphase/compressibleMultiphaseInterFoam/
compressibleMultiphaseInterFoam.C with multiphaseMixtureThermo/
multiphaseMixtureThermo.C:934-1117 (solveAlphas: per-phase MULES with
pairwise compression and per-phase dgdt dilatation sources), TEqn.H
(mixture temperature with pressure/kinetic work scaled by
rCv = sum(alpha_i/Cv_i)), pEqn.H (per-phase compressibility
contributions (max(alpha_i,0)/rho_i)*p_rghEqnComp_i added to the
incompressible Poisson operator)).

Per-phase thermo from constant/thermophysicalProperties.<phase>
(PhaseRhoThermo); pairwise sigmas from
constant/thermophysicalProperties `sigmas ((a b) v ...)`.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from ..fields.field import Dimensioned, SurfaceField, VolField
from ..linalg import solve
from ..linalg.solvers import gsum
from ..models.thermo import read_rho_thermo
from ..ops import fvc, fvm
from ..ops.mules import explicit_solve
from ..utils.dictionary import parse_file
from ..utils.dimensions import (DimensionSet, dim_density,
                                dim_dynamic_viscosity)
from ..utils.logging import (ExecutionTimer, info, log_courant, log_solve)
from .case import Case
from .controls import PimpleControl
from .icofoam import courant_number
from .multiphaseinterfoam import _read_sigmas

_DELTA_N = 1e-8


def _read_setup(case: Case):
    props = case.constant_dict("thermophysicalProperties")
    names = [str(x) for x in props.lookup("phases", required=True)]
    thermos = [read_rho_thermo(parse_file(os.path.join(
        case.dir, "constant", f"thermophysicalProperties.{n}")))
        for n in names]
    sigmas = _read_sigmas(props, names)
    pmin_e = props.lookup("pMin", required=False)
    pmin = Dimensioned.from_entry(pmin_e).value if pmin_e is not None \
        else 10000.0
    gpath = os.path.join(case.dir, "constant", "g")
    g = [float(x) for x in parse_file(gpath).lookup("value")] \
        if os.path.isfile(gpath) else [0.0, -9.81, 0.0]
    return names, thermos, sigmas, pmin, g


def make_step(case: Case, setup, ctrl: PimpleControl):
    mesh = case.mesh
    names, thermos, sigmas, p_min, g = setup
    n_ph = len(names)
    solvers_d = case.fv_solution.subdict("solvers")
    a_d = (solvers_d.lookup(f"alpha.{names[0]}")
           or solvers_d.lookup("alpha1") or solvers_d.lookup("alpha"))
    c_alpha = float(a_d.scalar("cAlpha", 1.0)) if a_d else 1.0
    lap_corr = case.laplacian_scheme()
    p_controls = case.solver_controls("p_rgh")
    p_final = case.solver_controls("p_rgh", final=True)
    t_controls = case.solver_controls("T")
    n_outer = ctrl.n_outer
    n_corr = ctrl.n_correctors
    n_non_orth = ctrl.n_non_orth
    gh = (mesh.C * jnp.asarray(g, mesh.C.dtype)).sum(-1)
    ghf = (mesh.Cf * jnp.asarray(g, mesh.C.dtype)).sum(-1)
    _DN = DimensionSet

    def calc(like, data, bdata, dims, name):
        return like.with_calculated_bcs(data, bdata, dims, name)

    def phase_rhos(like, p, T):
        return [calc(like, m.rho(p.data, T.data),
                     m.rho(p.bvalues, T.bvalues), dim_density,
                     f"rho.{nm}")
                for m, nm in zip(thermos, names)]

    def nhatf(a, b):
        """multiphaseMixtureThermo::nHatfv pairwise interface normal."""
        ga = fvc.face_values(mesh, fvc.grad(mesh, a))
        gb = fvc.face_values(mesh, fvc.grad(mesh, b))
        a_f = fvc.face_values(mesh, a)
        b_f = fvc.face_values(mesh, b)
        v = b_f[:, None] * ga - a_f[:, None] * gb
        mag = jnp.linalg.norm(v, axis=-1) + _DELTA_N
        return (v / mag[:, None] * mesh.Sf).sum(-1), v / mag[:, None]

    def surface_tension(alphas):
        stf = jnp.zeros(mesh.n_faces, mesh.V.dtype)
        for (i, j), sig in sigmas.items():
            a, b = alphas[i], alphas[j]
            _, nhatv = nhatf(a, b)
            kappa = -fvc.surface_sum_faces(
                mesh, (nhatv * mesh.Sf).sum(-1)) / mesh.V
            w = mesh.weights
            own = mesh.owner[:mesh.n_internal]
            k_int = w * jnp.take(kappa, own) \
                + (1 - w) * jnp.take(kappa, mesh.neighbour)
            k_b = jnp.take(kappa, mesh.owner[mesh.n_internal:])
            kf = jnp.concatenate([k_int, k_b])
            b_f = fvc.face_values(mesh, b)
            a_f = fvc.face_values(mesh, a)
            stf = stf + sig * kf * (
                b_f * fvc.sn_grad(mesh, a).data
                - a_f * fvc.sn_grad(mesh, b).data)
        return stf

    @jax.jit
    def step(alphas, U: VolField, p_rgh: VolField, p: VolField,
             T: VolField, rhos, phi: SurfaceField, dgdts, dt):
        U = U.store_old()
        T = T.store_old()
        alphas = [a.store_old() for a in alphas]
        rhos = [r.store_old() for r in rhos]
        rhos_old = [r.old for r in rhos]
        a0 = alphas[0]
        rho_in_d = sum(a.data * r.data for a, r in zip(alphas, rhos))
        rho_in_b = sum(a.bvalues * r.bvalues
                       for a, r in zip(alphas, rhos))
        rho_in = calc(a0, rho_in_d, rho_in_b, dim_density, "rho")
        k_old = 0.5 * (U.old.data * U.old.data).sum(-1)
        phi_old = phi.data

        p_perf_all, t_perf_all = [], []
        for outer in range(n_outer):
            # ---- solveAlphas (multiphaseMixtureThermo.C:934-1117)
            divu = fvc.div(mesh, phi).data
            phic = jnp.minimum(
                c_alpha * jnp.abs(phi.data)
                / jnp.maximum(mesh.mag_sf, 1e-30),
                (jnp.abs(phi.data)
                 / jnp.maximum(mesh.mag_sf, 1e-30)).max())
            new_alphas, lim_fluxes = [], []
            for i, a in enumerate(alphas):
                sp = jnp.zeros_like(a.data)
                su = divu * jnp.minimum(a.data, 1.0)
                di = dgdts[i]
                c_neg = (di < 0.0) & (a.data > 0.0)
                c_pos = (di > 0.0) & (a.data < 1.0)
                sp = sp + jnp.where(c_neg, di * a.data, 0.0) \
                    - jnp.where(c_pos, di * (1.0 - a.data), 0.0)
                su = su - jnp.where(c_neg, di * a.data, 0.0)
                for j in range(n_ph):
                    if j == i:
                        continue
                    dj = dgdts[j]
                    aj = alphas[j].data
                    cj_pos = (dj > 0.0) & (aj < 1.0)
                    cj_neg = (dj < 0.0) & (aj > 0.0)
                    sp = sp - jnp.where(cj_pos, dj * (1.0 - aj), 0.0) \
                        + jnp.where(cj_neg, dj * aj, 0.0)
                    su = su + jnp.where(cj_pos, dj * a.data, 0.0)
                a_f = fvc.face_values(mesh, a, "vanLeer", phi)
                flux_a = phi.data * a_f
                for j in range(n_ph):
                    if j == i:
                        continue
                    nhf, _ = nhatf(a, alphas[j])
                    phir = (phic * nhf).at[mesh.n_internal:].set(0.0)
                    a_lin = fvc.face_values(mesh, a)
                    b_lin = fvc.face_values(mesh, alphas[j])
                    flux_a = flux_a + phir * a_lin * b_lin
                a_new, lim = explicit_solve(
                    mesh, a, phi,
                    SurfaceField(flux_a, phi.dims, "phiAlpha"), dt,
                    sp=sp, su=su)
                new_alphas.append(a_new)
                lim_fluxes.append(lim.data)
            # renormalise the phase sum (the reference's limitSum)
            asum = sum(a.data for a in new_alphas)
            asum_b = sum(a.bvalues for a in new_alphas)
            alphas = [a.replace(
                data=jnp.clip(a.data / jnp.maximum(asum, 1e-6), 0.0,
                              1.0),
                bvalues=jnp.clip(
                    a.bvalues / jnp.maximum(asum_b, 1e-6), 0.0, 1.0))
                for a in new_alphas]
            rho_phi_d = sum(
                fvc.face_values(mesh, r) * lf
                for r, lf in zip(rhos, lim_fluxes))
            rho_phi = SurfaceField(rho_phi_d, phi.dims * dim_density,
                                   "rhoPhi")

            # rho continuity update
            rho_data = rho_in.data \
                - dt * fvc.surface_sum_faces(mesh, rho_phi.data) / mesh.V
            rho = calc(a0, rho_data, rho_in.bvalues, dim_density,
                       "rho").replace(old=rho_in.replace(old=None))

            # ---- UEqn.H
            mu_d = sum(a.data * m.mu(T.data)
                       for a, m in zip(alphas, thermos))
            mu_b = sum(a.bvalues * m.mu(T.bvalues)
                       for a, m in zip(alphas, thermos))
            mu = calc(a0, mu_d, mu_b, dim_dynamic_viscosity, "mu")
            mu_f = Dimensioned("muf", dim_dynamic_viscosity,
                               fvc.face_values(mesh, mu))
            UEqn = (fvm.ddt(mesh, U, dt, coeff=rho)
                    + fvm.div(mesh, rho_phi, U, "upwind")
                    - fvm.laplacian(mesh, mu_f, U, lap_corr))

            # ---- TEqn.H
            k = 0.5 * (U.data * U.data).sum(-1)
            K = calc(a0, k, 0.5 * (U.bvalues * U.bvalues).sum(-1),
                     _DN.of(0, 2, -2), "K")
            p_work = fvc.div(mesh, phi, p, "upwind").data \
                + (rho.data * k - rho.old.data * k_old) / dt \
                + fvc.div(mesh, rho_phi, K, "upwind").data
            rcv = sum(a.data / m.cv for a, m in zip(alphas, thermos))
            a_eff_d = sum(a.data * m.alpha_h(T.data)
                          for a, m in zip(alphas, thermos))
            a_eff_b = sum(a.bvalues * m.alpha_h(T.bvalues)
                          for a, m in zip(alphas, thermos))
            aef = Dimensioned(
                "alphaEfff", dim_dynamic_viscosity,
                fvc.face_values(mesh, calc(
                    a0, a_eff_d, a_eff_b, dim_dynamic_viscosity,
                    "alphaEff")))
            TEqn = (fvm.ddt(mesh, T, dt, coeff=rho)
                    + fvm.div(mesh, rho_phi, T, "upwind")
                    - fvm.laplacian(mesh, aef, T, lap_corr))
            rhs = calc(a0, -p_work * rcv, jnp.zeros_like(a0.bvalues),
                       TEqn.dims / _DN.of(0, 3), "Tsrc")
            T, t_perf = solve(mesh, TEqn.equals(rhs), t_controls)
            t_perf_all.append(t_perf[0])
            # mixture.correct()
            rhos = [r.replace(old=ro) for r, ro in
                    zip(phase_rhos(a0, p, T), rhos_old)]
            psis = [m.psi(T.data) for m in thermos]

            # ---- pEqn.H
            for corr in range(n_corr):
                UEqn_c = UEqn.replace(psi=U)
                divu_c = fvc.div(mesh, phi).data
                rAU = 1.0 / UEqn_c.A(mesh)
                rAU_f = fvc.face_values(mesh, rAU)
                HbyA = fvc.constrain_hbya(mesh, rAU * UEqn_c.H(mesh), U)
                phi_hbya = fvc.flux(mesh, HbyA)
                uf_old = fvc.flux(mesh, U.old).data
                dphi = phi_old - uf_old
                coeff = 1.0 - jnp.minimum(
                    jnp.abs(dphi) / (jnp.abs(phi_old) + 1e-30), 1.0)
                ddt_corr = fvc.face_values(mesh, rho * rAU) \
                    * coeff * dphi / dt
                stf = surface_tension(alphas)
                sng_rho = fvc.sn_grad(mesh, rho)
                phig = (stf - ghf * sng_rho.data) * rAU_f * mesh.mag_sf
                phig = phig.at[mesh.n_internal:].set(0.0)
                phi_hbya = SurfaceField(
                    phi_hbya.data + ddt_corr + phig, phi.dims,
                    "phiHbyA")

                rates = []
                d_comp = jnp.zeros_like(a0.data)
                expl = jnp.zeros_like(a0.data)
                for a, r, ro, psi in zip(alphas, rhos, rhos_old, psis):
                    rate = (r.data - ro.data) / dt \
                        + fvc.div(mesh, phi, r, "upwind").data \
                        - divu_c * r.data
                    s = jnp.maximum(a.data, 0.0) \
                        / jnp.maximum(r.data, 1e-6)
                    d_comp = d_comp + s * psi * mesh.V / dt
                    expl = expl + s * rate * mesh.V
                    rates.append(rate)

                for north in range(n_non_orth + 1):
                    final = corr == n_corr - 1 and north == n_non_orth
                    L = fvm.laplacian(mesh, rAU, p_rgh, lap_corr)
                    div_hbya = fvc.surface_sum_faces(mesh,
                                                     phi_hbya.data)
                    pEqn = L.replace(
                        diag=L.diag - d_comp,
                        source=L.source + expl - d_comp * p_rgh.data
                        + div_hbya,
                        symmetric=False)
                    p_cur = p_rgh.data
                    p_rgh, p_perf = solve(
                        mesh, pEqn, p_final if final else p_controls)
                    p_perf_all.append(p_perf[0])
                dp_rate = (p_rgh.data - p_cur) / dt
                dgdts = [jnp.where(a.data > 0.0, 1.0, 0.0)
                         * (rate + psi * dp_rate)
                         / jnp.maximum(r.data, 1e-6)
                         for a, r, psi, rate in
                         zip(alphas, rhos, psis, rates)]
                flux_p = pEqn.replace(psi=p_rgh).flux(mesh)
                phi = SurfaceField(phi_hbya.data - flux_p.data,
                                   phi.dims, "phi")
                corr_f = SurfaceField(
                    (phig - flux_p.data) / jnp.maximum(rAU_f, 1e-30),
                    phi.dims / rAU.dims, "corrF")
                U_star = HbyA + rAU * fvc.reconstruct(mesh, corr_f)
                U = U.replace(data=U_star.data) \
                     .correct_boundary_conditions(mesh)
                rho = calc(a0,
                           sum(a.data * r.data
                               for a, r in zip(alphas, rhos)),
                           sum(a.bvalues * r.bvalues
                               for a, r in zip(alphas, rhos)),
                           dim_density, "rho").replace(old=rho.old)
                p_new = jnp.maximum(p_rgh.data + rho.data * gh, p_min)
                p = p.replace(data=p_new) \
                     .correct_boundary_conditions(mesh)
                p_rgh = p_rgh.replace(data=p.data - rho.data * gh) \
                    .correct_boundary_conditions(mesh)
                rhos = [r.replace(old=ro) for r, ro in
                        zip(phase_rhos(a0, p, T), rhos_old)]

        co_mean, co_max = courant_number(mesh, phi, dt)
        stats = dict(
            p_perf=tuple(p_perf_all), t_perf=tuple(t_perf_all),
            co=(co_mean, co_max),
            fracs=tuple(gsum(a.data * mesh.V) for a in alphas),
            minmax=tuple((a.data.min(), a.data.max()) for a in alphas),
            p_minmax=(p.data.min(), p.data.max()))
        return alphas, U, p_rgh, p, T, rhos, phi, dgdts, stats

    return step


def run(case_dir: str, write: bool = True, max_steps: int | None = None):
    case = Case(case_dir)
    mesh = case.mesh
    setup = _read_setup(case)
    names, thermos, sigmas, p_min, g = setup
    info(f"Compressible phases: {names}; {len(sigmas)} sigma pairs\n")

    alphas = [case.read_field(f"alpha.{n}"
                              if case.field_exists(f"alpha.{n}")
                              else f"alpha{n}") for n in names]
    U = case.read_field("U")
    p_rgh = case.read_field("p_rgh")
    p = case.read_field("p")
    T = case.read_field("T")
    phi = fvc.flux(mesh, U)
    rhos = [alphas[0].with_calculated_bcs(
        m.rho(p.data, T.data), m.rho(p.bvalues, T.bvalues),
        DimensionSet.of(1, -3), f"rho.{n}")
        for m, n in zip(thermos, names)]
    dgdts = [jnp.zeros_like(alphas[0].data) for _ in names]
    ctrl = PimpleControl(case)
    step = make_step(case, setup, ctrl)
    timer = ExecutionTimer()

    info("\nStarting time loop\n")
    n = 0
    while case.time.run():
        case.time.increment()
        info(f"Time = {case.time.name}\n")
        (alphas, U, p_rgh, p, T, rhos, phi, dgdts,
         stats) = step(alphas, U, p_rgh, p, T, rhos, phi, dgdts,
                       case.time.delta_t)
        log_courant(*stats["co"])
        vtot = float(mesh.V.sum())
        for nm, fr, mm in zip(names, stats["fracs"], stats["minmax"]):
            info(f"{nm} volume fraction = {float(fr) / vtot:.8g}  "
                 f"Min = {float(mm[0]):.6g}  Max = {float(mm[1]):.6g}")
        for perf in stats["p_perf"]:
            log_solve(case.solver_controls('p_rgh').solver, "p_rgh",
                      perf[0], perf[1], perf[2])
        timer.log()
        if write and case.time.write_time():
            case.write_fields([a.replace(name=f"alpha.{nm}")
                               for a, nm in zip(alphas, names)]
                              + [U, p_rgh, p, T])
        n += 1
        if max_steps and n >= max_steps:
            break
    info("End\n")
    return case, alphas, U, p_rgh, p, T, phi


def main(argv=None):
    import argparse
    ap = argparse.ArgumentParser(
        description="compressibleMultiphaseInterFoam (rapidcfd_tpu)")
    ap.add_argument("-case", dest="case", default=".")
    ap.add_argument("-noWrite", action="store_true")
    args = ap.parse_args(argv)
    run(args.case, write=not args.noWrite)


if __name__ == "__main__":
    main()
