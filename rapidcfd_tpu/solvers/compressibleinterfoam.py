"""compressibleInterFoam — two compressible, non-isothermal immiscible
fluids with VOF interface capturing.

Capability parity with the reference solver (reference:
applications/solvers/multiphase/compressibleInterFoam/
compressibleInterFoam.C:51-120 with alphaEqns.H, UEqn.H, TEqn.H, pEqn.H
and twoPhaseMixtureThermo/twoPhaseMixtureThermo.C): MULES alpha
transport with compressibility dilatation sources (dgdt), mixture
momentum, temperature equation with pressure/kinetic-energy work, and a
pressure equation combining the incompressible Poisson operator with
per-phase compressibility contributions
(p_rghEqnComp_i = ddt(rho_i) + psi_i*correction(ddt(p_rgh))
 + div(phi, rho_i) - Sp(div(phi), rho_i), pEqn.H non-transonic branch).

Per-phase thermo is the rhoThermo stack read from
constant/thermophysicalProperties.<phase> (reference:
twoPhaseMixtureThermo.C: rhoThermo::New(mesh, phaseName)).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from ..fields.field import Dimensioned, SurfaceField, VolField
from ..linalg import solve
from ..linalg.solvers import gsum
from ..models.thermo import PhaseRhoThermo, read_rho_thermo
from ..ops import fvc, fvm
from ..ops.mules import explicit_solve
from ..utils.dictionary import parse_file
from ..utils.dimensions import (DimensionSet, dim_density,
                                dim_dynamic_viscosity, dim_length)
from ..utils.logging import (ExecutionTimer, info, log_courant, log_solve)
from .case import Case
from .controls import PimpleControl
from .icofoam import courant_number

_DELTA_N = 1e-8


def _read_setup(case: Case):
    props = case.constant_dict("thermophysicalProperties")
    phases = props.lookup("phases")
    names = [str(x) for x in phases] if phases else ["phase1", "phase2"]
    t1 = read_rho_thermo(parse_file(os.path.join(
        case.dir, "constant", f"thermophysicalProperties.{names[0]}")))
    t2 = read_rho_thermo(parse_file(os.path.join(
        case.dir, "constant", f"thermophysicalProperties.{names[1]}")))
    sigma_e = props.lookup("sigma", required=False)
    sigma = Dimensioned.from_entry(sigma_e).value if sigma_e is not None \
        else 0.0
    pmin_e = props.lookup("pMin", required=False)
    pmin = Dimensioned.from_entry(pmin_e).value if pmin_e is not None \
        else 1000.0
    gpath = os.path.join(case.dir, "constant", "g")
    if os.path.isfile(gpath):
        gd = parse_file(gpath)
        g = [float(x) for x in gd.lookup("value")]
    else:
        g = [0.0, -9.81, 0.0]
    return names, t1, t2, sigma, pmin, g


def make_step(case: Case, setup, ctrl: PimpleControl,
              dym: bool = False):
    """dym=True gives compressibleInterDyMFoam (reference: multiphase/
    compressibleInterFoam/compressibleInterDyMFoam/): the step takes
    the UPDATED mesh as a jit argument plus (mesh_phi, mesh_ub); the
    caller passes the RELATIVE volumetric flux and gets it back."""
    mesh = case.mesh
    names, m1, m2, sigma, p_min, g = setup
    m1: PhaseRhoThermo
    m2: PhaseRhoThermo
    solvers_d = case.fv_solution.subdict("solvers")
    alpha_d = (solvers_d.lookup(f"alpha.{names[0]}")
               or solvers_d.lookup("alpha1"))
    c_alpha = float(alpha_d.scalar("cAlpha", 1.0)) if alpha_d else 1.0
    lap_corr = case.laplacian_scheme()
    div_u_scheme = case.div_scheme("div(rhoPhi,U)")
    p_controls = case.solver_controls("p_rgh")
    p_final = case.solver_controls("p_rgh", final=True)
    t_controls = case.solver_controls("T")
    u_controls = case.solver_controls("U")
    n_outer = ctrl.n_outer
    n_corr = ctrl.n_correctors
    n_alpha_sub = int(ctrl.dict.scalar("nAlphaSubCycles", 1))
    n_alpha_corr = int(ctrl.dict.scalar("nAlphaCorr", 1))
    n_non_orth = ctrl.n_non_orth
    momentum_predictor = ctrl.momentum_predictor

    def calc_bcs(like: VolField, data, bdata, dims, name):
        return like.with_calculated_bcs(data, bdata, dims, name)

    def mix_rho(alpha, rho1, rho2):
        d = alpha.data * rho1.data + (1.0 - alpha.data) * rho2.data
        b = alpha.bvalues * rho1.bvalues \
            + (1.0 - alpha.bvalues) * rho2.bvalues
        return calc_bcs(alpha, d, b, dim_density, "rho")

    def phase_fields(like, p, T):
        """thermo.correct(): per-phase rho/psi from (p, T)."""
        rho1 = calc_bcs(like, m1.rho(p.data, T.data),
                        m1.rho(p.bvalues, T.bvalues), dim_density,
                        f"rho.{names[0]}")
        rho2 = calc_bcs(like, m2.rho(p.data, T.data),
                        m2.rho(p.bvalues, T.bvalues), dim_density,
                        f"rho.{names[1]}")
        return rho1, rho2

    def surface_tension(mesh, alpha):
        """CSF sigma*kappa*snGrad(alpha) face force (reference:
        interfaceProperties::surfaceTensionForce)."""
        g_a = fvc.grad(mesh, alpha)
        gf = fvc.face_values(mesh, g_a)
        mag = jnp.linalg.norm(gf, axis=-1) + _DELTA_N
        nhatf = (gf / mag[:, None] * mesh.Sf).sum(-1)
        kappa = -fvc.surface_sum_faces(mesh, nhatf) / mesh.V
        w = mesh.weights
        own, nei = mesh.owner[:mesh.n_internal], mesh.neighbour
        k_int = w * jnp.take(kappa, own) + (1 - w) * jnp.take(kappa, nei)
        k_b = jnp.take(kappa, mesh.owner[mesh.n_internal:])
        kf = jnp.concatenate([k_int, k_b])
        sng = fvc.sn_grad(mesh, alpha)
        return sigma * kf * sng.data, nhatf

    @jax.jit
    def _step(mesh, alpha: VolField, U: VolField, p_rgh: VolField,
              p: VolField, T: VolField, rho1: VolField, rho2: VolField,
              phi: SurfaceField, dgdt, dt, mesh_phi, mesh_ub):
        gh = (mesh.C * jnp.asarray(g, mesh.C.dtype)).sum(-1)
        ghf = (mesh.Cf * jnp.asarray(g, mesh.C.dtype)).sum(-1)
        U = U.store_old()
        T = T.store_old()
        alpha = alpha.store_old()
        rho1 = rho1.store_old()
        rho2 = rho2.store_old()
        rho1_old, rho2_old = rho1.old, rho2.old
        rho_in = mix_rho(alpha, rho1, rho2)
        k_old = 0.5 * (U.old.data * U.old.data).sum(-1)
        phi_old = phi.data

        p_perf_all = []
        t_perf_all = []
        for outer in range(n_outer):
            # ---- alphaEqnsSubCycle.H / alphaEqns.H
            divu = fvc.div(mesh, phi).data  # per-volume dilatation
            phi_dims = phi.dims
            for _ in range(n_alpha_sub):
                cond_pos = (dgdt > 0.0) & (alpha.data > 0.0)
                cond_neg = (dgdt < 0.0) & (alpha.data < 1.0)
                sp = jnp.where(cond_pos, -dgdt * alpha.data, 0.0) \
                    + jnp.where(cond_neg, dgdt * (1.0 - alpha.data), 0.0)
                su = divu * jnp.minimum(alpha.data, 1.0) \
                    + jnp.where(cond_pos, dgdt * alpha.data, 0.0)
                a_f = fvc.face_values(mesh, alpha, "vanLeer", phi)
                _, nhatf = surface_tension(mesh, alpha)
                phir = c_alpha * jnp.abs(phi.data) \
                    / jnp.maximum(mesh.mag_sf, 1e-30) * nhatf
                phir = phir.at[mesh.n_internal:].set(0.0)
                a_b_f = fvc.face_values(mesh, alpha)
                phi_alpha = SurfaceField(
                    phi.data * a_f + phir * a_b_f * (1.0 - a_b_f),
                    phi_dims, "phiAlpha")
                alpha, phi_alpha_lim = explicit_solve(
                    mesh, alpha, phi, phi_alpha, dt / n_alpha_sub,
                    sp=sp, su=su)
            rho1f = fvc.face_values(mesh, rho1)
            rho2f = fvc.face_values(mesh, rho2)
            rho_phi = SurfaceField(
                phi_alpha_lim.data * (rho1f - rho2f) + phi.data * rho2f,
                phi.dims * dim_density, "rhoPhi")

            # solve(fvm::ddt(rho) + fvc::div(rhoPhi)): explicit update
            rho_data = rho_in.data \
                - dt * fvc.surface_sum_faces(mesh, rho_phi.data) / mesh.V
            rho = calc_bcs(alpha, rho_data,
                           mix_rho(alpha, rho1, rho2).bvalues,
                           dim_density, "rho")
            rho = rho.replace(old=rho_in.replace(old=None))

            # ---- UEqn.H
            mu_d = alpha.data * m1.mu(T.data) \
                + (1.0 - alpha.data) * m2.mu(T.data)
            mu_b = alpha.bvalues * m1.mu(T.bvalues) \
                + (1.0 - alpha.bvalues) * m2.mu(T.bvalues)
            mu = calc_bcs(alpha, mu_d, mu_b, dim_dynamic_viscosity, "mu")
            mu_f = Dimensioned("muf", dim_dynamic_viscosity,
                               fvc.face_values(mesh, mu))
            UEqn = (fvm.ddt(mesh, U, dt, coeff=rho)
                    + fvm.div(mesh, rho_phi, U, div_u_scheme)
                    - fvm.laplacian(mesh, mu_f, U, lap_corr))
            csf, _ = surface_tension(mesh, alpha)
            if momentum_predictor:
                sng_rho = fvc.sn_grad(mesh, rho)
                sng_prgh = fvc.sn_grad(mesh, p_rgh)
                f_face = SurfaceField(
                    (csf - ghf * sng_rho.data - sng_prgh.data)
                    * mesh.mag_sf,
                    UEqn.dims / dim_length, "Uforce")
                # reconstruct to a cell vector source
                frec = fvc.reconstruct(mesh, f_face)
                U, _ = solve(mesh, UEqn.equals(frec), u_controls)

            # ---- TEqn.H
            k = 0.5 * (U.data * U.data).sum(-1)
            k_b = 0.5 * (U.bvalues * U.bvalues).sum(-1)
            K = calc_bcs(alpha, k, k_b, DimensionSet.of(0, 2, -2), "K")
            p_work = fvc.div(mesh, phi, p, "upwind").data \
                + (rho.data * k - rho.old.data * k_old) / dt \
                + fvc.div(mesh, rho_phi, K, "upwind").data
            cv_coeff = alpha.data / m1.cv + (1.0 - alpha.data) / m2.cv
            alpha_eff_d = alpha.data * m1.alpha_h(T.data) \
                + (1.0 - alpha.data) * m2.alpha_h(T.data)
            alpha_eff_b = alpha.bvalues * m1.alpha_h(T.bvalues) \
                + (1.0 - alpha.bvalues) * m2.alpha_h(T.bvalues)
            alpha_eff = calc_bcs(alpha, alpha_eff_d, alpha_eff_b,
                                 dim_dynamic_viscosity, "alphaEff")
            aef = Dimensioned("alphaEfff", dim_dynamic_viscosity,
                              fvc.face_values(mesh, alpha_eff))
            TEqn = (fvm.ddt(mesh, T, dt, coeff=rho)
                    + fvm.div(mesh, rho_phi, T, "upwind")
                    - fvm.laplacian(mesh, aef, T, lap_corr))
            rhs = calc_bcs(
                alpha, -p_work * cv_coeff,
                jnp.zeros_like(alpha.bvalues),
                TEqn.dims / DimensionSet.of(0, 3), "Tsource")
            T, t_perf = solve(mesh, TEqn.equals(rhs), t_controls)
            t_perf_all.append(t_perf[0])
            # mixture.correct()
            rho1, rho2 = phase_fields(alpha, p, T)
            rho1 = rho1.replace(old=rho1_old)
            rho2 = rho2.replace(old=rho2_old)
            psi1 = m1.psi(T.data)
            psi2 = m2.psi(T.data)

            # ---- pEqn.H (non-transonic branch)
            for corr in range(n_corr):
                UEqn_p = UEqn.replace(psi=U)
                divu = fvc.div(mesh, phi).data
                rAU = 1.0 / UEqn_p.A(mesh)
                rAU_f = fvc.face_values(mesh, rAU)
                HbyA = fvc.constrain_hbya(mesh, rAU * UEqn_p.H(mesh), U)
                phi_hbya = fvc.flux(mesh, HbyA)
                if dym:
                    # fvc::makeRelative(phiHbyA, U)
                    phi_hbya = SurfaceField(phi_hbya.data - mesh_phi,
                                            phi_hbya.dims, "phiHbyA")
                # fvc::ddtCorr(U, phi): Rhie-Chow temporal coupling
                # (reference: EulerDdtScheme::fvcDdtPhiCorr) — damps the
                # collocated face-flux/cell-velocity acoustic decoupling
                uf_old = fvc.flux(mesh, U.old).data
                dphi = phi_old - uf_old
                coeff = 1.0 - jnp.minimum(
                    jnp.abs(dphi) / (jnp.abs(phi_old) + 1e-30), 1.0)
                rho_rau_f = fvc.face_values(mesh, rho * rAU)
                ddt_corr = rho_rau_f * coeff * dphi / dt
                phi_hbya = SurfaceField(phi_hbya.data + ddt_corr,
                                        phi_hbya.dims, "phiHbyA")
                csf_c, _ = surface_tension(mesh, alpha)
                sng_rho = fvc.sn_grad(mesh, rho)
                phig = (csf_c - ghf * sng_rho.data) * rAU_f * mesh.mag_sf
                phig = phig.at[mesh.n_internal:].set(0.0)
                phi_hbya = SurfaceField(phi_hbya.data + phig, phi.dims,
                                        "phiHbyA")

                # per-phase explicit compressibility rates (per volume)
                s1 = jnp.maximum(alpha.data, 0.0) \
                    / jnp.maximum(rho1.data, 1e-10)
                s2 = jnp.maximum(1.0 - alpha.data, 0.0) \
                    / jnp.maximum(rho2.data, 1e-10)
                rate1 = (rho1.data - rho1.old.data) / dt \
                    + fvc.div(mesh, phi, rho1, "upwind").data \
                    - divu * rho1.data
                rate2 = (rho2.data - rho2.old.data) / dt \
                    + fvc.div(mesh, phi, rho2, "upwind").data \
                    - divu * rho2.data
                d_comp = (s1 * psi1 + s2 * psi2) * mesh.V / dt
                expl = (s1 * rate1 + s2 * rate2) * mesh.V

                for north in range(n_non_orth + 1):
                    final = corr == n_corr - 1 and north == n_non_orth
                    L = fvm.laplacian(mesh, rAU, p_rgh, lap_corr)
                    div_hbya = fvc.surface_sum_faces(mesh, phi_hbya.data)
                    pEqn = L.replace(
                        diag=L.diag - d_comp,
                        source=L.source + expl - d_comp * p_rgh.data
                        + div_hbya,
                        symmetric=False)
                    p_cur = p_rgh.data
                    p_rgh, p_perf = solve(
                        mesh, pEqn, p_final if final else p_controls)
                    p_perf_all.append(p_perf[0])
                # dgdt from the solved compressibility rates
                dp_rate = (p_rgh.data - p_cur) / dt
                r1 = rate1 + psi1 * dp_rate
                r2 = rate2 + psi2 * dp_rate
                dgdt = (jnp.where(1.0 - alpha.data >= 0.0, 1.0, 0.0)
                        * r2 / jnp.maximum(rho2.data, 1e-3)
                        - jnp.where(alpha.data >= 0.0, 1.0, 0.0)
                        * r1 / jnp.maximum(rho1.data, 1e-3))
                lp = pEqn.replace(psi=p_rgh)
                flux_p = lp.flux(mesh)
                phi = SurfaceField(phi_hbya.data - flux_p.data, phi.dims,
                                   "phi")
                corr_f = SurfaceField(
                    (phig - flux_p.data) / jnp.maximum(rAU_f, 1e-30),
                    phi.dims / rAU.dims, "corrF")
                U_star = HbyA + rAU * fvc.reconstruct(mesh, corr_f)
                env_u = ({"meshUb": mesh_ub,
                          "meshPhiB": mesh_phi[mesh.n_internal:],
                          "phi": phi} if dym else None)
                U = U.replace(data=U_star.data) \
                     .correct_boundary_conditions(mesh, env=env_u)
                # rho_i += psi_i*(p_rgh - p_rgh0); p from p_rgh
                dp = p_rgh.data - p_cur
                rho1 = rho1.replace(data=rho1.data + psi1 * dp)
                rho2 = rho2.replace(data=rho2.data + psi2 * dp)
                rho = mix_rho(alpha, rho1, rho2).replace(
                    old=rho.old)
                p_new = jnp.maximum(p_rgh.data + rho.data * gh, p_min)
                p = p.replace(data=p_new) \
                     .correct_boundary_conditions(mesh)
                p_rgh = p_rgh.replace(data=p.data - rho.data * gh) \
                    .correct_boundary_conditions(mesh)
                # re-evaluate the EoS at the clamped pressure
                # (mixture.correct(): keeps rho_i positive/consistent
                # where the psi-linearised update overshoots)
                rho1, rho2 = phase_fields(alpha, p, T)
                rho1 = rho1.replace(old=rho1_old)
                rho2 = rho2.replace(old=rho2_old)
                rho = mix_rho(alpha, rho1, rho2).replace(old=rho.old)

        co_mean, co_max = courant_number(mesh, phi, dt)
        a_min, a_max = alpha.data.min(), alpha.data.max()
        mass = gsum(rho.data * mesh.V)
        stats = dict(p_perf=tuple(p_perf_all), t_perf=tuple(t_perf_all),
                     co=(co_mean, co_max),
                     alpha=(a_min, a_max, gsum(alpha.data * mesh.V)),
                     mass=mass,
                     p_minmax=(p.data.min(), p.data.max()),
                     t_minmax=(T.data.min(), T.data.max()))
        return alpha, U, p_rgh, p, T, rho1, rho2, phi, dgdt, stats

    from ..linalg.precompute import attach_solver_layouts
    import dataclasses as _dc
    mesh0 = jax.device_put(attach_solver_layouts(
        mesh, (p_controls, p_final), case=case))

    if dym:
        def step(mesh_new, alpha, U, p_rgh, p, T, rho1, rho2, phi_rel,
                 dgdt, dt, mesh_phi, mesh_ub):
            m2x = _dc.replace(mesh_new, band=mesh0.band,
                              gamg=mesh0.gamg)
            return _step(m2x, alpha, U, p_rgh, p, T, rho1, rho2,
                         phi_rel, dgdt, dt, mesh_phi, mesh_ub)
        return step

    zf = jnp.zeros(mesh.n_faces, mesh.V.dtype)
    zb = jnp.zeros((mesh.n_boundary, 3), mesh.C.dtype)

    def step(alpha, U, p_rgh, p, T, rho1, rho2, phi, dgdt, dt):
        return _step(mesh0, alpha, U, p_rgh, p, T, rho1, rho2, phi,
                     dgdt, dt, zf, zb)

    return step


def run(case_dir: str, write: bool = True, max_steps: int | None = None,
        dym: bool = False):
    case = Case(case_dir)
    mesh = case.mesh
    dyn = None
    if dym:
        from ..models.dynamicmesh import make_dynamic_mesh
        dyn = make_dynamic_mesh(case)
    setup = _read_setup(case)
    names, m1, m2, sigma, p_min, g = setup
    info(f"Two compressible phases: {names[0]} ({m1.eos}), "
         f"{names[1]} ({m2.eos}), sigma={sigma}\n")

    alpha_name = f"alpha.{names[0]}" \
        if case.field_exists(f"alpha.{names[0]}") else "alpha1"
    alpha = case.read_field(alpha_name)
    U = case.read_field("U")
    p_rgh = case.read_field("p_rgh")
    p = case.read_field("p")
    T = case.read_field("T")
    phi = fvc.flux(mesh, U)
    rho1 = alpha.with_calculated_bcs(
        m1.rho(p.data, T.data), m1.rho(p.bvalues, T.bvalues),
        DimensionSet.of(1, -3), f"rho.{names[0]}")
    rho2 = alpha.with_calculated_bcs(
        m2.rho(p.data, T.data), m2.rho(p.bvalues, T.bvalues),
        DimensionSet.of(1, -3), f"rho.{names[1]}")
    dgdt = jnp.zeros_like(alpha.data)
    ctrl = PimpleControl(case)

    step = make_step(case, setup, ctrl, dym=dym)
    timer = ExecutionTimer()
    zf = jnp.zeros(mesh.n_faces, mesh.V.dtype)
    zb = jnp.zeros((mesh.n_boundary, 3), mesh.C.dtype)

    info("\nStarting time loop\n")
    n = 0
    co_max_prev = 0.0
    while case.time.run():
        if case.time.adjust_time_step and co_max_prev > 0:
            f = min(min(case.time.max_co / (co_max_prev + 1e-30), 1.0
                        + 0.1 * case.time.max_co / (co_max_prev + 1e-30)),
                    1.2)
            case.time.set_delta_t(f * case.time.delta_t)
        case.time.increment()
        info(f"Time = {case.time.name}\n")
        if dym:
            if dyn is not None:
                mesh, mesh_phi, mesh_ub = dyn.update(case.time.value)
                case.mesh = mesh
                phi = SurfaceField(phi.data - mesh_phi, phi.dims, "phi")
            else:
                mesh_phi, mesh_ub = zf, zb
            (alpha, U, p_rgh, p, T, rho1, rho2, phi, dgdt,
             stats) = step(mesh, alpha, U, p_rgh, p, T, rho1, rho2,
                           phi, dgdt, case.time.delta_t, mesh_phi,
                           mesh_ub)
            if dyn is not None:
                phi = SurfaceField(phi.data + mesh_phi, phi.dims, "phi")
        else:
            (alpha, U, p_rgh, p, T, rho1, rho2, phi, dgdt,
             stats) = step(alpha, U, p_rgh, p, T, rho1, rho2, phi, dgdt,
                           case.time.delta_t)
        co_mean, co_max = stats["co"]
        co_max_prev = float(co_max)
        log_courant(co_mean, co_max)
        a_min, a_max, a_int = stats["alpha"]
        info(f"Phase-1 volume fraction = "
             f"{float(a_int) / float(mesh.V.sum()):.8g}  "
             f"Min(alpha1) = {float(a_min):.6g}  "
             f"Max(alpha1) = {float(a_max):.6g}")
        for perf in stats["t_perf"]:
            log_solve(case.solver_controls('T').solver, "T",
                      perf[0], perf[1], perf[2])
        for perf in stats["p_perf"]:
            log_solve(case.solver_controls('p_rgh').solver, "p_rgh",
                      perf[0], perf[1], perf[2])
        timer.log()
        if write and case.time.write_time():
            case.write_fields([alpha.replace(name=alpha_name), U, p_rgh,
                               p, T])
        n += 1
        if max_steps and n >= max_steps:
            break
    info("End\n")
    return case, alpha, U, p_rgh, p, T, phi


def main(argv=None):
    import argparse
    ap = argparse.ArgumentParser(
        description="compressibleInterFoam (rapidcfd_tpu)")
    ap.add_argument("-case", dest="case", default=".")
    ap.add_argument("-noWrite", action="store_true")
    args = ap.parse_args(argv)
    run(args.case, write=not args.noWrite)


if __name__ == "__main__":
    main()
