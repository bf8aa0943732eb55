"""buoyantBoussinesqSimpleFoam — steady natural convection (Boussinesq).

Capability parity with the reference solver (reference:
applications/solvers/heatTransfer/buoyantBoussinesqSimpleFoam with
TEqn.H/UEqn.H/pEqn.H): rhok = 1 - beta*(T - TRef) buoyancy in the p_rgh
formulation, temperature transport with turbulent thermal diffusivity.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from ..fields.field import Dimensioned, SurfaceField, VolField
from ..linalg import solve
from ..linalg.solvers import gsum
from ..models.transport import SinglePhaseTransportModel
from ..models.turbulence import make_ras_model
from ..ops import fvc, fvm
from ..utils.dictionary import parse_file
from ..utils.dimensions import DimensionSet, dim_viscosity, dimless
from ..utils.logging import (ExecutionTimer, info, log_continuity,
                             log_solve)
from .case import Case
from .controls import SimpleControl
from .simplefoam import div_dev_reff, relax_field


def make_step(case: Case, transport, turb, simple: SimpleControl,
              consts):
    from ..models.fvoptions import FvOptions
    fv_options = FvOptions(case)
    mesh = case.mesh
    beta, t_ref, pr, prt, g = consts
    div_u = case.div_scheme("div(phi,U)")
    try:
        div_t = case.div_scheme("div(phi,T)")
    except KeyError:
        div_t = div_u
    lap_corr = case.laplacian_scheme()
    u_controls = case.solver_controls("U")
    p_controls = case.solver_controls("p_rgh")
    t_controls = case.solver_controls("T")
    u_relax = case.relaxation_factor("U", "equations", 0.3)
    t_relax = case.relaxation_factor("T", "equations", 0.7)
    p_relax = case.relaxation_factor("p_rgh", "fields", 0.3)
    n_non_orth = simple.n_non_orth
    p_ref_cell, p_ref_value = simple.p_ref_cell, simple.p_ref_value
    ghf = (mesh.Cf * jnp.asarray(g, mesh.C.dtype)).sum(-1)

    @jax.jit
    def step(U: VolField, p_rgh: VolField, T: VolField,
             phi: SurfaceField, turb_state):
        nu = transport.nu(mesh, U)
        nu_eff = turb.nu_eff(mesh, turb_state, nu)
        nut = turb.nut(turb_state)
        nu_v = nu.value if isinstance(nu, Dimensioned) else nu.data

        # ---- TEqn.H: alphaEff = nu/Pr + nut/Prt
        if nut is None:
            alpha_eff = Dimensioned("alphaEff", dim_viscosity, nu_v / pr)
        else:
            alpha_eff = nut.with_calculated_bcs(
                nu_v / pr + nut.data / prt,
                (nu_v if jnp.ndim(nu_v) == 0 else nu_v) / pr
                + nut.bvalues / prt, dim_viscosity, "alphaEff")
        TEqn = (fvm.div(mesh, phi, T, div_t)
                - fvm.laplacian(mesh, alpha_eff, T, lap_corr))
        TEqn = fv_options(mesh, "T", TEqn,
                          {"nu": nu, "T": T, "phi": phi,
                           "U": U})
        TEqn = TEqn.relax(mesh, t_relax)
        TEqn = fv_options.constrain(mesh, "T", TEqn)
        T, t_perf = solve(mesh, TEqn, t_controls)

        # rhok = 1 - beta*(T - TRef)
        rhok_d = 1.0 - beta * (T.data - t_ref)
        rhok_b = 1.0 - beta * (T.bvalues - t_ref)
        rhok = T.with_calculated_bcs(rhok_d, rhok_b, dimless, "rhok")

        # ---- UEqn.H
        UEqn = fvm.div(mesh, phi, U, div_u) \
            + div_dev_reff(mesh, nu_eff, U, lap_corr)
        UEqn = fv_options(mesh, "U", UEqn, {"nu": nu, "T": T})
        UEqn = UEqn.relax(mesh, u_relax)
        sng_rhok = fvc.sn_grad(mesh, rhok)
        sng_prgh = fvc.sn_grad(mesh, p_rgh)
        face_force = (-ghf * sng_rhok.data - sng_prgh.data) * mesh.mag_sf
        rhs = fvc.reconstruct(mesh, SurfaceField(
            face_force, p_rgh.dims / DimensionSet.of(0, 1) *
            DimensionSet.of(0, 2), "ff"))
        U, u_perf = solve(mesh, UEqn.equals(rhs), u_controls)

        # ---- pEqn.H
        UEqn_c = UEqn.replace(psi=U)
        rAU = 1.0 / UEqn_c.A(mesh)
        rAU_f = fvc.face_values(mesh, rAU)
        HbyA = fvc.constrain_hbya(mesh, rAU * UEqn_c.H(mesh), U)
        phig = -rAU_f * ghf * fvc.sn_grad(mesh, rhok).data * mesh.mag_sf
        # body-force boundary flux: kept on fixedFluxPressure patches
        # (their snGrad balances it), zeroed on legacy zeroGradient
        # patches (round-2 stand-in)
        from ..fields.bcs import (fixed_flux_pressure_mask,
                                  set_fixed_flux_pressure_gradient)
        ffp_mask = fixed_flux_pressure_mask(mesh, p_rgh)
        phig = phig.at[mesh.n_internal:].multiply(ffp_mask)
        phi_hbya = fvc.adjust_phi(mesh, SurfaceField(
            fvc.flux(mesh, HbyA).data, fvc.flux(mesh, HbyA).dims,
            "phiHbyA"), U)
        phi_hbya = SurfaceField(phi_hbya.data + phig, phi_hbya.dims,
                                "phiHbyA")
        # setSnGrad<fixedFluxPressure> (reference:
        # buoyantBoussinesqSimpleFoam pEqn.H): gradient =
        # (phiHbyA_b - Sf_b & U_b) / (magSf_b * rAUf_b)
        n_int = mesh.n_internal
        sngrad_b = (phi_hbya.data[n_int:]
                    - (mesh.Sf[n_int:] * U.bvalues).sum(-1)) \
            / (jnp.maximum(mesh.mag_sf[n_int:], 1e-30)
               * jnp.maximum(rAU_f[n_int:], 1e-30))
        p_rgh = set_fixed_flux_pressure_gradient(mesh, p_rgh, sngrad_b)

        p_prev = p_rgh
        p_perf_all = []
        for north in range(n_non_orth + 1):
            pEqn = fvm.laplacian(mesh, rAU, p_rgh, lap_corr) \
                == fvc.div(mesh, phi_hbya)
            pEqn = pEqn.set_reference(p_ref_cell, p_ref_value)
            p_rgh, p_perf = solve(mesh, pEqn, p_controls)
            p_perf_all.append(p_perf[0])
        phi = phi_hbya - pEqn.replace(psi=p_rgh).flux(mesh)

        local_err, glob_err = (
            gsum(jnp.abs(fvc.div(mesh, phi).data) * mesh.V),
            gsum(fvc.div(mesh, phi).data * mesh.V))
        p_rgh = relax_field(p_rgh, p_prev, p_relax)

        flux_p = pEqn.replace(psi=p_rgh).flux(mesh)
        corr_f = SurfaceField(
            (phig - flux_p.data) / jnp.maximum(rAU_f, 1e-30),
            phi.dims / rAU.dims, "corrF")
        U_star = HbyA + rAU * fvc.reconstruct(mesh, corr_f)
        U = U.replace(data=U_star.data).correct_boundary_conditions(mesh)

        turb_state, turb_perf = turb.correct(mesh, turb_state, U, phi, nu)
        stats = dict(u_perf=u_perf, t_perf=t_perf,
                     p_perf=tuple(p_perf_all), turb=turb_perf,
                     cont=(local_err, glob_err))
        return U, p_rgh, T, phi, turb_state, stats

    return step


def make_pimple_step(case: Case, transport, turb, ctrl, consts):
    """Transient Boussinesq step (reference: heatTransfer/
    buoyantBoussinesqPimpleFoam: TEqn.H/UEqn.H/pEqn.H with Euler ddt)."""
    from ..models.fvoptions import FvOptions
    fv_options = FvOptions(case)
    mesh = case.mesh
    beta, t_ref, pr, prt, g = consts
    div_u = case.div_scheme("div(phi,U)")
    try:
        div_t = case.div_scheme("div(phi,T)")
    except KeyError:
        div_t = div_u
    lap_corr = case.laplacian_scheme()
    ddt_scheme = case.ddt_scheme()
    u_controls = case.solver_controls("U")
    p_controls = case.solver_controls("p_rgh")
    p_final = case.solver_controls("p_rgh", final=True)
    t_controls = case.solver_controls("T")
    n_outer = ctrl.n_outer
    n_corr = ctrl.n_correctors
    n_non_orth = ctrl.n_non_orth
    p_ref_cell, p_ref_value = ctrl.p_ref_cell, ctrl.p_ref_value
    ghf = (mesh.Cf * jnp.asarray(g, mesh.C.dtype)).sum(-1)

    @jax.jit
    def step(U: VolField, p_rgh: VolField, T: VolField,
             phi: SurfaceField, turb_state, dt):
        U = U.store_old()
        T = T.store_old()
        nu = transport.nu(mesh, U)
        nu_eff = turb.nu_eff(mesh, turb_state, nu)
        nut = turb.nut(turb_state)
        nu_v = nu.value if isinstance(nu, Dimensioned) else nu.data
        u_perf = t_perf = None
        p_perf_all = []
        for outer in range(n_outer):
            # ---- TEqn.H
            if nut is None:
                alpha_eff = Dimensioned("alphaEff", dim_viscosity,
                                        nu_v / pr)
            else:
                alpha_eff = nut.with_calculated_bcs(
                    nu_v / pr + nut.data / prt,
                    nu_v / pr + nut.bvalues / prt, dim_viscosity,
                    "alphaEff")
            TEqn = (fvm.ddt(mesh, T, dt, ddt_scheme)
                    + fvm.div(mesh, phi, T, div_t)
                    - fvm.laplacian(mesh, alpha_eff, T, lap_corr))
            TEqn = fv_options(mesh, "T", TEqn,
                              {"nu": nu, "T": T, "dt": dt,
                               "phi": phi, "U": U})
            TEqn = fv_options.constrain(mesh, "T", TEqn)
            T, t_perf = solve(mesh, TEqn, t_controls)

            rhok = T.with_calculated_bcs(
                1.0 - beta * (T.data - t_ref),
                1.0 - beta * (T.bvalues - t_ref), dimless, "rhok")

            # ---- UEqn.H
            UEqn = (fvm.ddt(mesh, U, dt, ddt_scheme)
                    + fvm.div(mesh, phi, U, div_u)
                    + div_dev_reff(mesh, nu_eff, U, lap_corr))
            UEqn = fv_options(mesh, "U", UEqn,
                              {"nu": nu, "T": T, "dt": dt})
            sng_rhok = fvc.sn_grad(mesh, rhok)
            sng_prgh = fvc.sn_grad(mesh, p_rgh)
            ff = (-ghf * sng_rhok.data - sng_prgh.data) * mesh.mag_sf
            rhs = fvc.reconstruct(mesh, SurfaceField(
                ff, p_rgh.dims / DimensionSet.of(0, 1)
                * DimensionSet.of(0, 2), "ff"))
            U, u_perf = solve(mesh, UEqn.equals(rhs), u_controls)

            # ---- pEqn.H
            for corr in range(n_corr):
                UEqn_c = UEqn.replace(psi=U)
                rAU = 1.0 / UEqn_c.A(mesh)
                rAU_f = fvc.face_values(mesh, rAU)
                HbyA = fvc.constrain_hbya(mesh, rAU * UEqn_c.H(mesh), U)
                from ..fields.bcs import (
                    fixed_flux_pressure_mask,
                    set_fixed_flux_pressure_gradient)
                ffp_mask = fixed_flux_pressure_mask(mesh, p_rgh)
                phig = (-rAU_f * ghf * fvc.sn_grad(mesh, rhok).data
                        * mesh.mag_sf)
                phig = phig.at[mesh.n_internal:].multiply(ffp_mask)
                phi_hbya = fvc.adjust_phi(mesh, SurfaceField(
                    fvc.flux(mesh, HbyA).data,
                    fvc.flux(mesh, HbyA).dims, "phiHbyA"), U)
                phi_hbya = SurfaceField(phi_hbya.data + phig,
                                        phi_hbya.dims, "phiHbyA")
                n_int = mesh.n_internal
                sngrad_b = (phi_hbya.data[n_int:]
                            - (mesh.Sf[n_int:] * U.bvalues).sum(-1)) \
                    / (jnp.maximum(mesh.mag_sf[n_int:], 1e-30)
                       * jnp.maximum(rAU_f[n_int:], 1e-30))
                p_rgh = set_fixed_flux_pressure_gradient(mesh, p_rgh,
                                                         sngrad_b)
                for north in range(n_non_orth + 1):
                    final = (outer == n_outer - 1
                             and corr == n_corr - 1
                             and north == n_non_orth)
                    pEqn = fvm.laplacian(mesh, rAU, p_rgh, lap_corr) \
                        == fvc.div(mesh, phi_hbya)
                    pEqn = pEqn.set_reference(p_ref_cell, p_ref_value)
                    p_rgh, p_perf = solve(
                        mesh, pEqn, p_final if final else p_controls)
                    p_perf_all.append(p_perf[0])
                phi = phi_hbya - pEqn.replace(psi=p_rgh).flux(mesh)
                flux_p = pEqn.replace(psi=p_rgh).flux(mesh)
                corr_f = SurfaceField(
                    (phig - flux_p.data) / jnp.maximum(rAU_f, 1e-30),
                    phi.dims / rAU.dims, "corrF")
                U_star = HbyA + rAU * fvc.reconstruct(mesh, corr_f)
                U = U.replace(data=U_star.data) \
                    .correct_boundary_conditions(mesh)
            turb_state, turb_perf = turb.correct(mesh, turb_state, U,
                                                 phi, nu, dt=dt)
        local_err = gsum(jnp.abs(fvc.div(mesh, phi).data) * mesh.V)
        glob_err = gsum(fvc.div(mesh, phi).data * mesh.V)
        stats = dict(u_perf=u_perf, t_perf=t_perf,
                     p_perf=tuple(p_perf_all),
                     cont=(local_err, glob_err))
        return U, p_rgh, T, phi, turb_state, stats

    return step


def run(case_dir: str, write: bool = True, max_steps: int | None = None,
        transient: bool = False):
    case = Case(case_dir)
    mesh = case.mesh
    tp = case.transport_properties()
    beta = Dimensioned.from_entry(tp.lookup("beta", required=True)).value
    t_ref = Dimensioned.from_entry(tp.lookup("TRef", required=True)).value
    pr = Dimensioned.from_entry(tp.lookup("Pr", required=True)).value
    prt = Dimensioned.from_entry(tp.lookup("Prt", required=True)).value
    gpath = os.path.join(case.dir, "constant", "g")
    g = [float(x) for x in parse_file(gpath).lookup("value")] \
        if os.path.isfile(gpath) else [0.0, -9.81, 0.0]

    U = case.read_field("U")
    p_rgh = case.read_field("p_rgh")
    from ..fields.bcs import set_fixed_flux_pressure_gradient
    import jax.numpy as _jnp
    p_rgh = set_fixed_flux_pressure_gradient(
        mesh, p_rgh, _jnp.zeros(mesh.n_boundary, mesh.V.dtype))
    T = case.read_field("T")
    phi = fvc.flux(mesh, U)
    transport = SinglePhaseTransportModel(tp)
    turb = make_ras_model(case, U)
    turb_state = turb.init_state(U)
    if transient:
        from .controls import PimpleControl
        ctrl = PimpleControl(case)
        step = make_pimple_step(case, transport, turb, ctrl,
                                (beta, t_ref, pr, prt, g))
    else:
        simple = SimpleControl(case)
        step = make_step(case, transport, turb, simple,
                         (beta, t_ref, pr, prt, g))

    timer = ExecutionTimer()
    cumulative_err = 0.0
    info("\nStarting time loop\n")
    n = 0
    initial_residuals = None
    while (case.time.loop() if transient
           else simple.loop(initial_residuals)):
        info(f"Time = {case.time.name}\n")
        if transient:
            U, p_rgh, T, phi, turb_state, stats = step(
                U, p_rgh, T, phi, turb_state, case.time.delta_t)
        else:
            U, p_rgh, T, phi, turb_state, stats = step(U, p_rgh, T, phi,
                                                       turb_state)
        initial_residuals = {}
        for cmpt, perf in zip("xyz", stats["u_perf"]):
            log_solve(case.solver_controls("U").solver, f"U{cmpt}",
                      perf[0], perf[1], perf[2])
            initial_residuals[f"U{cmpt}"] = float(perf[0])
        log_solve(case.solver_controls("T").solver, "T",
                  stats["t_perf"][0][0], stats["t_perf"][0][1],
                  stats["t_perf"][0][2])
        initial_residuals["T"] = float(stats["t_perf"][0][0])
        for perf in stats["p_perf"]:
            log_solve(case.solver_controls("p_rgh").solver, "p_rgh",
                      perf[0], perf[1], perf[2])
        initial_residuals["p_rgh"] = float(stats["p_perf"][0][0])
        local_err, glob_err = stats["cont"]
        cumulative_err += float(glob_err)
        log_continuity(cumulative_err, local_err, glob_err)
        timer.log()
        if write and case.time.write_time():
            case.write_fields([U, p_rgh, T]
                              + list(turb_state.values()))
        n += 1
        if max_steps and n >= max_steps:
            break
    info("End\n")
    return case, U, p_rgh, T, phi, turb_state


def main(argv=None):
    import argparse
    ap = argparse.ArgumentParser(
        description="buoyantBoussinesqSimpleFoam (rapidcfd_tpu)")
    ap.add_argument("-case", dest="case", default=".")
    ap.add_argument("-noWrite", action="store_true")
    args = ap.parse_args(argv)
    run(args.case, write=not args.noWrite)


if __name__ == "__main__":
    main()
