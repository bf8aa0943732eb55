"""pimpleFoam / pisoFoam — transient incompressible solvers with
turbulence.

Capability parity with the reference solvers (reference:
applications/solvers/incompressible/pimpleFoam/pimpleFoam.C and
pisoFoam.C): PIMPLE outer correctors with final-iteration solver
switching, adaptive time stepping from the Courant number (reference:
cfdTools/general/include/setDeltaT.H), RAS turbulence correction each
step. pisoFoam = the same with one outer corrector and PISO dicts.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..fields.field import Dimensioned, SurfaceField, VolField
from ..linalg import solve
from ..models.transport import SinglePhaseTransportModel
from ..models.turbulence import make_ras_model
from ..ops import fvc, fvm
from ..utils.logging import (ExecutionTimer, info, log_continuity,
                             log_courant, log_solve)
from .case import Case
from .controls import PimpleControl, PisoControl
from .icofoam import continuity_errors, courant_number
from .simplefoam import div_dev_reff, relax_field, turb_nl_stress


def make_step(case: Case, transport, turb, ctrl, piso_mode: bool,
              u_source=None, u_name="U"):
    """u_source: optional (mesh, U) -> (n,3) acceleration added to the
    momentum LHS (SRFPimpleFoam's `+ SRF->Su()`); u_name: fvSolution/
    fvSchemes key for the velocity (SRF solvers use 'Urel')."""
    mesh = case.mesh
    from ..models.fvoptions import FvOptions
    fv_options = FvOptions(case)
    div_u = case.div_scheme(f"div(phi,{u_name})")
    lap_corr = case.laplacian_scheme()
    ddt_scheme = case.ddt_scheme()
    u_controls = case.solver_controls(u_name)
    u_final = case.solver_controls(u_name, final=True)
    p_controls = case.solver_controls("p")
    p_final = case.solver_controls("p", final=True)
    u_relax = case.relaxation_factor(u_name, "equations", 0.0)
    n_outer = 1 if piso_mode else ctrl.n_outer
    n_corr = ctrl.n_correctors
    n_non_orth = ctrl.n_non_orth
    p_ref_cell, p_ref_value = ctrl.p_ref_cell, ctrl.p_ref_value
    momentum_predictor = ctrl.momentum_predictor

    cn = isinstance(ddt_scheme, tuple) \
        and ddt_scheme[0] == "CrankNicolson"

    @jax.jit
    def step(U: VolField, p: VolField, phi: SurfaceField, turb_state, dt):
        from ..ops.interpolation import set_current_dt
        set_current_dt(dt)
        U = U.store_old(levels=2 if cn else 1)
        if cn:
            U = fvm.cn_advance(mesh, U, dt, dt, ddt_scheme[1])
        nu = transport.nu(mesh, U)

        u_perf = None
        for outer in range(n_outer):
            final_outer = outer == n_outer - 1
            nu_eff = turb.nu_eff(mesh, turb_state, nu)
            UEqn = (fvm.ddt(mesh, U, dt, ddt_scheme)
                    + fvm.div(mesh, phi, U, div_u)
                    + div_dev_reff(mesh, nu_eff, U, lap_corr,
                                   turb_nl_stress(turb, mesh,
                                                  turb_state, U)))
            if u_source is not None:
                UEqn = UEqn.replace(
                    source=UEqn.source
                    - mesh.V[:, None] * u_source(mesh, U))
            UEqn = fv_options(mesh, "U", UEqn, {"nu": nu})
            if not final_outer:
                UEqn = UEqn.relax(mesh, u_relax)
            UEqn = fv_options.constrain(mesh, "U", UEqn)
            if momentum_predictor:
                U, u_perf = solve(
                    mesh, UEqn == (-fvc.grad(mesh, p)),
                    u_final if final_outer else u_controls,
                    env={"phi": phi})

            for corr in range(n_corr):
                UEqn_c = UEqn.replace(psi=U)
                rAU = 1.0 / UEqn_c.A(mesh)
                HbyA = fvc.constrain_hbya(mesh, rAU * UEqn_c.H(mesh), U)
                phi_hbya = fvc.flux(mesh, HbyA)
                phi_hbya = fvc.adjust_phi(mesh, phi_hbya, U)

                p_perf_all = []
                for north in range(n_non_orth + 1):
                    final = final_outer and corr == n_corr - 1 \
                        and north == n_non_orth
                    pEqn = fvm.laplacian(mesh, rAU, p, lap_corr) \
                        == fvc.div(mesh, phi_hbya)
                    pEqn = pEqn.set_reference(p_ref_cell, p_ref_value)
                    p, p_perf = solve(mesh, pEqn,
                                      p_final if final else p_controls)
                    p_perf_all.append(p_perf[0])
                phi = phi_hbya - pEqn.replace(psi=p).flux(mesh)
                U_star = HbyA - rAU * fvc.grad(mesh, p)
                U = U.replace(data=U_star.data) \
                    .correct_boundary_conditions(mesh, env={"phi": phi})

            turb_state, turb_perf = turb.correct(mesh, turb_state, U,
                                                 phi, nu, dt=dt)

        local_err, glob_err = continuity_errors(mesh, phi)
        co_mean, co_max = courant_number(mesh, phi, dt)
        if u_perf is None:
            z = jnp.asarray(0.0, U.data.dtype)
            u_perf = ((z, z, jnp.asarray(0, jnp.int32)),) * 3
        stats = dict(u_perf=u_perf, p_perf=tuple(p_perf_all),
                     turb=turb_perf, cont=(local_err, glob_err),
                     co=(co_mean, co_max))
        return U, p, phi, turb_state, stats

    return step


def run(case_dir: str, write: bool = True, max_steps: int | None = None,
        piso_mode: bool = False):
    case = Case(case_dir)
    mesh = case.mesh

    p = case.read_field("p")
    U = case.read_field("U")
    phi = fvc.flux(mesh, U)
    transport = SinglePhaseTransportModel(case.transport_properties())
    turb = make_ras_model(case, U)
    turb_state = turb.init_state(U)
    ctrl = PisoControl(case) if piso_mode else PimpleControl(case)

    step = make_step(case, transport, turb, ctrl, piso_mode)
    timer = ExecutionTimer()
    cumulative_err = 0.0
    u_solver = case.solver_controls("U").solver
    p_solver = case.solver_controls("p").solver

    from ..postprocess import FunctionObjectList
    fos = FunctionObjectList(case)

    info("\nStarting time loop\n")
    n = 0
    co_max_prev = 0.0
    while case.time.run():
        if case.time.adjust_time_step and co_max_prev > 0:
            # setDeltaT.H: scale dt toward maxCo with growth damping
            max_dt_f = case.time.max_co / (co_max_prev + 1e-30)
            f = min(min(max_dt_f, 1.0 + 0.1 * max_dt_f), 1.2)
            case.time.set_delta_t(f * case.time.delta_t)
        case.time.increment()
        info(f"Time = {case.time.name}\n")

        U, p, phi, turb_state, stats = step(U, p, phi, turb_state,
                                            case.time.delta_t)
        co_mean, co_max = stats["co"]
        co_max_prev = float(co_max)
        log_courant(co_mean, co_max)
        for cmpt, perf in zip("xyz", stats["u_perf"]):
            log_solve(u_solver, f"U{cmpt}", perf[0], perf[1], perf[2])
        for perf in stats["p_perf"]:
            log_solve(p_solver, "p", perf[0], perf[1], perf[2])
        for name, perf in stats["turb"].items():
            log_solve(case.solver_controls(name).solver, name,
                      perf[0], perf[1], perf[2])
        local_err, glob_err = stats["cont"]
        cumulative_err += float(glob_err)
        log_continuity(cumulative_err, local_err, glob_err)
        if fos.objects:
            extra = dict(turb_state)
            nu_fo = transport.nu(case.mesh, U)
            extra["nu"] = nu_fo if hasattr(nu_fo, "bvalues") else None
            extra["nuEff"] = turb.nu_eff(case.mesh, turb_state, nu_fo)
            fos.execute({"U": U, "p": p, "phi": phi,
                         **{k: v for k, v in extra.items()
                            if v is not None}})
        timer.log()

        if write and case.time.write_time():
            case.write_fields([U, p] + list(turb_state.values()))
        n += 1
        if max_steps and n >= max_steps:
            break

    fos.close()
    info("End\n")
    return case, U, p, phi, turb_state


def main(argv=None):
    import argparse
    ap = argparse.ArgumentParser(description="pimpleFoam (rapidcfd_tpu)")
    ap.add_argument("-case", dest="case", default=".")
    ap.add_argument("-noWrite", action="store_true")
    ap.add_argument("--piso", action="store_true",
                    help="run as pisoFoam")
    args = ap.parse_args(argv)
    run(args.case, write=not args.noWrite, piso_mode=args.piso)


if __name__ == "__main__":
    main()
