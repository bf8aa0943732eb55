"""SRFSimpleFoam / SRFPimpleFoam — rotating-frame incompressible solvers.

Capability parity with the reference solvers (reference:
applications/solvers/incompressible/simpleFoam/SRFSimpleFoam/
SRFSimpleFoam.C and pimpleFoam/SRFPimpleFoam): solve for the relative
velocity Urel with the SRF Coriolis+centrifugal acceleration on the
momentum LHS; Uabs = Urel + frame velocity is derived at write time.

TPU-first: the SRF source is a pure closure fused into the jitted
simpleFoam/pimpleFoam step (no separate kernels).
"""

from __future__ import annotations

from ..models.srf import SRFModel
from ..models.transport import SinglePhaseTransportModel
from ..models.turbulence import make_ras_model
from ..ops import fvc
from ..utils.logging import (ExecutionTimer, info, log_continuity,
                             log_courant, log_solve)
from .case import Case
from .controls import PimpleControl, SimpleControl


def _patch_srf_bcs(case, U, srf):
    """Stash the static frame velocity into SRFVelocity patches'
    bcdata (the reference's updateCoeffs recomputes it per call)."""
    from ..fields.bcs import SRFVelocity
    mesh = case.mesh
    bcdata = list(U.bcdata)
    changed = False
    for i, bc in enumerate(U.bcs):
        if isinstance(bc, SRFVelocity):
            p = mesh.patches[i]
            bd = dict(bcdata[i])
            bd["srfValue"] = srf.velocity(mesh.patch_cf(p))
            bcdata[i] = bd
            changed = True
    if not changed:
        return U
    import jax
    U = U.replace(bcdata=tuple(bcdata))
    return jax.jit(lambda f: f.correct_boundary_conditions(mesh))(U)


def _log_stats(case, stats, u_solver, p_solver, cumulative_err):
    initial_residuals = {}
    for cmpt, perf in zip("xyz", stats["u_perf"]):
        log_solve(u_solver, f"Urel{cmpt}", perf[0], perf[1], perf[2])
        initial_residuals[f"U{cmpt}"] = float(perf[0])
    initial_residuals["U"] = max(float(pf[0]) for pf in stats["u_perf"])
    for perf in stats["p_perf"]:
        log_solve(p_solver, "p", perf[0], perf[1], perf[2])
    initial_residuals["p"] = float(stats["p_perf"][0][0])
    for name, perf in stats["turb"].items():
        log_solve(case.solver_controls(name).solver, name,
                  perf[0], perf[1], perf[2])
        initial_residuals[name] = float(perf[0])
    local_err, glob_err = stats["cont"]
    cumulative_err += float(glob_err)
    log_continuity(cumulative_err, local_err, glob_err)
    return initial_residuals, cumulative_err


def run(case_dir: str, write: bool = True, max_steps: int | None = None):
    """SRFSimpleFoam (reference: SRFSimpleFoam.C:36-100)."""
    from . import simplefoam
    case = Case(case_dir)
    mesh = case.mesh

    info("Reading field p\n\nReading field Urel\n")
    p = case.read_field("p")
    U = case.read_field("Urel")
    srf = SRFModel(case)
    U = _patch_srf_bcs(case, U, srf)
    phi = fvc.flux(mesh, U)

    transport = SinglePhaseTransportModel(case.transport_properties())
    turb = make_ras_model(case, U)
    turb_state = turb.init_state(U)
    simple = SimpleControl(case)

    step = simplefoam.make_step(case, transport, turb, simple,
                                u_source=srf.su, u_name="Urel")
    timer = ExecutionTimer()
    cumulative_err = 0.0
    u_solver = case.solver_controls("Urel").solver
    p_solver = case.solver_controls("p").solver

    info("\nStarting time loop\n")
    n = 0
    initial_residuals = None
    while simple.loop(initial_residuals):
        info(f"Time = {case.time.name}\n")
        U, p, phi, turb_state, stats = step(U, p, phi, turb_state)
        initial_residuals, cumulative_err = _log_stats(
            case, stats, u_solver, p_solver, cumulative_err)
        timer.log()
        if write and case.time.write_time():
            case.write_fields([U, p, srf.u_abs(mesh, U)]
                              + list(turb_state.values()))
        n += 1
        if max_steps and n >= max_steps:
            break

    if write:
        case.write_fields([U, p, srf.u_abs(mesh, U)]
                          + list(turb_state.values()))
    info("End\n")
    return case, U, p, phi, turb_state


def run_pimple(case_dir: str, write: bool = True,
               max_steps: int | None = None):
    """SRFPimpleFoam (reference: pimpleFoam/SRFPimpleFoam with
    UrelEqn.H: ddt + div + divDevReff + SRF->Su())."""
    from . import pimplefoam
    case = Case(case_dir)
    mesh = case.mesh

    p = case.read_field("p")
    U = case.read_field("Urel")
    srf = SRFModel(case)
    U = _patch_srf_bcs(case, U, srf)
    phi = fvc.flux(mesh, U)

    transport = SinglePhaseTransportModel(case.transport_properties())
    turb = make_ras_model(case, U)
    turb_state = turb.init_state(U)
    ctrl = PimpleControl(case)

    step = pimplefoam.make_step(case, transport, turb, ctrl, False,
                                u_source=srf.su, u_name="Urel")
    timer = ExecutionTimer()
    cumulative_err = 0.0
    u_solver = case.solver_controls("Urel").solver
    p_solver = case.solver_controls("p").solver

    info("\nStarting time loop\n")
    n = 0
    while case.time.run():
        case.time.increment()
        info(f"Time = {case.time.name}\n")
        U, p, phi, turb_state, stats = step(U, p, phi, turb_state,
                                            case.time.delta_t)
        co_mean, co_max = stats["co"]
        log_courant(co_mean, co_max)
        _, cumulative_err = _log_stats(case, stats, u_solver, p_solver,
                                       cumulative_err)
        timer.log()
        if write and case.time.write_time():
            case.write_fields([U, p, srf.u_abs(mesh, U)]
                              + list(turb_state.values()))
        n += 1
        if max_steps and n >= max_steps:
            break

    if write:
        case.write_fields([U, p, srf.u_abs(mesh, U)]
                          + list(turb_state.values()))
    info("End\n")
    return case, U, p, phi, turb_state


def main(argv=None):
    import argparse
    ap = argparse.ArgumentParser(description="SRFSimpleFoam (rapidcfd_tpu)")
    ap.add_argument("-case", dest="case", default=".")
    ap.add_argument("-noWrite", action="store_true")
    ap.add_argument("--pimple", action="store_true")
    args = ap.parse_args(argv)
    if args.pimple:
        run_pimple(args.case, write=not args.noWrite)
    else:
        run(args.case, write=not args.noWrite)


if __name__ == "__main__":
    main()
