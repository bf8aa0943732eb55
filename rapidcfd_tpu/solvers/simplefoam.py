"""simpleFoam — steady incompressible RANS solver (SIMPLE).

Capability parity with the reference solver (reference:
applications/solvers/incompressible/simpleFoam/simpleFoam.C:40-78 with
UEqn.H/pEqn.H), TPU-first: one jitted SIMPLE iteration = momentum
predictor (relaxed), pressure correction with non-orth correctors, field
relaxation, and the turbulence correct() — the host loop only checks
residualControl convergence and writes.
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
                             log_solve)
from .case import Case
from .controls import SimpleControl
from .icofoam import continuity_errors


def relax_field(new: VolField, prev: VolField, alpha: float) -> VolField:
    """Explicit field under-relaxation (GeometricField::relax)."""
    if alpha <= 0 or alpha >= 1.0 - 1e-12:
        return new
    return new.replace(
        data=prev.data + alpha * (new.data - prev.data),
        bvalues=prev.bvalues + alpha * (new.bvalues - prev.bvalues))


def div_dev_reff(mesh, nu_eff, U: VolField, lap_corr: str,
                 nl_stress=None):
    """turbulence->divDevReff(U) (reference: linearViscousStress /
    RASModel::divDevReff): -laplacian(nuEff, U) - div(nuEff*dev(T(grad U))).
    nl_stress: optional explicit nonlinear Reynolds stress tensor field
    (LienCubicKE / scaleSimilarity-family); its +fvc::div on the LHS
    becomes -div on the RHS source."""
    m = -fvm.laplacian(mesh, nu_eff, U, lap_corr)
    from ..utils.switches import enabled as _sw
    if mesh.gdia is not None and mesh.gauss is not None \
            and _sw("GDIA_MAC"):
        # fused per-column pipeline — no (n,3,3) materialization
        # (fvc.div_dev_t_grad)
        expl = fvc.div_dev_t_grad(mesh, U, nu_eff)
    else:
        dev_t = fvc.dev_transpose_grad(mesh, U)
        expl = fvc.div_tensor(mesh, dev_t * nu_eff)
    if nl_stress is not None:
        expl = expl - fvc.div_tensor(mesh, nl_stress)
    return m.equals(expl)


def turb_nl_stress(turb, mesh, turb_state, U):
    """nonlinear_stress hook lookup (None for eddy-viscosity models)."""
    fn = getattr(turb, "nonlinear_stress", None)
    return fn(mesh, turb_state, U) if fn is not None else None


def simple_step(mesh, U: VolField, p: VolField, phi: SurfaceField,
                turb_state, *, transport, turb, fv_options, div_u,
                lap_corr, u_controls, p_controls, u_relax, p_relax,
                n_non_orth, p_ref_cell, p_ref_value, p_ref_weight=1.0,
                u_source=None):
    """One SIMPLE iteration (pure; works single-chip or inside shard_map
    — in the latter case p_ref_cell/p_ref_weight are per-shard values)."""
    nu = transport.nu(mesh, U)
    nu_eff = turb.nu_eff(mesh, turb_state, nu)

    # momentum predictor (UEqn.H)
    UEqn = fvm.div(mesh, phi, U, div_u) \
        + div_dev_reff(mesh, nu_eff, U, lap_corr,
                       turb_nl_stress(turb, mesh, turb_state, U))
    if u_source is not None:
        UEqn = UEqn.replace(
            source=UEqn.source - mesh.V[:, None] * u_source(mesh, U))
    UEqn = fv_options(mesh, "U", UEqn, {"nu": nu})
    UEqn = UEqn.relax(mesh, u_relax)
    UEqn = fv_options.constrain(mesh, "U", UEqn)
    U, u_perf = solve(mesh, UEqn == (-fvc.grad(mesh, p)),
                      u_controls, env={"phi": phi})

    # pressure equation (pEqn.H)
    UEqn_c = UEqn.replace(psi=U)
    rAU = 1.0 / UEqn_c.A(mesh)
    HbyA = fvc.constrain_hbya(mesh, rAU * UEqn_c.H(mesh), U)
    phi_hbya = fvc.flux(mesh, HbyA)
    phi_hbya = fvc.adjust_phi(mesh, phi_hbya, U)

    p_prev = p
    p_perf_all = []
    for north in range(n_non_orth + 1):
        pEqn = fvm.laplacian(mesh, rAU, p, lap_corr) \
            == fvc.div(mesh, phi_hbya)
        pEqn = pEqn.set_reference(p_ref_cell, p_ref_value, p_ref_weight)
        p, p_perf = solve(mesh, pEqn, p_controls)
        p_perf_all.append(p_perf[0])
    phi = phi_hbya - pEqn.replace(psi=p).flux(mesh)

    local_err, glob_err = continuity_errors(mesh, phi)

    # explicit relaxation of p, then momentum correction
    p = relax_field(p, p_prev, p_relax)
    U_star = HbyA - rAU * fvc.grad(mesh, p)
    U = U.replace(data=U_star.data).correct_boundary_conditions(
        mesh, env={"phi": phi})

    turb_state, turb_perf = turb.correct(mesh, turb_state, U, phi, nu)

    stats = dict(u_perf=u_perf, p_perf=tuple(p_perf_all),
                 turb=turb_perf, cont=(local_err, glob_err))
    return U, p, phi, turb_state, stats


def step_kwargs_from_case(case: Case, simple: SimpleControl,
                          transport, turb, u_source=None, u_name="U"):
    """The static solver configuration consumed by simple_step."""
    from ..models.fvoptions import FvOptions
    return dict(
        transport=transport, turb=turb, fv_options=FvOptions(case),
        div_u=case.div_scheme(f"div(phi,{u_name})"),
        lap_corr=case.laplacian_scheme(),
        u_controls=case.solver_controls(u_name),
        p_controls=case.solver_controls("p"),
        u_relax=case.relaxation_factor(u_name, "equations", 0.0),
        p_relax=case.relaxation_factor("p", "fields", 0.0),
        n_non_orth=simple.n_non_orth,
        p_ref_cell=simple.p_ref_cell, p_ref_value=simple.p_ref_value,
        u_source=u_source)


def make_step(case: Case, transport, turb, simple: SimpleControl,
              u_source=None, u_name="U"):
    """u_source: optional (mesh, U) -> (n,3) acceleration added to the
    momentum LHS (SRFSimpleFoam's `+ SRF->Su()`); u_name: fvSolution/
    fvSchemes key for the velocity (SRF solvers use 'Urel')."""
    kw = step_kwargs_from_case(case, simple, transport, turb,
                               u_source, u_name)
    # mesh as jit ARGUMENT (see icofoam.make_step): keeps O(mesh)
    # geometry out of the compiled program's constants; the banded/DIA
    # layout + GAMG hierarchy must be derived CONCRETE, so attach them
    # to the mesh pytree before the jit boundary
    from ..linalg.precompute import attach_solver_layouts
    mesh = attach_solver_layouts(
        case.mesh, (kw["u_controls"], kw["p_controls"]), case=case)
    mesh = jax.device_put(mesh)

    @jax.jit
    def _step(mesh, U: VolField, p: VolField, phi: SurfaceField,
              turb_state):
        return simple_step(mesh, U, p, phi, turb_state, **kw)

    def step(U, p, phi, turb_state):
        return _step(mesh, U, p, phi, turb_state)

    return step


def run(case_dir: str, write: bool = True, max_steps: int | None = None):
    case = Case(case_dir)
    mesh = case.mesh

    info("Reading field p\n\nReading field U\n")
    p = case.read_field("p")
    U = case.read_field("U")
    phi = fvc.flux(mesh, U)

    transport = SinglePhaseTransportModel(case.transport_properties())
    turb = make_ras_model(case, U)
    turb_state = turb.init_state(U)
    simple = SimpleControl(case)

    step = make_step(case, transport, turb, simple)
    timer = ExecutionTimer()
    cumulative_err = 0.0
    u_solver = case.solver_controls("U").solver
    p_solver = case.solver_controls("p").solver

    from ..postprocess import FunctionObjectList
    fos = FunctionObjectList(case)

    info("\nStarting time loop\n")
    n = 0
    initial_residuals = None
    while simple.loop(initial_residuals):
        info(f"Time = {case.time.name}\n")
        U, p, phi, turb_state, stats = step(U, p, phi, turb_state)

        initial_residuals = {}
        for cmpt, perf in zip("xyz", stats["u_perf"]):
            log_solve(u_solver, f"U{cmpt}", perf[0], perf[1], perf[2])
            initial_residuals[f"U{cmpt}"] = float(perf[0])
        initial_residuals["U"] = max(
            float(pf[0]) for pf in stats["u_perf"])
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

    if write:
        case.write_fields([U, p] + list(turb_state.values()))
    fos.close()
    info("End\n")
    return case, U, p, phi, turb_state


def main(argv=None):
    import argparse
    ap = argparse.ArgumentParser(description="simpleFoam (rapidcfd_tpu)")
    ap.add_argument("-case", dest="case", default=".")
    ap.add_argument("-noWrite", action="store_true")
    args = ap.parse_args(argv)
    run(args.case, write=not args.noWrite)


if __name__ == "__main__":
    main()
