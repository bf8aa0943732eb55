"""rhoSimpleFoam — steady compressible SIMPLE solver.

Capability parity with the reference solver (reference:
applications/solvers/compressible/rhoSimpleFoam/rhoSimpleFoam.C with
UEqn.H/EEqn.H/pEqn.H, subsonic form): relaxed momentum, enthalpy energy
equation, rho-weighted pressure correction with density relaxation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..fields.field import Dimensioned, SurfaceField, VolField
from ..linalg import solve
from ..linalg.solvers import gsum
from ..models.thermo import PsiThermo, read_thermo
from ..ops import fvc, fvm
from ..utils.dimensions import DimensionSet, dim_density
from ..utils.logging import (ExecutionTimer, info, log_continuity,
                             log_solve)
from .case import Case
from .controls import SimpleControl
from .simplefoam import relax_field


def make_step(case: Case, thermo: PsiThermo, simple: SimpleControl):
    mesh = case.mesh
    m = thermo.model
    div_u = case.div_scheme("div(phi,U)")
    try:
        div_h = case.div_scheme("div(phi,h)")
    except KeyError:
        div_h = div_u
    lap_corr = case.laplacian_scheme()
    u_controls = case.solver_controls("U")
    p_controls = case.solver_controls("p")
    h_controls = case.solver_controls("h")
    u_relax = case.relaxation_factor("U", "equations", 0.3)
    h_relax = case.relaxation_factor("h", "equations", 0.7)
    p_relax = case.relaxation_factor("p", "fields", 0.3)
    rho_relax = case.relaxation_factor("rho", "fields", 1.0)
    n_non_orth = simple.n_non_orth
    p_ref_cell, p_ref_value = simple.p_ref_cell, simple.p_ref_value

    @jax.jit
    def step(U: VolField, p: VolField, T: VolField, rho: VolField,
             phi: SurfaceField):
        mu_f = Dimensioned("mu", DimensionSet.of(1, -1, -1),
                           m.mu(fvc.face_values(mesh, T)))
        # ---- UEqn.H (steady, mass-flux convection)
        UEqn = (fvm.div(mesh, phi, U, div_u)
                - fvm.laplacian(mesh, mu_f, U, lap_corr))
        UEqn = UEqn.relax(mesh, u_relax)
        U, u_perf = solve(mesh, UEqn == (-fvc.grad(mesh, p)), u_controls)

        # ---- EEqn.H: enthalpy
        h = thermo.he_field(mesh, T, "h")
        alpha_f = Dimensioned("alpha", DimensionSet.of(1, -1, -1),
                              m.alpha_h(fvc.face_values(mesh, T)))
        ek_data = 0.5 * (U.data * U.data).sum(-1)
        ek_b = 0.5 * (U.bvalues * U.bvalues).sum(-1)
        Ek = h.with_calculated_bcs(ek_data, ek_b, h.dims, "K")
        hEqn = (fvm.div(mesh, phi, h, div_h)
                - fvm.laplacian(mesh, alpha_f, h, lap_corr))
        hEqn = hEqn.equals(-fvc.div(mesh, phi, Ek, div_h))
        hEqn = hEqn.relax(mesh, h_relax)
        h, h_perf = solve(mesh, hEqn, h_controls)
        T = thermo.update_t(mesh, T, h)
        rho_eos = rho.replace(data=m.rho(p.data, T.data),
                              bvalues=m.rho(p.bvalues, T.bvalues))
        rho = relax_field(rho_eos, rho, rho_relax)

        # ---- pEqn.H (subsonic SIMPLE)
        UEqn_c = UEqn.replace(psi=U)
        rAU = 1.0 / UEqn_c.A(mesh)
        HbyA = fvc.constrain_hbya(mesh, rAU * UEqn_c.H(mesh), U)
        rho_f = fvc.face_values(mesh, rho)
        phi_hbya = SurfaceField(rho_f * fvc.flux(mesh, HbyA).data,
                                DimensionSet.of(1, 0, -1), "phiHbyA")
        phi_hbya = fvc.adjust_phi(mesh, phi_hbya, U)
        rho_rau = rho * rAU

        p_prev = p
        p_perf_all = []
        for north in range(n_non_orth + 1):
            pEqn = fvm.laplacian(mesh, rho_rau, p, lap_corr) \
                == fvc.div(mesh, phi_hbya)
            pEqn = pEqn.set_reference(p_ref_cell, p_ref_value)
            p, p_perf = solve(mesh, pEqn, p_controls)
            p_perf_all.append(p_perf[0])
        phi = phi_hbya - pEqn.replace(psi=p).flux(mesh)

        cont = fvc.div(mesh, phi)
        local_err = gsum(jnp.abs(cont.data) * mesh.V)
        glob_err = gsum(cont.data * mesh.V)

        p = relax_field(p, p_prev, p_relax)
        U_star = HbyA - rAU * fvc.grad(mesh, p)
        U = U.replace(data=U_star.data).correct_boundary_conditions(mesh)
        rho = rho.replace(data=m.rho(p.data, T.data),
                          bvalues=m.rho(p.bvalues, T.bvalues))

        stats = dict(u_perf=u_perf, h_perf=h_perf,
                     p_perf=tuple(p_perf_all),
                     cont=(local_err, glob_err))
        return U, p, T, rho, phi, stats

    return step


def run(case_dir: str, write: bool = True, max_steps: int | None = None):
    case = Case(case_dir)
    mesh = case.mesh
    thermo_model = read_thermo(case.constant_dict(
        "thermophysicalProperties"))
    thermo = PsiThermo(case, thermo_model)
    m = thermo_model

    p = case.read_field("p")
    T = case.read_field("T")
    U = case.read_field("U")
    rho = T.with_calculated_bcs(m.rho(p.data, T.data),
                                m.rho(p.bvalues, T.bvalues),
                                dim_density, "rho")
    rho_f = fvc.face_values(mesh, rho)
    phi = SurfaceField(rho_f * fvc.flux(mesh, U).data,
                       DimensionSet.of(1, 0, -1), "phi")

    simple = SimpleControl(case)
    step = make_step(case, thermo, simple)
    timer = ExecutionTimer()
    cumulative_err = 0.0

    info("\nStarting time loop\n")
    n = 0
    initial_residuals = None
    while simple.loop(initial_residuals):
        info(f"Time = {case.time.name}\n")
        U, p, T, rho, phi, stats = step(U, p, T, rho, phi)
        initial_residuals = {}
        for cmpt, perf in zip("xyz", stats["u_perf"]):
            log_solve(case.solver_controls("U").solver, f"U{cmpt}",
                      perf[0], perf[1], perf[2])
            initial_residuals[f"U{cmpt}"] = float(perf[0])
        log_solve(case.solver_controls("h").solver, "h",
                  stats["h_perf"][0][0], stats["h_perf"][0][1],
                  stats["h_perf"][0][2])
        initial_residuals["h"] = float(stats["h_perf"][0][0])
        for perf in stats["p_perf"]:
            log_solve(case.solver_controls("p").solver, "p",
                      perf[0], perf[1], perf[2])
        initial_residuals["p"] = float(stats["p_perf"][0][0])
        local_err, glob_err = stats["cont"]
        cumulative_err += float(glob_err)
        log_continuity(cumulative_err, local_err, glob_err)
        timer.log()

        if write and case.time.write_time():
            case.write_fields([U, p, T, rho.replace(name="rho")])
        n += 1
        if max_steps and n >= max_steps:
            break
    info("End\n")
    return case, U, p, T, rho, phi


def main(argv=None):
    import argparse
    ap = argparse.ArgumentParser(description="rhoSimpleFoam (rapidcfd_tpu)")
    ap.add_argument("-case", dest="case", default=".")
    ap.add_argument("-noWrite", action="store_true")
    args = ap.parse_args(argv)
    run(args.case, write=not args.noWrite)


if __name__ == "__main__":
    main()
