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


def make_step(case: Case, thermo: PsiThermo, simple: SimpleControl,
              turb=None, consistent: bool = False,
              p_offset: float = 0.0):
    """turb: optional CompressibleTurbulence adapter; when present the
    momentum uses muEff = mu + rho*nut (+ explicit dev2 stress) and the
    energy alphaEff = alpha + rho*nut/Prt (reference: compressible RAS
    divDevRhoReff / alphaEff).

    consistent=True runs the SIMPLEC corrector (rhoSimplecFoam,
    reference: applications/solvers/compressible/rhoSimpleFoam/
    rhoSimplecFoam/pEqn.H subsonic branch): rAtU = 1/(1/rAU - H1),
    phiHbyA += interp(rho*(rAtU-rAU))*snGrad(p)*magSf,
    HbyA -= (rAU-rAtU)*grad(p), laplacian(rho*rAtU, p), and the momentum
    corrector uses rAtU — permitting p relaxation factors near 1."""
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
    # p may run in DEVIATION form (fields.field.shift_level): the solver
    # sees p - p_offset everywhere; only EoS evaluations and the
    # reference pin need the absolute level back
    p_ref_cell = simple.p_ref_cell
    p_ref_value = simple.p_ref_value - p_offset

    has_turb = turb is not None and not turb.laminar

    @jax.jit
    def step(U: VolField, p: VolField, T: VolField, rho: VolField,
             phi: SurfaceField, turb_state):
        mu_face = m.mu(fvc.face_values(mesh, T))
        rho_f0 = fvc.face_values(mesh, rho)
        mut_f = turb.mut_faces(mesh, turb_state, rho_f0) \
            if has_turb else None
        mu_eff = mu_face + mut_f if mut_f is not None else mu_face
        mu_f = Dimensioned("muEff", DimensionSet.of(1, -1, -1), mu_eff)
        # ---- UEqn.H (steady, mass-flux convection)
        UEqn = (fvm.div(mesh, phi, U, div_u)
                - fvm.laplacian(mesh, mu_f, U, lap_corr))
        if has_turb:
            # explicit part of divDevRhoReff: div(muEff*dev2(T(grad U)))
            g = fvc.grad(mesh, U)

            def dev2t(t):
                tr = jnp.trace(t, axis1=-2, axis2=-1)
                eye = jnp.eye(3, dtype=t.dtype)
                return jnp.swapaxes(t, -1, -2) \
                    - (2.0 / 3.0) * tr[..., None, None] * eye
            devT = g.with_calculated_bcs(dev2t(g.data),
                                         dev2t(g.bvalues), g.dims,
                                         "dev2T")
            nut_c = turb.inner.nut(turb_state)
            mu_eff_c = T.with_calculated_bcs(
                m.mu(T.data) + rho.data * jnp.maximum(nut_c.data, 0.0),
                m.mu(T.bvalues)
                + rho.bvalues * jnp.maximum(nut_c.bvalues, 0.0),
                DimensionSet.of(1, -1, -1), "muEff")
            expl = fvc.div_tensor(mesh, devT * mu_eff_c)
            UEqn = UEqn.replace(
                source=UEqn.source + mesh.V[:, None] * expl.data)
        UEqn = UEqn.relax(mesh, u_relax)
        U, u_perf = solve(mesh, UEqn == (-fvc.grad(mesh, p)), u_controls)

        # ---- EEqn.H: enthalpy
        h = thermo.he_field(mesh, T, "h")
        alpha_face = m.alpha_h(fvc.face_values(mesh, T))
        if mut_f is not None:
            alpha_face = alpha_face + mut_f / turb.prt
        alpha_f = Dimensioned("alphaEff", DimensionSet.of(1, -1, -1),
                              alpha_face)
        ek_data = 0.5 * (U.data * U.data).sum(-1)
        ek_b = 0.5 * (U.bvalues * U.bvalues).sum(-1)
        Ek = h.with_calculated_bcs(ek_data, ek_b, h.dims, "K")
        hEqn = (fvm.div(mesh, phi, h, div_h)
                - fvm.laplacian(mesh, alpha_f, h, lap_corr))
        hEqn = hEqn.equals(-fvc.div(mesh, phi, Ek, div_h))
        hEqn = hEqn.relax(mesh, h_relax)
        h, h_perf = solve(mesh, hEqn, h_controls)
        T = thermo.update_t(mesh, T, h)
        rho_eos = rho.replace(
            data=m.rho(p.data + p_offset, T.data),
            bvalues=m.rho(p.bvalues + p_offset, T.bvalues))
        rho = relax_field(rho_eos, rho, rho_relax)

        # ---- pEqn.H (subsonic SIMPLE / SIMPLEC)
        UEqn_c = UEqn.replace(psi=U)
        rAU = 1.0 / UEqn_c.A(mesh)
        rAtU = (1.0 / (1.0 / rAU - UEqn_c.H1(mesh))
                if consistent else rAU)
        HbyA = fvc.constrain_hbya(mesh, rAU * UEqn_c.H(mesh), U)
        rho_f = fvc.face_values(mesh, rho)
        phi_hbya = SurfaceField(rho_f * fvc.flux(mesh, HbyA).data,
                                DimensionSet.of(1, 0, -1), "phiHbyA")
        phi_hbya = fvc.adjust_phi(mesh, phi_hbya, U)
        if consistent:
            drho_rau_f = fvc.face_values(mesh, rho * (rAtU - rAU))
            phi_hbya = SurfaceField(
                phi_hbya.data
                + drho_rau_f * fvc.sn_grad(mesh, p).data * mesh.mag_sf,
                phi_hbya.dims, "phiHbyA")
            HbyA = HbyA - (rAU - rAtU) * fvc.grad(mesh, p)
        rho_rau = rho * rAtU

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
        U_star = HbyA - rAtU * fvc.grad(mesh, p)
        U = U.replace(data=U_star.data).correct_boundary_conditions(mesh)
        rho = rho.replace(
            data=m.rho(p.data + p_offset, T.data),
            bvalues=m.rho(p.bvalues + p_offset, T.bvalues))

        if has_turb:
            nu_lam = T.with_calculated_bcs(
                m.mu(T.data) / rho.data, m.mu(T.bvalues) / rho.bvalues,
                DimensionSet.of(0, 2, -1), "nu")
            turb_state, turb_perf = turb.correct(
                mesh, turb_state, U, phi, rho, nu_lam)
        else:
            turb_perf = {}

        stats = dict(u_perf=u_perf, h_perf=h_perf,
                     p_perf=tuple(p_perf_all), turb=turb_perf,
                     cont=(local_err, glob_err))
        return U, p, T, rho, phi, turb_state, stats

    return step


def run(case_dir: str, write: bool = True, max_steps: int | None = None,
        consistent: bool = False):
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

    # fp32: SI absolute pressure quantizes at eps32*1e5 ~ 0.01 Pa —
    # above the cell-to-cell differences of low-Mach flows. Run p in
    # deviation form (shift_level) when the static level dominates the
    # dynamic range; fp64 stays absolute (bit-identical to before).
    import numpy as np
    p_offset = 0.0
    if p.data.dtype == jnp.float32:
        pa = np.asarray(p.data)
        lvl, dyn = float(np.mean(pa)), float(pa.max() - pa.min())
        if abs(lvl) > 100.0 * max(dyn, 1e-30):
            p_offset = lvl
            from ..fields.field import shift_level
            p = shift_level(p, -p_offset)
            info(f"rhoSimpleFoam: solving p in deviation form "
                 f"(p_offset = {p_offset:g})\n")

    simple = SimpleControl(case)
    from ..models.turbulence import CompressibleTurbulence
    turb = CompressibleTurbulence(case, U)
    turb_state = turb.init_state(U)
    step = make_step(case, thermo, simple, turb=turb,
                     consistent=consistent, p_offset=p_offset)
    timer = ExecutionTimer()
    cumulative_err = 0.0

    info("\nStarting time loop\n")
    n = 0
    initial_residuals = None
    while simple.loop(initial_residuals):
        info(f"Time = {case.time.name}\n")
        U, p, T, rho, phi, turb_state, stats = step(U, p, T, rho, phi,
                                                    turb_state)
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
        for tname, perf in stats.get("turb", {}).items():
            log_solve(case.solver_controls(tname).solver, tname,
                      perf[0], perf[1], perf[2])
            initial_residuals[tname] = float(perf[0])
        local_err, glob_err = stats["cont"]
        cumulative_err += float(glob_err)
        log_continuity(cumulative_err, local_err, glob_err)
        timer.log()

        if write and case.time.write_time():
            from ..fields.field import shift_level
            p_abs = shift_level(p, p_offset) if p_offset else p
            case.write_fields([U, p_abs, T, rho.replace(name="rho")]
                              + list(turb_state.values()))
        n += 1
        if max_steps and n >= max_steps:
            break
    info("End\n")
    if p_offset:
        from ..fields.field import shift_level
        p = shift_level(p, p_offset)
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
