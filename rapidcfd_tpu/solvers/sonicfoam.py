"""sonicFoam — transonic/supersonic compressible PISO solver.

Capability parity with the reference solver (reference:
applications/solvers/compressible/sonicFoam/sonicFoam.C with rhoEqn.H,
UEqn.H, EEqn.H, pEqn.H): psi-based pressure equation in its transonic
form fvm::ddt(psi,p) + fvm::div(phid,p) - fvm::laplacian(rho*rAU,p),
energy equation for internal energy with the explicit kinetic+flow-work
flux, density update from the equation of state.
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
                             log_courant, log_solve)
from .case import Case
from .controls import PisoControl
from .icofoam import courant_number


def make_step(case: Case, thermo: PsiThermo, ctrl: PisoControl,
              dym: bool = False):
    """dym=True gives sonicDyMFoam (reference: compressible/sonicFoam/
    sonicDyMFoam/): the step takes the UPDATED mesh as a jit argument
    plus (mesh_phi, mesh_ub); the caller passes the RELATIVE mass flux
    and gets it back; phid is made relative with interp(psi)*meshPhi
    (the reference's fvc::makeRelative(fvc::interpolate(psi), phid))."""
    mesh = case.mesh
    m = thermo.model
    div_u = case.div_scheme("div(phi,U)")
    div_e = case.div_scheme("div(phi,e)")
    try:
        div_phid_p = case.div_scheme("div(phid,p)")
    except KeyError:
        div_phid_p = "upwind"
    try:
        div_ekp = case.div_scheme("div(phi,Ekp)")
    except KeyError:
        div_ekp = div_e
    lap_corr = case.laplacian_scheme()
    ddt_scheme = case.ddt_scheme()
    u_controls = case.solver_controls("U")
    p_controls = case.solver_controls("p")
    p_final = case.solver_controls("p", final=True)
    e_controls = case.solver_controls("e")
    n_corr = ctrl.n_correctors
    n_non_orth = ctrl.n_non_orth
    # vacuum guards at expansion corners (newer-reference pMin/TMin limits)
    p_min = float(ctrl.dict.scalar("pMin", 0.0))
    t_min = float(ctrl.dict.scalar("TMin", 0.0))

    @jax.jit
    def _step(mesh, U: VolField, p: VolField, T: VolField,
              rho: VolField, phi: SurfaceField, dt, mesh_phi, mesh_ub):
        if dym:
            from ..fields.bcs import MovingWallVelocity
            env_w = {"meshUb": mesh_ub,
                     "meshPhiB": mesh_phi[mesh.n_internal:]}
            bcdata = list(U.bcdata)
            for i, bc in enumerate(U.bcs):
                if isinstance(bc, MovingWallVelocity):
                    patch = mesh.patches[i]
                    sl = slice(patch.bstart, patch.bstart + patch.size)
                    nrm = mesh.patch_normals(patch)
                    v = mesh_ub[sl]
                    vn = (mesh_phi[mesh.n_internal:][sl] / jnp.maximum(
                        mesh.patch_mag_sf(patch), 1e-30))[:, None] * nrm
                    bd = dict(bcdata[i])
                    bd["meshWallValue"] = \
                        v - nrm * (v * nrm).sum(-1, keepdims=True) + vn
                    bcdata[i] = bd
            U = U.replace(bcdata=tuple(bcdata))
            U = U.correct_boundary_conditions(mesh, env={**env_w,
                                                         "phi": phi})
            phi_b = rho.bvalues * (
                (U.bvalues * mesh.Sf[mesh.n_internal:]).sum(-1)
                - mesh_phi[mesh.n_internal:])
            phi = SurfaceField(jnp.concatenate(
                [phi.data[:mesh.n_internal], phi_b]), phi.dims, "phi")
        U = U.store_old()
        p = p.store_old()
        T = T.store_old()
        rho = rho.store_old()

        # ---- rhoEqn.H: solve(ddt(rho) + div(phi)) — diagonal update
        div_phi = fvc.div(mesh, phi)
        rho = rho.replace(data=rho.old.data - dt * div_phi.data) \
                 .correct_boundary_conditions(mesh)

        # ---- UEqn.H
        mu = m.mu(T.data)
        mu_f = Dimensioned("mu", DimensionSet.of(1, -1, -1),
                           m.mu(fvc.face_values(mesh, T)))
        UEqn = (fvm.ddt(mesh, U, dt, ddt_scheme, coeff=rho)
                + fvm.div(mesh, phi, U, div_u)
                - fvm.laplacian(mesh, mu_f, U, lap_corr))
        U, u_perf = solve(mesh, UEqn == (-fvc.grad(mesh, p)), u_controls)

        # ---- EEqn.H: energy (sensible internal energy)
        e = thermo.he_field(mesh, T).replace(old=None)
        e_old = thermo.he_field(mesh, T.old)
        e = e.replace(old=e_old)
        alpha_f = Dimensioned("alpha", DimensionSet.of(1, -1, -1),
                              m.alpha_h(fvc.face_values(mesh, T)))
        ekp_data = 0.5 * (U.data * U.data).sum(-1) \
            + p.data / jnp.maximum(rho.data, 1e-30)
        ekp_b = 0.5 * (U.bvalues * U.bvalues).sum(-1) \
            + p.bvalues / jnp.maximum(rho.bvalues, 1e-30)
        Ekp = e.with_calculated_bcs(ekp_data, ekp_b, e.dims, "Ekp")
        eEqn = (fvm.ddt(mesh, e, dt, ddt_scheme, coeff=rho)
                + fvm.div(mesh, phi, e, div_e)
                - fvm.laplacian(mesh, alpha_f, e, lap_corr))
        eEqn = eEqn.equals(-fvc.div(mesh, phi, Ekp, div_ekp))
        e, e_perf = solve(mesh, eEqn, e_controls)
        T = thermo.update_t(mesh, T, e)
        if t_min > 0:
            T = T.replace(data=jnp.maximum(T.data, t_min),
                          bvalues=jnp.maximum(T.bvalues, t_min))

        # psi with old level for ddt(psi, p)
        psi = T.with_calculated_bcs(m.psi(T.data), m.psi(T.bvalues),
                                    DimensionSet.of(0, -2, 2), "psi")
        psi_old = T.with_calculated_bcs(
            m.psi(T.old.data), m.psi(T.old.bvalues),
            DimensionSet.of(0, -2, 2), "psi")
        psi = psi.replace(old=psi_old.replace(old=None))

        # ---- pEqn.H (transonic)
        p_perf_all = []
        for corr in range(n_corr):
            UEqn_c = UEqn.replace(psi=U)
            rAU = 1.0 / UEqn_c.A(mesh)
            HbyA = fvc.constrain_hbya(mesh, rAU * UEqn_c.H(mesh), U)
            # phid = interp(psi) * (interp(HbyA) & Sf)   [dims: phi/p]
            psi_f = fvc.face_values(mesh, psi)
            phid_data = psi_f * fvc.flux(mesh, HbyA).data
            if dym:
                # fvc::makeRelative(interp(psi), phid)
                phid_data = phid_data - psi_f * mesh_phi
            phid = SurfaceField(
                phid_data, psi.dims * DimensionSet.of(0, 3, -1), "phid")
            rho_rau = rho * rAU
            for north in range(n_non_orth + 1):
                final = corr == n_corr - 1 and north == n_non_orth
                pEqn = (fvm.ddt(mesh, p, dt, ddt_scheme, coeff=psi)
                        + fvm.div(mesh, phid, p, div_phid_p)
                        - fvm.laplacian(mesh, rho_rau, p, lap_corr))
                p, p_perf = solve(mesh, pEqn,
                                  p_final if final else p_controls)
                p_perf_all.append(p_perf[0])
            if p_min > 0:
                p = p.replace(data=jnp.maximum(p.data, p_min),
                              bvalues=jnp.maximum(p.bvalues, p_min))
            phi = pEqn.replace(psi=p).flux(mesh)
            U_star = HbyA - rAU * fvc.grad(mesh, p)
            env_u = ({"meshUb": mesh_ub,
                      "meshPhiB": mesh_phi[mesh.n_internal:],
                      "phi": phi} if dym else None)
            U = U.replace(data=U_star.data).correct_boundary_conditions(
                mesh, env=env_u)
            rho = rho.replace(
                data=m.rho(p.data, T.data),
                bvalues=m.rho(p.bvalues, T.bvalues))

        # compressible continuity error: ddt(rho)+div(phi) residual
        cont = (rho.data - rho.old.data) / dt + fvc.div(mesh, phi).data
        local_err = gsum(jnp.abs(cont) * mesh.V)
        glob_err = gsum(cont * mesh.V)
        c = m.c_sound(T.data)
        umag = jnp.linalg.norm(U.data, axis=-1)
        co_mean, co_max = courant_number(
            mesh, phi / fvc.interpolate(mesh, rho), dt)

        stats = dict(u_perf=u_perf, p_perf=tuple(p_perf_all),
                     e_perf=e_perf, cont=(local_err, glob_err),
                     co=(co_mean, co_max),
                     mach_max=(umag / c).max())
        return U, p, T, rho, phi, stats

    from ..linalg.precompute import attach_solver_layouts
    if dym:
        import dataclasses as _dc
        mesh0 = jax.device_put(attach_solver_layouts(
            mesh, (p_controls, p_final), case=case))

        def step(mesh_new, U, p, T, rho, phi_rel, dt, mesh_phi,
                 mesh_ub):
            from ..ops.interpolation import set_current_dt
            set_current_dt(dt)
            m2 = _dc.replace(mesh_new, band=mesh0.band, gamg=mesh0.gamg)
            return _step(m2, U, p, T, rho, phi_rel, dt, mesh_phi,
                         mesh_ub)
        return step

    mesh_a = jax.device_put(attach_solver_layouts(
        mesh, (p_controls, p_final), case=case))
    zf = jnp.zeros(mesh.n_faces, mesh.V.dtype)
    zb = jnp.zeros((mesh.n_boundary, 3), mesh.C.dtype)

    def step(U, p, T, rho, phi, dt):
        from ..ops.interpolation import set_current_dt
        set_current_dt(dt)
        return _step(mesh_a, U, p, T, rho, phi, dt, zf, zb)

    return step


def run(case_dir: str, write: bool = True, max_steps: int | None = None):
    case = Case(case_dir)
    mesh = case.mesh

    thermo_model = read_thermo(case.constant_dict(
        "thermophysicalProperties"))
    thermo = PsiThermo(case, thermo_model)
    info(f"Perfect gas: R={thermo_model.r:.6g} Cp={thermo_model.cp:.6g} "
         f"gamma={thermo_model.gamma:.4g}\n")

    p = case.read_field("p")
    T = case.read_field("T")
    U = case.read_field("U")
    m = thermo_model
    rho = T.with_calculated_bcs(m.rho(p.data, T.data),
                                m.rho(p.bvalues, T.bvalues),
                                dim_density, "rho")
    # mass flux phi = rho_f * (U_f & Sf)
    rho_f = fvc.face_values(mesh, rho)
    phi = SurfaceField(rho_f * fvc.flux(mesh, U).data,
                       DimensionSet.of(1, 0, -1), "phi")

    ctrl = PisoControl(case)
    step = make_step(case, thermo, ctrl)
    timer = ExecutionTimer()
    cumulative_err = 0.0

    info("\nStarting time loop\n")
    n = 0
    while case.time.loop():
        info(f"Time = {case.time.name}\n")
        U, p, T, rho, phi, stats = step(U, p, T, rho, phi,
                                        case.time.delta_t)
        co_mean, co_max = stats["co"]
        log_courant(co_mean, co_max)
        for cmpt, perf in zip("xyz", stats["u_perf"]):
            log_solve(case.solver_controls("U").solver, f"U{cmpt}",
                      perf[0], perf[1], perf[2])
        log_solve(case.solver_controls("e").solver, "e",
                  stats["e_perf"][0][0], stats["e_perf"][0][1],
                  stats["e_perf"][0][2])
        for perf in stats["p_perf"]:
            log_solve(case.solver_controls("p").solver, "p",
                      perf[0], perf[1], perf[2])
        info(f"max Mach = {float(stats['mach_max']):.4g}")
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
    ap = argparse.ArgumentParser(description="sonicFoam (rapidcfd_tpu)")
    ap.add_argument("-case", dest="case", default=".")
    ap.add_argument("-noWrite", action="store_true")
    args = ap.parse_args(argv)
    run(args.case, write=not args.noWrite)


if __name__ == "__main__":
    main()
