"""interPhaseChangeFoam — two incompressible phases with mass transfer
(cavitation).

Capability parity with the reference solver (reference:
applications/solvers/multiphase/interPhaseChangeFoam/
interPhaseChangeFoam.C with alphaEqn.H/UEqn.H/pEqn.H): the alpha
equation is the implicit (MULESCorr) upwind form with the
vaporisation/condensation Sp/Su sources and the -Sp(div(U)) dilation
term; the p_rgh equation carries the (vDotvP - vDotcP)(pSat - rho gh)
phase-change compressibility source.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from ..fields.field import Dimensioned, SurfaceField, VolField
from ..linalg import solve
from ..linalg.solvers import gsum
from ..models.phasechange import make_phase_change_mixture
from ..ops import fvc, fvm
from ..utils.dictionary import parse_file
from ..utils.dimensions import DimensionSet, dim_density
from ..utils.logging import (ExecutionTimer, info, log_continuity,
                             log_courant, log_solve)
from .case import Case
from .controls import PimpleControl
from .interfoam import _read_constants

_RTIME = DimensionSet.of(0, 0, -1)


def run(case_dir: str, write: bool = True, max_steps: int | None = None,
        dym: bool = False):
    """dym=True gives interPhaseChangeDyMFoam (reference: multiphase/
    interPhaseChangeFoam/interPhaseChangeDyMFoam/
    interPhaseChangeDyMFoam.C): mesh.update() each step, relative flux,
    divU taken of the ABSOLUTE flux (reference :109
    fvc::div(fvc::absolute(phi, U)))."""
    case = Case(case_dir)
    mesh = case.mesh
    dyn = None
    if dym:
        from ..models.dynamicmesh import make_dynamic_mesh
        dyn = make_dynamic_mesh(case)
    rho1, rho2, nu1, nu2, sigma, g = _read_constants(case)
    pc = make_phase_change_mixture(case.transport_properties(),
                                   rho1, rho2)
    info(f"Cavitation: rho1={rho1} rho2={rho2} pSat={pc.p_sat}\n")

    alpha_name = "alpha.water" if case.field_exists("alpha.water") \
        else "alpha1"
    alpha = case.read_field(alpha_name)
    U = case.read_field("U")
    p_rgh = case.read_field("p_rgh")
    phi = jax.jit(lambda u: fvc.flux(mesh, u))(U)

    ctrl = PimpleControl(case)
    solvers_d = case.fv_solution.subdict("solvers")
    a_key = "alpha.water" \
        if solvers_d.lookup("alpha.water") is not None else "alpha1"
    alpha_controls = case.solver_controls(a_key)
    p_controls = case.solver_controls("p_rgh")
    p_final = case.solver_controls("p_rgh", final=True)
    u_controls = case.solver_controls("U")
    div_alpha = case.div_scheme("div(phi,alpha)")
    div_u = case.div_scheme("div(rhoPhi,U)")
    lap_corr = case.laplacian_scheme()
    n_outer, n_corr = ctrl.n_outer, ctrl.n_correctors
    n_non_orth = ctrl.n_non_orth
    p_ref_cell, p_ref_value = ctrl.p_ref_cell, ctrl.p_ref_value
    def mixture(a):
        rho_d = a.data * rho1 + (1.0 - a.data) * rho2
        rho_b = a.bvalues * rho1 + (1.0 - a.bvalues) * rho2
        rho = a.with_calculated_bcs(rho_d, rho_b, dim_density, "rho")
        mu_d = a.data * rho1 * nu1 + (1.0 - a.data) * rho2 * nu2
        mu_b = a.bvalues * rho1 * nu1 + (1.0 - a.bvalues) * rho2 * nu2
        mu = a.with_calculated_bcs(mu_d, mu_b,
                                   DimensionSet.of(1, -1, -1), "mu")
        return rho, mu

    @jax.jit
    def _step(mesh, alpha: VolField, U: VolField, p_rgh: VolField,
              phi: SurfaceField, dt, mesh_phi, mesh_ub):
        gh = (mesh.C * jnp.asarray(g, mesh.C.dtype)).sum(-1)
        ghf = (mesh.Cf * jnp.asarray(g, mesh.C.dtype)).sum(-1)
        U = U.store_old()
        alpha = alpha.store_old()
        rho0, _ = mixture(alpha)
        p_abs = p_rgh.with_calculated_bcs(
            p_rgh.data + rho0.data * gh,
            p_rgh.bvalues
            + rho0.bvalues * ghf[mesh.n_internal:], p_rgh.dims, "p")

        # ---- alphaEqn.H (implicit MULESCorr form with sources)
        vdotc_a, vdotv_a = pc.v_dot_alphal(alpha.data, p_abs.data)
        vdotvmc = vdotv_a - vdotc_a
        # divU of the ABSOLUTE flux (identity when static: mesh_phi==0)
        div_u_field = fvc.div(mesh, SurfaceField(
            phi.data + mesh_phi, phi.dims, "phiAbs"))
        a_eqn = (fvm.ddt(mesh, alpha, dt)
                 + fvm.div(mesh, phi, alpha, "upwind")
                 - fvm.Sp(mesh, Dimensioned("divU", _RTIME,
                                            div_u_field.data), alpha)
                 - fvm.Sp(mesh, Dimensioned("vDotvmc", _RTIME, vdotvmc),
                          alpha))
        rhs_a = alpha.with_calculated_bcs(
            vdotc_a, jnp.zeros_like(alpha.bvalues), _RTIME)
        alpha, a_perf = solve(mesh, a_eqn.equals(rhs_a), alpha_controls,
                              env={"phi": phi})
        alpha = alpha.replace(data=jnp.clip(alpha.data, 0.0, 1.0),
                              bvalues=jnp.clip(alpha.bvalues, 0.0, 1.0))

        rho, mu = mixture(alpha)
        rho = rho.replace(old=mixture(alpha.old)[0].replace(old=None))
        a_f = fvc.face_values(mesh, alpha, "vanLeer", phi)
        rho_phi = SurfaceField(
            phi.data * (a_f * (rho1 - rho2) + rho2),
            phi.dims * dim_density, "rhoPhi")

        # ---- UEqn.H
        mu_f = Dimensioned("muf", DimensionSet.of(1, -1, -1),
                           fvc.face_values(mesh, mu))
        UEqn = (fvm.ddt(mesh, U, dt, "Euler", coeff=rho)
                + fvm.div(mesh, rho_phi, U, div_u)
                - fvm.laplacian(mesh, mu_f, U, lap_corr))

        p_perf_all = []
        for corr in range(n_corr):
            UEqn_c = UEqn.replace(psi=U) if corr else UEqn
            rAU = 1.0 / UEqn_c.A(mesh)
            rAU_f = fvc.face_values(mesh, rAU)
            HbyA = fvc.constrain_hbya(mesh, rAU * UEqn_c.H(mesh), U)
            phi_hbya = fvc.flux(mesh, HbyA)
            if dym:
                # fvc::makeRelative(phiHbyA, U)
                phi_hbya = SurfaceField(phi_hbya.data - mesh_phi,
                                        phi_hbya.dims, "phiHbyA")
            sng_rho = fvc.sn_grad(mesh, rho)
            phig = (-ghf * sng_rho.data * rAU_f * mesh.mag_sf) \
                .at[mesh.n_internal:].set(0.0)
            phi_hbya = SurfaceField(phi_hbya.data + phig, phi.dims,
                                    "phiHbyA")

            vdotc_p, vdotv_p = pc.v_dot_p(alpha.data, p_abs.data)
            dvp = vdotv_p - vdotc_p          # <= 0 by construction
            for north in range(n_non_orth + 1):
                final = corr == n_corr - 1 and north == n_non_orth
                # fvc::div(phiHbyA) - laplacian(rAU, p_rgh)
                # - (vDotvP-vDotcP)*(pSat - rho gh) + Sp(vDotvP-vDotcP)
                pEqn = fvm.laplacian(mesh, rAU, p_rgh, lap_corr) \
                    - fvm.Sp(mesh, Dimensioned(
                        "dvp", DimensionSet.of(-1, 1, 1), dvp), p_rgh)
                rhs_p = p_rgh.with_calculated_bcs(
                    fvc.div(mesh, phi_hbya).data
                    - dvp * (pc.p_sat - rho.data * gh),
                    jnp.zeros_like(p_rgh.bvalues),
                    phi.dims / DimensionSet.of(0, 3))
                pEqn = pEqn.equals(rhs_p)
                pEqn = pEqn.set_reference(p_ref_cell, p_ref_value)
                p_rgh, p_perf = solve(mesh, pEqn,
                                      p_final if final else p_controls)
                p_perf_all.append(p_perf[0])
            phi = phi_hbya - pEqn.replace(psi=p_rgh).flux(mesh)
            flux_p = pEqn.replace(psi=p_rgh).flux(mesh)
            corr_f = SurfaceField(
                (phig - flux_p.data) / jnp.maximum(rAU_f, 1e-30),
                phi.dims / rAU.dims, "corrF")
            U_star = HbyA + rAU * fvc.reconstruct(mesh, corr_f)
            env_u = ({"meshUb": mesh_ub,
                      "meshPhiB": mesh_phi[mesh.n_internal:],
                      "phi": phi} if dym else None)
            U = U.replace(data=U_star.data) \
                .correct_boundary_conditions(mesh, env=env_u)
            p_abs = p_rgh.with_calculated_bcs(
                p_rgh.data + rho.data * gh,
                p_rgh.bvalues
                + rho.bvalues * ghf[mesh.n_internal:], p_rgh.dims, "p")

        from .icofoam import courant_number
        co = courant_number(mesh, phi, dt)
        a_min, a_max = alpha.data.min(), alpha.data.max()
        stats = dict(a_perf=a_perf, p_perf=tuple(p_perf_all), co=co,
                     alpha=(a_min, a_max, gsum(alpha.data * mesh.V)),
                     vap=gsum((1.0 - alpha.data) * mesh.V))
        return alpha, U, p_rgh, phi, stats

    from ..linalg.precompute import attach_solver_layouts
    mesh0 = jax.device_put(attach_solver_layouts(
        mesh, (p_controls, p_final), case=case))

    def step(mesh_new, alpha, U, p_rgh, phi, dt, mesh_phi, mesh_ub):
        import dataclasses as _dc
        m2 = _dc.replace(mesh_new, band=mesh0.band, gamg=mesh0.gamg)
        return _step(m2, alpha, U, p_rgh, phi, dt, mesh_phi, mesh_ub)

    timer = ExecutionTimer()
    info("\nStarting time loop\n")
    n = 0
    zf = jnp.zeros(mesh.n_faces, mesh.V.dtype)
    zb = jnp.zeros((mesh.n_boundary, 3), mesh.C.dtype)
    while case.time.loop():
        info(f"Time = {case.time.name}\n")
        if dyn is not None:
            mesh, mesh_phi, mesh_ub = dyn.update(case.time.value)
            case.mesh = mesh
            phi = SurfaceField(phi.data - mesh_phi, phi.dims, "phi")
        else:
            mesh_phi, mesh_ub = zf, zb
        alpha, U, p_rgh, phi, stats = step(mesh, alpha, U, p_rgh, phi,
                                           case.time.delta_t, mesh_phi,
                                           mesh_ub)
        if dyn is not None:
            phi = SurfaceField(phi.data + mesh_phi, phi.dims, "phi")
        log_courant(*stats["co"])
        a_min, a_max, a_int = stats["alpha"]
        info(f"Liquid phase volume fraction = "
             f"{float(a_int) / float(mesh.V.sum()):.8g}  "
             f"Min(alpha1) = {float(a_min):.6g}  "
             f"Max(alpha1) = {float(a_max):.6g}")
        for perf in stats["p_perf"]:
            log_solve(p_controls.solver, "p_rgh", perf[0], perf[1],
                      perf[2])
        timer.log()
        if write and case.time.write_time():
            case.write_fields([alpha.replace(name=alpha_name), U, p_rgh])
        n += 1
        if max_steps and n >= max_steps:
            break
    info("End\n")
    return case, alpha, U, p_rgh, phi
