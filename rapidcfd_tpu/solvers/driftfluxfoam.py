"""driftFluxFoam — two-phase mixture (drift-flux) solver for settling
suspensions.

Capability parity with the reference solver (reference:
applications/solvers/multiphase/driftFluxFoam with alphaEqn.H/UEqn.H/
pEqn.H + relativeVelocityModels + mixtureViscosityModels): one mixture
momentum equation with the diffusion stress tauDm of the phase slip,
dispersed-phase transport with the drift flux phir = Sf & Udm, p_rgh
buoyancy. Relative-velocity models: 'simple' and 'general'; mixture
viscosity: 'plastic' (BinghamPlastic/slurry deferred).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from ..fields.field import Dimensioned, SurfaceField, VolField
from ..linalg import solve
from ..linalg.solvers import gsum
from ..ops import fvc, fvm
from ..utils.dictionary import Dictionary, parse_file
from ..utils.dimensions import DimensionSet, dim_density
from ..utils.logging import (ExecutionTimer, info, log_continuity,
                             log_courant, log_solve)
from .case import Case
from .controls import PimpleControl
from .icofoam import courant_number


def _dim(entry, name=""):
    return Dimensioned.from_entry(entry, name).value


def run(case_dir: str, write: bool = True, max_steps: int | None = None):
    case = Case(case_dir)
    mesh = case.mesh
    tp = case.transport_properties()
    phases = tp.lookup("phases")
    names = [str(x) for x in phases] if phases else ["sludge", "water"]
    dd = tp.subdict(names[0])
    dc = tp.subdict(names[1])
    rhod = _dim(dd.lookup("rho", required=True))
    rhoc = _dim(dc.lookup("rho", required=True))
    nuc = _dim(dc.lookup("nu", required=True)) \
        if dc.lookup("nu") is not None else 1e-6
    # mixture viscosity: plastic (reference: mixtureViscosityModels)
    visc = dd.subdict("viscosityModelCoeffs", required=False) \
        or tp.subdict("plasticCoeffs", required=False) or Dictionary()
    pv_coeff = _dim(visc.lookup("plasticViscosityCoeff", 0.0)) \
        if visc.lookup("plasticViscosityCoeff") is not None else 0.0
    pv_exp = _dim(visc.lookup("plasticViscosityExponent", 0.0)) \
        if visc.lookup("plasticViscosityExponent") is not None else 0.0
    mu_max = _dim(visc.lookup("muMax")) \
        if visc.lookup("muMax") is not None else 1e3

    # relative velocity model (simple | general)
    rv_name = str(tp.word("relativeVelocityModel", "simple"))
    rv = tp.subdict(rv_name + "Coeffs", required=False) or Dictionary()
    v0 = jnp.asarray([float(x) for x in
                      Dimensioned.from_entry(
                          rv.lookup("V0", required=True)).value])
    a_coef = _dim(rv.lookup("a", required=True))
    a1_coef = _dim(rv.lookup("a1")) if rv.lookup("a1") is not None else 0.0
    res_alpha = _dim(rv.lookup("residualAlpha")) \
        if rv.lookup("residualAlpha") is not None else 0.0

    gpath = os.path.join(case.dir, "constant", "g")
    g = [float(x) for x in parse_file(gpath).lookup("value")] \
        if os.path.isfile(gpath) else [0.0, -9.81, 0.0]
    ghf = (mesh.Cf * jnp.asarray(g, mesh.C.dtype)).sum(-1)

    alpha_name = next((f"alpha.{names[0]}" for _ in [0]
                       if case.field_exists(f"alpha.{names[0]}")),
                      "alpha1")
    alpha = case.read_field(alpha_name)
    U = case.read_field("U")
    p_rgh = case.read_field("p_rgh")
    phi = jax.jit(lambda u: fvc.flux(mesh, u))(U)

    ctrl = PimpleControl(case)
    solvers_d = case.fv_solution.subdict("solvers")
    a_key = alpha_name if solvers_d.lookup(alpha_name) is not None \
        else "alpha1"
    alpha_controls = case.solver_controls(a_key)
    p_controls = case.solver_controls("p_rgh")
    p_final = case.solver_controls("p_rgh", final=True)
    u_controls = case.solver_controls("U")
    div_u = case.div_scheme("div(rhoPhi,U)")
    lap_corr = case.laplacian_scheme()
    n_outer, n_corr = ctrl.n_outer, ctrl.n_correctors
    n_non_orth = ctrl.n_non_orth
    p_ref_cell, p_ref_value = ctrl.p_ref_cell, ctrl.p_ref_value

    def mixture_rho(a):
        return a.data * rhod + (1.0 - a.data) * rhoc, \
            a.bvalues * rhod + (1.0 - a.bvalues) * rhoc

    def udm(alpha_d, rho_d):
        ad = jnp.maximum(alpha_d - res_alpha, 0.0)
        if rv_name == "general" and a1_coef != 0.0:
            mag = jnp.exp(-a_coef * ad) - jnp.exp(-a1_coef * ad)
        else:
            mag = 10.0 ** (-a_coef * jnp.maximum(alpha_d, 0.0))
        return (rhoc / rho_d)[:, None] * v0[None, :] * mag[:, None]

    @jax.jit
    def step(alpha: VolField, U: VolField, p_rgh: VolField,
             phi: SurfaceField, dt):
        U = U.store_old()
        alpha = alpha.store_old()
        rho_d0, _ = mixture_rho(alpha)

        # relative (drift) velocity and its flux
        udm_d = udm(alpha.data, rho_d0)
        udm_f = fvc.face_values(
            mesh, fvc._extrapolated(mesh, udm_d, U.dims, "Udm"))
        # no dispersed-phase slip flux through boundaries (walls
        # accumulate; open boundaries carry it with the mixture flux)
        phir = SurfaceField(
            ((udm_f * mesh.Sf).sum(-1)).at[mesh.n_internal:].set(0.0),
            phi.dims, "phir")

        # ---- alphaEqn.H: implicit upwind with mixture + drift fluxes
        a_eqn = (fvm.ddt(mesh, alpha, dt)
                 + fvm.div(mesh, phi, alpha, "upwind")
                 + fvm.div(mesh, phir, alpha, "upwind"))
        alpha, a_perf = solve(mesh, a_eqn, alpha_controls,
                              env={"phi": phi})
        alpha = alpha.replace(data=jnp.clip(alpha.data, 0.0, 1.0),
                              bvalues=jnp.clip(alpha.bvalues, 0.0, 1.0))

        rho_d, rho_b = mixture_rho(alpha)
        rho = alpha.with_calculated_bcs(rho_d, rho_b, dim_density, "rho")
        rho_old_d, _ = mixture_rho(alpha.old)
        rho = rho.replace(old=alpha.old.with_calculated_bcs(
            rho_old_d, rho_b, dim_density, "rho").replace(old=None))
        a_f = fvc.face_values(mesh, alpha, "vanLeer", phi)
        rho_phi = SurfaceField(phi.data * (a_f * (rhod - rhoc) + rhoc),
                               phi.dims * dim_density, "rhoPhi")

        # mixture (plastic) viscosity
        mu_d = jnp.minimum(
            rhoc * nuc + pv_coeff * (10.0 ** (pv_exp * alpha.data) - 1.0),
            mu_max)
        mu_b = jnp.minimum(
            rhoc * nuc
            + pv_coeff * (10.0 ** (pv_exp * alpha.bvalues) - 1.0),
            mu_max)
        mu = alpha.with_calculated_bcs(mu_d, mu_b,
                                       DimensionSet.of(1, -1, -1), "mu")

        # diffusion stress tauDm = betad Udm^2 + betac Ucm^2
        udm_d = udm(alpha.data, rho_d)
        betad = alpha.data * rhod
        betac = jnp.maximum((1.0 - alpha.data) * rhoc, 1e-10)
        ucm = (betad / betac)[:, None] * udm_d
        tau = betad[:, None, None] * udm_d[:, :, None] * udm_d[:, None, :] \
            + betac[:, None, None] * ucm[:, :, None] * ucm[:, None, :]
        tau_f = fvc._extrapolated(
            mesh, tau, dim_density * U.dims * U.dims, "tauDm")
        div_tau = fvc.div_tensor(mesh, tau_f)

        # ---- UEqn.H
        mu_f = Dimensioned("muf", DimensionSet.of(1, -1, -1),
                           fvc.face_values(mesh, mu))
        UEqn = (fvm.ddt(mesh, U, dt, "Euler", coeff=rho)
                + fvm.div(mesh, rho_phi, U, div_u)
                - fvm.laplacian(mesh, mu_f, U, lap_corr))
        sng_rho = fvc.sn_grad(mesh, rho)
        sng_prgh = fvc.sn_grad(mesh, p_rgh)
        ff = (-ghf * sng_rho.data - sng_prgh.data) * mesh.mag_sf
        rhs_u = fvc.reconstruct(mesh, SurfaceField(
            ff, p_rgh.dims / DimensionSet.of(0, 1)
            * DimensionSet.of(0, 2), "ff"))
        rhs_u = rhs_u.replace(data=rhs_u.data - div_tau.data)
        U, u_perf = solve(mesh, UEqn == rhs_u, u_controls)

        # ---- pEqn.H
        p_perf_all = []
        for corr in range(n_corr):
            UEqn_c = UEqn.replace(psi=U)
            rAU = 1.0 / UEqn_c.A(mesh)
            rAU_f = fvc.face_values(mesh, rAU)
            HbyA = fvc.constrain_hbya(mesh, rAU * UEqn_c.H(mesh), U)
            phig = (-ghf * fvc.sn_grad(mesh, rho).data * rAU_f
                    * mesh.mag_sf).at[mesh.n_internal:].set(0.0)
            phi_hbya = SurfaceField(
                fvc.flux(mesh, HbyA).data + phig, phi.dims, "phiHbyA")
            for north in range(n_non_orth + 1):
                final = corr == n_corr - 1 and north == n_non_orth
                pEqn = fvm.laplacian(mesh, rAU, p_rgh, lap_corr) \
                    == fvc.div(mesh, phi_hbya)
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
            U = U.replace(data=U_star.data) \
                .correct_boundary_conditions(mesh)

        co = courant_number(mesh, phi, dt)
        stats = dict(a_perf=a_perf, u_perf=u_perf,
                     p_perf=tuple(p_perf_all), co=co,
                     alpha=(alpha.data.min(), alpha.data.max(),
                            gsum(alpha.data * mesh.V)))
        return alpha, U, p_rgh, phi, stats

    timer = ExecutionTimer()
    info("\nStarting time loop\n")
    n = 0
    while case.time.loop():
        info(f"Time = {case.time.name}\n")
        alpha, U, p_rgh, phi, stats = step(alpha, U, p_rgh, phi,
                                           case.time.delta_t)
        log_courant(*stats["co"])
        a_min, a_max, a_int = stats["alpha"]
        info(f"Dispersed phase volume fraction = "
             f"{float(a_int) / float(mesh.V.sum()):.8g}  "
             f"Min = {float(a_min):.6g}  Max = {float(a_max):.6g}")
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
