"""buoyantSimpleFoam — steady compressible natural convection (p_rgh).

Capability parity with the reference solver (reference:
applications/solvers/heatTransfer/buoyantSimpleFoam with UEqn.H/EEqn.H/
pEqn.H): full-density buoyancy -ghf*snGrad(rho) in the p_rgh
formulation, enthalpy energy equation, rho-weighted pressure correction
with the closed-volume mass-conservation pressure-level adjustment.
Laminar transport (turbulent alphaEff deferred to the turbulence hooks).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from ..fields.field import Dimensioned, SurfaceField, VolField
from ..linalg import solve
from ..linalg.solvers import gsum
from ..models.thermo import PsiThermo, read_thermo
from ..ops import fvc, fvm
from ..utils.dictionary import parse_file
from ..utils.dimensions import DimensionSet, dim_density
from ..utils.logging import (ExecutionTimer, info, log_continuity,
                             log_solve)
from .case import Case
from .controls import SimpleControl
from .simplefoam import relax_field


def run(case_dir: str, write: bool = True, max_steps: int | None = None):
    case = Case(case_dir)
    mesh = case.mesh
    thermo_model = read_thermo(case.constant_dict(
        "thermophysicalProperties"))
    thermo = PsiThermo(case, thermo_model)
    m = thermo_model

    gpath = os.path.join(case.dir, "constant", "g")
    g = [float(x) for x in parse_file(gpath).lookup("value")] \
        if os.path.isfile(gpath) else [0.0, -9.81, 0.0]
    gh = (mesh.C * jnp.asarray(g, mesh.C.dtype)).sum(-1)
    ghf = (mesh.Cf * jnp.asarray(g, mesh.C.dtype)).sum(-1)

    p_rgh = case.read_field("p_rgh")
    T = case.read_field("T")
    U = case.read_field("U")
    p = case.read_field("p")

    from ..models.radiation import make_radiation_model
    rad = make_radiation_model(case)
    G0 = rad.read_g() if rad else None

    simple = SimpleControl(case)
    div_u = case.div_scheme("div(phi,U)")
    try:
        div_h = case.div_scheme("div(phi,h)")
    except KeyError:
        div_h = div_u
    lap_corr = case.laplacian_scheme()
    u_controls = case.solver_controls("U")
    p_controls = case.solver_controls("p_rgh")
    h_controls = case.solver_controls("h")
    u_relax = case.relaxation_factor("U", "equations", 0.3)
    h_relax = case.relaxation_factor("h", "equations", 0.7)
    p_relax = case.relaxation_factor("p_rgh", "fields", 0.7)
    rho_relax = case.relaxation_factor("rho", "fields", 1.0)
    n_non_orth = simple.n_non_orth
    p_ref_cell, p_ref_value = simple.p_ref_cell, simple.p_ref_value
    closed = not any(
        getattr(bc, "fixes_level", False) for bc in p_rgh.bcs)

    # initial mass for the closed-volume pressure-level adjustment
    initial_mass = float(jnp.sum(m.rho(p.data, T.data) * mesh.V))

    # TRUE fixedFluxPressure (reference: buoyantSimpleFoam pEqn.H
    # setSnGrad<fixedFluxPressure...>): the body-force boundary flux is
    # kept on patches whose BC balances it; legacy zeroGradient patches
    # keep the zeroed-phig stand-in. Seed the snGrad slot host-side so
    # the jitted step's pytree structure is stable from the first call.
    from ..fields.bcs import (fixed_flux_pressure_mask,
                              set_fixed_flux_pressure_gradient)
    ffp_mask = fixed_flux_pressure_mask(mesh, p_rgh)
    p_rgh = set_fixed_flux_pressure_gradient(
        mesh, p_rgh, jnp.zeros(mesh.n_boundary, mesh.V.dtype))
    sf_b = mesh.Sf[mesh.n_internal:]
    msf_b = jnp.maximum(mesh.mag_sf[mesh.n_internal:], 1e-30)

    @jax.jit
    def step(U: VolField, p_rgh: VolField, T: VolField, p: VolField,
             rho: VolField, phi: SurfaceField, G: VolField | None):
        mu_f = Dimensioned("mu", DimensionSet.of(1, -1, -1),
                           m.mu(fvc.face_values(mesh, T)))
        # ---- UEqn.H
        UEqn = fvm.div(mesh, phi, U, div_u) \
            - fvm.laplacian(mesh, mu_f, U, lap_corr)
        UEqn = UEqn.relax(mesh, u_relax)
        sng_rho = fvc.sn_grad(mesh, rho)
        sng_prgh = fvc.sn_grad(mesh, p_rgh)
        face_force = (-ghf * sng_rho.data - sng_prgh.data) * mesh.mag_sf
        rhs = fvc.reconstruct(mesh, SurfaceField(
            face_force,
            p_rgh.dims / DimensionSet.of(0, 1) * DimensionSet.of(0, 2),
            "ff"))
        U, u_perf = solve(mesh, UEqn.equals(rhs), u_controls)

        # ---- EEqn.H (sensible enthalpy)
        h = thermo.he_field(mesh, T, "h")
        alpha_f = Dimensioned("alpha", DimensionSet.of(1, -1, -1),
                              m.alpha_h(fvc.face_values(mesh, T)))
        K = h.with_calculated_bcs(0.5 * (U.data * U.data).sum(-1),
                                  0.5 * (U.bvalues * U.bvalues).sum(-1),
                                  h.dims, "K")
        hEqn = (fvm.div(mesh, phi, h, div_h)
                - fvm.laplacian(mesh, alpha_f, h, lap_corr))
        hEqn = hEqn.equals(-fvc.div(mesh, phi, K, div_h))
        g_perf = None
        if rad is not None:
            # EEqn.H: radiation->correct(); == radiation->Sh(thermo)
            G, g_perf = rad.correct(mesh, G, T)
            cpv = m.cp_t(T.data) if hasattr(m, "cp_t") \
                else jnp.full_like(T.data, m.cp)
            sp, expl = rad.sh(mesh, G, T, cpv, h.data)
            hEqn = hEqn.replace(diag=hEqn.diag + mesh.V * sp,
                                source=hEqn.source + mesh.V * expl)
        hEqn = hEqn.relax(mesh, h_relax)
        h, h_perf = solve(mesh, hEqn, h_controls)
        T = thermo.update_t(mesh, T, h)

        # ---- pEqn.H
        rho_eos = rho.replace(data=m.rho(p.data, T.data),
                              bvalues=m.rho(p.bvalues, T.bvalues))
        rho = relax_field(rho_eos, rho, rho_relax)
        UEqn_c = UEqn.replace(psi=U)
        rAU = 1.0 / UEqn_c.A(mesh)
        rho_rau = rho * rAU
        rho_rau_f = fvc.face_values(mesh, rho_rau)
        HbyA = fvc.constrain_hbya(mesh, rAU * UEqn_c.H(mesh), U)
        rho_f = fvc.face_values(mesh, rho)
        phig = -rho_rau_f * ghf * fvc.sn_grad(mesh, rho).data \
            * mesh.mag_sf
        # body-force boundary flux: kept on fixedFluxPressure patches
        # (their snGrad balances it, reference pEqn.H), zeroed on legacy
        # zeroGradient patches (the round-2 stand-in)
        phig = phig.at[mesh.n_internal:].multiply(ffp_mask)
        phi_hbya = SurfaceField(rho_f * fvc.flux(mesh, HbyA).data,
                                DimensionSet.of(1, 0, -1), "phiHbyA")
        phi_hbya = fvc.adjust_phi(mesh, phi_hbya, U)
        phi_hbya = SurfaceField(phi_hbya.data + phig, phi_hbya.dims,
                                "phiHbyA")

        # setSnGrad<fixedFluxPressure>: gradient = (phiHbyA_b -
        # rho_b*(Sf_b & U_b)) / (magSf_b * rhorAUf_b) (reference:
        # buoyantSimpleFoam pEqn.H)
        sngrad_b = (phi_hbya.data[mesh.n_internal:]
                    - rho.bvalues * (sf_b * U.bvalues).sum(-1)) \
            / (msf_b * jnp.maximum(rho_rau_f[mesh.n_internal:], 1e-30))
        p_rgh = set_fixed_flux_pressure_gradient(mesh, p_rgh, sngrad_b)

        p_prev = p_rgh
        p_perf_all = []
        for north in range(n_non_orth + 1):
            pEqn = fvm.laplacian(mesh, rho_rau, p_rgh, lap_corr) \
                == fvc.div(mesh, phi_hbya)
            pEqn = pEqn.set_reference(p_ref_cell, p_ref_value)
            p_rgh, p_perf = solve(mesh, pEqn, p_controls)
            p_perf_all.append(p_perf[0])
        phi = phi_hbya - pEqn.replace(psi=p_rgh).flux(mesh)

        cont = fvc.div(mesh, phi)
        local_err = gsum(jnp.abs(cont.data) * mesh.V)
        glob_err = gsum(cont.data * mesh.V)

        p_rgh = relax_field(p_rgh, p_prev, p_relax)
        flux_p = pEqn.replace(psi=p_rgh).flux(mesh)
        corr_f = SurfaceField(
            (phig - flux_p.data) / jnp.maximum(rho_rau_f, 1e-30),
            phi.dims / (rho.dims * rAU.dims), "corrF")
        U_star = HbyA + rAU * fvc.reconstruct(mesh, corr_f)
        U = U.replace(data=U_star.data).correct_boundary_conditions(mesh)

        # p = p_rgh + rho*gh (+ closed-volume level adjustment)
        ghb = (mesh.Cf[mesh.n_internal:]
               * jnp.asarray(g, mesh.C.dtype)).sum(-1)
        p = p.replace(data=p_rgh.data + rho.data * gh,
                      bvalues=p_rgh.bvalues + rho.bvalues * ghb)
        if closed:
            psi_d = m.psi(T.data)
            dp = (initial_mass - jnp.sum(psi_d * p.data * mesh.V)) \
                / jnp.sum(psi_d * mesh.V)
            p = p.replace(data=p.data + dp, bvalues=p.bvalues + dp)
            p_rgh = p_rgh.replace(data=p.data - rho.data * gh,
                                  bvalues=p.bvalues - rho.bvalues * ghb)
        rho = rho.replace(data=m.rho(p.data, T.data),
                          bvalues=m.rho(p.bvalues, T.bvalues))

        stats = dict(u_perf=u_perf, h_perf=h_perf,
                     **({"G": G, "g_perf": g_perf}
                        if rad is not None else {}),
                     p_perf=tuple(p_perf_all),
                     cont=(local_err, glob_err),
                     rho_minmax=(rho.data.min(), rho.data.max()))
        return U, p_rgh, T, p, rho, phi, stats

    rho = T.with_calculated_bcs(m.rho(p.data, T.data),
                                m.rho(p.bvalues, T.bvalues),
                                dim_density, "rho")
    rho_f0 = fvc.face_values(mesh, rho)
    phi = SurfaceField(rho_f0 * fvc.flux(mesh, U).data,
                       DimensionSet.of(1, 0, -1), "phi")

    timer = ExecutionTimer()
    cumulative_err = 0.0
    info("\nStarting time loop\n")
    n = 0
    initial_residuals = None
    while simple.loop(initial_residuals):
        info(f"Time = {case.time.name}\n")
        U, p_rgh, T, p, rho, phi, stats = step(U, p_rgh, T, p, rho,
                                               phi, G0)
        if rad is not None:
            G0 = stats.pop("G")
        initial_residuals = {}
        for cmpt, perf in zip("xyz", stats["u_perf"]):
            log_solve(u_controls.solver, f"U{cmpt}", perf[0], perf[1],
                      perf[2])
            initial_residuals[f"U{cmpt}"] = float(perf[0])
        if rad is not None and stats.get("g_perf") is not None:
            gp = stats["g_perf"][0]
            log_solve(rad.g_controls.solver, "G", gp[0], gp[1], gp[2])
        log_solve(h_controls.solver, "h", stats["h_perf"][0][0],
                  stats["h_perf"][0][1], stats["h_perf"][0][2])
        initial_residuals["h"] = float(stats["h_perf"][0][0])
        for perf in stats["p_perf"]:
            log_solve(p_controls.solver, "p_rgh", perf[0], perf[1],
                      perf[2])
        initial_residuals["p_rgh"] = float(stats["p_perf"][0][0])
        rmn, rmx = stats["rho_minmax"]
        info(f"rho max/min : {float(rmx):.6g} {float(rmn):.6g}")
        local_err, glob_err = stats["cont"]
        cumulative_err += float(glob_err)
        log_continuity(cumulative_err, local_err, glob_err)
        timer.log()
        if write and case.time.write_time():
            case.write_fields([U, p_rgh, T, p.replace(name="p"),
                               rho.replace(name="rho")]
                              + ([G0] if rad is not None else []))
        n += 1
        if max_steps and n >= max_steps:
            break
    info("End\n")
    return case, U, p_rgh, T, p, rho, phi
