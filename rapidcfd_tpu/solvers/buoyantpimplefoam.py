"""buoyantPimpleFoam — transient compressible natural convection (p_rgh).

Capability parity with the reference solver (reference:
applications/solvers/heatTransfer/buoyantPimpleFoam with UEqn.H/EEqn.H/
pEqn.H): full-density buoyancy -ghf*snGrad(rho) in the p_rgh
formulation, sensible-enthalpy energy with dpdt and kinetic terms,
psi-compressible pressure correction fvc::ddt(rho) +
psi*correction(fvm::ddt(p_rgh)) + div(phiHbyA) - laplacian(rho rAU,
p_rgh). Laminar transport.
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
from .controls import PimpleControl


def run(case_dir: str, write: bool = True, max_steps: int | None = None):
    case = Case(case_dir)
    mesh = case.mesh
    m = read_thermo(case.constant_dict("thermophysicalProperties"))
    thermo = PsiThermo(case, m)
    info(f"Perfect gas: R={m.r:.6g} Cp={m.cp:.6g} gamma={m.gamma:.4g}\n")

    gpath = os.path.join(case.dir, "constant", "g")
    g = [float(x) for x in parse_file(gpath).lookup("value")] \
        if os.path.isfile(gpath) else [0.0, -9.81, 0.0]
    gh = (mesh.C * jnp.asarray(g, mesh.C.dtype)).sum(-1)
    ghf = (mesh.Cf * jnp.asarray(g, mesh.C.dtype)).sum(-1)
    ghb = ghf[mesh.n_internal:]

    p_rgh = case.read_field("p_rgh")
    from ..fields.bcs import set_fixed_flux_pressure_gradient
    import jax.numpy as _jnp
    p_rgh = set_fixed_flux_pressure_gradient(
        mesh, p_rgh, _jnp.zeros(mesh.n_boundary, mesh.V.dtype))
    T = case.read_field("T")
    U = case.read_field("U")
    p = case.read_field("p")

    ctrl = PimpleControl(case)
    div_u = case.div_scheme("div(phi,U)")
    try:
        div_h = case.div_scheme("div(phi,h)")
    except KeyError:
        div_h = div_u
    try:
        div_k = case.div_scheme("div(phi,K)")
    except KeyError:
        div_k = div_h
    lap_corr = case.laplacian_scheme()
    ddt_scheme = case.ddt_scheme()
    u_controls = case.solver_controls("U")
    p_controls = case.solver_controls("p_rgh")
    p_final = case.solver_controls("p_rgh", final=True)
    h_controls = case.solver_controls("h")
    n_outer, n_corr = ctrl.n_outer, ctrl.n_correctors
    n_non_orth = ctrl.n_non_orth

    from ..models.radiation import make_radiation_model
    rad = make_radiation_model(case)
    G0 = rad.read_g() if rad else None

    @jax.jit
    def step(U: VolField, p_rgh: VolField, T: VolField, p: VolField,
             rho: VolField, phi: SurfaceField, dt, G=None):
        U = U.store_old()
        T = T.store_old()
        p = p.store_old()
        rho = rho.store_old()

        # rhoEqn.H
        rho = rho.replace(
            data=rho.old.data - dt * fvc.div(mesh, phi).data) \
            .correct_boundary_conditions(mesh)

        u_perf = h_perf = None
        p_perf_all = []
        for outer in range(n_outer):
            mu_f = Dimensioned("mu", DimensionSet.of(1, -1, -1),
                               m.mu(fvc.face_values(mesh, T)))
            # ---- UEqn.H (buoyancy via face forces, reconstructed)
            UEqn = (fvm.ddt(mesh, U, dt, ddt_scheme, coeff=rho)
                    + fvm.div(mesh, phi, U, div_u)
                    - fvm.laplacian(mesh, mu_f, U, lap_corr))
            sng_rho = fvc.sn_grad(mesh, rho)
            sng_prgh = fvc.sn_grad(mesh, p_rgh)
            ff = (-ghf * sng_rho.data - sng_prgh.data) * mesh.mag_sf
            rhs_u = fvc.reconstruct(mesh, SurfaceField(
                ff, p_rgh.dims / DimensionSet.of(0, 1)
                * DimensionSet.of(0, 2), "ff"))
            U, u_perf = solve(mesh, UEqn == rhs_u, u_controls)

            # ---- EEqn.H (sensible enthalpy + K + dpdt + rho*(U&g))
            h = thermo.he_field(mesh, T, "h").replace(old=None)
            h = h.replace(old=thermo.he_field(mesh, T.old, "h")
                          .replace(old=None))
            alpha_f = Dimensioned("alpha", DimensionSet.of(1, -1, -1),
                                  m.alpha_h(fvc.face_values(mesh, T)))
            K = h.with_calculated_bcs(
                0.5 * (U.data * U.data).sum(-1),
                0.5 * (U.bvalues * U.bvalues).sum(-1), h.dims, "K")
            K_old = 0.5 * (U.old.data * U.old.data).sum(-1)
            ddt_rhoK = (rho.data * K.data - rho.old.data * K_old) / dt
            dpdt = (p.data - p.old.data) / dt
            rhs = h.with_calculated_bcs(
                dpdt - ddt_rhoK - fvc.div(mesh, phi, K, div_k).data,
                jnp.zeros_like(h.bvalues),
                h.dims * dim_density / DimensionSet.of(0, 0, 1))
            hEqn = (fvm.ddt(mesh, h, dt, ddt_scheme, coeff=rho)
                    + fvm.div(mesh, phi, h, div_h)
                    - fvm.laplacian(mesh, alpha_f, h, lap_corr))
            hEqn = hEqn.equals(rhs)
            g_perf = None
            if rad is not None:
                G, g_perf = rad.correct(mesh, G, T)
                cpv = m.cp_t(T.data) if hasattr(m, "cp_t") \
                    else jnp.full_like(T.data, m.cp)
                sp, expl = rad.sh(mesh, G, T, cpv, h.data)
                hEqn = hEqn.replace(diag=hEqn.diag + mesh.V * sp,
                                    source=hEqn.source + mesh.V * expl)
            h, h_perf = solve(mesh, hEqn, h_controls)
            T = thermo.update_t(mesh, T, h)

            # ---- pEqn.H
            for corr in range(n_corr):
                rho = rho.replace(data=m.rho(p.data, T.data),
                                  bvalues=m.rho(p.bvalues, T.bvalues))
                psi = T.with_calculated_bcs(
                    m.psi(T.data), m.psi(T.bvalues),
                    DimensionSet.of(0, -2, 2), "psi")
                psi = psi.replace(old=psi.replace(old=None))
                UEqn_c = UEqn.replace(psi=U)
                rAU = 1.0 / UEqn_c.A(mesh)
                rho_rau = rho * rAU
                rho_rau_f = fvc.face_values(mesh, rho_rau)
                HbyA = fvc.constrain_hbya(mesh, rAU * UEqn_c.H(mesh), U)
                rho_f = fvc.face_values(mesh, rho)
                from ..fields.bcs import (
                    fixed_flux_pressure_mask,
                    set_fixed_flux_pressure_gradient)
                ffp_mask = fixed_flux_pressure_mask(mesh, p_rgh)
                phig = (-rho_rau_f * ghf * fvc.sn_grad(mesh, rho).data
                        * mesh.mag_sf)
                # kept on fixedFluxPressure patches (their snGrad
                # balances it), zeroed on legacy zeroGradient patches
                phig = phig.at[mesh.n_internal:].multiply(ffp_mask)
                phi_hbya = SurfaceField(
                    rho_f * fvc.flux(mesh, HbyA).data + phig,
                    DimensionSet.of(1, 0, -1), "phiHbyA")
                # setSnGrad<fixedFluxPressure> (reference:
                # buoyantPimpleFoam pEqn.H)
                n_int = mesh.n_internal
                sngrad_b = (phi_hbya.data[n_int:]
                            - rho.bvalues
                            * (mesh.Sf[n_int:] * U.bvalues).sum(-1)) \
                    / (jnp.maximum(mesh.mag_sf[n_int:], 1e-30)
                       * jnp.maximum(rho_rau_f[n_int:], 1e-30))
                p_rgh = set_fixed_flux_pressure_gradient(mesh, p_rgh,
                                                         sngrad_b)
                # psi*correction(ddt(p_rgh)): pin the old level to the
                # current p_rgh so the pair collapses to psi/dt (p - p*)
                p2 = p_rgh.replace(old=p_rgh.replace(old=None))
                ddt_rho = (rho.data - rho.old.data) / dt
                for north in range(n_non_orth + 1):
                    final = (outer == n_outer - 1 and corr == n_corr - 1
                             and north == n_non_orth)
                    pEqn = fvm.ddt(mesh, p2, dt, ddt_scheme, coeff=psi) \
                        - fvm.laplacian(mesh, rho_rau, p_rgh, lap_corr)
                    rhs_p = p_rgh.with_calculated_bcs(
                        -ddt_rho - fvc.div(mesh, phi_hbya).data,
                        jnp.zeros_like(p_rgh.bvalues),
                        dim_density / DimensionSet.of(0, 0, 1))
                    pEqn = pEqn.equals(rhs_p)
                    p_rgh, p_perf = solve(
                        mesh, pEqn, p_final if final else p_controls)
                    p_perf_all.append(p_perf[0])
                # pEqn embeds -laplacian, so flux() is the NEGATED
                # pressure flux: add it (reference: buoyantPimpleFoam
                # pEqn.H:62-69 phi = phiHbyA + p_rghEqn.flux())
                flux_p = pEqn.replace(psi=p_rgh).flux(mesh)
                phi = phi_hbya + flux_p
                corr_f = SurfaceField(
                    (phig + flux_p.data)
                    / jnp.maximum(rho_rau_f, 1e-30),
                    phi.dims / (rho.dims * rAU.dims), "corrF")
                U_star = HbyA + rAU * fvc.reconstruct(mesh, corr_f)
                U = U.replace(data=U_star.data) \
                    .correct_boundary_conditions(mesh)
                p = p.replace(data=p_rgh.data + rho.data * gh,
                              bvalues=p_rgh.bvalues + rho.bvalues * ghb)
                rho = rho.replace(data=m.rho(p.data, T.data),
                                  bvalues=m.rho(p.bvalues, T.bvalues))

        cont = (rho.data - rho.old.data) / dt + fvc.div(mesh, phi).data
        local_err = gsum(jnp.abs(cont) * mesh.V)
        glob_err = gsum(cont * mesh.V)
        stats = dict(u_perf=u_perf, h_perf=h_perf,
                     p_perf=tuple(p_perf_all),
                     cont=(local_err, glob_err),
                     rho_minmax=(rho.data.min(), rho.data.max()),
                     **({"G": G, "g_perf": g_perf}
                        if rad is not None else {}))
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
    while case.time.loop():
        info(f"Time = {case.time.name}\n")
        U, p_rgh, T, p, rho, phi, stats = step(U, p_rgh, T, p, rho,
                                               phi, case.time.delta_t,
                                               G0)
        if rad is not None:
            G0 = stats.pop("G")
        for cmpt, perf in zip("xyz", stats["u_perf"]):
            log_solve(u_controls.solver, f"U{cmpt}", perf[0], perf[1],
                      perf[2])
        log_solve(h_controls.solver, "h", stats["h_perf"][0][0],
                  stats["h_perf"][0][1], stats["h_perf"][0][2])
        for perf in stats["p_perf"]:
            log_solve(p_controls.solver, "p_rgh", perf[0], perf[1],
                      perf[2])
        rmn, rmx = stats["rho_minmax"]
        info(f"rho max/min : {float(rmx):.6g} {float(rmn):.6g}")
        local_err, glob_err = stats["cont"]
        cumulative_err += float(glob_err)
        log_continuity(cumulative_err, local_err, glob_err)
        timer.log()
        if write and case.time.write_time():
            case.write_fields([U, p_rgh, T, p.replace(name="p"),
                               rho.replace(name="rho")])
        n += 1
        if max_steps and n >= max_steps:
            break
    info("End\n")
    return case, U, p_rgh, T, p, rho, phi
