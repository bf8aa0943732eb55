"""cavitatingFoam — transient barotropic cavitation (HEM).

Capability parity with the reference solver (reference:
applications/solvers/multiphase/cavitatingFoam/cavitatingFoam.C with
rhoEqn.H/alphavPsi.H/UEqn.H/pEqn.H): implicit density transport, vapour
fraction from the barotropic relation alphav = (rho - rholSat)/
(rhovSat - rholSat), the linear compressibility model
psi = alphav*psiv + alphal*psil, and the compressible pressure equation
ddt(psi,p) - (rhol0+(psil-psiv)pSat) ddt(alphav) - pSat ddt(psi)
+ div(phi,rho) + div(phiGradp) - laplacian(rho rAU, p).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..fields.field import Dimensioned, SurfaceField, VolField
from ..linalg import solve
from ..linalg.solvers import gsum
from ..ops import fvc, fvm
from ..utils.dimensions import DimensionSet, dim_density
from ..utils.logging import (ExecutionTimer, info, log_courant, log_solve)
from .case import Case
from .controls import PimpleControl
from .icofoam import courant_number
from .interfoam import _read_constants

_PSI = DimensionSet.of(0, -2, 2)


def run(case_dir: str, write: bool = True, max_steps: int | None = None,
        dym: bool = False):
    """dym=True gives cavitatingDyMFoam (reference: multiphase/
    cavitatingFoam/cavitatingDyMFoam/cavitatingDyMFoam.C):
    mesh.update() each step, PIMPLE on the relative volumetric flux."""
    case = Case(case_dir)
    mesh = case.mesh
    dyn = None
    if dym:
        from ..models.dynamicmesh import make_dynamic_mesh
        dyn = make_dynamic_mesh(case)
    td = case.constant_dict("thermodynamicProperties")
    psil = Dimensioned.from_entry(td.lookup("psil", required=True)).value
    rhol_sat = Dimensioned.from_entry(
        td.lookup("rholSat", required=True)).value
    psiv = Dimensioned.from_entry(td.lookup("psiv", required=True)).value
    p_sat = Dimensioned.from_entry(td.lookup("pSat", required=True)).value
    rhov_sat = psiv * p_sat
    rhol0 = rhol_sat - p_sat * psil
    rho_min = Dimensioned.from_entry(
        td.lookup("rhoMin", required=True)).value
    # mixture viscosity from transportProperties (two phases)
    rho1, rho2, nu1, nu2, _, _ = _read_constants(case)
    mul, muv = rho1 * nu1, rho2 * nu2
    info(f"Barotropic cavitation: pSat={p_sat} rholSat={rhol_sat} "
         f"psil={psil} psiv={psiv}\n")

    p = case.read_field("p")
    U = case.read_field("U")
    if case.field_exists("rho"):
        rho = case.read_field("rho")
    else:
        # rho is SOLVED (implicit rhoEqn) so it needs assemblable BCs:
        # zeroGradient on every non-empty patch
        from ..fields.bcs import make_bc
        from ..fields.field import VolField as _VF
        bcs = tuple(
            make_bc("empty" if pt.is_empty else "zeroGradient", i)
            for i, pt in enumerate(mesh.patches))
        rho = _VF(rhol0 + psil * p.data, rhol0 + psil * p.bvalues,
                  bcs, dim_density, "rho",
                  tuple({} for _ in mesh.patches))
    phi = jax.jit(lambda u: fvc.flux(mesh, u))(U)

    ctrl = PimpleControl(case)
    rho_controls = case.solver_controls("rho")
    p_controls = case.solver_controls("p")
    p_final = case.solver_controls("p", final=True)
    u_controls = case.solver_controls("U")
    div_rho = case.div_scheme("div(phi,rho)")
    div_u = case.div_scheme("div(rhoPhi,U)")
    lap_corr = case.laplacian_scheme()
    n_outer, n_corr = ctrl.n_outer, ctrl.n_correctors
    n_non_orth = ctrl.n_non_orth

    def alphav_psi(rho_d):
        av = jnp.clip((rho_d - rhol_sat) / (rhov_sat - rhol_sat),
                      0.0, 1.0)
        return av, av * psiv + (1.0 - av) * psil

    @jax.jit
    def _step(mesh, p: VolField, U: VolField, rho: VolField,
              phi: SurfaceField, dt, mesh_phi, mesh_ub):
        U = U.store_old()
        p = p.store_old()
        rho = rho.store_old()
        av0, psi0 = alphav_psi(rho.old.data)

        u_perf = p_perf_all = None
        p_perf_all = []
        for outer in range(n_outer):
            # ---- rhoEqn.H (implicit)
            rho, rho_perf = solve(
                mesh,
                fvm.ddt(mesh, rho, dt)
                + fvm.div(mesh, phi, rho, div_rho),
                rho_controls, env={"phi": phi})
            rho = rho.replace(data=jnp.maximum(rho.data, rho_min),
                              bvalues=jnp.maximum(rho.bvalues, rho_min))
            rho_phi = SurfaceField(
                phi.data * fvc.face_values(mesh, rho, "upwind", phi),
                phi.dims * dim_density, "rhoPhi")

            # ---- alphavPsi.H
            av, psi_d = alphav_psi(rho.data)
            av_b, psi_b = alphav_psi(rho.bvalues)
            mu = rho.with_calculated_bcs(
                av * muv + (1.0 - av) * mul,
                av_b * muv + (1.0 - av_b) * mul,
                DimensionSet.of(1, -1, -1), "mu")

            # ---- UEqn.H
            mu_f = Dimensioned("muf", DimensionSet.of(1, -1, -1),
                               fvc.face_values(mesh, mu))
            UEqn = (fvm.ddt(mesh, U, dt, "Euler", coeff=rho)
                    + fvm.div(mesh, rho_phi, U, div_u)
                    - fvm.laplacian(mesh, mu_f, U, lap_corr))
            U, u_perf = solve(mesh, UEqn == (-fvc.grad(mesh, p)),
                              u_controls)

            # ---- pEqn.H
            for corr in range(n_corr):
                rho_f = fvc.face_values(mesh, rho)
                UEqn_c = UEqn.replace(psi=U)
                rAU = 1.0 / UEqn_c.A(mesh)
                rho_rau_f = fvc.face_values(mesh, rho * rAU)
                HbyA = fvc.constrain_hbya(mesh, rAU * UEqn_c.H(mesh), U)
                phi_v = fvc.flux(mesh, HbyA)
                if dym:
                    # fvc::makeRelative(phiHbyA, U)
                    phi_v = SurfaceField(phi_v.data - mesh_phi,
                                         phi_v.dims, "phi")
                phi_gradp = rho_rau_f * mesh.mag_sf \
                    * fvc.sn_grad(mesh, p).data
                phi_v = SurfaceField(phi_v.data - phi_gradp / rho_f,
                                     phi_v.dims, "phi")

                psi_f = rho.with_calculated_bcs(psi_d, psi_b, _PSI,
                                                "psi")
                psi_f = psi_f.replace(
                    old=rho.old.with_calculated_bcs(
                        psi0, psi0[jnp.asarray(
                            mesh.owner[mesh.n_internal:])], _PSI,
                        "psi0").replace(old=None))
                ddt_av = (av - av0) / dt
                ddt_psi = (psi_d - psi0) / dt
                for north in range(n_non_orth + 1):
                    final = (outer == n_outer - 1 and corr == n_corr - 1
                             and north == n_non_orth)
                    pEqn = fvm.ddt(mesh, p, dt, "Euler", coeff=psi_f) \
                        - fvm.laplacian(
                            mesh, Dimensioned(
                                "rhorAUf",
                                dim_density * rAU.dims, rho_rau_f),
                            p, lap_corr)
                    rhs = p.with_calculated_bcs(
                        (rhol0 + (psil - psiv) * p_sat) * ddt_av
                        + p_sat * ddt_psi
                        - fvc.div(mesh, phi_v, rho, div_rho).data
                        - fvc.div(mesh, SurfaceField(
                            phi_gradp, phi.dims * dim_density,
                            "phiGradp")).data,
                        jnp.zeros_like(p.bvalues),
                        dim_density / DimensionSet.of(0, 0, 1))
                    pEqn = pEqn.equals(rhs)
                    p, p_perf = solve(mesh, pEqn,
                                      p_final if final else p_controls)
                    p_perf_all.append(p_perf[0])
                # -laplacian inside the matrix: ADD the matrix flux
                # (reference: cavitatingFoam pEqn.H:42)
                flux_p = pEqn.replace(psi=p).flux(mesh)
                phi = SurfaceField(
                    phi_v.data + (phi_gradp + flux_p.data) / rho_f,
                    phi.dims, "phi")

                # thermodynamic closure: rho from p, then p from rho
                rho_d = jnp.maximum(
                    psi_d * p.data + (1.0 - av) * rhol0
                    + ((av * psiv + (1.0 - av) * psil) - psi_d) * p_sat,
                    rho_min)
                av, psi_d = alphav_psi(rho_d)
                av_b, psi_b = alphav_psi(rho.bvalues)
                p_d = (rho_d - (1.0 - av) * rhol0
                       - ((av * psiv + (1.0 - av) * psil) - psi_d)
                       * p_sat) / psi_d
                rho = rho.replace(data=rho_d)
                p = p.replace(data=p_d).correct_boundary_conditions(mesh)
                U_star = HbyA - rAU * fvc.grad(mesh, p)
                env_u = ({"meshUb": mesh_ub,
                          "meshPhiB": mesh_phi[mesh.n_internal:],
                          "phi": phi} if dym else None)
                U = U.replace(data=U_star.data) \
                    .correct_boundary_conditions(mesh, env=env_u)

        co = courant_number(mesh, phi, dt)
        stats = dict(u_perf=u_perf, p_perf=tuple(p_perf_all),
                     co=co, av_max=jnp.clip(
                         (rho.data - rhol_sat)
                         / (rhov_sat - rhol_sat), 0.0, 1.0).max(),
                     rho_minmax=(rho.data.min(), rho.data.max()))
        return p, U, rho, phi, stats

    from ..linalg.precompute import attach_solver_layouts
    mesh0 = jax.device_put(attach_solver_layouts(
        mesh, (p_controls, p_final), case=case))

    def step(mesh_new, p, U, rho, phi, dt, mesh_phi, mesh_ub):
        import dataclasses as _dc
        m2 = _dc.replace(mesh_new, band=mesh0.band, gamg=mesh0.gamg)
        return _step(m2, p, U, rho, phi, dt, mesh_phi, mesh_ub)

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
        p, U, rho, phi, stats = step(mesh, p, U, rho, phi,
                                     case.time.delta_t, mesh_phi,
                                     mesh_ub)
        if dyn is not None:
            phi = SurfaceField(phi.data + mesh_phi, phi.dims, "phi")
        log_courant(*stats["co"])
        rmn, rmx = stats["rho_minmax"]
        info(f"max-min rho: {float(rmx):.6g} {float(rmn):.6g}  "
             f"max alphav: {float(stats['av_max']):.6g}")
        for perf in stats["p_perf"]:
            log_solve(p_controls.solver, "p", perf[0], perf[1], perf[2])
        timer.log()
        if write and case.time.write_time():
            case.write_fields([p, U, rho.replace(name="rho")])
        n += 1
        if max_steps and n >= max_steps:
            break
    info("End\n")
    return case, p, U, rho, phi
