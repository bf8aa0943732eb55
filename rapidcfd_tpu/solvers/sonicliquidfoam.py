"""sonicLiquidFoam — trans-sonic barotropic liquid PISO solver.

Capability parity with the reference solver (reference:
applications/solvers/compressible/sonicFoam/sonicLiquidFoam/
sonicLiquidFoam.C:36-120 with readThermodynamicProperties.H): isothermal
liquid with the linear equation of state rho = rhoO + psi*p
(rhoO = rho0 - psi*p0), momentum with constant mu, and the transonic
pressure equation ddt(psi,p) + div(phi) + div(phid,p) -
laplacian(rho*rAU, p).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..fields.field import Dimensioned, SurfaceField, VolField
from ..linalg import solve
from ..linalg.solvers import gsum
from ..ops import fvc, fvm
from ..utils.dimensions import DimensionSet, dim_density
from ..utils.logging import (ExecutionTimer, info, log_continuity,
                             log_courant, log_solve)
from .case import Case
from .controls import PisoControl
from .icofoam import courant_number


def run(case_dir: str, write: bool = True, max_steps: int | None = None):
    case = Case(case_dir)
    mesh = case.mesh

    td = case.constant_dict("thermodynamicProperties")
    rho0 = Dimensioned.from_entry(td.lookup("rho0", required=True)).value
    p0 = Dimensioned.from_entry(td.lookup("p0", required=True)).value
    psi_v = Dimensioned.from_entry(td.lookup("psi", required=True)).value
    rho_o = rho0 - psi_v * p0
    tp = case.transport_properties()
    mu = Dimensioned.from_entry(tp.lookup("mu", required=True), "mu")
    info(f"Barotropic liquid: rho0={rho0} p0={p0} psi={psi_v}\n")

    p = case.read_field("p")
    U = case.read_field("U")
    rho = p.with_calculated_bcs(rho_o + psi_v * p.data,
                                rho_o + psi_v * p.bvalues,
                                dim_density, "rho")
    rho_f = fvc.face_values(mesh, rho)
    phi = SurfaceField(rho_f * fvc.flux(mesh, U).data,
                       DimensionSet.of(1, 0, -1), "phi")

    ctrl = PisoControl(case)
    div_u = case.div_scheme("div(phi,U)")
    try:
        div_phid_p = case.div_scheme("div(phid,p)")
    except KeyError:
        div_phid_p = "upwind"
    lap_corr = case.laplacian_scheme()
    ddt_scheme = case.ddt_scheme()
    u_controls = case.solver_controls("U")
    p_controls = case.solver_controls("p")
    p_final = case.solver_controls("p", final=True)
    n_corr = ctrl.n_correctors
    n_non_orth = ctrl.n_non_orth
    psi_dims = DimensionSet.of(0, -2, 2)

    @jax.jit
    def step(U: VolField, p: VolField, rho: VolField,
             phi: SurfaceField, dt):
        U = U.store_old()
        p = p.store_old()
        rho = rho.store_old()

        # rhoEqn: solve(ddt(rho) + div(phi)) — explicit Euler
        rho = rho.replace(
            data=rho.old.data - dt * fvc.div(mesh, phi).data) \
            .correct_boundary_conditions(mesh)

        # UEqn
        UEqn = (fvm.ddt(mesh, U, dt, ddt_scheme, coeff=rho)
                + fvm.div(mesh, phi, U, div_u)
                - fvm.laplacian(mesh, mu, U, lap_corr))
        U, u_perf = solve(mesh, UEqn == (-fvc.grad(mesh, p)),
                          u_controls)

        psi_f = p.with_calculated_bcs(
            jnp.full_like(p.data, psi_v),
            jnp.full_like(p.bvalues, psi_v), psi_dims, "psi")
        psi_f = psi_f.replace(old=psi_f.replace(old=None))

        p_perf_all = []
        for corr in range(n_corr):
            UEqn_c = UEqn.replace(psi=U)
            rAU = 1.0 / UEqn_c.A(mesh)
            rho_rau_f = fvc.face_values(mesh, rho * rAU)
            HbyA = fvc.constrain_hbya(mesh, rAU * UEqn_c.H(mesh), U)
            vol_flux = fvc.flux(mesh, HbyA).data
            phid = SurfaceField(psi_v * vol_flux,
                                psi_dims * DimensionSet.of(0, 3, -1),
                                "phid")
            phi_part = SurfaceField((rho_o / psi_v) * phid.data,
                                    DimensionSet.of(1, 0, -1), "phi")
            rho_rau = Dimensioned("rhorAUf",
                                  rho.dims * rAU.dims, rho_rau_f)
            for north in range(n_non_orth + 1):
                final = corr == n_corr - 1 and north == n_non_orth
                pEqn = (fvm.ddt(mesh, p, dt, ddt_scheme, coeff=psi_f)
                        + fvm.div(mesh, phid, p, div_phid_p)
                        - fvm.laplacian(mesh, rho_rau, p, lap_corr))
                pEqn = pEqn.equals(-fvc.div(mesh, phi_part))
                p, p_perf = solve(mesh, pEqn,
                                  p_final if final else p_controls)
                p_perf_all.append(p_perf[0])
            phi = phi_part + pEqn.replace(psi=p).flux(mesh)
            rho = rho.replace(
                data=rho.old.data - dt * fvc.div(mesh, phi).data) \
                .correct_boundary_conditions(mesh)
            U_new = U.replace(data=(
                U.data - (rAU * fvc.grad(mesh, p)).data))
            U = U_new.correct_boundary_conditions(mesh)

        # EoS closure
        rho = rho.replace(data=rho_o + psi_v * p.data,
                          bvalues=rho_o + psi_v * p.bvalues)
        cont = (rho.data - rho.old.data) / dt + fvc.div(mesh, phi).data
        local_err = gsum(jnp.abs(cont) * mesh.V)
        glob_err = gsum(cont * mesh.V)
        co = courant_number(mesh, phi / fvc.interpolate(mesh, rho), dt)
        stats = dict(u_perf=u_perf, p_perf=tuple(p_perf_all),
                     cont=(local_err, glob_err), co=co)
        return U, p, rho, phi, stats

    timer = ExecutionTimer()
    cumulative_err = 0.0
    info("\nStarting time loop\n")
    n = 0
    while case.time.loop():
        info(f"Time = {case.time.name}\n")
        U, p, rho, phi, stats = step(U, p, rho, phi,
                                     case.time.delta_t)
        log_courant(*stats["co"])
        for cmpt, perf in zip("xyz", stats["u_perf"]):
            log_solve(u_controls.solver, f"U{cmpt}", perf[0], perf[1],
                      perf[2])
        for perf in stats["p_perf"]:
            log_solve(p_controls.solver, "p", perf[0], perf[1], perf[2])
        local_err, glob_err = stats["cont"]
        cumulative_err += float(glob_err)
        log_continuity(cumulative_err, local_err, glob_err)
        timer.log()
        if write and case.time.write_time():
            case.write_fields([U, p, rho.replace(name="rho")])
        n += 1
        if max_steps and n >= max_steps:
            break
    info("End\n")
    return case, U, p, rho, phi


def main(argv=None):
    import argparse
    ap = argparse.ArgumentParser(
        description="sonicLiquidFoam (rapidcfd_tpu)")
    ap.add_argument("-case", dest="case", default=".")
    ap.add_argument("-noWrite", action="store_true")
    args = ap.parse_args(argv)
    run(args.case, write=not args.noWrite)


if __name__ == "__main__":
    main()
