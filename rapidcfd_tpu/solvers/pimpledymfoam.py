"""pimpleDyMFoam — transient incompressible solver on a moving mesh.

Capability parity with the reference solver (reference:
applications/solvers/incompressible/pimpleFoam/pimpleDyMFoam/
pimpleDyMFoam.C: mesh.update() then PIMPLE on the RELATIVE flux
phi - meshPhi, absolute flux restored for output). Also serves
sonicDyMFoam/interDyMFoam-class cases through the same dynamic-mesh
module once their base solvers take the mesh as an argument.

TPU-first: the step is jitted with MeshArrays as an ARGUMENT (static
topology metadata is unchanged by motion, so geometry updates do not
recompile); the host rebuilds geometry and the analytic mesh flux per
step (models/dynamicmesh.py). Solver layouts (band/DIA, GAMG
agglomeration) are derived once from the initial mesh and carried
across motion — topology-static, so GAMG works on moving meshes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..fields.field import SurfaceField, VolField
from ..linalg import solve
from ..models.dynamicmesh import make_dynamic_mesh
from ..models.transport import SinglePhaseTransportModel
from ..models.turbulence import make_ras_model
from ..ops import fvc, fvm
from ..utils.logging import (ExecutionTimer, info, log_continuity,
                             log_courant, log_solve)
from .case import Case
from .controls import PimpleControl
from .icofoam import continuity_errors, courant_number
from .simplefoam import div_dev_reff


def make_step(case: Case, transport, turb, ctrl):
    import dataclasses as _dc

    from ..linalg.precompute import attach_solver_layouts
    div_u = case.div_scheme("div(phi,U)")
    lap_corr = case.laplacian_scheme()
    ddt_scheme = case.ddt_scheme()
    u_controls = case.solver_controls("U")
    u_final = case.solver_controls("U", final=True)
    p_controls = case.solver_controls("p")
    p_final = case.solver_controls("p", final=True)
    n_outer = ctrl.n_outer
    n_corr = ctrl.n_correctors
    n_non_orth = ctrl.n_non_orth
    p_ref_cell, p_ref_value = ctrl.p_ref_cell, ctrl.p_ref_value
    # solver layouts derived ONCE from the initial concrete mesh:
    # solid-body motion preserves topology, so the band/DIA indices and
    # the GAMG agglomeration stay valid across geometry updates — GAMG
    # now works on moving meshes (round-2 limitation removed)
    mesh0 = attach_solver_layouts(case.mesh, (p_controls, p_final),
                                  case=case)

    @jax.jit
    def _step(mesh, U: VolField, p: VolField, phi_rel: SurfaceField,
              mesh_phi, mesh_ub, turb_state, dt):
        """phi_rel: flux relative to the mesh motion (the convecting
        flux of every equation on a moving mesh)."""
        U = U.store_old()
        nu = transport.nu(mesh, U)
        env_w = {"meshUb": mesh_ub,
                 "meshPhiB": mesh_phi[mesh.n_internal:]}
        # bake the moving-wall velocity into bcdata so matrix ASSEMBLY
        # (which has no env channel) sees it too
        from ..fields.bcs import MovingWallVelocity
        bcdata = list(U.bcdata)
        for i, bc in enumerate(U.bcs):
            if isinstance(bc, MovingWallVelocity):
                patch = mesh.patches[i]
                sl = slice(patch.bstart, patch.bstart + patch.size)
                n = mesh.patch_normals(patch)
                v = mesh_ub[sl]
                vn = (mesh_phi[mesh.n_internal:][sl] / jnp.maximum(
                    mesh.patch_mag_sf(patch), 1e-30))[:, None] * n
                bd = dict(bcdata[i])
                bd["meshWallValue"] = \
                    v - n * (v * n).sum(-1, keepdims=True) + vn
                bcdata[i] = bd
        U = U.replace(bcdata=tuple(bcdata))
        U = U.correct_boundary_conditions(mesh, env={**env_w,
                                                     "phi": phi_rel})
        # rebuild the boundary relative flux from the freshly-corrected
        # wall velocities (walls moving with the mesh give exactly 0)
        phi_b = (U.bvalues * mesh.Sf[mesh.n_internal:]).sum(-1) \
            - mesh_phi[mesh.n_internal:]
        phi = SurfaceField(jnp.concatenate(
            [phi_rel.data[:mesh.n_internal], phi_b]),
            phi_rel.dims, "phi")

        u_perf = None
        for outer in range(n_outer):
            final_outer = outer == n_outer - 1
            nu_eff = turb.nu_eff(mesh, turb_state, nu)
            UEqn = (fvm.ddt(mesh, U, dt, ddt_scheme)
                    + fvm.div(mesh, phi, U, div_u)
                    + div_dev_reff(mesh, nu_eff, U, lap_corr))
            U, u_perf = solve(mesh, UEqn == (-fvc.grad(mesh, p)),
                              u_final if final_outer else u_controls,
                              env={**env_w, "phi": phi})

            p_perf_all = []
            for corr in range(n_corr):
                UEqn_c = UEqn.replace(psi=U)
                rAU = 1.0 / UEqn_c.A(mesh)
                HbyA = fvc.constrain_hbya(mesh, rAU * UEqn_c.H(mesh), U)
                # relative flux of HbyA (fvc::makeRelative)
                phi_hbya = SurfaceField(
                    fvc.flux(mesh, HbyA).data - mesh_phi,
                    phi.dims, "phiHbyA")
                for north in range(n_non_orth + 1):
                    final = final_outer and corr == n_corr - 1 \
                        and north == n_non_orth
                    pEqn = fvm.laplacian(mesh, rAU, p, lap_corr) \
                        == fvc.div(mesh, phi_hbya)
                    pEqn = pEqn.set_reference(p_ref_cell, p_ref_value)
                    p, p_perf = solve(mesh, pEqn,
                                      p_final if final else p_controls)
                    p_perf_all.append(p_perf[0])
                phi = phi_hbya - pEqn.replace(psi=p).flux(mesh)
                U_star = HbyA - rAU * fvc.grad(mesh, p)
                U = U.replace(data=U_star.data) \
                    .correct_boundary_conditions(
                        mesh, env={**env_w, "phi": phi})

            turb_state, turb_perf = turb.correct(mesh, turb_state, U,
                                                 phi, nu, dt=dt)

        local_err, glob_err = continuity_errors(mesh, phi)
        co_mean, co_max = courant_number(mesh, phi, dt)
        if u_perf is None:
            z = jnp.asarray(0.0, U.data.dtype)
            u_perf = ((z, z, jnp.asarray(0, jnp.int32)),) * 3
        stats = dict(u_perf=u_perf, p_perf=tuple(p_perf_all),
                     turb=turb_perf, cont=(local_err, glob_err),
                     co=(co_mean, co_max))
        return U, p, phi, turb_state, stats

    def step(mesh, U, p, phi_rel, mesh_phi, mesh_ub, turb_state, dt):
        m2 = _dc.replace(mesh, band=mesh0.band, gamg=mesh0.gamg)
        return _step(m2, U, p, phi_rel, mesh_phi, mesh_ub, turb_state,
                     dt)

    return step


def run(case_dir: str, write: bool = True, max_steps: int | None = None):
    case = Case(case_dir)
    mesh = case.mesh
    dyn = make_dynamic_mesh(case)

    p = case.read_field("p")
    U = case.read_field("U")
    phi = fvc.flux(mesh, U)
    transport = SinglePhaseTransportModel(case.transport_properties())
    turb = make_ras_model(case, U)
    turb_state = turb.init_state(U)
    ctrl = PimpleControl(case)
    step = make_step(case, transport, turb, ctrl)

    timer = ExecutionTimer()
    cumulative_err = 0.0
    info("\nStarting time loop\n")
    n = 0
    u_solver = case.solver_controls("U").solver
    p_solver = case.solver_controls("p").solver
    while case.time.run():
        case.time.increment()
        info(f"Time = {case.time.name}\n")
        t = case.time.value
        if dyn is not None:
            if getattr(dyn, "needs_flow", False):
                dyn.set_flow(U, p, transport.nu(mesh, U))
            mesh, mesh_phi, mesh_ub = dyn.update(t)
            case.mesh = mesh       # keep function objects/IO consistent
        else:
            mesh_phi = jnp.zeros(mesh.n_faces, mesh.V.dtype)
            mesh_ub = jnp.zeros((mesh.n_boundary, 3), mesh.C.dtype)
        # relative flux on the UPDATED mesh (fvc::makeRelative)
        phi_rel = SurfaceField(phi.data - mesh_phi, phi.dims, "phi")

        U, p, phi_rel, turb_state, stats = step(
            mesh, U, p, phi_rel, mesh_phi, mesh_ub, turb_state,
            case.time.delta_t)
        # absolute flux for output/restart (fvc::makeAbsolute)
        phi = SurfaceField(phi_rel.data + mesh_phi, phi.dims, "phi")

        co_mean, co_max = stats["co"]
        log_courant(co_mean, co_max)
        for cmpt, perf in zip("xyz", stats["u_perf"]):
            log_solve(u_solver, f"U{cmpt}", perf[0], perf[1], perf[2])
        for perf in stats["p_perf"]:
            log_solve(p_solver, "p", perf[0], perf[1], perf[2])
        local_err, glob_err = stats["cont"]
        cumulative_err += float(glob_err)
        log_continuity(cumulative_err, local_err, glob_err)
        timer.log()
        if write and case.time.write_time():
            case.write_fields([U, p] + list(turb_state.values()))
        n += 1
        if max_steps and n >= max_steps:
            break
    info("End\n")
    return case, U, p, phi, turb_state


def main(argv=None):
    import argparse
    ap = argparse.ArgumentParser(description="pimpleDyMFoam (rapidcfd_tpu)")
    ap.add_argument("-case", dest="case", default=".")
    ap.add_argument("-noWrite", action="store_true")
    args = ap.parse_args(argv)
    run(args.case, write=not args.noWrite)


if __name__ == "__main__":
    main()
