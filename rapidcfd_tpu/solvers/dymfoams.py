"""Moving-mesh (DyM) variants of the compressible / multiphase mains.

Reference mains covered here (each is the base solver plus
mesh.update() and relative-flux plumbing — reference:
applications/solvers/compressible/sonicFoam/sonicDyMFoam/,
multiphase/cavitatingFoam/cavitatingDyMFoam/,
multiphase/compressibleInterFoam/compressibleInterDyMFoam/,
multiphase/interPhaseChangeFoam/interPhaseChangeDyMFoam/,
multiphase/multiphaseInterFoam/multiphaseInterDyMFoam/,
multiphase/potentialFreeSurfaceFoam/potentialFreeSurfaceDyMFoam/):

TPU-first: each base step is jitted with MeshArrays as an ARGUMENT
(solid-body / PDE motion preserves topology, so geometry updates never
recompile); the host rebuilds geometry + the analytic mesh flux per
step (models/dynamicmesh.py); the precomputed solver layouts (band/DIA,
GAMG agglomeration) carry across motion.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..fields.field import SurfaceField
from ..models.dynamicmesh import make_dynamic_mesh
from ..ops import fvc
from ..utils.dimensions import DimensionSet, dim_density
from ..utils.logging import (ExecutionTimer, info, log_continuity,
                             log_courant, log_solve)
from .case import Case


def begin_motion_step(case, dyn, co_max_prev, flow=None):
    """Shared host prologue: Courant dt adjustment, time increment,
    mesh.update(). Returns (mesh, mesh_phi, mesh_ub)."""
    if case.time.adjust_time_step and co_max_prev > 0:
        f = min(min(case.time.max_co / (co_max_prev + 1e-30), 1.0
                    + 0.1 * case.time.max_co / (co_max_prev + 1e-30)),
                1.2)
        case.time.set_delta_t(f * case.time.delta_t)
    case.time.increment()
    info(f"Time = {case.time.name}\n")
    mesh = case.mesh
    if dyn is not None:
        if getattr(dyn, "needs_flow", False) and flow is not None:
            dyn.set_flow(*flow)
        mesh, mesh_phi, mesh_ub = dyn.update(case.time.value)
        case.mesh = mesh
    else:
        mesh_phi = jnp.zeros(mesh.n_faces, mesh.V.dtype)
        mesh_ub = jnp.zeros((mesh.n_boundary, 3), mesh.C.dtype)
    return mesh, mesh_phi, mesh_ub


def run_sonic_dym(case_dir: str, write: bool = True,
                  max_steps: int | None = None):
    """sonicDyMFoam (reference: sonicFoam/sonicDyMFoam/sonicDyMFoam.C):
    mesh.update(), relative mass flux, phid made relative with
    interp(psi)*meshPhi."""
    from ..models.thermo import PsiThermo, read_thermo
    from .controls import PisoControl
    from .sonicfoam import make_step

    case = Case(case_dir)
    mesh = case.mesh
    dyn = make_dynamic_mesh(case)
    thermo_model = read_thermo(case.constant_dict(
        "thermophysicalProperties"))
    thermo = PsiThermo(case, thermo_model)
    m = thermo_model
    info(f"Perfect gas: R={m.r:.6g} Cp={m.cp:.6g} gamma={m.gamma:.4g}\n")

    p = case.read_field("p")
    T = case.read_field("T")
    U = case.read_field("U")
    rho = T.with_calculated_bcs(m.rho(p.data, T.data),
                                m.rho(p.bvalues, T.bvalues),
                                dim_density, "rho")
    phi = SurfaceField(fvc.face_values(mesh, rho)
                       * fvc.flux(mesh, U).data,
                       DimensionSet.of(1, 0, -1), "phi")

    ctrl = PisoControl(case)
    step = make_step(case, thermo, ctrl, dym=True)
    timer = ExecutionTimer()
    cumulative_err = 0.0

    info("\nStarting time loop\n")
    n = 0
    co_max_prev = 0.0
    while case.time.run():
        mesh, mesh_phi, mesh_ub = begin_motion_step(case, dyn,
                                                    co_max_prev)
        # fvc::makeRelative(interp(rho), phi)
        rho_f = fvc.face_values(mesh, rho)
        phi_rel = SurfaceField(phi.data - rho_f * mesh_phi, phi.dims,
                               "phi")
        U, p, T, rho, phi_rel, stats = step(
            mesh, U, p, T, rho, phi_rel, case.time.delta_t, mesh_phi,
            mesh_ub)
        rho_f = fvc.face_values(mesh, rho)
        phi = SurfaceField(phi_rel.data + rho_f * mesh_phi, phi.dims,
                           "phi")

        co_mean, co_max = stats["co"]
        co_max_prev = float(co_max)
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


def main(argv=None, fn=run_sonic_dym, name="sonicDyMFoam"):
    import argparse
    ap = argparse.ArgumentParser(description=f"{name} (rapidcfd_tpu)")
    ap.add_argument("-case", dest="case", default=".")
    ap.add_argument("-noWrite", action="store_true")
    args = ap.parse_args(argv)
    fn(args.case, write=not args.noWrite)


if __name__ == "__main__":
    main()
