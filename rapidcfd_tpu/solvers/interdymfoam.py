"""interDyMFoam — two-phase VOF on a moving mesh.

Capability parity with the reference solver (reference:
applications/solvers/multiphase/interFoam/interDyMFoam/interDyMFoam.C:51):
mesh.update() each step, then the interFoam PIMPLE sequence on the
RELATIVE flux phi - meshPhi (alpha advection, mixture momentum, p_rgh
correction), absolute flux restored for output/restart.

TPU-first: the interFoam step is jitted with MeshArrays as an ARGUMENT
(solid-body motion preserves topology, so geometry updates never
recompile); the host rebuilds geometry + the analytic mesh flux per step
(models/dynamicmesh.py), and the precomputed solver layouts (band/DIA,
GAMG agglomeration) carry across motion.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..fields.field import SurfaceField
from ..models.dynamicmesh import make_dynamic_mesh
from ..ops import fvc
from ..utils.logging import (ExecutionTimer, info, log_continuity,
                             log_courant, log_solve)
from .case import Case
from .controls import PimpleControl
from .interfoam import _read_constants, make_step


def run(case_dir: str, write: bool = True, max_steps: int | None = None):
    case = Case(case_dir)
    mesh = case.mesh
    dyn = make_dynamic_mesh(case)
    consts = _read_constants(case)
    info(f"Two phases: rho1={consts[0]} rho2={consts[1]} "
         f"sigma={consts[4]}\n")

    alpha_name = "alpha.water" if case.field_exists("alpha.water") \
        else "alpha1"
    alpha = case.read_field(alpha_name)
    U = case.read_field("U")
    p_rgh = case.read_field("p_rgh")
    phi = fvc.flux(mesh, U)
    ctrl = PimpleControl(case)

    step = make_step(case, consts, ctrl, dym=True)
    timer = ExecutionTimer()
    cumulative_err = 0.0

    info("\nStarting time loop\n")
    n = 0
    co_max_prev = 0.0
    while case.time.run():
        if case.time.adjust_time_step and co_max_prev > 0:
            f = min(min(case.time.max_co / (co_max_prev + 1e-30), 1.0
                        + 0.1 * case.time.max_co / (co_max_prev + 1e-30)),
                    1.2)
            case.time.set_delta_t(f * case.time.delta_t)
        case.time.increment()
        info(f"Time = {case.time.name}\n")
        t = case.time.value
        if dyn is not None:
            if getattr(dyn, "needs_flow", False):
                dyn.set_flow(U, p_rgh, None)
            mesh, mesh_phi, mesh_ub = dyn.update(t)
            case.mesh = mesh
        else:
            mesh_phi = jnp.zeros(mesh.n_faces, mesh.V.dtype)
            mesh_ub = jnp.zeros((mesh.n_boundary, 3), mesh.C.dtype)
        # fvc::makeRelative on the updated mesh
        phi_rel = SurfaceField(phi.data - mesh_phi, phi.dims, "phi")

        alpha, U, p_rgh, phi_rel, stats = step(
            mesh, alpha, U, p_rgh, phi_rel, mesh_phi, mesh_ub,
            case.time.delta_t)
        # fvc::makeAbsolute for output/restart
        phi = SurfaceField(phi_rel.data + mesh_phi, phi.dims, "phi")

        co_mean, co_max = stats["co"]
        co_max_prev = float(co_max)
        log_courant(co_mean, co_max)
        a_min, a_max, a_int = stats["alpha"]
        info(f"Phase-1 volume fraction = "
             f"{float(a_int) / float(mesh.V.sum()):.8g}  "
             f"Min(alpha1) = {float(a_min):.6g}  "
             f"Max(alpha1) = {float(a_max):.6g}")
        for perf in stats["p_perf"]:
            log_solve(case.solver_controls('p_rgh').solver, "p_rgh",
                      perf[0], perf[1], perf[2])
        local_err, glob_err = stats["cont"]
        cumulative_err += float(glob_err)
        log_continuity(cumulative_err, local_err, glob_err)
        timer.log()
        if write and case.time.write_time():
            case.write_fields([alpha.replace(name=alpha_name), U, p_rgh])
        n += 1
        if max_steps and n >= max_steps:
            break
    info("End\n")
    return case, alpha, U, p_rgh, phi


def main(argv=None):
    import argparse
    ap = argparse.ArgumentParser(
        description="interDyMFoam (rapidcfd_tpu)")
    ap.add_argument("-case", dest="case", default=".")
    ap.add_argument("-noWrite", action="store_true")
    args = ap.parse_args(argv)
    run(args.case, write=not args.noWrite)


if __name__ == "__main__":
    main()
