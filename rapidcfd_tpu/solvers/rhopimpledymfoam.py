"""rhoPimpleDyMFoam — transient compressible PIMPLE on a moving mesh.

Capability parity with the reference solver (reference:
applications/solvers/compressible/rhoPimpleFoam/rhoPimpleDyMFoam/
rhoPimpleDyMFoam.C): mesh.update() each step, then the rhoPimpleFoam
sequence on the RELATIVE mass flux phi - interp(rho)*meshPhi
(fvc::makeRelative(fvc::interpolate(rho), phi)), absolute flux restored
for output/restart.

TPU-first: the rhoPimpleFoam step is jitted with MeshArrays as an
ARGUMENT (motion preserves topology, so geometry updates never
recompile); the host rebuilds geometry + the analytic mesh flux per
step (models/dynamicmesh.py) and the precomputed solver layouts carry
across motion.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..fields.field import SurfaceField
from ..models.dynamicmesh import make_dynamic_mesh
from ..models.thermo import PsiThermo, read_thermo
from ..ops import fvc
from ..utils.dimensions import DimensionSet, dim_density
from ..utils.logging import (ExecutionTimer, info, log_continuity,
                             log_courant, log_solve)
from .case import Case
from .controls import PimpleControl
from .rhopimplefoam import make_step


def run(case_dir: str, write: bool = True, max_steps: int | None = None):
    case = Case(case_dir)
    mesh = case.mesh
    dyn = make_dynamic_mesh(case)
    thermo_model = read_thermo(case.constant_dict(
        "thermophysicalProperties"))
    thermo = PsiThermo(case, thermo_model)
    m = thermo_model

    p = case.read_field("p")
    T = case.read_field("T")
    U = case.read_field("U")
    rho = T.with_calculated_bcs(m.rho(p.data, T.data),
                                m.rho(p.bvalues, T.bvalues),
                                dim_density, "rho")
    rho_f = fvc.face_values(mesh, rho)
    phi = SurfaceField(rho_f * fvc.flux(mesh, U).data,
                       DimensionSet.of(1, 0, -1), "phi")

    ctrl = PimpleControl(case)
    from ..models.turbulence import CompressibleTurbulence
    turb = CompressibleTurbulence(case, U)
    turb_state = turb.init_state(U)
    step = make_step(case, thermo, ctrl, turb=turb, dym=True)
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
                dyn.set_flow(U, p, None)
            mesh, mesh_phi, mesh_ub = dyn.update(t)
            case.mesh = mesh
        else:
            mesh_phi = jnp.zeros(mesh.n_faces, mesh.V.dtype)
            mesh_ub = jnp.zeros((mesh.n_boundary, 3), mesh.C.dtype)
        # fvc::makeRelative(interp(rho), phi) on the updated mesh
        rho_f = fvc.face_values(mesh, rho)
        phi_rel = SurfaceField(phi.data - rho_f * mesh_phi, phi.dims,
                               "phi")

        U, p, T, rho, phi_rel, turb_state, stats = step(
            mesh, U, p, T, rho, phi_rel, turb_state,
            case.time.delta_t, mesh_phi, mesh_ub)
        # fvc::makeAbsolute for output/restart
        rho_f = fvc.face_values(mesh, rho)
        phi = SurfaceField(phi_rel.data + rho_f * mesh_phi, phi.dims,
                           "phi")

        co_mean, co_max = stats["co"]
        co_max_prev = float(co_max)
        log_courant(co_mean, co_max)
        for cmpt, perf in zip("xyz", stats["u_perf"]):
            log_solve(case.solver_controls("U").solver, f"U{cmpt}",
                      perf[0], perf[1], perf[2])
        for perf in stats["p_perf"]:
            log_solve(case.solver_controls("p").solver, "p",
                      perf[0], perf[1], perf[2])
        local_err, glob_err = stats["cont"]
        cumulative_err += float(glob_err)
        log_continuity(cumulative_err, local_err, glob_err)
        timer.log()
        if write and case.time.write_time():
            case.write_fields([U, p, T, rho.replace(name="rho")]
                              + list(turb_state.values()))
        n += 1
        if max_steps and n >= max_steps:
            break
    info("End\n")
    return case, U, p, T, rho, phi


def main(argv=None):
    import argparse
    ap = argparse.ArgumentParser(
        description="rhoPimpleDyMFoam (rapidcfd_tpu)")
    ap.add_argument("-case", dest="case", default=".")
    ap.add_argument("-noWrite", action="store_true")
    args = ap.parse_args(argv)
    run(args.case, write=not args.noWrite)


if __name__ == "__main__":
    main()
