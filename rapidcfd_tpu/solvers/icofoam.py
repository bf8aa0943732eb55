"""icoFoam — transient incompressible laminar solver (PISO).

Capability parity with the reference solver (reference:
applications/solvers/incompressible/icoFoam/icoFoam.C:36-117), TPU-first:
the entire timestep (momentum predictor + nCorrectors pressure-velocity
corrections + both Krylov solves) is ONE jitted program; the host loop
only advances the clock, logs residuals and writes checkpoints — exactly
the host/device contract of SURVEY.md §3.2 with fewer sync points.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..fields.field import Dimensioned, SurfaceField, VolField
from ..linalg import solve
from ..ops import fvc, fvm
from ..utils.dimensions import dim_flux
from ..utils.logging import (ExecutionTimer, info, log_continuity,
                             log_courant, log_solve)
from .case import Case


def courant_number(mesh, phi: SurfaceField, dt):
    """CourantNo.H: Co = 0.5*dt*sum|phi|/V. dt may be a scalar or a
    per-cell (nCells,) array (LTS pseudo-time)."""
    from ..linalg.solvers import gmax, gsum
    sum_phi = fvc.surface_sum_faces(mesh, jnp.abs(phi.data), signed=False)
    per_cell = 0.5 * sum_phi / mesh.V * dt
    co_max = gmax(per_cell)
    co_mean = gsum(per_cell * mesh.V) / gsum(mesh.V)
    return co_mean, co_max


def continuity_errors(mesh, phi: SurfaceField):
    """continuityErrs.H: local/global mass-conservation error."""
    from ..linalg.solvers import gsum
    cont = fvc.div(mesh, phi)
    local = gsum(jnp.abs(cont.data) * mesh.V)
    glob = gsum(cont.data * mesh.V)
    return local, glob


def piso_step(mesh, U: VolField, p: VolField, phi: SurfaceField, dt, nu,
              *, div_scheme, lap_corr, u_controls, p_controls,
              p_final_controls, n_correctors: int, n_non_orth: int,
              p_ref_cell, p_ref_value, p_ref_weight=1.0, t=None):
    """One PISO timestep (pure; works single-chip or inside shard_map —
    in the latter case p_ref_cell/p_ref_weight are per-shard values).
    t is the (traced) end-of-step time consumed by time-varying BCs
    (oscillatingFixedValue, uniform tables — reference: updateCoeffs
    reading db().time())."""
    U = U.store_old()
    env = {"phi": phi, "dt": dt}
    if t is not None:
        env["t"] = t

    # momentum predictor (UEqn.H)
    UEqn = (fvm.ddt(mesh, U, dt)
            + fvm.div(mesh, phi, U, div_scheme, env)
            - fvm.laplacian(mesh, nu, U, lap_corr, env))
    U, u_perf = solve(mesh, UEqn == (-fvc.grad(mesh, p)),
                      u_controls, env=env)

    p_perf_all = []
    for corr in range(n_correctors):
        UEqn_c = UEqn.replace(psi=U)
        rAU = 1.0 / UEqn_c.A(mesh)
        HbyA = fvc.constrain_hbya(mesh, rAU * UEqn_c.H(mesh), U)
        phi_hbya = fvc.flux(mesh, HbyA)

        p_new = p
        for north in range(n_non_orth + 1):
            final = (corr == n_correctors - 1) and (north == n_non_orth)
            pEqn = fvm.laplacian(mesh, rAU, p_new, lap_corr) \
                == fvc.div(mesh, phi_hbya)
            pEqn = pEqn.set_reference(p_ref_cell, p_ref_value,
                                      p_ref_weight)
            p_new, p_perf = solve(
                mesh, pEqn, p_final_controls if final else p_controls)
            p_perf_all.append(p_perf[0])
        p = p_new

        phi = phi_hbya - pEqn.replace(psi=p).flux(mesh)
        grad_p = fvc.grad(mesh, p)
        U_star = HbyA - rAU * grad_p
        env = dict(env, phi=phi)
        U = U.replace(data=U_star.data).correct_boundary_conditions(
            mesh, env=env)

    local_err, glob_err = continuity_errors(mesh, phi)
    co_mean, co_max = courant_number(mesh, phi, dt)
    stats = dict(u_perf=u_perf, p_perf=tuple(p_perf_all),
                 cont=(local_err, glob_err), co=(co_mean, co_max))
    return U, p, phi, stats


def make_step(case: Case, nu, n_correctors: int,
              n_non_orth: int, p_ref_cell: int, p_ref_value: float):
    """nu: a Dimensioned constant, or a callable U -> VolField for
    non-Newtonian viscosity models (reference:
    applications/solvers/incompressible/nonNewtonianIcoFoam)."""
    mesh = case.mesh
    kw = dict(
        div_scheme=case.div_scheme("div(phi,U)"),
        lap_corr=case.laplacian_scheme(),
        u_controls=case.solver_controls("U"),
        p_controls=case.solver_controls("p"),
        p_final_controls=case.solver_controls("p", final=True),
        n_correctors=n_correctors, n_non_orth=n_non_orth,
        p_ref_cell=p_ref_cell, p_ref_value=p_ref_value)
    nu_fn = nu if callable(nu) else (lambda U: nu)
    # mesh is a jit ARGUMENT, not a captured constant: baking the
    # geometry/ELL arrays into the HLO blows the program size up with
    # O(mesh) constants (the axon remote-compile rejects >100MB bodies
    # at ~1M cells) and forces a re-upload per recompile. The banded/DIA
    # layout and GAMG hierarchy can only be DERIVED concrete, so they
    # are attached to the mesh pytree here, before the jit boundary.
    from ..linalg.precompute import attach_solver_layouts
    mesh = attach_solver_layouts(
        mesh, (kw["u_controls"], kw["p_controls"],
               kw["p_final_controls"]), case=case)
    mesh = jax.device_put(mesh)

    @jax.jit
    def _step(mesh, U: VolField, p: VolField, phi: SurfaceField, dt, t):
        return piso_step(mesh, U, p, phi, dt, nu_fn(U), t=t, **kw)

    def step(U, p, phi, dt, t=None):
        from ..ops.interpolation import set_current_dt
        set_current_dt(dt)
        return _step(mesh, U, p, phi, dt,
                     jnp.asarray(0.0) if t is None else t)

    return step


def make_chained_step(case: Case, nu, n_correctors: int,
                      n_non_orth: int, p_ref_cell: int,
                      p_ref_value: float, chain: int):
    """Like make_step, but advances `chain` timesteps inside ONE jitted
    program (lax.scan over the PISO step). One device dispatch per
    window instead of per step — the remote-dispatch/launch overhead
    that dominates small-mesh wall time amortizes 1/chain. Returns
    (U, p, phi, stats) with stats stacked along a leading (chain,)
    axis (residual history of the whole window)."""
    mesh = case.mesh
    kw = dict(
        div_scheme=case.div_scheme("div(phi,U)"),
        lap_corr=case.laplacian_scheme(),
        u_controls=case.solver_controls("U"),
        p_controls=case.solver_controls("p"),
        p_final_controls=case.solver_controls("p", final=True),
        n_correctors=n_correctors, n_non_orth=n_non_orth,
        p_ref_cell=p_ref_cell, p_ref_value=p_ref_value)
    nu_fn = nu if callable(nu) else (lambda U: nu)
    from ..linalg.precompute import attach_solver_layouts
    mesh = attach_solver_layouts(
        mesh, (kw["u_controls"], kw["p_controls"],
               kw["p_final_controls"]), case=case)
    mesh = jax.device_put(mesh)

    @jax.jit
    def _steps(mesh, U: VolField, p: VolField, phi: SurfaceField, dt, t0):
        # prime the old-time slot so the scan carry is structurally
        # stable (piso_step's store_old then refreshes it every step)
        if U.old is None:
            U = U.store_old()

        def body(carry, k):
            U, p, phi = carry
            U, p, phi, stats = piso_step(mesh, U, p, phi, dt, nu_fn(U),
                                         t=t0 + (k + 1) * dt, **kw)
            return (U, p, phi), stats

        (U, p, phi), stats = jax.lax.scan(body, (U, p, phi),
                                          jnp.arange(chain))
        return U, p, phi, stats

    def steps(U, p, phi, dt, t0=None):
        return _steps(mesh, U, p, phi, dt,
                      jnp.asarray(0.0) if t0 is None else t0)

    return steps


def run(case_dir: str, write: bool = True, max_steps: int | None = None,
        non_newtonian: bool = False):
    case = Case(case_dir)
    mesh = case.mesh
    tp = case.transport_properties()
    if non_newtonian:
        from ..models.transport import SinglePhaseTransportModel
        model = SinglePhaseTransportModel(tp)
        nu = partial(model.nu, mesh)
    else:
        nu = Dimensioned.from_entry(tp.lookup("nu", required=True), "nu")

    piso = case.algo_dict("PISO")
    n_correctors = int(piso.scalar("nCorrectors", 1))
    n_non_orth = int(piso.scalar("nNonOrthogonalCorrectors", 0))
    p_ref_cell = int(piso.scalar("pRefCell", 0))
    p_ref_value = float(piso.scalar("pRefValue", 0.0))

    info("Reading transportProperties\n\nReading field p\n")
    p = case.read_field("p")
    info("Reading field U\n")
    U = case.read_field("U")
    info("Reading/calculating face flux field phi\n")
    if case.field_exists("phi"):
        from ..fields.io import read_surface_field
        phi = read_surface_field(case.dir, case.time.name, "phi", mesh,
                                 case.maps)
    else:
        phi = jax.jit(lambda u: fvc.flux(mesh, u))(U)

    step = make_step(case, nu, n_correctors, n_non_orth,
                     p_ref_cell, p_ref_value)
    timer = ExecutionTimer()
    cumulative_err = 0.0

    from ..postprocess import FunctionObjectList
    fos = FunctionObjectList(case)

    info("\nStarting time loop\n")
    n = 0
    while case.time.loop():
        info(f"Time = {case.time.name}\n")
        U, p, phi, stats = step(U, p, phi, case.time.delta_t,
                                jnp.asarray(case.time.value))

        co_mean, co_max = stats["co"]
        log_courant(co_mean, co_max)
        for cmpt, perf in zip("xyz", stats["u_perf"]):
            log_solve(f"{case.solver_controls('U').solver}", f"U{cmpt}",
                      perf[0], perf[1], perf[2])
        for perf in stats["p_perf"]:
            log_solve(f"{case.solver_controls('p').solver}", "p",
                      perf[0], perf[1], perf[2])
        local_err, glob_err = stats["cont"]
        cumulative_err += float(glob_err)
        log_continuity(cumulative_err, local_err, glob_err)
        if fos.objects:
            fos.execute({"U": U, "p": p})
        timer.log()

        if write and case.time.write_time():
            from ..fields.io import write_surface_field
            write_surface_field(phi, case.dir, case.time.name, mesh,
                                case.maps)
            case.write_fields([U, p])
        n += 1
        if max_steps and n >= max_steps:
            break

    fos.close()
    info("End\n")
    return case, U, p, phi


def main(argv=None):
    import argparse
    ap = argparse.ArgumentParser(description="icoFoam (rapidcfd_tpu)")
    ap.add_argument("-case", dest="case", default=".")
    ap.add_argument("-noWrite", action="store_true")
    args = ap.parse_args(argv)
    run(args.case, write=not args.noWrite)


if __name__ == "__main__":
    main()
