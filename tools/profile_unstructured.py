#!/usr/bin/env python
"""Per-phase profile of the unstructured SIMPLE step (VERDICT r4 item 2).

Splits the jitted simpleFoam iteration into cumulative stages and times
each on the real chip; successive differences give the per-phase cost:

  assembly_U : UEqn build (div + divDevReff + relax + grad p RHS)
  solve_U    : momentum solve (PBiCGStab, column-batched)
  assembly_p : rAU/HbyA/flux/adjustPhi + pressure laplacian build
  solve_p    : pressure solve(s) (PCG+GAMG preconditioner) + flux corr
  turb       : U correction + turbulence correct (k/omega solves)

Prints one JSON line with the phase table, solver iteration counts, and
HBM-bandwidth context. Usage (real TPU, from the repo root):
  python tools/profile_unstructured.py --nx 160 --ny 80 --nz 80
"""

import argparse
import json
import statistics
import sys
import tempfile
import time


def bench(fn, *a, iters=10, windows=3):
    import jax
    out = fn(*a)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    walls = []
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*a)
        jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
        walls.append((time.perf_counter() - t0) / iters)
    return statistics.median(walls) * 1e3  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=160)
    ap.add_argument("--ny", type=int, default=80)
    ap.add_argument("--nz", type=int, default=80)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--no-gdia", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from rapidcfd_tpu.utils import logging as L
    L.Info.enabled = False
    from rapidcfd_tpu.linalg.precompute import attach_solver_layouts
    from rapidcfd_tpu.models.transport import SinglePhaseTransportModel
    from rapidcfd_tpu.models.turbulence import make_ras_model
    from rapidcfd_tpu.ops import fvc, fvm
    from rapidcfd_tpu.solvers import simplefoam
    from rapidcfd_tpu.solvers.case import Case
    from rapidcfd_tpu.solvers.controls import SimpleControl
    from rapidcfd_tpu.solvers.simplefoam import (div_dev_reff,
                                                 relax_field,
                                                 turb_nl_stress)
    from rapidcfd_tpu.utils.unstructured import unstructured_channel_case

    d = tempfile.mkdtemp(prefix="prof_unstr_")
    t0 = time.perf_counter()
    lat = None if args.no_gdia else {}
    pmesh = unstructured_channel_case(
        d, nx=args.nx, ny=args.ny, nz=args.nz, end_time=10**9,
        perturb=0.12, merge_fraction=0.04, seed=3, write_mesh=False,
        lattice_out=lat)
    case = Case(d, pmesh=pmesh, lattice=lat)
    mesh_s = time.perf_counter() - t0
    print(f"mesh build {mesh_s:.1f}s n_cells={pmesh.n_cells} "
          f"lat={case.mesh.gdia is not None}", file=sys.stderr)

    p = case.read_field("p")
    U = case.read_field("U")
    phi = jax.jit(fvc.flux)(jax.device_put(case.mesh), U)
    transport = SinglePhaseTransportModel(case.transport_properties())
    turb = make_ras_model(case, U)
    ts = turb.init_state(U)
    simple = SimpleControl(case)
    kw = simplefoam.step_kwargs_from_case(case, simple, transport, turb)
    mesh = attach_solver_layouts(
        case.mesh, (kw["u_controls"], kw["p_controls"]), case=case)
    mesh = jax.device_put(mesh)

    from rapidcfd_tpu.linalg import solve

    def stage_u_asm(mesh, U, p, phi, ts):
        nu = transport.nu(mesh, U)
        nu_eff = turb.nu_eff(mesh, ts, nu)
        UEqn = fvm.div(mesh, phi, U, kw["div_u"]) \
            + div_dev_reff(mesh, nu_eff, U, kw["lap_corr"],
                           turb_nl_stress(turb, mesh, ts, U))
        UEqn = kw["fv_options"](mesh, "U", UEqn, {"nu": nu})
        UEqn = UEqn.relax(mesh, kw["u_relax"])
        UEqn = kw["fv_options"].constrain(mesh, "U", UEqn)
        rhs = -fvc.grad(mesh, p)
        return UEqn, rhs

    def stage_u_solve(mesh, U, p, phi, ts):
        UEqn, rhs = stage_u_asm(mesh, U, p, phi, ts)
        U2, u_perf = solve(mesh, UEqn == rhs, kw["u_controls"],
                           env={"phi": phi})
        return UEqn, U2, u_perf

    def stage_p_asm(mesh, U, p, phi, ts):
        UEqn, U2, u_perf = stage_u_solve(mesh, U, p, phi, ts)
        UEqn_c = UEqn.replace(psi=U2)
        rAU = 1.0 / UEqn_c.A(mesh)
        HbyA = fvc.constrain_hbya(mesh, rAU * UEqn_c.H(mesh), U2)
        phi_hbya = fvc.flux(mesh, HbyA)
        phi_hbya = fvc.adjust_phi(mesh, phi_hbya, U2)
        pEqn = fvm.laplacian(mesh, rAU, p, kw["lap_corr"]) \
            == fvc.div(mesh, phi_hbya)
        pEqn = pEqn.set_reference(kw["p_ref_cell"], kw["p_ref_value"],
                                  kw.get("p_ref_weight", 1.0))
        return UEqn, U2, rAU, HbyA, phi_hbya, pEqn

    def stage_p_solve(mesh, U, p, phi, ts):
        (UEqn, U2, rAU, HbyA, phi_hbya, pEqn) = \
            stage_p_asm(mesh, U, p, phi, ts)
        p_prev = p
        for north in range(kw["n_non_orth"] + 1):
            pEqn2 = fvm.laplacian(mesh, rAU, p, kw["lap_corr"]) \
                == fvc.div(mesh, phi_hbya)
            pEqn2 = pEqn2.set_reference(kw["p_ref_cell"],
                                       kw["p_ref_value"],
                                       kw.get("p_ref_weight", 1.0))
            p, p_perf = solve(mesh, pEqn2, kw["p_controls"])
        phi2 = phi_hbya - pEqn2.replace(psi=p).flux(mesh)
        return U2, p, p_prev, phi2, rAU, HbyA, p_perf

    def stage_full(mesh, U, p, phi, ts):
        (U2, p2, p_prev, phi2, rAU, HbyA, p_perf) = \
            stage_p_solve(mesh, U, p, phi, ts)
        p2 = relax_field(p2, p_prev, kw["p_relax"])
        U_star = HbyA - rAU * fvc.grad(mesh, p2)
        U2 = U2.replace(data=U_star.data).correct_boundary_conditions(
            mesh, env={"phi": phi2})
        nu = transport.nu(mesh, U)
        ts2, turb_perf = turb.correct(mesh, ts, U2, phi2, nu)
        return U2, p2, phi2, ts2, turb_perf

    stages = [
        ("assembly_U", jax.jit(stage_u_asm)),
        ("solve_U", jax.jit(stage_u_solve)),
        ("assembly_p", jax.jit(stage_p_asm)),
        ("solve_p", jax.jit(stage_p_solve)),
        ("full_step", jax.jit(stage_full)),
    ]
    cum = {}
    for name, fn in stages:
        t0 = time.perf_counter()
        ms = bench(fn, mesh, U, p, phi, ts, iters=args.iters)
        print(f"{name}: cumulative {ms:.2f} ms "
              f"(compile+bench {time.perf_counter()-t0:.0f}s)",
              file=sys.stderr)
        cum[name] = ms

    # solver iteration counts from one full original step
    step = simplefoam.make_step(case, transport, turb, simple)
    U1, p1, phi1, ts1, stats = step(U, p, phi, ts)
    import numpy as np
    iters = {
        "U": int(max(np.asarray(pf[2]) for pf in stats["u_perf"])),
        "p": int(np.asarray(stats["p_perf"][-1][2])),
        **{k: int(np.asarray(pf[2])) for k, pf in stats["turb"].items()},
    }

    phases = {
        "assembly_U_ms": round(cum["assembly_U"], 3),
        "solve_U_ms": round(cum["solve_U"] - cum["assembly_U"], 3),
        "assembly_p_ms": round(cum["assembly_p"] - cum["solve_U"], 3),
        "solve_p_ms": round(cum["solve_p"] - cum["assembly_p"], 3),
        "turb_ms": round(cum["full_step"] - cum["solve_p"], 3),
        "full_step_ms": round(cum["full_step"], 3),
    }
    out = {
        "metric": "unstructured SIMPLE step phase profile",
        "n_cells": pmesh.n_cells,
        "gdia": case.mesh.gdia is not None,
        "mesh_build_s": round(mesh_s, 1),
        "phases_ms": phases,
        "iters": iters,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
