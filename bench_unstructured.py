#!/usr/bin/env python
"""Benchmark: simpleFoam + kOmegaSST on a ~1M-cell unstructured
polyhedral channel (VERDICT r1 item 2: the ELL/overflow path at scale).

Prints ONE JSON line like bench.py. The mesh is the merged-cell,
perturbed-node polyhedral box from utils/unstructured.py (variable
faces-per-cell, duplicate cell-pair adjacencies, real non-orthogonality)
built in memory — no ascii round-trip at this size.
"""

import argparse
import json
import statistics
import sys
import tempfile
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=160)
    ap.add_argument("--ny", type=int, default=80)
    ap.add_argument("--nz", type=int, default=80)
    ap.add_argument("--steps", type=int, default=20,
                    help="SIMPLE iterations per timing window")
    ap.add_argument("--windows", type=int, default=3)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--converge", action="store_true",
                    help="also iterate to residualControl convergence "
                         "and report the iteration count")
    ap.add_argument("--x64", action="store_true")
    ap.add_argument("--no-gdia", action="store_true",
                    help="force the generic gather path (the gdia "
                         "lattice mode is the default)")
    ap.add_argument("--curve", type=float, default=0.0,
                    help="bend the duct by this many radians: with "
                         "perturbation+grading the mesh is genuinely "
                         "non-lattice (detect_lattice rejects it) and "
                         "the general ELL/gather path runs")
    ap.add_argument("--grade", type=float, default=1.0,
                    help="wall-normal geometric grading ratio")
    args = ap.parse_args()

    import jax
    if args.x64:
        jax.config.update("jax_enable_x64", True)

    from rapidcfd_tpu.utils import logging as L
    L.Info.enabled = False
    from rapidcfd_tpu.models.transport import SinglePhaseTransportModel
    from rapidcfd_tpu.models.turbulence import make_ras_model
    from rapidcfd_tpu.ops import fvc
    from rapidcfd_tpu.solvers import simplefoam
    from rapidcfd_tpu.solvers.case import Case
    from rapidcfd_tpu.solvers.controls import SimpleControl
    from rapidcfd_tpu.utils.unstructured import unstructured_channel_case

    d = tempfile.mkdtemp(prefix="bench_unstr_")
    t0 = time.perf_counter()
    nonlat = args.curve != 0.0 or args.grade != 1.0
    lat = None if (args.no_gdia or nonlat) else {}
    pmesh = unstructured_channel_case(
        d, nx=args.nx, ny=args.ny, nz=args.nz, end_time=10**9,
        perturb=0.12, merge_fraction=0.04, seed=3, write_mesh=False,
        lattice_out=lat, curve=args.curve, grade=args.grade)
    if nonlat:
        # prove the detector rejects it (the honest non-lattice claim)
        from rapidcfd_tpu.utils.unstructured import detect_lattice
        assert detect_lattice(pmesh) is None, \
            "curved/graded mesh unexpectedly detected as a lattice"
    case = Case(d, pmesh=pmesh, lattice=lat)
    mesh_s = time.perf_counter() - t0
    n_cells = pmesh.n_cells   # real cells (gdia pads to the lattice)

    p = case.read_field("p")
    U = case.read_field("U")
    phi = jax.jit(fvc.flux)(jax.device_put(case.mesh), U)
    transport = SinglePhaseTransportModel(case.transport_properties())
    turb = make_ras_model(case, U)
    turb_state = turb.init_state(U)
    simple = SimpleControl(case)
    step = simplefoam.make_step(case, transport, turb, simple)

    t0 = time.perf_counter()
    U1, p1, phi1, ts1, stats = step(U, p, phi, turb_state)
    jax.block_until_ready(U1.data)
    compile_s = time.perf_counter() - t0

    for _ in range(args.warmup):
        U, p, phi, turb_state, stats = step(U, p, phi, turb_state)
    jax.block_until_ready(U.data)

    walls = []
    for _ in range(args.windows):
        t0 = time.perf_counter()
        for _ in range(args.steps):
            U, p, phi, turb_state, stats = step(U, p, phi, turb_state)
        jax.block_until_ready(U.data)
        walls.append(time.perf_counter() - t0)
    wall = statistics.median(walls)

    def initial_residuals(stats):
        """stats -> {field: initial residual}; perf records are plain
        (initial, final, iters) tuples (linalg/solvers.py)."""
        import numpy as np
        r = {"U": max(float(np.asarray(pf[0])) for pf in stats["u_perf"]),
             "p": float(np.asarray(stats["p_perf"][0][0]))}
        for name, pf in stats["turb"].items():
            r[name] = float(np.asarray(pf[0]))
        return r

    extra = {}
    if args.converge:
        it = args.warmup + args.windows * args.steps
        while it < 5000:
            U, p, phi, turb_state, stats = step(U, p, phi, turb_state)
            it += 1
            if it % 50 == 0:
                r = initial_residuals(stats)
                assert r, "no residual records in solver stats"
                print(f"iter {it}: {r}", file=sys.stderr)
                if all(v < 1e-4 for v in r.values()):
                    break
        extra["converged_iters"] = it
        extra["final_residuals"] = initial_residuals(stats)

    ups = n_cells * args.steps / wall
    out = {
        "metric": (f"simpleFoam kOmegaSST unstructured "
                   f"{'NON-LATTICE curved-duct ' if nonlat else ''}"
                   f"polyhedral {args.nx}x{args.ny}x{args.nz} "
                   f"cell-updates/sec/chip"),
        "value": round(ups, 1),
        "unit": "cell-updates/s/chip",
        "vs_baseline": round(ups / 50e6, 4),
        "wall_per_step_ms": round(1e3 * wall / args.steps, 3),
        "compile_s": round(compile_s, 2),
        "mesh_build_s": round(mesh_s, 2),
        "n_cells": n_cells,
        "windows_ms": [round(1e3 * w / args.steps, 3) for w in walls],
        "device": str(jax.devices()[0]),
        **extra,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
