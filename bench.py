#!/usr/bin/env python
"""Benchmark: icoFoam cavity timesteps on the current device.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Metric is cell-updates/sec/chip (BASELINE.md); vs_baseline is relative to
the 50M cell-updates/s/chip north star.

The benchmarked step is the fully-jitted PISO timestep (momentum +
2 pressure solves); steps are chained on-device with no host sync inside
the loop. Timing: median over --windows windows of --steps steps each
(VERDICT round-1 item 10: median-of-N, windows >= 50 steps; compile time
reported separately). --profile captures a jax.profiler trace.
"""

import argparse
import json
import os
import statistics
import sys
import tempfile
import time


def _init_backend(retries: int = 5, base_delay: float = 2.0):
    """jax.devices() with retry/backoff: the TPU tunnel (axon) can be
    transiently unavailable at snapshot time (r4's BENCH_r04 rc=1 was
    exactly this); a benchmark must not lose the round's number to a
    flaky backend handshake. Returns the device list, raising only
    after the last attempt."""
    import jax
    last = None
    for attempt in range(retries):
        try:
            devs = jax.devices()
            if devs:
                return devs
        except Exception as e:  # backend init failure — retry
            last = e
        time.sleep(base_delay * (2 ** attempt))
    if last is not None:
        raise last
    raise RuntimeError("jax.devices() returned no devices")


def _fail_json(metric: str, err: Exception) -> None:
    """Structured failure line (driver-parseable) instead of a traceback."""
    import traceback
    print(json.dumps({
        "metric": metric, "value": 0.0, "unit": "cell-updates/s/chip",
        "vs_baseline": 0.0, "error": f"{type(err).__name__}: {err}",
        "trace_tail": traceback.format_exc().strip().splitlines()[-3:],
    }))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=384,
                    help="cavity cells per side (n*n mesh, or n^3/4 3D)")
    ap.add_argument("--three-d", action="store_true",
                    help="3D cavity (n x n x n/4 cells)")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--windows", type=int, default=5,
                    help="timing windows; the median wins")
    ap.add_argument("--warmup", type=int, default=5)
    ap.add_argument("--x64", action="store_true")
    ap.add_argument("--p-solver", default="PCG",
                    choices=["GAMG", "PCG"])
    ap.add_argument("--p-precond", default="GAMG",
                    help="pressure preconditioner (GAMG = one V-cycle)")
    ap.add_argument("--u-solver", default="PBiCGStab")
    ap.add_argument("--u-precond", default="DILU",
                    help="momentum preconditioner (AINV alias; GAMG = "
                         "one V-cycle, pays off on stiff/fine meshes)")
    ap.add_argument("--chain", type=int, default=10,
                    help="timesteps fused per dispatch (lax.scan); "
                         "amortizes launch overhead 1/chain")
    ap.add_argument("--profile", metavar="DIR", default=None,
                    help="capture a jax.profiler trace of one window")
    ap.add_argument("--case", default="cavity",
                    choices=["cavity", "pitz"],
                    help="cavity = BASELINE config 1 (icoFoam PISO); "
                         "pitz = BASELINE config 2 (simpleFoam "
                         "kEpsilon + GAMG pressure)")
    ap.add_argument("--pitz-scale", type=int, default=5,
                    help="pitzDaily mesh scale (cells = 4480*scale^2)")
    args = ap.parse_args()

    metric = (f"icoFoam cavity {args.n}x{args.n} cell-updates/sec/chip"
              if args.case == "cavity" else
              f"simpleFoam pitzDaily x{args.pitz_scale} "
              f"cell-updates/sec/chip")
    try:
        import jax
        if args.x64:
            jax.config.update("jax_enable_x64", True)
        _init_backend()
        out = (_run_cavity(args, ap) if args.case == "cavity"
               else _run_pitz(args))
        print(json.dumps(out))
    except Exception as e:
        _fail_json(metric, e)


def _run_cavity(args, ap):
    import jax
    from rapidcfd_tpu.utils import logging as L
    L.Info.enabled = False
    from rapidcfd_tpu.utils.casegen import cavity_case
    from rapidcfd_tpu.solvers import icofoam
    from rapidcfd_tpu.solvers.case import Case
    from rapidcfd_tpu.fields.field import Dimensioned
    from rapidcfd_tpu.ops import fvc

    d = tempfile.mkdtemp(prefix="bench_cavity_")
    # scale dt to CFL~0.5: 2-corrector PISO + central convection on the
    # impulsively-started fine-mesh cavity grows slowly at CFL=1 (fp64
    # identically to fp32 — an algorithmic margin, not precision), and a
    # benchmark must time a converging run
    dt = 0.005 * 20 / args.n * 0.5
    nz = max(args.n // 4, 1) if args.three_d else 1
    pmesh = cavity_case(
        d, n=args.n, nz=nz, delta_t=dt, end_time=1e9,
        p_solver=args.p_solver, u_solver=args.u_solver,
        p_precond=args.p_precond, u_precond=args.u_precond,
        write_mesh=False)

    case = Case(d, pmesh=pmesh)
    tp = case.transport_properties()
    nu = Dimensioned.from_entry(tp.lookup("nu", required=True), "nu")
    piso = case.algo_dict("PISO")
    mk = (icofoam.make_step if args.chain <= 1 else
          lambda *a: icofoam.make_chained_step(*a, chain=args.chain))
    step = mk(
        case, nu, int(piso.scalar("nCorrectors", 2)),
        int(piso.scalar("nNonOrthogonalCorrectors", 0)),
        int(piso.scalar("pRefCell", 0)), float(piso.scalar("pRefValue", 0)))
    if args.chain > 1 and args.steps % args.chain:
        ap.error("--steps must be a multiple of --chain")

    U = case.read_field("U")
    p = case.read_field("p")
    phi = jax.jit(fvc.flux)(jax.device_put(case.mesh), U)

    t0 = time.perf_counter()
    U1, p1, phi1, _ = step(U, p, phi, dt)
    jax.block_until_ready(U1.data)
    compile_s = time.perf_counter() - t0
    n_calls = args.steps // max(args.chain, 1)
    for _ in range(args.warmup):
        U, p, phi, stats = step(U, p, phi, dt)
    jax.block_until_ready(U.data)

    walls = []
    for _ in range(args.windows):
        t0 = time.perf_counter()
        for _ in range(n_calls):
            U, p, phi, stats = step(U, p, phi, dt)
        jax.block_until_ready(U.data)
        walls.append(time.perf_counter() - t0)
    wall = statistics.median(walls)

    if args.profile:
        with jax.profiler.trace(args.profile):
            for _ in range(min(n_calls, 20)):
                U, p, phi, stats = step(U, p, phi, dt)
            jax.block_until_ready(U.data)
        print(f"profile trace written to {args.profile}", file=sys.stderr)

    n_cells = case.mesh.n_cells
    ups = n_cells * args.steps / wall
    dims = f"{args.n}x{args.n}" + (f"x{nz}" if args.three_d else "")
    return {
        "metric": f"icoFoam cavity {dims} cell-updates/sec/chip",
        "value": round(ups, 1),
        "unit": "cell-updates/s/chip",
        "vs_baseline": round(ups / 50e6, 4),
        "wall_per_step_ms": round(1e3 * wall / args.steps, 3),
        "compile_s": round(compile_s, 2),
        "n_cells": n_cells,
        "windows_ms": [round(1e3 * w / args.steps, 3) for w in walls],
        "device": str(jax.devices()[0]),
    }


def _run_pitz(args):
    """BASELINE config 2: simpleFoam pitzDaily (kEpsilon + wall
    functions, GAMG pressure), SIMPLE iterations timed like the cavity
    windows. The mesh is the masked-grid backward-facing step — it
    exercises the gdia lattice path with dead slots."""
    import jax
    from rapidcfd_tpu.utils import logging as L
    L.Info.enabled = False
    from rapidcfd_tpu.models.transport import SinglePhaseTransportModel
    from rapidcfd_tpu.models.turbulence import make_ras_model
    from rapidcfd_tpu.ops import fvc
    from rapidcfd_tpu.solvers import simplefoam
    from rapidcfd_tpu.solvers.case import Case
    from rapidcfd_tpu.solvers.controls import SimpleControl

    d = tempfile.mkdtemp(prefix="bench_pitz_")
    from rapidcfd_tpu.utils.casegen import pitz_daily_case
    pitz_daily_case(d, scale=args.pitz_scale)
    case = Case(d)
    U = case.read_field("U")
    p = case.read_field("p")
    phi = fvc.flux(case.mesh, U)
    transport = SinglePhaseTransportModel(case.transport_properties())
    turb = make_ras_model(case, U)
    ts = turb.init_state(U)
    simple = SimpleControl(case)
    step = simplefoam.make_step(case, transport, turb, simple)

    t0 = time.perf_counter()
    U1, p1, phi1, ts1, _ = step(U, p, phi, ts)
    jax.block_until_ready(p1.data)
    compile_s = time.perf_counter() - t0
    for _ in range(args.warmup):
        U, p, phi, ts, _ = step(U, p, phi, ts)
    jax.block_until_ready(p.data)

    walls = []
    for _ in range(args.windows):
        t0 = time.perf_counter()
        for _ in range(args.steps):
            U, p, phi, ts, _ = step(U, p, phi, ts)
        jax.block_until_ready(p.data)
        walls.append(time.perf_counter() - t0)
    wall = statistics.median(walls)

    # cell-updates counted over LIVE cells (gdia pads to lattice slots)
    import numpy as np
    n_cells = case.mesh.n_cells
    if case.mesh.gdia is not None:
        n_cells = int(np.asarray(case.mesh.gdia.primary).sum())
    ups = n_cells * args.steps / wall
    return {
        "metric": f"simpleFoam pitzDaily x{args.pitz_scale} "
                  f"cell-updates/sec/chip",
        "value": round(ups, 1),
        "unit": "cell-updates/s/chip",
        "vs_baseline": round(ups / 50e6, 4),
        "wall_per_step_ms": round(1e3 * wall / args.steps, 3),
        "compile_s": round(compile_s, 2),
        "n_cells": n_cells,
        "windows_ms": [round(1e3 * w / args.steps, 3) for w in walls],
        "device": str(jax.devices()[0]),
    }


if __name__ == "__main__":
    main()
