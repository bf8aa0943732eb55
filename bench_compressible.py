#!/usr/bin/env python
"""Benchmark: the fp32-dominant compressible solvers on the current
device (VERDICT r3 item 2: TPU numbers for >=2 compressible solvers).

Two configs, each printing ONE bench.py-style JSON line:
  rhoSimpleFoam  — subsonic heated channel (absolute SI pressure ~1e5 Pa,
                   deviation-form p, GAMG pressure), steady SIMPLE steps
  sonicFoam      — Mach-3 forward step (BASELINE config 4), transient
                   PISO timesteps

Both run the dispatcher's DEFAULT precision for these solvers (fp32
fields, delta-form Krylov) — the trajectory-agreement evidence is
tests/test_compressible_fp32.py; this file is the throughput evidence.
"""

import argparse
import json
import statistics
import tempfile
import time


def _time_windows(step_fn, sync, steps, windows, warmup):
    t0 = time.perf_counter()
    step_fn()
    sync()
    compile_s = time.perf_counter() - t0
    for _ in range(warmup):
        step_fn()
    sync()
    walls = []
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(steps):
            step_fn()
        sync()
        walls.append(time.perf_counter() - t0)
    return compile_s, walls


def bench_rhosimple(args):
    import jax
    from rapidcfd_tpu.utils.casegen import hot_channel_case
    from rapidcfd_tpu.solvers import rhosimplefoam
    from rapidcfd_tpu.utils import logging as L

    d = tempfile.mkdtemp(prefix="bench_rhosimple_")
    hot_channel_case(d, nx=args.nx, ny=args.ny, end_time=10**9)

    L.Info.enabled = False
    from rapidcfd_tpu.solvers.case import Case
    from rapidcfd_tpu.solvers.controls import SimpleControl
    from rapidcfd_tpu.models.thermo import PsiThermo, read_thermo
    from rapidcfd_tpu.models.turbulence import CompressibleTurbulence
    from rapidcfd_tpu.ops import fvc
    from rapidcfd_tpu.fields.field import SurfaceField
    from rapidcfd_tpu.utils.dimensions import DimensionSet, dim_density
    import jax.numpy as jnp
    import numpy as np

    case = Case(d)
    mesh = case.mesh
    m0 = read_thermo(case.constant_dict("thermophysicalProperties"))
    thermo = PsiThermo(case, m0)
    p = case.read_field("p")
    T = case.read_field("T")
    U = case.read_field("U")
    rho = T.with_calculated_bcs(m0.rho(p.data, T.data),
                                m0.rho(p.bvalues, T.bvalues),
                                dim_density, "rho")
    rho_f = fvc.face_values(mesh, rho)
    phi = SurfaceField(rho_f * fvc.flux(mesh, U).data,
                       DimensionSet.of(1, 0, -1), "phi")
    simple = SimpleControl(case)
    turb = CompressibleTurbulence(case, U)
    turb_state = turb.init_state(U)
    p_offset = 0.0
    if p.data.dtype == jnp.float32:
        pa = np.asarray(p.data)
        lvl, dyn = float(np.mean(pa)), float(pa.max() - pa.min())
        if abs(lvl) > 100.0 * max(dyn, 1e-30):
            from rapidcfd_tpu.fields.field import shift_level
            p_offset = lvl
            p = shift_level(p, -p_offset)
    step = rhosimplefoam.make_step(case, thermo, simple, turb=turb,
                                   p_offset=p_offset)

    state = {"s": (U, p, T, rho, phi, turb_state)}

    def one():
        U, p, T, rho, phi, ts = state["s"]
        U, p, T, rho, phi, ts, stats = step(U, p, T, rho, phi, ts)
        state["s"] = (U, p, T, rho, phi, ts)

    compile_s, walls = _time_windows(
        one, lambda: jax.block_until_ready(state["s"][0].data),
        args.steps, args.windows, args.warmup)
    wall = statistics.median(walls)
    n_cells = case.mesh.n_cells
    ups = n_cells * args.steps / wall
    return {
        "metric": (f"rhoSimpleFoam kEpsilon heated channel "
                   f"{args.nx}x{args.ny} fp32 cell-updates/sec/chip"),
        "value": round(ups, 1),
        "unit": "cell-updates/s/chip",
        "vs_baseline": round(ups / 50e6, 4),
        "wall_per_step_ms": round(1e3 * wall / args.steps, 3),
        "compile_s": round(compile_s, 2),
        "n_cells": n_cells,
        "dtype": str(state["s"][1].data.dtype),
        "windows_ms": [round(1e3 * w / args.steps, 3) for w in walls],
        "device": str(jax.devices()[0]),
    }


def bench_sonic(args):
    import jax
    from rapidcfd_tpu.utils.casegen import forward_step_case
    from rapidcfd_tpu.solvers import sonicfoam
    from rapidcfd_tpu.solvers.case import Case
    from rapidcfd_tpu.solvers.controls import PisoControl
    from rapidcfd_tpu.models.thermo import PsiThermo, read_thermo
    from rapidcfd_tpu.ops import fvc
    from rapidcfd_tpu.fields.field import SurfaceField
    from rapidcfd_tpu.utils.dimensions import DimensionSet, dim_density
    from rapidcfd_tpu.utils import logging as L

    d = tempfile.mkdtemp(prefix="bench_sonic_")
    dt = 0.0005 / args.scale
    forward_step_case(d, scale=args.scale, delta_t=dt, end_time=10**9)
    L.Info.enabled = False

    case = Case(d)
    mesh = case.mesh
    thermo_model = read_thermo(case.constant_dict(
        "thermophysicalProperties"))
    thermo = PsiThermo(case, thermo_model)
    p = case.read_field("p")
    T = case.read_field("T")
    U = case.read_field("U")
    m = thermo_model
    rho = T.with_calculated_bcs(m.rho(p.data, T.data),
                                m.rho(p.bvalues, T.bvalues),
                                dim_density, "rho")
    rho_f = fvc.face_values(mesh, rho)
    phi = SurfaceField(rho_f * fvc.flux(mesh, U).data,
                       DimensionSet.of(1, 0, -1), "phi")
    step = sonicfoam.make_step(case, thermo, PisoControl(case))

    state = {"s": (U, p, T, rho, phi)}

    def one():
        U, p, T, rho, phi = state["s"]
        U, p, T, rho, phi, stats = step(U, p, T, rho, phi, dt)
        state["s"] = (U, p, T, rho, phi)

    compile_s, walls = _time_windows(
        one, lambda: jax.block_until_ready(state["s"][0].data),
        args.steps, args.windows, args.warmup)
    wall = statistics.median(walls)
    n_cells = case.mesh.n_cells
    ups = n_cells * args.steps / wall
    return {
        "metric": (f"sonicFoam forwardStep scale={args.scale} fp32 "
                   f"cell-updates/sec/chip"),
        "value": round(ups, 1),
        "unit": "cell-updates/s/chip",
        "vs_baseline": round(ups / 50e6, 4),
        "wall_per_step_ms": round(1e3 * wall / args.steps, 3),
        "compile_s": round(compile_s, 2),
        "n_cells": n_cells,
        "dtype": str(state["s"][1].data.dtype),
        "windows_ms": [round(1e3 * w / args.steps, 3) for w in walls],
        "device": str(jax.devices()[0]),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--solver", default="both",
                    choices=["rhoSimpleFoam", "sonicFoam", "both"])
    ap.add_argument("--nx", type=int, default=1024,
                    help="rhoSimpleFoam channel cells (x)")
    ap.add_argument("--ny", type=int, default=256,
                    help="rhoSimpleFoam channel cells (y)")
    ap.add_argument("--scale", type=int, default=16,
                    help="sonicFoam forwardStep refinement "
                         "(60*16 cells per unit scale)")
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--windows", type=int, default=3)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--x64", action="store_true")
    args = ap.parse_args()

    import jax
    if args.x64:
        jax.config.update("jax_enable_x64", True)

    if args.solver in ("rhoSimpleFoam", "both"):
        print(json.dumps(bench_rhosimple(args)), flush=True)
    if args.solver in ("sonicFoam", "both"):
        print(json.dumps(bench_sonic(args)), flush=True)


if __name__ == "__main__":
    main()
