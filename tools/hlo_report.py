#!/usr/bin/env python
"""XLA-level report for the unstructured SIMPLE step phases: compiled
cost analysis (bytes accessed / flops — XLA's own HBM-traffic estimate)
plus an optimized-HLO op census (fusion count, gathers, scatters,
concatenates, while loops). Aims the assembly-fusion attack with
compiler facts instead of guesses.

  python tools/hlo_report.py --nx 80 --ny 40 --nz 40
"""

import argparse
import re
import sys
import tempfile
from collections import Counter


def census(hlo_text: str) -> Counter:
    c = Counter()
    for m in re.finditer(r"^\s*(?:ROOT\s+)?%?[\w.\-]+\s*=\s*[\w\[\]{},/ ]*"
                         r"\s*(\w+)\(", hlo_text, re.M):
        c[m.group(1)] += 1
    return c


def report(name, jfn, *args):
    import jax
    lowered = jax.jit(jfn).lower(*args)
    compiled = lowered.compile()
    ca_list = compiled.cost_analysis()
    ca = ca_list[0] if isinstance(ca_list, (list, tuple)) else ca_list
    txt = compiled.as_text()
    c = census(txt)
    interesting = {k: v for k, v in c.items()
                   if k in ("fusion", "gather", "scatter", "concatenate",
                            "while", "all-reduce", "dot", "convolution",
                            "dynamic-slice", "dynamic-update-slice",
                            "copy", "transpose", "reduce", "pad", "slice")}
    print(f"== {name}")
    if ca:
        by = ca.get("bytes accessed", None)
        fl = ca.get("flops", None)
        print(f"   bytes accessed: {by if by is None else f'{by/1e6:.1f} MB'}"
              f"   flops: {fl if fl is None else f'{fl/1e9:.3f} G'}")
        for k in sorted(ca):
            if k.startswith("bytes accessed") and k != "bytes accessed":
                pass
    print(f"   ops: {dict(sorted(interesting.items(), key=lambda kv: -kv[1]))}")
    sys.stdout.flush()
    return txt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=80)
    ap.add_argument("--ny", type=int, default=40)
    ap.add_argument("--nz", type=int, default=40)
    ap.add_argument("--dump", default=None,
                    help="dump optimized HLO of each stage to DIR")
    args = ap.parse_args()

    import jax

    from rapidcfd_tpu.utils import logging as L
    L.Info.enabled = False
    from rapidcfd_tpu.linalg.precompute import attach_solver_layouts
    from rapidcfd_tpu.models.transport import SinglePhaseTransportModel
    from rapidcfd_tpu.models.turbulence import make_ras_model
    from rapidcfd_tpu.ops import fvc, fvm
    from rapidcfd_tpu.solvers import simplefoam
    from rapidcfd_tpu.solvers.case import Case
    from rapidcfd_tpu.solvers.controls import SimpleControl
    from rapidcfd_tpu.solvers.simplefoam import div_dev_reff, turb_nl_stress
    from rapidcfd_tpu.utils.unstructured import unstructured_channel_case

    d = tempfile.mkdtemp(prefix="hlo_unstr_")
    lat = {}
    pmesh = unstructured_channel_case(
        d, nx=args.nx, ny=args.ny, nz=args.nz, end_time=10**9,
        perturb=0.12, merge_fraction=0.04, seed=3, write_mesh=False,
        lattice_out=lat)
    case = Case(d, pmesh=pmesh, lattice=lat)
    print(f"n_cells={pmesh.n_cells} gdia={case.mesh.gdia is not None}",
          file=sys.stderr)

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

    def u_asm(mesh, U, p, phi, ts):
        nu = transport.nu(mesh, U)
        nu_eff = turb.nu_eff(mesh, ts, nu)
        UEqn = fvm.div(mesh, phi, U, kw["div_u"]) \
            + div_dev_reff(mesh, nu_eff, U, kw["lap_corr"],
                           turb_nl_stress(turb, mesh, ts, U))
        UEqn = kw["fv_options"](mesh, "U", UEqn, {"nu": nu})
        UEqn = UEqn.relax(mesh, kw["u_relax"])
        UEqn = kw["fv_options"].constrain(mesh, "U", UEqn)
        return UEqn, -fvc.grad(mesh, p)

    def grad_u(mesh, U):
        return fvc.grad(mesh, U)

    def grad_p(mesh, p):
        return fvc.grad(mesh, p)

    def turb_correct(mesh, U, phi, ts):
        nu = transport.nu(mesh, U)
        return turb.correct(mesh, ts, U, phi, nu)

    texts = {}
    texts["grad_p"] = report("fvc.grad(p) scalar", grad_p, mesh, p)
    texts["grad_U"] = report("fvc.grad(U) vector", grad_u, mesh, U)
    texts["assembly_U"] = report("assembly_U", u_asm, mesh, U, p, phi, ts)
    texts["turb"] = report("turb.correct", turb_correct, mesh, U, phi, ts)

    if args.dump:
        import os
        os.makedirs(args.dump, exist_ok=True)
        for k, t in texts.items():
            with open(os.path.join(args.dump, k + ".hlo"), "w") as f:
                f.write(t)
        print(f"dumped HLO to {args.dump}", file=sys.stderr)


if __name__ == "__main__":
    main()
