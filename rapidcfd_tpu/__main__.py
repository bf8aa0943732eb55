"""Solver dispatcher: `python -m rapidcfd_tpu [-case DIR] [solver]`.

Without an explicit solver name, reads `application` from
system/controlDict (the reference's convention) and runs the matching
solver.
"""

from __future__ import annotations

import argparse
import os
import sys

SOLVERS = {
    "icoFoam": ("rapidcfd_tpu.solvers.icofoam", {}),
    "nonNewtonianIcoFoam": ("rapidcfd_tpu.solvers.icofoam",
                            {"non_newtonian": True}),
    "electrostaticFoam": ("rapidcfd_tpu.solvers.electromagnetics",
                          {"_fn": "run_electrostatic_foam"}),
    "mhdFoam": ("rapidcfd_tpu.solvers.electromagnetics",
                {"_fn": "run_mhd_foam"}),
    "magneticFoam": ("rapidcfd_tpu.solvers.electromagnetics",
                     {"_fn": "run_magnetic_foam"}),
    "shallowWaterFoam": ("rapidcfd_tpu.solvers.shallowwater", {}),
    "solidDisplacementFoam": ("rapidcfd_tpu.solvers.soliddisplacement",
                              {}),
    "solidEquilibriumDisplacementFoam": (
        "rapidcfd_tpu.solvers.soliddisplacement",
        {"_fn": "run_equilibrium"}),
    "simpleFoam": ("rapidcfd_tpu.solvers.simplefoam", {}),
    # porous* variants = the base solver + explicitPorositySource /
    # porosityModel entries in system/fvOptions (reference:
    # porousSimpleFoam reads constant/porosityProperties; cases using
    # fvOptions run unchanged)
    "porousSimpleFoam": ("rapidcfd_tpu.solvers.simplefoam", {}),
    "porousInterFoam": ("rapidcfd_tpu.solvers.interfoam", {}),
    "rhoPorousSimpleFoam": ("rapidcfd_tpu.solvers.rhosimplefoam", {}),
    "adjointShapeOptimizationFoam": (
        "rapidcfd_tpu.solvers.adjointshapeopt", {}),
    "pimpleFoam": ("rapidcfd_tpu.solvers.pimplefoam", {}),
    "pimpleDyMFoam": ("rapidcfd_tpu.solvers.pimpledymfoam", {}),
    "SRFSimpleFoam": ("rapidcfd_tpu.solvers.srffoam", {}),
    "SRFPimpleFoam": ("rapidcfd_tpu.solvers.srffoam",
                      {"_fn": "run_pimple"}),
    "pisoFoam": ("rapidcfd_tpu.solvers.pimplefoam", {"piso_mode": True}),
    "sonicFoam": ("rapidcfd_tpu.solvers.sonicfoam", {}),
    "sonicDyMFoam": ("rapidcfd_tpu.solvers.dymfoams",
                     {"_fn": "run_sonic_dym"}),
    "sonicLiquidFoam": ("rapidcfd_tpu.solvers.sonicliquidfoam", {}),
    "rhoSimpleFoam": ("rapidcfd_tpu.solvers.rhosimplefoam", {}),
    "rhoSimplecFoam": ("rapidcfd_tpu.solvers.rhosimplefoam",
                       {"consistent": True}),
    "rhoPimpleFoam": ("rapidcfd_tpu.solvers.rhopimplefoam", {}),
    "rhoPimplecFoam": ("rapidcfd_tpu.solvers.rhopimplefoam",
                       {"consistent": True}),
    "rhoPimpleDyMFoam": ("rapidcfd_tpu.solvers.rhopimpledymfoam", {}),
    "reactingFoam": ("rapidcfd_tpu.solvers.reactingfoam", {}),
    "rhoLTSPimpleFoam": ("rapidcfd_tpu.solvers.rhopimplefoam",
                         {"lts": True}),
    "rhoCentralFoam": ("rapidcfd_tpu.solvers.rhocentralfoam", {}),
    "rhoCentralDyMFoam": ("rapidcfd_tpu.solvers.rhocentralfoam",
                          {"dym": True}),
    "interFoam": ("rapidcfd_tpu.solvers.interfoam", {}),
    "interDyMFoam": ("rapidcfd_tpu.solvers.interdymfoam", {}),
    "LTSInterFoam": ("rapidcfd_tpu.solvers.interfoam", {"lts": True}),
    "twoLiquidMixingFoam": ("rapidcfd_tpu.solvers.interfoam",
                            {"mixing": True}),
    "interMixingFoam": ("rapidcfd_tpu.solvers.intermixingfoam", {}),
    "interPhaseChangeFoam": ("rapidcfd_tpu.solvers.interphasechangefoam",
                             {}),
    "interPhaseChangeDyMFoam": (
        "rapidcfd_tpu.solvers.interphasechangefoam", {"dym": True}),
    "cavitatingFoam": ("rapidcfd_tpu.solvers.cavitatingfoam", {}),
    "cavitatingDyMFoam": ("rapidcfd_tpu.solvers.cavitatingfoam",
                          {"dym": True}),
    "compressibleInterFoam": (
        "rapidcfd_tpu.solvers.compressibleinterfoam", {}),
    "compressibleInterDyMFoam": (
        "rapidcfd_tpu.solvers.compressibleinterfoam", {"dym": True}),
    "twoPhaseEulerFoam": ("rapidcfd_tpu.solvers.twophaseeulerfoam", {}),
    "compressibleMultiphaseInterFoam": (
        "rapidcfd_tpu.solvers.compressiblemultiphaseinterfoam", {}),
    "multiphaseEulerFoam": (
        "rapidcfd_tpu.solvers.multiphaseeulerfoam", {}),
    "potentialFreeSurfaceFoam": (
        "rapidcfd_tpu.solvers.potentialfreesurfacefoam", {}),
    "potentialFreeSurfaceDyMFoam": (
        "rapidcfd_tpu.solvers.potentialfreesurfacefoam", {"dym": True}),
    "driftFluxFoam": ("rapidcfd_tpu.solvers.driftfluxfoam", {}),
    "multiphaseInterFoam": ("rapidcfd_tpu.solvers.multiphaseinterfoam",
                            {}),
    "multiphaseInterDyMFoam": (
        "rapidcfd_tpu.solvers.multiphaseinterfoam", {"dym": True}),
    "buoyantBoussinesqSimpleFoam": ("rapidcfd_tpu.solvers.buoyantfoam", {}),
    "buoyantBoussinesqPimpleFoam": ("rapidcfd_tpu.solvers.buoyantfoam",
                                    {"transient": True}),
    "buoyantSimpleFoam": ("rapidcfd_tpu.solvers.buoyantsimplefoam", {}),
    "buoyantPimpleFoam": ("rapidcfd_tpu.solvers.buoyantpimplefoam", {}),
    "thermoFoam": ("rapidcfd_tpu.solvers.thermofoam", {}),
    "chtMultiRegionFoam": ("rapidcfd_tpu.solvers.chtmultiregionfoam",
                           {}),
    "chtMultiRegionSimpleFoam": (
        "rapidcfd_tpu.solvers.chtmultiregionfoam", {"steady": True}),
    "laplacianFoam": ("rapidcfd_tpu.solvers.basic",
                      {"_fn": "run_laplacian_foam"}),
    "scalarTransportFoam": ("rapidcfd_tpu.solvers.basic",
                            {"_fn": "run_scalar_transport_foam"}),
    "potentialFoam": ("rapidcfd_tpu.solvers.basic",
                      {"_fn": "run_potential_foam"}),
}


# Thermo-based solvers carry absolute SI pressures (~1e5 Pa) whose
# dynamic part is below fp32 resolution; they default to fp64 (the
# reference is all-double). Override with -precision fp32.
#: solvers still DEFAULTING to emulated fp64 on TPU (-precision fp32
#: overrides). rhoSimpleFoam/rhoSimplecFoam and sonicFoam run fp32 by
#: default: deviation-form pressure (fields.field.shift_level) +
#: delta-form Krylov (linalg/solvers.py) hold them to fp64-trajectory
#: agreement (tests/test_compressible_fp32.py).
#: rhoPimpleFoam/rhoPimplecFoam left X64_DEFAULT in r5: deviation-form
#: p + the p_offset*ddt(psi) compressibility source hold them to
#: fp64-trajectory agreement (tests/test_compressible_fp32.py::
#: test_rhopimplefoam_fp32_tracks_fp64).
X64_DEFAULT = {
    "rhoPimpleDyMFoam", "sonicDyMFoam", "sonicLiquidFoam",
    "rhoCentralFoam", "rhoCentralDyMFoam",
    "buoyantSimpleFoam", "buoyantPimpleFoam", "thermoFoam",
    "compressibleInterFoam", "compressibleInterDyMFoam",
    "twoPhaseEulerFoam",
    "compressibleMultiphaseInterFoam", "multiphaseEulerFoam",
}


def main(argv=None):
    ap = argparse.ArgumentParser(prog="rapidcfd_tpu")
    ap.add_argument("solver", nargs="?", default=None,
                    help="solver name (default: controlDict application)")
    ap.add_argument("-case", dest="case", default=".")
    ap.add_argument("-noWrite", action="store_true")
    ap.add_argument("-precision", choices=["fp32", "fp64"], default=None,
                    help="override the solver's default float width")
    args = ap.parse_args(argv)

    name = args.solver
    if name is None:
        from rapidcfd_tpu.utils.dictionary import parse_file
        cd = parse_file(os.path.join(args.case, "system", "controlDict"))
        name = cd.word("application")
    if name not in SOLVERS:
        known = ", ".join(sorted(SOLVERS))
        sys.exit(f"unknown solver '{name}'. Available: {known}")
    prec = args.precision or ("fp64" if name in X64_DEFAULT else "fp32")
    if prec == "fp64":
        import jax
        jax.config.update("jax_enable_x64", True)
    mod_name, kw = SOLVERS[name]
    import importlib
    mod = importlib.import_module(mod_name)
    kw = dict(kw)
    fn = getattr(mod, kw.pop("_fn", "run"))
    fn(args.case, write=not args.noWrite, **kw)


if __name__ == "__main__":
    main()
