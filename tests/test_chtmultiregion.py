"""chtMultiRegionFoam: fluid cavity conjugately coupled to a heated
solid slab through a mappedWall interface."""

import os

import numpy as np
import pytest

from rapidcfd_tpu.mesh.polymesh import write_polymesh
from rapidcfd_tpu.utils import logging as L
from rapidcfd_tpu.utils.casegen import _write, box_mesh, write_field
from rapidcfd_tpu.utils.dictionary import foamfile_header

_EMPTY = "        type            empty;\n"
_ZG = "        type            zeroGradient;\n"


def _fv(v):
    return ("        type            fixedValue;\n"
            f"        value           uniform {v};\n")


def _add_mapped(bfile, patch, region, spatch):
    s = open(bfile).read()
    old = f"""    {patch}
    {{
        type            mappedWall;"""
    new = f"""    {patch}
    {{
        type            mappedWall;
        sampleMode      nearestPatchFace;
        sampleRegion    {region};
        samplePatch     {spatch};"""
    assert old in s, s
    open(bfile, "w").write(s.replace(old, new))


def _build_cht_case(d):
    # fluid region: [0,0.05]^2 cavity; solid region: slab x in [0.05,0.08]
    fmesh = box_mesh(10, 10, 1, size=(0.05, 0.05, 0.01), patch_spec={
        "xmin": ("coldWall", "wall"),
        "xmax": ("fluid_to_solid", "mappedWall"),
        "ymin": ("walls", "wall"), "ymax": ("walls", "wall"),
        "zmin": ("fb", "empty"), "zmax": ("fb", "empty")})
    smesh = box_mesh(6, 10, 1, size=(0.03, 0.05, 0.01),
                     origin=(0.05, 0.0, 0.0), patch_spec={
        "xmin": ("solid_to_fluid", "mappedWall"),
        "xmax": ("hotWall", "wall"),
        "ymin": ("sides", "wall"), "ymax": ("sides", "wall"),
        "zmin": ("fb", "empty"), "zmax": ("fb", "empty")})
    write_polymesh(fmesh, d, region="fluid")
    write_polymesh(smesh, d, region="solid")
    _add_mapped(os.path.join(d, "constant", "fluid", "polyMesh",
                             "boundary"), "fluid_to_solid", "solid",
                "solid_to_fluid")
    _add_mapped(os.path.join(d, "constant", "solid", "polyMesh",
                             "boundary"), "solid_to_fluid", "fluid",
                "fluid_to_solid")
    _write(os.path.join(d, "constant", "regionProperties"),
           foamfile_header("dictionary", "regionProperties", "constant"),
           "\nregions ( fluid (fluid) solid (solid) );\n")
    _write(os.path.join(d, "system", "controlDict"),
           foamfile_header("dictionary", "controlDict", "system"), """
application chtMultiRegionFoam; startFrom startTime; startTime 0;
stopAt endTime; endTime 0.3; deltaT 0.01;
writeControl timeStep; writeInterval 1000; writeFormat ascii;
""")
    schemes = """
ddtSchemes { default Euler; }
gradSchemes { default Gauss linear; }
divSchemes { default none; div(phi,U) Gauss upwind;
             div(phi,T) Gauss upwind; }
laplacianSchemes { default Gauss linear orthogonal; }
interpolationSchemes { default linear; }
snGradSchemes { default orthogonal; }
"""
    for rn in ("fluid", "solid"):
        _write(os.path.join(d, "system", rn, "fvSchemes"),
               foamfile_header("dictionary", "fvSchemes", "system"),
               schemes)
    _write(os.path.join(d, "system", "fluid", "fvSolution"),
           foamfile_header("dictionary", "fvSolution", "system"), """
solvers
{
    p_rgh { solver PCG; preconditioner DIC; tolerance 1e-08;
            relTol 0.01; }
    p_rghFinal { solver PCG; preconditioner DIC; tolerance 1e-08;
                 relTol 0; }
    "(U|T)" { solver smoothSolver; smoother symGaussSeidel;
              tolerance 1e-08; relTol 0; }
    "(U|T)Final" { solver smoothSolver; smoother symGaussSeidel;
                   tolerance 1e-08; relTol 0; }
}
PIMPLE { nOuterCorrectors 1; nCorrectors 2;
         nNonOrthogonalCorrectors 0; }
""")
    _write(os.path.join(d, "system", "solid", "fvSolution"),
           foamfile_header("dictionary", "fvSolution", "system"), """
solvers
{
    T { solver PCG; preconditioner DIC; tolerance 1e-09; relTol 0; }
}
""")
    _write(os.path.join(d, "constant", "fluid", "transportProperties"),
           foamfile_header("dictionary", "transportProperties",
                           "constant"), """
transportModel Newtonian;
nu              nu [0 2 -1 0 0 0 0] 1.5e-05;
beta            beta [0 0 0 -1 0 0 0] 3e-03;
TRef            TRef [0 0 0 1 0 0 0] 300;
Pr              Pr [0 0 0 0 0 0 0] 0.7;
Prt             Prt [0 0 0 0 0 0 0] 0.85;
""")
    _write(os.path.join(d, "constant", "fluid", "RASProperties"),
           foamfile_header("dictionary", "RASProperties", "constant"),
           "\nRASModel laminar;\nturbulence off;\n")
    _write(os.path.join(d, "constant", "fluid", "g"),
           foamfile_header("uniformDimensionedVectorField", "g",
                           "constant"),
           "\ndimensions      [0 1 -2 0 0 0 0];\nvalue           "
           "(0 -9.81 0);\n")
    _write(os.path.join(d, "constant", "solid", "transportProperties"),
           foamfile_header("dictionary", "transportProperties",
                           "constant"), """
rho             rho [1 -3 0 0 0 0 0] 8000;
Cp              Cp [0 2 -2 -1 0 0 0] 450;
kappa           kappa [1 1 -3 -1 0 0 0] 80;
""")
    cpl = ("        type            "
           "compressible::turbulentTemperatureCoupledBaffleMixed;\n"
           "        Tnbr            T;\n"
           "        value           uniform 300;\n")
    write_field(d, "0/fluid", "T", "volScalarField", "[0 0 0 1 0 0 0]",
                "uniform 300", {
                    "coldWall": _fv(300), "fluid_to_solid": cpl,
                    "walls": _ZG, "fb": _EMPTY})
    write_field(d, "0/fluid", "U", "volVectorField", "[0 1 -1 0 0 0 0]",
                "uniform (0 0 0)", {
                    "coldWall": _fv("(0 0 0)"),
                    "fluid_to_solid": _fv("(0 0 0)"),
                    "walls": _fv("(0 0 0)"), "fb": _EMPTY})
    write_field(d, "0/fluid", "p_rgh", "volScalarField",
                "[0 2 -2 0 0 0 0]", "uniform 0", {
                    "coldWall": _ZG, "fluid_to_solid": _ZG,
                    "walls": _ZG, "fb": _EMPTY})
    write_field(d, "0/solid", "T", "volScalarField", "[0 0 0 1 0 0 0]",
                "uniform 350", {
                    "solid_to_fluid": cpl.replace("uniform 300",
                                                  "uniform 350"),
                    "hotWall": _fv(350), "sides": _ZG, "fb": _EMPTY})
    return d


def _check_cht(regions):
    tf = np.asarray(regions["fluid"].T.data)
    ts = np.asarray(regions["solid"].T.data)
    assert np.isfinite(tf).all() and np.isfinite(ts).all()
    # heat crossed the interface: fluid warms above 300 near the wall,
    # solid interface cells cool below 350
    Cf = np.asarray(regions["fluid"].case.mesh.C)
    Cs = np.asarray(regions["solid"].case.mesh.C)
    near_f = Cf[:, 0] > 0.045
    # the metal slab (fixed 350 at the back, kappa >> kappa_fluid)
    # pins the interface near 350: the fluid heats up strongly there
    assert tf[near_f].max() > 310.0
    # everything bounded by the two driving temperatures
    assert (tf >= 300 - 1e-6).all() and (tf <= 350 + 1e-6).all()
    assert (ts >= 300 - 1e-6).all() and (ts <= 350 + 1e-6).all()
    # interface temperatures from both sides agree reasonably
    fb = np.asarray(regions["fluid"].T.bvalues)
    sb = np.asarray(regions["solid"].T.bvalues)
    fpatch = next(p for p in regions["fluid"].case.mesh.patches
                  if p.name == "fluid_to_solid")
    spatch = next(p for p in regions["solid"].case.mesh.patches
                  if p.name == "solid_to_fluid")
    t_if = fb[fpatch.bstart:fpatch.bstart + fpatch.size]
    t_is = sb[spatch.bstart:spatch.bstart + spatch.size]
    assert abs(np.sort(t_if).mean() - np.sort(t_is).mean()) < 5.0


def test_cht_fluid_solid_slab(tmp_path_factory):
    d = _build_cht_case(str(tmp_path_factory.mktemp("cht")))
    L.Info.enabled = False
    try:
        from rapidcfd_tpu.solvers.chtmultiregionfoam import run
        regions = run(d, write=False)
    finally:
        L.Info.enabled = True
    _check_cht(regions)


def test_cht_simple_steady(tmp_path_factory):
    """chtMultiRegionSimpleFoam: the steady variant reaches the same
    conjugate equilibrium (reference: chtMultiRegionSimpleFoam/)."""
    d = _build_cht_case(str(tmp_path_factory.mktemp("chts")))
    _write(os.path.join(d, "system", "controlDict"),
           foamfile_header("dictionary", "controlDict", "system"), """
application chtMultiRegionSimpleFoam; startFrom startTime; startTime 0;
stopAt endTime; endTime 40; deltaT 1;
writeControl timeStep; writeInterval 1000; writeFormat ascii;
""")
    for rn in ("fluid", "solid"):
        _write(os.path.join(d, "system", rn, "fvSchemes"),
               foamfile_header("dictionary", "fvSchemes", "system"), """
ddtSchemes { default steadyState; }
gradSchemes { default Gauss linear; }
divSchemes { default none; div(phi,U) bounded Gauss upwind;
             div(phi,T) bounded Gauss upwind; }
laplacianSchemes { default Gauss linear orthogonal; }
interpolationSchemes { default linear; }
snGradSchemes { default orthogonal; }
""")
    _write(os.path.join(d, "system", "fluid", "fvSolution"),
           foamfile_header("dictionary", "fvSolution", "system"), """
solvers
{
    p_rgh { solver PCG; preconditioner DIC; tolerance 1e-08;
            relTol 0.01; }
    "(U|T)" { solver smoothSolver; smoother symGaussSeidel;
              tolerance 1e-08; relTol 0.1; }
}
SIMPLE { nNonOrthogonalCorrectors 0;
         residualControl { p_rgh 1e-6; U 1e-6; T 1e-6; } }
relaxationFactors
{
    fields    { p_rgh 0.7; }
    equations { U 0.3; T 0.7; }
}
""")
    L.Info.enabled = False
    try:
        from rapidcfd_tpu.solvers.chtmultiregionfoam import run
        regions = run(d, write=False, steady=True)
    finally:
        L.Info.enabled = True
    _check_cht(regions)
