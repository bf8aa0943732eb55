"""shallowWaterFoam (sloshing basin) + solidDisplacementFoam (bar)."""

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


def test_shallow_water_sloshing(tmp_path_factory):
    """Closed basin with an initial surface tilt: water volume conserved,
    height stays positive, wave sloshes (height field evolves)."""
    d = str(tmp_path_factory.mktemp("swe"))
    mesh = box_mesh(40, 1, 1, size=(10.0, 0.5, 0.1), patch_spec={
        "xmin": ("left", "wall"), "xmax": ("right", "wall"),
        "ymin": ("sides", "empty"), "ymax": ("sides", "empty"),
        "zmin": ("fb", "empty"), "zmax": ("fb", "empty")})
    write_polymesh(mesh, d)
    _write(os.path.join(d, "system", "controlDict"),
           foamfile_header("dictionary", "controlDict", "system"), """
application shallowWaterFoam; startFrom startTime; startTime 0;
stopAt endTime; endTime 1.0; deltaT 0.01;
writeControl timeStep; writeInterval 1000; writeFormat ascii;
""")
    _write(os.path.join(d, "system", "fvSchemes"),
           foamfile_header("dictionary", "fvSchemes", "system"), """
ddtSchemes { default Euler; }
gradSchemes { default Gauss linear; }
divSchemes { default none; div(phiv,hU) Gauss upwind; }
laplacianSchemes { default Gauss linear orthogonal; }
interpolationSchemes { default linear; }
snGradSchemes { default orthogonal; }
""")
    _write(os.path.join(d, "system", "fvSolution"),
           foamfile_header("dictionary", "fvSolution", "system"), """
solvers
{
    h      { solver PCG; preconditioner DIC; tolerance 1e-10; relTol 0.01; }
    hFinal { solver PCG; preconditioner DIC; tolerance 1e-10; relTol 0; }
    hU     { solver PBiCGStab; preconditioner DILU; tolerance 1e-08;
             relTol 0; }
}
PIMPLE { nOuterCorrectors 1; nCorrectors 2;
         nNonOrthogonalCorrectors 0; momentumPredictor yes; }
""")
    _write(os.path.join(d, "constant", "gravitationalProperties"),
           foamfile_header("dictionary", "gravitationalProperties",
                           "constant"),
           "\ng               g [0 1 -2 0 0 0 0] (0 0 -9.81);\n"
           "rotating        off;\n")
    # tilted initial surface: h = 1 + 0.1*x/L
    from rapidcfd_tpu.mesh.geometry import (cell_centres_and_vols,
                                            face_centres_and_areas)
    Cf, Sf = face_centres_and_areas(mesh)
    C, V = cell_centres_and_vols(mesh, Cf, Sf)
    h_init = 1.0 + 0.1 * (C[:, 0] / 10.0 - 0.5)
    from rapidcfd_tpu.fields.io import _body_value
    write_field(d, "0", "h", "volScalarField", "[0 1 0 0 0 0 0]",
                _body_value(h_init, prec=10),
                {"left": _ZG, "right": _ZG, "sides": _EMPTY, "fb": _EMPTY})
    write_field(d, "0", "hU", "volVectorField", "[0 2 -1 0 0 0 0]",
                "uniform (0 0 0)", {
                    "left": _fv("(0 0 0)"), "right": _fv("(0 0 0)"),
                    "sides": _EMPTY, "fb": _EMPTY})
    L.Info.enabled = False
    from rapidcfd_tpu.solvers.shallowwater import run
    case, h, hU, phi = run(d, write=False)
    L.Info.enabled = True
    hv = np.asarray(h.data)
    assert np.isfinite(hv).all()
    assert (hv > 0.5).all() and (hv < 1.5).all()
    # water volume conserved through the walls
    V_d = np.asarray(case.mesh.V)
    C_d = np.asarray(case.mesh.C)
    h0 = 1.0 + 0.1 * (C_d[:, 0] / 10.0 - 0.5)
    assert abs((hv * V_d).sum() - (h0 * V_d).sum()) \
        < 1e-9 * (h0 * V_d).sum()
    # the wave actually moved (gravity current from the tilt)
    assert np.abs(hv - h0).max() > 0.01


def test_solid_displacement_bar(tmp_path_factory):
    """Stretched elastic bar: fixed at x=0, pulled to a prescribed
    displacement at x=L -> linear displacement profile at steady state."""
    d = str(tmp_path_factory.mktemp("bar"))
    mesh = box_mesh(20, 4, 1, size=(1.0, 0.1, 0.02), patch_spec={
        "xmin": ("fixed", "patch"), "xmax": ("pulled", "patch"),
        "ymin": ("free", "patch"), "ymax": ("free", "patch"),
        "zmin": ("fb", "empty"), "zmax": ("fb", "empty")})
    write_polymesh(mesh, d)
    _write(os.path.join(d, "system", "controlDict"),
           foamfile_header("dictionary", "controlDict", "system"), """
application solidDisplacementFoam; startFrom startTime; startTime 0;
stopAt endTime; endTime 40; deltaT 1;
writeControl timeStep; writeInterval 1000; writeFormat ascii;
""")
    _write(os.path.join(d, "system", "fvSchemes"),
           foamfile_header("dictionary", "fvSchemes", "system"), """
ddtSchemes { default Euler; }
d2dt2Schemes { default Euler; }
gradSchemes { default Gauss linear; }
divSchemes { default none; div(sigmaD) Gauss linear; }
laplacianSchemes { default Gauss linear corrected; }
interpolationSchemes { default linear; }
snGradSchemes { default corrected; }
""")
    _write(os.path.join(d, "system", "fvSolution"),
           foamfile_header("dictionary", "fvSolution", "system"), """
solvers
{
    D { solver PCG; preconditioner DIC; tolerance 1e-09; relTol 0; }
}
stressAnalysis
{
    nCorrectors     2;
    D               1e-08;
}
""")
    _write(os.path.join(d, "constant", "mechanicalProperties"),
           foamfile_header("dictionary", "mechanicalProperties",
                           "constant"), """
rho             rho [1 -3 0 0 0 0 0] 7854;
E               E [1 -1 -2 0 0 0 0] 2e11;
nu              nu [0 0 0 0 0 0 0] 0.0;
planeStress     yes;
""")
    write_field(d, "0", "D", "volVectorField", "[0 1 0 0 0 0 0]",
                "uniform (0 0 0)", {
                    "fixed": _fv("(0 0 0)"),
                    "pulled": _fv("(0.001 0 0)"),
                    "free": _ZG, "fb": _EMPTY})
    L.Info.enabled = False
    from rapidcfd_tpu.solvers.soliddisplacement import run
    case, D, T = run(d, write=False)
    L.Info.enabled = True
    dd = np.asarray(D.data)
    assert np.isfinite(dd).all()
    x = np.asarray(case.mesh.C)[:, 0]
    # linear axial stretch: Dx = 0.001 * x (nu=0 -> pure 1D)
    assert np.allclose(dd[:, 0], 0.001 * x, atol=5e-5)
    assert np.abs(dd[:, 1]).max() < 1e-4


def test_solid_equilibrium_displacement_bar(tmp_path_factory):
    """solidEquilibriumDisplacementFoam: a single displacement-driven
    correction (accFac=1) reproduces the elastostatic stretch; further
    zero-correction iterations leave it unchanged (traction-correction
    BCs deferred)."""
    d = str(tmp_path_factory.mktemp("bareq"))
    mesh = box_mesh(20, 4, 1, size=(1.0, 0.1, 0.02), patch_spec={
        "xmin": ("fixed", "patch"), "xmax": ("pulled", "patch"),
        "ymin": ("free", "patch"), "ymax": ("free", "patch"),
        "zmin": ("fb", "empty"), "zmax": ("fb", "empty")})
    write_polymesh(mesh, d)
    _write(os.path.join(d, "system", "controlDict"),
           foamfile_header("dictionary", "controlDict", "system"), """
application solidEquilibriumDisplacementFoam;
startFrom startTime; startTime 0; stopAt endTime; endTime 1; deltaT 1;
writeControl timeStep; writeInterval 1000; writeFormat ascii;
""")
    _write(os.path.join(d, "system", "fvSchemes"),
           foamfile_header("dictionary", "fvSchemes", "system"), """
ddtSchemes { default Euler; } d2dt2Schemes { default Euler; }
gradSchemes { default Gauss linear; }
divSchemes { default none; div(sigmaD) Gauss linear; }
laplacianSchemes { default Gauss linear corrected; }
interpolationSchemes { default linear; }
snGradSchemes { default corrected; }
""")
    _write(os.path.join(d, "system", "fvSolution"),
           foamfile_header("dictionary", "fvSolution", "system"), """
solvers
{
    D { solver PCG; preconditioner DIC; tolerance 1e-09; relTol 0; }
}
stressAnalysis { accelerationFactor 1.0; D 1e-10; }
""")
    _write(os.path.join(d, "constant", "mechanicalProperties"),
           foamfile_header("dictionary", "mechanicalProperties",
                           "constant"), """
rho rho [1 -3 0 0 0 0 0] 7854;
E E [1 -1 -2 0 0 0 0] 2e11;
nu nu [0 0 0 0 0 0 0] 0.0;
planeStress yes;
""")
    _fv = lambda v: ("        type            fixedValue;\n"
                     f"        value           uniform {v};\n")
    _zg = "        type            zeroGradient;\n"
    write_field(d, "0", "D", "volVectorField", "[0 1 0 0 0 0 0]",
                "uniform (0 0 0)", {
                    "fixed": _fv("(0 0 0)"), "pulled": _fv("(0 0 0)"),
                    "free": _zg,
                    "fb": "        type            empty;\n"})
    write_field(d, "0", "Dcorr", "volVectorField", "[0 1 0 0 0 0 0]",
                "uniform (0 0 0)", {
                    "fixed": _fv("(0 0 0)"),
                    "pulled": _fv("(0.001 0 0)"),
                    "free": _zg,
                    "fb": "        type            empty;\n"})
    L.Info.enabled = False
    from rapidcfd_tpu.solvers.soliddisplacement import run_equilibrium
    case, D = run_equilibrium(d, write=False, max_steps=1)
    L.Info.enabled = True
    dd = np.asarray(D.data)
    assert np.isfinite(dd).all()
    x = np.asarray(case.mesh.C)[:, 0]
    assert np.allclose(dd[:, 0], 0.001 * x, atol=5e-5)
