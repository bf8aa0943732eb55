"""adjointShapeOptimizationFoam: primal+adjoint duct with porosity
sensitivity (reference: applications/solvers/incompressible/
adjointShapeOptimizationFoam)."""

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


def test_adjoint_duct(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("adjoint"))
    mesh = box_mesh(30, 8, 1, size=(0.3, 0.05, 0.01), patch_spec={
        "xmin": ("inlet", "patch"), "xmax": ("outlet", "patch"),
        "ymin": ("walls", "wall"), "ymax": ("walls", "wall"),
        "zmin": ("frontAndBack", "empty"),
        "zmax": ("frontAndBack", "empty")})
    write_polymesh(mesh, d)
    _write(os.path.join(d, "system", "controlDict"),
           foamfile_header("dictionary", "controlDict", "system"), """
application adjointShapeOptimizationFoam;
startFrom startTime; startTime 0; stopAt endTime; endTime 40; deltaT 1;
writeControl timeStep; writeInterval 1000; writeFormat ascii;
""")
    _write(os.path.join(d, "system", "fvSchemes"),
           foamfile_header("dictionary", "fvSchemes", "system"), """
ddtSchemes { default steadyState; }
gradSchemes { default Gauss linear; }
divSchemes { default none; div(phi,U) bounded Gauss upwind;
             div(-phi,Ua) bounded Gauss upwind; }
laplacianSchemes { default Gauss linear orthogonal; }
interpolationSchemes { default linear; }
snGradSchemes { default orthogonal; }
""")
    _write(os.path.join(d, "system", "fvSolution"),
           foamfile_header("dictionary", "fvSolution", "system"), """
solvers
{
    "(p|pa)" { solver PCG; preconditioner DIC; tolerance 1e-08;
               relTol 0.01; }
    "(U|Ua)" { solver smoothSolver; smoother symGaussSeidel;
               tolerance 1e-08; relTol 0.1; }
}
SIMPLE { nNonOrthogonalCorrectors 0; pRefCell 0; pRefValue 0; }
relaxationFactors
{
    fields { p 0.3; pa 0.3; alpha 0.1; }
    equations { U 0.7; Ua 0.7; }
}
""")
    _write(os.path.join(d, "constant", "transportProperties"),
           foamfile_header("dictionary", "transportProperties", "constant"),
           """
transportModel Newtonian;
nu              nu [0 2 -1 0 0 0 0] 1e-05;
lambda          lambda [0 -4 1 0 0 0 0] 1e5;
alphaMax        alphaMax [0 0 -1 0 0 0 0] 200.0;
""")
    _write(os.path.join(d, "constant", "RASProperties"),
           foamfile_header("dictionary", "RASProperties", "constant"),
           "\nRASModel laminar;\nturbulence off;\n")
    write_field(d, "0", "U", "volVectorField", "[0 1 -1 0 0 0 0]",
                "uniform (0.5 0 0)", {
                    "inlet": _fv("(0.5 0 0)"),
                    "outlet": _ZG,
                    "walls": _fv("(0 0 0)"),
                    "frontAndBack": _EMPTY})
    write_field(d, "0", "p", "volScalarField", "[0 2 -2 0 0 0 0]",
                "uniform 0", {
                    "inlet": _ZG, "outlet": _fv(0),
                    "walls": _ZG, "frontAndBack": _EMPTY})
    write_field(d, "0", "Ua", "volVectorField", "[0 1 -1 0 0 0 0]",
                "uniform (0 0 0)", {
                    "inlet": _fv("(0.5 0 0)"),
                    "outlet":
                        "        type            adjointOutletVelocity;\n"
                        "        value           uniform (0 0 0);\n",
                    "walls": _fv("(0 0 0)"),
                    "frontAndBack": _EMPTY})
    write_field(d, "0", "pa", "volScalarField", "[0 2 -2 0 0 0 0]",
                "uniform 0", {
                    "inlet": _ZG,
                    "outlet":
                        "        type            adjointOutletPressure;\n"
                        "        value           uniform 0;\n",
                    "walls": _ZG, "frontAndBack": _EMPTY})
    L.Info.enabled = False
    from rapidcfd_tpu.solvers import adjointshapeopt
    case, U, p, Ua, pa, alpha = adjointshapeopt.run(d, write=False)
    L.Info.enabled = True
    u = np.asarray(U.data)
    ua = np.asarray(Ua.data)
    a = np.asarray(alpha)
    assert np.isfinite(u).all() and np.isfinite(ua).all()
    assert np.isfinite(np.asarray(p.data)).all()
    assert np.isfinite(np.asarray(pa.data)).all()
    # porosity bounded and clipped into [0, alphaMax]
    assert (a >= 0.0).all() and (a <= 200.0 + 1e-6).all()
    # inlet face-cells are never blocked (reference zeroes inletCells)
    inlet = next(pt for pt in case.mesh.patches if pt.name == "inlet")
    ic = np.asarray(case.mesh.patch_face_cells(inlet))
    assert np.abs(a[ic]).max() == 0.0
    # the adjoint field is alive (driven by the adjoint outlet BCs)
    assert np.abs(ua).max() > 1e-8
    # primal still a sane duct flow
    assert u[:, 0].mean() > 0.2
