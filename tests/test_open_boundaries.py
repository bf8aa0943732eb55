"""Open-boundary BCs: flowRateInletVelocity + totalPressure channel."""

import os

import numpy as np
import pytest

from rapidcfd_tpu.mesh.polymesh import write_polymesh
from rapidcfd_tpu.utils import logging as L
from rapidcfd_tpu.utils.casegen import _write, box_mesh, write_field
from rapidcfd_tpu.utils.dictionary import foamfile_header


def test_flowrate_inlet_total_pressure_outlet(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("open"))
    mesh = box_mesh(30, 8, 1, size=(0.3, 0.05, 0.01), patch_spec={
        "xmin": ("inlet", "patch"), "xmax": ("outlet", "patch"),
        "ymin": ("walls", "wall"), "ymax": ("walls", "wall"),
        "zmin": ("frontAndBack", "empty"),
        "zmax": ("frontAndBack", "empty")})
    write_polymesh(mesh, d)
    _write(os.path.join(d, "system", "controlDict"),
           foamfile_header("dictionary", "controlDict", "system"), """
application pimpleFoam; startFrom startTime; startTime 0;
stopAt endTime; endTime 0.05; deltaT 0.001;
writeControl timeStep; writeInterval 1000; writeFormat ascii;
""")
    _write(os.path.join(d, "system", "fvSchemes"),
           foamfile_header("dictionary", "fvSchemes", "system"), """
ddtSchemes { default Euler; }
gradSchemes { default Gauss linear; }
divSchemes { default none; div(phi,U) Gauss upwind; }
laplacianSchemes { default Gauss linear orthogonal; }
interpolationSchemes { default linear; }
snGradSchemes { default orthogonal; }
""")
    _write(os.path.join(d, "system", "fvSolution"),
           foamfile_header("dictionary", "fvSolution", "system"), """
solvers
{
    p { solver PCG; preconditioner DIC; tolerance 1e-07; relTol 0.01; }
    pFinal { solver PCG; preconditioner DIC; tolerance 1e-07; relTol 0; }
    U { solver smoothSolver; smoother symGaussSeidel; tolerance 1e-06;
        relTol 0; }
}
PIMPLE { nOuterCorrectors 1; nCorrectors 2;
         nNonOrthogonalCorrectors 0; momentumPredictor yes; }
""")
    _write(os.path.join(d, "constant", "transportProperties"),
           foamfile_header("dictionary", "transportProperties", "constant"),
           "\nnu              nu [0 2 -1 0 0 0 0] 1e-05;\n")
    _write(os.path.join(d, "constant", "RASProperties"),
           foamfile_header("dictionary", "RASProperties", "constant"),
           "\nRASModel laminar;\nturbulence off;\n")
    q = 5e-5  # m3/s
    write_field(d, "0", "U", "volVectorField", "[0 1 -1 0 0 0 0]",
                "uniform (0.1 0 0)", {
                    "inlet":
                        "        type            flowRateInletVelocity;\n"
                        f"        volumetricFlowRate {q};\n"
                        "        value           uniform (0.1 0 0);\n",
                    "outlet": "        type            zeroGradient;\n",
                    "walls": "        type            fixedValue;\n"
                             "        value           uniform (0 0 0);\n",
                    "frontAndBack": "        type            empty;\n"})
    write_field(d, "0", "p", "volScalarField", "[0 2 -2 0 0 0 0]",
                "uniform 0", {
                    "inlet": "        type            zeroGradient;\n",
                    "outlet": "        type            totalPressure;\n"
                              "        p0              uniform 0;\n"
                              "        value           uniform 0;\n",
                    "walls": "        type            zeroGradient;\n",
                    "frontAndBack": "        type            empty;\n"})
    L.Info.enabled = False
    from rapidcfd_tpu.solvers import pimplefoam
    case, U, p, phi, ts = pimplefoam.run(d, write=False)
    L.Info.enabled = True
    u = np.asarray(U.data)
    assert np.isfinite(u).all()
    # mass conservation through the open boundaries: outlet flux == Q
    mesh_a = case.mesh
    for patch in mesh_a.patches:
        sl = slice(patch.start, patch.start + patch.size)
        flux = float(np.asarray(phi.data[sl]).sum())
        if patch.name == "inlet":
            assert abs(flux + q) < 0.02 * q   # inflow: -Q
        if patch.name == "outlet":
            assert abs(flux - q) < 0.02 * q   # outflow: +Q
    # fully developed channel: centreline velocity ~ 1.5 * bulk
    bulk = q / (0.05 * 0.01)
    assert 1.0 * bulk < np.abs(u[:, 0]).max() < 2.0 * bulk


def test_bc_zoo_channel(tmp_path_factory):
    """New boundary types together: freestream velocity + outletInlet +
    movingWallVelocity + fixedFluxPressure parse, assemble and run."""
    d = str(tmp_path_factory.mktemp("zoo"))
    mesh = box_mesh(20, 6, 1, size=(0.2, 0.05, 0.01), patch_spec={
        "xmin": ("inlet", "patch"), "xmax": ("outlet", "patch"),
        "ymin": ("belt", "wall"), "ymax": ("top", "wall"),
        "zmin": ("frontAndBack", "empty"),
        "zmax": ("frontAndBack", "empty")})
    write_polymesh(mesh, d)
    _write(os.path.join(d, "system", "controlDict"),
           foamfile_header("dictionary", "controlDict", "system"), """
application pimpleFoam; startFrom startTime; startTime 0;
stopAt endTime; endTime 0.02; deltaT 0.001;
writeControl timeStep; writeInterval 1000; writeFormat ascii;
""")
    _write(os.path.join(d, "system", "fvSchemes"),
           foamfile_header("dictionary", "fvSchemes", "system"), """
ddtSchemes { default Euler; }
gradSchemes { default Gauss linear; }
divSchemes { default none; div(phi,U) Gauss upwind; }
laplacianSchemes { default Gauss linear orthogonal; }
interpolationSchemes { default linear; }
snGradSchemes { default orthogonal; }
""")
    _write(os.path.join(d, "system", "fvSolution"),
           foamfile_header("dictionary", "fvSolution", "system"), """
solvers
{
    p { solver PCG; preconditioner DIC; tolerance 1e-07; relTol 0.01; }
    pFinal { solver PCG; preconditioner DIC; tolerance 1e-07; relTol 0; }
    U { solver smoothSolver; smoother symGaussSeidel; tolerance 1e-07;
        relTol 0; }
    UFinal { solver smoothSolver; smoother symGaussSeidel;
             tolerance 1e-07; relTol 0; }
}
PIMPLE { nOuterCorrectors 1; nCorrectors 2;
         nNonOrthogonalCorrectors 0; momentumPredictor yes; }
""")
    _write(os.path.join(d, "constant", "transportProperties"),
           foamfile_header("dictionary", "transportProperties", "constant"),
           "\nnu              nu [0 2 -1 0 0 0 0] 1e-04;\n")
    write_field(d, "0", "U", "volVectorField", "[0 1 -1 0 0 0 0]",
                "uniform (0.5 0 0)", {
                    "inlet": "        type            freestream;\n"
                             "        freestreamValue uniform (0.5 0 0);\n"
                             "        value           uniform (0.5 0 0);\n",
                    "outlet": "        type            outletInlet;\n"
                              "        outletValue     uniform (0.5 0 0);\n"
                              "        value           uniform (0.5 0 0);\n",
                    "belt": "        type            movingWallVelocity;\n"
                            "        value           uniform (0.2 0.3 0);\n",
                    "top": "        type            uniformFixedValue;\n"
                           "        uniformValue    (0 0 0);\n"
                           "        value           uniform (0 0 0);\n",
                    "frontAndBack": "        type            empty;\n"})
    write_field(d, "0", "p", "volScalarField", "[0 2 -2 0 0 0 0]",
                "uniform 0", {
                    "inlet": "        type            fixedFluxPressure;\n",
                    "outlet": "        type            fixedValue;\n"
                              "        value           uniform 0;\n",
                    "belt": "        type            fixedFluxPressure;\n",
                    "top": "        type            zeroGradient;\n",
                    "frontAndBack": "        type            empty;\n"})
    L.Info.enabled = False
    from rapidcfd_tpu.solvers import pimplefoam
    case, U, p, phi, ts = pimplefoam.run(d, write=False)
    L.Info.enabled = True
    u = np.asarray(U.data)
    assert np.isfinite(u).all()
    assert np.abs(u).max() < 3.0
    # the moving belt drags tangentially but passes zero normal flux
    for patch in case.mesh.patches:
        if patch.name == "belt":
            sl = slice(patch.start, patch.start + patch.size)
            assert np.abs(np.asarray(phi.data[sl])).max() < 1e-10
            bsl = slice(patch.bstart, patch.bstart + patch.size)
            ub = np.asarray(U.bvalues[bsl])
            assert abs(ub[:, 0].mean() - 0.2) < 1e-12   # tangential kept
            assert np.abs(ub[:, 1]).max() < 1e-12       # normal removed
