"""Basic solver family: laplacianFoam, scalarTransportFoam, pisoFoam."""

import os

import numpy as np
import pytest

from rapidcfd_tpu.utils import logging as L
from rapidcfd_tpu.utils.casegen import _write, cavity_case, write_field
from rapidcfd_tpu.utils.dictionary import foamfile_header


@pytest.fixture(scope="module")
def thermal_cavity(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("thermal"))
    cavity_case(d, end_time=0.05)
    _write(os.path.join(d, "constant", "transportProperties"),
           foamfile_header("dictionary", "transportProperties", "constant"),
           "\nDT              DT [ 0 2 -1 0 0 0 0 ] 0.01;\n"
           "nu              nu [ 0 2 -1 0 0 0 0 ] 0.01;\n")
    _write(os.path.join(d, "system", "fvSolution"),
           foamfile_header("dictionary", "fvSolution", "system"), """
solvers
{
    T { solver PCG; preconditioner DIC; tolerance 1e-08; relTol 0; }
    p { solver PCG; preconditioner DIC; tolerance 1e-06; relTol 0.05; }
    pFinal { solver PCG; preconditioner DIC; tolerance 1e-06; relTol 0; }
    U { solver smoothSolver; smoother symGaussSeidel; tolerance 1e-05;
        relTol 0; }
}
SIMPLE { nNonOrthogonalCorrectors 0; }
PISO { nCorrectors 2; nNonOrthogonalCorrectors 0; pRefCell 0;
       pRefValue 0; }
""")
    _write(os.path.join(d, "system", "fvSchemes"),
           foamfile_header("dictionary", "fvSchemes", "system"), """
ddtSchemes      { default Euler; }
gradSchemes     { default Gauss linear; }
divSchemes      { default none; div(phi,U) Gauss linear;
                  div(phi,T) Gauss vanLeer; }
laplacianSchemes { default Gauss linear orthogonal; }
interpolationSchemes { default linear; }
snGradSchemes   { default orthogonal; }
""")
    write_field(d, "0", "T", "volScalarField", "[0 0 0 1 0 0 0]",
                "uniform 300", {
                    "movingWall": "        type            fixedValue;\n"
                    "        value           uniform 350;\n",
                    "fixedWalls": "        type            fixedValue;\n"
                    "        value           uniform 300;\n",
                    "frontAndBack": "        type            empty;\n"})
    return d


def test_laplacian_foam_bounded(thermal_cavity):
    L.Info.enabled = False
    from rapidcfd_tpu.solvers.basic import run_laplacian_foam
    case, T = run_laplacian_foam(thermal_cavity, max_steps=10, write=False)
    L.Info.enabled = True
    t = np.asarray(T.data)
    assert np.isfinite(t).all()
    # diffusion is monotone: stays within boundary values
    assert t.min() >= 300.0 - 1e-9 and t.max() <= 350.0 + 1e-9
    # heat actually propagated in from the hot lid
    assert t.max() > 310.0


def test_scalar_transport_foam_tvd_bounded(thermal_cavity):
    d = thermal_cavity
    write_field(d, "0", "U", "volVectorField", "[0 1 -1 0 0 0 0]",
                "uniform (0.5 0 0)", {
                    "movingWall": "        type            fixedValue;\n"
                    "        value           uniform (0.5 0 0);\n",
                    "fixedWalls": "        type            fixedValue;\n"
                    "        value           uniform (0.5 0 0);\n",
                    "frontAndBack": "        type            empty;\n"})
    L.Info.enabled = False
    from rapidcfd_tpu.solvers.basic import run_scalar_transport_foam
    case, T = run_scalar_transport_foam(d, max_steps=5, write=False)
    L.Info.enabled = True
    t = np.asarray(T.data)
    assert np.isfinite(t).all()
    assert t.min() >= 300.0 - 1e-6 and t.max() <= 350.0 + 1e-6


def test_pisofoam_laminar_close_to_icofoam(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("piso"))
    cavity_case(d, end_time=0.05)
    _write(os.path.join(d, "constant", "RASProperties"),
           foamfile_header("dictionary", "RASProperties", "constant"),
           "\nRASModel        laminar;\nturbulence      off;\n")
    L.Info.enabled = False
    from rapidcfd_tpu.solvers import icofoam, pimplefoam
    _, U_piso, _, _, _ = pimplefoam.run(d, max_steps=10, write=False,
                                        piso_mode=True)
    d2 = str(tmp_path_factory.mktemp("ico"))
    cavity_case(d2, end_time=0.05)
    _, U_ico, _, _ = icofoam.run(d2, max_steps=10, write=False)
    L.Info.enabled = True
    # differ only by the explicit dev(T(grad U)) stress term
    du = np.abs(np.asarray(U_piso.data) - np.asarray(U_ico.data)).max()
    assert du < 0.1
    assert np.isfinite(np.asarray(U_piso.data)).all()
