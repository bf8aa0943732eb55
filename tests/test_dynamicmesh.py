"""Dynamic mesh: solidBodyMotionFvMesh + pimpleDyMFoam.

Galilean invariance check: a box translating rigidly at v with the
fluid initialised to U = v must stay exactly at U = v (phi_rel = 0);
the rotating variant must keep the flow finite and spin the near-wall
fluid with the mesh (movingWallVelocity).
"""

import math
import os

import numpy as np

from rapidcfd_tpu.utils import logging as L
from rapidcfd_tpu.utils.casegen import (_write, box_mesh, write_field,
                                        write_polymesh)
from rapidcfd_tpu.utils.dictionary import foamfile_header


def _dym_case(d, motion: str, u0="(1 0 0)"):
    mesh = box_mesh(12, 12, 1, size=(0.1, 0.1, 0.01),
                    origin=(-0.05, -0.05, 0.0), patch_spec={
                        "xmin": ("walls", "wall"),
                        "xmax": ("walls", "wall"),
                        "ymin": ("walls", "wall"),
                        "ymax": ("walls", "wall"),
                        "zmin": ("fb", "empty"),
                        "zmax": ("fb", "empty")})
    write_polymesh(mesh, d)
    _write(os.path.join(d, "system", "controlDict"),
           foamfile_header("dictionary", "controlDict", "system"), """
application pimpleDyMFoam; startFrom startTime; startTime 0;
stopAt endTime; endTime 0.05; deltaT 0.005;
writeControl timeStep; writeInterval 1000; writeFormat ascii;
""")
    _write(os.path.join(d, "system", "fvSchemes"),
           foamfile_header("dictionary", "fvSchemes", "system"), """
ddtSchemes { default Euler; }
gradSchemes { default Gauss linear; }
divSchemes { default none; div(phi,U) Gauss linear; }
laplacianSchemes { default Gauss linear orthogonal; }
interpolationSchemes { default linear; }
snGradSchemes { default orthogonal; }
""")
    _write(os.path.join(d, "system", "fvSolution"),
           foamfile_header("dictionary", "fvSolution", "system"), """
solvers
{
    p { solver PCG; preconditioner DIC; tolerance 1e-09; relTol 0; }
    pFinal { solver PCG; preconditioner DIC; tolerance 1e-09;
             relTol 0; }
    U { solver smoothSolver; smoother symGaussSeidel;
        tolerance 1e-09; relTol 0; }
    UFinal { solver smoothSolver; smoother symGaussSeidel;
             tolerance 1e-09; relTol 0; }
}
PIMPLE { nOuterCorrectors 1; nCorrectors 2;
         nNonOrthogonalCorrectors 0; pRefCell 0; pRefValue 0; }
""")
    _write(os.path.join(d, "constant", "transportProperties"),
           foamfile_header("dictionary", "transportProperties",
                           "constant"),
           "\nnu              nu [0 2 -1 0 0 0 0] 0.001;\n")
    _write(os.path.join(d, "constant", "RASProperties"),
           foamfile_header("dictionary", "RASProperties", "constant"),
           "\nRASModel        laminar;\nturbulence      off;\n")
    _write(os.path.join(d, "constant", "dynamicMeshDict"),
           foamfile_header("dictionary", "dynamicMeshDict",
                           "constant"), motion)
    write_field(d, "0", "p", "volScalarField", "[0 2 -2 0 0 0 0]",
                "uniform 0", {
                    "walls": "        type            zeroGradient;\n",
                    "fb": "        type            empty;\n"})
    write_field(d, "0", "U", "volVectorField", "[0 1 -1 0 0 0 0]",
                f"uniform {u0}", {
                    "walls":
                        "        type            movingWallVelocity;\n"
                        f"        value           uniform {u0};\n",
                    "fb": "        type            empty;\n"})


def test_translating_box_galilean(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("dymt"))
    _dym_case(d, """
dynamicFvMesh   solidBodyMotionFvMesh;
solidBodyMotionFvMeshCoeffs
{
    solidBodyMotionFunction linearMotion;
    linearMotionCoeffs { velocity (1 0 0); }
}
""", u0="(1 0 0)")
    L.Info.enabled = False
    try:
        from rapidcfd_tpu.solvers import pimpledymfoam
        case, U, p, phi, _ = pimpledymfoam.run(d, write=False,
                                               max_steps=8)
    finally:
        L.Info.enabled = True
    u = np.asarray(U.data)
    # uniformly-translating fluid in a translating box stays uniform
    assert np.abs(u[:, 0] - 1.0).max() < 1e-6
    assert np.abs(u[:, 1:]).max() < 1e-6
    # the mesh really moved
    assert float(np.asarray(case.mesh.C)[:, 0].mean()) > 0.03


def test_rotating_box_spinup(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("dymr"))
    _dym_case(d, """
dynamicFvMesh   solidBodyMotionFvMesh;
solidBodyMotionFvMeshCoeffs
{
    solidBodyMotionFunction rotatingMotion;
    rotatingMotionCoeffs
    {
        origin (0 0 0);
        axis   (0 0 1);
        omega  3.0;
    }
}
""", u0="(0 0 0)")
    L.Info.enabled = False
    try:
        from rapidcfd_tpu.solvers import pimpledymfoam
        case, U, p, phi, _ = pimpledymfoam.run(d, write=False,
                                               max_steps=10)
    finally:
        L.Info.enabled = True
    u = np.asarray(U.data)
    assert np.isfinite(u).all()
    # near-wall fluid is dragged by the rotating walls: tangential
    # speed of the same sign as omega x r
    C = np.asarray(case.mesh.C)
    w = np.cross([0.0, 0.0, 3.0], C)
    near_wall = np.abs(C[:, :2]).max(1) > 0.035
    corr = (u[near_wall, :2] * w[near_wall, :2]).sum()
    assert corr > 0.0
    assert np.abs(u).max() < 1.0  # bounded (wall speed ~0.2)
