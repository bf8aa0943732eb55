"""interMixingFoam: air above two miscible liquids that inter-diffuse
(reference: applications/solvers/multiphase/interFoam/interMixingFoam)."""

import os

import numpy as np

from rapidcfd_tpu.mesh.polymesh import write_polymesh
from rapidcfd_tpu.utils import logging as L
from rapidcfd_tpu.utils.casegen import _write, box_mesh, write_field
from rapidcfd_tpu.utils.dictionary import foamfile_header

_EMPTY = "        type            empty;\n"
_ZG = "        type            zeroGradient;\n"


def test_intermixing_air_two_liquids(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("imix"))
    n = 20
    mesh = box_mesh(n, n, 1, size=(0.1, 0.1, 0.005), patch_spec={
        "xmin": ("walls", "wall"), "xmax": ("walls", "wall"),
        "ymin": ("walls", "wall"), "ymax": ("walls", "wall"),
        "zmin": ("fb", "empty"), "zmax": ("fb", "empty")})
    write_polymesh(mesh, d)
    from rapidcfd_tpu.mesh.geometry import (cell_centres_and_vols,
                                            face_centres_and_areas)
    from rapidcfd_tpu.fields.io import _body_value
    Cf, Sf = face_centres_and_areas(mesh)
    C, V = cell_centres_and_vols(mesh, Cf, Sf)
    air = (C[:, 1] > 0.06).astype(float)            # alpha1: air on top
    liq2 = ((C[:, 1] <= 0.06) & (C[:, 0] < 0.05)).astype(float)

    _write(os.path.join(d, "system", "controlDict"),
           foamfile_header("dictionary", "controlDict", "system"), """
application interMixingFoam; startFrom startTime; startTime 0;
stopAt endTime; endTime 0.05; deltaT 0.001;
writeControl runTime; writeInterval 0.05; writeFormat ascii;
""")
    _write(os.path.join(d, "system", "fvSchemes"),
           foamfile_header("dictionary", "fvSchemes", "system"), """
ddtSchemes { default Euler; }
gradSchemes { default Gauss linear; }
divSchemes { default none; div(phi,alpha) Gauss vanLeer;
             div(phirb,alpha) Gauss linear;
             div(rhoPhi,U) Gauss upwind; }
laplacianSchemes { default Gauss linear orthogonal; }
interpolationSchemes { default linear; }
snGradSchemes { default orthogonal; }
""")
    _write(os.path.join(d, "system", "fvSolution"),
           foamfile_header("dictionary", "fvSolution", "system"), """
solvers
{
    alpha.air { nAlphaSubCycles 1; cAlpha 1; }
    alpha2 { solver PBiCGStab; preconditioner DILU; tolerance 1e-08;
             relTol 0; }
    p_rgh { solver PCG; preconditioner DIC; tolerance 1e-07;
            relTol 0.05; }
    p_rghFinal { solver PCG; preconditioner DIC; tolerance 1e-07;
                 relTol 0; }
    U { solver smoothSolver; smoother symGaussSeidel; tolerance 1e-06;
        relTol 0; }
}
PIMPLE
{
    momentumPredictor no; nOuterCorrectors 1; nCorrectors 2;
    nNonOrthogonalCorrectors 0; pRefCell 0; pRefValue 0;
}
""")
    _write(os.path.join(d, "constant", "transportProperties"),
           foamfile_header("dictionary", "transportProperties",
                           "constant"), """
phases (air oil water);

air   { transportModel Newtonian; nu nu [0 2 -1 0 0 0 0] 1.48e-05;
        rho rho [1 -3 0 0 0 0 0] 1; }
oil   { transportModel Newtonian; nu nu [0 2 -1 0 0 0 0] 1e-05;
        rho rho [1 -3 0 0 0 0 0] 900; }
water { transportModel Newtonian; nu nu [0 2 -1 0 0 0 0] 1e-06;
        rho rho [1 -3 0 0 0 0 0] 1000; }

D23     D23 [0 2 -1 0 0 0 0] 3e-05;
sigma12 sigma12 [1 0 -2 0 0 0 0] 0.05;
sigma13 sigma13 [1 0 -2 0 0 0 0] 0.04;
""")
    _write(os.path.join(d, "constant", "g"),
           foamfile_header("uniformDimensionedVectorField", "g",
                           "constant"),
           "\ndimensions      [0 1 -2 0 0 0 0];\n"
           "value           (0 -9.81 0);\n")

    bc = {"walls": _ZG, "fb": _EMPTY}
    write_field(d, "0", "alpha.air", "volScalarField", "[0 0 0 0 0 0 0]",
                _body_value(air), bc)
    write_field(d, "0", "alpha.oil", "volScalarField",
                "[0 0 0 0 0 0 0]", _body_value(liq2), bc)
    write_field(d, "0", "p_rgh", "volScalarField", "[1 -1 -2 0 0 0 0]",
                "uniform 0", bc)
    write_field(d, "0", "U", "volVectorField", "[0 1 -1 0 0 0 0]",
                "uniform (0 0 0)", {
                    "walls": "        type            fixedValue;\n"
                             "        value           uniform (0 0 0);\n",
                    "fb": _EMPTY})

    L.Info.enabled = False
    from rapidcfd_tpu.solvers import intermixingfoam
    case, a1, a2, U, p_rgh, phi = intermixingfoam.run(d, write=False)
    L.Info.enabled = True

    a1d = np.asarray(a1.data)
    a2d = np.asarray(a2.data)
    a3d = 1.0 - a1d - a2d
    V = np.asarray(case.mesh.V)
    assert np.isfinite(a1d).all() and np.isfinite(a2d).all()
    assert a1d.min() > -1e-4 and a1d.max() < 1.0 + 1e-4
    assert a2d.min() > -0.02 and a2d.max() < 1.0 + 0.02
    assert a3d.min() > -0.02
    # immiscible air volume conserved by MULES
    assert abs(float((a1d * V).sum()) - float((air * V).sum())) \
        < 0.01 * float((air * V).sum())
    # the two liquids have inter-diffused: oil appears in the
    # initially pure-water half
    C = np.asarray(case.mesh.C)
    right_liquid = (C[:, 0] > 0.055) & (C[:, 1] < 0.05)
    assert a2d[right_liquid].max() > 1e-4
    # total liquid-2 conserved (advection + diffusion)
    assert abs(float((a2d * V).sum()) - float((liq2 * V).sum())) \
        < 0.02 * float((liq2 * V).sum())
