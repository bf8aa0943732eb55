"""multiphaseEulerFoam: air and oil dispersed in water, both rising
(reference: applications/solvers/multiphase/multiphaseEulerFoam)."""

import os

import numpy as np

from rapidcfd_tpu.mesh.polymesh import write_polymesh
from rapidcfd_tpu.utils import logging as L
from rapidcfd_tpu.utils.casegen import _write, box_mesh, write_field
from rapidcfd_tpu.utils.dictionary import foamfile_header

_EMPTY = "        type            empty;\n"
_ZG = "        type            zeroGradient;\n"


def test_three_phase_column(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("mpe"))
    mesh = box_mesh(10, 24, 1, size=(0.15, 1.0, 0.05), patch_spec={
        "xmin": ("walls", "wall"), "xmax": ("walls", "wall"),
        "ymin": ("walls", "wall"), "ymax": ("walls", "wall"),
        "zmin": ("fb", "empty"), "zmax": ("fb", "empty")})
    write_polymesh(mesh, d)
    from rapidcfd_tpu.mesh.geometry import (cell_centres_and_vols,
                                            face_centres_and_areas)
    from rapidcfd_tpu.fields.io import _body_value
    Cf, Sf = face_centres_and_areas(mesh)
    C, V = cell_centres_and_vols(mesh, Cf, Sf)
    lower = C[:, 1] < 0.5
    a_air = np.where(lower, 0.08, 0.0)
    a_oil = np.where(lower, 0.08, 0.0)
    a_wat = 1.0 - a_air - a_oil

    _write(os.path.join(d, "system", "controlDict"),
           foamfile_header("dictionary", "controlDict", "system"), """
application multiphaseEulerFoam; startFrom startTime; startTime 0;
stopAt endTime; endTime 0.06; deltaT 1e-3;
writeControl runTime; writeInterval 0.06; writeFormat ascii;
""")
    _write(os.path.join(d, "system", "fvSchemes"),
           foamfile_header("dictionary", "fvSchemes", "system"), """
ddtSchemes { default Euler; }
gradSchemes { default Gauss linear; }
divSchemes { default Gauss upwind; div(phi,alpha) Gauss vanLeer; }
laplacianSchemes { default Gauss linear orthogonal; }
interpolationSchemes { default linear; }
snGradSchemes { default orthogonal; }
""")
    _write(os.path.join(d, "system", "fvSolution"),
           foamfile_header("dictionary", "fvSolution", "system"), """
solvers
{
    alpha { cAlpha 1; }
    p { solver PCG; preconditioner DIC; tolerance 1e-08; relTol 0.01; }
    pFinal { solver PCG; preconditioner DIC; tolerance 1e-08;
             relTol 0; }
}
PIMPLE
{
    nOuterCorrectors 1; nCorrectors 2; nNonOrthogonalCorrectors 0;
    pRefCell 0; pRefValue 1e5;
}
""")
    _write(os.path.join(d, "constant", "transportProperties"),
           foamfile_header("dictionary", "transportProperties",
                           "constant"), """
phases
(
    air   { nu nu [0 2 -1 0 0 0 0] 1.48e-05;
            rho rho [1 -3 0 0 0 0 0] 1.2;
            diameterModel constant;
            constantCoeffs { d d [0 1 0 0 0 0 0] 3e-3; } }
    oil   { nu nu [0 2 -1 0 0 0 0] 1e-05;
            rho rho [1 -3 0 0 0 0 0] 900;
            diameterModel constant;
            constantCoeffs { d d [0 1 0 0 0 0 0] 1e-3; } }
    water { nu nu [0 2 -1 0 0 0 0] 1e-06;
            rho rho [1 -3 0 0 0 0 0] 1000;
            diameterModel constant;
            constantCoeffs { d d [0 1 0 0 0 0 0] 1e-4; } }
);

sigmas ( );
virtualMass ( (air water) 0.5 );
drag
(
    (air water)  { type SchillerNaumann; }
    (oil water)  { type SchillerNaumann; }
);
""")
    _write(os.path.join(d, "constant", "g"),
           foamfile_header("uniformDimensionedVectorField", "g",
                           "constant"),
           "\ndimensions      [0 1 -2 0 0 0 0];\n"
           "value           (0 -9.81 0);\n")

    bc = {"walls": _ZG, "fb": _EMPTY}
    noslip = {"walls": "        type            fixedValue;\n"
                       "        value           uniform (0 0 0);\n",
              "fb": _EMPTY}
    for nm, arr in (("air", a_air), ("oil", a_oil), ("water", a_wat)):
        write_field(d, "0", f"alpha.{nm}", "volScalarField",
                    "[0 0 0 0 0 0 0]", _body_value(arr), bc)
        write_field(d, "0", f"U.{nm}", "volVectorField",
                    "[0 1 -1 0 0 0 0]", "uniform (0 0 0)", noslip)
    write_field(d, "0", "p", "volScalarField", "[1 -1 -2 0 0 0 0]",
                "uniform 1e5", bc)

    L.Info.enabled = False
    from rapidcfd_tpu.solvers import multiphaseeulerfoam
    case, alphas, Us, p, phis = multiphaseeulerfoam.run(d, write=False)
    L.Info.enabled = True

    V = np.asarray(case.mesh.V)
    asum = np.zeros_like(V)
    for a in alphas:
        ad = np.asarray(a.data)
        assert np.isfinite(ad).all()
        assert ad.min() > -1e-3 and ad.max() < 1.0 + 1e-3
        asum += ad
    assert np.abs(asum - 1.0).max() < 1e-6
    # both dispersed phases rise relative to water; the larger air
    # bubbles rise faster than the small oil droplets
    uw = np.asarray(Us[2].data)
    in_mix = np.asarray(alphas[0].data) > 0.04
    slip_air = (np.asarray(Us[0].data) - uw)[in_mix, 1]
    slip_oil = (np.asarray(Us[1].data) - uw)[in_mix, 1]
    assert slip_air.mean() > 0.05
    assert slip_oil.mean() > 0.001
    assert slip_air.mean() > 2.0 * slip_oil.mean()
    # phase volumes conserved
    for a, a0 in zip(alphas, (a_air, a_oil, a_wat)):
        got = float((np.asarray(a.data) * V).sum())
        want = float((a0 * V).sum())
        assert abs(got - want) < 0.03 * max(want, 1e-9)
