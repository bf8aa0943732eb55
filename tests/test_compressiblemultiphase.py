"""compressibleMultiphaseInterFoam: pressurized air bubble under an
oil-on-water stratification (reference: applications/solvers/multiphase/
compressibleMultiphaseInterFoam)."""

import os

import numpy as np

from rapidcfd_tpu.mesh.polymesh import write_polymesh
from rapidcfd_tpu.utils import logging as L
from rapidcfd_tpu.utils.casegen import _write, box_mesh, write_field
from rapidcfd_tpu.utils.dictionary import foamfile_header

_EMPTY = "        type            empty;\n"
_ZG = "        type            zeroGradient;\n"

_AIR_THERMO = """
thermoType
{
    type hePsiThermo; mixture pureMixture; transport const;
    thermo hConst; equationOfState perfectGas; specie specie;
    energy sensibleInternalEnergy;
}
mixture
{
    specie          { nMoles 1; molWeight 28.9; }
    thermodynamics  { Cp 1007; Hf 0; }
    transport       { mu 1.84e-5; Pr 0.7; }
}
"""

_LIQ_THERMO = """
thermoType
{{
    type heRhoThermo; mixture pureMixture; transport const;
    thermo hConst; equationOfState perfectFluid; specie specie;
    energy sensibleInternalEnergy;
}}
mixture
{{
    specie          {{ nMoles 1; molWeight {mw}; }}
    equationOfState {{ R {r}; rho0 {rho0}; }}
    thermodynamics  {{ Cp {cp}; Hf 0; }}
    transport       {{ mu {mu}; Pr {pr}; }}
}}
"""


def test_three_phase_bubble(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("cmpif"))
    n = 20
    mesh = box_mesh(n, n, 1, size=(1.0, 1.0, 0.05), patch_spec={
        "xmin": ("walls", "wall"), "xmax": ("walls", "wall"),
        "ymin": ("walls", "wall"), "ymax": ("walls", "wall"),
        "zmin": ("fb", "empty"), "zmax": ("fb", "empty")})
    write_polymesh(mesh, d)
    from rapidcfd_tpu.mesh.geometry import (cell_centres_and_vols,
                                            face_centres_and_areas)
    from rapidcfd_tpu.fields.io import _body_value
    Cf, Sf = face_centres_and_areas(mesh)
    C, V = cell_centres_and_vols(mesh, Cf, Sf)
    r = np.sqrt((C[:, 0] - 0.5) ** 2 + (C[:, 1] - 0.35) ** 2)
    bubble = r < 0.12
    oil = (C[:, 1] > 0.7) & ~bubble
    water = ~bubble & ~oil
    p0 = np.where(bubble, 5e5, 1e5)

    _write(os.path.join(d, "system", "controlDict"),
           foamfile_header("dictionary", "controlDict", "system"), """
application compressibleMultiphaseInterFoam; startFrom startTime;
startTime 0; stopAt endTime; endTime 4e-4; deltaT 1e-5;
writeControl runTime; writeInterval 4e-4; writeFormat ascii;
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
    p_rgh { solver PCG; preconditioner DIC; tolerance 1e-08;
            relTol 0.01; }
    p_rghFinal { solver PCG; preconditioner DIC; tolerance 1e-08;
                 relTol 0; }
    T { solver PBiCGStab; preconditioner DILU; tolerance 1e-08;
        relTol 0; }
}
PIMPLE
{
    momentumPredictor no; nOuterCorrectors 1; nCorrectors 2;
    nNonOrthogonalCorrectors 0;
}
""")
    _write(os.path.join(d, "constant", "thermophysicalProperties"),
           foamfile_header("dictionary", "thermophysicalProperties",
                           "constant"), """
phases (air oil water);
pMin   pMin [1 -1 -2 0 0 0 0] 10000;
sigmas ( (air water) 0.07 (air oil) 0.03 (oil water) 0.02 );
""")
    _write(os.path.join(d, "constant", "thermophysicalProperties.air"),
           foamfile_header("dictionary", "thermophysicalProperties.air",
                           "constant"), _AIR_THERMO)
    _write(os.path.join(d, "constant", "thermophysicalProperties.oil"),
           foamfile_header("dictionary", "thermophysicalProperties.oil",
                           "constant"),
           _LIQ_THERMO.format(mw=100.0, r=5000, rho0=900, cp=2000,
                              mu="5e-3", pr=10.0))
    _write(os.path.join(d, "constant",
                        "thermophysicalProperties.water"),
           foamfile_header("dictionary",
                           "thermophysicalProperties.water", "constant"),
           _LIQ_THERMO.format(mw=18.0, r=3000, rho0=1027, cp=4195,
                              mu="3.6e-4", pr=2.3))
    _write(os.path.join(d, "constant", "g"),
           foamfile_header("uniformDimensionedVectorField", "g",
                           "constant"),
           "\ndimensions      [0 1 -2 0 0 0 0];\n"
           "value           (0 -9.81 0);\n")

    bc = {"walls": _ZG, "fb": _EMPTY}
    for nm, arr in (("air", bubble), ("oil", oil), ("water", water)):
        write_field(d, "0", f"alpha.{nm}", "volScalarField",
                    "[0 0 0 0 0 0 0]", _body_value(arr.astype(float)),
                    bc)
    write_field(d, "0", "p_rgh", "volScalarField", "[1 -1 -2 0 0 0 0]",
                _body_value(p0), bc)
    write_field(d, "0", "p", "volScalarField", "[1 -1 -2 0 0 0 0]",
                _body_value(p0), bc)
    write_field(d, "0", "T", "volScalarField", "[0 0 0 1 0 0 0]",
                "uniform 300", bc)
    write_field(d, "0", "U", "volVectorField", "[0 1 -1 0 0 0 0]",
                "uniform (0 0 0)", {
                    "walls": "        type            fixedValue;\n"
                             "        value           uniform (0 0 0);\n",
                    "fb": _EMPTY})

    L.Info.enabled = False
    from rapidcfd_tpu.solvers import compressiblemultiphaseinterfoam
    case, alphas, U, p_rgh, p, T, phi = \
        compressiblemultiphaseinterfoam.run(d, write=False)
    L.Info.enabled = True

    V = np.asarray(case.mesh.V)
    pp = np.asarray(p.data)
    assert np.isfinite(pp).all()
    asum = np.zeros_like(pp)
    for a in alphas:
        ad = np.asarray(a.data)
        assert np.isfinite(ad).all()
        assert ad.min() > -1e-3 and ad.max() < 1.0 + 1e-3
        asum += ad
    # phase fractions partition unity
    assert np.abs(asum - 1.0).max() < 1e-6
    # rigid box: the domain rings toward the ~5-bar equilibrium with
    # bounded acoustic overshoot; pMin holds
    assert pp.max() < 1e6 and pp.max() > 1.1e5
    assert pp.min() >= 1e4 - 1.0
    # bubble expanded (rigid box: slightly)
    a_air = np.asarray(alphas[0].data)
    assert float((a_air * V).sum()) > float((bubble * V).sum()) * 1.001
    # oil layer stays on top
    C = np.asarray(case.mesh.C)
    a_oil = np.asarray(alphas[1].data)
    assert (a_oil * V * C[:, 1]).sum() / max((a_oil * V).sum(), 1e-12) \
        > 0.6
