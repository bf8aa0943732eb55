"""SRF (single rotating frame): SRFSimpleFoam / SRFPimpleFoam.

Physics check: a closed box of fluid whose walls are stationary in the
rotating frame reaches solid-body rotation — Urel -> 0 and the pressure
takes the centrifugal parabola grad p = omega^2 r_perp
(reference: SRFModel.C Su = 2*omega^Urel + omega^(omega^C)).
"""

import math
import os

import numpy as np

from rapidcfd_tpu.utils import logging as L
from rapidcfd_tpu.utils.casegen import (_write, box_mesh, write_field,
                                        write_polymesh)
from rapidcfd_tpu.utils.dictionary import foamfile_header

RPM = 60.0 / (2 * math.pi)  # omega = 1 rad/s


def _srf_case(case_dir, n=16, pimple=False):
    d = 0.1
    mesh = box_mesh(n, n, 1, size=(d, d, 0.01),
                    origin=(-d / 2, -d / 2, 0.0), patch_spec={
                        "ymax": ("walls", "wall"),
                        "xmin": ("walls", "wall"),
                        "xmax": ("walls", "wall"),
                        "ymin": ("walls", "wall"),
                        "zmin": ("frontAndBack", "empty"),
                        "zmax": ("frontAndBack", "empty"),
                    })
    write_polymesh(mesh, case_dir)
    app = "SRFPimpleFoam" if pimple else "SRFSimpleFoam"
    _write(os.path.join(case_dir, "system", "controlDict"),
           foamfile_header("dictionary", "controlDict", "system"), f"""
application     {app};
startFrom       startTime;
startTime       0;
stopAt          endTime;
endTime         {0.2 if pimple else 200};
deltaT          {0.002 if pimple else 1};
writeControl    timeStep;
writeInterval   1000;
""")
    _write(os.path.join(case_dir, "system", "fvSchemes"),
           foamfile_header("dictionary", "fvSchemes", "system"), """
ddtSchemes      { default Euler; }
gradSchemes     { default Gauss linear; }
divSchemes      { default none; div(phi,Urel) Gauss upwind;
                  div(phi,k) Gauss upwind; div(phi,epsilon) Gauss upwind; }
laplacianSchemes { default Gauss linear orthogonal; }
interpolationSchemes { default linear; }
snGradSchemes   { default orthogonal; }
""")
    algo = "PIMPLE" if pimple else "SIMPLE"
    _write(os.path.join(case_dir, "system", "fvSolution"),
           foamfile_header("dictionary", "fvSolution", "system"), f"""
solvers
{{
    p {{ solver PCG; preconditioner DIC; tolerance 1e-07; relTol 0.01; }}
    pFinal {{ solver PCG; preconditioner DIC; tolerance 1e-07; relTol 0; }}
    Urel {{ solver smoothSolver; smoother symGaussSeidel;
           tolerance 1e-07; relTol 0; }}
    UrelFinal {{ solver smoothSolver; smoother symGaussSeidel;
           tolerance 1e-07; relTol 0; }}
}}
{algo}
{{
    nOuterCorrectors 1;
    nCorrectors     2;
    nNonOrthogonalCorrectors 0;
    pRefCell        0;
    pRefValue       0;
    residualControl {{ }}
}}
relaxationFactors
{{
    fields    {{ p 0.3; }}
    equations {{ Urel 0.7; }}
}}
""")
    _write(os.path.join(case_dir, "constant", "transportProperties"),
           foamfile_header("dictionary", "transportProperties",
                           "constant"),
           "\nnu              nu [ 0 2 -1 0 0 0 0 ] 0.01;\n")
    _write(os.path.join(case_dir, "constant", "RASProperties"),
           foamfile_header("dictionary", "RASProperties", "constant"),
           "\nRASModel        laminar;\nturbulence      off;\n")
    _write(os.path.join(case_dir, "constant", "SRFProperties"),
           foamfile_header("dictionary", "SRFProperties", "constant"), f"""
SRFModel        rpm;
origin          (0 0 0);
axis            (0 0 1);
rpmCoeffs       {{ rpm {RPM}; }}
""")
    write_field(case_dir, "0", "p", "volScalarField", "[0 2 -2 0 0 0 0]",
                "uniform 0", {
                    "walls": "        type            zeroGradient;\n",
                    "frontAndBack": "        type            empty;\n",
                })
    write_field(case_dir, "0", "Urel", "volVectorField",
                "[0 1 -1 0 0 0 0]", "uniform (0 0 0)", {
                    "walls":
                        "        type            SRFVelocity;\n"
                        "        relative        yes;\n"
                        "        inletValue      uniform (0 0 0);\n"
                        "        value           uniform (0 0 0);\n",
                    "frontAndBack": "        type            empty;\n",
                })


def test_srf_simple_solid_body(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("srf"))
    _srf_case(d)
    L.Info.enabled = False
    try:
        from rapidcfd_tpu.solvers import srffoam
        case, U, p, phi, _ = srffoam.run(d, max_steps=60, write=False)
    finally:
        L.Info.enabled = True
    C = np.asarray(case.mesh.C)
    pr = np.asarray(p.data)
    # Urel stays (numerically) at rest in the frame
    assert np.abs(np.asarray(U.data)).max() < 1e-4
    # p - p0 = 0.5*omega^2*r_perp^2 (omega = 1)
    r2 = C[:, 0] ** 2 + C[:, 1] ** 2
    expect = 0.5 * r2
    got = pr - pr[0] + expect[0]
    assert np.abs(got - expect).max() < 5e-4


def test_srf_pimple_runs(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("srfp"))
    _srf_case(d, pimple=True)
    L.Info.enabled = False
    try:
        from rapidcfd_tpu.solvers import srffoam
        case, U, p, phi, _ = srffoam.run_pimple(d, max_steps=10,
                                                write=False)
    finally:
        L.Info.enabled = True
    assert np.isfinite(np.asarray(U.data)).all()
    assert np.abs(np.asarray(U.data)).max() < 1e-4


def test_uabs_velocity():
    """SRFModel.velocity removes the axial component (reference:
    SRFModel.C:167)."""
    import jax.numpy as jnp

    class FakeCase:
        dir = None
    import tempfile
    d = tempfile.mkdtemp()
    os.makedirs(os.path.join(d, "constant"), exist_ok=True)
    _write(os.path.join(d, "constant", "SRFProperties"),
           foamfile_header("dictionary", "SRFProperties", "constant"), f"""
SRFModel        rpm;
axis            (0 0 1);
rpmCoeffs       {{ rpm {RPM}; }}
""")
    FakeCase.dir = d
    from rapidcfd_tpu.models.srf import SRFModel
    srf = SRFModel(FakeCase)
    pos = jnp.asarray([[1.0, 0.0, 5.0]])
    v = np.asarray(srf.velocity(pos))
    np.testing.assert_allclose(v, [[0.0, 1.0, 0.0]], atol=1e-6)
