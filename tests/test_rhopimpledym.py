"""rhoPimpleDyMFoam — compressible PIMPLE on a moving mesh.

Reference: applications/solvers/compressible/rhoPimpleFoam/
rhoPimpleDyMFoam/rhoPimpleDyMFoam.C — mesh.update() then
fvc::makeRelative(fvc::interpolate(rho), phi).
"""

import os

import numpy as np

from rapidcfd_tpu.utils import logging as L
from rapidcfd_tpu.utils.casegen import _write, hot_channel_case
from rapidcfd_tpu.utils.dictionary import foamfile_header

_CONTROL = """
application     rhoPimpleDyMFoam;
startFrom       startTime;
startTime       0;
stopAt          endTime;
endTime         0.02;
deltaT          0.0005;
writeControl    timeStep;
writeInterval   1000;
writeFormat     ascii;
"""

_SCHEMES = """
ddtSchemes      { default Euler; }
gradSchemes     { default Gauss linear; }
divSchemes
{
    default         none;
    div(phi,U)      Gauss upwind;
    div(phi,h)      Gauss upwind;
    div(phi,K)      Gauss upwind;
}
laplacianSchemes { default Gauss linear corrected; }
interpolationSchemes { default linear; }
snGradSchemes   { default corrected; }
"""


def _dym_channel(d, amplitude):
    hot_channel_case(d)
    _write(os.path.join(d, "system", "controlDict"),
           foamfile_header("dictionary", "controlDict", "system"),
           _CONTROL)
    _write(os.path.join(d, "system", "fvSchemes"),
           foamfile_header("dictionary", "fvSchemes", "system"),
           _SCHEMES)
    omega = 2.0 * np.pi / 0.04
    _write(os.path.join(d, "constant", "dynamicMeshDict"),
           foamfile_header("dictionary", "dynamicMeshDict", "constant"),
           f"""
dynamicFvMesh   solidBodyMotionFvMesh;
solidBodyMotionFvMeshCoeffs
{{
    solidBodyMotionFunction oscillatingLinearMotion;
    oscillatingLinearMotionCoeffs
    {{
        amplitude ({amplitude} 0 0);
        omega     {omega};
    }}
}}
""")
    u0 = os.path.join(d, "0", "U")
    s = open(u0).read()
    s = s.replace("        type            fixedValue;\n"
                  "        value           uniform (0 0 0);\n",
                  "        type            movingWallVelocity;\n"
                  "        value           uniform (0 0 0);\n", 1)
    open(u0, "w").write(s)


def test_rhopimpledymfoam_moving_channel(tmp_path_factory):
    """Oscillating heated channel: solution stays bounded and
    EoS-consistent through the motion."""
    from rapidcfd_tpu.solvers import rhopimpledymfoam

    d = str(tmp_path_factory.mktemp("rhodym"))
    _dym_channel(d, amplitude=0.002)
    L.Info.enabled = False
    try:
        case, U, p, T, rho, phi = rhopimpledymfoam.run(
            d, write=False, max_steps=12)
    finally:
        L.Info.enabled = True
    t = np.asarray(T.data)
    u = np.asarray(U.data)
    assert np.isfinite(t).all() and np.isfinite(u).all()
    assert t.max() <= 352.0 and t.min() >= 298.0
    mgas = 8314.47 / 28.9
    assert np.allclose(np.asarray(rho.data),
                       np.asarray(p.data) / (mgas * t), rtol=1e-10)


def test_zero_amplitude_matches_static_rhopimplefoam(tmp_path_factory):
    """amplitude=0 motion must reproduce static rhoPimpleFoam stepping
    (the rho-weighted relative-flux plumbing is exactly identity)."""
    from rapidcfd_tpu.solvers import rhopimpledymfoam, rhopimplefoam

    d1 = str(tmp_path_factory.mktemp("rhodym0"))
    _dym_channel(d1, amplitude=0.0)
    d2 = str(tmp_path_factory.mktemp("rhostat"))
    _dym_channel(d2, amplitude=0.0)
    os.remove(os.path.join(d2, "constant", "dynamicMeshDict"))
    L.Info.enabled = False
    try:
        _, U1, p1, T1, *_ = rhopimpledymfoam.run(d1, write=False,
                                                 max_steps=5)
        _, U2, p2, T2, _, _ = rhopimplefoam.run(d2, write=False,
                                                max_steps=5)
    finally:
        L.Info.enabled = True
    # movingWallVelocity with zero wall motion == fixedValue (0 0 0)
    assert np.allclose(np.asarray(U1.data), np.asarray(U2.data),
                       atol=1e-8)
    assert np.allclose(np.asarray(T1.data), np.asarray(T2.data),
                       atol=1e-7)
