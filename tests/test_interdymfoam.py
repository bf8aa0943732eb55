"""interDyMFoam — VOF on a moving (solid-body) mesh.

Sloshing-tank checks (reference: interDyMFoam.C mesh.update() +
makeRelative/makeAbsolute): mass conservation and boundedness hold
exactly under motion; zero-amplitude motion reproduces the static
interFoam path.
"""

import os

import numpy as np
import pytest

from rapidcfd_tpu.utils import logging as L
from rapidcfd_tpu.utils.casegen import _write, dam_break_case
from rapidcfd_tpu.utils.dictionary import foamfile_header


def _sloshing_case(d, amplitude, period=0.08, n=16, end_time=0.04):
    dam_break_case(d, n=n, end_time=end_time, delta_t=0.001)
    omega = 2.0 * np.pi / period
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
    # tank walls move with the mesh
    u0 = os.path.join(d, "0", "U")
    s = open(u0).read()
    s = s.replace("        type            fixedValue;\n"
                  "        value           uniform (0 0 0);\n",
                  "        type            movingWallVelocity;\n"
                  "        value           uniform (0 0 0);\n")
    open(u0, "w").write(s)


@pytest.mark.slow
def test_sloshing_tank_conserves_mass(tmp_path_factory):
    from rapidcfd_tpu.solvers import interdymfoam

    d = str(tmp_path_factory.mktemp("slosh"))
    _sloshing_case(d, amplitude=0.02)
    L.Info.enabled = False
    case, alpha, U, p_rgh, phi = interdymfoam.run(d, write=False,
                                                  max_steps=25)
    L.Info.enabled = True
    a = np.asarray(alpha.data)
    u = np.asarray(U.data)
    assert np.isfinite(a).all() and np.isfinite(u).all()
    # MULES boundedness: the moving-mesh relative flux carries the
    # analytic meshPhi's O(1e-5) discrete divergence, so the bounds are
    # honoured to that level (the reference's interDyMFoam logs the
    # same-order Min/Max alpha excursions), not to fp roundoff
    assert a.min() > -1e-4 and a.max() < 1.0 + 1e-4
    # closed tank: water volume exactly conserved through the motion
    V = np.asarray(case.mesh.V)
    vol = float((a * V).sum())
    # initial column: 0.25L x 0.5L x depth of the 0.584 box
    vol0 = 0.25 * 0.584 * 0.5 * 0.584 * 0.0146
    assert abs(vol - vol0) < 1e-3 * vol0, (vol, vol0)
    # the sloshing excitation actually moves the fluid
    assert np.abs(u).max() > 0.05


def test_zero_amplitude_matches_static_interfoam(tmp_path_factory):
    """amplitude=0 motion must reproduce static interFoam stepping
    (the relative-flux plumbing is exactly identity then)."""
    from rapidcfd_tpu.solvers import interdymfoam, interfoam

    d1 = str(tmp_path_factory.mktemp("slosh0"))
    _sloshing_case(d1, amplitude=0.0)
    d2 = str(tmp_path_factory.mktemp("stat"))
    dam_break_case(d2, n=16, end_time=0.04, delta_t=0.001)

    L.Info.enabled = False
    _, a1, U1, p1, phi1 = interdymfoam.run(d1, write=False, max_steps=8)
    _, a2, U2, p2, phi2 = interfoam.run(d2, write=False, max_steps=8)
    L.Info.enabled = True
    assert np.abs(np.asarray(a1.data) - np.asarray(a2.data)).max() < 1e-10
    assert np.abs(np.asarray(U1.data) - np.asarray(U2.data)).max() < 1e-8
