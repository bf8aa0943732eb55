"""Integration test: icoFoam on the lid-driven cavity (BASELINE config 1).

Acceptance per SURVEY.md §7.1 stage 6: runs fully jitted, machine-zero
global continuity, physically-correct Ghia-class velocity profile.
"""

import numpy as np
import pytest

from rapidcfd_tpu.utils import logging as L
from rapidcfd_tpu.utils.casegen import cavity_case


@pytest.fixture(scope="module")
def cavity_run(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("cav"))
    cavity_case(d, end_time=0.1, write_interval=20)  # 20 steps
    L.Info.enabled = False
    from rapidcfd_tpu.solvers import icofoam
    case, U, p, phi = icofoam.run(d)
    L.Info.enabled = True
    return d, case, U, p, phi


def test_cavity_continuity_machine_zero(cavity_run):
    d, case, U, p, phi = cavity_run
    from rapidcfd_tpu.ops import fvc
    cont = fvc.div(case.mesh, phi)
    glob = float((cont.data * case.mesh.V).sum())
    local = float((np.abs(np.asarray(cont.data)) * np.asarray(case.mesh.V)
                   ).sum())
    assert abs(glob) < 1e-15
    assert local < 1e-8


def test_cavity_velocity_field_sane(cavity_run):
    d, case, U, p, phi = cavity_run
    u = np.asarray(U.data)
    # lid drives flow: bounded by lid speed (+ small overshoot near corners)
    assert np.abs(u).max() < 1.0
    assert u[:, 2].max() < 1e-12  # strictly 2D
    # recirculation: negative u_x must exist in the lower cavity
    assert u[:, 0].min() < -0.05
    # no NaNs anywhere
    assert np.isfinite(u).all() and np.isfinite(np.asarray(p.data)).all()


def test_cavity_writes_checkpoint_roundtrip(cavity_run):
    d, case, U, p, phi = cavity_run
    import os
    assert os.path.isdir(os.path.join(d, "0.1"))
    U2 = case.read_field("U", "0.1")
    assert np.allclose(np.asarray(U2.data), np.asarray(U.data), atol=1e-7)
    # uniform/time restart metadata
    from rapidcfd_tpu.utils.dictionary import parse_file
    t = parse_file(os.path.join(d, "0.1", "uniform", "time"))
    assert t.scalar("deltaT") == 0.005
    assert int(t.scalar("index")) == 20


def test_cavity_ghia_profile(tmp_path_factory):
    """Run to t=0.5 (near-steady) and compare the vertical-centerline
    u-profile minimum against Ghia et al. (Re=100): u_min=-0.211 at
    y=0.453 — on a 20x20 mesh expect it within ~15%."""
    d = str(tmp_path_factory.mktemp("cavg"))
    cavity_case(d, end_time=0.5)
    L.Info.enabled = False
    from rapidcfd_tpu.solvers import icofoam
    case, U, p, phi = icofoam.run(d, write=False)
    L.Info.enabled = True
    u = np.asarray(U.data)
    C = np.asarray(case.mesh.C)
    col = np.isclose(C[:, 0], 0.0475) | np.isclose(C[:, 0], 0.0525)
    ys = C[col, 1] / 0.1
    us = u[col, 0]
    umin = us.min()
    ymin = ys[us.argmin()]
    assert -0.24 < umin < -0.17
    assert 0.35 < ymin < 0.60


def test_cavity_3d_dia_path(tmp_path_factory, monkeypatch):
    """3D lid-driven cavity under natural ordering: the DIA SpMV handles
    the 6-offset 3D stencil and matches the RCM/banded run."""
    import os
    monkeypatch.setenv("RCFD_NATURAL_ORDERING", "1")
    from rapidcfd_tpu.mesh.polymesh import write_polymesh
    from rapidcfd_tpu.utils.casegen import _write, box_mesh, write_field
    from rapidcfd_tpu.utils.dictionary import foamfile_header
    d = str(tmp_path_factory.mktemp("cav3d"))
    mesh = box_mesh(10, 10, 10, size=(0.1, 0.1, 0.1), patch_spec={
        "ymax": ("movingWall", "wall"),
        "xmin": ("walls", "wall"), "xmax": ("walls", "wall"),
        "ymin": ("walls", "wall"),
        "zmin": ("walls", "wall"), "zmax": ("walls", "wall")})
    write_polymesh(mesh, d)
    _write(os.path.join(d, "system", "controlDict"),
           foamfile_header("dictionary", "controlDict", "system"), """
application icoFoam; startFrom startTime; startTime 0;
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
    p { solver PCG; preconditioner DIC; tolerance 1e-08; relTol 0.05; }
    pFinal { solver PCG; preconditioner DIC; tolerance 1e-08; relTol 0; }
    U { solver PBiCGStab; preconditioner DILU; tolerance 1e-06;
        relTol 0; }
}
PISO { nCorrectors 2; nNonOrthogonalCorrectors 0;
       pRefCell 0; pRefValue 0; }
""")
    _write(os.path.join(d, "constant", "transportProperties"),
           foamfile_header("dictionary", "transportProperties", "constant"),
           "\nnu              nu [0 2 -1 0 0 0 0] 0.01;\n")
    _fvv = ("        type            fixedValue;\n"
            "        value           uniform (1 0 0);\n")
    write_field(d, "0", "U", "volVectorField", "[0 1 -1 0 0 0 0]",
                "uniform (0 0 0)", {
                    "movingWall": _fvv,
                    "walls": "        type            fixedValue;\n"
                             "        value           uniform (0 0 0);\n"})
    write_field(d, "0", "p", "volScalarField", "[0 2 -2 0 0 0 0]",
                "uniform 0", {
                    "movingWall": "        type            zeroGradient;\n",
                    "walls": "        type            zeroGradient;\n"})
    # confirm the DIA path is actually chosen for this mesh
    from rapidcfd_tpu.solvers.case import Case
    from rapidcfd_tpu.linalg.banded import band_info
    case = Case(d)
    info = band_info(case.mesh)
    assert info is not None and info.mode == "dia"
    assert len(info.offsets) == 6          # ±1, ±10, ±100
    L.Info.enabled = False
    from rapidcfd_tpu.solvers import icofoam
    case, U, p, phi = icofoam.run(d, write=False)
    L.Info.enabled = True
    u = np.asarray(U.data)
    assert np.isfinite(u).all()
    assert np.abs(u).max() <= 1.0 + 1e-6
    from rapidcfd_tpu.ops import fvc
    cont = np.asarray(fvc.div(case.mesh, phi).data)
    assert (np.abs(cont) * np.asarray(case.mesh.V)).sum() < 1e-9


def test_restart_equivalence(tmp_path_factory):
    """Checkpoint/resume parity (SURVEY §5.4): 10 straight steps ==
    5 steps + write + startFrom latestTime + 5 more steps. The time
    directory IS the checkpoint (fields + phi + uniform/time)."""
    import os
    # straight run: 10 steps
    d1 = str(tmp_path_factory.mktemp("straight"))
    cavity_case(d1, end_time=0.05, write_interval=10)
    L.Info.enabled = False
    try:
        from rapidcfd_tpu.solvers import icofoam
        case1, U1, p1, phi1 = icofoam.run(d1, write=False)

        # split run: 5 steps with a checkpoint, then resume
        d2 = str(tmp_path_factory.mktemp("resume"))
        cavity_case(d2, end_time=0.025, write_interval=5)
        icofoam.run(d2, write=True)
        # extend endTime and restart from latestTime
        cd = os.path.join(d2, "system", "controlDict")
        s = open(cd).read().replace("endTime         0.025",
                                    "endTime         0.05") \
            .replace("startFrom       startTime",
                     "startFrom       latestTime")
        open(cd, "w").write(s)
        case2, U2, p2, phi2 = icofoam.run(d2, write=False)
    finally:
        L.Info.enabled = True
    assert abs(case2.time.value - case1.time.value) < 1e-12
    du = np.abs(np.asarray(U1.data) - np.asarray(U2.data)).max()
    # ascii checkpoint round-trip at writePrecision limits parity
    assert du < 1e-5, du
