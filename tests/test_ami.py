"""cyclicAMI: arbitrary mesh interface coupling (VERDICT r1 item 5).

Validation strategy:
- conforming periodic AMI must reproduce the merged-cyclic path (the
  operator action is identical; full transport to fp tolerance)
- non-conforming interface (8 vs 12 faces) preserves a linear
  temperature profile at steady conduction
- weight tables are conservative (rows sum to 1) and the vector
  transform rotates ghosts
"""

import os
import tempfile

import numpy as np
import pytest

from rapidcfd_tpu.mesh.geometry import (cell_centres_and_vols,
                                        face_centres_and_areas)
from rapidcfd_tpu.utils import logging as L
from rapidcfd_tpu.utils.casegen import (_write, ami_channel_case, box_mesh,
                                        write_field, write_polymesh)
from rapidcfd_tpu.utils.dictionary import foamfile_header


def _periodic_case(kind: str) -> str:
    """Periodic transport channel with left/right coupled as `cyclic`
    (merged faces) or `cyclicAMI` (weight tables + implicit SpMV)."""
    d = tempfile.mkdtemp(prefix=f"ami_{kind}_")
    typ = "cyclicAMI" if kind == "ami" else "cyclic"
    m = box_mesh(24, 4, 1, size=(1.0, 0.2, 0.05), patch_spec={
        "xmin": ("inlet", typ), "xmax": ("outlet", typ),
        "ymin": ("walls", "wall"), "ymax": ("walls", "wall"),
        "zmin": ("fb", "empty"), "zmax": ("fb", "empty")})
    for p in m.patches:
        if p.name == "inlet":
            p.extra["neighbourPatch"] = "outlet"
            if kind == "ami":
                p.extra["transform"] = "translational"
                p.extra["separationVector"] = (1.0, 0.0, 0.0)
        if p.name == "outlet":
            p.extra["neighbourPatch"] = "inlet"
            if kind == "ami":
                p.extra["transform"] = "translational"
                p.extra["separationVector"] = (-1.0, 0.0, 0.0)
    write_polymesh(m, d)
    for sub, body in (
        ("system/controlDict",
         "application scalarTransportFoam;\nstartFrom startTime;\n"
         "startTime 0; stopAt endTime; endTime 0.5; deltaT 0.005;\n"
         "writeControl runTime; writeInterval 1; writeFormat ascii;\n"),
        ("system/fvSchemes",
         "ddtSchemes { default Euler; }\n"
         "gradSchemes { default Gauss linear; }\n"
         "divSchemes { default none; div(phi,T) Gauss upwind; }\n"
         "laplacianSchemes { default Gauss linear orthogonal; }\n"
         "interpolationSchemes { default linear; }\n"
         "snGradSchemes { default orthogonal; }\n"),
        ("system/fvSolution",
         "solvers { T { solver PBiCGStab; preconditioner DILU;\n"
         "tolerance 1e-10; relTol 0; } }\n"
         "SIMPLE { nNonOrthogonalCorrectors 0; }\n"),
        ("constant/transportProperties",
         "DT DT [0 2 -1 0 0 0 0] 0.0;\n"),
    ):
        _write(os.path.join(d, sub),
               foamfile_header("dictionary", os.path.basename(sub),
                               os.path.dirname(sub)), body)
    # initial blob in FILE (raw mesh) cell order
    Cf0, Sf0 = face_centres_and_areas(m)
    C0, _ = cell_centres_and_vols(m, Cf0, Sf0)
    blob = np.exp(-((C0[:, 0] - 0.3) / 0.08) ** 2)
    from rapidcfd_tpu.fields.io import _body_value
    bdict = {"walls": "        type            zeroGradient;\n",
             "fb": "        type            empty;\n",
             '"(inlet|outlet)"': f"        type            {typ};\n"}
    write_field(d, "0", "T", "volScalarField", "[0 0 0 1 0 0 0]",
                _body_value(blob), bdict)
    write_field(d, "0", "U", "volVectorField", "[0 1 -1 0 0 0 0]",
                "uniform (1 0 0)",
                {"walls": "        type            fixedValue;\n"
                          "        value uniform (1 0 0);\n",
                 "fb": "        type            empty;\n",
                 '"(inlet|outlet)"': f"        type            {typ};\n"})
    return d


def _run_transport(d):
    L.Info.enabled = False
    try:
        from rapidcfd_tpu.solvers import basic
        case, T = basic.run_scalar_transport_foam(d, write=False)[:2]
    finally:
        L.Info.enabled = True
    C = np.asarray(case.mesh.C)
    k = np.lexsort((C[:, 1], C[:, 0]))
    return np.asarray(T.data)[k]


def test_conforming_ami_matches_merged_cyclic():
    """1:1 AMI periodic pair == the merged-cyclic implementation over a
    full transit of the blob (operator-identical discretization)."""
    t_cyc = _run_transport(_periodic_case("cyclic"))
    t_ami = _run_transport(_periodic_case("ami"))
    assert np.abs(t_cyc - t_ami).max() < 1e-6


def test_ami_weight_tables_conservative(tmp_path):
    d = str(tmp_path)
    ami_channel_case(d)
    L.Info.enabled = False
    try:
        from rapidcfd_tpu.solvers.case import Case
        mesh = Case(d).mesh
    finally:
        L.Info.enabled = True
    tabs = [(i, t) for i, t in enumerate(mesh.ami) if t is not None]
    assert len(tabs) == 2
    for i, t in tabs:
        rows = np.asarray(t.w.sum(1))
        assert np.allclose(rows, 1.0, atol=1e-12)
        assert t.w.shape[1] >= 2          # non-conforming: 8 vs 12


def test_nonconforming_linear_profile(tmp_path):
    """Steady conduction across an 8-face/12-face AMI interface: the
    solution is linear in x; interface error shows directly."""
    d = str(tmp_path)
    ami_channel_case(d, end_time=100.0, delta_t=0.5)
    L.Info.enabled = False
    try:
        from rapidcfd_tpu.solvers import basic
        case, T = basic.run_laplacian_foam(d, write=False)[:2]
    finally:
        L.Info.enabled = True
    C = np.asarray(case.mesh.C)
    exact = 400.0 + (300.0 - 400.0) * C[:, 0]
    assert np.abs(np.asarray(T.data) - exact).max() < 0.05


def test_vector_ghost_rotation():
    from rapidcfd_tpu.mesh.ami import rotation_about_axis
    R = rotation_about_axis([0, 0, 1], np.pi / 2)
    v = np.array([1.0, 0.0, 0.0])
    assert np.allclose(R @ v, [0.0, 1.0, 0.0], atol=1e-14)
    assert np.allclose(R @ R.T, np.eye(3), atol=1e-14)
