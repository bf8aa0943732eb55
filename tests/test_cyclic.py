"""Cyclic (periodic) patches: coupled-internal-face merging."""

import os

import numpy as np
import pytest

from rapidcfd_tpu.mesh import build_mesh_arrays
from rapidcfd_tpu.mesh.polymesh import write_polymesh
from rapidcfd_tpu.utils import logging as L
from rapidcfd_tpu.utils.casegen import _write, box_mesh, write_field
from rapidcfd_tpu.utils.dictionary import foamfile_header


def _periodic_duct_mesh():
    return box_mesh(40, 1, 1, size=(1.0, 0.05, 0.05), patch_spec={
        "xmin": ("left", "cyclic", "right"),
        "xmax": ("right", "cyclic", "left"),
        "ymin": ("sides", "empty"), "ymax": ("sides", "empty"),
        "zmin": ("fb", "empty"), "zmax": ("fb", "empty")})


def test_cyclic_mesh_merging():
    mesh = _periodic_duct_mesh()
    ma, pmesh, maps = build_mesh_arrays(mesh)
    # 39 interior + 1 periodic coupling = 40 internal faces, ring topology
    assert ma.n_internal == 40
    assert [p.name for p in ma.patches] == ["sides", "fb"]
    # every cell has exactly 2 active slots (1D ring)
    sg = np.asarray(ma.cell_sign)
    assert ((sg != 0).sum(axis=1) == 2).all()
    # periodic face interpolation weight is 0.5 on the uniform mesh
    w = np.asarray(ma.weights)
    assert np.allclose(w, 0.5, atol=1e-12)
    dc = np.asarray(ma.delta_coeffs)
    assert np.allclose(dc, 1.0 / 0.025, rtol=1e-10)  # 1/dx


def test_cyclic_advection_wraps(tmp_path_factory):
    """Advect a blob once around the periodic ring: total T conserved
    exactly, the blob comes back to its start."""
    d = str(tmp_path_factory.mktemp("ring"))
    mesh = _periodic_duct_mesh()
    write_polymesh(mesh, d)
    _write(os.path.join(d, "system", "controlDict"),
           foamfile_header("dictionary", "controlDict", "system"), """
application scalarTransportFoam; startFrom startTime; startTime 0;
stopAt endTime; endTime 1.0; deltaT 0.005;
writeControl timeStep; writeInterval 10000; writeFormat ascii;
""")
    _write(os.path.join(d, "system", "fvSchemes"),
           foamfile_header("dictionary", "fvSchemes", "system"), """
ddtSchemes { default Euler; }
gradSchemes { default Gauss linear; }
divSchemes { default none; div(phi,T) Gauss vanLeer; }
laplacianSchemes { default Gauss linear orthogonal; }
interpolationSchemes { default linear; }
snGradSchemes { default orthogonal; }
""")
    _write(os.path.join(d, "system", "fvSolution"),
           foamfile_header("dictionary", "fvSolution", "system"), """
solvers { T { solver PBiCGStab; preconditioner DILU; tolerance 1e-10;
              relTol 0; } }
SIMPLE { nNonOrthogonalCorrectors 0; }
""")
    _write(os.path.join(d, "constant", "transportProperties"),
           foamfile_header("dictionary", "transportProperties", "constant"),
           "\nDT              DT [0 2 -1 0 0 0 0] 0;\n")
    # blob initial condition, built on the file (pre-renumber) ordering
    from rapidcfd_tpu.mesh.geometry import (cell_centres_and_vols,
                                            face_centres_and_areas)
    Cf, Sf = face_centres_and_areas(mesh)
    C, V = cell_centres_and_vols(mesh, Cf, Sf)
    blob = np.exp(-((C[:, 0] - 0.25) / 0.08) ** 2)
    from rapidcfd_tpu.fields.io import _body_value
    write_field(d, "0", "T", "volScalarField", "[0 0 0 1 0 0 0]",
                _body_value(blob, prec=10),
                {"sides": "        type            empty;\n",
                 "fb": "        type            empty;\n"})
    write_field(d, "0", "U", "volVectorField", "[0 1 -1 0 0 0 0]",
                "uniform (1 0 0)",
                {"sides": "        type            empty;\n",
                 "fb": "        type            empty;\n"})
    L.Info.enabled = False
    from rapidcfd_tpu.solvers.basic import run_scalar_transport_foam
    case, T = run_scalar_transport_foam(d, write=False)
    L.Info.enabled = True
    t = np.asarray(T.data)
    assert np.isfinite(t).all()
    # exact conservation through the periodic boundary
    V_d = np.asarray(case.mesh.V)
    t0 = np.asarray(case.read_field("T", "0").data)
    assert abs((t * V_d).sum() - (t0 * V_d).sum()) < 1e-7 * (t0 * V_d).sum()
    # after exactly one period (t=1, U=1, L=1) the blob is back: peak
    # near x=0.25 (vanLeer diffuses but the peak location is robust)
    C_d = np.asarray(case.mesh.C)
    x_peak = C_d[np.argmax(t), 0]
    assert abs(x_peak - 0.25) < 0.1
    # TVD boundedness through the cyclic face
    assert t.min() > -1e-10 and t.max() < 1.0 + 1e-10


@pytest.mark.parametrize("typ", ["cyclicSlip", "nonuniformTransformCyclic"])
def test_cyclic_wrapper_types_merge(typ, tmp_path):
    """cyclicSlip / nonuniformTransformCyclic are light wrappers around
    cyclic (reference cyclicSlipFvPatchField.H:31-33): reading a
    boundary file with these types must route onto the cyclic merge and
    give the identical mesh; write-back preserves the original
    spelling."""
    from rapidcfd_tpu.mesh.polymesh import read_polymesh

    mesh = box_mesh(40, 1, 1, size=(1.0, 0.05, 0.05), patch_spec={
        "xmin": ("left", typ, "right"),
        "xmax": ("right", typ, "left"),
        "ymin": ("sides", "empty"), "ymax": ("sides", "empty"),
        "zmin": ("fb", "empty"), "zmax": ("fb", "empty")})
    d = str(tmp_path)
    write_polymesh(mesh, d)
    m = read_polymesh(d)
    assert all(p.type == "cyclic" for p in m.patches
               if p.name in ("left", "right"))
    ma, _, _ = build_mesh_arrays(m)
    assert ma.n_internal == 40          # periodic ring merged
    assert [p.name for p in ma.patches] == ["sides", "fb"]
    # write-back round-trips the original type spelling
    d2 = str(tmp_path / "out")
    write_polymesh(m, d2)
    btext = open(os.path.join(d2, "constant", "polyMesh",
                              "boundary")).read()
    assert typ in btext and "_originalType" not in btext
