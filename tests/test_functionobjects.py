"""functionObjects: probes, minMax, forces/coeffs, sets, fieldValue,
derived-field utilities — driven through a short simpleFoam run."""

import os

import numpy as np
import pytest

from rapidcfd_tpu.utils import logging as L
from rapidcfd_tpu.utils.casegen import pitz_daily_case


@pytest.fixture(scope="module")
def fo_run(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("fo"))
    pitz_daily_case(d, end_time=6)
    with open(os.path.join(d, "system", "controlDict"), "a") as f:
        f.write("""
functions
{
    probes1
    {
        type probes;
        fields (p U);
        probeLocations ((0.05 0.0 0) (0.2 0.02 0));
    }
    minmax { type fieldMinMax; fields (U p); log false; }
    wallForces
    {
        type forces;
        patches (lowerWall upperWall);
        rhoInf 1.2;
        CofR (0 0 0);
    }
    coeffs
    {
        type forceCoeffs;
        patches (lowerWall);
        rhoInf 1.2; magUInf 10; Aref 0.001; lRef 0.1;
        liftDir (0 1 0); dragDir (1 0 0); pitchAxis (0 0 1);
    }
    centreline
    {
        type sets;
        fields (U p);
        setFormat csv;
        sets
        {
            mid { type uniform; axis x; start (0 0.01 0);
                  end (0.28 0.01 0); nPoints 50; }
        }
    }
    avgP
    {
        type fieldValue;
        source all;
        operation volAverage;
        fields (p);
    }
    inletFlux
    {
        type faceSource;
        source patch;
        sourceName inlet;
        operation areaAverage;
        fields (U);
    }
    yp   { type yPlusRAS; }
    wss  { type wallShearStress; }
}
""")
    L.Info.enabled = False
    from rapidcfd_tpu.solvers import simplefoam
    out = simplefoam.run(d, write=False)
    L.Info.enabled = True
    return (d,) + out


def test_probes_written(fo_run):
    d = fo_run[0]
    pdir = os.path.join(d, "postProcessing", "probes1", "0")
    for fname in ("p", "U"):
        lines = open(os.path.join(pdir, fname)).read().strip().split("\n")
        assert lines[0].startswith("# probes:")
        assert len(lines) >= 6          # one row per iteration
        assert np.isfinite(float(lines[-1].split()[0]))


def test_minmax_and_fieldvalue(fo_run):
    d = fo_run[0]
    mm = open(os.path.join(d, "postProcessing", "minmax", "0",
                           "fieldMinMax.dat")).read().strip().split("\n")
    rows = [ln for ln in mm if not ln.startswith("#")]
    assert any("U" in r for r in rows) and any(" p " in r for r in rows)
    fv = open(os.path.join(d, "postProcessing", "avgP", "0",
                           "fieldValue.dat")).read().strip().split("\n")
    vals = [float(r.split()[-1]) for r in fv if not r.startswith("#")]
    assert all(np.isfinite(v) for v in vals)
    # inlet areaAverage of U ~ inlet velocity (10, 0, 0)
    fx = open(os.path.join(d, "postProcessing", "inletFlux", "0",
                           "fieldValue.dat")).read().strip().split("\n")
    row = [r for r in fx if not r.startswith("#")][-1].split()
    assert abs(float(row[2]) - 10.0) < 1e-6


def test_forces_and_coeffs(fo_run):
    d = fo_run[0]
    fdat = open(os.path.join(d, "postProcessing", "wallForces", "0",
                             "forces.dat")).read()
    assert "(" in fdat
    cdat = open(os.path.join(d, "postProcessing", "coeffs", "0",
                             "forceCoeffs.dat")).read().strip().split("\n")
    last = [float(x) for x in
            [c for c in cdat if not c.startswith("#")][-1].split()]
    assert all(np.isfinite(v) for v in last)
    # wall drag opposes the +x flow -> physically nonzero Cd
    assert last[2] != 0.0


def test_sets_csv(fo_run):
    d = fo_run[0]
    base = os.path.join(d, "postProcessing", "centreline", "0")
    tdirs = sorted(os.listdir(base), key=float)
    csv = os.path.join(base, tdirs[-1], "mid_U.csv")
    lines = open(csv).read().strip().split("\n")
    assert lines[0] == "distance,U_x,U_y,U_z"
    assert len(lines) == 51
    row = [float(x) for x in lines[25].split(",")]
    assert np.isfinite(row).all()


def test_wall_utilities(fo_run):
    d = fo_run[0]
    yp = open(os.path.join(d, "postProcessing", "yp", "0",
                           "yPlus.dat")).read().strip().split("\n")
    rows = [r for r in yp if not r.startswith("#")]
    assert rows and all(np.isfinite(float(r.split()[-1])) for r in rows)
    wss = open(os.path.join(d, "postProcessing", "wss", "0",
                            "wallShearStress.dat")).read().strip()
    assert "lowerWall" in wss and "upperWall" in wss


def test_sampled_surfaces(tmp_path_factory):
    """surfaces FO: patch geometry + plane cut written as VTK polydata."""
    d = str(tmp_path_factory.mktemp("surf"))
    pitz_daily_case(d, end_time=3)
    with open(os.path.join(d, "system", "controlDict"), "a") as f:
        f.write("""
functions
{
    surf
    {
        type surfaces;
        fields (U p);
        surfaces
        {
            lower { type patch; patchName lowerWall; }
            cut   { type plane; nPoints 20;
                    basePoint (0.1 0 0); normalVector (1 0 0); }
        }
    }
}
""")
    L.Info.enabled = False
    from rapidcfd_tpu.solvers import simplefoam
    simplefoam.run(d, write=False)
    L.Info.enabled = True
    base = os.path.join(d, "postProcessing", "surf", "0")
    tdirs = sorted(os.listdir(base), key=float)
    vtk = open(os.path.join(base, tdirs[-1], "lower.vtk")).read()
    assert "DATASET POLYDATA" in vtk and "VECTORS U float" in vtk
    assert "SCALARS p float 1" in vtk
    npolys = int([ln for ln in vtk.split("\n")
                  if ln.startswith("POLYGONS")][0].split()[1])
    assert npolys > 50                    # lowerWall face count
    cut = open(os.path.join(base, tdirs[-1], "cut.vtk")).read()
    assert "POLYGONS 361" in cut          # 19x19 quads


def test_new_function_objects_batch(tmp_path_factory):
    """Lambda2/Peclet/CourantNo/pressureTools/turbulenceFields/
    blendingFactor/streamLine/systemCall/writeRegisteredObject run on a
    pisoFoam cavity and produce their outputs."""
    import os
    import numpy as np
    from rapidcfd_tpu.utils.casegen import _write, cavity_case
    from rapidcfd_tpu.utils.dictionary import foamfile_header
    from rapidcfd_tpu.utils import logging as L
    d = str(tmp_path_factory.mktemp("fos2"))
    cavity_case(d, end_time=0.02)
    _write(os.path.join(d, "constant", "RASProperties"),
           foamfile_header("dictionary", "RASProperties", "constant"),
           "\nRASModel        laminar;\nturbulence      off;\n")
    cd = os.path.join(d, "system", "controlDict")
    s = open(cd).read().replace("runTimeModifiable true;", """
runTimeModifiable true;
functions
{
    lam2     { type Lambda2; }
    pec      { type Peclet; }
    co       { type CourantNo; }
    ptot     { type pressureTools; }
    tf       { type turbulenceFields; }
    bf       { type blendingFactor; field U; }
    sl       { type streamLine; nPoints 3; lifeTime 60;
               seedSampleSet { start (0.01 0.05 0.005);
                               end (0.09 0.05 0.005); } }
    sc       { type systemCall;
               executeCalls ( "true" ); }
    wro      { type writeRegisteredObject; objects ( U ); }
}
""")
    open(cd, "w").write(s)
    # make every step a write time so the write-gated FOs fire
    s = open(cd).read().replace("writeInterval   20;",
                                "writeInterval   1;")
    open(cd, "w").write(s)
    L.Info.enabled = False
    try:
        from rapidcfd_tpu.solvers import pimplefoam
        case, U, p, phi, ts = pimplefoam.run(d, max_steps=3,
                                             piso_mode=True)
    finally:
        L.Info.enabled = True
    base = os.path.join(d, "postProcessing")
    assert os.path.isfile(os.path.join(base, "pec", "0", "Peclet.dat"))
    slfiles = os.listdir(os.path.join(base, "sl", "0"))
    assert any(f.startswith("streamlines") for f in slfiles)
    # derived fields written into time dirs
    tdirs = [t for t in os.listdir(d)
             if t.replace(".", "").isdigit() and t != "0"]
    assert tdirs
    some = os.path.join(d, sorted(tdirs)[-1])
    names = os.listdir(some)
    for fn in ("Lambda2", "Q", "total(p)", "Co"):
        if fn == "Q":
            continue
        assert fn in names or any(fn in n for n in names), \
            (fn, names)


def test_near_wall_and_surface_interp_fos(tmp_path_factory):
    import os
    import numpy as np
    from rapidcfd_tpu.utils.casegen import _write, cavity_case
    from rapidcfd_tpu.utils.dictionary import foamfile_header
    from rapidcfd_tpu.utils import logging as L
    d = str(tmp_path_factory.mktemp("fos3"))
    cavity_case(d, end_time=0.01)
    _write(os.path.join(d, "constant", "RASProperties"),
           foamfile_header("dictionary", "RASProperties", "constant"),
           "\nRASModel        laminar;\nturbulence      off;\n")
    cd = os.path.join(d, "system", "controlDict")
    s = open(cd).read().replace("runTimeModifiable true;", """
runTimeModifiable true;
functions
{
    nwf { type nearWallFields; fields ( (U UNear) );
          distance 0.01; }
    sif { type surfaceInterpolateFields; fields ( (U Uf) ); }
}
""").replace("writeInterval   20;", "writeInterval   1;")
    open(cd, "w").write(s)
    L.Info.enabled = False
    try:
        from rapidcfd_tpu.solvers import pimplefoam
        case, U, p, phi, ts = pimplefoam.run(d, max_steps=2,
                                             piso_mode=True)
    finally:
        L.Info.enabled = True
    base = os.path.join(d, "postProcessing")
    assert os.path.isfile(os.path.join(base, "nwf", "0",
                                       "nearWallFields.dat"))
    assert os.path.isfile(os.path.join(
        base, "sif", "0", "surfaceInterpolateFields.dat"))


def test_sampled_surfaces_ensight(tmp_path_factory):
    """surfaces FO with surfaceFormat ensight: EnSight Gold ascii
    case/geo/variable files (reference: sampledSurface/writers/
    ensight) — structure + counts verified."""
    d = str(tmp_path_factory.mktemp("surfens"))
    pitz_daily_case(d, end_time=2)
    with open(os.path.join(d, "system", "controlDict"), "a") as f:
        f.write("""
functions
{
    surf
    {
        type surfaces;
        surfaceFormat ensight;
        fields (U p);
        surfaces { lower { type patch; patchName lowerWall; } }
    }
}
""")
    L.Info.enabled = False
    from rapidcfd_tpu.solvers import simplefoam
    simplefoam.run(d, write=False)
    L.Info.enabled = True
    base = os.path.join(d, "postProcessing", "surf", "0")
    tdirs = sorted(os.listdir(base), key=float)
    out = os.path.join(base, tdirs[-1])
    case_txt = open(os.path.join(out, "lower.case")).read()
    assert "type: ensight gold" in case_txt
    assert "scalar per element: p lower.p" in case_txt
    assert "vector per element: U lower.U" in case_txt
    geo = open(os.path.join(out, "lower.geo")).read().splitlines()
    assert geo[0] == "EnSight Geometry File"
    i = geo.index("coordinates")
    npts = int(geo[i + 1])
    assert npts > 50
    j = geo.index("nsided")
    nfaces = int(geo[j + 1])
    assert nfaces > 50
    pvals = open(os.path.join(out, "lower.p")).read().split()
    # header (1 word) + 'part' + id + 'nsided' + nfaces values
    assert len(pvals) == 4 + nfaces
    uvals = open(os.path.join(out, "lower.U")).read().split()
    assert len(uvals) == 4 + 3 * nfaces
