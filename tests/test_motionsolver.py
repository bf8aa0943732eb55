"""fvMotionSolver: volPointInterpolation, swept volumes,
displacementLaplacian mesh motion under pimpleDyMFoam.

Reference semantics: src/fvMotionSolver/fvMotionSolvers/
displacementLaplacian, volPointInterpolation, face::sweptVol.
"""

import math
import os

import numpy as np

from rapidcfd_tpu.utils import logging as L
from rapidcfd_tpu.utils.casegen import _write, box_mesh, write_polymesh
from rapidcfd_tpu.utils.dictionary import foamfile_header
from tests.test_dynamicmesh import _dym_case


def _box_case(tmp, nx=8, ny=8):
    mesh = box_mesh(nx, ny, 1, size=(1.0, 1.0, 0.1))
    d = str(tmp)
    write_polymesh(mesh, d)
    return d


def test_point_interpolation_linear(tmp_path_factory):
    d = _box_case(tmp_path_factory.mktemp("pinterp"))
    from rapidcfd_tpu.mesh import build_mesh_arrays, read_polymesh
    from rapidcfd_tpu.mesh.pointinterp import build_point_interpolator
    pm = read_polymesh(d)
    ma, pm2, _ = build_mesh_arrays(pm)
    interp = build_point_interpolator(pm2, ma)

    # constant field -> exactly constant at every point
    c = np.full(ma.n_cells, 3.25)
    bc = np.full(ma.n_faces - ma.n_internal, 3.25)
    pv = np.asarray(interp(c, bc))
    assert np.abs(pv - 3.25).max() < 1e-12

    # linear field f = x: inverse-distance with boundary faces tracks
    # the point abscissa closely (exact on symmetric interior stencils)
    C = np.asarray(ma.C)
    cfb = np.asarray(ma.Cf)[ma.n_internal:]
    pv = np.asarray(interp(C[:, 0], cfb[:, 0]))
    pts = np.asarray(pm2.points)
    assert np.abs(pv - pts[:, 0]).max() < 0.05


def test_swept_volumes_translation_and_scl(tmp_path_factory):
    d = _box_case(tmp_path_factory.mktemp("swept"))
    from rapidcfd_tpu.mesh import build_mesh_arrays, read_polymesh
    from rapidcfd_tpu.models.motionsolver import swept_volumes
    pm = read_polymesh(d)
    ma, pm2, _ = build_mesh_arrays(pm)
    pts0 = np.asarray(pm2.points, float)

    # rigid translation: sweptVol == Sf . d exactly, per face
    dvec = np.array([0.02, -0.01, 0.005])
    vol = swept_volumes(pm2, pts0, pts0 + dvec)
    Sf = np.asarray(ma.Sf)
    assert np.abs(vol - Sf @ dvec).max() < 1e-12

    # non-uniform stretch: per-cell signed sum of swept volumes equals
    # the cell volume change (space-conservation law)
    pts1 = pts0.copy()
    pts1[:, 0] *= 1.0 + 0.2 * pts1[:, 1]
    vol = swept_volumes(pm2, pts0, pts1)
    import dataclasses
    ma1, _, _ = build_mesh_arrays(
        dataclasses.replace(pm2, points=pts1), renumber=False)
    own = np.asarray(ma.owner)
    nei = np.asarray(ma.neighbour)
    dv = np.zeros(ma.n_cells)
    np.add.at(dv, own, vol)
    np.subtract.at(dv, nei, vol[:ma.n_internal])
    dv_true = np.asarray(ma1.V) - np.asarray(ma.V)
    assert np.abs(dv - dv_true).max() < 1e-10 * np.asarray(ma.V).max()


def test_displacement_laplacian_galilean(tmp_path_factory):
    """All boundaries translating rigidly (linearDisplacement) must
    reproduce the solid-body Galilean invariance result."""
    d = str(tmp_path_factory.mktemp("dlapg"))
    _dym_case(d, """
dynamicFvMesh   dynamicMotionSolverFvMesh;
motionSolver    displacementLaplacian;
diffusivity     uniform;
movingPatches
{
    walls { type linearDisplacement; velocity (1 0 0); }
}
""", u0="(1 0 0)")
    L.Info.enabled = False
    try:
        from rapidcfd_tpu.solvers import pimpledymfoam
        case, U, p, phi, _ = pimpledymfoam.run(d, write=False,
                                               max_steps=6)
    finally:
        L.Info.enabled = True
    u = np.asarray(U.data)
    assert np.abs(u[:, 0] - 1.0).max() < 1e-5
    assert np.abs(u[:, 1:]).max() < 1e-5
    assert float(np.asarray(case.mesh.C)[:, 0].mean()) > 0.02


def test_oscillating_wall_deforms_mesh(tmp_path_factory):
    """ymax wall oscillates down; interior deforms smoothly, solution
    stays finite, moving-wall points follow the prescribed motion."""
    d = str(tmp_path_factory.mktemp("dlapo"))
    mesh = box_mesh(10, 10, 1, size=(0.1, 0.1, 0.01), patch_spec={
        "xmin": ("sides", "wall"), "xmax": ("sides", "wall"),
        "ymin": ("sides", "wall"), "ymax": ("piston", "wall"),
        "zmin": ("fb", "empty"), "zmax": ("fb", "empty")})
    write_polymesh(mesh, d)
    for fn, body in [
        ("system/controlDict", """
application pimpleDyMFoam; startFrom startTime; startTime 0;
stopAt endTime; endTime 0.02; deltaT 0.002;
writeControl timeStep; writeInterval 1000; writeFormat ascii;
"""),
        ("system/fvSchemes", """
ddtSchemes { default Euler; }
gradSchemes { default Gauss linear; }
divSchemes { default none; div(phi,U) Gauss linear; }
laplacianSchemes { default Gauss linear orthogonal; }
interpolationSchemes { default linear; }
snGradSchemes { default orthogonal; }
"""),
        ("system/fvSolution", """
solvers
{
    p { solver PCG; preconditioner DIC; tolerance 1e-09; relTol 0; }
    pFinal { solver PCG; preconditioner DIC; tolerance 1e-09; relTol 0; }
    U { solver smoothSolver; smoother symGaussSeidel;
        tolerance 1e-09; relTol 0; }
    UFinal { solver smoothSolver; smoother symGaussSeidel;
             tolerance 1e-09; relTol 0; }
    cellDisplacement { solver PCG; preconditioner DIC;
                       tolerance 1e-08; relTol 0; }
}
PIMPLE { nOuterCorrectors 1; nCorrectors 2;
         nNonOrthogonalCorrectors 0; pRefCell 0; pRefValue 0; }
"""),
        ("constant/transportProperties",
         "\nnu              nu [0 2 -1 0 0 0 0] 0.001;\n"),
        ("constant/RASProperties",
         "\nRASModel        laminar;\nturbulence      off;\n"),
        ("constant/dynamicMeshDict", """
dynamicFvMesh   dynamicMotionSolverFvMesh;
motionSolver    displacementLaplacian;
diffusivity     inverseDistance (piston);
movingPatches
{
    piston { type oscillatingDisplacement;
             amplitude (0 -0.004 0); omega 62.8318; }
}
"""),
    ]:
        name = os.path.basename(fn)
        loc = os.path.dirname(fn)
        _write(os.path.join(d, fn),
               foamfile_header("dictionary", name, loc), body)
    from rapidcfd_tpu.utils.casegen import write_field
    write_field(d, "0", "p", "volScalarField", "[0 2 -2 0 0 0 0]",
                "uniform 0", {
                    "sides": "        type            zeroGradient;\n",
                    "piston": "        type            zeroGradient;\n",
                    "fb": "        type            empty;\n"})
    write_field(d, "0", "U", "volVectorField", "[0 1 -1 0 0 0 0]",
                "uniform (0 0 0)", {
                    "sides":
                        "        type            fixedValue;\n"
                        "        value           uniform (0 0 0);\n",
                    "piston":
                        "        type            movingWallVelocity;\n"
                        "        value           uniform (0 0 0);\n",
                    "fb": "        type            empty;\n"})

    L.Info.enabled = False
    try:
        from rapidcfd_tpu.models.dynamicmesh import make_dynamic_mesh
        from rapidcfd_tpu.solvers import pimpledymfoam
        case, U, p, phi, _ = pimpledymfoam.run(d, write=False,
                                               max_steps=10)
    finally:
        L.Info.enabled = True
    assert np.isfinite(np.asarray(U.data)).all()
    assert np.isfinite(np.asarray(p.data)).all()

    # replay the motion solver alone to inspect the moved points
    case2 = __import__("rapidcfd_tpu.solvers.case",
                       fromlist=["Case"]).Case(d)
    dyn = make_dynamic_mesh(case2)
    for k in range(1, 11):
        dyn.update(0.002 * k)

    # piston points follow the prescription exactly at t = 10*0.002
    t = 0.02
    dy = -0.004 * math.sin(62.8318 * t)
    pts = dyn.prev_points
    piston_pts = dyn._patch_points[
        [i for i, pp in enumerate(case2.mesh.patches)
         if pp.name == "piston"][0]]
    assert np.abs(pts[piston_pts, 1] - (0.1 + dy)).max() < 1e-10
    # interior deformed non-uniformly (smooth Laplacian falloff)
    moved = pts[:, 1] - dyn.points0[:, 1]
    interior = (dyn.points0[:, 1] > 0.01) & (dyn.points0[:, 1] < 0.09)
    assert moved[interior].min() < -1e-5
    assert np.abs(moved[dyn.points0[:, 1] < 1e-9]).max() < 1e-12
