"""buoyantBoussinesqSimpleFoam: differentially-heated cavity."""

import os

import numpy as np
import pytest

from rapidcfd_tpu.utils import logging as L
from rapidcfd_tpu.utils.casegen import (_write, box_mesh, write_field)
from rapidcfd_tpu.utils.dictionary import foamfile_header
from rapidcfd_tpu.mesh.polymesh import write_polymesh


@pytest.fixture(scope="module")
def heated_cavity(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("buoy"))
    mesh = box_mesh(16, 16, 1, size=(1.0, 1.0, 0.1), patch_spec={
        "xmin": ("hotWall", "wall"), "xmax": ("coldWall", "wall"),
        "ymin": ("floor", "wall"), "ymax": ("ceiling", "wall"),
        "zmin": ("frontAndBack", "empty"),
        "zmax": ("frontAndBack", "empty")})
    write_polymesh(mesh, d)
    _write(os.path.join(d, "system", "controlDict"),
           foamfile_header("dictionary", "controlDict", "system"), """
application buoyantBoussinesqSimpleFoam;
startFrom startTime; startTime 0; stopAt endTime; endTime 100;
deltaT 1; writeControl timeStep; writeInterval 100; writeFormat ascii;
""")
    _write(os.path.join(d, "system", "fvSchemes"),
           foamfile_header("dictionary", "fvSchemes", "system"), """
ddtSchemes { default steadyState; }
gradSchemes { default Gauss linear; }
divSchemes { default none; div(phi,U) bounded Gauss upwind;
             div(phi,T) bounded Gauss upwind; }
laplacianSchemes { default Gauss linear orthogonal; }
interpolationSchemes { default linear; }
snGradSchemes { default orthogonal; }
""")
    _write(os.path.join(d, "system", "fvSolution"),
           foamfile_header("dictionary", "fvSolution", "system"), """
solvers
{
    p_rgh { solver GAMG; smoother GaussSeidel; tolerance 1e-08;
            relTol 0.05; }
    "(U|T)" { solver smoothSolver; smoother symGaussSeidel;
              tolerance 1e-07; relTol 0.1; }
}
SIMPLE { nNonOrthogonalCorrectors 0; pRefCell 0; pRefValue 0; }
relaxationFactors
{
    fields { p_rgh 0.5; }
    equations { U 0.5; T 0.5; }
}
""")
    _write(os.path.join(d, "constant", "transportProperties"),
           foamfile_header("dictionary", "transportProperties", "constant"),
           """
transportModel Newtonian;
nu              nu [0 2 -1 0 0 0 0] 1e-03;
beta            beta [0 0 0 -1 0 0 0] 3e-03;
TRef            TRef [0 0 0 1 0 0 0] 300;
Pr              Pr [0 0 0 0 0 0 0] 0.7;
Prt             Prt [0 0 0 0 0 0 0] 0.85;
""")
    _write(os.path.join(d, "constant", "g"),
           foamfile_header("uniformDimensionedVectorField", "g",
                           "constant"),
           "\ndimensions [0 1 -2 0 0 0 0];\nvalue (0 -9.81 0);\n")
    _write(os.path.join(d, "constant", "RASProperties"),
           foamfile_header("dictionary", "RASProperties", "constant"),
           "\nRASModel laminar;\nturbulence off;\n")
    wall_u = ("        type            fixedValue;\n"
              "        value           uniform (0 0 0);\n")
    write_field(d, "0", "U", "volVectorField", "[0 1 -1 0 0 0 0]",
                "uniform (0 0 0)", {
                    "hotWall": wall_u, "coldWall": wall_u,
                    "floor": wall_u, "ceiling": wall_u,
                    "frontAndBack": "        type            empty;\n"})
    write_field(d, "0", "p_rgh", "volScalarField", "[0 2 -2 0 0 0 0]",
                "uniform 0", {
                    "hotWall": "        type            zeroGradient;\n",
                    "coldWall": "        type            zeroGradient;\n",
                    "floor": "        type            zeroGradient;\n",
                    "ceiling": "        type            zeroGradient;\n",
                    "frontAndBack": "        type            empty;\n"})
    write_field(d, "0", "T", "volScalarField", "[0 0 0 1 0 0 0]",
                "uniform 300", {
                    "hotWall": "        type            fixedValue;\n"
                               "        value           uniform 310;\n",
                    "coldWall": "        type            fixedValue;\n"
                                "        value           uniform 290;\n",
                    "floor": "        type            zeroGradient;\n",
                    "ceiling": "        type            zeroGradient;\n",
                    "frontAndBack": "        type            empty;\n"})
    return d


def test_natural_convection_circulation(heated_cavity):
    L.Info.enabled = False
    from rapidcfd_tpu.solvers import buoyantfoam
    case, U, p_rgh, T, phi, ts = buoyantfoam.run(heated_cavity,
                                                 max_steps=60,
                                                 write=False)
    L.Info.enabled = True
    u = np.asarray(U.data)
    t = np.asarray(T.data)
    assert np.isfinite(u).all() and np.isfinite(t).all()
    assert 290.0 - 1e-6 <= t.min() and t.max() <= 310.0 + 1e-6
    # buoyancy drives circulation: rising at the hot wall (u_y > 0),
    # sinking at the cold wall (u_y < 0)
    C = np.asarray(case.mesh.C)
    hot_side = C[:, 0] < 0.2
    cold_side = C[:, 0] > 0.8
    assert u[hot_side, 1].mean() > 1e-4
    assert u[cold_side, 1].mean() < -1e-4


def test_boussinesq_pimple_transient(heated_cavity, tmp_path_factory):
    """buoyantBoussinesqPimpleFoam: transient startup of the heated
    cavity develops the same buoyant circulation."""
    import shutil
    src = heated_cavity[0] if isinstance(heated_cavity, tuple) \
        else heated_cavity
    d = str(tmp_path_factory.mktemp("buoyt"))
    shutil.rmtree(d)
    shutil.copytree(src, d)
    for t in os.listdir(d):
        if t not in ("0", "constant", "system") \
                and os.path.isdir(os.path.join(d, t)):
            shutil.rmtree(os.path.join(d, t))
    _write(os.path.join(d, "system", "controlDict"),
           foamfile_header("dictionary", "controlDict", "system"), """
application buoyantBoussinesqPimpleFoam;
startFrom startTime; startTime 0; stopAt endTime; endTime 2.0;
deltaT 0.05; writeControl timeStep; writeInterval 1000;
writeFormat ascii;
""")
    _write(os.path.join(d, "system", "fvSchemes"),
           foamfile_header("dictionary", "fvSchemes", "system"), """
ddtSchemes { default Euler; }
gradSchemes { default Gauss linear; }
divSchemes { default none; div(phi,U) Gauss upwind;
             div(phi,T) Gauss upwind; }
laplacianSchemes { default Gauss linear orthogonal; }
interpolationSchemes { default linear; }
snGradSchemes { default orthogonal; }
""")
    _write(os.path.join(d, "system", "fvSolution"),
           foamfile_header("dictionary", "fvSolution", "system"), """
solvers
{
    p_rgh { solver PCG; preconditioner DIC; tolerance 1e-08;
            relTol 0.01; }
    p_rghFinal { solver PCG; preconditioner DIC; tolerance 1e-08;
                 relTol 0; }
    "(U|T)" { solver smoothSolver; smoother symGaussSeidel;
              tolerance 1e-08; relTol 0; }
    "(U|T)Final" { solver smoothSolver; smoother symGaussSeidel;
                   tolerance 1e-08; relTol 0; }
}
PIMPLE { nOuterCorrectors 1; nCorrectors 2;
         nNonOrthogonalCorrectors 0; }
""")
    L.Info.enabled = False
    from rapidcfd_tpu.solvers import buoyantfoam
    case, U, p_rgh, T, phi, ts = buoyantfoam.run(d, write=False,
                                                 transient=True)
    L.Info.enabled = True
    u = np.asarray(U.data)
    t = np.asarray(T.data)
    assert np.isfinite(u).all() and np.isfinite(t).all()
    # buoyant rise at the hot wall after the startup transient
    C = np.asarray(case.mesh.C)
    hot = C[:, 0] < 0.1
    assert u[hot, 1].max() > 1e-4
    assert np.abs(u).max() < 5.0


def _stratified_skewed_cavity(d, p_bc, n=12, skew=0.25):
    """Stably-stratified closed cavity (cold floor, hot ceiling) on a
    node-skewed mesh: the continuum steady state is pure conduction with
    U = 0, so any residual velocity is discretization/BC imbalance."""
    import numpy as np
    mesh = box_mesh(n, n, 1, size=(1.0, 1.0, 0.1), patch_spec={
        "xmin": ("left", "wall"), "xmax": ("right", "wall"),
        "ymin": ("floor", "wall"), "ymax": ("ceiling", "wall"),
        "zmin": ("frontAndBack", "empty"),
        "zmax": ("frontAndBack", "empty")})
    pts = np.asarray(mesh.points).copy()
    npl = (n + 1) * (n + 1)
    rng = np.random.default_rng(7)
    xy = pts[:npl, :2].copy()
    h = 1.0 / n
    interior = ((xy[:, 0] > 1e-9) & (xy[:, 0] < 1 - 1e-9)
                & (xy[:, 1] > 1e-9) & (xy[:, 1] < 1 - 1e-9))
    xy[interior] += rng.uniform(-1, 1, (int(interior.sum()), 2)) * skew * h
    pts[:npl, :2] = xy
    pts[npl:2 * npl, :2] = xy
    mesh.points = pts
    write_polymesh(mesh, d)
    _write(os.path.join(d, "system", "controlDict"),
           foamfile_header("dictionary", "controlDict", "system"), """
application buoyantBoussinesqSimpleFoam;
startFrom startTime; startTime 0; stopAt endTime; endTime 10000;
deltaT 1; writeControl timeStep; writeInterval 10000; writeFormat ascii;
""")
    _write(os.path.join(d, "system", "fvSchemes"),
           foamfile_header("dictionary", "fvSchemes", "system"), """
ddtSchemes { default steadyState; }
gradSchemes { default Gauss linear; }
divSchemes { default none; div(phi,U) bounded Gauss upwind;
             div(phi,T) bounded Gauss upwind; }
laplacianSchemes { default Gauss linear corrected; }
interpolationSchemes { default linear; }
snGradSchemes { default corrected; }
""")
    _write(os.path.join(d, "system", "fvSolution"),
           foamfile_header("dictionary", "fvSolution", "system"), """
solvers
{
    p_rgh { solver PCG; preconditioner DIC; tolerance 1e-10; relTol 0; }
    "(U|T)" { solver smoothSolver; smoother symGaussSeidel;
              tolerance 1e-09; relTol 0; }
}
SIMPLE { nNonOrthogonalCorrectors 2; pRefCell 0; pRefValue 0; }
relaxationFactors
{
    fields { p_rgh 0.7; }
    equations { U 0.5; T 0.7; }
}
""")
    _write(os.path.join(d, "constant", "transportProperties"),
           foamfile_header("dictionary", "transportProperties",
                           "constant"), """
transportModel Newtonian;
nu              nu [0 2 -1 0 0 0 0] 1e-03;
beta            beta [0 0 0 -1 0 0 0] 3e-03;
TRef            TRef [0 0 0 1 0 0 0] 300;
Pr              Pr [0 0 0 0 0 0 0] 0.7;
Prt             Prt [0 0 0 0 0 0 0] 0.85;
""")
    _write(os.path.join(d, "constant", "g"),
           foamfile_header("uniformDimensionedVectorField", "g",
                           "constant"),
           "\ndimensions [0 1 -2 0 0 0 0];\nvalue (0 -9.81 0);\n")
    _write(os.path.join(d, "constant", "RASProperties"),
           foamfile_header("dictionary", "RASProperties", "constant"),
           "\nRASModel laminar;\nturbulence off;\n")
    wall_u = ("        type            fixedValue;\n"
              "        value           uniform (0 0 0);\n")
    write_field(d, "0", "U", "volVectorField", "[0 1 -1 0 0 0 0]",
                "uniform (0 0 0)", {
                    "left": wall_u, "right": wall_u,
                    "floor": wall_u, "ceiling": wall_u,
                    "frontAndBack": "        type            empty;\n"})
    write_field(d, "0", "p_rgh", "volScalarField", "[0 2 -2 0 0 0 0]",
                "uniform 0", {
                    "left": p_bc, "right": p_bc,
                    "floor": p_bc, "ceiling": p_bc,
                    "frontAndBack": "        type            empty;\n"})
    write_field(d, "0", "T", "volScalarField", "[0 0 0 1 0 0 0]",
                "uniform 300", {
                    "floor": "        type            fixedValue;\n"
                             "        value           uniform 290;\n",
                    "ceiling": "        type            fixedValue;\n"
                               "        value           uniform 310;\n",
                    "left": "        type            zeroGradient;\n",
                    "right": "        type            zeroGradient;\n",
                    "frontAndBack": "        type            empty;\n"})


@pytest.mark.slow
def test_fixed_flux_pressure_well_balanced(tmp_path_factory):
    """TRUE fixedFluxPressure (reference:
    fixedFluxPressureFvPatchScalarField.C:115-140): on the stably-
    stratified skewed cavity the solver-set boundary gradient balances
    the body-force flux, cutting the spurious steady velocity well
    below the zeroGradient stand-in; on the unskewed mesh the discrete
    balance is exact (machine-zero velocity)."""
    L.Info.enabled = False
    from rapidcfd_tpu.solvers import buoyantfoam

    def steady_max_u(p_bc, skew):
        d = str(tmp_path_factory.mktemp("wb"))
        _stratified_skewed_cavity(d, p_bc, skew=skew)
        case, U, p_rgh, T, phi, ts = buoyantfoam.run(d, max_steps=300,
                                                     write=False)
        u = np.asarray(U.data)
        assert np.isfinite(u).all()
        return np.abs(u).max()

    ffp = ("        type            fixedFluxPressure;\n"
           "        value           uniform 0;\n")
    zg = "        type            zeroGradient;\n"
    u_exact = steady_max_u(ffp, skew=0.0)
    assert u_exact < 1e-6, f"unskewed balance not exact: {u_exact}"
    u_ffp = steady_max_u(ffp, skew=0.25)
    u_zg = steady_max_u(zg, skew=0.25)
    assert u_ffp < 0.07, f"skewed-mesh spurious velocity too big: {u_ffp}"
    assert u_ffp < 0.5 * u_zg, (u_ffp, u_zg)
    L.Info.enabled = True
