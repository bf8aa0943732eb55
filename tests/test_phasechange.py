"""interPhaseChangeFoam (SchnerrSauer cavitation)."""

import os

import numpy as np
import pytest

from rapidcfd_tpu.mesh.polymesh import write_polymesh
from rapidcfd_tpu.utils import logging as L
from rapidcfd_tpu.utils.casegen import _write, box_mesh, write_field
from rapidcfd_tpu.utils.dictionary import foamfile_header

_EMPTY = "        type            empty;\n"
_ZG = "        type            zeroGradient;\n"


def _fv(v):
    return ("        type            fixedValue;\n"
            f"        value           uniform {v};\n")


def test_cavitating_channel(tmp_path_factory):
    """Liquid channel discharging into a below-vapour-pressure outlet:
    vapour forms near the outlet (alpha1 < 1), everything bounded."""
    d = str(tmp_path_factory.mktemp("cav"))
    mesh = box_mesh(30, 6, 1, size=(0.1, 0.02, 0.005), patch_spec={
        "xmin": ("inlet", "patch"), "xmax": ("outlet", "patch"),
        "ymin": ("walls", "wall"), "ymax": ("walls", "wall"),
        "zmin": ("fb", "empty"), "zmax": ("fb", "empty")})
    write_polymesh(mesh, d)
    _write(os.path.join(d, "system", "controlDict"),
           foamfile_header("dictionary", "controlDict", "system"), """
application interPhaseChangeFoam; startFrom startTime; startTime 0;
stopAt endTime; endTime 0.002; deltaT 5e-05;
writeControl timeStep; writeInterval 1000; writeFormat ascii;
""")
    _write(os.path.join(d, "system", "fvSchemes"),
           foamfile_header("dictionary", "fvSchemes", "system"), """
ddtSchemes { default Euler; }
gradSchemes { default Gauss linear; }
divSchemes { default none; div(phi,alpha) Gauss vanLeer;
             div(rhoPhi,U) Gauss upwind; }
laplacianSchemes { default Gauss linear orthogonal; }
interpolationSchemes { default linear; }
snGradSchemes { default orthogonal; }
""")
    _write(os.path.join(d, "system", "fvSolution"),
           foamfile_header("dictionary", "fvSolution", "system"), """
solvers
{
    alpha1 { solver PBiCGStab; preconditioner DILU; tolerance 1e-10;
             relTol 0; }
    p_rgh { solver PCG; preconditioner DIC; tolerance 1e-08;
            relTol 0.01; }
    p_rghFinal { solver PCG; preconditioner DIC; tolerance 1e-08;
                 relTol 0; }
    U { solver smoothSolver; smoother symGaussSeidel; tolerance 1e-07;
        relTol 0; }
}
PIMPLE { nOuterCorrectors 1; nCorrectors 2;
         nNonOrthogonalCorrectors 0; }
""")
    _write(os.path.join(d, "constant", "transportProperties"),
           foamfile_header("dictionary", "transportProperties",
                           "constant"), """
phases (water vapour);
phase1 { rho rho [1 -3 0 0 0 0 0] 1000; nu nu [0 2 -1 0 0 0 0] 9e-07; }
phase2 { rho rho [1 -3 0 0 0 0 0] 0.02; nu nu [0 2 -1 0 0 0 0] 4e-05; }
sigma           sigma [1 0 -2 0 0 0 0] 0.07;
phaseChangeTwoPhaseMixture SchnerrSauer;
pSat            pSat [1 -1 -2 0 0 0 0] 2300;
SchnerrSauerCoeffs
{
    n               n [0 -3 0 0 0 0 0] 1.6e+13;
    dNuc            dNuc [0 1 0 0 0 0 0] 2e-06;
    Cc              Cc [0 0 0 0 0 0 0] 1;
    Cv              Cv [0 0 0 0 0 0 0] 1;
}
""")
    _write(os.path.join(d, "constant", "g"),
           foamfile_header("uniformDimensionedVectorField", "g",
                           "constant"),
           "\ndimensions      [0 1 -2 0 0 0 0];\nvalue           "
           "(0 0 0);\n")
    write_field(d, "0", "alpha1", "volScalarField", "[0 0 0 0 0 0 0]",
                "uniform 1", {"inlet": _fv(1), "outlet": _ZG,
                              "walls": _ZG, "fb": _EMPTY})
    write_field(d, "0", "U", "volVectorField", "[0 1 -1 0 0 0 0]",
                "uniform (5 0 0)", {
                    "inlet": _fv("(5 0 0)"), "outlet": _ZG,
                    "walls": _fv("(0 0 0)"), "fb": _EMPTY})
    write_field(d, "0", "p_rgh", "volScalarField", "[1 -1 -2 0 0 0 0]",
                "uniform 1000", {
                    "inlet": _ZG, "outlet": _fv(1000),
                    "walls": _ZG, "fb": _EMPTY})
    L.Info.enabled = False
    from rapidcfd_tpu.solvers.interphasechangefoam import run
    case, alpha, U, p_rgh, phi = run(d, write=False)
    L.Info.enabled = True
    a = np.asarray(alpha.data)
    u = np.asarray(U.data)
    pr = np.asarray(p_rgh.data)
    assert np.isfinite(a).all() and np.isfinite(u).all()
    assert np.isfinite(pr).all()
    assert (a >= -1e-9).all() and (a <= 1.0 + 1e-9).all()
    # vapour was produced where p < pSat (outlet at 1000 < pSat 2300)
    assert a.min() < 0.9999
    vap_frac = float(((1.0 - a) * np.asarray(case.mesh.V)).sum()
                     / np.asarray(case.mesh.V).sum())
    assert vap_frac > 1e-7
    assert np.abs(u).max() < 100.0


def test_cavitating_foam_expansion(tmp_path_factory):
    """cavitatingFoam: liquid accelerating into a low-pressure outlet
    flashes to vapour via the barotropic relation; rho/alphav bounded."""
    d = str(tmp_path_factory.mktemp("bcav"))
    mesh = box_mesh(40, 4, 1, size=(0.04, 0.004, 0.001), patch_spec={
        "xmin": ("inlet", "patch"), "xmax": ("outlet", "patch"),
        "ymin": ("walls", "wall"), "ymax": ("walls", "wall"),
        "zmin": ("fb", "empty"), "zmax": ("fb", "empty")})
    write_polymesh(mesh, d)
    _write(os.path.join(d, "system", "controlDict"),
           foamfile_header("dictionary", "controlDict", "system"), """
application cavitatingFoam; startFrom startTime; startTime 0;
stopAt endTime; endTime 0.0004; deltaT 2e-06;
writeControl timeStep; writeInterval 1000; writeFormat ascii;
""")
    _write(os.path.join(d, "system", "fvSchemes"),
           foamfile_header("dictionary", "fvSchemes", "system"), """
ddtSchemes { default Euler; }
gradSchemes { default Gauss linear; }
divSchemes { default none; div(phi,rho) Gauss upwind;
             div(rhoPhi,U) Gauss upwind; }
laplacianSchemes { default Gauss linear orthogonal; }
interpolationSchemes { default linear; }
snGradSchemes { default orthogonal; }
""")
    _write(os.path.join(d, "system", "fvSolution"),
           foamfile_header("dictionary", "fvSolution", "system"), """
solvers
{
    rho { solver PBiCGStab; preconditioner DILU; tolerance 1e-08;
          relTol 0; }
    p { solver PCG; preconditioner DIC; tolerance 1e-08; relTol 0.01; }
    pFinal { solver PCG; preconditioner DIC; tolerance 1e-08; relTol 0; }
    U { solver smoothSolver; smoother symGaussSeidel; tolerance 1e-07;
        relTol 0; }
}
PIMPLE { nOuterCorrectors 2; nCorrectors 1;
         nNonOrthogonalCorrectors 0; }
""")
    _write(os.path.join(d, "constant", "thermodynamicProperties"),
           foamfile_header("dictionary", "thermodynamicProperties",
                           "constant"), """
psil            psil [0 -2 2 0 0] 4.54e-07;
rholSat         rholSat [1 -3 0 0 0] 830;
psiv            psiv [0 -2 2 0 0] 2.5e-06;
pSat            pSat [1 -1 -2 0 0] 8000;
rhoMin          rhoMin [1 -3 0 0 0] 0.001;
""")
    _write(os.path.join(d, "constant", "transportProperties"),
           foamfile_header("dictionary", "transportProperties",
                           "constant"), """
phases (liquid vapour);
phase1 { rho rho [1 -3 0 0 0 0 0] 830; nu nu [0 2 -1 0 0 0 0] 7.8e-06; }
phase2 { rho rho [1 -3 0 0 0 0 0] 0.02; nu nu [0 2 -1 0 0 0 0] 4e-05; }
sigma           sigma [1 0 -2 0 0 0 0] 0;
""")
    write_field(d, "0", "p", "volScalarField", "[1 -1 -2 0 0 0 0]",
                "uniform 100000", {
                    "inlet": _fv(300000), "outlet": _fv(3000),
                    "walls": _ZG, "fb": _EMPTY})
    write_field(d, "0", "U", "volVectorField", "[0 1 -1 0 0 0 0]",
                "uniform (0 0 0)", {
                    "inlet": _ZG, "outlet": _ZG,
                    "walls": _fv("(0 0 0)"), "fb": _EMPTY})
    L.Info.enabled = False
    from rapidcfd_tpu.solvers.cavitatingfoam import run
    case, p, U, rho, phi = run(d, write=False)
    L.Info.enabled = True
    pr = np.asarray(p.data)
    r = np.asarray(rho.data)
    u = np.asarray(U.data)
    assert np.isfinite(pr).all() and np.isfinite(r).all()
    assert np.isfinite(u).all()
    assert (r >= 0.001 - 1e-12).all()
    av = np.clip((r - 830.0) / (2.5e-6 * 8000 - 830.0), 0.0, 1.0)
    assert (av >= 0).all() and (av <= 1).all()
    # vapour forms near the low-pressure outlet
    assert av.max() > 1e-4
    assert np.abs(u).max() < 500.0


def test_potential_free_surface_sloshing(tmp_path_factory):
    """potentialFreeSurfaceFoam: an initial side jet sloshes the wave
    surface; zeta develops, flow stays bounded and conservative."""
    d = str(tmp_path_factory.mktemp("pfs"))
    mesh = box_mesh(20, 10, 1, size=(0.2, 0.1, 0.01), patch_spec={
        "xmin": ("left", "wall"), "xmax": ("right", "wall"),
        "ymin": ("bottom", "wall"), "ymax": ("freeSurface", "patch"),
        "zmin": ("fb", "empty"), "zmax": ("fb", "empty")})
    write_polymesh(mesh, d)
    _write(os.path.join(d, "system", "controlDict"),
           foamfile_header("dictionary", "controlDict", "system"), """
application potentialFreeSurfaceFoam; startFrom startTime; startTime 0;
stopAt endTime; endTime 0.1; deltaT 0.002;
writeControl timeStep; writeInterval 1000; writeFormat ascii;
""")
    _write(os.path.join(d, "system", "fvSchemes"),
           foamfile_header("dictionary", "fvSchemes", "system"), """
ddtSchemes { default Euler; }
gradSchemes { default Gauss linear; }
divSchemes { default none; div(phi,U) Gauss upwind; }
laplacianSchemes { default Gauss linear orthogonal; }
interpolationSchemes { default linear; }
snGradSchemes { default orthogonal; }
""")
    _write(os.path.join(d, "system", "fvSolution"),
           foamfile_header("dictionary", "fvSolution", "system"), """
solvers
{
    p_gh { solver PCG; preconditioner DIC; tolerance 1e-08;
           relTol 0.01; }
    p_ghFinal { solver PCG; preconditioner DIC; tolerance 1e-08;
                relTol 0; }
    U { solver smoothSolver; smoother symGaussSeidel; tolerance 1e-07;
        relTol 0; }
}
PIMPLE { nOuterCorrectors 1; nCorrectors 2;
         nNonOrthogonalCorrectors 0; }
""")
    _write(os.path.join(d, "constant", "transportProperties"),
           foamfile_header("dictionary", "transportProperties",
                           "constant"),
           "\nnu              nu [0 2 -1 0 0 0 0] 1e-05;\n")
    _write(os.path.join(d, "constant", "g"),
           foamfile_header("uniformDimensionedVectorField", "g",
                           "constant"),
           "\ndimensions      [0 1 -2 0 0 0 0];\nvalue           "
           "(0 -9.81 0);\n")
    # initial horizontal shear drives surface motion
    from rapidcfd_tpu.mesh.geometry import (cell_centres_and_vols,
                                            face_centres_and_areas)
    from rapidcfd_tpu.fields.io import _body_value
    Cf, Sf = face_centres_and_areas(mesh)
    C, V = cell_centres_and_vols(mesh, Cf, Sf)
    u0 = np.stack([0.2 * np.sin(np.pi * C[:, 0] / 0.2),
                   np.zeros(len(C)), np.zeros(len(C))], axis=1)
    body = "nonuniform List<vector>\n%d\n(\n%s\n)" % (
        len(u0), "\n".join(f"({a:.8g} {b:.8g} {c:.8g})"
                           for a, b, c in u0))
    write_field(d, "0", "U", "volVectorField", "[0 1 -1 0 0 0 0]",
                body, {
                    "left": _fv("(0 0 0)"), "right": _fv("(0 0 0)"),
                    "bottom": _fv("(0 0 0)"),
                    "freeSurface": _ZG, "fb": _EMPTY})
    write_field(d, "0", "p_gh", "volScalarField", "[0 2 -2 0 0 0 0]",
                "uniform 0", {
                    "left": _ZG, "right": _ZG, "bottom": _ZG,
                    "freeSurface":
                        "        type            waveSurfacePressure;\n"
                        "        value           uniform 0;\n",
                    "fb": _EMPTY})
    L.Info.enabled = False
    from rapidcfd_tpu.solvers.potentialfreesurfacefoam import run
    case, U, p_gh, phi, zeta = run(d, write=False)
    L.Info.enabled = True
    u = np.asarray(U.data)
    z = np.asarray(zeta)
    assert np.isfinite(u).all() and np.isfinite(z).all()
    # the wave surface moved (nonzero elevation) but stays small
    assert np.abs(z).max() > 1e-6
    assert np.abs(z).max() < 0.05
    assert np.abs(u).max() < 2.0


def test_drift_flux_settling(tmp_path_factory):
    """driftFluxFoam: a homogeneous suspension in a closed column
    settles — the dispersed phase drifts downward (V0 negative y),
    total dispersed volume conserved."""
    d = str(tmp_path_factory.mktemp("drift"))
    mesh = box_mesh(4, 40, 1, size=(0.05, 0.5, 0.01), patch_spec={
        "xmin": ("walls", "wall"), "xmax": ("walls", "wall"),
        "ymin": ("bottom", "wall"), "ymax": ("top", "wall"),
        "zmin": ("fb", "empty"), "zmax": ("fb", "empty")})
    write_polymesh(mesh, d)
    _write(os.path.join(d, "system", "controlDict"),
           foamfile_header("dictionary", "controlDict", "system"), """
application driftFluxFoam; startFrom startTime; startTime 0;
stopAt endTime; endTime 2.0; deltaT 0.05;
writeControl timeStep; writeInterval 1000; writeFormat ascii;
""")
    _write(os.path.join(d, "system", "fvSchemes"),
           foamfile_header("dictionary", "fvSchemes", "system"), """
ddtSchemes { default Euler; }
gradSchemes { default Gauss linear; }
divSchemes { default none; div(phi,alpha) Gauss vanLeer;
             div(rhoPhi,U) Gauss upwind; }
laplacianSchemes { default Gauss linear orthogonal; }
interpolationSchemes { default linear; }
snGradSchemes { default orthogonal; }
""")
    _write(os.path.join(d, "system", "fvSolution"),
           foamfile_header("dictionary", "fvSolution", "system"), """
solvers
{
    "alpha.*" { solver PBiCGStab; preconditioner DILU;
                tolerance 1e-10; relTol 0; }
    p_rgh { solver PCG; preconditioner DIC; tolerance 1e-08;
            relTol 0.01; }
    p_rghFinal { solver PCG; preconditioner DIC; tolerance 1e-08;
                 relTol 0; }
    alpha1 { solver PBiCGStab; preconditioner DILU; tolerance 1e-10;
             relTol 0; }
    U { solver smoothSolver; smoother symGaussSeidel; tolerance 1e-07;
        relTol 0; }
}
PIMPLE { nOuterCorrectors 1; nCorrectors 2;
         nNonOrthogonalCorrectors 0; }
""")
    _write(os.path.join(d, "constant", "transportProperties"),
           foamfile_header("dictionary", "transportProperties",
                           "constant"), """
phases (sludge water);
sludge { rho rho [1 -3 0 0 0 0 0] 1996; }
water { rho rho [1 -3 0 0 0 0 0] 996; nu nu [0 2 -1 0 0 0 0] 1e-06; }
plasticCoeffs
{
    plasticViscosityCoeff plasticViscosityCoeff [1 -1 -1 0 0] 0.001;
    plasticViscosityExponent plasticViscosityExponent [0 0 0 0 0] 2;
    muMax muMax [1 -1 -1 0 0] 10;
}
relativeVelocityModel simple;
simpleCoeffs
{
    V0 V0 [0 1 -1 0 0 0 0] (0 -0.05 0);
    a a [0 0 0 0 0 0 0] 5;
    a1 a1 [0 0 0 0 0 0 0] 0.1;
    residualAlpha residualAlpha [0 0 0 0 0 0 0] 0;
}
""")
    _write(os.path.join(d, "constant", "g"),
           foamfile_header("uniformDimensionedVectorField", "g",
                           "constant"),
           "\ndimensions      [0 1 -2 0 0 0 0];\nvalue           "
           "(0 -9.81 0);\n")
    write_field(d, "0", "alpha1", "volScalarField", "[0 0 0 0 0 0 0]",
                "uniform 0.005", {
                    "walls": _ZG, "bottom": _ZG, "top": _ZG,
                    "fb": _EMPTY})
    write_field(d, "0", "U", "volVectorField", "[0 1 -1 0 0 0 0]",
                "uniform (0 0 0)", {
                    "walls": _fv("(0 0 0)"), "bottom": _fv("(0 0 0)"),
                    "top": _fv("(0 0 0)"), "fb": _EMPTY})
    write_field(d, "0", "p_rgh", "volScalarField", "[1 -1 -2 0 0 0 0]",
                "uniform 0", {"walls": _ZG, "bottom": _ZG, "top": _ZG,
                              "fb": _EMPTY})
    L.Info.enabled = False
    from rapidcfd_tpu.solvers.driftfluxfoam import run
    case, alpha, U, p_rgh, phi = run(d, write=False)
    L.Info.enabled = True
    a = np.asarray(alpha.data)
    assert np.isfinite(a).all()
    assert (a >= -1e-9).all() and (a <= 1.0 + 1e-6).all()
    C = np.asarray(case.mesh.C)
    V = np.asarray(case.mesh.V)
    # settling: more sludge in the lower half than the upper half
    lower = C[:, 1] < 0.25
    assert (a[lower] * V[lower]).sum() > 1.15 * (a[~lower] * V[~lower]).sum()
    # dispersed volume conserved in the closed column
    assert abs((a * V).sum() - 0.005 * V.sum()) < 1e-6 * V.sum()


def test_multiphase_inter_three_phase_dam(tmp_path_factory):
    """multiphaseInterFoam: a stable water/oil/air stratification stays
    layered; each phase fraction conserved and bounded, sum stays
    one."""
    d = str(tmp_path_factory.mktemp("mpif"))
    mesh = box_mesh(20, 12, 1, size=(0.2, 0.12, 0.01), patch_spec={
        "xmin": ("walls", "wall"), "xmax": ("walls", "wall"),
        "ymin": ("walls", "wall"), "ymax": ("top", "wall"),
        "zmin": ("fb", "empty"), "zmax": ("fb", "empty")})
    write_polymesh(mesh, d)
    _write(os.path.join(d, "system", "controlDict"),
           foamfile_header("dictionary", "controlDict", "system"), """
application multiphaseInterFoam; startFrom startTime; startTime 0;
stopAt endTime; endTime 0.03; deltaT 0.00025;
writeControl timeStep; writeInterval 1000; writeFormat ascii;
""")
    _write(os.path.join(d, "system", "fvSchemes"),
           foamfile_header("dictionary", "fvSchemes", "system"), """
ddtSchemes { default Euler; }
gradSchemes { default Gauss linear; }
divSchemes { default none; div(phi,alpha) Gauss vanLeer;
             div(rhoPhi,U) Gauss linearUpwind grad(U); }
laplacianSchemes { default Gauss linear orthogonal; }
interpolationSchemes { default linear; }
snGradSchemes { default orthogonal; }
""")
    _write(os.path.join(d, "system", "fvSolution"),
           foamfile_header("dictionary", "fvSolution", "system"), """
solvers
{
    alpha { cAlpha 1; }
    p_rgh { solver PCG; preconditioner DIC; tolerance 1e-07;
            relTol 0.05; }
    p_rghFinal { solver PCG; preconditioner DIC; tolerance 1e-07;
                 relTol 0; }
    U { solver smoothSolver; smoother symGaussSeidel; tolerance 1e-06;
        relTol 0; }
}
PIMPLE { nOuterCorrectors 1; nCorrectors 3;
         nNonOrthogonalCorrectors 0; }
""")
    _write(os.path.join(d, "constant", "transportProperties"),
           foamfile_header("dictionary", "transportProperties",
                           "constant"), """
phases
(
    water { rho rho [1 -3 0 0 0 0 0] 1000; nu nu [0 2 -1 0 0 0 0] 1e-06; }
    oil { rho rho [1 -3 0 0 0 0 0] 500; nu nu [0 2 -1 0 0 0 0] 1e-06; }
    air { rho rho [1 -3 0 0 0 0 0] 1; nu nu [0 2 -1 0 0 0 0] 1.48e-05; }
);
sigmas
(
    (water oil) 0.01
    (water air) 0.07
    (oil air) 0.03
);
""")
    _write(os.path.join(d, "constant", "g"),
           foamfile_header("uniformDimensionedVectorField", "g",
                           "constant"),
           "\ndimensions      [0 1 -2 0 0 0 0];\nvalue           "
           "(0 -9.81 0);\n")
    from rapidcfd_tpu.mesh.geometry import (cell_centres_and_vols,
                                            face_centres_and_areas)
    from rapidcfd_tpu.fields.io import _body_value
    Cf, Sf = face_centres_and_areas(mesh)
    C, V = cell_centres_and_vols(mesh, Cf, Sf)
    # stable stratification: water below, oil in the middle, air on top
    water = (C[:, 1] < 0.04).astype(float)
    oil = ((C[:, 1] >= 0.04) & (C[:, 1] < 0.08)).astype(float)
    air = 1.0 - water - oil
    bcs = {"walls": _ZG, "top": _ZG, "fb": _EMPTY}
    for nm, arr in (("water", water), ("oil", oil), ("air", air)):
        write_field(d, "0", f"alpha{nm}", "volScalarField",
                    "[0 0 0 0 0 0 0]", _body_value(arr, prec=10), bcs)
    write_field(d, "0", "U", "volVectorField", "[0 1 -1 0 0 0 0]",
                "uniform (0 0 0)", {
                    "walls": _fv("(0 0 0)"), "top": _fv("(0 0 0)"),
                    "fb": _EMPTY})
    write_field(d, "0", "p_rgh", "volScalarField", "[1 -1 -2 0 0 0 0]",
                "uniform 0", bcs)
    L.Info.enabled = False
    from rapidcfd_tpu.solvers.multiphaseinterfoam import run
    case, alphas, U, p_rgh, phi = run(d, write=False)
    L.Info.enabled = True
    V_d = np.asarray(case.mesh.V)
    total = np.zeros(case.mesh.n_cells)
    fr0 = {"water": (water * V).sum(), "oil": (oil * V).sum(),
           "air": (air * V).sum()}
    for a, nm in zip(alphas, ("water", "oil", "air")):
        av = np.asarray(a.data)
        assert np.isfinite(av).all()
        assert (av >= -1e-6).all() and (av <= 1.0 + 1e-6).all()
        # conservation per phase (closed box) within MULES tolerance
        assert abs((av * V_d).sum() - fr0[nm]) < 2e-3 * V_d.sum()
        total += av
    assert np.allclose(total, 1.0, atol=1e-9)
    # stable stratification: layers stay put (water below oil below air)
    u = np.asarray(U.data)
    assert np.isfinite(u).all()
    assert np.abs(u).max() < 0.5
    C_d = np.asarray(case.mesh.C)
    aw = np.asarray(alphas[0].data)
    ao = np.asarray(alphas[1].data)
    assert aw[C_d[:, 1] < 0.02].min() > 0.9       # water layer intact
    assert ao[(C_d[:, 1] > 0.05) & (C_d[:, 1] < 0.07)].min() > 0.5
