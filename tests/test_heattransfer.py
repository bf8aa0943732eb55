"""buoyantSimpleFoam (full density) + thermoFoam."""

import os

import numpy as np
import pytest

from rapidcfd_tpu.mesh.polymesh import write_polymesh
from rapidcfd_tpu.utils import logging as L
from rapidcfd_tpu.utils.casegen import _write, box_mesh, write_field
from rapidcfd_tpu.utils.dictionary import foamfile_header

_EMPTY = "        type            empty;\n"
_ZG = "        type            zeroGradient;\n"

_THERMO = """
thermoType
{
    type            heRhoThermo;
    mixture         pureMixture;
    transport       const;
    thermo          hConst;
    equationOfState perfectGas;
    specie          specie;
    energy          sensibleEnthalpy;
}
mixture
{
    specie         { nMoles 1; molWeight 28.9; }
    thermodynamics { Cp 1005; Hf 0; }
    transport      { mu 1.8e-05; Pr 0.7; }
}
"""


def _fv(v):
    return ("        type            fixedValue;\n"
            f"        value           uniform {v};\n")


def test_buoyant_simple_heated_cavity(tmp_path_factory):
    """Differentially heated closed cavity: buoyancy drives circulation,
    density stratifies against the hot wall, mass is conserved by the
    closed-volume pressure-level adjustment."""
    d = str(tmp_path_factory.mktemp("bsf"))
    mesh = box_mesh(16, 16, 1, size=(0.1, 0.1, 0.01), patch_spec={
        "xmin": ("hot", "wall"), "xmax": ("cold", "wall"),
        "ymin": ("floor", "wall"), "ymax": ("ceiling", "wall"),
        "zmin": ("fb", "empty"), "zmax": ("fb", "empty")})
    write_polymesh(mesh, d)
    _write(os.path.join(d, "system", "controlDict"),
           foamfile_header("dictionary", "controlDict", "system"), """
application buoyantSimpleFoam; startFrom startTime; startTime 0;
stopAt endTime; endTime 60; deltaT 1;
writeControl timeStep; writeInterval 1000; writeFormat ascii;
""")
    _write(os.path.join(d, "system", "fvSchemes"),
           foamfile_header("dictionary", "fvSchemes", "system"), """
ddtSchemes { default steadyState; }
gradSchemes { default Gauss linear; }
divSchemes { default none; div(phi,U) bounded Gauss upwind;
             div(phi,h) bounded Gauss upwind; }
laplacianSchemes { default Gauss linear orthogonal; }
interpolationSchemes { default linear; }
snGradSchemes { default orthogonal; }
""")
    _write(os.path.join(d, "system", "fvSolution"),
           foamfile_header("dictionary", "fvSolution", "system"), """
solvers
{
    p_rgh { solver GAMG; smoother GaussSeidel; tolerance 1e-08;
            relTol 0.01; }
    "(U|h)" { solver smoothSolver; smoother symGaussSeidel;
              tolerance 1e-08; relTol 0.1; }
}
SIMPLE
{
    nNonOrthogonalCorrectors 0;
    pRefCell 0; pRefValue 100000;
    residualControl { p_rgh 1e-5; U 1e-6; h 1e-6; }
}
relaxationFactors
{
    fields    { p_rgh 0.7; rho 0.3; }
    equations { U 0.3; h 0.7; }
}
""")
    _write(os.path.join(d, "constant", "thermophysicalProperties"),
           foamfile_header("dictionary", "thermophysicalProperties",
                           "constant"), _THERMO)
    _write(os.path.join(d, "constant", "g"),
           foamfile_header("uniformDimensionedVectorField", "g",
                           "constant"),
           "\ndimensions      [0 1 -2 0 0 0 0];\nvalue           "
           "(0 -9.81 0);\n")
    walls = {"hot": _fv(310), "cold": _fv(290),
             "floor": _ZG, "ceiling": _ZG, "fb": _EMPTY}
    write_field(d, "0", "T", "volScalarField", "[0 0 0 1 0 0 0]",
                "uniform 300", walls)
    uw = {k: (_fv("(0 0 0)") if k != "fb" else _EMPTY) for k in walls}
    write_field(d, "0", "U", "volVectorField", "[0 1 -1 0 0 0 0]",
                "uniform (0 0 0)", uw)
    zgs = {k: (_ZG if k != "fb" else _EMPTY) for k in walls}
    write_field(d, "0", "p_rgh", "volScalarField", "[1 -1 -2 0 0 0 0]",
                "uniform 100000", zgs)
    write_field(d, "0", "p", "volScalarField", "[1 -1 -2 0 0 0 0]",
                "uniform 100000", zgs)
    L.Info.enabled = False
    from rapidcfd_tpu.solvers.buoyantsimplefoam import run
    case, U, p_rgh, T, p, rho, phi = run(d, write=False)
    L.Info.enabled = True
    u = np.asarray(U.data)
    t = np.asarray(T.data)
    r = np.asarray(rho.data)
    assert np.isfinite(u).all() and np.isfinite(t).all()
    assert (290.0 - 1e-6 <= t).all() and (t <= 310.0 + 1e-6).all()
    # buoyant circulation: rising flow at the hot wall
    C = np.asarray(case.mesh.C)
    hot_side = C[:, 0] < 0.02
    assert u[hot_side, 1].max() > 1e-3
    # density lower on the hot side
    cold_side = C[:, 0] > 0.08
    assert r[hot_side].mean() < r[cold_side].mean()
    # closed-volume mass conservation (pressure level adjusted)
    V = np.asarray(case.mesh.V)
    mass = (r * V).sum()
    mass0 = (1e5 / ((8314.47 / 28.9) * 300.0) * V).sum()
    assert abs(mass - mass0) < 1e-6 * mass0


def test_thermofoam_frozen_flow(tmp_path_factory):
    """thermoFoam: hot patch diffuses+advects into a frozen channel
    flow; T stays within the boundary bounds."""
    d = str(tmp_path_factory.mktemp("thermo"))
    mesh = box_mesh(30, 6, 1, size=(0.3, 0.05, 0.01), patch_spec={
        "xmin": ("inlet", "patch"), "xmax": ("outlet", "patch"),
        "ymin": ("hotWall", "wall"), "ymax": ("topWall", "wall"),
        "zmin": ("fb", "empty"), "zmax": ("fb", "empty")})
    write_polymesh(mesh, d)
    _write(os.path.join(d, "system", "controlDict"),
           foamfile_header("dictionary", "controlDict", "system"), """
application thermoFoam; startFrom startTime; startTime 0;
stopAt endTime; endTime 0.1; deltaT 0.002;
writeControl timeStep; writeInterval 1000; writeFormat ascii;
""")
    _write(os.path.join(d, "system", "fvSchemes"),
           foamfile_header("dictionary", "fvSchemes", "system"), """
ddtSchemes { default Euler; }
gradSchemes { default Gauss linear; }
divSchemes { default none; div(phi,h) Gauss upwind; }
laplacianSchemes { default Gauss linear orthogonal; }
interpolationSchemes { default linear; }
snGradSchemes { default orthogonal; }
""")
    _write(os.path.join(d, "system", "fvSolution"),
           foamfile_header("dictionary", "fvSolution", "system"), """
solvers { h { solver PBiCGStab; preconditioner DILU;
              tolerance 1e-09; relTol 0; } }
""")
    _write(os.path.join(d, "constant", "thermophysicalProperties"),
           foamfile_header("dictionary", "thermophysicalProperties",
                           "constant"), _THERMO)
    write_field(d, "0", "T", "volScalarField", "[0 0 0 1 0 0 0]",
                "uniform 300", {
                    "inlet": _fv(300), "outlet": _ZG,
                    "hotWall": _fv(400), "topWall": _ZG, "fb": _EMPTY})
    write_field(d, "0", "U", "volVectorField", "[0 1 -1 0 0 0 0]",
                "uniform (1 0 0)", {
                    "inlet": _fv("(1 0 0)"), "outlet": _ZG,
                    "hotWall": _fv("(0 0 0)"), "topWall": _fv("(0 0 0)"),
                    "fb": _EMPTY})
    write_field(d, "0", "p", "volScalarField", "[1 -1 -2 0 0 0 0]",
                "uniform 100000",
                {"inlet": _ZG, "outlet": _ZG, "hotWall": _ZG,
                 "topWall": _ZG, "fb": _EMPTY})
    L.Info.enabled = False
    from rapidcfd_tpu.solvers.thermofoam import run
    case, T = run(d, write=False)
    L.Info.enabled = True
    t = np.asarray(T.data)
    assert np.isfinite(t).all()
    assert t.max() > 301.0                    # wall heating reached cells
    assert (t >= 300.0 - 1e-6).all() and (t <= 400.0 + 1e-6).all()


def test_buoyant_pimple_transient_cavity(tmp_path_factory):
    """buoyantPimpleFoam: transient startup of the heated closed cavity
    stays bounded and develops rising flow at the hot wall."""
    d = str(tmp_path_factory.mktemp("bpf"))
    mesh = box_mesh(12, 12, 1, size=(0.1, 0.1, 0.01), patch_spec={
        "xmin": ("hot", "wall"), "xmax": ("cold", "wall"),
        "ymin": ("floor", "wall"), "ymax": ("ceiling", "wall"),
        "zmin": ("fb", "empty"), "zmax": ("fb", "empty")})
    write_polymesh(mesh, d)
    _write(os.path.join(d, "system", "controlDict"),
           foamfile_header("dictionary", "controlDict", "system"), """
application buoyantPimpleFoam; startFrom startTime; startTime 0;
stopAt endTime; endTime 0.2; deltaT 0.005;
writeControl timeStep; writeInterval 1000; writeFormat ascii;
""")
    _write(os.path.join(d, "system", "fvSchemes"),
           foamfile_header("dictionary", "fvSchemes", "system"), """
ddtSchemes { default Euler; }
gradSchemes { default Gauss linear; }
divSchemes { default none; div(phi,U) Gauss upwind;
             div(phi,h) Gauss upwind; div(phi,K) Gauss upwind; }
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
    "(U|h)" { solver smoothSolver; smoother symGaussSeidel;
              tolerance 1e-08; relTol 0; }
    "(U|h)Final" { solver smoothSolver; smoother symGaussSeidel;
                   tolerance 1e-08; relTol 0; }
}
PIMPLE { nOuterCorrectors 1; nCorrectors 2;
         nNonOrthogonalCorrectors 0; }
""")
    _write(os.path.join(d, "constant", "thermophysicalProperties"),
           foamfile_header("dictionary", "thermophysicalProperties",
                           "constant"), _THERMO)
    _write(os.path.join(d, "constant", "g"),
           foamfile_header("uniformDimensionedVectorField", "g",
                           "constant"),
           "\ndimensions      [0 1 -2 0 0 0 0];\nvalue           "
           "(0 -9.81 0);\n")
    walls = {"hot": _fv(320), "cold": _fv(280),
             "floor": _ZG, "ceiling": _ZG, "fb": _EMPTY}
    write_field(d, "0", "T", "volScalarField", "[0 0 0 1 0 0 0]",
                "uniform 300", walls)
    uw = {k: (_fv("(0 0 0)") if k != "fb" else _EMPTY) for k in walls}
    write_field(d, "0", "U", "volVectorField", "[0 1 -1 0 0 0 0]",
                "uniform (0 0 0)", uw)
    zgs = {k: (_ZG if k != "fb" else _EMPTY) for k in walls}
    write_field(d, "0", "p_rgh", "volScalarField", "[1 -1 -2 0 0 0 0]",
                "uniform 100000", zgs)
    write_field(d, "0", "p", "volScalarField", "[1 -1 -2 0 0 0 0]",
                "uniform 100000", zgs)
    L.Info.enabled = False
    from rapidcfd_tpu.solvers.buoyantpimplefoam import run
    case, U, p_rgh, T, p, rho, phi = run(d, write=False)
    L.Info.enabled = True
    u = np.asarray(U.data)
    t = np.asarray(T.data)
    assert np.isfinite(u).all() and np.isfinite(t).all()
    assert (279.9 <= t).all() and (t <= 320.1).all()
    C = np.asarray(case.mesh.C)
    hot_side = C[:, 0] < 0.02
    assert u[hot_side, 1].max() > 1e-4      # buoyant rise
    assert np.abs(u).max() < 2.0


def _buoyant_rad_case(d):
    mesh = box_mesh(12, 12, 1, size=(0.1, 0.1, 0.01), patch_spec={
        "xmin": ("hot", "wall"), "xmax": ("cold", "wall"),
        "ymin": ("floor", "wall"), "ymax": ("ceiling", "wall"),
        "zmin": ("fb", "empty"), "zmax": ("fb", "empty")})
    write_polymesh(mesh, d)
    _write(os.path.join(d, "system", "controlDict"),
           foamfile_header("dictionary", "controlDict", "system"), """
application buoyantSimpleFoam; startFrom startTime; startTime 0;
stopAt endTime; endTime 12; deltaT 1;
writeControl timeStep; writeInterval 1000; writeFormat ascii;
""")
    _write(os.path.join(d, "system", "fvSchemes"),
           foamfile_header("dictionary", "fvSchemes", "system"), """
ddtSchemes { default steadyState; }
gradSchemes { default Gauss linear; }
divSchemes { default none; div(phi,U) bounded Gauss upwind;
             div(phi,h) bounded Gauss upwind; }
laplacianSchemes { default Gauss linear orthogonal; }
interpolationSchemes { default linear; }
snGradSchemes { default orthogonal; }
""")
    _write(os.path.join(d, "system", "fvSolution"),
           foamfile_header("dictionary", "fvSolution", "system"), """
solvers
{
    p_rgh { solver GAMG; smoother GaussSeidel; tolerance 1e-08;
            relTol 0.01; }
    "(U|h)" { solver smoothSolver; smoother symGaussSeidel;
              tolerance 1e-08; relTol 0.1; }
    G { solver PCG; preconditioner DIC; tolerance 1e-10; relTol 0; }
}
SIMPLE
{
    nNonOrthogonalCorrectors 0;
    pRefCell 0; pRefValue 100000;
    residualControl { }
}
relaxationFactors
{
    fields    { p_rgh 0.7; rho 0.3; }
    equations { U 0.3; h 0.7; }
}
""")
    _write(os.path.join(d, "constant", "thermophysicalProperties"),
           foamfile_header("dictionary", "thermophysicalProperties",
                           "constant"), _THERMO)
    _write(os.path.join(d, "constant", "g"),
           foamfile_header("uniformDimensionedVectorField", "g",
                           "constant"),
           "\ndimensions      [0 1 -2 0 0 0 0];\nvalue           "
           "(0 -9.81 0);\n")
    walls = {"hot": _fv(310), "cold": _fv(290),
             "floor": _ZG, "ceiling": _ZG, "fb": _EMPTY}
    write_field(d, "0", "T", "volScalarField", "[0 0 0 1 0 0 0]",
                "uniform 300", walls)
    uw = {k: (_fv("(0 0 0)") if k != "fb" else _EMPTY) for k in walls}
    write_field(d, "0", "U", "volVectorField", "[0 1 -1 0 0 0 0]",
                "uniform (0 0 0)", uw)
    zgs = {k: (_ZG if k != "fb" else _EMPTY) for k in walls}
    write_field(d, "0", "p_rgh", "volScalarField", "[1 -1 -2 0 0 0 0]",
                "uniform 100000", zgs)
    write_field(d, "0", "p", "volScalarField", "[1 -1 -2 0 0 0 0]",
                "uniform 100000", zgs)


def test_buoyant_simple_p1_radiation(tmp_path_factory):
    """buoyantSimpleFoam + P1 radiation: G equilibrates toward the
    blackbody level 4*sigma*T^4 in a near-isothermal box and the
    energy coupling stays bounded (reference: radiationModels/P1)."""
    d = str(tmp_path_factory.mktemp("p1rad"))
    _buoyant_rad_case(d)
    _write(os.path.join(d, "constant", "radiationProperties"),
           foamfile_header("dictionary", "radiationProperties",
                           "constant"), """
radiation       on;
radiationModel  P1;
absorptionEmissionModel constantAbsorptionEmission;
constantAbsorptionEmissionCoeffs
{
    absorptivity    absorptivity [ 0 -1 0 0 0 0 0 ] 0.5;
    emissivity      emissivity [ 0 -1 0 0 0 0 0 ] 0.5;
    E               E [ 1 -1 -3 0 0 0 0 ] 0;
}
scatterModel    constantScatter;
constantScatterCoeffs
{
    sigma           sigma [ 0 -1 0 0 0 0 0 ] 0;
    C               C [ 0 0 0 0 0 0 0 ] 0;
}
""")
    bspec = {
        "fb": _EMPTY,
        **{n: ("        type            MarshakRadiation;\n"
               "        emissivity      uniform 1.0;\n"
               "        value           uniform 0;\n")
           for n in ("hot", "cold", "floor", "ceiling")}}
    write_field(d, "0", "G", "volScalarField", "[1 0 -3 0 0 0 0]",
                "uniform 0", bspec)
    L.Info.enabled = False
    try:
        from rapidcfd_tpu.solvers.buoyantsimplefoam import run
        case, U, p_rgh, T, p, rho, phi = run(d, write=False,
                                             max_steps=12)
    finally:
        L.Info.enabled = True
    t = np.asarray(T.data)
    assert np.isfinite(t).all()
    assert 285 < t.min() and t.max() < 315
    # G equilibrated near the blackbody level of the enclosure
    from rapidcfd_tpu.models.radiation import SIGMA_SB, P1Radiation
    from rapidcfd_tpu.models.radiation import make_radiation_model
    rad = make_radiation_model(case)
    G, perf = rad.correct(case.mesh, case.read_field('G', '0'), T)
    g = np.asarray(G.data)
    g_bb = 4.0 * SIGMA_SB * 300.0 ** 4
    assert 0.5 * g_bb < g.mean() < 1.5 * g_bb
