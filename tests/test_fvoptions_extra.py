"""fvOptions stragglers: rotorDiskSource, radialActuationDiskSource,
solidificationMeltingSource, effectivenessHeatExchangerSource
(reference: src/fvOptions/sources/derived/)."""

import os

import numpy as np

from rapidcfd_tpu.utils import logging as L
from rapidcfd_tpu.utils.casegen import (_write, box_mesh, cavity_case,
                                        write_field)
from rapidcfd_tpu.utils.dictionary import foamfile_header
from rapidcfd_tpu.mesh.polymesh import write_polymesh

_FV = lambda v: ("        type            fixedValue;\n"
                 f"        value           uniform {v};\n")
_ZG = "        type            zeroGradient;\n"
_EM = "        type            empty;\n"

_ROTOR_FVOPT = """
rotor1
{
    type            rotorDiskSource;
    selectionMode   box;
    box             ((0.03 0.03 0) (0.07 0.07 0.01));
    origin          (0.05 0.05 0.005);
    axis            (0 0 1);
    rpm             600;
    nBlades         2;
    tipEffect       0.96;
    inletFlowType   local;
    blade
    {
        data ( (profile1 (0.001 8.0 0.01))
               (profile1 (0.05 4.0 0.008)) );
    }
    profiles
    {
        profile1
        {
            type lookup;
            data ( (-90 0.2 -1.0) (-10 0.02 -0.6) (0 0.01 0.0)
                   (10 0.02 0.6) (90 0.2 1.0) );
        }
    }
    fixedTrimCoeffs { theta0 4.0; theta1c 0.0; theta1s 0.0; }
}
"""


def _angular_momentum(case, U, centre):
    C = np.asarray(case.mesh.C) - centre
    V = np.asarray(case.mesh.V)
    u = np.asarray(U.data)
    lz = V * (C[:, 0] * u[:, 1] - C[:, 1] * u[:, 0])
    return float(lz.sum())


def test_rotor_disk_induces_swirl(tmp_path_factory):
    """rotorDiskSource: a z-axis rotor in the cavity changes the
    angular momentum about its hub (blade-element reaction torque)."""
    L.Info.enabled = False
    try:
        from rapidcfd_tpu.solvers import pimplefoam
        d0 = str(tmp_path_factory.mktemp("norotor"))
        cavity_case(d0, end_time=0.05)
        _write(os.path.join(d0, "constant", "RASProperties"),
               foamfile_header("dictionary", "RASProperties",
                               "constant"),
               "\nRASModel        laminar;\nturbulence      off;\n")
        case0, U0, _, _, _ = pimplefoam.run(d0, max_steps=10,
                                            write=False, piso_mode=True)
        d = str(tmp_path_factory.mktemp("rotor"))
        cavity_case(d, end_time=0.05)
        _write(os.path.join(d, "constant", "RASProperties"),
               foamfile_header("dictionary", "RASProperties",
                               "constant"),
               "\nRASModel        laminar;\nturbulence      off;\n")
        _write(os.path.join(d, "system", "fvOptions"),
               foamfile_header("dictionary", "fvOptions", "system"),
               _ROTOR_FVOPT)
        case, U, _, _, _ = pimplefoam.run(d, max_steps=10, write=False,
                                          piso_mode=True)
    finally:
        L.Info.enabled = True
    assert np.isfinite(np.asarray(U.data)).all()
    c = np.array([0.05, 0.05, 0.005])
    lz0 = _angular_momentum(case0, U0, c)
    lz1 = _angular_momentum(case, U, c)
    assert abs(lz1 - lz0) > 1e-10, (lz0, lz1)


def test_radial_actuation_disk(tmp_path_factory):
    """radialActuationDiskSource: radially-weighted thrust produces a
    pressure jump across the disk like the uniform disk."""
    d = str(tmp_path_factory.mktemp("radisk"))
    mesh = box_mesh(40, 8, 1, size=(1.0, 0.2, 0.01), patch_spec={
        "xmin": ("inlet", "patch"), "xmax": ("outlet", "patch"),
        "ymin": ("sides", "patch"), "ymax": ("sides", "patch"),
        "zmin": ("fb", "empty"), "zmax": ("fb", "empty")})
    write_polymesh(mesh, d)
    _write(os.path.join(d, "system", "controlDict"),
           foamfile_header("dictionary", "controlDict", "system"), """
application pisoFoam; startFrom startTime; startTime 0;
stopAt endTime; endTime 0.5; deltaT 0.01;
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
    p { solver PCG; preconditioner DIC; tolerance 1e-08; relTol 0.01; }
    pFinal { solver PCG; preconditioner DIC; tolerance 1e-08; relTol 0; }
    U { solver smoothSolver; smoother symGaussSeidel;
        tolerance 1e-08; relTol 0; }
}
PISO { nCorrectors 2; nNonOrthogonalCorrectors 0; }
""")
    _write(os.path.join(d, "constant", "transportProperties"),
           foamfile_header("dictionary", "transportProperties",
                           "constant"),
           "\nnu              nu [0 2 -1 0 0 0 0] 1e-05;\n")
    _write(os.path.join(d, "constant", "RASProperties"),
           foamfile_header("dictionary", "RASProperties", "constant"),
           "\nRASModel        laminar;\nturbulence      off;\n")
    _write(os.path.join(d, "system", "fvOptions"),
           foamfile_header("dictionary", "fvOptions", "system"), """
disk1
{
    type            radialActuationDiskSource;
    selectionMode   box;
    box             ((0.45 0 0) (0.55 0.2 0.01));
    diskDir         (1 0 0);
    Cp              0.386;
    Ct              0.58;
    diskArea        0.002;
    upstreamPoint   (0.2 0.1 0.005);
    coeffs          (0.1 0.5 0.01);
}
""")
    write_field(d, "0", "p", "volScalarField", "[0 2 -2 0 0 0 0]",
                "uniform 0", {"inlet": _ZG, "outlet": _FV(0),
                              "sides": _ZG, "fb": _EM})
    write_field(d, "0", "U", "volVectorField", "[0 1 -1 0 0 0 0]",
                "uniform (1 0 0)", {
                    "inlet": _FV("(1 0 0)"), "outlet": _ZG,
                    "sides": "        type            slip;\n",
                    "fb": _EM})
    L.Info.enabled = False
    try:
        from rapidcfd_tpu.solvers import pimplefoam
        case, U, p, phi, _ = pimplefoam.run(d, write=False,
                                            max_steps=30,
                                            piso_mode=True)
    finally:
        L.Info.enabled = True
    u = np.asarray(U.data)
    pp = np.asarray(p.data)
    C = np.asarray(case.mesh.C)
    up = (C[:, 0] > 0.1) & (C[:, 0] < 0.4)
    down = (C[:, 0] > 0.6) & (C[:, 0] < 0.9)
    assert np.isfinite(u).all()
    dp = pp[up].mean() - pp[down].mean()
    assert dp > 1e-4, dp


def _boussinesq_channel(d, fvoptions, g="(0 -1e-06 0)", nu=1e-3):
    """Laminar Boussinesq channel with through-flow for the phase-change
    and heat-exchanger sources."""
    mesh = box_mesh(30, 8, 1, size=(1.0, 0.2, 0.01), patch_spec={
        "xmin": ("inlet", "patch"), "xmax": ("outlet", "patch"),
        "ymin": ("walls", "wall"), "ymax": ("walls", "wall"),
        "zmin": ("fb", "empty"), "zmax": ("fb", "empty")})
    write_polymesh(mesh, d)
    _write(os.path.join(d, "system", "controlDict"),
           foamfile_header("dictionary", "controlDict", "system"), """
application buoyantBoussinesqSimpleFoam;
startFrom startTime; startTime 0; stopAt endTime; endTime 60;
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
           foamfile_header("dictionary", "transportProperties",
                           "constant"), f"""
transportModel Newtonian;
nu              nu [0 2 -1 0 0 0 0] {nu};
beta            beta [0 0 0 -1 0 0 0] 3e-03;
TRef            TRef [0 0 0 1 0 0 0] 300;
Pr              Pr [0 0 0 0 0 0 0] 0.7;
Prt             Prt [0 0 0 0 0 0 0] 0.85;
""")
    _write(os.path.join(d, "constant", "g"),
           foamfile_header("uniformDimensionedVectorField", "g",
                           "constant"),
           f"\ndimensions [0 1 -2 0 0 0 0];\nvalue {g};\n")
    _write(os.path.join(d, "constant", "RASProperties"),
           foamfile_header("dictionary", "RASProperties", "constant"),
           "\nRASModel laminar;\nturbulence off;\n")
    _write(os.path.join(d, "system", "fvOptions"),
           foamfile_header("dictionary", "fvOptions", "system"),
           fvoptions)
    wall_u = _FV("(0 0 0)")
    write_field(d, "0", "U", "volVectorField", "[0 1 -1 0 0 0 0]",
                "uniform (0.1 0 0)", {
                    "inlet": _FV("(0.1 0 0)"), "outlet": _ZG,
                    "walls": wall_u, "fb": _EM})
    write_field(d, "0", "p_rgh", "volScalarField", "[0 2 -2 0 0 0 0]",
                "uniform 0", {"inlet": _ZG, "outlet": _FV(0),
                              "walls": _ZG, "fb": _EM})
    write_field(d, "0", "T", "volScalarField", "[0 0 0 1 0 0 0]",
                "uniform 300", {"inlet": _FV(300), "outlet": _ZG,
                                "walls": _ZG, "fb": _EM})
    return mesh


def test_solidification_blocks_cold_region(tmp_path_factory):
    """solidificationMeltingSource: cells below Tmelt are blocked by the
    Carman-Kozeny sink — a cold downstream half stays near-stagnant."""
    d = str(tmp_path_factory.mktemp("solidify"))
    _boussinesq_channel(d, """
melt1
{
    type            solidificationMeltingSource;
    selectionMode   box;
    box             ((0.4 0 0) (0.8 0.1 0.01));
    Tmelt           400;
    L               100000;
    beta            3e-03;
    rhoRef          1000;
    Cp              1000;
    thermoMode      lookup;
}
""")
    L.Info.enabled = False
    try:
        from rapidcfd_tpu.solvers import buoyantfoam
        out = buoyantfoam.run(d, write=False, max_steps=25)
        case, U = out[0], out[1]
    finally:
        L.Info.enabled = True
    u = np.asarray(U.data)
    C = np.asarray(case.mesh.C)
    assert np.isfinite(u).all()
    mid = (C[:, 0] > 0.45) & (C[:, 0] < 0.75)
    u_solid = np.abs(u[mid & (C[:, 1] < 0.1)][:, 0]).max()
    u_bypass = np.abs(u[mid & (C[:, 1] > 0.1)][:, 0]).max()
    # T=300 < Tmelt=400: the selected lower half-channel is solid and
    # the flow diverts into the upper bypass
    assert u_solid < 0.05 * u_bypass, (u_solid, u_bypass)


def test_effectiveness_heat_exchanger_heats(tmp_path_factory):
    """effectivenessHeatExchangerSource: hot secondary stream heats the
    primary flow downstream of the exchanger zone."""
    d = str(tmp_path_factory.mktemp("hx"))
    mesh = _boussinesq_channel(d, """
hx1
{
    type            effectivenessHeatExchangerSource;
    selectionMode   box;
    box             ((0.45 0 0) (0.55 0.2 0.01));
    faceZone        hxPlane;
    secondaryMassFlowRate 1.0;
    secondaryInletT 400;
    primaryInletT   300;
    Cp              1000;
    table
    (
        (0.0   ( (0.5 0.6) (2.0 0.6) ))
        (1.0   ( (0.5 0.6) (2.0 0.6) ))
    );
}
""")
    # faceZone: internal faces crossing x=0.5
    from rapidcfd_tpu.mesh.geometry import face_centres_and_areas
    Cf, Sf = face_centres_and_areas(mesh)
    plane = np.nonzero(
        (np.abs(Cf[:mesh.n_internal_faces, 0] - 0.5) < 1e-6))[0]
    assert len(plane) > 0
    fz = os.path.join(d, "constant", "polyMesh", "faceZones")
    with open(fz, "w") as f:
        f.write(foamfile_header("regIOobject", "faceZones", "") + """
1
(
hxPlane
{
    type faceZone;
faceLabels      List<label>
%d
(
%s
)
;
}
)
""" % (len(plane), "\n".join(str(int(x)) for x in plane)))
    L.Info.enabled = False
    try:
        from rapidcfd_tpu.solvers import buoyantfoam
        out = buoyantfoam.run(d, write=False, max_steps=30)
        case, U, T = out[0], out[1], out[3]
    finally:
        L.Info.enabled = True
    t = np.asarray(T.data)
    C = np.asarray(case.mesh.C)
    assert np.isfinite(t).all()
    t_up = t[C[:, 0] < 0.4].mean()
    t_down = t[C[:, 0] > 0.6].mean()
    assert t_down > t_up + 0.05, (t_up, t_down)
