"""Compressible solvers: sonicFoam (forwardStep class) + rhoSimpleFoam."""

import numpy as np
import pytest

from rapidcfd_tpu.utils import logging as L
from rapidcfd_tpu.utils.casegen import forward_step_case, hot_channel_case


def test_thermo_roundtrip():
    from rapidcfd_tpu.models.thermo import PerfectGasThermo
    import jax.numpy as jnp
    for energy in ("sensibleEnthalpy", "sensibleInternalEnergy"):
        m = PerfectGasThermo(mol_weight=28.9, cp=1005.0, hf=0.0,
                             mu0=1.8e-5, pr=0.7, energy=energy)
        T = jnp.asarray([250.0, 300.0, 1000.0])
        he = m.he_from_t(T)
        assert np.allclose(np.asarray(m.t_from_he(he)), np.asarray(T))
    assert abs(m.r - 8314.47 / 28.9) < 1e-9
    assert abs(m.gamma - m.cp / (m.cp - m.r)) < 1e-12
    # rho(1e5 Pa, 300 K) ~ 1.16 kg/m3 for air
    assert 1.1 < float(m.rho(1e5, jnp.asarray(300.0))) < 1.2


def test_sonicfoam_mach3_shock_forms(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("fstep"))
    forward_step_case(d)
    L.Info.enabled = False
    from rapidcfd_tpu.solvers import sonicfoam
    case, U, p, T, rho, phi = sonicfoam.run(d, max_steps=60, write=False)
    L.Info.enabled = True
    pp = np.asarray(p.data)
    t = np.asarray(T.data)
    assert np.isfinite(pp).all() and np.isfinite(t).all()
    # bow shock compresses: pressure well above the inlet value of 1
    assert pp.max() > 2.0
    # shock heating toward the Mach-3 stagnation temperature (~2.8)
    assert t.max() > 1.5
    # upstream remains at inlet state
    C = np.asarray(case.mesh.C)
    upstream = C[:, 0] < 0.1
    assert np.allclose(pp[upstream], 1.0, atol=0.2)


def test_rhosimplefoam_heated_channel(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("hotch"))
    hot_channel_case(d)
    L.Info.enabled = False
    from rapidcfd_tpu.solvers import rhosimplefoam
    case, U, p, T, rho, phi = rhosimplefoam.run(d, max_steps=40,
                                                write=False)
    L.Info.enabled = True
    t = np.asarray(T.data)
    r = np.asarray(rho.data)
    assert np.isfinite(t).all()
    # walls heat the flow; temperature bounded by wall/inlet values
    assert t.max() > 300.5 and t.max() <= 350.0 + 1e-6
    # upwind keeps T essentially bounded (tiny undershoot from the
    # pressure-work coupling is expected mid-convergence)
    assert t.min() >= 300.0 - 0.01
    # ideal-gas density consistent with p/(R T)
    m = 8314.47 / 28.9
    pp = np.asarray(p.data)
    assert np.allclose(r, pp / (m * t), rtol=1e-10)


def test_rhopimplefoam_transient_channel(tmp_path_factory):
    """rhoPimpleFoam on the heated channel: transient startup stays
    bounded, pressure stays near ambient, walls heat the gas."""
    import os
    from rapidcfd_tpu.utils.casegen import _write
    from rapidcfd_tpu.utils.dictionary import foamfile_header
    d = str(tmp_path_factory.mktemp("hotch_t"))
    hot_channel_case(d)
    _write(os.path.join(d, "system", "controlDict"),
           foamfile_header("dictionary", "controlDict", "system"), """
application rhoPimpleFoam; startFrom startTime; startTime 0;
stopAt endTime; endTime 0.01; deltaT 0.0002;
writeControl timeStep; writeInterval 1000; writeFormat ascii;
""")
    _write(os.path.join(d, "system", "fvSchemes"),
           foamfile_header("dictionary", "fvSchemes", "system"), """
ddtSchemes { default Euler; }
gradSchemes { default Gauss linear; }
divSchemes
{
    default none;
    div(phi,U) Gauss upwind;
    div(phi,h) Gauss upwind;
    div(phi,K) Gauss upwind;
}
laplacianSchemes { default Gauss linear orthogonal; }
interpolationSchemes { default linear; }
snGradSchemes { default orthogonal; }
""")
    _write(os.path.join(d, "system", "fvSolution"),
           foamfile_header("dictionary", "fvSolution", "system"), """
solvers
{
    p      { solver PCG; preconditioner DIC; tolerance 1e-08; relTol 0.01; }
    pFinal { solver PCG; preconditioner DIC; tolerance 1e-08; relTol 0; }
    "(U|h)" { solver smoothSolver; smoother symGaussSeidel;
              tolerance 1e-08; relTol 0; }
    "(U|h)Final" { solver smoothSolver; smoother symGaussSeidel;
                   tolerance 1e-08; relTol 0; }
}
PIMPLE { nOuterCorrectors 1; nCorrectors 2;
         nNonOrthogonalCorrectors 0; }
""")
    L.Info.enabled = False
    from rapidcfd_tpu.solvers import rhopimplefoam
    case, U, p, T, rho, phi = rhopimplefoam.run(d, write=False)
    L.Info.enabled = True
    u = np.asarray(U.data)
    pp = np.asarray(p.data)
    t = np.asarray(T.data)
    assert np.isfinite(u).all() and np.isfinite(pp).all()
    assert np.isfinite(t).all()
    # subsonic channel: no blow-up, pressure stays near 1 bar
    assert np.abs(u).max() < 30.0
    assert 0.9e5 < pp.min() and pp.max() < 1.1e5
    # hot walls (350 K) start heating the near-wall gas above the 300 K
    # inflow (short run: conduction only reaches the first cell layer)
    assert t.max() > 300.05
    assert t.max() <= 350.0 + 1.0
    # density follows the EOS
    r = np.asarray(rho.data)
    assert np.allclose(r, pp / ((8314.47 / 28.9) * t), rtol=1e-3)


def test_rhocentralfoam_mach3_step(tmp_path_factory):
    """rhoCentralFoam (Kurganov) on the Mach-3 forward step: bow shock
    forms, fields bounded, upstream state preserved."""
    import os
    from rapidcfd_tpu.utils.casegen import _write
    from rapidcfd_tpu.utils.dictionary import foamfile_header
    d = str(tmp_path_factory.mktemp("fstep_kt"))
    forward_step_case(d)
    _write(os.path.join(d, "system", "controlDict"),
           foamfile_header("dictionary", "controlDict", "system"), """
application rhoCentralFoam; startFrom startTime; startTime 0;
stopAt endTime; endTime 1.0; deltaT 0.002;
writeControl timeStep; writeInterval 10000; writeFormat ascii;
""")
    _write(os.path.join(d, "system", "fvSchemes"),
           foamfile_header("dictionary", "fvSchemes", "system"), """
fluxScheme      Kurganov;
ddtSchemes { default Euler; }
gradSchemes { default Gauss linear; }
divSchemes { default none; }
laplacianSchemes { default Gauss linear corrected; }
interpolationSchemes
{
    default         linear;
    reconstruct(rho) vanLeer;
    reconstruct(U)  vanLeerV;
    reconstruct(T)  vanLeer;
}
snGradSchemes { default corrected; }
""")
    L.Info.enabled = False
    from rapidcfd_tpu.solvers import rhocentralfoam
    case, U, p, T, phi = rhocentralfoam.run(d, max_steps=150, write=False)
    L.Info.enabled = True
    pp = np.asarray(p.data)
    t = np.asarray(T.data)
    u = np.asarray(U.data)
    assert np.isfinite(pp).all() and np.isfinite(t).all()
    assert np.isfinite(u).all()
    # bow shock compression (analytic normal-shock ratio at M=3 is 10.3)
    assert pp.max() > 3.0
    assert t.max() > 1.5
    # positivity (the central-upwind scheme is positivity-friendly here)
    assert pp.min() > 0.0 and t.min() > 0.0
    # upstream unaffected
    C = np.asarray(case.mesh.C)
    upstream = C[:, 0] < 0.1
    assert np.allclose(pp[upstream], 1.0, atol=0.2)
    assert np.allclose(u[upstream, 0], 3.0, atol=0.3)


def test_rhocentralfoam_viscous_path(tmp_path_factory):
    """Viscous branch (muEff laplacian + tauMC + sigmaDotU): stable and
    shock still forms with diffused gradients."""
    import os
    from rapidcfd_tpu.utils.casegen import _write
    from rapidcfd_tpu.utils.dictionary import foamfile_header
    d = str(tmp_path_factory.mktemp("fstep_v"))
    forward_step_case(d)
    # switch to rhoCentralFoam with nonzero viscosity
    tp = os.path.join(d, "constant", "thermophysicalProperties")
    s = open(tp).read().replace("mu 0;", "mu 0.002;")
    open(tp, "w").write(s)
    _write(os.path.join(d, "system", "controlDict"),
           foamfile_header("dictionary", "controlDict", "system"), """
application rhoCentralFoam; startFrom startTime; startTime 0;
stopAt endTime; endTime 1.0; deltaT 0.002;
writeControl timeStep; writeInterval 10000; writeFormat ascii;
""")
    _write(os.path.join(d, "system", "fvSchemes"),
           foamfile_header("dictionary", "fvSchemes", "system"), """
fluxScheme      Kurganov;
ddtSchemes { default Euler; }
gradSchemes { default Gauss linear; }
divSchemes { default none; }
laplacianSchemes { default Gauss linear corrected; }
interpolationSchemes
{
    default         linear;
    reconstruct(rho) vanLeer;
    reconstruct(U)  vanLeerV;
    reconstruct(T)  vanLeer;
}
snGradSchemes { default corrected; }
""")
    L.Info.enabled = False
    from rapidcfd_tpu.solvers import rhocentralfoam
    case, U, p, T, phi = rhocentralfoam.run(d, max_steps=60, write=False)
    L.Info.enabled = True
    pp = np.asarray(p.data)
    t = np.asarray(T.data)
    assert np.isfinite(pp).all() and np.isfinite(t).all()
    assert pp.max() > 2.0 and pp.min() > 0.0


def test_rho_lts_pimplefoam(tmp_path_factory):
    """rhoLTSPimpleFoam: localEuler pseudo-time marching on the heated
    channel reaches a bounded state (reference: rhoLTSPimpleFoam.C with
    setrDeltaT.H — per-cell rDeltaT from the local Courant limit)."""
    import os
    from rapidcfd_tpu.utils.casegen import _write
    from rapidcfd_tpu.utils.dictionary import foamfile_header
    d = str(tmp_path_factory.mktemp("hotch_lts"))
    hot_channel_case(d)
    _write(os.path.join(d, "system", "controlDict"),
           foamfile_header("dictionary", "controlDict", "system"), """
application rhoLTSPimpleFoam; startFrom startTime; startTime 0;
stopAt endTime; endTime 0.01; deltaT 0.0005;
writeControl timeStep; writeInterval 1000; writeFormat ascii;
""")
    _write(os.path.join(d, "system", "fvSchemes"),
           foamfile_header("dictionary", "fvSchemes", "system"), """
ddtSchemes { default localEuler; }
gradSchemes { default Gauss linear; }
divSchemes
{
    default none;
    div(phi,U) Gauss upwind;
    div(phi,h) Gauss upwind;
    div(phi,K) Gauss upwind;
}
laplacianSchemes { default Gauss linear orthogonal; }
interpolationSchemes { default linear; }
snGradSchemes { default orthogonal; }
""")
    _write(os.path.join(d, "system", "fvSolution"),
           foamfile_header("dictionary", "fvSolution", "system"), """
solvers
{
    p      { solver PCG; preconditioner DIC; tolerance 1e-08; relTol 0.01; }
    pFinal { solver PCG; preconditioner DIC; tolerance 1e-08; relTol 0; }
    "(U|h)" { solver smoothSolver; smoother symGaussSeidel;
              tolerance 1e-08; relTol 0; }
    "(U|h)Final" { solver smoothSolver; smoother symGaussSeidel;
                   tolerance 1e-08; relTol 0; }
}
PIMPLE { nOuterCorrectors 1; nCorrectors 2;
         nNonOrthogonalCorrectors 0;
         maxCo 0.5; rDeltaTSmoothingCoeff 0.02;
         rDeltaTDampingCoeff 0.5; maxDeltaT 0.01; }
""")
    L.Info.enabled = False
    try:
        from rapidcfd_tpu.solvers import rhopimplefoam
        case, U, p, T, rho, phi = rhopimplefoam.run(d, write=False,
                                                    max_steps=12)
    finally:
        L.Info.enabled = True
    u = np.asarray(U.data)
    pp = np.asarray(p.data)
    t = np.asarray(T.data)
    assert np.isfinite(u).all() and np.isfinite(pp).all()
    # bounded near-ambient state, heated above inlet temperature
    assert abs(pp / 1e5 - 1.0).max() < 0.3
    assert t.max() > 300.0 and t.max() < 400.0


def test_rhosimplefoam_kepsilon(tmp_path_factory):
    """Compressible turbulence: rhoSimpleFoam + kEpsilon (muEff/alphaEff
    coupling via the CompressibleTurbulence adapter) produces eddy
    viscosity in the heated channel."""
    import os
    from rapidcfd_tpu.utils.casegen import _write, write_field
    from rapidcfd_tpu.utils.dictionary import foamfile_header
    d = str(tmp_path_factory.mktemp("rhoke"))
    hot_channel_case(d)
    _write(os.path.join(d, "constant", "RASProperties"),
           foamfile_header("dictionary", "RASProperties", "constant"),
           "\nRASModel        kEpsilon;\nturbulence      on;\n")
    fs = os.path.join(d, "system", "fvSolution")
    s = open(fs).read().replace('"(U|h)"', '"(U|h|k|epsilon)"')
    open(fs, "w").write(s)
    fsch = os.path.join(d, "system", "fvSchemes")
    s = open(fsch).read().replace(
        "div(phi,U)      bounded Gauss upwind;",
        "div(phi,U)      bounded Gauss upwind;\n"
        "    div(phi,k)      bounded Gauss upwind;\n"
        "    div(phi,epsilon) bounded Gauss upwind;")
    open(fsch, "w").write(s)
    k_in = 1.5 * (0.05 * 10.0) ** 2
    eps_in = 0.09 ** 0.75 * k_in ** 1.5 / 0.01
    write_field(d, "0", "k", "volScalarField", "[0 2 -2 0 0 0 0]",
                f"uniform {k_in}", {
                    "inlet": "        type            fixedValue;\n"
                             f"        value           uniform {k_in};\n",
                    "outlet": "        type            zeroGradient;\n",
                    "walls": "        type            kqRWallFunction;\n"
                             f"        value           uniform {k_in};\n",
                    "frontAndBack": "        type            empty;\n"})
    write_field(d, "0", "epsilon", "volScalarField", "[0 2 -3 0 0 0 0]",
                f"uniform {eps_in}", {
                    "inlet": "        type            fixedValue;\n"
                             f"        value           uniform {eps_in};\n",
                    "outlet": "        type            zeroGradient;\n",
                    "walls":
                        "        type            epsilonWallFunction;\n"
                        f"        value           uniform {eps_in};\n",
                    "frontAndBack": "        type            empty;\n"})
    write_field(d, "0", "nut", "volScalarField", "[0 2 -1 0 0 0 0]",
                "uniform 0", {
                    "inlet": "        type            calculated;\n"
                             "        value           uniform 0;\n",
                    "outlet": "        type            calculated;\n"
                              "        value           uniform 0;\n",
                    "walls": "        type            nutkWallFunction;\n"
                             "        value           uniform 0;\n",
                    "frontAndBack": "        type            empty;\n"})
    L.Info.enabled = False
    try:
        from rapidcfd_tpu.solvers import rhosimplefoam
        case, U, p, T, rho, phi = rhosimplefoam.run(d, write=False,
                                                    max_steps=15)
    finally:
        L.Info.enabled = True
    u = np.asarray(U.data)
    t = np.asarray(T.data)
    assert np.isfinite(u).all() and np.isfinite(t).all()
    assert 250 < t.min() and t.max() < 400


def test_rhopimplefoam_kepsilon(tmp_path_factory):
    """Transient compressible turbulence: rhoPimpleFoam + kEpsilon."""
    import os
    from rapidcfd_tpu.utils.casegen import _write, write_field
    from rapidcfd_tpu.utils.dictionary import foamfile_header
    d = str(tmp_path_factory.mktemp("rhopke"))
    hot_channel_case(d)
    _write(os.path.join(d, "system", "controlDict"),
           foamfile_header("dictionary", "controlDict", "system"), """
application rhoPimpleFoam; startFrom startTime; startTime 0;
stopAt endTime; endTime 0.01; deltaT 0.0002;
writeControl timeStep; writeInterval 1000; writeFormat ascii;
""")
    _write(os.path.join(d, "system", "fvSchemes"),
           foamfile_header("dictionary", "fvSchemes", "system"), """
ddtSchemes { default Euler; }
gradSchemes { default Gauss linear; }
divSchemes
{
    default none;
    div(phi,U) Gauss upwind;
    div(phi,h) Gauss upwind;
    div(phi,K) Gauss upwind;
    div(phi,k) Gauss upwind;
    div(phi,epsilon) Gauss upwind;
}
laplacianSchemes { default Gauss linear orthogonal; }
interpolationSchemes { default linear; }
snGradSchemes { default orthogonal; }
""")
    _write(os.path.join(d, "system", "fvSolution"),
           foamfile_header("dictionary", "fvSolution", "system"), """
solvers
{
    p      { solver PCG; preconditioner DIC; tolerance 1e-08; relTol 0.01; }
    pFinal { solver PCG; preconditioner DIC; tolerance 1e-08; relTol 0; }
    "(U|h|k|epsilon)" { solver smoothSolver; smoother symGaussSeidel;
              tolerance 1e-08; relTol 0; }
    "(U|h|k|epsilon)Final" { solver smoothSolver;
                   smoother symGaussSeidel;
                   tolerance 1e-08; relTol 0; }
}
PIMPLE { nOuterCorrectors 1; nCorrectors 2;
         nNonOrthogonalCorrectors 0; }
""")
    _write(os.path.join(d, "constant", "RASProperties"),
           foamfile_header("dictionary", "RASProperties", "constant"),
           "\nRASModel        kEpsilon;\nturbulence      on;\n")
    k_in = 1.5 * (0.05 * 10.0) ** 2
    eps_in = 0.09 ** 0.75 * k_in ** 1.5 / 0.01
    write_field(d, "0", "k", "volScalarField", "[0 2 -2 0 0 0 0]",
                f"uniform {k_in}", {
                    "inlet": "        type            fixedValue;\n"
                             f"        value           uniform {k_in};\n",
                    "outlet": "        type            zeroGradient;\n",
                    "walls": "        type            kqRWallFunction;\n"
                             f"        value           uniform {k_in};\n",
                    "frontAndBack": "        type            empty;\n"})
    write_field(d, "0", "epsilon", "volScalarField", "[0 2 -3 0 0 0 0]",
                f"uniform {eps_in}", {
                    "inlet": "        type            fixedValue;\n"
                             f"        value           uniform {eps_in};\n",
                    "outlet": "        type            zeroGradient;\n",
                    "walls":
                        "        type            epsilonWallFunction;\n"
                        f"        value           uniform {eps_in};\n",
                    "frontAndBack": "        type            empty;\n"})
    write_field(d, "0", "nut", "volScalarField", "[0 2 -1 0 0 0 0]",
                "uniform 0", {
                    "inlet": "        type            calculated;\n"
                             "        value           uniform 0;\n",
                    "outlet": "        type            calculated;\n"
                              "        value           uniform 0;\n",
                    "walls": "        type            nutkWallFunction;\n"
                             "        value           uniform 0;\n",
                    "frontAndBack": "        type            empty;\n"})
    L.Info.enabled = False
    try:
        from rapidcfd_tpu.solvers import rhopimplefoam
        case, U, p, T, rho, phi = rhopimplefoam.run(d, write=False,
                                                    max_steps=10)
    finally:
        L.Info.enabled = True
    u = np.asarray(U.data)
    t = np.asarray(T.data)
    pp = np.asarray(p.data)
    assert np.isfinite(u).all() and np.isfinite(t).all()
    assert abs(pp / 1e5 - 1.0).max() < 0.5


def test_sonic_liquid_foam(tmp_path_factory):
    """sonicLiquidFoam: barotropic water hammer — a pressure pulse in a
    closed duct propagates at c = sqrt(1/psi) without blowing up and
    conserves mass (reference: sonicLiquidFoam.C + linear EoS)."""
    import os
    from rapidcfd_tpu.mesh.polymesh import write_polymesh
    from rapidcfd_tpu.utils.casegen import _write, box_mesh, write_field
    from rapidcfd_tpu.utils.dictionary import foamfile_header
    d = str(tmp_path_factory.mktemp("sonicliq"))
    mesh = box_mesh(60, 1, 1, size=(1.0, 0.05, 0.05), patch_spec={
        "xmin": ("left", "wall"), "xmax": ("right", "wall"),
        "ymin": ("sides", "empty"), "ymax": ("sides", "empty"),
        "zmin": ("fb", "empty"), "zmax": ("fb", "empty")})
    write_polymesh(mesh, d)
    # c = sqrt(1/psi) ~ 1414 m/s; dt for acoustic CFL ~ 0.3
    _write(os.path.join(d, "system", "controlDict"),
           foamfile_header("dictionary", "controlDict", "system"), """
application sonicLiquidFoam; startFrom startTime; startTime 0;
stopAt endTime; endTime 4e-05; deltaT 2e-06;
writeControl timeStep; writeInterval 1000; writeFormat ascii;
""")
    _write(os.path.join(d, "system", "fvSchemes"),
           foamfile_header("dictionary", "fvSchemes", "system"), """
ddtSchemes { default Euler; }
gradSchemes { default Gauss linear; }
divSchemes { default none; div(phi,U) Gauss upwind;
             div(phid,p) Gauss upwind; }
laplacianSchemes { default Gauss linear orthogonal; }
interpolationSchemes { default linear; }
snGradSchemes { default orthogonal; }
""")
    _write(os.path.join(d, "system", "fvSolution"),
           foamfile_header("dictionary", "fvSolution", "system"), """
solvers
{
    p { solver PCG; preconditioner DIC; tolerance 1e-09; relTol 0; }
    pFinal { solver PCG; preconditioner DIC; tolerance 1e-09;
             relTol 0; }
    U { solver smoothSolver; smoother symGaussSeidel;
        tolerance 1e-09; relTol 0; }
}
PISO { nCorrectors 2; nNonOrthogonalCorrectors 0; }
""")
    _write(os.path.join(d, "constant", "thermodynamicProperties"),
           foamfile_header("dictionary", "thermodynamicProperties",
                           "constant"), """
rho0            rho0 [1 -3 0 0 0 0 0] 1000;
p0              p0 [1 -1 -2 0 0 0 0] 100000;
psi             psi [0 -2 2 0 0 0 0] 5e-07;
""")
    _write(os.path.join(d, "constant", "transportProperties"),
           foamfile_header("dictionary", "transportProperties",
                           "constant"),
           "\nmu              mu [1 -1 -1 0 0 0 0] 0.001;\n")
    # pressure pulse on the left half
    import numpy as np
    nvals = " ".join("200000" if i < 30 else "100000"
                     for i in range(60))
    write_field(d, "0", "p", "volScalarField", "[1 -1 -2 0 0 0 0]",
                f"nonuniform List<scalar> 60 ({nvals})", {
                    "left": "        type            zeroGradient;\n",
                    "right": "        type            zeroGradient;\n",
                    "sides": "        type            empty;\n",
                    "fb": "        type            empty;\n"})
    write_field(d, "0", "U", "volVectorField", "[0 1 -1 0 0 0 0]",
                "uniform (0 0 0)", {
                    "left": "        type            fixedValue;\n"
                            "        value           uniform (0 0 0);\n",
                    "right": "        type            fixedValue;\n"
                             "        value           uniform (0 0 0);\n",
                    "sides": "        type            empty;\n",
                    "fb": "        type            empty;\n"})
    L.Info.enabled = False
    try:
        from rapidcfd_tpu.solvers import sonicliquidfoam
        case, U, p, rho, phi = sonicliquidfoam.run(d, write=False,
                                                   max_steps=20)
    finally:
        L.Info.enabled = True
    pp = np.asarray(p.data)
    r = np.asarray(rho.data)
    u = np.asarray(U.data)
    assert np.isfinite(pp).all() and np.isfinite(u).all()
    # pressure stays within the initial bounds (+small overshoot)
    assert pp.min() > 0.4e5 and pp.max() < 2.6e5
    # Joukowsky velocity scale at the interface: dp/(2 rho c) ~ 0.035
    assert 0.02 < np.abs(u[:, 0]).max() < 0.2
    # mass conservation via EoS coupling
    V = np.asarray(case.mesh.V)
    m0 = ((1000.0 - 5e-7 * 1e5) + 5e-7
          * np.where(np.arange(60) < 30, 2e5, 1e5)) @ V
    assert abs((r @ V) - m0) / m0 < 5e-3
