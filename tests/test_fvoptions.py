"""fvOptions: porosity sink + semiImplicitSource + MRF."""

import os

import numpy as np
import pytest

from rapidcfd_tpu.utils import logging as L
from rapidcfd_tpu.utils.casegen import _write, cavity_case
from rapidcfd_tpu.utils.dictionary import foamfile_header


def test_porosity_slows_flow(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("poro"))
    cavity_case(d, end_time=0.05)
    _write(os.path.join(d, "constant", "RASProperties"),
           foamfile_header("dictionary", "RASProperties", "constant"),
           "\nRASModel        laminar;\nturbulence      off;\n")
    _write(os.path.join(d, "system", "fvOptions"),
           foamfile_header("dictionary", "fvOptions", "system"), """
porosity1
{
    type            explicitPorositySource;
    selectionMode   box;
    box             ((0 0 0) (0.1 0.05 0.01));
    d               (1e7 1e7 1e7);
    f               (0 0 0);
}
""")
    L.Info.enabled = False
    from rapidcfd_tpu.solvers import pimplefoam
    _, U, _, _, _ = pimplefoam.run(d, max_steps=10, write=False,
                                   piso_mode=True)
    d2 = str(tmp_path_factory.mktemp("noporo"))
    cavity_case(d2, end_time=0.05)
    _write(os.path.join(d2, "constant", "RASProperties"),
           foamfile_header("dictionary", "RASProperties", "constant"),
           "\nRASModel        laminar;\nturbulence      off;\n")
    _, U0, _, _, _ = pimplefoam.run(d2, max_steps=10, write=False,
                                    piso_mode=True)
    L.Info.enabled = True
    import jax.numpy as jnp
    from rapidcfd_tpu.solvers.case import Case
    case = Case(d)
    C = np.asarray(case.mesh.C)
    lower = C[:, 1] < 0.05
    u_poro = np.abs(np.asarray(U.data))[lower].max()
    u_free = np.abs(np.asarray(U0.data))[lower].max()
    # the porous lower half is nearly stagnant vs the free case
    assert u_poro < 0.05 * u_free


def test_semi_implicit_source_heats(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("sis"))
    cavity_case(d, end_time=0.02)
    from rapidcfd_tpu.models.fvoptions import FvOptions
    _write(os.path.join(d, "system", "fvOptions"),
           foamfile_header("dictionary", "fvOptions", "system"), """
heat1
{
    type            scalarSemiImplicitSource;
    selectionMode   all;
    volumeMode      specific;
    injectionRateSuSp { T (10 0); }
}
""")
    L.Info.enabled = False
    from rapidcfd_tpu.solvers.case import Case
    from rapidcfd_tpu.ops import fvm
    from rapidcfd_tpu.linalg import solve
    import jax.numpy as jnp
    case = Case(d)
    opts = FvOptions(case)
    L.Info.enabled = True
    assert len(opts.options) == 1
    # build a trivial steady diffusion equation for T and add the source
    from rapidcfd_tpu.fields.field import VolField
    from rapidcfd_tpu.fields.bcs import make_bc
    from rapidcfd_tpu.utils.dimensions import dim_temperature
    mesh = case.mesh
    bcs, bcd = [], []
    for i, p in enumerate(mesh.patches):
        if p.is_empty:
            bcs.append(make_bc("empty", i))
            bcd.append({})
        else:
            bcs.append(make_bc("fixedValue", i))
            bcd.append({"value": jnp.zeros(p.size)})
    T = VolField(jnp.zeros(mesh.n_cells), jnp.zeros(mesh.n_boundary),
                 tuple(bcs), dim_temperature, "T", tuple(bcd))
    eqn = -fvm.laplacian(mesh, 1.0, T)
    eqn2 = opts(mesh, "T", eqn, {})
    # source must have been added over the whole domain
    assert float(eqn2.source.sum()) > float(eqn.source.sum())
    from rapidcfd_tpu.linalg.solvers import SolverControls
    Tn, perf = solve(mesh, eqn2, SolverControls(solver="PCG",
                                                preconditioner="DIC",
                                                tolerance=1e-10))
    # positive uniform heating with cold walls -> positive interior T
    assert float(Tn.data.min()) >= 0.0
    assert float(Tn.data.max()) > 0.0


def test_actuation_disk_decelerates(tmp_path_factory):
    """actuationDiskSource extracts momentum: a channel with a disk in
    the middle develops a velocity deficit downstream."""
    import jax.numpy as jnp
    from rapidcfd_tpu.mesh.polymesh import write_polymesh
    from rapidcfd_tpu.utils.casegen import box_mesh, write_field
    d = str(tmp_path_factory.mktemp("adisk"))
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
    type            actuationDiskSource;
    selectionMode   box;
    box             ((0.45 0 0) (0.55 0.2 0.01));
    diskDir         (1 0 0);
    Cp              0.386;
    Ct              0.58;
    diskArea        0.002;
    upstreamPoint   (0.2 0.1 0.005);
}
""")
    _fv = lambda v: ("        type            fixedValue;\n"
                     f"        value           uniform {v};\n")
    _zg = "        type            zeroGradient;\n"
    _em = "        type            empty;\n"
    write_field(d, "0", "p", "volScalarField", "[0 2 -2 0 0 0 0]",
                "uniform 0", {"inlet": _zg, "outlet": _fv(0),
                              "sides": _zg, "fb": _em})
    write_field(d, "0", "U", "volVectorField", "[0 1 -1 0 0 0 0]",
                "uniform (1 0 0)", {
                    "inlet": _fv("(1 0 0)"), "outlet": _zg,
                    "sides": "        type            slip;\n",
                    "fb": _em})
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
    # a full-span disk in incompressible flow shows up as a pressure
    # JUMP (continuity pins u): dp ~ F/(rho*A_channel)
    t_coeff = 2.0 * 0.002 * 0.2218  # 2*rho*A*|upU|*a*(1-a), |upU|~1
    dp_expect = t_coeff / 0.002     # F / A_channel [m2/s2 kinematic]
    dp = pp[up].mean() - pp[down].mean()
    assert dp > 0.3 * dp_expect, (dp, dp_expect)


def test_pressure_gradient_source_drives_flow(tmp_path_factory):
    """pressureGradientExplicitSource pushes a periodic-like channel
    toward Ubar."""
    d = str(tmp_path_factory.mktemp("pgrad"))
    cavity_case(d, end_time=0.25)
    _write(os.path.join(d, "constant", "RASProperties"),
           foamfile_header("dictionary", "RASProperties", "constant"),
           "\nRASModel        laminar;\nturbulence      off;\n")
    _write(os.path.join(d, "system", "fvOptions"),
           foamfile_header("dictionary", "fvOptions", "system"), """
pg1
{
    type            pressureGradientExplicitSource;
    selectionMode   all;
    fields          ( U );
    Ubar            (0.5 0 0);
}
""")
    L.Info.enabled = False
    try:
        from rapidcfd_tpu.solvers import pimplefoam
        case, U, p, phi, _ = pimplefoam.run(d, write=False,
                                            max_steps=50,
                                            piso_mode=True)
    finally:
        L.Info.enabled = True
    u = np.asarray(U.data)
    assert np.isfinite(u).all()
    # bulk flow developed in the Ubar direction (closed cavity walls
    # resist; the mean just has to move well off zero toward Ubar)
    assert u[:, 0].mean() > 0.01
