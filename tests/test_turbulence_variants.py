"""RAS variant models (kOmega, RNGkEpsilon, realizableKE) on pitzDaily."""

import numpy as np
import pytest

from rapidcfd_tpu.utils import logging as L
from rapidcfd_tpu.utils.casegen import pitz_daily_case


@pytest.mark.parametrize("model", ["kOmega", "RNGkEpsilon", "realizableKE"])
def test_variant_runs_and_produces_turbulence(model, tmp_path_factory):
    d = str(tmp_path_factory.mktemp(model))
    pitz_daily_case(d, end_time=8, model=model)
    L.Info.enabled = False
    from rapidcfd_tpu.solvers import simplefoam
    case, U, p, phi, ts = simplefoam.run(d, write=False)
    L.Info.enabled = True
    u = np.asarray(U.data)
    assert np.isfinite(u).all()
    assert np.isfinite(np.asarray(p.data)).all()
    k = np.asarray(ts["k"].data)
    nut = np.asarray(ts["nut"].data)
    assert (k > 0).all() and (nut >= 0).all()
    assert np.isfinite(nut).all()
    # eddy viscosity is actually produced in the shear layer
    assert nut.max() > 1e-5
    if model == "kOmega":
        om = np.asarray(ts["omega"].data)
        assert (om > 0).all()
    else:
        eps = np.asarray(ts["epsilon"].data)
        assert (eps > 0).all()


def test_one_eq_eddy_les_channel(tmp_path_factory):
    """oneEqEddy LES: k-SGS transport produces eddy viscosity in a
    transient channel without blow-up."""
    import os
    from rapidcfd_tpu.mesh.polymesh import write_polymesh
    from rapidcfd_tpu.utils.casegen import _write, box_mesh, write_field
    from rapidcfd_tpu.utils.dictionary import foamfile_header
    d = str(tmp_path_factory.mktemp("les"))
    mesh = box_mesh(30, 10, 1, size=(0.3, 0.05, 0.01), patch_spec={
        "xmin": ("inlet", "patch"), "xmax": ("outlet", "patch"),
        "ymin": ("walls", "wall"), "ymax": ("walls", "wall"),
        "zmin": ("fb", "empty"), "zmax": ("fb", "empty")})
    write_polymesh(mesh, d)
    _write(os.path.join(d, "system", "controlDict"),
           foamfile_header("dictionary", "controlDict", "system"), """
application pimpleFoam; startFrom startTime; startTime 0;
stopAt endTime; endTime 0.02; deltaT 0.0005;
writeControl timeStep; writeInterval 1000; writeFormat ascii;
""")
    _write(os.path.join(d, "system", "fvSchemes"),
           foamfile_header("dictionary", "fvSchemes", "system"), """
ddtSchemes { default Euler; }
gradSchemes { default Gauss linear; }
divSchemes { default none; div(phi,U) Gauss upwind;
             div(phi,k) Gauss upwind; }
laplacianSchemes { default Gauss linear orthogonal; }
interpolationSchemes { default linear; }
snGradSchemes { default orthogonal; }
""")
    _write(os.path.join(d, "system", "fvSolution"),
           foamfile_header("dictionary", "fvSolution", "system"), """
solvers
{
    p { solver PCG; preconditioner DIC; tolerance 1e-07; relTol 0.01; }
    pFinal { solver PCG; preconditioner DIC; tolerance 1e-07; relTol 0; }
    "(U|k)" { solver smoothSolver; smoother symGaussSeidel;
              tolerance 1e-07; relTol 0; }
    "(U|k)Final" { solver smoothSolver; smoother symGaussSeidel;
                   tolerance 1e-07; relTol 0; }
}
PIMPLE { nOuterCorrectors 1; nCorrectors 2;
         nNonOrthogonalCorrectors 0; momentumPredictor yes; }
""")
    _write(os.path.join(d, "constant", "transportProperties"),
           foamfile_header("dictionary", "transportProperties", "constant"),
           "\nnu              nu [0 2 -1 0 0 0 0] 1e-05;\n")
    _write(os.path.join(d, "constant", "turbulenceProperties"),
           foamfile_header("dictionary", "turbulenceProperties",
                           "constant"), """
simulationType  LES;
LES
{
    LESModel        oneEqEddy;
    turbulence      on;
    oneEqEddyCoeffs { ck 0.094; ce 1.048; }
}
""")
    _fv = lambda v: ("        type            fixedValue;\n"
                     f"        value           uniform {v};\n")
    _zg = "        type            zeroGradient;\n"
    _em = "        type            empty;\n"
    write_field(d, "0", "U", "volVectorField", "[0 1 -1 0 0 0 0]",
                "uniform (2 0 0)", {
                    "inlet": _fv("(2 0 0)"), "outlet": _zg,
                    "walls": _fv("(0 0 0)"), "fb": _em})
    write_field(d, "0", "p", "volScalarField", "[0 2 -2 0 0 0 0]",
                "uniform 0", {"inlet": _zg, "outlet": _fv(0),
                              "walls": _zg, "fb": _em})
    write_field(d, "0", "k", "volScalarField", "[0 2 -2 0 0 0 0]",
                "uniform 0.01", {
                    "inlet": _fv(0.01), "outlet": _zg,
                    "walls": _fv(1e-10), "fb": _em})
    write_field(d, "0", "nut", "volScalarField", "[0 2 -1 0 0 0 0]",
                "uniform 0", {"inlet": _zg, "outlet": _zg,
                              "walls": _zg, "fb": _em})
    L.Info.enabled = False
    from rapidcfd_tpu.solvers import pimplefoam
    case, U, p, phi, ts = pimplefoam.run(d, write=False)
    L.Info.enabled = True
    u = np.asarray(U.data)
    k = np.asarray(ts["k"].data)
    nut = np.asarray(ts["nut"].data)
    assert np.isfinite(u).all() and np.isfinite(k).all()
    assert (k > 0).all() and (nut >= 0).all()
    # nuSgs = ck*sqrt(k)*delta produced
    assert nut.max() > 1e-7
    assert np.abs(u).max() < 10.0


@pytest.mark.parametrize("model", ["SpalartAllmaras", "LaunderSharmaKE",
                                   "qZeta"])
def test_more_ras_models(model, tmp_path_factory):
    """SA (nuTilda transport), Launder-Sharma and qZeta low-Re models
    run the pitzDaily step and produce eddy viscosity."""
    d = str(tmp_path_factory.mktemp(model))
    pitz_daily_case(d, end_time=8, model=model)
    L.Info.enabled = False
    try:
        from rapidcfd_tpu.solvers import simplefoam
        case, U, p, phi, ts = simplefoam.run(d, write=False)
    finally:
        L.Info.enabled = True
    u = np.asarray(U.data)
    nut = np.asarray(ts["nut"].data)
    assert np.isfinite(u).all() and np.isfinite(nut).all()
    assert (nut >= 0).all()
    assert nut.max() > 1e-6
    if model == "SpalartAllmaras":
        nt = np.asarray(ts["nuTilda"].data)
        assert (nt >= 0).all() and np.isfinite(nt).all()


def test_spalart_allmaras_des_channel(tmp_path_factory):
    """SpalartAllmarasDES: the SA equation with d=min(y, CDES*delta)
    runs as an LES model in the transient channel."""
    import os
    from rapidcfd_tpu.mesh.polymesh import write_polymesh
    from rapidcfd_tpu.utils.casegen import _write, box_mesh, write_field
    from rapidcfd_tpu.utils.dictionary import foamfile_header
    d = str(tmp_path_factory.mktemp("des"))
    mesh = box_mesh(30, 10, 1, size=(0.3, 0.05, 0.01), patch_spec={
        "xmin": ("inlet", "patch"), "xmax": ("outlet", "patch"),
        "ymin": ("walls", "wall"), "ymax": ("walls", "wall"),
        "zmin": ("fb", "empty"), "zmax": ("fb", "empty")})
    write_polymesh(mesh, d)
    _write(os.path.join(d, "system", "controlDict"),
           foamfile_header("dictionary", "controlDict", "system"), """
application pimpleFoam; startFrom startTime; startTime 0;
stopAt endTime; endTime 0.01; deltaT 0.0005;
writeControl timeStep; writeInterval 1000; writeFormat ascii;
""")
    _write(os.path.join(d, "system", "fvSchemes"),
           foamfile_header("dictionary", "fvSchemes", "system"), """
ddtSchemes { default Euler; }
gradSchemes { default Gauss linear; }
divSchemes { default none; div(phi,U) Gauss upwind;
             div(phi,nuTilda) Gauss upwind; }
laplacianSchemes { default Gauss linear orthogonal; }
interpolationSchemes { default linear; }
snGradSchemes { default orthogonal; }
""")
    _write(os.path.join(d, "system", "fvSolution"),
           foamfile_header("dictionary", "fvSolution", "system"), """
solvers
{
    p { solver PCG; preconditioner DIC; tolerance 1e-07; relTol 0.01; }
    pFinal { solver PCG; preconditioner DIC; tolerance 1e-07; relTol 0; }
    "(U|nuTilda)" { solver smoothSolver; smoother symGaussSeidel;
              tolerance 1e-07; relTol 0; }
    "(U|nuTilda)Final" { solver smoothSolver; smoother symGaussSeidel;
                   tolerance 1e-07; relTol 0; }
}
PIMPLE { nOuterCorrectors 1; nCorrectors 2;
         nNonOrthogonalCorrectors 0; momentumPredictor yes; }
""")
    _write(os.path.join(d, "constant", "transportProperties"),
           foamfile_header("dictionary", "transportProperties",
                           "constant"),
           "\nnu              nu [0 2 -1 0 0 0 0] 1e-05;\n")
    _write(os.path.join(d, "constant", "turbulenceProperties"),
           foamfile_header("dictionary", "turbulenceProperties",
                           "constant"), """
simulationType  LES;
LES
{
    LESModel        SpalartAllmarasDES;
    turbulence      on;
}
""")
    _fv = lambda v: ("        type            fixedValue;\n"
                     f"        value           uniform {v};\n")
    _zg = "        type            zeroGradient;\n"
    _em = "        type            empty;\n"
    write_field(d, "0", "U", "volVectorField", "[0 1 -1 0 0 0 0]",
                "uniform (2 0 0)", {
                    "inlet": _fv("(2 0 0)"), "outlet": _zg,
                    "walls": _fv("(0 0 0)"), "fb": _em})
    write_field(d, "0", "p", "volScalarField", "[0 2 -2 0 0 0 0]",
                "uniform 0", {"inlet": _zg, "outlet": _fv(0),
                              "walls": _zg, "fb": _em})
    write_field(d, "0", "nuTilda", "volScalarField", "[0 2 -1 0 0 0 0]",
                "uniform 4e-05", {
                    "inlet": _fv("4e-05"), "outlet": _zg,
                    "walls": _fv(0), "fb": _em})
    write_field(d, "0", "nut", "volScalarField", "[0 2 -1 0 0 0 0]",
                "uniform 0", {"inlet": _zg, "outlet": _zg,
                              "walls": _zg, "fb": _em})
    L.Info.enabled = False
    try:
        from rapidcfd_tpu.solvers import pimplefoam
        case, U, p, phi, ts = pimplefoam.run(d, write=False)
    finally:
        L.Info.enabled = True
    nt = np.asarray(ts["nuTilda"].data)
    nut = np.asarray(ts["nut"].data)
    assert np.isfinite(nt).all() and (nt >= 0).all()
    assert np.isfinite(nut).all() and nut.max() > 1e-8


def test_v2f_pitz(tmp_path_factory):
    """v2f: four-equation model with elliptic relaxation produces
    bounded turbulence on pitzDaily."""
    import os
    from rapidcfd_tpu.utils.casegen import _write, write_field
    from rapidcfd_tpu.utils.dictionary import foamfile_header
    d = str(tmp_path_factory.mktemp("v2f"))
    pitz_daily_case(d, end_time=8, model="v2f")
    # v2f needs v2/f fields + solver entries
    fs = os.path.join(d, "system", "fvSolution")
    s = open(fs).read().replace('"(U|k|epsilon|omega|nuTilda)"',
                                '"(U|k|epsilon|omega|nuTilda|v2|f)"')
    open(fs, "w").write(s)
    k_in = 1.5 * (0.05 * 10.0) ** 2
    v2_in = 2.0 / 3.0 * k_in
    _fv = lambda v: ("        type            fixedValue;\n"
                     f"        value           uniform {v};\n")
    _zg = "        type            zeroGradient;\n"
    _em = "        type            empty;\n"
    write_field(d, "0", "v2", "volScalarField", "[0 2 -2 0 0 0 0]",
                f"uniform {v2_in}", {
                    "inlet": _fv(v2_in), "outlet": _zg,
                    "upperWall": "        type        v2WallFunction;\n"
                                 "        value       uniform 1e-10;\n",
                    "lowerWall": "        type        v2WallFunction;\n"
                                 "        value       uniform 1e-10;\n",
                    "frontAndBack": _em})
    write_field(d, "0", "f", "volScalarField", "[0 0 -1 0 0 0 0]",
                "uniform 0", {
                    "inlet": _fv(0), "outlet": _zg,
                    "upperWall": "        type        fWallFunction;\n"
                                 "        value       uniform 0;\n",
                    "lowerWall": "        type        fWallFunction;\n"
                                 "        value       uniform 0;\n",
                    "frontAndBack": _em})
    L.Info.enabled = False
    try:
        from rapidcfd_tpu.solvers import simplefoam
        case, U, p, phi, ts = simplefoam.run(d, write=False,
                                             max_steps=8)
    finally:
        L.Info.enabled = True
    for name in ("k", "epsilon", "v2", "f", "nut"):
        arr = np.asarray(ts[name].data)
        assert np.isfinite(arr).all(), name
    assert (np.asarray(ts["v2"].data) >= 0).all()
    assert (np.asarray(ts["nut"].data) >= 0).all()
    assert np.asarray(ts["nut"].data).max() > 1e-7


def test_dyn_one_eq_eddy_channel(tmp_path_factory):
    """dynOneEqEddy: Germano-identity dynamic coefficients stay
    bounded and produce SGS viscosity."""
    import os
    from rapidcfd_tpu.mesh.polymesh import write_polymesh
    from rapidcfd_tpu.utils.casegen import _write, box_mesh, write_field
    from rapidcfd_tpu.utils.dictionary import foamfile_header
    d = str(tmp_path_factory.mktemp("dynles"))
    mesh = box_mesh(30, 10, 1, size=(0.3, 0.05, 0.01), patch_spec={
        "xmin": ("inlet", "patch"), "xmax": ("outlet", "patch"),
        "ymin": ("walls", "wall"), "ymax": ("walls", "wall"),
        "zmin": ("fb", "empty"), "zmax": ("fb", "empty")})
    write_polymesh(mesh, d)
    _write(os.path.join(d, "system", "controlDict"),
           foamfile_header("dictionary", "controlDict", "system"), """
application pimpleFoam; startFrom startTime; startTime 0;
stopAt endTime; endTime 0.01; deltaT 0.0005;
writeControl timeStep; writeInterval 1000; writeFormat ascii;
""")
    _write(os.path.join(d, "system", "fvSchemes"),
           foamfile_header("dictionary", "fvSchemes", "system"), """
ddtSchemes { default Euler; }
gradSchemes { default Gauss linear; }
divSchemes { default none; div(phi,U) Gauss upwind;
             div(phi,k) Gauss upwind; }
laplacianSchemes { default Gauss linear orthogonal; }
interpolationSchemes { default linear; }
snGradSchemes { default orthogonal; }
""")
    _write(os.path.join(d, "system", "fvSolution"),
           foamfile_header("dictionary", "fvSolution", "system"), """
solvers
{
    p { solver PCG; preconditioner DIC; tolerance 1e-07; relTol 0.01; }
    pFinal { solver PCG; preconditioner DIC; tolerance 1e-07; relTol 0; }
    "(U|k)" { solver smoothSolver; smoother symGaussSeidel;
              tolerance 1e-07; relTol 0; }
    "(U|k)Final" { solver smoothSolver; smoother symGaussSeidel;
                   tolerance 1e-07; relTol 0; }
}
PIMPLE { nOuterCorrectors 1; nCorrectors 2;
         nNonOrthogonalCorrectors 0; momentumPredictor yes; }
""")
    _write(os.path.join(d, "constant", "transportProperties"),
           foamfile_header("dictionary", "transportProperties",
                           "constant"),
           "\nnu              nu [0 2 -1 0 0 0 0] 1e-05;\n")
    _write(os.path.join(d, "constant", "turbulenceProperties"),
           foamfile_header("dictionary", "turbulenceProperties",
                           "constant"), """
simulationType  LES;
LES
{
    LESModel        dynOneEqEddy;
    turbulence      on;
    dynOneEqEddyCoeffs { delta maxDeltaxyz; }
}
""")
    _fv = lambda v: ("        type            fixedValue;\n"
                     f"        value           uniform {v};\n")
    _zg = "        type            zeroGradient;\n"
    _em = "        type            empty;\n"
    write_field(d, "0", "U", "volVectorField", "[0 1 -1 0 0 0 0]",
                "uniform (2 0 0)", {
                    "inlet": _fv("(2 0 0)"), "outlet": _zg,
                    "walls": _fv("(0 0 0)"), "fb": _em})
    write_field(d, "0", "p", "volScalarField", "[0 2 -2 0 0 0 0]",
                "uniform 0", {"inlet": _zg, "outlet": _fv(0),
                              "walls": _zg, "fb": _em})
    write_field(d, "0", "k", "volScalarField", "[0 2 -2 0 0 0 0]",
                "uniform 0.01", {
                    "inlet": _fv(0.01), "outlet": _zg,
                    "walls": _fv(1e-10), "fb": _em})
    write_field(d, "0", "nut", "volScalarField", "[0 2 -1 0 0 0 0]",
                "uniform 0", {"inlet": _zg, "outlet": _zg,
                              "walls": _zg, "fb": _em})
    L.Info.enabled = False
    try:
        from rapidcfd_tpu.solvers import pimplefoam
        case, U, p, phi, ts = pimplefoam.run(d, write=False)
    finally:
        L.Info.enabled = True
    k = np.asarray(ts["k"].data)
    nut = np.asarray(ts["nut"].data)
    assert np.isfinite(k).all() and (k > 0).all()
    assert np.isfinite(nut).all() and (nut >= 0).all()
