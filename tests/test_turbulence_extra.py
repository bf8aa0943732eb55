"""Straggler turbulence models: kkLOmega, LienCubicKE (RAS) and the
kOmegaSSTSAS / dynLagrangian / scaleSimilarity-family / spectEddyVisc /
IDDES LES zoo (reference: src/turbulenceModels/incompressible/{RAS,LES})."""

import os

import numpy as np
import pytest

from rapidcfd_tpu.utils import logging as L
from rapidcfd_tpu.utils.casegen import pitz_daily_case

_FV = lambda v: ("        type            fixedValue;\n"
                 f"        value           uniform {v};\n")
_ZG = "        type            zeroGradient;\n"
_EM = "        type            empty;\n"


def _les_channel(d, model, coeffs="", extra_schemes="", solver_fields="U",
                 fields=(), end_time=0.01):
    """Transient channel skeleton shared by the LES straggler tests."""
    from rapidcfd_tpu.mesh.polymesh import write_polymesh
    from rapidcfd_tpu.utils.casegen import _write, box_mesh, write_field
    from rapidcfd_tpu.utils.dictionary import foamfile_header
    mesh = box_mesh(30, 10, 1, size=(0.3, 0.05, 0.01), patch_spec={
        "xmin": ("inlet", "patch"), "xmax": ("outlet", "patch"),
        "ymin": ("walls", "wall"), "ymax": ("walls", "wall"),
        "zmin": ("fb", "empty"), "zmax": ("fb", "empty")})
    write_polymesh(mesh, d)
    _write(os.path.join(d, "system", "controlDict"),
           foamfile_header("dictionary", "controlDict", "system"), f"""
application pimpleFoam; startFrom startTime; startTime 0;
stopAt endTime; endTime {end_time}; deltaT 0.0005;
writeControl timeStep; writeInterval 1000; writeFormat ascii;
""")
    _write(os.path.join(d, "system", "fvSchemes"),
           foamfile_header("dictionary", "fvSchemes", "system"), f"""
ddtSchemes {{ default Euler; }}
gradSchemes {{ default Gauss linear; }}
divSchemes {{ default none; div(phi,U) Gauss upwind;
             div(phi,k) Gauss upwind; {extra_schemes} }}
laplacianSchemes {{ default Gauss linear orthogonal; }}
interpolationSchemes {{ default linear; }}
snGradSchemes {{ default orthogonal; }}
""")
    _write(os.path.join(d, "system", "fvSolution"),
           foamfile_header("dictionary", "fvSolution", "system"), f"""
solvers
{{
    p {{ solver PCG; preconditioner DIC; tolerance 1e-07; relTol 0.01; }}
    pFinal {{ solver PCG; preconditioner DIC; tolerance 1e-07; relTol 0; }}
    "({solver_fields})" {{ solver smoothSolver; smoother symGaussSeidel;
              tolerance 1e-07; relTol 0; }}
    "({solver_fields})Final" {{ solver smoothSolver;
              smoother symGaussSeidel; tolerance 1e-07; relTol 0; }}
}}
PIMPLE {{ nOuterCorrectors 1; nCorrectors 2;
         nNonOrthogonalCorrectors 0; momentumPredictor yes; }}
""")
    _write(os.path.join(d, "constant", "transportProperties"),
           foamfile_header("dictionary", "transportProperties",
                           "constant"),
           "\nnu              nu [0 2 -1 0 0 0 0] 1e-05;\n")
    _write(os.path.join(d, "constant", "turbulenceProperties"),
           foamfile_header("dictionary", "turbulenceProperties",
                           "constant"), f"""
simulationType  LES;
LES
{{
    LESModel        {model};
    turbulence      on;
    {coeffs}
}}
""")
    write_field(d, "0", "U", "volVectorField", "[0 1 -1 0 0 0 0]",
                "uniform (2 0 0)", {
                    "inlet": _FV("(2 0 0)"), "outlet": _ZG,
                    "walls": _FV("(0 0 0)"), "fb": _EM})
    write_field(d, "0", "p", "volScalarField", "[0 2 -2 0 0 0 0]",
                "uniform 0", {"inlet": _ZG, "outlet": _FV(0),
                              "walls": _ZG, "fb": _EM})
    write_field(d, "0", "nut", "volScalarField", "[0 2 -1 0 0 0 0]",
                "uniform 0", {"inlet": _ZG, "outlet": _ZG,
                              "walls": _ZG, "fb": _EM})
    for name, ftype, dims, internal, bcs in fields:
        write_field(d, "0", name, ftype, dims, internal, bcs)
    L.Info.enabled = False
    try:
        from rapidcfd_tpu.solvers import pimplefoam
        case, U, p, phi, ts = pimplefoam.run(d, write=False)
    finally:
        L.Info.enabled = True
    return U, p, ts


def _std_bcs(v):
    return {"inlet": _FV(v), "outlet": _ZG, "walls": _ZG, "fb": _EM}


def test_smagorinsky2_channel(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("smag2"))
    U, p, ts = _les_channel(d, "Smagorinsky2",
                            coeffs="Smagorinsky2Coeffs { cD2 0.02; }")
    nut = np.asarray(ts["nut"].data)
    assert np.isfinite(np.asarray(U.data)).all()
    assert np.isfinite(nut).all() and nut.max() > 1e-9


def test_scale_similarity_channel(tmp_path_factory):
    """scaleSimilarity: no eddy viscosity, the Bardina stress enters
    the momentum equation explicitly — velocity stays finite/bounded."""
    d = str(tmp_path_factory.mktemp("scalesim"))
    U, p, ts = _les_channel(d, "scaleSimilarity")
    u = np.asarray(U.data)
    assert np.isfinite(u).all() and np.abs(u).max() < 10.0


def test_mixed_smagorinsky_channel(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("mixed"))
    U, p, ts = _les_channel(d, "mixedSmagorinsky")
    nut = np.asarray(ts["nut"].data)
    u = np.asarray(U.data)
    assert np.isfinite(u).all() and np.abs(u).max() < 10.0
    assert np.isfinite(nut).all() and nut.max() > 1e-9


def test_homogeneous_dyn_smagorinsky_channel(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("hdsmag"))
    U, p, ts = _les_channel(d, "homogeneousDynSmagorinsky")
    nut = np.asarray(ts["nut"].data)
    assert np.isfinite(np.asarray(U.data)).all()
    assert np.isfinite(nut).all() and (nut >= 0).all()


def test_spect_eddy_visc_channel(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("spect"))
    U, p, ts = _les_channel(d, "spectEddyVisc")
    nut = np.asarray(ts["nut"].data)
    assert np.isfinite(np.asarray(U.data)).all()
    # the spectral fixed point gives nuSgs >= nu in resolved regions
    assert np.isfinite(nut).all() and nut.max() > 1e-6


def test_dyn_lagrangian_channel(tmp_path_factory):
    """dynLagrangian: flm/fmm pathline relaxation produces a bounded
    dynamic coefficient and non-trivial eddy viscosity."""
    d = str(tmp_path_factory.mktemp("dynlag"))
    U, p, ts = _les_channel(
        d, "dynLagrangian",
        coeffs="dynLagrangianCoeffs { theta 1.5; }",
        extra_schemes="div(phi,flm) Gauss upwind;"
                      " div(phi,fmm) Gauss upwind;",
        solver_fields="U|flm|fmm")
    flm = np.asarray(ts["flm"].data)
    fmm = np.asarray(ts["fmm"].data)
    nut = np.asarray(ts["nut"].data)
    assert np.isfinite(flm).all() and (flm >= 0).all()
    assert np.isfinite(fmm).all() and (fmm > 0).all()
    assert np.isfinite(nut).all() and nut.max() > 1e-9


def test_komega_sst_sas_channel(tmp_path_factory):
    """SST-SAS: runs as an LES model; QSAS >= 0 keeps omega/k finite."""
    d = str(tmp_path_factory.mktemp("sas"))
    k_in, om_in = 0.015, 100.0
    U, p, ts = _les_channel(
        d, "kOmegaSSTSAS",
        extra_schemes="div(phi,omega) Gauss upwind;",
        solver_fields="U|k|omega",
        fields=[
            ("k", "volScalarField", "[0 2 -2 0 0 0 0]",
             f"uniform {k_in}", {"inlet": _FV(k_in), "outlet": _ZG,
                                 "walls": _FV(1e-10), "fb": _EM}),
            ("omega", "volScalarField", "[0 0 -1 0 0 0 0]",
             f"uniform {om_in}", {"inlet": _FV(om_in), "outlet": _ZG,
                                  "walls": _FV(om_in), "fb": _EM})])
    k = np.asarray(ts["k"].data)
    om = np.asarray(ts["omega"].data)
    nut = np.asarray(ts["nut"].data)
    assert np.isfinite(k).all() and (k > 0).all()
    assert np.isfinite(om).all() and (om > 0).all()
    assert np.isfinite(nut).all() and nut.max() > 1e-9


def test_sa_iddes_channel(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("iddes"))
    U, p, ts = _les_channel(
        d, "SpalartAllmarasIDDES",
        extra_schemes="div(phi,nuTilda) Gauss upwind;",
        solver_fields="U|nuTilda",
        fields=[("nuTilda", "volScalarField", "[0 2 -1 0 0 0 0]",
                 "uniform 4e-05", {"inlet": _FV("4e-05"), "outlet": _ZG,
                                   "walls": _FV(0), "fb": _EM})])
    nt = np.asarray(ts["nuTilda"].data)
    nut = np.asarray(ts["nut"].data)
    assert np.isfinite(nt).all() and (nt >= 0).all()
    assert np.isfinite(nut).all() and nut.max() > 1e-8


def test_lien_cubic_ke_pitz(tmp_path_factory):
    """LienCubicKE on pitzDaily: cubic closure + explicit nonlinear
    stress in momentum stays stable and produces eddy viscosity."""
    d = str(tmp_path_factory.mktemp("liencubic"))
    pitz_daily_case(d, end_time=8, model="LienCubicKE")
    L.Info.enabled = False
    try:
        from rapidcfd_tpu.solvers import simplefoam
        case, U, p, phi, ts = simplefoam.run(d, write=False)
    finally:
        L.Info.enabled = True
    u = np.asarray(U.data)
    k = np.asarray(ts["k"].data)
    eps = np.asarray(ts["epsilon"].data)
    nut = np.asarray(ts["nut"].data)
    assert np.isfinite(u).all() and np.isfinite(nut).all()
    assert (k > 0).all() and (eps > 0).all() and (nut >= 0).all()
    assert nut.max() > 1e-5


def test_kkl_omega_pitz(tmp_path_factory):
    """kkLOmega transitional model on pitzDaily: kt/kl/omega transport
    runs, energies stay positive, nut = nuts+nutl is produced."""
    from rapidcfd_tpu.utils.casegen import write_field
    d = str(tmp_path_factory.mktemp("kklomega"))
    pitz_daily_case(d, end_time=6, model="kkLOmega")
    # widen the linear-solver entry to cover kt/kl
    fvsol = os.path.join(d, "system", "fvSolution")
    with open(fvsol) as fh:
        txt = fh.read()
    txt = txt.replace("(U|k|epsilon|omega|nuTilda)",
                      "(U|k|epsilon|omega|nuTilda|kt|kl)")
    with open(fvsol, "w") as fh:
        fh.write(txt)
    k_in = 1.5 * (0.05 * 10.0) ** 2
    om_in = 0.09 ** 0.75 * k_in ** 1.5 / (0.1 * 0.0254) / (0.09 * k_in)
    write_field(d, "0", "omega", "volScalarField", "[0 0 -1 0 0 0 0]",
                f"uniform {om_in}", {
                    "inlet": _FV(om_in), "outlet": _ZG,
                    "upperWall": _ZG, "lowerWall": _ZG,
                    "frontAndBack": _EM})
    for name, v in (("kt", k_in), ("kl", 1e-8)):
        write_field(d, "0", name, "volScalarField", "[0 2 -2 0 0 0 0]",
                    f"uniform {v}", {
                        "inlet": _FV(v), "outlet": _ZG,
                        "upperWall": _FV(1e-10), "lowerWall": _FV(1e-10),
                        "frontAndBack": _EM})
    L.Info.enabled = False
    try:
        from rapidcfd_tpu.solvers import simplefoam
        case, U, p, phi, ts = simplefoam.run(d, write=False)
    finally:
        L.Info.enabled = True
    kt = np.asarray(ts["kt"].data)
    kl = np.asarray(ts["kl"].data)
    om = np.asarray(ts["omega"].data)
    nut = np.asarray(ts["nut"].data)
    assert np.isfinite(kt).all() and (kt > 0).all()
    assert np.isfinite(kl).all() and (kl > 0).all()
    assert np.isfinite(om).all() and (om > 0).all()
    assert np.isfinite(nut).all() and (nut >= 0).all()
    assert nut.max() > 1e-6
