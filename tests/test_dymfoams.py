"""Moving-mesh (DyM) solver variants: sonicDyMFoam, cavitatingDyMFoam.

Reference: applications/solvers/compressible/sonicFoam/sonicDyMFoam/,
multiphase/cavitatingFoam/cavitatingDyMFoam/ — mesh.update() + relative
flux around the base solver sequence.
"""

import os

import numpy as np

from rapidcfd_tpu.mesh.polymesh import write_polymesh
from rapidcfd_tpu.utils import logging as L
from rapidcfd_tpu.utils.casegen import (_write, box_mesh,
                                        forward_step_case, write_field)
from rapidcfd_tpu.utils.dictionary import foamfile_header

_EMPTY = "        type            empty;\n"
_ZG = "        type            zeroGradient;\n"


def _fv(v):
    return ("        type            fixedValue;\n"
            f"        value           uniform {v};\n")


def _motion_dict(d, amplitude, period=0.01):
    omega = 2.0 * np.pi / period
    _write(os.path.join(d, "constant", "dynamicMeshDict"),
           foamfile_header("dictionary", "dynamicMeshDict", "constant"),
           f"""
dynamicFvMesh   solidBodyMotionFvMesh;
solidBodyMotionFvMeshCoeffs
{{
    solidBodyMotionFunction oscillatingLinearMotion;
    oscillatingLinearMotionCoeffs
    {{
        amplitude (0 {amplitude} 0);
        omega     {omega};
    }}
}}
""")


def test_sonicdym_zero_amplitude_matches_static(tmp_path_factory):
    """amplitude=0 motion must reproduce static sonicFoam stepping —
    the relative-flux plumbing (incl. phid makeRelative) is identity."""
    from rapidcfd_tpu.solvers import sonicfoam
    from rapidcfd_tpu.solvers.dymfoams import run_sonic_dym

    d1 = str(tmp_path_factory.mktemp("sdym0"))
    forward_step_case(d1)
    _motion_dict(d1, amplitude=0.0)
    d2 = str(tmp_path_factory.mktemp("sstat"))
    forward_step_case(d2)
    L.Info.enabled = False
    try:
        _, U1, p1, T1, *_ = run_sonic_dym(d1, write=False, max_steps=5)
        _, U2, p2, T2, _, _ = sonicfoam.run(d2, write=False,
                                            max_steps=5)
    finally:
        L.Info.enabled = True
    assert np.allclose(np.asarray(U1.data), np.asarray(U2.data),
                       atol=1e-8)
    assert np.allclose(np.asarray(p1.data), np.asarray(p2.data),
                       rtol=1e-8)
    assert np.allclose(np.asarray(T1.data), np.asarray(T2.data),
                       rtol=1e-8)


def test_sonicdym_oscillating_step_stays_bounded(tmp_path_factory):
    """Small transverse oscillation of the Mach-3 step domain: the
    shock-forming solution stays finite and physical."""
    from rapidcfd_tpu.solvers.dymfoams import run_sonic_dym

    d = str(tmp_path_factory.mktemp("sdym"))
    forward_step_case(d)
    _motion_dict(d, amplitude=0.001, period=0.02)
    L.Info.enabled = False
    try:
        case, U, p, T, rho, phi = run_sonic_dym(d, write=False,
                                                max_steps=12)
    finally:
        L.Info.enabled = True
    t = np.asarray(T.data)
    pr = np.asarray(p.data)
    assert np.isfinite(t).all() and np.isfinite(pr).all()
    assert (pr > 0).all() and (t > 0).all()


def _cavitating_case(d):
    mesh = box_mesh(40, 4, 1, size=(0.04, 0.004, 0.001), patch_spec={
        "xmin": ("inlet", "patch"), "xmax": ("outlet", "patch"),
        "ymin": ("walls", "wall"), "ymax": ("walls", "wall"),
        "zmin": ("fb", "empty"), "zmax": ("fb", "empty")})
    write_polymesh(mesh, d)
    _write(os.path.join(d, "system", "controlDict"),
           foamfile_header("dictionary", "controlDict", "system"), """
application cavitatingDyMFoam; startFrom startTime; startTime 0;
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
    return d


def test_cavitatingdym_oscillating_channel(tmp_path_factory):
    """cavitatingDyMFoam on the flashing channel with a small transverse
    oscillation: barotropic closure stays bounded under motion, and
    vapour still forms at the low-pressure outlet."""
    from rapidcfd_tpu.solvers.cavitatingfoam import run

    d = _cavitating_case(str(tmp_path_factory.mktemp("cdym")))
    _motion_dict(d, amplitude=5e-05, period=0.0002)
    L.Info.enabled = False
    try:
        case, p, U, rho, phi = run(d, write=False, max_steps=30,
                                   dym=True)
    finally:
        L.Info.enabled = True
    r = np.asarray(rho.data)
    u = np.asarray(U.data)
    assert np.isfinite(r).all() and np.isfinite(u).all()
    assert (r >= 0.001 - 1e-12).all()
    av = np.clip((r - 830.0) / (2.5e-6 * 8000 - 830.0), 0.0, 1.0)
    assert av.max() > 1e-5
    assert np.abs(u).max() < 500.0
