"""fp32-dominant precision for the compressible/thermo solvers.

SURVEY §7.2.5: fp32 fields with the fp64-proven Krylov machinery
(true-residual restarts, re-pin, compatibility projection) must carry
the thermo solvers too — on TPU, emulated fp64 is non-competitive by
construction, so every solver we can run fp32 must demonstrably track
the fp64 trajectory. These tests run the SAME case in true fp32
(inside jax.enable_x64(False), as the dispatcher's -precision fp32
does) and in fp64, and assert trajectory agreement.

Tolerances: transient shock propagation (sonicFoam, 60 steps) in fp32
accumulates O(eps32 * nsteps * condition) — plot-accuracy agreement
(~1e-3 relative) is the acceptance bar, matching the incompressible
fp32 criterion in test_fp32_stability.py.
"""

import jax
import numpy as np

from rapidcfd_tpu.utils import logging as L
from rapidcfd_tpu.utils.casegen import forward_step_case, hot_channel_case


def _run_sonic(d, steps):
    from rapidcfd_tpu.solvers import sonicfoam
    case, U, p, T, rho, phi = sonicfoam.run(d, max_steps=steps,
                                            write=False)
    return (np.asarray(p.data, np.float64),
            np.asarray(T.data, np.float64),
            np.asarray(U.data, np.float64))


def _run_rhosimple(d, steps):
    from rapidcfd_tpu.solvers import rhosimplefoam
    case, U, p, T, rho, phi = rhosimplefoam.run(d, max_steps=steps,
                                                write=False)
    return (np.asarray(p.data, np.float64),
            np.asarray(T.data, np.float64),
            np.asarray(U.data, np.float64))


def _agree(a32, a64, rtol, name):
    scale = np.max(np.abs(a64))
    err = np.max(np.abs(a32 - a64)) / max(scale, 1e-30)
    assert np.isfinite(a32).all(), f"{name}: fp32 non-finite"
    assert err < rtol, f"{name}: fp32 vs fp64 rel err {err:.3e} > {rtol}"
    return err


def test_sonicfoam_fp32_tracks_fp64(tmp_path_factory):
    L.Info.enabled = False
    try:
        d32 = str(tmp_path_factory.mktemp("fs32"))
        d64 = str(tmp_path_factory.mktemp("fs64"))
        forward_step_case(d32)
        forward_step_case(d64)
        with jax.enable_x64(False):
            p32, t32, u32 = _run_sonic(d32, 60)
        p64, t64, u64 = _run_sonic(d64, 60)
        _agree(p32, p64, 5e-3, "p")
        _agree(t32, t64, 5e-3, "T")
        _agree(u32, u64, 5e-3, "U")
    finally:
        L.Info.enabled = True


def test_rhosimplefoam_fp32_tracks_fp64(tmp_path_factory):
    """Absolute SI pressure (~1e5 Pa): the hardest fp32 case — the
    dynamic part of p is ~1e0-1e2 Pa, under fp32 resolution of the
    total. Acceptance: T/U plot-accurate, p to its DYNAMIC range."""
    L.Info.enabled = False
    try:
        d32 = str(tmp_path_factory.mktemp("hc32"))
        d64 = str(tmp_path_factory.mktemp("hc64"))
        hot_channel_case(d32)
        hot_channel_case(d64)
        with jax.enable_x64(False):
            p32, t32, u32 = _run_rhosimple(d32, 40)
        p64, t64, u64 = _run_rhosimple(d64, 40)
        _agree(t32, t64, 2e-3, "T")
        _agree(u32, u64, 2e-3, "U")
        # p: compare the dynamic part (p - mean), not the 1e5 offset
        dp32 = p32 - p32.mean()
        dp64 = p64 - p64.mean()
        scale = max(np.max(np.abs(dp64)), 1e-30)
        err = np.max(np.abs(dp32 - dp64)) / scale
        assert err < 0.02, f"p dynamic part rel err {err:.3e}"
    finally:
        L.Info.enabled = True


def _rhopimple_case(d):
    import os

    from rapidcfd_tpu.utils.casegen import _write
    from rapidcfd_tpu.utils.dictionary import foamfile_header
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


def _run_rhopimple(d):
    from rapidcfd_tpu.solvers import rhopimplefoam
    case, U, p, T, rho, phi = rhopimplefoam.run(d, write=False,
                                                max_steps=50)
    return (np.asarray(p.data, np.float64),
            np.asarray(T.data, np.float64),
            np.asarray(U.data, np.float64))


def test_rhopimplefoam_fp32_tracks_fp64(tmp_path_factory):
    """rhoPimpleFoam fp32 (deviation-form p + the p_offset*ddt(psi)
    compressibility source) tracks the fp64 trajectory on the heated
    channel — the gate for taking rhoPimpleFoam out of X64_DEFAULT."""
    L.Info.enabled = False
    try:
        d32 = str(tmp_path_factory.mktemp("rp32"))
        d64 = str(tmp_path_factory.mktemp("rp64"))
        _rhopimple_case(d32)
        _rhopimple_case(d64)
        with jax.enable_x64(False):
            p32, t32, u32 = _run_rhopimple(d32)
        p64, t64, u64 = _run_rhopimple(d64)
        # p varies ~Pa around 1e5: compare the DEVIATION field
        dp32 = p32 - np.mean(p32)
        dp64 = p64 - np.mean(p64)
        scale = max(np.abs(dp64).max(), 1e-30)
        assert np.abs(dp32 - dp64).max() / scale < 2e-2
        _agree(t32, t64, 2e-3, "T")
        assert np.abs(u32 - u64).max() < 2e-2 * max(
            np.abs(u64).max(), 1e-30)
        # absolute level preserved
        assert abs(np.mean(p32) - np.mean(p64)) < 2.0
    finally:
        L.Info.enabled = True
