"""fp32 robustness regression tests.

Round-2 root-caused failure chain on fine meshes (>=48^2 cavity):
1. `Empty` BC materialized zeros -> 1/A made inf -> rAU*H made NaN at
   every empty face of phi (2*nCells of them on a 2D mesh).
2. fp32 Krylov recursive residuals drift from the true residual, so the
   loop reported convergence the solution didn't have.
3. The 25-iteration stagnation guard killed legitimate CG plateaus
   (1-norm residuals oscillate), returning pressure at ~0.05 residual.
The combination made the 48^2+ cavity explode within 10 steps while all
solves "converged". The fixed fp32 path tracks the fp64 trajectory to
plot accuracy (verified at 48^2 and 384^2).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from rapidcfd_tpu.utils import logging as L
from rapidcfd_tpu.utils.casegen import cavity_case


def _run_cavity(tmp_path, n, steps, cfl=1.0, **solver_kw):
    """Run in TRUE fp32: the test conftest enables x64 globally (fp64
    everywhere), which is exactly how round-1 tests stayed green while
    the fp32 bench exploded — these tests exist to cover the fp32
    path, so they run the whole case inside disable_x64()."""
    L.Info.enabled = False
    try:
        import jax
        with jax.enable_x64(False):
            from rapidcfd_tpu.fields.field import Dimensioned
            from rapidcfd_tpu.ops import fvc
            from rapidcfd_tpu.solvers import icofoam
            from rapidcfd_tpu.solvers.case import Case
            d = str(tmp_path)
            dt = 0.005 * 20 / n * cfl
            cavity_case(d, n=n, delta_t=dt, end_time=1e9, **solver_kw)
            case = Case(d)
            assert case.mesh.V.dtype == jnp.float32
            nu = Dimensioned.from_entry(
                case.transport_properties().lookup("nu", required=True),
                "nu")
            step = icofoam.make_step(case, nu, 2, 0, 0, 0.0)
            U = case.read_field("U")
            p = case.read_field("p")
            phi = jax.jit(lambda u: fvc.flux(case.mesh, u))(U)
            for _ in range(steps):
                U, p, phi, _st = step(U, p, phi, dt)
            return case, U, p, phi
    finally:
        L.Info.enabled = True


def test_no_nan_at_empty_faces(tmp_path):
    """phi must stay finite on EVERY face (incl. empty patches) — the
    0*inf leak from zero-filled Empty bvalues through 1/A."""
    case, U, p, phi = _run_cavity(tmp_path, 32, 5)
    assert np.isfinite(np.asarray(phi.data)).all()
    assert np.isfinite(np.asarray(U.data)).all()
    assert np.isfinite(np.asarray(U.bvalues)).all()


def test_fp32_dic_cavity48_stable(tmp_path):
    """48^2 cavity at CFL=1 with the weak (DIC/DILU) preconditioners:
    diverged within 10 steps before the fp32 fixes; must now track the
    fp64 steady approach (max|U| -> 0.939)."""
    case, U, p, phi = _run_cavity(tmp_path, 48, 30)
    umax = float(jnp.abs(U.data).max())
    assert np.isfinite(np.asarray(U.data)).all()
    assert umax < 1.01, f"cavity diverging: max|U|={umax}"
    assert float(jnp.abs(p.data).max()) < 40.0


def test_fp32_gamg_precond_cavity48_matches_fp64_steady(tmp_path):
    """The bench config (PCG + GAMG V-cycle preconditioner) converges in
    <15 iterations and lands on the fp64 trajectory value."""
    case, U, p, phi = _run_cavity(
        tmp_path, 48, 40, p_solver="PCG", p_precond="GAMG",
        u_solver="PBiCGStab", u_precond="DILU")
    umax = float(jnp.abs(U.data).max())
    # fp64 reference trajectory reaches 0.9386 at step 40 (steady 0.9388)
    assert abs(umax - 0.9386) < 5e-3, umax


def test_repin_keeps_reference_cell_level(tmp_path):
    """After every pressure solve the setReference pin must hold exactly
    (the level is re-pinned post-solve; in-solve pinning is one cell out
    of N and drifts in fp32)."""
    case, U, p, phi = _run_cavity(tmp_path, 32, 3)
    assert abs(float(p.data[0])) < 5e-4 * max(
        1.0, float(jnp.abs(p.data).max()))
