"""Krylov/smoother linear solvers as fully-jitted lax.while_loop iterations.

Capability surface of the reference's lduMatrix::solver zoo (reference:
src/OpenFOAM/matrices/lduMatrix/solvers/): PCG (PCG.C:67-205), PBiCGStab,
smoothSolver (Jacobi sweeps; GaussSeidel aliases to Jacobi per the
reference's data-parallel finding), diagonal. Residual normalisation and
convergence tests match the reference's solverPerformance semantics so
log lines are comparable.

Every iteration is on-device; the only host interaction is reading the
(initial, final, iterations) triple after the step for logging. Global
reductions go through `gsum`, which the distributed layer overrides with
psum inside shard_map (SURVEY.md §5.8 item 4).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from ..mesh.mesharrays import MeshArrays
from ..ops.fvmatrix import FvMatrix
from ..utils.registry import lookup, register
from . import preconditioners  # noqa: F401  (populate registry)

_SMALL = 1e-20

# Krylov true-residual replacement period: every _RESTART iterations the
# recursive residual is replaced by the explicitly recomputed
# b - A*psi. In fp32 the recurrence drifts (roundoff accumulates over
# alpha/beta updates) and reports convergence the solution doesn't
# have — on large meshes the resulting pressure error destabilizes the
# whole run. Cost: one extra SpMV amortized 1/_RESTART.
_RESTART = 32


# global-sum hook: the parallel layer rebinds this inside shard_map.
# Semantics: reduce over the CELL axis (axis 0) only, so column-batched
# solves get per-column reductions; scalar fields still give scalars.
def _gsum_default(x):
    return jnp.sum(x, axis=0)


_GSUM = _gsum_default


def set_gsum(fn):
    """Install a distributed global-sum (psum-wrapped) implementation."""
    global _GSUM
    _GSUM = fn


def gsum(x):
    return _GSUM(x)


def _gmax_default(x):
    return jnp.max(x)


_GMAX = _gmax_default


def set_gmax(fn):
    global _GMAX
    _GMAX = fn


def gmax(x):
    return _GMAX(x)


@dataclass(frozen=True)
class SolverControls:
    solver: str = "PCG"
    preconditioner: str = "DIC"
    smoother: str = "Jacobi"
    tolerance: float = 1e-6
    rel_tol: float = 0.0
    max_iter: int = 1000
    min_iter: int = 0
    n_sweeps: int = 1
    # GAMG controls (reference: GAMGSolver dict entries). None = "not
    # set in fvSolution": the hierarchy builder then picks the TPU-tuned
    # shape (shallow aggressive agglomeration + large MXU dense coarsest
    # — linalg.gamg.gamg_shape) instead of the reference's CPU-tuned
    # (mergeLevels 1, nCellsInCoarsestLevel 32), which is 5-7x slower
    # per V-cycle on TPU (deep hierarchies are latency-bound).
    n_pre_sweeps: int = 0
    n_post_sweeps: int = 2
    n_finest_sweeps: int = 2
    n_coarsest_cells: int | None = None
    merge_levels: int | None = None
    # fixed coarse-correction over-relaxation for the (linear) GAMG
    # preconditioner; None = auto (2.0 — the near-optimal over-
    # correction for piecewise-constant 4:1 aggregation). Line-search
    # (solver-mode) cycles ignore it.
    vcycle_scale: float | None = None

    @staticmethod
    def from_dict(d) -> "SolverControls":
        if d is None:
            return SolverControls()
        return SolverControls(
            solver=d.word("solver", "PCG"),
            preconditioner=d.word("preconditioner", "DIC"),
            smoother=d.word("smoother", "Jacobi"),
            tolerance=d.scalar("tolerance", 1e-6),
            rel_tol=d.scalar("relTol", 0.0),
            max_iter=int(d.scalar("maxIter", 1000)),
            min_iter=int(d.scalar("minIter", 0)),
            n_sweeps=int(d.scalar("nSweeps", 1)),
            n_pre_sweeps=int(d.scalar("nPreSweeps", 0)),
            n_post_sweeps=int(d.scalar("nPostSweeps", 2)),
            n_finest_sweeps=int(d.scalar("nFinestSweeps", 2)),
            n_coarsest_cells=(None if d.lookup("nCellsInCoarsestLevel")
                              is None
                              else int(d.scalar("nCellsInCoarsestLevel",
                                                32))),
            merge_levels=(None if d.lookup("mergeLevels") is None
                          else int(d.scalar("mergeLevels", 1))),
            vcycle_scale=(None if d.lookup("vCycleScale") is None
                          else d.scalar("vCycleScale", 2.0)),
        )


# A solver performance record is a plain (initial_residual,
# final_residual, n_iterations) tuple of device scalars (pytree-safe).
SolverPerformance = tuple


def _amul_fn(mesh: MeshArrays, m: FvMatrix, diag):
    """diag may be (n,) or (n,m); x likewise (column-batched vector
    solves run all components through one matrix product). The
    off-diagonal product comes from FvMatrix.offdiag_mv (structured DIA
    planes / banded MXU / ELL gather fallback)."""
    from ..parallel.hooks import halo
    off_mv = m.offdiag_mv(mesh)
    cmv = m.coupled_mv(mesh)

    def amul(x):
        out = diag * x + off_mv(halo(x))
        if cmv is not None:
            out = cmv(x, out)
        return out
    return amul


def _norm_factor(amul, psi, source, apsi, v_ones):
    """Reference normFactor (lduMatrix::solver::normFactor): with
    xRef = average(psi): gSum(|Apsi - A xRef| + |source - A xRef|) + SMALL."""
    x_ref = gsum(psi) / gsum(v_ones)
    a_xref = amul(jnp.full_like(psi, 1.0) * x_ref)
    return (gsum(jnp.abs(apsi - a_xref)) + gsum(jnp.abs(source - a_xref))
            + _SMALL)


def _gdia_sync(mesh, x):
    """Restore the ghost-synced field invariant after a solve on a gdia
    lattice mesh (mesh/gdia.py): solver iterations leave ghost slots at
    their (stale) initial values."""
    g = getattr(mesh, "gdia", None)
    if g is None:
        return x
    from ..mesh import gdia as gd
    return gd.sync(g, x)


def solve_component(mesh: MeshArrays, m: FvMatrix, cmpt: int | None,
                    controls: SolverControls):
    """Solve one scalar component of the system; returns (psi, perf)."""
    diag, source = m.component_system(mesh, cmpt)
    psi0 = m.psi.data if cmpt is None else m.psi.data[:, cmpt]
    amul = _amul_fn(mesh, m, diag)

    name = controls.solver
    if name in ("PCG", "ICCG"):
        return _pcg(mesh, amul, m, diag, source, psi0, controls)
    if name in ("PBiCGStab", "PBiCG", "BICCG"):
        return _pbicgstab(mesh, amul, m, diag, source, psi0, controls)
    if name == "smoothSolver":
        return _smooth_solver(mesh, amul, m, diag, source, psi0, controls)
    if name == "diagonal":
        from .preconditioners import _safe_recip
        psi = source * _safe_recip(diag)
        z = jnp.asarray(0.0, psi.dtype)
        return psi, (z, z, jnp.asarray(0, jnp.int32))
    if name == "GAMG":
        from .gamg import gamg_solve
        return gamg_solve(mesh, m, amul, diag, source, psi0, controls)
    raise KeyError(f"unknown linear solver '{name}'")


def _gamg_precond(mesh, m, amul, diag, c: SolverControls):
    """One linear multigrid V-cycle as a Krylov preconditioner.

    PCG requires a SYMMETRIC preconditioner, so the sweep counts are
    forced to the symmetric (1,1,1) V(1,1) form regardless of the
    solver-mode nPre/nPostSweeps entries (an asymmetric V-cycle costs
    PCG 3-4x the iterations). The coarse-correction over-relaxation
    defaults to 2.0 — near-optimal for piecewise-constant 4:1
    aggregation — unless fvSolution sets vCycleScale."""
    import dataclasses

    from .gamg import make_vcycle
    scale = 2.0 if c.vcycle_scale is None else c.vcycle_scale
    cp = dataclasses.replace(c, n_pre_sweeps=1, n_post_sweeps=1,
                             n_finest_sweeps=1)
    vc = make_vcycle(mesh, m, amul, diag, cp, scale_correction=False,
                     fixed_scale=scale)

    def precond(r):
        return vc(jnp.zeros_like(r), r)
    return precond


def _converged(res, res0, c: SolverControls, it):
    ok = (res <= c.tolerance) | ((c.rel_tol > 0)
                                 & (res <= c.rel_tol * res0))
    return jnp.all(ok) & (it >= c.min_iter)


def _pcg(mesh, amul, m, diag, source, psi0, c: SolverControls):
    """Preconditioned conjugate gradient (reference PCG.C:67-205).
    preconditioner GAMG uses one unscaled multigrid V-cycle per
    application (the reference's GAMG-preconditioned PCG)."""
    if c.preconditioner == "GAMG" and m is not None:
        precond = _gamg_precond(mesh, m, amul, diag, c)
    else:
        precond = lookup("lduPreconditioner", c.preconditioner)(mesh, m,
                                                                diag)
    v_ones = jnp.ones_like(psi0)

    apsi = amul(psi0)
    nf = _norm_factor(amul, psi0, source, apsi, v_ones)
    r0 = source - apsi
    res0 = gsum(jnp.abs(r0)) / nf
    # DELTA FORM: iterate on the correction delta (A*delta = r0 from
    # delta=0) and add psi0 once at the end. With a large static offset
    # in the solution (SI absolute pressure ~1e5 Pa), per-iteration
    # updates smaller than eps*|psi| would quantize away against psi —
    # in fp32 the pressure then never improves below the 0.01 Pa/update
    # floor and SIMPLE slowly diverges. Residual values are IDENTICAL
    # to the direct form (r = r0 - A*delta = source - A*psi), so
    # reported (initial, final) residuals and the normFactor semantics
    # are unchanged.
    b = r0
    # the stagnation guard exists ONLY for fp32 floors sitting above the
    # requested tolerance; fp64 converges past any practical tolerance,
    # and long (legitimate) CG plateaus must not be cut short there
    stall = 100 if psi0.dtype == jnp.float32 else c.max_iter

    def cond(carry):
        psi, r, p, wr_old, it, res, best, since_best = carry
        return (~_converged(res, res0, c, it)) & (it < c.max_iter) \
            & (since_best < stall)

    def body(carry):
        psi, r, p, wr_old, it, res, best, since_best = carry
        w = precond(r)
        wr = gsum(w * r)
        beta = jnp.where(it == 0, 0.0, wr / jnp.where(wr_old == 0.0,
                                                      _SMALL, wr_old))
        p = w + beta * p
        wa = amul(p)
        wapa = gsum(wa * p)
        alpha = wr / jnp.where(wapa == 0.0, _SMALL, wapa)
        psi = psi + alpha * p
        # fp32: the recursive residual drifts from the true residual
        # (classic CG roundoff) — the loop then reports convergence the
        # solution doesn't have, and on large meshes the pressure error
        # feeds back until the run explodes. Replace the recurrence with
        # an explicitly recomputed residual every _RESTART iterations
        # (one extra SpMV amortized 1/_RESTART).
        r = lax.cond((it + 1) % _RESTART == 0,
                     lambda psi, r, wa: b - amul(psi),
                     lambda psi, r, wa: r - alpha * wa,
                     psi, r, wa)
        res = gsum(jnp.abs(r)) / nf
        improved = jnp.any(res < 0.999 * best)
        best = jnp.minimum(best, res)
        since_best = jnp.where(improved, 0, since_best + 1)
        return psi, r, p, wr, it + 1, res, best, since_best

    init = (jnp.zeros_like(psi0), r0, jnp.zeros_like(psi0),
            jnp.zeros_like(res0), jnp.asarray(0, jnp.int32), res0, res0,
            jnp.asarray(0, jnp.int32))
    out = lax.while_loop(cond, body, init)
    psi, it, res = psi0 + out[0], out[4], out[5]
    return psi, (res0, res, it)


def _pbicgstab(mesh, amul, m, diag, source, psi0, c: SolverControls):
    """Preconditioned BiCGStab (reference PBiCGStab.H:50), for asymmetric
    systems (convection-dominated equations). preconditioner GAMG uses
    one linear multigrid V-cycle per application (column-batched for
    vector systems)."""
    if c.preconditioner == "GAMG" and m is not None:
        precond = _gamg_precond(mesh, m, amul, diag, c)
    else:
        precond = lookup("lduPreconditioner", c.preconditioner)(
            mesh, m, diag)
    v_ones = jnp.ones_like(psi0)

    apsi = amul(psi0)
    nf = _norm_factor(amul, psi0, source, apsi, v_ones)
    r0 = source - apsi
    b = r0     # delta form (see _pcg): iterate on A*delta = r0
    rr0 = r0   # shadow residual
    res0 = gsum(jnp.abs(r0)) / nf
    # same fp32 stagnation guard as _pcg: an absolute tolerance below
    # the fp32 floor must not spin the loop to maxIter
    stall = 100 if psi0.dtype == jnp.float32 else c.max_iter

    def cond(carry):
        (psi, r, p, v, rho_o, alpha_o, omega_o, it, res,
         best, since_best) = carry
        return (~_converged(res, res0, c, it)) & (it < c.max_iter) \
            & (since_best < stall)

    def body(carry):
        (psi, r, p, v, rho_o, alpha_o, omega_o, it, res,
         best, since_best) = carry
        rho = gsum(rr0 * r)
        beta = (rho / jnp.where(rho_o == 0.0, _SMALL, rho_o)) \
            * (alpha_o / jnp.where(omega_o == 0.0, _SMALL, omega_o))
        p = jnp.where(it == 0, r, r + beta * (p - omega_o * v))
        ph = precond(p)
        v = amul(ph)
        denom = gsum(rr0 * v)
        alpha = rho / jnp.where(denom == 0.0, _SMALL, denom)
        s = r - alpha * v
        sh = precond(s)
        t = amul(sh)
        tt = gsum(t * t)
        omega = gsum(t * s) / jnp.where(tt == 0.0, _SMALL, tt)
        psi = psi + alpha * ph + omega * sh
        # periodic true-residual replacement (see _RESTART)
        r = lax.cond((it + 1) % _RESTART == 0,
                     lambda psi, s, t: b - amul(psi),
                     lambda psi, s, t: s - omega * t,
                     psi, s, t)
        res = gsum(jnp.abs(r)) / nf
        improved = jnp.any(res < 0.999 * best)
        best = jnp.minimum(best, res)
        since_best = jnp.where(improved, 0, since_best + 1)
        return (psi, r, p, v, rho, alpha, omega, it + 1, res,
                best, since_best)

    init = (jnp.zeros_like(psi0), r0, jnp.zeros_like(psi0),
            jnp.zeros_like(psi0),
            jnp.ones_like(res0), jnp.ones_like(res0),
            jnp.ones_like(res0), jnp.asarray(0, jnp.int32), res0,
            res0, jnp.asarray(0, jnp.int32))
    out = lax.while_loop(cond, body, init)
    psi, r, it, res = psi0 + out[0], out[1], out[7], out[8]
    return psi, (res0, res, it)


def jacobi_sweeps(mesh, amul, diag, source, psi, n: int,
                  omega: float = 0.9):
    """n damped-Jacobi sweeps (reference: JacobiSmoother.C:34-120,
    omega=0.9; GaussSeidel aliases here on data-parallel hardware)."""
    from .preconditioners import _safe_recip
    rd = omega * _safe_recip(diag)

    def body(i, psi):
        return psi + rd * (source - amul(psi))
    return lax.fori_loop(0, n, body, psi)


def _smooth_solver(mesh, amul, m, diag, source, psi0, c: SolverControls):
    """smoothSolver: sweep in groups of nSweeps until converged
    (reference: smoothSolver.H:54)."""
    v_ones = jnp.ones_like(psi0)
    apsi = amul(psi0)
    nf = _norm_factor(amul, psi0, source, apsi, v_ones)
    b = source - apsi    # delta form (see _pcg)
    res0 = gsum(jnp.abs(b)) / nf
    n_sweeps = max(1, c.n_sweeps)

    stall = 12 * n_sweeps if psi0.dtype == jnp.float32 else c.max_iter

    def cond(carry):
        psi, it, res, best, since_best = carry
        # stagnation guard: fp32 floors can sit above an absolute
        # tolerance — stop only when sweeps make NO measurable progress
        # (fp32 only; fp64 converges past any practical tolerance)
        return (~_converged(res, res0, c, it)) & (it < c.max_iter) \
            & (since_best < stall)

    def body(carry):
        psi, it, res, best, since_best = carry
        psi = jacobi_sweeps(mesh, amul, diag, b, psi, n_sweeps)
        res = gsum(jnp.abs(b - amul(psi))) / nf
        improved = jnp.any(res < (1.0 - 1e-6) * best)
        best = jnp.minimum(best, res)
        since_best = jnp.where(improved, 0, since_best + n_sweeps)
        return psi, it + n_sweeps, res, best, since_best

    psi, it, res, _, _ = lax.while_loop(
        cond, body, (jnp.zeros_like(psi0), jnp.asarray(0, jnp.int32),
                     res0, res0, jnp.asarray(0, jnp.int32)))
    return psi0 + psi, (res0, res, it)


def _repin_reference(m: FvMatrix, x):
    """Re-pin the solution level after solving a setReference'd system.

    The pin's residual signature is one cell out of N — far below any
    practical tolerance on a large mesh — so the constant near-null mode
    drifts freely during the solve. In fp64 the drift is noise; in fp32
    it compounds (normFactor grows with |psi|, loosening the absolute
    tolerance) until grad(p) precision collapses. Subtracting the
    level error at the reference cell pins it exactly at zero extra
    cost. Under shard_map, ref_weight is 1 on the owning shard and 0
    elsewhere, so the gsum broadcasts the owner's correction."""
    if m.ref_cell is None:
        return x
    delta = gsum(jnp.atleast_1d(
        m.ref_weight * (m.ref_value - x[m.ref_cell])))
    return x + delta


def solve(mesh: MeshArrays, m: FvMatrix, controls: SolverControls,
          env=None):
    """fvMatrix::solve equivalent: segregated solve + boundary update
    (reference: fvMatrixSolve.C:104-227). Vector systems are solved
    COLUMN-BATCHED: one Krylov iteration advances all components through
    a single multi-column matrix product (better MXU utilization than
    the reference's sequential per-component solves).

    Returns (new psi VolField, tuple of per-component SolverPerformance).
    """
    psi = m.psi
    if psi.data.ndim == 1:
        x, perf = solve_component(mesh, m, None, controls)
        x = _repin_reference(m, x)
        x = _gdia_sync(mesh, x)
        new = psi.replace(data=x).correct_boundary_conditions(mesh, env)
        return new, (perf,)
    n_comp = psi.data.shape[1]
    if controls.solver == "GAMG":  # scalar-only path
        comps, perfs = [], []
        for cmpt in range(n_comp):
            x, perf = solve_component(mesh, m, cmpt, controls)
            comps.append(x)
            perfs.append(perf)
        data = _gdia_sync(mesh, jnp.stack(comps, axis=1))
        new = psi.replace(data=data).correct_boundary_conditions(mesh, env)
        return new, tuple(perfs)

    diag, source = m.component_system_all(mesh)
    amul = _amul_fn(mesh, m, diag)
    name = controls.solver
    if name in ("PCG", "ICCG"):
        x, perf = _pcg(mesh, amul, m, diag, source, psi.data, controls)
    elif name in ("PBiCGStab", "PBiCG", "BICCG"):
        x, perf = _pbicgstab(mesh, amul, m, diag, source, psi.data,
                             controls)
    elif name == "smoothSolver":
        x, perf = _smooth_solver(mesh, amul, m, diag, source, psi.data,
                                 controls)
    elif name == "diagonal":
        from .preconditioners import _safe_recip
        x = source * _safe_recip(diag)
        z = jnp.zeros(n_comp, x.dtype)
        perf = (z, z, jnp.asarray(0, jnp.int32))
    else:
        raise KeyError(f"unknown linear solver '{name}'")
    x = _gdia_sync(mesh, x)
    new = psi.replace(data=x).correct_boundary_conditions(mesh, env)
    res0, res, it = perf
    perfs = tuple((res0[c], res[c], it) for c in range(n_comp))
    return new, perfs
