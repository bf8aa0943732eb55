"""solidDisplacementFoam — segregated linear-elastic stress analysis.

Capability parity with the reference solver (reference:
applications/solvers/stressAnalysis/solidDisplacementFoam/
solidDisplacementFoam.C:56-123 with readMechanicalProperties.H /
readThermalProperties.H): d2dt2(D) == laplacian(2mu+lambda, D) +
divSigmaExp, outer-corrected with the compact normal-stress form
divSigmaExp = div(sigmaD - (2mu+lambda) gradD); optional thermal stress.
Properties are density-normalised (E/rho, k/rho) like the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..fields.field import Dimensioned, VolField
from ..linalg import solve
from ..ops import fvc, fvm
from ..utils.dimensions import DimensionSet
from ..utils.logging import ExecutionTimer, info, log_solve
from .case import Case


def _scalar(d, name):
    e = d.lookup(name, required=False)
    if e is None:
        return None
    if isinstance(e, tuple):
        return float(e[-1])
    if isinstance(e, dict):
        return float(e.scalar("value"))
    if isinstance(e, list):
        return float(e[-1])
    return float(e)


def run(case_dir: str, write: bool = True, max_steps: int | None = None):
    case = Case(case_dir)
    mesh = case.mesh
    mp = case.constant_dict("mechanicalProperties")

    from ..utils.dictionary import ParseError

    def _subdict(d, name):
        try:
            return d.subdict(name, required=False)
        except ParseError:        # plain (non-dict) entry of that name
            return None

    def prop(name):
        sub = _subdict(mp, name)
        if sub is not None:
            return _scalar(sub, "value")
        return _scalar(mp, name)

    rho = prop("rho")
    E = prop("E") / rho           # density-normalised stiffness
    nu = prop("nu")
    if not 0.0 <= nu < 0.5:
        raise ValueError(f"mechanicalProperties: Poisson ratio nu={nu} "
                         f"must be in [0, 0.5) for linear elasticity")
    plane_stress = str(mp.word("planeStress", "no")) in ("yes", "on",
                                                         "true")
    mu = E / (2.0 * (1.0 + nu))
    if plane_stress:
        lam = nu * E / ((1.0 + nu) * (1.0 - nu))
        three_k = E / (1.0 - nu)
    else:
        lam = nu * E / ((1.0 + nu) * (1.0 - 2.0 * nu))
        three_k = E / (1.0 - 2.0 * nu)

    # thermal stress (readThermalProperties.H)
    thermal = False
    T = None
    DT = three_k_alpha = 0.0
    try:
        tp = case.constant_dict("thermalProperties")
        thermal = str(tp.word("thermalStress", "no")) in ("yes", "on",
                                                          "true")
    except FileNotFoundError:
        tp = None
    if thermal:
        def tprop(name):
            sub = _subdict(tp, name)
            return _scalar(sub, "value") if sub is not None \
                else _scalar(tp, name)
        C = tprop("C")
        k_th = tprop("k")
        alpha = tprop("alpha")
        DT = (k_th / rho) / C
        three_k_alpha = three_k * alpha
        T = case.read_field("T").store_old()

    D = case.read_field("D").store_old(levels=2)
    d_controls = case.solver_controls("D")
    t_controls = case.solver_controls("T") if thermal else None
    lap_corr = case.laplacian_scheme()
    from ..utils.dictionary import Dictionary
    sd = case.algo_dict("stressAnalysis") or Dictionary()
    n_corr = int(sd.scalar("nCorrectors", 1))
    conv_tol = float(sd.scalar("D", 1e-06))
    _SPEC = DimensionSet.of(0, 2, -2)   # density-normalised stress
    gamma = Dimensioned("2mu+lambda", _SPEC, 2.0 * mu + lam)

    @jax.jit
    def step(D: VolField, T, dt):
        D = D.store_old(levels=2)
        t_perf = None
        if thermal:
            T2 = T.store_old()
            tEqn = fvm.ddt(mesh, T2, dt) - fvm.laplacian(
                mesh, Dimensioned("DT", DimensionSet.of(0, 2, -1), DT),
                T2, lap_corr)
            T, t_perf = solve(mesh, tEqn, t_controls)
        d_perf = None
        for corr in range(n_corr):
            gradD = fvc.grad(mesh, D)

            def sig_expl(gd):
                # sigmaD - (2mu+lambda) gradD, compact normal-stress form
                sym2 = gd + jnp.swapaxes(gd, -1, -2)
                trg = gd[..., 0, 0] + gd[..., 1, 1] + gd[..., 2, 2]
                eye = jnp.eye(3, dtype=gd.dtype)
                return mu * sym2 + lam * trg[..., None, None] * eye \
                    - (2.0 * mu + lam) * gd

            expl_f = gradD.with_calculated_bcs(
                sig_expl(gradD.data), sig_expl(gradD.bvalues), _SPEC,
                "sigmaExp")
            rhs = fvc.div_tensor(mesh, expl_f)
            if thermal:
                tk = fvc.grad(mesh, T * three_k_alpha)
                rhs = rhs.replace(data=rhs.data + tk.data)
            DEqn = fvm.d2dt2(mesh, D, dt) \
                - fvm.laplacian(mesh, gamma, D, lap_corr)
            D, d_perf = solve(mesh, DEqn.equals(rhs), d_controls)
        return D, T, d_perf, t_perf

    timer = ExecutionTimer()
    info("\nCalculating displacement field\n")
    n = 0
    while case.time.loop():
        info(f"Iteration: {case.time.name}\n")
        D, T, d_perf, t_perf = step(D, T, case.time.delta_t)
        for cmpt, perf in zip("xyz", d_perf):
            log_solve(d_controls.solver, f"D{cmpt}", perf[0], perf[1],
                      perf[2])
        timer.log()
        if write and case.time.write_time():
            out = [D]
            if thermal:
                out.append(T)
            case.write_fields(out)
        n += 1
        if max_steps and n >= max_steps:
            break
        if d_perf is not None and float(d_perf[0][0]) < conv_tol:
            info("Converged\n")
            break
    info("End\n")
    return case, D, T


def run_equilibrium(case_dir: str, write: bool = True,
                    max_steps: int | None = None):
    """solidEquilibriumDisplacementFoam — steady elasticity by
    accumulated displacement corrections (reference: stressAnalysis/
    solidEquilibriumDisplacementFoam/solidEquilibriumDisplacementFoam.C:
    52-80): solve laplacian(2mu+lambda, Dcorr) == -div(sigmaExp+sigmaD),
    D += accFac*Dcorr, with the explicit stress accumulators updated
    from grad(Dcorr)."""
    case = Case(case_dir)
    mesh = case.mesh
    mp = case.constant_dict("mechanicalProperties")
    from ..utils.dictionary import Dictionary, ParseError

    def _subdict(d, name):
        try:
            return d.subdict(name, required=False)
        except ParseError:
            return None

    def prop(name):
        sub = _subdict(mp, name)
        if sub is not None:
            return _scalar(sub, "value")
        return _scalar(mp, name)

    rho = prop("rho")
    E = prop("E") / rho
    nu = prop("nu")
    if not 0.0 <= nu < 0.5:
        raise ValueError(f"mechanicalProperties: Poisson ratio nu={nu} "
                         f"must be in [0, 0.5) for linear elasticity")
    mu = E / (2.0 * (1.0 + nu))
    plane_stress = str(mp.word("planeStress", "no")) in ("yes", "on",
                                                         "true")
    if plane_stress:
        lam = nu * E / ((1.0 + nu) * (1.0 - nu))
    else:
        lam = nu * E / ((1.0 + nu) * (1.0 - 2.0 * nu))

    D = case.read_field("D")
    if case.field_exists("Dcorr"):
        Dcorr = case.read_field("Dcorr")
    else:
        # corrections use D's BC TYPES with zeroed data (the reference
        # reads 0/Dcorr then zeroes it: createFields.H 'Dcorr *= 0.0')
        zeroed = tuple(
            {k: (v * 0 if hasattr(v, "dtype") else v)
             for k, v in bd.items()} for bd in D.bcdata)
        Dcorr = D.replace(name="Dcorr", data=D.data * 0,
                          bvalues=D.bvalues * 0, bcdata=zeroed)
    d_controls = case.solver_controls("Dcorr") \
        if case.fv_solution.subdict("solvers").lookup("Dcorr") is not None \
        else case.solver_controls("D")
    lap_corr = case.laplacian_scheme()
    sd = case.algo_dict("stressAnalysis") or Dictionary()
    acc_fac = float(sd.scalar("accelerationFactor", 2.0))
    conv_tol = float(sd.scalar("D", 1e-06))
    _SPEC = DimensionSet.of(0, 2, -2)
    gamma = Dimensioned("2mu+lambda", _SPEC, 2.0 * mu + lam)

    @jax.jit
    def step(D, Dcorr, sigma_exp, sigma_d):
        expl = fvc._extrapolated(mesh, sigma_exp + sigma_d,
                                 _SPEC, "sigmaTot")
        rhs = fvc.div_tensor(mesh, expl)
        DEqn = -fvm.laplacian(mesh, gamma, Dcorr, lap_corr)
        Dcorr, perf = solve(mesh, DEqn.equals(rhs), d_controls)
        D = D.replace(data=D.data + acc_fac * Dcorr.data,
                      bvalues=D.bvalues + acc_fac * Dcorr.bvalues)
        g = fvc.grad(mesh, Dcorr).data
        gt = jnp.swapaxes(g, -1, -2)
        tr = g[..., 0, 0] + g[..., 1, 1] + g[..., 2, 2]
        eye = jnp.eye(3, dtype=g.dtype)
        sigma_exp = (lam - mu) * g + mu * gt \
            + lam * tr[..., None, None] * eye
        sigma_d = sigma_d + acc_fac * (mu * (g + gt)
                                       + lam * tr[..., None, None] * eye)
        return D, Dcorr, sigma_exp, sigma_d, perf

    n_c = mesh.n_cells
    dtype = D.data.dtype
    sigma_exp = jnp.zeros((n_c, 3, 3), dtype)
    sigma_d = jnp.zeros((n_c, 3, 3), dtype)

    timer = ExecutionTimer()
    info("\nCalculating displacement field\n")
    n = 0
    while case.time.loop():
        info(f"Iteration: {case.time.name}\n")
        D, Dcorr, sigma_exp, sigma_d, perf = step(D, Dcorr, sigma_exp,
                                                  sigma_d)
        for cmpt, p in zip("xyz", perf):
            log_solve(d_controls.solver, f"Dcorr{cmpt}", p[0], p[1], p[2])
        timer.log()
        if write and case.time.write_time():
            case.write_fields([D])
        n += 1
        if max_steps and n >= max_steps:
            break
        if float(perf[0][0]) < conv_tol:
            info("Converged\n")
            break
    info("End\n")
    return case, D
