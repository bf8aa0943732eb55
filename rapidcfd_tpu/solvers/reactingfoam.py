"""reactingFoam — transient reacting compressible PIMPLE solver.

Capability parity with the reference solver (reference:
applications/solvers/combustion/reactingFoam/reactingFoam.C with
YEqn.H/EEqn.H/chemistry.H + pEqn.H from rhoPimpleFoam): multi-species
transport with EulerImplicit finite-rate chemistry (laminar combustion
model — reaction rates taken directly from the chemistry), sensible
enthalpy energy with the heat-release source Qdot, psi-based pressure.

TPU-first: species mass fractions are ONE (nSpecie, nCells) stacked
array — the chemistry integrates all cells through a single batched
dense solve (models/chemistry.py), and the transport equations reuse
the shared fvm assembly per specie inside the same jitted step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..fields.field import Dimensioned, SurfaceField, VolField
from ..linalg import solve
from ..linalg.solvers import gsum
from ..models.chemistry import read_reacting_thermo
from ..ops import fvc, fvm
from ..utils.dimensions import DimensionSet, dim_density
from ..utils.logging import (ExecutionTimer, info, log_continuity,
                             log_courant, log_solve)
from .case import Case
from .controls import PimpleControl
from .icofoam import courant_number

_DIMLESS = DimensionSet.of(0, 0, 0)


def make_step(case: Case, thermo, chem, ctrl: PimpleControl):
    mesh = case.mesh
    div_u = case.div_scheme("div(phi,U)")
    try:
        div_y = case.div_scheme("div(phi,Yi_h)")
    except KeyError:
        div_y = div_u
    # multivariateSelection: ONE coupled limiter across all species
    # (reference: multivariateGaussConvectionScheme — shared weights
    # keep sum(Yi) bounded under limiting); the per-specie table picks
    # the limiter, min-combined over species at evaluation time
    multivariate = None
    if isinstance(div_y, tuple) and div_y \
            and str(div_y[0]) == "multivariateSelection":
        lim_name, lim_args = "vanLeer", ()
        if len(div_y) > 1 and hasattr(div_y[1], "items"):
            for _k, _v in div_y[1].items():
                if isinstance(_v, str):
                    lim_name, lim_args = _v, ()
                elif isinstance(_v, tuple):
                    lim_name, lim_args = str(_v[0]), tuple(_v[1:])
                break
        multivariate = (lim_name, lim_args)
    lap_corr = case.laplacian_scheme()
    ddt_scheme = case.ddt_scheme()
    u_controls = case.solver_controls("U")
    p_controls = case.solver_controls("p")
    p_final = case.solver_controls("p", final=True)
    h_controls = case.solver_controls("h")
    try:
        y_controls = case.solver_controls("Yi")
    except Exception:
        y_controls = h_controls
    n_outer = ctrl.n_outer
    n_corr = ctrl.n_correctors
    n_non_orth = ctrl.n_non_orth
    n_sub = int(ctrl.dict.scalar("nChemistrySubSteps", 1))
    # chemistry solver selection (reference: chemistryProperties
    # chemistryType { chemistrySolver ode|EulerImplicit|none; } +
    # odeCoeffs { relTol ...; })
    chem_solver = "EulerImplicit"
    ode_eps = 1e-4
    import os as _os
    from ..utils.dictionary import parse_file as _pf
    _cp = _os.path.join(case.dir, "constant", "chemistryProperties")
    if _os.path.isfile(_cp):
        cpd = _pf(_cp)
        ct = cpd.subdict("chemistryType", required=False)
        if ct is not None:
            chem_solver = str(ct.word("chemistrySolver",
                                      "EulerImplicit"))
        oc = cpd.subdict("odeCoeffs", required=False)
        if oc is not None:
            ode_eps = float(oc.scalar("relTol", 1e-4))
    inert = thermo.inert_idx
    ns = thermo.n

    def he_field(Y, T, name="h"):
        return T.with_calculated_bcs(
            thermo.he_from_t(Y[0], T.data),
            thermo.he_from_t(Y[1], T.bvalues),
            DimensionSet.of(0, 2, -2), name)

    @jax.jit
    def step(U: VolField, p: VolField, T: VolField, rho: VolField,
             Ys: tuple, phi: SurfaceField, dt):
        U = U.store_old()
        p = p.store_old()
        T = T.store_old()
        rho = rho.store_old()
        Ys = tuple(y.store_old() for y in Ys)

        Yst = jnp.stack([y.data for y in Ys])          # (ns, nC)
        Ysb = jnp.stack([y.bvalues for y in Ys])

        # ---- rhoEqn.H
        rho = rho.replace(
            data=rho.old.data - dt * fvc.div(mesh, phi).data) \
            .correct_boundary_conditions(mesh)

        # ---- chemistry.H: batched chemical integration over the
        # solver dt (EulerImplicit or the adaptive `ode` solver)
        chem_unfinished = jnp.asarray(0)
        if chem_solver in ("none", "noChemistrySolver"):
            rr = jnp.zeros_like(Yst)
        elif chem_solver == "ode":
            rr, chem_unfinished = chem.ode(rho.data, Yst, T.data, dt,
                                           eps=ode_eps)
        else:
            rr = chem.euler_implicit(rho.data, Yst, T.data, dt,
                                     n_sub=n_sub)       # kg/m3/s
        qdot = chem.qdot(rr, T.data)

        u_perf = h_perf = None
        y_perfs = ()
        p_perf_all = []
        for outer in range(n_outer):
            final_outer = outer == n_outer - 1

            # ---- UEqn.H (laminar: muEff = mu(Y,T))
            T_f = fvc.face_values(mesh, T)
            mu_f = Dimensioned(
                "muEff", DimensionSet.of(1, -1, -1),
                thermo.mu(jnp.stack([fvc.face_values(mesh, y)
                                     for y in Ys]), T_f))
            UEqn = (fvm.ddt(mesh, U, dt, ddt_scheme, coeff=rho)
                    + fvm.div(mesh, phi, U, div_u)
                    - fvm.laplacian(mesh, mu_f, U, lap_corr))
            U, u_perf = solve(mesh, UEqn == (-fvc.grad(mesh, p)),
                              u_controls)

            # ---- YEqn.H: transport every non-inert specie
            new_ys = list(Ys)
            y_perfs = []
            if multivariate is not None:
                from ..ops.interpolation import multivariate_weights
                w_mv = multivariate_weights(
                    mesh, [new_ys[i] for i in range(ns)], phi,
                    multivariate[0], *multivariate[1])
                div_y_eff = ("fixedWeights", w_mv)
            else:
                div_y_eff = div_y
            for i in range(ns):
                if i == inert:
                    continue
                yi = new_ys[i]
                rhs = yi.with_calculated_bcs(
                    rr[i], jnp.zeros_like(yi.bvalues),
                    dim_density / DimensionSet.of(0, 0, 1))
                yEqn = (fvm.ddt(mesh, yi, dt, ddt_scheme, coeff=rho)
                        + fvm.div(mesh, phi, yi, div_y_eff)
                        - fvm.laplacian(mesh, mu_f, yi, lap_corr))
                yi, perf = solve(mesh, yEqn.equals(rhs), y_controls,
                                 env={"phi": phi})
                yi = yi.replace(data=jnp.clip(yi.data, 0.0, 1.0))
                new_ys[i] = yi
                y_perfs.append(perf[0])
            if inert is not None:
                others = sum(new_ys[i].data for i in range(ns)
                             if i != inert)
                others_b = sum(new_ys[i].bvalues for i in range(ns)
                               if i != inert)
                new_ys[inert] = new_ys[inert].replace(
                    data=jnp.clip(1.0 - others, 0.0, 1.0),
                    bvalues=jnp.clip(1.0 - others_b, 0.0, 1.0))
            Ys = tuple(new_ys)
            y_perfs = tuple(y_perfs)
            Yst = jnp.stack([y.data for y in Ys])
            Ysb = jnp.stack([y.bvalues for y in Ys])

            # ---- EEqn.H: sensible enthalpy + Qdot
            h = he_field((Yst, Ysb), T).replace(old=None)
            h = h.replace(old=he_field(
                (jnp.stack([y.old.data for y in Ys]),
                 jnp.stack([y.old.bvalues for y in Ys])),
                T.old).replace(old=None))
            alpha_f = Dimensioned(
                "alphaEff", DimensionSet.of(1, -1, -1),
                thermo.alpha_h(jnp.stack(
                    [fvc.face_values(mesh, y) for y in Ys]), T_f))
            K = h.with_calculated_bcs(
                0.5 * (U.data * U.data).sum(-1),
                0.5 * (U.bvalues * U.bvalues).sum(-1), h.dims, "K")
            K_old = 0.5 * (U.old.data * U.old.data).sum(-1)
            ddt_rhoK = (rho.data * K.data - rho.old.data * K_old) / dt
            dpdt = (p.data - p.old.data) / dt
            rhs = h.with_calculated_bcs(
                dpdt - ddt_rhoK - fvc.div(mesh, phi, K, div_u).data
                + qdot,
                jnp.zeros_like(h.bvalues),
                h.dims * dim_density / DimensionSet.of(0, 0, 1))
            hEqn = (fvm.ddt(mesh, h, dt, ddt_scheme, coeff=rho)
                    + fvm.div(mesh, phi, h, div_u)
                    - fvm.laplacian(mesh, alpha_f, h, lap_corr))
            h, h_perf = solve(mesh, hEqn.equals(rhs), h_controls)
            T = T.replace(
                data=thermo.t_from_he(Yst, h.data, T.data),
                bvalues=thermo.t_from_he(Ysb, h.bvalues, T.bvalues))

            psi = T.with_calculated_bcs(
                thermo.psi(Yst, T.data), thermo.psi(Ysb, T.bvalues),
                DimensionSet.of(0, -2, 2), "psi")
            psi = psi.replace(old=T.old.with_calculated_bcs(
                thermo.psi(jnp.stack([y.old.data for y in Ys]),
                           T.old.data),
                thermo.psi(jnp.stack([y.old.bvalues for y in Ys]),
                           T.old.bvalues),
                DimensionSet.of(0, -2, 2), "psi").replace(old=None))

            # ---- pEqn.H (subsonic rhoPimpleFoam form)
            for corr in range(n_corr):
                rho = rho.replace(
                    data=thermo.rho(Yst, p.data, T.data),
                    bvalues=thermo.rho(Ysb, p.bvalues, T.bvalues))
                UEqn_c = UEqn.replace(psi=U)
                rAU = 1.0 / UEqn_c.A(mesh)
                HbyA = fvc.constrain_hbya(mesh, rAU * UEqn_c.H(mesh), U)
                rho_f = fvc.face_values(mesh, rho)
                phi_hbya = SurfaceField(
                    rho_f * fvc.flux(mesh, HbyA).data,
                    DimensionSet.of(1, 0, -1), "phiHbyA")
                rho_rau = rho * rAU
                for north in range(n_non_orth + 1):
                    final = (final_outer and corr == n_corr - 1
                             and north == n_non_orth)
                    pEqn = (fvm.ddt(mesh, p, dt, ddt_scheme, coeff=psi)
                            - fvm.laplacian(mesh, rho_rau, p, lap_corr))
                    pEqn = pEqn.equals(-fvc.div(mesh, phi_hbya))
                    p, p_perf = solve(mesh, pEqn,
                                      p_final if final else p_controls)
                    p_perf_all.append(p_perf[0])
                phi = phi_hbya + pEqn.replace(psi=p).flux(mesh)
                U = U.replace(
                    data=(HbyA - rAU * fvc.grad(mesh, p)).data) \
                    .correct_boundary_conditions(mesh)
                rho = rho.replace(
                    data=thermo.rho(Yst, p.data, T.data),
                    bvalues=thermo.rho(Ysb, p.bvalues, T.bvalues))

        cont = (rho.data - rho.old.data) / dt + fvc.div(mesh, phi).data
        local_err = gsum(jnp.abs(cont) * mesh.V)
        glob_err = gsum(cont * mesh.V)
        co = courant_number(mesh, phi / fvc.interpolate(mesh, rho), dt)
        stats = dict(u_perf=u_perf, h_perf=h_perf, y_perf=y_perfs,
                     p_perf=tuple(p_perf_all),
                     qdot_max=jnp.max(jnp.abs(qdot)),
                     chem_unfinished=chem_unfinished,
                     cont=(local_err, glob_err), co=co)
        return U, p, T, rho, Ys, phi, stats

    return step


def run(case_dir: str, write: bool = True, max_steps: int | None = None):
    case = Case(case_dir)
    mesh = case.mesh
    thermo, chem = read_reacting_thermo(case.dir)

    p = case.read_field("p")
    T = case.read_field("T")
    U = case.read_field("U")
    Ys = []
    for name in thermo.species:
        if case.field_exists(name):
            Ys.append(case.read_field(name))
        elif case.field_exists("Ydefault"):
            Ys.append(case.read_field("Ydefault").replace(name=name))
        else:
            raise FileNotFoundError(f"no initial field for specie "
                                    f"{name} (and no Ydefault)")
    Ys = tuple(Ys)
    Yst = jnp.stack([y.data for y in Ys])
    Ysb = jnp.stack([y.bvalues for y in Ys])
    rho = T.with_calculated_bcs(
        thermo.rho(Yst, p.data, T.data),
        thermo.rho(Ysb, p.bvalues, T.bvalues), dim_density, "rho")
    rho_f = fvc.face_values(mesh, rho)
    phi = SurfaceField(rho_f * fvc.flux(mesh, U).data,
                       DimensionSet.of(1, 0, -1), "phi")

    ctrl = PimpleControl(case)
    step = make_step(case, thermo, chem, ctrl)
    timer = ExecutionTimer()
    cumulative_err = 0.0

    info("\nStarting time loop\n")
    n = 0
    while case.time.loop():
        info(f"Time = {case.time.name}\n")
        U, p, T, rho, Ys, phi, stats = step(U, p, T, rho, Ys, phi,
                                            case.time.delta_t)
        log_courant(*stats["co"])
        for cmpt, perf in zip("xyz", stats["u_perf"]):
            log_solve(case.solver_controls("U").solver, f"U{cmpt}",
                      perf[0], perf[1], perf[2])
        for name, perf in zip(
                [s for i, s in enumerate(thermo.species)
                 if i != thermo.inert_idx], stats["y_perf"]):
            log_solve("PBiCGStab", name, perf[0], perf[1], perf[2])
        log_solve(case.solver_controls("h").solver, "h",
                  stats["h_perf"][0][0], stats["h_perf"][0][1],
                  stats["h_perf"][0][2])
        for perf in stats["p_perf"]:
            log_solve(case.solver_controls("p").solver, "p",
                      perf[0], perf[1], perf[2])
        info(f"Qdot max = {float(stats['qdot_max']):.6g}\n")
        local_err, glob_err = stats["cont"]
        cumulative_err += float(glob_err)
        log_continuity(cumulative_err, local_err, glob_err)
        timer.log()
        if write and case.time.write_time():
            case.write_fields([U, p, T, rho.replace(name="rho")]
                              + [y for y in Ys])
        n += 1
        if max_steps and n >= max_steps:
            break
    info("End\n")
    return case, U, p, T, rho, Ys, phi


def main(argv=None):
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("-case", default=".")
    a = ap.parse_args(argv)
    run(a.case)


if __name__ == "__main__":
    main()
