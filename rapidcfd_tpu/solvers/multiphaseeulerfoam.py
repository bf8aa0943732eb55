"""multiphaseEulerFoam — N incompressible Eulerian phases, each with
its own velocity field, coupled by pairwise drag and a shared pressure.

Capability parity with the reference solver (reference:
applications/solvers/multiphase/multiphaseEulerFoam/
multiphaseEulerFoam.C with multiphaseSystem/multiphaseSystem.C:62-200
(solveAlphas: per-phase MULES with pairwise compression), UEqns.H
(volume-based per-phase momentum: ddt(alpha,U) + div(alphaPhi,U) +
virtual-mass term - laplacian(alpha nuEff, U)), pEqn.H (drag folded
into 1/(A + K/rho) with partial elimination via the partner-phase
flux; incompressible shared-p Poisson with per-phase flux
reconstruction)).

Phase properties and pair closures from constant/transportProperties:
`phases (name {nu ...; rho ...; diameterModel constant;
constantCoeffs {d ...;}} ...)`, `sigmas ((a b) v ...)`,
`virtualMass ((a b) Cvm ...)`, `drag ((a b) {type ...;} ...)` with the
FIRST phase of each pair dispersed in the second.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from ..fields.field import Dimensioned, SurfaceField, VolField
from ..linalg import solve
from ..linalg.solvers import gsum
from ..models.eulerian import drag_k
from ..ops import fvc, fvm
from ..ops.mules import explicit_solve
from ..utils.dictionary import Dictionary, parse_file
from ..utils.dimensions import DimensionSet, dim_viscosity
from ..utils.logging import (ExecutionTimer, info, log_courant, log_solve)
from .case import Case
from .controls import PimpleControl
from .icofoam import courant_number
from .multiphaseinterfoam import _read_sigmas

_DELTA_N = 1e-8


def _read_setup(case: Case):
    tp = case.transport_properties()
    items = list(tp.lookup("phases", required=True))
    names, rhos, nus, diams = [], [], [], []
    i = 0
    while i < len(items):
        name = str(items[i])
        d = items[i + 1]
        names.append(name)
        rhos.append(Dimensioned.from_entry(
            d.lookup("rho", required=True)).value)
        nus.append(Dimensioned.from_entry(
            d.lookup("nu", required=True)).value)
        cc = d.subdict("constantCoeffs", required=False)
        diam = Dimensioned.from_entry(
            cc.lookup("d", required=True)).value if cc else 1e-3
        diams.append(float(diam))
        i += 2
    idx = {n: k for k, n in enumerate(names)}
    sigmas = _read_sigmas(tp, names)

    def pair_table(key, scalar=True):
        entry = tp.lookup(key, required=False)
        out = {}
        if entry is None:
            return out
        lst = list(entry)
        i = 0
        while i < len(lst) - 1:
            pair = lst[i]
            a, b = idx[str(pair[0])], idx[str(pair[1])]
            v = lst[i + 1]
            out[(a, b)] = float(v) if scalar else v
            i += 2
        return out

    cvms = pair_table("virtualMass", scalar=True)
    drags = {}
    for (a, b), dct in pair_table("drag", scalar=False).items():
        t = str(dct.lookup("type", required=True)) \
            if isinstance(dct, Dictionary) else str(dct)
        drags[(a, b)] = (t, dct if isinstance(dct, Dictionary) else None)
    gpath = os.path.join(case.dir, "constant", "g")
    g = [float(x) for x in parse_file(gpath).lookup("value")] \
        if os.path.isfile(gpath) else [0.0, -9.81, 0.0]
    return names, rhos, nus, diams, sigmas, cvms, drags, g


def make_step(case: Case, setup, ctrl: PimpleControl):
    mesh = case.mesh
    names, rhos, nus, diams, sigmas, cvms, drags, g = setup
    n_ph = len(names)
    solvers_d = case.fv_solution.subdict("solvers")
    a_d = solvers_d.lookup("alpha") or solvers_d.lookup(
        f"alpha.{names[0]}")
    c_alpha = float(a_d.scalar("cAlpha", 1.0)) \
        if isinstance(a_d, Dictionary) else 1.0
    lap_corr = case.laplacian_scheme()
    p_controls = case.solver_controls("p")
    p_final = case.solver_controls("p", final=True)
    n_outer = ctrl.n_outer
    n_corr = ctrl.n_correctors
    n_non_orth = ctrl.n_non_orth
    p_ref_cell, p_ref_value = ctrl.p_ref_cell, ctrl.p_ref_value
    g_sf = (mesh.Sf * jnp.asarray(g, mesh.C.dtype)).sum(-1)
    _DN = DimensionSet

    def calc(like, data, bdata, dims, name):
        return like.with_calculated_bcs(data, bdata, dims, name)

    def nhatf(a, b):
        ga = fvc.face_values(mesh, fvc.grad(mesh, a))
        gb = fvc.face_values(mesh, fvc.grad(mesh, b))
        a_f = fvc.face_values(mesh, a)
        b_f = fvc.face_values(mesh, b)
        v = b_f[:, None] * ga - a_f[:, None] * gb
        mag = jnp.linalg.norm(v, axis=-1) + _DELTA_N
        return (v / mag[:, None] * mesh.Sf).sum(-1), v / mag[:, None]

    def surface_tension(alphas, i):
        """fluid.surfaceTension(phase) — pairwise CSF on phase i."""
        stf = jnp.zeros(mesh.n_faces, mesh.V.dtype)
        for (a_i, b_i), sig in sigmas.items():
            if i not in (a_i, b_i):
                continue
            a, b = alphas[a_i], alphas[b_i]
            _, nhatv = nhatf(a, b)
            kappa = -fvc.surface_sum_faces(
                mesh, (nhatv * mesh.Sf).sum(-1)) / mesh.V
            w = mesh.weights
            own = mesh.owner[:mesh.n_internal]
            k_int = w * jnp.take(kappa, own) \
                + (1 - w) * jnp.take(kappa, mesh.neighbour)
            k_b = jnp.take(kappa, mesh.owner[mesh.n_internal:])
            kf = jnp.concatenate([k_int, k_b])
            stf = stf + sig * kf * fvc.sn_grad(
                mesh, a if i == a_i else b).data
        return stf

    def drag_pairs(alphas, Us):
        """[(i, j, K)] momentum-exchange coefficients per drag pair
        (i dispersed in j)."""
        out = []
        for (i, j), (t, dct) in drags.items():
            ur = jnp.linalg.norm(Us[i].data - Us[j].data, axis=-1) \
                + 1e-12
            k = drag_k(t, dct, jnp.maximum(alphas[i].data, 1e-6),
                       rhos[j], rhos[j] * nus[j], diams[i], ur)
            out.append((i, j, k))
        return out

    @jax.jit
    def step(alphas, Us, p: VolField, phis, dt):
        alphas = [a.store_old() for a in alphas]
        Us = [U.store_old() for U in Us]
        phis_old = [ph.data for ph in phis]
        a0 = alphas[0]

        a_fs0 = [fvc.face_values(mesh, a) for a in alphas]
        phi = SurfaceField(
            sum(af * ph.data for af, ph in zip(a_fs0, phis)),
            phis[0].dims, "phi")

        p_perf_all = []
        for outer in range(n_outer):
            # ---- solveAlphas (multiphaseSystem.C:62-200)
            phic = jnp.minimum(
                c_alpha * jnp.abs(phi.data)
                / jnp.maximum(mesh.mag_sf, 1e-30),
                (jnp.abs(phi.data)
                 / jnp.maximum(mesh.mag_sf, 1e-30)).max())
            new_alphas, alpha_phis = [], []
            for i, a in enumerate(alphas):
                a_f = fvc.face_values(mesh, a, "vanLeer", phi)
                flux_a = phi.data * a_f
                for j in range(n_ph):
                    if j == i:
                        continue
                    nhf, _ = nhatf(a, alphas[j])
                    phir = (phic * nhf).at[mesh.n_internal:].set(0.0)
                    a_lin = fvc.face_values(mesh, a)
                    b_lin = fvc.face_values(mesh, alphas[j])
                    flux_a = flux_a + phir * a_lin * b_lin
                a_new, lim = explicit_solve(
                    mesh, a, phi,
                    SurfaceField(flux_a, phi.dims, "phiAlpha"), dt)
                new_alphas.append(a_new)
                alpha_phis.append(lim)
            asum = sum(a.data for a in new_alphas)
            asum_b = sum(a.bvalues for a in new_alphas)
            alphas = [a.replace(
                data=jnp.clip(a.data / jnp.maximum(asum, 1e-6),
                              0.0, 1.0),
                bvalues=jnp.clip(
                    a.bvalues / jnp.maximum(asum_b, 1e-6), 0.0, 1.0))
                for a in new_alphas]

            # ---- UEqns.H (volume-based, laminar)
            dps = drag_pairs(alphas, Us)
            UEqns = []
            for i, (a, U) in enumerate(zip(alphas, Us)):
                cvm = sum(c for (x, y), c in cvms.items()
                          if i in (x, y))
                anueff = calc(
                    a, jnp.maximum(a.data, 1e-4) * nus[i],
                    jnp.maximum(a.bvalues, 1e-4) * nus[i],
                    dim_viscosity, "alphaNu")
                anueff_f = Dimensioned(
                    "anuf", dim_viscosity,
                    fvc.face_values(mesh, anueff))
                m = (fvm.ddt(mesh, U, dt, coeff=a)
                     + fvm.div(mesh, alpha_phis[i], U, "upwind")
                     - fvm.laplacian(mesh, anueff_f, U, lap_corr))
                if cvm > 0.0:
                    # (alpha/rho)*Cvm*rho_c ~ volume-based virtual mass;
                    # partner density via the drag pair's continuous
                    # phase (default: own rho)
                    rho_c = rhos[i]
                    for (x, y), _ in cvms.items():
                        if x == i:
                            rho_c = rhos[y]
                    coeff = a.data * cvm * rho_c / rhos[i]
                    vm_m = (fvm.ddt(mesh, U, dt)
                            + fvm.div(mesh, phis[i], U, "upwind")
                            - fvm.Sp(mesh, Dimensioned(
                                "divphi", phis[i].dims / _DN.of(0, 3),
                                fvc.div(mesh, phis[i]).data), U))
                    from .twophaseeulerfoam import _row_scale
                    m = m + _row_scale(mesh, vm_m, coeff, dims=m.dims)
                UEqns.append(m)

            # ---- pEqn.H
            for corr in range(n_corr):
                a_fs = [fvc.face_values(
                    mesh, a.replace(data=jnp.maximum(a.data, 0.0),
                                    bvalues=jnp.maximum(a.bvalues, 0.0),
                                    old=None)) for a in alphas]
                rAUs, rAfs, hbyas, phi_hbyas = [], [], [], []
                for i, (a, U) in enumerate(zip(alphas, Us)):
                    UE = UEqns[i].replace(psi=U)
                    drag_i = sum(
                        k / rhos[i] for (x, y, k) in dps
                        if i in (x, y))
                    if isinstance(drag_i, int):
                        drag_i = jnp.zeros_like(a.data)
                    A = UE.A(mesh)
                    a_drag = calc(a, A.data + drag_i,
                                  A.bvalues, A.dims, "Adrag")
                    rAU = 1.0 / a_drag
                    rAf = a_fs[i] / fvc.face_values(mesh, a_drag)
                    hbya = fvc.constrain_hbya(mesh, rAU * UE.H(mesh), U)
                    uf_old = fvc.flux(mesh, U.old).data
                    dphi = phis_old[i] - uf_old
                    cddt = 1.0 - jnp.minimum(
                        jnp.abs(dphi) / (jnp.abs(phis_old[i]) + 1e-30),
                        1.0)
                    stf = surface_tension(alphas, i)
                    ph = fvc.flux(mesh, hbya).data \
                        + rAf * cddt * dphi / dt
                    bodyf = (rAf * (stf * mesh.mag_sf / rhos[i]
                                    + g_sf)) \
                        .at[mesh.n_internal:].set(0.0)
                    ph = ph + bodyf
                    # drag partial elimination: partner flux coupling
                    for (x, y, k) in dps:
                        if i not in (x, y):
                            continue
                        jdx = y if i == x else x
                        kf = fvc.face_values(mesh, calc(
                            a, k / rhos[i],
                            jnp.zeros_like(a.bvalues),
                            _DN.of(0, 0, -1), "Krho"))
                        adf = fvc.face_values(mesh, a_drag)
                        ph = ph + kf / adf * phis[jdx].data
                        hbya = hbya + rAU * calc(
                            a, k / rhos[i],
                            jnp.zeros_like(a.bvalues),
                            _DN.of(0, 0, -1), "Krho") * Us[jdx]
                    rAUs.append(rAU)
                    rAfs.append(rAf)
                    hbyas.append(hbya)
                    phi_hbyas.append(ph)
                phi_hbya = SurfaceField(
                    sum(af * ph for af, ph in zip(a_fs, phi_hbyas)),
                    phi.dims, "phiHbyA")
                rauf_face = sum(jnp.abs(a_fs[i] * rAfs[i]) / rhos[i]
                                for i in range(n_ph))
                rauf = SurfaceField(
                    rauf_face, rAUs[0].dims / _DN.of(1, -3), "rAUf")

                for north in range(n_non_orth + 1):
                    final = corr == n_corr - 1 and north == n_non_orth
                    pEqn = fvm.laplacian(mesh, rauf, p, lap_corr) \
                        == fvc.div(mesh, phi_hbya)
                    pEqn = pEqn.set_reference(p_ref_cell, p_ref_value)
                    p, p_perf = solve(
                        mesh, pEqn, p_final if final else p_controls)
                    p_perf_all.append(p_perf[0])
                flux_p = pEqn.replace(psi=p).flux(mesh)
                msf_gradp = -flux_p.data / jnp.maximum(rauf_face, 1e-30)
                new_phis, new_us = [], []
                for i in range(n_ph):
                    new_phis.append(SurfaceField(
                        phi_hbyas[i] + rAfs[i] * msf_gradp / rhos[i],
                        phi.dims, f"phi.{names[i]}"))
                    corr_i = SurfaceField(
                        rAfs[i] * (g_sf + msf_gradp / rhos[i])
                        + rAfs[i] * surface_tension(alphas, i)
                        * mesh.mag_sf / rhos[i],
                        phi.dims, "ci")
                    u_i = hbyas[i] + fvc.reconstruct(mesh, corr_i)
                    new_us.append(
                        Us[i].replace(data=u_i.data)
                        .correct_boundary_conditions(mesh))
                phis = new_phis
                Us = new_us
                phi = SurfaceField(
                    sum(a_fs[i] * phis[i].data for i in range(n_ph)),
                    phi.dims, "phi")

        co_mean, co_max = courant_number(mesh, phi, dt)
        stats = dict(
            p_perf=tuple(p_perf_all), co=(co_mean, co_max),
            fracs=tuple(gsum(a.data * mesh.V) for a in alphas),
            minmax=tuple((a.data.min(), a.data.max()) for a in alphas))
        return alphas, Us, p, phis, stats

    return step


def run(case_dir: str, write: bool = True, max_steps: int | None = None):
    case = Case(case_dir)
    mesh = case.mesh
    setup = _read_setup(case)
    names = setup[0]
    info(f"Eulerian phases: {names}; drag pairs: "
         f"{[(names[i], names[j]) for (i, j) in setup[6]]}\n")

    alphas = [case.read_field(f"alpha.{n}"
                              if case.field_exists(f"alpha.{n}")
                              else f"alpha{n}") for n in names]
    Us = [case.read_field(f"U.{n}" if case.field_exists(f"U.{n}")
                          else f"U{n}") for n in names]
    p = case.read_field("p")
    phis = [fvc.flux(mesh, U) for U in Us]
    ctrl = PimpleControl(case)
    step = make_step(case, setup, ctrl)
    timer = ExecutionTimer()

    info("\nStarting time loop\n")
    n = 0
    while case.time.run():
        case.time.increment()
        info(f"Time = {case.time.name}\n")
        alphas, Us, p, phis, stats = step(alphas, Us, p, phis,
                                          case.time.delta_t)
        log_courant(*stats["co"])
        vtot = float(mesh.V.sum())
        for nm, fr, mm in zip(names, stats["fracs"], stats["minmax"]):
            info(f"{nm} fraction = {float(fr) / vtot:.8g}  "
                 f"Min = {float(mm[0]):.6g}  Max = {float(mm[1]):.6g}")
        for perf in stats["p_perf"]:
            log_solve(case.solver_controls('p').solver, "p",
                      perf[0], perf[1], perf[2])
        timer.log()
        if write and case.time.write_time():
            case.write_fields(
                [a.replace(name=f"alpha.{nm}")
                 for a, nm in zip(alphas, names)]
                + [U.replace(name=f"U.{nm}")
                   for U, nm in zip(Us, names)] + [p])
        n += 1
        if max_steps and n >= max_steps:
            break
    info("End\n")
    return case, alphas, Us, p, phis


def main(argv=None):
    import argparse
    ap = argparse.ArgumentParser(
        description="multiphaseEulerFoam (rapidcfd_tpu)")
    ap.add_argument("-case", dest="case", default=".")
    ap.add_argument("-noWrite", action="store_true")
    args = ap.parse_args(argv)
    run(args.case, write=not args.noWrite)


if __name__ == "__main__":
    main()
