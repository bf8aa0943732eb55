"""multiphaseInterFoam — N incompressible immiscible phases (VOF).

Capability parity with the reference solver (reference:
applications/solvers/multiphase/multiphaseInterFoam/multiphaseMixture/
multiphaseMixture.C:solveAlphas + surfaceTensionForce): each phase
fraction is advected with MULES, with PAIRWISE interface compression
phir_ij = phic*nHatf(alpha_i, alpha_j) and pairwise surface tension
sigma_ij; the first N-1 phases advect conservatively and the continuous
phase closes the sum; the momentum mass flux uses the SAME limited
alpha fluxes (momentum-mass consistency). Mixture rho/mu feed one
shared momentum/pressure (p_rgh) system.

Known limitation: violent free-standing-interface collapses at large
density ratios destabilise faster than the reference's doubly-limited
pairwise compression — stable stratified/wall-bounded configurations
are validated; use interFoam for two-phase dam breaks.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from ..fields.field import Dimensioned, SurfaceField, VolField
from ..linalg import solve
from ..linalg.solvers import gsum
from ..ops import fvc, fvm
from ..ops.mules import explicit_solve
from ..utils.dictionary import Dictionary, parse_file
from ..utils.dimensions import DimensionSet, dim_density
from ..utils.logging import (ExecutionTimer, info, log_courant, log_solve)
from .case import Case
from .controls import PimpleControl
from .icofoam import courant_number

_DELTA_N = 1e-8


def _read_phases(tp: Dictionary):
    """phases ( name {rho ...; nu ...;} ... ) -> [(name, rho, nu)]."""
    entry = tp.lookup("phases", required=True)
    items = list(entry)
    phases = []
    i = 0
    while i < len(items):
        name = str(items[i])
        d = items[i + 1]
        rho = Dimensioned.from_entry(d.lookup("rho", required=True)).value
        nu = Dimensioned.from_entry(d.lookup("nu", required=True)).value
        phases.append((name, rho, nu))
        i += 2
    return phases


def _read_sigmas(tp: Dictionary, names):
    """sigmas ( (a b) sigma ... ) -> {(i, j): sigma}."""
    entry = tp.lookup("sigmas")
    out = {}
    if entry is None:
        return out
    items = list(entry)
    i = 0
    idx = {n: k for k, n in enumerate(names)}
    while i < len(items) - 1:
        pair = items[i]
        sig = Dimensioned.from_entry(items[i + 1]).value \
            if not isinstance(items[i + 1], (int, float)) \
            else float(items[i + 1])
        a, b = idx[str(pair[0])], idx[str(pair[1])]
        out[(min(a, b), max(a, b))] = float(sig)
        i += 2
    return out


def run(case_dir: str, write: bool = True, max_steps: int | None = None,
        dym: bool = False):
    """dym=True gives multiphaseInterDyMFoam (reference: multiphase/
    multiphaseInterFoam/multiphaseInterDyMFoam/): mesh.update() each
    step, MULES + PIMPLE on the relative flux."""
    case = Case(case_dir)
    mesh = case.mesh
    dyn = None
    if dym:
        from ..models.dynamicmesh import make_dynamic_mesh
        dyn = make_dynamic_mesh(case)
    tp = case.transport_properties()
    phases = _read_phases(tp)
    names = [p[0] for p in phases]
    rhos = jnp.asarray([p[1] for p in phases])
    nus = jnp.asarray([p[2] for p in phases])
    sigmas = _read_sigmas(tp, names)
    info(f"Phases: {names}; {len(sigmas)} sigma pairs\n")

    gpath = os.path.join(case.dir, "constant", "g")
    g = [float(x) for x in parse_file(gpath).lookup("value")] \
        if os.path.isfile(gpath) else [0.0, -9.81, 0.0]

    alphas = [case.read_field(f"alpha{n}"
                              if case.field_exists(f"alpha{n}")
                              else f"alpha.{n}") for n in names]
    U = case.read_field("U")
    p_rgh = case.read_field("p_rgh")
    phi = jax.jit(lambda u: fvc.flux(mesh, u))(U)

    ctrl = PimpleControl(case)
    solvers_d = case.fv_solution.subdict("solvers")
    a_entry = solvers_d.lookup("alpha") or Dictionary()
    c_alpha = float(a_entry.scalar("cAlpha", 1.0)) \
        if isinstance(a_entry, Dictionary) else 1.0
    p_controls = case.solver_controls("p_rgh")
    p_final = case.solver_controls("p_rgh", final=True)
    lap_corr = case.laplacian_scheme()
    n_corr = ctrl.n_correctors
    n_non_orth = ctrl.n_non_orth
    p_ref_cell, p_ref_value = ctrl.p_ref_cell, ctrl.p_ref_value

    def nhatf(mesh, a, b):
        """Interface normal flux between phases a,b (multiphaseMixture::
        nHatfv): (b grad a - a grad b) normalized, dotted with Sf."""
        ga = fvc.face_values(mesh, fvc.grad(mesh, a))
        gb = fvc.face_values(mesh, fvc.grad(mesh, b))
        a_f = fvc.face_values(mesh, a)
        b_f = fvc.face_values(mesh, b)
        v = b_f[:, None] * ga - a_f[:, None] * gb
        mag = jnp.linalg.norm(v, axis=-1) + _DELTA_N
        return (v / mag[:, None] * mesh.Sf).sum(-1), v / mag[:, None]

    @jax.jit
    def _step(mesh, alphas, U: VolField, p_rgh: VolField,
              phi: SurfaceField, dt, mesh_phi, mesh_ub):
        ghf = (mesh.Cf * jnp.asarray(g, mesh.C.dtype)).sum(-1)
        U = U.store_old()
        alphas = [a.store_old() for a in alphas]

        # ---- solveAlphas: MULES per phase with pairwise compression
        phic = jnp.minimum(
            c_alpha * jnp.abs(phi.data)
            / jnp.maximum(mesh.mag_sf, 1e-30),
            (jnp.abs(phi.data) / jnp.maximum(mesh.mag_sf, 1e-30)).max())
        # advect the first N-1 phases with MULES; the last (continuous)
        # phase closes the sum, so the explicitly-advected phases stay
        # exactly conservative (the reference renormalises all N, with
        # the same closure role falling to the dominant phase)
        new_alphas = []
        limited_fluxes = []
        for i, a in enumerate(alphas[:-1]):
            a_f = fvc.face_values(mesh, a, "vanLeer", phi)
            flux_a = phi.data * a_f
            for j, b in enumerate(alphas):
                if j == i:
                    continue
                nhf, _ = nhatf(mesh, a, b)
                phir = (phic * nhf).at[mesh.n_internal:].set(0.0)
                a_lin = fvc.face_values(mesh, a)
                b_lin = fvc.face_values(mesh, b)
                flux_a = flux_a + phir * a_lin * b_lin
            a_new, lim = explicit_solve(
                mesh, a, phi, SurfaceField(flux_a, phi.dims, "phiAlpha"),
                dt)
            a_new = a_new.replace(
                data=jnp.clip(a_new.data, 0.0, 1.0),
                bvalues=jnp.clip(a_new.bvalues, 0.0, 1.0))
            new_alphas.append(a_new)
            limited_fluxes.append(lim.data)
        rest_d = jnp.clip(1.0 - sum(a.data for a in new_alphas),
                          0.0, 1.0)
        rest_b = jnp.clip(1.0 - sum(a.bvalues for a in new_alphas),
                          0.0, 1.0)
        last = alphas[-1].replace(data=rest_d, bvalues=rest_b)
        alphas = new_alphas + [last]

        # mixture properties
        rho_d = sum(a.data * rhos[i] for i, a in enumerate(alphas))
        rho_b = sum(a.bvalues * rhos[i] for i, a in enumerate(alphas))
        mu_d = sum(a.data * rhos[i] * nus[i]
                   for i, a in enumerate(alphas))
        mu_b = sum(a.bvalues * rhos[i] * nus[i]
                   for i, a in enumerate(alphas))
        rho = alphas[0].with_calculated_bcs(rho_d, rho_b, dim_density,
                                            "rho")
        rho_old_d = sum(a.old.data * rhos[i]
                        for i, a in enumerate(alphas))
        rho = rho.replace(old=alphas[0].with_calculated_bcs(
            rho_old_d, rho_b, dim_density, "rho").replace(old=None))
        # momentum mass flux CONSISTENT with the limited alpha fluxes
        # (the closure phase carries the remainder): rhoPhi =
        # sum_i lim_i (rho_i - rho_N) + phi rho_N
        rho_n = rhos[len(alphas) - 1]
        rho_phi_d = phi.data * rho_n
        for i, lim in enumerate(limited_fluxes):
            rho_phi_d = rho_phi_d + lim * (rhos[i] - rho_n)
        rho_phi = SurfaceField(rho_phi_d, phi.dims * dim_density,
                               "rhoPhi")
        mu = alphas[0].with_calculated_bcs(
            mu_d, mu_b, DimensionSet.of(1, -1, -1), "mu")

        # pairwise surface tension face force
        stf = jnp.zeros(mesh.n_faces, phi.data.dtype)
        for (i, j), sig in sigmas.items():
            a, b = alphas[i], alphas[j]
            _, nhatv = nhatf(mesh, a, b)
            kappa = -fvc.surface_sum_faces(
                mesh, (nhatv * mesh.Sf).sum(-1)) / mesh.V
            w = mesh.weights
            own = mesh.owner[:mesh.n_internal]
            k_int = w * jnp.take(kappa, own) \
                + (1 - w) * jnp.take(kappa, mesh.neighbour)
            k_b = jnp.take(kappa, mesh.owner[mesh.n_internal:])
            kf = jnp.concatenate([k_int, k_b])
            b_f = fvc.face_values(mesh, b)
            a_f = fvc.face_values(mesh, a)
            stf = stf + sig * kf * (
                b_f * fvc.sn_grad(mesh, a).data
                - a_f * fvc.sn_grad(mesh, b).data)

        # ---- UEqn.H
        mu_f = Dimensioned("muf", DimensionSet.of(1, -1, -1),
                           fvc.face_values(mesh, mu))
        UEqn = (fvm.ddt(mesh, U, dt, "Euler", coeff=rho)
                + fvm.div(mesh, rho_phi, U, "linearUpwind")
                - fvm.laplacian(mesh, mu_f, U, lap_corr))

        p_perf_all = []
        for corr in range(n_corr):
            UEqn_c = UEqn.replace(psi=U) if corr else UEqn
            rAU = 1.0 / UEqn_c.A(mesh)
            rAU_f = fvc.face_values(mesh, rAU)
            HbyA = fvc.constrain_hbya(mesh, rAU * UEqn_c.H(mesh), U)
            phi_hbya = fvc.flux(mesh, HbyA)
            if dym:
                # fvc::makeRelative(phiHbyA, U)
                phi_hbya = SurfaceField(phi_hbya.data - mesh_phi,
                                        phi_hbya.dims, "phiHbyA")
            sng_rho = fvc.sn_grad(mesh, rho)
            phig = ((stf - ghf * sng_rho.data) * rAU_f * mesh.mag_sf) \
                .at[mesh.n_internal:].set(0.0)
            phi_hbya = SurfaceField(phi_hbya.data + phig, phi.dims,
                                    "phiHbyA")
            for north in range(n_non_orth + 1):
                final = corr == n_corr - 1 and north == n_non_orth
                pEqn = fvm.laplacian(mesh, rAU, p_rgh, lap_corr) \
                    == fvc.div(mesh, phi_hbya)
                pEqn = pEqn.set_reference(p_ref_cell, p_ref_value)
                p_rgh, p_perf = solve(mesh, pEqn,
                                      p_final if final else p_controls)
                p_perf_all.append(p_perf[0])
            phi = phi_hbya - pEqn.replace(psi=p_rgh).flux(mesh)
            flux_p = pEqn.replace(psi=p_rgh).flux(mesh)
            corr_f = SurfaceField(
                (phig - flux_p.data) / jnp.maximum(rAU_f, 1e-30),
                phi.dims / rAU.dims, "corrF")
            U_star = HbyA + rAU * fvc.reconstruct(mesh, corr_f)
            env_u = ({"meshUb": mesh_ub,
                      "meshPhiB": mesh_phi[mesh.n_internal:],
                      "phi": phi} if dym else None)
            U = U.replace(data=U_star.data) \
                .correct_boundary_conditions(mesh, env=env_u)

        co = courant_number(mesh, phi, dt)
        fracs = tuple(gsum(a.data * mesh.V) for a in alphas)
        stats = dict(p_perf=tuple(p_perf_all), co=co, fracs=fracs)
        return alphas, U, p_rgh, phi, stats

    from ..linalg.precompute import attach_solver_layouts
    mesh0 = jax.device_put(attach_solver_layouts(
        mesh, (p_controls, p_final), case=case))

    def step(mesh_new, alphas, U, p_rgh, phi, dt, mesh_phi, mesh_ub):
        import dataclasses as _dc
        m2 = _dc.replace(mesh_new, band=mesh0.band, gamg=mesh0.gamg)
        return _step(m2, alphas, U, p_rgh, phi, dt, mesh_phi, mesh_ub)

    timer = ExecutionTimer()
    info("\nStarting time loop\n")
    n = 0
    co_max_prev = 0.0
    zf = jnp.zeros(mesh.n_faces, mesh.V.dtype)
    zb = jnp.zeros((mesh.n_boundary, 3), mesh.C.dtype)
    while case.time.run():
        if case.time.adjust_time_step and co_max_prev > 0:
            f = min(min(case.time.max_co / (co_max_prev + 1e-30), 1.0
                        + 0.1 * case.time.max_co / (co_max_prev + 1e-30)),
                    1.2)
            case.time.set_delta_t(f * case.time.delta_t)
        case.time.increment()
        info(f"Time = {case.time.name}\n")
        if dyn is not None:
            mesh, mesh_phi, mesh_ub = dyn.update(case.time.value)
            case.mesh = mesh
            phi = SurfaceField(phi.data - mesh_phi, phi.dims, "phi")
        else:
            mesh_phi, mesh_ub = zf, zb
        alphas, U, p_rgh, phi, stats = step(mesh, alphas, U, p_rgh, phi,
                                            case.time.delta_t, mesh_phi,
                                            mesh_ub)
        if dyn is not None:
            phi = SurfaceField(phi.data + mesh_phi, phi.dims, "phi")
        co_max_prev = float(stats["co"][1])
        log_courant(*stats["co"])
        vtot = float(mesh.V.sum())
        fr = "  ".join(f"{n0}={float(f0) / vtot:.6g}"
                       for n0, f0 in zip(names, stats["fracs"]))
        info(f"Phase fractions: {fr}")
        for perf in stats["p_perf"]:
            log_solve(p_controls.solver, "p_rgh", perf[0], perf[1],
                      perf[2])
        timer.log()
        if write and case.time.write_time():
            case.write_fields(
                [a.replace(name=f"alpha{n0}")
                 for a, n0 in zip(alphas, names)] + [U, p_rgh])
        n += 1
        if max_steps and n >= max_steps:
            break
    info("End\n")
    return case, alphas, U, p_rgh, phi
