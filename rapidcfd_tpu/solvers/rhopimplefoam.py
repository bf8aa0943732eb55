"""rhoPimpleFoam — transient compressible PIMPLE solver (subsonic form).

Capability parity with the reference solver (reference:
applications/solvers/compressible/rhoPimpleFoam/rhoPimpleFoam.C with
UEqn.H/EEqn.H/pEqn.H, non-transonic branch): mass-flux momentum, sensible
enthalpy energy with dpdt and kinetic-energy terms, psi-based pressure
with ddt(psi,p). Transonic cases are covered by sonicFoam's phid form.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..fields.field import Dimensioned, SurfaceField, VolField
from ..linalg import solve
from ..linalg.solvers import gsum
from ..models.thermo import PsiThermo, read_thermo
from ..ops import fvc, fvm
from ..utils.dimensions import DimensionSet, dim_density
from ..utils.logging import (ExecutionTimer, info, log_continuity,
                             log_courant, log_solve)
from .case import Case
from .controls import PimpleControl
from .icofoam import courant_number


def make_step(case: Case, thermo: PsiThermo, ctrl: PimpleControl,
              lts: bool = False, turb=None, consistent: bool = False,
              dym: bool = False, p_offset: float = 0.0):
    """lts=True (rhoLTSPimpleFoam): the step takes a per-cell rDeltaT
    instead of a scalar dt; every ddt/division below is elementwise in
    the resulting dt (reference: rhoLTSPimpleFoam.C + localEuler).

    consistent=True runs the PIMPLEC corrector (rhoPimplecFoam,
    reference: applications/solvers/compressible/rhoPimpleFoam/
    rhoPimplecFoam/pEqn.H subsonic branch): rAtU = 1/(1/rAU - H1),
    phiHbyA += interp(rho*(rAtU-rAU))*snGrad(p)*magSf,
    HbyA -= (rAU-rAtU)*grad(p), laplacian(rho*rAtU, p).

    dym=True gives rhoPimpleDyMFoam (reference: compressible/
    rhoPimpleFoam/rhoPimpleDyMFoam/rhoPimpleDyMFoam.C): the step takes
    the UPDATED mesh as a jit argument plus (mesh_phi, mesh_ub); the
    caller passes the RELATIVE mass flux (phi - interp(rho)*meshPhi,
    the reference's fvc::makeRelative(fvc::interpolate(rho), phi)) and
    gets the relative flux back (caller restores absolute)."""
    mesh = case.mesh
    m = thermo.model
    div_u = case.div_scheme("div(phi,U)")
    try:
        div_h = case.div_scheme("div(phi,h)")
    except KeyError:
        div_h = div_u
    try:
        div_k = case.div_scheme("div(phi,K)")
    except KeyError:
        div_k = div_h
    lap_corr = case.laplacian_scheme()
    ddt_scheme = case.ddt_scheme()
    u_controls = case.solver_controls("U")
    u_final = case.solver_controls("U", final=True)
    p_controls = case.solver_controls("p")
    p_final = case.solver_controls("p", final=True)
    h_controls = case.solver_controls("h")
    n_outer = ctrl.n_outer
    n_corr = ctrl.n_correctors
    n_non_orth = ctrl.n_non_orth
    p_min = float(ctrl.dict.scalar("pMin", 0.0))
    t_min = float(ctrl.dict.scalar("TMin", 0.0))

    has_turb = turb is not None and not turb.laminar

    @jax.jit
    def _step(mesh, U: VolField, p: VolField, T: VolField,
              rho: VolField, phi: SurfaceField, turb_state, dt,
              mesh_phi, mesh_ub):
        if dym:
            # movingWallVelocity + boundary relative mass flux rebuilt
            # from the corrected wall velocity (same pattern as
            # interfoam.make_step dym branch)
            from ..fields.bcs import MovingWallVelocity
            env_w = {"meshUb": mesh_ub,
                     "meshPhiB": mesh_phi[mesh.n_internal:]}
            bcdata = list(U.bcdata)
            for i, bc in enumerate(U.bcs):
                if isinstance(bc, MovingWallVelocity):
                    patch = mesh.patches[i]
                    sl = slice(patch.bstart, patch.bstart + patch.size)
                    nrm = mesh.patch_normals(patch)
                    v = mesh_ub[sl]
                    vn = (mesh_phi[mesh.n_internal:][sl] / jnp.maximum(
                        mesh.patch_mag_sf(patch), 1e-30))[:, None] * nrm
                    bd = dict(bcdata[i])
                    bd["meshWallValue"] = \
                        v - nrm * (v * nrm).sum(-1, keepdims=True) + vn
                    bcdata[i] = bd
            U = U.replace(bcdata=tuple(bcdata))
            U = U.correct_boundary_conditions(mesh, env={**env_w,
                                                         "phi": phi})
            phi_b = rho.bvalues * (
                (U.bvalues * mesh.Sf[mesh.n_internal:]).sum(-1)
                - mesh_phi[mesh.n_internal:])
            phi = SurfaceField(jnp.concatenate(
                [phi.data[:mesh.n_internal], phi_b]), phi.dims, "phi")
        if lts:
            dt = 1.0 / dt      # caller passes rDeltaT (nCells,)
        U = U.store_old()
        p = p.store_old()
        T = T.store_old()
        rho = rho.store_old()

        # ---- rhoEqn.H
        rho = rho.replace(
            data=rho.old.data - dt * fvc.div(mesh, phi).data) \
            .correct_boundary_conditions(mesh)

        u_perf = h_perf = None
        p_perf_all = []
        for outer in range(n_outer):
            final_outer = outer == n_outer - 1

            # ---- UEqn.H (muEff = mu + rho*nut when turbulent)
            mu_face = m.mu(fvc.face_values(mesh, T))
            mut_f = turb.mut_faces(mesh, turb_state,
                                   fvc.face_values(mesh, rho)) \
                if has_turb else None
            mu_f = Dimensioned(
                "muEff", DimensionSet.of(1, -1, -1),
                mu_face + mut_f if mut_f is not None else mu_face)
            UEqn = (fvm.ddt(mesh, U, dt, ddt_scheme, coeff=rho)
                    + fvm.div(mesh, phi, U, div_u)
                    - fvm.laplacian(mesh, mu_f, U, lap_corr))
            U, u_perf = solve(mesh, UEqn == (-fvc.grad(mesh, p)),
                              u_final if final_outer else u_controls)

            # ---- EEqn.H: sensible enthalpy with K and dpdt
            h = thermo.he_field(mesh, T, "h").replace(old=None)
            h = h.replace(old=thermo.he_field(mesh, T.old, "h")
                          .replace(old=None))
            alpha_face = m.alpha_h(fvc.face_values(mesh, T))
            if mut_f is not None:
                alpha_face = alpha_face + mut_f / turb.prt
            alpha_f = Dimensioned("alphaEff", DimensionSet.of(1, -1, -1),
                                  alpha_face)
            K = h.with_calculated_bcs(
                0.5 * (U.data * U.data).sum(-1),
                0.5 * (U.bvalues * U.bvalues).sum(-1), h.dims, "K")
            K_old = 0.5 * (U.old.data * U.old.data).sum(-1)
            ddt_rhoK = (rho.data * K.data - rho.old.data * K_old) / dt
            dpdt = (p.data - p.old.data) / dt
            rhs = h.with_calculated_bcs(
                dpdt - ddt_rhoK - fvc.div(mesh, phi, K, div_k).data,
                jnp.zeros_like(h.bvalues),
                h.dims * dim_density / DimensionSet.of(0, 0, 1))
            hEqn = (fvm.ddt(mesh, h, dt, ddt_scheme, coeff=rho)
                    + fvm.div(mesh, phi, h, div_h)
                    - fvm.laplacian(mesh, alpha_f, h, lap_corr))
            h, h_perf = solve(mesh, hEqn.equals(rhs), h_controls)
            T = thermo.update_t(mesh, T, h)
            if t_min > 0:
                T = T.replace(data=jnp.maximum(T.data, t_min),
                              bvalues=jnp.maximum(T.bvalues, t_min))

            psi = T.with_calculated_bcs(
                m.psi(T.data), m.psi(T.bvalues),
                DimensionSet.of(0, -2, 2), "psi")
            psi = psi.replace(old=T.old.with_calculated_bcs(
                m.psi(T.old.data), m.psi(T.old.bvalues),
                DimensionSet.of(0, -2, 2), "psi").replace(old=None))

            # ---- pEqn.H (subsonic)
            for corr in range(n_corr):
                rho = rho.replace(
                    data=m.rho(p.data + p_offset, T.data),
                    bvalues=m.rho(p.bvalues + p_offset, T.bvalues))
                UEqn_c = UEqn.replace(psi=U)
                rAU = 1.0 / UEqn_c.A(mesh)
                rAtU = (1.0 / (1.0 / rAU - UEqn_c.H1(mesh))
                        if consistent else rAU)
                HbyA = fvc.constrain_hbya(mesh, rAU * UEqn_c.H(mesh), U)
                rho_f = fvc.face_values(mesh, rho)
                phi_hbya = SurfaceField(
                    rho_f * fvc.flux(mesh, HbyA).data,
                    DimensionSet.of(1, 0, -1), "phiHbyA")
                if dym:
                    # fvc::makeRelative(interp(rho), phiHbyA)
                    phi_hbya = SurfaceField(
                        phi_hbya.data - rho_f * mesh_phi,
                        phi_hbya.dims, "phiHbyA")
                if consistent:
                    drho_rau_f = fvc.face_values(mesh,
                                                 rho * (rAtU - rAU))
                    phi_hbya = SurfaceField(
                        phi_hbya.data + drho_rau_f
                        * fvc.sn_grad(mesh, p).data * mesh.mag_sf,
                        phi_hbya.dims, "phiHbyA")
                    HbyA = HbyA - (rAU - rAtU) * fvc.grad(mesh, p)
                rho_rau = rho * rAtU
                for north in range(n_non_orth + 1):
                    final = (final_outer and corr == n_corr - 1
                             and north == n_non_orth)
                    pEqn = (fvm.ddt(mesh, p, dt, ddt_scheme, coeff=psi)
                            - fvm.laplacian(mesh, rho_rau, p, lap_corr))
                    pEqn = pEqn.equals(-fvc.div(mesh, phi_hbya))
                    if p_offset:
                        # DEVIATION form (fields.field.shift_level):
                        # ddt(psi*p_abs) = ddt(psi*p_dev)
                        # + p_offset*ddt(psi) — the second term is
                        # explicit (psi from the energy solve)
                        dpsi_dt = (psi.data - psi.old.data) / dt
                        pEqn = pEqn.replace(
                            source=pEqn.source
                            - mesh.V * p_offset * dpsi_dt)
                    p, p_perf = solve(mesh, pEqn,
                                      p_final if final else p_controls)
                    p_perf_all.append(p_perf[0])
                if p_min > 0:
                    p = p.replace(
                        data=jnp.maximum(p.data, p_min - p_offset),
                        bvalues=jnp.maximum(p.bvalues,
                                            p_min - p_offset))
                # -laplacian inside the matrix: ADD the matrix flux
                # (reference: rhoPimpleFoam pEqn.H:83)
                phi = phi_hbya + pEqn.replace(psi=p).flux(mesh)
                U_star = HbyA - rAtU * fvc.grad(mesh, p)
                env_u = ({"meshUb": mesh_ub,
                          "meshPhiB": mesh_phi[mesh.n_internal:],
                          "phi": phi} if dym else None)
                U = U.replace(data=U_star.data) \
                    .correct_boundary_conditions(mesh, env=env_u)
                rho = rho.replace(
                    data=m.rho(p.data + p_offset, T.data),
                    bvalues=m.rho(p.bvalues + p_offset, T.bvalues))

        if has_turb:
            nu_lam = T.with_calculated_bcs(
                m.mu(T.data) / rho.data, m.mu(T.bvalues) / rho.bvalues,
                DimensionSet.of(0, 2, -1), "nu")
            turb_state, turb_perf = turb.correct(
                mesh, turb_state, U, phi, rho, nu_lam, dt=dt)
        else:
            turb_perf = {}

        cont = (rho.data - rho.old.data) / dt + fvc.div(mesh, phi).data
        local_err = gsum(jnp.abs(cont) * mesh.V)
        glob_err = gsum(cont * mesh.V)
        co = courant_number(mesh, phi / fvc.interpolate(mesh, rho), dt)
        stats = dict(u_perf=u_perf, h_perf=h_perf,
                     p_perf=tuple(p_perf_all), turb=turb_perf,
                     cont=(local_err, glob_err), co=co)
        return U, p, T, rho, phi, turb_state, stats

    if dym:
        import dataclasses as _dc

        from ..linalg.precompute import attach_solver_layouts
        mesh0 = jax.device_put(attach_solver_layouts(
            mesh, (p_controls, p_final), case=case))

        def step(mesh_new, U, p, T, rho, phi_rel, turb_state, dt,
                 mesh_phi, mesh_ub):
            from ..ops.interpolation import set_current_dt
            set_current_dt(dt)
            # motion preserves topology: carry the precomputed solver
            # layouts across geometry updates
            m2 = _dc.replace(mesh_new, band=mesh0.band, gamg=mesh0.gamg)
            return _step(m2, U, p, T, rho, phi_rel, turb_state, dt,
                         mesh_phi, mesh_ub)
        return step

    from ..linalg.precompute import attach_solver_layouts
    mesh_a = jax.device_put(attach_solver_layouts(
        mesh, (p_controls, p_final), case=case))
    zf = jnp.zeros(mesh.n_faces, mesh.V.dtype)
    zb = jnp.zeros((mesh.n_boundary, 3), mesh.C.dtype)

    def step(U, p, T, rho, phi, turb_state, dt):
        from ..ops.interpolation import set_current_dt
        set_current_dt(dt)
        return _step(mesh_a, U, p, T, rho, phi, turb_state, dt, zf, zb)

    return step


def run(case_dir: str, write: bool = True, max_steps: int | None = None,
        lts: bool | None = None, consistent: bool = False):
    """lts=True runs as rhoLTSPimpleFoam; None auto-detects from
    `ddtSchemes { default localEuler; }` (the reference's convention).
    consistent=True runs as rhoPimplecFoam."""
    case = Case(case_dir)
    mesh = case.mesh
    if lts is None:
        lts = case.ddt_scheme() in ("localEuler", "CoEuler", "SLTS")
    thermo_model = read_thermo(case.constant_dict(
        "thermophysicalProperties"))
    thermo = PsiThermo(case, thermo_model)
    m = thermo_model
    info(f"Perfect gas: R={m.r:.6g} Cp={m.cp:.6g} gamma={m.gamma:.4g}\n")

    p = case.read_field("p")
    T = case.read_field("T")
    U = case.read_field("U")
    rho = T.with_calculated_bcs(m.rho(p.data, T.data),
                                m.rho(p.bvalues, T.bvalues),
                                dim_density, "rho")
    rho_f = fvc.face_values(mesh, rho)
    phi = SurfaceField(rho_f * fvc.flux(mesh, U).data,
                       DimensionSet.of(1, 0, -1), "phi")

    # fp32: run p in DEVIATION form when the static SI level dominates
    # the dynamic range (same criterion as rhoSimpleFoam)
    import numpy as np
    p_offset = 0.0
    if p.data.dtype == jnp.float32:
        pa = np.asarray(p.data)
        lvl, dyn = float(np.mean(pa)), float(pa.max() - pa.min())
        if abs(lvl) > 100.0 * max(dyn, 1e-30):
            p_offset = lvl
            from ..fields.field import shift_level
            p = shift_level(p, -p_offset)
            info(f"rhoPimpleFoam: solving p in deviation form "
                 f"(p_offset = {p_offset:g})\n")

    ctrl = PimpleControl(case)
    from ..models.turbulence import CompressibleTurbulence
    turb = CompressibleTurbulence(case, U)
    turb_state = turb.init_state(U)
    step = make_step(case, thermo, ctrl, lts=lts, turb=turb,
                     consistent=consistent, p_offset=p_offset)
    timer = ExecutionTimer()
    cumulative_err = 0.0

    rdt = None
    if lts:
        from .lts import LTSControls, log_time_scale, make_rdelta_t
        lts_ctrl = LTSControls.from_dict(ctrl.dict)
        rdelta_t = make_rdelta_t(mesh, lts_ctrl)

    info("\nStarting time loop\n")
    n = 0
    while case.time.loop():
        info(f"Time = {case.time.name}\n")
        if lts:
            rdt = rdelta_t(phi.data, rho.data, rdt)
            log_time_scale(rdt)
            dt_arg = rdt
        else:
            dt_arg = case.time.delta_t
        U, p, T, rho, phi, turb_state, stats = step(
            U, p, T, rho, phi, turb_state, dt_arg)
        log_courant(*stats["co"])
        for cmpt, perf in zip("xyz", stats["u_perf"]):
            log_solve(case.solver_controls("U").solver, f"U{cmpt}",
                      perf[0], perf[1], perf[2])
        log_solve(case.solver_controls("h").solver, "h",
                  stats["h_perf"][0][0], stats["h_perf"][0][1],
                  stats["h_perf"][0][2])
        for tname, perf in stats.get("turb", {}).items():
            log_solve(case.solver_controls(tname).solver, tname,
                      perf[0], perf[1], perf[2])
        for perf in stats["p_perf"]:
            log_solve(case.solver_controls("p").solver, "p",
                      perf[0], perf[1], perf[2])
        local_err, glob_err = stats["cont"]
        cumulative_err += float(glob_err)
        log_continuity(cumulative_err, local_err, glob_err)
        timer.log()
        if write and case.time.write_time():
            from ..fields.field import shift_level
            p_abs = shift_level(p, p_offset) if p_offset else p
            case.write_fields([U, p_abs, T, rho.replace(name="rho")]
                              + list(turb_state.values()))
        n += 1
        if max_steps and n >= max_steps:
            break
    info("End\n")
    if p_offset:
        from ..fields.field import shift_level
        p = shift_level(p, p_offset)
    return case, U, p, T, rho, phi
