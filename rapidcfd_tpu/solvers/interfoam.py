"""interFoam — two-phase VOF solver (MULES-limited alpha transport).

Capability parity with the reference solver (reference:
applications/solvers/multiphase/interFoam/interFoam.C:51-120 with
alphaEqn.H, UEqn.H, pEqn.H and the interfaceProperties/
immiscibleIncompressibleTwoPhaseMixture stack): interface-compressed
MULES advection of alpha, mixture density/viscosity, CSF surface
tension, p_rgh pressure with buoyancy-consistent face fluxes.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from ..fields.field import Dimensioned, SurfaceField, VolField
from ..linalg import solve
from ..linalg.solvers import gsum
from ..ops import fvc, fvm
from ..ops.mules import explicit_solve, implicit_solve
from ..utils.dictionary import parse_file
from ..utils.dimensions import DimensionSet, dim_density
from ..utils.logging import (ExecutionTimer, info, log_continuity,
                             log_courant, log_solve)
from .case import Case
from .controls import PimpleControl
from .icofoam import courant_number


def make_step(case: Case, consts, ctrl: PimpleControl,
              mixing: bool = False, lts: bool = False,
              dym: bool = False):
    """mixing=True gives twoLiquidMixingFoam semantics (reference:
    multiphase/twoLiquidMixingFoam): no interface compression, no
    surface tension, plus an implicit Dab diffusion of alpha.
    lts=True gives LTSInterFoam: the step takes a per-cell rDeltaT
    (reference: LTSInterFoam/setrDeltaT.H + localEuler ddt).
    dym=True gives interDyMFoam (reference: multiphase/interFoam/
    interDyMFoam/interDyMFoam.C:51): the step takes the UPDATED mesh as
    a jit argument plus (mesh_phi, mesh_ub), convects with the RELATIVE
    flux, and returns the relative flux (caller restores the absolute
    flux — topology is static under solid-body motion so geometry
    updates do not recompile)."""
    mesh = case.mesh
    rho1, rho2, nu1, nu2, sigma, g = consts
    solvers_d = case.fv_solution.subdict("solvers")
    alpha_d = solvers_d.lookup("alpha.water") or solvers_d.lookup("alpha1")
    c_alpha = float(alpha_d.scalar("cAlpha", 1.0)) if alpha_d else 1.0
    # MULESCorr: semi-implicit MULES (implicit upwind transport +
    # limited explicit correction) — bounded at any Courant number
    # (reference: interFoam/alphaEqn.H MULESCorr branch)
    mules_corr = bool(alpha_d and alpha_d.word("MULESCorr", "no") in
                      ("yes", "true", "on", "1"))
    n_limiter_iter = (int(alpha_d.scalar("nLimiterIter", 3))
                      if alpha_d else 3)
    n_alpha_corr = (int(alpha_d.scalar("nAlphaCorr", 2))
                    if alpha_d else 2)
    mules_controls = case.solver_controls(
        "alpha.water" if (solvers_d.lookup("alpha.water") is not None)
        else "alpha1") if mules_corr else None
    if mixing:
        c_alpha = 0.0
        sigma = 0.0
        tp = case.transport_properties()
        Dab = Dimensioned.from_entry(tp.lookup("Dab", required=True),
                                     "Dab")
        alpha_controls = case.solver_controls(
            "alpha.water" if (solvers_d.lookup("alpha.water") is not None)
            else "alpha1")
    lap_corr = case.laplacian_scheme()
    p_controls = case.solver_controls("p_rgh")
    p_final = case.solver_controls("p_rgh", final=True)
    n_outer = ctrl.n_outer
    n_corr = ctrl.n_correctors
    n_alpha_sub = int(ctrl.dict.scalar("nAlphaSubCycles", 1))
    n_non_orth = ctrl.n_non_orth
    p_ref_cell, p_ref_value = ctrl.p_ref_cell, ctrl.p_ref_value
    delta_n = 1e-8

    def mixture(mesh, alpha):
        rho_d = alpha.data * rho1 + (1.0 - alpha.data) * rho2
        rho_b = alpha.bvalues * rho1 + (1.0 - alpha.bvalues) * rho2
        rho = alpha.with_calculated_bcs(rho_d, rho_b, dim_density, "rho")
        mu_d = alpha.data * rho1 * nu1 + (1.0 - alpha.data) * rho2 * nu2
        mu_b = alpha.bvalues * rho1 * nu1 \
            + (1.0 - alpha.bvalues) * rho2 * nu2
        mu = alpha.with_calculated_bcs(mu_d, mu_b,
                                       DimensionSet.of(1, -1, -1), "mu")
        return rho, mu

    def sigma_kappa_snalpha(mesh, alpha):
        """CSF: sigma*curvature*snGrad(alpha) face field (reference:
        interfaceProperties)."""
        g_a = fvc.grad(mesh, alpha)
        gf = fvc.face_values(mesh, g_a)
        mag = jnp.linalg.norm(gf, axis=-1) + delta_n
        nhatf = (gf / mag[:, None] * mesh.Sf).sum(-1)  # nHat & Sf
        kappa = -fvc.surface_sum_faces(mesh, nhatf) / mesh.V
        # interpolate curvature to faces (linear on internal, owner on bnd)
        w = mesh.weights
        own, nei = mesh.owner[:mesh.n_internal], mesh.neighbour
        k_int = w * jnp.take(kappa, own) + (1 - w) * jnp.take(kappa, nei)
        k_b = jnp.take(kappa, mesh.owner[mesh.n_internal:])
        kf = jnp.concatenate([k_int, k_b])
        sng = fvc.sn_grad(mesh, alpha)
        return sigma * kf * sng.data

    @jax.jit
    def _step(mesh, alpha: VolField, U: VolField, p_rgh: VolField,
              phi: SurfaceField, dt, mesh_phi, mesh_ub):
        ghf = (mesh.Cf * jnp.asarray(g, mesh.C.dtype)).sum(-1)
        if dym:
            # moving-wall velocity baked into bcdata + boundary relative
            # flux rebuilt from the corrected wall velocity (reference:
            # interDyMFoam.C mesh.update()/makeRelative; same pattern as
            # pimpledymfoam.make_step)
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
            phi_b = (U.bvalues * mesh.Sf[mesh.n_internal:]).sum(-1) \
                - mesh_phi[mesh.n_internal:]
            phi = SurfaceField(jnp.concatenate(
                [phi.data[:mesh.n_internal], phi_b]), phi.dims, "phi")
        if lts:
            dt = 1.0 / dt      # caller passes rDeltaT (nCells,)
        U = U.store_old()
        alpha = alpha.store_old()

        # ---- alphaEqn.H: MULES with interface compression
        phi_dims = phi.dims
        alpha0_old = alpha.old       # timestep-start level (for rho ddt)
        phi_alpha_sum = jnp.zeros_like(phi.data)
        for isub in range(n_alpha_sub):
            a_f = fvc.face_values(mesh, alpha, "vanLeer", phi)
            # compression flux phir = cAlpha*|phi|/|Sf| * nHatf
            g_a = fvc.grad(mesh, alpha)
            gf = fvc.face_values(mesh, g_a)
            mag = jnp.linalg.norm(gf, axis=-1) + delta_n
            nhatf = (gf / mag[:, None] * mesh.Sf).sum(-1)
            phir = c_alpha * jnp.abs(phi.data) \
                / jnp.maximum(mesh.mag_sf, 1e-30) * nhatf
            # no interface compression through boundary faces
            phir = phir.at[mesh.n_internal:].set(0.0)
            a_b_f = fvc.face_values(mesh, alpha)  # for alpha*(1-alpha)
            phi_alpha = SurfaceField(
                phi.data * a_f + phir * a_b_f * (1.0 - a_b_f),
                phi_dims, "phiAlpha")
            if mules_corr:
                if isub > 0:
                    alpha = alpha.store_old()
                alpha, phi_alpha_lim = implicit_solve(
                    mesh, alpha, phi, phi_alpha, dt / n_alpha_sub,
                    mules_controls, n_limiter_iter=n_limiter_iter,
                    n_corr_iter=n_alpha_corr)
            else:
                # sp = div(phi) compensates the fp32 continuity error of
                # the flux (a uniform field then stays exactly uniform;
                # without it the low-order update overshoots by
                # ~psi*div(phi)*dt ~ 1e-4)
                div_phi = fvc.surface_sum_faces(mesh, phi.data) / mesh.V
                alpha, phi_alpha_lim = explicit_solve(
                    mesh, alpha, phi, phi_alpha, dt / n_alpha_sub,
                    n_limiter_iter=n_limiter_iter, div_phi_comp=div_phi)
            phi_alpha_sum = phi_alpha_sum + phi_alpha_lim.data
        alpha = alpha.replace(old=alpha0_old)
        # sub-cycle AVERAGE flux drives rhoPhi (reference: subCycle
        # accumulates (deltaT/totalDeltaT)*rhoPhi each sub-step)
        rho_phi = SurfaceField(
            phi_alpha_sum / n_alpha_sub * (rho1 - rho2)
            + phi.data * rho2,
            phi.dims * dim_density, "rhoPhi")

        a_perf = None
        if mixing:
            # alphaDiffusionEqn.H: ddt(a) - fvc::ddt(a) -
            # laplacian(Dab, a); old level pinned to the advected state
            # so the ddt pair collapses to (a_new - a_adv)/dt
            a2 = alpha.replace(old=alpha.replace(old=None))
            aEqn = fvm.ddt(mesh, a2, dt) \
                - fvm.laplacian(mesh, Dab, a2, lap_corr)
            alpha, a_perf = solve(mesh, aEqn, alpha_controls)
            dflux = aEqn.replace(psi=alpha).flux(mesh)
            rho_phi = SurfaceField(
                rho_phi.data + dflux.data * (rho1 - rho2),
                rho_phi.dims, "rhoPhi")

        rho, mu = mixture(mesh, alpha)
        rho = rho.replace(
            old=mixture(mesh, alpha.old)[0].replace(old=None))

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
                # fvc::makeRelative(phiHbyA, U) on the moving mesh
                phi_hbya = SurfaceField(phi_hbya.data - mesh_phi,
                                        phi_hbya.dims, "phiHbyA")
            # buoyancy + surface tension as face forces
            sng_rho = fvc.sn_grad(mesh, rho)
            phig = (sigma_kappa_snalpha(mesh, alpha)
                    - ghf * sng_rho.data) * rAU_f * mesh.mag_sf
            # no body-force flux through non-coupled boundaries
            # (reference pairs this with fixedFluxPressure on p_rgh)
            phig = phig.at[mesh.n_internal:].set(0.0)
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

            # velocity correction (reference pEqn.H):
            # U = HbyA + rAU*reconstruct((phig - pEqn.flux())/rAUf)
            flux_p = pEqn.replace(psi=p_rgh).flux(mesh)
            corr_f = SurfaceField(
                (phig - flux_p.data) / jnp.maximum(rAU_f, 1e-30),
                phi.dims / rAU.dims, "corrF")
            U_star = HbyA + rAU * fvc.reconstruct(mesh, corr_f)
            env_u = ({"meshUb": mesh_ub,
                      "meshPhiB": mesh_phi[mesh.n_internal:],
                      "phi": phi} if dym else None)
            U = U.replace(data=U_star.data).correct_boundary_conditions(
                mesh, env=env_u)

        local_err, glob_err = (
            gsum(jnp.abs(fvc.div(mesh, phi).data) * mesh.V),
            gsum(fvc.div(mesh, phi).data * mesh.V))
        co_mean, co_max = courant_number(mesh, phi, dt)
        a_min = alpha.data.min()
        a_max = alpha.data.max()
        stats = dict(p_perf=tuple(p_perf_all), cont=(local_err, glob_err),
                     co=(co_mean, co_max), alpha=(a_min, a_max,
                                                  gsum(alpha.data * mesh.V)))
        return alpha, U, p_rgh, phi, stats

    if dym:
        from ..linalg.precompute import attach_solver_layouts
        mesh0 = jax.device_put(attach_solver_layouts(
            mesh, (p_controls, p_final), case=case))

        def step(mesh_new, alpha, U, p_rgh, phi_rel, mesh_phi, mesh_ub,
                 dt):
            # motion preserves topology: carry the precomputed solver
            # layouts (band/DIA indices, GAMG agglomeration) across
            # geometry updates
            import dataclasses as _dc
            m2 = _dc.replace(mesh_new, band=mesh0.band, gamg=mesh0.gamg)
            return _step(m2, alpha, U, p_rgh, phi_rel, dt, mesh_phi,
                         mesh_ub)
        return step

    from ..linalg.precompute import attach_solver_layouts
    mesh_a = jax.device_put(attach_solver_layouts(
        mesh, (p_controls, p_final), case=case))
    zf = jnp.zeros(mesh.n_faces, mesh.V.dtype)
    zb = jnp.zeros((mesh.n_boundary, 3), mesh.C.dtype)

    def step(alpha, U, p_rgh, phi, dt):
        from ..ops.interpolation import set_current_dt
        set_current_dt(dt)
        return _step(mesh_a, alpha, U, p_rgh, phi, dt, zf, zb)

    return step


def _read_constants(case: Case):
    tp = case.transport_properties()
    phases = tp.lookup("phases")
    names = [str(x) for x in phases] if phases else ["phase1", "phase2"]
    d1 = tp.subdict(names[0], required=False) or tp.subdict("phase1")
    d2 = tp.subdict(names[1], required=False) or tp.subdict("phase2")
    rho1 = Dimensioned.from_entry(d1.lookup("rho", required=True)).value
    rho2 = Dimensioned.from_entry(d2.lookup("rho", required=True)).value
    nu1 = Dimensioned.from_entry(d1.lookup("nu", required=True)).value
    nu2 = Dimensioned.from_entry(d2.lookup("nu", required=True)).value
    sigma_e = tp.lookup("sigma", required=False)
    sigma = Dimensioned.from_entry(sigma_e).value if sigma_e is not None \
        else 0.0
    gpath = os.path.join(case.dir, "constant", "g")
    if os.path.isfile(gpath):
        gd = parse_file(gpath)
        g = [float(x) for x in gd.lookup("value")]
    else:
        g = [0.0, -9.81, 0.0]
    return rho1, rho2, nu1, nu2, sigma, g


def run(case_dir: str, write: bool = True, max_steps: int | None = None,
        mixing: bool = False, lts: bool | None = None):
    """lts=True runs as LTSInterFoam; None auto-detects from
    `ddtSchemes { default localEuler; }`."""
    case = Case(case_dir)
    mesh = case.mesh
    if lts is None:
        lts = case.ddt_scheme() in ("localEuler", "CoEuler", "SLTS")
    consts = _read_constants(case)
    info(f"Two phases: rho1={consts[0]} rho2={consts[1]} "
         f"sigma={consts[4]}\n")

    alpha_name = "alpha.water" if case.field_exists("alpha.water") \
        else "alpha1"
    alpha = case.read_field(alpha_name)
    U = case.read_field("U")
    p_rgh = case.read_field("p_rgh")
    phi = fvc.flux(mesh, U)
    ctrl = PimpleControl(case)

    step = make_step(case, consts, ctrl, mixing=mixing, lts=lts)
    timer = ExecutionTimer()
    cumulative_err = 0.0

    rdt = None
    if lts:
        from .lts import (LTSControls, log_time_scale,
                          make_rdelta_t_interface)
        lts_ctrl = LTSControls.from_dict(ctrl.dict)
        max_alpha_co = float(ctrl.dict.scalar("maxAlphaCo", 0.2))
        rdelta_t = make_rdelta_t_interface(mesh, lts_ctrl, max_alpha_co)

    info("\nStarting time loop\n")
    n = 0
    co_max_prev = 0.0
    while case.time.run():
        if not lts and case.time.adjust_time_step and co_max_prev > 0:
            f = min(min(case.time.max_co / (co_max_prev + 1e-30), 1.0
                        + 0.1 * case.time.max_co / (co_max_prev + 1e-30)),
                    1.2)
            case.time.set_delta_t(f * case.time.delta_t)
        case.time.increment()
        info(f"Time = {case.time.name}\n")
        if lts:
            rdt = rdelta_t(phi.data, alpha.data, rdt)
            log_time_scale(rdt)
            dt_arg = rdt
        else:
            dt_arg = case.time.delta_t
        alpha, U, p_rgh, phi, stats = step(alpha, U, p_rgh, phi, dt_arg)
        co_mean, co_max = stats["co"]
        co_max_prev = float(co_max)
        log_courant(co_mean, co_max)
        a_min, a_max, a_int = stats["alpha"]
        info(f"Phase-1 volume fraction = "
             f"{float(a_int) / float(mesh.V.sum()):.8g}  "
             f"Min(alpha1) = {float(a_min):.6g}  "
             f"Max(alpha1) = {float(a_max):.6g}")
        for perf in stats["p_perf"]:
            log_solve(case.solver_controls('p_rgh').solver, "p_rgh",
                      perf[0], perf[1], perf[2])
        local_err, glob_err = stats["cont"]
        cumulative_err += float(glob_err)
        log_continuity(cumulative_err, local_err, glob_err)
        timer.log()
        if write and case.time.write_time():
            case.write_fields([alpha.replace(name=alpha_name), U, p_rgh])
        n += 1
        if max_steps and n >= max_steps:
            break
    info("End\n")
    return case, alpha, U, p_rgh, phi


def main(argv=None):
    import argparse
    ap = argparse.ArgumentParser(description="interFoam (rapidcfd_tpu)")
    ap.add_argument("-case", dest="case", default=".")
    ap.add_argument("-noWrite", action="store_true")
    args = ap.parse_args(argv)
    run(args.case, write=not args.noWrite)


if __name__ == "__main__":
    main()
