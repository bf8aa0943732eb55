"""rhoCentralFoam — density-based central-upwind compressible solver.

Capability parity with the reference solver (reference:
applications/solvers/compressible/rhoCentralFoam/rhoCentralFoam.C:55-270):
Kurganov-Noelle-Petrova (default) / Kurganov-Tadmor central-upwind fluxes
built from one-sided ('pos'/'neg') limited face reconstructions, explicit
conserved-variable updates, optional implicit viscous corrections.

TPU-first: the whole timestep — both reconstructions, wave speeds,
all three flux assemblies and the conserved updates — is one jitted
program of pure gathers/elementwise math (no linear solves in the
inviscid path), which XLA fuses into a handful of kernels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..fields.field import Dimensioned, SurfaceField, VolField
from ..linalg import solve
from ..linalg.solvers import gmax, gsum
from ..models.thermo import PsiThermo, read_thermo
from ..ops import fvc, fvm
from ..ops.interpolation import interpolate_internal
from ..utils.dimensions import DimensionSet, dim_density, dimless
from ..utils.logging import (ExecutionTimer, info, log_courant, log_solve)
from .case import Case


def _pos_neg(mesh, vf: VolField, scheme):
    """One-sided face reconstructions: owner-upwinded ('pos') and
    neighbour-upwinded ('neg') limited values on all faces (reference's
    fvc::interpolate(vf, pos/neg, "reconstruct(...)"))."""
    n_int = mesh.n_internal
    ones = SurfaceField(jnp.ones(n_int, vf.data.dtype), dimless, "pos")
    pos_i = interpolate_internal(mesh, vf, scheme, phi=ones)
    neg_i = interpolate_internal(
        mesh, vf, scheme,
        phi=SurfaceField(-ones.data, dimless, "neg"))
    pos = jnp.concatenate([pos_i, vf.bvalues], axis=0)
    neg = jnp.concatenate([neg_i, vf.bvalues], axis=0)
    return pos, neg


def run(case_dir: str, write: bool = True, max_steps: int | None = None,
        dym: bool = False):
    """dym=True gives rhoCentralDyMFoam (reference: compressible/
    rhoCentralFoam/rhoCentralDyMFoam/rhoCentralDyMFoam.C): mesh.update()
    each step and the one-sided volumetric fluxes made relative
    (phiv_pos/neg -= meshPhi) before the wave-speed computation."""
    case = Case(case_dir)
    mesh = case.mesh
    dyn = None
    if dym:
        from ..models.dynamicmesh import make_dynamic_mesh
        dyn = make_dynamic_mesh(case)
    thermo_model = read_thermo(case.constant_dict(
        "thermophysicalProperties"))
    thermo = PsiThermo(case, thermo_model)
    m = thermo_model
    info(f"Perfect gas: R={m.r:.6g} Cp={m.cp:.6g} gamma={m.gamma:.4g}\n")

    fluxes = str(case.fv_schemes.word("fluxScheme", "Kurganov"))
    if fluxes not in ("Kurganov", "Tadmor"):
        raise ValueError(f"fluxScheme must be Kurganov or Tadmor, "
                         f"got '{fluxes}'")
    interp = case.fv_schemes.subdict("interpolationSchemes")
    recon_rho = str(interp.word("reconstruct(rho)", "vanLeer"))
    recon_u = str(interp.word("reconstruct(U)", "vanLeerV"))
    recon_t = str(interp.word("reconstruct(T)", "vanLeer"))
    inviscid = float(m.mu0) == 0.0
    lap_corr = case.laplacian_scheme()

    p = case.read_field("p")
    T = case.read_field("T")
    U = case.read_field("U")

    cd = case.control_dict
    adjust = str(cd.word("adjustTimeStep", "no")) in ("yes", "on", "true")
    max_co = float(cd.scalar("maxCo", 0.5))
    max_dt = float(cd.scalar("maxDeltaT", 1e10))

    if not inviscid:
        u_controls = case.solver_controls("U")
        e_controls = case.solver_controls("e")

    _MASS_FLUX = DimensionSet.of(1, 0, -1)

    @jax.jit
    def _step(mesh, U: VolField, p: VolField, T: VolField, dt,
              mesh_phi):
        # primitive -> conserved
        rho = T.with_calculated_bcs(m.rho(p.data, T.data),
                                    m.rho(p.bvalues, T.bvalues),
                                    dim_density, "rho")
        e = thermo.he_field(mesh, T)
        rhoU_d = rho.data[:, None] * U.data
        rhoE_d = rho.data * (e.data
                             + 0.5 * (U.data * U.data).sum(-1))
        rhoU = U.with_calculated_bcs(rhoU_d,
                                     rho.bvalues[:, None] * U.bvalues,
                                     rho.dims * U.dims, "rhoU")
        rpsi = T.with_calculated_bcs(m.r * T.data, m.r * T.bvalues,
                                     p.dims / rho.dims, "rPsi")

        # one-sided reconstructions (rhoCentralFoam.C:61-105)
        rho_pos, rho_neg = _pos_neg(mesh, rho, recon_rho)
        rhoU_pos, rhoU_neg = _pos_neg(mesh, rhoU, recon_u)
        rpsi_pos, rpsi_neg = _pos_neg(mesh, rpsi, recon_t)
        e_pos, e_neg = _pos_neg(mesh, e, recon_t)

        U_pos = rhoU_pos / rho_pos[:, None]
        U_neg = rhoU_neg / rho_neg[:, None]
        p_pos = rho_pos * rpsi_pos
        p_neg = rho_neg * rpsi_neg
        phiv_pos = (U_pos * mesh.Sf).sum(-1)
        phiv_neg = (U_neg * mesh.Sf).sum(-1)
        if dym:
            # rhoCentralDyMFoam.C: make the one-sided volumetric fluxes
            # relative to the mesh motion before the wave speeds
            phiv_pos = phiv_pos - mesh_phi
            phiv_neg = phiv_neg - mesh_phi

        c = T.with_calculated_bcs(m.c_sound(T.data), m.c_sound(T.bvalues),
                                  U.dims, "c")
        c_pos, c_neg = _pos_neg(mesh, c, recon_t)
        csf_pos = c_pos * mesh.mag_sf
        csf_neg = c_neg * mesh.mag_sf

        # local wave speeds (Kurganov ap/am, rhoCentralFoam.C:128-151)
        ap = jnp.maximum(jnp.maximum(phiv_pos + csf_pos,
                                     phiv_neg + csf_neg), 0.0)
        am = jnp.minimum(jnp.minimum(phiv_pos - csf_pos,
                                     phiv_neg - csf_neg), 0.0)
        if fluxes == "Kurganov":
            # zero-measure faces (gdia dummy plane slots, degenerate
            # decomposition padding) have ap = am = 0: 0/0 here would
            # poison every masked surface sum downstream (0 * nan =
            # nan). The reference never sees them (no padded faces);
            # central weighting (0.5) on a zero-area face is inert.
            den = ap - am
            safe = den > 0.0
            a_pos = jnp.where(safe, ap / jnp.where(safe, den, 1.0), 0.5)
            a_sf = am * a_pos
        else:                      # Tadmor central scheme
            amax = jnp.maximum(jnp.abs(am), jnp.abs(ap))
            a_sf = -0.5 * amax
            a_pos = jnp.full_like(ap, 0.5)
        a_neg = 1.0 - a_pos
        aphiv_pos = phiv_pos * a_pos - a_sf
        aphiv_neg = phiv_neg * a_neg + a_sf
        amax_sf = jnp.maximum(jnp.abs(aphiv_pos), jnp.abs(aphiv_neg))

        # Courant number (compressibleCourantNo.H)
        sum_amax = fvc.surface_sum_faces(mesh, amax_sf, signed=False)
        co_max = 0.5 * gmax(sum_amax / mesh.V) * dt

        # central-upwind fluxes (rhoCentralFoam.C:170-186)
        phi = aphiv_pos * rho_pos + aphiv_neg * rho_neg
        phi_up = (aphiv_pos[:, None] * rhoU_pos
                  + aphiv_neg[:, None] * rhoU_neg) \
            + (a_pos * p_pos + a_neg * p_neg)[:, None] * mesh.Sf
        phi_ep = aphiv_pos * (rho_pos
                              * (e_pos + 0.5 * (U_pos * U_pos).sum(-1))
                              + p_pos) \
            + aphiv_neg * (rho_neg
                           * (e_neg + 0.5 * (U_neg * U_neg).sum(-1))
                           + p_neg) \
            + a_sf * (p_pos - p_neg)

        rdtv = dt / mesh.V

        # conserved updates
        rho_new_d = rho.data - rdtv * fvc.surface_sum_faces(mesh, phi)
        rhoU_new_d = rhoU_d - rdtv[:, None] \
            * fvc.surface_sum_faces(mesh, phi_up)
        U = U.replace(data=rhoU_new_d / rho_new_d[:, None]) \
            .correct_boundary_conditions(mesh)

        u_perf = e_perf = None
        tau_mc = None
        mu_eff = None
        if not inviscid:
            # implicit viscous momentum correction
            # (ddt(rho,U) - fvc::ddt(rho,U) - laplacian(muEff,U)
            #  == div(tauMC)); old levels pinned to the post-convective
            # state so the ddt pair collapses to rho/dt (U - U*)
            mu_eff = Dimensioned(
                "muEff", DimensionSet.of(1, -1, -1),
                m.mu(fvc.face_values(mesh, T)))
            g = fvc.grad(mesh, U)

            def dev2t(t):
                tr = t[..., 0, 0] + t[..., 1, 1] + t[..., 2, 2]
                eye = jnp.eye(3, dtype=t.dtype)
                return jnp.swapaxes(t, -1, -2) \
                    - (2.0 / 3.0) * tr[..., None, None] * eye
            mu_c = jnp.asarray(m.mu(T.data)) * jnp.ones_like(T.data)
            mu_b = jnp.asarray(m.mu(T.bvalues)) * jnp.ones_like(T.bvalues)
            tau_mc = g.with_calculated_bcs(
                mu_c[:, None, None] * dev2t(g.data),
                mu_b[:, None, None] * dev2t(g.bvalues),
                DimensionSet.of(1, -1, -2), "tauMC")
            rho_f = T.with_calculated_bcs(rho_new_d,
                                          rho.bvalues, dim_density, "rho")
            rho_f = rho_f.replace(old=rho_f.replace(old=None))
            U2 = U.replace(old=U.replace(old=None))
            UEqn = fvm.ddt(mesh, U2, dt, coeff=rho_f) \
                - fvm.laplacian(mesh, mu_eff, U2, lap_corr)
            U, u_perf = solve(mesh, UEqn == fvc.div_tensor(mesh, tau_mc),
                              u_controls)
            rhoU_new_d = rho_new_d[:, None] * U.data

        # energy
        if inviscid:
            sigma_dot_u = 0.0
        else:
            sng_u = fvc.sn_grad(mesh, U)
            tau_f = fvc.face_values(mesh, tau_mc)
            mu_face = jnp.asarray(mu_eff.value) * jnp.ones_like(mesh.mag_sf)
            visc_vec = mu_face[:, None] * mesh.mag_sf[:, None] \
                * sng_u.data + (mesh.Sf[:, :, None] * tau_f).sum(1)
            sigma_dot_u = (visc_vec * (a_pos[:, None] * U_pos
                                       + a_neg[:, None] * U_neg)).sum(-1)
        rhoE_new_d = rhoE_d - rdtv * fvc.surface_sum_faces(
            mesh, phi_ep - sigma_dot_u)

        e_new_d = rhoE_new_d / rho_new_d \
            - 0.5 * (U.data * U.data).sum(-1)
        T = T.replace(data=m.t_from_he(e_new_d)) \
            .correct_boundary_conditions(mesh)

        if not inviscid:
            alpha_f = Dimensioned("alpha", DimensionSet.of(1, -1, -1),
                                  m.alpha_h(fvc.face_values(mesh, T)))
            e2 = thermo.he_field(mesh, T)
            e2 = e2.replace(old=e2.replace(old=None))
            rho_f = T.with_calculated_bcs(rho_new_d, rho.bvalues,
                                          dim_density, "rho")
            rho_f = rho_f.replace(old=rho_f.replace(old=None))
            eEqn = fvm.ddt(mesh, e2, dt, coeff=rho_f) \
                - fvm.laplacian(mesh, alpha_f, e2, lap_corr)
            e_solved, e_perf = solve(mesh, eEqn, e_controls)
            T = thermo.update_t(mesh, T, e_solved)

        # p from the equation of state, rho boundary from psi*p
        p = p.replace(data=rho_new_d * m.r * T.data) \
            .correct_boundary_conditions(mesh)

        mass_flux = SurfaceField(phi, _MASS_FLUX, "phi")
        c_new = m.c_sound(T.data)
        mach = jnp.linalg.norm(U.data, axis=-1) / c_new
        stats = dict(co_max=co_max, mach_max=mach.max(),
                     u_perf=u_perf, e_perf=e_perf)
        return U, p, T, mass_flux, stats

    from ..linalg.precompute import attach_solver_layouts
    import dataclasses as _dc
    mesh0 = jax.device_put(attach_solver_layouts(mesh, (), case=case))

    def step(mesh_new, U, p, T, dt, mesh_phi):
        m2 = _dc.replace(mesh_new, band=mesh0.band, gamg=mesh0.gamg)
        return _step(m2, U, p, T, dt, mesh_phi)

    timer = ExecutionTimer()
    info("\nStarting time loop\n")
    n = 0
    phi = None
    zf = jnp.zeros(mesh.n_faces, mesh.V.dtype)
    while case.time.loop():
        info(f"Time = {case.time.name}\n")
        if dyn is not None:
            mesh, mesh_phi, _mesh_ub = dyn.update(case.time.value)
            case.mesh = mesh
        else:
            mesh_phi = zf
        U, p, T, phi, stats = step(mesh, U, p, T, case.time.delta_t,
                                   mesh_phi)
        co_max = float(stats["co_max"])
        info(f"Mean and max Courant Numbers = - {co_max:.6g}\n")
        info(f"max Mach = {float(stats['mach_max']):.4g}\n")
        if stats["u_perf"] is not None:
            for cmpt, perf in zip("xyz", stats["u_perf"]):
                log_solve(u_controls.solver, f"U{cmpt}", perf[0],
                          perf[1], perf[2])
        timer.log()
        if adjust and co_max > 0:
            new_dt = min(case.time.delta_t * min(max_co / co_max, 1.2),
                         max_dt)
            case.time.set_delta_t(new_dt)
        if write and case.time.write_time():
            rho_out = T.with_calculated_bcs(
                m.rho(p.data, T.data), m.rho(p.bvalues, T.bvalues),
                dim_density, "rho")
            case.write_fields([U, p, T, rho_out])
        n += 1
        if max_steps and n >= max_steps:
            break
    info("End\n")
    return case, U, p, T, phi
