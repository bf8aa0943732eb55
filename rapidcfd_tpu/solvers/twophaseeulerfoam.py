"""twoPhaseEulerFoam — Eulerian two-fluid solver (dispersed/continuous).

Capability parity with the reference solver (reference:
applications/solvers/multiphase/twoPhaseEulerFoam/twoPhaseEulerFoam.C
with twoPhaseSystem/twoPhaseSystem.C:339-545 (MULES alpha transport with
dgdt dilatation sources), UEqns.H (per-phase momentum with drag
partial-elimination, virtual mass), EEqns.H (per-phase energy with
RanzMarshall interphase heat transfer; T-form here), pEqn.H (shared
pressure with per-phase compressibility, non-transonic branch)).

Closures from constant/phaseProperties via models/eulerian.py; per-phase
thermo from constant/thermophysicalProperties.<phase> (PhaseRhoThermo).
Laminar round-1 (the reference defaults most tutorials to laminar or
mixture k-epsilon); kinetic theory / phase pressure deferred.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from ..fields.field import Dimensioned, SurfaceField, VolField
from ..linalg import solve
from ..linalg.solvers import gsum
from ..models.eulerian import (cd_re, drag_k, heat_transfer_coeff,
                               lift_force_full, read_phase_properties,
                               turbulent_dispersion_force,
                               virtual_mass_coeff,
                               wall_lubrication_force)
from ..models.thermo import read_rho_thermo
from ..ops import fvc, fvm
from ..ops.mules import explicit_solve
from ..utils.dictionary import parse_file
from ..utils.dimensions import (DimensionSet, dim_density,
                                dim_dynamic_viscosity)
from ..utils.logging import (ExecutionTimer, info, log_courant, log_solve)
from .case import Case
from .controls import PimpleControl
from .icofoam import courant_number


def _read_setup(case: Case):
    props = case.constant_dict("phaseProperties")
    names, specs, closures = read_phase_properties(props)
    t1 = read_rho_thermo(parse_file(os.path.join(
        case.dir, "constant", f"thermophysicalProperties.{names[0]}")))
    t2 = read_rho_thermo(parse_file(os.path.join(
        case.dir, "constant", f"thermophysicalProperties.{names[1]}")))
    pmin_e = props.lookup("pMin", required=False)
    pmin = Dimensioned.from_entry(pmin_e).value if pmin_e is not None \
        else 10000.0
    gpath = os.path.join(case.dir, "constant", "g")
    if os.path.isfile(gpath):
        g = [float(x) for x in parse_file(gpath).lookup("value")]
    else:
        g = [0.0, -9.81, 0.0]
    return names, specs, closures, t1, t2, pmin, g


def _row_scale(mesh, m, s, dims=None):
    """volScalarField * fvMatrix (row scaling; reference: fvMatrix
    operator* with a DimensionedField). dims: resulting matrix
    dimensions (scaling coefficient dims folded in)."""
    own = mesh.owner[:mesh.n_internal]
    return m.replace(
        dims=dims if dims is not None else m.dims,
        diag=m.diag * s,
        lower=m.lower * jnp.take(s, mesh.neighbour),
        upper=m.upper * jnp.take(s, own),
        source=m.source * s[:, None] if m.source.ndim > 1
        else m.source * s,
        internal_coeffs=tuple(
            ic * jnp.take(s, mesh.patch_face_cells(p))[:, None]
            if ic.ndim > 1 else ic * jnp.take(s, mesh.patch_face_cells(p))
            for p, ic in zip(mesh.patches, m.internal_coeffs)),
        boundary_coeffs=tuple(
            bc * jnp.take(s, mesh.patch_face_cells(p))[:, None]
            if bc.ndim > 1 else bc * jnp.take(s, mesh.patch_face_cells(p))
            for p, bc in zip(mesh.patches, m.boundary_coeffs)),
        symmetric=False)


def make_step(case: Case, setup, ctrl: PimpleControl, turb=None,
              kt=None):
    """turb: optional phase-aware RAS model (models/phaseturbulence:
    mixtureKEpsilon/LaheyKEpsilon). With turb, the effective phase
    viscosities include rho*nut and the turbulent-dispersion force uses
    the continuous-phase nut (reference: twoPhaseEulerFoam UEqns.H
    lift/wallLubrication/turbulentDispersion forces).

    kt: optional KTConfig (models/kinetictheory) — kinetic theory of
    granular flow on the dispersed phase: granular viscosity replaces
    nut1, the bulk-stress divergence enters U1's momentum, and the
    phase-pressure derivative pPrime drives an implicit alpha
    correction after MULES (reference: kineticTheoryModel.C +
    twoPhaseSystem.C:531 implicitPhasePressure)."""
    mesh = case.mesh
    names, specs, closures, m1, m2, p_min, g = setup
    spec1, spec2 = specs
    drag_name, drag_d = closures["drag"]
    vm_name, vm_d = closures["virtual_mass"]
    ht_name, _ = closures["heat_transfer"]
    lift_name, lift_d = closures["lift"]
    wl_name, wl_d = closures["wall_lubrication"]
    td_name, td_d = closures["turbulent_dispersion"]
    props = case.constant_dict("phaseProperties")
    sigma_e = props.lookup("sigma", required=False)
    from ..fields.field import Dimensioned as _Dim
    sigma_st = _Dim.from_entry(sigma_e).value if sigma_e is not None \
        else 0.07
    # |g| as given — an explicit zero-g case must yield Eo = 0 in the
    # Tomiyama/Frank correlations (the absent-g default is set where g
    # is read, not here)
    g_mag = float(jnp.linalg.norm(jnp.asarray(g)))
    # wall geometry for the wall-lubrication force (reference:
    # wallDependentModel yWall/nWall; n points TOWARD the wall =
    # -normalised(grad(yWall)))
    y_wall = n_wall = None
    if wl_name not in ("none", None):
        from ..models.turbulence import wall_distance
        from ..fields.bcs import make_bc
        yw = wall_distance(case)
        bcs = tuple(
            make_bc("empty" if pt.is_empty else "zeroGradient", i)
            for i, pt in enumerate(mesh.patches))
        ywf = VolField(yw, jnp.take(yw, jnp.asarray(
            mesh.owner[mesh.n_internal:])), bcs,
            DimensionSet.of(0, 1), "yWall",
            tuple({} for _ in mesh.patches))
        gy = fvc.grad(mesh, ywf).data
        n_wall = -gy / jnp.maximum(
            jnp.linalg.norm(gy, axis=-1, keepdims=True), 1e-8)
        y_wall = yw
    solvers_d = case.fv_solution.subdict("solvers")
    alpha_key = f"alpha.{names[0]}"
    alpha_d = solvers_d.lookup(alpha_key) or solvers_d.lookup("alpha1")
    n_alpha_sub = int(alpha_d.scalar("nAlphaSubCycles", 1)) if alpha_d \
        else 1
    n_alpha_corr = int(alpha_d.scalar("nAlphaCorr", 1)) if alpha_d else 1
    lap_corr = case.laplacian_scheme()
    p_controls = case.solver_controls("p")
    p_final = case.solver_controls("p", final=True)
    t_controls = case.solver_controls("T")
    n_outer = ctrl.n_outer
    n_corr = ctrl.n_correctors
    n_non_orth = ctrl.n_non_orth
    g_arr = jnp.asarray(g, mesh.C.dtype)
    g_sf = (mesh.Sf * g_arr).sum(-1)            # g & Sf
    solve_energy = case.field_exists(f"T.{names[0]}") \
        or case.field_exists("T")

    dim_rho = dim_density
    _DN = DimensionSet

    def calc(like, data, bdata, dims, name):
        return like.with_calculated_bcs(data, bdata, dims, name)

    def eos(like, p, T, m, name):
        return calc(like, m.rho(p.data, T.data), m.rho(p.bvalues,
                                                       T.bvalues),
                    dim_rho, name)

    @jax.jit
    def step(alpha: VolField, U1: VolField, U2: VolField, p: VolField,
             T1: VolField, T2: VolField, rho1: VolField, rho2: VolField,
             phi1: SurfaceField, phi2: SurfaceField, dgdt, turb_state,
             dt):
        alpha = alpha.store_old()
        U1 = U1.store_old()
        U2 = U2.store_old()
        T1 = T1.store_old()
        T2 = T2.store_old()
        rho1 = rho1.store_old()
        rho2 = rho2.store_old()
        rho1_old, rho2_old = rho1.old, rho2.old
        phi1_old, phi2_old = phi1.data, phi2.data
        alpha_old = alpha.old

        a1f0 = fvc.face_values(mesh, alpha)
        phi = SurfaceField(a1f0 * phi1.data + (1.0 - a1f0) * phi2.data,
                           phi1.dims, "phi")

        p_perf_all = []
        for outer in range(n_outer):
            # ---- fluid.solve(): MULES alpha transport (reference:
            # twoPhaseSystem.C:339-545)
            divu = fvc.div(mesh, phi).data
            for _ in range(n_alpha_corr * n_alpha_sub):
                cond_pos = dgdt > 0.0
                cond_neg = dgdt < 0.0
                sp = jnp.where(
                    cond_pos,
                    -dgdt / jnp.maximum(1.0 - alpha.data, 1e-4), 0.0) \
                    + jnp.where(
                        cond_neg,
                        dgdt / jnp.maximum(alpha.data, 1e-4), 0.0)
                su = divu * jnp.minimum(alpha.data, 1.0) \
                    + jnp.where(
                        cond_pos,
                        dgdt / jnp.maximum(1.0 - alpha.data, 1e-4), 0.0)
                # alphaPhic1 = flux(phi, alpha1) +
                #              flux(-flux(-phir, alpha2), alpha1)
                phir = SurfaceField(phi1.data - phi2.data, phi1.dims,
                                    "phir")
                a1_f = fvc.face_values(mesh, alpha, "vanLeer", phi)
                alpha2_vf = alpha.replace(
                    data=1.0 - alpha.data, bvalues=1.0 - alpha.bvalues,
                    old=None)
                mphir = SurfaceField(-phir.data, phir.dims, "-phir")
                a2_f = fvc.face_values(mesh, alpha2_vf, "vanLeer", mphir)
                inner_flux = -(mphir.data * a2_f)
                a1_fr = fvc.face_values(
                    mesh, alpha, "vanLeer",
                    SurfaceField(inner_flux, phir.dims, "fr"))
                phi_alpha = SurfaceField(
                    phi.data * a1_f + inner_flux * a1_fr,
                    phi.dims, "alphaPhic1")
                alpha, alpha_phi1 = explicit_solve(
                    mesh, alpha, phi, phi_alpha,
                    dt / n_alpha_sub, psi_max=spec1.alpha_max,
                    sp=sp, su=su)
            if kt is not None:
                # implicit phase-pressure correction (reference:
                # twoPhaseSystem.C:525-545 — ddt(alpha1) - ddt_MULES -
                # laplacian(alpha1f*pPrimeByA, alpha1) == 0, using the
                # pPrimeByA saved from the previous pressure stage)
                pprime_f = turb_state["kt_pprime_f"]
                gamma_pp = Dimensioned("pPrimeByA",
                                       _DN.of(0, 2, -1), pprime_f)
                a_corr = alpha.replace(old=alpha.replace(old=None))
                aEqn = fvm.ddt(mesh, a_corr, dt) \
                    - fvm.laplacian(mesh, gamma_pp, a_corr, lap_corr)
                from ..linalg.solvers import SolverControls
                alpha_s, _ = solve(mesh, aEqn, SolverControls(
                    solver="PCG", preconditioner="DIC", tolerance=1e-9,
                    rel_tol=0.0, max_iter=100))
                alpha_phi1 = SurfaceField(
                    alpha_phi1.data
                    + aEqn.replace(psi=alpha_s).flux(mesh).data,
                    phi.dims, "alphaPhi1")
                alpha = alpha_s.replace(old=alpha.old)
            alpha_phi2 = SurfaceField(phi.data - alpha_phi1.data,
                                      phi.dims, "alphaPhi2")
            rho1f = fvc.face_values(mesh, rho1)
            rho2f = fvc.face_values(mesh, rho2)
            alpha_rho_phi1 = SurfaceField(rho1f * alpha_phi1.data,
                                          phi.dims * dim_rho, "arPhi1")
            alpha_rho_phi2 = SurfaceField(rho2f * alpha_phi2.data,
                                          phi.dims * dim_rho, "arPhi2")

            a1 = alpha.data
            a2 = 1.0 - a1
            a1_old = alpha_old.data

            # continuity errors (per volume)
            cont_err1 = (a1 * rho1.data - a1_old * rho1_old.data) / dt \
                + fvc.surface_sum_faces(mesh, alpha_rho_phi1.data) / mesh.V
            cont_err2 = (a2 * rho2.data
                         - (1.0 - a1_old) * rho2_old.data) / dt \
                + fvc.surface_sum_faces(mesh, alpha_rho_phi2.data) / mesh.V

            # ---- interfacial coefficients (phase 1 dispersed in 2)
            ur = U1.data - U2.data
            ur_mag = jnp.linalg.norm(ur, axis=-1) + 1e-12
            mu_c = m2.mu(T2.data)
            if drag_name == "segregated":
                from ..models.eulerian import segregated_drag_k
                k_drag = segregated_drag_k(
                    mesh, drag_d, a1, a2, rho1.data, rho2.data,
                    m1.mu(T1.data) / rho1.data,
                    m2.mu(T2.data) / rho2.data, ur_mag)
            else:
                k_drag = drag_k(drag_name, drag_d, a1, rho2.data, mu_c,
                                spec1.d, ur_mag, rho_d=rho1.data,
                                sigma=sigma_st, g_mag=g_mag)
            vm = virtual_mass_coeff(vm_name, vm_d, a1, rho2.data)
            cdre = cd_re(k_drag, a1, mu_c, spec1.d)
            if kt is not None:
                # kinetic theory closures on the dispersed phase
                # (equilibrium Theta: production = dissipation,
                # kineticTheoryModel.C equilibrium branch)
                from ..models.kinetictheory import (equilibrium_theta,
                                                    kt_closures)
                g1 = fvc.grad(mesh, U1).data
                D_sym = 0.5 * (g1 + jnp.swapaxes(g1, -1, -2))
                div_u1 = fvc.div(mesh, phi1).data
                a1_pos = jnp.maximum(a1, 0.0)
                kt_theta = equilibrium_theta(kt, a1_pos, rho1.data,
                                             spec1.d, div_u1, D_sym)
                (kt_nut, kt_lambda, kt_pprime, kt_kappa,
                 kt_ps) = kt_closures(kt, a1_pos, kt_theta, rho1.data,
                                      spec1.d, D_sym)
                turb_state = {**turb_state, "nut1": kt_nut,
                              "kt_theta": kt_theta}
            nut1_c = turb_state["nut1"] if (turb is not None
                                            or kt is not None) \
                else jnp.zeros_like(a1)
            nut2_c = turb_state["nut2"] if turb is not None \
                else jnp.zeros_like(a1)

            # interfacial non-drag forces on the dispersed phase
            # (reference: UEqns.H — applied -F to phase 1, +F to 2)
            f_int = jnp.zeros_like(U1.data)
            if lift_name not in ("none", None):
                g2 = fvc.grad(mesh, U2).data
                curl_uc = jnp.stack(
                    [g2[..., 1, 2] - g2[..., 2, 1],
                     g2[..., 2, 0] - g2[..., 0, 2],
                     g2[..., 0, 1] - g2[..., 1, 0]], axis=-1)
                f_int = f_int + lift_force_full(
                    lift_name, lift_d, a1, rho2.data, rho1.data, ur,
                    curl_uc, mu_c, spec1.d, sigma=sigma_st,
                    g_mag=g_mag)
            if wl_name not in ("none", None):
                f_int = f_int + wall_lubrication_force(
                    wl_name, wl_d, a1, rho2.data, rho1.data, ur,
                    spec1.d, y_wall, n_wall, sigma=sigma_st,
                    g_mag=g_mag)
            if td_name not in ("none", None):
                grad_a1 = fvc.grad(mesh, alpha).data
                f_int = f_int + turbulent_dispersion_force(
                    td_name, td_d, a1, rho2.data, mu_c / rho2.data,
                    nut2_c, spec1.d, cdre, grad_a1,
                    residual_alpha=spec1.residual_alpha)

            # ---- UEqns.H (laminar)
            c1 = calc(alpha, a1 * rho1.data,
                      alpha.bvalues * rho1.bvalues, dim_rho, "a1rho1")
            c1 = c1.replace(old=calc(
                alpha, a1_old * rho1_old.data,
                alpha_old.bvalues * rho1_old.bvalues, dim_rho,
                "a1rho1o").replace(old=None))
            c2 = calc(alpha, a2 * rho2.data,
                      (1.0 - alpha.bvalues) * rho2.bvalues, dim_rho,
                      "a2rho2")
            c2 = c2.replace(old=calc(
                alpha, (1.0 - a1_old) * rho2_old.data,
                (1.0 - alpha_old.bvalues) * rho2_old.bvalues, dim_rho,
                "a2rho2o").replace(old=None))
            mu1_eff = calc(alpha,
                           jnp.maximum(a1, 1e-4)
                           * (m1.mu(T1.data) + rho1.data * nut1_c),
                           jnp.maximum(alpha.bvalues, 1e-4)
                           * m1.mu(T1.bvalues),
                           dim_dynamic_viscosity, "a1mu1")
            mu2_eff = calc(alpha,
                           jnp.maximum(a2, 1e-4)
                           * (m2.mu(T2.data) + rho2.data * nut2_c),
                           jnp.maximum(1.0 - alpha.bvalues, 1e-4)
                           * m2.mu(T2.bvalues),
                           dim_dynamic_viscosity, "a2mu2")
            mu1f = Dimensioned("mu1f", dim_dynamic_viscosity,
                               fvc.face_values(mesh, mu1_eff))
            mu2f = Dimensioned("mu2f", dim_dynamic_viscosity,
                               fvc.face_values(mesh, mu2_eff))

            # explicit DDt of the other phase for virtual mass
            def ddt_u(Ui, phii):
                conv = fvc.div(mesh, phii, Ui, "upwind").data
                divp = fvc.div(mesh, phii).data
                return (Ui.data - Ui.old.data) / dt + conv \
                    - divp[:, None] * Ui.data

            ddt_u1 = ddt_u(U1, phi1)
            ddt_u2 = ddt_u(U2, phi2)

            def ueqn(Ui, ci, arphi, muf, vm_c, ddt_other, phii):
                m = (fvm.ddt(mesh, Ui, dt, coeff=ci)
                     + fvm.div(mesh, arphi, Ui, "upwind")
                     - fvm.Sp(mesh, Dimensioned(
                         "contErr", arphi.dims / _DN.of(0, 3),
                         cont_err1 if ci is c1 else cont_err2), Ui)
                     - fvm.laplacian(mesh, muf, Ui, lap_corr))
                # virtual mass: vm*(ddt(Ui)+div(phii,Ui)-Sp(div phii,Ui))
                # implicit on Ui, explicit DDt of the other phase
                if vm_name != "none":
                    vm_m = (fvm.ddt(mesh, Ui, dt)
                            + fvm.div(mesh, phii, Ui, "upwind")
                            - fvm.Sp(mesh, Dimensioned(
                                "divphi", phii.dims / _DN.of(0, 3),
                                fvc.div(mesh, phii).data), Ui))
                    m = m + _row_scale(mesh, vm_m, vm_c, dims=m.dims)
                    m = m.replace(source=m.source
                                  + (vm_c * mesh.V)[:, None] * ddt_other)
                return m

            U1Eqn = ueqn(U1, c1, alpha_rho_phi1, mu1f, vm, ddt_u2, phi1)
            U2Eqn = ueqn(U2, c2, alpha_rho_phi2, mu2f, vm, ddt_u1, phi2)
            if kt is not None:
                # bulk part of the granular stress: div(a1 rho1
                # (lambda - 2/3 nut) tr(D) I) = grad(s) (the shear part
                # rides the mu1_eff laplacian)
                s_bulk = calc(
                    alpha,
                    a1 * rho1.data * (kt_lambda - (2.0 / 3.0) * kt_nut)
                    * div_u1,
                    jnp.zeros_like(alpha.bvalues),
                    _DN.of(1, -1, -2), "ktBulk")
                U1Eqn = U1Eqn.replace(
                    source=U1Eqn.source
                    + mesh.V[:, None] * fvc.grad(mesh, s_bulk).data)
            U1Eqn = U1Eqn.replace(
                source=U1Eqn.source - mesh.V[:, None] * f_int)
            U2Eqn = U2Eqn.replace(
                source=U2Eqn.source + mesh.V[:, None] * f_int)
            # drag diagonal (after relax in reference; transient: none)
            U1Eqn = U1Eqn.replace(diag=U1Eqn.diag + mesh.V * k_drag)
            U2Eqn = U2Eqn.replace(diag=U2Eqn.diag + mesh.V * k_drag)

            # ---- EEqns.H (T-form, optional)
            if solve_energy:
                kappa1 = m1.mu(T1.data) / m1.pr * m1.cp
                kappa2 = m2.mu(T2.data) / m2.pr * m2.cp
                htc = heat_transfer_coeff(
                    ht_name, a1, rho2.data, mu_c, kappa2, m2.pr,
                    spec1.d, ur_mag)
                dim_ccv = _DN.of(1, -1, -2, -1)   # rho*cv
                dim_kap = _DN.of(1, 1, -3, -1)    # W/m/K
                for (Ti, Tj, ci, arphi, cv, kap, ai, abi) in (
                        (T1, T2, c1, alpha_rho_phi1, m1.cv, kappa1, a1,
                         alpha.bvalues),
                        (T2, T1, c2, alpha_rho_phi2, m2.cv, kappa2, a2,
                         1.0 - alpha.bvalues)):
                    ccv = calc(alpha, ci.data * cv, ci.bvalues * cv,
                               dim_ccv, "ccv")
                    ccv = ccv.replace(old=calc(
                        alpha, ci.old.data * cv, ci.old.bvalues * cv,
                        dim_ccv, "ccvo").replace(old=None))
                    arphicv = SurfaceField(arphi.data * cv,
                                           arphi.dims * _DN.of(0, 2, -2,
                                                               -1),
                                           "arphicv")
                    akap = jnp.maximum(ai, 1e-4) * kap
                    kap_f = Dimensioned(
                        "kapf", dim_kap,
                        fvc.face_values(mesh, calc(
                            alpha, akap,
                            jnp.maximum(abi, 1e-4)
                            * jnp.ones_like(abi) * jnp.mean(kap),
                            dim_kap, "akap")))
                    TEqn = (fvm.ddt(mesh, Ti, dt, coeff=ccv)
                            + fvm.div(mesh, arphicv, Ti, "upwind")
                            - fvm.laplacian(mesh, kap_f, Ti, lap_corr)
                            + fvm.Sp(mesh, Dimensioned(
                                "htc", _DN.of(1, -1, -3, -1), htc), Ti))
                    rhs = calc(alpha, htc * Tj.data,
                               jnp.zeros_like(alpha.bvalues),
                               TEqn.dims / _DN.of(0, 3), "Tsrc")
                    Ti_new, _ = solve(mesh, TEqn.equals(rhs), t_controls)
                    if Ti is T1:
                        T1 = T1.replace(data=Ti_new.data,
                                        bvalues=Ti_new.bvalues)
                    else:
                        T2 = T2.replace(data=Ti_new.data,
                                        bvalues=Ti_new.bvalues)
                rho1 = eos(alpha, p, T1, m1, rho1.name).replace(
                    old=rho1_old)
                rho2 = eos(alpha, p, T2, m2, rho2.name).replace(
                    old=rho2_old)
            psi1 = m1.psi(T1.data)
            psi2 = m2.psi(T2.data)

            # ---- pEqn.H (non-transonic)
            for corr in range(n_corr):
                U1E = U1Eqn.replace(psi=U1)
                U2E = U2Eqn.replace(psi=U2)
                a1f = fvc.face_values(
                    mesh, alpha.replace(
                        data=jnp.maximum(a1, 0.0),
                        bvalues=jnp.maximum(alpha.bvalues, 0.0),
                        old=None))
                a2f = 1.0 - a1f
                rAU1 = 1.0 / U1E.A(mesh)
                rAU2 = 1.0 / U2E.A(mesh)
                if kt is not None:
                    # pPrimeByA for the NEXT alpha solve (reference
                    # saves it from this stage: twoPhaseSystem.C:385)
                    pp = calc(alpha, rAU1.data * kt_pprime,
                              jnp.zeros_like(alpha.bvalues),
                              _DN.of(0, 2, -1), "rAUpPrime")
                    ppf = fvc.face_values(mesh, pp)
                    turb_state = {**turb_state,
                                  "kt_pprime_f": a1f * ppf}
                    # phase-pressure flux at the pressure predictor
                    # (reference pEqn.H: phiP1 = interp(rAU1*pPrime)
                    # *snGrad(alpha1)*magSf, boundary zeroed) — THE
                    # stabilizer of sharp packing fronts
                    phiP1 = (ppf * fvc.sn_grad(mesh, alpha).data
                             * mesh.mag_sf).at[mesh.n_internal:].set(0.0)
                else:
                    phiP1 = 0.0
                ra1f = fvc.face_values(mesh, rAU1 * c1)
                ra2f = fvc.face_values(mesh, rAU2 * c2)
                HbyA1 = fvc.constrain_hbya(mesh, rAU1 * U1E.H(mesh), U1)
                HbyA2 = fvc.constrain_hbya(mesh, rAU2 * U2E.H(mesh), U2)

                def ddt_corr(Ui, phii_old):
                    uf_old = fvc.flux(mesh, Ui.old).data
                    dphi = phii_old - uf_old
                    coeff = 1.0 - jnp.minimum(
                        jnp.abs(dphi) / (jnp.abs(phii_old) + 1e-30), 1.0)
                    return coeff * dphi / dt

                drag1f = fvc.face_values(
                    mesh, calc(alpha, rAU1.data * k_drag,
                               jnp.zeros_like(alpha.bvalues),
                               rAU1.dims * _DN.of(1, -3, -1), "rAUK1"))
                drag2f = fvc.face_values(
                    mesh, calc(alpha, rAU2.data * k_drag,
                               jnp.zeros_like(alpha.bvalues),
                               rAU2.dims * _DN.of(1, -3, -1), "rAUK2"))
                # body-force + drag-coupled predicted fluxes; the
                # boundary body-force flux is KEPT on fixedFluxPressure
                # patches (their snGrad balances it below, matching the
                # reference's setSnGrad<fixedFluxPressure> in pEqn.H)
                # and zeroed on legacy zeroGradient p patches
                from ..fields.bcs import (
                    fixed_flux_pressure_mask,
                    set_fixed_flux_pressure_gradient)
                ffp_mask = fixed_flux_pressure_mask(mesh, p)
                gflux1 = (ra1f * g_sf).at[mesh.n_internal:].multiply(
                    ffp_mask)
                gflux2 = (ra2f * g_sf).at[mesh.n_internal:].multiply(
                    ffp_mask)
                phi_hbya1 = fvc.flux(mesh, HbyA1).data \
                    + ra1f * ddt_corr(U1, phi1_old) \
                    + drag1f * phi2.data + gflux1 - phiP1
                phi_hbya2 = fvc.flux(mesh, HbyA2).data \
                    + ra2f * ddt_corr(U2, phi2_old) \
                    + drag2f * phi1.data + gflux2
                phi_hbya = SurfaceField(
                    a1f * phi_hbya1 + a2f * phi_hbya2, phi.dims,
                    "phiHbyA")
                n_int = mesh.n_internal
                sngrad_b = (phi_hbya.data[n_int:]
                            - (a1f[n_int:]
                               * (mesh.Sf[n_int:] * U1.bvalues).sum(-1)
                               + a2f[n_int:]
                               * (mesh.Sf[n_int:] * U2.bvalues).sum(-1)))
                HbyA1 = HbyA1 + rAU1 * calc(
                    alpha, k_drag, jnp.zeros_like(alpha.bvalues),
                    _DN.of(1, -3, -1), "K") * U2
                HbyA2 = HbyA2 + rAU2 * calc(
                    alpha, k_drag, jnp.zeros_like(alpha.bvalues),
                    _DN.of(1, -3, -1), "K") * U1
                rauf_face = jnp.abs(a1f * ra1f / rho1f
                                    + a2f * ra2f / rho2f)
                rauf = SurfaceField(rauf_face,
                                    rAU1.dims * _DN.of(1, -3)
                                    / dim_rho, "rAUf")
                # setSnGrad<fixedFluxPressure> (reference pEqn.H):
                # gradient = (phiHbyA_b - Sf_b & U_b)/(magSf_b*rAUf_b)
                p = set_fixed_flux_pressure_gradient(
                    mesh, p, sngrad_b
                    / (jnp.maximum(mesh.mag_sf[n_int:], 1e-30)
                       * jnp.maximum(rauf_face[n_int:], 1e-30)))

                # compressibility parts
                rate1 = cont_err1 / rho1.data \
                    - ((a1 - a1_old) / dt
                       + fvc.surface_sum_faces(
                           mesh, alpha_phi1.data) / mesh.V)
                rate2 = cont_err2 / rho2.data \
                    - ((a2 - (1.0 - a1_old)) / dt
                       + fvc.surface_sum_faces(
                           mesh, alpha_phi2.data) / mesh.V)
                d_comp = (a1 * psi1 / rho1.data
                          + a2 * psi2 / rho2.data) * mesh.V / dt
                expl = (rate1 + rate2) * mesh.V

                for north in range(n_non_orth + 1):
                    final = corr == n_corr - 1 and north == n_non_orth
                    L = fvm.laplacian(mesh, rauf, p, lap_corr)
                    div_hbya = fvc.surface_sum_faces(mesh, phi_hbya.data)
                    pEqn = L.replace(
                        diag=L.diag - d_comp,
                        source=L.source + expl - d_comp * p.data
                        + div_hbya,
                        symmetric=False)
                    p_cur = p.data
                    p, p_perf = solve(
                        mesh, pEqn, p_final if final else p_controls)
                    p_perf_all.append(p_perf[0])
                flux_p = pEqn.replace(psi=p).flux(mesh)
                msf_gradp = -flux_p.data / jnp.maximum(rauf_face, 1e-30)
                phi1 = SurfaceField(
                    phi_hbya1 + ra1f * msf_gradp / rho1f, phi.dims,
                    "phi1")
                phi2 = SurfaceField(
                    phi_hbya2 + ra2f * msf_gradp / rho2f, phi.dims,
                    "phi2")
                phi = SurfaceField(a1f * phi1.data + a2f * phi2.data,
                                   phi.dims, "phi")
                dp_rate = (p.data - p_cur) / dt
                r1 = rate1 + a1 * psi1 / rho1.data * dp_rate
                r2 = rate2 + a2 * psi2 / rho2.data * dp_rate
                dgdt = a1 * r2 - a2 * r1

                corr1 = SurfaceField(
                    ra1f * (g_sf + msf_gradp / rho1f) - phiP1,
                    phi.dims, "c1f")
                corr2 = SurfaceField(
                    ra2f * (g_sf + msf_gradp / rho2f),
                    phi.dims, "c2f")
                U1n = HbyA1 + fvc.reconstruct(mesh, corr1)
                U2n = HbyA2 + fvc.reconstruct(mesh, corr2)
                U1 = U1.replace(data=U1n.data) \
                       .correct_boundary_conditions(mesh)
                U2 = U2.replace(data=U2n.data) \
                       .correct_boundary_conditions(mesh)
                p = p.replace(data=jnp.maximum(p.data, p_min)) \
                     .correct_boundary_conditions(mesh)
                rho1 = eos(alpha, p, T1, m1, rho1.name).replace(
                    old=rho1_old)
                rho2 = eos(alpha, p, T2, m2, rho2.name).replace(
                    old=rho2_old)

        turb_perf = {}
        if turb is not None:
            ur_f = U1.data - U2.data
            ur_mag_f = jnp.linalg.norm(ur_f, axis=-1) + 1e-12
            k_drag_f = drag_k(
                drag_name if drag_name != "segregated"
                else "SchillerNaumann", drag_d, alpha.data, rho2.data,
                m2.mu(T2.data), spec1.d, ur_mag_f, rho_d=rho1.data,
                sigma=sigma_st, g_mag=g_mag)
            cdre_f = cd_re(k_drag_f, alpha.data, m2.mu(T2.data),
                           spec1.d)
            core = {k: turb_state[k] for k in ("k", "epsilon", "ct2")}
            core, nut1_n, nut2_n, turb_perf = turb.correct(
                mesh, core, alpha, U1, U2, rho1, rho2, phi1, phi2,
                k_drag_f, cdre_f, spec1.d,
                m2.mu(T2.data) / rho2.data, m1.mu(T1.data) / rho1.data,
                dt)
            turb_state = {**core, "nut1": nut1_n, "nut2": nut2_n}

        co_mean, co_max = courant_number(mesh, phi, dt)
        stats = dict(
            p_perf=tuple(p_perf_all), co=(co_mean, co_max),
            alpha=(alpha.data.min(), alpha.data.max(),
                   gsum(alpha.data * mesh.V)),
            ur_max=jnp.abs(U1.data - U2.data).max(),
            turb=turb_perf,
            p_minmax=(p.data.min(), p.data.max()))
        return (alpha, U1, U2, p, T1, T2, rho1, rho2, phi1, phi2, dgdt,
                turb_state, stats)

    return step


def _read_kinetic_theory(case: Case, phase1: str):
    """KTConfig when constant/turbulenceProperties.<phase1> selects
    RASModel kineticTheory (reference: the dispersed-phase
    phaseCompressibleTurbulenceModel); None otherwise."""
    import os as _os
    path = _os.path.join(case.dir, "constant",
                         f"turbulenceProperties.{phase1}")
    if not _os.path.isfile(path):
        return None
    d = parse_file(path)
    ras = d.subdict("RAS", required=False)
    if ras is None or str(ras.word("RASModel", "laminar")) \
            != "kineticTheory":
        return None
    from ..models.kinetictheory import read_kt_config
    return read_kt_config(ras.subdict("kineticTheoryCoeffs",
                                      required=False))


def run(case_dir: str, write: bool = True, max_steps: int | None = None):
    case = Case(case_dir)
    mesh = case.mesh
    setup = _read_setup(case)
    names, specs, closures, m1, m2, p_min, g = setup
    info(f"Eulerian phases: {names[0]} (d={specs[0].d}) dispersed in "
         f"{names[1]}; drag={closures['drag'][0]}\n")

    alpha = case.read_field(f"alpha.{names[0]}")
    U1 = case.read_field(f"U.{names[0]}")
    U2 = case.read_field(f"U.{names[1]}")
    p = case.read_field("p")
    tname1 = f"T.{names[0]}" if case.field_exists(f"T.{names[0]}") \
        else "T"
    if case.field_exists(tname1):
        T1 = case.read_field(tname1)
        T2 = case.read_field(
            f"T.{names[1]}" if case.field_exists(f"T.{names[1]}")
            else tname1)
    else:
        T1 = p.replace(data=jnp.full_like(p.data, 300.0),
                       bvalues=jnp.full_like(p.bvalues, 300.0),
                       dims=DimensionSet.of(0, 0, 0, 1), name="T")
        T2 = T1
    phi1 = fvc.flux(mesh, U1)
    phi2 = fvc.flux(mesh, U2)
    rho1 = alpha.with_calculated_bcs(
        m1.rho(p.data, T1.data), m1.rho(p.bvalues, T1.bvalues),
        DimensionSet.of(1, -3), f"rho.{names[0]}")
    rho2 = alpha.with_calculated_bcs(
        m2.rho(p.data, T2.data), m2.rho(p.bvalues, T2.bvalues),
        DimensionSet.of(1, -3), f"rho.{names[1]}")
    dgdt = jnp.zeros_like(alpha.data)
    ctrl = PimpleControl(case)
    from ..models.phaseturbulence import make_phase_turbulence
    vm_d = closures["virtual_mass"][1]
    cvm = float(vm_d.scalar("Cvm", 0.5)) \
        if vm_d is not None else (0.5 if closures["virtual_mass"][0]
                                  not in ("none", None) else 0.0)
    turb = make_phase_turbulence(case, names, cvm=cvm)
    if turb is not None:
        info(f"Selecting phase turbulence model {turb.name}\n")
        turb_state = turb.init_state(case)
        turb_state = {**turb_state,
                      "nut1": jnp.zeros_like(alpha.data),
                      "nut2": jnp.zeros_like(alpha.data)}
    else:
        turb_state = {"nut1": jnp.zeros_like(alpha.data),
                      "nut2": jnp.zeros_like(alpha.data)}
    kt = _read_kinetic_theory(case, names[0])
    if kt is not None:
        info("Selecting turbulence model kineticTheory for phase "
             f"{names[0]} (equilibrium "
             f"{'on' if kt.equilibrium else 'off'})\n")
        turb_state = {**turb_state,
                      "kt_theta": jnp.zeros_like(alpha.data),
                      "kt_pprime_f": jnp.zeros_like(mesh.mag_sf)}
    step = make_step(case, setup, ctrl, turb=turb, kt=kt)
    timer = ExecutionTimer()

    info("\nStarting time loop\n")
    n = 0
    while case.time.run():
        case.time.increment()
        info(f"Time = {case.time.name}\n")
        (alpha, U1, U2, p, T1, T2, rho1, rho2, phi1, phi2, dgdt,
         turb_state, stats) = step(alpha, U1, U2, p, T1, T2, rho1,
                                   rho2, phi1, phi2, dgdt, turb_state,
                                   case.time.delta_t)
        co_mean, co_max = stats["co"]
        log_courant(co_mean, co_max)
        a_min, a_max, a_int = stats["alpha"]
        info(f"alpha.{names[0]} volume fraction = "
             f"{float(a_int) / float(mesh.V.sum()):.8g}  "
             f"Min = {float(a_min):.6g}  Max = {float(a_max):.6g}")
        for perf in stats["p_perf"]:
            log_solve(case.solver_controls('p').solver, "p",
                      perf[0], perf[1], perf[2])
        for tname, perf in stats.get("turb", {}).items():
            log_solve(case.solver_controls(tname).solver, tname,
                      perf[0], perf[1], perf[2])
        timer.log()
        if write and case.time.write_time():
            case.write_fields([alpha, U1.replace(name=f"U.{names[0]}"),
                               U2.replace(name=f"U.{names[1]}"), p])
        n += 1
        if max_steps and n >= max_steps:
            break
    info("End\n")
    return case, alpha, U1, U2, p, phi1, phi2


def main(argv=None):
    import argparse
    ap = argparse.ArgumentParser(
        description="twoPhaseEulerFoam (rapidcfd_tpu)")
    ap.add_argument("-case", dest="case", default=".")
    ap.add_argument("-noWrite", action="store_true")
    args = ap.parse_args(argv)
    run(args.case, write=not args.noWrite)


if __name__ == "__main__":
    main()
