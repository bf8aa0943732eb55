"""interMixingFoam — three-phase VOF: one immiscible phase (alpha1)
captured with compressed MULES against two miscible phases (alpha2,
alpha3) that inter-diffuse with diffusivity D23.

Capability parity with the reference solver (reference:
applications/solvers/multiphase/interFoam/interMixingFoam/
interMixingFoam.C with alphaEqns.H (shared MULES limiter across alpha1
and alpha2, implicit D23 diffusion of alpha2),
incompressibleThreePhaseMixture/ and threePhaseInterfaceProperties/
(CSF with sigma = (a2*sigma12 + a3*sigma13)/(a2+a3) on the alpha1
interface)).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from ..fields.field import Dimensioned, SurfaceField, VolField
from ..linalg import solve
from ..linalg.solvers import gsum
from ..ops import fvc, fvm
from ..ops.mules import bounded_flux, limiter
from ..utils.dictionary import parse_file
from ..utils.dimensions import DimensionSet, dim_density
from ..utils.logging import (ExecutionTimer, info, log_continuity,
                             log_courant, log_solve)
from .case import Case
from .controls import PimpleControl
from .icofoam import courant_number

_DELTA_N = 1e-8


def _read_constants(case: Case):
    tp = case.transport_properties()
    phases = tp.lookup("phases")
    names = [str(x) for x in phases] if phases else \
        ["phase1", "phase2", "phase3"]
    ds = []
    for i, nm in enumerate(names):
        d = tp.subdict(nm, required=False) \
            or tp.subdict(f"phase{i + 1}")
        ds.append((Dimensioned.from_entry(d.lookup("rho",
                                                   required=True)).value,
                   Dimensioned.from_entry(d.lookup("nu",
                                                   required=True)).value))
    d23 = Dimensioned.from_entry(tp.lookup("D23", required=True)).value
    s12 = Dimensioned.from_entry(tp.lookup("sigma12",
                                           required=True)).value
    s13 = Dimensioned.from_entry(tp.lookup("sigma13",
                                           required=True)).value
    gpath = os.path.join(case.dir, "constant", "g")
    if os.path.isfile(gpath):
        g = [float(x) for x in parse_file(gpath).lookup("value")]
    else:
        g = [0.0, -9.81, 0.0]
    return names, ds, d23, s12, s13, g


def make_step(case: Case, consts, ctrl: PimpleControl):
    mesh = case.mesh
    names, ds, d23, s12, s13, g = consts
    (rho1, nu1), (rho2, nu2), (rho3, nu3) = ds
    solvers_d = case.fv_solution.subdict("solvers")
    a_d = (solvers_d.lookup(f"alpha.{names[0]}")
           or solvers_d.lookup("alpha1"))
    c_alpha = float(a_d.scalar("cAlpha", 1.0)) if a_d else 1.0
    lap_corr = case.laplacian_scheme()
    p_controls = case.solver_controls("p_rgh")
    p_final = case.solver_controls("p_rgh", final=True)
    a2_controls = case.solver_controls("alpha2", final=True)
    n_corr = ctrl.n_correctors
    n_non_orth = ctrl.n_non_orth
    p_ref_cell, p_ref_value = ctrl.p_ref_cell, ctrl.p_ref_value
    gh = (mesh.C * jnp.asarray(g, mesh.C.dtype)).sum(-1)
    ghf = (mesh.Cf * jnp.asarray(g, mesh.C.dtype)).sum(-1)

    def mixture(a1, a2):
        a3 = 1.0 - a1.data - a2.data
        a3b = 1.0 - a1.bvalues - a2.bvalues
        rho_d = a1.data * rho1 + a2.data * rho2 + a3 * rho3
        rho_b = a1.bvalues * rho1 + a2.bvalues * rho2 + a3b * rho3
        rho = a1.with_calculated_bcs(rho_d, rho_b, dim_density, "rho")
        mu_d = (a1.data * rho1 * nu1 + a2.data * rho2 * nu2
                + a3 * rho3 * nu3)
        mu_b = (a1.bvalues * rho1 * nu1 + a2.bvalues * rho2 * nu2
                + a3b * rho3 * nu3)
        mu = a1.with_calculated_bcs(mu_d, mu_b,
                                    DimensionSet.of(1, -1, -1), "mu")
        return rho, mu

    def sigma_kappa_snalpha(a1, a2):
        """threePhaseInterfaceProperties: CSF on the alpha1 interface
        with the alpha2/alpha3-weighted sigma."""
        a2l = jnp.clip(a2.data, 0.0, 1.0)
        a3l = jnp.clip(1.0 - a1.data - a2.data, 0.0, 1.0)
        sigma = (a2l * s12 + a3l * s13) / (a2l + a3l + 1e-6)
        g_a = fvc.grad(mesh, a1)
        gf = fvc.face_values(mesh, g_a)
        mag = jnp.linalg.norm(gf, axis=-1) + _DELTA_N
        nhatf = (gf / mag[:, None] * mesh.Sf).sum(-1)
        kappa = -fvc.surface_sum_faces(mesh, nhatf) / mesh.V
        sk = a1.with_calculated_bcs(
            sigma * kappa, jnp.zeros_like(a1.bvalues),
            DimensionSet.of(1, -1, -2), "sigmaK")
        sk_f = fvc.face_values(mesh, sk)
        sng = fvc.sn_grad(mesh, a1)
        return sk_f * sng.data, nhatf

    @jax.jit
    def step(a1: VolField, a2: VolField, U: VolField, p_rgh: VolField,
             phi: SurfaceField, dt):
        U = U.store_old()
        a1 = a1.store_old()
        a2 = a2.store_old()

        # ---- alphaEqns.H: shared-lambda MULES for alpha1/alpha2
        _, nhatf = sigma_kappa_snalpha(a1, a2)
        phir = c_alpha * jnp.abs(phi.data) \
            / jnp.maximum(mesh.mag_sf, 1e-30) * nhatf
        phir = phir.at[mesh.n_internal:].set(0.0)
        a3 = a1.replace(data=1.0 - a1.data - a2.data,
                        bvalues=1.0 - a1.bvalues - a2.bvalues, old=None)

        # phiAlpha1: advect a1 with compression against both a2 and a3
        a1_f = fvc.face_values(mesh, a1, "vanLeer", phi)
        phir_sf = SurfaceField(phir, phi.dims, "phir")
        m_phir = SurfaceField(-phir, phi.dims, "-phir")
        f2 = -(m_phir.data * fvc.face_values(mesh, a2, "vanLeer",
                                             m_phir))
        f3 = -(m_phir.data * fvc.face_values(mesh, a3, "vanLeer",
                                             m_phir))
        a1_c2 = fvc.face_values(mesh, a1, "vanLeer",
                                SurfaceField(f2, phi.dims, "f2"))
        a1_c3 = fvc.face_values(mesh, a1, "vanLeer",
                                SurfaceField(f3, phi.dims, "f3"))
        phi_a1 = SurfaceField(phi.data * a1_f + f2 * a1_c2
                              + f3 * a1_c3, phi.dims, "phiAlpha1")
        # phiAlpha2: advect a2 with compression against a1 only
        a2_f = fvc.face_values(mesh, a2, "vanLeer", phi)
        f1 = phir * fvc.face_values(mesh, a1, "vanLeer", phir_sf)
        a2_c1 = fvc.face_values(mesh, a2, "vanLeer",
                                SurfaceField(-f1, phi.dims, "mf1"))
        phi_a2 = SurfaceField(phi.data * a2_f - f1 * a2_c1, phi.dims,
                              "phiAlpha2")

        bd1, corr1 = bounded_flux(mesh, a1, phi, phi_a1)
        bd2, corr2 = bounded_flux(mesh, a2, phi, phi_a2)
        td1 = a1.data - dt / mesh.V * fvc.surface_sum_faces(mesh, bd1)
        td2 = a2.data - dt / mesh.V * fvc.surface_sum_faces(mesh, bd2)
        lam = jnp.minimum(limiter(mesh, td1, corr1, dt),
                          limiter(mesh, td2, corr2, dt))
        phi_a1l = bd1 + lam * corr1
        phi_a2l = bd2 + lam * corr2
        a1 = a1.replace(
            data=a1.data - dt / mesh.V
            * fvc.surface_sum_faces(mesh, phi_a1l)) \
            .correct_boundary_conditions(mesh)

        # alpha2: explicit limited advection + implicit D23 diffusion
        # (reference: alphaEqns.H alpha2Eqn)
        dc23 = d23 * jnp.maximum(a3.data, 0.0) \
            * jnp.where(a2.data > 0.0, 1.0, 0.0)
        dc32 = d23 * jnp.maximum(a2.data, 0.0) \
            * jnp.where(a3.data > 0.0, 1.0, 0.0)
        sng1 = fvc.sn_grad(mesh, a1).data
        dc32_f = fvc.face_values(
            mesh, a1.with_calculated_bcs(
                dc32, jnp.zeros_like(a1.bvalues),
                DimensionSet.of(0, 2, -1), "Dc32"))
        phi_a2l = phi_a2l - dc32_f * mesh.mag_sf * sng1
        a2_adv = a2.replace(
            data=a2.data - dt / mesh.V
            * fvc.surface_sum_faces(mesh, phi_a2l))
        # ddt pair pinned to the advected state (as twoLiquidMixingFoam)
        a2_adv2 = a2_adv.replace(old=a2_adv.replace(old=None))
        dsum = a1.with_calculated_bcs(
            dc23 + dc32, jnp.zeros_like(a1.bvalues),
            DimensionSet.of(0, 2, -1), "D")
        a2Eqn = fvm.ddt(mesh, a2_adv2, dt) \
            - fvm.laplacian(mesh, dsum, a2_adv2, lap_corr)
        a2, a2_perf = solve(mesh, a2Eqn, a2_controls)
        dflux = a2Eqn.replace(psi=a2).flux(mesh)

        rho_phi = SurfaceField(
            phi_a1l * (rho1 - rho3)
            + (phi_a2l + dflux.data) * (rho2 - rho3) + phi.data * rho3,
            phi.dims * dim_density, "rhoPhi")
        rho, mu = mixture(a1, a2)
        rho_old, _ = mixture(a1.old, a2.old)
        rho = rho.replace(old=rho_old.replace(old=None))

        # ---- UEqn.H (as interFoam)
        mu_f = Dimensioned("muf", DimensionSet.of(1, -1, -1),
                           fvc.face_values(mesh, mu))
        UEqn = (fvm.ddt(mesh, U, dt, coeff=rho)
                + fvm.div(mesh, rho_phi, U, "linearUpwind")
                - fvm.laplacian(mesh, mu_f, U, lap_corr))

        p_perf_all = []
        for corr in range(n_corr):
            UEqn_c = UEqn.replace(psi=U) if corr else UEqn
            rAU = 1.0 / UEqn_c.A(mesh)
            rAU_f = fvc.face_values(mesh, rAU)
            HbyA = fvc.constrain_hbya(mesh, rAU * UEqn_c.H(mesh), U)
            phi_hbya = fvc.flux(mesh, HbyA)
            csf, _ = sigma_kappa_snalpha(a1, a2)
            sng_rho = fvc.sn_grad(mesh, rho)
            phig = (csf - ghf * sng_rho.data) * rAU_f * mesh.mag_sf
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
            flux_p = pEqn.replace(psi=p_rgh).flux(mesh)
            phi = SurfaceField(phi_hbya.data - flux_p.data, phi.dims,
                               "phi")
            corr_f = SurfaceField(
                (phig - flux_p.data) / jnp.maximum(rAU_f, 1e-30),
                phi.dims / rAU.dims, "corrF")
            U_star = HbyA + rAU * fvc.reconstruct(mesh, corr_f)
            U = U.replace(data=U_star.data) \
                 .correct_boundary_conditions(mesh)

        local_err = gsum(jnp.abs(fvc.div(mesh, phi).data) * mesh.V)
        glob_err = gsum(fvc.div(mesh, phi).data * mesh.V)
        co_mean, co_max = courant_number(mesh, phi, dt)
        stats = dict(p_perf=tuple(p_perf_all),
                     cont=(local_err, glob_err),
                     co=(co_mean, co_max),
                     a1=(a1.data.min(), a1.data.max(),
                         gsum(a1.data * mesh.V)),
                     a2=(a2.data.min(), a2.data.max(),
                         gsum(a2.data * mesh.V)))
        return a1, a2, U, p_rgh, phi, stats

    return step


def run(case_dir: str, write: bool = True, max_steps: int | None = None):
    case = Case(case_dir)
    mesh = case.mesh
    consts = _read_constants(case)
    names = consts[0]
    info(f"Three phases: {names} D23={consts[2]}\n")

    def fname(i):
        cand = f"alpha.{names[i]}"
        return cand if case.field_exists(cand) else f"alpha{i + 1}"

    a1 = case.read_field(fname(0))
    a2 = case.read_field(fname(1))
    U = case.read_field("U")
    p_rgh = case.read_field("p_rgh")
    phi = fvc.flux(mesh, U)
    ctrl = PimpleControl(case)
    step = make_step(case, consts, ctrl)
    timer = ExecutionTimer()
    cumulative_err = 0.0

    info("\nStarting time loop\n")
    n = 0
    while case.time.run():
        case.time.increment()
        info(f"Time = {case.time.name}\n")
        a1, a2, U, p_rgh, phi, stats = step(a1, a2, U, p_rgh, phi,
                                            case.time.delta_t)
        co_mean, co_max = stats["co"]
        log_courant(co_mean, co_max)
        for key, lbl in (("a1", "Air"), ("a2", "Liquid")):
            mn, mx, it = stats[key]
            info(f"{lbl} phase volume fraction = "
                 f"{float(it) / float(mesh.V.sum()):.8g}  "
                 f"Min = {float(mn):.6g}  Max = {float(mx):.6g}")
        for perf in stats["p_perf"]:
            log_solve(case.solver_controls('p_rgh').solver, "p_rgh",
                      perf[0], perf[1], perf[2])
        local_err, glob_err = stats["cont"]
        cumulative_err += float(glob_err)
        log_continuity(cumulative_err, local_err, glob_err)
        timer.log()
        if write and case.time.write_time():
            case.write_fields([a1.replace(name=fname(0)),
                               a2.replace(name=fname(1)), U, p_rgh])
        n += 1
        if max_steps and n >= max_steps:
            break
    info("End\n")
    return case, a1, a2, U, p_rgh, phi


def main(argv=None):
    import argparse
    ap = argparse.ArgumentParser(
        description="interMixingFoam (rapidcfd_tpu)")
    ap.add_argument("-case", dest="case", default=".")
    ap.add_argument("-noWrite", action="store_true")
    args = ap.parse_args(argv)
    run(args.case, write=not args.noWrite)


if __name__ == "__main__":
    main()
