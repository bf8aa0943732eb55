"""Electromagnetics solvers: electrostaticFoam, mhdFoam.

Capability parity with the reference's applications/solvers/
electromagnetics family (reference: electrostaticFoam/electrostaticFoam.C:
53-68, mhdFoam/mhdFoam.C:68-160). TPU-first: each timestep is one jitted
program; the MHD B-PISO projection reuses the same fvm/fvc primitives as
the velocity PISO.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..fields.field import Dimensioned, SurfaceField, VolField
from ..linalg import solve
from ..ops import fvc, fvm
from ..utils.dimensions import DimensionSet, dimless
from ..utils.logging import ExecutionTimer, info, log_courant, log_solve
from .case import Case
from .controls import SimpleControl
from .icofoam import continuity_errors, courant_number


def run_electrostatic_foam(case_dir: str, write: bool = True,
                           max_steps: int | None = None):
    """electrostaticFoam: laplacian(phi) == -rho/epsilon0, then charge
    transport along the drift flux -k*magSf*snGrad(phi) (reference:
    electrostaticFoam.C:57-66). 'phi' here is the electric potential."""
    case = Case(case_dir)
    mesh = case.mesh
    props = case.constant_dict("physicalProperties")
    eps0 = Dimensioned.from_entry(props.lookup("epsilon0", required=True),
                                  "epsilon0")
    k = Dimensioned.from_entry(props.lookup("k", required=True), "k")

    info("Reading field phi (potential)\n")
    pot = case.read_field("phi")
    info("Reading field rho (charge density)\n")
    rho = case.read_field("rho").store_old()

    pot_controls = case.solver_controls("phi")
    rho_controls = case.solver_controls("rho")
    try:
        div_rho = case.div_scheme("div(rhoFlux,rho)")
    except KeyError:
        div_rho = ("gauss", "upwind")
    lap_corr = case.laplacian_scheme()
    ddt_scheme = case.ddt_scheme()

    @jax.jit
    def step(pot: VolField, rho: VolField, dt):
        rho = rho.store_old()
        rhs = rho.with_calculated_bcs(
            -rho.data / eps0.value, -rho.bvalues / eps0.value,
            rho.dims / eps0.dims)
        pot_eqn = fvm.laplacian(mesh, 1.0, pot, lap_corr) == rhs
        pot, pot_perf = solve(mesh, pot_eqn, pot_controls)

        sng = fvc.sn_grad(mesh, pot)
        rho_flux = SurfaceField(-k.value * mesh.mag_sf * sng.data,
                                k.dims * DimensionSet.of(0, 2) * sng.dims,
                                "rhoFlux")
        rho_eqn = fvm.ddt(mesh, rho, dt, ddt_scheme) \
            + fvm.div(mesh, rho_flux, rho, div_rho)
        rho, rho_perf = solve(mesh, rho_eqn, rho_controls)
        return pot, rho, pot_perf, rho_perf

    timer = ExecutionTimer()
    n = 0
    while case.time.loop():
        info(f"Iteration = {case.time.name}\n")
        pot, rho, pot_perf, rho_perf = step(pot, rho, case.time.delta_t)
        log_solve(pot_controls.solver, "phi", pot_perf[0][0],
                  pot_perf[0][1], pot_perf[0][2])
        log_solve(rho_controls.solver, "rho", rho_perf[0][0],
                  rho_perf[0][1], rho_perf[0][2])
        timer.log()
        if write and case.time.write_time():
            case.write_fields([pot, rho])
        n += 1
        if max_steps and n >= max_steps:
            break
    info("End\n")
    return case, pot, rho


def run_mhd_foam(case_dir: str, write: bool = True,
                 max_steps: int | None = None):
    """mhdFoam: incompressible PISO with Lorentz coupling + B-PISO
    projection keeping div(B)=0 via the magnetic flux pressure pB
    (reference: mhdFoam.C:80-160)."""
    case = Case(case_dir)
    mesh = case.mesh
    tp = case.transport_properties()
    rho = Dimensioned.from_entry(tp.lookup("rho", required=True), "rho")
    nu = Dimensioned.from_entry(tp.lookup("nu", required=True), "nu")
    mu = Dimensioned.from_entry(tp.lookup("mu", required=True), "mu")
    sigma = Dimensioned.from_entry(tp.lookup("sigma", required=True),
                                   "sigma")
    DB = 1.0 / (mu.value * sigma.value)          # magnetic diffusivity
    DB_dims = DimensionSet.of() / (mu.dims * sigma.dims)
    DBU = 1.0 / (2.0 * mu.value * rho.value)
    DBU_d = Dimensioned("DBU", DimensionSet.of() / (mu.dims * rho.dims),
                        DBU)

    piso = case.algo_dict("PISO")
    n_corr = int(piso.scalar("nCorrectors", 1))
    n_non_orth = int(piso.scalar("nNonOrthogonalCorrectors", 0))
    p_ref_cell = int(piso.scalar("pRefCell", 0))
    p_ref_value = float(piso.scalar("pRefValue", 0.0))
    bpiso = case.algo_dict("BPISO")
    n_bcorr = int(bpiso.scalar("nCorrectors", 1))

    U = case.read_field("U")
    p = case.read_field("p")
    B = case.read_field("B")
    pB = case.read_field("pB")
    phi = jax.jit(lambda u: fvc.flux(mesh, u))(U)
    phiB = jax.jit(lambda b: fvc.flux(mesh, b))(B)

    div_u = case.div_scheme("div(phi,U)")
    div_b = case.div_scheme("div(phi,B)")
    lap_corr = case.laplacian_scheme()
    u_controls = case.solver_controls("U")
    p_controls = case.solver_controls("p")
    p_final = case.solver_controls("p", final=True)
    b_controls = case.solver_controls("B")
    pb_controls = case.solver_controls("pB")
    DB_d = Dimensioned("DB", DB_dims, DB)

    @jax.jit
    def step(U, p, phi, B, pB, phiB, dt):
        U = U.store_old()
        B = B.store_old()

        # momentum with Lorentz force: -div(phiB, 2*DBU*B)
        # + grad(DBU*|B|^2) moved to the rhs (mhdFoam.C:80-89)
        lorentz = fvc.div(mesh, phiB, B * DBU_d * 2.0)
        magB2 = fvc._extrapolated(
            mesh, DBU * (B.data ** 2).sum(-1),
            DBU_d.dims * B.dims * B.dims, "DBU*magSqr(B)")
        UEqn = (fvm.ddt(mesh, U, dt)
                + fvm.div(mesh, phi, U, div_u)
                - fvm.laplacian(mesh, nu, U, lap_corr))
        U, u_perf = solve(
            mesh, UEqn == (lorentz - fvc.grad(mesh, magB2)
                           - fvc.grad(mesh, p)),
            u_controls, env={"phi": phi})

        p_perf_all = []
        for corr in range(n_corr):
            UEqn_c = UEqn.replace(psi=U)
            rAU = 1.0 / UEqn_c.A(mesh)
            HbyA = fvc.constrain_hbya(mesh, rAU * UEqn_c.H(mesh), U)
            phi_hbya = fvc.flux(mesh, HbyA)
            p_new = p
            for north in range(n_non_orth + 1):
                final = (corr == n_corr - 1) and (north == n_non_orth)
                pEqn = fvm.laplacian(mesh, rAU, p_new, lap_corr) \
                    == fvc.div(mesh, phi_hbya)
                pEqn = pEqn.set_reference(p_ref_cell, p_ref_value)
                p_new, p_perf = solve(mesh, pEqn,
                                      p_final if final else p_controls)
                p_perf_all.append(p_perf[0])
            p = p_new
            phi = phi_hbya - pEqn.replace(psi=p).flux(mesh)
            U_star = HbyA - rAU * fvc.grad(mesh, p)
            U = U.replace(data=U_star.data).correct_boundary_conditions(
                mesh, env={"phi": phi})

        # --- B-PISO (mhdFoam.C:130-160)
        b_perf = pb_perf = None
        for _ in range(n_bcorr):
            BEqn = (fvm.ddt(mesh, B, dt)
                    + fvm.div(mesh, phi, B, div_b)
                    - fvm.laplacian(mesh, DB_d, B, lap_corr))
            B, b_perf = solve(mesh, BEqn == fvc.div(mesh, phiB, U),
                              b_controls, env={"phi": phi})
            rAB = 1.0 / BEqn.replace(psi=B).A(mesh)
            phiB_star = fvc.flux(mesh, B)
            pBEqn = fvm.laplacian(mesh, rAB, pB, lap_corr) \
                == fvc.div(mesh, phiB_star)
            pBEqn = pBEqn.set_reference(0, 0.0)
            pB, pb_perf = solve(mesh, pBEqn, pb_controls)
            phiB = phiB_star - pBEqn.replace(psi=pB).flux(mesh)

        local_err, glob_err = continuity_errors(mesh, phi)
        b_err = continuity_errors(mesh, phiB)[0]
        co = courant_number(mesh, phi, dt)
        stats = dict(u_perf=u_perf, p_perf=tuple(p_perf_all),
                     b_perf=b_perf, pb_perf=pb_perf,
                     cont=(local_err, glob_err), b_err=b_err, co=co)
        return U, p, phi, B, pB, phiB, stats

    timer = ExecutionTimer()
    info("\nStarting time loop\n")
    n = 0
    while case.time.loop():
        info(f"Time = {case.time.name}\n")
        U, p, phi, B, pB, phiB, stats = step(U, p, phi, B, pB, phiB,
                                             case.time.delta_t)
        log_courant(*stats["co"])
        for cmpt, perf in zip("xyz", stats["u_perf"]):
            log_solve(u_controls.solver, f"U{cmpt}", perf[0], perf[1],
                      perf[2])
        for perf in stats["p_perf"]:
            log_solve(p_controls.solver, "p", perf[0], perf[1], perf[2])
        info(f"magnetic flux divergence error = "
             f"{float(stats['b_err']):.6g}\n")
        timer.log()
        if write and case.time.write_time():
            case.write_fields([U, p, B, pB])
        n += 1
        if max_steps and n >= max_steps:
            break
    info("End\n")
    return case, U, p, B, phi, phiB


def run_magnetic_foam(case_dir: str, write: bool = True,
                      max_steps: int | None = None):
    """magneticFoam — magnetostatics of permanent magnets (reference:
    applications/solvers/electromagnetics/magneticFoam/magneticFoam.C:
    66-120 + magnet.H): magnets are faceZones carrying relative
    permeability mur and remanence Mr along an orientation; solve
    laplacian(murf, psi) == -div(murf*Mrf) with the magnetization flux
    Mrf = Mr*(orientation & Sf), then H = reconstruct(snGrad(psi)*magSf)
    and B = mu0*(murf H + Mr contribution)."""
    import numpy as np
    from ..mesh.polymesh import read_face_zones
    case = Case(case_dir)
    mesh = case.mesh
    tp = case.transport_properties()
    magnets_e = tp.lookup("magnets", required=True)
    # magnets ( (name mur Mr (ox oy oz)) ... )
    magnets = []
    entries = magnets_e if isinstance(magnets_e, list) else [magnets_e]
    i = 0
    flat = []
    for e in entries:
        flat.append(e)
    # entry shape: [[name, mur, Mr, [o1,o2,o3]], ...] or flattened
    for e in flat:
        if isinstance(e, list) and len(e) == 4:
            magnets.append((str(e[0]), float(e[1]), float(e[2]),
                            np.asarray(e[3], dtype=float)))
    if not magnets and len(flat) >= 4:
        magnets.append((str(flat[0]), float(flat[1]), float(flat[2]),
                        np.asarray(flat[3], dtype=float)))
    zones = read_face_zones(case.dir)
    info(f"Magnets: {[m0[0] for m0 in magnets]}\n")

    # face permeability and magnetization flux (file face order ->
    # device face order via maps)
    murf = np.ones(mesh.n_faces)
    mrf = np.zeros(mesh.n_faces)
    sf = np.asarray(mesh.Sf)
    inv_face = np.empty(mesh.n_faces, dtype=np.int64)
    inv_face[case.maps.face_perm] = np.arange(mesh.n_faces)
    for name, mur, mr, orient in magnets:
        if name not in zones:
            raise KeyError(f"magneticFoam: no faceZone '{name}' for "
                           f"magnet (constant/polyMesh/faceZones)")
        faces = inv_face[zones[name][0]]
        murf[faces] = mur
        mrf[faces] = mr * (sf[faces] * orient[None, :]).sum(-1)
    murf_j = jnp.asarray(murf)
    mrf_j = jnp.asarray(mrf)

    psi = case.read_field("psi")
    controls = case.solver_controls("psi")
    from .controls import SimpleControl
    simple = SimpleControl(case)
    lap_corr = case.laplacian_scheme()

    @jax.jit
    def solve_psi(psi):
        flux = SurfaceField(murf_j * mrf_j,
                            psi.dims * DimensionSet.of(0, 1), "murfMrf")
        perf = None
        for _ in range(simple.n_non_orth + 1):
            eqn = fvm.laplacian(
                mesh, Dimensioned("murf", dimless, murf_j), psi,
                lap_corr)
            eqn = eqn.equals(-1.0 * fvc.div(mesh, flux))
            eqn = eqn.set_reference(simple.p_ref_cell, 0.0)
            psi, perf = solve(mesh, eqn, controls)
        return psi, perf

    info("Calculating the magnetic field potential\n")
    psi, perf = solve_psi(psi)
    log_solve(controls.solver, "psi", perf[0][0], perf[0][1], perf[0][2])

    # H = reconstruct(snGrad(psi)*magSf); B = mu0*(mur H + M)
    mu0 = 4e-7 * 3.141592653589793
    sng = fvc.sn_grad(mesh, psi)
    H = fvc.reconstruct(mesh, SurfaceField(
        sng.data * mesh.mag_sf, sng.dims * DimensionSet.of(0, 2), "Hf"))
    B = fvc.reconstruct(mesh, SurfaceField(
        mu0 * murf_j * (sng.data * mesh.mag_sf + mrf_j),
        sng.dims * DimensionSet.of(0, 2) * DimensionSet.of(1, 1, -2, 0, 0,
                                                           -1), "Bf"))
    if write:
        case.time.increment()
        case.write_fields([psi, H.replace(name="H"), B.replace(name="B")])
    info("End\n")
    return case, psi, H, B
