"""potentialFreeSurfaceFoam — single-phase free-surface flow via a
dynamic wave-pressure boundary.

Capability parity with the reference solver (reference:
applications/solvers/multiphase/potentialFreeSurfaceFoam/
potentialFreeSurfaceFoam.C + waveSurfacePressureFvPatchScalarField.C:
updateCoeffs): the free surface is not meshed — a wave-height field
zeta on the freeSurface patch integrates dzeta = dt*n*phi/magSf each
step and the dynamic pressure BC imposes p_gh = -g & zeta.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from ..fields.bcs import FixedValue
from ..fields.field import Dimensioned, SurfaceField, VolField
from ..linalg import solve
from ..ops import fvc, fvm
from ..utils.dictionary import parse_file
from ..utils.logging import (ExecutionTimer, info, log_continuity,
                             log_courant, log_solve)
from ..utils.registry import register
from .case import Case
from .controls import PimpleControl
from .icofoam import continuity_errors, courant_number


@register("fvPatchField", "waveSurfacePressure")
class WaveSurfacePressure(FixedValue):
    """Dynamic free-surface pressure p_gh = -g & zeta; the solver
    integrates zeta from the patch flux and refreshes bd['value']."""


def run(case_dir: str, write: bool = True, max_steps: int | None = None,
        dym: bool = False):
    """dym=True gives potentialFreeSurfaceDyMFoam (reference:
    multiphase/potentialFreeSurfaceFoam/potentialFreeSurfaceDyMFoam/):
    mesh.update() each step, PIMPLE on the relative flux."""
    case = Case(case_dir)
    mesh = case.mesh
    dyn = None
    if dym:
        from ..models.dynamicmesh import make_dynamic_mesh
        dyn = make_dynamic_mesh(case)
    tp = case.transport_properties()
    nu = Dimensioned.from_entry(tp.lookup("nu", required=True), "nu")
    gpath = os.path.join(case.dir, "constant", "g")
    g = jnp.asarray([float(x) for x in parse_file(gpath).lookup("value")]
                    if os.path.isfile(gpath) else [0.0, -9.81, 0.0])

    U = case.read_field("U")
    p_gh = case.read_field("p_gh")
    phi = jax.jit(lambda u: fvc.flux(mesh, u))(U)
    # wave-height vector per boundary face (nonzero only on
    # waveSurfacePressure patches)
    zeta = jnp.zeros((mesh.n_boundary, 3), U.data.dtype)
    wave_patches = [mesh.patches[bc.patch] for bc in p_gh.bcs
                    if isinstance(bc, WaveSurfacePressure)]
    if not wave_patches:
        info("warning: no waveSurfacePressure patch on p_gh\n")

    ctrl = PimpleControl(case)
    div_u = case.div_scheme("div(phi,U)")
    lap_corr = case.laplacian_scheme()
    u_controls = case.solver_controls("U")
    p_controls = case.solver_controls("p_gh")
    p_final = case.solver_controls("p_gh", final=True)
    n_outer, n_corr = ctrl.n_outer, ctrl.n_correctors
    n_non_orth = ctrl.n_non_orth
    p_ref_cell, p_ref_value = ctrl.p_ref_cell, ctrl.p_ref_value

    @jax.jit
    def _step(mesh, U: VolField, p_gh: VolField, phi: SurfaceField,
              zeta, dt, mesh_phi, mesh_ub):
        U = U.store_old()

        # waveSurfacePressure updateCoeffs: zeta += dt*n*phi_p/magSf,
        # then p_gh |patch = -g & zeta (Euler form)
        for patch in wave_patches:
            sl = slice(patch.start, patch.start + patch.size)
            bsl = slice(patch.bstart, patch.bstart + patch.size)
            n = mesh.patch_normals(patch)
            dz = (dt * phi.data[sl] / mesh.patch_mag_sf(patch))[:, None] \
                * n
            zeta = zeta.at[bsl].add(dz)
        # refresh bcdata values (static structure, dynamic leaves)
        new_bcdata = []
        for bc, bd in zip(p_gh.bcs, p_gh.bcdata):
            if isinstance(bc, WaveSurfacePressure):
                patch = mesh.patches[bc.patch]
                bsl = slice(patch.bstart, patch.bstart + patch.size)
                nbd = dict(bd)
                nbd["value"] = -(zeta[bsl] * g).sum(-1)
                new_bcdata.append(nbd)
            else:
                new_bcdata.append(bd)
        p_gh = p_gh.replace(bcdata=tuple(new_bcdata)) \
            .correct_boundary_conditions(mesh)

        u_perf = None
        p_perf_all = []
        for outer in range(n_outer):
            UEqn = (fvm.ddt(mesh, U, dt)
                    + fvm.div(mesh, phi, U, div_u)
                    - fvm.laplacian(mesh, nu, U, lap_corr))
            U, u_perf = solve(mesh, UEqn == (-fvc.grad(mesh, p_gh)),
                              u_controls, env={"phi": phi})
            for corr in range(n_corr):
                UEqn_c = UEqn.replace(psi=U)
                rAU = 1.0 / UEqn_c.A(mesh)
                HbyA = fvc.constrain_hbya(mesh, rAU * UEqn_c.H(mesh), U)
                phi_hbya = fvc.flux(mesh, HbyA)
                if dym:
                    # fvc::makeRelative(phiHbyA, U)
                    phi_hbya = SurfaceField(phi_hbya.data - mesh_phi,
                                            phi_hbya.dims, "phiHbyA")
                for north in range(n_non_orth + 1):
                    final = (outer == n_outer - 1 and corr == n_corr - 1
                             and north == n_non_orth)
                    pEqn = fvm.laplacian(mesh, rAU, p_gh, lap_corr) \
                        == fvc.div(mesh, phi_hbya)
                    pEqn = pEqn.set_reference(p_ref_cell, p_ref_value)
                    p_gh, p_perf = solve(
                        mesh, pEqn, p_final if final else p_controls)
                    p_perf_all.append(p_perf[0])
                phi = phi_hbya - pEqn.replace(psi=p_gh).flux(mesh)
                U_star = HbyA - rAU * fvc.grad(mesh, p_gh)
                U = U.replace(data=U_star.data) \
                    .correct_boundary_conditions(mesh, env={"phi": phi})

        local_err, glob_err = continuity_errors(mesh, phi)
        co = courant_number(mesh, phi, dt)
        stats = dict(u_perf=u_perf, p_perf=tuple(p_perf_all),
                     cont=(local_err, glob_err), co=co,
                     zeta_max=jnp.abs(zeta).max())
        return U, p_gh, phi, zeta, stats

    from ..linalg.precompute import attach_solver_layouts
    mesh0 = jax.device_put(attach_solver_layouts(
        mesh, (p_controls, p_final), case=case))

    def step(mesh_new, U, p_gh, phi, zeta, dt, mesh_phi, mesh_ub):
        import dataclasses as _dc
        m2 = _dc.replace(mesh_new, band=mesh0.band, gamg=mesh0.gamg)
        return _step(m2, U, p_gh, phi, zeta, dt, mesh_phi, mesh_ub)

    timer = ExecutionTimer()
    cumulative_err = 0.0
    info("\nStarting time loop\n")
    n = 0
    zf = jnp.zeros(mesh.n_faces, mesh.V.dtype)
    zb = jnp.zeros((mesh.n_boundary, 3), mesh.C.dtype)
    while case.time.loop():
        info(f"Time = {case.time.name}\n")
        if dyn is not None:
            mesh, mesh_phi, mesh_ub = dyn.update(case.time.value)
            case.mesh = mesh
            # fvc::makeRelative(phi, U)
            phi = SurfaceField(phi.data - mesh_phi, phi.dims, "phi")
        else:
            mesh_phi, mesh_ub = zf, zb
        U, p_gh, phi, zeta, stats = step(mesh, U, p_gh, phi, zeta,
                                         case.time.delta_t, mesh_phi,
                                         mesh_ub)
        if dyn is not None:
            # fvc::makeAbsolute for output/restart
            phi = SurfaceField(phi.data + mesh_phi, phi.dims, "phi")
        log_courant(*stats["co"])
        for cmpt, perf in zip("xyz", stats["u_perf"]):
            log_solve(u_controls.solver, f"U{cmpt}", perf[0], perf[1],
                      perf[2])
        for perf in stats["p_perf"]:
            log_solve(p_controls.solver, "p_gh", perf[0], perf[1],
                      perf[2])
        info(f"max|zeta| = {float(stats['zeta_max']):.6g}")
        local_err, glob_err = stats["cont"]
        cumulative_err += float(glob_err)
        log_continuity(cumulative_err, local_err, glob_err)
        timer.log()
        if write and case.time.write_time():
            case.write_fields([U, p_gh])
        n += 1
        if max_steps and n >= max_steps:
            break
    info("End\n")
    return case, U, p_gh, phi, zeta
