"""shallowWaterFoam — inviscid shallow-water equations (PIMPLE).

Capability parity with the reference solver (reference:
applications/solvers/incompressible/shallowWaterFoam/shallowWaterFoam.C:
60-170): momentum hU with free-surface forcing -g*h*grad(h+h0),
height-correction equation ddt(h) + div(phiHbyA) - laplacian(g h rAU, h),
optional rotating frame (Coriolis F = (2 Omega . gHat) gHat).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..fields.field import Dimensioned, SurfaceField, VolField
from ..linalg import solve
from ..ops import fvc, fvm
from ..utils.dimensions import DimensionSet
from ..utils.logging import (ExecutionTimer, info, log_courant, log_solve)
from .case import Case
from .controls import PimpleControl
from .icofoam import courant_number


def run(case_dir: str, write: bool = True, max_steps: int | None = None):
    case = Case(case_dir)
    mesh = case.mesh
    gp = case.constant_dict("gravitationalProperties")

    def _vec3(entry):  # plain "(a b c)" or dimensioned "g [dims] (a b c)"
        v = entry[-1] if isinstance(entry, tuple) else entry
        return [float(x) for x in v]

    g = _vec3(gp.lookup("g", required=True))
    rotating = str(gp.word("rotating", "off")) in ("on", "true", "yes")
    magg = float(jnp.linalg.norm(jnp.asarray(g)))
    ghat = jnp.asarray(g) / magg
    if rotating:
        om = _vec3(gp.lookup("Omega", required=True))
        F = (2.0 * (jnp.asarray(om) * ghat).sum()) * ghat
    else:
        F = jnp.zeros(3)

    h = case.read_field("h")
    if case.field_exists("h0"):
        h0 = case.read_field("h0")
    else:
        h0 = h.replace(data=jnp.zeros_like(h.data),
                       bvalues=jnp.zeros_like(h.bvalues), name="h0")
    hU = case.read_field("hU")

    ctrl = PimpleControl(case)
    div_hu = case.div_scheme("div(phiv,hU)")
    lap_corr = case.laplacian_scheme()
    ddt_scheme = case.ddt_scheme()
    hu_controls = case.solver_controls("hU")
    h_controls = case.solver_controls("h")
    h_final = case.solver_controls("h", final=True)
    n_outer = ctrl.n_outer
    n_corr = ctrl.n_correctors
    n_non_orth = ctrl.n_non_orth
    momentum_predictor = ctrl.momentum_predictor
    _DIMG = DimensionSet.of(0, 1, -2)

    phi = jax.jit(lambda u: fvc.flux(mesh, u))(hU)

    @jax.jit
    def step(h: VolField, hU: VolField, phi: SurfaceField, dt):
        h = h.store_old()
        hU = hU.store_old()
        hu_perf = h_perf = None
        for outer in range(n_outer):
            h_f = fvc.face_values(mesh, h)
            phiv = SurfaceField(phi.data / h_f, phi.dims / h.dims, "phiv")
            hUEqn = fvm.ddt(mesh, hU, dt, ddt_scheme) \
                + fvm.div(mesh, phiv, hU, div_hu)
            g_h = h * Dimensioned("magg", _DIMG, magg)
            grad_htot = fvc.grad(mesh, h + h0)
            if momentum_predictor:
                rhs = -1.0 * (g_h * grad_htot)
                if rotating:
                    cor = jnp.cross(jnp.broadcast_to(F, hU.data.shape),
                                    hU.data)
                    rhs = rhs.replace(data=rhs.data - cor)
                hU, hu_perf = solve(mesh, hUEqn == rhs, hu_controls)

            for corr in range(n_corr):
                hUEqn_c = hUEqn.replace(psi=hU)
                rAU = 1.0 / hUEqn_c.A(mesh)
                gh_rau_f = magg * fvc.face_values(mesh, h * rAU)
                phi_h0 = gh_rau_f * mesh.mag_sf \
                    * fvc.sn_grad(mesh, h0).data
                H = hUEqn_c.H(mesh)
                if rotating:
                    cor = jnp.cross(jnp.broadcast_to(F, hU.data.shape),
                                    hU.data)
                    H = H.replace(data=H.data - cor)
                HbyA = fvc.constrain_hbya(mesh, rAU * H, hU)
                phi_hbya = SurfaceField(
                    fvc.flux(mesh, HbyA).data - phi_h0,
                    phi.dims, "phiHbyA")
                gh_rau = (h * rAU) * Dimensioned("magg", _DIMG, magg)
                for north in range(n_non_orth + 1):
                    final = (outer == n_outer - 1
                             and corr == n_corr - 1 and north == n_non_orth)
                    hEqn = fvm.ddt(mesh, h, dt, ddt_scheme) \
                        - fvm.laplacian(mesh, gh_rau, h, lap_corr)
                    hEqn = hEqn.equals(-fvc.div(mesh, phi_hbya))
                    h, h_perf = solve(mesh, hEqn,
                                      h_final if final else h_controls)
                phi = phi_hbya - hEqn.replace(psi=h).flux(mesh)
                hU_star = HbyA - rAU * (
                    (h * Dimensioned("magg", _DIMG, magg))
                    * fvc.grad(mesh, h + h0))
                hU = hU.replace(data=hU_star.data) \
                    .correct_boundary_conditions(mesh)
        co = courant_number(mesh, phi / fvc.interpolate(mesh, h), dt)
        return h, hU, phi, dict(hu_perf=hu_perf, h_perf=h_perf, co=co)

    timer = ExecutionTimer()
    info("\nStarting time loop\n")
    n = 0
    while case.time.loop():
        info(f"Time = {case.time.name}\n")
        h, hU, phi, stats = step(h, hU, phi, case.time.delta_t)
        log_courant(*stats["co"])
        if stats["hu_perf"] is not None:
            for cmpt, perf in zip("xyz", stats["hu_perf"]):
                log_solve(hu_controls.solver, f"hU{cmpt}", perf[0],
                          perf[1], perf[2])
        log_solve(h_controls.solver, "h", stats["h_perf"][0][0],
                  stats["h_perf"][0][1], stats["h_perf"][0][2])
        timer.log()
        if write and case.time.write_time():
            U = hU / h
            hTotal = (h + h0).replace(name="hTotal")
            case.write_fields([h, hU, U.replace(name="U"), hTotal])
        n += 1
        if max_steps and n >= max_steps:
            break
    info("End\n")
    return case, h, hU, phi
