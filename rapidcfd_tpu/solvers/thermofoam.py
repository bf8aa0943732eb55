"""thermoFoam — energy evolution on a frozen flow field.

Capability parity with the reference solver (reference:
applications/solvers/heatTransfer/thermoFoam/thermoFoam.C + EEqn.H):
solves ddt(rho,h) + div(phi,h) - laplacian(alphaEff,h) with rho/U/phi
read from the case and held fixed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..fields.field import Dimensioned, SurfaceField
from ..linalg import solve
from ..models.thermo import PsiThermo, read_thermo
from ..ops import fvc, fvm
from ..utils.dimensions import DimensionSet, dim_density
from ..utils.logging import ExecutionTimer, info, log_solve
from .case import Case


def run(case_dir: str, write: bool = True, max_steps: int | None = None):
    case = Case(case_dir)
    mesh = case.mesh
    m = read_thermo(case.constant_dict("thermophysicalProperties"))
    thermo = PsiThermo(case, m)

    p = case.read_field("p")
    T = case.read_field("T")
    U = case.read_field("U")
    rho = T.with_calculated_bcs(m.rho(p.data, T.data),
                                m.rho(p.bvalues, T.bvalues),
                                dim_density, "rho")
    rho = rho.replace(old=rho.replace(old=None))
    rho_f = fvc.face_values(mesh, rho)
    phi = SurfaceField(rho_f * fvc.flux(mesh, U).data,
                       DimensionSet.of(1, 0, -1), "phi")

    h_controls = case.solver_controls("h")
    try:
        div_h = case.div_scheme("div(phi,h)")
    except KeyError:
        div_h = "upwind"
    lap_corr = case.laplacian_scheme()
    ddt_scheme = case.ddt_scheme()

    @jax.jit
    def step(T, dt):
        h = thermo.he_field(mesh, T, "h").replace(old=None)
        h = h.replace(old=h.replace(old=None))
        alpha_f = Dimensioned("alpha", DimensionSet.of(1, -1, -1),
                              m.alpha_h(fvc.face_values(mesh, T)))
        hEqn = (fvm.ddt(mesh, h, dt, ddt_scheme, coeff=rho)
                + fvm.div(mesh, phi, h, div_h)
                - fvm.laplacian(mesh, alpha_f, h, lap_corr))
        h, perf = solve(mesh, hEqn, h_controls)
        return thermo.update_t(mesh, T, h), perf

    timer = ExecutionTimer()
    info("\nEvolving thermodynamics\n")
    n = 0
    while case.time.loop():
        info(f"Time = {case.time.name}\n")
        T, perf = step(T, case.time.delta_t)
        log_solve(h_controls.solver, "h", perf[0][0], perf[0][1],
                  perf[0][2])
        timer.log()
        if write and case.time.write_time():
            case.write_fields([T])
        n += 1
        if max_steps and n >= max_steps:
            break
    info("End\n")
    return case, T
