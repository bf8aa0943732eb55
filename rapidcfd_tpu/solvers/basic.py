"""Basic solvers: laplacianFoam, scalarTransportFoam, potentialFoam.

Capability parity with the reference's applications/solvers/basic family
(reference: laplacianFoam.C, scalarTransportFoam.C, potentialFoam.C).
"""

from __future__ import annotations

import jax

from ..fields.field import Dimensioned, SurfaceField
from ..linalg import solve
from ..ops import fvc, fvm
from ..utils.logging import ExecutionTimer, info, log_solve
from .case import Case
from .controls import SimpleControl


def run_laplacian_foam(case_dir: str, write: bool = True,
                       max_steps: int | None = None):
    """laplacianFoam: ddt(T) - laplacian(DT, T) = 0."""
    case = Case(case_dir)
    mesh = case.mesh
    T = case.read_field("T").store_old()
    DT = Dimensioned.from_entry(
        case.transport_properties().lookup("DT", required=True), "DT")
    controls = case.solver_controls("T")
    lap_corr = case.laplacian_scheme()
    ddt_scheme = case.ddt_scheme()
    simple = SimpleControl(case)

    cn = isinstance(ddt_scheme, tuple) \
        and ddt_scheme[0] == "CrankNicolson"

    @jax.jit
    def step(T, dt):
        T = T.store_old(levels=2 if cn else 1)
        if cn:
            T = fvm.cn_advance(mesh, T, dt, dt, ddt_scheme[1])
        eqn = fvm.ddt(mesh, T, dt, ddt_scheme) \
            - fvm.laplacian(mesh, DT, T, lap_corr)
        for _ in range(simple.n_non_orth + 1):
            T, perf = solve(mesh, eqn.replace(psi=T), controls)
        return T, perf

    timer = ExecutionTimer()
    n = 0
    while case.time.loop():
        info(f"Time = {case.time.name}\n")
        T, perf = step(T, case.time.delta_t)
        log_solve(controls.solver, "T", perf[0][0], perf[0][1], perf[0][2])
        timer.log()
        if write and case.time.write_time():
            case.write_fields([T])
        n += 1
        if max_steps and n >= max_steps:
            break
    info("End\n")
    return case, T


def run_scalar_transport_foam(case_dir: str, write: bool = True,
                              max_steps: int | None = None):
    """scalarTransportFoam: ddt(T) + div(phi,T) - laplacian(DT,T) = 0
    with a frozen velocity field read from the case."""
    case = Case(case_dir)
    mesh = case.mesh
    T = case.read_field("T").store_old()
    U = case.read_field("U")
    phi = fvc.flux(mesh, U)
    DT = Dimensioned.from_entry(
        case.transport_properties().lookup("DT", required=True), "DT")
    controls = case.solver_controls("T")
    div_scheme = case.div_scheme("div(phi,T)")
    lap_corr = case.laplacian_scheme()
    ddt_scheme = case.ddt_scheme()
    simple = SimpleControl(case)

    cn = isinstance(ddt_scheme, tuple) \
        and ddt_scheme[0] == "CrankNicolson"

    @jax.jit
    def step(T, phi, dt):
        T = T.store_old(levels=2 if cn else 1)
        if cn:
            T = fvm.cn_advance(mesh, T, dt, dt, ddt_scheme[1])
        for _ in range(simple.n_non_orth + 1):
            eqn = (fvm.ddt(mesh, T, dt, ddt_scheme)
                   + fvm.div(mesh, phi, T, div_scheme)
                   - fvm.laplacian(mesh, DT, T, lap_corr))
            T, perf = solve(mesh, eqn, controls)
        return T, perf

    timer = ExecutionTimer()
    n = 0
    while case.time.loop():
        info(f"Time = {case.time.name}\n")
        T, perf = step(T, phi, case.time.delta_t)
        log_solve(controls.solver, "T", perf[0][0], perf[0][1], perf[0][2])
        timer.log()
        if write and case.time.write_time():
            case.write_fields([T])
        n += 1
        if max_steps and n >= max_steps:
            break
    info("End\n")
    return case, T


def run_potential_foam(case_dir: str, write: bool = True,
                       n_non_orth: int | None = None):
    """potentialFoam: laplacian(Phi) == div(phi), then U from the
    conservative flux (reference: potentialFoam.C)."""
    case = Case(case_dir)
    mesh = case.mesh
    U = case.read_field("U")
    phi = fvc.flux(mesh, U)
    # Phi: zero field with zeroGradient everywhere a fixed-flux boundary
    # exists; reuse p's BCs if a Phi/p file is present
    name = "Phi" if case.field_exists("Phi") else "p"
    Phi = case.read_field(name).replace(name="Phi")
    controls = case.solver_controls(name)
    simple = SimpleControl(case)
    nno = simple.n_non_orth if n_non_orth is None else n_non_orth
    lap_corr = case.laplacian_scheme()

    @jax.jit
    def solve_potential(Phi, phi):
        perf = None
        for _ in range(nno + 1):
            eqn = fvm.laplacian(mesh, 1.0, Phi, lap_corr) \
                == fvc.div(mesh, phi)
            eqn = eqn.set_reference(simple.p_ref_cell, simple.p_ref_value)
            Phi, perf = solve(mesh, eqn, controls)
            phi_new = phi - eqn.replace(psi=Phi).flux(mesh)
        Urec = fvc.reconstruct(mesh, phi_new)
        U2 = U.replace(data=Urec.data).correct_boundary_conditions(mesh)
        cont = fvc.div(mesh, phi_new)
        err = (jax.numpy.abs(cont.data) * mesh.V).sum()
        return Phi, phi_new, U2, perf, err

    Phi, phi, U, perf, err = solve_potential(Phi, phi)
    log_solve(controls.solver, "Phi", perf[0][0], perf[0][1], perf[0][2])
    info(f"continuity error = {float(err):.6g}")
    if write:
        case.write_fields([U])
    info("End\n")
    return case, U, phi
