"""adjointShapeOptimizationFoam — continuous-adjoint porosity
optimization (frozen turbulence).

Capability parity with the reference solver (reference:
applications/solvers/incompressible/adjointShapeOptimizationFoam/
adjointShapeOptimizationFoam.C:66-150 + adjointOutletVelocity/
adjointOutletPressure BCs): alternating forward SIMPLE (with the
porosity sink Sp(alpha, U)) and adjoint SIMPLE (reversed flux,
transpose-convection source) iterations; the blockage field updates as
alpha += relax*(clip(alpha + lambda*(Ua & U), 0, alphaMax) - alpha)
with inlet cells pinned to zero.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..fields.bcs import FixedValue
from ..fields.field import Dimensioned, SurfaceField
from ..linalg import solve
from ..linalg.solvers import gsum
from ..ops import fvc, fvm
from ..utils.dimensions import DimensionSet
from ..utils.logging import ExecutionTimer, info, log_solve
from ..utils.registry import register
from .case import Case
from .controls import SimpleControl

_RTIME = DimensionSet.of(0, 0, -1)
_SMALL = 1e-10


@register("fvPatchField", "adjointOutletVelocity")
@dataclass(frozen=True)
class AdjointOutletVelocity(FixedValue):
    """Ua outlet (reference: adjointOutletVelocityFvPatchVectorField):
    Ua = phia*Sf/magSf^2 + U_tangential_hat."""

    def evaluate(self, mesh, patch, field, bd, env=None):
        if env is None or "phia" not in env:
            return field.patch_values(mesh, patch)
        sl = slice(patch.start, patch.start + patch.size)
        phia_p = env["phia"].data[sl]
        U = env["U"]
        up = U.bvalues[patch.bstart:patch.bstart + patch.size]
        n = mesh.patch_normals(patch)
        un = jnp.abs((n * up).sum(-1))
        ut_hat = (up - n * un[:, None]) / (un[:, None] + _SMALL)
        msf = mesh.patch_mag_sf(patch)
        return phia_p[:, None] * mesh.patch_sf(patch) \
            / (msf ** 2)[:, None] + ut_hat


@register("fvPatchField", "adjointOutletPressure")
@dataclass(frozen=True)
class AdjointOutletPressure(FixedValue):
    """pa outlet (reference: adjointOutletPressureFvPatchScalarField):
    pa = (phia/magSf - 1)*phi/magSf + (U & Ua)."""

    def evaluate(self, mesh, patch, field, bd, env=None):
        if env is None or "phia" not in env:
            return field.patch_values(mesh, patch)
        sl = slice(patch.start, patch.start + patch.size)
        bsl = slice(patch.bstart, patch.bstart + patch.size)
        phia_p = env["phia"].data[sl]
        phi_p = env["phi"].data[sl]
        up = env["U"].bvalues[bsl]
        uap = env["Ua"].bvalues[bsl]
        msf = mesh.patch_mag_sf(patch)
        return (phia_p / msf - 1.0) * phi_p / msf + (up * uap).sum(-1)


def run(case_dir: str, write: bool = True, max_steps: int | None = None):
    case = Case(case_dir)
    mesh = case.mesh
    tp = case.transport_properties()
    nu = Dimensioned.from_entry(tp.lookup("nu", required=True), "nu")
    lam = Dimensioned.from_entry(
        tp.lookup("lambda", required=True)).value
    alpha_max = Dimensioned.from_entry(
        tp.lookup("alphaMax", required=True)).value
    alpha_relax = case.relaxation_factor("alpha", "fields", 0.1)

    U = case.read_field("U")
    p = case.read_field("p")
    Ua = case.read_field("Ua")
    pa = case.read_field("pa")
    phi = jax.jit(lambda u: fvc.flux(mesh, u))(U)
    phia = jax.jit(lambda u: fvc.flux(mesh, u))(Ua)
    alpha = jnp.zeros(mesh.n_cells, U.data.dtype)
    if case.field_exists("alpha"):
        alpha = case.read_field("alpha").data

    # inlet face-cells pinned to zero blockage
    import numpy as np
    inlet = next((pt for pt in mesh.patches if pt.name == "inlet"), None)
    inlet_mask = jnp.ones(mesh.n_cells, U.data.dtype)
    if inlet is not None:
        inlet_mask = inlet_mask.at[
            jnp.asarray(np.asarray(mesh.patch_face_cells(inlet)))].set(0.0)

    simple = SimpleControl(case)
    div_u = case.div_scheme("div(phi,U)")
    try:
        div_ua = case.div_scheme("div(-phi,Ua)")
    except KeyError:
        div_ua = div_u
    lap_corr = case.laplacian_scheme()
    u_controls = case.solver_controls("U")
    p_controls = case.solver_controls("p")
    ua_controls = case.solver_controls("Ua")
    pa_controls = case.solver_controls("pa")
    u_relax = case.relaxation_factor("U", "equations", 0.7)
    p_relax = case.relaxation_factor("p", "fields", 0.3)
    n_non_orth = simple.n_non_orth
    p_ref_cell, p_ref_value = simple.p_ref_cell, simple.p_ref_value
    from .simplefoam import relax_field

    @jax.jit
    def step(U, p, phi, Ua, pa, phia, alpha):
        # sensitivity update
        alpha_new = jnp.clip(
            alpha + lam * (Ua.data * U.data).sum(-1), 0.0, alpha_max)
        alpha = (alpha + alpha_relax * (alpha_new - alpha)) * inlet_mask

        # ---- forward SIMPLE with porosity sink
        UEqn = (fvm.div(mesh, phi, U, div_u)
                - fvm.laplacian(mesh, nu, U, lap_corr)
                + fvm.Sp(mesh, Dimensioned("alpha", _RTIME, alpha), U))
        UEqn = UEqn.relax(mesh, u_relax)
        U, u_perf = solve(mesh, UEqn == (-fvc.grad(mesh, p)), u_controls)
        UEqn_c = UEqn.replace(psi=U)
        rAU = 1.0 / UEqn_c.A(mesh)
        HbyA = fvc.constrain_hbya(mesh, rAU * UEqn_c.H(mesh), U)
        phi_hbya = fvc.adjust_phi(mesh, fvc.flux(mesh, HbyA), U)
        p_prev = p
        for north in range(n_non_orth + 1):
            pEqn = fvm.laplacian(mesh, rAU, p, lap_corr) \
                == fvc.div(mesh, phi_hbya)
            pEqn = pEqn.set_reference(p_ref_cell, p_ref_value)
            p, p_perf = solve(mesh, pEqn, p_controls)
        phi = phi_hbya - pEqn.replace(psi=p).flux(mesh)
        p = relax_field(p, p_prev, p_relax)
        U = U.replace(data=(HbyA - rAU * fvc.grad(mesh, p)).data) \
            .correct_boundary_conditions(mesh, env={"phi": phi})

        # ---- adjoint SIMPLE (reversed flux + transpose convection)
        env_a = {"phi": phi, "phia": phia, "U": U, "Ua": Ua}
        Ua = Ua.correct_boundary_conditions(mesh, env=env_a)
        atc = fvc.grad(mesh, Ua)
        atc_d = (atc.data * U.data[:, None, :]).sum(-1) * inlet_mask[:, None]
        minus_phi = SurfaceField(-phi.data, phi.dims, "-phi")
        UaEqn = (fvm.div(mesh, minus_phi, Ua, div_ua)
                 - fvm.laplacian(mesh, nu, Ua, lap_corr)
                 + fvm.Sp(mesh, Dimensioned("alpha", _RTIME, alpha), Ua))
        UaEqn = UaEqn.relax(mesh, u_relax)
        rhs_a = fvc.grad(mesh, pa)
        rhs_a = rhs_a.replace(data=-rhs_a.data + atc_d)
        Ua, ua_perf = solve(mesh, UaEqn == rhs_a, ua_controls,
                            env=env_a)
        UaEqn_c = UaEqn.replace(psi=Ua)
        rAUa = 1.0 / UaEqn_c.A(mesh)
        HbyAa = fvc.constrain_hbya(mesh, rAUa * UaEqn_c.H(mesh), Ua)
        phia_hbya = fvc.adjust_phi(mesh, fvc.flux(mesh, HbyAa), Ua)
        pa_prev = pa
        for north in range(n_non_orth + 1):
            paEqn = fvm.laplacian(mesh, rAUa, pa, lap_corr) \
                == fvc.div(mesh, phia_hbya)
            paEqn = paEqn.set_reference(p_ref_cell, p_ref_value)
            pa, pa_perf = solve(mesh, paEqn, pa_controls)
        phia = phia_hbya - paEqn.replace(psi=pa).flux(mesh)
        pa = relax_field(pa, pa_prev, p_relax)
        pa = pa.correct_boundary_conditions(mesh, env={
            "phi": phi, "phia": phia, "U": U, "Ua": Ua})
        Ua = Ua.replace(
            data=(HbyAa - rAUa * fvc.grad(mesh, pa)).data) \
            .correct_boundary_conditions(mesh, env={
                "phi": phi, "phia": phia, "U": U, "Ua": Ua})

        cont = fvc.div(mesh, phi)
        local_err = gsum(jnp.abs(cont.data) * mesh.V)
        stats = dict(u_perf=u_perf, p_perf=p_perf, ua_perf=ua_perf,
                     pa_perf=pa_perf, cont=local_err,
                     blocked=gsum((alpha > 0.01 * alpha_max)
                                  * mesh.V))
        return U, p, phi, Ua, pa, phia, alpha, stats

    timer = ExecutionTimer()
    info("\nStarting time loop\n")
    n = 0
    while case.time.loop():
        info(f"Time = {case.time.name}\n")
        U, p, phi, Ua, pa, phia, alpha, stats = step(U, p, phi, Ua, pa,
                                                     phia, alpha)
        for cmpt, perf in zip("xyz", stats["u_perf"]):
            log_solve(u_controls.solver, f"U{cmpt}", perf[0], perf[1],
                      perf[2])
        for cmpt, perf in zip("xyz", stats["ua_perf"]):
            log_solve(ua_controls.solver, f"Ua{cmpt}", perf[0], perf[1],
                      perf[2])
        info(f"blocked volume = {float(stats['blocked']):.6g}  "
             f"continuity = {float(stats['cont']):.3e}")
        timer.log()
        if write and case.time.write_time():
            from ..ops.fvc import _extrapolated
            alpha_f = _extrapolated(mesh, alpha, _RTIME, "alpha")
            case.write_fields([U, p, Ua, pa,
                               alpha_f.replace(name="alpha")])
        n += 1
        if max_steps and n >= max_steps:
            break
    info("End\n")
    return case, U, p, Ua, pa, alpha
