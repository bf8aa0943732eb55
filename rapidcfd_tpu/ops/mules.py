"""MULES — bounded explicit transport (flux-corrected transport).

Capability surface of the reference's MULES (reference:
src/finiteVolume/fvMatrices/solvers/MULES/MULES.H:28-129,
MULESTemplates.C limiter loop): Zalesak FCT limiting of the
anti-diffusive flux so the transported scalar stays in [psiMin, psiMax]
(VOF alpha in [0,1]). Everything is face gathers + the mesh's ELL
per-cell reductions — the same regular pattern as the rest of the ops.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..fields.field import SurfaceField, VolField
from ..mesh.mesharrays import MeshArrays
from . import fvc


def limiter(mesh: MeshArrays, psi_td, corr, dt, psi_max=1.0,
            psi_min=0.0, n_limiter_iter: int = 3):
    """Zalesak FCT limiter lambda in [0,1] per face (reference:
    MULES::limiter, MULESTemplates.C): the largest fraction of the
    anti-diffusive correction `corr` that keeps the bounded (low-order)
    solution psi_td within [psi_min, psi_max]. Boundary faces keep
    lambda=1 (BC-controlled)."""
    n_int = mesh.n_internal
    own = mesh.owner[:n_int]
    nei = mesh.neighbour
    rdtv = dt / mesh.V
    lam = jnp.ones_like(corr)
    for _ in range(n_limiter_iter):
        a = lam * corr
        gathered = jnp.take(a, mesh.cell_faces, axis=0) * mesh.cell_sign
        p_plus = jnp.maximum(-gathered, 0.0).sum(1) * rdtv
        p_minus = jnp.maximum(gathered, 0.0).sum(1) * rdtv
        q_plus = jnp.maximum(psi_max - psi_td, 0.0)
        q_minus = jnp.maximum(psi_td - psi_min, 0.0)
        r_plus = jnp.minimum(1.0, q_plus / jnp.maximum(p_plus, 1e-30))
        r_minus = jnp.minimum(1.0, q_minus / jnp.maximum(p_minus, 1e-30))
        leaving_owner = a[:n_int] >= 0.0
        lam_f = jnp.where(
            leaving_owner,
            jnp.minimum(jnp.take(r_minus, own), jnp.take(r_plus, nei)),
            jnp.minimum(jnp.take(r_minus, nei), jnp.take(r_plus, own)))
        lam = lam.at[:n_int].set(lam[:n_int] * lam_f)
    return lam


def bounded_flux(mesh: MeshArrays, psi: VolField, phi: SurfaceField,
                 phi_psi: SurfaceField):
    """Split a candidate psi-flux into (upwind bounded flux, correction)
    (reference: MULES upwind phiBD + phiCorr)."""
    n_int = mesh.n_internal
    own = mesh.owner[:n_int]
    nei = mesh.neighbour
    up = (phi.data[:n_int] >= 0.0)
    psi_up = jnp.where(up, jnp.take(psi.data, own),
                       jnp.take(psi.data, nei))
    phi_bd_int = phi.data[:n_int] * psi_up
    phi_bd = jnp.concatenate([phi_bd_int, phi_psi.data[n_int:]])
    return phi_bd, phi_psi.data - phi_bd


def _restore_conservation(mesh, psi_old_data, data, phi_lim, dt, su,
                          sp_real=None):
    """Redistribute the global conservation defect onto interface cells.

    The div(phi)-compensation that keeps the update bounded under a
    non-divergence-free fp32 flux is a (tiny) artificial source; this
    puts the lost/gained integral back, weighted by psi*(1-psi)*V so
    only interface cells move (interior cells have no headroom to
    lose). Defect is O(continuity error * dt) ~ 1e-6, so the bound is
    disturbed by at most that much."""
    from ..linalg.solvers import gsum
    bflux = jnp.zeros((), phi_lim.dtype)
    for p in mesh.patches:
        if p.is_empty or p.size == 0:
            continue
        bflux = bflux + gsum(phi_lim[p.start:p.start + p.size])
    target = gsum(psi_old_data * mesh.V) - dt * bflux
    if su is not None:
        target = target + dt * gsum(su * mesh.V)
    if sp_real is not None:
        # real (physical) Sp source, treated implicitly in the update
        target = target + dt * gsum(sp_real * data * mesh.V)
    defect = target - gsum(data * mesh.V)
    w = jnp.maximum(data * (1.0 - data), 0.0) * mesh.V
    wsum = gsum(w)
    return data + jnp.where(wsum > 1e-30, defect * w / (wsum * mesh.V),
                            0.0)


def explicit_solve(mesh: MeshArrays, psi: VolField, phi: SurfaceField,
                   phi_psi: SurfaceField, dt, psi_max=1.0, psi_min=0.0,
                   n_limiter_iter: int = 3, sp=None, su=None,
                   div_phi_comp=None):
    """Advance psi one step with the limited flux; returns
    (psi_new, limited flux phi_psi_lim).

    phi: volumetric face flux; phi_psi: the high-order candidate psi-flux
    (e.g. vanLeer interpolation * phi + interface compression).
    sp/su: optional per-cell implicit/explicit PHYSICAL sources
    (reference: MULES::explicitSolve(rho, psi, phi, phiPsi, Sp, Su)):
    d(psi)/dt = -div(phiPsi)/V + Su + Sp*psi, Sp handled implicitly.

    div_phi_comp: pass div(phi) here to compensate the fp32 continuity
    error of the flux (an artificial Sp that keeps a uniform field
    exactly uniform under a non-divergence-free flux); the integral it
    perturbs is restored afterwards by a bounded interface-weighted
    redistribution.
    """
    phi_bd, corr = bounded_flux(mesh, psi, phi, phi_psi)

    sp_c = 0.0 if sp is None else sp
    if div_phi_comp is not None:
        sp_c = sp_c + div_phi_comp
    su_c = 0.0 if su is None else su

    def advance(flux_faces):
        # (psi0/dt + Su - div(F)/V) / (1/dt - Sp)
        num = psi.data / dt + su_c \
            - fvc.surface_sum_faces(mesh, flux_faces) / mesh.V
        return num / (1.0 / dt - sp_c)

    # low-order (bounded) update
    psi_td = advance(phi_bd)
    lam = limiter(mesh, psi_td, corr, dt, psi_max, psi_min,
                  n_limiter_iter)
    phi_lim = phi_bd + lam * corr
    data = advance(phi_lim)
    if div_phi_comp is not None:
        data = _restore_conservation(mesh, psi.data, data, phi_lim, dt,
                                     su, sp_real=sp)
    psi_new = psi.replace(data=data).correct_boundary_conditions(mesh)
    return psi_new, SurfaceField(phi_lim, phi_psi.dims, phi_psi.name)


def implicit_solve(mesh: MeshArrays, psi: VolField, phi: SurfaceField,
                   phi_psi: SurfaceField, dt, controls, psi_max=1.0,
                   psi_min=0.0, n_limiter_iter: int = 3,
                   n_corr_iter: int = 2, sp=None, su=None):
    """MULES::implicitSolve (reference: MULES.H:102-129,
    MULESTemplates.C::implicitSolve): the bounded (upwind) transport is
    solved IMPLICITLY — unconditionally bounded at any Courant number —
    and the limited anti-diffusive correction is applied explicitly,
    re-limited against the implicit solution n_corr_iter times. This is
    what keeps VOF alpha in [0,1] at Co > 1 where explicit FCT's
    low-order solution itself overshoots.

    psi must carry an old-time level (caller does store_old). Returns
    (psi_new, limited flux) like explicit_solve.
    """
    from ..linalg import solve as _solve
    from . import fvm

    # implicit low-order operator: ddt + BOUNDED upwind convection
    # (+ -Sp, -Su). Implicit Euler + upwind is an M-matrix bounded in
    # [psi_min, psi_max] at ANY Courant number — but only if the flux is
    # divergence-free. With fp32 pressure solves div(phi) carries an
    # O(1e-6) relative continuity error whose row-sum defect alone
    # overshoots alpha by ~1e-4; the bounded form's -Sp(div(phi), psi)
    # restores exact row sums (the Sp term is diagonal, so the matrix
    # flux below stays the conservative transport flux).
    base = fvm.ddt(mesh, psi, dt) \
        + fvm.div(mesh, phi, psi, ("bounded", "upwind"))
    if sp is not None:
        base = base - fvm.Sp(mesh, sp, psi)
    if su is not None:
        base = base.replace(source=base.source + su.data * mesh.V)

    psi_bd, _perf = _solve(mesh, base, controls)

    # anti-diffusive correction relative to the CONSERVATIVE low-order
    # matrix flux (reference: phiBD = psiConvectionDiffusion.flux()),
    # Zalesak-limited against the bounded implicit solution and applied
    # explicitly — the FCT bound then holds exactly, Co-independent.
    flux_bd = base.replace(psi=psi_bd).flux(mesh)
    corr = phi_psi.data - flux_bd.data
    lam = limiter(mesh, psi_bd.data, corr, dt, psi_max, psi_min,
                  n_limiter_iter)
    data = psi_bd.data \
        - fvc.surface_sum_faces(mesh, lam * corr) / mesh.V * dt
    phi_lim = flux_bd.data + lam * corr
    su_f = None if su is None else su.data
    data = _restore_conservation(mesh, psi.old.data, data, phi_lim, dt,
                                 su_f)
    psi_new = psi_bd.replace(data=data).correct_boundary_conditions(mesh)
    return psi_new, SurfaceField(phi_lim, phi_psi.dims, phi_psi.name)
