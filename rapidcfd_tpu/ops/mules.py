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


def explicit_solve(mesh: MeshArrays, psi: VolField, phi: SurfaceField,
                   phi_psi: SurfaceField, dt, psi_max=1.0, psi_min=0.0,
                   n_limiter_iter: int = 3, sp=None, su=None):
    """Advance psi one step with the limited flux; returns
    (psi_new, limited flux phi_psi_lim).

    phi: volumetric face flux; phi_psi: the high-order candidate psi-flux
    (e.g. vanLeer interpolation * phi + interface compression).
    sp/su: optional per-cell implicit/explicit sources (reference:
    MULES::explicitSolve(rho, psi, phi, phiPsi, Sp, Su, ...)):
    d(psi)/dt = -div(phiPsi)/V + Su + Sp*psi, Sp handled implicitly.
    """
    phi_bd, corr = bounded_flux(mesh, psi, phi, phi_psi)

    sp_c = 0.0 if sp is None else sp
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
    psi_new = psi.replace(data=advance(phi_lim)) \
                 .correct_boundary_conditions(mesh)
    return psi_new, SurfaceField(phi_lim, phi_psi.dims, phi_psi.name)
