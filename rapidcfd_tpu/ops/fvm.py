"""fvm — implicit finite-volume operators returning FvMatrix systems.

Capability surface of the reference's fvm namespace (reference:
src/finiteVolume/finiteVolume/fvm/fvm.H): ddt, div (Gauss convection),
laplacian (Gauss), Sp/Su/SuSp source linearization. Assembly is
face-local coefficient construction (exactly the reference's
gaussConvectionScheme.H:59 / gaussLaplacianScheme.C:44-88 recipes) with
negSumDiag realized as an ELL gather instead of a scatter.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..fields.field import Dimensioned, SurfaceField, VolField
from ..mesh.mesharrays import MeshArrays
from ..utils.dimensions import DimensionSet, dim_length, dimless
from .fvmatrix import FvMatrix, _ext
from .interpolation import scheme_weights

_VOL = DimensionSet.of(0, 3)
_TIME = DimensionSet.of(0, 0, 1)
_AREA = dim_length ** 2


def _pair_gather(mesh: MeshArrays, own_arr, nei_arr):
    """Per-cell-slot gather where owner slots read own_arr[f] and
    neighbour slots read nei_arr[f] (uses the [0..nInt|nInt..2nInt|zero]
    structure of ell_coeff_idx)."""
    cat = jnp.concatenate([own_arr, nei_arr, jnp.zeros(1, own_arr.dtype)])
    return jnp.take(cat, mesh.ell_coeff_idx, axis=0)


def _neg_sum_diag(mesh: MeshArrays, lower, upper):
    """diag[own] -= lower[f]; diag[nei] -= upper[f] (lduMatrix::negSumDiag),
    as a gather: owner slot of face f must read lower[f]. Structured
    boxes use padded sums (mesh/structured.py); gdia lattices use the
    plane-shift kernels (per-SLOT diag — the matrix fold to primary rows
    happens in component_system)."""
    if mesh.structured is not None:
        from ..mesh import structured as st
        return st.neg_sum_diag(mesh.structured, lower, upper)
    if mesh.gdia is not None:
        from ..mesh import gdia as gd
        return gd.neg_sum_diag(mesh.gdia, lower, upper)
    return -_pair_gather(mesh, lower, upper).sum(axis=1)


def _apply_jumps(mesh: MeshArrays, vf: VolField, m: FvMatrix, env):
    """Fold jump-cyclic offsets into the matrix source (reference:
    jumpCyclicFvPatchField::updateInterfaceMatrix — the ghost value is
    shifted by the signed jump, `pnf -= jf`). coupled_mv adds
    -bc_coeffs*ghost into M*x, so the constant part moves to the RHS as
    source -= bc_coeffs*jump."""
    src, changed = m.source, False
    for i, (patch, bc, bd) in enumerate(
            zip(mesh.patches, vf.bcs, vf.bcdata)):
        if not getattr(bc, "has_jump", False) or patch.size == 0:
            continue
        jf = bc.jump(mesh, patch, vf, bd, env)
        cc = m.boundary_coeffs[i]
        if cc.ndim > jf.ndim:
            jf = jf[:, None]
        src = mesh.add_at_patch_cells(patch, src, -cc * jf)
        changed = True
    return m.replace(source=src) if changed else m


# ---------------------------------------------------------------------------
# time derivatives
# ---------------------------------------------------------------------------

def cn_advance(mesh: MeshArrays, vf: VolField, dt, dt0=None,
               oc_coeff: float = 1.0, coeff=None) -> VolField:
    """Advance the CrankNicolson ddt0 state ONCE per timestep (call right
    after store_old; reference: CrankNicolsonDdtScheme evaluate(ddt0) at
    CrankNicolsonDdtScheme.C:417 — ddt0 = rDtCoef0*(psi0 - psi00) -
    ocCoeff*ddt0_prev, with the startup Euler blending via coef0).

    dt0 is the previous step size (defaults to dt). With coeff (rho),
    the state tracks d(rho*psi)/dt (reference :507)."""
    import jax.numpy as jnp_
    if vf.old is None:
        return vf          # nothing to advance before the first step
    if dt0 is None:
        dt0 = dt
    gamma = float(oc_coeff)
    if vf.ddt0 is None:
        z = jnp_.zeros_like(vf.data)
        zb = jnp_.zeros_like(vf.bvalues)
        steps = jnp_.asarray(0, jnp_.int32)
        prev_d, prev_b = z, zb
    else:
        prev_d, prev_b, steps = vf.ddt0
    if vf.old.old is None:
        # still inside the first step: keep zeros, count the step
        return vf.replace(ddt0=(prev_d, prev_b, steps + 1))
    coef0 = jnp_.where(steps > 1, 1.0 + gamma, 1.0)
    if coeff is None:
        d_old = vf.old.data - vf.old.old.data
        b_old = vf.old.bvalues - vf.old.old.bvalues
    else:
        d_old = coeff.old.data * vf.old.data \
            - coeff.old.old.data * vf.old.old.data
        b_old = coeff.old.bvalues * vf.old.bvalues \
            - coeff.old.old.bvalues * vf.old.old.bvalues
    rdt0 = coef0 / dt0
    new_d = rdt0 * d_old - gamma * prev_d
    new_b = rdt0 * b_old - gamma * prev_b
    return vf.replace(ddt0=(new_d, new_b, steps + 1))


def ddt(mesh: MeshArrays, vf: VolField, dt, scheme: str = "Euler",
        coeff=None) -> FvMatrix:
    """fvm::ddt / fvm::ddt(rho, psi) (reference: finiteVolume/ddtSchemes
    EulerDdtScheme::fvmDdt forms). dt is a runtime scalar (trace-safe:
    changing dt does not recompile). coeff is an optional density-like
    VolField (must carry its own old level)."""
    oc = 1.0
    if isinstance(scheme, tuple) and scheme and scheme[0] in (
            "CrankNicolson", "CrankNicholson"):
        oc = float(scheme[1]) if len(scheme) > 1 else 1.0
        scheme = "CrankNicolson"
    c_dims = coeff.dims if coeff is not None else DimensionSet()
    m = FvMatrix.zeros(mesh, vf, c_dims * vf.dims * _VOL / _TIME,
                       symmetric=True)
    if scheme == "steadyState":
        return m
    if scheme in ("CrankNicolson", "CrankNicholson"):
        # true CN (reference: CrankNicolsonDdtScheme.C:713-795 fvmDdt):
        # diag = coef/dt * V (coef = 1+ocCoeff after startup), source =
        # (coef/dt * psi0 [rho0] + ocCoeff*ddt0) * V; ddt0 advanced by
        # cn_advance. Falls back to Euler while no state is attached.
        import jax.numpy as jnp_
        if vf.old is None:
            raise ValueError(f"ddt({vf.name}): no old-time field stored")
        if vf.ddt0 is None:
            return ddt(mesh, vf, dt, "Euler", coeff)
        # steps counts completed cn_advance calls (== current step
        # number); the first step is pure Euler (reference coef_ guard)
        ddt0_d, _, steps = vf.ddt0
        coef = jnp_.where(steps > 1, 1.0 + oc, 1.0)
        rdt = coef / dt
        if coeff is None:
            diag = mesh.V_asm * rdt
            src = _ext(mesh.V_asm, vf.old.data) * (
                rdt * vf.old.data + oc * ddt0_d)
        else:
            if coeff.old is None:
                raise ValueError(
                    f"ddt({coeff.name},{vf.name}): coefficient has no "
                    f"old-time level")
            diag = mesh.V_asm * rdt * coeff.data
            src = _ext(mesh.V_asm, vf.old.data) * (
                _ext(rdt * coeff.old.data, vf.old.data)
                * vf.old.data + oc * ddt0_d)
        return m.replace(diag=diag, source=src)
    if scheme in ("Euler", "localEuler", "CoEuler", "SLTS"):
        # localEuler/CoEuler/SLTS (reference: localEulerDdtScheme.C,
        # CoEulerDdtScheme, SLTSDdtScheme) share the Euler stencil with a
        # PER-CELL dt: pass dt as an (nCells,) array of 1/rDeltaT —
        # every expression below is elementwise in dt
        if vf.old is None:
            raise ValueError(f"ddt({vf.name}): no old-time field stored")
        rdt = 1.0 / dt
        if coeff is None:
            diag = mesh.V_asm * rdt
            src = _ext(diag, vf.old.data) * vf.old.data
        else:
            if coeff.old is None:
                raise ValueError(
                    f"ddt({coeff.name},{vf.name}): coefficient has no "
                    f"old-time level")
            diag = mesh.V_asm * rdt * coeff.data
            src = _ext(mesh.V_asm * rdt * coeff.old.data, vf.old.data) \
                * vf.old.data
        return m.replace(diag=diag, source=src)
    if scheme == "backward":
        # 2nd order: (3/2 psi - 2 psi0 + 1/2 psi00)/dt (equal-step form;
        # reference backwardDdtScheme.C — the deltaT/deltaT0 general
        # coefficients reduce to 3/2, 2, 1/2 at constant dt, which is
        # how every transient solver here advances)
        if vf.old is None or vf.old.old is None:
            return ddt(mesh, vf, dt, "Euler", coeff)
        rdt = 1.0 / dt
        if coeff is None:
            diag = 1.5 * mesh.V_asm * rdt
            vrdt = _ext(mesh.V_asm * rdt, vf.old.data)
            src = 2.0 * vrdt * vf.old.data - 0.5 * vrdt * vf.old.old.data
            return m.replace(diag=diag, source=src)
        # coefficient form (reference backwardDdtScheme::fvmDdt(rho,vf)):
        # diag = 3/2 rho V/dt, source = (2 rho0 psi0 - 1/2 rho00 psi00)V/dt
        if coeff.old is None or coeff.old.old is None:
            return ddt(mesh, vf, dt, "Euler", coeff)
        diag = 1.5 * mesh.V_asm * rdt * coeff.data
        vrdt = mesh.V_asm * rdt
        src = _ext(2.0 * vrdt * coeff.old.data, vf.old.data) \
            * vf.old.data \
            - _ext(0.5 * vrdt * coeff.old.old.data, vf.old.old.data) \
            * vf.old.old.data
        return m.replace(diag=diag, source=src)
    raise ValueError(f"unknown ddtScheme '{scheme}'")


# ---------------------------------------------------------------------------
# convection
# ---------------------------------------------------------------------------

def d2dt2(mesh: MeshArrays, vf: VolField, dt) -> FvMatrix:
    """fvm::d2dt2 (reference: finiteVolume/d2dt2Schemes/EulerD2dt2Scheme):
    (psi - 2 psi_old + psi_oldold) * V / dt^2, implicit in psi. The field
    must carry two old-time levels (store_old(levels=2))."""
    if vf.old is None or vf.old.old is None:
        raise ValueError(f"d2dt2({vf.name}): needs two old-time levels")
    m = FvMatrix.zeros(mesh, vf, vf.dims * _VOL / (_TIME * _TIME),
                       symmetric=True)
    diag = mesh.V_asm / (dt * dt)
    src = _ext(diag, vf.old.data) \
        * (2.0 * vf.old.data - vf.old.old.data)
    return m.replace(diag=diag, source=src)


def div(mesh: MeshArrays, phi: SurfaceField, vf: VolField,
        scheme="linear", env=None) -> FvMatrix:
    """fvm::div(phi, psi) — Gauss convection (reference:
    gaussConvectionScheme: lower = -w*phi, upper = lower + phi,
    negSumDiag; boundary via the BC value-coefficient hooks). A
    ('bounded', inner) spec applies the boundedConvectionScheme
    correction -Sp(div(phi), psi) (reference: boundedConvectionScheme),
    which keeps transport bounded while the flux is not yet
    conservative. env carries registry fields time-/state-dependent BCs
    read at assembly time (the reference's updateCoeffs-before-assembly
    contract); 'phi' is always provided."""
    if isinstance(scheme, tuple) and len(scheme) and scheme[0] == "bounded":
        from . import fvc
        inner = div(mesh, phi, vf, scheme[1], env)
        div_phi = fvc.surface_sum_faces(mesh, phi.data) / mesh.V
        sp = Sp(mesh, Dimensioned("div(phi)", phi.dims / _VOL, div_phi),
                vf)
        return inner - sp
    env = dict(env) if env else {}
    env.setdefault("phi", phi)
    w = scheme_weights(mesh, vf, scheme, phi)
    phi_i = phi.data[:mesh.n_internal]
    lower = -w * phi_i
    upper = lower + phi_i
    diag = _neg_sum_diag(mesh, lower, upper)

    m = FvMatrix.zeros(mesh, vf, phi.dims * vf.dims,
                       symmetric=False)
    ics, bcs_ = [], []
    for i, (patch, bc, bd) in enumerate(
            zip(mesh.patches, vf.bcs, vf.bcdata)):
        if not bc.assembles or patch.size == 0:
            ics.append(m.internal_coeffs[i])
            bcs_.append(m.boundary_coeffs[i])
            continue
        phi_b = phi.data[patch.start:patch.start + patch.size]
        if getattr(bc, "coupled", False):
            # implicit interface, UPWINDED: the interior runs the
            # requested (possibly limited) scheme, but a centrally
            # interpolated interface face destabilizes limited
            # transport, so the coupled face takes the upwind value
            # (owner for outflow, ghost for inflow). boundary_coeffs
            # stores the ghost coefficient in the explicit-sign
            # convention; the SpMV applies it against partner values.
            up = (phi_b >= 0.0).astype(phi_b.dtype)
            shape = (patch.size,) + vf.data.shape[1:]
            if vf.data.ndim > 1:
                up = up[:, None]
                phi_b = phi_b[:, None]
            ics.append(jnp.broadcast_to(phi_b * up, shape))
            bcs_.append(jnp.broadcast_to(-phi_b * (1.0 - up), shape))
            continue
        vic, vbc = bc.value_coeffs(mesh, patch, vf, bd, env=env)
        phi_b = _ext(phi_b, vbc)
        ics.append(phi_b * vic * jnp.ones_like(vbc))
        bcs_.append(-phi_b * vbc)
    m = m.replace(diag=diag, lower=lower, upper=upper,
                  internal_coeffs=tuple(ics),
                  boundary_coeffs=tuple(bcs_))
    return _apply_jumps(mesh, vf, m, env)


# ---------------------------------------------------------------------------
# diffusion
# ---------------------------------------------------------------------------

def _gamma_faces(mesh, gamma):
    from .fvc import face_values
    if isinstance(gamma, VolField):
        return face_values(mesh, gamma), gamma.dims
    if isinstance(gamma, SurfaceField):
        return gamma.data, gamma.dims
    if isinstance(gamma, Dimensioned):
        return jnp.broadcast_to(jnp.asarray(gamma.value, mesh.V.dtype),
                                (mesh.n_faces,)), gamma.dims
    return jnp.broadcast_to(jnp.asarray(gamma, mesh.V.dtype),
                            (mesh.n_faces,)), dimless


def laplacian(mesh: MeshArrays, gamma, vf: VolField,
              scheme: str = "orthogonal", env=None) -> FvMatrix:
    """fvm::laplacian(gamma, psi) (reference: gaussLaplacianScheme
    fvmLaplacianUncorrected: upper = deltaCoeffs*gamma_f*magSf,
    negSumDiag; boundary via gradient-coefficient hooks). 'corrected'
    adds the explicit non-orthogonal face-flux correction to the source.
    env carries registry fields state-dependent BCs read at assembly
    time (the reference's updateCoeffs-before-assembly contract)."""
    g_f, g_dims = _gamma_faces(mesh, gamma)
    corrected = scheme in ("corrected", "limited")
    dc = mesh.nonorth_delta_coeffs if corrected else mesh.delta_coeffs
    g_int = g_f[:mesh.n_internal] * mesh.mag_sf[:mesh.n_internal] * dc
    diag = _neg_sum_diag(mesh, g_int, g_int)

    m = FvMatrix.zeros(mesh, vf, g_dims * _AREA * vf.dims / dim_length,
                       symmetric=True)
    ics, bcs_ = [], []
    for i, (patch, bc, bd) in enumerate(
            zip(mesh.patches, vf.bcs, vf.bcdata)):
        if not bc.assembles or patch.size == 0:
            ics.append(m.internal_coeffs[i])
            bcs_.append(m.boundary_coeffs[i])
            continue
        gb = g_f[patch.start:patch.start + patch.size] \
            * mesh.patch_mag_sf(patch)
        if getattr(bc, "coupled", False):
            # implicit interface: snGrad = dc*(ghost - psi_c); the
            # ghost part's coefficient (per unit ghost, explicit-sign
            # convention) goes to boundary_coeffs for the SpMV hook
            gic = bc.gradient_internal_coeff(mesh, patch, vf, bd, env)
            gbx = _ext(gb, gic)
            ics.append(gbx * gic)
            bcs_.append(gbx * gic)      # = -gb*dc
            continue
        gic, gbc = bc.gradient_coeffs(mesh, patch, vf, bd, env)
        gb = _ext(gb, gbc)
        ics.append(gb * gic * jnp.ones_like(gbc))
        bcs_.append(-gb * gbc)
    m = m.replace(diag=diag, lower=g_int, upper=g_int,
                  internal_coeffs=tuple(ics), boundary_coeffs=tuple(bcs_))

    if corrected:
        # explicit non-orthogonal correction: gamma_f*magSf*(k . grad_f)
        from . import fvc
        g = fvc.grad(mesh, vf)
        gf = fvc.face_values(mesh, g)[:mesh.n_internal]
        if vf.data.ndim == 1:
            corr = (mesh.corr_vecs * gf).sum(-1)
        else:
            corr = (mesh.corr_vecs[:, :, None] * gf).sum(1)
        corr = _ext(g_f[:mesh.n_internal] * mesh.mag_sf[:mesh.n_internal],
                    corr) * corr
        full = jnp.concatenate(
            [corr, jnp.zeros((mesh.n_boundary,) + corr.shape[1:],
                             corr.dtype)], axis=0)
        # the correction joins the operator E, i.e. leaves the source
        corr_cells = fvc.surface_sum_faces(mesh, full, raw=True)
        m = m.replace(source=m.source - corr_cells)
    return _apply_jumps(mesh, vf, m, env)


# ---------------------------------------------------------------------------
# sources
# ---------------------------------------------------------------------------

def Sp(mesh: MeshArrays, sp, vf: VolField) -> FvMatrix:
    """Implicit source fvm::Sp(sp, psi): E += sp*V*psi."""
    sp_data, sp_dims = _coeff(sp)
    m = FvMatrix.zeros(mesh, vf, sp_dims * vf.dims * _VOL, symmetric=True)
    return m.replace(diag=mesh.V_asm * sp_data)


def Su(mesh: MeshArrays, su, vf: VolField) -> FvMatrix:
    """Explicit source fvm::Su(su, psi): E += su*V."""
    su_data, su_dims = _coeff(su)
    m = FvMatrix.zeros(mesh, vf, su_dims * _VOL, symmetric=True)
    return m.replace(source=m.source - _ext(mesh.V_asm, m.source) * su_data)


def SuSp(mesh: MeshArrays, sp, vf: VolField) -> FvMatrix:
    """fvm::SuSp: implicit where stabilizing (sp>0), explicit otherwise."""
    sp_data, sp_dims = _coeff(sp)
    m = FvMatrix.zeros(mesh, vf, sp_dims * vf.dims * _VOL, symmetric=True)
    diag = mesh.V_asm * jnp.maximum(sp_data, 0.0)
    src = -_ext(mesh.V_asm * jnp.minimum(sp_data, 0.0), vf.data) * vf.data
    return m.replace(diag=diag, source=src)


def _coeff(x):
    if isinstance(x, VolField):
        return x.data, x.dims
    if isinstance(x, Dimensioned):
        return x.value, x.dims
    return x, dimless
