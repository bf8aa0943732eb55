"""fvc — explicit finite-volume operators returning fields.

Capability surface of the reference's fvc namespace (reference:
src/finiteVolume/finiteVolume/fvc/fvc.H; core gather kernel
fvcSurfaceIntegrate.C:41-200), re-founded on the padded ELL mesh: every
operator is a regular face gather + masked per-cell reduction — pure XLA,
fully fusable, no scatters.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..fields.field import SurfaceField, VolField
from ..mesh.mesharrays import MeshArrays
from ..utils.dimensions import dim_length, dim_volume, dimless, DimensionSet

_AREA = dim_length ** 2


def _ext(a, like):
    """Append trailing singleton dims to broadcast a face-scalar over a
    (nFaces, ...) field."""
    return a.reshape(a.shape + (1,) * (like.ndim - a.ndim))


# ---------------------------------------------------------------------------
# interpolation
# ---------------------------------------------------------------------------

def face_values(mesh: MeshArrays, vf: VolField,
                scheme: str = "linear", phi: SurfaceField | None = None
                ) -> jnp.ndarray:
    """Face values on ALL faces: internal by the scheme, boundary from the
    field's materialized patch values."""
    from .interpolation import interpolate_internal
    internal = interpolate_internal(mesh, vf, scheme, phi)
    return jnp.concatenate([internal, vf.bvalues], axis=0)


def interpolate(mesh: MeshArrays, vf: VolField, scheme: str = "linear",
                phi: SurfaceField | None = None) -> SurfaceField:
    return SurfaceField(face_values(mesh, vf, scheme, phi), vf.dims,
                        f"interpolate({vf.name})")


# ---------------------------------------------------------------------------
# the core gather kernel
# ---------------------------------------------------------------------------

def surface_sum_faces(mesh: MeshArrays, face_data: jnp.ndarray,
                      signed: bool = True, raw: bool = False
                      ) -> jnp.ndarray:
    """Per-cell sum of face data over the cell's ELL slots.

    The TPU equivalent of the reference's cell-gather functor
    (fvcSurfaceIntegrate.C:41-100): out[c] = sum_k sign[c,k]*x[face[c,k]].
    Structured boxes use the gather-free padded-difference kernels
    (mesh/structured.py); gdia lattice meshes the plane-shift kernels
    (mesh/gdia.py). On gdia meshes the result is folded to primary slots
    and ghost-synced (cell-field semantics) unless raw=True, which keeps
    the per-SLOT partial sums (assembly space: the matrix fold happens
    later in component_system)."""
    s = mesh.structured
    if s is not None:
        from ..mesh import structured as st
        out = st.surface_sum_internal(s, face_data[:mesh.n_internal],
                                      signed)
        out = st.add_boundary_to_grid(mesh, s, out,
                                      face_data[mesh.n_internal:])
        return out.reshape((mesh.n_cells,) + face_data.shape[1:])
    g = mesh.gdia
    if g is not None:
        from ..mesh import gdia as gd
        out = gd.surface_sum_internal(g, face_data[:mesh.n_internal],
                                      signed)
        # ONE batched scatter for all non-empty patches (bnd_sel skips
        # empty-patch faces, matching the per-patch loop this replaces)
        out = mesh.add_at_boundary_cells(out,
                                         face_data[mesh.n_internal:])
        if raw:
            return out
        return gd.sync(g, gd.fold(g, out))
    gathered = jnp.take(face_data, mesh.cell_faces, axis=0)
    w = mesh.cell_sign if signed else jnp.abs(mesh.cell_sign)
    return (gathered * _ext(w, gathered)).sum(axis=1)


def surface_integrate(mesh: MeshArrays, ssf: SurfaceField) -> VolField:
    """(1/V) * sum of owner-outward face values (fvc::surfaceIntegrate)."""
    summed = surface_sum_faces(mesh, ssf.data)
    data = summed / _ext(mesh.V, summed)
    return _extrapolated(mesh, data, ssf.dims / dim_volume,
                         f"surfaceIntegrate({ssf.name})")


def surface_sum(mesh: MeshArrays, ssf: SurfaceField) -> VolField:
    """Unsigned per-cell sum (fvc::surfaceSum)."""
    return _extrapolated(mesh, surface_sum_faces(mesh, ssf.data, False),
                         ssf.dims, f"surfaceSum({ssf.name})")


def boundary_owner_values(mesh: MeshArrays, data: jnp.ndarray
                          ) -> jnp.ndarray:
    """data at the owner cell of every boundary face (bstart order) —
    slab slices on structured boxes, one take otherwise. Empty-patch
    faces (2*nCells of them on a 2D mesh) are never consumed by any
    face sum (they are excluded from the ELL), so skip their gather and
    fill 1.0 — NOT 0.0, which would manufacture inf/NaN downstream in
    pointwise arithmetic (1/A, rAU*H)."""
    s = mesh.structured
    if s is not None:
        from ..mesh import structured as st
        return st.boundary_owner_values(mesh, s, data)
    if mesh.gdia is not None and data.ndim >= 2 \
            and not any(p.is_empty and p.size for p in mesh.patches):
        # per-component gathers over contiguous (n,) slices: a gather
        # on an (n, 3) array forces the 42x-padded row-major layout
        # (see MeshArrays.add_at_boundary_cells)
        idx = mesh.owner[mesh.n_internal:]
        n = data.shape[0]
        rank = data.shape[1:]
        flat = data.reshape(n, -1)
        cols = [jnp.take(flat[:, c], idx) for c in range(flat.shape[1])]
        return jnp.stack(cols, axis=1).reshape((idx.shape[0],) + rank)
    if any(p.is_empty and p.size for p in mesh.patches):
        parts = []
        for p in mesh.patches:
            if p.size == 0:
                continue
            if p.is_empty:
                parts.append(jnp.ones((p.size,) + data.shape[1:],
                                      data.dtype))
            else:
                parts.append(jnp.take(
                    data, mesh.owner[p.start:p.start + p.size], axis=0))
        if not parts:
            return data[:0]
        return parts[0] if len(parts) == 1 else \
            jnp.concatenate(parts, axis=0)
    return jnp.take(data, mesh.owner[mesh.n_internal:], axis=0)


def _extrapolated(mesh: MeshArrays, data, dims, name="") -> VolField:
    """Wrap cell data as a VolField with zero-order extrapolated boundary
    values and calculated BCs."""
    from ..fields.bcs import Calculated
    bvalues = boundary_owner_values(mesh, data)
    bcs = tuple(Calculated(i) for i in range(len(mesh.patches)))
    return VolField(data, bvalues, bcs, dims, name,
                    tuple({} for _ in mesh.patches))


# ---------------------------------------------------------------------------
# operators
# ---------------------------------------------------------------------------

def _gdia_rows_tail(mesh: MeshArrays, g_, rows, brows):
    """Shared tail of the cell-axis-last Gauss pipelines: add the
    boundary-face contributions (sorted segment sums per row), fold
    ghost partials into primaries, restore the ghost-sync invariant,
    divide by cell volumes. rows (C, n); brows list of C (nb,) arrays
    (bstart order) or None."""
    import jax.ops

    from ..mesh import gdia as gd
    n = g_.n_lat
    if brows is not None and mesh.bnd_cells is not None:
        out_rows = []
        for c in range(rows.shape[0]):
            vals = jnp.take(brows[c], mesh.bnd_sel)
            out_rows.append(rows[c] + jax.ops.segment_sum(
                vals, mesh.bnd_cells, num_segments=n,
                indices_are_sorted=True))
        rows = jnp.stack(out_rows, axis=0)
    y = gd.sync_last(g_, gd.fold_last(g_, rows))
    return y / mesh.V[None, :]


def div(mesh: MeshArrays, a, b=None, scheme: str = "linear") -> VolField:
    """fvc::div(ssf) or fvc::div(phi, vf) (Gauss)."""
    if b is None:
        assert isinstance(a, SurfaceField)
        return surface_integrate(mesh, a)
    phi, vf = a, b
    face_v = face_values(mesh, vf, scheme, phi)
    flux_f = _ext(phi.data, face_v) * face_v
    return surface_integrate(
        mesh, SurfaceField(flux_f, phi.dims * vf.dims,
                           f"div({phi.name},{vf.name})"))


def div_tensor(mesh: MeshArrays, T: VolField) -> VolField:
    """fvc::div of a rank-2 tensor field -> vector field: per cell
    (1/V) sum_f Sf_i T_ij (used by divDevReff's explicit stress term)."""
    from ..utils.switches import enabled as _sw
    if mesh.gdia is not None and mesh.gauss is not None \
            and _sw("GDIA_MAC"):
        # fused shift-MAC fast path (see fvc.grad): contraction over i
        # of the grad planes applied to T[:, i, j] — no (nF, 3, 3)
        # face-value materialization, cell-axis-last throughout
        from ..mesh import gdia as gd
        from ..parallel.hooks import halo
        g_ = mesh.gdia
        Tt = jnp.transpose(halo(T.data), (1, 2, 0))     # (3, 3, n)
        Tt = gd.sync_last(g_, Tt)
        Sfb = mesh.Sf[mesh.n_internal:]
        rows = jnp.stack(
            [sum(gd.gauss_mac1(g_, mesh.gauss, i, Tt[i, c])
                 for i in range(3)) for c in range(3)], axis=0)
        brows = [sum(Sfb[:, i] * T.bvalues[:, i, c] for i in range(3))
                 for c in range(3)]
        y = _gdia_rows_tail(mesh, g_, rows, brows)
        return _extrapolated(mesh, y.T, T.dims / dim_length,
                             f"div({T.name})")
    fv = face_values(mesh, T)                       # (nF, 3, 3)
    face_term = (mesh.Sf[:, :, None] * fv).sum(1)   # (nF, 3)
    summed = surface_sum_faces(mesh, face_term)
    data = summed / _ext(mesh.V, summed)
    return _extrapolated(mesh, data, T.dims / dim_length,
                         f"div({T.name})")


def dev_transpose_grad(mesh: MeshArrays, U: VolField) -> VolField:
    """dev(T(grad(U))) (reference: divDevReff's explicit part)."""
    import jax.numpy as jnp_
    g = grad(mesh, U)

    def f(t):
        tr = jnp_.trace(t, axis1=-2, axis2=-1)
        eye = jnp_.eye(3, dtype=t.dtype)
        return jnp_.swapaxes(t, -1, -2) \
            - (tr / 3.0)[..., None, None] * eye
    return g.with_calculated_bcs(f(g.data), f(g.bvalues), g.dims,
                                 f"devT(grad({U.name}))")


def div_dev_t_grad(mesh: MeshArrays, U: VolField, nu_eff) -> VolField:
    """Fused fvc::div(nuEff * dev(T(grad U))) for gdia lattice meshes.

    The generic chain (grad -> (n,3,3) tensor field -> face values ->
    Sf contraction -> surface sum) materializes dozens of (n,3,3) and
    (nF,3,3) intermediates (measured ~4.5 GB HBM at 115k cells); here
    the nine gradient columns stay separate contiguous (n,) arrays
    through the whole pipeline (shift-MAC Gauss sums per column, dev/
    transpose as column permutations, divergence as plane-coefficient
    contractions), with only boundary-sized tensors materialized.
    Matches div_tensor(dev_transpose_grad(U) * nuEff) to roundoff."""
    from ..mesh import gdia as gd
    from ..parallel.hooks import halo
    g_ = mesh.gdia
    planes = mesh.gauss
    n = g_.n_lat
    x = gd.sync(g_, halo(U.data))
    Sfb = mesh.Sf[mesh.n_internal:]

    # gradient rows G[j*3 + i] = dU_j/dx_i (interior Gauss sums),
    # cell-axis-last
    parts = [gd.gauss_mac3(g_, planes, x[:, j]) for j in range(3)]
    rows = jnp.concatenate(parts, axis=0)               # (9, n)
    brows = [Sfb[:, i] * U.bvalues[:, j]
             for j in range(3) for i in range(3)]
    G = _gdia_rows_tail(mesh, g_, rows, brows)          # (9, n)

    def gcol(i, j):
        return G[j * 3 + i]

    # boundary-owner gradient tensor + snGrad correction
    # (gaussGrad::correctBoundaryConditions on the (nb, 3, 3) tile)
    idx = mesh.owner[mesh.n_internal:]
    gb = jnp.stack(
        [jnp.stack([jnp.take(gcol(i, j), idx) for j in range(3)], 1)
         for i in range(3)], 1)                         # (nb, 3, 3)
    for bc, bd in zip(U.bcs, U.bcdata):
        patch = mesh.patches[bc.patch]
        if patch.is_empty or patch.size == 0:
            continue
        nv = mesh.patch_normals(patch)
        sl = slice(patch.bstart, patch.bstart + patch.size)
        gc = gb[sl]
        sngrad = bc.snGrad(mesh, patch, U, bd)
        ndotg = (nv[:, :, None] * gc).sum(1, keepdims=True)
        corrected = gc - nv[:, :, None] * ndotg \
            + nv[:, :, None] * sngrad[:, None, :]
        gb = gb.at[sl].set(corrected)

    # devT = nuEff * (g^T - tr(g)/3 * I), kept as rows. nuEff must be
    # ghost-synced (the generic path syncs the whole tensor field
    # before interpolation; G is synced by construction).
    nu_d = nu_eff.data if hasattr(nu_eff, "data") else nu_eff
    nu_d = gd.sync(g_, halo(nu_d))
    nu_b = nu_eff.bvalues if hasattr(nu_eff, "bvalues") else nu_eff
    tr = gcol(0, 0) + gcol(1, 1) + gcol(2, 2)

    def T_ic(i, c):   # T_{ic} = nu * (gcols[c][i] - delta_ic tr/3)
        t = gcol(c, i)
        if i == c:
            t = t - tr / 3.0
        return nu_d * t
    trb = gb[:, 0, 0] + gb[:, 1, 1] + gb[:, 2, 2]
    eye = jnp.eye(3, dtype=gb.dtype)
    Tb = (nu_b[:, None, None] if nu_b.ndim == 1 else nu_b) \
        * (jnp.swapaxes(gb, 1, 2) - (trb / 3.0)[:, None, None] * eye)

    # divergence: out_c = (1/V) [ sum_i planes_i(T_{ic}) + boundary ]
    rows2 = jnp.stack(
        [sum(gd.gauss_mac1(g_, planes, i, T_ic(i, c))
             for i in range(3)) for c in range(3)], axis=0)
    brows2 = [sum(Sfb[:, i] * Tb[:, i, c] for i in range(3))
              for c in range(3)]
    out = _gdia_rows_tail(mesh, g_, rows2, brows2)
    data = out.T
    nu_dims = nu_eff.dims if hasattr(nu_eff, "dims") else dimless
    dims = nu_dims * U.dims / dim_length / dim_length
    return _extrapolated(mesh, data, dims, f"div(devT(grad({U.name})))")


_LSQ_CACHE: dict = {}


def _lsq_vectors(mesh: MeshArrays):
    """Per-ELL-slot least-squares gradient vectors (reference:
    gradSchemes/leastSquaresGrad/leastSquaresVectors.C:54-130):
    v_k = w_k * G^-1 d_k with w_k = 1/|d_k|^2 and
    G = sum_k w_k d_k d_k^T over internal neighbours AND boundary faces.
    Host numpy, cached per mesh; trace-safe (stored as numpy)."""
    import numpy as np
    key = id(mesh.ell_coeff_idx)
    hit = _LSQ_CACHE.get(key)
    if hit is not None and hit[0] is mesh.ell_coeff_idx:
        return hit[1]
    try:
        nbr = np.asarray(mesh.cell_nbr)
        sign = np.asarray(mesh.cell_sign)
        internal = np.asarray(mesh.internal_mask)
        faces = np.asarray(mesh.cell_faces)
        C = np.asarray(mesh.C)
        Cf = np.asarray(mesh.Cf)
    except Exception:
        _LSQ_CACHE[key] = (mesh.ell_coeff_idx, None)
        return None                     # traced mesh: fall back to Gauss
    n, K = nbr.shape
    active = sign != 0.0
    d = np.where((internal > 0.5)[..., None],
                 C[nbr] - C[:, None, :],
                 Cf[faces] - C[:, None, :])
    d = np.where(active[..., None], d, 0.0)
    dd = (d * d).sum(-1)
    w = np.where(active, 1.0 / np.maximum(dd, 1e-30), 0.0)
    G = np.einsum("nk,nki,nkj->nij", w, d, d)
    # 2D meshes: regularize the empty direction
    tr = np.trace(G, axis1=1, axis2=2)
    G = G + 1e-12 * tr[:, None, None] * np.eye(3)
    Ginv = np.linalg.inv(G)
    v = w[..., None] * np.einsum("nij,nkj->nki", Ginv, d)
    info = dict(v=v.astype(np.float64),
                bidx=np.maximum(faces - mesh.n_internal, 0))
    _LSQ_CACHE[key] = (mesh.ell_coeff_idx, info)
    return info


def grad_least_squares(mesh: MeshArrays, vf: VolField) -> VolField:
    """Least-squares gradient (reference: leastSquaresGrad.C:51-107):
    grad = sum_k v_k (psi_k - psi_c) over neighbours and boundary
    faces — second-order on arbitrary meshes."""
    from ..parallel.hooks import halo
    info = _lsq_vectors(mesh)
    if info is None:
        return grad(mesh, vf, "linear")
    v = jnp.asarray(info["v"], vf.data.dtype)            # (n, K, 3)
    psi_n = jnp.take(halo(vf.data), mesh.cell_nbr, axis=0)
    psi_b = jnp.take(vf.bvalues, jnp.asarray(info["bidx"]), axis=0)
    im = mesh.internal_mask
    psi_k = _ext(im, psi_n) * psi_n + _ext(1.0 - im, psi_b) * psi_b
    dpsi = psi_k - (vf.data[:, None, :] if vf.data.ndim > 1
                    else vf.data[:, None])
    if vf.data.ndim == 1:
        data = (v * dpsi[..., None]).sum(1)              # (n, 3)
    else:
        data = (v[..., None] * dpsi[:, :, None, :]).sum(1)  # (n, 3, r)
    g = _extrapolated(mesh, data, vf.dims / dim_length,
                      f"grad({vf.name})")
    return _grad_correct_boundary(mesh, g, vf)


def grad(mesh: MeshArrays, vf: VolField, scheme: str = "linear") -> VolField:
    """Gauss gradient with boundary normal-gradient correction (reference:
    gradSchemes/gaussGrad/gaussGrad.C:51-101 + correctBoundaryConditions).

    scalar -> vector; vector -> tensor with (grad U)[i,j] = dU_j/dx_i.
    'leastSquares' dispatches to the least-squares form; tuple specs
    ('cellLimited'|..., inner, k) apply the slope limiter.
    """
    if isinstance(scheme, tuple) and scheme[0] in (
            "cellLimited", "cellMDLimited", "faceLimited",
            "faceMDLimited"):
        inner = grad(mesh, vf, scheme[1])
        return _cell_limit_grad(mesh, vf, inner, float(scheme[2]))
    if scheme == "leastSquares":
        return grad_least_squares(mesh, vf)
    from ..utils.switches import enabled as _sw
    if scheme == "linear" and mesh.gdia is not None \
            and mesh.gauss is not None and _sw("GDIA_MAC"):
        # fused shift-MAC fast path (mesh/gdia.py build_gauss_planes +
        # ops/pallas_gdia.py kernel): precomputed coefficient planes
        # collapse the interpolate -> Sf-multiply -> surface-sum
        # pipeline into one cell-axis-last MAC per component, with the
        # boundary fold and ghost fold/sync batched over rows
        from ..mesh import gdia as gd
        from ..parallel.hooks import halo
        g_ = mesh.gdia
        x = gd.sync(g_, halo(vf.data))
        Sfb = mesh.Sf[mesh.n_internal:]
        if x.ndim == 1:
            rows = gd.gauss_mac3(g_, mesh.gauss, x)      # (3, n)
            brows = [Sfb[:, i] * vf.bvalues for i in range(3)]
            y = _gdia_rows_tail(mesh, g_, rows, brows)
            data = y.T
        else:
            m = x.shape[1]
            parts = [gd.gauss_mac3(g_, mesh.gauss, x[:, j])
                     for j in range(m)]                  # (3, n) each
            rows = jnp.concatenate(parts, axis=0)        # (3m, n)
            brows = [Sfb[:, i] * vf.bvalues[:, j]
                     for j in range(m) for i in range(3)]
            y = _gdia_rows_tail(mesh, g_, rows, brows)
            # row r = j*3 + i -> out[s, i, j]
            data = jnp.transpose(y.reshape(m, 3, y.shape[-1]),
                                 (2, 1, 0))
        g = _extrapolated(mesh, data, vf.dims / dim_length,
                          f"grad({vf.name})")
        return _grad_correct_boundary(mesh, g, vf)
    fv = face_values(mesh, vf, scheme)
    if fv.ndim == 1:
        face_term = mesh.Sf * fv[:, None]                  # (nF, 3)
    else:
        face_term = mesh.Sf[:, :, None] * fv[:, None, :]   # (nF, 3, rank)
    summed = surface_sum_faces(mesh, face_term)
    data = summed / _ext(mesh.V, summed)
    g = _extrapolated(mesh, data, vf.dims / dim_length, f"grad({vf.name})")
    return _grad_correct_boundary(mesh, g, vf)


def _grad_correct_boundary(mesh: MeshArrays, g: VolField,
                           vf: VolField, gc_all=None) -> VolField:
    """Replace the patch-normal gradient component with the BC's exact
    snGrad (reference: gaussGrad::correctBoundaryConditions). gc_all
    optionally supplies the precomputed boundary-owner gradient values
    (nb, 3[, r]) in bstart order, saving the per-patch cell gathers."""
    bvalues = g.bvalues
    for bc, bd in zip(vf.bcs, vf.bcdata):
        patch = mesh.patches[bc.patch]
        if patch.is_empty or patch.size == 0:
            continue
        n = mesh.patch_normals(patch)                      # (np, 3)
        gc = (mesh.patch_cell_values(patch, g.data)
              if gc_all is None else
              gc_all[patch.bstart:patch.bstart + patch.size])
        sngrad = bc.snGrad(mesh, patch, vf, bd)            # (np[, r])
        if gc.ndim == 2:   # gradient of a scalar: (np, 3)
            corrected = gc - n * (n * gc).sum(-1, keepdims=True) \
                + n * sngrad[:, None]
        else:              # gradient of a vector: (np, 3, r)
            ndotg = (n[:, :, None] * gc).sum(1, keepdims=True)
            corrected = gc - n[:, :, None] * ndotg \
                + n[:, :, None] * sngrad[:, None, :]
        bvalues = bvalues.at[patch.bstart:patch.bstart + patch.size].set(
            corrected)
    return g.replace(bvalues=bvalues)


def face_own_nei(mesh: MeshArrays, data: jnp.ndarray):
    """(owner, neighbour) cell values on internal faces — slices on
    structured boxes, two takes otherwise. data must be halo-fresh."""
    s = mesh.structured
    if s is not None:
        from ..mesh import structured as st
        return st.own_nei(s, data)
    if mesh.gdia is not None:
        from ..mesh import gdia as gd
        return gd.face_own_nei(mesh.gdia, data)
    own = jnp.take(data, mesh.owner[:mesh.n_internal], axis=0)
    nei = jnp.take(data, mesh.neighbour, axis=0)
    return own, nei


def sn_grad(mesh: MeshArrays, vf: VolField) -> SurfaceField:
    """Surface-normal gradient (orthogonal; corrected scheme in snGradSchemes)."""
    from ..parallel.hooks import halo
    own_v, nei_v = face_own_nei(mesh, halo(vf.data))
    d_int = nei_v - own_v
    internal = d_int * _ext(mesh.delta_coeffs, d_int)
    psi_c = boundary_owner_values(mesh, vf.data)
    d_b = vf.bvalues - psi_c
    boundary = d_b * _ext(mesh.b_delta_coeffs, d_b)
    return SurfaceField(jnp.concatenate([internal, boundary], axis=0),
                        vf.dims / dim_length, f"snGrad({vf.name})")


def laplacian(mesh: MeshArrays, gamma, vf: VolField) -> VolField:
    """fvc::laplacian(gamma, vf) = surfaceIntegrate(gamma_f*magSf*snGrad)."""
    sng = sn_grad(mesh, vf)
    if isinstance(gamma, VolField):
        g_f = face_values(mesh, gamma)
        g_dims = gamma.dims
    elif isinstance(gamma, SurfaceField):
        g_f, g_dims = gamma.data, gamma.dims
    else:
        from ..fields.field import Dimensioned
        if isinstance(gamma, Dimensioned):
            g_f, g_dims = gamma.value, gamma.dims
        else:
            g_f, g_dims = gamma, dimless
    flux_f = _ext(g_f * mesh.mag_sf, sng.data) * sng.data
    return surface_integrate(
        mesh, SurfaceField(flux_f, g_dims * _AREA * sng.dims,
                           f"laplacian({vf.name})"))


def flux(mesh: MeshArrays, U: VolField) -> SurfaceField:
    """Volumetric face flux phi = interpolate(U) & Sf (createPhi.H)."""
    from ..utils.switches import enabled as _sw
    if mesh.gdia is not None and mesh.gauss is not None \
            and _sw("GDIA_MAC"):
        # fused per-plane MAC (see fvc.grad): no (nF, 3) face-value
        # materialization
        from ..mesh import gdia as gd
        from ..parallel.hooks import halo
        g_ = mesh.gdia
        x = gd.sync(g_, halo(U.data))
        internal = gd.flux_mac(g_, mesh.Sf, mesh.weights, x)
        b = (U.bvalues * mesh.Sf[mesh.n_internal:]).sum(-1)
        return SurfaceField(jnp.concatenate([internal, b]),
                            U.dims * _AREA, "phi")
    fv = face_values(mesh, U)
    return SurfaceField((fv * mesh.Sf).sum(-1), U.dims * _AREA,
                        "phi")


def constrain_hbya(mesh: MeshArrays, hbya: VolField,
                   U: VolField) -> VolField:
    """Impose U's boundary values on HbyA where U's BC fixes the value
    (reference: cfdTools/general constrainHbyA; in 2.x achieved by cloning
    U's BCs onto HbyA) — this is what makes wall fluxes exactly zero and
    closed-domain continuity machine-precision."""
    b = hbya.bvalues
    for bc, patch in zip(U.bcs, mesh.patches):
        if bc.fixes_value and patch.size:
            sl = slice(patch.bstart, patch.bstart + patch.size)
            b = b.at[sl].set(U.bvalues[sl])
    return hbya.replace(bvalues=b)


def adjust_phi(mesh: MeshArrays, phi: SurfaceField, U: VolField
               ) -> SurfaceField:
    """Balance the global boundary flux over non-value-fixing patches so a
    closed/underdetermined domain conserves mass exactly (reference:
    cfdTools/general/adjustPhi/adjustPhi.H:27-29). Scales outflow to match
    inflow over adjustable patches; no-op if there are none."""
    import jax.numpy as jnp_
    fixed_in = jnp_.zeros((), phi.data.dtype)
    adj_in = jnp_.zeros((), phi.data.dtype)
    adj_out = jnp_.zeros((), phi.data.dtype)
    adjustable = []
    for bc, patch in zip(U.bcs, mesh.patches):
        if patch.size == 0 or patch.is_empty:
            continue
        pphi = phi.data[patch.start:patch.start + patch.size]
        if bc.fixes_value:
            fixed_in = fixed_in + pphi.sum()
        else:
            adjustable.append(patch)
            adj_in = adj_in + jnp_.minimum(pphi, 0.0).sum()
            adj_out = adj_out + jnp_.maximum(pphi, 0.0).sum()
    if not adjustable:
        return phi
    # GLOBAL balance (reference: adjustPhi's gSum) — under shard_map a
    # shard holding only outlet faces would otherwise compute
    # scale = -0/adj_out = 0 and wall off the outlet (found by the 3-D
    # channel decomposition dryrun; identity on a single chip)
    from ..parallel.hooks import psum_all
    fixed_in = psum_all(fixed_in)
    adj_in = psum_all(adj_in)
    adj_out = psum_all(adj_out)
    # scale outflow so total = 0: out_scale = -(fixed + adj_in)/adj_out
    scale = -(fixed_in + adj_in) / jnp_.where(adj_out == 0.0, 1e-30,
                                              adj_out)
    data = phi.data
    for patch in adjustable:
        sl = slice(patch.start, patch.start + patch.size)
        pphi = data[sl]
        data = data.at[sl].set(jnp_.where(pphi > 0.0, pphi * scale, pphi))
    return phi.replace_data(data) if hasattr(phi, "replace_data") else \
        SurfaceField(data, phi.dims, phi.name)


def reconstruct(mesh: MeshArrays, ssf: SurfaceField) -> VolField:
    """Reconstruct a cell vector from face fluxes (fvc::reconstruct):
    (sum_f Sf⊗Sf/|Sf·dhat|)^-1 · sum_f Sf*ssf_f — simplified inverse-dyad
    form sum(Sf⊗Sf/magSf)^-1 & sum(Sf ssf/magSf)."""
    sf_over_mag = mesh.Sf / jnp.maximum(mesh.mag_sf, 1e-30)[:, None]
    dyad_f = sf_over_mag[:, :, None] * mesh.Sf[:, None, :]
    rhs_f = sf_over_mag * ssf.data[:, None]
    dyad = surface_sum_faces(mesh, dyad_f, signed=False)
    # Sf*ssf is orientation-invariant (both factors flip sign when viewed
    # from the neighbour), so the cell sum is UNSIGNED — a signed sum
    # cancels the two sides and silently returns ~0
    rhs = surface_sum_faces(mesh, rhs_f, signed=False)
    # 2D meshes (empty patches excluded from the ELL) leave a zero
    # row/column for the empty direction — regularize so the solve stays
    # nonsingular (the corresponding rhs component is zero anyway)
    tr = jnp.trace(dyad, axis1=-2, axis2=-1)
    eye = jnp.eye(3, dtype=dyad.dtype)
    dyad = dyad + (1e-10 * tr)[:, None, None] * eye
    # closed-form 3x3 solve (adjugate/Cramer): pure elementwise math —
    # avoids the LuDecomposition custom call, which is F32-only on TPU
    a = dyad
    c00 = a[:, 1, 1] * a[:, 2, 2] - a[:, 1, 2] * a[:, 2, 1]
    c01 = a[:, 1, 2] * a[:, 2, 0] - a[:, 1, 0] * a[:, 2, 2]
    c02 = a[:, 1, 0] * a[:, 2, 1] - a[:, 1, 1] * a[:, 2, 0]
    c10 = a[:, 0, 2] * a[:, 2, 1] - a[:, 0, 1] * a[:, 2, 2]
    c11 = a[:, 0, 0] * a[:, 2, 2] - a[:, 0, 2] * a[:, 2, 0]
    c12 = a[:, 0, 1] * a[:, 2, 0] - a[:, 0, 0] * a[:, 2, 1]
    c20 = a[:, 0, 1] * a[:, 1, 2] - a[:, 0, 2] * a[:, 1, 1]
    c21 = a[:, 0, 2] * a[:, 1, 0] - a[:, 0, 0] * a[:, 1, 2]
    c22 = a[:, 0, 0] * a[:, 1, 1] - a[:, 0, 1] * a[:, 1, 0]
    det = a[:, 0, 0] * c00 + a[:, 0, 1] * c01 + a[:, 0, 2] * c02
    rdet = 1.0 / jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)
    adj = jnp.stack([
        jnp.stack([c00, c10, c20], axis=-1),
        jnp.stack([c01, c11, c21], axis=-1),
        jnp.stack([c02, c12, c22], axis=-1)], axis=-2)
    data = rdet[:, None] * (adj * rhs[:, None, :]).sum(-1)
    return _extrapolated(mesh, data, ssf.dims / _AREA,
                         f"reconstruct({ssf.name})")


def average(mesh: MeshArrays, ssf: SurfaceField) -> VolField:
    """Area-weighted face->cell average (fvc::average)."""
    w_sum = surface_sum_faces(mesh, mesh.mag_sf, signed=False)
    v_sum = surface_sum_faces(mesh, _ext(mesh.mag_sf, ssf.data) * ssf.data,
                              signed=False)
    return _extrapolated(mesh, v_sum / _ext(w_sum, v_sum), ssf.dims,
                         f"average({ssf.name})")


def domain_integrate(mesh: MeshArrays, vf: VolField):
    """gSum(V*field) — note: needs psum over shards in distributed runs."""
    return (vf.data * _ext(mesh.V, vf.data)).sum(0)


def ddt(mesh: MeshArrays, vf: VolField, dt) -> VolField:
    """Explicit Euler time derivative (fvc::ddt)."""
    if vf.old is None:
        z = vf * 0.0
        return z.replace(dims=vf.dims / DimensionSet.of(0, 0, 1))
    d = (vf.data - vf.old.data) / dt
    b = (vf.bvalues - vf.old.bvalues) / dt
    return vf.with_calculated_bcs(d, b, vf.dims / DimensionSet.of(0, 0, 1),
                                  f"ddt({vf.name})")


def smooth(mesh: MeshArrays, data: jnp.ndarray, coeff: float,
           sweeps: int = 8) -> jnp.ndarray:
    """fvc::smooth (reference: fvcSmooth/fvcSmooth.C): raise each cell to
    at least coeff * the max of its neighbours. The reference runs a
    FaceCellWave to completion; a bounded sweep count (covering
    `sweeps`-cell distances) is the static-shape TPU equivalent."""
    from jax import lax

    def body(_, f):
        nb = jnp.take(f, mesh.cell_nbr, axis=0).max(1)
        return jnp.maximum(f, coeff * nb)
    return lax.fori_loop(0, sweeps, body, data)


def _cell_limit_grad(mesh: MeshArrays, vf: VolField, g: VolField,
                     k: float) -> VolField:
    """cellLimited slope limiter (reference: gradSchemes/
    limitedGradSchemes/cellLimitedGrad/cellLimitedGrads.C:58-190):
    scale each cell's gradient so face-extrapolated values stay within
    the min/max of its neighbour cells AND boundary face values
    (:116-119), relaxed by k in (0,1]; k=1 full limiting. The MD
    (multi-directional) variants share this scalar cell limiter."""
    from ..parallel.hooks import halo
    data = halo(vf.data)
    psi_n = jnp.take(data, mesh.cell_nbr, axis=0)        # (n, K[, r])
    bidx = jnp.maximum(mesh.cell_faces - mesh.n_internal, 0)
    psi_b = jnp.take(vf.bvalues, bidx, axis=0)
    im = _ext(mesh.internal_mask, psi_n)
    psi_k = im * psi_n + (1.0 - im) * psi_b
    active = _ext(jnp.abs(mesh.cell_sign), psi_k)
    big = jnp.asarray(1e30, vf.data.dtype)
    own = vf.data[:, None]
    psi_max = jnp.maximum(jnp.where(active > 0, psi_k, -big).max(1),
                          vf.data)
    psi_min = jnp.minimum(jnp.where(active > 0, psi_k, big).min(1),
                          vf.data)
    max_d = psi_max - vf.data
    min_d = psi_min - vf.data
    if k < 1.0 - 1e-12:
        span = (1.0 / max(k, 1e-3) - 1.0) * (max_d - min_d)
        max_d = max_d + span
        min_d = min_d - span
    # face extrapolation g . (Cf - C) over the cell's faces
    cf = jnp.take(mesh.Cf, mesh.cell_faces, axis=0)      # (n, K, 3)
    d = cf - mesh.C[:, None, :]
    tiny = jnp.asarray(1e-30, vf.data.dtype)
    if vf.data.ndim == 1:
        proj = (d * g.data[:, None, :]).sum(-1)          # (n, K)
        max_e, min_e = max_d[:, None], min_d[:, None]
        mask = jnp.abs(mesh.cell_sign)
    else:
        proj = (d[:, :, :, None] * g.data[:, None]).sum(2)   # (n,K,r)
        max_e, min_e = max_d[:, None, :], min_d[:, None, :]
        mask = jnp.abs(mesh.cell_sign)[:, :, None]
    lim_f = jnp.where(
        proj > max_e, max_e / jnp.maximum(proj, tiny),
        jnp.where(proj < min_e, min_e / jnp.minimum(proj, -tiny), 1.0))
    lim_f = jnp.where(mask > 0, lim_f, 1.0)
    lim = jnp.clip(lim_f.min(1), 0.0, 1.0)
    new = g.data * (lim[:, None] if vf.data.ndim == 1
                    else lim[:, None, :])
    out = g.replace(data=new)
    return _grad_correct_boundary(mesh, out, vf)
