"""Structured geometric multigrid — the gather-free GAMG fast path.

The aggregation V-cycle (gamg.py) is built from jnp.take gathers; on TPU
a 147k-element gather costs ~2ms while the equivalent reshape is free.
When the mesh is a full structured grid in natural ordering (the same
condition as the DIA SpMV, linalg/banded.py band_info mode='dia'), the
whole multigrid collapses to reshapes:

  - levels are 2x2(x2) cell blocks (geometric coarsening);
  - restriction  = reshape + block-sum          (zero gathers);
  - prolongation = jnp.repeat                    (zero gathers);
  - every level's matrix is 2*dim+1 coefficient PLANES (diag + one per
    face direction), so the level Amul is shifted multiply-adds — the
    DIA trick (banded.py) applied recursively;
  - Galerkin coarse coefficients (P^T A P over the 2x2 block, the exact
    analogue of the reference's face-summed agglomerateMatrix,
    GAMGSolverAgglomerateMatrix.C) are parity-selected block-sums of the
    fine planes — again reshapes.

Capability parity: replaces the device half of the reference GAMG
(restrict/prolong + coarse Amul, GAMGAgglomerationTemplates.C:36-100)
for structured meshes; the aggregation path remains the general-mesh
fallback. Odd grid dimensions are zero-padded (pad cells carry zero
coefficients and unit diag at the coarsest dense solve).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .banded import band_info

_SINFO_CACHE: dict = {}


def structured_info(mesh):
    """(nz, ny, nx) of the natural-ordering structured grid, or None.
    Prefers the build-time detection (mesh.structured); falls back to
    the DIA offset census: 2D grids have offsets {±1, ±nx},
    3D {±1, ±nx, ±nx*ny} (x fastest, natural ordering)."""
    if getattr(mesh, "structured", None) is not None:
        return mesh.structured.shape
    if getattr(mesh, "gdia", None) is not None:
        return mesh.gdia.shape
    traced = isinstance(mesh.cell_nbr, jax.core.Tracer)
    key = id(mesh.cell_nbr)
    if not traced:
        hit = _SINFO_CACHE.get(key)
        if hit is not None and hit[0] is mesh.cell_nbr:
            return hit[1]
    info = band_info(mesh)
    res = None
    if (info is not None and info.mode == "dia"
            and (info.ovf_rows is None or not info.ovf_rows.size)):
        n = info.n
        offs = sorted(o for o in info.offsets if o > 0)
        neg = sorted(-o for o in info.offsets if o < 0)
        if offs == neg:
            if offs == [1]:
                res = (1, 1, n)
            elif len(offs) == 2 and offs[0] == 1:
                nx = offs[1]
                if n % nx == 0:
                    res = (1, n // nx, nx)
            elif len(offs) == 3 and offs[0] == 1:
                nx, nxny = offs[1], offs[2]
                if nxny % nx == 0 and n % nxny == 0:
                    res = (n // nxny, nxny // nx, nx)
    if not traced:  # never cache tracer-keyed entries across traces
        _SINFO_CACHE[key] = (mesh.cell_nbr, res)
    return res


def _planes_from_ell(mesh, ell_coeffs, shape):
    """Per-offset coefficient planes on the (nz, ny, nx) grid from the
    ELL slot arrays: planes[+1][c] = coeff of x[c+1] in row c, etc."""
    info = band_info(mesh)
    nz, ny, nx = shape
    planes = {}
    for d, rows, slots in zip(info.offsets, info.rows, info.slots):
        c = jnp.zeros(mesh.n_cells, ell_coeffs.dtype).at[rows].set(
            ell_coeffs[rows, slots])
        planes[int(d)] = c.reshape(nz, ny, nx)
    for d in (1, nx, nx * ny):
        planes.setdefault(d, None)
        planes.setdefault(-d, None)
    return planes


# plane keys by geometric direction: (axis, sign) -> offset
# x-axis (axis 2): +-1; y-axis (axis 1): +-nx; z-axis (axis 0): +-nx*ny


def _e(p, x):
    """Broadcast a (nz,ny,nx) plane against trailing component axes."""
    if p is None:
        return None
    return p.reshape(p.shape + (1,) * (x.ndim - 3))


def _shift(x, axis, sign):
    """x shifted so result[c] = x[c + sign] along axis, zero-filled."""
    n = x.shape[axis]
    pad = [(0, 0)] * x.ndim
    if sign > 0:
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(1, None)
        pad[axis] = (0, 1)
    else:
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(0, n - 1)
        pad[axis] = (1, 0)
    return jnp.pad(x[tuple(sl)], pad)


class GridLevel:
    """One multigrid level: coefficient planes on a (nz, ny, nx) grid."""

    def __init__(self, shape, diag, planes):
        self.shape = shape            # (nz, ny, nx) python ints
        self.diag = diag              # (nz, ny, nx[, m])
        self.planes = planes          # {offset_key: plane or None}

    def amul(self, x):
        nz, ny, nx = self.shape
        y = self.diag * x
        for axis, key in ((2, 1), (1, nx), (0, nx * ny)):
            pp = self.planes.get(key)
            pm = self.planes.get(-key)
            if pp is not None:
                y = y + _e(pp, x) * _shift(x, axis, +1)
            if pm is not None:
                y = y + _e(pm, x) * _shift(x, axis, -1)
        return y


def _pad_even(a, dims):
    """Zero-pad grid axes listed in dims to even length."""
    pad = [(0, 0)] * a.ndim
    needs = False
    for ax in dims:
        if a.shape[ax] % 2:
            pad[ax] = (0, 1)
            needs = True
    return jnp.pad(a, pad) if needs else a


def _block_sum(a, dims):
    """Sum over 2-cell blocks along grid axes in dims (ascending)."""
    for ax in dims:
        s = a.shape
        ns = s[:ax] + (s[ax] // 2, 2) + s[ax + 1:]
        a = a.reshape(ns).sum(axis=ax + 1)
    return a


def _parity(a, axis, par):
    """Select cells with the given parity along a grid axis."""
    sl = [slice(None)] * a.ndim
    sl[axis] = slice(par, None, 2)
    return a[tuple(sl)]


def coarsen(level: GridLevel) -> GridLevel:
    """Galerkin 2x2(x2) coarsening: crossing faces sum into coarse
    planes, internal faces fold into the coarse diagonal (the exact
    block P^T A P for piecewise-constant P)."""
    nz, ny, nx = level.shape
    cdims = [ax for ax, nn in ((0, nz), (1, ny), (2, nx)) if nn > 1]
    key_of = {2: 1, 1: nx, 0: nx * ny}

    def padded(p):
        return None if p is None else _pad_even(p, cdims)

    diag = padded(level.diag)
    planes = {k: padded(p) for k, p in level.planes.items()}

    d_c = _block_sum(diag, cdims)

    def _add_to_diag(dc, contrib):
        # diag may carry trailing component axes (column-batched vector
        # systems); planes never do
        return dc + contrib.reshape(contrib.shape
                                    + (1,) * (dc.ndim - contrib.ndim))

    shape_c = [1, 1, 1]
    for ax, nn in ((0, nz), (1, ny), (2, nx)):
        shape_c[ax] = (nn + 1) // 2 if ax in cdims else nn
    nz_c, ny_c, nx_c = shape_c
    ckey_of = {2: 1, 1: nx_c, 0: nx_c * ny_c}

    planes_c = {}
    for ax in (0, 1, 2):
        pp = planes.get(key_of[ax])
        pm = planes.get(-key_of[ax])
        if pp is None and pm is None:
            continue
        if ax in cdims:
            # internal faces (even->odd in-block) fold into the diag
            if pp is not None:
                d_c = _add_to_diag(d_c, _block_sum(
                    _parity(pp, ax, 0), [d for d in cdims if d != ax]))
            if pm is not None:
                d_c = _add_to_diag(d_c, _block_sum(
                    _parity(pm, ax, 1), [d for d in cdims if d != ax]))
            # crossing faces (odd->next block) become coarse planes
            others = [d for d in cdims if d != ax]
            if pp is not None:
                planes_c[ckey_of[ax]] = _block_sum(_parity(pp, ax, 1),
                                                   others)
            if pm is not None:
                planes_c[-ckey_of[ax]] = _block_sum(_parity(pm, ax, 0),
                                                    others)
        else:
            # uncoarsened axis (e.g. nz=1): planes just block-sum over
            # the coarsened axes
            if pp is not None:
                planes_c[ckey_of[ax]] = _block_sum(pp, cdims)
            if pm is not None:
                planes_c[-ckey_of[ax]] = _block_sum(pm, cdims)

    # _parity on padded planes keeps coarse shapes consistent: padded
    # cells contribute zero coefficients and zero diag
    return GridLevel((nz_c, ny_c, nx_c), d_c, planes_c)


def restrict(level: GridLevel, r, cdims):
    return _block_sum(_pad_even(r, cdims), cdims)


def prolong(level: GridLevel, xc, cdims):
    nz, ny, nx = level.shape
    for ax in cdims:
        xc = jnp.repeat(xc, 2, axis=ax)
    sl = [slice(None)] * xc.ndim
    sl[0], sl[1], sl[2] = slice(0, nz), slice(0, ny), slice(0, nx)
    return xc[tuple(sl)]


def _chebyshev_grid(level: GridLevel, b, x, degree, lam_max=2.0):
    """Chebyshev smoother on [lam/4, 1.05*lam] of D^-1 A (see
    gamg._chebyshev); all ops elementwise/shift — no gathers."""
    rd = 1.0 / jnp.where(level.diag == 0.0, 1.0, level.diag)
    lmax = 1.05 * lam_max
    lmin = lam_max / 4.0
    theta = 0.5 * (lmax + lmin)
    delta = 0.5 * (lmax - lmin)
    sigma = theta / delta
    rho = 1.0 / sigma
    r = rd * (b - level.amul(x))
    d_vec = r / theta
    for _ in range(degree):
        x = x + d_vec
        r = r - rd * level.amul(d_vec)
        rho_new = 1.0 / (2.0 * sigma - rho)
        d_vec = (rho_new * rho) * d_vec + (2.0 * rho_new / delta) * r
        rho = rho_new
    return x


def _dense_indices(shape):
    """Static (row, col) index arrays for the coarsest dense assembly."""
    nz, ny, nx = shape
    n = nz * ny * nx
    idx = np.arange(n).reshape(nz, ny, nx)
    pairs = {}
    for ax, key in ((2, 1), (1, nx), (0, nx * ny)):
        if shape[ax] == 1:
            continue
        sl_from = [slice(None)] * 3
        sl_to = [slice(None)] * 3
        sl_from[ax] = slice(0, shape[ax] - 1)
        sl_to[ax] = slice(1, None)
        pairs[key] = (idx[tuple(sl_from)].ravel(),
                      idx[tuple(sl_to)].ravel())
    return n, pairs


def make_structured_vcycle(mesh, m, amul_fine, diag, controls,
                           scale_correction: bool,
                           fixed_scale: float = 1.0):
    """Gather-free V-cycle over geometric 2x2(x2) levels, or None when
    the mesh is not a structured natural-ordering grid. Same call
    contract as gamg.make_vcycle."""
    shape = structured_info(mesh)
    if shape is None:
        return None
    # the reshape-MG levels are gather-free and near-free per level, so
    # the reference's 32-cell coarsest is the right default here (unlike
    # the aggregation path's TPU-tuned gamg.gamg_shape)
    n_coarsest = max(int(getattr(controls, "n_coarsest_cells", None)
                         or 32), 8)
    n_pre = getattr(controls, "n_pre_sweeps", 0)
    n_post = getattr(controls, "n_post_sweeps", 2)
    n_finest = getattr(controls, "n_finest_sweeps", 2)

    nz, ny, nx = shape
    rank = diag.ndim - 1  # trailing comp axes (column-batched system)

    if getattr(mesh, "gdia", None) is not None:
        # lattice-preconditioner diag hygiene: the folded system gives
        # ghost/dead slots identity rows (diag 1.0 — mesh/gdia.py
        # fold_diag) whose scale is arbitrary against ~V*deltaCoeff FV
        # coefficients; summed into 2x2(x2) coarse block diagonals they
        # crush the coarse correction near masked regions. Ghost slots
        # get their primary's diag (their plane couplings are real);
        # dead slots get 0 (no couplings, zero residual — the rd guard
        # in the smoother handles the division).
        from ..mesh import gdia as gd
        g = mesh.gdia
        diag = gd.sync(g, diag) * gd._bcast(1.0 - g.dead, diag)
    d0 = diag.reshape((nz, ny, nx) + diag.shape[1:])
    if getattr(mesh, "structured", None) is not None:
        # gather-free plane construction from the axis-blocked faces
        from ..mesh import structured as st
        planes0 = {d: c.reshape(shape) for d, c in
                   st.dia_planes(mesh.structured, m.lower, m.upper)}
        for d in (1, nx, nx * ny):
            planes0.setdefault(d, None)
            planes0.setdefault(-d, None)
    elif getattr(mesh, "gdia", None) is not None:
        # gdia lattice: planes are slices of the plane-ordered faces.
        # The ghost fold/sync coupling of merged cells is NOT in the
        # planes — the V-cycle preconditions the pure-lattice operator
        # (exact for ~96% of faces); the Krylov wrapper supplies the
        # exact matrix. The cycle output is masked to primary slots so
        # the preconditioner stays SPD on the live subspace.
        from ..mesh import gdia as gd
        planes0 = {d: c.reshape(shape) for d, c in
                   gd.dia_planes(mesh.gdia, m.lower, m.upper)}
        for d in (1, nx, nx * ny):
            planes0.setdefault(d, None)
            planes0.setdefault(-d, None)
    else:
        planes0 = _planes_from_ell(mesh, m.ell_coeffs(mesh), shape)
    lv0 = GridLevel(shape, d0, planes0)
    levels = [lv0]
    while int(np.prod(levels[-1].shape)) > n_coarsest:
        nzc, nyc, nxc = levels[-1].shape
        if max(nzc, nyc, nxc) <= 2:
            break
        levels.append(coarsen(levels[-1]))
    cdims_of = [
        [ax for ax, nn in ((0, lv.shape[0]), (1, lv.shape[1]),
                           (2, lv.shape[2])) if nn > 1]
        for lv in levels]

    # coarsest dense inverse (computed once per solve, applied as matmul)
    last = levels[-1]
    ncc, pairs = _dense_indices(last.shape)

    def dense_of(dflat):
        a = jnp.zeros((ncc, ncc), dflat.dtype)
        a = a.at[jnp.arange(ncc), jnp.arange(ncc)].set(
            jnp.where(dflat == 0.0, 1.0, dflat))
        for key, (rows, cols) in pairs.items():
            pp = last.planes.get(key)
            pm = last.planes.get(-key)
            if pp is not None:
                sl = [slice(None)] * 3
                ax = {1: 2, last.shape[2]: 1,
                      last.shape[2] * last.shape[1]: 0}[key]
                sl[ax] = slice(0, last.shape[ax] - 1)
                a = a.at[rows, cols].add(pp[tuple(sl)].ravel())
            if pm is not None:
                sl = [slice(None)] * 3
                ax = {1: 2, last.shape[2]: 1,
                      last.shape[2] * last.shape[1]: 0}[key]
                sl[ax] = slice(1, None)
                a = a.at[cols, rows].add(pm[tuple(sl)].ravel())
        return a

    def inv_of(a):
        if a.dtype == jnp.float64 and \
                jax.devices()[0].platform not in ("cpu", "gpu"):
            # TPU LuDecomposition is F32-only; the coarsest-level
            # correction tolerates reduced precision
            return jnp.linalg.inv(a.astype(jnp.float32)).astype(a.dtype)
        return jnp.linalg.inv(a)

    if rank == 0:
        invC = inv_of(dense_of(last.diag.ravel()))
    else:
        mcomp = last.diag.shape[-1]
        invC = inv_of(jnp.stack([
            dense_of(last.diag[..., k].ravel())
            for k in range(mcomp)]))      # batched inverse (mcomp,n,n)

    def smooth(i, b, x, sweeps):
        if sweeps == 0:
            return x
        return _chebyshev_grid(levels[i], b, x, max(2, sweeps + 1))

    def vcycle(x, b):
        grid_shape = (nz, ny, nx) + x.shape[1:]
        xg = x.reshape(grid_shape)
        bg = b.reshape(grid_shape)
        xs, bs = [xg], [bg]
        for i, lv in enumerate(levels[:-1]):
            xi = xs[i]
            if n_pre:
                xi = smooth(i, bs[i], xi, n_pre)
            r = bs[i] - lv.amul(xi)
            xs[i] = xi
            bs.append(restrict(lv, r, cdims_of[i]))
            xs.append(jnp.zeros(levels[i + 1].shape + x.shape[1:],
                                x.dtype))
        # coarsest: dense inverse on the MXU
        bl = bs[-1].reshape((ncc,) + x.shape[1:])
        if rank == 0:
            xl = invC @ bl
        else:
            xl = jnp.einsum("kij,jk->ik", invC, bl)
        xs[-1] = xl.reshape(levels[-1].shape + x.shape[1:])
        # up-leg
        for i in range(len(levels) - 2, -1, -1):
            lv = levels[i]
            corr = prolong(lv, xs[i + 1], cdims_of[i])
            if scale_correction:
                r_cur = bs[i] - lv.amul(xs[i])
                a_corr = lv.amul(corr)
                num = (corr * r_cur).sum(tuple(range(3)))
                den = (corr * a_corr).sum(tuple(range(3)))
                alpha = num / jnp.where(jnp.abs(den) < 1e-30, 1e-30, den)
                corr = alpha * corr
            elif fixed_scale != 1.0:
                corr = fixed_scale * corr
            xi = xs[i] + corr
            sweeps = n_finest if i == 0 else n_post
            xs[i] = smooth(i, bs[i], xi, sweeps)
        if getattr(mesh, "gdia", None) is not None:
            # project onto the live (primary-slot) subspace: keeps the
            # preconditioner symmetric positive on the folded system
            prim = mesh.gdia.primary.reshape(
                (nz, ny, nx) + (1,) * (x.ndim - 1))
            xs[0] = xs[0] * prim
        return xs[0].reshape(x.shape)

    return vcycle
