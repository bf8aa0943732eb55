"""FvMatrix — the implicit finite-volume system in padded-ELL form.

TPU re-founding of the reference's fvMatrix<Type> : lduMatrix (reference:
src/finiteVolume/fvMatrices/fvMatrix/fvMatrix.H:115 and
src/OpenFOAM/matrices/lduMatrix/lduMatrix/lduMatrix.H:78). LDU semantics
are preserved — face-indexed lower/upper coefficient arrays, per-patch
internal/boundary coefficients, integrated source — but the
matrix-vector product is a dense K-wide gather-multiply-sum over the
mesh's ELL slots (the reference's Amul cell-gather functor,
lduMatrixATmul.C:43-140, without the fast/slow dual path: padding makes
every cell the fast path).

Sign convention: the assembled expression is E(psi) = M*psi - source; the
solve is M*psi = source. Patch coefficients: internal_coeffs[p] adds to
the diagonal of the patch's face-cells, boundary_coeffs[p] to their
source (both shaped (size,) + rank of psi).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..fields.field import VolField
from ..mesh.mesharrays import MeshArrays
from ..utils.dimensions import DimensionSet

_VOL_DIMS = DimensionSet.of(0, 3, 0)


def _ext(a, like):
    return a.reshape(a.shape + (1,) * (like.ndim - a.ndim))


@jax.tree_util.register_dataclass
@dataclass(frozen=True, eq=False)
class FvMatrix:
    diag: jax.Array                 # (nCells,)
    lower: jax.Array                # (nInternal,)
    upper: jax.Array                # (nInternal,)
    source: jax.Array               # (nCells,) + rank
    internal_coeffs: tuple          # per patch: (size,) + rank
    boundary_coeffs: tuple          # per patch: (size,) + rank
    psi: VolField
    V: jax.Array                    # (nCells,) cell volumes
    dims: DimensionSet = dataclasses.field(metadata=dict(static=True))
    symmetric: bool = dataclasses.field(default=False,
                                        metadata=dict(static=True))
    # setReference pin (cell, value, weight) — recorded so the solver can
    # re-pin the level AFTER solving. fp32 NEEDS this: one pinned cell out
    # of N controls the constant null mode ever more weakly as N grows
    # (its residual is diag[ref]/normFactor), so the level random-walks,
    # normFactor then grows with |psi| loosening the tolerance further,
    # and the run explodes (seen at 48^2 cavity). weight is 1.0 only on
    # the shard owning the reference cell in distributed runs.
    ref_cell: jax.Array | None = None    # data leaf: traced per-shard
    ref_value: jax.Array | None = None
    ref_weight: jax.Array | None = None
    ref_diag: jax.Array | None = None    # the pin's diag bump (for the
    #                                      compatibility projection)

    # -- construction --------------------------------------------------------
    @staticmethod
    def zeros(mesh: MeshArrays, psi: VolField, dims: DimensionSet,
              symmetric: bool = True) -> "FvMatrix":
        rank = psi.data.shape[1:]
        z = jnp.zeros
        dt = psi.data.dtype
        return FvMatrix(
            diag=z(mesh.n_cells, dt),
            lower=z(mesh.n_internal, dt),
            upper=z(mesh.n_internal, dt),
            source=z((mesh.n_cells,) + rank, dt),
            internal_coeffs=tuple(z((p.size,) + rank, dt)
                                  for p in mesh.patches),
            boundary_coeffs=tuple(z((p.size,) + rank, dt)
                                  for p in mesh.patches),
            psi=psi, V=mesh.V_asm, dims=dims, symmetric=symmetric)

    def replace(self, **kw) -> "FvMatrix":
        return dataclasses.replace(self, **kw)

    # -- algebra ---------------------------------------------------------------
    def __add__(self, o: "FvMatrix") -> "FvMatrix":
        self.dims.check_same(o.dims, "fvMatrix +")
        return FvMatrix(
            self.diag + o.diag, self.lower + o.lower, self.upper + o.upper,
            self.source + o.source,
            tuple(a + b for a, b in
                  zip(self.internal_coeffs, o.internal_coeffs)),
            tuple(a + b for a, b in
                  zip(self.boundary_coeffs, o.boundary_coeffs)),
            self.psi, self.V, self.dims, self.symmetric and o.symmetric)

    def __sub__(self, o: "FvMatrix") -> "FvMatrix":
        return self + (o * -1.0)

    def __mul__(self, s) -> "FvMatrix":
        return FvMatrix(
            self.diag * s, self.lower * s, self.upper * s, self.source * s,
            tuple(a * s for a in self.internal_coeffs),
            tuple(a * s for a in self.boundary_coeffs),
            self.psi, self.V, self.dims, self.symmetric)

    __rmul__ = __mul__

    def __neg__(self):
        return self * -1.0

    def __eq__(self, rhs):  # OpenFOAM sugar: fvm::... == rhs
        return self.equals(rhs)

    __hash__ = None

    def equals(self, rhs) -> "FvMatrix":
        """`fvm == rhs`: move the RHS into the source. rhs may be another
        FvMatrix or a per-volume VolField (integrated with V here)."""
        if isinstance(rhs, FvMatrix):
            return self - rhs
        if isinstance(rhs, VolField):
            self.dims.check_same(rhs.dims * _VOL_DIMS, "fvMatrix ==")
            return self.replace(
                source=self.source + rhs.data * _ext(self.V, rhs.data))
        raise TypeError(f"cannot == fvMatrix with {type(rhs)}")

    # -- matrix action -----------------------------------------------------------
    def ell_coeffs(self, mesh: MeshArrays) -> jax.Array:
        """(nCells, K) off-diagonal coefficients via the precomputed gather
        into [upper | lower | 0]."""
        cat = jnp.concatenate(
            [self.upper, self.lower, jnp.zeros(1, self.upper.dtype)])
        return jnp.take(cat, mesh.ell_coeff_idx, axis=0)

    def offdiag_mv(self, mesh: MeshArrays):
        """x -> sum_k coeff[c,k] * x[nbr[c,k]], the off-diagonal product.
        Structured boxes: DIA planes built by pads (zero gathers and zero
        scatters even in setup); else banded/DIA from the ELL gather;
        else the (nCells,K) gather itself."""
        s = mesh.structured
        if s is not None:
            from ..mesh import structured as st
            planes = st.dia_planes(s, self.lower, self.upper)
            return st.offdiag_mv_from_planes(planes, mesh.n_cells)
        if mesh.gdia is not None:
            from ..mesh import gdia as gd
            return gd.offdiag_mv(mesh.gdia, self.lower, self.upper)
        from ..linalg.banded import make_offdiag_mv
        ell = self.ell_coeffs(mesh)
        mv = make_offdiag_mv(mesh, ell)
        if mv is None:
            # callers pass halo-fresh x (distributed shards land here)
            def mv(x):
                g = jnp.take(x, mesh.cell_nbr, axis=0)
                c = ell[..., None] if x.ndim == 2 else ell
                return (c * g).sum(1)
        return mv

    def _coupled_flags(self):
        """Per-patch: True when the patch couples implicitly (cyclicAMI)
        — its boundary_coeffs multiply partner GHOST values inside the
        SpMV instead of folding into the source."""
        return tuple(getattr(bc, "coupled", False)
                     for bc in self.psi.bcs)

    @staticmethod
    def _fold_patches(mesh, data, items):
        """data[faceCells] += vals over a list of (patch, vals): slab
        adds on structured boxes, otherwise ONE concatenated scatter —
        each TPU scatter pays a full copy of `data`, so per-patch
        scatters over large fields dominate assembly cost."""
        if not items:
            return data
        if mesh.structured is not None or len(items) == 1:
            for p, v in items:
                data = mesh.add_at_patch_cells(p, data, v)
            return data
        cells = jnp.concatenate(
            [mesh.patch_face_cells(p) for p, _ in items])
        vals = jnp.concatenate([v for _, v in items], axis=0)
        return data.at[cells].add(vals)

    def component_system_all(self, mesh: MeshArrays):
        """(diag (n,m), source (n,m)) for a column-batched vector solve
        (patch internal coeffs differ per component, e.g. symmetry)."""
        m_comp = self.source.shape[1]
        diag = jnp.broadcast_to(self.diag[:, None],
                                (self.diag.shape[0], m_comp))
        src = self.source
        d_items, s_items = [], []
        for p, ic, bc, cpl in zip(mesh.patches, self.internal_coeffs,
                                  self.boundary_coeffs,
                                  self._coupled_flags()):
            if p.is_empty or p.size == 0:
                continue
            d_items.append((p, ic))
            if not cpl:
                s_items.append((p, bc))
        diag = self._fold_patches(mesh, diag, d_items)
        src = self._fold_patches(mesh, src, s_items)
        diag, src = self._gdia_fold_system(mesh, diag, src, None)
        return diag, self._compat_project(src)

    def component_system(self, mesh: MeshArrays, cmpt: int | None):
        """(diag, source) for one component with patch coefficients folded
        in (reference: addBoundaryDiag/addBoundarySource before solve)."""
        diag = self.diag
        src = self.source if cmpt is None else self.source[:, cmpt]
        d_items, s_items = [], []
        for p, ic, bc, cpl in zip(mesh.patches, self.internal_coeffs,
                                  self.boundary_coeffs,
                                  self._coupled_flags()):
            if p.is_empty or p.size == 0:
                continue
            icc = ic if cmpt is None else ic[:, cmpt]
            bcc = bc if cmpt is None else bc[:, cmpt]
            d_items.append((p, icc))
            if not cpl:
                s_items.append((p, bcc))
        diag = self._fold_patches(mesh, diag, d_items)
        src = self._fold_patches(mesh, src, s_items)
        diag, src = self._gdia_fold_system(mesh, diag, src, cmpt)
        return diag, self._compat_project(src)

    def _gdia_fold_system(self, mesh, diag, src, cmpt):
        """gdia lattice meshes: fold per-slot diag/source contributions
        (ghost rows) into the primary rows and NULL the ghost/dead rows
        (0*x = 0 — inert in every residual sum AND the residual norm
        factor; see mesh/gdia.py fold_diag for why identity rows broke
        loose-tolerance convergence checks). No-op on ordinary
        meshes."""
        g = mesh.gdia
        if g is None:
            return diag, src
        from ..mesh import gdia as gd
        diag = gd.fold_diag(g, diag)
        src = gd.fold(g, src)
        prim = g.primary.reshape(g.primary.shape
                                 + (1,) * (src.ndim - 1))
        return diag, src * prim

    def _compat_project(self, src):
        """fp32 compatibility projection for setReference'd (pure-
        Neumann) systems: with every source folded (cell source +
        boundary-coefficient sources), the rhs of a compatible Neumann
        system must gsum to the pin's own contribution. Roundoff leaves
        an O(eps*N) imbalance the single pinned cell would have to
        absorb — its response grows with N and destabilized the 48^2+
        cavity in fp32. Subtract the volume-distributed imbalance (a
        uniform shift of source/V — the smoothest compatible
        perturbation). In fp64 this is a no-op at machine precision.
        Runs AFTER boundary folding: projecting the cell source alone
        (the round-2 placement) un-balanced fixedFluxPressure systems
        whose boundary_coeffs legitimately compensate div(phiHbyA)."""
        if self.ref_cell is None:
            return src
        from ..linalg.solvers import gsum
        pin = jnp.zeros_like(src).at[self.ref_cell].add(
            self.ref_diag * self.ref_value * self.ref_weight
            * jnp.ones(src.shape[1:], src.dtype))
        imb = gsum(src - pin) / gsum(self.V)
        return src - _ext(self.V, src) * imb

    def coupled_mv(self, mesh: MeshArrays):
        """The implicit-interface part of M*x: for every coupled patch,
        -boundary_coeffs * ghost(x) added at the patch face-cells (the
        reference's updateMatrixInterfaces). Returns None when the
        matrix has no coupled patches."""
        items = [(p, i) for i, (p, cpl) in enumerate(
            zip(mesh.patches, self._coupled_flags()))
            if cpl and p.size]
        if not items:
            return None

        def mv(x, out):
            for p, i in items:
                cc = self.boundary_coeffs[i]
                if x.ndim == 1 and cc.ndim > 1:
                    cc = cc[:, 0]
                ghost = mesh.ami_ghost(p, x)
                out = mesh.add_at_patch_cells(p, out, -cc * ghost)
            return out
        return mv

    # -- queries -------------------------------------------------------------------
    def A(self, mesh: MeshArrays) -> VolField:
        """Central coefficients / V (reference: fvMatrix::A). For vector
        systems the patch internal coeffs are averaged over components
        (diagonal approximation, as the reference's A() on the scalar
        diag)."""
        from .fvc import _extrapolated
        diag = self.diag
        items = []
        for p, ic in zip(mesh.patches, self.internal_coeffs):
            if p.is_empty or p.size == 0:
                continue
            items.append((p, ic.mean(axis=-1) if ic.ndim > 1 else ic))
        diag = self._fold_patches(mesh, diag, items)
        if mesh.gdia is not None:
            from ..mesh import gdia as gd
            diag = gd.sync(mesh.gdia, gd.fold(mesh.gdia, diag))
            # DEAD slots have no equation (zero diag): pin A=1 there so
            # rAU stays finite — every dummy-face coefficient it meets
            # is identically zero, but 0*inf would poison surface sums
            diag = diag + mesh.gdia.dead * mesh.V
        return _extrapolated(mesh, diag / mesh.V,
                             self.dims / (self.psi.dims * _VOL_DIMS),
                             f"A({self.psi.name})")

    def H(self, mesh: MeshArrays) -> VolField:
        """(source - offdiag*psi + boundary sources)/V (fvMatrix::H)."""
        from .fvc import _extrapolated
        from ..parallel.hooks import halo
        psi = self.psi.data
        off = self.offdiag_mv(mesh)(halo(psi))
        h = self.source - off
        items = []
        for p, bc, cpl in zip(mesh.patches, self.boundary_coeffs,
                              self._coupled_flags()):
            if p.is_empty or p.size == 0:
                continue
            if cpl:
                bc = bc * mesh.ami_ghost(p, psi)
            items.append((p, bc))
        h = self._fold_patches(mesh, h, items)
        if mesh.gdia is not None:
            from ..mesh import gdia as gd
            h = gd.sync(mesh.gdia, gd.fold(mesh.gdia, h))
        h = h / _ext(mesh.V, h)
        return _extrapolated(mesh, h, self.dims / _VOL_DIMS,
                             f"H({self.psi.name})")

    def H1(self, mesh: MeshArrays) -> VolField:
        """-(row-sum of off-diagonal coeffs)/V — i.e. H evaluated at
        psi == 1 with no source (reference: lduMatrix::H1,
        lduMatrixATmul.C:533-566 and fvMatrix::H1, fvMatrix.C:1538-1560;
        the SIMPLEC consistent-correction denominator 1/(1/rAU - H1))."""
        from .fvc import _extrapolated
        from ..parallel.hooks import halo
        ones = jnp.ones(self.diag.shape, self.diag.dtype)
        h = -self.offdiag_mv(mesh)(halo(ones))
        items = []
        for p, bc, cpl in zip(mesh.patches, self.boundary_coeffs,
                              self._coupled_flags()):
            # only coupled patches contribute (reference adds
            # boundaryCoeffs.component(0) at coupled patches only)
            if not cpl or p.is_empty or p.size == 0:
                continue
            items.append((p, bc[..., 0] if bc.ndim > 1 else bc))
        h = self._fold_patches(mesh, h, items)
        if mesh.gdia is not None:
            from ..mesh import gdia as gd
            h = gd.sync(mesh.gdia, gd.fold(mesh.gdia, h))
        return _extrapolated(mesh, h / mesh.V,
                             self.dims / (self.psi.dims * _VOL_DIMS),
                             f"H1({self.psi.name})")

    def apply_rate(self, mesh: MeshArrays) -> jax.Array:
        """(A*psi - b)/V with patch coefficients folded in — the
        reference's `M & psi` operator (fvMatrix.C:3052-3098), i.e. the
        per-volume rate the assembled operator assigns to the current
        psi. Scalar matrices only."""
        from ..parallel.hooks import halo
        psi = self.psi.data
        diag, src = self.component_system(mesh, None)
        off = self.offdiag_mv(mesh)(halo(psi))
        val = diag * psi + off
        cmv = self.coupled_mv(mesh)
        if cmv is not None:
            val = cmv(psi, val)
        if mesh.gdia is not None:
            from ..mesh import gdia as gd
            rate = gd.sync(mesh.gdia, val - src)
            return rate / mesh.V
        return (val - src) / self.V

    def flux(self, mesh: MeshArrays):
        """Face flux consistent with the assembled operator (reference:
        fvMatrix::flux via lduMatrix::faceH): internal F = upper*psi_n -
        lower*psi_o; boundary F = ic*psi_c - bc. Scalar matrices only."""
        from ..fields.field import SurfaceField
        from ..parallel.hooks import halo
        from .fvc import face_own_nei
        psi = self.psi.data
        if psi.ndim > 1:
            raise TypeError("flux() only valid for scalar matrices")
        own_v, nei_v = face_own_nei(mesh, halo(psi))
        f_int = self.upper * nei_v - self.lower * own_v
        parts = [f_int]
        for p, ic, bc, cpl in zip(mesh.patches, self.internal_coeffs,
                                  self.boundary_coeffs,
                                  self._coupled_flags()):
            if p.is_empty:
                # empty faces carry no flux; the gather would be
                # 2*nCells wide on a 2D mesh
                parts.append(jnp.zeros((p.size,), psi.dtype))
                continue
            psi_c = mesh.patch_cell_values(p, psi)
            if cpl:
                bc = bc * mesh.ami_ghost(p, psi)
            parts.append(ic * psi_c - bc)
        return SurfaceField(jnp.concatenate(parts, axis=0), self.dims,
                            f"flux({self.psi.name})")

    # -- manipulation ------------------------------------------------------------
    def relax(self, mesh: MeshArrays, alpha: float) -> "FvMatrix":
        """Under-relax: force diagonal dominance (interior off-diags plus
        patch internal coeffs), scale diag by 1/alpha, compensate the
        source with the current psi (reference: fvMatrix::relax)."""
        if alpha is None or alpha <= 0 or alpha >= 1.0 - 1e-12:
            return self
        if mesh.structured is not None:
            from ..mesh import structured as st
            sum_off = -st.neg_sum_diag(mesh.structured,
                                       jnp.abs(self.lower),
                                       jnp.abs(self.upper))
        elif mesh.gdia is not None:
            # ROW off-diagonal sums (row own holds upper, row nei holds
            # lower) — note the swapped argument order vs negSumDiag's
            # column sums
            from ..mesh import gdia as gd
            sum_off = -gd.neg_sum_diag(mesh.gdia, jnp.abs(self.upper),
                                       jnp.abs(self.lower))
        else:
            sum_off = jnp.abs(self.ell_coeffs(mesh)).sum(axis=1)
        for p, ic in zip(mesh.patches, self.internal_coeffs):
            if p.is_empty or p.size == 0:
                continue
            icc = jnp.abs(ic).mean(axis=-1) if ic.ndim > 1 else jnp.abs(ic)
            sum_off = mesh.add_at_patch_cells(p, sum_off, icc)
        d0 = self.diag
        if mesh.gdia is not None:
            # the dominance max must act on the FOLDED (per-cell) row —
            # per-slot maxes would relax merged-cell rows differently
            # from the reference. The whole correction lands on the
            # primary slot (ghost diag untouched), so the folded diag is
            # exactly the reference's relaxed value.
            from ..mesh import gdia as gd
            g = mesh.gdia
            d0f = gd.fold(g, d0)
            sof = gd.fold(g, sum_off)
            df = jnp.where(jnp.abs(d0f) < sof, jnp.sign(d0f) * sof, d0f)
            delta = (df / alpha - d0f) * g.primary
            d = d0 + delta
            src = self.source + _ext(delta, self.source) * self.psi.data
            return self.replace(diag=d, source=src)
        d = jnp.where(jnp.abs(d0) < sum_off, jnp.sign(d0) * sum_off, d0)
        d = d / alpha
        src = self.source + _ext(d - d0, self.source) * self.psi.data
        return self.replace(diag=d, source=src)

    def set_values(self, mesh: MeshArrays, fix_mask, values) -> "FvMatrix":
        """Fix psi at the masked cells (reference: fvMatrix::setValues /
        lduMatrix::setValuesFromList): eliminate the fixed rows and move
        their column contributions to neighbouring sources — all as
        regular ELL gathers, no scatter.

        fix_mask: (nCells,) 1.0 where fixed; values: (nCells,) target.
        """
        from .fvc import face_own_nei
        from ..parallel.hooks import halo
        # halo: a cut face whose (ghost) neighbour is fixed on its owner
        # shard must drop its coefficient too, to match the eliminated
        # column contribution below
        fix_o, fix_n = face_own_nei(mesh, halo(fix_mask))
        # column elimination into the source: src[c] -= sum_k coeff*val*fix
        col = self.offdiag_mv(mesh)(halo(fix_mask * values))
        src = self.source - _ext(col, self.source)
        # fixed rows: source = diag*value
        fm = _ext(fix_mask, src)
        src = src * (1.0 - fm) + fm * _ext(self.diag * values, src)
        keep = (1.0 - fix_o) * (1.0 - fix_n)
        return self.replace(
            upper=self.upper * keep, lower=self.lower * keep, source=src,
            symmetric=False)

    def set_reference(self, cell, value, weight=1.0,
                      force: bool = False) -> "FvMatrix":
        """Pin psi at one cell (fvMatrix::setReference). Applied only when
        the matrix actually has a nullspace — i.e. no boundary condition
        fixes the value (the reference's needReference guard,
        cfdTools/general/findRefCell) — unless force=True. In distributed
        runs weight is 1.0 only on the shard owning the reference cell."""
        if not force and any(getattr(bc, "fixes_level", False)
                             for bc in self.psi.bcs):
            return self
        # The fp32 compatibility projection (subtract the volume-
        # distributed source imbalance so the single pinned cell needn't
        # absorb O(eps*N) roundoff) happens in component_system, AFTER
        # the boundary-coefficient sources are folded in — projecting
        # the cell source alone un-balances systems whose boundary
        # fluxes legitimately carry the compensation (fixedFluxPressure:
        # the body-force boundary flux in div(phiHbyA) is balanced by
        # the gradient flux living in boundary_coeffs).
        dc = self.diag[cell] * weight
        src = self.source.at[cell].add(dc * value)
        return self.replace(diag=self.diag.at[cell].add(dc), source=src,
                            ref_cell=jnp.asarray(cell, jnp.int32),
                            ref_value=jnp.asarray(value, self.diag.dtype),
                            ref_weight=jnp.asarray(weight,
                                                   self.diag.dtype),
                            ref_diag=dc)
