"""GAMG — geometric-algebraic multigrid.

Capability surface of the reference's GAMGSolver (reference:
src/OpenFOAM/matrices/lduMatrix/solvers/GAMG/GAMGSolver.H:72, V-cycle in
GAMGSolverSolve.C:181-475) with the same split the reference proved out:
*agglomeration on host, cycling on device* —

- hierarchy: faceAreaPair pair-agglomeration (reference:
  faceAreaPairGAMGAgglomeration.H:49 + pairGAMGAgglomerate.C:31-130) is
  geometry-only (face-area weights), so it's computed once per mesh in
  numpy and cached; every level's restrict/prolong/face-combining maps
  are static, pre-sorted gather/segment-sum indices.
- per-solve: coarse-level matrices are assembled on device by sorted
  segment-sums over the static maps; the V-cycle is a fixed-depth
  unrolled loop of damped-Jacobi smooths + restrict/prolong, fully
  inside jit.
- coarsest level: dense solve on the MXU (jnp.linalg.solve) instead of
  the reference's gather-to-host LU (GAMGSolverSolve.C coarsest-level
  host round-trip) — strictly better on TPU.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..mesh.mesharrays import MeshArrays, build_ell

_HIERARCHY_CACHE: dict = {}

# TPU-tuned hierarchy shape, used when fvSolution does not set
# mergeLevels / nCellsInCoarsestLevel explicitly. The reference's
# CPU-tuned defaults (mergeLevels 1 -> ratio-2 coarsening down to 32
# cells) give a ~9-level hierarchy whose small levels are pure dispatch
# latency on TPU. Measured on the 14k-cell unstructured channel
# (PCG + GAMG preconditioner, fp32): ml=1/nc=32 -> 113ms/solve
# (23 iters, 4.9 ms/iter); ml=4/nc=1024 -> 15.2ms/solve (10 iters,
# 1.5 ms/iter). Aggressive 16:1 agglomeration costs nothing in Krylov
# iterations while the dense MXU coarsest absorbs everything below
# ~1k rows in one matmul.
TPU_MERGE_LEVELS = 4
TPU_N_COARSEST = 1024


def gamg_shape(controls):
    """(n_coarsest, merge_levels) with TPU-tuned defaults for entries
    not set in fvSolution (SolverControls keeps None for those)."""
    nc = getattr(controls, "n_coarsest_cells", None)
    ml = getattr(controls, "merge_levels", None)
    return (TPU_N_COARSEST if nc is None else nc,
            TPU_MERGE_LEVELS if ml is None else ml)


import dataclasses as _dc


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class Level:
    """Static maps from a fine level to its coarse level.

    Registered as a pytree (arrays = data, sizes = static metadata) so
    stacked per-shard hierarchies pass through shard_map for the
    distributed block-GAMG preconditioner (the TPU re-founding of the
    reference's processorGAMGInterface per-level halo machinery:
    src/OpenFOAM/matrices/lduMatrix/solvers/GAMG/interfaces/)."""
    restrict_addr: jnp.ndarray    # (nc_fine,) coarse cell of fine cell
    face_coarse: jnp.ndarray      # (nif,) coarse face id (nfc if internal)
    face_flip: jnp.ndarray        # (nif,) 1.0 if fine owner/nei swapped
    face_cell: jnp.ndarray        # (nif,) coarse cell for internal faces
    # coarse-level ELL connectivity (built from coarse owner/neighbour)
    cell_nbr: jnp.ndarray         # (ncc, Kc)
    ell_idx: jnp.ndarray          # (ncc, Kc) into [upper|lower|0]
    coarse_owner: jnp.ndarray     # (nfc,)
    coarse_neighbour: jnp.ndarray
    # padded GATHER addressing (TPU-fast restriction/coarsening; the
    # reference's restrictSortAddressing idea, GAMGAgglomeration.H:149):
    # scatter-adds become take().sum(1)
    children: jnp.ndarray         # (ncc, Kch) fine cells, pad=nc_fine
    face_children: jnp.ndarray    # (nfc, Kfc) fine faces, pad=nif
    face_child_flip: jnp.ndarray  # (nfc, Kfc) 1.0 where owner/nei swap
    int_faces: jnp.ndarray        # (ncc, Kif) collapsed faces, pad=nif
    n_coarse: int = _dc.field(metadata=dict(static=True), default=0)
    n_coarse_faces: int = _dc.field(metadata=dict(static=True), default=0)
    n_fine: int = _dc.field(metadata=dict(static=True), default=0)
    n_fine_faces: int = _dc.field(metadata=dict(static=True), default=0)


def _pair_agglomerate(own: np.ndarray, nei: np.ndarray,
                      weights: np.ndarray, nc: int):
    """Greedy max-weight pair agglomeration (reference:
    pairGAMGAgglomerate.C:31-130): pass 1 pairs each unmatched cell with
    its strongest unmatched neighbour; pass 2 merges leftover singles
    into their strongest cluster."""
    # adjacency in CSR
    order = np.argsort(own, kind="stable")
    deg = np.bincount(own, minlength=nc) + np.bincount(nei, minlength=nc)
    adj_start = np.zeros(nc + 1, dtype=np.int64)
    np.cumsum(deg, out=adj_start[1:])
    adj_cell = np.empty(adj_start[-1], dtype=np.int64)
    adj_w = np.empty(adj_start[-1])
    fill = adj_start[:-1].copy()
    for f in range(own.size):
        o, n, w = own[f], nei[f], weights[f]
        adj_cell[fill[o]] = n
        adj_w[fill[o]] = w
        fill[o] += 1
        adj_cell[fill[n]] = o
        adj_w[fill[n]] = w
        fill[n] += 1

    coarse = np.full(nc, -1, dtype=np.int64)
    ncc = 0
    for c in range(nc):
        if coarse[c] >= 0:
            continue
        best, best_w = -1, -1.0
        for k in range(adj_start[c], adj_start[c + 1]):
            n = adj_cell[k]
            if coarse[n] < 0 and adj_w[k] > best_w:
                best, best_w = n, adj_w[k]
        if best >= 0:
            coarse[c] = coarse[best] = ncc
            ncc += 1
        # leave singles for pass 2
    for c in range(nc):
        if coarse[c] >= 0:
            continue
        best, best_w = -1, -1.0
        for k in range(adj_start[c], adj_start[c + 1]):
            n = adj_cell[k]
            if coarse[n] >= 0 and adj_w[k] > best_w:
                best, best_w = n, adj_w[k]
        if best >= 0:
            coarse[c] = coarse[best]
        else:  # isolated cell
            coarse[c] = ncc
            ncc += 1
    return coarse, ncc


def _coarse_graph(own, nei, weights, coarse, ncc):
    """Deduplicated coarse-level (own, nei, weights) from a cell map."""
    co, cn = coarse[own], coarse[nei]
    ext = co != cn
    fo = np.minimum(co[ext], cn[ext])
    fn = np.maximum(co[ext], cn[ext])
    keys = fo * ncc + fn
    uniq, inv = np.unique(keys, return_inverse=True)
    w = np.zeros(uniq.size)
    np.add.at(w, inv, weights[ext])
    return (uniq // ncc).astype(np.int64), (uniq % ncc).astype(np.int64), w


def build_hierarchy(mesh: MeshArrays, n_coarsest: int = 32,
                    max_levels: int = 20,
                    merge_levels: int = 1) -> list[Level]:
    """Host-side hierarchy construction, cached per mesh. merge_levels
    composes that many pair-agglomerations per stored level (the
    reference's GAMG mergeLevels), trading convergence rate for V-cycle
    depth — on TPU the shallow hierarchy wins (small levels are
    latency-bound).

    A hierarchy precomputed onto the mesh pytree
    (linalg.precompute.attach_solver_layouts) is honoured first — that
    path works on traced meshes; its n_coarsest/merge_levels are the
    ones it was built with (one hierarchy per mesh, like the
    reference's per-mesh GAMGAgglomeration cache)."""
    if mesh.gamg is not None:
        return list(mesh.gamg)
    # Keyed by the identity of the mesh's addressing array, with the
    # value holding only a WEAK reference to it: a weakref.finalize
    # evicts the entry the moment the array is collected, so a recycled
    # id can never alias a stale hierarchy (r2/r4 advice) and the cache
    # cannot leak across cases in a long-running process. If the array
    # type is not weakref-able we fall back to pinning it in the entry,
    # which is alias-safe (the `is` check) but unbounded.
    import weakref
    anchor = mesh.ell_coeff_idx
    key = (id(anchor), n_coarsest, merge_levels)
    hit = _HIERARCHY_CACHE.get(key)
    if hit is not None:
        ref, levels = hit
        live = ref() if isinstance(ref, weakref.ref) else ref
        if live is anchor:
            return levels

    own = np.asarray(mesh.owner)[:mesh.n_internal].astype(np.int64)
    nei = np.asarray(mesh.neighbour).astype(np.int64)
    weights = np.asarray(mesh.mag_sf)[:mesh.n_internal].astype(float)
    levels, _ = _graph_hierarchy(own, nei, weights, mesh.n_cells,
                                 n_coarsest, max_levels, merge_levels)
    try:
        ref = weakref.ref(anchor)
        weakref.finalize(anchor, _HIERARCHY_CACHE.pop, key, None)
    except TypeError:
        ref = anchor  # not weakref-able: pin (alias-safe, unbounded)
    _HIERARCHY_CACHE[key] = (ref, levels)
    return levels


def _graph_hierarchy(own, nei, weights, nc, n_coarsest=32, max_levels=20,
                     merge_levels=1, fine_cells=None, fine_faces=None,
                     face_ids=None):
    """Agglomeration hierarchy over an arbitrary (own, nei, weights)
    graph. For subgraphs (distributed owned blocks), fine_cells /
    fine_faces give the FULL fine-level array sizes (pad targets) and
    face_ids maps subgraph face index -> full face index; level-0
    gather addressing is remapped so the V-cycle runs directly on the
    full-size fine arrays. Returns (levels, (own, nei, weights, nc)) —
    the final coarse graph, for identity-level padding."""
    levels: list[Level] = []

    while nc > n_coarsest and len(levels) < max_levels:
        coarse, ncc = _pair_agglomerate(own, nei, weights, nc)
        for _ in range(merge_levels - 1):
            if ncc <= n_coarsest:
                break
            o2, n2, w2 = _coarse_graph(own, nei, weights, coarse, ncc)
            c2, ncc2 = _pair_agglomerate(o2, n2, w2, ncc)
            if ncc2 >= ncc:
                break
            coarse, ncc = c2[coarse], ncc2
        if ncc >= nc:  # no coarsening progress
            break
        co, cn = coarse[own], coarse[nei]
        internal = co == cn
        flip = co > cn
        fo = np.where(flip, cn, co)
        fn = np.where(flip, co, cn)
        # unique coarse faces among external fine faces
        ext = ~internal
        keys = fo[ext] * ncc + fn[ext]
        uniq, inv = np.unique(keys, return_inverse=True)
        nfc = uniq.size
        face_coarse = np.full(own.size, nfc, dtype=np.int64)
        face_coarse[ext] = inv
        c_own = (uniq // ncc).astype(np.int64)
        c_nei = (uniq % ncc).astype(np.int64)
        # canonical coarse face order: lexsort by (owner, neighbour)
        order = np.lexsort((c_nei, c_own))
        rank = np.empty(nfc, dtype=np.int64)
        rank[order] = np.arange(nfc)
        face_coarse[ext] = rank[face_coarse[ext]]
        c_own, c_nei = c_own[order], c_nei[order]
        c_w = np.zeros(nfc)
        np.add.at(c_w, face_coarse[ext], weights[ext])

        ell = build_ell(c_own, c_nei, ncc, nfc,
                        np.ones(nfc, dtype=bool))

        def padded_lists(ids, nbins, pad, aux=None):
            """CSR->padded-ELL lists: per bin, member indices (+aux)."""
            order2 = np.argsort(ids, kind="stable")
            sids = ids[order2]
            counts = np.bincount(sids, minlength=nbins)
            kmax = max(int(counts.max()) if nbins else 1, 1)
            out = np.full((nbins, kmax), pad, dtype=np.int64)
            starts = np.zeros(nbins + 1, dtype=np.int64)
            np.cumsum(counts, out=starts[1:])
            members = order2
            cols = np.arange(ids.size) - starts[sids]
            out[sids, cols] = members
            res = [out]
            if aux is not None:
                a_out = np.zeros((nbins, kmax), dtype=np.float32)
                a_out[sids, cols] = aux[order2]
                res.append(a_out)
            return res

        (children,) = padded_lists(coarse, ncc, nc)
        ext_ids = np.where(ext)[0]
        fc_ext = face_coarse[ext]
        flip_ext = flip[ext].astype(np.float32)
        if ext_ids.size:
            fch, ffl = padded_lists(fc_ext, nfc, own.size,
                                    aux=flip_ext)
            # member positions index into ext subset: map back
            pad_mask = fch == own.size
            fch = np.where(pad_mask, own.size, ext_ids[
                np.clip(fch, 0, ext_ids.size - 1)])
        else:
            fch = np.full((nfc, 1), own.size, dtype=np.int64)
            ffl = np.zeros((nfc, 1), dtype=np.float32)
        int_ids = np.where(internal)[0]
        if int_ids.size:
            (ifc,) = padded_lists(co[internal], ncc, own.size)
            pad_mask = ifc == own.size
            ifc = np.where(pad_mask, own.size, int_ids[
                np.clip(ifc, 0, int_ids.size - 1)])
        else:
            ifc = np.full((ncc, 1), own.size, dtype=np.int64)

        n_fine_c, n_fine_f = int(nc), int(own.size)
        rest = coarse
        if not levels and fine_cells is not None:
            # level 0 of a subgraph: remap gather addressing onto the
            # FULL fine arrays (cells 0..nc are the owned block prefix;
            # faces via face_ids), pads -> full sizes
            n_fine_c, n_fine_f = int(fine_cells), int(fine_faces)
            children = np.where(children == nc, n_fine_c, children)
            fids = np.concatenate(
                [face_ids.astype(np.int64), [n_fine_f]])
            fch = fids[np.minimum(fch, own.size)]
            ifc = fids[np.minimum(ifc, own.size)]
            rest = np.full(fine_cells, ncc, dtype=np.int64)
            rest[:nc] = coarse

        # NOTE: stored as numpy so the cached hierarchy is trace-free
        # (jnp constants created inside a jit trace must not be cached)
        levels.append(Level(
            n_coarse=ncc, n_coarse_faces=nfc,
            restrict_addr=rest.astype(np.int32),
            face_coarse=face_coarse.astype(np.int32),
            face_flip=flip.astype(np.float32),
            face_cell=np.where(internal, co, 0).astype(np.int32),
            cell_nbr=ell["cell_nbr"].astype(np.int32),
            ell_idx=ell["ell_idx"].astype(np.int32),
            coarse_owner=c_own.astype(np.int32),
            coarse_neighbour=c_nei.astype(np.int32),
            children=children.astype(np.int32),
            face_children=fch.astype(np.int32),
            face_child_flip=ffl.astype(np.float32),
            int_faces=ifc.astype(np.int32),
            n_fine=n_fine_c,
            n_fine_faces=n_fine_f,
        ))
        own, nei, weights, nc = c_own, c_nei, c_w, ncc

    return levels, (own, nei, weights, int(nc))


def _seg_sum(x, ids, n):
    return jnp.zeros((n,) + x.shape[1:], x.dtype).at[ids].add(x)


def _ext(a, like):
    """Broadcast a (n,)/(nf,) array against trailing component axes."""
    return a.reshape(a.shape + (1,) * (like.ndim - a.ndim))


def _restrict(level: Level, r):
    """Gather-based restriction: coarse r = sum of fine children
    (the reference's sorted-gather restrict, GAMGAgglomeration.H:149;
    scatter-add is pathological on TPU). Supports trailing component
    axes (column-batched vector solves)."""
    rp = jnp.concatenate(
        [r, jnp.zeros((1,) + r.shape[1:], r.dtype)], axis=0)
    return jnp.take(rp, level.children, axis=0).sum(1)


def _coarsen_matrix(level: Level, diag, lower, upper, internal_mask_face):
    """Assemble the coarse-level (diag, lower, upper) on device — all
    padded gathers (no scatter)."""
    c_diag = _restrict(level, diag)
    z1 = jnp.zeros(1, diag.dtype)
    up_p = jnp.concatenate([upper, z1])
    lo_p = jnp.concatenate([lower, z1])
    # faces collapsing into a coarse cell add (upper+lower) to its diag
    both = up_p + lo_p
    c_diag = c_diag + _ext(
        jnp.take(both, level.int_faces, axis=0).sum(1), c_diag)
    up_g = jnp.take(up_p, level.face_children, axis=0)
    lo_g = jnp.take(lo_p, level.face_children, axis=0)
    fl = level.face_child_flip
    c_upper = (jnp.where(fl > 0.5, lo_g, up_g)).sum(1)
    c_lower = (jnp.where(fl > 0.5, up_g, lo_g)).sum(1)
    return c_diag, c_lower, c_upper


def _level_amul(level: Level, diag, lower, upper):
    def amul(x):
        cat = jnp.concatenate([upper, lower, jnp.zeros(1, upper.dtype)])
        coeffs = jnp.take(cat, level.ell_idx, axis=0)
        nbr = jnp.take(x, level.cell_nbr, axis=0)
        return _ext(diag, x) * x + (_ext(coeffs, nbr) * nbr).sum(1)
    return amul


def _jacobi(amul, diag, b, x, n, omega=0.9):
    rd = omega / jnp.where(diag == 0.0, 1.0, diag)

    def body(i, x):
        return x + _ext(rd, x) * (b - amul(x))
    return lax.fori_loop(0, n, body, x)


def _lambda_max(amul, diag, b, n_iter=8):
    """Power-iteration estimate of the spectral radius of D^-1 A."""
    rd = 1.0 / jnp.where(diag == 0.0, 1.0, diag)
    v = jnp.where(jnp.abs(b) > 0, b, 1.0)
    v = v / jnp.linalg.norm(v)

    def body(i, carry):
        v, lam = carry
        w = rd * amul(v)
        lam = jnp.linalg.norm(w)
        return w / jnp.where(lam == 0.0, 1.0, lam), lam

    _, lam = lax.fori_loop(0, n_iter, body, (v, jnp.asarray(1.0, b.dtype)))
    return lam


def _chebyshev(amul, diag, b, x, degree, lam_max):
    """Chebyshev polynomial smoother on [lam_max/4, 1.05*lam_max] of
    D^-1 A — the data-parallel replacement for Gauss-Seidel smoothing the
    reference had to forgo (GaussSeidelSmoother.C:43-67 aliases to
    Jacobi); Chebyshev recovers GS-class smoothing with only Amuls."""
    rd = 1.0 / jnp.where(diag == 0.0, 1.0, diag)
    lmax = 1.05 * lam_max
    lmin = lam_max / 4.0
    theta = 0.5 * (lmax + lmin)
    delta = 0.5 * (lmax - lmin)
    sigma = theta / delta
    rho = 1.0 / sigma

    r = _ext(rd, b) * (b - amul(x))
    d_vec = r / theta
    for _ in range(degree):
        x = x + d_vec
        r = r - _ext(rd, r) * amul(d_vec)
        rho_new = 1.0 / (2.0 * sigma - rho)
        d_vec = (rho_new * rho) * d_vec + (2.0 * rho_new / delta) * r
        rho = rho_new
    return x


def make_vcycle(mesh: MeshArrays, m, amul_fine, diag, controls,
                scale_correction: bool, fixed_scale: float = 1.0):
    """Build the one-V-cycle closure (x, b) -> x' over the cached
    agglomeration hierarchy. scale_correction=False yields a LINEAR
    operator usable as a Krylov preconditioner (the <c,r>/<c,Ac>
    line-search scaling is nonlinear)."""
    # distributed: a pre-built per-shard block hierarchy installed by
    # the parallel layer (hooks) — local V-cycles on the masked owned
    # block, i.e. a block-Jacobi/Schwarz preconditioner whose outer
    # Krylov stays global through the halo/psum hooks (the TPU answer
    # to the reference's processorGAMGInterface per-level comms)
    from ..parallel import hooks as _ph
    blk = _ph.gamg_block()
    if blk is not None:
        # level 0 keeps the GLOBAL fine operator (halo-refreshed gathers,
        # so smoothing and residuals see cut-face coupling and the cycle
        # converges to the global solution); mid-level smoothing is
        # block-local, and the COARSEST level is solved GLOBALLY when a
        # GlobalCoarse table is installed (cross-shard dense assembly +
        # psum + MXU solve — the TPU re-founding of the reference's
        # distributed coarse grid, processorGAMGInterface). Restriction
        # gathers owned rows only, and corr_mask pins ghost rows of the
        # prolonged correction to zero.
        if len(blk) == 3:
            levels_loc, own_mask, gcoarse = blk
        else:
            (levels_loc, own_mask), gcoarse = blk, None
        return _vcycle_from_levels(
            levels_loc, diag, m.lower, m.upper, amul_fine, controls,
            scale_correction, fixed_scale, corr_mask=own_mask,
            gcoarse=gcoarse)

    # structured natural-ordering grids take the gather-free geometric
    # path (reshape restrict/prolong + DIA level Amuls) — ~30x cheaper
    # per V-cycle on TPU than the aggregation path's jnp.take gathers
    from ..utils import switches
    if switches.enabled("STRUCTURED_MG"):
        from .structured_mg import make_structured_vcycle
        vc = make_structured_vcycle(mesh, m, amul_fine, diag, controls,
                                    scale_correction, fixed_scale)
        if vc is not None:
            return vc

    import jax.errors
    n_coarsest, merge_levels = gamg_shape(controls)
    try:
        levels = build_hierarchy(
            mesh, n_coarsest=n_coarsest, merge_levels=merge_levels)
    except jax.errors.TracerArrayConversionError as e:
        raise NotImplementedError(
            "GAMG on a traced mesh needs a precomputed hierarchy: call "
            "linalg.precompute.attach_solver_layouts(mesh, controls) on "
            "the concrete mesh before jitting (single-chip), or install "
            "a block hierarchy (parallel.dist_gamg) for distributed "
            "runs") from e
    return _vcycle_from_levels(levels, diag, m.lower, m.upper, amul_fine,
                               controls, scale_correction, fixed_scale)


def _global_coarsest_solver(gc, lvl: Level, mats_last, fine_lower,
                            fine_upper):
    """Distributed GLOBAL coarsest-level dense solve.

    Every shard scatters its coarsest rows (diag/off-diag of its block
    hierarchy) AND its cut-face couplings (summed fine coefficients
    between its coarse cells and the partner shard's, via the static
    GlobalCoarse addressing) into one (NCg, NCg) dense matrix; a psum
    replicates the full global matrix on every shard (NCg ~ a few
    hundred — trivial), which is inverted once per solve and applied as
    a matmul. This is the TPU re-founding of the reference's distributed
    coarse grid (processorGAMGInterface per-level comms,
    src/OpenFOAM/matrices/lduMatrix/solvers/GAMG/interfaces/) — it
    removes the block-Jacobi iteration growth with device count."""
    from ..parallel.hooks import psum_all
    dC, loC, upC = mats_last
    NCg = gc.n_global
    rid = gc.row_ids
    cut_c = jnp.where(gc.cut_upper > 0.5,
                      jnp.take(fine_upper, gc.cut_face),
                      jnp.take(fine_lower, gc.cut_face)) * gc.cut_valid

    def dense_of(dcol):
        a = jnp.zeros((NCg + 1, NCg + 1), dcol.dtype)
        a = a.at[rid, rid].add(dcol)
        a = a.at[rid[lvl.coarse_owner],
                 rid[lvl.coarse_neighbour]].add(upC)
        a = a.at[rid[lvl.coarse_neighbour],
                 rid[lvl.coarse_owner]].add(loC)
        a = a.at[rid[gc.cut_rows], gc.cut_cols].add(
            cut_c.astype(dcol.dtype))
        a = psum_all(a)[:NCg, :NCg]
        dd = jnp.diagonal(a)
        return a + jnp.diag(jnp.where(dd == 0.0,
                                      jnp.ones_like(dd), 0.0))

    def inv_of(a):
        if a.dtype == jnp.float64 and \
                jax.devices()[0].platform not in ("cpu", "gpu"):
            # TPU LuDecomposition is F32-only (see single-chip path)
            return jnp.linalg.inv(a.astype(jnp.float32)).astype(a.dtype)
        return jnp.linalg.inv(a)

    if dC.ndim == 1:
        invC = inv_of(dense_of(dC))
    else:
        invC = jnp.stack([inv_of(dense_of(dC[:, k]))
                          for k in range(dC.shape[1])])

    def solve(b_loc):
        if b_loc.ndim == 1:
            b_g = psum_all(jnp.zeros(NCg + 1, b_loc.dtype)
                           .at[rid].add(b_loc))[:NCg]
            x_g = invC @ b_g
            xpad = jnp.concatenate([x_g, jnp.zeros(1, x_g.dtype)])
            return jnp.take(xpad, rid)
        m_comp = b_loc.shape[1]
        b_g = psum_all(jnp.zeros((NCg + 1, m_comp), b_loc.dtype)
                       .at[rid].add(b_loc))[:NCg]
        x_g = jnp.einsum("kij,jk->ik", invC, b_g)
        xpad = jnp.concatenate(
            [x_g, jnp.zeros((1, m_comp), x_g.dtype)], axis=0)
        return jnp.take(xpad, rid, axis=0)

    return solve


def _vcycle_from_levels(levels, diag, lower, upper, amul_fine, controls,
                        scale_correction, fixed_scale, corr_mask=None,
                        gcoarse=None):
    """The V-cycle closure over an explicit hierarchy. corr_mask (set on
    the distributed block path) restricts the cycle to the owned block:
    the rhs and every prolonged correction are masked so ghost rows stay
    exactly zero. gcoarse (distributed only) switches the coarsest level
    from block-local to a GLOBAL dense solve (see
    parallel.dist_gamg.GlobalCoarse)."""
    from .solvers import gsum
    n_pre = getattr(controls, "n_pre_sweeps", 0)
    n_post = getattr(controls, "n_post_sweeps", 2)
    n_finest = getattr(controls, "n_finest_sweeps", 2)
    smoother = getattr(controls, "smoother", "Chebyshev")
    use_cheby = smoother in ("Chebyshev", "GaussSeidel", "symGaussSeidel",
                             "DIC", "DICGaussSeidel")
    source = jnp.ones(diag.shape[0], diag.dtype)   # lambda-est probe

    # device-side coarse matrices (assembled once per solve)
    mats = [(diag, lower, upper)]
    for lv in levels:
        d, lo, up = mats[-1]
        mats.append(_coarsen_matrix(lv, d, lo, up, None))
    amuls = [amul_fine] + [
        _level_amul(lv, *mats[i + 1]) for i, lv in enumerate(levels)]
    # Chebyshev spectral bound: rho(D^-1 A) <= 2 for the weakly
    # diagonally-dominant FV matrices GAMG sees (row sums ~0), so a fixed
    # bound avoids per-solve power iterations (~8 kernels/level); set
    # chebyshev_power_iter for the general estimate.
    if use_cheby:
        if getattr(controls, "cheby_power_iter", False):
            lam = [_lambda_max(amuls[i], mats[i][0], source if i == 0
                               else jnp.ones(mats[i][0].shape[0],
                                             diag.dtype))
                   for i in range(len(mats))]
        else:
            lam = [jnp.asarray(2.0, diag.dtype)] * len(mats)
    else:
        lam = None

    def smooth(i, b, x, sweeps):
        if sweeps == 0:
            return x
        if use_cheby:
            return _chebyshev(amuls[i], mats[i][0], b, x,
                              max(2, sweeps + 1), lam[i])
        return _jacobi(amuls[i], mats[i][0], b, x, sweeps)

    # coarsest dense matrix for the MXU direct solve: invert ONCE per
    # solve (the matrix is fixed across V-cycles) and apply as a matmul
    dC, loC, upC = mats[-1]
    ncc = dC.shape[0]
    coarse_corr = None
    if gcoarse is not None and levels:
        # distributed: ADDITIVE global coarse-space correction (two-
        # level Schwarz): w = blockV(r) + P A_C^-1 R r, with R the
        # composed fine->coarsest aggregation and A_C the GLOBAL
        # Galerkin coarse matrix (cut couplings included). Applied to
        # the FINE residual — restricting through the block mid-levels
        # would feed the exact global coarse solve residuals computed
        # with cut-less block operators, which measurably HURTS (157 vs
        # 109 PCG iterations on the 8-dev pitzDaily when wired into the
        # V-cycle bottom).
        gsolve = _global_coarsest_solver(
            gcoarse, levels[-1], mats[-1], lower, upper)
        cr = gcoarse.cell_rows
        nc_pad = gcoarse.nc_pad

        def coarse_corr(r):
            b_loc = jnp.zeros((nc_pad + 1,) + r.shape[1:],
                              r.dtype).at[cr].add(r)[:nc_pad]
            x_loc = gsolve(b_loc)
            xpad = jnp.concatenate(
                [x_loc, jnp.zeros((1,) + r.shape[1:], r.dtype)], axis=0)
            return jnp.take(xpad, cr, axis=0)
    if levels:
        lvl = levels[-1]

        def dense_of(dcol):
            # padded coarse rows (cross-shard stacking) carry a zero
            # diagonal; identity rows keep the inverse nonsingular
            # (their rhs is always zero)
            dcol = jnp.where(dcol == 0.0, jnp.ones_like(dcol), dcol)
            return (jnp.zeros((ncc, ncc), dC.dtype)
                    .at[jnp.arange(ncc), jnp.arange(ncc)].set(dcol)
                    .at[lvl.coarse_owner, lvl.coarse_neighbour].add(upC)
                    .at[lvl.coarse_neighbour, lvl.coarse_owner].add(loC))

        def inv_of(a):
            if a.dtype == jnp.float64 and \
                    jax.devices()[0].platform not in ("cpu", "gpu"):
                # TPU LuDecomposition is F32-only; the coarsest-level
                # correction tolerates reduced precision
                return jnp.linalg.inv(a.astype(jnp.float32)) \
                    .astype(a.dtype)
            return jnp.linalg.inv(a)

        if dC.ndim == 1:
            invC = inv_of(dense_of(dC))
        else:
            # column-batched vector system: per-component inverse
            invC = jnp.stack([inv_of(dense_of(dC[:, k]))
                              for k in range(dC.shape[1])])

    def vcycle(x, b):
        if corr_mask is not None:
            # block mode: the cycle sees only the owned block; ghost and
            # padding rows of the rhs/iterate are pinned to zero
            x = _ext(corr_mask, x) * x
            b = _ext(corr_mask, b) * b
        # down-leg: smooth, residual, restrict
        xs, bs = [x], [b]
        for i, lv in enumerate(levels):
            d_i = mats[i][0]
            xi = xs[i]
            if n_pre:
                xi = smooth(i, bs[i], xi, n_pre)
            r = bs[i] - amuls[i](xi)
            xs[i] = xi
            bs.append(_restrict(lv, r))
            xs.append(jnp.zeros((lv.n_coarse,) + x.shape[1:], x.dtype))
        # coarsest: precomputed-inverse matmul (MXU)
        if levels:
            if invC.ndim == 2:
                xs[-1] = invC @ bs[-1]          # (ncc,ncc)@(ncc[,m])
            else:
                xs[-1] = jnp.einsum("kij,jk->ik", invC, bs[-1])
        else:
            xs[-1] = smooth(0, bs[-1], xs[-1], 8)
        # up-leg: prolong + scale correction + post-smooth. The scaling
        # (reference: GAMGSolverScale.C, scaleCorrection) is what makes
        # piecewise-constant (aggregation) prolongation converge fast:
        # alpha = <c,r>/<c,Ac> line-search on the prolonged correction.
        for i in range(len(levels) - 1, -1, -1):
            lv = levels[i]
            corr = jnp.take(xs[i + 1], lv.restrict_addr, axis=0)
            if i == 0 and corr_mask is not None:
                # ghost fine rows prolong from the out-of-range pad slot
                # (clamped gather) — mask them off the owned block
                corr = _ext(corr_mask, corr) * corr
            if scale_correction:
                r_cur = bs[i] - amuls[i](xs[i])
                a_corr = amuls[i](corr)
                # block mode: the whole cycle is shard-local (masked rhs,
                # padded rows zero), so the <c,r>/<c,Ac> line search is a
                # plain local sum — each block scales its own correction
                ssum = jnp.sum if corr_mask is not None else gsum
                num = ssum(corr * r_cur)
                den = ssum(corr * a_corr)
                alpha = num / jnp.where(jnp.abs(den) < 1e-30, 1e-30, den)
                corr = alpha * corr
            elif fixed_scale != 1.0:
                # linear stand-in for the <c,r>/<c,Ac> line search
                # (preconditioner mode must stay a fixed linear operator)
                corr = fixed_scale * corr
            xi = xs[i] + corr
            sweeps = n_finest if i == 0 else n_post
            xi = smooth(i, bs[i], xi, sweeps)
            xs[i] = xi
        return xs[0]

    if coarse_corr is None:
        return vcycle

    def mask(v):
        return _ext(corr_mask, v) * v if corr_mask is not None else v

    def vcycle_two_level(x, b):
        # symmetrized multiplicative two-level Schwarz:
        #   M^-1 = C + (I - C A) B (I - A C),  C = P A_C^-1 R (global
        # coarse), B = the block V-cycle. Exact on the coarse space both
        # before and after the block cycle, so block and coarse
        # corrections never double-count — measured 8-dev pitzDaily PCG
        # iterations: 109 (block only) / 79 (additive) / this variant
        # below. blk mode is preconditioner-only (x == 0 on every call
        # from _gamg_precond / the Krylov-wrapped gamg_solve), so the
        # input residual is b itself.
        b = mask(b)
        w1 = mask(coarse_corr(b))
        r1 = mask(b - amul_fine(w1))
        w2 = w1 + vcycle(jnp.zeros_like(b), r1)
        r2 = mask(b - amul_fine(w2))
        return w2 + mask(coarse_corr(r2))

    return vcycle_two_level


def gamg_solve(mesh: MeshArrays, m, amul_fine, diag, source,
               psi0, controls):
    """V-cycle iteration until convergence (fvSolution 'solver GAMG')."""
    from .solvers import _converged, _norm_factor, gsum

    from ..parallel import hooks as _ph
    if _ph.gamg_block() is not None or getattr(mesh, "gdia", None) is not None:
        # distributed: the block V-cycle alone has no cut-face coupling
        # on its coarse levels (parallel/dist_gamg.py), so plain cycling
        # stalls once interface error dominates. Krylov-wrap it instead:
        # PCG/PBiCGStab with the block V-cycle as preconditioner — the
        # outer Krylov carries the global coupling (psum/halo), matching
        # the reference's converged result, if not its exact iteration
        # path (processorGAMGInterface per-level comms,
        # src/OpenFOAM/matrices/lduMatrix/solvers/GAMG/interfaces/).
        # gdia lattice meshes take the same route: their V-cycle
        # preconditions the pure-lattice operator (the ghost fold/sync
        # coupling of merged cells is not in the coefficient planes —
        # linalg/structured_mg.py), so plain V-cycling converges to the
        # WRONG fixed point on meshes with merged/dead slots (the r4
        # masked-grid regression); the Krylov wrapper supplies the exact
        # folded operator and the cycle stays a preconditioner.
        import dataclasses

        from .solvers import _pbicgstab, _pcg
        c2 = dataclasses.replace(controls, preconditioner="GAMG")
        if m.symmetric:
            return _pcg(mesh, amul_fine, m, diag, source, psi0, c2)
        return _pbicgstab(mesh, amul_fine, m, diag, source, psi0, c2)

    vcycle = make_vcycle(mesh, m, amul_fine, diag, controls, m.symmetric)

    v_ones = jnp.ones_like(psi0)
    apsi = amul_fine(psi0)
    nf = _norm_factor(amul_fine, psi0, source, apsi, v_ones)
    # delta form (see solvers._pcg): cycle on A*delta = r0 from zero so
    # fp32 V-cycle corrections never quantize against a large |psi0|
    b = source - apsi
    res0 = gsum(jnp.abs(b)) / nf

    # stall guard: stop when the residual hasn't improved for a few
    # cycles instead of burning maxIter. fp32 floors sit well above
    # practical tolerances (tight window); fp64 V-cycling also has a
    # roundoff floor (~5e-12 normalized on pitzDaily — a 1e-12
    # tolerance burned the full 1000 iterations there), so fp64 gets a
    # generous-but-finite window too.
    stall = 6 if psi0.dtype == jnp.float32 else 30

    def cond(carry):
        x, it, res, best, since_best = carry
        return (~_converged(res, res0, controls, it)) \
            & (it < controls.max_iter) & (since_best < stall)

    def body(carry):
        x, it, res, best, since_best = carry
        x = vcycle(x, b)
        res = gsum(jnp.abs(b - amul_fine(x))) / nf
        improved = res < 0.97 * best
        best = jnp.minimum(best, res)
        since_best = jnp.where(improved, 0, since_best + 1)
        return x, it + 1, res, best, since_best

    x, it, res, _, _ = lax.while_loop(
        cond, body, (jnp.zeros_like(psi0), jnp.asarray(0, jnp.int32),
                     res0, res0, jnp.asarray(0, jnp.int32)))
    return psi0 + x, (res0, res, it)
