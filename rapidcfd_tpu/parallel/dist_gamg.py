"""Distributed GAMG: per-shard block hierarchies for the V-cycle.

The reference keeps GAMG's coarse levels distributed with per-level halo
interfaces (processorGAMGInterface,
src/OpenFOAM/matrices/lduMatrix/solvers/GAMG/interfaces/). On TPU the
per-level ragged halo exchanges would defeat XLA fusion, so the
re-founding is a *block* decomposition instead: each shard agglomerates
only its owned cell block (cut faces dropped), the V-cycle runs
shard-locally on the masked block, and cross-shard coupling stays in the
outer Krylov iteration through the halo/psum hooks — an additive
block-Jacobi/Schwarz multigrid preconditioner. All per-shard hierarchies
are padded to common static shapes and stacked on a leading device axis
so they pass through shard_map like every other decomposed array.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..linalg.gamg import Level, _graph_hierarchy
from ..mesh.mesharrays import build_ell
from .decompose import Decomposition


def _identity_level(own, nei, nc, nf) -> Level:
    """A coarse level equal to its fine level (used to equalise hierarchy
    depth across shards; coarsening through it is exact)."""
    own = own.astype(np.int64)
    nei = nei.astype(np.int64)
    ell = build_ell(own, nei, nc, nf, np.ones(nf, dtype=bool))
    kc = max(ell["cell_nbr"].shape[1], 1)
    return Level(
        n_coarse=nc, n_coarse_faces=nf,
        restrict_addr=np.arange(nc, dtype=np.int32),
        face_coarse=np.arange(nf, dtype=np.int32),
        face_flip=np.zeros(nf, np.float32),
        face_cell=np.zeros(nf, np.int32),
        cell_nbr=ell["cell_nbr"].astype(np.int32).reshape(nc, -1)
        if ell["cell_nbr"].size else np.zeros((nc, kc), np.int32),
        ell_idx=ell["ell_idx"].astype(np.int32).reshape(nc, -1)
        if ell["ell_idx"].size else np.full((nc, kc), 2 * nf, np.int32),
        coarse_owner=own.astype(np.int32),
        coarse_neighbour=nei.astype(np.int32),
        children=np.arange(nc, dtype=np.int32)[:, None],
        face_children=np.arange(nf, dtype=np.int32)[:, None],
        face_child_flip=np.zeros((nf, 1), np.float32),
        int_faces=np.full((nc, 1), nf, np.int32),
        n_fine=nc, n_fine_faces=nf)


def _pad_cols(a, k, fill):
    if a.shape[1] >= k:
        return a
    pad = np.full((a.shape[0], k - a.shape[1]), fill, a.dtype)
    return np.concatenate([a, pad], axis=1)


def _pad_rows(a, n, fill):
    if a.shape[0] >= n:
        return a
    pad = np.full((n - a.shape[0],) + a.shape[1:], fill, a.dtype)
    return np.concatenate([a, pad], axis=0)


def _pad_level(lv: Level, NF, NFF, NC, NFC, Kch, Kfc, Kif, Kc) -> Level:
    """Pad a shard's level to the fleet-wide static shapes. Padded coarse
    rows carry zero coefficients and zero restriction input, so they stay
    exactly zero through the cycle; padded fine rows prolong from the
    guaranteed-zero coarse row NC-1."""
    ncc, nfc = lv.n_coarse, lv.n_coarse_faces

    ra = lv.restrict_addr.astype(np.int64)
    ra = np.where(ra >= ncc, NC - 1, ra)       # old pads -> zero row
    ra = _pad_rows(ra, NF, NC - 1)

    ei = lv.ell_idx.astype(np.int64)
    # remap [upper|lower|zero] slots for the padded face count
    ei = np.where(ei >= 2 * nfc, 2 * NFC,
                  np.where(ei >= nfc, ei + (NFC - nfc), ei))
    ei = _pad_cols(_pad_rows(ei, NC, 2 * NFC), Kc, 2 * NFC)

    ch = lv.children.astype(np.int64)
    ch = np.where(ch >= lv.n_fine, NF, ch)
    ch = _pad_cols(_pad_rows(ch, NC, NF), Kch, NF)

    fch = lv.face_children.astype(np.int64)
    fch = np.where(fch >= lv.n_fine_faces, NFF, fch)
    fch = _pad_cols(_pad_rows(fch, NFC, NFF), Kfc, NFF)
    ffl = _pad_cols(_pad_rows(lv.face_child_flip, NFC, 0.0), Kfc, 0.0)

    ifc = lv.int_faces.astype(np.int64)
    ifc = np.where(ifc >= lv.n_fine_faces, NFF, ifc)
    ifc = _pad_cols(_pad_rows(ifc, NC, NFF), Kif, NFF)

    fc = np.where(lv.face_coarse.astype(np.int64) >= nfc, NFC,
                  lv.face_coarse.astype(np.int64))

    return Level(
        n_coarse=NC, n_coarse_faces=NFC, n_fine=NF, n_fine_faces=NFF,
        restrict_addr=ra.astype(np.int32),
        face_coarse=_pad_rows(fc, NFF, NFC).astype(np.int32),
        face_flip=_pad_rows(lv.face_flip, NFF, 0.0),
        face_cell=_pad_rows(lv.face_cell, NFF, 0).astype(np.int32),
        cell_nbr=_pad_cols(_pad_rows(
            lv.cell_nbr, NC, 0), Kc, 0).astype(np.int32),
        ell_idx=ei.astype(np.int32),
        coarse_owner=_pad_rows(lv.coarse_owner, NFC, 0).astype(np.int32),
        coarse_neighbour=_pad_rows(
            lv.coarse_neighbour, NFC, 0).astype(np.int32),
        children=ch.astype(np.int32),
        face_children=fch.astype(np.int32),
        face_child_flip=ffl.astype(np.float32),
        int_faces=ifc.astype(np.int32))


def build_block_hierarchies(dec: Decomposition, n_coarsest: int = 32,
                            merge_levels: int = 1) -> list[Level]:
    """Per-shard owned-block agglomeration hierarchies, padded to common
    shapes and stacked on a leading (P,) axis for shard_map."""
    P = dec.n_devices
    lm = dec.mesh
    lown = np.asarray(lm.owner)
    lnei = np.asarray(lm.neighbour)
    msf = np.asarray(lm.mag_sf)
    nil = lm.n_internal

    per_levels: list[list[Level]] = []
    tails = []
    for d in range(P):
        n_owned = int(np.asarray(dec.halo.own_mask[d]).sum())
        gf = np.asarray(dec.face_map[d])[:nil]
        own_d = lown[d, :nil].astype(np.int64)
        nei_d = lnei[d, :nil].astype(np.int64)
        sub = (gf >= 0) & (own_d < n_owned) & (nei_d < n_owned)
        fids = np.nonzero(sub)[0]
        levels, tail = _graph_hierarchy(
            own_d[fids], nei_d[fids], msf[d, fids].astype(float),
            n_owned, n_coarsest=n_coarsest, merge_levels=merge_levels,
            fine_cells=lm.n_cells, fine_faces=nil, face_ids=fids)
        per_levels.append(levels)
        tails.append(tail)

    n_levels = max(len(ls) for ls in per_levels)
    if n_levels == 0:
        return []
    for d in range(P):
        own_t, nei_t, _, nc_t = tails[d]
        if not per_levels[d]:
            # shard too small to coarsen: all-identity hierarchy over the
            # owned block, remapped onto the full local arrays like a
            # subgraph level 0
            gf = np.asarray(dec.face_map[d])[:nil]
            own_d = lown[d, :nil].astype(np.int64)
            nei_d = lnei[d, :nil].astype(np.int64)
            n_owned = int(np.asarray(dec.halo.own_mask[d]).sum())
            sub = (gf >= 0) & (own_d < n_owned) & (nei_d < n_owned)
            fids = np.nonzero(sub)[0]
            lv = _identity_level(own_d[fids], nei_d[fids], n_owned,
                                 fids.size)
            ra = np.full(lm.n_cells, n_owned, dtype=np.int32)
            ra[:n_owned] = np.arange(n_owned)
            fmap = np.concatenate([fids, [nil]]).astype(np.int32)
            lv = dataclasses.replace(
                lv, restrict_addr=ra, n_fine=lm.n_cells,
                n_fine_faces=nil,
                face_children=fmap[lv.face_children],
                int_faces=fmap[np.minimum(lv.int_faces, fids.size)])
            per_levels[d].append(lv)
            own_t, nei_t = own_d[fids], nei_d[fids]
            nc_t = n_owned
        while len(per_levels[d]) < n_levels:
            per_levels[d].append(
                _identity_level(own_t, nei_t, nc_t, own_t.size))

    stacked = []
    prev_NC = None
    for i in range(n_levels):
        lvs = [per_levels[d][i] for d in range(P)]
        NC = max(lv.n_coarse for lv in lvs) + 1
        NFC = max(lv.n_coarse_faces for lv in lvs) + 1
        NF = lm.n_cells if i == 0 else prev_NC
        NFF = nil if i == 0 else prev_NFC
        Kch = max(lv.children.shape[1] for lv in lvs)
        Kfc = max(lv.face_children.shape[1] for lv in lvs)
        Kif = max(lv.int_faces.shape[1] for lv in lvs)
        Kc = max(lv.cell_nbr.shape[1] for lv in lvs)
        padded = [_pad_level(lv, NF, NFF, NC, NFC, Kch, Kfc, Kif, Kc)
                  for lv in lvs]
        import jax
        import jax.numpy as jnp
        stacked.append(jax.tree_util.tree_map(
            lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *padded))
        prev_NC, prev_NFC = NC, NFC
    return stacked
