"""Domain decomposition: global mesh -> stacked per-device local meshes.

Replaces the reference's decomposePar + processorPolyPatch machinery
(SURVEY.md §2.7): cells are slab-partitioned along the (Cuthill-McKee
renumbered) cell index into P contiguous ranges; each device owns its
slab plus ghost copies of face-neighbour cells on other devices. Every
per-device array is padded to the max size over devices so the stacked
(P, ...) arrays shard cleanly over a jax.sharding.Mesh axis, and the
single-chip operator/solver code runs unchanged inside shard_map with
the halo/gsum hooks installed.

Local layout per device:
  cells:  [0..n_own) owned (padded with isolated dummy cells),
          [n_own..n_own+n_ghost) ghosts (padded).
  faces:  [0..n_int_loc) internal+cut faces (padded with degenerate
          zero-area faces), then per-patch owned boundary faces (each
          patch padded to its max size over devices).

Halo exchange is a ppermute ring over the 'x' mesh axis using
per-device static send/recv index vectors — the exact faceCells gather
the reference's processorFvPatchField does (SURVEY.md §3.5), fused into
the step program by XLA.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.field import VolField
from ..mesh.mesharrays import MeshArrays, Patch, build_ell, default_dtype
from ..mesh.polymesh import PolyMesh


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class HaloSpec:
    """Stacked (P, ...) halo index arrays; inside shard_map each device
    sees its own row. Exchange is nearest-neighbour over the ring: for
    each direction d (0: +1 'right', 1: -1 'left'), send
    x[send_idx[d]] and scatter the received buffer at recv_idx[d]."""
    send_idx: jax.Array   # (P, 2, H) into local cells (pad: 0)
    recv_idx: jax.Array   # (P, 2, H) into local cells (pad: dump slot)
    own_mask: jax.Array   # (P, n_local) 1.0 for owned cells


def _exchange(x, halo: HaloSpec, axis_name: str):
    """Refresh ghosts of local cell array x (runs inside shard_map, where
    halo.* have their leading device axis stripped)."""
    n = jax.lax.psum(1, axis_name)
    if n == 1:
        return x
    right = [(i, (i + 1) % n) for i in range(n)]
    left = [(i, (i - 1) % n) for i in range(n)]
    out = x
    for d, perm in ((0, right), (1, left)):
        buf = jnp.take(x, halo.send_idx[d], axis=0)
        buf = jax.lax.ppermute(buf, axis_name, perm)
        out = out.at[halo.recv_idx[d]].set(buf)
    return out


@dataclass(frozen=True)
class Decomposition:
    mesh: MeshArrays          # stacked (P, ...) local mesh arrays
    halo: HaloSpec
    n_devices: int
    # host-side per-device index maps (numpy)
    cells_of: list            # global cell ids per device [owned..., ghosts...]
    face_map: list            # per device: global face id per local face (-1 pad)
    n_own: int                # padded owned-cell count (uniform)
    slab_bounds: np.ndarray   # (P+1,) global slab boundaries

    def local_cell_of_global(self, g: int):
        """(device, local_index) of a global cell id (owned copy)."""
        d = int(np.searchsorted(self.slab_bounds, g, side="right") - 1)
        return d, int(g - self.slab_bounds[d])


def decompose_slab(ma: MeshArrays, P: int, dtype=None) -> Decomposition:
    """Decompose a (single-chip) MeshArrays into P stacked local meshes."""
    if dtype is None:
        dtype = default_dtype()
    nc, nf, n_int = ma.n_cells, ma.n_faces, ma.n_internal
    own = np.asarray(ma.owner)
    nei = np.asarray(ma.neighbour)

    bounds = np.linspace(0, nc, P + 1).astype(np.int64)
    dev_of = np.searchsorted(bounds, np.arange(nc), side="right") - 1

    # per-device: owned cells, cut faces, ghosts, local faces
    per = []
    for d in range(P):
        owned = np.arange(bounds[d], bounds[d + 1])
        o_dev = dev_of[own[:n_int]]
        n_dev = dev_of[nei]
        f_int = np.nonzero((o_dev == d) & (n_dev == d))[0]
        f_cut = np.nonzero((o_dev == d) ^ (n_dev == d))[0]
        ghost_g = np.unique(np.concatenate(
            [own[f_cut][o_dev[f_cut] != d], nei[f_cut][n_dev[f_cut] != d]]))
        # boundary faces owned by this device, grouped by patch
        bfaces = {}
        for pi, p in enumerate(ma.patches):
            gf = np.arange(p.start, p.start + p.size)
            bfaces[pi] = gf[dev_of[own[gf]] == d]
        lo = bounds[max(d - 1, 0)]
        hi = bounds[min(d + 2, P)]
        if ghost_g.size and (ghost_g.min() < lo or ghost_g.max() >= hi):
            raise ValueError(
                "slab decomposition produced non-adjacent ghosts; the "
                "ring halo needs wider exchange (reduce P or renumber)")
        per.append(dict(owned=owned, f_int=np.concatenate([f_int, f_cut]),
                        ghosts=ghost_g, bfaces=bfaces))

    n_own = max(len(p["owned"]) for p in per)
    n_ghost = max(len(p["ghosts"]) for p in per)
    n_int_loc = max(len(p["f_int"]) for p in per)
    psize = [max(len(p["bfaces"][i]) for p in per)
             for i in range(len(ma.patches))]
    # +1 scratch cell: dump slot for padded halo receives (never a real
    # ghost, so padding can't clobber live data)
    n_local = n_own + n_ghost + 1
    n_bnd_loc = sum(psize)
    nf_loc = n_int_loc + n_bnd_loc

    # static local patch metadata (uniform across devices)
    patches = []
    start = n_int_loc
    bstart = 0
    for pi, p in enumerate(ma.patches):
        patches.append(Patch(p.name, p.type, start, psize[pi], bstart))
        start += psize[pi]
        bstart += psize[pi]

    # geometry source arrays (host)
    G = {k: np.asarray(getattr(ma, k)) for k in
         ("Sf", "mag_sf", "Cf", "C", "V", "weights", "delta_coeffs",
          "nonorth_delta_coeffs", "corr_vecs", "b_delta_coeffs",
          "b_nonorth_delta_coeffs")}

    face_maps = []
    stacks = {k: [] for k in (
        "owner neighbour Sf mag_sf Cf C V weights delta_coeffs "
        "nonorth_delta_coeffs corr_vecs b_delta_coeffs "
        "b_nonorth_delta_coeffs cell_faces cell_sign cell_nbr "
        "ell_coeff_idx internal_mask").split()}
    own_mask = np.zeros((P, n_local))
    cells_of = []
    K_glob = ma.K

    # precompute per-device send lists (cells we own that device e ghosts)
    ghost_lists = [p["ghosts"] for p in per]
    sends = np.zeros((P, 2), dtype=object)
    recvs = np.zeros((P, 2), dtype=object)
    for d in range(P):
        for dirn, e in ((0, (d + 1) % P), (1, (d - 1) % P)):
            if P == 1:
                sends[d, dirn] = np.zeros(0, dtype=np.int64)
                recvs[d, dirn] = np.zeros(0, dtype=np.int64)
                continue
            # cells owned by d that appear in e's ghost list, in e's order
            gl = ghost_lists[e]
            mine = gl[(gl >= bounds[d]) & (gl < bounds[d + 1])]
            sends[d, dirn] = mine
            # symmetric: what d receives from the device in direction dirn
            src = (d - 1) % P if dirn == 0 else (d + 1) % P
            gl_d = ghost_lists[d]
            recvs[d, dirn] = gl_d[(gl_d >= bounds[src])
                                  & (gl_d < bounds[src + 1])]
    H = max(1, max(len(sends[d, k]) for d in range(P) for k in (0, 1)))
    send_idx = np.zeros((P, 2, H), dtype=np.int64)
    recv_idx = np.full((P, 2, H), n_local - 1, dtype=np.int64)

    for d in range(P):
        p = per[d]
        owned, ghosts = p["owned"], p["ghosts"]
        cells = np.concatenate([owned, ghosts])
        cells_of.append(cells)
        # global->local map
        l_of_g = {}
        for li, g in enumerate(owned):
            l_of_g[g] = li
        for li, g in enumerate(ghosts):
            l_of_g[g] = n_own + li
        own_mask[d, :len(owned)] = 1.0

        # local faces: internal+cut then per-patch boundary, padded
        f_int = p["f_int"]
        dummy = len(owned) - 1  # safe owned slot for padded faces
        lown = np.full(nf_loc, dummy, dtype=np.int64)
        lnei = np.full(n_int_loc, dummy, dtype=np.int64)
        gface = np.full(nf_loc, -1, dtype=np.int64)
        lown[:len(f_int)] = [l_of_g[c] for c in own[f_int]]
        lnei[:len(f_int)] = [l_of_g[c] for c in nei[f_int]]
        gface[:len(f_int)] = f_int
        fo = n_int_loc
        for pi, patch in enumerate(ma.patches):
            bf = p["bfaces"][pi]
            lown[fo:fo + len(bf)] = [l_of_g[c] for c in own[bf]]
            gface[fo:fo + len(bf)] = bf
            fo += psize[pi]

        active = np.zeros(nf_loc, dtype=bool)
        active[:len(f_int)] = True
        fo = n_int_loc
        for pi, patch in enumerate(ma.patches):
            if not patch.is_empty:
                active[fo:fo + len(p["bfaces"][pi])] = True
            fo += psize[pi]

        ell = build_ell(lown, lnei, n_local, n_int_loc, active,
                        K_force=K_glob)

        def slice_faces(arr, fill=0.0):
            shp = (nf_loc,) + arr.shape[1:]
            out = np.full(shp, fill, dtype=arr.dtype)
            valid = gface >= 0
            out[valid] = arr[gface[valid]]
            return out

        def slice_int(arr, fill=0.0):
            shp = (n_int_loc,) + arr.shape[1:]
            out = np.full(shp, fill, dtype=arr.dtype)
            m = gface[:n_int_loc] >= 0
            out[m] = arr[gface[:n_int_loc][m]]
            return out

        def slice_bnd(arr, fill=0.0):
            shp = (n_bnd_loc,) + arr.shape[1:]
            out = np.full(shp, fill, dtype=arr.dtype)
            fo2, bo = n_int_loc, 0
            for pi, patch in enumerate(ma.patches):
                bf = p["bfaces"][pi]
                out[bo:bo + len(bf)] = arr[bf - n_int]
                fo2 += psize[pi]
                bo += psize[pi]
            return out

        def slice_cells(arr, fill=0.0):
            shp = (n_local,) + arr.shape[1:]
            out = np.full(shp, fill, dtype=arr.dtype)
            out[:len(owned)] = arr[owned]
            out[n_own:n_own + len(ghosts)] = arr[ghosts]
            return out

        face_maps.append(gface)
        stacks["owner"].append(lown)
        stacks["neighbour"].append(lnei)
        stacks["Sf"].append(slice_faces(G["Sf"]))
        stacks["mag_sf"].append(slice_faces(G["mag_sf"]))
        stacks["Cf"].append(slice_faces(G["Cf"]))
        stacks["C"].append(slice_cells(G["C"]))
        stacks["V"].append(slice_cells(G["V"], fill=1.0))
        stacks["weights"].append(slice_int(G["weights"], fill=0.5))
        stacks["delta_coeffs"].append(slice_int(G["delta_coeffs"]))
        stacks["nonorth_delta_coeffs"].append(
            slice_int(G["nonorth_delta_coeffs"]))
        stacks["corr_vecs"].append(slice_int(G["corr_vecs"]))
        stacks["b_delta_coeffs"].append(slice_bnd(G["b_delta_coeffs"],
                                                  fill=1.0))
        stacks["b_nonorth_delta_coeffs"].append(
            slice_bnd(G["b_nonorth_delta_coeffs"], fill=1.0))
        stacks["cell_faces"].append(ell["cell_faces"])
        stacks["cell_sign"].append(ell["cell_sign"])
        stacks["cell_nbr"].append(ell["cell_nbr"])
        stacks["ell_coeff_idx"].append(ell["ell_idx"])
        stacks["internal_mask"].append(ell["internal_mask"])

        for dirn in (0, 1):
            s = sends[d, dirn]
            send_idx[d, dirn, :len(s)] = [l_of_g[g] for g in s]
            r = recvs[d, dirn]
            recv_idx[d, dirn, :len(r)] = [l_of_g[g] for g in r]

    idt = jnp.int32
    fdt = dtype

    def st(k, dt):
        return jnp.asarray(np.stack(stacks[k]), dt)

    mesh = MeshArrays(
        owner=st("owner", idt), neighbour=st("neighbour", idt),
        Sf=st("Sf", fdt), mag_sf=st("mag_sf", fdt), Cf=st("Cf", fdt),
        C=st("C", fdt), V=st("V", fdt), weights=st("weights", fdt),
        delta_coeffs=st("delta_coeffs", fdt),
        nonorth_delta_coeffs=st("nonorth_delta_coeffs", fdt),
        corr_vecs=st("corr_vecs", fdt),
        b_delta_coeffs=st("b_delta_coeffs", fdt),
        b_nonorth_delta_coeffs=st("b_nonorth_delta_coeffs", fdt),
        cell_faces=st("cell_faces", idt), cell_sign=st("cell_sign", fdt),
        cell_nbr=st("cell_nbr", idt),
        ell_coeff_idx=st("ell_coeff_idx", idt),
        internal_mask=st("internal_mask", fdt),
        n_cells=n_local, n_faces=nf_loc, n_internal=n_int_loc, K=K_glob,
        patches=tuple(patches))

    halo = HaloSpec(send_idx=jnp.asarray(send_idx, idt),
                    recv_idx=jnp.asarray(recv_idx, idt),
                    own_mask=jnp.asarray(own_mask, fdt))
    return Decomposition(mesh=mesh, halo=halo, n_devices=P,
                         cells_of=cells_of, face_map=face_maps,
                         n_own=n_own, slab_bounds=bounds)


def decompose_vol_field(dec: Decomposition, vf: VolField,
                        global_mesh: MeshArrays) -> VolField:
    """Scatter a global VolField into the stacked local layout."""
    P = dec.n_devices
    lm = dec.mesh
    data_g = np.asarray(vf.data)
    b_g = np.asarray(vf.bvalues)
    rank = data_g.shape[1:]
    data = np.zeros((P, lm.n_cells) + rank, data_g.dtype)
    bvals = np.zeros((P, lm.n_boundary) + rank, data_g.dtype)
    bcdata = []
    for d in range(P):
        cells = dec.cells_of[d]
        owned = cells[:int(dec.halo.own_mask[d].sum())]
        ghosts = cells[len(owned):]
        data[d, :len(owned)] = data_g[owned]
        data[d, dec.n_own:dec.n_own + len(ghosts)] = data_g[ghosts]
    # boundary values + bcdata per patch
    per_dev_bd = [[] for _ in range(P)]
    for pi, (gp, lp) in enumerate(zip(global_mesh.patches, lm.patches)):
        own_g = np.asarray(global_mesh.owner)
        gf = np.arange(gp.start, gp.start + gp.size)
        dev_of_face = np.searchsorted(dec.slab_bounds, own_g[gf],
                                      side="right") - 1
        for d in range(P):
            sel = gf[dev_of_face == d] - gp.start
            bo = lp.bstart
            bvals[d, bo:bo + len(sel)] = b_g[gp.bstart + sel]
            bd = {}
            for key, arr in vf.bcdata[pi].items():
                a = np.asarray(arr)
                out = np.zeros((lp.size,) + a.shape[1:], a.dtype)
                if a.ndim == 0 or a.shape[0] != gp.size:
                    out[...] = a  # uniform scalar/vector param
                else:
                    out[:len(sel)] = a[sel]
                bd[key] = jnp.asarray(np.stack([out] * 1)[0])
            per_dev_bd[d].append(bd)
    # stack bcdata across devices per patch/key
    bcdata = []
    for pi in range(len(lm.patches)):
        keys = per_dev_bd[0][pi].keys()
        bcdata.append({k: jnp.stack([per_dev_bd[d][pi][k]
                                     for d in range(P)]) for k in keys})
    return VolField(jnp.asarray(data), jnp.asarray(bvals), vf.bcs,
                    vf.dims, vf.name, tuple(bcdata), None)


def collect_vol_field(dec: Decomposition, stacked_data) -> np.ndarray:
    """Gather owned cells back to global ordering (host)."""
    arr = np.asarray(stacked_data)
    nc = dec.slab_bounds[-1]
    out = np.zeros((nc,) + arr.shape[2:], arr.dtype)
    for d in range(dec.n_devices):
        owned = dec.cells_of[d][:int(np.asarray(
            dec.halo.own_mask[d]).sum())]
        out[owned] = arr[d, :len(owned)]
    return out
