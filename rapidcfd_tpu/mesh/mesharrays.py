"""MeshArrays — the static, padded, SoA device mesh.

This is the TPU-first re-founding of the reference's single most important
architectural idea (SURVEY.md intro): RapidCFD's cell-parallel *gather*
addressing (ownerStartAddr/losortAddr CSR over LDU faces, reference:
src/OpenFOAM/matrices/lduMatrix/lduAddressing/lduAddressing.H:243-252) taken
one step further into a fully regular padded ELL layout:

- every cell owns up to K face slots (K = max faces/cell over the mesh);
- each slot knows its global face, its sign (+1 owner / -1 neighbour), its
  neighbouring cell, and where the matching LDU coefficient lives in a
  concatenated [upper | lower | 0] array;
- all finite-volume gathers become dense (nCells, K) indexed loads + masked
  reductions — no scatter, no dynamic shapes, XLA-tileable.

Faces of `empty` patches (2D cases) are excluded from the ELL, matching the
reference's empty fvPatchField contributing nothing to assembly.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .geometry import (cell_centres_and_vols, cuthill_mckee,
                       face_centres_and_areas, interpolation_coeffs,
                       renumber_mesh)
from .polymesh import PolyMesh


@dataclass(frozen=True)
class Patch:
    """Static boundary-patch metadata (name/type/face range)."""
    name: str
    type: str
    start: int      # global face index of first patch face
    size: int
    bstart: int     # index into boundary-face-indexed arrays (start-nInternal)

    @property
    def is_empty(self) -> bool:
        return self.type == "empty"

    @property
    def is_coupled(self) -> bool:
        return self.type in ("processor", "cyclic", "processorCyclic")

    @property
    def is_ami(self) -> bool:
        return self.type in ("cyclicAMI", "cyclicACMI")


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class AmiDevTable:
    """Device-side cyclicAMI coupling table for ONE patch: ghost values
    at its faces are w-weighted sums of partner-side face-cell values
    (mesh/ami.py computes the overlap weights host-side)."""
    nbr_cells: jax.Array      # (size, K) i32 partner face-cells (global)
    w: jax.Array              # (size, K) overlap weights (rows sum 1)
    dc: jax.Array             # (size,) owner<->ghost delta coefficient
    w_face: jax.Array         # (size,) owner weight for face interp
    rot: jax.Array | None = None   # (3,3) vector transform or None
    # owner side of the pair (the patch whose dict lists neighbourPatch
    # first) — jump-cyclic BCs apply +jump here, -jump on the slave
    # (reference: cyclicPolyPatch::owner())
    owner: bool = dataclasses.field(default=True,
                                    metadata=dict(static=True))
    # partner patch index (for jump lookup across the pair)
    partner: int = dataclasses.field(default=-1,
                                     metadata=dict(static=True))
    # cyclicACMI: per-face covered fraction in [tol, 1-tol] (w rows
    # then sum to the RAW coverage, not 1 — reference srcMask), and the
    # non-overlap patch carrying the (1-mask)-scaled remainder area
    mask: jax.Array | None = None
    non_overlap: int = dataclasses.field(default=-1,
                                         metadata=dict(static=True))


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class MeshArrays:
    # face-indexed geometry/topology
    owner: jax.Array          # (nFaces,) i32
    neighbour: jax.Array      # (nInternal,) i32
    Sf: jax.Array             # (nFaces, 3)
    mag_sf: jax.Array         # (nFaces,)
    Cf: jax.Array             # (nFaces, 3)
    # cell-indexed geometry
    C: jax.Array              # (nCells, 3)
    V: jax.Array              # (nCells,)
    # interpolation coefficients (internal faces)
    weights: jax.Array        # (nInternal,) owner weight
    delta_coeffs: jax.Array   # (nInternal,)
    nonorth_delta_coeffs: jax.Array
    corr_vecs: jax.Array      # (nInternal, 3)
    # boundary-face-indexed (size nFaces - nInternal)
    b_delta_coeffs: jax.Array
    b_nonorth_delta_coeffs: jax.Array
    # ELL connectivity
    cell_faces: jax.Array     # (nCells, K) i32, pad=0
    cell_sign: jax.Array      # (nCells, K) +1/-1/0
    cell_nbr: jax.Array       # (nCells, K) i32, pad=self
    ell_coeff_idx: jax.Array  # (nCells, K) i32 into [upper|lower|0]
    internal_mask: jax.Array  # (nCells, K) 1.0 where slot is internal face
    # static metadata
    n_cells: int = dataclasses.field(metadata=dict(static=True))
    n_faces: int = dataclasses.field(metadata=dict(static=True))
    n_internal: int = dataclasses.field(metadata=dict(static=True))
    K: int = dataclasses.field(metadata=dict(static=True))
    patches: tuple[Patch, ...] = dataclasses.field(metadata=dict(static=True))
    # structured-box fast path metadata (mesh/structured.py), or None
    structured: object = dataclasses.field(
        default=None, metadata=dict(static=True))
    # cyclicAMI coupling tables, one entry per patch (None if not AMI);
    # () when the mesh has no AMI interfaces (mesh/ami.py)
    ami: tuple = ()
    # solver layouts precomputed from the CONCRETE mesh by
    # linalg.precompute.attach_solver_layouts, so jitted steps can pass
    # the mesh as a traced argument (keeping O(mesh) geometry out of the
    # compiled program's constants) without losing the banded/DIA SpMV
    # or GAMG: both are pytree children whose arrays ride the jit
    # boundary as inputs. None = not precomputed (derive from the
    # concrete mesh on demand; gather/raise on tracers).
    band: object = None   # linalg.banded.BandLayout | None
    gamg: object = None   # tuple[linalg.gamg.Level, ...] | None
    # generalized-DIA lattice embedding (mesh/gdia.py GdiaInfo), or None.
    # When set, cells are lattice SLOTS (n_cells == n_lat, ghost slots
    # mirror their primary), internal faces are offset planes, and every
    # hot finite-volume kernel is shift/slice-based (zero gathers).
    gdia: object = None
    # precomputed Gauss shift-MAC coefficient planes for the gdia fused
    # fvc fast path (mesh/gdia.py GaussPlanes), or None
    gauss: object = None
    # nearest-wall distance per cell (models/turbulence.wall_distance),
    # attached when a wall-distance-consuming model runs DECOMPOSED so
    # the per-shard meshes carry their local slice (a closure-captured
    # global array cannot cross shard_map); None = models use their own
    # globally-computed field
    wall_dist: jax.Array | None = None
    # per-slot assembly volume (ghost slots 0 so folded cell integrals
    # are exact); None = use V (ordinary meshes)
    V_assemble: jax.Array | None = None
    # batched boundary scatter (all non-empty patches concatenated):
    # every TPU scatter costs a full copy of the target array, so the
    # boundary fold of a 1M-cell field must be ONE scatter, not one per
    # patch. bnd_cells[i] = face-cell of boundary face bnd_sel[i]
    # (bstart order). None = fall back to per-patch scatters.
    bnd_cells: jax.Array | None = None
    bnd_sel: jax.Array | None = None

    @property
    def V_asm(self) -> jax.Array:
        return self.V if self.V_assemble is None else self.V_assemble

    # -- helpers -----------------------------------------------------------
    @property
    def n_boundary(self) -> int:
        return self.n_faces - self.n_internal

    def patch_face_cells(self, p: Patch) -> jax.Array:
        return self.owner[p.start:p.start + p.size]

    def patch_cell_values(self, p: Patch, data: jax.Array) -> jax.Array:
        """data at the patch's face cells — side-slab slices on
        structured boxes, a take otherwise."""
        if self.structured is not None:
            from . import structured as st
            segs = self.structured.patch_segments[self.patches.index(p)]
            return st.patch_internal_values(self, self.structured, p,
                                            segs, data)
        if data.ndim >= 2 and self.gdia is not None:
            # per-component gathers over contiguous (n,) slices — an
            # index op on an (n, 3) array forces the 42x lane-padded
            # row-major layout (see add_at_boundary_cells)
            idx = self.patch_face_cells(p)
            rank = data.shape[1:]
            flat = data.reshape(data.shape[0], -1)
            cols = [jnp.take(flat[:, c], idx)
                    for c in range(flat.shape[1])]
            return jnp.stack(cols, axis=1).reshape(
                (idx.shape[0],) + rank)
        return jnp.take(data, self.patch_face_cells(p), axis=0)

    def ami_table(self, p: Patch) -> "AmiDevTable | None":
        if not self.ami:
            return None
        return self.ami[self.patches.index(p)]

    def ami_ghost(self, p: Patch, x: jax.Array,
                  default: jax.Array | None = None) -> jax.Array:
        """Partner-side ghost values at an AMI patch's faces: the
        w-weighted sum of partner face-cell values of x ((nCells,) or
        (nCells, m)); vectors are rotated by the coupled transform.

        cyclicACMI (t.mask set): w rows sum to the covered fraction,
        so the bare sum is the reference's matrix-side interpolate(pnf)
        (coupled contribution only). `default` supplies the uncovered
        remainder — (1-mask)*default is added, the reference's
        interpolate(pnf, defaultValues) used by patchNeighbourField."""
        t = self.ami_table(p)
        g = jnp.take(x, t.nbr_cells, axis=0)        # (S, K) + rank
        w = t.w[..., None] if x.ndim == 2 else t.w
        g = (w * g).sum(axis=1)
        if t.rot is not None and x.ndim == 2 and x.shape[1] == 3:
            g = g @ t.rot.T
        if t.mask is not None and default is not None:
            m = t.mask[:, None] if g.ndim == 2 else t.mask
            g = g + (1.0 - m) * default
        return g

    def add_at_patch_cells(self, p: Patch, data: jax.Array,
                           vals: jax.Array) -> jax.Array:
        """data[faceCells(p)] += vals — slab adds on structured boxes."""
        if self.structured is not None:
            from . import structured as st
            segs = self.structured.patch_segments[self.patches.index(p)]
            return st.add_at_patch_cells(self, self.structured, p, segs,
                                         data, vals)
        return data.at[self.patch_face_cells(p)].add(vals)

    def add_at_boundary_cells(self, data: jax.Array,
                              bvals: jax.Array) -> jax.Array:
        """data[faceCells] += bvals over EVERY non-empty patch in ONE
        scatter (bvals in bstart order). A TPU scatter pays a full copy
        of `data`, so per-patch scatters over a 1M-cell field cost
        n_patches copies; this is the batched form."""
        if self.bnd_cells is None:
            for p in self.patches:
                if p.is_empty or p.size == 0:
                    continue
                data = self.add_at_patch_cells(
                    p, data, bvals[p.bstart:p.bstart + p.size])
            return data
        # bnd_cells is SORTED (with bnd_sel permuted to match, see
        # _bnd_batch): a sorted-segment sum lowers to the cheap scan
        # path, where the general duplicate-index scatter-add costs a
        # sort pipeline per call (measured ~1 ms vs ~0 at 16k faces
        # into 128k cells on v5e). On gdia meshes run it PER COMPONENT
        # over contiguous (n,) slices: index ops on (n, 3) arrays force
        # the row-major {1,0:T(8,128)} layout whose 3-wide minor dim
        # pads to 128 lanes (42x memory inflation), and the relayout
        # infects every neighbouring op in the graph.
        import jax.ops
        vals = jnp.take(bvals, self.bnd_sel, axis=0)
        n = data.shape[0]
        if data.ndim >= 2 and self.gdia is not None:
            rank = data.shape[1:]
            flat = data.reshape(n, -1)
            vflat = vals.reshape(vals.shape[0], -1)
            cols = [flat[:, c] + jax.ops.segment_sum(
                        vflat[:, c], self.bnd_cells, num_segments=n,
                        indices_are_sorted=True)
                    for c in range(flat.shape[1])]
            return jnp.stack(cols, axis=1).reshape((n,) + rank)
        add = jax.ops.segment_sum(vals, self.bnd_cells,
                                  num_segments=n,
                                  indices_are_sorted=True)
        return data + add

    def patch_mag_sf(self, p: Patch) -> jax.Array:
        return self.mag_sf[p.start:p.start + p.size]

    def patch_active(self, p: Patch) -> jax.Array:
        """1.0 for real patch faces, 0.0 for decomposition padding (padded
        faces have zero area and owner = a live cell — any scatter over
        patch_face_cells must be masked by this or it corrupts that
        cell)."""
        return (self.patch_mag_sf(p) > 0).astype(self.mag_sf.dtype)

    def patch_sf(self, p: Patch) -> jax.Array:
        return self.Sf[p.start:p.start + p.size]

    def patch_cf(self, p: Patch) -> jax.Array:
        return self.Cf[p.start:p.start + p.size]

    def patch_delta_coeffs(self, p: Patch) -> jax.Array:
        return self.b_delta_coeffs[p.bstart:p.bstart + p.size]

    def patch_nonorth_delta_coeffs(self, p: Patch) -> jax.Array:
        return self.b_nonorth_delta_coeffs[p.bstart:p.bstart + p.size]

    def patch_normals(self, p: Patch) -> jax.Array:
        sf = self.patch_sf(p)
        return sf / jnp.maximum(self.patch_mag_sf(p), 1e-30)[:, None]


@dataclass(frozen=True)
class MeshMaps:
    """Orderings between on-disk and device layouts (perm[new] = old).
    cell_primary (gdia meshes): bool mask of device slots that uniquely
    own a file cell — ghost slots mirror their primary (idempotent
    writes) but DEAD slots carry garbage and must not write back."""
    cell_perm: np.ndarray
    face_perm: np.ndarray
    cell_primary: np.ndarray | None = None

    def cells_to_device(self, file_order: np.ndarray) -> np.ndarray:
        return file_order[self.cell_perm]

    def cells_to_file(self, dev_order: np.ndarray) -> np.ndarray:
        # gdia meshes are PADDED (n_device >= n_file, ghost slots carry
        # duplicate cell ids with identical synced values)
        if self.cell_primary is not None:
            perm = self.cell_perm[self.cell_primary]
            dev = dev_order[self.cell_primary]
        else:
            perm, dev = self.cell_perm, dev_order
        n_file = int(perm.max()) + 1 if perm.size else 0
        out = np.empty((n_file,) + dev_order.shape[1:], dev_order.dtype)
        out[perm] = dev
        return out

    def faces_to_device(self, file_order: np.ndarray) -> np.ndarray:
        return file_order[self.face_perm]

    def faces_to_file(self, dev_order: np.ndarray) -> np.ndarray:
        out = np.empty_like(dev_order)
        out[self.face_perm] = dev_order
        return out


def default_dtype():
    """fp64 when x64 is enabled (CPU validation), else fp32 (TPU runs)."""
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def build_ell(own: np.ndarray, nei: np.ndarray, nc: int, n_int: int,
              active: np.ndarray, K_force: int | None = None) -> dict:
    """Pack face incidence into the padded ELL layout (host numpy).

    own: (nFaces,) owner cell per face; nei: (nInternal,); active: (nFaces,)
    bool mask of faces that participate (excludes empty-patch and padding
    faces). Returns cell_faces/cell_sign/cell_nbr/ell_idx/internal_mask/K.
    """
    act_f = np.nonzero(active)[0]
    act_int = act_f[act_f < n_int]
    cells = np.concatenate([own[act_f], nei[act_int]])
    faces = np.concatenate([act_f, act_int])
    signs = np.concatenate([np.ones(act_f.size), -np.ones(act_int.size)])
    order = np.argsort(cells, kind="stable")
    cells, faces, signs = cells[order], faces[order], signs[order]

    counts = np.bincount(cells, minlength=nc)
    K = int(counts.max()) if counts.size else 0
    if K_force is not None:
        assert K_force >= K, (K_force, K)
        K = K_force
    starts = np.zeros(nc + 1, dtype=np.int64)
    np.cumsum(counts, out=starts[1:])
    slots = np.arange(cells.size) - starts[cells]

    cell_faces = np.zeros((nc, K), dtype=np.int64)
    cell_sign = np.zeros((nc, K))
    cell_nbr = np.tile(np.arange(nc)[:, None], (1, K))
    ell_idx = np.full((nc, K), 2 * n_int, dtype=np.int64)
    internal_mask = np.zeros((nc, K))

    cell_faces[cells, slots] = faces
    cell_sign[cells, slots] = signs
    is_int = faces < n_int
    safe_f = np.minimum(faces, max(n_int - 1, 0))
    # owner-side slot of an internal face sees nei[f]; neighbour-side own[f]
    other = np.where(signs > 0, nei[safe_f] if n_int else cells, own[faces])
    cell_nbr[cells, slots] = np.where(is_int, other, cells)
    ell_idx[cells, slots] = np.where(
        is_int, np.where(signs > 0, faces, n_int + faces), 2 * n_int)
    internal_mask[cells, slots] = is_int.astype(float)
    return dict(cell_faces=cell_faces, cell_sign=cell_sign,
                cell_nbr=cell_nbr, ell_idx=ell_idx,
                internal_mask=internal_mask, K=K)


def build_mesh_arrays(mesh: PolyMesh, *, renumber: bool = True,
                      dtype=None, keep_cyclic=()
                      ) -> tuple[MeshArrays, PolyMesh, "MeshMaps"]:
    """Host preprocessing pipeline: renumber -> geometry -> ELL -> device.

    Returns (MeshArrays, renumbered PolyMesh, MeshMaps). MeshMaps carries
    cell_perm/face_perm with perm[new] = old so field IO can translate
    between on-disk (original) and device (renumbered) orderings.

    keep_cyclic: patch names whose cyclic pairs must NOT be merged into
    internal faces — they carry jump BCs (fan/fixedJump/uniformJump,
    reference: jumpCyclicFvPatchField with `patchType cyclic`) and stay
    coupled patches via the conformal-AMI machinery (overlap weights are
    exact 1:1 for matching faces).
    """
    if dtype is None:
        dtype = default_dtype()

    if keep_cyclic:
        keep = set(keep_cyclic)
        # convert BOTH sides of each named pair to cyclicAMI
        for p in list(mesh.patches):
            if p.name in keep and p.type == "cyclic":
                keep.add(p.extra.word("neighbourPatch", ""))
        # plain cyclic pairs carry no transform spec — the merge path
        # matches by mean-translation (cyclic.py merge_cyclic); give the
        # AMI overlap the same rule by inferring the translational
        # separation from the patch face-centre means (exact for
        # conformal pairs; a coincident fan baffle infers sep=0)
        Cf0, _ = face_centres_and_areas(mesh)
        by_name = {p.name: p for p in mesh.patches}
        new_patches = []
        for p in mesh.patches:
            if p.name not in keep or p.type != "cyclic":
                new_patches.append(p)
                continue
            if p.extra.word("transform", "none") == "none":
                nbr = by_name[p.extra.word("neighbourPatch", "")]
                ca = Cf0[p.start_face:p.start_face + p.n_faces]
                cb = Cf0[nbr.start_face:nbr.start_face + nbr.n_faces]
                sep = cb.mean(0) - ca.mean(0)
                p.extra["transform"] = "translational"
                p.extra["separationVector"] = tuple(float(x) for x in sep)
            new_patches.append(dataclasses.replace(p, type="cyclicAMI"))
        mesh = dataclasses.replace(mesh, patches=new_patches)

    # cyclic patches: merge matched pairs into coupled internal faces
    # BEFORE renumbering so the periodic edges inform the bandwidth
    from .cyclic import cyclic_interpolation_override, merge_cyclic
    partner = None
    a_cell = None
    face_map0 = np.arange(mesh.n_faces, dtype=np.int64)
    if any(p.type == "cyclic" for p in mesh.patches):
        ctrs0, _ = face_centres_and_areas(mesh)
        mesh, fm0, partner, a_cell = merge_cyclic(mesh, ctrs0)
        if fm0 is not None:
            face_map0 = fm0

    cell_perm = np.arange(mesh.n_cells, dtype=np.int64)
    face_perm = np.arange(mesh.n_faces, dtype=np.int64)
    # Structured boxes in natural ordering take the gather-free fast
    # path (mesh/structured.py): axis-blocked faces, DIA SpMV, slab
    # boundary ops — strictly better on TPU than any bandwidth-reduced
    # ordering, so RCM is skipped automatically when detected
    # (opt-out: RCFD_FORCE_RCM=1).
    from .structured import detect_structured, reorder_internal_faces
    from ..utils import switches
    sinfo = None
    det = None
    if partner is None and mesh.n_internal_faces > 0 \
            and not switches.enabled("FORCE_RCM"):
        det = detect_structured(mesh)
    if det is not None:
        renumber = False
    if renumber and mesh.n_internal_faces > 0:
        cell_perm = cuthill_mckee(mesh)
        mesh, face_perm = renumber_mesh(mesh, cell_perm,
                                        return_face_order=True)
        if partner is not None:
            partner = partner[face_perm]
            inv = np.empty(mesh.n_cells, dtype=np.int64)
            inv[cell_perm] = np.arange(mesh.n_cells)
            a_cell = a_cell[face_perm]
            a_cell = np.where(a_cell >= 0, inv[np.maximum(a_cell, 0)], -1)
    face_perm = face_map0[face_perm]
    if det is not None:
        sinfo, face_order = det
        mesh, idx = reorder_internal_faces(mesh, face_order)
        face_perm = face_perm[idx]

    Cf, Sf = face_centres_and_areas(mesh)
    raw_ami, area_scale = _ami_raw_tables(mesh)
    if area_scale is not None:
        # cyclicACMI area apportioning BEFORE cell geometry: coupled
        # faces carry mask*|Sf0|, their non-overlap partners
        # (1-mask)*|Sf0| (reference cyclicACMIPolyPatch::resetAMI runs
        # inside patch geometry init). The interface faces are
        # DUPLICATES (couple + blockage baffles over the same polygon,
        # same owner), so the scaled pair sums to one full face —
        # divergence-theorem cell volumes then count the interface once.
        Sf = Sf * area_scale[:, None]
    own_ctrs = None
    nei_ctrs = None
    if partner is not None:
        n_int0 = mesh.n_internal_faces
        own_ctrs = Cf.copy()
        nei_ctrs = Cf[:n_int0].copy()
        cyc = a_cell[:n_int0] >= 0
        own_is_a = mesh.owner[:n_int0] == a_cell[:n_int0]
        # the cell NOT holding the A geometry sees the partner centre
        sel_o = cyc & ~own_is_a
        sel_n = cyc & own_is_a
        own_ctrs[:n_int0][sel_o] = partner[:n_int0][sel_o]
        nei_ctrs[sel_n] = partner[:n_int0][sel_n]
    C, V = cell_centres_and_vols(mesh, Cf if own_ctrs is None else own_ctrs,
                                 Sf, nei_ctrs)
    coeffs = interpolation_coeffs(mesh, C, Cf, Sf)
    if partner is not None:
        coeffs = cyclic_interpolation_override(mesh, partner, a_cell, C,
                                               Cf, Sf, coeffs)

    nc, nf, n_int = mesh.n_cells, mesh.n_faces, mesh.n_internal_faces
    own, nei = mesh.owner, mesh.neighbour

    # patch metadata
    patches = []
    for p in mesh.patches:
        patches.append(Patch(p.name, p.type, p.start_face, p.n_faces,
                             p.start_face - n_int))

    # which faces participate in the ELL (exclude empty-patch faces)
    active = np.ones(nf, dtype=bool)
    for p in patches:
        if p.is_empty:
            active[p.start:p.start + p.size] = False

    ell = build_ell(own, nei, nc, n_int, active)
    K = ell["K"]
    cell_faces, cell_sign = ell["cell_faces"], ell["cell_sign"]
    cell_nbr, ell_idx = ell["cell_nbr"], ell["ell_idx"]
    internal_mask = ell["internal_mask"]

    idt = jnp.int32
    bnd_cells, bnd_sel = _bnd_batch(own, patches)
    ami_tables = _build_ami(mesh, patches, raw_ami,
                            coeffs["b_delta_coeffs"], n_int, dtype)
    ma = MeshArrays(
        owner=jnp.asarray(own, idt),
        neighbour=jnp.asarray(nei, idt),
        Sf=jnp.asarray(Sf, dtype),
        mag_sf=jnp.asarray(np.linalg.norm(Sf, axis=1), dtype),
        Cf=jnp.asarray(Cf, dtype),
        C=jnp.asarray(C, dtype),
        V=jnp.asarray(V, dtype),
        weights=jnp.asarray(coeffs["weights"], dtype),
        delta_coeffs=jnp.asarray(coeffs["delta_coeffs"], dtype),
        nonorth_delta_coeffs=jnp.asarray(coeffs["nonorth_delta_coeffs"],
                                         dtype),
        corr_vecs=jnp.asarray(coeffs["corr_vecs"], dtype),
        b_delta_coeffs=jnp.asarray(coeffs["b_delta_coeffs"], dtype),
        b_nonorth_delta_coeffs=jnp.asarray(coeffs["b_nonorth_delta_coeffs"],
                                           dtype),
        cell_faces=jnp.asarray(cell_faces, idt),
        cell_sign=jnp.asarray(cell_sign, dtype),
        cell_nbr=jnp.asarray(cell_nbr, idt),
        ell_coeff_idx=jnp.asarray(ell_idx, idt),
        internal_mask=jnp.asarray(internal_mask, dtype),
        n_cells=nc, n_faces=nf, n_internal=n_int, K=K,
        patches=tuple(patches), structured=sinfo,
        ami=ami_tables,
        bnd_cells=bnd_cells, bnd_sel=bnd_sel,
    )
    return ma, mesh, MeshMaps(cell_perm, face_perm)


def _bnd_batch(own: np.ndarray, patches) -> tuple:
    """(bnd_cells, bnd_sel) device arrays for the single-scatter
    boundary fold (MeshArrays.add_at_boundary_cells), or (None, None)
    when every patch is empty. bnd_cells is SORTED (stable) so the fold
    can run as a sorted-segment sum; bnd_sel carries the matching
    permutation into bstart-ordered boundary arrays."""
    cells, sel = [], []
    for p in patches:
        if p.is_empty or p.size == 0:
            continue
        cells.append(np.asarray(own[p.start:p.start + p.size]))
        sel.append(np.arange(p.bstart, p.bstart + p.size))
    if not cells:
        return None, None
    cells = np.concatenate(cells)
    sel = np.concatenate(sel)
    order = np.argsort(cells, kind="stable")
    return (jnp.asarray(cells[order], jnp.int32),
            jnp.asarray(sel[order], jnp.int32))


def _ami_raw_tables(mesh: PolyMesh):
    """Host AMI/ACMI weight tables + the ACMI face-area scale.

    Returns (raw, area_scale): raw is {patch_index: AmiPair} (or None
    when the mesh has no AMI patches); area_scale an (nFaces,) area
    multiplier — 1 everywhere except cyclicACMI faces (mask) and their
    non-overlap partners (1-mask), the reference's resetAMI area
    apportioning (cyclicACMIPolyPatch.C:95-98) — or None when no ACMI.
    Weight geometry needs only points/faces, so this runs BEFORE cell
    geometry (the scaled areas must feed cell volumes: couple +
    blockage duplicates sum to one face)."""
    if not any(p.type in ("cyclicAMI", "cyclicACMI")
               for p in mesh.patches):
        return None, None
    from .ami import build_ami_tables
    raw = build_ami_tables(mesh, None, None)
    scale = None
    for i, t in raw.items():
        if t.mask is None:
            continue
        p = mesh.patches[i]
        no = mesh.patches[t.non_overlap]
        if no.n_faces != p.n_faces:
            raise ValueError(
                f"cyclicACMI '{p.name}': nonOverlapPatch '{no.name}' "
                f"size {no.n_faces} != patch size {p.n_faces}")
        if scale is None:
            scale = np.ones(mesh.n_faces)
        scale[p.start_face:p.start_face + p.n_faces] = t.mask
        scale[no.start_face:no.start_face + no.n_faces] = 1.0 - t.mask
    return raw, scale


def _build_ami(mesh: PolyMesh, patches, raw, b_dc, n_int, dtype):
    """Device AMI tables for every cyclicAMI/cyclicACMI patch from the
    precomputed raw weight tables (_ami_raw_tables) + effective
    across-interface delta coefficients. () when no AMI patches."""
    if raw is None:
        return ()
    out = []
    for i, p in enumerate(patches):
        if i not in raw:
            out.append(None)
            continue
        t = raw[i]
        tgt = patches[t.tgt]
        # partner face-cells (global cell ids) behind each target face
        tgt_cells = np.asarray(mesh.owner[tgt.start:tgt.start + tgt.size])
        nbr_cells = tgt_cells[t.nbr_idx]
        # effective delta coefficient: own distance + w-avg ghost
        # distance on the partner side (reference:
        # cyclicAMIFvPatch::deltaCoeffs via AMI-interpolated deltas).
        # ACMI rows sum to the coverage, so the distance average
        # renormalizes by it.
        d_own = 1.0 / np.maximum(
            b_dc[p.start - n_int:p.start - n_int + p.size], 1e-30)
        d_tgt = 1.0 / np.maximum(
            b_dc[tgt.start - n_int:tgt.start - n_int + tgt.size], 1e-30)
        wsum = (np.maximum(t.weights.sum(1), 1e-12) if t.mask is not None
                else 1.0)
        d_ghost = (t.weights * d_tgt[t.nbr_idx]).sum(1) / wsum
        dc = 1.0 / np.maximum(d_own + d_ghost, 1e-30)
        w_face = d_ghost / np.maximum(d_own + d_ghost, 1e-30)
        out.append(AmiDevTable(
            nbr_cells=jnp.asarray(nbr_cells, jnp.int32),
            w=jnp.asarray(t.weights, dtype),
            dc=jnp.asarray(dc, dtype),
            w_face=jnp.asarray(w_face, dtype),
            rot=(None if t.rot is None else jnp.asarray(t.rot, dtype)),
            owner=(i < t.tgt), partner=t.tgt,
            mask=(None if t.mask is None
                  else jnp.asarray(t.mask, dtype)),
            non_overlap=t.non_overlap))
    return tuple(out)


def build_gdia_mesh_arrays(mesh: PolyMesh, lattice: dict, *, dtype=None
                           ) -> tuple[MeshArrays, PolyMesh, "MeshMaps"]:
    """Build MeshArrays in the generalized-DIA lattice mode (mesh/gdia.py).

    `lattice` is the embedding produced by utils.unstructured
    (unstructured_box(lattice_out=...)): shape (nz,ny,nx), slot_cell
    (n_lat,) compacted cell per lattice slot, ghost_lead (n_lat,) leader
    slot per slot, orig_own_int/orig_nei_int (per kept internal face, in
    face order) and orig_own_bnd.

    Cells become lattice slots (fields padded, ghost slots mirroring
    their primary); internal faces become up to three full (n_lat,)
    offset planes with zero-area dummies, so assembly and SpMV are pure
    slices/shifts (reference gather counterpart:
    lduAddressing.H:243-252, lduMatrixATmul.C:43-140).
    """
    if dtype is None:
        dtype = default_dtype()
    from .geometry import (cell_centres_and_vols, face_centres_and_areas,
                           interpolation_coeffs)
    from . import gdia as _gdia
    from .gdia import GdiaInfo

    nz, ny, nx = lattice["shape"]
    n_lat = nz * ny * nx
    slot_cell = np.asarray(lattice["slot_cell"], np.int64)
    ghost_lead = np.asarray(lattice["ghost_lead"], np.int64)
    oo = np.asarray(lattice["orig_own_int"], np.int64)
    on = np.asarray(lattice["orig_nei_int"], np.int64)
    ob = np.asarray(lattice["orig_own_bnd"], np.int64)
    flip = np.asarray(lattice.get(
        "flip_int", np.zeros(oo.size, dtype=bool)))
    assert slot_cell.size == n_lat, (slot_cell.size, n_lat)

    # geometry on the REAL mesh (compacted cells, real faces)
    Cf, Sf = face_centres_and_areas(mesh)
    C, V = cell_centres_and_vols(mesh, Cf, Sf)
    coeffs = interpolation_coeffs(mesh, C, Cf, Sf)
    n_int_r = mesh.n_internal_faces
    nf_r = mesh.n_faces
    n_bnd = nf_r - n_int_r

    # plane classification: every kept internal face separates two
    # lattice-adjacent slots (merging only removes faces)
    steps = []
    if nx > 1:
        steps.append(1)
    if ny > 1:
        steps.append(nx)
    if nz > 1:
        steps.append(nx * ny)
    d = on - oo
    plane_of = np.full(n_int_r, -1, np.int64)
    for pi, st in enumerate(steps):
        plane_of[d == st] = pi
    if (plane_of < 0).any():
        bad = np.nonzero(plane_of < 0)[0][:5]
        raise ValueError(
            f"gdia: {int((plane_of < 0).sum())} internal faces are not "
            f"lattice-adjacent (first offsets {d[bad]})")
    n_planes = len(steps)
    n_pl = n_planes * n_lat
    pos = plane_of * n_lat + oo          # padded slot per real face
    n_faces_pad = n_pl + n_bnd

    def place_f(real, dummy, width=None):
        shp = (n_faces_pad,) + real.shape[1:]
        out = np.full(shp, dummy, real.dtype)
        out[pos] = real[:n_int_r]
        out[n_pl:] = real[n_int_r:]
        return out

    def place_int(real, dummy):
        shp = (n_pl,) + real.shape[1:]
        out = np.full(shp, dummy, real.dtype)
        out[pos] = real
        return out

    # flipped faces (compact owner order opposite to slot order) are
    # re-oriented into the slot convention: Sf/corr negate, w -> 1-w
    sgn_int = np.where(flip, -1.0, 1.0)
    Sf_slot = Sf.copy()
    Sf_slot[:n_int_r] *= sgn_int[:, None]
    w_slot = np.asarray(coeffs["weights"]).copy()
    w_slot[flip] = 1.0 - w_slot[flip]
    cv_slot = np.asarray(coeffs["corr_vecs"]).copy()
    cv_slot[flip] *= -1.0
    Sf_pad = place_f(Sf_slot, 0.0)
    Cf_pad = place_f(Cf, 0.0)
    w_pad = place_int(w_slot, 0.5)
    dc_pad = place_int(np.asarray(coeffs["delta_coeffs"]), 1.0)
    ndc_pad = place_int(np.asarray(coeffs["nonorth_delta_coeffs"]), 1.0)
    cv_pad = place_int(cv_slot, 0.0)

    # slot-space owner/neighbour (edge dummies clipped; their
    # coefficients are identically zero)
    slot_ids = np.arange(n_lat, dtype=np.int64)
    own_pad = np.concatenate([slot_ids] * n_planes + [ob])
    nei_pad = np.concatenate(
        [np.minimum(slot_ids + st, n_lat - 1) for st in steps])

    # masks / per-slot info. Dead slots (masked-out lattice cells —
    # forward steps, T-junctions, obstacles) carry no DOF: they get
    # identity rows (fold_diag) and never write back (cell_primary).
    dead = np.asarray(lattice.get("dead", np.zeros(n_lat, bool)), bool)
    is_ghost = (ghost_lead != slot_ids) & ~dead
    ghost_axis = np.full(n_lat, -1, np.int64)
    for pi, st in enumerate(steps):
        ghost_axis[is_ghost & (slot_ids - ghost_lead == st)] = pi
    if (is_ghost & (ghost_axis < 0)).any():
        raise ValueError("gdia: ghost slot not lattice-adjacent to its "
                         "primary (chained merges unsupported)")
    primary = (~is_ghost & ~dead).astype(np.float64)

    # ELL fallback over the padded layout (dummies excluded)
    active = np.zeros(n_faces_pad, dtype=bool)
    active[pos] = True
    patches = []
    for p in mesh.patches:
        patches.append(Patch(p.name, p.type,
                             p.start_face - n_int_r + n_pl, p.n_faces,
                             p.start_face - n_int_r))
        if p.type == "empty":
            active[p.start_face - n_int_r + n_pl:
                   p.start_face - n_int_r + n_pl + p.n_faces] = False
    active[n_pl:] |= False
    bactive = np.ones(n_bnd, dtype=bool)
    for p in patches:
        if p.is_empty:
            bactive[p.bstart:p.bstart + p.size] = False
    active[n_pl:] = bactive
    ell = build_ell(own_pad, nei_pad, n_lat, n_pl, active)

    plane_mask = np.zeros(n_pl)
    plane_mask[pos] = 1.0
    ginfo = GdiaInfo(
        ghost_prev=tuple(
            jnp.asarray((ghost_axis == pi).astype(np.float64), dtype)
            for pi in range(n_planes)),
        dead=jnp.asarray(dead.astype(np.float64), dtype),
        primary=jnp.asarray(primary, dtype),
        plane_mask=jnp.asarray(plane_mask, dtype),
        shape=(nz, ny, nx), sync_iters=1,
        axes=(nx > 1, ny > 1, nz > 1),
    )

    V_slot = np.where(primary > 0, V[slot_cell], 0.0)
    idt = jnp.int32
    bnd_cells, bnd_sel = _bnd_batch(own_pad, patches)
    ma = MeshArrays(
        owner=jnp.asarray(own_pad, idt),
        neighbour=jnp.asarray(nei_pad, idt),
        Sf=jnp.asarray(Sf_pad, dtype),
        mag_sf=jnp.asarray(np.linalg.norm(Sf_pad, axis=1), dtype),
        Cf=jnp.asarray(Cf_pad, dtype),
        C=jnp.asarray(C[slot_cell], dtype),
        V=jnp.asarray(V[slot_cell], dtype),
        weights=jnp.asarray(w_pad, dtype),
        delta_coeffs=jnp.asarray(dc_pad, dtype),
        nonorth_delta_coeffs=jnp.asarray(ndc_pad, dtype),
        corr_vecs=jnp.asarray(cv_pad, dtype),
        b_delta_coeffs=jnp.asarray(coeffs["b_delta_coeffs"], dtype),
        b_nonorth_delta_coeffs=jnp.asarray(
            coeffs["b_nonorth_delta_coeffs"], dtype),
        cell_faces=jnp.asarray(ell["cell_faces"], idt),
        cell_sign=jnp.asarray(ell["cell_sign"], dtype),
        cell_nbr=jnp.asarray(ell["cell_nbr"], idt),
        ell_coeff_idx=jnp.asarray(ell["ell_idx"], idt),
        internal_mask=jnp.asarray(ell["internal_mask"], dtype),
        n_cells=n_lat, n_faces=n_faces_pad, n_internal=n_pl,
        K=ell["K"], patches=tuple(patches), structured=None,
        ami=(), gdia=ginfo,
        gauss=_gdia.build_gauss_planes(ginfo, Sf_pad[:n_pl], w_pad),
        V_assemble=jnp.asarray(V_slot, dtype),
        bnd_cells=bnd_cells, bnd_sel=bnd_sel,
    )
    # maps: slot -> real cell (ghosts share their primary's cell, so
    # reading pads ghost-synced automatically and writing is idempotent);
    # padded face -> real face (dummies -> sentinel n_faces_real)
    face_perm = np.full(n_faces_pad, nf_r, np.int64)
    face_perm[pos] = np.arange(n_int_r)
    face_perm[n_pl:] = np.arange(n_int_r, nf_r)
    return ma, mesh, MeshMaps(slot_cell.copy(), face_perm,
                              cell_primary=primary > 0)


def ungdia_mesh_arrays(ma: MeshArrays):
    """Rebuild a plain (ELL/gather) MeshArrays from a gdia-mode mesh.

    Domain decomposition is topology-only (reference: processor patches
    are cut from the REAL face list, processorPolyPatch.H), so the
    lattice embedding must be stripped before partitioning: dummy plane
    faces would otherwise enter the local ELLs and ghost/dead slots
    would become spurious DOFs (the round-4 MULTICHIP regression).

    Returns (raw, cell_of_slot, src_slot, src_face):
      cell_of_slot (n_lat,)  raw cell id per lattice slot (-1 = dead;
                             ghost slots map to their primary's id)
      src_slot     (nc_raw,) primary lattice slot per raw cell
      src_face     (nf_raw,) padded-layout face index per raw face
    Orientation keeps the slot convention (owner = lower slot), so face
    fields (phi) translate by pure indexing, no sign flips.
    """
    g = ma.gdia
    assert g is not None, "ungdia_mesh_arrays needs a gdia-mode mesh"
    steps = g.steps
    n_lat = g.n_lat
    n_pl = len(steps) * n_lat
    assert ma.n_internal == n_pl, (ma.n_internal, n_pl)
    primary = np.asarray(g.primary) > 0
    lead = np.arange(n_lat)
    for pi, st_ in enumerate(steps):
        m = np.asarray(g.ghost_prev[pi]) > 0
        lead[m] -= st_
    nc = int(primary.sum())
    cellid = np.full(n_lat, -1, np.int64)
    cellid[primary] = np.arange(nc)
    cell_of_slot = cellid[lead]
    src_slot = np.nonzero(primary)[0]

    pos = np.nonzero(np.asarray(g.plane_mask) > 0)[0]
    n_int = pos.size
    src_face = np.concatenate(
        [pos, np.arange(n_pl, ma.n_faces, dtype=np.int64)])
    own_pad = np.asarray(ma.owner, np.int64)
    nei_pad = np.asarray(ma.neighbour, np.int64)
    own = cell_of_slot[own_pad[src_face]]
    nei = cell_of_slot[nei_pad[pos]]
    assert own.min() >= 0, "gdia boundary face owned by a dead slot"
    nf = src_face.size

    patches = tuple(Patch(p.name, p.type, p.start - n_pl + n_int,
                          p.size, p.bstart) for p in ma.patches)
    active = np.ones(nf, dtype=bool)
    for p in patches:
        if p.is_empty:
            active[p.start:p.start + p.size] = False
    ell = build_ell(own, nei, nc, n_int, active)

    def f(k):
        return np.asarray(getattr(ma, k))

    fdt = f("Sf").dtype
    idt = jnp.int32
    bnd_cells, bnd_sel = _bnd_batch(own, patches)
    raw = MeshArrays(
        owner=jnp.asarray(own, idt), neighbour=jnp.asarray(nei, idt),
        Sf=jnp.asarray(f("Sf")[src_face]),
        mag_sf=jnp.asarray(f("mag_sf")[src_face]),
        Cf=jnp.asarray(f("Cf")[src_face]),
        C=jnp.asarray(f("C")[src_slot]),
        V=jnp.asarray(f("V")[src_slot]),
        weights=jnp.asarray(f("weights")[pos]),
        delta_coeffs=jnp.asarray(f("delta_coeffs")[pos]),
        nonorth_delta_coeffs=jnp.asarray(f("nonorth_delta_coeffs")[pos]),
        corr_vecs=jnp.asarray(f("corr_vecs")[pos]),
        b_delta_coeffs=ma.b_delta_coeffs,
        b_nonorth_delta_coeffs=ma.b_nonorth_delta_coeffs,
        cell_faces=jnp.asarray(ell["cell_faces"], idt),
        cell_sign=jnp.asarray(ell["cell_sign"], fdt),
        cell_nbr=jnp.asarray(ell["cell_nbr"], idt),
        ell_coeff_idx=jnp.asarray(ell["ell_idx"], idt),
        internal_mask=jnp.asarray(ell["internal_mask"], fdt),
        n_cells=nc, n_faces=nf, n_internal=n_int, K=ell["K"],
        patches=patches, bnd_cells=bnd_cells, bnd_sel=bnd_sel)
    return raw, cell_of_slot, src_slot, src_face
