"""Banded MXU SpMV — the TPU-native replacement for the gather matvec.

Arbitrary-index gathers are the one pattern TPUs execute poorly (the
reference's texture-cached gather tricks, lduMatrixATmul.C, have no
efficient XLA analogue: a (nCells,K) random gather costs ~300us at 10k
cells). But after Cuthill-McKee renumbering every neighbour index lies
within the matrix bandwidth b, so the off-diagonal product can be cast
as a *block-banded dense matvec*:

  - cells tiled in blocks of B=128 (the MXU lane width);
  - each tile's neighbours live in a window of P=2*ceil(b/B)+1 blocks;
  - the windowed operand is built from P shifted reshapes of the padded
    vector (pure slices, no gathers);
  - y_off = einsum('tbw,tw->tb', A_band, X_win) — a batched matmul the
    MXU eats.

The (nTiles, B, P*B) band matrix is scattered once per *solve* from the
face coefficient arrays with static indices; every solver *iteration*
is then gather-free. Falls back to the gather path when the bandwidth
is too large (big 3D meshes — the Pallas block-ELL kernel covers those)
or when the mesh is a tracer with no precomputed layout.

Trace-safety: the layout can only be DERIVED from a concrete mesh, but
once derived it is a `BandLayout` pytree (arrays = leaves, shape/offset
metadata = static) that rides the jit boundary as an ordinary input.
`linalg.precompute.attach_solver_layouts` attaches it to MeshArrays at
make_step time — the fix for the round-2 regression where passing the
mesh as a traced jit argument silently killed this whole fast path.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

B = 128          # tile size (MXU/VPU lane width)
MAX_P = 13       # give up beyond this window (memory ~ n*P*B floats)

_BAND_CACHE: dict = {}


MAX_D = 10       # max distinct diagonals for the DIA (pure-shift) path
MAX_OVF_FRAC = 0.25  # max fraction of adjacencies in the overflow tail


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class BandLayout:
    """Trace-safe banded/DIA SpMV layout.

    Arrays are pytree leaves (cross the jit boundary as inputs — indexed
    scatters/gathers are fine on tracers); everything a Python loop or a
    shape depends on is static metadata. mode='none' records "derived,
    but unsuitable" so a precomputed mesh doesn't retry derivation.
    """
    # dia-mode leaves: per-diagonal (row, slot) index pairs + overflow
    rows: tuple = ()          # tuple of (m_d,) i32 arrays
    slots: tuple = ()         # tuple of (m_d,) i32 arrays
    ovf_rows: jax.Array | None = None
    ovf_slots: jax.Array | None = None
    ovf_nbr: jax.Array | None = None
    # band-mode leaves: scatter targets for the (nTiles, B, P*B) block band
    tile: jax.Array | None = None
    row: jax.Array | None = None
    col: jax.Array | None = None
    # static metadata
    mode: str = dataclasses.field(default="none",
                                  metadata=dict(static=True))
    n: int = dataclasses.field(default=0, metadata=dict(static=True))
    K: int = dataclasses.field(default=0, metadata=dict(static=True))
    offsets: tuple = dataclasses.field(default=(),
                                       metadata=dict(static=True))
    max_off: int = dataclasses.field(default=0,
                                     metadata=dict(static=True))
    n_tiles: int = dataclasses.field(default=0,
                                     metadata=dict(static=True))
    P: int = dataclasses.field(default=0, metadata=dict(static=True))
    half: int = dataclasses.field(default=0, metadata=dict(static=True))


_NONE_LAYOUT = BandLayout()


def compute_band_layout(mesh) -> BandLayout:
    """Derive the BandLayout from a CONCRETE mesh (raises
    TracerArrayConversionError on tracers). Returns mode='none' when no
    banded/DIA layout is worthwhile."""
    nbr = np.asarray(mesh.cell_nbr)
    idx = np.asarray(mesh.ell_coeff_idx)
    n, K = nbr.shape
    if n < 2 * B:
        return _NONE_LAYOUT  # tiny mesh: gather is fine, padding dominates
    cells = np.arange(n)[:, None]
    off = nbr - cells
    # zero-coefficient pad slots point at the zero slot of the
    # [upper|lower|0] array — exclude them from the offset census
    active = idx != idx.max()
    uniq, cnts = (np.unique(off[active], return_counts=True)
                  if active.any() else (np.zeros(0, int), np.zeros(0, int)))
    n_active = int(cnts.sum())
    # hybrid DIA + overflow: take the most common offsets as diagonals
    # (pure-shift FMAs) and push the long tail through a small
    # gather+scatter — the TPU analogue of the reference's dual
    # fast/slow path (lduMatrixATmul.C:42, lduAddressingFunctors.H:66).
    # Polyhedral meshes from a mostly-regular background (snappy-class)
    # concentrate >90% of adjacencies on a few offsets.
    if uniq.size:
        top = np.argsort(cnts)[::-1][:MAX_D]
        covered = int(cnts[top].sum())
        ovf = n_active - covered
        if uniq.size <= MAX_D or ovf <= MAX_OVF_FRAC * n_active:
            chosen = set(int(d) for d in uniq[top])
            max_off = int(max(abs(d) for d in chosen))
            rows, slots = [], []
            in_dia = np.zeros_like(active)
            for d in sorted(chosen):
                m2 = active & (off == d)
                # all (row, slot) pairs — merged-cell meshes can have
                # two faces between the same cell pair (same offset)
                r, s = np.nonzero(m2)
                # NOTE: stored as numpy so the cached layout is trace-free
                # (jnp constants created inside a jit trace must not be
                # cached — a jnp.asarray under trace yields a Tracer)
                rows.append(np.asarray(r, np.int32))
                slots.append(np.asarray(s, np.int32))
                in_dia |= m2
            ovf_r, ovf_s = np.nonzero(active & ~in_dia)
            return BandLayout(
                mode="dia", n=n, K=K,
                offsets=tuple(sorted(chosen)),
                rows=tuple(rows), slots=tuple(slots), max_off=max_off,
                ovf_rows=np.asarray(ovf_r, np.int32),
                ovf_slots=np.asarray(ovf_s, np.int32),
                ovf_nbr=np.asarray(nbr[ovf_r, ovf_s], np.int32),
            )
    bandwidth = int(np.abs(nbr - cells).max()) if n else 0
    half_blocks = (bandwidth + B - 1) // B
    P = 2 * half_blocks + 1
    if P > MAX_P:
        return _NONE_LAYOUT
    n_tiles = (n + B - 1) // B
    tile = cells // B
    row = cells % B
    # column inside the tile's window: nbr - tile*B + half_blocks*B
    col = nbr - tile * B + half_blocks * B
    assert (col >= 0).all() and (col < P * B).all()
    # only slots with a real coefficient participate; pads point at the
    # zero slot of the [upper|lower|0] array, so scattering their (zero)
    # coefficient is harmless — keep all slots for a static scatter.
    return BandLayout(
        mode="band", n=n, K=K, n_tiles=n_tiles, P=P, half=half_blocks,
        tile=np.ascontiguousarray(
            np.broadcast_to(tile, nbr.shape).astype(np.int32)),
        row=np.ascontiguousarray(
            np.broadcast_to(row, nbr.shape).astype(np.int32)),
        col=np.asarray(col, np.int32),
    )


def band_info(mesh) -> BandLayout | None:
    """The banded/DIA layout for a mesh, or None if unsuitable.

    Precomputed layouts attached to the mesh pytree
    (linalg.precompute.attach_solver_layouts) are honoured first — that
    path works on traced meshes. Otherwise the layout is derived from
    the concrete mesh and cached (keyed on id() + a strong identity
    check: without the held ref, CPython reuses freed addresses and a
    NEW mesh could silently hit a stale entry)."""
    pre = getattr(mesh, "band", None)
    if pre is not None:
        return None if pre.mode == "none" else pre
    key = id(mesh.ell_coeff_idx)
    hit = _BAND_CACHE.get(key)
    if hit is not None and hit[0] is mesh.ell_coeff_idx:
        return hit[1]
    try:
        info = compute_band_layout(mesh)
    except jax.errors.TracerArrayConversionError:
        return None  # traced mesh with no precomputed layout: use gathers
    info = None if info.mode == "none" else info
    _BAND_CACHE[key] = (mesh.ell_coeff_idx, info)
    return info


def _make_dia_mv(info: BandLayout, ell_coeffs):
    """Pure-shift DIA product: y = sum_d c_d * shift(x, d) (+ overflow).
    Zero gathers/scatters in the dominant path; the polyhedral tail (if
    any) is one small gather + scatter-add over the overflow entries."""
    n, max_off = info.n, info.max_off
    diags = []
    for d, rows, slots in zip(info.offsets, info.rows, info.slots):
        # .add, not .set: merged-cell meshes can carry two faces between
        # the same cell pair, i.e. duplicate (row, offset) entries
        c_d = jnp.zeros(n, ell_coeffs.dtype).at[rows].add(
            ell_coeffs[rows, slots])
        diags.append((d, c_d))
    ovf_r = info.ovf_rows
    have_ovf = ovf_r is not None and ovf_r.size > 0
    if have_ovf:
        ovf_c = ell_coeffs[info.ovf_rows, info.ovf_slots]
        ovf_nbr = info.ovf_nbr

    def offdiag_mv(x):
        two_d = x.ndim == 2
        vec = x if two_d else x[:, None]
        m = vec.shape[1]
        zpad = jnp.zeros((max_off, m), x.dtype)
        xp = jnp.concatenate([zpad, vec, zpad])
        y = jnp.zeros_like(vec)
        for d, c_d in diags:
            y = y + c_d[:, None] * lax.dynamic_slice_in_dim(
                xp, max_off + d, n)
        if have_ovf:
            y = y.at[ovf_r].add(ovf_c[:, None] * vec[ovf_nbr])
        return y if two_d else y[:, 0]

    return offdiag_mv


def make_offdiag_mv(mesh, ell_coeffs):
    """Returns x -> sum_k coeff[c,k]*x[nbr[c,k]] using the DIA or banded
    MXU path, or None to signal the caller to use the gather fallback."""
    info = band_info(mesh)
    if info is None:
        return None
    if info.mode == "dia":
        return _make_dia_mv(info, ell_coeffs)
    n, n_tiles, P, half = info.n, info.n_tiles, info.P, info.half
    a_band = jnp.zeros((n_tiles, B, P * B), ell_coeffs.dtype)
    a_band = a_band.at[info.tile, info.row, info.col].add(ell_coeffs)
    pad_tail = n_tiles * B - n

    def offdiag_mv(x):
        two_d = x.ndim == 2
        vec = x if two_d else x[:, None]
        m = vec.shape[1]
        xp = jnp.concatenate([
            jnp.zeros((half * B, m), x.dtype), vec,
            jnp.zeros((pad_tail + half * B, m), x.dtype)])
        parts = [xp[s * B:s * B + n_tiles * B].reshape(n_tiles, B, m)
                 for s in range(P)]
        x_win = jnp.concatenate(parts, axis=1)           # (nT, P*B, m)
        y = jnp.einsum("tbw,twm->tbm", a_band, x_win,
                       preferred_element_type=x.dtype)
        y = y.reshape(-1, m)[:n]
        return y if two_d else y[:, 0]

    return offdiag_mv
