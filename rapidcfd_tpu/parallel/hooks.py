"""Distribution hooks: halo exchange + global reductions.

The reference threads parallelism through every kernel as processor
boundary conditions + MPI reductions (SURVEY.md §3.5). Here the same two
touch points are function hooks, installed while tracing inside
shard_map:

- ``halo(x)`` refreshes ghost-cell entries of a cell-indexed array from
  the owning neighbour shard (ppermute over the mesh axis). Installed
  before any owner/neighbour/cell_nbr gather — the exact sites the
  reference calls initMatrixInterfaces/updateMatrixInterfaces.
- ``gsum`` (in linalg.solvers) becomes a masked psum.

Single-chip tracing leaves both as identities, so the same solver code
serves both paths.
"""

from __future__ import annotations

from contextlib import contextmanager

_HALO = None
_GAMG_BLOCK = None
_PSUM = None


def psum_all(x):
    """Raw (unmasked) cross-shard sum of an arbitrary-shape array —
    identity on a single chip. Used where the summand is NOT
    cell-indexed (e.g. the global GAMG coarsest matrix assembly), so the
    masked ``gsum`` cell reduction does not apply."""
    if _PSUM is None:
        return x
    return _PSUM(x)


def set_psum(fn):
    global _PSUM
    _PSUM = fn


def gamg_block():
    """Per-shard block-GAMG hierarchy installed by the parallel layer
    (``parallel.dist_gamg``), or None on the single-chip path. When set,
    ``linalg.gamg.make_vcycle`` runs local V-cycles on the owned block —
    a block-Jacobi/Schwarz preconditioner whose outer Krylov stays
    global through the halo/psum hooks (the TPU re-founding of the
    reference's processorGAMGInterface per-level comms,
    src/OpenFOAM/matrices/lduMatrix/solvers/GAMG/interfaces/)."""
    return _GAMG_BLOCK


def set_gamg_block(blk):
    global _GAMG_BLOCK
    _GAMG_BLOCK = blk


def halo(x):
    """Refresh ghost entries of a cell-indexed device array (identity on a
    single chip)."""
    if _HALO is None:
        return x
    return _HALO(x)


def set_halo(fn):
    global _HALO
    _HALO = fn


def clear_hooks():
    global _HALO, _GAMG_BLOCK, _PSUM
    _HALO = None
    _GAMG_BLOCK = None
    _PSUM = None
    from ..linalg import solvers
    solvers.set_gsum(solvers._gsum_default)
    solvers.set_gmax(solvers._gmax_default)


@contextmanager
def distributed(halo_fn, gsum_fn, gmax_fn=None, gamg_block=None,
                psum_fn=None):
    """Install halo/gsum/gmax (+ optional block-GAMG, raw-psum) hooks
    for the duration of a trace."""
    from ..linalg import solvers
    set_halo(halo_fn)
    solvers.set_gsum(gsum_fn)
    if gmax_fn is not None:
        solvers.set_gmax(gmax_fn)
    if gamg_block is not None:
        set_gamg_block(gamg_block)
    if psum_fn is not None:
        set_psum(psum_fn)
    try:
        yield
    finally:
        clear_hooks()
