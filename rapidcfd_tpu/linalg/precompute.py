"""attach_solver_layouts — derive trace-free solver layouts ONCE.

Jitted solver steps pass the mesh as a traced jit argument (so O(mesh)
geometry crosses the boundary as inputs instead of HLO constants — the
remote-compile path rejects >100MB program bodies at ~1M cells). But two
fast paths can only be DERIVED from concrete arrays:

- the banded/DIA MXU SpMV layout (linalg/banded.py), and
- the GAMG agglomeration hierarchy (linalg/gamg.py — the reference
  likewise builds agglomeration once per mesh on the host and caches it,
  GAMGAgglomeration.H:61).

This module derives both at make_step time, while the mesh is concrete,
and attaches them to the MeshArrays pytree. Their arrays are pytree
leaves, so inside jit they are ordinary traced inputs; the shape/offset
metadata that Python control flow needs is static. This is the same
pattern the distributed path always used (parallel/dryrun.py pre-builds
block hierarchies with dist_gamg.build_block_hierarchies) applied to the
single-chip path.
"""

from __future__ import annotations

import dataclasses


def _wants_gamg(c) -> bool:
    return c is not None and (getattr(c, "solver", "") == "GAMG"
                              or getattr(c, "preconditioner", "") == "GAMG")


def _case_gamg_controls(case):
    """Scan every fvSolution.solvers entry for GAMG usage."""
    from .solvers import SolverControls
    try:
        solvers = case.fv_solution.subdict("solvers", required=False)
    except Exception:
        return []
    out = []
    for key, val in (solvers or {}).items():
        if isinstance(val, dict):
            try:
                out.append(SolverControls.from_dict(val))
            except Exception:
                pass
    return [c for c in out if _wants_gamg(c)]


def attach_solver_layouts(mesh, controls=(), case=None):
    """Return mesh with .band / .gamg populated (idempotent).

    controls: SolverControls that will run on this mesh (any of them
    selecting GAMG as solver or preconditioner triggers the hierarchy
    build with its nCellsInCoarsestLevel/mergeLevels). case: optionally
    scan the whole fvSolution.solvers dict instead (catches GAMG on
    turbulence fields the caller didn't enumerate).
    """
    from .banded import compute_band_layout

    band = mesh.band
    if band is None:
        if getattr(mesh, "gdia", None) is not None:
            # gdia lattices have their own shift SpMV (mesh/gdia.py);
            # record "derived, unsuitable" so nothing re-derives
            from .banded import BandLayout
            band = BandLayout()
        else:
            band = compute_band_layout(mesh)

    gamg_levels = mesh.gamg
    if gamg_levels is None:
        cand = [c for c in controls if _wants_gamg(c)]
        if case is not None and not cand:
            cand = _case_gamg_controls(case)
        # structured natural-ordering boxes take the gather-free
        # geometric MG (linalg/structured_mg.py) — the aggregation
        # hierarchy would be dead weight on them
        from ..utils import switches
        structured_covers = ((mesh.structured is not None
                              or getattr(mesh, "gdia", None) is not None)
                             and switches.enabled("STRUCTURED_MG"))
        if cand and not structured_covers:
            from .gamg import build_hierarchy, gamg_shape
            n_coarsest, merge_levels = gamg_shape(cand[0])
            gamg_levels = tuple(build_hierarchy(
                mesh, n_coarsest=n_coarsest,
                merge_levels=merge_levels))

    if band is mesh.band and gamg_levels is mesh.gamg:
        return mesh
    return dataclasses.replace(mesh, band=band, gamg=gamg_levels)
