"""lduMatrix preconditioners.

The reference's hard-won lesson carries straight to TPU: sequential
triangular solves (DIC/DILU/GaussSeidel) don't data-parallelize, so it
aliases them to pointwise-parallel equivalents (reference:
DICPreconditioner.C:41-57 and DILUPreconditioner.C:48-56 construct AINV;
GaussSeidelSmoother.C:43-67 constructs Jacobi). We keep the same alias
table so fvSolution dicts written for the reference select the intended
implementations.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..utils.registry import register


@register("lduPreconditioner", "none")
def none_precond(mesh, ell_coeffs, diag):
    return lambda r: r


def _safe_recip(diag):
    """1/diag with zero-diagonal rows (decomposition padding) mapped to
    0 so padded rows never produce inf/NaN."""
    import jax.numpy as jnp_
    return jnp_.where(diag != 0.0, 1.0 / jnp_.where(diag == 0.0, 1.0, diag),
                      0.0)


@register("lduPreconditioner", "diagonal")
def diagonal_precond(mesh, ell_coeffs, diag):
    rd = _safe_recip(diag)
    return lambda r: rd * r


@register("lduPreconditioner", "AINV", "DIC", "DILU", "FDIC")
def ainv_precond(mesh, ell_coeffs, diag):
    """Sparse approximate inverse: w = D^-1 r - D^-1 O D^-1 r (one
    off-diagonal product; reference: AINVPreconditioner.C:49-110). Uses
    the banded MXU product when available."""
    from ..parallel.hooks import halo
    from .banded import make_offdiag_mv
    rd = _safe_recip(diag)
    off_mv = make_offdiag_mv(mesh, ell_coeffs)
    if off_mv is not None:
        def apply(r):
            rdr = rd * r
            return rdr - rd * off_mv(rdr)
        return apply

    def apply(r):
        rdr = rd * r
        c = ell_coeffs[..., None] if r.ndim == 2 else ell_coeffs
        off = (c * jnp.take(halo(rdr), mesh.cell_nbr, axis=0)).sum(1)
        return rdr - rd * off
    return apply
