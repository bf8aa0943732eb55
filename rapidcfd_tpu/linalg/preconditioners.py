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
def none_precond(mesh, m, diag):
    return lambda r: r


def _safe_recip(diag):
    """1/diag with zero-diagonal rows (decomposition padding) mapped to
    0 so padded rows never produce inf/NaN."""
    import jax.numpy as jnp_
    return jnp_.where(diag != 0.0, 1.0 / jnp_.where(diag == 0.0, 1.0, diag),
                      0.0)


@register("lduPreconditioner", "diagonal")
def diagonal_precond(mesh, m, diag):
    rd = _safe_recip(diag)
    return lambda r: rd * r


@register("lduPreconditioner", "AINV", "DIC", "DILU", "FDIC")
def ainv_precond(mesh, m, diag):
    """Sparse approximate inverse: w = D^-1 r - D^-1 O D^-1 r (one
    off-diagonal product; reference: AINVPreconditioner.C:49-110). Uses
    the matrix's best off-diagonal product (structured DIA planes /
    banded MXU / ELL gather)."""
    from ..parallel.hooks import halo
    rd = _safe_recip(diag)
    off_mv = m.offdiag_mv(mesh)

    def apply(r):
        rdr = rd * r
        return rdr - rd * off_mv(halo(rdr))
    return apply
