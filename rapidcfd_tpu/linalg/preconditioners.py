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


@register("lduPreconditioner", "diagonal")
def diagonal_precond(mesh, ell_coeffs, diag):
    rd = 1.0 / diag
    return lambda r: rd * r


@register("lduPreconditioner", "AINV", "DIC", "DILU", "FDIC")
def ainv_precond(mesh, ell_coeffs, diag):
    """Sparse approximate inverse: w = D^-1 r - D^-1 O D^-1 r (one gather
    pass; reference: AINVPreconditioner.C:49-110)."""
    rd = 1.0 / diag

    def apply(r):
        rdr = rd * r
        off = (ell_coeffs * jnp.take(rdr, mesh.cell_nbr, axis=0)).sum(1)
        return rdr - rd * off
    return apply
