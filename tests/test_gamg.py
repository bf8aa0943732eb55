"""GAMG multigrid tests vs dense reference."""

import dataclasses
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rapidcfd_tpu.linalg.gamg import (_coarsen_matrix, build_hierarchy)
from rapidcfd_tpu.linalg.solvers import SolverControls, solve_component
from rapidcfd_tpu.ops import fvm
from rapidcfd_tpu.solvers.case import Case
from rapidcfd_tpu.utils import logging as L
from rapidcfd_tpu.utils.casegen import cavity_case


@pytest.fixture(scope="module")
def poisson32():
    L.Info.enabled = False
    d = tempfile.mkdtemp()
    cavity_case(d, n=32)
    case = Case(d)
    ma = case.mesh
    p = case.read_field("p")
    rng = np.random.default_rng(0)
    rhs = rng.normal(size=ma.n_cells)
    rhs -= rhs.mean()
    m = fvm.laplacian(ma, 1.0, p)
    m = m.replace(source=jnp.asarray(rhs) * ma.V).set_reference(0, 0.0)
    L.Info.enabled = True
    return ma, m


def _dense_solution(ma, m):
    diag, src = m.component_system(ma, None)
    A = np.zeros((ma.n_cells, ma.n_cells))
    A[np.arange(ma.n_cells), np.arange(ma.n_cells)] = np.asarray(diag)
    own = np.asarray(ma.owner[:ma.n_internal])
    nei = np.asarray(ma.neighbour)
    np.add.at(A, (own, nei), np.asarray(m.upper))
    np.add.at(A, (nei, own), np.asarray(m.lower))
    return np.linalg.solve(A, np.asarray(src)), A


def test_hierarchy_shapes(poisson32):
    ma, m = poisson32
    levels = build_hierarchy(ma, n_coarsest=16)
    sizes = [lv.n_coarse for lv in levels]
    assert sizes[0] < ma.n_cells
    assert all(a > b for a, b in zip(sizes, sizes[1:]))
    assert sizes[-1] <= 16 * 2  # pair agglomeration halves per level


def test_galerkin_coarse_matrix(poisson32):
    ma, m = poisson32
    levels = build_hierarchy(ma, n_coarsest=16)
    lv = levels[0]
    diag, _ = m.component_system(ma, None)
    cd, cl, cu = _coarsen_matrix(lv, diag, m.lower, m.upper, None)
    _, A = _dense_solution(ma, m)
    nc, ncc = ma.n_cells, lv.n_coarse
    R = np.zeros((ncc, nc))
    R[np.asarray(lv.restrict_addr), np.arange(nc)] = 1.0
    Ac_ref = R @ A @ R.T
    Ac = np.zeros((ncc, ncc))
    Ac[np.arange(ncc), np.arange(ncc)] = np.asarray(cd)
    co, cn = np.asarray(lv.coarse_owner), np.asarray(lv.coarse_neighbour)
    np.add.at(Ac, (co, cn), np.asarray(cu))
    np.add.at(Ac, (cn, co), np.asarray(cl))
    assert np.abs(Ac - Ac_ref).max() < 1e-12


def test_gamg_solves_poisson(poisson32):
    ma, m = poisson32
    ctl = SolverControls(solver="GAMG", smoother="Chebyshev",
                         tolerance=1e-9)
    x, perf = jax.jit(
        lambda mm: solve_component(ma, mm, None, ctl))(m)
    xd, _ = _dense_solution(ma, m)
    assert np.abs(np.asarray(x) - xd).max() < 1e-8
    assert int(perf[2]) < 40  # V-cycles, not Krylov-iteration counts
    assert float(perf[1]) <= 1e-9
