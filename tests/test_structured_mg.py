"""Structured geometric multigrid (linalg/structured_mg.py).

Validates the gather-free fast path: grid detection from DIA offsets,
Galerkin 2x2 coarsening against the explicit P^T A P product, and
V(1,1)-preconditioned PCG convergence in O(10) iterations.
"""

import os

import numpy as np
import pytest

os.environ["RCFD_NATURAL_ORDERING"] = "1"

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from rapidcfd_tpu.fields.field import Dimensioned  # noqa: E402
from rapidcfd_tpu.linalg import solvers as S  # noqa: E402
from rapidcfd_tpu.linalg.structured_mg import (  # noqa: E402
    GridLevel, coarsen, structured_info)
from rapidcfd_tpu.ops import fvm  # noqa: E402
from rapidcfd_tpu.solvers.case import Case  # noqa: E402
from rapidcfd_tpu.utils.casegen import box_mesh, cavity_case, \
    write_polymesh  # noqa: E402
from rapidcfd_tpu.utils.dimensions import dimless  # noqa: E402


@pytest.fixture(scope="module")
def cavity64(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("smg"))
    cavity_case(d, n=64, delta_t=1.0, end_time=1e9)
    return Case(d)


def test_structured_detection_2d(cavity64):
    assert structured_info(cavity64.mesh) == (1, 64, 64)


def test_structured_detection_3d(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("smg3"))
    mesh = box_mesh(16, 12, 8, size=(1.0, 1.0, 1.0))
    write_polymesh(mesh, d)
    os.makedirs(os.path.join(d, "system"), exist_ok=True)
    from rapidcfd_tpu.mesh.polymesh import read_polymesh
    from rapidcfd_tpu.mesh.mesharrays import build_mesh_arrays
    pm = read_polymesh(d)
    ma, _, _ = build_mesh_arrays(pm)
    # natural ordering x-fastest: offsets 1, 16, 192
    assert structured_info(ma) == (8, 12, 16)


def _dense_of_level(lv: GridLevel):
    """Explicit dense matrix of a GridLevel (test oracle)."""
    nz, ny, nx = lv.shape
    n = nz * ny * nx
    A = np.zeros((n, n))
    d = np.asarray(lv.diag).reshape(nz, ny, nx)
    idx = np.arange(n).reshape(nz, ny, nx)
    A[idx.ravel(), idx.ravel()] = d.ravel()
    for ax, key in ((2, 1), (1, nx), (0, nx * ny)):
        pp = lv.planes.get(key)
        pm_ = lv.planes.get(-key)
        if pp is not None:
            p = np.asarray(pp)
            sl_f = [slice(None)] * 3
            sl_t = [slice(None)] * 3
            sl_f[ax] = slice(0, lv.shape[ax] - 1)
            sl_t[ax] = slice(1, None)
            A[idx[tuple(sl_f)].ravel(), idx[tuple(sl_t)].ravel()] += \
                p[tuple(sl_f)].ravel()
        if pm_ is not None:
            p = np.asarray(pm_)
            sl_f = [slice(None)] * 3
            sl_t = [slice(None)] * 3
            sl_f[ax] = slice(1, None)
            sl_t[ax] = slice(0, lv.shape[ax] - 1)
            A[idx[tuple(sl_f)].ravel(), idx[tuple(sl_t)].ravel()] += \
                p[tuple(sl_f)].ravel()
    return A


def test_galerkin_coarsening_matches_ptap():
    """coarsen() == P^T A P for piecewise-constant 2x2 aggregation."""
    rng = np.random.default_rng(7)
    ny, nx = 6, 8
    east = rng.standard_normal((1, ny, nx))
    east[:, :, -1] = 0.0
    west = rng.standard_normal((1, ny, nx))
    west[:, :, 0] = 0.0
    north = rng.standard_normal((1, ny, nx))
    north[:, -1, :] = 0.0
    south = rng.standard_normal((1, ny, nx))
    south[:, 0, :] = 0.0
    diag = rng.standard_normal((1, ny, nx)) + 8.0
    lv = GridLevel((1, ny, nx), jnp.asarray(diag),
                   {1: jnp.asarray(east), -1: jnp.asarray(west),
                    nx: jnp.asarray(north), -nx: jnp.asarray(south)})
    lvc = coarsen(lv)
    # oracle: P (n, nc) piecewise-constant over 2x2 blocks
    n = ny * nx
    nc = (ny // 2) * (nx // 2)
    P = np.zeros((n, nc))
    for j in range(ny):
        for i in range(nx):
            P[j * nx + i, (j // 2) * (nx // 2) + i // 2] = 1.0
    A = _dense_of_level(lv)
    Ac_ref = P.T @ A @ P
    Ac = _dense_of_level(lvc)
    np.testing.assert_allclose(Ac, Ac_ref, atol=1e-12)


def test_amul_matches_dense():
    rng = np.random.default_rng(3)
    nz, ny, nx = 4, 6, 8
    shape = (nz, ny, nx)
    planes = {}
    for ax, key in ((2, 1), (1, nx), (0, nx * ny)):
        for sgn in (1, -1):
            p = rng.standard_normal(shape)
            sl = [slice(None)] * 3
            sl[ax] = -1 if sgn > 0 else 0
            p[tuple(sl)] = 0.0
            planes[sgn * key] = jnp.asarray(p)
    diag = jnp.asarray(rng.standard_normal(shape) + 10.0)
    lv = GridLevel(shape, diag, planes)
    x = rng.standard_normal(nz * ny * nx)
    y = np.asarray(lv.amul(jnp.asarray(x.reshape(shape)))).ravel()
    y_ref = _dense_of_level(lv) @ x
    np.testing.assert_allclose(y, y_ref, atol=1e-11)


def test_structured_pcg_fast_convergence(cavity64):
    """GAMG-preconditioned PCG on the cavity Poisson matrix: O(10)
    iterations, true residual at tolerance."""
    import dataclasses
    case = cavity64
    mesh = case.mesh
    p = case.read_field("p")
    gamma = Dimensioned("g", dimless, 1.0)
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal(mesh.n_cells), p.data.dtype)
    c = dataclasses.replace(case.solver_controls("p", final=True),
                            preconditioner="GAMG")

    @jax.jit
    def f(b):
        m = fvm.laplacian(mesh, gamma, p)
        m = m.set_reference(0, 0.0)
        m = m.replace(source=(b - b.mean()) * mesh.V)
        x, perf = S.solve_component(mesh, m, None, c)
        diag, src = m.component_system(mesh, None)
        am = S._amul_fn(mesh, m, diag)
        return x, perf, jnp.abs(src - am(x)).max()

    x, perf, rmax = f(b)
    assert int(perf[2]) <= 12
    assert float(rmax) < 1e-9


def test_structured_vs_aggregation_same_answer(cavity64):
    """The structured path and the aggregation fallback agree."""
    import dataclasses
    case = cavity64
    mesh = case.mesh
    p = case.read_field("p")
    gamma = Dimensioned("g", dimless, 1.0)
    rng = np.random.default_rng(1)
    b = jnp.asarray(rng.standard_normal(mesh.n_cells), p.data.dtype)
    c = dataclasses.replace(case.solver_controls("p", final=True),
                            preconditioner="GAMG", tolerance=1e-10)

    def solve_with(flag):
        os.environ["RCFD_STRUCTURED_MG"] = flag

        @jax.jit
        def f(b):
            m = fvm.laplacian(mesh, gamma, p)
            m = m.set_reference(0, 0.0)
            m = m.replace(source=(b - b.mean()) * mesh.V)
            return S.solve_component(mesh, m, None, c)
        try:
            return f(b)
        finally:
            os.environ.pop("RCFD_STRUCTURED_MG", None)

    x1, _ = solve_with("1")
    x0, _ = solve_with("0")
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x0),
                               atol=1e-7)


def test_batched_vector_gamg_precond(tmp_path_factory):
    """Column-batched (vector) GAMG-preconditioned BiCGStab through the
    structured path matches the DILU answer (regression: rank was
    derived from the un-batched ell array)."""
    import dataclasses
    import tempfile
    from rapidcfd_tpu.solvers import icofoam as ico
    d = str(tmp_path_factory.mktemp("smgv"))
    cavity_case(d, n=32, delta_t=0.005 * 20 / 32, end_time=1e9,
                u_solver="PBiCGStab")
    case = Case(d)
    from rapidcfd_tpu.utils.dimensions import DimensionSet
    nu = Dimensioned("nu", DimensionSet.of(0, 2, -1), 0.01)

    def final(upre):
        kw = dict(div_scheme=case.div_scheme("div(phi,U)"),
                  lap_corr=case.laplacian_scheme(),
                  u_controls=dataclasses.replace(
                      case.solver_controls("U"), preconditioner=upre,
                      tolerance=1e-10),
                  p_controls=case.solver_controls("p"),
                  p_final_controls=case.solver_controls("p", final=True),
                  n_correctors=2, n_non_orth=0, p_ref_cell=0,
                  p_ref_value=0.0)
        step = jax.jit(lambda U, p, phi, dt: ico.piso_step(
            case.mesh, U, p, phi, dt, nu, **kw))
        U = case.read_field("U")
        p = case.read_field("p")
        from rapidcfd_tpu.ops import fvc
        phi = jax.jit(lambda u: fvc.flux(case.mesh, u))(U)
        dt = 0.005 * 20 / 32
        for _ in range(4):
            U, p, phi, stats = step(U, p, phi, dt)
        return np.asarray(U.data)

    u1 = final("GAMG")
    u2 = final("DILU")
    np.testing.assert_allclose(u1, u2, atol=1e-8)
