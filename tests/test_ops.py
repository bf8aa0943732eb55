"""Operator tests: fields+BCs, fvc explicit ops, fvm assembly vs dense.

Strategy per SURVEY.md §4 implication (a): unit-test every operator
against exact solutions (FV is exact for linear fields on these meshes)
and dense linear-algebra references.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from rapidcfd_tpu.mesh import build_mesh_arrays, read_polymesh
from rapidcfd_tpu.ops import fvc, fvm
from rapidcfd_tpu.fields import read_vol_field, write_vol_field
from rapidcfd_tpu.fields.field import Dimensioned, VolField
from rapidcfd_tpu.fields.bcs import FixedValue, ZeroGradient, Empty, make_bc
from rapidcfd_tpu.utils.casegen import cavity_case
from rapidcfd_tpu.utils.dimensions import DimensionSet, dimless


@pytest.fixture(scope="module")
def cav(tmp_path_factory):
    d = tmp_path_factory.mktemp("cavity")
    cavity_case(str(d))
    mesh_raw = read_polymesh(str(d))
    ma, pmesh, maps = build_mesh_arrays(mesh_raw)
    return str(d), ma, maps


def _linear_scalar_field(ma, coeffs=(1.0, 2.0, 0.0), const=0.5,
                         bc_type="fixedValue"):
    """psi = a.x + c with matching BCs on non-empty patches."""
    a = jnp.asarray(coeffs, ma.C.dtype)
    data = ma.C @ a + const
    bcs, bcdata = [], []
    bvalues = jnp.zeros(ma.n_boundary, ma.C.dtype)
    for i, p in enumerate(ma.patches):
        if p.is_empty:
            bcs.append(make_bc("empty", i))
            bcdata.append({})
            continue
        if bc_type == "fixedValue":
            vals = ma.patch_cf(p) @ a + const
            bcs.append(make_bc("fixedValue", i))
            bcdata.append({"value": vals})
        else:
            bcs.append(make_bc("zeroGradient", i))
            bcdata.append({})
    f = VolField(data, bvalues, tuple(bcs), dimless, "psi", tuple(bcdata))
    return f.correct_boundary_conditions(ma)


def test_field_io_roundtrip(cav):
    case, ma, maps = cav
    U = read_vol_field(case, "0", "U", ma, maps)
    p = read_vol_field(case, "0", "p", ma, maps)
    assert U.data.shape == (400, 3)
    assert p.data.shape == (400,)
    assert str(U.dims) == "[0 1 -1 0 0 0 0]"
    # movingWall fixedValue (1 0 0) materialized in bvalues
    mw = ma.patches[0]
    assert np.allclose(np.asarray(U.bvalues[mw.bstart:mw.bstart + mw.size]),
                       [1.0, 0.0, 0.0])
    # write & re-read
    U2w = U * 2.0
    U2w = U2w.replace(name="U")
    write_vol_field(U2w, case, "0.999", ma, maps)
    U2 = read_vol_field(case, "0.999", "U", ma, maps)
    assert np.allclose(np.asarray(U2.data), 2 * np.asarray(U.data))


def test_dimension_check_raises(cav):
    case, ma, maps = cav
    U = read_vol_field(case, "0", "U", ma, maps)
    p = read_vol_field(case, "0", "p", ma, maps)
    from rapidcfd_tpu.utils.dimensions import DimensionError
    with pytest.raises(DimensionError):
        _ = p + fvc.grad(ma, p)  # p [m2/s2] + grad(p) [m/s2]


def test_grad_linear_exact(cav):
    """Gauss gradient of a linear field is exact on any mesh."""
    case, ma, maps = cav
    f = _linear_scalar_field(ma, (1.0, 2.0, 0.0), 0.5)
    g = fvc.grad(ma, f)
    assert np.allclose(np.asarray(g.data), [1.0, 2.0, 0.0], atol=1e-11)
    # boundary values corrected to the exact gradient too
    assert np.allclose(np.asarray(g.bvalues[:80]), [1.0, 2.0, 0.0],
                       atol=1e-10)


def test_div_of_constant_flux_zero(cav):
    case, ma, maps = cav
    U = read_vol_field(case, "0", "U", ma, maps)
    Uc = U.replace(data=jnp.ones_like(U.data) * jnp.asarray([1.0, 0.5, 0.0]))
    Uc = Uc.with_calculated_bcs(
        Uc.data, jnp.ones_like(U.bvalues) * jnp.asarray([1.0, 0.5, 0.0]),
        U.dims)
    phi = fvc.flux(ma, Uc)
    divphi = fvc.div(ma, phi)
    assert np.abs(np.asarray(divphi.data)).max() < 1e-9


def test_sn_grad_and_laplacian_linear(cav):
    case, ma, maps = cav
    f = _linear_scalar_field(ma, (3.0, -1.0, 0.0), 0.1)
    lap = fvc.laplacian(ma, 1.0, f)
    assert np.abs(np.asarray(lap.data)).max() < 1e-8


def _dense(m, ma, cmpt=None):
    n = ma.n_cells
    diag, src = m.component_system(ma, cmpt)
    A = np.zeros((n, n))
    A[np.arange(n), np.arange(n)] = np.asarray(diag)
    own = np.asarray(ma.owner[:ma.n_internal])
    nei = np.asarray(ma.neighbour)
    np.add.at(A, (own, nei), np.asarray(m.upper))
    np.add.at(A, (nei, own), np.asarray(m.lower))
    return A, np.asarray(src)


def test_fvm_laplacian_dirichlet_exact(cav):
    """Solve laplacian(psi)=0 with psi=x on boundary -> psi=x exactly."""
    case, ma, maps = cav
    f = _linear_scalar_field(ma, (1.0, 0.0, 0.0), 0.0)
    m = fvm.laplacian(ma, 1.0, f)
    A, b = _dense(m, ma)
    sol = np.linalg.solve(A, b)
    assert np.allclose(sol, np.asarray(ma.C[:, 0]), atol=1e-12)


def test_fvm_laplacian_symmetric(cav):
    case, ma, maps = cav
    f = _linear_scalar_field(ma, (1.0, 0.0, 0.0), 0.0)
    m = fvm.laplacian(ma, 1.0, f)
    A, _ = _dense(m, ma)
    assert np.allclose(A, A.T)
    # weak diagonal dominance with negative diagonal
    assert (np.diag(A) < 0).all()


def test_fvm_div_conservation(cav):
    """E(const) = 0 for a conservative flux and zeroGradient BCs."""
    case, ma, maps = cav
    U = read_vol_field(case, "0", "U", ma, maps)
    # uniform U -> conservative flux
    Uc = U.with_calculated_bcs(
        jnp.ones_like(U.data) * jnp.asarray([0.3, -0.2, 0.0]),
        jnp.ones_like(U.bvalues) * jnp.asarray([0.3, -0.2, 0.0]), U.dims)
    phi = fvc.flux(ma, Uc)
    f = _linear_scalar_field(ma, (0, 0, 0), 1.0, bc_type="zeroGradient")
    m = fvm.div(ma, phi, f, scheme="upwind")
    A, b = _dense(m, ma)
    ones = np.ones(ma.n_cells)
    assert np.abs(A @ ones - b).max() < 1e-12


def test_fvm_ddt_euler(cav):
    case, ma, maps = cav
    p = read_vol_field(case, "0", "p", ma, maps)
    p = p.replace(data=p.data + 3.0, bvalues=p.bvalues + 3.0).store_old()
    m = fvm.ddt(ma, p, 0.1)
    A, b = _dense(m, ma)
    sol = np.linalg.solve(A, b)
    assert np.allclose(sol, 3.0, atol=1e-13)  # stationary field stays


def test_fvm_upwind_advection_inlet_outlet(cav):
    """Steady advection with inletOutlet BCs (fixed inflow value 1,
    zeroGradient outflow): upwind transports the inlet value everywhere
    along the flow, so the dense solution is exactly 1."""
    case, ma, maps = cav
    U = read_vol_field(case, "0", "U", ma, maps)
    Uc = U.with_calculated_bcs(
        jnp.ones_like(U.data) * jnp.asarray([1.0, 0.0, 0.0]),
        jnp.ones_like(U.bvalues) * jnp.asarray([1.0, 0.0, 0.0]), U.dims)
    phi = fvc.flux(ma, Uc)
    bcs, bcd = [], []
    for i, p in enumerate(ma.patches):
        if p.is_empty:
            bcs.append(make_bc("empty", i))
            bcd.append({})
        else:
            bcs.append(make_bc("inletOutlet", i))
            bcd.append({"inletValue": jnp.ones(p.size)})
    f = VolField(jnp.full(ma.n_cells, 0.5), jnp.zeros(ma.n_boundary),
                 tuple(bcs), dimless, "s", tuple(bcd))
    f = f.correct_boundary_conditions(ma, env={"phi": phi})
    m = fvm.div(ma, phi, f, scheme="upwind")
    # tiny Sp regularizes cells with zero through-flux (corner cells)
    eps = fvm.Sp(ma, 1e-12, f).replace(dims=m.dims)
    A, b = _dense(m + eps, ma)
    sol = np.linalg.solve(A, b)
    assert np.allclose(sol, 1.0, atol=1e-6)


def test_relax_and_set_reference(cav):
    case, ma, maps = cav
    f = _linear_scalar_field(ma, (1.0, 0.0, 0.0), 0.0)
    m = fvm.laplacian(ma, 1.0, f)
    mr = m.relax(ma, 0.7)
    # relaxed system still has the same solution at convergence
    A, b = _dense(mr, ma)
    sol = np.linalg.solve(A, b)
    assert np.allclose(sol, np.asarray(ma.C[:, 0]), atol=1e-11)

    # pure Neumann problem: pin reference cell
    fz = _linear_scalar_field(ma, (0, 0, 0), 0.0, bc_type="zeroGradient")
    mz = fvm.laplacian(ma, 1.0, fz).set_reference(0, 0.0)
    A, b = _dense(mz, ma)
    sol = np.linalg.solve(A, b)
    assert np.abs(sol).max() < 1e-9


def test_least_squares_grad_exact_linear(cav):
    """leastSquares gradient is exact for a linear field (second-order on
    arbitrary meshes; reference: leastSquaresGrad)."""
    import jax.numpy as jnp
    from rapidcfd_tpu.fields.bcs import Calculated
    from rapidcfd_tpu.fields.field import VolField
    from rapidcfd_tpu.ops import fvc
    from rapidcfd_tpu.utils.dimensions import dimless
    _, mesh, _ = cav
    a = jnp.asarray([1.5, -2.0, 0.0])
    lin = (mesh.C * a).sum(-1)
    lin_b = (mesh.Cf[mesh.n_internal:] * a).sum(-1)
    f = VolField(lin, lin_b,
                 tuple(Calculated(i) for i in range(len(mesh.patches))),
                 dimless, "lin", tuple({} for _ in mesh.patches))
    g = fvc.grad(mesh, f, "leastSquares")
    import numpy as np
    err = np.abs(np.asarray(g.data) - np.asarray(a)).max()
    assert err < 1e-8
