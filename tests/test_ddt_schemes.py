"""ddt scheme accuracy: true CrankNicolson (stateful ddt0) vs backward.

VERDICT round-1 item 6: CN must carry the reference's ddt0 state
(CrankNicolsonDdtScheme.C), not alias to backward. The decay ODE
dpsi/dt = -lam*psi isolates the time scheme: per-step amplification for
CN is (1 - lam*dt/2)/(1 + lam*dt/2), backward and CN are both 2nd order
but with DIFFERENT error constants, Euler is 1st order.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from rapidcfd_tpu.ops import fvm
from rapidcfd_tpu.fields.field import Dimensioned
from rapidcfd_tpu.utils.dimensions import dimless, DimensionSet
from rapidcfd_tpu.utils.casegen import cavity_case
from rapidcfd_tpu.solvers.case import Case

LAM = 3.0
T_END = 1.0


@pytest.fixture(scope="module")
def small_case(tmp_path_factory):
    d = tmp_path_factory.mktemp("ddt") / "cavity"
    cavity_case(str(d), n=4)
    return Case(str(d))


def _integrate(case, scheme, n_steps, oc=1.0):
    """psi' = -LAM*psi from psi=1 via fvm.ddt + Sp, diagonal solve."""
    mesh = case.mesh
    psi = case.read_field("p").with_calculated_bcs(
        jnp.ones(mesh.n_cells), jnp.ones(mesh.n_boundary), dimless, "psi")
    dt = T_END / n_steps
    lam = Dimensioned("lam", DimensionSet.of(0, 0, -1), LAM)
    for _ in range(n_steps):
        psi = psi.store_old(levels=2)
        if scheme == "CrankNicolson":
            psi = fvm.cn_advance(mesh, psi, dt, dt, oc)
            spec = ("CrankNicolson", oc)
        else:
            spec = scheme
        eqn = fvm.ddt(mesh, psi, dt, spec) + fvm.Sp(mesh, lam, psi)
        diag, src = eqn.component_system(mesh, None)
        psi = psi.replace(data=src / diag)
    return float(psi.data[0])


def _order(case, scheme):
    errs = []
    steps = [16, 32, 64]
    exact = np.exp(-LAM * T_END)
    for n in steps:
        errs.append(abs(_integrate(case, scheme, n) - exact))
    slopes = [np.log2(errs[i] / errs[i + 1]) for i in range(len(errs) - 1)]
    return errs, slopes


def test_euler_first_order(small_case):
    errs, slopes = _order(small_case, "Euler")
    assert 0.8 < slopes[-1] < 1.2


def test_backward_second_order(small_case):
    errs, slopes = _order(small_case, "backward")
    assert 1.7 < slopes[-1] < 2.3


def test_cranknicolson_second_order_and_exact_amplification(small_case):
    errs, slopes = _order(small_case, "CrankNicolson")
    assert 1.7 < slopes[-1] < 2.3
    # CN is exactly the trapezium amplification after startup
    case = small_case
    n = 32
    dt = T_END / n
    g = (1.0 - LAM * dt / 2.0) / (1.0 + LAM * dt / 2.0)
    # first step is Euler (startup), remaining are true CN
    expect = 1.0 / (1.0 + LAM * dt) * g ** (n - 1)
    got = _integrate(case, "CrankNicolson", n)
    assert abs(got - expect) < 5e-6 * abs(expect)


def test_cn_differs_from_backward(small_case):
    cn = _integrate(small_case, "CrankNicolson", 32)
    bw = _integrate(small_case, "backward", 32)
    assert abs(cn - bw) > 1e-5  # genuinely different schemes


def test_cn_off_centred(small_case):
    """ocCoeff=0.5 blends toward Euler: error between Euler and CN."""
    exact = np.exp(-LAM * T_END)
    e_cn = abs(_integrate(small_case, "CrankNicolson", 32) - exact)
    e_oc = abs(_integrate(small_case, "CrankNicolson", 32, oc=0.5) - exact)
    e_eu = abs(_integrate(small_case, "Euler", 32) - exact)
    assert e_cn < e_oc < e_eu


def test_backward_coefficient_form(small_case):
    """ddt(rho, psi) with backward: constant rho must reduce to the
    plain backward scheme (reference backwardDdtScheme::fvmDdt(rho,vf))."""
    case = small_case
    mesh = case.mesh
    rho = case.read_field("p").with_calculated_bcs(
        2.0 * jnp.ones(mesh.n_cells), 2.0 * jnp.ones(mesh.n_boundary),
        dimless, "rho").store_old(levels=2).store_old(levels=2)
    psi = case.read_field("p").with_calculated_bcs(
        jnp.ones(mesh.n_cells), jnp.ones(mesh.n_boundary), dimless, "psi")
    dt = 0.01
    lam = Dimensioned("lam", DimensionSet.of(0, 0, -1), 2.0 * LAM)
    for _ in range(4):
        psi = psi.store_old(levels=2)
        eqn = fvm.ddt(mesh, psi, dt, "backward", coeff=rho) \
            + fvm.Sp(mesh, lam, psi)
        diag, src = eqn.component_system(mesh, None)
        psi = psi.replace(data=src / diag)
    # rho=2, lam=2*LAM: same decay as rho=1, lam=LAM
    ref = case.read_field("p").with_calculated_bcs(
        jnp.ones(mesh.n_cells), jnp.ones(mesh.n_boundary), dimless, "psi")
    lam1 = Dimensioned("lam", DimensionSet.of(0, 0, -1), LAM)
    for _ in range(4):
        ref = ref.store_old(levels=2)
        eqn = fvm.ddt(mesh, ref, dt, "backward") + fvm.Sp(mesh, lam1, ref)
        diag, src = eqn.component_system(mesh, None)
        ref = ref.replace(data=src / diag)
    np.testing.assert_allclose(np.asarray(psi.data), np.asarray(ref.data),
                               rtol=1e-12)
