"""twoPhaseEulerFoam: bubble column rise against SchillerNaumann drag
(reference: applications/solvers/multiphase/twoPhaseEulerFoam)."""

import numpy as np

from rapidcfd_tpu.utils import logging as L
from rapidcfd_tpu.utils.casegen import bubble_column_case


def test_drag_laws():
    import jax.numpy as jnp
    from rapidcfd_tpu.models.eulerian import drag_k
    a = jnp.asarray([0.1])
    rho_c = jnp.asarray([1000.0])
    mu_c = jnp.asarray([1e-3])
    ur = jnp.asarray([0.2])
    d = 1e-3
    # Stokes limit: Re small -> K = 18 mu alpha / d^2
    k = drag_k("SchillerNaumann", None, a, rho_c, mu_c, d,
               jnp.asarray([1e-6]))
    assert abs(float(k[0]) - 18.0 * 1e-3 * 0.1 / d ** 2) \
        / float(k[0]) < 0.01
    # Newton limit: Re > 1000 -> Cd = 0.44
    k = drag_k("SchillerNaumann", None, a, rho_c, mu_c, 0.01,
               jnp.asarray([1.0]))
    assert abs(float(k[0]) - 0.75 * 0.44 * 0.1 * 1000.0 * 1.0 / 0.01) \
        / float(k[0]) < 1e-6
    # Gidaspow blends Ergun (dense) and WenYu (dilute)
    k_dense = drag_k("GidaspowErgunWenYu", None, jnp.asarray([0.5]),
                     rho_c, mu_c, d, ur)
    k_dilute = drag_k("GidaspowErgunWenYu", None, jnp.asarray([0.05]),
                      rho_c, mu_c, d, ur)
    assert float(k_dense[0]) > float(k_dilute[0])


def test_bubble_column_terminal_velocity(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("bcol"))
    bubble_column_case(d, end_time=0.08, delta_t=1e-3)
    L.Info.enabled = False
    from rapidcfd_tpu.solvers import twophaseeulerfoam
    case, alpha, U1, U2, p, phi1, phi2 = twophaseeulerfoam.run(
        d, write=False)
    L.Info.enabled = True

    a = np.asarray(alpha.data)
    pp = np.asarray(p.data)
    V = np.asarray(case.mesh.V)
    C = np.asarray(case.mesh.C)
    assert np.isfinite(a).all() and np.isfinite(pp).all()
    assert a.min() > -1e-6 and a.max() < 0.62 + 1e-6
    # gas volume conserved (closed box, MULES)
    assert abs(float((a * V).sum()) - 0.1 * 0.5 * V.sum()) \
        < 0.02 * 0.1 * 0.5 * V.sum()
    # slip approaches the SchillerNaumann terminal velocity of a 3 mm
    # bubble (~0.29 m/s): Re~870, Cd~0.46
    ur_y = np.asarray(U1.data - U2.data)[:, 1]
    gas = a > 0.05
    assert 0.2 < ur_y[gas].max() < 0.4
    # gas centre of mass has risen from y=0.25
    com = (a * V * C[:, 1]).sum() / (a * V).sum()
    assert com > 0.26
    # hydrostatic pressure stratification ~ rho_mix g H
    dp = pp.max() - pp.min()
    assert 8000.0 < dp < 11000.0
