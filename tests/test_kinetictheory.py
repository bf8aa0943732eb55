"""Kinetic theory of granular flow (reference: twoPhaseEulerFoam
phaseCompressibleTurbulenceModels/kineticTheoryModels).

Unit layer: submodel formulas against hand-evaluated reference
expressions. Case layer: a fluidized bed runs with kineticTheory
selected from constant/turbulenceProperties.particles, stays bounded
below alphaMax (phase pressure), conserves particle inventory, and
produces a positive granular temperature.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from rapidcfd_tpu.models import kinetictheory as kt
from rapidcfd_tpu.utils import logging as L


def test_radial_models_dilute_limit():
    # g0 -> 1 as alpha -> 0 for all radial models
    a = jnp.asarray([1e-8])
    for m in ("CarnahanStarling", "LunSavage", "SinclairJackson"):
        g0 = kt.radial_g0(m, a, 0.5, 0.62)
        assert abs(float(g0[0]) - 1.0) < 5e-3, m


def test_carnahan_starling_value():
    # CarnahanStarling at alpha=0.3: 1/0.7 + 0.9/(2*0.49) + 0.09/(2*0.343)
    a = jnp.asarray([0.3])
    g0 = float(kt.radial_g0("CarnahanStarling", a, 0.5, 0.62)[0])
    want = 1.0 / 0.7 + 3.0 * 0.3 / (2 * 0.7 ** 2) \
        + 0.3 ** 2 / (2 * 0.7 ** 3)
    assert g0 == pytest.approx(want, rel=1e-12)


def test_lun_pressure_and_prime():
    a = jnp.asarray([0.4])
    rho = jnp.asarray([2500.0])
    g0 = jnp.asarray([2.0])
    g0p = jnp.asarray([5.0])
    e = 0.8
    ps = float(kt.granular_pressure_coeff("Lun", a, g0, rho, e)[0])
    assert ps == pytest.approx(
        2500.0 * 0.4 * (1.0 + 2.0 * 1.8 * 0.4 * 2.0), rel=1e-12)
    psp = float(kt.granular_pressure_coeff_prime(
        "Lun", a, g0, g0p, rho, e)[0])
    assert psp == pytest.approx(
        2500.0 * (1.0 + 0.4 * 1.8 * (4.0 * 2.0 + 2.0 * 5.0 * 0.4)),
        rel=1e-12)


def test_johnson_jackson_frictional():
    cfg = {"Fr": 0.05, "eta": 2.0, "p": 5.0,
           "phi": np.deg2rad(28.5)}
    a = jnp.asarray([0.55])
    pf = float(kt.frictional_pressure("JohnsonJackson", cfg, a, 0.5,
                                      0.62)[0])
    assert pf == pytest.approx(0.05 * 0.05 ** 2 / 0.07 ** 5, rel=1e-9)
    # below alphaMinFriction: zero
    pf0 = float(kt.frictional_pressure("JohnsonJackson", cfg,
                                       jnp.asarray([0.3]), 0.5,
                                       0.62)[0])
    assert pf0 == 0.0


def test_equilibrium_theta_zero_strain():
    # no strain, no dilatation -> Theta = 0 (production = 0)
    cfg = kt.KTConfig()
    a = jnp.full((4,), 0.3)
    rho = jnp.full((4,), 2500.0)
    D = jnp.zeros((4, 3, 3))
    th = kt.equilibrium_theta(cfg, a, rho, 3e-4, jnp.zeros(4), D)
    np.testing.assert_allclose(np.asarray(th), 0.0, atol=1e-12)
    # shear produces Theta > 0
    D2 = D.at[:, 0, 1].set(10.0).at[:, 1, 0].set(10.0)
    th2 = kt.equilibrium_theta(cfg, a, rho, 3e-4, jnp.zeros(4), D2)
    assert (np.asarray(th2) > 0.0).all()


@pytest.mark.slow
def test_fluidized_bed_with_kinetic_theory(tmp_path_factory):
    from rapidcfd_tpu.utils.casegen import fluidized_bed_case
    from rapidcfd_tpu.solvers import twophaseeulerfoam
    d = str(tmp_path_factory.mktemp("fbed"))
    fluidized_bed_case(d, end_time=0.008, delta_t=2e-4)
    L.Info.enabled = False
    try:
        case, alpha, U1, U2, p, phi1, phi2 = twophaseeulerfoam.run(
            d, write=False)
    finally:
        L.Info.enabled = True
    a = np.asarray(alpha.data)
    assert np.isfinite(a).all()
    assert np.isfinite(np.asarray(U1.data)).all()
    assert np.isfinite(np.asarray(p.data)).all()
    # phase pressure keeps packing at/below alphaMax (+ margin)
    assert a.max() <= 0.63
    assert a.min() >= -1e-6
    # particle inventory approximately conserved (inlet feeds no
    # particles; a short run loses none through the top)
    V = np.asarray(case.mesh.V)
    inv = float((a * V).sum())
    inv0 = 0.55 * float(V[np.asarray(case.mesh.C)[:, 1]
                          < 0.28 * 0.7].sum())
    assert inv == pytest.approx(inv0, rel=0.05)
