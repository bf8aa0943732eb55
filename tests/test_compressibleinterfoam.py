"""compressibleInterFoam: depth-charge bubble in a closed box
(reference: applications/solvers/multiphase/compressibleInterFoam)."""

import numpy as np

from rapidcfd_tpu.utils import logging as L
from rapidcfd_tpu.utils.casegen import depth_charge_case


def test_phase_rho_thermo():
    import jax.numpy as jnp
    from rapidcfd_tpu.models.thermo import PhaseRhoThermo
    gas = PhaseRhoThermo(eos="perfectGas", mol_weight=28.9, cp=1007.0)
    T = jnp.asarray([300.0])
    assert 1.1 < float(gas.rho(1e5, T)[0]) < 1.2
    assert abs(float(gas.psi(T)[0]) - 1.0 / (8314.47 / 28.9 * 300)) < 1e-12
    liq = PhaseRhoThermo(eos="perfectFluid", mol_weight=18.0, cp=4195.0,
                         r_eos=3000.0, rho0=1027.0)
    # water at 1 bar, 300 K: 1027 + 1e5/(3000*300) ~ 1027.1
    assert abs(float(liq.rho(1e5, T)[0]) - (1027 + 1e5 / 9e5)) < 1e-6
    assert float(liq.psi(T)[0]) > 0
    con = PhaseRhoThermo(eos="rhoConst", mol_weight=18.0, cp=4195.0,
                         rho0=1000.0)
    assert float(con.rho(1e7, T)[0]) == 1000.0
    assert float(con.psi(T)[0]) == 0.0


def test_depth_charge_bubble(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("dcharge"))
    depth_charge_case(d, n=24, end_time=4e-4, delta_t=1e-5)
    L.Info.enabled = False
    from rapidcfd_tpu.solvers import compressibleinterfoam
    case, alpha, U, p_rgh, p, T, phi = compressibleinterfoam.run(
        d, write=False, max_steps=40)
    L.Info.enabled = True

    a = np.asarray(alpha.data)
    pp = np.asarray(p.data)
    t = np.asarray(T.data)
    assert np.isfinite(a).all() and np.isfinite(pp).all() \
        and np.isfinite(t).all()
    # MULES keeps the fraction bounded
    assert a.min() > -1e-6 and a.max() < 1.0 + 1e-6
    # the 10-bar bubble expands: pressure relaxes below the initial peak
    # and the water is compressed above ambient
    assert pp.max() < 1e6
    assert pp.max() > 1.2e5
    assert pp.min() >= 1e4 - 1.0  # pMin floor holds
    # bubble (air) volume grew
    V = np.asarray(case.mesh.V)
    air_vol0 = V[np.asarray(case.mesh.C)[:, 0] ** 0 == 1].sum() * 0  # noqa
    air_vol = ((1.0 - a) * V).sum()
    C = np.asarray(case.mesh.C)
    r = np.sqrt((C[:, 0] - 0.5) ** 2 + (C[:, 1] - 0.5) ** 2)
    init_air = V[r < 0.15].sum()
    # closed rigid box: water compressibility limits the expansion to a
    # few tenths of a percent over this window
    assert air_vol > init_air * 1.005
    # velocity field developed (expansion wave pushes water outward)
    assert float(np.abs(np.asarray(U.data)).max()) > 0.1
