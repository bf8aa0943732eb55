"""Generalized specie thermo stack (models/thermo.py SpecieThermo).

Validates janaf polynomials against published NASA-7 N2 data, the
Newton T(he) inversion, polynomial Cp/transport, the EoS zoo, and a
rhoPimpleFoam run with a janaf+sutherland gas.
"""

import numpy as np
import jax.numpy as jnp

from rapidcfd_tpu.models.thermo import (SpecieThermo, read_thermo,
                                        read_specie_thermo)
from rapidcfd_tpu.utils.dictionary import parse_dictionary as parse_string

N2_LOW = (3.298677, 0.0014082404, -3.963222e-06, 5.641515e-09,
          -2.444854e-12, -1020.8999, 3.950372)
N2_HIGH = (2.92664, 0.0014879768, -5.68476e-07, 1.0097038e-10,
           -6.753351e-15, -922.7977, 5.980528)


def _janaf_n2(energy="sensibleEnthalpy"):
    return SpecieThermo(mol_weight=28.0134, cp_mode="janaf",
                        janaf_low=N2_LOW, janaf_high=N2_HIGH,
                        energy=energy, transport="sutherland",
                        as_=1.458e-6, ts=110.4)


def test_janaf_cp_values():
    m = _janaf_n2()
    T = jnp.asarray([300.0, 1000.0, 2000.0])
    cp = np.asarray(m.cp_t(T))
    # published N2 Cp: 1040 (300K), 1167 (1000K), 1284 (2000K) J/kg/K
    assert abs(cp[0] - 1040) < 10
    assert abs(cp[1] - 1167) < 15
    assert abs(cp[2] - 1284) < 15


def test_janaf_newton_roundtrip():
    for energy in ("sensibleEnthalpy", "sensibleInternalEnergy",
                   "absoluteEnthalpy"):
        m = _janaf_n2(energy)
        T = jnp.asarray([250.0, 400.0, 999.0, 1001.0, 3000.0])
        he = m.he_from_t(T)
        T2 = m.t_from_he(he, T0=jnp.full_like(T, 500.0))
        assert float(jnp.abs(T2 - T).max()) < 1e-6, energy


def test_polynomial_cp_and_transport():
    m = SpecieThermo(mol_weight=28.9, cp_mode="polynomial",
                     cp_poly=(1000.0, 0.05), transport="polynomial",
                     mu_poly=(1e-5, 1e-8), kappa_poly=(0.02, 1e-5))
    T = jnp.asarray([300.0, 600.0])
    np.testing.assert_allclose(np.asarray(m.cp_t(T)),
                               [1015.0, 1030.0])
    np.testing.assert_allclose(np.asarray(m.mu(T)),
                               [1.3e-5, 1.6e-5])
    # alpha_h = kappa/cp
    np.testing.assert_allclose(
        np.asarray(m.alpha_h(T)),
        np.asarray([0.023 / 1015.0, 0.026 / 1030.0]), rtol=1e-12)
    he = m.he_from_t(T)
    T2 = m.t_from_he(he, T0=jnp.full_like(T, 400.0))
    assert float(jnp.abs(T2 - T).max()) < 1e-8


def test_eos_zoo():
    T = jnp.asarray([300.0])
    p = jnp.asarray([2e5])
    ipg = SpecieThermo(mol_weight=28.9, eos="incompressiblePerfectGas",
                      p_ref=1e5)
    # density uses pRef, independent of p
    np.testing.assert_allclose(np.asarray(ipg.rho(p, T)),
                               1e5 / (ipg.r * 300.0))
    assert float(ipg.psi(T)[0]) == 0.0
    ico = SpecieThermo(mol_weight=18.0, eos="icoPolynomial",
                       rho_poly=(1000.0, -0.1))
    np.testing.assert_allclose(np.asarray(ico.rho(p, T)), 970.0)
    lin = SpecieThermo(mol_weight=18.0, eos="linear", psi0=1e-5,
                       rho0=500.0)
    np.testing.assert_allclose(np.asarray(lin.rho(p, T)), 502.0)
    np.testing.assert_allclose(np.asarray(lin.psi(T)), 1e-5)
    rc = SpecieThermo(mol_weight=18.0, eos="rhoConst", rho0=999.0)
    np.testing.assert_allclose(np.asarray(rc.rho(p, T)), 999.0)


def test_read_thermo_janaf_dict():
    d = parse_string("""
thermoType
{
    type            hePsiThermo;
    mixture         pureMixture;
    transport       sutherland;
    thermo          janaf;
    equationOfState perfectGas;
    specie          specie;
    energy          sensibleEnthalpy;
}
mixture
{
    specie { nMoles 1; molWeight 28.0134; }
    thermodynamics
    {
        Tlow            100;
        Thigh           5000;
        Tcommon         1000;
        highCpCoeffs    ( 2.92664 0.0014879768 -5.68476e-07
                          1.0097038e-10 -6.753351e-15 -922.7977
                          5.980528 );
        lowCpCoeffs     ( 3.298677 0.0014082404 -3.963222e-06
                          5.641515e-09 -2.444854e-12 -1020.8999
                          3.950372 );
    }
    transport { As 1.458e-06; Ts 110.4; }
}
""")
    m = read_thermo(d)
    assert isinstance(m, SpecieThermo)
    assert m.cp_mode == "janaf"
    assert m.transport == "sutherland"
    assert abs(m.cp - 1040) < 10          # scalar Cp at 298K
    T = jnp.asarray([400.0])
    assert abs(float(m.mu(T)[0]) - 2.28e-5) < 2e-6   # sutherland N2


def test_rho_pimple_janaf(tmp_path_factory):
    """rhoPimpleFoam with a janaf stack (Newton T inversion in the
    solver loop). The janaf coefficients reproduce the channel's scaled
    test gas (cp/R = 3.5 + 1e-4*T) so the acoustic CFL matches the
    case setup."""
    import os
    from rapidcfd_tpu.utils import logging as L
    from rapidcfd_tpu.utils.casegen import _write, hot_channel_case
    from rapidcfd_tpu.utils.dictionary import foamfile_header
    d = str(tmp_path_factory.mktemp("janafch"))
    hot_channel_case(d)
    _write(os.path.join(d, "constant", "thermophysicalProperties"),
           foamfile_header("dictionary", "thermophysicalProperties",
                           "constant"), """
thermoType
{
    type            hePsiThermo;
    mixture         pureMixture;
    transport       const;
    thermo          janaf;
    equationOfState perfectGas;
    specie          specie;
    energy          sensibleInternalEnergy;
}
mixture
{
    specie { nMoles 1; molWeight 11640.3; }
    thermodynamics
    {
        Tlow 100; Thigh 5000; Tcommon 1000;
        highCpCoeffs ( 3.5 1e-4 0 0 0 0 0 );
        lowCpCoeffs  ( 3.5 1e-4 0 0 0 0 0 );
    }
    transport { mu 0; Pr 1; }
}
""")
    L.Info.enabled = False
    try:
        from rapidcfd_tpu.solvers import rhopimplefoam
        case, U, p, T, rho, phi = rhopimplefoam.run(d, write=False,
                                                    max_steps=8)
    finally:
        L.Info.enabled = True
    t = np.asarray(T.data)
    pp = np.asarray(p.data)
    assert np.isfinite(t).all() and np.isfinite(pp).all()
    assert 250 < t.min() and t.max() < 500


def test_adiabatic_perfect_fluid():
    """adiabaticPerfectFluid (reference adiabaticPerfectFluidI.H:105):
    rho = rho0*((p+B)/(p0+B))^(1/gamma) — water-like Tait EoS."""
    m = SpecieThermo(mol_weight=18.0, eos="adiabaticPerfectFluid",
                     rho0=1000.0, p0_apf=1e5, b_apf=3.0e8,
                     gamma_apf=7.15)
    T = jnp.asarray([300.0])
    rho_ref = np.asarray(m.rho(jnp.asarray([1e5]), T))[0]
    assert abs(rho_ref - 1000.0) < 1e-6
    # +100 bar compresses water by ~0.5%
    rho_hi = np.asarray(m.rho(jnp.asarray([1.01e7]), T))[0]
    assert 1000.0 < rho_hi < 1010.0
    # psi = drho/dp finite-difference check
    dp = 1e4
    fd = (np.asarray(m.rho(jnp.asarray([1e5 + dp]), T))[0]
          - rho_ref) / dp
    psi = np.asarray(m.psi(T, 1e5))[0]
    assert abs(psi - fd) / fd < 1e-2


def test_peng_robinson_gas():
    """PengRobinsonGas (reference PengRobinsonGasI.H:Z): Z -> 1 in the
    ideal limit; Z < 1 for CO2 near its critical region; rho > ideal."""
    co2 = SpecieThermo(mol_weight=44.01, eos="PengRobinsonGas",
                       t_crit=304.13, p_crit=7.377e6, v_crit=9.412e-5,
                       z_crit=0.274, omega_acc=0.2239, p_ref=1e5)
    T = jnp.asarray([300.0])
    z_lo = np.asarray(co2.z_pr(jnp.asarray([1e5]), T))[0]
    assert abs(z_lo - 1.0) < 0.01                  # near-ideal at 1 bar
    z_hi = np.asarray(co2.z_pr(jnp.asarray([5e6]), T))[0]
    assert 0.2 < z_hi < 0.85                       # strongly non-ideal
    rho_id = 5e6 / (co2.r * 300.0)
    rho_pr = np.asarray(co2.rho(jnp.asarray([5e6]), T))[0]
    assert rho_pr > 1.1 * rho_id
    # parse path: equationOfState subdict
    props = parse_string("""
thermoType
{
    type            hePsiThermo;
    mixture         pureMixture;
    transport       const;
    thermo          hConst;
    equationOfState PengRobinsonGas;
    specie          specie;
    energy          sensibleEnthalpy;
}
mixture
{
    specie { nMoles 1; molWeight 44.01; }
    equationOfState { Tc 304.13; Pc 7.377e6; Vc 9.412e-5;
                      Zc 0.274; omega 0.2239; }
    thermodynamics { Cp 846; Hf 0; }
    transport { mu 1.48e-05; Pr 0.76; }
}
""")
    m2 = read_specie_thermo(props)
    assert m2.eos == "PengRobinsonGas"
    assert abs(m2.t_crit - 304.13) < 1e-6
