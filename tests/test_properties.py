"""NSRDS property databases, SLGThermo, laminar flame speed.

Reference: src/thermophysicalModels/properties/liquidProperties/
(H2O.C/C7H16.C coefficient sets), thermophysicalFunctions/
NSRDSfunctions/, laminarFlameSpeed/Gulders/Gulders.C.
"""

import jax.numpy as jnp
import numpy as np

from rapidcfd_tpu.models.properties import (GuldersFlameSpeed,
                                            SLGThermo, make_flame_speed,
                                            make_liquid, make_solid)
from rapidcfd_tpu.utils.dictionary import parse_dictionary


def test_h2o_handbook_values():
    """Water at 300 K / 373.15 K against handbook values."""
    w = make_liquid("H2O")
    T = jnp.asarray(300.0)
    assert abs(float(w.rho(T)) - 996.5) < 3.0          # kg/m^3
    assert abs(float(w.mu(T)) - 8.5e-4) < 1e-4         # Pa s
    assert abs(float(w.cp(T)) - 4180.0) < 40.0         # J/kg/K
    assert abs(float(w.kappa(T)) - 0.61) < 0.02        # W/m/K
    assert abs(float(w.sigma(T)) - 0.0717) < 0.002     # N/m
    # boiling: pv(Tb) = 1 atm, hl ~ 2.26 MJ/kg
    Tb = jnp.asarray(373.15)
    assert abs(float(w.pv(Tb)) - 101325.0) / 101325.0 < 0.02
    assert abs(float(w.hl(Tb)) - 2.256e6) / 2.256e6 < 0.02


def test_c7h16_values():
    h = make_liquid("C7H16")
    T = jnp.asarray(300.0)
    assert abs(float(h.rho(T)) - 681.0) < 5.0
    assert abs(float(h.pv(jnp.asarray(371.58))) - 101325.0) \
        / 101325.0 < 0.03
    # correlations vectorize over cell arrays
    Ts = jnp.linspace(290.0, 360.0, 8)
    assert np.isfinite(np.asarray(h.rho(Ts))).all()
    assert (np.diff(np.asarray(h.rho(Ts))) < 0).all()  # expands


def test_liquid_from_dict():
    d = parse_dictionary("""
W 18.015; Tc 647.13; Pc 2.2055e7; Vc 0.05595; Zc 0.229;
Tt 273.16; Pt 611.3; Tb 373.15; dipm 6.1709e-30; omega 0.3449;
delta 4.7813e4;
rho NSRDSfunc5 (98.343885 0.30542 647.13 0.081);
mu  NSRDSfunc1 (-51.964 3670.6 5.7331 -5.3495e-29 10);
""")
    liq = make_liquid("myWater", d)
    builtin = make_liquid("H2O")
    T = jnp.asarray(310.0)
    assert abs(float(liq.rho(T)) - float(builtin.rho(T))) < 1e-9
    assert abs(float(liq.mu(T)) - float(builtin.mu(T))) < 1e-12


def test_slg_thermo_and_solids():
    d = parse_dictionary("""
liquids { H2O {} }
solids  { C {} ash { rho 1900; Cp 800; K 0.05; } }
""")
    slg = SLGThermo.from_dict(d)
    assert "H2O" in slg.liquids
    assert abs(float(slg.liquids["H2O"].rho(jnp.asarray(300.0)))
               - 996.5) < 3.0
    assert slg.solids["C"].rho == 2010.0
    assert slg.solids["ash"].rho == 1900.0 \
        and slg.solids["ash"].cp == 800.0
    s = make_solid("C")
    assert s.kappa == 0.04


def test_gulders_flame_speed():
    """Methane at stoichiometry, 300 K, 1 atm: Su0 ~ 0.37 m/s
    (Gulders correlation peak near phi ~ 1.075)."""
    g = GuldersFlameSpeed("Methane")
    su = float(g.su0_pt_phi(jnp.asarray(1.013e5), jnp.asarray(300.0),
                            1.0))
    assert 0.3 < su < 0.45
    # peak near phi = 1.075
    su_peak = float(g.su0_pt_phi(jnp.asarray(1.013e5),
                                 jnp.asarray(300.0), 1.075))
    assert su_peak >= su
    # preheat raises, low pressure raises (beta < 0)
    su_hot = float(g.su0_pt_phi(jnp.asarray(1.013e5),
                                jnp.asarray(400.0), 1.0))
    assert su_hot > su
    d = parse_dictionary("""
laminarFlameSpeedCorrelation Gulders;
fuel Methane;
""")
    m = make_flame_speed(d)
    assert abs(float(m.su0_pt_phi(jnp.asarray(1.013e5),
                                  jnp.asarray(300.0), 1.0)) - su) < 1e-12
    dc = parse_dictionary("Su Su [0 1 -1 0 0 0 0] 0.4;\n"
                          "laminarFlameSpeedCorrelation constant;")
    c = make_flame_speed(dc)
    assert float(c.su0_pt_phi(1e5, jnp.asarray(300.0))) == 0.4
