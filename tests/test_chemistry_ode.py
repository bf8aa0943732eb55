"""`ode` chemistry solver + CHEMKIN reader.

Reference: src/thermophysicalModels/chemistryModel/chemistrySolver/
ode/ode.H (adaptive stiff integration) and reactionThermo/
chemistryReaders/chemkinReader/ (CHEMKIN-II format).
"""

import os
import textwrap

import jax.numpy as jnp
import numpy as np

from rapidcfd_tpu.models.chemistry import ChemistryModel
from rapidcfd_tpu.models.chemkin import (parse_nasa7,
                                         parse_reactions_chemkin,
                                         read_chemkin)

from test_reacting import _simple_chem


def test_ode_matches_analytic_decay():
    """A -> B first order at rate k: exact solution c = c0 exp(-kt);
    the adaptive Rosenbrock must land within its tolerance, far closer
    than one backward-Euler step at k*dt = 1."""
    th, chem = _simple_chem(A=100.0)
    k, dt = 100.0, 1e-2                     # k*dt = 1: stiff-ish
    rho = jnp.ones(8)
    Y = jnp.stack([jnp.ones(8), jnp.zeros(8)])
    T = jnp.full(8, 300.0)
    rr, unfinished = chem.ode(rho, Y, T, dt, eps=1e-6)
    assert int(unfinished) == 0
    c0 = 1.0 / 28.0
    exact = (c0 * np.exp(-k * dt) - c0) / dt * 28.0
    be = (c0 / (1 + k * dt) - c0) / dt * 28.0
    got = float(np.asarray(rr[0][0]))
    assert abs(got - exact) < 0.05 * abs(exact - be), (got, exact, be)
    # element/mass conservation
    assert np.allclose(np.asarray(rr.sum(0)), 0.0, atol=1e-6)


def test_ode_stiff_two_scale():
    """Two decoupled reactions with rates 1e4 and 1: the fast specie
    fully relaxes inside dt without destabilising the slow one."""
    from rapidcfd_tpu.models.chemistry import (MultiComponentThermo,
                                               parse_reactions)
    from rapidcfd_tpu.models.thermo import SpecieThermo
    from rapidcfd_tpu.utils.dictionary import parse_dictionary
    sp = [SpecieThermo(mol_weight=28.0, cp_mode="const", cp0=1000.0,
                       energy="sensibleEnthalpy") for _ in range(4)]
    th = MultiComponentThermo(["A", "B", "C", "D"], sp)
    d = parse_dictionary("""
reactions
{
    fast { type irreversibleArrheniusReaction; reaction "A = B";
           A 10000; beta 0; Ta 0; }
    slow { type irreversibleArrheniusReaction; reaction "C = D";
           A 1; beta 0; Ta 0; }
}
""")
    chem = ChemistryModel(th, parse_reactions(d, ["A", "B", "C", "D"]))
    dt = 1e-2
    rho = jnp.ones(2)
    Y = jnp.stack([jnp.full(2, 0.25)] * 4)
    T = jnp.full(2, 300.0)
    rr, unfinished = chem.ode(rho, Y, T, dt, eps=1e-5)
    assert int(unfinished) == 0
    c0 = 0.25 / 28.0
    # fast: fully consumed within dt -> RR ~ -c0/dt
    assert abs(float(rr[0][0]) * dt / 28.0 + c0) < 0.02 * c0
    # slow: exp(-1e-2) decay
    exact_slow = (c0 * np.exp(-dt) - c0) / dt * 28.0
    assert abs(float(rr[2][0]) - exact_slow) < 0.01 * abs(exact_slow)


_MECH = textwrap.dedent("""\
    ! test mechanism
    ELEMENTS
    H O N
    END
    SPECIES
    H2 O2 OH H2O N2
    END
    REACTIONS
    H2+O2=2OH            1.7E13  0.0  47780
    OH+H2=H2O+H^1        1.0E8   1.6  3300
    END
""").replace("H^1", "H2")   # keep species closed


_THERMO = """THERMO
   300.000  1000.000  5000.000
H2                102207H   2               G  0300.00   5000.00  1000.00      1
 3.06670950E+00 5.74737550E-04 1.39383190E-08-2.54835180E-11 2.90985740E-15    2
-8.65474120E+02-1.77984240E+00 3.35535140E+00 5.01361440E-04-2.30069080E-07    3
-4.79053240E-10 4.85225850E-13-1.01916260E+03-3.54772280E+00                   4
O2                121386O   2               G  0300.00   5000.00  1000.00      1
 3.61221390E+00 7.48531660E-04-1.98206470E-07 3.37490080E-11-2.39073740E-15    2
-1.19781510E+03 3.67033070E+00 3.78371350E+00-3.02336340E-03 9.94927510E-06    3
-9.81891010E-09 3.30318250E-12-1.06381070E+03 3.64163450E+00                   4
OH                121286O   1H   1          G  0300.00   5000.00  1000.00      1
 2.88273000E+00 1.01397430E-03-2.27687700E-07 2.17468300E-11-5.12630500E-16    2
 3.88688800E+03 5.59571200E+00 3.63726600E+00 1.85091000E-04-1.67616460E-06    3
 2.38720200E-09-8.43144200E-13 3.60678200E+03 1.35886050E+00                   4
H2O                20387H   2O   1          G  0300.00   5000.00  1000.00      1
 2.67214560E+00 3.05629290E-03-8.73026010E-07 1.20099640E-10-6.39161790E-15    2
-2.98992090E+04 6.86281680E+00 3.38684250E+00 3.47498210E-03-6.35469690E-06    3
 6.96858500E-09-2.50658840E-12-3.02081100E+04 2.59023280E+00                   4
N2                121286N   2               G  0300.00   5000.00  1000.00      1
 2.92664000E+00 1.48797680E-03-5.68476000E-07 1.00970380E-10-6.75335100E-15    2
-9.22797700E+02 5.98052800E+00 3.29867700E+00 1.40824040E-03-3.96322200E-06    3
 5.64151500E-09-2.44485400E-12-1.02089990E+03 3.95037200E+00                   4
END
"""


def test_chemkin_reader_roundtrip(tmp_path):
    mech = os.path.join(str(tmp_path), "mech.inp")
    thermo = os.path.join(str(tmp_path), "therm.dat")
    open(mech, "w").write(_MECH)
    open(thermo, "w").write(_THERMO)
    species, specs, reactions = read_chemkin(mech, thermo)
    assert species == ["H2", "O2", "OH", "H2O", "N2"]
    # molecular weights from element composition
    w = {s: sp.mol_weight for s, sp in zip(species, specs)}
    assert abs(w["H2"] - 2.016) < 0.01
    assert abs(w["O2"] - 31.999) < 0.01
    assert abs(w["H2O"] - 18.015) < 0.01
    # janaf thermo: Cp(H2O) at 300K ~ 1864 J/kg/K
    import jax.numpy as jnp
    cp = float(specs[3].cp_t(jnp.asarray(300.0)))
    assert abs(cp - 1864.0) < 40.0
    # reaction 1: bimolecular, reversible; A converted cm3/mol -> m3/kmol
    r1 = reactions[0]
    assert r1.reversible
    assert abs(r1.A - 1.7e13 * 1e-3) / (1.7e13 * 1e-3) < 1e-12
    assert abs(r1.Ta - 47780 / 1.98720425864083) < 0.5
    assert r1.lhs == ((0, 1.0, 1.0), (1, 1.0, 1.0))
    assert r1.rhs == ((2, 2.0, 2.0),)


def test_chemkin_third_body_and_rev(tmp_path):
    mech = os.path.join(str(tmp_path), "m.inp")
    open(mech, "w").write(textwrap.dedent("""\
        SPECIES
        H2 O2 H2O N2
        END
        REACTIONS
        H2+O2+M=H2O+O2+M   1.0E15  0.0  1000
        H2O/6.0/ N2/0.5/
        END
    """))
    species, _, reactions = read_chemkin(
        mech, None) if False else (None, None, None)
    # reader requires thermo; parse the reaction block directly
    rxns = parse_reactions_chemkin(
        "H2+O2+M=H2O+O2+M   1.0E15  0.0  1000\nH2O/6.0/ N2/0.5/\n",
        ["H2", "O2", "H2O", "N2"])
    (r,) = rxns
    assert r.third_body
    effs = dict(r.efficiencies)
    assert effs[2] == 6.0 and effs[3] == 0.5
    # order = 2 species + M = 3 -> A * 1e-3^2
    assert abs(r.A - 1.0e15 * 1e-6) / (1.0e15 * 1e-6) < 1e-12


def test_chemkin_falloff_rejected():
    import pytest
    with pytest.raises(NotImplementedError):
        parse_reactions_chemkin(
            "H+O2(+M)=HO2(+M)   1.0E12 0.44 0\n", ["H", "O2", "HO2"])


def test_chemkin_eff_line_after_rev_patches_both():
    """CHEMKIN allows aux lines in any order: an efficiency line after
    REV must patch the forward AND the explicit reverse reaction."""
    rxns = parse_reactions_chemkin(
        "H2+O2+M=H2O+O2+M   1.0E15  0.0  1000\n"
        "REV /2.0E14 0.0 500/\n"
        "H2O/6.0/ N2/0.5/\n",
        ["H2", "O2", "H2O", "N2"])
    assert len(rxns) == 2
    for r in rxns:
        effs = dict(r.efficiencies)
        assert effs[2] == 6.0 and effs[3] == 0.5


def test_chemkin_eff_line_before_any_reaction_rejected():
    # clear rejection, not an IndexError on out[-1]: rejected either as
    # an unknown units keyword (first line) or as a stray aux line
    import pytest
    with pytest.raises((ValueError, NotImplementedError)):
        parse_reactions_chemkin("H2O/6.0/\n", ["H2O"])
    with pytest.raises(ValueError):
        parse_reactions_chemkin(
            "REACTIONS\nH2O/6.0/\nA=B 1.0 0.0 0.0\n", ["A", "B", "H2O"])


def test_chemkin_molecules_units_rejected():
    import pytest
    with pytest.raises(NotImplementedError):
        parse_reactions_chemkin(
            "REACTIONS MOLECULES\nA=B 1.0 0.0 0.0\n", ["A", "B"])


def test_chemkin_kelvins_units():
    (r,) = parse_reactions_chemkin(
        "REACTIONS KELVINS\nA=B 1.0 0.0 1234.5\n", ["A", "B"])
    assert abs(r.Ta - 1234.5) < 1e-9
