"""reactingFoam + chemistry (VERDICT r1 item 8: reactionThermo slice).

Unit level: foam-format reaction parsing, EulerImplicit against the
implicit-Euler analytic solution, heat release sign. Integration:
ignition box — fuel burns in the hot kernel, temperature rises there,
mass fractions stay bounded and sum to one, global mass is conserved.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from rapidcfd_tpu.models.chemistry import (ChemistryModel,
                                           MultiComponentThermo,
                                           parse_reactions)
from rapidcfd_tpu.models.thermo import SpecieThermo
from rapidcfd_tpu.utils import logging as L
from rapidcfd_tpu.utils.casegen import reacting_box_case
from rapidcfd_tpu.utils.dictionary import parse_dictionary


def _simple_chem(hf=5e6, A=100.0, Ta=0.0):
    spA = SpecieThermo(mol_weight=28.0, cp_mode="const", cp0=1000.0,
                       hf=hf, energy="sensibleEnthalpy")
    spB = SpecieThermo(mol_weight=28.0, cp_mode="const", cp0=1000.0,
                       hf=0.0, energy="sensibleEnthalpy")
    th = MultiComponentThermo(["A", "B"], [spA, spB])
    d = parse_dictionary(f"""
reactions
{{
    decay
    {{
        type irreversibleArrheniusReaction;
        reaction "A = B";
        A {A}; beta 0; Ta {Ta};
    }}
}}
""")
    return th, ChemistryModel(th, parse_reactions(d, ["A", "B"]))


def test_reaction_parsing_stoichiometry():
    th, _ = _simple_chem()
    d = parse_dictionary("""
reactions
{
    r1
    {
        type irreversibleArrheniusReaction;
        reaction "2A = B";
        A 1; beta 0.5; Ta 300;
    }
}
""")
    (r,) = parse_reactions(d, ["A", "B"])
    assert r.lhs == ((0, 2.0, 2.0),)
    assert r.rhs == ((1, 1.0, 1.0),)
    assert r.beta == 0.5 and r.Ta == 300.0


def test_euler_implicit_matches_analytic():
    """A -> B at constant rate k: one implicit-Euler substep gives
    c1 = c0/(1 + k dt) exactly."""
    th, chem = _simple_chem()
    k, dt = 100.0, 1e-3
    rho = jnp.ones(4)
    Y = jnp.stack([jnp.ones(4), jnp.zeros(4)])
    T = jnp.full(4, 300.0)
    rr = chem.euler_implicit(rho, Y, T, dt, n_sub=1)
    c0 = 1.0 / 28.0
    expect = (c0 / (1 + k * dt) - c0) / dt * 28.0
    assert np.allclose(np.asarray(rr[0]), expect, rtol=1e-4)
    assert np.allclose(np.asarray(rr.sum(0)), 0.0, atol=1e-5)  # mass
    q = chem.qdot(rr, T)
    assert float(q[0]) > 0.0                  # exothermic: hf(A) > 0


def test_reversible_needs_janaf():
    th, _ = _simple_chem()
    d = parse_dictionary("""
reactions
{
    r { type reversibleArrheniusReaction; reaction "A = B";
        A 1; beta 0; Ta 0; }
}
""")
    chem = ChemistryModel(th, parse_reactions(d, ["A", "B"]))
    with pytest.raises(ValueError):
        chem._rates_c(jnp.ones(2), jnp.asarray(300.0))


@pytest.fixture(scope="module")
def ignition_run(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("react"))
    reacting_box_case(d, n=12, end_time=1e-3, delta_t=1e-4)
    L.Info.enabled = False
    try:
        from rapidcfd_tpu.solvers import reactingfoam
        out = reactingfoam.run(d, write=False)
    finally:
        L.Info.enabled = True
    return (d,) + out


def test_ignition_burns_fuel(ignition_run):
    d, case, U, p, T, rho, Ys, phi = ignition_run
    names = [y.name for y in Ys]
    F = np.asarray(Ys[names.index("F")].data)
    P = np.asarray(Ys[names.index("P")].data)
    C = np.asarray(case.mesh.C)
    r = np.sqrt((C[:, 0] - 0.05) ** 2 + (C[:, 1] - 0.05) ** 2)
    hot = r < 0.02
    assert F[hot].max() < 0.1 - 1e-4          # fuel consumed in kernel
    assert P[hot].min() > 1e-4                # product formed
    assert F[~hot].max() > 0.099              # cold region unburnt


def test_ignition_bounded_and_normalized(ignition_run):
    d, case, U, p, T, rho, Ys, phi = ignition_run
    Ysum = sum(np.asarray(y.data) for y in Ys)
    assert np.allclose(Ysum, 1.0, atol=1e-6)
    for y in Ys:
        a = np.asarray(y.data)
        assert a.min() > -1e-8 and a.max() < 1.0 + 1e-8
    t = np.asarray(T.data)
    assert np.isfinite(t).all()
    assert t.max() > 1500.0                   # heat release raised T


def test_ignition_mass_conserved(ignition_run):
    d, case, U, p, T, rho, Ys, phi = ignition_run
    V = np.asarray(case.mesh.V)
    m_end = (np.asarray(rho.data) * V).sum()
    # initial rho from the same thermo at t=0 fields
    rho0 = np.asarray(case.read_field("T", "0").data)
    from rapidcfd_tpu.models.chemistry import read_reacting_thermo
    L.Info.enabled = False
    try:
        thermo, _ = read_reacting_thermo(case.dir)
    finally:
        L.Info.enabled = True
    import jax.numpy as jnp_
    p0 = case.read_field("p", "0")
    T0 = case.read_field("T", "0")
    Y0 = jnp_.stack([case.read_field(n, "0").data
                     for n in thermo.species])
    m_start = (np.asarray(thermo.rho(Y0, p0.data, T0.data)) * V).sum()
    assert abs(m_end - m_start) / m_start < 1e-4
