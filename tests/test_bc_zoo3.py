"""Round-4 BC zoo: compressible inlet temperatures, pressure-driven
velocity variants, hydrostatic pressures, stochastic/supersonic inlets,
misc derived types.

Reference parity targets (src/finiteVolume/fields/fvPatchFields/derived/):
totalTemperature, inletOutletTotalTemperature, turbulentInlet,
supersonicFreestream, fluxCorrectedVelocity, pressureDirectedInlet*,
pressureNormalInletOutletVelocity, pressureInletOutletParSlipVelocity,
pressureInletUniformVelocity, rotatingPressureInletOutletVelocity,
rotatingTotalPressure, phaseHydrostaticPressure,
uniformDensityHydrostaticPressure, interstitialInletVelocity,
outletMappedUniformInlet, oscillatingFixedValue, syringePressure,
fixedInternalValue, externalCoupledMixed, uniformInletOutlet,
fixedNormalInletOutletVelocity, variableHeightFlowRateInletVelocity.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from rapidcfd_tpu.fields.bcs import make_bc
from rapidcfd_tpu.fields.bcs_derived import (advance_syringe_state,
                                             manipulate_matrix_bcs)
from rapidcfd_tpu.fields.field import SurfaceField, VolField
from rapidcfd_tpu.mesh import build_mesh_arrays
from rapidcfd_tpu.utils.casegen import box_mesh
from rapidcfd_tpu.utils.dimensions import DimensionSet, dimless


@pytest.fixture(scope="module")
def chan():
    m = box_mesh(8, 4, 2, size=(0.8, 0.4, 0.2), patch_spec={
        "xmin": ("inlet", "patch"), "xmax": ("outlet", "patch"),
        "ymin": ("wall", "wall"), "ymax": ("top", "patch"),
        "zmin": ("back", "patch"), "zmax": ("front", "patch")})
    ma, pm, maps = build_mesh_arrays(m)
    return ma


def _field(ma, data, bc_words, bcdata=None, rank=(), name="psi"):
    bcs, bds = [], []
    for i, p in enumerate(ma.patches):
        w = bc_words.get(p.name, "zeroGradient")
        bcs.append(make_bc(w, i, (bcdata or {}).get(p.name + "_pd")))
        bds.append((bcdata or {}).get(p.name, {}))
    bv = jnp.zeros((ma.n_boundary,) + rank, ma.C.dtype)
    f = VolField(data, bv, tuple(bcs), dimless, name, tuple(bds))
    return f.correct_boundary_conditions(ma)


def _patch(ma, name):
    return next(p for p in ma.patches if p.name == name)


def _pvals(ma, f, pname):
    p = _patch(ma, pname)
    return np.asarray(f.bvalues[p.bstart:p.bstart + p.size])


def _mk_phi(ma, un):
    """Uniform x-directed volumetric flux of face-normal speed un."""
    sf = np.asarray(ma.Sf)
    phi = sf[:, 0] * un
    return SurfaceField(jnp.asarray(phi), DimensionSet.of(0, 3, -1), "phi")


def _vol(ma, val, name, rank=()):
    data = jnp.broadcast_to(jnp.asarray(val), (ma.n_cells,) + rank)
    f = _field(ma, data, {}, rank=rank, name=name)
    return f


# ---------------------------------------------------------------------------
# compressible inlet temperatures
# ---------------------------------------------------------------------------

def test_total_temperature_inflow(chan):
    ma = chan
    phi = _mk_phi(ma, -1.0)     # inflow at every patch with +x normal
    U = _vol(ma, jnp.asarray([10.0, 0.0, 0.0]), "U", rank=(3,))
    psi = _vol(ma, 1.0 / (287.0 * 300.0), "psi")
    T = _field(ma, jnp.full(ma.n_cells, 300.0),
               {"inlet": "totalTemperature"},
               {"inlet": {"T0": jnp.asarray(330.0),
                          "gamma": jnp.asarray(1.4)}})
    env = {"phi": phi, "U": U, "psi": psi}
    T = T.correct_boundary_conditions(ma, env=env)
    vals = _pvals(ma, T, "inlet")
    # inlet patch has normal -x => phi_b = -Sf_x*1... compute both branches
    p = _patch(ma, "inlet")
    phi_b = np.asarray(phi.data[p.start:p.start + p.size])
    psi_b = 1.0 / (287.0 * 300.0)
    expect_in = 330.0 / (1.0 + 0.5 * psi_b * (0.4 / 1.4) * 100.0)
    expect = np.where(phi_b < 0, expect_in, 330.0)
    assert np.allclose(vals, expect, rtol=1e-6)


def test_inlet_outlet_total_temperature(chan):
    ma = chan
    U = _vol(ma, jnp.asarray([10.0, 0.0, 0.0]), "U", rank=(3,))
    psi = _vol(ma, 1.0 / (287.0 * 300.0), "psi")
    T = _field(ma, jnp.full(ma.n_cells, 290.0),
               {"outlet": "inletOutletTotalTemperature"},
               {"outlet": {"T0": jnp.asarray(330.0),
                           "gamma": jnp.asarray(1.4)}})
    # outflow at the outlet -> zero-gradient carry-through
    env = {"phi": _mk_phi(ma, 1.0), "U": U, "psi": psi}
    T2 = T.correct_boundary_conditions(ma, env=env)
    assert np.allclose(_pvals(ma, T2, "outlet"), 290.0)
    # reversed flow -> total-temperature value
    env = {"phi": _mk_phi(ma, -1.0), "U": U, "psi": psi}
    T3 = T.correct_boundary_conditions(ma, env=env)
    psi_b = 1.0 / (287.0 * 300.0)
    expect = 330.0 / (1.0 + 0.5 * psi_b * (0.4 / 1.4) * 100.0)
    assert np.allclose(_pvals(ma, T3, "outlet"), expect, rtol=1e-6)


# ---------------------------------------------------------------------------
# pressure-driven velocity variants
# ---------------------------------------------------------------------------

def test_pressure_directed_inlet_velocity(chan):
    ma = chan
    phi = _mk_phi(ma, -2.0)
    d = jnp.asarray([1.0, 1.0, 0.0]) / np.sqrt(2.0)
    U = _field(ma, jnp.zeros((ma.n_cells, 3)),
               {"inlet": "pressureDirectedInletVelocity"},
               {"inlet": {"inletDirection": d}}, rank=(3,))
    U = U.correct_boundary_conditions(ma, env={"phi": phi})
    vals = _pvals(ma, U, "inlet")
    p = _patch(ma, "inlet")
    phi_b = np.asarray(phi.data[p.start:p.start + p.size])
    n = np.asarray(ma.patch_normals(p))
    mag_sf = np.asarray(ma.patch_mag_sf(p))
    nd = (n @ np.asarray(d)) * mag_sf
    expect = np.asarray(d)[None, :] * (phi_b / nd)[:, None]
    assert np.allclose(vals, expect, rtol=1e-5)
    # flux reproduced: (U . Sf) == phi
    sf = np.asarray(ma.Sf[p.start:p.start + p.size])
    assert np.allclose((vals * sf).sum(1), phi_b, rtol=1e-5)


def test_pressure_normal_inlet_outlet(chan):
    ma = chan
    # outflow: zero-gradient
    U = _field(ma, jnp.ones((ma.n_cells, 3)),
               {"outlet": "pressureNormalInletOutletVelocity"}, rank=(3,))
    U1 = U.correct_boundary_conditions(ma, env={"phi": _mk_phi(ma, 3.0)})
    assert np.allclose(_pvals(ma, U1, "outlet"), 1.0)
    # inflow: n*phi/|Sf|
    phi = _mk_phi(ma, -3.0)
    U2 = U.correct_boundary_conditions(ma, env={"phi": phi})
    p = _patch(ma, "outlet")
    n = np.asarray(ma.patch_normals(p))
    expect = n * -3.0
    assert np.allclose(_pvals(ma, U2, "outlet"), expect, rtol=1e-5)


def test_par_slip_keeps_tangential(chan):
    ma = chan
    data = jnp.tile(jnp.asarray([0.5, 2.0, 0.0]), (ma.n_cells, 1))
    U = _field(ma, data,
               {"outlet": "pressureInletOutletParSlipVelocity"}, rank=(3,))
    phi = _mk_phi(ma, -1.5)
    U2 = U.correct_boundary_conditions(ma, env={"phi": phi})
    vals = _pvals(ma, U2, "outlet")
    # outlet normal is +x: tangential (y) kept, normal from flux
    assert np.allclose(vals[:, 1], 2.0, rtol=1e-5)
    assert np.allclose(vals[:, 0], -1.5, rtol=1e-5)


def test_pressure_inlet_uniform_velocity(chan):
    ma = chan
    U = _field(ma, jnp.zeros((ma.n_cells, 3)),
               {"inlet": "pressureInletUniformVelocity"}, rank=(3,))
    phi = _mk_phi(ma, -2.5)
    U2 = U.correct_boundary_conditions(ma, env={"phi": phi})
    vals = _pvals(ma, U2, "inlet")
    # uniform over the patch, normal direction, mean speed 2.5 inward
    assert np.allclose(vals, vals[0], atol=1e-6)
    assert np.allclose(np.abs(vals[:, 0]), 2.5, rtol=1e-5)


def test_flux_corrected_velocity(chan):
    ma = chan
    data = jnp.tile(jnp.asarray([9.0, 1.5, 0.0]), (ma.n_cells, 1))
    U = _field(ma, data, {"outlet": "fluxCorrectedVelocity"}, rank=(3,))
    phi = _mk_phi(ma, 2.0)
    U2 = U.correct_boundary_conditions(ma, env={"phi": phi})
    vals = _pvals(ma, U2, "outlet")
    assert np.allclose(vals[:, 0], 2.0, rtol=1e-5)   # normal from flux
    assert np.allclose(vals[:, 1], 1.5, rtol=1e-5)   # tangential kept


def test_rotating_total_pressure(chan):
    ma = chan
    U = _vol(ma, jnp.asarray([1.0, 0.0, 0.0]), "U", rank=(3,))
    pf = _field(ma, jnp.zeros(ma.n_cells),
                {"outlet": "rotatingTotalPressure"},
                {"outlet": {"p0": jnp.asarray(10.0),
                            "axis": jnp.asarray([0.0, 0.0, 1.0]),
                            "omega": jnp.asarray(5.0),
                            "origin": jnp.zeros(3)}})
    phi = _mk_phi(ma, -1.0)   # inflow -> dynamic head subtracted
    p2 = pf.correct_boundary_conditions(ma, env={"phi": phi, "U": U})
    p = _patch(ma, "outlet")
    cf = np.asarray(ma.patch_cf(p))
    r = cf.copy(); r[:, 2] = 0.0
    om = np.asarray([0.0, 0.0, 5.0])
    u = np.asarray([1.0, 0.0, 0.0]) + np.cross(np.broadcast_to(om, r.shape), r)
    expect = 10.0 - 0.5 * (u * u).sum(1)
    assert np.allclose(_pvals(ma, p2, "outlet"), expect, rtol=1e-5)


# ---------------------------------------------------------------------------
# hydrostatic pressures
# ---------------------------------------------------------------------------

def test_uniform_density_hydrostatic(chan):
    ma = chan
    pf = _field(ma, jnp.zeros(ma.n_cells),
                {"top": "uniformDensityHydrostaticPressure"},
                {"top": {"rho": jnp.asarray(1000.0),
                         "pRefValue": jnp.asarray(1e5),
                         "pRefPoint": jnp.asarray([0.0, 0.4, 0.0])}})
    pf = pf.correct_boundary_conditions(ma)
    p = _patch(ma, "top")
    cf = np.asarray(ma.patch_cf(p))
    g = np.asarray([0.0, 0.0, -9.81])
    expect = 1e5 + 1000.0 * ((cf - np.asarray([0.0, 0.4, 0.0])) * g).sum(1)
    assert np.allclose(_pvals(ma, pf, "top"), expect, rtol=1e-6)


def test_phase_hydrostatic_blend(chan):
    ma = chan
    alpha = _vol(ma, 1.0, "alpha")
    pf = _field(ma, jnp.full(ma.n_cells, 7.0),
                {"top": "phaseHydrostaticPressure"},
                {"top": {"rho": jnp.asarray(1000.0),
                         "pRefValue": jnp.asarray(0.0),
                         "pRefPoint": jnp.zeros(3)}})
    env = {"alpha": alpha, "g": jnp.asarray([0.0, 0.0, -9.81])}
    p1 = pf.correct_boundary_conditions(ma, env=env)
    p = _patch(ma, "top")
    cf = np.asarray(ma.patch_cf(p))
    expect = 1000.0 * (cf * np.asarray([0.0, 0.0, -9.81])).sum(1)
    assert np.allclose(_pvals(ma, p1, "top"), expect, rtol=1e-5, atol=1e-8)
    # alpha=0 -> pure zeroGradient (interior value)
    alpha0 = _vol(ma, 0.0, "alpha")
    p2 = pf.correct_boundary_conditions(
        ma, env={"alpha": alpha0, "g": jnp.asarray([0.0, 0.0, -9.81])})
    assert np.allclose(_pvals(ma, p2, "top"), 7.0)


# ---------------------------------------------------------------------------
# misc inlets
# ---------------------------------------------------------------------------

def test_interstitial_inlet(chan):
    ma = chan
    alpha = _vol(ma, 0.5, "alpha")
    U = _field(ma, jnp.zeros((ma.n_cells, 3)),
               {"inlet": "interstitialInletVelocity"},
               {"inlet": {"inletVelocity": jnp.asarray([2.0, 0.0, 0.0])}},
               rank=(3,))
    U2 = U.correct_boundary_conditions(ma, env={"alpha": alpha})
    assert np.allclose(_pvals(ma, U2, "inlet")[:, 0], 4.0, rtol=1e-6)


def test_outlet_mapped_uniform_inlet(chan):
    ma = chan
    from rapidcfd_tpu.utils.dictionary import Dictionary
    pd = Dictionary({"type": "outletMappedUniformInlet",
                     "outletPatchName": "outlet"})
    T = _field(ma, jnp.linspace(0.0, 1.0, chan.n_cells),
               {"inlet": "outletMappedUniformInlet"},
               {"inlet_pd": pd})
    phi = _mk_phi(ma, 1.0)
    T2 = T.correct_boundary_conditions(ma, env={"phi": phi})
    # inlet value == flux-weighted mean of the outlet patch values
    out_vals = _pvals(ma, T, "outlet")
    p = _patch(ma, "outlet")
    phi_b = np.asarray(phi.data[p.start:p.start + p.size])
    expect = (phi_b * out_vals).sum() / phi_b.sum()
    assert np.allclose(_pvals(ma, T2, "inlet"), expect, rtol=1e-6)


def test_oscillating_fixed_value(chan):
    ma = chan
    f = _field(ma, jnp.zeros(ma.n_cells),
               {"inlet": "oscillatingFixedValue"},
               {"inlet": {"refValue": jnp.asarray(2.0),
                          "amplitude": jnp.asarray(0.5),
                          "frequency": jnp.asarray(1.0)}})
    f1 = f.correct_boundary_conditions(ma, env={"t": jnp.asarray(0.25)})
    assert np.allclose(_pvals(ma, f1, "inlet"), 2.0 * 1.5, rtol=1e-6)
    f2 = f.correct_boundary_conditions(ma, env={"t": jnp.asarray(0.75)})
    assert np.allclose(_pvals(ma, f2, "inlet"), 2.0 * 0.5, rtol=1e-6)


def test_turbulent_inlet_statistics(chan):
    ma = chan
    import jax
    ref = jnp.asarray([10.0, 0.0, 0.0])
    U = _field(ma, jnp.zeros((ma.n_cells, 3)),
               {"inlet": "turbulentInlet"},
               {"inlet": {"referenceField": ref,
                          "fluctuationScale": jnp.asarray(
                              [0.1, 0.05, 0.05]),
                          "alpha": jnp.asarray(1.0)}}, rank=(3,))
    U2 = U.correct_boundary_conditions(
        ma, env={"rng_key": jax.random.PRNGKey(7)})
    vals = _pvals(ma, U2, "inlet")
    # alpha=1: value = ref + rmsCorr*(rand-.5)*scale*|ref|; mean ~ ref
    assert abs(vals[:, 0].mean() - 10.0) < 1.5
    assert vals[:, 1].std() > 0.01  # fluctuations present
    # deterministic under the same key
    U3 = U.correct_boundary_conditions(
        ma, env={"rng_key": jax.random.PRNGKey(7)})
    assert np.allclose(vals, _pvals(ma, U3, "inlet"))


def test_uniform_inlet_outlet(chan):
    ma = chan
    f = _field(ma, jnp.full(ma.n_cells, 5.0),
               {"inlet": "uniformInletOutlet"},
               {"inlet": {"uniformInletValue": jnp.asarray(1.0)}})
    # +x velocity enters through xmin (outward normal -x): phi_b < 0
    fin = f.correct_boundary_conditions(ma, env={"phi": _mk_phi(ma, 1.0)})
    assert np.allclose(_pvals(ma, fin, "inlet"), 1.0)
    fout = f.correct_boundary_conditions(ma, env={"phi": _mk_phi(ma, -1.0)})
    assert np.allclose(_pvals(ma, fout, "inlet"), 5.0)


def test_variable_height_flow_rate_inlet(chan):
    ma = chan
    alpha = _vol(ma, 0.5, "alpha")
    U = _field(ma, jnp.zeros((ma.n_cells, 3)),
               {"inlet": "variableHeightFlowRateInletVelocity"},
               {"inlet": {"flowRate": jnp.asarray(0.04)}}, rank=(3,))
    U2 = U.correct_boundary_conditions(ma, env={"alpha": alpha})
    vals = _pvals(ma, U2, "inlet")
    p = _patch(ma, "inlet")
    mag_sf = np.asarray(ma.patch_mag_sf(p))
    # total inflow == flowRate * alpha-weighted... integral of U.(-n)*alpha
    n = np.asarray(ma.patch_normals(p))
    q = -((vals * n).sum(1) * mag_sf * 0.5).sum()
    assert np.isclose(q, 0.04 * 0.5, rtol=1e-5)


# ---------------------------------------------------------------------------
# supersonic freestream
# ---------------------------------------------------------------------------

def test_supersonic_freestream_branches(chan):
    ma = chan
    u_inf = jnp.asarray([700.0, 0.0, 0.0])
    U = _field(ma, jnp.tile(jnp.asarray([650.0, 10.0, 0.0]),
                            (ma.n_cells, 1)),
               {"outlet": "supersonicFreestream"},
               {"outlet": {"UInf": u_inf, "pInf": jnp.asarray(1e5),
                           "TInf": jnp.asarray(300.0),
                           "gamma": jnp.asarray(1.4)}}, rank=(3,))
    psi = _vol(ma, 1.0 / (287.0 * 300.0), "psi")
    T = _vol(ma, 300.0, "T")
    # p == pInf: outflow branch; Mach(p) == MachInf so the expansion
    # term vanishes and U collapses to the tangential interior component
    # (reference :235-244: Up = Ut + fpp*nHatInf with fpp == 0 here)
    p_eq = _vol(ma, 1e5, "p")
    U1 = U.correct_boundary_conditions(
        ma, env={"p": p_eq, "psi": psi, "T": T})
    vals = _pvals(ma, U1, "outlet")
    assert np.isfinite(vals).all()
    assert np.allclose(vals, np.asarray([0.0, 10.0, 0.0]), atol=1e-3)
    # p > pInf with a TILTED freestream (UInf not parallel to the patch
    # normal, else nHatInf degenerates): the expansion term appears
    U_tilt = _field(ma, jnp.tile(jnp.asarray([650.0, 10.0, 0.0]),
                                 (ma.n_cells, 1)),
                    {"outlet": "supersonicFreestream"},
                    {"outlet": {"UInf": jnp.asarray([600.0, 350.0, 0.0]),
                                "pInf": jnp.asarray(1e5),
                                "TInf": jnp.asarray(300.0),
                                "gamma": jnp.asarray(1.4)}}, rank=(3,))
    p_hi = _vol(ma, 2e5, "p")
    U1b = U_tilt.correct_boundary_conditions(
        ma, env={"p": p_hi, "psi": psi, "T": T})
    vb = _pvals(ma, U1b, "outlet")
    assert np.isfinite(vb).all()
    # differs from the pure-tangential carry-through
    assert np.abs(vb - np.asarray([0.0, 10.0, 0.0])).max() > 0.5
    # p < pInf and interior subsonic -> carry-through of interior
    U_sub = _field(ma, jnp.tile(jnp.asarray([100.0, 0.0, 0.0]),
                                (ma.n_cells, 1)),
                   {"outlet": "supersonicFreestream"},
                   {"outlet": {"UInf": u_inf, "pInf": jnp.asarray(1e5),
                               "TInf": jnp.asarray(300.0),
                               "gamma": jnp.asarray(1.4)}}, rank=(3,))
    p_low = _vol(ma, 0.5e5, "p")
    U2 = U_sub.correct_boundary_conditions(
        ma, env={"p": p_low, "psi": psi, "T": T})
    assert np.allclose(_pvals(ma, U2, "outlet"),
                       np.asarray([100.0, 0.0, 0.0]), atol=1e-3)


# ---------------------------------------------------------------------------
# syringe pressure
# ---------------------------------------------------------------------------

def test_syringe_pressure_schedule(chan):
    ma = chan
    bd = {"Ap": jnp.asarray(1e-4), "Sp": jnp.asarray(0.1),
          "VsI": jnp.asarray(1e-6), "tas": jnp.asarray(0.0),
          "tae": jnp.asarray(0.1), "tds": jnp.asarray(0.2),
          "tde": jnp.asarray(0.3), "psI": jnp.asarray(1e5),
          "psi": jnp.asarray(1e-5), "ams": jnp.asarray(0.0)}
    f = _field(ma, jnp.zeros(ma.n_cells), {"inlet": "syringePressure"},
               {"inlet": bd})
    f1 = f.correct_boundary_conditions(ma, env={"t": jnp.asarray(0.0)})
    # at t=0: ps = psI*VsI/VsI = psI
    assert np.allclose(_pvals(ma, f1, "inlet"), 1e5, rtol=1e-6)
    # mid-acceleration: Vs grows -> pressure drops
    f2 = f.correct_boundary_conditions(ma, env={"t": jnp.asarray(0.05)})
    assert (_pvals(ma, f2, "inlet") < 1e5).all()
    # accumulate injected mass raises pressure
    phi = _mk_phi(ma, -0.01)
    f3 = advance_syringe_state(ma, f1, phi, jnp.asarray(0.01))
    bd3 = f3.bcdata[[b.patch for b in f3.bcs][
        [p.name for p in ma.patches].index("inlet")]]
    assert float(bd3["ams"]) != 0.0


# ---------------------------------------------------------------------------
# fixedInternalValue (matrix manipulation)
# ---------------------------------------------------------------------------

def test_fixed_internal_value_matrix(chan):
    ma = chan
    from rapidcfd_tpu.ops import fvm
    f = _field(ma, jnp.zeros(ma.n_cells), {"inlet": "fixedInternalValue"})
    # impose 3.0 at the inlet-adjacent cells through bvalues
    p = _patch(ma, "inlet")
    f = f.replace(bvalues=f.bvalues.at[
        p.bstart:p.bstart + p.size].set(3.0))
    m = fvm.laplacian(ma, 1.0, f)
    m = manipulate_matrix_bcs(ma, m)
    # dense solve: the fixed cells land exactly at 3.0
    n = ma.n_cells
    diag, src = m.component_system(ma, None)
    A = np.zeros((n, n))
    A[np.arange(n), np.arange(n)] = np.asarray(diag)
    own = np.asarray(ma.owner[:ma.n_internal])
    nei = np.asarray(ma.neighbour)
    np.add.at(A, (own, nei), np.asarray(m.upper))
    np.add.at(A, (nei, own), np.asarray(m.lower))
    sol = np.linalg.solve(A, np.asarray(src))
    cells = np.asarray(ma.patch_face_cells(p))
    assert np.allclose(sol[cells], 3.0, atol=1e-8)


def test_external_coupled_mixed(chan):
    ma = chan
    f = _field(ma, jnp.full(ma.n_cells, 2.0),
               {"inlet": "externalCoupledMixed"},
               {"inlet": {"refValue": jnp.asarray(5.0),
                          "refGradient": jnp.asarray(0.0),
                          "valueFraction": jnp.asarray(1.0)}})
    assert np.allclose(_pvals(ma, f, "inlet"), 5.0)
    # no stored coefficients -> zeroGradient behaviour
    f0 = _field(ma, jnp.full(ma.n_cells, 2.0),
                {"inlet": "externalCoupledMixed"})
    assert np.allclose(_pvals(ma, f0, "inlet"), 2.0)


def test_fixed_normal_inlet_outlet_velocity(chan):
    ma = chan
    data = jnp.tile(jnp.asarray([0.3, 1.2, 0.0]), (ma.n_cells, 1))
    U = _field(ma, data, {"outlet": "fixedNormalInletOutletVelocity"},
               {"outlet": {"normalVelocity":
                           jnp.asarray([2.0, 0.0, 0.0])}}, rank=(3,))
    # outflow: normal fixed, tangential zero-gradient
    U1 = U.correct_boundary_conditions(ma, env={"phi": _mk_phi(ma, 1.0)})
    vals = _pvals(ma, U1, "outlet")
    assert np.allclose(vals[:, 0], 2.0, rtol=1e-6)
    assert np.allclose(vals[:, 1], 1.2, rtol=1e-6)
    # inflow: tangential fixed at zero
    U2 = U.correct_boundary_conditions(ma, env={"phi": _mk_phi(ma, -1.0)})
    vals = _pvals(ma, U2, "outlet")
    assert np.allclose(vals[:, 0], 2.0, rtol=1e-6)
    assert np.allclose(vals[:, 1], 0.0, atol=1e-8)
