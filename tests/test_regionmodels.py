"""regionModels starter: thermal baffle (1-D conduction shell) +
kinematic single-layer surface film (reference:
src/regionModels/{thermalBaffleModels,surfaceFilmModels}).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from rapidcfd_tpu.models import thermalbaffle as tb
from rapidcfd_tpu.models import surfacefilm as sf
from rapidcfd_tpu.mesh import build_mesh_arrays
from rapidcfd_tpu.utils.casegen import box_mesh


def test_baffle_steady_matches_series_resistance():
    cfg = tb.BaffleConfig(thickness=0.01, kappa=0.5, rho=2000.0,
                          cp=800.0, n_layers=12)
    n = 7
    T = tb.init_state(cfg, n, t0=300.0)
    T_a = jnp.full(n, 400.0)
    T_b = jnp.full(n, 300.0)
    h_a = jnp.full(n, 50.0)
    h_b = jnp.full(n, 20.0)
    dt = 5.0
    for _ in range(4000):
        T, tsa, tsb = tb.advance(cfg, T, T_a, h_a, T_b, h_b, dt)
    want_a, want_b = tb.steady_resistance_temps(cfg, T_a, h_a, T_b, h_b)
    np.testing.assert_allclose(np.asarray(tsa), np.asarray(want_a),
                               rtol=2e-3)
    np.testing.assert_allclose(np.asarray(tsb), np.asarray(want_b),
                               rtol=2e-3)
    # interior profile is monotone between the surface temperatures
    Tn = np.asarray(T)
    assert (np.diff(Tn, axis=1) <= 1e-9).all()


def test_baffle_energy_bounded_transient():
    cfg = tb.BaffleConfig(thickness=0.02, kappa=1.0, n_layers=8)
    T = tb.init_state(cfg, 3, t0=350.0)
    T_a = jnp.full(3, 400.0)
    T_b = jnp.full(3, 300.0)
    h = jnp.full(3, 100.0)
    for _ in range(50):
        T, tsa, tsb = tb.advance(cfg, T, T_a, h, T_b, h, 0.5)
        Tn = np.asarray(T)
        assert Tn.min() >= 300.0 - 1e-9 and Tn.max() <= 400.0 + 1e-9


def test_thermal_baffle_bc_case(tmp_path):
    """Case-level thermalBaffle1D: two fluid channels separated by a
    thin conducting baffle (mappedWall pair); the wall temperatures
    bracket the series-resistance solution."""
    import os
    from rapidcfd_tpu.fields import read_vol_field
    from rapidcfd_tpu.mesh.polymesh import write_polymesh
    from rapidcfd_tpu.utils.casegen import write_field
    d = str(tmp_path)
    m = box_mesh(10, 4, 1, size=(1.0, 0.4, 0.1), patch_spec={
        "xmin": ("left", "patch"), "xmax": ("right", "patch"),
        "ymin": ("baffleA", "wall"), "ymax": ("baffleB", "wall"),
        "zmin": ("fb", "empty"), "zmax": ("fb", "empty")})
    write_polymesh(m, d)
    ma, pm, maps = build_mesh_arrays(m)
    write_field(d, "0", "T", "volScalarField", "[0 0 0 1 0 0 0]",
                "uniform 350", {
        "left": "        type fixedValue;\n        value uniform 350;\n",
        "right": "        type zeroGradient;\n",
        "baffleA": ("        type thermalBaffle1D;\n"
                    "        sampleMode nearestPatchFace;\n"
                    "        samplePatch baffleB;\n"
                    "        offset (0 0.4 0);\n"
                    "        thickness 0.01;\n"
                    "        kappa 0.2;\n"
                    "        value uniform 350;\n"),
        "baffleB": "        type fixedValue;\n        value uniform 300;\n",
        "fb": "        type empty;\n"})
    T = read_vol_field(d, "0", "T", ma, maps)
    pA = next(p for p in ma.patches if p.name == "baffleA")
    tb_vals = np.asarray(T.bvalues[pA.bstart:pA.bstart + pA.size])
    # baffle surface between the hot fluid (350) and the mapped cold
    # side's near-wall cells (300): G = 20 W/m2K vs fallback h = G ->
    # midpoint 325
    assert (tb_vals > 300.0).all() and (tb_vals < 350.0).all()
    np.testing.assert_allclose(tb_vals, 325.0, atol=5.0)


@pytest.fixture(scope="module")
def film_setup():
    m = box_mesh(12, 6, 4, size=(1.2, 0.6, 0.4), patch_spec={
        "xmin": ("side", "wall"), "xmax": ("side", "wall"),
        "ymin": ("floor", "wall"), "ymax": ("top", "patch"),
        "zmin": ("side2", "wall"), "zmax": ("side2", "wall")})
    ma, pm, maps = build_mesh_arrays(m)
    patch = next(p for p in ma.patches if p.name == "floor")
    fm = sf.build_film_mesh(pm, ma, patch)
    return fm


def test_film_mesh_topology(film_setup):
    fm = film_setup
    assert fm.n_cells == 12 * 4
    # interior edges of a 12x4 quad grid: 11*4 + 12*3 = 80
    assert fm.edge_own.shape[0] == 11 * 4 + 12 * 3
    # edge normals are in the wall plane
    dot = np.asarray((fm.edge_norm
                      * 0.5 * (fm.normal[fm.edge_own]
                               + fm.normal[fm.edge_nei])).sum(1))
    np.testing.assert_allclose(dot, 0.0, atol=1e-12)


def test_film_mass_conservation_and_spread(film_setup):
    fm = film_setup
    cfg = sf.FilmConfig(rho=1000.0, nu=1e-6)
    state = sf.init_state(fm)
    # blob of film in one corner, gravity tilted along +x
    c = np.asarray(fm.centre)
    blob = ((c[:, 0] < 0.3) & (c[:, 2] < 0.2)).astype(float) * 1e-3
    state = {"delta": jnp.asarray(blob), "Uf": state["Uf"]}
    g = jnp.asarray([2.0, -9.81, 0.0])
    m0 = float(sf.film_mass(cfg, fm, state))
    for _ in range(200):
        state = sf.advance(cfg, fm, state, g, 1e-3)
    m1 = float(sf.film_mass(cfg, fm, state))
    assert m1 == pytest.approx(m0, rel=1e-10)   # closed patch: exact
    d = np.asarray(state["delta"])
    assert np.isfinite(d).all() and d.min() >= 0.0
    # film spread downslope (+x): centroid moved right
    x0 = (blob * c[:, 0]).sum() / blob.sum()
    x1 = (d * c[:, 0]).sum() / max(d.sum(), 1e-30)
    assert x1 > x0 + 0.01


def test_film_injection_adds_mass(film_setup):
    fm = film_setup
    cfg = sf.FilmConfig()
    state = sf.init_state(fm)
    s = jnp.full(fm.n_cells, 0.05)    # kg/m2/s everywhere
    area = float(np.asarray(fm.area).sum())
    for _ in range(10):
        state = sf.advance(cfg, fm, state, jnp.asarray([0., -9.81, 0.]),
                           1e-2, s_mass=s)
    m = float(sf.film_mass(cfg, fm, state))
    assert m == pytest.approx(0.05 * area * 0.1, rel=1e-9)
