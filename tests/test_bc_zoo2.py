"""Round-2 BC zoo: wedge axisymmetry, non-reflecting outlets, turbulence
inlets, wall-velocity variants, generic carry-through, time tables.

Reference parity targets:
- constraint/wedge (wedgeFvPatchField.C, wedgePolyPatch.C)
- derived/advective + waveTransmissive (advectiveFvPatchField.C:217-290)
- derived/turbulent{IntensityKineticEnergy,MixingLength*}Inlet
- derived/{rotating,translating}WallVelocity, cylindricalInletVelocity,
  swirlFlowRateInletVelocity, partialSlip, fixedNormalSlip, fixedMean,
  atmBoundaryLayerInlet*, externalWallHeatFluxTemperature
- genericPatchFields carry-through
- derived/timeVaryingMappedFixedValue (boundaryData reader)
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from rapidcfd_tpu.fields import read_vol_field, write_vol_field
from rapidcfd_tpu.fields.bcs import make_bc
from rapidcfd_tpu.fields.field import SurfaceField, VolField
from rapidcfd_tpu.mesh import build_mesh_arrays
from rapidcfd_tpu.ops import fvm
from rapidcfd_tpu.utils.casegen import (_write, box_mesh, wedge_mesh,
                                        write_field)
from rapidcfd_tpu.utils.dictionary import foamfile_header
from rapidcfd_tpu.utils.dimensions import dimless
from rapidcfd_tpu.mesh.polymesh import write_polymesh


@pytest.fixture(scope="module")
def wedge(tmp_path_factory):
    m = wedge_mesh(nx=6, nr=24, r0=0.5, r1=1.5)
    ma, pm, maps = build_mesh_arrays(m)
    return ma, maps


@pytest.fixture(scope="module")
def chan(tmp_path_factory):
    m = box_mesh(8, 4, 1, size=(0.8, 0.4, 0.1), patch_spec={
        "xmin": ("inlet", "patch"), "xmax": ("outlet", "patch"),
        "ymin": ("wall", "wall"), "ymax": ("top", "patch"),
        "zmin": ("fb", "empty"), "zmax": ("fb", "empty")})
    ma, pm, maps = build_mesh_arrays(m)
    return ma, maps


def _field(ma, data, bc_words, bcdata=None, rank=()):
    bcs, bds = [], []
    for i, p in enumerate(ma.patches):
        w = bc_words.get(p.name, "zeroGradient")
        bcs.append(make_bc(w, i))
        bds.append((bcdata or {}).get(p.name, {}))
    bv = jnp.zeros((ma.n_boundary,) + rank, ma.C.dtype)
    f = VolField(data, bv, tuple(bcs), dimless, "psi", tuple(bds))
    return f.correct_boundary_conditions(ma)


def _patch(ma, name):
    return next(p for p in ma.patches if p.name == name)


# ---------------------------------------------------------------------------
# wedge
# ---------------------------------------------------------------------------

def test_wedge_annulus_conduction(wedge):
    """laplacian(T)=0 on an axisymmetric annulus -> T = ln(r/r0)/ln(r1/r0).
    The wedge geometry (converging face areas) is what makes the radial
    profile logarithmic rather than linear."""
    ma, maps = wedge
    T = _field(ma, jnp.zeros(ma.n_cells), {
        "inner": "fixedValue", "outer": "fixedValue",
        "front": "wedge", "back": "wedge"},
        {"inner": {"value": jnp.zeros(1)},
         "outer": {"value": jnp.ones(1)}})
    m = fvm.laplacian(ma, 1.0, T)
    n = ma.n_cells
    diag, src = m.component_system(ma, None)
    A = np.zeros((n, n))
    A[np.arange(n), np.arange(n)] = np.asarray(diag)
    own = np.asarray(ma.owner[:ma.n_internal])
    nei = np.asarray(ma.neighbour)
    np.add.at(A, (own, nei), np.asarray(m.upper))
    np.add.at(A, (nei, own), np.asarray(m.lower))
    sol = np.linalg.solve(A, np.asarray(src))
    C = np.asarray(ma.C)
    r = np.sqrt(C[:, 1] ** 2 + C[:, 2] ** 2)
    exact = np.log(r / 0.5) / np.log(1.5 / 0.5)
    assert np.abs(sol - exact).max() < 2e-3


def test_wedge_vector_transform(wedge):
    """Vector values on a wedge patch are the cell values rotated onto
    the patch plane; magnitude preserved, axial component unchanged."""
    ma, maps = wedge
    U = jnp.tile(jnp.asarray([1.0, 2.0, 0.0]), (ma.n_cells, 1))
    f = _field(ma, U, {"front": "wedge", "back": "wedge"}, rank=(3,))
    p = _patch(ma, "front")
    vals = np.asarray(f.bvalues[p.bstart:p.bstart + p.size])
    # magnitude preserved by rotation
    assert np.allclose(np.linalg.norm(vals, axis=1),
                       np.sqrt(5.0), atol=1e-6)
    # x (axis) component unchanged, z component now nonzero (rotated by
    # the half-wedge angle 2.5 deg)
    assert np.allclose(vals[:, 0], 1.0, atol=1e-6)
    th = np.deg2rad(2.5)
    assert np.allclose(vals[:, 2], -2.0 * np.sin(th), atol=1e-6) or \
        np.allclose(vals[:, 2], 2.0 * np.sin(th), atol=1e-6)


# ---------------------------------------------------------------------------
# non-reflecting outlets
# ---------------------------------------------------------------------------

def test_advective_update(chan):
    ma, maps = chan
    data = jnp.full(ma.n_cells, 2.0)
    f = _field(ma, data, {"outlet": "advective"})
    f = f.store_old()
    p = _patch(ma, "outlet")
    phi = SurfaceField(jnp.ones(ma.n_faces) * 0.02, dimless, "phi")
    dt = 0.1
    env = {"phi": phi, "dt": jnp.asarray(dt)}
    f2 = f.correct_boundary_conditions(ma, env=env)
    vals = np.asarray(f2.bvalues[p.bstart:p.bstart + p.size])
    w = 0.02 / np.asarray(ma.patch_mag_sf(p))
    alpha = w * dt * np.asarray(ma.patch_delta_coeffs(p))
    old_b = np.asarray(f.bvalues[p.bstart:p.bstart + p.size])
    expect = (old_b + alpha * 2.0) / (1.0 + alpha)
    assert np.allclose(vals, expect, atol=1e-7)


def test_wave_transmissive_speed(chan):
    """waveTransmissive adds the acoustic speed sqrt(gamma/psi)."""
    ma, maps = chan
    data = jnp.full(ma.n_cells, 1.0)
    psi = _field(ma, jnp.full(ma.n_cells, 1.0 / (1.4 * 287.0 * 300.0)),
                 {})
    f = _field(ma, data, {"outlet": "waveTransmissive"},
               {"outlet": {"gamma": jnp.asarray(1.4)}})
    f = f.store_old()
    p = _patch(ma, "outlet")
    phi = SurfaceField(jnp.zeros(ma.n_faces), dimless, "phi")
    env = {"phi": phi, "dt": jnp.asarray(1e-3), "psi": psi}
    f2 = f.correct_boundary_conditions(ma, env=env)
    vals = np.asarray(f2.bvalues[p.bstart:p.bstart + p.size])
    c = np.sqrt(1.4 * 1.4 * 287.0 * 300.0)  # sqrt(gamma/psi)
    alpha = c * 1e-3 * np.asarray(ma.patch_delta_coeffs(p))
    expect = (1.0 + alpha * 1.0) / (1.0 + alpha)
    assert np.allclose(vals, expect, atol=1e-7)


# ---------------------------------------------------------------------------
# turbulence inlets
# ---------------------------------------------------------------------------

def test_turbulent_intensity_k_inlet(chan):
    ma, maps = chan
    p = _patch(ma, "inlet")
    Udata = jnp.tile(jnp.asarray([4.0, 0.0, 0.0]), (ma.n_cells, 1))
    U = _field(ma, Udata, {}, rank=(3,))
    U = U.replace(bvalues=jnp.tile(jnp.asarray([4.0, 0.0, 0.0]),
                                   (ma.n_boundary, 1)))
    k = _field(ma, jnp.full(ma.n_cells, 0.1),
               {"inlet": "turbulentIntensityKineticEnergyInlet"},
               {"inlet": {"intensity": jnp.asarray(0.05)}})
    phi = SurfaceField(-jnp.ones(ma.n_faces), dimless, "phi")  # inflow
    k2 = k.correct_boundary_conditions(ma, env={"U": U, "phi": phi})
    vals = np.asarray(k2.bvalues[p.bstart:p.bstart + p.size])
    assert np.allclose(vals, 1.5 * (0.05 * 4.0) ** 2, atol=1e-8)


def test_turbulent_mixing_length_inlets(chan):
    ma, maps = chan
    p = _patch(ma, "inlet")
    k = _field(ma, jnp.full(ma.n_cells, 0.06), {})
    k = k.replace(bvalues=jnp.full(ma.n_boundary, 0.06))
    phi = SurfaceField(-jnp.ones(ma.n_faces), dimless, "phi")
    eps = _field(ma, jnp.full(ma.n_cells, 1.0),
                 {"inlet": "turbulentMixingLengthDissipationRateInlet"},
                 {"inlet": {"mixingLength": jnp.asarray(0.02)}})
    eps2 = eps.correct_boundary_conditions(ma, env={"k": k, "phi": phi})
    ve = np.asarray(eps2.bvalues[p.bstart:p.bstart + p.size])
    assert np.allclose(ve, 0.09 ** 0.75 * 0.06 ** 1.5 / 0.02, atol=1e-8)
    om = _field(ma, jnp.full(ma.n_cells, 1.0),
                {"inlet": "turbulentMixingLengthFrequencyInlet"},
                {"inlet": {"mixingLength": jnp.asarray(0.02)}})
    om2 = om.correct_boundary_conditions(ma, env={"k": k, "phi": phi})
    vo = np.asarray(om2.bvalues[p.bstart:p.bstart + p.size])
    assert np.allclose(vo, np.sqrt(0.06) / (0.09 ** 0.25 * 0.02),
                       atol=1e-8)


# ---------------------------------------------------------------------------
# wall-velocity variants + inlets
# ---------------------------------------------------------------------------

def test_rotating_wall_velocity(chan):
    ma, maps = chan
    p = _patch(ma, "wall")
    U = _field(ma, jnp.zeros((ma.n_cells, 3)),
               {"wall": "rotatingWallVelocity"},
               {"wall": {"origin": jnp.asarray([0.0, 0.0, 0.0]),
                         "axis": jnp.asarray([0.0, 0.0, 1.0]),
                         "omega": jnp.asarray(2.0)}}, rank=(3,))
    vals = np.asarray(U.bvalues[p.bstart:p.bstart + p.size])
    cf = np.asarray(ma.patch_cf(p))
    expect = np.cross(np.asarray([0.0, 0.0, 2.0]), cf)
    n = np.asarray(ma.patch_normals(p))
    expect -= n * (expect * n).sum(-1, keepdims=True)
    assert np.allclose(vals, expect, atol=1e-7)


def test_translating_wall_and_partial_slip(chan):
    ma, maps = chan
    p = _patch(ma, "wall")
    U = _field(ma, jnp.zeros((ma.n_cells, 3)),
               {"wall": "translatingWallVelocity"},
               {"wall": {"U": jnp.asarray([3.0, 1.0, 0.0])}}, rank=(3,))
    vals = np.asarray(U.bvalues[p.bstart:p.bstart + p.size])
    # wall normal is -y: normal component removed
    assert np.allclose(vals, [3.0, 0.0, 0.0], atol=1e-7)

    Udata = jnp.tile(jnp.asarray([2.0, -1.0, 0.0]), (ma.n_cells, 1))
    Ups = _field(ma, Udata, {"wall": "partialSlip"},
                 {"wall": {"valueFraction": jnp.full(p.size, 0.25)}},
                 rank=(3,))
    vals = np.asarray(Ups.bvalues[p.bstart:p.bstart + p.size])
    # tangential (1-f)*U_t = 0.75*2.0, normal removed
    assert np.allclose(vals[:, 0], 1.5, atol=1e-7)
    assert np.allclose(vals[:, 1], 0.0, atol=1e-7)


def test_cylindrical_and_swirl_inlets(chan):
    ma, maps = chan
    p = _patch(ma, "inlet")
    U = _field(ma, jnp.zeros((ma.n_cells, 3)),
               {"inlet": "cylindricalInletVelocity"},
               {"inlet": {"origin": jnp.asarray([0.0, 0.0, 0.0]),
                          "axis": jnp.asarray([1.0, 0.0, 0.0]),
                          "axialVelocity": jnp.asarray(5.0),
                          "radialVelocity": jnp.asarray(0.0),
                          "rpm": jnp.asarray(0.0)}}, rank=(3,))
    vals = np.asarray(U.bvalues[p.bstart:p.bstart + p.size])
    assert np.allclose(vals, [5.0, 0.0, 0.0], atol=1e-7)

    q = 1e-3
    Us = _field(ma, jnp.zeros((ma.n_cells, 3)),
                {"inlet": "swirlFlowRateInletVelocity"},
                {"inlet": {"flowRate": jnp.asarray(q),
                           "rpm": jnp.asarray(0.0)}}, rank=(3,))
    vals = np.asarray(Us.bvalues[p.bstart:p.bstart + p.size])
    area = float(np.asarray(ma.patch_mag_sf(p)).sum())
    # inlet normal is -x; -n q/A = +x q/A
    assert np.allclose(vals[:, 0], q / area, atol=1e-9)


def test_fixed_mean_and_fixed_normal_slip(chan):
    ma, maps = chan
    p = _patch(ma, "outlet")
    data = jnp.asarray(np.linspace(0.0, 1.0, ma.n_cells))
    f = _field(ma, data, {"outlet": "fixedMean"},
               {"outlet": {"meanValue": jnp.asarray(10.0)}})
    vals = np.asarray(f.bvalues[p.bstart:p.bstart + p.size])
    w = np.asarray(ma.patch_mag_sf(p))
    assert abs((vals * w).sum() / w.sum() - 10.0) < 1e-6

    Un = _field(ma, jnp.tile(jnp.asarray([1.0, 2.0, 0.0]),
                             (ma.n_cells, 1)),
                {"top": "fixedNormalSlip"},
                {"top": {"fixedValue": jnp.asarray([0.0, 7.0, 0.0])}},
                rank=(3,))
    pt = _patch(ma, "top")
    vals = np.asarray(Un.bvalues[pt.bstart:pt.bstart + pt.size])
    # top normal = +y: tangential from interior (x: 1), normal fixed (7)
    assert np.allclose(vals[:, 0], 1.0, atol=1e-7)
    assert np.allclose(vals[:, 1], 7.0, atol=1e-7)


def test_abl_profiles(chan):
    ma, maps = chan
    p = _patch(ma, "inlet")
    bd = {"Uref": jnp.asarray(10.0), "Zref": jnp.asarray(0.35),
          "z0": jnp.asarray(0.01),
          "flowDir": jnp.asarray([1.0, 0.0, 0.0]),
          "zDir": jnp.asarray([0.0, 1.0, 0.0]),
          "zGround": jnp.asarray(0.0)}
    U = _field(ma, jnp.zeros((ma.n_cells, 3)),
               {"inlet": "atmBoundaryLayerInletVelocity"},
               {"inlet": bd}, rank=(3,))
    vals = np.asarray(U.bvalues[p.bstart:p.bstart + p.size])
    cf = np.asarray(ma.patch_cf(p))
    ustar = 0.41 * 10.0 / np.log((0.35 + 0.01) / 0.01)
    expect = ustar / 0.41 * np.log((cf[:, 1] + 0.01) / 0.01)
    assert np.allclose(vals[:, 0], expect, atol=1e-6)
    k = _field(ma, jnp.zeros(ma.n_cells),
               {"inlet": "atmBoundaryLayerInletK"}, {"inlet": bd})
    vk = np.asarray(k.bvalues[p.bstart:p.bstart + p.size])
    assert np.allclose(vk, ustar ** 2 / np.sqrt(0.09), atol=1e-6)


def test_external_wall_heat_flux(chan):
    """coefficient mode: equilibrium at kappa*dc*(T_w-T_c) = h*(Ta-T_w)."""
    ma, maps = chan
    p = _patch(ma, "wall")
    kappa = _field(ma, jnp.full(ma.n_cells, 2.0), {})
    kappa = kappa.replace(bvalues=jnp.full(ma.n_boundary, 2.0))
    T = _field(ma, jnp.full(ma.n_cells, 300.0), {})
    bd = {"h": jnp.asarray(50.0), "Ta": jnp.asarray(400.0)}
    from rapidcfd_tpu.fields.bcs import ExternalWallHeatFluxTemperature
    bc = ExternalWallHeatFluxTemperature(
        [pp.name for pp in ma.patches].index("wall"), "coefficient")
    vals = np.asarray(bc.evaluate(ma, p, T, bd, {"kappa": kappa}))
    dc = np.asarray(ma.patch_delta_coeffs(p))
    expect = (50.0 * 400.0 + 2.0 * dc * 300.0) / (50.0 + 2.0 * dc)
    assert np.allclose(vals, expect, rtol=1e-6)
    # flux mode: snGrad = q/kappa
    bcq = ExternalWallHeatFluxTemperature(bc.patch, "flux")
    vq = np.asarray(bcq.evaluate(ma, p, T, {"q": jnp.asarray(100.0)},
                                 {"kappa": kappa}))
    assert np.allclose((vq - 300.0) * dc, 100.0 / 2.0, rtol=1e-6)


# ---------------------------------------------------------------------------
# generic carry-through + file round trips
# ---------------------------------------------------------------------------

def test_generic_bc_roundtrip(tmp_path_factory, chan):
    ma, maps = chan
    d = str(tmp_path_factory.mktemp("generic"))
    os.makedirs(os.path.join(d, "0"))
    body = """
dimensions      [0 1 -1 0 0 0 0];
internalField   uniform 0;
boundaryField
{
    inlet  { type weirdFutureInlet; magicParam 3.5; value uniform 1.5; }
    outlet { type zeroGradient; }
    wall   { type fixedValue; value uniform 0; }
    top    { type zeroGradient; }
    fb     { type empty; }
}
"""
    with open(os.path.join(d, "0", "s"), "w") as f:
        f.write(foamfile_header("volScalarField", "s", "0") + body)
    f = read_vol_field(d, "0", "s", ma, maps)
    from rapidcfd_tpu.fields.bcs import Generic
    assert isinstance(f.bcs[0], Generic)
    assert f.bcs[0].word == "weirdFutureInlet"
    p = _patch(ma, "inlet")
    assert np.allclose(np.asarray(
        f.bvalues[p.bstart:p.bstart + p.size]), 1.5)
    write_vol_field(f, d, "1", ma, maps)
    text = open(os.path.join(d, "1", "s")).read()
    assert "weirdFutureInlet" in text
    assert "magicParam" in text
    f2 = read_vol_field(d, "1", "s", ma, maps)
    assert float(np.asarray(f2.bcdata[0]["magicParam"])) == 3.5


def test_time_table_uniform_fixed_value(tmp_path_factory, chan):
    ma, maps = chan
    d = str(tmp_path_factory.mktemp("table"))
    os.makedirs(os.path.join(d, "0"))
    body = """
dimensions      [0 1 -1 0 0 0 0];
internalField   uniform 0;
boundaryField
{
    inlet  { type uniformFixedValue;
             uniformValue table ((0 0) (1 10) (2 10)); }
    outlet { type zeroGradient; }
    wall   { type zeroGradient; }
    top    { type zeroGradient; }
    fb     { type empty; }
}
"""
    with open(os.path.join(d, "0", "s"), "w") as f:
        f.write(foamfile_header("volScalarField", "s", "0") + body)
    f = read_vol_field(d, "0", "s", ma, maps)
    p = _patch(ma, "inlet")
    f1 = f.correct_boundary_conditions(ma, env={"t": jnp.asarray(0.5)})
    assert np.allclose(np.asarray(
        f1.bvalues[p.bstart:p.bstart + p.size]), 5.0)
    f2 = f.correct_boundary_conditions(ma, env={"t": jnp.asarray(5.0)})
    assert np.allclose(np.asarray(
        f2.bvalues[p.bstart:p.bstart + p.size]), 10.0)  # clamped


def test_time_varying_mapped_fixed_value(tmp_path_factory, chan):
    ma, maps = chan
    d = str(tmp_path_factory.mktemp("tvm"))
    p = _patch(ma, "inlet")
    cf = np.asarray(ma.patch_cf(p))
    bdir = os.path.join(d, "constant", "boundaryData", "inlet")
    os.makedirs(os.path.join(bdir, "0"))
    os.makedirs(os.path.join(bdir, "1"))
    with open(os.path.join(bdir, "points"), "w") as f:
        f.write("(\n" + "\n".join(
            f"({x} {y} {z})" for x, y, z in cf) + "\n)\n")
    with open(os.path.join(bdir, "0", "s"), "w") as f:
        f.write("(\n" + "\n".join("0.0" for _ in cf) + "\n)\n")
    with open(os.path.join(bdir, "1", "s"), "w") as f:
        f.write("(\n" + "\n".join(f"{100.0 + i}" for i in
                                  range(len(cf))) + "\n)\n")
    os.makedirs(os.path.join(d, "0"))
    body = """
dimensions      [0 0 0 1 0 0 0];
internalField   uniform 0;
boundaryField
{
    inlet  { type timeVaryingMappedFixedValue; value uniform 0; }
    outlet { type zeroGradient; }
    wall   { type zeroGradient; }
    top    { type zeroGradient; }
    fb     { type empty; }
}
"""
    with open(os.path.join(d, "0", "s"), "w") as f:
        f.write(foamfile_header("volScalarField", "s", "0") + body)
    f = read_vol_field(d, "0", "s", ma, maps)
    fh = f.correct_boundary_conditions(ma, env={"t": jnp.asarray(0.5)})
    vals = np.asarray(fh.bvalues[p.bstart:p.bstart + p.size])
    assert np.allclose(vals, 0.5 * (100.0 + np.arange(len(cf))),
                       atol=1e-5)


def test_pressure_inlet_velocity(chan):
    ma, maps = chan
    p = _patch(ma, "inlet")
    phi = SurfaceField(jnp.full(ma.n_faces, -2e-3), dimless, "phi")
    U = _field(ma, jnp.zeros((ma.n_cells, 3)),
               {"inlet": "pressureInletVelocity"}, rank=(3,))
    U2 = U.correct_boundary_conditions(ma, env={"phi": phi})
    vals = np.asarray(U2.bvalues[p.bstart:p.bstart + p.size])
    msf = np.asarray(ma.patch_mag_sf(p))
    # n = -x; U = n*phi/|Sf| = (+2e-3/|Sf|, 0, 0)
    assert np.allclose(vals[:, 0], 2e-3 / msf, atol=1e-9)
