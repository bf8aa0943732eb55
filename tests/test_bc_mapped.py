"""mapped* fvPatchField family + directionMixed.

Reference parity targets:
- derived/mappedFixedValue, mappedField (mappedPatchFieldBase sampling +
  setAverage)
- derived/mappedVelocityFluxFixedValue (recycling inlet)
- derived/mappedFlowRate (flux-matched inlet)
- derived/mappedFixedInternalValue / mappedFixedPushedInternalValue
  (manipulateMatrix -> setValues of the patch face-cells)
- basic/directionMixed (tensor valueFraction)
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from rapidcfd_tpu.fields import read_vol_field
from rapidcfd_tpu.fields.bcs import make_bc
from rapidcfd_tpu.fields.field import SurfaceField, VolField
from rapidcfd_tpu.mesh import build_mesh_arrays
from rapidcfd_tpu.mesh.polymesh import write_polymesh
from rapidcfd_tpu.utils.casegen import box_mesh, write_field
from rapidcfd_tpu.utils.dimensions import DimensionSet, dimless


@pytest.fixture(scope="module")
def chan_case(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("mapped_chan"))
    m = box_mesh(8, 4, 1, size=(0.8, 0.4, 0.1), patch_spec={
        "xmin": ("inlet", "patch"), "xmax": ("outlet", "patch"),
        "ymin": ("wall", "wall"), "ymax": ("top", "patch"),
        "zmin": ("fb", "empty"), "zmax": ("fb", "empty")})
    write_polymesh(m, d)
    ma, pm, maps = build_mesh_arrays(m)
    return d, ma, maps


def _patch(ma, name):
    return next(p for p in ma.patches if p.name == name)


def test_mapped_fixed_value_nearest_cell(chan_case):
    d, ma, maps = chan_case
    # T on the outlet sampled from cells 0.25 upstream of the outlet face
    write_field(d, "0", "T", "volScalarField", "[0 0 0 1 0 0 0]",
                "nonuniform List<scalar> 32 (" +
                " ".join(str(10.0 + i) for i in range(32)) + ")", {
        "inlet": "        type fixedValue;\n        value uniform 10;\n",
        "outlet": ("        type mappedFixedValue;\n"
                   "        sampleMode nearestCell;\n"
                   "        offset (-0.25 0 0);\n"
                   "        value uniform 0;\n"),
        "wall": "        type zeroGradient;\n",
        "top": "        type zeroGradient;\n",
        "fb": "        type empty;\n"})
    T = read_vol_field(d, "0", "T", ma, maps)
    out = _patch(ma, "outlet")
    bvals = np.asarray(
        T.bvalues[out.bstart:out.bstart + out.size])
    # outlet face centres x=0.8; sample points at x=0.55 fall in the
    # x-column of cells centred at x=0.55 (cell column 5 of 8)
    cf = np.asarray(ma.patch_cf(out))
    C = np.asarray(ma.C)
    data = np.asarray(T.data)
    for j in range(out.size):
        sp = cf[j] + np.array([-0.25, 0.0, 0.0])
        nearest = np.argmin(((C - sp) ** 2).sum(1))
        assert bvals[j] == pytest.approx(data[nearest])


def test_mapped_velocity_flux_recycling(chan_case):
    d, ma, maps = chan_case
    write_field(d, "0", "U", "volVectorField", "[0 1 -1 0 0 0 0]",
                "nonuniform List<vector> 32 (" +
                " ".join(f"({1.0 + 0.1 * i} 0 0)" for i in range(32))
                + ")", {
        "inlet": ("        type mappedVelocityFluxFixedValue;\n"
                  "        sampleMode nearestPatchFace;\n"
                  "        samplePatch outlet;\n"
                  "        offset (0 0 0);\n"
                  "        value uniform (0 0 0);\n"),
        "outlet": "        type zeroGradient;\n",
        "wall": "        type fixedValue;\n        value uniform (0 0 0);\n",
        "top": "        type zeroGradient;\n",
        "fb": "        type empty;\n"})
    U = read_vol_field(d, "0", "U", ma, maps)
    # patch-evaluation order is a single snapshot pass: the mapped inlet
    # sees the outlet values of the PREVIOUS update (same one-update lag
    # as the reference's updateCoeffs ordering) — one more pass settles
    U = U.correct_boundary_conditions(ma)
    inp = _patch(ma, "inlet")
    outp = _patch(ma, "outlet")
    # recycling: inlet bvalues == outlet bvalues at the same y (the
    # nearest outlet face to inlet face j offset (0,0,0) is the one
    # with matching y — x distance is constant)
    bi = np.asarray(U.bvalues[inp.bstart:inp.bstart + inp.size])
    bo = np.asarray(U.bvalues[outp.bstart:outp.bstart + outp.size])
    ci = np.asarray(ma.patch_cf(inp))[:, 1]
    co = np.asarray(ma.patch_cf(outp))[:, 1]
    order = np.argsort(ci), np.argsort(co)
    np.testing.assert_allclose(bi[order[0]], bo[order[1]], rtol=1e-6)


def test_mapped_flow_rate(chan_case):
    d, ma, maps = chan_case
    write_field(d, "0", "U", "volVectorField", "[0 1 -1 0 0 0 0]",
                "uniform (2 0 0)", {
        "inlet": ("        type mappedFlowRate;\n"
                  "        sampleMode nearestPatchFace;\n"
                  "        samplePatch outlet;\n"
                  "        offset (0 0 0);\n"
                  "        value uniform (0 0 0);\n"),
        "outlet": "        type zeroGradient;\n",
        "wall": "        type fixedValue;\n        value uniform (0 0 0);\n",
        "top": "        type zeroGradient;\n",
        "fb": "        type empty;\n"})
    U = read_vol_field(d, "0", "U", ma, maps)
    # volumetric phi with 3 m/s outflow at the outlet
    inp = _patch(ma, "inlet")
    outp = _patch(ma, "outlet")
    phi_data = jnp.zeros(ma.mag_sf.shape, ma.mag_sf.dtype)
    sf = np.asarray(ma.Sf)
    phi_np = np.zeros(ma.mag_sf.shape)
    phi_np[outp.start:outp.start + outp.size] = \
        3.0 * sf[outp.start:outp.start + outp.size, 0]
    phi = SurfaceField(jnp.asarray(phi_np), DimensionSet.of(0, 3, -1),
                       "phi")
    U2 = U.correct_boundary_conditions(ma, env={"phi": phi})
    bi = np.asarray(U2.bvalues[inp.bstart:inp.bstart + inp.size])
    # inlet normal is (-1,0,0); U = -n*phi/magSf = +3 in x
    np.testing.assert_allclose(bi[:, 0], 3.0, rtol=1e-6)
    np.testing.assert_allclose(bi[:, 1:], 0.0, atol=1e-9)


def test_mapped_pushed_internal_value(chan_case):
    d, ma, maps = chan_case
    write_field(d, "0", "Tb", "volScalarField", "[0 0 0 1 0 0 0]",
                "nonuniform List<scalar> 32 (" +
                " ".join(str(2.0 * i) for i in range(32)) + ")", {
        "inlet": "        type fixedValue;\n        value uniform 7;\n",
        "outlet": ("        type mappedFixedPushedInternalValue;\n"
                   "        sampleMode nearestPatchFace;\n"
                   "        samplePatch inlet;\n"
                   "        offset (0 0 0);\n"
                   "        value uniform 0;\n"),
        "wall": "        type zeroGradient;\n",
        "top": "        type zeroGradient;\n",
        "fb": "        type empty;\n"})
    T = read_vol_field(d, "0", "Tb", ma, maps)
    outp = _patch(ma, "outlet")
    bc = T.bcs[[i for i, p in enumerate(ma.patches)
                if p.name == "outlet"][0]]
    bd = T.bcdata[bc.patch]
    # boundary value == mapped (inlet fixedValue 7)
    np.testing.assert_allclose(
        np.asarray(T.bvalues[outp.bstart:outp.bstart + outp.size]),
        7.0, rtol=1e-6)
    # pushed: internal pin values == the same mapped boundary values
    from rapidcfd_tpu.fields.bcs_mapped import internal_pin_values
    pv = internal_pin_values(bc, ma, outp, T, bd)
    np.testing.assert_allclose(np.asarray(pv), 7.0, rtol=1e-6)


def test_mapped_fixed_internal_value(chan_case):
    d, ma, maps = chan_case
    write_field(d, "0", "Tc", "volScalarField", "[0 0 0 1 0 0 0]",
                "nonuniform List<scalar> 32 (" +
                " ".join(str(2.0 * i) for i in range(32)) + ")", {
        "inlet": "        type fixedValue;\n        value uniform 7;\n",
        "outlet": ("        type mappedFixedInternalValue;\n"
                   "        sampleMode nearestPatchFace;\n"
                   "        samplePatch inlet;\n"
                   "        offset (0 0 0);\n"
                   "        value uniform 0;\n"),
        "wall": "        type zeroGradient;\n",
        "top": "        type zeroGradient;\n",
        "fb": "        type empty;\n"})
    T = read_vol_field(d, "0", "Tc", ma, maps)
    outp = _patch(ma, "outlet")
    bc = T.bcs[[i for i, p in enumerate(ma.patches)
                if p.name == "outlet"][0]]
    bd = T.bcdata[bc.patch]
    # internal pin values == the SAMPLE patch's adjacent-cell values
    from rapidcfd_tpu.fields.bcs_mapped import internal_pin_values
    pv = internal_pin_values(bc, ma, outp, T, bd)
    inp = _patch(ma, "inlet")
    own_in = np.asarray(ma.owner[inp.start:inp.start + inp.size])
    np.testing.assert_allclose(np.sort(np.asarray(pv)),
                               np.sort(np.asarray(T.data)[own_in]),
                               rtol=1e-6)


def test_direction_mixed_limits(chan_case):
    d, ma, maps = chan_case
    # valueFraction = I: behaves as fixedValue(refValue)
    write_field(d, "0", "Ud", "volVectorField", "[0 1 -1 0 0 0 0]",
                "uniform (5 1 0)", {
        "inlet": ("        type directionMixed;\n"
                  "        refValue uniform (9 8 7);\n"
                  "        refGradient uniform (0 0 0);\n"
                  "        valueFraction uniform (1 0 0 1 0 1);\n"
                  "        value uniform (0 0 0);\n"),
        "outlet": ("        type directionMixed;\n"
                   "        refValue uniform (9 8 7);\n"
                   "        refGradient uniform (0 0 0);\n"
                   "        valueFraction uniform (0 0 0 0 0 0);\n"
                   "        value uniform (0 0 0);\n"),
        "wall": "        type zeroGradient;\n",
        "top": "        type zeroGradient;\n",
        "fb": "        type empty;\n"})
    U = read_vol_field(d, "0", "Ud", ma, maps)
    inp = _patch(ma, "inlet")
    outp = _patch(ma, "outlet")
    bi = np.asarray(U.bvalues[inp.bstart:inp.bstart + inp.size])
    np.testing.assert_allclose(bi, np.broadcast_to([9.0, 8.0, 7.0],
                                                   bi.shape), rtol=1e-6)
    # f=0: pure zero-gradient -> boundary == internal
    bo = np.asarray(U.bvalues[outp.bstart:outp.bstart + outp.size])
    np.testing.assert_allclose(
        bo, np.asarray(U.patch_internal(ma, outp)), rtol=1e-6)


def test_direction_mixed_partial(chan_case):
    d, ma, maps = chan_case
    # fix only the x-direction: x from refValue, y/z zero-gradient
    write_field(d, "0", "Up", "volVectorField", "[0 1 -1 0 0 0 0]",
                "uniform (5 1 2)", {
        "inlet": ("        type directionMixed;\n"
                  "        refValue uniform (9 8 7);\n"
                  "        refGradient uniform (0 0 0);\n"
                  "        valueFraction uniform (1 0 0 0 0 0);\n"
                  "        value uniform (0 0 0);\n"),
        "outlet": "        type zeroGradient;\n",
        "wall": "        type zeroGradient;\n",
        "top": "        type zeroGradient;\n",
        "fb": "        type empty;\n"})
    U = read_vol_field(d, "0", "Up", ma, maps)
    inp = _patch(ma, "inlet")
    bi = np.asarray(U.bvalues[inp.bstart:inp.bstart + inp.size])
    np.testing.assert_allclose(bi[:, 0], 9.0, rtol=1e-6)
    np.testing.assert_allclose(bi[:, 1], 1.0, rtol=1e-6)
    np.testing.assert_allclose(bi[:, 2], 2.0, rtol=1e-6)


def test_mapped_set_average(chan_case):
    d, ma, maps = chan_case
    write_field(d, "0", "Ta", "volScalarField", "[0 0 0 1 0 0 0]",
                "nonuniform List<scalar> 32 (" +
                " ".join(str(float(i)) for i in range(32)) + ")", {
        "inlet": "        type fixedValue;\n        value uniform 0;\n",
        "outlet": ("        type mappedField;\n"
                   "        sampleMode nearestCell;\n"
                   "        offset (-0.25 0 0);\n"
                   "        setAverage yes;\n"
                   "        average 100;\n"
                   "        value uniform 0;\n"),
        "wall": "        type zeroGradient;\n",
        "top": "        type zeroGradient;\n",
        "fb": "        type empty;\n"})
    T = read_vol_field(d, "0", "Ta", ma, maps)
    outp = _patch(ma, "outlet")
    bvals = np.asarray(T.bvalues[outp.bstart:outp.bstart + outp.size])
    assert bvals.mean() == pytest.approx(100.0, rel=1e-6)
