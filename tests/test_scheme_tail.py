"""Scheme-zoo tail: CoBlended, localBlended, Phi, limitWith,
multivariateSelection (reference:
surfaceInterpolation/schemes/{CoBlended,localBlended},
limitedSchemes/{Phi,limitWith},
convectionSchemes/multivariateGaussConvectionScheme).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from rapidcfd_tpu.fields.bcs import make_bc
from rapidcfd_tpu.fields.field import SurfaceField, VolField
from rapidcfd_tpu.mesh import build_mesh_arrays
from rapidcfd_tpu.ops import interpolation as interp
from rapidcfd_tpu.ops import fvc
from rapidcfd_tpu.utils.casegen import box_mesh
from rapidcfd_tpu.utils.dimensions import DimensionSet, dimless


@pytest.fixture(scope="module")
def chan():
    m = box_mesh(20, 4, 1, size=(2.0, 0.4, 0.1), patch_spec={
        "xmin": ("inlet", "patch"), "xmax": ("outlet", "patch"),
        "ymin": ("wall", "wall"), "ymax": ("wall", "wall"),
        "zmin": ("fb", "empty"), "zmax": ("fb", "empty")})
    ma, pm, maps = build_mesh_arrays(m)
    return ma


def _scalar(ma, data, name="psi"):
    bcs = tuple(make_bc("zeroGradient", i) for i in range(len(ma.patches)))
    f = VolField(jnp.asarray(data), jnp.zeros(ma.n_boundary, ma.C.dtype),
                 bcs, dimless, name, tuple({} for _ in ma.patches))
    return f.correct_boundary_conditions(ma)


def _uflow(ma, u=1.0):
    return SurfaceField(ma.Sf[:, 0] * u, DimensionSet.of(0, 3, -1), "phi")


def test_coblended_limits(chan):
    ma = chan
    x = np.asarray(ma.C)[:, 0]
    f = _scalar(ma, np.sin(3 * x))
    phi = _uflow(ma)
    # tiny dt -> Co << Co1 -> pure scheme1 (linear)
    interp.set_current_dt(jnp.asarray(1e-9))
    w = interp.scheme_weights(ma, f, ("CoBlended", 1.0, "linear", 10.0,
                                      "upwind"), phi)
    np.testing.assert_allclose(np.asarray(w), np.asarray(ma.weights))
    # huge dt -> Co >> Co2 on flux-carrying faces -> pure scheme2
    # (upwind); zero-flux cross faces have Co = 0 and stay scheme1
    interp.set_current_dt(jnp.asarray(1e9))
    w = np.asarray(interp.scheme_weights(
        ma, f, ("CoBlended", 1.0, "linear", 10.0, "upwind"), phi))
    has_flux = np.abs(np.asarray(phi.data[:ma.n_internal])) > 1e-12
    np.testing.assert_allclose(w[has_flux], 1.0)
    np.testing.assert_allclose(w[~has_flux],
                               np.asarray(ma.weights)[~has_flux])
    interp.set_current_dt(None)


def test_local_blended(chan):
    ma = chan
    x = np.asarray(ma.C)[:, 0]
    f = _scalar(ma, x ** 2, name="blendme")
    phi = _uflow(ma)
    interp.set_blending_factor("blendme",
                               jnp.ones(ma.n_faces, ma.weights.dtype))
    w1 = interp.scheme_weights(ma, f, ("localBlended", "linear",
                                       "upwind"), phi)
    np.testing.assert_allclose(np.asarray(w1), np.asarray(ma.weights))
    interp.set_blending_factor("blendme",
                               jnp.zeros(ma.n_faces, ma.weights.dtype))
    w0 = interp.scheme_weights(ma, f, ("localBlended", "linear",
                                       "upwind"), phi)
    np.testing.assert_allclose(np.asarray(w0), 1.0)


def test_phi_scheme_bounds(chan):
    ma = chan
    rng = np.random.default_rng(3)
    U = VolField(jnp.asarray(rng.standard_normal((ma.n_cells, 3))),
                 jnp.zeros((ma.n_boundary, 3), ma.C.dtype),
                 tuple(make_bc("zeroGradient", i)
                       for i in range(len(ma.patches))),
                 DimensionSet.of(0, 1, -1), "U",
                 tuple({} for _ in ma.patches))
    U = U.correct_boundary_conditions(ma)
    phi = fvc.flux(ma, U)
    w = interp.scheme_weights(ma, U, ("Phi", 1.0), phi)
    wnp = np.asarray(w)
    # limiter in [0,1]: weights stay between upwind and central
    lo = np.minimum(np.asarray(ma.weights),
                    (np.asarray(phi.data[:ma.n_internal]) >= 0))
    hi = np.maximum(np.asarray(ma.weights),
                    (np.asarray(phi.data[:ma.n_internal]) >= 0))
    assert (wnp >= lo - 1e-12).all() and (wnp <= hi + 1e-12).all()


def test_limit_with(chan):
    ma = chan
    x = np.asarray(ma.C)[:, 0]
    # smooth monotone field: vanLeer limiter ~1 -> limitWith linear
    # reduces to linear
    f = _scalar(ma, 2.0 + 0.5 * x)
    phi = _uflow(ma)
    w = np.asarray(interp.scheme_weights(
        ma, f, ("limitWith", "linear", "vanLeer"), phi))
    # on flux-carrying faces of a smooth monotone field the limiter is
    # 1 -> reduces to linear (zero-flux cross faces fall to upwind,
    # where owner == neighbour so the face value is unchanged)
    has_flux = np.abs(np.asarray(phi.data[:ma.n_internal])) > 1e-12
    wl = np.asarray(ma.weights)[has_flux]
    linearized = np.abs(w[has_flux] - wl) < 1e-6
    # all interior flux faces reduce to linear (boundary-adjacent faces
    # see a one-sided gradient and may stay limited)
    assert linearized.mean() > 0.9
    assert ((w >= 0.5 - 1e-9) & (w <= 1.0 + 1e-9)).all()
    # step field: the limiter cuts the jump faces toward upwind
    fs = _scalar(ma, np.where(x < 1.0, 1.0, 0.0))
    ws = np.asarray(interp.scheme_weights(
        ma, fs, ("limitWith", "linear", "vanLeer"), phi))
    up = (np.asarray(phi.data[:ma.n_internal]) >= 0).astype(float)
    assert (np.abs(ws - up) < 1e-6).any()


def test_multivariate_coupled_limiter(chan):
    ma = chan
    x = np.asarray(ma.C)[:, 0]
    phi = _uflow(ma)
    # one smooth and one step species: the coupled limiter takes the
    # face-wise MINIMUM, so the shared weights are at least as upwinded
    # as either independent scheme
    f1 = _scalar(ma, 0.2 + 0.1 * x, "Y1")
    f2 = _scalar(ma, np.where(x < 1.0, 0.8, 0.1), "Y2")
    w_shared = np.asarray(interp.multivariate_weights(
        ma, [f1, f2], phi, "vanLeer"))
    w1 = np.asarray(interp.scheme_weights(ma, f1, "vanLeer", phi))
    w2 = np.asarray(interp.scheme_weights(ma, f2, "vanLeer", phi))
    up = (np.asarray(phi.data[:ma.n_internal]) >= 0).astype(float)
    # distance to upwind never larger than the least-limited field
    d_shared = np.abs(w_shared - up)
    d_min = np.minimum(np.abs(w1 - up), np.abs(w2 - up))
    assert (d_shared <= d_min + 1e-12).all()


@pytest.mark.slow
def test_reactingfoam_multivariate(tmp_path_factory):
    """reactingFoam with `Gauss multivariateSelection`: species stay
    bounded and sum to one (VERDICT r3 item 9 Done criterion)."""
    from rapidcfd_tpu.utils import logging as L
    from rapidcfd_tpu.utils.casegen import reacting_box_case
    from rapidcfd_tpu.solvers import reactingfoam
    d = str(tmp_path_factory.mktemp("rmv"))
    reacting_box_case(
        d, n=12, end_time=6e-4, delta_t=1e-4,
        y_scheme="Gauss multivariateSelection { F limitedLinear 1; }")
    L.Info.enabled = False
    try:
        out = reactingfoam.run(d, write=False)
    finally:
        L.Info.enabled = True
    case, U, p, T, rho, Ys, phi = out
    ys = list(Ys)
    assert ys, "no species fields returned"
    tot = sum(np.asarray(y.data) for y in ys)
    for y in ys:
        a = np.asarray(y.data)
        assert np.isfinite(a).all()
        assert a.min() >= -1e-8 and a.max() <= 1.0 + 1e-8
    np.testing.assert_allclose(tot, 1.0, atol=1e-6)
