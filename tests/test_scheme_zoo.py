"""Surface-interpolation scheme zoo (ops/interpolation.py extended set).

Validates scheme registration coverage against the reference's scheme
directories, limiter sanity on canonical r values, and TVD boundedness
of a scalar advection step under every limited scheme.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rapidcfd_tpu.fields.field import SurfaceField, VolField
from rapidcfd_tpu.ops import fvc
from rapidcfd_tpu.ops.interpolation import interpolate_internal
from rapidcfd_tpu.solvers.case import Case
from rapidcfd_tpu.utils.casegen import cavity_case
from rapidcfd_tpu.utils.registry import lookup

# strictly bounded TVD limiters
LIMITED = ["upwind", "vanLeer", "vanAlbada", "Minmod", "MUSCL",
           "SuperBee", "OSPRE", "UMIST", "limitedLinear",
           "Gamma", "SFCD", "limitedCubic"]
# schemes that may admit bounded over/undershoot (QUICK's own docs:
# "some downwind contribution is possible")
SOFT = ["QUICK", "filteredLinear", "blended", "LUST"]
WRAPPERS = ["linear", "midPoint", "reverseLinear", "downwind",
            "harmonic", "clippedLinear", "localMax", "localMin",
            "fixedBlended", "outletStabilised", "skewCorrected",
            "cubic"]


def test_all_registered():
    for s in LIMITED + SOFT + WRAPPERS:
        lookup("surfaceInterpolation", s)
    # V and 01 aliases of the limited family
    for s in ["vanLeerV", "vanLeer01", "limitedLinear01", "GammaV",
              "QUICKV", "MinmodV"]:
        lookup("surfaceInterpolation", s)


@pytest.fixture(scope="module")
def cav(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("zoo"))
    cavity_case(d, n=20)
    return Case(d)


def _step_profile(case, scheme):
    """One explicit advection step of a step profile in uniform flow."""
    mesh = case.mesh
    C = np.asarray(mesh.C)
    data = (C[:, 0] < 0.05).astype(float)
    T = case.read_field("p").replace(data=jnp.asarray(data),
                                     name="T")
    U = case.read_field("U")
    U = U.replace(data=jnp.ones_like(U.data) * jnp.asarray([1.0, 0, 0]))
    phi = fvc.flux(mesh, U)

    @jax.jit
    def advect(T):
        f = interpolate_internal(mesh, T, scheme, phi)
        flux = jnp.concatenate(
            [f * phi.data[:mesh.n_internal],
             jnp.zeros(mesh.n_faces - mesh.n_internal, f.dtype)])
        div = fvc.surface_sum_faces(mesh, flux) / mesh.V
        return T.replace(data=T.data - 1e-3 * div)

    out = advect(T)
    return np.asarray(out.data)


@pytest.mark.parametrize("scheme", LIMITED)
def test_limited_schemes_bounded_step(cav, scheme):
    spec = (scheme, 1.0) if scheme in ("limitedLinear", "Gamma",
                                       "limitedCubic") else scheme
    out = _step_profile(cav, spec)
    assert np.isfinite(out).all()
    # one small explicit step of a [0,1] step stays essentially bounded
    assert out.min() > -0.05 and out.max() < 1.05


@pytest.mark.parametrize("scheme", SOFT)
def test_soft_schemes_finite(cav, scheme):
    out = _step_profile(cav, scheme)
    assert np.isfinite(out).all()
    assert out.min() > -0.3 and out.max() < 1.3


@pytest.mark.parametrize("scheme", WRAPPERS)
def test_wrapper_schemes_run(cav, scheme):
    out = _step_profile(cav, scheme)
    assert np.isfinite(out).all()


def test_harmonic_mean_exact(cav):
    """harmonic face value == 2ab/(a+b) on a uniform mesh."""
    mesh = cav.mesh
    rng = np.random.default_rng(0)
    vals = rng.uniform(1.0, 5.0, mesh.n_cells)
    T = cav.read_field("p").replace(data=jnp.asarray(vals), name="k")
    f = np.asarray(interpolate_internal(mesh, T, "harmonic"))
    own = np.asarray(mesh.owner)[:mesh.n_internal]
    nei = np.asarray(mesh.neighbour)
    expect = 2 * vals[own] * vals[nei] / (vals[own] + vals[nei])
    np.testing.assert_allclose(f, expect, rtol=1e-12)


def test_local_max_min(cav):
    mesh = cav.mesh
    rng = np.random.default_rng(1)
    vals = rng.standard_normal(mesh.n_cells)
    T = cav.read_field("p").replace(data=jnp.asarray(vals), name="q")
    fmax = np.asarray(interpolate_internal(mesh, T, "localMax"))
    fmin = np.asarray(interpolate_internal(mesh, T, "localMin"))
    own = np.asarray(mesh.owner)[:mesh.n_internal]
    nei = np.asarray(mesh.neighbour)
    np.testing.assert_allclose(fmax, np.maximum(vals[own], vals[nei]))
    np.testing.assert_allclose(fmin, np.minimum(vals[own], vals[nei]))


def test_quick_limiter_values(cav):
    """QUICK limiter equals (3+r)/4 clipped to [0,2] — smooth linear
    field has r=1 => limiter 1 => QUICK == linear there."""
    mesh = cav.mesh
    C = np.asarray(mesh.C)
    T = cav.read_field("p").replace(data=jnp.asarray(C[:, 0]), name="x")
    U = cav.read_field("U")
    U = U.replace(data=jnp.ones_like(U.data) * jnp.asarray([1.0, 0, 0]))
    phi = fvc.flux(mesh, U)
    f_quick = np.asarray(interpolate_internal(mesh, T, "QUICK", phi))
    f_lin = np.asarray(interpolate_internal(mesh, T, "linear", phi))
    np.testing.assert_allclose(f_quick, f_lin, atol=1e-10)


def test_cell_limited_grad_interior_inactive(cav):
    """cellLimited on a smooth linear field: interior gradients equal
    the unlimited Gauss gradient (reference cellLimitedGrads.C —
    boundary cells ARE limited when zeroGradient bounds collapse)."""
    mesh = cav.mesh
    C = np.asarray(mesh.C)
    p = cav.read_field("p")
    vals = jnp.asarray(2 * C[:, 0] + 3 * C[:, 1])
    ps = jax.jit(lambda f, v: f.replace(data=v)
                 .correct_boundary_conditions(mesh))(p, vals)
    g1 = np.asarray(fvc.grad(mesh, ps, ("cellLimited", "linear",
                                        1.0)).data)
    g0 = np.asarray(fvc.grad(mesh, ps, "linear").data)
    inner = (C[:, 0] > 0.02) & (C[:, 0] < 0.08) \
        & (C[:, 1] > 0.02) & (C[:, 1] < 0.08)
    assert np.abs(g1 - g0).max(1)[inner].max() < 1e-9


def test_cell_limited_grad_step_bounded(cav):
    """Step profile: limited extrapolations stay within cell bounds."""
    mesh = cav.mesh
    C = np.asarray(mesh.C)
    p = cav.read_field("p")
    vals = jnp.asarray((C[:, 0] > 0.05).astype(float))
    ps = jax.jit(lambda f, v: f.replace(data=v)
                 .correct_boundary_conditions(mesh))(p, vals)
    g = fvc.grad(mesh, ps, ("cellLimited", "linear", 1.0))
    gd = np.asarray(g.data)
    # extrapolate to each face of each cell: must stay within the
    # cell's neighbour value bounds (+tolerance)
    cf = np.asarray(mesh.Cf)[np.asarray(mesh.cell_faces)]
    d = cf - C[:, None, :]
    proj = (d * gd[:, None, :]).sum(-1)
    assert proj.max() <= 1.0 + 1e-9 and proj.min() >= -1.0 - 1e-9


def test_grad_scheme_parsing(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("gsch"))
    cavity_case(d)
    import os
    from rapidcfd_tpu.utils.casegen import _write
    from rapidcfd_tpu.utils.dictionary import foamfile_header
    _write(os.path.join(d, "system", "fvSchemes"),
           foamfile_header("dictionary", "fvSchemes", "system"), """
ddtSchemes      { default Euler; }
gradSchemes     { default Gauss linear;
                  grad(U) cellLimited Gauss linear 1;
                  grad(k) cellMDLimited leastSquares 0.5;
                  grad(p) leastSquares; }
divSchemes      { default none; div(phi,U) Gauss linear; }
laplacianSchemes { default Gauss linear orthogonal; }
interpolationSchemes { default linear; }
snGradSchemes   { default orthogonal; }
""")
    case = Case(d)
    assert case.grad_scheme() == "linear"
    assert case.grad_scheme("grad(U)") == ("cellLimited", "linear", 1.0)
    assert case.grad_scheme("grad(k)") == ("cellMDLimited",
                                           "leastSquares", 0.5)
    assert case.grad_scheme("grad(p)") == "leastSquares"
