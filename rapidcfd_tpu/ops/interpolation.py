"""surfaceInterpolationScheme zoo — face interpolation of cell fields.

Capability surface of the reference's scheme registry (reference:
src/finiteVolume/interpolation/surfaceInterpolation/schemes + the
LimitedScheme TVD/NVD family in limitedSchemes/). Every scheme reduces to
computing *owner weights* w on internal faces (faceVal = w*own +
(1-w)*nei), which keeps downstream fvm div assembly uniform.

All limiters are implemented in the standard Sweby r-formulation with the
reference's stencil estimate r = 2*(d . gradOwn-or-Nei)/(psiN - psiO) - 1.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..fields.field import SurfaceField, VolField
from ..mesh.mesharrays import MeshArrays
from ..utils.registry import register, lookup


def _unwrap(scheme):
    """('bounded', inner) is an fvm-only marker; interpolation uses the
    inner scheme."""
    if isinstance(scheme, tuple) and len(scheme) == 2 \
            and scheme[0] == "bounded":
        return scheme[1]
    return scheme


def interpolate_internal(mesh: MeshArrays, vf: VolField, scheme="linear",
                         phi: SurfaceField | None = None) -> jnp.ndarray:
    """Internal-face values by the named scheme."""
    scheme = _unwrap(scheme)
    if isinstance(scheme, tuple):
        name, args = scheme[0], scheme[1:]
    else:
        name, args = scheme, ()
    w = lookup("surfaceInterpolation", name)(mesh, vf, phi, *args)
    from ..parallel.hooks import halo
    data = halo(vf.data)
    own = jnp.take(data, mesh.owner[:mesh.n_internal], axis=0)
    nei = jnp.take(data, mesh.neighbour, axis=0)
    if own.ndim > w.ndim:
        w = w.reshape(w.shape + (1,) * (own.ndim - w.ndim))
    return w * own + (1.0 - w) * nei


def scheme_weights(mesh: MeshArrays, vf: VolField, scheme="linear",
                   phi: SurfaceField | None = None) -> jnp.ndarray:
    """Owner weights on internal faces (used by fvm::div assembly)."""
    scheme = _unwrap(scheme)
    if isinstance(scheme, tuple):
        name, args = scheme[0], scheme[1:]
    else:
        name, args = scheme, ()
    return lookup("surfaceInterpolation", name)(mesh, vf, phi, *args)


# ---------------------------------------------------------------------------
# base schemes
# ---------------------------------------------------------------------------

@register("surfaceInterpolation", "linear")
def _linear(mesh, vf, phi):
    return mesh.weights


@register("surfaceInterpolation", "upwind")
def _upwind(mesh, vf, phi):
    if phi is None:
        raise ValueError("upwind interpolation requires a flux field")
    return (phi.data[:mesh.n_internal] >= 0.0).astype(mesh.weights.dtype)


@register("surfaceInterpolation", "downwind")
def _downwind(mesh, vf, phi):
    if phi is None:
        raise ValueError("downwind interpolation requires a flux field")
    return (phi.data[:mesh.n_internal] < 0.0).astype(mesh.weights.dtype)


@register("surfaceInterpolation", "midPoint")
def _midpoint(mesh, vf, phi):
    return jnp.full_like(mesh.weights, 0.5)


@register("surfaceInterpolation", "reverseLinear")
def _reverse_linear(mesh, vf, phi):
    return 1.0 - mesh.weights


# ---------------------------------------------------------------------------
# limited (TVD) family — reference: limitedSchemes/LimitedScheme
# ---------------------------------------------------------------------------

def _face_r(mesh: MeshArrays, vf: VolField, phi: SurfaceField) -> jnp.ndarray:
    """Upwind gradient ratio r per internal face (limitedScheme stencil:
    r = 2*(d . gradcU)/(psiN - psiO) - 1, gradcU = upwind cell gradient).

    For vector fields the reference limits along the flux direction using
    (gradc & d) contracted with (psiN-psiO); we mirror that.
    """
    from . import fvc
    from ..parallel.hooks import halo
    own = mesh.owner[:mesh.n_internal]
    nei = mesh.neighbour
    d = jnp.take(mesh.C, nei, axis=0) - jnp.take(mesh.C, own, axis=0)
    g = fvc.grad(mesh, vf)           # scalar->vector, vector->tensor
    gdata = halo(g.data)
    vdata = halo(vf.data)
    upwind_is_owner = phi.data[:mesh.n_internal] >= 0.0
    if vf.data.ndim == 1:
        gradc = jnp.where(upwind_is_owner[:, None],
                          jnp.take(gdata, own, axis=0),
                          jnp.take(gdata, nei, axis=0))
        dpsi = jnp.take(vdata, nei, axis=0) - jnp.take(vdata, own, axis=0)
        num = 2.0 * (d * gradc).sum(-1)
        den = dpsi
    else:
        gradc = jnp.where(upwind_is_owner[:, None, None],
                          jnp.take(gdata, own, axis=0),
                          jnp.take(gdata, nei, axis=0))
        dpsi = jnp.take(vdata, nei, axis=0) - jnp.take(vdata, own, axis=0)
        # contract along components: r scalar per face (reference uses
        # gradcf && udGrad with the d x dpsi outer product)
        num = 2.0 * ((d[:, :, None] * gradc).sum(1) * dpsi).sum(-1)
        den = (dpsi * dpsi).sum(-1)
    tiny = jnp.asarray(1e-30, den.dtype)
    den = jnp.where(jnp.abs(den) < tiny, jnp.where(den >= 0, tiny, -tiny),
                    den)
    return num / den - 1.0


def _limited_weights(mesh, phi, limiter_psi):
    """Blend upwind/linear weights by limiter value in [0, 2]:
    w = limiter*linearWeights + (1-limiter)*upwindWeights."""
    up = (phi.data[:mesh.n_internal] >= 0.0).astype(mesh.weights.dtype)
    return limiter_psi * mesh.weights + (1.0 - limiter_psi) * up


def _make_limited(name, limiter):
    # the reference's "V" variants (vanLeerV, ...) limit all components
    # with one scalar limiter; _face_r already contracts vectors that
    # way, so the V name is an alias
    @register("surfaceInterpolation", name, name + "V")
    def _scheme(mesh, vf, phi, *args):
        if phi is None:
            raise ValueError(f"{name} interpolation requires a flux field")
        r = _face_r(mesh, vf, phi)
        return _limited_weights(mesh, phi, limiter(r, *args))
    return _scheme


_make_limited("vanLeer",
              lambda r: (r + jnp.abs(r)) / (1.0 + jnp.abs(r)))
_make_limited("Minmod", lambda r: jnp.clip(r, 0.0, 1.0))
_make_limited("vanAlbada",
              lambda r: jnp.where(r > 0, r * (r + 1.0) / (r * r + 1.0), 0.0))
_make_limited("MUSCL",
              lambda r: jnp.maximum(
                  0.0, jnp.minimum(jnp.minimum(2.0 * r, 0.5 * r + 0.5), 2.0)))
_make_limited("SuperBee",
              lambda r: jnp.maximum(jnp.clip(2.0 * r, 0.0, 1.0),
                                    jnp.clip(r, 0.0, 2.0)))
_make_limited("OSPRE",
              lambda r: jnp.where(r > 0,
                                  1.5 * r * (r + 1.0)
                                  / (r * r + r + 1.0), 0.0))
_make_limited("UMIST",
              lambda r: jnp.maximum(0.0, jnp.minimum(
                  jnp.minimum(2.0 * r, 0.25 + 0.75 * r),
                  jnp.minimum(0.75 + 0.25 * r, 2.0))))
# limitedLinear k: limiter = max(min(2r/k, 1), 0) (k in (0,1])
_make_limited("limitedLinear",
              lambda r, k=1.0: jnp.clip(2.0 * r / max(float(k), 1e-6),
                                        0.0, 1.0))


@register("surfaceInterpolation", "linearUpwind")
def _linear_upwind(mesh, vf, phi, *args):
    """Second-order upwind is value-corrected, not weight-expressible; the
    fvm path uses pure upwind weights + this deferred correction is applied
    in explicit interpolation only (matches reference behaviour where
    linearUpwind's correction is explicit)."""
    if phi is None:
        raise ValueError("linearUpwind requires a flux field")
    return (phi.data[:mesh.n_internal] >= 0.0).astype(mesh.weights.dtype)
