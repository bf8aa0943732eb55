"""Geometric fields: cell- and face-registered device arrays.

TPU re-founding of the reference's GeometricField stack (reference:
src/OpenFOAM/fields/GeometricFields/GeometricField/GeometricField.H:81):

- `VolField` = internal (nCells, ...) array + *materialized* boundary face
  values (nBoundaryFaces, ...) + a static tuple of boundary-condition
  descriptors + old-time levels. All arrays device-resident; the whole
  thing is a frozen pytree so fields flow through jit/scan/while_loop.
- `SurfaceField` = one (nFaces, ...) array covering internal AND boundary
  faces (simpler than the reference's split storage).
- Dimension checking (reference checks at every op) happens at *trace
  time* via static DimensionSet metadata — zero runtime cost.

Arithmetic on VolFields combines internal and boundary values alike and
yields `calculated`-BC results, mirroring GeometricField operator
semantics.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..utils.dimensions import DimensionSet, dimless


@dataclass(frozen=True)
class Dimensioned:
    """A named, dimensioned scalar/vector constant (dimensionedScalar)."""
    name: str
    dims: DimensionSet
    value: Any

    @staticmethod
    def from_entry(entry, name=""):
        """Parse `nu [0 2 -1 0 0 0 0] 0.01`-style dictionary entries."""
        if isinstance(entry, (int, float)):
            return Dimensioned(name, dimless, float(entry))
        items = list(entry) if isinstance(entry, tuple) else [entry]
        nm, dims, val = name, dimless, None
        for it in items:
            if isinstance(it, DimensionSet):
                dims = it
            elif isinstance(it, str):
                nm = it
            elif isinstance(it, list):
                val = jnp.asarray(it, dtype=float)
            else:
                val = float(it)
        return Dimensioned(nm, dims, val)


def _rank_shape(data) -> tuple:
    return tuple(data.shape[1:])


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class SurfaceField:
    data: jax.Array  # (nFaces, ...) internal + boundary
    dims: DimensionSet = dataclasses.field(metadata=dict(static=True))
    name: str = dataclasses.field(default="", metadata=dict(static=True))

    def _binop(self, other, f, dims):
        return SurfaceField(f(self.data, _argdata(other)), dims, self.name)

    def __add__(self, o):
        return self._binop(o, jnp.add, self.dims.check_same(_argdims(o), "+"))

    def __sub__(self, o):
        return self._binop(o, jnp.subtract,
                           self.dims.check_same(_argdims(o), "-"))

    def __mul__(self, o):
        return self._binop(o, jnp.multiply, self.dims * _argdims(o))

    def __rmul__(self, o):
        return self.__mul__(o)

    def __truediv__(self, o):
        return self._binop(o, jnp.divide, self.dims / _argdims(o))

    def __neg__(self):
        return SurfaceField(-self.data, self.dims, self.name)


def _argdims(o) -> DimensionSet:
    if isinstance(o, (VolField, SurfaceField, Dimensioned)):
        return o.dims
    return dimless


def _argdata(o):
    if isinstance(o, (VolField, SurfaceField)):
        return o.data
    if isinstance(o, Dimensioned):
        return o.value
    return o


def _argb(o, like_b):
    if isinstance(o, VolField):
        return o.bvalues
    if isinstance(o, SurfaceField):
        raise TypeError("cannot combine VolField with SurfaceField directly")
    if isinstance(o, Dimensioned):
        return o.value
    return o


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class VolField:
    data: jax.Array            # (nCells, ...) internal values
    bvalues: jax.Array         # (nBoundaryFaces, ...) boundary face values
    bcs: tuple = dataclasses.field(metadata=dict(static=True))
    dims: DimensionSet = dataclasses.field(metadata=dict(static=True))
    name: str = dataclasses.field(default="", metadata=dict(static=True))
    bcdata: tuple = ()         # per-patch pytrees of BC parameter arrays
    old: Optional["VolField"] = None
    # CrankNicolson ddt state (reference: CrankNicolsonDdtScheme.H DDt0Field):
    # (ddt0_data, ddt0_bvalues, steps_completed) advanced once per step by
    # fvm.cn_advance; None for fields not integrated with CN
    ddt0: Optional[tuple] = None

    # -- structure helpers ---------------------------------------------------
    def replace(self, **kw) -> "VolField":
        return dataclasses.replace(self, **kw)

    def with_calculated_bcs(self, data, bvalues, dims,
                            name="") -> "VolField":
        from .bcs import Calculated
        keep = tuple(bc.preserves_type
                     and getattr(bc, "value_free", False)
                     for bc in self.bcs)
        bcs = tuple(
            bc if k else Calculated(bc.patch)
            for bc, k in zip(self.bcs, keep))
        return VolField(data, bvalues, bcs, dims, name or self.name,
                        tuple(d if k else ()
                              for k, d in zip(keep, self.bcdata)),
                        None)

    def store_old(self, levels: int = 1) -> "VolField":
        """Shift current values into the old-time slot. levels=1 keeps one
        old level (Euler), levels=2 keeps two (backward). A fixed level
        count keeps the pytree structure stable across jit steps."""
        prev = None
        if levels >= 2 and self.old is not None:
            prev = self.old.replace(old=None)
        old = VolField(self.data, self.bvalues, self.bcs, self.dims,
                       self.name, self.bcdata, prev)
        return self.replace(old=old)

    @property
    def rank_shape(self):
        return _rank_shape(self.data)

    # -- arithmetic -----------------------------------------------------------
    def _binop(self, other, f, dims, name=""):
        a, b = self.data, _argdata(other)
        ab, bb = self.bvalues, _argb(other, self.bvalues)
        # rank promotion: a scalar field combines with a vector/tensor
        # field by broadcasting over components (cell axis leading)
        if hasattr(b, "ndim") and b.ndim > 0:
            while a.ndim < b.ndim:
                a, ab = a[..., None], ab[..., None]
            while b.ndim < a.ndim and isinstance(other,
                                                 (VolField, SurfaceField)):
                b, bb = b[..., None], bb[..., None]
        return self.with_calculated_bcs(f(a, b), f(ab, bb), dims, name)

    def __add__(self, o):
        return self._binop(o, jnp.add, self.dims.check_same(_argdims(o), "+"))

    def __sub__(self, o):
        return self._binop(o, jnp.subtract,
                           self.dims.check_same(_argdims(o), "-"))

    def __mul__(self, o):
        return self._binop(o, jnp.multiply, self.dims * _argdims(o))

    def __rmul__(self, o):
        return self.__mul__(o)

    def __truediv__(self, o):
        return self._binop(o, jnp.divide, self.dims / _argdims(o))

    def __rtruediv__(self, o):
        return self.with_calculated_bcs(
            _argdata(o) / self.data, _argb(o, self.bvalues) / self.bvalues,
            _argdims(o) / self.dims)

    def __neg__(self):
        return self.with_calculated_bcs(-self.data, -self.bvalues, self.dims)

    def component(self, c: int) -> "VolField":
        return self.with_calculated_bcs(self.data[..., c],
                                        self.bvalues[..., c], self.dims,
                                        f"{self.name}{'xyz'[c]}")

    # -- boundary -------------------------------------------------------------
    def correct_boundary_conditions(self, mesh, env=None) -> "VolField":
        """Re-evaluate every patch's face values from its BC (reference:
        GeometricField::correctBoundaryConditions). env carries registry
        fields some BCs read (e.g. phi for inletOutlet)."""
        new_b = self.bvalues
        for bc, bd in zip(self.bcs, self.bcdata):
            patch = mesh.patches[bc.patch]
            if patch.is_empty:
                continue
            vals = bc.evaluate(mesh, patch, self, bd, env)
            new_b = new_b.at[patch.bstart:patch.bstart + patch.size].set(vals)
        return self.replace(bvalues=new_b)

    def patch_internal(self, mesh, patch) -> jax.Array:
        """Internal-cell values adjacent to a patch (patchInternalField)."""
        return mesh.patch_cell_values(patch, self.data)

    def patch_values(self, mesh, patch) -> jax.Array:
        return self.bvalues[patch.bstart:patch.bstart + patch.size]


def mag(x):
    """Field magnitude (reference: mag())."""
    if isinstance(x, VolField):
        if x.rank_shape == ():
            return x.with_calculated_bcs(jnp.abs(x.data), jnp.abs(x.bvalues),
                                         x.dims, f"mag({x.name})")
        return x.with_calculated_bcs(
            jnp.linalg.norm(x.data, axis=-1),
            jnp.linalg.norm(x.bvalues, axis=-1), x.dims, f"mag({x.name})")
    if isinstance(x, SurfaceField):
        d = jnp.abs(x.data) if x.data.ndim == 1 else \
            jnp.linalg.norm(x.data, axis=-1)
        return SurfaceField(d, x.dims, f"mag({x.name})")
    return jnp.abs(x)


#: bcdata entries that carry the solution LEVEL (additive under a
#: constant shift of the field); gradient/fraction/flux entries are
#: shift-invariant
_LEVEL_KEYS = ("value", "p0", "inletValue", "outletValue", "refValue",
               "uniformValue", "freestreamValue")


def shift_level(f: VolField, delta) -> VolField:
    """f + delta as a SOLUTION-LEVEL shift: internal and boundary values
    plus every level-carrying BC parameter move together, so the shifted
    field satisfies the same problem re-based at a new origin.

    TPU mixed-precision keystone (SURVEY §7.2.5): SI absolute pressure
    (~1e5 Pa) stored in fp32 quantizes at ~0.008 Pa — above the
    cell-to-cell dynamic differences of low-Mach flows — so compressible
    solvers run p in DEVIATION form (shift_level(p, -pRef) on entry,
    +pRef for thermo/EoS evaluations and on write)."""
    new_bd = []
    for bd in f.bcdata:
        d2 = dict(bd)
        for k in _LEVEL_KEYS:
            if k in d2:
                d2[k] = d2[k] + delta
        new_bd.append(d2)
    return f.replace(data=f.data + delta, bvalues=f.bvalues + delta,
                     bcdata=tuple(new_bd))
