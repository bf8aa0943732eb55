"""fvOptions — run-time source/constraint system.

Capability surface of the reference's fv::option framework (reference:
src/fvOptions/fvOption.H:71 with addSup(fvMatrix&)/constrain hooks, read
from system/fvOptions): each option is a pure matrix transformation over
a static cell-selection mask. Implemented sources: MRF (Coriolis),
explicitPorositySource (Darcy-Forchheimer), semiImplicitSource,
fixedTemperatureConstraint.

Cell selection: selectionMode all | box (axis-aligned box replaces the
reference's cellZone lookup until zone IO lands).
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from ..fields.field import Dimensioned, VolField
from ..utils.dictionary import Dictionary, parse_file
from ..utils.dimensions import DimensionSet
from ..utils.logging import info
from ..utils.registry import lookup, register


def _selection_mask(mesh, d: Dictionary):
    mode = d.word("selectionMode", "all")
    C = np.asarray(mesh.C)
    if mode == "all":
        return jnp.ones(mesh.n_cells, mesh.V.dtype)
    if mode == "box":
        lo, hi = d.lookup("box", required=True)
        m = np.all((C >= np.asarray(lo, float))
                   & (C <= np.asarray(hi, float)), axis=1)
        return jnp.asarray(m.astype(float), mesh.V.dtype)
    raise KeyError(f"fvOptions: unsupported selectionMode '{mode}' "
                   f"(all|box)")


class Option:
    def __init__(self, name, d: Dictionary, mesh):
        self.name = name
        self.dict = d.subdict(d.word("type") + "Coeffs", required=False) \
            or d
        self.mask = _selection_mask(mesh, self.dict)
        flds = self.dict.lookup("fields")
        self.field_names = [str(f) for f in flds] if flds else None

    def applies_to(self, field_name: str) -> bool:
        return self.field_names is None or field_name in self.field_names

    def add_sup(self, mesh, field_name, eqn, env):
        return eqn

    def constrain(self, mesh, field_name, eqn, env):
        return eqn


@register("fvOption", "MRFSource", "MRF")
class MRFSource(Option):
    """Rotating-frame Coriolis source (reference: cfdTools/general/MRF/
    MRFZone.H:66 addCoriolis): Usource -= V*(Omega ^ U)."""

    def __init__(self, name, d, mesh):
        super().__init__(name, d, mesh)
        self.origin = np.asarray(self.dict.lookup("origin",
                                                  [0.0, 0.0, 0.0]), float)
        axis = np.asarray(self.dict.lookup("axis", [0.0, 0.0, 1.0]), float)
        omega = Dimensioned.from_entry(
            self.dict.lookup("omega", required=True)).value
        self.omega_v = jnp.asarray(axis / np.linalg.norm(axis) * omega)

    def applies_to(self, field_name):
        return field_name == "U"

    def add_sup(self, mesh, field_name, eqn, env):
        U = eqn.psi
        cor = jnp.cross(jnp.broadcast_to(self.omega_v, U.data.shape),
                        U.data)
        src = eqn.source - mesh.V[:, None] * self.mask[:, None] * cor
        return eqn.replace(source=src)


@register("fvOption", "explicitPorositySource")
class ExplicitPorositySource(Option):
    """Darcy-Forchheimer momentum sink (reference: fvOptions sources/
    derived/explicitPorositySource + porosityModel/DarcyForchheimer):
    implicit Sp contribution -(nu*d + 0.5*|U|*f)*V per unit volume."""

    def __init__(self, name, d, mesh):
        super().__init__(name, d, mesh)
        sub = self.dict.subdict("DarcyForchheimerCoeffs", required=False) \
            or self.dict
        dvec = sub.lookup("d", required=True)
        fvec = sub.lookup("f", [0.0, 0.0, 0.0])
        if isinstance(dvec, tuple):
            dvec = Dimensioned.from_entry(dvec).value
        if isinstance(fvec, tuple):
            fvec = Dimensioned.from_entry(fvec).value
        self.d_mean = float(np.mean(np.asarray(dvec, float)))
        self.f_mean = float(np.mean(np.asarray(fvec, float)))

    def applies_to(self, field_name):
        return field_name == "U"

    def add_sup(self, mesh, field_name, eqn, env):
        U = eqn.psi
        nu = env.get("nu")
        nu_v = nu.value if isinstance(nu, Dimensioned) else (
            nu.data if isinstance(nu, VolField) else 1e-5)
        umag = jnp.linalg.norm(U.data, axis=-1)
        sp = (nu_v * self.d_mean + 0.5 * umag * self.f_mean) * self.mask
        return eqn.replace(diag=eqn.diag + mesh.V * sp)


@register("fvOption", "semiImplicitSource",
          "scalarSemiImplicitSource", "vectorSemiImplicitSource")
class SemiImplicitSource(Option):
    """Su/Sp injection (reference: sources/general/semiImplicitSource):
    per field (Su Sp) pair; volumeMode absolute|specific."""

    def __init__(self, name, d, mesh):
        super().__init__(name, d, mesh)
        self.volume_mode = self.dict.word("volumeMode", "specific")
        inj = self.dict.subdict("injectionRateSuSp", required=True)
        self.rates = {}
        for fname, val in inj.items():
            su, sp = val
            self.rates[str(fname)] = (np.asarray(su, float)
                                      if isinstance(su, list) else float(su),
                                      float(sp))

    def applies_to(self, field_name):
        return field_name in self.rates

    def add_sup(self, mesh, field_name, eqn, env):
        su, sp = self.rates[field_name]
        vol = mesh.V if self.volume_mode == "specific" \
            else mesh.V / (mesh.V * self.mask).sum()
        su_j = jnp.asarray(su, eqn.source.dtype)
        m = self.mask if eqn.source.ndim == 1 else self.mask[:, None]
        v = vol if eqn.source.ndim == 1 else vol[:, None]
        src = eqn.source + v * m * su_j
        diag = eqn.diag - mesh.V * self.mask * sp
        return eqn.replace(source=src, diag=diag)


@register("fvOption", "fixedTemperatureConstraint")
class FixedTemperatureConstraint(Option):
    """Constraint: fix T (or the energy eq's psi) in the selection
    (reference: constraints/fixedTemperatureConstraint)."""

    def __init__(self, name, d, mesh):
        super().__init__(name, d, mesh)
        self.temperature = float(self.dict.scalar("temperature", 300.0))

    def applies_to(self, field_name):
        return field_name in ("T", "e", "h")

    def constrain(self, mesh, field_name, eqn, env):
        vals = jnp.full(mesh.n_cells, self.temperature,
                        eqn.diag.dtype)
        if field_name != "T" and "thermo" in (env or {}):
            vals = env["thermo"].he_from_t(vals)
        return eqn.set_values(mesh, self.mask, vals)


class FvOptions:
    """fv::IOoptionList (reference: fvIOoptionList.H:53): reads
    system/fvOptions and applies each option to matching equations."""

    def __init__(self, case):
        self.options = []
        path = os.path.join(case.dir, "system", "fvOptions")
        if not os.path.isfile(path):
            return
        d = parse_file(path)
        for name, sub in d.items():
            if not isinstance(sub, Dictionary):
                continue
            typ = sub.word("type")
            try:
                cls = lookup("fvOption", typ)
            except KeyError:
                info(f"fvOptions: unknown type '{typ}' for '{name}' "
                     f"— skipped")
                continue
            self.options.append(cls(str(name), sub, case.mesh))
            info(f"Creating fvOption {name} of type {typ}")

    def __call__(self, mesh, field_name: str, eqn, env=None):
        """operator()(fvMatrix): addSup from every applicable option."""
        for opt in self.options:
            if opt.applies_to(field_name):
                eqn = opt.add_sup(mesh, field_name, eqn, env or {})
        return eqn

    def constrain(self, mesh, field_name: str, eqn, env=None):
        for opt in self.options:
            if opt.applies_to(field_name):
                eqn = opt.constrain(mesh, field_name, eqn, env or {})
        return eqn
