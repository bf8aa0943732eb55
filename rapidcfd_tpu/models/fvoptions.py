"""fvOptions — run-time source/constraint system.

Capability surface of the reference's fv::option framework (reference:
src/fvOptions/fvOption.H:71 with addSup(fvMatrix&)/constrain hooks, read
from system/fvOptions): each option is a pure matrix transformation over
a static cell-selection mask. Implemented sources: MRF (Coriolis),
explicitPorositySource (Darcy-Forchheimer), semiImplicitSource,
fixedTemperatureConstraint.

Cell selection: selectionMode all | box | cellSet | cellZone (reference:
fvOption.H cellSetOption); sets/zones are read from
constant/polyMesh/{sets,cellZones} (FILE numbering, built by
mesh/toposet.py) and translated to the device ordering via MeshMaps.
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


def _selection_mask(mesh, d: Dictionary, case=None):
    mode = d.word("selectionMode", "all")
    C = np.asarray(mesh.C)
    if mode == "all":
        return jnp.ones(mesh.n_cells, mesh.V.dtype)
    if mode == "box":
        lo, hi = d.lookup("box", required=True)
        m = np.all((C >= np.asarray(lo, float))
                   & (C <= np.asarray(hi, float)), axis=1)
        return jnp.asarray(m.astype(float), mesh.V.dtype)
    if mode in ("cellSet", "cellZone"):
        if case is None:
            raise KeyError(f"fvOptions: selectionMode {mode} needs a "
                           f"case directory (no case bound)")
        from ..mesh.toposet import read_cell_zones, read_set
        if mode == "cellSet":
            labels = read_set(case.dir,
                              d.word("cellSet", "") or d.word("set"))
        else:
            name = d.word("cellZone", "") or d.word("zone")
            zones = read_cell_zones(case.dir, case.region)
            if name not in zones:
                raise KeyError(f"fvOptions: cellZone '{name}' not found "
                               f"(have {sorted(zones)})")
            labels = zones[name]
        m_file = np.zeros(mesh.n_cells, bool)
        m_file[np.asarray(labels, np.int64)] = True
        m = case.maps.cells_to_device(m_file)
        return jnp.asarray(m.astype(float), mesh.V.dtype)
    raise KeyError(f"fvOptions: unsupported selectionMode '{mode}' "
                   f"(all|box|cellSet|cellZone)")


class Option:
    def __init__(self, name, d: Dictionary, mesh, case=None):
        self.name = name
        self.dict = d.subdict(d.word("type") + "Coeffs", required=False) \
            or d
        self.mask = _selection_mask(mesh, self.dict, case)
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

    def __init__(self, name, d, mesh, case=None):
        super().__init__(name, d, mesh, case)
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

    def __init__(self, name, d, mesh, case=None):
        super().__init__(name, d, mesh, case)
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

    def __init__(self, name, d, mesh, case=None):
        super().__init__(name, d, mesh, case)
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

    def __init__(self, name, d, mesh, case=None):
        super().__init__(name, d, mesh, case)
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
            self.options.append(cls(str(name), sub, case.mesh, case))
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


@register("fvOption", "actuationDiskSource")
class ActuationDiskSource(Option):
    """Froude actuation disk momentum sink (reference: fvOptions
    sources/derived/actuationDiskSource/actuationDiskSourceTemplates.C:
    T = 2*rho*A*|upU|*a*(1-a), a = 1 - Cp/Ct, distributed over the
    selection volume along diskDir). upstreamPoint selects the
    reference-velocity cell (nearest cell centre, host once)."""

    def __init__(self, name, d, mesh, case=None):
        super().__init__(name, d, mesh, case)
        self.disk_dir = np.asarray(self.dict.lookup("diskDir",
                                                    [1.0, 0.0, 0.0]),
                                   float)
        self.disk_dir = self.disk_dir / np.linalg.norm(self.disk_dir)
        self.cp = float(self.dict.scalar("Cp", 0.386))
        self.ct = float(self.dict.scalar("Ct", 0.58))
        self.area = float(self.dict.scalar("diskArea", 1.0))
        up = self.dict.lookup("upstreamPoint")
        C = np.asarray(mesh.C)
        if up is not None:
            self.up_cell = int(np.argmin(
                ((C - np.asarray(up, float)) ** 2).sum(1)))
        else:
            self.up_cell = int(np.argmax(self.mask is not None))
        self.v_zone = float((np.asarray(mesh.V)
                             * np.asarray(self.mask)).sum())

    def applies_to(self, field_name):
        return field_name == "U"

    def add_sup(self, mesh, field_name, eqn, env):
        U = eqn.psi
        rho = env.get("rho")
        rho_up = rho.data[self.up_cell] if hasattr(rho, "data") else 1.0
        up_u = U.data[self.up_cell]
        a = 1.0 - self.cp / self.ct
        t_coeff = 2.0 * rho_up * self.area * jnp.linalg.norm(up_u) \
            * a * (1.0 - a)
        e = jnp.asarray(self.disk_dir, U.data.dtype)
        force = t_coeff * (e * up_u)           # E & upU (diagonal E)
        src = eqn.source - (mesh.V * self.mask / self.v_zone)[:, None] \
            * force
        return eqn.replace(source=src)


@register("fvOption", "pressureGradientExplicitSource")
class PressureGradientExplicitSource(Option):
    """Driving pressure gradient maintaining a target bulk velocity Ubar
    (reference: sources/derived/pressureGradientExplicitSource): the
    gradient is adapted each call from the volume-averaged flow-dir
    velocity error with the matrix diagonal as the relaxation scale."""

    def __init__(self, name, d, mesh, case=None):
        super().__init__(name, d, mesh, case)
        ubar = self.dict.lookup("Ubar", required=True)
        if isinstance(ubar, tuple):
            ubar = Dimensioned.from_entry(ubar).value
        self.ubar = np.asarray(ubar, float)
        self.flow_dir = self.ubar / np.linalg.norm(self.ubar)
        self.grad_p = float(self.dict.scalar("gradientInitial", 0.0))

    def applies_to(self, field_name):
        return field_name == "U"

    def add_sup(self, mesh, field_name, eqn, env):
        U = eqn.psi
        e = jnp.asarray(self.flow_dir, U.data.dtype)
        vw = mesh.V * self.mask
        ubar_now = (vw[:, None] * U.data).sum(0) / vw.sum()
        mag_err = jnp.linalg.norm(jnp.asarray(self.ubar)) \
            - (ubar_now * e).sum()
        # relaxation scale: volume-averaged diagonal (rAU-like)
        diag = eqn.diag if eqn.diag.ndim == 1 else eqn.diag.mean(-1)
        r_ave = (vw * (diag / jnp.maximum(mesh.V, 1e-300))).sum() \
            / vw.sum()
        grad_p = self.grad_p + mag_err * r_ave
        src = eqn.source + (mesh.V * self.mask)[:, None] * grad_p * e
        return eqn.replace(source=src)


@register("fvOption", "limitTemperature", "temperatureLimitsConstraint")
class TemperatureLimits(Option):
    """Clamp T (via the energy variable) into [Tmin, Tmax] (reference:
    constraints/fixedTemperatureConstraint family /
    limitTemperature)."""

    def __init__(self, name, d, mesh, case=None):
        super().__init__(name, d, mesh, case)
        self.t_min = float(self.dict.scalar("Tmin",
                                            self.dict.scalar("min", 0.0)))
        self.t_max = float(self.dict.scalar("Tmax",
                                            self.dict.scalar("max", 1e10)))

    def applies_to(self, field_name):
        return field_name in ("T", "e", "h")

    def constrain(self, mesh, field_name, eqn, env):
        lo, hi = self.t_min, self.t_max
        if field_name != "T" and "thermo" in (env or {}):
            lo = env["thermo"].he_from_t(jnp.asarray(lo))
            hi = env["thermo"].he_from_t(jnp.asarray(hi))
        psi = eqn.psi.data
        clamped = jnp.clip(psi, lo, hi)
        changed = (jnp.abs(clamped - psi) > 0).astype(psi.dtype) \
            * self.mask
        return eqn.set_values(mesh, changed, clamped)


@register("fvOption", "explicitSetValue", "vectorExplicitSetValue",
          "scalarExplicitSetValue")
class ExplicitSetValue(Option):
    """Hard-set field values in the selection (reference:
    constraints/explicitSetValue): injectionRate { U (1 0 0); }."""

    def __init__(self, name, d, mesh, case=None):
        super().__init__(name, d, mesh, case)
        inj = self.dict.subdict("injectionRate", required=True)
        self.values = {str(k): (np.asarray(v, float)
                                if isinstance(v, list) else float(v))
                       for k, v in inj.items()}

    def applies_to(self, field_name):
        return field_name in self.values

    def constrain(self, mesh, field_name, eqn, env):
        v = self.values[field_name]
        psi = eqn.psi.data
        if psi.ndim == 1:
            vals = jnp.full(mesh.n_cells, float(v), psi.dtype)
        else:
            vals = jnp.broadcast_to(jnp.asarray(v, psi.dtype),
                                    psi.shape)
        return eqn.set_values(mesh, self.mask, vals)
