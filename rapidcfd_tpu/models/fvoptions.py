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


@register("fvOption", "radialActuationDiskSource")
class RadialActuationDiskSource(ActuationDiskSource):
    """Actuation disk with radial thrust distribution (reference:
    sources/derived/radialActuationDiskSource/
    radialActuationDiskSourceTemplates.C:35-95): Tr(r) = T*(c0 + c1 r^2
    + c2 r^4)/intCoeffs about the zone's volume-averaged centre."""

    def __init__(self, name, d, mesh, case=None):
        super().__init__(name, d, mesh, case)
        coeffs = self.dict.lookup("coeffs", required=True)
        self.radial = [float(c) for c in coeffs]
        m = np.asarray(self.mask) > 0
        C = np.asarray(mesh.C)
        V = np.asarray(mesh.V)
        avg_c = (V[m, None] * C[m]).sum(0) / V[m].sum()
        r2 = ((C - avg_c) ** 2).sum(1)
        max_r = float(np.sqrt(r2[m].max())) if m.any() else 1.0
        c0, c1, c2 = self.radial
        int_coeffs = c0 + c1 * max_r ** 2 / 2.0 + c2 * max_r ** 4 / 3.0
        self.radial_w = jnp.asarray(
            (c0 + c1 * r2 + c2 * r2 ** 2) / max(int_coeffs, 1e-30),
            mesh.V.dtype)

    def add_sup(self, mesh, field_name, eqn, env):
        U = eqn.psi
        rho = env.get("rho")
        rho_up = rho.data[self.up_cell] if hasattr(rho, "data") else 1.0
        up_u = U.data[self.up_cell]
        a = 1.0 - self.cp / self.ct
        t_coeff = 2.0 * rho_up * self.area * jnp.linalg.norm(up_u) \
            * a * (1.0 - a)
        e = jnp.asarray(self.disk_dir, U.data.dtype)
        force = t_coeff * (e * up_u)
        w = self.mask * self.radial_w
        src = eqn.source - (mesh.V * w / self.v_zone)[:, None] * force
        return eqn.replace(source=src)


@register("fvOption", "rotorDiskSource")
class RotorDiskSource(Option):
    """Blade-element rotor disk (reference: sources/derived/
    rotorDiskSource/rotorDiskSourceTemplates.C:34-160 calculate()):
    per-cell blade-element force from tabulated Cd/Cl profiles in a
    cylindrical rotor frame, fixedTrim collective/cyclic pitch.

    TPU-first layout: everything radius-dependent (twist, chord,
    blended profile tables, local axes, coning rotations, disk area) is
    precomputed on the host into dense per-cell arrays; the jitted
    add_sup is pure gather-free vector math + one searchsorted lookup
    into a shared alpha grid. targetCoeffTrim (iterative trim) is not
    supported — use fixedTrim."""

    def __init__(self, name, d, mesh, case=None):
        super().__init__(name, d, mesh, case)
        c = self.dict
        self.n_blades = int(c.scalar("nBlades"))
        self.tip_effect = float(c.scalar("tipEffect", 1.0))
        om = c.lookup("omega")
        if om is None:
            rpm = float(c.scalar("rpm"))
            self.omega = rpm * 2.0 * np.pi / 60.0
        else:
            self.omega = float(om if not isinstance(om, tuple)
                               else Dimensioned.from_entry(om).value)
        self.rho_ref = float(c.scalar("rhoRef", 1.0))
        inlet_mode = c.word("inletFlowType", "local")
        self.inlet_u = None
        if inlet_mode == "fixed":
            self.inlet_u = np.asarray(c.lookup("inletVelocity",
                                               required=True), float)

        # geometry: origin + axis (cylindrical rotor frame)
        origin = np.asarray(c.lookup("origin", [0.0, 0.0, 0.0]), float)
        axis = np.asarray(c.lookup("axis", [0.0, 0.0, 1.0]), float)
        axis = axis / np.linalg.norm(axis)
        C = np.asarray(mesh.C)
        m = np.asarray(self.mask) > 0
        rel = C - origin
        z = rel @ axis
        perp = rel - z[:, None] * axis
        r = np.linalg.norm(perp, axis=1)
        er = perp / np.maximum(r, 1e-30)[:, None]
        et = np.cross(axis, er)
        psi = np.arctan2(er @ self._ortho(axis, 1),
                         er @ self._ortho(axis, 0))
        self.r = jnp.asarray(np.where(m, r, 1.0), mesh.V.dtype)
        # local basis rows (er, et, axis) per cell: world->local matmul
        basis = np.stack([er, et, np.broadcast_to(axis, er.shape)], 1)
        self.basis = jnp.asarray(basis, mesh.V.dtype)      # (n,3,3)
        self.r_max = float(r[m].max()) if m.any() else 1.0

        # disk area: boundary faces of the selection whose normal
        # aligns with the axis (reference setFaceArea, tol 0.8)
        own = np.asarray(mesh.owner)[:mesh.n_internal]
        nei = np.asarray(mesh.neighbour)
        sf = np.asarray(mesh.Sf)[:mesh.n_internal]
        msf = np.asarray(mesh.mag_sf)[:mesh.n_internal]
        nf = sf / np.maximum(msf, 1e-300)[:, None]
        align = np.abs(nf @ axis) > 0.8
        in_own, in_nei = m[own], m[nei]
        area = np.zeros(mesh.n_cells)
        sel = align & in_own & ~in_nei
        np.add.at(area, own[sel], msf[sel])
        sel = align & ~in_own & in_nei
        np.add.at(area, nei[sel], msf[sel])
        if not area[m].any():
            # selection without exposed axial internal faces (e.g. a
            # 1-cell-thick zone whose axial faces are boundaries): use
            # the per-cell axial extent, area = V/h with
            # h = 2*max_f |(Cf - C).axis|
            cf = np.asarray(mesh.Cf)[np.asarray(mesh.cell_faces)]
            dzc = np.abs((cf - C[:, None, :]) @ axis)
            act = np.abs(np.asarray(mesh.cell_sign))
            h = 2.0 * (dzc * act).max(1)
            if case is not None and not (h[m] > 1e-12).any():
                # axis-normal faces are dropped entirely (2D mesh with
                # empty patches): use the point span along the axis
                from ..mesh.polymesh import read_polymesh
                pts = read_polymesh(case.dir, case.region).points
                pz = pts @ axis
                h[:] = max(pz.max() - pz.min(), 1e-12)
            area = np.where(m, np.asarray(mesh.V)
                            / np.maximum(h, 1e-30), 0.0)
        self.area = jnp.asarray(area, mesh.V.dtype)

        # blade geometry: data ((profile (r twist chord)) ...)
        blade = c.subdict("blade", required=True)
        rows = blade.lookup("data", required=True)
        b_names = [str(row[0]) for row in rows]
        b_r = np.asarray([float(row[1][0]) for row in rows])
        b_twist = np.asarray([np.deg2rad(float(row[1][1]))
                              for row in rows])
        b_chord = np.asarray([float(row[1][2]) for row in rows])
        idx2 = np.clip(np.searchsorted(b_r, r), 1, len(b_r) - 1)
        idx1 = idx2 - 1
        inv_dr = np.clip((r - b_r[idx1])
                         / np.maximum(b_r[idx2] - b_r[idx1], 1e-30),
                         0.0, 1.0)
        self.twist = jnp.asarray(
            b_twist[idx1] + inv_dr * (b_twist[idx2] - b_twist[idx1]),
            mesh.V.dtype)
        self.chord = jnp.asarray(
            b_chord[idx1] + inv_dr * (b_chord[idx2] - b_chord[idx1]),
            mesh.V.dtype)

        # profiles: resample every Cd/Cl polar onto a shared alpha grid,
        # then blend the two bracketing profiles per cell (static invDr)
        profs = c.subdict("profiles", required=True)
        alpha_grid = np.linspace(-np.pi, np.pi, 181)
        tables = {}
        for pname, pd in profs.items():
            if not isinstance(pd, Dictionary):
                continue
            data = pd.lookup("data", required=True)
            al = np.asarray([np.deg2rad(float(rw[0])) for rw in data])
            cd = np.asarray([float(rw[1]) for rw in data])
            cl = np.asarray([float(rw[2]) for rw in data])
            order = np.argsort(al)
            tables[str(pname)] = (
                np.interp(alpha_grid, al[order], cd[order]),
                np.interp(alpha_grid, al[order], cl[order]))
        cd1 = np.stack([tables[b_names[i]][0] for i in idx1])
        cd2 = np.stack([tables[b_names[i]][0] for i in idx2])
        cl1 = np.stack([tables[b_names[i]][1] for i in idx1])
        cl2 = np.stack([tables[b_names[i]][1] for i in idx2])
        w = inv_dr[:, None]
        self.alpha_grid = jnp.asarray(alpha_grid, mesh.V.dtype)
        self.cd_tab = jnp.asarray(cd1 + w * (cd2 - cd1), mesh.V.dtype)
        self.cl_tab = jnp.asarray(cl1 + w * (cl2 - cl1), mesh.V.dtype)

        # fixedTrim pitch + flap coning (static per cell)
        trim = c.subdict("trimModel", required=False)
        t = (c.subdict("fixedTrimCoeffs", required=False)
             or Dictionary())
        theta0 = np.deg2rad(float(t.scalar("theta0", 0.0)))
        theta1c = np.deg2rad(float(t.scalar("theta1c", 0.0)))
        theta1s = np.deg2rad(float(t.scalar("theta1s", 0.0)))
        self.thetag = jnp.asarray(
            theta0 + theta1c * np.cos(psi) + theta1s * np.sin(psi),
            mesh.V.dtype)
        f = c.subdict("flapCoeffs", required=False) or Dictionary()
        beta0 = np.deg2rad(float(f.scalar("beta0", 0.0)))
        beta1c = np.deg2rad(float(f.scalar("beta1c", 0.0)))
        beta2s = np.deg2rad(float(f.scalar("beta2s", 0.0)))
        beta = beta0 - beta1c * np.cos(psi) - beta2s * np.sin(psi)
        cb, sb = np.cos(beta), np.sin(beta)
        zer, one = np.zeros_like(cb), np.ones_like(cb)
        R = np.stack([np.stack([cb, zer, -sb], -1),
                      np.stack([zer, one, zer], -1),
                      np.stack([sb, zer, cb], -1)], 1)
        self.R = jnp.asarray(R, mesh.V.dtype)
        self.invR = jnp.asarray(np.swapaxes(R, 1, 2), mesh.V.dtype)

    @staticmethod
    def _ortho(axis, i):
        """Two unit vectors orthogonal to axis (azimuth reference)."""
        a = np.asarray(axis, float)
        t = np.array([1.0, 0.0, 0.0]) if abs(a[0]) < 0.9 \
            else np.array([0.0, 1.0, 0.0])
        e0 = np.cross(a, t)
        e0 /= np.linalg.norm(e0)
        e1 = np.cross(a, e0)
        return e0 if i == 0 else e1

    def applies_to(self, field_name):
        return field_name == "U"

    def add_sup(self, mesh, field_name, eqn, env):
        U = eqn.psi
        u_in = U.data if self.inlet_u is None else jnp.broadcast_to(
            jnp.asarray(self.inlet_u, U.data.dtype), U.data.shape)
        uc = jnp.einsum("nij,nj->ni", self.basis, u_in)     # world->cyl
        uc = jnp.einsum("nij,nj->ni", self.R, uc)           # coning
        ur = jnp.zeros_like(uc[:, 0])
        ut = self.r * self.omega - uc[:, 1]
        uz = uc[:, 2]
        alpha_geom = self.thetag + self.twist
        if self.omega < 0:
            alpha_geom = jnp.pi - alpha_geom
        alpha_eff = alpha_geom - jnp.arctan2(-uz, ut)
        alpha_eff = jnp.where(alpha_eff > jnp.pi,
                              alpha_eff - 2 * jnp.pi, alpha_eff)
        alpha_eff = jnp.where(alpha_eff < -jnp.pi,
                              alpha_eff + 2 * jnp.pi, alpha_eff)
        # per-cell polar lookup on the shared alpha grid
        idx = jnp.clip(jnp.searchsorted(self.alpha_grid, alpha_eff),
                       1, self.alpha_grid.shape[0] - 1)
        a0 = self.alpha_grid[idx - 1]
        a1 = self.alpha_grid[idx]
        w = (alpha_eff - a0) / jnp.maximum(a1 - a0, 1e-30)
        rows = jnp.arange(self.cd_tab.shape[0])
        cd = (1 - w) * self.cd_tab[rows, idx - 1] \
            + w * self.cd_tab[rows, idx]
        cl = (1 - w) * self.cl_tab[rows, idx - 1] \
            + w * self.cl_tab[rows, idx]
        tip = (self.r / self.r_max < self.tip_effect).astype(cd.dtype)
        p_dyn = 0.5 * (ur ** 2 + ut ** 2 + uz ** 2)   # rho=1 (kinematic)
        f = p_dyn * self.chord * self.n_blades * self.area \
            / jnp.maximum(self.r, 1e-30) / (2.0 * jnp.pi)
        local = jnp.stack([jnp.zeros_like(f), -f * cd, tip * f * cl], -1)
        local = jnp.einsum("nij,nj->ni", self.invR, local)
        force = jnp.einsum("nji,nj->ni", self.basis, local)  # cyl->world
        src = eqn.source + self.mask[:, None] * force
        return eqn.replace(source=src)


@register("fvOption", "solidificationMeltingSource")
class SolidificationMeltingSource(Option):
    """Enthalpy-porosity phase change (reference: sources/derived/
    solidificationMeltingSource/solidificationMeltingSource.C:update +
    Templates.C:apply): Carman-Kozeny momentum blockage in the solid
    fraction plus a Boussinesq melt buoyancy source.

    TPU-first restatement: the reference relaxes a stored alpha1 field
    toward equilibrium each step; here the liquid fraction is the
    equilibrium response alpha1 = clip(0.5 + Cp*(T - Tmelt)/L, 0, 1)
    of the cell temperature (same fixed point, no carried state —
    required for a pure jitted option)."""

    def __init__(self, name, d, mesh, case=None):
        super().__init__(name, d, mesh, case)
        c = self.dict
        self.t_melt = float(c.scalar("Tmelt"))
        self.L = float(c.scalar("L"))
        self.cu = float(c.scalar("Cu", 100000.0))
        self.q = float(c.scalar("q", 0.001))
        self.beta = float(c.scalar("beta"))
        self.rho_ref = float(c.scalar("rhoRef", 1.0))
        self.cp = float(c.scalar("Cp", 1.0))       # lookup-mode Cp
        self.t_name = c.word("TName", "T")
        g = [0.0, 0.0, -9.81]
        if case is not None:
            gp = os.path.join(case.dir, "constant", "g")
            if os.path.isfile(gp):
                gd = parse_file(gp)
                gv = gd.lookup("value")
                if gv is not None:
                    g = [float(x) for x in (
                        gv if isinstance(gv, list) else gv[-1])]
        self.g = np.asarray(g, float)

    def alpha1(self, T_data):
        return jnp.clip(0.5 + self.cp * (T_data - self.t_melt) / self.L,
                        0.0, 1.0)

    def applies_to(self, field_name):
        return field_name in ("U", self.t_name, "h", "e")

    def add_sup(self, mesh, field_name, eqn, env):
        T = env.get(self.t_name) or env.get("T")
        if T is None:
            return eqn
        a1 = self.alpha1(T.data)
        if field_name == "U":
            # Carman-Kozeny blockage (implicit, stabilizing)
            sp = self.cu * (1.0 - a1) ** 2 / (a1 ** 3 + self.q)
            eqn = eqn.replace(diag=eqn.diag + mesh.V * self.mask * sp)
            # melt-pool Boussinesq buoyancy about Tmelt
            sb = self.rho_ref * self.beta * (T.data - self.t_melt)
            gvec = jnp.asarray(self.g, eqn.source.dtype)
            src = eqn.source - (mesh.V * self.mask * sb)[:, None] * gvec
            return eqn.replace(source=src)
        # energy equation: latent heat -L/Cp * d(alpha1)/dt
        dt = env.get("dt")
        if dt is None or T.old is None:
            return eqn
        dadt = (a1 - self.alpha1(T.old.data)) / dt
        scale = self.L / self.cp if field_name == self.t_name else self.L
        # melting (dadt > 0) absorbs latent heat from the sensible field
        src = eqn.source - mesh.V * self.mask * scale * dadt
        return eqn.replace(source=src)


@register("fvOption", "effectivenessHeatExchangerSource")
class EffectivenessHeatExchangerSource(Option):
    """Effectiveness-NTU heat exchanger (reference: sources/derived/
    effectivenessHeatExchangerSource/effectivenessHeatExchangerSource.C:
    addSup): Qt = e(|phi_zone|, mdot2)*(T2in - T1in)*Cp*|phi_zone|,
    distributed over the selection weighted by V*|U|*max(Tref-T, 0).

    The 2D effectiveness table is collapsed to e(|phi|) at the fixed
    secondaryMassFlowRate during construction (host numpy); the jitted
    add_sup does one jnp.interp + masked reductions (gsum-ready).
    Applies to the energy/temperature equation: for a T equation the
    source is divided by Cp."""

    def __init__(self, name, d, mesh, case=None):
        super().__init__(name, d, mesh, case)
        c = self.dict
        self.mdot2 = float(c.scalar("secondaryMassFlowRate"))
        self.t2_in = float(c.scalar("secondaryInletT"))
        self.t1_in = float(c.scalar("primaryInletT"))
        self.cp = float(c.scalar("Cp", 1005.0))
        self.t_name = c.word("TName", "T")
        zone = c.word("faceZone")

        # faceZone faces -> device slots with flow sign (+1 with Sf)
        from ..mesh.polymesh import read_face_zones
        zones = read_face_zones(case.dir, case.region) if case else {}
        if zone not in zones:
            raise KeyError(f"effectivenessHeatExchangerSource: no "
                           f"faceZone '{zone}'")
        labels = np.asarray(zones[zone][0], np.int64)
        inv_face = np.zeros(mesh.n_faces, np.int64)
        inv_face[np.asarray(case.maps.face_perm)] = np.arange(
            mesh.n_faces)
        dev_faces = inv_face[labels]
        fmask = np.zeros(mesh.n_faces)
        fmask[dev_faces] = 1.0
        self.face_mask = jnp.asarray(fmask, mesh.V.dtype)

        # effectiveness table: inline "table ((mdot1 ((mdot2 e)...))...)"
        # or an OpenFOAM interpolation2DTable file via "fileName"
        rows = c.lookup("table")
        if rows is None:
            fn = c.word("fileName", "")
            if case is not None and fn:
                # OpenFOAM 2D-table file: one outer list value; wrap it
                # as a dictionary entry to reuse the parser
                from ..utils.dictionary import parse_dictionary
                path = os.path.join(case.dir, fn.strip('"'))
                fn_real = path.replace("$FOAM_CASE", case.dir)
                with open(fn_real) as fh:
                    body = parse_dictionary("table " + fh.read() + ";")
                rows = body.lookup("table")
        if rows is None:
            raise KeyError("effectivenessHeatExchangerSource: no "
                           "'table' or readable 'fileName'")
        if len(rows) == 1 and isinstance(rows[0], list):
            rows = rows[0]
        m1, eff = [], []
        for row in rows:
            m1.append(float(row[0]))
            sub = row[1]
            s_m, s_e = [float(r[0]) for r in sub], \
                [float(r[1]) for r in sub]
            eff.append(float(np.interp(self.mdot2, s_m, s_e)))
        order = np.argsort(np.asarray(m1))
        self.e_phi = jnp.asarray(np.asarray(m1)[order], mesh.V.dtype)
        self.e_val = jnp.asarray(np.asarray(eff)[order], mesh.V.dtype)

    def applies_to(self, field_name):
        return field_name in (self.t_name, "h", "e")

    def add_sup(self, mesh, field_name, eqn, env):
        from ..linalg.solvers import gmax, gsum
        T = env.get(self.t_name) or env.get("T")
        phi = env.get("phi")
        U = env.get("U")
        if T is None or phi is None:
            return eqn
        total_phi = gsum(self.face_mask * phi.data)
        mag_phi = jnp.abs(total_phi)
        e = jnp.interp(mag_phi, self.e_phi, self.e_val)
        qt = e * (self.t2_in - self.t1_in) * self.cp * mag_phi

        tc = T.data
        sel = self.mask > 0
        big = jnp.asarray(1e30, tc.dtype)
        t_max = gmax(jnp.where(sel, tc, -big))
        t_min = -gmax(jnp.where(sel, -tc, -big))
        t_ref = jnp.where(qt > 0, t_max, t_min)
        d_t = jnp.where(qt > 0, jnp.maximum(t_ref - tc, 0.0),
                        jnp.maximum(tc - t_ref, 0.0))
        umag = jnp.linalg.norm(U.data, axis=-1) if U is not None \
            else jnp.ones_like(tc)
        w = mesh.V * self.mask * umag * d_t
        w_sum = gsum(w)
        scale = 1.0 / self.cp if field_name == self.t_name else 1.0
        src = eqn.source + qt * scale * w / jnp.maximum(w_sum, 1e-30)
        return eqn.replace(source=src)
