"""functionObjects — run-time postprocessing hooks.

Capability surface of the reference's functionObject system (reference:
src/OpenFOAM/db/functionObjects/functionObjectList.H:58 executed from
Time::run(), and the postProcessing packs src/postProcessing/
functionObjects/{field,forces,utilities}): hooks read from
system/controlDict `functions {}` run after every step, writing
time-series under postProcessing/<name>/<startTime>/ in the reference's
file layout (so foamLog-style tooling keeps working).

Host-side by design (SURVEY.md §5.5: these consume downloaded scalars
between jitted steps — the reference pays the same device->host copy).
"""

from __future__ import annotations

import os

import numpy as np

from ..utils.dictionary import Dictionary
from ..utils.logging import info
from ..utils.registry import lookup, register


class FunctionObject:
    def __init__(self, name: str, d: Dictionary, case):
        self.name = name
        self.dict = d
        self.case = case
        self.out_dir = os.path.join(case.dir, "postProcessing", name,
                                    case.time.name)
        self._files = {}

    def file(self, fname: str, header: str = ""):
        if fname not in self._files:
            os.makedirs(self.out_dir, exist_ok=True)
            f = open(os.path.join(self.out_dir, fname), "w")
            if header:
                f.write(header)
            self._files[fname] = f
        return self._files[fname]

    def execute(self, time, fields: dict, mesh):
        raise NotImplementedError

    def close(self):
        for f in self._files.values():
            f.close()


@register("functionObject", "probes")
class Probes(FunctionObject):
    """Point probes by nearest cell (reference: sampling/probes)."""

    def __init__(self, name, d, case):
        super().__init__(name, d, case)
        pts = np.asarray(d.lookup("probeLocations", required=True),
                         dtype=float)
        self.field_names = [str(w) for w in d.lookup("fields", required=True)]
        C = np.asarray(case.mesh.C)
        self.cells = [int(np.argmin(((C - p) ** 2).sum(1))) for p in pts]
        self.points = pts

    def execute(self, time, fields, mesh):
        for name in self.field_names:
            if name not in fields:
                continue
            data = np.asarray(fields[name].data)
            hdr = " ".join(
                "(" + " ".join(f"{float(x):g}" for x in pt) + ")"
                for pt in self.points)
            f = self.file(name, header=f"# probes: {hdr}\n")
            vals = []
            for c in self.cells:
                v = data[c]
                vals.append("(" + " ".join(f"{x:.8g}" for x in v) + ")"
                            if v.ndim else f"{v:.8g}")
            f.write(f"{time:<14.8g}" + " ".join(vals) + "\n")
            f.flush()


@register("functionObject", "fieldMinMax")
class FieldMinMax(FunctionObject):
    """reference: postProcessing/field/fieldMinMax."""

    def __init__(self, name, d, case):
        super().__init__(name, d, case)
        self.field_names = [str(w) for w in d.lookup("fields", required=True)]
        self.log = d.boolean("log", True)

    def execute(self, time, fields, mesh):
        f = self.file("fieldMinMax.dat",
                      header="# Time field min max\n")
        for name in self.field_names:
            if name not in fields:
                continue
            data = np.asarray(fields[name].data)
            if data.ndim > 1:
                data = np.linalg.norm(data, axis=-1)
            mn, mx = float(data.min()), float(data.max())
            f.write(f"{time:.8g} {name} {mn:.8g} {mx:.8g}\n")
            if self.log:
                info(f"fieldMinMax {self.name}: min({name}) = {mn:.6g} "
                     f"max({name}) = {mx:.6g}")
        f.flush()


@register("functionObject", "forces")
class Forces(FunctionObject):
    """Pressure + viscous patch force integrals (reference:
    postProcessing/forces/forces.C; incompressible form with rhoRef)."""

    def __init__(self, name, d, case):
        super().__init__(name, d, case)
        self.patches = [str(w) for w in d.lookup("patches", required=True)]
        self.rho_ref = float(d.scalar("rhoInf", 1.0))
        self.cofr = np.asarray(d.lookup("CofR", [0.0, 0.0, 0.0]),
                               dtype=float)

    def execute(self, time, fields, mesh):
        if "U" not in fields or "p" not in fields:
            return
        U, p = fields["U"], fields["p"]
        nu_eff = fields.get("nuEff")
        from ..ops import fvc
        sng = fvc.sn_grad(mesh, U)
        fp_total = np.zeros(3)
        fv_total = np.zeros(3)
        mom = np.zeros(3)
        for patch in mesh.patches:
            if patch.name not in self.patches:
                continue
            sl = slice(patch.start, patch.start + patch.size)
            bsl = slice(patch.bstart, patch.bstart + patch.size)
            sf = np.asarray(mesh.Sf[sl])
            cf = np.asarray(mesh.Cf[sl])
            p_b = np.asarray(p.bvalues[bsl])
            fp = self.rho_ref * sf * p_b[:, None]
            sngu = np.asarray(sng.data[sl])
            msf = np.asarray(mesh.mag_sf[sl])
            nu_b = np.asarray(nu_eff.bvalues[bsl]) \
                if nu_eff is not None else 0.0
            fv = -self.rho_ref * (nu_b * msf)[:, None] * sngu
            fp_total += fp.sum(0)
            fv_total += fv.sum(0)
            mom += np.cross(cf - self.cofr, fp + fv).sum(0)
        f = self.file("forces.dat",
                      header="# Time forces(pressure viscous) moment\n")
        def v3(x):
            return "(" + " ".join(f"{c:.8g}" for c in x) + ")"
        f.write(f"{time:.8g}\t({v3(fp_total)} {v3(fv_total)})\t"
                f"{v3(mom)}\n")
        f.flush()
        self.last = (fp_total, fv_total, mom)


@register("functionObject", "forceCoeffs")
class ForceCoeffs(Forces):
    """Cd/Cl/Cm from the patch force integrals (reference:
    postProcessing/forces/forceCoeffs/forceCoeffs.C)."""

    def __init__(self, name, d, case):
        super().__init__(name, d, case)
        self.lift_dir = np.asarray(d.lookup("liftDir", [0.0, 1.0, 0.0]),
                                   dtype=float)
        self.drag_dir = np.asarray(d.lookup("dragDir", [1.0, 0.0, 0.0]),
                                   dtype=float)
        self.pitch_axis = np.asarray(
            d.lookup("pitchAxis", [0.0, 0.0, 1.0]), dtype=float)
        self.mag_u_inf = float(d.scalar("magUInf", 1.0))
        self.l_ref = float(d.scalar("lRef", 1.0))
        self.a_ref = float(d.scalar("Aref", 1.0))

    def execute(self, time, fields, mesh):
        Forces.execute(self, time, fields, mesh)
        if not hasattr(self, "last"):
            return
        fp, fv, mom = self.last
        q = 0.5 * self.rho_ref * self.mag_u_inf ** 2
        ftot = fp + fv
        cd = float((ftot * self.drag_dir).sum()) / (q * self.a_ref)
        cl = float((ftot * self.lift_dir).sum()) / (q * self.a_ref)
        cm = float((mom * self.pitch_axis).sum()) \
            / (q * self.a_ref * self.l_ref)
        f = self.file("forceCoeffs.dat", header="# Time Cm Cd Cl\n")
        f.write(f"{time:.8g}\t{cm:.8g}\t{cd:.8g}\t{cl:.8g}\n")
        f.flush()
        self.coeffs = (cm, cd, cl)


@register("functionObject", "fieldAverage")
class FieldAverage(FunctionObject):
    """Running time averages (mean + prime2Mean) of selected fields
    (reference: postProcessing/field/fieldAverage)."""

    def __init__(self, name, d, case):
        super().__init__(name, d, case)
        entries = d.lookup("fields", required=True)
        # accepts both the reference's per-field sub-dict list and a
        # plain word list
        self.field_names = []
        for e in entries:
            self.field_names.append(str(e if not isinstance(e, tuple)
                                        else e[0]))
        self.t0 = None
        self.means = {}
        self.p2means = {}

    def execute(self, time, fields, mesh):
        if self.t0 is None:
            self.t0 = time
        for name in self.field_names:
            if name not in fields:
                continue
            x = np.asarray(fields[name].data)
            if name not in self.means:
                self.means[name] = x.copy()
                self.p2means[name] = x * x
                self._n = 1
            else:
                n = self._n
                self.means[name] = (self.means[name] * n + x) / (n + 1)
                self.p2means[name] = (self.p2means[name] * n + x * x) \
                    / (n + 1)
        self._n += 1

    def mean(self, name):
        return self.means.get(name)


@register("functionObject", "sets")
class SampledSets(FunctionObject):
    """Line sampling (reference: sampling/sampledSet/sampledSets with the
    uniform set type + raw/csv writers). Nearest-cell sampling."""

    def __init__(self, name, d, case):
        super().__init__(name, d, case)
        self.field_names = [str(w) for w in d.lookup("fields",
                                                     required=True)]
        self.writer = str(d.word("setFormat", "raw"))
        self.interval = int(d.scalar("outputInterval", 1))
        self._count = 0
        self.sets = []
        sets_d = d.subdict("sets", required=False) or Dictionary()
        C = np.asarray(case.mesh.C)
        for sname, sd in sets_d.items():
            if not isinstance(sd, Dictionary):
                continue
            typ = str(sd.word("type", "uniform"))
            if typ not in ("uniform", "midPoint", "midPointAndFace"):
                info(f"sets: unsupported set type '{typ}' — skipped")
                continue
            start = np.asarray(sd.lookup("start", required=True),
                               dtype=float)
            end = np.asarray(sd.lookup("end", required=True), dtype=float)
            npts = int(sd.scalar("nPoints", 100))
            pts = start[None, :] + (end - start)[None, :] \
                * np.linspace(0.0, 1.0, npts)[:, None]
            cells = np.argmin(
                ((C[None, :, :] - pts[:, None, :]) ** 2).sum(-1), axis=1)
            axis = str(sd.word("axis", "distance"))
            if axis == "x":
                coord = pts[:, 0]
            elif axis == "y":
                coord = pts[:, 1]
            elif axis == "z":
                coord = pts[:, 2]
            else:
                coord = np.linalg.norm(pts - start, axis=1)
            self.sets.append((str(sname), pts, cells, coord))

    def execute(self, time, fields, mesh):
        self._count += 1
        if self._count % self.interval:
            return
        ext = {"csv": "csv", "raw": "xy", "gnuplot": "xy"}.get(
            self.writer, "xy")
        for sname, pts, cells, coord in self.sets:
            for fname in self.field_names:
                if fname not in fields:
                    continue
                data = np.asarray(fields[fname].data)[cells]
                out = os.path.join(self.out_dir, f"{time:g}")
                os.makedirs(out, exist_ok=True)
                sep = "," if self.writer == "csv" else "\t"
                with open(os.path.join(out, f"{sname}_{fname}.{ext}"),
                          "w") as f:
                    if self.writer == "csv":
                        cols = ([f"{fname}_{c}" for c in "xyz"]
                                if data.ndim > 1 else [fname])
                        f.write("distance," + ",".join(cols) + "\n")
                    for i in range(len(cells)):
                        v = data[i]
                        vs = sep.join(f"{x:.8g}" for x in v) \
                            if v.ndim else f"{v:.8g}"
                        f.write(f"{coord[i]:.8g}{sep}{vs}\n")


@register("functionObject", "fieldValue", "cellSource", "faceSource")
class FieldValue(FunctionObject):
    """Region integrals/averages (reference: postProcessing/field/
    fieldValues cellSource/faceSource). Supported operations: volAverage,
    volIntegrate, areaAverage, areaIntegrate, sum, min, max."""

    def __init__(self, name, d, case):
        super().__init__(name, d, case)
        self.field_names = [str(w) for w in d.lookup("fields",
                                                     required=True)]
        self.op = str(d.word("operation", "volAverage"))
        self.source = str(d.word("source", "all"))
        self.source_name = str(d.word("sourceName", ""))
        self.log = d.boolean("log", False)

    def execute(self, time, fields, mesh):
        f = self.file("fieldValue.dat", header="# Time field value\n")
        V = np.asarray(mesh.V)
        for name in self.field_names:
            if name not in fields:
                continue
            fld = fields[name]
            if self.source == "patch":
                patch = next((p for p in mesh.patches
                              if p.name == self.source_name), None)
                if patch is None:
                    continue
                bsl = slice(patch.bstart, patch.bstart + patch.size)
                x = np.asarray(fld.bvalues[bsl])
                w = np.asarray(mesh.mag_sf[
                    patch.start:patch.start + patch.size])
            else:
                x = np.asarray(fld.data)
                w = V
            if x.ndim > 1:
                wx = w[:, None]
            else:
                wx = w
            if self.op in ("volAverage", "areaAverage"):
                val = (x * wx).sum(0) / w.sum()
            elif self.op in ("volIntegrate", "areaIntegrate"):
                val = (x * wx).sum(0)
            elif self.op == "sum":
                val = x.sum(0)
            elif self.op == "min":
                val = x.min(0)
            elif self.op == "max":
                val = x.max(0)
            else:
                raise KeyError(f"fieldValue: unknown operation "
                               f"'{self.op}'")
            val = np.atleast_1d(val)
            vs = " ".join(f"{v:.8g}" for v in val)
            f.write(f"{time:.8g} {name} {vs}\n")
            if self.log:
                info(f"fieldValue {self.name}: {self.op}({name}) = {vs}")
        f.flush()


def _write_derived(case, name, vf):
    # mark=False: a derived-field write must not consume the step's
    # write trigger (it starved later FOs and the solver's own writes)
    case.write_fields([vf.replace(name=name)], mark=False)


@register("functionObject", "surfaces")
class SampledSurfaces(FunctionObject):
    """Surface sampling (reference: sampling/sampledSurface/
    sampledSurfaces): 'patch' surfaces write the exact patch geometry
    and face values; 'plane' surfaces sample a triangulated cutting
    plane by nearest cell. Writer: legacy-ascii VTK polydata."""

    def __init__(self, name, d, case):
        super().__init__(name, d, case)
        self.field_names = [str(w) for w in d.lookup("fields",
                                                     required=True)]
        self.interval = int(d.scalar("outputInterval", 1))
        # surfaceFormat: vtk (legacy polydata, default) | ensight
        # (EnSight Gold ascii case/geo/variable files — reference:
        # sampling/sampledSurface/writers/ensight)
        self.fmt = str(d.word("surfaceFormat", "vtk"))
        self._count = 0
        self.surfaces = []
        surf_d = d.subdict("surfaces", required=False) or Dictionary()
        mesh = case.mesh
        pmesh = case.pmesh
        for sname, sd in surf_d.items():
            if not isinstance(sd, Dictionary):
                continue
            typ = str(sd.word("type", "patch"))
            if typ in ("patch", "patchInternalField"):
                pname = str(sd.word("patchName",
                                    sd.word("patches", "")) or "")
                patch = next((p for p in mesh.patches
                              if p.name == pname), None)
                if patch is None:
                    info(f"surfaces: unknown patch '{pname}' — skipped")
                    continue
                # exact patch polygons from the polyMesh
                fp, off = pmesh.face_points, pmesh.face_offsets
                polys = [fp[off[f]:off[f + 1]].tolist()
                         for f in range(patch.start,
                                        patch.start + patch.size)]
                self.surfaces.append(("patch", str(sname), patch, polys,
                                      np.asarray(pmesh.points)))
            elif typ == "plane":
                pd = sd.subdict("planeDesc", required=False) or sd
                base = np.asarray(pd.lookup("basePoint", required=True),
                                  dtype=float)
                normal = np.asarray(pd.lookup("normalVector",
                                              required=True), dtype=float)
                normal = normal / np.linalg.norm(normal)
                n_u = int(sd.scalar("nPoints", 40))
                # orthonormal in-plane basis
                a = np.array([1.0, 0, 0]) \
                    if abs(normal[0]) < 0.9 else np.array([0, 1.0, 0])
                e1 = np.cross(normal, a)
                e1 /= np.linalg.norm(e1)
                e2 = np.cross(normal, e1)
                C = np.asarray(case.mesh.C)
                ext = (C - base) - np.outer((C - base) @ normal, normal)
                r1 = (ext @ e1).max() - (ext @ e1).min()
                r2 = (ext @ e2).max() - (ext @ e2).min()
                u = np.linspace((ext @ e1).min(), (ext @ e1).max(), n_u)
                w = np.linspace((ext @ e2).min(), (ext @ e2).max(), n_u)
                uu, ww = np.meshgrid(u, w)
                pts = base[None, :] + uu.reshape(-1, 1) * e1 \
                    + ww.reshape(-1, 1) * e2
                cells = np.argmin(
                    ((C[None, :, :] - pts[:, None, :]) ** 2).sum(-1),
                    axis=1)
                # quad connectivity on the structured grid
                quads = []
                for j in range(n_u - 1):
                    for i in range(n_u - 1):
                        p0 = j * n_u + i
                        quads.append([p0, p0 + 1, p0 + n_u + 1, p0 + n_u])
                self.surfaces.append(("plane", str(sname), cells, quads,
                                      pts))
            elif typ in ("isoSurface", "isoSurfaceCell"):
                iso_field = str(sd.word("isoField", "p"))
                iso_val = float(sd.scalar("isoValue", 0.0))
                self.surfaces.append(("iso", str(sname),
                                      (iso_field, iso_val), None, None))
            elif typ == "triSurfaceMesh":
                surf_file = str(sd.word("surface", sname + ".stl"))
                path = os.path.join(case.dir, "constant", "triSurface",
                                    surf_file)
                from ..mesh.trisurface import read_surface
                try:
                    tsurf = read_surface(path)
                except FileNotFoundError:
                    info(f"surfaces: missing {path} — skipped")
                    continue
                from ..mesh.meshsearch import MeshSearch
                ms = MeshSearch(mesh)
                fc = tsurf.face_centres()
                cells = ms.find_cell(fc)
                near = ms.find_nearest_cell(fc)
                cells = np.where(cells >= 0, cells, near)
                self.surfaces.append(("tri", str(sname), cells,
                                      tsurf.faces.tolist(),
                                      tsurf.points))
            else:
                info(f"surfaces: unsupported type '{typ}' — skipped")
        self._point_interp = None

    def _write_vtk(self, path, points, polys, cell_data: dict):
        with open(path, "w") as f:
            f.write("# vtk DataFile Version 2.0\n"
                    "rapidcfd_tpu sampled surface\nASCII\n"
                    "DATASET POLYDATA\n")
            f.write(f"POINTS {len(points)} float\n")
            for p in points:
                f.write(f"{p[0]:.8g} {p[1]:.8g} {p[2]:.8g}\n")
            sz = sum(len(pl) + 1 for pl in polys)
            f.write(f"POLYGONS {len(polys)} {sz}\n")
            for pl in polys:
                f.write(str(len(pl)) + " "
                        + " ".join(str(int(x)) for x in pl) + "\n")
            f.write(f"CELL_DATA {len(polys)}\n")
            for fname, vals in cell_data.items():
                if vals.ndim > 1:
                    f.write(f"VECTORS {fname} float\n")
                    for v in vals:
                        f.write(f"{v[0]:.8g} {v[1]:.8g} {v[2]:.8g}\n")
                else:
                    f.write(f"SCALARS {fname} float 1\n"
                            "LOOKUP_TABLE default\n")
                    for v in vals:
                        f.write(f"{v:.8g}\n")

    def _write_ensight(self, out, sname, points, polys,
                       cell_data: dict):
        """EnSight Gold ascii (reference: sampledSurface/writers/
        ensight): <name>.case + .geo + one variable file per field,
        self-contained per write time (ParaView-readable)."""
        base = os.path.join(out, sname)
        with open(base + ".geo", "w") as f:
            f.write("EnSight Geometry File\n"
                    "rapidcfd_tpu sampled surface\n"
                    "node id assign\nelement id assign\n"
                    "part\n{:10d}\n{}\ncoordinates\n{:10d}\n".format(
                        1, sname, len(points)))
            for c in range(3):
                for p in points:
                    f.write(f"{p[c]:12.5e}\n")
            f.write(f"nsided\n{len(polys):10d}\n")
            for pl in polys:
                f.write(f"{len(pl):10d}\n")
            for pl in polys:
                f.write(" ".join(str(int(x) + 1) for x in pl) + "\n")
        lines = ["FORMAT", "type: ensight gold", "GEOMETRY",
                 f"model: {sname}.geo", "VARIABLE"]
        for fname, vals in cell_data.items():
            kind = "vector" if vals.ndim > 1 else "scalar"
            vfile = f"{sname}.{fname}"
            lines.append(f"{kind} per element: {fname} {vfile}")
            with open(os.path.join(out, vfile), "w") as f:
                f.write(f"{fname}\npart\n{1:10d}\nnsided\n")
                if vals.ndim > 1:
                    for c in range(3):
                        for v in vals:
                            f.write(f"{v[c]:12.5e}\n")
                else:
                    for v in vals:
                        f.write(f"{v:12.5e}\n")
        with open(base + ".case", "w") as f:
            f.write("\n".join(lines) + "\n")

    def execute(self, time, fields, mesh):
        self._count += 1
        if self._count % self.interval:
            return
        for kind, sname, sel, polys, pts in self.surfaces:
            if kind == "iso":
                iso_field, iso_val = sel
                if iso_field not in fields:
                    continue
                fld = fields[iso_field]
                if self._point_interp is None:
                    from ..mesh.pointinterp import \
                        build_point_interpolator
                    self._point_interp = build_point_interpolator(
                        self.case.pmesh, mesh)
                from ..mesh.isosurface import iso_surface
                pv = np.asarray(self._point_interp(fld.data,
                                                   fld.bvalues))
                surf, tri_cells = iso_surface(
                    mesh, self.case.pmesh, np.asarray(fld.data), pv,
                    iso_val)
                if surf.n_faces == 0:
                    continue
                pts = surf.points
                polys = surf.faces.tolist()
                sel = tri_cells
            cell_data = {}
            for fname in self.field_names:
                if fname not in fields:
                    continue
                fld = fields[fname]
                if kind == "patch":
                    patch = sel
                    bsl = slice(patch.bstart, patch.bstart + patch.size)
                    cell_data[fname] = np.asarray(fld.bvalues[bsl])
                elif kind in ("iso", "tri"):
                    cell_data[fname] = np.asarray(fld.data)[sel]
                else:
                    vals = np.asarray(fld.data)[sel]
                    # face value = mean of its 4 corner samples
                    q = np.asarray(polys)
                    cell_data[fname] = vals[q].mean(axis=1)
            if not cell_data:
                continue
            out = os.path.join(self.out_dir, f"{time:g}")
            os.makedirs(out, exist_ok=True)
            if self.fmt == "ensight":
                self._write_ensight(out, sname, np.asarray(pts),
                                    polys, cell_data)
            else:
                self._write_vtk(os.path.join(out, f"{sname}.vtk"),
                                np.asarray(pts), polys, cell_data)


@register("functionObject", "vorticity")
class Vorticity(FunctionObject):
    """curl(U) written at write times (reference:
    postProcessing/utilities/vorticity)."""

    def execute(self, time, fields, mesh):
        if "U" not in fields or not self.case.time.write_time():
            return
        from ..ops import fvc
        import jax.numpy as jnp
        U = fields["U"]
        g = fvc.grad(mesh, U)

        def curl(t):
            return jnp.stack([t[..., 1, 2] - t[..., 2, 1],
                              t[..., 2, 0] - t[..., 0, 2],
                              t[..., 0, 1] - t[..., 1, 0]], axis=-1)
        w = U.with_calculated_bcs(curl(g.data), curl(g.bvalues),
                                  g.dims, "vorticity")
        _write_derived(self.case, "vorticity", w)


@register("functionObject", "Q")
class QCriterion(FunctionObject):
    """Q = 0.5(|Omega|^2 - |S|^2) (reference:
    postProcessing/utilities/Q)."""

    def execute(self, time, fields, mesh):
        if "U" not in fields or not self.case.time.write_time():
            return
        from ..ops import fvc
        import jax.numpy as jnp
        U = fields["U"]
        g = fvc.grad(mesh, U)

        def q(t):
            s = 0.5 * (t + jnp.swapaxes(t, -1, -2))
            o = 0.5 * (t - jnp.swapaxes(t, -1, -2))
            return 0.5 * ((o * o).sum((-2, -1)) - (s * s).sum((-2, -1)))
        qf = U.with_calculated_bcs(q(g.data), q(g.bvalues),
                                   g.dims * g.dims, "Q")
        _write_derived(self.case, "Q", qf)


@register("functionObject", "wallShearStress")
class WallShearStress(FunctionObject):
    """tau_w = nuEff * snGrad(U) on wall patches, logged min/max
    (reference: postProcessing/utilities/wallShearStress)."""

    def execute(self, time, fields, mesh):
        if "U" not in fields:
            return
        from ..ops import fvc
        U = fields["U"]
        nu_eff = fields.get("nuEff")
        sng = fvc.sn_grad(mesh, U)
        f = self.file("wallShearStress.dat",
                      header="# Time patch min max\n")
        for patch in mesh.patches:
            if patch.type != "wall" or patch.size == 0:
                continue
            sl = slice(patch.start, patch.start + patch.size)
            bsl = slice(patch.bstart, patch.bstart + patch.size)
            nu_b = np.asarray(nu_eff.bvalues[bsl]) \
                if nu_eff is not None else 1.0
            tau = np.linalg.norm(
                np.asarray(sng.data[sl]), axis=-1) * nu_b
            f.write(f"{time:.8g} {patch.name} {tau.min():.8g} "
                    f"{tau.max():.8g}\n")
        f.flush()


@register("functionObject", "yPlusRAS", "yPlus")
class YPlus(FunctionObject):
    """y+ on wall patches from the wall-function viscosity (reference:
    postProcessing/utilities/yPlusRAS)."""

    def execute(self, time, fields, mesh):
        if "U" not in fields:
            return
        from ..ops import fvc
        U = fields["U"]
        nu_eff = fields.get("nuEff")
        nu = fields.get("nu")
        sng = fvc.sn_grad(mesh, U)
        f = self.file("yPlus.dat", header="# Time patch min max avg\n")
        for patch in mesh.patches:
            if patch.type != "wall" or patch.size == 0:
                continue
            sl = slice(patch.start, patch.start + patch.size)
            bsl = slice(patch.bstart, patch.bstart + patch.size)
            y = 1.0 / np.asarray(mesh.patch_delta_coeffs(patch))
            nu_w = np.asarray(nu_eff.bvalues[bsl]) \
                if nu_eff is not None else 0.0
            nu_l = np.asarray(nu.bvalues[bsl]) if nu is not None \
                else (np.asarray(nu.value) if hasattr(nu, "value")
                      else 1e-5)
            mag_grad = np.linalg.norm(np.asarray(sng.data[sl]), axis=-1)
            u_tau = np.sqrt(np.maximum((nu_w + nu_l) * mag_grad, 0.0))
            yp = u_tau * y / np.maximum(nu_l, 1e-300)
            f.write(f"{time:.8g} {patch.name} {yp.min():.8g} "
                    f"{yp.max():.8g} {yp.mean():.8g}\n")
        f.flush()


@register("functionObject", "Lambda2")
class Lambda2(FunctionObject):
    """Lambda2 vortex criterion: second eigenvalue of S^2 + Omega^2
    (reference: postProcessing/utilities/Lambda2)."""

    def execute(self, time, fields, mesh):
        if "U" not in fields or not self.case.time.write_time():
            return
        import jax.numpy as jnp
        from ..ops import fvc
        U = fields["U"]
        g = fvc.grad(mesh, U)

        def lam2(t):
            s = 0.5 * (t + jnp.swapaxes(t, -1, -2))
            o = 0.5 * (t - jnp.swapaxes(t, -1, -2))
            m = s @ s + o @ o
            ev = jnp.linalg.eigvalsh(m)      # ascending
            return ev[..., 1]
        f = U.with_calculated_bcs(lam2(g.data), lam2(g.bvalues),
                                  g.dims * g.dims, "Lambda2")
        _write_derived(self.case, "Lambda2", f)


@register("functionObject", "Peclet")
class Peclet(FunctionObject):
    """Face Peclet number |phi|/(deltaCoeffs*magSf*nuEff) logged
    min/max (reference: postProcessing/utilities/Peclet)."""

    def execute(self, time, fields, mesh):
        if "phi" not in fields:
            return
        phi = fields["phi"]
        nu_eff = fields.get("nuEff")
        if nu_eff is None:
            return
        from ..ops import fvc
        if hasattr(nu_eff, "bvalues"):
            nu_f = np.asarray(fvc.face_values(mesh, nu_eff))[
                :mesh.n_internal]
        else:
            nu_f = float(getattr(nu_eff, "value", nu_eff))
        pe = np.abs(np.asarray(phi.data[:mesh.n_internal])) / (
            np.asarray(mesh.delta_coeffs)
            * np.asarray(mesh.mag_sf[:mesh.n_internal])
            * np.maximum(nu_f, 1e-30))
        f = self.file("Peclet.dat", header="# Time min max mean\n")
        f.write(f"{time:.8g} {pe.min():.8g} {pe.max():.8g} "
                f"{pe.mean():.8g}\n")
        f.flush()


@register("functionObject", "CourantNo")
class CourantNoFO(FunctionObject):
    """Per-cell Courant number written at write times (reference:
    postProcessing/utilities/CourantNo)."""

    def execute(self, time, fields, mesh):
        if "phi" not in fields or not self.case.time.write_time():
            return
        import jax.numpy as jnp
        from ..ops import fvc
        phi = fields["phi"]
        sum_phi = fvc.surface_sum_faces(mesh, jnp.abs(phi.data),
                                        signed=False)
        dt = self.case.time.delta_t
        co = 0.5 * sum_phi / mesh.V * dt
        from ..utils.dimensions import DimensionSet
        ref = fields.get("p")
        if ref is None or ref.data.ndim != 1:
            return
        f = ref.with_calculated_bcs(
            co, co[mesh.owner[mesh.n_internal:]], DimensionSet(), "Co")
        _write_derived(self.case, "Co", f)


@register("functionObject", "wallHeatFlux")
class WallHeatFlux(FunctionObject):
    """Integrated wall heat flux per patch: kappa*snGrad(T) (reference:
    postProcessing/utilities/wallHeatFlux, incompressible kappa form)."""

    def execute(self, time, fields, mesh):
        T = fields.get("T")
        if T is None:
            return
        from ..ops import fvc
        kappa = fields.get("kappaEff") or fields.get("alphaEff") \
            or fields.get("nuEff")
        sng = fvc.sn_grad(mesh, T)
        f = self.file("wallHeatFlux.dat",
                      header="# Time patch integral min max\n")
        for patch in mesh.patches:
            if patch.type != "wall" or patch.size == 0:
                continue
            sl = slice(patch.start, patch.start + patch.size)
            bsl = slice(patch.bstart, patch.bstart + patch.size)
            if kappa is None:
                k_b = 1.0
            elif hasattr(kappa, "bvalues"):
                k_b = np.asarray(kappa.bvalues[bsl])
            else:
                k_b = float(getattr(kappa, "value", kappa))
            q = k_b * np.asarray(sng.data[sl])
            msf = np.asarray(mesh.patch_mag_sf(patch))
            f.write(f"{time:.8g} {patch.name} {(q * msf).sum():.8g} "
                    f"{q.min():.8g} {q.max():.8g}\n")
        f.flush()


@register("functionObject", "pressureTools")
class PressureTools(FunctionObject):
    """Total pressure p0 = p + 0.5|U|^2 (incompressible form) written
    at write times (reference: postProcessing/utilities/pressureTools,
    calcTotal option)."""

    def execute(self, time, fields, mesh):
        if "p" not in fields or "U" not in fields \
                or not self.case.time.write_time():
            return
        p, U = fields["p"], fields["U"]
        data = p.data + 0.5 * (U.data * U.data).sum(-1)
        bv = p.bvalues + 0.5 * (U.bvalues * U.bvalues).sum(-1)
        f = p.with_calculated_bcs(data, bv, p.dims, "total(p)")
        _write_derived(self.case, "total(p)", f)


@register("functionObject", "turbulenceFields", "R")
class TurbulenceFields(FunctionObject):
    """Derived Reynolds stress R = (2/3)k I - 2 nut S written at write
    times (reference: postProcessing/utilities/turbulenceFields; the R
    field of the Boussinesq closure)."""

    def execute(self, time, fields, mesh):
        if "U" not in fields or "nut" not in fields \
                or not self.case.time.write_time():
            return
        import jax.numpy as jnp
        from ..ops import fvc
        U, nut = fields["U"], fields["nut"]
        k = fields.get("k")
        g = fvc.grad(mesh, U)
        s = 0.5 * (g.data + jnp.swapaxes(g.data, -1, -2))
        eye = jnp.eye(3, dtype=s.dtype)
        kk = k.data if k is not None else jnp.zeros(mesh.n_cells,
                                                    s.dtype)
        R = (2.0 / 3.0) * kk[:, None, None] * eye \
            - 2.0 * nut.data[:, None, None] * s
        # store the 6 symmetric components as a (n,6) field
        idx = [(0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)]
        data = jnp.stack([R[:, i, j] for i, j in idx], axis=-1)
        f = U.with_calculated_bcs(
            data, jnp.take(data, mesh.owner[mesh.n_internal:], axis=0),
            U.dims * U.dims, "R")
        _write_derived(self.case, "R", f)


@register("functionObject", "scalarTransport")
class ScalarTransport(FunctionObject):
    """Passive-scalar transport solved each step (reference:
    postProcessing/utilities/scalarTransport): ddt(s) + div(phi,s) -
    laplacian(D, s) = 0 with D = nu + nut (or the 'D' entry)."""

    def __init__(self, name, d, case):
        super().__init__(name, d, case)
        self.field_name = d.word("field", "s")
        self.s = case.read_field(self.field_name) \
            if case.field_exists(self.field_name) else None
        self.d_coeff = d.scalar("D", -1.0)
        from ..linalg.solvers import SolverControls
        try:
            self.controls = case.solver_controls(self.field_name)
        except KeyError:
            self.controls = SolverControls(solver="smoothSolver",
                                           tolerance=1e-8)

    def execute(self, time, fields, mesh):
        if self.s is None or "phi" not in fields:
            return
        import jax
        import jax.numpy as jnp
        from ..fields.field import Dimensioned
        from ..linalg import solve
        from ..ops import fvc, fvm
        from ..utils.dimensions import DimensionSet
        phi = fields["phi"]
        nu_eff = fields.get("nuEff")
        dt = self.case.time.delta_t

        @jax.jit
        def step(s, phi_d, nu_d):
            s = s.store_old()
            if self.d_coeff >= 0.0:
                D = Dimensioned("D", DimensionSet.of(0, 2, -1),
                                self.d_coeff)
            else:
                D = Dimensioned("D", DimensionSet.of(0, 2, -1), nu_d)
            eqn = (fvm.ddt(mesh, s, dt)
                   + fvm.div(mesh, phi, s, "upwind")
                   - fvm.laplacian(mesh, D, s))
            s_new, perf = solve(mesh, eqn, self.controls,
                                env={"phi": phi})
            return s_new
        if nu_eff is None:
            nu_d = jnp.zeros(mesh.n_faces)
        elif hasattr(nu_eff, "bvalues"):
            nu_d = fvc.face_values(mesh, nu_eff)
        else:
            nu_d = jnp.full(mesh.n_faces,
                            float(getattr(nu_eff, "value", nu_eff)))
        self.s = step(self.s, phi.data, nu_d)
        if self.case.time.write_time():
            self.case.write_fields([self.s], mark=False)


@register("functionObject", "blendingFactor")
class BlendingFactor(FunctionObject):
    """Cell-average limiter weight of the named field's div scheme
    (reference: postProcessing/utilities/blendingFactor)."""

    def __init__(self, name, d, case):
        super().__init__(name, d, case)
        self.field_name = d.word("field", "U")

    def execute(self, time, fields, mesh):
        if self.field_name not in fields or "phi" not in fields \
                or not self.case.time.write_time():
            return
        import jax.numpy as jnp
        from ..ops.interpolation import scheme_weights
        vf = fields[self.field_name]
        phi = fields["phi"]
        try:
            scheme = self.case.div_scheme(f"div(phi,{self.field_name})")
        except KeyError:
            return
        w = scheme_weights(mesh, vf, scheme, phi)
        face = jnp.concatenate([w, jnp.ones(mesh.n_boundary, w.dtype)])
        from ..ops import fvc
        cell = fvc.surface_sum_faces(mesh, face, signed=False) \
            / fvc.surface_sum_faces(mesh, jnp.ones_like(face),
                                    signed=False)
        from ..utils.dimensions import DimensionSet
        p_like = vf if vf.data.ndim == 1 else fields.get("p", vf)
        f = p_like.with_calculated_bcs(
            cell, cell[mesh.owner[mesh.n_internal:]], DimensionSet(),
            f"blendingFactor({self.field_name})")
        _write_derived(self.case, f.name, f)


@register("functionObject", "systemCall")
class SystemCall(FunctionObject):
    """Shell hooks (reference: postProcessing/systemCall): entries
    executeCalls/writeCalls run at each step / write time."""

    def execute(self, time, fields, mesh):
        import subprocess
        calls = self.dict.lookup("executeCalls") or []
        if self.case.time.write_time():
            calls = list(calls) + list(self.dict.lookup("writeCalls")
                                       or [])
        for c in calls:
            subprocess.run(str(c), shell=True, check=False)


@register("functionObject", "abortCalculation", "abort")
class AbortCalculation(FunctionObject):
    """Watch a trigger file and stop the run (reference:
    postProcessing/jobControl/abortCalculation)."""

    def execute(self, time, fields, mesh):
        fname = self.dict.word("file", os.path.join(self.case.dir,
                                                    "ABORT"))
        if os.path.isfile(fname):
            info(f"abortCalculation: triggered by {fname}")
            # end the run at the current time (Time.run() then fails)
            self.case.time.end_time = self.case.time.value


@register("functionObject", "writeRegisteredObject")
class WriteRegisteredObject(FunctionObject):
    """Force-write the named fields at write times (reference:
    postProcessing/jobControl/writeRegisteredObject)."""

    def execute(self, time, fields, mesh):
        if not self.case.time.write_time():
            return
        names = [str(x) for x in (self.dict.lookup("objects") or [])]
        for n in names:
            f = fields.get(n)
            if f is not None and hasattr(f, "bvalues"):
                self.case.write_fields([f.replace(name=n)],
                                       mark=False)


@register("functionObject", "nearWallFields")
class NearWallFields(FunctionObject):
    """Sample interior fields at a distance inside the wall and expose
    them as boundary fields (reference: postProcessing/field/
    nearWallFields): entry fields ((U UNear)); distance <d>. The sample
    point is the cell nearest to wallFace - d*n (host KD-tree, built
    once)."""

    def __init__(self, name, d, case):
        super().__init__(name, d, case)
        self.pairs = []
        for item in (d.lookup("fields") or []):
            if isinstance(item, (list, tuple)) and len(item) == 2:
                self.pairs.append((str(item[0]), str(item[1])))
        self.distance = float(d.scalar("distance", 0.0))
        self._idx = None

    def _build(self, mesh):
        import numpy as np
        from scipy.spatial import cKDTree
        C = np.asarray(mesh.C)
        tree = cKDTree(C)
        idx = {}
        for p in mesh.patches:
            if p.type != "wall" or p.size == 0:
                continue
            cf = np.asarray(mesh.patch_cf(p))
            n = np.asarray(mesh.patch_normals(p))
            pts = cf - self.distance * n
            _, i = tree.query(pts)
            idx[p.name] = i
        return idx

    def execute(self, time, fields, mesh):
        if not self.pairs or not self.case.time.write_time():
            return
        import numpy as np
        if self._idx is None:
            self._idx = self._build(mesh)
        f = self.file("nearWallFields.dat",
                      header="# Time patch field min max avg\n")
        for src, dst in self.pairs:
            vf = fields.get(src)
            if vf is None:
                continue
            data = np.asarray(vf.data)
            for pname, cells in self._idx.items():
                vals = data[cells]
                mag = np.linalg.norm(vals, axis=-1) \
                    if vals.ndim > 1 else vals
                f.write(f"{time:.8g} {pname} {dst} {mag.min():.8g} "
                        f"{mag.max():.8g} {mag.mean():.8g}\n")
        f.flush()


@register("functionObject", "readFields")
class ReadFields(FunctionObject):
    """Load the named fields from the current time directory into the
    hook environment at write times (reference: postProcessing/field/
    readFields — here they are re-written so downstream tooling sees
    them registered)."""

    def execute(self, time, fields, mesh):
        names = [str(x) for x in (self.dict.lookup("fields") or [])]
        for n in names:
            if n not in fields and self.case.field_exists(n):
                fields[n] = self.case.read_field(n)


@register("functionObject", "surfaceInterpolateFields")
class SurfaceInterpolateFields(FunctionObject):
    """Face-interpolated copies of the named fields, logged min/max
    (reference: postProcessing/field/surfaceInterpolateFields)."""

    def execute(self, time, fields, mesh):
        import numpy as np
        from ..ops import fvc
        pairs = []
        for item in (self.dict.lookup("fields") or []):
            if isinstance(item, (list, tuple)) and len(item) == 2:
                pairs.append((str(item[0]), str(item[1])))
        if not pairs:
            return
        f = self.file("surfaceInterpolateFields.dat",
                      header="# Time field min max\n")
        for src, dst in pairs:
            vf = fields.get(src)
            if vf is None or not hasattr(vf, "bvalues"):
                continue
            fv = np.asarray(fvc.face_values(mesh, vf))
            mag = np.linalg.norm(fv, axis=-1) if fv.ndim > 1 else fv
            f.write(f"{time:.8g} {dst} {mag.min():.8g} "
                    f"{mag.max():.8g}\n")
        f.flush()


@register("functionObject", "streamLine")
class StreamLine(FunctionObject):
    """Streamlines integrated through the current U (reference:
    postProcessing/field/streamLine, which tracks particles with
    lagrangian/basic): host-side RK2 through a nearest-cell velocity
    lookup, written as VTK polylines at write times."""

    def __init__(self, name, d, case):
        super().__init__(name, d, case)
        sub = d.subdict("seedSampleSet", required=False) or d
        self.n_points = int(d.scalar("nPoints", 10))
        start = sub.lookup("start") or [0.0, 0.0, 0.0]
        end = sub.lookup("end") or [1.0, 0.0, 0.0]
        self.start = np.asarray(start, float)
        self.end = np.asarray(end, float)
        self.lifetime = int(d.scalar("lifeTime", 500))
        self._tree = None

    def execute(self, time, fields, mesh):
        if "U" not in fields or not self.case.time.write_time():
            return
        from scipy.spatial import cKDTree
        C = np.asarray(mesh.C)
        if self._tree is None:
            self._tree = cKDTree(C)
        U = np.asarray(fields["U"].data)
        h = float(np.cbrt(np.asarray(mesh.V)).mean())
        lo = C.min(0) - 1e-6
        hi = C.max(0) + 1e-6
        seeds = np.linspace(self.start, self.end, self.n_points)
        lines = []
        for s in seeds:
            pts = [s.copy()]
            x = s.copy()
            for _ in range(self.lifetime):
                _, i = self._tree.query(x)
                u1 = U[i]
                sp = np.linalg.norm(u1)
                if sp < 1e-12:
                    break
                dtp = 0.5 * h / sp
                xm = x + 0.5 * dtp * u1
                _, im = self._tree.query(xm)
                u2 = U[im]
                x = x + dtp * u2
                if (x < lo).any() or (x > hi).any():
                    break
                pts.append(x.copy())
            lines.append(np.asarray(pts))
        os.makedirs(self.out_dir, exist_ok=True)
        path = os.path.join(self.out_dir,
                            f"streamlines_{time:.8g}.vtk")
        with open(path, "w") as f:
            npts = sum(len(l) for l in lines)
            f.write("# vtk DataFile Version 2.0\nstreamLine\nASCII\n"
                    "DATASET POLYDATA\n")
            f.write(f"POINTS {npts} float\n")
            for l in lines:
                for p in l:
                    f.write(f"{p[0]:.8g} {p[1]:.8g} {p[2]:.8g}\n")
            total = sum(len(l) + 1 for l in lines)
            f.write(f"LINES {len(lines)} {total}\n")
            off = 0
            for l in lines:
                f.write(str(len(l)) + " "
                        + " ".join(str(off + i)
                                   for i in range(len(l))) + "\n")
                off += len(l)


class FunctionObjectList:
    """Reads controlDict.functions and executes each hook per step
    (reference: functionObjectList::execute from Time::run)."""

    def __init__(self, case):
        self.case = case
        self.objects = []
        funcs = case.control_dict.subdict("functions", required=False)
        if funcs:
            for name, d in funcs.items():
                if not isinstance(d, Dictionary):
                    continue
                typ = d.word("type")
                try:
                    cls = lookup("functionObject", typ)
                except KeyError:
                    info(f"functionObjects: unknown type '{typ}' "
                         f"for '{name}' — skipped")
                    continue
                self.objects.append(cls(str(name), d, case))

    def execute(self, fields: dict):
        t = self.case.time.value
        for obj in self.objects:
            obj.execute(t, fields, self.case.mesh)

    def close(self):
        for obj in self.objects:
            obj.close()
