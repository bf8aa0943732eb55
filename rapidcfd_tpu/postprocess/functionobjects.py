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
