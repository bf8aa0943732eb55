"""Case — the fvMesh/Time/dictionaries bundle a solver runs on.

Plays the role of the reference's createTime.H + createMesh.H +
fvSchemes/fvSolution accessors (reference: src/finiteVolume/fvMesh/fvMesh.H:79,
fvSchemes.H:57-82, solution.H): loads the mesh into MeshArrays once,
resolves per-operator scheme words and per-field solver controls, and
owns reading/writing fields in case format.
"""

from __future__ import annotations

import os

from ..fields.io import read_vol_field, write_vol_field
from ..linalg.solvers import SolverControls
from ..mesh import build_mesh_arrays, read_polymesh
from ..utils.dictionary import Dictionary, parse_file
from ..utils.logging import info
from ..utils.timecontrol import Time


#: fvPatchField types that need their underlying cyclic pair kept as a
#: coupled interface instead of merged (reference: jumpCyclic family,
#: `patchType cyclic`)
_JUMP_BC_TYPES = ("fan", "fixedJump", "uniformJump")


def _scan_jump_patches(pmesh, case_dir, region, time_name):
    """Patch names carrying jump-family BCs in the start-time field
    dicts — these cyclic pairs must stay coupled patches (fan curves and
    pressure jumps live on the interface, which merging would erase)."""
    if not any(p.type == "cyclic" for p in pmesh.patches):
        return ()
    tdir = os.path.join(case_dir, time_name, region)
    if not os.path.isdir(tdir):
        return ()
    names = set()
    cyc = {p.name for p in pmesh.patches if p.type == "cyclic"}
    for fn in sorted(os.listdir(tdir)):
        path = os.path.join(tdir, fn)
        if not os.path.isfile(path):
            continue
        try:
            d = parse_file(path)
            bf = d.subdict("boundaryField")
        except Exception:
            continue
        if bf is None:
            continue
        for pname in cyc:
            pd = bf.lookup(pname)   # regex-aware ("(inlet|outlet)" keys)
            if isinstance(pd, Dictionary) \
                    and pd.word("type", "") in _JUMP_BC_TYPES:
                names.add(pname)
    return tuple(sorted(names))


class Case:
    def __init__(self, case_dir: str, renumber: bool = True, dtype=None,
                 region: str = "", time: "Time | None" = None,
                 pmesh=None, lattice: dict | None = None):
        """region selects a multi-region sub-case (reference:
        chtMultiRegionFoam per-region meshes at constant/<region>/
        polyMesh, fields at <time>/<region>/, dictionaries at
        system/<region>/); a shared Time may be injected so all
        regions advance together. pmesh injects an in-memory PolyMesh
        (million-cell benches skip the ascii mesh round-trip); lattice
        (from utils.unstructured lattice_out) selects the gather-free
        generalized-DIA mesh mode (mesh/gdia.py)."""
        self.dir = case_dir
        self.region = region
        self.time = time if time is not None else Time(case_dir)
        info(f"Create time\n\nCreate mesh"
             f"{f' for region {region}' if region else ''} "
             f"for time = {self.time.name}\n")
        if pmesh is None:
            pmesh = read_polymesh(case_dir, region)
        if lattice is None:
            # lattice-derived meshes (masked grids: forward steps,
            # T-junctions) auto-route onto the gather-free gdia mode —
            # TPU gathers run ~1000x off HBM speed (mesh/gdia.py).
            # RCFD_GDIA_AUTO=0 disables.
            from ..utils.switches import enabled
            if enabled("GDIA_AUTO"):
                from ..utils.unstructured import detect_lattice
                lattice = detect_lattice(pmesh)
                if lattice is not None:
                    nz_, ny_, nx_ = lattice["shape"]
                    info(f"gdia: lattice {nx_}x{ny_}x{nz_} detected "
                         f"({int(lattice['dead'].sum())} dead slots)\n")
        if lattice is not None:
            from ..mesh.mesharrays import build_gdia_mesh_arrays
            self.mesh, self.pmesh, self.maps = build_gdia_mesh_arrays(
                pmesh, lattice, dtype=dtype)
        else:
            self.mesh, self.pmesh, self.maps = build_mesh_arrays(
                pmesh, renumber=renumber, dtype=dtype,
                keep_cyclic=_scan_jump_patches(pmesh, case_dir, region,
                                               self.time.name))
        self.fv_schemes = parse_file(
            os.path.join(case_dir, "system", region, "fvSchemes"))
        self.fv_solution = parse_file(
            os.path.join(case_dir, "system", region, "fvSolution"))
        self.control_dict = self.time.control

    # -- fields ---------------------------------------------------------------
    def _time_dir(self, time: str | None) -> str:
        t = time or self.time.name
        return os.path.join(t, self.region) if self.region else t

    def read_field(self, name: str, time: str | None = None):
        return read_vol_field(self.dir, self._time_dir(time), name,
                              self.mesh, self.maps)

    def field_exists(self, name: str, time: str | None = None) -> bool:
        return os.path.isfile(
            os.path.join(self.dir, self._time_dir(time), name))

    def write_fields(self, fields, time: str | None = None,
                     mark: bool = True):
        """mark=False (functionObject derived-field writes) leaves the
        write-control state untouched so one FO's output does not
        consume the step's write trigger."""
        t = time or self.time.name
        td = self._time_dir(time)
        fmt = self.control_dict.word("writeFormat", "ascii")
        compress = self.control_dict.word(
            "writeCompression", "uncompressed") in ("compressed", "on",
                                                    "yes", "true")
        prec = int(self.control_dict.scalar("writePrecision", 8))
        for f in fields:
            write_vol_field(f, self.dir, td, self.mesh, self.maps,
                            prec=prec, fmt=fmt, compress=compress)
        os.makedirs(os.path.join(self.dir, t, "uniform"), exist_ok=True)
        with open(os.path.join(self.dir, t, "uniform", "time"), "w") as fh:
            fh.write(self.time.uniform_time_dict())
        if mark:
            self.time.mark_written()

    # -- constant/ dictionaries --------------------------------------------------
    def transport_properties(self) -> Dictionary:
        return parse_file(os.path.join(self.dir, "constant", self.region,
                                       "transportProperties"))

    def constant_dict(self, name: str) -> Dictionary:
        return parse_file(os.path.join(self.dir, "constant", self.region,
                                       name))

    # -- fvSchemes resolution ------------------------------------------------------
    def ddt_scheme(self):
        """ddtSchemes.default — a word, or ('CrankNicolson', ocCoeff)
        for the off-centred CN spec (reference:
        CrankNicolsonDdtScheme.H ocCoeff_ ctor)."""
        d = self.fv_schemes.subdict("ddtSchemes")
        s = d.lookup("default", "Euler")
        if isinstance(s, str):
            return s
        if s and s[0] in ("CrankNicolson", "CrankNicholson"):
            return ("CrankNicolson",
                    float(s[1]) if len(s) > 1 else 1.0)
        return s[0]

    def div_scheme(self, key: str):
        """Resolve e.g. div(phi,U) -> interpolation scheme spec."""
        d = self.fv_schemes.subdict("divSchemes")
        s = d.lookup(key)
        if s is None:
            s = d.lookup("default")
        if s is None or s == "none":
            raise KeyError(f"divSchemes: no scheme for '{key}'")
        return self._gauss_spec(s, key)

    def _gauss_spec(self, s, key):
        if isinstance(s, str):
            return s
        items = list(s)
        bounded = False
        if items[0] == "bounded":
            bounded = True
            items = items[1:]
        if items and items[0] == "Gauss":
            items = items[1:]
        if not items:
            raise KeyError(f"divSchemes entry '{key}' has no "
                           f"interpolation scheme")
        spec = items[0] if len(items) == 1 else tuple(items)
        if bounded:
            return ("bounded", spec)
        return spec

    def grad_scheme(self, key: str = "default"):
        """Resolve a gradSchemes entry. Returns 'linear'/'leastSquares'
        or ('cellLimited'|'cellMDLimited'|'faceLimited'|'faceMDLimited',
        inner, k) for the limited wrappers (reference:
        gradSchemes/limitedGradSchemes)."""
        d = self.fv_schemes.subdict("gradSchemes")
        s = d.lookup(key) or d.lookup("default", ("Gauss", "linear"))
        if isinstance(s, str):
            return "leastSquares" if s == "leastSquares" else "linear"
        if s[0] == "Gauss":
            return s[1] if len(s) > 1 else "linear"
        if s[0] == "leastSquares":
            return "leastSquares"
        if s[0] in ("cellLimited", "cellMDLimited", "faceLimited",
                    "faceMDLimited"):
            inner = "linear"
            k = 1.0
            rest = list(s[1:])
            if rest and rest[-1] is not None:
                try:
                    k = float(rest[-1])
                    rest = rest[:-1]
                except (TypeError, ValueError):
                    pass
            if rest and rest[0] == "leastSquares":
                inner = "leastSquares"
            elif rest and rest[0] == "Gauss" and len(rest) > 1:
                inner = str(rest[1])
            return (str(s[0]), inner, k)
        return "linear"

    def laplacian_scheme(self, key: str = "default") -> str:
        """Returns the snGrad correction word: orthogonal/corrected/..."""
        d = self.fv_schemes.subdict("laplacianSchemes")
        s = d.lookup(key) or d.lookup("default")
        if s is None:
            return "orthogonal"
        if isinstance(s, tuple):
            return str(s[-1])
        return "orthogonal"

    # -- fvSolution resolution ---------------------------------------------------
    def solver_controls(self, field: str, final: bool = False
                        ) -> SolverControls:
        solvers = self.fv_solution.subdict("solvers")
        d = None
        if final:
            d = solvers.lookup(field + "Final")
        if d is None:
            d = solvers.lookup(field)
        if d is None:
            raise KeyError(f"fvSolution.solvers: no entry for '{field}'")
        return SolverControls.from_dict(d)

    def algo_dict(self, name: str) -> Dictionary:
        return self.fv_solution.subdict(name, required=False)

    def relaxation_factor(self, name: str, what: str = "equations",
                          default: float = 0.0) -> float:
        rf = self.fv_solution.subdict("relaxationFactors", required=False)
        if not rf:
            return default
        sub = rf.subdict(what, required=False)
        if sub:
            v = sub.lookup(name)
            if v is not None:
                return float(v)
            v = sub.lookup("default")
            if v is not None:
                return float(v)
        v = rf.lookup(name)  # old flat format
        return float(v) if v is not None else default
