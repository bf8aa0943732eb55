"""topoSet — geometric cell/face set construction + set/zone IO.

Capability surface of the reference's topoSet framework (reference:
src/meshTools/sets/topoSetSources/, applications/utilities/mesh/
manipulation/topoSet): system/topoSetDict actions build named cell/face
sets from geometric sources; sets persist under constant/polyMesh/sets
and feed fvOptions cellSet/cellZone selection and zone-based models.

Host-side numpy throughout — set construction is run-once preprocessing.
All labels are in FILE (on-disk polyMesh) numbering; consumers translate
to the device ordering through MeshMaps.

Sources: boxToCell, sphereToCell, cylinderToCell, cellToCell,
labelToCell, zoneToCell, boxToFace, patchToFace, normalToFace.
Actions: new, add, delete, subset, invert, clear.
"""

from __future__ import annotations

import os

import numpy as np

from ..utils.dictionary import Dictionary, foamfile_header, parse_file


# ---------------------------------------------------------------------------
# geometric sources (labels in FILE numbering)
# ---------------------------------------------------------------------------

def _vec(v):
    return np.asarray([float(x) for x in v], float)


def _cell_centres(mesh):
    from .geometry import cell_centres_and_vols, face_centres_and_areas
    Cf, Sf = face_centres_and_areas(mesh)
    C, _ = cell_centres_and_vols(mesh, Cf, Sf)
    return C, Cf, Sf


def source_cells(mesh, src: str, d: Dictionary, sets: dict,
                 case_dir: str) -> np.ndarray:
    """Cell labels selected by one topoSetSource."""
    C, _, _ = _cell_centres(mesh)
    if src == "boxToCell":
        boxes = d.lookup("box", required=False)
        boxes = [boxes] if boxes is not None else d.lookup("boxes",
                                                           required=True)
        m = np.zeros(len(C), bool)
        for lo, hi in boxes:
            m |= np.all((C >= _vec(lo)) & (C <= _vec(hi)), axis=1)
        return np.where(m)[0]
    if src == "sphereToCell":
        ctr = _vec(d.lookup("centre", required=True))
        r = d.scalar("radius")
        return np.where(((C - ctr) ** 2).sum(1) <= r * r)[0]
    if src == "cylinderToCell":
        p1 = _vec(d.lookup("p1", required=True))
        p2 = _vec(d.lookup("p2", required=True))
        r = d.scalar("radius")
        ax = p2 - p1
        L2 = (ax * ax).sum()
        t = ((C - p1) @ ax) / max(L2, 1e-300)
        closest = p1 + t[:, None] * ax
        m = (t >= 0) & (t <= 1) \
            & (((C - closest) ** 2).sum(1) <= r * r)
        return np.where(m)[0]
    if src == "surfaceToCell":
        # reference surfaceToCell (file/outsidePoints/includeCut/... dict
        # contract, topoSetSource/surfaceToCell) is NOT implemented —
        # do not silently alias it to searchableSurfaceToCell semantics
        raise NotImplementedError(
            "topoSet source 'surfaceToCell' (triSurface file + "
            "outsidePoints/includeCut/nearDistance contract) is not "
            "implemented; use 'searchableSurfaceToCell' with a "
            "searchableSurface dict instead")
    if src == "searchableSurfaceToCell":
        # cells whose centre is inside a searchableSurface (reference:
        # topoSetSources/searchableSurfaceToCell)
        from .searchable import make_searchable
        surf_d = d.subdict("surface", required=False)
        if surf_d is not None:
            surf = make_searchable(str(surf_d.word("type")), surf_d,
                                   case_dir)
        else:
            surf = make_searchable(str(d.word("surface")), d, case_dir)
        return np.where(surf.inside(C))[0]
    if src == "cellToCell":
        name = d.word("set")
        return np.asarray(sorted(sets.get(name, set())), np.int64)
    if src == "labelToCell":
        return np.asarray([int(x) for x in d.lookup("value")], np.int64)
    if src == "zoneToCell":
        zones = read_cell_zones(case_dir)
        name = d.word("name", d.word("zone", ""))
        import re
        out = []
        for zn, labels in zones.items():
            if zn == name or re.fullmatch(name, zn):
                out.append(labels)
        return np.concatenate(out) if out else np.zeros(0, np.int64)
    raise KeyError(f"topoSet: unsupported cell source '{src}'")


def source_faces(mesh, src: str, d: Dictionary, sets: dict,
                 case_dir: str) -> np.ndarray:
    _, Cf, Sf = _cell_centres(mesh)
    if src == "boxToFace":
        lo, hi = (_vec(v) for v in d.lookup("box", required=True))
        return np.where(np.all((Cf >= lo) & (Cf <= hi), axis=1))[0]
    if src == "patchToFace":
        import re
        name = d.word("name")
        out = []
        for p in mesh.patches:
            if p.name == name or re.fullmatch(name, p.name):
                out.append(np.arange(p.start_face,
                                     p.start_face + p.n_faces))
        return np.concatenate(out) if out else np.zeros(0, np.int64)
    if src == "normalToFace":
        n = _vec(d.lookup("normal", required=True))
        n = n / np.linalg.norm(n)
        tol = d.scalar("cos", 0.99)
        nf = Sf / np.maximum(np.linalg.norm(Sf, axis=1,
                                            keepdims=True), 1e-300)
        return np.where(np.abs(nf @ n) >= tol)[0]
    raise KeyError(f"topoSet: unsupported face source '{src}'")


# ---------------------------------------------------------------------------
# topoSetDict execution
# ---------------------------------------------------------------------------

def run_toposet(mesh, case_dir: str,
                dict_path: str | None = None) -> dict:
    """Execute system/topoSetDict; returns {name: sorted label array}
    and writes each set to constant/polyMesh/sets/<name>."""
    path = dict_path or os.path.join(case_dir, "system", "topoSetDict")
    td = parse_file(path)
    actions = td.lookup("actions", required=True)
    sets: dict[str, set] = {}
    kinds: dict[str, str] = {}
    for a in actions:
        if not isinstance(a, Dictionary):
            continue
        name = a.word("name")
        kind = a.word("type", "cellSet")
        action = a.word("action", "new")
        kinds[name] = kind
        if action == "clear":
            sets[name] = set()
            continue
        if action == "invert":
            n = mesh.n_cells if kind == "cellSet" else mesh.n_faces
            sets[name] = set(range(n)) - sets.get(name, set())
            continue
        src = a.word("source", "")
        sd = a.subdict("sourceInfo", required=False) or a
        labels = (source_cells(mesh, src, sd, sets, case_dir)
                  if kind == "cellSet"
                  else source_faces(mesh, src, sd, sets, case_dir))
        cur = sets.get(name, set())
        if action == "new":
            cur = set(labels.tolist())
        elif action == "add":
            cur = cur | set(labels.tolist())
        elif action == "delete":
            cur = cur - set(labels.tolist())
        elif action == "subset":
            cur = cur & set(labels.tolist())
        else:
            raise KeyError(f"topoSet: unsupported action '{action}'")
        sets[name] = cur

    out = {}
    for name, labels in sets.items():
        arr = np.asarray(sorted(labels), np.int64)
        out[name] = arr
        write_set(case_dir, name, kinds[name], arr)
    return out


# ---------------------------------------------------------------------------
# set / zone IO (FILE numbering)
# ---------------------------------------------------------------------------

def write_set(case_dir: str, name: str, kind: str, labels: np.ndarray):
    d = os.path.join(case_dir, "constant", "polyMesh", "sets")
    os.makedirs(d, exist_ok=True)
    body = "\n".join(str(int(x)) for x in labels)
    with open(os.path.join(d, name), "w") as f:
        f.write(foamfile_header(kind, name, "constant/polyMesh/sets"))
        f.write(f"\n{len(labels)}\n(\n{body}\n)\n")


def read_set(case_dir: str, name: str) -> np.ndarray:
    """constant/polyMesh/sets/<name> -> label array (FILE numbering)."""
    path = os.path.join(case_dir, "constant", "polyMesh", "sets", name)
    from .polymesh import _parse_label_list, _read_text, _strip_header
    _, body = _strip_header(_read_text(path))
    return _parse_label_list(body)


def read_cell_zones(case_dir: str, region: str = "") -> dict:
    """constant/polyMesh/cellZones -> {name: labels} (FILE numbering)."""
    path = os.path.join(case_dir, "constant", region, "polyMesh",
                        "cellZones")
    if not os.path.isfile(path) and not os.path.isfile(path + ".gz"):
        return {}
    from .polymesh import _read_text, _strip_header
    _, body = _strip_header(_read_text(path))
    d_all = parse_file_zones_body(body)
    return d_all


def parse_file_zones_body(body: str) -> dict:
    """Parse the `N ( name { type cellZone; cellLabels List<label> M
    ( ... ); } ... )` zone-file layout."""
    import re
    out = {}
    for m in re.finditer(
            r"(\w+)\s*\{[^{}]*?cellLabels[^(]*\(\s*([^)]*)\)", body,
            re.S):
        name = m.group(1)
        txt = m.group(2).split()
        labels = np.asarray([int(x) for x in txt], np.int64) \
            if txt else np.zeros(0, np.int64)
        out[name] = labels
    return out
