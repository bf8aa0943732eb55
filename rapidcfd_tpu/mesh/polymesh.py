"""polyMesh reader: constant/polyMesh/{points,faces,owner,neighbour,boundary}.

Reads the reference's on-disk mesh contract (reference:
src/OpenFOAM/meshes/polyMesh/polyMesh.H:75 and the owner-sorted face-list
invariant). ASCII format with numpy fast-path parsing; this is host-side,
run-once preprocessing, ahead of the static MeshArrays build.
"""

from __future__ import annotations

import gzip
import os
import re
from dataclasses import dataclass, field

import numpy as np

from ..utils.dictionary import Dictionary, parse_dictionary


def _read_text(path: str) -> str:
    if os.path.isfile(path + ".gz"):
        with gzip.open(path + ".gz", "rt") as f:
            return f.read()
    with open(path) as f:
        return f.read()


def _strip_header(text: str) -> tuple[Dictionary, str]:
    """Split off the FoamFile header dict, return (header, body_text)."""
    m = re.search(r"FoamFile\s*\{", text)
    if not m:
        return Dictionary(), text
    depth = 1
    i = m.end()
    while depth and i < len(text):
        if text[i] == "{":
            depth += 1
        elif text[i] == "}":
            depth -= 1
        i += 1
    header = parse_dictionary(text[m.start():i].replace("FoamFile", "", 1)
                              .strip().strip("{}").join(["{", "}"]))
    return header, text[i:]


_COMMENT_RE = re.compile(r"//[^\n]*|/\*.*?\*/", re.S)


def _strip_comments(text: str) -> str:
    return _COMMENT_RE.sub(" ", text)


def _parse_scalar_list(body: str, ncols: int) -> np.ndarray:
    """Parse `N ( (x y z) ... )` or `N ( v ... )` into an (N,ncols) array.
    Uses the native foamio parser when available (big meshes), else numpy."""
    body = _strip_comments(body)
    m = re.search(r"(\d+)\s*\(", body)
    if not m:
        raise ValueError("cannot find list count")
    n = int(m.group(1))
    start = m.end()
    end = body.rfind(")")
    data = body[start:end]
    from ..utils import foamio_native
    arr = foamio_native.parse_scalars(data, n * ncols)
    if arr is None:
        arr = np.fromstring(data.replace("(", " ").replace(")", " "),
                            sep=" ")
    if ncols > 1:
        arr = arr.reshape(n, ncols)
    else:
        arr = arr[:n]
    if arr.shape[0] != n:
        raise ValueError(f"expected {n} entries, got {arr.shape[0]}")
    return arr


def _parse_label_list(body: str) -> np.ndarray:
    body = _strip_comments(body)
    m = re.search(r"(\d+)\s*\(", body)
    n = int(m.group(1))
    start, end = m.end(), body.rfind(")")
    from ..utils import foamio_native
    arr = foamio_native.parse_labels(body[start:end], n)
    if arr is None:
        arr = np.fromstring(body[start:end], sep=" ").astype(np.int64)
    if arr.shape[0] != n:
        raise ValueError(f"expected {n} labels, got {arr.shape[0]}")
    return arr


_FACE_RE = re.compile(r"(\d+)\s*\(([^)]*)\)")


def _parse_face_list(body: str) -> tuple[np.ndarray, np.ndarray]:
    """Parse faces `N ( 4(a b c d) ... )` -> (flat_points, offsets)."""
    body = _strip_comments(body)
    m = re.search(r"(\d+)\s*\(", body)
    n = int(m.group(1))
    chunk = body[m.end():body.rfind(")")]
    from ..utils import foamio_native
    native = foamio_native.parse_faces(chunk, n)
    if native is not None:
        return native
    sizes = np.empty(n, dtype=np.int64)
    flats = []
    for i, fm in enumerate(_FACE_RE.finditer(chunk)):
        sizes[i] = int(fm.group(1))
        flats.append(fm.group(2))
    if len(flats) != n:
        raise ValueError(f"expected {n} faces, parsed {len(flats)}")
    flat = np.fromstring(" ".join(flats), sep=" ").astype(np.int64)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(sizes, out=offsets[1:])
    if flat.shape[0] != offsets[-1]:
        raise ValueError("face point count mismatch")
    return flat, offsets


@dataclass
class BoundaryPatch:
    name: str
    type: str
    start_face: int
    n_faces: int
    extra: Dictionary = field(default_factory=Dictionary)


@dataclass
class PolyMesh:
    """Raw mesh topology as read from disk (host, numpy)."""
    points: np.ndarray          # (nPoints, 3) float64
    face_points: np.ndarray     # flat point labels
    face_offsets: np.ndarray    # (nFaces+1,)
    owner: np.ndarray           # (nFaces,)
    neighbour: np.ndarray       # (nInternalFaces,)
    patches: list[BoundaryPatch]

    @property
    def n_points(self):
        return self.points.shape[0]

    @property
    def n_faces(self):
        return self.face_offsets.shape[0] - 1

    @property
    def n_internal_faces(self):
        return self.neighbour.shape[0]

    @property
    def n_cells(self):
        return int(self.owner.max()) + 1 if self.owner.size else 0

    def face(self, i: int) -> np.ndarray:
        return self.face_points[self.face_offsets[i]:self.face_offsets[i + 1]]


def _bin_header_end(raw: bytes) -> int:
    i = raw.find(b"FoamFile")
    return raw.find(b"}", i) + 1


def _bin_class(raw: bytes) -> str:
    m = re.search(rb"class\s+(\w+)\s*;", raw[:2048])
    return m.group(1).decode() if m else ""


def _read_points(path: str) -> np.ndarray:
    from ..utils import foambin
    raw = foambin.read_raw(path)
    if foambin.is_binary(raw):
        pts, _ = foambin.scan_list(raw, _bin_header_end(raw), 3, "f")
        return np.asarray(pts, np.float64)
    _, body = _strip_header(raw.decode("latin-1"))
    return _parse_scalar_list(body, 3)


def _read_faces(path: str) -> tuple[np.ndarray, np.ndarray]:
    from ..utils import foambin
    raw = foambin.read_raw(path)
    if foambin.is_binary(raw):
        # binary faces are CompactIOList: offsets labelList then the
        # flattened labelList (reference: CompactIOList.C:operator<<)
        cls = _bin_class(raw)
        if "Compact" not in cls:
            raise NotImplementedError(
                f"binary faces class '{cls}': only faceCompactIOList "
                "is supported (the reference's binary write format)")
        offsets, pos = foambin.scan_list(raw, _bin_header_end(raw), 1,
                                         "i")
        flat, _ = foambin.scan_list(raw, pos, 1, "i")
        return (np.asarray(flat, np.int64),
                np.asarray(offsets, np.int64))
    _, body = _strip_header(raw.decode("latin-1"))
    return _parse_face_list(body)


def _read_labels(path: str) -> np.ndarray:
    from ..utils import foambin
    raw = foambin.read_raw(path)
    if foambin.is_binary(raw):
        arr, _ = foambin.scan_list(raw, _bin_header_end(raw), 1, "i")
        return np.asarray(arr, np.int64)
    _, body = _strip_header(raw.decode("latin-1"))
    return _parse_label_list(body)


def read_polymesh(case_dir: str, region: str = "") -> PolyMesh:
    d = os.path.join(case_dir, "constant", region, "polyMesh")
    points = _read_points(os.path.join(d, "points"))
    face_points, face_offsets = _read_faces(os.path.join(d, "faces"))
    owner = _read_labels(os.path.join(d, "owner"))
    neighbour = _read_labels(os.path.join(d, "neighbour"))

    btext = _read_text(os.path.join(d, "boundary"))
    _, bbody = _strip_header(btext)
    patches = _parse_boundary(bbody)
    return PolyMesh(points, face_points, face_offsets, owner, neighbour,
                    patches)


def _parse_boundary(body: str) -> list[BoundaryPatch]:
    body = _strip_comments(body)
    m = re.search(r"(\d+)\s*\(", body)
    n = int(m.group(1))
    inner = body[m.end():body.rfind(")")]
    d = parse_dictionary(inner)
    patches = []
    for name, sub in d.items():
        if not isinstance(sub, Dictionary):
            continue
        typ = sub.word("type")
        # cyclic wrapper types: cyclicSlip is a documented no-new-
        # functionality wrapper (reference cyclicSlipFvPatchField.H:
        # 31-33 — the slip part only affects point motion);
        # nonuniformTransformCyclic couples coincident face pairs whose
        # per-face transform the merge path resolves geometrically.
        # Both route onto the cyclic merge machinery; the original type
        # is kept for boundary write-back fidelity.
        if typ in ("cyclicSlip", "nonuniformTransformCyclic"):
            sub["_originalType"] = typ
            typ = "cyclic"
        patches.append(BoundaryPatch(
            name=str(name),
            type=typ,
            start_face=int(sub.scalar("startFace")),
            n_faces=int(sub.scalar("nFaces")),
            extra=sub,
        ))
    if len(patches) != n:
        raise ValueError(f"boundary: expected {n} patches, got {len(patches)}")
    return patches


# ---------------------------------------------------------------------------
# Writing (casegen / decomposition output)
# ---------------------------------------------------------------------------

def write_polymesh(mesh: PolyMesh, case_dir: str, region: str = "",
                   fmt: str = "ascii", compress: bool = False):
    """fmt='binary' writes the reference's binary polyMesh contract
    (points/owner/neighbour as binary lists, faces as
    faceCompactIOList); compress gzips the data files. The boundary
    file stays ascii (it is a dictionary either way)."""
    import gzip as _gzip
    from ..utils.dictionary import foamfile_header
    from ..utils import foambin
    d = os.path.join(case_dir, "constant", region, "polyMesh")
    os.makedirs(d, exist_ok=True)
    loc = (f"constant/{region}/polyMesh" if region
           else "constant/polyMesh")

    def wr(name, cls, body, binary=False):
        hdr = foamfile_header(cls, name, loc,
                              fmt="binary" if binary else "ascii")
        payload = hdr.encode("latin-1") + body if binary \
            else (hdr + body).encode("latin-1")
        if compress and name != "boundary":
            with _gzip.open(os.path.join(d, name + ".gz"), "wb") as f:
                f.write(payload)
            stale = os.path.join(d, name)
            if os.path.isfile(stale):
                os.remove(stale)
        else:
            with open(os.path.join(d, name), "wb") as f:
                f.write(payload)

    if fmt == "binary":
        wr("points", "vectorField", foambin.fmt_list(mesh.points) + b"\n",
           binary=True)
        wr("faces", "faceCompactIOList",
           foambin.fmt_list(mesh.face_offsets)
           + foambin.fmt_list(mesh.face_points) + b"\n", binary=True)
        wr("owner", "labelList", foambin.fmt_list(mesh.owner) + b"\n",
           binary=True)
        wr("neighbour", "labelList",
           foambin.fmt_list(mesh.neighbour) + b"\n", binary=True)
    else:
        pts = "\n".join(f"({p[0]:.12g} {p[1]:.12g} {p[2]:.12g})"
                        for p in mesh.points)
        wr("points", "vectorField", f"\n{mesh.n_points}\n(\n{pts}\n)\n")

        lines = []
        for i in range(mesh.n_faces):
            fp = mesh.face(i)
            lines.append(f"{len(fp)}({' '.join(map(str, fp))})")
        wr("faces", "faceList", f"\n{mesh.n_faces}\n(\n"
           + "\n".join(lines) + "\n)\n")

        wr("owner", "labelList", f"\n{mesh.n_faces}\n(\n"
           + "\n".join(map(str, mesh.owner)) + "\n)\n")
        wr("neighbour", "labelList", f"\n{mesh.n_internal_faces}\n(\n"
           + "\n".join(map(str, mesh.neighbour)) + "\n)\n")

    pb = [f"\n{len(mesh.patches)}\n("]
    for p in mesh.patches:
        extra = ""
        # cyclic wrapper types normalized at read keep their original
        # spelling on write-back
        ptype = p.extra.word("_originalType", p.type) if p.extra \
            else p.type
        if p.extra:
            for k, v in p.extra.items():
                if k == "_originalType":
                    continue
                if isinstance(v, tuple):
                    vs = "(" + " ".join(f"{float(x):g}" for x in v) + ")"
                else:
                    vs = str(v)
                extra += f"        {k}  {vs};\n"
        pb.append(f"    {p.name}\n    {{\n        type            {ptype};\n"
                  f"{extra}"
                  f"        nFaces          {p.n_faces};\n"
                  f"        startFace       {p.start_face};\n    }}")
    pb.append(")\n")
    wr("boundary", "polyBoundaryMesh", "\n".join(pb))


def read_face_zones(case_dir: str, region: str = "") -> dict:
    """constant/polyMesh/faceZones -> {name: (faceLabels, flipMap)}.
    (reference: meshes/polyMesh/zones/faceZone). Missing file -> {}."""
    import numpy as np
    path = os.path.join(case_dir, "constant", region, "polyMesh",
                        "faceZones")
    if not os.path.isfile(path):
        return {}
    _, body = _strip_header(_read_text(path))
    body = _strip_comments(body)
    # normalize compact lists like "3(1 2 3)" for the tokenizer
    body = body.replace("(", " ( ").replace(")", " ) ")
    m = re.search(r"(\d+)\s*\(", body)
    inner = body[m.end():body.rfind(")")]
    d = parse_dictionary(inner)
    zones = {}
    for name, sub in d.items():
        if not isinstance(sub, Dictionary):
            continue
        fl = sub.lookup("faceLabels")
        # entry forms: [..., N, [labels]] or plain [labels]
        labels = None
        if isinstance(fl, (list, tuple)):
            for item in (list(fl)[::-1] if isinstance(fl, tuple)
                         else [fl]):
                if isinstance(item, list):
                    labels = item
                    break
        if labels is None and isinstance(fl, list):
            labels = fl
        zones[str(name)] = (
            np.asarray(labels, dtype=np.int64),
            None)
    return zones
