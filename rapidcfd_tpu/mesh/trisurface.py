"""triSurface + fileFormats — triangulated surfaces and their IO.

Capability surface of the reference's triSurface/surfMesh/fileFormats
libraries (reference: src/triSurface/triSurface/triSurface.H:66,
fileFormats/ STL read/write): an indexed triangle soup with optional
region labels, readable/writable as ASCII STL, binary STL and OBJ,
plus legacy-VTK output for postprocessing.

Host-side numpy by design — surfaces are IO/postprocessing artifacts;
device work happens on fields sampled onto them (sampledsurface.py).
"""

from __future__ import annotations

import os
import re
import struct
from dataclasses import dataclass, field

import numpy as np


@dataclass
class TriSurface:
    points: np.ndarray                 # (nPoints, 3) float64
    faces: np.ndarray                  # (nTris, 3) int64
    region: np.ndarray | None = None   # (nTris,) int region/solid id
    region_names: tuple = ()

    @property
    def n_points(self):
        return self.points.shape[0]

    @property
    def n_faces(self):
        return self.faces.shape[0]

    def face_centres(self) -> np.ndarray:
        return self.points[self.faces].mean(axis=1)

    def face_normals(self, normalize=True) -> np.ndarray:
        p = self.points[self.faces]
        n = 0.5 * np.cross(p[:, 1] - p[:, 0], p[:, 2] - p[:, 0])
        if normalize:
            n = n / np.maximum(np.linalg.norm(n, axis=1, keepdims=True),
                               1e-300)
        return n

    def face_areas(self) -> np.ndarray:
        p = self.points[self.faces]
        return 0.5 * np.linalg.norm(
            np.cross(p[:, 1] - p[:, 0], p[:, 2] - p[:, 0]), axis=1)

    def area(self) -> float:
        return float(self.face_areas().sum())

    # -- cleanup -------------------------------------------------------------
    def merged(self, tol: float = 1e-10) -> "TriSurface":
        """Weld duplicate points (STL triangle soup -> indexed mesh)."""
        scale = max(np.abs(self.points).max(), 1.0)
        key = np.round(self.points / (tol * scale)).astype(np.int64)
        _, first, inverse = np.unique(key, axis=0, return_index=True,
                                      return_inverse=True)
        return TriSurface(self.points[first], inverse[self.faces],
                          self.region, self.region_names)

    # -- writers ---------------------------------------------------------------
    def write(self, path: str):
        ext = os.path.splitext(path)[1].lower()
        if ext == ".stl":
            self._write_stl_ascii(path)
        elif ext == ".stlb":
            self._write_stl_binary(path)
        elif ext == ".obj":
            self._write_obj(path)
        elif ext == ".vtk":
            self._write_vtk(path)
        else:
            raise KeyError(f"unknown surface format '{ext}' "
                           "(.stl|.stlb|.obj|.vtk)")

    def _write_stl_ascii(self, path):
        n = self.face_normals()
        p = self.points[self.faces]
        with open(path, "w") as f:
            f.write("solid surface\n")
            for i in range(self.n_faces):
                f.write(f" facet normal {n[i,0]:.9g} {n[i,1]:.9g} "
                        f"{n[i,2]:.9g}\n  outer loop\n")
                for v in p[i]:
                    f.write(f"   vertex {v[0]:.9g} {v[1]:.9g} "
                            f"{v[2]:.9g}\n")
                f.write("  endloop\n endfacet\n")
            f.write("endsolid surface\n")

    def _write_stl_binary(self, path):
        n = self.face_normals().astype(np.float32)
        p = self.points[self.faces].astype(np.float32)
        with open(path, "wb") as f:
            f.write(b"\0" * 80)
            f.write(struct.pack("<I", self.n_faces))
            for i in range(self.n_faces):
                f.write(n[i].tobytes() + p[i].tobytes()
                        + struct.pack("<H", 0))

    def _write_obj(self, path):
        with open(path, "w") as f:
            for v in self.points:
                f.write(f"v {v[0]:.9g} {v[1]:.9g} {v[2]:.9g}\n")
            for t in self.faces:
                f.write(f"f {t[0]+1} {t[1]+1} {t[2]+1}\n")

    def _write_vtk(self, path, cell_data: dict | None = None):
        with open(path, "w") as f:
            f.write("# vtk DataFile Version 2.0\ntriSurface\nASCII\n"
                    "DATASET POLYDATA\n")
            f.write(f"POINTS {self.n_points} double\n")
            for v in self.points:
                f.write(f"{v[0]:.9g} {v[1]:.9g} {v[2]:.9g}\n")
            f.write(f"POLYGONS {self.n_faces} {4 * self.n_faces}\n")
            for t in self.faces:
                f.write(f"3 {t[0]} {t[1]} {t[2]}\n")
            if cell_data:
                f.write(f"CELL_DATA {self.n_faces}\n")
                for name, vals in cell_data.items():
                    vals = np.asarray(vals)
                    if vals.ndim == 1:
                        f.write(f"SCALARS {name} double 1\n"
                                "LOOKUP_TABLE default\n")
                        for v in vals:
                            f.write(f"{v:.9g}\n")
                    else:
                        f.write(f"VECTORS {name} double\n")
                        for v in vals:
                            f.write(f"{v[0]:.9g} {v[1]:.9g} "
                                    f"{v[2]:.9g}\n")


# ---------------------------------------------------------------------------
# readers
# ---------------------------------------------------------------------------

def read_surface(path: str) -> TriSurface:
    ext = os.path.splitext(path)[1].lower()
    if ext == ".stl":
        with open(path, "rb") as f:
            head = f.read(512)
        # binary STLs may still start with 'solid': check plausibility
        if head[:5].lower() == b"solid" and b"facet" in head:
            return _read_stl_ascii(path)
        return _read_stl_binary(path)
    if ext == ".obj":
        return _read_obj(path)
    raise KeyError(f"unknown surface format '{ext}' (.stl|.obj)")


_STL_VERTEX = re.compile(r"vertex\s+([-\d.eE+]+)\s+([-\d.eE+]+)\s+"
                         r"([-\d.eE+]+)")
_STL_SOLID = re.compile(r"^\s*(?:end)?solid(?:\s+(\S+))?", re.M)


def _read_stl_ascii(path: str) -> TriSurface:
    text = open(path).read()
    names, starts = [], []
    for m in re.finditer(r"^\s*solid(?:\s+(\S+))?", text, re.M):
        names.append(m.group(1) or f"solid{len(names)}")
        starts.append(m.start())
    verts = np.array([[float(a), float(b), float(c)]
                      for a, b, c in _STL_VERTEX.findall(text)])
    if verts.size == 0:
        return TriSurface(np.zeros((0, 3)), np.zeros((0, 3), np.int64))
    if verts.shape[0] % 3:
        raise ValueError(f"{path}: vertex count not divisible by 3")
    ntri = verts.shape[0] // 3
    faces = np.arange(3 * ntri, dtype=np.int64).reshape(ntri, 3)
    region = np.zeros(ntri, dtype=np.int64)
    if len(starts) > 1:
        vpos = [m.start() for m in _STL_VERTEX.finditer(text)]
        tri_pos = np.asarray(vpos[::3])
        region = np.searchsorted(np.asarray(starts), tri_pos,
                                 side="right") - 1
    return TriSurface(verts, faces, region, tuple(names)).merged()


def _read_stl_binary(path: str) -> TriSurface:
    with open(path, "rb") as f:
        f.seek(80)
        (ntri,) = struct.unpack("<I", f.read(4))
        raw = np.frombuffer(f.read(ntri * 50), dtype=np.uint8)
    if raw.size != ntri * 50:
        raise ValueError(f"{path}: truncated binary STL")
    rec = raw.reshape(ntri, 50)
    tri = rec[:, 12:48].copy().view("<f4").reshape(ntri, 3, 3)
    verts = tri.reshape(-1, 3).astype(np.float64)
    faces = np.arange(3 * ntri, dtype=np.int64).reshape(ntri, 3)
    return TriSurface(verts, faces,
                      np.zeros(ntri, np.int64), ("solid0",)).merged()


def _read_obj(path: str) -> TriSurface:
    pts, tris = [], []
    for line in open(path):
        t = line.split()
        if not t:
            continue
        if t[0] == "v":
            pts.append([float(t[1]), float(t[2]), float(t[3])])
        elif t[0] == "f":
            ids = [int(w.split("/")[0]) - 1 for w in t[1:]]
            for k in range(1, len(ids) - 1):     # fan-triangulate
                tris.append([ids[0], ids[k], ids[k + 1]])
    return TriSurface(np.asarray(pts, float),
                      np.asarray(tris, np.int64))


# ---------------------------------------------------------------------------
# primitive generators (searchableSurface-lite, for cases and tests)
# ---------------------------------------------------------------------------

def tri_box(lo, hi) -> TriSurface:
    lo = np.asarray(lo, float)
    hi = np.asarray(hi, float)
    corners = np.array([[lo[0], lo[1], lo[2]], [hi[0], lo[1], lo[2]],
                        [hi[0], hi[1], lo[2]], [lo[0], hi[1], lo[2]],
                        [lo[0], lo[1], hi[2]], [hi[0], lo[1], hi[2]],
                        [hi[0], hi[1], hi[2]], [lo[0], hi[1], hi[2]]])
    quads = [(0, 3, 2, 1), (4, 5, 6, 7), (0, 1, 5, 4),
             (2, 3, 7, 6), (1, 2, 6, 5), (3, 0, 4, 7)]
    tris = []
    for a, b, c, d in quads:
        tris += [[a, b, c], [a, c, d]]
    return TriSurface(corners, np.asarray(tris, np.int64))


def tri_sphere(centre, r, n: int = 2) -> TriSurface:
    """Subdivided icosahedron."""
    phi = (1 + 5 ** 0.5) / 2
    v = np.array([[-1, phi, 0], [1, phi, 0], [-1, -phi, 0], [1, -phi, 0],
                  [0, -1, phi], [0, 1, phi], [0, -1, -phi], [0, 1, -phi],
                  [phi, 0, -1], [phi, 0, 1], [-phi, 0, -1],
                  [-phi, 0, 1]], float)
    f = np.array([[0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10],
                  [0, 10, 11], [1, 5, 9], [5, 11, 4], [11, 10, 2],
                  [10, 7, 6], [7, 1, 8], [3, 9, 4], [3, 4, 2],
                  [3, 2, 6], [3, 6, 8], [3, 8, 9], [4, 9, 5],
                  [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1]],
                 np.int64)
    s = TriSurface(v, f)
    for _ in range(n):
        p = s.points[s.faces]
        mids = 0.5 * (p + np.roll(p, -1, axis=1))     # (m,3,3)
        newp = np.concatenate([s.points] + [mids.reshape(-1, 3)])
        base = s.points.shape[0]
        m01 = base + 3 * np.arange(s.n_faces)
        m12 = m01 + 1
        m20 = m01 + 2
        a, b, c = s.faces.T
        f2 = np.concatenate([
            np.stack([a, m01, m20], 1), np.stack([m01, b, m12], 1),
            np.stack([m20, m12, c], 1), np.stack([m01, m12, m20], 1)])
        s = TriSurface(newp, f2).merged()
    pn = s.points / np.linalg.norm(s.points, axis=1, keepdims=True)
    return TriSurface(np.asarray(centre, float) + r * pn, s.faces)
