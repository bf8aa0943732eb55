"""searchableSurface family + coordinateSystems/coordinateRotation.

Reference: src/meshTools/searchableSurface/ (searchableSurface.H:63 —
the geometric-query abstraction behind topoSet sources, sampling and
snappy-class workflows: box, sphere, plane, cylinder, cone,
triSurfaceMesh, searchableSurfaceCollection) and src/meshTools/
coordinateSystems/ (+ coordinateRotation: axesRotation, EulerRotation,
STARCDRotation, cylindrical systems).

TPU-first: queries are vectorized numpy over point arrays (host-side
setup machinery, exactly like the reference's octree queries — the
results feed static index sets consumed by jitted code); rotations are
plain 3x3 matrices usable on host or device.
"""

from __future__ import annotations

import numpy as np

from ..utils.dictionary import Dictionary
from ..utils.registry import lookup as _lookup, register


def _vec(e):
    return np.asarray([float(x) for x in e], dtype=float)


# ---------------------------------------------------------------------------
# searchableSurface base + zoo
# ---------------------------------------------------------------------------

class SearchableSurface:
    """Query contract (reference: searchableSurface.H virtuals):
    inside(points) -> bool mask; nearest(points) -> (hit point, dist);
    normal(points) -> outward normal at nearest point."""

    name = "searchableSurface"

    def inside(self, pts: np.ndarray) -> np.ndarray:
        raise NotImplementedError

    def nearest(self, pts: np.ndarray):
        raise NotImplementedError

    def normal(self, pts: np.ndarray) -> np.ndarray:
        hit, _ = self.nearest(pts)
        d = pts - hit
        n = np.linalg.norm(d, axis=-1, keepdims=True)
        sgn = np.where(self.inside(pts)[:, None], -1.0, 1.0)
        return sgn * d / np.maximum(n, 1e-300)


@register("searchableSurface", "searchableBox", "box")
class SearchableBox(SearchableSurface):
    def __init__(self, d: Dictionary | None = None, min_=None,
                 max_=None, **_):
        if d is not None:
            min_ = _vec(d.lookup("min", required=True))
            max_ = _vec(d.lookup("max", required=True))
        self.min = np.asarray(min_, float)
        self.max = np.asarray(max_, float)

    def inside(self, pts):
        return ((pts >= self.min) & (pts <= self.max)).all(axis=-1)

    def nearest(self, pts):
        clamped = np.clip(pts, self.min, self.max)
        ins = self.inside(pts)
        # inside points snap to the closest face
        lo = pts - self.min
        hi = self.max - pts
        both = np.stack([lo, hi], axis=1)          # (n, 2, 3)
        k = np.argmin(both.reshape(len(pts), 6), axis=1)
        snapped = pts.copy()
        rows = np.arange(len(pts))
        axis = k % 3
        is_hi = k // 3
        snapped[rows, axis] = np.where(is_hi == 1, self.max[axis],
                                       self.min[axis])
        hit = np.where(ins[:, None], snapped, clamped)
        return hit, np.linalg.norm(pts - hit, axis=-1)


@register("searchableSurface", "searchableSphere", "sphere")
class SearchableSphere(SearchableSurface):
    def __init__(self, d: Dictionary | None = None, centre=None,
                 radius=None, **_):
        if d is not None:
            centre = _vec(d.lookup("centre", required=True))
            radius = float(d.scalar("radius"))
        self.centre = np.asarray(centre, float)
        self.radius = float(radius)

    def inside(self, pts):
        return np.linalg.norm(pts - self.centre, axis=-1) <= self.radius

    def nearest(self, pts):
        r = pts - self.centre
        m = np.linalg.norm(r, axis=-1, keepdims=True)
        hat = r / np.maximum(m, 1e-300)
        hit = self.centre + self.radius * hat
        return hit, np.abs(m[:, 0] - self.radius)

    def normal(self, pts):
        r = pts - self.centre
        return r / np.maximum(np.linalg.norm(r, axis=-1,
                                             keepdims=True), 1e-300)


@register("searchableSurface", "searchablePlane", "plane")
class SearchablePlane(SearchableSurface):
    def __init__(self, d: Dictionary | None = None, point=None,
                 normal=None, **_):
        if d is not None:
            pd = d.subdict("planeType", required=False)
            src = (d.subdict("pointAndNormalDict", required=False)
                   or pd or d)
            point = _vec(src.lookup("basePoint",
                                    required=False)
                         or src.lookup("point", required=True))
            normal = _vec(src.lookup("normalVector", required=False)
                          or src.lookup("normal", required=True))
        self.point = np.asarray(point, float)
        n = np.asarray(normal, float)
        self.n = n / np.linalg.norm(n)

    def inside(self, pts):
        """'inside' = below the plane (negative side), matching the
        reference's signed volume convention."""
        return ((pts - self.point) @ self.n) < 0.0

    def nearest(self, pts):
        dist = (pts - self.point) @ self.n
        return pts - dist[:, None] * self.n, np.abs(dist)

    def normal(self, pts):
        return np.broadcast_to(self.n, pts.shape).copy()


@register("searchableSurface", "searchableCylinder", "cylinder")
class SearchableCylinder(SearchableSurface):
    def __init__(self, d: Dictionary | None = None, point1=None,
                 point2=None, radius=None, **_):
        if d is not None:
            point1 = _vec(d.lookup("point1", required=True))
            point2 = _vec(d.lookup("point2", required=True))
            radius = float(d.scalar("radius"))
        self.p1 = np.asarray(point1, float)
        self.p2 = np.asarray(point2, float)
        ax = self.p2 - self.p1
        self.len = np.linalg.norm(ax)
        self.axis = ax / self.len
        self.radius = float(radius)

    def _decompose(self, pts):
        rel = pts - self.p1
        t = rel @ self.axis
        rad = rel - t[:, None] * self.axis
        return t, rad, np.linalg.norm(rad, axis=-1)

    def inside(self, pts):
        t, _, r = self._decompose(pts)
        return (t >= 0) & (t <= self.len) & (r <= self.radius)

    def nearest(self, pts):
        t, rad, r = self._decompose(pts)
        tc = np.clip(t, 0.0, self.len)
        rhat = rad / np.maximum(r, 1e-300)[:, None]
        # radial snap for points beside the shell; cap snap beyond ends
        rc = np.minimum(r, self.radius)
        hit = self.p1 + tc[:, None] * self.axis + rc[:, None] * rhat
        ins = self.inside(pts)
        if ins.any():
            # inside: closest of shell vs caps
            d_shell = self.radius - r
            d_cap = np.minimum(t, self.len - t)
            use_shell = d_shell <= d_cap
            shell_hit = self.p1 + t[:, None] * self.axis \
                + self.radius * rhat
            cap_t = np.where(t < self.len - t, 0.0, self.len)
            cap_hit = self.p1 + cap_t[:, None] * self.axis \
                + rad
            hit = np.where(ins[:, None],
                           np.where(use_shell[:, None], shell_hit,
                                    cap_hit), hit)
        return hit, np.linalg.norm(pts - hit, axis=-1)


@register("searchableSurface", "triSurfaceMesh")
class SearchableTriSurface(SearchableSurface):
    """triSurfaceMesh: queries against an STL/OBJ surface (reference:
    searchableSurface/triSurfaceMesh — octree there, KD-tree on
    triangle data here via mesh/trisurface.py)."""

    def __init__(self, d: Dictionary | None = None, surface=None,
                 case_dir: str = ".", **_):
        if surface is None:
            import os
            from .trisurface import read_surface
            fname = str(d.lookup("file", required=False)
                        or d.lookup("triSurface", required=True))
            fname = fname.strip('"')
            path = fname if os.path.isabs(fname) else os.path.join(
                case_dir, "constant", "triSurface", fname)
            surface = read_surface(path)
        self.surf = surface
        from scipy.spatial import cKDTree
        self._tree = cKDTree(self.surf.face_centres())

    def nearest(self, pts):
        d, j = self._tree.query(pts)
        # project onto the nearest triangle's plane for a tighter hit
        n = self.surf.face_normals()[j]
        c = self.surf.face_centres()[j]
        dist = ((pts - c) * n).sum(-1)
        hit = pts - dist[:, None] * n
        return hit, np.abs(dist)

    def inside(self, pts):
        """Sign from the nearest face normal (valid for closed,
        consistently-oriented surfaces)."""
        _, j = self._tree.query(pts)
        n = self.surf.face_normals()[j]
        c = self.surf.face_centres()[j]
        return ((pts - c) * n).sum(-1) < 0.0

    def normal(self, pts):
        _, j = self._tree.query(pts)
        return self.surf.face_normals()[j]


def make_searchable(name: str, d: Dictionary, case_dir: str = "."):
    """searchableSurface::New — `type` word dispatch (reference:
    searchableSurface.H runTimeSelection)."""
    typ = str(d.word("type", name))
    cls = _lookup("searchableSurface", typ)
    return cls(d=d, case_dir=case_dir)


# ---------------------------------------------------------------------------
# coordinateRotation + coordinateSystems (reference: src/meshTools/
# coordinateSystems/coordinateRotation/{axesRotation,EulerCoordinate
# Rotation,STARCDCoordinateRotation}.C + cylindricalCS)
# ---------------------------------------------------------------------------

def axes_rotation(e1=None, e2=None, e3=None) -> np.ndarray:
    """Rotation matrix R whose rows are the local axes (reference:
    axesRotation.C calcTransform, e1/e2 or e2/e3 or e3/e1 pairs)."""
    def unit(v):
        v = np.asarray(v, float)
        return v / np.linalg.norm(v)
    if e1 is not None and e2 is not None:
        a = unit(e1)
        c = unit(np.cross(a, unit(e2)))
        b = np.cross(c, a)
    elif e2 is not None and e3 is not None:
        b = unit(e2)
        a = unit(np.cross(b, unit(e3)))
        c = np.cross(a, b)
    elif e3 is not None and e1 is not None:
        c = unit(e3)
        b = unit(np.cross(c, unit(e1)))
        a = np.cross(b, c)
    else:
        raise ValueError("axesRotation: need two of e1/e2/e3")
    return np.stack([a, b, c])          # local = R @ global


def euler_rotation(phi, theta, psi, degrees=True) -> np.ndarray:
    """z-x'-z'' intrinsic Euler rotation (EulerCoordinateRotation.C)."""
    if degrees:
        phi, theta, psi = np.deg2rad([phi, theta, psi])

    def rz(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([[c, s, 0], [-s, c, 0], [0, 0, 1.0]])

    def rx(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([[1.0, 0, 0], [0, c, s], [0, -s, c]])
    return rz(psi) @ rx(theta) @ rz(phi)


def starcd_rotation(z, x, y, degrees=True) -> np.ndarray:
    """STAR-CD convention: rotation about z, then x', then y''
    (STARCDCoordinateRotation.C)."""
    if degrees:
        z, x, y = np.deg2rad([z, x, y])

    def rz(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([[c, s, 0], [-s, c, 0], [0, 0, 1.0]])

    def rx(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([[1.0, 0, 0], [0, c, s], [0, -s, c]])

    def ry(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([[c, 0, -s], [0, 1.0, 0], [s, 0, c]])
    return ry(y) @ rx(x) @ rz(z)


class CoordinateSystem:
    """cartesian coordinateSystem: origin + rotation (reference:
    coordinateSystem.H). localToGlobal/globalToLocal for positions and
    vectors; `cylindrical` adds the (r, theta, z) interpretation."""

    def __init__(self, origin, rotation: np.ndarray,
                 cylindrical: bool = False, degrees: bool = True):
        self.origin = np.asarray(origin, float)
        self.R = np.asarray(rotation, float)     # local = R @ global
        self.cylindrical = cylindrical
        self.degrees = degrees

    # -- vectors -----------------------------------------------------------
    def local_to_global_vector(self, v):
        return np.asarray(v) @ self.R            # R^T @ v, batched

    def global_to_local_vector(self, v):
        return np.asarray(v) @ self.R.T

    # -- positions ---------------------------------------------------------
    def local_to_global(self, p):
        p = np.asarray(p, float)
        if self.cylindrical:
            r, th, z = p[..., 0], p[..., 1], p[..., 2]
            if self.degrees:
                th = np.deg2rad(th)
            p = np.stack([r * np.cos(th), r * np.sin(th), z], axis=-1)
        return p @ self.R + self.origin

    def global_to_local(self, p):
        lp = (np.asarray(p, float) - self.origin) @ self.R.T
        if self.cylindrical:
            r = np.linalg.norm(lp[..., :2], axis=-1)
            th = np.arctan2(lp[..., 1], lp[..., 0])
            if self.degrees:
                th = np.rad2deg(th)
            lp = np.stack([r, th, lp[..., 2]], axis=-1)
        return lp


def make_coordinate_system(d: Dictionary) -> CoordinateSystem:
    """coordinateSystem::New from dict: `type cartesian|cylindrical;
    origin (...); coordinateRotation { type axesRotation; e1 ...; }`
    (also accepts the legacy flat e1/e2/e3 form)."""
    typ = str(d.word("type", "cartesian"))
    origin = _vec(d.lookup("origin", required=False) or (0, 0, 0))
    rot_d = d.subdict("coordinateRotation", required=False)
    if rot_d is None and d.lookup("e1", required=False) is None \
            and d.lookup("e3", required=False) is None:
        R = np.eye(3)
    else:
        src = rot_d if rot_d is not None else d
        rtyp = str(src.word("type", "axesRotation"))
        if rtyp in ("axesRotation", "axes", "cylindrical"):
            e = {k: _vec(src.lookup(k))
                 for k in ("e1", "e2", "e3")
                 if src.lookup(k, required=False) is not None}
            if rtyp == "cylindrical" and "e3" in e and "e1" not in e:
                e["e1"] = _vec(src.lookup(
                    "axis", required=False) or (1, 0, 0))
            R = axes_rotation(**e)
        elif rtyp in ("EulerRotation", "EulerCoordinateRotation"):
            ang = _vec(src.lookup("rotation", required=True))
            R = euler_rotation(*ang,
                               degrees=str(src.word(
                                   "degrees", "yes")) in
                               ("yes", "true", "on", "1"))
        elif rtyp in ("STARCDRotation", "STARCDCoordinateRotation"):
            ang = _vec(src.lookup("rotation", required=True))
            R = starcd_rotation(*ang)
        else:
            raise KeyError(f"unknown coordinateRotation '{rtyp}'")
    return CoordinateSystem(origin, R,
                            cylindrical=(typ == "cylindrical"),
                            degrees=str(d.word("degrees", "yes")) in
                            ("yes", "true", "on", "1"))
