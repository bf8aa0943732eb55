"""triSurface IO, meshSearch point location, isoSurface contouring
(reference: src/triSurface, src/meshTools/meshSearch,
src/sampling/sampledSurface/isoSurface).
"""

import os

import numpy as np

from rapidcfd_tpu.mesh.trisurface import (TriSurface, read_surface,
                                          tri_box, tri_sphere)


def test_tri_box_geometry():
    s = tri_box((0, 0, 0), (2, 1, 1))
    assert s.n_faces == 12
    assert abs(s.area() - 2 * (2 * 1 + 2 * 1 + 1 * 1)) < 1e-12


def test_tri_sphere_area():
    s = tri_sphere((1, 2, 3), 0.5, n=3)
    exact = 4 * np.pi * 0.25
    assert abs(s.area() - exact) / exact < 0.01
    r = np.linalg.norm(s.points - [1, 2, 3], axis=1)
    assert np.abs(r - 0.5).max() < 1e-12


def test_stl_roundtrips(tmp_path):
    s = tri_sphere((0, 0, 0), 1.0, n=1)
    for ext in (".stl", ".obj"):
        p = str(tmp_path / ("s" + ext))
        s.write(p)
        s2 = read_surface(p)
        assert s2.n_faces == s.n_faces
        assert abs(s2.area() - s.area()) < 1e-6
    # binary stl
    p = str(tmp_path / "s.stlb")
    s.write(p)
    os.rename(p, str(tmp_path / "sb.stl"))
    s3 = read_surface(str(tmp_path / "sb.stl"))
    assert s3.n_faces == s.n_faces
    assert abs(s3.area() - s.area()) < 1e-5


def _box_arrays(tmp, nx=8, ny=8, nz=4):
    from rapidcfd_tpu.mesh import build_mesh_arrays, read_polymesh
    from rapidcfd_tpu.utils.casegen import box_mesh, write_polymesh
    m = box_mesh(nx, ny, nz, size=(1.0, 1.0, 0.5))
    d = str(tmp)
    write_polymesh(m, d)
    ma, pm, _ = build_mesh_arrays(read_polymesh(d))
    return ma, pm


def test_meshsearch_find_cell(tmp_path_factory):
    ma, pm = _box_arrays(tmp_path_factory.mktemp("ms"))
    from rapidcfd_tpu.mesh.meshsearch import MeshSearch
    ms = MeshSearch(ma)
    # cell of (x,y,z) in the 8x8x4 box over (1,1,0.5): analytic id in
    # FILE order; compare geometrically instead (works renumbered)
    pts = np.array([[0.0626, 0.0626, 0.0626],
                    [0.9374, 0.51, 0.26],
                    [0.51, 0.9374, 0.01]])
    cells = ms.find_cell(pts)
    C = np.asarray(ma.C)
    for p, c in zip(pts, cells):
        assert c >= 0
        # containment: the found centre is the nearest one
        assert np.linalg.norm(C[c] - p) <= np.min(
            np.linalg.norm(C - p, axis=1)) + 1e-12
    outside = ms.find_cell([[1.5, 0.5, 0.2], [-0.1, 0.2, 0.1]])
    assert (outside == -1).all()


def test_isosurface_plane(tmp_path_factory):
    ma, pm = _box_arrays(tmp_path_factory.mktemp("iso1"))
    from rapidcfd_tpu.mesh.isosurface import iso_surface
    from rapidcfd_tpu.mesh.pointinterp import build_point_interpolator
    interp = build_point_interpolator(pm, ma)
    C = np.asarray(ma.C)
    cfb = np.asarray(ma.Cf)[ma.n_internal:]
    cv = C[:, 0]
    pv = np.asarray(interp(cv, cfb[:, 0]))
    surf, cells = iso_surface(ma, pm, cv, pv, 0.475)
    # the x = 0.475 plane cut of a (1 x 1 x 0.5) box: area 0.5
    assert abs(surf.area() - 0.5) < 0.02
    assert np.abs(surf.points[:, 0] - 0.475).max() < 1e-6
    assert cells.shape[0] == surf.n_faces


def test_isosurface_sphere(tmp_path_factory):
    ma, pm = _box_arrays(tmp_path_factory.mktemp("iso2"), 12, 12, 6)
    from rapidcfd_tpu.mesh.isosurface import iso_surface
    from rapidcfd_tpu.mesh.pointinterp import build_point_interpolator
    interp = build_point_interpolator(pm, ma)
    centre = np.array([0.5, 0.5, 0.25])
    C = np.asarray(ma.C)
    cfb = np.asarray(ma.Cf)[ma.n_internal:]
    cv = np.linalg.norm(C - centre, axis=1)
    pv = np.asarray(interp(cv, np.linalg.norm(cfb - centre, axis=1)))
    surf, _ = iso_surface(ma, pm, cv, pv, 0.2)
    exact = 4 * np.pi * 0.2 ** 2
    # inscribed faceting biases the area low ~ O((h/r)^2) at r/h ~ 2.4
    assert abs(surf.area() - exact) / exact < 0.08
    r = np.linalg.norm(surf.points - centre, axis=1)
    assert np.abs(r - 0.2).max() < 0.05


def test_sampled_isosurface_fo(tmp_path_factory):
    """sampledSurfaces with an isoSurface entry writes a VTK."""
    d = str(tmp_path_factory.mktemp("isofo"))
    from rapidcfd_tpu.utils.casegen import cavity_case
    cavity_case(d, n=8)
    import re
    cd = os.path.join(d, "system", "controlDict")
    text = open(cd).read()
    text += """
functions
{
    surfs
    {
        type            surfaces;
        fields          (p U);
        surfaces
        {
            piso { type isoSurface; isoField p; isoValue 0.0; }
        }
    }
}
"""
    open(cd, "w").write(text)
    from rapidcfd_tpu.utils import logging as L
    L.Info.enabled = False
    try:
        from rapidcfd_tpu.solvers import icofoam
        icofoam.run(d, write=False, max_steps=3)
    finally:
        L.Info.enabled = True
    hits = []
    for root, _, files in os.walk(os.path.join(d, "postProcessing")):
        hits += [os.path.join(root, f) for f in files
                 if f.endswith(".vtk")]
    assert hits, "no sampled-surface VTK written"
    body = open(hits[0]).read()
    assert "POLYGONS" in body and "SCALARS p" in body
