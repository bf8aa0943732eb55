"""searchableSurface family + coordinateSystems.

Reference: src/meshTools/searchableSurface/searchableSurface.H:63 and
src/meshTools/coordinateSystems/.
"""

import numpy as np

from rapidcfd_tpu.mesh.searchable import (CoordinateSystem,
                                          SearchableBox,
                                          SearchableCylinder,
                                          SearchablePlane,
                                          SearchableSphere,
                                          axes_rotation, euler_rotation,
                                          make_coordinate_system,
                                          make_searchable)
from rapidcfd_tpu.utils.dictionary import parse_dictionary


def test_box_queries():
    b = SearchableBox(min_=(0, 0, 0), max_=(1, 1, 1))
    pts = np.array([[0.5, 0.5, 0.5], [2.0, 0.5, 0.5], [-1, -1, -1]])
    assert list(b.inside(pts)) == [True, False, False]
    hit, dist = b.nearest(pts)
    assert abs(dist[1] - 1.0) < 1e-12
    assert np.allclose(hit[1], [1, 0.5, 0.5])
    assert np.allclose(dist[2], np.sqrt(3))
    # inside point snaps to the closest face
    assert abs(dist[0] - 0.5) < 1e-12


def test_sphere_and_plane():
    s = SearchableSphere(centre=(0, 0, 0), radius=2.0)
    pts = np.array([[3.0, 0, 0], [0.0, 1.0, 0]])
    assert list(s.inside(pts)) == [False, True]
    hit, dist = s.nearest(pts)
    assert np.allclose(hit[0], [2, 0, 0]) and abs(dist[0] - 1) < 1e-12
    assert np.allclose(s.normal(pts)[0], [1, 0, 0])

    p = SearchablePlane(point=(0, 0, 0), normal=(0, 1, 0))
    pts = np.array([[0.3, 2.0, 0.1], [0.0, -1.0, 0.0]])
    assert list(p.inside(pts)) == [False, True]
    hit, dist = p.nearest(pts)
    assert abs(dist[0] - 2.0) < 1e-12 and abs(hit[0][1]) < 1e-12


def test_cylinder_queries():
    c = SearchableCylinder(point1=(0, 0, 0), point2=(0, 0, 2),
                           radius=1.0)
    pts = np.array([[0.5, 0, 1.0],     # inside
                    [2.0, 0, 1.0],     # beside the shell
                    [0.0, 0, 3.0]])    # beyond the cap
    assert list(c.inside(pts)) == [True, False, False]
    hit, dist = c.nearest(pts)
    assert abs(dist[1] - 1.0) < 1e-12
    assert abs(dist[2] - 1.0) < 1e-12
    assert abs(dist[0] - 0.5) < 1e-12      # shell is closest


def test_factory_and_toposet_integration():
    d = parse_dictionary("""
type searchableSphere;
centre (0 0 0);
radius 1.5;
""")
    s = make_searchable("sphere", d)
    assert isinstance(s, SearchableSphere) and s.radius == 1.5


def test_axes_and_euler_rotations():
    R = axes_rotation(e1=(0, 1, 0), e2=(-1, 0, 0))
    # local x = global y
    v = np.array([[1.0, 0, 0]])
    assert np.allclose(R @ np.array([0, 1.0, 0]), [1, 0, 0])
    # Euler identity
    assert np.allclose(euler_rotation(0, 0, 0), np.eye(3))
    R90 = euler_rotation(90, 0, 0)
    assert np.allclose(R90 @ np.array([0, 1.0, 0]), [1, 0, 0],
                       atol=1e-12)


def test_cylindrical_coordinate_system():
    d = parse_dictionary("""
type cylindrical;
origin (1 0 0);
degrees yes;
coordinateRotation { type axesRotation; e1 (1 0 0); e2 (0 1 0); }
""")
    cs = make_coordinate_system(d)
    # (r=2, theta=90deg, z=0.5) -> global (1, 2, 0.5)
    g = cs.local_to_global(np.array([[2.0, 90.0, 0.5]]))
    assert np.allclose(g, [[1.0, 2.0, 0.5]], atol=1e-12)
    back = cs.global_to_local(g)
    assert np.allclose(back, [[2.0, 90.0, 0.5]], atol=1e-10)


def test_searchable_surface_to_cell(tmp_path):
    """searchableSurfaceToCell topoSet source selects the cells whose
    centres fall inside the surface."""
    from rapidcfd_tpu.mesh.toposet import source_cells
    from rapidcfd_tpu.utils.casegen import box_mesh
    from rapidcfd_tpu.mesh.polymesh import write_polymesh
    from rapidcfd_tpu.solvers.case import Case

    d = str(tmp_path)
    mesh = box_mesh(8, 8, 1, size=(1.0, 1.0, 0.1))
    write_polymesh(mesh, d)
    import os
    os.makedirs(os.path.join(d, "system"), exist_ok=True)
    from rapidcfd_tpu.utils.casegen import _write, foamfile_header
    _write(os.path.join(d, "system", "controlDict"),
           foamfile_header("dictionary", "controlDict", "system"),
           "\nstartTime 0; endTime 1; deltaT 1;\n")
    _write(os.path.join(d, "system", "fvSchemes"),
           foamfile_header("dictionary", "fvSchemes", "system"),
           "\nddtSchemes { default Euler; }\n"
           "gradSchemes { default Gauss linear; }\n"
           "divSchemes { default none; }\n"
           "laplacianSchemes { default Gauss linear orthogonal; }\n"
           "interpolationSchemes { default linear; }\n"
           "snGradSchemes { default orthogonal; }\n")
    _write(os.path.join(d, "system", "fvSolution"),
           foamfile_header("dictionary", "fvSolution", "system"),
           "\nsolvers {}\n")
    case = Case(d)
    sd = parse_dictionary("""
surface
{
    type searchableSphere;
    centre (0.5 0.5 0.05);
    radius 0.25;
}
""")
    cells = source_cells(case.pmesh, "searchableSurfaceToCell", sd, {},
                         d)
    C = np.asarray(case.mesh.C)[cells]
    assert len(cells) > 0
    assert (np.linalg.norm(C - [0.5, 0.5, 0.05], axis=1) <= 0.25).all()
