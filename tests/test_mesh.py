"""Mesh pipeline tests: casegen -> polyMesh IO -> geometry -> MeshArrays.

Validation targets from SURVEY.md §7.1 stage 1: cavity counts, volumes,
Sf closure.
"""

import numpy as np
import pytest

from rapidcfd_tpu.mesh import build_mesh_arrays, read_polymesh
from rapidcfd_tpu.mesh.geometry import (cell_centres_and_vols,
                                        cuthill_mckee,
                                        face_centres_and_areas,
                                        renumber_mesh)
from rapidcfd_tpu.utils.casegen import box_mesh, cavity_case


@pytest.fixture(scope="module")
def cavity(tmp_path_factory):
    d = tmp_path_factory.mktemp("cavity")
    cavity_case(str(d))
    return str(d)


def test_cavity_roundtrip_counts(cavity):
    mesh = read_polymesh(cavity)
    assert mesh.n_cells == 400
    assert mesh.n_points == 21 * 21 * 2
    assert mesh.n_internal_faces == 2 * 20 * 19
    assert mesh.n_faces == 760 + 20 + 60 + 800
    names = [p.name for p in mesh.patches]
    assert names == ["movingWall", "fixedWalls", "frontAndBack"]
    assert mesh.patches[2].type == "empty"
    assert mesh.patches[2].n_faces == 800


def test_cavity_geometry(cavity):
    mesh = read_polymesh(cavity)
    Cf, Sf = face_centres_and_areas(mesh)
    C, V = cell_centres_and_vols(mesh, Cf, Sf)
    # total volume = 0.1 * 0.1 * 0.01
    assert np.isclose(V.sum(), 1e-4, rtol=1e-12)
    assert np.allclose(V, 1e-4 / 400, rtol=1e-12)
    # per-cell closure: sum of outward face vectors = 0
    closure = np.zeros((mesh.n_cells, 3))
    np.add.at(closure, mesh.owner, Sf)
    np.add.at(closure, mesh.neighbour, -Sf[:mesh.n_internal_faces])
    assert np.abs(closure).max() < 1e-16
    # face areas: x/y internal faces are 0.005 x 0.01
    mag = np.linalg.norm(Sf[:mesh.n_internal_faces], axis=1)
    assert np.allclose(mag, 0.005 * 0.01, rtol=1e-12)


def test_owner_sorted_invariant(cavity):
    mesh = read_polymesh(cavity)
    n_int = mesh.n_internal_faces
    assert (mesh.owner[:n_int] < mesh.neighbour).all()
    key = mesh.owner[:n_int] * mesh.n_cells + mesh.neighbour
    assert (np.diff(key) > 0).all()


def test_renumber_preserves_geometry(cavity):
    mesh = read_polymesh(cavity)
    perm = cuthill_mckee(mesh)
    rmesh = renumber_mesh(mesh, perm)
    n_int = rmesh.n_internal_faces
    assert (rmesh.owner[:n_int] < rmesh.neighbour).all()
    key = rmesh.owner[:n_int] * rmesh.n_cells + rmesh.neighbour
    assert (np.diff(key) > 0).all()
    Cf, Sf = face_centres_and_areas(rmesh)
    C, V = cell_centres_and_vols(rmesh, Cf, Sf)
    assert np.isclose(V.sum(), 1e-4, rtol=1e-12)
    closure = np.zeros((rmesh.n_cells, 3))
    np.add.at(closure, rmesh.owner, Sf)
    np.add.at(closure, rmesh.neighbour, -Sf[:n_int])
    assert np.abs(closure).max() < 1e-16
    # bandwidth reduced or equal
    bw_old = int(np.abs(mesh.neighbour - mesh.owner[:n_int]).max())
    bw_new = int(np.abs(rmesh.neighbour - rmesh.owner[:n_int]).max())
    assert bw_new <= bw_old


def test_mesh_arrays_ell(cavity):
    mesh = read_polymesh(cavity)
    ma, rmesh, _maps = build_mesh_arrays(mesh)
    assert ma.n_cells == 400 and ma.K == 4  # empty faces excluded from ELL
    cf = np.asarray(ma.cell_faces)
    sg = np.asarray(ma.cell_sign)
    nb = np.asarray(ma.cell_nbr)
    imask = np.asarray(ma.internal_mask)
    own = np.asarray(ma.owner)
    nei = np.asarray(ma.neighbour)
    n_int = ma.n_internal

    for c in [0, 57, 399]:
        for k in range(ma.K):
            if sg[c, k] == 0:
                continue
            f = cf[c, k]
            if sg[c, k] > 0:
                assert own[f] == c
            else:
                assert f < n_int and nei[f] == c
            if imask[c, k]:
                expected = nei[f] if sg[c, k] > 0 else own[f]
                assert nb[c, k] == expected
            else:
                assert nb[c, k] == c
    # interior cells have 4 slots filled (2D), weights = 0.5 uniform
    assert np.isclose(np.asarray(ma.weights), 0.5).all()
    # every internal face appears exactly twice in the ELL, boundary once
    counts = np.zeros(ma.n_faces)
    np.add.at(counts, cf[sg != 0], 1)
    assert (counts[:n_int] == 2).all()


def test_ell_surface_integrate_consistency(cavity):
    """ELL gather-sum of a face field == scatter-add reference."""
    mesh = read_polymesh(cavity)
    ma, rmesh, _maps = build_mesh_arrays(mesh)
    rng = np.random.default_rng(0)
    flux = rng.normal(size=ma.n_faces)
    # zero flux on empty faces (as BCs guarantee)
    for p in ma.patches:
        if p.is_empty:
            flux[p.start:p.start + p.size] = 0.0
    ref = np.zeros(ma.n_cells)
    np.add.at(ref, np.asarray(ma.owner), flux)
    np.add.at(ref, np.asarray(ma.neighbour), -flux[:ma.n_internal])
    ell = (np.asarray(ma.cell_sign)
           * flux[np.asarray(ma.cell_faces)]).sum(axis=1)
    assert np.allclose(ell, ref, atol=1e-13)


def test_graded_box_mesh():
    mesh = box_mesh(10, 4, 1, size=(2.0, 1.0, 0.1), grading=(4.0, 1.0, 1.0))
    Cf, Sf = face_centres_and_areas(mesh)
    C, V = cell_centres_and_vols(mesh, Cf, Sf)
    assert np.isclose(V.sum(), 0.2, rtol=1e-12)
    ma, _, _2 = build_mesh_arrays(mesh, renumber=False)
    w = np.asarray(ma.weights)
    assert (w > 0).all() and (w < 1).all()


def test_box_mesh_matches_fast_builder():
    """Pin the structured-box mesh CONTRACT (owner-sorted upper-
    triangular internal faces in x-fastest natural ordering, then patch
    faces) against stored golden arrays for a 3x2x1 box — the structured
    fast-path detection and the decomposition both rely on this exact
    ordering, and box_mesh now delegates to box_mesh_fast so a
    builder-vs-builder comparison would be vacuous."""
    spec = {"xmin": ("left", "patch"), "xmax": ("right", "patch"),
            "ymin": ("walls", "wall"), "ymax": ("walls", "wall"),
            "zmin": ("fb", "empty"), "zmax": ("fb", "empty")}
    m = box_mesh(3, 2, 1, size=(1.0, 2.0, 3.0), patch_spec=spec)
    assert np.array_equal(m.owner, [
        0, 0, 1, 1, 2, 3, 4,                      # internal
        0, 3, 2, 5,                               # left/right
        0, 1, 2, 3, 4, 5,                         # walls (ymin+ymax)
        0, 1, 2, 3, 4, 5, 0, 1, 2, 3, 4, 5])      # fb (zmin+zmax)
    assert np.array_equal(m.neighbour, [1, 3, 2, 4, 5, 4, 5])
    assert np.array_equal(m.face_offsets, np.arange(30) * 4)
    assert [(p.name, p.type, p.start_face, p.n_faces)
            for p in m.patches] == [
        ("left", "patch", 7, 2), ("right", "patch", 9, 2),
        ("walls", "wall", 11, 6), ("fb", "empty", 17, 12)]
    # first internal face (between cells 0 and 1, x-normal plane)
    assert np.array_equal(m.face_points[:4], [1, 5, 17, 13])
    # point grid: (nx+1)(ny+1)(nz+1) nodes, x fastest
    assert m.points.shape == (24, 3)
    assert np.allclose(m.points[1], [1.0 / 3.0, 0.0, 0.0])
    assert np.allclose(m.points[4], [0.0, 1.0, 0.0])
    assert np.allclose(m.points[12], [0.0, 0.0, 3.0])


def test_box_mesh_cyclic_spec_carries_neighbour():
    mesh = box_mesh(4, 3, 1, patch_spec={
        "xmin": ("inlet", "cyclic", "outlet"),
        "xmax": ("outlet", "cyclic", "inlet"),
        "ymin": ("walls", "wall"), "ymax": ("walls", "wall"),
        "zmin": ("fb", "empty"), "zmax": ("fb", "empty")})
    by = {p.name: p for p in mesh.patches}
    assert by["inlet"].extra["neighbourPatch"] == "outlet"
    assert by["outlet"].extra["neighbourPatch"] == "inlet"
