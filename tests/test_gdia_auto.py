"""Auto-detected gdia lattice mode for masked-grid meshes read from
disk (forward steps / T-junctions): Case routes them onto the
gather-free generalized-DIA path (mesh/gdia.py) with DEAD slots, and
the solution must match the padded-ELL gather path exactly (same
discretization, different execution layout).
"""

import numpy as np
import pytest

from rapidcfd_tpu.utils import switches
from rapidcfd_tpu.utils.casegen import forward_step_case
from rapidcfd_tpu.utils import logging as L


@pytest.fixture()
def quiet():
    L.Info.enabled = False
    yield
    L.Info.enabled = True


def _run_sonic(d, steps):
    from rapidcfd_tpu.solvers import sonicfoam
    case, U, p, T, rho, phi = sonicfoam.run(d, max_steps=steps,
                                            write=False)
    return case, np.asarray(p.data, np.float64), \
        np.asarray(U.data, np.float64)


def test_forward_step_detects_lattice(tmp_path, quiet):
    d = str(tmp_path / "fs")
    forward_step_case(d, end_time=1.0)
    from rapidcfd_tpu.mesh.polymesh import read_polymesh
    from rapidcfd_tpu.utils.unstructured import detect_lattice
    lat = detect_lattice(read_polymesh(d))
    assert lat is not None
    nz, ny, nx = lat["shape"]
    assert (nx, ny, nz) == (60, 16, 1)
    # the step (x>0.6, y<0.2) blanks 48*3 slots
    assert int(lat["dead"].sum()) == 48 * 3


def test_sonicfoam_gdia_matches_gather(tmp_path, quiet):
    d1 = str(tmp_path / "gdia")
    d2 = str(tmp_path / "gather")
    forward_step_case(d1, end_time=1.0)
    forward_step_case(d2, end_time=1.0)

    switches._CACHE["GDIA_AUTO"] = "1"
    try:
        case1, p1, u1 = _run_sonic(d1, 10)
        assert case1.mesh.gdia is not None, "gdia mode not engaged"
        switches._CACHE["GDIA_AUTO"] = "0"
        case2, p2, u2 = _run_sonic(d2, 10)
        assert case2.mesh.gdia is None
    finally:
        switches._CACHE.pop("GDIA_AUTO", None)

    # gdia state is padded (slots); fold to file order for comparison
    pf1 = case1.maps.cells_to_file(p1)
    pf2 = case2.maps.cells_to_file(p2)
    uf1 = case1.maps.cells_to_file(u1)
    uf2 = case2.maps.cells_to_file(u2)
    assert pf1.shape == pf2.shape
    np.testing.assert_allclose(pf1, pf2, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(uf1, uf2, rtol=1e-6, atol=1e-8)
