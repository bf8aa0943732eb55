"""Integration: simpleFoam + kEpsilon + wall functions + GAMG on the
backward-facing step (BASELINE config 2 class)."""

import numpy as np
import pytest

from rapidcfd_tpu.utils import logging as L
from rapidcfd_tpu.utils.casegen import pitz_daily_case


@pytest.fixture(scope="module")
def pitz_run(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("pitz"))
    pitz_daily_case(d, end_time=30)
    L.Info.enabled = False
    from rapidcfd_tpu.solvers import simplefoam
    out = simplefoam.run(d)
    L.Info.enabled = True
    return (d,) + out


def test_pitz_mesh_shape(pitz_run):
    d, case = pitz_run[0], pitz_run[1]
    n_live = 12 * 20 + 100 * 40   # step blanked
    if case.mesh.gdia is not None:
        # auto-detected lattice mode: cells are padded SLOTS; the live
        # (primary) count is the real mesh size
        import numpy as np_
        assert int(np_.asarray(case.mesh.gdia.primary).sum()) == n_live
    else:
        assert case.mesh.n_cells == n_live
    names = [p.name for p in case.mesh.patches]
    assert names == ["inlet", "outlet", "upperWall", "lowerWall",
                     "frontAndBack"]


def test_pitz_fields_finite_and_physical(pitz_run):
    d, case, U, p, phi, ts = pitz_run
    u = np.asarray(U.data)
    assert np.isfinite(u).all()
    assert np.isfinite(np.asarray(p.data)).all()
    k = np.asarray(ts["k"].data)
    eps = np.asarray(ts["epsilon"].data)
    nut = np.asarray(ts["nut"].data)
    assert (k > 0).all() and (eps > 0).all() and (nut >= 0).all()
    # turbulence is actually produced in the shear layer
    assert nut.max() > 1e-4
    # impulsive-start transient overshoots early; must stay bounded
    # (settles to ~1.03*U_in by convergence)
    assert 5.0 < np.abs(u).max() < 100.0


def test_pitz_residuals_decrease(pitz_run):
    d, case, U, p, phi, ts = pitz_run
    from rapidcfd_tpu.ops import fvc
    cont = fvc.div(case.mesh, phi)
    local = float((np.abs(np.asarray(cont.data))
                   * np.asarray(case.mesh.V)).sum())
    assert local < 1e-3  # decreasing toward steady state


def test_wall_function_nut_nonzero_on_walls(pitz_run):
    d, case, U, p, phi, ts = pitz_run
    nut = ts["nut"]
    for patch in case.mesh.patches:
        if patch.name in ("upperWall", "lowerWall"):
            vals = np.asarray(
                nut.bvalues[patch.bstart:patch.bstart + patch.size])
            assert vals.max() > 0.0  # log-law region active somewhere


def test_komegasst_runs(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("sst"))
    pitz_daily_case(d, end_time=15, model="kOmegaSST")
    L.Info.enabled = False
    from rapidcfd_tpu.solvers import simplefoam
    case, U, p, phi, ts = simplefoam.run(d, write=False)
    L.Info.enabled = True
    assert np.isfinite(np.asarray(U.data)).all()
    assert (np.asarray(ts["omega"].data) > 0).all()
    assert float(ts["nut"].data.max()) > 1e-6
