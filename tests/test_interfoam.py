"""interFoam + MULES: closed-box dam break (exact volume conservation)."""

import numpy as np
import pytest

from rapidcfd_tpu.utils import logging as L
from rapidcfd_tpu.utils.casegen import dam_break_case


@pytest.fixture(scope="module")
def dam_run(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("dam"))
    dam_break_case(d, end_time=0.05)  # 50 steps
    L.Info.enabled = False
    from rapidcfd_tpu.solvers import interfoam
    out = interfoam.run(d, write=False)
    L.Info.enabled = True
    return (d,) + out


def test_mules_boundedness(dam_run):
    d, case, alpha, U, p_rgh, phi = dam_run
    a = np.asarray(alpha.data)
    assert np.isfinite(a).all()
    # tiny limiter roundoff accumulates over steps (reference logs show
    # the same Max(alpha1)=1.0000000x behaviour)
    assert a.min() > -1e-6 and a.max() < 1.0 + 1e-6


def test_volume_conservation(dam_run):
    """Closed box: MULES fluxes telescope, water volume exact."""
    d, case, alpha, U, p_rgh, phi = dam_run
    a = np.asarray(alpha.data)
    V = np.asarray(case.mesh.V)
    vol = (a * V).sum()
    a0 = np.asarray(case.read_field("alpha1", "0").data)
    vol0 = (a0 * V).sum()
    assert abs(vol - vol0) / vol0 < 1e-10


def test_hydrostatic_pressure_and_collapse(dam_run):
    d, case, alpha, U, p_rgh, phi = dam_run
    pr = np.asarray(p_rgh.data)
    u = np.asarray(U.data)
    assert np.isfinite(pr).all() and np.isfinite(u).all()
    # p_rgh scale ~ rho*g*h of the column (2.8e3 Pa)
    assert 1e3 < pr.max() < 2e4
    # the column is collapsing: significant horizontal velocity develops
    assert u[:, 0].max() > 0.3
