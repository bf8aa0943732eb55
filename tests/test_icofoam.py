"""Integration test: icoFoam on the lid-driven cavity (BASELINE config 1).

Acceptance per SURVEY.md §7.1 stage 6: runs fully jitted, machine-zero
global continuity, physically-correct Ghia-class velocity profile.
"""

import numpy as np
import pytest

from rapidcfd_tpu.utils import logging as L
from rapidcfd_tpu.utils.casegen import cavity_case


@pytest.fixture(scope="module")
def cavity_run(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("cav"))
    cavity_case(d, end_time=0.1, write_interval=20)  # 20 steps
    L.Info.enabled = False
    from rapidcfd_tpu.solvers import icofoam
    case, U, p, phi = icofoam.run(d)
    L.Info.enabled = True
    return d, case, U, p, phi


def test_cavity_continuity_machine_zero(cavity_run):
    d, case, U, p, phi = cavity_run
    from rapidcfd_tpu.ops import fvc
    cont = fvc.div(case.mesh, phi)
    glob = float((cont.data * case.mesh.V).sum())
    local = float((np.abs(np.asarray(cont.data)) * np.asarray(case.mesh.V)
                   ).sum())
    assert abs(glob) < 1e-15
    assert local < 1e-8


def test_cavity_velocity_field_sane(cavity_run):
    d, case, U, p, phi = cavity_run
    u = np.asarray(U.data)
    # lid drives flow: bounded by lid speed (+ small overshoot near corners)
    assert np.abs(u).max() < 1.0
    assert u[:, 2].max() < 1e-12  # strictly 2D
    # recirculation: negative u_x must exist in the lower cavity
    assert u[:, 0].min() < -0.05
    # no NaNs anywhere
    assert np.isfinite(u).all() and np.isfinite(np.asarray(p.data)).all()


def test_cavity_writes_checkpoint_roundtrip(cavity_run):
    d, case, U, p, phi = cavity_run
    import os
    assert os.path.isdir(os.path.join(d, "0.1"))
    U2 = case.read_field("U", "0.1")
    assert np.allclose(np.asarray(U2.data), np.asarray(U.data), atol=1e-7)
    # uniform/time restart metadata
    from rapidcfd_tpu.utils.dictionary import parse_file
    t = parse_file(os.path.join(d, "0.1", "uniform", "time"))
    assert t.scalar("deltaT") == 0.005
    assert int(t.scalar("index")) == 20


def test_cavity_ghia_profile(tmp_path_factory):
    """Run to t=0.5 (near-steady) and compare the vertical-centerline
    u-profile minimum against Ghia et al. (Re=100): u_min=-0.211 at
    y=0.453 — on a 20x20 mesh expect it within ~15%."""
    d = str(tmp_path_factory.mktemp("cavg"))
    cavity_case(d, end_time=0.5)
    L.Info.enabled = False
    from rapidcfd_tpu.solvers import icofoam
    case, U, p, phi = icofoam.run(d, write=False)
    L.Info.enabled = True
    u = np.asarray(U.data)
    C = np.asarray(case.mesh.C)
    col = np.isclose(C[:, 0], 0.0475) | np.isclose(C[:, 0], 0.0525)
    ys = C[col, 1] / 0.1
    us = u[col, 0]
    umin = us.min()
    ymin = ys[us.argmin()]
    assert -0.24 < umin < -0.17
    assert 0.35 < ymin < 0.60
