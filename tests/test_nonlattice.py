"""Genuinely non-lattice polyhedral mesh (VERDICT r4 item 3): a curved,
wall-graded, perturbed, cell-merged duct that detect_lattice must
REJECT — the general padded-ELL gather path handles it, single-chip and
decomposed (BASELINE config 5's honest topology proxy; reference
counterpart: variable faces-per-cell addressing,
lduAddressing.C:169-310)."""

import numpy as np
import pytest

from rapidcfd_tpu.utils import logging as L


@pytest.fixture
def quiet():
    L.Info.enabled = False
    yield
    L.Info.enabled = True


def test_curved_duct_rejects_lattice_and_solves(tmp_path, quiet):
    from rapidcfd_tpu.solvers import simplefoam
    from rapidcfd_tpu.utils.unstructured import (detect_lattice,
                                                 unstructured_channel_case)
    d = str(tmp_path)
    pm = unstructured_channel_case(
        d, nx=24, ny=12, nz=12, end_time=10**9, perturb=0.12,
        merge_fraction=0.04, seed=3, write_mesh=True, curve=1.2,
        grade=4.0)
    assert detect_lattice(pm) is None
    case, U, p, phi, ts = simplefoam.run(d, write=False, max_steps=3)
    assert case.mesh.gdia is None
    assert case.mesh.K > 6          # polyhedral overflow slots present
    for f in (p.data, U.data, ts["k"].data, ts["omega"].data):
        assert bool(np.isfinite(np.asarray(f)).all())
    # wall grading really happened: smallest wall-normal spacing far
    # below the uniform value
    V = np.asarray(case.mesh.V)
    assert V.min() < 0.6 * V.mean()


def test_nonlattice_8dev_rcb_matches_single_chip():
    """Full SIMPLE + kOmegaSST + GAMG-preconditioned pressure on the
    curved polyhedral duct, RCB-decomposed over 8 virtual devices —
    n-dev == 1-chip at fp64."""
    from rapidcfd_tpu.parallel.dryrun import dryrun_simple_step
    dryrun_simple_step(8, method="rcb", case_kind="nonlattice",
                       model="kOmegaSST")
