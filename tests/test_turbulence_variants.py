"""RAS variant models (kOmega, RNGkEpsilon, realizableKE) on pitzDaily."""

import numpy as np
import pytest

from rapidcfd_tpu.utils import logging as L
from rapidcfd_tpu.utils.casegen import pitz_daily_case


@pytest.mark.parametrize("model", ["kOmega", "RNGkEpsilon", "realizableKE"])
def test_variant_runs_and_produces_turbulence(model, tmp_path_factory):
    d = str(tmp_path_factory.mktemp(model))
    pitz_daily_case(d, end_time=8, model=model)
    L.Info.enabled = False
    from rapidcfd_tpu.solvers import simplefoam
    case, U, p, phi, ts = simplefoam.run(d, write=False)
    L.Info.enabled = True
    u = np.asarray(U.data)
    assert np.isfinite(u).all()
    assert np.isfinite(np.asarray(p.data)).all()
    k = np.asarray(ts["k"].data)
    nut = np.asarray(ts["nut"].data)
    assert (k > 0).all() and (nut >= 0).all()
    assert np.isfinite(nut).all()
    # eddy viscosity is actually produced in the shear layer
    assert nut.max() > 1e-5
    if model == "kOmega":
        om = np.asarray(ts["omega"].data)
        assert (om > 0).all()
    else:
        eps = np.asarray(ts["epsilon"].data)
        assert (eps > 0).all()
