"""foamLog-equivalent extractor (reference: bin/foamLog + tools/foamLog.db)."""

import os

from rapidcfd_tpu.utils.foamlog import extract, write_xy

LOG = """\
Time = 0.005

Courant Number mean: 0.1 max: 0.5
PBiCGStab:  Solving for Ux, Initial residual = 0.1, Final residual = 1e-07, No Iterations 3
PBiCGStab:  Solving for Uy, Initial residual = 0.2, Final residual = 2e-07, No Iterations 4
PCG:  Solving for p, Initial residual = 1, Final residual = 1e-07, No Iterations 30
time step continuity errors : sum local = 1e-09, global = -1e-10, cumulative = -1e-10
PCG:  Solving for p, Initial residual = 0.01, Final residual = 9e-08, No Iterations 12
time step continuity errors : sum local = 2e-09, global = -2e-10, cumulative = -3e-10
ExecutionTime = 1.5 s  ClockTime = 2 s

Time = 0.01

PCG:  Solving for p, Initial residual = 0.5, Final residual = 5e-08, No Iterations 20
"""


def test_extract_quantities():
    rows = list(extract(LOG.splitlines()))
    d = {}
    for q, t, v in rows:
        d.setdefault(q, []).append((t, v))
    assert d["Ux_0"] == [(0.005, 0.1)]
    assert d["UxIters_0"] == [(0.005, 3.0)]
    # two p solves in the first step -> occurrence indices
    assert d["p_0"] == [(0.005, 1.0), (0.01, 0.5)]
    assert d["p_1"] == [(0.005, 0.01)]
    assert d["pFinalRes_1"] == [(0.005, 9e-08)]
    assert d["contCumulative_0"][-1] == (0.005, -3e-10)
    assert d["CourantMax_0"] == [(0.005, 0.5)]
    assert d["executionTime_0"] == [(0.005, 1.5)]


def test_write_xy(tmp_path):
    series = write_xy(LOG.splitlines(), str(tmp_path))
    assert "p_0" in series
    with open(os.path.join(str(tmp_path), "p_0.xy")) as f:
        lines = f.read().splitlines()
    assert lines == ["0.005\t1.0", "0.01\t0.5"]
