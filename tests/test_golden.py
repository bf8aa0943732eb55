"""Golden-file validation (VERDICT r1 item 4).

1. A case directory hand-written in OpenFOAM syntax (tests/golden/
   handcase) — NOT produced by casegen or write_polymesh — exercising
   the dictionary/polyMesh parsers on foreign formatting, #include,
   $macro expansion, and regex boundaryField keys, then running icoFoam
   on it end-to-end.
2. Full-field fp64 golden comparison for the 20x20 cavity (BASELINE
   config 1): a committed fp64 .npz (tests/golden/cavity20_fp64.npz,
   regenerable with tests/golden/run_cavity_golden.py) compared at the
   SURVEY §4 1e-8 field-match class in an fp64 subprocess, and at fp32
   accuracy in-process.
"""

import os
import shutil
import subprocess
import sys

import numpy as np
import pytest

GOLD = os.path.join(os.path.dirname(__file__), "golden")


@pytest.fixture(scope="module")
def handcase_run(tmp_path_factory):
    d = os.path.join(str(tmp_path_factory.mktemp("hand")), "case")
    shutil.copytree(os.path.join(GOLD, "handcase"), d)
    from rapidcfd_tpu.utils import logging as L
    L.Info.enabled = False
    try:
        from rapidcfd_tpu.solvers import icofoam
        case, U, p, phi = icofoam.run(d, write=True)
    finally:
        L.Info.enabled = True
    return d, case, U, p, phi


def test_handcase_mesh_geometry(handcase_run):
    _, case, *_ = handcase_run
    m = case.mesh
    assert m.n_cells == 9
    assert m.n_internal == 12
    # 0.09 x 0.09 x 0.01 box
    assert abs(float(np.asarray(m.V).sum()) - 8.1e-5) < 1e-9
    assert [p.name for p in m.patches] == [
        "left", "right", "bottom", "lid", "back", "front"]
    assert [p.type for p in m.patches[-2:]] == ["empty", "empty"]


def test_handcase_regex_and_macro_bcs(handcase_run):
    """lid picks up $lidSpeed from the #include'd file; the
    "(left|right|bottom)" regex entry must cover all three walls."""
    _, case, U, p, phi = handcase_run
    m = case.mesh
    lid = next(pp for pp in m.patches if pp.name == "lid")
    bv = np.asarray(U.bvalues)[lid.bstart:lid.bstart + lid.size]
    assert np.allclose(bv, [1.5, 0.0, 0.0])
    for name in ("left", "right", "bottom"):
        pp = next(q for q in m.patches if q.name == name)
        bvw = np.asarray(U.bvalues)[pp.bstart:pp.bstart + pp.size]
        assert np.allclose(bvw, 0.0)


def test_handcase_runs_and_writes(handcase_run):
    d, case, U, p, phi = handcase_run
    assert np.isfinite(np.asarray(U.data)).all()
    assert float(np.abs(np.asarray(U.data)).max()) < 1.5
    assert os.path.isdir(os.path.join(d, "0.05"))


def test_cavity20_fp32_matches_fp64_golden(tmp_path):
    """fp32 end-to-end trajectory lands within fp32 accuracy of the
    committed fp64 golden fields — the whole-field version of the
    round-1 'summary statistics only' gap."""
    out = str(tmp_path / "run32.npz")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    subprocess.run(
        [sys.executable, os.path.join(GOLD, "run_cavity_golden.py"),
         out, "--fp32"], check=True, timeout=600, env=env)
    g = np.load(os.path.join(GOLD, "cavity20_fp64.npz"))
    r = np.load(out)
    assert np.abs(g["U"] - r["U"]).max() < 1e-5
    assert np.abs(g["p"] - r["p"]).max() < 5e-5
    assert np.abs(g["phi"] - r["phi"]).max() < 1e-9


@pytest.mark.slow
def test_cavity20_fp64_golden_exact(tmp_path):
    """fp64 rerun reproduces the committed golden at the 1e-8 class
    (bit-exact on the generating XLA version)."""
    out = str(tmp_path / "run64.npz")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    subprocess.run(
        [sys.executable, os.path.join(GOLD, "run_cavity_golden.py"), out],
        check=True, timeout=600, env=env)
    g = np.load(os.path.join(GOLD, "cavity20_fp64.npz"))
    r = np.load(out)
    for k in ("U", "p", "phi"):
        assert np.abs(g[k] - r[k]).max() < 1e-8, k
