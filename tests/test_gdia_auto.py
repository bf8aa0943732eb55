"""Auto-detected gdia lattice mode for masked-grid meshes read from
disk (forward steps / T-junctions): Case routes them onto the
gather-free generalized-DIA path (mesh/gdia.py) with DEAD slots, and
the solution must match the padded-ELL gather path exactly (same
discretization, different execution layout).
"""

import jax
import os
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


def _tighten(d):
    """relTol 0 on the intermediate p correctors: with the case's
    relTol 0.01, two legitimately-different arithmetic orders (gdia
    shift-MAC vs gather assembly) converge to different points inside
    the 1%-residual ball, and those O(1e-3) intermediate differences
    feed the final pEqn's coefficients — the comparison below is only
    meaningful with every corrector fully converged."""
    import re
    fs = os.path.join(d, "system", "fvSolution")
    txt = open(fs).read()
    open(fs, "w").write(txt.replace("relTol          0.01",
                                    "relTol          0"))


def test_sonicfoam_gdia_matches_gather(tmp_path, quiet):
    d1 = str(tmp_path / "gdia")
    d2 = str(tmp_path / "gather")
    forward_step_case(d1, end_time=1.0)
    forward_step_case(d2, end_time=1.0)
    _tighten(d1)
    _tighten(d2)

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
    # Tolerance note: each individual gdia op matches the gather path
    # at roundoff (test_gauss_mac_exact below pins this at 1e-10), but
    # the TVD limiter's r = num/den is 0/0 on perfectly-uniform regions
    # (the impulsive start), where 1e-17-level summation-order
    # differences flip the limiter between its 0 and 2 saturations —
    # an O(1) (legitimate) scheme selection change at a handful of
    # step-corner faces, worth ~1e-3 in p over the transient. The
    # r4-class bugs this test exists for (frozen pressure, wrong fixed
    # point) are O(1) everywhere and still fail loudly.
    np.testing.assert_allclose(pf1, pf2, rtol=2e-3, atol=1e-5)
    np.testing.assert_allclose(uf1, uf2, rtol=2e-3, atol=1e-5)


def test_gauss_mac_exact(tmp_path, quiet):
    """The precomputed shift-MAC fast paths (mesh/gdia.py
    build_gauss_planes; fvc grad/flux/divTensor) must match the generic
    face-values pipeline at roundoff on the auto-detected forwardStep
    lattice — including random (even unsynced) data and random boundary
    values."""
    import dataclasses

    import jax.numpy as jnp

    from rapidcfd_tpu.ops import fvc
    from rapidcfd_tpu.solvers.case import Case

    d = str(tmp_path / "fs")
    forward_step_case(d, end_time=1.0)
    switches._CACHE["GDIA_AUTO"] = "1"
    try:
        case = Case(d)
    finally:
        switches._CACHE.pop("GDIA_AUTO", None)
    mesh = case.mesh
    assert mesh.gauss is not None
    m0 = dataclasses.replace(mesh, gauss=None)
    p = case.read_field("p")
    U = case.read_field("U")
    rng = np.random.default_rng(11)

    def diff(a, b):
        return max(float(jnp.abs(a.data - b.data).max()),
                   float(jnp.abs(a.bvalues - b.bvalues).max()))

    for _ in range(3):
        ps = p.replace(
            data=jnp.asarray(rng.normal(size=p.data.shape)),
            bvalues=jnp.asarray(rng.normal(size=p.bvalues.shape)))
        Us = U.replace(
            data=jnp.asarray(rng.normal(size=U.data.shape)),
            bvalues=jnp.asarray(rng.normal(size=U.bvalues.shape)))
        assert diff(fvc.grad(mesh, ps), fvc.grad(m0, ps)) < 1e-10
        assert diff(fvc.grad(mesh, Us), fvc.grad(m0, Us)) < 1e-10
        T = fvc.grad(mesh, Us)
        assert diff(fvc.div_tensor(mesh, T),
                    fvc.div_tensor(m0, T)) < 1e-9
        fa = fvc.flux(mesh, Us)
        fb = fvc.flux(m0, Us)
        assert float(jnp.abs(fa.data - fb.data).max()) < 1e-10


def test_simplefoam_gamg_gdia_matches_gather(tmp_path, quiet):
    """r4 masked-grid regression: `solver GAMG` on an auto-detected gdia
    mesh must reach the same solution as the padded-ELL gather path.
    The broken form plain-V-cycled a pure-lattice preconditioner whose
    coarse diagonals were polluted by dead-slot identity rows (+1.0
    against ~1e-4 FV coefficients), silently converging to a wrong
    pressure (max|dp| 2.6 on one pitzDaily SIMPLE step). Fixed by
    Krylov-wrapping GAMG on gdia meshes (linalg/gamg.py) and scale-
    cleaning ghost/dead diags in the lattice V-cycle
    (linalg/structured_mg.py)."""
    from rapidcfd_tpu.solvers import simplefoam
    from rapidcfd_tpu.utils.casegen import pitz_daily_case

    d1 = str(tmp_path / "gdia")
    d2 = str(tmp_path / "gather")
    pitz_daily_case(d1, scale=1, model="kEpsilon", tight_tol=True)
    pitz_daily_case(d2, scale=1, model="kEpsilon", tight_tol=True)

    switches._CACHE["GDIA_AUTO"] = "1"
    try:
        case1, U1, p1, _, ts1 = simplefoam.run(d1, write=False,
                                               max_steps=1)
        assert case1.mesh.gdia is not None, "gdia mode not engaged"
        switches._CACHE["GDIA_AUTO"] = "0"
        case2, U2, p2, _, ts2 = simplefoam.run(d2, write=False,
                                               max_steps=1)
        assert case2.mesh.gdia is None
    finally:
        switches._CACHE.pop("GDIA_AUTO", None)

    pf1 = case1.maps.cells_to_file(np.asarray(p1.data, np.float64))
    pf2 = case2.maps.cells_to_file(np.asarray(p2.data, np.float64))
    uf1 = case1.maps.cells_to_file(np.asarray(U1.data, np.float64))
    uf2 = case2.maps.cells_to_file(np.asarray(U2.data, np.float64))
    # one step at 1e-12 linear tolerances: both paths solve the same
    # discrete system, so agreement is at Krylov-roundoff level (the
    # broken form differed by max|dp| = 2.6 here). Further steps
    # amplify tolerance-level noise through the impulsive start, so the
    # pin stays at one step.
    np.testing.assert_allclose(pf1, pf2, rtol=0, atol=1e-8)
    np.testing.assert_allclose(uf1, uf2, rtol=0, atol=1e-8)
    for k in ts1:
        a = case1.maps.cells_to_file(np.asarray(ts1[k].data, np.float64))
        b = case2.maps.cells_to_file(np.asarray(ts2[k].data, np.float64))
        np.testing.assert_allclose(a, b, rtol=1e-8, atol=1e-8,
                                   err_msg=k)


def test_decompose_gdia_mesh_strips_lattice(tmp_path, quiet):
    """decompose() on a gdia-mode mesh must partition the RAW topology
    (processor decomposition is topology-only — reference
    processorPolyPatch.H), not the padded lattice: the r4 regression
    asserted K_force < K inside build_ell because the lattice plane
    count leaked in as the per-partition ELL width."""
    from rapidcfd_tpu.parallel.decompose import (collect_vol_field,
                                                 decompose,
                                                 decompose_vol_field)
    from rapidcfd_tpu.solvers.case import Case
    from rapidcfd_tpu.utils.casegen import pitz_daily_case

    d = str(tmp_path / "pitz")
    pitz_daily_case(d, scale=1, tight_tol=True)
    switches._CACHE["GDIA_AUTO"] = "1"
    try:
        case = Case(d)
    finally:
        switches._CACHE.pop("GDIA_AUTO", None)
    assert case.mesh.gdia is not None
    dec = decompose(case.mesh, 4, method="rcb")
    assert dec.cell_of_slot is not None
    nc_raw = int(np.asarray(case.mesh.gdia.primary).sum())
    assert dec.dev_of.shape == (nc_raw,)
    # round-trip: a slot-layout field scatters and collects losslessly
    p = case.read_field("p")
    rng = np.random.default_rng(7)
    vals = rng.normal(size=nc_raw)
    slot_vals = vals[np.maximum(dec.cell_of_slot, 0)]
    pv = p.replace(data=jax.numpy.asarray(slot_vals))
    ps = decompose_vol_field(dec, pv, case.mesh)
    back = collect_vol_field(dec, ps.data)
    np.testing.assert_allclose(back, vals, rtol=0, atol=0)
