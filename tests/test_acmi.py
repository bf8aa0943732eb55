"""cyclicACMI: partially-overlapping AMI with non-overlap blockage
(VERDICT r4 item 6; reference: cyclicACMIPolyPatch + cyclicACMIFvPatchField).

Validation strategy:
- mask values equal the geometric per-face overlap fractions
- conforming limit (shift 0): steady conduction across the interface is
  linear in x (the plain-AMI behavior, mask ~ 1)
- isolated limit (shift 1): each block equilibrates with its own
  Dirichlet boundary (mask ~ tol: the interface is a wall)
- partial overlap: interface heat flux balances side-to-side and the
  solution stays between the Dirichlet bounds
"""

import numpy as np
import pytest

from rapidcfd_tpu.solvers.case import Case
from rapidcfd_tpu.utils import logging as L
from rapidcfd_tpu.utils.casegen import acmi_channel_case


@pytest.fixture
def quiet():
    L.Info.enabled = False
    yield
    L.Info.enabled = True


def _patch_table(case, name):
    i = [k for k, p in enumerate(case.mesh.patches) if p.name == name][0]
    return case.mesh.patches[i], case.mesh.ami[i]


def _run(d, steps=None):
    from rapidcfd_tpu.solvers import basic
    out = basic.run_laplacian_foam(d, write=False, max_steps=steps)
    return out[0], out[1]


def test_acmi_mask_matches_geometry(tmp_path, quiet):
    """shift 0.5 on an 8-cell interface: the top 4 left faces are fully
    covered by the shifted right block, the bottom 4 uncovered."""
    d = str(tmp_path)
    acmi_channel_case(d, ny=8, shift_frac=0.5, end_time=0.01)
    case = Case(d)
    p, t = _patch_table(case, "ACMI1_couple")
    assert t is not None and t.mask is not None
    mask = np.asarray(t.mask)
    yc = np.asarray(case.mesh.Cf)[p.start:p.start + p.size, 1]
    order = np.argsort(yc)
    np.testing.assert_allclose(mask[order[:4]], 1e-6, atol=1e-8)
    np.testing.assert_allclose(mask[order[4:]], 1.0 - 1e-6, atol=1e-6)
    # area apportioning: couple + blockage areas sum to the full face
    pb, _ = _patch_table(case, "ACMI1_blockage")
    ms = np.asarray(case.mesh.mag_sf)
    full = 0.2 / 8 * 0.05
    np.testing.assert_allclose(
        ms[p.start:p.start + p.size] + ms[pb.start:pb.start + pb.size],
        full, rtol=1e-12)


def test_acmi_conforming_limit_linear_profile(tmp_path, quiet):
    """shift 0: conforming couple (mask ~ 1) — steady conduction is
    linear in x through the interface."""
    d = str(tmp_path)
    acmi_channel_case(d, ny=4, nx=8, shift_frac=0.0, end_time=40.0,
                      delta_t=0.2)
    case, T = _run(d)
    C = np.asarray(case.mesh.C)
    t = np.asarray(T.data)
    expect = 400.0 + (300.0 - 400.0) * C[:, 0]
    assert np.abs(t - expect).max() < 0.5


def test_acmi_isolated_limit(tmp_path, quiet):
    """shift 1: zero overlap (mask ~ tol) — each block equilibrates to
    its own Dirichlet value."""
    d = str(tmp_path)
    acmi_channel_case(d, ny=4, nx=4, shift_frac=1.0, end_time=30.0,
                      delta_t=0.2)
    case, T = _run(d)
    C = np.asarray(case.mesh.C)
    t = np.asarray(T.data)
    left = C[:, 0] < 0.5
    assert np.abs(t[left] - 400.0).max() < 0.2
    assert np.abs(t[~left] - 300.0).max() < 0.2


def test_acmi_partial_flux_balance(tmp_path, quiet):
    """shift 0.5: at steady state the conductive heat flux entering at
    the left boundary equals the flux leaving at the right (global
    conservation through the partially-blocked interface), and T stays
    within the Dirichlet bounds."""
    import jax.numpy as jnp

    from rapidcfd_tpu.ops import fvc

    d = str(tmp_path)
    acmi_channel_case(d, ny=8, nx=6, shift_frac=0.5, end_time=30.0,
                      delta_t=0.2)
    case, T = _run(d)
    t = np.asarray(T.data)
    assert t.min() > 299.9 and t.max() < 400.1
    mesh = case.mesh
    ms = np.asarray(mesh.mag_sf)

    def patch_flux(name):
        i = [k for k, p in enumerate(mesh.patches) if p.name == name][0]
        p = mesh.patches[i]
        bc = T.bcs[i]
        sn = np.asarray(bc.snGrad(mesh, p, T, T.bcdata[i]))
        return (sn * ms[p.start:p.start + p.size]).sum()

    qin = patch_flux("left")     # snGrad>0: heat entering
    qout = patch_flux("right")
    assert abs(qin + qout) < 2e-3 * max(abs(qin), 1e-30)
    # interface: coupled-side fluxes balance (conservative exchange)
    q1 = patch_flux("ACMI1_couple")
    q2 = patch_flux("ACMI2_couple")
    assert abs(q1 + q2) < 0.05 * max(abs(q1), 1e-30)
