"""fvDOM discrete-ordinates radiation (VERDICT r1 item 8).

Reference: radiationModel/fvDOM/fvDOM.C + radiativeIntensityRay.C; here
all rays are batched on a leading axis through one while_loop (compile
cost independent of ray count).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from rapidcfd_tpu.models.radiation import (SIGMA_SB, FvDOMRadiation,
                                           make_radiation_model)
from rapidcfd_tpu.solvers.case import Case
from rapidcfd_tpu.utils import logging as L
from rapidcfd_tpu.utils.casegen import cavity_case
from rapidcfd_tpu.utils.dictionary import parse_dictionary


def _props(a=5.0, e=1.0):
    return parse_dictionary(f"""
radiation on;
radiationModel fvDOM;
fvDOMCoeffs {{ nPhi 2; nTheta 2; tolerance 1e-6; maxIter 6; }}
constantAbsorptionEmissionCoeffs
{{ absorptivity {a}; emissivity {e}; E 0; }}
""")


@pytest.fixture(scope="module")
def box(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("dom"))
    L.Info.enabled = False
    try:
        cavity_case(d, n=12)
        case = Case(d)
    finally:
        L.Info.enabled = True
    return case


def _fields(case, t_cells, t_walls):
    p = case.read_field("p")
    T = p.with_calculated_bcs(
        jnp.asarray(t_cells), jnp.asarray(t_walls), p.dims, "T")
    G = p.with_calculated_bcs(
        jnp.zeros(case.mesh.n_cells), jnp.zeros_like(p.bvalues), p.dims,
        "G")
    return T, G


def test_quadrature_integrates_to_4pi(box):
    rad = FvDOMRadiation(box, _props())
    assert abs(rad.omega.sum() - 4 * np.pi) < 1e-12
    # sum of dAve vectors over the full sphere is zero
    assert np.abs(rad.d_ave.sum(0)).max() < 1e-12


def test_isothermal_enclosure_exact(box):
    """Black isothermal enclosure: I = sigma T^4/pi in every direction,
    so G = 4 sigma T^4 exactly — quadrature and transport both exact."""
    mesh = box.mesh
    rad = FvDOMRadiation(box, _props())
    T0 = 500.0
    T, G = _fields(box, np.full(mesh.n_cells, T0),
                   np.full(mesh.n_boundary, T0))
    G2, perf = rad.correct(mesh, G, T)
    exact = 4.0 * SIGMA_SB * T0 ** 4
    assert np.allclose(np.asarray(G2.data) / exact, 1.0, atol=1e-6)


def test_hot_wall_decay(box):
    """Cold absorbing medium, one hot wall: G decays monotonically with
    optical depth away from the wall."""
    mesh = box.mesh
    rad = FvDOMRadiation(box, _props(a=20.0))
    tw = np.full(mesh.n_boundary, 1e-3)
    # heat the movingWall (y = ymax) patch
    for p in mesh.patches:
        if p.name == "movingWall":
            tw[p.bstart:p.bstart + p.size] = 1000.0
    T, G = _fields(box, np.full(mesh.n_cells, 1e-3), tw)
    G2, _ = rad.correct(mesh, G, T)
    g = np.asarray(G2.data).reshape(12, 12)   # [y, x] row-major? use means
    prof = np.asarray(G2.data).reshape(-1)
    C = np.asarray(mesh.C)
    ys = np.unique(np.round(C[:, 1], 9))
    means = [prof[np.isclose(C[:, 1], y)].mean() for y in ys]
    assert means[-1] > 10 * means[0]          # hot near the wall
    assert all(b > a for a, b in zip(means, means[1:]))  # monotone


def test_factory_selects_fvdom(box, tmp_path):
    import os
    path = os.path.join(box.dir, "constant", "radiationProperties")
    with open(path, "w") as f:
        f.write("""
radiation on;
radiationModel fvDOM;
fvDOMCoeffs { nPhi 1; nTheta 1; }
constantAbsorptionEmissionCoeffs
{ absorptivity 0.5; emissivity 0.5; E 0; }
""")
    try:
        L.Info.enabled = False
        rad = make_radiation_model(box)
    finally:
        L.Info.enabled = True
        os.remove(path)
    assert isinstance(rad, FvDOMRadiation)
    assert rad.n_ray == (4 * 1) * (2 * 1)     # 4nPhi * 2nTheta
