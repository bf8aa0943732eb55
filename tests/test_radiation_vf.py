"""viewFactor + opaqueSolid radiation models (VERDICT r4 missing #4).

viewFactor validation: enclosure view-factor matrix closes (rows sum to
1), near-reciprocity of the centroid kernel, hot-face emission /
cold-face absorption signs, and approximate global energy conservation
(sum q_i A_i ~ 0) on a cubic enclosure with one hot wall.
"""

import numpy as np
import pytest

from rapidcfd_tpu.utils import logging as L


@pytest.fixture
def quiet():
    L.Info.enabled = False
    yield
    L.Info.enabled = True


def _box_case(d, th=400.0, tc=300.0):
    import os

    from rapidcfd_tpu.utils.casegen import (_write, box_mesh, write_field,
                                            write_polymesh)
    from rapidcfd_tpu.utils.dictionary import foamfile_header
    m = box_mesh(6, 6, 6, size=(1.0, 1.0, 1.0), patch_spec={
        "xmin": ("hot", "wall"), "xmax": ("cold", "wall"),
        "ymin": ("cold", "wall"), "ymax": ("cold", "wall"),
        "zmin": ("cold", "wall"), "zmax": ("cold", "wall")})
    write_polymesh(m, d)
    _write(os.path.join(d, "system", "controlDict"),
           foamfile_header("dictionary", "controlDict", "system"),
           "application laplacianFoam; startFrom startTime; startTime 0;"
           "\nstopAt endTime; endTime 1; deltaT 1;\n"
           "writeControl timeStep; writeInterval 100;\n")
    _write(os.path.join(d, "system", "fvSchemes"),
           foamfile_header("dictionary", "fvSchemes", "system"),
           "ddtSchemes { default Euler; }\n"
           "gradSchemes { default Gauss linear; }\n"
           "divSchemes { default none; }\n"
           "laplacianSchemes { default Gauss linear orthogonal; }\n"
           "interpolationSchemes { default linear; }\n"
           "snGradSchemes { default orthogonal; }\n")
    _write(os.path.join(d, "system", "fvSolution"),
           foamfile_header("dictionary", "fvSolution", "system"),
           "solvers { T { solver PCG; preconditioner DIC;"
           " tolerance 1e-9; relTol 0; } }\n")
    _write(os.path.join(d, "constant", "radiationProperties"),
           foamfile_header("dictionary", "radiationProperties",
                           "constant"),
           "radiation on;\nradiationModel viewFactor;\n"
           "viewFactorCoeffs { emissivity 1.0; }\n")
    write_field(d, "0", "T", "volScalarField", "[0 0 0 1 0 0 0]",
                f"uniform {tc}",
                {"hot": "        type            fixedValue;\n"
                        f"        value           uniform {th};\n",
                 "cold": "        type            fixedValue;\n"
                         f"        value           uniform {tc};\n"})


def test_viewfactor_enclosure(tmp_path, quiet):
    from rapidcfd_tpu.models.radiation import (SIGMA_SB,
                                               make_radiation_model)
    from rapidcfd_tpu.solvers.case import Case
    d = str(tmp_path)
    _box_case(d)
    case = Case(d)
    rad = make_radiation_model(case)
    F = np.asarray(rad.F)
    A = np.asarray(rad.A)
    # enclosure closure
    np.testing.assert_allclose(F.sum(1), 1.0, rtol=1e-12)
    # near-reciprocity of the centroid kernel (A_i F_ij ~ A_j F_ji)
    R = A[:, None] * F
    assert np.abs(R - R.T).max() / R.max() < 0.25
    T = case.read_field("T")
    q = np.asarray(rad.qr_faces(T))
    # owner-face grouping: first patch in bsl order is 'hot'
    (bh, sh_), = [rad.bsl[k] for k, i in enumerate(rad.patch_ids)
                  if case.mesh.patches[i].name == "hot"]
    hot = np.zeros(q.size, dtype=bool)
    pos = 0
    for k, i in enumerate(rad.patch_ids):
        n = rad.bsl[k][1]
        if case.mesh.patches[i].name == "hot":
            hot[pos:pos + n] = True
        pos += n
    # the hot wall EMITS (net absorbed < 0), cold walls ABSORB
    assert q[hot].max() < 0.0
    assert q[~hot].min() > 0.0
    # scale: a fully-hot-view cold face would absorb sigma*(Th^4-Tc^4);
    # every face sees a mix, so fluxes are bounded by it
    qmax = SIGMA_SB * (400.0 ** 4 - 300.0 ** 4)
    assert q.max() < qmax and q.min() >= -qmax * (1 + 1e-9)
    # approximate global conservation (centroid-kernel quadrature)
    net = float((q * A).sum())
    scale = float(np.abs(q * A).sum())
    assert abs(net) < 0.05 * scale
    # sh() deposits the same power into wall-adjacent cells
    import jax.numpy as jnp
    sp, expl = rad.sh(case.mesh, None, T, None, None)
    total_w = float((np.asarray(expl) * np.asarray(case.mesh.V)).sum())
    np.testing.assert_allclose(total_w, net, rtol=1e-6,
                               atol=1e-9 * scale)


def test_opaque_solid_is_inert(tmp_path, quiet):
    import os

    from rapidcfd_tpu.models.radiation import make_radiation_model
    from rapidcfd_tpu.solvers.case import Case
    from rapidcfd_tpu.utils.casegen import _write
    from rapidcfd_tpu.utils.dictionary import foamfile_header
    d = str(tmp_path)
    _box_case(d)
    _write(os.path.join(d, "constant", "radiationProperties"),
           foamfile_header("dictionary", "radiationProperties",
                           "constant"),
           "radiation on;\nradiationModel opaqueSolid;\n")
    case = Case(d)
    rad = make_radiation_model(case)
    T = case.read_field("T")
    sp, expl = rad.sh(case.mesh, None, T, None, None)
    assert float(np.abs(np.asarray(sp)).max()) == 0.0
    assert float(np.abs(np.asarray(expl)).max()) == 0.0
    assert rad.qr(case.mesh, None) is None
