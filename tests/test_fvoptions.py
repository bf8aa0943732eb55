"""fvOptions: porosity sink + semiImplicitSource + MRF."""

import os

import numpy as np
import pytest

from rapidcfd_tpu.utils import logging as L
from rapidcfd_tpu.utils.casegen import _write, cavity_case
from rapidcfd_tpu.utils.dictionary import foamfile_header


def test_porosity_slows_flow(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("poro"))
    cavity_case(d, end_time=0.05)
    _write(os.path.join(d, "constant", "RASProperties"),
           foamfile_header("dictionary", "RASProperties", "constant"),
           "\nRASModel        laminar;\nturbulence      off;\n")
    _write(os.path.join(d, "system", "fvOptions"),
           foamfile_header("dictionary", "fvOptions", "system"), """
porosity1
{
    type            explicitPorositySource;
    selectionMode   box;
    box             ((0 0 0) (0.1 0.05 0.01));
    d               (1e7 1e7 1e7);
    f               (0 0 0);
}
""")
    L.Info.enabled = False
    from rapidcfd_tpu.solvers import pimplefoam
    _, U, _, _, _ = pimplefoam.run(d, max_steps=10, write=False,
                                   piso_mode=True)
    d2 = str(tmp_path_factory.mktemp("noporo"))
    cavity_case(d2, end_time=0.05)
    _write(os.path.join(d2, "constant", "RASProperties"),
           foamfile_header("dictionary", "RASProperties", "constant"),
           "\nRASModel        laminar;\nturbulence      off;\n")
    _, U0, _, _, _ = pimplefoam.run(d2, max_steps=10, write=False,
                                    piso_mode=True)
    L.Info.enabled = True
    import jax.numpy as jnp
    from rapidcfd_tpu.solvers.case import Case
    case = Case(d)
    C = np.asarray(case.mesh.C)
    lower = C[:, 1] < 0.05
    u_poro = np.abs(np.asarray(U.data))[lower].max()
    u_free = np.abs(np.asarray(U0.data))[lower].max()
    # the porous lower half is nearly stagnant vs the free case
    assert u_poro < 0.05 * u_free


def test_semi_implicit_source_heats(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("sis"))
    cavity_case(d, end_time=0.02)
    from rapidcfd_tpu.models.fvoptions import FvOptions
    _write(os.path.join(d, "system", "fvOptions"),
           foamfile_header("dictionary", "fvOptions", "system"), """
heat1
{
    type            scalarSemiImplicitSource;
    selectionMode   all;
    volumeMode      specific;
    injectionRateSuSp { T (10 0); }
}
""")
    L.Info.enabled = False
    from rapidcfd_tpu.solvers.case import Case
    from rapidcfd_tpu.ops import fvm
    from rapidcfd_tpu.linalg import solve
    import jax.numpy as jnp
    case = Case(d)
    opts = FvOptions(case)
    L.Info.enabled = True
    assert len(opts.options) == 1
    # build a trivial steady diffusion equation for T and add the source
    from rapidcfd_tpu.fields.field import VolField
    from rapidcfd_tpu.fields.bcs import make_bc
    from rapidcfd_tpu.utils.dimensions import dim_temperature
    mesh = case.mesh
    bcs, bcd = [], []
    for i, p in enumerate(mesh.patches):
        if p.is_empty:
            bcs.append(make_bc("empty", i))
            bcd.append({})
        else:
            bcs.append(make_bc("fixedValue", i))
            bcd.append({"value": jnp.zeros(p.size)})
    T = VolField(jnp.zeros(mesh.n_cells), jnp.zeros(mesh.n_boundary),
                 tuple(bcs), dim_temperature, "T", tuple(bcd))
    eqn = -fvm.laplacian(mesh, 1.0, T)
    eqn2 = opts(mesh, "T", eqn, {})
    # source must have been added over the whole domain
    assert float(eqn2.source.sum()) > float(eqn.source.sum())
    from rapidcfd_tpu.linalg.solvers import SolverControls
    Tn, perf = solve(mesh, eqn2, SolverControls(solver="PCG",
                                                preconditioner="DIC",
                                                tolerance=1e-10))
    # positive uniform heating with cold walls -> positive interior T
    assert float(Tn.data.min()) >= 0.0
    assert float(Tn.data.max()) > 0.0
