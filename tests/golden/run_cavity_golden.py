"""Deterministic fp64 cavity run for the golden-field test.

Run as a SUBPROCESS with JAX_ENABLE_X64 honored before jax import:
    python tests/golden/run_cavity_golden.py <out.npz> [--fp32]
Case: casegen cavity 20x20 (BASELINE config 1), 40 Euler/PISO steps of
dt=0.005 (t=0.2). Writes U, p, phi arrays to <out.npz>.
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main():
    out = sys.argv[1]
    fp32 = "--fp32" in sys.argv[2:]
    import jax

    # explicit: the test conftest exports JAX_ENABLE_X64=1, so force the
    # requested precision rather than inheriting the env
    jax.config.update("jax_enable_x64", not fp32)
    import numpy as np

    from rapidcfd_tpu.utils import logging as L
    L.Info.enabled = False
    from rapidcfd_tpu.fields.field import Dimensioned
    from rapidcfd_tpu.ops import fvc
    from rapidcfd_tpu.solvers import icofoam
    from rapidcfd_tpu.solvers.case import Case
    from rapidcfd_tpu.utils.casegen import cavity_case

    d = tempfile.mkdtemp(prefix="golden_cavity_")
    cavity_case(d, n=20, delta_t=0.005, end_time=1e9)
    case = Case(d)
    nu = Dimensioned.from_entry(
        case.transport_properties().lookup("nu", required=True), "nu")
    step = icofoam.make_step(case, nu, 2, 0, 0, 0.0)
    U = case.read_field("U")
    p = case.read_field("p")
    phi = jax.jit(lambda u: fvc.flux(case.mesh, u))(U)
    for _ in range(40):
        U, p, phi, _ = step(U, p, phi, 0.005)
    np.savez(out, U=np.asarray(U.data, np.float64),
             p=np.asarray(p.data, np.float64),
             phi=np.asarray(phi.data, np.float64))


if __name__ == "__main__":
    main()
