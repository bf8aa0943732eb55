"""Local time stepping (LTS) — per-cell pseudo-time for steady marching.

Capability surface of the reference's LTS machinery (reference:
applications/solvers/compressible/rhoPimpleFoam/rhoLTSPimpleFoam/
setrDeltaT.H and multiphase/interFoam/LTSInterFoam/setrDeltaT.H, with
finiteVolume/ddtSchemes/localEulerDdtScheme): the reciprocal local step

    rDeltaT = max(1/maxDeltaT, surfaceSum(|phi|) / (2*maxCo*V*[rho]))

smoothed with fvc::smooth(rDeltaTSmoothingCoeff) and rate-limited by
rDeltaTDampingCoeff against the previous value. The localEuler ddt
scheme then uses dt_cell = 1/rDeltaT elementwise (ops/fvm.py ddt).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..ops import fvc
from ..utils.logging import info


@dataclass(frozen=True)
class LTSControls:
    max_co: float = 0.8
    smoothing_coeff: float = 0.02
    damping_coeff: float = 1.0
    max_delta_t: float = 1e30

    @staticmethod
    def from_dict(d) -> "LTSControls":
        if d is None:
            return LTSControls()
        return LTSControls(
            max_co=float(d.scalar("maxCo", 0.8)),
            smoothing_coeff=float(d.scalar("rDeltaTSmoothingCoeff", 0.02)),
            damping_coeff=float(d.scalar("rDeltaTDampingCoeff", 1.0)),
            max_delta_t=float(d.scalar("maxDeltaT", 1e30)),
        )


def make_rdelta_t(mesh, c: LTSControls):
    """Jitted rDeltaT update: (phi_data, rho_data|None, rdt_prev|None)
    -> (nCells,) reciprocal time step."""

    @jax.jit
    def rdelta_t(phi_data, rho_data, rdt_prev):
        sum_phi = fvc.surface_sum_faces(mesh, jnp.abs(phi_data),
                                        signed=False)
        den = (2.0 * c.max_co) * mesh.V
        if rho_data is not None:
            den = den * rho_data
        rdt = jnp.maximum(1.0 / c.max_delta_t, sum_phi / den)
        if c.smoothing_coeff < 1.0:
            # reference smoothData: adjacent ratio limited to
            # (1 + coeff), i.e. propagation factor 1/(1+coeff)
            rdt = fvc.smooth(mesh, rdt, 1.0 / (1.0 + c.smoothing_coeff),
                             sweeps=12)
        if rdt_prev is not None and c.damping_coeff < 1.0:
            rdt = rdt_prev * jnp.maximum(rdt / rdt_prev,
                                         1.0 - c.damping_coeff)
        return rdt

    return rdelta_t


def make_rdelta_t_interface(mesh, c: LTSControls,
                            max_alpha_co: float = 0.2):
    """LTSInterFoam's variant (reference: LTSInterFoam/setrDeltaT.H):
    cells inside the interface band (0.01 < alpha < 0.99) are limited by
    maxAlphaCo instead of maxCo."""

    @jax.jit
    def rdelta_t(phi_data, alpha_data, rdt_prev):
        sum_phi = fvc.surface_sum_faces(mesh, jnp.abs(phi_data),
                                        signed=False)
        rdt = jnp.maximum(1.0 / c.max_delta_t,
                          sum_phi / ((2.0 * c.max_co) * mesh.V))
        in_band = (alpha_data > 0.01) & (alpha_data < 0.99)
        rdt_a = sum_phi / ((2.0 * max_alpha_co) * mesh.V)
        rdt = jnp.where(in_band, jnp.maximum(rdt, rdt_a), rdt)
        if c.smoothing_coeff < 1.0:
            rdt = fvc.smooth(mesh, rdt, 1.0 / (1.0 + c.smoothing_coeff),
                             sweeps=12)
        if rdt_prev is not None and c.damping_coeff < 1.0:
            rdt = rdt_prev * jnp.maximum(rdt / rdt_prev,
                                         1.0 - c.damping_coeff)
        return rdt

    return rdelta_t


def log_time_scale(rdt):
    import numpy as np
    r = np.asarray(rdt)
    info(f"Flow time scale min/max = {1.0 / r.max():.6g}, "
         f"{1.0 / max(r.min(), 1e-300):.6g}")
