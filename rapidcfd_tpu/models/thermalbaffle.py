"""Thermal baffle region model — transient 1-D conduction through a
thin solid shell extruded from a wall-patch pair (reference:
src/regionModels/thermalBaffleModels/thermalBaffle/thermalBaffle.C in
its oneD mode, and the quasi-steady
thermalBaffle1DFvPatchScalarField BC).

TPU re-founding: the reference extrudes a real 1-cell-wide region mesh
and runs a solid solver on it. Here the shell is a BATCHED 1-D grid —
state T of shape (n_faces, n_layers) advanced by implicit Euler with a
vectorized Thomas (tridiagonal) solve over the layer axis. No extruded
mesh, no registry: one dense (n_faces, n_layers) array per baffle, all
faces solved in parallel — exactly the layout the VPU wants.

Coupling contract (Robin both sides): the fluid hands in its
near-wall temperature and the film conductance h = kappa_eff *
deltaCoeffs per face; the baffle returns its surface temperatures,
which the fluid applies as fixedValue wall temperatures next step
(the same explicit Robin exchange chtmultiregionfoam uses between
regions).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class BaffleConfig:
    thickness: float          # [m] total shell thickness
    kappa: float              # [W/m/K] solid conductivity
    rho: float = 8000.0       # [kg/m3]
    cp: float = 450.0         # [J/kg/K]
    n_layers: int = 10
    qs: float = 0.0           # [W/m2] internal/source heat flux


def init_state(cfg: BaffleConfig, n_faces: int, t0: float = 300.0,
               dtype=jnp.float64):
    return jnp.full((n_faces, cfg.n_layers), t0, dtype)


def _thomas(a, b, c, d):
    """Batched tridiagonal solve (rows = faces, cols = layers):
    a: sub-diagonal (n, m) with a[:,0] unused; b: diagonal; c: super
    (c[:,-1] unused); d: rhs. lax.scan over the (small) layer axis."""
    m = b.shape[1]

    def fwd(carry, i):
        cp_prev, dp_prev = carry
        denom = b[:, i] - a[:, i] * cp_prev
        cp = c[:, i] / denom
        dp = (d[:, i] - a[:, i] * dp_prev) / denom
        return (cp, dp), (cp, dp)

    zeros = jnp.zeros_like(b[:, 0])
    (_, _), (cps, dps) = jax.lax.scan(fwd, (zeros, zeros),
                                      jnp.arange(m))
    cps = jnp.moveaxis(cps, 0, 1)   # (n, m)
    dps = jnp.moveaxis(dps, 0, 1)

    def bwd(x_next, i):
        x = dps[:, i] - cps[:, i] * x_next
        return x, x

    _, xs = jax.lax.scan(bwd, zeros, jnp.arange(m - 1, -1, -1))
    return jnp.flip(jnp.moveaxis(xs, 0, 1), axis=1)


def advance(cfg: BaffleConfig, T, T_a, h_a, T_b, h_b, dt):
    """One implicit-Euler step of d(rho cp T)/dt = d/dx(kappa dT/dx) + q
    through the shell, with Robin conditions on both surfaces:
    -kappa dT/dx|_a = h_a (T_a - T_s,a) (side a = layer 0, side b =
    last layer). Returns (T_new, T_surface_a, T_surface_b)."""
    n, m = T.shape
    dx = cfg.thickness / m
    fo = cfg.kappa / dx / dx * dt / (cfg.rho * cfg.cp)   # layer Fourier
    # Robin at the surfaces folded into the half-cell resistance:
    # conductance from fluid to first layer centre = 1/(1/h + dx/2k)
    ga = 1.0 / (1.0 / jnp.maximum(h_a, 1e-30) + dx / (2.0 * cfg.kappa))
    gb = 1.0 / (1.0 / jnp.maximum(h_b, 1e-30) + dx / (2.0 * cfg.kappa))
    ga_fo = ga * dt / (cfg.rho * cfg.cp * dx)
    gb_fo = gb * dt / (cfg.rho * cfg.cp * dx)

    a = jnp.full((n, m), -fo, T.dtype)
    c = jnp.full((n, m), -fo, T.dtype)
    b = jnp.full((n, m), 1.0 + 2.0 * fo, T.dtype)
    d = T + cfg.qs * dt / (cfg.rho * cfg.cp * dx) / m

    b = b.at[:, 0].set(1.0 + fo + ga_fo)
    b = b.at[:, -1].set(1.0 + fo + gb_fo)
    d = d.at[:, 0].add(ga_fo * T_a)
    d = d.at[:, -1].add(gb_fo * T_b)
    a = a.at[:, 0].set(0.0)
    c = c.at[:, -1].set(0.0)

    T_new = _thomas(a, b, c, d)
    # surface temperatures from the flux balance h (T_f - T_s) =
    # 2k/dx (T_s - T_1)
    k2 = 2.0 * cfg.kappa / dx
    T_sa = (h_a * T_a + k2 * T_new[:, 0]) / (h_a + k2)
    T_sb = (h_b * T_b + k2 * T_new[:, -1]) / (h_b + k2)
    return T_new, T_sa, T_sb


def steady_resistance_temps(cfg: BaffleConfig, T_a, h_a, T_b, h_b):
    """Closed-form steady surface temperatures through the series
    resistance 1/h_a + L/k + 1/h_b (the thermalBaffle1D quasi-steady
    limit) — the regression target for advance()'s long-time state."""
    R = 1.0 / h_a + cfg.thickness / cfg.kappa + 1.0 / h_b
    q = (T_a - T_b) / R
    return T_a - q / h_a, T_b + q / h_b
