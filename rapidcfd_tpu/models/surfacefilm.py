"""Kinematic single-layer surface film (reference:
src/regionModels/surfaceFilmModels/kinematicSingleLayer/
kinematicSingleLayer.C — depth-averaged film continuity + momentum on
a wall-patch shell).

TPU re-founding: the reference extrudes a one-cell film region mesh and
runs fvm on it. Here the film lives directly on the PATCH FACES — a
2-D finite-volume mesh whose "cells" are the wall faces and whose
"faces" are the shared edges, built host-side once (FilmMesh). The
transport is explicit depth-averaged upwind (films are thin and slow;
the reference sub-cycles too), fully vectorized over faces/edges:

  d(delta)/dt + div_s(delta U_f) = S_mass / rho
  d(delta U_f)/dt + div_s(delta U_f U_f) =
        delta g_t - (3 nu / delta) U_f   (laminar wall friction
                                          tau_w = 3 mu U_f / delta)

g_t = tangential gravity; the film velocity stays in the wall plane.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dfield

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class FilmMesh:
    """2-D FV mesh over one wall patch: cells = patch faces, faces =
    shared edges. Static topology (host-built)."""
    edge_own: jax.Array      # (nE,) film-cell index
    edge_nei: jax.Array      # (nE,)
    edge_len: jax.Array      # (nE,) edge length [m]
    edge_norm: jax.Array     # (nE, 3) in-plane unit normal own->nei
    area: jax.Array          # (nC,) face area
    normal: jax.Array        # (nC, 3) wall unit normal
    centre: jax.Array        # (nC, 3)

    @property
    def n_cells(self):
        return self.area.shape[0]


def build_film_mesh(pmesh, mesh, patch) -> FilmMesh:
    """Host-side film mesh over `patch` (a Patch of MeshArrays) from the
    raw PolyMesh topology (point-sharing edges between patch faces)."""
    import collections
    f0 = None
    # map device patch faces back to file faces via the patch range of
    # the ORIGINAL mesh: patch.start..start+size in device face order
    # equals the polyMesh patch block (boundary faces are not permuted
    # across patches)
    # locate the polyMesh boundary patch by name
    bp = next(p for p in pmesh.patches if p.name == patch.name)
    edges = collections.defaultdict(list)
    for j in range(bp.n_faces):
        pts = pmesh.face(bp.start_face + j)
        n = len(pts)
        for k in range(n):
            a, b = int(pts[k]), int(pts[(k + 1) % n])
            edges[(min(a, b), max(a, b))].append(j)
    own, nei, e_ab = [], [], []
    for (a, b), fs in edges.items():
        if len(fs) == 2:
            own.append(fs[0])
            nei.append(fs[1])
            e_ab.append((a, b))
    own = np.asarray(own, np.int32)
    nei = np.asarray(nei, np.int32)
    pts = pmesh.points
    a = pts[[ab[0] for ab in e_ab]]
    b = pts[[ab[1] for ab in e_ab]]
    elen = np.linalg.norm(b - a, axis=1)
    # geometry from the device arrays (same order as the patch block)
    Cf = np.asarray(mesh.patch_cf(patch))
    Sf = np.asarray(mesh.patch_sf(patch))
    area = np.linalg.norm(Sf, axis=1)
    nrm = Sf / np.maximum(area, 1e-30)[:, None]
    # in-plane edge normal: from own centre toward nei centre,
    # projected tangent and normalized (orthogonal-ish patch meshes)
    d = Cf[nei] - Cf[own]
    nf = 0.5 * (nrm[own] + nrm[nei])
    d_t = d - (d * nf).sum(1, keepdims=True) * nf
    en = d_t / np.maximum(np.linalg.norm(d_t, axis=1), 1e-30)[:, None]
    return FilmMesh(
        edge_own=jnp.asarray(own), edge_nei=jnp.asarray(nei),
        edge_len=jnp.asarray(elen), edge_norm=jnp.asarray(en),
        area=jnp.asarray(area), normal=jnp.asarray(nrm),
        centre=jnp.asarray(Cf))


@dataclass(frozen=True)
class FilmConfig:
    rho: float = 1000.0
    nu: float = 1e-6
    delta_small: float = 1e-9


def init_state(fm: FilmMesh, dtype=None):
    dtype = dtype or fm.area.dtype
    return {"delta": jnp.zeros(fm.n_cells, dtype),
            "Uf": jnp.zeros((fm.n_cells, 3), dtype)}


def advance(cfg: FilmConfig, fm: FilmMesh, state, g, dt, s_mass=None):
    """One explicit film step. s_mass: (nC,) mass source [kg/m2/s]
    (impingement). Returns the new state dict."""
    delta, Uf = state["delta"], state["Uf"]
    g = jnp.asarray(g, delta.dtype)
    # tangential gravity per cell
    g_t = g - fm.normal * (fm.normal * g).sum(1, keepdims=True)

    # edge fluxes (upwind): un_e = Uf_face-avg . edge_norm
    uo = Uf[fm.edge_own]
    un_ = Uf[fm.edge_nei]
    u_e = 0.5 * (uo + un_)
    un = (u_e * fm.edge_norm).sum(1)
    up = un >= 0.0
    d_up = jnp.where(up, delta[fm.edge_own], delta[fm.edge_nei])
    u_up = jnp.where(up[:, None], uo, un_)
    q = d_up * un * fm.edge_len                    # [m3/s] volume flux

    div_q = jnp.zeros_like(delta).at[fm.edge_own].add(q) \
                                 .at[fm.edge_nei].add(-q)
    mom = d_up[:, None] * u_up * (un * fm.edge_len)[:, None]
    div_m = jnp.zeros_like(Uf).at[fm.edge_own].add(mom) \
                              .at[fm.edge_nei].add(-mom)

    src = jnp.zeros_like(delta) if s_mass is None \
        else s_mass / cfg.rho
    delta_new = delta + dt * (-div_q / fm.area + src)
    delta_new = jnp.maximum(delta_new, 0.0)

    # momentum: explicit transport + gravity, implicit wall friction
    # (3 nu / delta^2 relaxation keeps thin films stable)
    d_eff = jnp.maximum(delta_new, cfg.delta_small)
    mom_flux = (delta[:, None] * Uf - dt * div_m / fm.area[:, None]
                + dt * delta_new[:, None] * g_t)
    fric = 3.0 * cfg.nu / (d_eff * d_eff)
    Uf_new = mom_flux / d_eff[:, None] / (1.0 + dt * fric)[:, None]
    # keep in plane, kill velocity on dry cells
    Uf_new = Uf_new - fm.normal * (fm.normal * Uf_new).sum(
        1, keepdims=True)
    Uf_new = jnp.where((delta_new > cfg.delta_small)[:, None],
                       Uf_new, 0.0)
    return {"delta": delta_new, "Uf": Uf_new}


def film_mass(cfg: FilmConfig, fm: FilmMesh, state):
    """Total film mass [kg] (conservation diagnostics)."""
    return cfg.rho * (state["delta"] * fm.area).sum()
