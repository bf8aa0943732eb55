"""lagrangian/basic — particle cloud with face-crossing tracking.

Capability surface of the reference's lagrangian/basic library
(reference: src/lagrangian/basic/Cloud/Cloud.H:57, particle/particle.H:59
trackToFace face-crossing walk, passiveParticle) plus the standard
sphere-drag physics of the intermediate kinematic parcel family
(Schiller-Naumann correction), re-designed data-parallel:

TPU-first shape: a cloud is a FIXED-CAPACITY struct-of-arrays pytree
(positions, velocities, cells, diameters, active mask). One jitted
`move(dt)` advances ALL particles together: the reference's per-particle
recursive trackToFace becomes a bounded lax.fori_loop over face
crossings in which every particle intersects its current cell's K
padded faces at once (gathers over the same cell_faces/cell_sign/
cell_nbr ELL tables the FV assembly uses). Patch interaction (rebound/
stick/escape) is a per-face code applied branch-free. Inactive slots
track to nowhere (cell 0, masked), so capacity never changes shape —
injection writes into dead slots between jitted steps.

The host only seeds/injects particles and writes the OpenFOAM cloud
directory format (lagrangian/<cloud>/{positions,U,d}).
"""

from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.field import VolField
from ..mesh.mesharrays import MeshArrays
from ..utils.dictionary import Dictionary
from ..utils.logging import info

# patch interaction codes (per boundary face)
_INTERNAL = 0
_REBOUND = 1
_STICK = 2
_ESCAPE = 3


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CloudState:
    """Struct-of-arrays particle state (fixed capacity)."""
    x: jax.Array          # (N, 3) positions
    v: jax.Array          # (N, 3) velocities
    d: jax.Array          # (N,)   diameters
    cell: jax.Array       # (N,)   i32 owning cell
    active: jax.Array     # (N,)   bool — slot holds a live particle
    stuck: jax.Array      # (N,)   bool — hit a 'stick' patch

    @property
    def n_active(self):
        return jnp.sum(self.active)


def _face_interaction_codes(mesh: MeshArrays, patch_types: dict,
                            default: str) -> np.ndarray:
    """(nFaces,) interaction code; internal faces get _INTERNAL."""
    codes = {"rebound": _REBOUND, "stick": _STICK, "escape": _ESCAPE}
    arr = np.zeros(mesh.n_faces, dtype=np.int32)
    for p in mesh.patches:
        if p.size == 0:
            continue
        word = patch_types.get(p.name, default)
        if word not in codes:
            raise KeyError(f"patch interaction '{word}' "
                           f"({'|'.join(codes)})")
        arr[p.start:p.start + p.size] = codes[word]
    return arr


class ParticleCloud:
    """A named cloud over a mesh; physics: 'tracer' (passiveParticle —
    moves with the interpolated fluid velocity) or 'inertial' (sphere
    drag + gravity + buoyancy, Schiller-Naumann)."""

    def __init__(self, mesh: MeshArrays, name: str = "defaultCloud", *,
                 capacity: int = 0, mode: str = "tracer",
                 rhop: float = 1000.0, rhoc: float = 1.0,
                 g=(0.0, 0.0, 0.0), e: float = 1.0,
                 mu_c: float = 1e-3,
                 patch_interaction: dict | None = None,
                 default_interaction: str = "rebound",
                 max_crossings: int = 12):
        self.mesh = mesh
        self.name = name
        self.mode = mode
        self.rhop = rhop
        self.rhoc = rhoc
        self.mu_c = mu_c
        self.g = jnp.asarray(g, mesh.C.dtype)
        self.e = e
        self.max_crossings = max_crossings
        self.face_code = jnp.asarray(_face_interaction_codes(
            mesh, patch_interaction or {}, default_interaction))
        dtype = mesh.C.dtype
        n = max(capacity, 1)
        self.state = CloudState(
            x=jnp.zeros((n, 3), dtype), v=jnp.zeros((n, 3), dtype),
            d=jnp.zeros(n, dtype),
            cell=jnp.zeros(n, jnp.int32),
            active=jnp.zeros(n, bool), stuck=jnp.zeros(n, bool))
        self._move = self._build_move()

    # -- injection (host) ----------------------------------------------------
    def inject(self, positions, velocities=None, diameters=None):
        """Fill dead slots with new particles (host-side, between
        steps). Cells are located by nearest-centre + a containment
        fix-up walk on the first tracked step."""
        pos = np.atleast_2d(np.asarray(positions, float))
        m = pos.shape[0]
        st = self.state
        free = np.where(~np.asarray(st.active))[0]
        if free.size < m:
            grow = m - free.size + int(st.x.shape[0])
            pad = lambda a, shape: jnp.concatenate(
                [a, jnp.zeros((grow,) + shape, a.dtype)])
            st = CloudState(pad(st.x, (3,)), pad(st.v, (3,)),
                            pad(st.d, ()),
                            jnp.concatenate([st.cell,
                                             jnp.zeros(grow, jnp.int32)]),
                            jnp.concatenate([st.active,
                                             jnp.zeros(grow, bool)]),
                            jnp.concatenate([st.stuck,
                                             jnp.zeros(grow, bool)]))
            free = np.where(~np.asarray(st.active))[0]
        slots = free[:m]
        from scipy.spatial import cKDTree
        tree = getattr(self, "_ctree", None)
        if tree is None:
            tree = self._ctree = cKDTree(np.asarray(self.mesh.C))
        _, cells = tree.query(pos)

        x = np.array(st.x)
        v = np.array(st.v)
        dd = np.array(st.d)
        cl = np.array(st.cell)
        ac = np.array(st.active)
        x[slots] = pos
        v[slots] = 0.0 if velocities is None else np.asarray(velocities)
        dd[slots] = 1e-4 if diameters is None else np.asarray(diameters)
        cl[slots] = cells
        ac[slots] = True
        dtype = self.mesh.C.dtype
        self.state = CloudState(jnp.asarray(x, dtype), jnp.asarray(v, dtype),
                                jnp.asarray(dd, dtype),
                                jnp.asarray(cl, jnp.int32),
                                jnp.asarray(ac), st.stuck)

    # -- the jitted mover ----------------------------------------------------
    def _build_move(self):
        mesh = self.mesh
        face_code = self.face_code
        mode = self.mode
        e = self.e
        rhop, rhoc, mu_c = self.rhop, self.rhoc, self.mu_c
        g = self.g
        max_crossings = self.max_crossings
        eps = 1e-10

        def fluid_at(U: VolField, gradU, st: CloudState):
            u = U.data[st.cell]
            if gradU is not None:
                dx = st.x - mesh.C[st.cell]
                u = u + jnp.einsum("nij,nj->ni", gradU[st.cell], dx)
            return u

        def particle_velocity(st: CloudState, u_c, dt):
            if mode == "tracer":
                return u_c
            # sphere drag, semi-implicit (reference intermediate
            # SphereDragForce + gravity/buoyancy)
            rel = u_c - st.v
            re = rhoc * jnp.linalg.norm(rel, axis=-1) \
                * jnp.maximum(st.d, 1e-12) / mu_c
            cd_corr = 1.0 + 0.15 * re ** 0.687
            tau = rhop * jnp.maximum(st.d, 1e-12) ** 2 / (18.0 * mu_c)
            k = dt * cd_corr / jnp.maximum(tau, 1e-12)
            acc_g = g * (1.0 - rhoc / rhop)
            return (st.v + k[:, None] * u_c + dt * acc_g) \
                / (1.0 + k)[:, None]

        def crossing_step(carry):
            x, xt, v, cell, active, stuck = carry
            faces = mesh.cell_faces[cell]              # (N, K)
            sgn = mesh.cell_sign[cell]                 # (N, K)
            n_out = sgn[..., None] * mesh.Sf[faces]    # outward
            cf = mesh.Cf[faces]
            d = xt - x
            denom = jnp.einsum("nkj,nj->nk", n_out, d)
            num = jnp.einsum("nkj,nkj->nk", n_out, cf - x[:, None, :])
            lam = jnp.where(denom > eps, num / jnp.maximum(denom, eps),
                            jnp.inf)
            lam = jnp.where((sgn != 0) & (lam > -1e-6), lam, jnp.inf)
            moving = active & ~stuck \
                & (jnp.linalg.norm(d, axis=-1) > 1e-30)
            lam_min = jnp.min(lam, axis=1)
            kstar = jnp.argmin(lam, axis=1)
            crosses = moving & (lam_min < 1.0 - 1e-12)
            lam_c = jnp.clip(lam_min, 0.0, 1.0)

            f = faces[jnp.arange(faces.shape[0]), kstar]
            hit = jnp.where(crosses, face_code[f], _INTERNAL)
            x_hit = x + lam_c[:, None] * d
            x_new = jnp.where(crosses[:, None], x_hit, xt)

            nbr = mesh.cell_nbr[cell][jnp.arange(faces.shape[0]), kstar]
            internal_cross = crosses & (hit == _INTERNAL)
            cell = jnp.where(internal_cross, nbr, cell)

            # rebound: reflect remaining travel and velocity
            nhat = n_out[jnp.arange(faces.shape[0]), kstar]
            nhat = nhat / jnp.maximum(
                jnp.linalg.norm(nhat, axis=-1, keepdims=True), 1e-30)
            rem = xt - x_new
            refl = rem - (1.0 + e) \
                * (rem * nhat).sum(-1, keepdims=True) * nhat
            v_refl = v - (1.0 + e) * (v * nhat).sum(-1,
                                                    keepdims=True) * nhat
            bounce = crosses & (hit == _REBOUND)
            xt = jnp.where(bounce[:, None], x_new + refl,
                           jnp.where(crosses[:, None], xt, x_new))
            v = jnp.where(bounce[:, None], v_refl, v)
            # nudge off the wall so the next intersection test doesn't
            # re-find the same face at lam=0
            x_new = jnp.where(
                bounce[:, None], x_new - 1e-8 * nhat, x_new)

            stuck = stuck | (crosses & (hit == _STICK))
            active = active & ~(crosses & (hit == _ESCAPE))
            xt = jnp.where((stuck | ~active)[:, None], x_new, xt)
            return x_new, xt, v, cell, active, stuck

        @jax.jit
        def move(st: CloudState, dt, U: VolField | None,
                 gradU=None):
            u_c = fluid_at(U, gradU, st) if U is not None \
                else jnp.zeros_like(st.v)
            v_new = particle_velocity(st, u_c, dt) if U is not None \
                else st.v + dt * g * (1.0 - rhoc / rhop)
            live = st.active & ~st.stuck
            v_new = jnp.where(live[:, None], v_new, st.v)
            x = st.x
            xt = jnp.where(live[:, None], x + dt * v_new, x)
            carry = (x, xt, v_new, st.cell, st.active, st.stuck)

            def body(i, carry):
                return crossing_step(carry)

            x, xt, v, cell, active, stuck = jax.lax.fori_loop(
                0, max_crossings, body, carry)
            return CloudState(xt, v, st.d, cell, active, stuck)

        return move

    def move(self, dt, U: VolField | None = None, grad_u=None):
        """Advance every particle by dt through the flow field U
        (linear in-cell reconstruction when grad_u is given)."""
        self.state = self._move(self.state, dt, U, grad_u)
        return self.state

    # -- OpenFOAM cloud directory IO ------------------------------------------
    def write(self, case_dir: str, time_name: str, maps=None):
        """lagrangian/<cloud>/{positions,U,d} in the reference layout
        (reference: Cloud/CloudIO.C, IOPosition — positions as
        '(x y z) cellI')."""
        st = self.state
        act = np.where(np.asarray(st.active))[0]
        x = np.asarray(st.x)[act]
        v = np.asarray(st.v)[act]
        dd = np.asarray(st.d)[act]
        cells = np.asarray(st.cell)[act]
        if maps is not None:
            # maps.cell_perm[new] = old: the file-order id OF a device
            # cell index is a direct lookup (per-particle labels, not a
            # whole-field reorder)
            cells = np.asarray(maps.cell_perm)[cells]
        out = os.path.join(case_dir, time_name, "lagrangian", self.name)
        os.makedirs(out, exist_ok=True)
        from ..utils.dictionary import foamfile_header

        def write_list(fname, cls, body_lines):
            with open(os.path.join(out, fname), "w") as f:
                f.write(foamfile_header(cls, fname,
                                        f"{time_name}/lagrangian/"
                                        f"{self.name}"))
                f.write(f"\n{len(body_lines)}\n(\n")
                f.writelines(body_lines)
                f.write(")\n")

        write_list("positions", "Cloud<passiveParticle>", [
            f"({p[0]:.12g} {p[1]:.12g} {p[2]:.12g}) {c}\n"
            for p, c in zip(x, cells)])
        write_list("U", "vectorField", [
            f"({u[0]:.12g} {u[1]:.12g} {u[2]:.12g})\n" for u in v])
        write_list("d", "scalarField", [f"{val:.12g}\n" for val in dd])
        info(f"Cloud {self.name}: wrote {act.size} particles\n")

    @staticmethod
    def read_positions(case_dir: str, time_name: str, name: str):
        """Parse lagrangian/<cloud>/positions -> (positions, cells)."""
        import re
        path = os.path.join(case_dir, time_name, "lagrangian", name,
                            "positions")
        text = open(path).read()
        rows = re.findall(r"\(\s*([-\d.eE+]+)\s+([-\d.eE+]+)\s+"
                          r"([-\d.eE+]+)\s*\)\s*(\d+)", text)
        pos = np.array([[float(a), float(b), float(c)]
                        for a, b, c, _ in rows])
        cells = np.array([int(i) for _, _, _, i in rows])
        return pos, cells
