"""Radiation models — P1 + constant absorption/emission/scatter.

Capability surface of the reference's radiationModel framework
(reference: src/thermophysicalModels/radiationModels/radiationModel/P1/
P1.C:213-290: gamma = 1/(3a+sigmaEff), laplacian(gamma,G) - Sp(a,G) ==
-4(e*sigma*T^4 + E); Rp = 4 e sigma, Ru = a G - 4 E; energy coupling
radiationModel::Sh = Ru - Sp(4 Rp T^3/Cpv, he) - Rp T^3 (T - 4 he/Cpv)),
selected from constant/radiationProperties. Submodels implemented:
constantAbsorptionEmission, constantScatter (the property-field zoo
reduces to constants).

TPU-first: the G Helmholtz solve is one more jitted fvMatrix solve in
the step; the Sh linearization is fused into the energy assembly.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import jax.numpy as jnp

from ..fields.bcs import Mixed
from ..fields.field import Dimensioned, VolField
from ..linalg import solve
from ..ops import fvc, fvm
from ..utils.dictionary import Dictionary, parse_file
from ..utils.dimensions import DimensionSet
from ..utils.logging import info
from ..utils.registry import register

SIGMA_SB = 5.670373e-8   # Stefan-Boltzmann [W/m2/K4] (physicoChemical)


@register("fvPatchField", "MarshakRadiation",
          "MarshakRadiationFixedTemperature", "greyDiffusiveRadiation")
@dataclass(frozen=True)
class MarshakRadiation(Mixed):
    """Marshak boundary for incident radiation G (reference:
    radiationModels/derivedFvPatchFields/MarshakRadiation): the Robin
    flux condition -gamma dG/dn = e/(2(2-e)) (G - 4 sigma Tw^4) as a
    mixed BC with valueFraction alpha/(alpha + gamma*deltaCoeff).
    env carries 'T' (for Tw) and 'gammaRad'."""
    preserves_type = True

    def _mixed_bd(self, bd, mesh, patch, env, psi_c):
        # P1Radiation.correct stashes the per-solve Robin data in bd
        # (assembly has no env channel; the SRF BC uses the same trick)
        if "marshakRefValue" in bd:
            return dict(refValue=bd["marshakRefValue"],
                        refGradient=jnp.zeros_like(psi_c),
                        valueFraction=bd["marshakFraction"]
                        * jnp.ones_like(psi_c))
        e = jnp.clip(bd.get("emissivity", jnp.asarray(1.0)), 1e-3, 1.0)
        t_env = (env or {}).get("T")
        if t_env is not None:
            sl = slice(patch.bstart, patch.bstart + patch.size)
            tw = t_env.bvalues[sl]
        else:
            tw = jnp.zeros(patch.size, psi_c.dtype)
        gamma = (env or {}).get("gammaRad", 1.0)
        alpha = e / (2.0 * (2.0 - e))
        dc = mesh.patch_delta_coeffs(patch)
        f = alpha / (alpha + gamma * dc)
        return dict(refValue=4.0 * SIGMA_SB * tw ** 4,
                    refGradient=jnp.zeros_like(psi_c),
                    valueFraction=f * jnp.ones_like(psi_c))

    def evaluate(self, mesh, patch, field, bd, env=None):
        psi_c = field.patch_internal(mesh, patch)
        return Mixed.evaluate(self, mesh, patch, field,
                              self._mixed_bd(bd, mesh, patch, env,
                                             psi_c), env)

    def value_internal_coeff(self, mesh, patch, field, bd, env=None):
        psi_c = field.patch_internal(mesh, patch)
        return Mixed.value_internal_coeff(
            self, mesh, patch, field,
            self._mixed_bd(bd, mesh, patch, env, psi_c), env)

    def gradient_internal_coeff(self, mesh, patch, field, bd, env=None):
        psi_c = field.patch_internal(mesh, patch)
        return Mixed.gradient_internal_coeff(
            self, mesh, patch, field,
            self._mixed_bd(bd, mesh, patch, env, psi_c), env)


class P1Radiation:
    """radiationModel P1 (see module docstring)."""

    def __init__(self, case, props: Dictionary):
        self.case = case
        ae = props.subdict("constantAbsorptionEmissionCoeffs",
                           required=False) or Dictionary()

        def dimmed(key, default=0.0):
            v = ae.lookup(key)
            if v is None:
                return default
            return Dimensioned.from_entry(v, key).value \
                if isinstance(v, tuple) else float(v)

        self.a = dimmed("absorptivity", 0.5)
        self.e = dimmed("emissivity", 0.5)
        self.E = dimmed("E", 0.0)
        sc = props.subdict("constantScatterCoeffs",
                           required=False) or Dictionary()
        sigma = sc.lookup("sigma")
        self.sigma_s = (Dimensioned.from_entry(sigma, "sigma").value
                        if isinstance(sigma, tuple)
                        else float(sigma)) if sigma is not None else 0.0
        c = sc.lookup("C")
        self.c_lin = (Dimensioned.from_entry(c, "C").value
                      if isinstance(c, tuple)
                      else float(c)) if c is not None else 0.0
        self.gamma = 1.0 / (3.0 * self.a + self.sigma_s + 1e-30)
        self.g_controls = case.solver_controls("G")
        self.lap_corr = case.laplacian_scheme()
        info(f"Selecting radiationModel P1 (a={self.a} e={self.e} "
             f"sigma_s={self.sigma_s})")

    def read_g(self):
        return self.case.read_field("G")

    def correct(self, mesh, G: VolField, T: VolField):
        """Solve the G Helmholtz equation (reference P1.C:236-243)."""
        gamma = Dimensioned("gammaRad", DimensionSet.of(0, 1), self.gamma)
        env = {"T": T, "gammaRad": self.gamma}
        # stash the Robin data so matrix assembly (no env channel) sees
        # the current wall temperatures
        bcdata = list(G.bcdata)
        for i, bc in enumerate(G.bcs):
            if isinstance(bc, MarshakRadiation):
                patch = mesh.patches[i]
                bd = dict(bcdata[i])
                e = jnp.clip(bd.get("emissivity", jnp.asarray(1.0)),
                             1e-3, 1.0)
                sl = slice(patch.bstart, patch.bstart + patch.size)
                tw = T.bvalues[sl]
                alpha = e / (2.0 * (2.0 - e))
                dc = mesh.patch_delta_coeffs(patch)
                bd["marshakRefValue"] = 4.0 * SIGMA_SB * tw ** 4
                bd["marshakFraction"] = alpha / (alpha
                                                 + self.gamma * dc)
                bcdata[i] = bd
        G = G.replace(bcdata=tuple(bcdata))
        rhs = G.with_calculated_bcs(
            -4.0 * (self.e * SIGMA_SB * T.data ** 4 + self.E),
            jnp.zeros_like(G.bvalues),
            G.dims / DimensionSet.of(0, 1))
        eqn = (fvm.laplacian(mesh, gamma, G, self.lap_corr)
               - fvm.Sp(mesh, Dimensioned(
                   "a", DimensionSet.of(0, -1), self.a), G))
        eqn = eqn.equals(rhs)
        G_new, perf = solve(mesh, eqn, self.g_controls, env=env)
        return G_new, perf

    def sh(self, mesh, G: VolField, T: VolField, cpv, he_cur):
        """Energy-equation coupling (reference radiationModel::Sh):
        Sh = Ru - Rp*T^4, linearized in he with d(T^4)/d(he) =
        4 T^3/Cpv. Returns (sp_coeff, explicit_source) densities
        [W/m3]; the caller adds diag += V*sp, source += V*expl, so at
        convergence (he_new == he_cur) the net source is Ru - Rp*T^4."""
        t3 = T.data ** 3
        rp = 4.0 * self.e * SIGMA_SB
        ru = self.a * G.data - 4.0 * self.E
        sp = rp * t3 / jnp.maximum(cpv, 1e-10)
        expl = ru - rp * t3 * T.data + sp * he_cur
        return sp, expl

    def qr(self, mesh, G: VolField):
        """Boundary radiative heat flux -gamma*snGrad(G)."""
        sng = fvc.sn_grad(mesh, G)
        return -self.gamma * sng.data


class FvDOMRadiation:
    """radiationModel fvDOM — finite-volume discrete ordinates
    (reference: radiationModel/fvDOM/fvDOM.C:230-350 +
    radiativeIntensityRay.C:160-210): the grey RTE
        div(I_i d_i) + a I_i = a sigma T^4 / pi
    is solved per ordinate direction with upwind transport and
    grey-diffusive walls  Iw = e sigma Tw^4/pi + (1-e) qin/pi,
    then G = sum_i omega_i I_i.

    TPU re-founding: the reference loops rays, solving one small sparse
    system each (radiativeIntensityRay::correct). Here ALL rays live on
    a leading (nRay,) axis of one array — the upwind face selection,
    the ELL cell-gather and the Jacobi relaxation are written batched,
    so one lax.while_loop advances every ray at once and the compile
    cost is ray-count independent. Ray transport is solved from a
    G-consistent initial state each correct() (functional: no hidden
    per-ray state threads through the solver step)."""

    def __init__(self, case, props: Dictionary):
        import numpy as np
        self.case = case
        co = props.subdict("fvDOMCoeffs", required=False) or Dictionary()
        self.n_phi = int(co.scalar("nPhi", 2))       # per octant
        self.n_theta = int(co.scalar("nTheta", 2))
        self.tolerance = co.scalar("tolerance", 1e-4)
        self.max_iter = int(co.scalar("maxIter", 4))
        ae = props.subdict("constantAbsorptionEmissionCoeffs",
                           required=False) or Dictionary()

        def dimmed(key, default=0.0):
            v = ae.lookup(key)
            if v is None:
                return default
            return Dimensioned.from_entry(v, key).value \
                if isinstance(v, tuple) else float(v)

        self.a = dimmed("absorptivity", 0.5)
        self.e = dimmed("emissivity", 0.5)
        self.E = dimmed("E", 0.0)

        # angular discretization: 4*nPhi azimuthal x 2*nTheta polar
        # bands (the reference's nPhi/nTheta are per octant)
        n_phi, n_theta = 4 * self.n_phi, 2 * self.n_theta
        d_phi = 2.0 * np.pi / n_phi
        d_theta = np.pi / n_theta
        d_ave, omega = [], []
        for i in range(n_theta):
            t1, t2 = i * d_theta, (i + 1) * d_theta
            for j in range(n_phi):
                p1, p2 = j * d_phi, (j + 1) * d_phi
                # dAve = Int s dOmega over the control angle
                sin2 = 0.5 * (t2 - t1) \
                    - 0.25 * (np.sin(2 * t2) - np.sin(2 * t1))
                d_ave.append([
                    (np.sin(p2) - np.sin(p1)) * sin2,
                    -(np.cos(p2) - np.cos(p1)) * sin2,
                    0.5 * d_phi * (np.sin(t2) ** 2 - np.sin(t1) ** 2),
                ])
                omega.append(d_phi * (np.cos(t1) - np.cos(t2)))
        self.d_ave = np.asarray(d_ave)           # (nRay, 3)
        self.omega = np.asarray(omega)           # (nRay,)
        self.n_ray = len(omega)
        self.lap_corr = case.laplacian_scheme()
        try:
            self.i_controls = case.solver_controls("Ii")
        except Exception:
            from ..linalg.solvers import SolverControls
            self.i_controls = SolverControls()
        self.sweeps = int(self.i_controls.max_iter) or 300
        info(f"Selecting radiationModel fvDOM ({self.n_ray} rays, "
             f"a={self.a} e={self.e})")

    def read_g(self):
        return self.case.read_field("G")

    def correct(self, mesh, G: VolField, T: VolField):
        """Solve all rays (batched), rebuild G (reference fvDOM::calc)."""
        dtype = G.data.dtype
        d_ave = jnp.asarray(self.d_ave, dtype)       # (nR, 3)
        omega = jnp.asarray(self.omega, dtype)       # (nR,)
        n_int = mesh.n_internal

        j_f = d_ave @ mesh.Sf.T                      # (nR, nFaces)
        j_int = j_f[:, :n_int]
        own = mesh.owner[:n_int]
        nei = mesh.neighbour

        emis = self.a * SIGMA_SB * T.data ** 4 / jnp.pi + self.E / jnp.pi
        kV = self.a * mesh.V                          # attenuation * V
        # diag: attenuation + sum of outgoing face fluxes (per ray)
        out_own = jnp.maximum(j_int, 0.0)             # owner -> nei
        out_nei = jnp.maximum(-j_int, 0.0)            # nei -> owner
        diag = jnp.zeros((self.n_ray, mesh.n_cells), dtype) + kV
        diag = diag.at[:, own].add(out_own)
        diag = diag.at[:, nei].add(out_nei)
        # boundary faces: outgoing flux adds to the owner diag
        bflux = []
        bowners = []
        for p in mesh.patches:
            if p.is_empty or p.size == 0:
                continue
            sl = slice(p.start, p.start + p.size)
            bflux.append(j_f[:, sl])
            bowners.append(mesh.owner[sl])
        jb = jnp.concatenate(bflux, axis=1) if bflux else j_f[:, :0]
        bown = jnp.concatenate(bowners) if bowners else own[:0]
        diag = diag.at[:, bown].add(jnp.maximum(jb, 0.0))
        # wall emission (independent of I): used for incoming faces
        tw = jnp.concatenate([
            T.bvalues[p.bstart:p.bstart + p.size]
            for p in mesh.patches if not p.is_empty and p.size]) \
            if bflux else T.data[:0]
        q_emit = self.e * SIGMA_SB * tw ** 4 / jnp.pi

        b0 = emis * mesh.V                            # (nCells,)

        def sweep(I, i_wall):
            """One Jacobi pass for all rays at once.
            I: (nR, nCells); i_wall: (nR, nBnd) incoming intensities."""
            num = jnp.zeros_like(I) + b0
            # upwind flux leaves the upwind cell, enters the downwind
            num = num.at[:, nei].add(out_own * I[:, own])
            num = num.at[:, own].add(out_nei * I[:, nei])
            # boundary: incoming faces feed the owner with i_wall
            num = num.at[:, bown].add(jnp.maximum(-jb, 0.0) * i_wall)
            return num / diag

        def wall_incident(I):
            """qin per boundary face: sum of outgoing ray radiosity
            hitting the wall; then grey-diffusive Iw for incoming."""
            qin = (jnp.maximum(jb, 0.0) * I[:, bown]).sum(0)
            mag = jnp.concatenate([
                mesh.mag_sf[p.start:p.start + p.size]
                for p in mesh.patches if not p.is_empty and p.size]) \
                if bflux else mesh.mag_sf[:0]
            qin = qin / jnp.maximum(mag, 1e-30)
            return q_emit + (1.0 - self.e) * qin / jnp.pi

        # G-consistent isotropic start
        I0 = jnp.broadcast_to(G.data / (4.0 * jnp.pi),
                              (self.n_ray, mesh.n_cells)).astype(dtype)
        from jax import lax

        def body(carry):
            I, it, res = carry
            i_wall = wall_incident(I)
            I_new = sweep(I, i_wall)
            res = jnp.max(jnp.abs(I_new - I)) \
                / (jnp.max(jnp.abs(I_new)) + 1e-30)
            return I_new, it + 1, res

        def cond(carry):
            I, it, res = carry
            return (res > self.tolerance) & (it < self.sweeps)

        I, iters, res = lax.while_loop(
            cond, body, (I0, jnp.asarray(0, jnp.int32),
                         jnp.asarray(jnp.inf, dtype)))

        g_new = (omega[:, None] * I).sum(0)
        G_new = fvc._extrapolated(mesh, g_new, G.dims, "G") \
            .replace(bcs=G.bcs, bcdata=G.bcdata)
        perf = ((jnp.asarray(1.0, dtype), res, iters),)
        return G_new, perf

    def sh(self, mesh, G: VolField, T: VolField, cpv, he_cur):
        """Energy coupling (reference fvDOM: Rp = 4 a sigma, Ru = a G)."""
        t3 = T.data ** 3
        rp = 4.0 * self.a * SIGMA_SB
        ru = self.a * G.data
        sp = rp * t3 / jnp.maximum(cpv, 1e-10)
        expl = ru - rp * t3 * T.data + sp * he_cur
        return sp, expl

    def qr(self, mesh, G: VolField):
        """Boundary radiative heat flux. The ray-resolved wall flux is
        internal to correct(); for postprocessing, the P1-form estimate
        -snGrad(G)/(3a) is returned (exact in the optically-thick limit
        the DOM and P1 share)."""
        sng = fvc.sn_grad(mesh, G)
        return -sng.data / (3.0 * self.a + 1e-30)


def make_radiation_model(case):
    """radiation::radiationModel::New — returns None when radiation is
    off/absent (reference: radiationModel 'none')."""
    path = os.path.join(case.dir, "constant", "radiationProperties")
    if not os.path.isfile(path):
        return None
    props = parse_file(path)
    if not props.boolean("radiation", True):
        return None
    name = props.word("radiationModel", "none")
    if name in ("none", "noRadiation"):
        return None
    if name == "P1":
        return P1Radiation(case, props)
    if name == "fvDOM":
        return FvDOMRadiation(case, props)
    if name == "opaqueSolid":
        return OpaqueSolidRadiation(case, props)
    if name == "viewFactor":
        return ViewFactorRadiation(case, props)
    raise KeyError(f"radiationProperties: unsupported radiationModel "
                   f"'{name}' (none|P1|fvDOM|opaqueSolid|viewFactor)")


class OpaqueSolidRadiation:
    """radiationModel opaqueSolid (reference: radiationModels/
    radiationModel/opaqueSolid/opaqueSolid.C:78-130): the placeholder
    model for solid CHT regions — radiation is absorbed at the surface,
    nothing propagates in the medium, so the volumetric coupling is
    identically zero (Rp = 0, Ru = 0). Exists so solid regions can
    carry a radiationProperties dict (absorption/emission read by
    surface models) without a transport solve."""

    needs_g = False

    def __init__(self, case, props: Dictionary):
        self.case = case
        info("Selecting radiationModel opaqueSolid")

    def read_g(self):
        return None

    def correct(self, mesh, G, T):
        return G, (jnp.asarray(0.0), jnp.asarray(0.0),
                   jnp.asarray(0, jnp.int32))

    def sh(self, mesh, G, T: VolField, cpv, he_cur):
        z = jnp.zeros_like(T.data)
        return z, z

    def qr(self, mesh, G):
        return None


class ViewFactorRadiation:
    """radiationModel viewFactor (reference: radiationModels/
    radiationModel/viewFactor/viewFactor.C — surface-to-surface grey
    radiosity over the enclosure patches).

    TPU re-founding: the reference reads view factors precomputed by
    the viewFactorsGen utility (constant/F + agglomeration maps) and
    solves the radiosity system with a distributed LU. Here the view
    factor matrix is built at model construction on the HOST from the
    patch-face geometry (centroid-kernel F_ij = cos(ti) cos(tj) A_j /
    (pi r^2), rows normalized to close the enclosure — exact in the
    convex-enclosure/no-occlusion limit that viewFactorsGen's ray
    tracing generalizes), and the per-step radiosity solve
    (I - (1-eps) F) J = eps sigma T^4 is ONE dense MXU solve over the
    enclosure faces. qr_wall = J - sum_j F_ij J_j (net outgoing -
    incoming); the energy equation receives it as an explicit
    wall-adjacent source through sh().

    Participating patches: every wall-type patch, or the names listed
    in viewFactorCoeffs { patches (...); }. Emissivity from
    viewFactorCoeffs emissivity (default 1)."""

    needs_g = False

    def __init__(self, case, props: Dictionary):
        import numpy as np

        self.case = case
        mesh = case.mesh
        vf = props.subdict("viewFactorCoeffs", required=False) \
            or Dictionary()
        names = vf.lookup("patches")
        self.eps = float(vf.scalar("emissivity", 1.0))
        sel = []
        for i, p in enumerate(mesh.patches):
            if p.is_empty or p.size == 0:
                continue
            if names is not None:
                if p.name in [str(n) for n in (
                        names if isinstance(names, (list, tuple))
                        else [names])]:
                    sel.append(i)
            elif p.type == "wall":
                sel.append(i)
        self.patch_ids = tuple(sel)
        Cf = np.asarray(mesh.Cf)
        Sf = np.asarray(mesh.Sf)
        ctrs, nrm, areas, bsl = [], [], [], []
        for i in sel:
            p = mesh.patches[i]
            sl = slice(p.start, p.start + p.size)
            a = np.linalg.norm(Sf[sl], axis=1)
            ctrs.append(Cf[sl])
            nrm.append(Sf[sl] / np.maximum(a, 1e-300)[:, None])
            areas.append(a)
            bsl.append((p.bstart, p.size))
        self.bsl = tuple(bsl)
        C = np.concatenate(ctrs)
        N = np.concatenate(nrm)      # outward from the fluid? Sf points
        A = np.concatenate(areas)    # out of the domain at boundaries —
        nfr = C.shape[0]             # INTO the enclosure is -N
        d = C[None, :, :] - C[:, None, :]
        r2 = (d * d).sum(-1)
        r = np.sqrt(np.maximum(r2, 1e-300))
        # cos(theta_i): angle between the INWARD normal (-N_i) and d_ij
        ci = -(N[:, None, :] * d).sum(-1) / r
        cj = (N[None, :, :] * d).sum(-1) / r
        F = np.maximum(ci, 0.0) * np.maximum(cj, 0.0) \
            * A[None, :] / (np.pi * np.maximum(r2, 1e-300))
        np.fill_diagonal(F, 0.0)
        # close the enclosure: rows must sum to 1 (centroid-kernel
        # quadrature error otherwise leaks energy)
        s = F.sum(1)
        F = F / np.maximum(s, 1e-30)[:, None]
        self.F = jnp.asarray(F)
        self.A = jnp.asarray(A)
        # owner cells of the radiating faces (for the sh() source)
        own = np.asarray(mesh.owner)
        self.own = jnp.asarray(np.concatenate(
            [own[mesh.patches[i].start:
                 mesh.patches[i].start + mesh.patches[i].size]
             for i in sel]).astype(np.int32))
        eye = jnp.eye(nfr, dtype=self.F.dtype)
        self.M = eye - (1.0 - self.eps) * self.F
        info(f"Selecting radiationModel viewFactor "
             f"({nfr} enclosure faces, emissivity {self.eps})")

    def _tw(self, T: VolField):
        return jnp.concatenate(
            [T.bvalues[b:b + s] for b, s in self.bsl])

    def read_g(self):
        return None

    def correct(self, mesh, G, T):
        return G, (jnp.asarray(0.0), jnp.asarray(0.0),
                   jnp.asarray(0, jnp.int32))

    def qr_faces(self, T: VolField):
        """Net radiative flux per enclosure face [W/m2], positive
        leaving the wall into the fluid? Sign convention: positive =
        net flux ABSORBED by the wall face (incoming - outgoing), the
        sign the energy source wants."""
        tw4 = SIGMA_SB * self._tw(T) ** 4
        J = jnp.linalg.solve(self.M, self.eps * tw4)
        incoming = self.F @ J
        # net absorbed per unit area = eps*(incident - sigma T^4)
        return self.eps * (incoming - tw4)

    def sh(self, mesh, G, T: VolField, cpv, he_cur):
        """Explicit wall-adjacent energy source: qr*A/V at the owner
        cells of the enclosure faces (the reference couples through the
        greyDiffusiveViewFactor qr boundary field consumed by the
        turbulent thermal wall flux; the explicit volumetric deposit is
        the segregated equivalent)."""
        q = self.qr_faces(T)                      # (nfr,) W/m2
        src = jnp.zeros_like(T.data).at[self.own].add(
            q * self.A)                           # W
        expl = src / mesh.V                       # W/m3
        return jnp.zeros_like(expl), expl

    def qr(self, mesh, G):
        return None
