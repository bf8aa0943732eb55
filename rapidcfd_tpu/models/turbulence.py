"""RAS turbulence framework: laminar, kEpsilon (+ wall functions).

Capability surface of the reference's legacy incompressible turbulence
framework (reference: src/turbulenceModels/incompressible/RAS/RASModel/
RASModel.H:71; kEpsilon/kEpsilon.C:229-280), TPU-first: the model's
correct() is a pure jittable function over a state dict of VolFields,
wall functions are BC descriptors + a matrix row-fixing pass
(fvMatrix::setValues as ELL gathers).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..fields.bcs import BC, ZeroGradient
from ..fields.field import Dimensioned, VolField
from ..linalg.solvers import gsum, solve
from ..ops import fvc, fvm
from ..utils.dictionary import Dictionary
from ..utils.dimensions import DimensionSet, dim_length, dim_viscosity

_RTIME = DimensionSet.of(0, 0, -1)
from ..utils.registry import lookup, register


# ---------------------------------------------------------------------------
# wall-function boundary conditions
# ---------------------------------------------------------------------------

_KAPPA = 0.41
_E = 9.8
_CMU = 0.09
_CMU25 = _CMU ** 0.25
_CMU75 = _CMU ** 0.75


def _y_plus_lam(kappa=_KAPPA, e=_E, n=10):
    """Fixed point of ypl = ln(E*ypl)/kappa (log-law/laminar crossover,
    reference: nutWallFunction::yPlusLam)."""
    import math
    ypl = 11.0
    for _ in range(n):
        ypl = math.log(max(e * ypl, 1.0 + 1e-6)) / kappa
    return ypl


_YPLUS_LAM = _y_plus_lam()

from dataclasses import dataclass  # noqa: E402


@register("fvPatchField", "nutkWallFunction", "nutWallFunction")
@dataclass(frozen=True)
class NutkWallFunction(BC):
    """Turbulent-viscosity wall function from the log law using k
    (reference: nutkWallFunctionFvPatchScalarField)."""
    preserves_type = True
    value_free = True

    def evaluate(self, mesh, patch, field, bd, env=None):
        if env is None or "k" not in env:
            # during field IO init there is no k yet; keep current values
            return field.patch_values(mesh, patch)
        k = env["k"]
        nu = env["nu"]
        k_c = k.data[mesh.patch_face_cells(patch)]
        y = 1.0 / mesh.patch_delta_coeffs(patch)
        if isinstance(nu, VolField):
            nuw = nu.data[mesh.patch_face_cells(patch)]
        elif isinstance(nu, Dimensioned):
            nuw = nu.value
        else:
            nuw = nu
        y_plus = _CMU25 * jnp.sqrt(jnp.maximum(k_c, 0.0)) * y / nuw
        nutw = nuw * (y_plus * _KAPPA
                      / jnp.log(jnp.maximum(_E * y_plus, 1.0 + 1e-6))
                      - 1.0)
        return jnp.where(y_plus > _YPLUS_LAM, jnp.maximum(nutw, 0.0), 0.0)

    def value_internal_coeff(self, mesh, patch, field, bd, env=None):
        return jnp.zeros(patch.size)

    def gradient_internal_coeff(self, mesh, patch, field, bd, env=None):
        return -mesh.patch_delta_coeffs(patch)


@register("fvPatchField", "kqRWallFunction")
@dataclass(frozen=True)
class KqRWallFunction(ZeroGradient):
    """k wall treatment: zeroGradient (reference: kqRWallFunction)."""


@register("fvPatchField", "epsilonWallFunction")
@dataclass(frozen=True)
class EpsilonWallFunction(ZeroGradient):
    """epsilon wall treatment: patch value follows the internal cell;
    the near-wall cell values/production are imposed by the model's
    boundary manipulation (reference: epsilonWallFunction +
    fixedInternalValue matrix manipulation)."""


@register("fvPatchField", "omegaWallFunction")
@dataclass(frozen=True)
class OmegaWallFunction(ZeroGradient):
    """omega wall treatment (used by kOmegaSST)."""


@register("fvPatchField", "nutUSpaldingWallFunction",
          "nutUWallFunction", "nutLowReWallFunction")
@dataclass(frozen=True)
class NutUSpaldingWallFunction(NutkWallFunction):
    """Velocity-based nut wall functions: round-1 alias to the k-based
    log-law form (reference has separate U-based fits)."""


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def bound(f: VolField, min_value: float) -> VolField:
    """Clip a field from below (reference: cfdTools/general bound)."""
    return f.replace(data=jnp.maximum(f.data, min_value),
                     bvalues=jnp.maximum(f.bvalues, min_value))


def magsqr_symm_grad(mesh, U: VolField):
    """2*|symm(grad U)|^2 cell field (the S2 in G = nut*S2)."""
    g = fvc.grad(mesh, U)
    sym = 0.5 * (g.data + jnp.swapaxes(g.data, 1, 2))
    return 2.0 * (sym * sym).sum((-2, -1))


# ---------------------------------------------------------------------------
# models
# ---------------------------------------------------------------------------

@register("RASModel", "laminar")
class Laminar:
    needs = ()

    def __init__(self, case, coeffs: Dictionary):
        self.case = case

    def init_state(self, U):
        return {}

    def nut(self, state):
        return None

    def nu_eff(self, mesh, state, nu):
        return nu

    def correct(self, mesh, state, U, phi, nu, dt=None):
        return state, {}


@register("RASModel", "kEpsilon")
class KEpsilon:
    """Standard k-epsilon (reference: incompressible/RAS/kEpsilon).

    The epsilon-equation production/destruction and the nut closure are
    overridable hooks so the RNG and realizable variants share the whole
    assembly/solve/wall-function machinery."""
    needs = ("k", "epsilon", "nut")
    Cmu_default, C1_default, C2_default = 0.09, 1.44, 1.92
    sigmak_default, sigmaEps_default = 1.0, 1.3

    def __init__(self, case, coeffs: Dictionary):
        self.case = case
        c = coeffs or Dictionary()
        self.Cmu = c.scalar("Cmu", self.Cmu_default)
        self.C1 = c.scalar("C1", self.C1_default)
        self.C2 = c.scalar("C2", self.C2_default)
        self.sigma_k = c.scalar("sigmak", self.sigmak_default)
        self.sigma_eps = c.scalar("sigmaEps", self.sigmaEps_default)
        self.k_min = 1e-15
        self.eps_min = 1e-15
        self.k_controls = case.solver_controls("k")
        self.eps_controls = case.solver_controls("epsilon")
        self.k_relax = case.relaxation_factor("k", default=0.7)
        self.eps_relax = case.relaxation_factor("epsilon", default=0.7)
        self.div_k = case.div_scheme("div(phi,k)")
        try:
            self.div_eps = case.div_scheme("div(phi,epsilon)")
        except KeyError:
            self.div_eps = self.div_k
        self.lap_corr = case.laplacian_scheme()
        self.ddt_scheme = case.ddt_scheme()

    def init_state(self, U):
        s = {name: self.case.read_field(name) for name in self.needs}
        return s

    def nut(self, state):
        return state["nut"]

    def nu_eff(self, mesh, state, nu):
        nut = state["nut"]
        if isinstance(nu, Dimensioned):
            data = nut.data + nu.value
            bval = nut.bvalues + nu.value
        else:
            data = nut.data + nu.data
            bval = nut.bvalues + nu.bvalues
        return nut.with_calculated_bcs(data, bval, dim_viscosity, "nuEff")

    # -- wall-function manipulation -----------------------------------------
    def _wall_fix(self, mesh, state, U, nu, G):
        """Near-wall cell overrides (reference: epsilonWallFunction
        updateCoeffs): returns (G', eps_fix_mask, eps_fix_values)."""
        k = state["k"]
        nut = state["nut"]
        fix = jnp.zeros(mesh.n_cells, G.dtype)
        eps_vals = jnp.zeros(mesh.n_cells, G.dtype)
        for bc, patch in zip(state["epsilon"].bcs, mesh.patches):
            if not isinstance(bc, EpsilonWallFunction) or patch.size == 0:
                continue
            cells = mesh.patch_face_cells(patch)
            y = 1.0 / mesh.patch_delta_coeffs(patch)
            k_c = jnp.maximum(k.data[cells], 0.0)
            nu_w = nu.value if isinstance(nu, Dimensioned) \
                else nu.data[cells]
            nut_w = nut.bvalues[patch.bstart:patch.bstart + patch.size]
            # wall-normal velocity gradient magnitude
            u_c = U.data[cells]
            u_w = U.bvalues[patch.bstart:patch.bstart + patch.size]
            mag_grad_uw = jnp.linalg.norm(u_c - u_w, axis=-1) / y
            g_w = (nut_w + nu_w) * mag_grad_uw * _CMU25 * jnp.sqrt(k_c) \
                / (_KAPPA * y)
            eps_w = _CMU75 * k_c ** 1.5 / (_KAPPA * y)
            # decomposition-padded faces share a live owner cell; route
            # their writes out of bounds (dropped) so only real faces
            # scatter
            idx = jnp.where(mesh.patch_active(patch) > 0, cells,
                            mesh.n_cells)
            G = G.at[idx].set(g_w, mode="drop")
            fix = fix.at[idx].set(1.0, mode="drop")
            eps_vals = eps_vals.at[idx].set(eps_w, mode="drop")
        return G, fix, eps_vals

    def correct(self, mesh, state, U, phi, nu, dt=None):
        """One turbulence correction (reference kEpsilon.C:229-280).
        dt=None -> steadyState ddt."""
        k, eps, nut = state["k"], state["epsilon"], state["nut"]
        if dt is not None:
            k = k.store_old()
            eps = eps.store_old()
        s2 = magsqr_symm_grad(mesh, U)
        G = self._production(mesh, state, U, s2)   # [m2/s3]
        G, eps_fix, eps_vals = self._wall_fix(mesh, state, U, nu, G)

        nu_eff_eps = self._dcoeff(mesh, state, nu, self.sigma_eps)
        nu_eff_k = self._dcoeff(mesh, state, nu, self.sigma_k)
        ddt_scheme = "steadyState" if dt is None else self.ddt_scheme

        # epsilon equation
        rhs_eps = eps.with_calculated_bcs(
            self._eps_prod(mesh, U, G, k, eps, s2),
            jnp.zeros_like(eps.bvalues), eps.dims / DimensionSet.of(0, 0, 1))
        eps_eqn = (fvm.ddt(mesh, eps, (1.0 if dt is None else dt), ddt_scheme)
                   + fvm.div(mesh, phi, eps, self.div_eps)
                   - fvm.laplacian(mesh, nu_eff_eps, eps, self.lap_corr)
                   + fvm.Sp(mesh, Dimensioned(
                       "epsDest", _RTIME,
                       self._eps_dest(mesh, U, k, eps, nu)), eps))
        eps_eqn = eps_eqn.equals(rhs_eps)
        eps_eqn = eps_eqn.relax(mesh, self.eps_relax)
        eps_eqn = eps_eqn.set_values(mesh, eps_fix, eps_vals)
        eps_new, eps_perf = solve(mesh, eps_eqn, self.eps_controls,
                                  env={"phi": phi})
        eps_new = bound(eps_new, self.eps_min)

        # k equation (optional low-Re wall sink D, LaunderSharma)
        rhs_k = k.with_calculated_bcs(
            G - self._k_sink(mesh, U, k, nu),
            jnp.zeros_like(k.bvalues),
            k.dims / DimensionSet.of(0, 0, 1))
        k_eqn = (fvm.ddt(mesh, k, (1.0 if dt is None else dt), ddt_scheme)
                 + fvm.div(mesh, phi, k, self.div_k)
                 - fvm.laplacian(mesh, nu_eff_k, k, self.lap_corr)
                 + fvm.Sp(mesh, Dimensioned(
                     "eps/k", _RTIME,
                     eps_new.data / jnp.maximum(k.data, self.k_min)), k))
        k_eqn = k_eqn.equals(rhs_k)
        k_eqn = k_eqn.relax(mesh, self.k_relax)
        k_new, k_perf = solve(mesh, k_eqn, self.k_controls,
                              env={"phi": phi})
        k_new = bound(k_new, self.k_min)

        # nut update + wall functions
        nut_data = self._nut_from(mesh, U, k_new, eps_new)
        nut_new = nut.replace(data=nut_data).correct_boundary_conditions(
            mesh, env={"k": k_new, "nu": nu})

        new_state = dict(k=k_new, epsilon=eps_new, nut=nut_new)
        perf = {"k": k_perf[0], "epsilon": eps_perf[0]}
        return new_state, perf

    # -- variant hooks -------------------------------------------------------
    def _production(self, mesh, state, U, s2):
        return state["nut"].data * s2

    def _k_sink(self, mesh, U, k, nu):
        return 0.0

    def _eps_prod(self, mesh, U, G, k, eps, s2):
        return self.C1 * G * eps.data / jnp.maximum(k.data, self.k_min)

    def _eps_dest(self, mesh, U, k, eps, nu):
        return self.C2 * eps.data / jnp.maximum(k.data, self.k_min)

    def _nut_from(self, mesh, U, k, eps):
        return self.Cmu * k.data ** 2 \
            / jnp.maximum(eps.data, self.eps_min)

    def _dcoeff(self, mesh, state, nu, sigma_inv_denom):
        """DkEff/DepsilonEff = nut/sigma + nu as a face-interpolatable
        field."""
        nut = state["nut"]
        if isinstance(nu, Dimensioned):
            data = nut.data / sigma_inv_denom + nu.value
            bval = nut.bvalues / sigma_inv_denom + nu.value
        else:
            data = nut.data / sigma_inv_denom + nu.data
            bval = nut.bvalues / sigma_inv_denom + nu.bvalues
        return nut.with_calculated_bcs(data, bval, dim_viscosity, "Deff")


@register("RASModel", "RNGkEpsilon")
class RNGkEpsilon(KEpsilon):
    """RNG k-epsilon (reference: incompressible/RAS/RNGkEpsilon/
    RNGkEpsilon.C:272-298): epsilon production coefficient becomes
    C1 - eta(1-eta/eta0)/(1+beta*eta^3) with eta = |S| k/epsilon."""
    Cmu_default, C1_default, C2_default = 0.0845, 1.42, 1.68
    sigmak_default, sigmaEps_default = 0.71942, 0.71942

    def __init__(self, case, coeffs: Dictionary):
        super().__init__(case, coeffs)
        c = coeffs or Dictionary()
        self.eta0 = c.scalar("eta0", 4.38)
        self.beta = c.scalar("beta", 0.012)

    def _eps_prod(self, mesh, U, G, k, eps, s2):
        eps_pos = jnp.maximum(eps.data, self.eps_min)
        eta = jnp.sqrt(jnp.maximum(s2, 0.0)) * k.data / eps_pos
        R = eta * (1.0 - eta / self.eta0) / (1.0 + self.beta * eta ** 3)
        return (self.C1 - R) * G * eps.data \
            / jnp.maximum(k.data, self.k_min)


@register("RASModel", "realizableKE")
class RealizableKE(KEpsilon):
    """Realizable k-epsilon (reference: incompressible/RAS/realizableKE/
    realizableKE.C:47-86,288-346): variable Cmu from the realizability
    bound, eta-based C1, and eps destruction C2*eps/(k+sqrt(nu*eps))."""
    Cmu_default, C1_default, C2_default = 0.09, 1.44, 1.9
    sigmak_default, sigmaEps_default = 1.0, 1.2

    def __init__(self, case, coeffs: Dictionary):
        super().__init__(case, coeffs)
        c = coeffs or Dictionary()
        self.A0 = c.scalar("A0", 4.0)

    @staticmethod
    def _dev_symm_s2(mesh, U):
        g = fvc.grad(mesh, U).data
        sym = 0.5 * (g + jnp.swapaxes(g, 1, 2))
        tr = sym[..., 0, 0] + sym[..., 1, 1] + sym[..., 2, 2]
        dev = sym - (tr / 3.0)[:, None, None] * jnp.eye(3, dtype=g.dtype)
        skw = 0.5 * (g - jnp.swapaxes(g, 1, 2))
        return dev, 2.0 * (dev * dev).sum((-2, -1)), \
            (skw * skw).sum((-2, -1))

    def _eps_prod(self, mesh, U, G, k, eps, s2):
        _, s2d, _ = self._dev_symm_s2(mesh, U)
        mag_s = jnp.sqrt(jnp.maximum(s2d, 0.0))
        eta = mag_s * k.data / jnp.maximum(eps.data, self.eps_min)
        c1 = jnp.maximum(eta / (5.0 + eta), 0.43)
        return c1 * mag_s * eps.data

    def _eps_dest(self, mesh, U, k, eps, nu):
        nu_c = nu.value if isinstance(nu, Dimensioned) else nu.data
        eps_pos = jnp.maximum(eps.data, 0.0)
        return self.C2 * eps.data \
            / (jnp.maximum(k.data, self.k_min)
               + jnp.sqrt(nu_c * eps_pos))

    def _nut_from(self, mesh, U, k, eps):
        dev, s2d, sk2 = self._dev_symm_s2(mesh, U)
        mag_s = jnp.sqrt(jnp.maximum(s2d, 0.0))
        eps_pos = jnp.maximum(eps.data, self.eps_min)
        # W = 2*sqrt(2) (S.S):S / (|S| S2), A_s = sqrt(6) cos(phi/3)
        sss = jnp.einsum("nij,njk,nki->n", dev, dev, dev)
        W = 2.0 * jnp.sqrt(2.0) * sss / (mag_s * s2d + 1e-30)
        phi_s = jnp.arccos(jnp.clip(jnp.sqrt(6.0) * W, -1.0, 1.0)) / 3.0
        As = jnp.sqrt(6.0) * jnp.cos(phi_s)
        Us = jnp.sqrt(s2d / 2.0 + sk2)
        r_cmu = 1.0 / (self.A0 + As * Us * k.data / eps_pos)
        return r_cmu * k.data ** 2 / eps_pos


@register("RASModel", "kOmega")
class KOmega:
    """Wilcox k-omega (reference: incompressible/RAS/kOmega/kOmega.C:
    253-281): omega production alpha*G*omega/k, destruction beta*omega^2,
    nut = k/omega."""
    needs = ("k", "omega", "nut")

    def __init__(self, case, coeffs: Dictionary):
        self.case = case
        c = coeffs or Dictionary()
        self.Cmu = c.scalar("Cmu", 0.09)
        self.beta = c.scalar("beta", 0.072)
        self.alpha = c.scalar("alpha", 0.52)
        self.alpha_k = c.scalar("alphaK", 0.5)
        self.alpha_omega = c.scalar("alphaOmega", 0.5)
        self.k_min = 1e-15
        self.omega_min = 1e-10
        self.k_controls = case.solver_controls("k")
        self.omega_controls = case.solver_controls("omega")
        self.k_relax = case.relaxation_factor("k", default=0.7)
        self.omega_relax = case.relaxation_factor("omega", default=0.7)
        self.div_k = case.div_scheme("div(phi,k)")
        try:
            self.div_omega = case.div_scheme("div(phi,omega)")
        except KeyError:
            self.div_omega = self.div_k
        self.lap_corr = case.laplacian_scheme()
        self.ddt_scheme = case.ddt_scheme()
        self.beta1 = self.beta  # viscous-sublayer omega in the wall fix

    def init_state(self, U):
        return {name: self.case.read_field(name) for name in self.needs}

    def nut(self, state):
        return state["nut"]

    nu_eff = KEpsilon.nu_eff
    _dcoeff = KEpsilon._dcoeff

    def _wall_fix(self, mesh, state, U, nu, G):
        return KOmegaSST._wall_fix(self, mesh, state, U, nu, G)

    def correct(self, mesh, state, U, phi, nu, dt=None):
        k, omega, nut = state["k"], state["omega"], state["nut"]
        if dt is not None:
            k = k.store_old()
            omega = omega.store_old()
        ddt_scheme = "steadyState" if dt is None else self.ddt_scheme
        s2 = magsqr_symm_grad(mesh, U)
        G = nut.data * s2
        G, om_fix, om_vals = self._wall_fix(
            mesh, dict(state, k=k, omega=omega), U, nu, G)

        d_om = self._dcoeff(mesh, state, nu, 1.0 / self.alpha_omega)
        d_k = self._dcoeff(mesh, state, nu, 1.0 / self.alpha_k)
        k_pos = jnp.maximum(k.data, self.k_min)
        om_pos = jnp.maximum(omega.data, self.omega_min)

        rhs_om = omega.with_calculated_bcs(
            self.alpha * G * omega.data / k_pos,
            jnp.zeros_like(omega.bvalues),
            omega.dims / DimensionSet.of(0, 0, 1))
        om_eqn = (fvm.ddt(mesh, omega, (1.0 if dt is None else dt), ddt_scheme)
                  + fvm.div(mesh, phi, omega, self.div_omega)
                  - fvm.laplacian(mesh, d_om, omega, self.lap_corr)
                  + fvm.Sp(mesh, Dimensioned("beta*omega", _RTIME,
                                             self.beta * om_pos), omega))
        om_eqn = om_eqn.equals(rhs_om)
        om_eqn = om_eqn.relax(mesh, self.omega_relax)
        om_eqn = om_eqn.set_values(mesh, om_fix, om_vals)
        omega_new, om_perf = solve(mesh, om_eqn, self.omega_controls,
                                   env={"phi": phi})
        omega_new = bound(omega_new, self.omega_min)

        rhs_k = k.with_calculated_bcs(
            G, jnp.zeros_like(k.bvalues),
            k.dims / DimensionSet.of(0, 0, 1))
        k_eqn = (fvm.ddt(mesh, k, (1.0 if dt is None else dt), ddt_scheme)
                 + fvm.div(mesh, phi, k, self.div_k)
                 - fvm.laplacian(mesh, d_k, k, self.lap_corr)
                 + fvm.Sp(mesh, Dimensioned(
                     "Cmu*omega", _RTIME,
                     self.Cmu * omega_new.data), k))
        k_eqn = k_eqn.equals(rhs_k)
        k_eqn = k_eqn.relax(mesh, self.k_relax)
        k_new, k_perf = solve(mesh, k_eqn, self.k_controls,
                              env={"phi": phi})
        k_new = bound(k_new, self.k_min)

        nut_data = k_new.data / jnp.maximum(omega_new.data, self.omega_min)
        nut_new = nut.replace(data=nut_data).correct_boundary_conditions(
            mesh, env={"k": k_new, "nu": nu})
        new_state = dict(k=k_new, omega=omega_new, nut=nut_new)
        return new_state, {"omega": om_perf[0], "k": k_perf[0]}


def wall_distance(case) -> jnp.ndarray:
    """Cell-centre distance to the nearest wall-patch face (replaces the
    reference's patchWave wallDist, src/finiteVolume/fvMesh/wallDist —
    nearest-face KD-tree query instead of a mesh wave; host, once)."""
    import numpy as np
    from scipy.spatial import cKDTree
    mesh = case.mesh
    wall_cf = []
    for p in mesh.patches:
        if p.type == "wall":
            wall_cf.append(np.asarray(mesh.patch_cf(p)))
    C = np.asarray(mesh.C)
    if not wall_cf:
        return jnp.full(mesh.n_cells, 1e10, mesh.C.dtype)
    tree = cKDTree(np.concatenate(wall_cf))
    d, _ = tree.query(C)
    return jnp.asarray(d, mesh.C.dtype)


@register("RASModel", "kOmegaSST")
class KOmegaSST:
    """Menter k-omega SST (reference: incompressible/RAS/kOmegaSST/
    kOmegaSST.H:115, 2.3 formulation with F1-blended coefficients)."""
    needs = ("k", "omega", "nut")

    alphaK1, alphaK2 = 0.85, 1.0
    alphaOmega1, alphaOmega2 = 0.5, 0.856
    gamma1, gamma2 = 5.0 / 9.0, 0.44
    beta1, beta2 = 0.075, 0.0828
    betaStar = 0.09
    a1, b1, c1 = 0.31, 1.0, 10.0

    def __init__(self, case, coeffs: Dictionary):
        self.case = case
        self.k_min = 1e-15
        self.omega_min = 1e-10
        self.k_controls = case.solver_controls("k")
        self.omega_controls = case.solver_controls("omega")
        self.k_relax = case.relaxation_factor("k", default=0.7)
        self.omega_relax = case.relaxation_factor("omega", default=0.7)
        self.div_k = case.div_scheme("div(phi,k)")
        try:
            self.div_omega = case.div_scheme("div(phi,omega)")
        except KeyError:
            self.div_omega = self.div_k
        self.lap_corr = case.laplacian_scheme()
        self.ddt_scheme = case.ddt_scheme()
        self.y = wall_distance(case)

    def init_state(self, U):
        return {name: self.case.read_field(name) for name in self.needs}

    def nut(self, state):
        return state["nut"]

    nu_eff = KEpsilon.nu_eff
    _dcoeff = KEpsilon._dcoeff

    def _blend(self, F1, c1v, c2v):
        return F1 * c1v + (1.0 - F1) * c2v

    def _y(self, mesh):
        """Wall distance: the mesh-attached slice under decomposition
        (parallel/dryrun attaches per-shard wall_dist), else the
        globally-precomputed field."""
        wd = getattr(mesh, "wall_dist", None)
        return wd if wd is not None else self.y

    def _omega_extra(self, mesh, U, k_pos, om_pos, gk, gom, s2):
        """Additional explicit omega source (SAS hook)."""
        return 0.0

    def _wall_fix(self, mesh, state, U, nu, G):
        """omegaWallFunction near-wall treatment: fix omega in adjacent
        cells to sqrt(omega_vis^2 + omega_log^2) and override G."""
        k = state["k"]
        nut = state["nut"]
        fix = jnp.zeros(mesh.n_cells, G.dtype)
        om_vals = jnp.zeros(mesh.n_cells, G.dtype)
        for bc, patch in zip(state["omega"].bcs, mesh.patches):
            if not isinstance(bc, OmegaWallFunction) or patch.size == 0:
                continue
            cells = mesh.patch_face_cells(patch)
            y = 1.0 / mesh.patch_delta_coeffs(patch)
            k_c = jnp.maximum(k.data[cells], 0.0)
            nu_w = nu.value if isinstance(nu, Dimensioned) \
                else nu.data[cells]
            nut_w = nut.bvalues[patch.bstart:patch.bstart + patch.size]
            u_c = U.data[cells]
            u_w = U.bvalues[patch.bstart:patch.bstart + patch.size]
            mag_grad_uw = jnp.linalg.norm(u_c - u_w, axis=-1) / y
            om_vis = 6.0 * nu_w / (self.beta1 * y * y)
            om_log = jnp.sqrt(k_c) / (_CMU25 * _KAPPA * y)
            om_w = jnp.sqrt(om_vis ** 2 + om_log ** 2)
            g_w = (nut_w + nu_w) * mag_grad_uw * _CMU25 * jnp.sqrt(k_c) \
                / (_KAPPA * y)
            idx = jnp.where(mesh.patch_active(patch) > 0, cells,
                            mesh.n_cells)
            G = G.at[idx].set(g_w, mode="drop")
            fix = fix.at[idx].set(1.0, mode="drop")
            om_vals = om_vals.at[idx].set(om_w, mode="drop")
        return G, fix, om_vals

    def correct(self, mesh, state, U, phi, nu, dt=None):
        k, omega, nut = state["k"], state["omega"], state["nut"]
        if dt is not None:
            k = k.store_old()
            omega = omega.store_old()
        y = self._y(mesh)
        nu_c = nu.value if isinstance(nu, Dimensioned) else nu.data
        ddt_scheme = "steadyState" if dt is None else self.ddt_scheme

        s2 = magsqr_symm_grad(mesh, U)
        sqrt_s2 = jnp.sqrt(jnp.maximum(s2, 0.0))
        G = nut.data * s2

        gk = fvc.grad(mesh, k)
        gom = fvc.grad(mesh, omega)
        om_pos = jnp.maximum(omega.data, self.omega_min)
        cd_kom = jnp.maximum(
            2.0 * self.alphaOmega2 * (gk.data * gom.data).sum(-1) / om_pos,
            1e-10)
        k_pos = jnp.maximum(k.data, 0.0)
        arg1 = jnp.minimum(jnp.minimum(jnp.maximum(
            jnp.sqrt(k_pos) / (self.betaStar * om_pos * y),
            500.0 * nu_c / (y * y * om_pos)),
            4.0 * self.alphaOmega2 * k_pos / (cd_kom * y * y)), 10.0)
        F1 = jnp.tanh(arg1 ** 4)
        arg2 = jnp.minimum(jnp.maximum(
            2.0 * jnp.sqrt(k_pos) / (self.betaStar * om_pos * y),
            500.0 * nu_c / (y * y * om_pos)), 100.0)
        F2 = jnp.tanh(arg2 ** 2)

        gamma = self._blend(F1, self.gamma1, self.gamma2)
        beta = self._blend(F1, self.beta1, self.beta2)
        alpha_k = self._blend(F1, self.alphaK1, self.alphaK2)
        alpha_om = self._blend(F1, self.alphaOmega1, self.alphaOmega2)

        G, om_fix, om_vals = self._wall_fix(mesh, state, U, nu, G)

        d_om = nut.with_calculated_bcs(
            alpha_om * nut.data + nu_c,
            self.alphaOmega1 * nut.bvalues
            + (nu.value if isinstance(nu, Dimensioned) else nu.bvalues),
            dim_viscosity, "DomegaEff")
        d_k = nut.with_calculated_bcs(
            alpha_k * nut.data + nu_c,
            self.alphaK1 * nut.bvalues
            + (nu.value if isinstance(nu, Dimensioned) else nu.bvalues),
            dim_viscosity, "DkEff")

        # omega equation
        gamma_s2 = gamma * jnp.minimum(
            s2, (self.c1 / self.a1) * self.betaStar * om_pos
            * jnp.maximum(self.a1 * om_pos, self.b1 * F2 * sqrt_s2))
        extra_om = self._omega_extra(mesh, U, k_pos, om_pos, gk, gom, s2)
        rhs_om = omega.with_calculated_bcs(
            gamma_s2 + (1.0 - F1) * cd_kom + extra_om,
            jnp.zeros_like(omega.bvalues),
            omega.dims / DimensionSet.of(0, 0, 1))
        om_eqn = (fvm.ddt(mesh, omega, (1.0 if dt is None else dt), ddt_scheme)
                  + fvm.div(mesh, phi, omega, self.div_omega)
                  - fvm.laplacian(mesh, d_om, omega, self.lap_corr)
                  + fvm.Sp(mesh, Dimensioned("beta*omega", _RTIME,
                                             beta * om_pos), omega))
        om_eqn = om_eqn.equals(rhs_om)
        om_eqn = om_eqn.relax(mesh, self.omega_relax)
        om_eqn = om_eqn.set_values(mesh, om_fix, om_vals)
        omega_new, om_perf = solve(mesh, om_eqn, self.omega_controls,
                                   env={"phi": phi})
        omega_new = bound(omega_new, self.omega_min)

        # k equation
        rhs_k = k.with_calculated_bcs(
            jnp.minimum(G, self.c1 * self.betaStar * k_pos * om_pos),
            jnp.zeros_like(k.bvalues), k.dims / DimensionSet.of(0, 0, 1))
        k_eqn = (fvm.ddt(mesh, k, (1.0 if dt is None else dt), ddt_scheme)
                 + fvm.div(mesh, phi, k, self.div_k)
                 - fvm.laplacian(mesh, d_k, k, self.lap_corr)
                 + fvm.Sp(mesh, Dimensioned(
                     "betaStar*omega", _RTIME,
                     self.betaStar * omega_new.data), k))
        k_eqn = k_eqn.equals(rhs_k)
        k_eqn = k_eqn.relax(mesh, self.k_relax)
        k_new, k_perf = solve(mesh, k_eqn, self.k_controls,
                              env={"phi": phi})
        k_new = bound(k_new, self.k_min)

        nut_data = self.a1 * k_new.data / jnp.maximum(
            self.a1 * jnp.maximum(omega_new.data, self.omega_min),
            self.b1 * F2 * sqrt_s2)
        nut_new = nut.replace(data=nut_data).correct_boundary_conditions(
            mesh, env={"k": k_new, "nu": nu})

        new_state = dict(k=k_new, omega=omega_new, nut=nut_new)
        return new_state, {"omega": om_perf[0], "k": k_perf[0]}


@register("LESModel", "Smagorinsky")
class Smagorinsky:
    """Smagorinsky SGS model with cubeRootVol delta (reference:
    incompressible/LES/Smagorinsky + LESdeltas/cubeRootVolDelta):
    nuSgs = (Ck^1.5/Ce * delta)^2-equivalent |S| form, implemented in the
    classic Cs form nut = (Cs*delta)^2 * sqrt(2 S:S)."""
    needs = ("nut",)

    def __init__(self, case, coeffs: Dictionary):
        self.case = case
        c = coeffs or Dictionary()
        self.cs = c.scalar("Cs", 0.17)
        self.delta = les_delta(case, c)

    def init_state(self, U):
        return {"nut": self.case.read_field("nut")} \
            if self.case.field_exists("nut") else {"nut": None}

    def nut(self, state):
        return state["nut"]

    nu_eff = KEpsilon.nu_eff

    def correct(self, mesh, state, U, phi, nu, dt=None):
        s2 = magsqr_symm_grad(mesh, U)
        nut_data = (self.cs * self.delta) ** 2 * jnp.sqrt(
            jnp.maximum(s2, 0.0))
        nut = state["nut"]
        nut_new = nut.replace(data=nut_data).correct_boundary_conditions(
            mesh, env={"k": nut.replace(data=nut_data), "nu": nu})
        return {"nut": nut_new}, {}


@register("LESModel", "oneEqEddy", "kEqn")
class OneEqEddy:
    """One-equation SGS kinetic-energy model (reference:
    incompressible/LES/oneEqEddy/oneEqEddy.C): solve the k-SGS
    transport, nuSgs = ck*sqrt(k)*delta, eps = ce*k^1.5/delta."""
    needs = ("k", "nut")

    def __init__(self, case, coeffs: Dictionary):
        self.case = case
        c = coeffs or Dictionary()
        self.ck = c.scalar("ck", 0.094)
        self.ce = c.scalar("ce", 1.048)
        self.delta = les_delta(case, c)
        self.k_min = 1e-15
        self.k_controls = case.solver_controls("k")
        self.div_k = case.div_scheme("div(phi,k)")
        self.lap_corr = case.laplacian_scheme()
        self.ddt_scheme = case.ddt_scheme()

    def init_state(self, U):
        return {name: self.case.read_field(name) for name in self.needs}

    def nut(self, state):
        return state["nut"]

    nu_eff = KEpsilon.nu_eff
    _dcoeff = KEpsilon._dcoeff

    def correct(self, mesh, state, U, phi, nu, dt=None):
        k, nut = state["k"], state["nut"]
        if dt is not None:
            k = k.store_old()
        ddt_scheme = "steadyState" if dt is None else self.ddt_scheme
        s2 = magsqr_symm_grad(mesh, U)
        G = nut.data * s2
        d_k = self._dcoeff(mesh, state, nu, 1.0)
        k_pos = jnp.maximum(k.data, self.k_min)
        rhs_k = k.with_calculated_bcs(
            G, jnp.zeros_like(k.bvalues),
            k.dims / DimensionSet.of(0, 0, 1))
        k_eqn = (fvm.ddt(mesh, k, (1.0 if dt is None else dt), ddt_scheme)
                 + fvm.div(mesh, phi, k, self.div_k)
                 - fvm.laplacian(mesh, d_k, k, self.lap_corr)
                 + fvm.Sp(mesh, Dimensioned(
                     "ce*sqrt(k)/delta", _RTIME,
                     self.ce * jnp.sqrt(k_pos) / self.delta), k))
        k_new, k_perf = solve(mesh, k_eqn.equals(rhs_k), self.k_controls,
                              env={"phi": phi})
        k_new = bound(k_new, self.k_min)
        nut_data = self.ck * jnp.sqrt(k_new.data) * self.delta
        nut_new = nut.replace(data=nut_data).correct_boundary_conditions(
            mesh, env={"k": k_new, "nu": nu})
        return dict(k=k_new, nut=nut_new), {"k": k_perf[0]}


def make_ras_model(case, U):
    """incompressible::RASModel::New (reads constant/RASProperties or
    constant/turbulenceProperties)."""
    import os
    props = None
    for fname in ("RASProperties", "turbulenceProperties"):
        path = os.path.join(case.dir, "constant", fname)
        if os.path.isfile(path):
            from ..utils.dictionary import parse_file
            props = parse_file(path)
            break
    if props is None:
        return Laminar(case, Dictionary())
    sim_type = props.word("simulationType", "RAS") \
        if props.lookup("simulationType") is not None else None
    if sim_type in ("LES", "LESModel") or props.lookup("LES") is not None \
            or props.lookup("LESModel") is not None:
        sub = props.subdict("LES", required=False) or props
        name = sub.word("LESModel", "Smagorinsky")
        coeffs = sub.subdict(name + "Coeffs", required=False)
        if not sub.boolean("turbulence", True):
            return Laminar(case, Dictionary())
        return lookup("LESModel", name)(case, coeffs)
    if sim_type == "laminar":
        return Laminar(case, Dictionary())
    # modern format nests under RAS {}
    if props.lookup("RAS") is not None:
        sub = props.subdict("RAS")
        name = sub.word("RASModel", "laminar")
        coeffs = sub.subdict(name + "Coeffs", required=False)
        on = sub.boolean("turbulence", True)
    else:
        name = props.word("RASModel", "laminar")
        coeffs = props.subdict(name + "Coeffs", required=False)
        on = props.boolean("turbulence", True)
    if not on:
        name = "laminar"
    return lookup("RASModel", name)(case, coeffs)


def magsqr_skew_grad(mesh, U: VolField):
    """2*|skew(grad U)|^2 (so sqrt() = sqrt(2)*mag(skew(grad U)) — the
    vorticity magnitude the SA production uses)."""
    g = fvc.grad(mesh, U)
    sk = 0.5 * (g.data - jnp.swapaxes(g.data, 1, 2))
    return 2.0 * (sk * sk).sum((-2, -1))


@register("RASModel", "SpalartAllmaras")
class SpalartAllmaras:
    """Spalart-Allmaras one-equation model (reference:
    incompressible/RAS/SpalartAllmaras/SpalartAllmaras.C:45-136 for
    chi/fv1/fv2/fw, :437-463 for the nuTilda transport):
    nut = nuTilda*fv1, Stilda = sqrt(2)|skew(grad U)| +
    fv2*nuTilda/(kappa*d)^2, production Cb1*Stilda*nuTilda, destruction
    Cw1*fw*(nuTilda/d)^2 implicit."""
    needs = ("nuTilda", "nut")

    def __init__(self, case, coeffs: Dictionary):
        self.case = case
        c = coeffs or Dictionary()
        self.sigma_nut = c.scalar("sigmaNut", 0.66666)
        self.kappa = c.scalar("kappa", 0.41)
        self.cb1 = c.scalar("Cb1", 0.1355)
        self.cb2 = c.scalar("Cb2", 0.622)
        self.cw1 = self.cb1 / self.kappa ** 2 \
            + (1.0 + self.cb2) / self.sigma_nut
        self.cw2 = c.scalar("Cw2", 0.3)
        self.cw3 = c.scalar("Cw3", 2.0)
        self.cv1 = c.scalar("Cv1", 7.1)
        self.controls = case.solver_controls("nuTilda")
        self.relax = case.relaxation_factor("nuTilda", default=0.7)
        self.div_nt = case.div_scheme("div(phi,nuTilda)")
        self.lap_corr = case.laplacian_scheme()
        self.ddt_scheme = case.ddt_scheme()
        self.y = jnp.maximum(wall_distance(case), 1e-10)

    def init_state(self, U):
        return {name: self.case.read_field(name) for name in self.needs}

    def nut(self, state):
        return state["nut"]

    nu_eff = KEpsilon.nu_eff

    def _d_tilde(self, mesh, state):
        """Wall scale; DES variants override (d_tilde = min(y, CDES*delta))."""
        wd = getattr(mesh, "wall_dist", None)
        return wd if wd is not None else self.y

    def correct(self, mesh, state, U, phi, nu, dt=None):
        nu_tilda, nut = state["nuTilda"], state["nut"]
        if dt is not None:
            nu_tilda = nu_tilda.store_old()
        ddt_scheme = "steadyState" if dt is None else self.ddt_scheme
        nu_c = nu.value if isinstance(nu, Dimensioned) else nu.data
        d = self._d_tilde(mesh, state)

        nt_pos = jnp.maximum(nu_tilda.data, 0.0)
        chi = nt_pos / nu_c
        chi3 = chi ** 3
        fv1 = chi3 / (chi3 + self.cv1 ** 3)
        fv2 = 1.0 - chi / (1.0 + chi * fv1)
        omega_mag = jnp.sqrt(jnp.maximum(magsqr_skew_grad(mesh, U), 0.0))
        stilda = jnp.maximum(
            omega_mag + fv2 * nt_pos / (self.kappa * d) ** 2, 1e-20)

        r = jnp.minimum(nt_pos / (stilda * (self.kappa * d) ** 2), 10.0)
        g = r + self.cw2 * (r ** 6 - r)
        fw = g * ((1.0 + self.cw3 ** 6)
                  / (g ** 6 + self.cw3 ** 6)) ** (1.0 / 6.0)

        d_nt = nu_tilda.with_calculated_bcs(
            (nt_pos + nu_c) / self.sigma_nut,
            (jnp.maximum(nu_tilda.bvalues, 0.0)
             + (nu.value if isinstance(nu, Dimensioned) else nu.bvalues))
            / self.sigma_nut, dim_viscosity, "DnuTildaEff")

        g_nt = fvc.grad(mesh, nu_tilda)
        rhs = nu_tilda.with_calculated_bcs(
            self.cb1 * stilda * nt_pos
            + (self.cb2 / self.sigma_nut)
            * (g_nt.data * g_nt.data).sum(-1),
            jnp.zeros_like(nu_tilda.bvalues),
            nu_tilda.dims / DimensionSet.of(0, 0, 1))
        eqn = (fvm.ddt(mesh, nu_tilda, (1.0 if dt is None else dt),
                       ddt_scheme)
               + fvm.div(mesh, phi, nu_tilda, self.div_nt)
               - fvm.laplacian(mesh, d_nt, nu_tilda, self.lap_corr)
               + fvm.Sp(mesh, Dimensioned(
                   "Cw1*fw*nuTilda/d^2", _RTIME,
                   self.cw1 * fw * nt_pos / (d * d)), nu_tilda))
        eqn = eqn.equals(rhs)
        eqn = eqn.relax(mesh, self.relax)
        nt_new, perf = solve(mesh, eqn, self.controls, env={"phi": phi})
        nt_new = bound(nt_new, 0.0)

        chi_n = nt_new.data / nu_c
        fv1_n = chi_n ** 3 / (chi_n ** 3 + self.cv1 ** 3)
        nut_new = nut.replace(data=fv1_n * nt_new.data) \
            .correct_boundary_conditions(mesh, env={"k": nt_new,
                                                    "nu": nu})
        return dict(nuTilda=nt_new, nut=nut_new), {"nuTilda": perf[0]}


@register("LESModel", "SpalartAllmarasDES", "SpalartAllmaras")
class SpalartAllmarasDES(SpalartAllmaras):
    """DES-97 (reference: incompressible/LES/SpalartAllmaras*):
    the SA equation with d_tilde = min(d_wall, CDES*delta)."""

    def __init__(self, case, coeffs: Dictionary):
        super().__init__(case, coeffs)
        c = coeffs or Dictionary()
        self.cdes = c.scalar("CDES", 0.65)
        delta_coeff = c.scalar("deltaCoeff", 1.0)
        self.delta = delta_coeff * jnp.cbrt(case.mesh.V)

    def _d_tilde(self, mesh, state):
        return jnp.minimum(self.y, self.cdes * self.delta)


@register("LESModel", "SpalartAllmarasDDES")
class SpalartAllmarasDDES(SpalartAllmarasDES):
    """Delayed DES (reference: incompressible/LES/SpalartAllmarasDDES):
    d_tilde = d - fd*max(0, d - CDES*delta), fd = 1 - tanh((8 rd)^3)."""

    def _d_tilde(self, mesh, state):
        nu_tilda = state["nuTilda"]
        # rd needs |grad U|; use stored nuTilda with the SA kappa
        U = state.get("_U")
        if U is None:
            return jnp.minimum(self.y, self.cdes * self.delta)
        g = fvc.grad(mesh, U)
        mag_grad = jnp.sqrt(jnp.maximum(
            (g.data * g.data).sum((-2, -1)), 1e-30))
        rd = jnp.minimum(
            jnp.maximum(nu_tilda.data, 0.0)
            / (mag_grad * (self.kappa * self.y) ** 2), 10.0)
        fd = 1.0 - jnp.tanh((8.0 * rd) ** 3)
        return self.y - fd * jnp.maximum(
            0.0, self.y - self.cdes * self.delta)

    def correct(self, mesh, state, U, phi, nu, dt=None):
        state = dict(state, _U=U)
        new, perf = super().correct(mesh, state, U, phi, nu, dt=dt)
        new.pop("_U", None)
        return new, perf


@register("RASModel", "LaunderSharmaKE")
class LaunderSharmaKE(KEpsilon):
    """Launder-Sharma low-Re k-epsilon (reference:
    incompressible/RAS/LaunderSharmaKE/LaunderSharmaKE.C): damping
    fMu = exp(-3.4/(1+Rt/50)^2) on nut, f2 = 1-0.3exp(-Rt^2) on the
    epsilon destruction, wall sink D = 2 nu |grad sqrt(k)|^2 in the k
    equation and source E = 2 nu nut |grad grad U|^2 in epsilon."""

    def _rt(self, k, eps, nu_c):
        return jnp.maximum(k, 0.0) ** 2 / (nu_c
                                           * jnp.maximum(eps, 1e-20))

    def _k_sink(self, mesh, U, k, nu):
        nu_c = nu.value if isinstance(nu, Dimensioned) else nu.data
        sqrt_k = k.replace(
            data=jnp.sqrt(jnp.maximum(k.data, 0.0)),
            bvalues=jnp.sqrt(jnp.maximum(k.bvalues, 0.0)))
        g = fvc.grad(mesh, sqrt_k)
        return 2.0 * nu_c * (g.data * g.data).sum(-1)

    def _eps_prod(self, mesh, U, G, k, eps, s2):
        nu_c = self._nu_c
        base = self.C1 * G * eps.data / jnp.maximum(k.data, self.k_min)
        # E = 2 nu nut |grad grad U|^2 via the (n,9)-flattened gradient
        gu = fvc.grad(mesh, U)                       # (n, 3, 3)
        gu_flat = gu.replace(
            data=gu.data.reshape(gu.data.shape[0], 9),
            bvalues=gu.bvalues.reshape(gu.bvalues.shape[0], 9))
        gg = fvc.grad(mesh, gu_flat)                 # (n, 3, 9)
        nut = self._nut_cache
        E = 2.0 * nu_c * nut * (gg.data * gg.data).sum((-2, -1))
        return base + E

    def _eps_dest(self, mesh, U, k, eps, nu):
        nu_c = nu.value if isinstance(nu, Dimensioned) else nu.data
        rt = self._rt(k.data, eps.data, nu_c)
        f2 = 1.0 - 0.3 * jnp.exp(-jnp.minimum(rt * rt, 50.0))
        return self.C2 * f2 * eps.data / jnp.maximum(k.data, self.k_min)

    def _nut_from(self, mesh, U, k, eps):
        fmu = jnp.exp(-3.4 / (1.0 + self._rt(k.data, eps.data,
                                             self._nu_c) / 50.0) ** 2)
        return self.Cmu * fmu * jnp.maximum(k.data, 0.0) ** 2 \
            / jnp.maximum(eps.data, self.eps_min)

    def correct(self, mesh, state, U, phi, nu, dt=None):
        self._nu_c = nu.value if isinstance(nu, Dimensioned) else nu.data
        self._nut_cache = state["nut"].data
        return super().correct(mesh, state, U, phi, nu, dt=dt)


@register("RASModel", "qZeta")
class QZeta(KEpsilon):
    """q-zeta low-Re model (reference: incompressible/RAS/qZeta):
    solved in the (k, epsilon) variables with the qZeta damping
    fMu = exp(-2.5/(1+Rt/50)) — the q=sqrt(k), zeta=eps/2q transform is
    a host-solver detail of the reference, not of the model physics."""

    def _nut_from(self, mesh, U, k, eps):
        nu_c = getattr(self, "_nu_c", 1e-5)
        rt = jnp.maximum(k.data, 0.0) ** 2 \
            / (nu_c * jnp.maximum(eps.data, 1e-20))
        fmu = jnp.exp(-2.5 / (1.0 + rt / 50.0))
        return self.Cmu * fmu * jnp.maximum(k.data, 0.0) ** 2 \
            / jnp.maximum(eps.data, self.eps_min)

    def correct(self, mesh, state, U, phi, nu, dt=None):
        self._nu_c = nu.value if isinstance(nu, Dimensioned) else nu.data
        return super().correct(mesh, state, U, phi, nu, dt=dt)


from ..fields.bcs import FixedValue as _FixedValue


@register("fvPatchField", "v2WallFunction")
@dataclass(frozen=True)
class V2WallFunction(_FixedValue):
    """v2 wall value (reference: v2f/derivedFvPatchFields/
    v2WallFunction — v2 -> small at the wall)."""


@register("fvPatchField", "fWallFunction")
@dataclass(frozen=True)
class FWallFunction(_FixedValue):
    """f wall value (reference: v2f/derivedFvPatchFields/fWallFunction
    — f -> 0 at the wall with the N=6 formulation)."""


@register("RASModel", "v2f")
class V2F:
    """Lien-Kalitzin v2-f with the Davidson limiter (reference:
    incompressible/RAS/v2f/v2f.C:360-450; Ts/Ls :78-87): four
    equations epsilon, k, f (elliptic relaxation) and v2;
    nut = min(Cmu*v2*Ts, CmuKEps*k^2/epsilon)."""
    needs = ("k", "epsilon", "v2", "f", "nut")
    N = 6.0

    def __init__(self, case, coeffs: Dictionary):
        self.case = case
        c = coeffs or Dictionary()
        self.cmu = c.scalar("Cmu", 0.22)
        self.cmu_keps = c.scalar("CmuKEps", 0.09)
        self.c1 = c.scalar("C1", 1.4)
        self.c2 = c.scalar("C2", 0.3)
        self.cl = c.scalar("CL", 0.23)
        self.ceta = c.scalar("Ceta", 70.0)
        self.ceps2 = c.scalar("Ceps2", 1.9)
        self.sigma_k = c.scalar("sigmaK", 1.0)
        self.sigma_eps = c.scalar("sigmaEps", 1.3)
        self.k_min = 1e-15
        self.eps_min = 1e-15
        self.v2_min = 1e-15
        self.f_min = 0.0
        self.controls = {n: case.solver_controls(n)
                         for n in ("k", "epsilon", "v2", "f")}
        self.relax = {n: case.relaxation_factor(n, default=0.7)
                      for n in ("k", "epsilon", "v2", "f")}
        self.div_of = {}
        for n in ("k", "epsilon", "v2"):
            try:
                self.div_of[n] = case.div_scheme(f"div(phi,{n})")
            except KeyError:
                self.div_of[n] = case.div_scheme("div(phi,k)")
        self.lap_corr = case.laplacian_scheme()
        self.ddt_scheme = case.ddt_scheme()

    def init_state(self, U):
        return {name: self.case.read_field(name) for name in self.needs}

    def nut(self, state):
        return state["nut"]

    nu_eff = KEpsilon.nu_eff
    _dcoeff = KEpsilon._dcoeff
    _wall_fix = KEpsilon._wall_fix

    def correct(self, mesh, state, U, phi, nu, dt=None):
        k, eps = state["k"], state["epsilon"]
        v2, f, nut = state["v2"], state["f"], state["nut"]
        if dt is not None:
            k, eps, v2 = k.store_old(), eps.store_old(), v2.store_old()
        ddt_scheme = "steadyState" if dt is None else self.ddt_scheme
        dt_v = 1.0 if dt is None else dt
        nu_c = nu.value if isinstance(nu, Dimensioned) else nu.data

        g = fvc.grad(mesh, U)
        sym = 0.5 * (g.data + jnp.swapaxes(g.data, 1, 2))
        dev = sym - (jnp.trace(sym, axis1=1, axis2=2) / 3.0)[
            :, None, None] * jnp.eye(3, dtype=sym.dtype)
        s2 = 2.0 * (dev * dev).sum((-2, -1))
        G = nut.data * s2
        G, eps_fix, eps_vals = self._wall_fix(mesh, state, U, nu, G)

        k_pos = jnp.maximum(k.data, self.k_min)
        eps_pos = jnp.maximum(eps.data, self.eps_min)
        v2_pos = jnp.maximum(v2.data, self.v2_min)
        T = jnp.maximum(k_pos / eps_pos,
                        6.0 * jnp.sqrt(nu_c / eps_pos))
        L2 = (self.cl * jnp.maximum(
            k_pos ** 1.5 / eps_pos,
            self.ceta * (nu_c ** 3 / eps_pos) ** 0.25)) ** 2
        alpha = ((self.c1 - self.N) * v2_pos
                 - (2.0 / 3.0) * k_pos * (self.c1 - 1.0)) / T
        ceps1 = 1.4 * (1.0 + 0.05 * jnp.minimum(
            jnp.sqrt(k_pos / v2_pos), 100.0))

        one = Dimensioned("1", DimensionSet(), 1.0)
        rdims = DimensionSet.of(0, 0, -1)

        # epsilon
        rhs = eps.with_calculated_bcs(
            ceps1 * G / T, jnp.zeros_like(eps.bvalues), eps.dims * rdims)
        eqn = (fvm.ddt(mesh, eps, dt_v, ddt_scheme)
               + fvm.div(mesh, phi, eps, self.div_of["epsilon"])
               - fvm.laplacian(mesh, self._dcoeff(mesh, state, nu,
                                                  self.sigma_eps),
                               eps, self.lap_corr)
               + fvm.Sp(mesh, Dimensioned("Ceps2/T", rdims,
                                          self.ceps2 / T), eps))
        eqn = eqn.equals(rhs).relax(mesh, self.relax["epsilon"])
        eqn = eqn.set_values(mesh, eps_fix, eps_vals)
        eps_new, eps_perf = solve(mesh, eqn, self.controls["epsilon"],
                                  env={"phi": phi})
        eps_new = bound(eps_new, self.eps_min)

        # k
        rhs = k.with_calculated_bcs(G, jnp.zeros_like(k.bvalues),
                                    k.dims * rdims)
        eqn = (fvm.ddt(mesh, k, dt_v, ddt_scheme)
               + fvm.div(mesh, phi, k, self.div_of["k"])
               - fvm.laplacian(mesh, self._dcoeff(mesh, state, nu,
                                                  self.sigma_k),
                               k, self.lap_corr)
               + fvm.Sp(mesh, Dimensioned(
                   "eps/k", rdims, eps_new.data / k_pos), k))
        eqn = eqn.equals(rhs).relax(mesh, self.relax["k"])
        k_new, k_perf = solve(mesh, eqn, self.controls["k"],
                              env={"phi": phi})
        k_new = bound(k_new, self.k_min)

        # f: -laplacian(f) + Sp(1/L2, f) == -(alpha - C2*G)/(L2*k)
        rhs = f.with_calculated_bcs(
            -(alpha - self.c2 * G) / (L2 * k_pos),
            jnp.zeros_like(f.bvalues),
            f.dims / (dim_length ** 2))
        eqn = (-fvm.laplacian(mesh, one, f, self.lap_corr)
               + fvm.Sp(mesh, Dimensioned("1/L2",
                                          DimensionSet.of(0, -2, 0),
                                          1.0 / L2), f))
        eqn = eqn.equals(rhs).relax(mesh, self.relax["f"])
        f_new, f_perf = solve(mesh, eqn, self.controls["f"],
                              env={"phi": phi})
        f_new = bound(f_new, self.f_min)

        # v2
        rhs = v2.with_calculated_bcs(
            jnp.minimum(k_new.data * f_new.data,
                        -alpha + self.c2 * G),
            jnp.zeros_like(v2.bvalues), v2.dims * rdims)
        eqn = (fvm.ddt(mesh, v2, dt_v, ddt_scheme)
               + fvm.div(mesh, phi, v2, self.div_of["v2"])
               - fvm.laplacian(mesh, self._dcoeff(mesh, state, nu,
                                                  self.sigma_k),
                               v2, self.lap_corr)
               + fvm.Sp(mesh, Dimensioned(
                   "N*eps/k", rdims,
                   self.N * eps_new.data
                   / jnp.maximum(k_new.data, self.k_min)), v2))
        eqn = eqn.equals(rhs).relax(mesh, self.relax["v2"])
        v2_new, v2_perf = solve(mesh, eqn, self.controls["v2"],
                                env={"phi": phi})
        v2_new = bound(v2_new, self.v2_min)

        # nut with the Davidson limiter
        T_new = jnp.maximum(
            jnp.maximum(k_new.data, self.k_min)
            / jnp.maximum(eps_new.data, self.eps_min),
            6.0 * jnp.sqrt(nu_c / jnp.maximum(eps_new.data,
                                              self.eps_min)))
        nut_data = jnp.minimum(
            self.cmu * v2_new.data * T_new,
            self.cmu_keps * k_new.data ** 2
            / jnp.maximum(eps_new.data, self.eps_min))
        nut_new = nut.replace(data=nut_data).correct_boundary_conditions(
            mesh, env={"k": k_new, "nu": nu})

        new_state = dict(k=k_new, epsilon=eps_new, v2=v2_new, f=f_new,
                         nut=nut_new)
        perf = {"epsilon": eps_perf[0], "k": k_perf[0],
                "f": f_perf[0], "v2": v2_perf[0]}
        return new_state, perf


def simple_filter(mesh, cell_data):
    """LES test filter (reference: LESfilters/simpleFilter/
    simpleFilter.C:69-76): surfaceSum(magSf*interp(phi)) /
    surfaceSum(magSf) with zero-order boundary extrapolation."""
    b = jnp.take(cell_data, mesh.owner[mesh.n_internal:], axis=0)
    w = mesh.weights.reshape((-1,) + (1,) * (cell_data.ndim - 1))
    own = jnp.take(cell_data, mesh.owner[:mesh.n_internal], axis=0)
    nei = jnp.take(cell_data, mesh.neighbour, axis=0)
    face = jnp.concatenate([w * own + (1.0 - w) * nei, b], axis=0)
    msf = mesh.mag_sf.reshape((-1,) + (1,) * (cell_data.ndim - 1))
    num = fvc.surface_sum_faces(mesh, face * msf, signed=False)
    den = fvc.surface_sum_faces(mesh, mesh.mag_sf, signed=False)
    return num / den.reshape((-1,) + (1,) * (cell_data.ndim - 1))


def les_delta(case, coeffs):
    """LESdelta selector (reference: LESdeltas/): cubeRootVol (default),
    maxDeltaxyz, smooth (bounded ratio between neighbours), Prandtl
    (min(cubeRootVol, kappa*y/Cdelta)); vanDriest falls back to Prandtl
    (its y+ damping needs the wall shear each step)."""
    c = coeffs or Dictionary()
    mesh = case.mesh
    name = c.word("delta", "cubeRootVol")
    delta_coeff = c.scalar("deltaCoeff", 1.0)
    base = delta_coeff * jnp.cbrt(mesh.V)
    if name in ("cubeRootVol",):
        return base
    if name == "maxDeltaxyz":
        cf = jnp.take(mesh.Cf, mesh.cell_faces, axis=0)
        d = jnp.abs(cf - mesh.C[:, None, :])
        active = jnp.abs(mesh.cell_sign)[:, :, None]
        return 2.0 * (d * active).max((1, 2))
    if name == "smooth":
        sub = c.subdict("smoothCoeffs", required=False) or Dictionary()
        ratio = sub.scalar("maxDeltaRatio", 1.1)
        return fvc.smooth(mesh, base, 1.0 / ratio, sweeps=8)
    if name in ("Prandtl", "vanDriest"):
        sub = c.subdict(name + "Coeffs", required=False) or Dictionary()
        kappa = sub.scalar("kappa", 0.41)
        cdelta = sub.scalar("Cdelta", 0.158)
        y = wall_distance(case)
        return jnp.minimum(base, kappa * y / cdelta)
    return base


@register("LESModel", "dynOneEqEddy", "homogeneousDynOneEqEddy")
class DynOneEqEddy(OneEqEddy):
    """Dynamic one-equation SGS model (reference:
    incompressible/LES/dynOneEqEddy/dynOneEqEddy.C:46-172): ck and ce
    computed each step from the Germano identity with the simple test
    filter; nuSgs = ck*sqrt(k)*delta."""

    def __init__(self, case, coeffs: Dictionary):
        super().__init__(case, coeffs)
        self.delta = les_delta(case, coeffs)

    def _dyn_coeffs(self, mesh, U, k, nut, nu):
        d = self.delta
        u = U.data
        filt_u = simple_filter(mesh, u)
        uu = u[:, :, None] * u[:, None, :]
        filt_uu = simple_filter(mesh, uu)
        kk = 0.5 * (jnp.trace(filt_uu, axis1=1, axis2=2)
                    - (filt_u * filt_u).sum(-1))
        kk = jnp.maximum(kk, 1e-20)

        g = fvc.grad(mesh, U)
        D = 0.5 * (g.data + jnp.swapaxes(g.data, 1, 2))
        filt_d = simple_filter(mesh, D)
        ll_raw = filt_uu - filt_u[:, :, None] * filt_u[:, None, :]
        tr = jnp.trace(ll_raw, axis1=1, axis2=2)
        ll_dev = ll_raw - (tr / 3.0)[:, None, None] \
            * jnp.eye(3, dtype=u.dtype)
        LL = simple_filter(mesh, ll_dev)
        MM = simple_filter(
            mesh, -2.0 * d[:, None, None] * jnp.sqrt(kk)[:, None, None]
            * filt_d)
        ck = simple_filter(mesh, 0.5 * (LL * MM).sum((-2, -1))) \
            / (simple_filter(mesh, (MM * MM).sum((-2, -1))) + 1e-30)
        ck = jnp.maximum(ck, 0.0)

        nu_c = nu.value if isinstance(nu, Dimensioned) else nu.data
        nu_eff = nut.data + nu_c
        d2 = (D * D).sum((-2, -1))
        ce = simple_filter(
            mesh, nu_eff * (simple_filter(mesh, d2)
                            - (filt_d * filt_d).sum((-2, -1)))) \
            / (simple_filter(mesh, kk ** 1.5 / (2.0 * d)) + 1e-30)
        ce = jnp.maximum(ce, 0.0)
        return ck, ce

    def correct(self, mesh, state, U, phi, nu, dt=None):
        k, nut = state["k"], state["nut"]
        if dt is not None:
            k = k.store_old()
        ddt_scheme = "steadyState" if dt is None else self.ddt_scheme
        ck, ce = self._dyn_coeffs(mesh, U, k, nut, nu)

        s2 = magsqr_symm_grad(mesh, U)
        G = nut.data * s2
        d_k = self._dcoeff(mesh, state, nu, 1.0)
        k_pos = jnp.maximum(k.data, self.k_min)
        rhs_k = k.with_calculated_bcs(
            G, jnp.zeros_like(k.bvalues),
            k.dims / DimensionSet.of(0, 0, 1))
        k_eqn = (fvm.ddt(mesh, k, (1.0 if dt is None else dt),
                         ddt_scheme)
                 + fvm.div(mesh, phi, k, self.div_k)
                 - fvm.laplacian(mesh, d_k, k, self.lap_corr)
                 + fvm.Sp(mesh, Dimensioned(
                     "ce*sqrt(k)/delta", _RTIME,
                     ce * jnp.sqrt(k_pos) / self.delta), k))
        k_new, k_perf = solve(mesh, k_eqn.equals(rhs_k),
                              self.k_controls, env={"phi": phi})
        k_new = bound(k_new, self.k_min)
        nut_data = ck * jnp.sqrt(k_new.data) * self.delta
        nut_new = nut.replace(data=nut_data) \
            .correct_boundary_conditions(mesh, env={"k": k_new,
                                                    "nu": nu})
        return dict(k=k_new, nut=nut_new), {"k": k_perf[0]}


class CompressibleTurbulence:
    """Compressible adapter over the incompressible model zoo
    (reference: src/turbulenceModels/compressible/{RAS,LES} — the
    rho-weighted forms of the same models; muEff = mu + mut,
    alphaEff = alpha + mut/Prt with mut = rho*nut).

    TPU-first simplification: the turbulence transport equations are
    solved in kinematic form with the volumetric flux phi/rho_f and
    nu = mu/rho (exact for solenoidal-density regions; the drho/dt
    transport corrections of the reference's rho-weighted forms are
    dropped). The momentum/energy coupling uses the full mut."""

    def __init__(self, case, U, prt: float = 1.0):
        self.inner = make_ras_model(case, U)
        self.prt = prt

    @property
    def laminar(self) -> bool:
        return isinstance(self.inner, Laminar)

    def init_state(self, U):
        return self.inner.init_state(U)

    def correct(self, mesh, state, U, phi_mass, rho, nu: VolField,
                dt=None):
        if self.laminar:
            return state, {}
        rho_f = fvc.face_values(mesh, rho)
        from ..fields.field import SurfaceField
        phi_vol = SurfaceField(
            phi_mass.data / jnp.maximum(rho_f, 1e-10),
            phi_mass.dims / rho.dims, "phiByRho")
        return self.inner.correct(mesh, state, U, phi_vol, nu, dt=dt)

    def mut_faces(self, mesh, state, rho_f):
        """Face eddy viscosity rho_f * nut_f, or None (laminar)."""
        if self.laminar:
            return None
        nut = self.inner.nut(state)
        if nut is None:
            return None
        nut_f = fvc.face_values(mesh, nut)
        return rho_f * jnp.maximum(nut_f, 0.0)
