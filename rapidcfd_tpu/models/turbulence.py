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
from ..utils.dimensions import DimensionSet, dim_viscosity

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
    """Standard k-epsilon (reference: incompressible/RAS/kEpsilon)."""
    needs = ("k", "epsilon", "nut")

    def __init__(self, case, coeffs: Dictionary):
        self.case = case
        c = coeffs or Dictionary()
        self.Cmu = c.scalar("Cmu", 0.09)
        self.C1 = c.scalar("C1", 1.44)
        self.C2 = c.scalar("C2", 1.92)
        self.sigma_eps = c.scalar("sigmaEps", 1.3)
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
            G = G.at[cells].set(g_w)
            fix = fix.at[cells].set(1.0)
            eps_vals = eps_vals.at[cells].set(eps_w)
        return G, fix, eps_vals

    def correct(self, mesh, state, U, phi, nu, dt=None):
        """One turbulence correction (reference kEpsilon.C:229-280).
        dt=None -> steadyState ddt."""
        k, eps, nut = state["k"], state["epsilon"], state["nut"]
        s2 = magsqr_symm_grad(mesh, U)
        G = nut.data * s2                      # production [m2/s3]
        G, eps_fix, eps_vals = self._wall_fix(mesh, state, U, nu, G)

        nu_eff_eps = self._dcoeff(mesh, state, nu, self.sigma_eps)
        nu_eff_k = self._dcoeff(mesh, state, nu, 1.0)
        ddt_scheme = "steadyState" if dt is None else self.ddt_scheme

        # epsilon equation
        eps_dims = eps.dims * DimensionSet.of(0, 3) / DimensionSet.of(0, 0, 1)
        rhs_eps = eps.with_calculated_bcs(
            self.C1 * G * eps.data / jnp.maximum(k.data, self.k_min),
            jnp.zeros_like(eps.bvalues), eps.dims / DimensionSet.of(0, 0, 1))
        eps_eqn = (fvm.ddt(mesh, eps, dt or 1.0, ddt_scheme)
                   + fvm.div(mesh, phi, eps, self.div_eps)
                   - fvm.laplacian(mesh, nu_eff_eps, eps, self.lap_corr)
                   + fvm.Sp(mesh, Dimensioned(
                       "C2*eps/k", _RTIME,
                       self.C2 * eps.data
                       / jnp.maximum(k.data, self.k_min)), eps))
        eps_eqn = eps_eqn.equals(rhs_eps)
        eps_eqn = eps_eqn.relax(mesh, self.eps_relax)
        eps_eqn = eps_eqn.set_values(mesh, eps_fix, eps_vals)
        eps_new, eps_perf = solve(mesh, eps_eqn, self.eps_controls)
        eps_new = bound(eps_new, self.eps_min)

        # k equation
        rhs_k = k.with_calculated_bcs(
            G, jnp.zeros_like(k.bvalues),
            k.dims / DimensionSet.of(0, 0, 1))
        k_eqn = (fvm.ddt(mesh, k, dt or 1.0, ddt_scheme)
                 + fvm.div(mesh, phi, k, self.div_k)
                 - fvm.laplacian(mesh, nu_eff_k, k, self.lap_corr)
                 + fvm.Sp(mesh, Dimensioned(
                     "eps/k", _RTIME,
                     eps_new.data / jnp.maximum(k.data, self.k_min)), k))
        k_eqn = k_eqn.equals(rhs_k)
        k_eqn = k_eqn.relax(mesh, self.k_relax)
        k_new, k_perf = solve(mesh, k_eqn, self.k_controls)
        k_new = bound(k_new, self.k_min)

        # nut update + wall functions
        nut_data = self.Cmu * k_new.data ** 2 \
            / jnp.maximum(eps_new.data, self.eps_min)
        nut_new = nut.replace(data=nut_data).correct_boundary_conditions(
            mesh, env={"k": k_new, "nu": nu})

        new_state = dict(k=k_new, epsilon=eps_new, nut=nut_new)
        perf = {"k": k_perf[0], "epsilon": eps_perf[0]}
        return new_state, perf

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
