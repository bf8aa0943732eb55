"""chtMultiRegionFoam — conjugate heat transfer over coupled regions.

Capability parity with the reference solver (reference:
applications/solvers/heatTransfer/chtMultiRegionFoam: per-region meshes
at constant/<region>/polyMesh, solveFluid.H/solveSolid.H, coupled via
mappedWall patches with turbulentTemperatureCoupledBaffleMixed on T):
fluid regions run the transient Boussinesq buoyant step and solid
regions the conduction equation rho*Cp*ddt(T) = laplacian(kappa, T);
the interface temperature uses the mixed coupled-baffle closure
T_f = (kD_own T_own + kD_nbr T_nbr)/(kD_own + kD_nbr) refreshed from
the neighbour region every time step (partitioned coupling).

Simplification vs the reference: fluid regions use the Boussinesq
(buoyantBoussinesqPimpleFoam) equations rather than the full-density
psi-thermo set; the multi-region/mapped-patch machinery is identical.
"""

from __future__ import annotations

import os

import numpy as np

import jax
import jax.numpy as jnp

from ..fields.bcs import Mixed
from ..fields.field import Dimensioned, VolField
from ..linalg import solve
from ..ops import fvc, fvm
from ..utils.dictionary import Dictionary, parse_file
from ..utils.dimensions import DimensionSet
from ..utils.logging import ExecutionTimer, info, log_solve
from ..utils.registry import register
from ..utils.timecontrol import Time
from .case import Case
from .controls import PimpleControl

_DIFF = DimensionSet.of(0, 2, -1)


@register("fvPatchField", "compressible::turbulentTemperatureCoupledBaffleMixed",
          "turbulentTemperatureCoupledBaffleMixed")
class CoupledTemperatureMixed(Mixed):
    """Coupled-baffle temperature interface (reference: turbulent
    TemperatureCoupledBaffleMixed...C): a mixed BC whose refValue /
    valueFraction are refreshed from the neighbour region's mapped
    patch by the multi-region driver. Before the first refresh (field
    construction) it behaves as fixedValue at the stored 'value'."""
    preserves_type = True

    def _norm(self, bd, psi_c):
        if "refValue" in bd:
            return bd
        v = bd.get("value", psi_c)
        return dict(refValue=jnp.broadcast_to(v, psi_c.shape),
                    refGradient=jnp.zeros_like(psi_c),
                    valueFraction=jnp.ones_like(psi_c))

    def evaluate(self, mesh, patch, field, bd, env=None):
        psi_c = field.patch_internal(mesh, patch)
        return Mixed.evaluate(self, mesh, patch, field,
                              self._norm(bd, psi_c), env)

    def value_internal_coeff(self, mesh, patch, field, bd, env=None):
        psi_c = field.patch_internal(mesh, patch)
        return Mixed.value_internal_coeff(self, mesh, patch, field,
                                          self._norm(bd, psi_c), env)

    def gradient_internal_coeff(self, mesh, patch, field, bd, env=None):
        psi_c = field.patch_internal(mesh, patch)
        return Mixed.gradient_internal_coeff(self, mesh, patch, field,
                                             self._norm(bd, psi_c), env)


def _read_region_properties(case_dir: str):
    rp = parse_file(os.path.join(case_dir, "constant",
                                 "regionProperties"))
    entry = rp.lookup("regions", required=True)
    fluids, solids = [], []
    items = list(entry)
    i = 0
    while i < len(items) - 1:
        kind = str(items[i])
        names = [str(x) for x in items[i + 1]]
        (fluids if kind == "fluid" else solids).extend(names)
        i += 2
    return fluids, solids


def _match_patches(case_a: Case, patch_a, case_b: Case, patch_b):
    """Face map between conforming mapped patches (KD-tree on centres):
    returns indices into case_b's patch faces for each case_a face."""
    from scipy.spatial import cKDTree
    cfa = np.asarray(case_a.mesh.patch_cf(patch_a))
    cfb = np.asarray(case_b.mesh.patch_cf(patch_b))
    d, j = cKDTree(cfb).query(cfa)
    if np.unique(j).size != j.size:
        raise ValueError(
            f"mappedWall {patch_a.name}: face matching not one-to-one")
    return j


class _SolidRegion:
    def __init__(self, case: Case, steady: bool = False):
        self.case = case
        tp = case.transport_properties()
        self.rho = Dimensioned.from_entry(
            tp.lookup("rho", required=True)).value
        self.cp = Dimensioned.from_entry(
            tp.lookup("Cp", required=True)).value
        self.kappa = Dimensioned.from_entry(
            tp.lookup("kappa", required=True)).value
        self.alpha = self.kappa / (self.rho * self.cp)
        self.T = case.read_field("T").store_old()
        self.controls = case.solver_controls("T")
        self.lap_corr = case.laplacian_scheme()
        mesh = case.mesh
        alpha = self.alpha

        if steady:
            # solveSolid.H steady form: laplacian(alpha, T) == 0
            @jax.jit
            def step(T, dt):
                eqn = -1.0 * fvm.laplacian(
                    mesh, Dimensioned("alpha", _DIFF, alpha), T,
                    self.lap_corr)
                return solve(mesh, eqn, self.controls)
        else:
            @jax.jit
            def step(T, dt):
                T = T.store_old()
                eqn = fvm.ddt(mesh, T, dt) - fvm.laplacian(
                    mesh, Dimensioned("alpha", _DIFF, alpha), T,
                    self.lap_corr)
                return solve(mesh, eqn, self.controls)

        self.step = step

    def kappa_delta(self, patch):
        return self.kappa / np.asarray(
            1.0 / self.case.mesh.patch_delta_coeffs(patch))


class _FluidRegion:
    def __init__(self, case: Case, steady: bool = False):
        from ..models.transport import SinglePhaseTransportModel
        from ..models.turbulence import make_ras_model
        from .buoyantfoam import make_pimple_step, make_step
        self.case = case
        tp = case.transport_properties()
        self.beta = Dimensioned.from_entry(
            tp.lookup("beta", required=True)).value
        t_ref = Dimensioned.from_entry(
            tp.lookup("TRef", required=True)).value
        pr = Dimensioned.from_entry(tp.lookup("Pr", required=True)).value
        prt = Dimensioned.from_entry(
            tp.lookup("Prt", required=True)).value
        self.nu = Dimensioned.from_entry(
            tp.lookup("nu", required=True)).value
        self.pr = pr
        self.rho_ref = Dimensioned.from_entry(
            tp.lookup("rhoRef")).value \
            if tp.lookup("rhoRef") is not None else 1.2
        self.cp_ref = Dimensioned.from_entry(
            tp.lookup("CpRef")).value \
            if tp.lookup("CpRef") is not None else 1005.0
        gpath = os.path.join(case.dir, "constant", "g")
        g = [float(x) for x in parse_file(gpath).lookup("value")] \
            if os.path.isfile(gpath) else [0.0, -9.81, 0.0]
        self.U = case.read_field("U")
        self.p_rgh = case.read_field("p_rgh")
        self.T = case.read_field("T")
        self.phi = jax.jit(lambda u: fvc.flux(case.mesh, u))(self.U)
        transport = SinglePhaseTransportModel(tp)
        self.turb = make_ras_model(case, self.U)
        self.turb_state = self.turb.init_state(self.U)
        self.steady = steady
        if steady:
            from .controls import SimpleControl
            simple = SimpleControl(case)
            simple_step = make_step(case, transport, self.turb, simple,
                                    (self.beta, t_ref, pr, prt, g))
            # uniform signature: steady step ignores dt
            self.step = (lambda U, p_rgh, T, phi, turb_state, dt:
                         simple_step(U, p_rgh, T, phi, turb_state))
        else:
            ctrl = PimpleControl(case)
            self.step = make_pimple_step(case, transport, self.turb,
                                         ctrl,
                                         (self.beta, t_ref, pr, prt, g))

    def kappa_delta(self, patch):
        # dimensional conductance kappa/delta with
        # kappa = rhoRef*CpRef*nu/Pr (Boussinesq fluids carry kinematic
        # diffusivities; rhoRef/CpRef restore W/mK for flux matching)
        kappa = self.rho_ref * self.cp_ref * self.nu / self.pr
        return kappa / np.asarray(
            1.0 / self.case.mesh.patch_delta_coeffs(patch))


def run(case_dir: str, write: bool = True, max_steps: int | None = None,
        steady: bool = False):
    """steady=True gives chtMultiRegionSimpleFoam (reference:
    heatTransfer/chtMultiRegionFoam/chtMultiRegionSimpleFoam/): fluid
    regions run the steady buoyant SIMPLE sweep and solid regions the
    steady conduction equation; couplings are identical."""
    fluids, solids = _read_region_properties(case_dir)
    info(f"Regions: fluid={fluids} solid={solids}\n")
    time = Time(case_dir)
    regions = {}
    for rn in fluids:
        regions[rn] = _FluidRegion(Case(case_dir, region=rn, time=time),
                                   steady=steady)
    for rn in solids:
        regions[rn] = _SolidRegion(Case(case_dir, region=rn, time=time),
                                   steady=steady)

    # mapped couplings: (region, patch, nbr_region, nbr_patch, face map)
    couplings = []
    for rn, reg in regions.items():
        case = reg.case
        extra_by_name = {p.name: p.extra for p in case.pmesh.patches}
        for patch in case.mesh.patches:
            if patch.type not in ("mappedWall", "mappedPatch"):
                continue
            extra = extra_by_name[patch.name]
            nbr_region = str(extra.word("sampleRegion", ""))
            nbr_pname = str(extra.word("samplePatch", ""))
            nbr = regions[nbr_region]
            nbr_patch = next(p for p in nbr.case.mesh.patches
                             if p.name == nbr_pname)
            fmap = _match_patches(case, patch, nbr.case, nbr_patch)
            couplings.append((rn, patch, nbr_region, nbr_patch, fmap))
    info(f"{len(couplings)} mapped couplings\n")

    def refresh_coupled_bcs():
        """turbulentTemperatureCoupledBaffleMixed: refValue = mapped
        neighbour T, valueFraction = kD_nbr/(kD_own + kD_nbr)."""
        for rn, patch, nbr_rn, nbr_patch, fmap in couplings:
            reg, nbr = regions[rn], regions[nbr_rn]
            T = reg.T
            bc = T.bcs[next(i for i, p in enumerate(reg.case.mesh.patches)
                            if p.name == patch.name)]
            if not isinstance(bc, CoupledTemperatureMixed):
                continue
            t_nbr_cells = np.asarray(nbr.T.data)[
                np.asarray(nbr.case.mesh.patch_face_cells(nbr_patch))]
            t_nbr = jnp.asarray(t_nbr_cells[fmap])
            kd_own = reg.kappa_delta(patch)
            kd_nbr = nbr.kappa_delta(nbr_patch)[fmap]
            frac = jnp.asarray(kd_nbr / (kd_own + kd_nbr))
            new_bcdata = []
            for b, bd in zip(T.bcs, T.bcdata):
                if b is bc:
                    nbd = dict(bd)
                    nbd["refValue"] = t_nbr
                    nbd["refGradient"] = jnp.zeros_like(t_nbr)
                    nbd["valueFraction"] = frac
                    new_bcdata.append(nbd)
                else:
                    new_bcdata.append(bd)
            reg.T = T.replace(bcdata=tuple(new_bcdata)) \
                .correct_boundary_conditions(reg.case.mesh)

    timer = ExecutionTimer()
    info("\nStarting time loop\n")
    n = 0
    while time.loop():
        info(f"Time = {time.name}\n")
        refresh_coupled_bcs()
        for rn in fluids:
            reg = regions[rn]
            info(f"Solving for fluid region {rn}\n")
            (reg.U, reg.p_rgh, reg.T, reg.phi, reg.turb_state,
             stats) = reg.step(reg.U, reg.p_rgh, reg.T, reg.phi,
                               reg.turb_state, time.delta_t)
            log_solve("(region)", f"{rn}:T", stats["t_perf"][0][0],
                      stats["t_perf"][0][1], stats["t_perf"][0][2])
        for rn in solids:
            reg = regions[rn]
            info(f"Solving for solid region {rn}\n")
            reg.T, perf = reg.step(reg.T, time.delta_t)
            log_solve(reg.controls.solver, f"{rn}:T", perf[0][0],
                      perf[0][1], perf[0][2])
        timer.log()
        if write and time.write_time():
            for rn in fluids:
                reg = regions[rn]
                reg.case.write_fields([reg.U, reg.p_rgh, reg.T])
            for rn in solids:
                regions[rn].case.write_fields([regions[rn].T])
        n += 1
        if max_steps and n >= max_steps:
            break
    info("End\n")
    return regions
