"""Multichip execution: the full solver step under shard_map.

The single-chip PISO step (solvers.icofoam.piso_step) runs unchanged on
each shard of a 1-D slab decomposition; distribution enters only through
the hooks: halo ppermute ghost refresh + masked-psum global reductions —
the TPU equivalents of the reference's processorFvPatchField halo and
MPI allReduce (SURVEY.md §5.8).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..fields.field import Dimensioned
from ..mesh.mesharrays import MeshArrays
from ..ops import fvc
from ..solvers.icofoam import piso_step
from .decompose import (Decomposition, HaloSpec, _exchange,
                        collect_vol_field, decompose, decompose_slab,
                        decompose_vol_field)
from .hooks import distributed

AXIS = "x"


def _local_view(tree):
    """Strip the leading (1,) shard axis shard_map leaves on each array."""
    return jax.tree_util.tree_map(lambda a: a[0], tree)


def make_distributed_step(dec: Decomposition, device_mesh: Mesh, nu,
                          step_kwargs: dict, block_gamg: bool = True):
    """Build a pjit-ed distributed PISO step over the device mesh.

    Inputs/outputs are the stacked (P, ...) pytrees from decompose_*;
    scalars (dt, stats) are replicated. block_gamg pre-builds per-shard
    owned-block agglomeration hierarchies so `solver GAMG` /
    `preconditioner GAMG` work under shard_map (block-Jacobi multigrid;
    see parallel.dist_gamg).
    """
    lm = dec.mesh
    blk_levels, gcoarse = [], None
    if block_gamg:
        from .dist_gamg import build_block_hierarchies
        blk_levels, gcoarse = build_block_hierarchies(dec)

    def shard_body(mesh_arrays, halo, blk, gc, U, p, phi_data, dt,
                   ref_cell, ref_weight):
        mesh_l: MeshArrays = _local_view(mesh_arrays)
        halo_l: HaloSpec = _local_view(halo)
        blk_l = _local_view(blk)
        gc_l = _local_view(gc) if gc is not None else None
        U_l = _local_view(U)
        p_l = _local_view(p)
        phi_l = _local_view(phi_data)
        own = halo_l.own_mask

        def halo_fn(x):
            return _exchange(x, halo_l, AXIS)

        def gsum_fn(x):
            m = own.reshape(own.shape + (1,) * (x.ndim - 1))
            return jax.lax.psum((x * m).sum(axis=0), AXIS)

        def gmax_fn(x):
            m = own > 0.5
            neg = jnp.full_like(x, -jnp.inf)
            return jax.lax.pmax(jnp.where(m, x, neg).max(), AXIS)

        phi_f = phi_l  # already a SurfaceField (pytree-mapped local view)
        # empty levels (shards at/below coarsest size) still take the
        # block path: the V-cycle degenerates to masked block smoothing
        gamg_blk = (blk_l, own, gc_l) if block_gamg else None

        def psum_fn(x):
            return jax.lax.psum(x, AXIS)

        with distributed(halo_fn, gsum_fn, gmax_fn, gamg_block=gamg_blk,
                         psum_fn=psum_fn):
            # ghosts of the inputs must be fresh before the first gather
            U_l = U_l.replace(data=halo_fn(U_l.data))
            p_l = p_l.replace(data=halo_fn(p_l.data))
            U2, p2, phi2, stats = piso_step(
                mesh_l, U_l, p_l, phi_f, dt, nu,
                p_ref_cell=ref_cell[0], p_ref_weight=ref_weight[0],
                **step_kwargs)

        expand = jax.tree_util.tree_map(lambda a: a[None], (U2, p2,
                                                            phi2.data))
        return expand + (stats,)

    from jax import shard_map
    specs_in = (P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS),
                P(AXIS), P(), P(AXIS), P(AXIS))
    specs_out = (P(AXIS), P(AXIS), P(AXIS), P())

    smapped = shard_map(shard_body, mesh=device_mesh,
                        in_specs=specs_in, out_specs=specs_out,
                        check_vma=False)
    step = jax.jit(smapped)

    def run(mesh_arrays, halo, U, p, phi, dt, ref_cell, ref_weight):
        return step(mesh_arrays, halo, blk_levels, gcoarse, U, p, phi,
                    dt, ref_cell, ref_weight)
    return run


def dryrun_piso_step(n_devices: int, n: int = 16, check: bool = True,
                     x64: bool = False, method: str = "slab",
                     **case_kwargs):
    """Decompose a cavity over n_devices, run ONE full PISO step under
    shard_map, and (optionally) check the result against the single-chip
    step. case_kwargs forward to cavity_case (p_solver / p_precond /
    u_solver / u_precond) so the GAMG paths can be exercised too.

    x64=True runs the whole check in fp64 with round-off-tight linear
    tolerances, making the single-chip result solver-independent; the
    8-dev == 1-chip comparison then asserts at 1e-5 (VERDICT round-1
    item 3c)."""
    import tempfile

    from ..solvers.case import Case
    from ..solvers import icofoam
    from ..utils import logging as L
    from ..utils.casegen import cavity_case

    L.Info.enabled = False
    # xla_force_host_platform_device_count is ignored by newer jax; request
    # CPU devices via config BEFORE the first backend query (jax.devices()
    # itself initializes the backend and freezes the count)
    try:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", max(
            n_devices, jax.config.jax_num_cpu_devices or 0))
    except Exception:
        pass
    devices = jax.devices()
    if len(devices) < n_devices:
        raise RuntimeError(
            f"need {n_devices} devices, have {len(devices)} "
            f"(set XLA_FLAGS=--xla_force_host_platform_device_count or "
            f"run before backend init)")
    device_mesh = Mesh(np.array(devices[:n_devices]), (AXIS,))

    if x64:
        jax.config.update("jax_enable_x64", True)
        case_kwargs.setdefault("tight_tol", True)

    d = tempfile.mkdtemp(prefix="dryrun_cavity_")
    cavity_case(d, n=n, **case_kwargs)
    case = Case(d)
    nu = Dimensioned.from_entry(
        case.transport_properties().lookup("nu", required=True), "nu")

    U = case.read_field("U")
    p = case.read_field("p")
    phi = fvc.flux(case.mesh, U)
    dt = case.time.delta_t

    step_kwargs = dict(
        div_scheme=case.div_scheme("div(phi,U)"),
        lap_corr=case.laplacian_scheme(),
        u_controls=case.solver_controls("U"),
        p_controls=case.solver_controls("p"),
        p_final_controls=case.solver_controls("p", final=True),
        n_correctors=2, n_non_orth=0, p_ref_value=0.0)

    dec = decompose(case.mesh, n_devices, method=method)
    U_s = decompose_vol_field(dec, U, case.mesh)
    p_s = decompose_vol_field(dec, p, case.mesh)
    # face fluxes: scatter per device via the decomposition's face maps
    phi_s = _decompose_phi(dec, case.mesh, np.asarray(phi.data))

    ref_dev, ref_loc = dec.local_cell_of_global(0)
    ref_cell = np.zeros((n_devices, 1), np.int32)
    ref_weight = np.zeros((n_devices, 1))
    ref_cell[ref_dev, 0] = ref_loc
    ref_weight[ref_dev, 0] = 1.0

    dist_step = make_distributed_step(dec, device_mesh, nu, step_kwargs)
    U2s, p2s, phi2s, stats = dist_step(
        dec.mesh, dec.halo, U_s, p_s, phi_s, dt,
        jnp.asarray(ref_cell), jnp.asarray(ref_weight))
    jax.block_until_ready(p2s.data)
    print(f"dryrun_multichip: {n_devices}-device step OK; "
          f"p residual {float(stats['p_perf'][-1][0]):.3g} -> "
          f"{float(stats['p_perf'][-1][1]):.3g} "
          f"in {int(stats['p_perf'][-1][2])} iters")

    if check:
        step = icofoam.make_step(case, nu, 2, 0, 0, 0.0)
        U1, p1, phi1, stats1 = step(U, p, phi, dt)
        p_dist = collect_vol_field(dec, p2s.data)
        u_dist = collect_vol_field(dec, U2s.data)
        perr = np.abs(p_dist - dec.compact_global(p1.data)).max()
        uerr = np.abs(u_dist - dec.compact_global(U1.data)).max()
        print(f"dryrun_multichip: max|p_dist-p_1chip|={perr:.3e}, "
              f"max|U_dist-U_1chip|={uerr:.3e}")
        scale = max(1.0, float(np.abs(dec.compact_global(p1.data)).max()))
        # fp32 runs legitimately diverge at the Krylov-iteration level
        # (different reduction orders); fp64 must agree tightly
        tol = 1e-5 if np.asarray(p1.data).dtype == np.float64 else 5e-3
        if not (perr < tol * scale and uerr < tol):
            raise AssertionError(
                f"distributed step diverges from single-chip: "
                f"p {perr}, U {uerr}")
    return stats


def make_distributed_simple_step(dec: Decomposition, device_mesh: Mesh,
                                 step_kwargs: dict,
                                 block_gamg: bool = True):
    """Distributed simpleFoam iteration (solvers.simplefoam.simple_step
    under shard_map). turb_state is a dict of decomposed VolFields."""
    from ..solvers.simplefoam import simple_step
    blk_levels, gcoarse = [], None
    if block_gamg:
        from .dist_gamg import build_block_hierarchies
        blk_levels, gcoarse = build_block_hierarchies(dec)

    def shard_body(mesh_arrays, halo, blk, gc, U, p, phi_data,
                   turb_state, ref_cell, ref_weight):
        mesh_l: MeshArrays = _local_view(mesh_arrays)
        halo_l: HaloSpec = _local_view(halo)
        blk_l = _local_view(blk)
        gc_l = _local_view(gc) if gc is not None else None
        U_l = _local_view(U)
        p_l = _local_view(p)
        phi_l = _local_view(phi_data)
        ts_l = _local_view(turb_state)
        own = halo_l.own_mask

        def halo_fn(x):
            return _exchange(x, halo_l, AXIS)

        def gsum_fn(x):
            m = own.reshape(own.shape + (1,) * (x.ndim - 1))
            return jax.lax.psum((x * m).sum(axis=0), AXIS)

        def gmax_fn(x):
            m = own > 0.5
            neg = jnp.full_like(x, -jnp.inf)
            return jax.lax.pmax(jnp.where(m, x, neg).max(), AXIS)

        kw = dict(step_kwargs, p_ref_cell=ref_cell[0],
                  p_ref_weight=ref_weight[0])
        gamg_blk = (blk_l, own, gc_l) if block_gamg else None

        def psum_fn(x):
            return jax.lax.psum(x, AXIS)

        with distributed(halo_fn, gsum_fn, gmax_fn, gamg_block=gamg_blk,
                         psum_fn=psum_fn):
            U_l = U_l.replace(data=halo_fn(U_l.data))
            p_l = p_l.replace(data=halo_fn(p_l.data))
            ts_l = {k: v.replace(data=halo_fn(v.data))
                    for k, v in ts_l.items()}
            U2, p2, phi2, ts2, stats = simple_step(
                mesh_l, U_l, p_l, phi_l, ts_l, **kw)

        expand = jax.tree_util.tree_map(
            lambda a: a[None], (U2, p2, phi2.data, ts2))
        return expand + (stats,)

    from jax import shard_map
    specs_in = (P(AXIS),) * 10
    specs_out = (P(AXIS), P(AXIS), P(AXIS), P(AXIS), P())

    smapped = shard_map(shard_body, mesh=device_mesh,
                        in_specs=specs_in, out_specs=specs_out,
                        check_vma=False)
    step = jax.jit(smapped)

    def run(mesh_arrays, halo, U, p, phi, turb_state, ref_cell,
            ref_weight):
        return step(mesh_arrays, halo, blk_levels, gcoarse, U, p, phi,
                    turb_state, ref_cell, ref_weight)
    return run


def dryrun_simple_step(n_devices: int, scale: int = 1, check: bool = True,
                       x64: bool = True, model: str = "kEpsilon",
                       method: str = "slab", case_kind: str = "pitz"):
    """Decompose the pitzDaily-style case over n_devices, run ONE SIMPLE
    iteration (kEpsilon + wall functions + GAMG pressure) under
    shard_map, and check against the single-chip step (fp64, 1e-5).
    case_kind='nonlattice' substitutes the curved graded polyhedral
    duct (utils.unstructured curve/grade — detect_lattice rejects it),
    exercising the general ELL/gather path under decomposition."""
    import tempfile

    from ..models.transport import SinglePhaseTransportModel
    from ..models.turbulence import make_ras_model
    from ..solvers import simplefoam
    from ..solvers.case import Case
    from ..solvers.controls import SimpleControl
    from ..utils import logging as L
    from ..utils.casegen import pitz_daily_case

    L.Info.enabled = False
    if x64:
        jax.config.update("jax_enable_x64", True)
    try:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", max(
            n_devices, jax.config.jax_num_cpu_devices or 0))
    except Exception:
        pass
    devices = jax.devices()
    device_mesh = Mesh(np.array(devices[:n_devices]), (AXIS,))

    if case_kind == "nonlattice":
        from ..utils.unstructured import (detect_lattice,
                                          unstructured_channel_case)
        d = tempfile.mkdtemp(prefix="dryrun_nonlat_")
        pmesh = unstructured_channel_case(
            d, nx=16 * scale, ny=8 * scale, nz=8 * scale,
            end_time=10**9, perturb=0.12, merge_fraction=0.04, seed=3,
            write_mesh=False, curve=1.2, grade=3.0, model=model,
            p_rel_tol=0.0)
        assert detect_lattice(pmesh) is None
        case = Case(d, pmesh=pmesh)
        assert case.mesh.gdia is None
    else:
        d = tempfile.mkdtemp(prefix="dryrun_pitz_")
        pitz_daily_case(d, scale=scale, model=model, tight_tol=x64)
        case = Case(d)
    U = case.read_field("U")
    p = case.read_field("p")
    phi = fvc.flux(case.mesh, U)
    transport = SinglePhaseTransportModel(case.transport_properties())
    turb = make_ras_model(case, U)
    turb_state = turb.init_state(U)
    simple = SimpleControl(case)
    kw = simplefoam.step_kwargs_from_case(case, simple, transport, turb)

    dec = decompose(case.mesh, n_devices, method=method)
    y_glob = getattr(turb, "y", None)
    if y_glob is not None:
        # wall-distance-consuming models (kOmegaSST, SA family) hold a
        # globally-computed y; attach the per-shard slice to the local
        # mesh pytree (incl. halo cells — cells_of covers both)
        import dataclasses as _dc
        y_g = dec.compact_global(np.asarray(y_glob))
        ystk = np.ones((n_devices, dec.mesh.n_cells), y_g.dtype)
        for dd in range(n_devices):
            cells = np.asarray(dec.cells_of[dd])
            ystk[dd, :len(cells)] = y_g[cells]
        dec = _dc.replace(dec, mesh=_dc.replace(
            dec.mesh, wall_dist=jnp.asarray(ystk)))
    U_s = decompose_vol_field(dec, U, case.mesh)
    p_s = decompose_vol_field(dec, p, case.mesh)
    phi_s = _decompose_phi(dec, case.mesh, np.asarray(phi.data))
    ts_s = {k: decompose_vol_field(dec, v, case.mesh)
            for k, v in turb_state.items()}

    ref_dev, ref_loc = dec.local_cell_of_global(simple.p_ref_cell)
    ref_cell = np.zeros((n_devices, 1), np.int32)
    ref_weight = np.zeros((n_devices, 1))
    ref_cell[ref_dev, 0] = ref_loc
    ref_weight[ref_dev, 0] = 1.0

    dist_step = make_distributed_simple_step(dec, device_mesh, kw)
    U2s, p2s, phi2s, ts2s, stats = dist_step(
        dec.mesh, dec.halo, U_s, p_s, phi_s, ts_s,
        jnp.asarray(ref_cell), jnp.asarray(ref_weight))
    jax.block_until_ready(p2s.data)
    print(f"dryrun_simple: {n_devices}-device SIMPLE step OK; "
          f"p residual {float(stats['p_perf'][-1][0]):.3g} -> "
          f"{float(stats['p_perf'][-1][1]):.3g} "
          f"in {int(stats['p_perf'][-1][2])} iters")

    if check:
        step = simplefoam.make_step(case, transport, turb, simple)
        U1, p1, phi1, ts1, _ = step(U, p, phi, turb_state)
        perr = np.abs(collect_vol_field(dec, p2s.data)
                      - dec.compact_global(p1.data)).max()
        uerr = np.abs(collect_vol_field(dec, U2s.data)
                      - dec.compact_global(U1.data)).max()
        terr = max(np.abs(collect_vol_field(dec, ts2s[k].data)
                          - dec.compact_global(ts1[k].data)).max()
                   for k in ts1)
        print(f"dryrun_simple: max|p-p_1chip|={perr:.3e}, "
              f"max|U-U_1chip|={uerr:.3e}, max|turb-turb_1chip|="
              f"{terr:.3e}")
        scale_p = max(1.0, float(np.abs(dec.compact_global(p1.data)).max()))
        tol = 1e-5 if np.asarray(p1.data).dtype == np.float64 else 5e-3
        if not (perr < tol * scale_p and uerr < tol * 10 and terr < tol * 10):
            raise AssertionError(
                f"distributed SIMPLE step diverges from single-chip: "
                f"p {perr}, U {uerr}, turb {terr}")
    return stats


def _decompose_phi(dec: Decomposition, gmesh: MeshArrays,
                   phi_g: np.ndarray):
    """Scatter a global face field into the stacked local face layout."""
    from ..fields.field import SurfaceField
    from ..utils.dimensions import dim_flux
    P_ = dec.n_devices
    lm = dec.mesh
    if dec.src_face is not None:
        # gdia source: padded-plane face layout -> raw face layout
        # (same orientation, so pure indexing)
        phi_g = phi_g[dec.src_face]
    out = np.zeros((P_, lm.n_faces), phi_g.dtype)
    for d in range(P_):
        gf = dec.face_map[d]
        valid = gf >= 0
        out[d, valid] = phi_g[gf[valid]]
    return SurfaceField(jnp.asarray(out), dim_flux, "phi")
