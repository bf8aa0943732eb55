"""Multichip tests on the virtual 8-device CPU mesh (SURVEY.md §4
implication (c) — the moral equivalent of mpirun -np N on one box)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from rapidcfd_tpu.mesh import build_mesh_arrays, read_polymesh
from rapidcfd_tpu.parallel.decompose import (_exchange, collect_vol_field,
                                             decompose_slab,
                                             decompose_vol_field)
from rapidcfd_tpu.parallel.dryrun import AXIS, _local_view
from rapidcfd_tpu.utils.casegen import cavity_case


@pytest.fixture(scope="module")
def small_cavity(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("pcav"))
    cavity_case(d, n=8)
    mesh_raw = read_polymesh(d)
    ma, _, maps = build_mesh_arrays(mesh_raw)
    return d, ma, maps


def test_decompose_roundtrip(small_cavity):
    d, ma, maps = small_cavity
    from rapidcfd_tpu.fields.io import read_vol_field
    p = read_vol_field(d, "0", "p", ma, maps)
    dec = decompose_slab(ma, 4)
    ps = decompose_vol_field(dec, p, ma)
    back = collect_vol_field(dec, ps.data)
    assert np.abs(back - np.asarray(p.data)).max() == 0.0


def test_halo_exchange_ghost_values(small_cavity):
    d, ma, maps = small_cavity
    np_dev = 4
    dec = decompose_slab(ma, np_dev)
    device_mesh = Mesh(np.array(jax.devices()[:np_dev]), (AXIS,))
    from jax import shard_map

    x0 = np.full((np_dev, dec.mesh.n_cells), -1.0)
    for dd in range(np_dev):
        owned = dec.cells_of[dd][
            :int(np.asarray(dec.halo.own_mask[dd]).sum())]
        x0[dd, :len(owned)] = owned

    def body(halo, x):
        return _exchange(x[0], _local_view(halo), AXIS)[None]

    f = shard_map(body, mesh=device_mesh, in_specs=(P(AXIS), P(AXIS)),
                  out_specs=P(AXIS), check_vma=False)
    x1 = np.asarray(jax.jit(f)(dec.halo, jnp.asarray(x0)))
    for dd in range(np_dev):
        owned = dec.cells_of[dd][
            :int(np.asarray(dec.halo.own_mask[dd]).sum())]
        ghosts = dec.cells_of[dd][len(owned):]
        got = x1[dd, dec.n_own:dec.n_own + len(ghosts)]
        assert np.allclose(got, ghosts)


def test_dryrun_full_step_8dev_matches_single_chip():
    """The flagship multichip check: one full PISO step over 8 shards ==
    the single-chip step to near machine precision."""
    from rapidcfd_tpu.parallel.dryrun import dryrun_piso_step
    stats = dryrun_piso_step(8, n=16, check=True)
    assert np.isfinite(float(stats["p_perf"][-1][1]))


def test_rcb_partition_is_2d_blocks(small_cavity):
    """RCB on a square cavity must produce a genuinely non-slab
    partition: multiple devices share the same x-slab range."""
    from rapidcfd_tpu.parallel.decompose import rcb_partition
    d, ma, maps = small_cavity
    dev = rcb_partition(ma, 4)
    # every device owns a quarter
    assert np.bincount(dev, minlength=4).min() >= ma.n_cells // 4 - 1
    C = np.asarray(ma.C)
    # at least two devices overlap in x (2-D blocks, not x-slabs)
    xr = [(C[dev == dd, 0].min(), C[dev == dd, 0].max())
          for dd in range(4)]
    overlaps = sum(1 for i in range(4) for j in range(i + 1, 4)
                   if xr[i][0] < xr[j][1] and xr[j][0] < xr[i][1])
    assert overlaps >= 2


def test_dryrun_full_step_8dev_rcb_matches_single_chip():
    """General (non-slab) decomposition: an RCB 2-D block partition of
    the cavity over 8 devices reproduces the single-chip step (fp64,
    1e-5) — the processorPolyPatch arbitrary-neighbour-graph equivalent
    (VERDICT r2 item 4)."""
    from rapidcfd_tpu.parallel.dryrun import dryrun_piso_step
    stats = dryrun_piso_step(8, n=16, check=True, x64=True, method="rcb")
    assert np.isfinite(float(stats["p_perf"][-1][1]))


def test_dryrun_simple_step_8dev_rcb_matches_single_chip():
    """RCB partition through the full SIMPLE+kEpsilon+GAMG step."""
    from rapidcfd_tpu.parallel.dryrun import dryrun_simple_step
    dryrun_simple_step(8, method="rcb")
