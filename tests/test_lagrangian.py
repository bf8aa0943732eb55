"""lagrangian Cloud: face-crossing tracking, patch interaction,
drag physics, cloud IO (reference: src/lagrangian/basic).
"""

import os

import numpy as np

from rapidcfd_tpu.utils.casegen import box_mesh, write_polymesh


def _mesh(tmp, nx=10, ny=10, spec=None):
    m = box_mesh(nx, ny, 1, size=(1.0, 1.0, 0.1), patch_spec=spec or {
        "xmin": ("inlet", "patch"), "xmax": ("outlet", "patch"),
        "ymin": ("walls", "wall"), "ymax": ("walls", "wall"),
        "zmin": ("fb", "empty"), "zmax": ("fb", "empty")})
    d = str(tmp)
    write_polymesh(m, d)
    from rapidcfd_tpu.mesh import build_mesh_arrays, read_polymesh
    ma, pm, _ = build_mesh_arrays(read_polymesh(d))
    return ma


def _uniform_u(mesh, vec):
    import jax.numpy as jnp
    from rapidcfd_tpu.fields.bcs import make_bc
    from rapidcfd_tpu.fields.field import VolField
    from rapidcfd_tpu.utils.dimensions import dim_velocity
    data = jnp.broadcast_to(jnp.asarray(vec, mesh.C.dtype),
                            (mesh.n_cells, 3))
    bdata = jnp.broadcast_to(jnp.asarray(vec, mesh.C.dtype),
                             (mesh.n_boundary, 3))
    bcs = tuple(make_bc("calculated", i)
                for i in range(len(mesh.patches)))
    return VolField(data, bdata, bcs, dim_velocity, "U",
                    tuple({} for _ in mesh.patches))


def test_tracer_advection_updates_cells(tmp_path_factory):
    mesh = _mesh(tmp_path_factory.mktemp("lag1"))
    from rapidcfd_tpu.lagrangian import ParticleCloud
    cloud = ParticleCloud(mesh, mode="tracer",
                          patch_interaction={"outlet": "escape"},
                          default_interaction="rebound")
    cloud.inject([[0.05, 0.55, 0.05], [0.15, 0.35, 0.05]])
    U = _uniform_u(mesh, [1.0, 0.0, 0.0])
    for _ in range(5):
        cloud.move(0.05, U)
    st = cloud.state
    x = np.asarray(st.x)[np.asarray(st.active)]
    assert np.allclose(x[:, 0], [0.30, 0.40], atol=1e-9)
    # owning cells followed the particles
    C = np.asarray(mesh.C)
    cells = np.asarray(st.cell)[np.asarray(st.active)]
    for xi, ci in zip(x, cells):
        d_own = np.linalg.norm(C[ci] - xi)
        assert d_own <= np.min(np.linalg.norm(C - xi, axis=1)) + 1e-12


def test_escape_at_outlet(tmp_path_factory):
    mesh = _mesh(tmp_path_factory.mktemp("lag2"))
    from rapidcfd_tpu.lagrangian import ParticleCloud
    cloud = ParticleCloud(mesh, mode="tracer",
                          patch_interaction={"outlet": "escape"})
    cloud.inject([[0.95, 0.5, 0.05]])
    U = _uniform_u(mesh, [1.0, 0.0, 0.0])
    cloud.move(0.2, U)
    assert int(np.asarray(cloud.state.n_active)) == 0


def test_elastic_rebound(tmp_path_factory):
    mesh = _mesh(tmp_path_factory.mktemp("lag3"))
    from rapidcfd_tpu.lagrangian import ParticleCloud
    cloud = ParticleCloud(mesh, mode="inertial", rhop=1000.0,
                          default_interaction="rebound", e=1.0)
    # ballistic particle flying at the ymin wall, no fluid coupling
    cloud.inject([[0.5, 0.15, 0.05]], velocities=[[0.0, -1.0, 0.0]],
                 diameters=[1e-3])
    cloud.move(0.3, None)   # free flight: would reach y = -0.15
    st = cloud.state
    assert bool(np.asarray(st.active)[0])
    y = float(np.asarray(st.x)[0, 1])
    # mirror: 0.15 - 1.0*t_hit = 0 at t=0.15, then back up 0.15
    assert abs(y - 0.15) < 1e-6
    assert float(np.asarray(st.v)[0, 1]) > 0.99


def test_stick(tmp_path_factory):
    mesh = _mesh(tmp_path_factory.mktemp("lag4"))
    from rapidcfd_tpu.lagrangian import ParticleCloud
    cloud = ParticleCloud(mesh, mode="inertial",
                          default_interaction="stick")
    cloud.inject([[0.5, 0.15, 0.05]], velocities=[[0.0, -1.0, 0.0]])
    cloud.move(0.3, None)
    st = cloud.state
    assert bool(np.asarray(st.stuck)[0])
    y1 = float(np.asarray(st.x)[0, 1])
    assert abs(y1) < 1e-6          # resting on the wall
    cloud.move(0.3, None)          # must not move any further
    assert abs(float(np.asarray(cloud.state.x)[0, 1]) - y1) < 1e-12


def test_inertial_drag_relaxation(tmp_path_factory):
    mesh = _mesh(tmp_path_factory.mktemp("lag5"))
    from rapidcfd_tpu.lagrangian import ParticleCloud
    cloud = ParticleCloud(mesh, mode="inertial", rhop=1000.0, rhoc=1.0,
                          mu_c=1.8e-5, default_interaction="rebound")
    cloud.inject([[0.2, 0.5, 0.05]], velocities=[[0.0, 0.0, 0.0]],
                 diameters=[50e-6])
    U = _uniform_u(mesh, [0.5, 0.0, 0.0])
    # tau = rhop d^2 / 18 mu = 1000*(5e-5)^2/(18*1.8e-5) ~ 7.7 ms
    for _ in range(40):
        cloud.move(2e-3, U)
    vx = float(np.asarray(cloud.state.v)[0, 0])
    assert vx > 0.49 * 0.999  # fully relaxed to the gas speed


def test_cloud_io_roundtrip(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("lag6")
    mesh = _mesh(tmp)
    from rapidcfd_tpu.lagrangian import ParticleCloud
    cloud = ParticleCloud(mesh, name="tracers", mode="tracer")
    pos = [[0.11, 0.22, 0.05], [0.74, 0.66, 0.05]]
    cloud.inject(pos, velocities=[[1, 0, 0], [0, 1, 0]],
                 diameters=[1e-4, 2e-4])
    d = str(tmp)
    cloud.write(d, "0.5")
    p2, cells = ParticleCloud.read_positions(d, "0.5", "tracers")
    assert np.allclose(p2, pos, atol=1e-12)
    assert cells.shape == (2,)
