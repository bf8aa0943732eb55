import time, tempfile, numpy as np
import jax, jax.numpy as jnp
from rapidcfd_tpu.utils import logging as L
L.Info.enabled = False
from rapidcfd_tpu.solvers.case import Case
from rapidcfd_tpu.utils.unstructured import unstructured_channel_case

d = tempfile.mkdtemp(prefix="profg_")
pmesh = unstructured_channel_case(d, nx=80, ny=40, nz=40, end_time=10**9,
    perturb=0.12, merge_fraction=0.04, seed=3, write_mesh=False)
case = Case(d, pmesh=pmesh)
mesh = case.mesh
print("n_cells", mesh.n_cells, "n_faces", mesh.n_faces, "K", mesh.cell_nbr.shape[1], flush=True)

from rapidcfd_tpu.ops import fvc, fvm
from rapidcfd_tpu.fields.field import Dimensioned
from rapidcfd_tpu.utils.dimensions import DimensionSet
p = case.read_field("p")
one = Dimensioned("g", DimensionSet.of(0, 3, -1), jnp.ones(mesh.n_faces))
pe = fvm.laplacian(mesh, one, p)

from rapidcfd_tpu.linalg.precompute import attach_solver_layouts
mesh2 = attach_solver_layouts(mesh, (case.solver_controls("p"),), case=case)
print("gamg levels:", None if mesh2.gamg is None else len(mesh2.gamg), flush=True)
if mesh2.gamg is not None:
    for i, lv in enumerate(mesh2.gamg):
        try:
            print("  level", i, {f: np.asarray(getattr(lv, f)).shape for f in ("restrict_idx",) if hasattr(lv, f)}, flush=True)
        except Exception as e:
            print("  level", i, type(lv), flush=True)

def bench(f, *a, iters=20):
    y = jax.block_until_ready(f(*a))
    t0 = time.perf_counter()
    for _ in range(iters):
        y = f(*a)
    jax.block_until_ready(y)
    return (time.perf_counter()-t0)/iters*1e3

x = jnp.ones(mesh.n_cells)
mv = jax.jit(lambda x: pe.offdiag_mv(mesh2)(x) + pe.diag * x)
print("SpMV ms:", round(bench(mv, x), 3), flush=True)

# face interpolation + surface integrate (assembly primitives)
Uf = case.read_field("U")
flux = jax.jit(lambda U: fvc.flux(mesh2, U))
print("fvc.flux ms:", round(bench(flux, Uf), 3), flush=True)
gg = jax.jit(lambda pp: fvc.grad(mesh2, pp))
print("fvc.grad ms:", round(bench(gg, p), 3), flush=True)

# full p solve
from rapidcfd_tpu.linalg import solvers as S
ctrl = case.solver_controls("p")
print("p solver:", ctrl.solver, ctrl.preconditioner, flush=True)
def psolve(b):
    mat = fvm.laplacian(mesh2, one, p)
    x, perf = S.solve(mesh2, mat, b, ctrl)
    return x
b = jnp.ones(mesh.n_cells)
pj = jax.jit(psolve)
print("p solve ms:", round(bench(pj, b, iters=5), 2), flush=True)
