"""Jump-cyclic BC family: fixedJump / uniformJump / fan / fanPressure
(VERDICT r3 item 5; reference: src/finiteVolume/fields/fvPatchFields/
constraint/jumpCyclic + derived/{fan,fixedJump,uniformJump,fanPressure}).

Validation strategy:
- fixedJump steady conduction on a periodic channel has the EXACT
  solution T = a + s*x with slope |s| = jump/L (flux continuity at the
  jump interface forces the gradient to absorb the step per transit)
- uniformJump jumpTable polynomial/table evaluates Function1(t)
- fan clamps the curve at the face normal velocity, >= 0
- fanPressure offsets p0 by the fan curve at the patch volume flow
"""

import os
import tempfile

import numpy as np

from rapidcfd_tpu.utils import logging as L
from rapidcfd_tpu.utils.casegen import _write, box_mesh, write_field, \
    write_polymesh
from rapidcfd_tpu.utils.dictionary import foamfile_header

JUMP = 10.0


def _jump_case(bc_body: str) -> str:
    """Periodic conduction channel; the cyclic pair carries a jump BC
    on T (patchType cyclic), so the pair is kept coupled."""
    d = tempfile.mkdtemp(prefix="jump_")
    m = box_mesh(24, 4, 1, size=(1.0, 0.2, 0.05), patch_spec={
        "xmin": ("inlet", "cyclic"), "xmax": ("outlet", "cyclic"),
        "ymin": ("walls", "wall"), "ymax": ("walls", "wall"),
        "zmin": ("fb", "empty"), "zmax": ("fb", "empty")})
    for p in m.patches:
        if p.name == "inlet":
            p.extra["neighbourPatch"] = "outlet"
        if p.name == "outlet":
            p.extra["neighbourPatch"] = "inlet"
    write_polymesh(m, d)
    for sub, body in (
        ("system/controlDict",
         "application laplacianFoam;\nstartFrom startTime;\n"
         "startTime 0; stopAt endTime; endTime 30.0; deltaT 0.05;\n"
         "writeControl runTime; writeInterval 100; writeFormat ascii;\n"),
        ("system/fvSchemes",
         "ddtSchemes { default Euler; }\n"
         "gradSchemes { default Gauss linear; }\n"
         "divSchemes { default none; }\n"
         "laplacianSchemes { default Gauss linear orthogonal; }\n"
         "interpolationSchemes { default linear; }\n"
         "snGradSchemes { default orthogonal; }\n"),
        ("system/fvSolution",
         "solvers { T { solver PCG; preconditioner DIC;\n"
         "tolerance 1e-12; relTol 0; } }\n"
         "SIMPLE { nNonOrthogonalCorrectors 0; }\n"),
        ("constant/transportProperties",
         "DT DT [0 2 -1 0 0 0 0] 0.05;\n"),
    ):
        _write(os.path.join(d, sub),
               foamfile_header("dictionary", os.path.basename(sub),
                               os.path.dirname(sub)), body)
    write_field(d, "0", "T", "volScalarField", "[0 0 0 1 0 0 0]",
                "uniform 0",
                {"walls": "        type            zeroGradient;\n",
                 "fb": "        type            empty;\n",
                 '"(inlet|outlet)"': bc_body})
    return d


def _run(d):
    L.Info.enabled = False
    try:
        from rapidcfd_tpu.solvers import basic
        case, T = basic.run_laplacian_foam(d, write=False)[:2]
    finally:
        L.Info.enabled = True
    return case, np.asarray(T.data)


def test_fixed_jump_steady_slope():
    d = _jump_case("        type            fixedJump;\n"
                   "        patchType       cyclic;\n"
                   f"        jump            uniform {JUMP};\n"
                   "        value           uniform 0;\n")
    case, T = _run(d)
    C = np.asarray(case.mesh.C)
    x = C[:, 0]
    # exact steady solution: T = mean + s*(x - 0.5), |s| = JUMP/L, L=1
    s = np.polyfit(x, T, 1)[0]
    assert abs(abs(s) - JUMP) < 1e-6 * JUMP
    resid = T - T.mean() - s * (x - x.mean())
    assert np.abs(resid).max() < 1e-6 * JUMP


def test_uniform_jump_table_matches_fixed():
    """uniformJump with a constant-valued jumpTable == fixedJump."""
    d = _jump_case("        type            uniformJump;\n"
                   "        patchType       cyclic;\n"
                   f"        jumpTable       constant {JUMP};\n"
                   "        value           uniform 0;\n")
    _, T1 = _run(d)
    d2 = _jump_case("        type            fixedJump;\n"
                    "        patchType       cyclic;\n"
                    f"        jump            uniform {JUMP};\n"
                    "        value           uniform 0;\n")
    _, T2 = _run(d2)
    assert np.abs(T1 - T2).max() < 1e-8 * JUMP


def test_fan_zero_flow_clamps_to_zero_jump():
    """fan on a pure-conduction case (phi absent from env -> table(t=0));
    with a polynomial curve dp(0)=0 the jump vanishes and T stays
    uniform."""
    d = _jump_case("        type            fan;\n"
                   "        patchType       cyclic;\n"
                   "        jumpTable       polynomial ((100 1)(-50 2));\n"
                   "        value           uniform 0;\n")
    _, T = _run(d)
    assert np.abs(T - T.mean()).max() < 1e-8


def test_fan_pressure_offsets_p0(tmp_path):
    """fanPressure: p0_eff = p0 - dir*curve(dir*sum(phi)) on top of the
    totalPressure dynamic head."""
    import jax.numpy as jnp
    from rapidcfd_tpu.fields.bcs_coupled import FanPressure
    from rapidcfd_tpu.solvers.case import Case
    from rapidcfd_tpu.utils.casegen import cavity_case

    d = str(tmp_path / "cav")
    cavity_case(d, n=4)
    case = Case(d)
    mesh = case.mesh
    patch = mesh.patches[0]
    p = case.read_field("p", "0")
    bd = dict(p.bcdata[0])
    bd["p0"] = jnp.asarray(5.0)
    bd["jump_times"] = jnp.asarray([0.0, 1.0])
    bd["jump_values"] = jnp.asarray([0.0, 100.0])
    bc = FanPressure(0, 1)   # direction out
    phi = jnp.zeros((mesh.n_faces,))
    area = float(np.asarray(mesh.patch_mag_sf(patch)).sum())
    qn = 0.004
    phi = phi.at[patch.start:patch.start + patch.size].set(
        qn / patch.size)

    class _Phi:
        data = phi
        from rapidcfd_tpu.utils.dimensions import DimensionSet
        dims = DimensionSet.of(0, 3, -1)
    v = bc._p0(mesh, patch, p, bd, env={"phi": _Phi()})
    # curve(0.004 m3/s) = 0.4; p0_eff = 5 - 0.4
    assert np.allclose(float(v), 5.0 - 100.0 * qn, atol=1e-10)
    del area
