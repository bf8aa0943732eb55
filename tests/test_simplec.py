"""SIMPLEC consistent-correction solvers (rhoSimplecFoam /
rhoPimplecFoam).

Reference: applications/solvers/compressible/rhoSimpleFoam/
rhoSimplecFoam/pEqn.H (subsonic branch) and rhoPimpleFoam/
rhoPimplecFoam/pEqn.H — rAtU = 1/(1/rAU - H1()), the snGrad(p)
flux compensation and the rAtU momentum corrector.
"""

import numpy as np

import rapidcfd_tpu.utils.logging as L
from rapidcfd_tpu.utils.casegen import hot_channel_case


def _run_steady(d, consistent, n_steps):
    from rapidcfd_tpu.models.thermo import PsiThermo, read_thermo
    from rapidcfd_tpu.models.turbulence import CompressibleTurbulence
    from rapidcfd_tpu.ops import fvc
    from rapidcfd_tpu.fields.field import SurfaceField
    from rapidcfd_tpu.solvers import rhosimplefoam
    from rapidcfd_tpu.solvers.case import Case
    from rapidcfd_tpu.solvers.controls import SimpleControl
    from rapidcfd_tpu.utils.dimensions import DimensionSet, dim_density

    case = Case(d)
    mesh = case.mesh
    m = read_thermo(case.constant_dict("thermophysicalProperties"))
    thermo = PsiThermo(case, m)
    p = case.read_field("p")
    T = case.read_field("T")
    U = case.read_field("U")
    rho = T.with_calculated_bcs(m.rho(p.data, T.data),
                                m.rho(p.bvalues, T.bvalues),
                                dim_density, "rho")
    phi = SurfaceField(fvc.face_values(mesh, rho)
                       * fvc.flux(mesh, U).data,
                       DimensionSet.of(1, 0, -1), "phi")
    simple = SimpleControl(case)
    turb = CompressibleTurbulence(case, U)
    turb_state = turb.init_state(U)
    step = rhosimplefoam.make_step(case, thermo, simple, turb=turb,
                                   consistent=consistent)
    p_res = []
    for _ in range(n_steps):
        U, p, T, rho, phi, turb_state, stats = step(U, p, T, rho, phi,
                                                    turb_state)
        p_res.append(float(stats["p_perf"][0][0]))
    return p_res, U, p, T, rho


_SIMPLEC_FVSOLUTION = """
solvers
{
    p
    {
        solver          GAMG;
        smoother        GaussSeidel;
        tolerance       1e-08;
        relTol          0.05;
    }
    "(U|h)"
    {
        solver          smoothSolver;
        smoother        symGaussSeidel;
        tolerance       1e-08;
        relTol          0.1;
    }
}
SIMPLE
{
    nNonOrthogonalCorrectors 0;
    pRefCell        0;
    pRefValue       100000;
    residualControl { p 1e-4; U 1e-5; h 1e-5; }
}
relaxationFactors
{
    fields    { p 1.0; rho 1.0; }
    equations { U 0.7; h 0.7; }
}
"""


def test_rhosimplecfoam_consistent_correction(tmp_path_factory):
    """SIMPLEC on the heated channel with its practical relaxation
    (p/rho unrelaxed — the whole point of the consistent correction):
    fields stay physical and the pressure residual after N sweeps drops
    below plain SIMPLE's at its standard factors (p 0.3), i.e. SIMPLEC
    converges the outer loop in fewer iterations (VERDICT r2 item 7)."""
    import os
    from rapidcfd_tpu.utils.casegen import _write, foamfile_header
    L.Info.enabled = False
    try:
        d1 = str(tmp_path_factory.mktemp("simplec"))
        hot_channel_case(d1)
        _write(os.path.join(d1, "system", "fvSolution"),
               foamfile_header("dictionary", "fvSolution", "system"),
               _SIMPLEC_FVSOLUTION)
        res_c, U, p, T, rho = _run_steady(d1, consistent=True,
                                          n_steps=30)
        d2 = str(tmp_path_factory.mktemp("simple"))
        hot_channel_case(d2)
        res_s, *_ = _run_steady(d2, consistent=False, n_steps=30)
    finally:
        L.Info.enabled = True
    t = np.asarray(T.data)
    assert np.isfinite(t).all()
    assert t.max() <= 350.0 + 1e-6 and t.min() >= 300.0 - 0.01
    mgas = 8314.47 / 28.9
    assert np.allclose(np.asarray(rho.data),
                       np.asarray(p.data) / (mgas * t), rtol=1e-10)
    # consistent correction (p unrelaxed) converges the outer loop
    # faster than plain SIMPLE at its standard factors
    assert res_c[-1] < res_s[-1], (res_c[-1], res_s[-1])
    assert res_c[-1] < res_c[0]


def test_rhopimplecfoam_transient_channel(tmp_path_factory):
    """rhoPimplecFoam: one transient startup on the heated channel
    stays bounded and EoS-consistent."""
    d = str(tmp_path_factory.mktemp("pimplec"))
    hot_channel_case(d)
    import os
    from rapidcfd_tpu.utils.casegen import _write, foamfile_header
    _write(os.path.join(d, "system", "controlDict"),
           foamfile_header("dictionary", "controlDict", "system"), """
application     rhoPimplecFoam;
startFrom       startTime;
startTime       0;
stopAt          endTime;
endTime         0.02;
deltaT          0.001;
writeControl    timeStep;
writeInterval   1000;
writeFormat     ascii;
""")
    _write(os.path.join(d, "system", "fvSchemes"),
           foamfile_header("dictionary", "fvSchemes", "system"), """
ddtSchemes      { default Euler; }
gradSchemes     { default Gauss linear; }
divSchemes
{
    default         none;
    div(phi,U)      Gauss upwind;
    div(phi,h)      Gauss upwind;
    div(phi,K)      Gauss upwind;
}
laplacianSchemes { default Gauss linear corrected; }
interpolationSchemes { default linear; }
snGradSchemes   { default corrected; }
""")
    L.Info.enabled = False
    try:
        from rapidcfd_tpu.solvers import rhopimplefoam
        case, U, p, T, rho, phi = rhopimplefoam.run(
            d, max_steps=10, write=False, consistent=True)
    finally:
        L.Info.enabled = True
    t = np.asarray(T.data)
    assert np.isfinite(t).all()
    assert t.max() <= 350.0 + 1.0 and t.min() >= 300.0 - 1.0
    mgas = 8314.47 / 28.9
    assert np.allclose(np.asarray(rho.data),
                       np.asarray(p.data) / (mgas * t), rtol=1e-10)
