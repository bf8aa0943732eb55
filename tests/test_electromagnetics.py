"""electrostaticFoam + mhdFoam + nonNewtonianIcoFoam integration."""

import os

import numpy as np
import pytest

from rapidcfd_tpu.mesh.polymesh import write_polymesh
from rapidcfd_tpu.utils import logging as L
from rapidcfd_tpu.utils.casegen import (_write, box_mesh, cavity_case,
                                        write_field)
from rapidcfd_tpu.utils.dictionary import foamfile_header

_EMPTY = "        type            empty;\n"
_ZG = "        type            zeroGradient;\n"


def _fv(v):
    return ("        type            fixedValue;\n"
            f"        value           uniform {v};\n")


def test_electrostatic_foam(tmp_path_factory):
    """Uniform positive charge between grounded plates: concave potential,
    symmetric, charge drifts out along the field."""
    d = str(tmp_path_factory.mktemp("estat"))
    mesh = box_mesh(20, 1, 1, size=(1.0, 0.05, 0.05), patch_spec={
        "xmin": ("left", "patch"), "xmax": ("right", "patch"),
        "ymin": ("s", "empty"), "ymax": ("s", "empty"),
        "zmin": ("f", "empty"), "zmax": ("f", "empty")})
    write_polymesh(mesh, d)
    _write(os.path.join(d, "system", "controlDict"),
           foamfile_header("dictionary", "controlDict", "system"), """
application electrostaticFoam; startFrom startTime; startTime 0;
stopAt endTime; endTime 0.1; deltaT 0.01;
writeControl timeStep; writeInterval 1000; writeFormat ascii;
""")
    _write(os.path.join(d, "system", "fvSchemes"),
           foamfile_header("dictionary", "fvSchemes", "system"), """
ddtSchemes { default Euler; }
gradSchemes { default Gauss linear; }
divSchemes { default none; div(rhoFlux,rho) Gauss upwind; }
laplacianSchemes { default Gauss linear orthogonal; }
interpolationSchemes { default linear; }
snGradSchemes { default orthogonal; }
""")
    _write(os.path.join(d, "system", "fvSolution"),
           foamfile_header("dictionary", "fvSolution", "system"), """
solvers
{
    phi { solver PCG; preconditioner DIC; tolerance 1e-09; relTol 0; }
    rho { solver PBiCGStab; preconditioner DILU; tolerance 1e-09;
          relTol 0; }
}
""")
    _write(os.path.join(d, "constant", "physicalProperties"),
           foamfile_header("dictionary", "physicalProperties", "constant"),
           "\nepsilon0        epsilon0 [-1 -3 4 0 0 2 0] 1.0;\n"
           "k               k [-1 0 2 0 0 1 0] 1.0;\n")
    write_field(d, "0", "phi", "volScalarField", "[1 2 -3 0 0 -1 0]",
                "uniform 0", {"left": _fv(0), "right": _fv(0),
                              "s": _EMPTY, "f": _EMPTY})
    write_field(d, "0", "rho", "volScalarField", "[0 -3 1 0 0 1 0]",
                "uniform 1", {"left": _ZG, "right": _ZG,
                              "s": _EMPTY, "f": _EMPTY})
    L.Info.enabled = False
    from rapidcfd_tpu.solvers.electromagnetics import run_electrostatic_foam
    case, pot, rho = run_electrostatic_foam(d, write=False)
    L.Info.enabled = True
    v = np.asarray(pot.data)
    r = np.asarray(rho.data)
    assert np.isfinite(v).all() and np.isfinite(r).all()
    # concave potential with interior maximum (positive charge cloud)
    assert v.max() > 0.01
    x = np.asarray(case.mesh.C)[:, 0]
    order = np.argsort(x)
    assert abs(v[order][:5].mean() - v[order][-5:].mean()) < 0.02 * v.max()
    # charge is transported outward along E: total charge decreases
    V = np.asarray(case.mesh.V)
    assert (r * V).sum() < 1.0 * V.sum()


def test_mhd_foam_hartmann_smoke(tmp_path_factory):
    """Hartmann-style channel with a transverse field: stable, finite, and
    div(B) kept near machine zero by the B-PISO projection."""
    d = str(tmp_path_factory.mktemp("mhd"))
    mesh = box_mesh(20, 8, 1, size=(1.0, 0.4, 0.05), patch_spec={
        "xmin": ("inlet", "patch"), "xmax": ("outlet", "patch"),
        "ymin": ("walls", "wall"), "ymax": ("walls", "wall"),
        "zmin": ("f", "empty"), "zmax": ("f", "empty")})
    write_polymesh(mesh, d)
    _write(os.path.join(d, "system", "controlDict"),
           foamfile_header("dictionary", "controlDict", "system"), """
application mhdFoam; startFrom startTime; startTime 0;
stopAt endTime; endTime 0.01; deltaT 0.001;
writeControl timeStep; writeInterval 1000; writeFormat ascii;
""")
    _write(os.path.join(d, "system", "fvSchemes"),
           foamfile_header("dictionary", "fvSchemes", "system"), """
ddtSchemes { default Euler; }
gradSchemes { default Gauss linear; }
divSchemes { default none; div(phi,U) Gauss upwind;
             div(phi,B) Gauss upwind; div(phiB,U) Gauss upwind; }
laplacianSchemes { default Gauss linear orthogonal; }
interpolationSchemes { default linear; }
snGradSchemes { default orthogonal; }
""")
    _write(os.path.join(d, "system", "fvSolution"),
           foamfile_header("dictionary", "fvSolution", "system"), """
solvers
{
    p  { solver PCG; preconditioner DIC; tolerance 1e-08; relTol 0; }
    pB { solver PCG; preconditioner DIC; tolerance 1e-08; relTol 0; }
    U  { solver PBiCGStab; preconditioner DILU; tolerance 1e-08;
         relTol 0; }
    B  { solver PBiCGStab; preconditioner DILU; tolerance 1e-08;
         relTol 0; }
}
PISO { nCorrectors 2; nNonOrthogonalCorrectors 0; }
BPISO { nCorrectors 1; }
""")
    _write(os.path.join(d, "constant", "transportProperties"),
           foamfile_header("dictionary", "transportProperties", "constant"),
           "\nrho             rho [1 -3 0 0 0 0 0] 1;\n"
           "nu              nu [0 2 -1 0 0 0 0] 0.01;\n"
           "mu              mu [1 1 -2 0 0 -2 0] 1;\n"
           "sigma           sigma [-1 -3 3 0 0 2 0] 1;\n")
    write_field(d, "0", "U", "volVectorField", "[0 1 -1 0 0 0 0]",
                "uniform (1 0 0)", {
                    "inlet": _fv("(1 0 0)"), "outlet": _ZG,
                    "walls": _fv("(0 0 0)"), "f": _EMPTY})
    write_field(d, "0", "p", "volScalarField", "[0 2 -2 0 0 0 0]",
                "uniform 0", {"inlet": _ZG, "outlet": _fv(0),
                              "walls": _ZG, "f": _EMPTY})
    write_field(d, "0", "B", "volVectorField", "[1 0 -2 0 0 -1 0]",
                "uniform (0 1 0)", {
                    "inlet": _ZG, "outlet": _ZG,
                    "walls": _fv("(0 1 0)"), "f": _EMPTY})
    write_field(d, "0", "pB", "volScalarField", "[1 1 -3 0 0 -1 0]",
                "uniform 0", {"inlet": _ZG, "outlet": _ZG,
                              "walls": _ZG, "f": _EMPTY})
    L.Info.enabled = False
    from rapidcfd_tpu.solvers.electromagnetics import run_mhd_foam
    case, U, p, B, phi, phiB = run_mhd_foam(d, write=False)
    L.Info.enabled = True
    u = np.asarray(U.data)
    b = np.asarray(B.data)
    assert np.isfinite(u).all() and np.isfinite(b).all()
    assert np.abs(u).max() < 5.0          # Lorentz braking, no blow-up
    from rapidcfd_tpu.ops import fvc
    divb = np.asarray(fvc.div(case.mesh, phiB).data)
    V = np.asarray(case.mesh.V)
    assert (np.abs(divb) * V).sum() < 1e-6


def test_non_newtonian_ico_foam(tmp_path_factory):
    """powerLaw cavity: shear-thinning viscosity stays in [nuMin,nuMax]
    and the flow stays bounded."""
    d = str(tmp_path_factory.mktemp("nonnewt"))
    cavity_case(d, n=12, end_time=0.05)
    _write(os.path.join(d, "constant", "transportProperties"),
           foamfile_header("dictionary", "transportProperties", "constant"),
           """
transportModel  powerLaw;
nu              nu [0 2 -1 0 0 0 0] 0.01;
powerLawCoeffs
{
    k               k [0 2 -1 0 0 0 0] 0.01;
    n               n [0 0 0 0 0 0 0] 0.6;
    nuMin           nuMin [0 2 -1 0 0 0 0] 1e-05;
    nuMax           nuMax [0 2 -1 0 0 0 0] 0.1;
}
""")
    L.Info.enabled = False
    from rapidcfd_tpu.solvers import icofoam
    case, U, p, phi = icofoam.run(d, write=False, non_newtonian=True)
    L.Info.enabled = True
    u = np.asarray(U.data)
    assert np.isfinite(u).all()
    assert np.abs(u).max() <= 1.5         # lid speed 1, bounded interior
    from rapidcfd_tpu.models.transport import (SinglePhaseTransportModel,
                                               strain_rate)
    model = SinglePhaseTransportModel(case.transport_properties())
    nu = model.nu(case.mesh, U)
    nu_d = np.asarray(nu.data)
    assert (nu_d >= 1e-05 - 1e-12).all() and (nu_d <= 0.1 + 1e-12).all()
    # shear thinning actually happened somewhere near the lid
    assert nu_d.min() < 0.99 * nu_d.max()


def test_magnetic_foam_bar_magnet(tmp_path_factory):
    """magneticFoam: a bar-magnet faceZone produces a dipole-like H
    field; div(B) stays near zero away from the magnet."""
    import numpy as np
    d = str(tmp_path_factory.mktemp("mag"))
    mesh = box_mesh(30, 30, 1, size=(0.3, 0.3, 0.01), patch_spec={
        "xmin": ("outer", "patch"), "xmax": ("outer", "patch"),
        "ymin": ("outer", "patch"), "ymax": ("outer", "patch"),
        "zmin": ("fb", "empty"), "zmax": ("fb", "empty")})
    write_polymesh(mesh, d)
    # faceZone: internal faces inside the bar 0.12<x<0.18, 0.09<y<0.21
    from rapidcfd_tpu.mesh.geometry import face_centres_and_areas
    Cf, Sf = face_centres_and_areas(mesh)
    bar = np.nonzero(
        (Cf[:mesh.n_internal_faces, 0] > 0.12)
        & (Cf[:mesh.n_internal_faces, 0] < 0.18)
        & (Cf[:mesh.n_internal_faces, 1] > 0.09)
        & (Cf[:mesh.n_internal_faces, 1] < 0.21))[0]
    fz = os.path.join(d, "constant", "polyMesh", "faceZones")
    with open(fz, "w") as f:
        f.write(foamfile_header("regIOobject", "faceZones", "") + """
1
(
bar
{
    type faceZone;
faceLabels      List<label>
%d
(
%s
)
;
}
)
""" % (len(bar), "\n".join(str(int(x)) for x in bar)))
    _write(os.path.join(d, "system", "controlDict"),
           foamfile_header("dictionary", "controlDict", "system"), """
application magneticFoam; startFrom startTime; startTime 0;
stopAt endTime; endTime 1; deltaT 1;
writeControl timeStep; writeInterval 1; writeFormat ascii;
""")
    _write(os.path.join(d, "system", "fvSchemes"),
           foamfile_header("dictionary", "fvSchemes", "system"), """
ddtSchemes { default steadyState; }
gradSchemes { default Gauss linear; }
divSchemes { default none; }
laplacianSchemes { default Gauss linear corrected; }
interpolationSchemes { default linear; }
snGradSchemes { default corrected; }
""")
    _write(os.path.join(d, "system", "fvSolution"),
           foamfile_header("dictionary", "fvSolution", "system"), """
solvers
{
    psi { solver PCG; preconditioner DIC; tolerance 1e-10; relTol 0; }
}
SIMPLE { nNonOrthogonalCorrectors 1; pRefCell 0; pRefValue 0; }
""")
    _write(os.path.join(d, "constant", "transportProperties"),
           foamfile_header("dictionary", "transportProperties",
                           "constant"),
           "\nmagnets ( (bar 1 79577.5 (0 1 0)) );\n")
    write_field(d, "0", "psi", "volScalarField", "[0 0 0 0 0 1 0]",
                "uniform 0", {"outer": _ZG, "fb": _EMPTY})
    L.Info.enabled = False
    from rapidcfd_tpu.solvers.electromagnetics import run_magnetic_foam
    case, psi, H, B = run_magnetic_foam(d, write=False)
    L.Info.enabled = True
    h = np.asarray(H.data)
    assert np.isfinite(h).all()
    # a field was produced and decays away from the magnet
    mag_h = np.linalg.norm(h, axis=1)
    C = np.asarray(case.mesh.C)
    near = (np.abs(C[:, 0] - 0.15) < 0.06) & (np.abs(C[:, 1] - 0.15) < 0.09)
    far = np.linalg.norm(C[:, :2] - 0.15, axis=1) > 0.12
    # dipole decay: with the exact reconstruct the far field is the
    # physical 1/r^3 tail, not numerical noise — ~5x over this box
    assert mag_h[near].max() > 5.0 * max(mag_h[far].mean(), 1e-12)
    assert mag_h.max() > 1.0
