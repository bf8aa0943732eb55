"""sixDoFRigidBodyMotion: integrator physics + coupled mesh motion.

Reference semantics: src/sixDoFRigidBodyMotion (symplectic integrator,
linearSpring restraint, line/orientation constraints, inner/outer
distance blended mesh deformation).
"""

import math
import os

import numpy as np

from rapidcfd_tpu.utils.dictionary import parse_dictionary


def _body(text):
    from rapidcfd_tpu.models.sixdof import RigidBody
    return RigidBody(parse_dictionary(text))


def test_free_fall():
    b = _body("mass 2; momentOfInertia (1 1 1); g (0 -10 0);")
    dt = 1e-3
    for k in range(1000):
        b.step(dt, np.zeros(3), np.zeros(3))
    # leapfrog is exact for constant acceleration
    assert abs(b.x[1] - (-0.5 * 10 * 1.0 ** 2)) < 1e-10
    assert abs(b.v[1] + 10.0) < 1e-10
    assert np.abs(b.Q - np.eye(3)).max() < 1e-14


def test_spring_frequency():
    """m xdd = -k x  ->  omega = sqrt(k/m); count zero crossings."""
    b = _body("""
mass 1; momentOfInertia (1 1 1);
velocity (0.3 0 0);
constraints { l { sixDoFRigidBodyMotionConstraint line;
                  direction (1 0 0); } }
restraints { s { sixDoFRigidBodyMotionRestraint linearSpring;
                 anchor (0 0 0); refAttachmentPt (0 0 0);
                 stiffness 39.4784176; restLength 0; } }
""")
    # k = (2*pi)^2, m = 1 -> period exactly 1
    dt = 1e-3
    xs = []
    for k in range(2000):
        b.step(dt, np.zeros(3), np.zeros(3))
        xs.append(b.x[0])
    xs = np.asarray(xs)
    crossings = np.where(np.diff(np.sign(xs)) != 0)[0]
    # x ~ sin(2*pi*t): zero crossings at t = 0.5, 1.0, 1.5 (2.0 is the
    # window edge) — the period is exactly 1
    assert len(crossings) in (3, 4)
    assert abs(crossings[0] * dt - 0.5) < 0.01
    # constrained off-axis motion is identically zero
    assert np.abs(b.x[1:]).max() < 1e-14


def test_torque_free_rotation_conserves_momentum():
    b = _body("mass 1; momentOfInertia (1.0 2.0 3.0);")
    b.pi = np.array([0.4, 0.5, 0.6])
    pi_mag_global0 = np.linalg.norm(b.Q @ b.pi)
    for k in range(2000):
        b.step(1e-3, np.zeros(3), np.zeros(3))
    # |L| is conserved by torque-free rigid rotation (up to the
    # first-order gyroscopic splitting error of the leapfrog)
    assert abs(np.linalg.norm(b.Q @ b.pi) - pi_mag_global0) < 1e-4
    # orientation stays orthonormal
    assert np.abs(b.Q @ b.Q.T - np.eye(3)).max() < 1e-10


def test_orientation_constraint():
    b = _body("""
mass 1; momentOfInertia (1 1 1);
constraints { o { sixDoFRigidBodyMotionConstraint orientation; } }
""")
    for k in range(100):
        b.step(1e-2, np.zeros(3), np.asarray([0.0, 0.0, 5.0]))
    assert np.abs(b.Q - np.eye(3)).max() < 1e-14
    assert np.abs(b.pi).max() < 1e-14


def test_sixdof_coupled_heave(tmp_path_factory):
    """Bottom wall is a sprung rigid body; flow pressure + spring drive
    a bounded heave; mesh follows with the cosine blend."""
    d = str(tmp_path_factory.mktemp("sixdof"))
    from rapidcfd_tpu.utils.casegen import (_write, box_mesh, write_field,
                                            write_polymesh)
    from rapidcfd_tpu.utils.dictionary import foamfile_header
    mesh = box_mesh(8, 8, 1, size=(0.1, 0.1, 0.01), patch_spec={
        "xmin": ("sides", "wall"), "xmax": ("sides", "wall"),
        "ymax": ("sides", "wall"), "ymin": ("hull", "wall"),
        "zmin": ("fb", "empty"), "zmax": ("fb", "empty")})
    write_polymesh(mesh, d)
    for fn, body in [
        ("system/controlDict", """
application pimpleDyMFoam; startFrom startTime; startTime 0;
stopAt endTime; endTime 0.01; deltaT 0.001;
writeControl timeStep; writeInterval 1000; writeFormat ascii;
"""),
        ("system/fvSchemes", """
ddtSchemes { default Euler; }
gradSchemes { default Gauss linear; }
divSchemes { default none; div(phi,U) Gauss linear; }
laplacianSchemes { default Gauss linear orthogonal; }
interpolationSchemes { default linear; }
snGradSchemes { default orthogonal; }
"""),
        ("system/fvSolution", """
solvers
{
    p { solver PCG; preconditioner DIC; tolerance 1e-09; relTol 0; }
    pFinal { solver PCG; preconditioner DIC; tolerance 1e-09; relTol 0; }
    U { solver smoothSolver; smoother symGaussSeidel;
        tolerance 1e-09; relTol 0; }
    UFinal { solver smoothSolver; smoother symGaussSeidel;
             tolerance 1e-09; relTol 0; }
}
PIMPLE { nOuterCorrectors 1; nCorrectors 2;
         nNonOrthogonalCorrectors 0; pRefCell 0; pRefValue 0; }
"""),
        ("constant/transportProperties",
         "\nnu              nu [0 2 -1 0 0 0 0] 0.001;\n"),
        ("constant/RASProperties",
         "\nRASModel        laminar;\nturbulence      off;\n"),
        ("constant/dynamicMeshDict", """
dynamicFvMesh   dynamicMotionSolverFvMesh;
motionSolver    sixDoFRigidBodyMotion;
patches         (hull);
innerDistance   0.005;
outerDistance   0.08;
mass            0.5;
centreOfMass    (0.05 0 0.005);
momentOfInertia (0.01 0.01 0.01);
rhoInf          1;
velocity        (0 0.05 0);
constraints
{
    onlyY { sixDoFRigidBodyMotionConstraint line; direction (0 1 0); }
    noRot { sixDoFRigidBodyMotionConstraint orientation; }
}
restraints
{
    spring { sixDoFRigidBodyMotionRestraint linearSpring;
             anchor (0.05 0 0.005); refAttachmentPt (0.05 0 0.005);
             stiffness 500; damping 2; restLength 0; }
}
"""),
    ]:
        _write(os.path.join(d, fn),
               foamfile_header("dictionary", os.path.basename(fn),
                               os.path.dirname(fn)), body)
    write_field(d, "0", "p", "volScalarField", "[0 2 -2 0 0 0 0]",
                "uniform 0", {
                    "sides": "        type            zeroGradient;\n",
                    "hull": "        type            zeroGradient;\n",
                    "fb": "        type            empty;\n"})
    write_field(d, "0", "U", "volVectorField", "[0 1 -1 0 0 0 0]",
                "uniform (0 0 0)", {
                    "sides":
                        "        type            fixedValue;\n"
                        "        value           uniform (0 0 0);\n",
                    "hull":
                        "        type            movingWallVelocity;\n"
                        "        value           uniform (0 0 0);\n",
                    "fb": "        type            empty;\n"})

    from rapidcfd_tpu.utils import logging as L
    L.Info.enabled = False
    try:
        from rapidcfd_tpu.solvers import pimpledymfoam
        case, U, p, phi, _ = pimpledymfoam.run(d, write=False,
                                               max_steps=10)
    finally:
        L.Info.enabled = True
    assert np.isfinite(np.asarray(U.data)).all()
    assert np.isfinite(np.asarray(p.data)).all()
    # the hull moved along +y and the mesh followed (bottom row lifted)
    ymin_now = np.asarray(case.mesh.C)[:, 1].min()
    assert ymin_now > 0.1 / 8 / 2 * 1.01  # above the static first-row centre
