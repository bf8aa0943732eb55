"""Structured-mesh case generator (blockMesh-lite).

The reference repo ships no meshing utilities or tutorials (SURVEY.md layer
map: "users prepare cases with stock OpenFOAM") and the driver's BASELINE
configs are stock tutorial cases — so this module generates equivalent
cases (cavity, channels, backward-facing step) in genuine OpenFOAM on-disk
format, exercising the same readers real cases go through.
"""

from __future__ import annotations

import os

import numpy as np

from ..mesh.polymesh import BoundaryPatch, PolyMesh, write_polymesh
from .dictionary import foamfile_header

_SIDES = ("xmin", "xmax", "ymin", "ymax", "zmin", "zmax")


def box_mesh(nx: int, ny: int, nz: int,
             size=(1.0, 1.0, 1.0), origin=(0.0, 0.0, 0.0),
             patch_spec: dict | None = None,
             grading=(1.0, 1.0, 1.0)) -> PolyMesh:
    """Structured hex mesh of a box; patch_spec maps side->(name, type).

    Sides sharing a patch name are merged into one patch. Simple geometric
    grading per direction (blockMeshDict simpleGrading equivalent).
    """
    patch_spec = patch_spec or {
        s: (s, "patch") for s in _SIDES}

    def coords(n, length, ratio):
        if ratio == 1.0:
            return np.linspace(0.0, length, n + 1)
        r = ratio ** (1.0 / (n - 1)) if n > 1 else 1.0
        widths = r ** np.arange(n)
        widths *= length / widths.sum()
        return np.concatenate([[0.0], np.cumsum(widths)])

    xs = origin[0] + coords(nx, size[0], grading[0])
    ys = origin[1] + coords(ny, size[1], grading[1])
    zs = origin[2] + coords(nz, size[2], grading[2])

    # nodes
    X, Y, Z = np.meshgrid(xs, ys, zs, indexing="ij")
    pts = np.stack([X.ravel(order="F"), Y.ravel(order="F"),
                    Z.ravel(order="F")], axis=1)
    # node id with Fortran ravel of (nx+1, ny+1, nz+1) meshgrid(ij):
    # id = i + j*(nx+1) + k*(nx+1)*(ny+1)

    def nid(i, j, k):
        return i + j * (nx + 1) + k * (nx + 1) * (ny + 1)

    def cid(i, j, k):
        return i + j * nx + k * nx * ny

    int_faces = []  # (owner, neighbour, [p0..p3])
    # x-internal faces
    for k in range(nz):
        for j in range(ny):
            for i in range(nx - 1):
                ii = i + 1
                int_faces.append((cid(i, j, k), cid(i + 1, j, k),
                                  [nid(ii, j, k), nid(ii, j + 1, k),
                                   nid(ii, j + 1, k + 1), nid(ii, j, k + 1)]))
    # y-internal
    for k in range(nz):
        for j in range(ny - 1):
            for i in range(nx):
                jj = j + 1
                int_faces.append((cid(i, j, k), cid(i, j + 1, k),
                                  [nid(i, jj, k), nid(i, jj, k + 1),
                                   nid(i + 1, jj, k + 1), nid(i + 1, jj, k)]))
    # z-internal
    for k in range(nz - 1):
        for j in range(ny):
            for i in range(nx):
                kk = k + 1
                int_faces.append((cid(i, j, k), cid(i, j, kk),
                                  [nid(i, j, kk), nid(i + 1, j, kk),
                                   nid(i + 1, j + 1, kk), nid(i, j + 1, kk)]))
    int_faces.sort(key=lambda t: (t[0], t[1]))

    # boundary faces grouped by side
    side_faces = {s: [] for s in _SIDES}
    for k in range(nz):
        for j in range(ny):
            side_faces["xmin"].append((cid(0, j, k),
                                       [nid(0, j, k), nid(0, j, k + 1),
                                        nid(0, j + 1, k + 1), nid(0, j + 1, k)]))
            side_faces["xmax"].append((cid(nx - 1, j, k),
                                       [nid(nx, j, k), nid(nx, j + 1, k),
                                        nid(nx, j + 1, k + 1), nid(nx, j, k + 1)]))
    for k in range(nz):
        for i in range(nx):
            side_faces["ymin"].append((cid(i, 0, k),
                                       [nid(i, 0, k), nid(i + 1, 0, k),
                                        nid(i + 1, 0, k + 1), nid(i, 0, k + 1)]))
            side_faces["ymax"].append((cid(i, ny - 1, k),
                                       [nid(i, ny, k), nid(i, ny, k + 1),
                                        nid(i + 1, ny, k + 1), nid(i + 1, ny, k)]))
    for j in range(ny):
        for i in range(nx):
            side_faces["zmin"].append((cid(i, j, 0),
                                       [nid(i, j, 0), nid(i, j + 1, 0),
                                        nid(i + 1, j + 1, 0), nid(i + 1, j, 0)]))
            side_faces["zmax"].append((cid(i, j, nz - 1),
                                       [nid(i, j, nz), nid(i + 1, j, nz),
                                        nid(i + 1, j + 1, nz), nid(i, j + 1, nz)]))

    # merge sides into named patches, ordered by patch_spec insertion
    patch_order: list[str] = []
    patch_type: dict[str, str] = {}
    patch_sides: dict[str, list[str]] = {}
    for s, (name, typ) in patch_spec.items():
        if name not in patch_type:
            patch_order.append(name)
            patch_type[name] = typ
            patch_sides[name] = []
        patch_sides[name].append(s)

    owners = [t[0] for t in int_faces]
    neighbours = [t[1] for t in int_faces]
    all_faces = [t[2] for t in int_faces]
    patches = []
    for name in patch_order:
        start = len(all_faces)
        for s in patch_sides[name]:
            for own_c, fpts in side_faces[s]:
                owners.append(own_c)
                all_faces.append(fpts)
        patches.append(BoundaryPatch(name, patch_type[name], start,
                                     len(all_faces) - start))

    flat = np.array([p for f in all_faces for p in f], dtype=np.int64)
    offsets = np.zeros(len(all_faces) + 1, dtype=np.int64)
    np.cumsum([len(f) for f in all_faces], out=offsets[1:])
    return PolyMesh(pts, flat, offsets, np.array(owners, dtype=np.int64),
                    np.array(neighbours, dtype=np.int64), patches)


def _write(path: str, header: str, body: str):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(header + body)


def write_field(case_dir: str, time: str, name: str, cls: str,
                dims: str, internal: str, boundary: dict[str, str]):
    lines = [f"\ndimensions      {dims};\n",
             f"\ninternalField   {internal};\n",
             "\nboundaryField\n{\n"]
    for pname, bspec in boundary.items():
        lines.append(f"    {pname}\n    {{\n{bspec}    }}\n")
    lines.append("}\n")
    _write(os.path.join(case_dir, time, name),
           foamfile_header(cls, name, time), "".join(lines))


def cavity_case(case_dir: str, n: int = 20, d: float = 0.1,
                nu: float = 0.01, end_time: float = 0.5,
                delta_t: float = 0.005, write_interval: int = 20):
    """The icoFoam lid-driven cavity tutorial (BASELINE config 1)."""
    mesh = box_mesh(n, n, 1, size=(d, d, 0.01), patch_spec={
        "ymax": ("movingWall", "wall"),
        "xmin": ("fixedWalls", "wall"),
        "xmax": ("fixedWalls", "wall"),
        "ymin": ("fixedWalls", "wall"),
        "zmin": ("frontAndBack", "empty"),
        "zmax": ("frontAndBack", "empty"),
    })
    write_polymesh(mesh, case_dir)

    _write(os.path.join(case_dir, "system", "controlDict"),
           foamfile_header("dictionary", "controlDict", "system"), f"""
application     icoFoam;
startFrom       startTime;
startTime       0;
stopAt          endTime;
endTime         {end_time};
deltaT          {delta_t};
writeControl    timeStep;
writeInterval   {write_interval};
purgeWrite      0;
writeFormat     ascii;
writePrecision  6;
writeCompression off;
timeFormat      general;
timePrecision   6;
runTimeModifiable true;
""")
    _write(os.path.join(case_dir, "system", "fvSchemes"),
           foamfile_header("dictionary", "fvSchemes", "system"), """
ddtSchemes      { default Euler; }
gradSchemes     { default Gauss linear; grad(p) Gauss linear; }
divSchemes      { default none; div(phi,U) Gauss linear; }
laplacianSchemes { default Gauss linear orthogonal; }
interpolationSchemes { default linear; }
snGradSchemes   { default orthogonal; }
fluxRequired    { default no; p; }
""")
    _write(os.path.join(case_dir, "system", "fvSolution"),
           foamfile_header("dictionary", "fvSolution", "system"), """
solvers
{
    p
    {
        solver          PCG;
        preconditioner  DIC;
        tolerance       1e-06;
        relTol          0.05;
    }
    pFinal
    {
        solver          PCG;
        preconditioner  DIC;
        tolerance       1e-06;
        relTol          0;
    }
    U
    {
        solver          smoothSolver;
        smoother        symGaussSeidel;
        tolerance       1e-05;
        relTol          0;
    }
}
PISO
{
    nCorrectors     2;
    nNonOrthogonalCorrectors 0;
    pRefCell        0;
    pRefValue       0;
}
""")
    _write(os.path.join(case_dir, "constant", "transportProperties"),
           foamfile_header("dictionary", "transportProperties", "constant"),
           f"\nnu              nu [ 0 2 -1 0 0 0 0 ] {nu};\n")

    write_field(case_dir, "0", "p", "volScalarField", "[0 2 -2 0 0 0 0]",
                "uniform 0", {
                    "movingWall": "        type            zeroGradient;\n",
                    "fixedWalls": "        type            zeroGradient;\n",
                    "frontAndBack": "        type            empty;\n",
                })
    write_field(case_dir, "0", "U", "volVectorField", "[0 1 -1 0 0 0 0]",
                "uniform (0 0 0)", {
                    "movingWall":
                        "        type            fixedValue;\n"
                        "        value           uniform (1 0 0);\n",
                    "fixedWalls":
                        "        type            fixedValue;\n"
                        "        value           uniform (0 0 0);\n",
                    "frontAndBack": "        type            empty;\n",
                })
    return mesh


def main(argv=None):
    import argparse
    ap = argparse.ArgumentParser(description="generate a benchmark case")
    ap.add_argument("case", choices=["cavity"])
    ap.add_argument("dir")
    ap.add_argument("-n", type=int, default=20, help="cells per side")
    args = ap.parse_args(argv)
    if args.case == "cavity":
        cavity_case(args.dir, n=args.n)
    print(f"wrote {args.case} case to {args.dir}")


if __name__ == "__main__":
    main()
