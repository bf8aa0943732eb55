"""Binary (+gzip) field/mesh IO (reference: `writeFormat binary`,
`writeCompression compressed` — gpuListIO.C list blocks, OSstream.C
`(raw)` framing, CompactIOList.C binary faces, IFstream/gzstream).

Bit-exactness: binary round-trips carry the full double, so fields must
come back EXACTLY, not to parse precision.
"""

import gzip
import os
import re

import numpy as np
import jax.numpy as jnp
import pytest

from rapidcfd_tpu.fields import read_vol_field, write_vol_field
from rapidcfd_tpu.fields.io import read_surface_field, write_surface_field
from rapidcfd_tpu.mesh import build_mesh_arrays
from rapidcfd_tpu.mesh.polymesh import read_polymesh, write_polymesh
from rapidcfd_tpu.utils.casegen import box_mesh, write_field


@pytest.fixture(scope="module")
def box(tmp_path_factory):
    m = box_mesh(6, 5, 4, size=(0.6, 0.5, 0.4), patch_spec={
        "xmin": ("inlet", "patch"), "xmax": ("outlet", "patch"),
        "ymin": ("walls", "wall"), "ymax": ("walls", "wall"),
        "zmin": ("walls", "wall"), "zmax": ("walls", "wall")})
    ma, pm, maps = build_mesh_arrays(m)
    return m, ma, maps


def test_binary_polymesh_roundtrip(box, tmp_path):
    m, ma, maps = box
    d = str(tmp_path)
    write_polymesh(m, d, fmt="binary")
    m2 = read_polymesh(d)
    np.testing.assert_array_equal(m2.points, m.points)
    np.testing.assert_array_equal(m2.face_points, m.face_points)
    np.testing.assert_array_equal(m2.face_offsets, m.face_offsets)
    np.testing.assert_array_equal(m2.owner, m.owner)
    np.testing.assert_array_equal(m2.neighbour, m.neighbour)
    assert [p.name for p in m2.patches] == [p.name for p in m.patches]


def test_binary_gz_polymesh_roundtrip(box, tmp_path):
    m, ma, maps = box
    d = str(tmp_path)
    write_polymesh(m, d, fmt="binary", compress=True)
    assert os.path.isfile(os.path.join(d, "constant", "polyMesh",
                                       "points.gz"))
    m2 = read_polymesh(d)
    np.testing.assert_array_equal(m2.points, m.points)
    np.testing.assert_array_equal(m2.owner, m.owner)


def test_binary_points_framing(box, tmp_path):
    """Byte-level contract: ascii header with `format binary;`, then
    `\\nN\\n(` + N*3 raw little-endian doubles + `)` (OSstream.C:write +
    UListIO.C binary branch)."""
    m, ma, maps = box
    d = str(tmp_path)
    write_polymesh(m, d, fmt="binary")
    raw = open(os.path.join(d, "constant", "polyMesh", "points"),
               "rb").read()
    assert re.search(rb"format\s+binary;", raw[:2048])
    mm = re.search(rb"\n(\d+)\n\(", raw)
    n = int(mm.group(1))
    assert n == m.points.shape[0]
    start = mm.end()
    end = start + n * 3 * 8
    assert raw[end:end + 1] == b")"
    pts = np.frombuffer(raw, "<f8", count=n * 3, offset=start)
    np.testing.assert_array_equal(pts.reshape(n, 3), m.points)
    # faces file is compact: offsets + flat lists, class word says so
    fraw = open(os.path.join(d, "constant", "polyMesh", "faces"),
                "rb").read()
    assert re.search(rb"class\s+faceCompactIOList;", fraw[:2048])


def test_binary_field_roundtrip_exact(box, tmp_path):
    m, ma, maps = box
    d = str(tmp_path)
    write_polymesh(m, d)
    rng = np.random.default_rng(7)
    vals = rng.standard_normal(ma.n_cells)
    write_field(d, "0", "T", "volScalarField", "[0 0 0 1 0 0 0]",
                "nonuniform List<scalar> %d (%s)" % (
                    ma.n_cells, " ".join("%.17g" % v for v in vals)), {
        "inlet": "        type fixedValue;\n        value uniform 3;\n",
        "outlet": "        type zeroGradient;\n",
        "walls": "        type zeroGradient;\n"})
    T = read_vol_field(d, "0", "T", ma, maps)
    # ascii -> binary write -> read: binary payload carries full doubles
    write_vol_field(T, d, "1", ma, maps, fmt="binary")
    raw = open(os.path.join(d, "1", "T"), "rb").read()
    assert re.search(rb"format\s+binary;", raw[:2048])
    T2 = read_vol_field(d, "1", "T", ma, maps)
    np.testing.assert_array_equal(np.asarray(T2.data),
                                  np.asarray(T.data))
    np.testing.assert_array_equal(np.asarray(T2.bvalues),
                                  np.asarray(T.bvalues))


def test_binary_vector_field_and_gz(box, tmp_path):
    m, ma, maps = box
    d = str(tmp_path)
    write_polymesh(m, d)
    rng = np.random.default_rng(8)
    vals = rng.standard_normal((ma.n_cells, 3))
    body = " ".join("(%.17g %.17g %.17g)" % tuple(v) for v in vals)
    write_field(d, "0", "U", "volVectorField", "[0 1 -1 0 0 0 0]",
                f"nonuniform List<vector> {ma.n_cells} ({body})", {
        "inlet": ("        type fixedValue;\n"
                  "        value uniform (1 0 0);\n"),
        "outlet": "        type zeroGradient;\n",
        "walls": ("        type fixedValue;\n"
                  "        value uniform (0 0 0);\n")})
    U = read_vol_field(d, "0", "U", ma, maps)
    write_vol_field(U, d, "2", ma, maps, fmt="binary", compress=True)
    assert os.path.isfile(os.path.join(d, "2", "U.gz"))
    U2 = read_vol_field(d, "2", "U", ma, maps)
    np.testing.assert_array_equal(np.asarray(U2.data),
                                  np.asarray(U.data))
    np.testing.assert_array_equal(np.asarray(U2.bvalues),
                                  np.asarray(U.bvalues))


def test_binary_surface_field_roundtrip(box, tmp_path):
    m, ma, maps = box
    d = str(tmp_path)
    rng = np.random.default_rng(9)
    from rapidcfd_tpu.fields.field import SurfaceField
    from rapidcfd_tpu.utils.dimensions import DimensionSet
    phi = SurfaceField(jnp.asarray(rng.standard_normal(ma.n_faces)),
                       DimensionSet.of(0, 3, -1), "phi")
    write_surface_field(phi, d, "0", ma, maps, fmt="binary")
    phi2 = read_surface_field(d, "0", "phi", ma, maps)
    np.testing.assert_array_equal(np.asarray(phi2.data),
                                  np.asarray(phi.data))


def test_write_format_binary_case_control(tmp_path):
    """controlDict `writeFormat binary; writeCompression compressed;`
    drives Case.write_fields, and a restart read recovers the state."""
    from rapidcfd_tpu.utils.casegen import cavity_case
    from rapidcfd_tpu.solvers.case import Case
    d = str(tmp_path / "cav")
    cavity_case(d, n=8, end_time=0.01, delta_t=0.005, write_interval=1)
    # rewrite controlDict with binary+compressed output
    cd = os.path.join(d, "system", "controlDict")
    text = open(cd).read().replace("writeFormat     ascii",
                                   "writeFormat     binary")
    if "writeFormat" not in text:
        text = text.replace("endTime;", "endTime;\nwriteFormat binary;",
                            1)
    text += "\nwriteCompression compressed;\n"
    open(cd, "w").write(text)
    case = Case(d)
    U = case.read_field("U")
    p = case.read_field("p")
    case.write_fields([U, p], time="0.005")
    path = os.path.join(d, "0.005", "U")
    assert os.path.isfile(path + ".gz") and not os.path.isfile(path)
    raw = gzip.decompress(open(path + ".gz", "rb").read())
    assert re.search(rb"format\s+binary;", raw[:2048])
    U2 = case.read_field("U", time="0.005")
    np.testing.assert_array_equal(np.asarray(U2.data),
                                  np.asarray(U.data))
