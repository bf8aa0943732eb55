"""Field file IO: read/write `<time>/<field>` in OpenFOAM format.

Keeps the reference's on-disk checkpoint contract (SURVEY.md §5.4: the
time directory IS the checkpoint; reference: GeometricField IO via
gpuListIO.C round-trips device<->host<->token-stream) so ParaView,
foamLog and stock tooling work on our cases. Handles the renumbering
permutation between file order and device order.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from ..mesh.mesharrays import MeshArrays, MeshMaps
from ..utils.dictionary import foamfile_header, parse_file
from ..utils.dimensions import DimensionSet
from .bcs import Calculated, make_bc
from .field import VolField

#: per-face keys broadcast to patch size (legacy explicit list; all other
#: numeric entries are captured generically as scalars/vectors/tables)
_BC_DATA_KEYS = ("value", "gradient", "refValue", "refGradient",
                 "valueFraction", "inletValue", "outletValue", "p0",
                 "volumetricFlowRate", "uniformValue", "freestreamValue",
                 "emissivity", "jump")

#: word entries stored as 0/1 switches so they stay jit-safe pytree leaves
_BC_SWITCH_KEYS = ("relative", "setAverage")

#: entries that are configuration words consumed by from_dict, not data
_BC_WORD_KEYS = ("type", "mode", "patchType", "neighbourPatch",
                 "fieldName", "sampleMode", "samplePatch", "sampleRegion",
                 "offsetMode", "interpolationScheme")

#: BC types using mappedPatchBase-style sampling (bcs_mapped.py)
_MAPPED_TYPES = ("mappedFixedValue", "mappedField",
                 "mappedFixedInternalValue",
                 "mappedFixedPushedInternalValue", "mappedFlowRate",
                 "mappedVelocityFluxFixedValue", "thermalBaffle1D",
                 "compressible::thermalBaffle1D")


def _capture_bc_entry(entry, dtype):
    """Convert a numeric dictionary entry to an array: scalars -> 0-d,
    `(x y z)` -> (3,), `table ((t v)...)` -> (times, values) pair.
    Returns None for word/unparseable entries (skipped)."""
    npdt = np.dtype(str(np.dtype(dtype)))
    if isinstance(entry, (int, float)):
        return np.asarray(float(entry), npdt)
    if isinstance(entry, list):
        try:
            return np.asarray(entry, npdt)
        except (TypeError, ValueError):
            return None
    if isinstance(entry, tuple) and entry and entry[0] == "table":
        rows = entry[1]
        try:
            times = np.asarray([r[0] for r in rows], npdt)
            vals = np.asarray([r[1] for r in rows], npdt)
        except (TypeError, ValueError, IndexError):
            return None
        return ("table", times, vals)
    return None


def _capture_jump_table(pd, bd, dtype, case_dir):
    """jumpTable DataEntry (fan/uniformJump) and fanCurve fileName
    (fanPressure) into jit-safe bd leaves: jump_times/jump_values
    (table), jump_poly ((n,2) coeff/exponent rows), or jump_const."""
    npdt = np.dtype(str(np.dtype(dtype)))
    e = pd.lookup("jumpTable")
    if isinstance(e, tuple) and len(e) >= 2:
        kind = e[0]
        if kind == "constant":
            bd["jump_const"] = jnp.asarray(float(e[1]), npdt)
        elif kind == "table":
            rows = e[1]
            bd["jump_times"] = jnp.asarray([r[0] for r in rows], npdt)
            bd["jump_values"] = jnp.asarray([r[1] for r in rows], npdt)
        elif kind == "polynomial":
            bd["jump_poly"] = jnp.asarray(e[1], npdt)
        else:
            raise NotImplementedError(
                f"jumpTable DataEntry type '{kind}' not supported "
                "(constant|table|polynomial)")
    elif isinstance(e, (int, float)):
        bd["jump_const"] = jnp.asarray(float(e), npdt)
    fn = pd.lookup("fileName")
    if fn is not None and "jump_times" not in bd:
        from ..utils.function1 import _read_foam_table
        path = str(fn).strip('"').replace("$FOAM_CASE", case_dir)
        if not os.path.isabs(path):
            path = os.path.join(case_dir, "constant", path)
        t, v = _read_foam_table(path)
        bd["jump_times"] = jnp.asarray(t, npdt)
        bd["jump_values"] = jnp.asarray(v, npdt)


def _parse_value(entry, n: int, dtype, stash=None):
    """Parse `uniform v`, `uniform (x y z)`, `nonuniform List<T> N (...)`.
    Binary files put a `__binK__` placeholder word where the payload was
    (utils/foambin.decode_binary_dict); stash resolves it. Returns NUMPY
    (field construction stays host-side; a single jitted boundary
    correction materializes on device — avoids the per-eager-op dispatch
    cost of remote TPU backends)."""
    npdt = np.dtype(str(np.dtype(dtype)))
    if isinstance(entry, (int, float)):
        return np.full((n,), float(entry), npdt)
    if isinstance(entry, tuple):
        items = list(entry)
        if items[0] == "uniform":
            v = items[1]
            if isinstance(v, list):
                return np.broadcast_to(
                    np.asarray(v, npdt), (n, len(v))).copy()
            return np.full((n,), float(v), npdt)
        if items[0] == "nonuniform":
            payload = items[-1]
            if isinstance(payload, str) and stash is not None \
                    and payload in stash:
                payload = stash[payload]
            if isinstance(payload, int):  # `nonuniform List<scalar> 0 ()`
                payload = []
            arr = np.asarray(payload, dtype=float)
            if arr.ndim == 0:
                arr = arr.reshape(0)
            if arr.shape[0] != n:
                raise ValueError(
                    f"nonuniform field has {arr.shape[0]} entries, "
                    f"expected {n}")
            return arr.astype(npdt)
    if isinstance(entry, list):
        return np.broadcast_to(np.asarray(entry, npdt),
                               (n, len(entry))).copy()
    raise ValueError(f"cannot parse field value: {entry!r}")


def read_vol_field(case_dir: str, time: str, name: str, mesh: MeshArrays,
                   maps: MeshMaps, dtype=None) -> VolField:
    if dtype is None:
        from ..mesh.mesharrays import default_dtype
        dtype = default_dtype()
    d = parse_file(os.path.join(case_dir, time, name))
    dims = d.lookup("dimensions", required=True)
    assert isinstance(dims, DimensionSet)
    stash = getattr(d, "binstash", None)
    data = _parse_value(d.lookup("internalField", required=True),
                        mesh.n_cells, dtype, stash)
    # file order -> device (renumbered) order (numpy, host-side)
    data = data[maps.cell_perm]

    bfield = d.subdict("boundaryField")
    bcs, bcdata = [], []
    rank_shape = data.shape[1:]
    bvalues = np.zeros((mesh.n_boundary,) + rank_shape, data.dtype)
    for i, patch in enumerate(mesh.patches):
        pd = bfield.lookup(patch.name)
        if pd is None:
            raise KeyError(f"field {name}: no boundaryField entry for "
                           f"patch '{patch.name}'")
        bc_type = pd.word("type")
        if bc_type == "uniformFixedValue" and isinstance(
                pd.lookup("uniformValue"), tuple) and \
                pd.lookup("uniformValue")[0] == "table":
            bc_type = "timeVaryingUniformFixedValue"
        bc = make_bc(bc_type, i, pd)
        bd = {}
        for key in _BC_DATA_KEYS:
            if pd.lookup(key) is not None:
                try:
                    v = _parse_value(pd.lookup(key), patch.size, dtype,
                                     stash)
                except ValueError:
                    continue  # e.g. `uniformValue table (...)`: generic
                bd[key] = jnp.asarray(v)
        # Switch-valued entries (yes/no words) stored as 0/1 scalars so
        # they stay jit-safe pytree leaves
        for key in _BC_SWITCH_KEYS:
            if pd.lookup(key) is not None:
                w = pd.word(key)
                bd[key] = jnp.asarray(
                    1.0 if w in ("yes", "true", "on", "1") else 0.0,
                    dtype)
        # generic numeric capture: scalar/vector/table parameters
        # (origin, axis, omega, intensity, lInf, ...) without a fixed
        # key list
        for key in pd:
            if key in bd or key in _BC_WORD_KEYS or key in _BC_SWITCH_KEYS:
                continue
            cap = _capture_bc_entry(pd.lookup(key), dtype)
            if cap is None:
                continue
            if isinstance(cap, tuple) and cap[0] == "table":
                bd["table_times"] = jnp.asarray(cap[1])
                bd["table_values"] = jnp.asarray(cap[2])
            else:
                bd[key] = jnp.asarray(cap)
        if bc_type in ("fan", "fanPressure", "uniformJump",
                       "uniformJumpAMI"):
            _capture_jump_table(pd, bd, dtype, case_dir)
        if bc_type == "timeVaryingMappedFixedValue":
            _load_boundary_data(case_dir, name, patch, mesh, bd, dtype)
        if bc_type in _MAPPED_TYPES:
            _setup_mapped(name, patch, mesh, pd, bd)
        bcs.append(bc)
        bcdata.append(bd)
        if "value" in bd:
            bvalues[patch.bstart:patch.bstart + patch.size] = \
                np.broadcast_to(np.asarray(bd["value"]),
                                bvalues[patch.bstart:patch.bstart
                                        + patch.size].shape)

    f = VolField(jnp.asarray(data), jnp.asarray(bvalues), tuple(bcs),
                 dims, name, tuple(bcdata))
    # one jitted program instead of ~3 eager ops per patch
    import jax as _jax
    return _jax.jit(lambda ff: ff.correct_boundary_conditions(mesh))(f)


def _setup_mapped(field_name, patch, mesh, pd, bd):
    """Resolve the mappedPatchBase sampling map host-side into static
    index tables (see fields/bcs_mapped.py): map_cells (nearestCell),
    or map_bfaces/map_faces/map_bcells (nearestPatchFace(/AMI)/
    nearestFace). Cross-region sampling is left unresolved (the BC then
    holds its stored value)."""
    region = pd.word("sampleRegion") if pd.lookup("sampleRegion") \
        is not None else None
    if region not in (None, "region0"):
        import sys
        print(f"mapped BC on '{patch.name}' ({field_name}): "
              f"sampleRegion '{region}' is not this mesh — mapping "
              "left unresolved (holds stored value)", file=sys.stderr)
        return
    mode = pd.word("sampleMode") if pd.lookup("sampleMode") is not None \
        else "nearestPatchFace"
    offset_mode = pd.word("offsetMode") if pd.lookup("offsetMode") \
        is not None else None
    cf = np.asarray(mesh.patch_cf(patch), np.float64)
    sample = cf.copy()
    if offset_mode == "normal" or (offset_mode is None
                                   and pd.lookup("distance") is not None):
        dist = float(pd.scalar("distance", 0.0))
        nf = np.asarray(mesh.patch_normals(patch), np.float64)
        sample += dist * nf
    else:
        off = pd.lookup("offsets")
        if off is not None:
            sample += np.asarray(off, np.float64).reshape(-1, 3)
        else:
            off = pd.lookup("offset")
            if off is not None:
                sample += np.asarray(off, np.float64)
    from scipy.spatial import cKDTree
    if mode == "nearestCell":
        _, idx = cKDTree(np.asarray(mesh.C, np.float64)).query(sample)
        bd["map_cells"] = jnp.asarray(idx, jnp.int32)
        return
    # face modes: search the sample patch (nearestPatchFace(/AMI)) or
    # every boundary face (nearestFace)
    sp = pd.word("samplePatch") if pd.lookup("samplePatch") is not None \
        else None
    pts, faces, bfaces, cells = [], [], [], []
    for q in mesh.patches:
        if q.is_empty or q.size == 0:
            continue
        if mode in ("nearestPatchFace", "nearestPatchFaceAMI") \
                and sp is not None and q.name != sp:
            continue
        pts.append(np.asarray(mesh.patch_cf(q), np.float64))
        faces.append(np.arange(q.start, q.start + q.size))
        bfaces.append(np.arange(q.bstart, q.bstart + q.size))
        cells.append(np.asarray(mesh.owner[q.start:q.start + q.size]))
    if not pts:
        return
    _, idx = cKDTree(np.concatenate(pts)).query(sample)
    bd["map_faces"] = jnp.asarray(np.concatenate(faces)[idx], jnp.int32)
    bd["map_bfaces"] = jnp.asarray(np.concatenate(bfaces)[idx], jnp.int32)
    bd["map_bcells"] = jnp.asarray(np.concatenate(cells)[idx], jnp.int32)


def _read_raw_numbers(path: str) -> np.ndarray:
    """Parse a boundaryData-style raw file: comments stripped, all
    numbers extracted in order (reference: timeVaryingMappedFixedValue
    reads constant/boundaryData/<patch>/{points,<time>/<field>})."""
    import re
    with open(path) as f:
        text = f.read()
    text = re.sub(r"/\*.*?\*/", " ", text, flags=re.S)
    text = re.sub(r"//[^\n]*", " ", text)
    # drop a FoamFile header dict if present
    text = re.sub(r"FoamFile\s*\{[^}]*\}", " ", text, flags=re.S)
    nums = re.findall(r"[-+]?\d+\.?\d*(?:[eE][-+]?\d+)?", text)
    return np.asarray([float(v) for v in nums])


def _load_boundary_data(case_dir, field_name, patch, mesh, bd, dtype):
    """Fill bd['tvm_times'/'tvm_values'] for timeVaryingMappedFixedValue
    from constant/boundaryData/<patch>/; nearest-point mapping from the
    sample points to the patch face centres."""
    root = os.path.join(case_dir, "constant", "boundaryData", patch.name)
    if not os.path.isdir(root):
        return
    pts = _read_raw_numbers(os.path.join(root, "points"))
    n_pts = pts.size // 3
    pts = pts[:n_pts * 3].reshape(n_pts, 3)
    # leading count token (if the file had `N ( ... )`) makes size 3n+1
    if pts.shape[0] * 3 != _read_raw_numbers(
            os.path.join(root, "points")).size:
        raw = _read_raw_numbers(os.path.join(root, "points"))
        pts = raw[1:1 + (raw.size - 1) // 3 * 3].reshape(-1, 3)
    times = sorted(
        (float(d), d) for d in os.listdir(root)
        if os.path.isdir(os.path.join(root, d))
        and os.path.isfile(os.path.join(root, d, field_name)))
    if not times:
        return
    cf = np.asarray(mesh.patch_cf(patch))
    from scipy.spatial import cKDTree
    _, nearest = cKDTree(pts).query(cf)
    stacked = []
    for _, dname in times:
        raw = _read_raw_numbers(os.path.join(root, dname, field_name))
        if raw.size >= pts.shape[0] * 3:  # vector samples
            vals = raw[-pts.shape[0] * 3:].reshape(-1, 3)
        else:
            vals = raw[-pts.shape[0]:]
        stacked.append(vals[nearest])
    bd["tvm_times"] = jnp.asarray(
        np.asarray([t for t, _ in times], dtype=np.dtype(str(np.dtype(
            dtype)))))
    bd["tvm_values"] = jnp.asarray(np.stack(stacked).astype(
        np.dtype(str(np.dtype(dtype)))))


def _fmt_scalar(v: float, prec: int = 8) -> str:
    return f"{v:.{prec}g}"


def _body_value(arr: np.ndarray, prec: int = 8, binary: bool = False):
    if binary and arr.size:
        # binary nonuniform list: ascii prefix + raw-double block
        # (utils/foambin.fmt_list matches the reference framing)
        from ..utils import foambin
        comp = "scalar" if arr.ndim == 1 else (
            "vector" if arr.shape[1] == 3 else f"Type{arr.shape[1]}")
        return (f"nonuniform List<{comp}>".encode("latin-1")
                + foambin.fmt_list(arr))
    if arr.ndim == 1:
        if np.all(arr == arr[0] if arr.size else True) and arr.size:
            return f"uniform {_fmt_scalar(float(arr[0]), prec)}"
        body = "\n".join(_fmt_scalar(float(v), prec) for v in arr)
        return (f"nonuniform List<scalar>\n{arr.shape[0]}\n(\n{body}\n)")
    comp = "vector" if arr.shape[1] == 3 else f"Type{arr.shape[1]}"
    if arr.size and np.all(arr == arr[0]):
        return ("uniform ("
                + " ".join(_fmt_scalar(float(v), prec) for v in arr[0]) + ")")
    rows = "\n".join(
        "(" + " ".join(_fmt_scalar(float(v), prec) for v in row) + ")"
        for row in arr)
    return f"nonuniform List<{comp}>\n{arr.shape[0]}\n(\n{rows}\n)"


def _dims_str(dims: DimensionSet) -> str:
    return "[" + " ".join(str(int(e)) if e.denominator == 1 else str(float(e))
                          for e in dims.as_tuple()) + "]"


def _emit(path: str, parts, compress: bool):
    """Join str/bytes parts and write, gzipping to <path>.gz when
    compress (reference: writeCompression compressed)."""
    import gzip
    payload = b"".join(p if isinstance(p, bytes) else p.encode("latin-1")
                       for p in parts)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    if compress:
        with gzip.open(path + ".gz", "wb") as f:
            f.write(payload)
        if os.path.isfile(path):
            os.remove(path)
    else:
        with open(path, "wb") as f:
            f.write(payload)
        stale = path + ".gz"
        if os.path.isfile(stale):
            os.remove(stale)


def write_vol_field(field: VolField, case_dir: str, time: str,
                    mesh: MeshArrays, maps: MeshMaps, prec: int = 8,
                    fmt: str = "ascii", compress: bool = False):
    """fmt='binary' writes every nonuniform list as a raw-double block
    (the reference's `writeFormat binary`); a binary-format file must
    not contain ascii nonuniform lists, so the flag threads through all
    values. compress gzips the file (`writeCompression compressed`)."""
    from ..utils.registry import _TABLES
    binary = fmt == "binary"
    cls = ("volScalarField" if field.data.ndim == 1 else "volVectorField")
    data = maps.cells_to_file(np.asarray(field.data))
    lines = [foamfile_header(cls, field.name, time, fmt=fmt),
             f"\ndimensions      {_dims_str(field.dims)};\n\n",
             "internalField   ", _body_value(data, prec, binary),
             ";\n\n", "boundaryField\n{\n"]
    # reverse lookup BC class -> dictionary word
    word_of = {}
    for w, c in _TABLES.get("fvPatchField", {}).items():
        word_of.setdefault(c, w)
    bvals = np.asarray(field.bvalues)
    for bc, bd in zip(field.bcs, field.bcdata):
        if not isinstance(bd, dict):  # fields built with () placeholders
            bd = {}
        patch = mesh.patches[bc.patch]
        w = getattr(bc, "word", None) or word_of.get(type(bc), "calculated")
        lines.append(f"    {patch.name}\n    {{\n"
                     f"        type            {w};\n")
        pb = bvals[patch.bstart:patch.bstart + patch.size]
        if isinstance(bc, Calculated) or "value" in bd:
            lines += ["        value           ",
                      _body_value(pb, prec, binary), ";\n"]
        for key, v in bd.items():
            if key == "value" or key.startswith(("tvm_", "table_",
                                                 "map_", "jump_")):
                continue
            arr = np.asarray(v)
            if arr.ndim == 0:
                body = _fmt_scalar(float(arr), prec)
            elif arr.ndim == 1 and arr.shape[0] == 3 \
                    and patch.size != 3:
                body = "(" + " ".join(
                    _fmt_scalar(float(x), prec) for x in arr) + ")"
            else:
                body = _body_value(arr, prec, binary)
            lines += [f"        {key}           ", body, ";\n"]
        lines.append("    }\n")
    lines.append("}\n")
    _emit(os.path.join(case_dir, time, field.name), lines, compress)


# ---------------------------------------------------------------------------
# surface fields (face fluxes) — checkpoint parity for phi
# ---------------------------------------------------------------------------

def write_surface_field(sf, case_dir: str, time: str, mesh: MeshArrays,
                        maps: MeshMaps, prec: int = 8,
                        fmt: str = "ascii", compress: bool = False):
    """Write a SurfaceField (e.g. phi) as a surfaceScalarField file
    (reference: restart reads phi if present; createPhi.H otherwise)."""
    binary = fmt == "binary"
    data = maps.faces_to_file(np.asarray(sf.data))
    n_int = mesh.n_internal
    lines = [foamfile_header("surfaceScalarField", sf.name or "phi",
                             time, fmt=fmt),
             f"\ndimensions      {_dims_str(sf.dims)};\n\n",
             "internalField   ", _body_value(data[:n_int], prec, binary),
             ";\n\n", "boundaryField\n{\n"]
    for patch in mesh.patches:
        pb = data[patch.start:patch.start + patch.size]
        lines += [f"    {patch.name}\n    {{\n"
                  "        type            calculated;\n"
                  "        value           ",
                  _body_value(pb, prec, binary), ";\n    }\n"]
    lines.append("}\n")
    _emit(os.path.join(case_dir, time, sf.name or "phi"), lines,
          compress)


def read_surface_field(case_dir: str, time: str, name: str,
                       mesh: MeshArrays, maps: MeshMaps, dtype=None):
    """Read a surfaceScalarField written by write_surface_field (or the
    reference): internal values + per-patch boundary values."""
    from ..fields.field import SurfaceField
    if dtype is None:
        from ..mesh.mesharrays import default_dtype
        dtype = default_dtype()
    d = parse_file(os.path.join(case_dir, time, name))
    dims = d.lookup("dimensions", required=True)
    stash = getattr(d, "binstash", None)
    internal = np.asarray(_parse_value(
        d.lookup("internalField", required=True), mesh.n_internal, dtype,
        stash))
    data = np.zeros(mesh.n_faces, internal.dtype)
    data[:mesh.n_internal] = internal
    bfield = d.subdict("boundaryField")
    for patch in mesh.patches:
        pd = bfield.lookup(patch.name)
        if pd is None or pd.lookup("value") is None:
            continue
        data[patch.start:patch.start + patch.size] = np.asarray(
            _parse_value(pd.lookup("value"), patch.size, dtype, stash))
    data = maps.faces_to_device(data)
    return SurfaceField(jnp.asarray(data), dims, name)
