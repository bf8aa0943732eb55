"""topoSet: geometric set construction, set IO, fvOptions cellSet/cellZone
selection (reference: src/meshTools/sets/topoSetSources, fvOption cellSetOption)."""

import os

import numpy as np

from rapidcfd_tpu.utils.casegen import _write, cavity_case
from rapidcfd_tpu.utils.dictionary import foamfile_header


def _toposet_dict(d, body):
    _write(os.path.join(d, "system", "topoSetDict"),
           foamfile_header("dictionary", "topoSetDict", "system"),
           "\nactions\n(\n%s\n);\n" % body)


def test_box_sphere_actions(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("tset"))
    cavity_case(d, n=10)
    from rapidcfd_tpu.mesh.toposet import read_set, run_toposet
    from rapidcfd_tpu.solvers.case import Case
    case = Case(d)
    _toposet_dict(d, """
    { name lowerHalf; type cellSet; action new; source boxToCell;
      sourceInfo { box ((0 0 0) (0.1 0.05 0.01)); } }
    { name lowerHalf; type cellSet; action delete; source sphereToCell;
      sourceInfo { centre (0.05 0.05 0.005); radius 0.02; } }
    { name inv; type cellSet; action new; source cellToCell;
      sourceInfo { set lowerHalf; } }
    { name inv; type cellSet; action invert; }
""")
    sets = run_toposet(case.pmesh, d)
    # geometric truth in FILE ordering
    from rapidcfd_tpu.mesh.geometry import (cell_centres_and_vols,
                                            face_centres_and_areas)
    Cf, Sf = face_centres_and_areas(case.pmesh)
    C, _ = cell_centres_and_vols(case.pmesh, Cf, Sf)
    want = np.where((C[:, 1] <= 0.05)
                    & (((C - [0.05, 0.05, 0.005]) ** 2).sum(1) > 0.02**2)
                    )[0]
    got = sets["lowerHalf"]
    assert np.array_equal(np.sort(got), np.sort(want))
    # inverted complement
    assert np.array_equal(
        np.sort(np.concatenate([sets["inv"], got])),
        np.arange(case.pmesh.n_cells))
    # persisted + re-readable
    assert np.array_equal(np.sort(read_set(d, "lowerHalf")), np.sort(want))


def test_fvoptions_cellset_selection(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("tsel"))
    cavity_case(d, n=10)
    from rapidcfd_tpu.mesh.toposet import run_toposet
    from rapidcfd_tpu.models.fvoptions import _selection_mask
    from rapidcfd_tpu.solvers.case import Case
    from rapidcfd_tpu.utils.dictionary import Dictionary, parse_dictionary
    case = Case(d)
    _toposet_dict(d, """
    { name lower; type cellSet; action new; source boxToCell;
      sourceInfo { box ((0 0 0) (0.1 0.05 0.01)); } }
""")
    run_toposet(case.pmesh, d)
    m_set = _selection_mask(
        case.mesh,
        parse_dictionary("selectionMode cellSet; cellSet lower;"), case)
    m_box = _selection_mask(
        case.mesh,
        parse_dictionary("selectionMode box; "
                     "box ((0 0 0) (0.1 0.05 0.01));"), case)
    assert np.array_equal(np.asarray(m_set), np.asarray(m_box))
    assert 0 < float(np.sum(np.asarray(m_set))) < case.mesh.n_cells
