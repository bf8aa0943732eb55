"""Function1 / interpolationTable zoo (reference:
src/OpenFOAM/primitives/functions/DataEntry,
interpolations/interpolationTable)."""

import math
import os

import numpy as np
import pytest

from rapidcfd_tpu.utils.dictionary import parse_dictionary
from rapidcfd_tpu.utils.function1 import Function1, InterpolationTable


def _f1(text, key, case_dir="."):
    return Function1.from_entry(parse_dictionary(text), key,
                                case_dir=case_dir)


def test_constant_forms():
    assert _f1("k constant 3.2;", "k")(0.7) == 3.2
    assert _f1("k 4.5;", "k")(9.0) == 4.5
    f = Function1.from_entry(parse_dictionary(""), "missing", default=7.0)
    assert f(1.0) == 7.0
    with pytest.raises(KeyError):
        Function1.from_entry(parse_dictionary(""), "missing")


def test_table_scalar_and_vector():
    f = _f1("k table ((0 0) (1 2) (2 0));", "k")
    assert f(0.5) == 1.0
    assert f(1.5) == 1.0
    assert f(-1.0) == 0.0 and f(5.0) == 0.0     # clamp
    v = _f1("k table ((0 (0 0 0)) (1 (2 4 0)));", "k")
    assert np.allclose(v(0.25), [0.5, 1.0, 0.0])


def test_out_of_bounds_modes():
    t = [0.0, 1.0]
    v = [0.0, 2.0]
    assert InterpolationTable(t, v, "clamp")(3.0) == 2.0
    assert InterpolationTable(t, v, "repeat")(2.5) == 1.0
    with pytest.raises(ValueError):
        InterpolationTable(t, v, "error")(3.0)
    with pytest.raises(ValueError):
        InterpolationTable([1.0, 0.0], v)       # non-ascending
    with pytest.raises(KeyError):
        InterpolationTable(t, v, "bogus")


def test_integrate():
    tab = InterpolationTable([0.0, 1.0, 2.0], [0.0, 2.0, 0.0])
    assert abs(tab.integrate(0.0, 2.0) - 2.0) < 1e-12
    assert abs(tab.integrate(0.5, 1.5) - 1.5) < 1e-12


def test_polynomial_sine_square():
    p = _f1("k polynomial ((1 0) (2 1) (3 2));", "k")
    assert abs(p(2.0) - (1 + 4 + 12)) < 1e-12
    s = _f1("k sine;\nkCoeffs { amplitude 2; frequency 0.25; level 1; }",
            "k")
    assert abs(s(1.0) - (1 + 2 * math.sin(math.pi / 2))) < 1e-12
    q = _f1("k square;\nkCoeffs { amplitude 1; frequency 1; }", "k")
    assert q(0.1) == 1.0 and q(0.6) == -1.0


def test_table_file_and_csv(tmp_path):
    ft = tmp_path / "ramp.dat"
    ft.write_text("(\n(0 0)\n(2 4)\n)\n")
    f = _f1('k tableFile;\nkCoeffs { fileName "ramp.dat"; }', "k",
            case_dir=str(tmp_path))
    assert f(1.0) == 2.0
    fc = tmp_path / "f.csv"
    fc.write_text("t,val\n0,1\n1,3\n")
    g = _f1('k csvFile;\nkCoeffs { fileName "f.csv"; nHeaderLine 1; '
            "refColumn 0; componentColumns (1); }", "k",
            case_dir=str(tmp_path))
    assert g(0.5) == 2.0
