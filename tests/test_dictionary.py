"""Foundation tests: dictionary parser, dimensions, registry, Time."""

import os
import textwrap

import pytest

from rapidcfd_tpu.utils.dictionary import (
    Dictionary, ParseError, parse_dictionary, parse_file)
from rapidcfd_tpu.utils.dimensions import (
    DimensionError, DimensionSet, dim_pressure, dim_velocity, dimless)
from rapidcfd_tpu.utils import registry


CONTROL = """
/* header comment */
FoamFile
{
    version     2.0;
    format      ascii;
    class       dictionary;
    object      controlDict;
}
// line comment
application     icoFoam;
startFrom       startTime;
startTime       0;
stopAt          endTime;
endTime         0.5;
deltaT          0.005;
writeControl    timeStep;
writeInterval   20;
purgeWrite      0;
writeFormat     ascii;
writePrecision  6;
runTimeModifiable true;
"""


def test_parse_control_dict():
    d = parse_dictionary(CONTROL)
    assert d["application"] == "icoFoam"
    assert d["deltaT"] == 0.005
    assert d["writeInterval"] == 20
    assert isinstance(d["FoamFile"], Dictionary)
    assert d["FoamFile"]["class"] == "dictionary"
    assert d.boolean("runTimeModifiable")


def test_nested_and_lists():
    d = parse_dictionary("""
        solvers
        {
            p
            {
                solver          PCG;
                preconditioner  DIC;
                tolerance       1e-06;
                relTol          0.05;
            }
            "(U|k|epsilon)"
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
        }
        value uniform (1 0 0);
        pts ( (0 0 0) (1 0 0) );
    """)
    p = d.subdict("solvers").subdict("p")
    assert p["solver"] == "PCG"
    assert p["tolerance"] == 1e-06
    # regex keyword matching
    u = d.subdict("solvers").lookup("U")
    assert u["solver"] == "smoothSolver"
    eps = d.subdict("solvers").lookup("epsilon")
    assert eps["tolerance"] == 1e-05
    assert d.subdict("solvers").lookup("pFinal") is None
    assert d["value"] == ("uniform", [1, 0, 0])
    assert d["pts"] == [[0, 0, 0], [1, 0, 0]]


def test_scheme_words_with_parens():
    d = parse_dictionary("""
        divSchemes
        {
            default         none;
            div(phi,U)      Gauss linear;
            div(phi,k)      Gauss limitedLinear 1;
            div((nuEff*dev(T(grad(U))))) Gauss linear;
        }
    """)
    ds = d.subdict("divSchemes")
    assert ds["div(phi,U)"] == ("Gauss", "linear")
    assert ds["div(phi,k)"] == ("Gauss", "limitedLinear", 1)
    assert ds["div((nuEff*dev(T(grad(U)))))"] == ("Gauss", "linear")


def test_dimensions_entry_and_algebra():
    d = parse_dictionary("""
        dimensions [0 2 -2 0 0 0 0];
        nu nu [0 2 -1 0 0 0 0] 0.01;
    """)
    assert d["dimensions"] == DimensionSet.of(0, 2, -2)
    name, dims, val = d["nu"]
    assert dims == DimensionSet.of(0, 2, -1) and val == 0.01

    assert dim_pressure / (dim_velocity * dim_velocity) == \
        DimensionSet.of(1, -3, 0)
    with pytest.raises(DimensionError):
        dim_pressure.check_same(dim_velocity)
    assert (dim_velocity ** 2).sqrt() == dim_velocity
    assert dimless.dimensionless


def test_macro_expansion():
    d = parse_dictionary("""
        x 42;
        sub { y $x; }
    """)
    assert d.subdict("sub")["y"] == 42


def test_include(tmp_path):
    (tmp_path / "inc").write_text("foo 7;\n")
    (tmp_path / "main").write_text('#include "inc"\nbar 8;\n')
    d = parse_file(str(tmp_path / "main"))
    assert d["foo"] == 7 and d["bar"] == 8
    (tmp_path / "main2").write_text('#includeIfPresent "nope"\nbar 9;\n')
    assert parse_file(str(tmp_path / "main2"))["bar"] == 9


def test_codestream_rejected():
    with pytest.raises(ParseError):
        parse_dictionary('x #codeStream { code "" };')


def test_registry():
    @registry.register("testTable", "alpha", "alias")
    def make():
        return 1
    assert registry.lookup("testTable", "alpha") is make
    assert registry.lookup("testTable", "alias") is make
    with pytest.raises(KeyError):
        registry.lookup("testTable", "nope")


def test_time_loop(tmp_path):
    sysd = tmp_path / "system"
    sysd.mkdir()
    (sysd / "controlDict").write_text(textwrap.dedent("""
        startFrom startTime; startTime 0; endTime 0.05; deltaT 0.01;
        writeControl timeStep; writeInterval 2;
    """))
    from rapidcfd_tpu.utils.timecontrol import Time
    t = Time(str(tmp_path))
    steps = []
    writes = 0
    while t.loop():
        steps.append(t.value)
        if t.write_time():
            writes += 1
            t.mark_written()
    assert len(steps) == 5
    assert abs(steps[-1] - 0.05) < 1e-12
    assert writes == 2
    assert t.name in ("0.05",)
