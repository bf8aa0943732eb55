"""Function1 / interpolationTable — scalar- and vector-valued f(t).

Capability surface of the reference's DataEntry/Function1 zoo and
interpolationTable (reference: src/OpenFOAM/primitives/functions/
DataEntry/{constant,table,tableFile,polynomial,sine,square,csvFile},
src/OpenFOAM/interpolations/interpolationTable/interpolationTable.H:59
with outOfBounds clamp|repeat|error): time-dependent coefficients for
boundary conditions, fvOptions source strengths and solver ramps.

Host-side evaluation by design (these feed per-step scalars into the
jitted program as arguments); `jnp_value(t)` returns a traced-safe
interpolation for use INSIDE jit when t is a traced scalar.
"""

from __future__ import annotations

import math
import os

import numpy as np

from .dictionary import Dictionary


class InterpolationTable:
    """Piecewise-linear (t, value) table with out-of-bounds handling."""

    def __init__(self, times, values, out_of_bounds: str = "clamp"):
        self.t = np.asarray(times, float)
        self.v = np.asarray(values, float)
        if self.t.ndim != 1 or self.t.size == 0:
            raise ValueError("interpolationTable: empty table")
        if np.any(np.diff(self.t) < 0):
            raise ValueError("interpolationTable: times not ascending")
        if out_of_bounds not in ("clamp", "repeat", "error", "warn"):
            raise KeyError(f"outOfBounds '{out_of_bounds}' "
                           "(clamp|repeat|error|warn)")
        self.oob = out_of_bounds

    def _map_time(self, t: float) -> float:
        lo, hi = self.t[0], self.t[-1]
        if lo <= t <= hi:
            return t
        if self.oob == "repeat":
            span = hi - lo
            return lo + (t - lo) % span if span > 0 else lo
        if self.oob == "error":
            raise ValueError(f"interpolationTable: t={t} outside "
                             f"[{lo}, {hi}]")
        return min(max(t, lo), hi)     # clamp / warn

    def __call__(self, t: float):
        t = self._map_time(float(t))
        i = np.searchsorted(self.t, t, side="right") - 1
        i = min(max(i, 0), self.t.size - 2) if self.t.size > 1 else 0
        if self.t.size == 1:
            return self.v[0]
        t0, t1 = self.t[i], self.t[i + 1]
        f = 0.0 if t1 == t0 else (t - t0) / (t1 - t0)
        return (1 - f) * self.v[i] + f * self.v[i + 1]

    def integrate(self, t0: float, t1: float):
        """Trapezoidal integral of the table between t0 and t1."""
        ts = self.t[(self.t > t0) & (self.t < t1)]
        knots = np.concatenate([[t0], ts, [t1]])
        vals = np.array([self(t) for t in knots])
        dt = np.diff(knots)
        if self.v.ndim > 1:
            return (0.5 * dt[:, None]
                    * (vals[1:] + vals[:-1])).sum(axis=0)
        return float((0.5 * dt * (vals[1:] + vals[:-1])).sum())


def _read_foam_table(path: str):
    """Parse an OpenFOAM table file: `( (t v) (t (vx vy vz)) ... )`
    with optional comments (reference tableFile format)."""
    import re
    text = open(path).read()
    text = re.sub(r"//[^\n]*|/\*.*?\*/", " ", text, flags=re.S)
    nums = re.findall(r"[-+0-9.eE]+", text)
    vals = np.array([float(x) for x in nums])
    rows = text.count("(") - 1          # outer paren
    if rows <= 0 or vals.size % rows:
        raise ValueError(f"{path}: malformed table")
    ncol = vals.size // rows
    arr = vals.reshape(rows, ncol)
    t = arr[:, 0]
    v = arr[:, 1] if ncol == 2 else arr[:, 1:]
    return t, v


class Function1:
    """f(t) selected from a dictionary entry (reference Function1::New).

    Accepted entry forms for key k:
        k constant 3.2;             k 3.2;
        k table ((0 0) (1 2));      k table ((0 (0 0 0)) (1 (1 0 0)));
        k tableFile; kCoeffs { fileName "f.dat"; outOfBounds clamp; }
        k csvFile;   kCoeffs { fileName "f.csv"; componentColumns (1); }
        k polynomial ((1 0) (2 1)); // sum c*t^e as (coeff exponent)
        k sine;   kCoeffs { amplitude 1; frequency 2; level 0; phase 0; }
        k square; kCoeffs { amplitude 1; frequency 2; level 0;
                            markSpace 1; }
    """

    def __init__(self, kind: str, fn, description: str = ""):
        self.kind = kind
        self._fn = fn
        self.description = description

    def __call__(self, t: float):
        return self._fn(float(t))

    def value(self, t: float):
        return self._fn(float(t))

    # -- construction ----------------------------------------------------------
    @staticmethod
    def from_entry(d: Dictionary, key: str, default=None,
                   case_dir: str = ".") -> "Function1":
        ent = d.lookup(key)
        if ent is None:
            if default is None:
                raise KeyError(f"Function1 '{key}' not found")
            return Function1("constant", lambda t: default)
        if isinstance(ent, (int, float)):
            v = float(ent)
            return Function1("constant", lambda t: v)
        toks = list(ent) if isinstance(ent, (tuple, list)) else [ent]
        word = str(toks[0])
        coeffs = d.subdict(key + "Coeffs", required=False) \
            or (toks[1] if len(toks) > 1
                and isinstance(toks[1], Dictionary) else None) \
            or Dictionary()

        if word == "constant":
            v = np.asarray(toks[1], float) if len(toks) > 1 else 0.0
            return Function1("constant", lambda t: v)
        if word == "table":
            rows = toks[1] if len(toks) > 1 else []
            t = np.array([float(r[0]) for r in rows])
            v = np.array([np.asarray(r[1], float) for r in rows])
            tab = InterpolationTable(
                t, v, str(coeffs.word("outOfBounds", "clamp")))
            return Function1("table", tab)
        if word in ("tableFile", "csvFile"):
            path = str(coeffs.word("fileName", key + ".dat")).strip('"')
            path = os.path.join(case_dir, path) \
                if not os.path.isabs(path) else path
            if word == "csvFile":
                nskip = int(coeffs.scalar("nHeaderLine", 0))
                raw = np.genfromtxt(path, delimiter=",",
                                    skip_header=nskip)
                raw = np.atleast_2d(raw)
                refcol = int(coeffs.scalar("refColumn", 0))
                comp = coeffs.lookup("componentColumns")
                cols = [int(c) for c in comp] if comp is not None \
                    else list(range(1, raw.shape[1]))
                t = raw[:, refcol]
                v = raw[:, cols]
                if v.shape[1] == 1:
                    v = v[:, 0]
            else:
                t, v = _read_foam_table(path)
            tab = InterpolationTable(
                t, v, str(coeffs.word("outOfBounds", "clamp")))
            return Function1(word, tab)
        if word == "polynomial":
            rows = toks[1] if len(toks) > 1 else []
            ce = np.array([[float(r[0]), float(r[1])] for r in rows])
            return Function1("polynomial", lambda t: float(
                (ce[:, 0] * t ** ce[:, 1]).sum()))
        if word == "sine":
            a = float(coeffs.scalar("amplitude", 1.0))
            f = float(coeffs.scalar("frequency", 1.0))
            lv = float(coeffs.scalar("level", 0.0))
            ph = float(coeffs.scalar("phase", 0.0))
            t0 = float(coeffs.scalar("t0", 0.0))
            return Function1("sine", lambda t: lv + a * math.sin(
                2 * math.pi * f * (t - t0) + ph))
        if word == "square":
            a = float(coeffs.scalar("amplitude", 1.0))
            f = float(coeffs.scalar("frequency", 1.0))
            lv = float(coeffs.scalar("level", 0.0))
            ms = float(coeffs.scalar("markSpace", 1.0))
            t0 = float(coeffs.scalar("t0", 0.0))
            frac_up = ms / (1.0 + ms)

            def sq(t):
                ph = ((t - t0) * f) % 1.0
                return lv + (a if ph < frac_up else -a)
            return Function1("square", sq)
        raise KeyError(f"Function1 '{key}': unknown type '{word}' "
                       "(constant|table|tableFile|csvFile|polynomial|"
                       "sine|square)")
