"""foamLog equivalent: scrape a solver log into time-series .xy files.

The reference ships `bin/foamLog` (an awk-driven extractor keyed by
`bin/tools/foamLog.db`) that turns the solver stdout into per-quantity
`logs/<name>_<occurrence>.xy` files of `time value` rows. This is the
same contract for our logs (utils/logging.py writes the identical
residual/continuity/Courant line shapes):

- `<field>_<occ>`       initial residual of the occ-th solve of <field>
                        within a timestep
- `<field>FinalRes_<occ>`, `<field>Iters_<occ>`
- `contLocal_0`, `contGlobal_0`, `contCumulative_0`
- `CourantMean_0`, `CourantMax_0`
- `executionTime_0`, `clockTime_0`

Usage: python -m rapidcfd_tpu.utils.foamlog <logfile> [-o logs/] [-l]
"""

from __future__ import annotations

import argparse
import os
import re
import sys
from collections import defaultdict

_TIME_RE = re.compile(r"^Time = ([-+0-9.eE]+)\s*$")
_SOLVE_RE = re.compile(
    r"^\s*(\S+):\s+Solving for (\S+), Initial residual = ([-+0-9.eE]+), "
    r"Final residual = ([-+0-9.eE]+), No Iterations (\d+)")
_CONT_RE = re.compile(
    r"time step continuity errors : sum local = ([-+0-9.eE]+)"
    r", global = ([-+0-9.eE]+), cumulative = ([-+0-9.eE]+)")
_CO_RE = re.compile(
    r"^Courant Number mean: ([-+0-9.eE]+) max: ([-+0-9.eE]+)")
_EXEC_RE = re.compile(
    r"^ExecutionTime = ([-+0-9.eE]+) s\s+ClockTime = ([-+0-9.eE]+) s")


def extract(lines):
    """Yields (quantity, time, value) triples from solver-log lines."""
    t = None
    occ = defaultdict(int)
    for line in lines:
        m = _TIME_RE.match(line)
        if m:
            t = float(m.group(1))
            occ.clear()
            continue
        if t is None:
            continue
        m = _SOLVE_RE.match(line)
        if m:
            _, fld, res0, res, iters = m.groups()
            i = occ[fld]
            occ[fld] += 1
            yield f"{fld}_{i}", t, float(res0)
            yield f"{fld}FinalRes_{i}", t, float(res)
            yield f"{fld}Iters_{i}", t, float(iters)
            continue
        m = _CONT_RE.search(line)
        if m:
            yield "contLocal_0", t, float(m.group(1))
            yield "contGlobal_0", t, float(m.group(2))
            yield "contCumulative_0", t, float(m.group(3))
            continue
        m = _CO_RE.match(line)
        if m:
            yield "CourantMean_0", t, float(m.group(1))
            yield "CourantMax_0", t, float(m.group(2))
            continue
        m = _EXEC_RE.match(line)
        if m:
            yield "executionTime_0", t, float(m.group(1))
            yield "clockTime_0", t, float(m.group(2))


def write_xy(lines, out_dir):
    """foamLog main: write logs/<quantity>.xy files; returns the dict."""
    series = defaultdict(list)
    for q, t, v in extract(lines):
        series[q].append((t, v))
    os.makedirs(out_dir, exist_ok=True)
    for q, rows in series.items():
        with open(os.path.join(out_dir, q + ".xy"), "w") as f:
            for t, v in rows:
                f.write(f"{t}\t{v}\n")
    return series


def main(argv=None):
    ap = argparse.ArgumentParser(
        prog="foamLog", description=__doc__.splitlines()[0])
    ap.add_argument("logfile")
    ap.add_argument("-o", "--out", default=None,
                    help="output dir (default: <logdir>/logs)")
    ap.add_argument("-l", "--list", action="store_true",
                    help="list extracted quantities, write nothing")
    args = ap.parse_args(argv)
    with open(args.logfile) as f:
        lines = f.readlines()
    if args.list:
        names = sorted({q for q, _, _ in extract(lines)})
        print("\n".join(names))
        return 0
    out = args.out or os.path.join(
        os.path.dirname(os.path.abspath(args.logfile)), "logs")
    series = write_xy(lines, out)
    print(f"Extracted {len(series)} quantities -> {out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
