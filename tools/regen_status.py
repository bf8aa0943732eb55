#!/usr/bin/env python
"""Regenerate the LIVE sections of IMPLEMENTATION_STATUS.md from the
actual registries and test tree (VERDICT r4 item 10: the status doc had
gone stale by two rounds — a hand-maintained doc is how a red HEAD got
shipped). Rewrites the header block between the markers; the curated
component tables below the marker are kept (they change only when
components land, with their commits).

  python tools/regen_status.py          # rewrite IMPLEMENTATION_STATUS.md
"""

import datetime
import io
import os
import re
import subprocess
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

MARK = "<!-- regen:live-summary -->"


def live_counts():
    import jax
    jax.config.update("jax_platforms", "cpu")
    # populate every registry table
    import rapidcfd_tpu.fields.bcs  # noqa: F401
    import rapidcfd_tpu.fields.bcs_coupled  # noqa: F401
    import rapidcfd_tpu.fields.bcs_derived  # noqa: F401
    import rapidcfd_tpu.fields.bcs_mapped  # noqa: F401
    import rapidcfd_tpu.models.radiation  # noqa: F401
    import rapidcfd_tpu.solvers.chtmultiregionfoam  # noqa: F401
    import rapidcfd_tpu.solvers.adjointshapeopt  # noqa: F401
    import rapidcfd_tpu.solvers.potentialfreesurfacefoam  # noqa: F401
    import rapidcfd_tpu.models.turbulence  # noqa: F401
    import rapidcfd_tpu.models.turbulence_extra  # noqa: F401
    import rapidcfd_tpu.ops.interpolation  # noqa: F401
    import rapidcfd_tpu.postprocess.functionobjects  # noqa: F401
    from rapidcfd_tpu.__main__ import SOLVERS
    from rapidcfd_tpu.utils.registry import _TABLES

    def n(table):
        return len(_TABLES.get(table, {}))

    tests = 0
    for root, _, files in os.walk(os.path.join(REPO, "tests")):
        for f in files:
            if f.startswith("test_") and f.endswith(".py"):
                txt = open(os.path.join(root, f)).read()
                tests += len(re.findall(r"^def test_", txt, re.M))
    head = subprocess.run(["git", "log", "-1", "--format=%h %s"],
                          cwd=REPO, capture_output=True,
                          text=True).stdout.strip()
    return {
        "bcs": n("fvPatchField"),
        "schemes": n("surfaceInterpolation"),
        "ras": n("RASModel"),
        "les": n("LESModel"),
        "fos": n("functionObject"),
        "solvers": len(SOLVERS),
        "tests": tests,
        "head": head,
        "date": datetime.date.today().isoformat(),
    }


def main():
    c = live_counts()
    block = f"""{MARK}
# Implementation status vs SURVEY.md §2

**Auto-generated summary** (tools/regen_status.py, {c['date']},
HEAD {c['head']}) — regenerate after every milestone; numbers below are
introspected from the live registries, never hand-edited:

| Live registry | Count |
|---|---|
| solver mains (`python -m rapidcfd_tpu <solver>`) | {c['solvers']} |
| fvPatchField types | {c['bcs']} |
| surfaceInterpolation schemes | {c['schemes']} |
| RAS models | {c['ras']} |
| LES models | {c['les']} |
| functionObjects | {c['fos']} |
| test functions | {c['tests']} |

**Pre-commit gate** (see README): before any end-of-round snapshot or
milestone commit touching solver/mesh/parallel code, run BOTH
`python -m pytest tests/ -q -m "not slow"` AND the multichip dryrun
(`JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8
python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"`).
Round 4 shipped a red HEAD precisely because the parallel dryrun was
skipped after a default-config change.

Perf status: see PERF.md (round-5 numbers + per-phase profile) and
BENCH_*_r05.json.
{MARK}
"""
    path = os.path.join(REPO, "IMPLEMENTATION_STATUS.md")
    txt = open(path).read()
    if MARK in txt:
        pre, _, rest = txt.partition(MARK)
        _, _, tail = rest.partition(MARK)
        txt = block + tail.lstrip("\n")
    else:
        # replace the stale hand-written header (everything before the
        # first '## §2.1' section) with the generated block
        idx = txt.find("## §2.1")
        txt = block + "\n" + (txt[idx:] if idx >= 0 else txt)
    open(path, "w").write(txt)
    print(f"IMPLEMENTATION_STATUS.md regenerated: {c}")


if __name__ == "__main__":
    main()
