#!/usr/bin/env python
"""Decompose a BENCH_PROFILE trace into per-bucket device seconds.

Usage:
    BENCH_PROFILE=/tmp/prof python bench.py      # on chip
    python scripts/profile_decompose.py /tmp/prof

Accepts either a profile root dir (finds the newest
plugins/profile/*/\\*.trace.json.gz under it) or a trace file path, and
prints the `observability.profiling.decompose_trace` JSON — span wall,
leaf-busy vs dispatch gap, per-bucket totals, and the fit-loop vs
rollout-scan split (the round-4 methodology behind records
`bench_device_profile_decomposition_r4`).
"""
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def find_trace(path: str) -> str:
    if os.path.isfile(path):
        return path
    hits = sorted(glob.glob(os.path.join(
        path, "plugins", "profile", "*", "*.trace.json.gz")))
    if not hits:
        hits = sorted(glob.glob(os.path.join(path, "**", "*.trace.json.gz"),
                                recursive=True))
    if not hits:
        raise SystemExit("no *.trace.json.gz under %s" % path)
    return hits[-1]


def main():
    if len(sys.argv) != 2:
        raise SystemExit(__doc__)
    from bayesian_cbf_tpu.observability.profiling import decompose_trace
    trace = find_trace(sys.argv[1])
    print(json.dumps({"trace": trace, **decompose_trace(trace)}, indent=1))


if __name__ == "__main__":
    main()
