#!/usr/bin/env python3
"""Production-config scaling envelope.

Combines the pinned-config matrix (BENCH_SCALE.json, 32 shuffle
partitions at every SF) with one or more GRAFT_SCALE_SHUFFLE=prop
ScaleBench logs (partitions proportional to data) into a per-(query,
sf) WARM-MINIMUM envelope, and recomputes each query's exponent on it.

Why the minimum over configs is the right production estimate: both
configs execute the SAME logical plan; they differ only in local
harness artifacts. The pin concentrates per-task bytes at the top
scale points until the 8-32 GB local heap spills (overstating growth
for shuffle-heavy queries); the proportional config pays per-task
scheduling overhead on a 32-thread box that a 1000-executor cluster
amortizes (overstating growth for queries that never spilled). Noise
and config overhead only ever ADD time, so min(pin, prop) per point is
a valid estimator of the plan's work at that scale -- the same
argument as merge_scaletimes' min-across-runs.

Usage: prop_envelope.py BENCH_SCALE.json proplog [...] [--exclude q1,q2]
  --exclude drops a query's PINNED legs (used for queries whose
  implementation changed after the pinned record; their envelope then
  comes from the prop logs alone).
"""
import json
import math
import re
import sys

sys.path.insert(0, __import__("os").path.dirname(__file__))
from merge_scaletimes import sf_of


def main():
    args = sys.argv[1:]
    excl = set()
    if "--exclude" in args:
        i = args.index("--exclude")
        excl = set(args[i + 1].split(","))
        args = args[:i] + args[i + 2:]
    base_path, logs = args[0], args[1:]

    times = {}  # (query, sf) -> {"warm": min, "src": config}

    base = json.load(open(base_path))
    for q, rec in base["queries"].items():
        if q in excl or not isinstance(rec, dict):
            continue
        for sf, legs in rec.get("by_sf", {}).items():
            if "warm" not in legs:
                print(f"WARN {q}@{sf}: pinned leg lacks 'warm', skipped",
                      file=sys.stderr)
                continue
            times[(q, float(sf))] = {"warm": legs["warm"], "src": "pin"}

    for path in logs:
        for line in open(path):
            m = re.search(
                r"SCALETIME (\S+) (\S+) cold=([0-9.]+) warm=([0-9.]+)", line)
            if not m:
                continue
            q, sf, warm = m.group(2), sf_of(m.group(1)), float(m.group(4))
            cur = times.get((q, sf))
            if cur is None or warm < cur["warm"]:
                times[(q, sf)] = {"warm": warm, "src": "prop"}

    out = {}
    for q in sorted({q for q, _ in times}):
        sfs = sorted(sf for qq, sf in times if qq == q)
        if len(sfs) < 2:
            # loud, not silent: a 1-point query usually means a
            # misparsed log, not a deliberate omission
            print(f"WARN {q}: only {len(sfs)} sf point(s), dropped",
                  file=sys.stderr)
            continue
        lo, hi = sfs[0], sfs[-1]
        w_lo, w_hi = times[(q, lo)]["warm"], times[(q, hi)]["warm"]
        if w_lo <= 0 or w_hi <= 0:
            # a sub-10ms leg rounded to 0 in a log would raise in the
            # log-ratio below -- skip it loudly instead
            print(f"WARN {q}: non-positive warm leg ({w_lo}, {w_hi}), dropped",
                  file=sys.stderr)
            continue
        e = math.log(w_hi / w_lo) / math.log(hi / lo)
        out[q] = {
            "by_sf": {str(sf): times[(q, sf)] for sf in sfs},
            "exponent": round(e, 3),
            "span": f"{lo}-{hi}",
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
