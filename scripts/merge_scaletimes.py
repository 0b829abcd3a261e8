#!/usr/bin/env python3
"""Merge multiple ScaleBench runs into per-(query, sf) minima.

The box's tenancy is BURSTY (loadavg swings 0.1 -> 25+ on ~10-minute
cycles), so any single ScaleBench invocation can have whole scale-factor
blocks inflated 2-3x. One run's warm = min of its own reps 2..N protects
against a spike inside one query's reps, but not against a burst
covering a whole block. Taking the minimum per (query, sf, leg) ACROSS
independent runs extends the same min-of-reps discipline across the
burst period — a minimum is a valid estimator of uncontended time
(noise only ever ADDS time).

Usage: merge_scaletimes.py <scalebench.log> [...]   (prints the fragment)

Reads `SCALETIME <dir> <query> cold=<s> warm=<s>` lines, maps dirs to
scale factors by their trailing sfN component (testdata sf0.1 = 0.1),
and prints a BENCH_SCALE-format "queries" object with per-query
exponent (warm endpoints) and endpoint-linear-fit interior errors.
"""
import json
import math
import re
import sys


def sf_of(d):
    """Scale factor from a directory name.

    Convention (THIS repo's scale-data layout, not a general parser):
    a zero-PREFIXED integer suffix is a decimal -- sf03 = 0.3, sf001 =
    0.01 -- while unprefixed integers are whole scale factors (sf3 =
    3.0) and explicit decimals pass through (sf0.1 = 0.1). Two traps
    if this ever meets foreign logs: a dir that meant zero-padded
    integers (sf01 as 1.0) is misread as 0.1, and trailing zeros
    collapse (sf030 -> 0.3); the known names here (sf03/sf1/sf3/sf10
    + /root/testdata/sf0.*) are unambiguous under the convention.
    """
    m = re.search(r"sf([0-9.]+)$", d.rstrip("/"))
    s = m.group(1)
    # zero-prefixed integer dirs are decimal: sf03 = 0.3 (vs sf3 = 3.0)
    if "." not in s and s.startswith("0") and len(s) > 1:
        return float("0." + s.lstrip("0").rjust(len(s) - 1, "0"))
    return float(s)


def main():
    times = {}  # (query, sf) -> {"cold": min, "warm": min}
    for path in sys.argv[1:]:
        for line in open(path):
            m = re.search(
                r"SCALETIME (\S+) (\S+) cold=([0-9.]+) warm=([0-9.]+)", line)
            if not m:
                continue
            d, q, cold, warm = m.group(1), m.group(2), float(m.group(3)), float(m.group(4))
            key = (q, sf_of(d))
            cur = times.setdefault(key, {"cold": cold, "warm": warm})
            cur["cold"] = min(cur["cold"], cold)
            cur["warm"] = min(cur["warm"], warm)

    queries = sorted({q for q, _ in times})
    out = {}
    for q in queries:
        sfs = sorted(sf for qq, sf in times if qq == q)
        by_sf = {str(sf): times[(q, sf)] for sf in sfs}
        lo, hi = sfs[0], sfs[-1]
        w_lo, w_hi = times[(q, lo)]["warm"], times[(q, hi)]["warm"]
        e = math.log(w_hi / w_lo) / math.log(hi / lo)
        b = (w_hi - w_lo) / (hi - lo)
        a = w_lo - b * lo
        interior = {}
        for sf in sfs[1:-1]:
            pred = a + b * sf
            actual = times[(q, sf)]["warm"]
            interior[str(sf)] = {"pred": round(pred, 3),
                                 "actual": actual,
                                 "rel_err": round((actual - pred) / pred, 3)}
        out[q] = {"by_sf": by_sf, "exponent": round(e, 3),
                  "linear_fit": {"a": round(a, 3), "b_per_sf": round(b, 3),
                                 "interior": interior}}
    print(json.dumps(out, indent=None))


if __name__ == "__main__":
    main()
