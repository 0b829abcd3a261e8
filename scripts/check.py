#!/usr/bin/env python3
"""Dev-only local correctness loop (mimics the driver's DuckDB oracle).

Usage:
  python3 scripts/check.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name>/ parquet (Spark output), runs the
matching SQL from <verifyOutDir>/oracle_sql.json in DuckDB with views
registered for every table parquet in <sfDir>, and compares the two
result sets (column-name-sorted, row-sorted, exact values).
"""
import json
import sys

import duckdb


def normalize(rows):
    def norm(v):
        if isinstance(v, float) and v != v:  # NaN
            return "NaN"
        return v
    return sorted([tuple(norm(v) for v in r) for r in rows], key=lambda r: tuple(str(x) for x in r))


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            exp = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchdf()
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {e}")
            n_fail += 1
            continue
        exp = exp[sorted(exp.columns)]
        gcols = sorted(got.columns)
        if sorted(exp.columns) != gcols:
            print(f"FAIL {name}: columns differ: oracle={sorted(exp.columns)} spark={gcols}")
            n_fail += 1
            continue
        got = got[gcols]
        e_rows = normalize(exp.itertuples(index=False, name=None))
        g_rows = normalize(got.itertuples(index=False, name=None))
        if e_rows == g_rows:
            print(f"PASS {name} ({len(g_rows)} rows)")
            n_pass += 1
        else:
            print(f"FAIL {name}: {len(e_rows)} oracle rows vs {len(g_rows)} spark rows")
            diff_e = [r for r in e_rows if r not in g_rows][:3]
            diff_g = [r for r in g_rows if r not in e_rows][:3]
            print(f"  oracle-only: {diff_e}")
            print(f"  spark-only : {diff_g}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
