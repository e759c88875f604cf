#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check_oracle.py <outDir> <sfDir> [<json_out>]

With <json_out>, also writes a driver-style per-query JSON artifact
(rows/schema/hash match booleans) for committing as scale evidence.

Reads each <outDir>/<name> parquet (written by graft.Verify), runs the
matching SQL from <outDir>/oracle_sql.json in DuckDB against the sfDir
tables, and compares: column names (sorted), row count, and exact values
after sorting rows. Reports per-query PASS/FAIL with a diff sample.
"""
import json
import sys
import glob
import os

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes a bit: datetimes -> ns, categoricals -> plain
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main() -> int:
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    json_out = sys.argv[3] if len(sys.argv) > 3 else None
    report = {}
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = n_noracle = 0
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True) \
            if files else pd.DataFrame()
        if name not in oracle:
            n_noracle += 1
            report[name] = {"rows_match": None, "schema_match": None,
                            "hash_match": None, "spark_rows": len(got),
                            "oracle_rows": None, "err": None}
            print(f"  [rows-only] {name}: {len(got)} rows")
            continue
        try:
            want = con.execute(oracle[name]).df()
        except Exception as e:
            n_fail += 1
            report[name] = {"rows_match": False, "schema_match": False,
                            "hash_match": False, "spark_rows": len(got),
                            "oracle_rows": None, "err": str(e)[:200]}
            print(f"  [FAIL] {name}: oracle SQL error: {e}")
            continue
        # Type audit: the driver hash-compares rendered values, so a DuckDB
        # HUGEINT (e.g. from SUM() OVER on BIGINT) vs Spark int64 mismatches
        # there even though pandas coerces it here (bit us in round 5, q66).
        duck_types = {r[0]: r[1]
                      for r in con.execute("DESCRIBE " + oracle[name]).fetchall()}
        huge = [c for c, t in duck_types.items() if t == "HUGEINT"]
        if huge:
            n_fail += 1
            report[name] = {"rows_match": False, "schema_match": False,
                            "hash_match": False, "spark_rows": len(got),
                            "oracle_rows": len(want),
                            "err": f"HUGEINT cols {huge}"}
            print(f"  [FAIL] {name}: oracle cols {huge} are HUGEINT — "
                  f"CAST them (driver hash-compare will mismatch int64)")
            continue
        g, w = canon(got), canon(want)
        rep = {"rows_match": len(g) == len(w),
               "schema_match": list(g.columns) == list(w.columns),
               "hash_match": False, "spark_rows": len(g),
               "oracle_rows": len(w), "err": None}
        report[name] = rep
        if not rep["schema_match"]:
            n_fail += 1
            print(f"  [FAIL] {name}: columns {list(g.columns)} vs {list(w.columns)}")
            continue
        if not rep["rows_match"]:
            n_fail += 1
            print(f"  [FAIL] {name}: rows {len(g)} vs {len(w)}")
            continue
        try:
            pd.testing.assert_frame_equal(g, w, check_dtype=False,
                                          check_exact=True)
            rep["hash_match"] = True
            n_pass += 1
            print(f"  [PASS] {name} ({len(g)} rows)")
        except AssertionError as e:
            n_fail += 1
            msg = str(e).splitlines()
            print(f"  [FAIL] {name}: " + " | ".join(msg[:6]))
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} rows-only")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(dict(sorted(report.items())), f, indent=1)
        print(f"wrote {json_out}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
