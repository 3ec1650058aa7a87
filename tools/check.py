#!/usr/bin/env python3
"""Local pre-flight for the driver's correctness gate.

Usage: python3 tools/check.py [sfdir] [outdir]

Runs DuckDB on each oracle_sql.json entry against the same parquet tables and
compares row count, column names, and values (sorted columns, sorted rows)
against the Verify.scala parquet dumps.
"""
import json
import sys

import duckdb
import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

    oracle = json.load(open(f"{OUT}/oracle_sql.json"))
    failures = []
    for name, sql in sorted(oracle.items()):
        try:
            got = pd.read_parquet(f"{OUT}/{name}")
        except Exception as e:
            failures.append((name, f"spark result missing: {e}"))
            continue
        try:
            exp = con.sql(sql).df()
        except Exception as e:
            failures.append((name, f"oracle failed: {e}"))
            continue
        if sorted(got.columns) != sorted(exp.columns):
            failures.append((name, f"cols: spark={sorted(got.columns)} oracle={sorted(exp.columns)}"))
            continue
        if len(got) != len(exp):
            failures.append((name, f"rows: spark={len(got)} oracle={len(exp)}"))
            continue
        g, e = canon(got), canon(exp)
        try:
            pd.testing.assert_frame_equal(g, e, check_dtype=False, check_exact=True)
            print(f"  OK {name}: {len(got)} rows")
        except AssertionError as ae:
            # retry with tolerance to report severity
            try:
                pd.testing.assert_frame_equal(g, e, check_dtype=False, atol=1e-9, rtol=1e-12)
                failures.append((name, "values differ only within 1e-9 (rounding edge)"))
            except AssertionError:
                failures.append((name, f"values differ: {str(ae).splitlines()[-1] if str(ae) else ae}"))

    rows_only = []
    import os
    for d in sorted(os.listdir(OUT)):
        if d not in oracle and os.path.isdir(os.path.join(OUT, d)):
            try:
                n = len(pd.read_parquet(os.path.join(OUT, d)))
                rows_only.append((d, n))
                print(f"  rows-only {d}: {n} rows" + ("  ** EMPTY **" if n == 0 else ""))
            except Exception as ex:
                failures.append((d, f"rows-only read failed: {ex}"))

    print()
    if failures:
        print(f"FAILURES ({len(failures)}):")
        for name, why in failures:
            print(f"  FAIL {name}: {why[:500]}")
        sys.exit(1)
    empty = [d for d, n in rows_only if n == 0]
    if empty:
        print(f"EMPTY rows-only results: {empty}")
        sys.exit(1)
    print(f"ALL {len(oracle)} oracle queries match; {len(rows_only)} rows-only non-empty.")


if __name__ == "__main__":
    main()
