#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each q* result dir
under OUTDIR, run the matching oracle SQL from oracle_sql.json in DuckDB over
the SF parquet tables, and compare rows / schema(column names) / value hash
with columns sorted by name. Usage: compare_oracle.py SFDIR OUTDIR [only...]"""
import sys, os, json, glob
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])

oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    p = os.path.join(sfdir, f"{t}.parquet")
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

def canon(df):
    cols = sorted(df.columns)
    rows = [tuple(r) for r in df[cols].itertuples(index=False, name=None)]
    def norm(v):
        if isinstance(v, float):
            if v != v:  # NaN (incl. pandas-null) — compare as None
                return None
            return round(v, 9)
        return v
    return cols, sorted([tuple(norm(x) for x in r) for r in rows], key=repr)

fails = 0
for qdir in sorted(glob.glob(os.path.join(outdir, "q*_*"))):
    name = os.path.basename(qdir)
    if only and name not in only:
        continue
    if name not in oracle:
        print(f"{name}: NO ORACLE (rows-only)")
        continue
    try:
        spark_df = con.execute(
            f"SELECT * FROM read_parquet('{qdir}/*.parquet')").df()
        ora_df = con.execute(oracle[name]).df()
        sc, sr = canon(spark_df)
        oc, orr = canon(ora_df)
        ok_rows = len(sr) == len(orr)
        ok_schema = sc == oc
        ok_hash = sr == orr
        status = "OK" if (ok_rows and ok_schema and ok_hash) else "FAIL"
        if status == "FAIL":
            fails += 1
            print(f"{name}: {status} rows={len(sr)}/{len(orr)} schema={ok_schema} hash={ok_hash}")
            if not ok_schema:
                print(f"   spark cols: {sc}\n   oracle cols: {oc}")
            if ok_schema and not ok_hash:
                diff = [(a, b) for a, b in zip(sr, orr) if a != b][:3]
                print(f"   first diffs: {diff}")
        else:
            print(f"{name}: OK ({len(sr)} rows)")
    except Exception as e:
        fails += 1
        print(f"{name}: ERROR {e}")
print(f"\n{'ALL GREEN' if fails == 0 else f'{fails} FAILURES'}")
sys.exit(1 if fails else 0)
