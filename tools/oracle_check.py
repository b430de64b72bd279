#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle compare (dev tool only; not
part of the shipped Scala library). Usage:

    python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark result), runs the matching
SQL from oracle_sql.json in DuckDB over <sfDir>/*.parquet, sorts columns by
name and rows by all columns, and reports exact / tolerant equality.
"""
import sys, json, math, time
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) and len(df.columns):
        df = df.sort_values(by=list(df.columns), na_position="last",
                            kind="mergesort").reset_index(drop=True)
    return df


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    # escape single quotes: a path containing ' must not break the SQL text
    sfdir_sql = sfdir.replace("'", "''")
    outdir_sql = outdir.replace("'", "''")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir_sql}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = n_bad = 0
    t_start = time.monotonic()
    slow = []  # (seconds, name) per oracle SQL — the driver-budget watchdog
    for name, sql in sorted(oracle.items()):
        try:
            spark_df = con.sql(
                f"SELECT * FROM read_parquet('{outdir_sql}/{name}/*.parquet')").df()
        except Exception as e:
            print(f"FAIL  {name}: no spark result ({e})"); n_bad += 1; continue
        try:
            t0 = time.monotonic()
            ora_df = con.sql(sql).df()
            slow.append((time.monotonic() - t0, name))
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {e}"); n_bad += 1; continue
        a, b = normalize(spark_df), normalize(ora_df)
        if list(a.columns) != list(b.columns):
            print(f"FAIL  {name}: columns {list(a.columns)} vs {list(b.columns)}")
            n_bad += 1; continue
        if len(a) != len(b):
            print(f"FAIL  {name}: rowcount {len(a)} vs {len(b)}"); n_bad += 1; continue
        dtype_warn = [(c, str(a[c].dtype), str(b[c].dtype))
                      for c in a.columns if a[c].dtype != b[c].dtype]
        exact = a.equals(b)
        if exact:
            msg = "OK    " + name
            if dtype_warn:
                msg += f"  [dtype warn: {dtype_warn}]"
            print(msg); n_ok += 1; continue
        # not exact: locate worst column diff
        bad_cols = []
        for c in a.columns:
            av, bv = a[c], b[c]
            if av.equals(bv):
                continue
            try:
                aa = pd.to_numeric(av, errors="raise")
                bb = pd.to_numeric(bv, errors="raise")
                diff = (aa - bb).abs()
                rel = diff / bb.abs().clip(lower=1e-12)
                bad_cols.append((c, float(diff.max()), float(rel.max()),
                                 int((diff > 0).sum())))
            except Exception:
                neq = (av.astype(str) != bv.astype(str))
                bad_cols.append((c, "non-numeric", "-", int(neq.sum())))
        print(f"FAIL  {name}: value diffs {bad_cols}")
        if dtype_warn:
            print(f"      dtype warn: {dtype_warn}")
        n_bad += 1
    wall = time.monotonic() - t_start
    # Round 6 lost its driver correctness file to two recursive-CTE oracles
    # costing 9 of an 11-minute budget — surface the cost profile so a
    # future expensive oracle is caught here, not by an empty driver file.
    print(f"\n{n_ok} ok, {n_bad} failing  (compare wall {wall:.0f}s)")
    for secs, name in sorted(slow, reverse=True)[:5]:
        if secs >= 2.0:
            print(f"      SLOW oracle {name}: {secs:.1f}s")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
