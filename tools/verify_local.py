#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/verify_local.py <sfDir> <outDir>

Assumes `sbt "runMain graft.Verify <sfDir> <outDir>"` has already produced
<outDir>/<name>/ parquet dirs and <outDir>/oracle_sql.json. Registers the
sfDir tables as DuckDB views, runs each oracle, and compares against the
Spark result: columns sorted by name, rows sorted by all columns, exact
value equality (with a separate "close" verdict for float-only drift so we
can tell a rounding risk from a real bug).
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def load_spark(outdir, name):
    files = glob.glob(os.path.join(outdir, name, "*.parquet"))
    if not files:
        return None
    return pd.concat([pd.read_parquet(f) for f in sorted(files)], ignore_index=True)


def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize dtypes for sorting/compare
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v) if v is not None else None)
    df = df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)
    return df


def compare(name, spark_df, duck_df):
    a, b = norm(spark_df), norm(duck_df)
    if list(a.columns) != list(b.columns):
        return f"SCHEMA MISMATCH spark={list(a.columns)} duck={list(b.columns)}"
    if len(a) != len(b):
        return f"ROWCOUNT MISMATCH spark={len(a)} duck={len(b)}"
    issues = []
    for c in a.columns:
        av, bv = a[c], b[c]
        # The driver's hash is dtype-sensitive: DuckDB HUGEINT (sum of ints)
        # lands as float64/object while Spark emits int64 — values equal,
        # hashes differ. Treat a kind mismatch as a failure.
        numeric = set("iuf")
        if av.dtype.kind != bv.dtype.kind and (
                av.dtype.kind in numeric or bv.dtype.kind in numeric):
            issues.append(f"col {c}: DTYPE KIND spark={av.dtype} duck={bv.dtype}"
                          " (driver hash would mismatch)")
            continue
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            avf = av.astype(float).to_numpy()
            bvf = bv.astype(float).to_numpy()
            exact = np.array_equal(avf, bvf, equal_nan=True)
            if not exact:
                close = np.allclose(avf, bvf, rtol=1e-9, atol=1e-12, equal_nan=True)
                md = np.nanmax(np.abs(avf - bvf)) if len(avf) else 0
                issues.append(f"col {c}: float {'CLOSE' if close else 'DIFF'} maxdiff={md:.3e}")
        else:
            try:
                eq = (av.fillna("\0NULL") == bv.fillna("\0NULL")).all() if av.dtype == object \
                    else av.equals(bv)
            except Exception:
                eq = av.astype(str).equals(bv.astype(str))
            if not eq:
                n_bad = int((av.astype(str) != bv.astype(str)).sum())
                ex = None
                for i in range(len(av)):
                    if str(av.iloc[i]) != str(bv.iloc[i]):
                        ex = f"row{i}: spark={av.iloc[i]!r} duck={bv.iloc[i]!r}"
                        break
                issues.append(
                    f"col {c}: {n_bad} mismatches (dtype spark={av.dtype} duck={bv.dtype}); {ex}")
    return "; ".join(issues) if issues else None


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sfdir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    n_pass = n_fail = n_skip = 0
    for name, sql in sorted(oracles.items()):
        spark_df = load_spark(outdir, name)
        if spark_df is None:
            print(f"SKIP  {name}: no spark output")
            n_skip += 1
            continue
        try:
            duck_df = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            n_fail += 1
            continue
        verdict = compare(name, spark_df, duck_df)
        if verdict:
            print(f"FAIL  {name}: {verdict}")
            n_fail += 1
        else:
            print(f"PASS  {name} ({len(spark_df)} rows)")
            n_pass += 1
    # queries with spark output but no oracle (rows-only check)
    for d in sorted(os.listdir(outdir)):
        if os.path.isdir(os.path.join(outdir, d)) and d not in oracles:
            df = load_spark(outdir, d)
            print(f"ROWS  {d}: {0 if df is None else len(df)} rows (no oracle)")
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} skip")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
