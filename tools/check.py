#!/usr/bin/env python3
"""Local mimic of the driver's t2 correctness gate.

Usage: python3 tools/check.py [sfDir] [outDir]

Reads outDir/<name>/ parquet (written by `sbt "runMain graft.Verify <sfDir>
<outDir>"`), runs outDir/oracle_sql.json in DuckDB with views over sfDir's
parquet tables, and compares: row count, column names (sorted), and values
(rows sorted, exact string compare after canonical formatting).
"""
import glob
import json
import os
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def kinds(df: pd.DataFrame) -> dict:
    """Numeric *kind* per column (int vs float vs other), sorted by name.

    The driver hashes pandas values, so a DuckDB HUGEINT (-> float64)
    vs Spark int64 mismatch fails its gate even when the string-canonical
    values here are identical. Comparing kinds reproduces that locally.
    """
    return {c: df[c].dtype.kind for c in sorted(df.columns)}


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)

    def fmt(v):
        if isinstance(v, float):
            return f"{v:.6g}"
        if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
            return "[" + ",".join(fmt(x) for x in v) + "]"
        return str(v)

    out = df.apply(lambda col: col.map(fmt))
    return out.sort_values(by=list(out.columns)).reset_index(drop=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)

    names = sorted(
        os.path.basename(p) for p in glob.glob(os.path.join(out_dir, "*"))
        if os.path.isdir(p))
    n_pass = n_fail = n_rows_only = 0
    for name in names:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"FAIL  {name}: no parquet output")
            n_fail += 1
            continue
        spark_df = pd.concat([pd.read_parquet(f) for f in sorted(files)])
        if name not in oracles:
            ok = len(spark_df) > 0
            print(f"{'ROWS' if ok else 'FAIL'}  {name}: rows-only "
                  f"({len(spark_df)} rows)")
            n_rows_only += ok
            n_fail += not ok
            continue
        try:
            duck_df = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        a, b = canon(spark_df), canon(duck_df)
        ka, kb = kinds(spark_df), kinds(duck_df)
        kind_diff = {c: (ka[c], kb.get(c)) for c in ka
                     if c in kb and ka[c] != kb[c]
                     and {ka[c], kb[c]} & {"i", "u", "f"}}
        if kind_diff:
            print(f"FAIL  {name}: dtype kind mismatch (spark, duck): "
                  f"{kind_diff} — would fail the driver hash")
            n_fail += 1
        elif list(a.columns) != list(b.columns):
            print(f"FAIL  {name}: columns {list(a.columns)} != {list(b.columns)}")
            n_fail += 1
        elif len(a) != len(b):
            print(f"FAIL  {name}: rows {len(a)} != {len(b)}")
            n_fail += 1
        elif not a.equals(b):
            diff = (a != b).any(axis=1)
            idx = diff[diff].index[:3]
            print(f"FAIL  {name}: {int(diff.sum())}/{len(a)} rows differ; first:")
            for i in idx:
                print(f"      spark: {a.loc[i].to_dict()}")
                print(f"      duck : {b.loc[i].to_dict()}")
            n_fail += 1
        else:
            print(f"PASS  {name} ({len(a)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_rows_only} rows-only, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
