#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run each oracle SQL in
DuckDB against the testdata parquet, read the Spark result dumped by
graft.Verify, and compare the two **as pandas frames** — the way the
driver does — so dtype skew shows up locally:

  - DuckDB HUGEINT (uncast SUM/list_sum of integers) -> float64, while
    Spark writes int64 -> hash mismatch on the driver even when values
    are numerically equal. Comparison here is dtype-kind-sensitive.
  - list/array columns are unhashable in pandas sort_values -> driver
    comparison crashes. We sort with sort_values to reproduce that.

Usage: verify_local.py <sfDir> <verifyOutDir>
(run `sbt "runMain graft.Verify <sfDir> <outDir>"` first)
"""
import sys, os, json, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    """Sort columns by name then rows by content — driver-style."""
    df = df.reindex(sorted(df.columns), axis=1)
    # driver uses pandas sort_values -> crashes on unhashable cells;
    # we intentionally do the same so the failure reproduces locally
    df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def kind(dtype):
    """Collapse dtypes into hash-relevant kinds (int/float/bool/other)."""
    k = dtype.kind  # 'i','u','f','b','O','M', ...
    return {"u": "i"}.get(k, k)


def cell_eq(a, b):
    if a is None or b is None or (isinstance(a, float) and math.isnan(a)) \
            or (isinstance(b, float) and math.isnan(b)):
        an = a is None or (isinstance(a, float) and math.isnan(a))
        bn = b is None or (isinstance(b, float) and math.isnan(b))
        return an and bn
    return a == b  # exact: the whole point of the decimal strategy


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        spark_path = os.path.join(out_dir, name)
        if not os.path.isdir(spark_path):
            print(f"FAIL {name}: no spark output dir")
            n_fail += 1
            continue
        try:
            odf = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        sdf = con.execute(
            f"SELECT * FROM read_parquet('{spark_path}/*.parquet')").df()
        if sorted(odf.columns) != sorted(sdf.columns):
            print(f"FAIL {name}: columns differ: oracle={sorted(odf.columns)} "
                  f"spark={sorted(sdf.columns)}")
            n_fail += 1
            continue
        try:
            odf, sdf = canon(odf), canon(sdf)
        except TypeError as e:
            print(f"FAIL {name}: pandas sort crashed (unhashable column "
                  f"— array-typed output?): {e}")
            n_fail += 1
            continue
        if len(odf) != len(sdf):
            print(f"FAIL {name}: row count oracle={len(odf)} spark={len(sdf)}")
            n_fail += 1
            continue
        dk = [(c, kind(odf[c].dtype), kind(sdf[c].dtype))
              for c in odf.columns if kind(odf[c].dtype) != kind(sdf[c].dtype)]
        if dk:
            print(f"FAIL {name}: dtype-kind mismatch (driver hash would "
                  f"differ): {dk}")
            n_fail += 1
            continue
        bad = None
        ov, sv = odf.to_numpy(), sdf.to_numpy()
        for i in range(len(ov)):
            if not all(cell_eq(x, y) for x, y in zip(ov[i], sv[i])):
                bad = (i, tuple(ov[i]), tuple(sv[i]))
                break
        if bad:
            i, ra, rb = bad
            print(f"FAIL {name}: first diff at sorted row {i}")
            print(f"  cols   = {list(odf.columns)}")
            print(f"  oracle = {ra}")
            print(f"  spark  = {rb}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(odf)} rows)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
