#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run each oracle SQL in
DuckDB against the testdata parquet, read the Spark result dumped by
graft.Verify, sort columns by name + rows by content, compare exactly.

Usage: verify_local.py <sfDir> <verifyOutDir>
(run `sbt "runMain graft.Verify <sfDir> <outDir>"` first)
"""
import sys, os, json, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(rows, cols):
    # sort columns by name, then rows by stringified content
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    def key(t):
        return tuple("\0N" if v is None else repr(v) for v in t)
    return sorted(out, key=key), [cols[i] for i in order]

def cell_eq(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b  # exact: the whole point of the decimal strategy
    return a == b

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
            oc = con.execute(sql)
            ocols = [d[0] for d in oc.description]
            orows = oc.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        sc = con.execute(f"SELECT * FROM read_parquet('{spark_path}/*.parquet')")
        scols = [d[0] for d in sc.description]
        srows = sc.fetchall()
        if sorted(ocols) != sorted(scols):
            print(f"FAIL {name}: columns differ: oracle={sorted(ocols)} spark={sorted(scols)}")
            n_fail += 1
            continue
        a, cols = canon(orows, ocols)
        b, _ = canon(srows, scols)
        if len(a) != len(b):
            print(f"FAIL {name}: row count oracle={len(a)} spark={len(b)}")
            n_fail += 1
            continue
        bad = None
        for i, (ra, rb) in enumerate(zip(a, b)):
            if not all(cell_eq(x, y) for x, y in zip(ra, rb)):
                bad = (i, ra, rb)
                break
        if bad:
            i, ra, rb = bad
            print(f"FAIL {name}: first diff at sorted row {i}")
            print(f"  cols   = {cols}")
            print(f"  oracle = {ra}")
            print(f"  spark  = {rb}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(a)} rows)")
            n_pass += 1
    # queries without oracle: rows-only note
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
