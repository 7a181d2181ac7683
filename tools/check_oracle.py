#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Reads the Verify.scala output dir (per-query parquet + oracle_sql.json),
runs each oracle SQL in DuckDB against the same testdata parquet tables,
and compares: column names (sorted), row counts, and values.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json, sys, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    # normalize a cell for comparison
    if isinstance(v, float):
        return repr(v)
    return str(v)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        # driver testdata = single files; Spark-written (StressGen) = dirs
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name in sorted(oracle):
        sql = oracle[name]
        pq_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{pq_dir}/*.parquet")
        if not files:
            results[name] = "NO_SPARK_OUTPUT"
            continue
        try:
            want = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR: {e}"
            continue
        got = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetch_arrow_table()
        wcols, gcols = sorted(want.column_names), sorted(got.column_names)
        if wcols != gcols:
            results[name] = f"COLS_MISMATCH want={wcols} got={gcols}"
            continue
        if want.num_rows != got.num_rows:
            results[name] = f"ROWS_MISMATCH want={want.num_rows} got={got.num_rows}"
            continue
        w = want.select(wcols).to_pylist()
        g = got.select(gcols).to_pylist()
        bad = None
        for i, (rw, rg) in enumerate(zip(w, g)):
            for c in wcols:
                if norm(rw[c]) != norm(rg[c]):
                    bad = (i, c, rw[c], rg[c])
                    break
            if bad:
                break
        if bad:
            i, c, a, b = bad
            results[name] = f"VALUE_MISMATCH row={i} col={c} want={a!r} got={b!r}"
        else:
            # also check schema types loosely
            wt = {f.name: str(f.type) for f in want.schema}
            gt = {f.name: str(f.type) for f in got.schema}
            tdiff = {c: (wt[c], gt[c]) for c in wcols if wt[c] != gt[c]}
            results[name] = "OK" if not tdiff else f"OK_VALUES_TYPE_DIFF {tdiff}"
    n_ok = sum(1 for v in results.values() if v.startswith("OK"))
    for k, v in results.items():
        mark = "PASS" if v.startswith("OK") else "FAIL"
        print(f"{mark} {k}: {v}")
    # queries with no oracle
    spark_only = [os.path.basename(d) for d in glob.glob(f"{out_dir}/*")
                  if os.path.isdir(d) and os.path.basename(d) not in oracle]
    if spark_only:
        print(f"rows-only (no oracle): {sorted(spark_only)}")
    print(f"== {n_ok}/{len(results)} oracle-matched")
    return 0 if n_ok == len(results) else 1

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
