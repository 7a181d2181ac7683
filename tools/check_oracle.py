#!/usr/bin/env python3
"""Local twin of the driver's correctness gate — STRICT, driver-parity.

Round-1 lesson: the driver compares through pandas. The DuckDB side goes
through `.df()`, where DECIMAL becomes float64 and SUM(BIGINT) becomes
float64-via-DECIMAL(38,0); the Spark side is parquet read into pandas, where
DECIMAL stays `decimal.Decimal` (dtype object). The driver then sorts with
`sort_values` (crashes on array cells) and hashes stringified values. A twin
that compares *values* loosely (`OK_VALUES_TYPE_DIFF` == pass) let 16 red
entries ship. This twin therefore replicates the driver's conversion path and
fails on ANY dtype or string-repr difference:

  - oracle side:  duckdb .df()           (DECIMAL -> float64, like the driver)
  - spark side:   pyarrow -> to_pandas() (DECIMAL -> decimal.Decimal objects)
  - sort:         sort_values(by=all columns)  -> ERR on array cells (driver ERRs too)
  - compare:      pandas dtypes must be identical, then astype(str) frames
                  must be identical cell-for-cell.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def load_spark(files):
    return pq.ParquetDataset(files).read().to_pandas()


def canon(df):
    """Driver-shaped canonicalization: columns sorted by name, rows sorted by
    all columns (raises on unsortable cells, e.g. numpy arrays), then every
    cell stringified."""
    cols = sorted(df.columns)
    out = df[cols].sort_values(by=cols, ignore_index=True)
    return out, out.astype(str)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    # big-SF soaks: cap DuckDB so a heavy CTE spills to disk instead of
    # OOM-killing the process (the 100x quantizer CTEs reached 122 GB RSS
    # unbounded); default high enough that small-SF runs never spill.
    # default = min(80GB, 70% of physical RAM) so small hosts still spill
    # before the OS OOM-killer fires; ORACLE_MEM_LIMIT overrides.
    try:
        ram_gb = os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES") / 2**30
        default_mem = f"{min(80, max(1, int(ram_gb * 0.7)))}GB"
    except (ValueError, OSError):
        default_mem = "80GB"
    mem = os.environ.get("ORACLE_MEM_LIMIT", default_mem)
    con.execute(f"SET memory_limit='{mem}'")
    spill = os.environ.get("ORACLE_TEMP_DIR", "/tmp/duckspill")
    os.makedirs(spill, exist_ok=True)
    con.execute(f"SET temp_directory='{spill}'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    import time as _time

    def fresh_con():
        c = duckdb.connect()
        c.execute(f"SET memory_limit='{mem}'")
        c.execute(f"SET temp_directory='{spill}'")
        for t in TABLES:
            p = f"{sf_dir}/{t}.parquet"
            if os.path.isdir(p):
                p = f"{p}/*.parquet"
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
        return c

    # Past this row count the pandas conversion path is the bottleneck (the
    # 100x soak's u10 segfaulted pandas astype(str) on a ~100M-row frame):
    # compare entirely inside DuckDB instead — column sets via DESCRIBE,
    # then counts + an empty symmetric difference (EXCEPT ALL both ways).
    # Multiset equality over exact values is the same contract; what it
    # drops is only the pandas dtype-repr check, so the result is reported
    # as OK_BIG_DUCKDB, and the small-SF driver gate never takes this path.
    big_rows = int(os.environ.get("ORACLE_BIG_ROWS", "2000000"))
    # Past THIS count even the in-DuckDB EXCEPT-ALL path is the bottleneck:
    # it MATERIALIZEs both sides and builds hash tables over them, which for
    # d6 at 10x (the identity expansion is quadratic in per-name key
    # multiplicity: ~470M rows) spilled >75 GB and filled the host disk
    # (round-12 soak wall). Above it, compare with an ORDER-INDEPENDENT
    # multiset hash instead: count + sum/xor/min/max of hash(row) — one
    # streaming aggregate per side, no sort, no materialization, constant
    # memory. Exactness trades to a 4-way 64-bit fingerprint (collision odds
    # negligible for a test gate); reported distinctly as OK_BIG_HASH.
    hash_rows = int(os.environ.get("ORACLE_HASH_ROWS", "50000000"))

    def described(c, sql, files):
        flist = "[" + ", ".join(f"'{f}'" for f in files) + "]"
        wdesc = sorted((d[0], d[1]) for d in
                       c.execute(f"DESCRIBE SELECT * FROM ({sql}) t").fetchall())
        gdesc = sorted((d[0], d[1]) for d in
                       c.execute(f"DESCRIBE SELECT * FROM read_parquet({flist})")
                       .fetchall())
        wcols = [d[0] for d in wdesc]
        gcols = [d[0] for d in gdesc]
        if wcols != gcols:
            return None, None, f"COLS_MISMATCH want={wcols} got={gcols}"
        # keep the schema half of the driver-parity contract on the big
        # paths too: EXCEPT ALL (and hash()) coerce types, so an
        # INT-vs-BIGINT drift would otherwise pass here while the strict
        # small-SF path fails it
        tdiff = {w[0]: (w[1], g[1]) for w, g in zip(wdesc, gdesc) if w[1] != g[1]}
        if tdiff:
            return None, None, f"TYPE_MISMATCH {tdiff}"
        return flist, [d[0] for d in wdesc], None

    def duck_compare_hash(c, name, sql, files):
        # The multiset-hash compare is order-independent, but DuckDB honors
        # a subquery's ORDER BY — which forces the full result through a
        # sort and re-opens the very spill this path exists to avoid (the
        # first 10x attempt still filled the disk from inside the oracle's
        # trailing ORDER BY). Strip a TRAILING top-level ORDER BY only: the
        # clause exists solely for the sorted small-SF compare.
        i = sql.upper().rfind("ORDER BY")
        if i != -1 and ")" not in sql[i:]:
            sql = sql[:i]
        flist, wcols, err = described(c, sql, files)
        if err:
            return err
        cols = ", ".join(f'"{x}"' for x in wcols)

        def agg(src):
            return c.execute(
                f"SELECT COUNT(*), SUM(h), BIT_XOR(h), MIN(h), MAX(h) "
                f"FROM (SELECT hash({cols}) AS h FROM {src})").fetchone()

        o = agg(f"({sql}) t")
        s = agg(f"read_parquet({flist})")
        if o[0] != s[0]:
            return f"ROWS_MISMATCH want={o[0]} got={s[0]}"
        if o != s:
            return f"VALUE_MISMATCH multiset-hash fingerprints differ want={o} got={s}"
        return "OK_BIG_HASH"

    def duck_compare(c, name, sql, files):
        flist, wcols, err = described(c, sql, files)
        if err:
            return err
        cols = ", ".join(f'"{x}"' for x in wcols)
        r = c.execute(f"""
            WITH o AS MATERIALIZED (SELECT {cols} FROM ({sql}) t),
                 s AS MATERIALIZED (SELECT {cols} FROM read_parquet({flist}))
            SELECT (SELECT COUNT(*) FROM o),
                   (SELECT COUNT(*) FROM s),
                   (SELECT COUNT(*) FROM
                      ((SELECT * FROM o EXCEPT ALL SELECT * FROM s)
                       UNION ALL
                       (SELECT * FROM s EXCEPT ALL SELECT * FROM o)) d)
            """).fetchone()
        n_o, n_s, n_diff = r
        if n_o != n_s:
            return f"ROWS_MISMATCH want={n_o} got={n_s}"
        if n_diff != 0:
            return f"VALUE_MISMATCH {n_diff} rows differ (duckdb EXCEPT)"
        return "OK_BIG_DUCKDB"

    for name in sorted(oracle):
        _t0 = _time.time()
        print(f"... {name}", flush=True)
        sql = oracle[name]
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            results[name] = "NO_SPARK_OUTPUT"
            print(f"    {name}: NO_SPARK_OUTPUT", flush=True)
            continue
        spark_rows = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
        if spark_rows > big_rows:
            try:
                cmp_fn = duck_compare_hash if spark_rows > hash_rows else duck_compare
                results[name] = cmp_fn(con, name, sql, files)
            except Exception as e:
                results[name] = f"ORACLE_SQL_ERROR: {e}"
                try:
                    con.close()
                except Exception:
                    pass
                con = fresh_con()
            print(f"    {name}: {results[name][:80]} ({_time.time() - _t0:.1f}s)",
                  flush=True)
            continue
        try:
            want = con.execute(sql).df()          # DECIMAL -> float64 here
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR: {e}"
            print(f"    {name}: ORACLE_SQL_ERROR {str(e)[:120]}", flush=True)
            # a DuckDB OOM invalidates the whole connection; reconnect so
            # one heavy oracle can't poison every query after it
            try:
                con.close()
            except Exception:
                pass
            con = fresh_con()
            continue
        try:
            got = load_spark(files)
        except Exception as e:
            results[name] = f"SPARK_READ_ERROR: {e}"
            print(f"    {name}: {results[name][:120]}", flush=True)
            continue
        wcols, gcols = sorted(want.columns), sorted(got.columns)
        if list(wcols) != list(gcols):
            results[name] = f"COLS_MISMATCH want={list(wcols)} got={list(gcols)}"
            print(f"    {name}: {results[name][:120]}", flush=True)
            continue
        if len(want) != len(got):
            results[name] = f"ROWS_MISMATCH want={len(want)} got={len(got)}"
            print(f"    {name}: {results[name][:120]}", flush=True)
            continue
        try:
            want_s, want_str = canon(want)
            got_s, got_str = canon(got)
        except Exception as e:
            # the driver's sort crashes the same way (array cells etc.)
            results[name] = f"ERR_SORT ({type(e).__name__}: {e})"
            print(f"    {name}: {results[name][:120]}", flush=True)
            continue
        dt = {c: (str(want_s[c].dtype), str(got_s[c].dtype))
              for c in wcols if str(want_s[c].dtype) != str(got_s[c].dtype)}
        if dt:
            results[name] = f"DTYPE_MISMATCH {dt}"
            print(f"    {name}: {results[name][:120]}", flush=True)
            continue
        bad = None
        for c in wcols:
            wv, gv = want_str[c].tolist(), got_str[c].tolist()
            if wv != gv:
                i = next(i for i, (a, b) in enumerate(zip(wv, gv)) if a != b)
                bad = f"VALUE_MISMATCH row={i} col={c} want={want_s[c].iloc[i]!r} got={got_s[c].iloc[i]!r}"
                break
        results[name] = bad if bad else "OK"
        print(f"    {name}: {results[name][:80]} ({_time.time() - _t0:.1f}s)",
              flush=True)
    n_ok = sum(1 for v in results.values() if v in ("OK", "OK_BIG_DUCKDB", "OK_BIG_HASH"))
    for k, v in results.items():
        mark = "PASS" if v in ("OK", "OK_BIG_DUCKDB", "OK_BIG_HASH") else "FAIL"
        print(f"{mark} {k}: {v}")
    # queries with no oracle: the driver still loads + sorts them (rows-only);
    # an array column crashes that path, so run the same canon here.
    spark_only = sorted(os.path.basename(d) for d in glob.glob(f"{out_dir}/*")
                        if os.path.isdir(d) and os.path.basename(d) not in oracle)
    rows_only_bad = []
    for name in spark_only:
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        try:
            df = load_spark(files)
            canon(df)
            if len(df) == 0:
                rows_only_bad.append(f"{name}: EMPTY")
        except Exception as e:
            rows_only_bad.append(f"{name}: ERR_SORT ({type(e).__name__})")
    if spark_only:
        print(f"rows-only (no oracle): {spark_only}")
    for b in rows_only_bad:
        print(f"FAIL rows-only {b}")
    print(f"== {n_ok}/{len(results)} oracle-matched, "
          f"{len(spark_only) - len(rows_only_bad)}/{len(spark_only)} rows-only loadable")
    return 0 if (n_ok == len(results) and not rows_only_bad) else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
