#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle compare.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

For each query in <verifyOutDir>/oracle_sql.json: register the sfDir
parquet tables as DuckDB views, run the oracle SQL, load the Spark
result parquet, sort columns by name, canonicalize values, and compare
as multisets. Prints per-query match status.
"""
import sys, json, glob, os, time
import duckdb

def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return f"{v:.9g}"
    return str(v)

def rowset(df):
    cols = sorted(df.columns)
    rows = [tuple(canon(v) for v in row) for row in df[cols].itertuples(index=False, name=None)]
    return cols, sorted(rows)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p).replace(".parquet", "")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    ok = bad = 0
    t_all = time.time()
    for name, sql in sorted(oracles.items()):
        spark_glob = os.path.join(out_dir, name, "*.parquet")
        t0 = time.time()
        try:
            # Arrow-level type check FIRST: the driver hashes
            # type-sensitively (round 1: identical values, DECIMAL(28,2)
            # vs DECIMAL(38,2) → hash mismatch), so string-canonical value
            # comparison alone masks real failures.
            got_at = con.execute(
                f"SELECT * FROM read_parquet('{spark_glob}')").fetch_arrow_table()
            want_at = con.execute(sql).fetch_arrow_table()
            got_types = {f.name: str(f.type) for f in got_at.schema}
            want_types = {f.name: str(f.type) for f in want_at.schema}
            got = con.execute(
                f"SELECT * FROM read_parquet('{spark_glob}')").fetchdf()
            want = con.execute(sql).fetchdf()
            gc, gr = rowset(got)
            wc, wr = rowset(want)
            if gc != wc:
                print(f"FAIL {name}: columns {gc} vs oracle {wc}")
                bad += 1
            elif got_types != want_types:
                diff = {k: (got_types.get(k), want_types.get(k))
                        for k in set(got_types) | set(want_types)
                        if got_types.get(k) != want_types.get(k)}
                print(f"FAIL {name}: arrow types differ {diff}")
                bad += 1
            elif gr != wr:
                sw, sg = set(wr), set(gr)
                diff = [x for x in gr if x not in sw][:3]
                diff2 = [x for x in wr if x not in sg][:3]
                print(f"FAIL {name}: {len(gr)} vs {len(wr)} rows; spark-only {diff} oracle-only {diff2}")
                bad += 1
            else:
                print(f"OK   {name}: {len(gr)} rows ({time.time()-t0:.1f}s)")
                ok += 1
        except Exception as e:
            print(f"ERR  {name}: {e} ({time.time()-t0:.1f}s)")
            bad += 1
    print(f"{ok} ok, {bad} bad, {time.time()-t_all:.1f}s total")
    return 1 if bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
