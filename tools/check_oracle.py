#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB oracle compare.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>

Registers the testdata parquet tables as DuckDB views, runs each
oracle_sql.json entry, and compares against the Spark parquet output:
column names (sorted), dtypes, and value rows (sorted stringified).
Driver-side tooling only — not part of the Scala build.
"""
import duckdb, json, sys

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main(out, sf):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            want = con.execute(sql).fetchdf()
            got = con.execute(
                f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')").fetchdf()
            want = want[sorted(want.columns)]
            got = got[sorted(got.columns)]
            if list(want.columns) != list(got.columns):
                print(f"{name}: SCHEMA MISMATCH got={list(got.columns)} want={list(want.columns)}")
                bad += 1
                continue
            dt = [(c, str(got[c].dtype), str(want[c].dtype))
                  for c in want.columns if str(got[c].dtype) != str(want[c].dtype)]
            ws = want.astype(str).values.tolist()
            gs = got.astype(str).values.tolist()
            ws.sort(); gs.sort()
            status = "OK" if ws == gs else "VALUE MISMATCH"
            if status != "OK":
                bad += 1
            extra = f" DTYPE DIFF {dt}" if dt else ""
            print(f"{name}: {status} rows={len(gs)}/{len(ws)}{extra}")
            if status != "OK":
                for a, b in list(zip(ws, gs))[:500]:
                    if a != b:
                        print("   want:", a[:6], "\n   got: ", b[:6])
                        break
        except Exception as e:
            bad += 1
            print(f"{name}: ERROR {str(e).splitlines()[0][:200]}")
    sys.exit(1 if bad else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
