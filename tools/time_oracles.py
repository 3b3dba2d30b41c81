#!/usr/bin/env python3
"""Time DuckDB oracle queries against a testdata dir (median of N runs).

The perf ledger's oracle-side instrument: the same DuckDB engine and views
tools/check_oracle.py uses, timing only. Results are materialized with
a COUNT(*) wrapper-free fetchall() so the full result set is produced,
matching what check_oracle pays.

Usage: python3 tools/time_oracles.py SF_DIR ORACLE_SQL_JSON [q1,q2,...] [runs=3]
Prints one JSON object {query: median_sec}.
"""
import sys, os, json, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main():
    sf, oracle_path = sys.argv[1], sys.argv[2]
    names = sys.argv[3].split(",") if len(sys.argv) > 3 and sys.argv[3] != "-" else None
    runs = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    oracle = json.load(open(oracle_path))
    if names is None:
        names = sorted(oracle)
    con = duckdb.connect()
    con.execute(f"SET threads={os.cpu_count()}")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    out = {}
    for name in names:
        sql = oracle[name]
        times = []
        for _ in range(runs):
            t0 = time.monotonic()
            con.execute(sql).fetchall()
            times.append(time.monotonic() - t0)
        times.sort()
        out[name] = round(times[len(times) // 2], 4)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
