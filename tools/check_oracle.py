#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify output
against the DuckDB oracle SQL and compare sorted-column/sorted-row values.

Usage: python3 tools/check_oracle.py [sfDir] [verifyOut]
"""
import sys, json, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def norm_df(df):
    df = df[sorted(df.columns)]
    rows = [tuple(norm_cell(v) for v in row) for row in df.itertuples(index=False)]
    return sorted(rows)


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            mine = con.execute(
                f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')").df()
            theirs = con.execute(sql).df()
            a, b = norm_df(mine), norm_df(theirs)
            if a == b:
                print(f"PASS  {name}  ({len(a)} rows)")
                n_pass += 1
            else:
                n_fail += 1
                print(f"FAIL  {name}: mine={len(a)} rows, oracle={len(b)} rows")
                for i, (x, y) in enumerate(zip(a, b)):
                    if x != y:
                        print(f"      first diff row {i}:\n        mine:   {x}\n        oracle: {y}")
                        break
                if len(a) != len(b):
                    only_a = [r for r in a if r not in b][:3]
                    only_b = [r for r in b if r not in a][:3]
                    print(f"      only mine: {only_a}\n      only oracle: {only_b}")
        except Exception as e:
            n_fail += 1
            print(f"ERROR {name}: {e}")
    print(f"\n{n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
