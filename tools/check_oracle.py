#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify output
against the DuckDB oracle SQL and compare sorted-column/sorted-row values.

Type-strict since round 9: the driver's hasher is type-sensitive (it caught
q165's DuckDB HUGEINT vs Spark int64 even though every value was equal), so
before comparing values we compare per-column arrow type *kinds* between the
engine parquet and the oracle result. Kinds distinguish int vs decimal vs
float bitwidths but deliberately collapse representation-only differences
(string vs large_string, dictionary encoding, timestamp unit) that the
driver's value hash does not see.

Wide-type-strict since round 15: the round-14 driver gate failed 8 queries
(q220 family) whose final schemas matched KIND-for-kind — engine
decimal(38,0) vs oracle HUGEINT both collapse to decimal128 through Arrow —
because the driver's hasher reads through a non-Arrow DuckDB path where both
render as float64 (formatting divergence, plus genuine digit loss past
2^53). Value equality through Arrow is therefore NOT sufficient: any
decimal/HUGEINT column in a FINAL schema is a latent driver-hash failure.
This replica now hard-fails any query whose final schema carries a decimal
column on either side — wide exact values must ship as BIGINT (when bounded)
or VARCHAR (for true int128+ headroom); see the output-type contract in
FIXTURES.md.

Usage: python3 tools/check_oracle.py [sfDir] [verifyOut]
"""
import sys, json, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def type_kind(t):
    """Collapse an arrow DataType to the signature the driver's hasher sees."""
    import pyarrow as pa
    if pa.types.is_dictionary(t):
        return type_kind(t.value_type)
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_integer(t):
        return f"int{t.bit_width}"
    if pa.types.is_floating(t):
        return f"float{t.bit_width}"
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{type_kind(t.value_type)}>"
    if pa.types.is_struct(t):
        inner = ",".join(f"{f.name}:{type_kind(f.type)}" for f in t)
        return f"struct<{inner}>"
    if pa.types.is_map(t):
        return f"map<{type_kind(t.key_type)},{type_kind(t.item_type)}>"
    return str(t)


def schema_sig(tbl):
    return {f.name: type_kind(f.type) for f in tbl.schema}


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
            mine_t = con.execute(
                f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')").arrow()
            theirs_t = con.execute(sql).arrow()
            sig_m, sig_t = schema_sig(mine_t), schema_sig(theirs_t)
            if sig_m != sig_t:
                n_fail += 1
                diffs = sorted(set(sig_m.items()) ^ set(sig_t.items()))
                print(f"FAIL  {name}: TYPE mismatch")
                for col in sorted({c for c, _ in diffs}):
                    print(f"      {col}: mine={sig_m.get(col)} oracle={sig_t.get(col)}")
                continue
            # substring match, not startswith: a decimal NESTED in a
            # list/struct kind ("list<decimal(38,0)>") hits the same
            # non-Arrow float64 hash path as a top-level one
            wide = sorted({c for c, k in
                           list(sig_m.items()) + list(sig_t.items())
                           if "decimal" in k})
            if wide:
                n_fail += 1
                print(f"FAIL  {name}: WIDE-TYPE columns {wide} — "
                      "decimal/HUGEINT in a final schema diverges in the "
                      "driver's non-Arrow hash path; ship BIGINT or VARCHAR "
                      "(FIXTURES.md output-type contract)")
                continue
            mine, theirs = mine_t.to_pandas(), theirs_t.to_pandas()
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
