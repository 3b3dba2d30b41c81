#!/usr/bin/env python3
"""Build a ~Nx scale corpus from an existing testdata dir (PERF.md's
amortization measurement — VERDICT r10 task 1).

documents and events are replicated `replicas` times with re-keyed ids.
Document text in replica k>0 gets a per-replica token suffix
(`word` -> `wordzk`), so replicas are token-DISJOINT: gram sets never
collide across replicas and every pair-producing query (PPJoin family,
near-dup) scales its work and its result by exactly N, not N^2 — a plain
self-union would instead turn every document into a 10-member identity
class and measure the dup-collapse path, not amortization. Event replicas
re-key user_id (and event_id), keeping timestamps: N x as many users with
the SAME per-user day-frame sizes, which is precisely the shape the
window-sketch amortization question needs.

All other tables are byte-copied so graft.sources.Preflight passes.
Outputs are single parquet FILES (not directories) with small row groups,
so both Spark (row-group splits) and tools/check_oracle.py's
read_parquet('<dir>/<t>.parquet') views work unchanged.

Usage: python3 tools/make_scale_corpus.py SRC_DIR OUT_DIR [REPLICAS=10]
"""
import sys, os, shutil
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]
DOC_STRIDE = 1_000_000
USER_STRIDE = 1_000_000
EVENT_STRIDE = 100_000_000


def main():
    src, out = sys.argv[1], sys.argv[2]
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(out, exist_ok=True)
    for t in TABLES:
        if t in ("documents", "events"):
            continue
        shutil.copyfile(f"{src}/{t}.parquet", f"{out}/{t}.parquet")

    con = duckdb.connect()
    con.execute(f"SET threads={os.cpu_count()}")

    # documents: token-suffixed replicas (k=0 is the original bytes).
    con.execute(f"""
      COPY (
        WITH rep AS (
          SELECT d.*, k,
            CASE WHEN k = 0 THEN text
                 ELSE regexp_replace(text, '(\\S+)', '\\1z' || k, 'g')
            END AS new_text
          FROM read_parquet('{src}/documents.parquet') d,
               (SELECT unnest(range({reps})) AS k)
        )
        SELECT doc_id + k * {DOC_STRIDE} AS doc_id,
               new_text AS text, lang, source,
               length(new_text)::BIGINT AS n_chars
        FROM rep ORDER BY doc_id
      ) TO '{out}/documents.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE 4096)
    """)

    # events: re-keyed users, identical timestamps.
    con.execute(f"""
      COPY (
        SELECT event_id + k * {EVENT_STRIDE} AS event_id, ts,
               user_id + k * {USER_STRIDE} AS user_id,
               event_type, value, props
        FROM read_parquet('{src}/events.parquet'),
             (SELECT unnest(range({reps})) AS k)
        ORDER BY event_id
      ) TO '{out}/events.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE 65536)
    """)

    for t in ("documents", "events"):
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{out}/{t}.parquet')").fetchone()[0]
        print(f"{t}: {n} rows ({reps}x)")


if __name__ == "__main__":
    main()
