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

With --embeddings, the embeddings table is ALSO replicated (default:
byte-copied, which makes embedding-family scale reads variance reads —
the r16 verdict's q121 caveat). Replica k applies a circular shift of
k mod dim positions to every vector, negating it for k >= dim. Both are
orthogonal transforms, so each replica's INTERNAL geometry (pairwise
cosines, hence near-dup structure, cluster shape, top-k ranks) is
identical to the original's, while cross-replica cosines are those of a
vector against an unrelated rotation — pseudo-random, not 1.0 — so the
corpus does not collapse into reps-sized duplicate classes. Work for
pair-producing embedding queries scales by N, matching the documents
scheme. vec_id is re-keyed with the same stride discipline.

Usage: python3 tools/make_scale_corpus.py SRC_DIR OUT_DIR [REPLICAS=10] [--embeddings]
"""
import sys, os, shutil
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]
DOC_STRIDE = 1_000_000
USER_STRIDE = 1_000_000
EVENT_STRIDE = 100_000_000
VEC_STRIDE = 1_000_000


def main():
    argv = [a for a in sys.argv[1:] if a != "--embeddings"]
    scale_embeddings = "--embeddings" in sys.argv
    src, out = argv[0], argv[1]
    reps = int(argv[2]) if len(argv) > 2 else 10
    os.makedirs(out, exist_ok=True)
    skip = {"documents", "events"} | ({"embeddings"} if scale_embeddings else set())
    for t in TABLES:
        if t in skip:
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

    if scale_embeddings:
        # Circular shift by k mod dim (1-indexed list slices); negate the
        # whole vector for k >= dim so up to 2*dim replicas stay distinct
        # transforms. k=0 keeps the original bytes. len(embedding) is read
        # per row, so a future dim change needs no edit here.
        con.execute(f"""
          COPY (
            SELECT vec_id + k * {VEC_STRIDE} AS vec_id,
              CASE WHEN k = 0 THEN embedding ELSE
                list_transform(
                  embedding[(k % len(embedding)) + 1:]
                    || embedding[1:(k % len(embedding))],
                  x -> CASE WHEN k >= len(embedding) THEN -x ELSE x END)
                ::FLOAT[]
              END AS embedding,
              label
            FROM read_parquet('{src}/embeddings.parquet'),
                 (SELECT unnest(range({reps})) AS k)
            ORDER BY vec_id
          ) TO '{out}/embeddings.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE 8192)
        """)

    scaled = ["documents", "events"] + (["embeddings"] if scale_embeddings else [])
    for t in scaled:
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{out}/{t}.parquet')").fetchone()[0]
        print(f"{t}: {n} rows ({reps}x)")


if __name__ == "__main__":
    main()
