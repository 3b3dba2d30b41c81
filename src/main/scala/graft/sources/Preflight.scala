package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Fixture-drift canary. The harness regenerates `/root/testdata` between
 * rounds, and round 7 proved a silent regeneration can invalidate a large
 * slice of the oracle suite while the unit tests (which use synthetic
 * in-memory data) stay green: `events.ts` switched from TIMESTAMP(NANOS)
 * to timestamp[us] and the old raw-long loader shifted every event to
 * January 1970. This check runs before any correctness dump or benchmark
 * and fails LOUDLY if the fixtures don't look like the TESTDATA.md contract
 * — so an environment change surfaces as one clear error instead of dozens
 * of silently-wrong query results.
 *
 * Checks (all metadata/aggregate-only, < 1 s at any SF):
 *  - every TESTDATA.md table is readable and non-empty;
 *  - `events.ts` parses to real calendar time: min/max year in [2020, 2030]
 *    and the span covers more than one calendar day (the 1970 bug collapsed
 *    30 days into 43 minutes);
 *  - `documents.text` and `embeddings.embedding` are non-null on a sample row.
 */
object Preflight {

  private val tableNames = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Throws IllegalStateException with an explicit message on drift. */
  def check(spark: SparkSession, dir: String): Unit = {
    val problems = scala.collection.mutable.ArrayBuffer.empty[String]

    for (t <- tableNames) {
      try {
        val n = spark.read.parquet(s"$dir/$t.parquet").limit(1).count()
        if (n == 0) problems += s"$t: readable but empty"
      } catch {
        case e: Throwable => problems += s"$t: unreadable (${e.getMessage.take(120)})"
      }
    }

    if (!problems.exists(_.startsWith("events:"))) {
      try {
        val row = Tables.events(spark, dir)
          .agg(
            min(year(col("ts"))).as("ymin"),
            max(year(col("ts"))).as("ymax"),
            countDistinct(to_date(col("ts"))).as("days"))
          .head()
        val (ymin, ymax, days) = (row.getInt(0), row.getInt(1), row.getLong(2))
        if (ymin < 2020 || ymax > 2030)
          problems += s"events.ts year range [$ymin, $ymax] outside [2020, 2030] — " +
            "fixture encoding changed again? (see Tables.eventsTsIsNative)"
        if (days < 2)
          problems += s"events.ts spans only $days calendar day(s) — timestamps collapsed"
      } catch {
        case e: Throwable => problems += s"events.ts sanity agg failed: ${e.getMessage.take(120)}"
      }
    }

    try {
      val d = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text").head()
      if (d.isNullAt(1)) problems += "documents.text null on first row"
      // ASCII invariant (sampled; FixtureCanarySpec full-scans): several
      // oracles' tokenization parity silently depends on it — Java's \s
      // and DuckDB/RE2's \s disagree on Unicode whitespace, so a fixture
      // regeneration that introduces non-ASCII text would split the
      // engines on q10/q60/q165-family queries without any error. chars
      // == bytes iff pure ASCII.
      val nonAscii = spark.read.parquet(s"$dir/documents.parquet")
        .select("text").limit(2000)
        .filter(length(col("text")) =!= octet_length(col("text")))
        .count()
      if (nonAscii > 0)
        problems += s"documents.text: $nonAscii of 2000 sampled rows contain non-ASCII — " +
          "Java-regex vs RE2 \\s tokenization parity is no longer guaranteed"
    } catch { case e: Throwable => problems += s"documents sample failed: ${e.getMessage.take(120)}" }
    try {
      val e = spark.read.parquet(s"$dir/embeddings.parquet").select("vec_id", "embedding").head()
      if (e.isNullAt(1)) problems += "embeddings.embedding null on first row"
    } catch { case e: Throwable => problems += s"embeddings sample failed: ${e.getMessage.take(120)}" }

    if (problems.nonEmpty) {
      val msg = s"FIXTURE DRIFT DETECTED in $dir — refusing to run against bad fixtures:\n" +
        problems.map("  - " + _).mkString("\n")
      System.err.println(msg)
      throw new IllegalStateException(msg)
    }
  }
}
