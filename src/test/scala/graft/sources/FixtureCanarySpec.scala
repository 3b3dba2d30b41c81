package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Fixture-drift canary over the REAL driver-generated testdata (not the
 * suite's synthetic frames). Round 7 shipped 19 red correctness rows
 * because the driver regenerated `events.parquet` with a different `ts`
 * encoding mid-round and nothing in `sbt test` touched the real files —
 * this spec makes that class of environment change fail the build loudly.
 *
 * Skips cleanly (via `assume`) when /root/testdata is absent, e.g. when
 * the suite runs on a dev machine without the harness fixtures.
 */
class FixtureCanarySpec extends AnyFunSuite with graft.testutil.OpenStreamLeakCheck {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-fixture-canary")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"
  private def fixturesPresent = new java.io.File(dir).isDirectory

  test("Preflight.check passes on the current fixtures") {
    assume(fixturesPresent, s"$dir not present; skipping canary")
    Preflight.check(spark, dir) // throws IllegalStateException on drift
  }

  test("documents.text and embeddings payloads hold the oracle-parity invariants (full scan)") {
    assume(fixturesPresent, s"$dir not present; skipping canary")
    import org.apache.spark.sql.functions._
    // ASCII-only text is load-bearing: Java \s (engine tokenizer) and
    // RE2 \s (DuckDB oracle) agree on ASCII whitespace only. A fixture
    // regeneration introducing Unicode (NBSP, ideographic space, curly
    // quotes) would silently split tokenization in the q10/q60/q165
    // families. chars == bytes iff pure ASCII, so this is one cheap scan.
    val badText = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("text").isNull || length(col("text")) =!= octet_length(col("text")))
      .count()
    assert(badText === 0L,
      s"$badText documents rows null or non-ASCII — oracle tokenization parity broken")
    // Embeddings: fixed dimension, finite values — the invariants the
    // ANN/cosine oracles assume without checking.
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val dims = emb.select(size(col("embedding")).as("d")).distinct().collect().map(_.getInt(0))
    assert(dims.length === 1 && dims.head > 0, s"embedding dims not uniform: ${dims.toSeq}")
    val nonFinite = emb
      .filter(exists(col("embedding"), v => isnan(v) || v === Float.PositiveInfinity ||
        v === Float.NegativeInfinity))
      .count()
    assert(nonFinite === 0L, s"$nonFinite embeddings contain NaN/Inf")
  }

  test("events.ts lands in real calendar time under the adaptive loader") {
    assume(fixturesPresent, s"$dir not present; skipping canary")
    val row = Tables.events(spark, dir)
      .agg(min(year(col("ts"))), max(year(col("ts"))), countDistinct(to_date(col("ts"))))
      .head()
    val (ymin, ymax, days) = (row.getInt(0), row.getInt(1), row.getLong(2))
    assert(ymin >= 2020 && ymax <= 2030,
      s"events.ts years [$ymin, $ymax] outside [2020, 2030] — loader misreads the fixture encoding")
    assert(days >= 2, s"events.ts collapsed to $days day(s)")
  }

  test("adaptive loader reads BOTH ts encodings to identical values") {
    assume(fixturesPresent, s"$dir not present; skipping canary")
    // Rewrite the fixture's first rows in each encoding and prove
    // Tables.events returns the same timestamps for both files.
    val tmp = java.nio.file.Files.createTempDirectory("graft-canary").toString
    val src = Tables.events(spark, dir).orderBy("event_id").limit(50)

    val microsDir = s"$tmp/micros"; val nanosDir = s"$tmp/nanos"
    src.write.mode("overwrite").parquet(s"$microsDir/events.parquet")
    // Emulate the legacy TIMESTAMP(NANOS) fixture: ts as raw nano longs
    // (what Spark 4 sees when it reads a NANOS column with a long schema).
    src.withColumn("ts", expr("unix_micros(ts) * 1000L"))
      .write.mode("overwrite").parquet(s"$nanosDir/events.parquet")

    val a = Tables.events(spark, microsDir).select("event_id", "ts")
      .orderBy("event_id").collect().toSeq
    val b = Tables.events(spark, nanosDir).select("event_id", "ts")
      .orderBy("event_id").collect().toSeq
    assert(a == b, "micros-encoded and nanos-encoded fixtures decode differently")
  }

  test("every TESTDATA.md table is readable and non-empty") {
    assume(fixturesPresent, s"$dir not present; skipping canary")
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "events", "documents", "embeddings")) {
      assert(spark.read.parquet(s"$dir/$t.parquet").limit(1).count() == 1L,
        s"table $t is empty or unreadable")
    }
  }
}
