package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types._

/**
 * Loaders for the harness's TPC-H-ish parquet tables (see TESTDATA.md).
 *
 * Everything is a plain `spark.read.parquet` — filters and column pruning
 * push down to the scan — except `events`, whose `ts` column is written as
 * parquet TIMESTAMP(NANOS): Spark 4 refuses nano timestamps unless they are
 * read as raw longs, so we read with an explicit schema typing `ts` as LONG
 * and convert to a proper microsecond TimestampType column with integer
 * arithmetic (no double rounding). The explicit schema keeps the workaround
 * scoped to this one read — no session conf is touched (round-1 ADVICE:
 * `spark.sql.legacy.parquet.nanosAsLong` leaked into every later read).
 */
object Tables {

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** Fixed TESTDATA.md schema of `events`, with `ts` read as raw nano longs. */
  private val eventsRawSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** `events` with `ts` converted from nano-longs to TimestampType (micros). */
  def events(spark: SparkSession, dir: String): DataFrame =
    spark.read.schema(eventsRawSchema).parquet(s"$dir/events.parquet")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))

  /** `events` as a bounded STREAM (file source) — same raw-nanos schema
   * workaround as [[events]]. Drive with `Trigger.AvailableNow` to process
   * the table once through the streaming engine; useful for proving
   * stream/batch parity on the same files. */
  def eventsStream(spark: SparkSession, dir: String): DataFrame =
    // The file stream source insists its base path is a DIRECTORY, and
    // events.parquet is a single file — point basePath at the parent and
    // glob the one file.
    spark.readStream.schema(eventsRawSchema).option("basePath", dir)
      .parquet(s"$dir/{events.parquet}")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))

  /** Fixed TESTDATA.md schema of `orders` (file streams require an
   * explicit schema). */
  private val ordersSchema = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", TimestampType),
    StructField("o_orderpriority", StringType)))

  /** `orders` as a bounded STREAM (file source) — the changeset shape of
   * streaming CDC. Same single-file glob workaround as [[eventsStream]]. */
  def ordersStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(ordersSchema).option("basePath", dir)
      .parquet(s"$dir/{orders.parquet}")

  /** Fixed TESTDATA.md schema of `documents` (file streams require an
   * explicit schema — no inference pass over a possibly-growing dir). */
  private val documentsSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** `documents` as a bounded STREAM (file source) — the ingest shape of a
   * production corpus: a directory that accumulates document files, tailed
   * incrementally. Same single-file glob workaround as [[eventsStream]]. */
  def documentsStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(documentsSchema).option("basePath", dir)
      .parquet(s"$dir/{documents.parquet}")
}
