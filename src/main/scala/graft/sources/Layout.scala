package graft.sources

import org.apache.spark.sql.DataFrame

/**
 * Physical-layout helpers: bucketing for shuffle-free co-located joins.
 *
 * At 100 TB the same fact tables join on the same keys every day; paying a
 * full shuffle of both sides per query is the single largest avoidable
 * cost. Writing both sides bucketed (and sorted) by the join key once means
 * every subsequent equi-join on that key reads co-located buckets and
 * plans a sort-merge join with NO Exchange on either side — the scan IS the
 * shuffle, amortized over every future query.
 */
object Layout {

  /**
   * Write `df` as a bucketed, bucket-sorted table in the session catalog.
   * Joins between tables bucketed the same way (same columns, same count)
   * plan without an exchange; `nBuckets` should be sized so one bucket of
   * the LARGER table fits an executor's memory comfortably.
   */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
      nBuckets: Int): Unit =
    df.write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .saveAsTable(table)
}
