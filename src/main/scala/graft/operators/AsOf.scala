package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of join — the canonical operator Spark lacks natively: for each left
 * row, attach the single right row with the greatest timestamp at or
 * before the left row's timestamp, per key.
 *
 * Implementation is a COMPOSITION of existing operators (the preferred
 * strategy before custom plans): tag both sides, union them, and carry the
 * last non-null right payload forward with a keyed window. That costs ONE
 * hash shuffle on the key plus a per-key sort — it never materializes the
 * (left × right-within-range) blow-up an inequality join would, so it
 * scales exactly like any windowed aggregation at 100 TB. An event at
 * exactly the left timestamp counts (right rows sort before left rows on
 * ties); among right rows with identical timestamps the greatest payload
 * wins, making results fully deterministic for orderable payloads.
 *
 * @param payload the right-side column (or struct) to attach; must be
 *                orderable (used as the final tie-break)
 * @return left rows + `asof_<alias>` column, null when no right row
 *         precedes the left row
 */
object AsOf {

  def joinPrior(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTs: String, rightTs: String, payload: Column,
      payloadAlias: String = "prior"): DataFrame = {
    require(keyCols.nonEmpty, "as-of join requires at least one key column")
    val keys = keyCols.map(col)
    val leftCols = left.columns.toSeq

    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumn("__payload", lit(null).cast(
        right.select(payload).schema.head.dataType))
    val r = right.select(
      (keys :+ col(rightTs).as("__ts") :+ lit(0).as("__side") :+
        payload.as("__payload")): _*)
    // Align schemas: right rows carry nulls for the left's columns.
    val rAligned = leftCols.foldLeft(r) { (df, c) =>
      if (keyCols.contains(c) || df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }

    val w = Window.partitionBy(keys: _*)
      .orderBy(col("__ts").asc, col("__side").asc, col("__payload").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.select((l.columns.map(col)).toIndexedSeq: _*)
      .unionByName(rAligned.select(l.columns.map(col).toIndexedSeq: _*))
      .withColumn(s"asof_$payloadAlias", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .drop("__ts", "__side", "__payload")
  }
}
