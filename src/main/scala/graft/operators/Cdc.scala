package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Change-data-capture application — the relational counterpart of the
 * incremental-ingest dedup trio ([[graft.dedup.Dedup.incrementalNewDocs]]
 * and friends): fold a changeset into a stored snapshot instead of folding
 * a document batch into a stored corpus.
 *
 * [[applyChangeset]] is SCD-type-1 (latest state wins); [[scd2Intervals]]
 * derives SCD-type-2 validity intervals from a change history. Both are
 * compositions of existing operators (window + anti-join + union), not
 * custom plans — the preferred strategy.
 *
 * Scale shape of [[applyChangeset]] at 100 TB: the changeset (typically a
 * day's upserts, orders of magnitude smaller than the snapshot) pays ONE
 * hash shuffle for the latest-wins window; the snapshot side is a
 * broadcast LEFT ANTI probe — the snapshot itself NEVER shuffles, so the
 * merge costs one pass over the snapshot plus a changeset-sized exchange,
 * exactly the incremental-ingest pattern. With `broadcastChanges=false`
 * (changeset too big to broadcast) the anti-join falls back to a shuffle
 * on the key — pair it with a snapshot stored bucketed by key
 * ([[graft.sources.Layout.writeBucketed]]) for a zero-exchange
 * snapshot side.
 */
object Cdc {

  /**
   * Apply a changeset to a current-state snapshot, SCD-type-1: per key the
   * LATEST change (by `seqCols`, descending-major order) wins; an upsert
   * (`opCol != deleteOp`) replaces the snapshot row wholesale (a NULL in
   * an upsert column is applied, never backfilled from the old row) or
   * inserts a new key; a delete removes the key; untouched snapshot rows
   * pass through unchanged.
   *
   * @param snapshot one row per key: `keyCols` ++ value columns
   * @param changes  `keyCols` ++ `seqCols` ++ `opCol` ++ the same value
   *                 columns as `snapshot`
   * @param seqCols  change ordering within a key (e.g. change-ts,
   *                 change-id tie-break); must be duplicate-free per key
   *                 for a deterministic result
   */
  def applyChangeset(snapshot: DataFrame, changes: DataFrame,
      keyCols: Seq[String], seqCols: Seq[String], opCol: String = "op",
      deleteOp: String = "D", broadcastChanges: Boolean = true): DataFrame = {
    require(keyCols.nonEmpty, "applyChangeset requires at least one key column")
    require(seqCols.nonEmpty, "applyChangeset requires at least one seq column")
    val valueCols = snapshot.columns.toSeq.filterNot(keyCols.contains)
    val missing = (keyCols ++ seqCols ++ Seq(opCol) ++ valueCols)
      .filterNot(changes.columns.contains)
    require(missing.isEmpty, s"changes is missing columns: ${missing.mkString(", ")}")

    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(seqCols.map(c => col(c).desc): _*)
    val latest = changes.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)

    val out = (keyCols ++ valueCols).map(col)
    val upserts = latest.filter(col(opCol) =!= deleteOp).select(out: _*)
    // Every changed key leaves the snapshot side — replaced by its upsert
    // row, or gone if the latest change is a delete.
    val changedKeys0 = latest.select(keyCols.map(col): _*)
    val changedKeys = if (broadcastChanges) broadcast(changedKeys0) else changedKeys0
    snapshot.join(changedKeys, keyCols, "left_anti").unionByName(upserts)
  }

  /**
   * SCD-type-2 validity intervals from a change history: per key ordered
   * by `seqCol`, each version is valid from its own sequence value until
   * the next version's (`valid_to` NULL on the current version, flagged
   * `is_current`). One keyed window shuffle — scales like any windowed
   * aggregation. `seqCol` must be duplicate-free per key (collapse ties
   * first, e.g. latest-change-of-day, as q110 does).
   */
  def scd2Intervals(history: DataFrame, keyCols: Seq[String], seqCol: String,
      validFrom: String = "valid_from", validTo: String = "valid_to",
      isCurrent: String = "is_current"): DataFrame = {
    require(keyCols.nonEmpty, "scd2Intervals requires at least one key column")
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(seqCol).asc)
    history
      .withColumn(validFrom, col(seqCol))
      .withColumn(validTo, lead(col(seqCol), 1).over(w))
      .withColumn(isCurrent, col(validTo).isNull)
  }

  /**
   * Corpus snapshot diff: classify every id across two dataset versions as
   * `added` (only in current), `removed` (only in previous), `changed`
   * (both, content fingerprints differ) or `unchanged` — the audit a
   * training-data pipeline runs between corpus releases before re-training
   * on "the same data, refreshed".
   *
   * Callers pass PROJECTIONS carrying the id and a content fingerprint
   * (e.g. [[graft.text.TextAnalysis.fingerprint]]), so the full-outer
   * equi-join shuffles (id, fp) coordinates only — document text never
   * rides the exchange, the library-wide contract. At 100 TB both sides
   * are snapshot-sized; store them bucketed by id
   * ([[graft.sources.Layout.writeBucketed]]) and the join plans with zero
   * exchanges.
   *
   * @param prev (idCol, fpCol) projection of the previous release
   * @param cur  (idCol, fpCol) projection of the current release
   * @return one row per id in either version: (idCol, status)
   */
  def snapshotDiff(prev: DataFrame, cur: DataFrame,
      idCol: String = "doc_id", fpCol: String = "fp"): DataFrame =
    // Presence rides explicit indicators, not fp nullability — a version
    // may legitimately carry a NULL fingerprint (null text), and two NULL
    // fingerprints on both sides compare as unchanged (null-safe <=>).
    prev.select(col(idCol), col(fpCol).as("fp_prev"), lit(true).as("in_prev"))
      .join(cur.select(col(idCol), col(fpCol).as("fp_cur"), lit(true).as("in_cur")),
        Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("in_prev").isNull, "added")
          .when(col("in_cur").isNull, "removed")
          .when(col("fp_prev") <=> col("fp_cur"), "unchanged")
          .otherwise("changed").as("status"))
}
