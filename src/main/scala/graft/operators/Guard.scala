package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Data-quality gates: declared integer constraints evaluated in ONE pass
 * over the frame — the admission check a pipeline runs before promoting a
 * batch (row counts in bounds, zero nulls in required columns, key
 * uniqueness, rate ceilings). Constraints are integer aggregates compared
 * against closed bounds, so the report is bit-identical across engines
 * and a DuckDB oracle can restate every row (q151).
 *
 * Two evaluation modes:
 *  - [[audit]]: the report as a DataFrame — ONE aggregation job over all
 *    checks together (multiple aggregates in a single agg pass; never one
 *    scan per check).
 *  - [[observedRun]]: zero-extra-scan gating for production writes — the
 *    metrics ride the SAME job as the caller's action via `observe`, and
 *    a violation throws AFTER the action with every failed check listed
 *    (the write has happened; the gate's job is to stop PROMOTION —
 *    callers commit/swap only when it returns).
 */
object Guard {

  /** One constraint: `metric` must be an aggregate expression evaluating
   * to an integral value inside [lo, hi] (closed bounds). */
  case class Check(name: String, metric: Column,
      lo: Long = Long.MinValue, hi: Long = Long.MaxValue) {
    require(name.matches("[A-Za-z0-9_]+"), s"check name must be simple: $name")
    require(lo <= hi, s"empty bound [$lo, $hi] for $name")
  }

  /** Raised by [[observedRun]] when any check fails. */
  final class GuardViolation(val failed: Seq[(String, Long)], msg: String)
    extends RuntimeException(msg)

  /** The constraint report: one row per check —
   * (check, value, lo, hi, pass) — computed in one aggregation pass. */
  def audit(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "audit needs at least one check")
    val aggs = checks.map(c => c.metric.cast("long").as(c.name))
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = checks.map(c => s"'${c.name}', ${c.name}").mkString(", ")
    val bounds = df.sparkSession.createDataFrame(
      checks.map(c => (c.name, c.lo, c.hi))).toDF("check", "lo", "hi")
    one.select(expr(s"stack(${checks.size}, $stackArgs) AS (check, value)"))
      .join(broadcast(bounds), "check")
      .select(col("check"), col("value"), col("lo"), col("hi"),
        (col("value") >= col("lo") && col("value") <= col("hi")).as("pass"))
  }

  /** Runs `action` with the checks' metrics OBSERVED on `df` (the caller
   * must execute the returned frame inside `action` — typically its
   * write), then enforces the bounds: returns the action's result when
   * all pass, throws [[GuardViolation]] listing every failure otherwise.
   * No extra scan: the metrics ride the action's own job.
   *
   * Constraint inherited from `observe`: metrics must be deterministic
   * and must not contain DISTINCT aggregates — uniqueness checks
   * (`count - countDistinct`) belong in [[audit]], which runs a real
   * aggregation and has no such limit. */
  def observedRun[T](df: DataFrame, checks: Seq[Check])(
      action: DataFrame => T): T = {
    require(checks.nonEmpty, "observedRun needs at least one check")
    val obs = org.apache.spark.sql.Observation()
    val aggs = checks.map(c => c.metric.cast("long").as(c.name))
    val result = action(df.observe(obs, aggs.head, aggs.tail: _*))
    val row = obs.get
    val failed = checks.flatMap { c =>
      row(c.name) match {
        case null => Some(c.name -> Long.MinValue) // empty frame: no metric
        case v: java.lang.Long if v >= c.lo && v <= c.hi => None
        case v: java.lang.Long => Some(c.name -> v.longValue())
        case other => Some(c.name -> other.toString.toLong)
      }
    }
    if (failed.nonEmpty)
      throw new GuardViolation(failed,
        "data-quality gate failed: " + failed.map { case (n, v) =>
          val c = checks.find(_.name == n).get
          s"$n=$v not in [${c.lo}, ${c.hi}]"
        }.mkString("; "))
    result
  }
}
