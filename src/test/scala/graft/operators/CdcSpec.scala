package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CdcSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-cdc-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import scala.jdk.CollectionConverters._

  private def snap() = {
    import spark.implicits._
    Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
      .toDF("k", "name", "bal").repartition(4)
  }

  // (k, seq, op, name, bal)
  private def changes(rows: Seq[(Long, Long, String, String, java.lang.Long)]) = {
    import spark.implicits._
    rows.toDF("k", "seq", "op", "name", "bal").repartition(4)
  }

  private def collectState(rows: Seq[(Long, Long, String, String, java.lang.Long)]) =
    Cdc.applyChangeset(snap(), changes(rows), Seq("k"), Seq("seq"))
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1), if (r.isNullAt(2)) null else r.getLong(2)))
      .toSeq

  test("upsert replaces, delete removes, insert adds, untouched passes through") {
    val out = collectState(Seq(
      (1L, 1L, "U", "a2", 11L),        // update existing
      (2L, 1L, "D", "x", 0L),          // delete existing
      (9L, 1L, "U", "new", 99L)))      // insert new key
    assert(out === Seq((1L, "a2", 11L), (3L, "c", 30L), (9L, "new", 99L)))
  }

  test("latest change per key wins, ordered by all seq columns") {
    // Same key changed three times; the seq=3 row must win — including a
    // delete that resurrects via a later upsert and vice versa.
    val out = collectState(Seq(
      (1L, 1L, "U", "v1", 1L),
      (1L, 3L, "U", "v3", 3L),
      (1L, 2L, "D", "x", 0L)))
    assert(out.filter(_._1 == 1L) === Seq((1L, "v3", 3L)))

    val deleted = collectState(Seq(
      (1L, 1L, "U", "v1", 1L),
      (1L, 2L, "D", "x", 0L)))
    assert(!deleted.exists(_._1 == 1L))
  }

  test("a NULL in an upsert column is applied, never backfilled from the old row") {
    val out = collectState(Seq((1L, 1L, "U", "a2", null)))
    assert(out.head === ((1L, "a2", null)))
  }

  test("multi-column seq ordering uses descending-major order") {
    import spark.implicits._
    val ch = Seq(
      (1L, 1L, 9L, "U", "early", 1L),
      (1L, 2L, 1L, "U", "late", 2L))
      .toDF("k", "ts", "id", "op", "name", "bal")
    val out = Cdc.applyChangeset(snap(), ch, Seq("k"), Seq("ts", "id"))
      .filter(col("k") === 1L).collect()
    assert(out.head.getString(1) === "late") // ts=2 beats ts=1 despite lower id
  }

  test("changed keys probe the snapshot via a broadcast anti-join by default") {
    val plan = Cdc.applyChangeset(snap(), changes(Seq((1L, 1L, "U", "a2", 11L))),
      Seq("k"), Seq("seq")).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"), plan)
  }

  test("scd2Intervals chains validity and flags the current version") {
    import spark.implicits._
    val hist = Seq(
      (1L, 10L, "v1"), (1L, 20L, "v2"), (1L, 30L, "v3"),
      (2L, 5L, "only"))
      .toDF("k", "seq", "v").repartition(4)
    val out = Cdc.scd2Intervals(hist, Seq("k"), "seq")
      .orderBy("k", "valid_from")
      .select("k", "valid_from", "valid_to", "is_current", "v")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2), r.getBoolean(3), r.getString(4)))
      .toSeq
    assert(out === Seq(
      (1L, 10L, 20L, false, "v1"),
      (1L, 20L, 30L, false, "v2"),
      (1L, 30L, -1L, true, "v3"),
      (2L, 5L, -1L, true, "only")))
  }

  test("requires the changes frame to carry the snapshot's value columns") {
    import spark.implicits._
    val bad = Seq((1L, 1L, "U")).toDF("k", "seq", "op")
    val e = intercept[IllegalArgumentException] {
      Cdc.applyChangeset(snap(), bad, Seq("k"), Seq("seq"))
    }
    assert(e.getMessage.contains("missing columns"))
  }

  test("snapshotDiff classifies added/removed/changed/unchanged, null-fp-safe") {
    import spark.implicits._
    val prev = Seq(
      (1L, Some("a")),  // unchanged
      (2L, Some("b")),  // changed
      (3L, Some("c")),  // removed
      (5L, None: Option[String]),  // null fp both sides -> unchanged
      (6L, None: Option[String]))  // null fp prev, real fp cur -> changed
      .toDF("doc_id", "fp")
    val cur = Seq(
      (1L, Some("a")),
      (2L, Some("B")),
      (4L, Some("d")),  // added
      (5L, None: Option[String]),
      (6L, Some("f")))
      .toDF("doc_id", "fp")
    val got = Cdc.snapshotDiff(prev, cur)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got === Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed",
      4L -> "added", 5L -> "unchanged", 6L -> "changed"))
  }
}
