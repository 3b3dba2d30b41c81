package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

/** `transformWithState` semantics: same session-summary contract as the
 * `mapGroupsWithState` path, proven across micro-batches and through
 * event-time timer retirement on the RocksDB state store. */
class TransformWithStateSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-tws-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private def ts(hour: Int, minute: Int = 0): Timestamp =
    Timestamp.valueOf(f"2026-01-01 $hour%02d:$minute%02d:00")

  test("session summaries accumulate across micro-batches and agree with the MGWS path") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val input = MemoryStream[UserEvent]
    val query = TransformWithStateOps.withRocksDbStateStore(spark)(
      TransformWithStateOps.sessionSummariesTws(spark, input.toDS())
        .toDF().writeStream.format("memory").queryName("tws_sessions")
        .outputMode("update").start())

    input.addData(UserEvent(1L, ts(10, 0)), UserEvent(1L, ts(10, 10)),
      UserEvent(2L, ts(10, 5)))
    query.processAllAvailable()
    // Batch 2: user 1 extends; user 3 appears out of order BEFORE user 1's
    // existing events — first_ts must move backwards correctly.
    input.addData(UserEvent(1L, ts(10, 20)), UserEvent(3L, ts(9, 50)))
    query.processAllAvailable()
    query.stop()

    val finals = spark.table("tws_sessions")
      .groupBy("user_id")
      .agg(max(struct(col("n_events"), col("first_ts"), col("last_ts"))).as("m"))
      .select(col("user_id"), col("m.first_ts"), col("m.last_ts"), col("m.n_events"))
      .collect().map(r => r.getLong(0) ->
        ((r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))).toMap

    assert(finals(1L) === ((ts(10, 0), ts(10, 20), 3L)))
    assert(finals(2L) === ((ts(10, 5), ts(10, 5), 1L)))
    assert(finals(3L) === ((ts(9, 50), ts(9, 50), 1L)))
  }

  test("MapState distinct-type counts accumulate per entry across batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import TransformWithStateOps.{TypedEvent, TypeCount}

    val input = MemoryStream[TypedEvent]
    val query = TransformWithStateOps.withRocksDbStateStore(spark)(
      TransformWithStateOps.distinctTypesTws(spark, input.toDS())
        .toDF().writeStream.format("memory").queryName("tws_types")
        .outputMode("update").start())

    input.addData(TypedEvent(1L, "click"), TypedEvent(1L, "click"),
      TypedEvent(2L, "view"))
    query.processAllAvailable()
    // Batch 2: user 1 repeats a known type (n_types stays 2 after "view")
    // and adds a new one — per-entry map updates, not collection rewrite.
    input.addData(TypedEvent(1L, "view"), TypedEvent(1L, "click"),
      TypedEvent(1L, "buy"))
    query.processAllAvailable()
    query.stop()

    val finals = spark.table("tws_types")
      .groupBy("user_id")
      .agg(max(struct(col("n_events"), col("n_types"))).as("m"))
      .select(col("user_id"), col("m.n_types"), col("m.n_events"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(finals(1L) === ((3L, 5L))) // click/view/buy over 5 events
    assert(finals(2L) === ((1L, 1L)))
  }

  test("ListState recent-k keeps the latest k by (ts, id) across batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import TransformWithStateOps.RecentEvent

    val input = MemoryStream[RecentEvent]
    val query = TransformWithStateOps.withRocksDbStateStore(spark)(
      TransformWithStateOps.recentKTws(spark, input.toDS(), k = 2)
        .toDF().writeStream.format("memory").queryName("tws_recent")
        .outputMode("update").start())

    input.addData(RecentEvent(1L, 100L, 10L), RecentEvent(1L, 300L, 30L))
    query.processAllAvailable()
    // Batch 2: one NEWER and one OLDER event — the older one must not
    // enter the top-2; a same-ts tie resolves by larger event_id.
    input.addData(RecentEvent(1L, 400L, 40L), RecentEvent(1L, 50L, 5L),
      RecentEvent(1L, 400L, 41L))
    query.processAllAvailable()
    query.stop()

    val last = spark.table("tws_recent")
      .groupBy("user_id")
      .agg(max(struct(col("n_seen"), col("recent"))).as("m"))
      .select(col("user_id"), col("m.n_seen"), col("m.recent"))
      .head()
    assert(last.getLong(1) === 5L)
    val ids = last.getSeq[org.apache.spark.sql.Row](2).map(_.getLong(2))
    assert(ids === Seq(41L, 40L))
  }

  test("deterministic reservoir keeps the min-k tickets and is batching-independent") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import TransformWithStateOps.RsvDoc

    // Tickets exercise the signed order (negative < positive) and a tie
    // (docs 6 and 7 share a ticket — doc_id breaks it).
    val docs = Seq(
      RsvDoc("a", 1L, 500L), RsvDoc("a", 2L, -100L), RsvDoc("a", 3L, 700L),
      RsvDoc("a", 4L, 0L), RsvDoc("a", 5L, -900L),
      RsvDoc("a", 6L, 42L), RsvDoc("a", 7L, 42L),
      RsvDoc("b", 8L, 9L))
    // min-3 for key a by (ticket, doc_id): 5 (-900), 2 (-100), 4 (0).
    val expectA = Seq(5L, 2L, 4L)

    def runWith(batches: Seq[Seq[RsvDoc]], name: String): Map[String, (Long, Seq[Long])] = {
      val input = MemoryStream[RsvDoc]
      val query = TransformWithStateOps.withRocksDbStateStore(spark)(
        TransformWithStateOps.reservoirSampleTws(spark, input.toDS(), k = 3)
          .toDF().writeStream.format("memory").queryName(name)
          .outputMode("update").start())
      batches.foreach { b => input.addData(b: _*); query.processAllAvailable() }
      query.stop()
      spark.table(name)
        .groupBy("source")
        .agg(max(struct(col("n_seen"), col("sample"))).as("m"))
        .select(col("source"), col("m.n_seen"), col("m.sample"))
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getSeq[org.apache.spark.sql.Row](2).map(_.getLong(1)))))
        .toMap
    }

    // Two hostile batchings: all-at-once vs the winners arriving LAST
    // (the early reservoir fills with losers that must all be evicted).
    val oneShot = runWith(Seq(docs), "tws_rsv1")
    val adversarial = runWith(
      Seq(Seq(docs(0), docs(2), docs(5), docs(6)), // 500, 700, 42, 42 fill k=3
        Seq(docs(7)), Seq(docs(1), docs(3), docs(4))), // then -100, 0, -900
      "tws_rsv2")
    for (finals <- Seq(oneShot, adversarial)) {
      assert(finals("a")._1 === 7L)
      assert(finals("a")._2 === expectA)
      assert(finals("b") === ((1L, Seq(8L))))
    }
  }

  test("warm-started CDC state: stale stream changes never regress the snapshot") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val snapshot = Seq(
      CdcState(1L, 1000L, 5L, false, 100L, "A"), // will be updated by a newer change
      CdcState(2L, 2000L, 9L, false, 200L, "B")  // untouched by the stream
    ).toDS()
    val input = MemoryStream[CdcChange]
    val query = TransformWithStateOps.withRocksDbStateStore(spark)(
      TransformWithStateOps.cdcCurrentStateTws(spark, input.toDS(), snapshot)
        .toDF().writeStream.format("memory").queryName("tws_warm")
        .outputMode("update").start())

    // A STALE change for key 1 (older than the snapshot) then a newer one;
    // key 3 is brand new (no snapshot row).
    input.addData(CdcChange(1L, 900L, 4L, "U", 111L, "X"))
    query.processAllAvailable()
    input.addData(CdcChange(1L, 1500L, 6L, "U", 150L, "C"),
      CdcChange(3L, 100L, 1L, "U", 300L, "N"))
    query.processAllAvailable()
    query.stop()

    val byKey = spark.table("tws_warm")
      .groupBy("k")
      .agg(max(struct(col("seq_us"), col("seq_id"), col("deleted"),
        col("acct_cents"), col("segment"))).as("m"))
      .select(col("k"), col("m.seq_us"), col("m.acct_cents"), col("m.segment"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // Key 1: the stale 900-change lost to the 1000-snapshot, then 1500 won.
    assert(byKey(1L) === ((1500L, 150L, "C")))
    // Key 3: fresh key starts from the stream alone.
    assert(byKey(3L) === ((100L, 300L, "N")))
    // Key 2 was never touched by the stream → never emitted (the snapshot
    // row itself remains the current view).
    assert(!byKey.contains(2L))
    // And the stale batch-1 emission for key 1 carried the SNAPSHOT values
    // (proof the initial state was loaded before the first input row).
    val firstEmit = spark.table("tws_warm").filter(col("k") === 1L)
      .orderBy("seq_us").head()
    assert(firstEmit.getLong(1) === 1000L && firstEmit.getLong(4) === 100L)
  }

  test("silence alerts fire for quiet users only, once, and re-arm on return") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val input = MemoryStream[UserEvent]
    val query = TransformWithStateOps.withRocksDbStateStore(spark)(
      TransformWithStateOps.silenceAlertsTws(spark, input.toDS(),
        silence = "1 hour", watermark = "0 seconds")
        .toDF().writeStream.format("memory").queryName("tws_silence")
        .outputMode("update").start())

    input.addData(UserEvent(1L, ts(10, 0)), UserEvent(2L, ts(10, 0)))
    query.processAllAvailable()
    // User 2 stays active; watermark moves to 12:00 — user 1 crossed the
    // 1-hour horizon (11:00) and must alert; user 2 (timer 13:00) must not.
    input.addData(UserEvent(2L, ts(12, 0)))
    query.processAllAvailable()
    val afterFirst = spark.table("tws_silence")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1))).toSeq
    assert(afterFirst === Seq((1L, ts(10, 0))))

    // User 1 returns, then goes quiet again past the horizon: a SECOND
    // alert with the new last_ts — the state cleared and re-armed.
    input.addData(UserEvent(1L, ts(12, 30)))
    query.processAllAvailable()
    input.addData(UserEvent(2L, ts(15, 0)))
    query.processAllAvailable()
    query.stop()

    val all = spark.table("tws_silence")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1))).sortBy(_._2.getTime)
    assert(all === Seq((1L, ts(10, 0)), (1L, ts(12, 30))))
  }

  test("progressReport surfaces per-batch input volume, state size, and watermark") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val input = MemoryStream[UserEvent]
    val agg = StreamingOps.windowedUserCounts(input.toDF(), "1 hour", "2 hours")
    val query = agg.writeStream.format("memory").queryName("prog_mem")
      .outputMode("update").start()
    input.addData(UserEvent(1L, ts(10, 0)), UserEvent(2L, ts(10, 30)))
    query.processAllAvailable()
    input.addData(UserEvent(3L, ts(11, 0)))
    query.processAllAvailable()
    val report = TransformWithStateOps.progressReport(spark, query)
      .collect().sortBy(_.batch_id)
    query.stop()

    val withData = report.filter(_.num_input_rows > 0)
    assert(withData.map(_.num_input_rows).sum === 3L)
    // The windowed aggregation holds state: visible rows and bytes.
    assert(withData.last.state_rows > 0L)
    assert(withData.last.state_memory_bytes > 0L)
    // The watermark advanced off the epoch once batch 1's max ts was seen.
    assert(report.exists(p => p.watermark != null && p.watermark.startsWith("2026-")))
  }

  test("event-time timer retires idle sessions (final re-emission, state cleared)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val input = MemoryStream[UserEvent]
    val query = TransformWithStateOps.withRocksDbStateStore(spark)(
      TransformWithStateOps.sessionSummariesTws(spark, input.toDS(),
        idleTimeout = "30 minutes", watermark = "0 seconds")
        .toDF().writeStream.format("memory").queryName("tws_retire")
        .outputMode("update").start())

    input.addData(UserEvent(1L, ts(10, 0)))
    query.processAllAvailable()
    // Advance the watermark past 10:30 (= last_ts + idle): the timer fires
    // and user 1's final summary is re-emitted as its state retires.
    input.addData(UserEvent(2L, ts(12, 0)))
    query.processAllAvailable()
    // User 1 returns AFTER retirement: a fresh session starts at n=1,
    // proving the state row was actually cleared (not resumed).
    input.addData(UserEvent(1L, ts(12, 30)))
    query.processAllAvailable()
    query.stop()

    val u1 = spark.table("tws_retire").filter(col("user_id") === 1L)
      .select(col("first_ts"), col("n_events"))
      .collect().map(r => (r.getTimestamp(0), r.getLong(1))).toSeq
    // Emissions for user 1: batch-1 update (10:00, 1), timer re-emission
    // (10:00, 1), fresh-session update (12:30, 1).
    assert(u1.count(_ == ((ts(10, 0), 1L))) === 2)
    assert(u1.contains((ts(12, 30), 1L)))
  }

  test("k-anonymity gate: batching-independent release, suppressed cohorts never leak") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import TransformWithStateOps.KaRow

    // cohort ("a", 0): 4 rows >= k=3 -> all release; ("b", 0): 2 rows -> suppressed.
    val rows = Seq(KaRow("a", 0, 1L), KaRow("a", 0, 2L), KaRow("a", 0, 3L),
      KaRow("a", 0, 4L), KaRow("b", 0, 5L), KaRow("b", 0, 6L))

    def runWith(batches: Seq[Seq[KaRow]], name: String): Seq[Long] = {
      val input = MemoryStream[KaRow]
      val query = TransformWithStateOps.withRocksDbStateStore(spark)(
        TransformWithStateOps.kAnonymityGateTws(spark, input.toDS(), k = 3)
          .toDF().writeStream.format("memory").queryName(name)
          .outputMode("update").start())
      batches.foreach { b => input.addData(b: _*); query.processAllAvailable() }
      query.stop()
      spark.table(name).collect().map(_.getLong(2)).toSeq.sorted
    }

    val oneShot = runWith(Seq(rows), "tws_ka1")
    // Hostile slicing: the crossing arrival lands alone, then a post-release row.
    val sliced = runWith(Seq(
      Seq(rows(0), rows(4)), Seq(rows(1), rows(5)), Seq(rows(2)), Seq(rows(3))),
      "tws_ka2")
    assert(oneShot === Seq(1L, 2L, 3L, 4L))
    assert(sliced === Seq(1L, 2L, 3L, 4L)) // same released set, each row once
  }
}
