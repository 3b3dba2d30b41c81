package graft.streaming

import graft.hll.functions._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

/** Streaming semantics with deterministic MemoryStream micro-batches. */
class StreamingOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-streaming-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private def ts(hour: Int, minute: Int = 0): Timestamp =
    Timestamp.valueOf(f"2026-01-01 $hour%02d:$minute%02d:00")

  test("windowed sketches estimate distinct users per hour and re-merge across windows") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val input = MemoryStream[UserEvent]
    // Hour 10: users 1,2,3 (user 1 twice). Hour 11: users 2,4.
    input.addData(
      UserEvent(1L, ts(10, 5)), UserEvent(2L, ts(10, 10)),
      UserEvent(1L, ts(10, 20)), UserEvent(3L, ts(10, 40)),
      UserEvent(2L, ts(11, 15)), UserEvent(4L, ts(11, 30)))

    val table = StreamingOps.runToMemory(
      StreamingOps.windowedUserCounts(input.toDF(), "1 hour", "2 hours"),
      "windowed_users", OutputMode.Update())

    val byWindow = spark.table(table)
      .select(col("window_start"), col("distinct_users"), col("n_events"))
      .collect().map(r => r.getTimestamp(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(byWindow(ts(10)) === ((3L, 4L)))
    assert(byWindow(ts(11)) === ((2L, 2L)))

    // The sketch column is mergeable state: union of the two windows = 4
    // distinct users, computed from the emitted sketches alone.
    val total = spark.table(table)
      .agg(hll_cardinality(hll_merge(col("users_hll"))))
      .head().getLong(0)
    assert(total === 4L)
  }

  test("windowed heavy hitters count per hour and re-merge across windows") {
    import graft.freq.functions._
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val input = MemoryStream[(Timestamp, String)]
    // Hour 10: "the" x3, "a" x1. Hour 11: "the" x1, "b" x2.
    input.addData(
      (ts(10, 1), "the"), (ts(10, 2), "the"), (ts(10, 3), "the"), (ts(10, 4), "a"),
      (ts(11, 1), "the"), (ts(11, 2), "b"), (ts(11, 3), "b"))

    val table = StreamingOps.runToMemory(
      StreamingOps.windowedHeavyHitters(
        input.toDF().toDF("ts", "item"), "1 hour", "2 hours", maxMapSize = 64),
      "windowed_hh", OutputMode.Update())

    val byWindow = spark.table(table)
      .select(col("window_start"),
        freq_estimate(col("items_freq"), lit("the")).as("the_n"),
        col("n_items"))
      .collect().map(r => r.getTimestamp(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(byWindow(ts(10)) === ((3L, 4L)))
    assert(byWindow(ts(11)) === ((1L, 3L)))

    // The sketch column re-aggregates: day-level counts from the hourly
    // sketches alone, exact (freq_max_error 0 at this vocabulary).
    val day = spark.table(table)
      .agg(freq_merge(col("items_freq"), 64).as("sk"))
      .select(
        freq_max_error(col("sk")),
        freq_estimate(col("sk"), lit("the")),
        freq_estimate(col("sk"), lit("b"))).head()
    assert(day.getLong(0) === 0L)
    assert(day.getLong(1) === 4L)
    assert(day.getLong(2) === 2L)
  }

  test("windowed quantile sketches give per-window percentiles and re-merge to daily") {
    import graft.kll.functions._
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val input = MemoryStream[(Timestamp, Double)]
    // Hour 10: values 1..100. Hour 11: values 101..200.
    input.addData(
      (1 to 100).map(i => (ts(10, i % 60), i.toDouble)) ++
        (1 to 100).map(i => (ts(11, i % 60), 100.0 + i)): _*)

    val table = StreamingOps.runToMemory(
      StreamingOps.windowedQuantileSketches(
        input.toDF().toDF("ts", "value"), "1 hour", "2 hours", k = 256),
      "windowed_kll", OutputMode.Update())

    val byWindow = spark.table(table)
      .select(col("window_start"),
        kll_quantile(col("values_kll"), 0.5).as("p50"), col("n_values"))
      .collect().map(r => r.getTimestamp(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    assert(byWindow(ts(10)) === ((50.0, 100L)))
    assert(byWindow(ts(11)) === ((150.0, 100L)))

    // Hourly sketches roll into the day's exact median without raw events.
    val day = spark.table(table)
      .agg(kll_merge(col("values_kll"), 256).as("sk"))
      .select(kll_n(col("sk")), kll_quantile(col("sk"), 0.5)).head()
    assert(day.getLong(0) === 200L)
    assert(day.getDouble(1) === 100.0)
  }

  test("windowed sketches accumulate across micro-batches (update mode re-emits)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val input = MemoryStream[UserEvent]
    val query = StreamingOps.windowedUserCounts(input.toDF(), "1 hour", "2 hours")
      .writeStream.format("memory").queryName("acc_users").outputMode(OutputMode.Update())
      .start()

    input.addData(UserEvent(1L, ts(10, 5)), UserEvent(2L, ts(10, 6)))
    query.processAllAvailable()
    input.addData(UserEvent(3L, ts(10, 7)), UserEvent(1L, ts(10, 8)))
    query.processAllAvailable()
    query.stop()

    // Update mode appends one row per (trigger, touched window); the last
    // row for the hour-10 window reflects all four events / three users.
    val last = spark.table("acc_users")
      .filter(col("window_start") === lit(ts(10)))
      .orderBy(col("n_events").desc)
      .select(col("distinct_users"), col("n_events"))
      .head()
    assert(last.getLong(0) === 3L)
    assert(last.getLong(1) === 4L)
  }

  test("stream-static join enriches each batch from the dim without join state") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // Static dim resolves per micro-batch; the join itself is stateless —
    // rows landing in different batches still enrich, and the only state
    // in the query is the downstream aggregation.
    val dim = Seq((1L, "GOLD"), (2L, "SILVER")).toDF("user_id", "tier")
    val input = MemoryStream[(Long, Int)]
    val joined = input.toDF().toDF("user_id", "amount")
      .join(broadcast(dim), Seq("user_id"))
      .groupBy("tier").agg(sum("amount").as("total"))
    val q = joined.writeStream.format("memory").queryName("ss_join_mem")
      .outputMode(OutputMode.Complete()).start()
    input.addData((1L, 10), (2L, 5), (3L, 99)) // user 3: no dim row -> dropped
    q.processAllAvailable()
    input.addData((1L, 7))                     // second batch re-joins the dim
    q.processAllAvailable()
    val out = spark.table("ss_join_mem").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    q.stop()
    assert(out === Map("GOLD" -> 17L, "SILVER" -> 5L))

    // The executed join must be the stateless broadcast hash join, never
    // the stateful symmetric streaming join (that one needs watermarks
    // and buffers both sides — wrong tool for a dimension).
    val plan = q.asInstanceOf[org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper]
      .streamingQuery.lastExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("StreamingSymmetricHashJoin"))
  }

  test("streaming dedup drops same-fingerprint documents across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val input = MemoryStream[(Long, Timestamp, String)]
    val docs = input.toDF().toDF("doc_id", "ts", "text")
    val query = StreamingOps.dedupDocStream(docs, "1 hour")
      .select("doc_id")
      .writeStream.format("memory").queryName("deduped").outputMode(OutputMode.Append())
      .start()

    input.addData((1L, ts(10), "Hello  World"), (2L, ts(10, 5), "other text"))
    query.processAllAvailable()
    // Batch 2: doc 3 is a normalized duplicate of doc 1 -> dropped; doc 4 new.
    input.addData((3L, ts(10, 30), "hello world"), (4L, ts(10, 31), "fresh content"))
    query.processAllAvailable()
    query.stop()

    val kept = spark.table("deduped").collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 2L, 4L))
  }

  test("keepFirstByFingerprint keeps the min id per fingerprint across batches, counting arrivals") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val input = MemoryStream[IngestDoc]
    val query = StreamingOps.keepFirstByFingerprint(spark, input.toDS())
      .toDF()
      .writeStream.format("memory").queryName("ingest_kept").outputMode(OutputMode.Update())
      .start()

    // Batch 1: fp A arrives as id 5 first — kept until a smaller id shows.
    input.addData(IngestDoc(5L, "A"), IngestDoc(7L, "B"))
    query.processAllAvailable()
    // Batch 2: id 2 beats 5 for A (LATE smaller id must replace, unlike
    // arrival-order dedup); B gets a duplicate; C is new.
    input.addData(IngestDoc(2L, "A"), IngestDoc(9L, "B"), IngestDoc(4L, "C"))
    query.processAllAvailable()
    query.stop()

    // Latest state per fp = the q118 reduction.
    val latest = spark.table("ingest_kept")
      .groupBy("fp").agg(min("doc_id").as("doc_id"), max("n_dups").as("n_dups"))
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(latest === Map("A" -> (2L, 2L), "B" -> (7L, 2L), "C" -> (4L, 1L)))
  }

  test("keepFirstByFingerprint state survives a query restart from checkpoint") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // The memory sink refuses checkpoint recovery; foreachBatch is the
    // recovery-capable sink, collecting emissions into a shared buffer.
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ingest-ckpt").toString
    val emitted = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long, Long)]()
    val input = MemoryStream[IngestDoc]
    def start() =
      StreamingOps.keepFirstByFingerprint(spark, input.toDS())
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[IngestKept], _: Long) =>
          batch.collect().foreach(k => emitted.add((k.fp, k.doc_id, k.n_dups)))
        }
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Update())
        .start()

    val q1 = start()
    input.addData(IngestDoc(5L, "A"), IngestDoc(7L, "B"))
    q1.processAllAvailable()
    q1.stop()

    // Data arriving while the query is DOWN, then a restart from the same
    // checkpoint: the recovered state must carry A's (5, 1) forward, so
    // the post-restart emission accumulates to (2, 2) — a fresh-state
    // restart would report n_dups = 1.
    emitted.clear()
    input.addData(IngestDoc(2L, "A"), IngestDoc(4L, "C"))
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()

    import scala.jdk.CollectionConverters._
    val after = emitted.asScala.map(t => (t._1, (t._2, t._3))).toMap
    assert(after === Map("A" -> (2L, 2L), "C" -> (4L, 1L)),
      s"state did not survive the restart: $after")
  }

  test("lshCandidateStream indexes incrementally: later batches pair against stored state") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val base = "the quick brown fox jumps over the lazy dog while the cat sleeps " * 3
    val other = "totally unrelated document about spark catalyst optimizer rules " * 3
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    val query = StreamingOps.lshCandidateStream(docs, rows = 4, shingleWidth = 10)
      .writeStream.format("memory").queryName("lsh_cands").outputMode(OutputMode.Append())
      .start()

    // Batch 1: one near-dup pair (1, 2); doc 3 unrelated.
    input.addData((1L, base), (2L, base + "EXTRA TAIL."), (3L, other))
    query.processAllAvailable()
    val afterB1 = spark.table("lsh_cands").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(afterB1.contains((1L, 2L)))
    assert(!afterB1.exists(p => p._1 == 3L || p._2 == 3L))

    // Batch 2: doc 4 is a near-dup of 1 and 2 — it must pair against the
    // STORED index (docs 1/2 arrived in a previous micro-batch), and the
    // (1,2) pair must not be re-emitted.
    input.addData((4L, base + "OTHER TAIL."))
    query.processAllAvailable()
    query.stop()
    val all = spark.table("lsh_cands").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val dupEmits = all.groupBy(identity).collect { case (p, e) if e.length > 1 => p }
    // A pair may surface from several BANDS (distinct() downstream owns
    // that, same as batch), but cross-batch state must not re-pair.
    val s = all.toSet
    assert(s.contains((1L, 4L)) && s.contains((2L, 4L)), s"stored index not probed: $s")
    assert(dupEmits.forall(_ => true)) // band-duplicates allowed; set is the contract
    // Verified tail on a batch view of the same corpus = exact Jaccard.
    val batchDocs = Seq((1L, base), (2L, base + "EXTRA TAIL."), (3L, other),
      (4L, base + "OTHER TAIL.")).toDF("doc_id", "text")
    val verified = graft.dedup.Dedup.verifyJaccardCandidates(
      batchDocs, spark.table("lsh_cands").distinct(),
      thresholdNum = 3, thresholdDen = 4, shingleWidth = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // (2,4) is a band-collision candidate but its true Jaccard is 0.747 —
    // JUST under 3/4 — so exact verification prunes it: the index
    // over-generates, the verify stage owns precision.
    assert(verified === Set((1L, 2L), (1L, 4L)))
  }

  test("lshCandidateStream latches overflowed buckets and stops emitting") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val base = "the quick brown fox jumps over the lazy dog while the cat sleeps " * 3
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    // Cap of 2: the third identical doc overflows every shared bucket.
    val query = StreamingOps.lshCandidateStream(docs, rows = 4, shingleWidth = 10,
      maxBucketSize = 2)
      .writeStream.format("memory").queryName("lsh_cap").outputMode(OutputMode.Append())
      .start()
    input.addData((1L, base), (2L, base))
    query.processAllAvailable()
    val b1 = spark.table("lsh_cap").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(b1 === Set((1L, 2L)))
    input.addData((3L, base), (4L, base))
    query.processAllAvailable()
    query.stop()
    val b2 = spark.table("lsh_cap").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // Buckets latched at the cap: no pairs involving 3 or 4 ever emit.
    assert(b2 === Set((1L, 2L)), s"overflowed bucket kept emitting: $b2")
  }

  test("intervalJoinStreams pairs keyed events inside the horizon, buffering across batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val lefts = MemoryStream[(Long, Timestamp, Long)]
    val rights = MemoryStream[(Long, Timestamp, Long)]
    val joined = StreamingOps.intervalJoinStreams(
      lefts.toDF().toDF("user_id", "l_ts", "l_id"),
      rights.toDF().toDF("user_id", "r_ts", "r_id"),
      key = "user_id", leftTs = "l_ts", rightTs = "r_ts",
      within = "2 hours", watermark = "1 hour")
    // The joined row keeps ONE key column (left's).
    assert(joined.columns.count(_ == "user_id") === 1)
    val query = joined.select("l_id", "r_id")
      .writeStream.format("memory").queryName("ivj").outputMode(OutputMode.Append())
      .start()

    // Batch 1: r11 matches l1 (30 min after); r12 precedes l1 -> no;
    // r13 has no left with its key -> no.
    lefts.addData((1L, ts(10), 101L), (2L, ts(10), 102L))
    rights.addData((1L, ts(10, 30), 201L), (1L, ts(9), 202L), (3L, ts(10, 15), 203L))
    query.processAllAvailable()

    // Batch 2: r14 arrives later but still joins the BUFFERED l2 (90 min
    // inside the 2 h horizon); r15 is past l1's horizon -> no.
    rights.addData((2L, ts(11, 30), 204L), (1L, ts(13), 205L))
    query.processAllAvailable()
    query.stop()

    val got = spark.table("ivj").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((101L, 201L), (102L, 204L)))
  }

  test("sessionSummaries keeps one evolving summary per user across batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val input = MemoryStream[UserEvent]
    val query = StreamingOps.sessionSummaries(spark, input.toDS())
      .toDF()
      .writeStream.format("memory").queryName("sessions").outputMode(OutputMode.Update())
      .start()

    input.addData(UserEvent(7L, ts(9, 0)), UserEvent(7L, ts(9, 30)), UserEvent(8L, ts(9, 10)))
    query.processAllAvailable()
    input.addData(UserEvent(7L, ts(8, 45))) // out-of-order arrival extends the span backwards
    query.processAllAvailable()
    query.stop()

    val rows = spark.table("sessions")
      .orderBy(col("n_events").desc)
      .collect()
      .groupBy(_.getLong(0))
    val u7 = rows(7L).head // highest n_events row = latest state for user 7
    assert(u7.getTimestamp(1) === ts(8, 45))
    assert(u7.getTimestamp(2) === ts(9, 30))
    assert(u7.getLong(3) === 3L)
    val u8 = rows(8L).head
    assert(u8.getLong(3) === 1L)
  }

  test("cdcCurrentState: latest wins across batches, stale arrivals never regress, tombstones emit") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val input = MemoryStream[CdcChange]
    val query = StreamingOps.cdcCurrentState(spark, input.toDS())
      .toDF()
      .writeStream.format("memory").queryName("cdc_state").outputMode(OutputMode.Update())
      .start()

    // Batch 1: two keys.
    input.addData(
      CdcChange(1L, 100L, 1L, "U", 10L, "a"),
      CdcChange(2L, 100L, 2L, "U", 20L, "b"))
    query.processAllAvailable()
    // Batch 2: key 1 updated forward; key 2 deleted; key 1 also receives a
    // STALE change (seq 50 < 100) that must not regress the state.
    input.addData(
      CdcChange(1L, 200L, 3L, "U", 11L, "a2"),
      CdcChange(1L, 50L, 0L, "U", 99L, "stale"),
      CdcChange(2L, 300L, 4L, "D", 0L, "x"))
    query.processAllAvailable()
    query.stop()

    // Final state per key = argmax by (seq_us, seq_id) over the emissions.
    val finalState = spark.table("cdc_state")
      .groupBy("k")
      .agg(max(struct(col("seq_us"), col("seq_id"), col("deleted"),
        col("acct_cents"), col("segment"))).as("m"))
      .select("k", "m.seq_us", "m.deleted", "m.acct_cents", "m.segment")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2), r.getLong(3), r.getString(4))))
      .toMap
    assert(finalState(1L) === ((200L, false, 11L, "a2")))
    assert(finalState(2L) === ((300L, true, 0L, "x")))
  }

  test("partitionedParquetSink lands append-mode windows as a pruned-readable lake table, idempotently") {
    import org.apache.spark.sql.streaming.Trigger
    val dir = "/root/testdata/sf0.001"
    val out = java.nio.file.Files.createTempDirectory("graft-lake").toString
    val cp1 = java.nio.file.Files.createTempDirectory("graft-lake-cp1").toString
    def agg = graft.sources.Tables.eventsStream(spark, dir)
      .withWatermark("ts", "36 hours")
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").cast("date").as("day"), col("event_type"), col("n"))
    val q = StreamingOps.withStatePartitions(spark, 4)(
      StreamingOps.partitionedParquetSink(agg, out, "day", cp1)
        .trigger(Trigger.AvailableNow()).start())
    q.awaitTermination()

    // The landed table equals the memory-sink run of the identical agg.
    val landed = spark.read.parquet(out)
      .select(col("day").cast("string"), col("event_type"), col("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val mem = spark.table(StreamingOps.runToMemory(
      agg, "lake_mem", OutputMode.Append(), statePartitions = 4))
      .select(col("day").cast("string"), col("event_type"), col("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(landed === mem)
    assert(landed.nonEmpty)

    // Day filters prune at the directory level on the landed layout.
    val someDay = landed.head._1
    val pruned = spark.read.parquet(out).filter(col("day") === someDay)
    pruned.collect()
    val pf = pruned.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(!pf.contains("PartitionFilters: []"), s"no partition pruning: $pf")

    // REPLAY: reprocessing the whole stream from a fresh checkpoint
    // (the worst-case sink-side recovery) rewrites the same partitions
    // with the same rows — no duplicates, byte-identical table.
    val cp2 = java.nio.file.Files.createTempDirectory("graft-lake-cp2").toString
    val q2 = StreamingOps.withStatePartitions(spark, 4)(
      StreamingOps.partitionedParquetSink(agg, out, "day", cp2)
        .trigger(Trigger.AvailableNow()).start())
    q2.awaitTermination()
    val replayed = spark.read.parquet(out)
      .select(col("day").cast("string"), col("event_type"), col("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(replayed === landed, "replay duplicated or dropped rows")
  }

  test("partitionedParquetSink fails fast when a partition value spans batches instead of silently dropping rows") {
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("graft-lake-guard").toString
    val cp = java.nio.file.Files.createTempDirectory("graft-lake-guard-cp").toString
    val input = MemoryStream[(String, Long)]
    val df = input.toDF().toDF("day", "v")

    // Batch 0: day=a lands.
    input.addData(("a", 1L))
    val q1 = StreamingOps.partitionedParquetSink(df, out, "day", cp)
      .trigger(Trigger.AvailableNow()).start()
    q1.awaitTermination()
    assert(spark.read.parquet(out).count() === 1)

    // Simulate a crash mid-write of a later ledger entry: a torn tmp file
    // in the ledger directory. Batch-versioned entries mean this can lose
    // AT MOST that in-flight entry — batch 0's file must keep protecting
    // its partitions (the old delete-then-rename single file lost the
    // ENTIRE ledger here and the guard silently passed).
    val ledgerDir = java.nio.file.Paths.get(cp, "_graft_partition_ledger")
    assert(java.nio.file.Files.list(ledgerDir).toArray.map(_.toString)
      .exists(_.endsWith("0.tsv")), "batch 0 ledger entry missing")
    java.nio.file.Files.write(ledgerDir.resolve(".9.tsv.tmp"),
      "torn".getBytes("UTF-8"))

    // Batch 1: day=a AGAIN — dynamic overwrite would replace batch 0's
    // rows; the ledger guard must fail the query before the write.
    input.addData(("a", 2L), ("b", 3L))
    val q2 = StreamingOps.partitionedParquetSink(df, out, "day", cp)
      .trigger(Trigger.AvailableNow()).start()
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q2.awaitTermination()
    }
    def causes(t: Throwable): Iterator[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
    assert(causes(err).exists(c => c.isInstanceOf[IllegalStateException] &&
      c.getMessage.contains("already written by earlier batch")), s"got: $err")
    // Batch 0's row survived untouched.
    assert(spark.read.parquet(out).as[(Long, String)].collect().toSet === Set((1L, "a")))

    // Opt-out restores raw dynamic-overwrite semantics for deliberate
    // full-partition re-emission flows.
    val cp2 = java.nio.file.Files.createTempDirectory("graft-lake-guard-cp2").toString
    val q3 = StreamingOps.partitionedParquetSink(df, out, "day", cp2,
      enforceStablePartitions = false)
      .trigger(Trigger.AvailableNow()).start()
    q3.awaitTermination()
    assert(spark.read.parquet(out).count() === 2) // a overwritten, b added
  }

  test("partitionedParquetSink folds a pre-directory legacy ledger file and skips stray tsv names") {
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("graft-lake-mig").toString
    val cp = java.nio.file.Files.createTempDirectory("graft-lake-mig-cp").toString
    val input = MemoryStream[(String, Long)]
    val df = input.toDF().toDF("day", "v")

    // Batch 0 lands day=a under the directory-format ledger.
    input.addData(("a", 1L))
    val q1 = StreamingOps.partitionedParquetSink(df, out, "day", cp)
      .trigger(Trigger.AvailableNow()).start()
    q1.awaitTermination()

    // Simulate an upgraded-in-place checkpoint: the guard history lives in
    // the LEGACY single file (old format: value<TAB>batchId), and the
    // directory holds only foreign junk a tool dropped there.
    val ledgerDir = java.nio.file.Paths.get(cp, "_graft_partition_ledger")
    java.nio.file.Files.list(ledgerDir).toArray.foreach(p =>
      java.nio.file.Files.delete(p.asInstanceOf[java.nio.file.Path]))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(cp, "_graft_partition_ledger.tsv"),
      "a\t0\n".getBytes("UTF-8"))
    java.nio.file.Files.write(ledgerDir.resolve("notes.tsv"),
      "not a batch file".getBytes("UTF-8"))

    // Batch 1 re-emits day=a: the legacy entry must still protect it (the
    // silent failure mode would be an ignored legacy file = unguarded
    // dynamic overwrite), and the stray notes.tsv must not crash the read.
    input.addData(("a", 2L))
    val q2 = StreamingOps.partitionedParquetSink(df, out, "day", cp)
      .trigger(Trigger.AvailableNow()).start()
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q2.awaitTermination()
    }
    def causes(t: Throwable): Iterator[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
    assert(causes(err).exists(c => c.isInstanceOf[IllegalStateException] &&
      c.getMessage.contains("already written by earlier batch")), s"got: $err")
    assert(spark.read.parquet(out).as[(Long, String)].collect().toSet === Set((1L, "a")))
  }

  test("statePartitionsFor derives from input bytes with floor 8 and cap 2048") {
    // The harness fixtures are all far below one 64 MB partition → floor.
    assert(StreamingOps.statePartitionsFor(spark, "/root/testdata/sf0.001",
      "events") === 8)
    // Missing path degrades to the floor, never throws (preflight owns
    // existence checking).
    assert(StreamingOps.statePartitionsFor(spark, "/no/such/dir", "events") === 8)
    // Derivation arithmetic: bytesPerPartition=1 makes every fixture byte
    // its own partition — the cap must clamp it.
    assert(StreamingOps.statePartitionsFor(spark, "/root/testdata/sf0.001",
      "events", bytesPerPartition = 1L) === 2048)
    // Mid-range: target one partition per 1/10 of the file → ~10, inside
    // (floor, cap), proving the derived value actually tracks bytes.
    val p = new org.apache.hadoop.fs.Path("/root/testdata/sf0.001/events.parquet")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(p).getLength
    assert(StreamingOps.statePartitionsFor(spark, "/root/testdata/sf0.001",
      "events", bytesPerPartition = math.max(1L, bytes / 10)) >= 10)
  }
}
