package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PackingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-packing-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def docsDf(rows: Seq[(String, Long, Long)]) = {
    import spark.implicits._
    rows.toDF("src", "id", "toks").repartition(4)
  }

  private def pack(rows: Seq[(String, Long, Long)], budget: Long) =
    Packing.packByBudget(docsDf(rows), col("src"), col("id"), col("toks"), budget)

  test("pack assignment is the integer prefix-sum chunking, per stream") {
    val rows = (0L until 100L).map(i => (s"s${i % 3}", i, (i % 7) + 20L))
    val out = pack(rows, budget = 64L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // Re-derive per stream on the driver with the same (md5, id) order.
    val md5s = spark.createDataFrame(rows.map(r => Tuple1(r._2))).toDF("id")
      .select(col("id"), md5(col("id").cast("string")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.groupBy(_._1).foreach { case (_, group) =>
      var running = 0L
      group.sortBy(g => (md5s(g._2), g._2)).foreach { case (s, id, toks) =>
        val got = out.find(o => o._1 == s && o._2 == id).get
        assert(got._4 === running / 64L, s"pack_id for $id")
        assert(got._5 === running % 64L, s"pack_offset for $id")
        running += toks
      }
    }
  }

  test("offsets stay under the budget and packs are dense per stream") {
    val rows = (0L until 60L).map(i => ("one", i, 30L))
    val out = pack(rows, budget = 100L)
      .select("pack_id", "pack_offset").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.forall(_._2 < 100L))
    // 60 docs x 30 tokens = 1800 tokens → first tokens span bins 0..17.
    assert(out.map(_._1).toSet === (0L until 18L).toSet)
  }

  test("zero-token and oversized documents pack without gaps or doubles") {
    val rows = Seq(("s", 1L, 0L), ("s", 2L, 500L), ("s", 3L, 10L), ("s", 4L, 0L))
    val out = pack(rows, budget = 128L).collect()
    // Total stream = 510 tokens; every start offset is < total, every
    // pack_id is start div 128 regardless of a doc spanning several bins.
    out.foreach { r =>
      val (pid, off) = (r.getLong(3), r.getLong(4))
      assert(off < 128L && pid >= 0L && pid * 128L + off < 512L)
    }
    assert(out.length === 4)
  }

  test("determinism: same input, same packing, run to run") {
    val rows = (0L until 40L).map(i => (s"s${i % 2}", i, i + 1L))
    val a = pack(rows, 97L).orderBy("id").collect().toSeq
    val b = pack(rows, 97L).orderBy("id").collect().toSeq
    assert(a === b)
  }

  test("packNoSplit == plain-Scala greedy reference; oversize docs get singleton bins (property)") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    for (trial <- 1 to 8) {
      val budget = 50L + rnd.nextInt(100)
      val docs = (1 to 80).map { i =>
        (s"s${i % 3}", i.toLong,
          // mix of tiny, medium, and occasionally oversized documents
          (if (rnd.nextInt(10) == 0) budget + 1 + rnd.nextInt(40)
           else rnd.nextInt(60)).toLong)
      }
      val got = Packing.packNoSplit(docs.toDF("part", "id", "w"),
          org.apache.spark.sql.functions.col("part"),
          org.apache.spark.sql.functions.col("id"),
          org.apache.spark.sql.functions.col("w"), budget)
        .collect()
        .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(3), r.getLong(4)))).toMap
      // Reference: same (md5 hex, id) order, same greedy rule.
      def md5hex(x: Long): String = {
        val d = java.security.MessageDigest.getInstance("MD5")
          .digest(x.toString.getBytes("UTF-8"))
        d.map(b => f"$b%02x").mkString
      }
      for ((part, rows) <- docs.groupBy(_._1)) {
        var bin = 0L; var fill = 0L
        for ((_, id, w) <- rows.sortBy { case (_, id, _) => (md5hex(id), id) }) {
          if (fill > 0 && fill + w > budget) { bin += 1; fill = 0 }
          assert(got((part, id)) === ((bin, fill)),
            s"trial=$trial part=$part id=$id budget=$budget")
          fill += w
        }
      }
      // No-split invariant: a doc never crosses the boundary unless alone.
      got.foreach { case ((_, _), (_, off)) => () }
      docs.foreach { case (part, id, w) =>
        val (_, off) = got((part, id))
        assert(off + w <= budget || off == 0L, s"doc $id split across bins")
      }
    }
  }

  test("packAudit: bins, totals, padding, and utilization reconcile") {
    import spark.implicits._
    val budget = 100L
    // s0: docs 60+30 (bin0 fill 90), 50 (bin1) -> padded 10 + 50 = 60
    // s1: 150 oversize singleton (padded 0), then 100 exact (padded 0)
    val docs = Seq(("s0", 1L, 60L), ("s0", 2L, 30L), ("s0", 3L, 50L),
      ("s1", 4L, 150L), ("s1", 5L, 100L)).toDF("part", "id", "w")
    val packed = Packing.packNoSplit(docs,
      org.apache.spark.sql.functions.col("part"),
      org.apache.spark.sql.functions.col("id"),
      org.apache.spark.sql.functions.col("w"), budget)
    val audit = Packing.packAudit(packed, budget)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // order within s0 is md5-based; fills are {90, 50} regardless of which
    // two docs share a bin only if 60+30 sort adjacent — assert on totals
    // that hold for every order: 3 docs, 140 tokens, 2 bins minimum.
    val (b0, d0, t0, p0, u0) = audit("s0")
    assert(d0 === 3L && t0 === 140L)
    assert(t0 + p0 === b0 * budget)
    assert(u0 === t0 * 1000000L / (b0 * budget))
    val (b1, d1, t1, p1, u1) = audit("s1")
    assert(b1 === 2L && d1 === 2L && t1 === 250L && p1 === 0L)
    assert(u1 === 250L * 1000000L / (2L * 100L)) // oversize pushes past 1e6
  }

  test("paddingAudit histogram-window guard: raises past the bucket bound, identical below it") {
    import spark.implicits._
    val lens = Seq(3L, 7L, 7L, 2L, 9L, 1L, 5L) // 6 distinct lengths
    val df = lens.zipWithIndex.map { case (l, i) => (i.toLong, l) }.toDF("id", "len")
    val e = intercept[Exception] {
      Packing.paddingAuditBounded(df,
        org.apache.spark.sql.functions.col("len"), batchSize = 4,
        maxBuckets = 5L).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(m => m.contains("paddingAudit") &&
      m.contains("more than 5 distinct sequence lengths")),
      s"expected the histogram guard, got: ${messages(e).mkString(" | ")}")
    val c = org.apache.spark.sql.functions.col("len")
    val bounded = Packing.paddingAuditBounded(df, c, 4, maxBuckets = 6L)
      .collect().map(_.toSeq).toSet
    val default = Packing.paddingAudit(df, c, 4).collect().map(_.toSeq).toSet
    assert(bounded === default)
  }

  test("paddingAudit matches a brute-force sorted batching, partial batch included") {
    import spark.implicits._
    // 11 lengths with duplicates -> one partial final batch at B = 4.
    val lens = Seq(3L, 7L, 7L, 2L, 9L, 1L, 7L, 4L, 9L, 2L, 5L)
    val df = lens.zipWithIndex.map { case (l, i) => (i.toLong, l) }.toDF("id", "len")
      .repartition(4)
    val out = Packing.paddingAudit(df,
      org.apache.spark.sql.functions.col("len"), batchSize = 4)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap

    // Brute force: sort ascending, group in 4s, pad each batch to its max.
    val sorted = lens.sorted
    val batches = sorted.grouped(4).toSeq
    val bruteSortedPad = batches.map(b => b.max * b.size - b.sum).sum
    val brutePadded = batches.map(b => b.max * b.size).sum
    val total = lens.sum
    assert(out("sorted_batches") ===
      ((3L, total, bruteSortedPad, total * 1000000L / brutePadded)))
    assert(out("global_pad") ===
      ((3L, total, lens.max * lens.size - total,
        total * 1000000L / (lens.max * lens.size))))
  }

  test("paddingAudit with batch size 1 pads nothing under sorted batching") {
    import spark.implicits._
    val df = Seq(5L, 9L, 2L).zipWithIndex.map { case (l, i) => (i.toLong, l) }
      .toDF("id", "len")
    val out = Packing.paddingAudit(df,
      org.apache.spark.sql.functions.col("len"), batchSize = 1)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(out("sorted_batches") === 0L)
    assert(out("global_pad") === 9L * 3 - 16L)
  }

  test("paddingAudit equals brute force on 30 random length multisets (any B)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    (1 to 30).foreach { trial =>
      val n = 1 + rnd.nextInt(40)
      val b = 1 + rnd.nextInt(7)
      val lens = Seq.fill(n)(rnd.nextInt(12).toLong)
      val df = lens.zipWithIndex.map { case (l, i) => (i.toLong, l) }.toDF("id", "len")
      val got = Packing.paddingAudit(df,
        org.apache.spark.sql.functions.col("len"), batchSize = b)
        .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
      val batches = lens.sorted.grouped(b).toSeq
      val brute = batches.map(x => x.max * x.size - x.sum).sum
      assert(got("sorted_batches") === brute, s"trial=$trial n=$n b=$b lens=$lens")
      assert(got("global_pad") === lens.max * n - lens.sum)
    }
  }

  test("lptShards == plain-Scala LPT reference across random weight mixes") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    for (trial <- 1 to 6) {
      val nShards = 1 + rnd.nextInt(5)
      val docs = (1 to 60).map(i =>
        (s"s${i % 2}", i.toLong, rnd.nextInt(500).toLong))
      val got = Packing.lptShards(docs.toDF("part", "id", "w"),
          org.apache.spark.sql.functions.col("part"),
          org.apache.spark.sql.functions.col("id"),
          org.apache.spark.sql.functions.col("w"), nShards)
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getInt(3)).toMap
      for ((part, rows) <- docs.groupBy(_._1)) {
        val loads = new Array[Long](nShards)
        for ((_, id, w) <- rows.sortBy { case (_, id, w) => (-w, id) }) {
          val best = loads.indices.minBy(i => (loads(i), i))
          assert(got((part, id)) === best, s"trial=$trial part=$part id=$id")
          loads(best) += w
        }
      }
    }
  }

  test("lptShards balances token load where hash sharding cannot: one giant + many small") {
    import spark.implicits._
    // One 1000-token doc + thirty 10-token docs over 4 shards: LPT puts
    // the giant alone; the other three shards split the small mass evenly.
    val docs = Seq(("p", 0L, 1000L)) ++ (1 to 30).map(i => ("p", i.toLong, 10L))
    val loads = Packing.lptShards(docs.toDF("part", "id", "w"),
        org.apache.spark.sql.functions.col("part"),
        org.apache.spark.sql.functions.col("id"),
        org.apache.spark.sql.functions.col("w"), nShards = 4)
      .groupBy("shard").agg(org.apache.spark.sql.functions.sum("w").as("l"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(loads(0) === 1000L)            // the giant, alone
    assert((1 to 3).map(loads(_)).toSet === Set(100L)) // 300 small tokens split 100/100/100
  }

  test("truncationFrontier: hand case across the candidate grid") {
    import spark.implicits._
    // Lengths 5, 10, 10, 20: at L=8 -> 3 truncate, lost (2+2+12)=16;
    // at L=10 -> 1 truncates, lost 10; at L=32 -> nothing.
    val df = Seq(5L, 10L, 10L, 20L).toDF("l")
    val out = Packing.truncationFrontier(df,
        org.apache.spark.sql.functions.col("l"), Seq(8, 10, 32))
      .collect().map(r => (r.getAs[Long]("context_len"),
        r.getAs[Long]("docs_truncated"), r.getAs[Long]("tokens_lost"),
        r.getAs[Long]("tokens_kept"), r.getAs[Long]("loss_e6")))
    assert(out.toSeq === Seq(
      (8L, 3L, 16L, 29L, 16L * 1000000L / 45L),
      (10L, 1L, 10L, 35L, 10L * 1000000L / 45L),
      (32L, 0L, 0L, 45L, 0L)))
  }

  test("truncationFrontier equals brute force on random length multisets") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    (1 to 10).foreach { _ =>
      val lens = Seq.fill(40)(rnd.nextInt(200).toLong)
      val grid = Seq(1, 17, 64, 150)
      val out = Packing.truncationFrontier(lens.toDF("l"),
          org.apache.spark.sql.functions.col("l"), grid)
        .collect().map(r => r.getAs[Long]("context_len") ->
          (r.getAs[Long]("docs_truncated"), r.getAs[Long]("tokens_lost"),
           r.getAs[Long]("tokens_kept"))).toMap
      grid.foreach { l =>
        val lost = lens.filter(_ > l).map(_ - l).sum
        assert(out(l.toLong) ===
          ((lens.count(_ > l).toLong, lost, lens.sum - lost)))
      }
    }
  }

  test("truncationFrontier guards: empty grid, non-positive, duplicate, negative length") {
    import spark.implicits._
    val df = Seq(1L).toDF("l")
    val c = org.apache.spark.sql.functions.col("l")
    intercept[IllegalArgumentException] {
      Packing.truncationFrontier(df, c, Seq.empty) }
    intercept[IllegalArgumentException] {
      Packing.truncationFrontier(df, c, Seq(0)) }
    intercept[IllegalArgumentException] {
      Packing.truncationFrontier(df, c, Seq(4, 4)) }
    intercept[Exception] {
      Packing.truncationFrontier(Seq(-1L).toDF("l"), c, Seq(4)).collect() }
  }
}
