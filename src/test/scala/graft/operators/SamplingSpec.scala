package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SamplingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-sampling-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("deterministic sample keeps the same rows on every evaluation") {
    import spark.implicits._
    val df = (1 to 10000).toDF("id")
    val a = Sampling.deterministicSample(df, col("id"), 1, 5)
      .collect().map(_.getInt(0)).toSet
    val b = Sampling.deterministicSample(df, col("id"), 1, 5)
      .collect().map(_.getInt(0)).toSet
    assert(a === b)
    // ~20% with hash-uniform deviation
    assert(math.abs(a.size - 2000) < 200, s"kept ${a.size}")
  }

  test("nested fractions nest: a 10% sample is a subset of a 20% sample") {
    import spark.implicits._
    val df = (1 to 5000).toDF("id")
    val small = Sampling.deterministicSample(df, col("id"), 1, 10)
      .collect().map(_.getInt(0)).toSet
    val large = Sampling.deterministicSample(df, col("id"), 2, 10)
      .collect().map(_.getInt(0)).toSet
    assert(small.subsetOf(large))
  }

  test("splitColumn partitions every row into exactly one split with ~right sizes") {
    import spark.implicits._
    val df = (1 to 10000).toDF("id")
    val counts = df.select(Sampling.splitColumn(col("id"),
        Seq("train" -> 8L, "val" -> 1L, "test" -> 1L), 10L).as("split"))
      .groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum === 10000L)
    assert(math.abs(counts("train") - 8000) < 300, counts.toString)
    assert(math.abs(counts("val") - 1000) < 150, counts.toString)
    assert(math.abs(counts("test") - 1000) < 150, counts.toString)
  }

  test("split membership is consistent with deterministicSample thresholds") {
    import spark.implicits._
    val df = (1 to 2000).toDF("id")
    // The train split (first 8/10) is exactly the 8/10 deterministic sample.
    val trainViaSplit = df.select(col("id"), Sampling.splitColumn(col("id"),
        Seq("train" -> 8L, "rest" -> 2L), 10L).as("s"))
      .filter(col("s") === "train").collect().map(_.getInt(0)).toSet
    val trainViaSample = Sampling.deterministicSample(df, col("id"), 8, 10)
      .collect().map(_.getInt(0)).toSet
    assert(trainViaSplit === trainViaSample)
  }

  test("the full fraction num == den keeps every row") {
    import spark.implicits._
    val df = (1 to 1000).toDF("id")
    assert(Sampling.deterministicSample(df, col("id"), 5, 5).count() === 1000L)
    assert(Sampling.deterministicSample(df, col("id"), 1, 1).count() === 1000L)
    assert(Sampling.deterministicSample(df, col("id"), 0, 5).count() === 0L)
  }

  test("fractions must sum to the denominator") {
    val e = intercept[IllegalArgumentException] {
      Sampling.splitColumn(col("id"), Seq("a" -> 5L, "b" -> 4L), 10L)
    }
    assert(e.getMessage.contains("must sum"))
  }

  test("weightedMix samples each key at its own rate, per-key equal to deterministicSample") {
    import spark.implicits._
    val df = (1 to 3000).map(i => (s"k${i % 3}", i.toLong)).toDF("k", "id")
    val mixed = Sampling.weightedMix(df, col("k"), col("id"),
      Seq("k0" -> (1L, 4L), "k1" -> (4L, 4L)))
    // k2 absent from the spec → dropped entirely.
    assert(mixed.filter(col("k") === "k2").count() === 0L)
    // k1 at the full fraction keeps every row.
    assert(mixed.filter(col("k") === "k1").count() === 1000L)
    // k0's subset is EXACTLY deterministicSample(1/4) of k0's rows.
    val viaMix = mixed.filter(col("k") === "k0").select("id")
      .collect().map(_.getLong(0)).toSet
    val viaSample = Sampling.deterministicSample(
      df.filter(col("k") === "k0"), col("id"), 1, 4)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(viaMix === viaSample)
  }

  test("weightedMix memberships nest as a key's rate increases") {
    import spark.implicits._
    val df = (1 to 2000).map(i => ("k", i.toLong)).toDF("k", "id")
    val at1 = Sampling.weightedMix(df, col("k"), col("id"), Seq("k" -> (1L, 4L)))
      .select("id").collect().map(_.getLong(0)).toSet
    val at3 = Sampling.weightedMix(df, col("k"), col("id"), Seq("k" -> (3L, 4L)))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(at1.subsetOf(at3))
    assert(at1.size < at3.size)
  }

  test("epochShards: deterministic, seed-sensitive, positions contiguous per shard") {
    import spark.implicits._
    val df = (1L to 1000L).toDF("id")
    val a = Sampling.epochShards(df, col("id"), seed = 7L, nShards = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).sortBy(_._1)
    val b = Sampling.epochShards(df, col("id"), seed = 7L, nShards = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).sortBy(_._1)
    assert(a.toSeq === b.toSeq, "same seed must reproduce the identical permutation")
    val c = Sampling.epochShards(df, col("id"), seed = 8L, nShards = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).sortBy(_._1)
    assert(a.toSeq !== c.toSeq, "a new seed must be a fresh permutation")
    // Every row lands in exactly one shard; positions are 1..n per shard
    // with no gaps; shards are roughly balanced (hash assignment).
    assert(a.length === 1000)
    val byShard = a.groupBy(_._2)
    assert(byShard.keySet.subsetOf((0 until 8).toSet))
    byShard.values.foreach { rows =>
      assert(rows.map(_._3).sorted.toSeq === (1 to rows.length).toSeq)
    }
    assert(byShard.values.map(_.length).min > 60, s"shard sizes ${byShard.values.map(_.length)}")
    // Within a shard, position order follows the hash order — not id
    // order (it IS a shuffle).
    val shard0 = a.filter(_._2 === byShard.keys.head).sortBy(_._3).map(_._1)
    assert(shard0.toSeq !== shard0.sorted.toSeq, "shuffle order degenerated to id order")
  }

  test("mixAudit reconciles kept counts with the mix, including dropped keys") {
    import spark.implicits._
    val df = (1 to 3000).map(i => (s"k${i % 3}", i.toLong)).toDF("k", "id")
    val weights = Seq("k0" -> (1L, 4L), "k1" -> (4L, 4L))
    val audit = Sampling.mixAudit(df, col("k"), col("id"), weights)
      .collect().map(r => r.getString(0) ->
        (Option(r.get(1)).map(_.asInstanceOf[Long]),
          Option(r.get(2)).map(_.asInstanceOf[Long]),
          r.getLong(3), r.getLong(4))).toMap
    // Every key present in the corpus appears — k2 with null rates and 0
    // kept, not silently missing.
    assert(audit.keySet === Set("k0", "k1", "k2"))
    assert(audit("k2") === ((None, None, 1000L, 0L)))
    assert(audit("k1") === ((Some(4L), Some(4L), 1000L, 1000L)))
    val (n0, d0, tot0, kept0) = audit("k0")
    assert((n0, d0, tot0) === ((Some(1L), Some(4L), 1000L)))
    // The audit's kept count must equal the mix's actual row count.
    val actual = Sampling.weightedMix(df, col("k"), col("id"), weights)
      .filter(col("k") === "k0").count()
    assert(kept0 === actual)
  }

  test("tokenBudgetSample equals a plain-Scala prefix sum; budgets nest; zero budget is empty") {
    import spark.implicits._
    // Weights 1..40 so cumulative boundaries land mid-stream, not on edges.
    val rows = (1L to 40L).map(id => (id, (id % 7) + 1))
    val df = rows.toDF("doc_id", "w")

    def md5Signed(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      (0 until 8).foldLeft(0L)((acc, i) => (acc << 8) | (d(i) & 0xffL))
    }
    def brute(budget: Long): Map[Long, (Long, Long)] = {
      val ordered = rows.map { case (id, w) => (md5Signed(s"11:$id"), id, w) }
        .sortBy(t => (t._1, t._2))
      var cum = 0L
      val out = scala.collection.mutable.Map[Long, (Long, Long)]()
      for ((_, id, w) <- ordered) {
        if (cum < budget) out(id) = (w, cum)
        cum += w
      }
      out.toMap
    }
    def run(budget: Long): Map[Long, (Long, Long)] =
      Sampling.tokenBudgetSample(df, col("doc_id"), col("w"), budget, seed = 11L)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

    for (budget <- Seq(0L, 1L, 37L, 80L, 10_000L)) {
      assert(run(budget) === brute(budget), s"budget $budget")
    }
    assert(run(0L).isEmpty)
    // Prefix property: a grown budget extends the slice, never reshuffles it.
    val small = run(37L); val big = run(80L)
    assert(small.keySet.subsetOf(big.keySet))
    assert(small.forall { case (id, v) => big(id) == v })
    // The full budget admits everything with exact global positions.
    assert(run(10_000L).size == 40)
  }

  test("tokenBudgetSampleByKey: per-key brute-force equality, whitelist, zero budget") {
    import spark.implicits._
    val rows = (1L to 60L).map(id => (s"k${id % 4}", id, (id % 5) + 1))
    val df = rows.toDF("k", "doc_id", "w")
    val spec = Seq("k0" -> 10L, "k1" -> 0L, "k2" -> 1000L) // k3 unlisted

    def md5Signed(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      (0 until 8).foldLeft(0L)((acc, i) => (acc << 8) | (d(i) & 0xffL))
    }
    val want = spec.flatMap { case (key, budget) =>
      val ordered = rows.filter(_._1 == key)
        .map { case (_, id, w) => (md5Signed(s"9:$id"), id, w) }
        .sortBy(t => (t._1, t._2))
      var cum = 0L
      ordered.flatMap { case (_, id, w) =>
        val keep = cum < budget; cum += w
        if (keep) Some((key, id) -> ((w, cum - w))) else None
      }
    }.toMap

    val got = Sampling.tokenBudgetSampleByKey(df, col("k"), col("doc_id"),
        col("w"), spec, seed = 9L)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    assert(got === want)
    assert(!got.keys.exists(_._1 == "k1"), "zero budget must admit nothing")
    assert(!got.keys.exists(_._1 == "k3"), "unlisted keys must drop wholesale")
    assert(got.keys.count(_._1 == "k2") == 15, "unbitten budget keeps the whole key")
    intercept[IllegalArgumentException] {
      Sampling.tokenBudgetSampleByKey(df, col("k"), col("doc_id"), col("w"),
        Seq("k0" -> 1L, "k0" -> 2L), seed = 9L)
    }
  }

  test("samplePerKey returns exactly n per key (all rows for short keys), nested across n") {
    import spark.implicits._
    val df = ((1L to 100L).map(i => ("big", i)) ++
      (101L to 103L).map(i => ("small", i))).toDF("src", "id")
    val s5 = Sampling.samplePerKey(df, col("src"), col("id"), n = 5, seed = 3L)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    assert(s5.count(_._1 == "big") === 5)
    assert(s5.filter(_._1 == "small").map(_._3).toSet === Set(101L, 102L, 103L))
    // Nested: the n=3 sample is exactly ranks 1..3 of the n=5 sample.
    val s3 = Sampling.samplePerKey(df, col("src"), col("id"), n = 3, seed = 3L)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(s3 === s5.filter(_._2 <= 3).toSet)
    // A different seed draws a different balanced subset of the big key.
    val other = Sampling.samplePerKey(df, col("src"), col("id"), n = 5, seed = 4L)
      .collect().filter(_.getString(0) == "big").map(_.getLong(2)).toSet
    assert(other !== s5.filter(_._1 == "big").map(_._3).toSet)
  }

  /** Plain-Scala restatement of [[Sampling.weightedSample]]'s priority:
   * min over tickets of md5_64("seed:id:i") >>> 1. */
  private def refPriority(seed: Long, id: Long, w: Long): Long =
    (0L until w).map { i =>
      graft.dedup.SimHash64.md5Hash64(
        org.apache.spark.unsafe.types.UTF8String.fromString(s"$seed:$id:$i")) >>> 1
    }.min

  test("weightedSample matches the min-ticket reference; zero weight never selected") {
    import spark.implicits._
    val df = (1L to 500L).map(i => (i, i % 7)).toDF("id", "w") // w in [0, 6]
    val got = Sampling.weightedSample(df, col("id"), col("w"), n = 30, seed = 5L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length === 30)
    // Priorities match the reference ticket-for-ticket, and the winner set
    // is exactly the reference's global top 30 by (priority, id).
    val ref = (1L to 500L).filter(_ % 7 != 0)
      .map(i => (i, i % 7, refPriority(5L, i, i % 7)))
    assert(got.toSet === ref.sortBy(t => (t._3, t._1)).take(30).toSet)
    assert(got.forall(_._2 > 0), "zero-weight rows must never appear")
  }

  test("weightedSample clamps weights at maxTickets and is seed-sensitive") {
    import spark.implicits._
    val df = Seq((1L, 1000L), (2L, 4L), (3L, 4L), (4L, 0L)).toDF("id", "w")
    def toPair(m: Array[(Long, Long, Long)]) = m.map(t => t._1 -> (t._2, t._3)).toMap
    val by = toPair(Sampling.weightedSample(df, col("id"), col("w"),
      n = 3, seed = 9L, maxTickets = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))))
    // id=1's weight clamps to 4: same priority as four tickets, and the
    // reported weight is the clamped value the decision used.
    assert(by(1L) === (4L, refPriority(9L, 1L, 4L)))
    assert(by(2L) === (4L, refPriority(9L, 2L, 4L)))
    assert(!by.contains(4L))
    // Selection probability is monotone in weight by construction (more
    // tickets can only lower the min); across many seeds the heavy row
    // must win at least as often as a light one. Spot-check determinism
    // under a different seed instead (bit-exact, engine-independent).
    val again = toPair(Sampling.weightedSample(df, col("id"), col("w"),
      n = 3, seed = 10L, maxTickets = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))))
    assert(again(1L)._2 === refPriority(10L, 1L, 4L))
  }

  test("isqrt is exact across the full long range (boundaries + random)") {
    import spark.implicits._
    def ref(n: Long): Long = {
      val s = math.sqrt(n.toDouble).toLong
      Seq(s - 2, s - 1, s, s + 1, s + 2).filter(x => x >= 0)
        .filter(x => BigInt(x) * BigInt(x) <= BigInt(n)).max
    }
    val rnd = new scala.util.Random(3)
    val cases = Seq(0L, 1L, 2L, 3L, 4L, 15L, 16L, 17L,
      (1L << 52) - 1, 1L << 52, (1L << 52) + 1,
      3037000498L * 3037000498L, 3037000499L * 3037000499L,
      3037000499L * 3037000499L + 1, Long.MaxValue) ++
      Seq.fill(200)(math.abs(rnd.nextLong()) max 0L)
    val got = cases.toDF("n")
      .select(col("n"), Sampling.isqrt(col("n")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    cases.foreach { n => assert(got(n) === ref(n), s"isqrt($n)") }
  }

  test("temperatureBudgets: sums to the total, within one of the real-valued share") {
    import spark.implicits._
    val rows = Seq(("a", 100L), ("a", 44L), ("b", 900L), ("c", 10000L),
      ("d", 1L), ("e", 0L)).toDF("k", "w")
    val B = 777L
    val got = Sampling.temperatureBudgets(rows, col("k"), col("w"), B)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.map(_._4).sum === B, "largest remainder must allocate exactly the total")
    val bigW = got.map(_._3).sum
    got.foreach { case (k, _, w, b) =>
      val exact = BigInt(B) * BigInt(w)
      assert(BigInt(b) * bigW >= exact - bigW && BigInt(b) * bigW <= exact + bigW,
        s"key $k budget $b more than one unit from its share")
    }
    // weights are the exact integer sqrt of the per-key totals
    assert(got.map { case (k, n, w, _) => k -> ((n, w)) }.toMap.apply("a") === ((144L, 12L)))
    assert(got.collectFirst { case ("e", n, w, b) => (n, w, b) } === Some((0L, 0L, 0L)))
  }

  test("temperatureMix admits within derived budgets and nests as the total grows") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val docs = (1 to 300).map { i =>
      (s"s${i % 4}", i.toLong, 1L + rnd.nextInt(40).toLong) }.toDF("k", "id", "w")
    val spec = Sampling.temperatureBudgets(docs, col("k"), col("w"), 1500L)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    val small = Sampling.temperatureMix(docs, col("k"), col("id"), col("w"), 1500L, seed = 5L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(small.nonEmpty)
    small.groupBy(_._1).foreach { case (k, rows) =>
      // admit rule: every admitted row STARTED under the key's budget
      assert(rows.map(_._4).max < spec(k), s"key $k admitted past its budget")
    }
    val grown = Sampling.temperatureMix(docs, col("k"), col("id"), col("w"), 3000L, seed = 5L)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(small.map(r => (r._1, r._2)).toSet.subsetOf(grown),
      "grown total must extend, not reshuffle, the admitted set")
  }

  test("temperatureMix fails fast on a null key instead of NPE-ing or losing budget") {
    import spark.implicits._
    val docs = Seq((Some("a"), 1L, 10L), (None, 2L, 10L), (Some("b"), 3L, 10L))
      .toDF("k", "id", "w")
    // The guard is in-plan now (the operator is fully lazy — no driver
    // collect to host an eager require), so it fires on the first action.
    val e = intercept[Throwable] {
      Sampling.temperatureMix(docs, col("k"), col("id"), col("w"), 10L, seed = 1L)
        .collect()
    }
    val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => String.valueOf(t.getMessage)).mkString(" | ")
    assert(msgs.contains("non-null keys"), s"got: $msgs")
    // The documented remedy works: filter the null group, mix the rest.
    val ok = Sampling.temperatureMix(docs.filter(col("k").isNotNull),
      col("k"), col("id"), col("w"), 10L, seed = 1L).collect()
    assert(ok.nonEmpty)
  }
}
