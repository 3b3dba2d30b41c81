package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

class BpeSpec extends AnyFunSuite with graft.testutil.OpenStreamLeakCheck {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-bpe-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def docs(texts: String*): DataFrame = {
    import spark.implicits._
    texts.toDF("text")
  }

  private def merges(df: DataFrame): Seq[(Int, String, String, Long)] =
    df.orderBy("round").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq

  test("greedy left-to-right application: 'aaaa' pairs as (aa)(aa), not overlapping") {
    // Round 1: (a,a) count 3 (three adjacent pairs in one word). Greedy
    // application must yield [aa, aa] — position 2 is consumed by the
    // first merge, so round 2's top pair is (aa,aa) with count 1, NOT
    // (a,a) again and NOT (aa,a).
    val got = merges(Bpe.learnMerges(docs("aaaa"), nMerges = 2))
    assert(got === Seq((1, "a", "a", 3L), (2, "aa", "aa", 1L)))
  }

  test("counts weight by word frequency, ties break by pair order, and learning stops when pairs run out") {
    // Vocab: "aaa" w=2, "ab" w=2, "b" w=1.
    // Round 1: (a,a) = 2 pairs × w2 = 4; (a,b) = 2 → adopt (a,a,4);
    //   "aaa" → [aa, a] (greedy: middle 'a' consumed).
    // Round 2: (aa,a) = 2 and (a,b) = 2 tie → pair order picks (a,b);
    //   "ab" → [ab].
    // Round 3: only (aa,a) = 2 remains → adopt; "aaa" → [aaa].
    // Round 4: every word is a single symbol → early stop, 3 rows.
    val got = merges(Bpe.learnMerges(docs("aaa aaa", "ab ab b"), nMerges = 4))
    assert(got === Seq((1, "a", "a", 4L), (2, "a", "b", 2L), (3, "aa", "a", 2L)))
  }

  test("pieceHistogram segments with the given merges and weights by word frequency") {
    // Merges ((a,b), (ab,c)): "abc" → [abc], "abd" → [ab, d], "e" → [e].
    // Corpus: "abc abc abd e" → abc:2, ab:1, d:1, e:1.
    val got = Bpe.pieceHistogram(docs("abc abc abd e"), Seq(("a", "b"), ("ab", "c")))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got === Map("abc" -> 2L, "ab" -> 1L, "d" -> 1L, "e" -> 1L))
  }

  test("learnMergesSegmented's vocabulary equals re-segmenting from scratch with the learned merges") {
    // The q95 one-corpus-pass path: the vocabulary learning ends with must
    // give the same piece histogram as rebuilding the vocab and replaying
    // the merge list (the two-pass formulation the oracle re-derives).
    val corpus = Seq("abc abc abd e", "aaa ab aaa", "abab b")
    val (mergesDf, segmented) = Bpe.learnMergesSegmented(docs(corpus: _*), nMerges = 3)
    val learned = merges(mergesDf).map { case (_, a, b, _) => (a, b) }
    val onePass = Bpe.pieceHistogramOfSegmented(segmented)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val twoPass = Bpe.pieceHistogram(docs(corpus: _*), learned)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    segmented.unpersist(blocking = false)
    assert(onePass === twoPass)
    assert(onePass.nonEmpty)
  }

  test("merged symbols do not chain within one round: 'abab' under (a,b) leaves two pieces") {
    // Round 1 on "abab": pairs (a,b)×2, (b,a)×1 → adopt (a,b,2);
    // both occurrences merge (non-adjacent starts) → [ab, ab].
    // Round 2: (ab,ab) count 1.
    val got = merges(Bpe.learnMerges(docs("abab"), nMerges = 2))
    assert(got === Seq((1, "a", "b", 2L), (2, "ab", "ab", 1L)))
  }

  // ---- strict one-merge-per-round reference, for fuzzing the safe-batch
  // adoption rule in learnMergesSegmented ------------------------------------

  private def greedyApply(syms: Vector[String], a: String, b: String): Vector[String] =
    syms.foldLeft(Vector.empty[String]) { (acc, s) =>
      if (acc.nonEmpty && acc.last == a && s == b) acc.init :+ (a + b)
      else acc :+ s
    }

  private def strictLearn(words: Map[String, Long], nMerges: Int): Seq[(Int, String, String, Long)] = {
    var v: Map[Vector[String], Long] =
      words.groupMapReduce { case (w, _) => w.map(_.toString).toVector } (_._2)(_ + _)
    val out = Seq.newBuilder[(Int, String, String, Long)]
    var round = 1
    var done = false
    while (round <= nMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, c) <- v; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) = counts.getOrElse((syms(i), syms(i + 1)), 0L) + c
      if (counts.isEmpty) done = true
      else {
        val ((a, b), cnt) = counts.minBy { case ((a, b), c) => (-c, a, b) }
        out += ((round, a, b, cnt))
        v = v.toSeq.map { case (syms, c) => (greedyApply(syms, a, b), c) }
          .groupMapReduce(_._1)(_._2)(_ + _)
        round += 1
      }
    }
    out.result()
  }

  test("selectBatch adopts more than one merge when pairs do not interact") {
    // Regression for the round-9 no-op: the overlapMax ceiling used to
    // include the batch's OWN adopted pairs, so bound >= the first adopted
    // count >= every later candidate and batches degenerated to size 1.
    // Four symbol-disjoint pairs with strictly falling counts and a short
    // collected list (kthCnt = -inf): all four must adopt in one batch.
    val pairs = Array(("a", "b", 10L), ("c", "d", 9L), ("e", "f", 8L), ("g", "h", 7L))
    assert(Bpe.selectBatch(pairs, k = 64, maxAdopt = 6) === pairs.toList)
    // maxAdopt caps the batch.
    assert(Bpe.selectBatch(pairs, k = 64, maxAdopt = 2) === pairs.take(2).toList)
  }

  test("selectBatch stops at the first pair whose count the batch made stale") {
    // (c,a) is an (x,a) affected form after adopting (a,b) — its a may
    // have been consumed by a following b ("c a b"), so its count is
    // stale and the batch must end there even though a clean pair
    // follows.
    val pairs = Array(("a", "b", 10L), ("c", "a", 9L), ("e", "f", 8L))
    assert(Bpe.selectBatch(pairs, k = 64, maxAdopt = 6) === List(("a", "b", 10L)))
    // (b,c) is a (b,y) affected form ("a b c" loses its b) — also stale.
    val pairs2 = Array(("a", "b", 10L), ("b", "c", 9L), ("e", "f", 8L))
    assert(Bpe.selectBatch(pairs2, k = 64, maxAdopt = 6) === List(("a", "b", 10L)))
    // (a,c) merely SHARES the symbol a but is NEITHER affected form — its
    // a is followed by c, which the (a,b) merge can never consume, so its
    // count is provably exact and it batches (the former symbol-
    // disjointness rule split here, paying an extra collect round).
    val pairs3 = Array(("a", "b", 10L), ("a", "c", 9L), ("e", "f", 8L))
    assert(Bpe.selectBatch(pairs3, k = 64, maxAdopt = 6) === pairs3.toList)
  }

  test("selectBatch keeps a self-pair's own count in the ceiling after adoption") {
    // Merging (a,a) spawns (aa,a)/(a,aa) pairs whose counts are bounded by
    // cnt(a,a) itself — not by any other collected pair. A later disjoint
    // candidate below that ceiling must NOT batch with it.
    val pairs = Array(("a", "a", 10L), ("c", "d", 6L))
    assert(Bpe.selectBatch(pairs, k = 64, maxAdopt = 6) === List(("a", "a", 10L)))
    // ...but a NON-self pair's count leaves the ceiling once adopted, so
    // the same shape with (a,b) does batch.
    val pairs2 = Array(("a", "b", 10L), ("c", "d", 6L))
    assert(Bpe.selectBatch(pairs2, k = 64, maxAdopt = 6) === pairs2.toList)
  }

  test("selectBatch respects the kth-count ceiling when the collected list is full") {
    // With pairs.length == k the tail of the distribution is unseen: any
    // unseen pair can hold up to kthCnt, so a candidate must strictly
    // exceed it to batch. Here k=3, kth=8 — (c,d,8) fails 8 > 8.
    val pairs = Array(("a", "b", 10L), ("c", "d", 8L), ("e", "f", 8L))
    assert(Bpe.selectBatch(pairs, k = 3, maxAdopt = 6) === List(("a", "b", 10L)))
  }

  test("batch of size > 1 forms end-to-end on a non-interacting corpus") {
    // Two disjoint high-count pairs, everything else far below: one
    // pair-count job must adopt both (asserted via Spark job count — the
    // fixed pattern is jobs(2 merges batched) < jobs(2 merges strictly
    // sequential would need). We count jobs via a listener.)
    // Count only the pair-count collect jobs (by call-site in the stage
    // names): other jobs on the bus — async SQLExecution futures, cache
    // materializations — are noise for this assertion.
    val counter = new org.apache.spark.scheduler.SparkListener {
      val jobs = new java.util.concurrent.atomic.AtomicInteger
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        if (js.stageInfos.exists(si => si.name.contains("collect at Bpe")))
          jobs.incrementAndGet()
    }
    // 'ab' and 'cd' each ×8 → (a,b)=8, (c,d)=8 disjoint; tie breaks (a,b)
    // first and both adopt in one batch. Learned rows must equal strict.
    val corpus = (Seq.fill(8)("ab") ++ Seq.fill(8)("cd")).mkString(" ")
    val expected = strictLearn(Map("ab" -> 8L, "cd" -> 8L), nMerges = 2)
    spark.sparkContext.addSparkListener(counter)
    try {
      val got = merges(Bpe.learnMerges(docs(corpus), nMerges = 2))
      assert(got === expected)
    } finally spark.sparkContext.removeSparkListener(counter)
    // Batched: ONE pair-count collect adopts both merges. Sequential
    // (the round-9 no-op regression) would pay one per merge.
    // The listener bus is async: poll until the count is stable.
    var last = -1
    var now = counter.jobs.get()
    while (now != last) { last = now; Thread.sleep(200); now = counter.jobs.get() }
    assert(counter.jobs.get() == 1,
      s"expected a single batched pair-count job, saw ${counter.jobs.get()}")
  }

  test("batched adoption == strict one-merge-per-round BPE (fuzz)") {
    // The batch rule adopts several merges from one pair-count job when
    // they are provably what sequential rounds would pick. Random small
    // corpora over a 4-letter alphabet maximize pair interaction (the
    // regime where unsafe batching would diverge) — every seed must match
    // the strict reference row-for-row, counts included.
    val rnd = new scala.util.Random(20260814)
    for (seed <- 1 to 12) {
      val alphabet = "abcd"
      val nWords = 12 + rnd.nextInt(12)
      val words = (1 to nWords).map { _ =>
        val len = 1 + rnd.nextInt(5)
        (1 to len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      }
      val weights = words.map(_ -> (1L + rnd.nextInt(4))).toMap
      val text = weights.toSeq.flatMap { case (w, c) => Seq.fill(c.toInt)(w) }.mkString(" ")
      val expected = strictLearn(weights, nMerges = 6)
      val got = merges(Bpe.learnMerges(docs(text), nMerges = 6))
      assert(got === expected, s"seed=$seed corpus=$text")
    }
  }

  test("selectBatch batching == strict under k-TRUNCATED pair lists (driver fuzz)") {
    // The Spark fuzz above never truncates (tiny vocab, k=64): this one
    // replays learnMergesImpl's batch loop driver-side with SMALL k, so
    // the kth-count ceiling — the guard against unseen tail pairs — is
    // exercised hard, across heavy pair interaction (3-4 letter
    // alphabets) and the new affected-form rule's clean-share cases.
    def batchedLearn(words: Map[String, Long], nMerges: Int, k: Int)
        : Seq[(Int, String, String, Long)] = {
      var v: Map[Vector[String], Long] =
        words.groupMapReduce { case (w, _) => w.map(_.toString).toVector } (_._2)(_ + _)
      val out = Seq.newBuilder[(Int, String, String, Long)]
      var n = 0
      var done = false
      while (n < nMerges && !done) {
        val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        for ((syms, c) <- v; i <- 0 until syms.length - 1)
          counts((syms(i), syms(i + 1))) = counts.getOrElse((syms(i), syms(i + 1)), 0L) + c
        val top = counts.toArray
          .map { case ((a, b), c) => (a, b, c) }
          .sortBy { case (a, b, c) => (-c, a, b) }
          .take(k)
        if (top.isEmpty) done = true
        else {
          val batch = Bpe.selectBatch(top, k, nMerges - n)
          assert(batch.nonEmpty, "batch must adopt at least the argmax")
          for ((a, b, cnt) <- batch) {
            n += 1
            out += ((n, a, b, cnt))
            v = v.toSeq.map { case (syms, c) => (greedyApply(syms, a, b), c) }
              .groupMapReduce(_._1)(_._2)(_ + _)
          }
        }
      }
      out.result()
    }
    val rnd = new scala.util.Random(1137)
    for (trial <- 1 to 400) {
      val alphabet = if (trial % 2 == 0) "abc" else "abcd"
      val nWords = 6 + rnd.nextInt(20)
      val words = (1 to nWords).map { _ =>
        val len = 1 + rnd.nextInt(6)
        (1 to len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      }
      val weights = words.map(_ -> (1L + rnd.nextInt(5))).toMap
      val k = Seq(3, 5, 8, 64)(rnd.nextInt(4))
      val nMerges = 1 + rnd.nextInt(8)
      val expected = strictLearn(weights, nMerges)
      val got = batchedLearn(weights, nMerges, k)
      assert(got === expected, s"trial=$trial k=$k corpus=${words.mkString(" ")}")
    }
  }
}
