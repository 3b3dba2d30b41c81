package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Property test: the incremental batch×corpus near-dup join agrees with
 * the DEFINITIONAL Jaccard computed in plain Scala on arbitrary generated
 * corpora — mutated copies, unrelated docs, exact dups, short docs — not
 * just the crafted cases. Threshold 3/4, rows=4 (32 bands): the detection
 * probability at J=0.75 is 1 - 5e-6 per pair, so agreement on hundreds of
 * generated pairs is the expected outcome, and a miss would flag either a
 * banding bug or a verify bug rather than statistical bad luck. */
class DedupPropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-dedupprop-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val word = Gen.oneOf("alpha", "bravo", "charlie", "delta", "echo",
    "foxtrot", "golf", "hotel", "india", "juliet", "kilo", "lima")

  /** Base doc: 30-60 words — long enough for stable shingle sets. */
  private val baseText: Gen[String] =
    Gen.chooseNum(30, 60).flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))

  /** Mutate by appending a short tail — the near-dup shape. */
  private def mutate(t: String): Gen[String] =
    Gen.chooseNum(1, 6).flatMap(n => Gen.listOfN(n, word).map(w => t + " " + w.mkString(" ")))

  private def shingleSet(t: String, w: Int = 10): Set[String] = {
    val lower = t.toLowerCase
    if (lower.length < w) Set(lower)
    else (0 to lower.length - w).map(i => lower.substring(i, i + w)).toSet
  }

  test("incremental near-dup equals plain-Scala definitional Jaccard on generated corpora") {
    import spark.implicits._
    val seed = org.scalacheck.rng.Seed(13L)
    val gen: Gen[(List[String], List[String])] = for {
      nCorpus <- Gen.chooseNum(3, 8)
      corpus <- Gen.listOfN(nCorpus, baseText)
      // batch: some mutated corpus docs, some fresh
      mutated <- Gen.someOf(corpus).flatMap(cs => Gen.sequence[List[String], String](cs.map(mutate)))
      nFresh <- Gen.chooseNum(1, 4)
      fresh <- Gen.listOfN(nFresh, baseText)
    } yield (corpus, mutated ++ fresh)

    val cases = Iterator.iterate(seed)(_.next)
      .take(8)
      .flatMap(s => gen.apply(Gen.Parameters.default, s))
      .toList

    cases.zipWithIndex.foreach { case ((corpusTexts, batchTexts), ci) =>
      val corpus = corpusTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val batch = batchTexts.zipWithIndex.map { case (t, i) => (1000L + i, t) }
        .toDF("doc_id", "text")
      val got = Dedup.incrementalJaccardNearDup(batch, corpus,
        thresholdNum = 3, thresholdDen = 4, rows = 4, shingleWidth = 10)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = (for {
        (bt, bi) <- batchTexts.zipWithIndex
        (ct, ci2) <- corpusTexts.zipWithIndex
        sb = shingleSet(bt); sc = shingleSet(ct)
        inter = (sb & sc).size; uni = (sb | sc).size
        if inter * 4 >= uni * 3
      } yield (1000L + bi, ci2.toLong)).toSet
      assert(got === want, s"case $ci: got $got want $want")
    }
  }
}
