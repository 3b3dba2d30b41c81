package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DsirSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-dsir-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("importance weights match the hand-computed smoothed ratios") {
    import spark.implicits._
    // target: "a a b"  → ct: a=2 b=1, Nt=3
    // raw:    "a b c", "c c" → cr: a=1 b=1 c=3, Nr=5; V=3
    // w_e6(a) = (1e6·3·8) div (2·6) = 2_000_000
    // w_e6(b) = (1e6·2·8) div (2·6) = 1_333_333
    // w_e6(c) = (1e6·1·8) div (4·6) =   333_333
    val docs = Seq(
      (1L, "a a b", "tgt"),
      (2L, "a b c", "raw"),
      (3L, "c c", "raw"))
      .toDF("doc_id", "text", "pool").repartition(4)
    val out = Dsir.unigramImportance(docs, col("pool") === "tgt")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq(
      (2L, 3L, 3666666L, 1222222L),   // 2e6 + 1333333 + 333333
      (3L, 2L, 666666L, 333333L)))
  }

  test("only raw documents are scored; token-free raw docs are absent") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x y", "tgt"),
      (2L, "x", "raw"),
      (3L, "   ", "raw"))  // whitespace only → no tokens
      .toDF("doc_id", "text", "pool")
    val out = Dsir.unigramImportance(docs, col("pool") === "tgt")
    assert(out.select("id").as[Long].collect().toSet === Set(2L))
  }

  test("weights are monotone in target likelihood: target-heavy tokens outscore raw-heavy ones") {
    import spark.implicits._
    // "common" appears in both pools, "tgtonly" only in target,
    // "rawonly" only in raw — a doc of tgtonly must outscore a doc of
    // rawonly at equal length.
    val docs = Seq(
      (1L, "tgtonly tgtonly common", "tgt"),
      (2L, "rawonly rawonly common", "raw"),
      (3L, "tgtonly", "raw"),
      (4L, "rawonly", "raw"))
      .toDF("doc_id", "text", "pool")
    val scores = Dsir.unigramImportance(docs, col("pool") === "tgt")
      .select("id", "mean_w_e6").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(scores(3L) > scores(4L))
  }

  test("importanceSample: zero weight never keeps, capped weight always keeps, seeds are independent") {
    import spark.implicits._
    val weighted = ((1L to 200L).map(i => (i, 0L)) ++
      (201L to 400L).map(i => (i, 1000000L + i)) ++
      (401L to 600L).map(i => (i, 500000L))).toDF("id", "mean_w_e6")
    val s7 = Dsir.importanceSample(weighted, seed = 7L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(s7.forall { case (_, (u, _)) => u >= 0L && u < 1000000L })
    assert((1L to 200L).forall(!s7(_)._2), "zero weight kept a doc")
    assert((201L to 400L).forall(s7(_)._2), "capped weight dropped a doc")
    val kept7 = (401L to 600L).count(s7(_)._2)
    assert(kept7 > 50 && kept7 < 150, s"p=0.5 kept $kept7/200") // md5-uniform
    // Determinism per seed; a different seed redraws the p=0.5 band but
    // never touches the degenerate bands.
    val s7again = Dsir.importanceSample(weighted, seed = 7L)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(s7.view.mapValues(_._2).toMap === s7again)
    val s8 = Dsir.importanceSample(weighted, seed = 8L)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert((401L to 600L).exists(i => s8(i) != s7(i)._2))
    assert((1L to 200L).forall(!s8(_)) && (201L to 400L).forall(s8(_)))
  }
}
