package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

class ServingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-serving-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def docs(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def audit(d: DataFrame, depths: Seq[Int])
      : Map[Long, (Long, Long, Long, Long)] =
    Serving.prefixCacheAudit(d, depths).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap

  test("prefixCacheAudit: groups by exact first-K tokens; prices (size-1)*K per shared group") {
    val d = docs(
      1L -> "a b c d",
      2L -> "a b x y",
      3L -> "a b c d e",
      4L -> "p q")
    val out = audit(d, Seq(2, 4))
    // K=2: all 4 eligible; [a b] x3 + [p q] x1 -> 2 groups, 3 shared docs,
    // cacheable (3-1)*2 = 4.
    assert(out(2L) === ((4L, 2L, 3L, 4L)))
    // K=4: doc 4 (2 tokens) ineligible; [a b c d] x2 + [a b x y] x1.
    assert(out(4L) === ((3L, 2L, 2L, 4L)))
  }

  test("prefixCacheAudit: a depth nobody reaches emits no row; zero-sharing depths emit zeros") {
    val d = docs(1L -> "a b c", 2L -> "x y z")
    val out = audit(d, Seq(2, 16))
    assert(!out.contains(16L), "no doc has 16 tokens - no row at that depth")
    assert(out(2L) === ((2L, 2L, 0L, 0L)),
      "nothing shares at K=2 - zeros, not nulls")
  }

  test("prefixCacheAudit: tokenization is lowercased, so case variants share a prefix") {
    val d = docs(1L -> "The Quick fox", 2L -> "the quick dog")
    val out = audit(d, Seq(2))
    assert(out(2L) === ((2L, 1L, 2L, 2L)))
  }

  test("prefixCacheAudit: prefix keys are position-exact (no cross-boundary collisions)") {
    // ["ab", "c"] vs ["a", "bc"]: same concatenated letters, different
    // token boundaries - the U+0001 join must keep them distinct.
    val d = docs(1L -> "ab c", 2L -> "a bc")
    val out = audit(d, Seq(2))
    assert(out(2L) === ((2L, 2L, 0L, 0L)))
  }

  test("prefixCacheAudit: one tokenize pass feeds every depth (q64-cliff rule)") {
    val d = docs(1L -> "a b c d e f g h", 2L -> "a b c d x y z w")
    val p = Serving.prefixCacheAudit(d, Seq(2, 4, 8))
      .queryExecution.optimizedPlan.toString
    val tokenizes = "split".r.findAllIn(p).length
    assert(tokenizes <= 2,
      s"token kernel appears $tokenizes times - the array must bind below the depth explode")
  }
}
