package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CollocationsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-collocations-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def top(k: Int, minCount: Int, texts: String*)
      : Seq[(Int, String, String, Long, Long, Long, Long)] = {
    import spark.implicits._
    Collocations.pmiTopK(texts.toDF("text"), k, minCount).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
  }

  test("pmiTopK: hand-computed lifts, bound pairs beat promiscuous ones") {
    // "new york" always adjacent (3×); "the end"/"the start" split "the"'s
    // mass. Unigrams: new=3 york=3 the=4 end=2 start=2 of=2.
    val out = top(k = 3, minCount = 2,
      "new york the end of new york",
      "new york the start the end of the start")
    // Lifts: (end,of) 2/(2·2) = .5e12 — fully bound, rare, PMI's classic
    // favorite; (new,york) 3/(3·3) ≈ .333e12; (the,end) = (the,start)
    // 2/(4·2) = .25e12 tie, n_ab tie too -> (w1,w2) lexicographic.
    assert(out.map(t => (t._1, t._2, t._3)) ===
      Seq((1, "end", "of"), (2, "new", "york"), (3, "the", "end")))
    val ny = out.find(t => t._2 == "new" && t._3 == "york").get
    assert((ny._4, ny._5, ny._6) === ((3L, 3L, 3L)))
    assert(ny._7 === 3L * 1000000000000L / 9L)
    val te = out.find(t => t._2 == "the" && t._3 == "end").get
    assert(te._7 === 2L * 1000000000000L / 8L)
  }

  test("pmiTopK: minCount drops hapax pairs (the degenerate PMI maximizers)") {
    val out = top(k = 10, minCount = 2, "rare pair once", "rare pair twice")
    assert(out.map(t => (t._2, t._3)) === Seq(("rare", "pair")),
      "only the repeated bigram survives minCount = 2")
  }

  test("pmiTopK: ties order by n_ab desc then (w1, w2); k bounds output") {
    // Two pairs with identical lift 1/1: (a b) ×1 with unigrams 1/1,
    // (c d) ×1 with unigrams 1/1 — tie on lift AND n_ab -> lexicographic.
    val out = top(k = 2, minCount = 1, "a b", "c d")
    assert(out.map(t => (t._1, t._2, t._3)) === Seq((1, "a", "b"), (2, "c", "d")))
    assert(top(k = 1, minCount = 1, "a b", "c d").size === 1)
  }

  test("pmiTopK: input validation") {
    import spark.implicits._
    val df = Seq("a b").toDF("text")
    intercept[IllegalArgumentException](Collocations.pmiTopK(df, 0, 1))
    intercept[IllegalArgumentException](Collocations.pmiTopK(df, 5, 0))
  }
}
