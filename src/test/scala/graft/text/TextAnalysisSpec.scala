package graft.text

import graft.text.TextAnalysis._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextAnalysisSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-text-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def one(text: String): DataFrame = {
    import spark.implicits._
    Seq(text).toDF("text")
  }

  test("quality signals on a crafted sentence") {
    val text = "The quick brown fox, the lazy dog! The fox."
    val row: Row = one(text)
      .select(qualitySignals(col("text")).map { case (n, c) => c.as(n) }: _*)
      .head()
    val sig = row.getValuesMap[Any](row.schema.fieldNames)
    assert(sig("n_chars") === text.length)
    assert(sig("n_tokens") === 9)
    // tokens lowercased: the, quick, brown, fox,, the, lazy, dog!, the, fox.
    assert(sig("n_distinct_tokens") === 7)
    assert(sig("n_punct_chars") === 3) // one comma, one bang, one period
    assert(sig("n_stopword_tokens") === 3) // 'the' x3 ('fox,' etc. are not words)
    assert(sig("max_token_len") === 5)
  }

  test("subtoken count segments letter runs, digit runs, and marks") {
    val out = one("abc123 def-x!").select(subtokenCount(col("text"))).head().getInt(0)
    // abc | 123 | def | - | x | !
    assert(out === 6)
  }

  test("fingerprint is md5 of normalized text and collapses whitespace/case") {
    val fps = {
      import spark.implicits._
      Seq("Hello   World", "hello world", "other").toDF("text")
        .select(fingerprint(col("text"))).collect().map(_.getString(0))
    }
    assert(fps(0) === fps(1))
    assert(fps(0) !== fps(2))
    // Pinned value keeps the fingerprint stable across releases (and equals
    // DuckDB's md5('hello world')).
    assert(fps(0) === "5eb63bbbe01eeed093cb22bb8f5acdc3")
  }

  test("language guess picks the language with most stopword hits, ties to preference order") {
    import spark.implicits._
    val out = Seq(
      ("en", "the cat and the dog went to the park"),
      ("de", "der hund und die katze sind in der stadt"),
      ("es", "el perro y la casa es una maravilla que ver"),
      ("fr", "le chien et le chat est une merveille du jour"),
      ("en", "zzz qqq")) // no hits anywhere -> tie -> preference order: en
      .toDF("expected", "text")
      .select(col("expected"), languageGuess(col("text")).as("got"))
      .collect()
    out.foreach(r => assert(r.getString(1) === r.getString(0), r.getString(0)))
  }

  test("token count ignores repeated and leading/trailing whitespace") {
    val out = one("  a   b\t\nc  ").select(tokenCount(col("text"))).head().getInt(0)
    assert(out === 3)
  }
}
