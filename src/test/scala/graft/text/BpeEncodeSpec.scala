package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BpeEncodeSpec extends AnyFunSuite with graft.testutil.OpenStreamLeakCheck {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-bpe-encode-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def docs(texts: String*): DataFrame = {
    import spark.implicits._
    texts.toDF("text")
  }

  private def pieces(text: String, merges: Seq[(String, String)]): Seq[String] =
    docs(text).select(Bpe.encode(col("text"), merges).as("p"))
      .head().getSeq[String](0)

  test("greedy left-to-right within a pass: 'aaaa' under (a,a) is [aa, aa]") {
    assert(pieces("aaaa", Seq(("a", "a"))) === Seq("aa", "aa"))
    assert(pieces("aaa", Seq(("a", "a"))) === Seq("aa", "a"))
  }

  test("merges apply in adoption order, NOT lowest-rank-first re-ranking") {
    // Merge 1 (ab, c) sees no 'ab' symbol yet; merge 2 (a, b) then fuses.
    // Rank-based encode would revisit merge 1 after merge 2 and emit
    // [abc] — the library's sequential semantics (and its oracles) say
    // [ab, c].
    assert(pieces("abc", Seq(("ab", "c"), ("a", "b"))) === Seq("ab", "c"))
    // The reverse order DOES compose: (a,b) then (ab,c).
    assert(pieces("abc", Seq(("a", "b"), ("ab", "c"))) === Seq("abc"))
  }

  test("whole-document pass: lowercasing, whitespace runs, word boundaries") {
    // Merges never cross word boundaries; tokenization is the package
    // tokenizer (lowercase, ASCII-whitespace runs, empties dropped).
    assert(pieces("Ab  cd\n\tab", Seq(("a", "b"))) ===
      Seq("ab", "c", "d", "ab"))
    assert(pieces("   ", Seq(("a", "b"))) === Seq.empty)
    assert(pieces("", Seq(("a", "b"))) === Seq.empty)
  }

  test("null text yields null; empty merge list yields character pieces") {
    import spark.implicits._
    val row = Seq[(String)](null.asInstanceOf[String]).toDF("text")
      .select(Bpe.encode(col("text"), Seq(("a", "b"))).as("p")).head()
    assert(row.isNullAt(0))
    assert(pieces("abc", Seq.empty) === Seq("a", "b", "c"))
  }

  test("malformed merge tables fail fast") {
    val e1 = intercept[Exception] {
      docs("abc").select(org.apache.spark.sql.graft.GraftSqlBridge.column(
        BpeEncode(
          org.apache.spark.sql.graft.GraftSqlBridge.expression(col("text")),
          org.apache.spark.sql.graft.GraftSqlBridge.expression(
            typedLit(Seq(Seq("a", "b", "c")))))).as("p")).collect()
    }
    assert(e1.getMessage.contains("exactly [sym_a, sym_b]") ||
      Option(e1.getCause).exists(_.getMessage.contains("exactly [sym_a, sym_b]")))
  }

  test("non-foldable merge column takes the per-row parse path and agrees") {
    import spark.implicits._
    // Merge table carried IN the data: "a,b;ab,c" per row.
    val df = Seq(("abc abd", "a,b;ab,c"), ("abc", "b,c")).toDF("text", "mspec")
      .select(col("text"),
        transform(split(col("mspec"), ";"), s => split(s, ",")).as("merges"))
    val bridge = org.apache.spark.sql.graft.GraftSqlBridge
    val got = df.select(bridge.column(BpeEncode(
        bridge.expression(col("text")), bridge.expression(col("merges")))).as("p"))
      .collect().map(_.getSeq[String](0).toList).toList
    assert(got === List(List("abc", "ab", "d"), List("a", "bc")))
  }

  test("SQL registration: bpe_encode callable from SparkSQL") {
    graft.GraftFunctionRegistry.registerFunctions(spark)
    val got = spark.sql(
      "SELECT bpe_encode('abab cd', array(array('a','b'), array('ab','ab'))) AS p")
      .head().getSeq[String](0)
    assert(got === Seq("abab", "c", "d"))
  }

  test("fuzz: kernel piece histogram equals the fold-based vocabulary application") {
    val rnd = new scala.util.Random(41)
    for (trial <- 0 until 4) {
      val corpus = (0 until 30).map { _ =>
        (0 until (1 + rnd.nextInt(8))).map { _ =>
          (0 until (1 + rnd.nextInt(5))).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
        }.mkString(" ")
      }
      val d = docs(corpus: _*)
      val learned = Bpe.learnMerges(d, nMerges = 1 + trial)
        .orderBy("round").collect().map(r => (r.getString(1), r.getString(2))).toSeq
      val viaKernel = d.select(explode(Bpe.encode(col("text"), learned)).as("piece"))
        .groupBy("piece").agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      val viaFold = Bpe.pieceHistogram(d, learned)
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(viaKernel === viaFold, s"trial $trial, merges=$learned")
    }
  }
}
