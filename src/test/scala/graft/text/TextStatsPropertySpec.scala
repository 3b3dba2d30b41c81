package graft.text

import graft.text.TextAnalysis._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Property test: the fused TextStats kernel agrees with the composed
 * column builders on arbitrary generated text — including unicode,
 * whitespace runs, digits, and punctuation soup — not just on the crafted
 * cases and the fixture corpus. */
class TextStatsPropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-textprop-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val wordChar = Gen.frequency(
    (8, Gen.alphaLowerChar), (2, Gen.alphaUpperChar), (3, Gen.numChar),
    (2, Gen.oneOf('.', ',', '!', '?', '-', '\'', '(', ')')),
    (2, Gen.oneOf('é', 'ü', 'ß', 'ñ', 'λ', '中', '日')))
  private val ws = Gen.oneOf(" ", "  ", "\t", "\n", " \t ")
  private val word = Gen.chooseNum(1, 12).flatMap(n => Gen.listOfN(n, wordChar).map(_.mkString))
  private val text: Gen[String] = for {
    n <- Gen.chooseNum(0, 25)
    words <- Gen.listOfN(n, word)
    seps <- Gen.listOfN(n + 1, ws)
  } yield seps.zipAll(words, "", "").map { case (s, w) => s + w }.mkString

  test("fused kernel equals composed builders on generated text") {
    import spark.implicits._
    // Collect a deterministic batch of generated strings into ONE DataFrame
    // so the property check costs one Spark job, not hundreds.
    val seed = org.scalacheck.rng.Seed(42L)
    val samples = Iterator.iterate(seed)(_.next)
      .take(300)
      .flatMap(s => text.apply(Gen.Parameters.default, s))
      .toList
    val df = samples.toDF("text")

    val composed = df.select(
      (qualitySignals(col("text")).map { case (n, c) => c.as(n) } :+
        languageGuess(col("text")).as("guessed")): _*).collect().map(_.toSeq)
    val langs = Stopwords.ByLanguage
    val fused = df
      .select(textStats(col("text"), langs.map(_._2)).as("st"))
      .select(
        col("st.n_chars"), col("st.n_tokens"), col("st.n_distinct_tokens"),
        col("st.n_subtokens"), col("st.n_alpha_chars"), col("st.n_punct_chars"),
        col("st.stopword_hits").getItem(0), col("st.max_token_len"),
        col("st.stopword_hits").as("hits"))
      .select(col("*"),
        array_max(array(langs.zipWithIndex.map { case ((lang, _), i) =>
          struct(col("hits").getItem(i).as("hits"),
            lit(langs.size - i).as("pref"), lit(lang).as("lang"))
        }: _*)).getField("lang").as("guessed"))
      .drop("hits")
      .collect().map(_.toSeq)

    composed.zip(fused).zipWithIndex.foreach { case ((a, b), i) =>
      assert(a === b, s"mismatch on input ${samples(i).take(60)}")
    }
  }
}
