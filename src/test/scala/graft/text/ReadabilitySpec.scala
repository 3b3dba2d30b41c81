package graft.text

import graft.text.TextAnalysis._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ReadabilitySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-readability-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def one(text: String): DataFrame = {
    import spark.implicits._
    Seq(text).toDF("text")
  }

  test("readability stats on crafted documents") {
    // "The cat sat." — 3 words; vowel groups: the→1, cat→1, "sat."→1;
    // one [.!?]+ run.
    val r1 = one("The cat sat.")
      .select(readabilityStats(col("text")).as("r")).select(col("r.*")).head()
    assert((r1.getInt(0), r1.getInt(1), r1.getInt(2)) === ((3, 3, 1)))
    // Vowel GROUPS, not vowels: "queue" → [ueue] = 1 group... no: q-u-e-u-e
    // is one maximal run "ueue" → 1. "beautiful" → eau, i, u → 3.
    // "rhythm" has y → 1. "xyzzy" → y, y → 2. "grrr" → 0 runs → floor 1.
    val r2 = one("queue beautiful rhythm xyzzy grrr")
      .select(readabilityStats(col("text")).as("r")).select(col("r.*")).head()
    assert((r2.getInt(0), r2.getInt(1), r2.getInt(2)) === ((5, 1 + 3 + 1 + 2 + 1, 1)))
    // Sentence runs: "a. b! c?? d..." → 4 maximal [.!?]+ runs; "?!" mixed
    // is ONE run. Case-insensitive vowels: "AEIOU BCD" → 1 + 1.
    val r3 = one("a. b! c?? d...")
      .select(readabilityStats(col("text")).as("r")).select(col("r.*")).head()
    assert(r3.getInt(2) === 4)
    val r4 = one("It works?! Yes")
      .select(readabilityStats(col("text")).as("r")).select(col("r.*")).head()
    assert(r4.getInt(2) === 1, "?! mixed marks are ONE maximal run")
    val r5 = one("AEIOU BCD")
      .select(readabilityStats(col("text")).as("r")).select(col("r.*")).head()
    assert((r5.getInt(0), r5.getInt(1)) === ((2, 2)))
    // Mark-free text floors sentences at 1; empty text floors too.
    val r6 = one("no marks here")
      .select(readabilityStats(col("text")).as("r")).select(col("r.*")).head()
    assert(r6.getInt(2) === 1)
    val r7 = one("")
      .select(readabilityStats(col("text")).as("r")).select(col("r.*")).head()
    assert((r7.getInt(0), r7.getInt(1), r7.getInt(2)) === ((0, 0, 1)))
  }

  test("kernel equals the composed tokenize-and-regex form on corpus + edge cases") {
    import spark.implicits._
    val edge = Seq(
      "", " ", "\t\n\f\r", "a", "Y", " a.b ", "a . b", "?!.",
      "héllo wörld", "ümlaut ÜMLAUT", "漢字 テスト 漢字", "naïve café",
      "a-b_c d'e", "x" * 500, "The quick brown fox! 42 times. Done?",
      "multi.dot...runs!?mixed", "crwth tsktsk", "AEIOUY aeiouy").toDF("text")
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("text"))
    for (df <- Seq(edge, corpus)) {
      val mismatch = df
        .select(readabilityStats(col("text")).as("k"),
          TextAnalysis.readabilityStatsComposed(col("text")).as("c"))
        .filter(col("k.n_words") =!= col("c.n_words") ||
          col("k.n_syllables") =!= col("c.n_syllables") ||
          col("k.n_sentences") =!= col("c.n_sentences"))
        .count()
      assert(mismatch === 0L)
    }
    // Null flows through as null.
    val n = Seq[Option[String]](None, Some("a b"))
      .toDF("text").select(readabilityStats(col("text")))
      .collect().map(_.isNullAt(0))
    assert(n.toSeq === Seq(true, false))
  }

  test("non-ASCII characters break vowel runs exactly like the per-token regex") {
    // "naïve": n-a-ï-v-e → the ï splits a/e into separate ASCII vowel
    // runs: [a], [e] → 2 groups (the regex on the raw token sees the
    // same, since ï is not in [aeiouy]).
    val r = one("naïve")
      .select(readabilityStats(col("text")).as("r")).select(col("r.*")).head()
    assert(r.getInt(1) === 2)
  }
}
