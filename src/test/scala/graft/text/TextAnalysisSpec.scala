package graft.text

import graft.text.TextAnalysis._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextAnalysisSpec extends AnyFunSuite with graft.testutil.OpenStreamLeakCheck {

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

  test("repetition stats on a crafted document") {
    // 5 lines: "ab cd", "ab cd", "", "xy", "" → "ab cd" dup (2 occ, 10 chars),
    // "" dup (2 occ, 0 chars). Tokens: ab cd ab cd xy → bigrams:
    // "ab cd"×2, "cd ab"×1, "cd xy"×1 → 4 bigrams, top 2.
    val text = "ab cd\nab cd\n\nxy\n"
    val r = one(text)
      .select(repetitionStats(col("text")).as("r")).select(col("r.*")).head()
    assert(r.getInt(0) === 5)  // n_lines (trailing empty field counts)
    assert(r.getInt(1) === 4)  // dup_lines: 2×"ab cd" + 2×""
    assert(r.getInt(2) === 10) // dup_line_chars
    assert(r.getInt(3) === 4)  // n_bigrams
    assert(r.getInt(4) === 2)  // top_bigram
    assert(r.getInt(5) === 5)  // n_tokens: ab cd ab cd xy
    assert(r.getInt(6) === 3)  // n_distinct_tokens: ab, cd, xy
  }

  test("repetition stats edge cases: empty text, single token") {
    val empty = one("").select(repetitionStats(col("text")).as("r")).select(col("r.*")).head()
    assert(empty.getInt(0) === 1) // one empty line
    assert(empty.getInt(1) === 0)
    assert(empty.getInt(3) === 0)
    assert(empty.getInt(4) === 0)
    val single = one("word").select(repetitionStats(col("text")).as("r")).select(col("r.*")).head()
    assert(single.getInt(0) === 1)
    assert(single.getInt(3) === 0) // no bigram from one token
  }

  test("ngram repetition stats equal a plain-Scala brute force at n = 1, 2, 3, 5") {
    val docs = Seq(
      "a b a b a b",                    // heavy bigram/trigram repetition
      "one two three four five",       // all grams unique
      "x",                             // fewer tokens than most n
      "",                              // no tokens at all
      "Tab\tsep  and\nnewline mixed Tab\tsep", // whitespace variety + case
      "zz aa zz aa zz bb zz aa")       // tie-break candidates at n=2
    def brute(text: String, n: Int): (Int, Int, Int, Int, Int) = {
      val toks = text.toLowerCase.split("[ \t\n\f\r]+").filter(_.nonEmpty).toSeq
      val grams = toks.sliding(n).filter(_.size == n).map(_.mkString(" ")).toSeq
      val counts = grams.groupBy(identity).view.mapValues(_.size).toMap
      val top = counts.toSeq
        .sortBy { case (g, c) => (-c, g.getBytes("UTF-8").map(_ & 0xff).toSeq
          .map(b => f"$b%02x").mkString) }
        .headOption
      val dup = counts.filter(_._2 >= 2)
      (grams.size,
        top.map(_._2).getOrElse(0),
        top.map { case (g, c) => c * g.codePointCount(0, g.length) }.getOrElse(0),
        dup.values.sum,
        dup.map { case (g, c) => c * g.codePointCount(0, g.length) }.sum)
    }
    for (n <- Seq(1, 2, 3, 5); text <- docs) {
      val r = one(text)
        .select(ngramRepetitionStats(col("text"), n).as("r")).select(col("r.*")).head()
      val expected = brute(text, n)
      assert((r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))
        === expected, s"n=$n text=${text.take(30)}")
    }
  }

  test("ngram repetition top-gram ties break to the byte-wise smallest gram") {
    // Both "b a" and "a b" occur twice; "a b" is byte-smaller, so
    // top_ngram_chars must come from it (same length here — use grams of
    // DIFFERENT lengths to make the choice observable).
    // "cc dd" ×2 and "e f" ×2 tie on count; "cc dd" < "e f" byte-wise,
    // so chars = 2 × 5 = 10, not 2 × 3 = 6.
    val r = one("cc dd x cc dd y e f z e f")
      .select(ngramRepetitionStats(col("text"), 2).as("r")).select(col("r.*")).head()
    assert(r.getInt(1) === 2)
    assert(r.getInt(2) === 10)
  }

  test("ngram repetition rejects n < 1") {
    intercept[IllegalArgumentException] {
      graft.text.NgramRepetitionStats(
        org.apache.spark.sql.catalyst.expressions.Literal("x"), 0)
    }
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

  test("BPE pretokenizer: contractions, space-prefixed runs, punctuation") {
    // "don't stop, it's 42 tokens" splits at the contraction boundary,
    // keeps the leading space on every interior piece (the GPT-2 space-
    // prefix convention), and groups punctuation runs.
    val pieces = one("don't stop, it's 42 tokens!!")
      .select(bpePieces(col("text"))).head().getSeq[String](0)
    assert(pieces === Seq("don", "'t", " stop", ",", " it", "'s", " 42", " tokens", "!!"))
    val n = one("don't stop, it's 42 tokens!!")
      .select(bpePieceCount(col("text"))).head().getInt(0)
    assert(n === 9)
    // Pieces partition the text exactly (nothing skipped, nothing doubled):
    // every character class has an alternative, so concat(pieces) == text.
    assert(pieces.mkString === "don't stop, it's 42 tokens!!")
    // Empty text → zero pieces.
    assert(one("").select(bpePieceCount(col("text"))).head().getInt(0) === 0)
  }

  test("rolling fingerprint: reference values, composition, and normalization") {
    import spark.implicits._
    // Matches a by-hand Horner evaluation over UTF-8 bytes.
    def ref(s: String): Long =
      s.getBytes("UTF-8").foldLeft(0L)((h, b) => h * 257L + (b & 0xFF))
    val out = Seq("abc", "héllo wörld", "").toDF("text")
      .select(rollingFingerprint(col("text"))).collect().map(_.getLong(0))
    assert(out(0) === ref("abc"))
    assert(out(1) === ref("héllo wörld"))
    assert(out(2) === 0L)

    // Whitespace/case normalization folds like the md5 fingerprint.
    val same = Seq("Hello   World", "hello world").toDF("text")
      .select(rollingFingerprint(col("text"))).collect().map(_.getLong(0))
    assert(same(0) === same(1))

    // Chunk fingerprints compose: h(a ++ b) = h(a) * B^|b| + h(b).
    val a = "the quick brown fox "
    val b = "jumps over the lazy dog"
    val whole = ref(a + b)
    val combined = RollingHash64.combine(ref(a), ref(b), b.getBytes("UTF-8").length.toLong)
    assert(combined === whole)
  }

  test("fused TextStats kernel equals the composed builders on corpus + edge cases") {
    import spark.implicits._
    val edge = Seq(
      "", " ", "\t\n", "a", "abc123!?", "héllo wörld héllo",
      "  the   the the  ", "123 456 123", "ümlaut ÜMLAUT", "a-b a-b c.d",
      "x" * 500, "the quick brown fox! 42 times.").toDF("text")
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("text"))
    for (df <- Seq(edge, corpus)) {
      val langs = Stopwords.ByLanguage
      val composed = df.select(
        (qualitySignals(col("text")).map { case (n, c) => c.as(n) } :+
          languageGuess(col("text")).as("guessed")): _*)
      val fused = df
        .select(textStats(col("text"), langs.map(_._2)).as("st"))
        .select(
          col("st.n_chars").as("n_chars"),
          col("st.n_tokens").as("n_tokens"),
          col("st.n_distinct_tokens").as("n_distinct_tokens"),
          col("st.n_subtokens").as("n_subtokens"),
          col("st.n_alpha_chars").as("n_alpha_chars"),
          col("st.n_punct_chars").as("n_punct_chars"),
          col("st.stopword_hits").getItem(0).as("n_stopword_tokens"),
          col("st.max_token_len").as("max_token_len"),
          col("st.stopword_hits").as("hits"))
        .select(col("*"),
          array_max(array(langs.zipWithIndex.map { case ((lang, _), i) =>
            struct(col("hits").getItem(i).as("hits"),
              lit(langs.size - i).as("pref"), lit(lang).as("lang"))
          }: _*)).getField("lang").as("guessed"))
        .drop("hits")
      val a = composed.collect().map(_.toSeq).toSeq
      val b = fused.collect().map(_.toSeq).toSeq
      assert(a === b)
    }
  }

  test("TokenCount kernel equals the composed size(tokens) on corpus + edge cases") {
    import spark.implicits._
    val edge = Seq(
      "", " ", "\t\n\f\r", "a", " a", "a ", "  a   b  c ",
      "héllo wörld", "ümlaut ÜMLAUT", "漢字 テスト 漢字", "a b",
      "x" * 500, "the quick brown fox! 42 times.").toDF("text")
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("text"))
    for (df <- Seq(edge, corpus)) {
      val mismatch = df.select(tokenCount(col("text")).as("k"),
        TextAnalysis.tokenCountComposed(col("text")).as("c"))
        .filter(col("k") =!= col("c")).count()
      assert(mismatch === 0L)
    }
    // Null flows through as null, like the composed form.
    val n = Seq[Option[String]](None, Some("a b")).toDF("text")
      .select(tokenCount(col("text"))).collect().map(r =>
        if (r.isNullAt(0)) -1 else r.getInt(0))
    assert(n.toSeq === Seq(-1, 2))
  }

  test("tokensPrefix equals slice(tokens, 1, k) at every boundary shape") {
    import spark.implicits._
    val texts = Seq(
      "", " ", "a", " a b c d e ", "a b", "a b c", "a b c d",
      "ONE two THREE four", "  lead  and   trail  ", "x" * 80,
      "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10 t11 t12").toDF("text")
    for (k <- Seq(1, 2, 3, 5, 16)) {
      val mismatch = texts.select(
        TextAnalysis.tokensPrefix(col("text"), k).as("p"),
        slice(tokens(col("text")), 1, k).as("s"))
        .filter(not(col("p") <=> col("s"))).count()
      assert(mismatch === 0L, s"prefix tokenizer diverges at k=$k")
    }
    // The bounded size still decides >= depth eligibility below the bound.
    val sizes = texts.select(size(
      TextAnalysis.tokensPrefix(col("text"), 3)).as("z"),
      least(size(tokens(col("text"))), lit(3)).as("m"))
      .filter(col("z") =!= col("m")).count()
    assert(sizes === 0L)
  }

  test("linear quality score equals a plain-Scala MD5 brute force; empty text scores 0") {
    // Same weight rule re-derived with java.security MessageDigest: the
    // token's md5 first-8-bytes big-endian long, masked to the low 11
    // bits, shifted to [-1024, 1024).
    def weight(t: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8"))
      val h = (0 until 8).foldLeft(0L)((acc, i) => (acc << 8) | (d(i) & 0xffL))
      (h & (QualityBuckets - 1L)) - QualityBuckets / 2L
    }
    def brute(text: String): Long =
      text.toLowerCase.split("\\s+").filter(_.nonEmpty).map(weight).sum
    val docs = Seq(
      "The quick brown Fox", "the the the", "", "   \t\n  ",
      "unicode tökens äre fine", "x")
    import spark.implicits._
    val got = docs.toDF("text")
      .select(linearQualityScore(col("text")).as("s"))
      .collect().map(_.getLong(0)).toSeq
    assert(got === docs.map(brute))
    assert(brute("") == 0L && brute("   \t\n  ") == 0L)
    // The rule is non-constant on this corpus — the filter actually filters.
    assert(got.distinct.size > 1)
  }

  test("quality-score weight seam: identity table equals the default; custom table equals brute force") {
    import spark.implicits._
    val docs = Seq("The quick brown Fox", "the the the", "", "mixed 123 tokens!",
      "unicode tökens äre fine")
    val df = docs.toDF("text")
    // The default scorer IS the overload applied to bucket -> bucket - 1024.
    val identity = (0 until QualityBuckets).map(b => (b - QualityBuckets / 2).toLong)
    val both = df.select(
      linearQualityScore(col("text")).as("a"),
      linearQualityScore(col("text"), identity).as("b")).collect()
    assert(both.forall(r => r.getLong(0) == r.getLong(1)))

    // A non-trivial table (bucket*7 mod 41 - 20) against plain Scala.
    val table = (0 until QualityBuckets).map(b => ((b * 7) % 41 - 20).toLong)
    def bucket(t: String): Int = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8"))
      val h = (0 until 8).foldLeft(0L)((acc, i) => (acc << 8) | (d(i) & 0xffL))
      (h & (QualityBuckets - 1L)).toInt
    }
    def brute(text: String): Long =
      text.toLowerCase.split("\\s+").filter(_.nonEmpty).map(t => table(bucket(t))).sum
    val got = df.select(linearQualityScore(col("text"), table).as("s"))
      .collect().map(_.getLong(0)).toSeq
    assert(got === docs.map(brute))
    // A wrong-sized table fails loudly, not with silent misindexing.
    intercept[IllegalArgumentException] {
      linearQualityScore(col("text"), Seq(1L, 2L, 3L))
    }
  }

  test("wordNgramsExplode generator matches the Column formulation, handles edges") {
    import spark.implicits._
    val docs = Seq(
      (1L, "The quick  brown\tfox jumps"),
      (2L, "  leading and trailing  "),
      (3L, "one two"),          // shorter than n=3 → no grams
      (4L, ""),                 // empty → no grams
      (5L, "a b c d"))
    val df = docs.toDF("doc_id", "text")
      .union(Seq((6L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    val gen = df.select(col("doc_id"), wordNgramsExplode(col("text"), 3).as("ngram"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted
    // Column restatement: explode over a transform of the token array.
    val colForm = df
      .select(col("doc_id"), tokens(col("text")).as("t"))
      .select(col("doc_id"), explode(when(size(col("t")) >= 3,
        transform(sequence(lit(0), size(col("t")) - 3),
          i => concat_ws(" ", element_at(col("t"), i + 1),
            element_at(col("t"), i + 2), element_at(col("t"), i + 3))))
        .otherwise(array())).as("ngram"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted
    assert(gen === colForm)
    assert(gen.count(_._1 == 1L) === 3)
    assert(gen.filter(_._1 == 2L).map(_._2).toSeq === Seq("leading and trailing"))
    assert(gen.filter(_._1 == 5L).map(_._2).toSeq === Seq("a b c", "b c d"))
    // Short, empty, and null docs produce no rows (not null rows).
    assert(!gen.exists(t => Set(3L, 4L, 6L).contains(t._1)))
    // SQL surface through the session-extension registration — both the
    // projection form and the LATERAL VIEW form a generator must support.
    graft.GraftFunctionRegistry.registerFunctions(spark)
    df.createOrReplaceTempView("wng_docs")
    val viaSql = spark.sql(
      "SELECT doc_id, word_ngrams_explode(text, 3) AS ngram FROM wng_docs")
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted
    assert(viaSql === gen)
    val viaLateral = spark.sql(
      "SELECT doc_id, g.ngram FROM wng_docs " +
        "LATERAL VIEW word_ngrams_explode(text, 3) g AS ngram")
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted
    assert(viaLateral === gen)
  }

  test("FIM spans: eligibility gate, span invariants, content fingerprint, determinism") {
    import spark.implicits._
    val texts = Seq(
      1L -> ("x" * 31),                      // below the 32-char gate
      2L -> ("The quick brown fox jumps over the lazy dog again."),
      3L -> ("a" * 32),                      // exactly at the gate
      4L -> ("Line one.\nLine two with more text.\nLine three ends here."))
    val df = texts.toDF("doc_id", "text")
    def run() = TextAnalysis.fimSpans(df, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap

    val spans = run()
    // Doc 1 is dropped by the gate; everything else splits.
    assert(spans.keySet === Set(2L, 3L, 4L))
    val byId = texts.toMap
    spans.foreach { case (id, (pre, mid, suf, fp)) =>
      val text = byId(id)
      val L = text.length.toLong
      assert(pre >= 0L && suf >= 0L, s"doc $id: negative affix")
      assert(mid >= 1L && mid <= L / 4, s"doc $id: mid_len $mid out of [1, L/4]")
      assert(pre + mid + suf === L, s"doc $id: lengths must partition the doc")
      // The fingerprint is md5 of EXACTLY the selected middle substring.
      val expected = java.security.MessageDigest.getInstance("MD5")
        .digest(text.substring(pre.toInt, (pre + mid).toInt)
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .map("%02x".format(_)).mkString
      assert(fp === expected, s"doc $id: middle fingerprint mismatch")
    }
    // Deterministic: a second evaluation selects bit-identical spans.
    assert(run() === spans)
  }

  test("languageGuessFromHits over textStats equals the composed languageGuess") {
    import spark.implicits._
    val texts = Seq(
      "the quick brown fox and the lazy dog of the field",
      "der hund und die katze sind nicht im haus",
      "el perro y el gato en la casa de la madre",
      "le chien et le chat dans la maison de la mer",
      "zzz qqq 123", "", "und the la le und the")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val fused = df
      .select(org.apache.spark.sql.functions.col("id"),
        TextAnalysis.textStats(org.apache.spark.sql.functions.col("text"),
          TextAnalysis.languageHitLists).as("st"))
      .select(org.apache.spark.sql.functions.col("id"),
        TextAnalysis.languageGuessFromHits(
          org.apache.spark.sql.functions.col("st.stopword_hits")).as("g"))
      .orderBy("id").collect().map(_.getString(1)).toSeq
    val composed = df
      .select(org.apache.spark.sql.functions.col("id"),
        TextAnalysis.languageGuess(org.apache.spark.sql.functions.col("text")).as("g"))
      .orderBy("id").collect().map(_.getString(1)).toSeq
    assert(fused === composed)
  }
}
