package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Text-analysis column builders for large-scale corpus curation: token
 * statistics, quality signals, language scoring, and fingerprinting.
 *
 * Everything here composes Spark built-ins (codegen'd, no UDFs), is a pure
 * per-row projection (no shuffle — scales linearly with the scan), and is
 * deliberately expressible in portable SQL so results can be audited by any
 * engine reading the same files.
 */
object TextAnalysis {

  /** Whitespace tokens, lowercased, empties dropped. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => t =!= "")

  /** Token count (whitespace segmentation) — the [[TokenCount]] kernel:
   * one byte loop inside whole-stage codegen, value-equal to
   * `size(tokens(text))` (spec-pinned) without materializing the token
   * array. */
  def tokenCount(text: Column): Column =
    org.apache.spark.sql.graft.GraftSqlBridge.column(
      TokenCount(org.apache.spark.sql.graft.GraftSqlBridge.expression(text)))

  /** The composed-builtins token count — the definitional reference
   * [[tokenCount]]'s kernel is spec-pinned against. */
  private[graft] def tokenCountComposed(text: Column): Column =
    size(tokens(text))

  /** The first `k` whitespace tokens, lowercased — value-equal to
   * `slice(tokens(text), 1, k)` (spec-pinned) but the split STOPS after
   * the k-th boundary (split-with-limit), so the cost is the
   * token-prefix regex scan plus one remainder copy instead of a
   * full-document tokenize with every token materialized. For
   * prefix-shaped consumers (prompt-cache keys, leading-token
   * signatures) over long documents this is the difference between
   * O(prefix) and O(document) regex work per row. */
  def tokensPrefix(text: Column, k: Int): Column = {
    require(k >= 1, s"token prefix length must be positive, got $k")
    // limit = k + 2: a remainder element (possibly containing whitespace)
    // exists only when the limit was fully reached, i.e. the array holds
    // one possible leading empty plus ≥ k clean tokens ahead of it — so
    // after dropping empties the remainder sits at position ≥ k + 1 and
    // the slice can never expose it. ONE split reference (a `when` on
    // size would re-evaluate the split per reference — the q64 cliff).
    slice(filter(split(lower(text), "\\s+", k + 2), t => t =!= ""), 1, k)
  }

  /** BPE-style subword segment count: runs of letters, runs of digits, and
   * individual non-alphanumeric marks each count as one segment — a cheap,
   * deterministic proxy for tokenizer load. */
  def subtokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))

  /** GPT-2-family pretokenization pattern, restricted to the regex subset
   * Java and RE2 share: contraction suffixes, space-prefixed letter runs,
   * space-prefixed digit runs, space-prefixed punctuation runs, residual
   * whitespace. The upstream pattern's trailing-space lookahead is dropped
   * (RE2 has no lookahead) — both engines then split identically, which is
   * what makes per-document token budgets auditable off-Spark. The subword
   * merge table is a model artifact; the pretokenizer is what fixes
   * sequence-length accounting. */
  val BpePretokenPattern: String =
    "'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+|\\s+"

  /** Pretokenizer piece list (the unit LLM token budgets count). */
  def bpePieces(text: Column): Column =
    regexp_extract_all(text, lit(BpePretokenPattern), lit(0))

  /** Pretokenizer piece count — the training-pipeline "token count". */
  def bpePieceCount(text: Column): Column = size(bpePieces(text))

  /** How many tokens appear in `words` (multiset count, not distinct). */
  def tokenHits(text: Column, words: Seq[String]): Column = {
    val set = words.map(lit(_))
    size(filter(tokens(text), t => t.isin(set: _*)))
  }

  /** Count of ASCII letters in the lowercased text. */
  def alphaCharCount(text: Column): Column =
    length(regexp_replace(lower(text), "[^a-z]", ""))

  /** Count of punctuation marks. */
  def punctCharCount(text: Column): Column =
    length(regexp_replace(text, "[^.,;:!?'\"()-]", ""))

  /** Integer quality signals for downstream filtering. Ratios are left to
   * the consumer: integers compare exactly across engines, floats don't. */
  def qualitySignals(text: Column): Seq[(String, Column)] = Seq(
    "n_chars" -> length(text),
    "n_tokens" -> tokenCount(text),
    "n_distinct_tokens" -> size(array_distinct(tokens(text))),
    "n_subtokens" -> subtokenCount(text),
    "n_alpha_chars" -> alphaCharCount(text),
    "n_punct_chars" -> punctCharCount(text),
    "n_stopword_tokens" -> tokenHits(text, Stopwords.English),
    "max_token_len" -> array_max(transform(tokens(text), t => length(t)))
  )

  /** All of [[qualitySignals]] (plus per-language stopword hits) in ONE
   * kernel pass — see [[TextStats]]. Returns a struct column; select fields
   * in a SEPARATE projection step so the kernel evaluates once (Catalyst's
   * CollapseProject will not duplicate a non-cheap expression). */
  def textStats(text: Column,
      stopwordLists: Seq[Seq[String]] = Seq(Stopwords.English)): Column =
    org.apache.spark.sql.graft.GraftSqlBridge.column(
      TextStats(org.apache.spark.sql.graft.GraftSqlBridge.expression(text), stopwordLists))

  /** Readability inputs (word / vowel-group-syllable / sentence counts)
   * in one kernel pass — see [[ReadabilityStats]]. Integer struct fields;
   * the classic formulas (Flesch–Kincaid grade = 0.39·W/T + 11.8·Y/W −
   * 15.59, …) have rational coefficients, so callers derive them as exact
   * integer pairs: fk_num = 39·W² + 1180·Y·T − 1559·W·T over
   * fk_den = 100·W·T. */
  def readabilityStats(text: Column): Column =
    org.apache.spark.sql.graft.GraftSqlBridge.column(
      ReadabilityStats(org.apache.spark.sql.graft.GraftSqlBridge.expression(text)))

  /** The composed (tokenize + per-token regex) form of
   * [[readabilityStats]] — the portable definition the kernel is
   * spec-pinned against. Per-token regexes inside the lambda are the
   * exact reason the kernel exists; never put this on a hot path. */
  private[graft] def readabilityStatsComposed(text: Column): Column = {
    val ts = tokens(text)
    struct(
      size(ts).as("n_words"),
      aggregate(ts, lit(0), (acc, t) =>
        acc + greatest(lit(1), size(regexp_extract_all(t, lit("[aeiouy]+"), lit(0))))
      ).as("n_syllables"),
      greatest(lit(1), size(regexp_extract_all(text, lit("[.!?]+"), lit(0))))
        .as("n_sentences"))
  }

  /** Within-document repetition signals (duplicate-line and top-bigram
   * counts) for boilerplate/degenerate-text filtering — see
   * [[RepetitionStats]]. Integer struct fields; derive fractions (e.g.
   * `dup_line_chars / n_chars`) downstream. */
  def repetitionStats(text: Column): Column =
    org.apache.spark.sql.graft.GraftSqlBridge.column(
      RepetitionStats(org.apache.spark.sql.graft.GraftSqlBridge.expression(text)))

  /** GENERATOR column: one output row per word n-gram of `text`, in
   * document order — use in a `select` like `explode(...)`. Streams grams
   * through GenerateExec instead of materializing the per-document gram
   * array — see [[WordNgramsExplode]]. */
  def wordNgramsExplode(text: Column, n: Int): Column =
    org.apache.spark.sql.graft.GraftSqlBridge.column(
      WordNgramsExplode(org.apache.spark.sql.graft.GraftSqlBridge.expression(text), n))

  /** Word-n-gram repetition signals (Gopher-family quality filters):
   * top-gram and duplicated-gram occurrence/char counts — see
   * [[NgramRepetitionStats]]. Integer struct fields; derive the paper's
   * fractions (e.g. `dup_ngram_chars / n_chars`) downstream. */
  def ngramRepetitionStats(text: Column, n: Int): Column =
    org.apache.spark.sql.graft.GraftSqlBridge.column(
      NgramRepetitionStats(org.apache.spark.sql.graft.GraftSqlBridge.expression(text), n))

  /** Content fingerprint: MD5 of whitespace-normalized, lowercased text.
   * Stable across engines (DuckDB, Trino, Postgres all agree on md5-of-utf8),
   * which makes fingerprint-based dedup auditable off-Spark. */
  def fingerprint(text: Column): Column =
    md5(normalized(text).cast("binary"))

  /** Rolling (Rabin–Karp) fingerprint of the normalized text — chunk
   * fingerprints compose into whole-document fingerprints without
   * re-reading; see [[RollingHash64]]. */
  def rollingFingerprint(text: Column): Column =
    org.apache.spark.sql.graft.GraftSqlBridge.column(
      RollingHash64(org.apache.spark.sql.graft.GraftSqlBridge.expression(normalized(text))))

  def normalized(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Best-guess language by stopword evidence: the language whose stopword
   * list hits the most tokens; earlier entry wins ties. Heuristic n-gram /
   * stopword language ID — cheap enough to run over every document. */
  def languageGuess(text: Column): Column = {
    // argmax by (hits, preference order): array_max on structs compares
    // fields in order, so put hits first and break ties by reverse position.
    val withPref = Stopwords.ByLanguage.zipWithIndex.map { case ((lang, words), i) =>
      struct(tokenHits(text, words).as("hits"),
        lit(Stopwords.ByLanguage.size - i).as("pref"), lit(lang).as("lang"))
    }
    array_max(array(withPref: _*)).getField("lang")
  }

  /** [[languageGuess]] over PRE-COMPUTED stopword hits — the fused form:
   * each [[languageGuess]] call tokenizes once PER LANGUAGE, where
   * `textStats(text, Stopwords.ByLanguage.map(_._2))` computes every
   * list's hits in its one kernel pass. Pass that struct's
   * `stopword_hits` here (bound to a column in its OWN projection — the
   * textStats contract) for the identical argmax and (hits, preference)
   * tie order. */
  def languageGuessFromHits(hits: Column): Column =
    array_max(array(Stopwords.ByLanguage.zipWithIndex.map { case ((lang, _), i) =>
      struct(hits.getItem(i).as("hits"),
        lit(Stopwords.ByLanguage.size - i).as("pref"), lit(lang).as("lang"))
    }: _*)).getField("lang")

  /** The [[textStats]] stopword-list argument matching
   * [[languageGuessFromHits]]'s index order. */
  def languageHitLists: Seq[Seq[String]] = Stopwords.ByLanguage.map(_._2)

  /** Bucket count for [[linearQualityScore]] — a power of two, so the
   * signed Spark md5-64 and an unsigned engine's UBIGINT hash agree on
   * the masked low bits (the q79/q15 portability rule). */
  val QualityBuckets = 2048

  /** Hash-bucketed token weight for the linear scorer: an integer in
   * [-1024, 1024) derived from the token's md5-64 low bits. */
  def tokenQualityWeight(t: Column): Column =
    md5Hash64Bucket(t) - lit(QualityBuckets / 2L)

  /** Hashed bag-of-words linear score — the model-based quality-filter
   * stage of a training-data pipeline (the role a fastText classifier
   * plays in CCNet/RefinedWeb-style curation), with the trained weight
   * table replaced by a deterministic stand-in: each token scores
   * [[tokenQualityWeight]], a hash-bucketed integer weight. The plumbing
   * is the production shape and is what this operator pins down: ONE
   * codegen'd map pass over the corpus (tokenize → weight → accumulate,
   * no explode, no join, nothing shuffles), and exact 64-bit integer
   * accumulation, so the score is order-independent and engine-exact —
   * no float summation ever crosses an engine boundary. Swapping in real
   * trained weights is one expression change: `element_at` on a
   * [[QualityBuckets]]-sized literal int array (plan-embedded ≈
   * broadcast) over the same masked bucket id. Empty/token-free text
   * scores 0.
   */
  def linearQualityScore(text: Column): Column =
    org.apache.spark.sql.graft.GraftSqlBridge.column(
      QualityScore64(org.apache.spark.sql.graft.GraftSqlBridge.expression(text)))

  /** The trained-weights seam of [[linearQualityScore]] made literal: the
   * same tokenize → bucket → accumulate pass, with the weight looked up
   * from a caller-supplied [[QualityBuckets]]-entry table embedded in the
   * plan as a literal array (broadcast-equivalent: k integers ship once
   * with the plan, never shuffle). `linearQualityScore(text)` is exactly
   * this overload applied to the identity table `bucket - 1024` — the
   * equivalence is property-tested, so a swapped-in real model changes
   * only the numbers, not the plumbing. */
  def linearQualityScore(text: Column, weights: Seq[Long]): Column = {
    require(weights.size == QualityBuckets,
      s"weight table must have $QualityBuckets entries, got ${weights.size}")
    val warr = typedLit(weights)
    aggregate(tokens(text), lit(0L), (acc, t) =>
      acc + element_at(warr,
        (md5Hash64Bucket(t) + lit(1L)).cast("int")))
  }

  /** Masked md5-64 bucket id in [0, QualityBuckets) — shared by both
   * scorer paths so they cannot disagree on the feature hash. */
  private def md5Hash64Bucket(t: Column): Column =
    graft.operators.Sampling.md5Hash64(t).bitwiseAND(lit(QualityBuckets - 1L))

  /** Public view of the scorer's feature hash, for trainers that must
   * land updates in exactly the buckets [[linearQualityScore]] reads
   * ([[PerceptronTrainer]]). */
  def tokenBucket(t: Column): Column = md5Hash64Bucket(t)

  /**
   * Deterministic fill-in-the-middle (FIM) span selection — the
   * prefix/middle/suffix split infilling-capable model training applies
   * to a slice of the corpus (PSM/SPM formats; code models especially).
   * Randomized span choice makes the training set irreproducible and the
   * transform unauditable, so this picks each document's middle span from
   * md5-64 draws on the doc id: the same doc splits identically on every
   * run and engine, and any engine with `md5()` re-derives the exact
   * offsets AND content fingerprint (the q191 oracle).
   *
   * Spec over L = char length (the corpus contract is single-byte chars,
   * as in the span-dedup family):
   *   - documents with L < `minChars` are DROPPED (too short to split
   *     usefully — the standard FIM eligibility gate);
   *   - `mid_len` = 1 + h2 mod (L/4), i.e. 1..L/4 — the middle is a
   *     bounded fraction so prefix+suffix retain context;
   *   - `pre_len` = h1 mod (L − mid_len + 1), i.e. 0..L−mid_len — the
   *     span may touch either edge;
   *   - `suf_len` = L − pre_len − mid_len;
   *   - `mid_fp` = md5 of the middle substring — the content receipt a
   *     downstream assembler can check without re-reading the corpus;
   * with h1/h2 the top-63-bit md5-64 of "fim-a:"/"fim-b:" ‖ id (two
   * independent draws; non-negative, so `%` agrees across engines).
   *
   * Scale contract: a pure projection — text is consumed inside the scan
   * stage and only (id, 3 offsets, one 32-hex fingerprint) leave it; zero
   * shuffle, scan-bound at any corpus size.
   */
  def fimSpans(docs: org.apache.spark.sql.DataFrame, idCol: Column,
      textCol: Column, minChars: Int = 32): org.apache.spark.sql.DataFrame = {
    require(minChars >= 4, s"minChars must be >= 4 (mid_len needs L/4 >= 1), got $minChars")
    val h1 = shiftrightunsigned(
      graft.operators.Sampling.md5Hash64(concat(lit("fim-a:"), idCol.cast("string"))), 1)
    val h2 = shiftrightunsigned(
      graft.operators.Sampling.md5Hash64(concat(lit("fim-b:"), idCol.cast("string"))), 1)
    val L = length(textCol).cast("long")
    docs
      .filter(L >= minChars)
      .select(idCol, textCol.as("__fim_text"), L.as("L"),
        // floor-divide in INTEGER domain: Spark's `/` is fractional, and a
        // double modulus of a 2^63-scale draw loses low bits — the exact
        // bits the oracle's `%` keeps. L itself is small, so the quarter
        // is exact; the draw never leaves long arithmetic.
        (h2 % floor(L / 4L).cast("long") + 1L).as("mid_len"), h1.as("h1"))
      .select(idCol, col("__fim_text"), col("L"), col("mid_len"),
        (col("h1") % (col("L") - col("mid_len") + 1L)).as("pre_len"))
      .select(idCol, col("pre_len"), col("mid_len"),
        (col("L") - col("pre_len") - col("mid_len")).as("suf_len"),
        md5(col("__fim_text").substr(
          (col("pre_len") + 1L).cast("int"), col("mid_len").cast("int"))
          .cast("binary")).as("mid_fp"))
  }
}

object Stopwords {
  val English: Seq[String] = Seq("the", "a", "an", "and", "of", "to", "in", "is", "it", "that")
  val German: Seq[String] = Seq("der", "die", "das", "und", "ist", "ein", "eine", "zu", "den", "mit")
  val Spanish: Seq[String] = Seq("el", "la", "los", "las", "y", "es", "un", "una", "de", "que")
  val French: Seq[String] = Seq("le", "la", "les", "et", "est", "un", "une", "de", "du", "que")

  /** Preference order breaks ties (first wins). */
  val ByLanguage: Seq[(String, Seq[String])] = Seq(
    "en" -> English, "de" -> German, "es" -> Spanish, "fr" -> French)
}
