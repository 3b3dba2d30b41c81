package graft.text

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** The ASCII `\\s` class Java regexes match — the ONE whitespace
 * definition every text kernel in this package tokenizes by, so the fused
 * kernels, the Column `split(lower(text), "\\\\s+")` tokenizer, and the
 * DuckDB oracles can never drift on what separates tokens. */
private[text] object AsciiWhitespace {
  def is(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
}

/**
 * `text_stats(string)` → struct of all per-document text signals in ONE pass.
 *
 * The composed column builders in [[TextAnalysis]] are correct and portable,
 * but each signal re-tokenizes: `qualitySignals` costs five `split` calls
 * plus three regex scans per document, and `languageGuess` another four — at
 * corpus scale that is the dominant cost of the text-analysis stage. This
 * kernel computes the same values with two linear scans (one over the
 * lowercased text, one implicit in tokenization) and zero regexes.
 *
 * Semantics match the builders exactly (the spec asserts equivalence on a
 * real corpus):
 *  - tokens = maximal runs of non-`\s` chars of the lowercased text
 *    (`\s` = space, \t, \n, \x0B, \f, \r — the Java regex class, NOT
 *    `Character.isWhitespace`);
 *  - subtokens = runs of [a-z] / runs of [0-9] / single other non-`\s` char;
 *  - alpha chars = [a-z] count; punct = `.,;:!?'"()-` count;
 *  - lengths count Unicode code points (Spark `length()` semantics);
 *  - `stopword_hits[i]` = multiset hits of `stopwordLists(i)`;
 *  - `max_token_len` is null for a token-free document.
 */
case class TextStats(child: Expression, stopwordLists: Seq[Seq[String]])
  extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def dataType: DataType = StructType(Seq(
    StructField("n_chars", IntegerType, nullable = false),
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_distinct_tokens", IntegerType, nullable = false),
    StructField("n_subtokens", IntegerType, nullable = false),
    StructField("n_alpha_chars", IntegerType, nullable = false),
    StructField("n_punct_chars", IntegerType, nullable = false),
    StructField("max_token_len", IntegerType, nullable = true),
    StructField("stopword_hits", ArrayType(IntegerType, containsNull = false), nullable = false)))

  @transient private lazy val stopwordSets: Array[java.util.HashSet[String]] =
    stopwordLists.map { words =>
      val s = new java.util.HashSet[String](words.size * 2)
      words.foreach(w => s.add(w))
      s
    }.toArray

  private def isWs(c: Char): Boolean = AsciiWhitespace.is(c)

  private def isPunct(c: Char): Boolean = c match {
    case '.' | ',' | ';' | ':' | '!' | '?' | '\'' | '"' | '(' | ')' | '-' => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any = {
    val original = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
    val lower = original.toLowerCase.toString
    val len = lower.length // UTF-16 units; code points counted separately

    var nTokens = 0
    var nSubtokens = 0
    var nAlpha = 0
    var nPunct = 0
    var maxTokenLen = -1
    val hits = new Array[Int](stopwordSets.length)
    val distinct = new java.util.HashSet[String]()

    var i = 0
    var tokenStart = -1
    var tokenCp = 0 // code points in the current token
    var runKind = 0 // current subtoken run: 0 none, 1 letters, 2 digits

    def closeToken(end: Int): Unit = {
      if (tokenStart >= 0) {
        nTokens += 1
        if (tokenCp > maxTokenLen) maxTokenLen = tokenCp
        val tok = lower.substring(tokenStart, end)
        distinct.add(tok)
        var s = 0
        while (s < hits.length) {
          if (stopwordSets(s).contains(tok)) hits(s) += 1
          s += 1
        }
        tokenStart = -1
        tokenCp = 0
      }
    }

    while (i < len) {
      val c = lower.charAt(i)
      if (isWs(c)) {
        closeToken(i)
        runKind = 0
      } else {
        if (tokenStart < 0) tokenStart = i
        if (!Character.isLowSurrogate(c)) tokenCp += 1
        if (c >= 'a' && c <= 'z') {
          nAlpha += 1
          if (runKind != 1) { nSubtokens += 1; runKind = 1 }
        } else if (c >= '0' && c <= '9') {
          if (runKind != 2) { nSubtokens += 1; runKind = 2 }
        } else {
          // every other non-whitespace char is its own subtoken; surrogate
          // pairs form one code point = one subtoken
          if (!Character.isLowSurrogate(c)) nSubtokens += 1
          runKind = 0
        }
        if (isPunct(c)) nPunct += 1
      }
      i += 1
    }
    closeToken(len)

    val nChars = original.numChars()
    new GenericInternalRow(Array[Any](
      nChars, nTokens, distinct.size(), nSubtokens, nAlpha, nPunct,
      if (maxTokenLen < 0) null else maxTokenLen,
      new GenericArrayData(hits.map(h => h: Any))))
  }

  override def prettyName: String = "text_stats"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * `repetition_stats(string)` → struct of within-document repetition
 * signals, the standard corpus-quality filters (duplicate-line fraction,
 * top-bigram fraction) used to strip boilerplate and degenerate text from
 * training corpora. One pass, integer outputs only — callers derive the
 * fractions, so results compare exactly across engines:
 *
 *  - `n_lines` — '\n'-separated fields of the RAW text, every field
 *    counted including empty ones ("a\n" has 2 lines: "a" and "");
 *  - `dup_lines` — total occurrences of any line value appearing >= 2
 *    times; `dup_line_chars` — their code-point lengths summed per
 *    occurrence;
 *  - `n_bigrams` — adjacent lowercase-token pairs (tokens as in
 *    [[TextStats]]: maximal non-`\s` runs); `top_bigram` — the highest
 *    single bigram count (0 when there are no bigrams).
 */
case class RepetitionStats(child: Expression)
  extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def dataType: DataType = StructType(Seq(
    StructField("n_lines", IntegerType, nullable = false),
    StructField("dup_lines", IntegerType, nullable = false),
    StructField("dup_line_chars", IntegerType, nullable = false),
    StructField("n_bigrams", IntegerType, nullable = false),
    StructField("top_bigram", IntegerType, nullable = false),
    // token counts ride along for free (the bigram pass already walks every
    // token), so a filter needing repetition AND token-ratio rules — like
    // the q36 pipeline — runs ONE kernel instead of this plus TextStats
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_distinct_tokens", IntegerType, nullable = false)))

  private def isWs(c: Char): Boolean = AsciiWhitespace.is(c)

  override def nullSafeEval(input: Any): Any = {
    val original = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
    val raw = original.toString

    // Lines: every '\n'-separated field, trailing empties included (the
    // cross-engine convention — SQL string_split keeps them; Java's
    // split("\n") would drop them).
    val lineCounts = new java.util.HashMap[String, Int]()
    var n_lines = 0
    var start = 0
    var i = 0
    while (i <= raw.length) {
      if (i == raw.length || raw.charAt(i) == '\n') {
        val line = raw.substring(start, i)
        lineCounts.merge(line, 1, Integer.sum)
        n_lines += 1
        start = i + 1
      }
      i += 1
    }
    var dupLines = 0
    var dupLineChars = 0
    lineCounts.forEach { (line, c) =>
      if (c >= 2) {
        dupLines += c
        dupLineChars += c * line.codePointCount(0, line.length)
      }
    }

    // Bigrams + token counts over lowercase whitespace tokens, one walk.
    val lower = original.toLowerCase.toString
    val bigramCounts = new java.util.HashMap[String, Int]()
    val distinctToks = new java.util.HashSet[String]()
    var nBigrams = 0
    var nTokens = 0
    var prev: String = null
    var tokenStart = -1
    i = 0
    while (i <= lower.length) {
      val atEnd = i == lower.length
      if (!atEnd && !isWs(lower.charAt(i))) {
        if (tokenStart < 0) tokenStart = i
      } else if (tokenStart >= 0) {
        val tok = lower.substring(tokenStart, i)
        nTokens += 1
        distinctToks.add(tok)
        if (prev != null) {
          bigramCounts.merge(prev + " " + tok, 1, Integer.sum)
          nBigrams += 1
        }
        prev = tok
        tokenStart = -1
      }
      i += 1
    }
    var topBigram = 0
    bigramCounts.forEach { (_, c) => if (c > topBigram) topBigram = c }

    new GenericInternalRow(Array[Any](
      n_lines, dupLines, dupLineChars, nBigrams, topBigram,
      nTokens, distinctToks.size()))
  }

  override def prettyName: String = "repetition_stats"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * `ngram_repetition_stats(string, n)` → within-document WORD-n-gram
 * repetition signals, the Gopher-family quality filters that generalize
 * [[RepetitionStats]]'s fixed bigram signal: "fraction of characters in
 * the most frequent n-gram" and "fraction of characters in duplicated
 * n-grams" become integer numerators here (callers divide by the
 * document's char count). One pass, integer outputs only:
 *
 *  - tokens = maximal non-`\s` runs of the lowercased text (the package
 *    convention, see [[AsciiWhitespace]]); a gram = `n` consecutive
 *    tokens joined by one space;
 *  - `n_ngrams` — gram occurrences, `max(0, n_tokens - n + 1)`;
 *  - `top_ngram` — the highest single gram count;
 *  - `top_ngram_chars` — that gram's code-point length (separators
 *    included) × its count; ties on count break to the UTF-8-byte-wise
 *    smallest gram, which is exactly DuckDB's default binary string
 *    order (`ORDER BY c DESC, g ASC`) — deterministic cross-engine;
 *  - `dup_ngrams` / `dup_ngram_chars` — total occurrences of grams
 *    appearing >= 2 times, and their code-point lengths summed per
 *    occurrence.
 */
case class NgramRepetitionStats(child: Expression, n: Int)
  extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  require(n >= 1, s"ngram width must be >= 1, got $n")

  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def dataType: DataType = StructType(Seq(
    StructField("n_ngrams", IntegerType, nullable = false),
    StructField("top_ngram", IntegerType, nullable = false),
    StructField("top_ngram_chars", IntegerType, nullable = false),
    StructField("dup_ngrams", IntegerType, nullable = false),
    StructField("dup_ngram_chars", IntegerType, nullable = false)))

  override def nullSafeEval(input: Any): Any = {
    val lower = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
      .toLowerCase.toString
    val toks = new scala.collection.mutable.ArrayBuffer[String]()
    var tokenStart = -1
    var i = 0
    while (i <= lower.length) {
      val atEnd = i == lower.length
      if (!atEnd && !AsciiWhitespace.is(lower.charAt(i))) {
        if (tokenStart < 0) tokenStart = i
      } else if (tokenStart >= 0) {
        toks += lower.substring(tokenStart, i)
        tokenStart = -1
      }
      i += 1
    }

    val counts = new java.util.HashMap[String, Int]()
    var nGrams = 0
    i = 0
    while (i + n <= toks.length) {
      counts.merge(toks.slice(i, i + n).mkString(" "), 1, Integer.sum)
      nGrams += 1
      i += 1
    }

    var topCount = 0
    var topGram: org.apache.spark.unsafe.types.UTF8String = null
    var topChars = 0
    var dupGrams = 0
    var dupChars = 0
    counts.forEach { (g, c) =>
      if (c > topCount || (c == topCount && {
        val u = org.apache.spark.unsafe.types.UTF8String.fromString(g)
        topGram == null || u.compareTo(topGram) < 0
      })) {
        topCount = c
        topGram = org.apache.spark.unsafe.types.UTF8String.fromString(g)
        topChars = c * g.codePointCount(0, g.length)
      }
      if (c >= 2) {
        dupGrams += c
        dupChars += c * g.codePointCount(0, g.length)
      }
    }

    new GenericInternalRow(Array[Any](nGrams, topCount, topChars, dupGrams, dupChars))
  }

  override def prettyName: String = "ngram_repetition_stats"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * `rolling_hash64(string)` → Rabin–Karp polynomial fingerprint of the
 * UTF-8 bytes: `h = Σ byte_i · B^(n-1-i)` in wrapping 64-bit arithmetic
 * with base B = 257.
 *
 * Unlike MD5, a polynomial fingerprint COMPOSES: `h(a ++ b) =
 * h(a)·B^|b| + h(b)`, so fingerprints of chunks combine into the
 * fingerprint of the whole document without re-reading it — the property
 * content-defined chunking and incremental re-fingerprinting need at
 * 100 TB ([[RollingHash64.combine]] implements it and the spec pins it).
 */
case class RollingHash64(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def nullIntolerant: Boolean = true
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    RollingHash64.hashBytes(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes)

  // Codegen'd as one static call: the byte loop dominates, but staying
  // inside the whole-stage span avoids per-row boxing on a kernel that
  // fingerprints every document.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.text.RollingHash64.hashBytes($c.getBytes());")

  override def prettyName: String = "rolling_hash64"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingHash64 {
  val Base: Long = 257L

  def hashBytes(bytes: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = h * Base + (bytes(i) & 0xFF)
      i += 1
    }
    h
  }

  /** B^e in wrapping 64-bit arithmetic (square-and-multiply). */
  def pow(e: Long): Long = {
    var result = 1L
    var base = Base
    var exp = e
    while (exp > 0) {
      if ((exp & 1L) == 1L) result *= base
      base *= base
      exp >>= 1
    }
    result
  }

  /** Fingerprint of `a ++ b` from the parts: h(a)·B^|b| + h(b). */
  def combine(hashA: Long, hashB: Long, lenB: Long): Long =
    hashA * pow(lenB) + hashB
}

/**
 * `token_count(string)` — whitespace token count as ONE byte loop, no
 * regex, no token array: value-equal to
 * `size(filter(split(lower(text), "\\s+"), _ =!= ""))` (the
 * [[TextAnalysis.tokens]] count; spec-pinned) because token BOUNDARIES
 * are case-insensitive — no character's lowercase mapping adds or
 * removes `\s` whitespace — so neither the lowercasing nor the token
 * strings need materializing to count runs. Counting walks raw UTF-8
 * BYTES: the `\s` class is pure ASCII and UTF-8 multi-byte units are all
 * ≥ 0x80, so a byte equals a whitespace char iff the CHARACTER is
 * whitespace. Stays inside whole-stage codegen as one static call —
 * token counting gates budget/packing/balance queries that scan whole
 * corpora, where the composed form's per-token allocations dominate.
 */
case class TokenCount(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def nullIntolerant: Boolean = true
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = IntegerType

  override def nullSafeEval(input: Any): Any =
    TokenCount.count(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.text.TokenCount.count($c);")

  override def prettyName: String = "token_count"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenCount {
  /** Maximal runs of non-`\s` bytes in `s` (see class doc for why bytes
   * suffice). */
  def count(s: org.apache.spark.unsafe.types.UTF8String): Int = {
    val n = s.numBytes
    var i = 0
    var cnt = 0
    var inToken = false
    while (i < n) {
      val b = s.getByte(i)
      val ws = b == ' '.toByte || b == '\t'.toByte || b == '\n'.toByte ||
        b == 0x0B.toByte || b == '\f'.toByte || b == '\r'.toByte
      if (ws) inToken = false
      else if (!inToken) { cnt += 1; inToken = true }
      i += 1
    }
    cnt
  }
}

/**
 * `readability_stats(string)` → struct(n_words, n_syllables,
 * n_sentences) — the integer inputs of every classic readability
 * formula (Flesch reading ease, Flesch–Kincaid grade, …), one pass:
 *
 *  - `n_words` — maximal non-`\s` runs ([[TokenCount]] semantics);
 *  - `n_syllables` — per word, max(1, maximal runs of `[aeiouy]`,
 *    case-insensitive) — the standard vowel-group syllable heuristic —
 *    summed over words;
 *  - `n_sentences` — max(1, maximal runs of `[.!?]` anywhere in the
 *    raw text).
 *
 * The walk is over raw UTF-8 BYTES: every class tested (`\s`, vowels,
 * sentence marks) is pure ASCII and multi-byte UTF-8 units are all
 * ≥ 0x80, so a byte matches a class iff the character does; a non-ASCII
 * character correctly reads as "in a word, not a vowel" (it breaks a
 * vowel run exactly as the per-token `[aeiouy]+` regex would). Value
 * equality with the composed tokenize-and-regex form is spec-pinned
 * (ReadabilitySpec); the formulas themselves stay exact rationals in
 * the caller — only these three counts ever leave the kernel.
 */
case class ReadabilityStats(child: Expression)
  extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def dataType: DataType = StructType(Seq(
    StructField("n_words", IntegerType, nullable = false),
    StructField("n_syllables", IntegerType, nullable = false),
    StructField("n_sentences", IntegerType, nullable = false)))

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
    val n = s.numBytes
    var words = 0
    var syllables = 0
    var sentences = 0
    var inWord = false
    var inVowelRun = false
    var inMarkRun = false
    var wordVowelGroups = 0
    var i = 0
    while (i < n) {
      val b = s.getByte(i)
      val ws = b == ' '.toByte || b == '\t'.toByte || b == '\n'.toByte ||
        b == 0x0B.toByte || b == '\f'.toByte || b == '\r'.toByte
      if (ws) {
        if (inWord) {
          words += 1
          syllables += (if (wordVowelGroups == 0) 1 else wordVowelGroups)
        }
        inWord = false; inVowelRun = false; wordVowelGroups = 0
      } else {
        inWord = true
        val lc = if (b >= 'A'.toByte && b <= 'Z'.toByte) (b + 32).toByte else b
        val vowel = lc == 'a'.toByte || lc == 'e'.toByte || lc == 'i'.toByte ||
          lc == 'o'.toByte || lc == 'u'.toByte || lc == 'y'.toByte
        if (vowel && !inVowelRun) wordVowelGroups += 1
        inVowelRun = vowel
      }
      val mark = b == '.'.toByte || b == '!'.toByte || b == '?'.toByte
      if (mark && !inMarkRun) sentences += 1
      inMarkRun = mark
      i += 1
    }
    if (inWord) {
      words += 1
      syllables += (if (wordVowelGroups == 0) 1 else wordVowelGroups)
    }
    new GenericInternalRow(Array[Any](
      words, syllables, if (sentences == 0) 1 else sentences))
  }

  override def prettyName: String = "readability_stats"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * `quality_score64(string)` — the fused kernel behind
 * [[TextAnalysis.linearQualityScore]]: lowercase, split on ASCII
 * whitespace (the same `\s` class the Column tokenizer and the DuckDB
 * oracle use), md5-bucket each token to one of
 * [[TextAnalysis.QualityBuckets]] and accumulate the integer stand-in
 * weight `bucket - 1024` — one pass, no token array materialized, one
 * static call inside whole-stage codegen. Equality with the
 * tokenize-then-aggregate Column formulation is spec-pinned
 * (TextAnalysisSpec), and the DuckDB oracle (q85) re-derives the same
 * score from the same tokens and mask.
 */
case class QualityScore64(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def nullIntolerant: Boolean = true
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    QualityScore64.score(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.text.QualityScore64.score($c);")

  override def prettyName: String = "quality_score64"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object QualityScore64 {
  private def isWs(c: Char): Boolean = AsciiWhitespace.is(c)

  def score(input: org.apache.spark.unsafe.types.UTF8String): Long = {
    val lower = input.toLowerCase.toString
    val mask = TextAnalysis.QualityBuckets - 1L
    val shift = TextAnalysis.QualityBuckets / 2L
    var acc = 0L
    var i = 0
    val n = lower.length
    while (i < n) {
      while (i < n && isWs(lower.charAt(i))) i += 1
      val start = i
      while (i < n && !isWs(lower.charAt(i))) i += 1
      if (i > start) {
        val h = graft.dedup.SimHash64.md5Hash64(
          org.apache.spark.unsafe.types.UTF8String.fromString(lower.substring(start, i)))
        acc += (h & mask) - shift
      }
    }
    acc
  }
}

/**
 * `word_ngrams_explode(text, n)` — a Catalyst GENERATOR emitting one
 * output row per word n-gram of `text` (lowercased, ASCII-whitespace
 * tokens, space-joined), in document order.
 *
 * This is the library's `Generator` extension-surface demonstration (the
 * reference registers only scalar/aggregate expressions; generators are
 * the third registrable kind — explode/inline-shaped). It also carries a
 * real memory argument: the Column formulation
 * `explode(transform(sequence(...), ...))` materializes the full n-gram
 * ARRAY per document before exploding, so a long document holds
 * |tokens|·n gram bytes live at once; the generator streams grams one at
 * a time through GenerateExec — peak per-row extra memory is one gram
 * plus the token offsets. Tokenization is [[AsciiWhitespace]], identical
 * to every other kernel in this package and to the DuckDB oracle's
 * `string_split_regex(lower(text), '\s+')`.
 */
case class WordNgramsExplode(child: Expression, n: Int)
  extends UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.Generator
  with CodegenFallback with ExpectsInputTypes {

  require(n >= 1, s"ngram width must be >= 1, got $n")

  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def elementSchema: StructType =
    StructType(Seq(StructField("ngram", StringType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = child.eval(input)
    if (t == null) Nil
    else {
      val lower = t.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
        .toLowerCase.toString
      // Token OFFSETS only — gram strings are built lazily per yielded row.
      val starts = new scala.collection.mutable.ArrayBuffer[Int]()
      val ends = new scala.collection.mutable.ArrayBuffer[Int]()
      var i = 0
      val len = lower.length
      while (i < len) {
        while (i < len && AsciiWhitespace.is(lower.charAt(i))) i += 1
        val s = i
        while (i < len && !AsciiWhitespace.is(lower.charAt(i))) i += 1
        if (i > s) { starts += s; ends += i }
      }
      val nToks = starts.length
      if (nToks < n) Nil
      else (0 to nToks - n).iterator.map { j =>
        val sb = new java.lang.StringBuilder(ends(j + n - 1) - starts(j))
        var k = 0
        while (k < n) {
          if (k > 0) sb.append(' ')
          sb.append(lower, starts(j + k), ends(j + k))
          k += 1
        }
        InternalRow(org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString))
      }
    }
  }

  override def prettyName: String = "word_ngrams_explode"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * `rolling_span_hashes(array<string>, w)` → array<bigint>: the
 * [[RollingHash64]] fingerprint of every `w`-token window (stride 1),
 * where window `i`'s fingerprint is exactly
 * `rolling_hash64(concat_ws(" ", tokens[i..i+w-1]))` — pinned by
 * RollingSpanHashesSpec against that very composition.
 *
 * This is the cheap half of the span-dedup hash split: md5 per window
 * costs ~250 ns × (|tokens| − w + 1) windows per document and dominated
 * q64/q78 (the md5 was ~2/3 of the query). A polynomial fingerprint
 * computes ALL windows in one O(bytes) pass — prefix hashes at token
 * boundaries plus a power table give each window as
 * `H_end − H_start · B^len` — so the md5 (kept for the oracle-auditable
 * repeat identity) only ever runs on windows whose fingerprint already
 * collides across documents. Lossless as a prefilter: equal strings have
 * equal fingerprints, so no true repeat is ever missed; a fingerprint
 * collision between different strings just sends a few extra windows to
 * the md5 confirm.
 *
 * Null tokens are REJECTED (fail fast): the md5 confirm identity uses
 * `concat_ws`, which drops null elements AND their separators, so any
 * null-token hashing convention here would diverge from it and silently
 * break the lossless-prefilter contract (a true cross-doc repeat could be
 * missed). The library's tokenizers never produce nulls; a future
 * tokenizer that does must be fixed, not silently absorbed.
 */
case class RollingSpanHashes(child: Expression, w: Int)
  extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  require(w > 0, s"span width must be positive, got $w")

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = arr.numElements()
    if (n < w) return new GenericArrayData(Array.empty[Any])
    val B = RollingHash64.Base
    // One virtual byte stream t_0 ' ' t_1 ' ' ... t_{n-1}: prefix hashes
    // and byte offsets at each token's start (just after its separator)
    // and end, plus a power table over the stream length.
    val tokenBytes = new Array[Array[Byte]](n)
    var total = n - 1 // separators
    var j = 0
    while (j < n) {
      if (arr.isNullAt(j)) {
        throw new IllegalArgumentException(
          "rolling_span_hashes: null token at position " + j + " — the md5 " +
            "confirm identity (concat_ws) drops nulls with their separators, " +
            "so hashing them would make the span prefilter lossy; fix the " +
            "tokenizer or filter null tokens first")
      }
      tokenBytes(j) = arr.getUTF8String(j).getBytes
      total += tokenBytes(j).length
      j += 1
    }
    val startHash = new Array[Long](n)
    val endHash = new Array[Long](n)
    val startPos = new Array[Int](n)
    val endPos = new Array[Int](n)
    var h = 0L
    var pos = 0
    j = 0
    while (j < n) {
      if (j > 0) { h = h * B + ' '.toInt; pos += 1 }
      startHash(j) = h
      startPos(j) = pos
      val tb = tokenBytes(j)
      var k = 0
      while (k < tb.length) {
        h = h * B + (tb(k) & 0xFF)
        k += 1
      }
      pos += tb.length
      endHash(j) = h
      endPos(j) = pos
      j += 1
    }
    val pow = new Array[Long](total + 1)
    pow(0) = 1L
    j = 1
    while (j <= total) { pow(j) = pow(j - 1) * B; j += 1 }
    val out = new Array[Any](n - w + 1)
    var i = 0
    while (i <= n - w) {
      val e = i + w - 1
      out(i) = endHash(e) - startHash(i) * pow(endPos(e) - startPos(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def prettyName: String = "rolling_span_hashes"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * `bpe_encode(text, merges)` — corpus-scale BPE tokenization as ONE
 * codegen'd kernel: lowercase, tokenize on ASCII whitespace (the
 * package-wide [[AsciiWhitespace]] definition), and segment every word
 * under the ordered merge list, emitting the full piece array for the
 * document in a single pass. `merges` is `array<array<string>>`, each
 * inner array exactly `[sym_a, sym_b]`, in ADOPTION order — the first
 * two columns of [[Bpe.learnMerges]]'s result.
 *
 * Semantics are exactly [[Bpe]]'s (and the DuckDB oracle's): merges apply
 * STRICTLY in adoption order, each as one greedy left-to-right pass over
 * the word's symbols (a symbol consumed by a fuse cannot start the next
 * fuse of the same pass), starting from single-character symbols. This is
 * the original Sennrich formulation, NOT lowest-rank-first re-ranking —
 * the two differ when a later merge creates an earlier merge's pair, and
 * the library picks the one its learning loop and oracles already pin
 * (BpeEncodeSpec fuzzes equality against [[Bpe.pieceHistogram]]'s
 * fold-based application).
 *
 * Why a kernel: tokenizing a corpus through the vocabulary-join
 * formulation ([[Bpe.pieceHistogram]]) is right for LEARNING (everything
 * after the one corpus pass is vocabulary-bounded), but producing
 * per-document pieces that way pays a |docs|-to-vocabulary join — at
 * 100 TB that shuffles every (doc, word) coordinate. This expression
 * pays zero shuffle: the merge table is a model artifact (foldable
 * literal in the plan, embedded once per task via a codegen reference,
 * not re-parsed per row), and the scan stays inside whole-stage codegen.
 *
 * Per-word cost is O(m) symbol-set probes + O(len) per APPLICABLE merge
 * (a merge whose symbols aren't both present in the word is skipped in
 * O(1)), with m = |merges|. The learned-prefix merge lists this library
 * trains are small; a production 50k-merge vocabulary would want the
 * rank-indexed variant — out of scope, as is byte-level fallback (the
 * same simplification note as [[Bpe]]).
 */
case class BpeEncode(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(StringType, ArrayType(ArrayType(StringType)))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  /** Merge table parsed ONCE when the merges argument is foldable (the
   * model-artifact call shape) — flat [a0, b0, a1, b1, ...]. */
  @transient private lazy val staticMerges: Array[String] =
    if (right.foldable) {
      val v = right.eval(null)
      if (v == null) null else BpeEncode.parseMerges(v.asInstanceOf[ArrayData])
    } else null

  override def nullSafeEval(text: Any, merges: Any): Any = {
    val flat =
      if (staticMerges != null) staticMerges
      else BpeEncode.parseMerges(merges.asInstanceOf[ArrayData])
    BpeEncode.encode(text.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], flat)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, m) =>
      if (right.foldable && staticMerges != null) {
        val ref = ctx.addReferenceObj("bpeMerges", staticMerges, "java.lang.String[]")
        s"${ev.value} = graft.text.BpeEncode.encode($t, $ref);"
      } else {
        s"${ev.value} = graft.text.BpeEncode.encode($t, graft.text.BpeEncode.parseMerges($m));"
      })

  override def prettyName: String = "bpe_encode"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object BpeEncode {

  /** Validate and flatten an `array<array<string>>` merge table to
   * [a0, b0, a1, b1, ...]; fail fast on nulls or non-pair entries (a
   * silently skipped merge would change every downstream piece count). */
  def parseMerges(arr: ArrayData): Array[String] = {
    val m = arr.numElements()
    val flat = new Array[String](2 * m)
    var i = 0
    while (i < m) {
      if (arr.isNullAt(i)) {
        throw new IllegalArgumentException(
          s"bpe_encode: merge $i is null — the merge table must be complete")
      }
      val pair = arr.getArray(i)
      if (pair.numElements() != 2 || pair.isNullAt(0) || pair.isNullAt(1)) {
        throw new IllegalArgumentException(
          s"bpe_encode: merge $i must be exactly [sym_a, sym_b] with no nulls, " +
            s"got ${pair.numElements()} element(s)")
      }
      flat(2 * i) = pair.getUTF8String(0).toString
      flat(2 * i + 1) = pair.getUTF8String(1).toString
      i += 1
    }
    flat
  }

  def encode(text: org.apache.spark.unsafe.types.UTF8String,
      flat: Array[String]): ArrayData = {
    val lower = text.toLowerCase.toString
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    val n = lower.length
    var i = 0
    while (i < n) {
      while (i < n && AsciiWhitespace.is(lower.charAt(i))) i += 1
      val start = i
      while (i < n && !AsciiWhitespace.is(lower.charAt(i))) i += 1
      if (i > start) encodeWord(lower, start, i, flat, out)
    }
    new GenericArrayData(out.toArray)
  }

  /** Segment `lower[start, end)` under the flat merge list, appending the
   * pieces (as UTF8String) to `out`. */
  private def encodeWord(lower: String, start: Int, end: Int,
      flat: Array[String], out: scala.collection.mutable.ArrayBuffer[Any]): Unit = {
    val len = end - start
    if (len == 1) {
      out += org.apache.spark.unsafe.types.UTF8String.fromString(
        lower.substring(start, end))
      return
    }
    // Initial symbols: single UTF-16 chars — the `split(word, "")` /
    // `word[i]` convention the learn loop and the oracles share.
    val cur = new Array[String](len)
    var curLen = len
    val present = new java.util.HashSet[String](len * 2)
    var k = 0
    while (k < len) {
      cur(k) = String.valueOf(lower.charAt(start + k))
      present.add(cur(k))
      k += 1
    }
    val m = flat.length / 2
    var t = 0
    while (t < m && curLen > 1) {
      val a = flat(2 * t)
      val b = flat(2 * t + 1)
      // O(1) skip: a merge can only fire if both symbols occur. `present`
      // is an over-approximation (consumed symbols are not removed) —
      // a false positive just costs one linear pass that fuses nothing.
      if (present.contains(a) && present.contains(b)) {
        val ab = a + b
        var w = 0
        k = 0
        var merged = false
        while (k < curLen) {
          if (k + 1 < curLen && cur(k) == a && cur(k + 1) == b) {
            cur(w) = ab; k += 2; merged = true
          } else {
            cur(w) = cur(k); k += 1
          }
          w += 1
        }
        curLen = w
        if (merged) present.add(ab)
      }
      t += 1
    }
    k = 0
    while (k < curLen) {
      out += org.apache.spark.unsafe.types.UTF8String.fromString(cur(k))
      k += 1
    }
  }
}
