package graft

import graft.dedup.{CharShingles, MinHashSignature, SimHash64, WordShingles}
import graft.hll.FunctionRegistration
import graft.similarity.{ArrayCosineSimilarity, ArrayDotProduct, Int8DotProduct, QuantizeInt8}
import graft.text.{NgramRepetitionStats, RepetitionStats, TextStats}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graft.GraftSqlBridge
import org.apache.spark.sql.types.{BooleanType, IntegerType, LongType}

/**
 * SQL registration for the pipeline kernels (dedup, similarity, text) so
 * the WHOLE library — not just the sketch families — is callable from
 * SparkSQL and PySpark:
 *
 *   SELECT simhash64(tokens, true), char_shingles(text, 5) FROM docs
 *
 * Same mechanism the reference uses for its HLL functions: native Catalyst
 * expressions registered like built-ins, no ScalaUDF serialization.
 */
object GraftFunctionRegistry extends FunctionRegistration {

  type Builder = Seq[Expression] => Expression

  private def intOf(e: Expression, what: String): Int = e match {
    case Literal(i: Int, IntegerType) => i
    case Literal(l: Long, LongType) => l.toInt
    case _ => throw new IllegalArgumentException(s"$what must be an integer literal")
  }

  private def boolOf(e: Expression, what: String): Boolean = e match {
    case Literal(b: Boolean, BooleanType) => b
    case _ => throw new IllegalArgumentException(s"$what must be a boolean literal")
  }

  private def wrongArity(name: String, got: Int): Nothing =
    throw new IllegalArgumentException(s"Invalid number of arguments for function $name: $got")

  val entries: Seq[(String, String, Builder)] = Seq(
    ("char_shingles",
      "_FUNC_(text, n) - Distinct lowercased character n-gram shingles of text.",
      {
        case Seq(t, n) => CharShingles(t, intOf(n, "the shingle width"))
        case args => wrongArity("char_shingles", args.size)
      }),
    ("word_shingles",
      "_FUNC_(tokens, n) - Distinct n-token shingles of a token array, space-joined.",
      {
        case Seq(t, n) => WordShingles(t, intOf(n, "the shingle width"))
        case args => wrongArity("word_shingles", args.size)
      }),
    ("minhash_signature",
      "_FUNC_(elements, k) - k-element MinHash signature of a string array.",
      {
        case Seq(e, k) => MinHashSignature(e, intOf(k, "the signature length"))
        case args => wrongArity("minhash_signature", args.size)
      }),
    ("simhash64",
      "_FUNC_(elements[, auditable]) - 64-bit SimHash; auditable=true hashes tokens with MD5 so other engines can reproduce it.",
      {
        case Seq(e) => SimHash64(e)
        case Seq(e, a) => SimHash64(e, boolOf(a, "the auditable flag"))
        case args => wrongArity("simhash64", args.size)
      }),
    ("text_stats",
      "_FUNC_(text) - Single-pass text quality signals struct (English stopword hits).",
      {
        case Seq(t) => TextStats(t, Seq(graft.text.Stopwords.English))
        case args => wrongArity("text_stats", args.size)
      }),
    ("repetition_stats",
      "_FUNC_(text) - Within-document repetition signals struct (duplicate lines, top bigram).",
      {
        case Seq(t) => RepetitionStats(t)
        case args => wrongArity("repetition_stats", args.size)
      }),
    ("ngram_repetition_stats",
      "_FUNC_(text, n) - Word-n-gram repetition signals struct (top-gram and duplicated-gram occurrence/char counts).",
      {
        case Seq(t, n) => NgramRepetitionStats(t, intOf(n, "the ngram width"))
        case args => wrongArity("ngram_repetition_stats", args.size)
      }),
    ("word_ngrams_explode",
      "_FUNC_(text, n) - Generator: one row per word n-gram (lowercased, whitespace tokens, space-joined), in document order.",
      {
        case Seq(t, n) => graft.text.WordNgramsExplode(t, intOf(n, "the ngram width"))
        case args => wrongArity("word_ngrams_explode", args.size)
      }),
    ("md5_hash64",
      "_FUNC_(text) - First 8 bytes of MD5 as a signed 64-bit value (auditable cross-engine hash).",
      {
        case Seq(t) => graft.operators.Md5Hash64(t)
        case args => wrongArity("md5_hash64", args.size)
      }),
    ("cosine_similarity",
      "_FUNC_(a, b) - Cosine similarity of two float arrays (0.0 for zero vectors).",
      {
        case Seq(a, b) => ArrayCosineSimilarity(a, b)
        case args => wrongArity("cosine_similarity", args.size)
      }),
    ("dot_product",
      "_FUNC_(a, b) - Dot product of two float arrays.",
      {
        case Seq(a, b) => ArrayDotProduct(a, b)
        case args => wrongArity("dot_product", args.size)
      }),
    ("quantize_int8",
      "_FUNC_(vec) - Symmetric absmax int8 quantization of a float array: struct(scale, q).",
      {
        case Seq(v) => QuantizeInt8(v)
        case args => wrongArity("quantize_int8", args.size)
      }),
    ("int8_dot",
      "_FUNC_(qa, qb) - Exact integer dot product of two int8 code arrays.",
      {
        case Seq(a, b) => Int8DotProduct(a, b)
        case args => wrongArity("int8_dot", args.size)
      }),
    ("nfc_normalize",
      "_FUNC_(text) - Unicode NFC (composed form) normalization of a string.",
      {
        case Seq(t) => graft.text.NfcNormalize(t)
        case args => wrongArity("nfc_normalize", args.size)
      }),
    // The cleanup surface composes built-in expressions (regexp_replace
    // chains) through Cleanup's catalyst-level builders — the same
    // pattern constants the Column DSL uses (ExtensionsSpec pins value
    // equality between the two layers).
    ("strip_html",
      "_FUNC_(text) - Strip markup tags and collapse leftover whitespace.",
      {
        case Seq(t) => graft.text.Cleanup.stripHtmlExpr(t)
        case args => wrongArity("strip_html", args.size)
      }),
    ("redact_pii",
      "_FUNC_(text) - Redact emails, phone numbers, and IPv4 addresses with type tokens.",
      {
        case Seq(t) => graft.text.Cleanup.redactPiiExpr(t)
        case args => wrongArity("redact_pii", args.size)
      }),
    ("scrub",
      "_FUNC_(text) - Canonical corpus scrub: NFC-normalize, strip markup if present, redact PII.",
      {
        case Seq(t) => graft.text.Cleanup.scrubExpr(t)
        case args => wrongArity("scrub", args.size)
      }),
    ("bpe_encode",
      "_FUNC_(text, merges) - BPE piece array of the whitespace-lowercase tokens under an ordered array<array<string>> merge table (greedy left-to-right per merge, adoption order).",
      {
        case Seq(t, m) => graft.text.BpeEncode(t, m)
        case args => wrongArity("bpe_encode", args.size)
      }),
    ("quality_score64",
      "_FUNC_(text) - Hashed bag-of-words linear quality score: md5-bucketed integer token weights, one fused pass.",
      {
        case Seq(t) => graft.text.QualityScore64(t)
        case args => wrongArity("quality_score64", args.size)
      }),
    ("zorder2",
      "_FUNC_(x, y) - 2-D Z-order (Morton) value of two 16-bit grid cells, for layout clustering.",
      {
        case Seq(x, y) => graft.sources.Layout.zorder2Expr(x, y)
        case args => wrongArity("zorder2", args.size)
      }),
    ("topk_structs",
      "_FUNC_(struct, k) - Bounded top-k aggregate: the k minimal structs of the group under field-order comparison; at most k elements per task-group cross the exchange.",
      {
        case Seq(e, org.apache.spark.sql.catalyst.expressions.Literal(k: Int, _)) =>
          graft.operators.TopKStructsAgg(e, k).toAggregateExpression()
        case Seq(_, _) => throw new IllegalArgumentException(
          "topk_structs: k must be an integer literal")
        case args => wrongArity("topk_structs", args.size)
      }),
    ("hilbert2",
      "_FUNC_(x, y) - Distance along the order-16 2-D Hilbert curve for two 16-bit grid cells; Z-order's better-locality sibling.",
      {
        case Seq(x, y) => graft.sources.Hilbert2(
          org.apache.spark.sql.catalyst.expressions.Cast(x, org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.catalyst.expressions.Cast(y, org.apache.spark.sql.types.LongType))
        case args => wrongArity("hilbert2", args.size)
      }),
    ("rolling_hash64",
      "_FUNC_(text) - Rabin-Karp polynomial fingerprint of the UTF-8 bytes (base 257, wrapping 64-bit); composes: h(a||b) = h(a)*B^|b| + h(b).",
      {
        case Seq(t) => graft.text.RollingHash64(t)
        case args => wrongArity("rolling_hash64", args.size)
      }),
    ("rolling_span_hashes",
      "_FUNC_(tokens, w) - Rabin-Karp fingerprint of every w-token window (stride 1), each equal to rolling_hash64 of the space-joined window.",
      {
        case Seq(t, w) => graft.text.RollingSpanHashes(t, intOf(w, "the span width"))
        case args => wrongArity("rolling_span_hashes", args.size)
      }),
    ("pair_collisions_explode",
      "_FUNC_(array_of_structs) - Generator: the m*(m-1)/2 unordered element pairs as p:struct(a,b), a holding the smaller first field.",
      {
        case Seq(e) => graft.dedup.PairCollisionsExplode(e)
        case args => wrongArity("pair_collisions_explode", args.size)
      }),
    ("greedy_pack_explode",
      "_FUNC_(array_of_structs, budget) - Generator: no-split greedy packing of a stream (last struct field = bigint token count) as p:struct(e, pack_id, pack_offset).",
      {
        case Seq(e, b) => graft.operators.GreedyPackExplode(e, intOf(b, "the token budget").toLong)
        case args => wrongArity("greedy_pack_explode", args.size)
      })
  )

  private def info(name: String, usageText: String): ExpressionInfo =
    new ExpressionInfo(classOf[CharShingles].getPackage.getName, null, name, usageText, "")

  override def registerFunctions(spark: SparkSession): Unit = {
    val registry = GraftSqlBridge.functionRegistry(spark)
    entries.foreach { case (name, usageText, builder) =>
      registerIfAbsent(registry, name, info(name, usageText), builder)
    }
  }

  /** For injection alongside HLL/KLL in GraftSparkExtensions. */
  def inject(extensions: SparkSessionExtensions): Unit =
    entries.foreach { case (name, usageText, builder) =>
      extensions.injectFunction((FunctionIdentifier(name), info(name, usageText), builder))
    }
}
