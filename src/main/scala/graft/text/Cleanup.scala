package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftSqlBridge
import org.apache.spark.sql.types.{DataType, StringType}

/**
 * Text cleanup for corpus curation: PII redaction, markup stripping, and
 * Unicode normalization — the scrubbing stages that sit between raw ingest
 * and dedup/quality filtering in a training-data pipeline.
 *
 * Everything is a pure per-row projection (no shuffle, scales linearly with
 * the scan) built on codegen'd Spark built-ins, except [[nfcNormalize]]
 * which is a one-call custom expression (Spark has no Unicode-normalize
 * built-in). Every regex here is deliberately restricted to the syntax
 * subset Java regex and RE2 (DuckDB/Trino/Go) agree on — character
 * classes, bounded repetition, non-capturing groups, `\b` — so redaction
 * is auditable off-Spark on the same files with the same patterns.
 */
object Cleanup {

  /** RFC-5322-ish address, the pragmatic subset: local part of word chars
   * plus `._%+-`, domain labels, a 2+ letter TLD. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** International prefix form: +CC 555-123-4567 (separator space or dash). */
  val IntlPhonePattern = "\\+\\d{1,2}[- ]\\d{3}[- ]\\d{3}[- ]\\d{4}"

  /** Bare NANP-ish form: 555-123-4567, word-bounded so order ids survive. */
  val BarePhonePattern = "\\b\\d{3}[- ]\\d{3}[- ]\\d{4}\\b"

  /** Dotted-quad IPv4, word-bounded. (Deliberately permissive on octet
   * range — redaction favors recall; 999.0.0.1 is not worth leaking over.) */
  val Ipv4Pattern = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"

  def redactEmails(text: Column, token: String = "<EMAIL>"): Column =
    regexp_replace(text, EmailPattern, token)

  def redactPhones(text: Column, token: String = "<PHONE>"): Column =
    regexp_replace(regexp_replace(text, IntlPhonePattern, token), BarePhonePattern, token)

  def redactIpv4(text: Column, token: String = "<IP>"): Column =
    regexp_replace(text, Ipv4Pattern, token)

  /** All redactions, in dependency order: emails first (their domains can
   * contain dotted quads), then phones (international before bare, so the
   * +CC prefix is not orphaned), then IPv4. */
  def redactPii(text: Column): Column =
    redactIpv4(redactPhones(redactEmails(text)))

  /** Strip markup tags and collapse the leftover whitespace. Not an HTML
   * parser — `<script>` bodies survive — but the right cost point for
   * bulk boilerplate removal at corpus scale; a DOM parse is ~100× the
   * CPU and needs no distributed machinery anyway (wrap one in
   * [[nfcNormalize]]-style expression if fidelity ever matters more). */
  def stripHtml(text: Column): Column =
    trim(regexp_replace(regexp_replace(text, "<[^>]*>", " "), "\\s+", " "))

  /** Unicode NFC normalization (composed form): "e" + U+0301 → "é".
   * Fingerprint-based dedup treats byte-different spellings of the same
   * text as distinct documents; normalizing first is standard practice. */
  def nfcNormalize(text: Column): Column =
    GraftSqlBridge.column(NfcNormalize(GraftSqlBridge.expression(text)))

  /** [[stripHtml]] only when the document actually contains a tag-shaped
   * span. Plain-text documents pass through byte-identical — stripHtml
   * collapses ALL whitespace, which would flatten every document to one
   * line and erase the duplicate-line quality signals computed downstream
   * (see PipelineQueries q36). */
  def stripHtmlIfPresent(text: Column): Column =
    when(text.rlike("<[^>]*>"), stripHtml(text)).otherwise(text)

  /** The canonical corpus scrub, in real-pipeline stage order: NFC-normalize
   * (so byte-different spellings can't dodge the patterns), strip markup
   * where present, then redact PII. Pure per-row projection end to end —
   * composes in front of fingerprinting/dedup with no extra pass. */
  def scrub(text: Column): Column =
    redactPii(stripHtmlIfPresent(nfcNormalize(text)))

  /**
   * C4-style boilerplate-line REMOVAL — the "drop shared lines" scrub whose
   * detection half is q72: rewrite each document keeping only lines whose
   * trimmed content does NOT appear in `minDocs`-or-more distinct documents
   * (nav bars, license footers, template chrome). Blank lines are never
   * boilerplate (they carry no shared content) and always survive.
   *
   * Scale shape, in order:
   *  1. Detection shuffles (line-hash, doc_id) coordinates only — document
   *     text never moves (same plan as q72's detection).
   *  2. The boilerplate set is folded to ONE row holding a sorted
   *     `array<long>` of line hashes and broadcast — the legit
   *     small-artifact pattern ([[graft.dedup.Dedup.ngramContaminationBloom]]
   *     precedent). Its size is bounded by (total line occurrences) /
   *     `minDocs`, and in practice by the count of genuinely shared
   *     template lines; tens of millions of entries is a few hundred MB,
   *     fine to broadcast, and the pre-aggregated `collect_list` input is
   *     already the distinct hot set.
   *  3. The rewrite is a pure per-row projection: split, probe each line's
   *     hash against the broadcast set with [[graft.dedup.SortedLongContains]]
   *     (binary search, codegen'd), re-join survivors. No shuffle of text,
   *     no per-line explode+regroup round trip.
   *
   * @return (idCol, clean_text, n_removed) — one row per input document.
   */
  def removeBoilerplateLines(docs: org.apache.spark.sql.DataFrame, minDocs: Int = 3,
      idCol: String = "doc_id", textCol: String = "text"): org.apache.spark.sql.DataFrame = {
    val lineHash = (l: Column) => graft.operators.Sampling.md5Hash64(trim(l))
    val hot = docs
      .select(col(idCol).as("id"), explode(split(col(textCol), "\n")).as("line"))
      .filter(trim(col("line")) =!= "")
      .select(col("id"), lineHash(col("line")).as("lh"))
      .groupBy("lh").agg(count_distinct(col("id")).as("nd"))
      .filter(col("nd") >= minDocs)
    val bset = hot.agg(sort_array(collect_list(col("lh"))).as("bl"))
    docs
      .crossJoin(broadcast(bset))
      .select(col(idCol), split(col(textCol), "\n").as("ls"), col("bl"))
      .select(col(idCol), col("ls"),
        filter(col("ls"), l => !GraftSqlBridge.column(graft.dedup.SortedLongContains(
          GraftSqlBridge.expression(col("bl")),
          GraftSqlBridge.expression(lineHash(l))))).as("kept"))
      .select(col(idCol),
        array_join(col("kept"), "\n").as("clean_text"),
        (size(col("ls")) - size(col("kept"))).as("n_removed"))
  }

  /**
   * Redaction EFFICACY audit — the QA gate a release runs after
   * [[redactPii]]: per pattern class, how many documents carry at least
   * one raw hit, the total raw hit count, and the RESIDUAL hit count on
   * the redacted text. `hits_after > 0` is a scrub regression;
   * `hits_before` drifting across releases is a pattern-shift alarm
   * (PII arriving in shapes the patterns no longer cover shows up as
   * before-counts falling while leak reports rise). Counts are what
   * make the gate thresholdable; the patterns are the RE2-safe
   * redaction constants themselves, so the audit re-runs off-Spark on
   * the same bytes.
   *
   * One scan: the redacted text binds in its own projection (evaluated
   * once per row — the q64-cliff rule), the per-class counts are
   * conditional aggregates of that scan, and classes fan out as a
   * projection over a 4-element struct array.
   *
   * @return one row per class (email, phone_intl, phone_bare, ipv4):
   *   (pattern_class, docs_with_hits, hits_before, hits_after)
   */
  def redactionAudit(df: org.apache.spark.sql.DataFrame, text: Column): org.apache.spark.sql.DataFrame = {
    val classes = Seq("email" -> EmailPattern, "phone_intl" -> IntlPhonePattern,
      "phone_bare" -> BarePhonePattern, "ipv4" -> Ipv4Pattern)
    val bound = df.select(text.as("t"))
      .select(col("t"), redactPii(col("t")).as("r"))
    val aggs = classes.flatMap { case (n, p) => Seq(
      sum(when(col("t").rlike(p), 1L).otherwise(0L)).as(s"d_$n"),
      coalesce(sum(regexp_count(col("t"), lit(p))), lit(0L)).as(s"b_$n"),
      coalesce(sum(regexp_count(col("r"), lit(p))), lit(0L)).as(s"a_$n")) }
    bound.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(classes.map { case (n, _) =>
        struct(lit(n).as("pattern_class"), col(s"d_$n").as("docs_with_hits"),
          col(s"b_$n").as("hits_before"), col(s"a_$n").as("hits_after")) }: _*)).as("e"))
      .select(col("e.pattern_class").as("pattern_class"),
        col("e.docs_with_hits").as("docs_with_hits"),
        col("e.hits_before").as("hits_before"),
        col("e.hits_after").as("hits_after"))
  }

  /** The encoding-damage character classes [[encodingAudit]] counts.
   * Kept as named constants so the DuckDB oracle interpolates the SAME
   * patterns (both engines run RE2-compatible char-class syntax; all
   * three classes avoid engine-divergent features). */
  private[graft] val ReplacementCharPattern = "�"
  private[graft] val ControlCharPattern = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]"
  /** The classic UTF-8-bytes-decoded-as-Latin-1/cp1252 signature: a
   * mis-decoded LEAD byte ('Ã' = 0xC3 for U+00C0–FF originals, 'Â' =
   * 0xC2 for U+0080–BF originals like NBSP, 'â' = 0xE2 for the U+2000
   * punctuation block — curly quotes, dashes, ellipsis) followed by a
   * mis-decoded CONTINUATION byte. Continuations cover BOTH decodings
   * of 0x80–0xBF: Latin-1 maps them to U+0080–U+00BF (the `\x80-\xBF`
   * range) and cp1252 maps 27 of them to punctuation specials (€‚ƒ„…
   * †‡ˆ‰Š‹ŒŽ''""•–—˜™š›œžŸ — listed as LITERAL characters so the same
   * constant parses identically in Java regex and RE2). Without the
   * Â/â leads the audit certified corpora "clean" while carrying the
   * most frequent damage of all: NBSP → 'Â ' and U+2019 → 'â€™'. */
  private[graft] val MojibakePattern =
    "[ÂÃâ][\\x80-\\xBF€‚ƒ„…†‡ˆ‰Š‹ŒŽ‘’“”•–—˜™š›œžŸ]"

  /**
   * Encoding-damage audit per group: documents and occurrence counts of
   * the three classic ingestion-corruption signatures — U+FFFD
   * replacement characters (a decoder already gave up), stray C0
   * control characters (binary bleed; tab/newline/CR excluded), and
   * UTF-8-as-Latin-1 mojibake digraphs ('Ã' + continuation-block char).
   * The preprocessing gate a crawl refresh runs BEFORE tokenization:
   * every downstream token statistic silently absorbs this damage, and
   * a zero row per source is the certification, not silence (the
   * [[redactionAudit]] convention). One kernel-free scan — three
   * regexp_count projections per row, counts collapse per group.
   *
   * @return one row per group, ordered: (g, n_docs, docs_replacement,
   *         docs_control, docs_mojibake, hits_replacement,
   *         hits_control, hits_mojibake)
   */
  def encodingAudit(df: org.apache.spark.sql.DataFrame, group: Column,
      text: Column): org.apache.spark.sql.DataFrame = {
    val classes = Seq(
      "replacement" -> ReplacementCharPattern, // literal char, no metachars
      "control" -> ControlCharPattern,
      "mojibake" -> MojibakePattern)
    val bound = df.select(group.cast("string").as("g"), text.as("t"))
      .filter(col("g").isNotNull && col("t").isNotNull)
    val aggs = classes.flatMap { case (n, p) => Seq(
      sum(when(regexp_count(col("t"), lit(p)) > 0, 1L).otherwise(0L))
        .as(s"docs_$n"),
      coalesce(sum(regexp_count(col("t"), lit(p))), lit(0L))
        .as(s"hits_$n")) }
    bound.groupBy(col("g"))
      .agg(count(lit(1)).as("n_docs"), aggs: _*)
      .select(col("g"), col("n_docs"),
        col("docs_replacement"), col("docs_control"), col("docs_mojibake"),
        col("hits_replacement"), col("hits_control"), col("hits_mojibake"))
      .orderBy(col("g"))
  }

  // ------------------------------------------------- catalyst-level builders

  import org.apache.spark.sql.catalyst.expressions.{CaseWhen, Literal, RLike, RegExpReplace, StringTrim}

  /** Catalyst twins of the Column DSL above, for the SQL registry: a
   * registry builder must return a RESOLVED expression tree, and
   * round-tripping through the Column functions yields unevaluable
   * column-node wrappers on that path (Spark 4's Column API is
   * backend-agnostic until analysis). Each builder composes the SAME
   * built-in expressions with the SAME pattern constants, and
   * ExtensionsSpec pins SQL-vs-DSL value equality so the two layers
   * cannot drift. */
  private[graft] def stripHtmlExpr(t: Expression): Expression =
    StringTrim(RegExpReplace(
      RegExpReplace(t, Literal("<[^>]*>"), Literal(" ")),
      Literal("\\s+"), Literal(" ")))

  private[graft] def redactPiiExpr(t: Expression): Expression =
    RegExpReplace(
      RegExpReplace(
        RegExpReplace(
          RegExpReplace(t, Literal(EmailPattern), Literal("<EMAIL>")),
          Literal(IntlPhonePattern), Literal("<PHONE>")),
        Literal(BarePhonePattern), Literal("<PHONE>")),
      Literal(Ipv4Pattern), Literal("<IP>"))

  private[graft] def stripHtmlIfPresentExpr(t: Expression): Expression =
    CaseWhen(Seq((RLike(t, Literal("<[^>]*>")), stripHtmlExpr(t))), t)

  private[graft] def scrubExpr(t: Expression): Expression =
    redactPiiExpr(stripHtmlIfPresentExpr(NfcNormalize(t)))
}

/**
 * `nfc_normalize(string)` — java.text.Normalizer NFC, as a codegen'd
 * expression. DuckDB's `nfc_normalize` computes the identical function
 * (both implement Unicode normalization form C), which is what makes an
 * exact cross-engine oracle possible for this operator.
 */
case class NfcNormalize(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def nullIntolerant: Boolean = true
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
    org.apache.spark.unsafe.types.UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  java.text.Normalizer.normalize($c.toString(), java.text.Normalizer.Form.NFC));
         |""".stripMargin)

  override def prettyName: String = "nfc_normalize"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
