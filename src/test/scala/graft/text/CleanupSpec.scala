package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CleanupSpec extends AnyFunSuite with graft.testutil.OpenStreamLeakCheck {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-cleanup-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def docs(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("removeBoilerplateLines drops shared lines and keeps unique content") {
    val footer = "(c) example collective"
    val corpus = docs(
      1L -> s"alpha unique one\n$footer",
      2L -> s"beta unique two\n$footer",
      3L -> s"gamma unique three\n$footer",
      4L -> "delta with no footer at all")
    val out = Cleanup.removeBoilerplateLines(corpus, minDocs = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(out(0) === ((1L, "alpha unique one", 1)))
    assert(out(1) === ((2L, "beta unique two", 1)))
    assert(out(2) === ((3L, "gamma unique three", 1)))
    assert(out(3) === ((4L, "delta with no footer at all", 0)))
  }

  test("removeBoilerplateLines matches on trimmed content but keeps original bytes") {
    // Indented and flush copies of the footer count as the SAME line for
    // detection; removal drops each occurrence however it was indented.
    val corpus = docs(
      1L -> "keep me\n  shared line",
      2L -> "also keep\nshared line",
      3L -> "third keeper\n shared line ")
    val out = Cleanup.removeBoilerplateLines(corpus, minDocs = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getString(1), r.getInt(2)))
    assert(out.toSeq === Seq(("keep me", 1), ("also keep", 1), ("third keeper", 1)))
  }

  test("removeBoilerplateLines: blank lines are never boilerplate") {
    val corpus = docs(
      1L -> "a\n\nb", 2L -> "c\n\nd", 3L -> "e\n\nf")
    val out = Cleanup.removeBoilerplateLines(corpus, minDocs = 3)
      .orderBy("doc_id").collect().map(r => (r.getString(1), r.getInt(2)))
    assert(out.toSeq === Seq(("a\n\nb", 0), ("c\n\nd", 0), ("e\n\nf", 0)))
  }

  test("removeBoilerplateLines: doc that is ALL boilerplate empties cleanly") {
    val corpus = docs(
      1L -> "shared", 2L -> "shared", 3L -> "shared\nshared", 4L -> "solo")
    val out = Cleanup.removeBoilerplateLines(corpus, minDocs = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(out(0) === ((1L, "", 1)))
    assert(out(2) === ((3L, "", 2)))
    assert(out(3) === ((4L, "solo", 0)))
  }

  test("removeBoilerplateLines: no hot lines leaves every doc untouched") {
    val corpus = docs(1L -> "a\nb", 2L -> "c\nd")
    val out = Cleanup.removeBoilerplateLines(corpus, minDocs = 3)
      .orderBy("doc_id").collect().map(r => (r.getString(1), r.getInt(2)))
    assert(out.toSeq === Seq(("a\nb", 0), ("c\nd", 0)))
  }

  test("redactionAudit counts planted hits per class and certifies zero residue") {
    val corpus = docs(
      1L -> "write bob@example.com or call +1 555-123-4567",
      2L -> "server at 10.0.0.1 and 192.168.1.1, fallback 555-000-1234",
      3L -> "nothing sensitive here")
    val out = Cleanup.redactionAudit(corpus, col("text"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out("email") === ((1L, 1L, 0L)))
    assert(out("phone_intl") === ((1L, 1L, 0L)))
    // the intl number's tail ALSO matches the bare pattern pre-redaction
    assert(out("phone_bare") === ((2L, 2L, 0L)))
    assert(out("ipv4") === ((1L, 2L, 0L)))
  }

  test("redactionAudit on a clean corpus is all zeros") {
    val out = Cleanup.redactionAudit(docs(1L -> "plain text"), col("text"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq.fill(4)((0L, 0L, 0L)))
  }

  private def srcDocs(rows: (String, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("source", "text")
  }

  test("encodingAudit counts planted damage per class and per source") {
    val corpus = srcDocs(
      // Two replacement chars in one doc, one in another.
      "web" -> "broken � decode � here",
      "web" -> "one � only",
      // Binary bleed: NUL and ESC (controls); \t and \n must NOT count.
      "web" -> "ctrl \u0000 and \u001b[0m escapes\tbut\ttabs\nare fine",
      // Classic mojibake: 'é' mangled to 'Ã©' (U+00C3 U+00A9), twice.
      "scan" -> "cafÃ© and rÃ©sumÃ©",
      "scan" -> "perfectly clean text")
    val out = Cleanup.encodingAudit(corpus, col("source"), col("text"))
      .collect().map(r => r.getString(0) -> r).toMap
    val web = out("web")
    assert(web.getAs[Long]("n_docs") === 3L)
    assert(web.getAs[Long]("docs_replacement") === 2L)
    assert(web.getAs[Long]("hits_replacement") === 3L)
    assert(web.getAs[Long]("docs_control") === 1L)
    assert(web.getAs[Long]("hits_control") === 2L)
    assert(web.getAs[Long]("docs_mojibake") === 0L)
    val scan = out("scan")
    assert(scan.getAs[Long]("n_docs") === 2L)
    assert(scan.getAs[Long]("docs_mojibake") === 1L)
    assert(scan.getAs[Long]("hits_mojibake") === 3L)
    assert(scan.getAs[Long]("hits_replacement") === 0L)
    assert(scan.getAs[Long]("hits_control") === 0L)
  }

  test("encodingAudit catches Â/â-lead mojibake (NBSP and cp1252 punctuation damage)") {
    val corpus = srcDocs(
      // NBSP (U+00A0, UTF-8 C2 A0) decoded as Latin-1: 'Â' + U+00A0.
      "a" -> "price:Â 100",
      // Curly quote U+2019 (UTF-8 E2 80 99) decoded as cp1252: 'â€™'
      // (the continuation bytes land on cp1252 punctuation, NOT the
      // \x80-\xBF block — the class the pattern must cover literally).
      "a" -> "itâ€™s damaged",
      // Em dash U+2014 (E2 80 94) as cp1252: 'â€"'.
      "a" -> "waitâ€”done")
    val r = Cleanup.encodingAudit(corpus, col("source"), col("text"))
      .collect().head
    assert(r.getAs[Long]("docs_mojibake") === 3L)
    assert(r.getAs[Long]("hits_mojibake") === 3L)
  }

  test("encodingAudit: tabs, newlines, CRs, and legitimate accents never count") {
    val clean = srcDocs(
      "a" -> "tab\there newline\nhere cr\rhere",
      // A real 'é' (U+00E9) and a standalone 'Ã' with a following ASCII
      // char — neither is the mojibake digraph.
      "a" -> "café is fine and Ãx is not a digraph")
    val r = Cleanup.encodingAudit(clean, col("source"), col("text"))
      .collect().head
    assert(r.getAs[Long]("hits_replacement") === 0L)
    assert(r.getAs[Long]("hits_control") === 0L)
    assert(r.getAs[Long]("hits_mojibake") === 0L)
    assert(r.getAs[Long]("n_docs") === 2L)
  }
}
