package graft.hll

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The SparkSessionExtensions installation path — what `--conf
 * spark.sql.extensions=graft.hll.GraftSparkExtensions` does on a cluster. */
class ExtensionsSpec extends AnyFunSuite {

  test("a session built withExtensions(GraftSparkExtensions) has every function in SQL") {
    // Extensions only apply at session construction, so this suite builds
    // its own; any session a previous suite left active is superseded (later
    // suites' getOrCreate then sees this one — a superset, nothing lost).
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-extensions-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftSparkExtensions)
      .getOrCreate()

    val names = Seq("hll_init", "hll_init_collection", "hll_init_agg",
      "hll_init_collection_agg", "hll_merge", "hll_row_merge",
      "hll_cardinality", "hll_intersect_cardinality", "hll_convert",
      "hll_init_hashed_agg", "hll_registers")
    names.foreach { n =>
      assert(spark.catalog.functionExists(n), s"$n missing from catalog")
    }

    // The bring-your-own-hash aggregate and the GRAFT register decoder
    // compose in pure SQL: md5-hashed values → STRM sketch → GRAFT bytes →
    // dense register array. 256 registers at p=8, at least one non-zero.
    val regs = spark.sql(
      """SELECT hll_registers(hll_convert(sk, 'STRM', 'GRAFT')) AS regs FROM
        |  (SELECT hll_init_hashed_agg(md5_hash64(CAST(id AS STRING)), 0.07D, 'STRM') AS sk
        |   FROM range(50))""".stripMargin).head().getSeq[Int](0)
    assert(regs.length === 256)
    assert(regs.exists(_ > 0))

    // End-to-end through the SQL parser/analyzer with no manual registration.
    val card = spark.sql(
      "SELECT hll_cardinality(hll_merge(h)) FROM " +
        "(SELECT hll_init_agg(id % 5) AS h FROM range(1000) GROUP BY id % 10)"
    ).head().getLong(0)
    assert(card === 5L)

    // DESCRIBE FUNCTION surfaces the usage doc like a built-in.
    val desc = spark.sql("DESCRIBE FUNCTION hll_init").collect().map(_.getString(0)).mkString("\n")
    assert(desc.contains("hll_init"))

    // Registry-completeness sweep: EVERY entry of every registration list
    // must exist in the catalog under its effective SQL name and DESCRIBE
    // with a real usage line — the PySpark/SQL path proven for the whole
    // library by enumeration, not a hand-maintained sample.
    val allRegistered: Seq[String] =
      HllFunctionRegistry.entries.map(_._1) ++
        graft.kll.KllFunctionRegistry.entries.map(_._1) ++
        graft.theta.ThetaFunctionRegistry.entries.map(e =>
          graft.theta.ThetaFunctionRegistry.sqlName(e._1)) ++
        graft.freq.FreqFunctionRegistry.entries.map(_._1) ++
        graft.bloom.BloomFunctionRegistry.entries.map(_._1) ++
        graft.GraftFunctionRegistry.entries.map(_._1)
    assert(allRegistered.size === allRegistered.distinct.size,
      "duplicate SQL names across registries")
    allRegistered.foreach { n =>
      assert(spark.catalog.functionExists(n), s"$n missing from catalog")
      val d = spark.sql(s"DESCRIBE FUNCTION EXTENDED $n")
        .collect().map(_.getString(0)).mkString("\n")
      assert(d.contains(n) && d.contains("Usage:"),
        s"DESCRIBE FUNCTION $n lacks a usage doc:\n$d")
    }

    // The newest kernel rides the same path: NFC through pure SQL. The
    // combining acute accent is embedded as a literal (Spark's chr() is
    // mod-256 ASCII, not a codepoint constructor like DuckDB's); the
    // decomposed e + U+0301 must compose to the single U+00E9 code point.
    val nfc = spark.sql(
      "SELECT nfc_normalize('café') AS s").head().getString(0)
    assert(nfc === "café")
    assert(nfc.length === 4)

    // The KLL family and the pipeline kernels ride the same extensions.
    // graft_theta_union: Spark 4.1 ships a built-in theta_union (two-sketch
    // scalar), so graft's union AGGREGATE registers under the graft_ prefix
    // instead of shadowing it.
    Seq("kll_init_agg", "kll_merge", "kll_quantile", "kll_rank", "kll_n",
      "kll_cdf", "kll_pmf",
      "theta_init_agg", "graft_theta_union", "theta_intersect", "theta_a_not_b",
      "theta_estimate", "freq_init_agg", "freq_merge", "freq_items",
      "freq_items_by_support", "freq_estimate", "freq_stream_length", "freq_max_error",
      "bloom_init_agg", "bloom_merge", "bloom_might_contain", "bloom_fill_fraction",
      "char_shingles", "word_shingles", "minhash_signature", "simhash64",
      "text_stats", "repetition_stats", "ngram_repetition_stats",
      "md5_hash64", "cosine_similarity",
      "dot_product", "quantize_int8", "int8_dot",
      "strip_html", "redact_pii", "scrub", "quality_score64", "zorder2",
      "hilbert2", "topk_structs").foreach { n =>
      assert(spark.catalog.functionExists(n), s"$n missing from catalog")
    }

    // The round-9 kernels through pure SQL: window fingerprints must
    // equal the scalar fingerprint of the joined window (the identity
    // RollingSpanHashesSpec pins on the DSL path), and the pair
    // generator must emit normalized (a, b) combinations.
    val spanRow = spark.sql(
      """SELECT rolling_span_hashes(array('a','bb','c'), 2) AS hs,
        |       rolling_hash64('a bb') AS h0, rolling_hash64('bb c') AS h1""".stripMargin)
      .head()
    assert(spanRow.getSeq[Long](0) === Seq(spanRow.getLong(1), spanRow.getLong(2)))
    val pairs = spark.sql(
      """SELECT p.a.id AS a, p.b.id AS b FROM (SELECT
        |  pair_collisions_explode(array(named_struct('id', 3L),
        |    named_struct('id', 1L), named_struct('id', 2L))) AS p)
        |ORDER BY a, b""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs === Seq((1L, 2L), (1L, 3L), (2L, 3L)))

    // Heavy-hitters through SQL: 0 appears 34 times in range(100) % 3.
    val freqTop = spark.sql(
      """SELECT freq_items(freq_init_agg(CAST(id % 3 AS STRING)), 34L) AS hh
        |FROM range(100)""".stripMargin).head().getSeq[org.apache.spark.sql.Row](0)
    assert(freqTop.map(r => (r.getString(0), r.getLong(1))) === Seq(("0", 34L)))

    // The graft union aggregate works under its prefixed name, and the
    // built-in theta_union keeps its native two-sketch-scalar semantics.
    val thetaMerged = spark.sql(
      """SELECT theta_estimate(graft_theta_union(sk)) AS n FROM
        |  (SELECT theta_init_agg(id % 7) AS sk FROM range(100) GROUP BY id % 4)
        |""".stripMargin).head().getLong(0)
    assert(thetaMerged === 7L)
    val builtinUnion = spark.sql(
      """SELECT theta_sketch_estimate(
        |  theta_union(theta_sketch_agg(a), theta_sketch_agg(b))) AS n
        |FROM VALUES (1, 10), (2, 20), (3, 10) AS t(a, b)""".stripMargin).head().getLong(0)
    assert(builtinUnion === 5L)
    val pipeline = spark.sql(
      """SELECT size(char_shingles('hello world', 5)) AS n_sh,
        |  size(minhash_signature(array('a','b'), 32)) AS n_sig,
        |  simhash64(array('x'), true) <> 0 AS has_sim,
        |  text_stats('the quick fox').n_tokens AS n_tok,
        |  round(cosine_similarity(array(1.0F, 0.0F), array(1.0F, 0.0F)), 9) AS cos,
        |  dot_product(array(2.0F, 3.0F), array(4.0F, 5.0F)) AS dot""".stripMargin).head()
    assert(pipeline.getInt(0) === 7)
    assert(pipeline.getInt(1) === 32)
    assert(pipeline.getBoolean(2))
    assert(pipeline.getInt(3) === 3)
    assert(pipeline.getDouble(4) === 1.0)
    assert(pipeline.getDouble(5) === 23.0)

    // Cleanup surface through pure SQL: markup stripped, PII tokenized —
    // the same expression trees the Scala DSL composes, SQL-reachable.
    val scrubbed = spark.sql(
      """SELECT scrub('<b>mail me</b> at a.b@example.com or 555-123-4567') AS s,
        |  strip_html('<p>x  y</p>') AS h,
        |  redact_pii('ping 10.0.0.1') AS p""".stripMargin).head()
    assert(scrubbed.getString(0) === "mail me at <EMAIL> or <PHONE>")
    assert(scrubbed.getString(1) === "x y")
    assert(scrubbed.getString(2) === "ping <IP>")

    // Z-order through SQL: known interleavings, and parity with the DSL.
    val zRow = spark.sql(
      "SELECT zorder2(1, 0) AS a, zorder2(0, 1) AS b, zorder2(65535, 65535) AS c").head()
    assert(zRow.getLong(0) === 1L)
    assert(zRow.getLong(1) === 2L)
    assert(zRow.getLong(2) === 0xFFFFFFFFL)
    val zSql = spark.sql("SELECT zorder2(12345, 54321) AS z").head().getLong(0)
    val zDsl = spark.range(1).select(graft.sources.Layout.zorder2(
      org.apache.spark.sql.functions.lit(12345L),
      org.apache.spark.sql.functions.lit(54321L)).as("z")).head().getLong(0)
    assert(zSql === zDsl)

    // Hilbert through SQL: the order-1 U, and parity with the DSL kernel.
    val hRow = spark.sql(
      "SELECT hilbert2(0, 0) AS a, hilbert2(0, 65535) AS b, hilbert2(65535, 0) AS c").head()
    assert(hRow.getLong(0) === 0L)
    // (0, n-1): every level lands in the ry=1/rx=0 sub-square (no
    // rotation), so d = sum of s^2 = (4^16 - 1)/3.
    assert(hRow.getLong(1) === ((1L << 32) - 1L) / 3L)
    // (n-1, 0): the reflect+swap fixed point, 3*s^2 per level — the
    // curve's final cell.
    assert(hRow.getLong(2) === (1L << 32) - 1L)
    // Top-k aggregate through SQL: 2 smallest (v, id) structs.
    val tk = spark.sql(
      """SELECT sort_array(topk_structs(struct(v, id), 2)) AS tk FROM
        |  VALUES (3L, 1L), (1L, 2L), (2L, 3L), (1L, 9L) AS t(v, id)""".stripMargin)
      .head().getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(tk === Seq((1L, 2L), (1L, 9L)))

    val hSql = spark.sql("SELECT hilbert2(12345, 54321) AS h").head().getLong(0)
    val hDsl = spark.range(1).select(graft.sources.Layout.hilbert2(
      org.apache.spark.sql.functions.lit(12345L),
      org.apache.spark.sql.functions.lit(54321L)).as("h")).head().getLong(0)
    assert(hSql === hDsl)

    // Quality scorer through SQL equals the Column DSL on the same text.
    val qsSql = spark.sql(
      "SELECT quality_score64('The quick brown Fox') AS s").head().getLong(0)
    val qsDsl = spark.range(1)
      .select(graft.text.TextAnalysis.linearQualityScore(
        org.apache.spark.sql.functions.lit("The quick brown Fox")).as("s"))
      .head().getLong(0)
    assert(qsSql === qsDsl)

    // Layer parity: the SQL function and the Column DSL must produce the
    // same bytes (decomposed e + combining accent, markup, and PII in one
    // string — exercises NFC-before-pattern ordering too).
    import spark.implicits._
    val tricky = "café <i>x</i> a.b@c.de 10.1.2.3 +1 555-123-4567"
    val viaSql = Seq(tricky).toDF("t")
      .selectExpr("scrub(t) AS s").head().getString(0)
    val viaDsl = Seq(tricky).toDF("t")
      .select(graft.text.Cleanup.scrub(org.apache.spark.sql.functions.col("t")).as("s"))
      .head().getString(0)
    assert(viaSql === viaDsl)
  }
}
