package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.graft.GraftSqlBridge
import org.scalatest.funsuite.AnyFunSuite

/**
 * The SQL-surface matrix's spec half (r16 verdict task 3): for EVERY
 * name registered by any of the six function registries, the SQL path
 * (parser → FunctionRegistry → explicit arity builder) must produce the
 * same value as constructing the expression directly through the same
 * builder — SQL ≡ DSL per name. The probe-arg table below is keyed by
 * registered name and the test FAILS if a registry grows a name without
 * a probe, so the matrix cannot silently go stale. q249 is the
 * driver-gate (DuckDB-oracled) half of the same contract.
 */
class SqlSurfaceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-sql-surface-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Per-name minimal probe: the SQL argument text and the SAME
   * arguments as expressions for the direct builder call. Aggregates
   * run over a one-row frame, so both paths yield one comparable row. */
  private def sqlArgs: Map[String, (String, Seq[Expression])] = {
    def s(v: String) = Literal.create(v)
    def i(v: Int) = Literal.create(v)
    def l(v: Long) = Literal.create(v)
    def d(v: Double) = Literal.create(v)
    import org.apache.spark.sql.functions.typedLit
    val tokens = "array('a', 'b', 'a')"
    val tokensE = GraftSqlBridge.expression(typedLit(Seq("a", "b", "a")))
    val floats = "array(CAST(1.5 AS FLOAT), CAST(-2.5 AS FLOAT))"
    val floatsE = GraftSqlBridge.expression(typedLit(Seq(1.5f, -2.5f)))
    val bytes = "array(CAST(3 AS TINYINT), CAST(-4 AS TINYINT))"
    val bytesE = GraftSqlBridge.expression(typedLit(Seq(3.toByte, (-4).toByte)))
    Map(
      "char_shingles" -> (("'hello world', 3", Seq(s("hello world"), i(3)))),
      "word_shingles" -> ((s"$tokens, 2", Seq(tokensE, i(2)))),
      "minhash_signature" -> ((s"$tokens, 4", Seq(tokensE, i(4)))),
      "simhash64" -> ((s"$tokens, true", Seq(tokensE, Literal.create(true)))),
      "text_stats" -> (("'the quick fox'", Seq(s("the quick fox")))),
      "repetition_stats" -> (("'a\nb\na'", Seq(s("a\nb\na")))),
      "ngram_repetition_stats" -> (("'a b a b a', 2", Seq(s("a b a b a"), i(2)))),
      "word_ngrams_explode" -> (("'a b c', 2", Seq(s("a b c"), i(2)))),
      "md5_hash64" -> (("'x'", Seq(s("x")))),
      "cosine_similarity" -> ((s"$floats, $floats", Seq(floatsE, floatsE))),
      "dot_product" -> ((s"$floats, $floats", Seq(floatsE, floatsE))),
      "quantize_int8" -> ((floats, Seq(floatsE))),
      "int8_dot" -> ((s"$bytes, $bytes", Seq(bytesE, bytesE))),
      "nfc_normalize" -> (("'é'", Seq(s("é")))),
      "strip_html" -> (("'<b>x</b> y'", Seq(s("<b>x</b> y")))),
      "redact_pii" -> (("'a@b.com'", Seq(s("a@b.com")))),
      "scrub" -> (("'<i>a@b.com</i>'", Seq(s("<i>a@b.com</i>")))),
      "bpe_encode" -> (("'ab', array(array('a','b'))",
        Seq(s("ab"), GraftSqlBridge.expression(
          org.apache.spark.sql.functions.typedLit(Seq(Seq("a", "b"))))))),
      "quality_score64" -> (("'the fox'", Seq(s("the fox")))),
      "zorder2" -> (("3, 5", Seq(i(3), i(5)))),
      "topk_structs" -> (("named_struct('v', id), 2",
        Seq(GraftSqlBridge.expression(org.apache.spark.sql.functions.struct(
          org.apache.spark.sql.functions.col("id").as("v"))), i(2)))),
      "hilbert2" -> (("3, 5", Seq(i(3), i(5)))),
      "rolling_hash64" -> (("'abc'", Seq(s("abc")))),
      "rolling_span_hashes" -> ((s"$tokens, 2", Seq(tokensE, i(2)))),
      "pair_collisions_explode" ->
        (("array(named_struct('id', 2L), named_struct('id', 1L))",
          Seq(GraftSqlBridge.expression(lit(null))))), // DSL side built inline below (struct array literal)
      "greedy_pack_explode" ->
        (("array(named_struct('id', 1L, 'w', 3L), named_struct('id', 2L, 'w', 3L)), 5",
          Seq(GraftSqlBridge.expression(lit(null))))),
      "hll_init" -> (("7", Seq(Literal.create(7)))),
      "hll_init_collection" -> ((tokens, Seq(tokensE))),
      "hll_init_agg" -> (("id", Seq(GraftSqlBridge.expression(org.apache.spark.sql.functions.col("id"))))),
      "hll_init_collection_agg" -> ((tokens, Seq(tokensE))),
      "hll_init_hashed_agg" -> (("id", Seq(GraftSqlBridge.expression(org.apache.spark.sql.functions.col("id"))))),
      "theta_init_agg" -> (("id", Seq(GraftSqlBridge.expression(org.apache.spark.sql.functions.col("id"))))),
      "kll_init_agg" -> (("CAST(id AS DOUBLE)",
        Seq(GraftSqlBridge.expression(org.apache.spark.sql.functions.col("id").cast("double"))))),
      "freq_init_agg" -> (("CAST(id AS STRING)",
        Seq(GraftSqlBridge.expression(org.apache.spark.sql.functions.col("id").cast("string"))))),
      "bloom_init_agg" -> (("CAST(id AS STRING)",
        Seq(GraftSqlBridge.expression(org.apache.spark.sql.functions.col("id").cast("string")))))
    )
  }

  /** Composite probes for the names whose arguments are sketches (the
   * evaluators): one FULL statement per name over the 3-row probe view.
   * Merge aggregates build their input sketches in a subquery —
   * aggregates can't nest (the documented Spark contract). */
  private def compositeCalls: Map[String, String] = {
    val t = graft.theta.ThetaFunctionRegistry.sqlName _
    val v = "sql_surface_probe_v"
    Map(
      "hll_merge" ->
        s"SELECT hll_cardinality(hll_merge(h)) AS r FROM (SELECT hll_init(id) AS h FROM $v)",
      "hll_row_merge" ->
        s"SELECT hll_cardinality(hll_row_merge(hll_init(id), hll_init(id))) AS r FROM $v",
      "hll_cardinality" -> s"SELECT hll_cardinality(hll_init(id)) AS r FROM $v",
      "hll_intersect_cardinality" ->
        s"SELECT hll_intersect_cardinality(hll_init(id), hll_init(id)) AS r FROM $v",
      "hll_convert" ->
        s"SELECT hll_cardinality(hll_convert(hll_init(id), 'STRM', 'GRAFT'), 'GRAFT') AS r FROM $v",
      "hll_registers" ->
        s"SELECT size(hll_registers(hll_convert(hll_init(id), 'STRM', 'GRAFT'))) AS r FROM $v",
      "theta_union" ->
        s"""SELECT ${t("theta_estimate")}(${t("theta_union")}(sk)) AS r FROM
           |  (SELECT ${t("theta_init_agg")}(id) AS sk FROM $v GROUP BY id % 2)""".stripMargin,
      "theta_intersect" ->
        s"SELECT ${t("theta_estimate")}(${t("theta_intersect")}(${t("theta_init_agg")}(id), ${t("theta_init_agg")}(id))) AS r FROM $v",
      "theta_a_not_b" ->
        s"SELECT ${t("theta_estimate")}(${t("theta_a_not_b")}(${t("theta_init_agg")}(id), ${t("theta_init_agg")}(id))) AS r FROM $v",
      "theta_estimate" ->
        s"SELECT ${t("theta_estimate")}(${t("theta_init_agg")}(id)) AS r FROM $v",
      "kll_merge" ->
        s"""SELECT kll_n(kll_merge(sk)) AS r FROM
           |  (SELECT kll_init_agg(CAST(id AS DOUBLE)) AS sk FROM $v GROUP BY id % 2)""".stripMargin,
      "kll_quantile" ->
        s"SELECT kll_quantile(kll_init_agg(CAST(id AS DOUBLE)), CAST(0.5 AS DOUBLE)) AS r FROM $v",
      "kll_rank" ->
        s"SELECT kll_rank(kll_init_agg(CAST(id AS DOUBLE)), CAST(1.0 AS DOUBLE)) AS r FROM $v",
      "kll_n" -> s"SELECT kll_n(kll_init_agg(CAST(id AS DOUBLE))) AS r FROM $v",
      "kll_cdf" ->
        s"SELECT element_at(kll_cdf(kll_init_agg(CAST(id AS DOUBLE)), array(CAST(1.0 AS DOUBLE))), 1) AS r FROM $v",
      "kll_pmf" ->
        s"SELECT element_at(kll_pmf(kll_init_agg(CAST(id AS DOUBLE)), array(CAST(1.0 AS DOUBLE))), 1) AS r FROM $v",
      "freq_merge" ->
        s"""SELECT freq_stream_length(freq_merge(f)) AS r FROM
           |  (SELECT freq_init_agg(CAST(id AS STRING)) AS f FROM $v GROUP BY id % 2)""".stripMargin,
      "freq_items" ->
        s"SELECT size(freq_items(freq_init_agg(CAST(id AS STRING)), 1L)) AS r FROM $v",
      "freq_items_by_support" ->
        s"SELECT size(freq_items_by_support(freq_init_agg(CAST(id AS STRING)), 1000L)) AS r FROM $v",
      "freq_estimate" ->
        s"SELECT freq_estimate(freq_init_agg(CAST(id AS STRING)), '1') AS r FROM $v",
      "freq_stream_length" ->
        s"SELECT freq_stream_length(freq_init_agg(CAST(id AS STRING))) AS r FROM $v",
      "freq_max_error" ->
        s"SELECT freq_max_error(freq_init_agg(CAST(id AS STRING))) AS r FROM $v",
      "bloom_merge" ->
        s"""SELECT bloom_fill_fraction(bloom_merge(f)) AS r FROM
           |  (SELECT bloom_init_agg(CAST(id AS STRING)) AS f FROM $v GROUP BY id % 2)""".stripMargin,
      "bloom_might_contain" ->
        s"SELECT bloom_might_contain(bloom_init_agg(CAST(id AS STRING)), '1') AS r FROM $v",
      "bloom_fill_fraction" ->
        s"SELECT CAST(bloom_fill_fraction(bloom_init_agg(CAST(id AS STRING))) > CAST(0.0 AS DOUBLE) AS STRING) AS r FROM $v"
    )
  }

  private def allRegistered: Seq[String] = {
    val t = graft.theta.ThetaFunctionRegistry.sqlName _
    graft.GraftFunctionRegistry.entries.map(_._1) ++
      graft.hll.HllFunctionRegistry.entries.map(_._1) ++
      graft.theta.ThetaFunctionRegistry.entries.map(e => t(e._1)) ++
      graft.kll.KllFunctionRegistry.entries.map(_._1) ++
      graft.freq.FreqFunctionRegistry.entries.map(_._1) ++
      graft.bloom.BloomFunctionRegistry.entries.map(_._1)
  }

  private def registerAll(s: SparkSession): Unit = {
    graft.GraftFunctionRegistry.registerFunctions(s)
    graft.hll.HllFunctionRegistry.registerFunctions(s)
    graft.theta.ThetaFunctionRegistry.registerFunctions(s)
    graft.kll.KllFunctionRegistry.registerFunctions(s)
    graft.freq.FreqFunctionRegistry.registerFunctions(s)
    graft.bloom.BloomFunctionRegistry.registerFunctions(s)
  }

  test("every registered name has a probe: q249 + this spec cover the full surface") {
    registerAll(spark)
    val names = allRegistered
    assert(names.distinct.size === names.size, s"duplicate registrations: $names")
    val theta = graft.theta.ThetaFunctionRegistry.sqlName _
    val plainOf: Map[String, String] =
      graft.theta.ThetaFunctionRegistry.entries
        .map(e => theta(e._1) -> e._1).toMap
    val probed = sqlArgs.keySet ++ compositeCalls.keySet
    val missing = names.filterNot(n =>
      probed.contains(n) || probed.contains(plainOf.getOrElse(n, n)))
    assert(missing.isEmpty,
      s"registered names without a SQL-surface probe (add to SqlSurfaceSpec AND q249): $missing")
    // ...and q249's arm list stays in lockstep with the registries.
    val q249 = SqlSurfaceQueries.queries("q249_sql_surface_matrix")(
      spark, "/root/testdata/sf0.001")
    val fns = q249.collect().map(_.getString(0)).toSet
    assert(fns === names.toSet,
      s"q249 rows diverge from the registries: missing=${names.toSet -- fns} extra=${fns -- names.toSet}")
  }

  test("SQL path ≡ direct builder per simple-arg name (value equality end-to-end)") {
    registerAll(spark)
    val theta = graft.theta.ThetaFunctionRegistry.sqlName _
    val builders: Map[String, Seq[Expression] => Expression] =
      (graft.GraftFunctionRegistry.entries.map(e => e._1 -> e._3) ++
        graft.hll.HllFunctionRegistry.entries.map(e => e._1 -> e._3) ++
        graft.theta.ThetaFunctionRegistry.entries.map(e => theta(e._1) -> e._3) ++
        graft.kll.KllFunctionRegistry.entries.map(e => e._1 -> e._3) ++
        graft.freq.FreqFunctionRegistry.entries.map(e => e._1 -> e._3) ++
        graft.bloom.BloomFunctionRegistry.entries.map(e => e._1 -> e._3)).toMap
    val generators = Set("word_ngrams_explode", "pair_collisions_explode",
      "greedy_pack_explode")
    val frame = spark.range(1, 4) // ids 1, 2, 3
    frame.createOrReplaceTempView("sql_surface_probe_v")
    sqlArgs.foreach { case (name0, (argSql, argExprs)) =>
      val name = if (builders.contains(name0)) name0 else theta(name0)
      if (generators.contains(name)) {
        // Generators: the SQL path must parse, plan, and emit rows.
        val viaSql = spark.sql(
          s"SELECT $name($argSql) FROM sql_surface_probe_v WHERE id = 1").count()
        assert(viaSql > 0, s"$name produced no rows through SQL")
      } else {
        val viaSql = spark.sql(
          s"SELECT $name($argSql) AS r FROM sql_surface_probe_v").collect()
        val dslExpr = builders(name)(argExprs) match {
          // SQL registration hands raw AggregateFunctions to the
          // analyzer, which wraps them; the direct-Column path must
          // wrap explicitly.
          case a: org.apache.spark.sql.catalyst.expressions.aggregate.AggregateFunction =>
            a.toAggregateExpression()
          case e => e
        }
        val viaDsl = frame.select(GraftSqlBridge.column(dslExpr).as("r")).collect()
        assert(viaSql.map(r => norm(r.get(0))).toSeq ===
          viaDsl.map(r => norm(r.get(0))).toSeq,
          s"$name: SQL path and direct builder disagree")
      }
    }
  }

  /** Structural value normalizer: byte arrays (sketch blobs) compare by
   * reference under Row.toString/equals — render every container to
   * comparable Seqs. */
  private def norm(v: Any): Any = v match {
    case b: Array[Byte] => b.toSeq
    case a: Array[_] => a.toSeq.map(norm)
    case s: scala.collection.Seq[_] => s.map(norm)
    case r: org.apache.spark.sql.Row => r.toSeq.map(norm)
    case x => x
  }

  test("SQL path executes per composite (sketch-evaluator) name") {
    registerAll(spark)
    val frame = spark.range(1, 4)
    frame.createOrReplaceTempView("sql_surface_probe_v")
    compositeCalls.foreach { case (_, call) =>
      // Aggregate-rooted probes produce one row; scalar-rooted (per-row
      // hll_init) produce one per input row — either way, non-null.
      val rows = spark.sql(call).collect()
      assert(rows.nonEmpty && rows.forall(_.get(0) != null),
        s"composite probe failed: $call")
    }
  }

  test("q249 plan pin: slice filters reach the parquet scans pushed down") {
    // The matrix is a surface check, but its plan must still be the one
    // you'd run at scale: every probe's doc_id/l_orderkey slice lands in
    // the scan as a pushed filter, not a post-scan Filter over full
    // tables.
    val df = SqlSurfaceQueries.queries("q249_sql_surface_matrix")(
      spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(doc_id), LessThan(doc_id,40)]"),
      "documents slice not pushed to the scan")
    assert(plan.contains("LessThan(l_orderkey,200)"),
      "lineitem slice not pushed to the scan")
  }
}
