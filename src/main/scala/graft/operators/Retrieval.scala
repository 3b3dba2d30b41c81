package graft.operators

import graft.text.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Hybrid retrieval: the fusion step a RAG pipeline runs over its two
 * retrieval arms — a lexical (term-index) ranking and a semantic (ANN)
 * ranking — combined by reciprocal-rank fusion (Cormack et al., SIGIR
 * 2009: RRF(d) = Σ_arms 1/(K + rank_arm(d)) beats each arm alone and
 * needs no score calibration, only ranks).
 *
 * Everything is integer-exact: contributions are `1e6 div (K + rank)`,
 * so the fused score, its additions, and the final ordering reproduce
 * bit-for-bit on any engine — a SQL oracle re-ranks identically with no
 * float anywhere.
 */
object Retrieval {

  /** lcm(1..k): the shared denominator the eval family clears rank
   * fractions with (fits a Long for k ≤ 42 — callers validate). */
  private def lcmUpTo(k: Int): Long = {
    def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)
    (1L to k.toLong).reduce((a, b) => a / gcd(a, b) * b)
  }

  /** One-column (system: STRING) frame of the system names, for the
   * judged × systems grid every eval metric builds (zero-hit judged
   * queries must still ship rows). */
  private def sysNamesDf(systems: Seq[(String, DataFrame)],
      names: Seq[String]): DataFrame =
    systems.head._2.sparkSession
      .createDataFrame(java.util.Arrays.asList(
          names.map(org.apache.spark.sql.Row(_)): _*),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("system",
            org.apache.spark.sql.types.StringType, nullable = false))))

  /**
   * Lexical arm: per query document, the top-k corpus documents by
   * DISTINCT-term overlap (ties → smaller doc id), self excluded — the
   * rank list a posting-list index returns for "how many of the query's
   * terms does this doc contain".
   *
   * Scale shape: the query term table is |queries|·|query vocab| rows and
   * broadcasts; the corpus token relation (the q155 posting shape) joins
   * it map-side, the (query, doc) overlap counts combine before the
   * exchange, and the per-query top-k rides the bounded
   * [[TopK.topKStructs]] aggregate — at most k structs per query cross
   * the final exchange, never a whole ranked list. Overlap counting is
   * honest retrieval only when query terms are informative; at corpus
   * scale restrict queries (or the token relation) to non-stopword terms
   * upstream, exactly as a production index prunes its posting lists.
   *
   * @return (query_id, rank, doc_id, overlap), rank in [1, k]
   */
  def termOverlapTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    def terms(df: DataFrame, as: String) = df.select(col(idCol).as(as),
      explode(array_distinct(TextAnalysis.tokens(col(textCol)))).as("term"))
    val qt = terms(queries, "query_id")
    // Corpus-side tokenize+explode is this arm's dominant map work; a
    // corpus below one scan split would run it single-threaded (the q59
    // small-input guard — a no-op at real scale, where splits abound).
    val ct = terms(graft.dedup.Dedup.fanOutSmallScan(corpus), "doc_id")
    val overlap = ct.join(broadcast(qt), "term")
      .filter(col("doc_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(count(lit(1)).as("ov"))
    overlap
      .groupBy(col("query_id"))
      .agg(sort_array(TopK.topKStructs(struct(
        (-col("ov")).as("no"), col("doc_id").as("id")), k)).as("tk"))
      .select(col("query_id"), posexplode(col("tk")).as(Seq("pos", "t")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
        col("t.id").as("doc_id"), (-col("t.no")).as("overlap"))
  }

  /**
   * Reciprocal-rank fusion of any number of (query_id, rank, doc_id)
   * arms: fused_e6(d) = Σ_arms present `1e6 div (kConst + rank)`, final
   * order (fused desc, doc_id asc), top `topK` per query. A doc ranked
   * by only SOME arms simply contributes fewer terms — RRF's built-in
   * handling of partial coverage (`n_arms` reports it).
   *
   * Scale shape: the arm union is |arms|·|queries|·k slim coordinate
   * rows (each arm is already top-k-bounded), one combine-friendly
   * aggregation fuses them, and the final per-query top-k is again the
   * bounded aggregate — nothing here scales with the corpus, only with
   * the retrieved candidate sets.
   *
   * @return (query_id, rank, doc_id, rrf_e6, n_arms)
   */
  /**
   * Exact-rational retrieval evaluation — MRR@k and recall@k of each
   * ranked system (typically the RRF fusion vs each arm alone) against a
   * labeled relevance fixture, the measurement a RAG pipeline runs
   * before it trusts [[rrfFuse]] over a single arm.
   *
   * All statistics ship as INTEGERS so any engine re-derives them
   * bit-for-bit, float-free:
   *  - MRR@k is a sum of unit fractions 1/first_relevant_rank with every
   *    rank in [1, k], so lcm(1..k) is a common denominator:
   *    `mrr_num_x_lcm = Σ_q lcm/first_rank_q` (0 for queries with no
   *    relevant doc in the top k) and MRR = mrr_num_x_lcm /
   *    (mrr_lcm · n_judged). k ≤ 42 keeps lcm(1..k) inside a Long.
   *  - recall@k is the micro (corpus-level) pair `hits_at_k / rel_total`:
   *    judged relevant pairs retrieved in the top k over all judged
   *    relevant pairs.
   * Unjudged retrieved docs are ignored (standard pooling semantics);
   * judged queries a system retrieved nothing for still count in
   * `n_judged` and `rel_total`.
   *
   * Scale shape: each system is already top-k-bounded per query, so the
   * tagged union is |systems|·|queries|·k slim coordinate rows; the
   * relevance fixture is an eval-set table and BROADCASTS to both joins
   * (hit marking and the per-query judged counts); everything after the
   * hit join is group-bounded by (system, query). Nothing scales with
   * the corpus.
   *
   * @param systems  (name, ranking) pairs; each ranking is
   *                 (query_id, rank, doc_id) with rank 1-based
   * @param relevance judged relevant (query_id, doc_id) pairs
   * @return one row per system: (system, n_judged, hits_at_k, rel_total,
   *         mrr_num_x_lcm, mrr_lcm), ordered by system name
   */
  def evalAtK(systems: Seq[(String, DataFrame)], relevance: DataFrame,
      k: Int): DataFrame = {
    require(systems.nonEmpty, "need at least one ranked system")
    require(k >= 1 && k <= 42,
      s"k must be in [1, 42] (lcm(1..43) overflows Long), got $k")
    val names = systems.map(_._1)
    require(names.distinct.size == names.size,
      s"system names must be distinct, got $names")
    val lcmK = lcmUpTo(k)
    val rel = relevance
      .select(col("query_id"), col("doc_id")).distinct()
    val judged = rel.groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_rel"))
    val tagged = systems.map { case (name, df) =>
      df.filter(col("rank") <= k)
        .select(lit(name).as("system"), col("query_id"),
          col("rank").cast("int").as("rank"), col("doc_id"))
    }.reduce(_ union _)
    val hits = tagged.join(broadcast(rel), Seq("query_id", "doc_id"))
      .groupBy(col("system"), col("query_id"))
      .agg(min(col("rank")).as("first_rank"), count(lit(1)).as("n_hits"))
    val sysNames = sysNamesDf(systems, names)
    judged.crossJoin(broadcast(sysNames))
      .join(hits, Seq("system", "query_id"), "left")
      .groupBy(col("system"))
      .agg(count(lit(1)).as("n_judged"),
        coalesce(sum(col("n_hits")), lit(0L)).as("hits_at_k"),
        sum(col("n_rel")).as("rel_total"),
        coalesce(sum(expr(s"${lcmK}L div first_rank")), lit(0L))
          .as("mrr_num_x_lcm"))
      .withColumn("mrr_lcm", lit(lcmK))
      .orderBy(col("system"))
  }

  /**
   * Average precision at k, per (system, query), exact-rational — the
   * position-sensitive companion to [[evalAtK]] (MRR sees only the FIRST
   * hit; recall ignores order entirely; AP prices every hit by the
   * precision at its rank):
   *
   *   AP@k = Σ_{relevant hits at rank i ≤ k} P@i / min(n_rel, k),
   *   P@i = (relevant retrieved in top i) / i.
   *
   * With every i in [1, k], lcm(1..k) clears the P@i denominators:
   * `ap_num = Σ hits_i·(lcm div i)` and `ap_den = lcm·min(n_rel, k)` —
   * one integer pair per (system, query), any engine re-derives it
   * bit-for-bit. MAP@k is the consumer's mean over queries (a mean of
   * rationals with varying denominators — ship the rows, not a float).
   * Judged queries a system misses entirely still appear (ap_num = 0).
   *
   * Scale shape: identical to [[evalAtK]] — top-k-bounded coordinate
   * unions, broadcast relevance, and the one window (cumulative hits by
   * rank) runs inside (system, query) groups of ≤ k rows.
   *
   * @return (system, query_id, n_rel, hits_at_k, ap_num, ap_den),
   *         ordered by (system, query_id)
   */
  def apAtK(systems: Seq[(String, DataFrame)], relevance: DataFrame,
      k: Int): DataFrame = {
    require(systems.nonEmpty, "need at least one ranked system")
    require(k >= 1 && k <= 42,
      s"k must be in [1, 42] (lcm(1..43) overflows Long), got $k")
    val names = systems.map(_._1)
    require(names.distinct.size == names.size,
      s"system names must be distinct, got $names")
    val lcmK = lcmUpTo(k)
    val rel = relevance.select(col("query_id"), col("doc_id")).distinct()
    val judged = rel.groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_rel"))
    val tagged = systems.map { case (name, df) =>
      df.filter(col("rank") <= k)
        .select(lit(name).as("system"), col("query_id"),
          col("rank").cast("int").as("rank"), col("doc_id"))
    }.reduce(_ union _)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("system"), col("query_id")).orderBy(col("rank"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val perQuery = tagged.join(broadcast(rel), Seq("query_id", "doc_id"))
      .select(col("system"), col("query_id"), col("rank"),
        count(lit(1)).over(w).as("hits_i"))
      .groupBy(col("system"), col("query_id"))
      .agg(count(lit(1)).as("hits_at_k"),
        sum(col("hits_i") * expr(s"${lcmK}L div rank")).as("ap_sum"))
    val sysNames = sysNamesDf(systems, names)
    judged.crossJoin(broadcast(sysNames))
      .join(perQuery, Seq("system", "query_id"), "left")
      .select(col("system"), col("query_id"), col("n_rel"),
        coalesce(col("hits_at_k"), lit(0L)).as("hits_at_k"),
        coalesce(col("ap_sum"), lit(0L)).as("ap_num"),
        (lit(lcmK) * least(col("n_rel"), lit(k.toLong))).as("ap_den"))
      .orderBy(col("system"), col("query_id"))
  }

  /**
   * Expected reciprocal rank at k (Chapelle et al., CIKM 2009), per
   * (system, query), exact-rational — the GRADED-relevance companion to
   * [[evalAtK]]/[[apAtK]] (those see judged/unjudged; ERR models a user
   * scanning down the ranking who stops at a document with probability
   * proportional to its relevance GRADE, so a barely-relevant hit at
   * rank 1 scores differently from a perfect one):
   *
   *   ERR@k = Σ_{r=1..k} (1/r) · R_r · Π_{i<r} (1 − R_i),
   *   R_i = (2^{g_i} − 1) / 2^{gMax},  g_i ∈ [0, gMax].
   *
   * Everything is integer: with n_i = 2^{g_i} − 1 and m = 2^{gMax}, the
   * common denominator lcm(1..k)·m^k clears every term —
   * `err_num = Σ_r (lcm div r)·n_r·Π_{i<r}(m−n_i)·m^{k−r}` — so any
   * engine re-derives the pair bit-for-bit (the DuckDB oracle folds the
   * same recurrence through a bounded recursive CTE). The ordered prefix
   * product runs in ONE `aggregate` fold over the ≤ k collected
   * (rank, n) structs per (system, query) group; overflow is excluded up
   * front (k·lcm·2^{gMax·k} must fit a Long — k=10, gMax=2 uses ~35 of
   * 63 bits).
   *
   * Scale shape: identical to [[evalAtK]] — top-k-bounded coordinate
   * unions, broadcast graded relevance, and the fold inside
   * (system, query) groups of ≤ k rows. Nothing scales with the corpus.
   *
   * @param relevance graded judgments (query_id, doc_id, grade), grade
   *                  ≥ 1 (unjudged pairs are grade 0 by absence);
   *                  duplicate pairs keep the max grade
   * @return (system, query_id, n_graded, err_num, err_den), ordered by
   *         (system, query_id); ERR@k = err_num / err_den
   */
  def errAtK(systems: Seq[(String, DataFrame)], relevance: DataFrame,
      k: Int, gMax: Int = 2): DataFrame = {
    require(systems.nonEmpty, "need at least one ranked system")
    require(k >= 1 && k <= 42,
      s"k must be in [1, 42] (lcm(1..43) overflows Long), got $k")
    require(gMax >= 1, s"gMax must be >= 1, got $gMax")
    val names = systems.map(_._1)
    require(names.distinct.size == names.size,
      s"system names must be distinct, got $names")
    val lcmK = lcmUpTo(k)
    require(BigInt(k) * BigInt(lcmK) * (BigInt(1) << (gMax * k)) <
        BigInt(Long.MaxValue),
      s"k=$k, gMax=$gMax overflows the Long error-free window")
    val m = 1L << gMax
    val rel = relevance
      .groupBy(col("query_id"), col("doc_id"))
      .agg(max(col("grade")).cast("int").as("grade"))
      .filter(col("grade") >= 1)
      .select(col("query_id"), col("doc_id"),
        expr(s"shiftleft(1L, least(grade, $gMax)) - 1L").as("n"))
    val judged = rel.groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_graded"))
    val tagged = systems.map { case (name, df) =>
      df.filter(col("rank") <= k)
        .select(lit(name).as("system"), col("query_id"),
          col("rank").cast("int").as("rank"), col("doc_id"))
    }.reduce(_ union _)
    val folded = tagged.join(broadcast(rel), Seq("query_id", "doc_id"), "left")
      .select(col("system"), col("query_id"), col("rank"),
        coalesce(col("n"), lit(0L)).as("n"))
      .groupBy(col("system"), col("query_id"))
      .agg(sort_array(collect_list(struct(col("rank"), col("n")))).as("rn"))
      .select(col("system"), col("query_id"),
        expr(
          s"""aggregate(rn, named_struct('s', 0L, 'p', 1L),
             |  (a, x) -> named_struct(
             |    's', a.s + (${lcmK}L div x.rank) * x.n * a.p *
             |           shiftleft(1L, $gMax * ($k - x.rank)),
             |    'p', a.p * (${m}L - x.n)),
             |  a -> a.s)""".stripMargin).as("err_num"))
    val sysNames = sysNamesDf(systems, names)
    judged.crossJoin(broadcast(sysNames))
      .join(folded, Seq("system", "query_id"), "left")
      .select(col("system"), col("query_id"), col("n_graded"),
        coalesce(col("err_num"), lit(0L)).as("err_num"),
        lit(lcmK * (1L << (gMax * k))).as("err_den"))
      .orderBy(col("system"), col("query_id"))
  }

  /**
   * Normalized discounted cumulative gain at k, per (system, query),
   * exact-rational — the graded-relevance ranking read that completes
   * the eval family ([[evalAtK]] MRR/recall, [[apAtK]] MAP, [[errAtK]]
   * ERR): gain 2^{g_r} − 1 (Burges et al., ICML 2005's exponential
   * gain, the web-search convention), discount 1/r with the rank
   * denominators cleared by lcm(1..k), and the per-query normalizer
   * IDCG = the same sum over the judged gains sorted descending
   * (truncated at k). Järvelin & Kekäläinen (TOIS 2002) define the
   * discount as a free monotone parameter; the RECIPROCAL discount is
   * chosen over their log2(r+1) example because log2(3) is irrational —
   * no integer representation exists — while 1/r keeps every shipped
   * number an exact integer any engine re-derives bit-for-bit (and
   * matches the rank weight ERR's cascade uses).
   *
   *   dcg_num  = Σ_{r≤k, retrieved} (lcm div r)·(2^{g_r} − 1)
   *   idcg_num = Σ_{i≤min(k,|judged|)} (lcm div i)·n_(i)  (gains desc)
   *   nDCG@k   = dcg_num / idcg_num   (the lcm cancels)
   *
   * Everything ships as BIGINT (the FIXTURES.md output-type contract);
   * overflow is excluded up front (k·lcm·(2^{gMax}−1) must fit a Long —
   * k=10, gMax=2 uses ~17 of 63 bits).
   *
   * Scale shape: identical to [[errAtK]] — top-k-bounded coordinate
   * unions, broadcast graded relevance, and the ideal ordering rides
   * the bounded [[TopK.topKStructs]] aggregate (≤ k gains per query
   * cross the exchange, never a whole judged list). Nothing scales
   * with the corpus.
   *
   * @param relevance graded judgments (query_id, doc_id, grade), grade
   *                  ≥ 1 (unjudged pairs are gain 0 by absence);
   *                  duplicate pairs keep the max grade
   * @return (system, query_id, n_graded, dcg_num, idcg_num), ordered by
   *         (system, query_id); nDCG@k = dcg_num / idcg_num ∈ [0, 1]
   */
  def ndcgAtK(systems: Seq[(String, DataFrame)], relevance: DataFrame,
      k: Int, gMax: Int = 2): DataFrame = {
    require(systems.nonEmpty, "need at least one ranked system")
    require(k >= 1 && k <= 42,
      s"k must be in [1, 42] (lcm(1..43) overflows Long), got $k")
    require(gMax >= 1, s"gMax must be >= 1, got $gMax")
    val names = systems.map(_._1)
    require(names.distinct.size == names.size,
      s"system names must be distinct, got $names")
    val lcmK = lcmUpTo(k)
    require(BigInt(k) * BigInt(lcmK) * ((BigInt(1) << gMax) - 1) <
        BigInt(Long.MaxValue),
      s"k=$k, gMax=$gMax overflows the Long error-free window")
    val rel = relevance
      .groupBy(col("query_id"), col("doc_id"))
      .agg(max(col("grade")).cast("int").as("grade"))
      .filter(col("grade") >= 1)
      .select(col("query_id"), col("doc_id"),
        expr(s"shiftleft(1L, least(grade, $gMax)) - 1L").as("n"))
    // Ideal DCG: top-k judged gains per query, descending (doc_id breaks
    // ties deterministically; the SUM is tie-order-invariant). The fold
    // carries the 1-based position for the lcm-cleared discount.
    val ideal = rel.groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_graded"),
        sort_array(TopK.topKStructs(struct(
          (-col("n")).as("nn"), col("doc_id").as("id")), k)).as("tk"))
      .select(col("query_id"), col("n_graded"),
        expr(
          s"""aggregate(tk, named_struct('s', 0L, 'i', 1L),
             |  (a, x) -> named_struct(
             |    's', a.s + (${lcmK}L div a.i) * (-x.nn),
             |    'i', a.i + 1L),
             |  a -> a.s)""".stripMargin).as("idcg_num"))
    val tagged = systems.map { case (name, df) =>
      df.filter(col("rank") <= k)
        .select(lit(name).as("system"), col("query_id"),
          col("rank").cast("int").as("rank"), col("doc_id"))
    }.reduce(_ union _)
    val dcg = tagged.join(broadcast(rel), Seq("query_id", "doc_id"))
      .groupBy(col("system"), col("query_id"))
      .agg(sum(expr(s"${lcmK}L div rank") * col("n")).as("dcg_num"))
    val sysNames = sysNamesDf(systems, names)
    ideal.crossJoin(broadcast(sysNames))
      .join(dcg, Seq("system", "query_id"), "left")
      .select(col("system"), col("query_id"), col("n_graded"),
        coalesce(col("dcg_num"), lit(0L)).as("dcg_num"), col("idcg_num"))
      .orderBy(col("system"), col("query_id"))
  }

  /**
   * Rank agreement between two retrieval arms (Kendall's tau), EXACT:
   * over the documents BOTH arms rank in their top k for a query, the
   * pair counts
   *
   *   tau = (concordant − discordant) / (m(m−1)/2)
   *
   * — the "do the arms agree on ORDER where they overlap" read that
   * decides whether fusing them can add signal (tau ≈ 1: the arms are
   * redundant; tau ≪ 1: they rank the shared docs differently and RRF
   * has something to reconcile). Ranks are positions (no ties), so
   * discordant = inversions of arm B's ranks taken in arm A's order,
   * and every quantity is an integer any engine re-derives — the
   * oracle counts the same inversions by self-joining the ≤ k shared
   * coordinates per query.
   *
   * Scale shape: the shared set is an equi-join of top-k-bounded slim
   * coordinates; the inversion count folds inside one `aggregate` over
   * the ≤ k collected (ra, rb) structs per query — one exchange,
   * nothing scales with the corpus. Queries whose arms share < 2 docs
   * ship tau_den = 0 (no pair to price); queries sharing nothing are
   * absent (neither engine can rank agreement over an empty set).
   *
   * @param rankA,rankB (query_id, rank, doc_id) rankings, rank 1-based
   * @return (query_id, m, inversions, tau_num, tau_den) per query with
   *         ≥ 1 shared doc, ordered by query_id
   */
  def kendallTau(rankA: DataFrame, rankB: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    val a = rankA.filter(col("rank") <= k)
      .select(col("query_id"), col("doc_id"), col("rank").cast("int").as("ra"))
    val b = rankB.filter(col("rank") <= k)
      .select(col("query_id"), col("doc_id"), col("rank").cast("int").as("rb"))
    a.join(b, Seq("query_id", "doc_id"))
      .groupBy(col("query_id"))
      .agg(sort_array(collect_list(struct(col("ra"), col("rb")))).as("ps"))
      // Bind the rb-in-ra-order array in its own projection (q64 rule).
      .select(col("query_id"),
        expr("transform(ps, p -> p.rb)").as("rs"))
      .select(col("query_id"), size(col("rs")).cast("long").as("m"),
        expr(
          """CASE WHEN size(rs) < 2 THEN 0L ELSE
            |  aggregate(sequence(1, size(rs) - 1), 0L, (acc, i) ->
            |    acc + size(filter(slice(rs, i + 1, size(rs) - i),
            |      x -> x < element_at(rs, i))))
            |END""".stripMargin).as("inversions"))
      .select(col("query_id"), col("m"), col("inversions"),
        (expr("m * (m - 1L) div 2") - lit(2L) * col("inversions"))
          .as("tau_num"),
        expr("m * (m - 1L) div 2").as("tau_den"))
      .orderBy(col("query_id"))
  }

  /** The per-depth weights of truncated rank-biased overlap at
   * persistence p = 9/10, cleared to integers over the common
   * denominator D = 10^k·lcm(1..k): a doc whose worse rank across the
   * two lists is m contributes W(m) = Σ_{d=m..k} 9^{d-1}·D/(10^d·d)
   * to the numerator (the standard X_d-sum reordered per doc, so the
   * aggregation is one weighted count instead of k overlap counts).
   * Exposed so the DuckDB oracle interpolates the SAME integers —
   * weights and denominator cannot drift from the operator. k ≤ 12
   * keeps D ≤ 2.8e16 and every numerator comfortably in a long. */
  def rboWeights(k: Int): (Seq[Long], Long) = {
    require(k >= 1 && k <= 12, s"k must be in [1, 12], got $k")
    val lcm = (1 to k).foldLeft(BigInt(1))((l, i) => l * i / l.gcd(BigInt(i)))
    val d = BigInt(10).pow(k) * lcm
    val w = (1 to k).map { m =>
      (m to k).map(e => BigInt(9).pow(e - 1) * (d / (BigInt(10).pow(e) * e)))
        .sum.toLong
    }
    (w, d.toLong)
  }

  /**
   * Rank-biased overlap (Webber, Moffat & Zobel 2010) between two
   * top-k rankings, truncated at depth k with persistence p = 9/10, as
   * an EXACT integer rational — the top-weighted rank-agreement read
   * that [[kendallTau]] cannot give: tau sees only the docs BOTH arms
   * retrieved and weighs every inversion equally, while RBO prices
   * disagreement by depth (rank-1 disagreement costs ~10× rank-10) and
   * charges for docs one arm retrieved and the other missed.
   *
   * RBO@k = (1−p)·Σ_{d=1..k} p^{d-1}·|A_{1..d} ∩ B_{1..d}|/d. Per
   * shared doc the sum telescopes to one weight at m = max(rank_A,
   * rank_B) ([[rboWeights]]), so the whole statistic is a weighted
   * count over the ≤k-row per-query join of the two arms — nothing
   * scales with the corpus, only with retrieved candidate sets (the
   * q202 family's scale posture). Queries where the arms share nothing
   * ship (overlap 0, rbo 0/D) via the query-id union, not silence.
   *
   * @param rankA,rankB (query_id, doc_id, rank) with rank 1-based
   * @return one row per query_id: (query_id, overlap_k, rbo_num,
   *         rbo_den) with rbo = rbo_num/rbo_den exactly
   */
  def rbo(rankA: DataFrame, rankB: DataFrame, k: Int): DataFrame = {
    val (ws, den) = rboWeights(k)
    val a = rankA.filter(col("rank") <= k)
      .select(col("query_id"), col("doc_id"), col("rank").cast("int").as("ra"))
    val b = rankB.filter(col("rank") <= k)
      .select(col("query_id"), col("doc_id"), col("rank").cast("int").as("rb"))
    val qs = a.select(col("query_id")).union(b.select(col("query_id")))
      .distinct()
    val shared = a.join(b, Seq("query_id", "doc_id"))
      .select(col("query_id"),
        element_at(array(ws.map(lit): _*), greatest(col("ra"), col("rb")))
          .as("w"))
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("overlap_k"),
        coalesce(sum(col("w")), lit(0L)).as("rbo_num"))
    qs.join(shared, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("overlap_k"), lit(0L)).as("overlap_k"),
        coalesce(col("rbo_num"), lit(0L)).as("rbo_num"),
        lit(den).as("rbo_den"))
      .orderBy(col("query_id"))
  }

  def rrfFuse(arms: Seq[DataFrame], kConst: Int = 60, topK: Int = 10): DataFrame = {
    require(arms.nonEmpty, "need at least one retrieval arm")
    require(kConst >= 0, s"kConst must be non-negative, got $kConst")
    require(topK > 0, s"topK must be positive, got $topK")
    val contrib = arms.map(_.select(col("query_id"), col("doc_id"),
        expr(s"1000000L div ($kConst + rank)").as("c")))
      .reduce(_ union _)
    contrib
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("c")).as("rrf_e6"), count(lit(1)).as("n_arms"))
      .groupBy(col("query_id"))
      .agg(sort_array(TopK.topKStructs(struct(
        (-col("rrf_e6")).as("ns"), col("doc_id").as("id"),
        col("rrf_e6").as("s"), col("n_arms").as("na")), topK)).as("tk"))
      .select(col("query_id"), posexplode(col("tk")).as(Seq("pos", "t")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
        col("t.id").as("doc_id"), col("t.s").as("rrf_e6"),
        col("t.na").as("n_arms"))
  }
}
