package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RetrievalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-retrieval-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def docs(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def arm(rows: (Long, Int, Long)*): DataFrame = {
    import spark.implicits._
    rows.toDF("query_id", "rank", "doc_id")
  }

  test("termOverlapTopK: distinct-term overlap, self excluded, ties to smaller id") {
    val d = docs(
      0L -> "alpha beta gamma",
      1L -> "alpha beta delta",   // overlap with 0: alpha beta = 2
      2L -> "alpha epsilon zeta", // overlap with 0: alpha = 1
      3L -> "alpha gamma gamma",  // overlap with 0: alpha gamma = 2 (distinct!)
      4L -> "omega psi chi")      // overlap with 0: none -> absent
    val out = Retrieval.termOverlapTopK(d.filter(col("doc_id") === 0L), d, k = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    // ov=2 for docs 1 and 3 (tie -> smaller id first), then doc 2; doc 4 absent.
    assert(out.toSeq === Seq((0L, 1, 1L, 2L), (0L, 2, 3L, 2L), (0L, 3, 2L, 1L)))
  }

  test("rrfFuse: integer contributions sum across arms; ranking (score desc, id asc)") {
    // Arm A ranks docs 10,11,12; arm B ranks 11,10,13.
    val a = arm((0L, 1, 10L), (0L, 2, 11L), (0L, 3, 12L))
    val b = arm((0L, 1, 11L), (0L, 2, 10L), (0L, 3, 13L))
    val out = Retrieval.rrfFuse(Seq(a, b), kConst = 60, topK = 10)
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    def c(rank: Int) = 1000000L / (60 + rank)
    // 10: c(1)+c(2); 11: c(2)+c(1) -> tie with 10, id 10 first.
    // 12: c(3); 13: c(3) -> tie, id 12 first.
    assert(out.toSeq === Seq(
      (1, 10L, c(1) + c(2), 2L),
      (2, 11L, c(1) + c(2), 2L),
      (3, 12L, c(3), 1L),
      (4, 13L, c(3), 1L)))
  }

  test("rrfFuse: topK bounds the output and single-arm docs survive") {
    val a = arm((0L, 1, 10L), (0L, 2, 11L), (1L, 1, 20L))
    val b = arm((0L, 1, 12L))
    val out = Retrieval.rrfFuse(Seq(a, b), kConst = 60, topK = 2)
    val q0 = out.filter(col("query_id") === 0L).collect()
    assert(q0.length === 2, "topK must cap per-query output")
    // rank-1 contributions tie (a's 10 vs b's 12) -> smaller id wins.
    assert(q0.map(_.getLong(2)).toSeq === Seq(10L, 12L))
    val q1 = out.filter(col("query_id") === 1L).collect()
    assert(q1.map(_.getLong(2)).toSeq === Seq(20L))
  }

  test("rrfFuse: the per-query top-k rides the bounded aggregate, not a window sort") {
    val a = arm((0L, 1, 10L), (0L, 2, 11L))
    val p = Retrieval.rrfFuse(Seq(a), topK = 1).queryExecution.executedPlan.toString
    assert(p.toLowerCase.contains("topk_structs"),
      "fusion top-k must use the bounded TopKStructsAgg aggregate")
    assert(!p.contains("row_number"), "fusion must not rank via a window")
  }

  private def rel(rows: (Long, Long)*): DataFrame = {
    import spark.implicits._
    rows.toDF("query_id", "doc_id")
  }

  test("evalAtK: exact MRR unit fractions over lcm, micro recall, zero-hit queries still judged") {
    // Judged: q0 -> {10, 12, 14}, q1 -> {20} (rel_total = 4).
    val relevance = rel(0L -> 10L, 0L -> 12L, 0L -> 14L, 1L -> 20L,
      0L -> 10L) // duplicate judgment must dedupe
    // s1: q0 first relevant at rank 2 (doc 11 is unjudged, ignored),
    //     two hits total; q1 retrieves nothing relevant.
    val s1 = arm((0L, 1, 11L), (0L, 2, 10L), (0L, 3, 12L), (1L, 1, 21L))
    // s2: both queries hit at rank 1, one hit each.
    val s2 = arm((0L, 1, 14L), (1L, 1, 20L))
    val out = Retrieval.evalAtK(Seq("s1" -> s1, "s2" -> s2), relevance, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(out.toSeq === Seq(
      ("s1", 2L, 2L, 4L, 2520L / 2, 2520L),
      ("s2", 2L, 2L, 4L, 2520L + 2520L, 2520L)))
  }

  test("evalAtK: k bounds the hit window and sets the lcm denominator") {
    val relevance = rel(0L -> 10L, 0L -> 12L)
    val s1 = arm((0L, 2, 10L), (0L, 3, 12L))
    val out = Retrieval.evalAtK(Seq("s1" -> s1), relevance, k = 2)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // Only the rank-2 hit is inside k=2; lcm(1..2) = 2.
    assert(out.toSeq === Seq((1L, 1L, 2L, 1L, 2L)))
  }

  test("apAtK: exact per-query average precision, zero-hit queries present") {
    // q0 -> {10, 12, 14}: s1 hits at ranks 2 (P=1/2) and 3 (P=2/3) ->
    // AP = (1/2 + 2/3)/3 = 7/18; s2 hits rank 1 only -> AP = 1/3.
    // q1 -> {20}: s1 retrieves nothing relevant -> AP = 0, row present.
    val relevance = rel(0L -> 10L, 0L -> 12L, 0L -> 14L, 1L -> 20L)
    val s1 = arm((0L, 1, 11L), (0L, 2, 10L), (0L, 3, 12L), (1L, 1, 21L))
    val s2 = arm((0L, 1, 14L))
    val out = Retrieval.apAtK(Seq("s1" -> s1, "s2" -> s2), relevance, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(out.toSeq === Seq(
      ("s1", 0L, 3L, 2L, 1L * (2520 / 2) + 2L * (2520 / 3), 2520L * 3),
      ("s1", 1L, 1L, 0L, 0L, 2520L * 1),
      ("s2", 0L, 3L, 1L, 2520L, 2520L * 3),
      ("s2", 1L, 1L, 0L, 0L, 2520L * 1)))
    assert(2940.0 / 7560.0 === 7.0 / 18.0)
  }

  test("apAtK: a perfect ranking scores exactly 1; min(n_rel, k) caps the denominator") {
    val relevance = rel(2L -> 30L, 2L -> 31L)
    val s3 = arm((2L, 1, 30L), (2L, 2, 31L))
    val Seq((_, _, _, _, num, den)) =
      Retrieval.apAtK(Seq("s3" -> s3), relevance, k = 10)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(num === den && num > 0L)
    // k = 1 with 2 relevant: denominator uses min(n_rel, k) = 1.
    val Seq((_, _, _, _, n1, d1)) =
      Retrieval.apAtK(Seq("s3" -> s3), relevance, k = 1)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(n1 === 1L && d1 === 1L, "P@1 = 1 over min(2, 1) = 1 with lcm(1..1) = 1")
  }

  test("evalAtK: input validation") {
    val relevance = rel(0L -> 10L)
    val s1 = arm((0L, 1, 10L))
    intercept[IllegalArgumentException] {
      Retrieval.evalAtK(Seq.empty, relevance, k = 10)
    }
    intercept[IllegalArgumentException] {
      Retrieval.evalAtK(Seq("a" -> s1, "a" -> s1), relevance, k = 10)
    }
    intercept[IllegalArgumentException] {
      Retrieval.evalAtK(Seq("a" -> s1), relevance, k = 43)
    }
  }

  private def relg(rows: (Long, Long, Int)*): DataFrame = {
    import spark.implicits._
    rows.toDF("query_id", "doc_id", "grade")
  }

  /** Definitional ERR fold over (rank, n = 2^grade − 1) pairs — EVERY
   * retrieved rank must be listed (n = 0 when unjudged: its stop
   * probability is 0 but it still contributes the (m − 0)/m = 1
   * continuation factor, i.e. a factor m in the integer product). */
  private def errRef(hits: Seq[(Int, Long)], k: Int, gMax: Int): (Long, Long) = {
    def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)
    val lcm = (1L to k.toLong).reduce((a, b) => a / gcd(a, b) * b)
    var prod = 1L
    var sum = 0L
    hits.sortBy(_._1).foreach { case (r, n) =>
      sum += (lcm / r) * n * prod * (1L << (gMax * (k - r)))
      prod *= ((1L << gMax) - n)
    }
    (sum, lcm * (1L << (gMax * k)))
  }

  test("errAtK: matches the definitional cascade fold; zero-hit queries present") {
    // Query 0: s1 ranks a grade-2 doc at 1 and a grade-1 doc at 3; s2
    // ranks only the grade-1 doc, at rank 2. Query 1 judged, never hit.
    val relevance = relg((0L, 10L, 2), (0L, 12L, 1), (1L, 20L, 1))
    val s1 = arm((0L, 1, 10L), (0L, 2, 11L), (0L, 3, 12L))
    val s2 = arm((0L, 1, 13L), (0L, 2, 12L))
    val out = Retrieval.errAtK(Seq("s1" -> s1, "s2" -> s2), relevance,
        k = 10, gMax = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val (n1, d) = errRef(Seq(1 -> 3L, 2 -> 0L, 3 -> 1L), k = 10, gMax = 2)
    val (n2, _) = errRef(Seq(1 -> 0L, 2 -> 1L), k = 10, gMax = 2)
    assert(out.toSeq === Seq(
      ("s1", 0L, 2L, n1, d), ("s1", 1L, 1L, 0L, d),
      ("s2", 0L, 2L, n2, d), ("s2", 1L, 1L, 0L, d)))
  }

  test("errAtK: top-grade hit at rank 1 scores exactly (2^gMax−1)/2^gMax") {
    val relevance = relg((0L, 10L, 2))
    val s = arm((0L, 1, 10L))
    val Seq((_, _, _, num, den)) =
      Retrieval.errAtK(Seq("s" -> s), relevance, k = 10, gMax = 2)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSeq
    assert(num * 4L === den * 3L, "ERR of a perfect first hit is 3/4")
  }

  test("errAtK: duplicate judgments keep max grade; grades clamp at gMax") {
    val relevance = relg((0L, 10L, 1), (0L, 10L, 7), (0L, 11L, 2))
    val s = arm((0L, 1, 10L), (0L, 2, 11L))
    val Seq((_, _, ng, num, den)) =
      Retrieval.errAtK(Seq("s" -> s), relevance, k = 10, gMax = 2)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSeq
    assert(ng === 2L)
    val (expNum, expDen) = errRef(Seq(1 -> 3L, 2 -> 3L), k = 10, gMax = 2)
    assert(num === expNum && den === expDen)
  }

  test("errAtK: overflow guard rejects k·lcm·2^(gMax·k) past the Long window") {
    val relevance = relg((0L, 10L, 1))
    val s = arm((0L, 1, 10L))
    intercept[IllegalArgumentException] {
      Retrieval.errAtK(Seq("s" -> s), relevance, k = 10, gMax = 5)
    }
  }

  /** Definitional nDCG pieces: dcg over retrieved (rank, n) hits, idcg
   * over the judged gains sorted descending, both with the 1/r discount
   * cleared by lcm(1..k). */
  private def ndcgRef(hits: Seq[(Int, Long)], judged: Seq[Long],
      k: Int): (Long, Long) = {
    def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)
    val lcm = (1L to k.toLong).reduce((a, b) => a / gcd(a, b) * b)
    val dcg = hits.filter(_._1 <= k).map { case (r, n) => (lcm / r) * n }.sum
    val idcg = judged.sorted.reverse.take(k).zipWithIndex
      .map { case (n, i) => (lcm / (i + 1)) * n }.sum
    (dcg, idcg)
  }

  test("ndcgAtK: matches the definitional sums; zero-hit queries present") {
    // Query 0: grades 2, 1 judged; s1 hits grade-2 at rank 1 and
    // grade-1 at rank 3; s2 hits only the grade-1 doc at rank 2.
    // Query 1 judged (grade 1), never hit by either system.
    val relevance = relg((0L, 10L, 2), (0L, 12L, 1), (1L, 20L, 1))
    val s1 = arm((0L, 1, 10L), (0L, 2, 11L), (0L, 3, 12L))
    val s2 = arm((0L, 1, 13L), (0L, 2, 12L))
    val out = Retrieval.ndcgAtK(Seq("s1" -> s1, "s2" -> s2), relevance,
        k = 10, gMax = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val (d1, i0) = ndcgRef(Seq(1 -> 3L, 3 -> 1L), Seq(3L, 1L), k = 10)
    val (d2, _) = ndcgRef(Seq(2 -> 1L), Seq(3L, 1L), k = 10)
    val (_, i1) = ndcgRef(Seq.empty, Seq(1L), k = 10)
    assert(out.toSeq === Seq(
      ("s1", 0L, 2L, d1, i0), ("s1", 1L, 1L, 0L, i1),
      ("s2", 0L, 2L, d2, i0), ("s2", 1L, 1L, 0L, i1)))
  }

  test("ndcgAtK: the ideal ranking scores exactly 1; a worse order scores < 1") {
    val relevance = relg((0L, 10L, 2), (0L, 11L, 1), (0L, 12L, 1))
    // Ideal: grade-2 doc first, then the grade-1 docs.
    val ideal = arm((0L, 1, 10L), (0L, 2, 11L), (0L, 3, 12L))
    val worse = arm((0L, 1, 11L), (0L, 2, 12L), (0L, 3, 10L))
    val Seq((_, _, _, dn1, id1)) =
      Retrieval.ndcgAtK(Seq("s" -> ideal), relevance, k = 10, gMax = 2)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSeq
    assert(dn1 === id1, "ideal ordering must score nDCG = 1 exactly")
    val Seq((_, _, _, dn2, id2)) =
      Retrieval.ndcgAtK(Seq("s" -> worse), relevance, k = 10, gMax = 2)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSeq
    assert(id2 === id1 && dn2 < id2,
      "misordering the grade-2 doc must cost gain")
  }

  test("ndcgAtK: duplicate judgments keep max grade, clamp at gMax; IDCG truncates at k") {
    // 12 judged grade-1 docs: IDCG uses only the top 10 positions.
    val judged = (0 until 12).map(i => (0L, 100L + i, 1))
    val relevance = relg(((0L, 10L, 1) +: (0L, 10L, 7) +: judged): _*)
    val s = arm((0L, 1, 10L))
    val Seq((_, _, ng, dn, id)) =
      Retrieval.ndcgAtK(Seq("s" -> s), relevance, k = 10, gMax = 2)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSeq
    assert(ng === 13L)
    val (expD, expI) = ndcgRef(Seq(1 -> 3L),
      3L +: Seq.fill(12)(1L), k = 10)
    assert(dn === expD && id === expI)
  }

  test("ndcgAtK: overflow guard and input validation") {
    val relevance = relg((0L, 10L, 1))
    val s = arm((0L, 1, 10L))
    intercept[IllegalArgumentException] {
      Retrieval.ndcgAtK(Seq.empty, relevance, k = 10)
    }
    intercept[IllegalArgumentException] {
      Retrieval.ndcgAtK(Seq("a" -> s, "a" -> s), relevance, k = 10)
    }
    intercept[IllegalArgumentException] {
      Retrieval.ndcgAtK(Seq("a" -> s), relevance, k = 43)
    }
    intercept[IllegalArgumentException] {
      Retrieval.ndcgAtK(Seq("a" -> s), relevance, k = 42, gMax = 21)
    }
  }

  test("kendallTau: hand-checked inversions over the shared top-k") {
    // Query 0 shared docs (ra, rb): (1,3), (2,1), (3,2) in ra order ->
    // rb sequence 3,1,2 -> inversions: (3,1), (3,2) = 2; pairs = 3;
    // tau = (1 - 2)/3 = -1/3 -> tau_num = 3 - 4 = -1, tau_den = 3.
    val a = arm((0L, 1, 10L), (0L, 2, 11L), (0L, 3, 12L), (0L, 4, 13L))
    val b = arm((0L, 1, 11L), (0L, 2, 12L), (0L, 3, 10L), (0L, 4, 99L))
    val out = Retrieval.kendallTau(a, b, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.toSeq === Seq((0L, 3L, 2L, -1L, 3L)))
  }

  test("kendallTau: identical rankings score tau = 1; reversed score -1") {
    val a = arm((0L, 1, 10L), (0L, 2, 11L), (0L, 3, 12L))
    val rev = arm((0L, 1, 12L), (0L, 2, 11L), (0L, 3, 10L))
    val same = Retrieval.kendallTau(a, a, k = 10).head()
    assert(same.getLong(3) === same.getLong(4) && same.getLong(4) === 3L)
    val opp = Retrieval.kendallTau(a, rev, k = 10).head()
    assert(opp.getLong(3) === -opp.getLong(4))
  }

  test("kendallTau: single shared doc ships den 0; k bounds the window") {
    val a = arm((0L, 1, 10L), (0L, 2, 11L), (1L, 1, 20L))
    val b = arm((0L, 1, 10L), (0L, 3, 11L), (1L, 1, 30L))
    // k = 2 drops b's rank-3 doc 11 -> query 0 shares only doc 10;
    // query 1 shares nothing -> absent.
    val out = Retrieval.kendallTau(a, b, k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
    assert(out.toSeq === Seq((0L, 1L, 0L)))
  }

  /** Definitional RBO@k numerator over rboWeights' denominator: the
   * X_d sum, NOT the per-doc telescoped weights the operator uses —
   * an independent derivation. */
  private def refRbo(a: Seq[(Long, Int)], b: Seq[(Long, Int)],
      k: Int): BigInt = {
    val lcm = (1 to k).foldLeft(BigInt(1))((l, i) => l * i / l.gcd(BigInt(i)))
    val d = BigInt(10).pow(k) * lcm
    (1 to k).map { depth =>
      val ad = a.filter(_._2 <= depth).map(_._1).toSet
      val bd = b.filter(_._2 <= depth).map(_._1).toSet
      BigInt(9).pow(depth - 1) * (d / (BigInt(10).pow(depth) * depth)) *
        (ad & bd).size
    }.sum
  }

  test("rbo: matches the definitional X_d sum on a hand case") {
    // A: docs 10,11,12,13 at ranks 1-4; B: 11,10,14,12 — overlap grows
    // 0,2,2,3 across depths with max-ranks m(10)=2, m(11)=2, m(12)=4.
    val aRows = Seq((10L, 1), (11L, 2), (12L, 3), (13L, 4))
    val bRows = Seq((11L, 1), (10L, 2), (14L, 3), (12L, 4))
    val a = arm(aRows.map { case (doc, r) => (0L, r, doc) }: _*)
    val b = arm(bRows.map { case (doc, r) => (0L, r, doc) }: _*)
    val out = Retrieval.rbo(a, b, k = 4).collect().head
    val (_, den) = Retrieval.rboWeights(4)
    assert(out.getAs[Long]("overlap_k") === 3L)
    assert(BigInt(out.getAs[Long]("rbo_num")) === refRbo(aRows, bRows, 4))
    assert(out.getAs[Long]("rbo_den") === den)
  }

  test("rbo: identical rankings hit the truncated maximum; disjoint score 0") {
    val rows = Seq((10L, 1), (11L, 2), (12L, 3))
    val a = arm(rows.map { case (doc, r) => (0L, r, doc) }: _*)
    val same = Retrieval.rbo(a, a, k = 3).collect().head
    assert(BigInt(same.getAs[Long]("rbo_num")) === refRbo(rows, rows, 3))
    // Truncated max = (1-p)·Σ p^{d-1} (X_d = d), strictly below den.
    assert(same.getAs[Long]("rbo_num") < same.getAs[Long]("rbo_den"))
    val disj = arm((0L, 1, 90L), (0L, 2, 91L), (0L, 3, 92L))
    val zero = Retrieval.rbo(a, disj, k = 3).collect().head
    assert(zero.getAs[Long]("rbo_num") === 0L)
    assert(zero.getAs[Long]("overlap_k") === 0L)
  }

  test("rbo: top-heavy agreement outscores tail agreement at equal overlap") {
    // Same single shared doc; at rank 1 in both vs rank 4 in both.
    val a1 = arm((0L, 1, 10L), (0L, 2, 21L), (0L, 3, 22L), (0L, 4, 23L))
    val b1 = arm((0L, 1, 10L), (0L, 2, 31L), (0L, 3, 32L), (0L, 4, 33L))
    val a4 = arm((0L, 1, 21L), (0L, 2, 22L), (0L, 3, 23L), (0L, 4, 10L))
    val b4 = arm((0L, 1, 31L), (0L, 2, 32L), (0L, 3, 33L), (0L, 4, 10L))
    val top = Retrieval.rbo(a1, b1, k = 4).collect().head.getAs[Long]("rbo_num")
    val tail = Retrieval.rbo(a4, b4, k = 4).collect().head.getAs[Long]("rbo_num")
    assert(top > tail, s"top-rank agreement ($top) must outweigh tail ($tail)")
  }

  test("rbo: queries with no shared docs ship a zero row, not silence") {
    val a = arm((0L, 1, 10L), (1L, 1, 20L))
    val b = arm((0L, 1, 10L), (2L, 1, 30L))
    val out = Retrieval.rbo(a, b, k = 2).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("overlap_k"))).toSeq
    assert(out === Seq((0L, 1L), (1L, 0L), (2L, 0L)))
  }

  test("rbo: k bounds enforced") {
    intercept[IllegalArgumentException] { Retrieval.rboWeights(13) }
    intercept[IllegalArgumentException] { Retrieval.rboWeights(0) }
  }
}
