package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/**
 * Byte-pair-encoding merge LEARNING on Spark — the iterative half of
 * tokenizer training, extending the single-round merge-candidate scan
 * (the [[TextAnalysis.bpePieces]] pair scan of q65) to the real algorithm:
 * repeatedly count adjacent symbol pairs, adopt the most frequent pair as
 * a new symbol, and re-segment with it before the next count.
 *
 * Classic BPE (Sennrich et al. 2016, "Neural Machine Translation of Rare
 * Words with Subword Units") learns on the word VOCABULARY with counts,
 * not on running text — and that is exactly what makes it scale on Spark:
 *
 *  - ONE corpus-wide pass builds (word, count); everything after operates
 *    on the vocabulary, which is sublinear in corpus size (Heaps' law).
 *    At 100 TB the token explode+groupBy is the only big shuffle, and it
 *    partial-aggregates map-side like any count.
 *  - Each round is one vocabulary-bounded aggregation (pair counts) plus
 *    one per-row array fold (apply the merge) — no corpus rescan, ever.
 *  - The only driver traffic is the argmax pair itself: one row per
 *    round (the kmeans-centroid pattern — bounded by construction).
 *
 * Merge application is greedy left-to-right within each word (the
 * reference BPE semantics): a symbol consumed by a merge cannot start the
 * next one, so `a a a` under merge (a,a) becomes `aa a`, and `a b b`
 * under (a,b) becomes `ab b`. The fold below implements exactly that —
 * and the DuckDB oracle re-derives it relationally (runs of consecutive
 * eligible positions, keeping alternate members), proving the two
 * formulations agree on real data.
 *
 * Simplifications vs production BPE, stated so nobody mistakes scope:
 * symbols are codepoint strings from the whitespace-lowercase tokenizer
 * (no byte fallback), there is no end-of-word marker, and ties break
 * deterministically by (count desc, pair asc) so every engine picks the
 * same merge.
 */
object Bpe {

  /** (word, w) vocabulary with each word split into its initial
   * single-character symbols. */
  private def vocab(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("w"))
      .select(col("w"), split(col("word"), "").as("syms"))

  /** Greedy left-to-right application of merge (a, b) to a symbol array:
   * fold symbols into a new array, fusing when the accumulator's last
   * element is `a` (not itself produced by fusing this step's `b`) and the
   * incoming symbol is `b`. The size guard makes the empty-accumulator
   * case explicit (And short-circuits, so element_at never sees an
   * out-of-range index under ANSI). */
  private def applyMerge(syms: Column, a: String, b: String): Column =
    aggregate(syms, expr("CAST(array() AS array<string>)"), (acc, s) =>
      when(size(acc) > 0 && element_at(acc, size(acc)) === lit(a) && s === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(s))))

  /**
   * Apply an ordered merge list to the corpus and return the resulting
   * piece histogram — the ENCODE half of the tokenizer: segment every
   * word with the learned vocabulary and count each piece's corpus
   * occurrences (weighted by word frequency).
   *
   * Same scale contract as learning: one corpus pass builds the (word,
   * count) vocabulary; every merge application and the final histogram
   * aggregation are vocabulary-bounded. The merge list itself is tiny
   * (the learned vocab) and lives in the plan as literals.
   *
   * @param merges (sym_a, sym_b) pairs in adoption order — e.g. the
   *               first two columns of [[learnMerges]]'s result.
   * @return (piece, n) — n = total corpus occurrences of the piece.
   */
  def pieceHistogram(docs: DataFrame, merges: Seq[(String, String)],
      textCol: String = "text"): DataFrame = {
    val segmented = merges.foldLeft(vocab(docs, textCol)) { case (v, (a, b)) =>
      v.withColumn("syms", applyMerge(col("syms"), a, b))
    }
    pieceHistogramOfSegmented(segmented)
  }

  /**
   * Learn the first `nMerges` merges over the corpus.
   *
   * @return (round, sym_a, sym_b, pair_count) — one row per adopted merge,
   *         `round` starting at 1 in adoption order. Stops early (fewer
   *         rows) only if the vocabulary runs out of adjacent pairs.
   */
  def learnMerges(docs: DataFrame, nMerges: Int, textCol: String = "text"): DataFrame = {
    // materializeFinal = false: the segmented vocabulary is discarded, so
    // the final off-cache materialization job (which exists to protect a
    // CALLER's first use of it from a full lineage recompute) would be a
    // wasted barrier — the merge table itself was already collected by
    // the round loop. One sequential job saved per learn.
    val (merges, v) = learnMergesImpl(docs, nMerges, textCol, materializeFinal = false)
    v.unpersist(blocking = false)
    merges
  }

  /**
   * [[learnMerges]] that ALSO hands back the fully-segmented vocabulary it
   * already holds after the last round — the input the ENCODE half needs.
   * Learning ends with every word segmented under all adopted merges, so
   * a caller that wants both the merge table and the piece histogram
   * (training then immediately tokenizing, the common pipeline shape)
   * should not pay a second corpus pass to rebuild what round `n` just
   * computed.
   *
   * The returned (w, syms) vocabulary is persisted (MEMORY_AND_DISK,
   * lineage-preserving); the caller owns the `unpersist` once done.
   */
  def learnMergesSegmented(docs: DataFrame, nMerges: Int,
      textCol: String = "text"): (DataFrame, DataFrame) =
    learnMergesImpl(docs, nMerges, textCol, materializeFinal = true)

  private def learnMergesImpl(docs: DataFrame, nMerges: Int,
      textCol: String, materializeFinal: Boolean): (DataFrame, DataFrame) = {
    require(nMerges >= 1, s"nMerges must be >= 1, got $nMerges")
    val spark = docs.sparkSession
    import spark.implicits._

    // Child session for the per-round argmax collects: same SparkContext
    // and cache, AQE off (see the collect below). Iterative-driver
    // pattern; the caller's session conf is never touched.
    val quiet = graft.util.QuietSessions.of(spark)

    // The vocabulary is re-read every round: materialize the corpus pass
    // once. Lazy + lineage-preserving, same policy as the dedup operators.
    // Unpersist DISCIPLINE matters here: each round's vocabulary is only
    // MATERIALIZED by the next round's collect (persist is lazy), so the
    // previous round's cache must stay alive until that collect has run —
    // an eager unpersist makes every round silently re-run the corpus
    // tokenize from scratch (measured: the whole cache was dead weight
    // and each batch re-paid the corpus pass).
    var v = vocab(docs, textCol).persist(StorageLevel.MEMORY_AND_DISK)
    var prev: DataFrame = null
    val adopted = Seq.newBuilder[(Int, String, String, Long)]
    var nAdopted = 0
    var exhausted = false
    while (nAdopted < nMerges && !exhausted) {
      // One pair-count job per BATCH, not per merge: collect the top-K
      // pairs and adopt the longest SAFE prefix driver-side. Safety rule
      // (each clause load-bearing; BatchedBpeSpec fuzzes it against a
      // strict one-merge-per-round reference):
      //
      // After adopting a set S of symbol-disjoint pairs, the pair universe
      // changes only in bounded ways — adopted pairs drop to zero (greedy
      // application leaves no adjacent (a,b)), pairs sharing a symbol with
      // S can only DECREASE (some occurrences get consumed), pairs
      // disjoint from S are untouched, and every NEW pair (x,ab)/(ab,y)
      // inherits count <= the pre-merge count of an S-overlapping pair
      // ((x,a) resp. (b,y)). So the next true pick is the first
      // still-unadopted pair p in (cnt desc, a, b) order PROVIDED p is
      // disjoint from S and cnt(p) strictly exceeds
      //   B = max(kth collected count,  max cnt of collected pairs
      //           sharing a symbol with S)
      // — the conservative ceiling on every changed-or-unseen count
      // (pairs beyond the collected K are <= the kth count). Strictness
      // also settles ties against new pairs; ties among untouched pairs
      // keep their (a, b) order, which is the sequential tie-break.
      // The first S-overlapping pair ends the batch: its own count is no
      // longer trustworthy. Worst case (every adjacent pair interacting)
      // the batch is a single merge — exactly the classic algorithm.
      val k = 64
      val topDf = v
        .filter(size(col("syms")) > 1)
        .select(col("w"), explode(expr(
          "transform(sequence(1, size(syms) - 1), " +
            "i -> struct(element_at(syms, i) AS a, element_at(syms, i + 1) AS b))")).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("w")).as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(k)
      // Collect through the quiet child session: the round query is a
      // bounded aggregation over the cached vocabulary ending in a
      // TakeOrdered — AQE can only re-plan it into a chain of per-stage
      // driver jobs (measured 16 jobs vs 4 for a 4-merge learn at sf0.1,
      // ~0.5 s of pure scheduling). Cached subtrees still substitute —
      // the cache manager is shared state.
      val top = org.apache.spark.sql.graft.GraftSqlBridge
        .ofRows(quiet, topDf.queryExecution.logical)
        .collect()
      // This collect just materialized v's cache — only now is the
      // PREVIOUS round's cache (v's parent) safe to drop.
      if (prev != null) { prev.unpersist(blocking = false); prev = null }
      if (top.isEmpty) exhausted = true
      else {
        val pairs = top.map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        val adoptedNow = selectBatch(pairs, k, nMerges - nAdopted)
        for ((a, b, cnt) <- adoptedNow) {
          nAdopted += 1
          adopted += ((nAdopted, a, b, cnt))
        }
        val next = adoptedNow.foldLeft(v) { case (d, (a, b, _)) =>
          d.withColumn("syms", applyMerge(col("syms"), a, b))
        }.persist(StorageLevel.MEMORY_AND_DISK)
        prev = v
        v = next
      }
    }
    // The final vocabulary is still lazy; materialize it off its parent's
    // cache (one vocabulary-bounded job, no corpus pass) so the caller's
    // first use — and the parent unpersist below — cannot trigger a full
    // lineage recompute. ONLY when the caller keeps the vocabulary
    // (materializeFinal): learnMerges discards it immediately, so the
    // count was a pure wasted barrier there — one job per learn, and with
    // the affected-form batch rule often the second of only two.
    if (prev != null) {
      if (materializeFinal) {
        org.apache.spark.sql.graft.GraftSqlBridge
          .ofRows(quiet, v.queryExecution.logical).count()
      }
      prev.unpersist(blocking = false)
    }
    (adopted.result().toDF("round", "sym_a", "sym_b", "pair_count"), v)
  }

  /** Driver-side safe-batch selection over one collected top-`k` pair list
   * (sorted by count desc, then pair asc): the longest prefix that
   * sequential one-merge rounds would provably also pick, capped at
   * `maxAdopt`.
   *
   * AFFECTED-FORM rule (round 11 — provably sharper than the former
   * symbol-disjointness rule, which re-counted after any shared symbol):
   * merging (a, b) fuses exactly the occurrences "a b", so the ONLY
   * existing pairs whose counts change are
   *
   *   (x, a) — the a was consumed by a following b ("x a b"), and
   *   (b, y) — the b was consumed by a preceding a ("a b y"),
   *
   * plus (a, b) itself. A pair like (o, r) after adopting (e, r) shares
   * the symbol r but is NEITHER form — its r is preceded by o, which the
   * (e, r) merge can never touch — so its count is exact and it can join
   * the same batch (this is precisely the sf0.1 fixture shape, where the
   * former rule split 4 merges over 2 collects). New pairs are dominated
   * by affected forms: every (x, ab) occurrence was an (x, a), every
   * (ab, y) was a (b, y), and every (ab, ab) was a (b, a).
   *
   * The ceiling B per candidate = max(kth collected count, max count of
   * collected AFFECTED pairs) bounds every changed, spawned, or uncollected
   * count (uncollected pairs are <= the kth count). A candidate in an
   * affected form stops the batch (its own count is stale); a clean
   * candidate with count STRICTLY above B is provably the sequential
   * algorithm's next pick (strictness settles ties against changed/new
   * pairs; ties among clean pairs keep the (a, b) order, which IS the
   * sequential tie-break). Affected pairs can never themselves be adopted
   * (the stop fires first), so they remain in the ceiling; an adopted
   * pair's own count drops to zero and its spawned pairs are dominated by
   * different, still-counted affected forms — except a SELF-pair (a, a),
   * whose spawns (x, aa) <= cnt(x, a) may be dominated by (a, a) itself,
   * so adopted self-pairs keep contributing their count to the ceiling.
   *
   * Pure function so the rule is testable in isolation; BatchedBpeSpec
   * fuzzes the whole learn against a strict one-merge-per-round
   * reference. Exposed package-private for BpeSpec.
   */
  private[text] def selectBatch(pairs: Array[(String, String, Long)], k: Int,
      maxAdopt: Int): List[(String, String, Long)] = {
    val kthCnt = if (pairs.length < k) Long.MinValue else pairs.last._3
    val batch = scala.collection.mutable.ListBuffer.empty[(String, String, Long)]
    val adoptedIdx = scala.collection.mutable.Set.empty[Int]
    var firsts = Set.empty[String] // adopted b's: (b, y) counts are stale
    var seconds = Set.empty[String] // adopted a's: (x, a) counts are stale
    def affected(x: String, y: String): Boolean =
      firsts.contains(x) || seconds.contains(y)
    var i = 0
    var stop = false
    while (!stop && i < pairs.length && batch.size < maxAdopt) {
      val (a, b, cnt) = pairs(i)
      if (batch.nonEmpty && affected(a, b)) stop = true
      else {
        val overlapMax = pairs.iterator.zipWithIndex
          .filter { case ((x, y, _), idx) =>
            (!adoptedIdx.contains(idx) || x == y) && affected(x, y)
          }
          .map(_._1._3).maxOption.getOrElse(Long.MinValue)
        val bound = math.max(kthCnt, overlapMax)
        if (batch.isEmpty || cnt > bound) {
          batch += ((a, b, cnt))
          adoptedIdx += i
          firsts += b
          seconds += a
        } else stop = true
      }
      i += 1
    }
    batch.toList
  }

  /**
   * Column DSL for the [[BpeEncode]] kernel: the per-document piece array
   * under an ordered merge list, one codegen'd pass, zero shuffle. The
   * merge table enters the plan as a foldable literal (a model artifact,
   * like the learned-merge literals [[pieceHistogram]] folds in), so the
   * kernel parses it once per task, not per row.
   */
  def encode(text: Column, merges: Seq[(String, String)]): Column = {
    val bridge = org.apache.spark.sql.graft.GraftSqlBridge
    bridge.column(graft.text.BpeEncode(
      bridge.expression(text),
      bridge.expression(typedLit(merges.map(p => Seq(p._1, p._2))))))
  }

  /** Piece histogram over an already-segmented (w, syms) vocabulary —
   * the vocabulary-bounded tail of [[pieceHistogram]], for callers that
   * hold [[learnMergesSegmented]]'s output. */
  def pieceHistogramOfSegmented(segmented: DataFrame): DataFrame =
    segmented
      .select(col("w"), explode(col("syms")).as("piece"))
      .groupBy("piece").agg(sum(col("w")).as("n"))
}
