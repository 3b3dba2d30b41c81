package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Sequence packing for context-window training: lay documents head-to-tail
 * in a deterministic order and chunk the concatenated token stream into
 * fixed-budget bins (the "concat-then-chunk" packing most LLM data loaders
 * use). Each document is assigned the bin its FIRST token lands in, plus
 * its offset inside that bin — enough for a loader to reconstruct every
 * bin's contents without re-scanning.
 *
 * Determinism contract (matches [[Sampling]]/[[Quota]]): stream order
 * within a partition key is (md5(id) hex, id), so the same packing falls
 * out on every run and engine — the q39 oracle re-derives it in DuckDB
 * with a window sum.
 *
 * Scale shape: packing is per stream partition (`partCol` — a shard key
 * like source/domain/split), ONE hash-partitioned window sort, no global
 * ordering anywhere. Prefix sums and the bin division are exact integer
 * arithmetic (`div`/`pmod` on longs — no doubles), so results are
 * reproducible at any stream length.
 */
object Packing {

  /** Assigns each row a `pack_id` (which budget-sized bin its first token
   * lands in, counted per `partCol` stream) and `pack_offset` (token
   * offset inside that bin). `tokensCol` must be a non-negative integral
   * token count; output adds the two columns to the input's. */
  def packByBudget(df: DataFrame, partCol: Column, idCol: Column,
      tokensCol: Column, budget: Long): DataFrame = {
    require(budget > 0, s"token budget must be positive, got $budget")
    val rank = md5(idCol.cast("string"))
    val w = Window.partitionBy(partCol).orderBy(rank.asc, idCol.asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    // A negative count would make a later row's prefix sum negative, and
    // div (truncates toward 0) + pmod (positive remainder) then emit a
    // self-INCONSISTENT (pack_id, pack_offset) pair — fail loudly instead.
    val toks = when(tokensCol < 0, raise_error(concat(
      lit("packByBudget: negative token count for id "), idCol.cast("string"))))
      .otherwise(tokensCol.cast("long"))
    df
      .withColumn("__p_start", coalesce(sum(toks).over(w), lit(0L)))
      .withColumn("pack_id", expr(s"__p_start div ${budget}L"))
      .withColumn("pack_offset", pmod(col("__p_start"), lit(budget)))
      .drop("__p_start")
  }

  /**
   * NO-SPLIT greedy packing: documents are laid into budget-sized bins in
   * the same deterministic (md5(id) hex, id) stream order as
   * [[packByBudget]], but a document that would cross a bin boundary opens
   * a NEW bin instead of spanning — the packing mode for training flows
   * that must not truncate documents (SFT, long-context curricula). A
   * document LARGER than the budget gets a bin of its own (never split,
   * never dropped — the caller filters oversized docs if that is policy).
   * Unlike concat-then-chunk this leaves real padding waste, which is the
   * point of [[packAudit]].
   *
   * The greedy fold is inherently sequential per stream, so each
   * partition's (rank, id, tokens) rows fold inside ONE generator eval
   * over the collected stream ([[GreedyPackExplode]]) — the bounded-model
   * contract: a stream partition is a serving shard, sized by the caller
   * (the same boundedness [[graft.operators.Quota]] and the vocab queries
   * rely on). Output adds `pack_id` and `pack_offset` to (partCol, idCol,
   * tokensCol).
   */
  def packNoSplit(df: DataFrame, partCol: Column, idCol: Column,
      tokensCol: Column, budget: Long): DataFrame = {
    require(budget > 0, s"token budget must be positive, got $budget")
    import org.apache.spark.sql.graft.GraftSqlBridge
    val toks = when(tokensCol < 0, raise_error(concat(
      lit("packNoSplit: negative token count for id "), idCol.cast("string"))))
      .otherwise(tokensCol.cast("long"))
    val packed = df
      .select(partCol.as("part"),
        struct(md5(idCol.cast("string")).as("rk"), idCol.as("id"), toks.as("w")).as("m"))
      .groupBy("part")
      .agg(sort_array(collect_list(col("m"))).as("ms"))
      .select(col("part"), GraftSqlBridge.column(GreedyPackExplode(
        GraftSqlBridge.expression(col("ms")), budget)))
    packed.select(col("part"), col("p.e.id").as("id"), col("p.e.w").as("w"),
      col("p.pack_id").as("pack_id"), col("p.pack_offset").as("pack_offset"))
  }

  /**
   * Utilization audit of a [[packNoSplit]] result: per stream partition,
   * bin count, document/token totals, PADDED tokens (budget minus fill,
   * floored at zero — oversize singleton bins pad nothing), and
   * utilization in millionths (integer division; oversize bins can push
   * it past 1e6, which is the honest reading). The number a training team
   * checks before accepting a budget: low utilization means the budget
   * fights the document length distribution.
   */
  def packAudit(packed: DataFrame, budget: Long): DataFrame = {
    require(budget > 0, s"token budget must be positive, got $budget")
    packed
      .groupBy(col("part"), col("pack_id"))
      .agg(sum(col("w")).as("fill"), count(lit(1)).as("nd"))
      .groupBy(col("part"))
      .agg(count(lit(1)).as("n_bins"),
        sum(col("nd")).as("n_docs"),
        sum(col("fill")).as("total_tokens"),
        sum(greatest(lit(budget) - col("fill"), lit(0L))).as("padded_tokens"))
      .withColumn("utilization_e6",
        expr(s"total_tokens * 1000000 div (n_bins * ${budget}L)"))
  }

  /**
   * Weight-balanced shard planning — LPT (longest-processing-time)
   * scheduling: within each stream partition, documents are assigned in
   * (weight DESC, id) order to the currently LEAST-LOADED of `nShards`
   * shards (ties to the lowest shard index). The classic 4/3-approximate
   * makespan heuristic — where hash sharding (`epochShards`) balances
   * COUNTS and lets one heavy-document shard straggle, LPT balances the
   * WEIGHT (token) load, which is what decides when the slowest
   * preprocessing worker finishes.
   *
   * Deterministic by construction (total order + deterministic
   * tie-breaks on both the document sort and the shard argmin), so the
   * DuckDB oracle re-derives the exact assignment with a recursive CTE.
   * Same bounded-model contract as [[packNoSplit]]: the greedy fold is
   * inherently sequential per stream, so each partition's rows fold
   * inside one generator eval over the collected stream
   * ([[LptAssignExplode]]) — a stream partition is a serving shard,
   * sized by the caller.
   *
   * @return (part, id, w, shard) — one row per input document.
   */
  def lptShards(df: DataFrame, partCol: Column, idCol: Column,
      weightCol: Column, nShards: Int): DataFrame = {
    require(nShards > 0, s"shard count must be positive, got $nShards")
    import org.apache.spark.sql.graft.GraftSqlBridge
    val w = when(weightCol < 0, raise_error(concat(
      lit("lptShards: negative weight for id "), idCol.cast("string"))))
      .otherwise(weightCol.cast("long"))
    df
      .select(partCol.as("part"),
        struct((-w).as("nw"), idCol.as("id"), w.as("w")).as("m"))
      .groupBy("part")
      .agg(sort_array(collect_list(col("m"))).as("ms"))
      .select(col("part"), GraftSqlBridge.column(LptAssignExplode(
        GraftSqlBridge.expression(col("ms")), nShards)))
      .select(col("part"), col("p.e.id").as("id"), col("p.e.w").as("w"),
        col("p.shard").as("shard"))
  }

  /**
   * Micro-batch PADDING audit — the inference/fine-tuning counterpart of
   * [[packAudit]], for the regime where sequences are NOT concatenated
   * (packing) but PADDED to their batch's maximum length (attention
   * masks, SFT, serving): how many pad tokens does a batch size of B
   * cost under
   *
   *  - `global_pad`: every sequence padded to the corpus max — the
   *    fixed-shape baseline a naive pipeline runs;
   *  - `sorted_batches`: sequences sorted by length, batched B at a
   *    time — the standard bucketed-batching remedy, whose padding is
   *    what remains after the remedy.
   *
   * The sorted-batching cost is computed WITHOUT materializing the sort:
   * with the length histogram (len, cnt) and its cumulative count c,
   * the number of full batches whose maximum is `len` is
   * `c div B − (c − cnt) div B` (a batch's max is the length at its
   * last rank), and the one partial batch — the final one, in ascending
   * order — is padded to the corpus max. So the audit is ONE
   * vocab-bounded histogram aggregation plus a cumulative window over
   * |distinct lengths| rows (the same bounded-window contract as the
   * vocabulary coverage curve); row volume never rides a sort. The
   * bounded-universe half of the contract is ENFORCED past
   * [[HistogramWindow.MaxBuckets]] distinct lengths (see rankAuc's
   * guard — same discipline). All integer arithmetic;
   * `utilization_e6` is real tokens over padded cells in millionths.
   *
   * @return two rows: (strategy, n_batches, n_tokens, n_padding,
   *   utilization_e6), strategies 'global_pad' and 'sorted_batches'
   */
  def paddingAudit(df: DataFrame, lenCol: Column, batchSize: Int): DataFrame =
    paddingAuditBounded(df, lenCol, batchSize, HistogramWindow.MaxBuckets)

  /** [[paddingAudit]] with the bucket bound as a test seam. */
  private[operators] def paddingAuditBounded(df: DataFrame, lenCol: Column,
      batchSize: Int, maxBuckets: Long): DataFrame = {
    require(batchSize > 0, s"batch size must be positive, got $batchSize")
    val b = batchSize.toLong
    val neg = when(lenCol < 0, raise_error(
      lit("paddingAudit: negative sequence length"))).otherwise(lenCol.cast("long"))
    // Null lengths excluded — see truncationFrontier's note: n must
    // describe the same population the token columns account for.
    val hist = df.select(neg.as("len")).filter(col("len").isNotNull)
      .groupBy(col("len"))
      .agg(count(lit(1)).as("cnt"))
    val a = hist
      .select(col("len"), col("cnt"),
        HistogramWindow.cumCountGuarded(col("cnt"), col("len"),
          "paddingAudit", "sequence lengths", maxBuckets).as("c"))
      .agg(sum(col("len") * col("cnt")).as("n_tokens"),
        sum(col("cnt")).as("n"),
        max(col("len")).as("maxlen"),
        sum((expr(s"c div ${b}L") - expr(s"(c - cnt) div ${b}L")) * col("len"))
          .as("full_max_sum"))
    val nBatches = expr(s"(n + ${b - 1}L) div ${b}L")
    val paddedGlobal = col("maxlen") * col("n")
    val paddedSorted = lit(b) * col("full_max_sum") +
      when(pmod(col("n"), lit(b)) =!= 0L,
        col("maxlen") * pmod(col("n"), lit(b))).otherwise(0L)
    a.select(explode(array(
        struct(lit("global_pad").as("strategy"), nBatches.as("n_batches"),
          col("n_tokens"), (paddedGlobal - col("n_tokens")).as("n_padding"),
          (col("n_tokens") * 1000000L).as("ut"), paddedGlobal.as("pc")),
        struct(lit("sorted_batches").as("strategy"), nBatches.as("n_batches"),
          col("n_tokens"), (paddedSorted - col("n_tokens")).as("n_padding"),
          (col("n_tokens") * 1000000L).as("ut"), paddedSorted.as("pc")))).as("e"))
      .select(col("e.strategy").as("strategy"), col("e.n_batches").as("n_batches"),
        col("e.n_tokens").as("n_tokens"), col("e.n_padding").as("n_padding"),
        expr("e.ut div e.pc").as("utilization_e6"))
  }

  /**
   * Context-length frontier: for every CANDIDATE context length L, the
   * exact truncation cost of training at L — documents that truncate,
   * tokens lost past L, tokens kept (Σ min(len, L)) — the
   * choose-your-context-length planning read that complements
   * [[paddingAudit]] (which prices ONE batch geometry). All integers
   * off the same length histogram: row volume dies in the histogram
   * aggregation, then a \|distinct lengths\|·\|L\| summary fold — the
   * candidate list is the audit-window knob, never data.
   *
   * loss_e6 = tokens_lost·10⁶ div tokens_total (exact integer
   * millionths, engine-neutral like the q196 utilization convention).
   *
   * @return one row per candidate, ordered: (context_len, n_docs,
   *         docs_truncated, tokens_total, tokens_lost, tokens_kept,
   *         loss_e6)
   */
  def truncationFrontier(df: DataFrame, lenCol: Column,
      lengths: Seq[Int]): DataFrame = {
    require(lengths.nonEmpty, "need at least one candidate context length")
    require(lengths.forall(_ > 0), s"context lengths must be positive: $lengths")
    require(lengths.distinct.size == lengths.size,
      s"duplicate candidate lengths: $lengths")
    val neg = when(lenCol < 0, raise_error(
      lit("truncationFrontier: negative sequence length")))
      .otherwise(lenCol.cast("long"))
    // Null lengths are EXCLUDED entirely (they used to count in n_docs
    // while contributing nothing to the token columns, so n_docs
    // disagreed with the population the token accounting describes);
    // negative lengths still raise.
    val hist = df.select(neg.as("len")).filter(col("len").isNotNull)
      .groupBy(col("len"))
      .agg(count(lit(1)).as("cnt"))
    hist
      .select(col("len"), col("cnt"),
        explode(array(lengths.map(l => lit(l.toLong)): _*)).as("context_len"))
      .groupBy(col("context_len"))
      .agg(sum(col("cnt")).as("n_docs"),
        coalesce(sum(when(col("len") > col("context_len"), col("cnt"))
          .otherwise(0L)), lit(0L)).as("docs_truncated"),
        sum(col("len") * col("cnt")).as("tokens_total"),
        coalesce(sum(when(col("len") > col("context_len"),
          (col("len") - col("context_len")) * col("cnt")).otherwise(0L)),
          lit(0L)).as("tokens_lost"))
      .select(col("context_len"), col("n_docs"), col("docs_truncated"),
        col("tokens_total"), col("tokens_lost"),
        (col("tokens_total") - col("tokens_lost")).as("tokens_kept"),
        when(col("tokens_total") === 0L, lit(0L))
          .otherwise(expr("tokens_lost * 1000000L div tokens_total"))
          .as("loss_e6"))
      .orderBy(col("context_len"))
  }
}

/**
 * Catalyst generator for the LPT fold: input is a stream partition's
 * elements as `array<struct<..., w: bigint>>` ALREADY in assignment order
 * (weight desc, id asc — the caller sorts struct(nw, id, w); the LAST
 * field is the weight); output rows are `p: struct(e, shard)` — the
 * element plus its least-loaded-shard assignment (load ties to the lowest
 * shard index). One O(n·nShards) loop per partition, same bounded-model
 * contract as [[GreedyPackExplode]].
 */
case class LptAssignExplode(child: org.apache.spark.sql.catalyst.expressions.Expression,
    nShards: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.Generator
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.types._

  require(nShards > 0, s"shard count must be positive, got $nShards")

  private lazy val elemType: StructType =
    child.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(st: StructType, _) if st.fields.nonEmpty &&
          st.fields.last.dataType == LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<struct<..., w: bigint>>, got ${child.dataType.catalogString}")
    }

  override def elementSchema: StructType =
    StructType(Seq(StructField("p", StructType(Seq(
      StructField("e", elemType, nullable = false),
      StructField("shard", IntegerType, nullable = false))), nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Nil
    val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val m = arr.numElements()
    val wIdx = elemType.length - 1
    val loads = new Array[Long](nShards)
    new Iterator[InternalRow] {
      private var i = 0
      override def hasNext: Boolean = i < m
      override def next(): InternalRow = {
        val e = arr.getStruct(i, elemType.length).copy()
        var best = 0
        var s = 1
        while (s < nShards) {
          if (loads(s) < loads(best)) best = s
          s += 1
        }
        loads(best) += e.getLong(wIdx)
        i += 1
        InternalRow(new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](e, best)))
      }
    }
  }

  override def prettyName: String = "lpt_assign_explode"
  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression): LptAssignExplode =
    copy(child = newChild)
}

/**
 * Catalyst generator for the no-split greedy fold: input is a stream
 * partition's elements as `array<struct<..., w: bigint>>` ALREADY in
 * stream order (the LAST field is the token count); output rows are
 * `p: struct(e, pack_id, pack_offset)` — the element plus its bin and
 * in-bin offset under the greedy rule (open a new bin when the element
 * would cross the budget and the bin is non-empty). One tight O(n) loop
 * per partition; the Column alternative (an `aggregate` fold appending to
 * an accumulator array) is O(n²) in copies.
 */
case class GreedyPackExplode(child: org.apache.spark.sql.catalyst.expressions.Expression,
    budget: Long)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.Generator
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.types._

  require(budget > 0, s"token budget must be positive, got $budget")

  private lazy val elemType: StructType =
    child.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(st: StructType, _) if st.fields.nonEmpty &&
          st.fields.last.dataType == LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<struct<..., w: bigint>>, got ${child.dataType.catalogString}")
    }

  override def elementSchema: StructType =
    StructType(Seq(StructField("p", StructType(Seq(
      StructField("e", elemType, nullable = false),
      StructField("pack_id", LongType, nullable = false),
      StructField("pack_offset", LongType, nullable = false))), nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Nil
    val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val m = arr.numElements()
    val wIdx = elemType.length - 1
    new Iterator[InternalRow] {
      private var i = 0
      private var bin = 0L
      private var fill = 0L
      override def hasNext: Boolean = i < m
      override def next(): InternalRow = {
        val e = arr.getStruct(i, elemType.length).copy()
        val w = e.getLong(wIdx)
        if (fill > 0 && fill + w > budget) { bin += 1; fill = 0L }
        val off = fill
        fill += w
        i += 1
        InternalRow(new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](e, bin, off)))
      }
    }
  }

  override def prettyName: String = "greedy_pack_explode"
  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression): GreedyPackExplode =
    copy(child = newChild)
}
