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
