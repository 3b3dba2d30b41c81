package graft.freq

import graft.hll.FunctionRegistration
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateFunction
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graft.GraftSqlBridge
import org.apache.spark.sql.types.{IntegerType, LongType}
import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions, functions => F}

/** Scala DSL for the frequent-items (heavy-hitters) sketch operators. */
object functions {

  private def toColumn(e: Expression): Column = GraftSqlBridge.column(e)
  private def toColumn(a: AggregateFunction): Column =
    GraftSqlBridge.column(a.toAggregateExpression(isDistinct = false))
  private def expr(c: Column): Expression = GraftSqlBridge.expression(c)

  def freq_init_agg(e: Column, maxMapSize: Int = FreqDefaults.MaxMapSize): Column =
    toColumn(FreqInitAgg(expr(e), maxMapSize))
  def freq_init_agg(columnName: String): Column = freq_init_agg(F.col(columnName))

  def freq_merge(e: Column, maxMapSize: Int = FreqDefaults.MaxMapSize): Column =
    toColumn(FreqMergeAgg(expr(e), maxMapSize))
  def freq_merge(columnName: String): Column = freq_merge(F.col(columnName))

  def freq_items(sketch: Column, minCount: Long): Column =
    toColumn(FreqItems(expr(sketch), Literal(minCount)))

  def freq_items_by_support(sketch: Column, ppm: Long): Column =
    toColumn(FreqItemsBySupport(expr(sketch), Literal(ppm)))

  def freq_estimate(sketch: Column, item: Column): Column =
    toColumn(FreqEstimate(expr(sketch), expr(item)))

  def freq_stream_length(sketch: Column): Column = toColumn(FreqStreamLength(expr(sketch)))

  def freq_max_error(sketch: Column): Column = toColumn(FreqMaxError(expr(sketch)))
}

/** SQL registration for the frequent-items operators (same pattern as the
 * HLL/KLL/theta families). */
object FreqFunctionRegistry extends FunctionRegistration {

  type Builder = Seq[Expression] => Expression

  private def sizeOf(e: Expression): Int = e match {
    case Literal(i: Int, IntegerType) => i
    case Literal(l: Long, LongType) => l.toInt
    case _ => throw new IllegalArgumentException(
      "the maxMapSize parameter must be an integer literal")
  }

  private def wrongArity(name: String, got: Int): Nothing =
    throw new IllegalArgumentException(s"Invalid number of arguments for function $name: $got")

  val entries: Seq[(String, String, Builder)] = Seq(
    ("freq_init_agg",
      "_FUNC_(expr[, maxMapSize]) - Aggregates values into a mergeable frequent-items sketch (binary).",
      {
        case Seq(e) => FreqInitAgg(e)
        case Seq(e, m) => FreqInitAgg(e, sizeOf(m))
        case args => wrongArity("freq_init_agg", args.size)
      }),
    ("freq_merge",
      "_FUNC_(sketch[, maxMapSize]) - Merges previously built frequent-items sketches per group.",
      {
        case Seq(e) => FreqMergeAgg(e)
        case Seq(e, m) => FreqMergeAgg(e, sizeOf(m))
        case args => wrongArity("freq_merge", args.size)
      }),
    ("freq_items",
      "_FUNC_(sketch, minCount) - Items with estimated count >= minCount as array<struct<item, cnt>>.",
      {
        case Seq(s, t) => FreqItems(s, t)
        case args => wrongArity("freq_items", args.size)
      }),
    ("freq_items_by_support",
      "_FUNC_(sketch, ppm) - Items above ppm parts-per-million of the stream length.",
      {
        case Seq(s, p) => FreqItemsBySupport(s, p)
        case args => wrongArity("freq_items_by_support", args.size)
      }),
    ("freq_estimate",
      "_FUNC_(sketch, item) - Estimated count of one item (0 when absent).",
      {
        case Seq(s, i) => FreqEstimate(s, i)
        case args => wrongArity("freq_estimate", args.size)
      }),
    ("freq_stream_length",
      "_FUNC_(sketch) - How many values a frequent-items sketch absorbed.",
      {
        case Seq(s) => FreqStreamLength(s)
        case args => wrongArity("freq_stream_length", args.size)
      }),
    ("freq_max_error",
      "_FUNC_(sketch) - Count-error bound of the sketch; 0 means exact.",
      {
        case Seq(s) => FreqMaxError(s)
        case args => wrongArity("freq_max_error", args.size)
      })
  )

  private def info(name: String, usageText: String): ExpressionInfo =
    new ExpressionInfo(classOf[FreqInitAgg].getPackage.getName, null, name, usageText, "")

  override def registerFunctions(spark: SparkSession): Unit = {
    val registry = GraftSqlBridge.functionRegistry(spark)
    entries.foreach { case (name, usageText, builder) =>
      registerIfAbsent(registry, name, info(name, usageText), builder)
    }
  }

  /** For injection alongside the HLL entries in GraftSparkExtensions. */
  def inject(extensions: SparkSessionExtensions): Unit =
    entries.foreach { case (name, usageText, builder) =>
      extensions.injectFunction((FunctionIdentifier(name), info(name, usageText), builder))
    }
}
