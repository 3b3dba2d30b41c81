package graft.kll

import graft.hll.FunctionRegistration
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateFunction
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graft.GraftSqlBridge
import org.apache.spark.sql.types.{IntegerType, LongType}
import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions, functions => F}

/** Scala DSL for the KLL quantile-sketch operators. */
object functions {

  private def toColumn(e: Expression): Column = GraftSqlBridge.column(e)
  private def toColumn(a: AggregateFunction): Column =
    GraftSqlBridge.column(a.toAggregateExpression(isDistinct = false))
  private def expr(c: Column): Expression = GraftSqlBridge.expression(c)

  def kll_init_agg(e: Column, k: Int = KllDefaults.K): Column =
    toColumn(KllInitAgg(expr(e), k))
  def kll_init_agg(columnName: String): Column = kll_init_agg(F.col(columnName))

  def kll_merge(e: Column, k: Int = KllDefaults.K): Column =
    toColumn(KllMergeAgg(expr(e), k))
  def kll_merge(columnName: String): Column = kll_merge(F.col(columnName))

  def kll_quantile(sketch: Column, q: Double): Column =
    toColumn(KllQuantile(expr(sketch), Literal(q)))

  def kll_rank(sketch: Column, value: Double): Column =
    toColumn(KllRank(expr(sketch), Literal(value)))

  def kll_n(sketch: Column): Column = toColumn(KllCount(expr(sketch)))

  def kll_cdf(sketch: Column, splitPoints: Seq[Double]): Column =
    toColumn(KllCdf(expr(sketch), expr(F.array(splitPoints.map(F.lit): _*))))

  def kll_pmf(sketch: Column, splitPoints: Seq[Double]): Column =
    toColumn(KllPmf(expr(sketch), expr(F.array(splitPoints.map(F.lit): _*))))
}

/** SQL registration for the KLL operators (same pattern as the HLL family). */
object KllFunctionRegistry extends FunctionRegistration {

  type Builder = Seq[Expression] => Expression

  private def kOf(e: Expression): Int = e match {
    case Literal(i: Int, IntegerType) => i
    case Literal(l: Long, LongType) => l.toInt
    case _ => throw new IllegalArgumentException(
      "the k parameter must be an integer literal")
  }

  private def wrongArity(name: String, got: Int): Nothing =
    throw new IllegalArgumentException(s"Invalid number of arguments for function $name: $got")

  val entries: Seq[(String, String, Builder)] = Seq(
    ("kll_init_agg",
      "_FUNC_(expr[, k]) - Aggregates values into a mergeable KLL quantile sketch (binary).",
      {
        case Seq(e) => KllInitAgg(e)
        case Seq(e, k) => KllInitAgg(e, kOf(k))
        case args => wrongArity("kll_init_agg", args.size)
      }),
    ("kll_merge",
      "_FUNC_(sketch) - Merges previously built KLL sketches per group.",
      {
        case Seq(e) => KllMergeAgg(e)
        case Seq(e, k) => KllMergeAgg(e, kOf(k))
        case args => wrongArity("kll_merge", args.size)
      }),
    ("kll_quantile",
      "_FUNC_(sketch, q) - Returns the inclusive q-quantile estimate of a KLL sketch.",
      {
        case Seq(s, q) => KllQuantile(s, q)
        case args => wrongArity("kll_quantile", args.size)
      }),
    ("kll_rank",
      "_FUNC_(sketch, value) - Returns the inclusive normalized rank of value in a KLL sketch.",
      {
        case Seq(s, v) => KllRank(s, v)
        case args => wrongArity("kll_rank", args.size)
      }),
    ("kll_n",
      "_FUNC_(sketch) - Returns how many values a KLL sketch has absorbed.",
      {
        case Seq(s) => KllCount(s)
        case args => wrongArity("kll_n", args.size)
      }),
    ("kll_cdf",
      "_FUNC_(sketch, splitPoints) - Inclusive CDF at each split point plus a final 1.0.",
      {
        case Seq(s, sp) => KllCdf(s, sp)
        case args => wrongArity("kll_cdf", args.size)
      }),
    ("kll_pmf",
      "_FUNC_(sketch, splitPoints) - Probability mass between consecutive split points.",
      {
        case Seq(s, sp) => KllPmf(s, sp)
        case args => wrongArity("kll_pmf", args.size)
      })
  )

  private def info(name: String, usageText: String): ExpressionInfo =
    new ExpressionInfo(classOf[KllInitAgg].getPackage.getName, null, name, usageText, "")

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
