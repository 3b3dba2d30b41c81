package graft.bloom

import graft.hll.FunctionRegistration
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateFunction
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graft.GraftSqlBridge
import org.apache.spark.sql.types.{IntegerType, LongType}
import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions, functions => F}

/** Scala DSL for the bloom-filter membership operators. */
object functions {

  private def toColumn(e: Expression): Column = GraftSqlBridge.column(e)
  private def toColumn(a: AggregateFunction): Column =
    GraftSqlBridge.column(a.toAggregateExpression(isDistinct = false))
  private def expr(c: Column): Expression = GraftSqlBridge.expression(c)

  def bloom_init_agg(e: Column, expectedItems: Long = 1L << 20,
      fppPpm: Long = BloomDefaults.FppPpm): Column =
    toColumn(BloomInitAgg(expr(e), expectedItems, fppPpm))
  def bloom_init_agg(columnName: String): Column = bloom_init_agg(F.col(columnName))

  def bloom_merge(e: Column, expectedItems: Long = 1L << 20,
      fppPpm: Long = BloomDefaults.FppPpm): Column =
    toColumn(BloomMergeAgg(expr(e), expectedItems, fppPpm))
  def bloom_merge(columnName: String): Column = bloom_merge(F.col(columnName))

  def bloom_might_contain(filter: Column, item: Column): Column =
    toColumn(BloomMightContain(expr(filter), expr(item)))

  def bloom_fill_fraction(filter: Column): Column =
    toColumn(BloomFillFraction(expr(filter)))
}

/** SQL registration for the bloom operators (same pattern as HLL/KLL/freq). */
object BloomFunctionRegistry extends FunctionRegistration {

  type Builder = Seq[Expression] => Expression

  private def longOf(e: Expression, what: String): Long = e match {
    case Literal(i: Int, IntegerType) => i.toLong
    case Literal(l: Long, LongType) => l
    case _ => throw new IllegalArgumentException(s"$what must be an integer literal")
  }

  private def wrongArity(name: String, got: Int): Nothing =
    throw new IllegalArgumentException(s"Invalid number of arguments for function $name: $got")

  val entries: Seq[(String, String, Builder)] = Seq(
    ("bloom_init_agg",
      "_FUNC_(expr[, expectedItems[, fppPpm]]) - Aggregates values into a mergeable bloom filter (binary).",
      {
        case Seq(e) => BloomInitAgg(e)
        case Seq(e, n) => BloomInitAgg(e, longOf(n, "expectedItems"))
        case Seq(e, n, p) => BloomInitAgg(e, longOf(n, "expectedItems"), longOf(p, "fppPpm"))
        case args => wrongArity("bloom_init_agg", args.size)
      }),
    ("bloom_merge",
      "_FUNC_(filter[, expectedItems[, fppPpm]]) - Unions previously built bloom filters per group.",
      {
        case Seq(e) => BloomMergeAgg(e)
        case Seq(e, n) => BloomMergeAgg(e, longOf(n, "expectedItems"))
        case Seq(e, n, p) => BloomMergeAgg(e, longOf(n, "expectedItems"), longOf(p, "fppPpm"))
        case args => wrongArity("bloom_merge", args.size)
      }),
    ("bloom_might_contain",
      "_FUNC_(filter, value) - False means definitely absent; true up to the filter's fpp.",
      {
        case Seq(f, v) => BloomMightContain(f, v)
        case args => wrongArity("bloom_might_contain", args.size)
      }),
    ("bloom_fill_fraction",
      "_FUNC_(filter) - Fraction of set bits (saturation gauge).",
      {
        case Seq(f) => BloomFillFraction(f)
        case args => wrongArity("bloom_fill_fraction", args.size)
      })
  )

  private def info(name: String, usageText: String): ExpressionInfo =
    new ExpressionInfo(classOf[BloomInitAgg].getPackage.getName, null, name, usageText, "")

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
