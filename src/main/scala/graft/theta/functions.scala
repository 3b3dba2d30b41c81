package graft.theta

import graft.hll.FunctionRegistration
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateFunction
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graft.GraftSqlBridge
import org.apache.spark.sql.types.{IntegerType, LongType}
import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions, functions => F}

/** Scala DSL for the theta-sketch set-algebra operators. */
object functions {

  private def toColumn(e: Expression): Column = GraftSqlBridge.column(e)
  private def toColumn(a: AggregateFunction): Column =
    GraftSqlBridge.column(a.toAggregateExpression(isDistinct = false))
  private def expr(c: Column): Expression = GraftSqlBridge.expression(c)

  def theta_init_agg(e: Column, lgK: Int = ThetaDefaults.LgK): Column =
    toColumn(ThetaInitAgg(expr(e), lgK))
  def theta_init_agg(columnName: String): Column = theta_init_agg(F.col(columnName))

  def theta_union(e: Column, lgK: Int = ThetaDefaults.LgK): Column =
    toColumn(ThetaUnionAgg(expr(e), lgK))
  def theta_union(columnName: String): Column = theta_union(F.col(columnName))

  def theta_intersect(a: Column, b: Column): Column =
    toColumn(ThetaIntersect(expr(a), expr(b)))

  def theta_a_not_b(a: Column, b: Column): Column =
    toColumn(ThetaANotB(expr(a), expr(b)))

  def theta_estimate(e: Column): Column = toColumn(ThetaEstimate(expr(e)))
}

/** SQL registration for the theta operators.
 *
 * Spark 4.1 ships its own theta-sketch SQL functions (`theta_union`,
 * `theta_sketch_agg`, ...) with different shapes — the built-in
 * `theta_union(a, b)` is a two-sketch scalar, while graft's
 * `theta_union(sketch[, lgK])` is a grouping aggregate. Overriding a
 * built-in would silently break existing SQL, so any graft name that
 * collides with a built-in registers under a `graft_` prefix instead
 * (`graft_theta_union`); non-colliding names keep their plain form. */
object ThetaFunctionRegistry extends FunctionRegistration {

  type Builder = Seq[Expression] => Expression

  /** The SQL name an entry registers under: `graft_`-prefixed when Spark
   * already ships a built-in of that name, the plain name otherwise. */
  def sqlName(name: String): String = {
    val builtin = org.apache.spark.sql.catalyst.analysis.FunctionRegistry.builtin
    if (builtin.functionExists(FunctionIdentifier(name))) s"graft_$name" else name
  }

  private def lgkOf(e: Expression): Int = e match {
    case Literal(i: Int, IntegerType) => i
    case Literal(l: Long, LongType) => l.toInt
    case _ => throw new IllegalArgumentException("the lgK parameter must be an integer literal")
  }

  private def wrongArity(name: String, got: Int): Nothing =
    throw new IllegalArgumentException(s"Invalid number of arguments for function $name: $got")

  val entries: Seq[(String, String, Builder)] = Seq(
    ("theta_init_agg",
      "_FUNC_(expr[, lgK]) - Aggregates values into a mergeable theta sketch (binary).",
      {
        case Seq(e) => ThetaInitAgg(e)
        case Seq(e, k) => ThetaInitAgg(e, lgkOf(k))
        case args => wrongArity("theta_init_agg", args.size)
      }),
    ("theta_union",
      "_FUNC_(sketch[, lgK]) - Unions previously built theta sketches per group.",
      {
        case Seq(e) => ThetaUnionAgg(e)
        case Seq(e, k) => ThetaUnionAgg(e, lgkOf(k))
        case args => wrongArity("theta_union", args.size)
      }),
    ("theta_intersect",
      "_FUNC_(a, b) - Sketch of the intersection of two theta sketches.",
      {
        case Seq(a, b) => ThetaIntersect(a, b)
        case args => wrongArity("theta_intersect", args.size)
      }),
    ("theta_a_not_b",
      "_FUNC_(a, b) - Sketch of the set difference A \\ B of two theta sketches.",
      {
        case Seq(a, b) => ThetaANotB(a, b)
        case args => wrongArity("theta_a_not_b", args.size)
      }),
    ("theta_estimate",
      "_FUNC_(sketch) - Estimated distinct count of a theta sketch (exact in exact mode).",
      {
        case Seq(e) => ThetaEstimate(e)
        case args => wrongArity("theta_estimate", args.size)
      })
  )

  private def info(name: String, usageText: String): ExpressionInfo =
    new ExpressionInfo(classOf[ThetaInitAgg].getPackage.getName, null, name, usageText, "")

  override def registerFunctions(spark: SparkSession): Unit = {
    val registry = GraftSqlBridge.functionRegistry(spark)
    entries.foreach { case (name, usageText, builder) =>
      val n = sqlName(name)
      registerIfAbsent(registry, n, info(n, usageText), builder)
    }
  }

  def inject(extensions: SparkSessionExtensions): Unit =
    entries.foreach { case (name, usageText, builder) =>
      val n = sqlName(name)
      extensions.injectFunction((FunctionIdentifier(n), info(n, usageText), builder))
    }
}
