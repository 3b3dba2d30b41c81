package graft.hll

import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateFunction
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graft.GraftSqlBridge
import org.apache.spark.sql.{Column, functions => F}

/**
 * Scala DSL for the HLL sketch operators — surface parity with the
 * reference's `com.swoop.alchemy.spark.expressions.hll.functions`
 * (reference: HLLFunctions.scala:672-792): every operator × (Column |
 * column-name) × (default error | explicit error | error + implName).
 *
 * Format precedence for every call: explicit `implName` argument >
 * [[HllFunctions.format]] bound on this instance (see
 * [[HllFunctions.withFormat]]) > session conf
 * ([[HllFormat.ConfKey]]) > StreamLib.
 */
trait HllFunctions extends Serializable {

  /** Bound wire format; null means "resolve from conf at call time". */
  protected def format: HllFormat

  protected def expr(c: Column): Expression = GraftSqlBridge.expression(c)
  protected def toColumn(e: Expression): Column = GraftSqlBridge.column(e)
  protected def toColumn(a: AggregateFunction): Column =
    GraftSqlBridge.column(a.toAggregateExpression(isDistinct = false))

  private def resolved(implName: String): HllFormat = HllFormat.resolve(implName, format)

  // hll_init -----------------------------------------------------------------

  def hll_init(e: Column, relativeSD: Double, implName: String = null): Column =
    toColumn(HllInitSimple(expr(e), relativeSD, resolved(implName)))

  def hll_init(columnName: String, relativeSD: Double): Column =
    hll_init(F.col(columnName), relativeSD)

  def hll_init(columnName: String, relativeSD: Double, implName: String): Column =
    hll_init(F.col(columnName), relativeSD, implName)

  def hll_init(e: Column): Column =
    toColumn(HllInitSimple(expr(e), format = resolved(null)))

  def hll_init(columnName: String): Column = hll_init(F.col(columnName))

  // hll_init_collection --------------------------------------------------------

  def hll_init_collection(e: Column, relativeSD: Double, implName: String = null): Column =
    toColumn(HllInitCollection(expr(e), relativeSD, resolved(implName)))

  def hll_init_collection(columnName: String, relativeSD: Double): Column =
    hll_init_collection(F.col(columnName), relativeSD)

  def hll_init_collection(columnName: String, relativeSD: Double, implName: String): Column =
    hll_init_collection(F.col(columnName), relativeSD, implName)

  def hll_init_collection(e: Column): Column =
    toColumn(HllInitCollection(expr(e), format = resolved(null)))

  def hll_init_collection(columnName: String): Column = hll_init_collection(F.col(columnName))

  // hll_init_agg ---------------------------------------------------------------

  def hll_init_agg(e: Column, relativeSD: Double, implName: String = null): Column =
    toColumn(HllInitSimpleAgg(expr(e), relativeSD, resolved(implName)))

  def hll_init_agg(columnName: String, relativeSD: Double): Column =
    hll_init_agg(F.col(columnName), relativeSD)

  def hll_init_agg(columnName: String, relativeSD: Double, implName: String): Column =
    hll_init_agg(F.col(columnName), relativeSD, implName)

  def hll_init_agg(e: Column): Column =
    toColumn(HllInitSimpleAgg(expr(e), format = resolved(null)))

  def hll_init_agg(columnName: String): Column = hll_init_agg(F.col(columnName))

  // hll_init_collection_agg ----------------------------------------------------

  def hll_init_collection_agg(e: Column, relativeSD: Double, implName: String = null): Column =
    toColumn(HllInitCollectionAgg(expr(e), relativeSD, resolved(implName)))

  def hll_init_collection_agg(columnName: String, relativeSD: Double): Column =
    hll_init_collection_agg(F.col(columnName), relativeSD)

  def hll_init_collection_agg(columnName: String, relativeSD: Double, implName: String): Column =
    hll_init_collection_agg(F.col(columnName), relativeSD, implName)

  def hll_init_collection_agg(e: Column): Column =
    toColumn(HllInitCollectionAgg(expr(e), format = resolved(null)))

  def hll_init_collection_agg(columnName: String): Column =
    hll_init_collection_agg(F.col(columnName))

  // hll_init_hashed_agg --------------------------------------------------------

  def hll_init_hashed_agg(e: Column, relativeSD: Double, implName: String = null): Column =
    toColumn(HllInitHashedAgg(expr(e), relativeSD, resolved(implName)))

  def hll_init_hashed_agg(columnName: String, relativeSD: Double): Column =
    hll_init_hashed_agg(F.col(columnName), relativeSD)

  def hll_init_hashed_agg(columnName: String, relativeSD: Double, implName: String): Column =
    hll_init_hashed_agg(F.col(columnName), relativeSD, implName)

  def hll_init_hashed_agg(e: Column): Column =
    toColumn(HllInitHashedAgg(expr(e), format = resolved(null)))

  def hll_init_hashed_agg(columnName: String): Column =
    hll_init_hashed_agg(F.col(columnName))

  // hll_merge ------------------------------------------------------------------

  def hll_merge(e: Column, implName: String = null): Column =
    toColumn(HllMerge(expr(e), resolved(implName)))

  def hll_merge(columnName: String): Column = hll_merge(F.col(columnName))

  def hll_merge(columnName: String, implName: String): Column =
    hll_merge(F.col(columnName), implName)

  // hll_row_merge --------------------------------------------------------------

  def hll_row_merge(es: Column*): Column =
    toColumn(HllRowMerge(es.map(expr), resolved(null)))

  def hll_row_merge(implName: String, es: Column*): Column =
    toColumn(HllRowMerge(es.map(expr), resolved(implName)))

  // hll_cardinality ------------------------------------------------------------

  def hll_cardinality(e: Column, implName: String = null): Column =
    toColumn(HllCardinality(expr(e), resolved(implName)))

  def hll_cardinality(columnName: String): Column = hll_cardinality(F.col(columnName))

  def hll_cardinality(columnName: String, implName: String): Column =
    hll_cardinality(F.col(columnName), implName)

  // hll_intersect_cardinality ----------------------------------------------------

  def hll_intersect_cardinality(l: Column, r: Column, implName: String = null): Column =
    toColumn(HllIntersectCardinality(expr(l), expr(r), resolved(implName)))

  def hll_intersect_cardinality(leftColumnName: String, rightColumnName: String): Column =
    hll_intersect_cardinality(F.col(leftColumnName), F.col(rightColumnName))

  def hll_intersect_cardinality(leftColumnName: String, rightColumnName: String,
      implName: String): Column =
    hll_intersect_cardinality(F.col(leftColumnName), F.col(rightColumnName), implName)

  // hll_convert ----------------------------------------------------------------

  def hll_convert(e: Column, from: String, to: String): Column =
    toColumn(HllConvert(expr(e), HllFormat.byName(from), HllFormat.byName(to)))

  def hll_convert(columnName: String, from: String, to: String): Column =
    hll_convert(F.col(columnName), from, to)

  // hll_registers --------------------------------------------------------------

  def hll_registers(e: Column): Column = toColumn(HllRegisters(expr(e)))

  def hll_registers(columnName: String): Column = hll_registers(F.col(columnName))
}

/** The default DSL entry point: `import graft.hll.functions._`. */
object functions extends HllFunctions {
  override protected val format: HllFormat = null
}

object HllFunctions {
  /** A DSL instance with every call bound to one wire format. */
  def withFormat(f: HllFormat): HllFunctions = new HllFunctions {
    override protected val format: HllFormat = f
  }
}

/**
 * Pins one estimation error across Spark's built-in `approx_count_distinct`
 * and all four sketch-init functions (reference: BoundHLL.scala:12-59).
 */
trait BoundHll extends Serializable {
  def hllError: Double
  def hllFunctions: HllFunctions

  def approx_count_distinct(col: Column): Column = F.approx_count_distinct(col, hllError)
  def approx_count_distinct(columnName: String): Column =
    F.approx_count_distinct(columnName, hllError)

  def hll_init(col: Column): Column = hllFunctions.hll_init(col, hllError)
  def hll_init(columnName: String): Column = hllFunctions.hll_init(columnName, hllError)

  def hll_init_collection(col: Column): Column = hllFunctions.hll_init_collection(col, hllError)
  def hll_init_collection(columnName: String): Column =
    hllFunctions.hll_init_collection(columnName, hllError)

  def hll_init_agg(col: Column): Column = hllFunctions.hll_init_agg(col, hllError)
  def hll_init_agg(columnName: String): Column = hllFunctions.hll_init_agg(columnName, hllError)

  def hll_init_collection_agg(col: Column): Column =
    hllFunctions.hll_init_collection_agg(col, hllError)
  def hll_init_collection_agg(columnName: String): Column =
    hllFunctions.hll_init_collection_agg(columnName, hllError)
}

object BoundHll {
  def apply(error: Double, boundFormat: HllFormat = null): BoundHll = new BoundHll {
    override val hllError: Double = error
    override val hllFunctions: HllFunctions = HllFunctions.withFormat(boundFormat)
  }
}
