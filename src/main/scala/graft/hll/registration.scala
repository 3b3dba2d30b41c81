package graft.hll

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.aggregate.HyperLogLogPlusPlus
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graft.GraftSqlBridge
import org.apache.spark.sql.types.StringType
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/** SPI: anything that can install functions into a session (reference:
 * alchemy/src/main/scala/com/swoop/alchemy/spark/expressions/FunctionRegistration.scala:5-7). */
trait FunctionRegistration {
  def registerFunctions(spark: SparkSession): Unit

  /** Register `name` only if it is not already in the session's registry.
   * Registration must be IDEMPOTENT: a session built
   * `withExtensions(new GraftSparkExtensions)` already carries every
   * function, and a second explicit `registerFunctions` call (the
   * reference-style entry point, reached e.g. from SQL-surface queries)
   * would otherwise emit Spark's "replaced a previously registered
   * function" WARN once per name — dozens of log lines drowning the one
   * JSON line harnesses parse. Skipping on presence is safe for
   * graft-vs-graft collisions because every graft registration installs
   * the identical builder for a given name. CAVEAT (deliberate): if the
   * session owner registered a DIFFERENT function under a graft name
   * before calling this, their binding WINS and graft's is not
   * installed — the session owner's registry is not silently overridden
   * (the pre-change behavior replaced it with only a WARN). To install
   * graft's implementation over a conflicting name, drop the existing
   * function from the registry first. */
  protected final def registerIfAbsent(
      registry: org.apache.spark.sql.catalyst.analysis.FunctionRegistry,
      name: String, expressionInfo: ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit = {
    val id = FunctionIdentifier(name)
    if (!registry.functionExists(id)) {
      registry.registerFunction(id, expressionInfo, builder)
    } else {
      // Two-level diagnostic on the skipped name. Every graft
      // registration stamps ExpressionInfo.className with its own
      // package (graft.hll / graft.theta / ...), so an existing binding
      // whose className matches the one we are about to install is the
      // benign graft-vs-graft re-registration (idempotent extensions +
      // explicit register call) — INFO, which keeps the bench harness's
      // parsed stdout tail clean. Anything ELSE (user-registered, or a
      // future Spark builtin colliding with a graft name) silently wins
      // the resolution, so it logs at WARN — visible under the primary
      // harness's WARN level, where the pre-r17 INFO was invisible.
      val existing = registry.lookupFunction(id)
      val sameImpl = existing.exists(e =>
        e.getClassName != null && e.getClassName == expressionInfo.getClassName)
      if (sameImpl) {
        FunctionRegistration.log.info(
          s"graft: skipped re-registering '$name' — graft's binding is " +
            "already installed in this session registry")
      } else {
        FunctionRegistration.log.warn(
          s"graft: NOT registering '$name' — the session registry " +
            "already has a DIFFERENT function under this name " +
            s"(${existing.map(_.getClassName).orNull}); the existing " +
            "binding wins (drop it first to install graft's " +
            "implementation)")
      }
    }
  }
}

object FunctionRegistration {
  private val log = org.slf4j.LoggerFactory.getLogger(classOf[FunctionRegistration])
}

/**
 * Registers the nine sketch operators into a session's FunctionRegistry so
 * they are callable from SparkSQL (and therefore from PySpark) exactly like
 * built-ins.
 *
 * Unlike the reference's reflective constructor scan (reference:
 * NativeFunctionRegistration.scala:29-70), builders here are explicit
 * pattern matches per SQL arity — no reflection, and arity errors surface
 * with precise messages at analysis time.
 */
object HllFunctionRegistry extends FunctionRegistration {

  type Builder = Seq[Expression] => Expression

  private def usage(text: String): String = text

  private def sd(e: Expression): Double = HyperLogLogPlusPlus.validateDoubleLiteral(e)

  private def fmt(e: Expression, position: String): HllFormat = e match {
    case Literal(s, _: StringType) if s != null => HllFormat.byName(s.toString)
    case _ => throw new IllegalArgumentException(
      s"The $position must be a string literal (${HllFormat.Names.mkString("/")}) " +
        "designating one of the implementation options.")
  }

  private def wrongArity(name: String, got: Int): Nothing =
    throw new IllegalArgumentException(s"Invalid number of arguments for function $name: $got")

  /** (name, usage, builder) for each SQL function. */
  val entries: Seq[(String, String, Builder)] = Seq(
    ("hll_init",
      usage("_FUNC_(expr[, relativeSD[, implName]]) - Per row: returns a composable HLL sketch of the value."),
      {
        case Seq(e) => HllInitSimple(e)
        case Seq(e, r) => HllInitSimple(e, sd(r))
        case Seq(e, r, i) => HllInitSimple(e, sd(r), fmt(i, "third argument"))
        case args => wrongArity("hll_init", args.size)
      }),
    ("hll_init_collection",
      usage("_FUNC_(arrayOrMap[, relativeSD[, implName]]) - Per row: returns an HLL sketch of the collection's members."),
      {
        case Seq(e) => HllInitCollection(e)
        case Seq(e, r) => HllInitCollection(e, sd(r))
        case Seq(e, r, i) => HllInitCollection(e, sd(r), fmt(i, "third argument"))
        case args => wrongArity("hll_init_collection", args.size)
      }),
    ("hll_init_agg",
      usage("_FUNC_(expr[, relativeSD[, implName]]) - Per group: returns an HLL sketch of all non-null values."),
      {
        case Seq(e) => HllInitSimpleAgg(e)
        case Seq(e, r) => HllInitSimpleAgg(e, sd(r))
        case Seq(e, r, i) => HllInitSimpleAgg(e, sd(r), fmt(i, "third argument"))
        case args => wrongArity("hll_init_agg", args.size)
      }),
    ("hll_init_collection_agg",
      usage("_FUNC_(arrayOrMap[, relativeSD[, implName]]) - Per group: returns an HLL sketch of all collection members."),
      {
        case Seq(e) => HllInitCollectionAgg(e)
        case Seq(e, r) => HllInitCollectionAgg(e, sd(r))
        case Seq(e, r, i) => HllInitCollectionAgg(e, sd(r), fmt(i, "third argument"))
        case args => wrongArity("hll_init_collection_agg", args.size)
      }),
    ("hll_merge",
      usage("_FUNC_(sketch[, implName]) - Per group: unions HLL sketches into one (re-aggregation)."),
      {
        case Seq(e) => HllMerge(e)
        case Seq(e, i) => HllMerge(e, fmt(i, "second argument"))
        case args => wrongArity("hll_merge", args.size)
      }),
    ("hll_row_merge",
      usage("_FUNC_(sketch1, ..., sketchN[, implName]) - Unions N sketch columns within one row."),
      {
        // A trailing string literal is the implName (there is no other way to
        // distinguish it from a sketch column in a vararg SQL signature).
        case args if args.nonEmpty => args.last match {
          case Literal(s, _: StringType) if s != null =>
            HllRowMerge(args.init, HllFormat.byName(s.toString))
          case _ => HllRowMerge(args)
        }
        case args => wrongArity("hll_row_merge", args.size)
      }),
    ("hll_cardinality",
      usage("_FUNC_(sketch[, implName]) - Returns the estimated cardinality of an HLL sketch."),
      {
        case Seq(e) => HllCardinality(e)
        case Seq(e, i) => HllCardinality(e, fmt(i, "second argument"))
        case args => wrongArity("hll_cardinality", args.size)
      }),
    ("hll_intersect_cardinality",
      usage("_FUNC_(sketchL, sketchR[, implName]) - Estimates |L ∩ R| via inclusion-exclusion over merged sketches."),
      {
        case Seq(l, r) => HllIntersectCardinality(l, r)
        case Seq(l, r, i) => HllIntersectCardinality(l, r, fmt(i, "third argument"))
        case args => wrongArity("hll_intersect_cardinality", args.size)
      }),
    ("hll_convert",
      usage("_FUNC_(sketch, implNameFrom, implNameTo) - Transcodes sketch bytes between wire formats."),
      {
        case Seq(e, from, to) =>
          HllConvert(e, fmt(from, "second argument"), fmt(to, "third argument"))
        case args => wrongArity("hll_convert", args.size)
      }),
    ("hll_init_hashed_agg",
      usage("_FUNC_(hash64[, relativeSD[, implName]]) - Per group: returns an HLL sketch built from pre-hashed 64-bit values."),
      {
        case Seq(e) => HllInitHashedAgg(e)
        case Seq(e, r) => HllInitHashedAgg(e, sd(r))
        case Seq(e, r, i) => HllInitHashedAgg(e, sd(r), fmt(i, "third argument"))
        case args => wrongArity("hll_init_hashed_agg", args.size)
      }),
    ("hll_registers",
      usage("_FUNC_(graftSketch) - Returns the dense register array of a GRAFT v1 sketch."),
      {
        case Seq(e) => HllRegisters(e)
        case args => wrongArity("hll_registers", args.size)
      })
  )

  private def info(name: String, usageText: String): ExpressionInfo =
    new ExpressionInfo(classOf[HllInitSimple].getPackage.getName, null, name, usageText, "")

  /** Install into an existing session (reference-style entry point);
   * idempotent — see [[FunctionRegistration.registerIfAbsent]]. */
  override def registerFunctions(spark: SparkSession): Unit = {
    val registry = GraftSqlBridge.functionRegistry(spark)
    entries.foreach { case (name, usageText, builder) =>
      registerIfAbsent(registry, name, info(name, usageText), builder)
    }
  }
}

/**
 * Spark-4-idiomatic installation path:
 * `SparkSession.builder().withExtensions(new GraftSparkExtensions)` or
 * `--conf spark.sql.extensions=graft.hll.GraftSparkExtensions`.
 */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit = {
    HllFunctionRegistry.entries.foreach { case (name, usageText, builder) =>
      extensions.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[HllInitSimple].getPackage.getName, null, name, usageText, ""),
        builder))
    }
    graft.kll.KllFunctionRegistry.inject(extensions)
    graft.theta.ThetaFunctionRegistry.inject(extensions)
    graft.freq.FreqFunctionRegistry.inject(extensions)
    graft.bloom.BloomFunctionRegistry.inject(extensions)
    graft.GraftFunctionRegistry.inject(extensions)
    // Sketch-eval fusion: running windows estimate off the live buffer
    // instead of serializing per row (see FuseWindowSketchEval).
    extensions.injectOptimizerRule(_ => FuseWindowSketchEval)
  }
}
