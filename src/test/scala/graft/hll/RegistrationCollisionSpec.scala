package graft.hll

import org.apache.logging.log4j.{Level, LogManager}
import org.apache.logging.log4j.core.LogEvent
import org.apache.logging.log4j.core.appender.AbstractAppender
import org.apache.logging.log4j.core.config.{Configurator, Property}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/**
 * The name-collision diagnostic contract of registerIfAbsent (r17
 * ADVICE): a graft-vs-graft re-registration is benign and logs at INFO
 * (invisible under the primary harness's WARN level, by design), but a
 * FOREIGN binding silently winning a graft name is the case an operator
 * of the session must be able to see — it logs at WARN. Either way the
 * existing binding wins (the session owner's registry is never
 * replaced); that behavioral half is pinned here too.
 */
class RegistrationCollisionSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-registration-collision-test")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val loggerName = classOf[FunctionRegistration].getName

  /** A session whose registry has NO graft hll names: newSession() may
   * inherit GraftSparkExtensions from a sibling suite's session in this
   * shared test JVM (getOrCreate reuses the context), which would
   * pre-register everything and skew the skip counting below. */
  private def freshSession(): SparkSession = {
    val ns = spark.newSession()
    val reg = org.apache.spark.sql.graft.GraftSqlBridge.functionRegistry(ns)
    HllFunctionRegistry.entries.foreach { case (n, _, _) =>
      reg.dropFunction(org.apache.spark.sql.catalyst.FunctionIdentifier(n))
    }
    ns
  }

  /** Run `body` with a capturing appender on the registration logger at
   * INFO, returning the (level, message) lines it emitted. */
  private def captureLog(body: => Unit): Seq[(String, String)] = {
    val events = scala.collection.mutable.Buffer[(String, String)]()
    val app = new AbstractAppender("graft-reg-capture", null, null, false,
      Property.EMPTY_ARRAY) {
      override def append(e: LogEvent): Unit = synchronized {
        events += ((e.getLevel.toString, e.getMessage.getFormattedMessage))
      }
    }
    app.start()
    val logger = LogManager.getLogger(loggerName)
      .asInstanceOf[org.apache.logging.log4j.core.Logger]
    val prior = logger.getLevel
    Configurator.setLevel(loggerName, Level.INFO)
    logger.addAppender(app)
    try body finally {
      logger.removeAppender(app)
      Configurator.setLevel(loggerName, prior)
      app.stop()
    }
    events.toSeq
  }

  test("foreign binding under a graft name: kept, and flagged at WARN") {
    val ns = freshSession()
    // A user registered their own hll_cardinality BEFORE installing
    // graft — their binding must win, and the collision must be visible
    // under a WARN-level harness (the pre-r17 INFO was not).
    ns.udf.register("hll_cardinality", (_: String) => 42L)
    val log = captureLog { HllFunctionRegistry.registerFunctions(ns) }
    assert(ns.sql("select hll_cardinality('x')").head().getLong(0) === 42L,
      "the session owner's binding must win")
    val warns = log.filter(_._1 == "WARN")
    assert(warns.size === 1 && warns.head._2.contains("hll_cardinality") &&
      warns.head._2.contains("DIFFERENT"),
      s"expected one WARN for the foreign collision, got: $log")
    // The other eight names registered cleanly: no INFO skips, and a
    // non-collided graft function works end-to-end in the same session.
    assert(!log.exists(_._1 == "INFO"), s"unexpected INFO lines: $log")
    assert(ns.sql("select hll_intersect_cardinality(hll_init(1), hll_init(1))")
      .head().getLong(0) === 1L,
      "the sibling graft functions must still install despite the collision")
  }

  test("graft-vs-graft re-registration: idempotent, INFO only") {
    val ns = freshSession()
    HllFunctionRegistry.registerFunctions(ns)
    val log = captureLog { HllFunctionRegistry.registerFunctions(ns) }
    assert(!log.exists(_._1 == "WARN"),
      s"benign re-registration must not WARN: $log")
    assert(log.count(_._1 == "INFO") === HllFunctionRegistry.entries.size,
      s"one INFO skip per already-installed name, got: $log")
    assert(ns.sql("select hll_cardinality(hll_init(1))").head().getLong(0) === 1L)
  }
}
