package graft.hll

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The SparkSessionExtensions installation path — what `--conf
 * spark.sql.extensions=graft.hll.GraftSparkExtensions` does on a cluster. */
class ExtensionsSpec extends AnyFunSuite {

  test("a session built withExtensions(GraftSparkExtensions) has every function in SQL") {
    // Extensions only apply at session construction, so this suite builds
    // its own; any session a previous suite left active is superseded (later
    // suites' getOrCreate then sees this one — a superset, nothing lost).
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-extensions-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftSparkExtensions)
      .getOrCreate()

    val names = Seq("hll_init", "hll_init_collection", "hll_init_agg",
      "hll_init_collection_agg", "hll_merge", "hll_row_merge",
      "hll_cardinality", "hll_intersect_cardinality", "hll_convert")
    names.foreach { n =>
      assert(spark.catalog.functionExists(n), s"$n missing from catalog")
    }

    // End-to-end through the SQL parser/analyzer with no manual registration.
    val card = spark.sql(
      "SELECT hll_cardinality(hll_merge(h)) FROM " +
        "(SELECT hll_init_agg(id % 5) AS h FROM range(1000) GROUP BY id % 10)"
    ).head().getLong(0)
    assert(card === 5L)

    // DESCRIBE FUNCTION surfaces the usage doc like a built-in.
    val desc = spark.sql("DESCRIBE FUNCTION hll_init").collect().map(_.getString(0)).mkString("\n")
    assert(desc.contains("hll_init"))
  }
}
