package graft.sources

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Pins the r17 optimization that [[Tables.table]] reads with a CACHED
  * explicit schema (one footer inference per path per JVM) instead of
  * re-inferring per DataFrame construction: the cached-read schema and
  * values must be exactly the inference-read schema and values. */
class SchemaCacheSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-schema-cache-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  test("cached-schema read is schema- and value-identical to plain inference") {
    for (t <- Seq("documents", "lineitem", "nation")) {
      val cached = Tables.table(spark, dir, t)
      val inferred = spark.read.parquet(s"$dir/$t.parquet")
      assert(cached.schema === inferred.schema, s"schema drift on $t")
      val a = cached.collect().map(_.toString).sorted
      val b = inferred.collect().map(_.toString).sorted
      assert(a.sameElements(b), s"value drift on $t")
    }
  }

  test("second construction serves the same schema object from the cache") {
    val s1 = Tables.table(spark, dir, "region").schema
    val s2 = Tables.table(spark, dir, "region").schema
    assert(s1 === s2)
  }
}
