package graft.testutil

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Proves the leak check is LIVE, not inert: a parquet read under the
 * mixed-in trait must route through [[DebugLocalFileSystem]], and the
 * wrapper must track a directly opened stream until it closes. */
class OpenStreamLeakCheckSpec extends AnyFunSuite with OpenStreamLeakCheck {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-leakcheck-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("parquet reads route through the debug filesystem") {
    val before = DebugLocalFileSystem.totalOpens.get()
    spark.read.parquet("/root/testdata/sf0.001/region.parquet").count()
    assert(DebugLocalFileSystem.totalOpens.get() > before,
      "parquet read did not open through DebugLocalFileSystem — the per-suite leak assertion would be inert")
  }

  test("wrapper tracks an open stream and releases it on close") {
    val conf = new org.apache.hadoop.conf.Configuration()
    conf.set("fs.file.impl", classOf[DebugLocalFileSystem].getName)
    val fs = org.apache.hadoop.fs.FileSystem.newInstance(
      new java.net.URI("file:///"), conf)
    try {
      val before = DebugLocalFileSystem.openStreamCount
      val in = fs.open(new org.apache.hadoop.fs.Path(
        "/root/testdata/sf0.001/region.parquet"))
      assert(DebugLocalFileSystem.openStreamCount === before + 1)
      val origins = DebugLocalFileSystem.openStreamOrigins
      assert(origins.exists(_.contains("region.parquet")),
        s"leak origin lost the path:\n${origins.mkString("\n")}")
      in.close()
      assert(DebugLocalFileSystem.openStreamCount === before)
    } finally fs.close()
  }
}
