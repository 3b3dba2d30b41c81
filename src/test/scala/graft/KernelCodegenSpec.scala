package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins that the scalar hash kernels really generate compilable code.
 * Under the default FALLBACK factory mode a codegen bug silently degrades
 * to interpreted eval and every functional test still passes; with
 * CODEGEN_ONLY (and whole-stage off, so the expression factory — not the
 * stage fuser — builds the projection) a broken `doGenCode` throws. */
class KernelCodegenSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-codegen-test")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("md5_hash64 / rolling_hash64 / nfc_normalize compile under CODEGEN_ONLY") {
    import spark.implicits._
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val row = Seq(("abc", "café")).toDF("s", "t")
        .select(
          graft.operators.Sampling.md5Hash64(col("s")).as("h"),
          graft.text.TextAnalysis.rollingFingerprint(col("s")).as("r"),
          graft.text.Cleanup.nfcNormalize(col("t")).as("n"))
        .head()
      // Same values the interpreted eval produces (direct static calls).
      assert(row.getLong(0) === graft.dedup.SimHash64.md5Hash64(
        org.apache.spark.unsafe.types.UTF8String.fromString("abc")))
      assert(row.getLong(1) === graft.text.RollingHash64.hashBytes(
        "abc".getBytes("UTF-8")))
      assert(row.getString(2) === "café")
    } finally {
      spark.conf.unset("spark.sql.codegen.factoryMode")
      spark.conf.unset("spark.sql.codegen.wholeStage")
    }
  }

  test("bpe_encode compiles under CODEGEN_ONLY and matches interpreted eval") {
    import spark.implicits._
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val merges = Seq(("a", "b"), ("ab", "c"))
      val gen = Seq("Abc abd  a", "xyz").toDF("t")
        .select(graft.text.Bpe.encode(col("t"), merges).as("p"))
        .collect().map(_.getSeq[String](0).toList).toList
      assert(gen === List(List("abc", "ab", "d", "a"), List("x", "y", "z")))
      // Interpreted eval (direct static call) agrees.
      val interp = graft.text.BpeEncode.encode(
        org.apache.spark.unsafe.types.UTF8String.fromString("Abc abd  a"),
        Array("a", "b", "ab", "c"))
      assert((0 until interp.numElements()).map(interp.getUTF8String(_).toString)
        === Seq("abc", "ab", "d", "a"))
    } finally {
      spark.conf.unset("spark.sql.codegen.factoryMode")
      spark.conf.unset("spark.sql.codegen.wholeStage")
    }
  }

  test("hilbert2 compiles under CODEGEN_ONLY and matches interpreted eval") {
    import spark.implicits._
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val cells = Seq((0L, 0L), (12345L, 54321L), (65535L, 0L), (0L, 65535L))
      val gen = cells.toDF("x", "y")
        .select(graft.sources.Layout.hilbert2(col("x"), col("y")).as("d"))
        .collect().map(_.getLong(0)).toSeq
      val interp = cells.map { case (x, y) =>
        graft.sources.Hilbert2(
          org.apache.spark.sql.catalyst.expressions.Literal(x),
          org.apache.spark.sql.catalyst.expressions.Literal(y))
          .eval(null).asInstanceOf[Long]
      }
      assert(gen === interp)
    } finally {
      spark.conf.unset("spark.sql.codegen.factoryMode")
      spark.conf.unset("spark.sql.codegen.wholeStage")
    }
  }

  test("sorted_long_intersect_count compiles under CODEGEN_ONLY") {
    import spark.implicits._
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      def cnt(c: org.apache.spark.sql.Column, d: org.apache.spark.sql.Column) =
        org.apache.spark.sql.graft.GraftSqlBridge.column(
          graft.dedup.SortedLongIntersectCount(
            org.apache.spark.sql.graft.GraftSqlBridge.expression(c),
            org.apache.spark.sql.graft.GraftSqlBridge.expression(d)))
      // Two calls in ONE projection — catches duplicate-local breakage
      // from inlined non-nullable snippets (the vector-kernel caveat).
      val row = Seq((Seq(1L, 2L, 5L), Seq(2L, 5L, 9L))).toDF("a", "b")
        .select(cnt(col("a"), col("b")).as("x"), cnt(col("b"), col("a")).as("y"))
        .head()
      assert(row.getInt(0) === 2)
      assert(row.getInt(1) === 2)
      val srow = Seq((Seq("a", "b", "d"), Seq("b", "c", "d"))).toDF("a", "b")
        .select(org.apache.spark.sql.graft.GraftSqlBridge.column(
          graft.dedup.SortedStringIntersectCount(
            org.apache.spark.sql.graft.GraftSqlBridge.expression(col("a")),
            org.apache.spark.sql.graft.GraftSqlBridge.expression(col("b")))).as("s"))
        .head()
      assert(srow.getInt(0) === 2)
    } finally {
      spark.conf.unset("spark.sql.codegen.factoryMode")
      spark.conf.unset("spark.sql.codegen.wholeStage")
    }
  }

  test("sorted_long_contains compiles under CODEGEN_ONLY and binary-searches") {
    import spark.implicits._
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      def has(arr: org.apache.spark.sql.Column, v: org.apache.spark.sql.Column) =
        org.apache.spark.sql.graft.GraftSqlBridge.column(
          graft.dedup.SortedLongContains(
            org.apache.spark.sql.graft.GraftSqlBridge.expression(arr),
            org.apache.spark.sql.graft.GraftSqlBridge.expression(v)))
      // Probes cover first/middle/last/absent/negative plus the empty
      // array; two calls in one projection (inlined-snippet caveat).
      val row = Seq((Seq(-7L, 1L, 2L, 5L, 9L), Seq.empty[Long])).toDF("a", "e")
        .select(
          has(col("a"), lit(-7L)).as("first"), has(col("a"), lit(2L)).as("mid"),
          has(col("a"), lit(9L)).as("last"), has(col("a"), lit(3L)).as("absent"),
          has(col("e"), lit(1L)).as("empty"))
        .head()
      assert(row.getBoolean(0) && row.getBoolean(1) && row.getBoolean(2))
      assert(!row.getBoolean(3) && !row.getBoolean(4))
    } finally {
      spark.conf.unset("spark.sql.codegen.factoryMode")
      spark.conf.unset("spark.sql.codegen.wholeStage")
    }
  }
}
