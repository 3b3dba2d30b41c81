package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PackingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-packing-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def docsDf(rows: Seq[(String, Long, Long)]) = {
    import spark.implicits._
    rows.toDF("src", "id", "toks").repartition(4)
  }

  private def pack(rows: Seq[(String, Long, Long)], budget: Long) =
    Packing.packByBudget(docsDf(rows), col("src"), col("id"), col("toks"), budget)

  test("pack assignment is the integer prefix-sum chunking, per stream") {
    val rows = (0L until 100L).map(i => (s"s${i % 3}", i, (i % 7) + 20L))
    val out = pack(rows, budget = 64L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // Re-derive per stream on the driver with the same (md5, id) order.
    val md5s = spark.createDataFrame(rows.map(r => Tuple1(r._2))).toDF("id")
      .select(col("id"), md5(col("id").cast("string")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.groupBy(_._1).foreach { case (_, group) =>
      var running = 0L
      group.sortBy(g => (md5s(g._2), g._2)).foreach { case (s, id, toks) =>
        val got = out.find(o => o._1 == s && o._2 == id).get
        assert(got._4 === running / 64L, s"pack_id for $id")
        assert(got._5 === running % 64L, s"pack_offset for $id")
        running += toks
      }
    }
  }

  test("offsets stay under the budget and packs are dense per stream") {
    val rows = (0L until 60L).map(i => ("one", i, 30L))
    val out = pack(rows, budget = 100L)
      .select("pack_id", "pack_offset").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.forall(_._2 < 100L))
    // 60 docs x 30 tokens = 1800 tokens → first tokens span bins 0..17.
    assert(out.map(_._1).toSet === (0L until 18L).toSet)
  }

  test("zero-token and oversized documents pack without gaps or doubles") {
    val rows = Seq(("s", 1L, 0L), ("s", 2L, 500L), ("s", 3L, 10L), ("s", 4L, 0L))
    val out = pack(rows, budget = 128L).collect()
    // Total stream = 510 tokens; every start offset is < total, every
    // pack_id is start div 128 regardless of a doc spanning several bins.
    out.foreach { r =>
      val (pid, off) = (r.getLong(3), r.getLong(4))
      assert(off < 128L && pid >= 0L && pid * 128L + off < 512L)
    }
    assert(out.length === 4)
  }

  test("determinism: same input, same packing, run to run") {
    val rows = (0L until 40L).map(i => (s"s${i % 2}", i, i + 1L))
    val a = pack(rows, 97L).orderBy("id").collect().toSeq
    val b = pack(rows, 97L).orderBy("id").collect().toSeq
    assert(a === b)
  }
}
