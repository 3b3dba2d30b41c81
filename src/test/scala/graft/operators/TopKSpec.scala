package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TopKSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-topk-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def data = {
    import spark.implicits._
    // Three groups, duplicate scores (tie-break by id), one group smaller
    // than k — spread over partitions so partial merge paths run.
    val rows = (1 to 60).map(i => (s"g${i % 3}", (i * 37) % 10, i.toLong)) :+
      (("solo", 5, 999L))
    rows.toDF("g", "score", "id").repartition(4)
  }

  test("topKStructs equals the window row_number top-k, ties and short groups included") {
    val df = data
    // Top-3 by (score desc, id asc): encode as min-structs of (-score, id).
    val agg = df
      .groupBy("g")
      .agg(sort_array(TopK.topKStructs(struct((-col("score")).as("ns"), col("id")), 3)).as("tk"))
      .select(col("g"), posexplode(col("tk")).as(Seq("pos", "t")))
      .select(col("g"), (col("pos") + 1).as("rank"),
        (-col("t.ns")).as("score"), col("t.id").as("id"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getLong(3))).toSet
    val w = Window.partitionBy("g").orderBy(col("score").desc, col("id").asc)
    val win = df.withColumn("rank", row_number().over(w)).filter(col("rank") <= 3)
      .select(col("g"), col("rank"), col("score"), col("id"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getLong(3))).toSet
    assert(agg === win)
    assert(agg.exists(_._1 == "solo")) // group smaller than k still emits
  }

  test("top-k aggregate runs partially below the exchange (bounded shuffle)") {
    val plan = data.groupBy("g")
      .agg(TopK.topKStructs(struct(col("score"), col("id")), 3).as("tk"))
      .queryExecution.executedPlan.toString
    val firstAgg = plan.indexOf("ObjectHashAggregate")
    val exchange = plan.indexOf("Exchange")
    assert(firstAgg >= 0, s"expected ObjectHashAggregate:\n$plan")
    // Physical plans print top-down: final agg, exchange, PARTIAL agg.
    val partialBelow = plan.indexOf("ObjectHashAggregate", exchange)
    assert(exchange >= 0 && partialBelow > exchange,
      s"no partial aggregation below the exchange:\n$plan")
  }
}
