package graft.operators

import graft.hll.functions._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SaltingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-salting-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def skewed() = {
    import spark.implicits._
    // Key "hot" holds 90% of rows; "cold1"/"cold2" the rest.
    val rows = (1 to 900).map(i => ("hot", i.toLong)) ++
      (1 to 50).map(i => ("cold1", i.toLong)) ++
      (1 to 50).map(i => ("cold2", (i + 25).toLong))
    rows.toDF("key", "v")
  }

  test("salted algebraic aggregation equals direct aggregation") {
    val df = skewed()
    val direct = df.groupBy("key")
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"),
        min(col("v")).as("lo"), max(col("v")).as("hi"))
      .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    val salted = Salting.saltedAgg(df, Seq("key"), saltBuckets = 8,
      saltSource = Seq(col("v")),
      aggs = Seq(("n", "count", lit(1)), ("s", "sum", col("v")),
        ("lo", "min", col("v")), ("hi", "max", col("v"))))
      .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    assert(salted === direct)
  }

  test("salted sketch distinct-count equals unsalted sketch distinct-count") {
    val df = skewed()
    val direct = df.groupBy("key")
      .agg(hll_init_agg(col("v"), 0.02).as("h"))
      .select(col("key"), hll_cardinality(col("h")).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Salting.saltedDistinctSketch(df, Seq("key"), col("v"),
        saltBuckets = 8, relativeSD = 0.02)
      .select(col("key"), hll_cardinality(col("value_hll")).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted === direct) // the real claim: salting changes nothing
    assert(math.abs(salted("hot") - 900L) <= 18L) // within 2% at sd=0.02
    assert(salted("cold1") === 50L) // exact at tiny cardinality
  }

  test("phase-1 state is bounded: every (key, salt) cell stays under the hot-key volume") {
    val df = skewed().withColumn("__salt", Salting.salt(8, col("v")))
    val maxCell = df.groupBy("key", "__salt").count()
      .agg(max("count")).head().getLong(0)
    assert(maxCell < 900 / 4, s"salting failed to split the hot key (max cell = $maxCell)")
  }

  test("salted join equals the plain join, duplicates and hot keys included") {
    import spark.implicits._
    // Hot key 7 holds half the probe rows; build has duplicate key rows
    // (two rows for key 7) to prove multiset semantics survive.
    val probe = ((1 to 500).map(i => (7L, i)) ++ (1 to 500).map(i => (i.toLong % 50, -i)))
      .toDF("k", "pv").repartition(4)
    val build = (Seq((7L, "a"), (7L, "b")) ++ (0L until 50L).map(k => (k, s"v$k")))
      .toDF("k", "bv").repartition(4)
    val salted = graft.operators.Salting.saltedJoin(probe, build, Seq("k"), 8)
      .select("k", "pv", "bv").collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    val plain = probe.join(build, "k")
      .select("k", "pv", "bv").collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    assert(salted.sorted.toSeq === plain.sorted.toSeq)
    // 510 probe rows for key 7 (500 hot + 10 from i%50==7) x (a, b, v7).
    assert(plain.count(_._1 == 7L) === 510 * 3)
  }

  test("non-algebraic aggregate kinds are rejected loudly") {
    val e = intercept[IllegalArgumentException] {
      Salting.saltedAgg(skewed(), Seq("key"), 4, Seq(col("v")),
        Seq(("m", "median", col("v"))))
    }
    assert(e.getMessage.contains("median"))
  }

  test("AQE splits the skewed join partition when salting is not applied") {
    // Manual salting (above) is the always-works path; this pins the
    // OTHER half of the skew story claimed in Salting's scaladoc — that
    // unsalted plans still degrade gracefully because AQE's runtime
    // skew-join split composes with everything this library emits. One
    // hot key dominates the left side; with broadcast disabled the join
    // must sort-merge, and AQE has to mark/split the oversized partition.
    import spark.implicits._
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
      .map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
      val pad = "x" * 64
      val left = spark.range(0L, 60000L)
        .select(when(col("id") < 50000L, 0L).otherwise(col("id") % 40L).as("k"),
          concat(col("id").cast("string"), lit(pad)).as("payload"))
      val right = (0L until 40L).map(k => (k, s"dim$k")).toDF("k", "dv")
        .repartition(4)
      val joined = left.join(right, "k")
      // Execute THIS frame's plan (count() would build a separate one):
      // AQE only rewrites to the final skew-split plan during execution.
      assert(joined.collect().length === 60000)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("SortMergeJoin"),
        s"expected a sort-merge join under AQE, got:\n$finalPlan")
      assert(finalPlan.toLowerCase.contains("skew"),
        s"AQE did not flag/split the skewed partition:\n$finalPlan")
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
  }
}
