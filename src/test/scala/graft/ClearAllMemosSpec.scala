package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the [[graft.clearAllMemos]] invalidation contract: one call must
 * empty EVERY registered per-session operator memo — prepared PPJoin
 * plans, the near-dup pair graph, connected components, assembled
 * sessions, k-means centroids — and leave no persisted frames behind. A
 * facade that silently missed one family would turn the documented
 * rewrite-inputs-in-place contract into a stale-result bug. */
class ClearAllMemosSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-clear-all-memos-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def docs(): DataFrame = {
    import spark.implicits._
    // Two literal near-dups + distinct filler so the pair graph and the
    // component labels are both non-empty.
    val near = "the quick brown fox jumps over the lazy dog again and again"
    (Seq(
      1L -> near,
      2L -> (near + " tail"),
      3L -> "completely different content about parquet shuffles and spark plans",
      4L -> "yet another unrelated document mentioning tokenizers and vocabularies"
    )).toDF("doc_id", "text")
  }

  test("clearAllMemos empties every registered memo and unpersists their frames") {
    clearAllMemos(spark) // start from a clean slate
    import spark.implicits._

    // Populate all five memo families.
    val d = docs()
    val pairs = dedup.Dedup.jaccardNearDupPairs(d, 1, 2, k = 16, rows = 2,
      shingleWidth = 3)
    assert(pairs.count() >= 1L)
    assert(dedup.Dedup.connectedComponents(pairs).count() >= 2L)
    assert(dedup.Dedup.ngramJaccardPairs(d, 1, 2, n = 3).count() >= 1L)

    val ev = Seq((1L, 0L, "view", 1L), (1L, 1L, "click", 2L))
      .toDF("user_id", "m", "event_type", "event_id")
      .select(col("user_id"),
        timestamp_micros(col("m") * 60000000L).as("ts"),
        col("event_type"), col("event_id"))
    assert(operators.Sessions.assembled(ev).count() === 1L)

    val corpus = (0L until 64L)
      .map(i => i -> Array.tabulate(4)(dim => ((i + dim) % 7).toFloat))
      .toDF("vec_id", "embedding")
    assert(similarity.Similarity.kmeansCentroids(corpus, k = 2, iters = 1)
      .count() === 2L)

    assert(dedup.Dedup.nearDupPairsMemo.stats(spark)._1 === 1)
    assert(dedup.Dedup.componentsMemo.stats(spark)._1 === 1)
    assert(dedup.Dedup.preparedPpjoinStats(spark)._1 >= 1)
    assert(operators.Sessions.assembledMemo.stats(spark)._1 === 1)
    assert(similarity.Similarity.kmeansMemoSize(spark) >= 1)

    clearAllMemos(spark)

    assert(dedup.Dedup.nearDupPairsMemo.stats(spark) === ((0, 0)))
    assert(dedup.Dedup.componentsMemo.stats(spark) === ((0, 0)))
    assert(dedup.Dedup.preparedPpjoinStats(spark) === ((0, 0)))
    assert(operators.Sessions.assembledMemo.stats(spark) === ((0, 0)))
    assert(similarity.Similarity.kmeansMemoSize(spark) === 0)
  }
}
