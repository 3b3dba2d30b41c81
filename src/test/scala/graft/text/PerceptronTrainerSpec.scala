package graft.text

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PerceptronTrainerSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-perceptron-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def bucketOf(token: String): Int = {
    import spark.implicits._
    Seq(token).toDF("t")
      .select(TextAnalysis.tokenBucket(col("t"))).head().getLong(0).toInt
  }

  test("first epoch update is the labeled occurrence sum per bucket") {
    import spark.implicits._
    // w=0 makes every doc misclassified (y*0 <= 0), so epoch 1 must add
    // y per token OCCURRENCE: +2 on alpha's bucket (it appears twice in
    // the one positive doc), -1 on beta's.
    val docs = Seq(("alpha alpha", 1L), ("beta", -1L)).toDF("text", "y")
    val w = PerceptronTrainer.trainHashedBow(docs, col("text"), col("y"), epochs = 1)
    val (ba, bb) = (bucketOf("alpha"), bucketOf("beta"))
    assume(ba != bb) // md5 collision in 2048 buckets would void the arithmetic
    assert(w(ba) === 2L)
    assert(w(bb) === -1L)
    assert(w.zipWithIndex.filter { case (_, i) => i != ba && i != bb }.forall(_._1 == 0L))
  }

  test("trained weights separate a separable corpus through the scorer seam") {
    import spark.implicits._
    val docs = Seq(
      ("good fine great", 1L), ("good good fine", 1L), ("great fine", 1L),
      ("bad awful", -1L), ("awful awful bad", -1L), ("bad bad", -1L))
      .toDF("text", "y")
    val w = PerceptronTrainer.trainHashedBow(docs, col("text"), col("y"), epochs = 3)
    val scored = docs
      .select(col("y"), TextAnalysis.linearQualityScore(col("text"), w.toSeq).as("m"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // Perceptron on linearly separable data: every doc ends on its side.
    assert(scored.forall { case (y, m) => y * m > 0 },
      s"not separated: ${scored.mkString(",")}")
    // Determinism: batch updates are integer sums — retrain agrees exactly.
    assert(PerceptronTrainer.trainHashedBow(docs, col("text"), col("y"), epochs = 3)
      .toSeq === w.toSeq)
  }
}
