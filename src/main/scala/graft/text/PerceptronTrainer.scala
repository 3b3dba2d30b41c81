package graft.text

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * In-engine training for the hashed bag-of-words quality/language filter —
 * the closing of the loop that [[TextAnalysis.linearQualityScore]]'s
 * trained-weights seam left open: instead of importing a model, the engine
 * LEARNS the [[TextAnalysis.QualityBuckets]]-entry weight table from a
 * labeled corpus and feeds it straight back into the same codegen'd
 * scorer (the role fastText training plays in CCNet/RefinedWeb-style
 * curation, re-expressed as relational passes).
 *
 * Algorithm: batch perceptron (Rosenblatt updates aggregated per epoch).
 * Per epoch, every misclassified document (y·margin <= 0) contributes
 * y to the weight of each of its token-occurrence buckets:
 *
 *   w_{e+1}[b] = w_e[b] + Σ_{misclassified docs} y · count_b(doc)
 *
 * Chosen over SGD precisely because the batch update is an integer SUM —
 * commutative, partial-aggregation-friendly, and therefore deterministic
 * under any partitioning and bit-identical in any engine (the DuckDB
 * oracle unrolls the epochs as CTEs). Sequential SGD's answer depends on
 * visit order, which no distributed engine should promise.
 *
 * Scale contract: each epoch is (1) one codegen'd scoring pass — margins
 * come from [[TextAnalysis.linearQualityScore]] with the current table
 * plan-embedded, no join, nothing shuffles; (2) one (bucket, Σy)
 * aggregation over the misclassified slice — the shuffle carries at most
 * `buckets` rows after map-side partials, text never leaves its scan.
 * The driver collects ≤ `buckets` longs per epoch (the model itself — the
 * same bounded-collect contract as k-means centroids and the BPE merge
 * table). The corpus projection persists across epochs, one scan total.
 */
object PerceptronTrainer {

  /** Returns the learned weight table, sized [[TextAnalysis.QualityBuckets]]
   * — pass it to [[TextAnalysis.linearQualityScore]](text, weights).
   *
   * @param label ±1 (cast to long); e.g. `when(col("lang") === "en", 1L).otherwise(-1L)`
   */
  def trainHashedBow(docs: DataFrame, text: Column, label: Column,
      epochs: Int = 3): Array[Long] = {
    require(epochs > 0, "epochs must be positive")
    // Tokenize + feature-hash ONCE, persist the per-doc bucket ARRAYS:
    // every epoch's scoring pass and update aggregation read integer
    // bucket ids instead of re-running the regex tokenizer and the md5
    // feature hash over the corpus text (optimization guide §1.2 "per-task
    // work": the tokenize+hash was ~the whole per-epoch map cost, paid
    // `epochs` times). The margin below is linearQualityScore's exact
    // arithmetic applied to the precomputed buckets — same fold, same
    // element_at lookup, bit-identical weights (PerceptronTrainerSpec pins
    // the scorer-equivalence property; the persisted rows are also
    // SMALLER than the text they replace: one long per token occurrence).
    val base = docs.select(
        transform(TextAnalysis.tokens(text),
          t => TextAnalysis.tokenBucket(t)).as("bs"),
        label.cast("long").as("y"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val w = Array.fill(TextAnalysis.QualityBuckets)(0L)
    var epoch = 0
    while (epoch < epochs) {
      val warr = typedLit(w.toSeq)
      val margin = aggregate(col("bs"), lit(0L),
        (acc, b) => acc + element_at(warr, (b + lit(1L)).cast("int")))
      val delta = base
        .filter(col("y") * margin <= 0)
        .select(col("y"), explode(col("bs")).as("b"))
        .groupBy(col("b")).agg(sum(col("y")).as("d"))
        .collect()
      delta.foreach(r => w(r.getLong(0).toInt) += r.getLong(1))
      epoch += 1
    }
    base.unpersist(blocking = false)
    w
  }
}
