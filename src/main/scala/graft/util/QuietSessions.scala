package graft.util

import org.apache.spark.sql.SparkSession

/**
 * One AQE-off child session per caller session, created lazily and shared
 * by every operator that wants the LOW-LATENCY profile for BOUNDED
 * per-round driver queries — the BPE learner's argmax collects, where AQE
 * turns a 4-job learn into a 16-job chain of per-stage driver work
 * (measured, PERF.md round 9).
 *
 * Scope warning from a measured NEGATIVE result (round 10): re-rooting a
 * WHOLE distributed pipeline here is not a win — the PPJoin family ran
 * ~0.3-0.8 s slower per query under the bench protocol with its full plan
 * on this session, because AQE's concurrent stage materialization and
 * partition coalescing outweigh its per-stage latency on multi-exchange
 * plans. Use this for small iterative collects, not as a general
 * execution mode.
 *
 * The child is `newSession()` + AQE off: it shares SparkContext and
 * cache manager (sharedState), so persisted subtrees substitute exactly
 * as on the parent. newSession resets runtime conf to the BUILDER
 * options — callers here configure sessions at build time, so the knobs
 * that matter (shuffle partitions, timezone) carry over. Weak keys: the
 * cache must not outlive the parent session.
 */
object QuietSessions {

  private val cache = new java.util.WeakHashMap[SparkSession, SparkSession]

  def of(spark: SparkSession): SparkSession = cache.synchronized {
    var q = cache.get(spark)
    if (q == null) {
      q = spark.newSession()
      q.conf.set("spark.sql.adaptive.enabled", "false")
      cache.put(spark, q)
    }
    q
  }
}
