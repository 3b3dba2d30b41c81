package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Optimization-round instrumentation for the streaming band: runs the named
  * streaming queries and prints, per micro-batch, the engine's own
  * durationMs breakdown (triggerExecution / queryPlanning / getBatch /
  * addBatch / walCommit / commitOffsets / stateStore-commit hides inside
  * addBatch) — the numbers that say whether a 1.5 s drain is planning-,
  * fsync-, or compute-bound.
  *
  * {{{ sbt 'runMain graft.ProbeStream /root/testdata/sf0.1 q67_streaming_daily_counts' }}}
  */
object ProbeStream {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ProbeStream sfDir queryName...")
    val sfDir = args(0); val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.hll.GraftSparkExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val progress = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        val d = p.durationMs
        progress.add(s"  batch=${p.batchId} rows=${p.numInputRows} " +
          s"durations=${new java.util.TreeMap[String, java.lang.Long](d)}")
      }
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    })
    for (n <- names) {
      val fn = SparkEntry.queries(n)
      // one warm run, then a measured run
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      progress.clear()
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"STREAMPROBE $n%s total=$dt%.3f")
      progress.forEach(s => println(s))
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    }
    spark.stop()
  }
}
