package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      // Full library install (SQL functions + optimizer rules) — the same
      // session shape a user of the packaged library runs.
      .withExtensions(new graft.hll.GraftSparkExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sources.Preflight.check(spark, sfDir)
    new java.io.File(outDir).mkdirs()
    def dump(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    // SPARK_GRAFT_VERIFY_THREADS > 1 is the LOCAL-ITERATION mode: queries
    // dump concurrently on the shared session. Values are unaffected
    // (every query is partition-count-neutral — oracle-proven at 4 and 32
    // shuffle partitions — and the one shared-conf mutation,
    // withStatePartitions around streaming starts, can only change a
    // concurrent plan's width); the default stays sequential so the
    // driver's runs are maximally deterministic.
    val threads = sys.env.getOrElse("SPARK_GRAFT_VERIFY_THREADS", "1").toInt
    if (threads <= 1) {
      SparkEntry.queries.foreach { case (name, fn) => dump(name, fn) }
    } else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
      try {
        val futures = SparkEntry.queries.toSeq.map { case (name, fn) =>
          pool.submit(new Runnable { override def run(): Unit = dump(name, fn) })
        }
        futures.foreach(_.get())
      } finally pool.shutdown()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
