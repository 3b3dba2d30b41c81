package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // Optional 3rd arg: comma-separated query-name prefixes — dump (and
    // emit oracle SQL for) only matching queries. Local-iteration aid;
    // the driver passes two args and gets the full suite.
    val nameFilter: String => Boolean = args.lift(2) match {
      case Some(spec) =>
        val prefixes = spec.split(",").map(_.trim).filter(_.nonEmpty)
        name => prefixes.exists(name.startsWith)
      case None => _ => true
    }
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
    // Output-type contract (FIXTURES.md §4), enforced at the SOURCE: a
    // query whose final schema carries any DecimalType is refused —
    // recorded and the whole run exits non-zero after the loop — so the
    // class that cost 8 driver rows at r14 turns gate 3 red locally
    // instead of surfacing as a driver hash mismatch a round later.
    val contractViolations = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    // Remove any artifact a PRIOR run left under a query's name when
    // THIS run produced none (contract refusal or a throwing builder) —
    // otherwise tooling that globs outDir (rather than keying off the
    // exit code) would diff outdated-but-present parquet for the query
    // instead of seeing it missing.
    def dropStale(name: String): Unit = {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(); ()
      }
      val stale = new java.io.File(s"$outDir/$name")
      if (stale.exists()) rm(stale)
    }
    def dump(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      try {
        val df = fn(spark, sfDir)
        val wide = graft.queries.OutputTypeContract.decimalPaths(df.schema)
        if (wide.nonEmpty) {
          contractViolations.add(s"$name: [${wide.mkString(", ")}]")
          System.err.println(s"[verify] $name REFUSED: DecimalType in " +
            s"final schema at [${wide.mkString(", ")}] (FIXTURES.md §4)")
          dropStale(name)
        } else df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        dropStale(name)
      }
    // SPARK_GRAFT_VERIFY_THREADS > 1 is the LOCAL-ITERATION mode: queries
    // dump concurrently on the shared session. Values are unaffected
    // (every query is partition-count-neutral — oracle-proven at 4 and 32
    // shuffle partitions — and the one shared-conf mutation,
    // withStatePartitions around streaming starts, can only change a
    // concurrent plan's width); the default stays sequential so the
    // driver's runs are maximally deterministic.
    val threads = sys.env.getOrElse("SPARK_GRAFT_VERIFY_THREADS", "1").toInt
    val selected = SparkEntry.queries.filter { case (name, _) => nameFilter(name) }
    if (threads <= 1) {
      selected.foreach { case (name, fn) => dump(name, fn) }
    } else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
      try {
        val futures = selected.toSeq.map { case (name, fn) =>
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
      .filter { case (k, _) => nameFilter(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
    if (!contractViolations.isEmpty) {
      import scala.jdk.CollectionConverters._
      System.err.println("[verify] OUTPUT-TYPE CONTRACT VIOLATIONS " +
        s"(${contractViolations.size}):\n  " +
        contractViolations.asScala.mkString("\n  "))
      sys.exit(1)
    }
  }
}
