package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Targeted correctness dump: like [[Verify]] but for a NAMED SUBSET of
  * `SparkEntry.queries` — the fast inner loop while iterating on one
  * operator. Writes each result to `outDir/<name>` plus an
  * `oracle_sql.json` restricted to those names, in the exact layout
  * `tools/check_oracle.py` consumes:
  *
  * {{{
  * sbt 'runMain graft.DumpQueries /tmp/q_out /root/testdata/sf0.01 q14_lsh_near_dup'
  * python3 tools/check_oracle.py /root/testdata/sf0.01 /tmp/q_out
  * }}}
  *
  * args: outDir sfDir queryName [queryName...]
  */
object DumpQueries {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: DumpQueries outDir sfDir queryName...")
    val outDir = args(0); val sfDir = args(1); val names = args.drop(2).toSeq
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      // Full library install (SQL functions + optimizer rules) — the same
      // session shape a user of the packaged library runs.
      .withExtensions(new graft.hll.GraftSparkExtensions)
      .master(s"local[$cpus]")
      .appName("graft-dump-queries")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sources.Preflight.check(spark, sfDir)
    new java.io.File(outDir).mkdirs()
    for (n <- names) {
      SparkEntry.queries(n)(spark, sfDir)
        .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$n")
      println(s"DUMPED $n rows=" + spark.read.parquet(s"$outDir/$n").count())
    }
    // Same escape rules as Verify: control chars in builder-authored SQL
    // must not break the consumer's json.load.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = names.filter(SparkEntry.oracleSql.contains)
      .map(n => s"${q(n)}: ${q(SparkEntry.oracleSql(n))}").mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    println("WROTE oracle_sql.json")
    spark.stop()
  }
}
