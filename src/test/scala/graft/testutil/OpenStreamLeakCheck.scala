package graft.testutil

import java.util.concurrent.ConcurrentHashMap
import org.apache.hadoop.fs.{FSDataInputStream, LocalFileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.scalatest.{BeforeAndAfterAll, Suite}

/**
 * A `file://` filesystem that tracks every open input stream and the stack
 * that opened it, so suites can assert no parquet reader leaked a stream.
 *
 * Re-derivation of the open-stream leak check the reference wires into its
 * shared test session (reference
 * `alchemy/src/test/scala/com/swoop/test_implicits/SharedSparkSessionBase.scala:102-116`,
 * which delegates to Spark's test-jar `DebugFilesystem`): that class ships
 * only in Spark's test artifacts, which are not on this build's runtime
 * classpath, so the same idea is rebuilt here as a thin
 * [[LocalFileSystem]] wrapper — `open` registers the stream plus a
 * creation-site throwable, `close` deregisters, and whatever remains after
 * a suite is a leak with a stack trace pointing at the opener.
 */
class DebugLocalFileSystem extends LocalFileSystem {
  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    val inner = super.open(f, bufferSize)
    DebugLocalFileSystem.totalOpens.incrementAndGet()
    DebugLocalFileSystem.opened.put(inner, new Throwable(s"unclosed stream: $f"))
    new FSDataInputStream(inner) {
      override def close(): Unit =
        try super.close() finally DebugLocalFileSystem.opened.remove(inner)
    }
  }
}

object DebugLocalFileSystem {
  private val opened = new ConcurrentHashMap[AnyRef, Throwable]()

  /** Lifetime open count — lets a self-test prove reads actually route
   * through this filesystem (an inert leak check would pass trivially). */
  val totalOpens = new java.util.concurrent.atomic.AtomicLong()

  def openStreamCount: Int = opened.size()

  def openStreamOrigins: Seq[String] = {
    import scala.jdk.CollectionConverters._
    opened.values.asScala.toSeq.map { t =>
      t.getMessage + "\n    " + t.getStackTrace.take(12).mkString("\n    ")
    }
  }

  def clear(): Unit = opened.clear()
}

/**
 * Per-suite open-stream assertion: mix into any suite exposing a
 * `spark` session. `beforeAll` routes the driver-and-executor (local-mode)
 * `file://` scheme through [[DebugLocalFileSystem]] (uncached, so the
 * override takes effect immediately); `afterAll` waits briefly for
 * task-teardown closes, then fails the suite if any stream is still open,
 * printing each leak's opening stack. The previous Hadoop conf values are
 * restored afterwards so later suites in the same JVM see the default
 * filesystem again.
 */
trait OpenStreamLeakCheck extends BeforeAndAfterAll { this: Suite =>

  def spark: SparkSession

  private var saved: Map[String, Option[String]] = Map.empty
  private val Keys = Seq("fs.file.impl", "fs.file.impl.disable.cache")

  override protected def beforeAll(): Unit = {
    super.beforeAll()
    val conf = spark.sparkContext.hadoopConfiguration
    saved = Keys.map(k => k -> Option(conf.get(k))).toMap
    conf.set("fs.file.impl", classOf[DebugLocalFileSystem].getName)
    conf.set("fs.file.impl.disable.cache", "true")
    DebugLocalFileSystem.clear()
  }

  override protected def afterAll(): Unit = {
    try {
      val deadline = System.nanoTime + 5_000_000_000L
      while (DebugLocalFileSystem.openStreamCount > 0 && System.nanoTime < deadline)
        Thread.sleep(50)
      val leaks = DebugLocalFileSystem.openStreamOrigins
      assert(leaks.isEmpty,
        s"${leaks.size} file stream(s) leaked by this suite:\n${leaks.mkString("\n\n")}")
    } finally {
      val conf = spark.sparkContext.hadoopConfiguration
      saved.foreach {
        case (k, Some(v)) => conf.set(k, v)
        case (k, None) => conf.unset(k)
      }
      DebugLocalFileSystem.clear()
      super.afterAll()
    }
  }
}
