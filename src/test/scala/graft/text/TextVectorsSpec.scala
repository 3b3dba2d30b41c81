package graft.text

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class TextVectorsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-textvectors-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Same md5-64 as the engine (first 8 bytes big-endian). */
  private def md5h(s: String): Long = {
    val b = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    (0 until 8).foldLeft(0L)((h, i) => (h << 8) | (b(i) & 0xFFL))
  }

  private def refCoords(docs: Seq[(Long, String)], dim: Int): Map[(Long, Long), Long] =
    docs.flatMap { case (id, text) =>
      text.toLowerCase.split("\\s+").filter(_.nonEmpty).map { t =>
        val u = md5h(t) >>> 1
        ((id, u % dim), if (((u >>> 32) % 2) == 1) 1L else -1L)
      }
    }.groupBy(_._1).view.mapValues(_.map(_._2).sum).filter(_._2 != 0L).toMap

  test("hashedTfCoords equals the plain-Scala hashing-trick reference") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta alpha  GAMMA"),
      (2L, "beta beta beta"),
      (3L, ""), // token-free: no coordinates at all
      (4L, "delta epsilon zeta eta theta iota kappa lambda"))
    val got = TextVectors.hashedTfCoords(docs.toDF("doc_id", "text"), dim = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === refCoords(docs, 8))
    assert(!got.keys.exists(_._1 == 3L))
    // Repeated token accumulates in one bucket with consistent sign.
    val betaU = md5h("beta") >>> 1
    assert(math.abs(got((2L, betaU % 8))) === 3L)
  }

  test("identical docs map to identical vectors; dim bounds respected") {
    import spark.implicits._
    val docs = Seq((10L, "same words here"), (20L, "same words here"))
    val coords = TextVectors.hashedTfCoords(docs.toDF("doc_id", "text"), dim = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val v10 = coords.filter(_._1 == 10L).map(c => (c._2, c._3)).toSet
    val v20 = coords.filter(_._1 == 20L).map(c => (c._2, c._3)).toSet
    assert(v10 === v20 && v10.nonEmpty)
    assert(coords.forall(c => c._2 >= 0 && c._2 < 4))
  }
}
