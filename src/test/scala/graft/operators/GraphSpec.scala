package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class GraphSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-graph-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Plain-Scala reference: the same e12 integer power iteration. */
  private def refPagerank(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.size
    val outdeg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val base = (Graph.E12 * 15 / 100) / n
    var rank = nodes.map(_ -> Graph.E12 / n).toMap
    for (_ <- 1 to iters) {
      val recv = edges.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (s, _) => rank(s) / outdeg(s) }.sum
      }
      rank = nodes.map(v => v -> (base + 85L * recv.getOrElse(v, 0L) / 100L)).toMap
    }
    rank
  }

  test("pagerank matches the plain-Scala integer power iteration, dangling node included") {
    import spark.implicits._
    // 1→2, 1→3, 2→3, 3→1 plus a dangling sink 4 (2→4): 4 sends nothing.
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L), (2L, 4L))
    val got = Graph.pagerank(edges.toDF("src", "dst"), iters = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === refPagerank(edges, 5))
    // The dangling sink keeps only what it receives (one third of 2's
    // rank) — strictly the poorest node.
    assert(got.filterNot(_._1 == 4L).values.forall(_ > got(4L)))
  }

  test("pagerank on an empty edge list returns no rows") {
    import spark.implicits._
    assert(Graph.pagerank(Seq.empty[(Long, Long)].toDF("src", "dst")).collect().isEmpty)
  }

  test("more iterations converge toward the stationary ranking") {
    import spark.implicits._
    // Star: every leaf points at the hub, hub points back to leaf 2 only.
    val edges = Seq((2L, 1L), (3L, 1L), (4L, 1L), (5L, 1L), (1L, 2L))
    val r = Graph.pagerank(edges.toDF("src", "dst"), iters = 10)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r === refPagerank(edges, 10))
    assert(r(2L) > r(3L))           // the hub's sole target beats plain leaves
    assert(r(3L) === r(4L) && r(4L) === r(5L)) // symmetric leaves tie exactly
  }
}
