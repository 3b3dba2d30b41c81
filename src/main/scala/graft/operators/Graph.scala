package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Iterative graph scoring — the authority-propagation step crawl curation
 * pipelines run to weight sources (PageRank over the domain/link graph;
 * the reference has no graph surface, SURVEY.md §2.4).
 *
 * All arithmetic is e12 fixed-point integer with `div` truncation, so every
 * iteration is bit-identical across engines and an unrolled CTE chain in
 * DuckDB can restate the whole computation value-for-value (the same
 * all-integer cross-engine convention as the BPE/bigram-LM oracles).
 */
object Graph {

  /** Total rank mass: 1.0 == 1e12 (room for `div outdeg` truncation to
   * stay visible only in the low digits at realistic degrees). */
  val E12: Long = 1000000000000L

  /**
   * PageRank by power iteration over a directed edge list (src, dst).
   *
   * Per iteration: every node sends `rank div outdeg` along each out-edge;
   * a node's next rank is `base + damp% of its received sum`, where
   * `base = (E12 * (100 - dampPct) div 100) div N`. Integer division
   * truncates (identically in both engines); rank mass lost to truncation
   * and to dangling nodes (no out-edges) is NOT redistributed — documented
   * leak, callers ranking by relative order are unaffected.
   *
   * Scale contract: each iteration is ONE hash join of the edge list
   * against the current rank table on src (both partitioned by the join
   * key — at scale, pre-bucket both by src and the exchange disappears)
   * plus one sum keyed by dst; nothing is broadcast, nothing collects.
   * `n` (node count) is the only driver scalar. Each round's rank table is
   * checkpointed and the previous one unpersisted — same lineage-truncation
   * discipline as [[graft.dedup.Dedup.connectedComponents]], without which
   * the plan doubles per iteration. Fixed `iters` (no convergence scan):
   * power iteration's geometric contraction makes 5-20 rounds the
   * production norm, and a fixed count keeps the oracle restatable.
   *
   * @param edges (src: long, dst: long) directed; parallel edges count as
   *              parallel (each carries its own `div outdeg` share)
   * @return (node, rank_e12) for every node appearing as src or dst
   */
  def pagerank(edges: DataFrame, iters: Int = 5, dampPct: Int = 85): DataFrame = {
    require(iters >= 0 && dampPct >= 0 && dampPct <= 100)
    val e = edges.select(col("src"), col("dst")).localCheckpoint(true)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint(true)
    val n = nodes.count() // bounded driver scalar: one long
    if (n == 0) return nodes.select(col("node"), lit(0L).as("rank_e12"))
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
      .localCheckpoint(true)
    val base = (E12 * (100 - dampPct) / 100) / n
    var rank = nodes.select(col("node"), lit(E12 / n).as("rank_e12"))
      .localCheckpoint(true)
    for (_ <- 1 to iters) {
      val received = e
        .join(rank.withColumnRenamed("node", "src"), "src")
        .join(outdeg, "src")
        .select(col("dst"), expr("rank_e12 div outdeg").as("share"))
        .groupBy("dst").agg(sum(col("share")).as("recv"))
      val next = nodes
        .join(received, col("node") === col("dst"), "left")
        .select(col("node"),
          (lit(base) + expr(s"($dampPct * coalesce(recv, 0L)) div 100"))
            .as("rank_e12"))
        .localCheckpoint(true)
      rank.unpersist()
      rank = next
    }
    e.unpersist(); nodes.unpersist(); outdeg.unpersist()
    rank
  }
}
