package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Guards the harness contract itself: `SparkEntry.queries` is built with
 * `Map ++`, so a name accidentally defined in BOTH CoreQueries and
 * PipelineQueries would silently drop one implementation; a query without
 * an oracle silently downgrades to the driver's weaker rows-only check;
 * an oracle without a query is dead SQL. All three are typo classes that
 * produce no compile error and no test failure anywhere else. */
class HarnessConsistencySpec extends AnyFunSuite {

  test("query names are unique across the two harness maps") {
    val dup = CoreQueries.queries.keySet intersect PipelineQueries.queries.keySet
    assert(dup.isEmpty, s"duplicate query names (one map silently wins): $dup")
    val dupO = CoreQueries.oracles.keySet intersect PipelineQueries.oracles.keySet
    assert(dupO.isEmpty, s"duplicate oracle names: $dupO")
  }

  test("every query has an oracle and every oracle has a query") {
    val q = graft.SparkEntry.queries.keySet
    val o = graft.SparkEntry.oracleSql.keySet
    assert((q diff o).isEmpty,
      s"queries without oracles (rows-only check only): ${(q diff o).toSeq.sorted}")
    assert((o diff q).isEmpty,
      s"oracles without queries (dead SQL): ${(o diff q).toSeq.sorted}")
  }

  test("oracle SQL references only the fixture tables") {
    val tables = Set("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    // Cheap lexical sanity: every FROM/JOIN <bare identifier> must be a
    // fixture table or a CTE defined in the same statement.
    // Lookbehind excludes the FROM of `IS [NOT] DISTINCT FROM`.
    val ident = "(?i)\\b(?<!DISTINCT\\s)(?:FROM|JOIN)\\s+([a-z_][a-z0-9_]*)\\b(?!\\.)".r
    // CTE names, optionally with a `name(col, ...)` column list.
    val cte = ("(?i)(?:WITH(?:\\s+RECURSIVE)?\\s+|,\\s*)([a-z_][a-z0-9_]*)" +
      "\\s*(?:\\([^)]*\\))?\\s+AS\\s+(?:MATERIALIZED\\s*)?\\(").r
    for ((name, sql) <- graft.SparkEntry.oracleSql) {
      val defined = cte.findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
      val used = ident.findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
      val unknown = used -- tables -- defined - "lateral"
      assert(unknown.isEmpty, s"$name references unknown relations: $unknown")
    }
  }
}
