package graft

/** The sweep's dialect-gap list, extracted so the counts quoted in the
  * docs (SURVEY §2.9, README) are asserted against ONE source of truth
  * (DocCountsSpec) instead of being hand-synced each time the registry
  * grows — the round-10 docs drifted exactly that way. */
object OracleDialectGaps {

  /** Genuine dialect gaps — oracle text that CANNOT run on spark.sql
    * byte-identically. Every entry names the DuckDB-only construct; the
    * query's correctness is still oracle-hash-proven by the driver
    * (DuckDB runs this text, Spark runs the DSL, hashes match). */
  val gaps: Map[String, String] = {
    // Spark 4.1 recursive CTEs accept UNION ALL only
    // (UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE); the oracle computes
    // fixed-point reachability / transitive closure, whose termination
    // NEEDS UNION-distinct (UNION ALL re-expands cycles forever).
    val recursiveUnion = "recursive fixed point needs UNION-distinct; " +
      "Spark recursive CTEs are UNION ALL-only"
    // Every remaining exception is this ONE gap: the dup-cluster
    // label-propagation closures (q55/q99) are TRUE data-dependent
    // fixpoints (cluster diameter grows with the corpus — no depth cap
    // is sound), and the ant's slide-reachability BFS (q21, plus q52
    // which embeds its text) is fixture-bounded but its correlated-
    // EXISTS step predicate decorrelates into aggregates over the
    // recursive reference, which Spark rejects regardless of UNION
    // flavor (INVALID_RECURSIVE_REFERENCE.PLACE — verified round 10).
    // The connectivity BFS (q18/q18b/q19/q20/q22) left this list in
    // round 10: its depth is fixture-bounded (≤ 16 cells per game) and
    // its recursion is plain-join, so BoardOracleSql.connectivity
    // re-spells it as a depth-capped UNION ALL recursion that runs
    // verbatim on both engines. (Ordered string_agg (q23/q88/q103),
    // IGNORE NULLS (q36/q81) and hex casts (q91) were eliminated by
    // round-8 re-spellings.)
    Map(
      "q21_ant_reachability" -> recursiveUnion,
      "q52_legal_moves" -> (recursiveUnion + " (embeds q21's text)"),
      "q55_dup_clusters" -> recursiveUnion,
      "q99_cluster_split" -> (recursiveUnion + " (composes q55's closure)")
    )
  }

  /** Statements the sweep actually runs verbatim on spark.sql. */
  def sweptCount: Int = SparkEntry.oracleSql.size - gaps.size
}
