package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Corpus-wide SQL-dialect sweep: EVERY oracle ANSI string in
  * `SparkEntry.oracleSql` (the exact bytes DuckDB executes for the
  * driver's correctness gate) is run verbatim through `spark.sql` over
  * the registered table views and must equal its DSL twin row-for-row.
  *
  * This turns "Spark SQL replaces the reference's query text surface"
  * from ~20 sampled proofs (q92–q114) into a corpus property: any
  * oracle statement a user of the reference runs today executes
  * unchanged on this engine, except the explicitly listed dialect
  * gaps below — each a DuckDB-ism with no byte-identical Spark
  * spelling, whose SEMANTICS are still proven by the driver's DuckDB
  * hash-match against the DSL twin.
  */
class OracleSweepSpec extends SparkSpecBase {

  /** Genuine dialect gaps — see [[OracleDialectGaps]] (shared with
    * DocCountsSpec so the doc-quoted sweep counts can't drift). */
  private val dialectGaps: Map[String, String] = OracleDialectGaps.gaps

  /** The driver's compare sorts columns by name before hashing; the
    * sweep aligns the same way, then demands exact value equality (both
    * sides already hash-equal DuckDB, so any drift here is a real
    * dialect/determinism gap, not float noise). */
  private def aligned(df: DataFrame): Seq[Seq[Any]] = {
    val cols = df.columns.sorted.toSeq
    df.select(cols.map(col): _*).collect().toSeq.map(r => r.toSeq.map(norm))
  }

  private def norm(v: Any): Any = v match {
    case null => null
    case d: java.math.BigDecimal => d.stripTrailingZeros
    case s: scala.collection.Seq[_] => s.toSeq.map(norm)
    case r: org.apache.spark.sql.Row => r.toSeq.map(norm)
    case m: scala.collection.Map[_, _] =>
      m.toSeq.map { case (k, x) => (norm(k), norm(x)) }
        .sortBy(_._1.toString)
    case other => other
  }

  private val sweep = SparkEntry.oracleSql.toSeq.sortBy(_._1)

  test("sweep covers the whole oracle corpus (no silently skipped names)") {
    val unknown = dialectGaps.keySet -- SparkEntry.oracleSql.keySet
    assert(unknown.isEmpty, s"exception list names unknown queries: $unknown")
    info(s"${sweep.size - dialectGaps.size} swept, " +
      s"${dialectGaps.size} excepted of ${sweep.size} oracle statements")
  }

  /** What Spark actually says for the one remaining gap class —
    * asserted, so the exception list is SELF-VERIFYING: if a Spark
    * upgrade adds UNION-distinct recursion, the excepted statement
    * stops failing and the test demands it be promoted into the sweep. */
  private val expectedGapError = "UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE"

  sweep.foreach { case (name, sql) =>
    dialectGaps.get(name) match {
      case Some(reason) =>
        test(s"$name is a REAL dialect gap [$reason]") {
          ops.SqlSurface.registerViews(spark, sf)
          val e = intercept[Exception](spark.sql(sql).collect())
          assert(e.getMessage.contains(expectedGapError),
            s"excepted statement failed differently than documented " +
              s"(expected $expectedGapError): ${e.getMessage.take(200)}\n" +
              "If it no longer fails at all, Spark closed this gap - " +
              "promote the query into the sweep.")
        }
      case None =>
        test(s"$name oracle text runs verbatim on spark.sql and equals its DSL twin") {
          // empty-vs-empty equality proves nothing, so a query whose
          // sf0.001 answer is zero rows re-runs at sf0.01 where the
          // row set is real — every sweep comparison compares VALUES
          def compareAt(dir: String): Int = {
            ops.SqlSurface.registerViews(spark, dir)
            val dsl = SparkEntry.queries(name)(spark, dir)
            val viaSql = spark.sql(sql)
            assert(viaSql.columns.sorted.toSeq == dsl.columns.sorted.toSeq,
              s"column sets differ: sql=${viaSql.columns.mkString(",")} " +
                s"dsl=${dsl.columns.mkString(",")}")
            val (s1, s2) = (aligned(viaSql), aligned(dsl))
            assert(s1.size == s2.size,
              s"row counts differ at $dir: sql=${s1.size} dsl=${s2.size}")
            s1.zip(s2).zipWithIndex.foreach { case ((a, b), i) =>
              assert(a == b, s"row $i differs at $dir:\n  sql=$a\n  dsl=$b")
            }
            s1.size
          }
          if (compareAt(sf) == 0) {
            info("0 rows at sf0.001 - re-proving at sf0.01")
            assert(compareAt("/root/testdata/sf0.01") > 0,
              "still 0 rows at sf0.01 - the equality never compared a value")
          }
        }
    }
  }
}
