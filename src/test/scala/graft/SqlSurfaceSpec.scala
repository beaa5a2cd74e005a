package graft

import graft.ops.SqlSurface

/** The spark.sql TEXT surface must compute exactly what its DataFrame
  * twin computes: same schema (names + order), same rows. */
class SqlSurfaceSpec extends SparkSpecBase {

  private val twins = Seq(
    ("q92_sql_pricing", "q01_pricing_summary"),
    ("q93_sql_star_join", "q03_star_join"),
    ("q94_sql_window_rank", "q06_window_rank"),
    ("q95_sql_top_customers", "q02_top_customers"),
    ("q97_sql_knn", "q15_knn_bruteforce"),
    ("q98_sql_topk_agg", "q13_text_tokens"))

  twins.foreach { case (sqlName, dslName) =>
    test(s"$sqlName equals DSL twin $dslName row-for-row") {
      val sqlDf = SparkEntry.queries(sqlName)(spark, sf)
      val dslDf = SparkEntry.queries(dslName)(spark, sf)
      assert(sqlDf.columns.toSeq == dslDf.columns.toSeq)
      val got = sqlDf.collect().map(_.toSeq).toSeq
      val want = dslDf.collect().map(_.toSeq).toSeq
      assert(got == want)
    }
  }

  test("registerViews exposes all 10 tables to SQL text") {
    SqlSurface.registerViews(spark, sf)
    Tables.names.foreach { n =>
      assert(spark.sql(s"SELECT * FROM $n LIMIT 1").collect().length == 1)
    }
  }
}
