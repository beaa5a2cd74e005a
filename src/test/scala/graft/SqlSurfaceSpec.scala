package graft

import graft.ops.SqlSurface

/** The spark.sql TEXT surface must compute exactly what its DataFrame
  * twin computes: same schema (names + order), same rows. */
class SqlSurfaceSpec extends SparkSpecBase
    with org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper {

  private val twins = Seq(
    ("q92_sql_pricing", "q01_pricing_summary"),
    ("q93_sql_star_join", "q03_star_join"),
    ("q94_sql_window_rank", "q06_window_rank"),
    ("q95_sql_top_customers", "q02_top_customers"),
    ("q97_sql_knn", "q15_knn_bruteforce"),
    ("q98_sql_topk_agg", "q13_text_tokens"),
    ("q103_sql_stack_tops", "q23_stack_tops"),
    ("q104_sql_reserves", "q44_reserves"),
    ("q105_sql_ring_key", "q51_ring_key"),
    ("q106_sql_viewport", "q53_viewport"),
    ("q109_sql_rollup", "q05_rollup_cube"),
    ("q110_sql_cube", "q38_cube"),
    ("q111_sql_grouping_sets", "q70_grouping_sets"),
    ("q112_sql_set_ops", "q12_set_ops"),
    ("q113_sql_outer_join", "q40_outer_join"))

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

  test("q103 resolves in a FRESH session (the board path registers the dialect pack itself)") {
    // newSession has a builtin-only function registry: q103's arg_max
    // only resolves if registerBoardViews registers DuckDbCompat on
    // its own, not by riding an earlier registerViews call
    val s2 = spark.newSession()
    assert(SparkEntry.queries("q103_sql_stack_tops")(s2, sf).collect().nonEmpty)
  }

  test("registerViews exposes all 10 tables to SQL text") {
    SqlSurface.registerViews(spark, sf)
    Tables.names.foreach { n =>
      assert(spark.sql(s"SELECT * FROM $n LIMIT 1").collect().length == 1)
    }
  }

  test("q100: CTAS+INSERT audit equals the direct source aggregate, idempotently") {
    import org.apache.spark.sql.functions._
    val direct = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment", "o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(12,2)"))
          .cast("double").as("total_price"))
      .orderBy("c_mktsegment", "o_orderpriority")
      .collect().map(_.toSeq).toSeq
    // run twice: DROP TABLE IF EXISTS must make re-runs (bench
    // min-of-2) reproduce the identical persisted table
    val first = SparkEntry.queries("q100_ctas")(spark, sf)
      .collect().map(_.toSeq).toSeq
    val second = SparkEntry.queries("q100_ctas")(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(first == direct && second == direct)
    // and the table is a real catalog object with persisted files
    val tbl = spark.catalog.listTables("graft_wh").collect()
      .map(_.name).find(_.startsWith(s"seg_sales_$sfDirKey"))
    assert(tbl.nonEmpty, "warehouse table missing from catalog")
    assert(spark.table(s"graft_wh.${tbl.get}").count() ==
      Tables.orders(spark, sf).count())
  }

  test("q100: ALTER TABLE ADD COLUMNS evolves the catalog schema in place") {
    import org.apache.spark.sql.functions._
    SparkEntry.queries("q100_ctas")(spark, sf).collect()
    val tbl = spark.catalog.listTables("graft_wh").collect()
      .map(_.name).find(_.startsWith(s"seg_sales_$sfDirKey")).get
    // the remaining warehouse DDL verb: evolve the schema through the
    // catalog; existing rows surface NULL for the new column
    spark.sql(s"ALTER TABLE graft_wh.$tbl ADD COLUMNS (note STRING)")
    val evolved = spark.table(s"graft_wh.$tbl")
    assert(evolved.columns.contains("note"))
    assert(evolved.filter(col("note").isNotNull).count() == 0)
    // and the audit aggregate still computes over the evolved table
    assert(evolved.count() == Tables.orders(spark, sf).count())
  }

  // the table-name dir key for this spec's SF — the q100/q114 tests must
  // select THEIR dir's table even if the shared session ever creates
  // warehouse tables for another data dir
  private def sfDirKey: String = java.security.MessageDigest
    .getInstance("MD5").digest(sf.getBytes("UTF-8"))
    .map("%02x".format(_)).mkString.take(12)

  test("q114: the bucketed table's key aggregation plans with zero exchange") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val df = SparkEntry.queries("q114_ctas_bucketed")(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // The GROUP BY o_custkey must ride the bucketing: no hash shuffle
    // anywhere, only the final ORDER BY's range exchange. Under AQE,
    // materialized shuffles hide inside ShuffleQueryStageExec (a leaf),
    // so this MUST use AdaptiveSparkPlanHelper.collect — plain
    // SparkPlan.collect never sees them and the assertion goes vacuous.
    val sh = collect(df.queryExecution.executedPlan) {
      case s: ShuffleExchangeExec => s.outputPartitioning.toString
    }
    // non-vacuity: the ORDER BY's range exchange must be FOUND
    assert(sh.nonEmpty, "traversal found no exchange at all — the " +
      "ORDER BY range shuffle must be visible, or this pin is vacuous")
    assert(sh.forall(_.contains("rangepartitioning")),
      s"aggregation shuffled despite bucketing: $sh")
  }

  test("q100: a segment filter on the catalog table prunes partitions in the executed scan") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.execution.FileSourceScanExec
    SparkEntry.queries("q100_ctas")(spark, sf).collect()
    val tbl = spark.catalog.listTables("graft_wh").collect()
      .map(_.name).find(_.startsWith(s"seg_sales_$sfDirKey")).get
    // executed-scan numFiles is the post-pruning truth (inputFiles
    // reflects the pre-pruning FileIndex and proves nothing)
    def scannedFiles(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      df.queryExecution.executedPlan.collect {
        case s: FileSourceScanExec => s.metrics("numFiles").value
      }.sum
    }
    val full = scannedFiles(spark.table(s"graft_wh.$tbl"))
    val pruned = scannedFiles(spark.table(s"graft_wh.$tbl")
      .filter(col("c_mktsegment") === "BUILDING"))
    assert(pruned > 0, "filtered segment scanned no files")
    assert(pruned < full,
      s"segment filter did not prune: $pruned of $full files scanned")
    // the EXACT bound: a one-segment read touches precisely the files
    // of its own partition directory, nothing from any other segment
    val loc = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(tbl, Some("graft_wh")))
      .location
    val segDir = new java.io.File(
      new java.io.File(loc), "c_mktsegment=BUILDING")
    val segFiles = Option(segDir.listFiles()).getOrElse(Array.empty)
      .count(_.getName.endsWith(".parquet"))
    assert(segFiles > 0, s"no parquet files under $segDir - pin is vacuous")
    assert(pruned == segFiles,
      s"one-segment read scanned $pruned files, directory holds $segFiles")
  }
}
