package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only: dump formatted physical plans for plan-quality review
  * (pushed filters, read schemas, broadcast vs sort-merge, codegen).
  *
  * `runMain graft.Plans <name[,name...]> [sfDir]` — formatted plan per query.
  * `runMain graft.Plans bucketed [sfDir]` — the warehouse-layout diff:
  * the same orders ⋈ lineitem aggregation from plain parquet (two
  * input-side shuffles on the join key) vs from tables bucketed on the
  * order key (zero input-side shuffles, `SelectedBucketsCount` in the
  * scans). At 100 TB that bucketing decision is made once at write
  * time and every downstream equi-join/agg on the key rides it.
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (args.headOption.contains("bucketed")) {
      bucketedDemo(spark, dir)
      spark.stop()
      return
    }
    val names = if (args.nonEmpty) args(0).split(",").toSeq
      else Seq("q01_pricing_summary", "q03_star_join")
    names.foreach { n =>
      println(s"===== $n =====")
      println(SparkEntry.queries(n)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }

  private def bucketedDemo(spark: SparkSession, dir: String): Unit = {
    // force sort-merge so the shuffle question is real, as in
    // BucketedJoinSpec
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    def shape(o: DataFrame, l: DataFrame): DataFrame =
      o.join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
    def report(label: String, df: DataFrame): Unit = {
      df.collect() // run it so AQE finalizes the executed plan
      val plan = df.queryExecution.executedPlan.toString
      val inputShuffles = Seq("o_orderkey", "l_orderkey")
        .count(k => plan.contains(s"Exchange hashpartitioning($k"))
      val total = "Exchange hashpartitioning".r.findAllIn(plan).size
      println(s"===== $label =====")
      println(s"input-side Exchanges on the join key: $inputShuffles" +
        s"   total hash Exchanges: $total" +
        s"   bucketed scans: ${plan.contains("SelectedBucketsCount")}")
      println(plan)
    }
    val tmp = java.nio.file.Files.createTempDirectory("bucketed").toString
    Tables.writeBucketedTable(Tables.orders(spark, dir),
      "orders_b", s"$tmp/orders_b", 8, Seq("o_orderkey"))
    Tables.writeBucketedTable(Tables.lineitem(spark, dir),
      "lineitem_b", s"$tmp/lineitem_b", 8, Seq("l_orderkey"))
    try {
      report("orders ⋈ lineitem from plain parquet",
        shape(Tables.orders(spark, dir), Tables.lineitem(spark, dir)))
      report("orders ⋈ lineitem from bucketed tables",
        shape(spark.table("orders_b"), spark.table("lineitem_b")))
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
