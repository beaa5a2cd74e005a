package graft

import org.apache.spark.sql.functions._

/** Bucketing = the co-located join layout: orders and lineitem written
  * bucketed on the order key must join with ZERO shuffle exchanges and
  * produce the same result as the plain join. */
class BucketedJoinSpec extends SparkSpecBase {

  test("bucketed orders ⋈ lineitem joins with no Exchange in the plan") {
    val tmp = java.nio.file.Files.createTempDirectory("bucketed").toString
    Tables.writeBucketedTable(Tables.orders(spark, sf),
      "orders_b", s"$tmp/orders_b", 4, Seq("o_orderkey"))
    Tables.writeBucketedTable(Tables.lineitem(spark, sf),
      "lineitem_b", s"$tmp/lineitem_b", 4, Seq("l_orderkey"))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a non-broadcast join so the shuffle question is real
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("orders_b")
        .join(spark.table("lineitem_b"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      // the post-join groupBy(o_orderstatus) legitimately re-keys; the
      // JOIN inputs themselves must come straight from the bucketed
      // scans with no re-partitioning on the order key
      assert(!plan.contains("Exchange hashpartitioning(o_orderkey") &&
        !plan.contains("Exchange hashpartitioning(l_orderkey"),
        s"bucketed join must not shuffle its inputs:\n$plan")
      assert(plan.contains("SelectedBucketsCount"),
        s"join inputs must be bucketed scans:\n$plan")
      // same result as the plain (shuffling) join
      val expected = Tables.orders(spark, sf)
        .join(Tables.lineitem(spark, sf),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
