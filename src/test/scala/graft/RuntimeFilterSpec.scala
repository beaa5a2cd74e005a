package graft

import org.apache.spark.sql.functions._

/** Runtime Bloom-filter join pruning — the third scale lever next to
  * bucketing (kills the join shuffle) and partitioning (kills the
  * scan): for a SELECTIVE dim ⋈ huge fact shuffle join, Catalyst
  * builds a Bloom filter over the dim side's join keys and injects a
  * `might_contain` filter on the FACT side, so non-matching fact rows
  * are dropped before they pay the shuffle. At 100 TB this is the
  * difference between shuffling the whole fact table and shuffling
  * the ~selectivity fraction that can possibly join. The filter is a
  * candidate test only (false positives join away exactly), so the
  * result is unchanged — both asserted here. */
class RuntimeFilterSpec extends SparkSpecBase {

  test("selective dim join injects might_contain on the fact side; result unchanged") {
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevEnabled =
      spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled")
    try {
      // force the shuffle-join regime the optimization targets (tiny
      // test data would otherwise broadcast / skip injection)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10GB")
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      val dim = Tables.orders(spark, sf)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey")
      val fact = Tables.lineitem(spark, sf)
      val joined = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain") && plan.contains("bloom_filter_agg"),
        s"runtime bloom filter was not injected:\n$plan")
      val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      // exactness: the bloom filter only prunes candidates — false
      // positives are eliminated by the real join
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val expected = fact
        .join(dim, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expected && got.nonEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.enabled", prevEnabled)
      spark.conf.unset(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold")
      spark.conf.unset(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
    }
  }
}
