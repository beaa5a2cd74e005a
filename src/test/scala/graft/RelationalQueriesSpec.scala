package graft

import org.apache.spark.sql.Row

class RelationalQueriesSpec extends SparkSpecBase {

  test("q01 pricing summary: grouped totals are positive and ordered") {
    val rows = SparkEntry.queries("q01_pricing_summary")(spark, sf).collect()
    assert(rows.nonEmpty)
    // groups are (returnflag, linestatus) pairs — at most 3×2
    assert(rows.length <= 6)
    val keys = rows.map(r => (r.getString(0), r.getString(1)))
    assert(keys.sameElements(keys.sorted), "output must be ordered")
    rows.foreach { r =>
      assert(r.getDouble(2) > 0)          // sum_qty
      assert(r.getLong(r.length - 1) > 0) // count_order
    }
    // counts add up to the filtered row count
    val li = Tables.lineitem(spark, sf)
      .filter(org.apache.spark.sql.functions.col("l_shipdate") <=
        org.apache.spark.sql.functions.lit("1998-09-02").cast("timestamp"))
    assert(rows.map(_.getLong(rows.head.length - 1)).sum == li.count())
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
