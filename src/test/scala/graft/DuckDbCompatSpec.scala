package graft

import graft.functions.DuckDbCompat

/** Pins the DuckDB-dialect pack's edge semantics to DuckDB's actual
  * behavior (probed on the oracle engine), so a compat builder can't
  * silently drift from the engine the corpus is hash-checked against. */
class DuckDbCompatSpec extends SparkSpecBase {

  private def run(sql: String) = {
    DuckDbCompat.register(spark)
    spark.sql(sql)
  }
  private def one(sql: String) = run(sql).collect().head

  test("generate_series is empty when stop lies behind the start (DuckDB), not descending (Spark sequence)") {
    assert(one("SELECT generate_series(1, 0)").getSeq[Int](0).isEmpty)
    assert(one("SELECT generate_series(3, 7, -2)").getSeq[Int](0).isEmpty)
    // explicit negative step DOES descend, exactly like DuckDB
    assert(one("SELECT generate_series(5, 1, -1)").getSeq[Int](0)
      == Seq(5, 4, 3, 2, 1))
    assert(one("SELECT generate_series(1, 3)").getSeq[Int](0) == Seq(1, 2, 3))
  }

  test("list_sum skips NULL elements and is NULL (not 0) with no non-NULL element") {
    val r = one("SELECT list_sum(CAST(array() AS ARRAY<BIGINT>)), " +
      "list_sum(array(CAST(NULL AS BIGINT))), " +
      "list_sum(array(1L, CAST(NULL AS BIGINT), 2L))")
    assert(r.isNullAt(0) && r.isNullAt(1) && r.getLong(2) == 3L)
  }

  test("regexp_replace accepts DuckDB's 'g' flag and REJECTS unsupported options") {
    assert(one("SELECT regexp_replace('aaa', 'a', 'b', 'g')").getString(0) == "bbb")
    val e = intercept[Exception] {
      run("SELECT regexp_replace('aaa', 'a', 'b', 'gi')").collect()
    }
    assert(e.getMessage.contains("no Spark equivalent"),
      s"unsupported options must fail fast, got: ${e.getMessage.take(100)}")
  }

  test("regexp_extract_all 2-arg extracts the full match (DuckDB group-0 default)") {
    assert(one("SELECT regexp_extract_all('a1-b2', '[a-z][0-9]')")
      .getSeq[String](0) == Seq("a1", "b2"))
  }

  test("list_sort orders ASC with NULLS LAST (DuckDB default)") {
    assert(one("SELECT list_sort(array('b', CAST(NULL AS STRING), 'a'))")
      .getSeq[String](0) == Seq("a", "b", null))
  }

  test("len is polymorphic over strings (chars) and lists, returning BIGINT") {
    val r = one("SELECT len('héllo'), len(array('a', 'b'))")
    assert(r.getLong(0) == 5L && r.getLong(1) == 2L)
  }

  test("list_slice is 1-based with INCLUSIVE end; list_extract is 1-based and takes a BIGINT ordinal") {
    val r = one("SELECT list_slice(array('a','b','c','d'), 2, 3), " +
      "list_extract(array('x','y'), CAST(2 AS BIGINT))")
    assert(r.getSeq[String](0) == Seq("b", "c") && r.getString(1) == "y")
  }

  test("list_extract: NULL at index 0 and out-of-bounds, from-the-end for negatives (DuckDB)") {
    val r = one("SELECT list_extract(array('x','y'), 5), " +
      "list_extract(array('x','y'), 0), list_extract(array('x','y'), -1)")
    assert(r.isNullAt(0) && r.isNullAt(1) && r.getString(2) == "y")
  }

  test("divide: NULL on zero divisor (DuckDB), not an ANSI error") {
    assert(one("SELECT divide(1, 0)").isNullAt(0))
  }

  test("divide is exact integer division past 2^53 (no double rounding)") {
    // 2^60 / 3: FLOOR(a/b) through double would be off by rounding
    val r = one("SELECT divide(1152921504606846976, 3)")
    assert(r.getLong(0) == 384307168202282325L)
  }

  test("epoch/epoch_us/epoch_ms round-trip the event-time grid") {
    val r = one("SELECT epoch(TIMESTAMP'2020-01-01 00:00:00.5'), " +
      "epoch_us(TIMESTAMP'2020-01-01 00:00:00.5'), " +
      "epoch_ms(1577836800500)")
    assert(r.getDouble(0) == 1.5778368005e9)
    assert(r.getLong(1) == 1577836800500000L)
    assert(r.getTimestamp(2).toInstant.toEpochMilli == 1577836800500L)
  }
}
