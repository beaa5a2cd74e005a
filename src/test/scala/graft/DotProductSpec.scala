package graft

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** The native DotProduct expression must be BIT-identical to the
  * composed aggregate(zip_with(...)) form — the oracle hashes of
  * q15/q33/q48 depend on it — and must work in both codegen and
  * interpreted paths plus the SQL surface. */
class DotProductSpec extends SparkSpecBase {

  GraftFunctions.register(spark)

  private def composed = expr(
    "aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, x) -> acc + x)")

  test("bit-identical to the composed Catalyst form on real embeddings") {
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("a"))
    val pairs = e.select(col("vec_id"), col("a"), reverse(col("a")).as("b"))
    val rows = pairs
      .select(GraftFunctions.dotProduct(col("a"), col("b")).as("native"),
        composed.as("composed"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("null inputs yield null; empty arrays yield 0.0") {
    val df = spark.sql(
      """SELECT * FROM VALUES
        |  (array(1.0D, 2.0D), CAST(NULL AS ARRAY<DOUBLE>)),
        |  (CAST(array() AS ARRAY<DOUBLE>), CAST(array() AS ARRAY<DOUBLE>)),
        |  (array(3.0D), array(4.0D))
        |AS t(a, b)""".stripMargin)
      .select(GraftFunctions.dotProduct(col("a"), col("b")).as("d"))
      .collect()
    assert(df(0).isNullAt(0))
    assert(df(1).getDouble(0) == 0.0)
    assert(df(2).getDouble(0) == 12.0)
  }

  test("interpreted path (codegen off) agrees with codegen path") {
    val before = spark.conf.getOption("spark.sql.codegen.wholeStage")
    try {
      val q = () => Tables.embeddings(spark, sf).limit(50)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("a"))
        .select(col("vec_id"),
          GraftFunctions.dotProduct(col("a"), col("a")).as("d"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      val withCodegen = q()
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      val interpreted = q()
      assert(withCodegen == interpreted)
    } finally {
      before match {
        case Some(v) => spark.conf.set("spark.sql.codegen.wholeStage", v)
        case None => spark.conf.unset("spark.sql.codegen.wholeStage")
      }
    }
  }

  test("SQL surface via register() and via extensions injection") {
    GraftFunctions.register(spark)
    val r = spark.sql("SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D))")
      .collect().head.getDouble(0)
    assert(r == 11.0)
    // a FRESH session built with the extensions class (clearing the
    // active/default session so getOrCreate cannot just return the
    // base session — that reuse made an earlier form of this test
    // vacuous). The new session shares the JVM's SparkContext; it is
    // deliberately not stopped (that would stop the shared context).
    import org.apache.spark.sql.SparkSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // withExtensions is the programmatic twin of the
      // spark.sql.extensions STATIC conf (which only applies when the
      // SparkContext itself is launched with it — not available to a
      // test that reuses the JVM-shared context)
      val s2 = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new graft.functions.GraftExtensions)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      assert(s2 ne spark, "builder reused the base session; injection unproven")
      val r2 = s2.sql("SELECT graft_dot(array(1.0D), array(5.0D))")
        .collect().head.getDouble(0)
      assert(r2 == 5.0)
      // the DuckDB-dialect pack rides the same hook: list functions,
      // generators and the graft-native dot product resolve without
      // any register() call on this session
      val r3 = s2.sql(
        "SELECT list_extract(list_value(10L, 20L), 2), len('abc'), " +
          "list_dot_product(list_value(1.0D, 2.0D), list_value(3.0D, 4.0D))")
        .collect().head
      assert(r3.getLong(0) == 20L && r3.getLong(1) == 3L && r3.getDouble(2) == 11.0)
      val r4 = s2.sql("SELECT unnest(generate_series(1, 3))")
        .collect().map(_.getInt(0)).toSeq
      assert(r4 == Seq(1, 2, 3))
    } finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }
}
