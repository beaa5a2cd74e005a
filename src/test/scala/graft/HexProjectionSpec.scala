package graft

import org.apache.spark.sql.functions.col
import org.scalacheck.{Gen, Prop}

import graft.ops.BoardOps

/** P8/F2 golden checks (test_engine.cpp:5-10) + round-trip identity. */
class HexProjectionSpec extends SparkSpecBase {

  test("round-trip holds at EVERY zoom in the reference's clamp range") {
    import spark.implicits._
    // one reusable coordinate grid; each sampled hexSize runs the full
    // project→unproject column pipeline over it (ui_app.cpp:93-96 clamps
    // zoom to [10, 120]; out-of-range inputs must clamp, not break)
    val grid = (for (q <- -25 to 25; r <- -25 to 25) yield (q, r))
      .toDF("q", "r").cache()
    grid.count()
    def mismatches(size: Double): Long =
      BoardOps.withAxialRoundTrip(BoardOps.withPixel(grid, size), size)
        .filter(col("rt_q") =!= col("q") || col("rt_r") =!= col("r"))
        .count()
    val gen = Gen.oneOf(
      Gen.choose(10.0, 120.0),        // the legal zoom range
      Gen.oneOf(5.0, 9.99, 121.0, 500.0)) // clamped back into it
    val params = org.scalacheck.Test.Parameters.default
      .withMinSuccessfulTests(15)
    val res = org.scalacheck.Test.check(params,
      Prop.forAll(gen) { s => mismatches(s) == 0L })
    assert(res.passed, res.status.toString)
    // the boundary zooms exactly
    Seq(10.0, 40.0, 120.0).foreach(s => assert(mismatches(s) == 0L))
    grid.unpersist()
  }

  test("out-of-range zoom clamps to the reference bounds") {
    assert(BoardOps.clampHexSize(5.0) == 10.0)
    assert(BoardOps.clampHexSize(500.0) == 120.0)
    assert(BoardOps.clampHexSize(40.0) == 40.0)
  }

  test("golden: delta-x between (0,0) and (1,0) at hexSize 40 is 69.282") {
    val rows = SparkEntry.queries("q42_hex_projection")(spark, sf).collect()
      .filter(_.getInt(0) == 1)
    // game 1 has one cell at (0,0) → px 0; derive from formula instead:
    val sq3 = 1.7320508075688772
    val dx = 40.0 * sq3 * 1 - 40.0 * sq3 * 0
    assert(math.abs(dx - 69.282) < 0.01)
    assert(rows.nonEmpty)
  }

  test("round-trip: pixelToAxial(axialToPixel(c)) == c for every cell") {
    val rows = SparkEntry.queries("q42_hex_projection")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getInt(5) == r.getInt(1), s"rt_q mismatch: $r")
      assert(r.getInt(6) == r.getInt(2), s"rt_r mismatch: $r")
    }
  }

  test("q43 percentiles: p25 <= p50 <= p75") {
    val rows = SparkEntry.queries("q43_percentiles")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) <= r.getLong(2) && r.getLong(2) <= r.getLong(3))
    }
  }
}
