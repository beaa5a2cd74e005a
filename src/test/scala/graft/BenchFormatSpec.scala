package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver captures only a ~2,000-char stdout tail; the bench JSON
  * line must stay under it for the CURRENT query registry (BENCH_r04
  * was truncated and unparseable). No SparkSession needed. */
class BenchFormatSpec extends AnyFunSuite {

  private val worstCase =
    SparkEntry.queries.keys.map(_ -> 999.99).toMap

  test("short-id stdout line stays under the capture tail with headroom") {
    val line = Bench.mkLine(worstCase, "/root/testdata/sf0.1",
      _.takeWhile(_ != '_'), Some((999.99, 999.99, 999.99, 999.99)))
    assert(line.length < 1900, s"bench line ${line.length} chars — " +
      "the driver's ~2,000-char stdout tail would truncate it")
  }

  test("short ids are unique (collisions would merge JSON keys)") {
    val ids = SparkEntry.queries.keys.map(_.takeWhile(_ != '_')).toSeq
    assert(ids.distinct.length == ids.length,
      ids.groupBy(identity).filter(_._2.length > 1).keys.mkString(","))
  }

  test("the line is valid JSON shaped per the driver contract") {
    val line = Bench.mkLine(Map("q01_x" -> 1.005, "q02_y" -> -1.0),
      "/sf", _.takeWhile(_ != '_'))
    // -1 (error marker) must be excluded from the total but COUNTED in
    // errors (a crash must never read as a faster bench); 1.005 rounds up
    assert(line ==
      """{"metric":"total","value":1.01,"unit":"sec","errors":1,"queries":{"q01":1.01,"q02":-1.00},"sf":"/sf"}""")
    // the calibration probes ride as four extra top-level fields:
    // single-threaded before/after plus the multi-core (mt) pair
    val withCal = Bench.mkLine(Map("q01_x" -> 1.0), "/sf",
      _.takeWhile(_ != '_'), Some((0.5, 0.625, 0.75, 1.0)))
    assert(withCal ==
      """{"metric":"total","value":1.00,"unit":"sec","errors":0,"calib_before":0.50,"calib_after":0.63,"calib_mt_before":0.75,"calib_mt_after":1.00,"queries":{"q01":1.00},"sf":"/sf"}""")
  }

  test("the calibration probe is fixed work, repeatable on a steady host") {
    val a = Bench.calibrate()
    val b = Bench.calibrate()
    // the probe reads ~1.2 s on this host at steady clock; the sane
    // band catches probe rot (a code change that shrinks or bloats the
    // fixed work would silently invalidate every cross-round
    // normalization) while tolerating host throttle up to ~4x
    assert(a > 0.5 && b > 0.5,
      s"probe under the sane band (0.5-5 s) - fixed work shrank? $a / $b")
    assert(a < 5.0 && b < 5.0,
      s"probe over the sane band (0.5-5 s) - fixed work grew, or the " +
        s"host is >4x throttled: $a / $b")
  }

  test("the multi-core probe runs the fixed workload on every core") {
    val mt = Bench.calibrateParallel()
    // on an idle healthy host this reads ≈ the single-threaded probe
    // (all cores in parallel); inside the test JVM it competes with
    // concurrently-running Spark suites, so only the rot floor is
    // tight — the ceiling merely catches a fixed-work explosion
    assert(mt > 0.5, s"mt probe under the rot floor (0.5 s): $mt - " +
      "fixed work shrank?")
    assert(mt < 60.0, s"mt probe at $mt s - fixed work grew?")
  }
}
