package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver captures only a ~2,000-char stdout tail; the bench JSON
  * line must stay under it for the CURRENT query registry (BENCH_r04
  * was truncated and unparseable). No SparkSession needed. */
class BenchFormatSpec extends AnyFunSuite {

  // the REACHABLE worst width: every query in the 4-char sub-1 s
  // rendering class — 130 of the current registry's real durations
  // already sit there, so the uniform shape is the honest bound (the
  // old uniform-99.99 stress rendered 3-char "100"s and under-modeled
  // the real line by ~160 chars: the r18 baseline's real stdout line
  // measured 2,062 chars and the capture tail ate its front)
  private val worstCase =
    SparkEntry.queries.keys.map(_ -> 0.99).toMap

  private def worstLine = Bench.mkLine(worstCase, "sf0.001",
    Bench.shortId,
    Some(Bench.Probes(999.99, 999.99, 999.99, 999.99, 999.99, 999.99)),
    Some(Bench.Retry(
      worstCase.toSeq.take(Bench.RetryWorstN).toMap,
      999.99, 999.99, 999.99,
      Seq.fill(Bench.SettleAttempts)(999.99), retryHot = true)),
    compact = true)

  test("short-id stdout line: cal..verdict suffix survives the capture tail") {
    // worst case includes a TRIPPED verdict: the retry fields ride on
    // the same line and must fit the tail too. The key function, the
    // compact flag, and the sf BASENAME are the ones main() actually
    // prints with — a spec-only shortener would leave the real line
    // unpinned. The driver keeps EXACTLY 2,000 tail chars and sbt's
    // epilogue consumes ~75, so ~1,925 carry the line's END: at 166
    // registry queries the full line no longer always fits (the
    // queries map alone is ~1,730 chars at the sub-1 s class), so the
    // pinned invariant is that everything from the compact "cal"
    // probes onward — calib evidence, queries map, sf, verdict block —
    // fits the tail with margin; an overflow can only cost the
    // constant "metric"/"unit" prefix, which the on-disk line keeps.
    val line = worstLine
    val calAt = line.indexOf(""","cal":[""")
    assert(calAt >= 0, line.take(120))
    assert(line.length - calAt < 1915,
      s"bench line suffix ${line.length - calAt} chars from cal — " +
        "the driver's 2,000-char stdout tail would truncate evidence")
    assert(line.length < 1950, s"bench line ${line.length} chars — " +
      "overflow would eat past the metric/unit prefix into the cal block")
    // a TYPICAL line (real sub-10 s durations, small probe readings)
    // must fit the tail WHOLE — the r18 compaction exists so the
    // driver's parse can see a complete JSON line again
    // the r18 baseline's real mix: ~130 sub-1 s queries (4-char class)
    // and ~36 in [1, 10) (3-char class under compact rendering)
    val typical = Bench.mkLine(
      SparkEntry.queries.keys.zipWithIndex
        .map { case (n, i) => n -> (if (i % 4 == 3) 1.5 else 0.42) }
        .toMap, "sf0.1",
      Bench.shortId,
      Some(Bench.Probes(1.15, 1.15, 2.28, 7.40, 0.11, 0.12)),
      Some(Bench.Retry(
        worstCase.toSeq.take(Bench.RetryWorstN).map(kv => kv._1 -> 1.0).toMap,
        1.94, 8.38, 0.10,
        Seq.fill(Bench.SettleAttempts)(2.43), retryHot = true)),
      compact = true)
    assert(typical.length < 1920,
      s"typical bench line ${typical.length} chars — must fit the " +
        "~1,925 usable tail chars whole")
  }

  test("compact stdout probes render as cal arrays at wide precision") {
    // st_before, st_after, mt_before, mt_after, io_before, io_after —
    // same readings as the named on-disk fields, 2-decimal (wide)
    // precision (the judge's cross-round calib normalization compares
    // 1.40 vs 1.38), ~150 fewer chars of field names
    val line = Bench.mkLine(Map("q01_x" -> 1.0), "/sf",
      _.takeWhile(_ != '_'),
      Some(Bench.Probes(0.5, 0.625, 0.75, 1.0, 0.25, 0.5)),
      Some(Bench.Retry(Map.empty, 0.5, 0.75, 0.3)), compact = true)
    assert(line.contains(""""cal":[0.50,0.63,0.75,1.00,0.25,0.50]"""), line)
    assert(line.contains(""""cal_r":[0.50,0.75,0.30]"""), line)
    // io unmeasured (spec fixtures): the arrays shrink, like the named
    // fields' omission
    val noIo = Bench.mkLine(Map("q01_x" -> 1.0), "/sf",
      _.takeWhile(_ != '_'), Some(Bench.Probes(0.5, 0.5, 0.75, 0.75)),
      Some(Bench.Retry(Map.empty, 0.5, 0.75, -1.0)), compact = true)
    assert(noIo.contains(""""cal":[0.50,0.50,0.75,0.75]"""), noIo)
    assert(noIo.contains(""""cal_r":[0.50,0.75]"""), noIo)
    // compact queries-map classes: [1, 10) narrows to 0.1 s (3-9 %
    // relative, one char), sub-1 s keeps 0.01 s, class-boundary
    // rounding lands at the destination class's scale
    val cls = Bench.mkLine(
      Map("q01_a" -> 0.996, "q02_b" -> 3.83, "q03_c" -> 0.25), "/sf",
      _.takeWhile(_ != '_'), compact = true)
    assert(cls.contains(""""q01":1.0,"""), cls)
    assert(cls.contains(""""q02":3.8,"""), cls)
    assert(cls.contains(""""q03":0.25"""), cls)
  }

  test("the verdict block rides the last 200 chars of the stdout line") {
    // the driver keeps only a stdout TAIL, and the r17 artifact lost
    // "value" off the FRONT: every verdict-critical field must sit at
    // the END of the line, whatever the registry size — pinned on the
    // same worst-case shape as the width test
    val line = worstLine
    val tail = line.takeRight(200)
    Seq("\"value\":", "\"raw_total\":", "\"retried\":", "\"contended\":",
      "\"errors\":", "\"retry_hot\":").foreach(f =>
      assert(tail.contains(f), s"$f not in the last 200 chars: …$tail"))
    // and on an untripped, uncalibrated line the always-on trio still
    // closes the line (absence of the optional fields must not pull
    // the headline forward)
    val bare = Bench.mkLine(Map("q01_x" -> 1.0), "/sf", identity)
    assert(bare.endsWith(
      s""""raw_total":1.00,"retried":0,"errors":0,"value":1.00}"""), bare)
  }

  test("short ids are unique (collisions would merge JSON keys)") {
    val ids = SparkEntry.queries.keys.map(Bench.shortId).toSeq
    assert(ids.distinct.length == ids.length,
      ids.groupBy(identity).filter(_._2.length > 1).keys.mkString(","))
  }

  test("the line is valid JSON shaped per the driver contract") {
    val line = Bench.mkLine(Map("q01_x" -> 1.005, "q02_y" -> -1.0),
      "/sf", _.takeWhile(_ != '_'))
    // -1 (error marker) must be excluded from the total but COUNTED in
    // errors (a crash must never read as a faster bench); 1.005 rounds
    // up. The verdict block closes the line (truncation-proofing) and
    // raw_total/retried always render, 0-retry runs included.
    assert(line ==
      """{"metric":"total","unit":"sec","queries":{"q01":1.01,"q02":-1.00},"sf":"/sf","raw_total":1.01,"retried":0,"errors":1,"value":1.01}""")
    // the calibration probes ride as four extra mid-line fields (the
    // single-threaded before/after pair and the multi-core pair); the
    // contention VERDICT derived from them rides the tail block
    val withCal = Bench.mkLine(Map("q01_x" -> 1.0), "/sf",
      _.takeWhile(_ != '_'), Some(Bench.Probes(0.5, 0.625, 0.75, 1.0)))
    assert(withCal ==
      """{"metric":"total","unit":"sec","calib_before":0.50,"calib_after":0.63,"calib_mt_before":0.75,"calib_mt_after":1.00,"queries":{"q01":1.00},"sf":"/sf","raw_total":1.00,"retried":0,"contended":false,"errors":0,"value":1.00}""")
  }

  test("io probe readings and per-rep durations render; reps ride the on-disk line only when passed") {
    // the io calib pair rides the line when measured (>= 0)...
    val withIo = Bench.mkLine(Map("q01_x" -> 1.0), "/sf",
      _.takeWhile(_ != '_'),
      Some(Bench.Probes(0.5, 0.5, 0.75, 0.75, 0.25, 0.5)),
      Some(Bench.Retry(Map.empty, 0.5, 0.75, 0.3)))
    assert(withIo.contains(
      """"calib_io_before":0.25,"calib_io_after":0.50"""), withIo)
    assert(withIo.contains(""""calib_io_retry":0.30"""), withIo)
    // ...and is omitted for fixtures that never measured it, keeping
    // the pre-r16 line shape byte-identical
    val noIo = Bench.mkLine(Map("q01_x" -> 1.0), "/sf",
      _.takeWhile(_ != '_'), Some(Bench.Probes(0.5, 0.5, 0.75, 0.75)))
    assert(!noIo.contains("calib_io"), noIo)
    // per-rep durations: the evidence behind each min, on-disk only
    val withReps = Bench.mkLine(Map("q01_x" -> 1.0), "/sf",
      _.takeWhile(_ != '_'), None, None,
      Some(Map("q01_x" -> Seq(17.9, 2.5))))
    assert(withReps.contains(""""reps":{"q01":[17.9,2.50]}"""), withReps)
    assert(!Bench.mkLine(Map("q01_x" -> 1.0), "/sf",
      _.takeWhile(_ != '_')).contains("reps"))
  }

  test("the io ramp trips the contended verdict in either direction; the cpu-only shape is unchanged") {
    val quiet = Bench.Probes(1.2, 1.2, 1.8, 1.8, 0.2, 0.3)
    assert(!quiet.contended)
    // degraded at the END (contention arrived mid-run, r15's mode)
    assert(Bench.Probes(1.2, 1.2, 1.8, 1.8, 0.2, 1.0).contended)
    // degraded at the START (recovered mid-run: equally suspect)
    assert(Bench.Probes(1.2, 1.2, 1.8, 1.8, 1.0, 0.2).contended)
    // unmeasured io (spec fixtures, pre-r16 shape) contributes nothing
    assert(!Bench.Probes(1.2, 1.2, 1.8, 1.8).contended)
  }

  test("the io probe is fixed work, repeatable, and cleans up its scratch") {
    val a = Bench.calibrateIo()
    val b = Bench.calibrateIo()
    // 192 MiB written + read through the page cache. The fixed work
    // itself is proven by the probe's own require(seen == ...) — the
    // floor here only catches a GROSS shrink, and must not gate CI on
    // host speed: a tmpfs java.io.tmpdir or a hot NVMe page cache can
    // legitimately finish near 1 ms (the previous 10 ms floor flaked
    // exactly there)
    assert(a > 0.001 && b > 0.001,
      s"io probe under the rot floor (1 ms): $a / $b - fixed work shrank?")
    assert(a < 60.0 && b < 60.0, s"io probe over 60 s: $a / $b")
  }

  test("duration rendering never exceeds its width class at rounding boundaries") {
    // a value that ROUNDS across a class boundary must render at the
    // destination class's scale: 9.999 -> "10.0" (not the 5-char
    // "10.00"), 99.99 -> "100" (not "100.0") — otherwise the
    // worst-case width pin under-budgets the real line
    val line = Bench.mkLine(
      Map("q01_x" -> 9.999, "q02_y" -> 99.99, "q03_z" -> 999.99), "/sf",
      _.takeWhile(_ != '_'))
    assert(line.contains(""""q01":10.0,"""), line)
    assert(line.contains(""""q02":100,"""), line)
    assert(line.contains(""""q03":1000}"""), line)
    assert(!line.contains("10.00") && !line.contains("100.0"), line)
  }

  test("a tripped verdict reports merged-min durations plus the raw total") {
    // q01 retried faster (4.0 → 1.0: the host recovered), q02 retried
    // slower (still-degraded retry must not REPLACE a better original),
    // q03 not retried; headline = merged total, raw_total = original
    val line = Bench.mkLine(
      Map("q01_x" -> 4.0, "q02_y" -> 2.0, "q03_z" -> 0.5), "/sf",
      _.takeWhile(_ != '_'),
      Some(Bench.Probes(1.0, 1.0, 2.0, 40.0)),
      Some(Bench.Retry(Map("q01_x" -> 1.0, "q02_y" -> 3.0), 1.1, 1.9,
        settleProbes = Seq(1.8, 0.9))))
    // settle_probes (raw gate evidence) rides the ON-DISK copy only;
    // the stdout line carries its retry_hot distillation in the tail
    assert(line ==
      """{"metric":"total","unit":"sec","calib_before":1.00,"calib_after":1.00,"calib_mt_before":2.00,"calib_mt_after":40.0,"calib_retry":1.10,"calib_mt_retry":1.90,"queries":{"q01":1.00,"q02":2.00,"q03":0.50},"sf":"/sf","raw_total":6.50,"retried":2,"retry_hot":false,"contended":true,"errors":0,"value":3.50}""")
  }

  test("the settle gate clears on the first cool probe, re-settles while hot, and reports honestly when the host never clears") {
    // probe script: the host reads hot twice, then cool — the gate
    // sleeps before EVERY probe and stops at the first cool reading
    var sleeps = 0
    def gate(script: Double*): (Seq[Double], Boolean) = {
      val it = script.iterator
      Bench.settleForRetry(1.0, () => sleeps += 1, () => it.next())
    }
    sleeps = 0
    assert(gate(0.9) == ((Seq(0.9), false)) && sleeps == 1)
    sleeps = 0
    assert(gate(2.0, 1.6, 1.2) == ((Seq(2.0, 1.6, 1.2), false)) &&
      sleeps == 3)
    // the boundary reading (exactly WindowRatio x median) is HOT —
    // same closed band as the segment trip
    sleeps = 0
    assert(gate(1.5, 1.49) == ((Seq(1.5, 1.49), false)) && sleeps == 2)
    // never clears: attempts are bounded and the flag is honest
    sleeps = 0
    assert(gate(2.0, 2.0, 2.0, 2.0) == ((Seq(2.0, 2.0, 2.0), true)) &&
      sleeps == Bench.SettleAttempts)
    // no usable median (spec fixtures): one settle, reported cold —
    // there is no baseline to hold the pass against
    val it = Iterator(9.9)
    assert(Bench.settleForRetry(0.0, () => (), () => it.next()) ==
      ((Seq(9.9), false)))
    // the shipped flag ORs in a window-median-independent arm: a
    // retry-time bracket probe >= 1.5x the run's BETTER bracket
    // reading is heat even when the gate cleared (an elevated median
    // is the gate's documented blind spot)
    assert(!Bench.retryHotVerdict(gateHot = false, 1.68, 2.12, 1.91))
    assert(Bench.retryHotVerdict(gateHot = false, 2.9, 2.12, 1.91))
    assert(Bench.retryHotVerdict(gateHot = true, 1.0, 2.12, 1.91))
  }

  test("suspect flags: both reps over the prior-run ratio flag, anything less does not") {
    val prev = Map("q01_x" -> 1.0, "q02_y" -> 1.0, "q03_z" -> 1.0,
      "q05_err" -> -1.0)
    val reps = Map(
      "q01_x" -> ((2.6, 3.0)), // both reps >= 2.5x prev: flagged
      "q02_y" -> ((2.6, 1.0)), // one hot rep: min-of-2 already absorbs it
      "q03_z" -> ((-1.0, 9.9)), // errored rep: crash evidence, not heat
      "q04_new" -> ((9.9, 9.9)), // no prior record: no baseline
      "q05_err" -> ((9.9, 9.9))) // prior run errored: no baseline
    assert(Bench.suspects(reps, prev) == Seq("q01_x"))
    // no prior file -> no flags, whatever the readings
    assert(Bench.suspects(reps, Map.empty).isEmpty)
    // flagged names ride the on-disk line; absent otherwise
    val disk = Bench.mkLine(Map("q01_x" -> 1.0), "/sf", identity,
      suspect = Some(Seq("q01_x")))
    assert(disk.contains(""""suspect":["q01_x"]"""), disk)
    assert(!Bench.mkLine(Map("q01_x" -> 1.0), "/sf", identity,
      suspect = Some(Nil)).contains("suspect"))
  }

  test("a driver artifact's escaped, front-truncated tail yields short-id baselines that normalize to registry names") {
    // the committed BENCH_r<N>.json wraps the stdout line as a JSON
    // string field: quotes escaped, FRONT truncated mid-entry, keys in
    // short-id form — the parse must survive all three and the
    // normalizer must resolve ids against the live registry
    val wrapper =
      """{"n": 17, "tail": "4\",\"queries\":{\"129\":8.68,\"01\":0.25,\"11b\":0.13},\"sf\":\"sf0.1\"}\n"}"""
    val parsed = Bench.parseQueriesMap(wrapper)
    assert(parsed == Map("129" -> 8.68, "01" -> 0.25, "11b" -> 0.13), parsed)
    val registry = Seq("q129_minhash_probe", "q01_pricing_summary",
      "q11b_approx_distinct")
    assert(Bench.normalizePrevKeys(parsed, registry) == Map(
      "q129_minhash_probe" -> 8.68, "q01_pricing_summary" -> 0.25,
      "q11b_approx_distinct" -> 0.13))
    // full names pass through; keys of retired queries drop
    assert(Bench.normalizePrevKeys(
      Map("q01_pricing_summary" -> 1.0, "999" -> 2.0), registry) ==
      Map("q01_pricing_summary" -> 1.0))
    // truncation that ate the "queries":{ marker itself: the bare-pair
    // fallback recovers the surviving entries, and normalization drops
    // the non-registry fields it sweeps up
    val headless =
      """68,"01":0.25,"11b":0.13},"sf":"sf0.1","errors":0,"value":103}"""
    assert(Bench.normalizePrevKeys(Bench.parseQueriesMap(headless),
      registry) == Map("q01_pricing_summary" -> 0.25,
      "q11b_approx_distinct" -> 0.13))
    // and the REAL committed artifact (when present — tests run from
    // the repo root) yields a usable baseline set for the live
    // registry, end to end
    val real = new java.io.File("BENCH_r17.json")
    if (real.exists()) {
      val base = Bench.normalizePrevKeys(
        Bench.parseQueriesMap(
          new String(java.nio.file.Files.readAllBytes(real.toPath),
            "UTF-8")),
        SparkEntry.queries.keys)
      assert(base.size > 100 &&
        base.keySet.subsetOf(SparkEntry.queries.keySet),
        s"committed artifact yielded ${base.size} baselines")
    }
  }

  test("the prior-run queries map parses back out of our own on-disk line") {
    // round-trip: an on-disk-shaped line (with reps/retry_reps maps
    // that a naive brace match could grab instead) yields exactly the
    // queries durations
    val line = Bench.mkLine(Map("q01_x" -> 1.25, "q02_y" -> -1.0), "/sf",
      identity, Some(Bench.Probes(0.5, 0.5, 0.75, 0.75)),
      Some(Bench.Retry(Map("q01_x" -> 0.8), 0.5, 0.75)),
      Some(Map("q01_x" -> Seq(1.3, 1.25), "q02_y" -> Seq(-1.0, -1.0))))
    assert(Bench.parseQueriesMap(line) ==
      Map("q01_x" -> 0.8, "q02_y" -> -1.0))
    assert(Bench.parseQueriesMap("not json").isEmpty)
  }

  test("the contended verdict trips on the observed contamination shapes and not on healthy readings") {
    // round-11/judge healthy readings: mt/st ~1.5-1.9, flat ramp
    assert(!Bench.Probes(1.16, 1.29, 1.92, 1.87).contended)
    assert(!Bench.Probes(1.2, 1.4, 1.3, 1.5).contended)
    // the round-12 contaminated run: mt ramp 2.68 → 33.47 while st sat
    // steady — the exact shape the verdict exists to catch
    assert(Bench.Probes(1.25, 1.41, 2.68, 33.47).contended)
    // mt already queued at START relative to st (contention predates
    // the run): trips even with a flat ramp
    assert(Bench.Probes(1.2, 1.2, 5.0, 5.2).contended)
    // mt queued at the END only (contention arrived mid-run)
    assert(Bench.Probes(1.2, 1.2, 1.4, 4.5).contended)
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

  /** A 3×-oversubscribed CPU burn with its own stop flag, so tests can
    * run several independent burn episodes. The burn multiplies the
    * runnable-thread count ~4× whatever the ambient load is, so the
    * probe contrast survives concurrent test suites. */
  private final class Burn {
    @volatile private var stop = false
    private val threads =
      (0 until 3 * Runtime.getRuntime.availableProcessors()).map { t =>
        val th = new Thread(() => {
          val a = new Array[Long](1 << 18)
          var x = t.toLong
          while (!stop) {
            var i = 0
            while (i < a.length) {
              x = x * 6364136223846793005L + 1442695040888963407L
              a(i) = x
              i += 1
            }
            java.util.Arrays.sort(a)
          }
        })
        th.setDaemon(true)
        th.start()
        th
      }
    def halt(): Unit = { stop = true; threads.foreach(_.join(10000)) }
  }

  /** Host-sensitivity gate for the real-burn tests (r17 advice): on an
    * already-loaded, throttled, or very-few-core host the clean-vs-
    * burned probe contrast compresses below the ratios the tests
    * assert — measure the contrast once and CANCEL (not fail) when
    * the host cannot express it. Returns (clean, burned) single-rep
    * windowProbe readings for reuse. */
  private def assumeBurnContrast(): (Double, Double) = {
    assume(Runtime.getRuntime.availableProcessors() >= 4,
      "burn-contrast tests need >= 4 cores to oversubscribe meaningfully")
    Bench.calibrate() // JIT the probe's sort before any timed reading
    // median of 3: a single fast-outlier clean reading would make the
    // post-burn ratios look hot on a healthy host
    val clean = Seq.fill(3)(Bench.windowProbe()).sorted.apply(1)
    val burn = new Burn
    val burned = try Bench.windowProbe() finally burn.halt()
    assume(burned / clean >= 2.0,
      f"clean-vs-burned probe contrast compressed on this host " +
        f"($clean%.2f -> $burned%.2f): cannot exercise the trip")
    (clean, burned)
  }

  /** Last-resort judgeability check for a real-burn assertion ABOUT to
    * fail: inside the test JVM these tests run beside concurrently-
    * executing Spark suites, and a stage starting or finishing between
    * a test's baseline reading and its burned/settled reading shifts
    * the ambient load the two readings implicitly compare across.
    * When the about-to-fail reading can be explained by a measured
    * ambient shift, CANCEL instead of failing — the deterministic stub
    * tests pin the logic; the real-burn arms assert only where the
    * host is verifiably judgeable. */
  private def assumeAmbientHeld(baseline: Double, now: Double,
      what: String): Unit =
    assume(now / baseline < 1.4 && baseline / now < 1.4,
      f"$what: ambient load shifted under the test " +
        f"(baseline $baseline%.2f -> $now%.2f) - unjudgeable here")

  test("a synthetic background burn during the mt probe trips the contended verdict") {
    // the round-12 contamination, reproduced: measure the mt probe on
    // the (relatively) quiet JVM, then again under a background burn —
    // the ramp must trip the verdict
    assumeBurnContrast()
    val st = Bench.calibrate()
    val mtQuiet = Bench.calibrateParallel()
    val burn = new Burn
    val mtBurn =
      try Bench.calibrateParallel()
      finally burn.halt()
    val probes = Bench.Probes(st, st, mtQuiet, mtBurn)
    if (!probes.contended)
      assumeAmbientHeld(mtQuiet, Bench.calibrateParallel(), "mt quiet")
    assert(probes.contended,
      f"burned probe $mtBurn%.2f vs quiet $mtQuiet%.2f (st $st%.2f) " +
        "did not trip the contended verdict")
  }

  test("a sustained burn keeps the settle gate hot through every attempt; a lifted burn clears it") {
    // the r17 artifact's failure mode end-to-end: the retry pass began
    // while the host was still hot (calib_mt_retry 2.70 vs ~1.9) and
    // kept contaminated readings. Under a burn that OUTLIVES the
    // settle attempts the gate must exhaust its rounds and report
    // retry_hot; once the burn lifts, the next gate clears on its
    // first probe.
    val (clean, _) = assumeBurnContrast()
    val burn = new Burn
    val (hotProbes, stillHot) =
      try Bench.settleForRetry(clean, () => (), () => Bench.windowProbe())
      finally burn.halt()
    assert(stillHot && hotProbes.size == Bench.SettleAttempts,
      s"sustained burn did not hold the gate hot: $hotProbes")
    // once the burn lifts the gate clears WITHIN its bounded attempts —
    // residual scheduler heat from the just-halted spinners may
    // legitimately cost it a re-settle or two, which is exactly the
    // behavior under test (a real pause between attempts, unlike the
    // no-op sleeps above that pin the sustained-burn arm)
    val (coolProbes, hotAfter) = Bench.settleForRetry(clean,
      () => Thread.sleep(500), () => Bench.windowProbe())
    if (hotAfter)
      // a concurrent suite's stage may hold the host hot on its own —
      // re-measure the ambient floor and cancel when the "failure" is
      // explained by a shifted baseline, not a stuck gate
      assumeAmbientHeld(clean,
        Seq.fill(3)(Bench.windowProbe()).sorted.apply(1), "post-burn floor")
    assert(!hotAfter,
      s"lifted burn did not clear the gate in " +
        s"${Bench.SettleAttempts} attempts: $coolProbes")
  }

  test("windowed readings, hot segments, and retry durations ride the on-disk line only when passed") {
    val disk = Bench.mkLine(Map("q01_x" -> 1.0), "/sf",
      _.takeWhile(_ != '_'),
      Some(Bench.Probes(0.5, 0.5, 0.75, 0.75)),
      Some(Bench.Retry(Map("q01_x" -> 0.8), 0.5, 0.75,
        settleProbes = Seq(1.8, 0.9))),
      Some(Map("q01_x" -> Seq(1.2, 1.0))),
      Some(Seq(0.8, 0.85, 1.5)), Some(Seq(1)))
    assert(disk.contains(""""windows":[0.80,0.85,1.50]"""), disk)
    assert(disk.contains(""""hot_segments":[1]"""), disk)
    assert(disk.contains(""""retry_reps":{"q01":0.80}"""), disk)
    assert(disk.contains(""""settle_probes":[1.80,0.90]"""), disk)
    // the stdout shape (no windows/reps passed) is unchanged — the
    // width pin above stays authoritative
    val stdout = Bench.mkLine(Map("q01_x" -> 1.0), "/sf",
      _.takeWhile(_ != '_'),
      Some(Bench.Probes(0.5, 0.5, 0.75, 0.75)),
      Some(Bench.Retry(Map("q01_x" -> 0.8), 0.5, 0.75,
        settleProbes = Seq(1.8, 0.9))))
    assert(!stdout.contains("windows") && !stdout.contains("retry_reps") &&
      !stdout.contains("settle_probes"), stdout)
  }

  test("degraded segments: any bounding reading >= 1.5x the run median flags its segments") {
    // flat readings: nothing flagged
    assert(Bench.degradedSegments(Seq(0.8, 0.82, 0.79, 0.81)).isEmpty)
    // the FIRST windowed bench run's actual clean-host readings
    // (spread 1.95x max/min — burstable-host wobble, no contamination;
    // the min-baseline trip retried 87 queries to recover 1 s): the
    // median baseline must read this as healthy
    assert(Bench.degradedSegments(
      Seq(0.88, 0.76, 0.82, 1.04, 0.6, 0.88, 1.17, 0.99)).isEmpty)
    // a burst landing on the run's tail (the r16 mode: its hot-zone
    // queries inflated 3.7-18x, so in-zone probe readings sit well
    // above the quiet median even when the post-run bracket ramp reads
    // only 1.56x): the final segments flag
    assert(Bench.degradedSegments(
      Seq(0.7, 0.72, 0.75, 0.73, 0.74, 0.71, 2.1, 2.9)) == Set(5, 6))
    // a hot MIDDLE reading flags both segments it bounds
    assert(Bench.degradedSegments(Seq(0.8, 1.3, 0.8)) == Set(0, 1))
    // started degraded, recovered: the EARLY segments are the hot ones
    // (ratio is to the run median, not to the previous reading)
    assert(Bench.degradedSegments(
      Seq(1.9, 1.8, 0.8, 0.82, 0.79, 0.81)) == Set(0, 1))
    // a sustained sub-1.5x ramp spanning the whole run elevates the
    // median and does NOT flag — by construction that mode belongs to
    // the bracket ramp and cross-round calib normalization, not the
    // windows (documented blind spot, pinned so it stays a choice)
    assert(Bench.degradedSegments(
      Seq(2.13, 2.25, 2.4, 2.6, 2.8, 3.0, 3.15, 3.32)).isEmpty)
    // fewer than two readings can bound no segment
    assert(Bench.degradedSegments(Seq(0.8)).isEmpty)
    assert(Bench.degradedSegments(Nil).isEmpty)
  }

  test("the windowed loop probes every 25 queries plus a closing reading and maps queries to segments") {
    val names = (0 until 60).map(i => f"q$i%02d_x")
    var probed = 0
    val order = scala.collection.mutable.ArrayBuffer[String]()
    val (reps, windows, segs) = Bench.runWindowed(names,
      n => { order += n; 0.1 }, () => { probed += 1; 0.8 })
    // probes at i = 0, 25, 50, plus the closing reading
    assert(probed == 4 && windows.size == 4)
    assert(reps.size == 60 && reps.values.forall(_ == ((0.1, 0.1))))
    assert(order.toSeq == names.flatMap(n => Seq(n, n)), "reps must run back-to-back per query")
    assert(segs("q00_x") == 0 && segs("q24_x") == 0)
    assert(segs("q25_x") == 1 && segs("q49_x") == 1)
    assert(segs("q50_x") == 2 && segs("q59_x") == 2)
  }

  test("the retry plan unions hot-segment queries with the worst-N only under a bracket trip") {
    val results = Map("q1" -> 5.0, "q2" -> 4.0, "q3" -> 0.2, "q4" -> 0.1)
    val segs = Map("q1" -> 0, "q2" -> 0, "q3" -> 1, "q4" -> 1)
    // windowed trip only: exactly the degraded segment's queries
    assert(Bench.retryPlan(results, segs, Set(1), rampTripped = false)
      .toSet == Set("q3", "q4"))
    // a query that ERRORED is retried by NEITHER arm: merging a
    // post-settle success over a crash would flip errors to 0 and push
    // the merged total above raw_total
    assert(Bench.retryPlan(results + ("q3" -> -1.0), segs, Set(1),
      rampTripped = true).toSet == Set("q1", "q2", "q4"))
    // bracket trip only: the worst-N (all 4 here, N = 10)
    assert(Bench.retryPlan(results, segs, Set.empty, rampTripped = true)
      .toSet == Set("q1", "q2", "q3", "q4"))
    // both: a query in a hot segment is retried ONCE (distinct union)
    val both = Bench.retryPlan(results, segs, Set(0), rampTripped = true)
    assert(both.toSet == Set("q1", "q2", "q3", "q4"))
    assert(both.size == both.distinct.size)
    // no trip: no retry
    assert(Bench.retryPlan(results, segs, Set.empty, rampTripped = false).isEmpty)
  }

  test("a synthetic background burn mid-run fires the windowed retry and the merged total recovers") {
    // the r16 failure, reproduced end-to-end: the host degrades midway
    // through the loop (a 3x-oversubscribed spinner starts while the
    // second window's queries run), the whole-run bracket ramp stays
    // under 3x territory conceptually, but the windowed readings see it
    // and the retry re-runs exactly the queries measured hot.
    val (clean, _) = assumeBurnContrast()
    var burn: Option[Burn] = None
    val names = (0 until 30).map(i => f"q$i%02d_x")
    // the rep for q26 starts the burn: segment 1 (queries 25-29) is
    // measured degraded; the closing probe reads hot and flags it
    val (reps, windows, segs) =
      try Bench.runWindowed(names,
        n => { if (n == "q26_x" && burn.isEmpty) burn = Some(new Burn); 0.1 },
        () => Bench.windowProbe())
      finally burn.foreach(_.halt())
    val degraded = Bench.degradedSegments(windows)
    if (!degraded.contains(1))
      // a concurrent suite's stage inflating the PRE-burn windows
      // raises the median the burned reading is judged against —
      // cancel when that shift is measurable rather than fail
      assumeAmbientHeld(clean, Bench.runMedian(windows),
        "pre-burn window median")
    assert(degraded.contains(1),
      s"burned closing probe did not flag segment 1: windows=$windows")
    val results = reps.map { case (n, (a, b)) => n -> math.min(a, b) }
    val plan = Bench.retryPlan(results, segs, degraded, rampTripped = false)
    assert(plan.toSet.subsetOf(names.toSet) && plan.contains("q26_x"),
      s"plan=$plan")
    // merged headline recovers: the hot queries' retry reps (clean
    // host) replace their inflated originals; raw_total preserves the
    // uncorrected evidence
    val inflated = results ++ plan.map(_ -> 5.0).toMap
    val line = Bench.mkLine(inflated, "/sf", identity,
      Some(Bench.Probes(1.0, 1.0, 1.5, 1.6)),
      Some(Bench.Retry(plan.map(_ -> 0.1).toMap, 1.0, 1.5)))
    val total = """"value":([0-9.]+)""".r.findFirstMatchIn(line).get.group(1).toDouble
    val raw = """"raw_total":([0-9.]+)""".r.findFirstMatchIn(line).get.group(1).toDouble
    assert(total < raw, line)
  }

  test("a dying probe worker fails the reading loudly instead of shrinking it") {
    // a worker that dies (the OOME-on-a-constrained-host case) must not
    // silently end — join() would return with fewer cores loaded and
    // the probe would read artificially FAST exactly when the host is
    // unhealthy
    val e = intercept[IllegalStateException] {
      Bench.calibrateParallelWith { t =>
        if (t == 1) throw new RuntimeException("synthetic worker death")
      }
    }
    assert(e.getMessage.contains("understate contention"), e.getMessage)
    assert(e.getCause != null &&
      e.getCause.getMessage == "synthetic worker death")
  }
}
