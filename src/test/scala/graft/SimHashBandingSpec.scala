package graft

import graft.ops.SimHashBanding

/** Contract tests for the shared hamming-≤3 candidate kernel (Manku
  * WWW'07 3-of-6 block combinations — see SimHashBanding Scaladoc). */
class SimHashBandingSpec extends SparkSpecBase {

  /** Driver-side reference: the 6-block layout and the 3-of-6 combo rule. */
  private val blocks = Seq((0, 11), (11, 11), (22, 11), (33, 11), (44, 10), (54, 10))
  private def blockVals(sig: Long): Seq[Long] =
    blocks.map { case (off, w) => (sig >>> off) & ((1L << w) - 1) }
  private def sharesCombo(a: Long, b: Long): Boolean = {
    val eq = blockVals(a).zip(blockVals(b)).count { case (x, y) => x == y }
    eq >= 3
  }

  private def toSigDf(sigs: Seq[Long]) = {
    val s = spark
    import s.implicits._
    sigs.toDF("sig")
  }

  test("sigCandidates equals the driver-side 3-of-6 combo rule on mixed sigs") {
    val rnd = new scala.util.Random(42)
    val base = Seq.fill(150)(rnd.nextLong())
    // plant near pairs: ≤3 bit flips of existing sigs, spread over
    // random bit positions (so every block arrangement is exercised)
    val planted = base.take(40).map { s =>
      (1 to (1 + rnd.nextInt(3))).foldLeft(s)((x, _) => x ^ (1L << rnd.nextInt(64)))
    }
    val sigs = (base ++ planted).distinct
    val expected = (for {
      (a, i) <- sigs.zipWithIndex; b <- sigs.drop(i + 1)
      if sharesCombo(a, b)
    } yield (math.min(a, b), math.max(a, b))).toSet
    val got = SimHashBanding.sigCandidates(toSigDf(sigs)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected.nonEmpty)
    assert(got == expected)
  }

  test("sigCandidates is a superset of every hamming-≤3 pair (lossless)") {
    val rnd = new scala.util.Random(7)
    val base = Seq.fill(100)(rnd.nextLong())
    val planted = base.map { s =>
      (1 to 3).foldLeft(s)((x, _) => x ^ (1L << rnd.nextInt(64)))
    }
    val sigs = (base ++ planted).distinct
    val near = (for {
      (a, i) <- sigs.zipWithIndex; b <- sigs.drop(i + 1)
      if java.lang.Long.bitCount(a ^ b) <= 3
    } yield (math.min(a, b), math.max(a, b))).toSet
    assert(near.nonEmpty)
    val got = SimHashBanding.sigCandidates(toSigDf(sigs)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(near.subsetOf(got))
  }

  test("planted hot 16-bit band bucket yields ZERO candidates (round-6 kernel: C(64,2))") {
    // 64 sigs that all agree on bits 0..15 — one shared 16-bit band of
    // the round-6 kernel, which would have emitted all C(64,2) = 2016
    // pairs as candidates. Each sig gets a distinct 6-bit pattern
    // replicated into five separate blocks (1..5), so every pair
    // differs in ≥5 blocks and NO 3-of-6 combination is clean.
    val sigs = (0 until 64).map { i =>
      val v = i.toLong
      0x5A5AL | (v << 16) | (v << 22) | (v << 33) | (v << 44) | (v << 54)
    }
    // premise: pairwise-shared low 16 bits, pairwise hamming > 3
    sigs.combinations(2).foreach { case Seq(a, b) =>
      assert((a & 0xFFFFL) == (b & 0xFFFFL))
      assert(java.lang.Long.bitCount(a ^ b) > 3)
    }
    val n = SimHashBanding.sigCandidates(toSigDf(sigs)).count()
    assert(n == 0, s"hot band bucket leaked $n candidate pairs")
  }

  test("nearPairs expands same-sig and cross-sig doc pairs exactly") {
    val s = spark
    import s.implicits._
    // three docs share sig A; two share sig B at distance 2 from A;
    // one isolated sig C far from both
    val a = 0x0123456789ABCDEFL
    val b = a ^ (1L << 5) ^ (1L << 40)
    val c = ~a
    val rows = Seq((1L, a), (2L, a), (3L, a), (4L, b), (5L, b), (6L, c))
      .toDF("id", "sig")
    val got = SimHashBanding.nearPairs(rows, "id", "sig").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val expected = Set(
      (1L, 2L, 0L), (1L, 3L, 0L), (2L, 3L, 0L), (4L, 5L, 0L),
      (1L, 4L, 2L), (1L, 5L, 2L), (2L, 4L, 2L), (2L, 5L, 2L),
      (3L, 4L, 2L), (3L, 5L, 2L))
    assert(got == expected)
  }
}
