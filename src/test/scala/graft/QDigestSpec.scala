package graft

import graft.functions.{QDBuf, QDigest, QDigestAgg}
import org.apache.spark.sql.functions._

/** The q-digest quantile sketch (q142's engine): the rank-error
  * CONTRACT |rank(est) − q·n| ≤ levels·n/k under every insert order
  * and merge shape, the O(k) size bound of a compressed digest, and
  * the corpus rollup's exact counts + bounded estimates. */
class QDigestSpec extends SparkSpecBase {

  private def build(vals: Seq[Long], k: Int, levels: Int,
      chunks: Int): QDBuf = {
    val agg = new QDigestAgg(k, levels)
    val parts = vals.grouped(math.max(1, vals.size / chunks)).toSeq
      .map(_.foldLeft(agg.zero)(agg.reduce))
    agg.finish(parts.reduce(agg.merge))
  }

  /** rank(v) bracketing: [#(< v), #(≤ v)] — the contract holds if the
    * target rank is within levels·n/k of SOME rank the value covers. */
  private def rankErr(vals: Seq[Long], est: Long, q: Double): Long = {
    val n = vals.size.toLong
    val target = math.ceil(q * n).toLong.max(1L)
    val lo = vals.count(_ < est).toLong
    val hi = vals.count(_ <= est).toLong
    if (target < lo) lo - target
    else if (target > hi) target - hi
    else 0L
  }

  test("rank-error contract under compression, any insert order, any merge shape") {
    val k = 512
    val levels = 16
    val n = 50000
    // a skewed mix: heavy head, long uniform tail — compression MUST
    // kick in (n >> k) for the test to mean anything
    val rnd = new scala.util.Random(42)
    val vals = Seq.fill(n)(
      if (rnd.nextBoolean()) rnd.nextInt(100).toLong
      else rnd.nextInt(1 << 15).toLong)
    val bound = levels.toLong * n / k + 1
    for (chunks <- Seq(1, 7, 64); q <- Seq(0.5, 0.95, 0.99)) {
      val sk = build(rnd.shuffle(vals), k, levels, chunks)
      assert(sk.n == n)
      val est = QDigest.quantile(sk, q, levels)
      val err = rankErr(vals, est, q)
      assert(err <= bound,
        s"q=$q chunks=$chunks: rank error $err > bound $bound (est=$est)")
    }
  }

  test("compressed digest is O(k): at most ~3k nodes survive") {
    val k = 64
    val levels = 16
    val rnd = new scala.util.Random(7)
    val vals = Seq.fill(30000)(rnd.nextInt(1 << 16).toLong)
    val sk = build(vals, k, levels, 13)
    assert(sk.nodes.size <= 3 * k,
      s"${sk.nodes.size} nodes survived compression (k=$k)")
    // counts are conserved exactly no matter how much structure folds
    assert(sk.nodes.values.sum == 30000L)
  }

  test("q142 quantile rollup: exact weekly counts, estimates inside the bound, unions de-duplicate nothing they shouldn't") {
    val rows = SparkEntry.queries("q142_quantile_rollup")(spark, sf).collect()
    assert(rows.nonEmpty)
    val raw = Tables.events(spark, sf)
      .filter(col("ts").isNotNull && col("value").isNotNull)
      .select(date_trunc("week", to_date(col("ts"))).cast("date").as("week"),
        round(col("value") * 100).cast("bigint").as("cents"))
      .collect().groupBy(_.getDate(0)).view
      .mapValues(_.map(_.getLong(1)).toSeq).toMap
    rows.foreach { r =>
      val week = r.getDate(0)
      val vals = raw(week)
      // n is a plain sum — EXACT under any compression
      assert(r.getLong(1) == vals.size.toLong, s"$week count drifted")
      val bound = 32L * vals.size / 2048 + 1
      for ((q, i) <- Seq(0.5 -> 2, 0.95 -> 3, 0.99 -> 4)) {
        val err = rankErr(vals, r.getLong(i), q)
        assert(err <= bound, s"$week q=$q: rank error $err > $bound")
      }
    }
  }
}
