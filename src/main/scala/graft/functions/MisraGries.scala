package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Buffer/result of [[MisraGries]]: at most k surviving (token,
  * estimated-count) pairs in canonical (est desc, token UTF-8) order,
  * plus `delta` — the total count mass removed by decrements, which is
  * simultaneously the summary's per-token error bound
  * (est ≤ true ≤ est + delta for EVERY token, surviving or not). */
case class MGBuf(items: Seq[(String, Long)], delta: Long)

/** Bounded-memory heavy-hitters sketch (Misra–Gries '82, merged per
  * Agarwal et al. PODS'12 "Mergeable Summaries"): k counters per
  * group, map-side partial aggregation, O(k) state no matter how many
  * distinct tokens a group holds.
  *
  * Why this beats exact counting at 100 TB: an exact token count
  * shuffles one row per DISTINCT token (web-corpus: billions); the MG
  * summary shuffles at most partitions × k rows per group and still
  * GUARANTEES every token with true frequency > N/(k+1) survives,
  * with each estimate undercounting by at most `delta` ≤ N/(k+1).
  * [[TopKPairs]] is the exact bounded-shuffle top-k over
  * pre-aggregated counts; this is the one-pass sketch that never
  * materializes the counts at all.
  *
  * reduce: increment a present token; admit below capacity; otherwise
  * decrement ALL k counters by one (one unit of delta — the classic
  * step that charges the arriving token and k survivors together).
  * merge: sum counters by token, then restore the k-bound by
  * subtracting the (k+1)-th largest combined count from everyone
  * (adding it to delta) and dropping the non-positive — the PODS'12
  * merge that keeps the error bounds additive.
  *
  * Estimates are partitioning-dependent (rows-only territory); the
  * ERROR CONTRACT est ≤ true ≤ est + delta holds under every
  * partitioning, and the spec pins it both on synthetic skew and on
  * the corpus. */
class MisraGries(k: Int) extends Aggregator[String, MGBuf, MGBuf] {

  private val ord: Ordering[(String, Long)] =
    Ordering.by[(String, Long), Long](-_._2).orElseBy(_._1)(Utf8Order)

  override def zero: MGBuf = MGBuf(Seq.empty, 0L)

  override def reduce(b: MGBuf, tok: String): MGBuf = {
    val i = b.items.indexWhere(_._1 == tok)
    if (i >= 0)
      MGBuf(b.items.updated(i, (tok, b.items(i)._2 + 1)), b.delta)
    else if (b.items.size < k)
      MGBuf(b.items :+ (tok, 1L), b.delta)
    else {
      // decrement all k (the arriving token's single count cancels
      // against the same unit): k+1 count mass leaves per step, which
      // is exactly why delta can never exceed N/(k+1)
      val dec = b.items.map { case (t, c) => (t, c - 1) }.filter(_._2 > 0)
      MGBuf(dec, b.delta + 1)
    }
  }

  override def merge(b1: MGBuf, b2: MGBuf): MGBuf = {
    val combined = (b1.items ++ b2.items)
      .groupBy(_._1).iterator
      .map { case (t, xs) => (t, xs.map(_._2).sum) }
      .toSeq.sorted(ord)
    val delta = b1.delta + b2.delta
    if (combined.size <= k) MGBuf(combined, delta)
    else {
      val cut = combined(k)._2 // (k+1)-th largest combined count
      val kept = combined.map { case (t, c) => (t, c - cut) }
        .filter(_._2 > 0)
      MGBuf(kept, delta + cut)
    }
  }

  override def finish(r: MGBuf): MGBuf =
    MGBuf(r.items.sorted(ord), r.delta)

  override def bufferEncoder: Encoder[MGBuf] = Encoders.product[MGBuf]

  override def outputEncoder: Encoder[MGBuf] = bufferEncoder
}
