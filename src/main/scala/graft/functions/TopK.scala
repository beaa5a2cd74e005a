package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** UTF-8 binary order for Strings — the collation Spark's UTF8_BINARY
  * sorts and DuckDB's default collation use. JVM String.compareTo
  * compares UTF-16 code units instead, which disagrees whenever a
  * BMP char in [U+E000, U+FFFF] meets a supplementary-plane char —
  * so any driver-side tiebreak that must match an engine ORDER BY
  * goes through this ordering, never through compareTo. */
object Utf8Order extends Ordering[String] {
  // Allocation-free: walks UTF-16 chars and applies the standard
  // code-point-order fixup at the first difference (Lucene's
  // UTF8-as-UTF16 trick) — surrogates (U+D800-DFFF, encoding code
  // points >= U+10000) must sort ABOVE every BMP char, so when both
  // differing chars are >= 0xD800 the ranges swap: E000-FFFF -> -0x800,
  // D800-DFFF -> +0x2000. Equivalent to comparing the UTF-8 encodings
  // byte-for-byte, without encoding anything.
  override def compare(a: String, b: String): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      var ca = a.charAt(i).toInt
      var cb = b.charAt(i).toInt
      if (ca != cb) {
        if (ca >= 0xd800 && cb >= 0xd800) {
          ca = if (ca >= 0xe000) ca - 0x800 else ca + 0x2000
          cb = if (cb >= 0xe000) cb - 0x800 else cb + 0x2000
        }
        return ca - cb
      }
      i += 1
    }
    a.length - b.length
  }
}

/** Buffer/result of TopKPairs: the k best (token, n) pairs, ordered
  * (n desc, token asc). A concrete Product type so the buffer rides
  * the public Encoders.product derivation — no Kryo, no internal
  * encoder APIs. */
case class TopKBuf(items: Seq[(String, Long)])

/** Bounded top-k typed Aggregator (the Dataset extension point the
  * engine uses alongside the Catalyst Expression one in DotProduct):
  * keeps the k best (n desc, token asc) pairs per group in a k-sized
  * buffer with map-side PARTIAL aggregation.
  *
  * Why this beats the window form at scale: per-group top-k via
  * row_number() needs the full per-group sort — every (group, item)
  * row shuffles, then sorts, then all but k rows are discarded. An
  * Aggregator's partial buffers combine map-side, so at most
  * partitions × k rows per group cross the shuffle no matter how many
  * items a group has. Same answer, shuffle bytes bounded by k.
  *
  * Determinism: the (n desc, token asc) order is total, and merge is
  * associative/commutative on that order, so the result is identical
  * for every partitioning — which is what lets q84 share q13's DuckDB
  * oracle verbatim.
  */
class TopKPairs(k: Int)
  extends Aggregator[(String, Long), TopKBuf, TopKBuf] {

  // token ties break in UTF-8 binary order: the aggregate must rank
  // exactly like the window twin's ORDER BY n DESC, token (UTF8_BINARY)
  // and the shared DuckDB oracle — not like JVM compareTo
  private val ord: Ordering[(String, Long)] =
    Ordering.by[(String, Long), Long](-_._2).orElseBy(_._1)(Utf8Order)

  private def best(xs: Seq[(String, Long)]): TopKBuf =
    TopKBuf(xs.sorted(ord).take(k))

  override def zero: TopKBuf = TopKBuf(Seq.empty)

  // the buffer stays ≤ k+1 elements before the cut, so the per-row
  // cost is O(k log k) with tiny constants — no heap needed at k=5
  override def reduce(b: TopKBuf, a: (String, Long)): TopKBuf =
    best(b.items :+ a)

  override def merge(b1: TopKBuf, b2: TopKBuf): TopKBuf =
    best(b1.items ++ b2.items)

  override def finish(r: TopKBuf): TopKBuf = r

  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]

  override def outputEncoder: Encoder[TopKBuf] = bufferEncoder
}
