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
  override def compare(a: String, b: String): Int = {
    val x = a.getBytes("UTF-8")
    val y = b.getBytes("UTF-8")
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    x.length - y.length
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
