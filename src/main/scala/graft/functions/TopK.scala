package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

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

  private def best(xs: Seq[(String, Long)]): TopKBuf =
    TopKBuf(xs.sortBy { case (t, n) => (-n, t) }.take(k))

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
