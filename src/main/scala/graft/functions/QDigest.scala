package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Buffer/result of [[QDigestAgg]]: the q-digest's surviving tree
  * nodes as heap-id → count (heap numbering over the complete binary
  * tree on the value universe: root = 1, leaf for value v = 2^L | v,
  * parent = id >> 1), plus the total ingested count `n`. ≤ 3k nodes
  * after compression — KBs per group regardless of how many distinct
  * values the group holds. */
case class QDBuf(nodes: Map[Long, Long], n: Long)

/** Shared q-digest mechanics (Shrivastava et al., SenSys'04 "Medians
  * and Beyond"; merged per Agarwal et al. PODS'12 "Mergeable
  * Summaries"): a deterministic, mergeable quantile sketch over the
  * bounded integer universe [0, 2^levels) with rank error ≤
  * levels·n/k — the quantile member of the warehouse sketch trio
  * (HLL distincts q127, Misra–Gries heavy hitters q128).
  *
  * Why this beats exact quantiles at 100 TB: an exact percentile
  * needs a per-group sort of every raw value (q43's caveat); the
  * q-digest streams values into O(k) state, partial buffers combine
  * map-side, and STORED per-partition digests union losslessly — any
  * date range's p50/p95/p99 is answerable from the per-day sketches
  * at sketch cost, never re-scanning raw rows (medians don't average;
  * sketches merge).
  *
  * compress: bottom-up over the levels — a child pair whose combined
  * count with its parent stays under ⌊n/k⌋ folds into the parent (the
  * paper's q-digest property), bounding the node count at ~3k while
  * charging every value's rank uncertainty at most one sub-threshold
  * node per tree level.  quantile: walk nodes in postorder (right
  * endpoint asc, deeper first) accumulating counts; the node where
  * the target rank lands answers with its range's right endpoint. */
object QDigest {
  /** depth of a heap id (root = 0). */
  private def depth(id: Long): Int = 63 - java.lang.Long.numberOfLeadingZeros(id)

  /** inclusive value range [lo, hi] covered by a node. */
  private[functions] def range(id: Long, levels: Int): (Long, Long) = {
    val d = depth(id)
    val shift = levels - d
    val lo = (id ^ (1L << d)) << shift
    (lo, lo + (1L << shift) - 1L)
  }

  /** Restore the q-digest property, returning ≤ ~3k nodes. */
  private[functions] def compress(nodes: Map[Long, Long], n: Long,
      k: Int): Map[Long, Long] = {
    val t = n / k
    if (t <= 0) return nodes
    val m = scala.collection.mutable.HashMap.from(nodes)
    // level-by-level, deepest first: keys are re-taken per level, so a
    // parent minted by one fold keeps folding at ITS level's turn
    var d = m.keys.map(depth).maxOption.getOrElse(0)
    while (d >= 1) {
      m.keys.filter(depth(_) == d).toArray.foreach { id =>
        if (m.contains(id)) {
          val even = id & ~1L
          val pair = m.getOrElse(even, 0L) + m.getOrElse(even | 1L, 0L)
          if (pair + m.getOrElse(id >> 1, 0L) < t) {
            if (pair > 0) m.updateWith(id >> 1) {
              c => Some(c.getOrElse(0L) + pair)
            }
            m.remove(even)
            m.remove(even | 1L)
          }
        }
      }
      d -= 1
    }
    m.toMap
  }

  private[functions] def insert(b: QDBuf, v: Long, k: Int,
      levels: Int): QDBuf = {
    val max = (1L << levels) - 1L
    val leaf = (1L << levels) | math.min(math.max(v, 0L), max)
    val grown = b.nodes.updatedWith(leaf)(c => Some(c.getOrElse(0L) + 1L))
    val next = QDBuf(grown, b.n + 1L)
    if (next.nodes.size > 3 * k)
      QDBuf(compress(next.nodes, next.n, k), next.n)
    else next
  }

  private[functions] def merge(a: QDBuf, b: QDBuf, k: Int): QDBuf = {
    val summed = b.nodes.foldLeft(a.nodes) { case (m, (id, c)) =>
      m.updatedWith(id)(x => Some(x.getOrElse(0L) + c))
    }
    QDBuf(compress(summed, a.n + b.n, k), a.n + b.n)
  }

  /** Rank-walk quantile estimate: the value whose rank is within
    * levels·n/k of q·n, by the paper's postorder accumulation. */
  def quantile(b: QDBuf, q: Double, levels: Int): Long = {
    if (b.n <= 0) return 0L
    val target = math.ceil(q * b.n).toLong.max(1L)
    val post = b.nodes.toArray.sortBy { case (id, _) =>
      val (lo, hi) = range(id, levels)
      (hi, -lo) // right endpoint asc; deeper (narrower) nodes first
    }
    var cum = 0L
    var ans = range(post.last._1, levels)._2
    var i = 0
    var found = false
    while (i < post.length && !found) {
      cum += post(i)._2
      if (cum >= target) { ans = range(post(i)._1, levels)._2; found = true }
      i += 1
    }
    ans
  }
}

/** Per-group q-digest build: raw values stream into O(k) state (the
  * stored form a warehouse materializes next to each partition). */
class QDigestAgg(k: Int, levels: Int)
    extends Aggregator[Long, QDBuf, QDBuf] {
  override def zero: QDBuf = QDBuf(Map.empty, 0L)
  override def reduce(b: QDBuf, v: Long): QDBuf =
    QDigest.insert(b, v, k, levels)
  override def merge(a: QDBuf, b: QDBuf): QDBuf = QDigest.merge(a, b, k)
  override def finish(b: QDBuf): QDBuf =
    QDBuf(QDigest.compress(b.nodes, b.n, k), b.n)
  override def bufferEncoder: Encoder[QDBuf] = Encoders.product[QDBuf]
  override def outputEncoder: Encoder[QDBuf] = Encoders.product[QDBuf]
}

/** Union of STORED digests with the quantile estimates read straight
  * off the merged sketch — (p50, p95, p99, n). Mergeability is the
  * whole point: daily digests union losslessly into any date range,
  * so the answer never touches raw rows (and no scalar UDF runs —
  * the estimates fall out of the aggregation's own finish). */
class QDigestUnionQuantiles(k: Int, levels: Int)
    extends Aggregator[QDBuf, QDBuf, (Long, Long, Long, Long)] {
  override def zero: QDBuf = QDBuf(Map.empty, 0L)
  override def reduce(b: QDBuf, in: QDBuf): QDBuf =
    QDigest.merge(b, in, k)
  override def merge(a: QDBuf, b: QDBuf): QDBuf = QDigest.merge(a, b, k)
  override def finish(b: QDBuf): (Long, Long, Long, Long) =
    (QDigest.quantile(b, 0.50, levels),
      QDigest.quantile(b, 0.95, levels),
      QDigest.quantile(b, 0.99, levels), b.n)
  override def bufferEncoder: Encoder[QDBuf] = Encoders.product[QDBuf]
  override def outputEncoder: Encoder[(Long, Long, Long, Long)] =
    Encoders.product[(Long, Long, Long, Long)]
}
