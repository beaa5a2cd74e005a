package graft

import org.apache.spark.sql.SparkSession
import scala.collection.concurrent.TrieMap

/** Shared per-(session, key) build-once cache used by every index-like
  * intermediate (cached tables, shingle/trigram/LSH/IVF indexes, the
  * board universe, cluster assignments).
  *
  * Keys use `System.identityHashCode(spark)`, which can collide across
  * two live sessions — so every value carries its owning session and a
  * cache hit is honored only when the stored session IS the caller's
  * (`eq`); on a collision the entry is rebuilt for the caller rather
  * than leaking another session's frame. (`sessionUUID` would be the
  * natural key but is `private[sql]`.) Entries of stopped sessions are
  * evicted on each access, so the map never accumulates dead frames. */
private[graft] object SessionCache {
  def getOrBuild[V](cache: TrieMap[(Int, String), (SparkSession, V)],
      spark: SparkSession, key: String)(build: => V): V = {
    cache.filterInPlace((_, v) => !v._1.sparkContext.isStopped)
    val k = (System.identityHashCode(spark), key)
    val v = cache.getOrElseUpdate(k, (spark, build))
    if (v._1 eq spark) v._2
    else {
      val fresh = (spark, build)
      cache.put(k, fresh)
      fresh._2
    }
  }
}
