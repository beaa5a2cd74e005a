package graft

import org.apache.spark.sql.SparkSession
import scala.collection.concurrent.TrieMap

/** Shared per-(session, key) build-once cache used by every index-like
  * intermediate (cached tables, shingle/trigram/jaccard/contam indexes,
  * LSH/IVF structures, the board universe, cluster assignments).
  *
  * Sessions are identified by a UUID assigned on first access through
  * an identity-keyed WeakHashMap (SparkSession does not override
  * equals, so WeakHashMap keys compare by identity): collision-free
  * across live sessions — unlike raw `System.identityHashCode`, which
  * can collide and then either leak one session's frames to another or
  * thrash rebuild-and-overwrite — and weak keys let closed sessions be
  * collected. (`SparkSession.sessionUUID` would be the natural token
  * but is `private[sql]`.) Entries of stopped sessions are additionally
  * evicted on each access, so the map never accumulates dead frames. */
private[graft] object SessionCache {
  private val tokens = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, String]())

  /** The session's stable unique token (also used by the warehouse DDL
    * queries for session-scoped table names). */
  private[graft] def sessionToken(spark: SparkSession): String =
    tokens.computeIfAbsent(spark,
      _ => java.util.UUID.randomUUID().toString.replace("-", "").take(16))

  def getOrBuild[V](cache: TrieMap[(String, String), (SparkSession, V)],
      spark: SparkSession, key: String)(build: => V): V = {
    cache.filterInPlace((_, v) => !v._1.sparkContext.isStopped)
    cache.getOrElseUpdate((sessionToken(spark), key), (spark, build))._2
  }
}
