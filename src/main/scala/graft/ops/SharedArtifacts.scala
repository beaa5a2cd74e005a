package graft.ops

import org.apache.spark.sql.SparkSession

import scala.collection.concurrent.TrieMap

/** Session-scoped SHARED, IMMUTABLE on-disk artifacts — the build-once
  * discipline [[graft.SessionCache]] applies to in-memory frames,
  * extended to stored structures (sinks, stored indexes).
  *
  * Why: the lifecycle proof queries (q134–q155) each used to ingest,
  * compact, and index a PRIVATE copy of the same input tables, so the
  * declared-query bench was dominated by redundant scratch builds (the
  * r14 verdict's #3: "share one immutable session-scoped base lifecycle
  * where semantics allow"). Queries that only READ a base artifact
  * (searches, pruned reads) share it directly; queries that MUTATE
  * (delete / upsert / compact provers) take a [[cloneTo]] file-copy of
  * the shared base into their private scratch and mutate the clone —
  * a local-fs copy of the artifact's bytes, orders of magnitude
  * cheaper than re-running the tokenize/encode/shuffle pipeline that
  * built it.
  *
  * Immutability contract: consumers never write into a shared
  * artifact, with ONE carve-out — idempotent, deterministic,
  * metadata-only index manifests (zone-map stats, bloom filters) that
  * overwrite to identical content regardless of which query writes
  * first, so results are independent of query execution order. Results
  * must be identical whether a query runs in isolation or after any
  * other — that is what keeps the per-query oracle hashes meaningful.
  *
  * Build-once is per (session, input dir, artifact name) via
  * [[graft.SessionCache.getOrBuild]]; the path embeds the session
  * token, so a fresh JVM can never adopt a previous run's partial
  * tree, and the pre-build delete clears same-session reruns. */
private[ops] object SharedArtifacts {

  private val built = TrieMap.empty[(String, String), (SparkSession, String)]

  /** The path of shared artifact `name` derived from input `dir`,
    * building it exactly once per session via `build(path)`. The
    * returned tree is IMMUTABLE to callers — mutate a [[cloneTo]]
    * copy instead. */
  def once(spark: SparkSession, dir: String, name: String)
      (build: String => Unit): String =
    graft.SessionCache.getOrBuild(built, spark, s"artifact:$name:$dir") {
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val root = spark.conf.getOption("spark.graft.scratchDir")
        .getOrElse(System.getProperty("java.io.tmpdir"))
      val path = new java.io.File(
        new java.io.File(root, "graft_shared"),
        s"${name}_${key}_${graft.SessionCache.sessionToken(spark)}")
        .getAbsolutePath
      val p = new org.apache.hadoop.fs.Path(path)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
      build(path)
      path
    }

  /** Deep-copy shared artifact `src` into the caller's PRIVATE scratch
    * path `dst` (cleared first), so lifecycle mutations never touch
    * the shared base. A driver-side local-fs recursive copy — no Spark
    * job, O(artifact bytes). Returns `dst`. */
  def cloneTo(spark: SparkSession, src: String, dst: String): String = {
    val conf = spark.sparkContext.hadoopConfiguration
    val sp = new org.apache.hadoop.fs.Path(src)
    val dp = new org.apache.hadoop.fs.Path(dst)
    val sf = sp.getFileSystem(conf)
    val df = dp.getFileSystem(conf)
    df.delete(dp, true)
    df.mkdirs(dp.getParent)
    require(org.apache.hadoop.fs.FileUtil.copy(sf, sp, df, dp, false, conf),
      s"could not clone shared artifact $src -> $dst")
    dst
  }
}
