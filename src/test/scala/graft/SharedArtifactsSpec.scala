package graft

import org.apache.spark.sql.functions._

import graft.ops.{SharedArtifacts, Streaming}

/** The hard-link clone (r17): data files LINK (the clone is O(files)
  * metadata work, not O(artifact bytes) — the full byte copy was the
  * dominant first-rep cost of every mutating lifecycle prover),
  * in-place-rewritten metadata names COPY, and a mutation on the clone
  * never reaches the shared base through a shared inode. */
class SharedArtifactsSpec extends SparkSpecBase {

  private def walk(d: java.io.File): Seq[java.io.File] =
    if (d.isDirectory) d.listFiles().toSeq.flatMap(walk) else Seq(d)

  private def nlink(f: java.io.File): Int =
    java.nio.file.Files.getAttribute(f.toPath, "unix:nlink")
      .asInstanceOf[Number].intValue

  private def rowsOf(path: String): Set[String] =
    Streaming.readSink(spark, path).collect().map(_.mkString("|")).toSet

  test("cloneTo hard-links data files, copies metadata, and isolates clone mutations from the base") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("clone_spec").toString
    val base = s"$root/base"
    Streaming.writeBatchIdempotent(
      (1L to 60L).map(i =>
        (java.sql.Timestamp.valueOf(s"2024-01-0${i % 3 + 1} 10:00:00"), i))
        .toDF("ts", "event_id"), base, 0L)
    Streaming.compactSink(spark, base, quiesced = true)
    val before = rowsOf(base)
    val clone = SharedArtifacts.cloneTo(spark, base, s"$root/clone")
    assert(rowsOf(clone) == before)
    val files = walk(new java.io.File(clone)).filter(_.isFile)
    val data = files.filter(_.getName.startsWith("part-"))
    assert(data.nonEmpty, "clone holds no data files")
    data.foreach(f => assert(nlink(f) >= 2,
      s"$f should be a hard link into the base (nlink=${nlink(f)})"))
    // in-place-rewritten metadata (commit markers, locks, plans) must
    // COPY: a linked marker truncated by a clone-side create-overwrite
    // would corrupt the base through the shared inode
    val meta = files.filter(_.getName.startsWith("_"))
    assert(meta.nonEmpty, "clone holds no metadata markers")
    meta.foreach(f => assert(nlink(f) == 1,
      s"metadata $f must copy, not link (nlink=${nlink(f)})"))
    // mutate the clone through a full lifecycle: the base stays intact
    Streaming.deleteWhere(spark, clone, col("event_id") % 2 === 0)
    Streaming.compactSink(spark, clone, quiesced = true)
    assert(rowsOf(base) == before,
      "mutating the clone leaked into the shared base")
    assert(Streaming.readSink(spark, clone)
      .filter(col("event_id") % 2 === 0).isEmpty)
  }
}
