package graft

import org.apache.spark.sql.functions._
import graft.ops.Streaming

/** The r18 `schema=` commit record: every epoch-minting op writes the
  * reader-facing schema into `_EPOCH_COMMIT`, so frame construction
  * over the epoch is DECLARED instead of paying a distributed
  * mergeSchema footer sweep (0.2-0.5 s per construction at sf0.1, a
  * full O(files) job at warehouse scale — the reason every lakehouse
  * keeps the schema in its commit log). The record is perf-only: a
  * marker without it (legacy, hand-made) falls back to inference, and
  * these tests pin that both paths serve IDENTICAL rows and schema,
  * including the two drift shapes that could go wrong — additive
  * columns surfacing as NULL from moved days, and an affected-days
  * rewrite whose own frame is narrower than the epoch. */
class RecordedSchemaSpec extends SparkSpecBase {

  private def tsv(s: String): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(s)

  private def markerOf(out: String, epoch: Long): java.io.File =
    new java.io.File(s"$out/epoch=$epoch/_EPOCH_COMMIT")

  private def markerLines(out: String, epoch: Long): Seq[String] =
    new String(java.nio.file.Files.readAllBytes(
      markerOf(out, epoch).toPath), "UTF-8").split("\n").toSeq

  private def stripSchemaLine(out: String, epoch: Long): Unit = {
    val kept = markerLines(out, epoch).filterNot(_.startsWith("schema="))
    java.nio.file.Files.write(markerOf(out, epoch).toPath,
      kept.mkString("\n").getBytes("UTF-8"))
    // the rewrite invalidates the local FS's checksum shadow — drop it
    // (StreamingSpec's hand-edited-marker convention)
    new java.io.File(s"$out/epoch=$epoch/._EPOCH_COMMIT.crc").delete()
  }

  test("the commit records the reader schema; declared and inferred reads agree") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("rec_schema").toString
    val out = s"$root/events"
    // additive drift across two batches: the fold's epoch spans both
    Streaming.writeBatchIdempotent(
      Seq((tsv("2024-01-01 10:00:00"), 1L)).toDF("ts", "event_id"), out, 0L)
    Streaming.writeBatchIdempotent(
      Seq((tsv("2024-01-02 10:00:00"), 2L, "mobile"))
        .toDF("ts", "event_id", "source"), out, 1L)
    val e = Streaming.compactSink(spark, out, quiesced = true)
    assert(markerLines(out, e).exists(_.startsWith("schema=")),
      "the compaction must record the epoch schema in its marker")
    val declared = Streaming.readSink(spark, out)
    // same columns, same rows as the inference fallback (the legacy
    // marker shape, simulated by stripping the record)
    val declaredRows = declared.select("event_id", "source", "day")
      .collect().map(_.toString).sorted.toSeq
    assert(declared.columns.toSeq ==
      Seq("ts", "event_id", "source", "day"))
    stripSchemaLine(out, e)
    val inferred = Streaming.readSink(spark, out)
    assert(inferred.columns.toSeq == declared.columns.toSeq,
      "inference fallback must serve the same schema")
    assert(inferred.select("event_id", "source", "day")
      .collect().map(_.toString).sorted.toSeq == declaredRows,
      "declared and inferred reads must serve identical rows")
  }

  test("an affected-days rewrite records the FULL epoch width, not its own") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("rec_width").toString
    val out = s"$root/events"
    // the drift column lives ONLY in day 2024-01-02
    Streaming.writeBatchIdempotent(
      Seq((tsv("2024-01-01 10:00:00"), 1L, 7L))
        .toDF("ts", "event_id", "user_id"), out, 0L)
    Streaming.writeBatchIdempotent(
      Seq((tsv("2024-01-02 10:00:00"), 2L, 8L, "mobile"))
        .toDF("ts", "event_id", "user_id", "source"), out, 1L)
    val e0 = Streaming.compactSink(spark, out, quiesced = true)
    // force the WORST case for the rewrite: no recorded schema on the
    // source epoch, so its affected-days frame is inferred from the
    // touched day alone — the minted record must still widen to the
    // whole epoch or the moved day's drift column would vanish from
    // every declared read after the delete
    stripSchemaLine(out, e0)
    // the delete touches ONLY day 2024-01-01 (the source-less day);
    // day 2024-01-02 moves by rename, carrying `source`
    val e1 = Streaming.deleteWhere(spark, out, col("user_id") === 7L)
    assert(e1 > e0)
    assert(markerLines(out, e1).exists(_.startsWith("schema=")))
    val served = Streaming.readSink(spark, out)
    assert(served.columns.contains("source"),
      "the moved day's drift column must survive a declared read")
    assert(served.select("event_id", "source").as[(Long, Option[String])]
      .collect().toSeq.sortBy(_._1) == Seq((2L, Some("mobile"))))
  }
}
