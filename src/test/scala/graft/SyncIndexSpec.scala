package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{Streaming, TextOps}

/** Sink→index incremental sync (TextOps.syncLexicalIndex): the
  * build→append→noop cycle, search equivalence with a one-shot build,
  * cursor carry-forward through index compaction, lineage survival of
  * delete generations, and the two loud refusals (horizon, mutation). */
class SyncIndexSpec extends SparkSpecBase {

  private def scratch(name: String): String = {
    val d = new java.io.File(s"target/sync_spec/$name").getAbsolutePath
    val p = new org.apache.hadoop.fs.Path(d)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    d
  }

  private def docs: DataFrame =
    Tables.documents(spark, sf).select("doc_id", "text")

  private def slice(rem: Int): DataFrame =
    docs.filter(pmod(col("doc_id"), lit(3)) === rem)

  private def probes: DataFrame =
    docs.filter(col("doc_id") < 5)
      .select(col("doc_id").as("probe_id"), col("text"))

  private def rowsOf(df: DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).toSeq

  test("build -> append -> noop, and the synced index searches like a one-shot build") {
    val sink = scratch("cycle_sink"); val idx = scratch("cycle_idx")
    Streaming.writeBatchIdempotent(slice(0), sink, 0L)
    Streaming.writeBatchIdempotent(slice(1), sink, 1L)
    val (g1, m1) = TextOps.syncLexicalIndex(spark, sink, idx)
    Streaming.writeBatchIdempotent(slice(2), sink, 2L)
    val (g2, m2) = TextOps.syncLexicalIndex(spark, sink, idx)
    val (g3, m3) = TextOps.syncLexicalIndex(spark, sink, idx)
    assert((m1, m2, m3) == (("build", "append", "noop")))
    assert(g1 == 0L && g2 == 1L && g3 == 1L)
    val oneShot = scratch("cycle_oneshot")
    TextOps.writeLexicalIndex(spark, docs, oneShot)
    assert(rowsOf(TextOps.searchLexicalIndex(spark, probes, idx)
      .orderBy("probe_id", "rank")) ==
      rowsOf(TextOps.searchLexicalIndex(spark, probes, oneShot)
        .orderBy("probe_id", "rank")))
  }

  test("index compaction carries the sync cursor forward - no re-append amnesia") {
    val sink = scratch("carry_sink"); val idx = scratch("carry_idx")
    Streaming.writeBatchIdempotent(slice(0), sink, 0L)
    TextOps.syncLexicalIndex(spark, sink, idx)
    Streaming.writeBatchIdempotent(slice(1), sink, 1L)
    TextOps.syncLexicalIndex(spark, sink, idx)
    TextOps.compactLexicalIndex(spark, idx)
    // without carry-forward this would re-append batches 0-1 and
    // double every posting
    val (_, m) = TextOps.syncLexicalIndex(spark, sink, idx)
    assert(m == "noop", "compaction must not amnesia the indexer's cursor")
    // and the lineage keeps advancing after the fold
    Streaming.writeBatchIdempotent(slice(2), sink, 2L)
    val (_, m2) = TextOps.syncLexicalIndex(spark, sink, idx)
    assert(m2 == "append")
    val oneShot = scratch("carry_oneshot")
    TextOps.writeLexicalIndex(spark, docs, oneShot)
    assert(rowsOf(TextOps.searchLexicalIndex(spark, probes, idx)
      .orderBy("probe_id", "rank")) ==
      rowsOf(TextOps.searchLexicalIndex(spark, probes, oneShot)
        .orderBy("probe_id", "rank")))
  }

  test("an index delete generation does not reset the sync lineage") {
    val sink = scratch("tomb_sink"); val idx = scratch("tomb_idx")
    Streaming.writeBatchIdempotent(slice(0), sink, 0L)
    TextOps.syncLexicalIndex(spark, sink, idx)
    TextOps.deleteFromLexicalIndex(spark,
      docs.filter(pmod(col("doc_id"), lit(7)) === 3).select("doc_id"), idx)
    val (_, m) = TextOps.syncLexicalIndex(spark, sink, idx)
    assert(m == "noop",
      "a tombstone generation carries no cursor and must not reset it")
  }

  test("sink compaction past the cursor refuses loudly") {
    val sink = scratch("hor_sink"); val idx = scratch("hor_idx")
    val dated = docs.withColumn("ts",
      to_timestamp(lit("2026-01-01 00:00:00")))
    Streaming.writeBatchIdempotent(
      dated.filter(pmod(col("doc_id"), lit(3)) === 0), sink, 0L)
    TextOps.syncLexicalIndex(spark, sink, idx) // cursor = 0
    Streaming.writeBatchIdempotent(
      dated.filter(pmod(col("doc_id"), lit(3)) === 1), sink, 1L)
    Streaming.compactSink(spark, sink, quiesced = true) // horizon -> 1
    val e = intercept[IllegalArgumentException] {
      TextOps.syncLexicalIndex(spark, sink, idx)
    }
    assert(e.getMessage.contains("compacted past cursor") ||
      e.getMessage.contains("cannot sync"))
  }

  test("maintainLexicalIndex compacts at the generation threshold, noop below") {
    val sink = scratch("pol_sink"); val idx = scratch("pol_idx")
    Streaming.writeBatchIdempotent(slice(0), sink, 0L)
    TextOps.syncLexicalIndex(spark, sink, idx)
    Streaming.writeBatchIdempotent(slice(1), sink, 1L)
    TextOps.syncLexicalIndex(spark, sink, idx) // 2 committed gens
    assert(TextOps.maintainLexicalIndex(spark, idx,
      compactAfterGens = 3).isEmpty, "below threshold = noop")
    Streaming.writeBatchIdempotent(slice(2), sink, 2L)
    TextOps.syncLexicalIndex(spark, sink, idx) // 3 gens: threshold
    val actions = TextOps.maintainLexicalIndex(spark, idx,
      compactAfterGens = 3)
    assert(actions.exists(_.startsWith("compacted=")), actions)
    // the fold kept the ranking and the cursor (policy-run compaction
    // must be as lossless as a manual one)
    val oneShot = scratch("pol_oneshot")
    TextOps.writeLexicalIndex(spark, docs, oneShot)
    assert(rowsOf(TextOps.searchLexicalIndex(spark, probes, idx)
      .orderBy("probe_id", "rank")) ==
      rowsOf(TextOps.searchLexicalIndex(spark, probes, oneShot)
        .orderBy("probe_id", "rank")))
    val (_, m) = TextOps.syncLexicalIndex(spark, sink, idx)
    assert(m == "noop")
    // the operator's one-row view of all of the above
    val st = TextOps.describeLexicalIndex(spark, idx).collect()(0)
    assert(st.getLong(0) == 1L && st.getLong(2) == 2L &&
      !st.getBoolean(4) && st.getLong(5) > 0L)
  }

  test("a sink mutation (delete epoch) refuses loudly") {
    val sink = scratch("mut_sink"); val idx = scratch("mut_idx")
    val dated = docs.withColumn("ts",
      to_timestamp(lit("2026-01-01 00:00:00")))
    Streaming.writeBatchIdempotent(dated, sink, 0L)
    Streaming.compactSink(spark, sink, quiesced = true)
    TextOps.syncLexicalIndex(spark, sink, idx)
    Streaming.deleteWhere(spark, sink, pmod(col("doc_id"), lit(7)) === 3)
    val e = intercept[IllegalArgumentException] {
      TextOps.syncLexicalIndex(spark, sink, idx)
    }
    assert(e.getMessage.contains("cannot sync"))
  }
}
