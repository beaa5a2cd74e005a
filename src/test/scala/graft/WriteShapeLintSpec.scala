package graft

import org.apache.spark.sql.catalyst.plans.physical.{HashPartitioning, RangePartitioning}
import org.apache.spark.sql.execution.{QueryExecution, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.command.{CreateDataSourceTableAsSelectCommand, DataWritingCommandExec}
import org.apache.spark.sql.execution.datasources.InsertIntoHadoopFsRelationCommand
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

/** Write-path plan lint: a partitioned write whose feeding shuffle is
  * keyed SOLELY on the write's partition columns funnels every row of
  * a partition value through ONE writer task — the round-11 compaction
  * shape (`repartition(col("day"))` before `partitionBy("day")`) that
  * turns a hot day into a single-task terabyte funnel at 100 TB. The
  * fix (size-aware `repartitionByRange(k, day, ts)`) keys the shuffle
  * on MORE than the partition columns, so a hot partition spans
  * several writers; this gate keeps the shape from coming back.
  *
  * PlanLintSpec lints the plans of the frames the queries RETURN;
  * writes execute as side effects inside the query functions, so this
  * spec captures their `DataWritingCommandExec` plans through a
  * QueryExecutionListener instead (the bus is FIFO: a sentinel write
  * observed means every earlier write was delivered).
  *
  * Deliberate single-writer layouts are allowlisted BY TARGET with the
  * reason recorded — and the suite asserts the detector actually SAW
  * them, so a detector regression cannot make the gate vacuous. */
class WriteShapeLintSpec extends SparkSpecBase with AdaptiveSparkPlanHelper {

  // The sweep runs the ENTIRE registry under the listener (not a
  // curated write-query list): a future query that adds a partitioned
  // write is covered automatically, with no list to forget to extend.
  // As of round 12 the partitioned writers are q115/q116 (sink
  // compaction, the fixed range shape), q100 (CTAS + INSERT,
  // allowlisted), and the LSH layout (allowlisted); q114 buckets
  // without partition dirs and q90 writes unpartitioned — both out of
  // scope by construction.

  /** Deliberate single-writer-per-partition-value layouts. */
  private def allowlisted(target: String): Option[String] =
    if (target.contains("seg_sales"))
      // q100's catalog table: one sized writer per market segment is
      // the pinned file-sizing contract (SqlSurfaceSpec asserts the
      // exact per-segment file set); segments are few and the table is
      // a curated warehouse extract, not the raw feed
      Some("q100 pinned one-sized-file-per-segment contract")
    else if (target.contains("lsh_layout"))
      // LSH buckets are genuinely small (banded hashing bounds bucket
      // occupancy); one sized file per (band,bucket) dir IS the layout
      // whose one-dir pruning VectorOpsSpec pins exactly
      Some("LSH (band,bucket) dirs are bounded-small by banding")
    else None

  /** The topmost shuffle feeding a plan subtree (pre-order first). */
  private def topShuffle(p: SparkPlan): Option[ShuffleExchangeLike] =
    collect(p) { case s: ShuffleExchangeLike => s }.headOption

  /** (target, partitioning description) for every partitioned write in
    * `plan` whose feeding shuffle keys solely on the write's partition
    * columns — hash OR range: range partitioning on the partition
    * columns alone cannot split equal keys either, so it is the same
    * single-writer funnel. */
  private def singleWriterHazards(plan: SparkPlan): Seq[(String, String)] =
    collect(plan) {
      case d: DataWritingCommandExec =>
        val (target, partCols) = d.cmd match {
          case i: InsertIntoHadoopFsRelationCommand =>
            (i.outputPath.toString, i.partitionColumns.map(_.name))
          case c: CreateDataSourceTableAsSelectCommand =>
            (c.table.identifier.unquotedString, c.table.partitionColumnNames)
          case other => (other.nodeName, Seq.empty[String])
        }
        val cols = partCols.map(_.toLowerCase).toSet
        def keyedOnPartColsOnly(exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =
          exprs.nonEmpty && exprs.forall { e =>
            val refs = e.references.map(_.name.toLowerCase).toSet
            refs.nonEmpty && refs.subsetOf(cols)
          }
        if (cols.isEmpty) None
        else topShuffle(d.child).flatMap { ex =>
          ex.outputPartitioning match {
            case h: HashPartitioning if keyedOnPartColsOnly(h.expressions) =>
              Some(target -> s"hashpartitioning(${partCols.mkString(",")})")
            case r: RangePartitioning
              if keyedOnPartColsOnly(r.ordering.map(_.child)) =>
              Some(target -> s"rangepartitioning(${partCols.mkString(",")})")
            case _ => None
          }
        }
    }.flatten

  /** Run `body` with a listener capturing every write-command plan's
    * hazards, then a sentinel write to flush the FIFO listener bus. */
  private def capturingWrites(body: => Unit): Seq[(String, String)] = {
    val captured =
      scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    @volatile var sentinelSeen = false
    val sentinelTag = s"wslint_sentinel_${System.nanoTime()}"
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit = {
        if (qe.executedPlan.toString.contains(sentinelTag)) sentinelSeen = true
        val hazards = singleWriterHazards(qe.executedPlan)
        captured.synchronized { captured ++= hazards }
      }
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      body
      import spark.implicits._
      val sink = java.nio.file.Files
        .createTempDirectory(sentinelTag).toString
      Seq(1L).toDF("one").write.mode("overwrite")
        .parquet(s"$sink/$sentinelTag")
      var tries = 0
      while (!sentinelSeen && tries < 200) { Thread.sleep(50); tries += 1 }
      assert(sentinelSeen, "listener bus never delivered the sentinel write")
      captured.synchronized { captured.toList }
    } finally spark.listenerManager.unregister(listener)
  }

  test("no registry write shuffles solely on its partition columns, and the allowlist is live") {
    val hazards = capturingWrites {
      SparkEntry.queries.keys.toSeq.sorted
        .foreach(q => SparkEntry.queries(q)(spark, sf).collect())
      val lshOut = java.nio.file.Files
        .createTempDirectory("lsh_layout_lint").toString + "/lsh_layout"
      graft.ops.VectorOps.writeLshLayout(spark, sf, lshOut)
    }
    val (excused, offending) =
      hazards.partition { case (t, _) => allowlisted(t).isDefined }
    assert(offending.isEmpty,
      "single-writer-per-partition-value write shape (the round-11 " +
        s"hot-day funnel) reintroduced: $offending")
    // the allowlist must be exercised, or a broken detector would pass
    // this suite while seeing nothing: q100's CTAS + INSERT both carry
    // the deliberate repartition-on-segment, and the LSH layout its
    // per-bucket writer
    assert(excused.count(_._1.contains("seg_sales")) >= 2,
      s"detector no longer sees q100's pinned segment writes: $excused")
    assert(excused.exists(_._1.contains("lsh_layout")),
      s"detector no longer sees the LSH layout write: $excused")
  }

  test("canary: the round-11 compaction shape is flagged, hash and range alike") {
    val root = java.nio.file.Files.createTempDirectory("wslint_canary").toString
    def events = Tables.events(spark, sf)
      .select(col("ts"), col("event_id"))
      .withColumn("day", to_date(col("ts")))
    val hazards = capturingWrites {
      // the exact round-11 compactSink shape
      events.repartition(col("day"))
        .write.mode("overwrite").partitionBy("day").parquet(s"$root/hash")
      // range on the partition column ALONE is the same funnel (equal
      // keys cannot split across range boundaries)
      events.repartitionByRange(8, col("day"))
        .write.mode("overwrite").partitionBy("day").parquet(s"$root/range")
      // the FIXED shape must stay clean: range on (day, ts)
      events.repartitionByRange(8, col("day"), col("ts"))
        .write.mode("overwrite").partitionBy("day").parquet(s"$root/fixed")
    }
    assert(hazards.exists(h => h._1.endsWith("/hash") && h._2.startsWith("hash")),
      s"hash-on-partition-column funnel not flagged: $hazards")
    assert(hazards.exists(h => h._1.endsWith("/range") && h._2.startsWith("range")),
      s"range-on-partition-column funnel not flagged: $hazards")
    assert(!hazards.exists(_._1.endsWith("/fixed")),
      s"false positive on the size-aware (day, ts) range shape: $hazards")
  }
}
