package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.Tables

/** Structured Streaming surface (SURVEY §2.1 S6, §2.8 V11/V16): the
  * reference's per-frame event loop becomes micro-batch streams; its
  * turn-state machine becomes keyed state in flatMapGroupsWithState.
  *
  * At scale: state is partitioned by key (game_id / user_id) across
  * executors, checkpointed incrementally; watermarks bound state size
  * for the windowed aggregations. Tested with MemoryStream
  * (StreamingSpec) — the same code runs against Kafka-style sources.
  */
object Streaming {

  /** Event-time tumbling-window counts with a watermark (V16): the
    * streaming twin of q09. Append mode: a window emits once its
    * watermark passes. */
  def windowedEventCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("day"), col("event_type"), col("n_events"))

  /** Session windows per user with a 30-minute gap (V16 /
    * ui_app.cpp:66-72 frame-loop analogue). */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"),
        col("user_id"), col("n_events"))

  /** Sliding-window counts (V16): overlapping windows — each event
    * lands in windowDuration/slideDuration windows, the trend-monitor
    * shape (e.g. "events per day, refreshed every 6 hours"). Same
    * watermark-bounded state as the tumbling form. */
  def slidingEventCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 day", "6 hours"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n_events"))

  /** Stream-static enrichment join (V16 × J7): each micro-batch joins
    * the stream against a static dimension, broadcast at plan time —
    * the canonical "enrich the clickstream with dimension attributes"
    * deployment shape. Stateless: the static side is re-snapshotted
    * per batch, so dimension updates between batches are picked up and
    * no join state accumulates. */
  def enrichedStream(events: DataFrame, dim: DataFrame,
      key: String): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")

  /** Streaming exact dedup (V14 × S6): the streaming twin of q14/q47 —
    * drop events whose dedup key was already seen, with state bounded
    * by the watermark (dropDuplicatesWithinWatermark evicts keys older
    * than the horizon, so state never grows unboundedly — the property
    * that makes streaming dedup deployable over an unbounded 100 TB/day
    * feed; plain dropDuplicates on a stream would accumulate forever).
    * On a BATCH frame the same entry point degrades to dropDuplicates
    * (Spark rejects dropDuplicatesWithinWatermark outside streaming;
    * with the whole input in one "batch" the horizon spans everything,
    * so the key-set contract is identical) — q102 declares that batch
    * form under the oracle and StreamingSpec equates the two. */
  def dedupStream(events: DataFrame, keyCols: Seq[String]): DataFrame = {
    val marked = events.withWatermark("ts", "1 hour")
    if (events.isStreaming) marked.dropDuplicatesWithinWatermark(keyCols)
    else marked.dropDuplicates(keyCols)
  }

  /** Stream-STREAM interval join (V16 × J10): impressions ⋈ clicks on
    * user within an event-time window — the attribution-join deployment
    * shape. BOTH sides carry watermarks and the join condition bounds
    * event-time distance, so each side's buffered state is evicted once
    * the other side's watermark passes the window — the pair of
    * constraints that makes a stream-stream join runnable forever on an
    * unbounded feed (either one alone accumulates state without bound).
    * State is partitioned by the equi-key (user), same as a batch
    * shuffle join. */
  def attributionJoinStream(impressions: DataFrame,
      clicks: DataFrame): DataFrame =
    impressions.withWatermark("imp_ts", "30 minutes")
      .join(clicks.withWatermark("click_ts", "30 minutes"),
        expr("imp_user = click_user AND " +
          "click_ts >= imp_ts AND click_ts <= imp_ts + INTERVAL 10 MINUTES"))
      .select(col("imp_user").as("user_id"), col("imp_id"), col("click_id"),
        col("imp_ts"), col("click_ts"))

  /** q96 — the attribution join DECLARED as a batch query so the
    * streaming surface sits under the driver's DuckDB oracle: views ⋈
    * clicks per user within a 10-minute event-time window, computed by
    * the EXACT attributionJoinStream code (withWatermark is a no-op on
    * batch Datasets — Catalyst's EliminateEventTimeWatermark — so the
    * logical join is byte-identical to the deployed stream-stream
    * plan). StreamingSpec feeds the same rows through MemoryStream and
    * equates the collected stream output with this result, closing the
    * batch = stream = oracle triangle. */
  def q96StreamAttribution(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("ts"), col("user_id"), col("event_id"), col("event_type"))
    val imps = ev.filter(col("event_type") === "view")
      .select(col("ts").as("imp_ts"), col("user_id").as("imp_user"),
        col("event_id").as("imp_id"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("ts").as("click_ts"), col("user_id").as("click_user"),
        col("event_id").as("click_id"))
    attributionJoinStream(imps, clicks)
      .orderBy("user_id", "imp_id", "click_id")
  }

  /** q101 — slidingEventCounts DECLARED as a batch query (the q96
    * pattern): each event lands in 24h/6h = 4 overlapping epoch-aligned
    * windows; the EXACT streaming code runs on the batch frame
    * (withWatermark is a no-op in batch), so the oracle's hash covers
    * the deployed sliding-window plan. The DuckDB oracle rebuilds the
    * window assignment from epoch arithmetic. */
  def q101SlidingWindows(spark: SparkSession, dir: String): DataFrame =
    slidingEventCounts(
      Tables.events(spark, dir).select(col("ts"), col("event_type")))
      .orderBy("win_start", "event_type")

  /** q102 — dedupStream DECLARED as a batch query: the EXACT
    * watermarked-dedup code (dropDuplicatesWithinWatermark ≡
    * dropDuplicates on a batch frame) runs over events keyed by
    * (user_id, event_type). Only the KEY columns are emitted — the
    * non-key columns of the survivor are arrival-order-dependent in
    * both the stream and the batch form, so the deterministic (and
    * therefore oracle-checkable) contract of the operator is exactly
    * its key set. Oracle: SELECT DISTINCT. */
  def q102StreamDedup(spark: SparkSession, dir: String): DataFrame =
    dedupStream(
      Tables.events(spark, dir).select(col("ts"), col("user_id"),
        col("event_type")),
      Seq("user_id", "event_type"))
      .select(col("user_id"), col("event_type"))
      .orderBy("user_id", "event_type")

  /** q107 — windowedEventCounts (tumbling day windows) DECLARED as a
    * batch query: the last streaming aggregation shape still outside
    * the oracle. The oracle rebuilds the epoch-aligned day window with
    * date_trunc. */
  def q107TumblingWindows(spark: SparkSession, dir: String): DataFrame =
    windowedEventCounts(
      Tables.events(spark, dir).select(col("ts"), col("event_type")))
      .orderBy("day", "event_type")

  /** q108 — enrichedStream (stream-static broadcast join) DECLARED as
    * a batch query: events enriched with the customer dimension on
    * user_id (the clickstream-enrichment deployment shape; the
    * broadcast hint is identical in both forms). Left join keeps
    * unmatched events with NULL segment — the oracle mirrors with
    * COALESCE for hash-stable output. */
  def q108StreamEnrich(spark: SparkSession, dir: String): DataFrame =
    enrichedStream(
      Tables.events(spark, dir)
        .select(col("event_id"), col("user_id"), col("event_type")),
      Tables.customer(spark, dir)
        .select(col("c_custkey").as("user_id"),
          col("c_mktsegment").as("segment")),
      "user_id")
      .select(col("event_id"), col("user_id"), col("event_type"),
        coalesce(col("segment"), lit("NONE")).as("segment"))
      .orderBy("event_id")

  /** Keyed EMA state: the running average, how many ticks fed it, the
    * highest event_id folded so far (the in-order frontier), and how
    * many out-of-order ticks were rejected at that frontier. */
  case class EmaState(ema: Double, n: Long, maxId: Long, late: Long)

  /** V12 streaming form: per-user EMA smoothing as keyed state via
    * mapGroupsWithState (the one-output-per-group-per-batch sibling of
    * replayStream's flatMapGroupsWithState) — each micro-batch folds
    * the user's new ticks (ordered by event_id, the replay convention)
    * into the persisted state and emits the updated summary. The fold
    * is IDENTICAL to batch q25 (`a += (v − a) · 0.2`,
    * ui_app.cpp:242-263), so feeding the same ticks in event_id order
    * across any batch split reproduces q25's rows exactly —
    * StreamingSpec asserts that equivalence on real data.
    *
    * The batch=stream contract only holds for in-order delivery, so it
    * is ENFORCED, not assumed: the state tracks the max folded
    * event_id, and a tick arriving at or below that frontier (a
    * cross-batch replay or out-of-order straggler) is dropped and
    * counted in `EmaState.late` instead of silently folding in arrival
    * order and diverging from q25. */
  def emaStream(ticks: Dataset[(Long, Long, Double)])
    : Dataset[(Long, Long, Long)] = {
    import ticks.sparkSession.implicits._
    val rate = 0.2
    ticks.groupByKey(_._1)
      .mapGroupsWithState[EmaState, (Long, Long, Long)](
        GroupStateTimeout.NoTimeout()) {
        (user: Long, batch: Iterator[(Long, Long, Double)],
         state: GroupState[EmaState]) =>
          val prev = state.getOption.getOrElse(EmaState(0.0, 0L, Long.MinValue, 0L))
          var ema = prev.ema
          var n = prev.n
          var maxId = prev.maxId
          var late = prev.late
          batch.toSeq.sortBy(_._2).foreach { case (_, id, v) =>
            if (id <= maxId) late += 1
            else {
              ema += (v - ema) * rate
              n += 1
              maxId = id
            }
          }
          state.update(EmaState(ema, n, maxId, late))
          (user, n, math.floor(ema * 10000).toLong)
      }
  }

  /** V11 streaming form: per-game turn-state machine as keyed state.
    * Each micro-batch folds that game's new moves (ordered by seq) into
    * the persisted GameReplay state and emits the updated summary.
    * Shares Replay.GameReplay — identical semantics to batch q24. */
  def replayStream(moves: Dataset[Replay.MoveEvent])
    : Dataset[Replay.ReplaySummary] = {
    import moves.sparkSession.implicits._
    moves.groupByKey(_.game_id)
      .flatMapGroupsWithState[Replay.GameReplay, Replay.ReplaySummary](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (gameId: Int, batch: Iterator[Replay.MoveEvent],
         state: GroupState[Replay.GameReplay]) =>
          val prev = state.getOption.getOrElse(Replay.GameReplay())
          val next = batch.toSeq.sortBy(m => (m.seq, m.piece_id))
            .foldLeft(prev)(_.apply(_))
          state.update(next)
          Iterator.single(next.summary(gameId))
      }
  }

  /** Idempotent micro-batch parquet write (S5 × S6): each batch lands
    * in its OWN `batch_id=N` partition directory with mode=overwrite,
    * so a REPLAYED batch (restart after a failure between the write
    * and the checkpoint commit — the at-least-once window of
    * foreachBatch) rewrites the same directory instead of appending
    * duplicates. Overwrite-per-batch-dir upgrades foreachBatch's
    * at-least-once to exactly-once for any reader of the table root,
    * and `batch_id=` is a plain hive partition column, so readers
    * prune on it like any other. This is the continuous-ingestion
    * write path of the warehouse story (q100/q114 decide layout at
    * write time; this is the same decision under a stream). */
  def writeBatchIdempotent(batch: DataFrame, path: String, batchId: Long): Unit =
    batch.write.mode("overwrite").parquet(s"$path/batch_id=$batchId")

  /** Streaming parquet sink over writeBatchIdempotent: the deployment
    * shape for continuously ingesting an event feed into the
    * warehouse. Restart-safe via the checkpoint (StreamingSpec kills
    * and resumes it; the replayed-batch property is asserted directly
    * on writeBatchIdempotent).
    *
    * `compactEvery = K` (opt-in, 0 = off) runs [[compactSink]] inline
    * after every K-th micro-batch, so the sink self-maintains instead
    * of needing an external cron. This is SAFE against the replay
    * window by construction: the batch just written is always the max
    * live id, and non-quiesced compaction never consumes the max live
    * id (see compactSink) — a restart that replays it finds its dir
    * untouched and overwrites in place. */
  def parquetSinkStream(events: DataFrame, path: String,
      checkpoint: String, compactEvery: Int = 0, tsCol: String = "ts")
      : org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        writeBatchIdempotent(batch, path, id)
        if (compactEvery > 0 && (id + 1) % compactEvery == 0)
          compactSink(batch.sparkSession, path, tsCol)
        ()
      }
      .option("checkpointLocation", checkpoint)
      .outputMode("append").start()

  // ------------------------------------------------------- compaction
  // parquetSinkStream lands one batch_id=N directory per micro-batch;
  // at a 1-minute trigger that is ~526k directories/year — correct but
  // unreadable at warehouse scale. compactSink is the periodic batch
  // pass that folds consumed batch dirs into ONE date-partitioned epoch
  // directory (re-compacting the previous epoch forward, so epochs do
  // NOT accumulate); readSink is the union view over the single epoch
  // zone plus the not-yet-compacted live batches.

  /** Epoch commit marker, written by compactSink itself AFTER every
    * day directory (freshly written AND moved-in) is in place. We do
    * not reuse Spark's `_SUCCESS` as the commit signal: the job commit
    * fires before the move phase (so it would commit a half-merged
    * epoch), and object-store committers commonly run with
    * mapreduce.fileoutputcommitter.marksuccessfuljobs=false, which
    * would make epochs invisible forever while their sources were
    * already retired. An explicit marker has neither failure mode. */
  private val EpochCommit = "_EPOCH_COMMIT"

  /** Roll-forward manifest for the merge's move phase: lists the day
    * directories the new epoch still owes from the previous one.
    * Ordering is plan → commit → moves → plan delete → source delete,
    * so (a) an UNCOMMITTED attempt never holds moved-in days and can
    * always be discarded without loss, and (b) a COMMITTED epoch whose
    * plan still exists is complete BY REFERENCE: readers resolve each
    * planned day to whichever side of its atomic rename it is on. */
  private val MergePlan = "_MERGE_PLAN"

  private def fs(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def subdirs(spark: SparkSession, path: String, prefix: String)
      : Seq[(Long, org.apache.hadoop.fs.Path)] = {
    val f = fs(spark, path)
    val root = new org.apache.hadoop.fs.Path(path)
    if (!f.exists(root)) Seq.empty
    else f.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(prefix))
      .map(s => s.getPath.getName.stripPrefix(prefix).toLong -> s.getPath)
  }

  private def touch(f: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): Unit = f.create(p, true).close()

  /** Highest durably-committed compaction epoch (−1 if none): an epoch
    * directory counts only once its [[EpochCommit]] marker exists, so
    * a compaction that died mid-write or mid-merge is invisible to
    * readers until recovery completes or discards it. */
  private def maxEpoch(spark: SparkSession, path: String): Long = {
    val f = fs(spark, path)
    val committed = subdirs(spark, path, "epoch=").collect {
      case (id, p) if f.exists(new org.apache.hadoop.fs.Path(p, EpochCommit)) => id
    }
    if (committed.isEmpty) -1L else committed.max
  }

  /** Write the merge plan atomically: content to a temp name, then
    * rename. A torn plan must be impossible — recovery trusts the plan
    * to list EVERY day directory owed to the new epoch, and a partial
    * list would commit an epoch missing the unlisted days. */
  private def writePlan(f: org.apache.hadoop.fs.FileSystem,
      epochDir: org.apache.hadoop.fs.Path, from: Long,
      days: Seq[String]): Unit = {
    val tmp = new org.apache.hadoop.fs.Path(epochDir, s".$MergePlan.tmp")
    val out = f.create(tmp, true)
    try out.write((s"from=$from" +: days).mkString("\n").getBytes("UTF-8"))
    finally out.close()
    // Hadoop rename reports failure as `false`, not an exception — and
    // a silently missing plan would let the commit marker land with the
    // owed-day list gone (recovery would then retire the source epoch
    // and lose those days). Fail HERE, before the commit, where the
    // uncommitted attempt is still safely discardable.
    require(f.rename(tmp, new org.apache.hadoop.fs.Path(epochDir, MergePlan)),
      s"could not install merge plan under $epochDir")
  }

  private def readPlan(f: org.apache.hadoop.fs.FileSystem,
      plan: org.apache.hadoop.fs.Path): (Long, Seq[String]) = {
    val in = f.open(plan)
    val lines =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
      finally in.close()
    (lines.head.stripPrefix("from=").toLong, lines.tail.filter(_.nonEmpty))
  }

  /** Complete a committed epoch's move phase from its durable plan:
    * every listed day directory not yet present in the new epoch is
    * renamed in from the source epoch (rename is atomic, so each day is
    * on exactly one of the two sides at any instant), then the plan is
    * dropped — from that point the epoch is complete in place.
    * Idempotent: a crash mid-move is finished by the same procedure. */
  private def finishMoves(f: org.apache.hadoop.fs.FileSystem, path: String,
      epochDir: org.apache.hadoop.fs.Path): Unit = {
    val plan = new org.apache.hadoop.fs.Path(epochDir, MergePlan)
    val (from, days) = readPlan(f, plan)
    days.foreach { day =>
      val dest = new org.apache.hadoop.fs.Path(epochDir, day)
      if (!f.exists(dest)) {
        f.rename(new org.apache.hadoop.fs.Path(s"$path/epoch=$from", day), dest)
        // rename reports failure as `false`; dropping the plan anyway
        // would mark an epoch complete while a planned day sits in
        // neither location — fail loudly instead, leaving the plan in
        // place so readers keep resolving and recovery keeps retrying
        require(f.exists(dest),
          s"owed day $day found in neither epoch=$from nor $epochDir")
      }
    }
    f.delete(plan, false)
  }

  /** Fold the live `batch_id=N` directories AND the previous epoch into
    * ONE date-partitioned epoch directory `epoch=<maxN>/day=YYYY-MM-DD/`
    * and retire the sources, so the steady state is a SINGLE epoch zone
    * no matter how many compactions have run (round-10 shape minted one
    * immortal epoch per run — an 8.8k-way union plan after a year of
    * hourly compaction).
    *
    * Scale posture: re-compaction does NOT rewrite history. Only days
    * that actually received new rows are read+rewritten merged; every
    * other day directory of the previous epoch is MOVED into the new
    * epoch by a filesystem rename — O(1) per day, no data I/O — so the
    * cost of a compaction is O(new data + touched days), not O(table).
    * The rewrite shuffles once on `day` (one sized writer per day via
    * repartition); readers prune on `day=` like any hive partition.
    *
    * Input gating (the at-least-once window): a batch directory is
    * consumed only if its `_SUCCESS` marker exists — a dir the stream
    * died inside is left for the restart's replay to overwrite, never
    * folded half-written into an epoch. Additionally, unless
    * `quiesced = true`, the max live batch id is NEVER consumed even
    * when committed: it is the one batch a restart can legitimately
    * replay (checkpoint commit pending), and a replay's mode=overwrite
    * delete-then-rewrite must not race the compactor's read. Pass
    * `quiesced = true` only when the writing stream is known stopped.
    * With one writer and one compactor (the supported deployment;
    * concurrent compactors are NOT supported) every crash point is
    * recovered by the next run, and READERS stay consistent throughout:
    *
    *  - died before the commit marker → an uncommitted attempt never
    *    holds moved-in days (moves fire strictly after commit), so it
    *    is discarded wholesale; sources untouched, retry recomputes;
    *  - died after commit, mid-move → the epoch is complete BY
    *    REFERENCE: its merge plan lists the days still owed, and both
    *    recovery and readSink resolve each one to whichever side of
    *    its atomic rename it is on;
    *  - died after the moves, before the deletes → sources are durably
    *    represented; recovery retires every batch dir ≤ maxEpoch and
    *    every older epoch, and readSink (which reads only the max
    *    committed epoch) never double-counts them.
    *
    * Schema drift is additive: batches are read with mergeSchema and
    * merged across the epoch boundary with unionByName(allowMissing),
    * so a column added mid-stream survives compaction (old rows carry
    * NULL). Returns the new max epoch (unchanged if nothing to do). */
  def compactSink(spark: SparkSession, path: String,
      tsCol: String = "ts", quiesced: Boolean = false): Long = {
    val f = fs(spark, path)
    // recovery step 1: settle every epoch attempt — finish the move
    // phase of committed epochs still carrying a plan (BEFORE step 2
    // can retire their source epoch), discard uncommitted attempts
    // (which by construction hold no moved-in days)
    subdirs(spark, path, "epoch=").sortBy(_._1).foreach { case (_, p) =>
      if (!f.exists(new org.apache.hadoop.fs.Path(p, EpochCommit)))
        f.delete(p, true)
      else if (f.exists(new org.apache.hadoop.fs.Path(p, MergePlan)))
        finishMoves(f, path, p)
    }
    val before = maxEpoch(spark, path)
    // recovery step 2: older committed epochs are fully represented in
    // the max one (re-compaction folds history forward) — retire them,
    // and retire batch dirs already folded into an epoch
    subdirs(spark, path, "epoch=").foreach { case (id, p) =>
      if (id < before) f.delete(p, true)
    }
    subdirs(spark, path, "batch_id=").foreach { case (id, p) =>
      if (id <= before) f.delete(p, true)
    }
    // input selection: committed batches only, max live id held back
    // unless the writer is quiesced (see scaladoc)
    val candidates = subdirs(spark, path, "batch_id=")
    val committed = candidates.filter { case (_, p) =>
      f.exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS"))
    }
    val maxLiveId = candidates.map(_._1).maxOption
    val live =
      if (quiesced) committed
      else committed.filterNot { case (id, _) => maxLiveId.contains(id) }
    if (live.isEmpty) return before
    val epoch = live.map(_._1).max
    val epochDir = new org.apache.hadoop.fs.Path(s"$path/epoch=$epoch")
    val fresh = spark.read.option("mergeSchema", "true")
      .parquet(live.map(_._2.toString): _*)
      .withColumn("day", to_date(col(tsCol)))
    // the day list is driver-side but bounded by the CALENDAR (days
    // touched since the last compaction), not by the data volume
    val freshDays = fresh.select("day").distinct().collect()
      .map(r => s"day=${r.get(0)}").toSet
    val prevDays: Seq[(String, org.apache.hadoop.fs.Path)] =
      if (before < 0) Seq.empty
      else f.listStatus(new org.apache.hadoop.fs.Path(s"$path/epoch=$before"))
        .toSeq.filter(s => s.isDirectory && s.getPath.getName.startsWith("day="))
        .map(s => s.getPath.getName -> s.getPath)
    val (overlap, toMove) = prevDays.partition(d => freshDays.contains(d._1))
    val merged =
      if (overlap.isEmpty) fresh
      else fresh.unionByName(
        spark.read.option("basePath", s"$path/epoch=$before")
          .option("mergeSchema", "true")
          .parquet(overlap.map(_._2.toString): _*),
        allowMissingColumns = true)
    merged.repartition(col("day"))
      .write.mode("overwrite").partitionBy("day").parquet(epochDir.toString)
    // fresh+merged days are durable — record the owed moves, COMMIT
    // (readers switch to this epoch, resolving owed days via the
    // plan), then perform the moves and retire the sources
    if (toMove.nonEmpty) writePlan(f, epochDir, before, toMove.map(_._1))
    touch(f, new org.apache.hadoop.fs.Path(epochDir, EpochCommit))
    if (toMove.nonEmpty) finishMoves(f, path, epochDir)
    if (before >= 0)
      f.delete(new org.apache.hadoop.fs.Path(s"$path/epoch=$before"), true)
    live.foreach { case (_, p) => f.delete(p, true) }
    epoch
  }

  /** q115 — the ingestion path END TO END under the oracle hash: three
    * event slices land as micro-batch `batch_id=` directories (the
    * parquetSinkStream write shape), compaction runs MID-STREAM — in
    * its deployment (non-quiesced) form, so it folds batch 0 into a
    * date-partitioned epoch zone while holding back batch 1, the
    * replayable max live id — a third batch lands after, and the
    * result is read through the exactly-once union view and reduced to
    * per-day counts. The oracle is a plain day-count over `events` —
    * hash equality proves the ingest → compact → read path loses
    * nothing and duplicates nothing, with BOTH zones (epoch and live)
    * AND the held-back batch populated at read time. The sink lives in session
    * scratch (q90's convention: md5(dir) key + session token, rooted at
    * spark.graft.scratchDir or the JVM tmpdir) and is rebuilt from a
    * clean slate per invocation, so reruns are deterministic. */
  def q115StreamCompaction(spark: SparkSession, dir: String): DataFrame = {
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val root = spark.conf.getOption("spark.graft.scratchDir")
      .getOrElse(System.getProperty("java.io.tmpdir"))
    val sink = new java.io.File(new java.io.File(root, "graft_sink_scratch"),
      s"events_${key}_${graft.SessionCache.sessionToken(spark)}")
      .getAbsolutePath
    fs(spark, sink).delete(new org.apache.hadoop.fs.Path(sink), true)
    val ev = Tables.events(spark, dir)
    writeBatchIdempotent(ev.filter(pmod(col("event_id"), lit(3)) === 0), sink, 0L)
    writeBatchIdempotent(ev.filter(pmod(col("event_id"), lit(3)) === 1), sink, 1L)
    compactSink(spark, sink)
    writeBatchIdempotent(ev.filter(pmod(col("event_id"), lit(3)) === 2), sink, 2L)
    readSink(spark, sink)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"))
      .orderBy("day")
  }

  /** Exactly-once union view over the sink: the single max committed
    * epoch zone (older epochs are subsumed by re-compaction and only
    * await retirement — reading them would double-count) plus the
    * COMMITTED live batch dirs newer than it (a dir without `_SUCCESS`
    * is a write in flight; its rows arrive via the stream's replay).
    * The plan has a BOUNDED number of leaves — 1 + (batches since the
    * last compaction) — regardless of how long the sink has lived.
    * Columns are the union of the ingested schemas (additive drift:
    * rows predating a column carry NULL) PLUS `day`: on the epoch zone
    * it is the real hive partition column, so a `day` predicate prunes
    * the scan to that day's directory — the read-path payoff of the
    * date-partitioned layout; on live batches (and the rare mid-move
    * pending days) it is computed/constant so the same predicate stays
    * cheap and the view is uniform. */
  def readSink(spark: SparkSession, path: String,
      tsCol: String = "ts"): DataFrame = {
    val f = fs(spark, path)
    val cut = maxEpoch(spark, path)
    def withDay(df: DataFrame): DataFrame =
      if (df.columns.contains(tsCol))
        df.withColumn("day", to_date(col(tsCol)))
      else df.withColumn("day", lit(null).cast("date"))
    val epochParts: Seq[DataFrame] =
      if (cut < 0) Seq.empty
      else {
        val eDir = s"$path/epoch=$cut"
        val plan = new org.apache.hadoop.fs.Path(eDir, MergePlan)
        val base = spark.read.option("mergeSchema", "true").parquet(eDir)
        if (!f.exists(plan)) Seq(base)
        else {
          // the epoch committed but its move phase is incomplete: each
          // planned day lives on exactly one side of its atomic rename
          // — resolve the ones not yet moved in from the source epoch
          val (from, days) = readPlan(f, plan)
          val pending = days.filterNot(d =>
            f.exists(new org.apache.hadoop.fs.Path(eDir, d)))
          base +: pending.map(d =>
            spark.read.option("mergeSchema", "true")
              .parquet(s"$path/epoch=$from/$d")
              .withColumn("day",
                lit(java.sql.Date.valueOf(d.stripPrefix("day=")))))
        }
      }
    val liveDirs = subdirs(spark, path, "batch_id=")
      .filter { case (id, p) =>
        id > cut && f.exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS"))
      }
      .sortBy(_._1).map(_._2.toString)
    val parts = epochParts ++ liveDirs.map(d => withDay(spark.read.parquet(d)))
    require(parts.nonEmpty, s"empty sink at $path")
    parts.reduce(_.unionByName(_, allowMissingColumns = true))
  }
}
