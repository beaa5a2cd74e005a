package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental materialized-view maintenance over the streaming sink —
  * the downstream half of the warehouse story the sink's lifecycle ops
  * (ingest → compact → retain → delete → upsert) tell on the write
  * side. A pipeline that re-computes its rollups from raw rows pays
  * O(table) per refresh; at 100 TB the table is the other 99.9 % and
  * the day's delta is a handful of batch directories, so the entire
  * point of a maintained view is that a refresh costs O(delta) raw-row
  * work plus O(view) merge work — and the view, being an aggregate, is
  * orders of magnitude smaller than its source.
  *
  * The protocol (classic IVM over an append-only log, specialized to
  * the sink's commit markers):
  *
  *  - a view is DEFINED by a keyed partial aggregate whose measures
  *    are MERGEABLE ([[ViewDef]]: count/sum/min/max — the abelian
  *    combiners — plus `hll` for the non-abelian measure a rollup
  *    actually needs: distinct counts ride as HLL sketch columns,
  *    q127's discipline, merged by lossless union and estimated at
  *    read time);
  *  - each committed view GENERATION records the sink cursor
  *    ([[Streaming.sinkWatermark]] semantics) and the sink EPOCH it
  *    materializes, in a marker written temp+rename so a torn refresh
  *    is invisible (the stored-index `_GEN_COMMIT` discipline:
  *    data lands first, the marker flips visibility atomically,
  *    superseded generations are swept after);
  *  - [[refreshView]] takes the INCREMENTAL path only when it is
  *    PROVABLY sound: the sink's epoch chain since the view's recorded
  *    epoch consists solely of retained `op=compact` epochs (a
  *    compaction only re-homes batches the view may or may not have
  *    consumed; `delete`/`upsert`/`retire` epochs change content the
  *    delta stream cannot express) AND the view's cursor is still at
  *    or ahead of the compaction horizon (behind it, the per-batch
  *    delta boundaries are gone — the same refusal
  *    [[Streaming.readSinkSince]] makes). Anything unprovable — a
  *    vacuumed intermediate epoch, a legacy untagged marker — falls
  *    back to a FULL recompute, which is always correct, and the
  *    marker records which path ran (`mode=`), so an operator can see
  *    a view that keeps losing the incremental race and re-tune
  *    (refresh more often than the sink compacts — the retention
  *    contract every log-compacted feed has).
  *
  * Both paths PIN their input directory set eagerly on the driver (one
  * listing decides both the rows read and the cursor recorded), so a
  * batch committing mid-refresh can never land in the view without
  * landing in the cursor, or vice versa — the lost-update/double-count
  * races a lazy listing would have. Refreshes are serialized by a
  * create-exclusive `_VIEW_LOCK` (no automatic steal: a crashed
  * refresher's lock is released explicitly via [[breakViewLock]],
  * which is safe because an interrupted refresh left either no new
  * generation or an uncommitted one — both invisible).
  *
  * q143 puts the cycle under the DuckDB oracle hash: ingest → compact
  * → create → ingest more → incremental refresh (the query itself
  * asserts the incremental path ran) → read, hash-equal to a full
  * aggregate over the source table — proving the delta merge loses
  * nothing, double-counts nothing, and combines exactly like a
  * one-shot aggregation. ViewsSpec pins the fallback lattice (delete /
  * upsert / horizon-passed / vacuumed-chain → full), torn-generation
  * invisibility, empty-delta no-ops, and replay idempotence. */
object Views {

  /** A maintainable view definition: `partial` folds RAW rows into one
    * row per `keys` group carrying the measure columns, and
    * `combiners` says how two partial rows of the same group MERGE
    * (`sum` | `min` | `max` — `count` partials merge by `sum`). The
    * caller owns supplying the same definition at create and refresh
    * time (the view stores data and cursors, not code — the catalog
    * that maps view names to definitions is the caller's). */
  final case class ViewDef(
      keys: Seq[String],
      partial: DataFrame => DataFrame,
      combiners: Seq[(String, String)]) {
    require(keys.nonEmpty, "a view needs at least one group key")
    require(combiners.nonEmpty, "a view needs at least one measure")
    combiners.foreach { case (c, how) =>
      require(Set("sum", "min", "max", "hll").contains(how),
        s"measure $c: combiner must be sum|min|max|hll, got $how")
    }

    /** Shape fingerprint recorded in every generation marker and
      * validated at refresh: merging stored partials under a DIFFERENT
      * key set or combiner algebra would be silently wrong (a renamed
      * measure or a sum→max drift corrupts every later merge), so the
      * mismatch refuses instead. Guards the declared shape — the
      * `partial` function's internal expressions are the caller's
      * contract (the same discipline as supplying the definition
      * itself). */
    def fingerprint: String =
      keys.mkString(",") + "|" +
        combiners.map { case (c, how) => s"$c:$how" }.mkString(",")
  }

  private val ViewLock = "_VIEW_LOCK"
  private val MarkerPrefix = "_VIEW_COMMIT_"

  private def fsOf(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Every generation marker with its metadata lines. A marker is
    * installed by temp+rename, so unreadable content is infrastructure
    * corruption and fails loudly — never a guess. */
  private def markers(spark: SparkSession, viewPath: String)
      : Seq[(Long, Map[String, String])] = {
    val f = fsOf(spark, viewPath)
    val root = new org.apache.hadoop.fs.Path(viewPath)
    if (!f.exists(root)) Seq.empty
    else f.listStatus(root).toSeq.map(_.getPath.getName)
      .filter(_.startsWith(MarkerPrefix))
      .map { name =>
        val gen = name.stripPrefix(MarkerPrefix).toLong
        val in = f.open(new org.apache.hadoop.fs.Path(root, name))
        val lines =
          try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
          finally in.close()
        gen -> lines.filter(_.contains("="))
          .map { l => val i = l.indexOf('=')
            l.substring(0, i) -> l.substring(i + 1) }.toMap
      }.sortBy(_._1)
  }

  /** Committed generations minus those a later refresh's `replaces=`
    * list superseded — the crash window between a new marker and the
    * sweep serves the NEW generation (the flip is the marker). */
  private def committedGens(marks: Seq[(Long, Map[String, String])])
      : Seq[Long] = {
    val replaced = marks.flatMap(_._2.get("replaces")).flatMap(
      _.split(",").toSeq.filter(_.nonEmpty).map(_.toLong)).toSet
    marks.map(_._1).filterNot(replaced).sorted
  }

  private def withDay(df: DataFrame, tsCol: String): DataFrame =
    if (df.columns.contains(tsCol))
      df.withColumn("day", to_date(col(tsCol)))
    else df.withColumn("day", lit(null).cast("date"))

  /** The sink's retained-epoch catalog, collected — bounded by the
    * retention depth (`keepEpochs`+1 rows), never data I/O. */
  private[ops] def epochCatalog(spark: SparkSession, sink: String)
      : Seq[(Long, String, Long)] =
    Streaming.listSinkEpochs(spark, sink).collect().toSeq
      .map(r => (r.getLong(0), Option(r.getString(1)).orNull, r.getLong(2)))
      .sortBy(_._1)

  /** Is a delta-only refresh provably equivalent to a recompute?
    * Sound iff every epoch minted since the view's recorded one is
    * retained and tagged `op=compact` (content-preserving over the
    * batch log) and the view's cursor has not fallen behind the
    * compaction horizon. A missing (vacuumed) intermediate epoch or a
    * legacy untagged marker is UNPROVABLE, not assumed. */
  private[ops] def incrementalSound(catalog: Seq[(Long, String, Long)],
      e0: Long, cursor: Long): Boolean = {
    val e1 = catalog.lastOption.map(_._1).getOrElse(-1L)
    if (e1 == e0) true
    else if (e1 < e0) false
    else {
      val byId = catalog.map(t => t._1 -> t).toMap
      val chainCompact = (e0 + 1 to e1).forall(id =>
        byId.get(id).exists(_._2 == "compact"))
      chainCompact && cursor >= byId(e1)._3
    }
  }

  /** One driver-side listing pinning BOTH the rows a full recompute
    * reads and the cursor it records: the current committed epoch's
    * relation plus exactly the committed live batch dirs above its
    * watermark. */
  private[ops] def pinnedFullRead(spark: SparkSession, sink: String,
      tsCol: String): (DataFrame, Long, Long) = {
    val f = fsOf(spark, sink)
    val catalog = epochCatalog(spark, sink)
    val e1 = catalog.lastOption.map(_._1).getOrElse(-1L)
    val wm = catalog.lastOption.map(_._3).getOrElse(-1L)
    val epochPart: Option[DataFrame] =
      if (e1 < 0) None else Streaming.readEpochFrame(spark, f, sink, e1)
    val live = Streaming.subdirs(spark, sink, "batch_id=")
      .filter { case (id, p) =>
        id > wm &&
          f.exists(new org.apache.hadoop.fs.Path(p, Streaming.BatchCommit))
      }.sortBy(_._1)
    val cursor = (wm +: live.map(_._1)).max
    val parts = epochPart.toSeq ++
      live.map(d => withDay(spark.read.parquet(d._2.toString), tsCol))
    require(parts.nonEmpty,
      s"empty sink at $sink - nothing to materialize a view from")
    (parts.reduce(_.unionByName(_, allowMissingColumns = true)), cursor, e1)
  }

  /** One driver-side listing pinning the delta: committed batch dirs
    * strictly above the view's cursor, and the cursor those dirs
    * advance it to. None when the view is already current. */
  private[ops] def pinnedDelta(spark: SparkSession, sink: String, cursor: Long,
      tsCol: String): (Option[DataFrame], Long) = {
    val f = fsOf(spark, sink)
    val delta = Streaming.subdirs(spark, sink, "batch_id=")
      .filter { case (id, p) =>
        id > cursor &&
          f.exists(new org.apache.hadoop.fs.Path(p, Streaming.BatchCommit))
      }.sortBy(_._1)
    if (delta.isEmpty) (None, cursor)
    else (Some(delta.map(d => withDay(spark.read.parquet(d._2.toString), tsCol))
      .reduce(_.unionByName(_, allowMissingColumns = true))),
      delta.map(_._1).max)
  }

  /** Merge two sets of partial rows of the same view: union, re-group,
    * apply each measure's combiner. Count partials merge by sum —
    * exactly the map-side-combine algebra Spark's own partial
    * aggregation runs, which is why a chain of incremental merges is
    * provably equal to the one-shot aggregate (q143's hash). */
  private def mergePartials(stored: DataFrame, delta: DataFrame,
      vd: ViewDef): DataFrame = {
    val aggs: Seq[Column] = vd.combiners.map {
      case (c, "sum") => sum(col(c)).as(c)
      case (c, "min") => min(col(c)).as(c)
      // the non-abelian measure a rollup actually needs — distinct
      // counts — rides as an HLL sketch column (q127's discipline):
      // partials are hll_sketch_agg binaries, merge is the lossless
      // register-max union, estimate at READ time
      case (c, "hll") => hll_union_agg(col(c)).as(c)
      case (c, _)     => max(col(c)).as(c)
    }
    stored.unionByName(delta, allowMissingColumns = true)
      .groupBy(vd.keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  private def writeGen(spark: SparkSession, viewPath: String,
      rows: DataFrame, gen: Long, cursor: Long, epoch: Long, mode: String,
      replaces: Seq[Long], fp: String): Long = {
    val f = fsOf(spark, viewPath)
    val root = new org.apache.hadoop.fs.Path(viewPath)
    val dir = new org.apache.hadoop.fs.Path(root, s"gen=$gen")
    f.delete(dir, true) // a previous refresher's uncommitted attempt
    // a view is O(groups) — tiny next to its source; one writer per
    // `spark.graft.view.writePartitions` (default 1) keeps the file
    // count bounded, and a genuinely wide view (per-user keys) raises
    // the conf rather than inheriting the shuffle partitioning
    val parts = spark.conf
      .getOption("spark.graft.view.writePartitions").map(_.toInt).getOrElse(1)
    rows.repartition(parts).write.mode("overwrite").parquet(dir.toString)
    val tmp = new org.apache.hadoop.fs.Path(root, s".$MarkerPrefix$gen.tmp")
    val out = f.create(tmp, true)
    try out.write((s"cursor=$cursor\nepoch=$epoch\nmode=$mode\n" +
      s"def=$fp\nreplaces=${replaces.mkString(",")}").getBytes("UTF-8"))
    finally out.close()
    require(f.rename(tmp,
      new org.apache.hadoop.fs.Path(root, s"$MarkerPrefix$gen")),
      s"could not install view commit marker for gen $gen under $viewPath")
    // sweep superseded generations: marker first (visibility), then
    // data — idempotent, and a crash between the two leaves an
    // invisible dir the next refresh's writeGen clears
    replaces.foreach { g =>
      f.delete(new org.apache.hadoop.fs.Path(root, s"$MarkerPrefix$g"), false)
      f.delete(new org.apache.hadoop.fs.Path(root, s"gen=$g"), true)
    }
    gen
  }

  /** Serialize refreshers: create-exclusive lock file, identity-checked
    * release. No automatic steal — an interrupted refresh left nothing
    * visible, so [[breakViewLock]] is always safe and always explicit. */
  private def withViewLock[T](spark: SparkSession, viewPath: String)
      (body: => T): T = {
    val f = fsOf(spark, viewPath)
    val root = new org.apache.hadoop.fs.Path(viewPath)
    if (!f.exists(root)) f.mkdirs(root)
    val lock = new org.apache.hadoop.fs.Path(root, ViewLock)
    val token = java.util.UUID.randomUUID().toString
    val out =
      try f.create(lock, false)
      catch { case e: java.io.IOException => throw new IllegalStateException(
        s"view $viewPath is being refreshed by another maintainer " +
          s"($ViewLock present) - wait, or breakViewLock if its holder " +
          "crashed (safe: an interrupted refresh commits nothing)", e)
      }
    try out.write(token.getBytes("UTF-8")) finally out.close()
    try body
    finally {
      // release only our own lock: a broken-and-retaken lock belongs
      // to the new holder
      val held = try {
        val in = f.open(lock)
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString == token
        finally in.close()
      } catch { case _: Exception => false }
      if (held) f.delete(lock, false)
    }
  }

  /** Manual lock release after a crashed refresher (see
    * [[withViewLock]]). Returns true if a lock was removed. */
  def breakViewLock(spark: SparkSession, viewPath: String): Boolean =
    fsOf(spark, viewPath).delete(
      new org.apache.hadoop.fs.Path(viewPath, ViewLock), false)

  /** Materialize `vd` over the sink's CURRENT content into generation
    * 0 — always a full computation (there is no prior state to merge),
    * recording the pinned cursor and epoch. Refuses an already-created
    * view (a view has exactly one lineage; recreate = new path). */
  def createView(spark: SparkSession, sink: String, viewPath: String,
      vd: ViewDef, tsCol: String = "ts"): Long =
    withViewLock(spark, viewPath) {
      require(committedGens(markers(spark, viewPath)).isEmpty,
        s"view already exists at $viewPath - refreshView maintains it")
      val (rows, cursor, e1) = pinnedFullRead(spark, sink, tsCol)
      writeGen(spark, viewPath, vd.partial(rows), 0L, cursor, e1, "full",
        Seq.empty, vd.fingerprint)
    }

  /** Bring the view up to date with the sink. Returns the committed
    * generation and the path taken: `"incremental"` (delta merged),
    * `"full"` (recompute — a mutation epoch, a lost horizon race, or
    * an unprovable chain), or `"noop"` (already current — no new
    * generation minted, replay-idempotent by construction). */
  def refreshView(spark: SparkSession, sink: String, viewPath: String,
      vd: ViewDef, tsCol: String = "ts"): (Long, String) =
    withViewLock(spark, viewPath) {
      val marks = markers(spark, viewPath)
      val committed = committedGens(marks)
      require(committed.nonEmpty,
        s"no committed view at $viewPath - createView first")
      val cur = committed.max
      val meta = marks.find(_._1 == cur).get._2
      // the stored partials only merge correctly under the SHAPE they
      // were built with — a drifted key set or combiner algebra would
      // corrupt every later merge silently, so it refuses instead
      require(meta.getOrElse("def", "") == vd.fingerprint,
        s"view $viewPath was built as '${meta.getOrElse("def", "?")}' " +
          s"but this refresh supplies '${vd.fingerprint}' - a view has " +
          "one definition; create a new path for a new shape")
      val c = meta("cursor").toLong
      val e0 = meta("epoch").toLong
      val catalog = epochCatalog(spark, sink)
      if (incrementalSound(catalog, e0, c)) {
        val (deltaOpt, newCursor) = pinnedDelta(spark, sink, c, tsCol)
        deltaOpt match {
          case None => (cur, "noop")
          case Some(delta) =>
            val stored = spark.read.parquet(s"$viewPath/gen=$cur")
            val merged = mergePartials(stored, vd.partial(delta), vd)
            val e1 = catalog.lastOption.map(_._1).getOrElse(-1L)
            (writeGen(spark, viewPath, merged, cur + 1, newCursor, e1,
              "incremental", committed, vd.fingerprint), "incremental")
        }
      } else {
        val (rows, cursor, e1) = pinnedFullRead(spark, sink, tsCol)
        (writeGen(spark, viewPath, vd.partial(rows), cur + 1, cursor, e1,
          "full", committed, vd.fingerprint), "full")
      }
    }

  /** The view's current committed relation — one bounded scan of the
    * newest committed generation, never the source table. */
  def readView(spark: SparkSession, viewPath: String): DataFrame = {
    val gens = committedGens(markers(spark, viewPath))
    require(gens.nonEmpty, s"no committed view at $viewPath")
    spark.read.parquet(s"$viewPath/gen=${gens.max}")
  }

  /** One metadata row for operators ([[Streaming.describeSink]]'s
    * convention): current generation, recorded cursor/epoch, the path
    * the last refresh took, and how many generations sit on disk. */
  def viewStatus(spark: SparkSession, viewPath: String): DataFrame = {
    import spark.implicits._
    val marks = markers(spark, viewPath)
    val gens = committedGens(marks)
    require(gens.nonEmpty, s"no committed view at $viewPath")
    val meta = marks.find(_._1 == gens.max).get._2
    Seq((gens.max, meta("cursor").toLong, meta("epoch").toLong,
      meta.getOrElse("mode", null), meta.getOrElse("def", null),
      gens.size.toLong))
      .toDF("gen", "cursor", "epoch", "last_mode", "definition",
        "gens_kept")
  }

  /** The shared DETERMINISTIC preamble both view provers start from
    * (the r15 clone-on-mutate discipline, extended to q143/q146 in
    * r17 — each rep previously re-ingested and re-compacted two event
    * thirds AND re-materialized generation 0 privately, dominating
    * both queries' steady-state cost): one root holding `sink/` (event
    * thirds 0 and 1 as micro-batches, folded by a quiesced compaction)
    * and `view/` (generation 0 of `vd` over that sink, cursor/epoch
    * pinned). View markers record cursor, epoch, and definition
    * fingerprint — never a path — so a byte-identical clone of the
    * PAIR preserves the lineage exactly; the query under proof (the
    * O(delta) refresh) still runs in full on the clone every rep. */
  private def viewBase(spark: SparkSession, dir: String, name: String,
      vd: ViewDef): String =
    SharedArtifacts.once(spark, dir, name) { root =>
      val sink = s"$root/sink"
      val ev = graft.Tables.events(spark, dir)
      Streaming.writeBatchIdempotent(
        ev.filter(pmod(col("event_id"), lit(3)) === 0), sink, 0L)
      Streaming.writeBatchIdempotent(
        ev.filter(pmod(col("event_id"), lit(3)) === 1), sink, 1L)
      Streaming.compactSink(spark, sink, quiesced = true)
      createView(spark, sink, s"$root/view", vd)
    }

  private def q143Def: ViewDef = ViewDef(
    Seq("day", "event_type"),
    df => df.groupBy(col("day"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(floor(col("value") * 100).cast("long")).as("sum_cents"),
        max(floor(col("value") * 100).cast("long")).as("max_cents")),
    Seq("n_events" -> "sum", "sum_cents" -> "sum", "max_cents" -> "max"))

  /** q143 — incremental materialized-view maintenance END TO END under
    * the oracle hash (the downstream completion of the q115–q119
    * lifecycle): two event slices land as micro-batch dirs and a
    * QUIESCED [[Streaming.compactSink]] folds them into the epoch
    * zone, [[createView]] materializes a per-(day, event_type) rollup
    * — row count, exact fixed-point value sum (`floor(value·100)`
    * BIGINT per row BEFORE any aggregate, q124's discipline), max —
    * recording the sink cursor; the THIRD slice arrives as a live
    * batch; [[refreshView]] merges ONLY that delta (the query asserts
    * the incremental path ran — a silent full recompute would be a
    * correct answer that proves nothing); and [[readView]] serves the
    * result. The oracle is the same rollup stated as ONE aggregate
    * over all of `events`: hash equality proves the partial-merge
    * algebra (count/sum by sum, max by max) recombines the delta with
    * the stored partials into exactly the one-shot aggregate — nothing
    * lost, nothing double-counted, merge ≡ recompute. Scratch-path
    * convention and determinism story are q115's. */
  def q143IncrementalView(spark: SparkSession, dir: String): DataFrame = {
    val vd = q143Def
    // MUTATING consumer: clone the shared (sink, view) pair, land the
    // third slice on the clone, refresh the cloned view
    val root = SharedArtifacts.cloneTo(spark,
      viewBase(spark, dir, "ivm_base", vd),
      Streaming.scratchSink(spark, dir, "events_ivm"))
    val (sink, view) = (s"$root/sink", s"$root/view")
    val ev = graft.Tables.events(spark, dir)
    Streaming.writeBatchIdempotent(
      ev.filter(pmod(col("event_id"), lit(3)) === 2), sink, 2L)
    val (_, mode) = refreshView(spark, sink, view, vd)
    require(mode == "incremental",
      s"q143 must exercise the O(delta) path, refresh took: $mode")
    readView(spark, view)
      .select(col("day"), col("event_type"), col("n_events"),
        col("sum_cents"), col("max_cents"))
      .orderBy("day", "event_type")
  }

  /** q146 — the SKETCH-AUGMENTED incremental view (q143 × q127: the
    * rollup a warehouse actually stores, because the first question
    * every dashboard asks — distinct users — is the one measure the
    * abelian combiners can't carry): the per-day view holds an exact
    * row count AND an HLL sketch of user ids; [[refreshView]] merges
    * the delta's sketches into the stored ones by LOSSLESS register
    * union (sketch-size work, never a raw-row rescan of consumed
    * batches — at 100 TB the alternative is re-reading the table to
    * re-count distincts per refresh), and the read estimates uniques
    * from the stored binaries. The query asserts the incremental path
    * ran. Rows-only by nature (sketch estimates are engine-specific);
    * ViewsSpec gates every day's estimate against the exact
    * countDistinct inside the lgK=12 error envelope AND pins that the
    * incrementally-merged estimate equals the one-shot sketch's. */
  private def q146Def: ViewDef = ViewDef(
    Seq("day"),
    df => df.groupBy(col("day"))
      .agg(count(lit(1)).as("n_events"),
        hll_sketch_agg(col("user_id")).as("users_sk")),
    Seq("n_events" -> "sum", "users_sk" -> "hll"))

  def q146SketchView(spark: SparkSession, dir: String): DataFrame = {
    val vd = q146Def
    val root = SharedArtifacts.cloneTo(spark,
      viewBase(spark, dir, "skv_base", vd),
      Streaming.scratchSink(spark, dir, "events_skv"))
    val (sink, view) = (s"$root/sink", s"$root/view")
    val ev = graft.Tables.events(spark, dir)
    Streaming.writeBatchIdempotent(
      ev.filter(pmod(col("event_id"), lit(3)) === 2), sink, 2L)
    val (_, mode) = refreshView(spark, sink, view, vd)
    require(mode == "incremental",
      s"q146 must exercise the sketch-union path, refresh took: $mode")
    readView(spark, view)
      .select(col("day"), col("n_events"),
        hll_sketch_estimate(col("users_sk")).as("est_users"))
      .orderBy("day")
  }
}
