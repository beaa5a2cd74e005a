package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{SnapshotDiff, Streaming}

/** Semantics gates for [[graft.ops.SnapshotDiff.readSinkChanges]]: the
  * classification lattice (insert / delete / update / silent), null
  * transitions, net-change semantics across delete-then-reinsert,
  * additive drift conformance, identical-snapshot emptiness, and the
  * loud refusals (argument order, non-retained epoch). */
class SnapshotDiffSpec extends SparkSpecBase {

  import spark.implicits._

  private def mkSink(name: String,
      rows: Seq[(Long, String, Option[Long])]): String = {
    val root = java.nio.file.Files.createTempDirectory(name).toString
    val sink = s"$root/sink"
    val df = rows.toDF("k", "tss", "v")
      .withColumn("ts", col("tss").cast("timestamp")).drop("tss")
    Streaming.writeBatchIdempotent(df, sink, 0L)
    sink
  }

  private def withKeep[T](n: Int)(body: => T): T = {
    val prev = spark.conf.getOption("spark.graft.sink.keepEpochs")
    spark.conf.set("spark.graft.sink.keepEpochs", n.toString)
    try body
    finally prev match {
      case Some(v) => spark.conf.set("spark.graft.sink.keepEpochs", v)
      case None => spark.conf.unset("spark.graft.sink.keepEpochs")
    }
  }

  private def epoch(sink: String): Long =
    Streaming.listSinkEpochs(spark, sink).collect()
      .map(_.getLong(0)).foldLeft(-1L)(math.max)

  /** Manifest emission is opt-in (Delta CDF's model); the change-file
    * tests turn it on for their mutation phase. */
  private def withChangeFiles[T](body: => T): T = {
    val prev = spark.conf.getOption("spark.graft.sink.changeFiles")
    spark.conf.set("spark.graft.sink.changeFiles", "true")
    try body
    finally prev match {
      case Some(v) => spark.conf.set("spark.graft.sink.changeFiles", v)
      case None => spark.conf.unset("spark.graft.sink.changeFiles")
    }
  }

  private def diffRows(df: DataFrame): Map[Long, (String, Option[Long])] =
    df.collect().map { r =>
      r.getLong(1) -> (r.getString(0),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))
    }.toMap

  test("classification lattice: insert, delete, update, null transition, net no-op, silent unchanged") {
    withKeep(3) {
      val t = "2024-01-01 10:00:00"
      val sink = mkSink("sdiff_lattice", Seq(
        (1L, t, Some(10L)), // untouched -> silent
        (2L, t, Some(20L)), // value updated
        (3L, t, Some(30L)), // deleted, never re-created
        (4L, t, None),      // null -> value transition = update
        (6L, t, Some(60L))  // deleted then re-upserted IDENTICAL = silent
      ))
      Streaming.compactSink(spark, sink, quiesced = true)
      val e0 = epoch(sink)
      Streaming.deleteWhere(spark, sink, col("k") === 3 || col("k") === 6)
      val batch = Seq(
        (2L, t, Some(21L)),  // update
        (4L, t, Some(40L)),  // null -> value
        (5L, t, Some(50L)),  // brand-new key = insert
        (6L, t, Some(60L))   // re-creates the deleted row with identical content
      ).toDF("k", "tss", "v")
        .withColumn("ts", col("tss").cast("timestamp")).drop("tss")
      Streaming.upsertBatch(spark, sink, batch, Seq("k"))
      val out = SnapshotDiff.readSinkChanges(spark, sink, e0, epoch(sink),
        Seq("k"), Seq("v"))
      val got = diffRows(out)
      assert(got === Map(
        2L -> ("update", Some(21L)),
        3L -> ("delete", Some(30L)),
        4L -> ("update", Some(40L)),
        5L -> ("insert", Some(50L))))
    }
  }

  test("value -> null transition is an update carrying the null post-image") {
    withKeep(3) {
      val t = "2024-01-02 09:00:00"
      val sink = mkSink("sdiff_tonull", Seq((1L, t, Some(10L))))
      Streaming.compactSink(spark, sink, quiesced = true)
      val e0 = epoch(sink)
      val batch = Seq((1L, t, Option.empty[Long])).toDF("k", "tss", "v")
        .withColumn("ts", col("tss").cast("timestamp")).drop("tss")
      Streaming.upsertBatch(spark, sink, batch, Seq("k"))
      val got = diffRows(SnapshotDiff.readSinkChanges(spark, sink, e0,
        epoch(sink), Seq("k"), Seq("v")))
      assert(got === Map(1L -> ("update", None)))
    }
  }

  test("change-file path: O(churn) reads, row-identity with the snapshot join, fallback on a missing manifest") {
    withKeep(4) {
      val t = "2024-01-01 10:00:00"
      val sink = mkSink("sdiff_cdf", Seq(
        (1L, t, Some(10L)), // untouched -> silent
        (2L, t, Some(20L)), // value updated
        (3L, t, Some(30L)), // deleted, never re-created
        (4L, t, None),      // null -> value transition = update
        (6L, t, Some(60L)), // deleted then re-upserted IDENTICAL = silent
        (7L, t, Some(70L))  // updated to the same value = silent
      ))
      Streaming.compactSink(spark, sink, quiesced = true)
      val e0 = epoch(sink)
      withChangeFiles {
        Streaming.deleteWhere(spark, sink, col("k") === 3 || col("k") === 6)
        val batch = Seq(
          (2L, t, Some(21L)), (4L, t, Some(40L)), (5L, t, Some(50L)),
          (6L, t, Some(60L)), (7L, t, Some(70L))
        ).toDF("k", "tss", "v")
          .withColumn("ts", col("tss").cast("timestamp")).drop("tss")
        Streaming.upsertBatch(spark, sink, batch, Seq("k"))
      }
      val e2 = epoch(sink)
      val want = Map(
        2L -> ("update", Some(21L)),
        3L -> ("delete", Some(30L)),
        4L -> ("update", Some(40L)),
        5L -> ("insert", Some(50L)))
      // default path: served from the per-epoch change manifests - the
      // plan must never open the snapshots' data files
      val viaChanges = SnapshotDiff.readSinkChanges(spark, sink, e0, e2,
        Seq("k"), Seq("v"))
      assert(viaChanges.inputFiles.nonEmpty &&
        viaChanges.inputFiles.forall(_.contains(s"/${"_changes"}/")),
        s"change-file path read data files: " +
          viaChanges.inputFiles.filterNot(_.contains("/_changes/")).toSeq)
      assert(diffRows(viaChanges) === want)
      // forced snapshot join: identical rows, reads data files
      val prev = spark.conf.getOption("spark.graft.cdc.useChangeFiles")
      spark.conf.set("spark.graft.cdc.useChangeFiles", "false")
      try {
        val viaSnap = SnapshotDiff.readSinkChanges(spark, sink, e0, e2,
          Seq("k"), Seq("v"))
        assert(viaSnap.inputFiles.exists(!_.contains("/_changes/")),
          "forced snapshot path did not read snapshots")
        assert(diffRows(viaSnap) === want)
      } finally prev.fold(
        spark.conf.unset("spark.graft.cdc.useChangeFiles"))(
        v => spark.conf.set("spark.graft.cdc.useChangeFiles", v))
      // a range with a manifest-less epoch falls back transparently:
      // strip the delete epoch's manifest and diff again
      val f = new org.apache.hadoop.fs.Path(sink)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      assert(f.delete(new org.apache.hadoop.fs.Path(
        s"$sink/epoch=${e0 + 1}/_changes"), true),
        "no manifest to strip - the delete epoch did not record churn")
      val fellBack = SnapshotDiff.readSinkChanges(spark, sink, e0, e2,
        Seq("k"), Seq("v"))
      assert(fellBack.inputFiles.exists(!_.contains("/_changes/")),
        "diff over a stripped manifest did not fall back")
      assert(diffRows(fellBack) === want)
    }
  }

  test("change-file fold nets three-epoch event chains per key exactly like the snapshot join") {
    withKeep(5) {
      val t = "2024-01-06 09:00:00"
      val sink = mkSink("sdiff_chain", Seq(
        (1L, t, Some(10L)), // updated twice: net update to the LAST value
        (2L, t, Some(20L)), // updated then updated BACK: A->B->A = silent
        (3L, t, Some(30L)), // updated then deleted: net delete w/ ORIGINAL pre-image
        (4L, t, Some(40L))  // deleted, reinserted differently, updated: net update
      ))
      Streaming.compactSink(spark, sink, quiesced = true)
      val e0 = epoch(sink)
      def up(rows: Seq[(Long, String, Option[Long])]): Unit =
        Streaming.upsertBatch(spark, sink, rows.toDF("k", "tss", "v")
          .withColumn("ts", col("tss").cast("timestamp")).drop("tss"),
          Seq("k"))
      withChangeFiles {
        Streaming.deleteWhere(spark, sink, col("k") === 4)
        up(Seq((1L, t, Some(11L)), (2L, t, Some(21L)), (3L, t, Some(31L)),
          (4L, t, Some(41L)), (5L, t, Some(50L)))) // k=5 inserted here...
        up(Seq((1L, t, Some(12L)), (2L, t, Some(20L)), (4L, t, Some(42L))))
        Streaming.deleteWhere(spark, sink, col("k") === 3 || col("k") === 5)
        // ...and k=5 deleted again: insert-then-delete = fully silent
      }
      val eN = epoch(sink)
      assert(eN == e0 + 4, s"expected 4 minted epochs, got ${eN - e0}")
      val want = Map(
        1L -> ("update", Some(12L)),
        3L -> ("delete", Some(30L)),
        4L -> ("update", Some(42L)))
      val viaChanges = SnapshotDiff.readSinkChanges(spark, sink, e0, eN,
        Seq("k"), Seq("v"))
      assert(viaChanges.inputFiles.forall(_.contains("/_changes/")),
        "chain diff left the change-file path")
      assert(diffRows(viaChanges) === want)
      val prev = spark.conf.getOption("spark.graft.cdc.useChangeFiles")
      spark.conf.set("spark.graft.cdc.useChangeFiles", "false")
      try assert(diffRows(SnapshotDiff.readSinkChanges(spark, sink, e0, eN,
        Seq("k"), Seq("v"))) === want, "snapshot path disagreed")
      finally prev.fold(spark.conf.unset("spark.graft.cdc.useChangeFiles"))(
        v => spark.conf.set("spark.graft.cdc.useChangeFiles", v))
      // intermediate-range diff: the fold respects the requested
      // endpoints, not just the full history (k=2 HAS changed by e0+2)
      val mid = diffRows(SnapshotDiff.readSinkChanges(spark, sink, e0,
        e0 + 2, Seq("k"), Seq("v")))
      assert(mid === Map(
        1L -> ("update", Some(11L)),
        2L -> ("update", Some(21L)),
        3L -> ("update", Some(31L)),
        4L -> ("update", Some(41L)),
        5L -> ("insert", Some(50L))))
    }
  }

  test("change-file path serves across an alter-normalize epoch (empty manifest) and survives applyChanges") {
    withKeep(5) {
      val t = "2024-01-05 11:00:00"
      val root = java.nio.file.Files
        .createTempDirectory("sdiff_cdf_alter").toString
      val sink = s"$root/sink"
      val df = Seq((1L, t, Some(10L), "a"), (2L, t, Some(20L), "b"),
        (3L, t, Some(30L), "c"))
        .toDF("k", "tss", "v", "w")
        .withColumn("ts", col("tss").cast("timestamp")).drop("tss")
      Streaming.writeBatchIdempotent(df, sink, 0L)
      Streaming.compactSink(spark, sink, quiesced = true)
      val e0 = epoch(sink)
      withChangeFiles {
        Streaming.deleteWhere(spark, sink, col("k") === 3)
        // rename an unrelated column mid-range: the normalize epoch
        // records an EMPTY manifest, keeping the range on the fast path
        Streaming.alterSink(spark, sink, renames = Map("w" -> "w2"))
        Streaming.compactSink(spark, sink, quiesced = true)
        val batch = Seq((2L, t, Some(21L), "b"))
          .toDF("k", "tss", "v", "w2")
          .withColumn("ts", col("tss").cast("timestamp")).drop("tss")
        Streaming.upsertBatch(spark, sink, batch, Seq("k"))
      }
      val e3 = epoch(sink)
      assert(e3 == e0 + 3, s"expected 3 minted epochs, got ${e3 - e0}")
      val out = SnapshotDiff.readSinkChanges(spark, sink, e0, e3,
        Seq("k"), Seq("v"))
      assert(out.inputFiles.nonEmpty &&
        out.inputFiles.forall(_.contains("/_changes/")),
        "alter-crossing range left the change-file path")
      assert(diffRows(out) === Map(
        2L -> ("update", Some(21L)),
        3L -> ("delete", Some(30L))))
      // the O(churn) feed drives the replica loop end to end: apply it
      // with full-row compare columns onto a replica of the e0 state
      val rep = s"$root/rep"
      Streaming.writeBatchIdempotent(df, rep, 0L)
      Streaming.compactSink(spark, rep, quiesced = true)
      Streaming.alterSink(spark, rep, renames = Map("w" -> "w2"))
      Streaming.compactSink(spark, rep, quiesced = true)
      val feed = SnapshotDiff.readSinkChanges(spark, sink, e0, e3,
        Seq("k"), Seq("ts", "v", "w2"))
      val (nDel, nUps) = SnapshotDiff.applyChanges(spark, rep, feed, Seq("k"))
      assert(nDel == 1 && nUps == 1, s"apply moved ($nDel, $nUps)")
      val repRows = Streaming.readSink(spark, rep)
        .select("k", "v").collect().map(r => r.getLong(0) -> r.getLong(1))
        .toMap
      assert(repRows === Map(1L -> 10L, 2L -> 21L))
    }
  }

  test("insert epochs record churn BY REFERENCE: a range crossing an ingest compaction stays on the change-file path") {
    withKeep(5) {
      val t = "2024-01-07 10:00:00"
      val sink = mkSink("sdiff_byref", Seq((1L, t, Some(10L)), (2L, t, Some(20L))))
      Streaming.compactSink(spark, sink, quiesced = true)
      val e0 = epoch(sink)
      withChangeFiles {
        // second ingest: its compaction consumes batch 1 and records
        // the churn by NAME - no ingested byte is rewritten
        val b2 = Seq((3L, t, Some(30L)), (4L, t, Some(40L)))
          .toDF("k", "tss", "v")
          .withColumn("ts", col("tss").cast("timestamp")).drop("tss")
        Streaming.writeBatchIdempotent(b2, sink, 1L)
        Streaming.compactSink(spark, sink, quiesced = true)
        val up = Seq((2L, t, Some(21L))).toDF("k", "tss", "v")
          .withColumn("ts", col("tss").cast("timestamp")).drop("tss")
        Streaming.upsertBatch(spark, sink, up, Seq("k"))
      }
      val eN = epoch(sink)
      assert(eN == e0 + 2, s"expected 2 minted epochs, got ${eN - e0}")
      val f = new org.apache.hadoop.fs.Path(sink)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val refDir = new org.apache.hadoop.fs.Path(
        s"$sink/epoch=${e0 + 1}/_changes_ref/batch_id=1")
      val rootDir = new org.apache.hadoop.fs.Path(s"$sink/batch_id=1")
      assert(f.exists(refDir),
        "the consumed batch did not move under the insert epoch")
      assert(!f.exists(rootDir), "the consumed batch also stayed at root")
      val want = Map(
        2L -> ("update", Some(21L)),
        3L -> ("insert", Some(30L)),
        4L -> ("insert", Some(40L)))
      def diff(): DataFrame = SnapshotDiff.readSinkChanges(spark, sink,
        e0, eN, Seq("k"), Seq("v"))
      val viaChanges = diff()
      assert(viaChanges.inputFiles.nonEmpty &&
        viaChanges.inputFiles.forall(_.contains("/_changes")),
        s"by-ref range read data files: " +
          viaChanges.inputFiles.filterNot(_.contains("/_changes")).toSeq)
      assert(diffRows(viaChanges) === want)
      // the snapshot join agrees row for row
      val prev = spark.conf.getOption("spark.graft.cdc.useChangeFiles")
      spark.conf.set("spark.graft.cdc.useChangeFiles", "false")
      try assert(diffRows(diff()) === want, "snapshot path disagreed")
      finally prev.fold(spark.conf.unset("spark.graft.cdc.useChangeFiles"))(
        v => spark.conf.set("spark.graft.cdc.useChangeFiles", v))
      // crash window (commit landed, move did not): the reference
      // resolves from the sink root too
      assert(f.rename(refDir, rootDir), "could not stage the crash window")
      assert(diffRows(diff()) === want,
        "pre-move reference did not resolve from the root")
      // the next maintenance op FINISHES the move instead of deleting
      // the folded batch out from under the manifest
      Streaming.compactSink(spark, sink, quiesced = true)
      assert(f.exists(refDir) && !f.exists(rootDir),
        "recovery did not finish the reference move")
      assert(diffRows(diff()) === want)
      // a hand-deleted reference degrades to the snapshot join - a
      // full answer from data files, never a partial one from manifests
      assert(f.delete(refDir, true))
      val fellBack = diff()
      assert(fellBack.inputFiles.exists(!_.contains("/_changes")),
        "diff over a broken reference did not fall back")
      assert(diffRows(fellBack) === want)
    }
  }

  test("a zero-churn range (all manifests empty) serves an EMPTY diff without the snapshot join") {
    withKeep(4) {
      val t = "2024-01-08 09:00:00"
      val root = java.nio.file.Files
        .createTempDirectory("sdiff_zerochurn").toString
      val sink = s"$root/sink"
      val df = Seq((1L, t, Some(10L), "a"), (2L, t, Some(20L), "b"))
        .toDF("k", "tss", "v", "w")
        .withColumn("ts", col("tss").cast("timestamp")).drop("tss")
      Streaming.writeBatchIdempotent(df, sink, 0L)
      Streaming.compactSink(spark, sink, quiesced = true)
      val e0 = epoch(sink)
      withChangeFiles {
        // the only in-range epoch is an alter-normalize pass: rows
        // unchanged, manifest EMPTY by design
        Streaming.alterSink(spark, sink, renames = Map("w" -> "w2"))
        Streaming.compactSink(spark, sink, quiesced = true)
      }
      val e1 = epoch(sink)
      assert(e1 == e0 + 1)
      // whichever physical shape the empty manifest took (a zero-row
      // part file -> the fold serves zero events; no part files at all
      // -> the kind-only shortcut), the diff must stay off the
      // snapshot join and come back empty
      val out = SnapshotDiff.readSinkChanges(spark, sink, e0, e1,
        Seq("k"), Seq("v"))
      assert(out.columns.toSeq === Seq("change", "k", "v", "day"))
      assert(out.inputFiles.forall(_.contains("/_changes")),
        s"zero-churn diff opened data files: ${out.inputFiles.toSeq}")
      assert(out.isEmpty)
      // force the no-part-files shape (Spark often writes none for an
      // empty frame): the kind-only union must shortcut to an empty
      // TYPED frame instead of falling back to the O(table) join
      val f = new org.apache.hadoop.fs.Path(sink)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val cDir = new org.apache.hadoop.fs.Path(s"$sink/epoch=$e1/_changes")
      f.listStatus(cDir).filter(_.getPath.getName.startsWith("part-"))
        .foreach(s => f.delete(s.getPath, false))
      val out2 = SnapshotDiff.readSinkChanges(spark, sink, e0, e1,
        Seq("k"), Seq("v"))
      assert(out2.columns.toSeq === Seq("change", "k", "v", "day"))
      assert(out2.inputFiles.isEmpty,
        s"kind-only zero-churn diff opened files: ${out2.inputFiles.toSeq}")
      assert(out2.isEmpty)
    }
  }

  test("NULL diff keys refuse loudly on both serving paths") {
    withKeep(3) {
      val t = "2024-01-09 08:00:00"
      val root = java.nio.file.Files
        .createTempDirectory("sdiff_nullkey").toString
      val sink = s"$root/sink"
      val df = Seq((Some(1L), t, Some(10L)), (Option.empty[Long], t, Some(99L)))
        .toDF("k", "tss", "v")
        .withColumn("ts", col("tss").cast("timestamp")).drop("tss")
      Streaming.writeBatchIdempotent(df, sink, 0L)
      Streaming.compactSink(spark, sink, quiesced = true)
      val e0 = epoch(sink)
      withChangeFiles {
        val up = Seq((Some(2L), t, Some(20L)), (Option.empty[Long], t, Some(98L)))
          .toDF("k", "tss", "v")
          .withColumn("ts", col("tss").cast("timestamp")).drop("tss")
        Streaming.upsertBatch(spark, sink, up, Seq("k"))
      }
      val e1 = epoch(sink)
      def chain(x: Throwable): String =
        if (x == null) "" else Option(x.getMessage).getOrElse("") + chain(x.getCause)
      val fast = intercept[Exception] {
        SnapshotDiff.readSinkChanges(spark, sink, e0, e1,
          Seq("k"), Seq("v")).collect()
      }
      assert(chain(fast).contains("NULL diff key"), chain(fast).take(500))
      val prev = spark.conf.getOption("spark.graft.cdc.useChangeFiles")
      spark.conf.set("spark.graft.cdc.useChangeFiles", "false")
      try {
        val snap = intercept[Exception] {
          SnapshotDiff.readSinkChanges(spark, sink, e0, e1,
            Seq("k"), Seq("v")).collect()
        }
        assert(chain(snap).contains("NULL diff key"), chain(snap).take(500))
      } finally prev.fold(spark.conf.unset("spark.graft.cdc.useChangeFiles"))(
        v => spark.conf.set("spark.graft.cdc.useChangeFiles", v))
    }
  }

  test("a column literally named 'present' does not collide with the diff's internal markers") {
    withKeep(3) {
      // the internal presence markers used to be spelled
      // "pre_present"/"post_present" - exactly what a user column named
      // "present" prefixes to, making the full-outer join ambiguous
      // (r14 advice); the "__"-prefixed spelling can never equal a
      // prefixed user column
      val t = "2024-01-03 08:00:00"
      val root = java.nio.file.Files
        .createTempDirectory("sdiff_present").toString
      val sink = s"$root/sink"
      val df = Seq((1L, t, Some(10L)), (2L, t, Some(20L)))
        .toDF("k", "tss", "present")
        .withColumn("ts", col("tss").cast("timestamp")).drop("tss")
      Streaming.writeBatchIdempotent(df, sink, 0L)
      Streaming.compactSink(spark, sink, quiesced = true)
      val e0 = epoch(sink)
      val batch = Seq((2L, t, Some(21L)), (3L, t, Some(30L)))
        .toDF("k", "tss", "present")
        .withColumn("ts", col("tss").cast("timestamp")).drop("tss")
      Streaming.upsertBatch(spark, sink, batch, Seq("k"))
      val got = diffRows(SnapshotDiff.readSinkChanges(spark, sink, e0,
        epoch(sink), Seq("k"), Seq("present")))
      assert(got === Map(
        2L -> ("update", Some(21L)),
        3L -> ("insert", Some(30L))))
    }
  }

  test("content-identical snapshots diff to empty (an upsert that replaced rows with themselves)") {
    withKeep(3) {
      val t = "2024-01-03 08:00:00"
      val sink = mkSink("sdiff_empty", Seq((1L, t, Some(1L)), (2L, t, Some(2L))))
      Streaming.compactSink(spark, sink, quiesced = true)
      val e0 = epoch(sink)
      // replace key 2 with IDENTICAL content: a new epoch mints, the
      // content does not change - the diff must stay silent
      val batch = Seq((2L, t, Some(2L))).toDF("k", "tss", "v")
        .withColumn("ts", col("tss").cast("timestamp")).drop("tss")
      Streaming.upsertBatch(spark, sink, batch, Seq("k"))
      val e1 = epoch(sink)
      assert(e1 > e0, "the upsert must mint a new epoch")
      val out = SnapshotDiff.readSinkChanges(spark, sink, e0, e1,
        Seq("k"), Seq("v"))
      assert(out.isEmpty)
    }
  }

  test("additive drift: a column present only in the newer snapshot conforms as NULL and surfaces as updates") {
    withKeep(3) {
      val t = "2024-01-04 07:00:00"
      val sink = mkSink("sdiff_drift", Seq((1L, t, Some(1L)), (2L, t, Some(2L))))
      Streaming.compactSink(spark, sink, quiesced = true)
      val e0 = epoch(sink)
      val batch = Seq((1L, t, Some(1L), "gold")).toDF("k", "tss", "v", "tier")
        .withColumn("ts", col("tss").cast("timestamp")).drop("tss")
      Streaming.upsertBatch(spark, sink, batch, Seq("k"))
      val out = SnapshotDiff.readSinkChanges(spark, sink, e0, epoch(sink),
        Seq("k"), Seq("v", "tier"))
      val rows = out.collect().map(r =>
        (r.getString(0), r.getLong(1), r.getString(3))).toSet
      // key 1 gained tier=gold (update); key 2 untouched (pre tier null
      // conforms against post tier null -> silent)
      assert(rows === Set(("update", 1L, "gold")))
    }
  }

  test("deleteKeys removes exactly the key set; null-key rows survive (join equality)") {
    val t = "2024-02-01 12:00:00"
    val root = java.nio.file.Files.createTempDirectory("delkeys").toString
    val sink = s"$root/sink"
    val df = Seq(
      (Some(1L), t, Some(10L)), (Some(2L), t, Some(20L)),
      (Some(3L), t, Some(30L)), (Option.empty[Long], t, Some(99L)))
      .toDF("k", "tss", "v")
      .withColumn("ts", col("tss").cast("timestamp")).drop("tss")
    Streaming.writeBatchIdempotent(df, sink, 0L)
    Streaming.compactSink(spark, sink, quiesced = true)
    // the key set carries duplicates, a never-present key, and a NULL
    // key - dups collapse, misses no-op, null matches nothing
    val keys = Seq(Some(2L), Some(2L), Some(777L), Option.empty[Long])
      .toDF("k")
    Streaming.deleteKeys(spark, sink, keys, Seq("k"))
    val got = Streaming.readSink(spark, sink).select("k", "v").collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)),
        r.getLong(1))).toSet
    assert(got === Set((Some(1L), 10L), (Some(3L), 30L), (None, 99L)))
    // an all-miss key set mints no epoch
    val before = epoch(sink)
    Streaming.deleteKeys(spark, sink, Seq(888L).toDF("k"), Seq("k"))
    assert(epoch(sink) == before)
  }

  test("applyChanges converges a replica to the source and re-applying is content-idempotent") {
    withKeep(3) {
      val t = "2024-03-01 09:00:00"
      val root = java.nio.file.Files.createTempDirectory("cdcrep").toString
      val src = s"$root/src"
      val rep = s"$root/rep"
      val df = Seq((1L, t, Some(10L)), (2L, t, Some(20L)),
        (3L, t, Some(30L)), (4L, t, Some(40L)))
        .toDF("k", "tss", "v")
        .withColumn("ts", col("tss").cast("timestamp")).drop("tss")
      Seq(src, rep).foreach { s =>
        Streaming.writeBatchIdempotent(df, s, 0L)
        Streaming.compactSink(spark, s, quiesced = true)
      }
      val e0 = epoch(src)
      Streaming.deleteWhere(spark, src, col("k") === 3)
      val batch = Seq((2L, t, Some(21L)), (5L, t, Some(50L)))
        .toDF("k", "tss", "v")
        .withColumn("ts", col("tss").cast("timestamp")).drop("tss")
      Streaming.upsertBatch(spark, src, batch, Seq("k"))
      def content(sink: String): Set[String] =
        Streaming.readSink(spark, sink).select("k", "ts", "v")
          .collect().map(_.mkString("|")).toSet
      val changes = SnapshotDiff.readSinkChanges(spark, src, e0,
        epoch(src), Seq("k"), Seq("ts", "v"))
      val (nDel, nUps) = SnapshotDiff.applyChanges(spark, rep, changes,
        Seq("k"))
      assert(nDel == 1L && nUps == 2L, s"got deletes=$nDel upserts=$nUps")
      assert(content(rep) == content(src), "replica did not converge")
      // re-applying the same feed: deletes miss, upserts replace rows
      // with themselves - content unchanged
      SnapshotDiff.applyChanges(spark, rep, changes, Seq("k"))
      assert(content(rep) == content(src), "re-apply changed the replica")
    }
  }

  test("a crashed apply (deletes landed, upserts did not) converges on plain re-run") {
    withKeep(3) {
      val t = "2024-04-01 08:00:00"
      val root = java.nio.file.Files.createTempDirectory("cdccrash").toString
      val src = s"$root/src"
      val rep = s"$root/rep"
      val df = Seq((1L, t, Some(10L)), (2L, t, Some(20L)), (3L, t, Some(30L)))
        .toDF("k", "tss", "v")
        .withColumn("ts", col("tss").cast("timestamp")).drop("tss")
      Seq(src, rep).foreach { s =>
        Streaming.writeBatchIdempotent(df, s, 0L)
        Streaming.compactSink(spark, s, quiesced = true)
      }
      val e0 = epoch(src)
      Streaming.deleteWhere(spark, src, col("k") === 3)
      val batch = Seq((2L, t, Some(21L))).toDF("k", "tss", "v")
        .withColumn("ts", col("tss").cast("timestamp")).drop("tss")
      Streaming.upsertBatch(spark, src, batch, Seq("k"))
      val changes = SnapshotDiff.readSinkChanges(spark, src, e0,
        epoch(src), Seq("k"), Seq("ts", "v"))
      // "crash" after the delete half: apply only the deletes by hand
      Streaming.deleteKeys(spark, rep,
        changes.filter(col("change") === "delete").select("k"), Seq("k"))
      // plain re-run of the full apply converges the replica
      SnapshotDiff.applyChanges(spark, rep, changes, Seq("k"))
      def content(sink: String): Set[String] =
        Streaming.readSink(spark, sink).select("k", "ts", "v")
          .collect().map(_.mkString("|")).toSet
      assert(content(rep) == content(src),
        "re-run after a partial apply did not converge")
    }
  }

  test("refusals: equal/reversed epochs, non-retained epoch, column in neither snapshot") {
    withKeep(3) {
      val t = "2024-01-05 06:00:00"
      val sink = mkSink("sdiff_refuse", Seq((1L, t, Some(1L)), (2L, t, Some(2L))))
      Streaming.compactSink(spark, sink, quiesced = true)
      val e0 = epoch(sink)
      val eq = intercept[IllegalArgumentException] {
        SnapshotDiff.readSinkChanges(spark, sink, e0, e0, Seq("k"), Seq("v"))
      }
      assert(eq.getMessage.contains("must be <"))
      val missing = intercept[IllegalArgumentException] {
        SnapshotDiff.readSinkChanges(spark, sink, e0, e0 + 99,
          Seq("k"), Seq("v"))
      }
      assert(missing.getMessage.contains("not a committed retained epoch"))
      Streaming.deleteWhere(spark, sink, col("k") === 2)
      assert(epoch(sink) > e0)
      val noCol = intercept[IllegalArgumentException] {
        SnapshotDiff.readSinkChanges(spark, sink, e0, epoch(sink),
          Seq("k"), Seq("no_such_column"))
      }
      assert(noCol.getMessage.contains("neither snapshot"))
    }
  }

  test("composed: net-zero range over a crash-window reference serves from manifests; an UNRESOLVED reference forces the fallback and the empty-typed shortcut cannot mask it") {
    withKeep(6) {
      val t = "2024-01-10 10:00:00"
      val root = java.nio.file.Files
        .createTempDirectory("sdiff_composed").toString
      val sink = s"$root/sink"
      val df = Seq((1L, t, Some(10L), "a"), (2L, t, Some(20L), "b"))
        .toDF("k", "tss", "v", "w")
        .withColumn("ts", col("tss").cast("timestamp")).drop("tss")
      Streaming.writeBatchIdempotent(df, sink, 0L)
      Streaming.compactSink(spark, sink, quiesced = true)
      val e0 = epoch(sink)
      withChangeFiles {
        // insert epoch e0+1: keys 3/4 land BY REFERENCE
        val b2 = Seq((3L, t, Some(30L), "c"), (4L, t, Some(40L), "d"))
          .toDF("k", "tss", "v", "w")
          .withColumn("ts", col("tss").cast("timestamp")).drop("tss")
        Streaming.writeBatchIdempotent(b2, sink, 1L)
        Streaming.compactSink(spark, sink, quiesced = true)
        // delete epoch e0+2 removes EXACTLY the inserted cohort: the
        // full range nets to zero
        Streaming.deleteWhere(spark, sink, col("k") >= 3L)
        // alter-normalize epoch e0+3: an EMPTY manifest in range
        Streaming.alterSink(spark, sink, renames = Map("w" -> "w2"))
        Streaming.compactSink(spark, sink, quiesced = true)
      }
      val eN = epoch(sink)
      assert(eN == e0 + 3, s"expected 3 minted epochs, got ${eN - e0}")
      val f = new org.apache.hadoop.fs.Path(sink)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val refDir = new org.apache.hadoop.fs.Path(
        s"$sink/epoch=${e0 + 1}/_changes_ref/batch_id=1")
      val rootDir = new org.apache.hadoop.fs.Path(s"$sink/batch_id=1")
      // stage the commit-to-move crash window AFTER the whole build:
      // the insert epoch's reference sits un-moved at the sink root
      assert(f.rename(refDir, rootDir), "could not stage the crash window")
      def diff(from: Long, to: Long): DataFrame =
        SnapshotDiff.readSinkChanges(spark, sink, from, to,
          Seq("k"), Seq("v"))
      // net-zero + crash window + empty manifest, all in one range:
      // served from manifests (the reference resolves at the root),
      // empty BY FOLD - insert-then-delete nets to silence
      val netZero = diff(e0, eN)
      assert(netZero.inputFiles.nonEmpty && netZero.inputFiles.forall(p =>
        p.contains("/_changes") || p.contains("batch_id=")),
        s"net-zero diff opened data files: ${netZero.inputFiles
          .filterNot(p => p.contains("/_changes") || p.contains("batch_id="))
          .take(3).mkString(", ")}")
      assert(netZero.isEmpty)
      // break the reference: the whole range must FALL BACK to the
      // snapshot join (the in-range EMPTY manifest must never shortcut
      // an unresolvable range to an empty typed frame) - same answer,
      // now proven from data files
      assert(f.delete(rootDir, true))
      val fellBack = diff(e0, eN)
      assert(fellBack.inputFiles.exists(p => !p.contains("/_changes") &&
        !p.contains("batch_id=")),
        "broken-reference diff did not fall back to the snapshot join")
      assert(fellBack.isEmpty)
      // the masking probe: over (e0, e0+1] the RIGHT answer is the two
      // inserts - a short-circuit that trusted the resolvable manifests
      // while one reference dangles would report empty instead
      val inserts = diff(e0, e0 + 1)
      assert(inserts.inputFiles.exists(p => !p.contains("/_changes") &&
        !p.contains("batch_id=")),
        "insert-range diff over a broken reference did not fall back")
      assert(diffRows(inserts) === Map(
        3L -> ("insert", Some(30L)), 4L -> ("insert", Some(40L))))
    }
  }
}
