package graft

import org.apache.spark.sql.functions._

/** Schema evolution over the parquet lake (S4 at warehouse life-cycle
  * scale): a column added in a later ingest generation must be
  * readable across old and new files in ONE scan — mergeSchema unions
  * the footers, old files surface the new column as null, and the
  * generation partition key keeps provenance queryable. */
class SchemaEvolutionSpec extends SparkSpecBase {

  test("mergeSchema reads two ingest generations as one evolved table") {
    val dir = new java.io.File("target/schema_evo/docs").getAbsolutePath
    val docs = Tables.documents(spark, sf)
    val n = docs.count()
    // generation 1: no quality column yet
    docs.select("doc_id", "lang")
      .write.mode("overwrite").parquet(s"$dir/gen=1")
    // generation 2: the pipeline grew a quality score
    docs.select(col("doc_id"), col("lang"),
        size(filter(split(col("text"), " "), t => t =!= lit("")))
          .cast("long").as("quality"))
      .write.mode("overwrite").parquet(s"$dir/gen=2")

    val evolved = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(evolved.columns.toSet == Set("doc_id", "lang", "quality", "gen"))
    assert(evolved.count() == 2 * n)
    // old generation surfaces the new column as null, new one filled
    assert(evolved.filter(col("gen") === 1 && col("quality").isNull)
      .count() == n)
    assert(evolved.filter(col("gen") === 2 && col("quality").isNotNull)
      .count() == n)
    // and the evolved table still aggregates as one relation
    val agg = evolved.groupBy("lang")
      .agg(count(lit(1)).as("rows"), sum(col("quality")).as("q"))
    assert(agg.collect().forall(r => r.getLong(1) > 0))
  }

  test("PERMISSIVE csv ingest quarantines malformed rows, keeps the rest") {
    val dir = new java.io.File("target/schema_evo/dirty").getAbsolutePath
    // a landing-zone file where row 3 has a non-numeric id and row 4
    // is truncated — exactly what a 100 TB ingest sees daily
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "batch.csv"),
      "doc_id,lang,n_chars\n1,en,100\n2,de,200\nbroken,fr,300\n4,es\n5,zh,500\n")
    val read = spark.read
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_bad")
      .schema("doc_id long, lang string, n_chars long, _bad string")
      .csv(dir)
      .cache() // one pass; the corrupt-record column is parse-time state
    val good = read.filter(col("_bad").isNull)
    val bad = read.filter(col("_bad").isNotNull)
    assert(good.count() == 3)
    assert(good.select(sum(col("n_chars"))).head.getLong(0) == 800L)
    // the quarantined rows carry the raw line for replay/debugging
    val badLines = bad.select("_bad").collect().map(_.getString(0)).toSet
    assert(badLines == Set("broken,fr,300", "4,es"))
    read.unpersist()
  }

  test("q124 evolves the sink schema: v1 rows surface NULL cents, v2 keeps exact values") {
    import graft.ops.Streaming
    val ev = Tables.events(spark, sf)
    val out = Streaming.q124SchemaEvolution(spark, sf).collect()
    // one output row per event_type, all rows accounted for
    val types = ev.select("event_type").distinct().count()
    assert(out.length == types)
    assert(out.map(_.getLong(1)).sum == ev.count())
    // n_cents counts EXACTLY the v2 (odd-id, non-null value) rows —
    // a zero-fill of the evolved column would inflate this
    val expectCents = ev.filter(pmod(col("event_id"), lit(2)) === 1
      && col("value").isNotNull).count()
    assert(out.map(_.getLong(2)).sum == expectCents)
    // and the sums are the exact fixed-point per-row values, re-derived
    // without the sink in the loop
    val direct = ev.filter(pmod(col("event_id"), lit(2)) === 1)
      .groupBy("event_type")
      .agg(sum(floor(col("value") * 100).cast("bigint")).as("s"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      assert(r.getLong(3) == direct.getOrElse(r.getString(0), 0L),
        s"sum_cents diverged for ${r.getString(0)}")
    }
  }

  // ---------------------------------------------------- type widening

  private def tsv(s: String) = java.sql.Timestamp.valueOf(s)

  test("widening compaction normalizes MOVED days too, not just touched ones") {
    import graft.ops.Streaming
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("widen_moved").toString
    val out = s"$root/events"
    // epoch 0: two int days
    Streaming.writeBatchIdempotent(
      Seq((tsv("2024-01-01 10:00:00"), 1L, 7),
        (tsv("2024-01-02 10:00:00"), 2L, 8))
        .toDF("ts", "event_id", "v"), out, 0L)
    assert(Streaming.compactSink(spark, out, quiesced = true) == 0L)
    // a long batch touching ONLY day 1: without normalization day 2
    // would MOVE with its int footer and poison the epoch scan
    Streaming.writeBatchIdempotent(
      Seq((tsv("2024-01-01 11:00:00"), 3L, 5000000000L))
        .toDF("ts", "event_id", "v"), out, 1L)
    assert(Streaming.compactSink(spark, out, quiesced = true) == 1L)
    // the untouched day's files were REWRITTEN to the widened type
    val day2 = spark.read.parquet(s"$out/epoch=1/day=2024-01-02").schema
    assert(day2("v").dataType ==
      org.apache.spark.sql.types.LongType,
      s"moved day kept its narrow footer: $day2")
    val got = Streaming.readSink(spark, out)
    assert(got.schema("v").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(got.select("v").as[Long].collect().sorted.toSeq ==
      Seq(7L, 8L, 5000000000L))
  }

  test("float widens to double and integral+fractional widens to double") {
    import graft.ops.Streaming
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("widen_fd").toString
    val out = s"$root/events"
    Streaming.writeBatchIdempotent(
      Seq((tsv("2024-01-01 10:00:00"), 1L, 1.5f))
        .toDF("ts", "event_id", "x"), out, 0L)
    Streaming.writeBatchIdempotent(
      Seq((tsv("2024-01-02 10:00:00"), 2L, 2.25))
        .toDF("ts", "event_id", "x"), out, 1L)
    // a third generation regresses x to int: still widenable (double)
    Streaming.writeBatchIdempotent(
      Seq((tsv("2024-01-03 10:00:00"), 3L, 4))
        .toDF("ts", "event_id", "x"), out, 2L)
    Streaming.compactSink(spark, out, quiesced = true)
    val got = Streaming.readSink(spark, out)
    assert(got.schema("x").dataType ==
      org.apache.spark.sql.types.DoubleType)
    assert(got.select("x").as[Double].collect().sorted.toSeq ==
      Seq(1.5, 2.25, 4.0))
  }

  test("an un-widenable type conflict refuses compaction loudly, naming the column") {
    import graft.ops.Streaming
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("widen_bad").toString
    val out = s"$root/events"
    Streaming.writeBatchIdempotent(
      Seq((tsv("2024-01-01 10:00:00"), 1L, 7L))
        .toDF("ts", "event_id", "v"), out, 0L)
    Streaming.writeBatchIdempotent(
      Seq((tsv("2024-01-02 10:00:00"), 2L, "seven"))
        .toDF("ts", "event_id", "v"), out, 1L)
    val e = intercept[IllegalStateException](
      Streaming.compactSink(spark, out, quiesced = true))
    assert(e.getMessage.contains("'v'") &&
      e.getMessage.contains("cannot evolve"), e.getMessage)
  }

  test("an upsert batch that widens a column refuses loudly (widening is compaction's job)") {
    import graft.ops.Streaming
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("widen_ups").toString
    val out = s"$root/events"
    Streaming.writeBatchIdempotent(
      Seq((tsv("2024-01-01 10:00:00"), 1L, 7))
        .toDF("ts", "event_id", "v"), out, 0L)
    Streaming.compactSink(spark, out, quiesced = true)
    val e = intercept[IllegalArgumentException](
      Streaming.upsertBatch(spark, out,
        Seq((tsv("2024-01-01 11:00:00"), 1L, 5000000000L))
          .toDF("ts", "event_id", "v"), Seq("event_id")))
    assert(e.getMessage.contains("'v'") &&
      e.getMessage.contains("compactSink"), e.getMessage)
  }

  test("q137 widens the sink's cents column: over-int values survive, sums exact") {
    import graft.ops.Streaming
    val ev = Tables.events(spark, sf)
    val out = Streaming.q137TypeWidening(spark, sf).collect()
    assert(out.map(_.getLong(1)).sum == ev.count())
    // max_cents must exceed int range somewhere — the proof the values
    // could not have survived in narrow storage
    assert(out.map(_.getLong(4)).max > Int.MaxValue.toLong)
    val direct = ev
      .withColumn("cents",
        when(pmod(col("event_id"), lit(2)) === 0,
          floor(col("value") * 100).cast("bigint"))
          .otherwise(floor(col("value") * 100).cast("bigint")
            + lit(3000000000L)))
      .groupBy("event_type").agg(sum("cents").as("s"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      assert(r.getLong(3) == direct(r.getString(0)),
        s"sum_cents diverged for ${r.getString(0)}")
    }
  }

  test("alterSink rename+drop: logical view conforms mixed schemas, compaction normalizes, marker clears") {
    import graft.ops.Streaming
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("alter_cycle").toString
    val out = s"$root/events"
    Streaming.writeBatchIdempotent(
      Seq((tsv("2024-01-01 10:00:00"), 1L, 10L, "x"),
        (tsv("2024-01-02 10:00:00"), 2L, 20L, "y"))
        .toDF("ts", "event_id", "v", "junk"), out, 0L)
    Streaming.compactSink(spark, out, quiesced = true)
    Streaming.alterSink(spark, out,
      renames = Map("v" -> "val2"), drops = Seq("junk"))
    // the pending alter is operator-visible through describeSink
    assert(Streaming.describeSink(spark, out).head()
      .getAs[String]("pending_alter") == "rename v->val2, drop junk")
    // a producer already on the NEW schema lands beside the old epoch
    Streaming.writeBatchIdempotent(
      Seq((tsv("2024-01-03 10:00:00"), 3L, 30L))
        .toDF("ts", "event_id", "val2"), out, 1L)
    val logical = Streaming.readSink(spark, out)
    assert(logical.columns.toSet == Set("ts", "event_id", "val2", "day"))
    assert(logical.select("val2").as[Long].collect().sorted.toSeq ==
      Seq(10L, 20L, 30L))
    // normalize physically
    Streaming.compactSink(spark, out, quiesced = true)
    val f = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!f.exists(new org.apache.hadoop.fs.Path(out, "_PENDING_ALTER")),
      "normalizing compaction must clear the alter marker")
    assert(Streaming.describeSink(spark, out).head()
      .getAs[String]("pending_alter") == null)
    // every day footer carries the new name only - including the
    // UNTOUCHED days, which must have been rewritten, not moved
    Seq("2024-01-01", "2024-01-02", "2024-01-03").foreach { d =>
      val sch = spark.read.parquet(s"$out/epoch=1/day=$d").schema.fieldNames
      assert(sch.contains("val2") && !sch.contains("v") &&
        !sch.contains("junk"), s"day $d footers: ${sch.mkString(",")}")
    }
    val physical = Streaming.readSink(spark, out)
    assert(physical.select("val2").as[Long].collect().sorted.toSeq ==
      Seq(10L, 20L, 30L))
  }

  test("alterSink with no fresh batches still normalizes via the alter-only pass") {
    import graft.ops.Streaming
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("alter_only").toString
    val out = s"$root/events"
    Streaming.writeBatchIdempotent(
      Seq((tsv("2024-02-01 10:00:00"), 1L, 5L))
        .toDF("ts", "event_id", "v"), out, 0L)
    val e0 = Streaming.compactSink(spark, out, quiesced = true)
    Streaming.alterSink(spark, out, renames = Map("v" -> "w"))
    val e1 = Streaming.compactSink(spark, out, quiesced = true)
    assert(e1 == e0 + 1, "alter-only compaction must mint a normalize epoch")
    val f = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!f.exists(new org.apache.hadoop.fs.Path(out, "_PENDING_ALTER")))
    val sch = spark.read.parquet(s"$out/epoch=$e1/day=2024-02-01")
      .schema.fieldNames
    assert(sch.contains("w") && !sch.contains("v"))
    assert(Streaming.readSink(spark, out).select("w").as[Long]
      .collect().toSeq == Seq(5L))
    // idempotence of the crash window: a stale marker whose rename
    // source is already gone re-applies as a no-op and clears
    val outS = f.create(new org.apache.hadoop.fs.Path(out, "_PENDING_ALTER"), true)
    outS.write("rename v w".getBytes("UTF-8")); outS.close()
    assert(Streaming.readSink(spark, out).columns.contains("w"))
    Streaming.compactSink(spark, out, quiesced = true)
    assert(!f.exists(new org.apache.hadoop.fs.Path(out, "_PENDING_ALTER")))
    assert(Streaming.readSink(spark, out).select("w").as[Long]
      .collect().toSeq == Seq(5L))
  }

  test("alterSink refusals: reserved/missing/colliding columns, stacked alters, pending-alter mutation ops") {
    import graft.ops.Streaming
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("alter_refuse").toString
    val out = s"$root/events"
    Streaming.writeBatchIdempotent(
      Seq((tsv("2024-03-01 10:00:00"), 1L, 5L, 6L))
        .toDF("ts", "event_id", "v", "w"), out, 0L)
    Streaming.compactSink(spark, out, quiesced = true)
    def refuse(msg: String)(body: => Unit): Unit = {
      val e = intercept[IllegalArgumentException](body)
      assert(e.getMessage.contains(msg), e.getMessage)
    }
    refuse("reserved")(Streaming.alterSink(spark, out,
      renames = Map("ts" -> "t2")))
    refuse("reserved")(Streaming.alterSink(spark, out, drops = Seq("day")))
    refuse("not in the")(Streaming.alterSink(spark, out,
      renames = Map("nope" -> "x")))
    refuse("already exists")(Streaming.alterSink(spark, out,
      renames = Map("v" -> "w")))
    refuse("not in the")(Streaming.alterSink(spark, out, drops = Seq("nope")))
    refuse("both renamed and dropped")(Streaming.alterSink(spark, out,
      renames = Map("v" -> "v2"), drops = Seq("v")))
    Streaming.alterSink(spark, out, renames = Map("v" -> "v2"))
    refuse("already pending")(Streaming.alterSink(spark, out,
      drops = Seq("w")))
    refuse("alter is pending")(Streaming.deleteWhere(spark, out,
      col("event_id") === 1L))
    refuse("alter is pending")(Streaming.upsertBatch(spark, out,
      Seq((tsv("2024-03-01 11:00:00"), 1L, 9L, 6L))
        .toDF("ts", "event_id", "v", "w"), Seq("event_id")))
    // a part carrying BOTH the old and new name is ambiguous
    Streaming.writeBatchIdempotent(
      Seq((tsv("2024-03-02 10:00:00"), 2L, 1L, 2L, 3L))
        .toDF("ts", "event_id", "v", "v2", "w"), out, 1L)
    refuse("ambiguous")(Streaming.readSink(spark, out).collect())
  }
}
