package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** File-format fidelity surface (S4/S5 extension): the engine's
  * non-parquet ingestion paths, proven by roundtrip — write the corpus
  * out in the interchange format, read it back with an explicit schema,
  * and aggregate; the DuckDB oracle computes the same aggregate from
  * the original parquet, so any loss of fidelity (quoting, escaping,
  * type coercion, null handling) breaks the hash match.
  *
  * Scale posture: format conversion is a map-only job (no shuffle —
  * each task writes/reads its own files), and the verification
  * aggregate is an ordinary partial+final hash agg. At 100 TB this is
  * exactly how an ingest-from-CSV landing zone behaves.
  */
object FormatOps {

  // ---------------------------------------------------------------- q68
  /** q68 — CSV sink + source roundtrip over `documents`, verified by a
    * per-language aggregate (doc count, token count, char count) that
    * the oracle computes straight from parquet. Header on, explicit
    * read schema (no inference pass at scale), default quoting — the
    * hash match is the proof that the CSV path is byte-faithful. */
  /** Scratch dir for roundtrip files: under the build's target/ (CWD
    * is the repo root for every harness main), keyed by the source dir
    * so scales never collide. */
  private def scratch(kind: String, dir: String): String =
    new java.io.File("target/fmt_roundtrip",
      kind + "_" + Integer.toHexString(dir.hashCode)).getAbsolutePath

  def q68CsvRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val out = scratch("csv", dir)
    Tables.documents(spark, dir)
      .select("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").option("header", "true").csv(out)
    spark.read
      .option("header", "true")
      .schema("doc_id long, text string, lang string, source string, n_chars long")
      .csv(out)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(filter(split(col("text"), " "), t => t =!= lit(""))))
          .cast("bigint").as("n_tokens"),
        sum(length(col("text"))).cast("bigint").as("n_text_chars"))
      .orderBy("lang")
  }

  // ---------------------------------------------------------------- q76
  /** q76 — ORC sink + source roundtrip (the columnar interchange twin
    * of q68's CSV): write the corpus as ORC, read it back with an
    * explicit schema, aggregate per SOURCE (doc count, token count,
    * char sum over the n_chars column — so both string and integer
    * fidelity sit under the hash); the oracle computes the same
    * aggregate from the original parquet. */
  def q76OrcRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val out = scratch("orc", dir)
    Tables.documents(spark, dir)
      .select("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").orc(out)
    spark.read
      .schema("doc_id long, text string, lang string, source string, n_chars long")
      .orc(out)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(filter(split(col("text"), " "), t => t =!= lit(""))))
          .cast("bigint").as("n_tokens"),
        sum(col("n_chars")).cast("bigint").as("sum_chars"))
      .orderBy("source")
  }

  /** JSON-lines twin of q68 — same write/read-back/aggregate contract
    * over the JSONL sink+source (ScalaTest-verified against the direct
    * parquet aggregate; not a declared query only to keep the bench
    * summary line inside the result collector's bounded stdout tail). */
  def jsonlRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val out = scratch("jsonl", dir)
    Tables.documents(spark, dir)
      .select("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").json(out)
    spark.read
      .schema("doc_id long, text string, lang string, source string, n_chars long")
      .json(out)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(filter(split(col("text"), " "), t => t =!= lit(""))))
          .cast("bigint").as("n_tokens"),
        sum(length(col("text"))).cast("bigint").as("n_text_chars"))
      .orderBy("lang")
  }
}
