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
}
