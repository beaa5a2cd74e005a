package graft

import org.apache.spark.sql.functions._
import graft.ops.SkewOps

class SkewOpsSpec extends SparkSpecBase {

  test("q58: salted join equals the plain join, row for row") {
    val got = SparkEntry.queries("q58_skew_join")(spark, sf).collect()
    assert(got.nonEmpty)
    val fact = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"),
        size(filter(split(col("text"), " "), t => t =!= lit("")))
          .cast("long").as("n_tok"))
    val profile = fact.groupBy("lang").agg(avg(col("n_tok")).as("avg_tok"))
    val plain = fact.join(profile, "lang")
      .withColumn("avg_x100", floor(lit(100) * col("avg_tok")))
      .withColumn("dev_x100",
        floor(lit(100) * (col("n_tok") - col("avg_tok"))))
      .select(col("doc_id"), col("lang"), col("n_tok"),
        col("avg_x100"), col("dev_x100"))
      .orderBy("doc_id").collect()
    assert(got.map(_.toSeq).toSeq == plain.map(_.toSeq).toSeq)
  }

  test("q58: the salt reaches the physical join keys (no broadcast)") {
    val df = SparkEntry.queries("q58_skew_join")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    // the profile join must be a shuffle join keyed on (lang, _salt) —
    // a BroadcastHashJoin on lang alone would mean the salt was dead
    // weight and the skew demo never exercised the salted path
    assert(plan.contains("_salt"), s"salt column absent from plan:\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
      s"no shuffle join in plan:\n$plan")
  }

  test("salted fact side spreads a hot key over multiple salt buckets") {
    val fact = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"))
      .withColumn("_salt", pmod(xxhash64(col("doc_id")), lit(8L)).cast("int"))
    val buckets = fact.filter(col("lang") === "en")
      .select(countDistinct(col("_salt"))).collect()(0).getLong(0)
    assert(buckets >= 6, s"en rows landed in only $buckets salt buckets")
  }
}
