package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Skew-bounded joins (the "salting" entry of the scale playbook).
  *
  * A shuffle join partitions both sides by the join key, so a key
  * holding p% of the fact rows funnels p% of the corpus through ONE
  * task — parallelism cannot help, and at 100 TB the task OOMs or
  * straggles the stage. Language is the canonical example in a web
  * corpus: `en` alone is ~half the rows, and lang cardinality (~10²)
  * is far below any useful parallelism.
  *
  * `saltedJoin` bounds the max task deterministically: the fact side
  * gets a salt in [0, S) from a hash of a high-cardinality column, the
  * dimension side is replicated S ways, and the join key becomes
  * (key, salt) — the hot key's rows spread over S tasks, results
  * identical to the unsalted join by construction. This is the STATIC
  * remedy; the engine also leans on AQE's runtime skew-join split
  * (spark.sql.adaptive.skewJoin) for skew discovered at run time, and
  * on plain `broadcast()` when the dimension fits an executor (q03 and
  * every board query do). Salting is for the remaining case: dimension
  * too big to broadcast AND fact keys skewed — or, as here, key
  * cardinality itself below the cluster's parallelism.
  */
object SkewOps {

  /** Equi-join `fact ⋈ dim` on `key` with the fact's rows split S ways
    * by a deterministic salt of `saltBy`. Result = the plain join
    * (salt dropped); max task input = largest-key-rows / S. The dim
    * side carries a merge hint so the demo exercises the shuffle-join
    * path salting exists for (without it Catalyst would broadcast a
    * small dim and the salt would be dead weight). */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      salts: Int, saltBy: Column): DataFrame = {
    val saltedFact = fact.withColumn("_salt",
      pmod(xxhash64(saltBy), lit(salts.toLong)).cast("int"))
    val explodedDim = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(explodedDim.hint("merge"), Seq(key, "_salt"))
      .drop("_salt")
  }

  // ---------------------------------------------------------------- q58
  /** q58 — per-document deviation from its language's token-count
    * profile (the per-language outlier screen of a curation pipeline),
    * computed through `saltedJoin` on the skewed `lang` key: the
    * profile is the dimension, every `en` document no longer lands in
    * one task. Output is integer-scaled (floor ×100), oracle = the
    * identical unsalted join. */
  def q58SkewJoin(spark: SparkSession, dir: String): DataFrame = {
    val fact = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        size(filter(split(col("text"), " "), t => t =!= lit("")))
          .cast("long").as("n_tok"))
    val profile = fact.groupBy("lang").agg(avg(col("n_tok")).as("avg_tok"))
    saltedJoin(fact, profile, "lang", salts = 8, saltBy = col("doc_id"))
      .withColumn("avg_x100", floor(lit(100) * col("avg_tok")))
      .withColumn("dev_x100",
        floor(lit(100) * (col("n_tok") - col("avg_tok"))))
      .select(col("doc_id"), col("lang"), col("n_tok"),
        col("avg_x100"), col("dev_x100"))
      .orderBy("doc_id")
  }
}
