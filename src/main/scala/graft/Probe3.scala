package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: stage-by-stage timing of q27's pipeline. */
object Probe3 {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.graft.cacheTables", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[p3] $label%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($r)")
    }
    val toks = filter(split(col("text"), " "), t => t =!= lit(""))
    val t = col("t")
    val shingles = when(size(t) >= 3,
      array_distinct(transform(sequence(lit(1), size(t) - 2), i =>
        concat_ws(" ", element_at(t, i), element_at(t, i + 1),
          element_at(t, i + 2)))))
      .otherwise(array().cast("array<string>"))
    for (rep <- 1 to 2) {
      val docs = Tables.documents(spark, dir).withColumn("t", toks)
        .withColumn("sh", shingles).filter(size(col("sh")) > 0)
        .select(col("doc_id"), col("sh"))
      time(s"r$rep shingle arrays")(docs.count())
      val inv = docs.select(col("doc_id"), explode(col("sh")).as("s"))
      time(s"r$rep inverted index")(inv.count())
      val pairs = inv.as("x").join(inv.as("y"),
          col("x.s") === col("y.s") && col("x.doc_id") < col("y.doc_id"))
        .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("n_inter"))
      time(s"r$rep pair counts")(pairs.count())
      val sizes = docs.select(col("doc_id"), size(col("sh")).as("n_sh"))
      val joined = pairs
        .join(sizes.withColumnRenamed("doc_id", "doc_a")
          .withColumnRenamed("n_sh", "na"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b")
          .withColumnRenamed("n_sh", "nb"), "doc_b")
        .withColumn("n_union", col("na") + col("nb") - col("n_inter"))
      time(s"r$rep size joins")(joined.count())
      time(s"r$rep topk")(joined
        .orderBy((col("n_inter") / col("n_union")).desc, col("doc_a"), col("doc_b"))
        .limit(50).count())
    }
    spark.stop()
  }
}
