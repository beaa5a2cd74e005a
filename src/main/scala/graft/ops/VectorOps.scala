package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Similarity search over the `embeddings` table (SURVEY §2.8 V13 and
  * the LLM-pipeline mandate: brute-force cosine top-k as the exactness
  * baseline, LSH-bucketed ANN as the scale path).
  *
  * All vector math is double-precision end-to-end (the float input is
  * cast to array<double> before any arithmetic) and accumulates
  * sequentially left-to-right — the same evaluation order DuckDB's
  * list_dot_product uses — so cosine values are bit-comparable across
  * engines. Query outputs are ranks and ids, never similarity floats,
  * making the driver's value hash immune to last-ulp drift.
  */
object VectorOps {

  /** Sequential double dot product of two array<double> columns. */
  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** embeddings with v = array<double> embedding and its L2 norm. */
  private def normed(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .withColumn("v", col("embedding").cast("array<double>"))
    e.withColumn("nrm", sqrt(dot(col("v"), col("v"))))
      .select(col("vec_id"), col("label"), col("v"), col("nrm"))
  }

  // ---------------------------------------------------------------- q15
  /** q15 — brute-force cosine top-k (k=10) for probe vectors vec_id<5.
    * The probe side is tiny and broadcast; the corpus side streams —
    * at 100 TB this is exactly the "scoring pass" shape: one broadcast
    * of probes, one scan of the corpus, a per-probe top-k
    * (TakeOrderedAndProject after a partial top-k per partition). */
  def q15KnnBruteforce(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = normed(spark, dir)
    val probes = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("probe_id"), col("v").as("pv"),
        col("nrm").as("pnrm"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    e.join(broadcast(probes), col("vec_id") =!= col("probe_id"))
      .withColumn("sim", dot(col("v"), col("pv")) / (col("nrm") * col("pnrm")))
      .select(col("probe_id"), col("vec_id").as("neighbor_id"), col("sim"))
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= 10)
      .select(col("probe_id"), col("rank"), col("neighbor_id"))
      .orderBy("probe_id", "rank")
  }

  // ---------------------------------------------------------------- q33
  /** q33 — globally most-similar embedding pairs (top-20), rank output.
    * All-pairs exactness baseline for q34's bucketed candidate path.
    *
    * Shape: the corpus is ~1 MB of normalized vectors — broadcast it
    * (the same decision a broadcast hash join makes) and let each
    * partition score its own slice of left-side ids against the
    * broadcast with primitive-array loops, emitting only its local
    * top-20 (a superset of the global top-20 since each pair belongs to
    * exactly one partition). A Catalyst zip_with per pair would allocate
    * an ArrayData per dot product — 10× the CPU for no benefit. At
    * 100 TB with a big right side this becomes block-partitioned
    * matmul; the broadcast variant is correct while one side fits. */
  def q33EmbedTopkPairs(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val e = normed(spark, dir)
      .select(col("vec_id"), col("v"), col("nrm"))
      .as[(Long, Array[Double], Double)]
    // the corpus side: ~1 MB — broadcast-join scale
    val all = e.collect().sortBy(_._1)
    val bc = spark.sparkContext.broadcast(all)
    val k = 20
    val localTop = e.mapPartitions { it =>
      val vs = bc.value
      val idx = vs.iterator.map(_._1).zipWithIndex.toMap
      // min-heap on (sim asc, ids desc): the head is the worst survivor
      val heap = scala.collection.mutable.PriorityQueue
        .empty[(Double, Long, Long)](
          Ordering.by[(Double, Long, Long), (Double, Long, Long)](t =>
            (-t._1, t._2, t._3)))
      it.foreach { case (ida, va, na) =>
        var j = idx(ida) + 1
        while (j < vs.length) {
          val (idb, vb, nb) = vs(j)
          var s = 0.0
          var i = 0
          while (i < va.length) { s += va(i) * vb(i); i += 1 }
          // same expression shape as the oracle: dot / (na * nb)
          heap.enqueue((s / (na * nb), ida, idb))
          if (heap.size > k) heap.dequeue()
          j += 1
        }
      }
      heap.iterator
    }.toDF("sim", "vec_a", "vec_b")
    val w = Window.orderBy(col("sim").desc, col("vec_a"), col("vec_b"))
    localTop
      .orderBy(col("sim").desc, col("vec_a"), col("vec_b"))
      .limit(k)
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .select(col("rank"), col("vec_a"), col("vec_b"))
      .orderBy("rank")
  }

  // ---------------------------------------------------------------- q34
  /** q34 — LSH-bucketed approximate nearest neighbors (no oracle;
    * ScalaTest asserts structural properties and recall against q15).
    *
    * Random-hyperplane LSH: 4 deterministic pseudo-random hyperplanes
    * (components from splitmix64 — no RNG state), bucket = 4 sign bits.
    * Probes search only their own bucket — the candidate set is ~1/16 of
    * the corpus. At 100 TB the bucket id becomes the partition key: the
    * corpus is written bucketed, a probe touches one partition, and
    * multi-probe (flipping low-margin bits) trades recall for fan-out. */
  def q34AnnLsh(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dim = 64
    val nPlanes = 4
    val planes: Array[Array[Double]] = Array.tabulate(nPlanes) { p =>
      Array.tabulate(dim) { i =>
        // uniform in [-0.5, 0.5) from a counter-mode splitmix64
        (Hash64.splitmix64((p * dim + i).toLong) >>> 11).toDouble /
          (1L << 53).toDouble - 0.5
      }
    }
    val planesCol = array(planes.map(p => array(p.map(lit): _*)): _*)
    val bucketed = normed(spark, dir)
      .withColumn("planes", planesCol)
      .withColumn("bucket",
        aggregate(
          transform(col("planes"),
            p => when(dot(col("v"), p) >= 0, 1).otherwise(0)),
          lit(0), (acc, bit) => acc * 2 + bit))
      .select(col("vec_id"), col("v"), col("nrm"), col("bucket"))
    val probes = bucketed.filter(col("vec_id") < 5)
      .select(col("vec_id").as("probe_id"), col("v").as("pv"),
        col("nrm").as("pnrm"), col("bucket"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    bucketed.join(broadcast(probes), Seq("bucket"))
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("sim", dot(col("v"), col("pv")) / (col("nrm") * col("pnrm")))
      .select(col("probe_id"), col("vec_id").as("neighbor_id"), col("sim"))
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= 10)
      .select(col("probe_id"), col("rank"), col("neighbor_id"))
      .orderBy("probe_id", "rank")
  }
}
