package graft

import org.apache.spark.sql.functions._

class VectorOpsSpec extends SparkSpecBase {

  test("q15: 10 ranked neighbors per probe, no self-matches") {
    val rows = SparkEntry.queries("q15_knn_bruteforce")(spark, sf).collect()
    val perProbe = rows.groupBy(_.getLong(0))
    assert(perProbe.keySet == Set(0L, 1L, 2L, 3L, 4L))
    perProbe.foreach { case (probe, g) =>
      assert(g.length == 10)
      assert(g.map(_.getLong(1)).sorted.sameElements(1L to 10L))
      assert(!g.map(_.getLong(2)).contains(probe))
    }
  }

  test("q15 brute force agrees with a driver-side exact computation") {
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d, na, nb = 0.0
      var i = 0
      while (i < a.length) { d += a(i)*b(i); na += a(i)*a(i); nb += b(i)*b(i); i += 1 }
      d / math.sqrt(na * nb)
    }
    val expected = (0L to 4L).flatMap { p =>
      vecs.toSeq.filter(_._1 != p)
        .map { case (id, v) => (id, cos(vecs(p), v)) }
        .sortBy { case (id, s) => (-s, id) }
        .take(10).zipWithIndex
        .map { case ((id, _), i) => (p, (i + 1).toLong, id) }
    }.toSet
    val got = SparkEntry.queries("q15_knn_bruteforce")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected)
  }

  test("q33: 20 globally-ranked pairs, a < b") {
    val rows = SparkEntry.queries("q33_embed_topk_pairs")(spark, sf).collect()
    assert(rows.length == 20)
    assert(rows.map(_.getLong(0)).sameElements(1L to 20L))
    rows.foreach(r => assert(r.getLong(1) < r.getLong(2)))
  }

  test("q34 ANN: <= 10 neighbors per probe, all from the probe's bucket") {
    val rows = SparkEntry.queries("q34_ann_lsh")(spark, sf).collect()
    assert(rows.nonEmpty)
    val perProbe = rows.groupBy(_.getLong(0))
    perProbe.values.foreach { g =>
      assert(g.length <= 10)
      val ranks = g.map(_.getLong(1)).sorted
      assert(ranks.sameElements(1L to ranks.length))
    }
    // ANN results overlap the exact top-10 somewhere (weak recall bound —
    // random embeddings have no cluster structure, LSH recall is modest)
    val exact = SparkEntry.queries("q15_knn_bruteforce")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val approx = rows.map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(approx.intersect(exact).nonEmpty)
  }

  test("q35 multimodal: per-kind stats with real byte counts") {
    val rows = SparkEntry.queries("q35_multimodal_features")(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSet == Set("image", "audio", "video"))
    rows.foreach { r =>
      assert(r.getLong(1) > 0)
      assert(r.getLong(2) > 0)
    }
  }
}
