package graft

import org.apache.spark.sql.functions._

/** Round-5 query surface: statistical profile, distribution ranks,
  * fuzzy linkage, parse-join, histogram, bigram LM, MAD outliers.
  * The oracle gate covers value-exactness; these specs assert the
  * structural invariants and cross-check the nontrivial math against
  * driver-side exact recomputations at sf0.001. */
class Round5QueriesSpec extends SparkSpecBase {

  test("q60: one row per return flag; counts partition lineitem; avg is exact") {
    val rows = SparkEntry.queries("q60_stats_profile")(spark, sf).collect()
    assert(rows.map(_.getString(0)).sorted.sameElements(Array("A", "N", "R")))
    val li = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_quantity")).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    assert(rows.map(_.getLong(1)).sum == li.length)
    val byFlag = li.groupBy(_._1)
    rows.foreach { r =>
      val g = byFlag(r.getString(0)).map(_._2)
      assert(r.getLong(1) == g.length)
      assert(r.getLong(5) == math.floor(100.0 * g.sum / g.length).toLong)
    }
  }

  test("q61: every customer ranked; deciles balanced; rank ratios bounded") {
    val rows = SparkEntry.queries("q61_ntile_deciles")(spark, sf).collect()
    val nCust = Tables.customer(spark, sf).count()
    assert(rows.length == nCust)
    rows.groupBy(_.getString(0)).values.foreach { seg =>
      val sizes = seg.groupBy(_.getLong(2)).map(_._2.length)
      assert(sizes.max - sizes.min <= 1) // ntile balance property
      seg.foreach { r =>
        assert(r.getLong(2) >= 1 && r.getLong(2) <= 10)
        assert(r.getLong(3) >= 0 && r.getLong(3) <= 10000)
        assert(r.getLong(4) > 0 && r.getLong(4) <= 10000)
      }
    }
  }

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
      if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("q62: pairs share the noun, distances exact, counts cover the block") {
    val rows = SparkEntry.queries("q62_fuzzy_names")(spark, sf).collect()
    assert(rows.nonEmpty)
    val counts = Tables.part(spark, sf).groupBy("p_name").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      assert(a < b)
      assert(a.split(" ")(1) == b.split(" ")(1)) // blocking key respected
      assert(r.getLong(2) == lev(a, b).toLong)
      assert(r.getLong(2) <= 4)
      assert(r.getLong(3) == counts(a) && r.getLong(4) == counts(b))
    }
  }

  test("q63: parsed ids reconstruct the orders↔customer join exactly") {
    val rows = SparkEntry.queries("q63_name_parse_join")(spark, sf).collect()
    val nOrders = Tables.orders(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum == nOrders) // every order has a valid cid
    assert(rows.length == 5) // one row per market segment
  }

  test("q64: 20 bins cover all orders; bin totals consistent") {
    val rows = SparkEntry.queries("q64_histogram")(spark, sf).collect()
    assert(rows.map(_.getLong(0)).forall(b => b >= 0 && b <= 19))
    assert(rows.map(_.getLong(1)).sum == Tables.orders(spark, sf).count())
    rows.foreach(r => assert(r.getDouble(2) > 0))
  }

  test("q65: per-prefix ranks are 1..k and probabilities non-increasing") {
    val rows = SparkEntry.queries("q65_bigram_lm")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).values.foreach { g =>
      val sorted = g.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).sameElements(1L to sorted.length))
      val ps = sorted.map(_.getLong(4))
      assert(ps.zip(ps.tail).forall { case (x, y) => x >= y })
      ps.foreach(p => assert(p >= 0 && p <= 10000))
    }
  }

  test("q120 equals a driver-side exact surprisal recomputation") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val bigrams = docs.flatMap { case (id, text) =>
      val t = text.split(" ").filter(_.nonEmpty)
      t.zip(t.drop(1)).map(p => (id, p))
    }
    val c2 = bigrams.groupBy(_._2).map { case (p, g) => p -> g.length.toLong }
    val c1 = c2.groupBy(_._1._1).map { case (w1, g) => w1 -> g.values.sum }
    val expected = bigrams
      .map { case (id, p) =>
        (id, math.floor(10000.0 * math.log(c1(p._1).toDouble / c2(p))).toLong)
      }
      .groupBy(_._1).map { case (id, g) =>
        val total = g.map(_._2).sum
        (id, g.length.toLong, total,
          math.floor(total.toDouble / g.length).toLong)
      }
      .toSeq.sortBy(t => (-t._4, t._1)).take(20)
    val got = SparkEntry.queries("q120_perplexity_filter")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expected,
      s"engine top-20 diverges from the exact recomputation:\n$got\nvs\n$expected")
  }

  test("q66 agrees with a driver-side exact median/MAD recomputation") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).split(" ").count(_.nonEmpty).toLong))
    def median(xs: Seq[Long]): Double = {
      val s = xs.sorted
      if (s.length % 2 == 1) s(s.length / 2).toDouble
      else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
    }
    val expected = docs.groupBy(_._2).toSeq.flatMap { case (lang, g) =>
      val med = median(g.map(_._3).toSeq)
      val mad = median(g.map(d => math.abs(d._3 - med))
        .map(x => (x * 2).toLong).toSeq) / 2.0 // halves stay exact
      g.filter(d => math.abs(d._3 - med) > 2 * mad)
        .map(d => (d._1, lang, d._3,
          (10 * med).toLong, (10 * mad).toLong))
    }.toSet
    val got = SparkEntry.queries("q66_token_outliers")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got == expected)
  }

  test("q67 agrees with a driver-side exact shingle recomputation") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ").filter(_.nonEmpty)))
    val expected = docs.filter(_._2.length >= 3).map { case (id, t) =>
      val counts = t.sliding(3).map(_.mkString(" ")).toSeq
        .groupBy(identity).map(_._2.length.toLong).toSeq
      val nSh = counts.sum
      (id, nSh,
        math.floor(10000.0 * (nSh - counts.length) / nSh).toLong,
        math.floor(10000.0 * counts.max / nSh).toLong)
    }.toSet
    val got = SparkEntry.queries("q67_repetition")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected)
  }

  test("q68 CSV roundtrip aggregate equals the direct parquet aggregate") {
    val direct = Tables.documents(spark, sf)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(filter(split(col("text"), " "), t => t =!= lit(""))))
          .cast("bigint").as("n_tokens"),
        sum(length(col("text"))).cast("bigint").as("n_text_chars"))
      .orderBy("lang").collect().toSeq
    val viaCsv = SparkEntry.queries("q68_csv_roundtrip")(spark, sf)
      .collect().toSeq
    assert(viaCsv == direct)
  }

  test("q69: exactly 10 per language, the 10 smallest md5(doc_id)") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String): String =
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = Tables.documents(spark, sf)
      .select(col("lang"), col("doc_id")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val expected = docs.groupBy(_._1).toSeq.flatMap { case (lang, g) =>
      g.map(_._2).sortBy(id => (md5hex(id.toString), id)).take(10)
        .zipWithIndex.map { case (id, i) => (lang, (i + 1).toLong, id) }
    }.toSet
    val got = SparkEntry.queries("q69_hash_sample")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected)
  }

  test("q70: marginals sum to the full cross; markers label each set") {
    val rows = SparkEntry.queries("q70_grouping_sets")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    val cross = rows.filter(r => r._3 == 0 && r._4 == 0)
    val byStatus = rows.filter(r => r._3 == 0 && r._4 == 1)
    val byPrio = rows.filter(r => r._3 == 1 && r._4 == 0)
    assert(cross.nonEmpty && byStatus.nonEmpty && byPrio.nonEmpty)
    assert(cross.length + byStatus.length + byPrio.length == rows.length)
    val total = Tables.orders(spark, sf).count()
    assert(byStatus.map(_._5).sum == total)
    assert(byPrio.map(_._5).sum == total)
    assert(cross.map(_._5).sum == total)
    // each marginal's count equals the sum of its cross-cells
    byStatus.foreach { m =>
      assert(m._5 == cross.filter(_._1 == m._1).map(_._5).sum)
    }
  }

  test("q71: int8 quantization keeps recall@10 >= 0.9 vs exact q15") {
    def sets(name: String) =
      SparkEntry.queries(name)(spark, sf).collect()
        .map(r => (r.getLong(0), r.getLong(2)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = sets("q15_knn_bruteforce")
    val quant = sets("q71_quantized_knn")
    assert(quant.keySet == exact.keySet)
    exact.foreach { case (probe, nbrs) =>
      val recall = quant(probe).intersect(nbrs).size.toDouble / nbrs.size
      assert(recall >= 0.9, s"probe $probe recall $recall")
    }
  }

  test("int8 reconstruction error is bounded by scale/2 per coordinate") {
    val rows = Tables.embeddings(spark, sf)
      .select(col("embedding").cast("array<double>")).limit(100).collect()
      .map(_.getSeq[Double](0).toArray)
    rows.foreach { v =>
      val scale = v.map(math.abs).max / 127
      v.foreach { x =>
        val dq = math.round(x / scale).toDouble * scale
        assert(math.abs(dq - x) <= scale / 2 + 1e-12)
        assert(math.abs(math.round(x / scale)) <= 127)
      }
    }
  }

  test("q72: the trigram-index route equals the full-scan predicate") {
    val expected = Tables.documents(spark, sf)
      .filter(col("text").contains("hash join"))
      .select(col("doc_id"), col("lang")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(expected.nonEmpty)
    val got = SparkEntry.queries("q72_substring_search")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == expected)
  }

  test("q73 equals a driver-side all-pairs hamming recomputation") {
    val sigs = ops.TextOps.simhashSigs(Tables.documents(spark, sf))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expected = (for {
      (a, sa) <- sigs; (b, sb) <- sigs if a < b
      d = java.lang.Long.bitCount(sa ^ sb) if d <= 3
    } yield (a, b, d.toLong)).toSet
    assert(expected.nonEmpty)
    val got = SparkEntry.queries("q73_simhash_near_pairs")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected) // banding is lossless at distance <= 3
  }

  test("JSONL roundtrip aggregate equals the direct parquet aggregate") {
    val direct = Tables.documents(spark, sf)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(filter(split(col("text"), " "), t => t =!= lit(""))))
          .cast("bigint").as("n_tokens"),
        sum(length(col("text"))).cast("bigint").as("n_text_chars"))
      .orderBy("lang").collect().toSeq
    assert(ops.FormatOps.jsonlRoundtrip(spark, sf).collect().toSeq == direct)
  }
}
