package graft

import org.apache.spark.sql.functions._

/** Round-5 pipeline additions: context-window chunking, temperature
  * mixture sampling, ORC roundtrip, PII scrubbing, n-gram novelty.
  * The oracle gate covers value-exactness at sf0.01; these specs
  * re-derive the semantics driver-side at sf0.001 so a refactor that
  * silently changes the CONTRACT (not just the values) also fails. */
class PipelineQueries5Spec extends SparkSpecBase {

  private def docTokens: Map[Long, Array[String]] =
    Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty))
      .toMap

  test("q74: chunks are exactly the size-32/stride-24 windows of each doc") {
    val rows = SparkEntry.queries("q74_doc_chunks")(spark, sf).collect()
    val byDoc = rows.groupBy(_.getLong(0))
    val toks = docTokens
    assert(byDoc.keySet == toks.keySet)
    toks.foreach { case (id, t) =>
      val expected = (0 until t.length by 24).map(s =>
        t.slice(s, s + 32)).toArray
      val got = byDoc(id).sortBy(_.getLong(1))
      assert(got.length == expected.length)
      got.zip(expected).zipWithIndex.foreach { case ((r, e), i) =>
        assert(r.getLong(1) == i)
        assert(r.getLong(2) == e.length)
        assert(r.getString(3) == e.mkString(" "))
      }
    }
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("q75: per-lang sample is the ceil(8*sqrt(n)) smallest md5 keys") {
    val rows = SparkEntry.queries("q75_mixture_sample")(spark, sf).collect()
    val langs = Tables.documents(spark, sf).select("lang", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).groupBy(_._1)
    langs.foreach { case (lang, docs) =>
      val n = docs.length
      val quota = math.min(n.toLong, math.ceil(8 * math.sqrt(n.toDouble)).toLong)
      val expected = docs.map(_._2)
        .sortBy(id => (md5hex(id.toString), id)).take(quota.toInt)
      val got = rows.filter(_.getString(0) == lang).sortBy(_.getLong(1))
      assert(got.length == expected.length)
      assert(got.map(_.getLong(2)).sameElements(expected))
      got.foreach(r => assert(r.getLong(3) == quota))
    }
  }

  test("q76: ORC roundtrip aggregate equals the direct-parquet aggregate") {
    val got = SparkEntry.queries("q76_orc_roundtrip")(spark, sf).collect()
    val direct = Tables.documents(spark, sf)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(filter(split(col("text"), " "), t => t =!= lit(""))))
          .cast("bigint").as("n_tokens"),
        sum(col("n_chars")).cast("bigint").as("sum_chars"))
      .orderBy("source").collect()
    assert(got.length == direct.length)
    got.zip(direct).foreach { case (a, b) => assert(a == b) }
  }

  test("q77: exactly one email + one phone found and scrubbed per doc") {
    val rows = SparkEntry.queries("q77_pii_scrub")(spark, sf).collect()
    val texts = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.length == texts.size)
    val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}".r
    val phoneRe = "[0-9]{3}-[0-9]{4}".r
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) == 1L, "one injected email")
      assert(r.getLong(2) == 1L, "one injected phone")
      val aug = texts(id) + s" contact user$id@mail.example or call " +
        (id % 900 + 100) + "-" + "%04d".format((id * 7) % 10000)
      assert(r.getLong(3) == aug.length)
      val clean = phoneRe.replaceAllIn(
        emailRe.replaceAllIn(aug, "<EMAIL>"), "<PHONE>")
      assert(r.getLong(4) == clean.length)
      assert(r.getString(5) == md5hex(clean))
      assert(!clean.contains("@") && clean.contains("<EMAIL>")
        && clean.contains("<PHONE>"))
    }
  }

  test("q79: composed pipeline equals gate -> dedup -> quota run stepwise") {
    val rows = SparkEntry.queries("q79_curation_pipeline")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val docs = Tables.documents(spark, sf).select("doc_id", "lang", "text")
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getString(2).split(" ").filter(_.nonEmpty)))
    val gated = docs.filter(d => d._3.length >= 20 && d._3.length <= 80)
    val deduped = gated.groupBy(_._3.distinct.sorted.mkString(" "))
      .values.map(_.minBy(_._1)).toSeq
    val expected = deduped.groupBy(_._2).toSeq.sortBy(_._1).map {
      case (lang, ds) =>
        val quota = math.min(ds.length.toLong,
          math.ceil(4 * math.sqrt(ds.length.toDouble)).toLong)
        val kept = ds.sortBy(d => (md5hex(d._1.toString), d._1))
          .take(quota.toInt)
        val tok = kept.map(_._3.length.toLong).sum
        (lang, kept.length.toLong, tok, math.ceil(tok / 4096.0).toLong)
    }
    assert(rows.toSeq == expected)
  }

  test("q81: span is dense per user; fill carries the last observed value") {
    val rows = SparkEntry.queries("q81_gap_fill")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate, r.getDouble(2),
        r.getLong(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).values.foreach { user =>
      val days = user.map(_._2).sorted
      // dense: every day between the user's first and last is present
      assert(days.length ==
        java.time.temporal.ChronoUnit.DAYS.between(days.head, days.last) + 1)
      // span edges are observed; fill equals the last observed value
      val ordered = user.sortBy(_._2.toEpochDay)
      assert(ordered.head._4 == 1L)
      var lastObserved = ordered.head._3
      ordered.foreach { case (_, _, filled, observed) =>
        if (observed == 1L) lastObserved = filled
        assert(filled == lastObserved)
      }
    }
  }

  test("q82: melt emits every priority x status cell and counts cover orders") {
    val rows = SparkEntry.queries("q82_unpivot")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val nPrio = Tables.orders(spark, sf)
      .select("o_orderpriority").distinct().count()
    assert(rows.length == nPrio * 3) // zero cells included
    assert(rows.map(_._3).sum == Tables.orders(spark, sf).count())
    val direct = Tables.orders(spark, sf)
      .groupBy("o_orderpriority", "o_orderstatus").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    rows.foreach { case (p, s, n) =>
      assert(n == direct.getOrElse((p, s), 0L))
    }
  }

  test("q83: drift equals an exact integer recomputation over top-20 tokens") {
    val rows = SparkEntry.queries("q83_source_drift")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val docs = Tables.documents(spark, sf).select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1).split(" ").filter(_.nonEmpty)))
    val cnt = docs.flatMap { case (s, ts) => ts.map(t => (s, t)) }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val byTok = cnt.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val top = byTok.toSeq.sortBy { case (t, c) => (-c, t) }.take(20).map(_._1).toSet
    val sub = cnt.filter { case ((_, t), _) => top(t) }
    val ns = sub.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val ct = sub.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val n = sub.values.sum
    val expected = sub.groupBy(_._1._1).toSeq.sortBy(_._1).map { case (s, cells) =>
      val terms = cells.toSeq.map { case ((_, t), c) =>
        val diff = c * n - ns(s) * ct(t)
        (diff * diff / math.max(ns(s) * ct(t) * n / 10000, 1L),
          math.abs(diff) / math.max(ns(s) * n / 10000, 1L))
      }
      (s, terms.map(_._1).sum, terms.map(_._2).max)
    }
    assert(rows.toSeq == expected)
  }

  test("q84: TopKPairs Aggregator reproduces q13's window top-k exactly") {
    val viaAgg = SparkEntry.queries("q84_topk_agg")(spark, sf).collect()
    val viaWindow = SparkEntry.queries("q13_text_tokens")(spark, sf).collect()
    assert(viaAgg.length == viaWindow.length)
    viaAgg.zip(viaWindow).foreach { case (a, b) => assert(a == b) }
  }

  test("TopKPairs: merge is order-insensitive and bounded at k") {
    val agg = new graft.functions.TopKPairs(3)
    val items = Seq(("a", 5L), ("b", 9L), ("c", 9L), ("d", 1L), ("e", 7L))
    val whole = items.foldLeft(agg.zero)(agg.reduce)
    // every 2-way split of the stream merges to the same top-3
    (0 to items.length).foreach { cut =>
      val (l, r) = items.splitAt(cut)
      val m = agg.merge(l.foldLeft(agg.zero)(agg.reduce),
        r.foldLeft(agg.zero)(agg.reduce))
      assert(m == whole)
    }
    assert(whole.items == Seq(("b", 9L), ("c", 9L), ("e", 7L)))
  }

  test("q85: offset-0 retention is 10000bp; cells never exceed cohort size") {
    val rows = SparkEntry.queries("q85_retention_cohorts")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    // every user appears in their own cohort's offset-0 cell
    rows.filter(_._2 == 0L).foreach { case (_, _, n, size, bp) =>
      assert(n == size); assert(bp == 10000L)
    }
    rows.foreach { case (_, off, n, size, bp) =>
      assert(off >= 0L && n <= size)
      assert(bp == math.floor(10000.0 * n / size).toLong)
    }
    // cohort sizes partition the user population
    val totalUsers = Tables.events(spark, sf)
      .select("user_id").distinct().count()
    assert(rows.filter(_._2 == 0L).map(_._4).sum == totalUsers)
  }

  test("q86: funnel stages shrink and match a driver-side replay") {
    val rows = SparkEntry.queries("q86_funnel")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq == Seq(1L, 2L, 3L))
    val Seq(n1, n2, n3) = rows.map(_._3).toSeq
    assert(n1 >= n2 && n2 >= n3)
    // driver-side replay of the ordered funnel
    // compare at MICROsecond precision, same as the query (getTime is
    // ms-truncated and would miss sub-ms orderings)
    def micros(t: java.sql.Timestamp): Long =
      t.getTime * 1000 + (t.getNanos / 1000) % 1000
    val ev = Tables.events(spark, sf)
      .select("user_id", "event_type", "ts").collect()
      .map(r => (r.getLong(0), r.getString(1), micros(r.getTimestamp(2))))
      .groupBy(_._1)
    val stages = ev.values.map { es =>
      val s = es.filter(_._2 == "signup").map(_._3).minOption
      val c = s.flatMap(t => es.filter(e => e._2 == "click" && e._3 > t)
        .map(_._3).minOption)
      val p = c.flatMap(t => es.filter(e => e._2 == "purchase" && e._3 > t)
        .map(_._3).minOption)
      (s.isDefined, c.isDefined, p.isDefined)
    }
    assert(n1 == stages.count(_._1))
    assert(n2 == stages.count(_._2))
    assert(n3 == stages.count(_._3))
    assert(rows(1)._4 == math.floor(10000.0 * n2 / n1).toLong)
    assert(rows(2)._4 == math.floor(10000.0 * n3 / n2).toLong)
  }

  test("q87: trailing-24h frame equals a brute-force recount per row") {
    val rows = SparkEntry.queries("q87_trailing_window")(spark, sf).collect()
      .map(r => (r.getLong(1), (r.getLong(0), r.getLong(2), r.getLong(3),
        r.getDouble(4)))).toMap
    val raw = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("sec"), col("value")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.size == raw.length)
    val byUser = raw.groupBy(_._1)
    raw.foreach { case (u, id, sec, _) =>
      val frame = byUser(u).filter(e => e._3 >= sec - 86400 && e._3 <= sec)
      val (gotU, gotSec, gotN, gotMax) = rows(id)
      assert(gotU == u && gotSec == sec)
      assert(gotN == frame.length)
      assert(gotMax == frame.map(_._4).max)
    }
  }

  test("q88: report string is q13's top-3 tokens comma-joined in rank order") {
    val report = SparkEntry.queries("q88_token_report")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val q13 = SparkEntry.queries("q13_text_tokens")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    val expected = q13.filter(_._2 <= 3).groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(_._3).mkString(",")).toMap
    assert(report == expected)
  }

  test("q89: learned BPE merges equal a sequential driver-side training run") {
    val got = SparkEntry.queries("q89_bpe_vocab")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    // plain-Scala BPE over the same word-count table
    var words = docTokens.values.flatten.toSeq
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .map { case (w, c) => (w.codePoints().toArray
        .map(cp => new String(Character.toChars(cp))).toVector :+ "</w>", c) }
    val expected = (1 to 10).map { rank =>
      val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (sym, c) =>
        sym.indices.dropRight(1).foreach { i =>
          val k = (sym(i), sym(i + 1))
          pairs(k) = pairs.getOrElse(k, 0L) + c
        }
      }
      // same UTF-8-binary tiebreak as BOTH production paths (JVM tuple
      // order would diverge on supplementary-plane ties)
      val refOrd: Ordering[((String, String), Long)] =
        Ordering.by[((String, String), Long), Long](-_._2)
          .orElseBy(_._1._1)(graft.functions.Utf8Order)
          .orElseBy(_._1._2)(graft.functions.Utf8Order)
      val ((a, b), w) = pairs.toSeq.min(refOrd)
      words = words.map { case (sym, c) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < sym.length) {
          if (i + 1 < sym.length && sym(i) == a && sym(i + 1) == b) {
            out += a + b; i += 2
          } else { out += sym(i); i += 1 }
        }
        (out.toVector, c)
      }
      (rank.toLong, a, b, a + b, w)
    }
    assert(got.toSeq == expected)
  }

  test("q89: distributed merge loop equals the driver-side fast path") {
    // driverLoopMaxVocab = 0 forces the distributed per-round loop; the
    // default path collects the bounded word table. Same merges, same
    // weights — the adaptive switch must be invisible in the output.
    val fast = SparkEntry.queries("q89_bpe_vocab")(spark, sf).collect()
      .map(_.toSeq).toSeq
    val dist = graft.ops.TextOps.bpeVocab(spark, sf, driverLoopMaxVocab = 0)
      .collect().map(_.toSeq).toSeq
    assert(fast == dist)
  }

  test("q90: upsert audit covers exactly the mod-7 updates and 50 inserts") {
    val rows = SparkEntry.queries("q90_upsert")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
    val base = Tables.customer(spark, sf)
      .select("c_custkey", "c_mktsegment").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val maxKey = base.keys.max
    val updates = rows.filter(_._2 == "update")
    val inserts = rows.filter(_._2 == "insert")
    assert(updates.length == base.keys.count(_ % 7 == 0))
    assert(inserts.length == 50)
    updates.foreach { case (k, _, old, neu) =>
      assert(k % 7 == 0 && old == base(k) && neu == "UPGRADED")
    }
    assert(inserts.map(_._1).sorted.sameElements(
      (maxKey + 1) to (maxKey + 50)))
    inserts.foreach { case (_, _, old, neu) =>
      assert(old == "" && neu == "NEWCOMER")
    }
    // the write path is real: the persisted merged dimension holds the
    // COMPLETE post-merge table (untouched rows as 'noop'), and the
    // audit rows above were read back from those files. Read the REAL
    // scratch location the query writes (exposed by RelationalQueries —
    // no duplicated path math, no stale-directory hazard), and pin that
    // the pre-round-8 location is gone so this test can never silently
    // validate stale files again.
    assert(!new java.io.File("target/upsert_roundtrip").exists(),
      "stale pre-scratchDir q90 output present — delete target/")
    val out = ops.RelationalQueries.q90ScratchPath(spark, sf)
    val persisted = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(persisted.length == base.size + 50)
    persisted.filter(_._3 == "noop").foreach { case (k, seg, _) =>
      assert(base(k) == seg, s"noop row $k changed segment")
    }
    assert(persisted.count(_._3 == "noop") ==
      base.size - base.keys.count(_ % 7 == 0))
  }

  test("q91: identical shingle sets always pair; jaccard exact per pair") {
    val rows = SparkEntry.queries("q91_minhash_portable")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val sets = docTokens.view.mapValues(t =>
      t.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet)
      .toMap.filter(_._2.nonEmpty)
    // identical shingle sets agree on every permutation, hence every
    // band — the banding can NEVER miss them
    val ids = sets.keys.toSeq.sorted
    for (i <- ids.indices; j <- (i + 1) until ids.length
         if sets(ids(i)) == sets(ids(j))) {
      assert(rows.contains((ids(i), ids(j))),
        s"identical docs ${ids(i)}/${ids(j)} not paired")
    }
    // every emitted pair's intersection and floored jaccard are exact
    rows.foreach { case ((a, b), (nInter, jacBp)) =>
      val (sa, sb) = (sets(a), sets(b))
      val inter = (sa & sb).size.toLong
      assert(nInter == inter)
      assert(jacBp ==
        math.floor(10000.0 * inter / (sa.size + sb.size - inter)).toLong)
    }
  }

  test("q78: novelty matches a driver-side first-owner recomputation") {
    val rows = SparkEntry.queries("q78_ngram_novelty")(spark, sf).collect()
    val grams = docTokens.view.mapValues(t =>
      t.sliding(4).filter(_.length == 4).map(_.mkString(" ")).toSet)
      .toMap.filter(_._2.nonEmpty)
    val owner = grams.toSeq.flatMap { case (id, gs) => gs.map(_ -> id) }
      .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).min }
    assert(rows.length == grams.size)
    // every distinct gram is first-owned exactly once across the corpus
    assert(rows.map(_.getLong(2)).sum == owner.size)
    rows.foreach { r =>
      val gs = grams(r.getLong(0))
      val novel = gs.count(g => owner(g) == r.getLong(0))
      assert(r.getLong(1) == gs.size)
      assert(r.getLong(2) == novel)
      assert(r.getLong(3) == math.floor(10000.0 * novel / gs.size).toLong)
    }
  }
}
