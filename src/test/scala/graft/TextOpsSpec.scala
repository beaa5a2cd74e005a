package graft

import org.apache.spark.sql.functions._
import graft.ops.{Hash64, TextOps}

class TextOpsSpec extends SparkSpecBase {

  test("q13: 5 tokens per lang, counts descending within lang") {
    val rows = SparkEntry.queries("q13_text_tokens")(spark, sf).collect()
    val perLang = rows.groupBy(_.getString(0))
    assert(perLang.nonEmpty)
    perLang.values.foreach { g =>
      assert(g.length == 5)
      val counts = g.sortBy(_.getLong(1)).map(_.getLong(3))
      assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
    }
  }

  test("q14: canonical dedup never exceeds raw-text dedup") {
    val rows = SparkEntry.queries("q14_exact_dedup")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, uniqText, uniqBow) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(uniqBow <= uniqText)
      assert(uniqText <= n)
    }
  }

  test("q27: shingle jaccard pairs have inter <= union and valid ranks") {
    val rows = SparkEntry.queries("q27_shingle_jaccard")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) >= 1 && r.getLong(0) <= 50)
      assert(r.getLong(1) < r.getLong(2))  // doc_a < doc_b
      assert(r.getLong(3) <= r.getLong(4)) // inter <= union
    }
  }

  test("q26: minhash candidates include every pair with identical shingle sets") {
    // Identical texts must land in the same band bucket with j_bp = 10000.
    val rows = SparkEntry.queries("q26_minhash_neardup")(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getLong(4) >= 0 && r.getLong(4) <= 10000)
    }
  }

  test("simhash: identical token sets collide, different sets (usually) don't") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f g h"),
      (2L, "h g f e d c b a"),       // same token set, different order
      (3L, "x y z w a b c d e f")
    ).toDF("doc_id", "text")
    val groups = TextOps.simhashGroups(docs).collect()
    // docs 1 and 2 form one group; doc 3 is not grouped with them
    assert(groups.map(_.getLong(1)).toSet == Set(1L, 2L))
  }

  test("graft_simhash64 equals the closure construction bit-for-bit") {
    // reference implementation: the original typed-map closure, run
    // driver-side over every corpus doc — the native expression must
    // reproduce every signature exactly
    val got = TextOps.simhashSigs(Tables.documents(spark, sf)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
    assert(docs.nonEmpty && got.size == docs.length)
    docs.foreach { r =>
      val tokens = r.getString(1).split(" ").filter(_.nonEmpty).distinct
      val counts = new Array[Int](64)
      tokens.foreach { t =>
        val h = Hash64.splitmix64(Hash64.stringHash(t))
        (0 until 64).foreach { i =>
          if (((h >>> i) & 1L) == 1L) counts(i) += 1 else counts(i) -= 1
        }
      }
      val sig = (0 until 64).foldLeft(0L) { (s, i) =>
        if (counts(i) > 0) s | (1L << i) else s
      }
      assert(got(r.getLong(0)) == sig, s"doc ${r.getLong(0)} signature drift")
    }
  }

  test("graft_simhash64 skips NULL elements instead of crashing") {
    graft.functions.GraftFunctions.register(spark)
    val withNull = spark.sql(
      "SELECT graft_simhash64(array('a', CAST(NULL AS STRING), 'b'))")
      .collect().head.getLong(0)
    val without = spark.sql(
      "SELECT graft_simhash64(array('a', 'b'))").collect().head.getLong(0)
    assert(withNull == without)
  }

  test("TopKPairs ties break in UTF-8 binary order like the oracle's ORDER BY") {
    // U+E000 (private-use BMP: UTF-16 unit 0xE000, UTF-8 EE 80 80) vs
    // U+10000 (supplementary: UTF-16 leads 0xD800, UTF-8 F0 90 80 80):
    // JVM compareTo says U+10000 < U+E000; UTF-8 bytes say the opposite.
    val bmp = "\uE000"
    val supp = new String(Character.toChars(0x10000))
    assert(bmp.compareTo(supp) > 0, "JVM order premise")
    assert(graft.functions.Utf8Order.compare(bmp, supp) < 0, "UTF-8 order")
    val topk = new graft.functions.TopKPairs(2)
    val r = topk.merge(
      topk.reduce(topk.zero, (supp, 7L)),
      topk.reduce(topk.zero, (bmp, 7L)))
    assert(r.items == Seq((bmp, 7L), (supp, 7L)),
      s"tie must rank UTF-8-first, got ${r.items}")
  }

  test("Utf8Order equals byte-wise comparison of the UTF-8 encodings") {
    import org.scalacheck.{Gen, Prop}
    def byteCompare(a: String, b: String): Int = {
      val x = a.getBytes("UTF-8"); val y = b.getBytes("UTF-8")
      val n = math.min(x.length, y.length)
      var i = 0
      while (i < n) {
        val c = (x(i) & 0xff) - (y(i) & 0xff)
        if (c != 0) return c
        i += 1
      }
      x.length - y.length
    }
    // valid code points only (lone surrogates don't UTF-8-encode):
    // mix BMP, the private-use range, and supplementary planes to hit
    // every branch of the surrogate fixup
    val cp = Gen.oneOf(Gen.choose(32, 0xd7ff), Gen.choose(0xe000, 0xffff),
      Gen.choose(0x10000, 0x10ffff))
    val str = Gen.listOf(cp).map(_.flatMap(Character.toChars(_).toSeq).mkString)
    val params = org.scalacheck.Test.Parameters.default
      .withMinSuccessfulTests(2000)
    val res = org.scalacheck.Test.check(params, Prop.forAll(str, str) {
      (a, b) =>
        Integer.signum(graft.functions.Utf8Order.compare(a, b)) ==
          Integer.signum(byteCompare(a, b))
    })
    assert(res.passed, res.status.toString)
  }

  test("Utf8Order sorts exactly like the engine's ORDER BY (UTF8_BINARY collation)") {
    // The byte-compare property above proves Utf8Order == UTF-8 byte
    // order; this proves it against the ENGINE itself: a driver-side
    // sort with Utf8Order must reproduce Spark's ORDER BY output
    // order, string for string — the contract every driver-side
    // tiebreak (TopKPairs, the BPE argmax) relies on. Mix BMP
    // [U+E000,U+FFFF] and supplementary-plane code points: the ranges
    // where JVM compareTo and UTF8_BINARY disagree.
    import org.scalacheck.{Gen, Prop}
    val s = spark
    import s.implicits._
    val cp = Gen.oneOf(Gen.choose(32, 0xd7ff), Gen.choose(0xe000, 0xffff),
      Gen.choose(0x10000, 0x10ffff))
    val str = Gen.resize(8,
      Gen.listOf(cp).map(_.flatMap(Character.toChars(_).toSeq).mkString))
    val params = org.scalacheck.Test.Parameters.default
      .withMinSuccessfulTests(25)
    val res = org.scalacheck.Test.check(params,
      Prop.forAll(Gen.listOfN(40, str)) { strs =>
        val distinct = strs.distinct
        val engine = distinct.toDF("s").orderBy("s")
          .collect().map(_.getString(0)).toSeq
        val driver = distinct.sorted(graft.functions.Utf8Order)
        engine == driver
      })
    assert(res.passed, res.status.toString)
  }

  test("q28: group ids equal a driver-side min-doc-id per duplicated signature") {
    // The group id is the min doc_id of the group (q55's min-label
    // convention — content-addressed, no ranking) — recompute that
    // contract driver-side from the raw signatures and equate.
    val sigs = TextOps.simhashSigs(Tables.documents(spark, sf))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val dupSigs = sigs.groupBy(_._2).filter(_._2.length > 1)
    val expected = dupSigs.toSeq.flatMap { case (_, docs) =>
      val gid = docs.map(_._1).min
      docs.map { case (id, _) => (gid, id, docs.length.toLong) }
    }.sorted
    val got = SparkEntry.queries("q28_simhash_dups")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
  }

  test("q28: plan contains no Window nodes at all") {
    val plan = SparkEntry.queries("q28_simhash_dups")(spark, sf)
      .queryExecution.optimizedPlan
    val windows = plan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.isEmpty, s"unexpected Window nodes: $windows")
  }

  test("q29: confusion matrix covers only test docs and all langs appear") {
    val rows = SparkEntry.queries("q29_lang_trigram_id")(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getLong(2)).sum
    val nTest = Tables.documents(spark, sf)
      .filter(col("doc_id") % 5 =!= 0).count()
    assert(total == nTest)
  }

  test("q30: ratios in range, all docs present") {
    val rows = SparkEntry.queries("q30_quality_score")(spark, sf).collect()
    assert(rows.length == Tables.documents(spark, sf).count())
    rows.foreach { r =>
      assert(r.getLong(4) >= 0 && r.getLong(4) <= 10000) // ttr_bp
      assert(r.getLong(5) >= 0 && r.getLong(5) <= 10000) // stop_bp
    }
  }

  test("q31: token chars >= tokens (every token has >= 1 char)") {
    val rows = SparkEntry.queries("q31_token_stats")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(3) >= r.getLong(2))
      assert(r.getLong(4) <= r.getLong(3)) // subwords <= chars
    }
  }

  test("polyHash: golden values and mod-2^61-1 range") {
    assert(Hash64.polyHash("") == 0L)
    assert(Hash64.polyHash("a") == 'a'.toLong)
    assert(Hash64.polyHash("ab") == 'a'.toLong * 257 + 'b'.toLong)
    val h = Hash64.polyHash("the quick brown fox jumps over the lazy dog")
    assert(h >= 0 && h < (1L << 61) - 1)
    // deterministic
    assert(h == Hash64.polyHash("the quick brown fox jumps over the lazy dog"))
  }

  test("winnow: substring sharing yields overlapping fingerprints") {
    val a = Hash64.winnow("abcdefghijklmnopqrstuvwxyz0123456789", 8, 4)
    val b = Hash64.winnow("ZZZdefghijklmnopqrstuvwxyz012345YYY", 8, 4)
    assert(a.nonEmpty && b.nonEmpty)
    assert(a.intersect(b).nonEmpty, "shared substring must share fingerprints")
  }

  test("q47: kept rows partition the corpus by canonical key") {
    val rows = SparkEntry.queries("q47_dedup_keep")(spark, sf).collect()
    assert(rows.map(_.getLong(3)).sum == Tables.documents(spark, sf).count())
    val ids = rows.map(_.getLong(0))
    assert(ids.distinct.length == ids.length, "kept doc_ids unique")
    // the kept doc is the min of its group, so groups with n_dups > 1
    // must exist only if the corpus has bow-duplicates at this SF; either
    // way every kept id is a real doc
    val docIds = Tables.documents(spark, sf).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(ids.forall(docIds.contains))
  }

  test("q122: kept set is exactly the complement of q91's thresholded drop ids") {
    val dropIds = SparkEntry.queries("q91_minhash_portable")(spark, sf)
      .collect()
      .filter(_.getLong(3) >= 8000).map(_.getLong(1)).toSet
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = docs.filterNot(d => dropIds(d._1))
      .groupBy(_._2).map { case (lang, g) =>
        (lang, g.length.toLong, g.map(_._1).sum)
      }.toSeq.sortBy(_._1)
    val got = SparkEntry.queries("q122_minhash_dedup")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected,
      s"dedup materialization diverges from the q91 complement:\n$got\nvs\n$expected")
  }

  test("q126: incremental admission equals the full-pair derivation, restricted to the slice") {
    // rejected-by-rule from q91's complete pair list: a new doc loses
    // to ANY partner when it is doc_b, and to a CORPUS partner when it
    // is doc_a (the corpus is immutable — order can't save it)
    val pairs = SparkEntry.queries("q91_minhash_portable")(spark, sf)
      .collect().filter(_.getLong(3) >= 8000)
      .map(r => (r.getLong(0), r.getLong(1)))
    val rejected =
      pairs.collect { case (_, b) if b % 3 == 0 => b }.toSet ++
      pairs.collect { case (a, b) if a % 3 == 0 && b % 3 != 0 => a }.toSet
    val slice = Tables.documents(spark, sf)
      .select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .filter(_._1 % 3 == 0)
    val expected = slice.groupBy(_._2).map { case (lang, g) =>
      val admitted = g.filterNot(d => rejected(d._1))
      (lang, g.length.toLong, admitted.length.toLong, admitted.map(_._1).sum)
    }.toSeq.sortBy(_._1)
    val got = SparkEntry.queries("q126_incremental_dedup")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expected,
      s"incremental admission diverges from the full derivation:\n$got\nvs\n$expected")
    // the slice must actually reject something at this SF, or the
    // incremental path is vacuous
    assert(expected.map(_._2).sum > expected.map(_._3).sum,
      "no near-dup rejected - q126's gate is vacuous at this SF")
  }

  test("q128 Misra-Gries: est <= true <= est + err_bound on the corpus") {
    val exact = Tables.documents(spark, sf)
      .select(col("lang"), explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
      .groupBy("lang", "token").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val langTotals = exact.groupBy(_._1._1).map { case (l, m) =>
      l -> m.values.sum }
    val rows = SparkEntry.queries("q128_heavy_hitters")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (lang, token, est, err) =
        (r.getString(0), r.getString(2), r.getLong(3), r.getLong(4))
      val truth = exact((lang, token))
      assert(est <= truth && truth <= est + err,
        s"$lang/$token: est $est, err $err, true $truth")
      // the sketch's own bound: delta can never exceed N/(k+1)
      assert(err <= langTotals(lang) / 33 + 1,
        s"$lang: err_bound $err above N/(k+1)")
    }
  }

  test("MisraGries survival guarantee: heavies survive every partitioning of synthetic skew") {
    import spark.implicits._
    // 3 heavy tokens (3000/2000/1000) in a sea of 6000 near-distinct
    // rares: truth > N/(k+1) = 12000/9 must survive MG(8)
    val data = Seq.fill(3000)("alpha") ++ Seq.fill(2000)("beta") ++
      Seq.fill(1000)("gamma") ++ (0 until 6000).map(i => s"rare_${i % 3000}")
    val mg = new graft.functions.MisraGries(8)
    for (parts <- Seq(1, 7, 32)) {
      val buf = spark.createDataset(data).repartition(parts)
        .groupByKey(_ => 0).mapValues(identity)
        .agg(mg.toColumn.name("sk")).collect().head._2
      val kept = buf.items.toMap
      for ((tok, truth) <- Seq("alpha" -> 3000L, "beta" -> 2000L)) {
        assert(kept.contains(tok), s"$tok lost at $parts partitions")
        assert(kept(tok) <= truth && truth <= kept(tok) + buf.delta,
          s"$tok bound broken at $parts partitions: ${kept(tok)} " +
            s"+ ${buf.delta} vs $truth")
      }
      assert(buf.items.size <= 8 && buf.delta <= 12000 / 9 + 1)
    }
  }

  test("q133 passage search: emitted passages are each doc's true argmax chunk with the exact overlap") {
    val toks = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).split(" ").filter(_.nonEmpty)).toMap
    def chunksOf(t: Array[String]): Seq[(Long, Set[String])] =
      (0 until t.length by 24).map(s =>
        (s / 24).toLong -> t.slice(s, s + 32).toSet)
    val rows = SparkEntry.queries("q133_passage_search")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).values.foreach { g =>
      assert(g.map(_._2).sorted.sameElements(1L to g.length))
    }
    rows.foreach { case (p, _, doc, chunk, score) =>
      val probe = toks(p).toSet
      val byChunk = chunksOf(toks(doc))
        .map { case (id, ts) => id -> probe.intersect(ts).size }
      assert(byChunk.toMap.apply(chunk) == score,
        s"probe $p doc $doc chunk $chunk: engine score $score != exact")
      // the emitted chunk is the doc's argmax (earliest on ties)
      val bestScore = byChunk.map(_._2).max
      val bestChunk = byChunk.filter(_._2 == bestScore).map(_._1).min
      assert(chunk == bestChunk && score == bestScore,
        s"probe $p doc $doc: emitted ($chunk,$score) vs argmax ($bestChunk,$bestScore)")
    }
  }

  test("q32: one fingerprint per doc") {
    val n = SparkEntry.queries("q32_doc_fingerprint")(spark, sf).count()
    assert(n == Tables.documents(spark, sf).count())
  }

  test("q54: sample membership is content-addressed and stratified") {
    val rows = SparkEntry.queries("q54_stratified_sample")(spark, sf).collect()
    assert(rows.nonEmpty)
    val thr = Map("en" -> "80", "de" -> "40", "fr" -> "40",
      "es" -> "20", "zh" -> "20")
    rows.foreach { r =>
      val (lang, bucket) = (r.getString(0), r.getString(2))
      assert(bucket < thr(lang), s"bucket $bucket over threshold for $lang")
    }
    // deterministic: identical membership on a second run
    val again = SparkEntry.queries("q54_stratified_sample")(spark, sf).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("q56: flagged pairs cross the split, overlap >= 3, contam_bp sane") {
    val rows = SparkEntry.queries("q56_decontamination")(spark, sf).collect()
    assert(rows.nonEmpty)
    def isTest(id: Long): Boolean = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      f"${md(0) & 0xff}%02x" < "10"
    }
    rows.foreach { r =>
      val (testId, trainId) = (r.getLong(0), r.getLong(1))
      assert(isTest(testId), s"$testId flagged as test but hashes to train")
      assert(!isTest(trainId), s"$trainId flagged as train but hashes to test")
      assert(r.getLong(2) >= 3)
      val bp = r.getLong(3)
      assert(bp >= 0 && bp <= 10000)
    }
    // overlaps are sorted descending (severity-first report)
    val ov = rows.map(_.getLong(2))
    assert(ov.zip(ov.tail).forall { case (a, b) => a >= b })
  }

  test("q57: distributed packing equals a sequential driver-side pack") {
    val got = SparkEntry.queries("q57_shard_packing")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty)
    // sequential reference: md5-shuffle order, running token prefix
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map { r =>
        val nTok = r.getString(1).split(" ").count(_.nonEmpty).toLong
        (md5hex(r.getLong(0).toString), r.getLong(0), nTok)
      }
      .sortBy(t => (t._1, t._2))
    var before = 0L
    val expected = docs.map { case (_, _, nTok) =>
      val s = before / 4096; before += nTok; (s, nTok)
    }.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (s, g) => (s, g.length.toLong, g.map(_._2).sum) }
    assert(got.toSeq == expected)
  }

  test("q59: per-doc top terms are distinct with non-increasing scores") {
    val rows = SparkEntry.queries("q59_tfidf_terms")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).values.foreach { g =>
      val sorted = g.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq == (1L to sorted.length))
      assert(sorted.map(_.getString(2)).distinct.length == sorted.length)
      val scores = sorted.map(_.getLong(4))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
      assert(scores.forall(_ > 0))
    }
  }

  test("stored lexical index: append-equivalence, torn-append invisibility, bucket pruning") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val probes = docs.filter(col("doc_id") < 5)
      .select(col("doc_id").as("probe_id"), col("text"))
    def result(out: String): Seq[(Long, Long, Long, Long)] =
      ops.TextOps.searchLexicalIndex(spark, probes, out)
        .orderBy("probe_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSeq
    val root = java.nio.file.Files.createTempDirectory("lex_idx").toString
    // one-shot build vs build-then-append: identical rankings
    val whole = s"$root/whole"
    ops.TextOps.writeLexicalIndex(spark, docs, whole)
    val incr = s"$root/incr"
    ops.TextOps.writeLexicalIndex(spark,
      docs.filter(pmod(col("doc_id"), lit(3)) =!= 0), incr)
    val before = result(incr)
    ops.TextOps.appendLexicalIndex(spark,
      docs.filter(pmod(col("doc_id"), lit(3)) === 0), incr)
    assert(result(incr) == result(whole),
      "append-built index ranked differently from the one-shot build")
    // a torn append (data landed, marker did not) must be invisible:
    // the reader serves exactly the pre-append generations
    assert(new java.io.File(incr, "_GEN_COMMIT_1").delete())
    assert(result(incr) == before,
      "uncommitted generation leaked into the search")
    // the probe's buckets and the committed gens are PARTITION filters
    // on the postings scan — directory pruning, not row filtering
    val res = ops.TextOps.searchLexicalIndex(spark, probes, whole)
    val plan = res.queryExecution.executedPlan.toString
    assert(("PartitionFilters: \\[[^\\]]*\\bb\\b[^\\]]*\\]".r
        .findFirstIn(plan).isDefined ||
      plan.contains("b#")) && plan.contains("gen"),
      s"bucket/gen pruning missing from scan:\n${plan.take(2000)}")
  }

  test("searchLexicalIndex past the isin threshold ships the vocab as a semi-join, results identical") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val probes = docs.filter(col("doc_id") < 5)
      .select(col("doc_id").as("probe_id"), col("text"))
    val root = java.nio.file.Files.createTempDirectory("lex_isin").toString
    val out = s"$root/idx"
    ops.TextOps.writeLexicalIndex(spark, docs, out)
    def run(): Seq[String] =
      ops.TextOps.searchLexicalIndex(spark, probes, out)
        .orderBy("probe_id", "rank").collect().map(_.toString).toSeq
    val viaIsin = run()
    val prev = spark.conf.getOption("spark.graft.lex.maxIsinTerms")
    spark.conf.set("spark.graft.lex.maxIsinTerms", "1")
    try {
      val viaSemi = run()
      assert(viaSemi == viaIsin,
        "semi-join vocab restriction ranked differently from isin")
    } finally prev.fold(
      spark.conf.unset("spark.graft.lex.maxIsinTerms"))(
      v => spark.conf.set("spark.graft.lex.maxIsinTerms", v))
  }

  test("lexical-index compaction folds generations, sweeps the old ones, and appends keep working") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val probes = docs.filter(col("doc_id") < 5)
      .select(col("doc_id").as("probe_id"), col("text"))
    def result(out: String) =
      ops.TextOps.searchLexicalIndex(spark, probes, out)
        .orderBy("probe_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSeq
    val out = java.nio.file.Files.createTempDirectory("lex_cmp").toString + "/i"
    ops.TextOps.writeLexicalIndex(spark,
      docs.filter(pmod(col("doc_id"), lit(3)) === 0), out)
    ops.TextOps.appendLexicalIndex(spark,
      docs.filter(pmod(col("doc_id"), lit(3)) === 1), out)
    val before = result(out)
    val gen = ops.TextOps.compactLexicalIndex(spark, out)
    assert(gen == 2L, s"compaction minted gen $gen")
    // ranking identical; superseded generations physically gone
    assert(result(out) == before, "compaction changed the ranking")
    Seq("postings", "df", "stats").foreach { part =>
      val gens = Option(new java.io.File(s"$out/$part").listFiles())
        .map(_.toSeq).getOrElse(Seq.empty).map(_.getName).sorted
      assert(gens == Seq("gen=2"), s"$part holds $gens after compaction")
    }
    assert(!new java.io.File(out, "_GEN_COMMIT_0").exists())
    // a compaction of one generation is a no-op, and the generation
    // counter keeps climbing for appends after a compaction
    assert(ops.TextOps.compactLexicalIndex(spark, out) == 2L)
    ops.TextOps.appendLexicalIndex(spark,
      docs.filter(pmod(col("doc_id"), lit(3)) === 2), out)
    assert(new java.io.File(out, "_GEN_COMMIT_3").exists())
    // the full index (compacted 2 gens + fresh append) ranks exactly
    // like a one-shot build over everything
    val whole = java.nio.file.Files.createTempDirectory("lex_cmp2")
      .toString + "/w"
    ops.TextOps.writeLexicalIndex(spark, docs, whole)
    assert(result(out) == result(whole),
      "compact+append diverged from the one-shot build")
  }

  test("lexical-index delete: tombstone read, idempotent replay, compaction fold") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val probes = docs.filter(col("doc_id") < 5)
      .select(col("doc_id").as("probe_id"), col("text"))
    def result(out: String) =
      ops.TextOps.searchLexicalIndex(spark, probes, out)
        .orderBy("probe_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSeq
    val root = java.nio.file.Files.createTempDirectory("lex_del").toString
    val out = s"$root/i"
    ops.TextOps.writeLexicalIndex(spark, docs, out)
    val victims = docs.filter(pmod(col("doc_id"), lit(7)) === 3)
      .select("doc_id")
    val victimIds = victims.collect().map(_.getLong(0)).toSet
    assert(ops.TextOps.deleteFromLexicalIndex(spark, victims, out) == 1L)
    // the tombstone read ranks exactly like an index built on the
    // survivors from scratch, and no victim ever surfaces
    val surv = s"$root/s"
    ops.TextOps.writeLexicalIndex(spark,
      docs.filter(pmod(col("doc_id"), lit(7)) =!= 3), surv)
    val afterDelete = result(out)
    assert(afterDelete == result(surv),
      "tombstone read diverged from the survivor-built index")
    assert(afterDelete.forall(r => !victimIds.contains(r._3)))
    // replaying the same delete batch — and deleting a never-indexed
    // id — mints no generation and double-decrements nothing
    assert(ops.TextOps.deleteFromLexicalIndex(spark, victims, out) == 1L)
    assert(ops.TextOps.deleteFromLexicalIndex(spark,
      Seq(Long.MaxValue - 1).toDF("doc_id"), out) == 1L)
    assert(result(out) == afterDelete, "delete replay changed the ranking")
    // compaction folds the tombstones away physically: ranking stable,
    // victims' postings gone from the files, tomb/ generations swept
    val cg = ops.TextOps.compactLexicalIndex(spark, out)
    assert(result(out) == afterDelete,
      "compacting a tombstoned index changed the ranking")
    Seq("postings", "df", "stats").foreach { part =>
      val gens = Option(new java.io.File(s"$out/$part").listFiles())
        .map(_.toSeq).getOrElse(Seq.empty).map(_.getName).sorted
      assert(gens == Seq(s"gen=$cg"), s"$part holds $gens after compaction")
    }
    val tombGens = Option(new java.io.File(s"$out/tomb").listFiles())
      .map(_.toSeq).getOrElse(Seq.empty)
      .map(_.getName).filter(_.startsWith("gen="))
    assert(tombGens.isEmpty, "tombstones survived the compaction")
    assert(spark.read.parquet(s"$out/postings")
      .filter(col("doc_id").isInCollection(victimIds)).count() == 0L,
      "victim postings survived the compaction rewrite")
  }

  test("lexical-index upsert: atomic replace+insert, replay equivalence, torn invisibility, compaction fold") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val probes = docs.filter(col("doc_id") < 5)
      .select(col("doc_id").as("probe_id"), col("text"))
    def result(out: String) =
      ops.TextOps.searchLexicalIndex(spark, probes, out)
        .orderBy("probe_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSeq
    val root = java.nio.file.Files.createTempDirectory("lex_ups").toString
    val out = s"$root/i"
    ops.TextOps.writeLexicalIndex(spark, docs, out)
    val updated = docs.filter(pmod(col("doc_id"), lit(5)) === 2)
      .select(col("doc_id"), concat(col("text"), lit(" zq zq")).as("text"))
    val inserted = docs.filter(pmod(col("doc_id"), lit(9)) === 4)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    val batch = updated.unionByName(inserted)
    assert(ops.TextOps.upsertLexicalIndex(spark, batch, out) == 1L)
    // ranks exactly like an index built from scratch on the
    // post-upsert corpus: no old version surfaces, inserts present,
    // df/stats netted
    val fresh = s"$root/f"
    ops.TextOps.writeLexicalIndex(spark,
      docs.filter(pmod(col("doc_id"), lit(5)) =!= 2)
        .unionByName(batch), fresh)
    val afterUpsert = result(out)
    assert(afterUpsert == result(fresh),
      "upserted index diverged from the post-upsert from-scratch build")
    // replaying the identical batch re-replaces content with itself:
    // every delta nets to zero and the ranking is unchanged
    ops.TextOps.upsertLexicalIndex(spark, batch, out)
    assert(result(out) == afterUpsert, "upsert replay changed the ranking")
    // a torn upsert (data landed, marker did not) is invisible
    val g3 = ops.TextOps.upsertLexicalIndex(spark,
      docs.filter(col("doc_id") === 6)
        .select(col("doc_id"), lit("only zq tokens qqq").as("text")), out)
    assert(new java.io.File(out, s"_GEN_COMMIT_$g3").delete())
    assert(result(out) == afterUpsert,
      "uncommitted upsert generation leaked into the search")
    // compaction folds the upsert's tombstones away; ranking stable
    ops.TextOps.compactLexicalIndex(spark, out)
    assert(result(out) == afterUpsert,
      "compacting an upserted index changed the ranking")
    // every COMMITTED tombstone generation folded away (the torn
    // gen's leftovers are uncommitted garbage, invisible to readers -
    // same contract as a torn append's data dirs)
    val committedTombs = Option(new java.io.File(s"$out/tomb").listFiles())
      .map(_.toSeq).getOrElse(Seq.empty)
      .map(_.getName).filter(_.startsWith("gen="))
      .map(_.stripPrefix("gen=").toLong)
      .filter(g => new java.io.File(out, s"_GEN_COMMIT_$g").exists())
    assert(committedTombs.isEmpty, "upsert tombstones survived the compaction")
  }

  test("gen-scoped tombstones: delete then upsert the same doc resurrects it") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val probes = docs.filter(col("doc_id") < 5)
      .select(col("doc_id").as("probe_id"), col("text"))
    val root = java.nio.file.Files.createTempDirectory("lex_resur").toString
    val out = s"$root/i"
    ops.TextOps.writeLexicalIndex(spark, docs, out)
    def rows() = ops.TextOps.searchLexicalIndex(spark, probes, out)
      .orderBy("probe_id", "rank").collect().map(_.mkString("|")).toSeq
    def surfaced(id: Long): Boolean =
      ops.TextOps.searchLexicalIndex(spark, probes, out)
        .filter(col("doc_id") === id).count() > 0
    val pre = rows()
    // a victim that actually RANKS pre-delete, so each phase is visible
    val victimId = ops.TextOps.searchLexicalIndex(spark, probes, out)
      .filter(col("doc_id") >= 5).agg(min(col("doc_id"))).head().getLong(0)
    ops.TextOps.deleteFromLexicalIndex(spark,
      Seq(victimId).toDF("doc_id"), out)
    assert(!surfaced(victimId), "deleted doc still ranks")
    // re-ingest the doc with its ORIGINAL text via upsert: the delete's
    // tombstone (older generation) must not kill the new postings, and
    // netted df/stats restore the exact original ranking
    ops.TextOps.upsertLexicalIndex(spark,
      docs.filter(col("doc_id") === victimId), out)
    assert(rows() == pre,
      "delete-then-upsert diverged from the never-deleted ranking")
    assert(surfaced(victimId), "resurrected doc does not rank")
  }
}
