package graft

/** Scale-sensitivity canary over the round's most expensive queries:
  * wall-clock at sf0.001 / sf0.01 / sf0.1 must grow SUB-quadratically
  * in the data (each sf step is 10x rows). An accidental quadratic —
  * an unbucketed self-join, a candidate generator degrading to
  * all-pairs — multiplies work 100x per sf step and explodes here long
  * before it would OOM a cluster; a healthy linear-with-overhead query
  * grows well under 10x per step on this host.
  *
  * Margins are deliberately generous (burstable-CPU host, min-of-2
  * reps): the ratio bound 40x per 10x data step sits far above
  * linear-plus-noise (~2-8x observed) and far below quadratic (~100x
  * compute-bound), so only a real complexity regression trips it. */
class ScaleSensitivitySpec extends SparkSpecBase {

  // the judge-audited expensive set: round-7 plan audit + round-8 bench,
  // extended in round 10 with the four queries whose r9 bench numbers
  // moved (q49/q59/q39/q27), in round 11 with q71 (the r10 bench's
  // most expensive query and the only top-5 entry without a canary),
  // in round 12 with q85 (the r11 bench's #3 query, 1.14 s on zero
  // code change — the last top-5 entry without a canary), and in
  // round 13 with the sink-lifecycle I/O queries (q115/q116 were the
  // r12 bench's #1 and #3 costs with no canary; q117 is their new
  // delete sibling) — real multi-write I/O, so a super-linear write
  // path would hide inside "it's just I/O" without these — plus q122
  // (the round-13 bench's #2 cost: q91's banded-LSH shape feeding the
  // dedup materialization), and in round 14 with the retrieval family
  // (q132 hybrid fusion, q133 chunk-index scoring — model joins and
  // candidate fans whose cost shape deserves the same canary the
  // lifecycle set got) plus q134 (time travel: two full sink reads
  // atop the delete lifecycle — the heaviest lifecycle I/O yet) and
  // q143 (incremental view: ingest + compact + create/refresh writes —
  // the O(delta) claim is exactly a scale-sensitivity claim)
  private val watched =
    Seq("q100_ctas", "q17_placement_targets", "q22_hive_connected",
      "q65_bigram_lm", "q86_funnel",
      "q49_ivf_ann", "q59_tfidf_terms", "q39_supplier_part",
      "q27_shingle_jaccard", "q71_quantized_knn", "q85_retention_cohorts",
      "q115_stream_compaction", "q116_retention", "q117_delete_where",
      "q118_incremental_read", "q119_upsert_batch",
      "q120_perplexity_filter", "q124_schema_evolution",
      "q122_minhash_dedup",
      "q132_hybrid_search", "q133_passage_search", "q134_time_travel",
      "q135_bm25_hybrid", "q137_type_widening", "q138_stored_lexical",
      "q139_lexical_compaction", "q140_lexical_delete",
      "q141_vector_delete", "q143_incremental_view", "q144_zone_map",
      "q145_pipeline_index", "q146_sketch_view", "q147_zorder",
      "q148_vector_pipeline", "q149_metadata_count",
      // round-14 second tranche: snapshot CDC (two full snapshot reads
      // over a delete + upsert lifecycle), bloom build (one full data
      // pass at index time), rename/drop (an all-days normalize
      // rewrite), lexical upsert (victim-postings scan + BM25 search)
      "q150_snapshot_diff", "q151_bloom_lookup", "q152_rename_drop",
      "q153_lexical_upsert",
      // q154 trains two indexes and searches both (the in-query
      // reference equality) - the heaviest vector-lifecycle query
      "q154_vector_upsert",
      // q155 runs TWO full sink lifecycles (source + replica) plus the
      // diff and the apply - the heaviest CDC composition
      "q155_cdc_replication",
      // q156 indexes + band-reads the shared string-clustered sink
      "q156_string_band",
      // q157 indexes + ts-band-reads the shared default-layout sink
      "q157_ts_band",
      // q158 reads the shared auto-indexed sink (whose build pays the
      // per-epoch manifest emission) through band + point probes
      "q158_auto_index",
      // q159 diffs across an insert epoch from by-reference change
      // manifests - the fold must stay O(churn) as the table grows
      "q159_cdc_ingest",
      // round-18 DML/time-travel completions: q160 rewrites every
      // affected day (the O(affected days) claim IS a scale claim),
      // q161 runs the delete lifecycle plus two epoch-snapshot reads
      "q160_update_where", "q161_timestamp_as_of",
      // q162 restores past a delete under K=2: the link-based rebuild
      // must stay O(files) metadata however large the days grow
      "q162_restore",
      // q163 folds the full feed through the CHECK gate (one pricing
      // aggregation + the quarantine split) - the gate must stay a
      // constant factor on the ingest, never a second fold
      "q163_sink_checks")

  private val sfDirs = Seq(
    "/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")

  private def wall(name: String, dir: String, reps: Int): Double = {
    def rep(): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).count()
      (System.nanoTime() - t0) / 1e9
    }
    Seq.fill(reps)(rep()).min
  }

  watched.foreach { name =>
    test(s"$name wall-clock grows sub-quadratically from sf0.001 to sf0.1") {
      // min-of-2 ONLY at the first (cheapest) SF: its first rep absorbs
      // the query's codegen/JIT first-touch, and the larger SFs reuse
      // the same generated code (plan-keyed codegen cache), so their
      // second rep bought nothing but suite wall-clock — this suite was
      // the test budget's #1 cost (657 s of 2263 s in the r19 audit)
      // and the 40x margin dwarfs single-rep noise
      val Seq(t1, t2, t3) = sfDirs.zipWithIndex.map { case (d, i) =>
        wall(name, d, reps = if (i == 0) 2 else 1) }
      info(f"$name: sf0.001=$t1%.2fs sf0.01=$t2%.2fs sf0.1=$t3%.2fs")
      // floor the denominators: sub-0.2s timings are pure overhead and
      // would make healthy ratios look arbitrarily large
      val r12 = t2 / math.max(t1, 0.2)
      val r23 = t3 / math.max(t2, 0.2)
      assert(r12 < 40.0,
        f"sf0.001->sf0.01 grew $r12%.1fx for 10x data - quadratic suspect")
      assert(r23 < 40.0,
        f"sf0.01->sf0.1 grew $r23%.1fx for 10x data - quadratic suspect")
      // absolute backstop: none of these is allowed to leave the
      // low-seconds class at sf0.1 even on a throttled host
      assert(t3 < 120.0, f"$name took $t3%.1fs at sf0.1")
    }
  }
}
