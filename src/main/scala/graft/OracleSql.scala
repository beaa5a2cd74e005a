package graft

/** DuckDB oracle SQL, one string per declared query (SURVEY §2.9).
  *
  * Each statement is ANSI SQL runnable by DuckDB 1.0 over views named
  * after the parquet tables. The SQL mirrors the Spark query EXACTLY in
  * aliases, casts, rounding, and ORDER BY, so the driver's sorted-column
  * value hash matches (SURVEY §7 "Known hard parts" #1).
  */
object OracleSql {

  val q01: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))) * (1 + CAST(l_tax AS DECIMAL(12,2)))) AS DOUBLE) AS sum_charge,
      |  ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*), 6) AS avg_qty,
      |  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*), 6) AS avg_price,
      |  ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*), 6) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  val q02: String =
    """SELECT c_custkey, c_name,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_orders
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_custkey, c_name
      |ORDER BY revenue DESC, c_custkey
      |LIMIT 10""".stripMargin

  val q03: String =
    """SELECT r_name, n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_rows
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1999-01-01'
      |  AND c_mktsegment = 'BUILDING' AND l_returnflag <> 'A'
      |GROUP BY r_name, n_name
      |ORDER BY r_name, n_name""".stripMargin

  val q04: String =
    """SELECT c_mktsegment,
      |  CAST(SUM(CASE WHEN ex THEN 1 ELSE 0 END) AS BIGINT) AS n_with_orders,
      |  CAST(SUM(CASE WHEN ex THEN 0 ELSE 1 END) AS BIGINT) AS n_without_orders
      |FROM (SELECT c_mktsegment,
      |        EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) AS ex
      |      FROM customer) t
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  val q05: String =
    """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
      |  COALESCE(o_orderpriority, 'ALL') AS priority,
      |  COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_spend
      |FROM orders
      |GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
      |ORDER BY status, priority""".stripMargin

  val q06: String =
    """SELECT o_orderstatus, rn, o_orderkey, o_totalprice FROM (
      |  SELECT o_orderstatus,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn,
      |    o_orderkey, o_totalprice
      |  FROM orders) t
      |WHERE rn <= 3
      |ORDER BY o_orderstatus, rn""".stripMargin

  val q07: String =
    """SELECT o_custkey, o_orderkey,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
      |FROM orders
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  val q08: String =
    """WITH e AS (
      |  SELECT user_id, event_id,
      |    epoch(date_trunc('second', CAST(ts AS TIMESTAMP))) AS sec
      |  FROM events
      |), g AS (
      |  SELECT user_id,
      |    CASE WHEN sec - LAG(sec) OVER (PARTITION BY user_id ORDER BY sec, event_id) > 1800
      |         THEN 1 ELSE 0 END AS is_break
      |  FROM e
      |)
      |SELECT user_id,
      |  CAST(SUM(is_break) + 1 AS BIGINT) AS n_sessions,
      |  COUNT(*) AS n_events
      |FROM g
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  val q09: String =
    """SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
      |  COUNT(*) AS n_events,
      |  COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchases,
      |  CAST(COALESCE(SUM(CAST(value AS DECIMAL(12,2))) FILTER (WHERE event_type = 'purchase'), 0) AS DOUBLE) AS purchase_value
      |FROM events
      |GROUP BY 1
      |ORDER BY 1""".stripMargin

  val q10: String =
    """SELECT event_type,
      |  COUNT(k) AS n_with_k,
      |  CAST(SUM(k) AS BIGINT) AS sum_k,
      |  CAST(MIN(k) AS BIGINT) AS min_k,
      |  CAST(MAX(k) AS BIGINT) AS max_k
      |FROM (SELECT event_type,
      |        CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      |      FROM events) t
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  val q11: String =
    """SELECT event_type,
      |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
      |  COUNT(*) AS n_events
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  val q13: String =
    """SELECT lang, rn, token, n FROM (
      |  SELECT lang, token, n,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, token) AS BIGINT) AS rn
      |  FROM (
      |    SELECT lang, token, COUNT(*) AS n FROM (
      |      SELECT lang, unnest(string_split(text, ' ')) AS token FROM documents) u
      |    WHERE token <> ''
      |    GROUP BY lang, token) g) r
      |WHERE rn <= 5
      |ORDER BY lang, rn""".stripMargin

  val q14: String =
    """SELECT source, COUNT(*) AS n_docs,
      |  CAST(COUNT(DISTINCT text) AS BIGINT) AS n_uniq_text,
      |  CAST(COUNT(DISTINCT array_to_string(list_sort(list_distinct(
      |    list_filter(string_split(text, ' '), x -> x <> ''))), ' ')) AS BIGINT) AS n_uniq_bow
      |FROM documents
      |GROUP BY source
      |ORDER BY source""".stripMargin

  val q15: String =
    """WITH e AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
      |), n AS (
      |  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e
      |), p AS (
      |  SELECT vec_id AS probe_id, v AS pv, nrm AS pnrm FROM n WHERE vec_id < 5
      |), s AS (
      |  SELECT p.probe_id, n.vec_id AS neighbor_id,
      |    list_dot_product(p.pv, n.v) / (p.pnrm * n.nrm) AS sim
      |  FROM p JOIN n ON n.vec_id <> p.probe_id
      |)
      |SELECT probe_id, rank, neighbor_id FROM (
      |  SELECT probe_id, neighbor_id,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rank
      |  FROM s) t
      |WHERE rank <= 10
      |ORDER BY probe_id, rank""".stripMargin

  val q27: String =
    """WITH toks AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
      |  FROM documents
      |), sh AS (
      |  SELECT DISTINCT doc_id, list_extract(t, i) || ' ' || list_extract(t, i+1) || ' ' || list_extract(t, i+2) AS s
      |  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 2)) AS i
      |        FROM toks WHERE len(t) >= 3) x
      |), sizes AS (
      |  SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
      |), sdf AS (
      |  SELECT s, COUNT(*) AS df FROM sh GROUP BY s
      |), rare AS (
      |  SELECT sh.doc_id, sh.s FROM sh JOIN sdf USING (s) WHERE sdf.df <= 64
      |), pairs_rare AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_rare
      |  FROM rare a JOIN rare b ON a.s = b.s AND a.doc_id < b.doc_id
      |  GROUP BY a.doc_id, b.doc_id
      |), common AS (
      |  SELECT sh.doc_id, sh.s FROM sh JOIN sdf USING (s) WHERE sdf.df > 64
      |), pairs_common AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      |  FROM common a JOIN common b ON a.s = b.s AND a.doc_id < b.doc_id
      |  GROUP BY a.doc_id, b.doc_id
      |), scored AS (
      |  SELECT p.doc_a, p.doc_b, p.n_rare + COALESCE(pc.n_common, 0) AS n_inter,
      |    sa.n_sh + sb.n_sh - p.n_rare - COALESCE(pc.n_common, 0) AS n_union
      |  FROM pairs_rare p
      |  LEFT JOIN pairs_common pc ON pc.doc_a = p.doc_a AND pc.doc_b = p.doc_b
      |  JOIN sizes sa ON sa.doc_id = p.doc_a
      |  JOIN sizes sb ON sb.doc_id = p.doc_b
      |)
      |SELECT rank, doc_a, doc_b, n_inter, n_union FROM (
      |  SELECT doc_a, doc_b, n_inter, n_union,
      |    CAST(ROW_NUMBER() OVER (ORDER BY n_inter / n_union DESC, doc_a, doc_b) AS BIGINT) AS rank
      |  FROM scored) t
      |WHERE rank <= 50
      |ORDER BY rank""".stripMargin

  val q29: String =
    """WITH tg AS (
      |  SELECT doc_id, lang, substr(text, i, 3) AS g
      |  FROM (SELECT doc_id, lang, text,
      |          unnest(generate_series(1, length(text) - 2)) AS i
      |        FROM documents WHERE length(text) >= 3) x
      |), train AS (
      |  SELECT lang AS profile_lang, g, COUNT(*) AS cnt
      |  FROM tg WHERE doc_id % 5 = 0
      |  GROUP BY lang, g
      |), scores AS (
      |  SELECT t.doc_id, t.lang, tr.profile_lang, SUM(tr.cnt) AS score
      |  FROM tg t JOIN train tr ON t.g = tr.g
      |  WHERE t.doc_id % 5 <> 0
      |  GROUP BY t.doc_id, t.lang, tr.profile_lang
      |), best AS (
      |  SELECT doc_id, lang, profile_lang,
      |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, profile_lang) AS rn
      |  FROM scores
      |)
      |SELECT lang, profile_lang AS pred_lang, COUNT(*) AS n_docs
      |FROM best WHERE rn = 1
      |GROUP BY lang, profile_lang
      |ORDER BY lang, pred_lang""".stripMargin

  val q30: String =
    """WITH t AS (
      |  SELECT doc_id, lang,
      |    list_filter(string_split(text, ' '), x -> x <> '') AS toks
      |  FROM documents
      |)
      |SELECT doc_id, lang,
      |  CAST(len(toks) AS BIGINT) AS n_tokens,
      |  CAST(len(list_distinct(toks)) AS BIGINT) AS n_uniq,
      |  CAST(CASE WHEN len(toks) > 0 THEN FLOOR(10000 * len(list_distinct(toks)) / len(toks)) ELSE 0 END AS BIGINT) AS ttr_bp,
      |  CAST(CASE WHEN len(toks) > 0 THEN FLOOR(10000 * len(list_filter(toks, x -> x IN ('the','a','of','to','in','and'))) / len(toks)) ELSE 0 END AS BIGINT) AS stop_bp,
      |  CAST(CASE WHEN len(toks) > 0 THEN FLOOR(100 * list_sum(list_transform(toks, x -> len(x))) / len(toks)) ELSE 0 END AS BIGINT) AS avg_len_x100
      |FROM t
      |ORDER BY doc_id""".stripMargin

  val q31: String =
    """WITH t AS (
      |  SELECT lang, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      |  FROM documents
      |)
      |SELECT lang, COUNT(*) AS n_docs,
      |  CAST(SUM(len(toks)) AS BIGINT) AS n_tokens,
      |  CAST(SUM(list_sum(list_transform(toks, x -> len(x)))) AS BIGINT) AS n_token_chars,
      |  CAST(SUM(list_sum(list_transform(toks, x -> CAST(CEIL(len(x) / 4.0) AS BIGINT)))) AS BIGINT) AS n_subwords
      |FROM t
      |GROUP BY lang
      |ORDER BY lang""".stripMargin

  val q33: String =
    """WITH e AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
      |), n AS (
      |  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e
      |), s AS (
      |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
      |    list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS sim
      |  FROM n a JOIN n b ON a.vec_id < b.vec_id
      |)
      |SELECT rank, vec_a, vec_b FROM (
      |  SELECT vec_a, vec_b,
      |    CAST(ROW_NUMBER() OVER (ORDER BY sim DESC, vec_a, vec_b) AS BIGINT) AS rank
      |  FROM s) t
      |WHERE rank <= 20
      |ORDER BY rank""".stripMargin

  val q36: String =
    """WITH e AS (
      |  SELECT user_id, event_id, event_type,
      |    CAST(ts AS TIMESTAMP) AS ts
      |  FROM events
      |), g AS (
      |  SELECT user_id, event_id, event_type,
      |    COUNT(CASE WHEN event_type = 'click' THEN 1 END)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
      |  FROM e
      |), w AS (
      |  SELECT user_id, event_id, event_type,
      |    MAX(CASE WHEN event_type = 'click' THEN event_id END)
      |      OVER (PARTITION BY user_id, grp) AS click_id
      |  FROM g
      |)
      |SELECT user_id, event_id AS purchase_id,
      |  COALESCE(click_id, -1) AS prior_click_id
      |FROM w WHERE event_type = 'purchase'
      |ORDER BY user_id, purchase_id""".stripMargin

  val q37: String =
    """WITH e AS (
      |  SELECT user_id, event_id, event_type,
      |    epoch(date_trunc('second', CAST(ts AS TIMESTAMP))) AS sec
      |  FROM events
      |)
      |SELECT err.user_id, err.event_id AS error_id,
      |  COUNT(*) AS n_after,
      |  CAST(MIN(o.event_id) AS BIGINT) AS first_after_id
      |FROM e err JOIN e o ON o.user_id = err.user_id
      |  AND o.event_type <> 'error'
      |  AND o.sec >= err.sec AND o.sec <= err.sec + 600
      |WHERE err.event_type = 'error'
      |GROUP BY err.user_id, err.event_id
      |ORDER BY err.user_id, error_id""".stripMargin

  val q38: String =
    """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
      |  COALESCE(o_orderpriority, 'ALL') AS priority,
      |  CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
      |  CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
      |  COUNT(*) AS n_orders
      |FROM orders
      |GROUP BY CUBE(o_orderstatus, o_orderpriority)
      |ORDER BY status, priority, g_status, g_priority""".stripMargin

  val q39: String =
    """SELECT p_brand, n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |GROUP BY p_brand, n_name
      |ORDER BY p_brand, n_name""".stripMargin

  val q40: String =
    """SELECT p_partkey, p_brand,
      |  COALESCE(li.n_shipments, 0) AS n_shipments,
      |  COALESCE(li.total_qty, 0.0) AS total_qty
      |FROM part
      |LEFT JOIN (
      |  SELECT l_partkey, COUNT(*) AS n_shipments,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
      |  FROM lineitem GROUP BY l_partkey) li ON p_partkey = li.l_partkey
      |ORDER BY p_partkey""".stripMargin

  val q41: String =
    """SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
      |  COUNT(*) FILTER (WHERE event_type = 'click') AS n_click,
      |  COUNT(*) FILTER (WHERE event_type = 'error') AS n_error,
      |  COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
      |  COUNT(*) FILTER (WHERE event_type = 'signup') AS n_signup,
      |  COUNT(*) FILTER (WHERE event_type = 'view') AS n_view
      |FROM events
      |GROUP BY 1
      |ORDER BY 1""".stripMargin

  val q43: String =
    """SELECT o_orderstatus,
      |  CAST(FLOOR(quantile_cont(o_totalprice, 0.25) * 100) AS BIGINT) AS p25_x100,
      |  CAST(FLOOR(quantile_cont(o_totalprice, 0.50) * 100) AS BIGINT) AS p50_x100,
      |  CAST(FLOOR(quantile_cont(o_totalprice, 0.75) * 100) AS BIGINT) AS p75_x100,
      |  COUNT(*) AS n_orders
      |FROM orders
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin

  /** Session reconstruction complementary to Spark's session_window:
    * break when gap >= 30 min; end = last event + 30 min. */
  val q46: String =
    """WITH e AS (
      |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
      |), g AS (
      |  SELECT user_id, ts,
      |    CASE WHEN LAG(ts) OVER w IS NULL
      |           OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
      |         THEN 1 ELSE 0 END AS brk
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)
      |), s AS (
      |  SELECT user_id, ts,
      |    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
      |                   ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM g)
      |SELECT user_id,
      |  epoch_us(MIN(ts)) AS session_start_us,
      |  epoch_us(MAX(ts) + INTERVAL 30 MINUTE) AS session_end_us,
      |  COUNT(*) AS n_events
      |FROM s GROUP BY user_id, sid
      |ORDER BY user_id, session_start_us""".stripMargin

  /** Exact threshold near-dup over embedding cosine; FLOOR-scaled sims
    * (basis points) — same dot-product evaluation order as q15/q33. */
  val q48: String =
    """WITH e AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
      |), n AS (
      |  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e
      |), s AS (
      |  SELECT a.vec_id AS keep_id, b.vec_id AS drop_id,
      |    CAST(FLOOR(10000 * (list_dot_product(a.v, b.v) / (a.nrm * b.nrm)))
      |      AS BIGINT) AS sim_bp
      |  FROM n a JOIN n b ON a.vec_id < b.vec_id
      |)
      |SELECT keep_id, drop_id, sim_bp FROM s
      |WHERE sim_bp >= 3800
      |ORDER BY keep_id, drop_id""".stripMargin

  /** q55 — connected components over the q48 pair graph via recursive
    * transitive closure + min per node (the declarative mirror of the
    * Spark side's label propagation — both converge to min-member-id
    * components). */
  /** q123 — filtered kNN: q15's exact search with the probe's-own-lang
    * restriction as a PRE-FILTER in the join condition; the neighbor's
    * lang rides in the output so the hash pins the filter row-by-row.
    * vec_id ≡ doc_id per the testdata contract aligns embedding to
    * metadata. Same double-identical dot/divide evaluation as q15. */
  val q123: String =
    """WITH e AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
      |), n AS (
      |  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e
      |), nl AS (
      |  SELECT n.vec_id, n.v, n.nrm, d.lang
      |  FROM n JOIN documents d ON d.doc_id = n.vec_id
      |), p AS (
      |  SELECT vec_id AS probe_id, v AS pv, nrm AS pnrm, lang AS plang
      |  FROM nl WHERE vec_id < 5
      |), s AS (
      |  SELECT p.probe_id, nl.vec_id AS neighbor_id, nl.lang,
      |    list_dot_product(p.pv, nl.v) / (p.pnrm * nl.nrm) AS sim
      |  FROM p JOIN nl ON nl.vec_id <> p.probe_id AND nl.lang = p.plang
      |)
      |SELECT probe_id, rank, neighbor_id, lang FROM (
      |  SELECT probe_id, neighbor_id, lang,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY probe_id
      |      ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rank
      |  FROM s) t
      |WHERE rank <= 10
      |ORDER BY probe_id, rank""".stripMargin

  /** q121 — near-dup dedup materialization: kept = ids never seen as
    * the larger member of a qualifying pair (q48's text embedded
    * verbatim, like q55). NOT IN is null-safe here (drop_id is never
    * NULL); the per-bucket id-sum pins exact membership, not just
    * counts. */
  val q121: String =
    s"""WITH pairs AS (
       |  SELECT keep_id, drop_id FROM (
       |$q48
       |  )
       |)
       |SELECT vec_id % 10 AS bucket, COUNT(*) AS n_kept,
       |  CAST(SUM(vec_id) AS BIGINT) AS id_sum
       |FROM embeddings
       |WHERE vec_id NOT IN (SELECT DISTINCT drop_id FROM pairs)
       |GROUP BY 1 ORDER BY 1""".stripMargin

  val q55: String =
    s"""WITH RECURSIVE pairs AS (
       |  SELECT keep_id, drop_id FROM (
       |$q48
       |  )
       |), ed AS (
       |  SELECT keep_id AS a, drop_id AS b FROM pairs
       |  UNION ALL
       |  SELECT drop_id AS a, keep_id AS b FROM pairs
       |), reach(id, r) AS (
       |  SELECT DISTINCT a, a FROM ed
       |  UNION
       |  SELECT ed.a, rr.r FROM ed JOIN reach rr ON rr.id = ed.b
       |), comp AS (
       |  SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id
       |)
       |SELECT cluster_id, id AS vec_id,
       |  CAST(COUNT(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size
       |FROM comp
       |ORDER BY 1, 2""".stripMargin

  /** q99 — cluster-aware train/val/test split over q55's components:
    * members follow md5(cluster_id)'s bucket (0-7/8/9), singletons
    * bucket by their own id. Composes over the q55 text itself (one
    * source of truth for the closure); the hex→int bucket is the q91
    * portable-hash trick. */
  val q99: String =
    s"""WITH comp AS (
       |  SELECT vec_id AS id, cluster_id FROM (
       |$q55
       |  )
       |), assign AS (
       |  SELECT e.vec_id, COALESCE(comp.cluster_id, e.vec_id) AS cluster_id
       |  FROM embeddings e LEFT JOIN comp ON comp.id = e.vec_id
       |)
       |SELECT vec_id, cluster_id,
       |  CASE WHEN b <= 7 THEN 'train' WHEN b = 8 THEN 'val'
       |       ELSE 'test' END AS split
       |FROM (
       |  SELECT vec_id, cluster_id,
       |    CAST('0x' || substring(md5(CAST(cluster_id AS STRING)), 1, 4)
       |      AS BIGINT) % 10 AS b
       |  FROM assign) t
       |ORDER BY vec_id""".stripMargin

  /** q56 — train/test decontamination: pairs sharing >= 3 rare
    * (df <= 64) distinct 3-token shingles across the md5-addressed
    * test/train split; severity = flagged fraction of the test doc's
    * shingle set in floor basis points. */
  val q56: String =
    """WITH toks AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
      |  FROM documents
      |), sh AS (
      |  SELECT DISTINCT doc_id, list_extract(t, i) || ' ' || list_extract(t, i+1) || ' ' || list_extract(t, i+2) AS s
      |  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 2)) AS i
      |        FROM toks WHERE len(t) >= 3) x
      |), sizes AS (
      |  SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
      |), sdf AS (
      |  SELECT s, COUNT(*) AS df FROM sh GROUP BY s
      |), rare AS (
      |  SELECT sh.doc_id, sh.s FROM sh JOIN sdf USING (s) WHERE sdf.df <= 64
      |), split AS (
      |  SELECT doc_id,
      |    substr(md5(CAST(doc_id AS STRING)), 1, 2) < '10' AS is_test
      |  FROM documents
      |), overlap AS (
      |  SELECT te.doc_id AS test_id, tr.doc_id AS train_id,
      |    COUNT(*) AS n_overlap
      |  FROM rare te
      |  JOIN split ste ON ste.doc_id = te.doc_id AND ste.is_test
      |  JOIN rare tr ON tr.s = te.s
      |  JOIN split str ON str.doc_id = tr.doc_id AND NOT str.is_test
      |  GROUP BY te.doc_id, tr.doc_id
      |  HAVING COUNT(*) >= 3
      |)
      |SELECT o.test_id, o.train_id, o.n_overlap,
      |  CAST(FLOOR(10000 * o.n_overlap / z.n_sh) AS BIGINT) AS contam_bp
      |FROM overlap o JOIN sizes z ON z.doc_id = o.test_id
      |ORDER BY o.n_overlap DESC, o.test_id, o.train_id""".stripMargin

  /** q57 — shard packing: the declarative (global-window) mirror of the
    * Spark side's two-level distributed prefix sum; both compute
    * shard_id = floor(tokens-before-doc / 4096) over the md5-shuffled
    * concatenation order. */
  val q57: String =
    """WITH d AS (
      |  SELECT doc_id,
      |    len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tok,
      |    md5(CAST(doc_id AS STRING)) AS ord
      |  FROM documents
      |), c AS (
      |  SELECT doc_id, n_tok,
      |    COALESCE(SUM(n_tok) OVER (ORDER BY ord, doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef
      |  FROM d
      |)
      |SELECT CAST(FLOOR(bef / 4096) AS BIGINT) AS shard_id,
      |  COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS n_tokens
      |FROM c
      |GROUP BY 1
      |ORDER BY 1""".stripMargin

  /** q58 — the plain (unsalted) form of the salted profile join;
    * salting must be result-invisible, so the oracle simply omits it. */
  val q58: String =
    """WITH d AS (
      |  SELECT doc_id, lang,
      |    CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
      |      AS BIGINT) AS n_tok
      |  FROM documents
      |), p AS (
      |  SELECT lang, AVG(n_tok) AS avg_tok FROM d GROUP BY lang
      |)
      |SELECT d.doc_id, d.lang, d.n_tok,
      |  CAST(FLOOR(100 * p.avg_tok) AS BIGINT) AS avg_x100,
      |  CAST(FLOOR(100 * (d.n_tok - p.avg_tok)) AS BIGINT) AS dev_x100
      |FROM d JOIN p USING (lang)
      |ORDER BY d.doc_id""".stripMargin

  /** q59 — rational TF-IDF top-3 terms per doc; both engines rank by
    * the same floored integer score, so order is hash-exact. */
  val q59: String =
    """WITH tok AS (
      |  SELECT doc_id,
      |    unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
      |  FROM documents
      |), tf AS (
      |  SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2
      |), df AS (
      |  SELECT term, COUNT(*) AS df
      |  FROM (SELECT DISTINCT doc_id, term FROM tok) GROUP BY 1
      |), n AS (
      |  SELECT COUNT(*) AS n FROM documents
      |), scored AS (
      |  SELECT tf.doc_id, tf.term, tf.tf,
      |    CAST(FLOOR(10000 * tf.tf * n.n / df.df) AS BIGINT) AS score_bp
      |  FROM tf JOIN df USING (term) CROSS JOIN n
      |)
      |SELECT doc_id, rn, term, CAST(tf AS BIGINT) AS tf, score_bp FROM (
      |  SELECT doc_id, term, tf, score_bp,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
      |      ORDER BY score_bp DESC, term) AS BIGINT) AS rn
      |  FROM scored) t
      |WHERE rn <= 3
      |ORDER BY doc_id, rn""".stripMargin

  val q54: String =
    """WITH rates(lang, thr) AS (VALUES
      |  ('en','80'),('de','40'),('fr','40'),('es','20'),('zh','20'))
      |SELECT d.lang, d.doc_id,
      |  substr(md5(CAST(d.doc_id AS STRING)), 1, 2) AS bucket
      |FROM documents d JOIN rates r ON r.lang = d.lang
      |WHERE substr(md5(CAST(d.doc_id AS STRING)), 1, 2) < r.thr
      |ORDER BY d.lang, d.doc_id""".stripMargin

  val q47: String =
    """SELECT MIN(doc_id) AS doc_id,
      |  arg_min(source, doc_id) AS source,
      |  arg_min(lang, doc_id) AS lang,
      |  COUNT(*) AS n_dups
      |FROM (
      |  SELECT doc_id, source, lang,
      |    array_to_string(list_sort(list_distinct(
      |      list_filter(string_split(text, ' '), x -> x <> ''))), ' ') AS bow
      |  FROM documents) d
      |GROUP BY bow
      |ORDER BY doc_id""".stripMargin

  val q12: String =
    """SELECT op, user_id FROM (
      |  SELECT 'click_and_purchase' AS op, user_id FROM (
      |    SELECT user_id FROM events WHERE event_type = 'click'
      |    INTERSECT
      |    SELECT user_id FROM events WHERE event_type = 'purchase') a
      |  UNION ALL
      |  SELECT 'view_no_error' AS op, user_id FROM (
      |    SELECT user_id FROM events WHERE event_type = 'view'
      |    EXCEPT
      |    SELECT user_id FROM events WHERE event_type = 'error') b
      |) u
      |ORDER BY op, user_id""".stripMargin

  /** q60 — moment aggregates floored at x100; avg is exact (integer-
    * valued doubles), the moments agree to ~1e-12 relative — far inside
    * the floor's slack. */
  val q60: String =
    """SELECT l_returnflag,
      |  COUNT(*) AS n,
      |  CAST(FLOOR(100 * corr(l_quantity, l_extendedprice)) AS BIGINT)
      |    AS corr_x100,
      |  CAST(FLOOR(100 * covar_samp(l_quantity, l_extendedprice)) AS BIGINT)
      |    AS covar_x100,
      |  CAST(FLOOR(100 * stddev_samp(l_extendedprice)) AS BIGINT)
      |    AS sd_price_x100,
      |  CAST(FLOOR(100 * avg(l_quantity)) AS BIGINT) AS avg_qty_x100
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin

  /** q61 — rank ratios are integer/integer divisions: bit-exact. */
  val q61: String =
    """SELECT c_mktsegment, c_custkey,
      |  CAST(ntile(10) OVER w AS BIGINT) AS decile,
      |  CAST(FLOOR(10000 * percent_rank() OVER w) AS BIGINT) AS pr_bp,
      |  CAST(FLOOR(10000 * cume_dist() OVER w) AS BIGINT) AS cd_bp
      |FROM customer
      |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
      |ORDER BY c_mktsegment, c_custkey""".stripMargin

  /** q62 — levenshtein is integer-exact; string_split is 1-indexed here
    * (Spark's getItem(1) is the same 2nd token, 0-indexed). */
  val q62: String =
    """WITH names AS (
      |  SELECT p_name AS name, list_extract(string_split(p_name, ' '), 2) AS noun,
      |    COUNT(*) AS n_parts
      |  FROM part GROUP BY 1, 2
      |)
      |SELECT a.name AS name_a, b.name AS name_b,
      |  CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist,
      |  a.n_parts AS cnt_a, b.n_parts AS cnt_b
      |FROM names a JOIN names b ON a.noun = b.noun AND a.name < b.name
      |WHERE levenshtein(a.name, b.name) <= 4
      |ORDER BY name_a, name_b""".stripMargin

  /** q63 — revenue is an exact DECIMAL sum cast to double (the q01/q02
    | convention), immune to double-summation order. */
  val q63: String =
    """WITH parsed AS (
      |  SELECT CAST(regexp_extract(c_name, '#([0-9]+)', 1) AS BIGINT) AS cid,
      |    c_mktsegment
      |  FROM customer
      |)
      |SELECT p.c_mktsegment, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o.o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
      |FROM parsed p JOIN orders o ON o.o_custkey = p.cid
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** q64 — bin edges from exact min/max; the bin expression keeps the
    * identical association on both sides, so bins are bit-identical. */
  val q64: String =
    """WITH mm AS (
      |  SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi FROM orders
      |)
      |SELECT
      |  CAST(CASE WHEN hi = lo THEN 0 ELSE
      |    LEAST(FLOOR((o_totalprice - lo) * 20 / (hi - lo)), 19) END AS BIGINT)
      |    AS bin,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS tot
      |FROM orders CROSS JOIN mm
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** q65 — bigram LM: counts and integer-in double division only. */
  val q65: String =
    """WITH toks AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
      |  FROM documents
      |), bg AS (
      |  SELECT unnest(list_transform(generate_series(1, len(t)-1),
      |      i -> list_value(list_extract(t, i), list_extract(t, i+1)))) AS pair
      |  FROM toks WHERE len(t) >= 2
      |), bc AS (
      |  SELECT list_extract(pair, 1) AS w1, list_extract(pair, 2) AS w2, COUNT(*) AS c2 FROM bg GROUP BY 1,2
      |), uc AS (
      |  SELECT w1, SUM(c2) AS c1 FROM bc GROUP BY 1
      |)
      |SELECT w1, rn, w2, c2, p_bp FROM (
      |  SELECT bc.w1, bc.w2, bc.c2,
      |    CAST(FLOOR(10000 * bc.c2 / uc.c1) AS BIGINT) AS p_bp,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY bc.w1
      |      ORDER BY bc.c2 DESC, bc.w2) AS BIGINT) AS rn
      |  FROM bc JOIN uc USING (w1)) x
      |WHERE rn <= 3 ORDER BY w1, rn""".stripMargin

  /** q120 — perplexity filter: per-bigram surprisal is integerized
    * (`FLOOR(10000 * LN(c1/c2))`) BEFORE the per-doc SUM, so the
    * aggregate is integer-exact and order-independent in both engines;
    * the single double op per distinct bigram is the same IEEE ln /
    * divide in both, and a floor-boundary flip would need the true
    * value within ~1 ulp of an integer — ruled out in practice for
    * rational c1/c2 ratios. mean_dbp divides two exact integers as
    * doubles (< 2^53) and floors. LIMIT ties are impossible: the
    * ORDER BY key (mean_dbp, doc_id) is unique per doc. */
  val q120: String =
    """WITH toks AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
      |  FROM documents
      |), bg AS (
      |  SELECT doc_id, unnest(list_transform(generate_series(1, len(t)-1),
      |      i -> list_value(list_extract(t, i), list_extract(t, i+1)))) AS pair
      |  FROM toks WHERE len(t) >= 2
      |), bgw AS (
      |  SELECT doc_id, list_extract(pair, 1) AS w1, list_extract(pair, 2) AS w2
      |  FROM bg
      |), bc AS (
      |  SELECT w1, w2, COUNT(*) AS c2 FROM bgw GROUP BY 1, 2
      |), uc AS (
      |  SELECT w1, CAST(SUM(c2) AS BIGINT) AS c1 FROM bc GROUP BY 1
      |), scored AS (
      |  SELECT bgw.doc_id,
      |    CAST(FLOOR(10000 * LN(CAST(uc.c1 AS DOUBLE) / bc.c2)) AS BIGINT) AS s
      |  FROM bgw JOIN bc USING (w1, w2) JOIN uc USING (w1)
      |), perdoc AS (
      |  SELECT doc_id, COUNT(*) AS n_bigrams,
      |    CAST(SUM(s) AS BIGINT) AS surprisal_dbp
      |  FROM scored GROUP BY doc_id
      |)
      |SELECT doc_id, n_bigrams, surprisal_dbp,
      |  CAST(FLOOR(CAST(surprisal_dbp AS DOUBLE) / n_bigrams) AS BIGINT)
      |    AS mean_dbp
      |FROM perdoc
      |ORDER BY mean_dbp DESC, doc_id
      |LIMIT 20""".stripMargin

  /** q122 — MinHash dedup materialization: kept = docs never the
    * larger member of a q91 candidate pair with verified Jaccard ≥
    * 0.8. Embeds q91's text verbatim (q55/q121's idiom); NOT IN is
    * null-safe (doc_b never NULL); per-lang id-sums pin membership.
    * NULLS FIRST pins the engines' null-sort defaults should lang
    * ever carry NULL. */
  lazy val q122: String =
    s"""WITH pairs AS (
       |  SELECT doc_a, doc_b, n_inter, jac_bp FROM (
       |$q91
       |  )
       |)
       |SELECT lang, COUNT(*) AS n_kept, CAST(SUM(doc_id) AS BIGINT) AS id_sum
       |FROM documents
       |WHERE doc_id NOT IN (
       |  SELECT DISTINCT doc_b FROM pairs WHERE jac_bp >= 8000)
       |GROUP BY lang ORDER BY lang NULLS FIRST""".stripMargin

  /** q129 — the streaming-admission audit: the engine's stateful
    * per-bucket admitter (batch-declared: arrival order = id order)
    * rejects a doc iff an earlier bucket-mate agrees on ≥ 6 of its 8
    * md5-portable signature minima. Because every signature component
    * is a deterministic md5 derivation, DuckDB rebuilds signatures,
    * band-0 buckets (joined on the four raw minima — byte-equivalent
    * to the engine's md5 bucket key), the agreement count, and the
    * greedy rule (a rejected doc still rejects later ones — state
    * admits every arrival) verbatim; docs too short to shingle never
    * appear in `keyed` and stay admitted through the LEFT JOIN. Hash
    * equality proves the streaming operator's per-bucket state
    * machine computes exactly this relational semantics. */
  lazy val q129: String =
    s"""WITH toks AS (
       |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
       |  FROM documents
       |), sh AS (
       |  SELECT doc_id, unnest(list_distinct(list_transform(
       |      generate_series(1, len(t) - 2),
       |      i -> list_extract(t, i) || ' ' || list_extract(t, i+1) || ' ' || list_extract(t, i+2)))) AS s
       |  FROM toks WHERE len(t) >= 3
       |), hx AS (
       |  SELECT doc_id,
       |    substr(md5('0:' || s), 1, 15) AS x0,
       |    substr(md5('1:' || s), 1, 15) AS x1,
       |    substr(md5('2:' || s), 1, 15) AS x2,
       |    substr(md5('3:' || s), 1, 15) AS x3,
       |    substr(md5('4:' || s), 1, 15) AS x4,
       |    substr(md5('5:' || s), 1, 15) AS x5,
       |    substr(md5('6:' || s), 1, 15) AS x6,
       |    substr(md5('7:' || s), 1, 15) AS x7
       |  FROM sh
       |), keyed AS (
       |  SELECT doc_id,
       |    MIN(${hex15("x0")}) AS h0,
       |    MIN(${hex15("x1")}) AS h1,
       |    MIN(${hex15("x2")}) AS h2,
       |    MIN(${hex15("x3")}) AS h3,
       |    MIN(${hex15("x4")}) AS h4,
       |    MIN(${hex15("x5")}) AS h5,
       |    MIN(${hex15("x6")}) AS h6,
       |    MIN(${hex15("x7")}) AS h7
       |  FROM hx GROUP BY 1
       |), rej AS (
       |  SELECT DISTINCT a.doc_id
       |  FROM keyed a JOIN keyed b
       |    ON a.h0 = b.h0 AND a.h1 = b.h1 AND a.h2 = b.h2 AND a.h3 = b.h3
       |    AND b.doc_id < a.doc_id
       |  WHERE (CASE WHEN a.h0 = b.h0 THEN 1 ELSE 0 END
       |       + CASE WHEN a.h1 = b.h1 THEN 1 ELSE 0 END
       |       + CASE WHEN a.h2 = b.h2 THEN 1 ELSE 0 END
       |       + CASE WHEN a.h3 = b.h3 THEN 1 ELSE 0 END
       |       + CASE WHEN a.h4 = b.h4 THEN 1 ELSE 0 END
       |       + CASE WHEN a.h5 = b.h5 THEN 1 ELSE 0 END
       |       + CASE WHEN a.h6 = b.h6 THEN 1 ELSE 0 END
       |       + CASE WHEN a.h7 = b.h7 THEN 1 ELSE 0 END) >= 6
       |)
       |SELECT d.lang, COUNT(*) AS n_docs,
       |  CAST(SUM(CASE WHEN r.doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_admitted,
       |  CAST(COALESCE(SUM(CASE WHEN r.doc_id IS NULL THEN d.doc_id END), 0)
       |    AS BIGINT) AS id_sum
       |FROM documents d LEFT JOIN rej r ON d.doc_id = r.doc_id
       |GROUP BY d.lang ORDER BY d.lang NULLS FIRST""".stripMargin

  /** q132 — the hybrid-retrieval audit: both arms are engine-exact —
    * the lexical arm counts shared DISTINCT tokens (integers), the
    * semantic arm is q15's bit-comparable cosine — and the RRF scores
    * 1/(60+rank) are the same IEEE divisions on integer ranks in both
    * engines, so the fused ranking (ranks + provenance flags only, no
    * floats in the output) hash-matches: the fusion SEMANTICS are
    * proven, not approximated. `CAST(1 AS DOUBLE)` forces double
    * division (a bare 1.0 is DECIMAL in DuckDB, double in Spark —
    * the one literal the engines type differently). */
  val q132: String =
    """WITH e AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
      |), n AS (
      |  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e
      |), p AS (
      |  SELECT vec_id AS probe_id, v AS pv, nrm AS pnrm FROM n WHERE vec_id < 5
      |), sem AS (
      |  SELECT p.probe_id, n.vec_id AS doc_id,
      |    list_dot_product(p.pv, n.v) / (p.pnrm * n.nrm) AS sim
      |  FROM p JOIN n ON n.vec_id <> p.probe_id
      |), semr AS (
      |  SELECT probe_id, doc_id, r_sem FROM (
      |    SELECT probe_id, doc_id,
      |      ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY sim DESC, doc_id) AS r_sem
      |    FROM sem) t WHERE r_sem <= 20
      |), dt AS (
      |  SELECT doc_id, unnest(list_distinct(list_filter(string_split(text, ' '), x -> x <> ''))) AS tok
      |  FROM documents
      |), pt AS (
      |  SELECT doc_id AS probe_id, tok FROM dt WHERE doc_id < 5
      |), lex AS (
      |  SELECT p2.probe_id, d.doc_id, COUNT(*) AS n_shared
      |  FROM pt p2 JOIN dt d ON d.tok = p2.tok AND d.doc_id <> p2.probe_id
      |  GROUP BY 1, 2
      |), lexr AS (
      |  SELECT probe_id, doc_id, r_lex FROM (
      |    SELECT probe_id, doc_id,
      |      ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY n_shared DESC, doc_id) AS r_lex
      |    FROM lex) t WHERE r_lex <= 20
      |), fused AS (
      |  SELECT COALESCE(l.probe_id, s.probe_id) AS probe_id,
      |    COALESCE(l.doc_id, s.doc_id) AS doc_id,
      |    COALESCE(CAST(1 AS DOUBLE) / (60 + l.r_lex), 0) +
      |      COALESCE(CAST(1 AS DOUBLE) / (60 + s.r_sem), 0) AS score,
      |    CASE WHEN l.r_lex IS NULL THEN 0 ELSE 1 END AS from_lex,
      |    CASE WHEN s.r_sem IS NULL THEN 0 ELSE 1 END AS from_sem
      |  FROM lexr l FULL JOIN semr s
      |    ON l.probe_id = s.probe_id AND l.doc_id = s.doc_id
      |)
      |SELECT probe_id, rank, doc_id,
      |  CAST(from_lex AS BIGINT) AS from_lex,
      |  CAST(from_sem AS BIGINT) AS from_sem
      |FROM (
      |  SELECT probe_id, doc_id, from_lex, from_sem,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY score DESC, doc_id) AS BIGINT) AS rank
      |  FROM fused) t
      |WHERE rank <= 10
      |ORDER BY probe_id, rank""".stripMargin

  /** q126 — the incremental-dedup audit: the engine admits the
    * incoming slice (`doc_id % 3 = 0`) against the already-admitted
    * corpus by probing the band index with ONLY the slice's keys; the
    * oracle derives the same rejected set from q91's FULL pair list
    * (doc_a < doc_b throughout) — an incoming doc is rejected iff it
    * is the `doc_b` of a qualifying pair whose partner is anything
    * (covers corpus-partner-with-smaller-id AND keep-first inside the
    * slice), or the `doc_a` of a qualifying pair whose partner is a
    * CORPUS doc (the corpus is immutable: a new doc loses to an
    * admitted near-dup regardless of id order). Hash equality proves
    * the engine's restricted candidate join drops no qualifying pair
    * and admits no near-dup. LEFT JOIN instead of a projected IN
    * (Spark confines IN-subqueries to filters — the sweep runs this
    * text verbatim); UNION (distinct) keeps the rejected set a set. */
  lazy val q126: String =
    s"""WITH pairs AS (
       |  SELECT doc_a, doc_b, n_inter, jac_bp FROM (
       |$q91
       |  )
       |), rejected AS (
       |  SELECT doc_b AS doc_id FROM pairs
       |  WHERE jac_bp >= 8000 AND doc_b % 3 = 0
       |  UNION
       |  SELECT doc_a AS doc_id FROM pairs
       |  WHERE jac_bp >= 8000 AND doc_a % 3 = 0 AND doc_b % 3 <> 0
       |)
       |SELECT d.lang, COUNT(*) AS n_new,
       |  CAST(SUM(CASE WHEN r.doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_admitted,
       |  CAST(COALESCE(SUM(CASE WHEN r.doc_id IS NULL THEN d.doc_id END), 0)
       |    AS BIGINT) AS id_sum
       |FROM documents d LEFT JOIN rejected r ON d.doc_id = r.doc_id
       |WHERE d.doc_id % 3 = 0
       |GROUP BY d.lang ORDER BY d.lang NULLS FIRST""".stripMargin

  /** q66 — medians of integer counts interpolate to k or k+0.5 exactly
    * in both engines (quantile_cont ≙ Spark percentile), so the ×10
    * integerization and the 2·MAD comparison are exact. */
  val q66: String =
    """WITH d AS (
      |  SELECT doc_id, lang,
      |    CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
      |      AS BIGINT) AS n_tok
      |  FROM documents
      |), med AS (
      |  SELECT lang, median(n_tok) AS med FROM d GROUP BY 1
      |), mad AS (
      |  SELECT d.lang, median(abs(d.n_tok - med.med)) AS mad
      |  FROM d JOIN med USING (lang) GROUP BY 1
      |)
      |SELECT d.doc_id, d.lang, d.n_tok,
      |  CAST(FLOOR(10 * med.med) AS BIGINT) AS med_x10,
      |  CAST(FLOOR(10 * mad.mad) AS BIGINT) AS mad_x10
      |FROM d JOIN med USING (lang) JOIN mad USING (lang)
      |WHERE abs(d.n_tok - med.med) > 2 * mad.mad
      |ORDER BY d.doc_id""".stripMargin

  /** q67 — integer counts and integer-in double division only. */
  val q67: String =
    """WITH toks AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
      |  FROM documents
      |), sh AS (
      |  SELECT doc_id, unnest(list_transform(generate_series(1, len(t)-2),
      |      i -> list_extract(t, i) || ' ' || list_extract(t, i+1) || ' ' || list_extract(t, i+2))) AS s
      |  FROM toks WHERE len(t) >= 3
      |), c AS (
      |  SELECT doc_id, s, COUNT(*) AS c FROM sh GROUP BY 1, 2
      |), a AS (
      |  SELECT doc_id, SUM(c) AS n_sh, COUNT(*) AS n_uniq, MAX(c) AS max_c
      |  FROM c GROUP BY 1
      |)
      |SELECT doc_id, CAST(n_sh AS BIGINT) AS n_sh,
      |  CAST(FLOOR(10000 * (n_sh - n_uniq) / n_sh) AS BIGINT) AS dup_bp,
      |  CAST(FLOOR(10000 * max_c / n_sh) AS BIGINT) AS top_bp
      |FROM a ORDER BY doc_id""".stripMargin

  /** q68 — the oracle aggregates the ORIGINAL parquet; the engine
    * aggregates its CSV-roundtripped copy, so a hash match proves the
    * CSV sink/source path loses nothing. */
  val q68: String =
    """SELECT lang, COUNT(*) AS n_docs,
      |  CAST(SUM(len(list_filter(string_split(text, ' '), x -> x <> '')))
      |    AS BIGINT) AS n_tokens,
      |  CAST(SUM(len(text)) AS BIGINT) AS n_text_chars
      |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin

  /** q72 — the oracle is the full-scan predicate; the engine's
    * trigram-index route must return exactly this set. */
  val q72: String =
    """SELECT doc_id, lang FROM documents
      |WHERE contains(text, 'hash join')
      |ORDER BY doc_id""".stripMargin

  /** q71 — int8 quantize → dequantize → the q15 scoring pass. round()
    * ties go away from zero in both engines, and q·scale is the same
    * IEEE product, so the dequantized cosines are bit-comparable. */
  val q71: String =
    """WITH e AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
      |), qz AS (
      |  SELECT vec_id,
      |    list_max(list_transform(v, x -> abs(x))) / 127 AS scale, v
      |  FROM e
      |), dq AS (
      |  SELECT vec_id,
      |    list_transform(v, x -> CAST(round(x / scale) AS INTEGER) * scale)
      |      AS dv
      |  FROM qz
      |), n AS (
      |  SELECT vec_id, dv, sqrt(list_dot_product(dv, dv)) AS nrm FROM dq
      |), p AS (
      |  SELECT vec_id AS probe_id, dv AS pv, nrm AS pnrm FROM n
      |  WHERE vec_id < 5
      |), s AS (
      |  SELECT p.probe_id, n.vec_id AS neighbor_id,
      |    list_dot_product(p.pv, n.dv) / (p.pnrm * n.nrm) AS sim
      |  FROM p JOIN n ON n.vec_id <> p.probe_id
      |)
      |SELECT probe_id, rank, neighbor_id FROM (
      |  SELECT probe_id, neighbor_id,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY probe_id
      |      ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rank
      |  FROM s) t
      |WHERE rank <= 10
      |ORDER BY probe_id, rank""".stripMargin

  /** q70 — explicit grouping sets; nulls coalesced to 'ALL' pre-sort
    * (q38 convention) so null ordering can't diverge. */
  val q70: String =
    """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
      |  COALESCE(o_orderpriority, 'ALL') AS priority,
      |  CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
      |  CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
      |  COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
      |  (o_orderstatus, o_orderpriority))
      |ORDER BY status, priority, g_status, g_priority""".stripMargin

  /** q69 — md5 of the decimal doc_id string, same addressing as q54. */
  val q69: String =
    """SELECT lang, rnk, doc_id FROM (
      |  SELECT lang, doc_id,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY lang
      |      ORDER BY md5(CAST(doc_id AS STRING)), doc_id) AS BIGINT) AS rnk
      |  FROM documents) t
      |WHERE rnk <= 10 ORDER BY lang, rnk""".stripMargin

  /** q74 — sliding token chunks, size 32 / stride 24; chunk starts are
    * every stride multiple below the token count (generate_series stop
    * is inclusive, hence len(t)-1), list_slice's inclusive end =
    * Spark's slice(start+1, 32). */
  val q74: String =
    """WITH toks AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
      |  FROM documents
      |), st AS (
      |  SELECT doc_id, t, unnest(generate_series(0, len(t) - 1, 24)) AS s
      |  FROM toks WHERE len(t) >= 1
      |)
      |SELECT doc_id, CAST(divide(s, 24) AS BIGINT) AS chunk_id,
      |  CAST(len(list_slice(t, s + 1, s + 32)) AS BIGINT) AS n_tok,
      |  array_to_string(list_slice(t, s + 1, s + 32), ' ') AS chunk
      |FROM st ORDER BY doc_id, chunk_id""".stripMargin

  /** q133 — the passage-retrieval audit: q74's deterministic chunking
    * re-stated, each probe's distinct tokens joined against per-chunk
    * distinct tokens, integer overlap counts, best-chunk-per-doc (max
    * score, earliest chunk), docs ranked top-5 per probe. Integers end
    * to end, so the whole max-passage pipeline hash-matches. */
  val q133: String =
    """WITH toks AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
      |  FROM documents
      |), pt AS (
      |  SELECT doc_id AS probe_id, unnest(list_distinct(t)) AS tok
      |  FROM toks WHERE doc_id < 3 AND len(t) >= 1
      |), st AS (
      |  SELECT doc_id, t, unnest(generate_series(0, len(t) - 1, 24)) AS s
      |  FROM toks WHERE doc_id >= 3 AND len(t) >= 1
      |), ct AS (
      |  SELECT doc_id, CAST(divide(s, 24) AS BIGINT) AS chunk_id,
      |    unnest(list_distinct(list_slice(t, s + 1, s + 32))) AS tok
      |  FROM st
      |), scored AS (
      |  SELECT p.probe_id, c.doc_id, c.chunk_id, COUNT(*) AS score
      |  FROM pt p JOIN ct c ON c.tok = p.tok
      |  GROUP BY 1, 2, 3
      |), best AS (
      |  SELECT probe_id, doc_id, chunk_id, score FROM (
      |    SELECT probe_id, doc_id, chunk_id, score,
      |      ROW_NUMBER() OVER (PARTITION BY probe_id, doc_id
      |        ORDER BY score DESC, chunk_id) AS rn
      |    FROM scored) t WHERE rn = 1
      |)
      |SELECT probe_id, rank, doc_id, chunk_id, CAST(score AS BIGINT) AS score
      |FROM (
      |  SELECT probe_id, doc_id, chunk_id, score,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY probe_id
      |      ORDER BY score DESC, doc_id) AS BIGINT) AS rank
      |  FROM best) t
      |WHERE rank <= 5
      |ORDER BY probe_id, rank""".stripMargin

  /** q75 — per-lang quota = ceil(8·√n) (α=0.5 temperature), selection =
    * quota smallest md5(doc_id); √/ceil are correctly-rounded IEEE in
    * both engines so the quotas agree exactly. */
  val q75: String =
    """SELECT lang, rnk, doc_id, quota FROM (
      |  SELECT lang, doc_id,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY lang
      |      ORDER BY md5(CAST(doc_id AS STRING)), doc_id) AS BIGINT) AS rnk,
      |    CAST(LEAST(COUNT(*) OVER (PARTITION BY lang),
      |      CAST(CEIL(8 * SQRT(COUNT(*) OVER (PARTITION BY lang))) AS BIGINT))
      |      AS BIGINT) AS quota
      |  FROM documents) t
      |WHERE rnk <= quota ORDER BY lang, rnk""".stripMargin

  /** q76 — oracle aggregates the ORIGINAL parquet per source; the
    * engine aggregates its ORC-roundtripped copy (q68's contract). */
  val q76: String =
    """SELECT source, COUNT(*) AS n_docs,
      |  CAST(SUM(len(list_filter(string_split(text, ' '), x -> x <> '')))
      |    AS BIGINT) AS n_tokens,
      |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars
      |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin

  /** q77 — identical synthetic-PII injection, then identical
    * character-class-only regexes (the Java-regex ∩ RE2 portable
    * subset); 'g' makes DuckDB's regexp_replace global like Spark's. */
  val q77: String =
    """WITH aug AS (
      |  SELECT doc_id, text || ' contact user' || CAST(doc_id AS STRING)
      |    || '@mail.example or call '
      |    || CAST(doc_id % 900 + 100 AS STRING) || '-'
      |    || lpad(CAST((doc_id * 7) % 10000 AS STRING), 4, '0') AS aug
      |  FROM documents
      |), cl AS (
      |  SELECT doc_id, aug,
      |    regexp_replace(regexp_replace(aug,
      |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}', '<EMAIL>', 'g'),
      |      '[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS clean
      |  FROM aug
      |)
      |SELECT doc_id,
      |  CAST(len(regexp_extract_all(aug,
      |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}')) AS BIGINT)
      |    AS n_emails,
      |  CAST(len(regexp_extract_all(aug, '[0-9]{3}-[0-9]{4}')) AS BIGINT)
      |    AS n_phones,
      |  CAST(len(aug) AS BIGINT) AS len_raw,
      |  CAST(len(clean) AS BIGINT) AS len_clean,
      |  md5(clean) AS md5_clean
      |FROM cl ORDER BY doc_id""".stripMargin

  /** q78 — distinct 4-grams per doc, global first owner = min(doc_id),
    * novelty = floored basis points of grams first owned. */
  val q78: String =
    """WITH toks AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
      |  FROM documents
      |), sh AS (
      |  SELECT doc_id, unnest(list_transform(generate_series(1, len(t) - 3),
      |      i -> list_extract(t, i) || ' ' || list_extract(t, i+1) || ' ' || list_extract(t, i+2) || ' ' || list_extract(t, i+3))) AS g
      |  FROM toks WHERE len(t) >= 4
      |), gr AS (
      |  SELECT DISTINCT doc_id, g FROM sh
      |), o AS (
      |  SELECT g, MIN(doc_id) AS owner FROM gr GROUP BY 1
      |)
      |SELECT gr.doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
      |  CAST(SUM(CASE WHEN o.owner = gr.doc_id THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_novel,
      |  CAST(FLOOR(10000 * SUM(CASE WHEN o.owner = gr.doc_id THEN 1 ELSE 0 END)
      |    / COUNT(*)) AS BIGINT) AS novelty_bp
      |FROM gr JOIN o USING (g)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** q79 — the composed curation pipeline: quality gate → q47 dedup
    * rule → q75 quota rule (4·√n over the survivors) → per-lang
    * accounting. 4096.0 is a power of two, so the shard division is
    * exact binary and ceil agrees engine-for-engine. */
  val q79: String =
    """WITH toks AS (
      |  SELECT doc_id, lang,
      |    list_filter(string_split(text, ' '), x -> x <> '') AS t
      |  FROM documents
      |), gated AS (
      |  SELECT doc_id, lang, len(t) AS n_tok,
      |    array_to_string(list_sort(list_distinct(t)), ' ') AS bow
      |  FROM toks WHERE len(t) BETWEEN 20 AND 80
      |), dedup AS (
      |  SELECT MIN(doc_id) AS doc_id, arg_min(lang, doc_id) AS lang,
      |    arg_min(n_tok, doc_id) AS n_tok
      |  FROM gated GROUP BY bow
      |), ranked AS (
      |  SELECT lang, doc_id, n_tok,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY lang
      |      ORDER BY md5(CAST(doc_id AS STRING)), doc_id) AS BIGINT) AS rnk,
      |    CAST(LEAST(COUNT(*) OVER (PARTITION BY lang),
      |      CAST(CEIL(4 * SQRT(COUNT(*) OVER (PARTITION BY lang)))
      |        AS BIGINT)) AS BIGINT) AS quota
      |  FROM dedup
      |)
      |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
      |  CAST(CEIL(SUM(n_tok) / 4096.0) AS BIGINT) AS n_shards
      |FROM ranked WHERE rnk <= quota
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** q81 — densify each user's purchase span day-by-day and forward
    * fill; the fill copies doubles (no float arithmetic). The fill is
    * the count-partition spelling of LAST_VALUE ... IGNORE NULLS
    * (which has no dialect-shared syntax): the running count of
    * non-null observations groups each observation with the gap rows
    * after it, and MAX over that group copies the one value forward. */
  val q81: String =
    """WITH ev AS (
      |  SELECT user_id, CAST(ts AS DATE) AS day, ts, event_id, value
      |  FROM events WHERE event_type = 'purchase' AND value IS NOT NULL
      |), daily AS (
      |  SELECT user_id, day, value FROM (
      |    SELECT user_id, day, value,
      |      ROW_NUMBER() OVER (PARTITION BY user_id, day
      |        ORDER BY ts DESC, event_id DESC) AS rn
      |    FROM ev) t
      |  WHERE rn = 1
      |), span AS (
      |  SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY 1
      |), dense0 AS (
      |  SELECT user_id,
      |    unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day_raw
      |  FROM span
      |), dense AS (
      |  SELECT user_id, CAST(day_raw AS DATE) AS day FROM dense0
      |), joined AS (
      |  SELECT dense.user_id, dense.day, daily.value
      |  FROM dense LEFT JOIN daily
      |    ON dense.user_id = daily.user_id AND dense.day = daily.day
      |), grouped AS (
      |  SELECT user_id, day, value,
      |    COUNT(CASE WHEN value IS NOT NULL THEN 1 END)
      |      OVER (PARTITION BY user_id ORDER BY day
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
      |  FROM joined
      |)
      |SELECT user_id, day,
      |  MAX(value) OVER (PARTITION BY user_id, grp) AS filled,
      |  CAST(CASE WHEN value IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
      |    AS observed
      |FROM grouped
      |ORDER BY 1, 2""".stripMargin

  /** q82 — the melted pivot including zero cells, rebuilt relationally
    * with a dimension cross join. */
  val q82: String =
    """WITH dims AS (
      |  SELECT DISTINCT o_orderpriority AS priority FROM orders
      |), st(status) AS (VALUES ('F'), ('O'), ('P')),
      |cnt AS (
      |  SELECT o_orderpriority AS priority, o_orderstatus AS status,
      |    COUNT(*) AS n
      |  FROM orders GROUP BY 1, 2
      |)
      |SELECT dims.priority, st.status,
      |  CAST(COALESCE(cnt.n, 0) AS BIGINT) AS n
      |FROM dims CROSS JOIN st
      |LEFT JOIN cnt
      |  ON cnt.priority = dims.priority AND cnt.status = st.status
      |ORDER BY 1, 2""".stripMargin

  /** Portable hex→BIGINT: neither engine shares the other's direct
    * spelling (DuckDB: CAST('0x'||h AS BIGINT); Spark: conv(h,16,10) —
    * and conv does not exist in DuckDB), but `position(c IN
    * '0123456789abcdef') - 1` is the nibble value in BOTH, so the
    * 15-hex-char (60-bit) value is an exact base-16 polynomial of 15
    * position() terms. Pure integer arithmetic — bit-identical on both
    * engines, no doubles anywhere. */
  private def hex15(h: String): String =
    (1 to 15).map { k =>
      val w = 1L << (4 * (15 - k)) // 16^(15-k), exact
      // CAST keeps every term in BIGINT: small weights would otherwise
      // be INT32 literals and the nibble product overflows 32 bits
      s"(position(substr($h, $k, 1) IN '0123456789abcdef') - 1) * CAST($w AS BIGINT)"
    }.mkString("(", " + ", ")")

  /** q91 — the full MinHash/LSH/verify pipeline in portable SQL:
    * permutation i of shingle s = first 15 hex chars of md5('i:' || s)
    * as a 60-bit int via the hex15 polynomial. */
  val q91: String =
    s"""WITH toks AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
      |  FROM documents
      |), sh AS (
      |  SELECT doc_id, unnest(list_distinct(list_transform(
      |      generate_series(1, len(t) - 2),
      |      i -> list_extract(t, i) || ' ' || list_extract(t, i+1) || ' ' || list_extract(t, i+2)))) AS s
      |  FROM toks WHERE len(t) >= 3
      |), hx AS (
      |  SELECT doc_id,
      |    substr(md5('0:' || s), 1, 15) AS x0,
      |    substr(md5('1:' || s), 1, 15) AS x1,
      |    substr(md5('2:' || s), 1, 15) AS x2,
      |    substr(md5('3:' || s), 1, 15) AS x3,
      |    substr(md5('4:' || s), 1, 15) AS x4,
      |    substr(md5('5:' || s), 1, 15) AS x5,
      |    substr(md5('6:' || s), 1, 15) AS x6,
      |    substr(md5('7:' || s), 1, 15) AS x7
      |  FROM sh
      |), sigs AS (
      |  SELECT doc_id,
      |    MIN(${hex15("x0")}) AS h0,
      |    MIN(${hex15("x1")}) AS h1,
      |    MIN(${hex15("x2")}) AS h2,
      |    MIN(${hex15("x3")}) AS h3,
      |    MIN(${hex15("x4")}) AS h4,
      |    MIN(${hex15("x5")}) AS h5,
      |    MIN(${hex15("x6")}) AS h6,
      |    MIN(${hex15("x7")}) AS h7
      |  FROM hx GROUP BY 1
      |), bands AS (
      |  SELECT doc_id, '0:' || md5(CAST(h0 AS STRING) || ',' ||
      |    CAST(h1 AS STRING) || ',' || CAST(h2 AS STRING) || ',' ||
      |    CAST(h3 AS STRING)) AS bk
      |  FROM sigs
      |  UNION ALL
      |  SELECT doc_id, '1:' || md5(CAST(h4 AS STRING) || ',' ||
      |    CAST(h5 AS STRING) || ',' || CAST(h6 AS STRING) || ',' ||
      |    CAST(h7 AS STRING)) AS bk
      |  FROM sigs
      |), cand AS (
      |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
      |  FROM bands x JOIN bands y ON x.bk = y.bk AND x.doc_id < y.doc_id
      |), nsh AS (
      |  SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1
      |), inter AS (
      |  SELECT c.doc_a, c.doc_b, COUNT(*) AS n_inter
      |  FROM cand c
      |  JOIN sh a ON a.doc_id = c.doc_a
      |  JOIN sh b ON b.doc_id = c.doc_b AND b.s = a.s
      |  GROUP BY 1, 2
      |)
      |SELECT doc_a, doc_b, CAST(n_inter AS BIGINT) AS n_inter,
      |  CAST(FLOOR(10000 * n_inter / (na.n_sh + nb.n_sh - n_inter))
      |    AS BIGINT) AS jac_bp
      |FROM inter
      |JOIN nsh na ON na.doc_id = doc_a
      |JOIN nsh nb ON nb.doc_id = doc_b
      |ORDER BY 1, 2""".stripMargin

  /** q90 — the MERGE audit log rebuilt relationally: same
    * deterministic change batch, FULL OUTER JOIN + coalesce. */
  val q90: String =
    """WITH base AS (
      |  SELECT c_custkey AS k, c_mktsegment AS old_seg FROM customer
      |), changes AS (
      |  SELECT k, 'UPGRADED' AS new_seg FROM base WHERE k % 7 = 0
      |  UNION ALL
      |  SELECT unnest(generate_series(mk + 1, mk + 50)) AS k,
      |    'NEWCOMER' AS new_seg
      |  FROM (SELECT MAX(k) AS mk FROM base) m
      |)
      |SELECT COALESCE(base.k, changes.k) AS c_custkey,
      |  CASE WHEN base.k IS NULL THEN 'insert' ELSE 'update' END AS op,
      |  COALESCE(old_seg, '') AS old_seg, new_seg
      |FROM base FULL OUTER JOIN changes ON base.k = changes.k
      |WHERE new_seg IS NOT NULL
      |ORDER BY 1""".stripMargin

  /** q87 — RANGE frame on epoch seconds; [sec−86400, sec] inclusive in
    * both engines, count + max only (no float accumulation). */
  val q87: String =
    """SELECT user_id, event_id,
      |  CAST(epoch(date_trunc('second', CAST(ts AS TIMESTAMP))) AS BIGINT)
      |    AS sec,
      |  CAST(COUNT(*) OVER w AS BIGINT) AS n_24h,
      |  MAX(value) OVER w AS max_24h
      |FROM events
      |WINDOW w AS (PARTITION BY user_id
      |  ORDER BY CAST(epoch(date_trunc('second', CAST(ts AS TIMESTAMP)))
      |    AS BIGINT)
      |  RANGE BETWEEN 86400 PRECEDING AND CURRENT ROW)
      |ORDER BY user_id, sec, event_id""".stripMargin

  /** q88 — top-3 tokens per lang as one ordered CSV string. Ordered
    * string aggregation has no dialect-shared spelling (DuckDB:
    * in-args ORDER BY; Spark: WITHIN GROUP), but with rn bounded at 3
    * the ordered concat is three conditional MAXes under concat_ws,
    * which skips NULL slots identically in both engines. */
  val q88: String =
    """WITH cnt AS (
      |  SELECT lang, t AS token, COUNT(*) AS n FROM (
      |    SELECT lang,
      |      unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS t
      |    FROM documents) z
      |  GROUP BY 1, 2
      |), ranked AS (
      |  SELECT lang, token,
      |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, token) AS rn
      |  FROM cnt
      |)
      |SELECT lang, concat_ws(',',
      |    MAX(CASE WHEN rn = 1 THEN token END),
      |    MAX(CASE WHEN rn = 2 THEN token END),
      |    MAX(CASE WHEN rn = 3 THEN token END)) AS top_tokens
      |FROM ranked WHERE rn <= 3
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** q85 — weekly cohorts from the corpus's first day. Date-minus-date
    * has no shared spelling (DuckDB: integer days; Spark: INTERVAL), so
    * the week index is exact epoch-day arithmetic in both engines. */
  val q85: String =
    """WITH ev AS (
      |  SELECT user_id, CAST(ts AS DATE) AS day FROM events
      |), d0 AS (SELECT MIN(day) AS d0 FROM ev),
      |weeks AS (
      |  SELECT DISTINCT user_id,
      |    CAST(divide(CAST(floor(epoch(CAST(day AS TIMESTAMP)) / 86400) AS BIGINT)
      |      - (SELECT CAST(floor(epoch(CAST(d0 AS TIMESTAMP)) / 86400) AS BIGINT)
      |         FROM d0), 7) AS BIGINT) AS week
      |  FROM ev
      |), cohort AS (
      |  SELECT user_id, MIN(week) AS cohort_week FROM weeks GROUP BY 1
      |), sizes AS (
      |  SELECT cohort_week, COUNT(*) AS cohort_size FROM cohort GROUP BY 1
      |), cells AS (
      |  SELECT cohort_week, week - cohort_week AS "offset",
      |    COUNT(*) AS n_users
      |  FROM weeks JOIN cohort USING (user_id) GROUP BY 1, 2
      |)
      |SELECT cohort_week, "offset", CAST(n_users AS BIGINT) AS n_users,
      |  CAST(cohort_size AS BIGINT) AS cohort_size,
      |  CAST(FLOOR(10000 * n_users / cohort_size) AS BIGINT) AS retention_bp
      |FROM cells JOIN sizes USING (cohort_week)
      |ORDER BY 1, 2""".stripMargin

  /** q86 — ordered funnel; each stage's min-time join makes event
    * ORDER matter. ns→µs truncation matches Tables.events. */
  val q86: String =
    """WITH s1 AS (
      |  SELECT user_id, MIN(CAST(ts AS TIMESTAMP)) AS t1 FROM events
      |  WHERE event_type = 'signup' GROUP BY 1
      |), s2 AS (
      |  SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS t2
      |  FROM events e JOIN s1 ON e.user_id = s1.user_id
      |  WHERE e.event_type = 'click' AND CAST(e.ts AS TIMESTAMP) > s1.t1
      |  GROUP BY 1
      |), s3 AS (
      |  SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS t3
      |  FROM events e JOIN s2 ON e.user_id = s2.user_id
      |  WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) > s2.t2
      |  GROUP BY 1
      |), n AS (
      |  SELECT (SELECT COUNT(*) FROM s1) AS n1,
      |    (SELECT COUNT(*) FROM s2) AS n2,
      |    (SELECT COUNT(*) FROM s3) AS n3
      |)
      |SELECT * FROM (
      |  SELECT CAST(1 AS BIGINT) AS stage, 'signup' AS event_type,
      |    CAST(n1 AS BIGINT) AS n_users, CAST(10000 AS BIGINT) AS conv_bp
      |  FROM n
      |  UNION ALL
      |  SELECT 2, 'click_after_signup', n2,
      |    CAST(CASE WHEN n1 > 0 THEN FLOOR(10000 * n2 / n1) ELSE 0 END
      |      AS BIGINT) FROM n
      |  UNION ALL
      |  SELECT 3, 'purchase_after_click', n3,
      |    CAST(CASE WHEN n2 > 0 THEN FLOOR(10000 * n3 / n2) ELSE 0 END
      |      AS BIGINT) FROM n
      |) t ORDER BY stage""".stripMargin

  /** q96 — the stream-stream attribution join's batch twin: views ⋈
    * clicks per user within 10 event-time minutes. CAST(ts AS TIMESTAMP)
    * is the same ns→µs truncation Tables.events applies. */
  val q96: String =
    """WITH imps AS (
      |  SELECT CAST(ts AS TIMESTAMP) AS imp_ts, user_id AS imp_user,
      |    event_id AS imp_id
      |  FROM events WHERE event_type = 'view'
      |), clicks AS (
      |  SELECT CAST(ts AS TIMESTAMP) AS click_ts, user_id AS click_user,
      |    event_id AS click_id
      |  FROM events WHERE event_type = 'click'
      |)
      |SELECT imp_user AS user_id, imp_id, click_id, imp_ts, click_ts
      |FROM imps JOIN clicks ON imp_user = click_user
      |  AND click_ts >= imp_ts AND click_ts <= imp_ts + INTERVAL 10 MINUTE
      |ORDER BY user_id, imp_id, click_id""".stripMargin

  /** q83 — integer chi-square-style drift per source over the corpus
    * top-20 tokens; divide() is exact integer division in both engines
    * (DuckDbCompat binds it to Spark's IntegralDivide) — FLOOR(a/b)
    * would round through double and lose exactness past 2^53. */
  val q83: String =
    """WITH tok AS (
      |  SELECT source,
      |    unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS t
      |  FROM documents
      |), cnt AS (
      |  SELECT source, t, COUNT(*) AS c FROM tok GROUP BY 1, 2
      |), top AS (
      |  SELECT t FROM (SELECT t, SUM(c) AS ct FROM cnt GROUP BY 1
      |    ORDER BY ct DESC, t LIMIT 20) z
      |), sub AS (
      |  SELECT source, cnt.t, c FROM cnt JOIN top ON cnt.t = top.t
      |), tots AS (
      |  SELECT source, t, c,
      |    SUM(c) OVER (PARTITION BY source) AS ns,
      |    SUM(c) OVER (PARTITION BY t) AS ct,
      |    SUM(c) OVER () AS n
      |  FROM sub
      |)
      |SELECT source,
      |  CAST(SUM(divide((c*n - ns*ct)*(c*n - ns*ct),
      |    GREATEST(divide(ns*ct*n, 10000), 1))) AS BIGINT) AS drift,
      |  CAST(MAX(divide(ABS(c*n - ns*ct), GREATEST(divide(ns*n, 10000), 1)))
      |    AS BIGINT) AS max_token_bp
      |FROM tots GROUP BY 1 ORDER BY 1""".stripMargin

  /** q101 — sliding windows rebuilt from epoch arithmetic: an event at
    * ts belongs to the 4 six-hour-aligned day windows starting at
    * slide_floor(ts) − k·6h for k in 0..3 (epoch-aligned, matching
    * Spark's window() default startTime). epoch() is DOUBLE in DuckDB —
    * floor-then-CAST keeps the second grid exact. */
  val q101: String =
    """SELECT epoch_ms((CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 21600) AS BIGINT) - k) * 21600000) AS win_start,
      |  event_type, COUNT(*) AS n_events
      |FROM events CROSS JOIN (VALUES (0), (1), (2), (3)) ks(k)
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  /** q102 — watermarked streaming dedup's deterministic contract is its
    * key set (survivor payloads are arrival-order-dependent in any
    * engine), so the oracle is the DISTINCT key set. */
  val q102: String =
    """SELECT DISTINCT user_id, event_type
      |FROM events
      |ORDER BY user_id, event_type""".stripMargin

  /** q107 — tumbling day windows: Spark's window(ts, '1 day').start is
    * the epoch-aligned day boundary = date_trunc('day') in UTC. */
  val q107: String =
    """SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
      |  event_type, COUNT(*) AS n_events
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  /** q108 — stream-static enrichment: left join onto the unique
    * customer key; COALESCE mirrors the engine's NULL contract. */
  val q108: String =
    """SELECT event_id, user_id, event_type,
      |  COALESCE(c_mktsegment, 'NONE') AS segment
      |FROM events LEFT JOIN customer ON user_id = c_custkey
      |ORDER BY event_id""".stripMargin

  /** q114 — the bucketed-table audit recomputed from source (q100's
    * contract: the hash proves what the bucketed CTAS persisted). */
  val q114: String =
    """SELECT o_custkey, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
      |FROM orders
      |GROUP BY o_custkey
      |ORDER BY o_custkey""".stripMargin

  /** q100 — the oracle recomputes the warehouse table's audit aggregate
    * from the SOURCE parquet (q68/q76's roundtrip contract lifted to
    * the catalog layer): the engine's CTAS slice + INSERT INTO slice
    * partition the same join, so aggregating the re-read table must
    * hash-match this direct aggregate. DECIMAL sum = order-exact. */
  val q100: String =
    """SELECT c_mktsegment, o_orderpriority, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment, o_orderpriority
      |ORDER BY c_mktsegment, o_orderpriority""".stripMargin

  /** q115 — the streaming-sink compaction audit: the engine slices
    * events into micro-batch directories, compacts mid-stream and
    * reads the epoch+live union (Streaming.q115StreamCompaction); the
    * oracle counts the SAME events per day straight from the source,
    * so hash equality proves the sink round-trip is exactly-once —
    * nothing lost to compaction, nothing double-counted across the
    * epoch and live zones. */
  val q115: String =
    """SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n_events
      |FROM events
      |GROUP BY CAST(ts AS DATE)
      |ORDER BY day""".stripMargin

  /** q116 — the retention-lifecycle audit: the engine ingests events
    * into the sink, compacts quiesced, retires every day strictly
    * older than min(day) + 7 and reads back the survivors
    * (Streaming.q116Retention); the oracle counts the SAME events per
    * day with the retention horizon re-stated as a WHERE predicate,
    * so hash equality proves retirement dropped exactly the expired
    * days and left the survivors' rows undisturbed. Null-ts rows are
    * first-class on the engine side (they compact into hive's null
    * partition, which carries no date to age on and is never retired),
    * so the oracle keeps them too — `NULL >= x` is not true, and
    * without the IS NULL disjunct the predicate would silently drop
    * them, a latent hash mismatch on any SF that carries a null ts.
    * NULLS FIRST pins the one ordering point where the engines'
    * defaults differ (Spark sorts nulls first ASC, DuckDB last). */
  val q116: String =
    """SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n_events
      |FROM events
      |WHERE CAST(ts AS DATE) >=
      |  (SELECT MIN(CAST(ts AS DATE)) + INTERVAL 7 DAY FROM events)
      |  OR CAST(ts AS DATE) IS NULL
      |GROUP BY CAST(ts AS DATE)
      |ORDER BY day NULLS FIRST""".stripMargin

  /** q117 — the row-level-delete audit: the engine ingests events into
    * the sink, compacts quiesced, DELETEs the `user_id % 7 = 3` cohort
    * (Streaming.deleteWhere rewrites only the affected day partitions)
    * and reads back the survivors per day; the oracle aggregates the
    * SAME events with the delete's complement as a WHERE predicate.
    * The complement is NULL-SAFE (`NOT COALESCE(p, FALSE)`): SQL
    * DELETE removes only rows where the predicate is TRUE, so a NULL
    * `user_id` survives on both sides instead of silently diverging.
    * The distinct-user count per day pins more than row counts: a
    * delete that dropped the right NUMBER of rows but the wrong rows
    * would shift some day's user profile and break the hash. NULLS
    * FIRST pins the engines' differing null-sort defaults (null-ts
    * rows live in hive's null partition and are never aged or — here
    * — matched by the user predicate). */
  val q117: String =
    """SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n_events,
      |  COUNT(DISTINCT user_id) AS n_users
      |FROM events
      |WHERE NOT COALESCE(user_id % 7 = 3, FALSE)
      |GROUP BY CAST(ts AS DATE)
      |ORDER BY day NULLS FIRST""".stripMargin

  /** q118 — the incremental-consumption audit: the engine ingests two
    * event slices (event_id % 3 IN (0, 1)), compacts them quiesced,
    * records the sink watermark as a cursor, ingests the third slice,
    * and `readSinkSince(cursor)` must serve EXACTLY that third slice;
    * the oracle aggregates the slice's membership predicate directly
    * over `events`. Hash equality proves the delta leaked nothing
    * already consumed (the compacted slices stay behind the cursor)
    * and missed nothing new. The distinct-user count pins content, not
    * just volume; NULLS FIRST pins the engines' null-sort defaults
    * (null-ts rows hash by slice like any other row — the cursor is
    * batch-id-based, not time-based). */
  val q118: String =
    """SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n_events,
      |  COUNT(DISTINCT user_id) AS n_users
      |FROM events
      |WHERE event_id % 3 = 2
      |GROUP BY CAST(ts AS DATE)
      |ORDER BY day NULLS FIRST""".stripMargin

  /** q119 — the CDC-upsert (MERGE) audit: the engine compacts the
    * whole events table into the sink, applies one `upsertBatch`
    * carrying updates (keys `event_id % 5 = 0` re-typed 'upd') and
    * inserts (fresh keys offset by 10⁹, typed 'ins'), and reads back
    * per-type counts + distinct users + distinct days. The oracle
    * re-states the merge relationally — the base table with the
    * update's CASE applied, UNION ALL the insert slice (event_id is
    * unique in events, so "replace by key" is exactly "rewrite that
    * row"). A merge that duplicated a matched row (kept AND
    * re-inserted), dropped an unmatched one, or landed an update in
    * the wrong day shifts n_events / n_users / n_days for its type
    * and breaks the hash. NULLS FIRST pins the engines' differing
    * null-sort defaults should event_type ever carry NULL. */
  val q119: String =
    """WITH merged AS (
      |  SELECT CASE WHEN event_id % 5 = 0 THEN 'upd' ELSE event_type END
      |           AS event_type,
      |         user_id, ts
      |  FROM events
      |  UNION ALL
      |  SELECT 'ins' AS event_type, user_id, ts
      |  FROM events WHERE event_id % 5 = 1
      |)
      |SELECT event_type, COUNT(*) AS n_events,
      |  COUNT(DISTINCT user_id) AS n_users,
      |  COUNT(DISTINCT CAST(ts AS DATE)) AS n_days
      |FROM merged
      |GROUP BY event_type
      |ORDER BY event_type NULLS FIRST""".stripMargin

  /** q124 — the schema-evolution audit: the engine ingests a v1
    * generation of events WITHOUT `value_cents` (even ids, base
    * columns only) and a v2 generation WITH it (odd ids,
    * `FLOOR(value·100)` as BIGINT), compacts both into one epoch, and
    * aggregates the evolved table; the oracle re-states the two
    * generations as a CASE — even ids carry NULL cents, odd ids carry
    * the exact fixed-point value. The per-row FLOOR(value·100)
    * integerizes BEFORE the SUM (the q59/q65/q120 discipline) so the
    * aggregate is integer-exact and partition-order-independent in
    * both engines; COUNT(cents) pins that v1 rows surfaced NULL (a
    * zero-fill would keep n_events but inflate n_cents), and the
    * explicit BIGINT casts pin DuckDB's SUM type widening (HUGEINT)
    * back to the engine's long. NULLS FIRST pins the engines'
    * differing null-sort defaults should event_type ever carry NULL. */
  val q124: String =
    """WITH evolved AS (
      |  SELECT event_type,
      |         CASE WHEN event_id % 2 = 1
      |              THEN CAST(FLOOR(value * 100) AS BIGINT) END AS value_cents
      |  FROM events
      |)
      |SELECT event_type, COUNT(*) AS n_events,
      |  COUNT(value_cents) AS n_cents,
      |  CAST(COALESCE(SUM(value_cents), 0) AS BIGINT) AS sum_cents
      |FROM evolved
      |GROUP BY event_type
      |ORDER BY event_type NULLS FIRST""".stripMargin

  /** q135 — the BM25 df-capped hybrid-retrieval audit: the engine
    * retrieves per probe through a df ≤ 64 inverted index with the
    * integer-exact BM25-shaped score
    * `floor(10000·n·tf·L / (df·(tf·L + 2·len·n)))` (rational idf =
    * n/df, saturating length-normalized tf — q59's log-free
    * basis-point discipline, floored per term BEFORE the per-pair sum
    * so the aggregate is integer and partition-order independent) and
    * fuses with q132's exact-cosine arm by RRF. Every product stays
    * exact in BIGINT and under 2^53, so the one double division is
    * the identical IEEE op in both engines and the FUSED ranking
    * itself sits under the hash. CAST(SUM(len) AS BIGINT) pins
    * DuckDB's HUGEINT widening back to the engine's long before the
    * arithmetic. */
  val q135: String =
    """WITH e AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
      |), n AS (
      |  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e
      |), p AS (
      |  SELECT vec_id AS probe_id, v AS pv, nrm AS pnrm FROM n WHERE vec_id < 5
      |), sem AS (
      |  SELECT p.probe_id, n.vec_id AS doc_id,
      |    list_dot_product(p.pv, n.v) / (p.pnrm * n.nrm) AS sim
      |  FROM p JOIN n ON n.vec_id <> p.probe_id
      |), semr AS (
      |  SELECT probe_id, doc_id, r_sem FROM (
      |    SELECT probe_id, doc_id,
      |      ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY sim DESC, doc_id) AS r_sem
      |    FROM sem) t WHERE r_sem <= 20
      |), tok AS (
      |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
      |  FROM documents
      |), tf AS (
      |  SELECT doc_id, tok, COUNT(*) AS tf FROM tok GROUP BY 1, 2
      |), dl AS (
      |  SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS len FROM tf GROUP BY 1
      |), corpus AS (
      |  SELECT COUNT(*) AS n_docs, CAST(SUM(len) AS BIGINT) AS total_len FROM dl
      |), dft AS (
      |  SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok HAVING COUNT(*) <= 64
      |), pterms AS (
      |  SELECT DISTINCT doc_id AS probe_id, tok FROM tok WHERE doc_id < 5
      |), scored AS (
      |  SELECT p2.probe_id, t.doc_id,
      |    SUM(CAST(FLOOR(10000 * c.n_docs * t.tf * c.total_len /
      |      (d.df * (t.tf * c.total_len + 2 * l.len * c.n_docs))) AS BIGINT)) AS score_bp
      |  FROM tf t
      |  JOIN dft d ON d.tok = t.tok
      |  JOIN pterms p2 ON p2.tok = t.tok AND t.doc_id <> p2.probe_id
      |  JOIN dl l ON l.doc_id = t.doc_id
      |  CROSS JOIN corpus c
      |  GROUP BY 1, 2
      |), lexr AS (
      |  SELECT probe_id, doc_id, r_lex FROM (
      |    SELECT probe_id, doc_id,
      |      ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY score_bp DESC, doc_id) AS r_lex
      |    FROM scored) t WHERE r_lex <= 20
      |), fused AS (
      |  SELECT COALESCE(l.probe_id, s.probe_id) AS probe_id,
      |    COALESCE(l.doc_id, s.doc_id) AS doc_id,
      |    COALESCE(CAST(1 AS DOUBLE) / (60 + l.r_lex), 0) +
      |      COALESCE(CAST(1 AS DOUBLE) / (60 + s.r_sem), 0) AS score,
      |    CASE WHEN l.r_lex IS NULL THEN 0 ELSE 1 END AS from_lex,
      |    CASE WHEN s.r_sem IS NULL THEN 0 ELSE 1 END AS from_sem
      |  FROM lexr l FULL JOIN semr s
      |    ON l.probe_id = s.probe_id AND l.doc_id = s.doc_id
      |)
      |SELECT probe_id, rank, doc_id,
      |  CAST(from_lex AS BIGINT) AS from_lex,
      |  CAST(from_sem AS BIGINT) AS from_sem
      |FROM (
      |  SELECT probe_id, doc_id, from_lex, from_sem,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY score DESC, doc_id) AS BIGINT) AS rank
      |  FROM fused) t
      |WHERE rank <= 10
      |ORDER BY probe_id, rank""".stripMargin

  /** q137 — the type-widening audit: the engine ingests `value_cents`
    * as INT in the v1 generation (even ids) and as BIGINT with an
    * over-int-range +3·10⁹ offset in v2 (odd ids), and compaction
    * must NORMALIZE the mixed footers to one BIGINT column (parquet's
    * mergeSchema refuses them outright). The oracle re-states the two
    * generations as a CASE; max_cents can only match if the over-int
    * values survived a real widening, sum_cents pins that no row was
    * dropped or double-cast. Fixed-point per row BEFORE the SUM
    * (q124's discipline); BIGINT casts pin DuckDB's HUGEINT widening
    * back to the engine's long. */
  val q137: String =
    """WITH evolved AS (
      |  SELECT event_type,
      |         CASE WHEN event_id % 2 = 0
      |              THEN CAST(FLOOR(value * 100) AS BIGINT)
      |              ELSE CAST(FLOOR(value * 100) AS BIGINT) + 3000000000
      |              END AS value_cents
      |  FROM events
      |)
      |SELECT event_type, COUNT(*) AS n_events,
      |  COUNT(value_cents) AS n_cents,
      |  CAST(COALESCE(SUM(value_cents), 0) AS BIGINT) AS sum_cents,
      |  CAST(COALESCE(MAX(value_cents), 0) AS BIGINT) AS max_cents
      |FROM evolved
      |GROUP BY event_type
      |ORDER BY event_type NULLS FIRST""".stripMargin

  /** q138 — the stored-lexical-index audit: the engine builds its
    * df-capped BM25 index on two-thirds of the corpus, APPENDS the
    * remaining third as a second generation (per-gen df/stats deltas,
    * marker-committed), and searches the stored, merged index; the
    * oracle re-derives the same ranking from the full documents table
    * FROM SCRATCH (q135's lexical CTEs, top-10 with the basis-point
    * score exposed). Hash equality proves append-equivalence — index
    * on A then append B ≡ index on A ∪ B — and the stored search's
    * scoring to the bit. */
  val q138: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
      |  FROM documents
      |), tf AS (
      |  SELECT doc_id, tok, COUNT(*) AS tf FROM tok GROUP BY 1, 2
      |), dl AS (
      |  SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS len FROM tf GROUP BY 1
      |), corpus AS (
      |  SELECT COUNT(*) AS n_docs, CAST(SUM(len) AS BIGINT) AS total_len FROM dl
      |), dft AS (
      |  SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok HAVING COUNT(*) <= 64
      |), pterms AS (
      |  SELECT DISTINCT doc_id AS probe_id, tok FROM tok WHERE doc_id < 5
      |), scored AS (
      |  SELECT p2.probe_id, t.doc_id,
      |    SUM(CAST(FLOOR(10000 * c.n_docs * t.tf * c.total_len /
      |      (d.df * (t.tf * c.total_len + 2 * l.len * c.n_docs))) AS BIGINT)) AS score_bp
      |  FROM tf t
      |  JOIN dft d ON d.tok = t.tok
      |  JOIN pterms p2 ON p2.tok = t.tok AND t.doc_id <> p2.probe_id
      |  JOIN dl l ON l.doc_id = t.doc_id
      |  CROSS JOIN corpus c
      |  GROUP BY 1, 2
      |)
      |SELECT probe_id, rank, doc_id, CAST(score_bp AS BIGINT) AS score_bp
      |FROM (
      |  SELECT probe_id, doc_id, score_bp,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY score_bp DESC, doc_id) AS BIGINT) AS rank
      |  FROM scored) t
      |WHERE rank <= 10
      |ORDER BY probe_id, rank""".stripMargin

  /** q140 — the stored-index DELETE twin of [[q138]]: the corpus CTE
    * keeps only the docs surviving the engine's tombstone delete
    * (`doc_id % 7 <> 3`), while the probes still tokenize from the
    * FULL table (probe 3's own doc is deleted — scoring its text is
    * an ordinary query). Every downstream statistic — tf, dl, df, the
    * df-cap, n_docs, total_len — derives from the survivor corpus
    * alone, so a hash match proves the engine's negative-delta merge
    * and tombstone anti-join reproduce a from-scratch index on the
    * survivors to the bit. */
  val q140: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
      |  FROM documents WHERE doc_id % 7 <> 3
      |), tf AS (
      |  SELECT doc_id, tok, COUNT(*) AS tf FROM tok GROUP BY 1, 2
      |), dl AS (
      |  SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS len FROM tf GROUP BY 1
      |), corpus AS (
      |  SELECT COUNT(*) AS n_docs, CAST(SUM(len) AS BIGINT) AS total_len FROM dl
      |), dft AS (
      |  SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok HAVING COUNT(*) <= 64
      |), ptok AS (
      |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
      |  FROM documents WHERE doc_id < 5
      |), pterms AS (
      |  SELECT DISTINCT doc_id AS probe_id, tok FROM ptok
      |), scored AS (
      |  SELECT p2.probe_id, t.doc_id,
      |    SUM(CAST(FLOOR(10000 * c.n_docs * t.tf * c.total_len /
      |      (d.df * (t.tf * c.total_len + 2 * l.len * c.n_docs))) AS BIGINT)) AS score_bp
      |  FROM tf t
      |  JOIN dft d ON d.tok = t.tok
      |  JOIN pterms p2 ON p2.tok = t.tok AND t.doc_id <> p2.probe_id
      |  JOIN dl l ON l.doc_id = t.doc_id
      |  CROSS JOIN corpus c
      |  GROUP BY 1, 2
      |)
      |SELECT probe_id, rank, doc_id, CAST(score_bp AS BIGINT) AS score_bp
      |FROM (
      |  SELECT probe_id, doc_id, score_bp,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY score_bp DESC, doc_id) AS BIGINT) AS rank
      |  FROM scored) t
      |WHERE rank <= 10
      |ORDER BY probe_id, rank""".stripMargin

  /** q134 — the time-travel audit: the engine compacts events into the
    * sink under keepEpochs=2, DELETEs the `user_id % 7 = 3` cohort
    * (minting a new epoch while the previous survives as an immutable
    * snapshot), and reads BOTH versions — `readSink(atEpoch)`
    * pre-delete, the current view post-delete — into one per-day
    * before/after aggregate. The oracle re-states the two versions
    * over `events` as a tagged UNION ALL: before = every row, after =
    * the delete's null-safe complement (q117's `NOT COALESCE(p,
    * FALSE)` — DELETE removes only rows where the predicate is TRUE).
    * Hash equality proves the snapshot serves exactly the pre-delete
    * table and the current read exactly the post-delete one,
    * simultaneously, from one sink. NULLS FIRST pins the engines'
    * differing null-sort defaults (null-ts rows group once on the
    * NULL day in both versions). */
  val q134: String =
    """WITH tagged AS (
      |  SELECT CAST(ts AS DATE) AS day, 'before' AS version FROM events
      |  UNION ALL
      |  SELECT CAST(ts AS DATE) AS day, 'after' AS version FROM events
      |  WHERE NOT COALESCE(user_id % 7 = 3, FALSE)
      |)
      |SELECT day,
      |  COUNT(CASE WHEN version = 'before' THEN 1 END) AS n_before,
      |  COUNT(CASE WHEN version = 'after' THEN 1 END) AS n_after
      |FROM tagged
      |GROUP BY day
      |ORDER BY day NULLS FIRST""".stripMargin

  /** q143 — the incremental-materialized-view audit: the engine
    * ingests two event slices, compacts, materializes a
    * per-(day, event_type) rollup view recording its sink cursor,
    * ingests the third slice, and refreshes the view by merging ONLY
    * the delta's partial aggregates into the stored ones
    * (Views.q143IncrementalView — which asserts the incremental path
    * actually ran). The oracle states the same rollup as ONE aggregate
    * over all of `events`; hash equality proves the partial-merge
    * algebra (counts and sums merge by SUM, max by MAX) recombines to
    * exactly the one-shot aggregate. Fixed-point cents are floored per
    * row BEFORE the sum (q124's discipline) so both engines aggregate
    * exact integers; BIGINT casts pin DuckDB's HUGEINT widening. */
  val q143: String =
    """SELECT CAST(ts AS DATE) AS day, event_type,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
      |  CAST(MAX(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS max_cents
      |FROM events
      |GROUP BY CAST(ts AS DATE), event_type
      |ORDER BY day NULLS FIRST, event_type""".stripMargin

  /** q144 — the zone-map data-skipping audit: the engine clusters the
    * sink's compaction on `user_id`, manifests per-file min/max from
    * the parquet footers, and serves a one-eighth id band reading only
    * the overlapping files (asserting skips happened) with the exact
    * predicate re-applied. The oracle is the same band as a plain
    * WHERE: hash equality proves the pruned files held no matching row
    * and the kept files filter to exactly the band. The band's edges
    * are data-derived the same way on both engines (the one double
    * division is the identical IEEE op; FLOOR + BIGINT casts keep it
    * exact); cents are floored per row before the sum (q124). */
  val q144: String =
    """SELECT CAST(ts AS DATE) AS day,
      |  COUNT(*) AS n_events,
      |  COUNT(DISTINCT user_id) AS n_users,
      |  CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
      |FROM events
      |WHERE user_id >= (SELECT MIN(user_id) FROM events)
      |  AND user_id <= (SELECT MIN(user_id) +
      |    CAST(FLOOR((MAX(user_id) - MIN(user_id)) / 8.0) AS BIGINT)
      |    FROM events)
      |GROUP BY CAST(ts AS DATE)
      |ORDER BY day NULLS FIRST""".stripMargin

  /** q147 — the z-order audit: the engine clusters the compaction on
    * the Morton interleave of (user_id, value) quantile ranks and
    * serves TWO independent band reads through the pruned path
    * (asserting each actually skipped files); the oracle re-states the
    * bands as a tagged UNION ALL of plain WHEREs. Band edges derive
    * identically on both engines: the id band's arithmetic is q144's
    * FLOOR + BIGINT discipline, the value band's is one subtraction,
    * one division, one addition on doubles — the same IEEE ops in the
    * same order. Cents floored per row before the sum (q124). */
  val q147: String =
    """WITH bands AS (
      |  SELECT 'u' AS band, user_id, value FROM events
      |  WHERE user_id >= (SELECT MIN(user_id) FROM events)
      |    AND user_id <= (SELECT MIN(user_id) +
      |      CAST(FLOOR((MAX(user_id) - MIN(user_id)) / 8.0) AS BIGINT)
      |      FROM events)
      |  UNION ALL
      |  SELECT 'v' AS band, user_id, value FROM events
      |  WHERE value >= (SELECT MIN(value) FROM events)
      |    AND value <= (SELECT MIN(value) + (MAX(value) - MIN(value)) / 8.0
      |      FROM events)
      |)
      |SELECT band, COUNT(*) AS n_events,
      |  COUNT(DISTINCT user_id) AS n_users,
      |  CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
      |FROM bands
      |GROUP BY band
      |ORDER BY band""".stripMargin

  /** q149 — the metadata-count audit: the engine serves a mid-half id
    * band's per-day counts answering interior files from the manifest
    * (`nrows − n_nulls`, zero data pages) and scanning only the
    * boundary files; the oracle is the plain WHERE + GROUP BY. Band
    * edges derive identically on both engines (exact BIGINT span, one
    * double division, FLOOR, BIGINT cast — q144's discipline). */
  val q149: String =
    """SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n_events
      |FROM events
      |WHERE user_id >= (SELECT MIN(user_id) +
      |    CAST(FLOOR((MAX(user_id) - MIN(user_id)) / 4.0) AS BIGINT)
      |    FROM events)
      |  AND user_id <= (SELECT MIN(user_id) +
      |    CAST(FLOOR(3 * (MAX(user_id) - MIN(user_id)) / 4.0) AS BIGINT)
      |    FROM events)
      |GROUP BY CAST(ts AS DATE)
      |ORDER BY day NULLS FIRST""".stripMargin

  /** q150 — the snapshot-CDC audit: the engine compacts events into
    * snapshot epoch A, DELETEs the `user_id % 7 = 3` cohort, CDC-
    * upserts an update cohort (`event_id % 3 = 0`, user_id +1 000 000)
    * plus an insert cohort (`event_id % 10 = 1`, re-keyed
    * +1 000 000 000), and diffs the first and last retained epochs
    * with `readSinkChanges`. The oracle re-derives the NET change
    * sets directly from `events`: every touched key with a VISIBLE
    * content change is an update (a null user_id shifts to null —
    * touched but identical, so no row); a deleted key the upsert
    * re-created nets to an update, so deletes keep only the
    * not-re-touched cohort; inserts are the re-keyed rows. Hash
    * equality proves the engine's full-outer content diff of the two
    * STORED snapshots reconstructs exactly this set. Integer deltas
    * only — no IEEE arithmetic anywhere in the compare. */
  val q150: String =
    """WITH ev AS (SELECT event_id, user_id, CAST(ts AS DATE) AS day
      |            FROM events)
      |SELECT 'update' AS change, event_id, user_id + 1000000 AS user_id, day
      |FROM ev WHERE event_id % 3 = 0 AND user_id IS NOT NULL
      |UNION ALL
      |SELECT 'insert' AS change, event_id + 1000000000 AS event_id,
      |  user_id, day
      |FROM ev WHERE event_id % 10 = 1
      |UNION ALL
      |SELECT 'delete' AS change, event_id, user_id, day
      |FROM ev WHERE COALESCE(user_id % 7 = 3, FALSE)
      |  AND NOT (event_id % 3 = 0 AND user_id IS NOT NULL)
      |ORDER BY change, event_id""".stripMargin

  /** q159 — the ingest-crossing CDC audit: the engine compacts the
    * even event half (snapshot epoch), compacts the odd half (an
    * INSERT epoch whose manifest records the consumed batch BY
    * REFERENCE — no row copied), deletes the `user_id % 7 = 3`
    * cohort, and diffs the first and last retained epochs entirely
    * from change manifests (asserted). The oracle re-derives the net
    * sets: inserts = odd rows surviving the delete (post-images from
    * the referenced batch files); deletes = even rows in the deleted
    * cohort (pre-images); odd rows the delete removed are
    * insert-then-delete = silent. Hash equality proves the referenced
    * batch resolved to exactly the folded rows. */
  val q159: String =
    """WITH ev AS (SELECT event_id, user_id, CAST(ts AS DATE) AS day
      |            FROM events)
      |SELECT 'insert' AS change, event_id, user_id, day
      |FROM ev WHERE event_id % 2 = 1 AND NOT COALESCE(user_id % 7 = 3, FALSE)
      |UNION ALL
      |SELECT 'delete' AS change, event_id, user_id, day
      |FROM ev WHERE event_id % 2 = 0 AND COALESCE(user_id % 7 = 3, FALSE)
      |ORDER BY change, event_id""".stripMargin

  /** q151 — the bloom point-lookup audit: the engine clusters the
    * compaction on `user_id` (scattering event_id so a range manifest
    * could skip nothing), fingerprints each file's event_id set into
    * a per-file bloom, and serves three point probes — min id, max
    * id, and the possibly-absent integer midpoint — reading only the
    * files the bloom cannot rule out (asserting each probe skipped).
    * The oracle restates the probes as a plain IN over events with
    * the identical midpoint arithmetic (exact BIGINT span, one double
    * division, FLOOR — q144's discipline): hash equality proves the
    * pruned files held no probed row and the bloom surfaced no
    * phantom. */
  val q151: String =
    """SELECT event_id, user_id, CAST(ts AS DATE) AS day
      |FROM events
      |WHERE event_id IN (
      |  (SELECT MIN(event_id) FROM events),
      |  (SELECT MIN(event_id) +
      |     CAST(FLOOR((MAX(event_id) - MIN(event_id)) / 2.0) AS BIGINT)
      |   FROM events),
      |  (SELECT MAX(event_id) FROM events))
      |ORDER BY event_id""".stripMargin

  /** q152 — the rename/drop evolution audit: the engine serves the
    * sink's per-day aggregate TWICE — phase `logical` through the
    * pending alter (old-name epoch + new-name batch conformed on the
    * fly, zero data rewritten) and phase `physical` after the
    * normalizing all-days rewrite (footers verified to carry the new
    * name only). The oracle states the same aggregate over `events`
    * (where `amount` is still called `value`) twice, tagged: hash
    * equality proves both views serve exactly the original rows under
    * the new name, the drop costing no row. Cents floored per row
    * before the sum (q124's discipline); NULLS FIRST pins the null-ts
    * day group. */
  val q152: String =
    """WITH a AS (SELECT CAST(ts AS DATE) AS day,
      |                  CAST(FLOOR(value * 100) AS BIGINT) AS cents
      |           FROM events),
      |g AS (SELECT day, COUNT(*) AS n_events,
      |             CAST(SUM(cents) AS BIGINT) AS sum_cents
      |      FROM a GROUP BY day)
      |SELECT 'logical' AS phase, day, n_events, sum_cents FROM g
      |UNION ALL
      |SELECT 'physical' AS phase, day, n_events, sum_cents FROM g
      |ORDER BY phase, day NULLS FIRST""".stripMargin

  /** q155 — the CDC-replication audit: the engine mutates a SOURCE
    * sink (the q150 delete + upsert), diffs its retained snapshots
    * with full-row compare columns, and replays the feed onto an
    * initially-identical REPLICA via key-set delete + atomic MERGE;
    * the replica then aggregates per day. The oracle states the
    * source's POST-state directly from `events` (survivors not
    * touched ∪ updated cohort ∪ re-keyed inserts): hash equality
    * proves the replica CONVERGED — the diff lost no change, the
    * apply invented none. The update branch's `user_id + 1000000` on
    * a NULL user is null on both engines, so content-identical
    * touches cancel identically. */
  val q155: String =
    """WITH b AS (
      |  SELECT event_id, ts, user_id, value FROM events
      |  WHERE NOT COALESCE(user_id % 7 = 3, FALSE) AND event_id % 3 <> 0
      |  UNION ALL
      |  SELECT event_id, ts, user_id + 1000000 AS user_id, value
      |  FROM events WHERE event_id % 3 = 0
      |  UNION ALL
      |  SELECT event_id + 1000000000 AS event_id, ts, user_id, value
      |  FROM events WHERE event_id % 10 = 1
      |)
      |SELECT CAST(ts AS DATE) AS day,
      |  COUNT(*) AS n_events,
      |  COUNT(user_id) AS n_with_user,
      |  CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
      |  CAST(SUM(user_id) AS BIGINT) AS sum_users
      |FROM b
      |GROUP BY CAST(ts AS DATE)
      |ORDER BY day NULLS FIRST""".stripMargin

  /** q156 — the STRING zone-map audit: the engine clusters the sink's
    * compaction on `event_type`, manifests per-file TRUNCATED
    * raw-byte string bounds from the parquet footers, and serves the
    * `['click','purchase']` type band reading only the overlapping
    * files (asserting skips happened) with the exact predicate
    * re-applied. The oracle is the same band as a plain BETWEEN: hash
    * equality proves the pruned files held no in-band row — string
    * bound comparison lost nothing to truncation or collation — and
    * the kept files' rows filter to exactly the band. Cents floored
    * per row before the sum (q124). */
  val q156: String =
    """SELECT event_type,
      |  COUNT(*) AS n_events,
      |  COUNT(DISTINCT user_id) AS n_users,
      |  CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
      |FROM events
      |WHERE event_type BETWEEN 'click' AND 'purchase'
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** q157 — the timestamp-band audit: the engine indexes the sink's
    * DEFAULT (day, ts) layout — footer INT64-microsecond stats through
    * the plain numeric manifest path — and serves a mid-history
    * quarter band through the ts-typed pruned read (asserting files
    * were skipped). The oracle states the same band via `epoch_us`
    * arithmetic with EXACT edge derivation on both engines: the span
    * (BIGINT micros, ~10^13 « 2^53) divides by 4.0/2.0 — power-of-two
    * scalings are exact in IEEE — and FLOOR matches Scala's positive
    * Long division to the bit (the dialect-portable spelling of
    * DuckDB's `//`, which Spark's parser rejects), so hash equality
    * proves the micros⇄timestamp imaging and the ulp-widened manifest
    * bounds lost no in-band row. Cents floored per row before the sum
    * (q124). */
  val q157: String =
    """SELECT CAST(ts AS DATE) AS day,
      |  COUNT(*) AS n_events,
      |  COUNT(DISTINCT user_id) AS n_users,
      |  CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
      |FROM events
      |WHERE epoch_us(ts) >= (SELECT MIN(epoch_us(ts)) +
      |    CAST(FLOOR((MAX(epoch_us(ts)) - MIN(epoch_us(ts))) / 4.0)
      |      AS BIGINT) FROM events)
      |  AND epoch_us(ts) <= (SELECT MIN(epoch_us(ts)) +
      |    CAST(FLOOR((MAX(epoch_us(ts)) - MIN(epoch_us(ts))) / 2.0)
      |      AS BIGINT) FROM events)
      |GROUP BY CAST(ts AS DATE)
      |ORDER BY day NULLS FIRST""".stripMargin

  /** q158 — the auto-index audit: the engine's lifecycle (ingest →
    * clustered compaction → `user_id % 7 = 3` delete) ran with
    * auto-index confs set, so every epoch commit emitted its own
    * stats + bloom manifests, and the query serves a pruned id band
    * AND a bloom point lookup with NO manual re-index (both asserting
    * skips). The oracle restates both probes over the delete's
    * survivors (`user_id IS NULL OR user_id % 7 <> 3` — a NULL
    * predicate keeps the row, SQL DELETE's complement): hash equality
    * proves the auto-built manifests describe the post-delete files
    * exactly. Band edges are q144's FLOOR + BIGINT discipline; the
    * point probe is the smallest surviving event_id. */
  val q158: String =
    """WITH surv AS (
      |  SELECT event_id, user_id, value FROM events
      |  WHERE user_id IS NULL OR user_id % 7 <> 3
      |), probes AS (
      |  SELECT 'band' AS probe, user_id, value FROM surv
      |  WHERE user_id >= (SELECT MIN(user_id) FROM events)
      |    AND user_id <= (SELECT MIN(user_id) +
      |      CAST(FLOOR((MAX(user_id) - MIN(user_id)) / 8.0) AS BIGINT)
      |      FROM events)
      |  UNION ALL
      |  SELECT 'point' AS probe, user_id, value FROM surv
      |  WHERE event_id = (SELECT MIN(event_id) FROM surv)
      |)
      |SELECT probe, COUNT(*) AS n_events,
      |  COUNT(user_id) AS n_with_user,
      |  CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
      |FROM probes
      |GROUP BY probe
      |ORDER BY probe""".stripMargin

  /** q153 — the lexical-upsert audit: the engine builds the stored
    * index on the full corpus (build + append), then one atomic
    * upsert generation REPLACES the `doc_id % 5 = 2` cohort's text
    * and INSERTS a re-keyed cohort, and the probes search the stored
    * index. The oracle re-derives q140's from-scratch BM25 ranking
    * over the POST-UPSERT corpus — survivors with original text, the
    * replaced cohort with the appended `zq zq`, and the inserts under
    * their new ids — with probes from the ORIGINAL docs (probing with
    * a replaced doc's old text is an ordinary query). Hash equality
    * proves upsert-equivalence to the bit: netted df (including the
    * cap decision on the new token), netted corpus stats, no old
    * version surfacing, no insert missing. */
  val q153: String =
    """WITH corpus_docs AS (
      |  SELECT doc_id, text FROM documents WHERE doc_id % 5 <> 2
      |  UNION ALL
      |  SELECT doc_id, text || ' zq zq' AS text FROM documents
      |  WHERE doc_id % 5 = 2
      |  UNION ALL
      |  SELECT doc_id + 1000000 AS doc_id, text FROM documents
      |  WHERE doc_id % 9 = 4
      |), tok AS (
      |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
      |  FROM corpus_docs
      |), tf AS (
      |  SELECT doc_id, tok, COUNT(*) AS tf FROM tok GROUP BY 1, 2
      |), dl AS (
      |  SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS len FROM tf GROUP BY 1
      |), corpus AS (
      |  SELECT COUNT(*) AS n_docs, CAST(SUM(len) AS BIGINT) AS total_len FROM dl
      |), dft AS (
      |  SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok HAVING COUNT(*) <= 64
      |), ptok AS (
      |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
      |  FROM documents WHERE doc_id < 5
      |), pterms AS (
      |  SELECT DISTINCT doc_id AS probe_id, tok FROM ptok
      |), scored AS (
      |  SELECT p2.probe_id, t.doc_id,
      |    SUM(CAST(FLOOR(10000 * c.n_docs * t.tf * c.total_len /
      |      (d.df * (t.tf * c.total_len + 2 * l.len * c.n_docs))) AS BIGINT)) AS score_bp
      |  FROM tf t
      |  JOIN dft d ON d.tok = t.tok
      |  JOIN pterms p2 ON p2.tok = t.tok AND t.doc_id <> p2.probe_id
      |  JOIN dl l ON l.doc_id = t.doc_id
      |  CROSS JOIN corpus c
      |  GROUP BY 1, 2
      |)
      |SELECT probe_id, rank, doc_id, CAST(score_bp AS BIGINT) AS score_bp
      |FROM (
      |  SELECT probe_id, doc_id, score_bp,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY score_bp DESC, doc_id) AS BIGINT) AS rank
      |  FROM scored) t
      |WHERE rank <= 10
      |ORDER BY probe_id, rank""".stripMargin

  /** q160 — the predicate-UPDATE audit: the engine compacts events
    * into the sink and runs ONE `updateWhere` rectifying the
    * `user_id % 7 = 3` cohort (`event_type` ← 'rectified', `value` ←
    * value·2 — both reading the rows' PRE-images), then reads back
    * per-(day, type) counts, distinct users, and the exact cents sum.
    * The oracle re-states the update as CASE projections over
    * `events` with the null-safe hit test (`COALESCE(p, FALSE)` —
    * UPDATE touches only rows where the predicate is TRUE, so a NULL
    * `user_id` row passes through unchanged on both sides). The
    * doubling runs BEFORE the fixed-point floor on both engines
    * (`FLOOR(value·2·100)`) — one identical IEEE multiply, q144's
    * discipline. Hash equality proves the update transformed exactly
    * the cohort in place: the n_users split between 'rectified' and
    * the original types pins WHICH rows moved, the per-day layout
    * pins that nothing crossed a partition, the cents sum pins the
    * values; nothing duplicated, nothing dropped. NULLS FIRST pins
    * the engines' differing null-sort defaults (null-ts rows live in
    * the null day and update like any other row). */
  val q160: String =
    """SELECT CAST(ts AS DATE) AS day,
      |  CASE WHEN COALESCE(user_id % 7 = 3, FALSE)
      |       THEN 'rectified' ELSE event_type END AS event_type,
      |  COUNT(*) AS n_events,
      |  COUNT(DISTINCT user_id) AS n_users,
      |  CAST(SUM(CAST(FLOOR(
      |    (CASE WHEN COALESCE(user_id % 7 = 3, FALSE)
      |          THEN value * 2.0 ELSE value END) * 100) AS BIGINT))
      |    AS BIGINT) AS sum_cents
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY day NULLS FIRST, event_type""".stripMargin

  /** q161 — the TIMESTAMP-AS-OF audit: q134's delete lifecycle probed
    * by WALL TIME instead of epoch id — `readSinkAsOf(mint(E+1) − 1)`
    * must serve the pre-delete snapshot (the half-open window where E
    * is current) and `readSinkAsOf(mint(E+1))` the post-delete one
    * (a snapshot is current from its own mint instant). The oracle is
    * exactly q134's tagged union (before = every row, after = the
    * delete's null-safe complement): hash equality proves the
    * wall-time resolution lands on precisely the recorded epoch
    * boundaries, both sides — off-by-one in the resolver (>=
    * mistyped as >, a boundary read resolving to the neighbor epoch)
    * breaks the hash. */
  val q161: String = q134

  /** q162 — the RESTORE audit: q134's delete lifecycle rolled BACK
    * (`restoreSink` mints a new epoch reproducing the pre-delete
    * snapshot, hard-linked, after which the link-source epoch
    * retires), read as (current = restored table, atEpoch = the
    * reverted delete's still-retained snapshot). The oracle re-states
    * the two views over `events` — restored = every row,
    * deleted = the delete's null-safe complement (q117's
    * `NOT COALESCE(p, FALSE)`) — so hash equality proves
    * delete∘restore is the identity on the table (nothing lost
    * through the link-and-retire round trip, nothing leaked from the
    * reverted epoch) while the intervening snapshot still serves
    * exactly the deleted view. NULLS FIRST pins the engines'
    * differing null-sort defaults. */
  val q162: String =
    """WITH tagged AS (
      |  SELECT CAST(ts AS DATE) AS day, 'restored' AS version FROM events
      |  UNION ALL
      |  SELECT CAST(ts AS DATE) AS day, 'deleted' AS version FROM events
      |  WHERE NOT COALESCE(user_id % 7 = 3, FALSE)
      |)
      |SELECT day,
      |  COUNT(CASE WHEN version = 'restored' THEN 1 END) AS n_restored,
      |  COUNT(CASE WHEN version = 'deleted' THEN 1 END) AS n_deleted
      |FROM tagged
      |GROUP BY day
      |ORDER BY day NULLS FIRST""".stripMargin

  /** q163 — the CHECK-constraint quarantine audit: the engine declares
    * `event_type <> 'purchase'` on the sink and folds the events feed
    * through the gate in quarantine mode, then reads the epoch zone
    * (clean) and the quarantine feed (diverted) side by side. The
    * oracle re-states the split as a tagged UNION ALL on the
    * null-safe violation predicate — a row violates a SQL CHECK only
    * when the predicate IS FALSE, so `COALESCE(event_type =
    * 'purchase', FALSE)` is the quarantined side and its NOT the
    * clean side (NULL event_type passes the check and stays clean in
    * both engines). Hash equality proves the gate split the feed
    * row-exactly and lost nothing. NULLS FIRST pins the engines'
    * differing null-sort defaults. */
  val q163: String =
    """WITH tagged AS (
      |  SELECT CAST(ts AS DATE) AS day, 'clean' AS side FROM events
      |  WHERE NOT COALESCE(event_type = 'purchase', FALSE)
      |  UNION ALL
      |  SELECT CAST(ts AS DATE) AS day, 'quarantined' AS side FROM events
      |  WHERE COALESCE(event_type = 'purchase', FALSE)
      |)
      |SELECT day,
      |  COUNT(CASE WHEN side = 'clean' THEN 1 END) AS n_clean,
      |  COUNT(CASE WHEN side = 'quarantined' THEN 1 END) AS n_quarantined
      |FROM tagged
      |GROUP BY day
      |ORDER BY day NULLS FIRST""".stripMargin
}
