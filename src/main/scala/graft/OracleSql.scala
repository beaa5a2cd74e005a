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
}
