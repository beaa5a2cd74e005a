#!/usr/bin/env python3
"""Prototype the board-query oracle SQL against the Spark verify dumps.

Builds the same SQL strings that will live in OracleSql.scala and diffs
each against /tmp/verify_out/<name>. Dev-only.
"""
import sys, glob
import duckdb

SF = "/root/testdata/sf0.01"
OUT = "/tmp/verify_out"

FIXTURE_VALUES = """(1,0,'Queen','White',0,0,0),
(2,0,'Grasshopper','White',0,0,0),(2,1,'Ant','Black',1,0,0),(2,2,'Ant','Black',2,-1,0),
(3,0,'Ant','White',0,0,0),(3,1,'Queen','White',1,0,0),(3,2,'Grasshopper','Black',0,1,0),(3,3,'Spider','Black',-1,1,0),
(4,0,'Ant','White',0,0,0),(4,1,'Queen','White',1,0,0),(4,2,'Grasshopper','Black',0,1,0),(4,3,'Spider','Black',-1,1,0),(4,4,'Spider','White',1,-1,0),
(5,0,'Spider','White',0,0,0),(5,1,'Queen','White',1,0,0),(5,2,'Ant','Black',0,1,0),(5,3,'Grasshopper','Black',-1,1,0),(5,4,'Ant','White',1,-1,0),
(6,0,'Beetle','White',0,0,0),(6,1,'Queen','Black',1,0,0),
(7,0,'Queen','White',0,0,0),(7,1,'Beetle','White',0,0,1),(7,2,'Ant','Black',0,1,0),(7,3,'Ant','Black',1,-1,0),
(8,0,'Queen','White',0,0,0),(8,1,'Beetle','Black',0,0,1),
(9,0,'Queen','White',0,0,0),(9,1,'Ant','Black',1,0,0),(9,2,'Ant','White',1,-1,0),(9,3,'Grasshopper','Black',0,-1,0),(9,4,'Spider','White',-1,0,0),(9,5,'Beetle','Black',-1,1,0),(9,6,'Ant','White',0,1,0),
(9,7,'Queen','Black',4,0,0),(9,8,'Ant','White',5,0,0),(9,9,'Spider','Black',5,-1,0),(9,10,'Grasshopper','White',4,-1,0),(9,11,'Beetle','White',3,1,0),(9,12,'Ant','Black',4,1,0),(9,13,'Grasshopper','Black',2,0,0),(9,14,'Spider','White',3,0,0)"""

BOARD = f"""WITH RECURSIVE fixture(base_game, piece_id, bug, color, q0, r0, height) AS (
  VALUES {FIXTURE_VALUES}
), copies AS (
  SELECT unnest(generate_series(0,
    GREATEST(CAST(FLOOR((SELECT COUNT(*) FROM orders) / 1500) AS INT), 1) - 1)) AS copy
), pieces AS (
  SELECT base_game + 9 * copy AS game_id, piece_id, bug, color,
         q0 + (copy % 37) * 16 AS q, r0 + (copy // 37) * 16 AS r, height
  FROM fixture CROSS JOIN copies
), dirs(di, dq, dr, lq, lr, rq, rr) AS (
  VALUES (0,1,0,0,1,1,-1),(1,1,-1,1,0,0,-1),(2,0,-1,1,-1,-1,0),
         (3,-1,0,0,-1,-1,1),(4,-1,1,-1,0,0,1),(5,0,1,-1,1,1,0)
), cells AS (
  SELECT game_id, q, r, COUNT(*) AS n FROM pieces GROUP BY game_id, q, r
), tops AS (
  SELECT game_id, q, r, piece_id, bug, color FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY game_id, q, r ORDER BY height DESC) AS rn
    FROM pieces) t WHERE rn = 1
)"""

# connectivity template over a cand0 CTE keyed (game_id,piece_id,to_q,to_r)
# carrying bug, from_q, from_r, kind
CONN = """, cand AS (
  SELECT DISTINCT game_id, piece_id, bug, from_q, from_r, to_q, to_r, kind FROM cand0
), occ_after AS (
  SELECT game_id, piece_id, to_q, to_r, q, r FROM (
    SELECT game_id, piece_id, to_q, to_r, q, r, SUM(n) AS n FROM (
      SELECT cd.game_id, cd.piece_id, cd.to_q, cd.to_r, c.q, c.r,
             c.n - CASE WHEN c.q = cd.from_q AND c.r = cd.from_r THEN 1 ELSE 0 END AS n
      FROM cand cd JOIN cells c USING (game_id)
      UNION ALL
      SELECT game_id, piece_id, to_q, to_r, to_q, to_r, 1 FROM cand
    ) u GROUP BY game_id, piece_id, to_q, to_r, q, r) s
  WHERE n > 0
), seed AS (
  SELECT game_id, piece_id, to_q, to_r, q, r FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY game_id, piece_id, to_q, to_r ORDER BY q, r) AS rn
    FROM occ_after) x WHERE rn = 1
), reach AS (
  SELECT game_id, piece_id, to_q, to_r, q, r FROM seed
  UNION
  SELECT o.game_id, o.piece_id, o.to_q, o.to_r, o.q, o.r
  FROM reach rr JOIN dirs d ON TRUE
  JOIN occ_after o ON o.game_id = rr.game_id AND o.piece_id = rr.piece_id
    AND o.to_q = rr.to_q AND o.to_r = rr.to_r
    AND o.q = rr.q + d.dq AND o.r = rr.r + d.dr
), total AS (
  SELECT game_id, piece_id, to_q, to_r, COUNT(*) AS n_occ
  FROM occ_after GROUP BY game_id, piece_id, to_q, to_r
), nreach AS (
  SELECT game_id, piece_id, to_q, to_r, COUNT(*) AS n_reach
  FROM reach GROUP BY game_id, piece_id, to_q, to_r
), connected_cand AS (
  SELECT cd.* FROM cand cd
  JOIN total t USING (game_id, piece_id, to_q, to_r)
  JOIN nreach nr USING (game_id, piece_id, to_q, to_r)
  WHERE nr.n_reach = t.n_occ
)"""

MOVE_SELECT = """SELECT game_id, piece_id, bug, from_q, from_r, to_q, to_r, kind
FROM connected_cand
ORDER BY game_id, piece_id, to_q, to_r"""

def occx(g, q, r, sq="m.q", sr="m.r"):
    """occupancy treating the start cell (sq,sr) as empty."""
    return (f"(NOT (({q}) = {sq} AND ({r}) = {sr}) AND EXISTS "
            f"(SELECT 1 FROM cells c WHERE c.game_id = {g} "
            f"AND c.q = ({q}) AND c.r = ({r})))")

def occ(g, q, r):
    return (f"EXISTS (SELECT 1 FROM cells c WHERE c.game_id = {g} "
            f"AND c.q = ({q}) AND c.r = ({r}))")

Q16 = BOARD + """
, queens AS (SELECT game_id, color, q, r FROM pieces WHERE bug = 'Queen')
, hits AS (
  SELECT qu.game_id, qu.color, COUNT(*) AS n_occ
  FROM queens qu CROSS JOIN dirs d
  JOIN cells c ON c.game_id = qu.game_id AND c.q = qu.q + d.dq AND c.r = qu.r + d.dr
  GROUP BY qu.game_id, qu.color)
, surr AS (
  SELECT qu.game_id, qu.color, COALESCE(h.n_occ, 0) = 6 AS surr
  FROM queens qu LEFT JOIN hits h USING (game_id, color))
SELECT g.game_id,
  COALESCE(w.surr, FALSE) AS white_surrounded,
  COALESCE(b.surr, FALSE) AS black_surrounded,
  CASE WHEN COALESCE(w.surr, FALSE) AND COALESCE(b.surr, FALSE) THEN 'Draw'
       WHEN COALESCE(w.surr, FALSE) THEN 'BlackWins'
       WHEN COALESCE(b.surr, FALSE) THEN 'WhiteWins'
       ELSE 'None' END AS outcome
FROM (SELECT DISTINCT game_id FROM pieces) g
LEFT JOIN (SELECT game_id, surr FROM surr WHERE color = 'White') w USING (game_id)
LEFT JOIN (SELECT game_id, surr FROM surr WHERE color = 'Black') b USING (game_id)
ORDER BY game_id"""

Q17 = BOARD + """
, frontier AS (
  SELECT DISTINCT c.game_id, c.q + d.dq AS q, c.r + d.dr AS r
  FROM cells c CROSS JOIN dirs d
  WHERE NOT EXISTS (SELECT 1 FROM cells o WHERE o.game_id = c.game_id
                    AND o.q = c.q + d.dq AND o.r = c.r + d.dr))
, adj_top AS (
  SELECT DISTINCT f.game_id, f.q, f.r, t.color AS top_color
  FROM frontier f CROSS JOIN dirs d
  JOIN tops t ON t.game_id = f.game_id AND t.q = f.q + d.dq AND t.r = f.r + d.dr)
, colors(color) AS (VALUES ('White'), ('Black'))
, placed AS (SELECT game_id, color, COUNT(*) AS n FROM pieces GROUP BY game_id, color)
, cand AS (
  SELECT f.game_id, col.color, f.q, f.r, COALESCE(p.n, 0) = 0 AS first_placement
  FROM frontier f CROSS JOIN colors col
  LEFT JOIN placed p ON p.game_id = f.game_id AND p.color = col.color)
SELECT game_id, color, q, r FROM cand
WHERE first_placement
   OR (EXISTS (SELECT 1 FROM adj_top a WHERE a.game_id = cand.game_id
               AND a.q = cand.q AND a.r = cand.r AND a.top_color = cand.color)
       AND NOT EXISTS (SELECT 1 FROM adj_top a WHERE a.game_id = cand.game_id
               AND a.q = cand.q AND a.r = cand.r AND a.top_color <> cand.color))
ORDER BY game_id, color, q, r"""

Q23 = BOARD + """
SELECT game_id, q, r, COUNT(*) AS stack_size,
  arg_max(piece_id, height) AS top_piece_id,
  string_agg(CAST(piece_id AS VARCHAR), ',' ORDER BY height) AS stack_ids
FROM pieces GROUP BY game_id, q, r
ORDER BY game_id, q, r"""

Q22 = BOARD + """
, cand0 AS (
  SELECT t.game_id, t.piece_id, t.bug, t.q AS from_q, t.r AS from_r,
         t.q + d.dq AS to_q, t.r + d.dr AS to_r, 'Any' AS kind
  FROM tops t CROSS JOIN dirs d)""" + CONN + """
SELECT cd.game_id, cd.piece_id, cd.to_q, cd.to_r,
  EXISTS (SELECT 1 FROM connected_cand cc WHERE cc.game_id = cd.game_id
          AND cc.piece_id = cd.piece_id AND cc.to_q = cd.to_q
          AND cc.to_r = cd.to_r) AS connected
FROM cand cd
ORDER BY game_id, piece_id, to_q, to_r"""

Q18 = BOARD + f"""
, movers AS (SELECT * FROM tops WHERE bug = 'Queen')
, cand0 AS (
  SELECT m.game_id, m.piece_id, m.bug, m.q AS from_q, m.r AS from_r,
         m.q + d.dq AS to_q, m.r + d.dr AS to_r, 'Slide' AS kind
  FROM movers m CROSS JOIN dirs d
  WHERE NOT {occ('m.game_id', 'm.q + d.dq', 'm.r + d.dr')}
    AND NOT ({occ('m.game_id', 'm.q + d.lq', 'm.r + d.lr')}
         AND {occ('m.game_id', 'm.q + d.rq', 'm.r + d.rr')}))""" + CONN + "\n" + MOVE_SELECT

Q18B = BOARD + f"""
, movers AS (
  SELECT t.game_id, t.piece_id, t.bug, t.q, t.r, c.n AS from_n
  FROM tops t JOIN cells c USING (game_id, q, r) WHERE t.bug = 'Beetle')
, cand0 AS (
  SELECT m.game_id, m.piece_id, m.bug, m.q AS from_q, m.r AS from_r,
         m.q + d.dq AS to_q, m.r + d.dr AS to_r,
         CASE WHEN {occ('m.game_id', 'm.q + d.dq', 'm.r + d.dr')}
              THEN 'Climb' ELSE 'Slide' END AS kind
  FROM movers m CROSS JOIN dirs d
  WHERE {occ('m.game_id', 'm.q + d.dq', 'm.r + d.dr')}
     OR m.from_n > 1
     OR NOT ({occ('m.game_id', 'm.q + d.lq', 'm.r + d.lr')}
         AND {occ('m.game_id', 'm.q + d.rq', 'm.r + d.rr')}))""" + CONN + "\n" + MOVE_SELECT

Q19 = BOARD + """
, movers AS (SELECT * FROM tops WHERE bug = 'Grasshopper')
, rays AS (
  SELECT m.game_id, m.piece_id, m.bug, m.q AS from_q, m.r AS from_r, d.di, ks.k,
         m.q + ks.k * d.dq AS cq, m.r + ks.k * d.dr AS cr,
         EXISTS (SELECT 1 FROM cells c WHERE c.game_id = m.game_id
                 AND c.q = m.q + ks.k * d.dq AND c.r = m.r + ks.k * d.dr) AS occ
  FROM movers m CROSS JOIN dirs d
  CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS k) ks)
, firstempty AS (
  SELECT game_id, piece_id, bug, from_q, from_r, di, MIN(k) AS k_empty
  FROM rays WHERE NOT occ GROUP BY game_id, piece_id, bug, from_q, from_r, di)
, cand0 AS (
  SELECT r.game_id, r.piece_id, r.bug, r.from_q, r.from_r,
         r.cq AS to_q, r.cr AS to_r, 'Jump' AS kind
  FROM firstempty f
  JOIN rays r ON r.game_id = f.game_id AND r.piece_id = f.piece_id
    AND r.di = f.di AND r.k = f.k_empty
  WHERE f.k_empty >= 2)""" + CONN + "\n" + MOVE_SELECT

def step_pred(g, sq, sr, cur_q, cur_r, path_cells):
    """Predicates for stepping from (cur_q,cur_r) via dir row d to the next
    cell, with start (sq,sr) treated as empty (rules.cpp:196-331):
    next not occupied', next adjacent to hive', corridor slide', and next
    not on the current path. All args are SQL expressions."""
    nq, nr = f"{cur_q} + d.dq", f"{cur_r} + d.dr"
    not_occ = f"NOT {occx(g, nq, nr, sq, sr)}"
    adj = (f"EXISTS (SELECT 1 FROM dirs d2 JOIN cells c ON c.game_id = {g} "
           f"AND c.q = ({nq}) + d2.dq AND c.r = ({nr}) + d2.dr "
           f"WHERE NOT (c.q = {sq} AND c.r = {sr}))")
    slide = (f"NOT ({occx(g, f'{cur_q} + d.lq', f'{cur_r} + d.lr', sq, sr)} "
             f"AND {occx(g, f'{cur_q} + d.rq', f'{cur_r} + d.rr', sq, sr)})")
    no_revisit = " AND ".join(
        f"NOT (({nq}) = {pq} AND ({nr}) = {pr})" for pq, pr in path_cells)
    return f"{not_occ}\n    AND {adj}\n    AND {slide}\n    AND {no_revisit}"

Q20 = BOARD + f"""
, movers AS (SELECT * FROM tops WHERE bug = 'Spider')
, s1 AS (
  SELECT s.game_id, s.piece_id, s.bug, s.q AS sq, s.r AS sr,
         s.q + d.dq AS x1q, s.r + d.dr AS x1r
  FROM movers s CROSS JOIN dirs d
  WHERE {step_pred('s.game_id', 's.q', 's.r', 's.q', 's.r', [('s.q', 's.r')])})
, s2 AS (
  SELECT s.*, s.x1q + d.dq AS x2q, s.x1r + d.dr AS x2r
  FROM s1 s CROSS JOIN dirs d
  WHERE {step_pred('s.game_id', 's.sq', 's.sr', 's.x1q', 's.x1r', [('s.sq', 's.sr'), ('s.x1q', 's.x1r')])})
, s3 AS (
  SELECT s.*, s.x2q + d.dq AS x3q, s.x2r + d.dr AS x3r
  FROM s2 s CROSS JOIN dirs d
  WHERE {step_pred('s.game_id', 's.sq', 's.sr', 's.x2q', 's.x2r', [('s.sq', 's.sr'), ('s.x1q', 's.x1r'), ('s.x2q', 's.x2r')])})
, cand0 AS (
  SELECT DISTINCT game_id, piece_id, bug, sq AS from_q, sr AS from_r,
         x3q AS to_q, x3r AS to_r, 'Slide' AS kind
  FROM s3)""" + CONN + "\n" + MOVE_SELECT

Q21 = BOARD + f"""
, movers AS (SELECT * FROM tops WHERE bug = 'Ant')
, visited AS (
  SELECT s.game_id, s.piece_id, s.bug, s.q AS sq, s.r AS sr,
         s.q + d.dq AS q, s.r + d.dr AS r
  FROM movers s CROSS JOIN dirs d
  WHERE {step_pred('s.game_id', 's.q', 's.r', 's.q', 's.r', [('s.q', 's.r')])}
  UNION
  SELECT s.game_id, s.piece_id, s.bug, s.sq, s.sr,
         s.q + d.dq AS q, s.r + d.dr AS r
  FROM visited s CROSS JOIN dirs d
  WHERE {step_pred('s.game_id', 's.sq', 's.sr', 's.q', 's.r', [('s.sq', 's.sr')])})
, cand0 AS (
  SELECT DISTINCT game_id, piece_id, bug, sq AS from_q, sr AS from_r,
         q AS to_q, r AS to_r, 'Slide' AS kind
  FROM visited)""" + CONN + "\n" + MOVE_SELECT

QUERIES = {
    "q16_queen_surrounded": Q16,
    "q17_placement_targets": Q17,
    "q18_queen_moves": Q18,
    "q18b_beetle_moves": Q18B,
    "q19_grasshopper_moves": Q19,
    "q20_spider_moves": Q20,
    "q21_ant_reachability": Q21,
    "q22_hive_connected": Q22,
    "q23_stack_tops": Q23,
}

def main():
    con = duckdb.connect()
    for t in ["orders"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    names = sys.argv[1:] or sorted(QUERIES)
    for name in names:
        sql = QUERIES[name]
        files = glob.glob(f"{OUT}/{name}/*.parquet")
        try:
            duck = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"ORA-ERR {name}: {e}")
            continue
        spark = con.execute(f"SELECT * FROM read_parquet({files!r})").fetchdf()
        d = duck[sorted(duck.columns)].astype(str).apply("|".join, axis=1).sort_values().tolist()
        s = spark[sorted(spark.columns)].astype(str).apply("|".join, axis=1).sort_values().tolist()
        if sorted(duck.columns) != sorted(spark.columns):
            print(f"COLS    {name}: duck={sorted(duck.columns)} spark={sorted(spark.columns)}")
        elif d == s:
            print(f"OK      {name} ({len(d)} rows)")
        else:
            print(f"DIFF    {name}: duck={len(d)} spark={len(s)}")
            donly = [x for x in d if x not in set(s)][:3]
            sonly = [x for x in s if x not in set(d)][:3]
            for x in donly: print(f"  duck-only : {x}")
            for x in sonly: print(f"  spark-only: {x}")

if __name__ == "__main__":
    main()
