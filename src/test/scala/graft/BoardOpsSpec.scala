package graft

import graft.ops.{BoardOps, HexRules}
import graft.ops.HexRules.PieceRow

/** Ports of /root/reference/tests/test_rules.cpp onto the HexRules
  * kernel, plus end-to-end checks of the declared board queries. */
class BoardOpsSpec extends SparkSpecBase {

  private def board(ps: (String, String, Int, Int, Int)*): HexRules.Board =
    new HexRules.Board(ps.zipWithIndex.map { case ((bug, color, q, r, h), i) =>
      PieceRow(0, i, bug, color, q, r, h)
    })

  private def piece(b: HexRules.Board, q: Int, r: Int): PieceRow =
    b.top((q, r)).get

  test("QueenMovesOneStep (test_rules.cpp:20-25)") {
    val b = board(("Queen", "White", 0, 0, 0))
    assert(HexRules.queenMoves(b, piece(b, 0, 0)).nonEmpty)
  }

  test("GrasshopperJump (test_rules.cpp:28-37)") {
    val b = board(("Grasshopper", "White", 0, 0, 0),
      ("Ant", "Black", 1, 0, 0), ("Ant", "Black", 2, -1, 0))
    val moves = HexRules.grasshopperMoves(b, piece(b, 0, 0))
    assert(moves.exists(_.kind == "Jump"))
  }

  test("AntSlidesAnyDistance (test_rules.cpp:39-57)") {
    val b = board(("Ant", "White", 0, 0, 0), ("Queen", "White", 1, 0, 0),
      ("Grasshopper", "Black", 0, 1, 0), ("Spider", "Black", -1, 1, 0))
    val moves = HexRules.antMoves(b, piece(b, 0, 0))
    assert(moves.size >= 4)
    moves.foreach { m =>
      assert(!b.occupied((m.to_q, m.to_r)))
      assert(m.kind == "Slide")
    }
  }

  test("AntPerimeterBounded (test_rules.cpp:59-92)") {
    val b = board(("Ant", "White", 0, 0, 0), ("Queen", "White", 1, 0, 0),
      ("Grasshopper", "Black", 0, 1, 0), ("Spider", "Black", -1, 1, 0),
      ("Spider", "White", 1, -1, 0))
    val moves = HexRules.antMoves(b, piece(b, 0, 0))
    assert(moves.nonEmpty && moves.size < 300)
    val dests = moves.map(m => (m.to_q, m.to_r))
    assert(dests.distinct.size == dests.size, "destinations unique")
    dests.foreach { c =>
      assert(!b.occupied(c))
      assert(HexRules.dirs.exists(d => b.occupied((c._1 + d._1, c._2 + d._2))),
        s"$c not adjacent to hive")
    }
  }

  test("SpiderExactlyThreeSteps (test_rules.cpp:94-124)") {
    val b = board(("Spider", "White", 0, 0, 0), ("Queen", "White", 1, 0, 0),
      ("Ant", "Black", 0, 1, 0), ("Grasshopper", "Black", -1, 1, 0),
      ("Ant", "White", 1, -1, 0))
    val moves = HexRules.spiderMoves(b, piece(b, 0, 0))
    assert(moves.nonEmpty)
    moves.foreach { m =>
      assert(m.kind == "Slide")
      assert(!b.occupied((m.to_q, m.to_r)))
    }
    val dests = moves.map(m => (m.to_q, m.to_r))
    assert(dests.distinct.size == dests.size)
  }

  test("BeetleClimbsOntoOccupiedNeighbor (test_rules.cpp:126-139)") {
    val b = board(("Beetle", "White", 0, 0, 0), ("Queen", "Black", 1, 0, 0))
    val moves = HexRules.beetleMoves(b, piece(b, 0, 0))
    assert(moves.exists(m => m.to_q == 1 && m.to_r == 0 && m.kind == "Climb"))
  }

  test("BeetleIgnoresCorridorWhenOnTop (test_rules.cpp:141-162)") {
    val b = board(("Queen", "White", 0, 0, 0), ("Beetle", "White", 0, 0, 1),
      ("Ant", "Black", 0, 1, 0), ("Ant", "Black", 1, -1, 0))
    val beetle = piece(b, 0, 0)
    assert(beetle.bug == "Beetle")
    val moves = HexRules.beetleMoves(b, beetle)
    assert(moves.exists(m => m.to_q == 1 && m.to_r == 0 && m.kind == "Slide"))
  }

  test("q16: game 9 is a Draw, game 1 is None") {
    val rows = SparkEntry.queries("q16_queen_surrounded")(spark, sf).collect()
      .map(r => r.getInt(0) -> r.getString(3)).toMap
    assert(rows(9) == "Draw")
    assert(rows(1) == "None")
    assert(rows(3) == "None")
  }

  test("q17: placement targets never touch opponent top (non-first)") {
    val targets = SparkEntry.queries("q17_placement_targets")(spark, sf)
      .collect()
    assert(targets.nonEmpty)
    // game 1: only a white queen at (0,0); White targets = frontier ∩
    // own-adjacent (all 6 neighbors), Black = whole frontier (first)
    val g1 = targets.filter(_.getInt(0) == 1)
    assert(g1.count(_.getString(1) == "White") == 6)
    assert(g1.count(_.getString(1) == "Black") == 6)
  }

  test("q18/q18b/q19/q20/q21 agree with the kernel on base games") {
    for ((name, bug) <- Seq(
        "q18_queen_moves" -> "Queen", "q18b_beetle_moves" -> "Beetle",
        "q19_grasshopper_moves" -> "Grasshopper",
        "q20_spider_moves" -> "Spider", "q21_ant_reachability" -> "Ant")) {
      val got = SparkEntry.queries(name)(spark, sf).collect()
        .filter(_.getInt(0) <= 9)
        .map(r => (r.getInt(0), r.getInt(1), r.getInt(5), r.getInt(6), r.getString(7)))
        .toSet
      val expected = (1 to 9).flatMap { g =>
        val ps = BoardOps.fixtureRows.filter(_._1 == g).map {
          case (gg, pid, b, c, q, r, h) => PieceRow(gg, pid, b, c, q, r, h)
        }
        val b = new HexRules.Board(ps)
        b.tops.filter(_.bug == bug)
          .flatMap(p => HexRules.legalMoves(b, p))
          .map(m => (m.game_id, m.piece_id, m.to_q, m.to_r, m.kind))
      }.toSet
      assert(got == expected, s"$name mismatch")
    }
  }

  test("q22: beetle-on-stack moves never disconnect; replicated copies agree") {
    val rows = SparkEntry.queries("q22_hive_connected")(spark, sf).collect()
    assert(rows.nonEmpty)
    // game 7: beetle at (0,0) height 1 — from-cell keeps the queen, so
    // every destination keeps the hive connected (SURVEY §7 risk 4)
    val g7beetle = rows.filter(r => r.getInt(0) == 7 && r.getInt(1) == 1)
    assert(g7beetle.length == 6)
    assert(g7beetle.forall(_.getBoolean(4)))
    // grasshopper in game 2 moving to (-1,0) would break the line? No —
    // its only neighbor dest; just sanity-check both outcomes exist overall
    assert(rows.exists(!_.getBoolean(4)), "some move must disconnect")
  }

  test("q44: tray reserves match ui_app.cpp seed minus placed") {
    val rows = SparkEntry.queries("q44_reserves")(spark, sf).collect()
      .map(r => ((r.getInt(0), r.getString(1), r.getString(2)),
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    // game 1: one White Queen placed, Black untouched
    assert(rows((1, "White", "Queen")) == (1L, 1L, 0L, 1L))
    assert(rows((1, "White", "Ant")) == (3L, 0L, 3L, 1L))
    assert(rows((1, "Black", "Queen")) == (1L, 0L, 1L, 0L))
    // every (game, color) has exactly the 5 seed bugs
    val perColor = rows.keys.groupBy(k => (k._1, k._2)).values.map(_.size)
    assert(perColor.forall(_ == 5))
    // remaining never negative, placements_made = 11 - sum(remaining)
    rows.groupBy { case ((g, c, _), _) => (g, c) }.foreach { case (_, m) =>
      val rem = m.values.map(_._3).sum
      assert(m.values.forall(v => v._3 >= 0 && v._4 == 11 - rem))
    }
  }

  test("q45: hover picks nearest cell within 34px, else none") {
    val rows = SparkEntry.queries("q45_board_hover")(spark, sf).collect()
      .map(r => ((r.getInt(0), r.getInt(1)),
        (r.getBoolean(2), r.getInt(3), r.getInt(4)))).toMap
    // game 1 (lone queen at (0,0)): probes 0/1/5 hover it, rest miss
    assert(rows((1, 0)) == (true, 0, 0))
    assert(rows((1, 1)) == (true, 0, 0))
    assert(rows((1, 5)) == (true, 0, 0))
    assert(!rows((1, 2))._1 && !rows((1, 3))._1 && !rows((1, 4))._1)
    // game 9 (anchor (-1,0)): probe 2 lands on (0,0), probe 3 on (-1,1)
    assert(rows((9, 2)) == (true, 0, 0))
    assert(rows((9, 3)) == (true, -1, 1))
    assert(!rows((9, 4))._1, "far probe never hovers")
  }

  test("q51: cell-key bijection round-trips, matches the C++ packing") {
    val rows = SparkEntry.queries("q51_ring_key")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (q, rr) = (r.getInt(1), r.getInt(2))
      // same packing as ui_app.cpp:315-319
      val expectedKey = (q.toLong << 32) | (rr.toLong & 0xFFFFFFFFL)
      assert(r.getLong(3) == expectedKey, s"key for ($q,$rr)")
      assert(r.getInt(4) == q && r.getInt(5) == rr, s"round-trip ($q,$rr)")
    }
    // negative r exercises the two's-complement low word (e.g. (1,-1))
    assert(rows.exists(r => r.getInt(2) < 0))
  }

  test("q52: union dispatch equals the five per-bug move queries") {
    def rows(name: String): Set[Seq[Any]] =
      SparkEntry.queries(name)(spark, sf).collect().map(_.toSeq).toSet
    val perBug = Seq("q18_queen_moves", "q18b_beetle_moves",
      "q19_grasshopper_moves", "q20_spider_moves", "q21_ant_reachability")
      .map(rows).reduce(_ union _)
    assert(rows("q52_legal_moves") == perBug)
  }

  test("q53: viewport culls off-origin copies; literal box below the agg") {
    val df = SparkEntry.queries("q53_viewport")(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // the fixed viewport contains only copy 0 (games 1..9); copies are
    // translated 16 cells apart, past the +-3-padded box
    assert(rows.forall(r => r.getInt(0) >= 1 && r.getInt(0) <= 9))
    val (minQ, maxQ, minR, maxR) = ops.BoardOps.viewportBox
    assert((minQ, maxQ, minR, maxR) == (-15, 15, -9, 9))
    rows.foreach { r =>
      assert(r.getInt(1) >= minQ && r.getInt(1) <= maxQ)
      assert(r.getInt(2) >= minR && r.getInt(2) <= maxR)
    }
    // the culling predicate must sit below the aggregation, at the row
    // source (pushed through the groupBy on its keys)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains(">= -15") || plan.contains("-15 <="),
      s"literal viewport bound missing from plan:\n$plan")
  }

  test("q23: stacked cells report correct stack order") {
    val rows = SparkEntry.queries("q23_stack_tops")(spark, sf).collect()
    val g8 = rows.filter(r => r.getInt(0) == 8 && r.getInt(1) == 0 && r.getInt(2) == 0)
    assert(g8.length == 1)
    assert(g8.head.getLong(3) == 2L)          // stack_size
    assert(g8.head.getInt(4) == 1)            // top = beetle (pid 1)
    assert(g8.head.getString(5) == "0,1")     // bottom→top
  }
}
