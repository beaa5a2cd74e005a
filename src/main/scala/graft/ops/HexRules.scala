package graft.ops

import scala.collection.mutable

/** Pure Scala kernel for the hive-analytics operator family: the board
  * rules the reference implements imperatively, re-expressed as a
  * side-effect-free library invoked per game from `flatMapGroups`
  * (BoardOps). Semantics follow /root/reference/engine/src/rules.cpp
  * exactly (cited per function); the implementation is original.
  *
  * Scale rationale: a single game state is tiny (≤ 22 pieces in base
  * Hive — reference ui_app.cpp:500), while the corpus of games is the
  * scale dimension. The right distributed shape is therefore per-key
  * local computation after one hash shuffle on game_id — not global
  * iterative joins (those are for one huge graph, which this is not).
  * q22 demonstrates the relational-iterative alternative.
  */
object HexRules {
  /** Neighbor directions, reference engine.hpp:25-28. */
  val dirs: Vector[(Int, Int)] =
    Vector((1, 0), (1, -1), (0, -1), (-1, 0), (-1, 1), (0, 1))

  type Cell = (Int, Int)

  final case class PieceRow(
      game_id: Int, piece_id: Int, bug: String, color: String,
      q: Int, r: Int, height: Int)

  final case class MoveRow(
      game_id: Int, piece_id: Int, bug: String,
      from_q: Int, from_r: Int, to_q: Int, to_r: Int, kind: String)

  /** One game's state: per-cell piece stacks bottom→top. */
  final class Board(pieces: Seq[PieceRow]) {
    val stacks: Map[Cell, Vector[PieceRow]] =
      pieces.groupBy(p => (p.q, p.r))
        .view.mapValues(_.sortBy(_.height).toVector).toMap

    def occupied(c: Cell): Boolean = stacks.contains(c)
    /** rules.cpp:12-15 — stack top index, -1 if empty. */
    def stackHeight(c: Cell): Int = stacks.get(c).map(_.size - 1).getOrElse(-1)
    def top(c: Cell): Option[PieceRow] = stacks.get(c).map(_.last)
    def tops: Iterable[PieceRow] = stacks.values.map(_.last)
    def occupiedCells: Set[Cell] = stacks.keySet
    def cellCounts: Map[Cell, Int] =
      stacks.view.mapValues(_.size).toMap
  }

  private def add(c: Cell, d: (Int, Int)): Cell = (c._1 + d._1, c._2 + d._2)

  /** rules.cpp:50-59 — freedom-to-move corridor: both flanking cells of
    * the from→to edge occupied ⇒ blocked. `occ` is pluggable so the
    * ant/spider "start treated as empty" variants (rules.cpp:215-224,
    * 286-295) reuse it. */
  def canSlide(occ: Cell => Boolean, from: Cell, to: Cell): Boolean = {
    val di = dirs.indexWhere(d => add(from, d) == to)
    if (di < 0) false
    else {
      val left = add(from, dirs((di + 5) % 6))
      val right = add(from, dirs((di + 1) % 6))
      !(occ(left) && occ(right))
    }
  }

  /** rules.cpp:61-133 — count-based hypothetical-move connectivity: the
    * moving piece leaves `from` (count −1) and lands on `to` (count +1);
    * connected iff BFS over occupied cells reaches all of them. */
  def connectedAfter(board: Board, from: Cell, to: Cell): Boolean = {
    if (from == to) return true
    val occ = mutable.Map.empty[Cell, Int]
    board.cellCounts.foreach { case (c, n) =>
      val adj = if (c == from) n - 1 else n
      if (adj > 0) occ(c) = adj
    }
    occ(to) = occ.getOrElse(to, 0) + 1
    if (occ.isEmpty) return true
    val seen = mutable.Set.empty[Cell]
    val queue = mutable.Queue.empty[Cell]
    val start = occ.keysIterator.next()
    seen += start; queue += start
    while (queue.nonEmpty) {
      val cur = queue.dequeue()
      dirs.foreach { d =>
        val n = add(cur, d)
        if (occ.contains(n) && !seen(n)) { seen += n; queue += n }
      }
    }
    seen.size == occ.size
  }

  /** rules.cpp:98-133 — BFS connectivity over an explicit occupied-cell
    * set (the tail of connectedAfter, exposed for callers that already
    * materialized the post-move occupancy, e.g. q22's per-candidate
    * kernel). */
  def allConnected(cells: Iterable[Cell]): Boolean = {
    val occ = cells.toSet
    if (occ.size <= 1) return true
    val seen = mutable.Set(occ.head)
    val queue = mutable.Queue(occ.head)
    while (queue.nonEmpty) {
      val cur = queue.dequeue()
      dirs.foreach { d =>
        val n = add(cur, d)
        if (occ.contains(n) && seen.add(n)) queue += n
      }
    }
    seen.size == occ.size
  }

  /** rules.cpp:136-144. */
  def queenMoves(board: Board, p: PieceRow): Seq[MoveRow] = {
    val from = (p.q, p.r)
    dirs.flatMap { d =>
      val to = add(from, d)
      if (!board.occupied(to) && canSlide(board.occupied, from, to) &&
          connectedAfter(board, from, to))
        Some(mk(p, to, "Slide"))
      else None
    }
  }

  /** rules.cpp:146-181 — climb onto occupied (no corridor); step to
    * empty with corridor unless atop a stack (hFrom > 0). */
  def beetleMoves(board: Board, p: PieceRow): Seq[MoveRow] = {
    val from = (p.q, p.r)
    val hFrom = board.stackHeight(from)
    dirs.flatMap { d =>
      val to = add(from, d)
      if (board.occupied(to)) {
        if (connectedAfter(board, from, to)) Some(mk(p, to, "Climb")) else None
      } else {
        val allowed = hFrom > 0 || canSlide(board.occupied, from, to)
        if (allowed && connectedAfter(board, from, to)) Some(mk(p, to, "Slide"))
        else None
      }
    }
  }

  /** rules.cpp:184-194 — per-direction ray: jump over ≥1 contiguous
    * occupied cells to the first empty. */
  def grasshopperMoves(board: Board, p: PieceRow): Seq[MoveRow] = {
    val from = (p.q, p.r)
    dirs.flatMap { d =>
      var cur = add(from, d)
      var jumped = false
      while (board.occupied(cur)) { jumped = true; cur = add(cur, d) }
      if (jumped && connectedAfter(board, from, cur)) Some(mk(p, cur, "Jump"))
      else None
    }
  }

  /** Shared ant/spider exploration predicates with start-as-empty
    * occupancy (rules.cpp:201-203, 273-275). */
  private final class Explorer(board: Board, start: Cell) {
    val occ: Cell => Boolean = a => a != start && board.occupied(a)
    def adjacentToHive(a: Cell): Boolean = dirs.exists(d => occ(add(a, d)))
    def slide(from: Cell, to: Cell): Boolean = canSlide(occ, from, to)
  }

  /** rules.cpp:196-264 — BFS over empty perimeter cells; every visited
    * cell that keeps the hive connected is a destination.
    *
    * Deviation from the reference CODE, following the reference TEST:
    * rules.cpp's BFS treats the start as empty but never marks it
    * visited, so the ant can re-enter and emit its own start cell —
    * which test_rules.cpp:52-56/82-84 ("destinations must be empty")
    * rejects. We pre-seed the visited set with the start (exactly what
    * the reference's spider generator does at rules.cpp:303-304). */
  def antMoves(board: Board, p: PieceRow): Seq[MoveRow] = {
    val start = (p.q, p.r)
    val ex = new Explorer(board, start)
    val seen = mutable.LinkedHashSet[Cell](start)
    val queue = mutable.Queue.empty[Cell]
    dirs.foreach { d =>
      val n = add(start, d)
      if (!ex.occ(n) && ex.adjacentToHive(n) && ex.slide(start, n) && seen.add(n))
        queue += n
    }
    val out = mutable.ArrayBuffer.empty[MoveRow]
    while (queue.nonEmpty) {
      val cur = queue.dequeue()
      if (connectedAfter(board, start, cur)) out += mk(p, cur, "Slide")
      dirs.foreach { d =>
        val nxt = add(cur, d)
        if (!ex.occ(nxt) && ex.adjacentToHive(nxt) && ex.slide(cur, nxt) &&
            seen.add(nxt)) queue += nxt
      }
    }
    out.toSeq
  }

  /** rules.cpp:268-331 — exactly-3-step DFS with path-local no-revisit
    * (start included); duplicate destinations across branches are
    * deduplicated (the reference test asserts distinct destinations). */
  def spiderMoves(board: Board, p: PieceRow): Seq[MoveRow] = {
    val start = (p.q, p.r)
    val ex = new Explorer(board, start)
    val dests = mutable.LinkedHashSet.empty[Cell]
    val visited = mutable.Set[Cell](start)
    def dfs(cur: Cell, depth: Int): Unit = {
      if (depth == 3) {
        if (cur != start && connectedAfter(board, start, cur)) dests += cur
      } else dirs.foreach { d =>
        val nxt = add(cur, d)
        if (!ex.occ(nxt) && ex.adjacentToHive(nxt) && ex.slide(cur, nxt) &&
            visited.add(nxt)) {
          dfs(nxt, depth + 1)
          visited -= nxt
        }
      }
    }
    dfs(start, 0)
    dests.map(c => mk(p, c, "Slide")).toSeq
  }

  /** rules.cpp:334-344 — dispatch by bug. */
  def legalMoves(board: Board, p: PieceRow): Seq[MoveRow] = p.bug match {
    case "Queen" => queenMoves(board, p)
    case "Beetle" => beetleMoves(board, p)
    case "Grasshopper" => grasshopperMoves(board, p)
    case "Ant" => antMoves(board, p)
    case "Spider" => spiderMoves(board, p)
    case _ => Seq.empty
  }

  private def mk(p: PieceRow, to: Cell, kind: String): MoveRow =
    MoveRow(p.game_id, p.piece_id, p.bug, p.q, p.r, to._1, to._2, kind)
}
