package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Stateful operators (SURVEY §2.8 V11/V12): the reference's sequential
  * turn-state machine and frame-tick EMA smoothing, re-expressed as
  * per-key ordered folds. Batch uses sorted `flatMapGroups`; the
  * streaming twin (Streaming.scala) shares the same transition
  * functions via `flatMapGroupsWithState`. Neither has a SQL oracle
  * (inherently sequential per key — SparkEntry omits them from
  * oracleSql; ScalaTest replay fixtures validate the machine instead).
  */
object Replay {

  /** One move-log event (FIXTURES.md): place or move. */
  final case class MoveEvent(
      game_id: Int, seq: Int, actor: String, action: String, bug: String,
      piece_id: Int, to_q: Int, to_r: Int)

  final case class ReplaySummary(
      game_id: Int, n_applied: Long, n_rejected: Long, final_turn: String,
      queen_white_placed: Boolean, queen_black_placed: Boolean,
      game_over: Boolean, outcome: String)

  /** Reserve seed per color: 1 Queen / 2 Spider / 2 Beetle /
    * 3 Grasshopper / 3 Ant (ui_app.cpp:500). */
  val reserveSeed: Map[String, Int] = Map(
    "Queen" -> 1, "Spider" -> 2, "Beetle" -> 2, "Grasshopper" -> 3, "Ant" -> 3)

  /** Mutable per-game replay state (driver: ui_app.cpp event handling). */
  final case class GameReplay(
      turn: String = "White",
      reserves: Map[(String, String), Int] =
        (for (c <- Seq("White", "Black"); (b, n) <- reserveSeed)
          yield (c, b) -> n).toMap,
      pieces: Vector[HexRules.PieceRow] = Vector.empty,
      applied: Long = 0, rejected: Long = 0, gameOver: Boolean = false,
      outcome: String = "None") {

    private def board = new HexRules.Board(pieces)

    def queenPlaced(c: String): Boolean =
      pieces.exists(p => p.color == c && p.bug == "Queen")

    private def placementsMade(c: String): Int =
      11 - reserves.collect { case ((`c`, _), n) => n }.sum

    /** Apply one event, enforcing the UI-layer gates:
      * game-over freeze (ui_app.cpp:78-82), turn order (118, 159, 195),
      * queen-by-4th placement (121-124), reserve availability (125),
      * placement-target legality (143-144 via computePlacementTargets),
      * no movement before own queen (177-183), move-target legality
      * (174 via legalMovesForPiece), then game-over re-evaluation
      * (151-155, 187-191, rules.cpp:40-47). */
    def apply(m: MoveEvent): GameReplay = {
      if (gameOver) return reject                       // freeze
      if (m.actor != turn) return reject                // turn gate
      m.action match {
        case "place" =>
          if (!queenPlaced(m.actor) && placementsMade(m.actor) >= 3 &&
              m.bug != "Queen") return reject           // queen by 4th
          if (reserves.getOrElse((m.actor, m.bug), 0) <= 0) return reject
          if (!placementTargets(m.actor).contains((m.to_q, m.to_r)))
            return reject
          val h = board.stackHeight((m.to_q, m.to_r)) + 1
          commit(pieces :+ HexRules.PieceRow(m.game_id, m.piece_id, m.bug,
              m.actor, m.to_q, m.to_r, h),
            reserves.updated((m.actor, m.bug),
              reserves((m.actor, m.bug)) - 1))
        case "move" =>
          if (!queenPlaced(m.actor)) return reject      // move-before-queen
          val piece = pieces.find(_.piece_id == m.piece_id)
          piece match {
            case Some(p) if p.color == m.actor &&
                board.top((p.q, p.r)).exists(_.piece_id == p.piece_id) =>
              val legal = HexRules.legalMoves(board, p)
                .exists(mv => mv.to_q == m.to_q && mv.to_r == m.to_r)
              if (!legal) return reject
              // height after landing on top of dest (engine.cpp:29-35);
              // only top pieces move, so the from-stack needs no renumber
              val h = board.stackHeight((m.to_q, m.to_r)) + 1
              commit(pieces.map(x =>
                if (x.piece_id == m.piece_id)
                  x.copy(q = m.to_q, r = m.to_r, height = h)
                else x), reserves)
            case _ => reject
          }
        case _ => reject
      }
    }

    /** V2 placement targets (ui_app.cpp:553-587) on the local board. */
    private def placementTargets(c: String): Set[(Int, Int)] = {
      val b = board
      if (pieces.isEmpty) return Set((0, 0))
      val occ = b.occupiedCells
      val frontier = occ.flatMap(cell => HexRules.dirs.map(d =>
        (cell._1 + d._1, cell._2 + d._2))).diff(occ)
      if (placementsMade(c) == 0) frontier
      else frontier.filter { f =>
        val topColors = HexRules.dirs
          .flatMap(d => b.top((f._1 + d._1, f._2 + d._2))).map(_.color)
        topColors.contains(c) && !topColors.exists(_ != c)
      }
    }

    private def commit(ps: Vector[HexRules.PieceRow],
        rs: Map[(String, String), Int]): GameReplay = {
      val next = copy(pieces = ps, reserves = rs, applied = applied + 1,
        turn = if (turn == "White") "Black" else "White")
      // post-commit trigger: evaluate game over (rules.cpp:40-47)
      val b = new HexRules.Board(ps)
      def surrounded(c: String): Boolean =
        ps.find(p => p.color == c && p.bug == "Queen").exists { qn =>
          HexRules.dirs.forall(d => b.occupied((qn.q + d._1, qn.r + d._2)))
        }
      val (w, bl) = (surrounded("White"), surrounded("Black"))
      val out =
        if (w && bl) "Draw" else if (w) "BlackWins"
        else if (bl) "WhiteWins" else "None"
      next.copy(gameOver = out != "None", outcome = out)
    }

    private def reject: GameReplay = copy(rejected = rejected + 1)

    def summary(gameId: Int): ReplaySummary = ReplaySummary(
      gameId, applied, rejected, turn,
      queenPlaced("White"), queenPlaced("Black"), gameOver, outcome)
  }

  /** Pure transition shared by batch replay and the streaming twin.
    * Sorts by (seq, piece_id): seq alone is the intended order, but the
    * post-shuffle iterator is unordered and a duplicated seq (a data
    * bug upstream) must still fold deterministically — the secondary
    * key removes the only nondeterminism a malformed log could inject. */
  def replayAll(gameId: Int, moves: Iterator[MoveEvent]): ReplaySummary =
    moves.toSeq.sortBy(m => (m.seq, m.piece_id))
      .foldLeft(GameReplay())((s, m) => s.apply(m))
      .summary(gameId)

  /** Scripted opening: White and Black alternate placements, including
    * events the gates must reject (out-of-turn, non-queen on 4th,
    * movement before queen). Deterministic literal log; seq values are
    * UNIQUE per game so replay order never depends on tie-breaking. */
  val scriptedMoves: Seq[(Int, String, String, String, Int, Int, Int)] = Seq(
    // (seq, actor, action, bug, piece_id, to_q, to_r)
    (1, "White", "place", "Spider", 0, 0, 0),
    (2, "Black", "place", "Spider", 100, 0, 1),
    (3, "White", "place", "Grasshopper", 1, 0, -1),
    (4, "White", "place", "Ant", 2, 1, -1),     // REJECT: out of turn
    (5, "Black", "place", "Ant", 101, 0, 2),
    (6, "White", "move", "Grasshopper", 1, 0, 2), // REJECT: queen not placed
    (7, "White", "place", "Ant", 2, 1, -1),
    (8, "Black", "place", "Grasshopper", 102, -1, 3),
    (9, "White", "place", "Spider", 3, 1, -2),  // REJECT: queen by 4th
    (10, "White", "place", "Queen", 4, 0, -2),
    (11, "Black", "place", "Queen", 103, 1, 2),
    (12, "White", "move", "Grasshopper", 1, 0, 2), // jump over spiders? legality checked
    (13, "Black", "move", "Ant", 101, 1, 1))

  /** The replicated move-log table (same K replication as BoardOps). */
  def moveLog(spark: SparkSession, dir: String): Dataset[MoveEvent] = {
    import spark.implicits._
    val base = scriptedMoves
      .toDF("seq", "actor", "action", "bug", "piece_id", "to_q", "to_r")
    val copies = Tables.orders(spark, dir)
      .agg(greatest((count(lit(1)) / 1500).cast("int"), lit(1)).as("k"))
      .select(explode(sequence(lit(0), col("k") - 1)).as("copy"))
    base.crossJoin(copies)
      .select((col("copy") + 1).as("game_id"), col("seq"), col("actor"),
        col("action"), col("bug"), col("piece_id"), col("to_q"), col("to_r"))
      .as[MoveEvent]
  }

  /** q24 — game replay (V11 batch form): per-game ordered fold over the
    * move log via flatMapGroups — one shuffle on game_id, then linear
    * per-game work; the scalable shape for billions of independent
    * replays. No oracle (sequential semantics). */
  def q24GameReplay(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    moveLog(spark, dir)
      .groupByKey(_.game_id)
      .mapGroups((g, it) => replayAll(g, it))
      .toDF()
      .orderBy("game_id")
  }

  // ---------------------------------------------------------------- q25
  /** q25 — EMA smoothing (V12): the reference's per-cell alpha fade
    * `a += (target − a) · 0.2` per frame tick (ui_app.cpp:242-263),
    * generalized to an order-sensitive exponential moving average of
    * `value` per user over the events table. Emitted floor-scaled; no
    * oracle (float fold is order-sensitive by construction). */
  def q25EmaSmoothing(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rate = 0.2
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("value"))
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .mapGroups { (user, it) =>
        val ticks = it.toSeq.sortBy(_._2)
        var ema = 0.0
        ticks.foreach { case (_, _, v) => ema += (v - ema) * rate }
        (user, ticks.size.toLong, math.floor(ema * 10000).toLong)
      }
      .toDF("user_id", "n_ticks", "ema_x10000")
      .orderBy("user_id")
  }
}
