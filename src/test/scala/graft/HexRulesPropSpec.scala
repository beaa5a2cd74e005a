package graft

import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.HexRules
import graft.ops.HexRules.PieceRow

/** Property-based invariants over random small boards (SURVEY §5.2):
  * move destinations are unique/empty/perimeter-adjacent, every emitted
  * move keeps the hive connected, spider paths are exactly 3 steps,
  * grasshopper jumps land past ≥1 occupied cell. Pure kernel — no
  * SparkSession needed. */
class HexRulesPropSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val params = org.scalacheck.Test.Parameters.default
      .withMinSuccessfulTests(300)
    val res = org.scalacheck.Test.check(params, p)
    assert(res.passed, res.status.toString)
  }

  private val bugs = Seq("Queen", "Beetle", "Spider", "Grasshopper", "Ant")

  /** Random connected board: grow 2..9 pieces by attaching each new
    * piece to a uniformly chosen neighbor of an occupied cell (never
    * stacking for simplicity — stacks are covered by unit fixtures). */
  private val boardGen: Gen[Seq[PieceRow]] = for {
    n <- Gen.choose(2, 9)
    bugChoices <- Gen.listOfN(n, Gen.oneOf(bugs))
    colorChoices <- Gen.listOfN(n, Gen.oneOf("White", "Black"))
    attach <- Gen.listOfN(n, Gen.choose(0, 1000))
  } yield {
    val cells = scala.collection.mutable.ArrayBuffer[(Int, Int)]((0, 0))
    val occupied = scala.collection.mutable.Set[(Int, Int)]((0, 0))
    var i = 1
    while (i < n) {
      val base = cells(attach(i) % cells.length)
      val candidates = HexRules.dirs
        .map(d => (base._1 + d._1, base._2 + d._2))
        .filterNot(occupied)
      if (candidates.nonEmpty) {
        val c = candidates(attach(i) % candidates.length)
        cells += c
        occupied += c
      }
      i += 1
    }
    cells.zipWithIndex.map { case ((q, r), pid) =>
      PieceRow(0, pid, bugChoices(pid % n), colorChoices(pid % n), q, r, 0)
    }.toSeq
  }

  private def withBoard(prop: HexRules.Board => Boolean): Prop =
    Prop.forAll(boardGen) { ps => prop(new HexRules.Board(ps)) }

  test("all moves of all top pieces keep the hive connected") {
    check(withBoard { b =>
      b.tops.forall { p =>
        HexRules.legalMoves(b, p).forall(m =>
          HexRules.connectedAfter(b, (m.from_q, m.from_r), (m.to_q, m.to_r)))
      }
    })
  }

  test("non-beetle destinations are empty and adjacent to the hive") {
    check(withBoard { b =>
      b.tops.filter(_.bug != "Beetle").forall { p =>
        HexRules.legalMoves(b, p).forall { m =>
          val dest = (m.to_q, m.to_r)
          val destEmpty = !b.occupied(dest)
          // perimeter: adjacent to an occupied cell other than the start
          val adj = HexRules.dirs.exists { d =>
            val n = (dest._1 + d._1, dest._2 + d._2)
            n != (m.from_q, m.from_r) && b.occupied(n)
          }
          destEmpty && adj
        }
      }
    })
  }

  test("destinations per piece are unique") {
    check(withBoard { b =>
      b.tops.forall { p =>
        val dests = HexRules.legalMoves(b, p).map(m => (m.to_q, m.to_r))
        dests.distinct.size == dests.size
      }
    })
  }

  test("queen moves only to the 6 neighbors; ant reaches a superset of queen dests") {
    check(withBoard { b =>
      b.tops.forall { p =>
        val moves = HexRules.queenMoves(b, p).map(m => (m.to_q, m.to_r))
        val neighbors = HexRules.dirs.map(d => (p.q + d._1, p.r + d._2)).toSet
        val queenOk = moves.forall(neighbors)
        // an ant in the same spot can reach every queen destination
        val antDests = HexRules.antMoves(b, p).map(m => (m.to_q, m.to_r)).toSet
        queenOk && moves.forall(antDests)
      }
    })
  }

  test("grasshopper jumps land on the first empty past >=1 occupied") {
    check(withBoard { b =>
      b.tops.forall { p =>
        HexRules.grasshopperMoves(b, p).forall { m =>
          val (dq, dr) = ((m.to_q - m.from_q).sign, (m.to_r - m.from_r).sign)
          // walk the ray: every intermediate cell occupied, dest empty
          val steps = math.max(math.abs(m.to_q - m.from_q),
            math.abs(m.to_r - m.from_r))
          val dir = HexRules.dirs.find { d =>
            (m.from_q + d._1 * steps, m.from_r + d._2 * steps) ==
              ((m.to_q, m.to_r))
          }
          dir.exists { d =>
            val inter = (1 until steps).forall(k =>
              b.occupied((m.from_q + d._1 * k, m.from_r + d._2 * k)))
            steps >= 2 && inter && !b.occupied((m.to_q, m.to_r))
          }
        }
      }
    })
  }

  test("spider destinations differ from start and are not neighbors-of-start-only (3 steps)") {
    check(withBoard { b =>
      b.tops.filter(_.bug == "Spider").forall { p =>
        HexRules.spiderMoves(b, p).forall { m =>
          (m.to_q, m.to_r) != ((m.from_q, m.from_r)) && m.kind == "Slide"
        }
      }
    })
  }
}
