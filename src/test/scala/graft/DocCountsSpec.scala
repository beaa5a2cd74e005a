package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every registry count QUOTED in the docs is asserted against the
  * registry itself, so growing `SparkEntry.queries`/`oracleSql` (or
  * the dialect-gap list) without touching the prose fails CI instead
  * of shipping stale numbers — SURVEY §2.9 drifted exactly that way in
  * round 10 ("100 pass" hand-synced next to a computed 100/4-of-104).
  * No SparkSession needed: pure text vs. registry. */
class DocCountsSpec extends AnyFunSuite {

  private def read(p: String): String =
    new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)),
      "UTF-8")

  private val survey = read("SURVEY.md")
  private val readme = read("README.md")

  private val nQueries = SparkEntry.queries.size
  private val nOracles = SparkEntry.oracleSql.size
  private val nSwept = OracleDialectGaps.sweptCount
  private val nGaps = OracleDialectGaps.gaps.size

  /** Extract the single integer captured by `re` — the test fails if
    * the anchoring phrase disappears from the doc, so a rewrite that
    * drops the count can't silently skip the check. */
  private def quoted(doc: String, docName: String, re: String): Int = {
    val m = re.r.findFirstMatchIn(doc)
    assert(m.isDefined, s"$docName no longer contains /$re/ - " +
      "re-anchor DocCountsSpec to the reworded count")
    m.get.group(1).toInt
  }

  test("SURVEY §2.9 sweep counts match the registry") {
    assert(quoted(survey, "SURVEY.md",
      """runs ALL (\d+) oracle statements""") == nOracles)
    assert(quoted(survey, "SURVEY.md",
      """DSL twin: (\d+)\s+pass""") == nSwept,
      s"SURVEY quotes a swept count != computed $nSwept " +
        s"($nOracles oracles - $nGaps dialect gaps)")
  }

  test("README registry counts match the registry") {
    assert(quoted(readme, "README.md",
      """driver contract: (\d+) declared queries""") == nQueries)
    assert(quoted(readme, "README.md",
      """declared queries \+ (\d+) DuckDB oracles""") == nOracles)
    assert(quoted(readme, "README.md",
      """ALL (\d+) oracle statements""") == nOracles)
    assert(quoted(readme, "README.md",
      """(\d+)/\d+ expected""") == nOracles)
  }

  test("the dialect-gap list names only registered oracle statements") {
    val unknown = OracleDialectGaps.gaps.keySet -- SparkEntry.oracleSql.keySet
    assert(unknown.isEmpty, s"gap list references unknown queries: $unknown")
  }
}
