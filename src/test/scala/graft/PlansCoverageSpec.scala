package graft

import org.scalatest.funsuite.AnyFunSuite

/** The r16 gap class, closed permanently (VERDICT r16 #1): eight
  * queries shipped with no captured physical plan because PLANS.md's
  * capture set was a hand-maintained headline list. PlanDump now sweeps
  * the full catalog; this spec asserts the invariant so a new query
  * without a regenerated PLANS.md fails the build, the same way
  * NoDecimalOutputSpec turned the q177 decimal lesson into a
  * sweep-the-catalog gate.
  *
  * File-only (no Spark session): headings are parsed from PLANS.md
  * verbatim, so the spec also catches a truncated or hand-edited dump.
  */
class PlansCoverageSpec extends AnyFunSuite {

  test("every catalog query has a captured plan heading in PLANS.md") {
    val plans = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("PLANS.md")),
      java.nio.charset.StandardCharsets.UTF_8)
    val headings = plans.linesIterator
      .collect { case l if l.startsWith("## ") => l.drop(3).trim }
      .toSet
    val missing = SparkEntry.queries.keySet.diff(headings).toSeq.sorted
    assert(missing.isEmpty,
      s"catalog queries with no PLANS.md capture (run `sbt \"runMain " +
        s"graft.PlanDump\"`): ${missing.mkString(", ")}")
  }

  test("PLANS.md has no stale headings for queries no longer in the catalog") {
    val plans = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("PLANS.md")),
      java.nio.charset.StandardCharsets.UTF_8)
    val headings = plans.linesIterator
      .collect { case l if l.startsWith("## ") => l.drop(3).trim }
      .toSet
    val stale = headings.diff(SparkEntry.queries.keySet).toSeq.sorted
    assert(stale.isEmpty,
      s"PLANS.md headings with no catalog query: ${stale.mkString(", ")}")
  }
}
