package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench's per-query outlier gate (VERDICT r11 #1): the r11 round
  * shipped q123 with a committed median of 18.2 s against a 4.3 s best pass
  * because mid-pass host contention was invisible to the pass-level
  * sentinels. The gate these tests pin guarantees, structurally, that a
  * committed median never exceeds 2x the query's own cross-pass minimum. */
class BenchSpec extends AnyFunSuite {

  test("median: odd and even counts") {
    assert(Bench.median(Seq(3.0, 1.0, 2.0)) == 2.0)
    assert(Bench.median(Seq(4.0, 1.0, 2.0, 3.0)) == 2.5)
    assert(Bench.median(Seq(5.0)) == 5.0)
  }

  test("the r11 q123 scenario: one contaminated pass is dropped") {
    // driver r11 per_run for q123: 4.33 / 18.17 / 22.4 — the old median
    // committed 18.17; the gate must drop both contaminated values
    val (med, mn, dropped) = Bench.gateQuery(Seq((0, 4.33), (1, 18.17), (2, 22.4)))
    assert(mn == 4.33)
    assert(dropped.map(_._1) == Seq(1, 2))
    assert(med == 4.33)
  }

  test("clean spread (<=1.2x) is never excluded") {
    val (med, mn, dropped) = Bench.gateQuery(Seq((0, 5.0), (1, 5.5), (2, 6.0)))
    assert(dropped.isEmpty)
    assert(med == 5.5 && mn == 5.0)
  }

  test("sub-second jitter under the 0.2s absolute floor is kept") {
    // 0.05 -> 0.14 is 2.8x but only +0.09s: trivial-query scheduler
    // jitter, not contention worth an exclusion record
    val (med, _, dropped) = Bench.gateQuery(Seq((0, 0.05), (1, 0.14), (2, 0.06)))
    assert(dropped.isEmpty)
    assert(med == 0.06)
  }

  test("sub-second value over both bounds IS excluded") {
    // 0.3 -> 0.9 is 3x and +0.6s: a real stall even on a small query
    val (_, _, dropped) = Bench.gateQuery(Seq((0, 0.3), (1, 0.9)))
    assert(dropped == Seq((1, 0.9)))
  }

  test("structural invariant: median never exceeds 2x the query's best") {
    // randomized-ish sweep over adversarial shapes, including all-noisy
    // passes where only the min survives
    val shapes = Seq(
      Seq(1.0, 2.1, 2.1), Seq(1.0, 1.99, 30.0), Seq(1.0, 3.0, 3.0, 3.0),
      Seq(2.0, 2.0, 100.0), Seq(0.5, 1.1, 1.3), Seq(7.0), Seq(4.33, 18.17, 22.4))
    shapes.foreach { vs =>
      val (med, mn, _) = Bench.gateQuery(vs.zipWithIndex.map { case (v, i) => (i, v) })
      assert(med <= 2 * mn + 1e-9, s"median $med > 2x min $mn for $vs")
    }
  }

  test("headline budgeter: fits the budget, keeps the slowest, counts the elided") {
    val items = (1 to 200).map(i => (f"q$i%03d", i / 10.0))
    val (json, omitted) = Bench.budgetedQueries(items, 600)
    assert(json.length <= 600)
    assert(omitted > 0 && omitted == 200 - json.count(_ == ':'))
    // slowest query always survives; the elided ones are the fastest
    assert(json.contains("\"q200\":20.000"))
    assert(!json.contains("\"q001\":"))
  }

  test("headline budgeter: everything fits when the budget allows") {
    val (json, omitted) = Bench.budgetedQueries(Seq(("q1", 1.0), ("q2", 2.0)), 1000)
    assert(omitted == 0)
    assert(json == "{\"q2\":2.000,\"q1\":1.000}")
  }

  test("headline budgeter: deterministic tie order by name") {
    val (json, _) = Bench.budgetedQueries(
      Seq(("qb", 1.0), ("qa", 1.0), ("qc", 1.0)), 1000)
    assert(json == "{\"qa\":1.000,\"qb\":1.000,\"qc\":1.000}")
  }

  test("designed top-K headline: 40 worst-case entries fit the budget with room (r14 #5)") {
    // the reported set is top-HeadlineTopK BY DESIGN; q_omitted must be 0
    // for it even with worst-case key ("q999") and value (>= 100 s) widths,
    // i.e. the budgeter backstop never engages in normal operation
    assert(Bench.HeadlineTopK == 40)
    val worst = (1 to Bench.HeadlineTopK).map(i => (f"q${900 + i}%d", 999.999))
    val (json, omitted) = Bench.budgetedQueries(worst, 1600 - 400)
    assert(omitted == 0, s"top-$worst elided under a scaffold-sized budget")
    assert(json.count(_ == ':') == Bench.HeadlineTopK)
    assert(json.length < 1600 - 400)
  }

  test("exactly-2x values are kept (bound is strict)") {
    val (med, _, dropped) = Bench.gateQuery(Seq((0, 1.0), (1, 2.0)))
    assert(dropped.isEmpty)
    assert(med == 1.5)
  }

  test("retry trigger: >5% of catalog excluded means the window retries (r18 #5)") {
    // the r18 driver final: 49 exclusions over 227 queries → retry;
    // a clean builder window: 1 over 227 → no retry; the boundary is
    // strict (exactly 5% stays put)
    assert(Bench.retryNeeded(49, 227))
    assert(!Bench.retryNeeded(1, 227))
    assert(!Bench.retryNeeded(11, 227)) // 11*20 = 220 <= 227
    assert(Bench.retryNeeded(12, 227))
    assert(!Bench.retryNeeded(5, 100)) // exactly 5%: no retry
    assert(Bench.retryNeeded(6, 100))
  }

  test("exclusionCount: counts per-query gate drops across passes") {
    // q_a clean spread, q_b one contaminated pass, q_c errored in pass 2
    // (error rows never feed the gate)
    val p1 = Seq(("q_a", 1.0, None), ("q_b", 1.0, None),
      ("q_c", 1.0, Option.empty[String]))
    val p2 = Seq(("q_a", 1.1, None), ("q_b", 9.0, None),
      ("q_c", 0.0, Some("Boom")))
    val p3 = Seq(("q_a", 1.05, None), ("q_b", 1.2, None),
      ("q_c", 1.0, Option.empty[String]))
    assert(Bench.exclusionCount(Seq(p1, p2, p3)) == 1)
    assert(Bench.exclusionCount(Seq.empty) == 0)
  }

  test("interiorStats: median/p90/n fold for the in-pass sentinel (r19 #1)") {
    // robust median: one GC-pause spike among clean samples doesn't move it
    val (med, p90, n) = Bench.interiorStats(Seq(0.06, 0.06, 0.07, 0.06, 1.5))
    assert(med == 0.06)
    assert(p90 == 0.07) // index (4*9)/10 = 3 of sorted — the spike is past p90...
    assert(n == 5)
    // the r19 blind spot, as numbers: bracket-clean but interior-hot is
    // now visible because the interior median IS the hot value
    val (hot, _, _) = Bench.interiorStats(Seq(0.35, 0.39, 0.36, 0.34, 0.38))
    assert(hot > 2 * 0.06 * 1.5) // reads >2x a clean window's interior
    // empty window (pass shorter than one probe period): NaN-marked, n=0
    val (e1, e2, en) = Bench.interiorStats(Seq.empty)
    assert(e1.isNaN && e2.isNaN && en == 0)
    // single sample: median = p90 = the sample
    assert(Bench.interiorStats(Seq(0.08)) == ((0.08, 0.08, 1)))
  }
}
