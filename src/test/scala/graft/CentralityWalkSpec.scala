package graft

import org.apache.spark.sql.functions._

/** Analytic pins for the extracted centrality walk cores (the
  * LogLogSmallRangeSpec pattern: the catalog gate proves cross-engine
  * parity on the fixture, this spec proves the ALGORITHM against known
  * mathematics on crafted graphs).
  *
  * Eigenvector: on a triangle ∪ disjoint edge, the triangle is the
  * dominant component (λ₁ = 2) and its uniform eigenvector is an exact
  * fixed point of the L∞-normalized iteration, while the edge component
  * (λ₂ = 1) decays by exactly λ₂/λ₁ = 1/2 per step — all values are
  * powers of two, so the 1e-9 quantization is EXACT and the assertion
  * is equality, not tolerance.
  *
  * Katz: on a directed path the series terminates analytically; the
  * expected values are the same scalar recurrence (with the same 1e-9
  * grid) run in plain Scala.
  */
class CentralityWalkSpec extends SparkSpec {

  test("eigenWalk: triangle stays at the fixed point, spectral-gap decay is exact") {
    import spark.implicits._
    val und = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L)).toDF("w1", "w2")
    val edges = und.select(col("w1").as("src"), col("w2").as("dst"))
      .unionByName(und.select(col("w2").as("src"), col("w1").as("dst")))
    val x = graft.queries.CorpusSearch.eigenWalk(edges, 6)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(x(1L) == 1.0 && x(2L) == 1.0 && x(3L) == 1.0,
      s"triangle vertices must sit at the normalized fixed point: $x")
    val expectedEdge = math.pow(0.5, 6) // (λ2/λ1)^iters, exact in doubles
    assert(x(4L) == expectedEdge && x(5L) == expectedEdge,
      s"edge component must decay by exactly 1/2 per iteration: $x")
  }

  test("katzWalk: directed path matches the scalar recurrence on the same grid") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val x = graft.queries.CorpusSearch.katzWalk(edges, 6)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // the same recurrence, scalar: x_v = grid(1 + β·Σ_{u→v} x_u)
    val beta = 1.0 / 1024.0
    def grid(v: Double): Double = math.floor(v * 1e9 + 0.5) / 1e9
    var (x1, x2, x3) = (1.0, 1.0, 1.0)
    for (_ <- 1 to 6) {
      val (n1, n2, n3) = (grid(1.0), grid(1.0 + beta * x1), grid(1.0 + beta * x2))
      x1 = n1; x2 = n2; x3 = n3
    }
    assert(x(1L) == x1 && x(2L) == x2 && x(3L) == x3,
      s"katz walk must equal the scalar model: got $x expected ($x1, $x2, $x3)")
  }
}
