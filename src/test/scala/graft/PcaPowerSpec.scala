package graft

/** Pins q217's power-iteration accuracy on a corpus whose principal
  * direction is known ANALYTICALLY: four 2-D vectors (±2, 0), (0, ±1)
  * have exactly zero means and an exactly diagonal covariance
  * diag(2, 0.5) on the 1e-8 grid, so the leading eigenpair is
  * (λ=2, e₁) with no float ambiguity. Twelve L∞-normalized iterations
  * from the uniform start must drive the second coordinate to 0 on the
  * 1e-6 grid (the ratio decays 4× per step; hand-walked it reaches 0 at
  * t=11), land eigen6 = 2·10⁶ and trace6 = 2.5·10⁶ exactly, report
  * evr4 = 8000 (λ/tr = 0.8 on the ‱ grid), and show delta = 0 — the
  * fixed point reached. The gate (CORRECTNESS q217) pins cross-engine
  * parity of the same walk on real data; this spec pins that the walk
  * finds the truth when the truth is known.
  */
class PcaPowerSpec extends SparkSpec {

  test("q217 power iteration recovers an analytically known eigenpair") {
    import spark.implicits._
    val emb = Seq(
      (1L, Array(2.0f, 0.0f)),
      (2L, Array(-2.0f, 0.0f)),
      (3L, Array(0.0f, 1.0f)),
      (4L, Array(0.0f, -1.0f)))
      .toDF("vec_id", "embedding")
    val rows = graft.queries.DedupSim.pcaPowerIteration(emb)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap

    assert(rows(("pc1", 1L)) === 1000000L, "pc1 must align with e1")
    assert(rows(("pc1", 2L)) === 0L, "off-axis component must decay to 0")
    assert(rows(("eigen6", 0L)) === 2000000L) // λ = 2 on the 1e-6 grid
    assert(rows(("trace6", 0L)) === 2500000L) // tr = 2 + 0.5
    assert(rows(("evr4", 0L)) === 8000L) // λ/tr = 0.8 on the ‱ grid
    assert(rows(("delta", 0L)) === 0L, "twelve steps must reach the fixed point")
  }

  test("q219 deflation recovers the known second eigenpair") {
    import spark.implicits._
    val emb = Seq(
      (1L, Array(2.0f, 0.0f)),
      (2L, Array(-2.0f, 0.0f)),
      (3L, Array(0.0f, 1.0f)),
      (4L, Array(0.0f, -1.0f)))
      .toDF("vec_id", "embedding")
    val rows = graft.queries.DedupSim.pcaDeflation(emb)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap

    // deflating λ₁v₁v₁ᵀ = 2·e₁e₁ᵀ off diag(2, 0.5) leaves exactly
    // diag(0, 0.5): pc2 = e₂, λ₂ = 0.5, v₁·v₂ = 0 exactly
    assert(rows(("eigen6_1", 0L)) === 2000000L)
    assert(rows(("pc2", 1L)) === 0L, "pc2 must be orthogonal to e1")
    assert(rows(("pc2", 2L)) === 1000000L, "pc2 must align with e2")
    assert(rows(("eigen6_2", 0L)) === 500000L) // λ₂ = 0.5
    assert(rows(("evr4_1", 0L)) === 8000L)
    assert(rows(("evr4_2", 0L)) === 2000L) // 0.5/2.5 on the ‱ grid
    assert(rows(("dot12", 0L)) === 0L)
  }
}
