package graft.core

/** ONE policy point for every blocked-pair space (VERDICT r13 #7).
  *
  * The recurring scale lesson — measured three times as controlled A/Bs
  * (q34→q126 simhash width, q136's first cut, q161's SRP banding) and a
  * fourth time in ER form (q154) — is that the blocked-pair candidate
  * term is n²/|blocks|: a FIXED block space turns quadratic as the
  * corpus grows, so the block count must grow with it. Every
  * blocked-pair consumer in the catalog must derive its width from here
  * or carry an explicit A/B-control annotation (q34 is the only such
  * control); SimHashWidthSpec greps the call sites to enforce it.
  *
  * The q112 semantic-dedup analogue (per-block k, not width) lives as
  * `DedupSim.semdedupK` with the same rationale and its own spec pin.
  */
object BlockPolicy {

  /** SimHash text-blocking width in bits: 64-bit = 4×16-bit blocks =
    * 262,144-bucket space, the configuration whose sf0.1→sf1 slope
    * measured 0.37× linear vs 1.76× at 32 bits (SCALING.md). 32-bit
    * survives only as q34's oracle-parity A/B control. */
  val SimHashScaleBits: Int = 64

  /** SRP (signed random projection) cell bits banded on corpus size:
    * ~32 vectors per cell at every fixture scale (q161's measured rule
    * — a fixed 16-cell space was 0.90×-linear at sf1; banding restored
    * 0.15×). Oracles mirror the band with a CASE on COUNT(*), so both
    * engines pick the same width from the data. */
  def srpBits(n: Long): Int =
    if (n >= 10000L) 10 else if (n >= 2000L) 6 else 4

  /** Doc budget for the EXACT side of the sketch-quality evals (q122 —
    * VERDICT r14 #3): the all-pairs-by-shingle ground-truth join is the
    * one intentionally quadratic shape in the dedup family, so above
    * this many documents the eval runs it over a deterministic
    * md5-bucket doc sample (`DedupSim.sampleDocs`) of ~this size and
    * reports the recall estimate's 95% CI alongside it. 2000 docs ≈
    * 2M shingle-pair candidates — bounded regardless of corpus size —
    * and keeps every fixture gate (≤500 docs) at fraction 1.0, where
    * the sample filter is absent and the DuckDB oracle needs no twin. */
  val ExactEvalDocBudget: Long = 2000L

  /** Fraction of docs the exact ground-truth side evaluates: 1.0 up to
    * [[ExactEvalDocBudget]], then budget/n — the sampled doc count stays
    * ~constant, so the quadratic term stops growing with the corpus. */
  def exactEvalFraction(nDocs: Long): Double =
    if (nDocs <= ExactEvalDocBudget) 1.0
    else ExactEvalDocBudget.toDouble / nDocs

  /** ER composite-name-key refinement band (q154): below the band the
    * complementary 3-word keys stand alone (the oracle-gated fixture
    * config); above it each key is refined with the first 3 characters
    * of the word it omits, multiplying the block space by that word's
    * prefix cardinality. The refinement narrows the recall contract to
    * edits that spare the omitted word's first 3 chars — which every
    * corruption class the operator is specified against satisfies
    * (case flips are normalized, truncation drops the string's FINAL
    * character, exact dups are untouched). */
  def refineNameBlocks(n: Long): Boolean = n >= 100000L
}
