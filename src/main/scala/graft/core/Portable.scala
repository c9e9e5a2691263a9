package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column helpers whose semantics are reproducible bit-for-bit in other
  * engines (the DuckDB oracle in particular). Used by the dedup / LSH /
  * fingerprint operators so the correctness gate can hash-compare results.
  *
  * Engine-portable primitives used:
  *  - md5(string) — identical across engines.
  *  - 32-bit truncation of the md5 → an unsigned value in [0, 2^32), which
  *    both Spark (`conv(hex,16,10)`) and DuckDB (`('0x'||hex)::BIGINT`) can
  *    compute without overflow in 64-bit integer arithmetic.
  *
  * All of this is codegen'd Catalyst expressions (no Scala UDFs) so it runs
  * inside whole-stage codegen at scale.
  */
object Portable {

  /** Unsigned 32-bit hash of a string column: first 8 hex chars of md5.
    * DuckDB equivalent: `('0x' || substr(md5(x),1,8))::BIGINT`. */
  def hash32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** 60-bit hash of a string column: first 15 hex chars of md5 (fits a
    * signed BIGINT in both engines — 16 chars would overflow). For
    * COMPACTING wide join keys (e.g. 5-word shingles, ~40 bytes) to 8-byte
    * longs before a shuffle: collisions over n distinct keys ≈ n²/2⁶¹
    * (3e-6 at 3M keys), and because the hash is md5-derived the oracle
    * computes the IDENTICAL value, so even a collision cannot cause a
    * cross-engine mismatch.
    * DuckDB equivalent: `('0x' || substr(md5(x),1,15))::BIGINT`. */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Explode a COMPUTED array expression without the inferred-filter tax.
    *
    * A plain `explode(e)` gets `size(e) > 0 AND isnotnull(e)` inferred
    * beneath it (InferFiltersFromGenerate) — with the array expression `e`
    * DUPLICATED into the filter and pushed to the scan, where it runs
    * again on every input row, outside the Generate's evaluation and (for
    * higher-order functions, which are CodegenFallback) outside codegen
    * subexpression elimination. For an expensive `e` — a regexp tokenize,
    * an n-gram transform, q111's chunk pipeline — the stage then pays
    * 2-3× the expression cost (q111 measured 9 s vs 1 s at sf0.1).
    *
    * `explode_outer` is skipped by that rule; filtering nulls on the
    * exploded ATTRIBUTE afterwards restores inner-explode semantics
    * (empty/null arrays drop) at the cost of one null check per output
    * row — EXCEPT for null array ELEMENTS, which plain `explode` emits as
    * rows but this helper silently drops (the null check cannot tell a
    * null element from an outer-padded row). Contract: use only for
    * computed, null-element-free arrays (regexp_extract_all, transform
    * over non-null lambdas, the tokenize UDF — every current call site);
    * a stored array column that may hold null elements needs plain
    * explode, which is fine as-is over a stored column anyway. */
  def explodeLean(df: DataFrame, keep: Seq[Column], arr: Column, as: String): DataFrame =
    df.select(keep :+ explode_outer(arr).as(as): _*)
      .filter(col(as).isNotNull)

  /** Universal-hash family over a 32-bit input, h_i(x) = (a_i*x + b_i) mod p
    * with p = 2^31 - 1 (Mersenne prime). a_i/b_i derived deterministically
    * from the seed index so Spark and the oracle agree with no shared state.
    * Products stay < 2^63 (a < 2^31, x < 2^32 ... a*x can reach 2^63!) — so
    * reduce x mod p first: (a*(x mod p) + b) mod p keeps products < 2^62. */
  def minhashPerm(h32modP: Column, i: Int): Column = {
    val p = 2147483647L
    val a0 = 1103515245L * (i + 1) % p
    val a = if (a0 == 0L) 1L else a0
    val b = 12345L * (i + 7) % p
    (h32modP * a + b) % p
  }

  val MersenneP = 2147483647L

  /** Exact-arithmetic sum of a double column: cast to decimal(18,2), sum
    * (order-independent, overflow-checked), back to double. This is how
    * every money-valued aggregate in the catalog avoids float accumulation
    * nondeterminism across partition orders AND engines. */
  def dsum(c: Column): Column = sum(c.cast("decimal(18,2)")).cast("double")

  /** Exact average with the same trick; result rounded to 6 places so the
    * final division (done in double) cannot disagree in the last ulp. */
  def davg(c: Column): Column =
    round(sum(c.cast("decimal(18,2)")).cast("double") / count(c), 6)
}
