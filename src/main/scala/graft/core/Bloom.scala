package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A driver-built Bloom filter used as a runtime semi-join pre-filter —
  * the same shape as Spark's own AQE runtime row-group filters, but
  * available as an explicit library operator so a pipeline can build the
  * filter ONCE from a small build side and apply it to many 100 TB probe
  * scans (Spark's injected bloom is per-query and heuristic-gated).
  *
  * Scale design: the bitmap is a fixed-size sketch (default 2^17 bits =
  * 16 KB) regardless of probe-side size, built with one map-side-combined
  * aggregation over the (small) build side and collected to the driver —
  * the only driver-side data in the operator, and it is O(filter), not
  * O(data). Applied as a literal array + codegen'd bit tests, the probe
  * pass is map-only: false positives are removed by the exact join that
  * follows, so results are exact while the shuffle only carries rows that
  * pass the sketch. For bitmaps too big for a plan literal, swap the
  * `typedlit` for an explicit `SparkContext.broadcast` + scalar UDF; at
  * 16 KB the literal is cheaper.
  *
  * Hashing is `xxhash64(key, seed)` — engine-internal is fine here because
  * the sketch only PRE-filters; no oracle ever sees bloom output directly.
  */
object Bloom {

  final case class Filter(numBits: Int, numHashes: Int, words: Array[Long]) {

    /** True if `key` may be in the build set (never false for members). */
    def mightContain(key: Column): Column =
      (0 until numHashes).map { i =>
        val pos = pmod(xxhash64(key, lit(i)), lit(numBits.toLong))
        val word = element_at(typedlit(words.toSeq),
          (pos / 64).cast("int") + lit(1))
        call_function("shiftright", word, (pos % 64).cast("int"))
          .bitwiseAND(lit(1L)) =!= lit(0L)
      }.reduce(_ && _)
  }

  /** Build a filter over `key` evaluated against `build`'s rows.
    * numBits must be a multiple of 64 (default 2^17 → ~1% FP at 10k keys,
    * k=3). */
  def build(build: DataFrame, key: Column, numBits: Int = 1 << 17,
            numHashes: Int = 3): Filter = {
    require(numBits % 64 == 0, s"numBits must be a multiple of 64: $numBits")
    val positions = build.select(explode(array((0 until numHashes).map { i =>
      pmod(xxhash64(key, lit(i)), lit(numBits.toLong))
    }: _*)).as("pos"))
    val words = new Array[Long](numBits / 64)
    positions
      .select((col("pos") / 64).cast("long").as("w"),
        call_function("shiftleft", lit(1L), (col("pos") % 64).cast("int")).as("b"))
      .groupBy(col("w")).agg(expr("bit_or(b)").as("bits"))
      .collect()
      .foreach(r => words(r.getLong(0).toInt) = r.getLong(1))
    Filter(numBits, numHashes, words)
  }
}
