package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew mitigation for hot keys (SURVEY.md §4 / builder scale
  * notes). AQE's skew-join handling splits oversized partitions at
  * runtime; these utilities are the static complement for when the skew is
  * KNOWN (a handful of hot keys taking a large share of rows) and for
  * shapes AQE cannot rescue (per-key state like collect_set on a hot key).
  *
  * All salts are deterministic (hash of the row, not rand()) so results
  * are reproducible and retries/speculative tasks see identical data.
  */
object Skew {

  /** Salted equi-join: the big (skewed) side gets a deterministic salt in
    * [0, saltFactor); the small side is replicated saltFactor times; the
    * join key becomes (key, salt), so one hot key's rows spread over
    * saltFactor reduce partitions instead of one straggler. Semantically
    * identical to `big.join(small, key)` for any salt assignment — the
    * salt only routes rows. Cost: saltFactor× the small side (keep it
    * broadcast-small or saltFactor modest). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      saltFactor: Int): DataFrame = {
    val salt = pmod(xxhash64(big.columns.map(col): _*), lit(saltFactor.toLong))
      .cast("int")
    val salted = big.withColumn("__salt", salt)
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** CONDITIONALLY salted equi-join: only the keys listed in `hotKeys`
    * (a small, broadcastable one-column relation — e.g. cells whose row
    * count exceeds a threshold) are salted; every other key joins
    * unsalted (salt 0, no replication). For blocked pair generation
    * (q121's SRP-cell join) a hot cell otherwise degrades to a
    * near-cartesian computed by ONE task; salting spreads that cell's
    * pairs over `saltFactor` partitions without changing the pair set —
    * the output is row-identical to `big.join(small, key)` (SkewSpec).
    * Replication cost is saltFactor× the small side's HOT rows only. */
  def saltedJoinHot(big: DataFrame, small: DataFrame, key: String,
      saltFactor: Int, hotKeys: DataFrame): DataFrame = {
    val salt = pmod(xxhash64(big.columns.map(col): _*), lit(saltFactor.toLong))
      .cast("int")
    val salted = big.join(hotMarker(hotKeys, key), Seq(key), "left")
      .withColumn("__salt", when(col("__hot").isNotNull, salt).otherwise(lit(0)))
      .drop("__hot")
    salted.join(replicateHot(small, key, saltFactor, hotKeys), Seq(key, "__salt"))
      .drop("__salt")
  }

  private def hotMarker(hotKeys: DataFrame, key: String): DataFrame =
    broadcast(hotKeys.select(col(key)).distinct().withColumn("__hot", lit(1)))

  /** The hot-replicated small side of [[saltedJoinHot]]: hot rows explode
    * into saltFactor salted copies, cold rows keep the single salt-0 copy.
    * Package-visible so SkewSpec can pin the replication bound directly
    * (|small| + (saltFactor−1)·|hot rows|) instead of inferring it. */
  private[graft] def replicateHot(small: DataFrame, key: String,
      saltFactor: Int, hotKeys: DataFrame): DataFrame =
    small.join(hotMarker(hotKeys, key), Seq(key), "left")
      .withColumn("__salt", explode(
        when(col("__hot").isNotNull, sequence(lit(0), lit(saltFactor - 1)))
          .otherwise(array(lit(0)))))
      .drop("__hot")

  /** Skew-safe exact collect_set: two-phase — collect within (key, salt)
    * buckets, then merge bucket sets per key. Catalyst's partial
    * aggregation already makes algebraic aggs (sum/count) skew-safe; this
    * is for holistic per-key state, where a hot key's single reducer would
    * otherwise hold the whole set. */
  def saltedCollectSet(df: DataFrame, key: String, valueCol: String,
      saltFactor: Int, out: String): DataFrame = {
    val salt = pmod(xxhash64(col(valueCol)), lit(saltFactor.toLong)).cast("int")
    df.withColumn("__salt", salt)
      .groupBy(col(key), col("__salt"))
      .agg(collect_set(col(valueCol)).as("__partial"))
      .groupBy(col(key))
      .agg(array_sort(array_distinct(flatten(collect_list(col("__partial")))))
        .as(out))
  }
}
