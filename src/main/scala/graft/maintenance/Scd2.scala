package graft.maintenance

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type-2 historization: turn a pile of
  * versioned snapshots (one row per key per observed version) into
  * interval rows `[valid_from, valid_to)` with a current flag — the shape
  * a training pipeline uses to ask "what did this record look like at
  * time T" (point-in-time correctness for features/labels).
  *
  * Scale design: one window over (key, version) — a single shuffle on the
  * key, no self-join (the naive formulation joins each version to its
  * successor, shuffling twice and exploding on skewed keys). The window's
  * sort is per-key and spills; downstream `asof`-style lookups then join
  * on key + interval containment (see q53's as-of pattern).
  */
object Scd2 {

  /** Adds `valid_from` (= the row's version), `valid_to` (the next
    * version's start, null while current) and `is_current`. `version`
    * must be totally ordered within a key (ties broken upstream). */
  def historize(snapshots: DataFrame, keys: Seq[String],
                version: Column): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(version)
    snapshots
      .withColumn("valid_from", version)
      .withColumn("valid_to", lead(version, 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }
}
