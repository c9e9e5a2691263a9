package graft.serve

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Serving-table layer (SURVEY.md §2.1 S4/S5 replacement — the reference
  * bulk-loads HBase; here serving tables are columnar files with layout
  * chosen for the read pattern).
  *
  * Scale notes (100 TB):
  *  - `writeBucketed` persists a table hash-bucketed (and sorted) by its
  *    join/lookup key. Two tables bucketed the same way join with NO
  *    exchange on either side — the co-located join that at cluster scale
  *    removes the dominant shuffle (verified by ServingSpec: the join plan
  *    of two bucketed tables contains no ShuffleExchange).
  *  - `writePartitioned` persists hive-style directory partitions for
  *    low-cardinality pruning columns (date, lang, source) — queries with
  *    a partition predicate read only matching directories
  *    (PartitionFilters in the scan).
  */
object Serving {

  /** Save as a bucketed+sorted managed table (requires a warehouse dir —
    * i.e. a real deployment or a test-scoped one). */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Save hive-style partitioned parquet at `path`. */
  def writePartitioned(df: DataFrame, path: String,
      partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite")
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Register every fixture table plus a `docs`-derived view so the plain
    * SQL entry path (`spark.sql(...)`) works over the engine's data.
    * Session builders still set `spark.sql.legacy.parquet.nanosAsLong=true`
    * — harmless on the current µs-encoded events fixture, required if a
    * TIMESTAMP(NANOS) generation returns (the encoding has flipped across
    * driver regenerations; see Tables.epochMicros). Set it in the session
    * builder, as Bench/Verify/Cli do — mutating conf here would be a
    * surprise side effect for callers. */
  def registerViews(spark: SparkSession, sfDir: String): Unit = {
    graft.core.Tables.names.foreach { name =>
      spark.read.parquet(s"$sfDir/$name.parquet").createOrReplaceTempView(name)
    }
  }
}
