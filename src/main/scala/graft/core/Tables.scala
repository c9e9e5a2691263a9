package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loader for the driver-provided fixtures (TESTDATA.md).
  *
  * Scale notes (100 TB design): every reader goes through
  * `spark.read.parquet` so Catalyst's vectorized parquet reader, predicate
  * pushdown, column pruning and partition pruning all apply. On a real
  * cluster the same call reads a partitioned/ bucketed table layout; nothing
  * here assumes a single file.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")
}
