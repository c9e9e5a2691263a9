package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is assembled from per-domain catalogs so each operator family
  * (relational / corpus+search / dedup+similarity / text / events) owns its
  * own Spark implementation and DuckDB oracle side by side.
  */
object SparkEntry {

  private def catalogs: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] =
    graft.queries.Relational.catalog ++
      graft.queries.CorpusSearch.catalog ++
      graft.queries.DedupSim.catalog ++
      graft.queries.TextOps.catalog ++
      graft.queries.TextOps.catalogTrainer ++
      graft.queries.Events.catalog ++
      graft.queries.MultimodalQ.catalog

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q20_tfidf_search")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    catalogs.map { case (n, q, _) => n -> q }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    catalogs.collect { case (n, _, Some(sql)) => n -> sql }.toMap
}
