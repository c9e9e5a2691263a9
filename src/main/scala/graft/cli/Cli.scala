package graft.cli

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.corpus.WikiCorpus
import graft.graph.GraphBuilder
import graft.index.InvertedIndex
import graft.pagerank.PageRank
import graft.search.Search

/** CLI mains mirroring the reference's three entry points
  * (/root/reference/README.md:15-68): RankPages ≈ PageRankMapReduce,
  * BuildIndex ≈ InvertedIndexMapReduce, SearchCli ≈ Query. The HBase
  * serving tables (S4–S6) are replaced by Parquet keyed tables — the
  * zero-egress, Spark-native serving layer (SURVEY.md §2.1).
  */
object Cli {
  def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // UTC pin (ADVICE r10): timestamp-epoch arithmetic and calendar
      // rendering must not depend on the host timezone
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

/** `RankPages <corpus> <outDir>` — ingest, build graph, run PageRank to the
  * reference's convergence policy, write the docs/pr serving tables and the
  * final `title \t pr` ranked list (ref stages A–D, pageRank.scala:331-393). */
object RankPages {
  /** The stage A–D chain, shared by `main` (the CLI surface) and the
    * q208 driver-gate entry (queries/CorpusSearch.scala), so the gate
    * exercises the CLI's OWN code path and artifacts, not a replica. */
  def pipeline(spark: SparkSession, input: String, out: String): PageRank.Result = {
    val docs = WikiCorpus.ingest(spark, input).cache()
    val graph = GraphBuilder.build(docs.select(col("title"), col("links")))
    val res = PageRank.run(graph)
    docs.write.mode("overwrite").parquet(s"$out/docs")
    res.graph.select(col("title"), col("pr"))
      .write.mode("overwrite").parquet(s"$out/pr")
    PageRank.ranked(res.graph)
      .select(concat_ws("\t", col("title"), col("pr")))
      .write.mode("overwrite").text(s"$out/ranked")
    docs.unpersist()
    res
  }

  def main(args: Array[String]): Unit = {
    val Array(input, out) = args.take(2)
    val spark = Cli.session()
    val res = pipeline(spark, input, out)
    println(s"iterations=${res.iterations} avgChange=${res.avgChange}")
    spark.stop()
  }
}

/** `BuildIndex <corpus> <outDir>` — positional inverted index with the df
  * cutoff, written as the `ii` Parquet serving table
  * (ref invertedIndex.scala:101-123). */
object BuildIndex {
  /** The build chain, shared by `main` (the CLI surface) and the q215
    * driver-gate entry (queries/CorpusSearch.scala) — the q208 pattern
    * applied to the reference's second main
    * (/root/reference/src/main/scala/invertedIndex.scala:101-123): the
    * gate drives the CLI's OWN code path and reads back its OWN `ii`
    * Parquet serving artifact, not a library replica. */
  def pipeline(spark: SparkSession, input: String, out: String): Unit = {
    val docs = WikiCorpus.ingest(spark, input)
    InvertedIndex.build(docs).write.mode("overwrite").parquet(s"$out/ii")
  }

  def main(args: Array[String]): Unit = {
    val Array(input, out) = args.take(2)
    val spark = Cli.session()
    pipeline(spark, input, out)
    spark.stop()
  }
}

/** `RunAll <corpus> <outDir> [term…]` — the whole reference workflow in
  * one invocation: ingest → graph → PageRank → index → serving tables,
  * then (optionally) a search over the freshly built tables. One Spark
  * session, shared docs scan across the rank and index branches. */
object RunAll {
  def main(args: Array[String]): Unit = {
    val Array(input, out) = args.take(2)
    val terms = args.drop(2).toSeq
    val spark = Cli.session()
    val docs = WikiCorpus.ingest(spark, input).cache()
    val graph = GraphBuilder.build(docs.select(col("title"), col("links")))
    val res = PageRank.run(graph)
    docs.write.mode("overwrite").parquet(s"$out/docs")
    res.graph.select(col("title"), col("pr"))
      .write.mode("overwrite").parquet(s"$out/pr")
    PageRank.ranked(res.graph)
      .select(concat_ws("\t", col("title"), col("pr")))
      .write.mode("overwrite").text(s"$out/ranked")
    InvertedIndex.build(docs).write.mode("overwrite").parquet(s"$out/ii")
    println(s"pipeline done: iterations=${res.iterations} avgChange=${res.avgChange}")
    if (terms.nonEmpty) {
      val n = docs.count()
      val hits = Search.search(spark,
        terms, n,
        spark.read.parquet(s"$out/ii"),
        spark.read.parquet(s"$out/pr"),
        spark.read.parquet(s"$out/docs"))
      hits.collect().foreach { r =>
        println(s"${r.getAs[String]("term")}\t${r.getAs[String]("title")}\t" +
          f"${r.getAs[Double]("score")}%.6f")
      }
    }
    spark.stop()
  }
}

/** `SearchCli <serveDir> <docCount> [--ranked] <term> [term…]` — mirrors
  * the reference's Query surface (Query.scala:59-64): point-reads the
  * serving tables, scores 0.5·tfidf + 0.5·pr, prints posting-ordered
  * results with ±20/+30-char snippets. `--ranked` switches to the
  * extension: per-title merged scores, top-20, score-descending. */
object SearchCli {
  def main(args: Array[String]): Unit = {
    val serveDir = args(0)
    val docCount = args(1).toLong
    val ranked = args.contains("--ranked")
    val terms = args.drop(2).filterNot(_ == "--ranked").toSeq
    val spark = Cli.session()
    val ii = spark.read.parquet(s"$serveDir/ii")
    val pr = spark.read.parquet(s"$serveDir/pr")
    val docs = spark.read.parquet(s"$serveDir/docs")
    if (ranked) {
      Search.searchRanked(spark, terms, docCount, ii, pr, docs).collect()
        .foreach { r =>
          println(s"${r.getAs[String]("title")}\t" +
            f"${r.getAs[Double]("score")}%.6f\t${r.getAs[Int]("n_terms_hit")}\t" +
            r.getAs[scala.collection.Seq[String]]("snippets").mkString(" | "))
        }
    } else {
      Search.search(spark, terms, docCount, ii, pr, docs).collect()
        .foreach { r =>
          println(s"${r.getAs[String]("term")}\t${r.getAs[String]("title")}\t" +
            f"${r.getAs[Double]("score")}%.6f\t" +
            r.getAs[scala.collection.Seq[String]]("snippets").mkString(" | "))
        }
    }
    spark.stop()
  }
}
