package graft

import org.apache.spark.sql.functions._

/** Approximate aggregates (SURVEY.md §2.4 extension line — HLL and
  * quantile sketches come from Catalyst; these pin their accuracy
  * contracts on fixture data so the engine can advertise them). */
class ApproxSpec extends SparkSpec {

  lazy val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")

  test("approx_count_distinct (HLL) within 5% of exact") {
    val r = li.agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey")).as("approx"))
      .head()
    val (exact, approx) = (r.getLong(0), r.getLong(1))
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"exact=$exact approx=$approx")
  }

  test("approx_percentile brackets the exact median") {
    val exact = li.stat.approxQuantile("l_extendedprice", Array(0.5), 0.0).head
    val approx = li.agg(
      percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)))
      .head().getDouble(0)
    val spread = li.agg(max("l_extendedprice")).head().getDouble(0)
    assert(math.abs(approx - exact) / spread < 0.02,
      s"exact=$exact approx=$approx")
  }

  test("typed Dataset surface compiles the same plan") {
    import spark.implicits._
    val f = java.nio.file.Files.createTempFile("t", ".txt")
    java.nio.file.Files.writeString(f,
      "<title>a</title> [[b]] <text>hello world</text>\n")
    val ds = graft.corpus.WikiCorpus.ingestDS(spark, f.toString)
    val doc: graft.corpus.WikiCorpus.Doc = ds.head()
    assert(doc.title === "a" && doc.links === Seq("b") && doc.body === "hello world")
  }
}
