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

  test("KmvSketch: buffer dedups, stays bounded, merge == rebuild, matches brute force") {
    import graft.functions.KmvSketch
    val k = 8
    val agg = new KmvSketch(k)
    def build(xs: Seq[Long]): KmvSketch.Buf =
      xs.foldLeft(agg.zero)(agg.reduce)
    val rnd = new scala.util.Random(7)
    (0 until 30).foreach { trial =>
      val xs = Seq.fill(40)(rnd.nextLong(100).abs)
      val buf = build(xs)
      val expect = xs.distinct.sorted.take(k)
      assert(buf.vs.toSeq === expect, s"trial $trial")
      // merge of any split == sketch of the whole
      val (l, r) = xs.splitAt(rnd.nextInt(xs.size + 1))
      assert(agg.merge(build(l), build(r)).vs.toSeq === expect, s"merge trial $trial")
      val out = agg.finish(buf)
      assert(out.n_sketch === expect.size.toLong)
      assert(out.kth_min === (if (expect.isEmpty) 0L else expect.last))
    }
    // degenerate: empty input
    assert(agg.finish(agg.zero) === KmvSketch.Out(0L, 0L))
  }

  test("KmvSketch over a grouped Dataset partial-aggregates (no global sort)") {
    import spark.implicits._
    val k = 4
    val ds = Seq(("a", 10L), ("a", 3L), ("a", 10L), ("a", 7L), ("a", 1L),
      ("a", 9L), ("b", 5L)).toDS()
    val out = ds.groupByKey(_._1).mapValues(_._2)
      .agg(new graft.functions.KmvSketch(k).toColumn.name("sk"))
      .collect().toMap
    assert(out("a") === graft.functions.KmvSketch.Out(4L, 9L)) // {1,3,7,9}
    assert(out("b") === graft.functions.KmvSketch.Out(1L, 5L))
    // plan shape: a hash/object aggregate with a partial phase, no window
    val plan = ds.groupByKey(_._1).mapValues(_._2)
      .agg(new graft.functions.KmvSketch(k).toColumn.name("sk"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan.take(800))
    assert(plan.contains("Aggregate"), plan.take(800))
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

  test("lshRecall sampleFraction bounds the exact side deterministically (md5-bucket)") {
    import org.apache.spark.sql.functions._
    import graft.queries.DedupSim
    val dir = "/root/testdata/sf0.001"
    // the sample filter must be proper at this fraction: some docs in,
    // some out — otherwise the <=-chain below would be vacuous
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val kept = docs.filter(
      graft.core.Portable.hash32(concat(lit("lshs:"), col("doc_id").cast("string"))) % 10000
        < lit(2500L)).count()
    assert(kept > 0 && kept < docs.count(), s"fraction 0.25 kept $kept docs")
    def run(f: Double) = {
      val r = DedupSim.lshRecall(spark, dir, f).collect().head
      (r.getLong(0), r.getLong(1), r.getLong(2)) // (n_exact, n_cand, n_hit)
    }
    val full = run(1.0)
    val half = run(0.75)
    val quarter = run(0.25)
    // buckets are NESTED (bucket < 2500 ⊆ bucket < 7500 ⊆ all) and a pair
    // survives only if BOTH endpoints do → exact-pair counts are monotone
    assert(quarter._1 <= half._1 && half._1 <= full._1)
    assert(quarter._3 <= quarter._1 && half._3 <= half._1)
    // the candidate side is a full-corpus property, untouched by sampling
    assert(quarter._2 === full._2 && half._2 === full._2)
    // deterministic: same fraction, same result (seed-free md5 buckets)
    assert(run(0.25) === quarter)
    intercept[IllegalArgumentException](DedupSim.lshRecall(spark, dir, 0.0))
    ()
  }

  test("simhashQuality sampleFraction bounds the exact side; n_pred stays corpus-wide") {
    import graft.queries.DedupSim
    val dir = "/root/testdata/sf0.001"
    def run(f: Double) = {
      val r = DedupSim.simhashQuality(spark, dir, f).collect().head
      (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)) // (n_exact, n_pred, n_hit, prec, recall)
    }
    val full = run(1.0)
    val half = run(0.5)
    // nested md5 buckets → sampled exact-pair counts are monotone
    assert(half._1 <= full._1 && half._3 <= half._1)
    // the predicted side is a full-corpus property, untouched by sampling
    assert(half._2 === full._2)
    // at 1.0 prec is n_hit / n_pred exactly
    assert(full._4 === full._3.toDouble / full._2)
    // prec's denominator under sampling is the SAMPLE-endpoint candidate
    // set, so prec stays a [0,1] rate (dividing by the full n_pred would
    // deflate it by the square of the sample rate)
    if (half._3 > 0) assert(half._4 > 0.0 && half._4 <= 1.0)
    // deterministic: same fraction, same result
    assert(run(0.5) === half)
    intercept[IllegalArgumentException](DedupSim.simhashQuality(spark, dir, 0.0))
    ()
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
