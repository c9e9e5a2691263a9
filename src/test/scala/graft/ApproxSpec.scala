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

  test("KmvSketchNullSafe skips NULL keys; cent-grid key is canonical past 1e7") {
    import spark.implicits._
    import graft.functions.{KmvSketch, KmvSketchNullSafe}
    // Null-skipping (ADVICE r12): a nullable key column with NULLs must
    // sketch exactly the non-null values — the DuckDB twin's WHERE c IS
    // NOT NULL semantics — not error or fabricate a value.
    val kmv = udaf(new KmvSketchNullSafe(8), org.apache.spark.sql.Encoders.LONG)
    val out = Seq[(Long, Option[Long])]((1L, Some(10L)), (2L, None),
      (3L, Some(20L)), (4L, None), (5L, Some(10L)))
      .toDF("id", "h").agg(kmv(col("h")).as("sk"))
      .select(col("sk.n_sketch"), col("sk.kth_min")).head()
    assert(out.getLong(0) === 2L) // 10 and 20; the two NULL rows skipped
    assert(out.getLong(1) === 20L)
    // q140's canonical double key: floor(x*100 + 0.5) cast to string is
    // the SAME text both engines hash, even where raw double rendering
    // diverges (Java prints 9.8765432105E7 at >= 1e7; DuckDB never
    // switches to scientific). Pin the Spark expression to the integer
    // grid on hostile values: the >= 1e7 range, negatives, and a
    // half-cent boundary.
    val hostile = Seq(98765432.105, 12345678.25, 10000000.005, -20000000.015,
      1.0e7, 123456789012.34, -0.005, 0.0)
    val got = hostile.toDF("x")
      .select(expr("cast(floor(x * 100 + 0.5) as string)").as("key"))
      .collect().map(_.getString(0))
    val expect = hostile.map(x => math.floor(x * 100 + 0.5).toLong.toString)
    assert(got.toSeq === expect, "Spark cent-grid key diverges from the scalar model")
    got.foreach(k => assert(!k.contains("E") && !k.contains("."),
      s"key $k is not on the integer grid — engines would hash different text"))
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
      // CI columns (r14 #3): present, ordered, and bracketing the estimate
      if (r.getLong(0) > 0) {
        val (lo, hi, rec) = (r.getDouble(5), r.getDouble(6), r.getDouble(4))
        assert(lo >= 0.0 && hi <= 1.0 && lo <= hi, s"CI [$lo, $hi] at f=$f")
        // bounds are 1e-4-quantized around recall; allow the half-grid slop
        assert(lo <= rec + 5e-5 && hi >= rec - 5e-5, s"CI [$lo, $hi] vs $rec")
      } else assert(r.isNullAt(5) && r.isNullAt(6))
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

  test("sketchEval: production-config rows equal the q114/q122 gates; sweep rows are coherent") {
    import graft.queries.DedupSim
    val dir = "/root/testdata/sf0.001"
    val rows = DedupSim.sketchEval(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    assert(rows.keySet === Set("minhash_lsh_4x4", "minhash_lsh_8x2",
      "simhash_ham3", "simhash_ham2", "srp_ivf_p32", "srp_ivf_p8"))
    // the default configs ARE the standalone gates (same helpers, 1.0 sample)
    val lsh = DedupSim.lshRecall(spark, dir).collect().head
    assert(rows("minhash_lsh_4x4") ===
      ((lsh.getLong(0), lsh.getLong(1), lsh.getLong(2), lsh.getDouble(3))))
    val shq = DedupSim.simhashQuality(spark, dir).collect().head
    assert(rows("simhash_ham3") ===
      ((shq.getLong(0), shq.getLong(1), shq.getLong(2), shq.getDouble(4))))
    // sweep coherence: shorter band signatures can only ADD candidates
    // (any 4-row band match implies both 2-row halves match);
    // a tighter hamming threshold can only REMOVE them
    assert(rows("minhash_lsh_8x2")._2 >= rows("minhash_lsh_4x4")._2)
    assert(rows("minhash_lsh_8x2")._3 >= rows("minhash_lsh_4x4")._3)
    assert(rows("simhash_ham2")._2 <= rows("simhash_ham3")._2)
    assert(rows("simhash_ham2")._3 <= rows("simhash_ham3")._3)
    // fewer probes can only lower ANN recall
    assert(rows("srp_ivf_p8")._4 <= rows("srp_ivf_p32")._4)
    // all exact sides within a ground-truth family agree
    assert(rows("minhash_lsh_4x4")._1 === rows("simhash_ham3")._1)
  }

  test("hybridRrf topK: truncation preserves per-row global ranks; covering K is exact") {
    import graft.queries.CorpusSearch
    val dir = "/root/testdata/sf0.001"
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val full = rows(CorpusSearch.hybridRrf(spark, dir))
    assert(full.nonEmpty && full.size <= 20)
    // K smaller than the vector corpus: the vec side genuinely truncates
    val k = 25
    val trunc = rows(CorpusSearch.hybridRrf(spark, dir, topK = k))
    assert(trunc.size <= 20)
    val fullByDoc = full.map(t => t._1 -> ((t._2, t._3))).toMap
    trunc.foreach { case (doc, rl, rv) =>
      // ranks within the K-row candidate list are bounded by K and equal
      // the full-corpus ranks for every kept doc (the TakeOrdered top-K
      // keeps global positions under the same total order)
      assert(rl <= k && rv <= k, s"doc $doc rank outside K")
      fullByDoc.get(doc).foreach { case (frl, frv) =>
        assert(rl === frl && rv === frv, s"doc $doc rank drift under truncation")
      }
    }
    // a K covering the corpus reproduces the default result exactly
    assert(rows(CorpusSearch.hybridRrf(spark, dir, topK = 100000)) === full)
    intercept[IllegalArgumentException](CorpusSearch.hybridRrf(spark, dir, topK = 10))
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
