package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every catalog query on
  * SPARK_GRAFT_SF_DIR, prints ONE JSON line. Queries are fully materialized
  * through the `noop` sink (count() alone lets Catalyst skip projections),
  * run in sorted name order after a warmup action so per-query numbers
  * aren't polluted by JVM/codegen warmup.
  *
  * Robustness (VERDICT r4 #6): per-query times are the MEDIAN of
  * `SPARK_GRAFT_RUNS` (default 3) full passes — a one-off GC pause or
  * compilation stall can no longer masquerade as a regression — and one
  * extra pass runs at a second, smaller scale point (sf0.01 when the main
  * dir isn't already it) so the scaling slope between rounds is visible.
  * The printed line keeps the driver-parsed fields
  * (metric/value/unit/queries/errors/sf) but uses the short "qNN" key per
  * query and 3-decimal seconds so the line fits the driver's 2000-char
  * stdout tail capture (rounds 4-5 overflowed it -> parsed:null); the
  * verbose breakdown (full names, per-run times, the second-scale-point
  * per-query map) is written to BENCH_DETAIL.json alongside.
  *
  * Cross-query isolation: between timed queries every cache entry and
  * every persisted/checkpointed RDD is dropped (outside the timed window),
  * so one query's storage residue can never tax the next — per-query
  * numbers stay attributable and any storage leak shows up as that query's
  * own cost instead of a tax on everything after it. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = math.max(1, sys.env.get("SPARK_GRAFT_RUNS")
      .flatMap(_.toIntOption).getOrElse(3))
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // events stores TIMESTAMP(NANOS); the vectorized reader needs the
      // legacy conf to surface it as LongType nanoseconds (set once here,
      // not per-query — catalog lambdas must not mutate session conf)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    /** Drop all storage residue: CacheManager entries AND RDD-level blocks
      * (localCheckpoint blocks live only at the RDD level). Each unpersist
      * is individually guarded: a Scoped.releaseAfterUse listener can free
      * the same blocks CONCURRENTLY (it fires right after the query's
      * action), and a blocking unpersist of an already-released block
      * throws "Block ... does not exist" — which must not kill the bench
      * (it is exactly the storage-is-gone outcome this sweep wants). */
    def clearStorage(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach { r =>
        try r.unpersist(blocking = true)
        catch { case _: Throwable => () }
      }
    }

    /** One timed pass over the whole catalog at `dir`:
      * name → (seconds, error). A crashed query must be visible, not
      * disguised as a fast success. */
    // optional comma-separated filter for local iteration (unset = all)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    def pass(dir: String): Seq[(String, Double, Option[String])] =
      SparkEntry.queries.toSeq.sortBy(_._1)
        .filter { case (n, _) => only.forall(_.contains(n)) }
        .map { case (name, fn) =>
        val t0 = System.nanoTime()
        val err = try { fn(spark, dir).write.format("noop").mode("overwrite").save(); None }
          catch { case t: Throwable => Some(t.getClass.getSimpleName) }
        val sec = (System.nanoTime() - t0) / 1e9
        clearStorage() // outside the timed window: isolation, not overhead
        (name, sec, err)
      }

    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }

    // warmup: JIT + codegen + parquet footer caches, plus one pass of the
    // iterative checkpoint path (q25 at the smallest sf) so the first timed
    // iterative query isn't paying cold-JIT for shuffle+checkpoint code
    spark.range(1000000).selectExpr("sum(id)").collect()
    Seq("q01_pricing_summary" -> sfDir, "q25_pagerank" -> "/root/testdata/sf0.001")
      .foreach { case (q, dir) =>
        SparkEntry.queries.get(q)
          .foreach(fn => try fn(spark, dir).count() catch { case _: Throwable => () })
      }
    clearStorage()

    // main scale point: `runs` passes, per-query median over clean runs.
    // A query that errored in ANY pass appears ONLY under "errors" — never
    // in "queries" or the headline total — so a crash can't be disguised
    // as a fast clean run (the single-pass invariant, kept under medians).
    val passes = (1 to runs).map(_ => pass(sfDir))
    val names = passes.head.map(_._1)
    val results = names.map { name =>
      val times = passes.flatMap(_.collect { case (`name`, sec, None) => sec })
      val errs = passes.flatMap(_.collect { case (`name`, _, Some(e)) => e })
      if (errs.nonEmpty) (name, None, errs.headOption)
      else (name, Some(median(times)), None)
    }

    // second scale point (single pass — a slope indicator, not a
    // headline). Only run when it is genuinely SMALLER than the main
    // scale: with e.g. SPARK_GRAFT_SF_DIR=.../sf0.001 an unconditional
    // sf0.01 pass would be a 10x-larger run dominating wall time and
    // inverting the slope the field claims to show.
    // parse the sf from the LAST path segment only ("/data/sf9/sf0.001"
    // must read 0.001, not 9); unparseable → skip, with a stderr note so
    // an empty sf2_queries map in BENCH_DETAIL.json is explicable
    // (stdout stays one JSON line)
    def sfOf(dir: String): Option[Double] =
      "^sf([0-9]+(?:\\.[0-9]+)?)$".r
        .findFirstMatchIn(new java.io.File(dir).getName)
        .flatMap(_.group(1).toDoubleOption)
    val sf2Dir = "/root/testdata/sf0.01"
    val runPass2 = sfDir != sf2Dir && new java.io.File(sf2Dir).isDirectory &&
      (for (a <- sfOf(sfDir); b <- sfOf(sf2Dir)) yield b < a).getOrElse(false)
    if (!runPass2)
      System.err.println(s"[bench] second scale point skipped (main=$sfDir, sf2=$sf2Dir)")
    val pass2 = if (runPass2) pass(sf2Dir) else Seq.empty

    // ---- output. The driver captures only the LAST ~2000 chars of stdout
    // and json-parses the single line it finds there, so the printed line
    // must stay comfortably under that budget even as the catalog grows:
    // short keys (the unique "qNN" prefix of each query name), 3-decimal
    // seconds, and NO per-query second-scale-point map. Everything verbose
    // (full names, every run's time, the sf2 per-query map) goes to
    // BENCH_DETAIL.json in the working directory instead.
    def fmt(kv: Seq[(String, String)]): String =
      kv.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    // Locale.ROOT: a comma-decimal default locale would otherwise turn
    // 1.234 into "1,234" and break the JSON this exists to keep parseable
    def sec3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def shortKey(name: String): String = name.takeWhile(_ != '_')
    val qs = fmt(results.collect { case (k, Some(v), _) => shortKey(k) -> sec3(v) })
    val errs = fmt(results.collect { case (k, _, Some(e)) => shortKey(k) -> ("\"" + e + "\"") })
    val total = results.collect { case (_, Some(v), _) => v }.sum
    val total2 = pass2.collect { case (_, v, None) => v }.sum
    val errs2n = pass2.count(_._3.isDefined)

    val detail = {
      val perRun = names.map { name =>
        val runsJson = passes.map(_.collectFirst {
          case (`name`, sec, err) =>
            err.fold(sec3(sec))(e => "\"" + e + "\"")
        }.getOrElse("null")).mkString("[", ",", "]")
        name -> runsJson
      }
      val med = fmt(results.collect { case (k, Some(v), _) => k -> sec3(v) })
      val medErrs = fmt(results.collect { case (k, _, Some(e)) => k -> ("\"" + e + "\"") })
      val sf2Qs = fmt(pass2.collect { case (k, v, None) => k -> sec3(v) })
      val sf2Errs = fmt(pass2.collect { case (k, _, Some(e)) => k -> ("\"" + e + "\"") })
      s"""{"sf":"$sfDir","runs":$runs,"median":$med,"errors":$medErrs,"per_run":${fmt(perRun)},"sf2":"$sf2Dir","sf2_queries":$sf2Qs,"sf2_errors":$sf2Errs}"""
    }
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_DETAIL.json"),
      detail.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case t: Throwable => System.err.println(s"[bench] detail write failed: $t") }

    println(s"""{"metric":"total","value":${sec3(total)},"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir","runs":$runs,"sf2":"$sf2Dir","sf2_total":${sec3(total2)},"sf2_errors":$errs2n,"detail":"BENCH_DETAIL.json"}""")
    spark.stop()
  }
}
