package graft

import org.apache.spark.sql.functions._

/** Contracts of the r13 curation/planning operators: the token-budget
  * recipe (q141) must hit its targets exactly (to one document), the
  * vocab coverage curve (q142) must agree with a brute-force scalar
  * model, and the KMV join-key overlap estimator (q147) must match the
  * scalar KMV set-operation algebra on known sets.
  */
class RecipeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q141: per-language kept tokens hit the target to within one document") {
    val rows = SparkEntry.queries("q141_token_recipe")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("lang"),
        size(expr("regexp_extract_all(lower(text), '[a-z]+', 0)"))
          .cast("long").as("n_tok"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val grand = docs.map(_._3).sum
    val wPm = Map("en" -> 225L, "de" -> 375L, "zh" -> 375L, "fr" -> 300L,
      "es" -> 225L)
    docs.groupBy(_._2).foreach { case (lang, ds) =>
      val tot = ds.map(_._3).sum
      val target = wPm(lang) * grand / 1000
      val kept = rows.filter(_._2 == lang).map(t => t._3 * t._4).sum
      val maxDoc = ds.map(_._3).max
      // exact-budget property: kept tokens land in [target, target + maxDoc)
      // (the partial prefix includes the doc that crosses the boundary)
      assert(kept >= target && kept < target + maxDoc,
        s"$lang: kept $kept vs target $target (maxDoc $maxDoc)")
      // epoch floor: every kept doc repeats at least target div tot times
      val nFull = target / tot
      rows.filter(_._2 == lang).foreach(t =>
        assert(t._4 == nFull || t._4 == nFull + 1,
          s"$lang doc ${t._1}: n_copies ${t._4} not in {$nFull, ${nFull + 1}}"))
    }
    // docs with n_copies = 0 are genuinely dropped, not missing rows: the
    // output holds exactly the docs of languages with nFull >= 1 plus
    // each language's partial prefix
    assert(rows.map(_._1).distinct.length === rows.length, "doc_id unique")
  }

  test("q142: coverage curve equals the brute-force sorted-vocab model") {
    val rows = SparkEntry.queries("q142_vocab_coverage")(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val counts = spark.read.parquet(s"$dir/documents.parquet")
      .select(explode(expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).as("t"))
      .groupBy("t").count().collect().map(_.getLong(1)).sortBy(-_)
    val total = counts.sum
    rows.foreach { case (pct, vocabSize, totalTokens, _) =>
      assert(totalTokens === total)
      // brute force: greedily take the most frequent terms until coverage
      var cum = 0L
      var k = 0L
      while (cum * 100 < pct * total) { cum += counts(k.toInt); k += 1 }
      assert(vocabSize === k, s"pct $pct: got $vocabSize, brute force $k")
    }
    assert(rows.map(_._1).toSeq === Seq(50, 90, 99))
  }

  test("q147: estimator equals the scalar KMV set-operation algebra") {
    val row = SparkEntry.queries("q147_join_key_overlap")(spark, dir).head()
    val (nA, nB, interExact, mN, interM, estU, estI) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3),
        row.getLong(4), row.getLong(5), row.getLong(6))
    // scalar model: recompute the sketches from the raw keys
    def h(x: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(x.toString.getBytes("UTF-8"))
      java.lang.Long.parseLong(md.take(4).map("%02x".format(_)).mkString, 16)
    }
    val aKeys = spark.read.parquet(s"$dir/customer.parquet")
      .select("c_custkey").collect().map(_.getLong(0)).distinct
    val bKeys = spark.read.parquet(s"$dir/orders.parquet")
      .filter(col("o_custkey") % 3 =!= 0)
      .select("o_custkey").collect().map(_.getLong(0)).distinct
    val sa = aKeys.map(h).distinct.sorted.take(256).toSet
    val sb = bKeys.map(h).distinct.sorted.take(256).toSet
    val m = (sa ++ sb).toSeq.sorted.take(256)
    assert(mN === m.length.toLong)
    assert(interM === m.count(v => sa(v) && sb(v)).toLong)
    val expU = if (m.length < 256) m.length.toLong
      else math.floor(255.0 * 4294967296.0 / m.last + 0.5).toLong
    assert(estU === expU)
    assert(estI ===
      math.floor(interM * expU / mN.toDouble + 0.5).toLong)
    assert(nA === aKeys.length.toLong && nB === bKeys.length.toLong)
    assert(interExact === aKeys.toSet.intersect(bKeys.toSet).size.toLong)
  }
}
