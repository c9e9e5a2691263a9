package graft

import org.apache.spark.sql.functions.col

/** Pins q172 (bounded-state histogram quartiles) against q148 (exact
  * percentile, the oracle-parity A/B control) on the planted-outlier
  * fixture: the sketch's quartiles must sit within ONE BIN of the exact
  * ones, and the planted outlier counts must be IDENTICAL — the ×1000 /
  * ×100 / ±5.00 plants sit so far outside the fences that a one-bin
  * fence wobble cannot reclassify them. This is the r13 verdict's done
  * criterion for wiring the catalog's last unbounded-state aggregate to
  * a mergeable fixed-bin path (the q34→q126 precedent).
  */
class OutlierFenceSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q172 quartiles sit within one bin of q148's exact ones; planted outlier counts identical") {
    val exact = SparkEntry.queries("q148_robust_outliers")(spark, dir)
      .collect().map(r => r.getAs[String]("column_name") -> r).toMap
    val hist = SparkEntry.queries("q172_outlier_fences_hist")(spark, dir)
      .collect().map(r => r.getAs[String]("column_name") -> r).toMap
    assert(exact.keySet === hist.keySet)
    val expectedW = Map("l_quantity" -> 100L, "l_extendedprice" -> 100000L,
      "l_discount" -> 1L, "l_tax" -> 1L)
    hist.foreach { case (cn, h) =>
      val e = exact(cn)
      val w = h.getAs[Long]("bin_w")
      assert(w === expectedW(cn), s"$cn bin width")
      Seq("q1_cents", "median_cents", "q3_cents").foreach { q =>
        val hq = h.getAs[Long](q).toDouble
        val eq = e.getAs[Double](q)
        assert(math.abs(hq - eq) <= w.toDouble,
          s"$cn $q: hist=$hq exact=$eq bin_w=$w")
      }
      assert(h.getAs[Long]("n_rows") === e.getAs[Long]("n_rows"), s"$cn n_rows")
      assert(h.getAs[Long]("n_below") === e.getAs[Long]("n_below"), s"$cn n_below")
      assert(h.getAs[Long]("n_above") === e.getAs[Long]("n_above"), s"$cn n_above")
    }
  }

  test("width A/B (r14 #7): one-bin agreement holds at a 10x-narrower price width too") {
    // The operator's one tunable is bin width: narrower bins cost ~10x
    // the histogram state but tighten the quartile bound to ONE narrower
    // bin. Both claims must hold ON DATA, not by narrative — this is the
    // fixture-side pin behind SCALING.md's sf1 width-curve row.
    import graft.queries.Relational
    val exact = SparkEntry.queries("q148_robust_outliers")(spark, dir)
      .collect().map(r => r.getAs[String]("column_name") -> r).toMap
    val narrowW = Relational.FenceBinWidths.updated("l_extendedprice", 10000L)
    val hist = Relational.outlierFencesHist(spark, dir, narrowW)
      .collect().map(r => r.getAs[String]("column_name") -> r).toMap
    val h = hist("l_extendedprice")
    assert(h.getAs[Long]("bin_w") === 10000L)
    Seq("q1_cents", "median_cents", "q3_cents").foreach { q =>
      val hq = h.getAs[Long](q).toDouble
      val eq = exact("l_extendedprice").getAs[Double](q)
      assert(math.abs(hq - eq) <= 10000.0,
        s"l_extendedprice $q at w=10000: hist=$hq exact=$eq")
    }
    // plants sit far outside any one-bin wobble: counts identical at
    // BOTH widths
    assert(h.getAs[Long]("n_below") ===
      exact("l_extendedprice").getAs[Long]("n_below"))
    assert(h.getAs[Long]("n_above") ===
      exact("l_extendedprice").getAs[Long]("n_above"))
  }

  test("q177 repairs exactly what q172 detects: clip counts == fence counts, mass moves the right way") {
    val fences = SparkEntry.queries("q172_outlier_fences_hist")(spark, dir)
      .collect().map(r => r.getAs[String]("column_name") -> r).toMap
    val win = SparkEntry.queries("q177_winsorize_report")(spark, dir)
      .collect().map(r => r.getAs[String]("column_name") -> r).toMap
    assert(win.keySet === fences.keySet)
    win.foreach { case (cn, w) =>
      val f = fences(cn)
      // same fences (x2 form), so the repair clips exactly the detected set
      assert(w.getAs[Long]("lo_fence_x2") === f.getAs[Long]("q1_cents") * 2
        - (f.getAs[Long]("q3_cents") - f.getAs[Long]("q1_cents")) * 3, s"$cn lo")
      assert(w.getAs[Long]("hi_fence_x2") === f.getAs[Long]("q3_cents") * 2
        + (f.getAs[Long]("q3_cents") - f.getAs[Long]("q1_cents")) * 3, s"$cn hi")
      assert(w.getAs[Long]("n_clip_low") === f.getAs[Long]("n_below"), s"$cn low")
      assert(w.getAs[Long]("n_clip_high") === f.getAs[Long]("n_above"), s"$cn high")
      assert(w.getAs[Long]("n_rows") === f.getAs[Long]("n_rows"), s"$cn rows")
      // clamping can only pull mass TOWARD the fences: the sum moves down
      // when the clips are high-side, up when low-side, not at all when
      // nothing clipped
      // sums ship as overflow-checked BIGINT (the r16 gate-stability
      // contract, NoDecimalOutputSpec); the algebra below is unchanged
      val before = BigDecimal(w.getAs[Long]("sum_before_x2"))
      val after = BigDecimal(w.getAs[Long]("sum_after_x2"))
      val (lo, hi) = (w.getAs[Long]("n_clip_low"), w.getAs[Long]("n_clip_high"))
      if (lo == 0L && hi == 0L) assert(before === after, s"$cn untouched")
      if (lo == 0L && hi > 0L) assert(after < before, s"$cn high clips shrink the sum")
      if (hi == 0L && lo > 0L) assert(after > before, s"$cn low clips grow the sum")
      // and the clamp is idempotent by construction: every surviving value
      // lies inside [lo, hi], so the after-sum is bounded by the fences
      assert(after <= BigDecimal(w.getAs[Long]("hi_fence_x2")) * w.getAs[Long]("n_rows"),
        s"$cn after-sum exceeds an all-at-hi-fence corpus")
      assert(after >= BigDecimal(w.getAs[Long]("lo_fence_x2")) * w.getAs[Long]("n_rows"),
        s"$cn after-sum under an all-at-lo-fence corpus")
    }
  }

  test("decimalToLongChecked: exact through the int64 boundary, loud past it") {
    import spark.implicits._
    val ok = Seq("9223372036854775807", "-9223372036854775808", "0", "-42")
      .toDF("s")
      .select(graft.queries.Relational
        .decimalToLongChecked(col("s").cast("decimal(38,0)")).as("v"))
      .collect().map(_.getLong(0))
    assert(ok.toSeq === Seq(Long.MaxValue, Long.MinValue, 0L, -42L))
    // one past int64: the downcast must FAIL the job, never wrap — the
    // 100 TB contract is re-grid the units, not silently corrupt sums
    val boom = intercept[Exception] {
      Seq("9223372036854775808").toDF("s")
        .select(graft.queries.Relational
          .decimalToLongChecked(col("s").cast("decimal(38,0)")).as("v"))
        .collect()
    }
    assert(boom.toString.nonEmpty)
  }
}
