package graft

import org.apache.spark.sql.functions._
import graft.core.{Bloom, ZOrder}
import graft.maintenance.Upsert

/** Specs for the layout/maintenance primitives behind q85–q92:
  * z-order interleaving (bit-exactness + the 2-D skipping property the
  * layout exists for), the Bloom runtime filter (no false negatives,
  * bounded false-positive rate), and the CDC upsert (replace/insert/keep
  * paths, broadcast shape).
  */
class LayoutToolsSpec extends SparkSpec {

  import spark.implicits._

  /** Scalar model of the Morton interleave for the oracle-side check. */
  private def zRef(x: Long, y: Long): Long = {
    var z = 0L
    for (i <- 0 until 16) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
    }
    z
  }

  test("zvalue16 matches the bit-by-bit scalar model, including edges") {
    val pts = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (65535L, 0L), (0L, 65535L), (12345L, 54321L), (40000L, 7L),
      (70000L, 3L)) // >16-bit input must be masked to its low 16 bits
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.zvalue16(col("x"), col("y")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (x, y, z) =>
      assert(z === zRef(x & 0xFFFFL, y & 0xFFFFL), s"($x,$y)")
    }
  }

  test("sqlZvalue16 agrees with the Column form when run through Spark SQL") {
    val df = (0 until 500).map(i => (i.toLong * 131L % 65536L,
      i.toLong * 37L % 65536L)).toDF("x", "y")
    df.createOrReplaceTempView("zin")
    val viaSql = spark.sql(
      s"SELECT x, y, ${ZOrder.sqlZvalue16("x", "y")} AS z FROM zin")
      .orderBy("x", "y").collect().map(_.getLong(2))
    val viaCol = df.select(col("x"), col("y"),
      ZOrder.zvalue16(col("x"), col("y")).as("z"))
      .orderBy("x", "y").collect().map(_.getLong(2))
    assert(viaSql.toSeq === viaCol.toSeq)
  }

  test("z-bucketed layout bounds BOTH dimensions (the skipping property)") {
    // 4096 points on a 64x64 grid, scaled to 16-bit range. Sorting by x
    // alone leaves each x-slice spanning the full y range; z-bucketing
    // must bound y too (max side length of a z >> 6 bucket's rectangle
    // on this grid is 2^3 cells per dim by construction of the curve).
    val pts = for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y)
    val buckets = pts.toDF("x", "y")
      .withColumn("z", ZOrder.zvalue16(col("x"), col("y")))
      .groupBy((col("z") / 64).cast("long").as("b"))
      .agg(max(col("x")) - min(col("x")) as "dx",
        max(col("y")) - min(col("y")) as "dy",
        count(lit(1)).as("n"))
      .collect()
    assert(buckets.length === 64 && buckets.forall(_.getLong(3) == 64L))
    assert(buckets.forall(r => r.getLong(1) <= 7L && r.getLong(2) <= 7L))
  }

  test("bloom filter: every build key passes; FP rate stays near nominal") {
    val keys = (0L until 5000L).map(_ * 3L)
    val bloom = Bloom.build(keys.toDF("k"), col("k"))
    val member = keys.toDF("k").filter(bloom.mightContain(col("k"))).count()
    assert(member === 5000L, "a Bloom filter must never drop a member")
    val nonMembers = (0L until 20000L).map(_ * 3L + 1L)
    val fp = nonMembers.toDF("k").filter(bloom.mightContain(col("k"))).count()
    // m=2^17, n=5k, k=3 → theoretical FP ≈ 0.12%; allow generous slack
    assert(fp < 200L, s"false-positive count $fp out of 20000 is too high")
  }

  test("bloom build rejects a bit count that is not a multiple of 64") {
    intercept[IllegalArgumentException] {
      Bloom.build(Seq(1L).toDF("k"), col("k"), numBits = 100)
    }
  }

  test("upsert: replaces matched keys, appends new ones, keeps the rest") {
    val target = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "name", "v")
    val batch = Seq((2L, "b2", 99.0), (9L, "z", 1.0)).toDF("k", "name", "v")
    val out = Upsert(target, batch, Seq("k")).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(out.toSeq === Seq((1L, "a", 10.0), (2L, "b2", 99.0),
      (3L, "c", 30.0), (9L, "z", 1.0)))
  }

  test("scd2: intervals partition the version line; exactly one current per key") {
    val rnd = new scala.util.Random(42)
    val snaps = (0 until 200).flatMap { k =>
      val versions = (1 to 1 + rnd.nextInt(5)).scanLeft(0L)(
        (acc, _) => acc + 1 + rnd.nextInt(9)).tail
      versions.map(v => (k.toLong, v, s"payload-$k-$v"))
    }
    val h = graft.maintenance.Scd2.historize(
      snaps.toDF("k", "version", "payload"), Seq("k"), col("version"))
      .collect().map(r => (r.getLong(0), r.getLong(3),
        Option(r.get(4)).map(_.asInstanceOf[Long]), r.getBoolean(5)))
      .groupBy(_._1)
    h.foreach { case (k, rows) =>
      val sorted = rows.sortBy(_._2)
      // chained: each interval's valid_to is the next interval's valid_from
      sorted.sliding(2).foreach {
        case Array((_, _, Some(to), _), (_, from, _, _)) =>
          assert(to === from, s"key $k: gap or overlap at $to vs $from")
        case _ =>
      }
      assert(sorted.count(_._4) === 1, s"key $k: exactly one current row")
      assert(sorted.last._4 && sorted.last._3.isEmpty,
        s"key $k: the latest version must be the open-ended current row")
    }
  }

  test("chunking invariant (q98 formula): chunks cover all tokens with 32 overlap") {
    // scalar model of q98's closed-form chunk count and slicing:
    // nc = 1 + ceil(max(n-128, 0)/96), chunk i covers [i·96+1, min(i·96+128, n)]
    for (n <- Seq(1, 50, 127, 128, 129, 223, 224, 225, 320, 321, 500, 5000)) {
      val nc = 1 + (math.max(n - 128, 0) + 95) / 96
      val spans = (0 until nc).map(i => (i * 96 + 1, math.min(i * 96 + 128, n)))
      assert(spans.head._1 === 1 && spans.last._2 === n, s"n=$n: bounds")
      assert(spans.forall { case (a, b) => a <= b }, s"n=$n: empty chunk emitted")
      spans.sliding(2).foreach {
        case Seq((_, e1), (s2, e2)) =>
          assert(s2 <= e1 + 1, s"n=$n: gap between chunks")
          if (e2 - s2 + 1 == 128) // unclipped successor ⇒ exact 32 overlap
            assert(e1 - s2 + 1 === 32, s"n=$n: overlap ${e1 - s2 + 1}")
        case _ =>
      }
    }
  }

  test("upsert matches NULL keys null-safely (replaces, never accumulates)") {
    val target = Seq((Option(1L), "a", 1.0), (Option.empty[Long], "n1", 2.0))
      .toDF("k", "name", "v")
    val batch = Seq((Option.empty[Long], "n2", 3.0)).toDF("k", "name", "v")
    val out = Upsert(target, batch, Seq("k")).orderBy(asc_nulls_first("k"))
      .collect().map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)),
        r.getString(1)))
    assert(out.toSeq === Seq((None, "n2"), (Some(1L), "a")),
      "the NULL-key row must be replaced, not duplicated")
  }

  test("upsert with broadcastKeys plans a broadcast anti join (no target shuffle)") {
    val target = spark.range(1000).select(col("id").as("k"),
      (col("id") * 2).as("v"))
    val batch = Seq((5L, 0L), (2000L, 1L)).toDF("k", "v")
    val plan = Upsert(target, batch, Seq("k"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"expected broadcast anti join, got:\n$plan")
  }
}
