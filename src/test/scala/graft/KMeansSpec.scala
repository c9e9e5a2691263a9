package graft

import org.apache.spark.sql.functions._
import graft.similarity.KMeans

/** The distributed Lloyd loop must agree exactly with a scalar integer
  * model (same grid, same floor-mean update, same first-min tie-break),
  * including the empty-cluster carry-over. */
class KMeansSpec extends SparkSpec {

  private def scalarFit(vs: Array[Array[Long]], k: Int, iters: Int): Array[Array[Long]] = {
    var cents = (0 until k).map(i => vs(i).clone()).toArray
    for (_ <- 1 to iters) {
      val asg = vs.map { v =>
        val ds = cents.map(c => c.zip(v).map { case (a, b) => (b - a) * (b - a) }.sum)
        ds.indexOf(ds.min)
      }
      val next = cents.map(_.clone())
      for (c <- 0 until k) {
        val member = vs.indices.filter(asg(_) == c)
        if (member.nonEmpty)
          for (d <- cents(c).indices)
            next(c)(d) = math.floor(member.map(vs(_)(d)).sum.toDouble / member.size).toLong
      }
      cents = next
    }
    cents
  }

  private def df(vs: Array[Array[Long]]) = {
    import spark.implicits._
    vs.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }
      .toSeq.toDF("vec_id", "eq")
  }

  test("fit matches the scalar model on fixture embeddings (k=4, 3 rounds)") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), KMeans.quantCol(col("embedding")).as("eq"))
      .orderBy(col("vec_id"))
    val vs = e.collect().map(_.getSeq[Long](1).toArray)
    val got = KMeans.fit(e, k = 4, iters = 3)
    val exp = scalarFit(vs, k = 4, iters = 3)
    assert(got.map(_.toSeq).toSeq === exp.map(_.toSeq).toSeq)
  }

  test("equidistant point assigns to the smaller cluster id") {
    val d = df(Array(Array(0L, 0L), Array(4L, 0L), Array(2L, 0L)))
    val asg = KMeans.assign(d, Array(Array(0L, 0L), Array(4L, 0L)))
      .select("vec_id", "cluster", "dist").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(asg(2L) === ((0L, 4L))) // dist 4 to both → cluster 0
    assert(asg(0L) === ((0L, 0L)))
    assert(asg(1L) === ((1L, 0L)))
  }

  test("PQ: nearestCol matches assign; ADC table lookup matches the scalar model") {
    val M = 4; val sub = 16
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), KMeans.quantCol(col("embedding")).as("eq"))
      .orderBy(col("vec_id"))
    val vs = e.collect().map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
    def sl(m: Int) = e.select(col("vec_id"),
      expr(s"slice(eq, ${m * sub + 1}, $sub)").as("eq"))
    val cbs = Array.tabulate(M)(m => KMeans.fit(sl(m), k = 4, iters = 2))
    for (m <- 0 until M) {
      val a = KMeans.assign(sl(m), cbs(m)).select("vec_id", "cluster").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val n = sl(m).select(col("vec_id"), KMeans.nearestCol(col("eq"), cbs(m)).as("c"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(a === n, s"subspace $m")
    }
    def sq(a: Array[Long], b: Array[Long]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val probe = vs.find(_._1 == 0L).get._2
    val dtabs = Array.tabulate(M)(m =>
      cbs(m).map(c => sq(probe.slice(m * sub, m * sub + sub), c)))
    val exp = vs.map { case (id, v) =>
      id -> (0 until M).map { m =>
        val ds = cbs(m).map(c => sq(v.slice(m * sub, m * sub + sub), c))
        dtabs(m)(ds.indexOf(ds.min))
      }.sum
    }.toMap
    val got = e.select(col("vec_id"),
      (0 until M).map(m => element_at(array(dtabs(m).map(lit(_)): _*),
        (KMeans.nearestCol(expr(s"slice(eq, ${m * sub + 1}, $sub)"), cbs(m)) + 1)
          .cast("int"))).reduce(_ + _).as("d"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === exp)
  }

  test("a cluster that loses all members keeps its previous centroid") {
    // identical seeds: round 1 ties every point into cluster 0, so
    // cluster 1 is EMPTY and must carry its seed centroid forward
    // (round 1: c0 = floor(5/3) = 1, c1 stays [0]; round 2: ids 0,1
    // defect to the revived c1, id 2 stays → c0 = [5], c1 = [0])
    val vs = Array(Array(0L), Array(0L), Array(5L))
    val got = KMeans.fit(df(vs), k = 2, iters = 2)
    val exp = scalarFit(vs, k = 2, iters = 2)
    assert(got.map(_.toSeq).toSeq === exp.map(_.toSeq).toSeq)
    assert(got(0).toSeq === Seq(5L) && got(1).toSeq === Seq(0L))
  }

  test("quantCol is floor(x*4096 + 0.5) per element") {
    import spark.implicits._
    val d = Seq((1L, Seq(0.25f, -0.3f, 0.0f))).toDF("vec_id", "embedding")
    val q = d.select(KMeans.quantCol(col("embedding")).as("eq"))
      .head().getSeq[Long](0)
    assert(q === Seq(1024L, math.floor(-0.3f.toDouble * 4096 + 0.5).toLong, 0L))
  }
}
