package graft

import org.apache.spark.sql.functions._

/** Accuracy pin for q212's ANF/HyperBall neighborhood function: the
  * driver gate pins cross-engine REGISTER PARITY; this spec pins that
  * the estimates actually track ground truth, against a driver-side
  * exact BFS over the same edge definition at sf0.001 (the exact path
  * is |V|² and must never ride the query itself — see q212's header).
  */
class AnfSpec extends SparkSpec {

  test("q212 estimates track exact reachability at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val est = SparkEntry.queries("q212_anf_hyperball")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val edges = spark.read.parquet(s"$dir/lineitem.parquet")
      .select((col("l_orderkey") % 997).as("src"),
        (col("l_partkey") % 997).as("dst"))
      .filter(col("src") =!= col("dst")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val verts = (edges.map(_._1) ++ edges.map(_._2)).toSet
    var reach: Map[Long, Set[Long]] = verts.iterator.map(v => v -> Set(v)).toMap
    val exact = scala.collection.mutable.Map(0L -> verts.size.toLong)
    for (t <- 1 to 3) {
      reach = reach.map { case (v, ball) =>
        v -> (ball ++ adj.getOrElse(v, Set.empty).iterator
          .flatMap(w => reach(w)))
      }
      exact(t.toLong) = reach.valuesIterator.map(_.size.toLong).sum
    }
    // t = 0: every ball is a singleton; linear counting is exact there
    assert(est(0L) === exact(0L),
      s"hop 0 must be exact: est ${est(0L)} vs ${exact(0L)}")
    for (t <- 1L to 3L) {
      val e = est(t).toDouble / exact(t).toDouble - 1.0
      assert(math.abs(e) <= 0.25,
        s"hop $t: est ${est(t)} vs exact ${exact(t)} (err ${e * 100}%%) " +
          "outside the m=64 tolerance")
    }
  }
}
