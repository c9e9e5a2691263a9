package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorMean

/** The typed Aggregator centroid must agree with independent per-dim means
  * and be partial-aggregation-shaped (associative merge). */
class VectorMeanSpec extends SparkSpec {

  test("VectorMean == per-dimension mean on fixture embeddings") {
    import spark.implicits._
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val ds = e.select(col("label"), col("embedding")).as[(Int, Array[Float])]
    val agg = new VectorMean(64).toColumn
    val centroids = ds.groupByKey(_._1).mapValues(_._2).agg(agg)
      .collect().toMap
    // independent recomputation per label on the driver
    val rows = ds.collect()
    rows.groupBy(_._1).foreach { case (label, vs) =>
      val exp = (0 until 64).map(d => vs.map(_._2(d).toDouble).sum / vs.length)
      val got = centroids(label)
      (0 until 64).foreach { d =>
        assert(math.abs(got(d) - exp(d)) < 1e-9, s"label=$label dim=$d")
      }
    }
  }

  test("empty group yields the zero vector") {
    val vm = new VectorMean(4)
    assert(vm.finish(vm.zero).toSeq === Seq(0.0, 0.0, 0.0, 0.0))
  }

  test("merge is associative and order-insensitive in result") {
    val vm = new VectorMean(2)
    val vs = Seq(Array(1f, 2f), Array(3f, 4f), Array(5f, 6f))
    val all = vs.foldLeft(vm.zero)(vm.reduce)
    val split = vm.merge(
      vs.take(1).foldLeft(vm.zero)(vm.reduce),
      vs.drop(1).foldLeft(vm.zero)(vm.reduce))
    assert(vm.finish(all).toSeq === vm.finish(split).toSeq)
  }
}
