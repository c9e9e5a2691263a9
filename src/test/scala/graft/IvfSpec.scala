package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.similarity.Ivf

/** IVF ANN: recall against brute force, monotonicity in nprobe, and
  * partition pruning of the persisted index. */
class IvfSpec extends SparkSpec {

  lazy val emb = spark.read
    .parquet("/root/testdata/sf0.01/embeddings.parquet").cache()

  lazy val qvec: Seq[Float] = emb.filter(col("vec_id") === 0)
    .select("embedding").head().getSeq[Float](0)

  def recallAtK(nprobe: Int, k: Int = 10): Double = {
    val index = Ivf.buildIndex(emb.filter(col("vec_id") =!= 0))
    val got = Ivf.query(spark, index, qvec, k, nprobe = nprobe)
      .collect().map(_.getLong(0)).toSet
    val truth = Ivf.bruteForce(spark, emb.filter(col("vec_id") =!= 0), qvec, k)
      .collect().map(_.getLong(0)).toSet
    (got & truth).size.toDouble / truth.size
  }

  test("full probe (all 256 cells) == brute force exactly") {
    assert(recallAtK(nprobe = 256) === 1.0)
  }

  test("recall grows with nprobe and is nontrivial at nprobe=8") {
    val r8 = recallAtK(8)
    val r64 = recallAtK(64)
    assert(r64 >= r8, s"recall must be monotone: r8=$r8 r64=$r64")
    assert(r8 > 0.0, "nprobe=8 should find at least some true neighbors")
    assert(r64 >= 0.5, s"nprobe=64 (1/4 of cells) recall too low: $r64")
  }

  test("partitioned index: probes are partition-pruned scans") {
    val dir = Files.createTempDirectory("ivf").toString
    Ivf.buildPartitioned(emb.filter(col("vec_id") =!= 0), s"$dir/idx")
    val index = spark.read.parquet(s"$dir/idx")
    val probed = Ivf.query(spark, index, qvec, 10, nprobe = 4)
    val plan = probed.queryExecution.executedPlan.toString
    val pf = plan.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(pf.contains("cell"), s"expected cell in PartitionFilters: $pf")
    // and pruned results equal in-memory-index results
    val a = probed.collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    val b = Ivf.query(spark, Ivf.buildIndex(emb.filter(col("vec_id") =!= 0)),
      qvec, 10, nprobe = 4).collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(a === b)
  }
}
