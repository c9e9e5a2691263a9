package graft

import graft.queries.DedupSim

/** Contracts of the corpus-curation composites: the leakage-safe split
  * (q104) must move whole near-dup clusters atomically and partition the
  * corpus, and must be deterministic across invocations (hash-derived, no
  * seed state). */
class CurationSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("no near-dup cluster straddles a split, and splits partition the corpus") {
    val rows = DedupSim.splitAssignment(spark, dir)
      .select("doc_id", "cluster_id", "split").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val total = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(rows.length.toLong === total, "every document gets exactly one split row")
    assert(rows.map(_._1).distinct.length === rows.length, "doc_id unique")
    rows.groupBy(_._2).foreach { case (cluster, members) =>
      assert(members.map(_._3).distinct.length === 1,
        s"cluster $cluster spans splits ${members.map(_._3).distinct.toSeq}")
    }
    val bySplit = rows.groupBy(_._3).view.mapValues(_.length).toMap
    assert(bySplit.keySet.subsetOf(Set("train", "val", "test")))
    assert(bySplit.getOrElse("train", 0) > bySplit.getOrElse("val", 0),
      "80/10/10 grid: train strictly dominates at fixture size")
  }

  test("split assignment is re-run-stable (pure function of content hashes)") {
    def snap() = DedupSim.splitAssignment(spark, dir)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(snap() === snap())
  }

  test("precomputed cluster labels compose: identical split, no pipeline recompute") {
    // a pipeline that already ran q49 hands its materialized (v, comp)
    // labels to splitAssignment and must get the exact same split as the
    // self-contained path — the VERDICT r6 #5 reuse contract
    val labels = graft.graph.ConnectedComponents.assign(
      DedupSim.simhashPairsForTest(spark, dir)) // checkpoint-backed; we own its release
    val viaLabels = DedupSim.splitAssignment(spark, dir, Some(labels))
      .select("doc_id", "cluster_id", "split").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sortBy(_._1)
    graft.core.Scoped.free(labels)
    val selfContained = DedupSim.splitAssignment(spark, dir)
      .select("doc_id", "cluster_id", "split").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sortBy(_._1)
    assert(viaLabels === selfContained)
  }
}
