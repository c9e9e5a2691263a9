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

  test("q123 report is consistent with its standalone consumers (q104 splits, q79 survivors)") {
    val rep = SparkEntry.queries("q123_dedup_pipeline")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))) // split, n_docs, n_clusters, n_dropped, kept, dropped
    // per-split doc counts equal q104's split × lang rollup
    val q104 = SparkEntry.queries("q104_split_leakage")(spark, dir).collect()
    val q104Docs = q104.groupBy(_.getString(0))
      .map { case (s, rows) => s -> rows.map(_.getLong(2)).sum }
    assert(rep.map(t => t._1 -> t._2).toMap === q104Docs,
      "q123 per-split doc counts must equal q104's rollup")
    // every cluster keeps exactly one survivor, so total drops equal
    // q79's multi-doc cluster members minus their survivors
    val q79 = SparkEntry.queries("q79_dedup_survivors")(spark, dir).collect()
    val multiDropped = q79.map(r => r.getLong(3) - 1).sum // n_members - survivor
    assert(rep.map(_._4).sum === multiDropped,
      "q123 dropped docs must equal q79's non-survivor members")
    // chars bookkeeping: kept + dropped = the whole corpus' chars
    val totalChars = spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("cast(sum(n_chars) as long)").head().getLong(0)
    assert(rep.map(t => t._5 + t._6).sum === totalChars,
      "kept + dropped chars must cover the corpus")
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
