package graft

/** q173 = the batched serving form of q113 (VERDICT r14 #1). Pins the
  * done-criterion: each query_id's slice of the batch result is exactly
  * the single-probe [[graft.queries.CorpusSearch.hybridRrf]] run for the
  * same (term, vec_id) — same rows, same ranks, same fused scores, same
  * order — at N = 3 probes. The plan-side contract (WindowGroupLimit,
  * partitioned by query_id) is pinned in PlanSpec. */
class HybridBatchSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  test("q173 per-query slices equal N single-probe q113 runs (N = 3)") {
    val probes = graft.queries.CorpusSearch.defaultProbeBatch
    assert(probes.size >= 3, "done-criterion requires N >= 3 probes")
    assert(probes.map(_._1).distinct.size == probes.size, "query_ids unique")
    val batch = graft.queries.CorpusSearch.hybridRrfBatch(spark, dir)
      .collect()
      .groupBy(_.getLong(0))
    assert(batch.keySet == probes.map(_._1).toSet,
      s"every probe must produce a slice: got ${batch.keySet}")
    probes.foreach { case (qid, term, vecId) =>
      val single = graft.queries.CorpusSearch
        .hybridRrf(spark, dir, term = term, vecId = vecId)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSeq
      val slice = batch(qid)
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
        .toSeq
      assert(slice == single, s"slice mismatch for probe ($qid, $term, $vecId)")
      assert(slice.size == 20, s"per-query top-20 expected, got ${slice.size}")
    }
  }
}
