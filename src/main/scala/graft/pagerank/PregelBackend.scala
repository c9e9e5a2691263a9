package graft.pagerank

import org.apache.spark.graphx.{Edge, Graph => XGraph, VertexRDD, VertexId}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel
import graft.graph.GraphBuilder.NullVertex

/** GraphX/RDD-iterative alternate backend for [[PageRank]] — the
  * "GraphX Pregel or RDD iterative" approach BASELINE.md names, behind the
  * same [[PageRank.Result]] API as the DataFrame loop.
  *
  * CAVEAT (SURVEY.md §4): GraphX's stock `Pregel`/`staticPageRank` cannot
  * reproduce the reference's semantics — the NULL-sentinel fan-out, init
  * 1.0 with α/N teleport, the PRE-damping ⌊|mass|·1000⌋ convergence
  * counter, and the min-10/tol/cap-50 global stop policy are all outside
  * its vertex-program contract (its convergence is per-vertex message
  * voting, its teleport is α, its init is 1/N-less resetProb algebra). So
  * this backend keeps GraphX for what it is good at — the edge-partitioned
  * `aggregateMessages` contribution shuffle — and drives the reference's
  * exact update rule, Δ counter, and loop policy from the driver, exactly
  * like the DataFrame loop (/root/reference/src/main/scala/pageRank.scala:276-311,360-371).
  *
  * Parity with the DataFrame loop: identical update algebra, identical
  * NULL handling (the sentinel's V-wide fan-out applied analytically as a
  * per-iteration scalar, never materialized as edges), identical policy.
  * The only divergence is float summation ORDER inside each vertex's mass
  * (edge-partition merge vs hash-agg merge) — ≪ 1 ulp per iteration;
  * CorpusGoldenSpec pins agreement to 1e-9, and the q47 gate pins the
  * quantized fixed-10 run to the same DuckDB oracle as the DataFrame q29.
  *
  * Scale notes (100 TB): vertex ids are 64-bit content hashes whose
  * injectivity on the actual vertex set is CHECKED up front (collision →
  * fall back to collision-free `zipWithIndex` + id-table joins), saving a
  * build-time shuffle on the happy path; edge weights 1/outdeg are
  * static, so the per-iteration work is ONE aggregateMessages shuffle
  * plus one scalar aggregate (Δ counter + NULL rank in a single action) —
  * same shuffle count as the DF loop. Each iteration's graph is persisted
  * and the predecessor released once its successor is materialized, so
  * storage stays O(1) in iterations.
  */
object PregelBackend {

  /** Same contract as [[PageRank.run]]; `quantize = Some(s)` snaps each
    * iteration's damped rank to the 1/s grid (`⌊pr·s + 0.5⌋ / s`) — the
    * cross-engine drift guard the q29/q47 oracles rely on. */
  def run(graph0: DataFrame, minIter: Int = 10, tol: Double = 0.2,
      maxIter: Int = 50, alpha: Double = 0.15,
      quantize: Option[Double] = None): PageRank.Result = {
    val spark = graph0.sparkSession
    import spark.implicits._

    val base: RDD[(String, Seq[String])] = graph0.select("title", "links").rdd
      .map(r => (r.getString(0), r.getSeq[String](1)))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // Vertex ids by 64-bit FNV-1a content hash: edges map to (hash(src),
    // hash(dst)) with NO join against an id table — two fewer shuffles at
    // build time than the zipWithIndex path, at any scale. Correctness is
    // not probabilistic: one aggregate verifies the hash is injective on
    // this vertex set (64-bit collisions are ~n²/2⁶⁵, but "unlikely" is
    // not "never"), and a collision falls back to the collision-free
    // zipWithIndex + double-join assignment.
    // ONE pass computes (n, NULL-sentinel present): the sentinel's id is
    // then known analytically on the hash path (fnv of the literal), so
    // no third full-RDD lookup job runs before the loop (it did, for
    // three rounds — setup jobs are pure scheduling overhead on a small
    // graph and an extra full scan on a big one).
    val (n, hasNull) = base.keys.treeAggregate((0L, false))(
      { case ((c, nl), t) => (c + 1, nl || t == NullVertex) },
      { case ((c1, n1), (c2, n2)) => (c1 + c2, n1 || n2) })
    val distinctParts = math.max(1, math.min(
      spark.sparkContext.defaultParallelism, (n / 20000L).toInt + 1))
    val hashedDistinct = base.keys.map(PregelBackend.fnv1a64)
      .distinct(distinctParts).count()
    val ids: RDD[(String, VertexId)] =
      (if (hashedDistinct == n) base.keys.map(t => (t, PregelBackend.fnv1a64(t)))
       else base.keys.zipWithIndex())
        .persist(StorageLevel.MEMORY_AND_DISK)
    val nullId: Option[VertexId] =
      if (!hasNull) None
      else if (hashedDistinct == n) Some(PregelBackend.fnv1a64(NullVertex))
      else ids.filter(_._1 == NullVertex).values.collect().headOption

    // Static out-edges with weight 1/outdeg. NULL's out-edges are NOT
    // materialized (its V-wide adjacency is the hot-key scale hazard the
    // DF loop also avoids); its fan-out is injected analytically below.
    // EVERY tier resolves the dst against the vertex set — an edge to a
    // title that is not a vertex is DROPPED, never a phantom vertex (the
    // DF loop has the same semantics, and an unresolved dst hash could
    // otherwise collide into a real vertex undetected). Tier selection is
    // the usual broadcast-vs-shuffle trade:
    //  1. hash injective, vertex set broadcastable → exact title-set
    //     membership filter in the flatMap, ZERO edge-build shuffles;
    //  2. hash injective, too large to broadcast → one dst-resolving join
    //     (the src is a vertex by construction, its id computed in place);
    //  3. hash collision (checked, ~never) → zipWithIndex ids, two joins.
    val edgesByDst = base
      .filter { case (t, links) => t != NullVertex && links.nonEmpty }
    val BroadcastTitleCap = 1000000L
    val edges: RDD[Edge[Double]] =
      if (hashedDistinct == n && n <= BroadcastTitleCap) {
        val titleSet = spark.sparkContext.broadcast(base.keys.collect().toSet)
        edgesByDst.flatMap { case (src, links) =>
          val srcId = PregelBackend.fnv1a64(src)
          val w = 1.0 / links.size
          links.collect { case dst if titleSet.value.contains(dst) =>
            Edge(srcId, PregelBackend.fnv1a64(dst), w)
          }
        }
      } else if (hashedDistinct == n)
        edgesByDst
          .flatMap { case (src, links) =>
            val srcId = PregelBackend.fnv1a64(src)
            val w = 1.0 / links.size
            links.map(dst => (dst, (srcId, w)))
          }
          .join(ids) // dst title -> dst id; drops links to non-vertices
          .map { case (_, ((srcId, w), dstId)) => Edge(srcId, dstId, w) }
      else
        edgesByDst
          .flatMap { case (src, links) => links.map(dst => (dst, (src, 1.0 / links.size))) }
          .join(ids) // dst title -> dst id
          .map { case (_, ((src, w), dstId)) => (src, (dstId, w)) }
          .join(ids) // src title -> src id
          .map { case (_, ((dstId, w), srcId)) => Edge(srcId, dstId, w) }

    // Partition count proportional to graph size (~20k vertices per
    // partition), capped at the cluster's parallelism: a web-scale graph
    // fans out to every core, while a small graph doesn't pay 32-task
    // scheduling × 2 stages × maxIter iterations of fixed overhead — on
    // the sf0.1 bench graph (~1k vertices) that overhead, not compute,
    // was 4× the DataFrame loop's whole runtime.
    val parts = distinctParts

    var g: XGraph[Double, Double] =
      XGraph(ids.map { case (_, id) => (id, 1.0) }.coalesce(parts),
        edges.coalesce(parts), defaultVertexAttr = 1.0,
        edgeStorageLevel = StorageLevel.MEMORY_AND_DISK,
        vertexStorageLevel = StorageLevel.MEMORY_AND_DISK)

    val nullIdVal = nullId.getOrElse(-1L)
    val damp = (m: Double) => {
      val pr = alpha / n + (1 - alpha) * m
      quantize.fold(pr)(s => math.floor(pr * s + 0.5) / s)
    }
    var i = 0
    var avg = Double.MaxValue
    var continue = true
    // pr(NULL)/V as a driver scalar — the analytic stand-in for NULL's
    // V-element adjacency (V = n − 1 pages), exactly like the DF loop.
    // Tracked incrementally from each iteration's counter aggregate (NULL's
    // next rank is damp(its mass)) so no per-iteration lookup job is needed.
    var nullPr = if (nullId.isDefined) 1.0 else 0.0
    var prevMass: VertexRDD[Double] = null
    var prevG: XGraph[Double, Double] = null
    while (continue) {
      i += 1
      val nullContrib = if (nullId.isDefined && n > 1) nullPr / (n - 1) else 0.0
      val msgs = g.aggregateMessages[Double](
        ctx => ctx.sendToDst(ctx.srcAttr * ctx.attr), _ + _)
      val mass: VertexRDD[Double] = g.vertices.leftJoin(msgs) { (id, _, m) =>
        m.getOrElse(0.0) + (if (id == nullIdVal) 0.0 else nullContrib)
      }.persist(StorageLevel.MEMORY_AND_DISK)
      // ONE aggregate per iteration: (Σ⌊|mass|·1000⌋, mass(NULL)) — the
      // reference's pre-damping counter (prev implicitly 0) plus the NULL
      // rank feed for the next iteration. This action materializes `mass`
      // AND the current graph's replicated edge view (aggregateMessages
      // runs over it), so both are solid before the predecessor is dropped.
      val (counter, massNull) = mass.aggregate((0L, 0.0))(
        { case ((c, mn), (id, m)) =>
          (c + math.floor(math.abs(m) * 1000).toLong, if (id == nullIdVal) m else mn) },
        { case ((c1, m1), (c2, m2)) => (c1 + c2, m1 + m2) })
      avg = counter.toDouble / n / 1000.0
      nullPr = if (nullId.isDefined) damp(massNull) else 0.0
      // The predecessor graph can go ONLY NOW: outerJoinVertices rebuilds
      // the replicated edge view each iteration (new vertex attrs shipped
      // to edge partitions), so g_i's edges chain onto g_{i−1}'s — an
      // unpersisted chain recomputes the whole history on every action,
      // doubling per-iteration cost (the classic GraphX iteration trap;
      // GraphX's own Pregel persists the full graph and defers the
      // predecessor's unpersist exactly like this).
      // blocking releases: a non-blocking unpersist whose handle is then
      // dropped races the ContextCleaner's GC-triggered duplicate
      // RemoveRdd ("Asked to remove block" warns — see Scoped.free)
      if (prevG != null) { prevG.unpersistVertices(true); prevG.edges.unpersist(true) }
      if (prevMass != null) prevMass.unpersist(blocking = true)
      val ng = g.outerJoinVertices(mass.mapValues(damp))((_, old, opt) => opt.getOrElse(old))
      ng.persist(StorageLevel.MEMORY_AND_DISK)
      ng.vertices.foreachPartition(_ => ()) // edges materialize in the next counter job
      prevMass = mass
      prevG = g
      g = ng
      continue = i < maxIter && (i < minIter || avg > tol)
    }

    // Materialize the result as a checkpoint-backed DF so every GraphX
    // intermediate can be released NOW and Result.release()/Scoped free
    // the output exactly like the DataFrame loop's contract.
    val out = ids.map(_.swap).join(g.vertices) // id -> (title, pr)
      .values.toDF("title", "pr")
      .join(base.toDF("title", "links"), Seq("title"))
      .select($"title", $"links", $"pr")
      .localCheckpoint()
    if (prevMass != null) prevMass.unpersist(blocking = true)
    if (prevG != null) { prevG.unpersistVertices(true); prevG.edges.unpersist(true) }
    g.unpersist(blocking = true)
    ids.unpersist(blocking = true)
    base.unpersist(blocking = true)
    PageRank.Result(out, i, avg)
  }

  /** 64-bit FNV-1a over the title's UTF-8 bytes — deterministic across
    * driver and executors, no dependency. Injectivity on the actual
    * vertex set is CHECKED before use (see [[run]]); this is a fast id
    * assignment, not a probabilistic assumption. */
  private[pagerank] def fnv1a64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < bytes.length) {
      h ^= bytes(i) & 0xffL
      h *= 0x100000001b3L
      i += 1
    }
    h
  }
}
