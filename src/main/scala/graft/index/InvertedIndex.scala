package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.corpus.WikiCorpus

/** Positional inverted index (SURVEY.md §2.4 A6/A7, §2.2 P5).
  *
  * Schema: `ii(term, df, postings: array<struct<title, tf,
  * ofs: array<struct<line_off, char_off>>>>)` — postings sorted by title
  * (the reference's (term,title) secondary sort,
  * /root/reference/src/main/scala/invertedIndex.scala:83-86), occurrence
  * offsets in document order, and postings lists with df ≥ cutoff (3000)
  * silently dropped (invertedIndex.scala:93-94).
  *
  * Spark-first shape: the reference's hand-written combiner
  * (invertedIndex.scala:68-76) is Catalyst's partial HashAggregate — the
  * two-level groupBy below compiles to map-side partial aggregation followed
  * by one shuffle on (term,title) and one on term. `sort_array` reproduces
  * the secondary-sort title order without a custom partitioner/comparator.
  *
  * Scale notes (100 TB): both shuffles hash on the term, so skewed hot terms
  * are the risk; the df cutoff bounds any single postings array, and AQE
  * skew-join handling covers the candidate join in query. Occurrence lists
  * per (term,doc) are bounded by document length.
  */
object InvertedIndex {

  val DefaultDfCutoff = 3000

  private val tokUdf = udf { (body: String, bodyOff: Int) =>
    WikiCorpus.tokenize(body, bodyOff)
  }

  /** docs(title, line_offset, body_off, body) → occurrences
    * (term, title, line_off, char_off), one row per token occurrence. */
  def occurrences(docs: DataFrame): DataFrame =
    graft.core.Portable.explodeLean(
      docs.filter(col("body").isNotNull),
      Seq(col("title"), col("line_offset")),
      tokUdf(col("body"), col("body_off")), "t")
      .select(col("t._1").as("term"), col("title"),
        col("line_offset").as("line_off"), col("t._2").cast("long").as("char_off"))

  /** Full index build with the df cutoff.
    *
    * The cutoff is applied BEFORE postings assembly, not only after: df
    * depends on distinct (term, doc) alone, so the `df < cutoff` filter
    * commutes past the expensive aggregation. Stop-word-frequency terms
    * are precisely the ones owning most occurrences (on the 50k-page
    * bench corpus the dropped 25% of terms hold ~83% of the 12M
    * occurrences), so the semi-join skips building exactly the giant
    * postings arrays that would be thrown away. The distinct+count
    * pre-pass is map-side-combined and cheap by comparison. */
  /** Level-1 aggregation: occurrences → one row per (term, title) with tf
    * and document-ordered offsets — shared by [[build]] and [[merge]] so
    * the posting shape cannot drift between the batch and incremental
    * paths. */
  private def postingsByDoc(occ: DataFrame): DataFrame =
    occ.groupBy(col("term"), col("title"))
      .agg(count(lit(1)).cast("int").as("tf"),
        sort_array(collect_list(struct(col("line_off"), col("char_off")))).as("ofs"))

  def build(docs: DataFrame, dfCutoff: Int = DefaultDfCutoff): DataFrame = {
    val occ = occurrences(docs)
    val keep = occ.select(col("term"), col("title")).distinct()
      .groupBy(col("term")).agg(count(lit(1)).as("df_pre"))
      .filter(col("df_pre") < dfCutoff)
      .select(col("term"))
    postingsByDoc(occ.join(keep, Seq("term"), "left_semi"))
      .groupBy(col("term"))
      .agg(sort_array(collect_list(struct(col("title"), col("tf"), col("ofs")))).as("postings"),
        count(lit(1)).cast("int").as("df"))
      .filter(col("df") < dfCutoff) // belt-and-braces; pre-filter did the work
      .select(col("term"), col("df"), col("postings"))
  }

  /** Incremental maintenance: fold a delta corpus into an existing index
    * without rebuilding it — `merge(build(A, uncut), B, cutoff)` ==
    * `build(A ∪ B, cutoff)` (IndexMergeSpec pins the equality on the
    * golden corpus; the q59 gate pins it against a full-rebuild oracle).
    *
    * The reference can only rebuild from scratch
    * (/root/reference/src/main/scala/invertedIndex.scala runs one batch
    * job over all inputs); this is the operator a growing corpus needs.
    *
    * Contract:
    *  - `existing` must be an UNCUT index (dfCutoff = Int.MaxValue at
    *    build): a term already dropped by a cutoff cannot be resurrected,
    *    so the cutoff belongs here (or at serving), applied to merged df.
    *  - delta titles must be new (disjoint from existing titles);
    *    re-ingesting a document is an upsert, not a merge, and would need
    *    a delete pass first.
    *
    * Scale notes (100 TB index, small delta): untouched terms pass
    * through an ANTI join against the delta's term set — with a small
    * delta that side broadcasts, so the overwhelming majority of the
    * index is never unnested, regrouped, or even shuffled. Only postings
    * of terms the delta actually touches are exploded and reassembled. */
  def merge(existing: DataFrame, deltaDocs: DataFrame,
      dfCutoff: Int = DefaultDfCutoff): DataFrame = {
    val deltaPost = postingsByDoc(occurrences(deltaDocs))
    // Pre-filter on the MERGED df before any postings are unnested — the
    // same commute-the-cutoff move build makes with df_pre. Without it,
    // the stop-word terms (which every realistic delta touches, and which
    // own most of an uncut index's bytes) would be exploded, shuffled and
    // re-collected only to be dropped by the final cutoff. Merged df is
    // cheap: existing df + the delta's per-term distinct-title count
    // (delta titles are new by contract, so the sum is exact).
    val ddf = deltaPost.groupBy(col("term")).agg(count(lit(1)).as("ddf"))
    val keep = ddf
      .join(existing.select(col("term"), col("df")), Seq("term"), "left_outer")
      .filter(coalesce(col("df"), lit(0)) + col("ddf") < dfCutoff)
      .select(col("term"))
    val untouched = existing.join(ddf, Seq("term"), "left_anti")
      .filter(col("df") < dfCutoff)
    val touched = existing.join(keep, Seq("term"), "left_semi")
      .select(col("term"), explode(col("postings")).as("p"))
      .select(col("term"), col("p.title").as("title"),
        col("p.tf").as("tf"), col("p.ofs").as("ofs"))
      .unionByName(deltaPost.join(keep, Seq("term"), "left_semi"))
      .groupBy(col("term"))
      .agg(sort_array(collect_list(struct(col("title"), col("tf"), col("ofs")))).as("postings"),
        count(lit(1)).cast("int").as("df"))
      .select(col("term"), col("df"), col("postings"))
    untouched.unionByName(touched)
  }
}
