package graft.maintenance

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CDC apply / MERGE: the incremental-maintenance primitive a continuously
  * re-crawled training corpus needs (re-fetched documents replace their
  * previous version; new documents append). Companion to
  * [[graft.index.InvertedIndex.merge]], which maintains the derived index
  * the same way.
  *
  * Scale design: expressed as one left-anti join on the key plus a union —
  * both sides stay distributed, nothing is collected. The anti join
  * shuffles the 100 TB target ONLY if the source key set is too big to
  * broadcast; a CDC batch is normally tiny relative to the target, so
  * `broadcastKeys = true` turns the whole apply into a map-only pass over
  * the target (broadcast anti join, no shuffle) followed by the append.
  * On tables bucketed by the key, the anti join is co-located either way.
  */
object Upsert {

  /** Last-writer-wins upsert: rows of `source` replace rows of `target`
    * that share the same `keys` tuple; unmatched source rows are inserted.
    * Both inputs must carry the same columns (by name). Key matching is
    * NULL-SAFE (`<=>`): a NULL key in the batch replaces the NULL-key row
    * in the target instead of appending a fresh duplicate every apply —
    * plain equality never matches NULL = NULL, which would break
    * last-writer-wins for exactly the malformed rows most likely to
    * recur in every batch. */
  def apply(target: DataFrame, source: DataFrame, keys: Seq[String],
            broadcastKeys: Boolean = true): DataFrame = {
    val srcKeys0 = keys.foldLeft(source.select(keys.map(col): _*).distinct()) {
      (d, k) => d.withColumnRenamed(k, s"_src_$k")
    }
    val srcKeys = if (broadcastKeys) broadcast(srcKeys0) else srcKeys0
    val cond = keys.map(k => col(k) <=> col(s"_src_$k")).reduce(_ && _)
    target.join(srcKeys, cond, "left_anti").unionByName(source)
  }
}
