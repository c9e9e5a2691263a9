package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** k-minimum-values cardinality sketch as a typed `Aggregator`: the buffer
  * is the k smallest DISTINCT hash values seen so far, kept sorted —
  * bounded state (≤ k longs) per (partition, group), merged
  * associatively, so Catalyst runs it as ordinary partial aggregation
  * (map-side combine). This is q107's 100 TB shape: one input-sized scan
  * collapses to one k-long buffer per (partition, group) before a single
  * tiny shuffle — no global per-group sort, no (group, token) shuffle.
  * The sketch is also the natural cross-shard/day merge: union buffers,
  * keep the k smallest (exactly [[merge]]).
  *
  * Estimator inputs come out as (n_sketch, kth_min): distinct-count ≈
  * (k-1)·2^32 / kth_min when the buffer filled, exactly n_sketch when it
  * didn't. Deduplication is the buffer's job (insert-if-absent), so
  * callers feed RAW hash streams — no upstream distinct needed.
  */
class KmvSketch(k: Int)
    extends Aggregator[Long, KmvSketch.Buf, KmvSketch.Out] {

  override def zero: KmvSketch.Buf = KmvSketch.Buf(Array.emptyLongArray)

  override def reduce(b: KmvSketch.Buf, h: Long): KmvSketch.Buf = {
    val vs = b.vs
    val idx = java.util.Arrays.binarySearch(vs, h)
    if (idx >= 0) b // already present — KMV is over distinct values
    else {
      val ins = -idx - 1
      if (vs.length >= k && ins >= k) b // larger than the kth minimum
      else {
        val n = math.min(vs.length + 1, k)
        val out = new Array[Long](n)
        System.arraycopy(vs, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(vs, ins, out, ins + 1, n - ins - 1)
        KmvSketch.Buf(out)
      }
    }
  }

  override def merge(a: KmvSketch.Buf, b: KmvSketch.Buf): KmvSketch.Buf = {
    // merge two sorted distinct arrays, keep the k smallest distinct
    val out = new Array[Long](math.min(a.vs.length + b.vs.length, k))
    var i = 0; var j = 0; var n = 0
    while (n < out.length && (i < a.vs.length || j < b.vs.length)) {
      val takeA = j >= b.vs.length || (i < a.vs.length && a.vs(i) <= b.vs(j))
      val v = if (takeA) a.vs(i) else b.vs(j)
      if (takeA) i += 1 else j += 1
      if (n == 0 || out(n - 1) != v) { out(n) = v; n += 1 }
    }
    KmvSketch.Buf(if (n == out.length) out else java.util.Arrays.copyOf(out, n))
  }

  override def finish(b: KmvSketch.Buf): KmvSketch.Out =
    KmvSketch.Out(b.vs.length.toLong, if (b.vs.isEmpty) 0L else b.vs.last)

  override def bufferEncoder: Encoder[KmvSketch.Buf] = Encoders.product[KmvSketch.Buf]
  override def outputEncoder: Encoder[KmvSketch.Out] = Encoders.product[KmvSketch.Out]
}

object KmvSketch {
  /** `vs`: sorted, distinct, length ≤ k. */
  final case class Buf(vs: Array[Long])
  final case class Out(n_sketch: Long, kth_min: Long)
  final case class Values(vs: Seq[Long])
}

/** Null-SKIPPING adapter over [[KmvSketch]] (ADVICE r12): input rows whose
  * hash key is NULL contribute nothing to the sketch, mirroring the DuckDB
  * oracle's `WHERE c IS NOT NULL` — the estimator counts distinct VALUES
  * and the profile reports nulls separately (n_null). The bare [[KmvSketch]]
  * takes primitive Long and would fail (or fabricate a value) on a NULL
  * input, which a dirty-input profile column (q139/q140's explicit target)
  * can always produce; register this twin with `Encoders.LONG` (boxed)
  * wherever the key expression is nullable. */
class KmvSketchNullSafe(k: Int)
    extends Aggregator[java.lang.Long, KmvSketch.Buf, KmvSketch.Out] {
  private val inner = new KmvSketch(k)
  override def zero: KmvSketch.Buf = inner.zero
  override def reduce(b: KmvSketch.Buf, h: java.lang.Long): KmvSketch.Buf =
    if (h == null) b else inner.reduce(b, h.longValue)
  override def merge(a: KmvSketch.Buf, b: KmvSketch.Buf): KmvSketch.Buf =
    inner.merge(a, b)
  override def finish(b: KmvSketch.Buf): KmvSketch.Out = inner.finish(b)
  override def bufferEncoder: Encoder[KmvSketch.Buf] = Encoders.product[KmvSketch.Buf]
  override def outputEncoder: Encoder[KmvSketch.Out] = Encoders.product[KmvSketch.Out]
}

/** Buffer-exposing twin of [[KmvSketch]]: `finish` returns the sorted
  * k-minimum values themselves instead of the (count, kth-min) estimator
  * inputs — the per-shard ARTIFACT a cluster materializes so sketches
  * built on different shards/days can be merged downstream (q137's gate:
  * merging per-shard value sets and re-taking the k smallest distinct is
  * EXACTLY the whole-corpus sketch, because every global top-k minimum is
  * in its own shard's top-k). Same reduce/merge as the estimator twin. */
class KmvSketchValues(k: Int)
    extends Aggregator[Long, KmvSketch.Buf, KmvSketch.Values] {
  private val inner = new KmvSketch(k)
  override def zero: KmvSketch.Buf = inner.zero
  override def reduce(b: KmvSketch.Buf, h: Long): KmvSketch.Buf = inner.reduce(b, h)
  override def merge(a: KmvSketch.Buf, b: KmvSketch.Buf): KmvSketch.Buf = inner.merge(a, b)
  override def finish(b: KmvSketch.Buf): KmvSketch.Values =
    KmvSketch.Values(b.vs.toSeq)
  override def bufferEncoder: Encoder[KmvSketch.Buf] = Encoders.product[KmvSketch.Buf]
  override def outputEncoder: Encoder[KmvSketch.Values] = Encoders.product[KmvSketch.Values]
}
