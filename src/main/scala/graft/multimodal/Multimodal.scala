package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing for a training-data
  * pipeline: media as opaque `binary` columns + typed metadata, with
  * decode / feature-extract / resize / frame-sample as batch-shaped
  * per-partition transforms.
  *
  * The Spark-side shape is real and tested: schema, partitioning, the
  * iterator-of-batches processing contract (the JVM twin of Python's
  * `mapInPandas` — process a partition as bounded batches so peak memory is
  * batch-sized, not partition-sized), and codegen'd column pruning around
  * the opaque payload. The actual codec call is a STUB — this environment
  * has no image/audio libraries — implemented as a deterministic fake
  * (content-hash-seeded) and clearly marked below; swapping in a real codec
  * changes ONE function body and nothing about the plan.
  *
  * Scale notes (100 TB of media): payload bytes dominate, so every operator
  * prunes to (media_id, bytes-needed-or-not) as early as possible; metadata
  * lives in a sibling struct column so metadata-only queries never touch
  * payload pages (Parquet column pruning). Feature extraction repartitions
  * by media_id for even payload distribution, not by file.
  */
object Multimodal {

  final case class Media(media_id: Long, kind: String, meta: MediaMeta,
      payload: Array[Byte])
  final case class MediaMeta(width: Int, height: Int, channels: Int,
      sample_rate: Int, n_frames: Int)
  final case class MediaFeature(media_id: Long, kind: String,
      feature: Array[Float])
  final case class FrameSample(media_id: Long, frame_idx: Int,
      frame_payload: Array[Byte])

  val FeatureDim = 16
  val DefaultBatchSize = 64

  // ======================================================================
  // STUB CODEC — deterministic fake standing in for a real decoder.
  // Real implementation would call e.g. javax.imageio / ffmpeg here; the
  // environment ships no media libs. The fake derives every output value
  // from a rolling hash of the payload so results are reproducible and
  // content-sensitive, which is what the downstream plumbing needs.
  // ======================================================================
  private[graft] def contentHash(bytes: Array[Byte]): Long = {
    var h = 1125899906842597L
    var i = 0
    while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
    h
  }

  /** STUB decode: payload → FeatureDim float "embedding". */
  private[graft] def decodeToFeature(payload: Array[Byte]): Array[Float] = {
    val h = contentHash(payload)
    Array.tabulate(FeatureDim) { d =>
      val x = h * (d + 1) + 0x9E3779B97F4A7C15L * d
      ((x % 1000003L).toFloat / 1000003f)
    }
  }

  /** STUB frame decode: (payload, frameIdx) → frame bytes. */
  private[graft] def decodeFrame(payload: Array[Byte], idx: Int): Array[Byte] = {
    val h = contentHash(payload) + idx
    Array.tabulate(8)(i => ((h >> (8 * (i % 8))) & 0xFF).toByte)
  }

  /** Iterator-of-batches runner: the mapInPandas contract on the JVM.
    * Bounded memory (one batch of rows materialized at a time), amortized
    * per-batch setup (a real codec would init its context once per batch). */
  private[graft] def inBatches[A, B](it: Iterator[A], batchSize: Int)(
      f: Seq[A] => Seq[B]): Iterator[B] =
    it.grouped(batchSize).flatMap(f)

  /** Feature extraction: media → (media_id, kind, feature[FeatureDim]).
    * Repartitions by media_id so payload bytes spread evenly regardless of
    * source file layout. */
  def extractFeatures(spark: SparkSession, media: Dataset[Media],
      batchSize: Int = DefaultBatchSize): Dataset[MediaFeature] = {
    import spark.implicits._
    media
      .repartition(col("media_id"))
      .mapPartitions { it =>
        inBatches(it, batchSize) { batch =>
          batch.map(m => MediaFeature(m.media_id, m.kind,
            decodeToFeature(m.payload)))
        }
      }
  }

  /** Frame sampling: every `stride`-th frame of each video, exploded to one
    * row per sampled frame (bounded by meta.n_frames — the planner never
    * sees unbounded fan-out). */
  def sampleFrames(spark: SparkSession, media: Dataset[Media], stride: Int)
      : Dataset[FrameSample] = {
    import spark.implicits._
    media
      .filter(col("kind") === "video")
      .repartition(col("media_id"))
      .flatMap { m =>
        (0 until m.meta.n_frames by stride).map(i =>
          FrameSample(m.media_id, i, decodeFrame(m.payload, i)))
      }
  }

  /** Resize is a metadata transform + payload re-encode; the metadata math
    * is real column work (codegen'd), the re-encode is the stub. */
  def resizeMeta(media: DataFrame, maxSide: Int): DataFrame =
    media.withColumn("scale",
        least(lit(1.0), lit(maxSide) / greatest(col("meta.width"), col("meta.height"))))
      .withColumn("new_width", ceil(col("meta.width") * col("scale")).cast("int"))
      .withColumn("new_height", ceil(col("meta.height") * col("scale")).cast("int"))

  /** Metadata-only stats — never touches the payload column (verify with
    * explain: ReadSchema excludes `payload`). */
  def mediaStats(media: DataFrame): DataFrame =
    media.groupBy(col("kind"))
      .agg(count(lit(1)).as("n"),
        avg(col("meta.width")).as("avg_w"),
        avg(col("meta.height")).as("avg_h"),
        sum(col("meta.n_frames")).cast("long").as("total_frames"))
      .orderBy(col("kind"))

  /** Deterministic synthetic media table derived from the `documents`
    * fixture (the environment ships no binary media): payload = UTF-8 bytes
    * of the text, kind cycles image/audio/video, metadata derived from
    * doc_id. Lets every operator above run against real fixture data. */
  def syntheticMedia(spark: SparkSession, docs: DataFrame): Dataset[Media] = {
    import spark.implicits._
    docs.select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        struct(
          (col("doc_id") % 640 + 16).cast("int").as("width"),
          (col("doc_id") % 480 + 16).cast("int").as("height"),
          lit(3).cast("int").as("channels"),
          lit(16000).cast("int").as("sample_rate"),
          (col("doc_id") % 25 + 1).cast("int").as("n_frames")).as("meta"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[Media]
  }
}
