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
  * the opaque payload. IMAGE decode is REAL (javax.imageio is JDK-builtin:
  * PNG/JPEG/BMP/GIF → true dimensions, channels, pixel stats — see
  * [[imageStats]]; Spark's native `format("image")` source also works,
  * spark-mllib ships in the environment). AUDIO decode is REAL too
  * (javax.sound.sampled is JDK-builtin: WAV/AIFF/AU → true sample rate,
  * channels, frame count — see [[audioStats]]). VIDEO is real at the
  * container level (RIFF/AVI walker, [[videoContainerStats]]) and at the
  * PIXEL level for the MJPEG codec class ([[videoFrameStats]] — each
  * frame chunk is a complete JPEG, which javax.imageio decodes); only
  * inter-frame codecs (H.264 etc.) remain a deterministic md5-seeded
  * STUB, clearly marked below — the JDK ships no decoder for them, and
  * swapping one in changes one function body and nothing about the plan.
  *
  * Scale notes (100 TB of media): payload bytes dominate, so every operator
  * prunes to (media_id, bytes-needed-or-not) as early as possible; metadata
  * lives in a sibling struct column so metadata-only queries never touch
  * payload pages (Parquet column pruning). Feature extraction repartitions
  * by media_id for even payload distribution, not by file.
  */
object Multimodal {

  // ImageIO defaults to a DISK-backed stream cache: every ImageIO.read /
  // write spools through a temp FILE, so a 5000-image partition pays 5000
  // tiny file create/delete cycles and decode throughput tracks ambient
  // disk load (q64 measured bimodal 2 s / 5 s per child JVM with identical
  // plans — the mode was the disk, not the code). Payloads here arrive as
  // in-memory byte arrays, so the memory-backed stream cache is strictly
  // better at any scale. Lives in the object initializer: every JVM that
  // touches a codec path (executors included — the decode closures
  // reference this object) flips it exactly once, before first use.
  javax.imageio.ImageIO.setUseCache(false)

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
  // Real implementation would call e.g. ffmpeg here; no video codec ships
  // with the JDK (image decode via javax.imageio and audio via
  // javax.sound.sampled ARE real — see below). The fake derives every
  // output value from an md5 hash of the payload so results are
  // reproducible, content-sensitive, AND portable: any engine that can
  // compute md5 reproduces them bit-for-bit (the q62 oracle does).
  // ======================================================================
  private[graft] def contentHash(bytes: Array[Byte]): Long = {
    var h = 1125899906842597L
    var i = 0
    while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
    h
  }

  /** Unsigned 32-bit md5 prefix of the payload — the byte-level twin of
    * [[graft.core.Portable.hash32]] (`('0x'||substr(md5(x),1,8))::BIGINT`
    * in DuckDB), so feature values derived from it are oracle-checkable. */
  private[graft] def md5Hash32(bytes: Array[Byte]): Long = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
      ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
  }

  /** STUB decode: payload → FeatureDim float "embedding".
    * f_d = ((h·(d+1) + 2654435761·d) mod 4096) / 4096 with h =
    * [[md5Hash32]](payload). Every value lands on the 1/2^12 grid, so the
    * float is EXACT (no rounding ties for a SQL oracle to disagree on)
    * and the whole feature is reproducible from `md5(payload)` alone. */
  private[graft] def decodeToFeature(payload: Array[Byte]): Array[Float] = {
    val h = md5Hash32(payload)
    Array.tabulate(FeatureDim) { d =>
      ((h * (d + 1) + 2654435761L * d) % 4096L).toFloat / 4096f
    }
  }

  /** STUB frame decode: (payload, frameIdx) → frame bytes — the
    * inter-frame-codec (H.264 etc.) boundary, the one decode the JDK
    * cannot do. Image, audio, and MJPEG frame-pixel decode are real. */
  private[graft] def decodeFrame(payload: Array[Byte], idx: Int): Array[Byte] = {
    val h = contentHash(payload) + idx
    Array.tabulate(8)(i => ((h >> (8 * (i % 8))) & 0xFF).toByte)
  }

  // ======================================================================
  // REAL audio decode — javax.sound.sampled is JDK-builtin: WAV/AIFF/AU
  // payloads decode to true sample rate, channel count, frame length and
  // duration. The only remaining stub is inter-frame video codecs (H.264
  // etc. — the JDK ships no decoder); MJPEG frame pixels decode for real
  // via the container walk + ImageIO JPEG path further down (q125).
  // ======================================================================
  final case class AudioInfo(sample_rate: Int, channels: Int, frames: Long,
      duration_ms: Double)

  /** Decode real audio bytes (None if the payload isn't a decodable
    * audio container). */
  def decodeAudio(payload: Array[Byte]): Option[AudioInfo] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val f = in.getFormat
        val frames = in.getFrameLength
        Some(AudioInfo(f.getSampleRate.toInt, f.getChannels, frames,
          frames * 1000.0 / f.getSampleRate))
      } finally in.close()
    } catch { case _: Throwable => None }

  /** Decode the PCM SAMPLES of a 16-bit mono little-endian audio payload
    * (the fixture's WAV shape) — None for any other format or an
    * undecodable container. The real decode path: the container walk and
    * sample extraction go through javax.sound, not a re-parse of our own
    * writer's layout. */
  def decodeAudioSamples(payload: Array[Byte]): Option[Array[Short]] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val f = in.getFormat
        if (f.getSampleSizeInBits != 16 || f.getChannels != 1 || f.isBigEndian) None
        else {
          val bytes = in.readAllBytes()
          val out = new Array[Short](bytes.length / 2)
          var i = 0
          while (i < out.length) {
            out(i) = ((bytes(2 * i) & 0xFF) | (bytes(2 * i + 1) << 8)).toShort
            i += 1
          }
          Some(out)
        }
      } finally in.close()
    } catch { case _: Throwable => None }

  final case class AudioFeatures(media_id: Long, frames: Long, sum_sq: Long,
      peak: Long, zero_cross: Long, decoded: Boolean)

  /** Sample-level audio features through the REAL decode path: energy
    * (exact Σ s² in int64 — a 16-bit sample squares to ≤ 2^30, so 2^33
    * samples fit without overflow), peak |amplitude|, and zero crossings
    * ((s ≥ 0) flipping between neighbors). One O(frames) fold per
    * payload, batch-bounded like every codec path; undecodable rows are
    * observable (decoded=false, zeroed stats), not dropped. */
  def audioFeatures(spark: SparkSession, media: Dataset[Media],
      batchSize: Int = DefaultBatchSize): Dataset[AudioFeatures] = {
    import spark.implicits._
    media.filter(col("kind") === "audio")
      .repartition(col("media_id"))
      .mapPartitions { it =>
        inBatches(it, batchSize) { batch =>
          batch.map { m =>
            decodeAudioSamples(m.payload) match {
              case Some(ss) =>
                var sumSq = 0L; var peak = 0L; var zc = 0L; var i = 0
                while (i < ss.length) {
                  val s = ss(i).toLong
                  sumSq += s * s
                  val a = math.abs(s)
                  if (a > peak) peak = a
                  if (i > 0 && ((s >= 0) != (ss(i - 1) >= 0))) zc += 1
                  i += 1
                }
                AudioFeatures(m.media_id, ss.length.toLong, sumSq, peak, zc,
                  decoded = true)
              case None =>
                AudioFeatures(m.media_id, 0L, 0L, 0L, 0L, decoded = false)
            }
          }
        }
      }
  }

  final case class DecodedAudio(media_id: Long, sample_rate: Int,
      channels: Int, frames: Long, duration_ms: Double, decoded: Boolean)

  /** Batch-shaped real audio decode over the media table (audio rows
    * only) — same iterator-of-batches contract as [[imageStats]].
    * Undecodable payloads yield decoded=false with zeroed stats. */
  def audioStats(spark: SparkSession, media: Dataset[Media],
      batchSize: Int = DefaultBatchSize): Dataset[DecodedAudio] = {
    import spark.implicits._
    media.filter(col("kind") === "audio")
      .repartition(col("media_id"))
      .mapPartitions { it =>
        inBatches(it, batchSize) { batch =>
          batch.map { m =>
            decodeAudio(m.payload) match {
              case Some(a) => DecodedAudio(m.media_id, a.sample_rate,
                a.channels, a.frames, a.duration_ms, decoded = true)
              case None => DecodedAudio(m.media_id, 0, 0, 0L, 0.0, decoded = false)
            }
          }
        }
      }
  }

  /** Synthesize a PCM WAV container (16-bit signed little-endian, mono)
    * from deterministic samples — the executor-side generator for the q65
    * decode round-trip (the audio twin of q64's PNG encode). */
  def synthWav(sampleRate: Float, samples: Array[Short]): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate, 16, 1,
      true, false)
    val pcm = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      pcm(2 * i) = (samples(i) & 0xFF).toByte
      pcm(2 * i + 1) = ((samples(i) >> 8) & 0xFF).toByte
      i += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  // ======================================================================
  // REAL image decode — javax.imageio is JDK-builtin, so the image branch
  // needs no stub: PNG/JPEG/BMP/GIF payloads decode to true dimensions,
  // channel count, and pixel statistics. Audio (javax.sound WAV/AIFF/AU,
  // above) and MJPEG frame pixels (ImageIO JPEG per movi chunk, below)
  // are real too; only inter-frame video codecs (H.264 etc.) stay
  // stubbed — the JDK ships no decoder for them.
  // ======================================================================
  final case class ImageInfo(width: Int, height: Int, channels: Int,
      mean_luma: Double)

  /** Decode real image bytes (None if the payload isn't a decodable
    * image). Mean luma uses the standard BT.601 weights. */
  def decodeImage(payload: Array[Byte]): Option[ImageInfo] =
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        var luma = 0.0
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            luma += 0.299 * ((rgb >> 16) & 0xFF) +
              0.587 * ((rgb >> 8) & 0xFF) + 0.114 * (rgb & 0xFF)
            x += 1
          }
          y += 1
        }
        Some(ImageInfo(w, h, img.getColorModel.getNumComponents,
          luma / (w.toLong * h)))
      }
    } catch { case _: Throwable => None }

  final case class DecodedImage(media_id: Long, width: Int, height: Int,
      channels: Int, mean_luma: Double, decoded: Boolean)

  /** Batch-shaped real image decode over the media table (image rows
    * only). Undecodable payloads yield decoded=false with zeroed stats —
    * the row is kept so corrupt inputs are observable, not dropped. */
  def imageStats(spark: SparkSession, media: Dataset[Media],
      batchSize: Int = DefaultBatchSize): Dataset[DecodedImage] = {
    import spark.implicits._
    media.filter(col("kind") === "image")
      .repartition(col("media_id"))
      .mapPartitions { it =>
        inBatches(it, batchSize) { batch =>
          batch.map { m =>
            decodeImage(m.payload) match {
              case Some(i) => DecodedImage(m.media_id, i.width, i.height,
                i.channels, i.mean_luma, decoded = true)
              case None => DecodedImage(m.media_id, 0, 0, 0, 0.0, decoded = false)
            }
          }
        }
      }
  }

  final case class ImageHash(media_id: Long, b0: Int, b1: Int, b2: Int,
      b3: Int, decoded: Boolean)

  /** Perceptual average-hash (aHash) of a decoded image, returned as four
    * 16-bit blocks (bit i of the 64-bit hash lives in block i/16 at
    * position i%16, i = cellY*8 + cellX). Blocks instead of one Long keep
    * every value in [0, 65536) — no sign-bit hazards in either engine when
    * the hash is re-derived arithmetically by the SQL oracle, and the
    * 4-block split IS the hamming-pairing key (pigeonhole: any pair at
    * distance ≤ 3 shares at least one intact block).
    *
    * All arithmetic is integer (gray = (r+g+b)/3 summed per cell then one
    * integer division; global mean = Σcells/64), so a SQL oracle that knows
    * the pixel-generation formula reproduces the hash bit-for-bit. Images
    * larger than 8×8 are box-downsampled on integer cell boundaries
    * (cx·w/8 ≤ x < (cx+1)·w/8); smaller sides clamp to ≥ 1 pixel/cell. */
  def aHashBlocks(img: java.awt.image.BufferedImage): Array[Int] = {
    val w = img.getWidth
    val h = img.getHeight
    val cells = new Array[Long](64)
    var cy = 0
    while (cy < 8) {
      var cx = 0
      while (cx < 8) {
        val x0 = math.min(cx * w / 8, w - 1)
        val x1 = math.max((cx + 1) * w / 8, x0 + 1)
        val y0 = math.min(cy * h / 8, h - 1)
        val y1 = math.max((cy + 1) * h / 8, y0 + 1)
        var sum = 0L
        var n = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val rgb = img.getRGB(x, y)
            sum += ((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)
            n += 3
            x += 1
          }
          y += 1
        }
        cells(cy * 8 + cx) = sum / n
        cx += 1
      }
      cy += 1
    }
    val mean = cells.sum / 64
    val blocks = new Array[Int](4)
    var i = 0
    while (i < 64) {
      if (cells(i) > mean) blocks(i / 16) |= 1 << (i % 16)
      i += 1
    }
    blocks
  }

  /** Batch-shaped REAL decode → perceptual hash over the media table
    * (image rows only): ImageIO decode, 8×8 integer box-downsample,
    * mean-threshold bits. The q106 near-dup gate runs the full
    * encode→decode→hash path on executors and hamming-pairs the blocks —
    * a broken codec, downsample, or threshold fails the hash gate. */
  def imageAHash(spark: SparkSession, media: Dataset[Media],
      batchSize: Int = DefaultBatchSize): Dataset[ImageHash] = {
    import spark.implicits._
    media.filter(col("kind") === "image")
      .repartition(col("media_id"))
      .mapPartitions { it =>
        inBatches(it, batchSize) { batch =>
          batch.map { m =>
            val img = try javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(m.payload))
            catch { case _: Throwable => null }
            if (img == null) ImageHash(m.media_id, 0, 0, 0, 0, decoded = false)
            else {
              val b = aHashBlocks(img)
              ImageHash(m.media_id, b(0), b(1), b(2), b(3), decoded = true)
            }
          }
        }
      }
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

  // ======================================================================
  // REAL AVI CONTAINER (RIFF) — video container metadata without a codec.
  // The JDK ships no general video PIXEL decoder (the non-MJPEG path stays
  // stubbed above; MJPEG pixel decode is real — see videoFrameStats below),
  // but the CONTAINER level — RIFF('AVI ' LIST('hdrl' avih) LIST('movi'
  // frame chunks)) — is plain byte structure, so the writer and the
  // chunk-walking parser below are real: a malformed header, a wrong
  // little-endian field, or a broken even-byte chunk pad breaks the
  // round-trip and the q102 hash gate with it. This mirrors how the WAV
  // (also RIFF) audio path became real in q65.

  final case class AviInfo(usPerFrame: Int, totalFrames: Int, width: Int,
      height: Int, moviFrames: Int)

  final case class DecodedVideo(media_id: Long, width: Int, height: Int,
      total_frames: Long, movi_frames: Long, duration_ms: Double,
      parsed: Boolean)

  private def le32(b: java.io.ByteArrayOutputStream, v: Int): Unit = {
    b.write(v & 0xFF); b.write((v >> 8) & 0xFF)
    b.write((v >> 16) & 0xFF); b.write((v >> 24) & 0xFF)
  }
  private def fourCC(b: java.io.ByteArrayOutputStream, s: String): Unit =
    b.write(s.getBytes("US-ASCII"))

  /** Write a minimal-but-well-formed AVI: RIFF size includes everything
    * after the size field; chunks are padded to even length per RIFF. */
  def synthAvi(frames: Int, width: Int, height: Int, usPerFrame: Int,
      seed: Long): Array[Byte] = {
    val avih = new java.io.ByteArrayOutputStream()
    le32(avih, usPerFrame); le32(avih, 0); le32(avih, 0); le32(avih, 0)
    le32(avih, frames); le32(avih, 0); le32(avih, 1); le32(avih, 0)
    le32(avih, width); le32(avih, height)
    (0 until 4).foreach(_ => le32(avih, 0))
    val hdrl = new java.io.ByteArrayOutputStream()
    fourCC(hdrl, "hdrl"); fourCC(hdrl, "avih"); le32(hdrl, avih.size())
    hdrl.write(avih.toByteArray)
    val movi = new java.io.ByteArrayOutputStream()
    fourCC(movi, "movi")
    for (i <- 0 until frames) {
      val len = 5 + (seed + i).toInt.abs % 4 // odd sizes exercise the pad
      val data = Array.tabulate(len)(j => ((seed * 31 + i * 17 + j) & 0xFF).toByte)
      fourCC(movi, "00db"); le32(movi, len); movi.write(data)
      if (len % 2 == 1) movi.write(0)
    }
    val body = new java.io.ByteArrayOutputStream()
    fourCC(body, "AVI ")
    fourCC(body, "LIST"); le32(body, hdrl.size()); body.write(hdrl.toByteArray)
    fourCC(body, "LIST"); le32(body, movi.size()); body.write(movi.toByteArray)
    val out = new java.io.ByteArrayOutputStream()
    fourCC(out, "RIFF"); le32(out, body.size()); out.write(body.toByteArray)
    out.toByteArray
  }

  private def readLe32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
      ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)
  private def cc(b: Array[Byte], off: Int): String =
    new String(b, off, 4, "US-ASCII")

  /** Real RIFF chunk walker: validates magics, reads avih fields, counts
    * the movi frame chunks (respecting the even-byte pad).
    *
    * Hostile-container safety (ADVICE r11, shared with
    * [[extractFrameChunks]]): chunk lengths arrive as UNVALIDATED signed
    * LE32s, so a payload that passes the RIFF/'AVI ' magic can still carry
    * a negative or near-Int.MaxValue length. Advancing by such a length
    * raw either loops forever (advance <= 0) or overflows the cursor
    * negative and throws AIOOBE out of the executor task. Both walkers
    * therefore bail out of the enclosing list/file walk on a negative
    * length and compute every advance in Long, clamped to the walk's end —
    * a malformed container degrades to "whatever parsed so far" (here) or
    * the documented decoded=false row (videoFrameStats), never a hung or
    * killed task. */
  def parseAvi(bytes: Array[Byte]): Option[AviInfo] = {
    if (bytes.length < 12 || cc(bytes, 0) != "RIFF" || cc(bytes, 8) != "AVI ")
      return None
    var info: Option[(Int, Int, Int, Int)] = None
    var frames = 0
    var off = 12
    val end = math.min(8L + readLe32(bytes, 4), bytes.length.toLong).toInt
    while (off >= 0 && off + 8 <= end) {
      val id = cc(bytes, off); val len = readLe32(bytes, off + 4)
      if (len < 0) { off = end } // hostile length: stop the walk
      else {
        if (id == "LIST" && off + 12 <= end) {
          val listType = cc(bytes, off + 8)
          if (listType == "hdrl" && off + 16 <= end && cc(bytes, off + 12) == "avih"
              && off + 60 <= bytes.length) {
            val a = off + 20 // past 'avih' + its size field
            info = Some((readLe32(bytes, a), readLe32(bytes, a + 16),
              readLe32(bytes, a + 32), readLe32(bytes, a + 36)))
          } else if (listType == "movi") {
            var p = off + 12
            val listEnd = math.min(off + 8L + len, end.toLong).toInt
            while (p >= 0 && p + 8 <= listEnd) {
              val clen = readLe32(bytes, p + 4)
              if (clen < 0) { p = listEnd } // hostile length: stop this list
              else {
                val fid = cc(bytes, p) // 00db uncompressed, 00dc compressed (MJPEG)
                if (fid == "00db" || fid == "00dc") frames += 1
                p = math.min(p + 8L + clen + (clen % 2), listEnd.toLong).toInt
              }
            }
          }
        }
        off = math.min(off + 8L + len + (len % 2), end.toLong).toInt
      }
    }
    info.map { case (us, tf, w, h) => AviInfo(us, tf, w, h, frames) }
  }

  // ======================================================================
  // REAL video PIXEL decode — for the MJPEG codec class. An MJPEG AVI is
  // the RIFF container above with each movi chunk holding a complete JPEG
  // image, and the JDK's ImageIO decodes JPEG — so for this codec family
  // the frame-pixel path needs no stub: container walk → per-frame JPEG
  // decode → true dimensions and pixel stats (q125). Codecs with
  // inter-frame prediction (H.264 etc.) stay stubbed: the JDK ships no
  // decoder for them, and faking motion compensation would be noise.
  // ======================================================================

  /** Write a well-formed MJPEG AVI: the [[synthAvi]] container shape with
    * one real ImageIO-encoded JPEG per frame ('00dc' compressed chunks),
    * each a solid color derived from (seed, frame index) so tests can
    * predict decoded pixels to within JPEG quantization error. */
  def synthMjpegAvi(frames: Int, width: Int, height: Int, usPerFrame: Int,
      seed: Long): Array[Byte] = {
    val avih = new java.io.ByteArrayOutputStream()
    le32(avih, usPerFrame); le32(avih, 0); le32(avih, 0); le32(avih, 0)
    le32(avih, frames); le32(avih, 0); le32(avih, 1); le32(avih, 0)
    le32(avih, width); le32(avih, height)
    (0 until 4).foreach(_ => le32(avih, 0))
    val hdrl = new java.io.ByteArrayOutputStream()
    fourCC(hdrl, "hdrl"); fourCC(hdrl, "avih"); le32(hdrl, avih.size())
    hdrl.write(avih.toByteArray)
    val movi = new java.io.ByteArrayOutputStream()
    fourCC(movi, "movi")
    for (i <- 0 until frames) {
      val img = new java.awt.image.BufferedImage(width, height,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val rgb = frameRgb(seed, i)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) { img.setRGB(x, y, rgb); x += 1 }
        y += 1
      }
      val jpg = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", jpg)
      val data = jpg.toByteArray
      fourCC(movi, "00dc"); le32(movi, data.length); movi.write(data)
      if (data.length % 2 == 1) movi.write(0)
    }
    val body = new java.io.ByteArrayOutputStream()
    fourCC(body, "AVI ")
    fourCC(body, "LIST"); le32(body, hdrl.size()); body.write(hdrl.toByteArray)
    fourCC(body, "LIST"); le32(body, movi.size()); body.write(movi.toByteArray)
    val out = new java.io.ByteArrayOutputStream()
    fourCC(out, "RIFF"); le32(out, body.size()); out.write(body.toByteArray)
    out.toByteArray
  }

  /** Deterministic per-frame solid color (shared by the writer and the
    * specs that predict decoded pixels). */
  def frameRgb(seed: Long, frameIdx: Int): Int =
    (((seed * 2654435L + frameIdx * 7919L) % 0x1000000L + 0x1000000L)
      % 0x1000000L).toInt

  /** Walk the movi list and return every frame chunk's payload ('00dc'
    * compressed / '00db' uncompressed), in stream order. Empty when the
    * container is malformed. Hostile chunk lengths (negative /
    * near-Int.MaxValue) stop the walk instead of hanging or throwing —
    * see the safety note on [[parseAvi]]; the length guard on the copy is
    * computed in Long so a huge clen can't overflow the bound check
    * either. */
  def extractFrameChunks(bytes: Array[Byte]): Vector[Array[Byte]] = {
    if (bytes.length < 12 || cc(bytes, 0) != "RIFF" || cc(bytes, 8) != "AVI ")
      return Vector.empty
    val out = Vector.newBuilder[Array[Byte]]
    var off = 12
    val end = math.min(8L + readLe32(bytes, 4), bytes.length.toLong).toInt
    while (off >= 0 && off + 8 <= end) {
      val id = cc(bytes, off); val len = readLe32(bytes, off + 4)
      if (len < 0) { off = end } // hostile length: stop the walk
      else {
        if (id == "LIST" && off + 12 <= end && cc(bytes, off + 8) == "movi") {
          var p = off + 12
          val listEnd = math.min(off + 8L + len, end.toLong).toInt
          while (p >= 0 && p + 8 <= listEnd) {
            val cid = cc(bytes, p); val clen = readLe32(bytes, p + 4)
            if (clen < 0) { p = listEnd } // hostile length: stop this list
            else {
              if ((cid == "00dc" || cid == "00db") && p + 8L + clen <= listEnd)
                out += java.util.Arrays.copyOfRange(bytes, p + 8, p + 8 + clen)
              p = math.min(p + 8L + clen + (clen % 2), listEnd.toLong).toInt
            }
          }
        }
        off = math.min(off + 8L + len + (len % 2), end.toLong).toInt
      }
    }
    out.result()
  }

  final case class DecodedFrame(media_id: Long, frame_idx: Int, width: Int,
      height: Int, mean_luma: Double, decoded: Boolean)

  /** Per-FRAME pixel decode over MJPEG video payloads: container walk →
    * one real ImageIO JPEG decode per frame chunk → dimensions + BT.601
    * mean luma. Same batch-bounded mapPartitions discipline as the other
    * codec paths; an unparseable container or undecodable frame yields a
    * decoded=false row (observable, not dropped), frame_idx -1 marking a
    * container-level failure. */
  def videoFrameStats(spark: SparkSession, media: Dataset[Media],
      batchSize: Int = DefaultBatchSize): Dataset[DecodedFrame] = {
    import spark.implicits._
    media.filter(col("kind") === "video")
      .repartition(col("media_id"))
      .mapPartitions { it =>
        inBatches(it, batchSize) { batch =>
          batch.flatMap { m =>
            val frames = extractFrameChunks(m.payload)
            if (frames.isEmpty)
              Seq(DecodedFrame(m.media_id, -1, 0, 0, 0.0, decoded = false))
            else frames.iterator.zipWithIndex.map { case (fb, i) =>
              decodeImage(fb) match {
                case Some(f) => DecodedFrame(m.media_id, i, f.width, f.height,
                  f.mean_luma, decoded = true)
                case None => DecodedFrame(m.media_id, i, 0, 0, 0.0, decoded = false)
              }
            }.toSeq
          }
        }
      }
  }

  /** Batch-shaped container-metadata extraction over video payloads —
    * same mapPartitions discipline as [[audioStats]]; duration_ms is one
    * exact integer product and one IEEE division, oracle-reproducible. */
  def videoContainerStats(spark: SparkSession, media: Dataset[Media],
      batchSize: Int = DefaultBatchSize): Dataset[DecodedVideo] = {
    import spark.implicits._
    media.filter(col("kind") === "video")
      .repartition(col("media_id"))
      .mapPartitions { it =>
        inBatches(it, batchSize) { batch =>
          batch.map { m =>
            parseAvi(m.payload) match {
              case Some(a) => DecodedVideo(m.media_id, a.width, a.height,
                a.totalFrames.toLong, a.moviFrames.toLong,
                a.totalFrames.toLong * a.usPerFrame / 1000.0, parsed = true)
              case None => DecodedVideo(m.media_id, 0, 0, 0L, 0L, 0.0,
                parsed = false)
            }
          }
        }
      }
  }
}
