package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

/** Spark-side plumbing tests for the multimodal operators: schema, batch
  * contract, determinism, frame-count bounds, payload pruning. */
class MultimodalSpec extends SparkSpec {

  import Multimodal._

  lazy val media = {
    import spark.implicits._
    val docs = Seq(
      (0L, "alpha beta"), (1L, "gamma"), (2L, "delta epsilon zeta"),
      (3L, "eta"), (4L, "theta iota"), (5L, "kappa"))
      .toDF("doc_id", "text")
    syntheticMedia(spark, docs).cache()
  }

  test("syntheticMedia: typed schema with opaque payload") {
    val m = media.collect().sortBy(_.media_id)
    assert(m.map(_.kind).toSeq === Seq("image", "audio", "video",
      "image", "audio", "video"))
    assert(m(0).payload === "alpha beta".getBytes("UTF-8"))
    assert(m(2).meta.n_frames === 3)
  }

  test("extractFeatures: deterministic, fixed-dim, content-sensitive") {
    val f1 = extractFeatures(spark, media).collect().sortBy(_.media_id)
    val f2 = extractFeatures(spark, media).collect().sortBy(_.media_id)
    assert(f1.length === 6)
    assert(f1.forall(_.feature.length === FeatureDim))
    // deterministic across runs
    f1.zip(f2).foreach { case (a, b) => assert(a.feature.toSeq === b.feature.toSeq) }
    // different payloads → different features
    assert(f1(0).feature.toSeq !== f1(1).feature.toSeq)
  }

  test("inBatches: bounded batches, order preserved, all rows processed") {
    var batches = List.empty[Int]
    val out = inBatches((1 to 10).iterator, 3) { b =>
      batches ::= b.size; b.map(_ * 2)
    }.toList
    assert(out === (1 to 10).map(_ * 2).toList)
    assert(batches.reverse === List(3, 3, 3, 1))
  }

  test("sampleFrames: only videos, stride respected, idx < n_frames") {
    val fs = sampleFrames(spark, media, stride = 2).collect()
    val byId = fs.groupBy(_.media_id)
    assert(byId.keySet === Set(2L, 5L)) // kinds cycle i/a/v
    // media 2 has n_frames=3 → frames 0,2; media 5 has n_frames=6 → 0,2,4
    assert(byId(2L).map(_.frame_idx).sorted.toSeq === Seq(0, 2))
    assert(byId(5L).map(_.frame_idx).sorted.toSeq === Seq(0, 2, 4))
    assert(fs.forall(_.frame_payload.length === 8))
  }

  test("imageStats: REAL PNG decode — exact dims, channels, luma") {
    import spark.implicits._
    def png(w: Int, h: Int, rgb: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val red = png(8, 4, 0xFF0000)   // luma = 0.299*255
    val gray = png(16, 16, 0x808080) // luma = 128
    val ds = Seq(
      Media(1L, "image", MediaMeta(8, 4, 3, 0, 0), red),
      Media(2L, "image", MediaMeta(16, 16, 3, 0, 0), gray),
      Media(3L, "image", MediaMeta(0, 0, 0, 0, 0), Array[Byte](1, 2, 3)), // corrupt
      Media(4L, "video", MediaMeta(0, 0, 0, 0, 9), red)) // filtered out
      .toDS()
    val out = Multimodal.imageStats(spark, ds).collect()
      .map(d => d.media_id -> d).toMap
    assert(out.keySet === Set(1L, 2L, 3L))
    assert(out(1L).width === 8 && out(1L).height === 4 && out(1L).channels === 3)
    assert(math.abs(out(1L).mean_luma - 0.299 * 255) < 1e-9)
    assert(out(2L).width === 16 && math.abs(out(2L).mean_luma - 128.0 * (0.299 + 0.587 + 0.114)) < 0.3)
    assert(!out(3L).decoded && out(3L).width === 0)
  }

  test("aHash: integer scalar model, downsample invariance, perturbation locality") {
    import spark.implicits._
    def grayImg(w: Int, h: Int, g: (Int, Int) => Int): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val v = g(x, y) & 0xFF
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      img
    }
    def pix(x: Int, y: Int): Int = (x * 13 + y * 31 + 7) % 256
    // scalar model: cells = pixels for an 8x8 input, mean = Σ/64 int div,
    // bit i (= y*8+x) set iff cell > mean, block k = bits [16k, 16k+16)
    val cells = for (y <- 0 until 8; x <- 0 until 8) yield pix(x, y).toLong
    val mean = cells.sum / 64
    val expected = Array.fill(4)(0)
    cells.zipWithIndex.foreach { case (c, i) =>
      if (c > mean) expected(i / 16) |= 1 << (i % 16)
    }
    assert(Multimodal.aHashBlocks(grayImg(8, 8, pix)).toSeq === expected.toSeq)
    // box-downsample invariance: 16x16 of uniform 2x2 cells = same hash
    val big = grayImg(16, 16, (x, y) => pix(x / 2, y / 2))
    assert(Multimodal.aHashBlocks(big).toSeq === expected.toSeq)
    // end-to-end through PNG encode + the Dataset decode path, with a
    // single-pixel perturbation: hamming distance stays local (≤ 2 bits:
    // the pixel's own bit plus at most a mean-boundary flip)
    def png(img: java.awt.image.BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val base = grayImg(8, 8, pix)
    val pert = grayImg(8, 8, (x, y) => if (x == 0 && y == 0) (pix(0, 0) + 1) % 256 else pix(x, y))
    val ds = Seq(
      Media(1L, "image", MediaMeta(8, 8, 3, 0, 0), png(base)),
      Media(2L, "image", MediaMeta(8, 8, 3, 0, 0), png(pert)),
      Media(3L, "image", MediaMeta(0, 0, 0, 0, 0), Array[Byte](9, 9)))
      .toDS()
    val out = Multimodal.imageAHash(spark, ds).collect().map(h => h.media_id -> h).toMap
    assert(out(1L).decoded && out(2L).decoded && !out(3L).decoded)
    assert(Seq(out(1L).b0, out(1L).b1, out(1L).b2, out(1L).b3) === expected.toSeq)
    val dist = Seq(out(1L).b0 ^ out(2L).b0, out(1L).b1 ^ out(2L).b1,
      out(1L).b2 ^ out(2L).b2, out(1L).b3 ^ out(2L).b3)
      .map(Integer.bitCount).sum
    assert(dist <= 2, s"perturbed hamming distance $dist")
  }

  test("extractFeatures: values are md5-derived on the exact 1/4096 grid") {
    // the q62 oracle recomputes these from md5(text) — pin the formula
    val f = extractFeatures(spark, media).collect().sortBy(_.media_id)
    val m = media.collect().sortBy(_.media_id)
    f.zip(m).foreach { case (feat, med) =>
      val h = {
        val d = java.security.MessageDigest.getInstance("MD5").digest(med.payload)
        ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
          ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
      }
      (0 until FeatureDim).foreach { dd =>
        val expected = ((h * (dd + 1) + 2654435761L * dd) % 4096L).toFloat / 4096f
        assert(feat.feature(dd) === expected, s"media ${med.media_id} dim $dd")
      }
    }
  }

  test("audioStats: REAL WAV decode — exact rate, channels, frames, duration") {
    import spark.implicits._
    val wav = synthWav(16000f, Array.tabulate(320)(i => (i * 100).toShort))
    val wav2 = synthWav(8000f, Array.tabulate(50)(_ => 0.toShort))
    val ds = Seq(
      Media(1L, "audio", MediaMeta(0, 0, 1, 16000, 0), wav),
      Media(2L, "audio", MediaMeta(0, 0, 1, 8000, 0), wav2),
      Media(3L, "audio", MediaMeta(0, 0, 0, 0, 0), Array[Byte](9, 9, 9)), // corrupt
      Media(4L, "image", MediaMeta(8, 8, 3, 0, 0), wav)) // filtered out
      .toDS()
    val out = Multimodal.audioStats(spark, ds).collect()
      .map(d => d.media_id -> d).toMap
    assert(out.keySet === Set(1L, 2L, 3L))
    assert(out(1L).decoded && out(1L).sample_rate === 16000 &&
      out(1L).channels === 1 && out(1L).frames === 320L)
    assert(math.abs(out(1L).duration_ms - 20.0) < 1e-12) // 320/16000 s
    assert(out(2L).frames === 50L && math.abs(out(2L).duration_ms - 6.25) < 1e-12)
    assert(!out(3L).decoded && out(3L).frames === 0L)
  }

  test("decodeAudioSamples: exact PCM round-trip; audioFeatures scalar model") {
    import spark.implicits._
    // extremes + sign flips: endianness or offset bugs cannot survive
    val samples = Array[Short](-32768, 32767, 0, -1, 1, 100, -100, 0)
    val wav = synthWav(8000f, samples)
    assert(Multimodal.decodeAudioSamples(wav).get.toSeq === samples.toSeq)
    assert(Multimodal.decodeAudioSamples(Array[Byte](1, 2, 3)).isEmpty)
    val ds = Seq(
      Media(1L, "audio", MediaMeta(0, 0, 1, 8000, 0), wav),
      Media(2L, "audio", MediaMeta(0, 0, 0, 0, 0), Array[Byte](9)) // corrupt
    ).toDS()
    val out = Multimodal.audioFeatures(spark, ds).collect()
      .map(f => f.media_id -> f).toMap
    val expSumSq = samples.map(s => s.toLong * s).sum
    val expZc = (1 until samples.length)
      .count(i => (samples(i) >= 0) != (samples(i - 1) >= 0))
    assert(out(1L).decoded && out(1L).frames === samples.length.toLong &&
      out(1L).sum_sq === expSumSq && out(1L).peak === 32768L &&
      out(1L).zero_cross === expZc.toLong)
    assert(!out(2L).decoded && out(2L).sum_sq === 0L)
  }

  test("spark.read.format(image): Spark's native image source works") {
    val dir = java.nio.file.Files.createTempDirectory("imgs")
    val img = new java.awt.image.BufferedImage(5, 7,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    javax.imageio.ImageIO.write(img, "png", dir.resolve("a.png").toFile)
    val df = spark.read.format("image").load(dir.toString)
    val r = df.select("image.width", "image.height", "image.nChannels").head()
    assert(r.getInt(0) === 5 && r.getInt(1) === 7)
  }

  test("mediaStats: payload column pruned from the scan") {
    val plan = mediaStats(media.toDF()).queryExecution.optimizedPlan
    // the aggregate's input must not carry the payload column
    val aggInput = plan.children.head.output.map(_.name)
    assert(!aggInput.contains("payload"), s"agg reads: $aggInput")
  }

  test("AVI container: parse(synth) returns the exact written fields") {
    for ((frames, w, h, us, seed) <- Seq((1, 16, 16, 33333, 0L),
        (7, 64, 48, 40000, 12345L), (25, 640, 480, 16667, -9L))) {
      val bytes = Multimodal.synthAvi(frames, w, h, us, seed)
      assert(new String(bytes, 0, 4, "US-ASCII") === "RIFF")
      assert(new String(bytes, 8, 4, "US-ASCII") === "AVI ")
      assert(bytes.length % 2 === 0, "RIFF chunks must pad to even length")
      val info = Multimodal.parseAvi(bytes).get
      assert(info === Multimodal.AviInfo(us, frames, w, h, frames),
        s"frames=$frames w=$w h=$h us=$us")
    }
  }

  test("AVI container: malformed inputs parse to None, not a crash") {
    assert(Multimodal.parseAvi(Array.emptyByteArray).isEmpty)
    assert(Multimodal.parseAvi("RIFFxxxxWAVE".getBytes("US-ASCII")).isEmpty)
    assert(Multimodal.parseAvi(Array.fill(64)(0x41.toByte)).isEmpty)
    // truncated mid-chunk: header magics intact, movi list cut short
    val full = Multimodal.synthAvi(5, 32, 32, 33333, 7L)
    val cut = java.util.Arrays.copyOf(full, full.length - 6)
    val p = Multimodal.parseAvi(cut)
    assert(p.isDefined && p.get.moviFrames <= 5,
      "truncation may lose trailing frames but must not crash or overcount")
  }

  test("AVI container: hostile chunk lengths terminate, never hang or throw") {
    // ADVICE r11: lengths are unvalidated signed LE32s — a negative or
    // near-Int.MaxValue length used to advance the walk cursor by <=0
    // (infinite executor loop) or overflow it negative (AIOOBE killing
    // the task). Both walkers must instead stop and return what parsed.
    def patched(src: Array[Byte], at: Int, v: Int): Array[Byte] = {
      val b = src.clone()
      var i = 0
      while (i < 4) { b(at + i) = ((v >> (8 * i)) & 0xFF).toByte; i += 1 }
      b
    }
    val base = Multimodal.synthMjpegAvi(3, 16, 16, 40000, 11L)
    val s = new String(base, "ISO-8859-1") // byte-preserving charset
    val frameLenAt = s.indexOf("00dc") + 4  // first frame chunk's clen
    val moviLenAt = s.indexOf("movi") - 4   // the movi LIST's len field
    assert(frameLenAt >= 4 && moviLenAt >= 0)
    for (bad <- Seq(-1, Int.MinValue, Int.MaxValue, Int.MaxValue - 4)) {
      val fb = patched(base, frameLenAt, bad)
      val p1 = Multimodal.parseAvi(fb) // must return, not hang/throw
      assert(p1.forall(_.moviFrames <= 3))
      assert(Multimodal.extractFrameChunks(fb).size <= 3)
      val lb = patched(base, moviLenAt, bad)
      val p2 = Multimodal.parseAvi(lb)
      assert(p2.forall(_.moviFrames <= 3))
      assert(Multimodal.extractFrameChunks(lb).size <= 3)
    }
    // sanity: the uncorrupted container still yields all 3 frames
    assert(Multimodal.extractFrameChunks(base).size === 3)
    assert(Multimodal.parseAvi(base).get.moviFrames === 3)
  }

  test("MJPEG: REAL per-frame pixel decode — dims exact, luma near planted color") {
    for ((frames, w, h, seed) <- Seq((2, 16, 16, 0L), (5, 48, 32, 321L),
        (3, 32, 16, -4L))) {
      val bytes = Multimodal.synthMjpegAvi(frames, w, h, 40000, seed)
      // container level agrees with the generic parser
      val info = Multimodal.parseAvi(bytes).get
      assert(info.moviFrames === frames && info.width === w && info.height === h)
      val chunks = Multimodal.extractFrameChunks(bytes)
      assert(chunks.size === frames)
      chunks.zipWithIndex.foreach { case (fb, i) =>
        // each chunk is a complete JPEG the JDK codec decodes
        assert((fb(0) & 0xFF) === 0xFF && (fb(1) & 0xFF) === 0xD8, "JPEG SOI")
        val dec = Multimodal.decodeImage(fb).get
        assert(dec.width === w && dec.height === h, s"frame $i dims")
        val rgb = Multimodal.frameRgb(seed, i)
        val expected = 0.299 * ((rgb >> 16) & 0xFF) +
          0.587 * ((rgb >> 8) & 0xFF) + 0.114 * (rgb & 0xFF)
        // JPEG is lossy: a solid color survives as a solid color but DC /
        // chroma quantization shifts it — ±8 luma catches a broken
        // encode/extract/decode while tolerating codec rounding
        assert(math.abs(dec.mean_luma - expected) <= 8.0,
          s"frame $i luma ${dec.mean_luma} vs planted $expected")
      }
    }
  }

  test("videoFrameStats: per-frame rows; malformed container observable") {
    import spark.implicits._
    val ok = Multimodal.Media(1L, "video", Multimodal.MediaMeta(16, 16, 0, 0, 3),
      Multimodal.synthMjpegAvi(3, 16, 16, 40000, 1L))
    val bad = Multimodal.Media(2L, "video", Multimodal.MediaMeta(0, 0, 0, 0, 0),
      Array.fill[Byte](32)(0x55))
    val notVideo = Multimodal.Media(3L, "image", Multimodal.MediaMeta(8, 8, 3, 0, 0),
      Array.emptyByteArray)
    val out = Multimodal.videoFrameStats(spark,
        spark.createDataset(Seq(ok, bad, notVideo)))
      .collect().sortBy(f => (f.media_id, f.frame_idx))
    assert(out.count(_.media_id == 1L) === 3)
    assert(out.filter(_.media_id == 1L).forall(f => f.decoded && f.width == 16))
    val badRows = out.filter(_.media_id == 2L)
    assert(badRows.length === 1 && !badRows.head.decoded &&
      badRows.head.frame_idx === -1, "container failure is one observable row")
    assert(!out.exists(_.media_id == 3L), "non-video rows filtered")
  }
}
