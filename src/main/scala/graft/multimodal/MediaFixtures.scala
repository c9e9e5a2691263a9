package graft.multimodal

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Materialized encoded-media fixtures (VERDICT r8 #1).
  *
  * Why: q64/q106 used to synthesize their PNG payloads with a per-doc
  * `ImageIO.write` INSIDE the timed operator, so the bench timed fixture
  * GENERATION alongside the operator under test (decode → stats/aHash →
  * blocked pairing). On real 100 TB data the media arrives already
  * encoded — generation is ingest, not the query — and the r8 bench showed
  * the cost concretely: q106 regressed 2.4× and q64 stayed bimodal purely
  * from encode-side JIT/codec noise in the timed region.
  *
  * This object materializes each synthetic media table ONCE per sf
  * directory as parquet (the same role TESTDATA.md's driver-generated
  * tables play for every other query) and the queries read it back. The
  * payload bytes are bit-identical to what the inline `.map` produced —
  * same generation arithmetic, same codec — so the q64/q106 oracle
  * predictions and result hashes are unchanged.
  *
  * Concurrency: generation writes to a temp dir and atomically renames
  * into place, so concurrent JVMs (bench child + Verify) converge on one
  * copy; the loser of the rename race deletes its temp dir and reads the
  * winner's. A JVM-level lock serializes in-process callers.
  */
object MediaFixtures {

  /** Cache root: repo-local by default (the bench/verify cwd), overridable
    * for tests. Lives outside git (see .gitignore). */
  private def cacheRoot: String =
    sys.env.getOrElse("GRAFT_MEDIA_CACHE", "fixture_cache/media")

  /** Cache key: sanitized sfDir path PLUS a content fingerprint of the
    * source `documents` table (row count + max doc_id) — if the testdata
    * at the same path is ever regenerated with different ids/counts, the
    * key changes and fixtures regenerate instead of silently serving a
    * stale corpus (ADVICE r9 #2). The fingerprint agg is computed once
    * per (JVM, sfDir) — the bench warmup's `ensureAll` absorbs it, so no
    * timed region pays the probe scan. */
  private val fpCache = new java.util.concurrent.ConcurrentHashMap[String, String]
  private def keyOf(spark: SparkSession, sfDir: String): String = {
    val fp = fpCache.computeIfAbsent(sfDir, { _ =>
      val r = Tables.load(spark, sfDir, "documents")
        .agg(count(lit(1)), max(col("doc_id"))).head
      s"${r.getLong(0)}-${r.getLong(1)}"
    })
    sfDir.replaceAll("[^A-Za-z0-9._-]", "_") + "-" + fp
  }

  private val lock = new Object

  /** Ensure `name` exists for `sfDir`, generating via `gen` on first use;
    * returns the parquet path. The existence probe is the `_SUCCESS`
    * marker INSIDE an atomically-renamed directory, so a half-written
    * fixture is never observed. */
  private def ensure(spark: SparkSession, sfDir: String, name: String)(
      gen: => Dataset[Multimodal.Media]): String = lock.synchronized {
    val dir = Paths.get(cacheRoot, keyOf(spark, sfDir), name + ".parquet")
    if (!Files.exists(dir.resolve("_SUCCESS"))) {
      val tmp = dir.resolveSibling(
        name + ".tmp-" + java.util.UUID.randomUUID().toString.take(8))
      gen.write.mode("overwrite").parquet(tmp.toString)
      try Files.move(tmp, dir, StandardCopyOption.ATOMIC_MOVE)
      catch {
        case e @ (_: java.nio.file.FileAlreadyExistsException |
            _: java.nio.file.FileSystemException) =>
          // Probe the MARKER, not the directory (ADVICE r9 #3): a dir
          // without _SUCCESS is a partial/corrupt leftover, not a race
          // winner — retrying against it would regenerate-and-discard
          // forever while serving the unvalidated dir.
          if (Files.exists(dir.resolve("_SUCCESS"))) {
            // lost a cross-JVM race — the winner's copy is equivalent
            // (deterministic generation); drop ours
            deleteRecursively(tmp)
          } else {
            deleteRecursively(dir)
            try Files.move(tmp, dir, StandardCopyOption.ATOMIC_MOVE)
            catch { case _: Throwable => deleteRecursively(tmp); throw e }
          }
      }
    }
    dir.toString
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    if (Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      val walk = Files.walk(p)
      val paths =
        try walk.iterator().asScala.toSeq.reverse
        finally walk.close() // ADVICE r9 #5: unclosed walk leaks a dir handle
      paths.foreach(Files.delete)
    }
  }

  /** q64 fixture: one deterministic solid-color PNG per document
    * (w = id%64+8, h = id%48+8, rgb = (id·2654435) mod 2^24), encoded by
    * the JDK codec on executors — once, at fixture-materialization time. */
  def imagePng(spark: SparkSession, sfDir: String): Dataset[Multimodal.Media] = {
    import spark.implicits._
    val path = ensure(spark, sfDir, "image_png") {
      Tables.load(spark, sfDir, "documents")
        .select(col("doc_id")).as[Long]
        .repartition(spark.sparkContext.defaultParallelism)
        .map { id =>
          val w = (id % 64 + 8).toInt
          val h = (id % 48 + 8).toInt
          val img = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          val rgb = ((id * 2654435L) % 0x1000000L).toInt
          var y = 0
          while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          Multimodal.Media(id, "image",
            Multimodal.MediaMeta(w, h, 3, 0, 0), bos.toByteArray)
        }
    }
    spark.read.parquet(path).as[Multimodal.Media]
  }

  /** q106 fixture: one 8×8 grayscale PNG per document, plus an id-shifted
    * near-dup copy (pixel (0,0) nudged +1) for every doc_id % 37 == 0 —
    * the planted-pair discipline, encoded once at materialization time. */
  def ahashPng(spark: SparkSession, sfDir: String): Dataset[Multimodal.Media] = {
    import spark.implicits._
    val path = ensure(spark, sfDir, "ahash_png") {
      val docs = Tables.load(spark, sfDir, "documents").select(col("doc_id"))
      docs
        .select(col("doc_id").as("media_id"), col("doc_id").as("src_id"),
          lit(0).as("perturb"))
        .unionByName(docs.filter(col("doc_id") % 37 === 0)
          .select((col("doc_id") + 10000000L).as("media_id"),
            col("doc_id").as("src_id"), lit(1).as("perturb")))
        .as[(Long, Long, Int)]
        .repartition(spark.sparkContext.defaultParallelism)
        .map { case (mid, sid, pert) =>
          val h = Multimodal.md5Hash32(s"img:$sid".getBytes("UTF-8"))
          val img = new java.awt.image.BufferedImage(8, 8,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 8) {
              val base = (((h >> (8 * ((x + y) % 4))) + 13 * x + 31 * y) % 256).toInt
              val g = if (pert == 1 && x == 0 && y == 0) (base + 1) % 256 else base
              img.setRGB(x, y, (g << 16) | (g << 8) | g)
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          Multimodal.Media(mid, "image", Multimodal.MediaMeta(8, 8, 3, 0, 0),
            bos.toByteArray)
        }
    }
    spark.read.parquet(path).as[Multimodal.Media]
  }

  /** q125 fixture: one MJPEG AVI per document — frames = id%5+2 real
    * ImageIO-encoded JPEG frames of w = 16·(id%3+1) × h = 16·(id%2+1),
    * each a solid color from `Multimodal.frameRgb(id, frame)` — encoded
    * once at materialization time (encode is ingest, decode is the
    * operator under test). */
  def mjpegAvi(spark: SparkSession, sfDir: String): Dataset[Multimodal.Media] = {
    import spark.implicits._
    val path = ensure(spark, sfDir, "mjpeg_avi") {
      Tables.load(spark, sfDir, "documents")
        .select(col("doc_id")).as[Long]
        .repartition(spark.sparkContext.defaultParallelism)
        .map { id =>
          val frames = (id % 5 + 2).toInt
          val w = (16 * (id % 3 + 1)).toInt
          val h = (16 * (id % 2 + 1)).toInt
          Multimodal.Media(id, "video",
            Multimodal.MediaMeta(w, h, 0, 0, frames),
            Multimodal.synthMjpegAvi(frames, w, h, 40000, id))
        }
    }
    spark.read.parquet(path).as[Multimodal.Media]
  }

  /** q65 fixture: one deterministic 16-bit mono PCM WAV per document
    * (rate = 8000 + id%4·4000, frames = id%400+50, sample i =
    * (id·31 + i·17) % 65536 − 32768), encoded by javax.sound.sampled once
    * at materialization time — encode is ingest, decode is the operator
    * (the same r8 discipline the PNG fixtures follow). */
  def audioWav(spark: SparkSession, sfDir: String): Dataset[Multimodal.Media] = {
    import spark.implicits._
    val path = ensure(spark, sfDir, "audio_wav") {
      Tables.load(spark, sfDir, "documents")
        .select(col("doc_id")).as[Long]
        .repartition(spark.sparkContext.defaultParallelism)
        .map { id =>
          val rate = (8000 + (id % 4) * 4000).toFloat
          val nframes = (id % 400 + 50).toInt
          val samples = Array.tabulate(nframes)(i =>
            ((id * 31 + i * 17) % 65536 - 32768).toShort)
          Multimodal.Media(id, "audio",
            Multimodal.MediaMeta(0, 0, 1, rate.toInt, 0),
            Multimodal.synthWav(rate, samples))
        }
    }
    spark.read.parquet(path).as[Multimodal.Media]
  }

  /** Pre-materialize every fixture for `sfDir` — the bench warmup calls
    * this so generation cost can never land inside a timed query. */
  def ensureAll(spark: SparkSession, sfDir: String): Unit = {
    imagePng(spark, sfDir)
    ahashPng(spark, sfDir)
    mjpegAvi(spark, sfDir)
    audioWav(spark, sfDir)
    ()
  }
}
