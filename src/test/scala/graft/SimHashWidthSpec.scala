package graft

import org.apache.spark.sql.functions._
import graft.queries.DedupSim

/** Pins q34's widened blocking configuration (VERDICT r11 #2): the 32-bit
  * 4×8-bit and 64-bit 4×16-bit SimHash pipelines must AGREE on planted
  * near-duplicates — widening grows the bucket space (1,024 → 262,144) to
  * kill the n²/|buckets| candidate term, it must not change which
  * near-dups are found. Also pins the signed-64-bit mechanics the DuckDB
  * oracle mirrors (bit-63 assembly, shift+mask block extraction) and
  * q112's blocking-k scale rule (VERDICT r11 #3).
  */
class SimHashWidthSpec extends SparkSpec {

  // A corpus with PLANTED structure: 3 exact-dup pairs (hamming 0 at any
  // width), plus unrelated docs whose vocabularies are disjoint enough
  // that no cross pair is a near-dup. Repeated terms give each doc a
  // stable tf-weighted signature.
  private def docs = {
    import spark.implicits._
    val topics = Seq(
      "alpha beta gamma delta epsilon zeta eta theta",
      "granite basalt quartz feldspar mica schist gneiss marble",
      "sonata concerto symphony prelude fugue etude nocturne waltz",
      "tundra taiga steppe savanna prairie desert chaparral wetland",
      "proton neutron electron quark lepton boson hadron meson",
      "whisk simmer braise saute poach roast grill ferment")
    val base = topics.zipWithIndex.map { case (t, i) =>
      (i.toLong, (t + " ") * 6 + t.split(" ").head * 3)
    }
    val dups = Seq(0L, 2L, 4L).map(i => (100L + i, base(i.toInt)._2))
    (base ++ dups).toDF("doc_id", "text")
  }

  private def pairs(bits: Int): Set[(Long, Long)] =
    DedupSim.simhashCandFrom(docs, bits)
      .withColumn("hamming", expr("bit_count(ha ^ hb)").cast("long"))
      .filter(col("hamming") <= 3)
      .select(col("id_a"), col("id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("both widths find exactly the planted near-dup pairs") {
    val planted = Set((0L, 100L), (2L, 102L), (4L, 104L))
    val p32 = pairs(32)
    val p64 = pairs(64)
    assert(p32 == planted, s"32-bit found $p32")
    assert(p64 == planted, s"64-bit found $p64")
  }

  test("64-bit signatures use the full width (high 32 bits are not dead)") {
    // If the chars-9..16 hash were wired wrong (e.g. h2 = h), the top 32
    // bits would mirror the bottom ones or sit constant; require at least
    // one signature with a set bit above 31 that isn't sign-noise.
    val sigs = DedupSim.simhashSigFrom(docs, 64)
      .select(col("simhash")).collect().map(_.getLong(0))
    assert(sigs.exists(s => (s >>> 32) != 0L && (s >>> 32) != 0xFFFFFFFFL),
      s"no signature exercises the high word: ${sigs.mkString(",")}")
    // and the 32-bit sig is NOT just the low word of the 64-bit sig's
    // tf-sums by construction — but the low 32 bits must match it, since
    // bits 0-31 come from the identical md5[1..8] hash at both widths
    val s32 = DedupSim.simhashSigFrom(docs, 32)
      .select(col("doc_id"), col("simhash")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    DedupSim.simhashSigFrom(docs, 64)
      .select(col("doc_id"), col("simhash")).collect()
      .foreach(r => assert((r.getLong(1) & 0xFFFFFFFFL) === s32(r.getLong(0)),
        s"doc ${r.getLong(0)}: low word diverges between widths"))
  }

  test("64-bit block extraction is exact for signed signatures") {
    // shift+mask on a negative sig must extract true bit ranges — the
    // property the pigeonhole guarantee rests on. Model check against
    // Scala's own bit ops via a one-row frame.
    import spark.implicits._
    val hostile = Seq(-1L, Long.MinValue, -65537L, 0x8000FFFF0000AAAL)
    val df = hostile.toDF("simhash")
      .select(col("simhash"), explode(expr("sequence(0, 3)")).as("blk"))
      .withColumn("bval", expr("shiftright(simhash, blk * 16) & 65535"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    df.foreach { case (s, blk, bval) =>
      assert(bval === ((s >> (blk * 16)) & 0xFFFFL), s"sig $s blk $blk")
    }
  }

  test("catalog: 32-bit blocking survives only as q34's A/B control") {
    // VERDICT r12 #1 done-criterion: no simhashCand call site outside q34
    // defaults to (or names) the 32-bit/1024-bucket space whose candidate
    // term measured 1.76x linear. `bits` has no default, so every call
    // site in the catalog names a width; this pin asserts exactly one of
    // them is 32 (the A/B control) and the rest are the scale config.
    val src = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("src/main/scala/graft/queries/DedupSim.scala")),
      java.nio.charset.StandardCharsets.UTF_8)
    val widths = """simhashCand(?:From)?\((?:s, dir|pd|docs), ([^)]+)\)""".r
      .findAllMatchIn(src).map(_.group(1).trim).toList
    assert(widths.nonEmpty, "no simhashCand call sites found — regex drifted from the source")
    val thirtyTwo = widths.filter(_ == "bits = 32")
    assert(thirtyTwo.size === 1,
      s"expected exactly one 32-bit call site (q34's control), got $widths")
    val rest = widths.filterNot(_ == "bits = 32")
    assert(rest.forall(w => w == "ScaleBits" || w == "bits = 64"),
      s"non-scale width in catalog: $widths")
    assert(DedupSim.ScaleBits === 64)
  }

  test("blocked-pair widths flow from ONE policy point (VERDICT r13 #7)") {
    import graft.core.BlockPolicy
    // simhash width: the catalog constant IS the policy constant
    assert(DedupSim.ScaleBits === BlockPolicy.SimHashScaleBits)
    // the SRP band shape every oracle CASE mirrors
    assert(BlockPolicy.srpBits(0L) === 4)
    assert(BlockPolicy.srpBits(1999L) === 4)
    assert(BlockPolicy.srpBits(2000L) === 6)
    assert(BlockPolicy.srpBits(9999L) === 6)
    assert(BlockPolicy.srpBits(10000L) === 10)
    // the ER refinement band q154 and its oracle share
    assert(!BlockPolicy.refineNameBlocks(99999L))
    assert(BlockPolicy.refineNameBlocks(100000L))
    // the exact-eval sampling band (q122, r14 #3): fixtures run unsampled
    assert(BlockPolicy.exactEvalFraction(500L) === 1.0)   // all fixture sfs
    assert(BlockPolicy.exactEvalFraction(2000L) === 1.0)  // budget boundary
    assert(BlockPolicy.exactEvalFraction(2200L) === 2000.0 / 2200.0) // sf0.1
    assert(BlockPolicy.exactEvalFraction(22000L) === 2000.0 / 22000.0) // sf1
    // sampled doc count stays ~constant => quadratic term stops growing
    assert(BlockPolicy.exactEvalFraction(1000000L) * 1000000L === 2000.0)
    val src = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("src/main/scala/graft/queries/DedupSim.scala")),
      java.nio.charset.StandardCharsets.UTF_8)
    // every SRP pair-space site derives its width from the policy — and
    // the sweep covers ALL of src/main/scala (ADVICE r14: a consumer in
    // another file passing a literal width must not escape the gate)
    val cellWidthRe = """Ivf\.cellCol\("[^"]+",\s*([^,]+),""".r
    val allMain = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get("src/main/scala"))
        .iterator().asScala
        .filter(_.toString.endsWith(".scala"))
        .map(p => p.toString -> new String(java.nio.file.Files.readAllBytes(p),
          java.nio.charset.StandardCharsets.UTF_8))
        .toList
    }
    val cellWidths = allMain.flatMap { case (path, text) =>
      cellWidthRe.findAllMatchIn(text).map(m => path -> m.group(1).trim)
    }
    assert(cellWidths.nonEmpty, "no cellCol call sites found — regex drifted")
    assert(cellWidths.forall(_._2 == "bits"),
      s"cellCol site with a non-policy width: $cellWidths")
    assert("""BlockPolicy\.srpBits""".r.findAllIn(src).size >= 3,
      "q36/q136/q161 must all band via BlockPolicy.srpBits")
    assert(src.contains("BlockPolicy.refineNameBlocks"),
      "q154 must band via BlockPolicy.refineNameBlocks")
    // and the oracle mirrors carry the same thresholds
    assert(src.contains("FROM cnt) >= 10000") && src.contains("FROM cnt) >= 2000"),
      "shared SRP CASE mirror lost its policy thresholds")
    assert(src.contains("FROM pcnt) >= 100000"),
      "q154 oracle lost its refinement threshold")
  }

  test("q112 blocking-k scale rule: fixture scales stay at the oracle's k") {
    assert(DedupSim.semdedupK(22L) === 4)     // sf0.001
    assert(DedupSim.semdedupK(220L) === 4)    // sf0.01 (the oracle gate)
    assert(DedupSim.semdedupK(2200L) === 4)   // sf0.1 (bench comparability)
    assert(DedupSim.semdedupK(22000L) === 44) // sf1: scaled blocking
    assert(DedupSim.semdedupK(2200000L) === 4400)
  }
}
