package graft

import org.apache.spark.sql.functions._
import graft.queries.TextOps

/** Pins q127's corpus-frequency boilerplate removal: stripping must be
  * SURGICAL (exactly the over-threshold segments go, position order of the
  * survivors is preserved), threshold-exact (df == thr-1 stays), and total
  * (a document that is pure boilerplate survives as an empty row, not a
  * dropped one — a training pipeline must see what it deleted).
  */
class BoilerplateStripSpec extends SparkSpec {

  import org.apache.spark.sql.DataFrame

  // Segment unit of 4 tokens for readable fixtures; threshold 3.
  private val Unit4 = 4
  private val Thr = 3L

  private val banner = "accept all cookies now" // planted in 3 docs ⇒ df=3 ⇒ dropped
  private val rare = "this appears twice only"  // planted in 2 docs ⇒ df=2 ⇒ kept

  private def strip(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    TextOps.boilerplateStrip(rows.toDF("doc_id", "text"), Unit4, Thr)
  }

  private def row(df: DataFrame, id: Long): (Long, Long, Long, String) = {
    val r = df.filter(col("doc_id") === id).collect().head
    (r.getAs[Long]("n_segs"), r.getAs[Long]("kept_segs"),
      r.getAs[Long]("dropped_segs"), r.getAs[String]("clean_hash"))
  }

  private def md5Of(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    d.map("%02x".format(_)).mkString
  }

  test("strips exactly the over-threshold segment; survivors keep position order") {
    val unique = Seq(
      "alpha beta gamma delta", "epsilon zeta eta theta",
      "iota kappa lambda mu")
    // banner sits at segment 1 (middle) of docs 0..2; doc 3 is clean.
    val docs = (0L to 2L).map(i =>
      (i, s"${unique(i.toInt)} $banner t${i}a t${i}b t${i}c t${i}d")) :+
      (3L, "nu xi omicron pi rho sigma tau upsilon")
    val out = strip(docs)
    for (i <- 0L to 2L) {
      val (n, kept, dropped, h) = row(out, i)
      assert(n == 3 && kept == 2 && dropped == 1)
      // reassembly = the doc minus the banner, original order
      assert(h == md5Of(s"${unique(i.toInt)} t${i}a t${i}b t${i}c t${i}d"))
    }
    val (n3, kept3, dropped3, h3) = row(out, 3L)
    assert(n3 == 2 && kept3 == 2 && dropped3 == 0)
    assert(h3 == md5Of("nu xi omicron pi rho sigma tau upsilon"))
  }

  test("df == thr - 1 is NOT boilerplate (threshold is exact)") {
    val docs = Seq(
      (0L, s"$rare alpha beta gamma delta"),
      (1L, s"$rare epsilon zeta eta theta"),
      (2L, "iota kappa lambda mu"))
    val out = strip(docs)
    assert(out.agg(sum(col("dropped_segs"))).collect().head.getLong(0) == 0L)
  }

  test("a document that is pure boilerplate survives as an empty rewrite") {
    val docs = (0L to 3L).map(i => (i, banner)) // df=4 ≥ 3: all segments drop
    val out = strip(docs)
    for (i <- 0L to 3L) {
      val (n, kept, dropped, h) = row(out, i)
      assert(n == 1 && kept == 0 && dropped == 1)
      assert(h == md5Of(""))
    }
    assert(out.count() == 4)
  }

  test("trailing partial segments participate like full ones") {
    // 6 tokens at unit 4 ⇒ segments [t1..t4], [t5 t6]; the short tail is a
    // countable, droppable unit of its own.
    val tail = "end bit"
    val docs = (0L to 2L).map(i => (i, s"w${i}a w${i}b w${i}c w${i}d $tail"))
    val out = strip(docs)
    for (i <- 0L to 2L) {
      val (n, kept, dropped, h) = row(out, i)
      assert(n == 2 && kept == 1 && dropped == 1)
      assert(h == md5Of(s"w${i}a w${i}b w${i}c w${i}d"))
    }
  }
}
