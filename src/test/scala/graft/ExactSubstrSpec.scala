package graft

import org.apache.spark.sql.functions._

/** Scalar-model pins for the ExactSubstr span semantics (q207/q209) on
  * crafted micro-docs — the oracle gate proves cross-engine parity on
  * the fixture; this spec documents and pins the SEMANTICS themselves:
  * canonical-copy retention order, cross-doc vs within-doc duplication,
  * and overlap merging into maximal spans.
  */
class ExactSubstrSpec extends SparkSpec {

  private def spansOf(docs: Seq[(Long, String)]): Seq[(Long, Long, Long)] = {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val toks = docs.toDF("doc_id", "text")
      .select(col("doc_id"), split(col("text"), " ").as("tk"))
    graft.queries.DedupSim.exactSubstrSpans(toks, 10)
      .orderBy(col("doc_id"), col("s_tok"))
      .collect()
      .map(r => (r.getLong(0), r.getAs[Long]("s_tok"), r.getAs[Long]("e_tok")))
      .toSeq
  }

  private val ten = (1 to 10).map("t" + _).mkString(" ") // t1..t10

  test("cross-doc duplicate: the FIRST occurrence in (doc_id, pos) order survives") {
    // d1 and d2 share their first 10 tokens; d1 is canonical (lower id)
    val spans = spansOf(Seq(
      1L -> s"$ten k l",
      2L -> s"$ten x y"))
    assert(spans === Seq((2L, 1L, 10L)))
  }

  test("three-way duplicate: one canonical, every other occurrence excised") {
    val spans = spansOf(Seq(
      1L -> s"$ten k l",
      2L -> s"$ten x y",
      3L -> s"$ten p q"))
    assert(spans === Seq((2L, 1L, 10L), (3L, 1L, 10L)))
  }

  test("within-doc duplicate: the doc's own earlier copy is the canonical one") {
    // 20 tokens = t1..t10 twice; gram@11 duplicates gram@1 → span [11, 20]
    val spans = spansOf(Seq(1L -> s"$ten $ten"))
    assert(spans === Seq((1L, 11L, 20L)))
  }

  test("overlapping hits merge into ONE maximal span") {
    // d2 repeats d1's first ELEVEN tokens: gram hits at positions 1 AND 2,
    // whose [pos, pos+9] ranges overlap → a single [1, 11] span
    val eleven = (1 to 11).map("t" + _).mkString(" ")
    val spans = spansOf(Seq(
      1L -> s"$eleven l m",
      2L -> s"$eleven x y"))
    assert(spans === Seq((2L, 1L, 11L)))
  }

  test("disjoint duplicated regions stay separate spans") {
    // d2 carries d1's tokens 1-10 at its start and d1's tokens 21-30
    // after a unique middle gap wider than K → two spans
    val a = (1 to 10).map("a" + _).mkString(" ")
    val b = (1 to 10).map("b" + _).mkString(" ")
    val gap = (1 to 12).map("z" + _).mkString(" ")
    val spans = spansOf(Seq(
      1L -> s"$a $b",
      2L -> s"$a $gap $b"))
    assert(spans === Seq((2L, 1L, 10L), (2L, 23L, 32L)))
  }

  test("no duplication, or docs shorter than K, yield no spans") {
    assert(spansOf(Seq(
      1L -> (1 to 12).map("u" + _).mkString(" "),
      2L -> (1 to 12).map("v" + _).mkString(" "),
      3L -> "short doc")) === Seq.empty)
  }
}
