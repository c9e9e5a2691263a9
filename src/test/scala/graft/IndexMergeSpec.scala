package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.corpus.WikiCorpus
import graft.index.InvertedIndex

/** Incremental index maintenance must be indistinguishable from a full
  * rebuild: merge(build(A, uncut), B, cutoff) == build(A ∪ B, cutoff),
  * postings order, offsets and df included. */
class IndexMergeSpec extends SparkSpec {

  val corpus = Seq(
    "<title>1</title> [[2]] [[4]] <text>alpha beta gamma</text>",
    "<title>2</title> [[1]] [[3]] <text>beta beta delta</text>",
    "<title>4</title> <text>gamma epsilon beta</text>")

  lazy val docs: DataFrame = {
    val f = Files.createTempFile("merge", ".txt")
    Files.writeString(f, corpus.mkString("\n") + "\n")
    WikiCorpus.ingest(spark, f.toString).cache()
  }

  private def canon(df: DataFrame) =
    df.collect().map { r =>
      (r.getString(0), r.getInt(1),
        r.getSeq[org.apache.spark.sql.Row](2).map { p =>
          (p.getString(0), p.getInt(1),
            p.getSeq[org.apache.spark.sql.Row](2).map(o => (o.getLong(0), o.getLong(1))))
        })
    }.sortBy(_._1).toSeq

  test("merge(build(A), B) == build(A ∪ B), postings and offsets included") {
    val a = docs.filter(col("title") =!= "2")
    val b = docs.filter(col("title") === "2")
    val merged = InvertedIndex.merge(
      InvertedIndex.build(a, dfCutoff = Int.MaxValue), b)
    assert(canon(merged) === canon(InvertedIndex.build(docs)))
  }

  test("cutoff applies to the MERGED df (a delta can push a term over)") {
    val a = docs.filter(col("title") === "1") // beta df=1 in A
    val b = docs.filter(col("title") =!= "1") // beta in both delta docs
    val merged = InvertedIndex.merge(
      InvertedIndex.build(a, dfCutoff = Int.MaxValue), b, dfCutoff = 3)
    val terms = merged.select("term").collect().map(_.getString(0)).toSet
    assert(!terms.contains("beta"), "beta reaches df=3 only after the merge")
    assert(terms.contains("gamma")) // df=2 < 3 survives
    assert(canon(merged) === canon(InvertedIndex.build(docs, dfCutoff = 3)))
  }

  test("empty delta is the identity (minus the cutoff re-application)") {
    val merged = InvertedIndex.merge(
      InvertedIndex.build(docs, dfCutoff = Int.MaxValue),
      docs.filter(col("title") === "no_such_title"))
    assert(canon(merged) === canon(InvertedIndex.build(docs)))
  }
}
