package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Source/sink breadth: the serving tables are parquet, but the engine
  * round-trips CSV and JSON losslessly for interop (SURVEY §2.1 S3's text
  * sink generalized). */
class IoFormatsSpec extends SparkSpec {

  lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet").cache()

  test("CSV round-trip preserves rows (with header + escaping)") {
    val dir = Files.createTempDirectory("csv").toString
    docs.write.mode("overwrite").option("header", "true")
      .option("escape", "\"").csv(s"$dir/docs")
    val back = spark.read.option("header", "true")
      .schema(docs.schema).option("escape", "\"").csv(s"$dir/docs")
    assert(back.count() === docs.count())
    val a = docs.orderBy("doc_id").collect().map(_.toString).toSeq
    val b = back.orderBy("doc_id").collect().map(_.toString).toSeq
    assert(a === b)
  }

  test("JSON round-trip preserves rows") {
    val dir = Files.createTempDirectory("json").toString
    docs.write.mode("overwrite").json(s"$dir/docs")
    val back = spark.read.schema(docs.schema).json(s"$dir/docs")
    assert(back.orderBy("doc_id").collect().map(_.toString).toSeq ===
      docs.orderBy("doc_id").collect().map(_.toString).toSeq)
  }

  test("ranked text sink matches the reference's title\\tpr shape") {
    import spark.implicits._
    val dir = Files.createTempDirectory("txt").toString
    val pr = Seq(("a", 1.5), ("b", 0.5)).toDF("title", "pr")
    pr.orderBy(desc("pr")).select(concat_ws("\t", col("title"), col("pr")))
      .write.mode("overwrite").text(s"$dir/ranked")
    val lines = spark.read.text(s"$dir/ranked").collect().map(_.getString(0))
    assert(lines.forall(_.matches("""[ab]\t\d+\.\d+""")))
    assert(lines.toSet === Set("a\t1.5", "b\t0.5"))
  }
}
