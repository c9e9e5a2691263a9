package graft.corpus

import org.apache.hadoop.io.{LongWritable, Text}
import org.apache.hadoop.mapreduce.lib.input.TextInputFormat
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Wiki-style corpus ingestion with positional fidelity (SURVEY.md §2.1 S1,
  * §2.2 P1–P4).
  *
  * The reference consumes text files with ONE document per line,
  * `<title>T</title> … [[link]] … <text …>body</text>`, and the line's byte
  * offset is USED AS DATA — it becomes the posting's line locator
  * (/root/reference/src/main/scala/invertedIndex.scala:52). `spark.read.text`
  * does not expose byte offsets, so ingestion bridges through
  * `newAPIHadoopFile[TextInputFormat]`, whose record key IS the line's byte
  * offset — the same contract the reference relies on. The reference then
  * truncates the offset to Int (a >2 GB overflow bug,
  * invertedIndex.scala:52); we keep Long end-to-end (SURVEY §1.4 #9).
  *
  * Extraction (P1/P2) is pure `regexp_extract(_all)` column work —
  * codegen'd, pushdown-friendly. Body extraction and tokenization need match
  * POSITIONS, which the built-in regex functions drop, so P3/P4 are two small
  * Scala UDFs applied once per document at ingest; everything downstream is
  * columnar again. (Upgrade path: a codegen'd Catalyst Expression, but these
  * run once per ingest, not per query — not the hot path.)
  *
  * Scale notes (100 TB): the Hadoop bridge splits files by HDFS block, so
  * ingest parallelism is data-sized, not file-count-sized. The parsed docs
  * table is persisted as Parquet (columnar, splittable) and every downstream
  * stage reads only the columns it needs.
  */
object WikiCorpus {

  /** One parsed document. `body_off` is the char offset of the body within
    * the line; token char offsets are relative to the line start, exactly
    * like the reference (invertedIndex.scala:46,52). */
  final case class Doc(title: String, line_offset: Long, line: String,
      links: Seq[String], body_off: Int, body: String)

  private val TitleRe = "<title>([^<]+)</title>"
  private val LinkRe = "\\[\\[([^\\]]+)\\]\\]"
  // First `<text …>body</text>` span; attrs bounded at 30 chars like the
  // reference's lookbehind (invertedIndex.scala:43).
  private val BodyRe = java.util.regex.Pattern.compile("<text[^>]{0,30}>([^<]+)</text>")
  private val TokenRe = java.util.regex.Pattern.compile("[a-zA-Z]+")

  /** P3: first body match with its start offset (group start = offset of the
    * body text itself, matching the reference's lookbehind-based m.start). */
  def extractBody(line: String): Option[(Int, String)] = {
    val m = BodyRe.matcher(line)
    if (m.find()) Some((m.start(1), m.group(1))) else None
  }

  /** P4: all `[a-zA-Z]+` tokens of `body` with char offsets relative to the
    * LINE start (bodyOff + in-body match start). Case-sensitive, no
    * stemming (invertedIndex.scala:43-52). */
  def tokenize(body: String, bodyOff: Int): Seq[(String, Int)] = {
    if (body == null) return Seq.empty
    val m = TokenRe.matcher(body)
    val out = Seq.newBuilder[(String, Int)]
    while (m.find()) out += ((m.group(), bodyOff + m.start()))
    out.result()
  }

  private val bodyUdf = udf { line: String =>
    extractBody(line).map { case (off, b) => (off, b) }
  }

  /** S1: DataFrame(line_offset: long, line: string) with real byte offsets. */
  def readWithOffsets(spark: SparkSession, path: String): DataFrame = {
    val rdd = spark.sparkContext
      .newAPIHadoopFile(path, classOf[TextInputFormat],
        classOf[LongWritable], classOf[Text])
      .map { case (off, text) => (off.get(), text.toString) }
    spark.createDataFrame(rdd).toDF("line_offset", "line")
  }

  /** Full ingest: raw lines → docs(title, line_offset, line, links,
    * body_off, body). Lines without a title are dropped (the reference logs
    * and skips them, pageRank.scala:151). */
  def parse(lines: DataFrame): DataFrame = {
    lines
      .withColumn("title", trim(regexp_extract(col("line"), TitleRe, 1)))
      .filter(length(col("title")) > 0)
      .withColumn("links",
        expr(s"transform(regexp_extract_all(line, '${LinkRe.replace("\\", "\\\\")}', 1), x -> trim(x))"))
      .withColumn("b", bodyUdf(col("line")))
      .withColumn("body_off", coalesce(col("b._1"), lit(-1)))
      .withColumn("body", col("b._2"))
      .select("title", "line_offset", "line", "links", "body_off", "body")
  }

  def ingest(spark: SparkSession, path: String): DataFrame =
    parse(readWithOffsets(spark, path))

  /** Typed surface: the same pipeline as a Dataset[Doc] for callers that
    * want compile-time field safety (encoder-backed, same physical plan). */
  def ingestDS(spark: SparkSession, path: String): org.apache.spark.sql.Dataset[Doc] = {
    import spark.implicits._
    ingest(spark, path).as[Doc]
  }
}
