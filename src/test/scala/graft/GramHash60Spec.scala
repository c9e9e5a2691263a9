package graft

import org.apache.spark.sql.functions._

/** Pins [[graft.functions.GramHash60]] bit-for-bit against the portable
  * HOF formulation it replaces (the same expression the DuckDB oracles
  * keep using), including the null-element concat_ws semantics and the
  * short-input empty-array contract. */
class GramHash60Spec extends SparkSpec {

  private def portable(n: Int) = expr(
    s"""transform(sequence(0, size(ws) - $n),
         i -> cast(conv(substring(md5(concat_ws(' ', slice(ws, i + 1, $n))),
           1, 15), 16, 10) as bigint))""")

  test("gram_hash60 == the portable md5/conv HOF formulation, n in {3, 4, 5}") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val docs = Seq(
      "alpha beta gamma delta epsilon zeta",
      "the quick brown fox jumps over the lazy dog",
      "a b c",
      "Spark keeps CASE case sensitive",
      "unicode café naïve 中文 token mix")
      .toDF("text")
      .withColumn("ws", expr("regexp_extract_all(text, '[a-zA-Z]+', 0)"))
    Seq(3, 4, 5).foreach { n =>
      val rows = docs.filter(size(col("ws")) >= n)
        .select(expr(s"gram_hash60(ws, $n)").as("fast"),
          portable(n).as("slow"))
        .collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        assert(r.getSeq[Long](0) === r.getSeq[Long](1), s"n=$n parity")
      }
    }
  }

  test("gram_hash60: null words join as empty (concat_ws), short input is empty") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val withNull = Seq(1).toDF("x")
      .select(expr("array('a', cast(null as string), 'b')").as("ws"))
      .select(expr("gram_hash60(ws, 3)").as("fast"), portable(3).as("slow"))
      .collect().head
    assert(withNull.getSeq[Long](0) === withNull.getSeq[Long](1))
    val short = Seq(1).toDF("x")
      .select(expr("gram_hash60(array('only', 'two'), 3)").as("g"))
      .collect().head.getSeq[Long](0)
    assert(short.isEmpty, "fewer than n tokens yields an empty array")
  }

  test("gram_hash60 matches Portable.hash60 on single tokens (n = 1)") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val rows = Seq("alpha", "Beta", "café").toDF("w")
      .select(expr("element_at(gram_hash60(array(w), 1), 1)").as("fast"),
        graft.core.Portable.hash60(col("w")).as("slow"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("gram_hash60 stays inside WholeStageCodegen (no fallback span break)") {
    graft.functions.GraftFunctions.register(spark)
    // non-foldable input (range scan) so the optimizer can't collapse
    // the whole pipeline into a LocalTableScan
    val df = spark.range(100)
      .selectExpr("concat('tok', id, ' alpha beta gamma delta') as text")
      .selectExpr("gram_hash60(regexp_extract_all(text, '[a-zA-Z]+', 0), 3) as g")
      .filter(size(col("g")) > 0)
    import org.apache.spark.sql.execution.WholeStageCodegenExec
    val spans = df.queryExecution.executedPlan.collect {
      case w: WholeStageCodegenExec => w
    }
    assert(spans.nonEmpty, "expression must sit inside a codegen span")
    assert(df.count() === 100L)
  }
}
