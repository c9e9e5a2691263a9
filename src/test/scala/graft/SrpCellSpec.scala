package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions
import graft.similarity.Ivf

/** The fused srp_cell expression must be bit-identical to the unfused
  * per-plane formulation it replaced (nbits separate ordered left-fold dot
  * products over element_at) and to the driver-side Ivf.cellOf — all three
  * accumulate each plane's dot in element-index order in double. */
class SrpCellSpec extends SparkSpec {

  /** The pre-fusion formulation: per-plane string-built dot + sign bit. */
  private def unfusedCell(vecCol: String, nbits: Int, dims: Int) =
    (0 until nbits).map { j =>
      val p = Ivf.plane(j, dims)
      val dot = (0 until dims)
        .map(d => s"(${p(d)}.0D * cast(element_at($vecCol, ${d + 1}) as double))")
        .mkString(" + ")
      expr(s"cast(($dot) > 0 as int) * ${1 << j}")
    }.reduce(_ + _)

  test("srp_cell == unfused per-plane formulation on fixture embeddings") {
    GraftFunctions.register(spark)
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val both = e.select(col("vec_id"),
      expr(s"srp_cell(embedding, ${Ivf.DefaultBits}, ${Ivf.DefaultDims})").as("fused"),
      unfusedCell("embedding", Ivf.DefaultBits, Ivf.DefaultDims).as("unfused"))
    val bad = both.filter(col("fused") =!= col("unfused")).count()
    assert(bad === 0L, s"$bad rows differ between fused and unfused srp_cell")
  }

  test("srp_cell agrees with the driver-side Ivf.cellOf") {
    GraftFunctions.register(spark)
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val rows = e.limit(20).select(col("vec_id"), col("embedding"),
      expr(s"srp_cell(embedding, ${Ivf.DefaultBits}, ${Ivf.DefaultDims})").as("cell"))
      .collect()
    rows.foreach { r =>
      val v = r.getSeq[Float](1)
      assert(r.getInt(2) === Ivf.cellOf(v), s"vec_id ${r.getLong(0)}")
    }
  }

  test("srp_cell null semantics mirror element_at: short vector / null element → NULL") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT srp_cell(array(1.0D, 2.0D), 4, 3) AS short, " +
        "srp_cell(array(1.0D, CAST(NULL AS DOUBLE), 3.0D), 4, 3) AS hole, " +
        "srp_cell(array(1.0D, -2.0D, 0.5D), 4, 3) AS ok")
      .head()
    assert(r.isNullAt(0), "vector shorter than dims must be NULL")
    assert(r.isNullAt(1), "null element inside the window must be NULL")
    assert(!r.isNullAt(2))
    // codegen path over a DF, not just the literal-fold eval path
    val df = spark.range(3).selectExpr(
      "srp_cell(array(cast(id as double)), 4, 3) AS c")
    assert(df.collect().forall(_.isNullAt(0)))
  }

  test("srp_cell participates in whole-stage codegen") {
    GraftFunctions.register(spark)
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val df = e.select(
      expr(s"srp_cell(embedding, ${Ivf.DefaultBits}, ${Ivf.DefaultDims})").as("cell"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*("), plan)
  }
}
