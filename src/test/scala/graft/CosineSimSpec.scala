package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** The native cosine_sim expression must be bit-identical to the
  * interpreted HOF formulation (the oracle's formula): same index-order
  * double accumulation, three independent accumulators. */
class CosineSimSpec extends SparkSpec {

  def hofCos(a: String, b: String): String = {
    def dot(x: String, y: String) =
      s"aggregate(zip_with($x, $y, (p, q) -> cast(p as double) * cast(q as double)), " +
        "cast(0.0 as double), (acc, v) -> acc + v)"
    s"${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)}))"
  }

  test("cosine_sim == HOF formula bit-for-bit on fixture embeddings") {
    GraftFunctions.register(spark)
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val both = e.crossJoin(broadcast(q))
      .select(col("vec_id"),
        expr("cosine_sim(embedding, qv)").as("native"),
        expr(hofCos("embedding", "qv")).as("hof"))
    val bad = both.filter(col("native") =!= col("hof")).count()
    assert(bad === 0L, s"$bad rows differ between native and HOF cosine")
  }

  test("cosine_sim on double arrays and known values") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT cosine_sim(array(1.0D, 0.0D), array(0.0D, 2.0D)) AS o, " +
        "cosine_sim(array(1.0D, 2.0D), array(2.0D, 4.0D)) AS p")
      .head()
    assert(r.getDouble(0) === 0.0)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-15)
  }

  test("cosine_sim null semantics match zip_with: length mismatch → NULL") {
    GraftFunctions.register(spark)
    // interpreted eval path (literal fold) and codegen path (over a DF)
    val r = spark.sql(
      "SELECT cosine_sim(array(1.0D, 2.0D), array(1.0D)) AS mismatch, " +
        "cosine_sim(array(0.0D, 0.0D), array(1.0D, 1.0D)) AS zeronorm")
      .head()
    assert(r.isNullAt(0), "length mismatch must be NULL")
    assert(r.getDouble(1).isNaN, "zero-norm is NaN (0/0), like the HOF")
    val df = spark.range(3).selectExpr(
      "cosine_sim(array(cast(id as double)), array(1.0D, 2.0D)) AS s")
    assert(df.collect().forall(_.isNullAt(0)))
  }

  test("cosine_sim participates in whole-stage codegen") {
    GraftFunctions.register(spark)
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val df = e.crossJoin(broadcast(q))
      .select(expr("cosine_sim(embedding, qv)").as("sim"))
    df.collect()
    // no Project outside a codegen span and no "Eval" fallback marker
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*("), plan)
  }
}
