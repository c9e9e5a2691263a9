package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.serve.Serving

/** Serving-layer layout tests: bucketed co-located join (no exchange) and
  * hive-partition pruning (PartitionFilters reach the scan). */
class ServingSpec extends SparkSpec {

  test("bucketed tables join with no shuffle exchange") {
    val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val l = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    Serving.writeBucketed(o, "b_orders", "o_orderkey", 4)
    Serving.writeBucketed(l.withColumnRenamed("l_orderkey", "o_orderkey"),
      "b_lineitem", "o_orderkey", 4)
    val joined = spark.table("b_orders").join(spark.table("b_lineitem"), "o_orderkey")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle:\n${plan.take(1500)}")
    // and it still returns the right rows
    assert(joined.count() === l.count())
  }

  test("partitioned write → partition pruning in the scan") {
    val dir = Files.createTempDirectory("part").toString
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    Serving.writePartitioned(docs, s"$dir/docs_by_lang", Seq("lang"))
    val langs = docs.select("lang").distinct().count()
    assert(langs > 1, "fixture should have several langs")
    val pruned = spark.read.parquet(s"$dir/docs_by_lang")
      .filter(col("lang") === "en")
    val plan = pruned.queryExecution.executedPlan.toString
    val pf = plan.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(pf.contains("lang"), s"expected lang in PartitionFilters: $pf")
    assert(pruned.count() === docs.filter(col("lang") === "en").count())
  }

  test("registerViews: plain spark.sql works over the fixtures") {
    Serving.registerViews(spark, "/root/testdata/sf0.001")
    val n = spark.sql(
      "SELECT COUNT(*) FROM orders JOIN customer ON o_custkey = c_custkey")
      .head().getLong(0)
    assert(n > 0)
  }
}
