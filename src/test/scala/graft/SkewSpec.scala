package graft

import org.apache.spark.sql.functions._
import graft.core.Skew

/** Salting must be pure routing: identical results to the unsalted
  * operator, on data with a deliberately hot key. */
class SkewSpec extends SparkSpec {

  lazy val skewed = {
    import spark.implicits._
    // key 0 holds 90% of rows (the hot key), keys 1..9 share the rest
    (0 until 10000).map(i => (if (i % 10 == 0) (i % 90) + 10 else 0, i.toLong))
      .toDF("k", "v")
  }

  lazy val dim = {
    import spark.implicits._
    (0 until 100).map(k => (k, s"name_$k")).toDF("k", "name")
  }

  test("saltedJoin == plain join on hot-keyed data") {
    val plain = skewed.join(dim, Seq("k"))
      .select("k", "v", "name").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2))).sorted
    val salted = Skew.saltedJoin(skewed, dim, "k", saltFactor = 8)
      .select("k", "v", "name").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2))).sorted
    assert(salted.length === plain.length)
    assert(salted.toSeq === plain.toSeq)
  }

  test("saltedJoin spreads the hot key across partitions") {
    val salted = Skew.saltedJoin(skewed, dim, "k", saltFactor = 8)
    // the pre-join exchange hashes on (k, __salt): hot key 0 must land in
    // >1 distinct salt bucket
    val buckets = skewed
      .withColumn("__salt",
        pmod(xxhash64(skewed.columns.map(col): _*), lit(8L)).cast("int"))
      .filter(col("k") === 0).select("__salt").distinct().count()
    assert(buckets > 1, s"hot key used only $buckets salt bucket(s)")
    assert(salted.count() === skewed.join(dim, Seq("k")).count())
  }

  test("saltedJoinHot == plain join; only listed keys salt; cold path is replication-free") {
    import spark.implicits._
    // both sides carry the hot key 0 heavily — the q121 blocked-pair
    // shape, where a hot cell's pair count is |A_c| × |B_c|
    val b2 = (0 until 2000).map(i => (if (i % 10 == 0) (i % 90) + 10 else 0, i.toLong))
      .toDF("k", "w")
    val hot = Seq(0).toDF("k")
    val plain = skewed.join(b2, Seq("k"))
      .select("k", "v", "w").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sorted
    val guarded = Skew.saltedJoinHot(skewed, b2, "k", saltFactor = 8, hotKeys = hot)
      .select("k", "v", "w").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sorted
    assert(guarded.length === plain.length, "salting must not change the pair count")
    assert(guarded.toSeq === plain.toSeq, "salting must be pure routing")
    // hot key spreads over >1 salt bucket; a cold key stays in bucket 0 only
    val salts = skewed.withColumn("__salt",
        pmod(xxhash64(skewed.columns.map(col): _*), lit(8L)).cast("int"))
    assert(salts.filter(col("k") === 0).select("__salt").distinct().count() > 1)
    // replication bound, pinned on the ACTUAL replicated relation: the
    // small side grows by (saltFactor - 1) × hot rows only — a cold row
    // keeps its single salt-0 copy
    val hotRows = b2.filter(col("k") === 0).count()
    val rep = Skew.replicateHot(b2, "k", 8, hot)
    assert(rep.count() === b2.count() + (8 - 1) * hotRows,
      "hot rows must replicate saltFactor ways, cold rows exactly once")
    val coldSalts = rep.filter(col("k") =!= 0)
      .select("__salt").distinct().collect().map(_.getInt(0)).toSeq
    assert(coldSalts === Seq(0), s"cold rows must stay in salt bucket 0, got $coldSalts")
  }

  test("saltedCollectSet == collect_set on hot-keyed data") {
    val plain = skewed.groupBy("k")
      .agg(array_sort(collect_set(col("v"))).as("vs"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    val salted = Skew.saltedCollectSet(skewed, "k", "v", 8, "vs")
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    assert(salted === plain)
  }
}
