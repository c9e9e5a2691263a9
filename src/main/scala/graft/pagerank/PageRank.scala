package graft.pagerank

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative PageRank with the reference's exact update rule and loop policy
  * (SURVEY.md §1.4 #4–#6):
  *
  *  - update: pr'(v) = α/N + (1−α)·Σ_{u→v} pr(u)/outdeg(u), α = 0.15, N =
  *    vertex count including the NULL sentinel
  *    (/root/reference/src/main/scala/pageRank.scala:294,310,355);
  *  - initial rank 1.0 (not 1/N) — total mass decays from N toward 1 across
  *    iterations; reproduced as-is (pageRank.scala:262-272);
  *  - convergence metric: per-vertex Δ = |Σ contribs − pr_prev| taken
  *    BEFORE damping, accumulated as Σ⌊Δ·1000⌋, then avg = Σ/N/1000
  *    (pageRank.scala:297-307,368);
  *  - loop: run iteration i, stop at the first i with i ≥ minIter and
  *    avg ≤ tol; hard cap maxIter (pageRank.scala:360-371). The reference
  *    then sorts iteration 10's output unconditionally (pageRank.scala:376,
  *    a latent bug); we sort the FINAL iteration and document the
  *    divergence (SURVEY §1.4 #6).
  *
  * Scale notes (100 TB): each iteration is one explode (narrow) + one
  * groupBy(dst) shuffle + one join back on title. Both shuffles hash on the
  * vertex id, so AQE reuses the partitioning between the agg and the join.
  * `localCheckpoint` after every iteration truncates lineage (mandatory —
  * iterative DF plans grow superlinearly otherwise, SURVEY §7.4.3); on a
  * real cluster one would use `checkpoint` with an HDFS dir for fault
  * tolerance instead. The Δ-counter is a driver-side scalar agg per
  * iteration, equivalent to the reference's Hadoop counter side-channel.
  */
object PageRank {

  final case class Result(graph: DataFrame, iterations: Int, avgChange: Double)

  /** One power-iteration step over graph(title, links, pr).
    * Returns (title, links, pr, delta) where delta is the pre-damping
    * per-vertex change used by the convergence metric. */
  def step(g: DataFrame, n: Long, alpha: Double = 0.15): DataFrame = {
    val contribs = g
      .select(explode(col("links")).as("title"),
        (col("pr") / size(col("links"))).as("contrib"))
    val mass = contribs.groupBy("title").agg(sum(col("contrib")).as("mass"))
    g.select(col("title"), col("links"), col("pr").as("prev"))
      .join(mass, Seq("title"), "left_outer")
      .select(col("title"), col("links"),
        (lit(alpha) / n + lit(1.0 - alpha) * coalesce(col("mass"), lit(0.0))).as("pr"),
        abs(coalesce(col("mass"), lit(0.0)) - col("prev")).as("delta"))
  }

  /** Run the fixpoint loop with the reference's policy. */
  def run(graph0: DataFrame, minIter: Int = 10, tol: Double = 0.2,
      maxIter: Int = 50, alpha: Double = 0.15): Result = {
    val n = graph0.count()
    var g = graph0.localCheckpoint()
    var i = 0
    var avg = Double.MaxValue
    var continue = true
    while (continue) {
      i += 1
      val stepped = step(g, n, alpha).localCheckpoint()
      // Σ⌊|Δ|·1000⌋ / N / 1000, preserving the integer truncation
      // (pageRank.scala:307,368) for bit-parity with the reference.
      val counter = stepped.agg(
        sum(floor(col("delta") * 1000)).cast("long").as("c"))
        .head().getLong(0)
      avg = counter.toDouble / n / 1000.0
      val next = stepped.drop("delta")
      g.unpersist()
      g = next
      continue = i < maxIter && (i < minIter || avg > tol)
    }
    Result(g, i, avg)
  }

  /** Final ranked relation (ref T1) — a true global order via Spark's
    * range-partitioned sort (strictly better than the reference's
    * per-partition MR sort, SURVEY §2.5 T1). */
  def ranked(g: DataFrame): DataFrame =
    g.select(col("title"), col("pr")).orderBy(desc("pr"), asc("title"))
}
