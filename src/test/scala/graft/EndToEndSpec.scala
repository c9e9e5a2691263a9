package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.corpus.WikiCorpus
import graft.graph.GraphBuilder
import graft.index.InvertedIndex
import graft.pagerank.PageRank
import graft.search.Search

/** End-to-end tier (SURVEY.md §5.5, FIXTURES.md §2): a deterministic
  * synthetic corpus at the reference's scale (k = 5194 documents,
  * /root/reference/README.md:68) through ingest → graph → PageRank →
  * index → search, validated against independent in-test recomputation
  * (not against the pipeline's own intermediates). */
class EndToEndSpec extends SparkSpec {

  val K = 5194
  val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "eta", "theta")

  /** Deterministic generator: Zipf-ish out-degree, ~5% ghost links,
    * ~10% dangling pages, common vocab + 1%-frequency rare terms. */
  lazy val corpus: IndexedSeq[String] = {
    val rnd = new scala.util.Random(42)
    (0 until K).map { i =>
      val dangling = rnd.nextInt(10) == 0
      val deg = if (dangling) 0 else 1 + rnd.nextInt(6)
      val links = (0 until deg).map { _ =>
        if (rnd.nextInt(20) == 0) s"ghost${rnd.nextInt(100)}"
        else s"p${rnd.nextInt(K)}"
      }
      val words = (0 until 5 + rnd.nextInt(20)).map(_ => vocab(rnd.nextInt(vocab.size)))
      // letter-only suffix: a digit would split the token under [a-zA-Z]+
      val rare = if (rnd.nextInt(100) == 0)
        Seq("rare" + ('a' + rnd.nextInt(20)).toChar) else Seq()
      s"<title>p$i</title> ${links.map(l => s"[[$l]]").mkString(" ")} " +
        s"<text>${(words ++ rare).mkString(" ")}</text>"
    }
  }

  lazy val corpusPath: String = {
    val f = Files.createTempFile("e2e-corpus", ".txt")
    Files.writeString(f, corpus.mkString("\n") + "\n")
    f.toString
  }

  /** Independent recomputation of the expected adjacency from the corpus
    * text, per the reference semantics (SURVEY §1.4 #1–#2). */
  lazy val expectedAdj: Map[String, Set[String]] = {
    val linkRe = "\\[\\[([^\\]]+)\\]\\]".r
    val raw = corpus.zipWithIndex.map { case (line, i) =>
      s"p$i" -> linkRe.findAllMatchIn(line).map(_.group(1).trim).toSet
    }.toMap
    val titles = raw.keySet
    val filtered = raw.map { case (t, ls) => t -> (ls & titles) }
    filtered.map { case (t, ls) =>
      t -> (if (ls.isEmpty) Set(GraphBuilder.NullVertex) else ls)
    } + (GraphBuilder.NullVertex -> titles)
  }

  lazy val docs = WikiCorpus.ingest(spark, corpusPath).cache()
  lazy val graph = GraphBuilder.build(docs.select(col("title"), col("links"))).cache()

  test("graph at scale matches independently recomputed adjacency") {
    val got = graph.collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toSet).toMap
    assert(got.keySet === expectedAdj.keySet)
    val bad = got.count { case (t, ls) => expectedAdj(t) != ls }
    assert(bad === 0, s"$bad vertices have wrong adjacency")
  }

  test("PageRank at scale matches the scalar model (values + iterations)") {
    val res = PageRank.run(graph)
    // scalar power iteration with the exact update rule + loop policy
    val adj = expectedAdj.map { case (k, v) => k -> v.toSeq }
    val n = adj.size
    var pr = adj.keys.map(_ -> 1.0).toMap
    var i = 0
    var continue = true
    while (continue) {
      i += 1
      val mass = scala.collection.mutable.Map[String, Double]().withDefaultValue(0.0)
      for ((src, links) <- adj; dst <- links) mass(dst) += pr(src) / links.size
      // Reference counter semantics: Δ = |mass| with prev implicitly 0
      // (SURVEY §1.4 #5). .iterator: adj.keys is a Set — mapping on it
      // would dedup equal floor values before summing.
      val counter = adj.keys.iterator.map(t =>
        math.floor(math.abs(mass(t)) * 1000).toLong).sum
      val avg = counter.toDouble / n / 1000.0
      pr = adj.keys.map(t => t -> (0.15 / n + 0.85 * mass(t))).toMap
      continue = i < 50 && (i < 10 || avg > 0.2)
    }
    assert(res.iterations === i, "iteration count")
    val got = res.graph.select("title", "pr").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val maxErr = pr.map { case (t, v) => math.abs(got(t) - v) }.max
    assert(maxErr < 1e-8, s"max |pr diff| = $maxErr")
  }

  test("q25 nation fixture: dynamic policy stops at the pinned oracle depth") {
    // The q25 oracle recurses to a HARDCODED depth (CorpusSearch
    // .NationFixtureIterations) — this test keeps that constant honest by
    // running the live loop AND an independent scalar model of the exact
    // reference semantics on the same fixture.
    val rows = SparkEntry.queries("q25_pagerank")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.length === 26) // 25 nations + NULL sentinel
    val pinned = graft.queries.CorpusSearch.NationFixtureIterations.toLong
    assert(rows.forall(_.getLong(2) === pinned), "emitted iterations column")
    // independent scalar model: fixture adjacency from the link formulas
    val pages = (0 until 25).map(k => s"n$k")
    val raw = (0 until 25).map { k =>
      s"n$k" -> Set((3 * k) % 31, (8 * k + 2) % 31, (11 * k + 5) % 31)
        .filter(_ < 25).map(t => s"n$t")
    }.toMap
    val adj = raw.map { case (t, ls) =>
      t -> (if (ls.isEmpty) Seq(GraphBuilder.NullVertex) else ls.toSeq)
    } + (GraphBuilder.NullVertex -> pages)
    val n = adj.size
    var pr = adj.keys.map(_ -> 1.0).toMap
    var i = 0
    var continue = true
    while (continue) {
      i += 1
      val mass = scala.collection.mutable.Map[String, Double]().withDefaultValue(0.0)
      for ((src, links) <- adj; dst <- links) mass(dst) += pr(src) / links.size
      val counter = adj.keys.iterator.map(t =>
        math.floor(math.abs(mass(t)) * 1000).toLong).sum
      pr = adj.keys.map(t => t -> (0.15 / n + 0.85 * mass(t))).toMap
      val avg = counter.toDouble / n / 1000.0
      continue = i < 50 && (i < 10 || avg > 0.2)
    }
    assert(i.toLong === pinned,
      s"scalar model stops at $i but the pinned oracle depth is $pinned — " +
        "update NationFixtureIterations AND the q25 oracle together")
    val got = rows.map(r => r.getString(0) -> r.getDouble(1)).toMap
    pr.foreach { case (t, v) =>
      assert(math.abs(got(t) - math.floor(v * 1e6 + 0.5) / 1e6) < 1e-9, s"pr($t)")
    }
  }

  test("q208 rank order is float-noise-proof: nation pr gaps clear the 1e-6 grid") {
    // q208's rank gate compares the CLI sink's (pr DESC, title) file
    // order against the oracle's ORDER BY pr DESC — an EXACT-double
    // cross-engine ordering, while q25 only pins parity at ROUND(pr, 6)
    // (ADVICE r17). That is safe iff no two distinct pr values on the
    // fixture sit within float-noise of each other: this pins the
    // assumption, requiring every adjacent DISTINCT pr gap to exceed
    // the 1e-6 rounding grid by 2× (measured min gap ~7e-4). Exactly
    // EQUAL values would be fine — both engines tiebreak on title —
    // but the fixture has none, so equality is asserted away too.
    val rows = SparkEntry.queries("q25_pagerank")(spark, "/root/testdata/sf0.001")
      .collect()
    val prs = rows.map(_.getDouble(1)).sorted
    assert(prs.length === prs.distinct.length,
      "fixture pr values must be pairwise distinct for the title " +
        "tiebreak assumption to be vacuous")
    val minGap = prs.sliding(2).map { case Array(a, b) => b - a }.min
    assert(minGap > 2e-6,
      f"min adjacent pr gap $minGap%.3e is within float-noise of the " +
        "1e-6 grid — q208's exact-double rank ordering is no longer " +
        "safe; derive rank from ROUND(pr, 6) with title tiebreak on " +
        "both sides")
  }

  test("index at scale: common vocab dies at the reference cutoff, rare terms survive") {
    val full = InvertedIndex.build(docs, dfCutoff = Int.MaxValue).cache()
    val dfs = full.select("term", "df").collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    vocab.foreach(t => assert(dfs(t) >= 3000, s"common term $t df=${dfs(t)}"))
    // the reference's df >= 3000 cutoff drops exactly the common vocab
    val cut = InvertedIndex.build(docs).select("term").collect().map(_.getString(0)).toSet
    assert((cut & vocab.toSet).isEmpty, "vocab should be cut")
    assert(cut.exists(_.startsWith("rare")), "rare terms should survive")
    // df of each rare term == number of docs containing it (independent count)
    cut.filter(_.startsWith("rare")).foreach { t =>
      val expected = corpus.count(_.contains(s" $t"))
      assert(dfs(t) === expected, s"df($t)")
    }
  }

  test("search at scale returns exactly the brute-force hit set") {
    val pr = PageRank.run(graph).graph.select("title", "pr")
    val ii = InvertedIndex.build(docs)
    val term = "rareg"
    val hits = Search.search(spark, Seq(term), K, ii, pr,
      docs.select("title", "line")).collect()
    val expectedTitles = corpus.zipWithIndex
      .filter(_._1.contains(s" $term")).map(x => s"p${x._2}").toSet
    assert(hits.map(_.getString(3)).toSet === expectedTitles)
    hits.foreach { r =>
      r.getSeq[String](8).foreach(sn => assert(sn.contains("rare")))
    }
  }
}
