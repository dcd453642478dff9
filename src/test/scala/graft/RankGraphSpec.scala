package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators._

/** Properties of the round-4 operators: BM25 / hybrid ranking, the
  * kNN graph, graph analytics (PageRank, triangles), quality gating,
  * and stratified sampling. Deterministic structural assertions on
  * sf0.001 plus synthetic-graph ground truths.
  */
class RankGraphSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  val sf = "/root/testdata/sf0.001"
  import spark.implicits._

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("ta_bm25: 10 rows, scores non-increasing, all non-negative") {
    val rows = run("ta_bm25").collect()
    assert(rows.length == 10)
    val scores = rows.map(r => r.getDouble(r.fieldIndex("score")))
    assert(scores.sliding(2).forall { case Array(a, b) => a >= b })
    assert(scores.forall(_ >= 0.0))
    assert(scores.head > 0.0) // the corpus does contain the query terms
  }

  test("ss_hybrid_rrf: fused score equals the sum of its rank terms") {
    val rows = run("ss_hybrid_rrf").collect()
    assert(rows.nonEmpty && rows.length <= 10)
    rows.foreach { r =>
      val rt = if (r.isNullAt(r.fieldIndex("rt"))) None else Some(r.getInt(r.fieldIndex("rt")))
      val rv = if (r.isNullAt(r.fieldIndex("rv"))) None else Some(r.getInt(r.fieldIndex("rv")))
      val expected = rt.map(x => 1.0 / (60.0 + x)).getOrElse(0.0) +
        rv.map(x => 1.0 / (60.0 + x)).getOrElse(0.0)
      assert(r.getDouble(r.fieldIndex("rrf")) == expected)
      assert(rt.isDefined || rv.isDefined)
    }
  }

  test("dd_knn_graph: at most 3 neighbors per vector, cos non-increasing") {
    val rows = run("dd_knn_graph").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (_, g) =>
      assert(g.length <= 3)
      val byRank = g.sortBy(_.getInt(3))
      assert(byRank.map(_.getInt(3)).toSeq == (1 to g.length))
      val cos = byRank.map(_.getDouble(2))
      assert(cos.sliding(2).forall {
        case Array(a, b) => a >= b
        case _ => true
      })
    }
  }

  test("pageRankMicro: known path graph, mass conserved up to truncation") {
    // path 1-2-3 plus isolated edge 4-5
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("doc_a", "doc_b")
    val pr = GraphQueries.pageRankMicro(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pr.keySet == Set(1L, 2L, 3L, 4L, 5L))
    // symmetric positions get identical ranks; the path's center
    // out-ranks its leaves
    assert(pr(1L) == pr(3L))
    assert(pr(4L) == pr(5L))
    assert(pr(2L) > pr(1L))
    // total mass ≈ 10^6, only truncating-division loss (each of the 3
    // rounds loses < 1 micro-unit per node and per edge division)
    val total = pr.values.sum
    assert(total <= 1000000L && total > 990000L)
  }

  test("pageRankMicro: iters=10 keeps the plan flat (per-round checkpoint)") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 1L))
      .toDF("doc_a", "doc_b")
    val pr = GraphQueries.pageRankMicro(pairs, iters = 10)
    // Lineage is cut every round, so the final frame reads the last
    // checkpointed RDD — no 10-round join tower in the plan.
    val plan = pr.queryExecution.optimizedPlan.toString
    assert(!plan.contains("Join"), s"lineage not cut:\n$plan")
    // 5-cycle: all nodes symmetric, full mass up to truncation loss.
    val rows = pr.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.size == 5 && rows.values.toSet.size == 1)
    assert(rows.values.sum > 990000L)
  }

  test("pageRankMicro: integer fixpoint test stops a symmetric graph early") {
    // Triangle: uniform pr is the exact fixpoint from round 1, so with
    // tolMicro=0 the loop must detect Δ=0 and stop well before 50
    // rounds — and still return the same values as the fixed-3 run.
    // The ROUND COUNT is the observable (wall-clock can't distinguish
    // "converged after 1 round" from "ran all 50 fast").
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("doc_a", "doc_b")
    val (prDf, rounds) =
      GraphQueries.pageRankMicroRounds(pairs, iters = 50, tolMicro = 0L)
    val converged = prDf.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fixed = GraphQueries.pageRankMicro(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(converged == fixed)
    assert(rounds < 50, s"50-round loop did not early-stop (ran $rounds rounds)")
    assert(rounds >= 1)
  }

  test("pageRankDirectedMicro: dangling mass redistributed, total conserved") {
    // Directed path 1→2→3: node 3 is dangling (out-degree 0). Without
    // redistribution its rank would leak every round (total mass → the
    // jump floor); with it, total stays ≈ 10⁶ up to truncation and the
    // chain end accumulates the most rank.
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val pr = GraphQueries.pageRankDirectedMicro(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pr.keySet == Set(1L, 2L, 3L))
    assert(pr(3L) > pr(2L) && pr(2L) > pr(1L))
    val total = pr.values.sum
    assert(total <= 1000000L && total > 990000L,
      s"mass not conserved: $total (dangling term missing?)")
  }

  test("triangleCount: hub + rim graph matches the closed form") {
    // Star hub 0—{1..40} plus rim path i—(i+1): each rim edge closes
    // exactly one triangle with the hub → 39 triangles. Under id
    // orientation the hub would generate C(40,2) wedges; degree
    // orientation generates them at the rim endpoints instead.
    val edges = (1 to 40).map(i => (0L, i.toLong)) ++
      (1 until 40).map(i => (i.toLong, i.toLong + 1))
    val got = GraphQueries.triangleCount(edges.toDF("doc_a", "doc_b"))
      .head().getLong(0)
    assert(got == 39L)
  }

  test("dd_triangles matches a naive count on the same pairs") {
    val pairs = run("dd_ngram_jaccard")
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = (for {
      (a, b) <- pairs
      (b2, c) <- pairs if b2 == b
      if pairs.contains((a, c))
    } yield (a, b, c)).size.toLong
    val got = run("dd_triangles").collect().head.getLong(0)
    assert(got == naive)
  }

  test("pipe_quality_gopher: per-lang accounting is consistent") {
    val rows = run("pipe_quality_gopher").collect()
    assert(rows.nonEmpty)
    val langs = Tables.documents(spark, sf)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val (lang, n, pass) = (r.getString(0), r.getLong(1), r.getLong(2))
      val fails = (3 to 5).map(r.getLong).sum
      assert(n == langs(lang))
      assert(pass <= n)
      // every non-passing doc fails at least one rule (rules can overlap)
      assert(n - pass <= fails)
    }
  }

  test("pipe_stratified_sample: exactly ceil(10%) per language") {
    val got = run("pipe_stratified_sample").collect()
      .groupBy(_.getString(1)).view.mapValues(_.length.toLong).toMap
    val langs = Tables.documents(spark, sf)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.keySet == langs.keySet)
    got.foreach { case (lang, n) => assert(n == (langs(lang) + 9) / 10) }
  }

  test("ss_ivf_nprobe: strictly wider candidate pool than single-probe") {
    // Probing NProbe cells can only improve the best reachable score:
    // per query, nprobe's top-1 must be >= single-probe's top-1, and
    // every query must fill its 3 slots (two cells always hold >= 3
    // candidates here).
    val one = run("ss_ivf_search").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getDouble(2)).max).toMap
    val multi = run("ss_ivf_nprobe").collect()
    val byQ = multi.groupBy(_.getLong(0))
    assert(byQ.size == 5)
    byQ.foreach { case (q, rows) =>
      assert(rows.length == 3)
      assert(rows.map(_.getDouble(2)).max >= one(q))
    }
  }

  test("dd_label_prop: communities refine the connected components") {
    // labels propagate only along edges, so a community can never
    // span two components; sizes must sum to the node count
    val comm = run("dd_label_prop").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val cc = run("dd_clusters").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comm.map(_._1).toSet == cc.keySet)
    comm.groupBy(_._2).foreach { case (cid, members) =>
      assert(members.map(m => cc(m._1)).distinct.length == 1,
        s"community $cid spans components")
      assert(members.forall(_._3 == members.length))
    }
  }

  test("ss_ivf_recall: probing more cells never loses hits") {
    // any candidate outranking a true top-3 member must itself be in
    // the global top-3, so hits are monotone in the candidate set
    val rows = run("ss_ivf_recall").collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getLong(1) == 3L)
      assert(r.getLong(3) >= r.getLong(2))
    }
  }

  test("ss_pca_top2: ordered eigenvalues, near-orthogonal components") {
    val rows = run("ss_pca_top2").collect()
    val byComp = rows.groupBy(_.getInt(0))
    assert(byComp.keySet == Set(1, 2))
    val v1 = byComp(1).map(r => r.getInt(1) -> r.getLong(2)).toMap
    val v2 = byComp(2).map(r => r.getInt(1) -> r.getLong(2)).toMap
    assert(v1.size == v2.size)
    val l1 = byComp(1).head.getLong(3)
    val l2 = byComp(2).head.getLong(3)
    assert(l1 >= l2 && l2 >= 0L)
    // both are unit vectors at 1e6 micro-scale; after deflation the
    // second component's projection on the first must be small
    val dot12 = v1.keys.map(d => v1(d) * v2(d)).sum.toDouble / 1e12
    assert(math.abs(dot12) < 0.05, s"|v1.v2| = ${math.abs(dot12)}")
  }

  test("ss_kmeans_step: one mean per (centroid, dimension)") {
    val rows = run("ss_kmeans_step").collect()
    val dims = Tables.embeddings(spark, sf)
      .select(org.apache.spark.sql.functions.size(
        org.apache.spark.sql.functions.col("embedding")))
      .head().getInt(0)
    val cents = rows.map(_.getLong(0)).distinct
    assert(cents.nonEmpty && cents.length <= PipelineQueries.NumCentroids)
    assert(rows.length == cents.length * dims)
    assert(rows.forall(r => math.abs(r.getDouble(2)) < 1e6))
  }
}
