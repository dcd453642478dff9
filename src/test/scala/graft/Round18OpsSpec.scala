package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Round-12 session-5 additions: the recursive-CTE BOM rollup, HITS
  * link analysis, and the silhouette cluster-validity score — property
  * pins beside the oracle gate.
  */
class Round18OpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  val sf = "/root/testdata/sf0.001"

  test("q_recursive_bom: the forest partitions the part table exactly") {
    val got = SparkEntry.queries("q_recursive_bom")(spark, sf).collect()
    val nParts = Tables.part(spark, sf).count()
    // every part has exactly one root-ward chain (parent(c) = c DIV 8
    // strictly decreases), so the recursion visits each part once —
    // Σ n_parts over roots must equal |part| with no dup or drop
    assert(got.map(_.getLong(1)).sum == nParts,
      "recursion visited a part 0 or 2+ times — the frontier join is wrong")
    assert(got.length == 8 && got.map(_.getLong(0)).toSeq == (0L to 7L),
      "roots must be exactly keys 0..7")
    // root 0 is the degenerate single-node tree (its would-be children
    // 0..7 are all roots): the recursion must terminate at depth 0
    val r0 = got.find(_.getLong(0) == 0L).get
    assert(r0.getLong(1) == 1L && r0.getInt(2) == 0 && r0.getLong(3) == 1L,
      "root 0 must be a leaf-only product")
    // depth is log8: at 600 parts (sf0.001) the deepest chains sit at
    // 3; every multi-child root must recurse at least once
    assert(got.filter(_.getLong(1) > 1L).forall(_.getInt(2) >= 1))
    // rollup ≥ its own leaf cost, and units ≥ parts (qty ≥ 1 per node)
    got.foreach { r =>
      assert(r.getLong(3) >= r.getLong(1), "a path quantity fell below 1")
      assert(r.getLong(4) > 0L)
    }
  }

  test("dd_hits: normalization, zero-role boundaries, score domain") {
    val got = SparkEntry.queries("dd_hits")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty, "empty near-dup graph — the substrate vanished")
    assert(got.forall { case (_, a, h) =>
      a >= 0L && a <= 1000000L && h >= 0L && h <= 1000000L },
      "a score escaped [0, 10^6] — max-normalization broke")
    // L∞ normalization: some node holds exactly 10^6 on each side
    assert(got.map(_._2).max == 1000000L, "no max-authority node")
    assert(got.map(_._3).max == 1000000L, "no max-hub node")
    // the directed substrate points doc_a → doc_b with doc_a < doc_b,
    // so each component's minimum doc has no in-edge (authority must
    // be exactly 0) and its maximum doc no out-edge (hub 0)
    // public equivalent of the query's verified-pair substrate (the
    // dd_pagerank oracle family pins the equality)
    val edges = operators.Dedup.ngramJaccardPairs(spark, sf)
      .select(col("doc_a"), col("doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val dsts = edges.map(_._2).toSet
    val srcs = edges.map(_._1).toSet
    val byId = got.map(t => t._1 -> t).toMap
    (srcs ++ dsts).foreach { id =>
      if (!dsts.contains(id))
        assert(byId(id)._2 == 0L, s"source-only node $id has authority > 0")
      if (!srcs.contains(id))
        assert(byId(id)._3 == 0L, s"sink-only node $id has hub > 0")
    }
  }

  test("ss_silhouette: census, domain, and agreement with a direct recompute") {
    val got = SparkEntry.queries("ss_silhouette")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val n = Tables.embeddings(spark, sf).count()
    assert(got.map(_._2).sum == n, "per-cell census must partition the corpus")
    got.foreach { case (_, _, mean, mn) =>
      assert(mean >= 0L && mean <= 1000000L, "mean silhouette out of [0, 1e6]")
      assert(mn >= 0L && mn <= mean, "min must bound the mean from below")
    }
    // nearest-centroid assignment forces b ≥ a, so the corpus-wide
    // mean must be strictly positive unless every point is equidistant
    // between two centroids — not this corpus
    assert(got.map(t => t._3 * t._2).sum / n > 0L, "all-zero silhouette")
  }
}
