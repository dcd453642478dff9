package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Round-10 session additions: advisor-item regression pins
  * (engine-divergence guards, cache lifetime).
  */
class Round14OpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  val sf = "/root/testdata/sf0.001"

  test("wavGainOf: all-silent clip yields a defined NULL plan row, not a crash") {
    // every byte 0x80 → every decoded sample 0 → Σs² = 0; the gain
    // plan must be NULL on the Spark leg (the oracle mirrors with
    // CASE WHEN sumsq = 0 THEN NULL), never an ArithmeticException
    val silent = Array.fill[Byte](64)(0x80.toByte)
    val (n, sumsq, gain2, nClip, lim) = operators.Multimodal.wavGainOf(silent)
    assert(n > 0L && sumsq == 0L)
    assert(gain2.isEmpty && nClip.isEmpty && lim.isEmpty)
    // a non-silent payload keeps the round-9 contract
    val loud = "the quick brown fox".getBytes("UTF-8")
    val (n2, sq2, g2, c2, l2) = operators.Multimodal.wavGainOf(loud)
    assert(n2 > 0L && sq2 > 0L && g2.nonEmpty && c2.nonEmpty && l2.nonEmpty)
    assert(g2.get == ((BigInt(67108864L) * n2 * 1000000L) / sq2).toLong)
  }

  test("CacheRegistry: Tables.invalidate drops derived artifacts under the prefix") {
    val m = CacheRegistry.newCache()
    var builds = 0
    def build() = { builds += 1; java.lang.Long.valueOf(builds.toLong) }
    CacheRegistry.cached[java.lang.Long](m, spark, "/tmp/gr-a", "pairs")(build())
    CacheRegistry.cached[java.lang.Long](m, spark, "/tmp/gr-a", "pairs")(build())
    assert(builds == 1, "memoization broken")
    CacheRegistry.cached[java.lang.Long](m, spark, "/tmp/gr-b", "pairs")(build())
    assert(builds == 2)
    // rewriting parquet under gr-a must invalidate ONLY gr-a artifacts
    Tables.invalidate("/tmp/gr-a")
    CacheRegistry.cached[java.lang.Long](m, spark, "/tmp/gr-b", "pairs")(build())
    assert(builds == 2, "unrelated dir was evicted")
    CacheRegistry.cached[java.lang.Long](m, spark, "/tmp/gr-a", "pairs")(build())
    assert(builds == 3, "stale artifact served after invalidate")
    // session eviction clears this session's entries
    Tables.invalidateSession(spark)
    CacheRegistry.cached[java.lang.Long](m, spark, "/tmp/gr-b", "pairs")(build())
    assert(builds == 4)
  }

  test("bradleyTerry: dominance orders strengths; normalization holds mean 1") {
    // c beats everything, a beats b — strengths must order c > a > b
    val mat = Seq(("a", "b", 8L, 2L), ("a", "c", 1L, 9L), ("b", "c", 0L, 10L))
    val out = operators.PrefQueries.bradleyTerry(mat)
    val g = out.map(r => r._1 -> r._4).toMap
    assert(g("c") > g("a") && g("a") > g("b"), s"$out")
    // ranks are 1..K aligned with gamma desc
    assert(out.sortBy(_._5).map(_._1) == Seq("c", "a", "b"))
    // mean-1 normalization: Σγ within K floor-steps of K·10⁶
    val s = out.map(_._4).sum
    assert(s <= 3000000L && s >= 3000000L - 3L, s"sum=$s")
    // wins/comps bookkeeping
    assert(out.map(_._2).sum == 30L) // every decisive duel counted once
    assert(out.map(_._3).sum == 60L) // each duel counted from both ends
    // symmetric data ties out symmetric: equal strengths, rank by name
    val sym = operators.PrefQueries.bradleyTerry(
      Seq(("x", "y", 5L, 5L)))
    assert(sym.map(_._4).distinct.size == 1)
    assert(sym.sortBy(_._5).map(_._1) == Seq("x", "y"))
  }

  test("ev_bradley_terry: query output is consistent with ev_pref_matrix") {
    val bt = SparkEntry.queries("ev_bradley_terry")(spark, sf).collect()
    val pm = SparkEntry.queries("ev_pref_matrix")(spark, sf).collect()
    val decisive = pm.map(r => r.getLong(2) + r.getLong(3)).sum
    assert(bt.map(_.getLong(1)).sum == decisive)
    assert(bt.map(_.getLong(4)).sorted.toSeq == (1L to bt.length).toSeq)
    assert(bt.forall(_.getLong(3) >= 0L))
  }

  test("ss_adamic_adar: brute-force recompute from the mutual-kNN edge list") {
    val pairs = SparkEntry.queries("ss_mutual_knn")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = scala.collection.mutable.Map[Long, Set[Long]]()
        .withDefaultValue(Set.empty)
    pairs.foreach { case (a, b) =>
      adj(a) = adj(a) + b; adj(b) = adj(b) + a }
    val edgeSet = pairs.toSet
    val expected = adj.keys.toSeq.combinations(2).map(_.sorted)
      .collect { case Seq(u, w)
        if !edgeSet.contains((u, w)) && (adj(u) & adj(w)).nonEmpty =>
        val common = adj(u) & adj(w)
        val aa = common.toSeq.map { v =>
          1000000000000L / graft.functions.Log2Micro.log2micro(adj(v).size.toLong, 1L)
        }.sum
        (u, w) -> (common.size.toLong, aa)
      }.toMap
    val got = SparkEntry.queries("ss_adamic_adar")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == expected, s"got=${got.size} exp=${expected.size}")
    assert(got.nonEmpty, "mutual-kNN graph should yield open wedges")
  }

  test("ta_nb_score: beats-or-matches the majority-class baseline; scores are real log-probs") {
    val rows = SparkEntry.queries("ta_nb_score")(spark, sf).collect()
    val nDocs = Tables.documents(spark, sf).count()
    assert(rows.length == nDocs, "one verdict row per document")
    // the synthetic corpus shares ONE vocabulary across langs (the
    // label is near-independent of tokens), so the Bayes-optimal
    // router degenerates to the prior — the pin is "no worse than
    // majority-class", not a separability claim the data can't back
    val baseline = rows.groupBy(_.getString(1)).values.map(_.length).max
      .toDouble / rows.length
    val acc = rows.count(_.getBoolean(4)).toDouble / rows.length
    assert(acc >= baseline - 0.02,
      s"NB must not lose to prior routing: acc=$acc baseline=$baseline")
    // scores are genuine log-probabilities: negative, and the winner's
    // score beats the prior-only floor of an empty doc
    assert(rows.forall(_.getLong(3) < 0L))
    // train card invariants: Σ n_docs = corpus, den = n_tokens + V
    val train = SparkEntry.queries("ta_nb_train")(spark, sf).collect()
    assert(train.map(_.getLong(1)).sum == nDocs)
    assert(train.forall(r => r.getLong(4) > r.getLong(2)))
    assert(train.forall(r => r.getLong(5) < 0L && r.getLong(6) < 0L))
  }

  test("ta_feature_hash: signed sums bounded by hit counts; mass conserved") {
    val rows = SparkEntry.queries("ta_feature_hash")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val v = r.getLong(2); val n = r.getLong(3)
      assert(math.abs(v) <= n, s"$r")
      assert((n - math.abs(v)) % 2 == 0, s"parity: $r") // ±1 signs only
      assert(r.getLong(1) >= 0L && r.getLong(1) < operators.ClassifyQueries.FhDim)
    }
    // Σ hits per doc == that doc's token count
    val hits = rows.groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(3)).sum)
    val toks = SparkEntry.queries("ta_tokens")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    hits.foreach { case (d, h) => assert(h == toks(d), s"doc $d") }
  }

  test("ev_bootstrap_ci: ordered CI brackets the point estimate") {
    val r = SparkEntry.queries("ev_bootstrap_ci")(spark, sf).collect().head
    val (point, lo, med, hi) =
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(lo <= med && med <= hi)
    // P(point outside the 2nd..31st order stats of 32 centered
    // replicas) ~ 1e-8 — a genuine contract, not a flaky pin
    assert(lo <= point && point <= hi, s"point=$point ci=[$lo,$hi]")
    assert(r.getLong(5) == operators.EventQueries.BootReplicas.toLong)
  }

  test("ev_attribution_removal: monotone effects, shares sum to one") {
    val rows = SparkEntry.queries("ev_attribution_removal")(spark, sf).collect()
    assert(rows.nonEmpty)
    val base = rows.head.getLong(1)
    rows.foreach { r =>
      assert(r.getLong(1) == base, "one shared baseline")
      assert(r.getLong(2) <= base, "removal can only lose conversions")
      assert(r.getLong(3) == base - r.getLong(2))
      assert(r.getLong(3) >= 0L)
    }
    val shares = rows.map(_.getLong(4))
    assert(shares.sum <= 1000000L && shares.sum >= 1000000L - rows.length,
      s"floor-normalized shares: ${shares.sum}")
  }

  test("dd_dbscan: role partition covers the corpus; density invariants hold") {
    val rows = SparkEntry.queries("dd_dbscan")(spark, sf).collect()
    assert(rows.length == Tables.embeddings(spark, sf).count())
    val byRole = rows.groupBy(_.getString(1))
    byRole.getOrElse("core", Array.empty).foreach { r =>
      assert(r.getLong(3) >= operators.DedupClusters.DbscanMinPts,
        s"core with < MinPts neighbors: $r")
      assert(!r.isNullAt(2))
    }
    byRole.getOrElse("border", Array.empty).foreach { r =>
      assert(r.getLong(3) < operators.DedupClusters.DbscanMinPts &&
        r.getLong(3) >= 1, s"$r")
      assert(!r.isNullAt(2))
    }
    byRole.getOrElse("noise", Array.empty).foreach(r => assert(r.isNullAt(2)))
    // cluster labels are the component minimum: every core's label ≤ id
    byRole.getOrElse("core", Array.empty)
      .foreach(r => assert(r.getLong(2) <= r.getLong(0)))
  }

  test("ta_kn_bigram: probabilities are proper and discount-dominated") {
    val rows = SparkEntry.queries("ta_kn_bigram")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (c2, c1, lam, p) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(c2 >= 3 && c1 >= c2)
      assert(lam > 0L && lam < 1000000L, s"λ must interpolate: $r")
      val disc = (4 * c2 - 3) * 1000000L / (4 * c1)
      assert(p >= disc, "continuation mass only adds")
      assert(p <= 1000000L, s"proper probability: $r")
    }
  }

  test("ev_ab_cuped: adjustment is mean-preserving and variance reduction is bounded") {
    val rows = SparkEntry.queries("ev_ab_cuped")(spark, sf).collect()
    assert(rows.length == 2)
    val theta = rows.map(_.getLong(5)).distinct
    assert(theta.length == 1, "one shared theta")
    rows.foreach(r => assert(r.getLong(6) >= 0L && r.getLong(6) <= 1000000L))
    // CUPED preserves the pooled mean: Σ n·(ybar − cuped) = θ·Σ n·(xbar
    // − x̄) ≈ 0 (exact up to per-arm micro flooring)
    val drift = rows.map(r =>
      r.getLong(1) * (r.getLong(3) - r.getLong(4))).sum
    val tol = rows.map(_.getLong(1)).sum * 2 // ≤2 micro/user of floor slack
    assert(math.abs(drift) <= tol * math.max(1L, math.abs(theta.head)) / 1000000L + tol,
      s"pooled-mean drift $drift")
  }

  test("dd_cluster_agreement: pair-counting identities hold") {
    val r = SparkEntry.queries("dd_cluster_agreement")(spark, sf).collect().head
    val (n, sij, sa, sb) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(n == Tables.documents(spark, sf).count())
    // the joint partition refines both sides: S_ij ≤ min(S_a, S_b)
    assert(sij <= math.min(sa, sb))
    assert(r.getLong(4) >= 0L && r.getLong(4) <= 1000000L) // rand ∈ [0,1]
    assert(r.getLong(5) <= 1000000L) // ari ≤ 1 (can be negative)
    // perfect agreement ⇔ rand = 1: here the methods disagree on some
    // pairs, so rand < 1 but near it (dedup clusters are sparse)
    assert(r.getLong(4) > 900000L)
  }

  test("ev_growth_accounting: the active-flow identity holds each week") {
    val rows = SparkEntry.queries("ev_growth_accounting")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2) + r.getLong(3) + r.getLong(4),
        s"active = new + retained + resurrected violated: $r")
    }
    // week 1 is all-new; churn only counts users who WERE active
    assert(rows.head.getLong(1) == rows.head.getLong(2))
    assert(rows.head.getLong(5) == 0L)
    // flow conservation across consecutive weeks:
    // active_{t-1} = retained_t + churned_t — but only for rows that
    // ARE calendar-adjacent: a zero-activity gap week leaves no
    // result row, making neighboring rows non-consecutive without
    // the query being wrong (round-10 ADVICE nit)
    var adjacentPairs = 0
    rows.sliding(2).foreach {
      case Array(a, b)
          if b.getTimestamp(0).getTime - a.getTimestamp(0).getTime ==
            7L * 24 * 3600 * 1000 =>
        adjacentPairs += 1
        assert(a.getLong(1) == b.getLong(3) + b.getLong(5), s"$a -> $b")
      case _ =>
    }
    assert(adjacentPairs > 0, "no calendar-adjacent week pair exercised")
  }

  test("exp2microCtes mirrors the Scala k-domain guard") {
    val sql = operators.OracleSql.exp2microCtes("t", "rel", Seq("k1"))
    assert(sql.contains("ex2k < -63 OR ex2k > 42"),
      "DuckDB mirror lost the exp2micro domain guard")
    assert(sql.contains("error("),
      "out-of-domain must fail loudly on the oracle side too")
  }
}
