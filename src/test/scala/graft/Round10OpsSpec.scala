package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators._

/** Properties of this round's operators: the recursive-CTE graph
  * expansion, exact ROC-AUC of the quality scorer, the VARIANT
  * ingestion surface, and the ORC round trip. Brute-force ground
  * truths where the semantics have a closed form (AUC), structural
  * invariants otherwise.
  */
class Round10OpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("ss_graph_expand: BFS invariants — one hop-0 row per seed, contiguous hops") {
    val rows = run("ss_graph_expand").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(rows.nonEmpty)
    val bySeed = rows.groupBy(_._1)
    bySeed.foreach { case (seed, rs) =>
      val hops = rs.map(_._2).sorted
      // hop 0 is the seed itself, exactly one node
      assert(hops.head == 0, s"seed $seed missing hop 0")
      assert(rs.find(_._2 == 0).get._3 == 1L, s"seed $seed hop-0 count != 1")
      // min-hop levels are contiguous: a node at hop h+1 was reached
      // through some node at hop h, so no level can be skipped
      assert(hops.toList == (0 until hops.length).toList,
        s"seed $seed hops not contiguous: ${hops.mkString(",")}")
      assert(hops.last <= 4)
    }
  }

  test("ta_quality_auc matches the O(n^2) brute-force Mann–Whitney AUC") {
    val MinT = QualityQueries.MinTokens
    val MaxT = QualityQueries.MaxTokens
    val docs = Tables.documents(spark, sf).select("text").collect()
      .map(_.getString(0))
    val scored = docs.map { text =>
      val toks = text.split(" ").filter(_.nonEmpty)
      val nt = toks.length.toLong
      val sumlen = toks.map(_.length.toLong).sum
      val stop = toks.count(QualityQueries.Stopwords.contains).toLong
      // the integer-ppm scoring contract (see QualityQueries.scoredPpm)
      val x1m = graft.functions.Log2Micro.log2micro(1L + nt, 1L)
      val x2m = math.min(if (nt > 0) (1000000L * sumlen) / nt else 0L, 64000000L)
      val x3m = if (nt > 0) (1000000L * stop) / nt else 0L
      val zm = math.max(math.min(
        -6000000L + (4L * x1m) / 5L + (7L * x2m) / 20L + 6L * x3m,
        20000000L), -20000000L)
      val d = 1000000L + math.abs(zm)
      val sPpm = (500000L * (d + zm)) / d
      val y = nt >= MinT && nt <= MaxT &&
        sumlen >= QualityQueries.MinMeanWordLen.toLong * nt &&
        sumlen <= QualityQueries.MaxMeanWordLen.toLong * nt &&
        stop >= QualityQueries.MinStopwordHits
      (sPpm, y)
    }
    val pos = scored.filter(_._2).map(_._1)
    val neg = scored.filterNot(_._2).map(_._1)
    assert(pos.nonEmpty && neg.nonEmpty, "need both classes for AUC")
    val wins = (for (p <- pos; n <- neg)
      yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
    val bruteAuc = wins / (pos.length.toLong * neg.length)

    val r = run("ta_quality_auc").collect().head
    assert(r.getLong(r.fieldIndex("n_pos")) == pos.length)
    assert(r.getLong(r.fieldIndex("n_neg")) == neg.length)
    val auc6 = r.getDouble(r.fieldIndex("auc6"))
    assert(math.abs(auc6 - bruteAuc) < 1e-6 + 5e-7,
      s"auc6=$auc6 brute=$bruteAuc")
    assert(auc6 >= 0.0 && auc6 <= 1.0)
  }

  test("ev_peak_concurrency: equals the brute-force interval count at every hour") {
    // Ground truth: concurrency at an instant p = #intervals with
    // s <= p < s + 15min; per-hour peak = max over boundary points in
    // the hour. The query's bucketed two-phase sweep must match this
    // O(n^2) direct count exactly (1000 events at sf0.001).
    val starts = Tables.events(spark, sf)
      .select(expr("unix_micros(ts)")).collect().map(_.getLong(0)).sorted
    val fifteenMin = 15L * 60 * 1000000
    val points = (starts ++ starts.map(_ + fifteenMin)).distinct.sorted
    def concAt(p: Long) = starts.count(s => s <= p && p < s + fifteenMin)
    val expected = points.groupBy(p => p - Math.floorMod(p, 3600L * 1000000))
      .map { case (hour, ps) => hour -> ps.map(concAt).max }
    val got = run("ev_peak_concurrency")
      .select(expr("unix_micros(hour)"), col("peak_conc")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (hour, peak) =>
      assert(peak == expected(hour).toLong,
        s"hour=$hour got=$peak brute=${expected(hour)}")
    }
  }

  test("ev_hour_utilization: equals brute-force merged-interval clipping") {
    // Ground truth: merge the sorted [s, s+15m) intervals into
    // disjoint spans, clip each span to the hour grid, sum per hour.
    val starts = Tables.events(spark, sf)
      .select(expr("unix_micros(ts)")).collect().map(_.getLong(0)).sorted
    val len = 15L * 60 * 1000000
    val hourUs = 3600L * 1000000
    val merged = starts.foldLeft(List.empty[(Long, Long)]) {
      case ((a, b) :: rest, s) if s <= b => (a, math.max(b, s + len)) :: rest
      case (acc, s) => (s, s + len) :: acc
    }.reverse
    val expected = collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    merged.foreach { case (a, b) =>
      var h = a - Math.floorMod(a, hourUs)
      while (h < b) {
        expected(h) += math.min(b, h + hourUs) - math.max(a, h)
        h += hourUs
      }
    }
    val got = run("ev_hour_utilization")
      .select(expr("unix_micros(hour)"), col("covered_micros")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.foreach { case (h, c) =>
      assert(c == expected(h), s"hour=$h got=$c brute=${expected(h)}")
    }
    // every hour with coverage shows up in the query output
    expected.filter(_._2 > 0).keys.foreach(h => assert(got.contains(h)))
  }

  test("pipe_join_maintenance: every delta term is genuinely exercised") {
    // The IVM contract is only meaningfully tested if ΔA⋈B, A⋈ΔB and
    // ΔA⋈ΔB all carry rows at this scale — re-derive the md5 splits
    // and check each term is non-empty, then check the query's total
    // equals the direct join's row count.
    val ord = Tables.orders(spark, sf)
    val cust = Tables.customer(spark, sf)
    def hOrd = substring(md5(col("o_orderkey").cast("string")), 1, 1)
    def hCust = substring(md5(col("c_custkey").cast("string")), 1, 1)
    val terms = Seq(
      ("dA.B", ord.filter(hOrd >= "c"), cust.filter(hCust < "c")),
      ("A.dB", ord.filter(hOrd < "c"), cust.filter(hCust >= "c")),
      ("dA.dB", ord.filter(hOrd >= "c"), cust.filter(hCust >= "c")))
    terms.foreach { case (nm, o, c) =>
      assert(o.join(c, o("o_custkey") === c("c_custkey")).count() > 0,
        s"delta term $nm is empty — the IVM expansion is untested")
    }
    val direct = ord.join(cust, ord("o_custkey") === cust("c_custkey")).count()
    val viaView = run("pipe_join_maintenance").collect()
      .map(_.getAs[Long]("n_orders")).sum
    assert(viaView == direct)
  }

  test("sweep-line read-outs agree: histogram mass = coverage = hour span") {
    // Three queries over one sweep must tile the same timeline:
    // the histogram's conc>0 mass equals the utilization coverage sum
    // EXACTLY, and its full mass equals observed-hours × 3600e6.
    val hist = run("ev_conc_histogram").collect()
      .map(r => r.getAs[Long]("conc") -> r.getAs[Long]("total_micros"))
    val util = run("ev_hour_utilization").collect()
    val covered = util.map(_.getAs[Long]("covered_micros")).sum
    assert(hist.filter(_._1 > 0).map(_._2).sum == covered)
    assert(hist.map(_._2).sum == util.length.toLong * 3600L * 1000000)
    // and the histogram's support reaches exactly the peak
    val peak = run("ev_peak_concurrency").collect()
      .map(_.getAs[Long]("peak_conc")).max
    assert(hist.map(_._1).max == peak)
  }

  test("pipe_scd2_history: version rows are consistent SCD2 state") {
    val rows = run("pipe_scd2_history").collect()
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    byDoc.foreach { case (doc, rs) =>
      assert(rs.length <= 2, s"doc $doc has ${rs.length} versions")
      // at most one open (current) row; if two rows, the closed one
      // must end where the open one begins
      val current = rs.filter(_.getAs[Boolean]("is_current"))
      assert(current.length <= 1)
      if (rs.length == 2) {
        val closed = rs.find(!_.getAs[Boolean]("is_current")).get
        val open = rs.find(_.getAs[Boolean]("is_current")).get
        assert(closed.getAs[Int]("valid_to") == open.getAs[Int]("valid_from"))
        assert(closed.getAs[String]("fp") != open.getAs[String]("fp"))
      }
    }
    // changed docs exist at this scale (the md5<'3000' edit band)
    assert(byDoc.values.exists(_.length == 2), "no changed docs — edit band empty?")
    // point-in-time read at v2 = every current row
    assert(rows.count(_.getAs[Boolean]("is_current")) ==
      byDoc.values.count(_.exists(_.getAs[Boolean]("is_current"))))
  }

  test("q_dq_checks: the battery reports real violations, not only zeros") {
    val rows = run("q_dq_checks").collect()
      .map(r => r.getAs[String]("check_name") -> r.getAs[Long]("n_violations"))
      .toMap
    assert(rows("customer_acctbal_nonneg") > 0L,
      "the deliberately-failing check found nothing")
    (rows - "customer_acctbal_nonneg").foreach { case (c, v) =>
      assert(v == 0L, s"unexpected violations in $c: $v")
    }
  }

  test("ta_rake: report is capped, ordered, and scores match word stats") {
    import graft.operators.{QualityQueries, TextAnalysis, TextOps}
    val rows = run("ta_rake").collect()
    assert(rows.nonEmpty && rows.length <= 10)
    rows.foreach { r =>
      assert(r.getAs[String]("phrase").split(" ").length <= TextAnalysis.RakeMaxLen)
      assert(r.getAs[Long]("n_occur") >= 1L)
    }
    val scores = rows.map(_.getAs[Long]("score_micro")).toSeq
    assert(scores == scores.sorted.reverse)
    // recompute the top phrase's score from the raw word stats
    val toks = Tables.documents(spark, sf)
      .select(posexplode(TextOps.tokens(col("text"))).as(Seq("pos", "w")),
        col("doc_id"))
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("pos"),
        r.getAs[String]("w")))
    val stops = QualityQueries.Stopwords.toSet
    val runs = toks.groupBy(_._1).values.flatMap { doc =>
      val sorted = doc.sortBy(_._2)
      val grouped = collection.mutable.ArrayBuffer(collection.mutable.ArrayBuffer.empty[String])
      sorted.foreach { case (_, _, w) =>
        if (stops(w)) grouped += collection.mutable.ArrayBuffer.empty[String]
        else grouped.last += w
      }
      grouped.filter(_.nonEmpty).map(_.toSeq)
    }.toSeq
    val freq = runs.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val deg = runs.flatMap(p => p.map(_ -> p.length.toLong))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    def wscore(w: String) = deg(w) * 1000000L / freq(w)
    val top = rows.head
    val expected = top.getAs[String]("phrase").split(" ").map(wscore).sum
    assert(top.getAs[Long]("score_micro") == expected)
  }

  test("ss_mmr_rerank: equals the brute-force greedy MMR walk") {
    import graft.operators.Similarity
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    def cos4(a: Array[Double], b: Array[Double]): Double = {
      val dotp = a.zip(b).map { case (x, y) => x * y }.sum
      val d = dotp / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
      BigDecimal(d).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    def bp(x: Double): Long = math.round(x * 10000)
    val got = SparkEntry.queries("ss_mmr_rerank")(spark, sf).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Int]("rk")) -> r.getAs[Long]("cand"))
      .toMap
    (0L until Similarity.NumQueries).foreach { qid =>
      val qv = emb(qid)
      val pool = emb.keys.filter(_ != qid).toSeq
        .map(c => c -> cos4(qv, emb(c)))
        .sortBy { case (c, rel) => (-rel, c) }.take(Similarity.MmrPool)
      var sel = List.empty[Long]
      (1 to Similarity.MmrSelect).foreach { rk =>
        val scored = pool.filterNot { case (c, _) => sel.contains(c) }
          .map { case (c, rel) =>
            val ms = if (sel.isEmpty) 0L
              else sel.map(sc => bp(cos4(emb(c), emb(sc)))).max
            c -> (7L * bp(rel) - (if (sel.isEmpty) 0L else 3L * ms))
          }
        val pickc = scored.minBy { case (c, s) => (-s, c) }._1
        assert(got((qid, rk)) == pickc,
          s"qid=$qid rk=$rk got=${got((qid, rk))} brute=$pickc")
        sel = sel :+ pickc
      }
    }
  }

  test("ev_ab_experiment: sticky balanced arms, null-experiment z below 5") {
    val rows = run("ev_ab_experiment").collect()
    assert(rows.length == 2)
    val Seq(a, b) = rows.toSeq.sortBy(_.getAs[Int]("arm"))
    val (n0, c0) = (a.getAs[Long]("n_users"), a.getAs[Long]("n_converted"))
    val (n1, c1) = (b.getAs[Long]("n_users"), b.getAs[Long]("n_converted"))
    // both arms populated (sf0.001 has only 15 users — md5 parity
    // deterministically lands 12/3 there, so no tight balance bound;
    // the user count conserves exactly)
    assert(n0 > 0 && n1 > 0)
    assert(n0 + n1 ==
      Tables.events(spark, sf).select("user_id").distinct().count())
    assert(a.getAs[Long]("conv_ppm") == c0 * 1000000L / n0)
    assert(c0 <= n0 && c1 <= n1)
    // the float half of the contract: both arms draw from the same
    // distribution (no treatment exists), so when the pooled rate is
    // non-degenerate the two-proportion z statistic must not be
    // significant
    val p = (c0 + c1).toDouble / (n0 + n1)
    if (p > 0.0 && p < 1.0) {
      val (p0, p1) = (c0.toDouble / n0, c1.toDouble / n1)
      val z = (p0 - p1) / math.sqrt(p * (1 - p) * (1.0 / n0 + 1.0 / n1))
      assert(math.abs(z) < 5.0, s"null experiment z=$z")
    }
  }

  test("q_variant: absent path is NULL (never an error), totals cover every event") {
    val rows = run("q_variant").collect()
    val total = rows.map(r => r.getLong(r.fieldIndex("n_events"))).sum
    assert(total == Tables.events(spark, sf).count())
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("n_missing")) == 0L,
        "variant_get('$.payload.missing') must be NULL for every row")
      assert(r.getLong(r.fieldIndex("min_k")) <= r.getLong(r.fieldIndex("max_k")))
    }
  }

  test("src_orc_roundtrip preserves every supplier row and the exact schema") {
    val base = Tables.supplier(spark, sf)
    val rt = run("src_orc_roundtrip")
    assert(rt.schema == base.schema)
    assert(rt.count() == base.count())
    // value-exactness of the DOUBLE column through ORC encoding
    val a = base.select(sum(col("s_acctbal").cast("decimal(18,2)"))).collect().head.getDecimal(0)
    val b = rt.select(sum(col("s_acctbal").cast("decimal(18,2)"))).collect().head.getDecimal(0)
    assert(a == b)
  }
}
