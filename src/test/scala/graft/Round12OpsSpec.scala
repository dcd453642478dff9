package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.HilbertIndex
import graft.operators._

/** Properties of the round-8 session-4 operators: the Hilbert curve's
  * bijection/adjacency/locality, changepoint placement on a planted
  * level shift, compaction-bin invariants, and the k-anonymity bands
  * against a brute-force class census.
  */
class Round12OpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("HilbertIndex: d2xy inverts xy2d across the grid") {
    // deterministic sample: a lattice plus the corners
    val pts = for (x <- 0L until 65536L by 1021L; y <- 0L until 65536L by 977L)
      yield (x, y)
    (pts ++ Seq((0L, 0L), (65535L, 0L), (0L, 65535L), (65535L, 65535L)))
      .foreach { case (x, y) =>
        val d = HilbertIndex.xy2d(x, y)
        assert(d >= 0L && d < (1L << 32))
        assert(HilbertIndex.d2xy(d) == ((x, y)), s"($x,$y) via d=$d")
      }
  }

  test("HilbertIndex: consecutive codes are 4-adjacent cells") {
    // the defining Hilbert property Z-order lacks: |Δx| + |Δy| = 1
    // between every pair of consecutive curve positions
    (0L until 4096L).foreach { d =>
      val (x0, y0) = HilbertIndex.d2xy(d)
      val (x1, y1) = HilbertIndex.d2xy(d + 1)
      assert(math.abs(x1 - x0) + math.abs(y1 - y0) == 1L,
        s"d=$d jumps from ($x0,$y0) to ($x1,$y1)")
    }
    // spot-check the same at a high offset (rotation state differs)
    (1L << 31 until (1L << 31) + 512L).foreach { d =>
      val (x0, y0) = HilbertIndex.d2xy(d)
      val (x1, y1) = HilbertIndex.d2xy(d + 1)
      assert(math.abs(x1 - x0) + math.abs(y1 - y0) == 1L)
    }
  }

  test("pipe_hilbert buckets are quad-tree cells: span < 2^10 per dimension") {
    run("pipe_hilbert").collect().foreach { r =>
      assert(r.getLong(3) - r.getLong(2) < 1024L, s"user span in $r")
      assert(r.getLong(5) - r.getLong(4) < 1024L, s"minute span in $r")
    }
  }

  test("ev_changepoint finds a planted level shift at its boundary") {
    import spark.implicits._
    // 48 hourly observations: level 10 for 24 h, then level 50 —
    // the max of |S_t·N − T·t| must land exactly on the shift
    val base = java.time.Instant.parse("2024-01-01T00:00:00Z")
    val rows = (0 until 48).flatMap { h =>
      val n = if (h < 24) 10 else 50
      (0 until n).map(i =>
        ("shift", java.sql.Timestamp.from(base.plusSeconds(h * 3600L + i))))
    }
    rows.toDF("event_type", "ts").createOrReplaceTempView("cp_events")
    val hourly = spark.table("cp_events")
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    // replay the query's scoring inline on the synthetic frame
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("hour"))
    val best = hourly
      .withColumn("t", row_number().over(w).cast("long"))
      .withColumn("cum", sum(col("n")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .withColumn("nh", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("event_type"))).cast("long"))
      .withColumn("tot", sum(col("n")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("event_type"))))
      .filter(col("t") < col("nh"))
      .withColumn("d", abs(col("cum") * col("nh") - col("tot") * col("t")))
      .orderBy(col("d").desc, col("hour").asc)
      .head()
    // boundary hour = the LAST hour of the low regime (t = 24)
    assert(best.getAs[Long]("t") == 24L, s"split at t=${best.getAs[Long]("t")}")
  }

  test("ev_changepoint on real data: d_num consistent with its parts") {
    run("ev_changepoint").collect().foreach { r =>
      val (d, nh, tot, before) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(d <= nh * tot, s"d_num bound violated in $r")
      assert(before <= tot && nh > 0)
    }
  }

  test("pipe_compaction_bins: contiguous bins, conserved bytes, fill bound") {
    val bins = run("pipe_compaction_bins").collect()
    assert(bins.map(_.getInt(0)).toList == bins.indices.toList,
      "bins must number contiguously from 0")
    val manifest = run("pipe_shard_manifest").collect()
    assert(bins.map(_.getLong(1)).sum == manifest.length.toLong,
      "every input file lands in exactly one bin")
    assert(bins.map(_.getLong(3)).sum ==
      Tables.documents(spark, sf).agg(sum(length(col("text")))).head().getLong(0))
    // next-fit invariant: every bin except the last STARTS before its
    // target span ends, so cumulative bytes through bin b reach
    // (b+1)·target for all b < last
    val target = (bins.map(_.getLong(3)).sum + 3) / 4
    bins.dropRight(1).zipWithIndex.foreach { case (_, i) =>
      val cumThrough = bins.take(i + 1).map(_.getLong(3)).sum
      assert(cumThrough >= (i + 1) * target,
        s"bin $i underfilled: $cumThrough < ${(i + 1) * target}")
    }
    // shard ranges must not interleave across bins
    val ranges = bins.map(r => (r.getString(4), r.getString(5)))
    ranges.sliding(2).foreach {
      case Array((_, hiA), (loB, _)) => assert(hiA < loB)
      case _ =>
    }
  }

  test("ev_trend_theilsen equals brute-force pairwise-slope quantiles") {
    val hourly = Tables.events(spark, sf)
      .groupBy(date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n"))
    val bounds = hourly.agg(min(col("hour")), max(col("hour"))).head()
    val counts = hourly.collect()
      .map(r => r.getTimestamp(0).getTime -> r.getLong(1)).toMap
    val h0 = bounds.getTimestamp(0).getTime
    val h1 = bounds.getTimestamp(1).getTime
    val series = (h0 to h1 by 3600000L).map(t => counts.getOrElse(t, 0L))
    val slopes = (for {
      i <- series.indices; j <- (i + 1) until series.length
    } yield (series(j) - series(i)).toDouble / (j - i)).sorted
    val n = slopes.length.toLong
    val want = Map(
      "slope_p10" -> slopes(((n + 9) / 10 - 1).toInt),
      "slope_p50" -> slopes(((n + 1) / 2 - 1).toInt),
      "slope_p90" -> slopes(((9 * n + 9) / 10 - 1).toInt))
    val got = run("ev_trend_theilsen").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == want, s"got $got want $want")
  }

  test("pipe_epoch_order: full 20-row prefixes, epochs genuinely differ") {
    val rows = run("pipe_epoch_order").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    (0 to 2).foreach { e =>
      val epoch = rows.filter(_._1 == e)
      assert(epoch.map(_._2).toList == (1 to 20).toList, s"epoch $e positions")
    }
    // a reproducible shuffle that didn't shuffle would repeat the order
    val orders = (0 to 2).map(e => rows.filter(_._1 == e).map(_._3).toList)
    assert(orders.distinct.length == 3, "epoch orders must differ")
  }

  test("pipe_cdc_replay: last-writer-wins state matches a replayed log") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"),
        substring(md5(col("doc_id").cast("string")), 1, 4).as("h4"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def md5s(x: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val want = docs.flatMap { case (id, text, h4) =>
      if (h4 >= "4000" && h4 < "4800") Some(id -> (md5s(text + " v3r"), 3L))
      else if (h4 < "1000") Some(id -> (md5s(text + " v3"), 3L))
      else if (h4 < "4000") Some(id -> (md5s(text + " v2"), 2L))
      else if (h4 < "5000") None // deleted, not re-inserted
      else Some(id -> (md5s(text), 1L))
    }.toMap
    val got = run("pipe_cdc_replay").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(got == want,
      s"${(got.keySet -- want.keySet).take(3)} extra, " +
        s"${(want.keySet -- got.keySet).take(3)} missing")
  }

  test("ss_matryoshka_recall: 5-deep truth, recall consistent") {
    val rows = run("ss_matryoshka_recall").collect()
    assert(rows.map(r => (r.getInt(0),
        r.getAs[Number]("query_id").intValue)).toSet ==
      (for (d <- Set(16, 32); q <- 100 to 104) yield (d, q)))
    rows.foreach { r =>
      val (nTrue, nHits, recall) = (r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(nTrue == 5L && nHits >= 0L && nHits <= 5L)
      assert(math.abs(recall - nHits.toDouble / 5.0) < 1e-9)
    }
  }

  test("q_skyline: no survivor dominated, no dominator dropped") {
    val pts = Tables.lineitem(spark, sf)
      .groupBy(col("l_quantity").cast("long").as("x"), col("l_extendedprice").as("y"))
      .count().collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    def dominated(p: (Long, Double)) = pts.exists { case (qx, qy, _) =>
      qx >= p._1 && qy >= p._2 && (qx > p._1 || qy > p._2)
    }
    val want = pts.filter(p => !dominated((p._1, p._2))).toSet
    val got = run("q_skyline").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    assert(got == want, s"skyline mismatch: extra ${(got -- want).take(3)}, " +
      s"missing ${(want -- got).take(3)}")
  }

  test("mm_silence_spans matches a brute-force run-length scan of the text") {
    val texts = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = run("mm_silence_spans").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
    got.foreach { case (id, (n, mx, tot)) =>
      val runs = texts(id).toCharArray
        .map(c => math.abs((c.toInt - 128) * 256) < 16384)
        .foldLeft(List(0L)) { (acc, silent) =>
          if (silent) (acc.head + 1) :: acc.tail else 0L :: acc
        }
        .filter(_ >= operators.Multimodal.MinSilenceSpan)
      assert((n, mx, tot) ==
        ((runs.length.toLong, if (runs.isEmpty) 0L else runs.max, runs.sum)),
        s"doc $id")
    }
  }

  test("dd_winnowing: density guarantee and duplicate-text invariance") {
    import org.apache.spark.sql.expressions.Window
    // replicate the pick stream with positions kept, assert the
    // winnowing guarantee: every WinnowW-window has a fingerprint,
    // i.e. consecutive pick positions gap by at most WinnowW
    val w = Dedup.WinnowW
    val g = Tables.documents(spark, sf)
      .select(col("doc_id"),
        posexplode(graft.operators.TextOps.shinglesOf(col("text")))
          .as(Seq("pos", "sh")))
      .withColumn("h", conv(substring(md5(col("sh")), 1, 13), 16, 10).cast("long"))
      .withColumn("key", col("h") * 2048L + (lit(2047L) - col("pos")))
    val picks = g
      .withColumn("pick", min(col("key")).over(
        Window.partitionBy(col("doc_id")).orderBy(col("pos"))
          .rowsBetween(0, w - 1)))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("doc_id"))))
      .filter(col("pos") <= greatest(lit(0L), col("n") - w))
      .select(col("doc_id"), (lit(2047L) - col("pick") % 2048L).as("ppos"))
      .distinct().collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).sorted).toMap
    picks.foreach { case (id, ps) =>
      assert(ps.head <= w - 1, s"doc $id first pick ${ps.head}")
      ps.sliding(2).foreach {
        case Array(a, b) => assert(b - a <= w, s"doc $id gap $a -> $b")
        case _ =>
      }
    }
    // the winnowing guarantee: a shared token run of length
    // ≥ WinnowW + 3 − 1 = 6 produces an identical fingerprint HASH in
    // both docs (position-independent), regardless of surrounding text
    import spark.implicits._
    val shared = "alpha beta gamma delta epsilon zeta"
    val docs = Seq(
      (1L, s"one two $shared three four five six seven"),
      (2L, s"red orange yellow green blue $shared indigo violet"))
      .toDF("doc_id", "text")
    val sPicks = docs
      .select(col("doc_id"),
        posexplode(graft.operators.TextOps.shinglesOf(col("text")))
          .as(Seq("pos", "sh")))
      .withColumn("h", conv(substring(md5(col("sh")), 1, 13), 16, 10).cast("long"))
      .withColumn("key", col("h") * 2048L + (lit(2047L) - col("pos")))
      .withColumn("pick", min(col("key")).over(
        Window.partitionBy(col("doc_id")).orderBy(col("pos"))
          .rowsBetween(0, w - 1)))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("doc_id"))))
      .filter(col("pos") <= greatest(lit(0L), col("n") - w))
      .select(col("doc_id"), expr("pick DIV 2048").as("fph"))
      .distinct().collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    assert((sPicks(1L) intersect sPicks(2L)).nonEmpty,
      "docs sharing a 6-token run must share a fingerprint hash")
  }

  test("ta_readability counts match a direct recomputation") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = run("ta_readability").collect()
    assert(rows.length == docs.size)
    rows.foreach { r =>
      val text = docs(r.getLong(0))
      val sents = text.split("[.!?]+").map(_.trim).count(_.nonEmpty)
      val toks = text.split(" ").filter(_.nonEmpty)
      val syl = toks.map(t =>
        math.max("[aeiouy]+".r.findAllIn(t.toLowerCase).length, 1).toLong).sum
      assert(r.getLong(1) == toks.length.toLong, s"words for doc ${r.getLong(0)}")
      assert(r.getLong(2) == sents.toLong, s"sents for doc ${r.getLong(0)}")
      assert(r.getLong(3) == syl, s"syllables for doc ${r.getLong(0)}")
      if (toks.nonEmpty && sents > 0) {
        val fk = 0.39 * (toks.length.toDouble / sents) +
          11.8 * (syl.toDouble / toks.length) - 15.59
        assert(math.abs(r.getDouble(4) - fk) < 1e-3, s"fk for doc ${r.getLong(0)}")
      }
    }
  }

  test("ev_interpolate equals a per-user brute-force lerp") {
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"),
        expr("unix_micros(ts)").as("tus"), col("event_type"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getDouble(4)))
    val viewsByUser = ev.filter(_._4 == "view")
      .groupBy(_._2).view.mapValues { vs =>
        vs.groupBy(_._3).map { case (t, g) => t -> g.map(_._5).max }
          .toArray.sortBy(_._1)
      }.toMap
    val got = run("ev_interpolate").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .toMap
    ev.filter(_._4 == "click").foreach { case (id, user, t, _, _) =>
      val vs = viewsByUser.getOrElse(user, Array.empty[(Long, Double)])
      val before = vs.filter(_._1 <= t).lastOption
      val after = vs.filter(_._1 >= t).headOption
      val want = (before, after) match {
        case (None, None) => None
        case (Some((_, v)), None) => Some(v)
        case (None, Some((_, v))) => Some(v)
        case (Some((tb, vb)), Some((tf, vf))) if tb == tf => Some(vb)
        case (Some((tb, vb)), Some((tf, vf))) =>
          Some(vb + (vf - vb) * ((t - tb).toDouble / (tf - tb).toDouble))
      }
      (got(id), want) match {
        case (None, None) =>
        case (Some(g), Some(w)) => assert(math.abs(g - w) < 1e-3, s"click $id")
        case other => fail(s"click $id: $other")
      }
    }
  }

  test("q_mode equals a brute-force frequency argmax with smallest-value ties") {
    val counts = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"), col("l_quantity").cast("long"))
      .count().collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val want = counts.groupBy(_._1).view.mapValues(g =>
      g.minBy(x => (-x._3, x._2))).values
      .map(x => (x._1, x._2, x._3)).toSet
    val got = run("q_mode").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
  }

  test("ev_markov_stationary equals a replayed power iteration") {
    val tr = run("ev_markov").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(3)))
    val states = tr.map(_._1).distinct.sorted
    var pi = states.map(_ -> 1000000L / states.length).toMap
    (1 to operators.EventQueries.MarkovPowerRounds).foreach { _ =>
      val next = tr.groupBy(_._2).map { case (nxt, es) =>
        nxt -> es.map(e => pi.getOrElse(e._1, 0L) * e._3).sum / 1000000L
      }
      pi = next
    }
    val got = run("ev_markov_stationary").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == pi, s"got $got want $pi")
    // mass conserved up to per-entry floor drift
    val total = got.values.sum
    assert(total <= 1000000L && total > 900000L, s"mass $total")
  }

  test("ev_seasonal_profile: bounded cells, shares sum to ~1e6 per weekday") {
    val rows = run("ev_seasonal_profile").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(rows.length <= 168)
    assert(rows.forall(r => r._1 >= 1 && r._1 <= 7 && r._2 >= 0 && r._2 <= 23))
    rows.groupBy(_._1).foreach { case (dow, cells) =>
      val s = cells.map(_._4).sum
      assert(s <= 1000000L && s > 1000000L - 24, s"dow $dow shares sum $s")
    }
    val total = Tables.events(spark, sf).count()
    assert(rows.map(_._3).sum == total)
  }

  test("mm_pgm_tiles: quadrants tile the image; brightest is the tie-broken argmax") {
    val sums = run("mm_decode_pgm").collect()
      .map(r => r.getLong(0) -> r.getLong(5)).toMap // doc_id -> pixel_sum
    run("mm_pgm_tiles").collect().foreach { r =>
      val qs = Seq(r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(qs.sum == sums(r.getLong(0)),
        s"doc ${r.getLong(0)} quadrants don't tile the raster")
      val b = r.getInt(5)
      assert(qs(b) == qs.max)
      assert(qs.indexOf(qs.max) == b, s"tie order for doc ${r.getLong(0)}")
    }
  }

  test("ta_code_detect matches a direct character census") {
    val texts = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    run("ta_code_detect").collect().foreach { r =>
      val t = texts(r.getLong(0))
      val code = t.count("{};=()<>[]".contains(_)).toLong
      val digits = t.count(_.isDigit).toLong
      assert(r.getLong(2) == code && r.getLong(3) == digits,
        s"doc ${r.getLong(0)}")
      if (t.nonEmpty) {
        assert(r.getLong(4) == code * 10000L / t.length)
        assert(r.getInt(6) == (if (code * 10000L / t.length >= 150L) 1 else 0))
      }
    }
  }

  test("ev_haar_energy equals a replayed Haar pyramid") {
    val hourly = Tables.events(spark, sf)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getLong(2)))
    val want = hourly.groupBy(_._1).flatMap { case (et, rows) =>
      val byHour = rows.map(r => r._2 -> r._3).toMap
      val h0 = rows.map(_._2).min; val h1 = rows.map(_._2).max
      var series = (h0 to h1 by 3600000L).map(t => byHour.getOrElse(t, 0L))
      (1 to operators.EventQueries.HaarLevels).map { l =>
        val paired = series.grouped(2).map { g =>
          val a = g.head; val b = if (g.length > 1) g(1) else 0L
          (a + b, math.abs(a - b))
        }.toVector
        series = paired.map(_._1)
        (et, l, paired.map(_._2).sum)
      }
    }.toSet
    val got = run("ev_haar_energy").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(got == want, s"extra ${(got -- want).take(3)}, missing ${(want -- got).take(3)}")
  }

  test("q_not_in_null pins three-valued logic: NOT IN with a NULL is empty") {
    val r = run("q_not_in_null").collect().head
    assert(r.getLong(0) == 0L, "NOT IN over a NULL-bearing set can never be TRUE")
    assert(r.getLong(2) > 0L, "the subquery must actually contain NULLs")
    assert(r.getLong(1) > 0L, "NOT EXISTS must still find the unmatched orders")
  }

  test("q_rel_division equals the brute-force universal quantifier") {
    val ev = Tables.events(spark, sf).select("user_id", "event_type").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val allTypes = ev.map(_._2).toSet
    val want = ev.groupBy(_._1).filter(_._2.map(_._2).toSet == allTypes)
      .keySet
    val got = run("q_rel_division").collect().map(_.getLong(0)).toSet
    assert(got == want)
  }

  test("ev_session_quantiles: ranks drawn from real session durations") {
    val durs = Tables.events(spark, sf)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg((expr("unix_micros(max(ts)) - unix_micros(min(ts))") / 1000000L)
        .cast("long").as("d"))
      .collect().map(_.getLong(2)).sorted
    val got = run("ev_session_quantiles").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    def kth(k: Long) = durs((k - 1).toInt).toDouble
    val n = durs.length.toLong
    assert(got("p50") == kth((n + 1) / 2))
    assert(got("p90") == kth((9 * n + 9) / 10))
    assert(got("p99") == kth((99 * n + 99) / 100))
  }

  test("pipe_curve_compare: both curves respect the quad-tree span bound") {
    val rows = run("pipe_curve_compare").collect()
    assert(rows.map(_.getString(0)).toSet == Set("hilbert", "zorder"))
    rows.foreach { r =>
      assert(r.getLong(3) < 1024L, s"${r.getString(0)} max user span")
      assert(r.getLong(5) < 1024L, s"${r.getString(0)} max minute span")
      assert(r.getLong(1) > 0L)
    }
  }

  test("ev_assoc_rules: symmetric counts, confidence bounds, lift identity") {
    val rows = run("ev_assoc_rules").collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getLong(7)))).toMap
    val nUsers = Tables.events(spark, sf).select("user_id").distinct().count()
    rows.foreach { case ((a, b), (both, na, nb, sup, conf, lift)) =>
      assert(both <= na && both <= nb, s"$a->$b counts")
      // n_both is symmetric; support too
      assert(rows((b, a))._1 == both, s"$a->$b asymmetric n_both")
      assert(sup == both * 1000000L / nUsers)
      assert(conf == both * 1000000L / na)
      assert(lift == both * nUsers * 1000000L / (na * nb))
      // lift is symmetric by the identity
      assert(rows((b, a))._6 == lift, s"$a->$b asymmetric lift")
    }
  }

  test("q_sequence_gaps reconciles with the total key census") {
    val rows = run("q_sequence_gaps").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val total = Tables.orders(spark, sf).count()
    assert(rows.map(_._2).sum == total, "present counts must sum to the table")
    rows.foreach { case (blk, n, lo, hi, miss) =>
      assert(lo / 4096 == blk && hi / 4096 == blk, s"block $blk bounds")
      assert(miss == hi - lo + 1 - n && miss >= 0, s"block $blk gap math")
    }
  }

  test("ss_filtered_topk: every hit satisfies the predicate; subset of eligible") {
    val rows = run("ss_filtered_topk").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val cand = r.getAs[Number]("vec_id").longValue
      assert(cand % 3 == 0, s"candidate $cand violates the filter")
    }
    // per query at most K hits, ranks contiguous from 1
    rows.groupBy(_.getAs[Number]("query_id").intValue).foreach { case (q, g) =>
      val rks = g.map(_.getAs[Int]("rn")).sorted
      assert(rks.toList == (1 to rks.length).toList, s"query $q ranks")
    }
  }

  test("ev_gini equals the classic sorted-rank formula") {
    val counts = Tables.events(spark, sf).groupBy("user_id")
      .agg(count(lit(1)).as("c")).collect().map(_.getLong(1)).sorted
    val n = counts.length.toLong
    val s = counts.sum
    val num = 2L * counts.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum -
      (n + 1) * s
    val r = run("ev_gini").collect().head
    assert(r.getLong(0) == n && r.getLong(1) == s)
    assert(r.getLong(2) == num && r.getLong(3) == n * s)
    assert(r.getLong(4) == num * 1000000L / (n * s))
  }

  test("ta_burstiness equals a brute-force tf/df top-25") {
    val perDoc = Tables.documents(spark, sf)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("doc_id", "w").count().collect()
      .map(r => (r.getString(1), r.getLong(2)))
    val want = perDoc.groupBy(_._1).map { case (w, g) =>
      (w, g.length.toLong, g.map(_._2).sum, g.map(_._2).max)
    }.filter(_._3 >= 10L)
      .map { case (w, df, tf, mx) => (w, df, tf, mx, tf * 1000000L / df) }
      .toSeq.sortBy(t => (-t._5, t._1)).take(25)
    val got = run("ta_burstiness").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == want)
  }

  test("dd_ppr_seed: seed ranks first; unreachable nodes stay at zero") {
    val rows = run("dd_ppr_seed").collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(rows.nonEmpty)
    val seed = rows.map(_._1).min
    val seedRank = rows.toMap.apply(seed)
    assert(rows.forall(_._2 <= seedRank),
      "teleporting all jump mass to the seed must rank it first")
    assert(rows.map(_._2).sum <= 1000000L, "mass never exceeds the unit")
    // the global rank (dd_pagerank) spreads mass everywhere — PPR must
    // concentrate: some node outside the seed's component sits at 0
    // unless the graph is one component
    val zeros = rows.count(_._2 == 0L)
    val nonzero = rows.count(_._2 > 0L)
    assert(nonzero >= 1)
    assert(zeros + nonzero == rows.length)
  }

  test("dd_modularity: Newman identities hold against the pair graph") {
    val pairs = SparkEntry.queries("dd_ngram_jaccard")(spark, sf)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val m = pairs.length.toLong
    val rows = run("dd_modularity").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // degree mass: Σ tot_c = 2m; edges partition: Σ in_c ≤ m
    assert(rows.map(_._4).sum == 2 * m, "total degree must be 2m")
    assert(rows.map(_._3).sum <= m)
    rows.foreach { case (c, nm, in, tot, qn) =>
      assert(qn == 4 * m * in - tot * tot, s"community $c q_num")
      assert(nm > 0 && tot >= in)
    }
    // every pair with both ends in one community is counted there
    val labels = SparkEntry.queries("dd_label_prop")(spark, sf)
      .select("doc_id", "community_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val wantIn = pairs.filter { case (a, b) => labels(a) == labels(b) }
      .groupBy(p => labels(p._1)).view.mapValues(_.length.toLong).toMap
    rows.foreach { case (c, _, in, _, _) =>
      assert(wantIn.getOrElse(c, 0L) == in, s"community $c in_edges")
    }
  }

  test("ta_heaps_curve: monotone, final step equals the whole corpus") {
    val rows = run("ta_heaps_curve").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toList == (0 to 15).toList)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b._2 >= a._2 && b._3 >= a._3 && b._4 >= a._4,
          s"curve must be monotone at step ${b._1}")
      case _ =>
    }
    val docs = Tables.documents(spark, sf)
    val last = rows.last
    assert(last._2 == docs.count())
    val vocab = docs.select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "").agg(count_distinct(col("w"))).head().getLong(0)
    assert(last._4 == vocab, "step 15 vocabulary must be the full corpus's")
    // each prefix's vocab equals a direct distinct-count on that subset
    val nib7 = docs
      .filter(conv(substring(md5(col("doc_id").cast("string")), 1, 1), 16, 10)
        .cast("int") <= 7)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "").agg(count_distinct(col("w"))).head().getLong(0)
    assert(rows(7)._4 == nib7, "min-nibble attribution must equal direct distinct")
  }

  test("dd_medoid: one medoid per cluster, maximal mass, member of cluster") {
    val clusters = SparkEntry.queries("dd_clusters")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap // doc -> cluster
    val pairs = SparkEntry.queries("dd_ngram_jaccard")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    val mass = pairs.flatMap { case (a, b, j) =>
      val bp = math.floor(j * 10000).toLong
      Seq(a -> bp, b -> bp)
    }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val rows = run("dd_medoid").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).distinct.length == rows.length)
    assert(rows.map(_._1).toSet == clusters.values.toSet,
      "one medoid per connected component")
    rows.foreach { case (c, medoid, nm, mbp) =>
      assert(clusters(medoid) == c, s"medoid $medoid not in cluster $c")
      assert(mbp == mass(medoid), s"mass mismatch for $medoid")
      val members = clusters.filter(_._2 == c).keys
      assert(nm == members.size.toLong)
      assert(members.forall(d => mass(d) < mbp ||
        (mass(d) == mbp && d >= medoid)), s"cluster $c has a better medoid")
    }
  }

  test("ev_absorption equals a replayed first-passage recurrence") {
    val tr = run("ev_markov").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(3)))
    val states = (tr.map(_._1) ++ tr.map(_._2)).distinct.sorted
    var am = states.map(s => s -> (if (s == "purchase") 1000000L else 0L)).toMap
    (1 to operators.EventQueries.MarkovPowerRounds).foreach { _ =>
      val stepped = tr.groupBy(_._1).map { case (cur, es) =>
        cur -> es.map(e => e._3 * am(e._2)).sum / 1000000L
      }
      am = states.map(s => s ->
        (if (s == "purchase") 1000000L else stepped.getOrElse(s, 0L))).toMap
    }
    val got = run("ev_absorption").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == am, s"got $got want $am")
    // probabilities are probabilities, the absorber is certain, and
    // more steps can only help (monotone in k by construction)
    assert(got("purchase") == 1000000L)
    assert(got.values.forall(v => v >= 0L && v <= 1000000L))
  }

  test("ta_bpe_fertility: conservation against the encode table") {
    val r = run("ta_bpe_fertility").collect().head
    val (nv, nwo, nso, whole, mx, fert) = (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
    // symbol occurrences reconcile with ta_bpe_encode's per-symbol sums
    val encTotal = run("ta_bpe_encode").collect().map(_.getLong(1)).sum
    assert(nso == encTotal, "Σ wc·|syms| must equal Σ per-symbol n_occ")
    // word occurrences = corpus token count
    val nTokens = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "").count()
    assert(nwo == nTokens)
    assert(fert == nso * 1000000L / nwo && fert >= 1000000L)
    assert(whole <= nv && mx >= 1L)
  }

  test("pipe_k_anonymity bands agree with a brute-force class census") {
    val classes = Tables.documents(spark, sf)
      .groupBy(col("lang"), col("source"),
        length(col("n_chars").cast("string")))
      .count().collect().map(_.getLong(3))
    val expected = Map(
      "1_unique" -> classes.filter(_ == 1L),
      "2_small" -> classes.filter(c => c > 1L && c < 5L),
      "3_anonymous" -> classes.filter(_ >= 5L))
    val got = run("pipe_k_anonymity").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    expected.foreach { case (band, sizes) =>
      if (sizes.nonEmpty) {
        assert(got(band) == ((sizes.length.toLong, sizes.sum)),
          s"$band: got ${got(band)}, want (${sizes.length}, ${sizes.sum})")
      } else assert(!got.contains(band))
    }
  }
}
