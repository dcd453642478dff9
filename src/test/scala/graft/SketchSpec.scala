package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SketchQueries

/** The float half of the sketch contracts: the oracle gate
  * (scripts/check.py) verifies the INTEGER registers/cells/estimates
  * cross-engine; these tests pin the standard floating-point estimator
  * forms — raw HLL alpha·m²/Z and linear counting — single-engine with
  * epsilons, per the SCALE.md determinism doctrine (libm stays out of
  * the cross-engine contract, never out of the testing).
  */
class SketchSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("sk_hll_estimate: fixed-point estimate within 15% of exact") {
    val r = run("sk_hll_estimate").collect().head
    val (est, exact) = (r.getAs[Long]("est_distinct"), r.getAs[Long]("exact_distinct"))
    assert(exact > 640L, s"corpus left the raw-HLL regime (n=$exact <= 2.5m)")
    assert(math.abs(est - exact).toDouble / exact <= 0.15, s"est=$est exact=$exact")
  }

  test("sk_hll_estimate: fixed-point tracks the float alpha*m2/Z form") {
    // Recompute the textbook estimator from the register table with
    // real doubles and uncapped rho; the integer fixed-point answer
    // must sit within 0.5% of it (the 2^-20 truncation bound).
    val m = SketchQueries.HllRegisters
    val regs = run("sk_hll_registers").collect()
      .map(r => r.getAs[Int]("reg") -> r.getAs[Int]("rho")).toMap
    val z = (0 until m).map(reg => math.pow(2.0, -regs.getOrElse(reg, 0).toDouble)).sum
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val floatEst = alpha * m * m / z
    val intEst = run("sk_hll_estimate").collect().head.getAs[Long]("est_distinct")
    assert(math.abs(intEst - floatEst) / floatEst <= 0.005,
      s"fixed-point $intEst vs float $floatEst")
  }

  test("sk_hll_merge: merged halves equal the direct full-corpus sketch") {
    val merged = run("sk_hll_merge").collect().head
    val direct = run("sk_hll_estimate").collect().head
    assert(merged == direct, s"merge-of-partials $merged != rescan $direct")
  }

  test("sk_hll_registers: full occupancy and rho range at this cardinality") {
    val rows = run("sk_hll_registers").collect()
    // P(any of 256 registers empty | ~16k distinct keys) ~ 256*e^-64.
    assert(rows.length == SketchQueries.HllRegisters)
    rows.foreach { r =>
      val (reg, rho) = (r.getAs[Int]("reg"), r.getAs[Int]("rho"))
      assert(reg >= 0 && reg < 256 && rho >= 1 && rho <= 53, s"($reg, $rho)")
    }
  }

  test("linear counting covers the regime the raw estimator leaves") {
    // The ~31-word token vocabulary is far below 2.5m — exactly where
    // raw HLL overestimates and the standard correction switches to
    // linear counting est = m*ln(m/V). Sketch the TOKENS here (the
    // shipped queries deliberately sketch shingles instead; this test
    // documents why) and check the corrected form lands near exact.
    val toks = graft.Tables.documents(spark, sf)
      .select(explode(graft.operators.TextOps.tokens(col("text"))).as("key"))
      .withColumn("h", md5(col("key")))
    val nSet = SketchQueries.hllRegRho(toks)
      .groupBy("reg").agg(max(col("rho")).as("rho")).count()
    val exact = toks.select("key").distinct().count()
    val m = SketchQueries.HllRegisters.toDouble
    val v = m - nSet
    assert(v > 0, "no empty registers — linear counting not applicable")
    val lc = m * math.log(m / v)
    assert(math.abs(lc - exact) / exact <= 0.25, s"lc=$lc exact=$exact")
  }

  test("sk_cms_heavy: one-sided error, and the min over rows resolves some keys") {
    val rows = run("sk_cms_heavy").collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.getAs[Long]("est_cnt") >= r.getAs[Long]("exact_cnt"),
        s"CMS undercounted: $r")
    }
    assert(rows.exists(r => r.getAs[Long]("est_cnt") == r.getAs[Long]("exact_cnt")),
      "no collision-free cell among top-10 at w=16 — geometry wrong?")
  }

  test("st_hll_registers: the streaming fold lands on the identical sketch") {
    // Batch and streaming compute the same register table — the
    // mergeable-across-TIME half of the monoid argument, asserted
    // Spark-side on top of the shared oracle SQL. The streaming run
    // drains 8 staged files 2 per trigger, so this covers a genuine
    // multi-batch incremental max-merge.
    val stream = SparkEntry.queries("st_hll_registers")(spark, sf).collect()
    val batch = SparkEntry.queries("sk_hll_registers")(spark, sf).collect()
    assert(stream.toSeq == batch.toSeq)
  }

  test("ta_collocations: gates hold and ordering is by lift") {
    import graft.operators.TextAnalysis
    val rows = run("ta_collocations").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("c12") >= TextAnalysis.CollocMinSupport)
      assert(r.getAs[Long]("lift_micro") >= TextAnalysis.CollocMinLiftMicro)
    }
    val lifts = rows.map(_.getAs[Long]("lift_micro")).toSeq
    assert(lifts == lifts.sorted.reverse, "not ordered by lift desc")
  }

  test("sk_kmv_intersect: theta-sample intersection lands near the exact overlap") {
    val r = run("sk_kmv_intersect").collect().head
    val (est, exact) = (r.getAs[Long]("est_inter"), r.getAs[Long]("exact_inter"))
    assert(exact > 0, "halves share no shingles — corpus changed?")
    assert(math.abs(est - exact).toDouble / exact <= 0.30, s"est=$est exact=$exact")
    // the same theta sample's union view should land near the full
    // corpus distinct count (est_a + est_b - est_inter)
    val union = r.getAs[Long]("est_a") + r.getAs[Long]("est_b") - est
    val total = run("sk_kmv_distinct").collect().head.getAs[Long]("exact_distinct")
    assert(math.abs(union - total).toDouble / total <= 0.25, s"union=$union total=$total")
  }

  test("ta_quality_calibration: rates bounded, discriminative, docs conserved") {
    val rows = run("ta_quality_calibration").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ppm = r.getAs[Long]("pass_ppm")
      assert(ppm >= 0L && ppm <= 1000000L)
      assert(r.getAs[Long]("n_pass") <= r.getAs[Long]("n_docs"))
    }
    // higher-score bins pass the teacher gate more often than the lowest
    assert(rows.last.getAs[Long]("pass_ppm") > rows.head.getAs[Long]("pass_ppm"),
      "no discrimination between lowest and highest score bins")
    val totalDocs = rows.map(_.getAs[Long]("n_docs")).sum
    assert(totalDocs == graft.Tables.documents(spark, sf).count())
  }

  test("sk_bloom_probe: one-sided membership, FPR near the fill-rate prediction") {
    val r = run("sk_bloom_probe").collect().head
    val bits = r.getAs[Long]("n_bits_set")
    val (na, nb) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))
    val (hits, common) = (r.getAs[Long]("bloom_hits"), r.getAs[Long]("exact_common"))
    // no false negatives, ever — every true member's bits are set
    assert(hits >= common, s"hits=$hits < common=$common")
    assert(hits <= nb && common <= math.min(na, nb))
    // measured FPR on the non-member probes tracks fill^k (loose 3x band:
    // the bound is an independence approximation, not a guarantee)
    val fill = bits.toDouble / SketchQueries.BloomBits
    val predicted = math.pow(fill, SketchQueries.BloomHashes.toDouble)
    val measured = (hits - common).toDouble / math.max(1L, nb - common)
    assert(measured <= 3.0 * predicted + 0.01,
      s"measured FPR $measured vs predicted $predicted")
  }

  test("sk_theta_diff: difference estimate within 25%, union dominates") {
    val r = run("sk_theta_diff").collect().head
    val (estNew, estUnion) = (r.getAs[Long]("est_new"), r.getAs[Long]("est_union"))
    val exactNew = r.getAs[Long]("exact_new")
    assert(math.abs(estNew - exactNew).toDouble / exactNew <= 0.25,
      s"est_new=$estNew exact=$exactNew")
    assert(estUnion >= estNew, "union sample cannot be smaller than a difference")
  }

  test("sk_kmv_distinct: k filled, estimate within 25% of exact") {
    val r = run("sk_kmv_distinct").collect().head
    assert(r.getAs[Long]("k") == SketchQueries.KmvK.toLong)
    val (est, exact) = (r.getAs[Long]("est_distinct"), r.getAs[Long]("exact_distinct"))
    assert(math.abs(est - exact).toDouble / exact <= 0.25, s"est=$est exact=$exact")
  }
}
