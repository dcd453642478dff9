package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators._

/** Properties of the round-8 operators: k-core peeling, rendezvous
  * sharding, hard-negative mining, the watermark audit, skew
  * profiling, diversity sampling, the C4 filter battery, length
  * bucketing, alpha sampling, novelty, the dedup ablation and
  * schema-evolved reads. Synthetic ground truths where the semantics
  * have a closed form; structural invariants on sf0.001 otherwise.
  */
class Round8OpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  val sf = "/root/testdata/sf0.001"
  import spark.implicits._

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("kcoreMembers: triangle survives the 2-core, attached tail unravels") {
    // triangle 1-2-3 with a 3-node tail 3-4-5-6: every tail node sits
    // on a chain whose endpoint has degree 1, so peeling removes one
    // layer per round; the triangle's nodes keep degree 2 forever.
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
      .toDF("doc_a", "doc_b")
    val got = GraphQueries.kcoreMembers(pairs).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got == Map(1L -> true, 2L -> true, 3L -> true,
      4L -> false, 5L -> false, 6L -> false))
  }

  test("kcoreMembers: a pure path fully unravels within the fixed rounds") {
    val pairs = (1L to 9L).sliding(2).map(p => (p(0), p(1))).toSeq
      .toDF("doc_a", "doc_b")
    val got = GraphQueries.kcoreMembers(pairs).collect()
    assert(got.forall(!_.getBoolean(1))) // 9-node path: gone in ≤4 rounds
  }

  test("pipe_rendezvous_shards: HRW moves a fraction near 2/10, mod-N near 9/10") {
    val rows = run("pipe_rendezvous_shards").collect()
      .map(r => r.getString(r.fieldIndex("method")) ->
        r.getDouble(r.fieldIndex("moved4"))).toMap
    assert(rows("hrw") < rows("mod")) // the whole point of HRW
    assert(rows("hrw") < 0.45)        // expectation 0.2; loose for small n
    assert(rows("mod") > 0.6)         // expectation 0.9
  }

  test("ss_hard_negatives: every pair inside the band, ≤3 per anchor") {
    val rows = run("ss_hard_negatives").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val cos = r.getDouble(r.fieldIndex("cos"))
      assert(cos >= RankQueries.HnLo && cos < RankQueries.HnHi)
      assert(r.getInt(r.fieldIndex("rn")) <= 3)
    }
  }

  test("ev_watermark_audit: classes partition the event count") {
    val rows = run("ev_watermark_audit").collect()
    val n = rows.map(r => r.getLong(r.fieldIndex("n_events"))).sum
    val total = Tables.events(spark, sf).count()
    assert(n == total)
    // the hash jitter genuinely disorders some arrivals
    val byCls = rows.map(r => r.getString(r.fieldIndex("cls")) ->
      r.getLong(r.fieldIndex("n_events"))).toMap
    assert(byCls.getOrElse("a_inorder", 0L) > 0L)
    assert(n - byCls.getOrElse("a_inorder", 0L) > 0L)
  }

  test("ev_skew_profile: one row, salt ≥ 1, skew ≥ 1, totals match") {
    val rows = run("ev_skew_profile").collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getLong(r.fieldIndex("n_rows")) == Tables.events(spark, sf).count())
    assert(r.getLong(r.fieldIndex("suggested_salt")) >= 1L)
    assert(r.getDouble(r.fieldIndex("skew4")) >= 1.0) // max ≥ mean, always
  }

  test("ss_diversity_sample: occupancies cover the corpus, reps well-formed") {
    val rows = run("ss_diversity_sample").collect()
    assert(rows.length <= PipelineQueries.NumCentroids && rows.nonEmpty)
    val covered = rows.map(r => r.getLong(r.fieldIndex("n_vectors"))).sum
    assert(covered == Tables.embeddings(spark, sf).count())
    rows.foreach(r => assert(r.getLong(r.fieldIndex("rep_dm")) >= 0L))
  }

  test("pipe_c4_filters: per-rule failures and survivors bounded by doc count") {
    val rows = run("pipe_c4_filters").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getLong(r.fieldIndex("n_docs"))
      Seq("n_short", "n_long", "n_wordlen", "n_brace", "n_lorem",
        "n_stopfail", "n_pass").foreach { c =>
        val v = r.getLong(r.fieldIndex(c))
        assert(v >= 0L && v <= n, s"$c=$v out of [0,$n]")
      }
    }
  }

  test("pipe_length_buckets: pow2 caps; bucketing never pads more than global") {
    val rows = run("pipe_length_buckets").collect()
    val (bk, gl) = rows.partition(r => r.getString(r.fieldIndex("layout")) == "bucketed")
    assert(gl.length == 1 && bk.nonEmpty)
    bk.foreach { r =>
      val cap = r.getLong(r.fieldIndex("cap"))
      assert((cap & (cap - 1)) == 0L && cap >= 1L, s"cap $cap not a power of two")
    }
    val bkDocs = bk.map(r => r.getLong(r.fieldIndex("n_docs"))).sum
    val gr = gl.head
    assert(bkDocs == gr.getLong(gr.fieldIndex("n_docs")))
    val bkPadded = bk.map(r =>
      r.getLong(r.fieldIndex("cap")) * r.getLong(r.fieldIndex("n_docs"))).sum
    val glPadded = gr.getLong(gr.fieldIndex("cap")) * gr.getLong(gr.fieldIndex("n_docs"))
    assert(bkPadded <= glPadded) // bucketed batching strictly reduces padding
  }

  test("pipe_lang_alpha_weights: temperature flattens — small langs boosted") {
    val rows = run("pipe_lang_alpha_weights").collect()
    assert(rows.length >= 2)
    val byTokens = rows.sortBy(r => r.getLong(r.fieldIndex("tokens")))
    val smallest = byTokens.head
    val largest = byTokens.last
    assert(smallest.getDouble(smallest.fieldIndex("boost4")) > 1.0)
    assert(largest.getDouble(largest.fieldIndex("boost4")) < 1.0)
    val pSum = rows.map(r => r.getDouble(r.fieldIndex("p4"))).sum
    assert(math.abs(pSum - 1.0) < 0.01) // 4dp rounding slack
  }

  test("dd_novelty_curve: the first document is entirely novel, totals close") {
    val rows = run("dd_novelty_curve").collect()
    assert(rows.nonEmpty)
    val first = rows.minBy(r => r.getLong(r.fieldIndex("doc_id")))
    assert(first.getDouble(first.fieldIndex("novel4")) == 1.0)
    // every shingle is novel exactly once: novel total = distinct shingles
    val novelSum = rows.map(r => r.getLong(r.fieldIndex("n_novel"))).sum
    val distinctShingles = Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.array_distinct(
          TextOps.shinglesOf(org.apache.spark.sql.functions.col("text")))))
      .distinct().count()
    assert(novelSum == distinctShingles)
  }

  test("dd_ablation: tiers nest — docs and tokens never increase") {
    val rows = run("dd_ablation").collect().sortBy(_.getString(0))
    assert(rows.map(_.getString(0)).toSeq == Seq("1_raw", "2_exact", "3_near"))
    val docs = rows.map(r => r.getLong(r.fieldIndex("n_docs")))
    val toks = rows.map(r => r.getLong(r.fieldIndex("n_tokens")))
    assert(docs(0) >= docs(1) && docs(1) >= docs(2))
    assert(toks(0) >= toks(1) && toks(1) >= toks(2))
    assert(docs(0) == Tables.documents(spark, sf).count())
  }

  test("src_schema_evolution: v1 rows NULL-filled, v2 rows carry the column") {
    val rows = run("src_schema_evolution").collect()
    assert(rows.length == Tables.documents(spark, sf).count())
    val (nulls, present) = rows.partition(_.isNullAt(2))
    assert(nulls.nonEmpty && present.nonEmpty) // both shard eras represented
  }
}
