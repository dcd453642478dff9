package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Pins dd_containment_capped's recall contract measurably: the cap
  * only preserves recall while every doc's containment prefix (its
  * ⌊n/5⌋+1 rarest shingles) stays strictly below [[Dedup
  * .ContainmentDfCap]] in document frequency. A corpus refresh that
  * mints boilerplate into prefixes must fail HERE, not silently drop
  * candidate pairs.
  */
class DedupAuditSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session

  for (sf <- Seq("sf0.001", "sf0.01")) {
    test(s"containment prefix df stays under the cap at $sf") {
      val row = Dedup
        .containmentPrefixDfAudit(Tables.documents(spark, s"/root/testdata/$sf"))
        .collect().head
      val maxDf = row.getLong(row.fieldIndex("max_prefix_df"))
      val over = row.getLong(row.fieldIndex("n_docs_over_cap"))
      assert(row.getLong(row.fieldIndex("n_docs")) > 0)
      assert(over == 0L,
        s"$over docs have a prefix shingle with df > ${Dedup.ContainmentDfCap} " +
          s"(max $maxDf) — dd_containment_capped recall contract broken")
      assert(maxDf <= Dedup.ContainmentDfCap, s"max prefix df $maxDf")
    }
  }

  test("minhash + OPH signatures are non-negative (the % truncation pin)") {
    // dd_bbit_minhash's `sig % 256` and OPH's `h % buckets` are only
    // byte-truncation/binning on NON-NEGATIVE inputs; a signed-hash
    // refactor of the signature source would flip `%` to negative
    // remainders on both engines at once (oracle mirrors the
    // expression), keeping the gate green while the estimator rots.
    val row = Dedup.signatureFloorAudit(spark, "/root/testdata/sf0.001")
      .collect().head
    assert(row.getLong(row.fieldIndex("min_sig")) >= 0L,
      "a minhash signature went negative — % 256 is no longer byte truncation")
    assert(row.getLong(row.fieldIndex("min_oph")) >= 0L,
      "an OPH signature went negative — bucket binning broken")
  }
}
