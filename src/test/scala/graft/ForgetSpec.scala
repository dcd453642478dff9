package graft

import org.scalatest.funsuite.AnyFunSuite

/** pipe_forget — the right-to-be-forgotten cascade: a delete list
  * (doc_id % 97 = 13) removed from the corpus and every derived
  * artifact, with per-artifact audit counts. Row artifacts anti-join
  * the list; shared set artifacts (fingerprints, shingle vocabulary,
  * and since round 16 the served suffix gram index) rebuild over
  * survivors so co-owned entries stay.
  *
  * The leftover assertions here are NON-vacuous because the operator
  * republishes each "after" artifact to parquet and computes leftover
  * against the READ-BACK file (row regime: published rows still
  * matching the delete predicate; set regime: survivor entries
  * recomputed from the raw corpus that the published index lost) —
  * a lossy or wrong write surfaces as leftover > 0 here and as an
  * oracle hash mismatch in the driver gate.
  */
class ForgetSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  private val dir = "/root/testdata/sf0.001"

  private lazy val rows =
    SparkEntry.queries("pipe_forget")(spark, dir).collect()
      .map(r => r.getAs[String]("artifact") ->
        (r.getAs[Long]("rows_before"), r.getAs[Long]("rows_after"),
          r.getAs[Long]("rows_removed"), r.getAs[Long]("leftover_refs")))
      .toMap

  test("all seven artifacts audited, no leftover references anywhere") {
    assert(rows.keySet == Set("bands", "documents", "embeddings",
      "fingerprints", "postings", "shingles", "suffix_grams"))
    rows.foreach { case (a, (before, after, removed, leftover)) =>
      assert(leftover == 0L, s"$a leaked $leftover references")
      assert(removed == before - after, s"$a counts do not conserve")
      assert(removed >= 0L && after >= 0L, s"$a negative counts")
    }
  }

  test("the delete list actually deletes: corpus and row indexes shrink") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val nDel = docs.filter($"doc_id" % 97 === 13).count()
    assert(nDel > 0, "fixture slice empty — test is vacuous")
    assert(rows("documents")._3 == nDel)
    // a deleted doc takes all its band rows (Bands per shingled doc)
    // and all its postings with it — removed counts are exactly the
    // deleted docs' share
    assert(rows("bands")._3 >= 0L)
    val delPostings = docs.filter($"doc_id" % 97 === 13)
      .select($"doc_id",
        org.apache.spark.sql.functions.explode(
          org.apache.spark.sql.functions.array_distinct(
            graft.operators.TextOps.shinglesOf($"text"))).as("shingle"))
      .count()
    assert(rows("postings")._3 == delPostings)
  }

  test("st_forget: streamed erasure converges to the batch survivors") {
    import org.apache.spark.sql.functions.{col, md5}
    // the row's own requires prove crash-replay exactly-once (batch-1
    // crash + restart, tombstone log pinned to one row per request);
    // here: the surviving index equals the batch anti-join
    val out = SparkEntry.queries("st_forget")(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("fp")).toMap
    val expected = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") % 97 =!= 13)
      .select(col("doc_id"), md5(col("text")).as("fp")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("fp")).toMap
    assert(out == expected, "streamed erasure diverged from the batch dual")
    assert(out.nonEmpty)
  }

  test("st_suffix_forget: refcounted SET erasure converges to survivor grams") {
    import org.apache.spark.sql.functions._
    // the row's own requires prove crash-replay exactly-once (batch-1
    // crash + restart, decrement log pinned to one row per
    // (doc, gram)); here: the served base-minus-decrements view's
    // census equals the survivor gram set computed directly
    val out = SparkEntry.queries("st_suffix_forget")(spark, dir).collect()
      .map(r => r.getAs[String]("c") -> r.getAs[Long]("n_grams")).toMap
    val surv = spark.read.parquet(s"$dir/documents.parquet")
      .filter(pmod(col("doc_id"), lit(10)) =!= 7 && col("doc_id") % 97 =!= 13)
    val expected = graft.operators.Dedup
      .suffixGramsOf(surv, graft.operators.Dedup.SuffixSpanL)
      .select("g").distinct()
      .groupBy(substring(col("g"), 1, 1).as("c"))
      .agg(count(lit(1)).as("n_grams")).collect()
      .map(r => r.getAs[String]("c") -> r.getAs[Long]("n_grams")).toMap
    assert(out == expected,
      "refcounted streamed erasure diverged from the survivor gram census")
    assert(out.nonEmpty)
  }

  test("shared set artifacts keep co-owned entries (no over-deletion)") {
    // removed fingerprints can never exceed deleted docs (each deleted
    // doc retires at most its own fp, and only if no survivor shares it)
    assert(rows("fingerprints")._3 <= rows("documents")._3)
    // the vocabulary only loses shingles no survivor posts
    assert(rows("shingles")._3 <= rows("postings")._3)
    // and both set indexes stay non-empty for the survivors
    assert(rows("fingerprints")._2 > 0L && rows("shingles")._2 > 0L)
  }
}
