package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** EXACT distributed order statistics without a global sort — the two
  * scale patterns for "give me the real median/p90, not a sketch"
  * (dataset cards and dedup-threshold calibration want exact numbers;
  * `q_approx_quantile` remains the sketch path):
  *
  *  - unbounded value domain (`q_exact_quantiles`): two-phase
  *    range-bucket allocation, the same shape as the stratified
  *    sampler — per-bucket counts (small, broadcast), locate the one
  *    bucket holding each target rank, then rank ONLY inside that
  *    bucket (~1/B of the data through a window, never the whole
  *    column);
  *  - bounded value domain (`ta_doclen_quantiles`): the value
  *    histogram IS the sufficient statistic — one (group, value)
  *    aggregation, cumulative counts over the bounded distinct-value
  *    frame, then every quantile falls out of a conditional min. No
  *    per-row ranking at all.
  *
  * All ranks are exact integer definitions (k = ⌈q·n⌉ via integer
  * ceiling division), so both engines select the identical element —
  * no interpolation, no FP.
  */
object QuantileQueries {

  /** Range-bucket width for l_extendedprice (domain ~[900, 105000]).
    * At 100 TB the width comes from min/max column stats; the bucket
    * count only needs to be large enough that one bucket's rows fit a
    * task sort (B ≈ 100–10⁵ all work — phase 1 is a B-row aggregate).
    */
  val PriceBucketWidth = 1000

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Exact median and p90 of a 6M-row (→ 100 TB) double column.
    // Phase 1: per-bucket counts; cumulative + total over the bounded
    // bucket frame (≤ domain/width rows — the documented safe window,
    // same as the sampler's langs×256 frame). Phase 2: each target
    // rank k lands in exactly one bucket (cum_before < k ≤ cum); rows
    // join the ≤2-row broadcast of boundary buckets, rank within the
    // boundary bucket only, and the k-th element pops out. Ties are
    // harmless: the k-th VALUE of a multiset is order-independent.
    "q_exact_quantiles" -> ((s, dir) => {
      val rows = Tables.lineitem(s, dir)
        .select(col("l_extendedprice").as("v"))
        .withColumn("bucket", floor(col("v") / PriceBucketWidth).cast("long"))
      val wCum = Window.orderBy(col("bucket"))
      val stats = rows.groupBy("bucket").agg(count(lit(1)).as("bcnt"))
        .withColumn("cum_before", coalesce(
          sum(col("bcnt")).over(wCum.rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
        .withColumn("n", sum(col("bcnt")).over(
          wCum.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      val targets = stats
        .select(col("bucket"), col("bcnt"), col("cum_before"),
          explode(array(
            struct(lit("median").as("stat"), expr("(n + 1) DIV 2").as("k")),
            struct(lit("p90").as("stat"), expr("(9 * n + 9) DIV 10").as("k"))))
            .as("t"))
        .select(col("bucket"), col("cum_before"),
          col("t.stat").as("stat"), col("t.k").as("k"))
        .filter(col("cum_before") < col("k") &&
          col("cum_before") + col("bcnt") >= col("k"))
      val wRank = Window.partitionBy(col("stat")).orderBy(col("v"))
      rows.join(broadcast(targets), Seq("bucket"))
        .withColumn("rn", row_number().over(wRank))
        .filter(col("cum_before") + col("rn") === col("k"))
        .select(col("stat"), col("v").as("value"))
        .orderBy("stat")
    }),

    // Per-language exact p25/p50/p75/p90 of document length. n_chars
    // has a bounded domain (≤ max document length distinct values), so
    // the (lang, n_chars) histogram is tiny relative to the corpus and
    // the cumulative window runs over it, not over documents. Each
    // quantile is min{v : cum(v) ≥ ⌈q·n⌉} — a conditional min, no row
    // ranking anywhere.
    "ta_doclen_quantiles" -> ((s, dir) => {
      val hist = Tables.documents(s, dir)
        .groupBy(col("lang"), col("n_chars"))
        .agg(count(lit(1)).as("c"))
      val wCum = Window.partitionBy(col("lang")).orderBy(col("n_chars"))
      val wAll = Window.partitionBy(col("lang"))
      val cum = hist
        .withColumn("cum", sum(col("c")).over(wCum))
        .withColumn("n", sum(col("c")).over(wAll))
      def pct(q: Int) = min(when(
        col("cum") >= expr(s"($q * n + 99) DIV 100"), col("n_chars")))
        .as(s"p$q")
      cum.groupBy("lang")
        .agg(pct(25), pct(50), pct(75), pct(90))
        .orderBy("lang")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q_exact_quantiles" ->
      """WITH ranked AS (
        |  SELECT l_extendedprice AS v,
        |    row_number() OVER (ORDER BY l_extendedprice) AS rn,
        |    count(*) OVER () AS n
        |  FROM lineitem)
        |SELECT 'median' AS stat, v AS value FROM ranked WHERE rn = (n + 1) // 2
        |UNION ALL
        |SELECT 'p90' AS stat, v AS value FROM ranked WHERE rn = (9 * n + 9) // 10
        |ORDER BY stat""".stripMargin,
    "ta_doclen_quantiles" ->
      """WITH h AS (
        |  SELECT lang, n_chars, count(*) AS c
        |  FROM documents GROUP BY lang, n_chars),
        |cumt AS (
        |  SELECT lang, n_chars,
        |    sum(c) OVER (PARTITION BY lang ORDER BY n_chars) AS cum,
        |    sum(c) OVER (PARTITION BY lang) AS n
        |  FROM h)
        |SELECT lang,
        |  CAST(min(CASE WHEN cum >= (25 * n + 99) // 100 THEN n_chars END) AS BIGINT) AS p25,
        |  CAST(min(CASE WHEN cum >= (50 * n + 99) // 100 THEN n_chars END) AS BIGINT) AS p50,
        |  CAST(min(CASE WHEN cum >= (75 * n + 99) // 100 THEN n_chars END) AS BIGINT) AS p75,
        |  CAST(min(CASE WHEN cum >= (90 * n + 99) // 100 THEN n_chars END) AS BIGINT) AS p90
        |FROM cumt GROUP BY lang ORDER BY lang""".stripMargin
  )
}
