package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import TextOps._

/** Corpus-quality gating and sampling — the Gopher-style rule stack
  * (Rae et al. 2021 §A1.1: document length, mean word length, stopword
  * presence) and exact stratified sampling. All signals are integers
  * (counts, summed lengths) and every threshold is an integer
  * cross-multiplication, so results are engine-exact by construction —
  * no floating point anywhere in the filter decisions.
  */
object QualityQueries {

  val MinTokens = 12
  val MaxTokens = 1000
  val MinMeanWordLen = 3 // mean token length bounds, as integer
  val MaxMeanWordLen = 8 //   cross-multiplications: lo·n ≤ Σlen ≤ hi·n
  val Stopwords = Seq("a", "the")
  val MinStopwordHits = 2
  val DomainCap = 10 // max docs kept per source (corpus balancing)

  /** First `quota` rows of every `group`, ordered by (md5(doc_id),
    * doc_id) — WITHOUT a per-group window. Corpus groups are Zipfian
    * (one language or one crawl domain can be half a 100 TB corpus),
    * so ranking a whole group would push ~50 TB through one task.
    * Two-phase exact allocation instead:
    *   1. per-(group, md5-prefix-bucket) counts — a groups×256-row
    *      aggregate; cumulative counts and the quota are computed over
    *      that bounded frame and broadcast;
    *   2. buckets wholly below the quota boundary are ALL-IN by
    *      membership (no window at all); the single bucket straddling
    *      the boundary is ranked within itself — a group of
    *      ~group/256 rows, the only sort anywhere.
    * The bucket is the first 2 hex chars of the md5, so bucket order
    * is a prefix of the full (md5, doc_id) order and the result is
    * row-identical to the single-window definition the oracles state.
    * `quotaExpr` sees `n_grp` (the group's row count): the stratified
    * sampler passes ⌈n/10⌉, the domain cap passes least(cap, n).
    */
  private def hashOrderedHead(docs: DataFrame, group: String,
                              quotaExpr: String): DataFrame = {
    val keyed = docs
      .select(col("doc_id"), col(group),
        md5(col("doc_id").cast("string")).as("h"))
      .withColumn("bucket", substring(col("h"), 1, 2))
    val wCum = Window.partitionBy(col(group)).orderBy(col("bucket"))
    val wGrp = Window.partitionBy(col(group))
    val stats = keyed.groupBy(group, "bucket").agg(count(lit(1)).as("bcnt"))
      .withColumn("cum_before", coalesce(
        sum(col("bcnt")).over(wCum.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .withColumn("n_grp", sum(col("bcnt")).over(wGrp))
      .withColumn("quota", expr(quotaExpr))
      .select(col(group), col("bucket"), col("bcnt"), col("cum_before"),
        col("quota"))
      // both union legs join this groups×256-row frame — materialize
      // it once instead of re-running the counting scan per leg
      .localCheckpoint(false)
    val joined = keyed.join(broadcast(stats), Seq(group, "bucket"))
      .withColumn("take", col("quota") - col("cum_before"))
    val allIn = joined.filter(col("bcnt") <= col("take"))
      .select("doc_id", group)
    val wBucket = Window.partitionBy(col(group), col("bucket"))
      .orderBy(col("h"), col("doc_id"))
    val boundary = joined
      .filter(col("take") > 0 && col("bcnt") > col("take"))
      .withColumn("rn", row_number().over(wBucket))
      .filter(col("rn") <= col("take"))
      .select("doc_id", group)
    allIn.union(boundary)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Per-language quality report of the three-rule Gopher gate. One
    // narrow pass computes all signals from the token array (no
    // explode, no shuffle before the final per-lang aggregation).
    "pipe_quality_gopher" -> ((s, dir) => {
      val base = Tables.documents(s, dir)
        .select(col("lang"), tokens(col("text")).as("toks"))
        .select(col("lang"),
          size(col("toks")).cast("long").as("nt"),
          // LONG accumulation from the seed: an INT accumulator would
          // overflow on a document whose total token characters exceed
          // 2^31 (DuckDB's list_sum accumulates in HUGEINT).
          aggregate(transform(col("toks"), t => length(t).cast("long")),
            lit(0L), (acc, x) => acc + x).as("sumlen"),
          vocabHits(col("toks"), Stopwords).cast("long").as("stop_hits"))
      val okNtok = col("nt") >= MinTokens && col("nt") <= MaxTokens
      val okWlen = col("sumlen") >= lit(MinMeanWordLen) * col("nt") &&
        col("sumlen") <= lit(MaxMeanWordLen) * col("nt")
      val okStop = col("stop_hits") >= MinStopwordHits
      base.groupBy("lang").agg(
          count(lit(1)).as("n_docs"),
          sum(when(okNtok && okWlen && okStop, 1L).otherwise(0L)).as("n_pass"),
          sum(when(!okNtok, 1L).otherwise(0L)).as("fail_ntok"),
          sum(when(!okWlen, 1L).otherwise(0L)).as("fail_wlen"),
          sum(when(!okStop, 1L).otherwise(0L)).as("fail_stop"))
        .orderBy("lang")
    }),

    // Exact stratified sample: ceil(10%) of every language, membership
    // by md5 order — reproducible across runs/engines. Defined as the
    // first ⌈n/10⌉ rows of each stratum ordered by (md5(doc_id),
    // doc_id), computed by the windowless two-phase allocation in
    // [[hashOrderedHead]] — row-identical to the single-window
    // definition the oracle states. The two union legs re-scan the
    // 2-column projection — at scale that is far cheaper than any
    // full-stratum sort.
    "pipe_stratified_sample" -> ((s, dir) =>
      hashOrderedHead(Tables.documents(s, dir), "lang", "(n_grp + 9) DIV 10")
        .orderBy("doc_id")),

    // Corpus balancing: keep at most DomainCap docs per crawl domain
    // (`source`), selected in (md5(doc_id), doc_id) order — the
    // reproducible random-but-deterministic pick. The cap is the
    // standard anti-domination gate before training-mix assembly (one
    // mirror farm must not become 30% of the corpus); same windowless
    // allocation as the sampler, so a domain holding half the corpus
    // costs the same as a uniform one.
    "pipe_domain_cap" -> ((s, dir) =>
      hashOrderedHead(Tables.documents(s, dir), "source",
        s"least(CAST($DomainCap AS BIGINT), n_grp)")
        .orderBy("doc_id")),

    // Model-based quality scoring: a fixed-weight logistic regression
    // over the same integer signals the Gopher gate reads (the serving
    // shape of a trained fastText/LR quality classifier: weights are a
    // broadcast constant, scoring is a narrow scan — no shuffle at
    // all). Score rounds to 4dp BEFORE the threshold compare, so the
    // label is engine-exact like the BM25 log variant.
    "ta_quality_lr" -> ((s, dir) => {
      val feats = Tables.documents(s, dir)
        .select(col("doc_id"), tokens(col("text")).as("toks"))
        .select(col("doc_id"),
          size(col("toks")).cast("long").as("nt"),
          aggregate(transform(col("toks"), t => length(t).cast("long")),
            lit(0L), (acc, x) => acc + x).as("sumlen"),
          vocabHits(col("toks"), Stopwords).cast("long").as("stop_hits"))
      val z = lit(-6.0) +
        lit(0.8) * log(lit(1.0) + col("nt")) +
        lit(0.35) * when(col("nt") > 0,
          col("sumlen").cast("double") / col("nt")).otherwise(lit(0.0)) +
        lit(6.0) * when(col("nt") > 0,
          col("stop_hits").cast("double") / col("nt")).otherwise(lit(0.0))
      feats
        .withColumn("score4", round(lit(1.0) / (lit(1.0) + exp(-z)), 4))
        .withColumn("label", (col("score4") >= 0.5).cast("int"))
        .select("doc_id", "nt", "score4", "label")
        .orderBy("doc_id")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "pipe_quality_gopher" ->
      s"""WITH base AS (
         |  SELECT lang,
         |    CAST(len(t) AS BIGINT) AS nt,
         |    CAST(COALESCE(list_sum(list_transform(t, x -> len(x))), 0) AS BIGINT) AS sumlen,
         |    CAST(len(list_filter(t, x -> x IN (${Stopwords.map("'" + _ + "'").mkString(", ")}))) AS BIGINT) AS stop_hits
         |  FROM (SELECT lang, ${OracleSql.toks} AS t FROM documents)),
         |flagged AS (
         |  SELECT lang,
         |    (nt >= $MinTokens AND nt <= $MaxTokens) AS ok_ntok,
         |    (sumlen >= $MinMeanWordLen * nt AND sumlen <= $MaxMeanWordLen * nt) AS ok_wlen,
         |    (stop_hits >= $MinStopwordHits) AS ok_stop
         |  FROM base)
         |SELECT lang, count(*) AS n_docs,
         |  CAST(sum(CASE WHEN ok_ntok AND ok_wlen AND ok_stop THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
         |  CAST(sum(CASE WHEN NOT ok_ntok THEN 1 ELSE 0 END) AS BIGINT) AS fail_ntok,
         |  CAST(sum(CASE WHEN NOT ok_wlen THEN 1 ELSE 0 END) AS BIGINT) AS fail_wlen,
         |  CAST(sum(CASE WHEN NOT ok_stop THEN 1 ELSE 0 END) AS BIGINT) AS fail_stop
         |FROM flagged GROUP BY lang ORDER BY lang""".stripMargin,
    "pipe_stratified_sample" ->
      """SELECT doc_id, lang FROM (
        |  SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn,
        |    count(*) OVER (PARTITION BY lang) AS n_lang
        |  FROM documents)
        |WHERE rn * 10 <= n_lang + 9
        |ORDER BY doc_id""".stripMargin,
    "pipe_domain_cap" ->
      s"""SELECT doc_id, source FROM (
         |  SELECT doc_id, source,
         |    row_number() OVER (PARTITION BY source
         |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
         |  FROM documents)
         |WHERE rn <= $DomainCap
         |ORDER BY doc_id""".stripMargin,
    "ta_quality_lr" ->
      s"""WITH feats AS (
         |  SELECT doc_id,
         |    CAST(len(t) AS BIGINT) AS nt,
         |    CAST(COALESCE(list_sum(list_transform(t, x -> len(x))), 0) AS BIGINT) AS sumlen,
         |    CAST(len(list_filter(t, x -> x IN (${Stopwords.map("'" + _ + "'").mkString(", ")}))) AS BIGINT) AS stop_hits
         |  FROM (SELECT doc_id, ${OracleSql.toks} AS t FROM documents)),
         |scored AS (
         |  SELECT doc_id, nt,
         |    round(1.0 / (1.0 + exp(-(
         |      -6.0 + 0.8 * ln(1.0 + nt)
         |           + 0.35 * (CASE WHEN nt > 0 THEN CAST(sumlen AS DOUBLE) / nt ELSE 0.0 END)
         |           + 6.0  * (CASE WHEN nt > 0 THEN CAST(stop_hits AS DOUBLE) / nt ELSE 0.0 END)
         |    ))), 4) AS score4
         |  FROM feats)
         |SELECT doc_id, nt, score4,
         |  CAST(CASE WHEN score4 >= 0.5 THEN 1 ELSE 0 END AS INT) AS label
         |FROM scored ORDER BY doc_id""".stripMargin
  )
}
