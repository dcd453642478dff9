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
  val DsirBuckets = 256 // hashed-ngram feature space (md5 first byte)
  val DsirTopK = 50     // selected-doc report size
  val PpsTicks = 50     // systematic-PPS sample size (tick count)

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

    // Weighted sampling, probability ∝ document length (the standard
    // "sample tokens, not documents" correction): systematic PPS —
    // docs laid out on the cumulative-weight line in (md5(doc_id),
    // doc_id) order; a doc is selected iff its weight span crosses one
    // of PpsTicks evenly spaced ticks. Chosen over Efraimidis–Spirakis
    // keys (-ln(u)/w) deliberately: E-S ranks by a transcendental of a
    // hash, and cross-engine libm parity at the top-K boundary is
    // exactly the flakiness this suite bans — the tick rule is pure
    // integer cross-multiplication ((cum·K) DIV W), engine-exact, and
    // the hash order supplies the randomization. Scale: the global
    // cumulative sum is the pipe_stratified_sample two-phase shape —
    // per-md5-prefix-bucket weight subtotals (a 256-row frame; the
    // only unpartitioned window runs over THAT, bounded by
    // construction), then per-doc prefix sums inside each ~n/256-row
    // bucket partition. A doc heavier than W/K gets multiple ticks —
    // n_ticks is its multiplicity (PPS with replacement semantics).
    "pipe_weighted_sample" -> ((s, dir) => {
      val keyed = Tables.documents(s, dir)
        .select(col("doc_id"), col("n_chars").cast("long").as("w"),
          md5(col("doc_id").cast("string")).as("h"))
        .withColumn("bucket", substring(col("h"), 1, 2))
      val bstats = keyed.groupBy("bucket").agg(sum(col("w")).as("bw"))
        .withColumn("cum_before", coalesce(
          sum(col("bw")).over(Window.orderBy(col("bucket"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select(col("bucket"), col("cum_before"))
      val total = keyed.agg(sum(col("w")).as("tw"))
      val wIn = Window.partitionBy(col("bucket"))
        .orderBy(col("h"), col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
      keyed
        .join(broadcast(bstats), Seq("bucket"))
        .withColumn("cum", col("cum_before") + sum(col("w")).over(wIn))
        .crossJoin(broadcast(total))
        .withColumn("t_hi", expr(s"(cum * $PpsTicks) DIV tw"))
        .withColumn("t_lo", expr(s"((cum - w) * $PpsTicks) DIV tw"))
        .filter(col("t_hi") > col("t_lo"))
        .select(col("doc_id"), col("w"), (col("t_hi") - col("t_lo")).as("n_ticks"))
        .orderBy("doc_id")
    }),

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
    }),

    // Reliability diagram for the distilled quality LR — the ML-ops
    // check that closes the ta_quality_lr / ta_lr_train_step loop:
    // per score decile, how often does the TEACHER (the integer
    // Gopher rule gate) agree? A rising pass rate across bins is what
    // "the distilled model ranks quality like its rules" means;
    // miscalibration shows up as a flat or non-monotone column.
    // Binning avoids the float-boundary trap: score4 (already rounded
    // 4dp) converts to integer basis points via round(score4·10⁴)
    // FIRST, then the bin is an integer division — floor(score4·10)
    // directly would sit on IEEE representation boundaries. Pass
    // rates are integer ppm. One narrow scan, ≤11-bin output.
    "ta_quality_calibration" -> ((s, dir) => {
      val feats = Tables.documents(s, dir)
        .select(tokens(col("text")).as("toks"))
        .select(
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
      val pass = col("nt") >= MinTokens && col("nt") <= MaxTokens &&
        col("sumlen") >= lit(MinMeanWordLen) * col("nt") &&
        col("sumlen") <= lit(MaxMeanWordLen) * col("nt") &&
        col("stop_hits") >= MinStopwordHits
      feats
        .withColumn("score4", round(lit(1.0) / (lit(1.0) + exp(-z)), 4))
        .withColumn("bin",
          expr("CAST(round(score4 * 10000) AS BIGINT) DIV 1000"))
        .withColumn("p", when(pass, 1L).otherwise(0L))
        .groupBy("bin")
        .agg(count(lit(1)).as("n_docs"), sum(col("p")).as("n_pass"))
        .withColumn("pass_ppm", expr("(n_pass * 1000000L) DIV n_docs"))
        .orderBy("bin")
    }),

    // One full-batch gradient step of the quality LR — the TRAINING
    // half of ta_quality_lr's serving shape, distilling the integer
    // Gopher rule gate into the model (weak supervision: y = the rule
    // gate's verdict, the standard bootstrap for a learned quality
    // classifier). The step is the canonical distributed-training
    // shape (MLlib GD's treeAggregate): ONE corpus scan, per-doc
    // gradient contributions floored to micro-integers so the
    // cross-partition sum is an order-free long — no float
    // accumulation ever crosses a partition boundary — map-side
    // partial aggregation to a single 7-number row, and a 4-row
    // weight report unpivoted from it with stack (no recompute).
    // Per-doc transcendentals (the serving sigmoid, the ln feature)
    // round to 4dp BEFORE any product — the ta_quality_lr determinism
    // contract. At 100 TB an epoch is exactly this pass; the gradient
    // state never exceeds one row per partition.
    "ta_lr_train_step" -> ((s, dir) => {
      val feats = Tables.documents(s, dir)
        .select(tokens(col("text")).as("toks"))
        .select(
          size(col("toks")).cast("long").as("nt"),
          aggregate(transform(col("toks"), t => length(t).cast("long")),
            lit(0L), (acc, x) => acc + x).as("sumlen"),
          vocabHits(col("toks"), Stopwords).cast("long").as("stop_hits"))
      val x1 = round(log(lit(1.0) + col("nt")), 4)
      val x2 = when(col("nt") > 0,
        col("sumlen").cast("double") / col("nt")).otherwise(lit(0.0))
      val x3 = when(col("nt") > 0,
        col("stop_hits").cast("double") / col("nt")).otherwise(lit(0.0))
      val z = lit(-6.0) +
        lit(0.8) * log(lit(1.0) + col("nt")) + lit(0.35) * x2 + lit(6.0) * x3
      val y = when(
        col("nt") >= MinTokens && col("nt") <= MaxTokens &&
          col("sumlen") >= lit(MinMeanWordLen.toLong) * col("nt") &&
          col("sumlen") <= lit(MaxMeanWordLen.toLong) * col("nt") &&
          col("stop_hits") >= MinStopwordHits, lit(1.0)).otherwise(lit(0.0))
      val p4 = round(lit(1.0) / (lit(1.0) + exp(-z)), 4)
      feats
        .select((p4 - y).as("err"), x1.as("x1"), x2.as("x2"), x3.as("x3"),
          p4.as("p4"), y.as("y"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(floor(col("err") * lit(1e6)).cast("long")).as("g0"),
          sum(floor(col("err") * col("x1") * lit(1e6)).cast("long")).as("g1"),
          sum(floor(col("err") * col("x2") * lit(1e6)).cast("long")).as("g2"),
          sum(floor(col("err") * col("x3") * lit(1e6)).cast("long")).as("g3"),
          sum(when((col("p4") >= 0.5) === (col("y") === 1.0), 1L)
            .otherwise(0L)).as("n_correct"))
        .selectExpr(
          """stack(4,
            |  0, 'bias',       -6.0D, g0,
            |  1, 'log1p_ntok',  0.8D, g1,
            |  2, 'mean_wlen',  0.35D, g2,
            |  3, 'stop_ratio',  6.0D, g3) AS (j, feature, w_old, grad_micro)
            |""".stripMargin,
          "n_docs", "n_correct")
        .withColumn("w_new8", round(
          col("w_old") - lit(0.5) *
            (col("grad_micro").cast("double") / lit(1e6)) / col("n_docs"), 8))
        .select("j", "feature", "w_old", "grad_micro", "w_new8",
          "n_docs", "n_correct")
        .orderBy("j")
    }),

    // Ranking-quality evaluation of the LR scorer against the Gopher
    // rule gate: EXACT ROC-AUC via the grouped Mann–Whitney rank-sum —
    // the standard fidelity number for a distilled quality classifier
    // (does the model ORDER documents like the rules label them?).
    // AUC = Σ_g (2·negs_below(g) + negs_at(g))·pos_at(g) / (2·NP·NN)
    // over score groups g ascending — integer arithmetic end to end;
    // the single division happens on two exact longs at the very end.
    // Scale shape: score4 is rounded to 4dp so the score histogram has
    // AT MOST 10001 rows — the corpus aggregates map-side into that
    // value-bounded frame, and the cumulative window below runs over
    // the bounded histogram (the radix-histogram class), never the
    // corpus. n_correct doubles as threshold-0.5 accuracy.
    "ta_quality_auc" -> ((s, dir) => {
      val feats = Tables.documents(s, dir)
        .select(tokens(col("text")).as("toks"))
        .select(
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
      val y = when(
        col("nt") >= MinTokens && col("nt") <= MaxTokens &&
          col("sumlen") >= lit(MinMeanWordLen.toLong) * col("nt") &&
          col("sumlen") <= lit(MaxMeanWordLen.toLong) * col("nt") &&
          col("stop_hits") >= MinStopwordHits, lit(1L)).otherwise(lit(0L))
      val hist = feats
        .select(round(lit(1.0) / (lit(1.0) + exp(-z)), 4).as("score4"), y.as("y"))
        .groupBy("score4")
        .agg(sum(col("y")).as("np"), sum(lit(1L) - col("y")).as("nn"))
      // unpartitioned window, but over the ≤10001-row histogram — a
      // value-bounded frame, per the SCALE.md bounded-window rule
      val wc = Window.orderBy(col("score4"))
        .rowsBetween(Window.unboundedPreceding, -1)
      hist
        .withColumn("negb", coalesce(sum(col("nn")).over(wc), lit(0L)))
        .agg(
          sum(col("np")).as("n_pos"),
          sum(col("nn")).as("n_neg"),
          sum(col("np") * (col("negb") * 2 + col("nn"))).as("num2"),
          sum(when(col("score4") >= 0.5, col("np")).otherwise(col("nn")))
            .as("n_correct"),
          count(lit(1)).as("n_scores"))
        .select(col("n_pos"), col("n_neg"), col("n_scores"), col("n_correct"),
          round(col("num2").cast("double") /
            (lit(2.0) * col("n_pos") * col("n_neg")), 6).as("auc6"))
    }),

    // DSIR-style data selection (Xie et al. 2023, "Data Selection for
    // Language Models via Importance Resampling"): hashed-token
    // bag-of-ngrams models for a target distribution (here the 'en'
    // slice) and the raw corpus, importance weight of a doc =
    // Σ_tokens log(p_target(b)/p_raw(b)) over the token's hash bucket,
    // Laplace-smoothed. The log-ratio is computed ONCE per bucket on
    // the 256-row model frame and floored to a micro-integer there, so
    // the corpus-scale per-doc sum is an order-free long — the
    // ta_doc_lm_score trick, with the single libm ln confined to a
    // model-sized frame (same exposure class as ta_quality_lr's green
    // ln/exp). Buckets come from the md5 first byte (engine-shared
    // hash). Output: the top-50 selected docs — at 100 TB both count
    // frames aggregate map-side to 256 rows, the model broadcasts, and
    // the selection is TakeOrderedAndProject (production would replace
    // the top-k with a weight-threshold filter or Gumbel resampling;
    // the weight computation — the expensive part — is identical).
    "pipe_dsir_weights" -> ((s, dir) => {
      val tb = Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"), explode(tokens(col("text"))).as("w"))
        .withColumn("b", conv(substring(md5(col("w")), 1, 2), 16, 10).cast("int"))
        .localCheckpoint(false) // three aggregation legs share one explode
      val ct = tb.filter(col("lang") === "en").groupBy("b").agg(count(lit(1)).as("ct"))
      val cs = tb.groupBy("b").agg(count(lit(1)).as("cs"))
      val tot = tb.agg(
        count(lit(1)).as("ns"),
        count(when(col("lang") === "en", 1)).as("nt"))
      val model = s.range(DsirBuckets).select(col("id").cast("int").as("b"))
        .join(broadcast(ct), Seq("b"), "left")
        .join(broadcast(cs), Seq("b"), "left")
        .crossJoin(broadcast(tot))
        .select(col("b"),
          floor(log(
            ((coalesce(col("ct"), lit(0L)) + lit(1L)).cast("double")
              * (col("ns") + lit(DsirBuckets.toLong)).cast("double"))
            / ((coalesce(col("cs"), lit(0L)) + lit(1L)).cast("double")
              * (col("nt") + lit(DsirBuckets.toLong)).cast("double")))
            * lit(1000000.0)).cast("long").as("lrm"))
      val w = Window.orderBy(col("logw_micro").desc, col("doc_id").asc)
      tb.join(broadcast(model), "b")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_toks"), sum(col("lrm")).as("logw_micro"))
        .orderBy(col("logw_micro").desc, col("doc_id").asc)
        .limit(DsirTopK)
        .withColumn("rk", row_number().over(w).cast("int"))
        .orderBy("rk")
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
    // At oracle scale the two-phase bucket allocation collapses to the
    // single running sum this window states — same order, same ticks.
    // n_ticks MUST cast to BIGINT: DuckDB's sum(BIGINT) widens to
    // HUGEINT, cum/tw arithmetic stays HUGEINT, and the driver's
    // pandas fetch renders HUGEINT as float64 — value-identical rows
    // then hash-mismatch on dtype alone (the round-7 failure mode).
    "pipe_weighted_sample" ->
      s"""WITH d AS (
         |  SELECT doc_id, CAST(n_chars AS BIGINT) AS w,
         |    md5(CAST(doc_id AS VARCHAR)) AS h
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, w,
         |    sum(w) OVER (ORDER BY h, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM d),
         |t AS (SELECT sum(w) AS tw FROM d)
         |SELECT doc_id, w,
         |  CAST((cum * $PpsTicks) // tw - ((cum - w) * $PpsTicks) // tw
         |    AS BIGINT) AS n_ticks
         |FROM c, t
         |WHERE (cum * $PpsTicks) // tw > ((cum - w) * $PpsTicks) // tw
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
         |FROM scored ORDER BY doc_id""".stripMargin,
    "ta_quality_calibration" ->
      s"""WITH feats AS (
         |  SELECT CAST(len(t) AS BIGINT) AS nt,
         |    CAST(COALESCE(list_sum(list_transform(t, x -> len(x))), 0) AS BIGINT) AS sumlen,
         |    CAST(len(list_filter(t, x -> x IN (${Stopwords.map("'" + _ + "'").mkString(", ")}))) AS BIGINT) AS stop_hits
         |  FROM (SELECT ${OracleSql.toks} AS t FROM documents)),
         |scored AS (
         |  SELECT nt, sumlen, stop_hits,
         |    round(1.0 / (1.0 + exp(-(
         |      -6.0 + 0.8 * ln(1.0 + nt)
         |           + 0.35 * (CASE WHEN nt > 0 THEN CAST(sumlen AS DOUBLE) / nt ELSE 0.0 END)
         |           + 6.0  * (CASE WHEN nt > 0 THEN CAST(stop_hits AS DOUBLE) / nt ELSE 0.0 END)
         |    ))), 4) AS score4
         |  FROM feats),
         |binned AS (
         |  SELECT CAST(round(score4 * 10000) AS BIGINT) // 1000 AS bin,
         |    CASE WHEN nt >= $MinTokens AND nt <= $MaxTokens
         |          AND sumlen >= $MinMeanWordLen * nt
         |          AND sumlen <= $MaxMeanWordLen * nt
         |          AND stop_hits >= $MinStopwordHits THEN 1 ELSE 0 END AS p
         |  FROM scored)
         |SELECT bin, count(*)::BIGINT AS n_docs,
         |  CAST(sum(p) AS BIGINT) AS n_pass,
         |  ((CAST(sum(p) AS BIGINT) * 1000000) // count(*))::BIGINT AS pass_ppm
         |FROM binned GROUP BY bin ORDER BY bin""".stripMargin,
    // Gradient micro-integers: per-doc (p4 - y)·x_j floors to a long
    // on BOTH engines before summing, so the only cross-engine float
    // exposure is the two round-to-4dp transcendentals ta_quality_lr
    // already pins green; everything downstream of the longs is the
    // identical IEEE op tree.
    "ta_lr_train_step" ->
      s"""WITH base AS (
         |  SELECT CAST(len(t) AS BIGINT) AS nt,
         |    CAST(COALESCE(list_sum(list_transform(t, x -> len(x))), 0) AS BIGINT) AS sumlen,
         |    CAST(len(list_filter(t, x -> x IN (${Stopwords.map("'" + _ + "'").mkString(", ")}))) AS BIGINT) AS stop_hits
         |  FROM (SELECT ${OracleSql.toks} AS t FROM documents)),
         |s AS (
         |  SELECT nt,
         |    round(ln(1.0 + nt), 4) AS x1,
         |    CASE WHEN nt > 0 THEN CAST(sumlen AS DOUBLE) / nt ELSE 0.0 END AS x2,
         |    CASE WHEN nt > 0 THEN CAST(stop_hits AS DOUBLE) / nt ELSE 0.0 END AS x3,
         |    round(1.0 / (1.0 + exp(-(
         |      -6.0 + 0.8 * ln(1.0 + nt)
         |      + 0.35 * (CASE WHEN nt > 0 THEN CAST(sumlen AS DOUBLE) / nt ELSE 0.0 END)
         |      + 6.0  * (CASE WHEN nt > 0 THEN CAST(stop_hits AS DOUBLE) / nt ELSE 0.0 END)))), 4) AS p4,
         |    CASE WHEN nt >= $MinTokens AND nt <= $MaxTokens
         |          AND sumlen >= $MinMeanWordLen * nt AND sumlen <= $MaxMeanWordLen * nt
         |          AND stop_hits >= $MinStopwordHits THEN 1.0 ELSE 0.0 END AS y
         |  FROM base),
         |g AS (
         |  SELECT count(*) AS n_docs,
         |    CAST(sum(CAST(floor((p4 - y) * 1000000.0) AS BIGINT)) AS BIGINT) AS g0,
         |    CAST(sum(CAST(floor((p4 - y) * x1 * 1000000.0) AS BIGINT)) AS BIGINT) AS g1,
         |    CAST(sum(CAST(floor((p4 - y) * x2 * 1000000.0) AS BIGINT)) AS BIGINT) AS g2,
         |    CAST(sum(CAST(floor((p4 - y) * x3 * 1000000.0) AS BIGINT)) AS BIGINT) AS g3,
         |    CAST(sum(CASE WHEN (p4 >= 0.5) = (y = 1.0) THEN 1 ELSE 0 END) AS BIGINT) AS n_correct
         |  FROM s)
         |SELECT j, feature, w_old, grad_micro,
         |  round(w_old - 0.5 * (CAST(grad_micro AS DOUBLE) / 1000000.0) / n_docs, 8) AS w_new8,
         |  n_docs, n_correct
         |FROM (
         |  SELECT 0 AS j, 'bias' AS feature, -6.0 AS w_old, g0 AS grad_micro, n_docs, n_correct FROM g
         |  UNION ALL SELECT 1, 'log1p_ntok', 0.8, g1, n_docs, n_correct FROM g
         |  UNION ALL SELECT 2, 'mean_wlen', 0.35, g2, n_docs, n_correct FROM g
         |  UNION ALL SELECT 3, 'stop_ratio', 6.0, g3, n_docs, n_correct FROM g)
         |ORDER BY j""".stripMargin,
    // Float exposure = the same two round-to-4dp transcendentals
    // ta_quality_lr pins green; the AUC numerator is pure integer and
    // the final division divides two exact longs on both engines.
    "ta_quality_auc" ->
      s"""WITH base AS (
         |  SELECT CAST(len(t) AS BIGINT) AS nt,
         |    CAST(COALESCE(list_sum(list_transform(t, x -> len(x))), 0) AS BIGINT) AS sumlen,
         |    CAST(len(list_filter(t, x -> x IN (${Stopwords.map("'" + _ + "'").mkString(", ")}))) AS BIGINT) AS stop_hits
         |  FROM (SELECT ${OracleSql.toks} AS t FROM documents)),
         |s AS (
         |  SELECT round(1.0 / (1.0 + exp(-(
         |      -6.0 + 0.8 * ln(1.0 + nt)
         |      + 0.35 * (CASE WHEN nt > 0 THEN CAST(sumlen AS DOUBLE) / nt ELSE 0.0 END)
         |      + 6.0  * (CASE WHEN nt > 0 THEN CAST(stop_hits AS DOUBLE) / nt ELSE 0.0 END)))), 4) AS score4,
         |    CASE WHEN nt >= $MinTokens AND nt <= $MaxTokens
         |          AND sumlen >= $MinMeanWordLen * nt AND sumlen <= $MaxMeanWordLen * nt
         |          AND stop_hits >= $MinStopwordHits THEN 1 ELSE 0 END AS y
         |  FROM base),
         |hist AS (
         |  SELECT score4, CAST(sum(y) AS BIGINT) AS np,
         |    CAST(sum(1 - y) AS BIGINT) AS nn
         |  FROM s GROUP BY score4),
         |c AS (
         |  SELECT score4, np, nn,
         |    CAST(COALESCE(sum(nn) OVER (ORDER BY score4
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS negb
         |  FROM hist)
         |SELECT CAST(sum(np) AS BIGINT) AS n_pos, CAST(sum(nn) AS BIGINT) AS n_neg,
         |  CAST(count(*) AS BIGINT) AS n_scores,
         |  CAST(sum(CASE WHEN score4 >= 0.5 THEN np ELSE nn END) AS BIGINT) AS n_correct,
         |  round(CAST(sum(np * (negb * 2 + nn)) AS DOUBLE)
         |    / (2.0 * sum(np) * sum(nn)), 6) AS auc6
         |FROM c""".stripMargin,
    // The md5-first-byte bucket is two hex nibbles via the strpos
    // alphabet trick (the dd_simhash oracle pattern); the ln sits on a
    // 256-row frame and its argument is an exact-rational double built
    // by the identical op tree on both engines.
    "pipe_dsir_weights" ->
      s"""WITH tb AS (
         |  SELECT doc_id, lang,
         |    CAST((strpos('0123456789abcdef', substring(md5(w), 1, 1)) - 1) * 16
         |       + (strpos('0123456789abcdef', substring(md5(w), 2, 1)) - 1) AS INT) AS b
         |  FROM (SELECT doc_id, lang, unnest(${OracleSql.toks}) AS w FROM documents)),
         |ct AS (SELECT b, count(*) AS ct FROM tb WHERE lang = 'en' GROUP BY b),
         |cs AS (SELECT b, count(*) AS cs FROM tb GROUP BY b),
         |tot AS (SELECT count(*) AS ns,
         |               count(CASE WHEN lang = 'en' THEN 1 END) AS nt FROM tb),
         |model AS (
         |  SELECT CAST(r.range AS INT) AS b,
         |    CAST(floor(ln(
         |      (CAST(COALESCE(ct.ct, 0) + 1 AS DOUBLE)
         |        * CAST(ns + $DsirBuckets AS DOUBLE))
         |      / (CAST(COALESCE(cs.cs, 0) + 1 AS DOUBLE)
         |        * CAST(nt + $DsirBuckets AS DOUBLE)))
         |      * CAST(1000000.0 AS DOUBLE)) AS BIGINT) AS lrm
         |  FROM range($DsirBuckets) r
         |  LEFT JOIN ct ON r.range = ct.b
         |  LEFT JOIN cs ON r.range = cs.b, tot),
         |dw AS (
         |  SELECT doc_id, count(*) AS n_toks, CAST(sum(lrm) AS BIGINT) AS logw_micro
         |  FROM tb JOIN model USING (b) GROUP BY doc_id)
         |SELECT doc_id, CAST(n_toks AS BIGINT) AS n_toks, logw_micro,
         |  CAST(row_number() OVER (ORDER BY logw_micro DESC, doc_id ASC) AS INT) AS rk
         |FROM dw ORDER BY logw_micro DESC, doc_id ASC LIMIT $DsirTopK""".stripMargin
  )
}
